#!/usr/bin/env python3
"""Deterministic multi-file log fixture for the grep-provenance queries
(reference parity: distributed grep over per-VM log files, tagged with
VM id + line number). Seeded RNG; re-running reproduces identical files.
Checked-in output: data/logs/vm{1..5}.log"""
import random, os

random.seed(4242)
methods = ["GET", "PUT", "POST", "DELETE"]
paths = ["/index.html", "/api/v1/users", "/api/v1/orders", "/static/app.js",
         "/health", "/metrics", "/login", "/api/v2/search"]
levels = ["INFO", "WARN", "ERROR", "DEBUG"]
msgs = ["request completed", "cache miss", "retrying upstream",
        "connection reset by peer", "slow query detected",
        "merge table committed", "scan finished before join",
        "checkpoint flushed", "GC pause exceeded budget"]

out_dir = os.path.join(os.path.dirname(__file__), "..", "data", "logs")
os.makedirs(out_dir, exist_ok=True)
for vm in range(1, 6):
    lines = []
    for i in range(1, 301):
        t = f"2024-03-{(i % 28) + 1:02d}T{(i * 7) % 24:02d}:{(i * 13) % 60:02d}:{(i * 29) % 60:02d}Z"
        if i % 3 == 0:
            m, p = random.choice(methods), random.choice(paths)
            code = random.choice([200, 200, 200, 301, 404, 500])
            ms = random.randint(1, 900)
            lines.append(f"{t} vm{vm} http {m} {p} {code} {ms}ms")
        else:
            lv, msg = random.choice(levels), random.choice(msgs)
            lines.append(f"{t} vm{vm} {lv} {msg}")
    with open(os.path.join(out_dir, f"vm{vm}.log"), "w") as f:
        f.write("\n".join(lines) + "\n")
print("wrote 5 files x 300 lines")
