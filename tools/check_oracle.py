#!/usr/bin/env python3
"""Local pre-check mirroring the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

For each query dir in verifyOutDir: load the Spark parquet result, run the
oracle SQL from oracle_sql.json in DuckDB over the same sfDir tables, sort
columns by name, sort rows, and compare stringified values EXACTLY — the
driver hashes string forms, so `99111` (int64) vs `99111.0` (float64, e.g.
from DuckDB HUGEINT sums) must FAIL here too. Dtype differences between the
two frames are surfaced in the failure message. Queries with no oracle get
a rows-only report.
"""
import json, sys, glob
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]

def fresh_con():
    # one connection PER QUERY: a long-lived connection accumulates
    # buffer-manager state across the O(n^2) oracles at sf0.1 until an
    # unrelated later query dies with an out-of-memory allocation; fresh
    # connections keep each oracle's footprint independent (view setup is
    # lazy — negligible per-query cost)
    c = duckdb.connect()
    for t in ["region","nation","customer","supplier","part","orders",
              "lineitem","events","documents","embeddings"]:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return c

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df

def values_equal(a, b):
    # Exact, type-visible compare mirroring the driver's hash of string
    # forms: int 99111 != float 99111.0. No epsilon anywhere — both engines
    # round doubles before output, so exact string equality must hold.
    try:
        if pd.isna(a) and pd.isna(b): return True
    except (TypeError, ValueError):
        pass  # arrays/lists: fall through to string compare
    return str(a) == str(b)

n_pass = n_fail = n_rowsonly = 0
for qdir in sorted(glob.glob(f"{out_dir}/*/")):
    name = qdir.rstrip("/").split("/")[-1]
    try:
        spark_df = pd.concat(
            [pd.read_parquet(p) for p in sorted(glob.glob(f"{qdir}/*.parquet"))],
            ignore_index=True)
    except Exception as e:
        print(f"FAIL  {name}: cannot read spark result: {e}")
        n_fail += 1
        continue
    if name not in oracles:
        print(f"ROWS  {name}: {len(spark_df)} rows (no oracle)")
        n_rowsonly += 1
        continue
    try:
        con = fresh_con()
        try:
            duck_df = con.execute(oracles[name]).fetchdf()
        finally:
            con.close()
    except Exception as e:
        print(f"FAIL  {name}: oracle SQL error: {e}")
        n_fail += 1
        continue
    s, d = canon(spark_df), canon(duck_df)
    if list(s.columns) != list(d.columns):
        print(f"FAIL  {name}: columns spark={list(s.columns)} duck={list(d.columns)}")
        n_fail += 1
        continue
    if len(s) != len(d):
        print(f"FAIL  {name}: rows spark={len(s)} duck={len(d)}")
        n_fail += 1
        continue
    mismatch = None
    for ci, c in enumerate(s.columns):
        sv, dv = s[c].tolist(), d[c].tolist()
        for ri in range(len(sv)):
            if not values_equal(sv[ri], dv[ri]):
                mismatch = (c, ri, sv[ri], dv[ri])
                break
        if mismatch: break
    if mismatch:
        c, ri, a, b = mismatch
        print(f"FAIL  {name}: col {c} row {ri}: spark={a!r} duck={b!r} "
              f"(dtypes spark={s[c].dtype} duck={d[c].dtype})")
        n_fail += 1
    else:
        print(f"PASS  {name}: {len(s)} rows")
        n_pass += 1

print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
sys.exit(1 if n_fail else 0)
