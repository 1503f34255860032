#!/usr/bin/env python3
"""Dev-only harness mirroring the driver's DuckDB-oracle correctness gate.

NOT part of the shipped library (the library is pure Scala/Spark). This
script replays what the driver does with graft.Verify output: load each
query's parquet result, run the matching oracle SQL in DuckDB over the same
test tables, sort columns by name, sort rows, and compare values.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failed = []
    for name, sql in sorted(oracle.items()):
        try:
            exp = con.execute(sql).df()
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            exp, got = canon(exp), canon(got)
            if list(exp.columns) != list(got.columns):
                print(f"FAIL {name}: columns {list(got.columns)} != {list(exp.columns)}")
                failed.append(name)
                continue
            if len(exp) != len(got):
                print(f"FAIL {name}: rows {len(got)} != {len(exp)}")
                failed.append(name)
                continue
            diffs = []
            for c in exp.columns:
                a, b = exp[c], got[c]
                if a.dtype.kind == "f" or b.dtype.kind == "f":
                    bad = ~((a.isna() & b.isna()) | (a == b))
                    if bad.any():
                        mad = (a[bad] - b[bad]).abs().max()
                        diffs.append(f"{c}: {int(bad.sum())} float diffs, maxabs={mad}")
                else:
                    if not a.astype(str).equals(b.astype(str)):
                        n = int((a.astype(str) != b.astype(str)).sum())
                        diffs.append(f"{c}: {n} value diffs")
            if diffs:
                print(f"FAIL {name}: " + "; ".join(diffs))
                ix = None
                for c in exp.columns:
                    neq = exp[c].astype(str) != got[c].astype(str)
                    if neq.any():
                        ix = neq[neq].index[:3]
                        break
                if ix is not None:
                    print("  expected:\n", exp.loc[ix].to_string())
                    print("  got:\n", got.loc[ix].to_string())
                failed.append(name)
            else:
                print(f"PASS {name} ({len(exp)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            failed.append(name)
    print(f"\n{len(oracle) - len(failed)}/{len(oracle)} queries match")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
