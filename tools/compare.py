#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each parquet result written by `graft.Verify` from OUT_DIR, runs the
corresponding oracle SQL (oracle_sql.json) in DuckDB against the same
testdata parquet tables, and compares:
  - schema (column names, sorted)
  - row count
  - exact values (columns sorted by name, rows sorted by all columns)

Usage: python3 tools/compare.py <sfDir> <outDir>
"""
import json
import sys
from pathlib import Path

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize date-ish columns to string for stable compare
    for c in df.columns:
        if str(df[c].dtype).startswith(("datetime", "object")):
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    out = Path(out_dir)
    con = duckdb.connect()
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        try:
            spark_df = pd.read_parquet(out / name)
            duck_df = con.execute(sql).df()
            a, b = canon(spark_df), canon(duck_df)
            if list(a.columns) != list(b.columns):
                print(f"FAIL {name}: columns spark={list(a.columns)} duck={list(b.columns)}")
                n_fail += 1
                continue
            if len(a) != len(b):
                print(f"FAIL {name}: rows spark={len(a)} duck={len(b)}")
                n_fail += 1
                continue
            if a.equals(b):
                print(f"PASS {name} ({len(a)} rows)")
                n_pass += 1
            else:
                neq = (a != b) & ~(a.isna() & b.isna())
                bad_cols = [c for c in a.columns if neq[c].any()]
                print(f"FAIL {name}: value mismatch in {bad_cols}")
                for c in bad_cols[:3]:
                    i = neq[c].idxmax()
                    print(f"   row {i} col {c}: spark={a[c][i]!r} duck={b[c][i]!r}")
                n_fail += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))
