#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate.

Reads each parquet result written by `graft.Verify` from OUT_DIR, runs the
corresponding oracle SQL (oracle_sql.json) in DuckDB against the same
testdata parquet tables, and compares:
  - schema (column names, sorted)
  - row count
  - exact values (columns sorted by name, rows sorted by all columns)

Usage: python3 tools/compare.py <sfDir> <outDir>
       python3 tools/compare.py --timeout 120 --jobs 4 <sfDir> <outDir>
       python3 tools/compare.py --one <query> <sfDir> <outDir>

With --timeout, each query compare runs in its own subprocess (its own
DuckDB) and is killed at the deadline, printed as `TIMEOUT <name>` —
that's the oracle-bound classification for the sf1 record: the ENGINE
result is already on disk from Verify; only DuckDB replaying the oracle
exceeded the budget. --jobs parallelizes the sweep.
"""
import json
import subprocess as sp
import sys
from concurrent.futures import ThreadPoolExecutor
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


def main(sf_dir: str, out_dir: str, only: str | None = None) -> int:
    out = Path(out_dir)
    con = duckdb.connect()
    # Per-process spill dir: parallel --jobs children otherwise share the
    # cwd-relative ".tmp" and race on each other's temp files (observed as
    # spurious IO crashes on big-spill oracles, not real mismatches).
    # Removed on exit (including the error path) so repeated sweeps — and
    # children killed at the --timeout deadline mid-spill, whose leftovers
    # the NEXT run's atexit of the same prefix won't cover but a fresh
    # mkdtemp name won't collide with — don't accumulate in /tmp.
    import atexit
    import shutil
    import tempfile
    tmp = tempfile.mkdtemp(prefix="duckdb_spill_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.loads((out / "oracle_sql.json").read_text())
    if only is not None:
        oracle = {only: oracle[only]}
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
    if only is None:
        print(f"== {n_pass} pass / {n_fail} fail ==")
    return 1 if n_fail else 0


def main_parallel(sf_dir: str, out_dir: str, timeout: float, jobs: int,
                  only: str | None = None) -> int:
    """Per-query child subprocesses with a kill deadline (DuckDB can't be
    reliably interrupted in-process)."""
    oracle = json.loads((Path(out_dir) / "oracle_sql.json").read_text())
    if only is not None:
        oracle = {only: oracle[only]}

    def one(name: str) -> tuple[str, str]:
        cmd = [sys.executable, __file__, "--one", name, sf_dir, out_dir]
        try:
            r = sp.run(cmd, capture_output=True, text=True, timeout=timeout)
            line = (r.stdout.strip() or r.stderr.strip().splitlines()[-1:]
                    or [f"ERROR {name}: no output"])
            return name, line if isinstance(line, str) else "\n".join(
                line if isinstance(line, list) else [line])
        except sp.TimeoutExpired:
            return name, f"TIMEOUT {name} (oracle-bound after {timeout:.0f}s)"

    with ThreadPoolExecutor(max_workers=jobs) as ex:
        results = dict(ex.map(one, sorted(oracle)))
    n_pass = n_to = n_fail = 0
    for name in sorted(oracle):
        line = results[name]
        print(line)
        if line.startswith("PASS"):
            n_pass += 1
        elif line.startswith("TIMEOUT"):
            n_to += 1
        else:
            n_fail += 1
    print(f"== {n_pass} pass / {n_fail} fail / {n_to} oracle-bound timeout ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    argv = sys.argv[1:]
    timeout = None
    jobs = 1
    only = None
    pos = []
    i = 0
    while i < len(argv):
        if argv[i] == "--timeout":
            timeout = float(argv[i + 1]); i += 2
        elif argv[i] == "--jobs":
            jobs = int(argv[i + 1]); i += 2
        elif argv[i] == "--one":
            only = argv[i + 1]; i += 2
        else:
            pos.append(argv[i]); i += 1
    if timeout is not None:
        sys.exit(main_parallel(pos[0], pos[1], timeout, jobs, only))
    sys.exit(main(pos[0], pos[1], only))
