#!/usr/bin/env python3
"""Engine-vs-oracle timing: the external baseline BASELINE.md doesn't have.

The reference publishes no benchmark numbers, so the only absolute yardstick
available offline is DuckDB itself replaying each query's oracle SQL on the
same parquet tables. This tool times every oracle statement (one fresh DuckDB
per query, wall-clock around a fully-materialized fetch) and pairs it with the
engine's median seconds from BENCHFULL.json, emitting BENCHORACLE.json:

    {"sf": ..., "queries": {name: {"oracle_sec": s, "engine_sec": s,
                                   "ratio": engine/oracle}}, ...}

Interpretation guardrails (also in README):
  - DuckDB here is a SINGLE-NODE vectorized engine with zero scheduling
    overhead; Spark local[32] pays JVM plan/scheduling latency (~0.1-0.3 s
    floor per query). Ratios on sub-second queries measure that floor, not
    operator quality, so the README table filters to oracle_sec >= 0.5 s.
  - Iterative/recursive oracles (CTE-unrolled graph rounds, WITH RECURSIVE
    closures) measure DuckDB's unrolling, not a comparable plan; they are
    reported but flagged `iterative` so the 2x gate reads the relational
    subset.

Usage: python3 tools/benchoracle.py <sfDir> <oracle_sql.json>
           [--benchfull BENCHFULL.json] [--timeout 600] [--jobs 4]
           [--out BENCHORACLE.json]
"""
import argparse
import json
import subprocess as sp
import sys
import time
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]

# Queries whose oracle is an unrolled/recursive replay of an ITERATIVE
# fixed-point algorithm (or a harness deliberately running one N times):
# DuckDB re-derives every round inside one statement, which is not the
# shape a relational 2x gate should grade.
ITERATIVE_PREFIXES = (
    "gr_", "sim_knn", "sim_nsw", "sim_recall_nsw", "sim_label_prop",
    "sim_mmr", "t_textrank", "t_bpe", "st_pacf", "st_holt", "d_cc",
    "sim_kmeans", "d_semantic", "ml_perceptron", "st_exact",
)


def one(name: str, sql: str, sf_dir: str, timeout: int) -> dict:
    """Time one oracle in its own subprocess (own DuckDB, killable)."""
    prog = r"""
import duckdb, json, sys, time, tempfile, shutil, atexit
sf, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
tmp = tempfile.mkdtemp(prefix="duckdb_bo_")
atexit.register(shutil.rmtree, tmp, ignore_errors=True)
con.execute(f"SET temp_directory='{tmp}'")
for t in %r:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
t0 = time.monotonic()
n = len(con.execute(sql).fetchall())
print(json.dumps({"sec": round(time.monotonic() - t0, 3), "rows": n}))
""" % (TABLES,)
    try:
        r = sp.run([sys.executable, "-c", prog, sf_dir], input=sql,
                   capture_output=True, text=True, timeout=timeout)
        if r.returncode != 0:
            return {"error": r.stderr.strip()[-200:]}
        # The worker's own json line is LAST; anything DuckDB prints to
        # stdout (progress, notices) precedes it. Scan backwards for the
        # first parseable line so stray output degrades to a recorded
        # error, never a crash of the whole run.
        for ln in reversed(r.stdout.strip().splitlines()):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
        return {"error": "unparseable stdout tail: "
                         + r.stdout.strip()[-160:]}
    except sp.TimeoutExpired:
        return {"timeout_sec": timeout}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("sf_dir")
    ap.add_argument("oracle_json")
    ap.add_argument("--benchfull", default="BENCHFULL.json")
    ap.add_argument("--timeout", type=int, default=600)
    ap.add_argument("--jobs", type=int, default=4)
    ap.add_argument("--out", default="BENCHORACLE.json")
    ap.add_argument("--merge-only", action="store_true",
                    help="re-pair engine seconds from --benchfull into an "
                         "existing --out without re-timing any oracle")
    a = ap.parse_args()

    oracles = json.loads(Path(a.oracle_json).read_text())
    engine = {}
    if Path(a.benchfull).exists():
        engine = json.loads(Path(a.benchfull).read_text()).get("queries", {})

    if a.merge_only:
        prev = json.loads(Path(a.out).read_text())
        results = prev["queries"]
        for name, row in results.items():
            if name in engine and "oracle_sec" in row:
                row["engine_sec"] = round(engine[name], 3)
                if row["oracle_sec"] > 0:
                    row["ratio"] = round(engine[name] / row["oracle_sec"], 2)
        finish(results, Path(a.sf_dir).name, a.out)
        return 0

    results = {}
    # GATE rows (non-iterative) dispatch FIRST: a deadline-bounded run
    # (e.g. a large-SF record killed at a wall-clock budget) still covers
    # every row the 2x gate reads before spending time on the iterative
    # replays it only reports. The artifact is also flushed after EVERY
    # completion, so a killed run leaves a valid partial --out rather
    # than nothing.
    ordered = sorted(oracles.items(),
                     key=lambda kv: (kv[0].startswith(ITERATIVE_PREFIXES),
                                     kv[0]))
    with ThreadPoolExecutor(max_workers=a.jobs) as ex:
        futs = {name: ex.submit(one, name, sql, a.sf_dir, a.timeout)
                for name, sql in ordered}
        for name, fut in futs.items():
            r = fut.result()
            row = {"iterative": name.startswith(ITERATIVE_PREFIXES)}
            if "sec" in r:
                row["oracle_sec"] = r["sec"]
                if name in engine:
                    row["engine_sec"] = round(engine[name], 3)
                    if r["sec"] > 0:
                        row["ratio"] = round(engine[name] / r["sec"], 2)
            else:
                row.update(r)
            results[name] = row
            flag = "ITER " if row["iterative"] else ""
            print(f"{flag}{name}: oracle={row.get('oracle_sec', row)}s "
                  f"engine={row.get('engine_sec', '?')}s "
                  f"ratio={row.get('ratio', '?')}", flush=True)
            finish(results, Path(a.sf_dir).name, a.out)

    finish(results, Path(a.sf_dir).name, a.out)
    return 0


def finish(results: dict, sf: str, out_path: str) -> None:
    slow = sorted(
        [(n, v) for n, v in results.items()
         if not v["iterative"] and v.get("oracle_sec", 0) >= 0.5
         and v.get("ratio", 0) > 2.0],
        key=lambda kv: -kv[1]["ratio"])
    out = {"sf": sf, "queries": results,
           "gate": {"min_oracle_sec": 0.5, "max_ratio": 2.0,
                    "relational_over_2x": [n for n, _ in slow]}}
    # Atomic flush: write_text truncates in place, so a deadline kill
    # landing mid-write would leave a corrupt partial --out (breaking
    # the "killed run leaves a valid partial" contract and
    # merge_benchoracle downstream). os.replace is atomic on POSIX.
    import os
    tmp = out_path + ".tmp"
    Path(tmp).write_text(json.dumps(out, indent=1, sort_keys=True))
    os.replace(tmp, out_path)
    print(f"\n== {len(results)} timed; relational >2x (oracle>=0.5s): "
          f"{[n for n, _ in slow] or 'NONE'} ==")


if __name__ == "__main__":
    sys.exit(main())
