#!/usr/bin/env python3
"""Deterministic sf1 stress data: 10x replication of the driver's sf0.1
tables with disjoint id offsets (copy c shifts every key by c*10^7).

Value distributions are preserved exactly — each copy carries the same
planted near-dups, embedding clusters, and key skew as sf0.1; no RNG
anywhere. Key-consistent across tables (orders.custkey lines up with
customer.custkey in every copy), and the formatted name columns that
encode their key (Customer#%09d / Supplier#%09d) are re-derived from
the shifted key so name-based operators (e.g. the ER fuzzy matcher)
see 10x the entities, not 10 byte-identical copies of each name.
region/nation are dimension tables and stay as-is.

Usage: python3 tools/make_sf1.py [src_dir] [out_dir]
       (defaults: /root/testdata/sf0.1 -> /tmp/sf1)
"""
import sys
from pathlib import Path

import duckdb

D = 10_000_000  # per-copy id offset, far above any sf0.1 key
COPIES = 10

# table -> (key columns to shift, name column to re-derive or None)
PLAN = {
    "orders": (["o_orderkey", "o_custkey"], None),
    "lineitem": (["l_orderkey", "l_partkey", "l_suppkey"], None),
    "customer": (["c_custkey"], ("c_name", "Customer#", "c_custkey")),
    "supplier": (["s_suppkey"], ("s_name", "Supplier#", "s_suppkey")),
    "part": (["p_partkey"], None),
    "documents": (["doc_id"], None),
    "embeddings": (["vec_id"], None),
    "events": (["event_id", "user_id"], None),
    "region": ([], None),
    "nation": ([], None),
}


def main(src: str, out: str) -> None:
    outp = Path(out)
    outp.mkdir(parents=True, exist_ok=True)
    con = duckdb.connect()
    for table, (keys, name) in PLAN.items():
        srcf = Path(src) / f"{table}.parquet"
        if not srcf.exists():
            continue
        cols = [r[0] for r in
                con.execute(f"DESCRIBE SELECT * FROM '{srcf}'").fetchall()]
        if not keys:  # dimension table: single copy, unchanged
            con.execute(
                f"COPY (SELECT * FROM '{srcf}') TO '{outp}/{table}.parquet'")
            continue
        sel = []
        for c in cols:
            if c in keys:
                sel.append(f"{c} + cp.c * {D} AS {c}")
            elif name is not None and c == name[0]:
                _, prefix, keycol = name
                sel.append(
                    f"'{prefix}' || lpad(CAST({keycol} + cp.c * {D} AS VARCHAR),"
                    f" 9, '0') AS {c}")
            else:
                sel.append(c)
        con.execute(
            f"COPY (SELECT {', '.join(sel)} FROM '{srcf}' "
            f"CROSS JOIN range({COPIES}) cp(c) "
            f"ORDER BY cp.c) TO '{outp}/{table}.parquet'")
    for table in PLAN:
        f = outp / f"{table}.parquet"
        if f.exists():
            n = con.execute(f"SELECT COUNT(*) FROM '{f}'").fetchone()[0]
            print(f"{table}: {n} rows")


if __name__ == "__main__":
    argv = sys.argv[1:]
    main(argv[0] if argv else "/root/testdata/sf0.1",
         argv[1] if len(argv) > 1 else "/tmp/sf1")
