#!/usr/bin/env python3
"""sf1-scale oracle replay for the five oracle-BOUND queries (r9 verdict #4).

At sf1 five oracles exceed a single DuckDB statement's practical budget:
the winnowing family (t_winnow / d_winnow_pairs / t_rouge_pairs, >900 s of
window-min CPU in one pipeline) and the PageRank family (gr_hits /
gr_pagerank_directed, whose unrolled CTE chains held every round's state
live at once and spilled >78 GB). The ENGINE results were always fine —
only the replay was. This tool rewrites each canonical oracle (taken
verbatim from Verify's oracle_sql.json, so it cannot drift) into an
equivalent MULTI-STATEMENT DuckDB script:

  - winnowing: the per-document fingerprint stage is embarrassingly
    parallel per doc, so it is replayed in `--chunks` disjoint doc_id
    slices INSERTed into one temp table (per-statement memory, same
    rows), and the canonical tail runs over the materialization — the
    span-dedup oracle discipline.
  - PageRank/HITS: every top-level CTE becomes CREATE TEMP TABLE in
    order, with DROPs as soon as no later stage references a table —
    DuckDB releases each round's state between statements instead of
    holding the whole unrolled chain.

The canonical single-statement oracles in oracle_sql.json are untouched
(the driver's sf0.01 gate runs those); this script exists for the sf1
record, and PROVES equivalence by comparing its results against the
engine parquet exactly like tools/compare.py (schema + rows + values).

Usage: python3 tools/sf1_oracles.py <sfDir> <outDir> [--chunks 16]
       (outDir = a graft.Verify output dir containing oracle_sql.json
        and the engine parquet of the five queries)
"""
import json
import re
import sys
import time
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).parent))
from compare import TABLES, canon  # noqa: E402

WINNOW = ["t_winnow", "d_winnow_pairs", "t_rouge_pairs"]
ROUNDS = ["gr_hits", "gr_pagerank_directed"]

FP_CTE = ("fp AS (SELECT DISTINCT doc_id, -(m.np) AS pos, m.h AS h\n"
          "              FROM sel)")
DOC_SRC = "FROM documents WHERE len(string_split(text, ' ')) >= 4),"


def winnow_script(canonical: str, chunks: int) -> list[str]:
    i = canonical.find(FP_CTE)
    assert i > 0, "canonical winnow oracle shape changed"
    prefix = canonical[: i + len(FP_CTE)]
    rest = canonical[i + len(FP_CTE):]  # "," or "\n       SELECT ..."
    assert DOC_SRC in prefix
    stmts = ["CREATE TEMP TABLE fp_all(doc_id BIGINT, pos BIGINT, h BIGINT)"]
    for k in range(chunks):
        chunk = prefix.replace(
            DOC_SRC,
            f"FROM documents WHERE len(string_split(text, ' ')) >= 4 "
            f"AND doc_id % {chunks} = {k}),", 1)
        stmts.append(
            f"INSERT INTO fp_all {chunk}\n"
            "       SELECT doc_id, pos, h FROM fp")
    stmts.append(
        "WITH fp AS (SELECT doc_id, pos, h FROM fp_all)" + rest)
    return stmts


def split_ctes(sql: str) -> tuple[list[tuple[str, str]], str]:
    """Parse `WITH a AS (...), b AS (...) SELECT ...` at top level."""
    assert sql.lstrip().startswith("WITH")
    s = sql[sql.find("WITH") + 4:]
    ctes = []
    pos = 0
    while True:
        m = re.compile(r"\s*([A-Za-z_][A-Za-z0-9_]*)\s+AS\s*\(").match(s, pos)
        if not m:
            break
        name = m.group(1)
        depth = 1
        j = m.end()
        while depth > 0:
            if s[j] == "(":
                depth += 1
            elif s[j] == ")":
                depth -= 1
            j += 1
        ctes.append((name, s[m.end():j - 1]))
        pos = j
        m2 = re.compile(r"\s*,").match(s, pos)
        if m2:
            pos = m2.end()
        else:
            break
    return ctes, s[pos:]


def rounds_script(canonical: str) -> list[str]:
    ctes, final = split_ctes(canonical)
    names = [n for n, _ in ctes]
    # last statement index that references each table (final = len(ctes))
    def refs(text: str) -> set[str]:
        return {n for n in names
                if re.search(rf"\b{re.escape(n)}\b", text)}
    last_use = {n: len(ctes) for n in refs(final)}
    for i, (_, body) in enumerate(ctes):
        for n in refs(body):
            last_use.setdefault(n, i)
            last_use[n] = max(last_use[n], i)
    stmts = []
    for i, (name, body) in enumerate(ctes):
        stmts.append(f"CREATE TEMP TABLE {name} AS {body}")
        for n, last in last_use.items():
            if last == i and n != name:
                stmts.append(f"DROP TABLE {n}")
    stmts.append(final.strip())
    return stmts


def run(sf_dir: str, out_dir: str, chunks: int) -> int:
    out = Path(out_dir)
    oracles = json.loads((out / "oracle_sql.json").read_text())
    con = duckdb.connect()
    import atexit
    import shutil
    import tempfile
    tmp = tempfile.mkdtemp(prefix="duckdb_sf1_")
    atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    con.execute(f"SET temp_directory='{tmp}'")
    for t in TABLES:
        p = Path(sf_dir) / f"{t}.parquet"
        if p.exists():
            con.execute(f"CREATE VIEW {t} AS SELECT * "
                        f"FROM read_parquet('{p}')")
    failures = 0
    for name in WINNOW + ROUNDS:
        if name not in oracles:
            print(f"SKIP {name}: no oracle registered")
            continue
        eng_path = out / name
        if not eng_path.exists():
            print(f"SKIP {name}: no engine parquet in {out_dir}")
            continue
        stmts = (winnow_script(oracles[name], chunks)
                 if name in WINNOW else rounds_script(oracles[name]))
        t0 = time.monotonic()
        duck_df = None
        for st in stmts:
            duck_df = con.execute(st)
        duck_df = duck_df.df()
        sec = time.monotonic() - t0
        eng = canon(pd.read_parquet(eng_path))
        ora = canon(duck_df)
        ok = (list(eng.columns) == list(ora.columns)
              and len(eng) == len(ora) and eng.equals(ora))
        if not ok:
            failures += 1
            print(f"FAIL {name} ({sec:.1f}s): engine {len(eng)} rows vs "
                  f"oracle {len(ora)}", flush=True)
        else:
            print(f"PASS {name} ({len(eng)} rows, oracle {sec:.1f}s)",
                  flush=True)
        # clean this query's temp tables (DROPs inside the script already
        # removed the dead stages; sweep whatever survived)
        for st in stmts:
            m = re.match(r"CREATE TEMP TABLE (\w+)", st)
            if m:
                con.execute(f"DROP TABLE IF EXISTS {m.group(1)}")
    return failures


if __name__ == "__main__":
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    chunks = 16
    for a in sys.argv[1:]:
        if a.startswith("--chunks"):
            chunks = int(a.split("=", 1)[1] if "=" in a
                         else sys.argv[sys.argv.index(a) + 1])
    sys.exit(run(args[0], args[1], chunks))
