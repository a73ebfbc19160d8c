#!/usr/bin/env python3
"""Merge partial benchoracle --out artifacts into one.

Later files win per query name (use: base run, then resumed-remainder
run, then targeted redos of contaminated rows). Recomputes the gate
summary over the merged set — same rule as benchoracle.finish.

Usage: python3 tools/merge_benchoracle.py OUT IN1 IN2 [IN3 ...]
"""
import json
import sys
from pathlib import Path


def main() -> int:
    out, ins = sys.argv[1], sys.argv[2:]
    merged, sf = {}, None
    for p in ins:
        d = json.loads(Path(p).read_text())
        sf = d.get("sf", sf)
        merged.update(d["queries"])
    slow = sorted(
        [(n, v) for n, v in merged.items()
         if not v["iterative"] and v.get("oracle_sec", 0) >= 0.5
         and v.get("ratio", 0) > 2.0],
        key=lambda kv: -kv[1]["ratio"])
    Path(out).write_text(json.dumps(
        {"sf": sf, "queries": merged,
         "gate": {"min_oracle_sec": 0.5, "max_ratio": 2.0,
                  "relational_over_2x": [n for n, _ in slow]}},
        indent=1, sort_keys=True))
    print(f"{len(merged)} rows -> {out}; relational >2x: "
          f"{[n for n, _ in slow] or 'NONE'}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
