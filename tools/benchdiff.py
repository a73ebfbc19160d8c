#!/usr/bin/env python3
"""Round-over-round bench regression gate.

Compares two BENCHFULL.json records (full per-query medians — every
query, no folding, unlike the byte-bounded compact BENCH line) and fails
on material per-query regressions, so a slowdown hiding in the compact
line's "restN" fold is still caught from the tracked artifacts alone.

Usage:
  tools/benchdiff.py                     # latest "round N:" commit vs working tree
  tools/benchdiff.py PREV CUR            # each a path, or a git REV:PATH spec
  tools/benchdiff.py --threshold 0.25 --floor 0.3

A query regresses when BOTH hold (guards against 50 ms jitter reading
as a percentage blowup):
  cur > prev * (1 + threshold)   and   cur - prev > floor seconds.
New/removed queries are reported but never fail the gate (suite growth
is expected); the exit code is the number of regressing queries.
"""
import argparse
import json
import subprocess
import sys


def load(spec: str) -> dict:
    """Load a BENCHFULL record from a path or a git REV:PATH spec."""
    if ":" in spec and not spec.split(":", 1)[0].endswith(".json"):
        out = subprocess.run(["git", "show", spec], capture_output=True,
                             text=True, check=True).stdout
        return json.loads(out)
    with open(spec) as f:
        return json.load(f)


def latest_round_rev() -> str:
    log = subprocess.run(
        ["git", "log", "--oneline", "--all"],
        capture_output=True, text=True, check=True).stdout
    for line in log.splitlines():
        sha, _, msg = line.partition(" ")
        if msg.startswith("round ") and ":" in msg:
            return sha
    sys.exit("no 'round N:' commit found; pass PREV explicitly")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev", nargs="?", default=None)
    ap.add_argument("cur", nargs="?", default="BENCHFULL.json")
    ap.add_argument("--threshold", type=float, default=0.25,
                    help="relative regression gate (default 0.25 = +25%%)")
    ap.add_argument("--floor", type=float, default=0.3,
                    help="absolute seconds a regression must also exceed")
    args = ap.parse_args()

    prev_spec = args.prev or f"{latest_round_rev()}:BENCHFULL.json"
    prev, cur = load(prev_spec), load(args.cur)
    pq, cq = prev["queries"], cur["queries"]

    common = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))

    regressions, improved = [], []
    for name in common:
        p, c = float(pq[name]), float(cq[name])
        delta, ratio = c - p, (c / p if p > 0 else float("inf"))
        if c > p * (1 + args.threshold) and delta > args.floor:
            regressions.append((name, p, c, ratio))
        elif p > c * (1 + args.threshold) and -delta > args.floor:
            improved.append((name, p, c, ratio))

    pt = sum(float(pq[n]) for n in common)
    ct = sum(float(cq[n]) for n in common)
    print(f"prev: {prev_spec}  ({len(pq)} queries)")
    print(f"cur:  {args.cur}  ({len(cq)} queries)")
    print(f"common {len(common)}: total {pt:.1f}s -> {ct:.1f}s "
          f"({ct / pt:.2f}x)" if pt else "no common queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if improved:
        print(f"\nimproved >{args.threshold:.0%} (+{args.floor}s):")
        for n, p, c, r in sorted(improved, key=lambda x: x[3]):
            print(f"  {n:32s} {p:7.2f}s -> {c:7.2f}s  ({r:.2f}x)")
    if regressions:
        print(f"\nREGRESSIONS >{args.threshold:.0%} (+{args.floor}s):")
        for n, p, c, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  {n:32s} {p:7.2f}s -> {c:7.2f}s  ({r:.2f}x)")
    else:
        print("\nno regressions")
    sys.exit(len(regressions))


if __name__ == "__main__":
    main()
