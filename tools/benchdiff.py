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
  tools/benchdiff.py --ab AB.json [--out BENCHAB.json]   # drift-corrected

A query regresses when BOTH hold (guards against 50 ms jitter reading
as a percentage blowup):
  cur > prev * (1 + threshold)   and   cur - prev > floor seconds.
New/removed queries are reported but never fail the gate (suite growth
is expected); the exit code is the number of regressing queries.

Drift correction (--ab): raw round-over-round ratios conflate CODE
changes with VM drift (the r10 verdict documented apparent regressions
whose sign REVERSED once prior-round code was re-run on the same-day
machine). Pass --ab a BENCHFULL-shaped record produced by re-running the
PREV round's code on TODAY's machine (e.g. from a `git worktree` of the
last round commit). Then for each query:
  drift     = ab / prev      (machine today vs machine then, code held)
  corrected = cur / ab       (code now vs code then, machine held)
and the regression gate runs on CORRECTED ratios — "regression vs drift"
becomes a computed verdict instead of prose. --out writes a committable
JSON carrying raw, drift, and corrected per query.
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
    ap.add_argument("--ab", default=None,
                    help="BENCHFULL-shaped record of PREV-round CODE re-run "
                         "on TODAY's machine; enables drift correction")
    ap.add_argument("--out", default=None,
                    help="with --ab: write the raw/drift/corrected JSON here")
    args = ap.parse_args()

    prev_spec = args.prev or f"{latest_round_rev()}:BENCHFULL.json"
    prev, cur = load(prev_spec), load(args.cur)
    pq, cq = prev["queries"], cur["queries"]
    ab = load(args.ab)["queries"] if args.ab else None

    common = sorted(set(pq) & set(cq))
    added = sorted(set(cq) - set(pq))
    removed = sorted(set(pq) - set(cq))

    # With --ab, the gate denominator is prev-code-today (code-constant,
    # machine-constant); without, it's the recorded prev run (raw).
    regressions, improved, rows = [], [], {}
    for name in common:
        p, c = float(pq[name]), float(cq[name])
        a = float(ab[name]) if ab and name in ab else None
        base = a if a is not None else p
        delta, ratio = c - base, (c / base if base > 0 else float("inf"))
        rows[name] = {"prev_sec": p, "cur_sec": c,
                      "raw_ratio": round(c / p, 3) if p > 0 else None}
        if a is not None:
            rows[name]["ab_sec"] = a
            rows[name]["drift"] = round(a / p, 3) if p > 0 else None
            rows[name]["corrected_ratio"] = round(ratio, 3)
        if c > base * (1 + args.threshold) and delta > args.floor:
            regressions.append((name, base, c, ratio))
        elif base > c * (1 + args.threshold) and -delta > args.floor:
            improved.append((name, base, c, ratio))

    pt = sum(float(pq[n]) for n in common)
    ct = sum(float(cq[n]) for n in common)
    label = "corrected (vs prev-code-today)" if ab else "raw"
    print(f"prev: {prev_spec}  ({len(pq)} queries)")
    print(f"cur:  {args.cur}  ({len(cq)} queries)")
    if ab:
        abt = sum(float(ab[n]) for n in common if n in ab)
        covered = sum(1 for n in common if n in ab)
        print(f"ab:   {args.ab}  ({covered}/{len(common)} common covered, "
              f"total {abt:.1f}s -> machine drift "
              f"{abt / pt:.2f}x vs recorded prev)" if pt else "")
    print(f"common {len(common)}: total {pt:.1f}s -> {ct:.1f}s "
          f"({ct / pt:.2f}x raw)" if pt else "no common queries")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"removed ({len(removed)}): {', '.join(removed)}")
    if improved:
        print(f"\nimproved >{args.threshold:.0%} (+{args.floor}s), {label}:")
        for n, p, c, r in sorted(improved, key=lambda x: x[3]):
            print(f"  {n:32s} {p:7.2f}s -> {c:7.2f}s  ({r:.2f}x)")
    if regressions:
        print(f"\nREGRESSIONS >{args.threshold:.0%} (+{args.floor}s), {label}:")
        for n, p, c, r in sorted(regressions, key=lambda x: -x[3]):
            print(f"  {n:32s} {p:7.2f}s -> {c:7.2f}s  ({r:.2f}x)")
    else:
        print(f"\nno regressions ({label})")
    if args.out and ab:
        with open(args.out, "w") as f:
            json.dump({"prev": prev_spec, "cur": args.cur, "ab": args.ab,
                       "gate": label, "regressions": len(regressions),
                       "queries": rows}, f, indent=1, sort_keys=True)
        print(f"wrote {args.out}")
    sys.exit(len(regressions))


if __name__ == "__main__":
    main()
