#!/usr/bin/env python
"""Bench regression guard: diff two BENCH_r{N}.json files per query.

Usage::

    python tools/bench_compare.py BENCH_r01.json BENCH_r02.json [--max-ratio 1.5]

Exit 1 if any query common to both runs regressed by more than
``--max-ratio`` (new/old), or if the new run dropped a query the old run
had.  New queries are reported but never fail (coverage growth is good).

Timing caveat (round-1 experience): this host is a shared VM — load >5
inflates every wall-clock ~1.5×, so a uniform across-the-board slowdown is
usually the machine, not a regression.  The report flags that pattern
(median ratio > threshold) separately from a single-query regression,
which is the signal worth chasing.
"""

from __future__ import annotations

import argparse
import json
import statistics
import sys


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    # driver BENCH files wrap the bench line under "parsed"; raw bench.py
    # output is the line itself
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    return doc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.3,
                    help="ignore regressions on queries faster than this (noise floor)")
    args = ap.parse_args()

    old_q = load(args.old).get("queries", {})
    new_q = load(args.new).get("queries", {})

    dropped = sorted(set(old_q) - set(new_q))
    added = sorted(set(new_q) - set(old_q))
    common = sorted(set(old_q) & set(new_q))

    ratios = {}
    for name in common:
        o, n = old_q[name], new_q[name]
        ratios[name] = (n / o) if o > 0 else float("inf")

    med = statistics.median(ratios.values()) if ratios else 1.0
    host_wide = med > args.max_ratio

    regressed = [
        (name, old_q[name], new_q[name], ratios[name])
        for name in common
        if ratios[name] > args.max_ratio and max(old_q[name], new_q[name]) >= args.min_sec
    ]

    print(f"bench_compare {args.old} -> {args.new}: "
          f"{len(common)} common, {len(added)} added, {len(dropped)} dropped, "
          f"median ratio {med:.2f}")
    for name in added:
        print(f"  NEW      {name}: {new_q[name]:.3f}s")
    for name, o, n, r in sorted(regressed, key=lambda t: -t[3]):
        print(f"  REGRESS  {name}: {o:.3f}s -> {n:.3f}s ({r:.2f}x)")
    for name in dropped:
        print(f"  DROPPED  {name} (was {old_q[name]:.3f}s)")
    if host_wide:
        print(f"  NOTE: median ratio {med:.2f} > {args.max_ratio} — uniform slowdown, "
              "likely host load (check uptime), not a code regression")

    fail = bool(dropped) or (bool(regressed) and not host_wide)
    ot, nt = load(args.old).get("value"), load(args.new).get("value")
    print(f"  totals: {ot}s -> {nt}s; {'FAIL' if fail else 'OK'}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
