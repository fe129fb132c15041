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
import re
import statistics
import sys


def _recover_from_tail(doc: dict) -> dict | None:
    """Salvage per-query timings from a driver BENCH file whose ``parsed``
    is null because the summary JSON line outgrew the driver's stdout tail
    capture (this is exactly what broke BENCH_r04.json — round 4 shipped
    with the perf guard silently inoperative).  The tail still holds the
    BACK of the queries dict, so a truncated artifact yields a partial but
    real comparison set instead of a no-op."""
    tail = doc.get("tail")
    if not isinstance(tail, str):
        return None
    queries: dict[str, float] = {}
    sf = None
    # pairs look like \"name\": 1.234 inside the (escaped) JSON line
    for m in re.finditer(r'\\?"([a-z][a-z0-9_]+)\\?":\s*([0-9]+(?:\.[0-9]+)?)', tail):
        key, val = m.group(1), float(m.group(2))
        if key == "sf":
            sf = val
        elif key not in ("value", "n", "rc", "cpus"):
            queries[key] = val
    if not queries:
        return None
    return {
        "metric": "headline_queries_total (RECOVERED-PARTIAL)",
        "value": None,
        "unit": "sec",
        "queries": queries,
        "sf": sf,
        "recovered_partial": True,
    }


def load(path: str) -> dict:
    with open(path) as fh:
        doc = json.load(fh)
    # driver BENCH files wrap the bench line under "parsed"; raw bench.py
    # output is the line itself
    if "parsed" in doc and isinstance(doc["parsed"], dict):
        doc = doc["parsed"]
    elif "parsed" in doc and doc["parsed"] is None:
        rec = _recover_from_tail(doc)
        if rec is None:
            raise SystemExit(
                f"{path}: parsed is null and no timings are recoverable from "
                "its tail — no perf comparison is possible with this artifact"
            )
        n = len(rec["queries"])
        print(f"  NOTE: {path} had parsed:null — recovered {n} per-query "
              "timings from its truncated tail (partial set)")
        doc = rec
    return doc


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--max-ratio", type=float, default=1.5)
    ap.add_argument("--min-sec", type=float, default=0.3,
                    help="ignore regressions on queries faster than this (noise floor)")
    args = ap.parse_args()

    old_doc, new_doc = load(args.old), load(args.new)
    old_q = old_doc.get("queries", {})
    new_q = new_doc.get("queries", {})
    # a recovered-partial artifact lost the FRONT of its queries dict to
    # tail truncation — absent queries are capture loss, not real drops
    partial = bool(old_doc.get("recovered_partial") or new_doc.get("recovered_partial"))

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
        tag = "ABSENT   " if partial else "DROPPED  "
        print(f"  {tag}{name} (was {old_q[name]:.3f}s)")
    if host_wide:
        print(f"  NOTE: median ratio {med:.2f} > {args.max_ratio} — uniform slowdown, "
              "likely host load (check uptime), not a code regression")

    fail = (bool(dropped) and not partial) or (bool(regressed) and not host_wide)
    ot, nt = old_doc.get("value"), new_doc.get("value")
    print(f"  totals: {ot}s -> {nt}s; {'FAIL' if fail else 'OK'}")
    return 1 if fail else 0


if __name__ == "__main__":
    sys.exit(main())
