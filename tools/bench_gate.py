#!/usr/bin/env python
"""Pre-snapshot bench-artifact gate (round-4 verdict item #2).

Round 4 shipped with ``BENCH_r04.json`` holding ``parsed: null`` — the
summary JSON line outgrew the driver's stdout tail capture, and the
cross-round perf-regression guard (tools/bench_compare.py) silently never
ran.  This gate makes that failure mode loud:

  1. the newest BENCH artifact (``BENCH_local.json`` if present, else the
     highest ``BENCH_r*.json``) must load to a non-empty ``queries`` dict
     (tail-recovery from a truncated driver file counts, but is reported);
  2. ``bench_compare`` against the previous round's artifact must produce
     a real median ratio (it exits non-zero on dropped queries or
     regressions, which this gate propagates).

Usage::

    python tools/bench_gate.py            # auto-pick newest vs previous
    python tools/bench_gate.py OLD NEW    # explicit pair
"""

from __future__ import annotations

import re
import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def _round_files() -> list[Path]:
    return sorted(
        ROOT.glob("BENCH_r*.json"),
        key=lambda p: int(re.search(r"r(\d+)", p.name).group(1)),
    )


def main() -> int:
    sys.path.insert(0, str(ROOT / "tools"))
    from bench_compare import load  # reuse the tail-recovery loader

    if len(sys.argv) == 3:
        old, new = Path(sys.argv[1]), Path(sys.argv[2])
    else:
        rounds = _round_files()
        if not rounds:
            print("bench_gate: no BENCH_r*.json artifacts found")
            return 1
        local = ROOT / "BENCH_local.json"
        new = local if local.exists() else rounds[-1]
        old = rounds[-1] if new == local else (
            rounds[-2] if len(rounds) >= 2 else rounds[-1]
        )

    doc = load(str(new))
    queries = doc.get("queries") or {}
    if not queries:
        print(f"bench_gate: {new} has no per-query timings — FAIL")
        return 1
    partial = " (recovered-partial)" if doc.get("recovered_partial") else ""
    print(f"bench_gate: {new} -> {len(queries)} query timings{partial}")

    rc = subprocess.call([sys.executable, str(ROOT / "tools/bench_compare.py"),
                          str(old), str(new)])
    print(f"bench_gate: bench_compare {old.name} -> {new.name} rc={rc}")
    return rc


if __name__ == "__main__":
    sys.exit(main())
