#!/usr/bin/env python
"""Regenerate the README's catalog-count claims from the registry itself
(round-4 verdict item #4 — the numbers drifted at every round end when
queries landed after the manual refresh).

Counts derived (single source of truth = mcpvectordb_spark.catalog):
  total       = len(QUERIES)
  value-gated = len(ORACLES)
  digests     = oracles that are constant golden-digest SELECTs
  exact       = value-gated - digests
  rows-only   = total - value-gated

Run with ``--check`` to verify without rewriting (what the test does).
"""

from __future__ import annotations

import re
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent


def registry_counts() -> dict[str, int]:
    sys.path.insert(0, str(ROOT))
    from mcpvectordb_spark.catalog import ORACLES, QUERIES

    digests = [
        k
        for k, v in ORACLES.items()
        if "AS n_rows" in v and "digest" in v
        and v.strip().upper().startswith("SELECT CAST(")
    ]
    return {
        "total": len(QUERIES),
        "gated": len(ORACLES),
        "digest": len(digests),
        "exact": len(ORACLES) - len(digests),
        "rows_only": len(QUERIES) - len(ORACLES),
    }


# Each entry: (regex with ONE group per number, keys supplying the numbers).
# The regexes anchor on stable surrounding prose, not on the stale numbers.
PATTERNS: list[tuple[str, list[str]]] = [
    (
        r"catalog/\s+# (\d+) catalog queries, (\d+) value-gated \((\d+) exact",
        ["total", "gated", "exact"],
    ),
    (
        r"DuckDB oracles \+ (\d+) golden digests; only the (\d+)",
        ["digest", "rows_only"],
    ),
    (
        r"`catalog/` \+ `tpch_ext\.py` hold (\d+) queries; (\d+) carry a value gate",
        ["total", "gated"],
    ),
    (r"\n(\d+) as oracle SQL compared by row count", ["exact"]),
    (r"plus (\d+) deterministic non-SQL queries", ["digest"]),
    (r"The (\d+)\s*\nremaining rows-only queries", ["rows_only"]),
]


def apply(text: str, counts: dict[str, int]) -> tuple[str, list[str]]:
    problems = []
    for pat, keys in PATTERNS:
        m = re.search(pat, text)
        if not m:
            problems.append(f"pattern not found: {pat}")
            continue
        new = m.group(0)
        # replace group captures right-to-left so spans stay valid
        for gi in range(len(keys), 0, -1):
            a, b = m.span(gi)
            a -= m.start(0)
            b -= m.start(0)
            new = new[:a] + str(counts[keys[gi - 1]]) + new[b:]
        text = text[: m.start(0)] + new + text[m.end(0) :]
    return text, problems


def main() -> int:
    check = "--check" in sys.argv
    counts = registry_counts()
    readme = ROOT / "README.md"
    text = readme.read_text()
    new_text, problems = apply(text, counts)
    if problems:
        print("\n".join(problems))
        return 1
    if new_text == text:
        print(f"README counts already current: {counts}")
        return 0
    if check:
        print(f"README counts STALE; registry says {counts} — run "
              "python tools/refresh_readme_counts.py")
        return 1
    readme.write_text(new_text)
    print(f"README counts refreshed: {counts}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
