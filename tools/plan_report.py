"""Physical-plan audit across the whole catalog → PLANS.md.

For every catalog query: join strategies, exchange count, TakeOrdered
top-k, and red flags —

- CartesianProduct / non-scalar nested-loop joins (round-1 tripwire);
- UNPART-WIN: a Window whose partition spec is EMPTY (the whole input
  flows through one task) — fatal on a corpus-sized child, acceptable
  only on value-block / bucket-offset / readout tables, which must be
  allowlisted below with a justification (round-7 verdict item 3);
- 1PART-EXCH: an Exchange SinglePartition whose CONSUMER is not a final
  global aggregate (partial+final scalar aggs are the one benign shape:
  map-side combine bounds what moves).  Sorts/windows/limits pulling the
  corpus to one partition are exactly the 100 TB failure mode.

Run: python tools/plan_report.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, ".")

from mcpvectordb_spark.catalog import QUERIES
from mcpvectordb_spark.session import get_spark

# streaming / write-path queries execute work at plan-build time; skip them
# (bpe_train collects the word histogram and semdedup_refined runs Lloyd
# rounds during query CONSTRUCTION — their plans are the generic
# digest-gate shape, not worth the driver work here)
SKIP = {"ingest_chunks", "search_ingested", "stream_hourly", "stream_join",
        "stream_sessions", "stream_dedup", "stream_cms", "stream_drift",
        "warc_ingest", "ann_recall", "bpe_train", "semdedup_refined"}

KINDS = ["BroadcastHashJoin", "SortMergeJoin", "ShuffledHashJoin",
         "BroadcastNestedLoopJoin", "CartesianProduct"]

# Queries allowed to carry an unpartitioned Window and/or a non-aggregate
# SinglePartition exchange, each with the reason the input is BOUNDED
# (never corpus-sized).  Most run their global windows over value-block
# tables emitted by operators/blocks.py::value_blocks, which carries an
# IN-PLAN guard (distributed pre-count, errors above MAX_BLOCKS=4M): the
# corpus appears in exactly one keyed agg and everything downstream is
# block-sized.  Every entry is pinned by tests/test_plans.py — an
# unexplained flag fails plan_report loudly.
_VB = "value_blocks table, in-plan MAX_BLOCKS guard"
ALLOW_BOUNDED: dict[str, str] = {
    "rag_context": "rank + cumsum over a 20-row knn_topk result",
    "part_skyline": "global pass over per-partition frontier survivors only",
    "key_skew_report": "rank/cumshare over top-k heavy-key readout",
    "parts_hits": "per-iteration L1 readouts over the bounded node-score table",
    "events_quantile_norm": f"rank maps over {_VB}",
    "events_stl": "seasonal/trend folds over the bounded daily grid",
    "events_sprt": "LLR walk over the bounded per-day panel",
    "events_ks": f"block CDFs over {_VB}",
    "events_survival": "KM product over the bounded event-time block table",
    "events_logrank": "O-E accumulation over the bounded risk-set table",
    "events_mannwhitney": f"midranks over {_VB}",
    "events_bh_fdr": "BH step-up over one row per event type",
    "events_attribution_markov": "repeated-squaring over the per-removal matrix (|channels|^2 rows)",
    "customers_gini": f"cumshare over {_VB}",
    "lineitem_spearman": f"midranks over 2-D {_VB}",
    "lr_eval": f"midrank AUC/ECE over rounded-probability {_VB}",
    "lr_pr_curve": f"PR sweep over rounded-probability {_VB}",
    "lr_reliability": f"calibration bins over rounded-probability {_VB}",
    "parts_conformal": f"quantile cut over residual {_VB}",
    "woe_binning": f"equal-frequency bin edges over {_VB}",
}


def _indent(line: str) -> int:
    return len(re.match(r"^[\s:+\-*!()0-9]*", line).group(0))


def _first_spec_args(line: str) -> list[str]:
    """First top-level argument of every windowspecdefinition call on the
    line, extracted by paren-depth counting.  (r8 ADVICE fix: the old
    single-regex extraction required `,` or `)` right after one optional
    paren group, so an expression-valued first argument such as
    `round(x#1, 6) DESC NULLS LAST` — whose inner comma breaks that
    shape — was silently never matched and the window escaped the audit.)"""
    firsts = []
    for m in re.finditer(r"windowspecdefinition\(", line):
        depth, buf = 1, []
        for ch in line[m.end():]:
            if ch == "," and depth == 1:
                break
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    break
            buf.append(ch)
        firsts.append("".join(buf).strip())
    return firsts


def _spec_is_unpartitioned(line: str) -> bool:
    """A windowspecdefinition lists partition columns (bare, no sort
    marker), then order columns (`col ASC/DESC NULLS ...`), then the
    frame.  Unpartitioned <=> the FIRST argument already carries a sort
    direction or is the frame itself (counting top-level bracket groups
    misreads partition-only windows, e.g. tpch_q2's min-over-partkey)."""
    for first in _first_spec_args(line):
        if first.startswith("specifiedwindowframe") or re.search(
            r"\s(?:ASC|DESC)\b", first
        ):
            return True
    return False


def audit_plan(plan: str) -> tuple[int, int]:
    """Return (n_unpartitioned_windows, n_suspect_single_partition_exchanges).

    An Exchange SinglePartition is benign only when its consumer (nearest
    preceding line with a smaller tree indent) is a final global
    aggregate; feeding a Sort/Window/anything-else means the whole input
    serializes through one task.
    """
    lines = plan.splitlines()

    def child_chain_is_limited(i: int) -> bool:
        """True when the node at line i is fed (through pass-through
        nodes: Exchange/Project/Filter/Sort/codegen wrappers) by a
        TakeOrderedAndProject or Limit — i.e. its input is k-bounded, the
        explicit pre-limit idiom list_documents/dsir_select use."""
        base = _indent(lines[i])
        for j in range(i + 1, len(lines)):
            if not lines[j].strip():
                continue
            if _indent(lines[j]) <= base:
                return False
            if re.search(r"TakeOrderedAndProject|(?:Collect|Global|Local)Limit",
                         lines[j]):
                return True
            if re.search(r"Scan |Aggregate|Join|Window |Union|Generate|"
                         r"CartesianProduct", lines[j]):
                return False
        return False

    unpart_win = 0
    suspect_1p = 0
    for i, line in enumerate(lines):
        if re.search(r"(?:^|[\s)])Window(?:GroupLimit)? \[", line) and \
                _spec_is_unpartitioned(line) and not child_chain_is_limited(i):
            unpart_win += 1
        if "Exchange SinglePartition" in line:
            parent = None
            for j in range(i - 1, -1, -1):
                if lines[j].strip() and _indent(lines[j]) < _indent(line):
                    parent = lines[j]
                    break
            if (parent is None or not re.search(
                r"(Hash|Sort|ObjectHash)Aggregate", parent
            )) and not child_chain_is_limited(i):
                suspect_1p += 1
    return unpart_win, suspect_1p


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("plan-report")
    lines = [
        "# PLANS — physical-plan audit of every catalog query",
        "",
        f"Generated by `tools/plan_report.py` at `{sf_dir}`.  BHJ/SMJ/SHJ =",
        "broadcast / sort-merge / shuffled-hash joins; BNLJ = nested-loop",
        "(acceptable only for 1-row scalar broadcasts); Exch = exchanges",
        "(shuffles); TopK = compiles to TakeOrderedAndProject; uWin =",
        "UNPARTITIONED windows; 1pX = single-partition exchanges NOT feeding",
        "a final global aggregate.  A ✗ row means a CartesianProduct leaked",
        "or an unpartitioned-window / 1-partition-exchange is present without",
        "an ALLOW_BOUNDED justification — none may exist.",
        "",
        "| query | BHJ | SMJ | SHJ | BNLJ | Exch | TopK | uWin | 1pX | flags |",
        "|---|---|---|---|---|---|---|---|---|---|",
    ]
    bad = []
    for name, fn in QUERIES.items():
        if name in SKIP:
            continue
        try:
            plan = fn(spark, sf_dir)._jdf.queryExecution().executedPlan().toString()
        except Exception as exc:
            bad.append((name, f"PLAN ERROR: {type(exc).__name__}"))
            lines.append(f"| {name} | - | - | - | - | - | - | - | - | ERROR |")
            continue
        counts = {k: plan.count(k) for k in KINDS}
        topk = "✓" if "TakeOrderedAndProject" in plan else ""
        exch = len(re.findall(r"Exchange (?:hash|range|SinglePartition)", plan))
        uwin, onep = audit_plan(plan)
        flags = []
        if counts["CartesianProduct"]:
            flags.append("✗ CARTESIAN")
        if (uwin or onep) and name in ALLOW_BOUNDED:
            flags.append(f"bounded: {ALLOW_BOUNDED[name]}")
        elif uwin or onep:
            flags.append("✗ UNBOUNDED-1TASK")
        flag_s = "; ".join(flags)
        if flag_s.startswith("✗") or " ✗" in flag_s:
            bad.append((name, flag_s))
        lines.append(
            f"| {name} | {counts['BroadcastHashJoin']} | {counts['SortMergeJoin']} | "
            f"{counts['ShuffledHashJoin']} | {counts['BroadcastNestedLoopJoin']} | "
            f"{exch} | {topk} | {uwin} | {onep} | {flag_s} |"
        )
    lines += ["", f"Skipped (execute at build time): {', '.join(sorted(SKIP))}.", ""]
    with open("PLANS.md", "w") as f:
        f.write("\n".join(lines))
    print(f"wrote PLANS.md ({len(lines)} lines); red flags: {bad if bad else 'none'}")
    spark.stop()
    if bad:
        sys.exit(1)


if __name__ == "__main__":
    main()
