"""Iterative graph algorithms as DataFrame loops: weighted PageRank.

Complements the connected-components operators in operators/dedup.py
(min-label propagation, two-star contraction) with the other classic
fixed-point graph computation.  The reference has no graph surface at
all; co-purchase/co-citation ranking is a standard derived-table ask for
an analytics engine sitting on order/event data.

Semantics (power iteration, Brin & Page form):

    trans(s→d) = w(s,d) / Σ_d' w(s,d')          -- row-normalized weights
    pr_0(v)    = 1/N
    pr_{i+1}(v) = (1-d)/N + d · Σ_{s→v} pr_i(s) · trans(s→v)

Fixed iteration count (deterministic output, mirrored by an unrolled
chain of oracle CTEs — no convergence test, so both engines run the
exact same arithmetic).  Dangling nodes (no out-edges) contribute no
redistributed mass — callers with asymmetric graphs should add
self-loops or symmetrize, as the co-purchase caller does.

Scale shape: each iteration is one join of the rank vector (N rows)
against the edge list on src + one dst-keyed aggregation — the textbook
Pregel-on-DataFrames profile.  Ranks are localCheckpointed per iteration
so the logical plan stays O(1) deep instead of O(iterations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    iterations: int = 10,
    damping: float = 0.85,
    src_col: str = "src",
    dst_col: str = "dst",
    weight_col: str | None = None,
) -> DataFrame:
    """Weighted PageRank over a directed edge list; returns (node, rank).

    Every node appearing as src or dst receives a rank (nodes without
    in-edges keep the teleport mass (1-d)/N each iteration).
    """
    e = edges.select(
        F.col(src_col).alias("src"),
        F.col(dst_col).alias("dst"),
        (F.col(weight_col) if weight_col else F.lit(1.0)).cast("double").alias("w"),
    )
    # nodes/trans are re-read every iteration: localCheckpoint both, or the
    # whole upstream (edge derivation, often a pair-mining join) recomputes
    # once per iteration
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n_nodes = F.broadcast(nodes.agg(F.count(F.lit(1)).cast("double").alias("__n")))

    out_w = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    trans = (
        e.join(out_w, "src")
        .select("src", "dst", (F.col("w") / F.col("out_w")).alias("p"))
        .localCheckpoint(eager=False)
    )

    ranks = nodes.crossJoin(n_nodes).select(
        "node", (F.lit(1.0) / F.col("__n")).alias("rank")
    )
    for _ in range(iterations):
        inbound = (
            trans.join(ranks.withColumnRenamed("node", "src"), "src")
            .groupBy("dst")
            .agg(F.sum(F.col("rank") * F.col("p")).alias("in_mass"))
        )
        ranks = (
            nodes.join(inbound.withColumnRenamed("dst", "node"), "node", "left")
            .crossJoin(n_nodes)
            .select(
                "node",
                (
                    (1.0 - damping) / F.col("__n")
                    + damping * F.coalesce(F.col("in_mass"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return ranks
