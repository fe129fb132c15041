"""Maximal Marginal Relevance (MMR) diversified reranking.

Carbonell & Goldstein 1998 — the standard answer to "my top-k are ten
copies of the same passage", directly relevant to a chunked document
store like the reference (near-identical chunks of one document dominate
plain KNN; /root/reference/src/mcpvectordb/store.py:313-320 has no
diversity control).

    mmr(d | S) = λ · rel(d) − (1−λ) · max_{s∈S} sim(d, s)
    pick argmax (ties → smallest id);  step 1 scores λ·rel (S = ∅)

The greedy loop is UNROLLED a fixed k times over a localCheckpointed
candidate pool, so the whole rerank is one deterministic lazy plan that
the DuckDB oracle replays as k chained CTEs — no driver-side numpy, no
collect.  Each step joins the ≤N-row candidate pool with the ≤k-row
selected set: tiny broadcast work regardless of corpus size, because
diversification happens AFTER the distributed top-N scan.

Scale shape: the expensive part is the candidate scan (knn_topk /
ivf_topk — whatever produced the pool); the rerank itself is O(k·N)
arithmetic on a pool that fits in one partition by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.knn import cosine


def mmr_rerank(
    candidates: DataFrame,
    k: int,
    lam: float = 0.7,
    id_col: str = "id",
    vec_col: str = "embedding",
    rel_col: str = "rel",
) -> DataFrame:
    """Greedy MMR over a (id, vec, rel) candidate pool; returns
    (step, id, mmr) with step = 1-based selection order."""
    cands = candidates.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), F.col(rel_col).alias("rel")
    ).localCheckpoint(eager=False)

    first = (
        cands.orderBy(F.desc("rel"), F.asc("id"))
        .limit(1)
        .select(F.lit(1).alias("step"), "id", "v", (F.lit(lam) * F.col("rel")).alias("mmr"))
    )
    selected = first
    for i in range(2, k + 1):
        pool = cands.join(selected.select("id"), "id", "left_anti")
        pick = (
            pool.alias("c")
            .crossJoin(F.broadcast(selected.alias("s")))
            .groupBy(F.col("c.id").alias("id"), F.col("c.v").alias("v"), F.col("c.rel").alias("rel"))
            .agg(F.max(cosine(F.col("c.v"), F.col("s.v"))).alias("maxsim"))
            .select(
                F.lit(i).alias("step"), "id", "v",
                (F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("maxsim")).alias("mmr"),
            )
            .orderBy(F.desc("mmr"), F.asc("id"))
            .limit(1)
        )
        selected = selected.unionByName(pick).localCheckpoint(eager=False)
    return selected.select("step", "id", "mmr").orderBy("step")
