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
collect.  Each step updates a per-candidate running ``maxsim`` with the
single newly-picked row (max over a set is associative, so the running
max is bit-identical to re-aggregating over the whole selected set) and
takes the next pick with one TakeOrdered — map-only work over the ≤N-row
pool, no per-step shuffle, because diversification happens AFTER the
distributed top-N scan.

Scale shape: the expensive part is the candidate scan (knn_topk /
ivf_topk — whatever produced the pool); the rerank itself is O(k·N)
arithmetic on a pool that fits in one partition by construction.
"""

from __future__ import annotations

from functools import reduce

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
        .localCheckpoint(eager=False)
    )
    # r9 optimization (guide §2.4): carry max_{s∈S} sim(d, s) INCREMENTALLY
    # on the pool rows — maxsim_i(d) = max(maxsim_{i-1}(d), sim(d, pick_i)).
    # max over a set is associative and order-free, so the value (and hence
    # every pick and every reported mmr) is bit-identical to the oracle's
    # re-aggregation over the full selected set, but each step is now a
    # map-only update (one broadcast of the 1-row pick) + a TakeOrdered
    # pick instead of a left_anti join + crossJoin + groupBy re-aggregation
    # shuffle per step: the unrolled plan drops all k−1 Exchanges.
    picks = [first]
    pick = first
    pool = cands
    for i in range(2, k + 1):
        pk = F.broadcast(pick.select(F.col("id").alias("__pid"), F.col("v").alias("__pv")))
        sim = cosine(F.col("v"), F.col("__pv"))
        pool = (
            pool.crossJoin(pk)
            .filter(F.col("id") != F.col("__pid"))
            .select(
                "id", "v", "rel",
                (F.greatest(F.col("maxsim"), sim) if i > 2 else sim).alias("maxsim"),
            )
        )
        pick = (
            pool.select(
                F.lit(i).alias("step"), "id", "v",
                (F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("maxsim")).alias("mmr"),
            )
            .orderBy(F.desc("mmr"), F.asc("id"))
            .limit(1)
            # 1-row pin: truncates the next pool update's lineage so the
            # unrolled plan stays O(k) deep, not O(2^k)
            .localCheckpoint(eager=False)
        )
        picks.append(pick)
    selected = reduce(lambda x, y: x.unionByName(y), picks)
    return selected.select("step", "id", "mmr").orderBy("step")
