"""Maximal Marginal Relevance (MMR) diversified reranking.

Carbonell & Goldstein 1998 — the standard answer to "my top-k are ten
copies of the same passage", directly relevant to a chunked document
store like the reference (near-identical chunks of one document dominate
plain KNN; /root/reference/src/mcpvectordb/store.py:313-320 has no
diversity control).

    mmr(d | S) = λ · rel(d) − (1−λ) · max_{s∈S} sim(d, s)
    pick argmax (ties → smallest id);  step 1 scores λ·rel (S = ∅)

The greedy loop is UNROLLED a fixed k times as ONE lazy plan that the
DuckDB oracle replays as k chained CTEs — no driver-side numpy, no
collect.  Each step updates a per-candidate running ``maxsim`` with the
single newly-picked row (max over a set is associative, so the running
max is bit-identical to re-aggregating over the whole selected set) and
identifies the next pick with a global-window argmax — map-only work
over the ≤N-row pool, because diversification happens AFTER the
distributed top-N scan.

r10 optimization (guide §1.2 "the distributed algorithm" / r9 verdict
item 4 — the 1.0–2.5 s iterative band is driver-job-submission bound,
not data bound): the r9 shape still paid ~2 driver jobs per step (a
broadcast build of the pinned 1-row pick + a TakeOrdered pick job, k−1
times).  Each pick is an argmax over the pool, so it is now computed
IN-PLAN with a global window max over struct(mmr, -id) (the pool is a
≤N-row top-N result — the same k-bounded global-window class as topk.py)
and picked rows are FLAGGED (step column) instead of removed and
re-unioned.  The whole rerank — all k picks — is one job with zero
localCheckpoint pins and zero per-step broadcasts; picks, mmr values and
tie-breaks (highest mmr, then lowest id) are expression-for-expression
identical to the r9 shape, so the result is bit-identical.

Candidate ids must be NON-NULL (they are primary keys in every caller);
a null id can never be picked (the argmax equality comparison is null).

Scale shape: the expensive part is the candidate scan (knn_topk /
ivf_topk — whatever produced the pool); the rerank itself is O(k·N)
arithmetic on a pool that fits in one partition by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
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
    w = Window.partitionBy()
    pool = candidates.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("v"),
        F.col(rel_col).alias("rel"),
        F.lit(None).cast("int").alias("step"),
        F.lit(None).cast("double").alias("mmr"),
        F.lit(None).cast("double").alias("maxsim"),
    )
    for i in range(1, k + 1):
        # mmr_i over the not-yet-picked rows; step 1 has S = ∅ (no penalty)
        mmr_i = (
            F.lit(lam) * F.col("rel")
            if i == 1
            else F.lit(lam) * F.col("rel") - F.lit(1.0 - lam) * F.col("maxsim")
        )
        unpicked = F.col("step").isNull()
        # argmax among unpicked rows: struct max compares the sort key
        # first, then -id — exactly orderBy(desc key, asc id).limit(1);
        # picked rows wrap to NULL, which max() ignores.  Step 1 sorts by
        # rel itself (the r9 shape did orderBy(desc rel) — identical to
        # sorting by lam·rel only when lam > 0, so keep rel as the key) but
        # still REPORTS mmr = lam·rel.
        key_i = F.col("rel") if i == 1 else mmr_i
        best = F.max(
            F.when(
                unpicked,
                F.struct(
                    key_i.alias("key"),
                    (-F.col("id")).alias("nid"),
                    F.col("v").alias("bv"),
                    mmr_i.alias("mmr"),
                ),
            )
        ).over(w)
        is_pick = unpicked & (F.col("id") == -best["nid"])
        sim = cosine(F.col("v"), best["bv"])
        pool = pool.select(
            "id",
            "v",
            "rel",
            F.when(is_pick, F.lit(i)).otherwise(F.col("step")).alias("step"),
            F.when(is_pick, best["mmr"]).otherwise(F.col("mmr")).alias("mmr"),
            # running max_{s∈S} sim(d, s), updated with the newest pick only
            (F.greatest(F.col("maxsim"), sim) if i > 1 else sim).alias("maxsim"),
        )
    return pool.filter(F.col("step").isNotNull()).select("step", "id", "mmr").orderBy("step")
