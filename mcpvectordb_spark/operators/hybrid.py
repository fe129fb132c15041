"""Hybrid search: reciprocal-rank fusion of ranked lists.

The reference fuses BM25 and vector rankings inside LanceDB
(/root/reference/src/mcpvectordb/store.py:294-307, docs/mcp-tool-spec.md:16).
Spark has no built-in RRF, but it is two window ranks and a sum:

    rrf(d) = Σ_i 1 / (k0 + rank_i(d))        k0 = 60 (standard)

A document missing from one leg contributes 0 from that leg (full outer
join).  Falling back to vector-only when hybrid is disabled mirrors the
reference's flag (config.py:59); the reference's *runtime* fallback on index
failure has no Spark analog (there is no index to be missing).

Scale: each leg is already top-N-truncated before fusion (the reference
ranks candidate sets, not the corpus), so the fusion join is tiny and
broadcast.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def rank_by_score(df: DataFrame, id_col: str, score_col: str, rank_col: str) -> DataFrame:
    """Dense 1-based rank, 6dp-ROUNDED score DESC, id ASC tiebreak —
    deterministic AND cross-engine-stable (round-7 ranked-cut discipline:
    an FTS leg's float-sum scores differ from a sequential engine in the
    last ulp; ranks feed RRF directly, so a rank flip changes values)."""
    w = Window.orderBy(F.round(F.col(score_col), 6).desc(), F.asc(id_col))
    return df.select(F.col(id_col), F.row_number().over(w).alias(rank_col))


def rrf_fuse(
    legs: list[tuple[DataFrame, str, str]],
    k0: int = 60,
    id_col: str = "doc",
    score_col: str = "rrf_score",
) -> DataFrame:
    """Fuse ranked legs: ``legs`` is [(df, its_id_col, its_score_col), ...].

    Returns (id_col, rrf_score) for every id present in ≥1 leg.
    """
    ranked = [
        rank_by_score(df, idc, sc, f"__rank_{i}").withColumnRenamed(idc, id_col)
        for i, (df, idc, sc) in enumerate(legs)
    ]
    joined = reduce(lambda a, b: a.join(b, id_col, "full_outer"), ranked)
    contribs = [
        F.coalesce(1.0 / (F.lit(float(k0)) + F.col(f"__rank_{i}")), F.lit(0.0))
        for i in range(len(legs))
    ]
    total = reduce(lambda a, b: a + b, contribs)
    return joined.select(F.col(id_col), total.alias(score_col))


def rrf_topk(
    legs: list[tuple[DataFrame, str, str]],
    k: int,
    k0: int = 60,
    id_col: str = "doc",
    score_col: str = "rrf_score",
) -> DataFrame:
    fused = rrf_fuse(legs, k0, id_col, score_col)
    return fused.orderBy(F.desc(score_col), F.asc(id_col)).limit(k)


def minmax_normalize(df: DataFrame, score_col: str, out_col: str) -> DataFrame:
    """Min-max normalize a score column to [0,1] over the candidate set
    (1-row agg broadcast back; a constant leg normalizes to 1.0 so it
    still contributes rather than dividing by zero)."""
    stats = df.agg(
        F.min(score_col).alias("__lo"), F.max(score_col).alias("__hi")
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(
            out_col,
            F.when(F.col("__hi") == F.col("__lo"), F.lit(1.0)).otherwise(
                (F.col(score_col) - F.col("__lo")) / (F.col("__hi") - F.col("__lo"))
            ),
        )
        .drop("__lo", "__hi")
    )


def weighted_fuse_topk(
    vec_leg: DataFrame,
    fts_leg: DataFrame,
    k: int,
    alpha: float = 0.5,
    id_cols: tuple[str, str] = ("id", "id"),
    score_cols: tuple[str, str] = ("score", "score"),
    id_col: str = "doc",
    score_col: str = "blend_score",
) -> DataFrame:
    """Convex score blending — the other standard hybrid besides RRF
    (LanceDB exposes it as the 'linear combination' reranker):

        blend(d) = α·norm_vec(d) + (1-α)·norm_fts(d)

    over min-max-normalized leg scores; a doc missing from a leg scores 0
    there.  Both legs arrive top-N-truncated, so the normalize aggs and
    the fusion join are tiny."""
    v = minmax_normalize(vec_leg, score_cols[0], "__nv").select(
        F.col(id_cols[0]).alias(id_col), "__nv"
    )
    f = minmax_normalize(fts_leg, score_cols[1], "__nf").select(
        F.col(id_cols[1]).alias(id_col), "__nf"
    )
    blended = (
        v.join(f, id_col, "full_outer")
        .withColumn(
            score_col,
            F.lit(alpha) * F.coalesce(F.col("__nv"), F.lit(0.0))
            + F.lit(1.0 - alpha) * F.coalesce(F.col("__nf"), F.lit(0.0)),
        )
        .drop("__nv", "__nf")
    )
    # 6dp-rounded cut key: the FTS leg's scores carry summation-order ulp
    # noise that survives min-max normalization (round-7 discipline)
    return blended.orderBy(
        F.round(F.col(score_col), 6).desc(), F.asc(id_col)
    ).limit(k)
