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
    """Dense 1-based rank, score DESC, id ASC tiebreak (deterministic)."""
    w = Window.orderBy(F.desc(score_col), F.asc(id_col))
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
