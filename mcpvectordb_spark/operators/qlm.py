"""Query-likelihood language-model retrieval (Dirichlet smoothing).

The classical LM alternative to BM25 (Zhai & Lafferty 2001, "A Study of
Smoothing Methods for Language Models Applied to Ad Hoc Information
Retrieval") — the second standard lexical scorer next to the reference's
BM25 leg (/root/reference/src/mcpvectordb/store.py:294-307 exposes only
what LanceDB's FTS provides; this engine makes the scorer pluggable).

Log-space rank-equivalent form that needs ONLY the posting list (t with
tf>0) plus a per-document constant — the standard decomposition that
avoids materialising zero-tf (doc, term) pairs:

    score(d,q) = Σ_{t∈q, tf>0} c(t,q) · ln(1 + tf(t,d) / (μ · p(t|C)))
                 + |q| · ln(μ / (dl_d + μ))

with p(t|C) = cf(t) / total_tokens (collection unigram model) and c(t,q)
the query-term multiplicity.  Every document receives a score (the
second term), so zero-hit documents rank by length — exactly the full
Dirichlet QL model, not an approximation.

Tokenization is shared with BM25 (bm25.tokens_col) so one posting list /
Bm25Index serves both scorers.

Scale: identical shuffle profile to bm25_score — one corpus explode, two
hash aggregations, query terms and corpus stats broadcast; no UDFs.  At
100 TB the posting list and collection frequencies are the same persisted
index asset the BM25 stats are; scoring is a broadcast-semi probe of the
posting list plus a doc-length join.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.bm25 import Bm25Index, doc_lens, doc_terms


def qlm_score(
    df: DataFrame,
    query: str,
    id_col: str,
    text_col: str,
    mu: float = 2000.0,
    score_col: str = "score",
    index: Bm25Index | None = None,
) -> DataFrame:
    """Dirichlet query-likelihood score for EVERY document; (doc, score).

    Query-term multiplicities count (c(t,q) weighting), unlike BM25's
    distinct-term convention — the LM formula is defined over the query
    token sequence.
    """
    q_counts = Counter(t for t in query.lower().split() if t)
    spark = df.sparkSession
    if not q_counts:
        return spark.createDataFrame([], f"doc string, {score_col} double")
    q_len = float(sum(q_counts.values()))
    q_terms = sorted(q_counts)

    if index is None:
        posting = doc_terms(df, id_col, text_col).localCheckpoint(eager=False)
        lens = doc_lens(df, id_col, text_col)
    else:
        posting, lens = index.posting, index.lens

    # collection model: cf(t) for the query terms only (broadcast kilobytes),
    # total token count as a 1-row broadcast — no driver collect
    cf = posting.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = F.broadcast(posting.agg(F.sum("tf").cast("double").alias("__total")))
    qdf = F.broadcast(
        spark.createDataFrame(
            [(t, float(c)) for t, c in sorted(q_counts.items())],
            "term string, qc double",
        )
    )

    hit_part = (
        posting.filter(F.col("term").isin(q_terms))
        .join(F.broadcast(cf.filter(F.col("term").isin(q_terms))), "term")
        .join(qdf, "term")
        .crossJoin(total)
        .withColumn(
            "w",
            F.col("qc")
            * F.log(
                F.lit(1.0)
                + F.col("tf") / (F.lit(mu) * (F.col("cf") / F.col("__total")))
            ),
        )
        .groupBy("doc")
        .agg(F.sum("w").alias("__hit"))
    )
    # per-doc length normalizer gives every document a score
    return (
        lens.join(hit_part, "doc", "left")
        .select(
            "doc",
            (
                F.coalesce(F.col("__hit"), F.lit(0.0))
                + F.lit(q_len) * F.log(F.lit(mu) / (F.col("dl") + F.lit(mu)))
            ).alias(score_col),
        )
    )


def qlm_topk(
    df: DataFrame,
    query: str,
    k: int,
    id_col: str,
    text_col: str,
    mu: float = 2000.0,
    score_col: str = "score",
    index: Bm25Index | None = None,
) -> DataFrame:
    """Top-k by Dirichlet QL score (TakeOrderedAndProject, doc tiebreak)."""
    scored = qlm_score(df, query, id_col, text_col, mu, score_col, index)
    # 6dp-rounded ranking key — ln()-bearing score, round-7 ranked-cut
    # discipline (matches the oracle's alias-bound round(score, 6) sort)
    return scored.orderBy(
        F.round(F.col(score_col), 6).desc(), F.asc("doc")
    ).limit(k)
