"""TF-IDF cosine similarity self-join over an inverted index.

The lexical-sparse-vector sibling of the embedding near-dup families in
operators/dedup.py — the representation used by classic near-duplicate /
plagiarism detectors (Broder-era) and by Elasticsearch's more-like-this.
The reference has no corpus-pairs operator at all (its only similarity is
the per-query KNN scan, /root/reference/src/mcpvectordb/store.py:313-320);
this is a scale-path extension for training-data curation.

Semantics (declared spec, mirrored 1:1 by the DuckDB oracle):

    tf(d,t)   = term count (lowercase whitespace tokens, bm25.tokens_col)
    keep t iff df(t) <= max_df            -- stop-term cutoff
    w(d,t)    = tf · ln(N / df)
    cos(a,b)  = Σ_t w(a,t)·w(b,t) / (|w(a)|·|w(b)|)   over kept terms
    emit (a < b) with cos >= threshold

Exactness under the cutoff: dropped stop terms are removed from the
VECTORIZATION (weights and norms alike), so the score is the true cosine
of the filtered representation — not a lower bound of an unfiltered one.
Terms with df = 1 stay in the norms but are pruned from the pair join
(they cannot co-occur), which is a pure optimization.

Scale: candidate generation is the inverted-index join — per-term fanout
is bounded by max_df² (the knob that keeps a 100 TB corpus from going
all-pairs; lower it or add prefix filtering à la Bayardo et al. 2007 for
web-scale).  Two shuffles: (doc,term) aggregation and the pair-sum; the
df table is a broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.bm25 import doc_terms


def tfidf_cosine_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    threshold: float,
    max_df: int = 100,
) -> DataFrame:
    """All pairs (id_a < id_b) with filtered-TF-IDF cosine >= threshold."""
    posting = doc_terms(df, id_col, text_col)
    n_docs = F.broadcast(df.agg(F.count(F.lit(1)).cast("double").alias("__n")))
    dfreq = posting.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    w = (
        posting.join(dfreq.filter(F.col("df") <= max_df), "term")
        .crossJoin(n_docs)
        .select(
            "doc", "term", "df",
            (F.col("tf") * F.log(F.col("__n") / F.col("df"))).alias("w"),
        )
    )
    norms = w.groupBy("doc").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("norm"))
    wj = w.filter(F.col("df") >= 2).select("doc", "term", "w")

    pairs = (
        wj.alias("a")
        .join(wj.alias("b"), (F.col("a.term") == F.col("b.term")) & (F.col("a.doc") < F.col("b.doc")))
        .groupBy(F.col("a.doc").alias("id_a"), F.col("b.doc").alias("id_b"))
        .agg(F.sum(F.col("a.w") * F.col("b.w")).alias("dot"))
    )
    return (
        pairs.join(norms.select(F.col("doc").alias("id_a"), F.col("norm").alias("na")), "id_a")
        .join(norms.select(F.col("doc").alias("id_b"), F.col("norm").alias("nb")), "id_b")
        .select("id_a", "id_b", (F.col("dot") / (F.col("na") * F.col("nb"))).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
