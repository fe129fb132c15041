"""Exact phrase search over a positional inverted index.

The reference's retrieval surface is vector + BM25 bag-of-words
(mcpvectordb/store.py); BM25 cannot distinguish "stream table hash"
from the same three tokens scattered across a document.  This module
adds the classic positional-index phrase operator: postings are
(doc, position) pairs per token, and an N-token phrase matches at
anchor a when token_i sits at position a + i for EVERY i — found with
one filtered scan of the postings and one keyed agg, no N-way
self-join.

Scale shape: the postings build is a map-only posexplode; the filter
keeps only postings of the N phrase tokens (a broadcast N-row join),
so the shuffle carries |matching postings| rows keyed by (doc, anchor).
df-bounded: cost tracks the phrase terms' document frequency, exactly
like a conjunctive Boolean query.  Repeated tokens in the phrase are
handled by matching each posting against every offset of that token
and counting DISTINCT offsets per anchor.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def phrase_postings(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc, pos, token) positional postings; pos is 1-based.  Tokens
    split on single spaces — mirror the corpus normalization (and the
    oracle) rather than guessing at whitespace classes.  The compact doc
    table is rebalanced first (fan_out): small-file scans are 1-2
    partitions and would serialize the posexplode."""
    from mcpvectordb_spark.operators.dedup import fan_out

    return fan_out(docs.select(F.col(id_col).alias("doc"), F.col(text_col).alias("__t"))).select(
        "doc",
        F.posexplode(F.split(F.col("__t"), " ")).alias("pos0", "token"),
    ).select("doc", (F.col("pos0") + 1).alias("pos"), "token")


def phrase_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    phrase: str,
) -> DataFrame:
    """Documents containing the exact token sequence `phrase`, with the
    number of (possibly overlapping) occurrences and the first anchor
    position.  Returns (doc, n_occurrences, first_pos) — one row per
    matching document."""
    terms = phrase.split(" ")
    n = len(terms)
    spark = docs.sparkSession
    offsets = spark.createDataFrame(
        [(t, i) for i, t in enumerate(terms)], ["token", "off"]
    )
    postings = phrase_postings(docs, id_col, text_col)
    hits = postings.join(F.broadcast(offsets), "token").select(
        "doc", (F.col("pos") - F.col("off")).alias("anchor"), "off"
    )
    anchors = (
        hits.groupBy("doc", "anchor")
        .agg(F.countDistinct("off").alias("nmatch"))
        .filter((F.col("nmatch") == n) & (F.col("anchor") >= 1))
    )
    return anchors.groupBy("doc").agg(
        F.count(F.lit(1)).alias("n_occurrences"),
        F.min("anchor").alias("first_pos"),
    )


def near_search(
    docs: DataFrame,
    id_col: str,
    text_col: str,
    term_a: str,
    term_b: str,
    window: int = 5,
) -> DataFrame:
    """Proximity (NEAR/k) search: documents where `term_a` and `term_b`
    occur within `window` tokens of each other, in either order — the
    relaxation between exact phrase and bag-of-words.  Per matching
    document returns the minimum token distance and how many position
    pairs fall inside the window.

    Plan: postings filtered to the two terms (broadcast 2-row join),
    then a per-document equi-join of the two position lists — fan-out
    is tf_a * tf_b per doc, bounded by term frequency exactly like the
    df-bounded phrase join.  No windows, no sort; one keyed agg.
    """
    postings = phrase_postings(docs, id_col, text_col)
    pa = postings.filter(F.col("token") == term_a).select(
        "doc", F.col("pos").alias("pa")
    )
    pb = postings.filter(F.col("token") == term_b).select(
        F.col("doc").alias("doc_b"), F.col("pos").alias("pb")
    )
    pairs = pa.join(pb, F.col("doc") == F.col("doc_b")).select(
        "doc", F.abs(F.col("pa") - F.col("pb")).alias("dist")
    )
    return (
        pairs.groupBy("doc")
        .agg(
            F.min("dist").alias("min_dist"),
            F.sum(
                F.when(F.col("dist") <= window, F.lit(1)).otherwise(F.lit(0))
            ).alias("pairs_within"),
        )
        .filter(F.col("min_dist") <= window)
    )
