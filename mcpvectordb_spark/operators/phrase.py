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
    oracle) rather than guessing at whitespace classes."""
    return docs.select(
        F.col(id_col).alias("doc"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos0", "token"),
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
