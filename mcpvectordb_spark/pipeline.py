"""Corpus curation pipeline: the composition the training-data use case
actually runs — quality scoring + language filtering + deduplication in one
DataFrame flow, emitting both the curated corpus and the rejects with
reasons (auditable drops, never silent).

Composition of already-oracle-checked operators (textstats + dedup); the
whole decision is itself SQL-expressible, so the catalog carries an exact
oracle for the end-to-end pipeline too.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.textstats import (
    lang_id,
    md5_fingerprint,
    quality_columns,
    ws_token_count,
)


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.5,
    min_words: int = 10,
    keep_langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Annotate every document with its curation verdict.

    Returns the input plus (n_words, quality_score, lang_pred, drop_reason)
    where ``drop_reason`` is NULL for kept docs or the first failed gate in
    fixed order: empty → too_short → low_quality → wrong_lang → duplicate.

    Duplicate handling: within a normalized-content group the canonical
    survivor is the smallest id AMONG COPIES THAT PASS the other gates — a
    group whose smallest id happens to fail quality must not drag every
    passing copy down with a 'duplicate' verdict (content would vanish
    entirely).  NULL/blank text gets its own 'empty' reason and never
    participates in dedup (md5(NULL) would otherwise lump all empties into
    one bogus duplicate group).
    """
    feats = quality_columns(text_col)
    t = F.col(text_col)
    is_empty = t.isNull() | (F.regexp_replace(t, r"\s+", "") == "")
    lang_ok = F.lit(True) if keep_langs is None else F.col("lang_pred").isin(list(keep_langs))

    annotated = (
        df.withColumn("n_words", feats["n_words"])
        .withColumn("quality_score", feats["quality_score"])
        .withColumn("lang_pred", lang_id(t))
        .withColumn("__empty", is_empty)
    )
    passes_other = (
        ~F.col("__empty")
        & (F.col("n_words") >= min_words)
        & (F.col("quality_score") >= min_quality)
        & lang_ok
    )
    # survivors-first dup ranking: passing copies rank before failing ones
    w = Window.partitionBy("__h").orderBy(F.col("__pass").desc(), F.col(id_col))
    ranked = (
        annotated.withColumn("__pass", passes_other)
        .withColumn("__h", F.when(~F.col("__empty"), md5_fingerprint(t)))
        .withColumn("__dup_rank", F.row_number().over(w))
    )
    reason = (
        F.when(F.col("__empty"), F.lit("empty"))
        .when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
        .when(~lang_ok, F.lit("wrong_lang"))
        .when(F.col("__dup_rank") > 1, F.lit("duplicate"))
        .otherwise(F.lit(None).cast("string"))
    )
    return ranked.withColumn("drop_reason", reason).drop("__h", "__dup_rank", "__pass", "__empty")


def curation_summary(curated: DataFrame) -> DataFrame:
    """Rollup: kept/dropped counts by reason (NULL reason = kept)."""
    return curated.groupBy(
        F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("outcome")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def corpus_token_stats(df: DataFrame, text_col: str, *group_cols: str) -> DataFrame:
    """Token budgeting: whitespace-token totals per group — the number a
    training run actually plans against."""
    toks = ws_token_count(F.col(text_col))
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
        F.max(toks).alias("max_tokens"),
    )
