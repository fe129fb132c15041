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

from mcpvectordb_spark.operators.dedup import normalize_text
from mcpvectordb_spark.operators.textstats import lang_id, quality_features


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_quality: float = 0.5,
    min_words: int = 10,
    keep_langs: tuple[str, ...] | None = None,
) -> DataFrame:
    """Annotate every document with its curation verdict.

    Returns the input plus (quality_score, lang_pred, drop_reason) where
    ``drop_reason`` is NULL for kept docs or the FIRST failed gate in fixed
    order: too_short → low_quality → wrong_lang → duplicate.  Duplicate
    groups keep the smallest id (deterministic canonical survivor).
    """
    feats = quality_features(df, id_col, text_col).select(
        F.col(id_col), "n_words", "quality_score"
    )
    w = Window.partitionBy("__h").orderBy(F.col(id_col))
    annotated = (
        df.join(feats, id_col)
        .withColumn("lang_pred", lang_id(F.col(text_col)))
        .withColumn("__h", F.md5(normalize_text(F.col(text_col))))
        .withColumn("__dup_rank", F.row_number().over(w))
    )
    lang_ok = F.lit(True) if keep_langs is None else F.col("lang_pred").isin(list(keep_langs))
    reason = (
        F.when(F.col("n_words") < min_words, F.lit("too_short"))
        .when(F.col("quality_score") < min_quality, F.lit("low_quality"))
        .when(~lang_ok, F.lit("wrong_lang"))
        .when(F.col("__dup_rank") > 1, F.lit("duplicate"))
        .otherwise(F.lit(None).cast("string"))
    )
    return annotated.withColumn("drop_reason", reason).drop("__h", "__dup_rank")


def curation_summary(curated: DataFrame) -> DataFrame:
    """Rollup: kept/dropped counts by reason (NULL reason = kept)."""
    return curated.groupBy(
        F.coalesce(F.col("drop_reason"), F.lit("kept")).alias("outcome")
    ).agg(F.count(F.lit(1)).alias("n_docs"))


def corpus_token_stats(df: DataFrame, text_col: str, *group_cols: str) -> DataFrame:
    """Token budgeting: whitespace-token totals per group — the number a
    training run actually plans against."""
    from mcpvectordb_spark.operators.textstats import ws_token_count

    toks = ws_token_count(F.col(text_col))
    return df.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(toks).alias("total_tokens"),
        F.round(F.avg(toks), 4).alias("avg_tokens"),
        F.max(toks).alias("max_tokens"),
    )
