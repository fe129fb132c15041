"""Mergeable distinct-count sketches — incremental rollup at 100 TB.

`countDistinct` is exact but must re-shuffle the full history for every
(grouping, date-range) asked.  The scale pattern is a **partial-aggregate
sketch table**: fold each partition (day, type, ...) once into an HLL
sketch (Datasketches HllSketch via Spark's built-in `hll_sketch_agg`),
persist the binary sketches, and answer any rollup later by `hll_union_agg`
over just the matching sketch rows — no rescan, sketches are tiny
(~KB), and unions are associative so daily → monthly → yearly rollups
compose.  Standard HLL error ≈ 1.04/√(2^lgK) (~1.6% at the default
lgK=12).

This mirrors how the reference's `list_libraries` distinct-count (SURVEY
§2.4 A2) stays answerable when the corpus no longer fits a single scan:
the sketch table is refreshed per appended partition, never recomputed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    part_cols: list[str | Column],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per partition
    tuple.  This is the *incremental* layer: run it on new partitions only
    and append to the sketch table."""
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_estimates(
    sketches: DataFrame, group_cols: list[str | Column]
) -> DataFrame:
    """Union sketches up to ``group_cols`` granularity and estimate the
    distinct count — touches only sketch rows, never the base table."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )
