"""Entity resolution: blocked fuzzy matching (the record-linkage
blocking + pairwise-compare shape of Fellegi-Sunter pipelines).

An all-pairs edit-distance join is O(n²) and dead at corpus scale; the
standard fix is BLOCKING — group records by cheap keys (here: a join key
column plus a name prefix) and compare only within blocks.  That is the
same sub-quadratic candidates-then-verify pattern every dedup operator in
this repo uses (shingle indexes, LSH bands, k-means cells); the verify
step here is Levenshtein, which both Spark and DuckDB implement natively,
so the whole pipeline has an exact SQL twin.

Blocking trades recall for scale by construction: an edit inside the
prefix escapes its block.  Callers pick the prefix length against their
perturbation model; multi-pass blocking (re-run with a different key,
union) is the standard recall recovery and composes trivially here.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def entity_match_blocked(
    df: DataFrame,
    id_col: str,
    name_col: str,
    block_cols: list,
    prefix_len: int = 4,
    max_edit: int = 1,
) -> DataFrame:
    """(id_a < id_b, name_a, name_b, edit) candidate duplicate entities:
    same block (``block_cols`` + name prefix), Levenshtein <= max_edit.
    One self-equi-join on the block key + a codegen Levenshtein filter —
    fanout bounded by the largest block (monitor with a block-size
    histogram; salt or lengthen the prefix when a block degenerates)."""
    keyed = df.select(
        F.col(id_col).alias("id"),
        F.col(name_col).alias("name"),
        F.concat_ws(
            "\x1f",
            *[F.col(c).cast("string") for c in block_cols],
            F.substring(name_col, 1, prefix_len),
        ).alias("_blk"),
    )
    a = keyed.select(F.col("id").alias("id_a"), F.col("name").alias("name_a"), "_blk")
    b = keyed.select(F.col("id").alias("id_b"), F.col("name").alias("name_b"), "_blk")
    return (
        a.join(b, "_blk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("edit", F.levenshtein("name_a", "name_b"))
        .filter(F.col("edit") <= max_edit)
        .select("id_a", "id_b", "name_a", "name_b", F.col("edit").cast("long"))
    )
