"""Bucketed (co-located) table layout — the shuffle-free join strategy.

A join between two tables bucketed by the same key into the same number of
buckets needs NO exchange: every task reads bucket i of both sides and
merges locally.  At 100 TB this converts the nightly "join chunks to
embeddings/scores/labels" pattern from a full-corpus shuffle (the dominant
cost) into a scan.  The write pays one up-front shuffle into buckets;
every subsequent join on that key rides it for free.

Spark mechanics: ``bucketBy`` metadata lives in the session catalog, so
bucketed tables are written with ``saveAsTable`` (path-based
``parquet(path)`` writes cannot carry bucket info).  ``sortBy`` inside each
bucket additionally upgrades the local merge to a streamed sort-merge with
no per-task sort.

Used by the dedup/curation pipelines when a corpus is re-joined repeatedly
on ``doc_id`` (quality scores, dedup verdicts, shard assignments...).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
    one_file_per_bucket: bool = True,
) -> None:
    """Persist ``df`` as a bucketed parquet table in the session catalog.

    ``num_buckets`` should be sized so one bucket of the biggest co-located
    table fits an executor's task comfortably (rows/num_buckets × row width
    ≲ a few hundred MB at target scale).

    ``one_file_per_bucket`` pre-shuffles onto the bucket key (same Murmur3
    hash the bucketing uses) so each bucket is a single file — the
    condition under which Spark trusts the write-time ``sortBy`` and plans
    merge joins with NO per-task re-sort.  Disable for huge tables where
    one file per bucket would exceed comfortable file sizes.
    """
    if one_file_per_bucket:
        df = df.repartition(num_buckets, *[df[c] for c in bucket_cols])
    w = df.write.mode(mode).format("parquet").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    """Read a catalog table (bucket metadata comes with it)."""
    return spark.table(table)
