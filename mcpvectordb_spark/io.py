"""Testdata table loaders.

``/root/testdata/sf*/`` holds the driver's deterministic parquet tables
(TESTDATA.md).  ``events.parquet`` uses TIMESTAMP(NANOS), which Spark only
reads as bigint nanos (``spark.sql.legacy.parquet.nanosAsLong``) — the loader
converts to a proper timestamp by truncating to microseconds, matching how
DuckDB reads the same file (nanos → micros truncation)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.floor(F.col("ts") / 1000).cast("long")))
    return df


def load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return load_table(spark, sf_dir, "events")
