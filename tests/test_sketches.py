"""HLL sketch rollup: sparse-mode exactness, mergeability (daily union ==
whole-table estimate), bounded error at larger cardinality, incremental
append semantics."""

import pyspark.sql.functions as F

from mcpvectordb_spark.operators.sketches import merge_estimates, sketch_rollup


def test_sketch_exact_at_small_cardinality(spark):
    df = spark.range(5000).select(
        (F.col("id") % 97).alias("u"), (F.col("id") % 4).alias("g")
    )
    got = {r["g"]: r["approx_distinct"] for r in
           merge_estimates(sketch_rollup(df, ["g"], "u"), ["g"]).collect()}
    assert got == {0: 97, 1: 97, 2: 97, 3: 97}


def test_sketch_union_equals_whole_table_sketch(spark):
    df = spark.range(20000).select(
        F.col("id").alias("u"), (F.col("id") % 7).alias("day")
    )
    daily = sketch_rollup(df, ["day"], "u")
    merged = merge_estimates(daily, [F.lit(1).alias("all")]).collect()[0]
    whole = merge_estimates(sketch_rollup(df, [F.lit(1).alias("all")], "u"), ["all"]).collect()[0]
    assert merged["approx_distinct"] == whole["approx_distinct"]
    assert merged["n_rows"] == 20000


def test_sketch_error_bounded_at_scale(spark):
    n = 200_000
    df = spark.range(n).select(F.col("id").alias("u"), (F.col("id") % 30).alias("day"))
    est = merge_estimates(sketch_rollup(df, ["day"], "u"), [F.lit(1).alias("all")]).collect()[0]["approx_distinct"]
    assert abs(est - n) / n < 0.05, est


def test_sketch_incremental_append(spark):
    """Sketching only the NEW partition and unioning with the stored rows
    must equal sketching everything at once."""
    old = spark.range(0, 10000).select(F.col("id").alias("u"), F.lit("d1").alias("day"))
    new = spark.range(5000, 15000).select(F.col("id").alias("u"), F.lit("d2").alias("day"))
    stored = sketch_rollup(old, ["day"], "u")
    appended = stored.unionByName(sketch_rollup(new, ["day"], "u"))
    got = merge_estimates(appended, [F.lit(1).alias("all")]).collect()[0]["approx_distinct"]
    # union-of-sketches need not be bit-identical to a single-pass sketch
    # (internal HLL mode transitions differ); it must hit the same target
    assert abs(got - 15000) / 15000 < 0.05, got
