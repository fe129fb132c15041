"""Event-stream analytics: tumbling-window aggregation and sessionization.

Each operator has a *batch* form (pure DataFrame, DuckDB-oracle-checkable)
and a *streaming* form (same logic over readStream with watermarks). The
batch form uses ``date_trunc`` so the window boundary arithmetic is identical
in the oracle; the streaming form uses ``F.window``/``F.session_window``
(equivalent tumbling/session semantics, plus late-data handling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def windowed_counts_batch(events: DataFrame, unit: str = "hour") -> DataFrame:
    """Tumbling window per event_type: count + sum(value) + distinct users."""
    return (
        events.groupBy(
            F.date_trunc(unit, F.col("ts")).alias("window_start"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.countDistinct("user_id").alias("n_users"),
        )
    )


def windowed_counts_stream(spark: SparkSession, path: str, schema, window: str = "1 hour", watermark: str = "2 hours"):
    """Streaming twin of :func:`windowed_counts_batch`: same output columns
    (n_events, sum_value rounded, n_users) so the two can be unioned or
    compared directly; distinct users via approx_count_distinct (exact
    distinct isn't available in streaming append mode).
    Late rows beyond the watermark are dropped; output mode append."""
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
            F.approx_count_distinct("user_id").alias("n_users"),
        )
    )


def sessionize_batch(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Per-user sessions: a session breaks when the gap from the previous
    event exceeds ``gap_minutes``. Classic lag + cumulative-sum windowing;
    returns one row per session with bounds and counts.

    Scale: both windows partition by user_id — a single shuffle on the
    natural key; no driver-side state."""
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # microsecond precision: casting timestamp→long truncates sub-second
    # parts and would disagree with fractional-second gap math at boundaries
    gap_us = gap_minutes * 60 * 1_000_000
    with_breaks = events.withColumn(
        "new_session",
        F.when(
            F.unix_micros(F.col("ts")) - F.lag(F.unix_micros(F.col("ts"))).over(w) > gap_us, 1
        ).otherwise(0),
    ).withColumn("session_seq", F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)))
    return (
        with_breaks.groupBy("user_id", "session_seq")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


def sessionize_stream(spark: SparkSession, path: str, schema, gap: str = "30 minutes", watermark: str = "2 hours"):
    """Streaming sessionization via the built-in session_window — state is
    managed by the engine, merged across micro-batches."""
    stream = spark.readStream.schema(schema).parquet(path)
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap), F.col("user_id"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("sum_value"))
    )


def run_stream_to_memory(query_df, name: str, spark: SparkSession) -> DataFrame:
    """Drive a streaming query to completion over the available files and
    return the materialised result (test/bench helper)."""
    q = query_df.writeStream.outputMode("append").format("memory").queryName(name).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    return spark.sql(f"SELECT * FROM {name}")


# ---------------------------------------------------------------------------
# Stream-stream join


def purchase_click_pairs_batch(
    events: DataFrame, within_minutes: int = 60, how: str = "inner"
) -> DataFrame:
    """Batch twin of the stream-stream join: each purchase paired with the
    same user's clicks in the preceding ``within_minutes`` — expressed as a
    point-in-interval join (clicks are the points, purchases carry a
    look-back window), so the batch plan is the bin-bucketed hash join of
    operators/rangejoin.py rather than a nested loop.

    ``how="leftOuter"`` keeps click-less purchases as null-matched rows
    (pair rows joined back to the purchase table on p_id — the generic
    left recipe from rangejoin.py's docstring)."""
    from mcpvectordb_spark.operators.rangejoin import interval_join

    purchases = events.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("p_id"),
        F.expr(f"ts - INTERVAL {int(within_minutes)} MINUTES").alias("w_start"),
        # half-open [ts - within, ts + 1µs) ⇒ closed click_ts <= purchase_ts
        F.expr("ts + INTERVAL 1 MICROSECOND").alias("w_end"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    clicks = events.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("c_id"), "ts"
    )
    pairs = interval_join(
        clicks, purchases, "ts", "w_start", "w_end",
        key_cols=["user_id"], bin_seconds=within_minutes * 60,
    ).select("user_id", "p_id", "c_id", "p_ts", F.col("ts").alias("c_ts"), "p_value")
    if how == "inner":
        return pairs
    if how != "leftOuter":
        raise ValueError(f"unsupported join type: {how!r}")
    matches = pairs.select("p_id", "c_id", "c_ts")
    return purchases.select("user_id", "p_id", "p_ts", "p_value").join(
        matches, "p_id", "left"
    ).select("user_id", "p_id", "c_id", "p_ts", "c_ts", "p_value")


def purchase_click_pairs_stream(
    spark: SparkSession,
    path: str,
    schema,
    within_minutes: int = 60,
    watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Streaming twin: a watermarked stream-stream join.  Both sides
    carry a watermark and the join condition bounds event time on both
    sides — the two conditions Structured Streaming needs to know when
    buffered state can be evicted (state is O(watermark window), not
    O(stream)).  ``how="leftOuter"`` additionally emits null-matched
    purchases once the watermark proves no further click can arrive for
    them (the engine holds them in state until then).  Same output
    columns as the batch twin."""
    src = spark.readStream.schema(schema).parquet(path)
    purchases = (
        src.filter(F.col("event_type") == "purchase")
        .select(
            "user_id",
            F.col("event_id").alias("p_id"),
            F.col("ts").alias("p_ts"),
            F.col("value").alias("p_value"),
        )
        .withWatermark("p_ts", watermark)
    )
    clicks = (
        src.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("c_user_id"),
            F.col("event_id").alias("c_id"),
            F.col("ts").alias("c_ts"),
        )
        .withWatermark("c_ts", watermark)
    )
    joined = purchases.join(
        clicks,
        (F.col("user_id") == F.col("c_user_id"))
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("c_ts") >= F.expr(f"p_ts - INTERVAL {int(within_minutes)} MINUTES")),
        how,
    )
    return joined.select("user_id", "p_id", "c_id", "p_ts", "c_ts", "p_value")


def drift_bins_batch(events: DataFrame, edges: DataFrame, unit: str = "hour") -> DataFrame:
    """Windowed value-distribution bin counts against FROZEN reference
    decile edges (columns event_type, e1..e9 — e.g. the training-period
    deciles behind the `events_psi` catalog query): the raw material of a
    PSI drift monitor, pre-aggregated so the PSI arithmetic downstream
    runs on 10 rows per (window, type).  The edges table broadcasts; the
    stream never shuffles more than (window, type, bin) partial counts."""
    b = events.join(F.broadcast(edges), "event_type")
    bin_col = sum(
        (F.col("value") >= F.col(f"e{i}")).cast("int") for i in range(1, 10)
    )
    return b.groupBy(
        F.date_trunc(unit, F.col("ts")).alias("window_start"),
        F.col("event_type"),
        bin_col.alias("bin"),
    ).agg(F.count(F.lit(1)).alias("n"))


def drift_bins_stream(
    spark: SparkSession,
    path: str,
    schema,
    edges: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Streaming twin of :func:`drift_bins_batch` — same broadcast edges,
    same bin arithmetic, same integer counts, so stream == batch exactly
    on closed windows (gated in test_streaming.py).  Late rows beyond the
    watermark drop; the monitor's PSI is computed per emitted window from
    these counts plus the frozen reference proportions."""
    stream = spark.readStream.schema(schema).parquet(path)
    b = stream.join(F.broadcast(edges), "event_type")
    bin_col = sum(
        (F.col("value") >= F.col(f"e{i}")).cast("int") for i in range(1, 10)
    )
    return (
        b.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window), F.col("event_type"), bin_col.alias("bin"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
