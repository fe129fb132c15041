"""Stateful streaming: dedup state survives across micro-batches; running
totals accumulate correctly."""

import time

from pyspark.sql import functions as F


def _drain(q):
    q.processAllAvailable()


def test_dedup_stream_across_microbatches(spark, tmp_path):
    from mcpvectordb_spark.streaming.stateful import dedup_stream

    src = tmp_path / "src"
    src.mkdir()
    schema = "doc_id long, content_hash string, text string"

    def write_batch(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))

    write_batch("b1", [(1, "h1", "first"), (2, "h2", "second"), (3, "h1", "dup-in-batch")])

    stream = spark.readStream.schema(schema).parquet(str(src))
    out = dedup_stream(stream, "content_hash")
    q = (out.writeStream.outputMode("append").format("memory")
         .queryName("dedup_out").option("checkpointLocation", str(tmp_path / "ckpt")).start())
    try:
        _drain(q)
        got1 = {r["content_hash"] for r in spark.sql("SELECT * FROM dedup_out").collect()}
        assert got1 == {"h1", "h2"}

        # second micro-batch: h1/h2 re-delivered (must be suppressed by
        # state), h3 new (must pass)
        write_batch("b2", [(4, "h1", "re-dup"), (5, "h3", "third"), (6, "h2", "re-dup")])
        _drain(q)
        rows = spark.sql("SELECT * FROM dedup_out").collect()
        assert {r["content_hash"] for r in rows} == {"h1", "h2", "h3"}
        assert len(rows) == 3, "exactly one row per hash ever"
    finally:
        q.stop()


def test_user_totals_accumulate(spark, tmp_path):
    from mcpvectordb_spark.streaming.stateful import user_totals_stream

    src = tmp_path / "src2"
    src.mkdir()
    schema = "user_id long, value double"
    spark.createDataFrame([(1, 10.0), (1, 5.0), (2, 1.0)], schema).coalesce(1) \
        .write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (user_totals_stream(stream).writeStream.outputMode("append").format("memory")
         .queryName("totals_out").option("checkpointLocation", str(tmp_path / "ckpt2")).start())
    try:
        _drain(q)
        spark.createDataFrame([(1, 2.5)], schema).coalesce(1).write.mode("append").parquet(str(src))
        _drain(q)
        rows = spark.sql("SELECT * FROM totals_out").collect()
        latest = {}
        for r in rows:  # keep the last emission per user
            latest[r["user_id"]] = (r["n_events"], r["total_value"])
        assert latest[1] == (3, 17.5)   # 10 + 5, then +2.5 across batches
        assert latest[2] == (1, 1.0)
    finally:
        q.stop()


def test_streaming_heavy_hitters_single_batch_equals_twin(spark, tmp_path):
    """One micro-batch over closed data → the streamed MG state must be
    bit-equal to the batch twin (shared kernel, same sorted order)."""
    from mcpvectordb_spark.streaming.stateful import (
        heavy_hitters_batch_twin,
        heavy_hitters_stream,
    )

    rows = [(i, (i * i) % 37 if i % 5 else 7) for i in range(4000)]  # 7 is hot
    df = spark.createDataFrame(rows, "event_id long, user_id long")
    src = tmp_path / "hh_src"
    df.coalesce(1).write.parquet(str(src))

    stream = spark.readStream.schema(df.schema).parquet(str(src))
    q = (heavy_hitters_stream(stream, "user_id", capacity=16, partitions=4)
         .writeStream.outputMode("update").format("memory")
         .queryName("hh_out").option("checkpointLocation", str(tmp_path / "hh_ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    got = sorted(map(tuple, spark.sql("SELECT * FROM hh_out").collect()))
    want = sorted(map(tuple,
                      heavy_hitters_batch_twin(df, "user_id", 16, 4).collect()))
    assert got == want and len(got) > 0


def test_streaming_heavy_hitters_bound_across_batches(spark, tmp_path):
    """Across micro-batches the classic MG contract must hold per
    partition: the genuinely hot key survives with
    mg_count ∈ [true − n/capacity, true]."""
    from mcpvectordb_spark.streaming.stateful import heavy_hitters_stream

    src = tmp_path / "hh2_src"
    src.mkdir()
    schema = "event_id long, user_id long"

    def batch(offset, hot_every):
        rows = [(offset + i, 999 if i % hot_every == 0 else offset + i)
                for i in range(3000)]
        spark.createDataFrame(rows, schema).coalesce(1).write.mode("append").parquet(str(src))

    batch(0, 3)
    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (heavy_hitters_stream(stream, "user_id", capacity=32, partitions=2)
         .writeStream.outputMode("update").format("memory")
         .queryName("hh2_out").option("checkpointLocation", str(tmp_path / "hh2_ck")).start())
    try:
        q.processAllAvailable()
        batch(10_000, 3)  # state must persist into the second batch
        q.processAllAvailable()
    finally:
        q.stop()
    # latest emission per (pkey, key)
    rows = spark.sql(
        "SELECT * FROM (SELECT *, row_number() OVER "
        "(PARTITION BY pkey, key ORDER BY n_processed DESC) rn FROM hh2_out) WHERE rn = 1"
    ).collect()
    hot = [r for r in rows if r["key"] == 999]
    assert len(hot) == 1, "hot key must survive in its partition"
    true_count = 2 * 1000  # 3000/3 per batch
    n = hot[0]["n_processed"]
    assert true_count - n / 32 <= hot[0]["mg_count"] <= true_count


def test_attribution_stream_equals_batch_twin(spark, tmp_path):
    """Streaming last-touch attribution == the batch window operator, with
    state genuinely carried across micro-batches (a touch in batch 0
    credits a conversion in batch 1)."""
    import pandas as pd
    from pyspark.sql import functions as F

    from mcpvectordb_spark.operators.analytics import last_touch_attribution
    from mcpvectordb_spark.streaming.stateful import attribution_stream

    rows = [
        # (user, eid, sec, type, value) — user 1's touch is in batch 0,
        # conversion in batch 1: only cross-batch state gets this right
        (1, 1, 100, "click", 0.0),
        (2, 2, 150, "purchase", 9.0),       # no touch -> direct
        (1, 3, 900, "purchase", 5.0),       # credits the batch-0 click
        (3, 4, 950, "view", 0.0),
        (3, 5, 990, "purchase", 2.0),       # same-batch touch
    ]
    df = spark.createDataFrame(
        rows, "user long, eid long, t long, etype string, v double"
    )
    d = str(tmp_path / "attr")
    df.filter("t < 500").coalesce(1).write.parquet(d + "/b0")
    df.filter("t >= 500").coalesce(1).write.parquet(d + "/b1")
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d + "/b*")
    )
    q = (
        attribution_stream(stream, "purchase")
        .writeStream.format("memory").queryName("attr_twin_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)
    got = {
        r["conv_id"]: (r["channel"], r["v"])
        for r in spark.table("attr_twin_out").collect()
    }
    assert got == {2: ("direct", 9.0), 3: ("click", 5.0), 5: ("view", 2.0)}

    # equality against the batch operator on the same events
    ev = df.select(
        F.col("user").alias("user_id"), F.col("eid").alias("event_id"),
        F.timestamp_seconds("t").alias("ts"), F.col("etype").alias("event_type"),
        F.col("v").alias("value"),
    )
    batch = {
        r["conv_id"]: (r["channel"], r["v"])
        for r in last_touch_attribution(ev, "purchase").collect()
    }
    assert got == batch


def test_ewma_stream_equals_batch_fold(spark, tmp_path):
    """Streamed recursive EWMA across two micro-batches == the batch fold
    over the concatenated in-order series (the events_ewma_recursive
    semantics)."""
    import datetime

    from pyspark.sql import functions as F

    from mcpvectordb_spark.streaming.stateful import ewma_stream

    src = tmp_path / "src_ewma"
    src.mkdir()
    schema = "event_id long, ts timestamp, event_type string, value double"
    t0 = datetime.datetime(2024, 1, 1)

    def rows(ids_vals):
        return [
            (i, t0 + datetime.timedelta(minutes=i), "a", v) for i, v in ids_vals
        ]

    b1 = rows([(1, 10.0), (2, 20.0)])
    b2 = rows([(3, 40.0), (4, 10.0)])
    spark.createDataFrame(b1, schema).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        ewma_stream(stream).writeStream.outputMode("append").format("memory")
        .queryName("ewma_out").option("checkpointLocation", str(tmp_path / "ckpt_ewma"))
        .start()
    )
    try:
        _drain(q)
        spark.createDataFrame(b2, schema).coalesce(1).write.mode("append").parquet(str(src))
        _drain(q)
        got = {
            r["n_seen"]: r["ewma"]
            for r in spark.sql("SELECT * FROM ewma_out WHERE key='a'").collect()
        }
    finally:
        q.stop()

    # batch fold over the full series
    s = None
    expect = {}
    for i, (_, v) in enumerate(
        [(1, 10.0), (2, 20.0), (3, 40.0), (4, 10.0)], start=1
    ):
        s = v if s is None else 0.3 * v + 0.7 * s
        expect[i] = s
    # stream emits the latest state per batch: after batch1 (n=2) and batch2 (n=4)
    assert set(got) == {2, 4}
    assert abs(got[2] - expect[2]) < 1e-12
    assert abs(got[4] - expect[4]) < 1e-12


def test_holt_stream_matches_batch_fold_across_batches(spark, tmp_path):
    """Two micro-batches of ordered daily observations -> the streamed
    (level, trend, fitted) trajectory equals timeseries.holt_linear's
    batch fold bit-for-bit (binary-exact constants, same op order)."""
    from mcpvectordb_spark.operators.timeseries import holt_linear
    from mcpvectordb_spark.streaming.stateful import holt_stream

    schema = "k string, t long, x double"
    series = [("a", t, float(10 + 3 * t + (t * t) % 5)) for t in range(12)] + [
        ("b", t, float(50 - 2 * t)) for t in range(12)
    ]
    first = [r for r in series if r[1] < 7]
    second = [r for r in series if r[1] >= 7]

    src = tmp_path / "holt_src"
    src.mkdir()
    spark.createDataFrame(first, schema).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema(schema).parquet(str(src))
    q = (
        holt_stream(stream)
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("holt_out")
        .option("checkpointLocation", str(tmp_path / "holt_ck"))
        .start()
    )
    try:
        _drain(q)
        spark.createDataFrame(second, schema).coalesce(1).write.mode("append").parquet(str(src))
        _drain(q)
        got = {
            (r["k"], r["t"]): (r["level"], r["trend"], r["fitted"])
            for r in spark.sql("SELECT * FROM holt_out").collect()
        }
    finally:
        q.stop()

    batch = holt_linear(
        spark.createDataFrame(series, schema), "k", "t", "x", 0.5, 0.25
    ).collect()
    assert len(got) == len(batch) == 24
    for r in batch:
        g = got[(r["k"], r["t"])]
        assert g == (r["level"], r["trend"], r["fitted"]), (r["k"], r["t"], g)
