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
