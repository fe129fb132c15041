"""Streaming: the streaming windowed aggregation must agree with its batch
twin on the same (closed) data; sessionization sanity."""

from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_events
from mcpvectordb_spark.streaming.events import (
    run_stream_to_memory,
    sessionize_batch,
    windowed_counts_batch,
    windowed_counts_stream,
)

SF = "/root/testdata/sf0.001"


def test_stream_matches_batch(spark, tmp_path):
    ev = load_events(spark, SF)
    d = str(tmp_path / "in")
    ev.write.parquet(d)
    stream = windowed_counts_stream(spark, d, ev.schema, window="1 hour")
    out = run_stream_to_memory(stream, "t_stream_win", spark)
    got = {
        (r["window"]["start"], r["event_type"]): (r["n_events"], round(r["sum_value"], 4))
        for r in out.collect()
    }
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["sum_value"])
        for r in windowed_counts_batch(ev, "hour").collect()
    }
    # watermark may hold back trailing windows in append mode; every
    # emitted window must match the batch result exactly AND coverage must
    # be near-complete (a stream silently dropping windows must fail, not
    # pass on a nonempty subset)
    assert len(got) >= len(want) - 4, (len(got), len(want))
    for k, v in got.items():
        assert want.get(k) == v, k


def test_sessionize_properties(spark):
    ev = load_events(spark, SF)
    s = sessionize_batch(ev, gap_minutes=30)
    rows = s.collect()
    assert sum(r["n_events"] for r in rows) == ev.count()
    assert all(r["session_start"] <= r["session_end"] for r in rows)
    # session count per user == 1 + number of >30min gaps (spot check one user)
    uid = ev.groupBy("user_id").count().orderBy(F.desc("count")).first()["user_id"]
    times = [r["ts"] for r in ev.filter(F.col("user_id") == uid).orderBy("ts", "event_id").collect()]
    gaps = sum(1 for a, b in zip(times, times[1:]) if (b - a).total_seconds() > 1800)
    got = s.filter(F.col("user_id") == uid).count()
    assert got == gaps + 1


def test_streaming_sessionize_runs(spark, tmp_path):
    from mcpvectordb_spark.streaming.events import sessionize_stream

    ev = load_events(spark, SF).limit(500)
    d = str(tmp_path / "in2")
    ev.write.parquet(d)
    stream = sessionize_stream(spark, d, ev.schema, gap="30 minutes")
    out = run_stream_to_memory(stream, "t_stream_sess", spark)
    # append mode holds back sessions until the watermark passes; every
    # session that DID emit must agree with the batch sessionization
    emitted = out.collect()
    written = spark.read.parquet(d)  # the exact rows the stream consumed
    want = {
        (r["user_id"], r["session_start"]): (r["n_events"],)
        for r in sessionize_batch(written, gap_minutes=30).collect()
    }
    for r in emitted:
        key = (r["user_id"], r["session_window"]["start"])
        assert key in want and want[key] == (r["n_events"],), key


def test_stream_stream_join_matches_batch(spark, tmp_path):
    """The watermarked stream-stream join must emit exactly the pairs the
    batch interval join produces on the same closed data."""
    from mcpvectordb_spark.streaming.events import (
        purchase_click_pairs_batch,
        purchase_click_pairs_stream,
    )

    ev = load_events(spark, SF)
    d = str(tmp_path / "ss_in")
    ev.write.parquet(d)
    stream = purchase_click_pairs_stream(spark, d, ev.schema, within_minutes=60)
    out = run_stream_to_memory(stream, "t_ss_join", spark)
    got = sorted((r["p_id"], r["c_id"]) for r in out.collect())
    want = sorted(
        (r["p_id"], r["c_id"])
        for r in purchase_click_pairs_batch(ev, within_minutes=60).collect()
    )
    assert got == want and len(got) > 0


def test_stream_stream_left_outer_join_matches_batch(spark, tmp_path):
    """Watermarked LEFT OUTER stream-stream join: null-matched purchases
    emit once the watermark proves no click can still arrive.  A far-future
    sentinel click (unmatchable user) pushes the watermark past every real
    purchase so the closed-data result is total, then must equal the batch
    left-outer twin exactly."""
    from mcpvectordb_spark.streaming.events import (
        purchase_click_pairs_batch,
        purchase_click_pairs_stream,
        run_stream_to_memory,
    )

    ev = load_events(spark, SF)
    max_ts = ev.agg(F.max("ts")).first()[0]

    # one far-future sentinel PER SIDE: the engine's global watermark is the
    # MIN across both withWatermark operators, so advancing only the click
    # side would keep trailing purchases un-evicted
    def sentinel(eid, etype):
        overrides = {
            "event_id": F.lit(eid).cast("long"),
            "user_id": F.lit(-999).cast("long"),
            "event_type": F.lit(etype),
            "ts": (F.lit(max_ts) + F.expr("INTERVAL 12 HOURS")).cast("timestamp"),
        }
        return ev.limit(1).select(
            *[overrides.get(c, F.col(c)).alias(c) for c in ev.columns]
        )

    data = ev.unionByName(sentinel(999_999_998, "purchase")).unionByName(
        sentinel(999_999_999, "click")
    )
    d = str(tmp_path / "ss_outer_in")
    data.write.parquet(d)

    stream = purchase_click_pairs_stream(
        spark, d, data.schema, within_minutes=60, how="leftOuter"
    )
    out = run_stream_to_memory(stream, "t_ss_outer", spark)
    got = sorted(
        (r["p_id"], r["c_id"]) for r in out.collect() if r["p_id"] != 999_999_998
    )
    want = sorted(
        (r["p_id"], r["c_id"])
        for r in purchase_click_pairs_batch(ev, within_minutes=60, how="leftOuter").collect()
    )
    assert got == want and len(got) > 0
    assert any(c is None for _, c in got)  # click-less purchases ARE present


def test_streaming_contamination_gate_matches_batch(spark, tmp_path):
    """The stateless contamination column gates a STREAM identically to the
    batch filter — the drop-before-sharding path of a streaming ingest."""
    from mcpvectordb_spark.operators.curation import (
        contamination_flag_col,
        eval_shingle_list,
    )

    eval_df = spark.createDataFrame(
        [(1, "the forbidden benchmark passage about spark shuffles")],
        "id long, text string",
    )
    shingles = eval_shingle_list(eval_df, "text")
    docs = [
        (10, "the forbidden benchmark passage about spark shuffles and more"),
        (11, "a completely clean training document with fresh content"),
        (12, "another clean one nothing shared here at all today"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    d = str(tmp_path / "cont_src")
    df.write.parquet(d)

    flag = contamination_flag_col(F.col("text"), shingles, threshold=0.5)
    batch_kept = sorted(r["doc_id"] for r in df.filter(~flag).collect())

    stream = spark.readStream.schema(df.schema).parquet(d)
    q = (stream.filter(~flag).writeStream.outputMode("append").format("memory")
         .queryName("cont_out").option("checkpointLocation", str(tmp_path / "cont_ck")).start())
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    stream_kept = sorted(r["doc_id"] for r in spark.sql("SELECT doc_id FROM cont_out").collect())
    assert stream_kept == batch_kept == [11, 12]


def test_cms_is_streaming_native(spark, tmp_path):
    """The Count-Min sketch needs NO custom stateful operator in streaming:
    its partials are mergeable counters, so the SAME cms_sketch plan runs
    on a readStream under complete-mode aggregation and, after consuming
    all micro-batches, equals the batch sketch counter-for-counter — the
    'mergeable partials ⇒ streaming-native' property stated in SCALE.md."""
    from mcpvectordb_spark.operators.sketches import cms_sketch

    ev = load_events(spark, SF).select("user_id")
    d = str(tmp_path / "cms_in")
    # two files -> two micro-batches with maxFilesPerTrigger=1
    ev.filter(F.col("user_id") % 2 == 0).write.parquet(f"{d}/a")
    ev.filter(F.col("user_id") % 2 == 1).write.parquet(f"{d}/b")
    stream = (
        spark.readStream.schema(ev.schema).option("maxFilesPerTrigger", "1").parquet(f"{d}/*")
    )
    q = (
        cms_sketch(stream, "user_id", depth=4, width=64)
        .writeStream.format("memory")
        .queryName("t_cms_stream")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r["d"], r["bucket"]): r["c"] for r in spark.table("t_cms_stream").collect()}
    want = {(r["d"], r["bucket"]): r["c"] for r in cms_sketch(ev, "user_id", depth=4, width=64).collect()}
    assert got == want and len(want) > 50


def test_drift_bins_stream_matches_batch(spark, tmp_path):
    from mcpvectordb_spark.streaming.events import drift_bins_batch, drift_bins_stream

    ev = load_events(spark, SF)
    # frozen reference edges: per-type deciles of the full (closed) data
    edges = ev.groupBy("event_type").agg(
        *[F.percentile("value", F.lit(i / 10.0)).alias(f"e{i}") for i in range(1, 10)]
    )
    d = str(tmp_path / "drift_in")
    ev.write.parquet(d)
    stream = drift_bins_stream(spark, d, ev.schema, edges, window="1 hour")
    out = run_stream_to_memory(stream, "t_drift_bins", spark)
    got = {
        (r["window"]["start"], r["event_type"], r["bin"]): r["n"]
        for r in out.collect()
    }
    want = {
        (r["window_start"], r["event_type"], r["bin"]): r["n"]
        for r in drift_bins_batch(ev, edges, "hour").collect()
    }
    assert len(got) >= len(want) - 40, (len(got), len(want))
    for k, v in got.items():
        assert want.get(k) == v, k
    # bins are complete decile indices
    assert {k[2] for k in want} <= set(range(10))
