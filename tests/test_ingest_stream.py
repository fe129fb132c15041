"""Streaming folder ingest: drop files → micro-batch runs the batch ingest
pipeline → store fills; re-dropped identical content is skipped by the
dedup gate (idempotence across batch and streaming)."""

import time

from mcpvectordb_spark.config import TEST
from mcpvectordb_spark.store import ChunkStore
from mcpvectordb_spark.streaming.ingest_stream import start_folder_ingest_stream


def test_folder_ingest_stream(spark, tmp_path):
    watch = tmp_path / "drop"
    watch.mkdir()
    store = ChunkStore(spark, str(tmp_path / "chunks"), TEST)
    (watch / "one.md").write_text("# One\n\n" + "streaming document words " * 20)

    q = start_folder_ingest_stream(
        spark, str(watch), store, library="stream",
        checkpoint_dir=str(tmp_path / "ckpt"),
    )
    try:
        q.processAllAvailable()
        assert store.count() > 0
        first_count = store.count()
        docs1 = store.list_documents(limit=10)
        assert len(docs1) == 1

        # drop a second file + an identical re-drop of the first
        (watch / "two.md").write_text("# Two\n\n" + "second streaming doc " * 20)
        (watch / "one_copy.md").write_text("# One\n\n" + "streaming document words " * 20)
        q.processAllAvailable()
        docs2 = store.list_documents(limit=10)
        # one_copy has a different source → new doc; two.md → new doc
        assert len(docs2) == 3
        assert store.count() > first_count
    finally:
        q.stop()


def test_vector_index_stream_append_matches_rebuild(spark, tmp_path):
    """The watch-folder recipe applied to the ANN index: two dropped
    vector batches stream through foreachBatch appends against the frozen
    trained state; the resulting IVF-PQ index equals a batch rebuild over
    the union - cells, codes, and search results."""
    import numpy as np
    from pyspark.sql import functions as F
    from pyspark.sql import types as T

    from mcpvectordb_spark.operators.pq import IvfPqIndex
    from mcpvectordb_spark.streaming.ingest_stream import start_vector_index_stream

    rng = np.random.default_rng(21)
    vecs = rng.normal(size=(120, 16))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    rows = [(i, [float(x) for x in vecs[i]]) for i in range(120)]
    schema = T.StructType(
        [T.StructField("id", T.LongType()), T.StructField("embedding", T.ArrayType(T.DoubleType()))]
    )
    all_df = spark.createDataFrame(rows, schema)
    base = all_df.filter(F.col("id") < 60)
    cents = all_df.filter(F.col("id") < 4).select(
        F.col("id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    idx = IvfPqIndex.build(spark, base, cents, m=4, ksub=8, path=str(tmp_path / "streamed"))

    drop = str(tmp_path / "drop")
    all_df.filter((F.col("id") >= 60) & (F.col("id") < 90)).write.parquet(f"{drop}/b0")
    all_df.filter(F.col("id") >= 90).write.parquet(f"{drop}/b1")
    q = start_vector_index_stream(
        spark, f"{drop}/b*", idx, schema, checkpoint_dir=str(tmp_path / "ckpt")
    )
    q.processAllAvailable()
    q.stop()

    full = IvfPqIndex.build(spark, all_df, cents, m=4, ksub=8, path=str(tmp_path / "full"))

    def snap(i):
        return {
            r["id"]: (r["centroid_id"], tuple(r["pq_codes"]))
            for r in i.encoded().select("id", "centroid_id", "pq_codes").collect()
        }

    assert snap(idx) == snap(full)
    qv = [float(x) for x in vecs[33]]
    a = [(r["id"], round(r["score"], 9)) for r in idx.search(qv, 5, nprobe=2).collect()]
    b = [(r["id"], round(r["score"], 9)) for r in full.search(qv, 5, nprobe=2).collect()]
    assert a == b and len(a) == 5
