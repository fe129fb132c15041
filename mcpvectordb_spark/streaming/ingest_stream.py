"""Streaming ingestion: the reference's deferred "watch folder" feature
(/root/reference/mcpvectordb-implementation-plan.md:24 — "watch folder
deferred to v2") implemented Spark-natively.

A Structured Streaming file source watches a drop folder; each micro-batch
runs the SAME batch ingest pipeline (convert → chunk → embed → dedup-gate →
append) via ``foreachBatch`` — one code path for batch and streaming, which
is exactly why the pipeline is expressed as DataFrame transforms."""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from mcpvectordb_spark.config import DEFAULT, EngineConfig
from mcpvectordb_spark.ingest import ingest_batch
from mcpvectordb_spark.store import ChunkStore

# Text drop-files are read with the `text` streaming source (wholetext);
# binary formats would use a binaryFile stream + convert_stage.
RAW_STREAM_SCHEMA = T.StructType([T.StructField("value", T.StringType())])


def start_folder_ingest_stream(
    spark: SparkSession,
    watch_dir: str,
    store: ChunkStore,
    library: str = "default",
    config: EngineConfig = DEFAULT,
    checkpoint_dir: str | None = None,
    embedder_factory=None,
):
    """Watch ``watch_dir`` for new text/markdown files and ingest them.

    Returns the StreamingQuery; call ``processAllAvailable()`` to drain in
    tests, or leave running for continuous ingestion.  Exactly-once per
    file comes from the file-source checkpoint; content-level idempotence
    from the dedup gate (re-dropped identical files → skipped).
    """
    files = (
        spark.readStream.format("text")
        .option("wholetext", "true")
        .load(watch_dir)
    )
    # strip the file: scheme so streaming and batch ingests agree on the
    # (source, library) dedup identity (sources/files.py does the same)
    with_path = files.withColumn(
        "source", F.regexp_replace(F.col("_metadata.file_path"), "^file:", "")
    )

    def process_batch(batch_df, epoch_id: int) -> None:
        raw = batch_df.select(
            F.col("source"),
            F.lit(library).alias("library"),
            F.col("value").alias("content"),
            F.lit(None).cast("string").alias("metadata"),
        )
        if raw.isEmpty():
            return
        ingest_batch(raw, store, config, embedder_factory=embedder_factory)

    writer = with_path.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()


def start_vector_index_stream(
    spark: SparkSession,
    watch_dir: str,
    index,
    schema: T.StructType,
    checkpoint_dir: str | None = None,
):
    """Streaming ANN-index maintenance: watch a drop folder of (id,
    embedding) parquet batches and append each micro-batch into a
    maintained vector index (``knn.IvfIndex`` or ``pq.IvfPqIndex`` — any
    object with ``.append(df)``).

    Because both index types freeze their trained state (centroids /
    codebooks) at build, every trigger costs O(batch) assign(+encode)
    with zero existing-row movement, and the streamed index is provably
    identical to a batch rebuild over the union of all drops
    (test_ingest_stream.py pins cell-for-cell, code-for-code equality).
    Exactly-once per file comes from the file-source checkpoint — the
    same recipe as the document watch-folder above, applied to the
    vector side of the store."""
    vecs = spark.readStream.schema(schema).parquet(watch_dir)

    def process_batch(batch_df, epoch_id: int) -> None:
        if batch_df.isEmpty():
            return
        index.append(batch_df)

    writer = vecs.writeStream.foreachBatch(process_batch)
    if checkpoint_dir:
        writer = writer.option("checkpointLocation", checkpoint_dir)
    return writer.start()
