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
