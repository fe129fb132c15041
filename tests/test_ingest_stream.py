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
