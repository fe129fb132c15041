"""Schemas for the engine's tables.

The central table is ``chunks`` — one row per embedded chunk, mirroring the
reference's ChunkRecord (/root/reference/src/mcpvectordb/store.py:18-34).
Documents and libraries are derived entities: a document is the set of rows
sharing ``doc_id``; a library the set sharing ``library`` (SURVEY.md §1.1).

Physical layout decision (SURVEY.md §1.4): partition by ``library`` so the
library scope filter becomes partition pruning; ``doc_id``/``source``
equality predicates ride Parquet min/max pushdown.  At 100 TB this is the
same layout — ``library`` is low-cardinality and user-facing, and every hot
query is either library-scoped (search) or doc-scoped (get/delete).
"""

from __future__ import annotations

from pyspark.sql import types as T

# One wide chunk table (reference store.py:18-34). Timestamps are ISO-8601
# strings at the API edge exactly like the reference (store.py:30,33);
# metadata is a JSON-serialised dict in a string column (store.py:31).
CHUNKS_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("library", T.StringType(), False),
        T.StructField("source", T.StringType(), False),
        T.StructField("content_hash", T.StringType(), False),
        T.StructField("title", T.StringType(), True),
        T.StructField("content", T.StringType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("created_at", T.StringType(), False),
        T.StructField("metadata", T.StringType(), True),
        T.StructField("file_type", T.StringType(), True),
        T.StructField("last_modified", T.StringType(), True),
        T.StructField("page", T.IntegerType(), True),
    ]
)

# Ingestion pipeline input: one row per document to push through
# convert → chunk → embed → store (reference ingest_content,
# ingestor.py:293-414).
RAW_DOCS_SCHEMA = T.StructType(
    [
        T.StructField("source", T.StringType(), False),
        T.StructField("library", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("metadata", T.StringType(), True),
    ]
)

# Per-document ingest result (reference IngestResult, ingestor.py:24-31) —
# exceptions become a status/error column so one bad doc never kills a batch
# (ingestor.py:104-118 semantics, SURVEY.md §3.3).
INGEST_RESULT_SCHEMA = T.StructType(
    [
        T.StructField("status", T.StringType(), False),  # indexed|skipped|replaced|failed
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("source", T.StringType(), False),
        T.StructField("library", T.StringType(), False),
        T.StructField("chunk_count", T.IntegerType(), True),
        T.StructField("error", T.StringType(), True),
    ]
)
