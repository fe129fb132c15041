"""mcpvectordb_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of skapoula/mcpvectordb.

The reference (read-only at /root/reference/) is an MCP server doing hybrid
BM25 + vector search over a single chunk table stored in embedded LanceDB.
This package re-expresses every operator it implements as idiomatic Spark
DataFrame transformations (see SURVEY.md §2 for the inventory):

- ``store``      — the partitioned ``chunks`` table (create/append/delete/
                   listings), mirroring reference ``store.py``.
- ``chunker``    — token-aware recursive chunking (reference ``chunker.py``)
                   as a ``mapInPandas`` flatMap stage.
- ``embedder``   — pluggable embedding contract (reference ``embedder.py``)
                   with a deterministic seeded hash embedder for tests/oracles.
- ``ingest``     — convert → chunk → embed → dedup-gate → append pipeline
                   (reference ``ingestor.py``), fully batch/DataFrame-shaped.
- ``operators``  — search (exact KNN, IVF ANN, BM25, hybrid RRF), dedup
                   (exact / MinHash-LSH / SimHash / n-gram Jaccard /
                   embedding cosine), text stats (lang-id, quality, tokens,
                   fingerprints), top-k.
- ``streaming``  — Structured Streaming ingestion + windowed event analytics
                   (the reference defers streaming to v2; we implement it).

Everything here is DataFrame/Catalyst-first: filters and projections stay
push-down-able, joins are broadcast where one side is small, Python only runs
inside Arrow-batched pandas UDF stages.
"""

from mcpvectordb_spark.config import EngineConfig

__all__ = ["EngineConfig"]
__version__ = "0.1.0"
