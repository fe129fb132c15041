"""Public API facade — the reference's complete tool surface, re-expressed.

One function per MCP tool of the reference (/root/reference/src/mcpvectordb/
server.py:64-420: ingest_file, ingest_url, ingest_content, ingest_folder,
search, list_documents, list_libraries, delete_document, get_document,
server_info), with the same parameter names, validation bounds and result
dict shapes (the behavioral contract of docs/mcp-tool-spec.md).  A user of
the reference can switch to this engine and call the same operations.

Error envelope: like the reference, API calls return
``{"status": "error", "error": ...}`` instead of raising
(docs/mcp-tool-spec.md:287-296); programming errors still raise.
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from mcpvectordb_spark.config import DEFAULT, EngineConfig
from mcpvectordb_spark.embedder import Embedder, HashEmbedder
from mcpvectordb_spark.ingest import ingest_batch
from mcpvectordb_spark.operators.bm25 import bm25_topk
from mcpvectordb_spark.operators.hybrid import rrf_topk, weighted_fuse_topk
from mcpvectordb_spark.operators.knn import knn_topk
from mcpvectordb_spark.store import ChunkStore, InvalidFilterError, build_filter


def _err(msg: str) -> dict:
    return {"status": "error", "error": msg}


class VectorDB:
    """Session-scoped engine handle: SparkSession + store path + embedder.

    The reference opens a cheap LanceDB connection per call
    (store.py:156-160); here the SparkSession is the long-lived context and
    this object is a thin façade over it.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        config: EngineConfig = DEFAULT,
        embedder: Embedder | None = None,
    ):
        self.spark = spark
        self.config = config
        self.store = ChunkStore(spark, path, config)
        self.embedder = embedder or HashEmbedder(dim=config.embedding_dim, config=config)

    def _embedder_factory(self):
        """Closure shipping ONLY the embedder to executors — capturing
        ``self`` would drag the SparkSession into the UDF pickle."""
        emb = self.embedder
        return lambda: emb

    # -- ingestion ----------------------------------------------------------

    def ingest_content(self, content: str, source: str, library: str = "default",
                       metadata: dict | None = None) -> dict:
        """Reference server.py:138-177 — index already-extracted text."""
        if not content or not content.strip():
            return _err("content must be non-empty")
        if not source:
            return _err("source must be non-empty")
        raw = self.spark.createDataFrame(
            [(source, library, content, json.dumps(metadata or {}))],
            "source string, library string, content string, metadata string",
        )
        res = ingest_batch(raw, self.store, self.config,
                           embedder_factory=self._embedder_factory()).collect()[0]
        return {
            "status": res["status"], "doc_id": res["doc_id"], "source": res["source"],
            "library": res["library"], "chunk_count": res["chunk_count"],
            **({"error": res["error"]} if res["error"] else {}),
        }

    def ingest_file(self, path: str, library: str = "default", metadata: dict | None = None) -> dict:
        """Reference server.py:64-99 — read, convert, index one local file."""
        import os

        from mcpvectordb_spark.converter import convert_bytes

        p = os.path.expanduser(path)
        if not os.path.isfile(p):
            return _err(f"file not found: {path}")
        ext = os.path.splitext(p)[1].lstrip(".").lower() or "unknown"
        try:
            text = convert_bytes(open(p, "rb").read(), ext)
        except Exception as exc:
            return _err(f"conversion failed: {exc}")
        return self.ingest_content(text, source=p, library=library, metadata=metadata)

    def ingest_url(self, url: str, library: str = "default", metadata: dict | None = None) -> dict:
        """Reference server.py:101-136 — fetch a URL and index it."""
        if not url.startswith(("http://", "https://")):
            return _err("url must be http(s)")
        from mcpvectordb_spark.converter import convert_bytes
        from mcpvectordb_spark.sources.files import fetch_urls

        row = fetch_urls(self.spark, [url], self.config).collect()[0]
        if row["fetch_error"]:
            return _err(f"fetch failed: {row['fetch_error']}")
        # pick the converter from the Content-Type header, falling back to
        # the URL extension, then html — blindly tag-stripping e.g. a
        # markdown or JSON response would mangle legitimate text
        ctype_map = {
            "text/html": "html", "application/xhtml+xml": "html",
            "text/markdown": "md", "text/plain": "txt", "text/csv": "csv",
            "application/json": "json", "text/xml": "xml", "application/xml": "xml",
        }
        ftype = ctype_map.get(row["content_type"] or "")
        if ftype is None:
            import re as _re

            m = _re.search(r"\.([A-Za-z0-9]+)(?:[?#].*)?$", url)
            ext = (m.group(1).lower() if m else "")
            ftype = ext if ext in ("md", "markdown", "txt", "csv", "json", "xml", "html", "htm") else "html"
        try:
            text = convert_bytes(bytes(row["raw_bytes"]), ftype)
        except Exception as exc:
            return _err(f"conversion failed: {exc}")
        return self.ingest_content(text, source=url, library=library, metadata=metadata)

    def ingest_folder(self, folder: str, library: str = "default", metadata: dict | None = None,
                      recursive: bool = True) -> dict:
        """Reference server.py:180-226 — bulk-ingest a folder as ONE batch
        DAG (the asyncio fan-out becomes scheduler parallelism; per-file
        failures become status rows, SURVEY §3.3)."""
        import os

        from mcpvectordb_spark.converter import convert_stage
        from mcpvectordb_spark.sources.files import read_folder

        if not os.path.isdir(os.path.expanduser(folder)):
            return _err(f"folder not found: {folder}")
        files = read_folder(self.spark, os.path.expanduser(folder), recursive, self.config)
        # cache: the conversion output feeds both the ingest run and the
        # error report — without it the folder is scanned+converted twice
        converted = convert_stage(files).cache()
        raw = converted.select(
            "source",
            F.lit(library).alias("library"),
            F.col("content"),
            F.lit(json.dumps(metadata or {})).alias("metadata"),
            "last_modified",
        )
        results = ingest_batch(raw, self.store, self.config,
                               embedder_factory=self._embedder_factory()).collect()
        # conversion failures surface as empty-content rows; report the
        # converter's actual error for them
        convert_errors = {
            r["source"]: r["convert_error"]
            for r in converted.select("source", "convert_error").filter("convert_error IS NOT NULL").collect()
        }
        converted.unpersist()
        by = {}
        for r in results:
            by[r["status"]] = by.get(r["status"], 0) + 1
        return {
            "status": "completed",
            "total": len(results),
            "indexed": by.get("indexed", 0),
            "replaced": by.get("replaced", 0),
            "skipped": by.get("skipped", 0),
            "failed": by.get("failed", 0),
            "errors": [
                {"source": r["source"], "error": convert_errors.get(r["source"], r["error"])}
                for r in results if r["status"] == "failed"
            ],
        }

    # -- query --------------------------------------------------------------

    def search(self, query: str, top_k: int | None = None, library: str | None = None,
               filter: dict | None = None, fusion: str = "rrf",
               highlight: bool = False, method: str = "exact",
               diversify: float | None = None) -> dict:  # noqa: A002 - reference param name
        """Reference server.py:228-289 — hybrid BM25+vector search with RRF,
        falling back to vector-only when hybrid is disabled (config.py:59).
        Filters are applied BEFORE ranking (mcp-tool-spec.md:110-111).
        ``fusion``: "rrf" (reference default) or "blend" (convex score
        blend over min-max-normalized legs — beyond-reference option).
        ``highlight``: add a ``snippet`` field per result — a windowed
        excerpt with query terms marked (operators/bm25.py::highlight_col;
        beyond-reference).
        ``method``: vector-leg scan strategy — "exact" (flat scan, the
        reference's sub-50k regime), "sq8" (int8 coarse scan + exact
        refine) or "matryoshka" (truncated-dim coarse scan + exact
        refine).  The trained-state ANN paths (IVF / PQ) live behind
        their own maintained indexes (knn.IvfIndex / pq.IvfPqIndex) — a
        per-request train would be neither correct nor honest to time.
        ``diversify``: MMR λ in (0, 1] — rerank the top candidate pool
        with maximal marginal relevance (operators/mmr.py) so near-identical
        chunks of one document stop monopolizing the result page; results
        come back in selection order with the MMR objective as score."""
        if fusion not in ("rrf", "blend"):
            return _err("fusion must be 'rrf' or 'blend'")
        if method not in ("exact", "sq8", "matryoshka"):
            return _err("method must be 'exact', 'sq8' or 'matryoshka'")
        if diversify is not None and not (0.0 < diversify <= 1.0):
            return _err("diversify must be in (0, 1]")
        top_k = self.config.top_k_default if top_k is None else top_k
        if not query or not query.strip():
            return _err("query must be non-empty")
        if not (1 <= top_k <= self.config.top_k_max):
            return _err(f"top_k must be in [1, {self.config.top_k_max}]")
        try:
            pred = build_filter(library, filter)
        except InvalidFilterError as exc:
            return _err(str(exc))

        chunks = self.store.read().filter(pred)
        qv = [float(x) for x in self.embedder.embed_query(query)]
        candidates = max(top_k, top_k * self.config.refine_factor)
        if method == "sq8":
            from mcpvectordb_spark.operators.knn import knn_topk_sq8

            vec_leg = knn_topk_sq8(chunks, qv, candidates, tie_col="id")
        elif method == "matryoshka":
            from mcpvectordb_spark.operators.knn import knn_truncated_topk

            vec_leg = knn_truncated_topk(
                chunks, qv, candidates, dims_coarse=max(8, len(qv) // 4), id_col="id"
            )
        else:
            vec_leg = knn_topk(chunks, qv, candidates, tie_col="id")
        pool_k = candidates if diversify is not None else top_k
        if self.config.hybrid_search_enabled:
            bm_leg = bm25_topk(
                chunks, query, candidates, "id", "content",
                k1=self.config.bm25_k1, b=self.config.bm25_b,
            )
            if fusion == "blend":
                fused = weighted_fuse_topk(
                    vec_leg.select(F.col("id").alias("doc"), "score"), bm_leg,
                    pool_k, alpha=0.5, id_cols=("doc", "doc"),
                    score_cols=("score", "score"), id_col="id", score_col="score",
                )
            else:
                fused = rrf_topk(
                    [(bm_leg, "doc", "score"), (vec_leg.select(F.col("id").alias("doc"), "score"), "doc", "score")],
                    pool_k, k0=self.config.rrf_k0, id_col="id", score_col="score",
                )
            ranked = fused.join(chunks, "id")
        else:
            ranked = vec_leg if diversify is not None else vec_leg.limit(top_k)
        if diversify is not None:
            from mcpvectordb_spark.operators.mmr import mmr_rerank

            pool = ranked.select("id", "embedding", F.col("score").alias("rel"))
            sel = mmr_rerank(pool, top_k, lam=diversify,
                             id_col="id", vec_col="embedding", rel_col="rel")
            ranked = (
                sel.select(F.col("id"), F.col("step"), F.col("mmr").alias("score"))
                .join(chunks.drop("score"), "id")
            )
        if highlight:
            from mcpvectordb_spark.operators.bm25 import highlight_col

            ranked = ranked.withColumn(
                "snippet", highlight_col(F.col("content"), query.lower().split())
            )
        order = [F.asc("step")] if diversify is not None else [F.desc("score"), F.asc("id")]
        rows = ranked.orderBy(*order).collect()
        return {
            "status": "ok",
            "results": [
                {
                    "id": r["id"], "doc_id": r["doc_id"], "source": r["source"],
                    "title": r["title"], "library": r["library"],
                    "content": r["content"], "chunk_index": r["chunk_index"],
                    "score": float(r["score"]),
                    "metadata": json.loads(r["metadata"] or "{}"),
                    "file_type": r["file_type"], "page": r["page"],
                    "last_modified": r["last_modified"],
                    **({"snippet": r["snippet"]} if highlight else {}),
                }
                for r in rows
            ],
        }

    def list_documents(self, library: str | None = None, limit: int = 20, offset: int = 0) -> dict:
        """Reference server.py:291-320."""
        try:
            docs = self.store.list_documents(library, limit, offset)
        except ValueError as exc:
            return _err(str(exc))
        for d in docs:
            d["metadata"] = json.loads(d.get("metadata") or "{}")
        return {"status": "ok", "documents": docs, "count": len(docs)}

    def list_libraries(self) -> dict:
        """Reference server.py:322-338."""
        return {"status": "ok", "libraries": self.store.list_libraries()}

    def delete_document(self, doc_id: str) -> dict:
        """Reference server.py:340-361 (spec: status 'deleted',
        docs/mcp-tool-spec.md:224)."""
        if not doc_id:
            return _err("doc_id must be non-empty")
        deleted = self.store.delete_document(doc_id)
        if deleted == 0:
            return _err(f"document not found: {doc_id}")
        return {"status": "deleted", "doc_id": doc_id, "deleted_chunks": deleted}

    def delete_where(self, library: str | None = None, filter: dict | None = None) -> dict:  # noqa: A002
        """Predicate-scoped delete (beyond reference): same filter contract
        as search (equality AND, key whitelist); whole documents drop.
        Requires at least one predicate — an empty filter would truncate
        the store, which deserves an explicit API, not a default."""
        if library is None and not filter:
            return _err("delete_where requires a library and/or filter")
        try:
            deleted = self.store.delete_where(library, filter)
        except InvalidFilterError as exc:
            return _err(str(exc))
        return {"status": "deleted", "deleted_chunks": deleted}

    def snapshot(self, tag: str | None = None) -> dict:
        """Create a zero-copy store snapshot (store.py::snapshot)."""
        try:
            version = self.store.snapshot(tag)
        except NotImplementedError as exc:
            return _err(str(exc))
        return {"status": "ok", "version": version, "tag": tag}

    def list_snapshots(self) -> dict:
        return {"status": "ok", "snapshots": self.store.snapshots()}

    def restore(self, version: int) -> dict:
        """Roll the store back to a snapshot; the pre-restore state is
        auto-snapshotted (tag 'pre-restore') and its version returned."""
        try:
            safety = self.store.restore(version)
        except (ValueError, NotImplementedError) as exc:
            return _err(str(exc))
        return {"status": "ok", "restored": version, "pre_restore_version": safety}

    def get_document(self, doc_id: str) -> dict:
        """Reference server.py:363-398."""
        if not doc_id:
            return _err("doc_id must be non-empty")
        doc = self.store.get_document(doc_id)
        if doc is None:
            return _err(f"document not found: {doc_id}")
        doc["metadata"] = json.loads(doc.get("metadata") or "{}")
        return {"status": "ok", **doc}

    def server_info(self, check_path: str | None = None) -> dict:
        """Reference server.py:400-420 (spec docs/mcp-tool-spec.md:253-285):
        diagnostics + optional ``check_path`` readability probe."""
        import os
        import sys as _sys

        libs = self.store.list_libraries()
        info = {
            "status": "ok",
            "engine": "mcpvectordb_spark",
            "platform": _sys.platform,
            "python_version": _sys.version.split()[0],
            "spark_version": self.spark.version,
            "cwd": os.getcwd(),
            "store_path": self.store.path,
            "embedding_dim": self.config.embedding_dim,
            "hybrid_search_enabled": self.config.hybrid_search_enabled,
            "chunk_size_tokens": self.config.chunk_size_tokens,
            "libraries": len(libs),
            "documents": sum(l["document_count"] for l in libs),
            "chunks": sum(l["chunk_count"] for l in libs),
        }
        if check_path is not None:
            p = os.path.expanduser(check_path)
            probe: dict = {"path": check_path}
            try:
                probe["readable"] = os.path.isfile(p) and os.access(p, os.R_OK)
                if probe["readable"]:
                    probe["size_bytes"] = os.path.getsize(p)
                else:
                    probe["error"] = "not a readable file"
            except OSError as exc:
                probe["readable"] = False
                probe["error"] = str(exc)
            info["path_check"] = probe
        return info
