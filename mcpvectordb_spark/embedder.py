"""Embedding contract + deterministic test embedder.

Reference contract (/root/reference/src/mcpvectordb/embedder.py:14-15,41-83):
documents are embedded with prefix ``"search_document: "``, queries with
``"search_query: "`` (asymmetric-prefix requirement of nomic models —
SURVEY.md §2.9 D4); batch inference over 32-text batches; vectors are
L2-normalised so dot product == cosine similarity.

Spark shape: embedding is an Arrow-batched ``mapInPandas`` stage with the
model held in an executor-process singleton (the Spark analog of the
reference's singleton, embedder.py:86-94).  Query embedding is a single
driver-side call whose result is inlined as a literal array into the scoring
expression (broadcast with the plan).

The default implementation is the *deterministic seeded hash embedder* from
FIXTURES.md rule 1 — mirroring the reference's mock embedder that replaces
the real model in every correctness test (tests/conftest.py:26-39):

    embed(text)[i] = (sha256(text + ":" + str(i)) mod 10^6) / 10^6,  L2-normed

A real ONNX/fastembed model can be slotted in behind the same protocol; it is
gated behind an import-try since the model libs aren't in this container.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING, Protocol

import numpy as np

from mcpvectordb_spark.config import DEFAULT, EngineConfig

if TYPE_CHECKING:
    import pandas as pd
    from pyspark.sql import DataFrame


class Embedder(Protocol):
    dim: int

    def embed_documents(self, texts: list[str]) -> np.ndarray: ...
    def embed_query(self, text: str) -> np.ndarray: ...


class HashEmbedder:
    """Deterministic, dimension-agnostic embedder (FIXTURES.md rule 1)."""

    def __init__(self, dim: int = DEFAULT.embedding_dim, config: EngineConfig = DEFAULT):
        self.dim = dim
        self.doc_prefix = config.doc_prefix
        self.query_prefix = config.query_prefix
        self._suffixes = [str(i).encode("ascii") for i in range(dim)]

    def _embed_one(self, text: str) -> np.ndarray:
        # sha256(text + ":" + str(i)) per dim (FIXTURES.md rule 1), computed
        # via one base digest over `text + ":"` cloned per dimension —
        # identical output, O(len(text)) hashing instead of O(dim·len(text)).
        # int.from_bytes(digest) == int(hexdigest, 16), minus the hex detour.
        base = hashlib.sha256((text + ":").encode("utf-8"))
        copy = base.copy
        vals = np.empty(self.dim, dtype=np.float64)
        for i, suffix in enumerate(self._suffixes):
            h = copy()
            h.update(suffix)
            vals[i] = int.from_bytes(h.digest(), "big") % 1_000_000
        vals /= 1_000_000.0
        norm = float(np.linalg.norm(vals))
        if norm > 0:
            vals /= norm
        return vals.astype(np.float32)

    def embed_documents(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack([self._embed_one(self.doc_prefix + t) for t in texts])

    def embed_query(self, text: str) -> np.ndarray:
        return self._embed_one(self.query_prefix + text)


class FastembedEmbedder:
    """Real model inference via fastembed/ONNX (reference embedder.py:41-83):
    same model (nomic-embed-text-v1.5), same asymmetric prefixes, batch-32
    inference, L2-normalised output. Import-gated: constructing it without
    the fastembed stack raises ImportError."""

    def __init__(
        self,
        model_name: str = "nomic-ai/nomic-embed-text-v1.5",
        dim: int = 768,
        config: EngineConfig = DEFAULT,
    ):
        from fastembed import TextEmbedding  # type: ignore

        self._model = TextEmbedding(model_name=model_name)
        self.dim = dim
        self.doc_prefix = config.doc_prefix
        self.query_prefix = config.query_prefix
        self._batch = config.embedding_batch_size

    def _embed(self, texts: list[str]) -> np.ndarray:
        arr = np.stack(
            [np.asarray(v, dtype=np.float32) for v in self._model.embed(texts, batch_size=self._batch)]
        )
        norms = np.linalg.norm(arr, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (arr / norms).astype(np.float32)

    def embed_documents(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return self._embed([self.doc_prefix + t for t in texts])

    def embed_query(self, text: str) -> np.ndarray:
        return self._embed([self.query_prefix + text])[0]


class SentenceTransformerEmbedder:
    """Alternate real backend over sentence-transformers, same contract."""

    def __init__(
        self,
        model_name: str = "nomic-ai/nomic-embed-text-v1.5",
        dim: int = 768,
        config: EngineConfig = DEFAULT,
    ):
        from sentence_transformers import SentenceTransformer  # type: ignore

        self._model = SentenceTransformer(model_name, trust_remote_code=False)
        self.dim = dim
        self.doc_prefix = config.doc_prefix
        self.query_prefix = config.query_prefix
        self._batch = config.embedding_batch_size

    def _embed(self, texts: list[str]) -> np.ndarray:
        arr = self._model.encode(
            texts, batch_size=self._batch, normalize_embeddings=True, convert_to_numpy=True
        )
        return np.asarray(arr, dtype=np.float32)

    def embed_documents(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return self._embed([self.doc_prefix + t for t in texts])

    def embed_query(self, text: str) -> np.ndarray:
        return self._embed([self.query_prefix + text])[0]


def get_real_embedder(dim: int = 768, config: EngineConfig = DEFAULT) -> Embedder:
    """Real model path (reference embedder.py:41-62): first available of
    fastembed (the reference's own runtime) then sentence-transformers,
    behind the same :class:`Embedder` protocol.  Raises NotImplementedError
    with a clear message when neither stack is installed — HashEmbedder
    remains the deterministic test/oracle mode either way (mirrors the
    reference's mock embedder, tests/conftest.py:26-39)."""
    errors = []
    for cls in (FastembedEmbedder, SentenceTransformerEmbedder):
        try:
            return cls(dim=dim, config=config)
        except ImportError as exc:
            errors.append(f"{cls.__name__}: {exc}")
    raise NotImplementedError(
        "no real embedding runtime available (tried fastembed, "
        "sentence-transformers); use HashEmbedder (deterministic) or install "
        "a model stack. Details: " + "; ".join(errors)
    )


def embed_documents_stage(
    df: "DataFrame",
    content_col: str = "content",
    out_col: str = "embedding",
    dim: int = DEFAULT.embedding_dim,
    config: EngineConfig = DEFAULT,
    embedder_factory=None,
) -> "DataFrame":
    """Append an ``array<float>`` embedding column via mapInPandas.

    ``embedder_factory`` is called once per executor process (singleton
    pattern); defaults to the deterministic HashEmbedder.
    """
    batch = config.embedding_batch_size
    factory = embedder_factory or (lambda: HashEmbedder(dim=dim, config=config))
    out_schema = ", ".join(
        [f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema]
        + [f"`{out_col}` array<float>"]
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        emb = factory()  # one model instance per executor task stream
        for pdf in batches:
            texts = pdf[content_col].fillna("").tolist()
            vecs: list[list[float]] = []
            for start in range(0, len(texts), batch):
                arr = emb.embed_documents(texts[start : start + batch])
                vecs.extend(arr.tolist())
            pdf = pdf.copy()
            pdf[out_col] = vecs
            yield pdf

    return df.mapInPandas(run, schema=out_schema)
