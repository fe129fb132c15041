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


class MiniTransformerEmbedder:
    """Pure-numpy transformer encoder with deterministic seeded weights —
    a REAL inference workload (hash tokenizer → embedding lookup → 2
    pre-norm self-attention + GELU-FFN blocks → masked mean-pool → L2
    norm) that runs with no model stack installed, so the executor-side
    embedding seam (prefixes, batch-32 inference, singleton-per-executor,
    L2 contract, Arrow batching) is integration-tested in any container.

    The weights are untrained: vectors carry no semantic meaning, and
    this class is never an implicit fallback for the pretrained backends
    (get_real_embedder still raises without a model stack unless
    ``allow_untrained=True`` is passed explicitly).  What it proves is the
    plumbing — the exact contract the reference's ONNX runtime plugs into
    (reference embedder.py:41-83)."""

    def __init__(
        self,
        dim: int = 64,
        config: EngineConfig = DEFAULT,
        vocab: int = 4096,
        n_layers: int = 2,
        n_heads: int = 4,
        max_len: int = 128,
        seed: int = 7,
    ):
        if dim % n_heads:
            raise ValueError(f"dim {dim} not divisible by n_heads {n_heads}")
        rng = np.random.default_rng(seed)
        s = 1.0 / np.sqrt(dim)
        self.dim, self.vocab, self.max_len, self.n_heads = dim, vocab, max_len, n_heads
        self.doc_prefix = config.doc_prefix
        self.query_prefix = config.query_prefix
        self._batch = config.embedding_batch_size
        self.tok_emb = rng.normal(0, s, (vocab, dim))
        self.pos_emb = rng.normal(0, s, (max_len, dim))
        self.layers = [
            {
                name: rng.normal(0, s, shape)
                for name, shape in (
                    ("wq", (dim, dim)), ("wk", (dim, dim)), ("wv", (dim, dim)),
                    ("wo", (dim, dim)), ("w1", (dim, 4 * dim)), ("w2", (4 * dim, dim)),
                )
            }
            for _ in range(n_layers)
        ]

    def _tokenize(self, text: str) -> list[int]:
        import re

        toks = re.findall(r"\w+|[^\w\s]", text.lower())[: self.max_len]
        return [
            int.from_bytes(hashlib.sha256(t.encode("utf-8")).digest()[:4], "big") % self.vocab
            for t in toks
        ] or [0]

    @staticmethod
    def _ln(x: np.ndarray) -> np.ndarray:
        mu = x.mean(-1, keepdims=True)
        return (x - mu) / np.sqrt(((x - mu) ** 2).mean(-1, keepdims=True) + 1e-6)

    def _forward(self, ids: np.ndarray, mask: np.ndarray) -> np.ndarray:
        B, L = ids.shape
        h, dh = self.n_heads, self.dim // self.n_heads
        x = self.tok_emb[ids] + self.pos_emb[:L]
        neg = (1.0 - mask)[:, None, None, :] * -1e9  # (B,1,1,L) pad mask
        for lay in self.layers:
            y = self._ln(x)
            q, k, v = (
                (y @ lay[w]).reshape(B, L, h, dh).transpose(0, 2, 1, 3)
                for w in ("wq", "wk", "wv")
            )
            att = (q @ k.transpose(0, 1, 3, 2)) / np.sqrt(dh) + neg
            att = np.exp(att - att.max(-1, keepdims=True))
            att /= att.sum(-1, keepdims=True)
            x = x + ((att @ v).transpose(0, 2, 1, 3).reshape(B, L, self.dim)) @ lay["wo"]
            y = self._ln(x)
            g = y @ lay["w1"]
            g = 0.5 * g * (1.0 + np.tanh(0.7978845608 * (g + 0.044715 * g**3)))  # GELU
            x = x + g @ lay["w2"]
        pooled = (x * mask[..., None]).sum(1) / mask.sum(1)[..., None]
        norms = np.linalg.norm(pooled, axis=1, keepdims=True)
        norms[norms == 0] = 1.0
        return (pooled / norms).astype(np.float32)

    def _embed(self, texts: list[str]) -> np.ndarray:
        out = []
        for start in range(0, len(texts), self._batch):
            chunk = [self._tokenize(t) for t in texts[start : start + self._batch]]
            L = max(len(c) for c in chunk)
            ids = np.zeros((len(chunk), L), dtype=np.int64)
            mask = np.zeros((len(chunk), L), dtype=np.float64)
            for i, c in enumerate(chunk):
                ids[i, : len(c)] = c
                mask[i, : len(c)] = 1.0
            out.append(self._forward(ids, mask))
        return np.concatenate(out, axis=0)

    def embed_documents(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return self._embed([self.doc_prefix + t for t in texts])

    def embed_query(self, text: str) -> np.ndarray:
        return self._embed([self.query_prefix + text])[0]


def get_real_embedder(
    dim: int = 768, config: EngineConfig = DEFAULT, allow_untrained: bool = False
) -> Embedder:
    """Real model path (reference embedder.py:41-62): first available of
    fastembed (the reference's own runtime) then sentence-transformers,
    behind the same :class:`Embedder` protocol.  Raises NotImplementedError
    with a clear message when neither stack is installed — HashEmbedder
    remains the deterministic test/oracle mode either way (mirrors the
    reference's mock embedder, tests/conftest.py:26-39).

    ``allow_untrained=True`` opts in to the :class:`MiniTransformerEmbedder`
    (pure-numpy, seeded, UNTRAINED) as a last resort — an explicit choice
    for plumbing/integration work, never a silent semantic downgrade."""
    errors = []
    for cls in (FastembedEmbedder, SentenceTransformerEmbedder):
        try:
            return cls(dim=dim, config=config)
        except ImportError as exc:
            errors.append(f"{cls.__name__}: {exc}")
    if allow_untrained:
        return MiniTransformerEmbedder(dim=min(dim, 128), config=config)
    raise NotImplementedError(
        "no real embedding runtime available (tried fastembed, "
        "sentence-transformers); use HashEmbedder (deterministic) or install "
        "a model stack (pip install 'mcpvectordb-spark[real-embed]'), or pass "
        "allow_untrained=True for the seeded MiniTransformerEmbedder. "
        "Details: " + "; ".join(errors)
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


class PmiSvdEmbedder:
    """TRAINED in-container embedder: word vectors learned from the corpus
    by SGNS-as-matrix-factorization (operators/w2v.py — Levy & Goldberg
    2014), documents embedded as the L2-normalized mean of in-vocab word
    vectors.  Unlike MiniTransformerEmbedder (seeded, untrained), these
    vectors carry real distributional semantics: co-occurring words are
    close, so similarity search over the output is meaningful.  The
    corpus-scale work (counts, co-occurrence, doc embedding) is
    distributed; only the vocab-bounded SVD runs on the driver.

    Deterministic end-to-end (ranked vocab, exact counts, LAPACK SVD on a
    fixed matrix), so the w2v catalog query can golden-digest-gate the
    whole train→embed path.  Fills the trained-vector slot of the
    reference's pretrained-ONNX seam (reference embedder.py:41-83) in
    environments with no model stack; the pretrained backends
    (FastembedEmbedder / SentenceTransformerEmbedder) stay preferred when
    installed."""

    def __init__(self, word_vectors: dict, dim: int, config: EngineConfig = DEFAULT):
        self.word_vectors = word_vectors
        self.dim = dim
        self.doc_prefix = config.doc_prefix
        self.query_prefix = config.query_prefix

    @classmethod
    def fit(
        cls,
        df,
        id_col: str,
        text_col: str,
        dim: int = 32,
        vocab_size: int = 500,
        window: int = 2,
        config: EngineConfig = DEFAULT,
    ) -> "PmiSvdEmbedder":
        from mcpvectordb_spark.operators.w2v import train_word_vectors

        wv = train_word_vectors(df, id_col, text_col, dim, vocab_size, window)
        table = {
            r["term"]: np.asarray(r["vector"], dtype=np.float64) for r in wv.collect()
        }
        return cls(table, dim, config)

    def _embed_one(self, text: str) -> np.ndarray:
        toks = [t for t in text.lower().split() if t]
        vecs = [self.word_vectors[t] for t in toks if t in self.word_vectors]
        if not vecs:
            return np.zeros(self.dim, dtype=np.float32)
        mean = np.mean(vecs, axis=0)
        n = float(np.linalg.norm(mean))
        return (mean / n if n > 0 else mean).astype(np.float32)

    def embed_documents(self, texts: list[str]) -> np.ndarray:
        if not texts:
            return np.zeros((0, self.dim), dtype=np.float32)
        return np.stack([self._embed_one(self.doc_prefix + t) for t in texts])

    def embed_query(self, text: str) -> np.ndarray:
        return self._embed_one(self.query_prefix + text)
