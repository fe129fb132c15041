"""Distributed word-embedding training: SGNS-as-matrix-factorization
(Levy & Goldberg, NeurIPS 2014 — "Neural Word Embedding as Implicit Matrix
Factorization").  word2vec's skip-gram-negative-sampling objective is
implicitly factorizing the shifted positive PMI (SPPMI) matrix; factorizing
it explicitly gives comparable embeddings with a fully deterministic,
Spark-friendly split of the work:

- **corpus-scale (distributed)**: token counts, windowed co-occurrence
  counts, document embedding (mean-pooled word vectors via a hash join +
  keyed agg).  These scan the 100 TB side and shuffle only (hash, count)
  pairs / small vectors.
- **vocab-scale (driver)**: the SPPMI matrix is vocab × vocab with vocab
  capped (top-N by frequency, the standard practice), so the SVD runs on a
  bounded dense matrix — the same bounded-driver-state pattern as the BPE
  merge loop and the logistic-GD weight vector.

Unlike MiniTransformerEmbedder (seeded, untrained — plumbing only), the
vectors produced here are TRAINED on the corpus: co-occurring words land
near each other, so similarity search over the output is semantically
meaningful.  The embedder-protocol wrapper lives in
mcpvectordb_spark.embedder.PmiSvdEmbedder.

Reference anchor: the reference's embedder is a pretrained ONNX runtime
(/root/reference/src/mcpvectordb/embedder.py:41-83); this module is the
in-container trained-vector substitute for environments without a model
stack.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.bm25 import tokens_col
from mcpvectordb_spark.operators.dedup import fan_out


def vocab_top_n(df: DataFrame, text_col: str, vocab_size: int) -> DataFrame:
    """(term, tid, n) — the ``vocab_size`` most frequent tokens, ranked by
    (count desc, term asc) so ids are deterministic."""
    from pyspark.sql import Window

    counts = (
        fan_out(df)
        .select(F.explode(tokens_col(F.col(text_col))).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.orderBy(F.col("n").desc(), F.col("term").asc())
    # rank window over the GLOBAL count table: vocab-scale (bounded by the
    # distinct-token count post-agg), not corpus-scale
    return (
        counts.withColumn("tid", F.row_number().over(w) - 1)
        .filter(F.col("tid") < vocab_size)
        .select("term", "tid", "n")
    )


def cooccurrence_counts(
    df: DataFrame, id_col: str, text_col: str, vocab: DataFrame, window: int = 2
) -> DataFrame:
    """(tid_a, tid_b, n) symmetric windowed co-occurrence counts over
    vocab tokens.  Pairs explode per position with fanout <= 2·window (the
    bounded-fanout explode pattern); out-of-vocab tokens drop at the hash
    join.  One corpus explode + two broadcast joins + one keyed agg.
    Positional pairing stays within one document via the REAL document id
    (a generated id could diverge between the join's two lazy branches)."""
    toks = fan_out(df).select(
        F.col(id_col).alias("_doc"),
        F.posexplode(tokens_col(F.col(text_col))).alias("pos", "term"),
    )
    v = F.broadcast(vocab.select("term", "tid"))
    a = toks.join(v, "term").select("_doc", "pos", F.col("tid").alias("ta"))
    b = toks.join(v, "term").select(
        "_doc", F.col("pos").alias("pos_b"), F.col("tid").alias("tb")
    )
    pairs = a.join(b, "_doc").filter(
        (F.col("pos_b") > F.col("pos")) & (F.col("pos_b") <= F.col("pos") + window)
    )
    sym = pairs.select("ta", "tb").unionByName(
        pairs.select(F.col("tb").alias("ta"), F.col("ta").alias("tb"))
    )
    return sym.groupBy("ta", "tb").agg(F.count(F.lit(1)).cast("long").alias("n"))


def sppmi_word_vectors(
    cooc_rows: list, vocab_size: int, dim: int, shift: float = 1.0
):
    """Driver-side: densify the co-occurrence triples, build the shifted
    positive PMI matrix, and factorize with SVD (symmetric weighting
    U·sqrt(S), the Levy-Goldberg recommendation).  Deterministic for a
    fixed input; vocab_size is capped upstream so the dense matrix is
    bounded (500² doubles = 2 MB)."""
    import numpy as np

    M = np.zeros((vocab_size, vocab_size))
    for r in cooc_rows:
        M[int(r["ta"]), int(r["tb"])] = float(r["n"])
    total = M.sum()
    if total == 0:
        return np.zeros((vocab_size, dim), dtype=np.float64)
    row = M.sum(axis=1, keepdims=True)
    col = M.sum(axis=0, keepdims=True)
    with np.errstate(divide="ignore", invalid="ignore"):
        pmi = np.log((M * total) / (row @ col))
    pmi[~np.isfinite(pmi)] = 0.0
    sppmi = np.maximum(pmi - shift, 0.0)
    u, s, _ = np.linalg.svd(sppmi, full_matrices=False)
    k = min(dim, len(s))
    vec = u[:, :k] * np.sqrt(s[:k])
    if k < dim:
        vec = np.pad(vec, ((0, 0), (0, dim - k)))
    return vec


def train_word_vectors(
    df: DataFrame, id_col: str, text_col: str, dim: int = 32,
    vocab_size: int = 500, window: int = 2
) -> DataFrame:
    """End-to-end: distributed counts -> driver SVD -> (term, tid, vector)
    DataFrame ready for the embedding join."""
    spark = df.sparkSession
    vocab = vocab_top_n(df, text_col, vocab_size).localCheckpoint(eager=True)
    n_vocab = vocab.count()
    cooc = cooccurrence_counts(df, id_col, text_col, vocab, window).collect()
    vec = sppmi_word_vectors(cooc, n_vocab, dim)
    rows = [(int(i), [float(x) for x in vec[i]]) for i in range(n_vocab)]
    vdf = spark.createDataFrame(rows, "tid int, vector array<double>")
    return vocab.join(vdf, "tid").select("term", "tid", "vector")


def embed_documents_df(
    df: DataFrame, id_col: str, text_col: str, word_vectors: DataFrame, dim: int
) -> DataFrame:
    """(id, embedding) — L2-normalized mean of in-vocab word vectors,
    fully distributed: explode tokens, broadcast-join the vocab-bounded
    vector table, one keyed agg summing fixed-width arrays.  Docs with no
    in-vocab token embed as the zero vector."""
    toks = fan_out(df).select(
        F.col(id_col).alias("id"), F.explode(tokens_col(F.col(text_col))).alias("term")
    )
    j = toks.join(F.broadcast(word_vectors.select("term", "vector")), "term")
    sums = j.groupBy("id").agg(
        *[F.sum(F.col("vector")[i]).alias(f"_s{i}") for i in range(dim)],
        F.count(F.lit(1)).alias("_n"),
    )
    # 9dp-quantized mean (the mean_pool_embeddings discipline): the sum's
    # partial-aggregation order is not deterministic, so a raw mean could
    # flip a downstream cosine top-k at a near-tie; the quantum sits three
    # decades under any real score gap (caught by rankkey_report, r8).
    # round() wraps each summed coordinate directly so the audit sees the
    # discipline in the resolved sort key.
    mean = F.array(
        *[F.round(F.col(f"_s{i}") / F.col("_n"), 9) for i in range(dim)]
    )
    nrm = F.sqrt(F.aggregate(mean, F.lit(0.0), lambda a, x: a + x * x))
    unit = F.when(nrm > 0, F.transform(mean, lambda x: x / nrm)).otherwise(mean)
    out = sums.select("id", unit.alias("embedding"))
    # docs with zero in-vocab tokens: left-join back as zero vectors
    all_ids = df.select(F.col(id_col).alias("id"))
    zeros = F.array_repeat(F.lit(0.0), dim)
    return (
        all_ids.join(out, "id", "left")
        .select("id", F.coalesce("embedding", zeros).alias("embedding"))
    )
