"""Product quantization (PQ) for vector search.

Reference parity: the reference's vector store switches to an IVF-**PQ**
index once the corpus outgrows exact scan
(/root/reference/src/mcpvectordb/store.py:274).  The IVF half (coarse
cells) lives in ``operators/knn.py``; this module supplies the PQ half:
per-subspace codebooks, m-byte codes, and ADC (asymmetric distance
computation) scanning with exact refine — Jégou et al. 2011, "Product
Quantization for Nearest Neighbor Search".

Scale notes (the 100 TB shape):
- codes are ``m`` small ints per vector (d×4 bytes → m bytes: 64-d float32
  → 8 bytes, 32×).  The coarse ADC scan projects ONLY ``(id, codes)`` — at
  scale that is the entire read for the first pass, so the embedding column
  never leaves parquet until the k×refine candidates are known;
- the ADC lookup table is m×ksub doubles (≈2 KB) computed driver-side from
  the query and planted as ONE flat literal array; the scan itself is a
  pure codegen ``aggregate`` over it — no join, no shuffle, no Python;
- encoding is map-only: the codebook (m×ksub×dsub doubles, ≈16 KB) is
  folded into the plan as a nested literal and the per-subspace argmin is
  a codegen'd fold — encoding 100 TB is an embarrassingly parallel scan;
- training: the seeded codebook is the subvectors of the ``ksub``
  lowest-id corpus rows — trained-state-free and SQL-replayable (the same
  convention ``dedup.semdedup`` uses for its k-means cells), so the
  catalog oracle re-runs the WHOLE pipeline including argmin tie-breaks.
  :func:`pq_refine_codebooks` then runs Lloyd iterations as joint
  joins+aggs across all m subspaces at once (one shuffle per iteration
  moving (id, subspace, code) triples, never vectors) — the trained-state
  path, digest-gated like ``semdedup_refined``.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

Codebooks = list[list[list[float]]]  # [subspace][code][dim]


def seed_codebooks(
    corpus: DataFrame,
    m: int,
    ksub: int,
    id_col: str = "id",
    vec_col: str = "embedding",
) -> Codebooks:
    """Deterministic seed codebooks: subspace slices of the ``ksub``
    lowest-id corpus vectors (code order == id order).  O(ksub) driver
    rows — the PQ analog of semdedup's lowest-id centroid seed."""
    rows = (
        corpus.select(id_col, F.col(vec_col).cast("array<double>").alias("v"))
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"corpus has {len(rows)} rows < ksub={ksub}")
    d = len(rows[0]["v"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        [[float(x) for x in r["v"][j * dsub : (j + 1) * dsub]] for r in rows]
        for j in range(m)
    ]


def _cb_lit(cb: Codebooks) -> Column:
    return F.array(
        *[
            F.array(*[F.array(*[F.lit(x) for x in cent]) for cent in sub])
            for sub in cb
        ]
    )


def pq_encode_col(vec: Column, cb: Codebooks) -> Column:
    """Codes column: per subspace, the argmin-L2² codebook entry (lowest
    code wins ties — the fold replaces only on strictly smaller dist).
    Pure codegen: nested aggregate folds over the literal codebook, so
    encoding is a map-only stage with zero shuffle."""
    m, ksub, dsub = len(cb), len(cb[0]), len(cb[0][0])
    CB = _cb_lit(cb)
    v = vec.cast("array<double>")

    def best(j: Column) -> Column:
        sub = F.slice(v, j * dsub + 1, dsub)
        cbj = F.element_at(CB, j + 1)

        def step(acc: Column, c: Column) -> Column:
            d2 = F.aggregate(
                F.zip_with(sub, F.element_at(cbj, c + 1), lambda x, y: (x - y) * (x - y)),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            return F.when(
                d2 < acc["d"], F.struct(c.alias("c"), d2.alias("d"))
            ).otherwise(acc)

        return F.aggregate(
            F.sequence(F.lit(0), F.lit(ksub - 1)),
            F.struct(F.lit(-1).alias("c"), F.lit(float("inf")).alias("d")),
            step,
            lambda acc: acc["c"],
        )

    return F.transform(F.sequence(F.lit(0), F.lit(m - 1)), best)


def pq_encode_pandas(cb: Codebooks):
    """Arrow/BLAS encode twin of :func:`pq_encode_col`: one
    ||sub||² − 2·sub·C + ||C||² matrix per (batch, subspace), argmin along
    the code axis (numpy argmin keeps the lowest code on ties — the same
    tie-break as the strict-less fold, pinned by test_pq's shared NumPy
    twin).  At web scale the fold's interpreted per-candidate expression
    walk is the encode bottleneck; the matmul path is the build-time
    default, the expression path the in-plan/oracle-audit form."""
    import numpy as np
    import pandas as pd

    C = [np.asarray(sub, dtype=np.float64) for sub in cb]  # m × ksub × dsub
    Cn = [np.sum(c * c, axis=1) for c in C]
    m, dsub = len(C), C[0].shape[1]

    def enc(s):
        vals = s.tolist()
        out = []
        ok_idx = [i for i, v in enumerate(vals) if v is not None and len(v) == m * dsub]
        codes = {}
        if ok_idx:
            X = np.asarray([vals[i] for i in ok_idx], dtype=np.float64)
            per = np.empty((len(ok_idx), m), dtype=np.int32)
            for j in range(m):
                sub = X[:, j * dsub : (j + 1) * dsub]
                d2 = Cn[j][None, :] - 2.0 * (sub @ C[j].T)  # + |sub|² is argmin-invariant
                per[:, j] = d2.argmin(axis=1)
            codes = {i: per[r].tolist() for r, i in enumerate(ok_idx)}
        for i in range(len(vals)):
            out.append(codes.get(i))
        return pd.Series(out)

    enc.__annotations__ = {"s": pd.Series, "return": pd.Series}
    return F.pandas_udf(enc, "array<int>")


def pq_encode(
    corpus: DataFrame,
    cb: Codebooks,
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    impl: str = "expr",
) -> DataFrame:
    """``impl``: "expr" (codegen fold — the oracle-audit form), "pandas"
    (Arrow/BLAS batch — the build-time scale path; identical codes, the
    equality is test-pinned)."""
    if impl == "pandas":
        return corpus.withColumn(
            codes_col, pq_encode_pandas(cb)(F.col(vec_col).cast("array<double>"))
        )
    return corpus.withColumn(codes_col, pq_encode_col(F.col(vec_col), cb))


def pq_lut(query: Sequence[float], cb: Codebooks) -> list[float]:
    """Flat m×ksub ADC table: lut[j*ksub+c] = <query_j, cb[j][c]> — the
    inner-product decomposition  <q, x> ≈ Σ_j <q_j, c_{j,code_j}>."""
    m, ksub, dsub = len(cb), len(cb[0]), len(cb[0][0])
    q = [float(x) for x in query]
    return [
        sum(q[j * dsub + i] * cb[j][c][i] for i in range(dsub))
        for j in range(m)
        for c in range(ksub)
    ]


def pq_adc_col(codes: Column, lut: Sequence[float], ksub: int) -> Column:
    """Approximate inner product from codes alone: Σ_j lut[j*ksub+codes[j]].
    The table is a plan literal; the walk is a codegen'd fold."""
    LUT = F.array(*[F.lit(float(x)) for x in lut])
    m = len(lut) // ksub
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.lit(0.0),
        lambda acc, j: acc + F.element_at(LUT, j * ksub + F.element_at(codes, j + 1) + 1),
    )


def pq_topk(
    encoded: DataFrame,
    cb: Codebooks,
    query: Sequence[float],
    k: int,
    refine: int = 4,
    id_col: str = "id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    score_col: str = "score",
) -> DataFrame:
    """ADC coarse scan → exact refine (refine_factor semantics, reference
    store.py:302).  The coarse pass projects only ``(id, codes)``; the
    k×refine survivor ids broadcast back onto the corpus for exact
    inner-product rescoring, so full vectors are read for k×refine rows
    only.  Caller supplies L2-normalized vectors when cosine is wanted."""
    from mcpvectordb_spark.operators.knn import dot, query_vec_lit

    ksub = len(cb[0])
    lut = pq_lut(query, cb)
    cand = (
        encoded.select(id_col, codes_col)
        .withColumn("__adc", pq_adc_col(F.col(codes_col), lut, ksub))
        .orderBy(F.desc("__adc"), F.asc(id_col))
        .limit(k * refine)
        .select(id_col)
    )
    q = query_vec_lit(query)
    return (
        encoded.join(F.broadcast(cand), id_col, "left_semi")
        .withColumn(score_col, dot(F.col(vec_col), q))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


def codebooks_df(spark, cb: Codebooks) -> DataFrame:
    rows = [
        (j, c, cent) for j, sub in enumerate(cb) for c, cent in enumerate(sub)
    ]
    return spark.createDataFrame(rows, "subspace int, code int, centroid array<double>")


def pq_refine_codebooks(
    corpus: DataFrame,
    cb: Codebooks,
    iters: int = 3,
    vec_col: str = "embedding",
) -> Codebooks:
    """Lloyd refinement of all m codebooks JOINTLY: one posexplode turns the
    corpus into (subspace, subvec) rows, each iteration is encode (map-only
    codegen fold against the current literal codebook) + one (subspace,
    code) mean aggregation — m×ksub result rows per round, collected to
    re-seed the next literal.  Empty cells keep their previous centroid, so
    the codebook shape is stable.  Deterministic: assignment tie-breaks to
    the lowest code, means are computed per-dimension with ``avg`` over a
    fixed row set."""
    m, ksub, dsub = len(cb), len(cb[0]), len(cb[0][0])
    v = F.col(vec_col).cast("array<double>")
    subs = corpus.select(
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(m - 1)),
                lambda j: F.slice(v, j * dsub + 1, dsub),
            )
        ).alias("subspace", "subvec")
    )
    for _ in range(iters):
        CB = _cb_lit(cb)
        cbj = F.element_at(CB, F.col("subspace") + 1)

        def step(acc: Column, c: Column) -> Column:
            d2 = F.aggregate(
                F.zip_with(
                    F.col("subvec"), F.element_at(cbj, c + 1), lambda x, y: (x - y) * (x - y)
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            return F.when(
                d2 < acc["d"], F.struct(c.alias("c"), d2.alias("d"))
            ).otherwise(acc)

        assigned = subs.withColumn(
            "code",
            F.aggregate(
                F.sequence(F.lit(0), F.lit(ksub - 1)),
                F.struct(F.lit(-1).alias("c"), F.lit(float("inf")).alias("d")),
                step,
                lambda acc: acc["c"],
            ),
        )
        means = (
            assigned.groupBy("subspace", "code")
            .agg(
                *[
                    F.avg(F.element_at("subvec", i + 1)).alias(f"d{i}")
                    for i in range(dsub)
                ]
            )
            .collect()
        )
        new = [[list(cent) for cent in sub] for sub in cb]
        for r in means:
            new[r["subspace"]][r["code"]] = [float(r[f"d{i}"]) for i in range(dsub)]
        cb = new
    return cb


def seed_residual_codebooks(
    assigned: DataFrame,
    centroids: DataFrame,
    m: int,
    ksub: int,
    id_col: str = "id",
    vec_col: str = "embedding",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
) -> Codebooks:
    """Seed codebooks over RESIDUALS (x − centroid(x)) — the classic
    IVF-PQ quantizes what remains after the coarse quantizer, which is
    where PQ's bits actually buy recall (Jégou et al. 2011 §IV).  Seeds
    are the residuals of the ``ksub`` lowest-id assigned rows: still
    trained-state-free, still SQL-replayable."""
    rows = (
        assigned.join(centroids, centroid_id)
        .select(
            id_col,
            F.zip_with(
                F.col(vec_col).cast("array<double>"),
                F.col(centroid_vec).cast("array<double>"),
                lambda x, c: x - c,
            ).alias("r"),
        )
        .orderBy(id_col)
        .limit(ksub)
        .collect()
    )
    if len(rows) < ksub:
        raise ValueError(f"corpus has {len(rows)} rows < ksub={ksub}")
    d = len(rows[0]["r"])
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    return [
        [[float(x) for x in r["r"][j * dsub : (j + 1) * dsub]] for r in rows]
        for j in range(m)
    ]


def ivfpq_encode(
    assigned: DataFrame,
    centroids: DataFrame,
    cb: Codebooks,
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    impl: str = "expr",
) -> DataFrame:
    """Residual-encode every assigned row: codes = PQ(x − centroid(x)).
    The centroid join is a broadcast (the centroid table is tiny by
    construction); encoding stays map-only."""
    joined = assigned.join(F.broadcast(centroids), centroid_id).withColumn(
        "__res",
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col(centroid_vec).cast("array<double>"),
            lambda x, c: x - c,
        ),
    )
    enc = pq_encode(joined, cb, vec_col="__res", codes_col=codes_col, impl=impl)
    return enc.drop("__res", centroid_vec)


def ivfpq_topk(
    encoded: DataFrame,
    centroids: DataFrame,
    cb: Codebooks,
    query: Sequence[float],
    k: int,
    nprobe: int = 3,
    refine: int = 4,
    id_col: str = "id",
    vec_col: str = "embedding",
    codes_col: str = "pq_codes",
    centroid_id: str = "centroid_id",
    centroid_vec: str = "centroid_vec",
    score_col: str = "score",
) -> DataFrame:
    """Full IVF-PQ search (the reference's index type, store.py:274):
    probe the nprobe nearest cells, ADC-score ONLY their members from
    codes via per-cell lookup tables (score ≈ <q, c> + Σ_j lut_c[j][code]
    — the residual decomposition <q, x> = <q, c> + <q, x−c>), take
    k×refine candidates, exact-rescore.

    The probed centroids collect to the driver (O(nprobe) rows — the
    static-prune convention of ivf_topk), so the per-cell LUTs and <q,c>
    offsets fold into ONE flat literal and the coarse pass is a codegen
    fold over (cell, codes) — on a centroid_id-partitioned corpus the
    cell filter is static partition pruning."""
    from mcpvectordb_spark.operators.knn import dot, query_vec_lit

    m, ksub, dsub = len(cb), len(cb[0]), len(cb[0][0])
    q = [float(x) for x in query]
    probed = (
        centroids.withColumn(
            "__qc",
            F.aggregate(
                F.zip_with(
                    F.col(centroid_vec).cast("array<double>"),
                    query_vec_lit(q),
                    lambda c, x: c * x,
                ),
                F.lit(0.0),
                lambda a, x: a + x,
            ),
        )
        .orderBy(F.desc("__qc"), F.asc(centroid_id))
        .limit(nprobe)
        .select(centroid_id, centroid_vec, "__qc")
        .collect()
    )
    cell_ids = [r[centroid_id] for r in probed]
    # flat LUT: for the p-th probed cell, lut[p*m*ksub + j*ksub + c] =
    # <q_res_j, cb[j][c]> with q_res = q − centroid_p; offsets[p] = <q, c_p>
    flat: list[float] = []
    offsets: list[float] = []
    for r in probed:
        cv = [float(x) for x in r[centroid_vec]]
        q_res = [q[i] - cv[i] for i in range(len(q))]
        flat.extend(pq_lut(q_res, cb))
        offsets.append(float(r["__qc"]))
    LUT = F.array(*[F.lit(x) for x in flat])
    OFF = F.array(*[F.lit(x) for x in offsets])
    # cell -> probe position (1-based for element_at); small literal map walk
    pos = None
    for p, cid in enumerate(cell_ids):
        cond = F.col(centroid_id) == F.lit(cid)
        pos = F.when(cond, F.lit(p)) if pos is None else pos.when(cond, F.lit(p))
    cand_rows = encoded.filter(F.col(centroid_id).isin(cell_ids)).withColumn("__p", pos)
    adc = F.aggregate(
        F.sequence(F.lit(0), F.lit(m - 1)),
        F.element_at(OFF, F.col("__p") + 1),
        lambda acc, j: acc
        + F.element_at(
            LUT,
            F.col("__p") * (m * ksub) + j * ksub + F.element_at(F.col(codes_col), j + 1) + 1,
        ),
    )
    cand = (
        cand_rows.select(id_col, "__p", codes_col)
        .withColumn("__adc", adc)
        .orderBy(F.desc("__adc"), F.asc(id_col))
        .limit(k * refine)
        .select(id_col)
    )
    return (
        encoded.join(F.broadcast(cand), id_col, "left_semi")
        .withColumn(score_col, dot(F.col(vec_col), query_vec_lit(q)))
        .orderBy(F.desc(score_col), F.asc(id_col))
        .limit(k)
    )


class IvfPqIndex:
    """Persisted residual IVF-PQ index — the maintained form of the
    reference's index type (store.py:274), which it fully RETRAINS on
    growth; here both trained states (centroids, codebooks) freeze at
    build and an ingest batch costs O(batch) assign+encode with zero
    existing-row movement, provably identical to a rebuild (frozen state
    ⇒ same cells, same codes; test-asserted).

    Layout: ``<path>/centroids`` (tiny), ``<path>/codebooks`` (m×ksub
    rows), ``<path>/corpus`` partitioned by ``centroid_id`` carrying
    (id, embedding, pq_codes) — search's coarse pass projects only
    (id, codes) inside the probed partitions (static pruning), so the
    first pass reads m bytes per candidate row."""

    def __init__(self, spark, path: str, corpus_id: str = "id", vec_col: str = "embedding"):
        self.spark = spark
        self.path = path.rstrip("/")
        self.corpus_id = corpus_id
        self.vec_col = vec_col

    @classmethod
    def build(
        cls,
        spark,
        corpus: DataFrame,
        centroids: DataFrame,
        m: int,
        ksub: int,
        path: str,
        corpus_id: str = "id",
        vec_col: str = "embedding",
        impl: str = "pandas",
    ) -> "IvfPqIndex":
        from mcpvectordb_spark.operators.knn import ivf_assign

        idx = cls(spark, path, corpus_id, vec_col)
        centroids.coalesce(1).write.mode("overwrite").parquet(idx.path + "/centroids")
        cents = idx.centroids()
        assigned = ivf_assign(corpus, cents, corpus_id, vec_col)
        cb = seed_residual_codebooks(
            assigned, cents, m, ksub, id_col=corpus_id, vec_col=vec_col
        )
        codebooks_df(spark, cb).coalesce(1).write.mode("overwrite").parquet(
            idx.path + "/codebooks"
        )
        enc = ivfpq_encode(assigned, cents, cb, vec_col=vec_col, impl=impl)
        enc.write.partitionBy("centroid_id").mode("overwrite").parquet(idx.path + "/corpus")
        return idx

    def centroids(self) -> DataFrame:
        return self.spark.read.parquet(self.path + "/centroids")

    def codebooks(self) -> Codebooks:
        rows = self.spark.read.parquet(self.path + "/codebooks").collect()
        m = 1 + max(r["subspace"] for r in rows)
        ksub = 1 + max(r["code"] for r in rows)
        cb: Codebooks = [[None] * ksub for _ in range(m)]  # type: ignore[list-item]
        for r in rows:
            cb[r["subspace"]][r["code"]] = [float(x) for x in r["centroid"]]
        return cb

    def encoded(self) -> DataFrame:
        return self.spark.read.parquet(self.path + "/corpus")

    def append(self, batch: DataFrame, impl: str = "pandas") -> None:
        """Assign + residual-encode ONLY the batch against the frozen
        trained state and append into the partitioned layout."""
        from mcpvectordb_spark.operators.knn import ivf_assign

        cents = self.centroids()
        assigned = ivf_assign(batch, cents, self.corpus_id, self.vec_col)
        enc = ivfpq_encode(assigned, cents, self.codebooks(), vec_col=self.vec_col, impl=impl)
        enc.write.partitionBy("centroid_id").mode("append").parquet(self.path + "/corpus")

    def search(self, query: Sequence[float], k: int, nprobe: int = 3, refine: int = 4) -> DataFrame:
        return ivfpq_topk(
            self.encoded(),
            self.centroids(),
            self.codebooks(),
            query,
            k,
            nprobe=nprobe,
            refine=refine,
            id_col=self.corpus_id,
            vec_col=self.vec_col,
        )
