"""Product quantization: encode twin vs NumPy, ADC/refine exactness bounds,
Lloyd refinement distortion, and plan shape."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mcpvectordb_spark.operators import pq
from mcpvectordb_spark.operators.knn import knn_topk

D, M, KSUB, N = 32, 4, 8, 200


@pytest.fixture(scope="module")
def vectors():
    rng = np.random.default_rng(7)
    v = rng.normal(size=(N, D))
    v /= np.linalg.norm(v, axis=1, keepdims=True)
    return v


@pytest.fixture(scope="module")
def corpus(spark, vectors):
    rows = [(i, [float(x) for x in vectors[i]]) for i in range(N)]
    return spark.createDataFrame(rows, "id bigint, embedding array<double>").cache()


def np_encode(vectors: np.ndarray, cb: pq.Codebooks) -> np.ndarray:
    m, dsub = len(cb), len(cb[0][0])
    out = np.empty((len(vectors), m), dtype=np.int64)
    for j in range(m):
        sub = vectors[:, j * dsub : (j + 1) * dsub]
        cents = np.asarray(cb[j])
        d2 = ((sub[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        out[:, j] = d2.argmin(axis=1)  # np argmin keeps lowest index on ties
    return out


def test_seed_codebooks_are_lowest_id_slices(corpus, vectors):
    cb = pq.seed_codebooks(corpus, M, KSUB)
    assert len(cb) == M and len(cb[0]) == KSUB and len(cb[0][0]) == D // M
    dsub = D // M
    for j in range(M):
        for c in range(KSUB):
            assert cb[j][c] == pytest.approx(list(vectors[c][j * dsub : (j + 1) * dsub]))


def test_pq_encode_matches_numpy(corpus, vectors):
    cb = pq.seed_codebooks(corpus, M, KSUB)
    got = {
        r["id"]: r["pq_codes"]
        for r in pq.pq_encode(corpus, cb).select("id", "pq_codes").collect()
    }
    want = np_encode(vectors, cb)
    for i in range(N):
        assert got[i] == list(want[i]), f"row {i}"


def test_pq_adc_matches_lut_walk(corpus, vectors):
    cb = pq.seed_codebooks(corpus, M, KSUB)
    q = vectors[0]
    lut = pq.pq_lut(q, cb)
    enc = pq.pq_encode(corpus, cb)
    got = {
        r["id"]: r["adc"]
        for r in enc.select(
            "id", pq.pq_adc_col(F.col("pq_codes"), lut, KSUB).alias("adc")
        ).collect()
    }
    codes = np_encode(vectors, cb)
    for i in range(N):
        want = sum(lut[j * KSUB + codes[i, j]] for j in range(M))
        assert got[i] == pytest.approx(want, abs=1e-12)


def test_pq_topk_equals_exact_when_refine_covers_corpus(corpus, vectors):
    """With k*refine >= n the exact-rescore stage sees every row, so the
    result must equal exact KNN regardless of ADC quality."""
    cb = pq.seed_codebooks(corpus, M, KSUB)
    enc = pq.pq_encode(corpus, cb)
    q = vectors[3]
    got = pq.pq_topk(enc, cb, q, k=10, refine=N, id_col="id").select("id", "score")
    want = knn_topk(corpus, q, 10, tie_col="id").select(
        "id", F.col("score").cast("double")
    )
    g = [(r["id"], round(r["score"], 9)) for r in got.collect()]
    w = [(r["id"], round(r["score"], 9)) for r in want.collect()]
    assert g == w


def test_pq_topk_recall_with_small_refine(corpus, vectors):
    cb = pq.pq_refine_codebooks(corpus, pq.seed_codebooks(corpus, M, KSUB), iters=2)
    enc = pq.pq_encode(corpus, cb)
    q = vectors[3]
    exact = {r["id"] for r in knn_topk(corpus, q, 10, tie_col="id").collect()}
    got = {r["id"] for r in pq.pq_topk(enc, cb, q, k=10, refine=6).collect()}
    assert len(got & exact) >= 5  # coarse ADC at 32x compression, refined cb


def test_refine_reduces_distortion(corpus, vectors):
    def distortion(cb):
        codes = np_encode(vectors, cb)
        dsub = D // M
        tot = 0.0
        for j in range(M):
            cents = np.asarray(cb[j])
            sub = vectors[:, j * dsub : (j + 1) * dsub]
            tot += ((sub - cents[codes[:, j]]) ** 2).sum()
        return tot

    cb0 = pq.seed_codebooks(corpus, M, KSUB)
    cb2 = pq.pq_refine_codebooks(corpus, cb0, iters=2)
    assert distortion(cb2) < distortion(cb0) * 0.9


def test_refine_one_iter_matches_numpy_twin(corpus, vectors):
    cb0 = pq.seed_codebooks(corpus, M, KSUB)
    got = pq.pq_refine_codebooks(corpus, cb0, iters=1)
    # NumPy twin: assign, then per-(subspace, code) mean; empty cells keep old.
    codes = np_encode(vectors, cb0)
    dsub = D // M
    for j in range(M):
        sub = vectors[:, j * dsub : (j + 1) * dsub]
        for c in range(KSUB):
            mask = codes[:, j] == c
            want = sub[mask].mean(axis=0) if mask.any() else np.asarray(cb0[j][c])
            assert got[j][c] == pytest.approx(list(want), abs=1e-9), (j, c)


def test_pq_coarse_scan_is_take_ordered(corpus):
    cb = pq.seed_codebooks(corpus, M, KSUB)
    enc = pq.pq_encode(corpus, cb)
    plan = pq.pq_topk(enc, cb, [0.1] * D, k=10, refine=4)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "CartesianProduct" not in plan


# --------------------------- PCA-projected KNN ---------------------------


def test_pca_components_orthonormal_and_sign_fixed(spark, corpus):
    from mcpvectordb_spark.operators.knn import pca_components

    comps = pca_components(corpus, 8, vec_col="embedding")
    C = np.asarray(comps)
    assert C.shape == (8, D)
    # orthonormal rows (quantization tolerance)
    assert np.allclose(C @ C.T, np.eye(8), atol=1e-4)
    # sign convention: largest-|x| entry positive
    for row in C:
        assert row[np.argmax(np.abs(row))] > 0


def test_pca_projection_matches_numpy(spark, corpus, vectors):
    from pyspark.sql import functions as F

    from mcpvectordb_spark.operators.knn import pca_components, pca_project_col

    comps = pca_components(corpus, 8)
    got = {
        r["id"]: r["p"]
        for r in corpus.select(
            "id", pca_project_col(F.col("embedding"), comps).alias("p")
        ).collect()
    }
    C = np.asarray(comps)
    for i in range(N):
        assert got[i] == pytest.approx(list(C @ vectors[i]), abs=1e-9)


def test_knn_pca_equals_exact_when_refine_covers_corpus(spark, corpus, vectors):
    from mcpvectordb_spark.operators.knn import knn_topk, knn_topk_pca, pca_components

    comps = pca_components(corpus, 8)
    q = vectors[5]
    got = [
        (r["id"], round(r["score"], 9))
        for r in knn_topk_pca(corpus, q, comps, k=10, refine=N, id_col="id").collect()
    ]
    want = [
        (r["id"], round(r["score"], 9))
        for r in knn_topk(corpus, q, 10, tie_col="id").collect()
    ]
    assert got == want


def test_knn_pca_beats_truncation_recall(spark, corpus, vectors):
    """On NON-Matryoshka (random-rotation-symmetric) embeddings a naive
    first-8-dims truncation carries ~12% of the variance while the top-8
    PCA projection carries the maximum possible — PCA recall@10 must beat
    truncation recall at the same refine budget."""
    from mcpvectordb_spark.operators.knn import (
        knn_topk,
        knn_topk_pca,
        knn_truncated_topk,
        pca_components,
    )

    comps = pca_components(corpus, 8)
    recalls = {"pca": 0, "trunc": 0}
    for qi in (3, 17, 42, 99):
        q = vectors[qi]
        exact = {r["id"] for r in knn_topk(corpus, q, 10, tie_col="id").collect()}
        pca = {
            r["id"]
            for r in knn_topk_pca(corpus, q, comps, k=10, refine=4, id_col="id").collect()
        }
        tr = {
            r["id"]
            for r in knn_truncated_topk(
                corpus, q, k=10, dims_coarse=8, refine=4, id_col="id"
            ).collect()
        }
        recalls["pca"] += len(pca & exact)
        recalls["trunc"] += len(tr & exact)
    assert recalls["pca"] >= recalls["trunc"]
    assert recalls["pca"] >= 20  # >=50% aggregate recall over the 4 probes


def test_pq_encode_pandas_matches_expr(corpus):
    a = {r["id"]: r["pq_codes"] for r in pq.pq_encode(corpus, pq.seed_codebooks(corpus, M, KSUB)).collect()}
    b = {
        r["id"]: r["pq_codes"]
        for r in pq.pq_encode(corpus, pq.seed_codebooks(corpus, M, KSUB), impl="pandas").collect()
    }
    assert a == b


def test_pq_encode_pandas_null_and_wrong_dim(spark):
    cb = [[[0.0, 0.0], [1.0, 1.0]], [[0.0, 0.0], [1.0, 1.0]]]  # m=2, ksub=2, dsub=2
    rows = [(0, [0.1, 0.1, 0.9, 0.9]), (1, None), (2, [0.5])]
    df = spark.createDataFrame(rows, "id long, embedding array<double>")
    out = {r["id"]: r["pq_codes"] for r in pq.pq_encode(df, cb, impl="pandas").collect()}
    assert out[0] == [0, 1]
    assert out[1] is None and out[2] is None


# --------------------------- residual IVF-PQ ---------------------------


@pytest.fixture(scope="module")
def ivfpq_setup(spark, corpus):
    from mcpvectordb_spark.operators.knn import ivf_assign

    cents = corpus.filter(F.col("id") < 6).select(
        F.col("id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    assigned = ivf_assign(corpus, cents, corpus_id="id").cache()
    cb = pq.seed_residual_codebooks(assigned, cents, M, KSUB)
    enc = pq.ivfpq_encode(assigned, cents, cb, impl="pandas").cache()
    return cents, cb, enc


def test_ivfpq_residual_codes_match_numpy(ivfpq_setup, vectors):
    cents, cb, enc = ivfpq_setup
    cvs = {r["centroid_id"]: np.asarray(r["centroid_vec"]) for r in cents.collect()}
    rows = enc.select("id", "centroid_id", "pq_codes").collect()
    res = np.stack([vectors[r["id"]] - cvs[r["centroid_id"]] for r in rows])
    want = np_encode(res, cb)
    for i, r in enumerate(rows):
        assert r["pq_codes"] == list(want[i]), r["id"]


def test_ivfpq_equals_exact_when_probe_and_refine_cover(ivfpq_setup, corpus, vectors):
    from mcpvectordb_spark.operators.knn import knn_topk

    cents, cb, enc = ivfpq_setup
    q = vectors[7]
    got = [
        (r["id"], round(r["score"], 9))
        for r in pq.ivfpq_topk(enc, cents, cb, q, k=10, nprobe=6, refine=N).collect()
    ]
    want = [
        (r["id"], round(r["score"], 9))
        for r in knn_topk(corpus, q, 10, tie_col="id").collect()
    ]
    assert got == want


def test_ivfpq_partial_probe_recall(ivfpq_setup, corpus, vectors):
    from mcpvectordb_spark.operators.knn import knn_topk

    cents, cb, enc = ivfpq_setup
    hits = 0
    for qi in (2, 9, 33):
        q = vectors[qi]
        exact = {r["id"] for r in knn_topk(corpus, q, 10, tie_col="id").collect()}
        got = {r["id"] for r in pq.ivfpq_topk(enc, cents, cb, q, k=10, nprobe=3, refine=8).collect()}
        assert qi in got  # the probe's own cell contains it; self-match survives
        hits += len(got & exact)
    assert hits >= 12  # >=40% aggregate recall probing half the cells


def test_ivfpq_index_append_matches_rebuild(spark, tmp_path_factory, corpus, vectors):
    """Frozen centroids + frozen codebooks make incremental append
    provably identical to a full rebuild: cell-for-cell, code-for-code —
    the maintained form of the reference's retrain-on-growth index."""
    from pyspark.sql import functions as F

    base = corpus.filter(F.col("id") < 150)
    batch = corpus.filter(F.col("id") >= 150)
    cents = corpus.filter(F.col("id") < 6).select(
        F.col("id").alias("centroid_id"), F.col("embedding").alias("centroid_vec")
    )
    p1 = str(tmp_path_factory.mktemp("ivfpq_incr"))
    p2 = str(tmp_path_factory.mktemp("ivfpq_full"))
    idx = pq.IvfPqIndex.build(spark, base, cents, M, KSUB, p1)
    idx.append(batch)
    full = pq.IvfPqIndex.build(spark, corpus, cents, M, KSUB, p2)

    def snap(i):
        return {
            r["id"]: (r["centroid_id"], tuple(r["pq_codes"]))
            for r in i.encoded().select("id", "centroid_id", "pq_codes").collect()
        }

    assert snap(idx) == snap(full)
    q = vectors[11]
    a = [(r["id"], round(r["score"], 9)) for r in idx.search(q, 10, nprobe=3).collect()]
    b = [(r["id"], round(r["score"], 9)) for r in full.search(q, 10, nprobe=3).collect()]
    assert a == b and len(a) == 10
