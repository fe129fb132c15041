"""Unit tests for operators/modeleval.py: midrank ROC-AUC, Brier score,
clamped log-loss, ECE and the reliability table."""

import math

import pytest


def _eval_row(spark, rows, n_bins=10):
    from mcpvectordb_spark.operators.modeleval import binary_eval

    df = spark.createDataFrame(rows, ["y", "p"])
    return binary_eval(df, "y", "p", n_bins=n_bins).first()


def test_perfect_classifier(spark):
    rows = [(1.0, 1.0), (1.0, 1.0), (0.0, 0.0), (0.0, 0.0)]
    r = _eval_row(spark, rows)
    assert (r["n"], r["n_pos"]) == (4, 2)
    assert r["auc"] == pytest.approx(1.0)
    assert r["brier"] == pytest.approx(0.0)
    assert r["ece"] == pytest.approx(0.0)
    # clamped log-loss: p snapped to 1e-6 grid then clamped to [1e-6, 1-1e-6]
    assert r["logloss"] == pytest.approx(-math.log(1.0 - 1e-6), rel=1e-6)


def test_inverted_classifier_auc_zero(spark):
    rows = [(1.0, 0.1), (1.0, 0.2), (0.0, 0.8), (0.0, 0.9)]
    r = _eval_row(spark, rows)
    assert r["auc"] == pytest.approx(0.0)


def test_constant_probability_ties(spark):
    # all rows in one tie block: midrank AUC must be exactly 0.5
    rows = [(1.0, 0.5), (0.0, 0.5), (1.0, 0.5), (0.0, 0.5)]
    r = _eval_row(spark, rows)
    assert r["auc"] == pytest.approx(0.5)
    assert r["brier"] == pytest.approx(0.25)
    # conf 0.5 vs frac_pos 0.5 -> perfectly calibrated bin
    assert r["ece"] == pytest.approx(0.0)


def test_midrank_auc_hand_example(spark):
    # scores: pos {0.8, 0.6, 0.6}, neg {0.6, 0.4}
    # pairs: (0.8 vs 0.6)=1, (0.8 vs 0.4)=1, (0.6 vs 0.6)=0.5 (x2),
    #        (0.6 vs 0.4)=1 (x2)  ->  AUC = (1+1+0.5+0.5+1+1)/6 = 5/6
    rows = [(1.0, 0.8), (1.0, 0.6), (1.0, 0.6), (0.0, 0.6), (0.0, 0.4)]
    r = _eval_row(spark, rows)
    assert r["auc"] == pytest.approx(5.0 / 6.0)


def test_brier_and_logloss_hand_example(spark):
    rows = [(1.0, 0.9), (0.0, 0.2)]
    r = _eval_row(spark, rows)
    assert r["brier"] == pytest.approx((0.1**2 + 0.2**2) / 2, rel=1e-9)
    assert r["logloss"] == pytest.approx(
        (-math.log(0.9) - math.log(0.8)) / 2, rel=1e-9
    )


def test_single_class_auc_null(spark):
    rows = [(1.0, 0.7), (1.0, 0.3)]
    r = _eval_row(spark, rows)
    assert r["auc"] is None
    assert r["n_pos"] == 2


def test_ece_miscalibrated(spark):
    # every row predicted 0.9 but only half are positive:
    # one bin, |0.5 - 0.9| = 0.4
    rows = [(1.0, 0.9), (0.0, 0.9)]
    r = _eval_row(spark, rows)
    assert r["ece"] == pytest.approx(0.4)


def test_reliability_table_bins(spark):
    from mcpvectordb_spark.operators.modeleval import reliability_table

    rows = [(1.0, 0.05), (0.0, 0.05), (1.0, 0.95), (1.0, 0.97), (0.0, 1.0)]
    df = spark.createDataFrame(rows, ["y", "p"])
    out = {r["bin"]: r for r in reliability_table(df, "y", "p").collect()}
    assert set(out) == {0, 9}  # p=1.0 clamps into the top bin
    assert out[0]["n_docs"] == 2
    assert out[0]["frac_pos"] == pytest.approx(0.5)
    assert out[9]["n_docs"] == 3
    assert out[9]["avg_conf"] == pytest.approx((0.95 + 0.97 + 1.0) / 3, rel=1e-9)
    assert sum(r["n_docs"] for r in out.values()) == 5


def test_quantization_merges_near_ties(spark):
    # probabilities within half a grid step collapse into one block and
    # therefore tie (the engine-parity guarantee)
    rows = [(1.0, 0.5000000001), (0.0, 0.5000000002)]
    r = _eval_row(spark, rows)
    assert r["auc"] == pytest.approx(0.5)


def test_feature_auc_ranks_separability(spark):
    from pyspark.sql import functions as F

    from mcpvectordb_spark.operators.modeleval import feature_auc

    rows = [
        # (y, separable asc, separable desc, constant)
        (1.0, 10.0, 1.0, 7.0),
        (1.0, 9.0, 2.0, 7.0),
        (0.0, 2.0, 9.0, 7.0),
        (0.0, 1.0, 10.0, 7.0),
    ]
    df = spark.createDataFrame(rows, ["y", "up", "down", "flat"])
    out = {
        r["feature"]: r
        for r in feature_auc(
            df,
            [("up", F.col("up")), ("down", F.col("down")), ("flat", F.col("flat"))],
            "y",
        ).collect()
    }
    assert set(out) == {"up", "down", "flat"}
    assert out["up"]["auc"] == pytest.approx(1.0)
    assert out["down"]["auc"] == pytest.approx(0.0)
    assert out["flat"]["auc"] == pytest.approx(0.5)
    assert all(r["n"] == 4 and r["n_pos"] == 2 for r in out.values())


def test_pr_curve_hand_example(spark):
    from mcpvectordb_spark.operators.modeleval import pr_curve

    rows = [(1.0, 0.9), (0.0, 0.8), (1.0, 0.7), (0.0, 0.6)]
    df = spark.createDataFrame(rows, ["y", "p"])
    out = {r["recall_level"]: r for r in pr_curve(df, "y", "p").collect()}
    assert len(out) == 11
    # AP = 0.5*1 + 0.5*(2/3)
    for r in out.values():
        assert r["ap"] == pytest.approx(5.0 / 6.0)
    # recall >= 0.5 reachable at threshold 0.9 with precision 1.0
    for lvl in [0.0, 0.1, 0.2, 0.3, 0.4, 0.5]:
        assert out[lvl]["interp_prec"] == pytest.approx(1.0)
    for lvl in [0.6, 0.7, 0.8, 0.9, 1.0]:
        assert out[lvl]["interp_prec"] == pytest.approx(2.0 / 3.0)


def test_pr_curve_ties_collapse_to_blocks(spark):
    from mcpvectordb_spark.operators.modeleval import pr_curve

    # all rows share one probability -> one block: AP = prevalence,
    # interpolated precision = prevalence at every level
    rows = [(1.0, 0.5), (0.0, 0.5), (0.0, 0.5), (1.0, 0.5)]
    df = spark.createDataFrame(rows, ["y", "p"])
    out = pr_curve(df, "y", "p").collect()
    assert len(out) == 11
    for r in out:
        assert r["ap"] == pytest.approx(0.5)
        assert r["interp_prec"] == pytest.approx(0.5)


# -- isotonic_calibration -----------------------------------------------------


def _pava_reference(block_items):
    """Classic sequential pool-adjacent-violators on (count, pos) blocks."""
    stack = []
    for c, s in block_items:
        stack.append([c, s])
        while len(stack) > 1 and (
            stack[-1][1] * stack[-2][0] <= stack[-2][1] * stack[-1][0]
        ):
            c2, s2 = stack.pop()
            stack[-1][0] += c2
            stack[-1][1] += s2
    fits = []
    for c, s in stack:
        fits.append((c, s / c))
    return fits


def test_isotonic_matches_sequential_pava(spark):
    """The minimax-identity fit equals classic stack PAVA per block."""
    import random

    from mcpvectordb_spark.operators.modeleval import isotonic_calibration

    random.seed(4)
    rows = []
    for _ in range(2000):
        p = random.random()
        y = 1 if random.random() < min(1.0, p * 0.7 + 0.15) else 0
        rows.append((float(p), y))
    out = (
        isotonic_calibration(
            spark.createDataFrame(rows, "p double, y long"), "y", "p", n_blocks=40
        )
        .orderBy("block")
        .collect()
    )
    # rebuild the same blocks in python
    blocks = {}
    for p, y in rows:
        qb = min(39, round(p * 1_000_000) * 40 // 1_000_000)
        c, s = blocks.get(qb, (0, 0))
        blocks[qb] = (c + 1, s + y)
    segs = _pava_reference([blocks[k] for k in sorted(blocks)])
    # expand segment values over their member blocks
    expanded = []
    it = iter(sorted(blocks))
    for c, v in segs:
        taken = 0
        while taken < c:
            qb = next(it)
            expanded.append(v)
            taken += blocks[qb][0]
    assert len(expanded) == len(out)
    for r, ref in zip(out, expanded):
        assert abs(r["iso_rate"] - ref) < 5e-7


def test_isotonic_already_monotone_is_identity(spark):
    """Perfectly calibrated blocks stay untouched."""
    from mcpvectordb_spark.operators.modeleval import isotonic_calibration

    rows = []
    for qb, rate in ((0, 0.0), (500, 0.5), (999, 1.0)):
        p = (qb + 0.5) / 1000
        n_pos = int(rate * 100)
        rows += [(p, 1)] * n_pos + [(p, 0)] * (100 - n_pos)
    out = {
        r["block"]: r
        for r in isotonic_calibration(
            spark.createDataFrame(rows, "p double, y long"), "y", "p"
        ).collect()
    }
    for qb, rate in ((0, 0.0), (500, 0.5), (999, 1.0)):
        assert abs(out[qb]["iso_rate"] - rate) < 1e-9
        assert out[qb]["raw_rate"] == out[qb]["iso_rate"]


def test_isotonic_pools_violation(spark):
    """A decreasing pair pools to its weighted average."""
    from mcpvectordb_spark.operators.modeleval import isotonic_calibration

    # block A: 30 rows rate 0.9 ; block B (higher score): 10 rows rate 0.1
    rows = [(0.2, 1)] * 27 + [(0.2, 0)] * 3 + [(0.8, 1)] * 1 + [(0.8, 0)] * 9
    out = sorted(
        isotonic_calibration(
            spark.createDataFrame(rows, "p double, y long"), "y", "p", n_blocks=10
        ).collect(),
        key=lambda r: r["block"],
    )
    pooled = (27 + 1) / 40
    assert len(out) == 2
    assert abs(out[0]["iso_rate"] - pooled) < 1e-9
    assert abs(out[1]["iso_rate"] - pooled) < 1e-9
    iso = [r["iso_rate"] for r in out]
    assert iso == sorted(iso)


# -- rbo -----------------------------------------------------------------------


def test_rbo_identical_lists_is_one_at_full_depth(spark):
    """Identical rankings: truncated RBO equals (1-p) * sum p^(d-1) -> the
    geometric partial sum, = 1 - p^k in the X_d = d case."""
    from mcpvectordb_spark.operators.modeleval import rbo

    run = spark.createDataFrame(
        [(f"d{i}", i) for i in range(1, 11)], ["doc", "rank"]
    )
    r = rbo(run, run, k=10, p=0.9).collect()[0]
    assert r["overlap_at_k"] == 10
    assert abs(r["rbo"] - (1 - 0.9 ** 10)) < 5e-6


def test_rbo_disjoint_lists_is_zero(spark):
    from mcpvectordb_spark.operators.modeleval import rbo

    a = spark.createDataFrame([(f"a{i}", i) for i in range(1, 11)], ["doc", "rank"])
    b = spark.createDataFrame([(f"b{i}", i) for i in range(1, 11)], ["doc", "rank"])
    r = rbo(a, b, k=10, p=0.9).collect()[0]
    assert r["overlap_at_k"] == 0 and r["rbo"] == 0.0


def test_rbo_hand_computed_partial_overlap(spark):
    """Top-weighting: agreement at rank 1 is worth more than at rank k."""
    from mcpvectordb_spark.operators.modeleval import rbo

    # lists share ONLY the top document
    a = spark.createDataFrame(
        [("x", 1)] + [(f"a{i}", i) for i in range(2, 6)], ["doc", "rank"]
    )
    b = spark.createDataFrame(
        [("x", 1)] + [(f"b{i}", i) for i in range(2, 6)], ["doc", "rank"]
    )
    r = rbo(a, b, k=5, p=0.9).collect()[0]
    ref = 0.1 * sum(0.9 ** (d - 1) * 1 / d for d in range(1, 6))
    assert abs(r["rbo"] - ref) < 5e-6
    # same single shared doc at the BOTTOM is worth less
    a2 = spark.createDataFrame(
        [(f"a{i}", i) for i in range(1, 5)] + [("x", 5)], ["doc", "rank"]
    )
    b2 = spark.createDataFrame(
        [(f"b{i}", i) for i in range(1, 5)] + [("x", 5)], ["doc", "rank"]
    )
    r2 = rbo(a2, b2, k=5, p=0.9).collect()[0]
    assert r2["rbo"] < r["rbo"]


# -- embedding isotropy (catalog-level) -----------------------------------------


def test_isotropy_pr_detects_rank_collapse(spark):
    """PR ~ dim on isotropic Gaussians; PR ~ 1 when all vectors lie on a
    single direction."""
    import random

    from mcpvectordb_spark.catalog import QUERIES  # noqa: F401 (parity import)
    from pyspark.sql import functions as F

    random.seed(3)

    def panel(vecs):
        df = spark.createDataFrame([(v,) for v in vecs], ["embedding"])
        # reuse the catalog query's algebra inline at dim 8
        dim = 8
        v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        base = df.select(v.alias("v"))
        n = base.count()
        sums = base.select(F.posexplode("v").alias("j0", "xj"), "v").groupBy(
            F.col("j0").alias("j")
        ).agg(
            F.sum("xj").alias("sx"),
            *[F.sum(F.col("xj") * F.element_at("v", k + 1)).alias(f"m{k}") for k in range(dim)],
        )
        mu = sums.select("j", (F.col("sx") / n).alias("mu"))
        cells = sums.select(
            "j", F.posexplode(F.array(*[F.col(f"m{k}") for k in range(dim)])).alias("k", "m")
        ).select("j", "k", (F.col("m") / n).alias("m"))
        cov = (
            cells.join(mu.select("j", F.col("mu").alias("mj")), "j")
            .join(mu.select(F.col("j").alias("k"), F.col("mu").alias("mk")), "k")
            .select("j", "k", (F.col("m") - F.col("mj") * F.col("mk")).alias("c"))
        )
        r = cov.agg(
            F.sum(F.when(F.col("j") == F.col("k"), F.col("c"))).alias("tr"),
            F.sum(F.col("c") * F.col("c")).alias("f2"),
        ).collect()[0]
        return r["tr"] * r["tr"] / r["f2"]

    iso = [[random.gauss(0, 1) for _ in range(8)] for _ in range(400)]
    pr_iso = panel(iso)
    collapsed = [[random.gauss(0, 1)] * 8 for _ in range(400)]
    pr_col = panel(collapsed)
    assert pr_iso > 6.0, pr_iso
    assert pr_col < 1.2, pr_col


def test_isotropy_catalog_row_sane(spark):
    from mcpvectordb_spark.catalog import QUERIES

    r = QUERIES["embedding_isotropy"](spark, "/root/testdata/sf0.001").collect()[0]
    assert r["n"] > 0 and r["dim"] == 64
    assert r["mean_norm"] > 0
    assert -1.0 <= r["avg_pairwise_cos"] <= 1.0
    assert 1.0 <= r["participation_ratio"] <= 64.0
    assert r["cov_fro"] > 0
