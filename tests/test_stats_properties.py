"""Property-based tests (hypothesis) for the round-4 statistics
operators: invariants that must hold for ARBITRARY integer series, not
just the hand-picked fixtures.  Each example packs several random cases
into one DataFrame as independent keys, so a property costs one Spark
job per example rather than one per case."""

import math

from hypothesis import given, settings
from hypothesis import strategies as st

series_strategy = st.lists(
    st.lists(st.integers(0, 1000), min_size=8, max_size=40),
    min_size=2,
    max_size=6,
)


@settings(max_examples=8, deadline=None)
@given(batches=series_strategy)
def test_acf_bounded_and_matches_reference(spark, batches):
    """|r_k| <= 1 and the block algebra equals the textbook definition
    for every random series (non-constant ones)."""
    from mcpvectordb_spark.operators.timeseries import acf

    rows = [
        (str(i), t, v) for i, ys in enumerate(batches) for t, v in enumerate(ys)
    ]
    df = spark.createDataFrame(rows, ["k", "t", "y"])
    out = acf(df, "k", "t", "y", max_lag=3).collect()
    got = {(r["k"], r["lag"]): r["r"] for r in out}
    for i, ys in enumerate(batches):
        m = sum(ys) / len(ys)
        den = sum((v - m) ** 2 for v in ys)
        for lag in (1, 2, 3):
            r = got[(str(i), lag)]
            if den == 0:
                assert r is None
                continue
            ref = sum(
                (ys[t] - m) * (ys[t + lag] - m) for t in range(len(ys) - lag)
            ) / den
            assert abs(r - ref) < 5e-7
            assert -1.0 - 1e-9 <= r <= 1.0 + 1e-9


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(st.integers(0, 10_000), min_size=3, max_size=60).filter(
        lambda v: sum(v) > 0
    ),
    scale=st.integers(2, 9),
)
def test_gini_bounds_and_scale_invariance(spark, vals, scale):
    """0 <= G <= 1 - 1/n, and G is invariant under positive scaling."""
    from mcpvectordb_spark.operators.stats import gini_concentration

    df = spark.createDataFrame([(v,) for v in vals], ["v"])
    df2 = spark.createDataFrame([(v * scale,) for v in vals], ["v"])
    g1 = gini_concentration(df, "v").collect()[0]
    g2 = gini_concentration(df2, "v").collect()[0]
    n = len(vals)
    assert -1e-9 <= g1["gini"] <= 1 - 1 / n + 1e-9
    assert abs(g1["gini"] - g2["gini"]) < 1e-6
    assert 0 <= g1["top10_share"] <= 1 and g1["top10_share"] >= g1["top1_share"] - 1e-9


@settings(max_examples=6, deadline=None)
@given(
    blocks=st.lists(
        st.tuples(st.integers(1, 50), st.integers(0, 50)).filter(
            lambda t: t[1] <= t[0]
        ),
        min_size=2,
        max_size=12,
    )
)
def test_isotonic_monotone_and_mass_preserving(spark, blocks):
    """For ANY block profile: the fit is monotone, pools preserve the
    weighted positive mass, and values stay in [0, 1]."""
    from mcpvectordb_spark.operators.modeleval import isotonic_calibration

    rows = []
    for qb, (c, pos) in enumerate(blocks):
        p = (qb + 0.5) / len(blocks)
        rows += [(p, 1)] * pos + [(p, 0)] * (c - pos)
    df = spark.createDataFrame(rows, "p double, y long")
    out = sorted(
        isotonic_calibration(df, "y", "p", n_blocks=len(blocks)).collect(),
        key=lambda r: r["block"],
    )
    iso = [r["iso_rate"] for r in out]
    assert iso == sorted(iso)
    assert all(-1e-9 <= v <= 1 + 1e-9 for v in iso)
    mass_fit = sum(r["n"] * r["iso_rate"] for r in out)
    mass_raw = sum(r["n_pos"] for r in out)
    assert abs(mass_fit - mass_raw) < 1e-3 * max(1, mass_raw)


@settings(max_examples=6, deadline=None)
@given(
    cells=st.lists(
        st.tuples(st.integers(0, 2), st.integers(0, 2), st.integers(1, 80)),
        min_size=4,
        max_size=9,
    ).filter(
        lambda cs: len({(r, c) for r, c, _ in cs}) == len(cs)
        and len({r for r, _, _ in cs}) >= 2
        and len({c for _, c, _ in cs}) >= 2
    )
)
def test_ipf_hits_feasible_marginals(spark, cells):
    """With targets taken FROM the observed marginals (trivially
    feasible), IPF leaves weights at the counts; with swapped-magnitude
    targets it still matches both marginals when every row/col is
    occupied."""
    from pyspark.sql import functions as F

    from mcpvectordb_spark.operators.curation import ipf_rake

    df = spark.createDataFrame(
        [(f"r{r}", f"c{c}", n) for r, c, n in cells], ["r", "c", "n"]
    )
    rt = df.groupBy("r").agg(F.sum("n").cast("double").alias("t")).select(
        F.col("r").alias("k"), "t"
    )
    ct = df.groupBy("c").agg(F.sum("n").cast("double").alias("t")).select(
        F.col("c").alias("k"), "t"
    )
    out = ipf_rake(df, "r", "c", "n", rt, ct, iterations=6).collect()
    for row in out:
        assert abs(row["factor"] - 1.0) < 1e-9  # feasible -> fixed point
