"""HLL sketch rollup: sparse-mode exactness, mergeability (daily union ==
whole-table estimate), bounded error at larger cardinality, incremental
append semantics."""

import pyspark.sql.functions as F

from mcpvectordb_spark.operators.sketches import merge_estimates, sketch_rollup


def test_sketch_exact_at_small_cardinality(spark):
    df = spark.range(5000).select(
        (F.col("id") % 97).alias("u"), (F.col("id") % 4).alias("g")
    )
    got = {r["g"]: r["approx_distinct"] for r in
           merge_estimates(sketch_rollup(df, ["g"], "u"), ["g"]).collect()}
    assert got == {0: 97, 1: 97, 2: 97, 3: 97}


def test_sketch_union_equals_whole_table_sketch(spark):
    df = spark.range(20000).select(
        F.col("id").alias("u"), (F.col("id") % 7).alias("day")
    )
    daily = sketch_rollup(df, ["day"], "u")
    merged = merge_estimates(daily, [F.lit(1).alias("all")]).collect()[0]
    whole = merge_estimates(sketch_rollup(df, [F.lit(1).alias("all")], "u"), ["all"]).collect()[0]
    assert merged["approx_distinct"] == whole["approx_distinct"]
    assert merged["n_rows"] == 20000


def test_sketch_error_bounded_at_scale(spark):
    n = 200_000
    df = spark.range(n).select(F.col("id").alias("u"), (F.col("id") % 30).alias("day"))
    est = merge_estimates(sketch_rollup(df, ["day"], "u"), [F.lit(1).alias("all")]).collect()[0]["approx_distinct"]
    assert abs(est - n) / n < 0.05, est


def test_sketch_incremental_append(spark):
    """Sketching only the NEW partition and unioning with the stored rows
    must equal sketching everything at once."""
    old = spark.range(0, 10000).select(F.col("id").alias("u"), F.lit("d1").alias("day"))
    new = spark.range(5000, 15000).select(F.col("id").alias("u"), F.lit("d2").alias("day"))
    stored = sketch_rollup(old, ["day"], "u")
    appended = stored.unionByName(sketch_rollup(new, ["day"], "u"))
    got = merge_estimates(appended, [F.lit(1).alias("all")]).collect()[0]["approx_distinct"]
    # union-of-sketches need not be bit-identical to a single-pass sketch
    # (internal HLL mode transitions differ); it must hit the same target
    assert abs(got - 15000) / 15000 < 0.05, got


def test_heavy_hitters_exact_topk(spark):
    """MG candidates + exact recount == plain exact top-k, on skewed data."""
    from mcpvectordb_spark.operators.sketches import heavy_hitters

    rows = [(f"u{i % 20}",) for i in range(4000)] + [("rare%d" % i,) for i in range(500)]
    df = spark.createDataFrame(rows, "user string").repartition(8)
    got = heavy_hitters(df, "user", k=10, capacity=64).collect()
    exact = (
        df.groupBy("user").count()
        .orderBy(F.col("count").desc(), F.col("user"))
        .limit(10).collect()
    )
    assert [(r["key"], r["cnt"]) for r in got] == [(r["user"], r["count"]) for r in exact]
    assert [r["rank"] for r in got] == list(range(1, 11))


def test_heavy_hitters_guard_falls_back_when_flat(spark):
    """Near-uniform keys with a tiny sketch: the rank-k count sits at the
    MG bound, so the guard must recount exactly — result still exact."""
    from mcpvectordb_spark.operators.sketches import heavy_hitters

    rows = [(f"k{i % 300}",) for i in range(3000)]
    df = spark.createDataFrame(rows, "user string").repartition(8)
    got = heavy_hitters(df, "user", k=5, capacity=16).collect()
    # all keys have count 10; top-5 by (cnt desc, key asc) is k0,k1,k10,k100,k101
    assert [(r["key"], r["cnt"]) for r in got] == [
        ("k0", 10), ("k1", 10), ("k10", 10), ("k100", 10), ("k101", 10)
    ]


def test_heavy_hitters_two_scans(spark):
    """The non-degenerate path reads the input exactly twice (MG pass +
    candidate recount): the exactness-guard N comes from sentinel rows in
    the cached MG output, not a third count() scan.  Pinned by a row-visit
    accumulator on the input."""
    from mcpvectordb_spark.operators.sketches import heavy_hitters

    acc = spark.sparkContext.accumulator(0)

    def tag(batches):
        for pdf in batches:
            acc.add(len(pdf))
            yield pdf

    n = 4000
    base = spark.range(n).selectExpr("concat('u', id % 20) AS user").repartition(8)
    df = base.mapInPandas(tag, schema="user string")
    got = heavy_hitters(df, "user", k=10, capacity=64).collect()
    assert len(got) == 10 and got[0]["cnt"] == 200
    assert acc.value == 2 * n, f"expected 2 passes ({2 * n} row-visits), saw {acc.value}"


def test_rollup_partials_merge_exact_and_incremental(spark):
    """Moments merged from fine partials == direct aggregation, and an
    incremental refresh (append one new partial, re-merge) matches a full
    recompute."""
    from mcpvectordb_spark.operators.sketches import rollup_merge, rollup_partials

    df = spark.createDataFrame(
        [(d, "t%d" % (i % 2), float(i % 7) + 0.25) for d in range(5) for i in range(40)],
        "day int, typ string, v double",
    )
    partials = rollup_partials(df, ["day", "typ"], "v")
    merged = {r["typ"]: r for r in rollup_merge(partials, ["typ"]).collect()}
    direct = {
        r["typ"]: r
        for r in df.groupBy("typ")
        .agg(
            F.count("v").alias("n"), F.sum("v").alias("s"),
            F.avg("v").alias("a"), F.var_pop("v").alias("vp"),
        )
        .collect()
    }
    for t in ("t0", "t1"):
        assert merged[t]["n_rows"] == direct[t]["n"]
        assert abs(merged[t]["sum_v"] - direct[t]["s"]) < 1e-9
        assert abs(merged[t]["avg_v"] - direct[t]["a"]) < 1e-9
        assert abs(merged[t]["var_pop"] - direct[t]["vp"]) < 1e-9

    # incremental: new day arrives; only its partial is computed
    new_day = spark.createDataFrame(
        [(99, "t0", 100.0), (99, "t1", -3.5)], "day int, typ string, v double"
    )
    refreshed = partials.unionByName(rollup_partials(new_day, ["day", "typ"], "v"))
    full = rollup_partials(df.unionByName(new_day), ["day", "typ"], "v")
    a = {r["typ"]: r for r in rollup_merge(refreshed, ["typ"]).collect()}
    b = {r["typ"]: r for r in rollup_merge(full, ["typ"]).collect()}
    for t in ("t0", "t1"):
        assert a[t]["n_rows"] == b[t]["n_rows"] and abs(a[t]["var_pop"] - b[t]["var_pop"]) < 1e-9


def test_histogram_quantile_within_bin_bound(spark):
    """Histogram estimate within 2 bin widths of the exact percentile, and
    merging partials from disjoint partitions == one-shot histogram."""
    import random

    from mcpvectordb_spark.operators.sketches import histogram_partials, histogram_quantile

    rng = random.Random(7)
    rows = [("g%d" % (i % 2), i % 5, rng.uniform(0, 100)) for i in range(4000)]
    df = spark.createDataFrame(rows, "grp string, day int, v double")
    partials = histogram_partials(df, ["grp", "day"], "v", 0.0, 100.0, 200)  # wbin 0.5
    est = {r["grp"]: r for r in histogram_quantile(partials, ["grp"], [0.5, 0.95], 0.0, 100.0, 200).collect()}
    exact = {
        r["grp"]: r
        for r in df.groupBy("grp")
        .agg(
            F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY v)").alias("x50"),
            F.expr("percentile_disc(0.95) WITHIN GROUP (ORDER BY v)").alias("x95"),
        )
        .collect()
    }
    for g in ("g0", "g1"):
        # vs the DISCRETE quantile the one-bin bound is a theorem (the
        # rank-q order statistic lies inside the hit bin); wbin = 0.5
        assert abs(est[g]["q_50"] - exact[g]["x50"]) <= 0.5
        assert abs(est[g]["q_95"] - exact[g]["x95"]) <= 0.5

    # out-of-range values clamp to edge bins instead of being dropped
    edge = spark.createDataFrame([("g", 0, -5.0), ("g", 0, 1e6)], "grp string, day int, v double")
    bins = histogram_partials(edge, ["grp"], "v", 0.0, 100.0, 10).collect()
    assert sorted(r["bin"] for r in bins) == [0, 9]


def test_histogram_quantile_rejects_q_zero(spark):
    """q=0 never matches a bin and would inner-join every group away —
    the operator raises instead of silently returning an empty frame."""
    import pytest

    from mcpvectordb_spark.operators.sketches import histogram_partials, histogram_quantile

    df = spark.createDataFrame([("g", 1.0), ("g", 2.0)], "grp string, v double")
    partials = histogram_partials(df, ["grp"], "v", 0.0, 10.0, 10)
    for bad in ([0.0], [0.5, 0.0], [-0.1], [1.5]):
        with pytest.raises(ValueError, match="quantiles must be in"):
            histogram_quantile(partials, ["grp"], bad, 0.0, 10.0, 10)


def test_cms_overestimates_and_merges(spark):
    """CMS contract: est >= true for every item; sketches over disjoint
    slices merged with cms_merge give the SAME table as one sketch over
    the union (counters are sums)."""
    from pyspark.sql import functions as F

    from mcpvectordb_spark.operators.sketches import cms_estimate, cms_merge, cms_sketch

    rows = [(i % 37,) for i in range(5000)] + [(999,)] * 500
    df = spark.createDataFrame(rows, "k long").repartition(8)
    sk = cms_sketch(df, "k", depth=4, width=64)
    items = df.select("k").distinct()
    est = {r["item"]: r["est"] for r in cms_estimate(sk, items, "k", 4, 64).collect()}
    true = {str(r["k"]): r["c"] for r in df.groupBy("k").agg(F.count(F.lit(1)).alias("c")).collect()}
    assert set(est) == set(true)
    for k, t in true.items():
        assert est[k] >= t, k
    # heavy item is within the eps bound (width 64, n 5500 -> slack ~234)
    assert est["999"] <= 500 + int(2.718281828459045 * 5500 / 64) + 1

    a = cms_sketch(df.filter("k < 10"), "k", depth=4, width=64)
    b = cms_sketch(df.filter("k >= 10"), "k", depth=4, width=64)
    merged = {(r["d"], r["bucket"]): r["c"] for r in cms_merge(a.unionByName(b)).collect()}
    whole = {(r["d"], r["bucket"]): r["c"] for r in sk.collect()}
    assert merged == whole


def test_cms_estimate_zero_for_unseen_item(spark):
    from mcpvectordb_spark.operators.sketches import cms_estimate, cms_sketch

    df = spark.createDataFrame([(1,), (2,)], "k long")
    sk = cms_sketch(df, "k", depth=4, width=1024)
    probe = spark.createDataFrame([(77777,)], "k long")
    est = cms_estimate(sk, probe, "k", 4, 1024).collect()
    # wide sketch, 2 items: the unseen probe almost surely misses all rows;
    # the left join + coalesce path must yield 0, not null or a crash
    assert est[0]["est"] in (0, 1, 2)  # collision-tolerant upper bound
