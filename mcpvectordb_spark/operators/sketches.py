"""Mergeable distinct-count sketches — incremental rollup at 100 TB.

`countDistinct` is exact but must re-shuffle the full history for every
(grouping, date-range) asked.  The scale pattern is a **partial-aggregate
sketch table**: fold each partition (day, type, ...) once into an HLL
sketch (Datasketches HllSketch via Spark's built-in `hll_sketch_agg`),
persist the binary sketches, and answer any rollup later by `hll_union_agg`
over just the matching sketch rows — no rescan, sketches are tiny
(~KB), and unions are associative so daily → monthly → yearly rollups
compose.  Standard HLL error ≈ 1.04/√(2^lgK) (~1.6% at the default
lgK=12).

This mirrors how the reference's `list_libraries` distinct-count (SURVEY
§2.4 A2) stays answerable when the corpus no longer fits a single scan:
the sketch table is refreshed per appended partition, never recomputed.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def sketch_rollup(
    df: DataFrame,
    part_cols: list[str | Column],
    value_col: str,
    lgk: int = 12,
) -> DataFrame:
    """One HLL sketch of ``value_col``'s distinct values per partition
    tuple.  This is the *incremental* layer: run it on new partitions only
    and append to the sketch table."""
    return df.groupBy(*part_cols).agg(
        F.hll_sketch_agg(F.col(value_col), F.lit(lgk)).alias("sketch"),
        F.count(F.lit(1)).alias("n_rows"),
    )


def merge_estimates(
    sketches: DataFrame, group_cols: list[str | Column]
) -> DataFrame:
    """Union sketches up to ``group_cols`` granularity and estimate the
    distinct count — touches only sketch rows, never the base table."""
    return sketches.groupBy(*group_cols).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_distinct"),
        F.sum("n_rows").alias("n_rows"),
    )


def heavy_hitters(
    df: DataFrame,
    key_col: str,
    k: int = 10,
    capacity: int = 4096,
) -> DataFrame:
    """EXACT top-k keys by count, at heavy-hitter cost: a Misra–Gries
    candidate pass + an exact recount of candidates only.

    Pass 1 (per input partition, Arrow-batched, no shuffle): a Misra–Gries
    summary of ``capacity`` counters.  MG guarantees every key whose count
    in that partition exceeds n_p/capacity survives, so by pigeonhole every
    key with GLOBAL count > N/capacity survives in at least one partition's
    summary — the union of summaries is a superset of every such key.

    Pass 2: exact counts for candidate keys only (broadcast semi-join
    filter pushed to the scan, then a keyed agg over the surviving rows) →
    top-k.  The only full-data shuffle-free scan emits ≤ capacity rows per
    partition; the recount shuffles only rows whose key is a candidate.

    Exactness guard: if the k-th result's count is not strictly greater
    than N/capacity, the MG superset property no longer covers rank k and
    the operator falls back to the exact full groupBy.  The result is
    therefore ALWAYS the exact top-k (ties broken on the key value, so the
    output is total-ordered and oracle-comparable).

    Exactly TWO passes over the data on the non-degenerate path: the MG
    pass also emits one sentinel row per partition carrying that
    partition's non-null row count (key=NULL, pn=n_p); the tiny MG output
    (≤ capacity+1 rows/partition) is cached, and the guard's N is the sum
    of the sentinels — no third full count() scan
    (tests/test_sketches.py::test_heavy_hitters_two_scans pins this with a
    row-visit accumulator).
    """
    from pyspark.sql import Window

    key_df = df.select(F.col(key_col).cast("string").alias("key"))

    def mg_partition(batches):
        import pandas as pd

        counters: dict[str, int] = {}
        n_p = 0
        for pdf in batches:
            for key, cnt in pdf["key"].value_counts().items():
                if key is None:
                    continue
                n_p += int(cnt)
                counters[key] = counters.get(key, 0) + int(cnt)
            if len(counters) > capacity:
                # MG decrement: subtract the (capacity+1)-th largest count
                # from everyone; drop non-positive.  Batch form of the
                # classic one-at-a-time decrement (same survival bound).
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {key: c - cut for key, c in counters.items() if c > cut}
        if n_p:
            # candidates + one sentinel (key=NULL) with the partition size
            yield pd.DataFrame(
                {"key": list(counters.keys()) + [None],
                 "pn": [0] * len(counters) + [n_p]}
            )

    mg = key_df.mapInPandas(mg_partition, schema="key string, pn long").persist()
    try:
        # materializes the cache; everything below reads the tiny MG output
        n_total = mg.agg(F.sum("pn")).collect()[0][0] or 0
        candidates = mg.where(F.col("key").isNotNull()).select("key").distinct()

        exact = (
            key_df.join(F.broadcast(candidates), "key")
            .groupBy("key")
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
        )
        # TakeOrderedAndProject (distributed top-k), then rank the k
        # survivors — never a global single-partition window over the full
        # key set.
        def rank_topk(counts: DataFrame) -> DataFrame:
            w = Window.orderBy(F.col("cnt").desc(), F.col("key").asc())
            return (
                counts.orderBy(F.col("cnt").desc(), F.col("key").asc())
                .limit(k)
                .withColumn("rank", F.row_number().over(w))
                .select("key", "cnt", "rank")
            )

        rows = rank_topk(exact).collect()
        bound = n_total / capacity
        if len(rows) < k or (rows and min(r["cnt"] for r in rows) <= bound):
            # guard tripped: rank-k sits below the MG survival bound —
            # recount everything (one keyed agg; correctness over
            # cleverness).
            rows = rank_topk(
                key_df.where(F.col("key").isNotNull())
                .groupBy("key")
                .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            ).collect()
        # return the already-computed k rows materialized: a lazy plan would
        # re-run both scans (and re-read the unpersisted MG output) when the
        # caller triggers its own action.
        return df.sparkSession.createDataFrame(rows, "key string, cnt long, rank int")
    finally:
        mg.unpersist()


ROLLUP_MOMENTS = ("n_rows", "sum_v", "min_v", "max_v", "sum_sq")


def rollup_partials(
    df: DataFrame, part_cols: list[str | Column], value_col: str
) -> DataFrame:
    """Mergeable per-partition aggregate moments (count/sum/min/max/sum²) —
    the continuous-aggregate pattern: fold each fine partition (e.g. one
    day) ONCE into a tiny partial row, persist, and answer any coarser
    rollup later from partials alone.  Every moment is associative, so
    daily → monthly → yearly merges compose exactly (unlike averages,
    which are derived at merge time)."""
    v = F.col(value_col)
    return df.groupBy(*part_cols).agg(
        F.count(v).cast("long").alias("n_rows"),
        F.sum(v).alias("sum_v"),
        F.min(v).alias("min_v"),
        F.max(v).alias("max_v"),
        F.sum(v * v).alias("sum_sq"),
    )


def rollup_merge(partials: DataFrame, group_cols: list[str | Column]) -> DataFrame:
    """Merge partial moments up to ``group_cols`` granularity and derive
    avg / population variance — touches only partial rows, never the base
    table.  Incremental refresh = append new fine partials, re-merge."""
    merged = partials.groupBy(*group_cols).agg(
        F.sum("n_rows").cast("long").alias("n_rows"),
        F.sum("sum_v").alias("sum_v"),
        F.min("min_v").alias("min_v"),
        F.max("max_v").alias("max_v"),
        F.sum("sum_sq").alias("sum_sq"),
    )
    n = F.col("n_rows")
    mean = F.try_divide(F.col("sum_v"), n)
    var = F.try_divide(F.col("sum_sq"), n) - mean * mean
    return merged.select(
        *group_cols,
        "n_rows",
        "sum_v",
        "min_v",
        "max_v",
        mean.alias("avg_v"),
        F.greatest(var, F.lit(0.0)).alias("var_pop"),
    )


def histogram_partials(
    df: DataFrame,
    part_cols: list[str | Column],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Mergeable equi-width histogram per partition tuple: one (bin, cnt)
    row per occupied bin — the fixed-memory quantile-sketch layer (the
    deterministic cousin of t-digest: bounded error = one bin width,
    exactly mergeable by addition, incremental per partition).  Values
    outside [lo, hi) clamp into the edge bins."""
    v = F.col(value_col)
    wbin = (hi - lo) / n_bins
    bin_idx = F.least(
        F.greatest(F.floor((v - F.lit(lo)) / F.lit(wbin)), F.lit(0)), F.lit(n_bins - 1)
    ).cast("int")
    return (
        df.where(v.isNotNull())
        .groupBy(*part_cols, bin_idx.alias("bin"))
        .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    )


def histogram_quantile(
    partials: DataFrame,
    group_cols: list[str],
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 256,
) -> DataFrame:
    """Quantile estimates from merged histogram partials — touches only
    histogram rows.  For each q: walk the cumulative counts to the bin
    containing rank q·N and interpolate linearly inside it; estimate error
    is bounded by one bin width ((hi-lo)/n_bins).  Output: one row per
    group with a ``q_<pct>`` column per requested quantile.

    qs must lie in (0, 1]: q=0 has no containing bin (cum_prev < 0 never
    holds), and because per-quantile results join inner, a silent q=0
    would drop every group — so it raises instead."""
    from pyspark.sql import Window

    bad = [q for q in qs if not (0.0 < q <= 1.0)]
    if bad:
        raise ValueError(f"quantiles must be in (0, 1], got {bad}")

    wbin = (hi - lo) / n_bins
    merged = partials.groupBy(*group_cols, "bin").agg(F.sum("cnt").alias("cnt"))
    w = Window.partitionBy(*group_cols).orderBy("bin")
    wall = Window.partitionBy(*group_cols)
    cum = (
        merged.withColumn("cum", F.sum("cnt").over(w))
        .withColumn("total", F.sum("cnt").over(wall))
        .withColumn("cum_prev", F.col("cum") - F.col("cnt"))
    )
    out = None
    for q in qs:
        target = F.col("total") * F.lit(q)
        hit = cum.filter((F.col("cum") >= target) & (F.col("cum_prev") < target))
        est = (
            F.lit(lo)
            + F.col("bin") * F.lit(wbin)
            + F.lit(wbin) * (target - F.col("cum_prev")) / F.col("cnt")
        )
        col = f"q_{int(q * 100)}"
        g = hit.groupBy(*group_cols).agg(F.min(est).alias(col))
        out = g if out is None else out.join(g, group_cols)
    return out


def cms_sketch(
    df: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) as a mergeable
    (depth × width) counter table: one row per non-empty (d, bucket).

    Hashing is the repo's portable 48-bit md5 fold (dedup.hexint48 — the
    MinHash convention), so a DuckDB oracle replays the sketch exactly.

    Scale shape: the explode multiplies rows ×depth BEFORE the keyed agg,
    but map-side combine collapses them to ≤ depth×width partials per
    task — the shuffle carries at most depth×width rows per partition
    regardless of input size, and sketch tables from disjoint partitions
    merge by summing counters (used by the streaming/incremental path the
    same way rollup_partials merges)."""
    from mcpvectordb_spark.operators.dedup import hexint48

    rows = df.select(
        F.col(item_col).cast("string").alias("item"),
        F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("d"),
    )
    bucket = hexint48(F.concat_ws("\x1f", F.col("item"), F.col("d").cast("string"))) % width
    return (
        rows.withColumn("bucket", bucket)
        .groupBy("d", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("c"))
    )


def cms_merge(sketches: DataFrame) -> DataFrame:
    """Merge CMS tables built over disjoint slices: counters sum."""
    return sketches.groupBy("d", "bucket").agg(F.sum("c").cast("long").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    items: DataFrame,
    item_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Point-frequency estimates: est(item) = min_d counter[d, h_d(item)].
    CMS contract: est ≥ true always; est ≤ true + (e/width)·N with
    probability 1 − e^(−depth).  ``items`` is a (small) DataFrame of query
    items — broadcast against the (≤ depth×width)-row sketch."""
    from mcpvectordb_spark.operators.dedup import hexint48

    probes = items.select(F.col(item_col).cast("string").alias("item")).withColumn(
        "d", F.explode(F.sequence(F.lit(0), F.lit(depth - 1)))
    )
    bucket = hexint48(F.concat_ws("\x1f", F.col("item"), F.col("d").cast("string"))) % width
    return (
        probes.withColumn("bucket", bucket)
        .join(F.broadcast(sketch), ["d", "bucket"], "left")
        .withColumn("c", F.coalesce(F.col("c"), F.lit(0)))
        .groupBy("item")
        .agg(F.min("c").cast("long").alias("est"))
    )


def kmv_sketch(df: DataFrame, key: Column, k: int = 256) -> DataFrame:
    """K-minimum-values sketch of a key set (Bar-Yossef et al. 2002): the
    k smallest portable-md5 48-bit hashes of the distinct keys.  The
    `.orderBy(h).limit(k)` compiles to TakeOrderedAndProject — every
    partition keeps only its local top-k, so the full corpus never
    shuffles; the sketch itself is k longs (~2 KB), cheap to persist per
    partition/day and to merge (union-then-limit) like the HLL rollups
    above, but supporting INTERSECTION estimates HLL cannot give."""
    from mcpvectordb_spark.operators.dedup import hexint48

    return (
        df.select(hexint48(key).alias("h")).distinct().orderBy("h").limit(int(k))
    )


def kmv_set_stats(ka: DataFrame, kb: DataFrame, k: int = 256) -> DataFrame:
    """Distinct-count and intersection estimates from two KMV sketches
    (columns: h).  Union sketch = k smallest of kA ∪ kB with kth-min
    threshold theta; Jaccard ≈ |{h ∈ theta-window present in both}| / m;
    |A∪B| ≈ (m-1)/theta · 2^48 (exact when the union sketch is not full,
    i.e. m < k); |A∩B| = Jaccard · |A∪B|.  Everything below runs on k-row
    frames — broadcast one-row scalars, no full-data pass.  Returns one
    row: est_a, est_b, est_union, est_intersection, jaccard."""
    space = float(1 << 48)

    def _card(ks: DataFrame, name: str) -> DataFrame:
        return ks.agg(
            F.when(
                F.count(F.lit(1)) < k,
                F.count(F.lit(1)).cast("double"),
            )
            .otherwise(F.lit(space) * (k - 1) / F.max("h"))
            .alias(name)
        )

    ka = ka.localCheckpoint(eager=False)
    kb = kb.localCheckpoint(eager=False)
    ku = ka.unionByName(kb).distinct().orderBy("h").limit(int(k))
    ku = ku.localCheckpoint(eager=False)
    both = ku.join(ka, "h", "left_semi").join(kb, "h", "left_semi")
    stats = (
        ku.agg(F.count(F.lit(1)).cast("double").alias("m"))
        .crossJoin(F.broadcast(both.agg(F.count(F.lit(1)).cast("double").alias("c"))))
        .crossJoin(F.broadcast(_card(ka, "est_a")))
        .crossJoin(F.broadcast(_card(kb, "est_b")))
        .crossJoin(F.broadcast(_card(ku, "est_union")))
    )
    return stats.select(
        "est_a",
        "est_b",
        "est_union",
        (F.col("c") / F.col("m") * F.col("est_union")).alias("est_intersection"),
        (F.col("c") / F.col("m")).alias("jaccard"),
    )


def dd_buckets(value: Column, gamma: float = 1.02) -> Column:
    """DDSketch log-bucket index (Masson et al., VLDB 2019): positive v
    lands in bucket ceil(ln(v)/ln(gamma)), guaranteeing every value in a
    bucket is within a (gamma-1)/(gamma+1) RELATIVE error of the bucket
    estimate 2*gamma^i/(gamma+1) — accuracy that scales with the value,
    unlike equi-width histograms whose absolute bin error crushes small
    quantiles.  Zero/negative values map to bucket NULL (store
    separately)."""
    return F.when(
        value > 0, F.ceil(F.log(value.cast("double")) / F.lit(math.log(gamma)))
    )


def dd_sketch(df: DataFrame, key_col: str, val_col: str, gamma: float = 1.02) -> DataFrame:
    """Mergeable DDSketch per key: one map-side-combinable groupBy onto
    (key, bucket) — the sketch IS the count table, so unions of sketches
    merge by adding counts (the HLL/CMS rollup contract)."""
    return (
        df.select(
            F.col(key_col).alias("k"),
            dd_buckets(F.col(val_col), gamma).alias("bucket"),
        )
        .filter(F.col("bucket").isNotNull())
        .groupBy("k", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def dd_quantile(
    sketch: DataFrame, qs: list[float], gamma: float = 1.02
) -> DataFrame:
    """Quantile estimates off a DDSketch count table: for each q, the
    smallest bucket whose cumulative count reaches ceil(q * n) (exact
    integer rank arithmetic — (q_num * n + den - 1) div den with q as a
    fraction), estimated at the bucket's midpoint 2*gamma^i/(gamma+1).
    The relative-error guarantee |est - true| <= (gamma-1)/(gamma+1) *
    true is a theorem of the bucketing.  Windows run over the BUCKET
    table (a few hundred rows per key at gamma = 1.02)."""
    wk = Window.partitionBy("k").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = sketch.select(
        "k", "bucket", F.sum("c").over(wk).alias("cum")
    )
    tot = sketch.groupBy("k").agg(F.sum("c").alias("n"))
    qdf = None
    for q in qs:
        # q as an exact rational over a fixed 1e4 grid keeps the rank
        # arithmetic in BIGINT without as_integer_ratio's 2^53 numerators
        num, den = int(round(q * 10_000)), 10_000
        one = tot.select(
            "k",
            F.lit(float(q)).alias("q"),
            ((F.lit(num) * F.col("n") + F.lit(den) - 1) / F.lit(den))
            .cast("long")
            .alias("r"),
            "n",
        )
        qdf = one if qdf is None else qdf.unionByName(one)
    hit = (
        qdf.join(cum, "k")
        .filter(F.col("cum") >= F.col("r"))
        .groupBy("k", "q", "n")
        .agg(F.min("bucket").alias("i"))
    )
    est = (
        F.lit(2.0)
        * F.pow(F.lit(float(gamma)), F.col("i").cast("double"))
        / F.lit(float(gamma) + 1.0)
    )
    return hit.select("k", "q", "n", F.col("i").alias("bucket"), est.alias("est"))
