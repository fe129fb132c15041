"""Time-series shaping operators: regular-grid resampling with gap fill /
linear interpolation, and SCD Type-2 history construction.

Classic warehouse/observability shapes the reference never had (it is a
retrieval server), in the same beyond-reference family as analytics.py —
any engine sitting on an event stream gets asked for "resample this sensor
to an hourly grid and interpolate the holes" and "give me the validity
intervals of each dimension attribute".

Scale shape:
- ``resample_interpolate``: one keyed aggregation to bucket observations,
  one tiny per-key range agg, a per-key ``sequence`` explode for the grid
  (array length = series length, bounded by time-range/step — for a year
  of hourly buckets that is 8.8k elements, never corpus-scale), then ONE
  window over (key, bucket).  All shuffles are keyed by the series key; a
  100 TB deployment has millions of keys (devices/sensors), so the
  partitionBy parallelizes naturally.  Nothing driver-side.
- ``scd2_history``: two windows over (key, ts) — lag to detect changes,
  lead to close intervals.  One shuffle by key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def resample_interpolate(
    df: DataFrame,
    key_col,
    ts_col: str,
    value_col: str,
    step_s: int = 3600,
) -> DataFrame:
    """Aggregate observations onto a regular ``step_s``-second grid per key
    and fill the holes: observed buckets carry avg(value), missing interior
    buckets are linearly interpolated between the nearest observed
    neighbours, and missing edge buckets are nearest-neighbour extrapolated
    (constant).  Returns (k, bucket, observed, v_filled) — one row per grid
    point from each key's first to last observation.

    ``key_col`` may be a Column expression (e.g. a synthetic sensor id).
    Buckets are epoch seconds (``unix_timestamp`` truncation — the portable
    second-granularity convention shared with the DuckDB oracle).
    """
    obs = (
        df.select(
            F.col(key_col).alias("k") if isinstance(key_col, str) else key_col.alias("k"),
            ((F.unix_timestamp(ts_col) / step_s).cast("bigint") * step_s).alias("bucket"),
            F.col(value_col).alias("_v"),
        )
        .groupBy("k", "bucket")
        .agg(F.avg("_v").alias("v"))
    )
    rng = obs.groupBy("k").agg(F.min("bucket").alias("b0"), F.max("bucket").alias("b1"))
    grid = rng.select(
        "k", F.explode(F.sequence("b0", "b1", F.lit(step_s))).alias("bucket")
    )
    j = grid.join(obs, ["k", "bucket"], "left")
    past = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    future = (
        Window.partitionBy("k")
        .orderBy("bucket")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_bucket = F.when(F.col("v").isNotNull(), F.col("bucket"))
    w = (
        j.withColumn("pv", F.last("v", ignorenulls=True).over(past))
        .withColumn("pb", F.last(obs_bucket, ignorenulls=True).over(past))
        .withColumn("nv", F.first("v", ignorenulls=True).over(future))
        .withColumn("nb", F.first(obs_bucket, ignorenulls=True).over(future))
    )
    interp = F.col("pv") + (F.col("nv") - F.col("pv")) * (
        (F.col("bucket") - F.col("pb")) / (F.col("nb") - F.col("pb"))
    )
    v_filled = (
        F.when(F.col("v").isNotNull(), F.col("v"))
        .when(F.col("pv").isNull(), F.col("nv"))
        .when(F.col("nv").isNull(), F.col("pv"))
        .otherwise(interp)
    )
    return w.select(
        "k",
        "bucket",
        F.col("v").isNotNull().alias("observed"),
        v_filled.alias("v_filled"),
    )


def scd2_history(
    df: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Slowly-Changing-Dimension Type 2: collapse a keyed event stream of
    attribute observations into validity intervals.  A new interval opens
    whenever the attribute differs from the previous observation (ordered
    by ``ts_col`` then ``tiebreak_col`` — the tiebreak makes same-timestamp
    observations deterministic); ``valid_to`` is the next interval's
    ``valid_from`` and NULL marks the current row.

    Returns (key, attr, valid_from, valid_to, is_current).
    """
    order = [F.col(ts_col).asc(), F.col(tiebreak_col).asc()]
    seq = Window.partitionBy(key_col).orderBy(*order)
    changes = (
        df.select(key_col, attr_col, ts_col, tiebreak_col)
        .withColumn("_prev", F.lag(attr_col).over(seq))
        .filter(F.col("_prev").isNull() | (F.col("_prev") != F.col(attr_col)))
    )
    nxt = Window.partitionBy(key_col).orderBy(*order)
    return (
        changes.withColumn("valid_to", F.lead(ts_col).over(nxt))
        .select(
            F.col(key_col).alias("key"),
            F.col(attr_col).alias("attr"),
            F.col(ts_col).alias("valid_from"),
            "valid_to",
            F.col("valid_to").isNull().alias("is_current"),
        )
    )


def scd2_apply_increment(
    current: DataFrame,
    batch: DataFrame,
    key_col: str,
    attr_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Incremental SCD2 maintenance: merge a new batch of observations
    into an existing interval table (the output schema of
    :func:`scd2_history`) WITHOUT reprocessing untouched keys.

    Only keys present in the batch are rebuilt: their open/closed
    intervals are exploded back into observations (valid_from carries the
    original (ts, tiebreak) ordering via the interval's own columns — the
    change-point observations are exactly the interval starts), unioned
    with the batch rows, and re-collapsed by the same change-detection
    window; every other key's intervals pass through untouched.  This is
    the standard "rebuild only dirty partitions" trade: correctness
    identical to a full rebuild (asserted in tests), cost proportional to
    the batch's key set, not the dimension's history.

    Requires batch timestamps >= the affected keys' last ``valid_from``
    for the tiebreak to remain total (the append-only warehouse case);
    out-of-order history loads should use the full :func:`scd2_history`
    rebuild.
    """
    keys = batch.select(F.col(key_col).alias("key")).distinct()
    untouched = current.join(keys, "key", "left_anti")
    affected = current.join(keys, "key", "left_semi")
    # interval starts ARE the change observations; tiebreak regenerated as
    # a constant (intervals are already collapsed, so within a (key, ts)
    # the attr is unique)
    prior_obs = affected.select(
        F.col("key").alias(key_col),
        F.col("attr").alias(attr_col),
        F.col("valid_from").alias(ts_col),
        F.lit(-1).cast("long").alias(tiebreak_col),
    )
    merged = prior_obs.unionByName(
        batch.select(key_col, attr_col, ts_col, F.col(tiebreak_col).cast("long"))
    )
    rebuilt = scd2_history(merged, key_col, attr_col, ts_col, tiebreak_col)
    return untouched.unionByName(rebuilt)


def ewma_trailing(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
    alpha: float = 0.3,
    window: int = 24,
) -> DataFrame:
    """Finite-window exponentially weighted moving average:

        ewma(k, t) = Σ_{j=0..W-1} (1-α)^j · x(k, t-j) / Σ_j (1-α)^j

    (sum over the points that EXIST in the trailing window; missing
    buckets contribute neither weight nor value, so gaps don't drag the
    average toward zero).  The recursive infinite-horizon EWMA is not
    window-expressible without overflow-prone pow(1/(1-α), t) factors;
    the W-term truncation differs from it by at most (1-α)^W · range(x)
    — under 0.08% of signal range at the α=0.3, W=24 default.

    Returns (key, idx, val, ewma, dev = val - ewma).

    Scale: the trailing window is materialized as a BLOCK-BUCKETED self
    join — each row joins to exactly two W-wide blocks (t div W and its
    successor), giving per-row fanout 2 instead of the per-key series-
    length² of a bare non-equi join (the same trick as
    rangejoin.interval_join).  One keyed shuffle + one keyed agg.
    """
    a = series.select(
        F.col(key_col).alias("k"), F.col(idx_col).alias("t"), F.col(val_col).alias("x")
    )
    # contributors replicated into their own block and the next one, so a
    # reader at t finds every t' in (t-W, t] via block(t) ∈ {block(t'), block(t')+1}
    contrib = a.select(
        "k", F.col("t").alias("t2"), F.col("x").alias("x2"),
        F.explode(
            F.array(
                (F.col("t") / window).cast("long"),
                (F.col("t") / window).cast("long") + 1,
            )
        ).alias("blk"),
    )
    readers = a.withColumn("blk", (F.col("t") / window).cast("long"))
    joined = readers.join(contrib, ["k", "blk"]).filter(
        (F.col("t2") <= F.col("t")) & (F.col("t2") > F.col("t") - window)
    )
    w = F.pow(F.lit(1.0 - alpha), F.col("t") - F.col("t2"))
    out = joined.groupBy("k", "t", "x").agg(
        (F.sum(w * F.col("x2")) / F.sum(w)).alias("ewma")
    )
    return out.select(
        F.col("k").alias(key_col),
        F.col("t").alias(idx_col),
        F.col("x").alias(val_col),
        "ewma",
        (F.col("x") - F.col("ewma")).alias("dev"),
    )


def holt_linear(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
    alpha: float = 0.5,
    beta: float = 0.3,
    horizon: int = 0,
) -> DataFrame:
    """Holt double exponential smoothing (Holt 1957) — level + linear
    trend, the forecasting step up from the flat EWMA:

        l_t = α·x_t + (1-α)·(l_{t-1} + b_{t-1})
        b_t = β·(l_t - l_{t-1}) + (1-β)·b_{t-1}        (l_1 = x_1, b_1 = 0)

    A coupled scan-with-carried-state recursion no SQL window expresses;
    like the recursive EWMA it runs as an O(L) higher-order F.aggregate
    fold over each key's sorted series (collect_list + array_sort — per-
    key state bounded by series length, the sessionization contract; at
    100 TB the series per key is the DAILY aggregate, so L = days, not
    rows).  Returns (key, idx, x, level, trend, fitted) where fitted is
    the one-step-ahead forecast l_{t-1} + b_{t-1} (= x_1 at t = 1), plus
    `horizon` extrapolated rows per key (idx beyond the last observed,
    x NULL, fitted = l_T + h·b_T) when horizon > 0.
    """
    a = series.select(
        F.col(key_col).alias("k"), F.col(idx_col).alias("t"), F.col(val_col).alias("x")
    )
    arr = a.groupBy("k").agg(F.array_sort(F.collect_list(F.struct("t", "x"))).alias("xs"))
    fold = F.aggregate(
        F.col("xs"),
        F.array().cast("array<struct<l:double,b:double>>"),
        lambda acc, e: F.when(
            F.size(acc) == 0,
            F.array(F.struct(e["x"].alias("l"), F.lit(0.0).alias("b"))),
        ).otherwise(
            F.concat(
                acc,
                F.array(
                    F.struct(
                        (
                            F.lit(alpha) * e["x"]
                            + F.lit(1.0 - alpha)
                            * (F.element_at(acc, -1)["l"] + F.element_at(acc, -1)["b"])
                        ).alias("l"),
                        (
                            F.lit(beta)
                            * (
                                F.lit(alpha) * e["x"]
                                + F.lit(1.0 - alpha)
                                * (
                                    F.element_at(acc, -1)["l"]
                                    + F.element_at(acc, -1)["b"]
                                )
                                - F.element_at(acc, -1)["l"]
                            )
                            + F.lit(1.0 - beta) * F.element_at(acc, -1)["b"]
                        ).alias("b"),
                    )
                ),
            )
        ),
    )
    st = arr.withColumn("hs", fold)
    fitted = (
        st.select("k", F.posexplode(F.arrays_zip("xs", "hs")))
        .select(
            "k",
            (F.col("pos") + 1).alias("rk"),
            F.col("col.xs.t").alias("t"),
            F.col("col.xs.x").alias("x"),
            F.col("col.hs.l").alias("level"),
            F.col("col.hs.b").alias("trend"),
        )
        .withColumn(
            "fitted",
            F.when(F.col("rk") == 1, F.col("x")).otherwise(
                F.lag("level").over(Window.partitionBy("k").orderBy("rk"))
                + F.lag("trend").over(Window.partitionBy("k").orderBy("rk"))
            ),
        )
        .drop("rk")
    )
    if horizon <= 0:
        return fitted
    last = st.select(
        "k",
        F.element_at("xs", -1)["t"].alias("t_last"),
        F.element_at("hs", -1)["l"].alias("l_last"),
        F.element_at("hs", -1)["b"].alias("b_last"),
    )
    fut = last.select(
        "k",
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h"),
        "t_last", "l_last", "b_last",
    ).select(
        "k",
        (F.col("t_last") + F.col("h")).alias("t"),
        F.lit(None).cast("double").alias("x"),
        F.col("l_last").alias("level"),
        F.col("b_last").alias("trend"),
        (F.col("l_last") + F.col("h") * F.col("b_last")).alias("fitted"),
    )
    return fitted.unionByName(fut)


def best_split(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
) -> DataFrame:
    """Single optimal change-point per key (the binary-segmentation step
    of Scott-Knott / PELT): the split minimizing within-segment SSE,
    closed-form from cumulative (n, Σy, Σy²) prefix windows — no
    iteration, no candidate fanout; one window pass + one row_number per
    key, both partitioned by key so the series shuffles once.  Returns
    (key, split_idx, n_left, mean_left, mean_right, sse_reduction)."""
    a = series.select(
        F.col(key_col).alias("k"), F.col(idx_col).alias("t"), F.col(val_col).alias("y")
    )
    wcum = Window.partitionBy("k").orderBy("t").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = (
        a.withColumn("i", F.count(F.lit(1)).over(wcum).cast("double"))
        .withColumn("cs", F.sum("y").over(wcum))
        .withColumn("css", F.sum(F.col("y") * F.col("y")).over(wcum))
    )
    tot = a.groupBy(F.col("k").alias("k2")).agg(
        F.count(F.lit(1)).cast("double").alias("tn"),
        F.sum("y").alias("ts_"),
        F.sum(F.col("y") * F.col("y")).alias("tss"),
    )
    j = cum.join(F.broadcast(tot), F.col("k") == F.col("k2")).filter(
        F.col("i") < F.col("tn")
    )
    cost = (
        F.col("css") - F.col("cs") * F.col("cs") / F.col("i")
        + (F.col("tss") - F.col("css"))
        - (F.col("ts_") - F.col("cs")) * (F.col("ts_") - F.col("cs"))
        / (F.col("tn") - F.col("i"))
    )
    sse0 = F.col("tss") - F.col("ts_") * F.col("ts_") / F.col("tn")
    ranked = j.withColumn("cost", cost).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("k").orderBy(F.col("cost").asc(), F.col("t").asc())
        ),
    )
    return ranked.filter(F.col("rk") == 1).select(
        F.col("k").alias(key_col),
        F.col("t").alias("split_idx"),
        F.col("i").cast("long").alias("n_left"),
        (F.col("cs") / F.col("i")).alias("mean_left"),
        ((F.col("ts_") - F.col("cs")) / (F.col("tn") - F.col("i"))).alias("mean_right"),
        (sse0 - F.col("cost")).alias("sse_reduction"),
    )


def acf(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
    max_lag: int = 24,
) -> DataFrame:
    """Sample autocorrelation function (Box-Jenkins r_k) of a regular
    integer-indexed count series, per key, for lags 1..max_lag:

        r_k = sum_{t<=n-k} (y_t - m)(y_{t+k} - m) / sum_t (y_t - m)^2

    with m the full-series mean.  Gaps in the index are densified to
    y = 0 first (an absent hour IS a zero-count observation), so both
    engines see the same regular grid.  All sums (n, S = sum y,
    Q = sum y^2, Syy_k = sum y_t*y_{t+k}, head/tail window sums) are
    exact BIGINT aggregates — order-independent, so Spark and the oracle
    agree bit-for-bit — and the mean-centering is algebra applied once,
    in DOUBLE, to those integer scalars:

        r_k = (n^2*Syy_k - n*S*(H_k+T_k) + (n-k)*S^2) / (n^2*Q - n*S^2)

    Plan shape: one groupBy densify per key, one explode(lags) +
    equi-join on (key, t+lag) — shuffles carry (key, t, y) longs only —
    then two keyed aggs and a broadcast join of the per-key scalar row.
    The series per key is an AGGREGATE grid (hours/days), so n is
    bounded by the window span, not the raw row count; at 100 TB the
    integer products would be formed in double instead (documented
    seam), but at any per-bucket count < 1e6 the BIGINT path is exact.

    Returns (key, lag, n, r, significant) where significant applies the
    Bartlett large-lag bound |r_k| > 1.96/sqrt(n).  Keys with zero
    variance (constant series) emit NULL r.
    """
    a = series.select(
        F.col(key_col).alias("k"),
        F.col(idx_col).cast("long").alias("t"),
        F.col(val_col).cast("long").alias("y"),
    )
    bounds = a.groupBy("k").agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    grid = bounds.select(
        "k", F.explode(F.sequence("t0", "t1")).alias("t")
    )
    dense = (
        grid.join(a, ["k", "t"], "left")
        .select("k", "t", F.coalesce("y", F.lit(0)).alias("y"))
        .localCheckpoint(eager=False)
    )
    scal = dense.groupBy(F.col("k").alias("ks")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("q"),
    )
    lagged = dense.select(
        "k",
        F.explode(F.sequence(F.lit(1), F.lit(int(max_lag)))).alias("lag"),
        F.col("t").alias("tl"),
        F.col("y").alias("yl"),
    )
    pairs = lagged.join(
        dense.select(
            F.col("k").alias("kr"), F.col("t").alias("tr"), F.col("y").alias("yr")
        ),
        (F.col("kr") == F.col("k")) & (F.col("tr") == F.col("tl") + F.col("lag")),
    )
    per_lag = pairs.groupBy("k", "lag").agg(
        F.sum(F.col("yl") * F.col("yr")).alias("syy"),
        F.sum("yl").alias("h"),
        F.sum("yr").alias("tt"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    qd = F.col("q").cast("double")
    num = (
        nd * nd * F.col("syy").cast("double")
        - nd * sd * (F.col("h") + F.col("tt")).cast("double")
        + (nd - F.col("lag")) * sd * sd
    )
    den = nd * nd * qd - nd * sd * sd
    out = per_lag.join(F.broadcast(scal), F.col("k") == F.col("ks")).select(
        F.col("k").alias(key_col),
        "lag",
        "n",
        F.when(den > 0, F.round(num / den, 6)).alias("r"),
        F.when(den > 0, F.abs(num / den) > F.lit(1.96) / F.sqrt(nd)).alias(
            "significant"
        ),
    )
    return out


def xcf(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
    max_lag: int = 12,
) -> DataFrame:
    """Sample cross-correlation function r_xy(k) between EVERY ordered
    pair of keys' series, lags 0..max_lag — the lead-lag diagnostic
    (does `view` volume at hour t predict `purchase` volume at t+k?).
    Lag 0 is the plain Pearson correlation of the two series; negative
    lags are read from the swapped pair, since r_xy(-k) = r_yx(k).

        r_xy(k) = sum_t (x_t - mx)(y_{t+k} - my)
                  / sqrt(sum (x-mx)^2 * sum (y-my)^2)

    Every series densifies to zero on the GLOBAL index span (so all
    pairs share one grid of length n) and, as in ``acf``, every sum is
    an exact BIGINT aggregate; mean-centering is applied once in DOUBLE
    to the integer scalars:

        r = (n^2*Sxy_k - n*Sx*Ty_k - n*Sy*Hx_k + (n-k)*Sx*Sy)
            / (n * sqrt((n*Qx - Sx^2) * (n*Qy - Sy^2)))

    Plan: one densify join, one explode(lags+partner) equi-join on
    (t + lag) shuffling (key, t, y) longs, a keyed agg per (pair, lag),
    then two broadcast joins of the per-key scalar rows.  Key count K
    fans out K*(K-1) pairs — meant for a HANDFUL of series (event
    types, channels), not per-user series.  Zero-variance keys emit
    NULL r.
    """
    a = series.select(
        F.col(key_col).alias("k"),
        F.col(idx_col).cast("long").alias("t"),
        F.col(val_col).cast("long").alias("y"),
    )
    bounds = a.agg(F.min("t").alias("t0"), F.max("t").alias("t1"))
    keys = a.select("k").distinct()
    grid = keys.crossJoin(F.broadcast(bounds)).select(
        "k", F.explode(F.sequence("t0", "t1")).alias("t")
    )
    dense = (
        grid.join(a, ["k", "t"], "left")
        .select("k", "t", F.coalesce("y", F.lit(0)).alias("y"))
        .localCheckpoint(eager=False)
    )
    scal = dense.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("s"),
        F.sum(F.col("y") * F.col("y")).alias("q"),
    )
    left = dense.select(
        F.col("k").alias("ka"),
        F.explode(F.sequence(F.lit(0), F.lit(int(max_lag)))).alias("lag"),
        F.col("t").alias("tl"),
        F.col("y").alias("yl"),
    )
    pairs = left.join(
        dense.select(
            F.col("k").alias("kb"), F.col("t").alias("tr"), F.col("y").alias("yr")
        ),
        (F.col("tr") == F.col("tl") + F.col("lag")) & (F.col("kb") != F.col("ka")),
    )
    per_lag = pairs.groupBy("ka", "kb", "lag").agg(
        F.sum(F.col("yl") * F.col("yr")).alias("sxy"),
        F.sum("yl").alias("hx"),
        F.sum("yr").alias("ty"),
    )
    sa = scal.select(
        F.col("k").alias("ka2"), F.col("n").alias("n"),
        F.col("s").alias("sx"), F.col("q").alias("qx"),
    )
    sb = scal.select(
        F.col("k").alias("kb2"), F.col("s").alias("sy"), F.col("q").alias("qy"),
    )
    j = per_lag.join(F.broadcast(sa), F.col("ka") == F.col("ka2")).join(
        F.broadcast(sb), F.col("kb") == F.col("kb2")
    )
    nd = F.col("n").cast("double")
    sxd = F.col("sx").cast("double")
    syd = F.col("sy").cast("double")
    num = (
        nd * nd * F.col("sxy").cast("double")
        - nd * sxd * F.col("ty").cast("double")
        - nd * syd * F.col("hx").cast("double")
        + (nd - F.col("lag")) * sxd * syd
    )
    vx = nd * F.col("qx").cast("double") - sxd * sxd
    vy = nd * F.col("qy").cast("double") - syd * syd
    den = nd * F.sqrt(vx * vy)
    return j.select(
        F.col("ka").alias("key_x"),
        F.col("kb").alias("key_y"),
        "lag",
        "n",
        F.when((vx > 0) & (vy > 0), F.round(num / den, 6)).alias("r"),
    )


def holt_winters_additive(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
    alpha: float = 0.5,
    beta: float = 0.25,
    gamma: float = 0.25,
    period: int = 7,
    horizon: int = 0,
) -> DataFrame:
    """Holt-Winters ADDITIVE seasonal smoothing (Winters 1960) — level +
    trend + a rotating seasonal queue of length `period`, the step up
    from ``holt_linear`` for cyclic series (weekly traffic shape):

        l_t = a*(x_t - s_{t-m}) + (1-a)*(l_{t-1} + b_{t-1})
        b_t = B*(l_t - l_{t-1}) + (1-B)*b_{t-1}
        s_t = g*(x_t - l_t) + (1-g)*s_{t-m}

    initialized from the first season: l_m = mean(x_1..x_m), b_m = 0,
    s_i = x_i - l_m.  Like the EWMA/Holt folds this is a coupled
    scan-with-carried-state no SQL window expresses; it runs as one
    O(L) F.aggregate fold per key over the sorted series, with the
    seasonal state carried as a `period`-slot queue (head = s_{t-m},
    shift left, push s_t).  Values should be INTEGER counts and the
    smoothing constants binary-exact (0.5 / 0.25 / 0.75) so the
    initialization (S_m/m on exact integer sums) and every subsequent
    double op replay bit-identically in a recursive-CTE oracle carrying
    the queue as `period` explicit columns.

    Emits one row per observation AFTER the first season
    (key, idx, x, level, trend, seasonal_used, fitted) where fitted =
    l_{t-1} + b_{t-1} + s_{t-m} is the one-step-ahead forecast, plus
    `horizon` extrapolation rows (x NULL, fitted = l_T + h*b_T +
    s_{T+h-m}, h <= period) when horizon > 0.  Keys with fewer than
    period + 1 observations emit nothing.
    """
    m = int(period)
    if horizon > m:
        raise ValueError("holt_winters_additive: horizon must be <= period")
    a = series.select(
        F.col(key_col).alias("k"), F.col(idx_col).alias("t"),
        F.col(val_col).cast("double").alias("x"),
    )
    arr = a.groupBy("k").agg(
        F.array_sort(F.collect_list(F.struct("t", "x"))).alias("xs")
    ).filter(F.size("xs") > m)
    init = arr.select(
        "k",
        F.slice("xs", m + 1, F.size("xs") - m).alias("rest"),
        F.slice("xs", 1, m).alias("head"),
        (
            F.aggregate(
                F.slice("xs", 1, m),
                F.lit(0.0),
                lambda acc, e: acc + e["x"],
            )
            / F.lit(float(m))
        ).alias("l0"),
    ).select(
        "k",
        "rest",
        "l0",
        F.transform("head", lambda e: e["x"] - F.col("l0")).alias("s0"),
    )
    la, lb, lg = float(alpha), float(beta), float(gamma)

    def step(acc, e):
        l = acc["l"]
        b = acc["b"]
        s = acc["s"]
        su = F.element_at(s, 1)
        f = l + b + su
        l_new = F.lit(la) * (e["x"] - su) + F.lit(1.0 - la) * (l + b)
        b_new = (
            F.lit(lb) * (F.lit(la) * (e["x"] - su) + F.lit(1.0 - la) * (l + b) - l)
            + F.lit(1.0 - lb) * b
        )
        s_new = (
            F.lit(lg)
            * (e["x"] - (F.lit(la) * (e["x"] - su) + F.lit(1.0 - la) * (l + b)))
            + F.lit(1.0 - lg) * su
        )
        return F.struct(
            l_new.alias("l"),
            b_new.alias("b"),
            F.concat(F.slice(s, 2, m - 1), F.array(s_new)).alias("s"),
            F.concat(
                acc["hist"],
                F.array(
                    F.struct(
                        l_new.alias("l"),
                        b_new.alias("b"),
                        su.alias("su"),
                        f.alias("f"),
                    )
                ),
            ).alias("hist"),
        )

    folded = init.select(
        "k",
        "rest",
        F.aggregate(
            "rest",
            F.struct(
                F.col("l0").alias("l"),
                F.lit(0.0).alias("b"),
                F.col("s0").alias("s"),
                F.array().cast(
                    "array<struct<l:double,b:double,su:double,f:double>>"
                ).alias("hist"),
            ),
            step,
        ).alias("st"),
    ).localCheckpoint(eager=False)
    fitted = folded.select(
        "k", F.posexplode(F.arrays_zip("rest", F.col("st.hist")))
    ).select(
        "k",
        F.col("col.rest.t").alias("t"),
        F.col("col.rest.x").alias("x"),
        F.col("col.hist.l").alias("level"),
        F.col("col.hist.b").alias("trend"),
        F.col("col.hist.su").alias("seasonal_used"),
        F.col("col.hist.f").alias("fitted"),
    )
    if horizon <= 0:
        return fitted
    fut = folded.select(
        "k",
        F.element_at("rest", -1)["t"].alias("t_last"),
        F.col("st.l").alias("l"),
        F.col("st.b").alias("b"),
        F.col("st.s").alias("s"),
    ).select(
        "k",
        F.explode(F.sequence(F.lit(1), F.lit(int(horizon)))).alias("h"),
        "t_last", "l", "b", "s",
    ).select(
        "k",
        (F.col("t_last") + F.col("h")).alias("t"),
        F.lit(None).cast("double").alias("x"),
        F.col("l").alias("level"),
        F.col("b").alias("trend"),
        F.element_at("s", F.col("h").cast("int")).alias("seasonal_used"),
        (F.col("l") + F.col("h") * F.col("b") + F.element_at("s", F.col("h").cast("int"))).alias("fitted"),
    )
    return fitted.unionByName(fut)


def pacf(
    series: DataFrame,
    key_col: str,
    idx_col: str,
    val_col: str,
    max_lag: int = 24,
) -> DataFrame:
    """Partial autocorrelation function via the Durbin-Levinson
    recursion — the AR-order identification companion to ``acf`` (an
    AR(p) process cuts off after lag p in the PACF, while its ACF
    decays):

        phi_{1,1} = r_1
        phi_{k,k} = (r_k - sum_j phi_{k-1,j} r_{k-j})
                    / (1 - sum_j phi_{k-1,j} r_j)
        phi_{k,j} = phi_{k-1,j} - phi_{k,k} phi_{k-1,k-j}

    Input autocorrelations come from ``acf`` ALREADY ROUNDED to 6 dp —
    quantized identically in any engine — so the recursion sees
    bit-identical doubles and every fold step (left-associated dot
    products, one division per order) replays exactly in a
    recursive-CTE oracle carrying the phi vector as a LIST column.

    Runs as one O(K^2) F.aggregate fold per key over the K collected
    ACF values (K = max_lag, a constant), after ``acf``'s distributed
    integer-sum pipeline — so the corpus-scale work is unchanged from
    ``acf`` and the recursion cost is independent of data volume.
    Keys whose ACF is NULL (zero variance) are dropped.  Returns
    (key, lag, r, pacf).
    """
    r = acf(series, key_col, idx_col, val_col, max_lag=max_lag).filter(
        F.col("r").isNotNull()
    )
    arr = r.groupBy(F.col(key_col).alias("k")).agg(
        F.array_sort(F.collect_list(F.struct("lag", "r"))).alias("rv")
    )

    def dot(xs, ys):
        return F.aggregate(
            F.zip_with(xs, ys, lambda p, q: p * q), F.lit(0.0), lambda a, b: a + b
        )

    def step(acc, e):
        rs = acc["rs"]
        phi = acc["phi"]
        pac = acc["pac"]
        num = e["r"] - dot(phi, F.reverse(rs))
        den = F.lit(1.0) - dot(phi, rs)
        pkk = num / den
        phi_new = F.concat(
            F.zip_with(phi, F.reverse(phi), lambda p, pr: p - pkk * pr),
            F.array(pkk),
        )
        return F.when(
            F.size(rs) == 0,
            F.struct(
                F.array(e["r"]).alias("rs"),
                F.array(e["r"]).alias("phi"),
                F.array(e["r"]).alias("pac"),
            ),
        ).otherwise(
            F.struct(
                F.concat(rs, F.array(e["r"])).alias("rs"),
                phi_new.alias("phi"),
                F.concat(pac, F.array(pkk)).alias("pac"),
            )
        )

    folded = arr.select(
        "k",
        F.col("rv"),
        F.aggregate(
            "rv",
            F.struct(
                F.array().cast("array<double>").alias("rs"),
                F.array().cast("array<double>").alias("phi"),
                F.array().cast("array<double>").alias("pac"),
            ),
            step,
        ).alias("st"),
    )
    return folded.select(
        "k", F.posexplode(F.arrays_zip("rv", F.col("st.pac")))
    ).select(
        F.col("k").alias(key_col),
        F.col("col.rv.lag").alias("lag"),
        F.col("col.rv.r").alias("r"),
        F.round(F.col("col.pac"), 6).alias("pacf"),
    )
