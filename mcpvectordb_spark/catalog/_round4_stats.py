"""Round-4 stats/TS/graph additions: rank stats, sketches, forecasting, OLS/GLM readouts, graph metrics, drift/PSI, calibration.

Split out of the original single-file catalog.py (round-5 refactor,
round-4 verdict item #3).  Import order is load-bearing: later sections
reference names from earlier ones via the wildcard chain below."""
from __future__ import annotations

from mcpvectordb_spark.catalog._common import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._search import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._corpus import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._curation import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._events import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._nonsql import *  # noqa: F401,F403
from mcpvectordb_spark.catalog._round4_core import *  # noqa: F401,F403

def q_parts_linkpred(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adamic-Adar link prediction (graph.py::adamic_adar_linkpred) on the
    recurring supplier↔part graph: the 20 part pairs with the strongest
    shared-supplier evidence that do NOT yet trade through a common
    recurring link — "these two parts will co-occur next".  Wedge join on
    the shared neighbor + broadcast degree table + one keyed agg; the
    oracle replays the same wedge/degree/anti-join pipeline."""
    from mcpvectordb_spark.operators.graph import adamic_adar_linkpred

    sp = _supplier_part_recurring(spark, sf_dir).select(
        (-F.col("suppkey")).alias("src"), F.col("partkey").alias("dst")
    )
    out = adamic_adar_linkpred(sp)
    return (
        out.filter(F.col("a") > 0)
        .select("a", "b", "common_neighbors", F.round("adamic_adar", 6).alias("adamic_adar"))
        .orderBy(F.col("adamic_adar").desc(), F.col("a").asc(), F.col("b").asc())
        .limit(20)
    )


SQL_PARTS_LINKPRED = """
WITH sp AS (
  SELECT -l_suppkey AS src, l_partkey AS dst
  FROM lineitem GROUP BY 1, 2 HAVING count(*) >= 2),
und AS (SELECT src AS s, dst AS t FROM sp UNION SELECT dst AS s, src AS t FROM sp),
deg AS (SELECT s AS z, CAST(count(*) AS BIGINT) AS deg_z FROM und GROUP BY 1),
wedge AS (
  SELECT u1.t AS a, u2.t AS b, d.deg_z
  FROM und u1 JOIN und u2 ON u1.s = u2.s AND u1.t < u2.t
  JOIN deg d ON d.z = u1.s),
scored AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS common_neighbors,
         sum(1.0 / ln(deg_z)) AS aa
  FROM wedge GROUP BY 1, 2),
cand AS (
  SELECT sc.* FROM scored sc
  LEFT JOIN und e ON e.s = sc.a AND e.t = sc.b
  WHERE e.s IS NULL)
SELECT a, b, common_neighbors, round(aa, 6) AS adamic_adar
FROM cand WHERE a > 0
ORDER BY round(aa, 6) DESC, a ASC, b ASC LIMIT 20
"""


def q_events_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test (stats.py::mann_whitney_u) between the
    same hash-assigned arms as events_ab_test, on per-user purchase
    revenue in CENTS (integral metric → tied blocks agree bit-exactly
    across engines; the same quantization bounds the rank window's
    distinct domain at scale).  The oracle replays assignment, midranks,
    tie-corrected variance and the rank-biserial effect size."""
    from mcpvectordb_spark.operators.stats import ab_assign, mann_whitney_u

    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum(F.round(F.col("value") * 100).cast("long")).alias("metric"))
    )
    samples = users.select(
        ab_assign(F.col("user_id")).alias("variant"), "metric"
    )
    out = mann_whitney_u(samples)
    return out.select(
        "n_a", "n_b",
        F.round("u_a", 1).alias("u_a"),
        F.round("z", 6).alias("z"),
        F.round("rank_biserial", 6).alias("rank_biserial"),
    )


SQL_EVENTS_MANNWHITNEY = f"""
WITH users AS (
  SELECT user_id AS u,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS metric
  FROM events WHERE event_type = 'purchase' GROUP BY 1),
assigned AS (
  SELECT metric, ({_sql_hex48("'ab:' || CAST(u AS VARCHAR)")}) % 2 AS variant
  FROM users),
pv AS (
  SELECT metric AS v,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_a,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS cnt_b
  FROM assigned GROUP BY 1),
ranked AS (
  SELECT cnt_a, cnt_b, cnt_a + cnt_b AS cnt,
         sum(cnt_a + cnt_b) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - (cnt_a + cnt_b) + (cnt_a + cnt_b + 1) / 2.0 AS midrank
  FROM pv),
agg AS (
  SELECT CAST(sum(cnt_a) AS BIGINT) AS n_a, CAST(sum(cnt_b) AS BIGINT) AS n_b,
         CAST(sum(cnt_a * midrank) AS DOUBLE) AS r_a,
         CAST(sum(cnt * cnt * cnt - cnt) AS DOUBLE) AS ties_t
  FROM ranked),
fin AS (
  SELECT n_a, n_b,
         r_a - n_a * (n_a + 1) / 2.0 AS u_a,
         n_a * CAST(n_b AS DOUBLE) / 2.0 AS mu,
         n_a * CAST(n_b AS DOUBLE) / 12.0
           * ((n_a + n_b + 1) - ties_t / (CAST(n_a + n_b AS DOUBLE) * (n_a + n_b - 1))) AS var
  FROM agg)
SELECT n_a, n_b, round(u_a, 1) AS u_a,
       round(CASE WHEN var > 0 THEN (u_a - mu) / sqrt(var) ELSE 0.0 END, 6) AS z,
       round(1.0 - 2.0 * u_a / (n_a * CAST(n_b AS DOUBLE)), 6) AS rank_biserial
FROM fin
"""


_KMV_K = 256


def q_orders_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (theta-style) sketch set algebra (sketches.py::kmv_sketch /
    kmv_set_stats): distinct-customer cardinality, union, INTERSECTION and
    Jaccard estimates for the 1995-vs-1996 buyer sets from two 256-long
    sketches — the mergeable structure that answers audience-overlap
    questions at 100 TB without ever co-shuffling the raw key sets (HLL
    unions can't intersect; KMV can).  Each sketch is a
    TakeOrderedAndProject (per-partition top-k, no full shuffle); all the
    set algebra below runs on k-row frames.  The oracle replays the exact
    k-min hash construction and every estimator formula."""
    from mcpvectordb_spark.operators.sketches import kmv_set_stats, kmv_sketch

    o = load_table(spark, sf_dir, "orders")
    key = F.concat(F.lit("cust:"), F.col("o_custkey").cast("string"))
    ka = kmv_sketch(o.filter(F.year("o_orderdate") == 1995), key, k=_KMV_K)
    kb = kmv_sketch(o.filter(F.year("o_orderdate") == 1996), key, k=_KMV_K)
    out = kmv_set_stats(ka, kb, k=_KMV_K)
    return out.select(
        F.round("est_a", 4).alias("est_a"),
        F.round("est_b", 4).alias("est_b"),
        F.round("est_union", 4).alias("est_union"),
        F.round("est_intersection", 4).alias("est_intersection"),
        F.round("jaccard", 6).alias("jaccard"),
    )


def _sql_orders_kmv() -> str:
    h = _sql_hex48("'cust:' || CAST(o_custkey AS VARCHAR)")
    k = _KMV_K
    card = (
        "SELECT CASE WHEN count(*) < {k} THEN CAST(count(*) AS DOUBLE) "
        "ELSE 281474976710656.0 * {km1} / max(h) END AS {name} FROM {src}"
    )
    return f"""
WITH ha AS (SELECT DISTINCT {h} AS h FROM orders WHERE year(o_orderdate) = 1995),
hb AS (SELECT DISTINCT {h} AS h FROM orders WHERE year(o_orderdate) = 1996),
ka AS (SELECT h FROM ha ORDER BY h LIMIT {k}),
kb AS (SELECT h FROM hb ORDER BY h LIMIT {k}),
ku AS (SELECT DISTINCT h FROM (SELECT h FROM ka UNION ALL SELECT h FROM kb) ORDER BY h LIMIT {k}),
m AS (SELECT CAST(count(*) AS DOUBLE) AS m FROM ku),
c AS (SELECT CAST(count(*) AS DOUBLE) AS c FROM ku
      WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
ca AS ({card.format(k=k, km1=k - 1, name="est_a", src="ka")}),
cb AS ({card.format(k=k, km1=k - 1, name="est_b", src="kb")}),
cu AS ({card.format(k=k, km1=k - 1, name="est_union", src="ku")})
SELECT round(est_a, 4) AS est_a, round(est_b, 4) AS est_b,
       round(est_union, 4) AS est_union,
       round(c / m * est_union, 4) AS est_intersection,
       round(c / m, 6) AS jaccard
FROM ca, cb, cu, c, m
"""


SQL_ORDERS_KMV = _sql_orders_kmv()


def q_events_stl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive STL-lite seasonal decomposition of the daily event count:
    trend = centered 7-day moving average (full windows only), seasonal =
    mean detrended value per ISO weekday, residual z-score against the
    residual sigma — the classical decomposition behind seasonal anomaly
    detection.  One daily pre-aggregation shrinks the stream to |days|
    rows; every window after that runs on the tiny daily series (at 100 TB
    the windows still see only |days| rows — the scan does all the work).
    Output: one row per day with full trend coverage."""
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("d")).agg(
        F.count(F.lit(1)).cast("long").alias("y")
    )
    w7 = Window.orderBy("d").rowsBetween(-3, 3)
    t = daily.withColumn("n7", F.count(F.lit(1)).over(w7)).withColumn(
        "trend", F.avg("y").over(w7)
    )
    valid = t.filter(F.col("n7") == 7).withColumn("det", F.col("y") - F.col("trend"))
    seas = valid.withColumn("dow", F.weekday("d") + F.lit(1)).withColumn(
        "seasonal", F.avg("det").over(Window.partitionBy("dow"))
    )
    resid = seas.withColumn("resid", F.col("det") - F.col("seasonal"))
    sigma = resid.agg(F.stddev_pop("resid").alias("sigma"))
    return (
        resid.crossJoin(F.broadcast(sigma))
        .select(
            F.date_format("d", "yyyy-MM-dd").alias("d"),
            "y",
            F.round("trend", 4).alias("trend"),
            F.round("seasonal", 4).alias("seasonal"),
            F.round("resid", 4).alias("resid"),
            F.round(F.col("resid") / F.col("sigma"), 4).alias("z"),
        )
        .orderBy("d")
    )


SQL_EVENTS_STL = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS d, CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1),
t AS (
  SELECT d, y,
         count(*) OVER w7 AS n7, avg(y) OVER w7 AS trend
  FROM daily WINDOW w7 AS (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)),
valid AS (SELECT d, y, trend, y - trend AS det FROM t WHERE n7 = 7),
seas AS (
  SELECT d, y, trend, det, isodow(d) AS dow,
         avg(det) OVER (PARTITION BY isodow(d)) AS seasonal
  FROM valid),
resid AS (SELECT d, y, trend, seasonal, det - seasonal AS resid FROM seas),
sig AS (SELECT stddev_pop(resid) AS sigma FROM resid)
SELECT strftime(d, '%Y-%m-%d') AS d, y,
       round(trend, 4) AS trend, round(seasonal, 4) AS seasonal,
       round(resid, 4) AS resid, round(resid / sigma, 4) AS z
FROM resid, sig ORDER BY d
"""


def q_events_holt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt double exponential smoothing (timeseries.py::holt_linear) of
    the daily event count per type, plus a 3-day linear-trend forecast —
    the coupled (level, trend) recursion runs as one O(L) F.aggregate
    fold per key (same contract as events_ewma_recursive); the oracle
    replays it step-by-step with a recursive CTE, so the fold is
    value-proven against the definition.  Forecast rows carry n = -1.
    α=0.5 / β=0.25 are binary-exact so 1-α / 1-β computed Python-side
    equal the SQL literals bit-for-bit (0.3/0.7 diverge by 1 ulp and a
    round-boundary row flips — observed, not hypothetical)."""
    from mcpvectordb_spark.operators.timeseries import holt_linear

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).cast("double").alias("x"))
    out = holt_linear(daily, "k", "t", "x", alpha=0.5, beta=0.25, horizon=3)
    return out.select(
        F.col("k").alias("event_type"),
        "t",
        F.coalesce(F.col("x"), F.lit(-1.0)).cast("long").alias("n"),
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("fitted", 6).alias("fitted"),
    )


SQL_EVENTS_HOLT = """
WITH RECURSIVE daily AS (
  SELECT event_type AS k,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT k, t, x, row_number() OVER (PARTITION BY k ORDER BY t) AS rk
  FROM daily),
holt AS (
  SELECT k, rk, t, x, x AS l, CAST(0.0 AS DOUBLE) AS b, x AS fitted
  FROM ranked WHERE rk = 1
  UNION ALL
  SELECT r.k, r.rk, r.t, r.x,
         0.5 * r.x + 0.5 * (h.l + h.b) AS l,
         0.25 * (0.5 * r.x + 0.5 * (h.l + h.b) - h.l) + 0.75 * h.b AS b,
         h.l + h.b AS fitted
  FROM holt h JOIN ranked r ON r.k = h.k AND r.rk = h.rk + 1),
last AS (SELECT k, max(rk) AS mrk FROM holt GROUP BY 1),
lastrow AS (
  SELECT h.k, h.t, h.l, h.b FROM holt h JOIN last l ON h.k = l.k AND h.rk = l.mrk),
fut AS (
  SELECT lr.k, lr.t + gs.h AS t, CAST(-1.0 AS DOUBLE) AS x,
         lr.l AS l, lr.b AS b, lr.l + gs.h * lr.b AS fitted
  FROM lastrow lr, (SELECT unnest(range(1, 4)) AS h) gs)
SELECT k AS event_type, t, CAST(x AS BIGINT) AS n,
       round(l, 6) AS level, round(b, 6) AS trend, round(fitted, 6) AS fitted
FROM (SELECT k, t, x, l, b, fitted FROM holt
      UNION ALL SELECT k, t, x, l, b, fitted FROM fut)
"""


def q_events_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-segmentation change-point detection (the single-split step
    of Scott & Knott / PELT-style segmentation) over hourly event volume
    per type (timeseries.py::best_split): the split k that minimizes
    within-segment SSE, solved in CLOSED FORM from cumulative (n, Σy,
    Σy²) prefix windows — no iteration, no candidate explosion; each
    key's argmin is one row_number over its own hourly series.  It
    complements events_cusum
    (online drift) with the offline optimal-split view.  Hourly counts
    are integers, so the prefix sums are exact and both engines compute
    bit-identical costs.  Output per type: split bucket, segment means,
    and the SSE reduction achieved by splitting."""
    from mcpvectordb_spark.operators.timeseries import best_split

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        ((F.unix_timestamp("ts") / 3600).cast("bigint") * 3600).alias("bucket"),
    ).agg(F.count(F.lit(1)).cast("double").alias("y"))
    out = best_split(hourly, "event_type", "bucket", "y")
    return out.select(
        "event_type",
        F.col("split_idx").alias("split_bucket"),
        "n_left",
        F.round("mean_left", 6).alias("mean_left"),
        F.round("mean_right", 6).alias("mean_right"),
        F.round("sse_reduction", 6).alias("sse_reduction"),
    ).orderBy("event_type")


SQL_EVENTS_CHANGEPOINT = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) * 3600 AS bucket,
         CAST(count(*) AS DOUBLE) AS y
  FROM events GROUP BY 1, 2),
cum AS (
  SELECT event_type, bucket, y,
         CAST(count(*) OVER w AS DOUBLE) AS i,
         sum(y) OVER w AS cs,
         sum(y * y) OVER w AS css
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
tot AS (
  SELECT event_type AS et, CAST(count(*) AS DOUBLE) AS tn,
         sum(y) AS ts_, sum(y * y) AS tss
  FROM hourly GROUP BY 1),
costs AS (
  SELECT c.event_type, c.bucket, c.i, c.cs, t.tn, t.ts_, t.tss,
         c.css - c.cs * c.cs / c.i
           + (t.tss - c.css) - (t.ts_ - c.cs) * (t.ts_ - c.cs) / (t.tn - c.i) AS cost
  FROM cum c JOIN tot t ON c.event_type = t.et
  WHERE c.i < t.tn),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY cost ASC, bucket ASC) AS rk
  FROM costs)
SELECT event_type, bucket AS split_bucket, CAST(i AS BIGINT) AS n_left,
       round(cs / i, 6) AS mean_left,
       round((ts_ - cs) / (tn - i), 6) AS mean_right,
       round((tss - ts_ * ts_ / tn) - cost, 6) AS sse_reduction
FROM ranked WHERE rk = 1 ORDER BY event_type
"""


def q_events_acf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample autocorrelation function (timeseries.py::acf) of the
    HOURLY event-count series per type, lags 1..36 — the diagnostic that
    exposes the daily cycle (r_24 spike) and distinguishes trending from
    white-noise volume before fitting Holt/STL models.  Missing hours
    densify to zero counts; every sum (n, S, Q, lag products, head/tail
    window sums) is an exact BIGINT aggregate, so the mean-centered
    Box-Jenkins r_k reduces to ONE double expression over integer
    scalars that both engines evaluate bit-identically:

        r_k = (n^2*Syy_k - n*S*(H_k+T_k) + (n-k)*S^2) / (n^2*Q - n*S^2)

    Plan: densify grid join, explode(36 lags) + equi-join on
    (type, t+lag) shuffling only (string, long, long) rows, two keyed
    aggs, broadcast of the per-type scalar row.  Bartlett significance
    bound at 1.96/sqrt(n).  Reference ships no ACF (query surface is
    vector search, mcpvectordb/store.py); this extends the time-series
    family (events_stl / events_holt / events_changepoint) with the
    model-identification step."""
    from mcpvectordb_spark.operators.timeseries import acf

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return acf(hourly, "event_type", "t", "y", max_lag=36).select(
        "event_type",
        "lag",
        "n",
        "r",
        "significant",
    )


SQL_EVENTS_ACF = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(t) AS t0, max(t) AS t1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(t0, t1 + 1)) AS t FROM bounds),
dense AS (
  SELECT g.event_type, g.t, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.t = g.t),
scal AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
  FROM dense GROUP BY 1),
lags AS (SELECT unnest(range(1, 37)) AS lag),
per_lag AS (
  SELECT l.event_type, lg.lag,
         CAST(sum(l.y * r.y) AS BIGINT) AS syy,
         CAST(sum(l.y) AS BIGINT) AS h,
         CAST(sum(r.y) AS BIGINT) AS tt
  FROM dense l CROSS JOIN lags lg
  JOIN dense r ON r.event_type = l.event_type AND r.t = l.t + lg.lag
  GROUP BY 1, 2)
SELECT p.event_type, p.lag, s.n,
       CASE WHEN CAST(s.n AS DOUBLE) * s.n * s.q - CAST(s.n AS DOUBLE) * s.s * s.s > 0
            THEN round((CAST(s.n AS DOUBLE) * s.n * p.syy
                        - CAST(s.n AS DOUBLE) * s.s * CAST(p.h + p.tt AS DOUBLE)
                        + (CAST(s.n AS DOUBLE) - p.lag) * s.s * s.s)
                       / (CAST(s.n AS DOUBLE) * s.n * s.q
                          - CAST(s.n AS DOUBLE) * s.s * s.s), 6)
       END AS r,
       CASE WHEN CAST(s.n AS DOUBLE) * s.n * s.q - CAST(s.n AS DOUBLE) * s.s * s.s > 0
            THEN abs((CAST(s.n AS DOUBLE) * s.n * p.syy
                      - CAST(s.n AS DOUBLE) * s.s * CAST(p.h + p.tt AS DOUBLE)
                      + (CAST(s.n AS DOUBLE) - p.lag) * s.s * s.s)
                     / (CAST(s.n AS DOUBLE) * s.n * s.q
                        - CAST(s.n AS DOUBLE) * s.s * s.s))
                 > 1.96 / sqrt(CAST(s.n AS DOUBLE))
       END AS significant
FROM per_lag p JOIN scal s ON s.event_type = p.event_type
"""


def q_parts_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-brand two-feature least squares (stats.py::ols2_fit) —
    retail price regressed on size and name length, the canonical
    ONE-PASS distributed regression: a single map-side-combinable
    groupBy accumulates the 3x3 Gram matrix + moment vector per brand
    and the normal equations solve in closed form (Cramer) as a codegen
    projection.  No iteration (contrast lr_quality's gradient chain), no
    collect, one shuffle.  Exactness: price has one decimal so y =
    round(price*10) makes every sufficient statistic an exact BIGINT —
    the double algebra then agrees bit-for-bit with the oracle.
    Coefficients rescale /10 back to price units; R^2 = 1 - SSE/SST
    falls out of the same scalar row (SSE = Syy - b'X'y)."""
    from mcpvectordb_spark.operators.stats import ols2_fit

    part = load_table(spark, sf_dir, "part")
    obs = part.select(
        "p_brand",
        F.round(F.col("p_retailprice") * 10, 0).cast("long").alias("y10"),
        F.col("p_size").cast("long").alias("x1"),
        F.length("p_name").cast("long").alias("x2"),
    )
    fit = ols2_fit(obs, "p_brand", "y10", "x1", "x2")
    return fit.select(
        "p_brand",
        "n",
        F.round(F.col("b0") / 10, 4).alias("intercept"),
        F.round(F.col("b1") / 10, 4).alias("beta_size"),
        F.round(F.col("b2") / 10, 4).alias("beta_namelen"),
        F.round("r2", 6).alias("r2"),
    )


SQL_PARTS_OLS = """
WITH obs AS (
  SELECT p_brand,
         CAST(round(p_retailprice * 10) AS BIGINT) AS y,
         CAST(p_size AS BIGINT) AS x1,
         CAST(length(p_name) AS BIGINT) AS x2
  FROM part),
g AS (
  SELECT p_brand, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM obs GROUP BY 1),
d AS (
  SELECT p_brand, n, sy, s1y, s2y, syy,
         CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2)
           + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2) AS det,
         CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2y)
           + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2y) AS det0,
         CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2y)
           - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2)
           + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2) AS det1,
         CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2)
           + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2) AS det2
  FROM g)
SELECT p_brand, n,
       CASE WHEN det <> 0 THEN round(det0 / det / 10, 4) END AS intercept,
       CASE WHEN det <> 0 THEN round(det1 / det / 10, 4) END AS beta_size,
       CASE WHEN det <> 0 THEN round(det2 / det / 10, 4) END AS beta_namelen,
       CASE WHEN det <> 0
             AND CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n > 0
            THEN round(1.0 - (CAST(syy AS DOUBLE)
                              - ((det0 / det) * sy + (det1 / det) * s1y
                                 + (det2 / det) * s2y))
                           / (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n), 6)
       END AS r2
FROM d
"""


def q_events_xcorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lead-lag cross-correlation (timeseries.py::xcf) between every
    ordered pair of event types' HOURLY volume series, lags 0..12 —
    answers "does view traffic at hour t predict purchase traffic at
    t+k?", the causal-ordering diagnostic that funnels and attribution
    assume.  Lag 0 is the plain Pearson correlation of the two series.
    All series share one zero-densified global hourly grid; every sum
    is an exact BIGINT aggregate and the mean-centered normalization is
    one double expression over integer scalars (same contract as
    events_acf), so both engines agree bit-for-bit.  Plan: densify
    join, explode(13 lags) + pair equi-join on (t+lag) shuffling only
    (type, t, y) longs, keyed agg per (pair, lag), two broadcast scalar
    joins.  K event types fan out K*(K-1) pairs — series count, not row
    count, bounds the output."""
    from mcpvectordb_spark.operators.timeseries import xcf

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return xcf(hourly, "event_type", "t", "y", max_lag=12).select(
        F.col("key_x").alias("type_lead"),
        F.col("key_y").alias("type_follow"),
        "lag",
        "n",
        "r",
    )


SQL_EVENTS_XCORR = """
WITH hourly AS (
  SELECT event_type AS k,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (SELECT min(t) AS t0, max(t) AS t1 FROM hourly),
grid AS (
  SELECT k, unnest(range(t0, t1 + 1)) AS t
  FROM (SELECT DISTINCT k FROM hourly) CROSS JOIN bounds),
dense AS (
  SELECT g.k, g.t, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.k = g.k AND h.t = g.t),
scal AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
  FROM dense GROUP BY 1),
lags AS (SELECT unnest(range(0, 13)) AS lag),
per_lag AS (
  SELECT l.k AS ka, r.k AS kb, lg.lag,
         CAST(sum(l.y * r.y) AS BIGINT) AS sxy,
         CAST(sum(l.y) AS BIGINT) AS hx,
         CAST(sum(r.y) AS BIGINT) AS ty
  FROM dense l CROSS JOIN lags lg
  JOIN dense r ON r.t = l.t + lg.lag AND r.k <> l.k
  GROUP BY 1, 2, 3)
SELECT p.ka AS type_lead, p.kb AS type_follow, p.lag, sa.n,
       CASE WHEN CAST(sa.n AS DOUBLE) * sa.q - CAST(sa.s AS DOUBLE) * sa.s > 0
             AND CAST(sa.n AS DOUBLE) * sb.q - CAST(sb.s AS DOUBLE) * sb.s > 0
            THEN round(
              (CAST(sa.n AS DOUBLE) * sa.n * p.sxy
               - CAST(sa.n AS DOUBLE) * sa.s * CAST(p.ty AS DOUBLE)
               - CAST(sa.n AS DOUBLE) * sb.s * CAST(p.hx AS DOUBLE)
               + (CAST(sa.n AS DOUBLE) - p.lag) * sa.s * CAST(sb.s AS DOUBLE))
              / (CAST(sa.n AS DOUBLE)
                 * sqrt((CAST(sa.n AS DOUBLE) * sa.q - CAST(sa.s AS DOUBLE) * sa.s)
                        * (CAST(sa.n AS DOUBLE) * sb.q - CAST(sb.s AS DOUBLE) * sb.s))), 6)
       END AS r
FROM per_lag p
JOIN scal sa ON sa.k = p.ka
JOIN scal sb ON sb.k = p.kb
"""


def q_events_catassoc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical association (stats.py::cat_association) between
    event type and hour-of-day: chi-square independence statistic, dof,
    mutual information and Cramer's V from ONE contingency groupBy —
    the screening step before trusting hour-of-day as a feature or
    assuming type-stationary traffic.  Marginals re-aggregate the CELLS
    (|types| x 24), never the raw events, and broadcast back; hour is
    integer arithmetic on epoch seconds (the proven-parity path, same
    as events_acf) so the counts agree exactly and the double per-cell
    terms agree to the 6-dp contract."""
    from mcpvectordb_spark.operators.stats import cat_association

    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600) % 24).cast("long").alias("hod"),
    )
    return cat_association(obs, "event_type", "hod")


SQL_EVENTS_CATASSOC = """
WITH obs AS (
  SELECT event_type AS a,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS b
  FROM events),
cells AS (
  SELECT a, b, CAST(count(*) AS BIGINT) AS nij FROM obs GROUP BY 1, 2),
rmarg AS (SELECT a, CAST(sum(nij) AS BIGINT) AS ri FROM cells GROUP BY 1),
cmarg AS (SELECT b, CAST(sum(nij) AS BIGINT) AS cj FROM cells GROUP BY 1),
tot AS (
  SELECT CAST(sum(nij) AS BIGINT) AS n_total,
         CAST(count(DISTINCT a) AS BIGINT) AS n_rows,
         CAST(count(DISTINCT b) AS BIGINT) AS n_cols
  FROM cells),
terms AS (
  SELECT t.n_total, t.n_rows, t.n_cols,
         (CAST(c.nij AS DOUBLE) - CAST(r.ri AS DOUBLE) * cm.cj / t.n_total)
           * (CAST(c.nij AS DOUBLE) - CAST(r.ri AS DOUBLE) * cm.cj / t.n_total)
           / (CAST(r.ri AS DOUBLE) * cm.cj / t.n_total) AS chi_term,
         CAST(c.nij AS DOUBLE) / t.n_total
           * ln(CAST(t.n_total AS DOUBLE) * c.nij
                / (CAST(r.ri AS DOUBLE) * cm.cj)) AS mi_term
  FROM cells c
  JOIN rmarg r ON r.a = c.a
  JOIN cmarg cm ON cm.b = c.b
  CROSS JOIN tot t),
agg AS (
  SELECT any_value(n_total) AS n,
         any_value(n_rows) AS n_rows,
         any_value(n_cols) AS n_cols,
         (any_value(n_rows) - 1) * (any_value(n_cols) - 1) AS dof,
         round(sum(chi_term), 6) AS chi2,
         round(sum(mi_term), 6) AS mi
  FROM terms)
SELECT n, n_rows, n_cols, dof, chi2, mi,
       CASE WHEN least(n_rows, n_cols) > 1
            THEN round(sqrt(chi2 / (CAST(n AS DOUBLE)
                                    * (CAST(least(n_rows, n_cols) AS DOUBLE) - 1.0))), 6)
       END AS cramers_v
FROM agg
"""


def q_customers_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration audit (stats.py::gini_concentration):
    Gini coefficient + top-1% / top-10% spend shares over per-customer
    lifetime spend — "are 1% of customers half the revenue?".  Spend
    quantizes to exact cents (round(price*100) BIGINT) so every
    statistic is an exact integer; the Gini rank sum never sorts rows —
    customers collapse to VALUE BLOCKS and the tie-invariant block
    formula v*(c*below + c(c+1)/2) runs under a window over the block
    table only (the lr_eval quantized-block pattern).  Top-k shares
    clamp per-block takes from descending cumulative counts — no
    row_number anywhere."""
    from mcpvectordb_spark.operators.stats import gini_concentration

    orders = load_table(spark, sf_dir, "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("long")).alias("cents")
    )
    return gini_concentration(spend, "cents").select(
        F.col("n").alias("n_customers"),
        F.col("total").alias("total_cents"),
        "gini",
        "top1_share",
        "top10_share",
    )


SQL_CUSTOMERS_GINI = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS v
  FROM orders GROUP BY 1),
blocks AS (SELECT v, CAST(count(*) AS BIGINT) AS c FROM spend GROUP BY 1),
b AS (
  SELECT v, c,
         CAST(COALESCE(sum(c) OVER (ORDER BY v ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS below,
         CAST(COALESCE(sum(c) OVER (ORDER BY v DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS above
  FROM blocks),
tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n,
         CAST(sum(v * c) AS BIGINT) AS s,
         CAST(sum(v * (c * below + (c * (c + 1)) // 2)) AS BIGINT) AS t
  FROM b),
tops AS (
  SELECT CAST(sum(v * greatest(0, least(c, greatest(1, n // 100) - above))) AS BIGINT) AS top1,
         CAST(sum(v * greatest(0, least(c, greatest(1, n // 10) - above))) AS BIGINT) AS top10
  FROM b CROSS JOIN tot)
SELECT n AS n_customers, s AS total_cents,
       CASE WHEN s > 0 THEN round((2.0 * t - (CAST(n AS DOUBLE) + 1) * s)
                                  / (CAST(n AS DOUBLE) * s), 6) END AS gini,
       CASE WHEN s > 0 THEN round(CAST(top1 AS DOUBLE) / s, 6) END AS top1_share,
       CASE WHEN s > 0 THEN round(CAST(top10 AS DOUBLE) / s, 6) END AS top10_share
FROM tot CROSS JOIN tops
"""


def q_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact phrase query (operators/phrase.py::phrase_search) over the
    documents corpus: find every document containing the token sequence
    "stream table hash" IN ORDER, with overlapping-occurrence counts
    and the first anchor position — the positional-index capability
    BM25's bag-of-words cannot express (reference retrieval is
    vector+BM25 only, mcpvectordb/store.py:233).  Plan: map-only
    posexplode postings, broadcast join against the 3 phrase offsets,
    one (doc, anchor) agg counting distinct matched offsets — cost
    tracks the phrase terms' df like a conjunctive Boolean query, never
    the corpus token count.  The oracle replays the same positional
    algebra (anchors, not string matching) so overlapping occurrences
    count identically."""
    from mcpvectordb_spark.operators.phrase import phrase_search

    docs = load_table(spark, sf_dir, "documents")
    return (
        phrase_search(docs, "doc_id", "text", "stream table hash")
        .select(F.col("doc").alias("doc_id"), "n_occurrences", "first_pos")
    )


SQL_PHRASE_SEARCH = """
WITH toks AS (
  SELECT doc_id, pos,
         list_extract(string_split(text, ' '), pos) AS token
  FROM documents
  CROSS JOIN (SELECT unnest(range(1, 301)) AS pos) p
  WHERE pos <= len(string_split(text, ' '))),
offs AS (
  SELECT * FROM (VALUES ('stream', 0), ('table', 1), ('hash', 2)) AS v(token, off)),
hits AS (
  SELECT t.doc_id, t.pos - o.off AS anchor, o.off
  FROM toks t JOIN offs o ON o.token = t.token),
anchors AS (
  SELECT doc_id, anchor, count(DISTINCT off) AS nmatch
  FROM hits GROUP BY 1, 2
  HAVING count(DISTINCT off) = 3 AND anchor >= 1)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_occurrences,
       CAST(min(anchor) AS BIGINT) AS first_pos
FROM anchors GROUP BY 1
"""


def q_supplier_bt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bradley-Terry strengths (stats.py::bradley_terry) over suppliers
    from head-to-head outcomes: within each order, the supplier shipping
    the larger total quantity "beats" the other — 111k derived games at
    sf0.01 — and 10 MM iterations (Hunter 2004) fit the latent strength
    that preference/reward aggregation needs (the same estimator used on
    pairwise human-preference data).  The games collapse once to a
    <= K^2 pair table; every iteration is that table joined against the
    K-row strength vector, so corpus size only touches the first two
    aggs.  The oracle unrolls all 10 updates as chained CTEs (the
    LP-rounds / matrix-squaring replay pattern)."""
    from mcpvectordb_spark.operators.stats import bradley_terry

    li = load_table(spark, sf_dir, "lineitem")
    per = li.groupBy("l_orderkey", "l_suppkey").agg(
        F.sum("l_quantity").alias("q")
    )
    a = per.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("sa"), F.col("q").alias("qa")
    )
    b = per.select(
        F.col("l_orderkey").alias("o"), F.col("l_suppkey").alias("sb"), F.col("q").alias("qb")
    )
    games = a.join(b, "o").filter(F.col("qa") > F.col("qb")).select(
        F.col("sa").alias("winner"), F.col("sb").alias("loser")
    )
    # loop_partitions=8: 100 suppliers and a <=10k pair table — the scoped
    # small-table fast path (pagerank contract); the games derivation above
    # still runs at full parallelism
    out = bradley_terry(games, "winner", "loser", iterations=10, loop_partitions=8)
    return out.select(
        F.col("entity").alias("s_suppkey"), "games", "wins", "strength"
    )


def _sql_bt() -> str:
    base = """
WITH li AS (
  SELECT l_orderkey, l_suppkey, sum(l_quantity) AS q
  FROM lineitem GROUP BY 1, 2),
g AS MATERIALIZED (
  SELECT a.l_suppkey AS win, b.l_suppkey AS lose
  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey AND a.q > b.q),
sym AS (
  SELECT win AS i, lose AS j, 1 AS w FROM g
  UNION ALL SELECT lose AS i, win AS j, 0 AS w FROM g),
pairs AS MATERIALIZED (
  SELECT i, j, CAST(count(*) AS BIGINT) AS nij, CAST(sum(w) AS BIGINT) AS wij
  FROM sym GROUP BY 1, 2),
tot AS MATERIALIZED (
  SELECT i, CAST(sum(nij) AS BIGINT) AS games_i, CAST(sum(wij) AS BIGINT) AS wins_i
  FROM pairs GROUP BY 1),
p0 AS (SELECT i, CAST(1.0 AS DOUBLE) AS pi FROM tot)"""
    steps = []
    for t in range(1, 11):
        steps.append(f""",
p{t} AS MATERIALIZED (
  SELECT t.i,
         CASE WHEN t.wins_i > 0 THEN CAST(t.wins_i AS DOUBLE) / d.den
              ELSE 0.0 END AS pi
  FROM tot t JOIN (
    SELECT p.i, sum(CAST(p.nij AS DOUBLE) / (a.pi + b.pi)) AS den
    FROM pairs p
    JOIN p{t-1} a ON a.i = p.i
    JOIN p{t-1} b ON b.i = p.j
    GROUP BY 1) d ON d.i = t.i)""")
    tail = """,
z AS (SELECT sum(pi) AS z FROM p10)
SELECT t.i AS s_suppkey, t.games_i AS games, t.wins_i AS wins,
       round(p.pi / z.z, 6) AS strength
FROM p10 p JOIN tot t ON t.i = p.i CROSS JOIN z"""
    return base + "".join(steps) + tail


SQL_SUPPLIER_BT = _sql_bt()


def q_events_hw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Holt-Winters additive seasonal smoothing (timeseries.py::
    holt_winters_additive) of daily event volume per type, weekly
    period m=7, with a 7-day forecast — the seasonal completion of the
    EWMA -> Holt forecasting ladder (events_ewma_recursive,
    events_holt).  The coupled (level, trend, 7-slot seasonal queue)
    recursion folds O(L) per key; constants 0.5/0.25/0.75 are
    binary-exact and the init (first-week mean on exact integer counts)
    is one double division, so the oracle's recursive CTE — carrying
    the queue as SEVEN explicit columns shifted each step — replays the
    evolution bit-for-bit.  Forecast rows carry n = -1."""
    from mcpvectordb_spark.operators.timeseries import holt_winters_additive

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x"))
    out = holt_winters_additive(
        daily, "k", "t", "x", alpha=0.5, beta=0.25, gamma=0.25, period=7, horizon=7
    )
    return out.select(
        F.col("k").alias("event_type"),
        "t",
        F.coalesce(F.col("x"), F.lit(-1.0)).cast("long").alias("n"),
        F.round("level", 6).alias("level"),
        F.round("trend", 6).alias("trend"),
        F.round("seasonal_used", 6).alias("seasonal_used"),
        F.round("fitted", 6).alias("fitted"),
    )


SQL_EVENTS_HW = """
WITH RECURSIVE daily AS (
  SELECT event_type AS k,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT k, t, x, row_number() OVER (PARTITION BY k ORDER BY t) AS rk
  FROM daily),
initv AS (
  SELECT k,
         max(CASE WHEN rk = 1 THEN x END) AS x1,
         max(CASE WHEN rk = 2 THEN x END) AS x2,
         max(CASE WHEN rk = 3 THEN x END) AS x3,
         max(CASE WHEN rk = 4 THEN x END) AS x4,
         max(CASE WHEN rk = 5 THEN x END) AS x5,
         max(CASE WHEN rk = 6 THEN x END) AS x6,
         max(CASE WHEN rk = 7 THEN x END) AS x7,
         max(CASE WHEN rk = 7 THEN t END) AS t7
  FROM ranked WHERE rk <= 7 GROUP BY 1
  HAVING count(*) = 7),
hw AS (
  SELECT i.k, CAST(7 AS BIGINT) AS rk, i.t7 AS t,
         CAST(NULL AS DOUBLE) AS x,
         (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS l,
         CAST(0.0 AS DOUBLE) AS b,
         i.x1 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s1,
         i.x2 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s2,
         i.x3 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s3,
         i.x4 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s4,
         i.x5 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s5,
         i.x6 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s6,
         i.x7 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s7,
         CAST(NULL AS DOUBLE) AS su,
         CAST(NULL AS DOUBLE) AS f
  FROM initv i
  UNION ALL
  SELECT r.k, r.rk, r.t, r.x,
         0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b) AS l,
         0.25 * ((0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b AS b,
         h.s2 AS s1, h.s3 AS s2, h.s4 AS s3, h.s5 AS s4, h.s6 AS s5, h.s7 AS s6,
         0.25 * (r.x - (0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b))) + 0.75 * h.s1 AS s7,
         h.s1 AS su,
         h.l + h.b + h.s1 AS f
  FROM hw h JOIN ranked r ON r.k = h.k AND r.rk = h.rk + 1),
last AS (SELECT k, max(rk) AS mrk FROM hw GROUP BY 1),
fin AS (
  SELECT h.* FROM hw h JOIN last l ON h.k = l.k AND h.rk = l.mrk
  WHERE l.mrk >= 8),
fut AS (
  SELECT fin.k, fin.t + gs.h AS t, CAST(-1.0 AS DOUBLE) AS x,
         fin.l AS level, fin.b AS trend,
         CASE gs.h WHEN 1 THEN fin.s1 WHEN 2 THEN fin.s2 WHEN 3 THEN fin.s3
                   WHEN 4 THEN fin.s4 WHEN 5 THEN fin.s5 WHEN 6 THEN fin.s6
                   ELSE fin.s7 END AS seasonal_used,
         fin.l + gs.h * fin.b
           + CASE gs.h WHEN 1 THEN fin.s1 WHEN 2 THEN fin.s2 WHEN 3 THEN fin.s3
                       WHEN 4 THEN fin.s4 WHEN 5 THEN fin.s5 WHEN 6 THEN fin.s6
                       ELSE fin.s7 END AS fitted
  FROM fin, (SELECT unnest(range(1, 8)) AS h) gs)
SELECT k AS event_type, t, CAST(x AS BIGINT) AS n,
       round(l, 6) AS level, round(b, 6) AS trend,
       round(su, 6) AS seasonal_used, round(f, 6) AS fitted
FROM hw WHERE rk >= 8
UNION ALL
SELECT k AS event_type, t, CAST(x AS BIGINT) AS n,
       round(level, 6) AS level, round(trend, 6) AS trend,
       round(seasonal_used, 6) AS seasonal_used, round(fitted, 6) AS fitted
FROM fut
"""


def q_events_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial autocorrelation (timeseries.py::pacf) of hourly event
    volume per type, lags 1..24 — the Durbin-Levinson companion to
    events_acf that identifies AR order (PACF cuts off where ACF only
    decays).  The D-L recursion consumes the 6-dp-ROUNDED ACF values —
    already bit-identical across engines by events_acf's integer-sum
    contract — so every left-associated dot product and division
    replays exactly; the oracle carries the phi vector as a LIST column
    through a recursive CTE (list_transform/list_reduce mirroring
    zip_with/aggregate).  The fold is O(K^2) per key with K = 24, a
    constant — corpus scale only enters through the ACF pipeline."""
    from mcpvectordb_spark.operators.timeseries import pacf

    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    return pacf(hourly, "event_type", "t", "y", max_lag=24).select(
        "event_type", "lag", "r", "pacf"
    )


SQL_EVENTS_PACF = """
WITH RECURSIVE hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(t) AS t0, max(t) AS t1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(t0, t1 + 1)) AS t FROM bounds),
dense AS MATERIALIZED (
  SELECT g.event_type, g.t, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.t = g.t),
scal AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS s, CAST(sum(y * y) AS BIGINT) AS q
  FROM dense GROUP BY 1),
lags AS (SELECT unnest(range(1, 25)) AS lag),
per_lag AS (
  SELECT l.event_type, lg.lag,
         CAST(sum(l.y * r.y) AS BIGINT) AS syy,
         CAST(sum(l.y) AS BIGINT) AS h,
         CAST(sum(r.y) AS BIGINT) AS tt
  FROM dense l CROSS JOIN lags lg
  JOIN dense r ON r.event_type = l.event_type AND r.t = l.t + lg.lag
  GROUP BY 1, 2),
acf AS MATERIALIZED (
  SELECT p.event_type AS k, p.lag,
         round((CAST(s.n AS DOUBLE) * s.n * p.syy
                - CAST(s.n AS DOUBLE) * s.s * CAST(p.h + p.tt AS DOUBLE)
                + (CAST(s.n AS DOUBLE) - p.lag) * s.s * s.s)
               / (CAST(s.n AS DOUBLE) * s.n * s.q
                  - CAST(s.n AS DOUBLE) * s.s * s.s), 6) AS rv
  FROM per_lag p JOIN scal s ON s.event_type = p.event_type
  WHERE CAST(s.n AS DOUBLE) * s.n * s.q - CAST(s.n AS DOUBLE) * s.s * s.s > 0),
dl AS (
  SELECT k, 1 AS lag, rv, [rv] AS rs, [rv] AS phi, rv AS pacf
  FROM acf WHERE lag = 1
  UNION ALL
  SELECT a.k, a.lag, a.rv,
         list_append(d.rs, a.rv) AS rs,
         list_append(
           list_transform(range(1, len(d.phi) + 1),
             j -> d.phi[j]
                  - ((a.rv - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                           i -> d.phi[i] * list_reverse(d.rs)[i]),
                                         (x, y) -> x + y))
                     / (1.0 - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                            i -> d.phi[i] * d.rs[i]),
                                          (x, y) -> x + y)))
                    * list_reverse(d.phi)[j]),
           (a.rv - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                 i -> d.phi[i] * list_reverse(d.rs)[i]),
                               (x, y) -> x + y))
           / (1.0 - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                  i -> d.phi[i] * d.rs[i]),
                                (x, y) -> x + y))) AS phi,
         (a.rv - list_reduce(list_transform(range(1, len(d.phi) + 1),
                               i -> d.phi[i] * list_reverse(d.rs)[i]),
                             (x, y) -> x + y))
         / (1.0 - list_reduce(list_transform(range(1, len(d.phi) + 1),
                                i -> d.phi[i] * d.rs[i]),
                              (x, y) -> x + y)) AS pacf
  FROM dl d JOIN acf a ON a.k = d.k AND a.lag = d.lag + 1)
SELECT k AS event_type, CAST(lag AS BIGINT) AS lag, rv AS r,
       round(pacf, 6) AS pacf
FROM dl
"""


def q_near_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proximity retrieval (operators/phrase.py::near_search):
    documents where "stream" and "hash" occur within 4 tokens of each
    other in either order — the NEAR/k middle ground between
    phrase_search's exact adjacency and BM25's bag-of-words.  Postings
    filter to the two terms via a broadcast join, then one per-document
    position-pair join whose fan-out is tf_a*tf_b — df-bounded like a
    conjunctive query.  The oracle replays the identical positional
    algebra."""
    from mcpvectordb_spark.operators.phrase import near_search

    docs = load_table(spark, sf_dir, "documents")
    return near_search(docs, "doc_id", "text", "stream", "hash", window=4).select(
        F.col("doc").alias("doc_id"), "min_dist", "pairs_within"
    )


SQL_NEAR_SEARCH = """
WITH toks AS (
  SELECT doc_id, pos,
         list_extract(string_split(text, ' '), pos) AS token
  FROM documents
  CROSS JOIN (SELECT unnest(range(1, 301)) AS pos) p
  WHERE pos <= len(string_split(text, ' '))),
pa AS (SELECT doc_id, pos AS pa FROM toks WHERE token = 'stream'),
pb AS (SELECT doc_id, pos AS pb FROM toks WHERE token = 'hash'),
pairs AS (
  SELECT pa.doc_id, abs(pa.pa - pb.pb) AS dist
  FROM pa JOIN pb ON pb.doc_id = pa.doc_id)
SELECT doc_id,
       CAST(min(dist) AS BIGINT) AS min_dist,
       CAST(sum(CASE WHEN dist <= 4 THEN 1 ELSE 0 END) AS BIGINT) AS pairs_within
FROM pairs GROUP BY 1
HAVING min(dist) <= 4
"""


def q_parts_conformal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-conformal prediction interval (Vovk; Lei et al.) on the
    parts price model: OLS (stats.py::ols2_fit) trains on the hash-even
    half, absolute residuals on the hash-odd calibration half yield the
    finite-sample 90% radius q_hat = k-th smallest score with
    k = ceil(0.9*(n_cal+1)) — the distribution-free guarantee that
    |y - y_hat| <= q_hat with probability >= 0.9 on exchangeable data.
    The k-th smallest never sorts rows: scores collapse to VALUE BLOCKS
    (identical doubles from identical integer-sum algebra) and k is
    picked off the block cumsum (the customers_gini pattern); k itself
    is exact integer arithmetic (9*(n+1)+9)//10.  Output also reports
    train-half coverage at q_hat as a sanity diagnostic."""
    from mcpvectordb_spark.operators.dedup import hexint48
    from mcpvectordb_spark.operators.stats import ols2_fit

    part = load_table(spark, sf_dir, "part")
    obs = part.select(
        F.round(F.col("p_retailprice") * 10, 0).cast("long").alias("y10"),
        F.col("p_size").cast("long").alias("x1"),
        F.length("p_name").cast("long").alias("x2"),
        F.pmod(hexint48(F.col("p_partkey").cast("string")), F.lit(2)).alias("h"),
    ).localCheckpoint(eager=False)
    train = obs.filter(F.col("h") == 0).withColumn("g", F.lit("g"))
    fit = ols2_fit(train, "g", "y10", "x1", "x2").select("b0", "b1", "b2")
    score = F.abs(
        F.col("y10").cast("double")
        - (
            F.col("b0")
            + F.col("b1") * F.col("x1").cast("double")
            + F.col("b2") * F.col("x2").cast("double")
        )
    )
    cal = obs.filter(F.col("h") == 1).crossJoin(F.broadcast(fit)).select(
        score.alias("s")
    )
    blocks = cal.groupBy("s").agg(F.count(F.lit(1)).alias("c"))
    wq = Window.orderBy("s").rowsBetween(Window.unboundedPreceding, 0)
    ranked = blocks.select("s", F.sum("c").over(wq).alias("cum"))
    ncal = cal.agg(F.count(F.lit(1)).alias("n_cal"))
    qhat = (
        ranked.crossJoin(F.broadcast(ncal))
        .filter(
            F.col("cum")
            >= ((F.lit(9) * (F.col("n_cal") + 1) + 9) / 10).cast("long")
        )
        .agg(F.min("s").alias("qhat"), F.first("n_cal").alias("n_cal"))
    )
    tr_scored = train.crossJoin(F.broadcast(fit)).select(score.alias("s"))
    cov = tr_scored.crossJoin(F.broadcast(qhat)).agg(
        F.count(F.lit(1)).alias("n_train"),
        F.first("n_cal").alias("n_cal"),
        F.round(F.first("qhat") / 10, 4).alias("qhat_price"),
        F.round(
            F.sum(F.when(F.col("s") <= F.col("qhat"), 1).otherwise(0))
            / F.count(F.lit(1)).cast("double"),
            6,
        ).alias("coverage_train"),
    )
    return cov


SQL_PARTS_CONFORMAL = f"""
WITH obs AS (
  SELECT CAST(round(p_retailprice * 10) AS BIGINT) AS y,
         CAST(p_size AS BIGINT) AS x1,
         CAST(length(p_name) AS BIGINT) AS x2,
         {_sql_hex48("CAST(p_partkey AS VARCHAR)")} % 2 AS h
  FROM part),
g AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x1) AS BIGINT) AS s1, CAST(sum(x2) AS BIGINT) AS s2,
         CAST(sum(x1 * x1) AS BIGINT) AS s11,
         CAST(sum(x1 * x2) AS BIGINT) AS s12,
         CAST(sum(x2 * x2) AS BIGINT) AS s22,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x1 * y) AS BIGINT) AS s1y,
         CAST(sum(x2 * y) AS BIGINT) AS s2y
  FROM obs WHERE h = 0),
d AS (
  SELECT CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2)
           + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2) AS det,
         CAST(sy AS DOUBLE) * (CAST(s11 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2y)
           + CAST(s2 AS DOUBLE) * (CAST(s1y AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2y) AS det0,
         CAST(n AS DOUBLE) * (CAST(s1y AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2y)
           - CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s22 - CAST(s12 AS DOUBLE) * s2)
           + CAST(s2 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2) AS det1,
         CAST(n AS DOUBLE) * (CAST(s11 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s12)
           - CAST(s1 AS DOUBLE) * (CAST(s1 AS DOUBLE) * s2y - CAST(s1y AS DOUBLE) * s2)
           + CAST(sy AS DOUBLE) * (CAST(s1 AS DOUBLE) * s12 - CAST(s11 AS DOUBLE) * s2) AS det2
  FROM g),
fit AS (SELECT det0 / det AS b0, det1 / det AS b1, det2 / det AS b2 FROM d),
cal AS (
  SELECT abs(CAST(o.y AS DOUBLE) - (f.b0 + f.b1 * CAST(o.x1 AS DOUBLE)
                                     + f.b2 * CAST(o.x2 AS DOUBLE))) AS s
  FROM obs o CROSS JOIN fit f WHERE o.h = 1),
blocks AS (SELECT s, CAST(count(*) AS BIGINT) AS c FROM cal GROUP BY 1),
ranked AS (
  SELECT s, CAST(sum(c) OVER (ORDER BY s) AS BIGINT) AS cum FROM blocks),
nc AS (SELECT CAST(count(*) AS BIGINT) AS n_cal FROM cal),
qh AS (
  SELECT min(s) AS qhat, any_value(n_cal) AS n_cal
  FROM ranked CROSS JOIN nc
  WHERE cum >= (9 * (n_cal + 1) + 9) // 10),
tr AS (
  SELECT abs(CAST(o.y AS DOUBLE) - (f.b0 + f.b1 * CAST(o.x1 AS DOUBLE)
                                     + f.b2 * CAST(o.x2 AS DOUBLE))) AS s
  FROM obs o CROSS JOIN fit f WHERE o.h = 0)
SELECT CAST(count(*) AS BIGINT) AS n_train,
       any_value(q.n_cal) AS n_cal,
       round(any_value(q.qhat) / 10, 4) AS qhat_price,
       round(CAST(sum(CASE WHEN tr.s <= q.qhat THEN 1 ELSE 0 END) AS DOUBLE)
             / count(*), 6) AS coverage_train
FROM tr CROSS JOIN qh q
"""


def q_vocab_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zipf-law fit of the corpus vocabulary: regress ln(frequency) on
    ln(rank) over the top-1000 terms — the corpus-health diagnostic
    (natural language runs slope ~ -1; synthetic/templated corpora, like
    this one's ~40-word vocabulary, deviate measurably, which is exactly
    what the check is for).  Ranks come from a deterministic
    (freq DESC, term ASC) row_number over the VOCABULARY (bounded by
    distinct terms, never corpus rows); the simple-regression closed
    form runs on one agg of the <=1000 (ln rank, ln freq) points.
    Frequencies are exact integer counts; the ln/sum arithmetic is the
    6-dp double contract (log parity proven by PMI/logloss/AA
    queries)."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        F.explode(F.split(dd.normalize_text(F.col("text")), " ")).alias("term")
    ).filter(F.length("term") > 0)
    freq = toks.groupBy("term").agg(F.count(F.lit(1)).alias("f"))
    w = Window.orderBy(F.col("f").desc(), F.col("term").asc())
    ranked = (
        freq.select("term", "f", F.row_number().over(w).alias("rank"))
        .filter(F.col("rank") <= 1000)
    )
    pts = ranked.select(
        F.log(F.col("rank").cast("double")).alias("x"),
        F.log(F.col("f").cast("double")).alias("y"),
    )
    agg = pts.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    slope = (nd * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        nd * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / nd
    corr_num = nd * F.col("sxy") - F.col("sx") * F.col("sy")
    corr_den = F.sqrt(
        (nd * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (nd * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    tot = toks.agg(F.count(F.lit(1)).alias("total_tokens"))
    return agg.crossJoin(F.broadcast(tot)).select(
        F.col("n").alias("vocab_ranked"),
        "total_tokens",
        F.round(slope, 6).alias("zipf_slope"),
        F.round(intercept, 6).alias("zipf_intercept"),
        F.round(corr_num / corr_den, 6).alias("loglog_corr"),
    )


SQL_VOCAB_ZIPF = f"""
WITH toks AS (
  SELECT unnest({_sql_words("text")}) AS term FROM documents),
toks2 AS (SELECT term FROM toks WHERE length(term) > 0),
freq AS (
  SELECT term, CAST(count(*) AS BIGINT) AS f FROM toks2 GROUP BY 1),
ranked AS (
  SELECT f, row_number() OVER (ORDER BY f DESC, term ASC) AS rank
  FROM freq QUALIFY rank <= 1000),
pts AS (
  SELECT ln(CAST(rank AS DOUBLE)) AS x, ln(CAST(f AS DOUBLE)) AS y FROM ranked),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
  FROM pts),
tot AS (SELECT CAST(count(*) AS BIGINT) AS total_tokens FROM toks2)
SELECT n AS vocab_ranked, total_tokens,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / (CAST(n AS DOUBLE) * sxx - sx * sx), 6) AS zipf_slope,
       round((sy - ((CAST(n AS DOUBLE) * sxy - sx * sy)
                    / (CAST(n AS DOUBLE) * sxx - sx * sx)) * sx)
             / CAST(n AS DOUBLE), 6) AS zipf_intercept,
       round((CAST(n AS DOUBLE) * sxy - sx * sy)
             / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                    * (CAST(n AS DOUBLE) * syy - sy * sy)), 6) AS loglog_corr
FROM agg CROSS JOIN tot
"""


def q_orders_fd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency discovery (dataquality.py::fd_discovery)
    over seven canonical orders attributes (price quantized to exact
    cents, date formatted, plus a derived order-month column) — the
    TANE-lite profiling pass that surfaces keys (o_orderkey -> every
    column) and derived columns (o_orderdate -> order_month) and
    measures how badly every other candidate FD fails (g3-style
    violation counts).  Fan-out is |cols|^2 per row — schema-sized —
    followed by two map-side-combinable aggs; the oracle replays the
    same pair explosion with UNION-free list algebra."""
    from mcpvectordb_spark.operators.dataquality import fd_discovery

    orders = load_table(spark, sf_dir, "orders")
    cols = {
        "orderkey": F.col("o_orderkey"),
        "custkey": F.col("o_custkey"),
        "status": F.col("o_orderstatus"),
        "price_cents": F.round(F.col("o_totalprice") * 100, 0).cast("long"),
        "orderdate": F.date_format("o_orderdate", "yyyy-MM-dd"),
        "priority": F.col("o_orderpriority"),
        "order_month": F.date_format("o_orderdate", "yyyy-MM"),
    }
    return fd_discovery(orders, cols).select(
        "lhs", "rhs", "n_lhs_values", "n_violating_lhs", "extra_rhs_values", "holds"
    )


SQL_ORDERS_FD = """
WITH canon AS (
  SELECT [
    struct_pack(attr := 'orderkey',    val := CAST(o_orderkey AS VARCHAR)),
    struct_pack(attr := 'custkey',     val := CAST(o_custkey AS VARCHAR)),
    struct_pack(attr := 'status',      val := o_orderstatus),
    struct_pack(attr := 'price_cents', val := CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR)),
    struct_pack(attr := 'orderdate',   val := strftime(o_orderdate, '%Y-%m-%d')),
    struct_pack(attr := 'priority',    val := o_orderpriority),
    struct_pack(attr := 'order_month', val := strftime(o_orderdate, '%Y-%m'))
  ] AS vals
  FROM orders),
pairs AS (
  SELECT a.attr AS lhs, a.val AS aval, b.attr AS rhs, b.val AS bval
  FROM canon, unnest(vals) AS ta(a), unnest(vals) AS tb(b)
  WHERE a.attr <> b.attr),
per_lhs AS (
  SELECT lhs, rhs, aval, CAST(count(DISTINCT bval) AS BIGINT) AS nb
  FROM pairs GROUP BY 1, 2, 3)
SELECT lhs, rhs,
       CAST(count(*) AS BIGINT) AS n_lhs_values,
       CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_violating_lhs,
       CAST(sum(nb - 1) AS BIGINT) AS extra_rhs_values,
       max(nb) = 1 AS holds
FROM per_lhs GROUP BY 1, 2
"""


def q_events_quantile_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile normalization (stats.py::quantile_normalize) of event
    values across event types: each type's value distribution maps onto
    the pooled distribution by exact integer rank — the batch-effect
    correction that makes per-source feature scales comparable before
    mixing (values quantized to whole units, ~400 blocks at sf0.1).
    Windows run over VALUE BLOCKS per type and pooled, never rows; the
    target rank (c*N + n_k - 1) div n_k is exact BIGINT arithmetic and
    the pooled lookup is a broadcast inequality join.  Output is the
    per-(type, value) normalization MAP, top 50 most frequent blocks
    per type pinned by deterministic order."""
    from mcpvectordb_spark.operators.stats import quantile_normalize

    ev = load_table(spark, sf_dir, "events")
    obs = ev.select(
        "event_type", F.round("value", 0).cast("long").alias("vu")
    )
    out = quantile_normalize(obs, "event_type", "vu")
    w = Window.partitionBy("event_type").orderBy(
        F.col("n").desc(), F.col("v").asc()
    )
    return (
        out.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 50)
        .select(
            "event_type", "v", "n", "norm", F.col("rk").cast("long").alias("rk")
        )
    )


SQL_EVENTS_QUANTILE_NORM = """
WITH obs AS (
  SELECT event_type AS k, CAST(round(value) AS BIGINT) AS v FROM events),
blocks AS (
  SELECT k, v, CAST(count(*) AS BIGINT) AS c FROM obs GROUP BY 1, 2),
kb AS (
  SELECT k, v, c,
         CAST(sum(c) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cumk
  FROM blocks),
nk AS (SELECT k, CAST(sum(c) AS BIGINT) AS n_k FROM blocks GROUP BY 1),
pooled AS (
  SELECT v AS pv, CAST(count(*) AS BIGINT) AS pc FROM obs GROUP BY 1),
pb AS (
  SELECT pv, CAST(sum(pc) OVER (ORDER BY pv) AS BIGINT) AS cump FROM pooled),
ntot AS (SELECT CAST(sum(pc) AS BIGINT) AS n_tot FROM pooled),
ranked AS (
  SELECT kb.k, kb.v, kb.c,
         (kb.cumk * n_tot + nk.n_k - 1) // nk.n_k AS r
  FROM kb JOIN nk ON nk.k = kb.k CROSS JOIN ntot),
hit AS (
  SELECT r2.k, r2.v, r2.c AS n, min(pb.pv) AS norm
  FROM ranked r2 JOIN pb ON pb.cump >= r2.r
  GROUP BY 1, 2, 3),
ord AS (
  SELECT k AS event_type, v, n, norm,
         row_number() OVER (PARTITION BY k ORDER BY n DESC, v ASC) AS rk
  FROM hit)
SELECT event_type, v, n, norm, CAST(rk AS BIGINT) AS rk
FROM ord WHERE rk <= 50
"""


def q_mix_raking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mix raking (curation.py::ipf_rake): iterative
    proportional fitting of the documents (lang x source) contingency
    toward UNIFORM language and source marginals — the survey-weighting
    answer to "what per-cell sampling factor balances language AND
    source simultaneously?", the 2-marginal upgrade over
    mixture_temperature's single-axis reweighting.  8 IPF rounds run as
    16 chained window scalings over the ~100-cell table in ONE linear
    plan (no per-round joins or checkpoints); targets are exact-count
    divisions N/|langs|, N/|sources|.  The oracle unrolls all 16 window
    steps as chained CTEs."""
    from mcpvectordb_spark.operators.curation import ipf_rake

    docs = load_table(spark, sf_dir, "documents")
    # r9 optimization: cells feeds tot, rt, ct AND the 16-step IPF chain —
    # without the lazy pin each branch re-ran the corpus scan + groupBy
    # (10 scans / 58 exchanges in the before plan).  The ~|langs|·|sources|
    # contingency is exactly the table a raking pass materializes first.
    cells = (
        docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)
    )
    tot = cells.agg(
        F.sum("n").alias("nn"),
        F.countDistinct("lang").alias("nl"),
        F.countDistinct("source").alias("ns"),
    )
    rt = (
        cells.select("lang").distinct().crossJoin(F.broadcast(tot))
        .select("lang", (F.col("nn") / F.col("nl")).alias("t"))
    )
    ct = (
        cells.select("source").distinct().crossJoin(F.broadcast(tot))
        .select("source", (F.col("nn") / F.col("ns")).alias("t"))
    )
    out = ipf_rake(cells, "lang", "source", "n", rt, ct, iterations=8)
    return out.select(
        "lang",
        "source",
        "n",
        F.round("weight", 6).alias("weight"),
        F.round("factor", 6).alias("factor"),
    )


def _sql_mix_raking() -> str:
    base = """
WITH cells AS (
  SELECT lang, source, CAST(count(*) AS BIGINT) AS n
  FROM documents GROUP BY 1, 2),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS nn,
         CAST(count(DISTINCT lang) AS BIGINT) AS nl,
         CAST(count(DISTINCT source) AS BIGINT) AS ns
  FROM cells),
w0 AS (
  SELECT c.lang, c.source, c.n,
         CAST(c.n AS DOUBLE) AS w,
         CAST(t.nn AS DOUBLE) / t.nl AS tr,
         CAST(t.nn AS DOUBLE) / t.ns AS tc
  FROM cells c CROSS JOIN tot t)"""
    steps = []
    k = 0
    for _ in range(8):
        steps.append(f""",
w{k + 1} AS (
  SELECT lang, source, n, tr, tc,
         w * tr / sum(w) OVER (PARTITION BY lang) AS w
  FROM w{k})""")
        steps.append(f""",
w{k + 2} AS (
  SELECT lang, source, n, tr, tc,
         w * tc / sum(w) OVER (PARTITION BY source) AS w
  FROM w{k + 1})""")
        k += 2
    tail = f"""
SELECT lang, source, n, round(w, 6) AS weight,
       round(w / CAST(n AS DOUBLE), 6) AS factor
FROM w{k}"""
    return base + "".join(steps) + tail


SQL_MIX_RAKING = _sql_mix_raking()


def q_events_dispersion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Traffic burstiness audit per event type: Fano factor
    (variance-to-mean ratio of hourly counts — 1 under a Poisson
    process), squared coefficient of variation, and the z-scored
    dispersion test (Fisher's (n-1)*F ~ chi2_{n-1}, normal-approximated
    via sqrt(2*chi2) - sqrt(2*dof - 1)) — the diagnostic that separates
    Poisson-like traffic from bursty/clumped arrivals before trusting
    rate-based alerts.  Hourly counts densify to zero on the per-type
    grid and every moment is an exact BIGINT sum (the events_acf
    contract); the chi2 normal approximation is one sqrt expression
    over those scalars."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    bounds = hourly.groupBy("event_type").agg(
        F.min("t").alias("t0"), F.max("t").alias("t1")
    )
    grid = bounds.select(
        "event_type", F.explode(F.sequence("t0", "t1")).alias("t")
    )
    dense = grid.join(hourly, ["event_type", "t"], "left").select(
        "event_type", F.coalesce("y", F.lit(0)).alias("y")
    )
    s = dense.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    nd = F.col("n").cast("double")
    syd = F.col("sy").cast("double")
    syyd = F.col("syy").cast("double")
    mean = syd / nd
    var = (nd * syyd - syd * syd) / (nd * (nd - 1))
    fano = var / mean
    chi2 = (nd - 1) * fano
    zdisp = F.sqrt(F.lit(2.0) * chi2) - F.sqrt(F.lit(2.0) * (nd - 1) - 1)
    return s.select(
        "event_type",
        "n",
        F.col("sy").alias("total"),
        F.round(mean, 6).alias("mean_per_hour"),
        F.round(fano, 6).alias("fano"),
        F.round(var / (mean * mean), 6).alias("cv2"),
        F.round(zdisp, 6).alias("z_dispersion"),
        (zdisp > 1.6449).alias("overdispersed"),
    )


SQL_EVENTS_DISPERSION = """
WITH hourly AS (
  SELECT event_type,
         CAST(floor(epoch(ts) / 3600) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS y
  FROM events GROUP BY 1, 2),
bounds AS (
  SELECT event_type, min(t) AS t0, max(t) AS t1 FROM hourly GROUP BY 1),
grid AS (
  SELECT event_type, unnest(range(t0, t1 + 1)) AS t FROM bounds),
dense AS (
  SELECT g.event_type, COALESCE(h.y, 0) AS y
  FROM grid g LEFT JOIN hourly h ON h.event_type = g.event_type AND h.t = g.t),
s AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(y * y) AS BIGINT) AS syy
  FROM dense GROUP BY 1)
SELECT event_type, n, sy AS total,
       round(CAST(sy AS DOUBLE) / n, 6) AS mean_per_hour,
       round(((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
             / (CAST(sy AS DOUBLE) / n), 6) AS fano,
       round(((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
              / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
             / ((CAST(sy AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n)), 6) AS cv2,
       round(sqrt(2.0 * ((CAST(n AS DOUBLE) - 1)
                         * (((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                             / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                            / (CAST(sy AS DOUBLE) / n))))
             - sqrt(2.0 * (CAST(n AS DOUBLE) - 1) - 1), 6) AS z_dispersion,
       (sqrt(2.0 * ((CAST(n AS DOUBLE) - 1)
                    * (((CAST(n AS DOUBLE) * syy - CAST(sy AS DOUBLE) * sy)
                        / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1)))
                       / (CAST(sy AS DOUBLE) / n))))
        - sqrt(2.0 * (CAST(n AS DOUBLE) - 1) - 1)) > 1.6449 AS overdispersed
FROM s
"""


def q_events_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald's sequential probability ratio test over the live event
    stream: is the error-event share elevated (H1: p = 0.3) or at
    baseline (H0: p = 0.2)?  alpha = beta = 0.05, so the log-likelihood
    walk S_n = k_n ln(p1/p0) + (n - k_n) ln((1-p1)/(1-p0)) stops at the
    FIRST crossing of +/- ln(19) — the early-stopping monitor that
    answers with ~half the samples a fixed-horizon test needs.  k_n is
    an exact integer cumulative count (one ordered window), S_n is two
    constants times integers, and the stop index is a min over crossing
    rows.  Scale note: a sequential test is inherently ordered — at
    100 TB you process ts-bucketed chunks only UNTIL the decision, which
    is exactly the point of SPRT; the window here runs over the ordered
    event stream once.  Output: one decision row (+ the walk's final
    state for the no-decision case)."""
    ev = load_table(spark, sf_dir, "events")
    c1 = F.log(F.lit(0.3) / F.lit(0.2))
    c0 = F.log(F.lit(0.7) / F.lit(0.8))
    a_bound = F.log(F.lit(19.0))
    w = Window.orderBy("ts", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    walk = ev.select(
        "ts",
        "event_id",
        F.when(F.col("event_type") == "error", 1).otherwise(0).alias("x"),
    ).select(
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("k"),
    ).select(
        "n",
        "k",
        (F.col("k") * c1 + (F.col("n") - F.col("k")) * c0).alias("s"),
    )
    crossed = walk.filter(
        (F.col("s") >= a_bound) | (F.col("s") <= -a_bound)
    ).agg(F.min("n").alias("n_dec"))
    dec = walk.crossJoin(F.broadcast(crossed)).filter(
        F.col("n") == F.col("n_dec")
    )
    tot = walk.agg(F.max("n").alias("n_total"))
    return dec.crossJoin(F.broadcast(tot)).select(
        F.when(F.col("s") >= a_bound, F.lit("elevated"))
        .otherwise(F.lit("baseline"))
        .alias("decision"),
        F.col("n").alias("n_at_decision"),
        F.col("k").alias("k_errors"),
        F.round("s", 6).alias("llr"),
        "n_total",
        F.round(F.lit(1.0) - F.col("n") / F.col("n_total").cast("double"), 6).alias(
            "frac_saved"
        ),
    )


SQL_EVENTS_SPRT = """
WITH walk AS (
  SELECT count(*) OVER w AS n,
         sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) OVER w AS k
  FROM events
  WINDOW w AS (ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
scored AS (
  SELECT CAST(n AS BIGINT) AS n, CAST(k AS BIGINT) AS k,
         k * ln(0.3 / 0.2) + (n - k) * ln(0.7 / 0.8) AS s
  FROM walk),
crossed AS (
  SELECT min(n) AS n_dec FROM scored
  WHERE s >= ln(19.0) OR s <= -ln(19.0)),
tot AS (SELECT max(n) AS n_total FROM scored)
SELECT CASE WHEN sc.s >= ln(19.0) THEN 'elevated' ELSE 'baseline' END AS decision,
       sc.n AS n_at_decision, sc.k AS k_errors,
       round(sc.s, 6) AS llr,
       t.n_total,
       round(1.0 - CAST(sc.n AS DOUBLE) / t.n_total, 6) AS frac_saved
FROM scored sc CROSS JOIN crossed c CROSS JOIN tot t
WHERE sc.n = c.n_dec
"""


def q_events_ddsketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DDSketch relative-error quantiles (sketches.py::dd_sketch /
    dd_quantile, Masson et al. VLDB'19): per-type p50/p90/p99 of event
    value from log-bucket counts (gamma = 1.02 -> <= 0.99% relative
    error BY THEOREM, unlike the equi-width histogram's absolute bin
    error in events_quantile_sketch).  The sketch is one map-side-
    combinable (type, bucket) count table — mergeable like HLL/CMS; the
    accuracy gate is IN-PLAN: the exact discrete quantile comes from
    value blocks (the customers_gini rank trick) and the emitted
    within_bound boolean compares |est-exact|/exact to the guarantee, so
    estimator drift fails the hash gate in both engines."""
    from mcpvectordb_spark.operators.sketches import dd_quantile, dd_sketch

    ev = load_table(spark, sf_dir, "events")
    pos = ev.select("event_type", "value").filter(F.col("value") > 0)
    sk = dd_sketch(pos, "event_type", "value", gamma=1.02)
    est = dd_quantile(sk, [0.5, 0.9, 0.99], gamma=1.02)
    blocks = pos.groupBy(
        F.col("event_type").alias("k2"), F.col("value").alias("v")
    ).agg(F.count(F.lit(1)).alias("c"))
    wv = Window.partitionBy("k2").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = blocks.select("k2", "v", F.sum("c").over(wv).alias("cumv"))
    exact = est.select(
        "k",
        "q",
        "n",
        "bucket",
        "est",
        ((F.round(F.col("q") * 10000).cast("long") * F.col("n") + 9999) / 10000)
        .cast("long")
        .alias("r"),
    )
    hit = (
        exact.join(cum, exact["k"] == cum["k2"])
        .filter(F.col("cumv") >= F.col("r"))
        .groupBy("k", "q", "n", "bucket", "est")
        .agg(F.min("v").alias("exact"))
    )
    tol = (1.02 - 1.0) / (1.02 + 1.0)
    return hit.select(
        F.col("k").alias("event_type"),
        "q",
        "n",
        "bucket",
        F.round("est", 6).alias("est"),
        F.round("exact", 6).alias("exact"),
        (
            F.abs(F.col("est") - F.col("exact")) / F.col("exact") <= F.lit(tol)
        ).alias("within_bound"),
    )


SQL_EVENTS_DDSKETCH = """
WITH pos AS (
  SELECT event_type AS k, value AS v FROM events WHERE value > 0),
sk AS (
  SELECT k, CAST(ceil(ln(v) / 0.01980262729617973) AS BIGINT) AS bucket,
         CAST(count(*) AS BIGINT) AS c
  FROM pos GROUP BY 1, 2),
cumb AS (
  SELECT k, bucket,
         CAST(sum(c) OVER (PARTITION BY k ORDER BY bucket) AS BIGINT) AS cum
  FROM sk),
tot AS (SELECT k, CAST(sum(c) AS BIGINT) AS n FROM sk GROUP BY 1),
qs AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.9 AS DOUBLE), CAST(0.99 AS DOUBLE)]) AS q),
ranks AS (
  SELECT t.k, qs.q, t.n,
         (CAST(round(qs.q * 10000) AS BIGINT) * t.n + 9999) // 10000 AS r
  FROM tot t CROSS JOIN qs),
hitb AS (
  SELECT rk.k, rk.q, rk.n, rk.r, min(cb.bucket) AS bucket
  FROM ranks rk JOIN cumb cb ON cb.k = rk.k AND cb.cum >= rk.r
  GROUP BY 1, 2, 3, 4),
blocks AS (
  SELECT k, v, CAST(count(*) AS BIGINT) AS c FROM pos GROUP BY 1, 2),
cumv AS (
  SELECT k, v,
         CAST(sum(c) OVER (PARTITION BY k ORDER BY v) AS BIGINT) AS cum
  FROM blocks),
ex AS (
  SELECT h.k, h.q, h.n, h.bucket,
         2.0 * power(1.02, CAST(h.bucket AS DOUBLE)) / 2.02 AS est,
         min(cv.v) AS exact
  FROM hitb h JOIN cumv cv ON cv.k = h.k AND cv.cum >= h.r
  GROUP BY 1, 2, 3, 4, 5)
SELECT k AS event_type, q, n, bucket,
       round(est, 6) AS est, round(exact, 6) AS exact,
       abs(est - exact) / exact <= 0.00990099009900991 AS within_bound
FROM ex
"""


def q_events_mase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecast-skill evaluation: MASE (mean absolute scaled error,
    Hyndman & Koehler 2006 — the M-competition standard) of the
    Holt-Winters one-step forecasts against the SEASONAL-NAIVE
    benchmark x_hat_t = x_{t-7}, per event type.  MASE < 1 means the
    model beats the naive seasonal repeat, the bar every forecaster
    must clear; both error sums run over the same post-first-season
    rows.  The naive lag is exact integer arithmetic; the model errors
    reuse the bit-exact HW fold, so the oracle (HW recursion + lag
    window + one agg) hash-matches."""
    from mcpvectordb_spark.operators.timeseries import holt_winters_additive

    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("event_type").alias("k"),
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
        .cast("long")
        .alias("t"),
    ).agg(F.count(F.lit(1)).cast("long").alias("x")).localCheckpoint(
        eager=False
    )
    hw = holt_winters_additive(
        daily, "k", "t", "x", alpha=0.5, beta=0.25, gamma=0.25, period=7
    )
    wlag = Window.partitionBy("k").orderBy("t")
    naive = daily.select(
        "k", "t", F.lag("x", 7).over(wlag).alias("xn")
    ).filter(F.col("xn").isNotNull())
    j = hw.join(naive, ["k", "t"]).select(
        "k",
        F.abs(F.col("x") - F.col("fitted")).alias("e_model"),
        F.abs(F.col("x") - F.col("xn").cast("double")).alias("e_naive"),
    )
    return (
        j.groupBy(F.col("k").alias("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_eval"),
            F.round(F.avg("e_model"), 6).alias("mae_model"),
            F.round(F.avg("e_naive"), 6).alias("mae_naive"),
            F.round(F.sum("e_model") / F.sum("e_naive"), 6).alias("mase"),
            (F.sum("e_model") < F.sum("e_naive")).alias("beats_naive"),
        )
    )


SQL_EVENTS_MASE = """
WITH RECURSIVE daily AS (
  SELECT event_type AS k,
         CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT) AS t,
         CAST(count(*) AS DOUBLE) AS x
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT k, t, x, row_number() OVER (PARTITION BY k ORDER BY t) AS rk
  FROM daily),
initv AS (
  SELECT k,
         max(CASE WHEN rk = 1 THEN x END) AS x1,
         max(CASE WHEN rk = 2 THEN x END) AS x2,
         max(CASE WHEN rk = 3 THEN x END) AS x3,
         max(CASE WHEN rk = 4 THEN x END) AS x4,
         max(CASE WHEN rk = 5 THEN x END) AS x5,
         max(CASE WHEN rk = 6 THEN x END) AS x6,
         max(CASE WHEN rk = 7 THEN x END) AS x7
  FROM ranked WHERE rk <= 7 GROUP BY 1
  HAVING count(*) = 7),
hw AS (
  SELECT i.k, CAST(7 AS BIGINT) AS rk,
         (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS l,
         CAST(0.0 AS DOUBLE) AS b,
         i.x1 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s1,
         i.x2 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s2,
         i.x3 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s3,
         i.x4 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s4,
         i.x5 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s5,
         i.x6 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s6,
         i.x7 - (i.x1 + i.x2 + i.x3 + i.x4 + i.x5 + i.x6 + i.x7) / 7.0 AS s7,
         CAST(NULL AS DOUBLE) AS x, CAST(NULL AS BIGINT) AS t,
         CAST(NULL AS DOUBLE) AS f
  FROM initv i
  UNION ALL
  SELECT r.k, r.rk,
         0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b) AS l,
         0.25 * ((0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b)) - h.l) + 0.75 * h.b AS b,
         h.s2, h.s3, h.s4, h.s5, h.s6, h.s7,
         0.25 * (r.x - (0.5 * (r.x - h.s1) + 0.5 * (h.l + h.b))) + 0.75 * h.s1 AS s7,
         r.x, r.t,
         h.l + h.b + h.s1 AS f
  FROM hw h JOIN ranked r ON r.k = h.k AND r.rk = h.rk + 1),
naive AS (
  SELECT k, t, x,
         lag(x, 7) OVER (PARTITION BY k ORDER BY t) AS xn
  FROM daily QUALIFY xn IS NOT NULL),
j AS (
  SELECT h.k, abs(h.x - h.f) AS e_model, abs(n.x - n.xn) AS e_naive
  FROM hw h JOIN naive n ON n.k = h.k AND n.t = h.t
  WHERE h.rk >= 8)
SELECT k AS event_type,
       CAST(count(*) AS BIGINT) AS n_eval,
       round(avg(e_model), 6) AS mae_model,
       round(avg(e_naive), 6) AS mae_naive,
       round(sum(e_model) / sum(e_naive), 6) AS mase,
       sum(e_model) < sum(e_naive) AS beats_naive
FROM j GROUP BY 1
"""


def q_events_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval (the large-scale bootstrap:
    per-replica weights drawn as Poisson(1), so each replica is one
    weighted aggregation and the corpus is scanned ONCE for all B
    replicas — no per-replica resampling pass) for the A/B uplift in
    mean per-user purchase revenue.  Weights are the inverse-CDF of
    Poisson(1) at u = portable-hash/2^48 per (user, replica), so the
    oracle replays every draw exactly; B = 100 replicas explode from a
    sequence, the uplift distribution is 100 rows, and the CI is its
    exact [2.5, 97.5] percentile band.  Output: point uplift, CI bounds,
    and the replica-distribution spread."""
    from mcpvectordb_spark.operators.dedup import hexint48
    from mcpvectordb_spark.operators.stats import ab_assign, poisson1_weight

    n_reps = 100
    ev = load_table(spark, sf_dir, "events")
    users = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("rev"))
        .select(
            "user_id", "rev", ab_assign(F.col("user_id")).alias("variant")
        )
    )
    point = users.groupBy().agg(
        (
            F.avg(F.when(F.col("variant") == 1, F.col("rev")))
            - F.avg(F.when(F.col("variant") == 0, F.col("rev")))
        ).alias("uplift")
    )
    u = hexint48(
        F.concat(F.lit("boot:"), F.col("user_id").cast("string"), F.lit(":"), F.col("rep").cast("string"))
    ) / F.lit(281474976710656.0)
    w = poisson1_weight(u)
    reps = (
        users.select(
            "user_id", "rev", "variant",
            F.explode(F.sequence(F.lit(0), F.lit(n_reps - 1))).alias("rep"),
        )
        .withColumn("w", w)
        .groupBy("rep")
        .agg(
            (
                F.sum(F.when(F.col("variant") == 1, F.col("w") * F.col("rev")).otherwise(0.0))
                / F.sum(F.when(F.col("variant") == 1, F.col("w")).otherwise(0.0))
                - F.sum(F.when(F.col("variant") == 0, F.col("w") * F.col("rev")).otherwise(0.0))
                / F.sum(F.when(F.col("variant") == 0, F.col("w")).otherwise(0.0))
            ).alias("uplift_r")
        )
    )
    ci = reps.agg(
        F.percentile("uplift_r", F.lit(0.025)).alias("lo"),
        F.percentile("uplift_r", F.lit(0.975)).alias("hi"),
        F.stddev_pop("uplift_r").alias("spread"),
        F.count(F.lit(1)).cast("long").alias("n_reps"),
    )
    return point.crossJoin(F.broadcast(ci)).select(
        F.round("uplift", 6).alias("uplift"),
        F.round("lo", 6).alias("ci_lo"),
        F.round("hi", 6).alias("ci_hi"),
        F.round("spread", 6).alias("spread"),
        "n_reps",
    )


SQL_EVENTS_BOOTSTRAP = f"""
WITH users AS (
  SELECT user_id, sum(value) AS rev,
         ({_sql_hex48("'ab:' || CAST(user_id AS VARCHAR)")}) % 2 AS variant
  FROM events WHERE event_type = 'purchase' GROUP BY user_id),
point AS (
  SELECT avg(CASE WHEN variant = 1 THEN rev END)
           - avg(CASE WHEN variant = 0 THEN rev END) AS uplift
  FROM users),
reps AS (
  SELECT u.user_id, u.rev, u.variant, gs.rep,
         ({_sql_hex48("'boot:' || CAST(u.user_id AS VARCHAR) || ':' || CAST(gs.rep AS VARCHAR)")})
           / 281474976710656.0 AS uu
  FROM users u, (SELECT unnest(range(0, 100)) AS rep) gs),
weighted AS (
  SELECT rep, variant, rev,
         CASE WHEN uu < 0.36787944117144233 THEN 0
              WHEN uu < 0.7357588823428846 THEN 1
              WHEN uu < 0.9196986029286058 THEN 2
              WHEN uu < 0.9810118431238462 THEN 3
              WHEN uu < 0.9963401531726563 THEN 4
              ELSE 5 END AS w
  FROM reps),
per_rep AS (
  SELECT rep,
         sum(CASE WHEN variant = 1 THEN w * rev ELSE 0.0 END)
           / sum(CASE WHEN variant = 1 THEN w ELSE 0.0 END)
           - sum(CASE WHEN variant = 0 THEN w * rev ELSE 0.0 END)
           / sum(CASE WHEN variant = 0 THEN w ELSE 0.0 END) AS uplift_r
  FROM weighted GROUP BY rep),
ci AS (
  SELECT quantile_cont(uplift_r, 0.025) AS lo,
         quantile_cont(uplift_r, 0.975) AS hi,
         stddev_pop(uplift_r) AS spread,
         CAST(count(*) AS BIGINT) AS n_reps
  FROM per_rep)
SELECT round(p.uplift, 6) AS uplift, round(c.lo, 6) AS ci_lo,
       round(c.hi, 6) AS ci_hi, round(c.spread, 6) AS spread, c.n_reps
FROM point p, ci c
"""


def q_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for retrieval training (the DPR / contrastive
    fine-tuning recipe: negatives that the CURRENT ranker scores highly
    but that are not relevant are worth far more than random negatives):
    top-10 BM25 per eval query, relevance judged as all-terms-containment
    (the search_eval judge), the top-3 non-relevant survivors per query
    emitted as (query, doc, neg_rank).  One posting build feeds scorer
    and judge; at 100 TB negatives mine per query-shard with the same
    broadcast (qid, term) table.  The oracle replays scoring, judging
    and the negative re-ranking."""
    from mcpvectordb_spark.operators.bm25 import bm25_multi_topk

    docs = load_table(spark, sf_dir, "documents")
    idx = _shared_bm25_index(spark, sf_dir)
    ranked = bm25_multi_topk(docs, _EVAL_QUERIES, 10, "doc_id", "text", index=idx)
    rows = []
    for qid, q in sorted(_EVAL_QUERIES.items()):
        for t in sorted({t for t in q.lower().split() if t}):
            rows.append((qid, t))
    qterms = spark.createDataFrame(rows, "qid int, term string")
    nt = qterms.groupBy("qid").agg(F.count(F.lit(1)).alias("nt"))
    # r9 note: m feeds two branches, but it derives from the session-pinned
    # posting via a broadcast join — a measured A/B showed a pin here costs
    # ~10% (materialization job > recompute-from-pinned), so no pin.
    m = (
        idx.posting.join(F.broadcast(qterms), "term")
        .groupBy("qid", "doc")
        .agg(F.countDistinct("term").alias("mm"))
    )
    rel = m.join(F.broadcast(nt), "qid").filter(F.col("mm") == F.col("nt")).select(
        "qid", "doc"
    )
    negs = ranked.join(rel, ["qid", "doc"], "left_anti").withColumn(
        "neg_rank",
        F.row_number().over(
            # 6dp-rounded key, same as bm25_multi_topk's rank window
            Window.partitionBy("qid").orderBy(
                F.round(F.col("score"), 6).desc(), F.col("doc").asc()
            )
        ),
    ).filter(F.col("neg_rank") <= 3)
    return negs.join(m, ["qid", "doc"], "left").select(
        "qid",
        "doc",
        F.col("rank").cast("long").alias("rank"),
        F.col("neg_rank").cast("long").alias("neg_rank"),
        F.round("score", 6).alias("score"),
        F.coalesce(F.col("mm"), F.lit(0)).cast("long").alias("n_matched"),
    )


def _sql_hard_negatives() -> str:
    qvals = ", ".join(
        f"({qid}, '{t}')"
        for qid, q in sorted(_EVAL_QUERIES.items())
        for t in sorted({t for t in q.lower().split() if t})
    )
    return rf"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS term
  FROM documents),
posting AS (SELECT doc, term, count(*) AS tf FROM toks GROUP BY 1, 2),
lens AS (
  SELECT doc_id AS doc,
         CAST(len(list_filter(regexp_split_to_array(lower(trim(text)), '\s+'), t -> t <> '')) AS BIGINT) AS dl
  FROM documents),
dfreq AS (SELECT term, count(*) AS df FROM posting GROUP BY 1),
stats AS (SELECT (SELECT count(*) FROM documents) AS n, (SELECT avg(dl) FROM lens) AS avgdl),
qterms AS (SELECT * FROM (VALUES {qvals}) AS t(qid, term)),
bm AS (
  SELECT qid, doc, sum( ln(1 + (n - df + 0.5)/(df + 0.5))
                        * tf*(1.2+1)/(tf + 1.2*(1-0.75+0.75*dl/avgdl)) ) AS score
  FROM posting JOIN qterms USING(term) JOIN dfreq USING(term) JOIN lens USING(doc), stats
  GROUP BY qid, doc),
ranked AS (
  SELECT qid, doc, score,
         row_number() OVER (PARTITION BY qid ORDER BY round(score, 6) DESC, doc) AS rank
  FROM bm QUALIFY rank <= 10),
nt AS (SELECT qid, count(*) AS n_terms FROM qterms GROUP BY qid),
m AS (SELECT qid, doc, count(DISTINCT term) AS mm FROM posting JOIN qterms USING(term) GROUP BY 1, 2),
rel AS (SELECT m.qid, m.doc FROM m JOIN nt USING(qid) WHERE m.mm = nt.n_terms),
negs AS (
  SELECT r.qid, r.doc, r.rank, r.score,
         row_number() OVER (PARTITION BY r.qid ORDER BY round(r.score, 6) DESC, r.doc ASC) AS neg_rank
  FROM ranked r LEFT JOIN rel ON r.qid = rel.qid AND r.doc = rel.doc
  WHERE rel.doc IS NULL
  QUALIFY neg_rank <= 3)
SELECT n.qid, n.doc, CAST(n.rank AS BIGINT) AS rank,
       CAST(n.neg_rank AS BIGINT) AS neg_rank, round(n.score, 6) AS score,
       CAST(coalesce(m.mm, 0) AS BIGINT) AS n_matched
FROM negs n LEFT JOIN m ON n.qid = m.qid AND n.doc = m.doc
"""


SQL_HARD_NEGATIVES = _sql_hard_negatives()


def q_events_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population stability index — the standard ML-monitoring drift
    score — of the per-type event-value distribution between the first
    and second half of the stream: reference deciles from the exact
    first-half percentiles, PSI = Σ (p_i − q_i)·ln(p_i/q_i) with the
    usual 1e-6 floor on empty cells.  Two keyed aggregations (decile
    edges, then binned counts via one broadcast range join); at 100 TB
    the exact percentiles swap for the mergeable histogram sketch, as
    with MAD/WOE.  Output per type: PSI and the drifted-cell count
    (|p−q| contribution > 0.01)."""
    ev = load_table(spark, sf_dir, "events")
    mid = ev.agg(
        F.timestamp_seconds(
            ((F.unix_timestamp(F.min("ts")) + F.unix_timestamp(F.max("ts"))) / 2).cast("long")
        ).alias("m")
    )
    lab = ev.crossJoin(F.broadcast(mid)).select(
        "event_type", "value", (F.col("ts") >= F.col("m")).cast("int").alias("half")
    )
    edges = (
        lab.filter(F.col("half") == 0)
        .groupBy(F.col("event_type").alias("et"))
        .agg(*[
            F.percentile("value", F.lit(i / 10.0)).alias(f"e{i}") for i in range(1, 10)
        ])
    )
    binned = lab.join(F.broadcast(edges), F.col("event_type") == F.col("et")).select(
        "event_type", "half",
        sum(
            (F.col("value") >= F.col(f"e{i}")).cast("int") for i in range(1, 10)
        ).alias("bin"),
    )
    counts = binned.groupBy("event_type", "bin").agg(
        F.sum(F.when(F.col("half") == 0, 1).otherwise(0)).alias("na"),
        F.sum(F.when(F.col("half") == 1, 1).otherwise(0)).alias("nb"),
    )
    tot = counts.groupBy(F.col("event_type").alias("et2")).agg(
        F.sum("na").alias("ta"), F.sum("nb").alias("tb")
    )
    pq = counts.join(F.broadcast(tot), F.col("event_type") == F.col("et2")).select(
        "event_type",
        F.greatest(F.col("na") / F.col("ta"), F.lit(1e-6)).alias("p"),
        F.greatest(F.col("nb") / F.col("tb"), F.lit(1e-6)).alias("q"),
    )
    # ranked-cut + exact-readout discipline (r8 ADVICE #2): ln() is libm,
    # so each (p−q)·ln(p/q) contribution is quantized ONCE to integer
    # nano-units — the drifted-bin threshold becomes an exact integer
    # compare (qc > 1e7 ≡ contribution > 0.01) and the psi sum runs in
    # BIGINT, making the 6dp readout bit-guaranteed on any summation
    # order instead of probabilistically stable.
    qc = F.round(
        (F.col("p") - F.col("q")) * F.log(F.col("p") / F.col("q")) * F.lit(1e9)
    ).cast("long")
    return (
        pq.groupBy("event_type")
        .agg(
            F.round(F.sum(qc) / F.lit(1e9), 6).alias("psi"),
            F.sum((qc > 10_000_000).cast("int")).cast("long").alias("n_drifted_bins"),
        )
        .orderBy("event_type")
    )


SQL_EVENTS_PSI = """
WITH mid AS (
  SELECT to_timestamp(CAST((epoch(min(ts)) + epoch(max(ts))) / 2 AS BIGINT)) AS m
  FROM events),
lab AS (
  SELECT event_type, value, CAST(ts >= m AS INT) AS half FROM events, mid),
edges AS (
  SELECT event_type AS et,
         quantile_cont(value, 0.1) AS e1, quantile_cont(value, 0.2) AS e2,
         quantile_cont(value, 0.3) AS e3, quantile_cont(value, 0.4) AS e4,
         quantile_cont(value, 0.5) AS e5, quantile_cont(value, 0.6) AS e6,
         quantile_cont(value, 0.7) AS e7, quantile_cont(value, 0.8) AS e8,
         quantile_cont(value, 0.9) AS e9
  FROM lab WHERE half = 0 GROUP BY 1),
binned AS (
  SELECT event_type, half,
         CAST(value >= e1 AS INT) + CAST(value >= e2 AS INT) + CAST(value >= e3 AS INT)
         + CAST(value >= e4 AS INT) + CAST(value >= e5 AS INT) + CAST(value >= e6 AS INT)
         + CAST(value >= e7 AS INT) + CAST(value >= e8 AS INT) + CAST(value >= e9 AS INT) AS bin
  FROM lab JOIN edges ON event_type = et),
counts AS (
  SELECT event_type, bin,
         CAST(sum(CASE WHEN half = 0 THEN 1 ELSE 0 END) AS BIGINT) AS na,
         CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END) AS BIGINT) AS nb
  FROM binned GROUP BY 1, 2),
tot AS (
  SELECT event_type AS et2, CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
  FROM counts GROUP BY 1),
pq AS (
  SELECT event_type,
         greatest(CAST(na AS DOUBLE) / ta, 1e-6) AS p,
         greatest(CAST(nb AS DOUBLE) / tb, 1e-6) AS q
  FROM counts JOIN tot ON event_type = et2)
SELECT event_type,
       round(CAST(sum(CAST(round((p - q) * ln(p / q) * 1e9) AS BIGINT)) AS DOUBLE) / 1e9, 6) AS psi,
       CAST(sum(CASE WHEN CAST(round((p - q) * ln(p / q) * 1e9) AS BIGINT) > 10000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_drifted_bins
FROM pq GROUP BY event_type ORDER BY event_type
"""


def q_parts_graph_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row graph-health summary of the co-purchase graph — the
    numbers a graph-platform team tracks nightly: Newman modularity of
    the LP-4 communities (graph.py::modularity — exact Q for any
    labeling), degree assortativity (Pearson r over endpoint degrees,
    both edge directions), and transitivity 3·triangles/wedges off the
    degree-ordered exact census (graph.py::triangle_count).  Every
    scalar is a 1-row broadcast crossJoin; the edge list is mined once.
    The oracle unrolls the LP rounds and replays all three metrics."""
    from mcpvectordb_spark.operators.graph import (
        label_propagation, modularity, triangle_count,
    )

    edges = _copurchase_pairs(spark, sf_dir).select(
        F.col("pa").alias("src"), F.col("pb").alias("dst")
    )
    labels = label_propagation(edges, rounds=4)
    tri = triangle_count(edges)
    mod = modularity(edges, labels)
    und = edges.select(F.col("src").alias("s"), F.col("dst").alias("t")).unionByName(
        edges.select(F.col("dst").alias("s"), F.col("src").alias("t"))
    )
    deg = und.groupBy(F.col("s").alias("v")).agg(F.count(F.lit(1)).alias("d"))
    asst = (
        und.join(deg.select(F.col("v").alias("s"), F.col("d").alias("ds")), "s")
        .join(deg.select(F.col("v").alias("t"), F.col("d").alias("dt")), "t")
        .agg(F.corr(F.col("ds").cast("double"), F.col("dt").cast("double")).alias("r"))
    )
    return (
        tri.crossJoin(F.broadcast(mod))
        .crossJoin(F.broadcast(asst))
        .select(
            "n_nodes", "n_edges", "n_communities",
            F.round("modularity", 6).alias("modularity"),
            F.round("r", 6).alias("assortativity"),
            F.round(
                F.lit(3.0) * F.col("n_triangles") / F.col("n_wedges"), 6
            ).alias("transitivity"),
        )
    )


def _sql_parts_graph_metrics() -> str:
    rounds = "".join(
        f""",
c{i} AS (
  SELECT e.t AS v, prev.lbl, count(*) AS c,
         row_number() OVER (PARTITION BY e.t ORDER BY count(*) DESC, prev.lbl ASC) AS rn
  FROM e JOIN l{i - 1} prev ON prev.v = e.s
  GROUP BY e.t, prev.lbl),
l{i} AS (SELECT v, lbl FROM c{i} WHERE rn = 1)"""
        for i in range(1, 5)
    )
    return f"""
WITH items AS (SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
raw AS (
  SELECT a.p AS src, b.p AS dst
  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= 2),
e AS (SELECT src AS s, dst AS t FROM raw UNION SELECT dst AS s, src AS t FROM raw),
l0 AS (SELECT DISTINCT s AS v, s AS lbl FROM e){rounds},
deg AS (SELECT s AS v, CAST(count(*) AS BIGINT) AS d FROM e GROUP BY 1),
m AS (SELECT CAST(count(*) AS DOUBLE) AS m, CAST(count(*) AS BIGINT) AS n_edges FROM raw),
nn AS (SELECT CAST(count(*) AS BIGINT) AS n_nodes FROM deg),
dl AS (SELECT l.lbl, CAST(sum(d.d) AS BIGINT) AS d_c FROM l4 l JOIN deg d ON l.v = d.v GROUP BY 1),
lc AS (
  SELECT x.lbl, CAST(count(*) AS BIGINT) AS l_c
  FROM raw r JOIN l4 x ON x.v = r.src JOIN l4 y ON y.v = r.dst
  WHERE x.lbl = y.lbl GROUP BY 1),
q AS (
  SELECT CAST(count(*) AS BIGINT) AS n_communities,
         sum(coalesce(lc.l_c, 0) / m.m - (dl.d_c / (2.0 * m.m)) ^ 2) AS modularity
  FROM dl LEFT JOIN lc ON dl.lbl = lc.lbl, m),
asst AS (
  SELECT corr(CAST(d1.d AS DOUBLE), CAST(d2.d AS DOUBLE)) AS r
  FROM e JOIN deg d1 ON e.s = d1.v JOIN deg d2 ON e.t = d2.v),
wed AS (SELECT CAST(sum(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM raw e1 JOIN raw e2 ON e2.src = e1.src AND e2.dst > e1.dst
  JOIN raw e3 ON e3.src = e1.dst AND e3.dst = e2.dst)
SELECT nn.n_nodes, m.n_edges, q.n_communities,
       round(q.modularity, 6) AS modularity,
       round(asst.r, 6) AS assortativity,
       round(3.0 * tri.n_triangles / wed.n_wedges, 6) AS transitivity
FROM nn, m, q, asst, wed, tri
"""


SQL_PARTS_GRAPH_METRICS = _sql_parts_graph_metrics()


def q_embedding_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space drift monitor — the vector-side companion of
    events_psi: per label, the centroid of the even-vec_id cohort vs the
    odd cohort (a deterministic stand-in for before/after a model or
    corpus change), reported as centroid cosine, L2 shift, and cohort
    sizes.  Centroids compute as ONE keyed aggregation over
    (label, half, dim) — posexplode fans each vector into 64 rows
    map-side, the shuffle carries |labels|·2·64 partial means, never
    vectors; at 100 TB this is the cheapest possible full-corpus pass
    (and a drifting label with cosine < 0.99 is what triggers reindex /
    retrain).  The oracle replays the fan-out with unnest WITH
    ORDINALITY."""
    e = load_table(spark, sf_dir, "embeddings")
    pe = e.select(
        "label",
        (F.col("vec_id") % 2).alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias("pos", "x"),
    )
    means = pe.groupBy("label", "half", "pos").agg(
        F.avg("x").alias("m"), F.count(F.lit(1)).alias("n")
    )
    j = (
        means.filter(F.col("half") == 0)
        .select("label", "pos", F.col("m").alias("ma"), F.col("n").alias("n_a"))
        .join(
            means.filter(F.col("half") == 1).select(
                "label", "pos", F.col("m").alias("mb"), F.col("n").alias("n_b")
            ),
            ["label", "pos"],
        )
    )
    return (
        j.groupBy("label")
        .agg(
            F.first("n_a").cast("long").alias("n_a"),
            F.first("n_b").cast("long").alias("n_b"),
            F.sum(F.col("ma") * F.col("mb")).alias("dot"),
            F.sqrt(F.sum(F.col("ma") * F.col("ma"))).alias("na"),
            F.sqrt(F.sum(F.col("mb") * F.col("mb"))).alias("nb"),
            F.sqrt(F.sum((F.col("ma") - F.col("mb")) * (F.col("ma") - F.col("mb")))).alias("shift"),
        )
        .select(
            "label", "n_a", "n_b",
            F.round(F.col("dot") / (F.col("na") * F.col("nb")), 6).alias("centroid_cosine"),
            F.round("shift", 6).alias("centroid_shift"),
        )
        .orderBy("label")
    )


SQL_EMBEDDING_DRIFT = """
WITH dims AS (
  SELECT unnest(range(1, (SELECT max(len(embedding)) FROM embeddings) + 1)) AS pos),
pe AS (
  SELECT label, vec_id % 2 AS half, d.pos,
         CAST(embedding[d.pos] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN dims d
  WHERE d.pos <= len(embedding)),
means AS (
  SELECT label, half, pos, avg(x) AS m, CAST(count(*) AS BIGINT) AS n
  FROM pe GROUP BY 1, 2, 3),
j AS (
  SELECT a.label, a.pos, a.m AS ma, a.n AS n_a, b.m AS mb, b.n AS n_b
  FROM means a JOIN means b ON a.label = b.label AND a.pos = b.pos
  WHERE a.half = 0 AND b.half = 1)
SELECT label, CAST(max(n_a) AS BIGINT) AS n_a, CAST(max(n_b) AS BIGINT) AS n_b,
       round(sum(ma * mb) / (sqrt(sum(ma * ma)) * sqrt(sum(mb * mb))), 6) AS centroid_cosine,
       round(sqrt(sum((ma - mb) ^ 2)), 6) AS centroid_shift
FROM j GROUP BY label ORDER BY label
"""


def q_customers_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity / l-diversity audit (Sweeney 2002; Machanavajjhala
    2007) of the customer table under the quasi-identifier (nation,
    account-balance century bucket) with the market segment as the
    sensitive attribute: one keyed aggregation produces
    every equivalence class's size and distinct-sensitive count; the
    summary row reports k (the minimum class size — re-identification
    risk is 1/k), the count of classes violating k>=5, and min
    l-diversity.  The governance gate a training-data release runs
    before shipping user-derived tables; at 100 TB it is one groupBy —
    the same shape as list_libraries.  Output: one row."""
    c = load_table(spark, sf_dir, "customer")
    classes = c.groupBy(
        "c_nationkey",
        F.floor(F.col("c_acctbal") / 100).cast("long").alias("bal_bucket"),
    ).agg(
        F.count(F.lit(1)).cast("long").alias("class_size"),
        F.countDistinct("c_mktsegment").cast("long").alias("l_div"),
    )
    return classes.agg(
        F.count(F.lit(1)).cast("long").alias("n_classes"),
        F.min("class_size").alias("k_anonymity"),
        F.sum((F.col("class_size") < 5).cast("int")).cast("long").alias("n_violations_k5"),
        F.min("l_div").alias("l_diversity"),
        F.round(F.avg("class_size"), 6).alias("avg_class_size"),
    )


def q_feature_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Univariate feature screening (operators/modeleval.py::feature_auc):
    midrank ROC-AUC of the four RAW lr_quality features against the
    is-English label — the filter-method ranking run before training.
    Features are engine-exact (a length and three integer-ratio
    divisions; AUC is monotone-invariant so the ln/z-standardization of
    the trainer is deliberately skipped), quantized to the 1e-6 grid, and
    ranked by a window PARTITIONED BY feature over value blocks."""
    from mcpvectordb_spark.operators.modeleval import feature_auc

    docs = load_table(spark, sf_dir, "documents")
    t = dd.normalize_text(F.col("text"))
    words = F.split(t, " ")
    nt = F.greatest(F.length(t), F.lit(1)).cast("double")
    nw = F.greatest(F.size(words), F.lit(1)).cast("double")
    feats = [
        ("chars_per_word", F.length(t) / nw),
        ("distinct_ratio", F.size(F.array_distinct(words)) / nw),
        ("n_chars", F.length(t).cast("double")),
        ("vowel_ratio", F.length(F.regexp_replace(t, "[^aeiou]", "")) / nt),
    ]
    out = feature_auc(docs.withColumn("y", F.col("lang") == "en"), feats, "y")
    return out.select("feature", "n", "n_pos", F.round("auc", 6).alias("auc"))


SQL_FEATURE_AUC = f"""
WITH raw AS (
  SELECT CAST(lang = 'en' AS DOUBLE) AS y, {_sql_norm('text')} AS t, {_sql_words('text')} AS w
  FROM documents),
vals AS (
  SELECT y, 'chars_per_word' AS feature,
         CAST(len(t) AS DOUBLE) / greatest(len(w), 1) AS v FROM raw
  UNION ALL
  SELECT y, 'distinct_ratio',
         CAST(len(list_distinct(w)) AS DOUBLE) / greatest(len(w), 1) FROM raw
  UNION ALL
  SELECT y, 'n_chars', CAST(len(t) AS DOUBLE) FROM raw
  UNION ALL
  SELECT y, 'vowel_ratio',
         CAST(len(regexp_replace(t, '[^aeiou]', '', 'g')) AS DOUBLE) / greatest(len(t), 1) FROM raw),
blocks AS (
  SELECT feature, CAST(round(v * 1000000) AS BIGINT) AS vq,
         CAST(count(*) AS BIGINT) AS cnt, sum(y) AS pos
  FROM vals GROUP BY 1, 2),
ranked AS (
  SELECT feature, cnt, pos,
         sum(cnt) OVER (PARTITION BY feature ORDER BY vq) AS cum
  FROM blocks),
per AS (
  SELECT feature, sum(cnt) AS n, sum(pos) AS n_pos,
         sum(pos * (cum - cnt + (CAST(cnt AS DOUBLE) + 1) / 2)) AS r_pos
  FROM ranked GROUP BY 1)
SELECT feature, CAST(n AS BIGINT) AS n, CAST(n_pos AS BIGINT) AS n_pos,
       round(CASE WHEN n_pos * (n - n_pos) > 0
                  THEN (r_pos - n_pos * (n_pos + 1.0) / 2) / (n_pos * (n - n_pos)) END, 6) AS auc
FROM per
"""


def q_lr_pr_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Precision-recall evaluation (operators/modeleval.py::pr_curve) of
    the lr_quality model: tie-aware average precision + the 11-point
    interpolated PR curve (TREC style).  Probabilities ride the same
    1e-6 quantized blocks as lr_eval; the 11 recall levels are
    CAST(i AS DOUBLE)/10 in both engines so the >= joins see identical
    doubles.  The oracle replays the GD chain + the block cumulative
    scan + the same inequality join."""
    from mcpvectordb_spark.operators.modeleval import pr_curve

    scored, _ = _lr_scored(spark, sf_dir)
    out = pr_curve(scored, "y", "p", levels=11)
    return out.select(
        F.round("recall_level", 1).alias("recall_level"),
        F.round("interp_prec", 6).alias("interp_prec"),
        F.round("ap", 6).alias("ap"),
    )


SQL_LR_PR_CURVE = (
    _sql_lr_blocks()
    + """,
cum AS (
  SELECT pq, cnt, pos,
         sum(cnt) OVER (ORDER BY pq DESC) AS cum_n,
         sum(pos) OVER (ORDER BY pq DESC) AS cum_pos
  FROM blocks),
pstats AS (
  SELECT sum(pos) AS n_pos,
         sum(pos * cum_pos / cum_n) AS ap_num
  FROM cum),
levels AS (
  SELECT CAST(unnest(range(0, 11)) AS DOUBLE) / 10 AS recall_level)
SELECT round(l.recall_level, 1) AS recall_level,
       round(max(c.cum_pos / CAST(c.cum_n AS DOUBLE)), 6) AS interp_prec,
       round(min(s.ap_num / s.n_pos), 6) AS ap
FROM levels l, cum c, pstats s
WHERE c.cum_pos / s.n_pos >= l.recall_level
GROUP BY 1
"""
)


def q_events_attribution_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Markov-chain removal-effect attribution (operators/analytics.py::
    markov_removal_attribution): per-user journeys up to first purchase
    feed a (src, dst) transition matrix; each channel's removal chain
    maps its inbound transitions to '(null)', and 6 matrix SQUARINGS give
    the exact 64-step absorption probability for all chains in one keyed
    plan (log-depth, localCheckpointed — never 64 chained iterations).
    The oracle replays journeys, the removal mapping and all 6 squarings."""
    from mcpvectordb_spark.operators.analytics import markov_removal_attribution

    ev = load_table(spark, sf_dir, "events")
    out = markov_removal_attribution(ev, conv_value="purchase")
    return out.select(
        "channel",
        F.round("p_conv_full", 6).alias("p_conv_full"),
        F.round("p_conv_removed", 6).alias("p_conv_removed"),
        F.round("removal_effect", 6).alias("removal_effect"),
        F.round("attribution", 6).alias("attribution"),
    )


def _sql_markov_attr(squarings: int = 6) -> str:
    ctes = [
        """ordered AS (
  SELECT user_id AS u, event_type AS t,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
  FROM events)""",
        """fp AS (
  SELECT u, min(CASE WHEN t = 'purchase' THEN rn END) AS fp
  FROM ordered GROUP BY 1)""",
        """j AS (
  SELECT o.u, o.t, o.rn, f.fp FROM ordered o JOIN fp f USING (u)
  WHERE f.fp IS NULL OR o.rn < f.fp)""",
        """t1 AS (
  SELECT t AS src,
         COALESCE(lead(t) OVER (PARTITION BY u ORDER BY rn),
                  CASE WHEN fp IS NOT NULL THEN '(conv)' ELSE '(null)' END) AS dst
  FROM j)""",
        """firsts AS (
  SELECT u, t AS ft FROM (
    SELECT u, t, row_number() OVER (PARTITION BY u ORDER BY rn) AS rn2 FROM j)
  WHERE rn2 = 1)""",
        """starts AS (
  SELECT '(start)' AS src,
         COALESCE(fi.ft, CASE WHEN f.fp IS NOT NULL THEN '(conv)' ELSE '(null)' END) AS dst
  FROM fp f LEFT JOIN firsts fi USING (u))""",
        """cnt AS (
  SELECT src, dst, CAST(count(*) AS BIGINT) AS c
  FROM (SELECT src, dst FROM t1 UNION ALL SELECT src, dst FROM starts)
  GROUP BY 1, 2)""",
        """tot AS (SELECT src, CAST(sum(c) AS BIGINT) AS tt FROM cnt GROUP BY 1)""",
        """base AS (
  SELECT cnt.src, cnt.dst, CAST(c AS DOUBLE) / tt AS p FROM cnt JOIN tot USING (src))""",
        """channels AS (SELECT DISTINCT t AS rm FROM j)""",
        """rms AS (SELECT rm FROM channels UNION ALL SELECT '(none)')""",
        """m0 AS (
  SELECT rm, src, dst, sum(p) AS p FROM (
    SELECT r.rm, b.src,
           CASE WHEN b.dst = r.rm THEN '(null)' ELSE b.dst END AS dst, b.p
    FROM rms r CROSS JOIN base b WHERE b.src <> r.rm)
  GROUP BY 1, 2, 3
  UNION ALL
  SELECT rm, s, s, CAST(1.0 AS DOUBLE)
  FROM rms CROSS JOIN (SELECT unnest(['(conv)', '(null)']) AS s))""",
    ]
    for i in range(1, squarings + 1):
        ctes.append(
            f"""m{i} AS (
  SELECT a.rm, a.src, b.dst, sum(a.p * b.p) AS p
  FROM m{i - 1} a JOIN m{i - 1} b ON a.rm = b.rm AND a.dst = b.src
  GROUP BY 1, 2, 3)"""
        )
    ctes.append(
        f"""conv AS (
  SELECT rm, p AS p_conv FROM m{squarings} WHERE src = '(start)' AND dst = '(conv)')"""
    )
    ctes.append(
        """fullc AS (
  SELECT COALESCE(sum(p_conv), CAST(0.0 AS DOUBLE)) AS p_conv_full
  FROM conv WHERE rm = '(none)')"""
    )
    ctes.append(
        """eff AS (
  SELECT ch.rm AS channel, p_conv_full,
         COALESCE(c.p_conv, CAST(0.0 AS DOUBLE)) AS p_conv_removed,
         CASE WHEN p_conv_full > 0
              THEN 1.0 - COALESCE(c.p_conv, CAST(0.0 AS DOUBLE)) / p_conv_full END AS removal_effect
  FROM channels ch LEFT JOIN conv c ON c.rm = ch.rm CROSS JOIN fullc)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT channel,
       round(p_conv_full, 6) AS p_conv_full,
       round(p_conv_removed, 6) AS p_conv_removed,
       round(removal_effect, 6) AS removal_effect,
       round(CASE WHEN sum(removal_effect) OVER () > 0
                  THEN removal_effect / sum(removal_effect) OVER () END, 6) AS attribution
FROM eff
"""
    )


SQL_EVENTS_ATTRIBUTION_MARKOV = _sql_markov_attr()


SQL_CUSTOMERS_KANON = """
WITH classes AS (
  SELECT c_nationkey, CAST(floor(c_acctbal / 100) AS BIGINT) AS bal_bucket,
         CAST(count(*) AS BIGINT) AS class_size,
         CAST(count(DISTINCT c_mktsegment) AS BIGINT) AS l_div
  FROM customer GROUP BY 1, 2)
SELECT CAST(count(*) AS BIGINT) AS n_classes,
       min(class_size) AS k_anonymity,
       CAST(sum(CASE WHEN class_size < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations_k5,
       min(l_div) AS l_diversity,
       round(avg(class_size), 6) AS avg_class_size
FROM classes
"""




# re-export everything (including underscore helpers) to later sections
__all__ = [n for n in dir() if not n.startswith("__")]
