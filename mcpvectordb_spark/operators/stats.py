"""Experiment / robust-statistics operators: A/B-test analysis and
median-MAD outlier detection.

The analytics layer a product team runs on the same event stream the
funnels/cohorts (operators/analytics.py) read — both are pure keyed
aggregations with exact SQL twins, so every number is oracle-checkable.

Scale shape: ab_test_ztest is two keyed aggs (user rollup, then variant
rollup — per-user state never leaves the shuffle as more than one row);
mad_outliers is two exact-percentile aggs per group plus a broadcast-join
gate.  Exact percentiles shuffle per-group value lists inside Spark's
percentile aggregate; at 100 TB swap `F.percentile` for the mergeable
histogram sketch (operators/sketches.py::histogram_quantiles) — the
module keeps the exact form because the oracle gate demands exactness and
the sketch path is already gated separately (`events_quantile_sketch`).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.blocks import value_blocks
from mcpvectordb_spark.operators.dedup import hexint48


def ab_assign(user: Column, salt: str = "ab", n_variants: int = 2) -> Column:
    """Deterministic hash bucketing of users into variants (the portable
    md5 hexint48, so the oracle replays the assignment bit-exactly)."""
    return F.pmod(hexint48(F.concat(F.lit(salt + ":"), user.cast("string"))), F.lit(n_variants))


def ab_test_ztest(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    salt: str = "ab",
    min_conversions: int = 1,
) -> DataFrame:
    """Two-proportion z-test between hash-assigned variants: a user
    converts with >= ``min_conversions`` events of ``conversion_type``
    (raise it when the base event is so common that rate ~= 1 and the
    pooled variance degenerates).  Returns ONE row (n_a, x_a, n_b, x_b,
    rate_a, rate_b, z) — the experiment-readout shape.  z uses the
    pooled-variance form (0 when the pooled rate is degenerate); the
    caller compares |z| against their critical value."""
    users = (
        events.select(
            F.col(user_col).alias("u"),
            (F.col(type_col) == conversion_type).cast("int").alias("c"),
        )
        .groupBy("u")
        .agg((F.sum("c") >= min_conversions).cast("int").alias("converted"))
        .withColumn("variant", ab_assign(F.col("u"), salt))
    )
    # one conditional global aggregation — a global agg ALWAYS yields one
    # row, so a degenerate split (a hash variant with zero users, or an
    # empty events table) surfaces as n=0/x=0 counts instead of silently
    # vanishing the way a 1-row × 0-row crossJoin readout would
    v0 = (F.col("variant") == 0).cast("long")
    v1 = (F.col("variant") == 1).cast("long")
    j = users.groupBy().agg(
        F.coalesce(F.sum(v0), F.lit(0)).alias("n_a"),
        F.coalesce(F.sum(v0 * F.col("converted")), F.lit(0)).alias("x_a"),
        F.coalesce(F.sum(v1), F.lit(0)).alias("n_b"),
        F.coalesce(F.sum(v1 * F.col("converted")), F.lit(0)).alias("x_b"),
    )
    # try_divide: a zero-user variant yields NULL (not an ANSI error) and
    # the when(se > 0) guard then collapses z to 0.0
    pa = F.try_divide(F.col("x_a"), F.col("n_a"))
    pb = F.try_divide(F.col("x_b"), F.col("n_b"))
    pool = F.try_divide(
        F.col("x_a") + F.col("x_b"), F.col("n_a") + F.col("n_b")
    )
    se = F.sqrt(
        pool
        * (1 - pool)
        * (
            F.try_divide(F.lit(1.0), F.col("n_a"))
            + F.try_divide(F.lit(1.0), F.col("n_b"))
        )
    )
    return j.select(
        "n_a", "x_a", "n_b", "x_b",
        F.coalesce(pa, F.lit(0.0)).alias("rate_a"),
        F.coalesce(pb, F.lit(0.0)).alias("rate_b"),
        F.when(se > 0, (pa - pb) / se).otherwise(F.lit(0.0)).alias("z"),
    )


def mad_outliers(
    df: DataFrame,
    key_col: str,
    value_col: str,
    threshold: float = 3.5,
) -> DataFrame:
    """Robust per-group outliers by modified z-score (Iglewicz-Hoaglin):
    |0.6745 · (x - median)| / MAD >= threshold.  Immune to the outliers
    themselves, unlike mean/stddev z-scores.  Returns the flagged rows
    with their group's median/MAD and the score."""
    g = df.groupBy(F.col(key_col).alias("_mo_k")).agg(
        F.expr(f"percentile({value_col}, 0.5)").alias("med")
    )
    with_med = df.join(
        F.broadcast(g), F.col(key_col) == F.col("_mo_k")
    ).withColumn("_ad", F.abs(F.col(value_col) - F.col("med")))
    mad = with_med.groupBy(F.col(key_col).alias("_mo_k2")).agg(
        F.expr("percentile(_ad, 0.5)").alias("mad")
    )
    scored = with_med.join(
        F.broadcast(mad), F.col(key_col) == F.col("_mo_k2")
    ).withColumn(
        "score",
        F.when(F.col("mad") > 0, F.lit(0.6745) * F.col("_ad") / F.col("mad")).otherwise(
            F.lit(0.0)
        ),
    )
    return scored.filter(F.col("score") >= threshold).drop("_mo_k", "_mo_k2", "_ad")


def mann_whitney_u(
    samples: DataFrame,
    variant_col: str = "variant",
    value_col: str = "metric",
) -> DataFrame:
    """Mann-Whitney U / Wilcoxon rank-sum test between variants 0 and 1 —
    the nonparametric A/B readout for skewed metrics (revenue, counts)
    where the z-test on means is fragile.  Reference analytics surface:
    experiment rollups over the same event stream as ab_test_ztest.

    Midranks are computed WITHOUT a per-row global sort: values aggregate
    to the distinct-value level first (count per value per variant), and
    the cumulative window runs over DISTINCT values only.  For an exact
    cross-engine gate the metric must be integral (quantize currency to
    cents first) so tied blocks agree bit-exactly between engines; that
    same quantization is what bounds the distinct domain at 100 TB, where
    the ordered window runs over <= |domain| rows, not |users| rows.

    U_a = R_a - n_a(n_a+1)/2 with midranks R; z uses the tie-corrected
    variance  n_a·n_b/12 · (n+1 - T/(n(n-1))),  T = Σ(t³-t)  over tied
    blocks (no continuity correction — documented, oracle replays it).
    Rank-biserial effect size r = 1 - 2U_a/(n_a·n_b).

    Returns one row: n_a, n_b, u_a, z, rank_biserial.
    """
    per_value = value_blocks(
        samples,
        value_col,
        counters={
            "cnt_a": F.sum(F.when(F.col(variant_col) == 0, 1).otherwise(0)),
            "cnt_b": F.sum(F.when(F.col(variant_col) == 1, 1).otherwise(0)),
        },
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = per_value.withColumn("cnt", F.col("cnt_a") + F.col("cnt_b")).withColumn(
        "midrank",
        F.sum("cnt").over(w) - F.col("cnt") + (F.col("cnt") + F.lit(1)) / F.lit(2.0),
    )
    agg = ranked.agg(
        F.sum("cnt_a").cast("long").alias("n_a"),
        F.sum("cnt_b").cast("long").alias("n_b"),
        F.sum(F.col("cnt_a") * F.col("midrank")).alias("r_a"),
        F.sum(F.col("cnt") * F.col("cnt") * F.col("cnt") - F.col("cnt")).alias("ties_t"),
    )
    n = F.col("n_a") + F.col("n_b")
    u_a = F.col("r_a") - F.col("n_a") * (F.col("n_a") + 1) / F.lit(2.0)
    mu = F.col("n_a") * F.col("n_b") / F.lit(2.0)
    var = (
        F.col("n_a") * F.col("n_b") / F.lit(12.0)
        * ((n + 1) - F.col("ties_t") / (n * (n - 1)))
    )
    return agg.select(
        "n_a",
        "n_b",
        u_a.alias("u_a"),
        F.when(var > 0, (u_a - mu) / F.sqrt(var)).otherwise(F.lit(0.0)).alias("z"),
        (F.lit(1.0) - F.lit(2.0) * u_a / (F.col("n_a") * F.col("n_b"))).alias(
            "rank_biserial"
        ),
    )


def poisson1_weight(u: Column) -> Column:
    """Inverse CDF of Poisson(1) at u ∈ [0,1), capped at 5 (the tail
    beyond holds ~0.06% of mass): the per-(unit, replica) resampling
    weight of the POISSON BOOTSTRAP — the bootstrap that scales, because
    every replica becomes a weighted aggregation over one shared scan
    instead of a materialized resample.  Thresholds are the exact
    partial sums e⁻¹·Σ1/j!, written as literals so the SQL oracle can
    replay each draw bit-for-bit."""
    return (
        F.when(u < 0.36787944117144233, 0)
        .when(u < 0.7357588823428846, 1)
        .when(u < 0.9196986029286058, 2)
        .when(u < 0.9810118431238462, 3)
        .when(u < 0.9963401531726563, 4)
        .otherwise(5)
    )


def ols2_fit(
    df: DataFrame,
    key_col: str,
    y_col: str,
    x1_col: str,
    x2_col: str,
) -> DataFrame:
    """Two-feature least squares WITH intercept, per key, from sufficient
    statistics — the canonical one-pass distributed regression: a single
    groupBy accumulates the 3x3 Gram matrix (n, Sx1, Sx2, Sx11, Sx12,
    Sx22) and the moment vector (Sy, Sx1y, Sx2y, Syy), then the 3x3
    normal equations solve in CLOSED FORM via Cramer's rule on the
    driver-free scalar row.  No iteration, no second pass, no collect:
    at 100 TB this is one map-side-combinable aggregation producing one
    row per key, and the algebra is a codegen projection.

    Inputs MUST be integer-valued (cast to BIGINT here) so the sums are
    exact and order-independent — quantize fixed-decimal columns first
    (price*10 etc.); that is what makes Spark and a SQL oracle agree
    bit-for-bit before the final double algebra, which both engines
    evaluate with the same IEEE operations.

    Returns (key, n, b0, b1, b2, r2); keys whose Gram matrix is singular
    (constant features, n too small) emit NULL coefficients.  SSE falls
    out of the normal equations as Syy - b'X'y, so R^2 needs nothing
    beyond the same scalar row.
    """
    a = df.select(
        F.col(key_col).alias("k"),
        F.col(y_col).cast("long").alias("y"),
        F.col(x1_col).cast("long").alias("x1"),
        F.col(x2_col).cast("long").alias("x2"),
    )
    s = a.groupBy("k").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x1").alias("s1"),
        F.sum("x2").alias("s2"),
        F.sum(F.col("x1") * F.col("x1")).alias("s11"),
        F.sum(F.col("x1") * F.col("x2")).alias("s12"),
        F.sum(F.col("x2") * F.col("x2")).alias("s22"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x1") * F.col("y")).alias("s1y"),
        F.sum(F.col("x2") * F.col("y")).alias("s2y"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n").cast("double")
    s1 = F.col("s1").cast("double")
    s2 = F.col("s2").cast("double")
    s11 = F.col("s11").cast("double")
    s12 = F.col("s12").cast("double")
    s22 = F.col("s22").cast("double")
    sy = F.col("sy").cast("double")
    s1y = F.col("s1y").cast("double")
    s2y = F.col("s2y").cast("double")
    syy = F.col("syy").cast("double")
    det = (
        n * (s11 * s22 - s12 * s12)
        - s1 * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s12 - s11 * s2)
    )
    det0 = (
        sy * (s11 * s22 - s12 * s12)
        - s1 * (s1y * s22 - s12 * s2y)
        + s2 * (s1y * s12 - s11 * s2y)
    )
    det1 = (
        n * (s1y * s22 - s12 * s2y)
        - sy * (s1 * s22 - s12 * s2)
        + s2 * (s1 * s2y - s1y * s2)
    )
    det2 = (
        n * (s11 * s2y - s1y * s12)
        - s1 * (s1 * s2y - s1y * s2)
        + sy * (s1 * s12 - s11 * s2)
    )
    b0 = det0 / det
    b1 = det1 / det
    b2 = det2 / det
    sse = syy - (b0 * sy + b1 * s1y + b2 * s2y)
    sst = syy - sy * sy / n
    ok = det != F.lit(0.0)
    return s.select(
        F.col("k").alias(key_col),
        "n",
        F.when(ok, b0).alias("b0"),
        F.when(ok, b1).alias("b1"),
        F.when(ok, b2).alias("b2"),
        F.when(ok & (sst > 0), F.lit(1.0) - sse / sst).alias("r2"),
    )


def cat_association(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Association between two categorical columns from ONE contingency
    pass: Pearson chi-square statistic, degrees of freedom, mutual
    information (nats), and Cramer's V — the feature-relevance /
    independence diagnostics for categorical pairs (is event type
    independent of hour-of-day?).

        chi2 = sum_ij (n_ij - e_ij)^2 / e_ij,   e_ij = r_i c_j / N
        MI   = sum_ij (n_ij/N) ln(N n_ij / (r_i c_j))
        V    = sqrt(chi2 / (N (min(R,C) - 1)))

    Plan: one groupBy(a, b) builds the contingency cells; marginals are
    two tiny re-aggregations of the CELLS (not the raw rows) broadcast
    back; the per-cell terms are codegen doubles folded in a final
    single-row agg.  At 100 TB the only corpus-scale shuffle is the
    first groupBy — everything after operates on |A|x|B| cells.  All
    counts are exact BIGINTs; the per-cell terms are doubles, so the
    cross-engine contract is 6-dp agreement (measure-zero boundary
    risk), not bit equality.

    Returns one row: (n, n_rows, n_cols, dof, chi2, mi, cramers_v).
    """
    cells = (
        df.groupBy(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
        .agg(F.count(F.lit(1)).alias("nij"))
        .localCheckpoint(eager=False)
    )
    rows = cells.groupBy("a").agg(F.sum("nij").alias("ri"))
    cols = cells.groupBy("b").agg(F.sum("nij").alias("cj"))
    tot = cells.agg(
        F.sum("nij").alias("n_total"),
        F.countDistinct("a").alias("n_rows"),
        F.countDistinct("b").alias("n_cols"),
    )
    j = (
        cells.join(F.broadcast(rows), "a")
        .join(F.broadcast(cols), "b")
        .crossJoin(F.broadcast(tot))
    )
    nd = F.col("nij").cast("double")
    rd = F.col("ri").cast("double")
    cd = F.col("cj").cast("double")
    td = F.col("n_total").cast("double")
    e = rd * cd / td
    chi_term = (nd - e) * (nd - e) / e
    mi_term = nd / td * F.log(td * nd / (rd * cd))
    out = j.agg(
        F.first("n_total").alias("n"),
        F.first("n_rows").alias("n_rows"),
        F.first("n_cols").alias("n_cols"),
        (
            (F.first("n_rows") - F.lit(1)) * (F.first("n_cols") - F.lit(1))
        ).alias("dof"),
        F.round(F.sum(chi_term), 6).alias("chi2"),
        F.round(F.sum(mi_term), 6).alias("mi"),
    )
    v = F.sqrt(
        F.col("chi2")
        / (
            F.col("n").cast("double")
            * (F.least("n_rows", "n_cols").cast("double") - F.lit(1.0))
        )
    )
    return out.select(
        "n",
        "n_rows",
        "n_cols",
        "dof",
        "chi2",
        "mi",
        F.when(
            F.least("n_rows", "n_cols") > 1, F.round(v, 6)
        ).alias("cramers_v"),
    )


def gini_concentration(df: DataFrame, val_col: str) -> DataFrame:
    """Gini coefficient + top-share concentration of a non-negative
    integer measure (spend in cents, tokens per document, ...) — the
    inequality audit behind "are 1% of customers 50% of revenue?" and
    "do a handful of documents dominate the training mix?".

        G = (2 * sum_i i*x_(i) - (n+1) * S) / (n * S),  x sorted asc

    computed WITHOUT a per-row global sort: rows collapse to VALUE
    BLOCKS (distinct value, count) — the quantized-block pattern from
    lr_eval — and for a tied block at value v with c rows and `below`
    rows under it, sum i*x over the block is v*(c*below + c*(c+1)/2),
    invariant to tie order.  The only window runs over the BLOCK table.
    Top-k shares clamp per-block take = min(c, k - above) from the
    descending cumulative counts — exact, no row-level ranking.  All
    statistics are exact BIGINTs; the final ratios are single double
    divisions, so the oracle agrees bit-for-bit.

    Returns one row: (n, total, gini, top1_share, top10_share); top-k
    counts are max(1, n//100) and max(1, n//10).  Empty or all-zero
    input emits NULL gini.
    """
    a = df.select(F.col(val_col).cast("long").alias("v"))
    blocks = value_blocks(a, "v")
    w_asc = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    w_desc = Window.orderBy(F.col("v").desc()).rowsBetween(
        Window.unboundedPreceding, -1
    )
    # r9 optimization: b feeds tot AND topk — the pin stops the input scan
    # + block agg + both cumulative windows from running twice.
    b = blocks.select(
        "v",
        "c",
        F.coalesce(F.sum("c").over(w_asc), F.lit(0)).alias("below"),
        F.coalesce(F.sum("c").over(w_desc), F.lit(0)).alias("above"),
    ).localCheckpoint(eager=False)
    tot = b.agg(
        F.sum("c").alias("n"),
        F.sum(F.col("v") * F.col("c")).alias("s"),
        F.sum(
            F.col("v")
            * (
                F.col("c") * F.col("below")
                + ((F.col("c") * (F.col("c") + 1)) / 2).cast("long")
            )
        ).alias("t"),
    )
    k1 = F.greatest(F.lit(1), (F.col("n") / 100).cast("long"))
    k10 = F.greatest(F.lit(1), (F.col("n") / 10).cast("long"))
    topk = b.crossJoin(F.broadcast(tot)).select(
        "v",
        F.greatest(
            F.lit(0), F.least(F.col("c"), k1 - F.col("above"))
        ).alias("take1"),
        F.greatest(
            F.lit(0), F.least(F.col("c"), k10 - F.col("above"))
        ).alias("take10"),
    )
    tops = topk.agg(
        F.sum(F.col("v") * F.col("take1")).alias("top1"),
        F.sum(F.col("v") * F.col("take10")).alias("top10"),
    )
    nd = F.col("n").cast("double")
    sd = F.col("s").cast("double")
    return tot.crossJoin(F.broadcast(tops)).select(
        "n",
        F.col("s").alias("total"),
        F.when(
            F.col("s") > 0,
            F.round(
                (F.lit(2.0) * F.col("t").cast("double") - (nd + 1) * sd)
                / (nd * sd),
                6,
            ),
        ).alias("gini"),
        F.when(F.col("s") > 0, F.round(F.col("top1").cast("double") / sd, 6)).alias(
            "top1_share"
        ),
        F.when(
            F.col("s") > 0, F.round(F.col("top10").cast("double") / sd, 6)
        ).alias("top10_share"),
    )


def bradley_terry(
    games: DataFrame,
    winner_col: str,
    loser_col: str,
    iterations: int = 10,
    loop_partitions: int | None = None,
) -> DataFrame:
    """Bradley-Terry strength estimation from pairwise outcomes — the
    aggregation behind preference data (which answer/supplier/variant
    wins head-to-heads?), fit by Hunter's (2004) MM algorithm:

        pi_i <- W_i / sum_j N_ij / (pi_i + pi_j)

    with W_i total wins and N_ij games between i and j.  The raw games
    collapse ONCE to a per-ordered-pair table (i, j, games, wins) — the
    only corpus-scale shuffle; each of the fixed `iterations` MM steps
    is then a join of that pair table against the K-row strength vector
    (broadcast) plus one keyed agg, localCheckpointed so the plan stays
    O(1) deep (the PageRank contract, graph.py).  Entities with zero
    wins converge to strength 0 and are guarded against 0/0.  Final
    strengths normalize to sum 1.

    The MM update is scale-invariant, so no per-iteration normalization
    is needed; an oracle replays the fixed iteration count as unrolled
    CTEs (the LP-rounds / matrix-squaring pattern).  Returns
    (entity, games, wins, strength).

    ``loop_partitions``: scoped small-table fast path (the pagerank
    contract, graph.py): pin iteration stages to this parallelism with
    AQE off and materialize eagerly — per-stage replanning latency
    dominates 10 tiny MM stages.  Leave None when K is web-scale.
    """
    spark = games.sparkSession
    eager = loop_partitions is not None
    saved: dict[str, str] = {}
    if eager:
        for ck, cv in (
            ("spark.sql.shuffle.partitions", str(loop_partitions)),
            ("spark.sql.adaptive.enabled", "false"),
        ):
            saved[ck] = spark.conf.get(ck)
            spark.conf.set(ck, cv)
    try:
        return _bt_inner(games, winner_col, loser_col, iterations, eager)
    finally:
        for ck, cv in saved.items():
            spark.conf.set(ck, cv)


def _bt_inner(
    games: DataFrame,
    winner_col: str,
    loser_col: str,
    iterations: int,
    eager: bool,
) -> DataFrame:
    sym = games.select(
        F.col(winner_col).alias("i"), F.col(loser_col).alias("j"), F.lit(1).alias("w")
    ).unionByName(
        games.select(
            F.col(loser_col).alias("i"),
            F.col(winner_col).alias("j"),
            F.lit(0).alias("w"),
        )
    )
    pairs = (
        sym.groupBy("i", "j")
        .agg(F.count(F.lit(1)).alias("nij"), F.sum("w").alias("wij"))
        .localCheckpoint(eager=eager)
    )
    totals = pairs.groupBy("i").agg(
        F.sum("nij").alias("games_i"), F.sum("wij").alias("wins_i")
    ).localCheckpoint(eager=eager)
    pi = totals.select("i", F.lit(1.0).alias("pi"))
    # broadcast both strength-vector references: the K-row table is
    # driver-sized by construction, and shuffle joins here measured
    # SLOWER (5.5s vs 4.1s for 10 rounds) — two tiny broadcasts beat two
    # exchanges per round even with the loop parallelism pinned.
    # r10 notes, both measured and reverted: (a) a full densification to
    # one row of arrays (the markov template) ABANDONED — K here is the
    # entity count (1000 suppliers / 690k distinct pairs at sf0.1, grows
    # with the data, unlike markov's bounded event-type enum), and
    # Spark's map element_at is a linear scan, so the dense iteration
    # went quadratic and hung at sf0.1; densify only over
    # data-independent enums.  (b) aliasing both broadcasts onto one
    # canonical subtree for ReuseExchange profiled byte-identical (36
    # jobs either way) — the per-round work (pairs agg re-read ≈ 90 MB
    # cached) is real MM work, not exchange duplication.
    for _ in range(int(iterations)):
        d = (
            pairs.join(F.broadcast(pi.select(F.col("i"), F.col("pi"))), "i")
            .join(
                F.broadcast(pi.select(F.col("i").alias("j"), F.col("pi").alias("pj"))),
                "j",
            )
            .groupBy("i")
            .agg(
                F.sum(
                    F.col("nij").cast("double") / (F.col("pi") + F.col("pj"))
                ).alias("den")
            )
        )
        pi = (
            totals.join(d, "i")
            .select(
                "i",
                F.when(
                    F.col("wins_i") > 0,
                    F.col("wins_i").cast("double") / F.col("den"),
                )
                .otherwise(F.lit(0.0))
                .alias("pi"),
            )
            .localCheckpoint(eager=eager)
        )
    tot = pi.agg(F.sum("pi").alias("z"))
    return (
        pi.crossJoin(F.broadcast(tot))
        .join(F.broadcast(totals), "i")
        .select(
            F.col("i").alias("entity"),
            F.col("games_i").alias("games"),
            F.col("wins_i").alias("wins"),
            F.round(F.col("pi") / F.col("z"), 6).alias("strength"),
        )
    )


def quantile_normalize(df: DataFrame, key_col: str, val_col: str) -> DataFrame:
    """Quantile normalization across groups (the batch-effect corrector
    from bioinformatics, equally at home harmonizing per-source feature
    scales in a training mix): each group's value distribution maps
    onto the POOLED distribution by rank — value v in group k with
    within-group cumulative count c maps to the pooled
    ceil(c * N / n_k)-th smallest value.

    Everything is exact integer rank arithmetic over VALUE BLOCKS
    (the customers_gini pattern): one groupBy builds (key, v) blocks,
    windows over blocks (never rows) produce within-group and pooled
    cumulative counts, and the target rank r = (c*N + n_k - 1) div n_k
    selects the pooled block via a broadcast inequality join.  Returns
    one MAP ROW per (key, distinct value): (key, v, n, norm) — apply it
    to raw rows with an equi-join.  Input values must be pre-quantized
    integers (cast here); ties inherit the deterministic <=-rank
    convention in both engines.
    """
    a = df.select(
        F.col(key_col).alias("k"), F.col(val_col).cast("long").alias("v")
    )
    # r9 optimization: blocks feeds kb, nk AND (via the derivation below)
    # the pooled distribution — the pin materializes the (k, v) block
    # table once instead of re-running the input scan + agg per branch.
    blocks = value_blocks(a, "v", group_cols=("k",)).localCheckpoint(
        eager=False
    )
    wk = Window.partitionBy("k").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0
    )
    kb = blocks.select("k", "v", "c", F.sum("c").over(wk).alias("cumk"))
    nk = blocks.groupBy("k").agg(F.sum("c").alias("n_k"))
    # pooled derives from the (k, v) blocks — sum of per-group counts per
    # value IS the pooled row count per value (exact integers), so the
    # pooled pass never rescans the input (r9: input scans 2 -> 1).
    pooled = blocks.groupBy("v").agg(F.sum("c").alias("pc"))
    wp = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    pb = pooled.select(
        F.col("v").alias("pv"), F.sum("pc").over(wp).alias("cump")
    )
    ntot = pooled.agg(F.sum("pc").alias("n_tot"))
    ranked = kb.join(F.broadcast(nk), "k").crossJoin(F.broadcast(ntot)).select(
        "k",
        "v",
        "c",
        (
            (F.col("cumk") * F.col("n_tot") + F.col("n_k") - 1) / F.col("n_k")
        ).cast("long").alias("r"),
    )
    hit = ranked.join(
        F.broadcast(pb), F.col("cump") >= F.col("r")
    ).groupBy("k", "v", "c", "r").agg(F.min("pv").alias("norm"))
    return hit.select(
        F.col("k").alias(key_col),
        "v",
        F.col("c").alias("n"),
        "norm",
    )


def ks_two_sample(
    df: DataFrame,
    group_col: str,
    val_col: str,
    group_a,
    group_b,
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov test — the SHAPE-sensitive
    nonparametric complement to Mann-Whitney's location test:

        D = max_v | F_a(v) - F_b(v) |

    over the union of observed values, with the asymptotic statistic
    lambda = D * sqrt(n*m/(n+m)) and the 5% rejection bound 1.358
    (Smirnov).  Computed EXACTLY on value blocks (the customers_gini
    pattern): one groupBy builds per-(group, value) counts, one window
    over the distinct-value axis accumulates both CDFs, and D is a max
    over identical integer-ratio doubles — order-independent, so the
    oracle agrees bit-for-bit.  No sort of raw rows, no sampling.

    Returns one row: (n_a, n_b, d, d_at_value, lambda, reject_95).
    """
    a = df.select(
        F.col(group_col).alias("g"), F.col(val_col).alias("v")
    ).filter(F.col("g").isin([group_a, group_b]))
    blocks = value_blocks(
        a,
        "v",
        counters={
            "ca": F.sum(F.when(F.col("g") == group_a, 1).otherwise(0)),
            "cb": F.sum(F.when(F.col("g") == group_b, 1).otherwise(0)),
        },
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = blocks.select(
        "v",
        F.sum("ca").over(w).alias("cuma"),
        F.sum("cb").over(w).alias("cumb"),
    )
    tot = blocks.agg(
        F.sum("ca").alias("na"), F.sum("cb").alias("nb")
    )
    d = cum.crossJoin(F.broadcast(tot)).select(
        "v",
        "na",
        "nb",
        F.abs(
            F.col("cuma").cast("double") / F.col("na")
            - F.col("cumb").cast("double") / F.col("nb")
        ).alias("diff"),
    )
    best = d.withColumn(
        "rk",
        F.row_number().over(
            Window.orderBy(F.col("diff").desc(), F.col("v").asc())
        ),
    ).filter(F.col("rk") == 1)
    lam = F.col("diff") * F.sqrt(
        F.col("na").cast("double")
        * F.col("nb")
        / (F.col("na") + F.col("nb")).cast("double")
    )
    return best.select(
        F.col("na").alias("n_a"),
        F.col("nb").alias("n_b"),
        F.round("diff", 6).alias("d"),
        F.col("v").alias("d_at_value"),
        F.round(lam, 6).alias("lam"),
        (lam > 1.358).alias("reject_95"),
    )


def eb_shrink_rates(
    counts: DataFrame,
    key_col: str,
    n_col: str,
    k_col: str,
    min_n: int = 1,
) -> DataFrame:
    """Empirical-Bayes shrinkage of per-key success rates under a
    beta-binomial model (the batting-average estimator): fit a Beta
    prior to the ENSEMBLE of observed rates by method of moments,

        a = m * (m(1-m)/v - 1),   b = (1-m) * (m(1-m)/v - 1)

    with m / v the mean / population variance of the raw rates p_i =
    k_i/n_i, then pull every key toward the prior mean in proportion to
    its evidence:  eb_i = (k_i + a) / (n_i + a + b).  Small-n keys
    shrink hard, large-n keys barely move — the fix for "this customer
    is 100% because they ordered once".

    ``min_n``: fit the prior only on keys with n >= min_n — raw-rate
    variance includes binomial noise E[t(1-t)/n] on top of the true
    prior variance, so low-evidence keys INFLATE v and collapse the
    fitted prior (measured: beta(8,12) data with n=1 keys included fits
    alpha+beta ~ 1.5 instead of ~20).  Shrinkage still applies to ALL
    keys.

    One pass computes the moment sums (count, sum p, sum p^2); the
    prior is a broadcast scalar row; shrinkage is a codegen projection.
    Degenerate ensembles (v = 0 or v >= m(1-m), where MoM gives a
    non-positive prior) emit NULL eb — shrinking is undefined, not
    silently skipped.  Returns (key, n, k, raw_rate, alpha, beta,
    eb_rate).
    """
    a = counts.select(
        F.col(key_col).alias("key"),
        F.col(n_col).cast("long").alias("n"),
        F.col(k_col).cast("long").alias("k"),
    ).filter(F.col("n") > 0)
    p = F.col("k").cast("double") / F.col("n").cast("double")
    mom = a.filter(F.col("n") >= int(min_n)).agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(p).alias("sp"),
        F.sum(p * p).alias("spp"),
    )
    cd = F.col("c").cast("double")
    m = F.col("sp") / cd
    v = F.col("spp") / cd - (F.col("sp") / cd) * (F.col("sp") / cd)
    scale = m * (F.lit(1.0) - m) / v - F.lit(1.0)
    prior = mom.select(
        F.when((v > 0) & (scale > 0), m * scale).alias("alpha"),
        F.when((v > 0) & (scale > 0), (F.lit(1.0) - m) * scale).alias("beta"),
    )
    return a.crossJoin(F.broadcast(prior)).select(
        F.col("key").alias(key_col),
        "n",
        "k",
        F.round(p, 6).alias("raw_rate"),
        F.round("alpha", 6).alias("alpha"),
        F.round("beta", 6).alias("beta"),
        F.round(
            (F.col("k") + F.col("alpha"))
            / (F.col("n") + F.col("alpha") + F.col("beta")),
            6,
        ).alias("eb_rate"),
    )


# Zelen & Severo 26.2.17 (Handbook of Mathematical Functions): the standard
# 5-term polynomial approximation of the normal CDF tail, |error| < 7.5e-8 —
# well inside the 6-dp oracle rounding.  Written in nested Horner form and
# mirrored CHARACTER-FOR-CHARACTER by the SQL twin so both engines evaluate
# the identical expression tree (the exact-moments-then-one-double-expression
# discipline extended to a transcendental).
_ZS_P = 0.2316419
_ZS_B = (0.319381530, -0.356563782, 1.781477937, -1.821255978, 1.330274429)
_INV_SQRT_2PI = 0.3989422804014327


def normal_p_two_sided(z: Column) -> Column:
    """Two-sided p-value of a standard-normal statistic: 2·(1−Φ(|z|))."""
    az = F.abs(z)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(_ZS_P) * az)
    b1, b2, b3, b4, b5 = (F.lit(b) for b in _ZS_B)
    poly = t * (b1 + t * (b2 + t * (b3 + t * (b4 + t * b5))))
    phi = F.lit(_INV_SQRT_2PI) * F.exp(-az * az / F.lit(2.0))
    return F.lit(2.0) * phi * poly


def group_welch_bh(
    df: DataFrame,
    group_col: str,
    user_col: str,
    val_col: Column,
    salt: str = "fdr",
    alpha: float = 0.05,
) -> DataFrame:
    """Per-group Welch z-tests between hash-assigned arms, corrected for
    multiple testing with Benjamini–Hochberg (1995) step-up FDR control —
    the guardrail a metrics platform needs the moment it tests more than
    one metric per experiment (per-group alpha=0.05 over m groups yields
    ~0.05·m false discoveries on A/A data; BH caps the EXPECTED false
    discovery RATE at alpha).

    ``val_col`` must be an integer-quantized Column (cents): every moment
    (n, Σx, Σx²) aggregates as exact BIGINT per (group, arm), so the z
    statistics are bit-deterministic; p-values come from
    :func:`normal_p_two_sided`.

    q_i = min_{j>=i}(p_(j)·m/j) via a reversed running min — the windows
    run over ONE ROW PER GROUP (the hypothesis list, bounded by the group
    domain, e.g. event types), never corpus rows.

    Degenerate arms (n<2 or zero variance) get NULL z/p and are EXCLUDED
    from m (BH is defined over computed p-values); their ``rejected`` is
    coalesced to false — the round-5 gate discipline (a NULL verdict is
    not a verdict).
    """
    arm = ab_assign(F.col(user_col).cast("string"), salt=salt)
    base = df.select(
        F.col(group_col).alias("g"), arm.alias("arm"), val_col.alias("v")
    )
    # ONE conditional aggregation straight to the wide per-group layout —
    # a groupBy+pivot costs a second shuffle of the cell table for the
    # same result (measured ~2x on the bench corpus)
    wide = base.groupBy("g").agg(
        *[
            agg.alias(f"{a}_{name}")
            for a in (0, 1)
            for name, agg in {
                "n": F.count(F.when(F.col("arm") == a, F.lit(1))),
                "s": F.sum(F.when(F.col("arm") == a, F.col("v"))),
                "ss": F.sum(F.when(F.col("arm") == a, F.col("v") * F.col("v"))),
            }.items()
        ]
    )

    def arm_stats(a: int):
        n = F.coalesce(F.col(f"{a}_n"), F.lit(0)).cast("double")
        s = F.coalesce(F.col(f"{a}_s"), F.lit(0)).cast("double")
        ss = F.coalesce(F.col(f"{a}_ss"), F.lit(0)).cast("double")
        mean = F.when(n > 0, s / n)
        var = F.when(n > 1, (n * ss - s * s) / (n * (n - F.lit(1.0))))
        return n, mean, var

    n0, m0, v0 = arm_stats(0)
    n1, m1, v1 = arm_stats(1)
    se = F.sqrt(v0 / n0 + v1 / n1)
    z = F.when(se > 0, (m1 - m0) / se)
    p = F.when(z.isNotNull(), normal_p_two_sided(z))
    scored = wide.select(
        F.col("g"),
        n0.cast("long").alias("n_a"),
        n1.cast("long").alias("n_b"),
        z.alias("z"),
        p.alias("p"),
    )
    # BH over the COMPUTED p-values only; windows span one row per group.
    # The rank keys on the 12dp-ROUNDED p (group tiebreak): p carries
    # exp()/summation-order ulp noise, and the BH rank feeds the rejection
    # threshold directly (round-7 ranked-cut discipline; 12dp >> ulp)
    w_rank = Window.orderBy(F.round(F.col("p"), 12), "g")
    w_m = Window.partitionBy()
    w_revmin = Window.orderBy(F.col("rank").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tested = (
        scored.filter(F.col("p").isNotNull())
        .withColumn("rank", F.row_number().over(w_rank))
        .withColumn("m", F.count(F.lit(1)).over(w_m))
        .withColumn(
            "q",
            F.least(
                F.min(F.col("p") * F.col("m") / F.col("rank")).over(w_revmin),
                F.lit(1.0),
            ),
        )
    )
    out = scored.join(tested.select("g", "q"), "g", "left")
    return out.select(
        F.col("g").alias(group_col),
        "n_a",
        "n_b",
        F.round("z", 6).alias("z"),
        F.round("p", 6).alias("p"),
        F.round("q", 6).alias("q_bh"),
        F.coalesce(F.col("q") <= F.lit(alpha), F.lit(False)).alias("rejected"),
    )


def kendall_tau_b(
    df: DataFrame, x_col: Column, y_col: Column
) -> DataFrame:
    """Exact Kendall τ-b between two INTEGER-QUANTIZED columns via the
    joint frequency table — the rank-correlation sibling of the Spearman
    query, with the tie corrections Spearman's midranks blur.

    The corpus collapses to one block per distinct (x, y) cell (one
    map-side-combinable groupBy — the value_blocks discipline applied in
    two dimensions); concordant/discordant pair MASSES then come from the
    block table's self-join on x1 < x2 (bounded by |X|·|Y| blocks², never
    corpus rows²).  All pair counts are exact BIGINTs:

        τ_b = (C − D) / sqrt((n0 − t_x)(n0 − t_y)),  n0 = n(n−1)/2

    with t_x/t_y the marginal tie-pair counts.  Returns one row.
    """
    blocks = (
        df.select(x_col.alias("x"), y_col.alias("y"))
        .groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    a, b = blocks.alias("a"), blocks.alias("b")
    pairs = a.join(b, F.col("a.x") < F.col("b.x")).select(
        (F.col("a.n") * F.col("b.n")).alias("m"),
        (F.col("a.y") < F.col("b.y")).alias("conc"),
        (F.col("a.y") > F.col("b.y")).alias("disc"),
    )
    cd = pairs.agg(
        F.sum(F.when(F.col("conc"), F.col("m")).otherwise(0)).alias("c"),
        F.sum(F.when(F.col("disc"), F.col("m")).otherwise(0)).alias("d"),
    )
    tx = (
        blocks.groupBy("x")
        .agg(F.sum("n").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("tx"))
    )
    ty = (
        blocks.groupBy("y")
        .agg(F.sum("n").alias("t"))
        .agg(F.sum(F.col("t") * (F.col("t") - 1) / 2).cast("long").alias("ty"))
    )
    tot = blocks.agg(F.sum("n").alias("n"))
    j = (
        cd.crossJoin(F.broadcast(tx))
        .crossJoin(F.broadcast(ty))
        .crossJoin(F.broadcast(tot))
    )
    n0 = (F.col("n") * (F.col("n") - 1) / 2).cast("long")
    den = F.sqrt(
        (n0 - F.col("tx")).cast("double") * (n0 - F.col("ty")).cast("double")
    )
    return j.select(
        F.col("n").cast("long").alias("n"),
        F.col("c").cast("long").alias("concordant"),
        F.col("d").cast("long").alias("discordant"),
        F.col("tx").alias("ties_x"),
        F.col("ty").alias("ties_y"),
        F.round(
            F.when(den > 0, (F.col("c") - F.col("d")).cast("double") / den), 6
        ).alias("tau_b"),
    )


def anova_oneway(df: DataFrame, group_col: str, val_col: Column) -> DataFrame:
    """One-way ANOVA over an INTEGER-QUANTIZED value column: between/within
    sums of squares from exact per-group BIGINT moments (n, Σx, Σx²), one
    double expression at the end — the events_did/CUPED readout shape.

    Degenerate inputs (k < 2 groups, or zero within-group variance) leave
    f_stat NULL rather than raising under ANSI division.
    """
    g = (
        df.select(F.col(group_col).alias("g"), val_col.alias("v"))
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v") * F.col("v")).alias("ss"),
        )
    )
    roll = g.agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n").alias("nn"),
        F.sum("s").alias("gs"),
        F.sum("ss").alias("gss"),
        F.sum(
            F.col("s").cast("double") * F.col("s").cast("double")
            / F.col("n").cast("double")
        ).alias("sb"),
    )
    nn = F.col("nn").cast("double")
    ssb = F.col("sb") - F.col("gs").cast("double") * F.col("gs").cast("double") / nn
    ssw = F.col("gss").cast("double") - F.col("sb")
    sst = ssb + ssw
    kd = F.col("k").cast("double")
    f = F.when(
        (F.col("k") > 1) & (F.col("nn") > F.col("k")) & (ssw > 0),
        (ssb / (kd - F.lit(1.0))) / (ssw / (nn - kd)),
    )
    return roll.select(
        F.col("k").cast("long").alias("k_groups"),
        F.col("nn").cast("long").alias("n"),
        F.round(ssb, 4).alias("ss_between"),
        F.round(ssw, 4).alias("ss_within"),
        F.round(f, 6).alias("f_stat"),
        F.round(F.when(sst > 0, ssb / sst), 6).alias("eta_sq"),
    )


def mann_kendall(df: DataFrame, group_col: str, t_col: Column, val_col: Column) -> DataFrame:
    """Per-group Mann–Kendall trend test (Mann 1945, Kendall 1975) over an
    integer time index and integer-quantized values — the SIGNIFICANCE
    companion of the Theil–Sen slope: S = Σ_{i<j} sign(x_j − x_i) over
    time-ordered pairs, with the tie-corrected variance

        Var(S) = [n(n−1)(2n+5) − Σ_p t_p(t_p−1)(2t_p+5)] / 18

    and the continuity-corrected z = (S∓1)/sqrt(Var).  The series
    collapses to one row per (group, t) — sums of duplicate timestamps
    are the caller's aggregation — so the pair join is bounded by the
    TIME DOMAIN squared per group (days² for a daily panel), never corpus
    rows.  All pair counts are exact BIGINTs; z is one double expression;
    ``trend`` coalesces to 'none' when Var is 0 (constant series — the
    definite-verdict gate discipline)."""
    pts = (
        df.select(F.col(group_col).alias("g"), t_col.alias("t"), val_col.alias("x"))
        .groupBy("g", "t")
        .agg(F.sum("x").cast("long").alias("x"))
    )
    a, b = pts.alias("a"), pts.alias("b")
    s_tab = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a.t") < F.col("b.t")))
        .groupBy(F.col("a.g").alias("g"))
        .agg(
            F.sum(F.signum(F.col("b.x") - F.col("a.x")).cast("long")).alias("s"),
        )
    )
    npts = pts.groupBy("g").agg(F.count(F.lit(1)).alias("n"))
    ties = (
        pts.groupBy("g", "x")
        .agg(F.count(F.lit(1)).alias("tp"))
        .groupBy("g")
        .agg(
            F.sum(
                F.col("tp") * (F.col("tp") - 1) * (2 * F.col("tp") + 5)
            ).alias("tie_term")
        )
    )
    j = s_tab.join(npts, "g").join(ties, "g")
    nn = F.col("n").cast("double")
    var_s = (
        nn * (nn - 1.0) * (2.0 * nn + 5.0) - F.col("tie_term").cast("double")
    ) / 18.0
    z = F.when(
        var_s > 0,
        F.when(F.col("s") > 0, (F.col("s").cast("double") - 1.0) / F.sqrt(var_s))
        .when(F.col("s") < 0, (F.col("s").cast("double") + 1.0) / F.sqrt(var_s))
        .otherwise(F.lit(0.0)),
    )
    return j.select(
        F.col("g").alias(group_col),
        F.col("n").cast("long").alias("n_points"),
        F.col("s").cast("long").alias("mk_s"),
        F.round(var_s, 4).alias("var_s"),
        F.round(z, 6).alias("z"),
        # NULL z (constant series) must read 'none', not fall through the
        # otherwise-chain into a direction verdict
        F.when(z.isNull() | (F.abs(z) <= 1.96), F.lit("none"))
        .when(F.col("s") > 0, F.lit("increasing"))
        .otherwise(F.lit("decreasing"))
        .alias("trend"),
    )


def power_mde(
    df: DataFrame,
    group_col: str,
    user_col: str,
    val_col: Column,
    salt: str = "fdr",
) -> DataFrame:
    """Per-group minimum detectable effect at alpha=0.05 (two-sided) /
    power=0.8 from the CURRENT arm sizes and pooled variance — the
    design-side companion of ab_test_ztest/group_welch_bh: before acting
    on a flat readout, a metrics platform must know whether the
    experiment could have detected anything ("no significant lift" on an
    MDE of 40% is silence, not evidence).

        mde_abs = (z_{0.975} + z_{0.8}) * sqrt(var_p * (1/n0 + 1/n1))

    with the constant folded to ONE literal (2.801585219) so neither
    engine sums the two quantiles separately, and var_p the pooled
    two-arm variance from exact BIGINT moments (the group_welch_bh
    one-pass conditional aggregation — the corpus appears in one
    groupBy; everything downstream is one row per group).

    ``val_col`` must be integer-quantized (cents).  Degenerate groups
    (an arm with n<2, zero pooled variance) report NULL mde columns —
    numeric not-evaluable, distinct from the boolean-gate discipline.

    Returns one row per group: (g, n_a, n_b, mean_v 6dp, sd_v 6dp,
    mde_abs 4dp, mde_rel 6dp when the mean is positive).
    """
    arm = ab_assign(F.col(user_col).cast("string"), salt=salt)
    base = df.select(
        F.col(group_col).alias("g"), arm.alias("arm"), val_col.alias("v")
    )
    wide = base.groupBy("g").agg(
        *[
            agg.alias(f"{a}_{name}")
            for a in (0, 1)
            for name, agg in {
                "n": F.count(F.when(F.col("arm") == a, F.lit(1))),
                "s": F.sum(F.when(F.col("arm") == a, F.col("v"))),
                "ss": F.sum(F.when(F.col("arm") == a, F.col("v") * F.col("v"))),
            }.items()
        ]
    )

    def arm_stats(a: int):
        n = F.coalesce(F.col(f"{a}_n"), F.lit(0)).cast("double")
        s = F.coalesce(F.col(f"{a}_s"), F.lit(0)).cast("double")
        ss = F.coalesce(F.col(f"{a}_ss"), F.lit(0)).cast("double")
        var = F.when(n > 1, (n * ss - s * s) / (n * (n - F.lit(1.0))))
        return n, s, var

    n0, s0, v0 = arm_stats(0)
    n1, s1, v1 = arm_stats(1)
    var_p = F.when(
        n0 + n1 > 2,
        ((n0 - 1) * v0 + (n1 - 1) * v1) / (n0 + n1 - F.lit(2.0)),
    )
    mean = F.when(n0 + n1 > 0, (s0 + s1) / (n0 + n1))
    mde = F.when(
        (var_p > 0) & (n0 > 1) & (n1 > 1),
        F.lit(2.801585219) * F.sqrt(var_p * (1 / n0 + 1 / n1)),
    )
    return wide.select(
        "g",
        n0.cast("long").alias("n_a"),
        n1.cast("long").alias("n_b"),
        F.round(mean, 6).alias("mean_v"),
        F.round(F.when(var_p > 0, F.sqrt(var_p)), 6).alias("sd_v"),
        F.round(mde, 4).alias("mde_abs"),
        F.round(F.when(mean > 0, mde / mean), 6).alias("mde_rel"),
    )
