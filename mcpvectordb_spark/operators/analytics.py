"""Product-analytics operators: ordered funnels and cohort retention.

Classic event-table OLAP shapes the reference never had (it is a retrieval
server) but any engine sitting on an events stream gets asked for.  Both
are pure keyed aggregations + joins — no windows over the full table, no
driver state — so they scale as a handful of user_id-keyed shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    within_s: int | None = None,
) -> DataFrame:
    """Strictly-ordered funnel: a user converts step i only with an event
    of type steps[i] strictly AFTER their step i-1 conversion time (first
    qualifying event wins).  Returns one row per step: (step, step_name,
    n_users), n_users non-increasing.

    ``within_s``: optional per-transition conversion window — step i must
    also land within ``within_s`` seconds of the step i-1 conversion time
    (the marketing "converted within an hour" variant).  The bound is
    inclusive, per transition, not cumulative from step 1.

    Scale shape: one user-keyed agg per step over only that step's events
    (filter pushes to the scan), chained through broadcast-friendly joins
    on the shrinking converted-user set.  len(steps) keyed aggs total —
    no per-user event-list materialization, no window over the raw table.
    """
    rows = []
    converted = None  # DataFrame[user, _t] — conversion time of prior step
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("_ts")
        )
        if converted is None:
            converted = ev.groupBy("user").agg(F.min("_ts").alias("_t"))
        else:
            gate = F.col("_ts") > F.col("_t")
            if within_s is not None:
                gate = gate & (
                    F.col("_ts") <= F.col("_t") + F.expr(f"INTERVAL {int(within_s)} SECONDS")
                )
            converted = (
                ev.join(converted, "user")
                .filter(gate)
                .groupBy("user")
                .agg(F.min("_ts").alias("_t"))
            )
        rows.append(
            converted.agg(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("step_name"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    events: DataFrame,
    horizons: list[int],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-cohort retention: users cohort on their first active day; for
    each horizon d, the cohort's retained count is users with ANY activity
    exactly d days after their cohort day.  Returns one row per cohort day
    with n_new and retained_d<h> columns.

    Scale shape: distinct (user, day) activity (one agg), first-day cohort
    (one agg), a user-keyed join, then one cohort-keyed agg with
    conditional counts — shuffle volume bounded by active user-days."""
    day = F.date_trunc("day", F.col(ts_col))
    activity = events.select(
        F.col(user_col).alias("user"), day.alias("day")
    ).distinct()
    cohorts = activity.groupBy("user").agg(F.min("day").alias("cohort_day"))
    joined = activity.join(cohorts, "user").withColumn(
        "age_days", F.datediff(F.col("day"), F.col("cohort_day"))
    )
    aggs = [F.count_distinct(F.when(F.col("age_days") == 0, F.col("user"))).cast("long").alias("n_new")]
    for h in horizons:
        aggs.append(
            F.count_distinct(F.when(F.col("age_days") == h, F.col("user")))
            .cast("long")
            .alias(f"retained_d{h}")
        )
    return joined.groupBy("cohort_day").agg(*aggs)


def assoc_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair_count: int = 2,
    top_n: int = 50,
    pairs: DataFrame | None = None,
) -> DataFrame:
    """Association rules from co-occurrence pairs (Agrawal & Srikant
    1994's measures over 2-itemsets): for each directed rule a -> b with
    pair count >= ``min_pair_count``,

        support    = n(a,b) / N            (N = distinct baskets)
        confidence = n(a,b) / n(a)
        lift       = confidence / (n(b) / N)

    Returns top_n rules by (lift desc, confidence desc, antecedent,
    consequent) — lift is pair-symmetric, so confidence is a real
    tiebreak, then ints give a total order.

    Scale shape: same inverted-index pair explode as the co-purchase
    top-n (bounded by items-per-basket², never catalog²); item counts are
    a broadcast; min_pair_count prunes the rule space before ranking.

    ``pairs``: a precomputed (pa < pb, n_pair >= min_pair_count) edge
    table — the session-shared co-purchase graph the clustering/graph
    suite already freezes — so the rule algebra reuses the mined edges
    instead of re-exploding the baskets.
    """
    items = baskets.select(
        F.col(basket_col).alias("o"), F.col(item_col).alias("p")
    ).distinct()
    n_baskets = F.broadcast(
        items.agg(F.countDistinct("o").cast("double").alias("__n"))
    )
    item_n = items.groupBy("p").agg(F.count(F.lit(1)).cast("long").alias("n_item"))

    if pairs is not None:
        pair_n = pairs.filter(F.col("n_pair") >= min_pair_count)
    else:
        a = items.select(F.col("o"), F.col("p").alias("pa"))
        b = items.select(F.col("o"), F.col("p").alias("pb"))
        pair_n = (
            a.join(b, "o")
            .filter(F.col("pa") < F.col("pb"))
            .groupBy("pa", "pb")
            .agg(F.count(F.lit(1)).cast("long").alias("n_pair"))
            .filter(F.col("n_pair") >= min_pair_count)
        )
    # both rule directions from the canonical pair
    directed = pair_n.select(
        F.col("pa").alias("antecedent"), F.col("pb").alias("consequent"), "n_pair"
    ).unionByName(
        pair_n.select(
            F.col("pb").alias("antecedent"), F.col("pa").alias("consequent"), "n_pair"
        )
    )
    rules = (
        directed.join(item_n.select(F.col("p").alias("antecedent"), F.col("n_item").alias("n_a")), "antecedent")
        .join(item_n.select(F.col("p").alias("consequent"), F.col("n_item").alias("n_b")), "consequent")
        .crossJoin(n_baskets)
        .select(
            "antecedent", "consequent", "n_pair",
            (F.col("n_pair") / F.col("__n")).alias("support"),
            (F.col("n_pair") / F.col("n_a")).alias("confidence"),
            (F.col("n_pair") * F.col("__n") / (F.col("n_a") * F.col("n_b"))).alias("lift"),
        )
    )
    return rules.orderBy(
        F.desc("lift"), F.desc("confidence"), F.asc("antecedent"), F.asc("consequent")
    ).limit(top_n)


def rfm_segments(
    orders: DataFrame,
    cust_col: str = "o_custkey",
    date_col: str = "o_orderdate",
    amount_col: str = "o_totalprice",
    n_tiles: int = 4,
) -> DataFrame:
    """RFM segmentation: quartile-score every customer on Recency (days
    before the corpus max order date), Frequency (order count) and
    Monetary (total spend), then roll up per (r, f, m) segment.

    Quartile assignment uses the broadcast-threshold discipline of
    curation.length_curriculum — NOT a global ntile window (which would
    be a single-partition sort over every customer): the n-1 discrete
    quantile thresholds per metric are one scalar aggregate row broadcast
    back, and bucket b = 1 + #(thresholds strictly below the value).
    Recency is days before the corpus max order date, and scores invert
    so 4 = most recent (marketing convention).

    Returns (r_score, f_score, m_score, n_customers, avg_monetary).

    Scale shape: one customer-keyed aggregation, one scalar threshold
    aggregate (broadcast), a map-side projection, and a ≤n_tiles³-row
    segment rollup — no global windows anywhere.
    """
    anchor = orders.agg(F.max(F.col(date_col)).alias("__anchor"))
    per_cust = (
        orders.crossJoin(F.broadcast(anchor))
        .groupBy(F.col(cust_col).alias("cust"))
        .agg(
            F.min(F.datediff(F.col("__anchor"), F.col(date_col))).alias("rec_days"),
            F.count(F.lit(1)).cast("long").alias("freq"),
            # cents-rounded: spend is 2-dp money, and rounding removes the
            # float-summation-order ulp that would make strict threshold
            # comparisons engine-dependent
            F.round(F.sum(F.col(amount_col)), 2).alias("monetary"),
        )
    )
    qs = [i / n_tiles for i in range(1, n_tiles)]
    thresholds = per_cust.agg(
        *[
            F.expr(f"percentile_disc({q}) WITHIN GROUP (ORDER BY {m})").alias(f"_{m}{i}")
            for m in ("rec_days", "freq", "monetary")
            for i, q in enumerate(qs)
        ]
    )

    def bucket(col: str, prefix: str):
        b = F.lit(1)
        for i in range(len(qs)):
            b = b + F.when(F.col(col) > F.col(f"_{prefix}{i}"), 1).otherwise(0)
        return b.cast("int")

    scored = per_cust.crossJoin(F.broadcast(thresholds)).select(
        "cust", "monetary",
        (F.lit(n_tiles + 1) - bucket("rec_days", "rec_days")).alias("r_score"),
        bucket("freq", "freq").alias("f_score"),
        bucket("monetary", "monetary").alias("m_score"),
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_customers"),
            F.avg("monetary").alias("avg_monetary"),
        )
    )


def funnel_latency(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-transition conversion latency: for each step i >= 2, the
    distribution of (conversion time at step i − conversion time at step
    i-1) over converting users, in whole epoch seconds (floor on both
    ends so the arithmetic is exact integers — engine-portable).

    Returns (step, step_name, n_users, p50_s, p90_s) per transition.

    Scale shape: funnel_counts' chain of shrinking user-keyed aggs, plus
    one scalar percentile aggregate per transition over the converting
    users only — never a window over the raw event table.
    """
    out = None
    converted = None  # (user, _t epoch-seconds of this step's conversion)
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"),
            F.floor(F.col(ts_col).cast("double")).cast("long").alias("_ts"),
        )
        if converted is None:
            converted = ev.groupBy("user").agg(F.min("_ts").alias("_t"))
            continue
        trans = (
            ev.join(converted, "user")
            .filter(F.col("_ts") > F.col("_t"))
            .groupBy("user")
            .agg(F.min("_ts").alias("_t2"), F.first("_t").alias("_tp"))
        )
        stats = trans.select((F.col("_t2") - F.col("_tp")).alias("lat")).agg(
            F.lit(i + 1).alias("step"),
            F.lit(step).alias("step_name"),
            F.count(F.lit(1)).cast("long").alias("n_users"),
            F.round(F.expr("percentile(lat, 0.5)"), 4).alias("p50_s"),
            F.round(F.expr("percentile(lat, 0.9)"), 4).alias("p90_s"),
        )
        out = stats if out is None else out.unionByName(stats)
        converted = trans.select("user", F.col("_t2").alias("_t"))
    return out


def last_touch_attribution(
    events: DataFrame,
    conversion_type: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    lookback_s: int = 7 * 86400,
) -> DataFrame:
    """Last-touch marketing attribution: each conversion event's value is
    attributed to the user's most recent PRIOR non-conversion event (the
    "touch channel") within ``lookback_s`` seconds; conversions with no
    qualifying touch are attributed to the 'direct' channel.

    Returns one row per conversion: (user, conv_id, channel, value).

    Ordering is (epoch second, event id) — second granularity keeps the
    engine-portable timestamp convention, the id tiebreak makes same-second
    sequences deterministic.  One window over (user, time): no joins, no
    per-conversion scans — the touch lookup rides the same sort the
    sessionizer uses, so a 100 TB event table pays one user-keyed shuffle.
    """
    from pyspark.sql import Window

    sec = F.unix_timestamp(ts_col)
    base = events.select(
        F.col(user_col).alias("user"),
        F.col(id_col).alias("eid"),
        sec.alias("t"),
        F.col(type_col).alias("etype"),
        F.col(value_col).alias("v"),
    )
    w = (
        Window.partitionBy("user")
        .orderBy(F.col("t").asc(), F.col("eid").asc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    is_touch = F.col("etype") != conversion_type
    touched = base.withColumn(
        "touch_type", F.last(F.when(is_touch, F.col("etype")), ignorenulls=True).over(w)
    ).withColumn(
        "touch_t", F.last(F.when(is_touch, F.col("t")), ignorenulls=True).over(w)
    )
    conv = touched.filter(F.col("etype") == conversion_type)
    channel = F.when(
        F.col("touch_type").isNotNull()
        & (F.col("t") - F.col("touch_t") <= lookback_s),
        F.col("touch_type"),
    ).otherwise(F.lit("direct"))
    return conv.select(
        "user", F.col("eid").alias("conv_id"), channel.alias("channel"), "v"
    )


def item_item_cosine(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_cooc: int = 2,
    max_basket: int = 50,
) -> DataFrame:
    """Item-item collaborative filtering over co-occurrence baskets
    (Sarwar et al., WWW 2001 / Amazon item-to-item): ``cos(a,b) =
    cooc(a,b) / sqrt(n_a · n_b)`` where cooc counts baskets containing
    both items and n_i counts baskets containing i.

    Returns (item_a < item_b, cooc, cos).  The reference has no
    recommender surface; this is the events/orders-side sibling of the
    embedding KNN family.

    Scale: the pair build is the within-basket self-join — fanout is
    basket_size² per basket, bounded by ``max_basket`` (oversized baskets
    are dropped WHOLE, mirroring production co-occurrence pipelines where
    a 10k-item basket is noise).  n_i counts are taken on the FILTERED
    baskets so the cosine stays a true cosine of the mined space.  Two
    keyed shuffles (basket sizes, pair agg) + one broadcast-sized item
    count join at typical cardinalities.
    """
    b = baskets.select(
        F.col(basket_col).alias("bk"), F.col(item_col).alias("it")
    ).distinct()
    ok = b.groupBy("bk").agg(F.count(F.lit(1)).alias("bs")).filter(
        F.col("bs") <= max_basket
    )
    # pinned: referenced three times (both self-join sides + item counts);
    # without it each reference replays the distinct + size filter
    b = b.join(ok.select("bk"), "bk").localCheckpoint(eager=False)
    n = b.groupBy("it").agg(F.count(F.lit(1)).alias("n"))

    pairs = (
        b.alias("a")
        .join(
            b.alias("b"),
            (F.col("a.bk") == F.col("b.bk")) & (F.col("a.it") < F.col("b.it")),
        )
        .groupBy(F.col("a.it").alias("item_a"), F.col("b.it").alias("item_b"))
        .agg(F.count(F.lit(1)).alias("cooc"))
        .filter(F.col("cooc") >= min_cooc)
    )
    return (
        pairs.join(n.select(F.col("it").alias("item_a"), F.col("n").alias("na")), "item_a")
        .join(n.select(F.col("it").alias("item_b"), F.col("n").alias("nb")), "item_b")
        .select(
            "item_a", "item_b", "cooc",
            (F.col("cooc") / F.sqrt(F.col("na") * F.col("nb"))).alias("cos"),
        )
    )


def markov_removal_attribution(
    events: DataFrame,
    conv_value: str = "purchase",
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    tiebreak_col: str = "event_id",
    squarings: int = 6,
) -> DataFrame:
    """Markov-chain removal-effect attribution (Anderl et al. 2014): which
    channels actually drive conversion, by how much conversion probability
    drops when each channel is deleted from the journey graph.

    Journey model: per user, events ordered by (ts, tiebreak) up to (not
    including) the FIRST ``conv_value`` event; the user converts iff that
    event exists.  States are '(start)', each observed channel, and the
    absorbing '(conv)'/'(null)'.  Removing channel c maps every
    transition INTO c to '(null)' and drops transitions out of c — the
    standard "replace the node with the null state" construction.

    Scale shape: the only corpus-sized work is the journey window + one
    (src, dst) count aggregation; everything after operates on the tiny
    (removal, src, dst) matrix (|channels|+1 chains x <=
    (|channels|+3)^2 cells).  Absorption probabilities come from
    ``squarings`` matrix squarings — P^(2^k), so 6 squarings give the
    exact 64-step mass, log-depth instead of 64 chained iterations; each
    chain's matrix is densified to ONE row holding a K×K array over the
    global state list, so the squarings are map-only array expressions
    (one groupBy shuffle total) instead of per-squaring self-join +
    re-aggregation jobs (r9).

    Returns one row per channel: (channel, p_conv_full, p_conv_removed,
    removal_effect, attribution) where attribution is the effect
    normalized over channels (NULL when every effect is 0).
    """
    from pyspark.sql import Window

    # r10: pin o and fp — profiled at sf0.1, the events scan + journey
    # window replayed THREE times per execution (fp's broadcast build for
    # the j join, j's probe side, and starts' second read of fp; broadcast
    # exchanges never reuse another exchange's subtree).  Pinning the
    # windowed journey table once makes every consumer read the
    # materialized rows — the §5 pin-pays case (a window over the corpus).
    o = events.select(
        F.col(user_col).alias("u"),
        F.col(type_col).alias("t"),
        F.row_number()
        .over(Window.partitionBy(user_col).orderBy(ts_col, tiebreak_col))
        .alias("rn"),
    ).localCheckpoint(eager=False)
    fp = o.groupBy("u").agg(
        F.min(F.when(F.col("t") == conv_value, F.col("rn"))).alias("fp")
    ).localCheckpoint(eager=False)
    j = (
        o.join(fp, "u")
        .filter(F.col("fp").isNull() | (F.col("rn") < F.col("fp")))
        .localCheckpoint(eager=False)
    )
    term = lambda c: F.when(c.isNotNull(), F.lit("(conv)")).otherwise(F.lit("(null)"))  # noqa: E731

    wj = Window.partitionBy("u").orderBy("rn")
    t1 = j.select(
        F.col("t").alias("src"),
        F.coalesce(F.lead("t").over(wj), term(F.col("fp"))).alias("dst"),
    )
    firsts = (
        j.withColumn("rn2", F.row_number().over(wj))
        .filter(F.col("rn2") == 1)
        .select("u", F.col("t").alias("ft"))
    )
    starts = (
        fp.join(firsts, "u", "left")
        .select(F.lit("(start)").alias("src"), F.coalesce("ft", term(F.col("fp"))).alias("dst"))
    )
    cnt = t1.unionByName(starts).groupBy("src", "dst").agg(F.count(F.lit(1)).alias("c"))

    # r10 optimization (guide §1.2 / r9 verdict item 3 — fuse the
    # squarings into one job): the r9 shape still ran ~29 driver jobs per
    # execution (a driver collect of the event-type enum, two lazy pins,
    # the removal-mapping crossJoin + re-aggregation shuffle, the dense
    # groupBy, a broadcast and a final window — each a job or an AQE stage
    # job).  Everything downstream of `cnt` is enum-bounded
    # ((|channels|+1) chains × (|channels|+3)² cells), so the WHOLE tail
    # now folds into ONE global aggregation row: cnt collapses via
    # collect_list, the state list derives from the cells themselves
    # (sorted distinct src∪dst minus the specials — every channel appears
    # as a src, so this equals the old driver-collected enum restricted to
    # channels actually in journeys; dropped states only ever held
    # all-zero rows/columns whose squaring contributions were exact +0.0
    # terms), and the removal mapping, all `squarings` squarings, the
    # absorption readout and the attribution normalization are map-only
    # array expressions over that one row.  No driver collect, no pins,
    # no per-chain shuffle — one groupBy + one global agg total.
    # Value identity: dense counts are exact longs, p = c/tt divides the
    # same two integers, the redirected '(null)' merge adds the same two
    # floats (2-term sums are order-free), the squaring fold runs in the
    # same ascending-k order over the same sorted state list, and the
    # attribution sum is covered by the caller's 6-decimal rounding
    # (exactly like the r9 dense rewrite's precedent).
    one = cnt.groupBy().agg(F.collect_list(F.struct("src", "dst", "c")).alias("cells"))
    specials = F.array(F.lit("(start)"), F.lit("(conv)"), F.lit("(null)"))
    chs_expr = F.array_sort(
        F.array_distinct(
            F.filter(
                F.concat(
                    F.transform("cells", lambda c: c["src"]),
                    F.transform("cells", lambda c: c["dst"]),
                ),
                lambda s: ~F.array_contains(specials, s),
            )
        )
    )
    b = one.select("cells", chs_expr.alias("chs"))
    b = b.select("cells", "chs", F.concat("chs", specials).alias("sts"))

    kk = F.size("sts")
    # dense integer transition counts: cm[i*K + j] = c (int keys/indexes —
    # array element_at requires ints, and K² is enum-bounded)
    cellmap = F.map_from_entries(
        F.transform(
            "cells",
            lambda c: F.struct(
                (
                    (F.array_position(F.col("sts"), c["src"]) - 1).cast("int") * kk
                    + (F.array_position(F.col("sts"), c["dst"]) - 1).cast("int")
                ).alias("k"),
                c["c"].alias("v"),
            ),
        )
    )
    b = b.select("chs", "sts", cellmap.alias("cm"))
    cnts = F.transform(
        F.sequence(F.lit(0), kk * kk - 1),
        lambda x: F.coalesce(F.element_at(F.col("cm"), x), F.lit(0).cast("long")),
    )
    b = b.select("chs", "sts", cnts.alias("cnts"))
    # exact long row sums, then p[i,j] = c/tt (the same two integers the
    # sparse join divided)
    tt = F.transform(
        F.sequence(F.lit(0), kk - 1),
        lambda i: F.aggregate(
            F.sequence(F.lit(0), kk - 1),
            F.lit(0).cast("long"),
            lambda acc, jj: acc + F.element_at(F.col("cnts"), i * kk + jj + 1),
        ),
    )
    b = b.select("chs", "sts", "cnts", tt.alias("tt"))
    pmat = F.transform(
        F.sequence(F.lit(0), kk * kk - 1),
        lambda x: F.when(
            F.element_at(F.col("cnts"), x + 1) > 0,
            F.element_at(F.col("cnts"), x + 1)
            / F.element_at(F.col("tt"), ((x - x % kk) / kk).cast("int") + 1),
        ).otherwise(F.lit(0.0)),
    )
    b = b.select("chs", "sts", pmat.alias("p"))

    # per-chain removal matrices over r = 0..nch (r == nch is '(none)'):
    # row r zeroed, column r redirected into '(null)', absorbing states on
    # the diagonal — the same construction the sparse crossJoin applied
    nch = F.size("chs")

    def _cell(r, x):
        i = ((x - x % kk) / kk).cast("int")
        jj = x % kk
        null_i, conv_i = kk - 1, kk - 2
        v = F.element_at(F.col("p"), x + 1)
        return (
            F.when(((i == conv_i) & (jj == conv_i)) | ((i == null_i) & (jj == null_i)), F.lit(1.0))
            .when((r < nch) & (i == r), F.lit(0.0))
            .when((r < nch) & (jj == r), F.lit(0.0))
            .when(
                jj == null_i,
                v
                + F.when(r < nch, F.element_at(F.col("p"), i * kk + r + 1)).otherwise(
                    F.lit(0.0)
                ),
            )
            .otherwise(v)
        )

    mats = F.transform(
        F.sequence(F.lit(0), nch),
        lambda r: F.transform(
            F.sequence(F.lit(0), kk * kk - 1),
            lambda x: _cell(r, x),
        ),
    )
    b = b.select("chs", "sts", mats.alias("mats"))

    def _square(a):
        return F.transform(
            F.sequence(F.lit(0), kk * kk - 1),
            lambda x: F.aggregate(
                F.sequence(F.lit(0), kk - 1),
                F.lit(0.0),
                lambda acc, z: acc
                + F.element_at(a, (x - x % kk) + z + 1)
                * F.element_at(a, z * kk + (x % kk) + 1),
            ),
        )

    for _ in range(squarings):
        b = b.select(
            "chs", "sts", F.transform("mats", lambda m: _square(m)).alias("mats")
        )

    # absorption readout: start → conv after 2^squarings steps, per chain
    pc = F.transform(
        "mats",
        lambda m: F.element_at(m, (kk - 3) * kk + (kk - 2) + 1),
    )
    b = b.select("chs", pc.alias("pc"))
    b = b.select("chs", "pc", F.element_at("pc", F.size("chs") + 1).alias("full"))
    re_arr = F.transform(
        F.slice("pc", 1, F.size("chs")),
        lambda x: F.when(F.col("full") > 0, F.lit(1.0) - x / F.col("full")),
    )
    b = b.select("chs", "pc", "full", re_arr.alias("re"))
    sre = F.aggregate("re", F.lit(0.0), lambda acc, x: acc + x)
    return (
        b.select(
            F.posexplode("chs").alias("ix0", "channel"), "pc", "full", "re", sre.alias("sre")
        )
        .select(
            "channel",
            F.col("full").alias("p_conv_full"),
            F.element_at("pc", F.col("ix0") + 1).alias("p_conv_removed"),
            F.element_at("re", F.col("ix0") + 1).alias("removal_effect"),
            F.when(
                F.col("sre") > 0, F.element_at("re", F.col("ix0") + 1) / F.col("sre")
            ).alias("attribution"),
        )
    )


def ushaped_attribution(
    events: DataFrame,
    conversion_type: str = "purchase",
    window_days: int = 7,
) -> DataFrame:
    """Position-based (U-shaped / 40-20-40) multi-touch attribution —
    the middle ground between last-touch (all credit to the final
    touch) and Markov removal effects (model-based): each conversion's
    value splits 40% to the FIRST touch, 40% to the LAST, and 20%
    spread evenly over the middle touches of the user's journey inside
    the attribution window; 1-touch journeys take 100%, 2-touch
    journeys 50/50, touchless conversions credit 'direct'.

    Plan: conversions equi-join the user's prior touches (user-keyed
    shuffle, range predicate filters to the window), one window per
    conversion ranks touches (ties (t, event_id)), credits are a codegen
    CASE — no per-conversion collect, no journey strings.  Returns one
    row per (conversion, touch) with the credit weight and value share;
    roll up by `channel` for the report.
    """
    base = events.select(
        F.col("user_id").alias("u"),
        F.col("event_id").alias("eid"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("t"),
        F.col("event_type").alias("etype"),
        F.col("value").alias("v"),
    )
    conv = base.filter(F.col("etype") == conversion_type).select(
        "u", F.col("eid").alias("ceid"), F.col("t").alias("ct"), "v"
    )
    touch = base.filter(F.col("etype") != conversion_type).select(
        "u", F.col("eid").alias("teid"), F.col("t").alias("tt"),
        F.col("etype").alias("channel"),
    )
    win = int(window_days) * 86400
    # window predicate INSIDE the left join: a conversion whose only
    # touches fall outside the window must keep its NULL row (-> direct),
    # not vanish in a post-join filter
    j = conv.join(
        touch,
        (conv["u"] == touch["u"])
        & (F.col("tt") < F.col("ct"))
        & (F.col("ct") - F.col("tt") <= win),
        "left",
    ).drop(touch["u"])
    wdesc = Window.partitionBy("u", "ceid").orderBy(
        F.col("tt").asc(), F.col("teid").asc()
    )
    ranked = j.select(
        "u", "ceid", "ct", "v",
        F.coalesce(F.col("channel"), F.lit("direct")).alias("channel"),
        F.when(F.col("teid").isNotNull(), F.row_number().over(wdesc)).alias("rk"),
        F.when(
            F.col("teid").isNotNull(),
            F.count(F.lit(1)).over(Window.partitionBy("u", "ceid")),
        ).alias("nt"),
    )
    w = (
        F.when(F.col("rk").isNull(), F.lit(1.0))
        .when(F.col("nt") == 1, F.lit(1.0))
        .when(F.col("nt") == 2, F.lit(0.5))
        .when((F.col("rk") == 1) | (F.col("rk") == F.col("nt")), F.lit(0.4))
        .otherwise(F.lit(0.2) / (F.col("nt").cast("double") - 2))
    )
    return ranked.select(
        "u",
        "ceid",
        "channel",
        F.coalesce("nt", F.lit(0)).cast("long").alias("n_touches"),
        w.alias("credit"),
        (w * F.col("v")).alias("credited_value"),
    )


def shapley_attribution(
    events: DataFrame,
    channels: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    conversion: str = "purchase",
) -> DataFrame:
    """Exact Shapley-value channel attribution (Shapley 1953, applied to
    marketing touch data as in Dalessandro et al. 2012): the conversion
    credit of channel i is its average marginal contribution across all
    orderings of the channel set,

        phi_i = sum_{S subseteq C\\{i}}  |S|!(k-1-|S|)!/k! * (v(S+i) - v(S))

    with the coalition value v(S) = number of converted users whose
    touched-channel set is contained in S ("conversions reachable using
    only the channels in S").  The axiomatic sibling of the heuristic
    U-shaped credit and the Markov removal effect already in this module:
    efficiency guarantees sum_i phi_i = v(C) - v(empty) exactly.

    Exactness discipline: user journeys collapse to at most 2^k mask
    blocks (k = len(channels), a bounded enum domain), v is a BIGINT
    subset-sum over those blocks, and phi's numerator is the BIGINT
    sum_S |S|!(k-1-|S|)! * (v(S+i)-v(S)) — only the final division by k!
    is floating point, so both engines agree bit-for-bit at any corpus
    size (the lineitem_kendall block discipline applied to coalitions).

    Scale shape: ONE user-keyed agg over the corpus; everything after
    runs on <= 2^k-row tables joined broadcast-style.  k is capped at 12
    (4096 coalitions) — channel taxonomies are enum-sized by design.

    Returns one row per channel: (channel, shapley_num BIGINT — the exact
    k!-scaled numerator, shapley = num/k!, share = num/sum(num), both
    rounded 6dp; share coalesces to 0.0 when no conversions separate the
    coalitions so downstream gates always see a definite number).
    """
    import math

    k = len(channels)
    if not 1 <= k <= 12:
        raise ValueError(f"channels must have 1..12 entries, got {k}")
    spark = events.sparkSession

    per_user = events.groupBy(user_col).agg(
        *[
            F.max((F.col(type_col) == c).cast("int")).alias(f"__b{i}")
            for i, c in enumerate(channels)
        ],
        F.max((F.col(type_col) == conversion).cast("int")).alias("__conv"),
    )
    mask = F.lit(0).cast("long")
    for i in range(k):
        mask = mask + F.col(f"__b{i}").cast("long") * F.lit(1 << i)
    # pin the <= 2^k-row block table: four downstream consumers (v twice,
    # the numerator, the share total) would otherwise each re-scan the
    # corpus — after this checkpoint the corpus appears in EXACTLY one
    # groupBy regardless of how the coalition algebra fans out
    blocks = (
        per_user.select(mask.alias("mask"), "__conv")
        .groupBy("mask")
        .agg(F.sum("__conv").cast("long").alias("c"))
        .localCheckpoint(eager=True)
    )
    # v(S) by exploding each mask block to its supersets (every join below
    # is an equi-join or a 1-row scalar broadcast — no nested loops; the
    # explode fan-out is <= 3^k rows total, a constant):
    # S = mask | t over all submasks t of the complement of mask
    sup = blocks.select(
        "c",
        F.explode(
            F.expr(
                f"filter(sequence(CAST(0 AS BIGINT), {(1 << k) - 1}),"
                " t -> (t & mask) = 0)"
            )
        ).alias("t"),
        F.col("mask"),
    ).select((F.col("mask") + F.col("t")).alias("s"), "c")
    coal = spark.range(1 << k).select(F.col("id").cast("long").alias("s"))
    v = (
        coal.join(sup.groupBy("s").agg(F.sum("c").alias("vc")), "s", "left")
        .select("s", F.coalesce(F.col("vc"), F.lit(0)).cast("long").alias("v"))
    )

    ch = spark.createDataFrame(
        [(i, c) for i, c in enumerate(channels)], "i long, channel string"
    )
    popcount = " + ".join(f"((s >> {j}) & 1)" for j in range(k))
    expr = None
    for s_size in range(k):
        w = math.factorial(s_size) * math.factorial(k - 1 - s_size)
        cond = F.expr(popcount) == F.lit(s_size)
        expr = F.when(cond, F.lit(w)) if expr is None else expr.when(cond, F.lit(w))
    wnum = expr.cast("long")

    pairs = (
        v.withColumn(
            "i",
            F.explode(
                F.expr(
                    f"filter(sequence(CAST(0 AS BIGINT), {k - 1}),"
                    " i -> ((s >> i) & 1) = 0)"
                )
            ),
        )
        .withColumn("wnum", wnum)
        .withColumn("s2", F.expr("s | (CAST(1 AS BIGINT) << i)"))
        .join(F.broadcast(ch), "i")
        .join(
            F.broadcast(v.select(F.col("s").alias("s2"), F.col("v").alias("v2"))),
            "s2",
        )
    )
    num = pairs.groupBy("channel").agg(
        F.sum(F.col("wnum") * (F.col("v2") - F.col("v"))).cast("long").alias("num")
    )
    tot = num.agg(F.sum("num").cast("long").alias("__tot"))
    kfact = float(math.factorial(k))
    return (
        num.crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("num").alias("shapley_num"),
            F.round(F.col("num") / F.lit(kfact), 6).alias("shapley"),
            F.round(
                F.coalesce(
                    F.when(
                        F.col("__tot") != 0,
                        F.col("num").cast("double") / F.col("__tot").cast("double"),
                    ),
                    F.lit(0.0),
                ),
                6,
            ).alias("share"),
        )
        .orderBy("channel")
    )
