"""Binary-classifier evaluation metrics as pure DataFrame aggregations —
the "did the quality/language filter actually work" step of a curation
pipeline (ROC-AUC, Brier score, log-loss, expected calibration error, and
a reliability table), companion to the trainers in operators/mlr.py and
operators/classify.py.

Reference scope: the reference engine (skapoula/mcpvectordb) has no model
evaluation surface; this extends the training-data-pipeline family the
same way operators/curation.py extends its ingest surface.

Determinism / oracle strategy: probabilities are quantized to a fixed
integer grid (``round(p * quant)`` as BIGINT) before ANY ranking or
binning, so tie blocks, histogram bins, and clamps are bit-exact across
engines — the same integral-metric trick as the Mann-Whitney gate
(operators/stats.py).  AUC uses the midrank (tie-corrected) Mann-Whitney
identity AUC = (R+ - n+(n+1)/2) / (n+ * n-), computed from per-value
blocks, never per-row ranks.

Scale shape: one groupBy on the quantized probability (domain bounded by
``quant`` + 1 distinct values, so the shuffle is tiny regardless of corpus
size), then a single-partition window over those <= quant+1 blocks for the
cumulative rank — O(quant) rows through the window, NOT O(corpus); lower
``quant`` if the probability grid must shrink further.  Losses and ECE are
map-side-combinable aggregations over the same block table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.blocks import value_blocks

# Resolution of the probability grid: p is snapped to multiples of
# 1/QUANT before ranking/binning so Spark and any SQL replay agree on tie
# structure bit-exactly.
QUANT = 1_000_000


def _prob_blocks(scored: DataFrame, label_col: str, prob_col: str) -> DataFrame:
    """(pq, cnt, pos): per quantized-probability value, total rows and
    positive-label rows.  This is the only corpus-sized pass; the QUANT
    grid keeps the block table under value_blocks' in-plan bound."""
    return value_blocks(
        scored,
        prob_col,
        scale=QUANT,
        val_alias="pq",
        counters={
            "cnt": F.count(F.lit(1)).cast("long"),
            "pos": F.sum(F.col(label_col).cast("double")),
        },
    )


def binary_eval(
    scored: DataFrame,
    label_col: str = "y",
    prob_col: str = "p",
    n_bins: int = 10,
) -> DataFrame:
    """One-row evaluation of a binary classifier from (label, probability)
    rows: n, n_pos, midrank ROC-AUC, Brier score, clamped log-loss, and
    ECE over ``n_bins`` equal-width confidence bins.

    All metrics are exact over the quantized probability grid; log-loss
    clamps the INTEGER grid value to [1, QUANT-1] (never the float), so
    the clamp is engine-independent.
    """
    blocks = _prob_blocks(scored, label_col, prob_col)

    w = Window.orderBy("pq").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = blocks.withColumn("cum", F.sum("cnt").over(w))
    midrank = F.col("cum") - F.col("cnt") + (F.col("cnt") + F.lit(1)) / F.lit(2.0)
    pq_c = F.least(F.greatest(F.col("pq"), F.lit(1)), F.lit(QUANT - 1))
    pc = pq_c / F.lit(float(QUANT))
    p = F.col("pq") / F.lit(float(QUANT))
    neg = F.col("cnt") - F.col("pos")

    stats = ranked.agg(
        F.sum("cnt").alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("pos") * midrank).alias("r_pos"),
        F.sum(F.col("pos") * (p - F.lit(1.0)) * (p - F.lit(1.0)) + neg * p * p).alias("brier_sum"),
        F.sum(-(F.col("pos") * F.log(pc) + neg * F.log(F.lit(1.0) - pc))).alias("ll_sum"),
    )

    bins = (
        blocks.groupBy(
            F.least(F.expr(f"pq * {n_bins} div {QUANT}"), F.lit(n_bins - 1)).alias("bin")
        )
        .agg(
            F.sum("cnt").alias("nb"),
            F.sum(F.col("cnt") * p).alias("conf_sum"),
            F.sum("pos").alias("pos_sum"),
        )
        .agg(
            (
                F.sum(F.col("nb") * F.abs(F.col("pos_sum") / F.col("nb") - F.col("conf_sum") / F.col("nb")))
                / F.sum("nb")
            ).alias("ece")
        )
    )

    n_neg = F.col("n") - F.col("n_pos")
    den = F.col("n_pos") * n_neg
    auc = F.when(
        den > 0,
        (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + F.lit(1.0)) / F.lit(2.0)) / den,
    )
    return (
        stats.crossJoin(F.broadcast(bins))
        .select(
            F.col("n").cast("long").alias("n"),
            F.col("n_pos").cast("long").alias("n_pos"),
            auc.alias("auc"),
            (F.col("brier_sum") / F.col("n")).alias("brier"),
            (F.col("ll_sum") / F.col("n")).alias("logloss"),
            F.col("ece"),
        )
    )


def reliability_table(
    scored: DataFrame,
    label_col: str = "y",
    prob_col: str = "p",
    n_bins: int = 10,
) -> DataFrame:
    """Per-confidence-bin reliability diagram rows: (bin, n_docs,
    avg_conf, frac_pos).  Equal-width bins on the quantized grid; bin
    edges are integer arithmetic so engines agree exactly."""
    blocks = _prob_blocks(scored, label_col, prob_col)
    p = F.col("pq") / F.lit(float(QUANT))
    return (
        blocks.groupBy(
            F.least(F.expr(f"pq * {n_bins} div {QUANT}"), F.lit(n_bins - 1)).alias("bin")
        )
        .agg(
            F.sum("cnt").cast("long").alias("n_docs"),
            (F.sum(F.col("cnt") * p) / F.sum("cnt")).alias("avg_conf"),
            (F.sum("pos") / F.sum("cnt")).alias("frac_pos"),
        )
    )


def feature_auc(df, features, label_col):
    """Univariate feature screening: midrank ROC-AUC of each candidate
    feature against a binary label — the filter-method ranking step before
    training a quality classifier (which features even separate the
    classes?).  AUC is invariant under monotone transforms, so callers
    should pass RAW engine-exact expressions (lengths, count ratios) and
    skip log/standardization noise.

    ``features``: list of (name, Column) pairs.  Returns one row per
    feature: (feature, n, n_pos, auc).

    Scale shape: the unpivot multiplies rows by |features| map-side (no
    shuffle), then the same quantized-block discipline as binary_eval —
    one groupBy on (feature, vq) and a rank window PARTITIONED BY
    feature, so each feature's cumulative scan parallelizes
    independently and is bounded by the 1e-6 grid."""
    pairs = F.explode(
        F.array(
            *[
                F.struct(F.lit(n).alias("feature"), v.cast("double").alias("v"))
                for n, v in features
            ]
        )
    ).alias("fv")
    base = df.select(F.col(label_col).cast("double").alias("y"), pairs).select(
        F.col("fv.feature").alias("feature"),
        F.round(F.col("fv.v") * QUANT).cast("long").alias("vq"),
        "y",
    )
    blocks = base.groupBy("feature", "vq").agg(
        F.count(F.lit(1)).cast("long").alias("cnt"), F.sum("y").alias("pos")
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("vq")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    midrank = F.col("cum") - F.col("cnt") + (F.col("cnt") + F.lit(1)) / F.lit(2.0)
    per = (
        blocks.withColumn("cum", F.sum("cnt").over(w))
        .groupBy("feature")
        .agg(
            F.sum("cnt").alias("n"),
            F.sum("pos").alias("n_pos"),
            F.sum(F.col("pos") * midrank).alias("r_pos"),
        )
    )
    den = F.col("n_pos") * (F.col("n") - F.col("n_pos"))
    auc = F.when(
        den > 0,
        (F.col("r_pos") - F.col("n_pos") * (F.col("n_pos") + F.lit(1.0)) / F.lit(2.0)) / den,
    )
    return per.select(
        "feature",
        F.col("n").cast("long").alias("n"),
        F.col("n_pos").cast("long").alias("n_pos"),
        auc.alias("auc"),
    )


def pr_curve(
    scored: DataFrame,
    label_col: str = "y",
    prob_col: str = "p",
    levels: int = 11,
) -> DataFrame:
    """Precision-recall summary of a binary classifier: tie-aware average
    precision plus the classic ``levels``-point interpolated PR curve
    (TREC style — for each recall level r, the max precision over all
    thresholds whose recall reaches r).

    AP follows the step-function identity AP = sum_t (dR_t * P_t) over
    DISTINCT quantized thresholds t descending, which with per-value
    blocks is sum(pos_t * cumP_t / cumN_t) / n_pos — no per-row ranks.

    Returns ``levels`` rows: (recall_level, interp_prec, ap) with ap
    constant across rows.

    Scale shape: same block discipline as binary_eval — one corpus-sized
    groupBy onto the <= QUANT+1 probability grid, a single-partition
    window over blocks, then an inequality join of ``levels`` broadcast
    rows against the block table (BroadcastNestedLoop over O(grid) rows,
    never corpus rows)."""
    spark = scored.sparkSession
    blocks = _prob_blocks(scored, label_col, prob_col)
    w = (
        Window.orderBy(F.desc("pq"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = blocks.select(
        "pq",
        "cnt",
        "pos",
        F.sum("cnt").over(w).alias("cum_n"),
        F.sum("pos").over(w).alias("cum_pos"),
    )
    stats = cum.agg(
        F.sum("cnt").cast("long").alias("n"),
        F.sum("pos").alias("n_pos"),
        F.sum(F.col("pos") * F.col("cum_pos") / F.col("cum_n")).alias("ap_num"),
    )
    curve = cum.crossJoin(F.broadcast(stats)).select(
        (F.col("cum_pos") / F.col("cum_n")).alias("prec"),
        (F.col("cum_pos") / F.col("n_pos")).alias("recall"),
        (F.col("ap_num") / F.col("n_pos")).alias("ap"),
    )
    lv = spark.range(levels).select(
        (F.col("id").cast("double") / F.lit(float(levels - 1))).alias("recall_level")
    )
    return (
        lv.join(curve, F.col("recall") >= F.col("recall_level"), "inner")
        .groupBy("recall_level")
        .agg(F.max("prec").alias("interp_prec"), F.min("ap").alias("ap"))
    )


def isotonic_calibration(
    scored: DataFrame,
    label_col: str,
    prob_col: str,
    n_blocks: int = 1000,
) -> DataFrame:
    """Isotonic (monotone non-decreasing) calibration map — the
    standard post-hoc calibrator for classifier scores (Zadrozny &
    Elkan 2002), i.e. the weighted isotonic regression of empirical
    positive rate on predicted probability.

    Instead of the sequential pool-adjacent-violators stack (a
    data-dependent while-loop no fixed expression tree can express),
    this uses the MINIMAX identity of isotonic regression:

        iso_i = max_{j<=i} min_{k>=i} avg(pos[j..k]) / avg(cnt[j..k])

    over probability BLOCKS: scores quantize to the 1e-6 grid, then
    re-bucket to <= n_blocks calibration blocks, so the pair table is
    at most n_blocks^2/2 rows REGARDLESS of corpus size.  avg(j..k) is
    a single double division of exact BIGINT prefix sums, and the
    suffix-min / prefix-max are order-independent reductions over
    identical double sets — so a SQL replay agrees bit-for-bit (the
    same argument as events_acf, extended to windowed min/max).

    Plan: one corpus groupBy -> block table; rank + prefix sums over
    blocks (single-partition window over <= n_blocks rows — the
    lr_eval blocks contract); a rank-inequality pair join (broadcast
    nested loop over the tiny block table); one suffix-min window per
    j; one groupBy(k) max.  Returns per occupied block:
    (block, n, n_pos, raw_rate, iso_rate) with iso_rate monotone
    non-decreasing in block.
    """
    q = scored.select(
        F.round(F.col(prob_col) * QUANT).cast("long").alias("pq"),
        F.col(label_col).cast("long").alias("y"),
    ).select(
        F.least(
            F.lit(n_blocks - 1).cast("long"),
            F.expr(f"pq * {int(n_blocks)} div {QUANT}"),
        ).alias("qb"),
        "y",
    )
    blocks = value_blocks(
        q,
        "qb",
        val_alias="qb",
        counters={"cnt": F.count(F.lit(1)), "pos": F.sum("y")},
        max_blocks=n_blocks,  # tighter than the default by construction
    )
    w = Window.orderBy("qb")
    b = blocks.select(
        "qb",
        "cnt",
        "pos",
        F.row_number().over(w).alias("i"),
        F.sum("cnt").over(w).alias("cumw"),
        F.sum("pos").over(w).alias("cump"),
    ).localCheckpoint(eager=False)
    left = b.select(
        F.col("i").alias("j"),
        (F.col("cumw") - F.col("cnt")).alias("w0"),
        (F.col("cump") - F.col("pos")).alias("p0"),
    )
    right = b.select(
        F.col("i").alias("k"), F.col("cumw").alias("w1"), F.col("cump").alias("p1")
    )
    pairs = left.join(F.broadcast(right), F.col("k") >= F.col("j")).select(
        "j",
        "k",
        (
            (F.col("p1") - F.col("p0")).cast("double")
            / (F.col("w1") - F.col("w0")).cast("double")
        ).alias("a"),
    )
    wsuf = Window.partitionBy("j").orderBy(F.col("k").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    suf = pairs.select("j", "k", F.min("a").over(wsuf).alias("s"))
    iso = suf.groupBy("k").agg(F.max("s").alias("iso"))
    return (
        b.join(iso, b["i"] == iso["k"])
        .select(
            F.col("qb").alias("block"),
            F.col("cnt").alias("n"),
            F.col("pos").alias("n_pos"),
            F.round(
                F.col("pos").cast("double") / F.col("cnt").cast("double"), 6
            ).alias("raw_rate"),
            F.round("iso", 6).alias("iso_rate"),
        )
    )


def rbo(
    run_a: DataFrame,
    run_b: DataFrame,
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Rank-biased overlap (Webber et al., TOIS 2010) between two ranked
    lists — the standard top-weighted agreement measure for comparing
    rankers (BM25 vs QLM, old index vs new) without relevance judgments:

        RBO@k = (1-p) * sum_{d=1..k} p^(d-1) * |A_d intersect B_d| / d

    Inputs are (doc, rank) frames with rank 1-based; only ranks <= k
    participate.  A doc present in both prefixes at max(ra, rb) = m
    contributes (1-p) * sum_{d=m..k} p^(d-1)/d — computed by exploding
    the [m..k] depth range per matched doc (<= k rows each, k*|overlap|
    total), so the whole metric is a broadcast join of two k-row lists
    plus one agg: serving-time cheap by construction.

    Returns one row: (k, p, overlap_at_k, rbo) where overlap_at_k is
    |A_k intersect B_k|.
    """
    a = run_a.select(F.col("doc").alias("d"), F.col("rank").alias("ra")).filter(
        F.col("ra") <= k
    )
    b = run_b.select(F.col("doc").alias("d"), F.col("rank").alias("rb")).filter(
        F.col("rb") <= k
    )
    both = a.join(b, "d").select(
        "d", F.greatest("ra", "rb").alias("m")
    )
    contrib = both.select(
        "d", F.explode(F.sequence("m", F.lit(int(k)))).alias("depth")
    ).select(
        (
            F.pow(F.lit(float(p)), F.col("depth").cast("double") - 1)
            / F.col("depth")
        ).alias("t")
    )
    agg = contrib.agg(
        F.round(F.lit(1.0 - float(p)) * F.sum("t"), 6).alias("rbo")
    )
    ov = both.agg(F.count(F.lit(1)).alias("overlap_at_k"))
    return ov.crossJoin(agg).select(
        F.lit(int(k)).cast("long").alias("k"),
        F.lit(float(p)).alias("p"),
        "overlap_at_k",
        F.coalesce("rbo", F.lit(0.0)).alias("rbo"),
    )
