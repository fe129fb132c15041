"""Multinomial Naive Bayes document classification — distributed ML as
pure aggregation.

Curation pipelines gate documents with lightweight linear classifiers
(fastText language-ID / quality / domain models in CCNet & RefinedWeb).
Multinomial NB is the aggregation-shaped member of that family: training
IS a groupBy (count words per class), and scoring IS a join + sum — so
the whole pipeline stays in Catalyst with no model runtime, and the
DuckDB oracle can replay it exactly.

Training (:func:`nb_train`):
    log P(c)      = ln(docs_c / docs_total)
    log P(w|c)    = ln((count_{w,c} + 1) / (tokens_c + V))   (Laplace)
    log P(unk|c)  = ln(1 / (tokens_c + V))   (in-vocab word unseen in c)
Out-of-vocabulary terms (absent from EVERY class) are dropped at
classification time — the standard convention, and deterministic.

Scale shape: the only corpus-scale operations are two explodes with
map-side-combined keyed aggs; every model table is vocabulary- or
class-bounded (broadcastable).  Scoring shuffles (id, term, tf) tuples
once and reduces per (id, class).

Float determinism note: per-class scores are sums of ~doc-length terms;
engines sum in different orders, so outputs are rounded to 4 decimals
BEFORE the argmax comparison (ties break to the lexicographically first
class) — the same precedent as textstats.unigram_logprob's rounded avg.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.dedup import normalize_text


class NBModel(NamedTuple):
    priors: DataFrame    # (label, log_prior)
    liks: DataFrame      # (label, term, log_lik)
    unseen: DataFrame    # (label, log_unseen)
    vocab: DataFrame     # (term)


def _terms(text_col: str):
    return F.filter(F.split(normalize_text(F.col(text_col)), " "), lambda t: t != "")


def nb_train(df: DataFrame, label_col: str, text_col: str) -> NBModel:
    tok = df.select(
        F.col(label_col).alias("label"), F.explode(_terms(text_col)).alias("term")
    )
    # r10 optimization (guide §2.4 + the r9 broadcast-vs-shuffle lesson):
    # the model tables (liks, unseen, priors, vocab) are each BROADCAST at
    # scoring time, and broadcast exchanges never reuse each other's (or a
    # shuffle exchange's) subtree — profiled at sf0.1, every broadcast
    # build re-ran the corpus tokenize→explode→groupBy independently
    # (~6 corpus explodes per execution; lang_confusion spent 67 s of task
    # time on 14 s of CPU).  cwc is the vocabulary×|labels| model statistic
    # — bounded, tiny — so pin it: training runs the corpus explode ONCE
    # and every downstream model table derives from the materialized pin.
    cwc = (
        tok.groupBy("label", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("ct"))
        .localCheckpoint(eager=False)
    )
    # n_c / V / vocab all derive from the (label, term, ct) table instead of
    # re-aggregating `tok` directly (r9 optimization, guide §2.4): every
    # consumer now shares ONE corpus tokenize→explode→Exchange(label, term)
    # subtree (ReuseExchange dedupes it in-plan), where the previous
    # formulation re-ran the explode once per aggregate — 7 Generate nodes
    # over 7 corpus scans in nb_lang_classify's physical plan, now 2.
    # Values are identical: count(tok) per label == sum(ct), and the
    # distinct terms of cwc ARE the distinct terms of tok.
    nc = cwc.groupBy("label").agg(F.sum("ct").cast("long").alias("n_c"))
    vocab = cwc.select("term").distinct()
    v = vocab.agg(F.count(F.lit(1)).cast("long").alias("v"))
    dcnt = df.groupBy(F.col(label_col).alias("label")).agg(
        F.count(F.lit(1)).cast("long").alias("d_c")
    )
    dtot = df.select(F.count(F.lit(1)).cast("long").alias("d_t"))
    priors = dcnt.crossJoin(F.broadcast(dtot)).select(
        "label", F.log(F.col("d_c") / F.col("d_t")).alias("log_prior")
    )
    liks = (
        cwc.join(nc, "label")
        .crossJoin(F.broadcast(v))
        .select(
            "label", "term",
            F.log((F.col("ct") + F.lit(1)) / (F.col("n_c") + F.col("v"))).alias("log_lik"),
        )
    )
    unseen = nc.crossJoin(F.broadcast(v)).select(
        "label", F.log(F.lit(1.0) / (F.col("n_c") + F.col("v"))).alias("log_unseen")
    )
    return NBModel(priors, liks, unseen, vocab)


def nb_classify(
    df: DataFrame, id_col: str, text_col: str, model: NBModel, round_digits: int = 4
) -> DataFrame:
    """→ (id, predicted, score): argmax over classes of the rounded NB
    log-posterior, ties to the lexicographically first label."""
    doc_tf = (
        df.select(F.col(id_col).alias("id"), F.explode(_terms(text_col)).alias("term"))
        .groupBy("id", "term")
        .agg(F.count(F.lit(1)).cast("long").alias("tf"))
        # OOV terms contribute nothing (standard); vocab is term-distinct —
        # broadcast keeps the gate map-side
        .join(F.broadcast(model.vocab), "term")
    )
    per_class = (
        doc_tf.crossJoin(F.broadcast(model.unseen))
        # liks is vocabulary×classes — megabytes, so the scoring join is a
        # map-side broadcast; only the (id, label) partial sums shuffle
        .join(F.broadcast(model.liks), ["label", "term"], "left")
        .withColumn("w", F.col("tf") * F.coalesce(F.col("log_lik"), F.col("log_unseen")))
        .groupBy("id", "label")
        .agg(F.sum("w").alias("s"))
        .join(F.broadcast(model.priors), "label")
        .select(
            "id", "label",
            F.round(F.col("s") + F.col("log_prior"), round_digits).alias("score"),
        )
    )
    w = Window.partitionBy("id").orderBy(F.desc("score"), F.asc("label"))
    return (
        per_class.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("id", F.col("label").alias("predicted"), "score")
    )


def gini_stump(df: DataFrame, features: dict, label) -> DataFrame:
    """CART decision stump (Breiman et al. 1984, depth-1): over a set of
    integer-quantized candidate features, find the single (feature,
    threshold) split x <= t that minimizes weighted Gini impurity of a
    binary label — the one-split baseline every quality-classifier
    pipeline should beat, and the exact building block a distributed
    boosted-stumps trainer iterates.

    Gini instead of entropy is deliberate cross-engine discipline: the
    impurity mass of a side is  n - (pos^2 + neg^2)/n  — counts flow
    through +,-,*,/ only (all IEEE-exact given equal inputs), so Spark
    and the SQL oracle compute bit-identical gains, where ln() from two
    different libms could disagree in the last ulp and flip an argmax.

    Scale shape (the mann_whitney_u value-blocks discipline, one block
    table per feature): each row explodes to its (feature, x) pairs so
    the corpus appears in exactly ONE groupBy regardless of feature
    count; the resulting block table (bounded by the feature DOMAINS,
    not the corpus) is pinned, the totals and cumulative class counts
    derive from it (window PARTITIONED by feature), and the argmax is a
    TakeOrderedAndProject over blocks.

    ``features``: {name: integer Column}; ``label``: boolean/0-1 Column.
    Returns ONE row: (feature, split_x, n_left, pos_left, n_right,
    pos_right, gini_root, gain 6dp, n_correct, n) with ties broken by
    (feature, split_x) so the winner is total-ordered.

    NULL feature values are DROPPED per feature before blocking (and the
    totals are per-feature, over that feature's non-NULL rows) — Spark
    windows sort NULLs FIRST while DuckDB's default is NULLS LAST, so a
    NULL reaching the cumulative pass would shift every count and
    diverge the engines; filtering on both sides removes the ordering
    question entirely (mirrors the NULL-text COALESCE in
    _sql_quality_cte).
    """
    # ONE corpus scan for every feature: each row explodes to its
    # (feature, x) pairs, and the domain-bounded block table is pinned so
    # the cumulative pass and the total derive from it, not the corpus
    names = sorted(features)
    pairs = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(n).alias("feature"),
                    features[n].cast("long").alias("x"),
                )
                for n in names
            ]
        )
    )
    blk = (
        df.select(pairs.alias("p"), label.cast("int").alias("y"))
        .select(
            F.col("p.feature").alias("feature"), F.col("p.x").alias("x"), "y"
        )
        .filter(F.col("x").isNotNull())
    )
    blocks = (
        blk.groupBy("feature", "x")
        .agg(
            F.count(F.lit(1)).cast("long").alias("bn"),
            F.sum("y").cast("long").alias("bpos"),
        )
        .localCheckpoint(eager=True)
    )
    w = (
        Window.partitionBy("feature")
        .orderBy("x")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = blocks.select(
        "feature",
        "x",
        F.sum("bn").over(w).alias("nl"),
        F.sum("bpos").over(w).alias("pl"),
    )
    tot = blocks.groupBy("feature").agg(
        F.sum("bn").cast("long").alias("n_total"),
        F.sum("bpos").cast("long").alias("p_total"),
    )
    cand = cum.join(F.broadcast(tot), "feature").filter(
        F.col("nl") < F.col("n_total")
    )

    def gini_mass(n, p):
        nd, pd = n.cast("double"), p.cast("double")
        qd = nd - pd
        return nd - (pd * pd + qd * qd) / nd

    nl, pl = F.col("nl"), F.col("pl")
    nr = F.col("n_total") - nl
    pr = F.col("p_total") - pl
    ntd = F.col("n_total").cast("double")
    root = gini_mass(F.col("n_total"), F.col("p_total")) / ntd
    gain = root - (gini_mass(nl, pl) + gini_mass(nr, pr)) / ntd
    return (
        cand.select(
            "feature",
            F.col("x").alias("split_x"),
            nl.alias("n_left"),
            pl.alias("pos_left"),
            nr.alias("n_right"),
            pr.alias("pos_right"),
            F.round(root, 6).alias("gini_root"),
            F.round(gain, 6).alias("gain"),
            (
                F.greatest(pl, nl - pl) + F.greatest(pr, nr - pr)
            ).alias("n_correct"),
            F.col("n_total").alias("n"),
            gain.alias("__g"),
        )
        .orderBy(F.col("__g").desc(), "feature", "split_x")
        .limit(1)
        .drop("__g")
    )
