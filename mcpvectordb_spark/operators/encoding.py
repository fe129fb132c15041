"""Feature-encoding operators for training-data prep: weight-of-evidence
binning and leave-one-out target encoding — the classic tabular-ML
pre-processing steps (credit-scoring WOE/IV; the Micci-Barreca 2001
target-encoding family), built as pure DataFrame ops so a 100 TB feature
table pays one window or one keyed agg per encoded column.

Both sit beside the quality classifier (operators/mlr.py): bin/encode
here, train there, every number oracle-replayable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def woe_binning(
    df: DataFrame,
    value_col: Column,
    label_col: Column,
    n_bins: int = 10,
    tiebreak: Column | None = None,
) -> DataFrame:
    """Equal-frequency binning of a continuous feature + per-bin weight of
    evidence and information value contribution:

        WOE_i = ln( (pos_i / pos) / (neg_i / neg) )      (0.5-smoothed)
        IV_i  = (pos_i/pos - neg_i/neg) · WOE_i

    Returns one row per bin: (bin, n, n_pos, woe, iv).  ``tiebreak`` makes
    the ntile assignment total-ordered (equal feature values would
    otherwise split nondeterministically across bin edges).

    Scale shape: ntile is one global-sort window — the standard price of
    exact equal-frequency edges.  At 100 TB, compute approximate edges
    with the mergeable histogram sketch (operators/sketches.py) and bin by
    range instead; this exact form is what the oracle gate can replay.
    """
    order = [value_col.asc()] + ([tiebreak.asc()] if tiebreak is not None else [])
    binned = df.select(
        label_col.cast("int").alias("y"),
        F.ntile(n_bins).over(Window.orderBy(*order)).alias("bin"),
    )
    per = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("y").cast("long").alias("n_pos"),
    )
    tot = per.agg(
        F.sum("n").cast("double").alias("_N"), F.sum("n_pos").cast("double").alias("_P")
    )
    j = per.crossJoin(F.broadcast(tot))
    pos_rate = (F.col("n_pos") + 0.5) / F.col("_P")
    neg_rate = (F.col("n") - F.col("n_pos") + 0.5) / (F.col("_N") - F.col("_P"))
    woe = F.log(pos_rate / neg_rate)
    return j.select(
        "bin",
        "n",
        "n_pos",
        woe.alias("woe"),
        ((pos_rate - neg_rate) * woe).alias("iv"),
    )


def target_encode_loo(
    df: DataFrame,
    cat_col: Column,
    label_col: Column,
    smoothing: float = 10.0,
) -> DataFrame:
    """Leave-one-out target encoding with additive smoothing toward the
    global prior:

        enc_i = (sum_y(category) - y_i + m·prior) / (n(category) - 1 + m)

    Leave-one-out keeps the row's own label out of its feature (the
    target-leakage guard); smoothing keeps rare categories near the
    prior.  Appends ``target_enc`` to the input.  One category-keyed
    window — no joins, no shuffle beyond the window's.
    """
    w = Window.partitionBy(cat_col)
    prior = df.select(F.avg(label_col.cast("double")).alias("_prior"))
    y = label_col.cast("double")
    out = df.crossJoin(F.broadcast(prior))
    enc = (F.sum(y).over(w) - y + smoothing * F.col("_prior")) / (
        F.count(F.lit(1)).over(w) - 1 + smoothing
    )
    return out.withColumn("target_enc", enc).drop("_prior")
