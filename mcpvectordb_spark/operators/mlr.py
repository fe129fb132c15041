"""Distributed logistic regression by full-batch gradient descent, as pure
DataFrame aggregations — the "train a quality classifier over the corpus"
step of a curation pipeline (fastText-style filtering a la GPT-3/CCNet,
here with an exactly-replayable linear model instead of an external
binary; the Naive-Bayes twin lives in operators/classify.py).

Scale shape: training state is the weight vector (a handful of doubles on
the driver — the same bounded-driver-state pattern as the BPE merge loop,
operators/bpe.py); each GD iteration is ONE map-side-combinable keyed-less
aggregation over the cached feature table (avg of (sigmoid(w.x) - y) * x_j
per feature), so a 100 TB corpus pays n_iter scans of a narrow cached
projection and shuffles nothing but partial aggregates.  Features are
z-standardized from corpus moments computed in the same first pass.

Everything is deterministic closed-form double arithmetic, so a DuckDB
oracle can replay the entire optimization as chained CTEs and the driver
gate proves the distributed trainer bit-close to the single-node replay.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def standardized_features(
    df: DataFrame, feature_cols: list[Column], label_col: Column
) -> DataFrame:
    """(y, x1..xk) with each feature z-standardized by population moments.
    std guarded by a 1e-12 floor so a degenerate constant feature yields
    zeros instead of an ANSI division error."""
    names = [f"x{i + 1}" for i in range(len(feature_cols))]
    raw = df.select(
        label_col.cast("double").alias("y"),
        *[c.cast("double").alias(n) for c, n in zip(feature_cols, names)],
    )
    stats = raw.agg(
        *[F.avg(n).alias(f"m_{n}") for n in names],
        *[
            F.sqrt(F.greatest(F.avg(F.col(n) * F.col(n)) - F.avg(n) * F.avg(n), F.lit(0.0)))
            .alias(f"s_{n}")
            for n in names
        ],
    )
    return raw.crossJoin(F.broadcast(stats)).select(
        "y",
        *[
            ((F.col(n) - F.col(f"m_{n}")) / F.greatest(F.col(f"s_{n}"), F.lit(1e-12))).alias(n)
            for n in names
        ],
    )


def train_logistic_gd(
    feats: DataFrame,
    n_features: int,
    iterations: int = 10,
    lr: float = 0.5,
    precached: bool = False,
) -> list[float]:
    """Full-batch GD on standardized features (y, x1..xk): returns
    [w0 (intercept), w1..wk].  One aggregation job per iteration; the
    weight vector is the only driver state.  Pass ``precached=True``
    when ``feats`` is already checkpointed/cached so the 10 iteration
    scans and the caller's scoring pass share ONE materialization."""
    names = [f"x{i + 1}" for i in range(n_features)]
    cached = feats if precached else feats.localCheckpoint(eager=True)
    w = [0.0] * (n_features + 1)
    for _ in range(iterations):
        z = F.lit(w[0])
        for j, n in enumerate(names):
            z = z + F.lit(w[j + 1]) * F.col(n)
        err = (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))) - F.col("y")
        g = cached.agg(
            F.avg(err).alias("g0"),
            *[F.avg(err * F.col(n)).alias(f"g{j + 1}") for j, n in enumerate(names)],
        ).first()
        w = [w[j] - lr * float(g[f"g{j}"]) for j in range(n_features + 1)]
    return w


def score_logistic(feats: DataFrame, w: list[float]) -> DataFrame:
    """Append p = sigmoid(w.x) and the 0.5-threshold prediction."""
    z = F.lit(w[0])
    for j in range(1, len(w)):
        z = z + F.lit(w[j]) * F.col(f"x{j}")
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    return feats.withColumn("p", p).withColumn("pred", (p > 0.5).cast("double"))
