"""Skew-mitigation operators for hot keys.

AQE's skew-join splitting handles most residual skew automatically
(enabled session-wide), but two patterns are worth owning explicitly for
the 100 TB regime where one key can dwarf an executor:

- :func:`salted_join` — fan a hot-keyed join out over S sub-keys: the big
  side gets a random salt in [0, S), the small side is replicated S times.
  The shuffle then spreads each hot key across S reducers. Result is
  row-identical to the plain join (salt only changes placement).
- :func:`salted_sum` — two-phase aggregation: partial agg on (key, salt),
  final agg on key. The first shuffle spreads the hot key; the second
  moves only S pre-aggregated rows per key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: list[str],
    salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Join with the big (skew-prone) side salted and the small side
    replicated ``salt`` times.  Semantics identical to ``big.join(small,
    on, how)`` for row-preserving join types (inner / left)."""
    salted_big = big.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    replicated = small.withColumn(
        "__salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    return salted_big.join(replicated, [*on, "__salt"], how).drop("__salt")


def salted_sum(
    df: DataFrame,
    key_cols: list[str],
    value_col: str,
    salt: int = 16,
) -> DataFrame:
    """Two-phase skew-safe aggregate: returns (key_cols..., n, total)."""
    salted = df.withColumn("__salt", (F.rand(seed=42) * salt).cast("int"))
    partial = salted.groupBy(*key_cols, "__salt").agg(
        F.count(F.lit(1)).alias("__n"), F.sum(value_col).alias("__s")
    )
    return partial.groupBy(*key_cols).agg(
        F.sum("__n").alias("n"), F.sum("__s").alias("total")
    )


def skew_report(df: DataFrame, key_col: str, top_k: int = 10) -> DataFrame:
    """Key-distribution diagnostics for shuffle planning: the top_k
    heaviest keys with (n, share, rank, cum_share) plus the Gini
    coefficient of the whole key distribution on every row.

    This is the measurement half of the salting machinery above: run it
    on a join/agg key BEFORE picking a strategy — cum_share of the top
    handful tells you whether AQE skew-split or explicit salting is
    warranted, and Gini tracks drift over time.  Cost: one keyed count
    (map-side combinable), then windows over the COUNTS table (|distinct
    keys| rows, not |df| rows) and one broadcast scalar join.
    """
    counts = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").cast("double").alias("total"),
        F.count(F.lit(1)).cast("double").alias("n_keys"),
    )
    asc = Window.orderBy(F.col("n").asc(), F.col("key").asc())
    desc = Window.orderBy(F.col("n").desc(), F.col("key").asc())
    ranked = (
        counts.withColumn("arank", F.row_number().over(asc))
        .withColumn("rank", F.row_number().over(desc))
        .crossJoin(F.broadcast(tot))
    )
    # Gini over ascending ranks: (2·Σ i·x_i − (K+1)·Σ x_i) / (K·Σ x_i)
    gini = ranked.agg(
        (
            (2 * F.sum(F.col("arank") * F.col("n")) - (F.max("n_keys") + 1) * F.sum("n"))
            / (F.max("n_keys") * F.sum("n"))
        ).alias("gini")
    )
    cum = Window.orderBy(F.col("rank").asc()).rowsBetween(Window.unboundedPreceding, 0)
    return (
        ranked.filter(F.col("rank") <= top_k)
        .withColumn("share", F.col("n") / F.col("total"))
        .withColumn("cum_share", F.sum(F.col("n")).over(cum) / F.col("total"))
        .crossJoin(F.broadcast(gini))
        .select("key", "n", "rank", "share", "cum_share", "gini")
    )
