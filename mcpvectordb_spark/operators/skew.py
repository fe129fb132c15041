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

from pyspark.sql import DataFrame
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
