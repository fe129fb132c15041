"""Z-order (Morton-curve) clustering for multi-column file pruning.

A table sorted linearly on one column prunes parquet row groups only for
predicates on THAT column; range scans on any other column touch every
file.  Interleaving the bits of two (or more) columns into one sort key
gives every interleaved column locality at once: each file's min/max span
on EACH dimension shrinks to roughly range/√files (2-D), so Catalyst's
row-group min/max skipping works for predicates on either column — the
layout trick behind Delta/Databricks OPTIMIZE ZORDER, built here from
plain Spark expressions (no UDF; the interleave folds inside codegen).

Usage shape at scale: ``df.repartitionByRange(n, zkey).sortWithinPartitions
(zkey).write.parquet(...)`` — one range shuffle at write time buys min/max
pruning on every interleaved dimension for the life of the data.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _to_bucket(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamp + scale a numeric column to an integer bucket in [0, 2^bits)."""
    n = (1 << bits) - 1
    scaled = (c.cast("double") - F.lit(lo)) / F.lit(hi - lo) * F.lit(n)
    return F.least(F.greatest(F.round(scaled).cast("long"), F.lit(0)), F.lit(n))


def zorder_key(
    a: Column,
    b: Column,
    a_range: tuple[float, float],
    b_range: tuple[float, float],
    bits: int = 16,
) -> Column:
    """Morton interleave of two numeric columns (``bits`` bits each →
    one 2·bits-bit key).  Pure column expressions: the bit walk runs as a
    codegen'd fold over a literal sequence, no Python per row."""
    xa = _to_bucket(a, *a_range, bits)
    xb = _to_bucket(b, *b_range, bits)
    # z = Σ_i ((a>>i)&1)·2^(2i) + ((b>>i)&1)·2^(2i+1); bit i extracts as
    # (x & 2^i)/2^i so the whole walk stays in plain column arithmetic
    # (the Python shiftleft wrapper only takes a literal int shift)
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(bits - 1)),
        F.lit(0).cast("long"),
        lambda acc, i: acc
        + (xa.bitwiseAND(_pow2(i)) / _pow2(i)).cast("long") * _pow2(i * 2)
        + (xb.bitwiseAND(_pow2(i)) / _pow2(i)).cast("long") * _pow2(i * 2 + 1),
    )


def _pow2(i: Column | int) -> Column:
    e = F.lit(i) if isinstance(i, int) else i
    return F.pow(F.lit(2.0), e.cast("double")).cast("long")


def write_zordered(
    df: DataFrame,
    path: str,
    a: str,
    b: str,
    a_range: tuple[float, float],
    b_range: tuple[float, float],
    n_files: int = 16,
    bits: int = 16,
) -> None:
    """Cluster ``df`` on the 2-D Morton key and write ``n_files`` parquet
    files, each covering a compact z-region — the write-time layout step
    that buys min/max skipping on BOTH columns."""
    z = zorder_key(F.col(a), F.col(b), a_range, b_range, bits).alias("__z")
    (
        df.withColumn("__z", z)
        .repartitionByRange(n_files, "__z")
        .sortWithinPartitions("__z")
        .drop("__z")
        .write.mode("overwrite")
        .parquet(path)
    )
