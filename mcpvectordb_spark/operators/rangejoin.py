"""Point-in-interval (range) join — an operator Spark lacks natively.

``points JOIN intervals ON key AND start <= ts < end`` written directly is a
non-equi join: Spark plans it as BroadcastNestedLoopJoin (or a cartesian
product), O(|points|·|intervals|) per key — unusable at 100 TB.  The classic
fix, used here, is **bin bucketing**: quantise time into fixed-width bins,
explode every interval to the bins it spans, bin every point, and equi-join
on (key, bin) before applying the exact range predicate.

Cost model: the equi-join shuffles on (key, bin) — a hash join Catalyst/AQE
can optimize like any other.  Each interval produces ``duration/bin_width + 1``
rows, so pick ``bin_seconds`` near the typical interval duration: explosion
stays O(1) per interval while each bin's candidate set shrinks by the number
of bins.  A point lives in exactly one bin, so every matching (point,
interval) pair is emitted exactly once — no post-join dedup.

Correctness guards:
- empty/negative intervals (end <= start) are dropped before the explode
  (also protects against Spark 4's DESCENDING ``sequence(hi, lo)``);
- the interval's last bin is the bin of ``end - 1µs`` (half-open [start, end)).

Inner-join semantics only: each output row is one matching (point, interval)
pair.  Callers needing left semantics join the pair rows back to the point
table on its id (a generic "left" here would need a synthetic row id, and
``monotonically_increasing_id`` is not stable across plan re-execution).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _floordiv(x: Column, b: int) -> Column:
    """Exact floor division of a long column (`div` truncates toward zero,
    which would mis-bin pre-1970 timestamps; pmod is always >= 0, so
    x - pmod(x, b) is an exact multiple of b and the double division below
    is exact for |x| < 2^53 µs ≈ year 2255)."""
    return ((x - F.pmod(x, F.lit(b))) / F.lit(b)).cast("long")


def interval_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    key_cols: list[str] | None = None,
    bin_seconds: int = 3600,
    broadcast_intervals: bool = False,
) -> DataFrame:
    """Each point row × every interval row with ``start <= point_ts < end``
    (and equal ``key_cols``, if given).

    Returns point columns + non-key interval columns (caller aliases
    collisions away beforehand).  ``broadcast_intervals=True`` hints the
    exploded interval side — correct whenever the interval table is
    dimension-sized; the 100 TB point side then never shuffles.
    """
    key_cols = key_cols or []
    overlap = set(points.columns) & set(intervals.columns) - set(key_cols)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    bin_us = int(bin_seconds) * 1_000_000
    p = points.withColumn("__bin", _floordiv(F.unix_micros(F.col(point_ts)), bin_us))
    i = (
        intervals.filter(F.col(end_ts) > F.col(start_ts))
        .withColumn("__lo", _floordiv(F.unix_micros(F.col(start_ts)), bin_us))
        .withColumn("__hi", _floordiv(F.unix_micros(F.col(end_ts)) - 1, bin_us))
        .withColumn("__bin", F.explode(F.sequence("__lo", "__hi")))
        .drop("__lo", "__hi")
    )
    if broadcast_intervals:
        i = F.broadcast(i)
    cond = [p["__bin"] == i["__bin"]] + [p[k] == i[k] for k in key_cols]
    cond.append((p[point_ts] >= i[start_ts]) & (p[point_ts] < i[end_ts]))
    return p.join(i, on=cond, how="inner").select(
        *[p[c] for c in points.columns],
        *[i[c] for c in intervals.columns if c not in key_cols],
    )


def overlap_join(
    left: DataFrame,
    right: DataFrame,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    key_cols: list[str] | None = None,
    bin_seconds: int = 3600,
    broadcast_right: bool = False,
) -> DataFrame:
    """Interval × interval overlap join: every (left, right) pair with
    ``l_start < r_end AND r_start < l_end`` (half-open overlap) and equal
    ``key_cols`` — the both-sides-are-ranges sibling of
    :func:`interval_join`, which Spark would otherwise plan as a
    nested-loop non-equi join.

    Same bin-bucketing, with the classic **report-once** canonicalisation:
    a pair can share many bins, so the join keeps a pair only in the bin
    of ``greatest(l_start, r_start)`` — the first bin where both intervals
    are live, which every overlapping pair has exactly one of.  No
    post-join dedup, so the equi-join's output IS the answer (dedup would
    be another shuffle on the pair key).

    Empty/negative intervals (end <= start) on either side are dropped.
    Returns left columns + non-key right columns.
    """
    key_cols = key_cols or []
    overlap = set(left.columns) & set(right.columns) - set(key_cols)
    if overlap:
        raise ValueError(f"column collision between sides: {sorted(overlap)}")

    bin_us = int(bin_seconds) * 1_000_000

    def explode_bins(df: DataFrame, start: str, end: str) -> DataFrame:
        return (
            df.filter(F.col(end) > F.col(start))
            .withColumn("__lo", _floordiv(F.unix_micros(F.col(start)), bin_us))
            .withColumn("__hi", _floordiv(F.unix_micros(F.col(end)) - 1, bin_us))
            .withColumn("__bin", F.explode(F.sequence("__lo", "__hi")))
            .drop("__lo", "__hi")
        )

    lt = explode_bins(left, l_start, l_end)
    rt = explode_bins(right, r_start, r_end)
    if broadcast_right:
        rt = F.broadcast(rt)
    cond = [lt["__bin"] == rt["__bin"]] + [lt[k] == rt[k] for k in key_cols]
    cond.append((lt[l_start] < rt[r_end]) & (rt[r_start] < lt[l_end]))
    # report-once: only in the bin where the later-starting interval begins
    canonical = _floordiv(
        F.greatest(F.unix_micros(lt[l_start]), F.unix_micros(rt[r_start])), bin_us
    )
    cond.append(lt["__bin"] == canonical)
    return lt.join(rt, on=cond, how="inner").select(
        *[lt[c] for c in left.columns],
        *[rt[c] for c in right.columns if c not in key_cols],
    )
