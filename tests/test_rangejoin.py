"""Interval-join semantics: bin-bucketed result == naive non-equi join,
half-open boundaries, multi-bin intervals, key isolation, pair multiplicity."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.rangejoin import interval_join


def ts(s):
    return datetime.fromisoformat(s)


@pytest.fixture()
def sides(spark):
    points = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01T10:00:00")),   # == w_start → included
         (2, "u1", ts("2024-01-01T10:30:00")),   # inside two overlapping windows
         (3, "u1", ts("2024-01-01T11:00:00")),   # == w_end → excluded
         (4, "u1", ts("2024-01-03T07:59:59")),   # inside a 30h multi-bin window
         (5, "u2", ts("2024-01-01T10:30:00")),   # other key, no window
         (6, "u1", ts("2024-01-05T00:00:00"))],  # no window at all
        "p_id long, user_id string, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [("u1", 10, ts("2024-01-01T10:00:00"), ts("2024-01-01T11:00:00")),
         ("u1", 11, ts("2024-01-01T10:15:00"), ts("2024-01-01T10:45:00")),
         ("u1", 12, ts("2024-01-02T02:00:00"), ts("2024-01-03T08:00:00")),
         ("u1", 13, ts("2024-01-04T00:00:00"), ts("2024-01-04T00:00:00")),  # empty
         ("u2", 14, ts("2024-01-02T00:00:00"), ts("2024-01-02T01:00:00"))],
        "user_id string, w_id long, w_start timestamp, w_end timestamp",
    )
    return points, intervals


def pairs_of(df):
    return sorted((r["p_id"], r["w_id"]) for r in df.collect())


def test_interval_join_matches_naive_nonequi(spark, sides):
    points, intervals = sides
    naive = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.user_id") == F.col("i.user_id"))
        & (F.col("p.ts") >= F.col("i.w_start"))
        & (F.col("p.ts") < F.col("i.w_end")),
    ).select("p.p_id", "i.w_id")
    for bin_seconds in (60, 3600, 86400):
        out = interval_join(
            points, intervals, "ts", "w_start", "w_end",
            key_cols=["user_id"], bin_seconds=bin_seconds,
        )
        assert pairs_of(out) == pairs_of(naive), bin_seconds


def test_interval_join_boundary_and_multiplicity(spark, sides):
    points, intervals = sides
    got = pairs_of(interval_join(
        points, intervals, "ts", "w_start", "w_end",
        key_cols=["user_id"], bin_seconds=3600,
    ))
    # p1 at w_start (in), p2 in two overlapping windows (two pair rows),
    # p3 at w_end (out), p4 deep inside a 30-hour window, p5/p6 unmatched,
    # empty window 13 never matches
    assert got == [(1, 10), (2, 10), (2, 11), (4, 12)]


def test_interval_join_without_keys(spark):
    points = spark.createDataFrame(
        [(1, ts("2024-01-01T00:30:00")), (2, ts("2024-01-02T00:00:00"))],
        "p_id long, ts timestamp",
    )
    intervals = spark.createDataFrame(
        [(7, ts("2024-01-01T00:00:00"), ts("2024-01-01T01:00:00"))],
        "w_id long, w_start timestamp, w_end timestamp",
    )
    out = interval_join(points, intervals, "ts", "w_start", "w_end")
    assert pairs_of(out) == [(1, 7)]


def test_interval_join_rejects_column_collision(spark, sides):
    points, intervals = sides
    with pytest.raises(ValueError, match="collision"):
        interval_join(
            points, intervals.withColumnRenamed("w_id", "p_id"),
            "ts", "w_start", "w_end", key_cols=["user_id"],
        )


# ---------------------------------------------------------------------------
# overlap_join (interval × interval)


def test_overlap_join_matches_naive_nonequi(spark):
    """Bin-bucketed overlap join == the naive non-equi join, across
    overlaps that span one bin, many bins, touch-only boundaries (half-open
    → no match), and multiple keys."""
    from mcpvectordb_spark.operators.rangejoin import overlap_join

    left = spark.createDataFrame(
        [("u1", 1, ts("2024-01-01T10:00:00"), ts("2024-01-01T11:00:00")),
         ("u1", 2, ts("2024-01-01T11:00:00"), ts("2024-01-01T12:00:00")),  # touches 1 → no self pair
         ("u1", 3, ts("2024-01-02T00:00:00"), ts("2024-01-03T06:00:00")),  # 30h, many bins
         ("u2", 4, ts("2024-01-01T10:00:00"), ts("2024-01-01T11:00:00")),
         ("u1", 5, ts("2024-01-04T00:00:00"), ts("2024-01-04T00:00:00"))],  # empty → dropped
        "user_id string, l_id long, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [("u1", 10, ts("2024-01-01T10:30:00"), ts("2024-01-01T11:30:00")),  # overlaps 1 and 2
         ("u1", 11, ts("2024-01-02T12:00:00"), ts("2024-01-02T12:05:00")),  # inside 3
         ("u1", 12, ts("2024-01-01T09:00:00"), ts("2024-01-01T10:00:00")),  # touches 1 → no
         ("u2", 13, ts("2024-01-01T10:59:00"), ts("2024-01-01T12:00:00"))],  # overlaps 4
        "user_id string, r_id long, r_start timestamp, r_end timestamp",
    )
    got = sorted(
        (r["l_id"], r["r_id"])
        for r in overlap_join(
            left, right, "l_start", "l_end", "r_start", "r_end",
            key_cols=["user_id"], bin_seconds=3600,
        ).collect()
    )
    naive = sorted(
        (r["l_id"], r["r_id"])
        for r in left.join(
            right,
            (left.user_id == right.user_id)
            & (left.l_start < right.r_end) & (right.r_start < left.l_end),
        ).collect()
    )
    assert got == naive == [(1, 10), (2, 10), (3, 11), (4, 13)]


def test_overlap_join_reports_each_pair_once(spark):
    """Two long co-extensive intervals share MANY bins; the report-once
    canonicalisation must emit the pair exactly once without a dedup."""
    from mcpvectordb_spark.operators.rangejoin import overlap_join

    left = spark.createDataFrame(
        [(1, ts("2024-01-01T00:00:00"), ts("2024-01-03T00:00:00"))],
        "l_id long, l_start timestamp, l_end timestamp",
    )
    right = spark.createDataFrame(
        [(9, ts("2024-01-01T06:00:00"), ts("2024-01-02T18:00:00"))],
        "r_id long, r_start timestamp, r_end timestamp",
    )
    out = overlap_join(
        left, right, "l_start", "l_end", "r_start", "r_end", bin_seconds=3600
    ).collect()
    assert [(r["l_id"], r["r_id"]) for r in out] == [(1, 9)]
