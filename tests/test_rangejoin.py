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
