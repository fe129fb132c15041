"""As-of join semantics: latest-at-or-before match, left-join nulls,
per-key isolation, equal-timestamp inclusivity."""

from datetime import datetime

from mcpvectordb_spark.operators.asof import asof_join


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01T10:00:00"), 100.0),
         (2, "u1", ts("2024-01-01T12:00:00"), 200.0),
         (3, "u2", ts("2024-01-01T09:00:00"), 300.0),   # before any right row
         (4, "u3", ts("2024-01-01T11:00:00"), 400.0)],  # key with no right rows
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [("u1", ts("2024-01-01T09:30:00"), 1.0),
         ("u1", ts("2024-01-01T11:00:00"), 2.0),
         ("u1", ts("2024-01-01T12:00:00"), 3.0),   # equal ts → included (<=)
         ("u2", ts("2024-01-01T09:30:00"), 9.0)],
        "user_id string, ts timestamp, value double",
    )
    out = {r["event_id"]: r for r in
           asof_join(left, right, ["user_id"], right_value_cols=["value"]).collect()}
    assert out[1]["asof_value"] == 1.0          # latest ≤ 10:00 is 09:30
    assert out[2]["asof_value"] == 3.0          # equal ts matches
    assert out[3]["asof_value"] is None         # nothing before 09:00
    assert out[4]["asof_value"] is None         # key never seen on right
    assert out[1]["value"] == 100.0             # left columns preserved
    assert out[2]["asof_ts"] == ts("2024-01-01T12:00:00")


def test_asof_forward_and_tolerance(spark):
    left = spark.createDataFrame(
        [(1, "u1", ts("2024-01-01T10:00:00"), 1.0),
         (2, "u1", ts("2024-01-01T13:00:00"), 2.0),
         (3, "u1", ts("2024-01-01T11:00:00"), 3.0)],
        "event_id long, user_id string, ts timestamp, value double",
    )
    right = spark.createDataFrame(
        [("u1", ts("2024-01-01T10:30:00"), 1.0),
         ("u1", ts("2024-01-01T11:00:00"), 2.0),
         ("u1", ts("2024-01-01T16:00:00"), 3.0)],
        "user_id string, ts timestamp, value double",
    )
    fwd = {r["event_id"]: r for r in
           asof_join(left, right, ["user_id"], right_value_cols=["value"],
                     direction="forward").collect()}
    assert fwd[1]["asof_value"] == 1.0          # earliest ≥ 10:00 is 10:30
    assert fwd[2]["asof_value"] == 3.0          # next following is 16:00
    assert fwd[3]["asof_value"] == 2.0          # equal ts matches (>=)

    tol = {r["event_id"]: r for r in
           asof_join(left, right, ["user_id"], right_value_cols=["value"],
                     direction="forward", tolerance_s=3600).collect()}
    assert tol[1]["asof_value"] == 1.0          # 30 min away: kept
    assert tol[2]["asof_value"] is None         # 3 h away: beyond tolerance
    assert tol[3]["asof_value"] == 2.0

    back_tol = {r["event_id"]: r for r in
                asof_join(left, right, ["user_id"], right_value_cols=["value"],
                          tolerance_s=600).collect()}
    assert back_tol[2]["asof_value"] is None    # 11:00 match is 2 h back
    assert back_tol[3]["asof_value"] == 2.0     # equal ts, gap 0
