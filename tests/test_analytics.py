"""Funnel ordering strictness and cohort retention semantics."""

from datetime import datetime

from mcpvectordb_spark.operators.analytics import cohort_retention, funnel_counts


def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")


def test_funnel_requires_strict_order(spark):
    t = lambda h: datetime(2024, 1, 1, h)
    rows = [
        # u1: full ordered funnel
        (1, t(1), "view"), (1, t(2), "click"), (1, t(3), "purchase"),
        # u2: clicked BEFORE viewing — must not count past step 1
        (2, t(2), "view"), (2, t(1), "click"),
        # u3: view+click, purchase missing
        (3, t(1), "view"), (3, t(2), "click"),
        # u4: purchase only — counts nowhere
        (4, t(1), "purchase"),
    ]
    out = {r["step_name"]: r["n_users"] for r in funnel_counts(_ev(spark, rows), ["view", "click", "purchase"]).collect()}
    assert out == {"view": 3, "click": 2, "purchase": 1}


def test_funnel_same_timestamp_does_not_convert(spark):
    t = datetime(2024, 1, 1, 5)
    rows = [(1, t, "view"), (1, t, "click")]  # strictly-after ⇒ no click conversion
    out = {r["step_name"]: r["n_users"] for r in funnel_counts(_ev(spark, rows), ["view", "click"]).collect()}
    assert out == {"view": 1, "click": 0}


def test_cohort_retention_day_boundaries(spark):
    d = lambda day, h=0: datetime(2024, 1, day, h)
    rows = [
        (1, d(1), "view"), (1, d(2), "view"), (1, d(8), "view"),   # d1 + d7
        (2, d(1), "view"),                                          # new only
        (3, d(2), "view"), (3, d(3, 23), "view"),                   # cohort day2, d1
    ]
    out = {r["cohort_day"]: r for r in cohort_retention(_ev(spark, rows), [1, 7]).collect()}
    c1 = out[datetime(2024, 1, 1)]
    assert (c1["n_new"], c1["retained_d1"], c1["retained_d7"]) == (2, 1, 1)
    c2 = out[datetime(2024, 1, 2)]
    assert (c2["n_new"], c2["retained_d1"], c2["retained_d7"]) == (1, 1, 0)
