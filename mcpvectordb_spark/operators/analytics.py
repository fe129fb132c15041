"""Product-analytics operators: ordered funnels and cohort retention.

Classic event-table OLAP shapes the reference never had (it is a retrieval
server) but any engine sitting on an events stream gets asked for.  Both
are pure keyed aggregations + joins — no windows over the full table, no
driver state — so they scale as a handful of user_id-keyed shuffles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def funnel_counts(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Strictly-ordered funnel: a user converts step i only with an event
    of type steps[i] strictly AFTER their step i-1 conversion time (first
    qualifying event wins).  Returns one row per step: (step, step_name,
    n_users), n_users non-increasing.

    Scale shape: one user-keyed agg per step over only that step's events
    (filter pushes to the scan), chained through broadcast-friendly joins
    on the shrinking converted-user set.  len(steps) keyed aggs total —
    no per-user event-list materialization, no window over the raw table.
    """
    rows = []
    converted = None  # DataFrame[user, _t] — conversion time of prior step
    for i, step in enumerate(steps):
        ev = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("user"), F.col(ts_col).alias("_ts")
        )
        if converted is None:
            converted = ev.groupBy("user").agg(F.min("_ts").alias("_t"))
        else:
            converted = (
                ev.join(converted, "user")
                .filter(F.col("_ts") > F.col("_t"))
                .groupBy("user")
                .agg(F.min("_ts").alias("_t"))
            )
        rows.append(
            converted.agg(
                F.lit(i + 1).alias("step"),
                F.lit(step).alias("step_name"),
                F.count(F.lit(1)).cast("long").alias("n_users"),
            )
        )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out


def cohort_retention(
    events: DataFrame,
    horizons: list[int],
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Day-cohort retention: users cohort on their first active day; for
    each horizon d, the cohort's retained count is users with ANY activity
    exactly d days after their cohort day.  Returns one row per cohort day
    with n_new and retained_d<h> columns.

    Scale shape: distinct (user, day) activity (one agg), first-day cohort
    (one agg), a user-keyed join, then one cohort-keyed agg with
    conditional counts — shuffle volume bounded by active user-days."""
    day = F.date_trunc("day", F.col(ts_col))
    activity = events.select(
        F.col(user_col).alias("user"), day.alias("day")
    ).distinct()
    cohorts = activity.groupBy("user").agg(F.min("day").alias("cohort_day"))
    joined = activity.join(cohorts, "user").withColumn(
        "age_days", F.datediff(F.col("day"), F.col("cohort_day"))
    )
    aggs = [F.count_distinct(F.when(F.col("age_days") == 0, F.col("user"))).cast("long").alias("n_new")]
    for h in horizons:
        aggs.append(
            F.count_distinct(F.when(F.col("age_days") == h, F.col("user")))
            .cast("long")
            .alias(f"retained_d{h}")
        )
    return joined.groupBy("cohort_day").agg(*aggs)
