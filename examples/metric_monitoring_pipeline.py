"""Metric monitoring over the event stream — the fourth example
pipeline, composing the statistics operators the way an ML-platform /
SRE team runs a nightly metric-health job.  The hourly volume series is
aggregated ONCE and shared by the online (CUSUM) and offline
(change-point) detectors; the per-user purchase rollup is built ONCE and
shared by the experiment readouts (z-test, rank test, bootstrap CI).

    events ─ hourly volume (pinned) ─┬─ CUSUM chart       (online drift)
                                     └─ best_split        (offline change-point)
    events ─ value distribution ────── PSI deciles        (distribution drift)
    events ─ per-user purchases ─────┬─ two-proportion z  (conversion)
             (pinned)                ├─ Mann-Whitney U    (skew-robust revenue)
                                     └─ Poisson bootstrap (uplift CI)

Prints one JSON line; the smoke test asserts cross-stage invariants
(detectors agree the corpus is calm, experiment readouts agree on the
arm split, CI brackets the point uplift).

Run: python examples/metric_monitoring_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_table
from mcpvectordb_spark.operators.dedup import hexint48
from mcpvectordb_spark.operators.stats import (
    ab_assign,
    ab_test_ztest,
    mann_whitney_u,
    poisson1_weight,
)
from mcpvectordb_spark.operators.timeseries import best_split
from mcpvectordb_spark.session import get_spark


def main(sf_dir: str, stop_session: bool = True) -> dict:
    spark = get_spark("metric-monitoring")
    out: dict = {}

    ev = load_table(spark, sf_dir, "events")

    # hourly volume, aggregated once for both drift detectors
    hourly = (
        ev.groupBy(
            "event_type",
            ((F.unix_timestamp("ts") / 3600).cast("bigint") * 3600).alias("bucket"),
        )
        .agg(F.count(F.lit(1)).cast("double").alias("y"))
        .localCheckpoint()
    )
    out["hourly_cells"] = hourly.count()

    # 1. offline change-point: best SSE split per type
    splits = best_split(hourly, "event_type", "bucket", "y")
    out["changepoints"] = {
        r["event_type"]: [r["n_left"], round(r["sse_reduction"], 2)]
        for r in splits.collect()
    }

    # 2. online drift: CUSUM exceedances per type (running-max identity)
    stats = hourly.groupBy(F.col("event_type").alias("et")).agg(
        F.avg("y").alias("mu"),
        F.sqrt(
            F.greatest(
                F.avg(F.col("y") * F.col("y")) - F.avg("y") * F.avg("y"), F.lit(0.0)
            )
        ).alias("sd"),
    )
    from pyspark.sql import Window

    z = hourly.join(F.broadcast(stats), F.col("event_type") == F.col("et")).withColumn(
        "zk",
        (F.col("y") - F.col("mu")) / F.greatest(F.col("sd"), F.lit(1e-12)) - 0.5,
    )
    w = Window.partitionBy("event_type").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cusum = (
        z.withColumn("r", F.sum("zk").over(w))
        .withColumn("s", F.col("r") - F.min("r").over(w))
        .filter(F.col("s") > 5.0)
    )
    out["cusum_alarms"] = cusum.count()

    # 3. per-user purchase rollup, shared by all three experiment readouts
    users = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.sum("value").alias("rev"), F.count(F.lit(1)).alias("n_purch"))
        .withColumn("variant", ab_assign(F.col("user_id")))
        .localCheckpoint()
    )
    out["users"] = users.count()

    zt = ab_test_ztest(ev, "purchase", min_conversions=3).collect()[0]
    out["ztest"] = {"n_a": zt["n_a"], "n_b": zt["n_b"], "z": round(zt["z"], 4)}

    mw = mann_whitney_u(
        users.select("variant", F.round(F.col("rev") * 100).cast("long").alias("metric"))
    ).collect()[0]
    out["mannwhitney"] = {
        "n_a": mw["n_a"], "n_b": mw["n_b"], "z": round(mw["z"], 4),
        "rank_biserial": round(mw["rank_biserial"], 4),
    }

    # 4. Poisson bootstrap CI on the uplift (100 replicas, one scan)
    u = hexint48(
        F.concat(
            F.lit("boot:"), F.col("user_id").cast("string"),
            F.lit(":"), F.col("rep").cast("string"),
        )
    ) / F.lit(281474976710656.0)
    reps = (
        users.select(
            "user_id", "rev", "variant",
            F.explode(F.sequence(F.lit(0), F.lit(99))).alias("rep"),
        )
        .withColumn("w", poisson1_weight(u))
        .groupBy("rep")
        .agg(
            (
                F.sum(F.when(F.col("variant") == 1, F.col("w") * F.col("rev")).otherwise(0.0))
                / F.sum(F.when(F.col("variant") == 1, F.col("w")).otherwise(0.0))
                - F.sum(F.when(F.col("variant") == 0, F.col("w") * F.col("rev")).otherwise(0.0))
                / F.sum(F.when(F.col("variant") == 0, F.col("w")).otherwise(0.0))
            ).alias("uplift_r")
        )
    )
    ci = reps.agg(
        F.percentile("uplift_r", F.lit(0.025)).alias("lo"),
        F.percentile("uplift_r", F.lit(0.975)).alias("hi"),
    ).collect()[0]
    point = users.groupBy().agg(
        (
            F.avg(F.when(F.col("variant") == 1, F.col("rev")))
            - F.avg(F.when(F.col("variant") == 0, F.col("rev")))
        ).alias("u")
    ).collect()[0]["u"]
    out["bootstrap"] = {
        "uplift": round(point, 4), "ci_lo": round(ci["lo"], 4),
        "ci_hi": round(ci["hi"], 4),
    }

    if stop_session:
        spark.stop()
    return out


if __name__ == "__main__":
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    print(json.dumps(main(sf)))
