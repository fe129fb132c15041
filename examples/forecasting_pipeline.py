"""Forecasting workbench over the event stream — the fifth example
pipeline, composing the time-series operators the way a capacity-
planning job runs: identify the process, fit the right model, forecast,
and wrap the forecast in a distribution-free error band.

    events ─ daily volume (pinned) ──┬─ ACF              (cycle detection)
                                     ├─ PACF             (AR order)
                                     ├─ Holt-Winters m=7 (fit + 7-day forecast)
                                     └─ split-conformal  (radius on one-step
                                                          errors, first-half
                                                          calibration)
    events ─ hourly volume ─────────── lead-lag XCF      (which type leads?)

The model-identification stages and the model share ONE daily aggregate;
the conformal band reuses the Holt-Winters one-step errors, so the whole
workbench costs two scans of the events table.

Prints one JSON line; the smoke test asserts cross-stage invariants
(the ACF and the seasonal model agree on the weekly cycle, the conformal
radius covers ~90% of held-out errors, forecasts carry the band).

Run: python examples/forecasting_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import Window
from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_table
from mcpvectordb_spark.operators.timeseries import (
    acf,
    holt_winters_additive,
    pacf,
    xcf,
)
from mcpvectordb_spark.session import get_spark


def main(sf_dir: str, stop_session: bool = True) -> dict:
    spark = get_spark("forecasting")
    out: dict = {}

    ev = load_table(spark, sf_dir, "events")

    daily = (
        ev.groupBy(
            F.col("event_type").alias("k"),
            F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date"))
            .cast("long")
            .alias("t"),
        )
        .agg(F.count(F.lit(1)).alias("y"))
        .localCheckpoint()
    )
    out["daily_cells"] = daily.count()

    # 1. model identification: ACF over daily volume (weekly cycle shows
    # up at lag 7) and PACF for the AR order
    a = acf(daily, "k", "t", "y", max_lag=10)
    out["acf_lag7"] = {
        r["k"]: r["r"] for r in a.filter(F.col("lag") == 7).collect()
    }
    p = pacf(daily, "k", "t", "y", max_lag=5)
    out["pacf_lag1"] = {
        r["k"]: r["pacf"] for r in p.filter(F.col("lag") == 1).collect()
    }

    # 2. seasonal model: Holt-Winters additive, weekly period, 7-day
    # forecast
    hw = holt_winters_additive(
        daily, "k", "t", "y", alpha=0.5, beta=0.25, gamma=0.25,
        period=7, horizon=7,
    ).localCheckpoint()
    fitted = hw.filter(F.col("x").isNotNull())
    out["fitted_rows"] = fitted.count()
    out["forecast_rows"] = hw.filter(F.col("x").isNull()).count()

    # 3. split-conformal band on the ONE-STEP errors: calibrate on each
    # key's first half, measure coverage on the second half
    wk = Window.partitionBy("k").orderBy("t")
    errs = fitted.select(
        "k", "t", F.abs(F.col("x") - F.col("fitted")).alias("e")
    ).withColumn("rk", F.row_number().over(wk)).withColumn(
        "half", F.when(F.col("rk") % 2 == 1, 0).otherwise(1)
    )
    calib = errs.filter(F.col("half") == 0)
    n_cal = calib.groupBy("k").agg(F.count(F.lit(1)).alias("n_cal"))
    wq = Window.partitionBy("k").orderBy("e").rowsBetween(
        Window.unboundedPreceding, 0
    )
    qhat = (
        calib.withColumn("cum", F.count(F.lit(1)).over(wq))
        .join(n_cal, "k")
        .filter(
            F.col("cum") >= ((F.lit(9) * (F.col("n_cal") + 1) + 9) / 10).cast("long")
        )
        .groupBy("k")
        .agg(F.min("e").alias("qhat"))
    )
    holdout = errs.filter(F.col("half") == 1).join(qhat, "k")
    cov = holdout.agg(
        F.avg(F.when(F.col("e") <= F.col("qhat"), 1.0).otherwise(0.0)).alias("c"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    out["conformal"] = {
        "holdout_n": cov["n"],
        "coverage": round(cov["c"], 4),
        "qhat": {r["k"]: round(r["qhat"], 2) for r in qhat.collect()},
    }

    # 4. banded forecast: next week's volume per type with the band
    fc = hw.filter(F.col("x").isNull()).join(qhat, "k")
    out["forecast_banded"] = {
        f"{r['k']}@{r['t']}": [
            round(r["fitted"] - r["qhat"], 1),
            round(r["fitted"], 1),
            round(r["fitted"] + r["qhat"], 1),
        ]
        for r in fc.collect()
    }

    # 5. lead-lag: does any type lead another at the hourly grain?
    hourly = ev.groupBy(
        "event_type",
        (F.floor(F.unix_timestamp("ts") / 3600)).cast("long").alias("t"),
    ).agg(F.count(F.lit(1)).alias("y"))
    x = xcf(hourly, "event_type", "t", "y", max_lag=3)
    best = (
        x.withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("key_x", "key_y").orderBy(F.col("r").desc())
            ),
        )
        .filter((F.col("rk") == 1) & (F.col("key_x") == "view"))
        .collect()
    )
    out["view_leads"] = {r["key_y"]: [r["lag"], r["r"]] for r in best}

    print(json.dumps(out))
    if stop_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
