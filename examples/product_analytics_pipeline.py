"""End-to-end product-analytics pipeline over the events stream — the
OLAP twin of examples/train_data_pipeline.py: every stage is an
oracle-checked catalog operator, composed the way a product team's daily
job actually runs them.

    events ─┬─ funnel (signup→view→click→purchase)
            ├─ day-cohort retention
            ├─ last-touch revenue attribution (7-day lookback)
            ├─ A/B readout: hash-variant two-proportion z-test
            ├─ CUSUM hourly-volume change-points per event type
            └─ robust MAD outliers on event values

Prints one JSON line of per-stage results (the smoke test asserts the
internal consistency invariants, e.g. funnel monotonicity and that
attribution conserves total purchase value).

Run: python examples/product_analytics_pipeline.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_table
from mcpvectordb_spark.operators.analytics import (
    cohort_retention,
    funnel_counts,
    last_touch_attribution,
)
from mcpvectordb_spark.operators.stats import ab_test_ztest, mad_outliers
from mcpvectordb_spark.session import get_spark


def main(sf_dir: str, stop_session: bool = True) -> dict:
    spark = get_spark("product-analytics")
    out: dict = {}
    ev = load_table(spark, sf_dir, "events")
    out["events"] = ev.count()

    # 1. ordered funnel — n_users non-increasing by construction
    steps = ["signup", "view", "click", "purchase"]
    fun = funnel_counts(ev, steps)
    out["funnel"] = {r["step_name"]: r["n_users"] for r in fun.collect()}

    # 2. day-cohort retention (first-seen day × day offset)
    coh = cohort_retention(ev, horizons=[1, 7])
    out["cohort_cells"] = coh.count()

    # 3. last-touch attribution — channel rollup conserves purchase value
    conv = last_touch_attribution(ev, "purchase")
    rolled = conv.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("v"), 2).alias("value")
    )
    out["attribution"] = {
        r["channel"]: [r["n"], float(r["value"])] for r in rolled.collect()
    }

    # 4. experiment readout
    ab = ab_test_ztest(ev, "purchase", min_conversions=3).first()
    out["ab_test"] = {
        "n_a": ab["n_a"], "x_a": ab["x_a"], "n_b": ab["n_b"], "x_b": ab["x_b"],
        "z": round(float(ab["z"]), 4),
    }

    # 5. volume change-points (CUSUM h=5, k=0.5) — reuse the catalog query
    from mcpvectordb_spark.catalog import q_events_cusum

    out["cusum_alarms"] = q_events_cusum(spark, sf_dir).count()

    # 6. robust value outliers per event type
    out["mad_outliers"] = mad_outliers(ev, "event_type", "value", 3.5).count()

    print(json.dumps(out))
    if stop_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
