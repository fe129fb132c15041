"""Attribution workbench over the event stream — the sixth example
pipeline: the SAME journeys credited four ways, ordered by how much
modeling each method buys, plus the multiple-testing gate a metrics
platform needs before acting on any of it.

    events ─┬─ last-touch      (positional: final touch takes all)
            ├─ U-shaped        (positional: 40/20/40)
            ├─ Markov removal  (model-based: absorption-probability drop)
            ├─ Shapley         (axiomatic: average marginal contribution)
            └─ BH-FDR          (are any per-type arm differences real?)

Why four: positional rules are cheap but order-sensitive; Markov prices
a channel by what breaks without it; Shapley is the unique credit
satisfying efficiency + symmetry.  Running them side by side is the
standard sanity protocol — a channel ranked high by every method is
robustly important; one ranked high only positionally is an artifact of
journey ordering.

Cross-method invariants asserted by the smoke test
(tests/test_attribution_workbench_example.py):
  - Markov attributions sum to exactly 1 (when any effect is positive);
  - Shapley efficiency: sum(phi) == v(all channels) - v(no channels),
    checked in EXACT integer numerators;
  - Shapley share and Markov attribution agree on sign structure (both
    give 0 to a channel no converter ever touched);
  - the BH-FDR readout on this A/A hash split accepts every event type.

Run: python examples/attribution_workbench.py [sf_dir]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, ".")

from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_table
from mcpvectordb_spark.operators.analytics import (
    last_touch_attribution,
    markov_removal_attribution,
    shapley_attribution,
    ushaped_attribution,
)
from mcpvectordb_spark.operators.stats import group_welch_bh

CHANNELS = ["click", "error", "signup", "view"]


def main(sf_dir: str, spark=None, stop_session: bool = True):
    if spark is None:
        from mcpvectordb_spark.session import get_spark

        spark = get_spark("attribution-workbench")
    ev = load_table(spark, sf_dir, "events")
    out: dict = {}

    # 1. last-touch: value-conserving channel rollup
    lt = last_touch_attribution(ev, "purchase")
    out["last_touch"] = {
        r["channel"]: round(float(r["value"]), 2)
        for r in lt.groupBy("channel")
        .agg(F.sum("v").alias("value"))
        .collect()
    }

    # 2. U-shaped 40/20/40: per-conversion credits must sum to 1
    us = ushaped_attribution(ev, "purchase")
    out["ushaped"] = {
        r["channel"]: round(float(r["credit"]), 4)
        for r in us.groupBy("channel").agg(F.sum("credit").alias("credit")).collect()
    }

    # 3. Markov removal effects (normalized attribution)
    mk = markov_removal_attribution(ev, "purchase").collect()
    out["markov"] = {
        r["channel"]: {
            "removal_effect": round(float(r["removal_effect"]), 4),
            "attribution": (
                None if r["attribution"] is None else round(float(r["attribution"]), 4)
            ),
        }
        for r in mk
    }

    # 4. Shapley: exact numerators + normalized share
    sh = shapley_attribution(ev, CHANNELS).collect()
    out["shapley"] = {
        r["channel"]: {
            "num": r["shapley_num"],
            "phi": float(r["shapley"]),
            "share": float(r["share"]),
        }
        for r in sh
    }

    # 5. the gate: BH-corrected per-type A/B Welch z-tests on an A/A
    # hash split — no attribution readout should be ACTED on while the
    # metrics platform is false-alarming
    cents = F.round(F.col("value") * 100).cast("long")
    bh = group_welch_bh(ev, "event_type", "user_id", cents, salt="fdr").collect()
    out["bh_fdr"] = {r["event_type"]: bool(r["rejected"]) for r in bh}

    print(json.dumps(out))
    if stop_session:
        spark.stop()
    return out


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01")
