"""Smoke + invariants for examples/product_analytics_pipeline.py."""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_product_analytics_pipeline_invariants(spark):
    from examples.product_analytics_pipeline import main

    out = main("/root/testdata/sf0.001", stop_session=False)
    assert out["events"] == 1000

    # funnel monotone non-increasing in step order
    steps = ["signup", "view", "click", "purchase"]
    counts = [out["funnel"][s] for s in steps]
    assert counts == sorted(counts, reverse=True)

    # attribution conserves purchases: channel counts sum to the number of
    # purchase events, attributed value sums to total purchase value
    from pyspark.sql import functions as F

    from mcpvectordb_spark.io import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events")
    purchases = ev.filter("event_type = 'purchase'")
    n_purch = purchases.count()
    v_purch = round(purchases.agg(F.sum("value")).first()[0], 1)
    assert sum(n for n, _ in out["attribution"].values()) == n_purch
    assert round(sum(v for _, v in out["attribution"].values()), 1) == v_purch

    # experiment split covers every user exactly once
    assert out["ab_test"]["n_a"] + out["ab_test"]["n_b"] == ev.select("user_id").distinct().count()
    assert out["cohort_cells"] >= 1
