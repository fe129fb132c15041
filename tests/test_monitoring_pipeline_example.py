"""Smoke + invariants for examples/metric_monitoring_pipeline.py."""

import sys

sys.path.insert(0, ".")


def test_metric_monitoring_pipeline_invariants(spark):
    from examples.metric_monitoring_pipeline import main

    out = main("/root/testdata/sf0.001", stop_session=False)

    # a change-point is reported for every event type with an hourly series
    assert len(out["changepoints"]) >= 1
    for n_left, sse_red in out["changepoints"].values():
        assert n_left >= 1 and sse_red >= 0

    # both experiment readouts saw the SAME arm split of the same users
    assert out["ztest"]["n_a"] == out["mannwhitney"]["n_a"]
    assert out["ztest"]["n_b"] == out["mannwhitney"]["n_b"]
    assert out["mannwhitney"]["n_a"] + out["mannwhitney"]["n_b"] == out["users"]

    # the bootstrap CI brackets the point uplift
    b = out["bootstrap"]
    assert b["ci_lo"] <= b["uplift"] <= b["ci_hi"]

    # effect-size sanity: rank-biserial is a correlation-like quantity
    assert -1.0 <= out["mannwhitney"]["rank_biserial"] <= 1.0
