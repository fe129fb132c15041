"""Smoke + invariants for examples/forecasting_pipeline.py."""

import sys

sys.path.insert(0, ".")


def test_forecasting_pipeline_invariants(spark):
    from examples.forecasting_pipeline import main

    out = main("/root/testdata/sf0.001", stop_session=False)

    # every type got identification stats and a model
    assert out["daily_cells"] > 0
    assert len(out["acf_lag7"]) == len(out["pacf_lag1"]) >= 3
    # exactly 7 forecast rows per modeled type
    n_types = len(out["acf_lag7"])
    assert out["forecast_rows"] == 7 * n_types

    # conformal: finite-sample guarantee says holdout coverage should be
    # near 90% (generous band at this n)
    c = out["conformal"]
    assert c["holdout_n"] > 0
    assert 0.75 <= c["coverage"] <= 1.0
    assert all(q >= 0 for q in c["qhat"].values())

    # banded forecasts bracket the point forecast
    for lo, mid, hi in out["forecast_banded"].values():
        assert lo <= mid <= hi

    # lead-lag output is a correlation
    for lag, r in out["view_leads"].values():
        assert 0 <= lag <= 3 and -1.0 <= r <= 1.0
