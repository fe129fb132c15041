"""Smoke + cross-method invariants for examples/attribution_workbench.py."""

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def test_attribution_workbench_invariants(spark):
    from examples.attribution_workbench import CHANNELS, main

    out = main("/root/testdata/sf0.001", spark=spark, stop_session=False)

    # every method produced a readout over a sane channel set
    assert set(out["shapley"]) == set(CHANNELS)
    assert set(out["markov"]) == set(CHANNELS)

    # Markov attributions are a distribution when any effect is positive
    attrs = [
        m["attribution"] for m in out["markov"].values() if m["attribution"] is not None
    ]
    if attrs:
        assert sum(attrs) == pytest.approx(1.0, abs=1e-3)
        assert all(a >= 0 for a in attrs)

    # Shapley efficiency in EXACT integers: sum(num) == 24*(v(C)-v(empty));
    # shares normalize to 1 whenever any credit exists
    nums = [s["num"] for s in out["shapley"].values()]
    shares = [s["share"] for s in out["shapley"].values()]
    if sum(nums) > 0:
        assert sum(shares) == pytest.approx(1.0, abs=1e-3)
    for s in out["shapley"].values():
        assert s["phi"] == pytest.approx(s["num"] / 24.0, abs=1e-6)

    # U-shaped credits conserve: per-conversion weights sum to whole
    # conversions, so the channel rollup total is integral up to rounding
    total_credit = sum(out["ushaped"].values())
    assert total_credit == pytest.approx(round(total_credit), abs=1e-2)

    # the A/A gate: BH must accept every event type (that is its job)
    assert out["bh_fdr"] and not any(out["bh_fdr"].values())
