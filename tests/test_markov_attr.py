"""Unit tests for analytics.markov_removal_attribution: hand-solvable
journey graphs where the absorption probabilities have closed forms."""

import pytest


def _ev(spark, rows):
    return spark.createDataFrame(rows, ["user_id", "ts", "event_id", "event_type"])


def _run(spark, rows, **kw):
    from mcpvectordb_spark.operators.analytics import markov_removal_attribution

    out = markov_removal_attribution(_ev(spark, rows), **kw)
    return {r["channel"]: r for r in out.collect()}


def test_two_channel_closed_form(spark):
    # u1: click -> purchase, u2: view -> purchase, u3: click (no purchase)
    # P(conv) = 2/3 * 1/2 + 1/3 * 1 = 2/3; removing either channel -> 1/3
    rows = [
        (1, 1, 1, "click"), (1, 2, 2, "purchase"),
        (2, 1, 3, "view"), (2, 2, 4, "purchase"),
        (3, 1, 5, "click"),
    ]
    out = _run(spark, rows)
    assert set(out) == {"click", "view"}
    for ch in ("click", "view"):
        assert out[ch]["p_conv_full"] == pytest.approx(2 / 3, abs=1e-6)
        assert out[ch]["p_conv_removed"] == pytest.approx(1 / 3, abs=1e-6)
        assert out[ch]["removal_effect"] == pytest.approx(0.5, abs=1e-6)
        assert out[ch]["attribution"] == pytest.approx(0.5, abs=1e-6)


def test_loop_journey_absorption(spark):
    # one user: a -> b -> a -> purchase.  Transitions: start->a,
    # a->{b: 1/2, conv: 1/2}, b->a.  Full chain absorbs at conv with
    # prob 1 (geometric); removing b halves it; removing a kills it.
    rows = [
        (1, 1, 1, "a"), (1, 2, 2, "b"), (1, 3, 3, "a"), (1, 4, 4, "purchase"),
    ]
    out = _run(spark, rows)
    assert out["a"]["p_conv_full"] == pytest.approx(1.0, abs=1e-6)
    assert out["a"]["p_conv_removed"] == pytest.approx(0.0, abs=1e-9)
    assert out["a"]["removal_effect"] == pytest.approx(1.0, abs=1e-6)
    assert out["b"]["p_conv_removed"] == pytest.approx(0.5, abs=1e-6)
    assert out["b"]["removal_effect"] == pytest.approx(0.5, abs=1e-6)
    assert out["a"]["attribution"] == pytest.approx(2 / 3, abs=1e-6)
    assert out["b"]["attribution"] == pytest.approx(1 / 3, abs=1e-6)


def test_purchase_first_event_no_channels(spark):
    # journey is empty -> START goes straight to (conv); no channel rows
    rows = [(1, 1, 1, "purchase"), (1, 2, 2, "click")]
    from mcpvectordb_spark.operators.analytics import markov_removal_attribution

    out = markov_removal_attribution(_ev(spark, rows))
    assert out.count() == 0


def test_no_conversions_null_effects(spark):
    rows = [(1, 1, 1, "click"), (1, 2, 2, "view"), (2, 1, 3, "view")]
    out = _run(spark, rows)
    assert set(out) == {"click", "view"}
    for ch in out.values():
        assert ch["p_conv_full"] == pytest.approx(0.0, abs=1e-12)
        assert ch["removal_effect"] is None
        assert ch["attribution"] is None


def test_events_after_first_purchase_ignored(spark):
    # the post-purchase 'view' must not create transitions
    rows_a = [(1, 1, 1, "click"), (1, 2, 2, "purchase"), (1, 3, 3, "view")]
    rows_b = [(1, 1, 1, "click"), (1, 2, 2, "purchase")]
    assert _run(spark, rows_a) == _run(spark, rows_b)
