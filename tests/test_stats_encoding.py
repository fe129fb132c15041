"""Round-4 second cohort: A/B z-test, MAD outliers, WOE binning, target
encoding, Luhn card scrubbing, blocked entity matching, temperature
mixture weights."""

import math

from pyspark.sql import functions as F


def test_ab_test_ztest_known_values(spark):
    from mcpvectordb_spark.operators.stats import ab_assign, ab_test_ztest

    # users 0..199, each one event; make conversion depend on the variant
    # so |z| must be large and its sign must follow the rates
    rows = []
    for u in range(200):
        rows.append((u, "seed", 0.0))
        # conversion event for an arranged subset
        if u % 3 == 0:
            rows.append((u, "purchase", 1.0))
    df = spark.createDataFrame(rows, "user_id long, event_type string, value double")
    r = ab_test_ztest(df, "purchase").first()
    assert r["n_a"] + r["n_b"] == 200
    assert r["x_a"] + r["x_b"] == len([u for u in range(200) if u % 3 == 0])
    # replay the z in python
    pa, pb = r["x_a"] / r["n_a"], r["x_b"] / r["n_b"]
    pool = (r["x_a"] + r["x_b"]) / (r["n_a"] + r["n_b"])
    se = math.sqrt(pool * (1 - pool) * (1 / r["n_a"] + 1 / r["n_b"]))
    assert abs(r["z"] - (pa - pb) / se) < 1e-12
    # assignment is deterministic
    va = spark.range(10).select(ab_assign(F.col("id")).alias("v")).collect()
    vb = spark.range(10).select(ab_assign(F.col("id")).alias("v")).collect()
    assert va == vb and {r["v"] for r in va} <= {0, 1}


def test_mad_outliers_flags_planted_spike(spark):
    from mcpvectordb_spark.operators.stats import mad_outliers

    rows = [("a", float(v)) for v in [10, 11, 12, 10, 11, 12, 10, 11, 500]] + [
        ("b", float(v)) for v in [5, 5, 6, 6, 5, 6]
    ]
    df = spark.createDataFrame(rows, "k string, v double")
    out = mad_outliers(df, "k", "v", threshold=3.5).collect()
    assert len(out) == 1 and out[0]["v"] == 500.0 and out[0]["k"] == "a"
    assert out[0]["score"] > 100


def test_woe_binning_monotone_feature(spark):
    from mcpvectordb_spark.operators.encoding import woe_binning

    # label correlates with the feature -> WOE increases from low to high bins
    df = spark.createDataFrame(
        [(i, float(i), 1 if i >= 60 else 0) for i in range(100)],
        "id long, x double, y int",
    )
    out = {r["bin"]: r for r in woe_binning(
        df, F.col("x"), F.col("y") == 1, n_bins=5, tiebreak=F.col("id")
    ).collect()}
    assert len(out) == 5 and all(out[b]["n"] == 20 for b in out)
    assert out[1]["n_pos"] == 0 and out[5]["n_pos"] == 20
    assert out[1]["woe"] < 0 < out[5]["woe"]
    assert all(out[b]["iv"] >= 0 for b in out)  # IV contributions non-negative


def test_target_encode_loo_excludes_own_label(spark):
    from mcpvectordb_spark.operators.encoding import target_encode_loo

    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 1), (3, "a", 0), (4, "b", 0), (5, "b", 1)],
        "id long, cat string, y int",
    )
    out = {r["id"]: r["target_enc"] for r in target_encode_loo(
        df, F.col("cat"), F.col("y") == 1, smoothing=0.0
    ).collect()}
    # leave-one-out with no smoothing: id 1 in 'a' sees (2-1)/(3-1) = 0.5
    assert abs(out[1] - 0.5) < 1e-12
    assert abs(out[3] - 1.0) < 1e-12   # the two others are both 1
    assert abs(out[4] - 1.0) < 1e-12


def test_luhn_validation_and_scrub(spark):
    from mcpvectordb_spark.operators.curation import luhn_valid, scrub_cards

    # 4539578763621486 is Luhn-valid; flip the last digit to break it
    good, bad = "4539578763621486", "4539578763621487"
    df = spark.createDataFrame(
        [(1, f"pay {good} or {bad} now"), (2, "no digits here"), (3, f"x {bad} y")],
        "id long, text string",
    )
    out = {r["id"]: r for r in scrub_cards(df, "text").collect()}
    assert out[1]["n_card_candidates"] == 2 and out[1]["n_cards_valid"] == 1
    assert good not in out[1]["card_clean_text"] and bad in out[1]["card_clean_text"]
    assert "<CARD>" in out[1]["card_clean_text"]
    assert out[2]["n_card_candidates"] == 0
    assert out[3]["n_cards_valid"] == 0 and out[3]["card_clean_text"] == "x %s y" % bad
    v = spark.createDataFrame([(good,), (bad,)], "c string").select(
        luhn_valid(F.col("c")).alias("ok")
    ).collect()
    assert [r["ok"] for r in v] == [True, False]


def test_entity_match_blocked_finds_planted_edit(spark):
    from mcpvectordb_spark.operators.entity import entity_match_blocked

    df = spark.createDataFrame(
        [
            (1, 7, "marinelo"),
            (2, 7, "marinexo"),   # 1 edit past the prefix -> match
            (3, 7, "karinelo"),   # 1 edit INSIDE the prefix -> different block
            (4, 8, "marinelo"),   # same name, different nation -> different block
            (5, 7, "tokabemu"),
        ],
        "id long, nation int, name string",
    )
    out = [(r["id_a"], r["id_b"]) for r in entity_match_blocked(
        df, "id", "name", ["nation"], prefix_len=4, max_edit=1
    ).collect()]
    assert out == [(1, 2)]


def test_temperature_weights_flatten_distribution(spark):
    from mcpvectordb_spark.operators.curation import temperature_weights_bp

    df = spark.createDataFrame(
        [("big", 9000), ("small", 1000)], "domain string, n long"
    )
    w = {r["domain"]: r["weight_bp"] for r in
         temperature_weights_bp(df, "domain", "n", alpha=0.5).collect()}
    # raw shares 90/10; sqrt-temperature pulls toward 75/25
    assert 7000 < w["big"] < 8000 and 2000 < w["small"] < 3000
    assert abs(w["big"] + w["small"] - 10000) <= 1


def test_dq_report_flags_planted_violations(spark):
    from mcpvectordb_spark.operators.dataquality import dq_referential, dq_report

    df = spark.createDataFrame(
        [(1, "A", 5.0), (2, "A", 5.0), (2, "B", 150.0), (None, "Z", 7.0)],
        "id long, flag string, v double",
    )
    rep = {(r["constraint"], r["column"]): (r["value"], r["ok"]) for r in dq_report(
        df,
        completeness=["id", "flag"],
        unique=["id"],
        ranges={"v": (0.0, 100.0)},
        memberships={"flag": ["A", "B"]},
    ).collect()}
    assert rep[("completeness", "id")] == (1, False)
    assert rep[("completeness", "flag")] == (0, True)
    assert rep[("uniqueness", "id")] == (1, False)      # id=2 twice
    assert rep[("range", "v")] == (1, False)            # 150.0
    assert rep[("membership", "flag")] == (1, False)    # 'Z'

    dim = spark.createDataFrame([(1,), (2,)], "pk long")
    ref = dq_referential(df.filter("id IS NOT NULL"), "id", dim, "pk").first()
    assert ref["value"] == 0 and ref["ok"]
    ref2 = dq_referential(
        spark.createDataFrame([(9,)], "id long"), "id", dim, "pk"
    ).first()
    assert ref2["value"] == 1 and not ref2["ok"]


def test_cusum_identity_matches_recursion():
    """The running-max identity S_t = R_t - min(0, min R_i) equals Page's
    recursion S_t = max(0, S_{t-1} + z_t) — the trick both engines use."""
    import random

    rng = random.Random(7)
    zs = [rng.uniform(-1, 1) for _ in range(200)] + [1.0] * 10  # planted shift
    s_rec, out_rec = 0.0, []
    for z in zs:
        s_rec = max(0.0, s_rec + z)
        out_rec.append(s_rec)
    r, mn, out_id = 0.0, 0.0, []
    for z in zs:
        r += z
        mn = min(mn, r)
        out_id.append(r - min(mn, 0.0))
    assert all(abs(a - b) < 1e-9 for a, b in zip(out_rec, out_id))
    assert out_rec[-1] > 5.0  # the planted shift trips the chart
