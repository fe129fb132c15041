"""Round-6 operators: BH-FDR across group z-tests, one-way ANOVA, Kendall
tau-b, RFM segmentation, lexical diversity, shared-pair association rules.  Each is checked against an independent
hand/pandas computation or an analytic closed form, plus the
degenerate-corpus smoke the round-5 discipline requires (single arm,
single group, constant values)."""

import math

import pytest

from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# Kendall tau-b


def _kendall_brute(xy):
    n = len(xy)
    c = d = tx = ty = 0
    for i in range(n):
        for j in range(i + 1, n):
            dx = xy[i][0] - xy[j][0]
            dy = xy[i][1] - xy[j][1]
            if dx == 0 and dy == 0:
                tx += 1
                ty += 1
            elif dx == 0:
                tx += 1
            elif dy == 0:
                ty += 1
            elif (dx > 0) == (dy > 0):
                c += 1
            else:
                d += 1
    n0 = n * (n - 1) // 2
    den = math.sqrt((n0 - tx) * (n0 - ty))
    return c, d, (c - d) / den if den > 0 else None


def test_kendall_matches_bruteforce(spark):
    from mcpvectordb_spark.operators.stats import kendall_tau_b

    xy = [(i % 7, (i * 13 + i * i) % 5) for i in range(60)]
    df = spark.createDataFrame(xy, "x long, y long")
    out = kendall_tau_b(df, F.col("x"), F.col("y")).first()
    c, d, tau = _kendall_brute(xy)
    assert out["concordant"] == c and out["discordant"] == d
    assert out["tau_b"] == pytest.approx(tau, abs=1e-6)


def test_kendall_perfect_and_reversed(spark):
    from mcpvectordb_spark.operators.stats import kendall_tau_b

    up = spark.createDataFrame([(i, 2 * i + 1) for i in range(30)], "x long, y long")
    assert kendall_tau_b(up, F.col("x"), F.col("y")).first()["tau_b"] == 1.0
    down = spark.createDataFrame([(i, -i) for i in range(30)], "x long, y long")
    assert kendall_tau_b(down, F.col("x"), F.col("y")).first()["tau_b"] == -1.0


def test_kendall_degenerate_constant(spark):
    from mcpvectordb_spark.operators.stats import kendall_tau_b

    const = spark.createDataFrame([(1, i) for i in range(10)], "x long, y long")
    out = kendall_tau_b(const, F.col("x"), F.col("y")).first()
    assert out["tau_b"] is None  # all pairs tied on x → undefined, not a crash


# ---------------------------------------------------------------------------
# One-way ANOVA


def test_anova_matches_hand_computation(spark):
    from mcpvectordb_spark.operators.stats import anova_oneway

    groups = {"a": [10, 12, 11, 13], "b": [20, 22, 19, 21], "c": [15, 14, 16, 15]}
    rows = [(g, v) for g, vs in groups.items() for v in vs]
    df = spark.createDataFrame(rows, "g string, v long")
    out = anova_oneway(df, "g", F.col("v")).first()
    allv = [v for vs in groups.values() for v in vs]
    grand = sum(allv) / len(allv)
    ssb = sum(len(vs) * (sum(vs) / len(vs) - grand) ** 2 for vs in groups.values())
    ssw = sum((v - sum(vs) / len(vs)) ** 2 for vs in groups.values() for v in vs)
    k, n = len(groups), len(allv)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    assert out["k_groups"] == 3 and out["n"] == 12
    assert out["ss_between"] == pytest.approx(ssb, abs=1e-3)
    assert out["ss_within"] == pytest.approx(ssw, abs=1e-3)
    assert out["f_stat"] == pytest.approx(f, abs=1e-5)
    assert out["eta_sq"] == pytest.approx(ssb / (ssb + ssw), abs=1e-6)


def test_anova_degenerate(spark):
    from mcpvectordb_spark.operators.stats import anova_oneway

    one_group = spark.createDataFrame([("a", v) for v in (1, 2, 3)], "g string, v long")
    r = anova_oneway(one_group, "g", F.col("v")).first()
    assert r["k_groups"] == 1 and r["f_stat"] is None
    constant = spark.createDataFrame(
        [("a", 5), ("a", 5), ("b", 5), ("b", 5)], "g string, v long"
    )
    r2 = anova_oneway(constant, "g", F.col("v")).first()
    assert r2["f_stat"] is None  # zero within-group variance → not evaluable


# ---------------------------------------------------------------------------
# Welch z + Benjamini–Hochberg


def test_normal_p_two_sided_accuracy(spark):
    """The Zelen–Severo polynomial must agree with math.erfc to < 1.5e-7
    (its published bound is 7.5e-8 on Phi)."""
    from mcpvectordb_spark.operators.stats import normal_p_two_sided

    zs = [0.0, 0.5, 1.0, 1.645, 1.96, 2.5, 3.0, 4.0, -1.96, -3.2]
    df = spark.createDataFrame([(z,) for z in zs], "z double")
    got = {r["z"]: r["p"] for r in df.select("z", normal_p_two_sided(F.col("z")).alias("p")).collect()}
    for z in zs:
        exact = math.erfc(abs(z) / math.sqrt(2.0))
        assert abs(got[z] - exact) < 1.5e-7, (z, got[z], exact)


def _bh_reference(pvals, alpha=0.05):
    m = len(pvals)
    order = sorted(range(m), key=lambda i: pvals[i])
    q = [0.0] * m
    running = 1.0
    for rank_from_end, idx in enumerate(reversed(order)):
        rank = m - rank_from_end
        running = min(running, pvals[idx] * m / rank)
        q[idx] = running
    return q


def test_group_welch_bh_planted_effect(spark):
    """Five groups, one with a planted arm shift: BH must reject exactly
    that group; on the A/A twin every q must accept.  q-values must match
    an independent Python BH over the same p-values."""
    from mcpvectordb_spark.operators.stats import group_welch_bh

    def corpus(shift_group):
        rows = []
        for g in range(5):
            for u in range(400):
                uid = g * 1000 + u
                # deterministic ±1 noise around 100, arm-balanced
                base = 100 + (uid * 7919) % 3 - 1
                rows.append((f"g{g}", uid, base))
        df = spark.createDataFrame(rows, "event_type string, user_id long, v long")
        if shift_group is None:
            return df
        from mcpvectordb_spark.operators.stats import ab_assign

        arm = ab_assign(F.col("user_id").cast("string"), salt="fdr")
        return df.withColumn(
            "v",
            F.when(
                (F.col("event_type") == shift_group) & (arm == 1),
                F.col("v") + 50,
            ).otherwise(F.col("v")),
        )

    hit = {
        r["event_type"]: r
        for r in group_welch_bh(
            corpus("g2"), "event_type", "user_id", F.col("v"), salt="fdr"
        ).collect()
    }
    assert hit["g2"]["rejected"] is True and hit["g2"]["q_bh"] < 0.001
    assert all(not hit[f"g{g}"]["rejected"] for g in (0, 1, 3, 4))

    aa = group_welch_bh(
        corpus(None), "event_type", "user_id", F.col("v"), salt="fdr"
    ).collect()
    assert all(r["rejected"] is False for r in aa)

    # q-values replicate an independent BH implementation
    ps = {r["event_type"]: r["p"] for r in aa}
    keys = sorted(ps)
    qref = _bh_reference([ps[k] for k in keys])
    for k, qr in zip(keys, qref):
        got = {r["event_type"]: r["q_bh"] for r in aa}[k]
        assert got == pytest.approx(qr, abs=1e-6), k


def test_group_welch_bh_degenerate(spark):
    """Constant values (zero variance) and a single-user group must yield
    NULL z / p, be excluded from m, and read rejected=False — never NULL,
    never an ANSI divide error."""
    from mcpvectordb_spark.operators.stats import group_welch_bh

    rows = [("const", u, 7) for u in range(100)] + [("solo", 1, 5)]
    rows += [("ok", u, 50 + u % 5) for u in range(200)]
    df = spark.createDataFrame(rows, "event_type string, user_id long, v long")
    out = {r["event_type"]: r for r in group_welch_bh(df, "event_type", "user_id", F.col("v")).collect()}
    assert out["const"]["z"] is None and out["const"]["rejected"] is False
    assert out["solo"]["p"] is None and out["solo"]["rejected"] is False
    assert out["ok"]["p"] is not None


# ---------------------------------------------------------------------------
# Association rules


# ---------------------------------------------------------------------------
# RFM segmentation


def test_customers_rfm_hand_quartiles(spark, tmp_path):
    """Eight hand-built customers with known quartile boundaries: segment
    scores must follow the b_q = min v with cum >= ceil(q*N) rule, the
    recency score must INVERT (recent = high), and segment sizes must
    partition the customers."""
    from datetime import datetime

    from mcpvectordb_spark.catalog import QUERIES

    rows = []
    # customer i: last order (i) days before max date, i+1 orders, total 100*(i+1)
    for i in range(8):
        for j in range(i + 1):
            rows.append(
                (i * 100 + j, i, datetime(2024, 1, 31 - i), 100.0)
            )
    df = spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate timestamp, o_totalprice double"
    )
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/orders.parquet")
    out = QUERIES["customers_rfm"](spark, d).collect()
    assert sum(r["n_customers"] for r in out) == 8
    seg = {
        (r["r_score"], r["f_score"], r["m_score"]): (r["n_customers"], r["avg_dollars"])
        for r in out
    }
    # N=8 -> ranks ceil(.25N)=2, ceil(.5N)=4, ceil(.75N)=6; f values 1..8 ->
    # boundaries f=2,4,6 -> scores: f in {1,2}->1, {3,4}->2, {5,6}->3,
    # {7,8}->4.  r days 0..7 split identically but INVERTED (recent=4);
    # m = 100*f dollars tracks f.  Customers pair up 2-per-quartile and the
    # most-frequent pair is also the OLDEST (r_score 1):
    assert seg == {
        (1, 4, 4): (2, 750.0),   # customers 6,7: f 7,8 -> avg m (700+800)/2
        (2, 3, 3): (2, 550.0),
        (3, 2, 2): (2, 350.0),
        (4, 1, 1): (2, 150.0),   # customers 0,1: most recent, 1-2 orders
    }


def test_documents_lexdiv_hand_counts(spark, tmp_path):
    """Two sources with known token multisets: TTR, hapax rate, and
    Simpson's repeat probability must equal the textbook formulas."""
    from mcpvectordb_spark.catalog import QUERIES

    docs = [
        (1, "a a b c", "s1"),
        (2, "a d", "s1"),
        (3, "x x x x", "s2"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string, source string")
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/documents.parquet")
    out = {r["source"]: r for r in QUERIES["documents_lexdiv"](spark, d).collect()}
    s1 = out["s1"]  # tokens a,a,b,c,a,d -> N=6, types {a:3,b:1,c:1,d:1}
    assert s1["n_tokens"] == 6 and s1["n_types"] == 4 and s1["n_hapax"] == 3
    assert s1["ttr"] == pytest.approx(4 / 6, abs=1e-6)
    assert s1["hapax_rate"] == pytest.approx(3 / 4, abs=1e-6)
    assert s1["simpson"] == pytest.approx((3 * 2) / (6 * 5), abs=1e-6)
    s2 = out["s2"]  # x x x x -> N=4, one type, no hapax, simpson = 12/12 = 1
    assert s2["simpson"] == 1.0 and s2["ttr"] == 0.25 and s2["n_hapax"] == 0


def test_assoc_rules_shared_pairs_hand_counts(spark, tmp_path):
    """assoc_rules consuming the session-shared co-purchase edge table
    must equal the textbook definitions on four hand-built orders —
    and equal its own self-mined form."""
    from mcpvectordb_spark.catalog import QUERIES
    from mcpvectordb_spark.operators.analytics import assoc_rules

    li = [
        (10, 1), (10, 2),
        (11, 1), (11, 2),
        (12, 1), (12, 3),
        (13, 2),
    ]
    df = spark.createDataFrame(li, "l_orderkey long, l_partkey long")
    d = str(tmp_path / "sf")
    df.write.parquet(f"{d}/lineitem.parquet")
    out = QUERIES["assoc_rules"](spark, d).collect()
    assert len(out) == 2  # both directions of the one recurring pair
    by_dir = {(r["antecedent"], r["consequent"]): r for r in out}
    r = by_dir[(1, 2)]
    assert r["n_pair"] == 2
    assert r["support"] == pytest.approx(2 / 4, abs=1e-6)
    assert r["confidence"] == pytest.approx(2 / 3, abs=1e-6)
    assert r["lift"] == pytest.approx((2 / 3) / (3 / 4), abs=1e-6)
    # identical to the self-mined form
    direct = sorted(
        (r["antecedent"], r["consequent"], r["n_pair"])
        for r in assoc_rules(df, "l_orderkey", "l_partkey").collect()
    )
    shared = sorted((r["antecedent"], r["consequent"], r["n_pair"]) for r in out)
    assert direct == shared


# ---------------------------------------------------------------------------
# Mann–Kendall trend


def _mk_brute(series):
    import math

    n = len(series)
    s = sum(
        (series[j] > series[i]) - (series[j] < series[i])
        for i in range(n)
        for j in range(i + 1, n)
    )
    from collections import Counter

    ties = sum(t * (t - 1) * (2 * t + 5) for t in Counter(series).values())
    var = (n * (n - 1) * (2 * n + 5) - ties) / 18.0
    if var <= 0:
        return s, var, None
    z = (s - 1) / math.sqrt(var) if s > 0 else (s + 1) / math.sqrt(var) if s < 0 else 0.0
    return s, var, z


def test_mann_kendall_matches_bruteforce(spark):
    from mcpvectordb_spark.operators.stats import mann_kendall

    series = {"up": [1, 3, 2, 4, 6, 5, 8, 9, 11, 10],
              "flat": [5, 6, 5, 6, 5, 6, 5, 6, 5, 6],
              "down": [20, 18, 19, 15, 14, 16, 10, 9, 8, 5]}
    rows = [(g, t, v) for g, vs in series.items() for t, v in enumerate(vs)]
    df = spark.createDataFrame(rows, "g string, t long, x long")
    out = {
        r["g"]: r
        for r in mann_kendall(df, "g", F.col("t"), F.col("x")).collect()
    }
    for g, vs in series.items():
        s, var, z = _mk_brute(vs)
        assert out[g]["mk_s"] == s, g
        assert out[g]["var_s"] == pytest.approx(var, abs=1e-4), g
        assert out[g]["z"] == pytest.approx(z, abs=1e-6), g
    assert out["up"]["trend"] == "increasing"
    assert out["down"]["trend"] == "decreasing"
    assert out["flat"]["trend"] == "none"


def test_mann_kendall_degenerate_constant(spark):
    """A constant series has Var(S)=0 — the verdict must be the definite
    string 'none', never NULL."""
    from mcpvectordb_spark.operators.stats import mann_kendall

    df = spark.createDataFrame([("c", t, 7) for t in range(10)], "g string, t long, x long")
    r = mann_kendall(df, "g", F.col("t"), F.col("x")).first()
    assert r["mk_s"] == 0 and r["z"] is None and r["trend"] == "none"
