"""Ranked-cut sort-key tripwire (tools/rankkey_report.py — r8 verdict
item 1): the round-7 discipline — every row-selecting cut keys on a
cross-engine-stable expression — is now mechanically auditable, so a new
float-scored top-k added to the catalog cannot silently reintroduce the
latent argmax-flip class.  These tests pin the allowlist, prove the
classifier's exact/rounded/risky partition on the repo's real idioms,
and demonstrate a deliberately-broken fixture (raw float-sum top-k) is
caught on BOTH the Spark and the oracle side."""

import sys
from pathlib import Path

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent.parent / "tools"))

from mcpvectordb_spark.catalog import QUERIES  # noqa: E402


def _rk():
    import rankkey_report

    return rankkey_report


def _spark_risky(df):
    rk = _rk()
    jplan = df._jdf.queryExecution().optimizedPlan()
    plan = jplan.toString()
    types, leaves = rk.walk_types(jplan)
    defs = rk.harvest_defs(plan)
    out = []
    for site, key in rk.find_spark_cuts(plan):
        cls, why = rk.classify(key, defs, types, leaves)
        out.append((site, cls, why))
    return out


def test_allow_raw_is_valid():
    """Every ALLOW_RAW entry must name a real catalog query and carry a
    non-empty justification (mirrors plan_report.ALLOW_BOUNDED's pin);
    the tool itself additionally fails on STALE entries."""
    rk = _rk()
    for name, reason in rk.ALLOW_RAW.items():
        assert name in QUERIES, f"allowlisted unknown query {name}"
        assert reason.strip(), f"empty justification for {name}"


def test_broken_fixture_raw_float_topk_is_caught(spark):
    """The bug class this tool exists for: a top-k keyed on a raw
    cross-row double sum.  Same query with the round(.., 6) discipline
    must pass."""
    df = spark.range(100).select(
        (F.col("id") % 7).alias("g"), (F.col("id") / 3.0).alias("x")
    )
    broken = (
        df.groupBy("g").agg(F.sum("x").alias("score"))
        .orderBy(F.col("score").desc(), "g").limit(5)
    )
    sites = _spark_risky(broken)
    assert any(c == "risky" for _, c, _ in sites), sites

    fixed = (
        df.groupBy("g").agg(F.sum("x").alias("score"))
        .orderBy(F.round("score", 6).desc(), "g").limit(5)
        .select("g", F.round("score", 6).alias("score"))
    )
    sites = _spark_risky(fixed)
    assert not any(c == "risky" for _, c, _ in sites), sites


def test_rank_window_and_threshold_fixtures(spark):
    """Rank windows and float-threshold filters are cut sites too: a
    row_number ordered by a raw libm key is risky; the rounded form and
    an integer-ratio threshold are not."""
    from pyspark.sql import Window

    df = spark.range(100).select(
        (F.col("id") % 7).alias("g"), (F.col("id") + 1.0).alias("x")
    )
    w = Window.partitionBy("g")
    broken = df.withColumn(
        "rn", F.row_number().over(w.orderBy(F.log("x").desc()))
    ).filter("rn <= 3")
    assert any(c == "risky" for _, c, _ in _spark_risky(broken))

    fixed = df.withColumn(
        "rn", F.row_number().over(w.orderBy(F.round(F.log("x"), 6).desc()))
    ).filter("rn <= 3")
    assert not any(c == "risky" for _, c, _ in _spark_risky(fixed))

    # integer-ratio threshold: per-row IEEE-exact, raw is fine
    ratio = df.groupBy("g").agg(
        F.count(F.lit(1)).alias("n"), F.sum(F.lit(1)).alias("m")
    ).filter(F.col("n") / F.col("m") >= 0.5)
    assert not any(c == "risky" for _, c, _ in _spark_risky(ratio))


def test_decimal_sum_and_integer_ratio_are_exact(spark):
    """The committed raw-key idioms must NOT be flagged: tpch-style
    decimal revenue sums and assoc_rules-style integer ratios."""
    rows = _spark_risky(QUERIES["tpch_q3"](spark, "/root/testdata/sf0.001"))
    assert rows and not any(c == "risky" for _, c, _ in rows), rows
    rows = _spark_risky(QUERIES["assoc_rules"](spark, "/root/testdata/sf0.001"))
    assert rows and not any(c == "risky" for _, c, _ in rows), rows


def test_sql_side_fixture_and_alias_binding():
    """Oracle-side scanning: a raw float-sum ORDER BY..LIMIT is caught;
    the bare-name-binds-rounded-alias idiom and the qualified raw
    integer-ratio idiom both pass."""
    rk = _rk()
    base = rk._parquet_types("/root/testdata/sf0.001")

    def risky(sql):
        flat = rk._sql_flat(sql)
        defs = rk._sql_defs(flat)
        return [
            (s, k, why)
            for s, k, pos in rk.find_sql_cuts(flat)
            for c, why in [rk._sql_classify(k, defs, base, pos=pos)]
            if c == "risky"
        ]

    broken = """
    SELECT g, sum(value / 2) AS score FROM events GROUP BY g
    ORDER BY score DESC LIMIT 5
    """
    assert risky(broken)

    disciplined = """
    WITH s AS (SELECT g, sum(value / 2) AS score FROM events GROUP BY g)
    SELECT g, round(score, 6) AS score FROM s
    ORDER BY score DESC, g LIMIT 5
    """
    assert not risky(disciplined)

    qualified_ratio = """
    WITH r AS (SELECT k, CAST(a AS DOUBLE) / CAST(b AS DOUBLE) AS lift
               FROM t)
    SELECT k, round(lift, 6) AS lift FROM r
    ORDER BY r.lift DESC, k LIMIT 5
    """
    assert not risky(qualified_ratio)


def test_rankkeys_report_exists_and_is_clean():
    """RANKKEYS.md must be regenerated each round with zero unexplained
    flags (the ✗ marker only ever appears in the legend row)."""
    path = Path(__file__).resolve().parent.parent / "RANKKEYS.md"
    assert path.exists(), "run tools/rankkey_report.py"
    body = path.read_text().splitlines()
    flagged = [
        ln for ln in body
        if ln.startswith("| ") and ("✗ RAW-FLOAT-CUT" in ln
                                    or "✗ STALE-ALLOWLIST" in ln
                                    or "| ERROR |" in ln)
    ]
    assert not flagged, flagged
