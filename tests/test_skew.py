"""Salted join / aggregation must be result-identical to the plain forms."""

from pyspark.sql import functions as F

from mcpvectordb_spark.operators.skew import salted_join, salted_sum


def test_salted_join_matches_plain_join(spark):
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet").select(
        "l_orderkey" if False else F.col("o_orderkey").alias("l_orderkey"), "o_totalprice"
    )
    plain = li.join(orders, ["l_orderkey"]).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).first()
    salted = salted_join(li, orders, ["l_orderkey"], salt=8).groupBy().agg(
        F.count(F.lit(1)).alias("n"), F.round(F.sum("o_totalprice"), 2).alias("s")
    ).first()
    assert (plain["n"], plain["s"]) == (salted["n"], salted["s"])


def test_salted_sum_matches_plain_agg(spark):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    plain = {
        (r["event_type"],): (r["n"], round(r["t"], 4))
        for r in ev.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("t"))
        .collect()
    }
    salted = {
        (r["event_type"],): (r["n"], round(r["total"], 4))
        for r in salted_sum(ev, ["event_type"], "value", salt=8).collect()
    }
    assert plain == salted
