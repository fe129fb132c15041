"""Bloom semi-join reduction: losslessness, superset prune, plan shape."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mcpvectordb_spark.operators.bloomjoin import bloom_reduce, bloom_reduce_join

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def tables(spark):
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    cust = spark.read.parquet(f"{SF}/customer.parquet").filter(
        F.col("c_acctbal") < 0
    )
    return orders, cust


def test_bloom_join_equals_plain_join(tables):
    orders, cust = tables
    got = (
        bloom_reduce_join(orders, cust, "o_custkey", "c_custkey")
        .select("o_orderkey", "c_custkey")
        .collect()
    )
    want = (
        orders.join(cust, orders.o_custkey == cust.c_custkey)
        .select("o_orderkey", "c_custkey")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, want))
    assert len(want) > 0  # non-vacuous


def test_bloom_reduce_is_superset_of_matches(tables):
    orders, cust = tables
    pruned = bloom_reduce(orders, "o_custkey", cust.select("c_custkey"), "c_custkey")
    kept = {r["o_orderkey"] for r in pruned.select("o_orderkey").collect()}
    matching = {
        r["o_orderkey"]
        for r in orders.join(
            cust, orders.o_custkey == cust.c_custkey, "left_semi"
        ).collect()
    }
    assert matching <= kept
    # and it actually prunes: the negative-balance dim is selective
    assert len(kept) < orders.count()


def test_bloom_join_rejects_unsound_how(tables):
    orders, cust = tables
    with pytest.raises(ValueError, match="inner/left_semi"):
        bloom_reduce_join(orders, cust, "o_custkey", "c_custkey", how="left")


def test_bloom_probe_adds_no_exchange(tables):
    """The probe must be a codegen'd filter inside the fact's scan stage —
    densified literal bitset, not a join: pruning alone adds zero
    Exchanges beyond what reading the fact needs (the dim keys are
    collected driver-side into the literal during planning)."""
    orders, cust = tables
    pruned = bloom_reduce(orders, "o_custkey", cust.select("c_custkey"), "c_custkey")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan
