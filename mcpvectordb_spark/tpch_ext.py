"""Remaining TPC-H query shapes (Q2, Q7-Q12, Q14, Q15, Q19, Q20) over the
driver's synthetic star schema, completing the 22-query suite started in
``catalog.py``.

The synthetic schema has no ``partsupp`` table and no
``l_shipmode``/``l_commitdate``/``p_container`` columns, so the affected
queries keep their canonical *plan shape* (correlated scalar subquery,
disjunctive bracket predicates, nested IN + HAVING, ...) with adapted
predicates — the same convention ``catalog.py`` uses for Q4.

Every query follows the catalog parity rules (see ``catalog.py`` module
docstring): identical rounding both sides, BIGINT casts for DuckDB integer
aggregates, explicit id tiebreaks under every LIMIT.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mcpvectordb_spark.io import load_table

def _rev_dec() -> F.Column:
    """Revenue in exact decimal arithmetic.  The synthetic money columns
    are 2-decimal quantized, so summing DECIMAL is exact and therefore
    independent of partitioning/summation order — double sums over ~10^4+
    rows can straddle a rounding boundary between engines (observed on
    Q9/Q10), decimal sums cannot."""
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = F.col("l_discount").cast("decimal(4,2)")
    return ext * (F.lit(1).cast("decimal(3,2)") - disc)


_SQL_REV_DEC = "CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))"


def _ts(s: str) -> F.Column:
    return F.lit(s + " 00:00:00").cast("timestamp")


def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape): correlated scalar-min
    subquery over a dimension join.  Without ``partsupp``, the
    part↔supplier relationship comes from lineitem and the minimised
    attribute is ``s_acctbal``.  Spark-first: the correlated min is a
    window aggregate over the candidate set — one shuffle on p_partkey,
    no self-join, which is exactly Catalyst's decorrelation of the
    original subquery."""
    part = load_table(spark, sf_dir, "part").filter(
        (F.col("p_size") == 15) & (F.col("p_type") == "LARGE")
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    cand = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name")
        .distinct()
    )
    min_bal = F.min("s_acctbal").over(Window.partitionBy("p_partkey"))
    return (
        cand.withColumn("__min_bal", min_bal)
        .filter(F.col("s_acctbal") == F.col("__min_bal"))
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
        .select(
            F.round("s_acctbal", 2).alias("s_acctbal"),
            "s_name", "n_name", "p_partkey", "p_name",
        )
    )


SQL_TPCH_Q2 = """
WITH cand AS (
  SELECT DISTINCT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name
  FROM lineitem
  JOIN part     ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE p_size = 15 AND p_type = 'LARGE' AND r_name = 'EUROPE')
SELECT round(s_acctbal, 2) AS s_acctbal, s_name, n_name, p_partkey, p_name
FROM cand c
WHERE s_acctbal = (SELECT min(s_acctbal) FROM cand c2 WHERE c2.p_partkey = c.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (TPC-H Q7 shape): two nation dimensions joined to
    opposite sides of the fact, symmetric pair predicate, per-year agg.
    Both nation lookups broadcast; the only big shuffle is
    lineitem↔orders."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1998-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n1 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), supp.s_nationkey == F.col("n1_key"))
        .join(F.broadcast(n2), cust.c_nationkey == F.col("n2_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


SQL_TPCH_Q7 = f"""
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l_shipdate) AS INT) AS l_year,
       CAST(round(sum({_SQL_REV_DEC}), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
GROUP BY n1.n_name, n2.n_name, year(l_shipdate)
"""


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """National market share (TPC-H Q8 shape): 7-table join, conditional
    share-of-total ratio per year.  Customer region scopes demand; the
    share numerator keys on the supplier's nation."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1995-01-01")) & (F.col("o_orderdate") < _ts("1997-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    n_cust = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    n_supp = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    vol = _rev_dec()
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(n_cust), cust.c_nationkey == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n_supp), supp.s_nationkey == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            F.round(
                F.sum(F.when(F.col("supp_nation") == "NATION_3", vol).otherwise(F.lit(0).cast("decimal(3,2)"))).cast("double")
                / F.sum(vol).cast("double"),
                6,
            ).alias("mkt_share")
        )
    )


SQL_TPCH_Q8 = f"""
SELECT CAST(year(o_orderdate) AS INT) AS o_year,
       round(CAST(sum(CASE WHEN n2.n_name = 'NATION_3'
                      THEN {_SQL_REV_DEC} ELSE 0 END) AS DOUBLE)
             / CAST(sum({_SQL_REV_DEC}) AS DOUBLE), 6) AS mkt_share
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation n1 ON c_nationkey = n1.n_nationkey
JOIN region   ON n1.n_regionkey = r_regionkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation n2 ON s_nationkey = n2.n_nationkey
WHERE p_type = 'PROMO' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY year(o_orderdate)
"""


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 shape): LIKE-filtered part dimension,
    profit expression across joined tables, nation×year agg.  Without
    ``ps_supplycost`` the cost term is ``0.5 * p_retailprice *
    l_quantity``."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("%widget%"))
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    amount = _rev_dec() - F.lit(0.5).cast("decimal(2,1)") * F.col("p_retailprice").cast("decimal(12,2)") * F.col("l_quantity").cast("decimal(12,2)")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(F.round(F.sum(amount), 2).cast("double").alias("sum_profit"))
    )


SQL_TPCH_Q9 = f"""
SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
       CAST(round(sum({_SQL_REV_DEC}
                      - CAST(0.5 AS DECIMAL(2,1)) * CAST(p_retailprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))), 2) AS DOUBLE)
         AS sum_profit
FROM lineitem
JOIN part     ON l_partkey = p_partkey
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%widget%'
GROUP BY n_name, year(o_orderdate)
"""


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 shape): quarter of orders ×
    returned lineitems, revenue per customer, top-20."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= _ts("1996-01-01")) & (F.col("o_orderdate") < _ts("1996-04-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(F.sum(_rev_dec()).alias("__rev"))
        .orderBy(F.desc("__rev"), "c_custkey")
        .limit(20)
        .select(
            "c_custkey", "c_name",
            F.round("__rev", 2).cast("double").alias("revenue"),
            F.round("c_acctbal", 2).alias("c_acctbal"),
            "n_name",
        )
    )


SQL_TPCH_Q10 = f"""
SELECT c_custkey, c_name,
       CAST(round(sum({_SQL_REV_DEC}), 2) AS DOUBLE) AS revenue,
       round(c_acctbal, 2) AS c_acctbal, n_name
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY sum({_SQL_REV_DEC}) DESC, c_custkey
LIMIT 20
"""


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock (TPC-H Q11 shape): group-by with HAVING against an
    uncorrelated scalar-aggregate subquery over the same scope.  Without
    ``partsupp`` the value is per-supplier lineitem revenue within one
    region.  The global total stays in-plan as a broadcast 1-row cross
    join — no driver collect."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey", "l_extendedprice", "l_discount")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    scoped = (
        li.join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
    )
    per_supp = scoped.groupBy("s_suppkey", "s_name").agg(F.sum(_rev_dec()).alias("__value"))
    total = per_supp.agg((F.sum("__value") * F.lit(0.01).cast("decimal(3,2)")).alias("__thr"))
    return (
        per_supp.crossJoin(F.broadcast(total))
        .filter(F.col("__value") > F.col("__thr"))
        .orderBy(F.desc("__value"), "s_suppkey")
        .select("s_suppkey", "s_name", F.round("__value", 2).cast("double").alias("value"))
    )


SQL_TPCH_Q11 = f"""
WITH scoped AS (
  SELECT s_suppkey, s_name, {_SQL_REV_DEC} AS rev
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA')
SELECT s_suppkey, s_name, CAST(round(sum(rev), 2) AS DOUBLE) AS value
FROM scoped
GROUP BY s_suppkey, s_name
HAVING sum(rev) > (SELECT CAST(0.01 AS DECIMAL(3,2)) * sum(rev) FROM scoped)
ORDER BY sum(rev) DESC, s_suppkey
"""


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority (TPC-H Q12 shape): fact join + CASE-bucketed
    conditional counts over a ship-date year.  ``l_linestatus`` stands in
    for the missing ``l_shipmode``."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    orders = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderpriority")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


SQL_TPCH_Q12 = """
SELECT l_linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT)
         AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 0 ELSE 1 END) AS BIGINT)
         AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
GROUP BY l_linestatus
"""


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion effect (TPC-H Q14 shape): conditional-revenue ratio over
    one ship-date month; single-row result."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-03-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    promo = F.when(F.col("p_type") == "PROMO", _rev_dec()).otherwise(F.lit(0).cast("decimal(3,2)"))
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(F.round(F.lit(100.0) * F.sum(promo).cast("double") / F.sum(_rev_dec()).cast("double"), 4).alias("promo_revenue"))
    )


SQL_TPCH_Q14 = f"""
SELECT round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                              THEN {_SQL_REV_DEC} ELSE 0 END) AS DOUBLE)
             / CAST(sum({_SQL_REV_DEC}) AS DOUBLE), 4) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
"""


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15 shape): revenue view + scalar-max subquery
    selecting the argmax supplier(s); the max stays in-plan as a broadcast
    cross join."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    revenue = li.groupBy("l_suppkey").agg(F.sum(_rev_dec()).alias("__total"))
    top = revenue.agg(F.max("__total").alias("__max_total"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .filter(F.col("__total") == F.col("__max_total"))
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name", F.round("__total", 2).cast("double").alias("total_revenue"))
    )


SQL_TPCH_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey, sum({_SQL_REV_DEC}) AS total
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s_suppkey, s_name, CAST(round(total, 2) AS DOUBLE) AS total_revenue
FROM supplier JOIN revenue ON s_suppkey = l_suppkey
WHERE total = (SELECT max(total) FROM revenue)
ORDER BY s_suppkey
"""


def q_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted revenue (TPC-H Q19 shape): disjunction of three
    brand/size/quantity brackets — an equi-join with an OR-of-ANDs
    residual filter (Catalyst extracts the common join key; no
    nested-loop join)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand", "p_size")
    bracket = (
        (
            (F.col("p_brand") == "Brand#1")
            & F.col("p_size").between(1, 10)
            & F.col("l_quantity").between(1, 11)
        )
        | (
            (F.col("p_brand") == "Brand#2")
            & F.col("p_size").between(1, 20)
            & F.col("l_quantity").between(10, 20)
        )
        | (
            (F.col("p_brand") == "Brand#3")
            & F.col("p_size").between(1, 30)
            & F.col("l_quantity").between(20, 30)
        )
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(bracket)
        .agg(F.round(F.sum(_rev_dec()), 2).cast("double").alias("revenue"))
    )


SQL_TPCH_Q19 = f"""
SELECT CAST(round(sum({_SQL_REV_DEC}), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)
"""


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-stock suppliers (TPC-H Q20 shape): nested IN subquery with a
    grouped HAVING threshold, then a region-scoped supplier lookup.  The
    IN becomes a left-semi join; the inner GROUP BY keys on
    (suppkey, partkey) exactly like the partsupp original."""
    part = load_table(spark, sf_dir, "part").filter(F.col("p_name").like("red%"))
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= _ts("1996-01-01")) & (F.col("l_shipdate") < _ts("1997-01-01"))
    )
    heavy = (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 40)
        .select("l_suppkey")
        .distinct()
    )
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_regionkey")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        supp.join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .join(heavy, supp.s_suppkey == heavy.l_suppkey, "left_semi")
        .orderBy("s_suppkey")
        .select("s_suppkey", "s_name")
    )


SQL_TPCH_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_name LIKE 'red%'
      AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_suppkey, l_partkey
    HAVING sum(l_quantity) > 40)
ORDER BY s_suppkey
"""


TPCH_EXT_QUERIES = {
    "tpch_q2": q_tpch_q2,
    "tpch_q7": q_tpch_q7,
    "tpch_q8": q_tpch_q8,
    "tpch_q9": q_tpch_q9,
    "tpch_q10": q_tpch_q10,
    "tpch_q11": q_tpch_q11,
    "tpch_q12": q_tpch_q12,
    "tpch_q14": q_tpch_q14,
    "tpch_q15": q_tpch_q15,
    "tpch_q19": q_tpch_q19,
    "tpch_q20": q_tpch_q20,
}

TPCH_EXT_ORACLES = {
    "tpch_q2": SQL_TPCH_Q2,
    "tpch_q7": SQL_TPCH_Q7,
    "tpch_q8": SQL_TPCH_Q8,
    "tpch_q9": SQL_TPCH_Q9,
    "tpch_q10": SQL_TPCH_Q10,
    "tpch_q11": SQL_TPCH_Q11,
    "tpch_q12": SQL_TPCH_Q12,
    "tpch_q14": SQL_TPCH_Q14,
    "tpch_q15": SQL_TPCH_Q15,
    "tpch_q19": SQL_TPCH_Q19,
    "tpch_q20": SQL_TPCH_Q20,
}
