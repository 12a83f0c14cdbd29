"""Analytical query plans over the TPC-H-ish test tables.

These prove the engine's general query surface (scan → filter → join →
aggregate → order/limit) and are the bench headline queries. All joins
against dimension tables rely on Spark auto-broadcasting the small side
(region/nation/supplier/customer are tiny at every SF; lineitem/orders
are the fact tables) — at 100 TB the same plans hold because the dim
tables stay broadcast-able and the fact-fact join (orders⋈lineitem)
shuffles on the join key with AQE handling skew.

Float aggregates are normalized with functions.rounding.stable_round on
both sides (see that module for why plain round() is not
oracle-stable).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.sources.tables import load_table


def q_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pricing summary report (TPC-H Q1 shape, adapted to the columns
    present in the test schema)."""
    li = load_table(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            stable_round(F.sum("l_quantity"), 4).alias("sum_qty"),
            stable_round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            stable_round(F.sum(disc_price), 4).alias("sum_disc_price"),
            stable_round(
                F.sum(disc_price * (1 + F.col("l_tax"))), 4
            ).alias("sum_charge"),
            stable_round(F.avg("l_quantity"), 4).alias("avg_qty"),
            stable_round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            stable_round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


ORACLE_Q1 = f"""
SELECT l_returnflag, l_linestatus,
       {sql_stable_round("sum(l_quantity)", 4)} AS sum_qty,
       {sql_stable_round("sum(l_extendedprice)", 4)} AS sum_base_price,
       {sql_stable_round("sum(l_extendedprice * (1 - l_discount))", 4)} AS sum_disc_price,
       {sql_stable_round("sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))", 4)} AS sum_charge,
       {sql_stable_round("avg(l_quantity)", 4)} AS avg_qty,
       {sql_stable_round("avg(l_extendedprice)", 4)} AS avg_price,
       {sql_stable_round("avg(l_discount)", 4)} AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""".strip()


def q_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-priority join (TPC-H Q3 shape): customer ⋈ orders ⋈
    lineitem, revenue per order. customer broadcasts; orders⋈lineitem
    shuffles on orderkey."""
    cust = load_table(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1995-03-15")
    )
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy(
            "l_orderkey",
            F.unix_millis(F.col("o_orderdate")).alias("o_orderdate_ms"),
            F.col("o_orderpriority"),
        )
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


ORACLE_Q3 = f"""
SELECT l_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms, o_orderpriority,
       {sql_stable_round("sum(l_extendedprice * (1 - l_discount))", 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
""".strip()


def q_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Local-supplier-volume (TPC-H Q5 shape): 6-way join; every
    dimension side broadcasts, lineitem only shuffles for the final
    groupBy."""
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    nation = load_table(spark, sf_dir, "nation")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .filter(cust.c_nationkey == supp.s_nationkey)
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )


ORACLE_Q5 = f"""
SELECT n_name,
       {sql_stable_round("sum(l_extendedprice * (1 - l_discount))", 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE c_nationkey = s_nationkey AND r_name = 'ASIA'
GROUP BY n_name
""".strip()


def q_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forecasting-revenue-change (TPC-H Q6 shape): highly selective
    scan-side filter — everything must push into the parquet reader."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q6 = f"""
SELECT {sql_stable_round("sum(l_extendedprice * l_discount)", 4)} AS revenue,
       count(*) AS n_items
FROM lineitem
WHERE l_discount >= 0.05 AND l_discount <= 0.07 AND l_quantity < 24
""".strip()


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders by totalprice per priority — window-function top-k,
    ties broken deterministically by key."""
    orders = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderpriority", "rk", "o_orderkey", "o_totalprice")
    )


ORACLE_TOPK = """
SELECT o_orderpriority, rk, o_orderkey, o_totalprice
FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders
) t WHERE rk <= 3
""".strip()


def q_events_daily_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily per-user activity rollup over the event stream (daily
    windows via the same epoch-aligned bucketing as the metric engine)."""
    ev = load_table(spark, sf_dir, "events")
    day_ms = 86400 * 1000
    return (
        ev.groupBy(
            ((F.unix_millis(F.col("ts")) / F.lit(day_ms)).cast("bigint") * day_ms).alias(
                "day_ms"
            ),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            stable_round(F.sum("value"), 4).alias("sum_value"),
            F.count_distinct(F.col("event_type")).alias("n_types"),
        )
    )


ORACLE_EVENTS_DAILY = f"""
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ms, user_id,
       count(*) AS n_events,
       {sql_stable_round("sum(value)", 4)} AS sum_value,
       count(DISTINCT event_type) AS n_types
FROM events
GROUP BY 1, 2
""".strip()


def q_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promotion-revenue share (TPC-H Q14 shape): conditional aggregate
    over a fact⋈dim join — part broadcasts, lineitem never shuffles."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    promo = F.when(F.col("p_type") == "PROMO", revenue).otherwise(F.lit(0.0))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-02-01"))
        )
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .agg(
            stable_round(
                F.lit(100.0) * F.sum(promo) / F.sum(revenue), 6
            ).alias("promo_revenue_pct")
        )
    )


ORACLE_Q14 = f"""
SELECT {sql_stable_round(
    "100.0 * sum(CASE WHEN p_type = 'PROMO' "
    "THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END) "
    "/ sum(l_extendedprice * (1 - l_discount))", 6)} AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01'
  AND l_shipdate < TIMESTAMP '1997-02-01'
""".strip()


def q_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-volume customers (TPC-H Q18 shape): aggregate-then-filter
    (HAVING) with a semi-join back onto orders/customer."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 200)
    )
    return (
        big.join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(customer), orders.o_custkey == customer.c_custkey)
        .select(
            "c_name",
            "o_orderkey",
            F.unix_millis("o_orderdate").alias("o_orderdate_ms"),
            stable_round(F.col("o_totalprice"), 4).alias("o_totalprice"),
            stable_round(F.col("total_qty"), 4).alias("total_qty"),
        )
    )


ORACLE_Q18 = f"""
WITH big AS (
  SELECT l_orderkey, sum(l_quantity) AS total_qty
  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 200
)
SELECT c_name, o_orderkey, epoch_ms(o_orderdate) AS o_orderdate_ms,
       {sql_stable_round("o_totalprice", 4)} AS o_totalprice,
       {sql_stable_round("total_qty", 4)} AS total_qty
FROM big
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "tpch_q1": q_tpch_q1,
    "tpch_q3": q_tpch_q3,
    "tpch_q5": q_tpch_q5,
    "tpch_q6": q_tpch_q6,
    "tpch_q14": q_tpch_q14,
    "tpch_q18": q_tpch_q18,
    "topk_per_group": q_topk_per_group,
    "events_daily_user": q_events_daily_user,
}

ORACLES: dict[str, str] = {
    "tpch_q1": ORACLE_Q1,
    "tpch_q3": ORACLE_Q3,
    "tpch_q5": ORACLE_Q5,
    "tpch_q6": ORACLE_Q6,
    "tpch_q14": ORACLE_Q14,
    "tpch_q18": ORACLE_Q18,
    "topk_per_group": ORACLE_TOPK,
    "events_daily_user": ORACLE_EVENTS_DAILY,
}
