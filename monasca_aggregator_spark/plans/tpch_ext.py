"""Extended TPC-H-shaped analytic plans (Q7-Q13, Q15-Q17, Q20, Q21).

The test schema has no ``partsupp`` table and no commit/receipt dates,
so shapes that depend on them are adapted to the available columns —
the *query shape* (what the optimizer must handle) is preserved:

- Q7  two simultaneous joins against the same dimension (nation²)
- Q8  conditional market-share over a 7-way join, per-year ratio
- Q9  profit expression across fact⋈fact⋈dims (cost proxied by
  ``p_retailprice`` since there is no ``ps_supplycost``)
- Q10 returned-item revenue per customer
- Q11 fraction-of-total HAVING via broadcast scalar subquery
- Q12 conditional CASE-counts over a fact⋈fact join (``l_linestatus``
  stands in for ``l_shipmode``; lateness from ship-vs-order date)
- Q13 outer-join distribution histogram (two-level aggregation)
- Q15 revenue view consumed twice (rows + broadcast 1-row MAX)
- Q16 distinct-count + NOT IN (anti-join) supplier stats
- Q17 join against per-group average (broadcast agg join-back)
- Q20 semi-join chain over an aggregate-with-HAVING subquery
- Q21 multi-correlated EXISTS / NOT EXISTS on the same fact table

Scale posture: every dimension side is explicitly broadcast; the only
shuffles are fact⋈fact joins keyed on orderkey and the final groupBys.
The Q21 self-joins shuffle lineitem on l_orderkey once per side — at
100 TB those co-partition (same key), so AQE folds them into one
exchange reuse.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.sources.tables import load_table


def _e2(col):
    """Exact integer cents: floor(x·100 + 0.5) as BIGINT."""
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def _rev():
    # lazy: Column construction needs an active SparkContext
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))
_SQL_REV = "l_extendedprice * (1 - l_discount)"


def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume shipping (Q7 shape): the same nation dimension joins
    twice under different roles (supplier nation, customer nation)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    n1 = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (
        F.col("cust_nation") == "NATION_2"
    ) | (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("sn_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("cn_key"))
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year"))
        .agg(stable_round(F.sum(_rev()), 4).alias("revenue"))
    )


ORACLE_Q7 = f"""
SELECT supp_nation, cust_nation, l_year,
       {sql_stable_round(f"sum({_SQL_REV})", 4)} AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         year(l_shipdate) AS l_year,
         l_extendedprice, l_discount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
) t
GROUP BY supp_nation, cust_nation, l_year
""".strip()


def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share (Q8 shape): per-year share of one supplier nation
    in a region's volume of one part type — conditional sum ratio over
    a 7-way join; both aggregates come out of ONE shuffle."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1999-01-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    target = F.when(F.col("supp_nation") == "NATION_3", _rev()).otherwise(F.lit(0.0))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == region.r_regionkey)
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(stable_round(F.sum(target) / F.sum(_rev()), 6).alias("mkt_share"))
    )


ORACLE_Q8 = f"""
SELECT year(o_orderdate) AS o_year,
       {sql_stable_round(
           f"sum(CASE WHEN sn.n_name = 'NATION_3' THEN {_SQL_REV} "
           f"ELSE 0.0 END) / sum({_SQL_REV})", 6)} AS mkt_share
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN part ON l_partkey = p_partkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation cn ON c_nationkey = cn.n_nationkey
JOIN region ON cn.n_regionkey = r_regionkey
JOIN nation sn ON s_nationkey = sn.n_nationkey
WHERE p_type = 'STANDARD' AND r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1999-01-01'
GROUP BY 1
""".strip()


def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (Q9 shape): profit expression across
    fact⋈fact⋈dims, grouped by supplier nation and order year. Cost is
    proxied by ``p_retailprice`` (no partsupp table in the schema)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_name").contains("widget")
    )
    nation = load_table(spark, sf_dir, "nation")
    profit = _rev() - F.col("p_retailprice") * F.lit(0.01) * F.col("l_quantity")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(supp), li.l_suppkey == supp.s_suppkey)
        .join(F.broadcast(nation), F.col("s_nationkey") == nation.n_nationkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy(F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year"))
        .agg(stable_round(F.sum(profit), 4).alias("sum_profit"))
    )


ORACLE_Q9 = f"""
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       {sql_stable_round(
           f"sum({_SQL_REV} - p_retailprice * 0.01 * l_quantity)", 4)}
           AS sum_profit
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
JOIN nation ON s_nationkey = n_nationkey
JOIN orders ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
""".strip()


def q_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (Q10 shape): revenue lost to returns per
    customer over a quarter-year of orders."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(
            "c_custkey",
            "c_name",
            stable_round(F.col("c_acctbal"), 4).alias("c_acctbal"),
            F.col("n_name"),
        )
        .agg(stable_round(F.sum(_rev()), 4).alias("revenue"))
    )


ORACLE_Q10 = f"""
SELECT c_custkey, c_name,
       {sql_stable_round("c_acctbal", 4)} AS c_acctbal, n_name,
       {sql_stable_round(f"sum({_SQL_REV})", 4)} AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01'
  AND o_orderdate < TIMESTAMP '1997-07-01'
GROUP BY c_custkey, c_name, c_acctbal, n_name
""".strip()


def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important-stock (Q11 shape): per-part value kept only when it
    exceeds a fraction of TOTAL value — the total is a 1-row aggregate
    broadcast into the HAVING predicate (no second scan-shuffle;
    partials reuse the same exchange under AQE)."""
    li = load_table(spark, sf_dir, "lineitem")
    per_part = li.groupBy("l_partkey").agg(F.sum(_rev()).alias("val"))
    total = li.agg((F.sum(_rev()) * F.lit(0.0005)).alias("threshold"))
    return (
        per_part.join(F.broadcast(total))
        .filter(F.col("val") > F.col("threshold"))
        .select("l_partkey", stable_round(F.col("val"), 4).alias("part_value"))
    )


ORACLE_Q11 = f"""
SELECT l_partkey, {sql_stable_round("sum(" + _SQL_REV + ")", 4)} AS part_value
FROM lineitem
GROUP BY l_partkey
HAVING sum({_SQL_REV}) >
       (SELECT sum({_SQL_REV}) * 0.0005 FROM lineitem)
""".strip()


def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer order-count distribution (Q13 shape): LEFT OUTER join
    (the filter lives in the join condition, so customers with no
    matching orders survive with count 0) then a histogram over the
    counts — two chained aggregations."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    per_cust = (
        cust.join(
            orders,
            (cust.c_custkey == orders.o_custkey)
            & (orders.o_orderstatus != F.lit("P")),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


ORACLE_Q13 = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer
  LEFT JOIN orders ON c_custkey = o_custkey AND o_orderstatus <> 'P'
  GROUP BY c_custkey
) t
GROUP BY c_count
""".strip()


def q_orders_basket_size_hist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Order-SHAPE fingerprint: histogram of lineitems per order, with
    each basket size's share of orders and of line volume — the
    basket-size distribution behind co-purchase support thresholds
    (`orders_copurchase` fans out pairs per basket: its cost model IS
    this histogram's second moment) and the order-side sibling of
    Q13's customer-order histogram. Two chained aggregations — the
    per-order count collapses map-side on the lineitem scan's natural
    key, the histogram is ≤ max-basket-size rows; shares are exact
    integer sums divided once."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey")
    per_order = li.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("basket_size")
    )
    hist = per_order.groupBy("basket_size").agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    tot = hist.agg(
        F.sum("n_orders").alias("t_orders"),
        F.sum(F.col("n_orders") * F.col("basket_size")).alias("t_lines"),
    )
    return hist.crossJoin(F.broadcast(tot)).select(
        "basket_size",
        "n_orders",
        stable_round(
            F.col("n_orders").cast("double")
            / F.col("t_orders").cast("double"),
            6,
        ).alias("order_share"),
        stable_round(
            (F.col("n_orders") * F.col("basket_size")).cast("double")
            / F.col("t_lines").cast("double"),
            6,
        ).alias("line_share"),
    )


ORACLE_BASKET_SIZE_HIST = f"""
WITH po AS (
  SELECT l_orderkey, count(*) AS basket_size FROM lineitem GROUP BY 1
), h AS (
  SELECT basket_size, count(*) AS n_orders FROM po GROUP BY 1
), t AS (
  SELECT CAST(sum(n_orders) AS BIGINT) AS t_orders,
         CAST(sum(n_orders * basket_size) AS BIGINT) AS t_lines
  FROM h
)
SELECT h.basket_size, h.n_orders,
       {sql_stable_round(
           "h.n_orders::DOUBLE / t.t_orders::DOUBLE", 6)} AS order_share,
       {sql_stable_round(
           "(h.n_orders * h.basket_size)::DOUBLE / t.t_lines::DOUBLE",
           6)} AS line_share
FROM h CROSS JOIN t
""".strip()


def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier-count stats (Q16 shape): DISTINCT supplier count per
    part group, excluding a NOT IN supplier set (left anti join against
    a broadcast exclusion list)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_type") != "PROMO")
    excl = (
        load_table(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") < 2000)
        .select(F.col("s_suppkey").alias("excl_key"))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(
            F.broadcast(excl), li.l_suppkey == F.col("excl_key"), "left_anti"
        )
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct(F.col("l_suppkey")).alias("supplier_cnt"))
    )


ORACLE_Q16 = """
SELECT p_brand, p_size, count(DISTINCT l_suppkey) AS supplier_cnt
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE p_type <> 'PROMO'
  AND l_suppkey NOT IN
      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 2000)
GROUP BY p_brand, p_size
""".strip()


def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (Q17 shape): the correlated
    "l_quantity < fraction·avg(l_quantity) for this part" subquery
    becomes a join back against the per-part aggregate (broadcast: one
    row per part, bounded by |part|)."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#1")
    per_part = li.groupBy(F.col("l_partkey").alias("avg_partkey")).agg(
        (F.avg("l_quantity") * F.lit(0.5)).alias("half_avg_qty")
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .join(F.broadcast(per_part), li.l_partkey == F.col("avg_partkey"))
        .filter(F.col("l_quantity") < F.col("half_avg_qty"))
        .agg(
            stable_round(F.sum("l_extendedprice") / F.lit(7.0), 4).alias(
                "avg_yearly"
            )
        )
    )


ORACLE_Q17 = f"""
SELECT {sql_stable_round("sum(l_extendedprice) / 7.0", 4)} AS avg_yearly
FROM lineitem l
JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#1'
  AND l_quantity < (SELECT 0.5 * avg(l_quantity) FROM lineitem
                    WHERE l_partkey = l.l_partkey)
""".strip()


def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Waiting-supplier count (Q21 shape): per-supplier rows that need
    BOTH a correlated EXISTS (another supplier contributed to the same
    order) and a correlated NOT EXISTS (no OTHER supplier's lines were
    returned) against the same fact table — a left-semi plus a
    left-anti self-join, both keyed on l_orderkey so they share one
    co-partitioning. Adapted: "kept orders waiting" is proxied by
    return flags (the schema has no commit/receipt dates)."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "F"
    )
    supp = load_table(spark, sf_dir, "supplier")
    l1 = (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == orders.o_orderkey)
        .select("l_orderkey", "l_suppkey")
        .alias("l1")
    )
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    survived = (
        l1.join(
            l2,
            (F.col("l1.l_orderkey") == F.col("l2.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l2.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l1.l_orderkey") == F.col("l3.l_orderkey"))
            & (F.col("l1.l_suppkey") != F.col("l3.l_suppkey")),
            "left_anti",
        )
    )
    return (
        survived.join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


ORACLE_Q21 = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders ON l1.l_orderkey = o_orderkey
JOIN supplier ON l1.l_suppkey = s_suppkey
WHERE l1.l_returnflag = 'R' AND o_orderstatus = 'F'
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_returnflag = 'R')
GROUP BY s_name
""".strip()


def q_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-mode priority counts (Q12 shape): fact⋈fact join plus
    two conditional counts (CASE inside SUM) grouped by a line
    attribute. Adapted: ``l_linestatus`` stands in for ``l_shipmode``
    and "late" means shipped >60 days after the order date (the schema
    has no commit/receipt dates). One shuffle join on orderkey, one
    groupBy over a 2-value key — the partial aggregation collapses
    everything map-side."""
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    late = F.col("l_shipdate") > F.expr("o_orderdate + INTERVAL 60 DAY")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .filter(late)
        .groupBy(F.col("l_linestatus").alias("ship_class"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


ORACLE_Q12 = """
SELECT l_linestatus AS ship_class,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_linestatus
""".strip()


def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (Q15 shape): a revenue "view" (per-supplier agg
    over a 3-month slice) consumed twice — once for the rows, once
    reduced to a 1-row MAX that is broadcast back as the filter.
    Revenue is rounded before the max/equality so the tie-break is
    identical in Spark and the oracle. The per-supplier aggregate is
    tiny (bounded by |supplier|), so the self-consumption costs one
    broadcast, not a rescan of lineitem."""
    li = load_table(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    supp = load_table(spark, sf_dir, "supplier")
    revenue = li.groupBy("l_suppkey").agg(
        stable_round(F.sum(_rev()), 4).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.join(
            F.broadcast(top), F.col("total_revenue") == F.col("max_revenue")
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == supp.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )


ORACLE_Q15 = f"""
WITH revenue AS (
  SELECT l_suppkey,
         {sql_stable_round("sum(" + _SQL_REV + ")", 4)} AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM revenue
JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
""".strip()


def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Excess-inventory suppliers (Q20 shape): a LEFT SEMI join whose
    right side is itself an aggregate-with-HAVING over a filtered
    part⋈lineitem join — the nested-subquery chain of the original,
    flattened into semi-joins Catalyst can reorder. Adapted: with no
    partsupp table, "excess availability" is proxied by per-(supplier,
    part) shipped quantity exceeding a threshold for 'widget' parts.
    The part filter is broadcast into the lineitem scan, so the only
    shuffle is the (partkey, suppkey) groupBy; supplier then
    semi-joins the small survivor set (broadcast)."""
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier").filter(
        F.col("s_nationkey") < 10
    )
    widget = (
        load_table(spark, sf_dir, "part")
        .filter(F.col("p_name").endswith("widget"))
        .select("p_partkey")
    )
    heavy = (
        li.join(F.broadcast(widget), li.l_partkey == F.col("p_partkey"), "left_semi")
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
        .select("l_suppkey")
    )
    return (
        supp.join(
            F.broadcast(heavy), supp.s_suppkey == F.col("l_suppkey"), "left_semi"
        )
        .select("s_suppkey", "s_name")
    )


ORACLE_Q20 = """
SELECT s_suppkey, s_name
FROM supplier
WHERE s_nationkey < 10
  AND s_suppkey IN (
    SELECT l_suppkey
    FROM lineitem
    WHERE l_partkey IN (SELECT p_partkey FROM part
                        WHERE p_name LIKE '%widget')
    GROUP BY l_partkey, l_suppkey
    HAVING sum(l_quantity) > 50
  )
""".strip()


def q_supplier_scorecard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-supplier fulfilment scorecard: lineitem volume, revenue
    (exact e6 cents algebra), average ship delay, and the late
    fraction (>30 days) — the vendor-review table procurement runs
    quarterly. fact⋈fact on the order key for dates, then ONE
    aggregation keyed by supplier with the supplier dim broadcast in
    at the end; top-20 by revenue with a (revenue desc, suppkey)
    deterministic tie-break so the result is bounded at any scale."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_suppkey",
        "l_orderkey",
        F.to_date("l_shipdate").alias("ship_d"),
        (
            _e2(F.col("l_extendedprice"))
            * (F.lit(100) - _e2(F.col("l_discount")))
        ).alias("rev_e4"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.to_date("o_orderdate").alias("order_d"),
    )
    j = li.join(orders, "l_orderkey").select(
        "l_suppkey",
        "rev_e4",
        F.datediff(F.col("ship_d"), F.col("order_d"))
        .cast("long")
        .alias("delay_d"),
    )
    per_supp = j.groupBy("l_suppkey").agg(
        F.count(F.lit(1)).alias("n_items"),
        F.sum(F.col("rev_e4").cast("decimal(38,0)")).alias("rev_e4"),
        F.sum("delay_d").alias("delay_sum"),
        F.sum((F.col("delay_d") > 30).cast("long")).alias("n_late"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"), "s_name"
    )
    scored = per_supp.join(F.broadcast(supp), "l_suppkey").select(
        F.col("l_suppkey").alias("suppkey"),
        "s_name",
        "n_items",
        stable_round(
            F.col("rev_e4").cast("double") / F.lit(1e4), 2
        ).alias("revenue"),
        stable_round(
            F.col("delay_sum").cast("double")
            / F.col("n_items").cast("double"),
            4,
        ).alias("avg_delay_d"),
        stable_round(
            F.col("n_late").cast("double") / F.col("n_items").cast("double"),
            6,
        ).alias("late_frac"),
    )
    return (
        scored.orderBy(F.col("revenue").desc(), "suppkey").limit(20)
    )


ORACLE_SUPPLIER_SCORECARD = f"""
WITH j AS (
  SELECT l.l_suppkey,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
           AS rev_e4,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
), per_supp AS (
  SELECT l_suppkey, count(*) AS n_items,
         sum(CAST(rev_e4 AS HUGEINT)) AS rev_e4,
         sum(delay_d) AS delay_sum,
         CAST(coalesce(sum(CASE WHEN delay_d > 30 THEN 1 ELSE 0 END), 0)
           AS BIGINT) AS n_late
  FROM j GROUP BY l_suppkey
)
SELECT p.l_suppkey AS suppkey, s.s_name, p.n_items,
       {sql_stable_round("CAST(p.rev_e4 AS DOUBLE) / 1e4", 2)} AS revenue,
       {sql_stable_round(
           "CAST(p.delay_sum AS DOUBLE) / CAST(p.n_items AS DOUBLE)", 4
       )} AS avg_delay_d,
       {sql_stable_round(
           "CAST(p.n_late AS DOUBLE) / CAST(p.n_items AS DOUBLE)", 6
       )} AS late_frac
FROM per_supp p JOIN supplier s ON s.s_suppkey = p.l_suppkey
ORDER BY revenue DESC, suppkey
LIMIT 20
""".strip()


def q_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full supplier-nation × customer-nation trade-flow matrix with
    per-pair balance — Q7's two-nation filter generalized to the whole
    grid (the 'who sells to whom' readout). Both nation dims broadcast
    onto the fact⋈fact join; revenue in exact e4 fixed point; the
    output is bounded by |nations|² regardless of fact size. Balance =
    flow(a→b) − flow(b→a) via a self-join of the AGGREGATED matrix on
    the swapped key (tiny relation, no second fact scan)."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_suppkey",
        (
            _e2(F.col("l_extendedprice"))
            * (F.lit(100) - _e2(F.col("l_discount")))
        ).alias("rev_e4"),
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"), "o_custkey"
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"),
        F.col("c_nationkey").alias("cust_nk"),
    )
    supp = load_table(spark, sf_dir, "supplier").select(
        F.col("s_suppkey").alias("l_suppkey"),
        F.col("s_nationkey").alias("supp_nk"),
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    flows = (
        li.join(orders, "l_orderkey")
        .join(F.broadcast(cust), "o_custkey")
        .join(F.broadcast(supp), "l_suppkey")
        .groupBy("supp_nk", "cust_nk")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.col("rev_e4").cast("decimal(38,0)")).alias("rev_e4"),
        )
        # r11 (guide §2.4): the matrix feeds BOTH sides of the
        # swapped-key balance self-join — uncached, the fact⋈fact
        # join re-executed per side (every base table scanned twice);
        # the relation is bounded at |nations|².
        .cache()
    )
    rev = (
        flows.alias("f")
        .join(
            flows.select(
                F.col("supp_nk").alias("cust_nk"),
                F.col("cust_nk").alias("supp_nk"),
                F.col("rev_e4").alias("rev_back_e4"),
            ).alias("b"),
            ["supp_nk", "cust_nk"],
            "left",
        )
    )
    named = (
        rev.join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("supp_nk"),
                    F.col("n_name").alias("exporter"),
                )
            ),
            "supp_nk",
        )
        .join(
            F.broadcast(
                nation.select(
                    F.col("n_nationkey").alias("cust_nk"),
                    F.col("n_name").alias("importer"),
                )
            ),
            "cust_nk",
        )
    )
    return named.select(
        "exporter",
        "importer",
        "n_items",
        stable_round(
            F.col("rev_e4").cast("double") / F.lit(1e4), 2
        ).alias("export_value"),
        stable_round(
            (
                F.col("rev_e4")
                - F.coalesce(
                    F.col("rev_back_e4"), F.lit(0).cast("decimal(38,0)")
                )
            ).cast("double")
            / F.lit(1e4),
            2,
        ).alias("balance"),
    )


ORACLE_NATION_TRADE = f"""
WITH flows AS (
  SELECT s.s_nationkey AS supp_nk, c.c_nationkey AS cust_nk,
         count(*) AS n_items,
         sum(CAST(CAST(floor(l.l_extendedprice * 100 + 0.5) AS BIGINT)
             * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
             AS HUGEINT)) AS rev_e4
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  GROUP BY 1, 2
)
SELECT ns.n_name AS exporter, nc.n_name AS importer, f.n_items,
       {sql_stable_round("CAST(f.rev_e4 AS DOUBLE) / 1e4", 2)}
         AS export_value,
       {sql_stable_round(
           "CAST(f.rev_e4 - coalesce(b.rev_e4, 0) AS DOUBLE) / 1e4", 2
       )} AS balance
FROM flows f
LEFT JOIN flows b
  ON b.supp_nk = f.cust_nk AND b.cust_nk = f.supp_nk
JOIN nation ns ON ns.n_nationkey = f.supp_nk
JOIN nation nc ON nc.n_nationkey = f.cust_nk
""".strip()


# ------------------------------- per-part supplier price dispersion


_PS_TOP = 20


def q_brand_supplier_concentration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SUPPLY-RISK concentration per part brand: how much of a
    brand's shipped quantity comes from its single biggest supplier
    (top share) and how concentrated the whole supplier mix is
    (HHI = Σ share²) — the procurement counterpart of
    `orders_concentration_hhi`'s revenue lens: a brand at HHI → 1 is
    one supplier failure away from a stock-out.

    Exactness: quantities ride as exact integer units; top share and
    HHI are single divisions of exact BIGINT/DEC38 terms (Σq_s² vs
    Q², HUGEINT in DuckDB), so both engines emit identical doubles.

    Scale: one (brand, supplier)-keyed aggregate over lineitem⋈part
    (broadcast part dim projected to two columns), then a brand-keyed
    rollup of the |brands|×|suppliers|-bounded relation — max/sum,
    no windows."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.col("l_quantity").cast("long").alias("q"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    per_supp = (
        li.join(
            F.broadcast(part), li["l_partkey"] == part["p_partkey"]
        )
        .groupBy("p_brand", "l_suppkey")
        .agg(
            F.sum("q").alias("qs"),
            F.countDistinct("l_partkey").alias("np"),
        )
    )
    dec = "decimal(38,0)"
    per_brand = per_supp.groupBy("p_brand").agg(
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        F.sum("np").alias("n_part_links"),
        F.sum("qs").alias("q_total"),
        F.max("qs").alias("q_top"),
        F.sum(F.col("qs").cast(dec) * F.col("qs").cast(dec)).alias(
            "q2"
        ),
    )
    return per_brand.select(
        F.col("p_brand").alias("brand"),
        "n_suppliers",
        "q_total",
        stable_round(
            F.col("q_top").cast("double") / F.col("q_total").cast("double"),
            6,
        ).alias("top_supplier_share"),
        stable_round(
            F.col("q2").cast("double")
            / (
                F.col("q_total").cast(dec) * F.col("q_total").cast(dec)
            ).cast("double"),
            6,
        ).alias("hhi"),
    )


ORACLE_BRAND_SUPPLIER_CONC = f"""
WITH per AS (
  SELECT p.p_brand, l.l_suppkey,
         CAST(sum(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS qs
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2
), b AS (
  SELECT p_brand, count(*) AS n_suppliers,
         CAST(sum(qs) AS BIGINT) AS q_total,
         CAST(max(qs) AS BIGINT) AS q_top,
         sum(CAST(qs AS HUGEINT) * qs) AS q2
  FROM per GROUP BY 1
)
SELECT p_brand AS brand, CAST(n_suppliers AS BIGINT) AS n_suppliers,
       q_total,
       {sql_stable_round(
           "CAST(q_top AS DOUBLE) / CAST(q_total AS DOUBLE)", 6)}
         AS top_supplier_share,
       {sql_stable_round(
           "CAST(q2 AS DOUBLE)"
           " / CAST(CAST(q_total AS HUGEINT) * q_total AS DOUBLE)",
           6)} AS hhi
FROM b
""".strip()


def q_part_price_spread(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Procurement price-dispersion audit: for each part, the unit
    price (extendedprice/quantity, exact cents via cross-multiplied
    integer comparison order) across its suppliers — widest-spread
    top-20, the "same part, why is supplier B 40% dearer" readout.
    Unit prices carry as e2 BIGINTs (floor of the one division, which
    both engines compute from the same integers); the per-part agg is
    one shuffle on partkey, brand joins back broadcast; top-20 by
    (spread, partkey) is TakeOrdered."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        "l_suppkey",
        F.floor(
            F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
            / F.col("l_quantity")
        )
        .cast("long")
        .alias("unit_e2"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    g = li.groupBy("l_partkey").agg(
        F.count_distinct("l_suppkey").alias("n_suppliers"),
        F.count(F.lit(1)).alias("n_lines"),
        F.min("unit_e2").alias("min_e2"),
        F.max("unit_e2").alias("max_e2"),
    )
    spread = F.col("max_e2") - F.col("min_e2")
    return (
        g.join(F.broadcast(part), g["l_partkey"] == part["p_partkey"])
        .select(
            F.col("l_partkey").alias("partkey"),
            "p_brand",
            "n_suppliers",
            "n_lines",
            stable_round(F.col("min_e2") / F.lit(100.0), 2).alias(
                "unit_min"
            ),
            stable_round(F.col("max_e2") / F.lit(100.0), 2).alias(
                "unit_max"
            ),
            stable_round(spread / F.lit(100.0), 2).alias("unit_spread"),
        )
        .orderBy(F.col("unit_spread").desc(), F.col("partkey"))
        .limit(_PS_TOP)
    )


ORACLE_PART_PRICE_SPREAD = f"""
WITH li AS (
  SELECT l_partkey, l_suppkey,
         CAST(floor(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    / l_quantity) AS BIGINT) AS unit_e2
  FROM lineitem
),
g AS (
  SELECT l_partkey,
         count(DISTINCT l_suppkey) AS n_suppliers,
         count(*) AS n_lines,
         min(unit_e2) AS min_e2, max(unit_e2) AS max_e2
  FROM li GROUP BY 1
)
SELECT g.l_partkey AS partkey, p.p_brand,
       CAST(n_suppliers AS BIGINT) AS n_suppliers, n_lines,
       {sql_stable_round("min_e2 / 100.0", 2)} AS unit_min,
       {sql_stable_round("max_e2 / 100.0", 2)} AS unit_max,
       {sql_stable_round("(max_e2 - min_e2) / 100.0", 2)} AS unit_spread
FROM g JOIN part p ON p.p_partkey = g.l_partkey
ORDER BY unit_spread DESC, partkey
LIMIT {_PS_TOP}
""".strip()


# ------------------------------------- return rate per part brand


def q_lineitem_return_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Goods-quality screen: per part brand, the fraction of line
    items returned (l_returnflag = 'R') with the revenue at stake —
    the supplier-quality readout behind Q10's per-customer returns
    view (Q10 asks who returned; this asks WHAT gets returned).
    Exact-integer counts/cents, one brand-keyed aggregate through the
    broadcast part dim, rate as one final division."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.col("l_returnflag") == "R").cast("long").alias("ret"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    g = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum("ret").alias("n_returned"),
            F.sum(F.col("ret") * F.col("e2")).alias("ret_e2"),
        )
    )
    return g.select(
        "p_brand",
        "n_lines",
        "n_returned",
        stable_round(
            F.col("n_returned").cast("double")
            / F.col("n_lines").cast("double"),
            6,
        ).alias("return_rate"),
        stable_round(F.col("ret_e2") / F.lit(100.0), 2).alias(
            "returned_revenue"
        ),
    )


ORACLE_RETURN_RATE = f"""
WITH li AS (
  SELECT l_partkey,
         CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS ret,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS e2
  FROM lineitem
)
SELECT p.p_brand,
       count(*) AS n_lines,
       CAST(sum(ret) AS BIGINT) AS n_returned,
       {sql_stable_round(
           "CAST(sum(ret) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6
       )} AS return_rate,
       {sql_stable_round("CAST(sum(ret * e2) AS DOUBLE) / 100.0", 2)}
         AS returned_revenue
FROM li JOIN part p ON p.p_partkey = li.l_partkey
GROUP BY p.p_brand
""".strip()


# ----------------------------------- discount-band volume uplift


def q_lineitem_discount_uplift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Does discounting move volume? Per integer discount band
    (percent), line count, avg quantity, and gross-vs-net revenue —
    the pricing-policy readout behind TPC-H Q6's single-band filter
    (Q6 asks one band's forgone revenue; this sweeps the whole
    schedule). All-integer cents until the final divisions; bands are
    exact e2 percent buckets, one scan → ≤ ~11-row aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("disc_pct"),
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("gross_e2"),
    )
    g = li.groupBy("disc_pct").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum("qty").alias("total_qty"),
        F.sum("gross_e2").alias("gross_e2"),
        F.sum(
            F.col("gross_e2") * (F.lit(100) - F.col("disc_pct"))
        ).alias("net_e4"),
    )
    return g.select(
        "disc_pct",
        "n_lines",
        stable_round(
            F.col("total_qty").cast("double")
            / F.col("n_lines").cast("double"),
            4,
        ).alias("avg_qty"),
        stable_round(F.col("gross_e2") / F.lit(100.0), 2).alias(
            "gross_revenue"
        ),
        stable_round(F.col("net_e4") / F.lit(1e4), 2).alias(
            "net_revenue"
        ),
    )


ORACLE_DISCOUNT_UPLIFT = f"""
WITH li AS (
  SELECT CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
         CAST(l_quantity AS BIGINT) AS qty,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS gross_e2
  FROM lineitem
)
SELECT disc_pct, count(*) AS n_lines,
       {sql_stable_round(
           "CAST(sum(qty) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4
       )} AS avg_qty,
       {sql_stable_round("CAST(sum(gross_e2) AS DOUBLE) / 100.0", 2)}
         AS gross_revenue,
       {sql_stable_round(
           "CAST(sum(gross_e2 * (100 - disc_pct)) AS DOUBLE) / 1e4", 2
       )} AS net_revenue
FROM li GROUP BY disc_pct
""".strip()


# --------------------------------- region revenue year-over-year growth


def q_region_revenue_yoy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Year-over-year revenue growth per region — the board-deck
    companion to ``orders_nrr``'s month-over-month retention math:
    same lag-the-aggregate shape, coarser grain, growth as one
    division of exact BIGINTs. The fact scan aggregates straight to
    (region, year) partials (customer→nation→region ride as broadcast
    dims on the fact's custkey); the lag window runs over the
    |regions|×|years| matrix (~35 rows), never the fact."""
    from pyspark.sql import Window

    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_regionkey"
    )
    region = load_table(spark, sf_dir, "region").select(
        "r_regionkey", "r_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.year("o_orderdate").alias("yr"),
        F.floor(F.col("o_totalprice")).cast("long").alias("rev"),
    )
    g = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .join(
            F.broadcast(nation),
            cust["c_nationkey"] == nation["n_nationkey"],
        )
        .join(
            F.broadcast(region),
            nation["n_regionkey"] == region["r_regionkey"],
        )
        .groupBy("r_name", "yr")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("rev").alias("revenue"),
        )
    )
    w = Window.partitionBy("r_name").orderBy("yr")
    prev = F.lag("revenue").over(w)
    return g.select(
        F.col("r_name").alias("region"),
        F.col("yr").alias("year"),
        "n_orders",
        "revenue",
        stable_round(
            (F.col("revenue") - prev).cast("double") / prev.cast("double"),
            6,
        ).alias("yoy_growth"),
    )


ORACLE_REGION_YOY = f"""
WITH g AS (
  SELECT r.r_name AS region, year(o.o_orderdate) AS yr,
         count(*) AS n_orders,
         CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT)
           AS revenue
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT region, CAST(yr AS INTEGER) AS year, n_orders, revenue,
       {sql_stable_round(
           "CAST(revenue - lag(revenue) OVER "
           "(PARTITION BY region ORDER BY yr) AS DOUBLE)"
           " / CAST(lag(revenue) OVER "
           "(PARTITION BY region ORDER BY yr) AS DOUBLE)", 6
       )} AS yoy_growth
FROM g
""".strip()


def q_lineitem_price_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LASPEYRES and PAASCHE price indices per ship year (r8) — the
    index-number economics every pricing/finance team runs on a fact
    table: how did prices move vs the BASE year, holding the basket
    fixed at base-year quantities (Laspeyres) or current-year
    quantities (Paasche). Per (part, year) the unit price is the
    quantity-weighted Σext/Σqty — both kept as exact e2/integer sums;
    the index sums per-part cross terms price_t·qty_w as doubles and
    rounds to 4 (the cross-engine double contract every ratio report
    here uses). Parts missing in either compared year drop from that
    pair (the standard matched-basket rule).

    Plan: one groupBy (part, year) over the projected fact columns,
    base-year slice broadcast back (bounded by |part|), per-year
    groupBy for the two Σ-ratios — no self-join of the fact table."""
    li = load_table(spark, sf_dir, "lineitem").select(
        F.col("l_partkey").alias("pk"),
        F.year("l_shipdate").alias("yr"),
        F.col("l_extendedprice").alias("ext"),
        F.col("l_quantity").alias("qty"),
    )
    # r11 (guide §2.4): the |parts|×|years| unit-price rollup feeds
    # the base-year scalar, the base-slice broadcast AND the index
    # join — uncached, the lineitem scan re-executed per consumer
    # (3 FileScans → 1).
    per = li.groupBy("pk", "yr").agg(
        F.floor(F.sum(F.col("ext") * F.lit(100.0)) + F.lit(0.5))
        .cast("long")
        .alias("ext_e2"),
        F.sum(F.col("qty").cast("long")).alias("q"),
    ).cache()
    base_yr = per.agg(F.min("yr").alias("b")).select("b")
    base = (
        per.join(F.broadcast(base_yr), per.yr == F.col("b"))
        .select(
            "pk",
            F.col("ext_e2").alias("ext0_e2"),
            F.col("q").alias("q0"),
        )
    )
    j = per.join(F.broadcast(base), "pk")
    # price_y = ext_e2/(100·q); laspeyres term price_y·q0, paasche
    # term price_y·q_y; denominators use the base price symmetrically
    p_y = F.col("ext_e2").cast("double") / (
        F.lit(100.0) * F.col("q").cast("double")
    )
    p_0 = F.col("ext0_e2").cast("double") / (
        F.lit(100.0) * F.col("q0").cast("double")
    )
    agg = j.groupBy("yr").agg(
        F.count(F.lit(1)).alias("n_parts"),
        F.sum(p_y * F.col("q0").cast("double")).alias("l_num"),
        F.sum(p_0 * F.col("q0").cast("double")).alias("l_den"),
        F.sum(p_y * F.col("q").cast("double")).alias("p_num"),
        F.sum(p_0 * F.col("q").cast("double")).alias("p_den"),
    )
    return agg.select(
        "yr",
        "n_parts",
        stable_round(F.col("l_num") / F.col("l_den") * F.lit(100.0), 4).alias(
            "laspeyres"
        ),
        stable_round(F.col("p_num") / F.col("p_den") * F.lit(100.0), 4).alias(
            "paasche"
        ),
    )


ORACLE_PRICE_INDEX = f"""
WITH per AS (
  SELECT l_partkey AS pk, year(l_shipdate) AS yr,
         CAST(floor(sum(l_extendedprice * 100.0) + 0.5) AS BIGINT)
           AS ext_e2,
         CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS q
  FROM lineitem GROUP BY 1, 2
), b AS (
  SELECT min(yr) AS byr FROM per
), base AS (
  SELECT pk, ext_e2 AS ext0_e2, q AS q0
  FROM per, b WHERE per.yr = b.byr
), j AS (
  SELECT per.yr, per.pk,
         CAST(per.ext_e2 AS DOUBLE) / (100.0 * per.q) AS p_y,
         CAST(base.ext0_e2 AS DOUBLE) / (100.0 * base.q0) AS p_0,
         CAST(per.q AS DOUBLE) AS qy, CAST(base.q0 AS DOUBLE) AS q0
  FROM per JOIN base USING (pk)
)
SELECT yr, count(*) AS n_parts,
       {sql_stable_round("sum(p_y * q0) / sum(p_0 * q0) * 100.0", 4)}
         AS laspeyres,
       {sql_stable_round("sum(p_y * qy) / sum(p_0 * qy) * 100.0", 4)}
         AS paasche
FROM j GROUP BY 1
""".strip()


# ----------------------------------------- log-log price elasticity

_DEC_EL = "decimal(38,0)"


def q_lineitem_price_elasticity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Own-price ELASTICITY of demand per part brand (the log-log
    regression econometrics runs on transaction data): ε = slope of
    OLS ln(quantity) ~ ln(unit price) over a brand's line items —
    ε ≈ −1 means revenue-neutral pricing, ε near 0 means demand
    ignores price. Completes the pricing family: `part_price_spread`
    (how much price varies), `lineitem_price_index` (how prices
    move), elasticity (what that movement DOES to volume).

    Exactness: both logs quantize to e6 fixed point BEFORE
    aggregation (floor(ln·10⁶+½) — IEEE ln identical both engines;
    raw float Σln is summation-order dependent), unit price itself an
    exact e2 integer ratio (extprice·100 div qty, cents). The OLS
    moments are exact BIGINT/DEC38 sums; slope and r² are single
    divisions. Brands with zero price variance report NULL ε.

    Scale: one lineitem⋈part broadcast-dim join, brand-keyed
    aggregate with map-side partials, brand-sized output.
    """
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.col("l_quantity").cast("long").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("ext_e2"),
    ).filter(F.col("qty") > 0)
    j = li.join(
        F.broadcast(part), li["l_partkey"] == part["p_partkey"]
    ).select(
        "p_brand",
        F.floor(
            F.log(F.col("qty").cast("double")) * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("y"),
        F.floor(
            F.log(
                F.expr("ext_e2 div qty").cast("double") / F.lit(100.0)
            )
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("x"),
    )
    s = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(_DEC_EL) * F.col("y").cast(_DEC_EL)).alias(
            "sxy"
        ),
        F.sum(F.col("x").cast(_DEC_EL) * F.col("x").cast(_DEC_EL)).alias(
            "sxx"
        ),
        F.sum(F.col("y").cast(_DEC_EL) * F.col("y").cast(_DEC_EL)).alias(
            "syy"
        ),
    )
    nd = F.col("n").cast(_DEC_EL)
    cov = (nd * F.col("sxy") - F.col("sx").cast(_DEC_EL) * F.col("sy").cast(_DEC_EL)).cast("double")
    vx = (nd * F.col("sxx") - F.col("sx").cast(_DEC_EL) * F.col("sx").cast(_DEC_EL)).cast("double")
    vy = (nd * F.col("syy") - F.col("sy").cast(_DEC_EL) * F.col("sy").cast(_DEC_EL)).cast("double")
    eps = F.when(vx != 0, cov / vx)
    r = cov / F.sqrt(vx) / F.sqrt(vy)
    r2 = F.when((vx != 0) & (vy != 0), r * r)
    return s.select(
        F.col("p_brand").alias("brand"),
        F.col("n").alias("n_lines"),
        stable_round(eps, 6).alias("elasticity"),
        stable_round(r2, 6).alias("r2"),
    )


ORACLE_ELASTICITY = f"""
WITH j AS (
  SELECT p.p_brand,
         CAST(floor(ln(CAST(l.l_quantity AS DOUBLE)) * 1000000.0
                    + 0.5) AS BIGINT) AS y,
         CAST(floor(ln(CAST((CAST(floor(l.l_extendedprice * 100 + 0.5)
                              AS BIGINT) // CAST(l.l_quantity AS BIGINT))
                             AS DOUBLE) / 100.0)
                    * 1000000.0 + 0.5) AS BIGINT) AS x
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  WHERE CAST(l.l_quantity AS BIGINT) > 0
), s AS (
  SELECT p_brand, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM j GROUP BY 1
), f AS (
  SELECT p_brand, n,
         CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) AS cov,
         CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE) AS vx,
         CAST(n * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE) AS vy
  FROM s
)
SELECT p_brand AS brand, CAST(n AS BIGINT) AS n_lines,
       {sql_stable_round("CASE WHEN vx != 0 THEN cov / vx END", 6)}
         AS elasticity,
       {sql_stable_round(
           "CASE WHEN vx != 0 AND vy != 0"
           " THEN (cov / sqrt(vx) / sqrt(vy))"
           " * (cov / sqrt(vx) / sqrt(vy)) END", 6)}
         AS r2
FROM f
""".strip()


_PERFECT_SLA_DAYS = (30, 60, 90)


def q_orders_perfect_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PERFECT-ORDER RATE by priority (the classical fulfillment KPI):
    the fraction of orders whose EVERY lineitem shipped within 30/60/
    90 days of the order date — an order is only as good as its
    slowest line, so this is an ALL-aggregate (max ship delay per
    order), not the per-line average the ship-delay row reports.

    Exactness: the per-order max delay is exact integer days; the
    three rates are counts over counts, ONE division each.

    Scale: fact⋈fact equi-join on the order key (the Q3/Q18 shape,
    both sides shuffle-partitioned on l_orderkey/o_orderkey), one
    order-sized max aggregate, then a |priorities|-sized rollup."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    per_order = (
        li.join(
            orders,
            li.l_orderkey == orders.o_orderkey,
        )
        .groupBy("o_orderkey", "o_orderpriority")
        .agg(
            F.max(
                F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
            ).alias("worst_days")
        )
    )
    agg = per_order.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        *[
            F.sum(
                F.when(F.col("worst_days") <= d, 1).otherwise(0)
            ).alias(f"n_within_{d}d")
            for d in _PERFECT_SLA_DAYS
        ],
    )
    out = agg.select(
        "o_orderpriority",
        "n_orders",
        *[
            stable_round(
                F.col(f"n_within_{d}d").cast("double")
                / F.col("n_orders").cast("double"),
                6,
            ).alias(f"perfect_rate_{d}d")
            for d in _PERFECT_SLA_DAYS
        ],
    )
    return out.orderBy("o_orderpriority")


ORACLE_PERFECT_RATE = f"""
WITH per_order AS (
  SELECT o.o_orderkey, o.o_orderpriority,
         max(date_diff('day', o.o_orderdate, l.l_shipdate))
           AS worst_days
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  GROUP BY 1, 2
), agg AS (
  SELECT o_orderpriority, count(*) AS n_orders,
         {", ".join(
             f"sum(CASE WHEN worst_days <= {d} THEN 1 ELSE 0 END)"
             f" AS n_within_{d}d"
             for d in _PERFECT_SLA_DAYS
         )}
  FROM per_order GROUP BY 1
)
SELECT o_orderpriority, n_orders,
       {", ".join(
           sql_stable_round(
               f"CAST(n_within_{d}d AS DOUBLE) / n_orders", 6
           ) + f" AS perfect_rate_{d}d"
           for d in _PERFECT_SLA_DAYS
       )}
FROM agg ORDER BY o_orderpriority
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "orders_perfect_rate": q_orders_perfect_rate,
    "lineitem_price_elasticity": q_lineitem_price_elasticity,
    "lineitem_price_index": q_lineitem_price_index,
    "region_revenue_yoy": q_region_revenue_yoy,
    "part_price_spread": q_part_price_spread,
    "brand_supplier_concentration": q_brand_supplier_concentration,
    "lineitem_discount_uplift": q_lineitem_discount_uplift,
    "lineitem_return_rate": q_lineitem_return_rate,
    "supplier_scorecard": q_supplier_scorecard,
    "nation_trade_matrix": q_nation_trade_matrix,
    "tpch_q7_two_nation": q_tpch_q7,
    "tpch_q8_mkt_share": q_tpch_q8,
    "tpch_q9_profit": q_tpch_q9,
    "tpch_q10_returns": q_tpch_q10,
    "tpch_q11_fraction": q_tpch_q11,
    "tpch_q12_latecount": q_tpch_q12,
    "tpch_q13_histogram": q_tpch_q13,
    "orders_basket_size_hist": q_orders_basket_size_hist,
    "tpch_q15_topsupp": q_tpch_q15,
    "tpch_q20_excess": q_tpch_q20,
    "tpch_q16_suppcnt": q_tpch_q16,
    "tpch_q17_avg_qty": q_tpch_q17,
    "tpch_q21_waiting": q_tpch_q21,
}

ORACLES: dict[str, str] = {
    "orders_perfect_rate": ORACLE_PERFECT_RATE,
    "lineitem_price_elasticity": ORACLE_ELASTICITY,
    "region_revenue_yoy": ORACLE_REGION_YOY,
    "part_price_spread": ORACLE_PART_PRICE_SPREAD,
    "brand_supplier_concentration": ORACLE_BRAND_SUPPLIER_CONC,
    "lineitem_discount_uplift": ORACLE_DISCOUNT_UPLIFT,
    "lineitem_return_rate": ORACLE_RETURN_RATE,
    "supplier_scorecard": ORACLE_SUPPLIER_SCORECARD,
    "nation_trade_matrix": ORACLE_NATION_TRADE,
    "tpch_q7_two_nation": ORACLE_Q7,
    "tpch_q8_mkt_share": ORACLE_Q8,
    "tpch_q9_profit": ORACLE_Q9,
    "tpch_q10_returns": ORACLE_Q10,
    "tpch_q11_fraction": ORACLE_Q11,
    "tpch_q12_latecount": ORACLE_Q12,
    "tpch_q13_histogram": ORACLE_Q13,
    "orders_basket_size_hist": ORACLE_BASKET_SIZE_HIST,
    "tpch_q15_topsupp": ORACLE_Q15,
    "tpch_q20_excess": ORACLE_Q20,
    "tpch_q16_suppcnt": ORACLE_Q16,
    "tpch_q17_avg_qty": ORACLE_Q17,
    "tpch_q21_waiting": ORACLE_Q21,
    "lineitem_price_index": ORACLE_PRICE_INDEX,
}
