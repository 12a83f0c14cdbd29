"""Extended analytical query shapes beyond the core TPC-H set.

Each adds a distinct relational capability to the §2 inventory:
semi-join (EXISTS), anti-join + scalar subquery (NOT EXISTS), a
disjunctive join predicate, argmax-per-group via join-back (the
correlated-max-subquery shape of TPC-H Q2), ROLLUP grouping sets, and
pivot (wide conditional aggregation).

Scale posture mirrors plans/tpch.py: dimension sides broadcast; the
fact side shuffles at most once on its join/group key; scalar
subqueries become broadcast cross-joins of a 1-row aggregate (never a
whole-table window, which would serialize on a single partition).
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


def q_tpch_q4_semijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority checking (TPC-H Q4 shape): orders that have at
    least one returned line item, counted per priority. EXISTS compiles
    to LEFT SEMI — one shuffle pair on the order key, no row
    duplication, AQE free to pick the build side."""
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-01-01"))
    )
    returned = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_returnflag") == "R"
    )
    return (
        orders.join(
            returned, orders.o_orderkey == returned.l_orderkey, "left_semi"
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


ORACLE_Q4 = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
""".strip()


def q_tpch_q22_antijoin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape): above-average-balance
    customers with NO orders, per market segment. The scalar subquery
    (global avg) is a 1-row aggregate broadcast-cross-joined onto the
    scan — not a whole-table window, which would funnel every row
    through one partition. NOT EXISTS compiles to LEFT ANTI. Scoped to
    "no orders since 2000-07-01" (churn shape) because the synthetic
    FK coverage is dense — an unscoped anti-join is empty."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("2000-07-01")
    )
    avg_bal = cust.agg(F.avg("c_acctbal").alias("avg_bal"))
    return (
        cust.join(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("avg_bal"))
        .join(orders, cust.c_custkey == orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_cust"),
            stable_round(F.sum("c_acctbal"), 4).alias("total_bal"),
        )
    )


ORACLE_Q22 = f"""
SELECT c_mktsegment, count(*) AS n_cust,
       {sql_stable_round("sum(c_acctbal)", 4)} AS total_bal
FROM customer
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
                  AND o_orderdate >= TIMESTAMP '2000-07-01')
GROUP BY c_mktsegment
""".strip()


_Q19_ARMS = (
    ("Brand#11", 1, 11),
    ("Brand#22", 10, 20),
    ("Brand#33", 20, 30),
)


def q_tpch_q19_disjunct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue (TPC-H Q19 shape): disjunctive predicate
    coupling part and lineitem attributes. part is pre-filtered to the
    union of brands (prunable at the scan) and broadcast; the OR of
    brand×quantity arms evaluates post-join in codegen."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").filter(
        F.col("p_brand").isin([b for b, _, _ in _Q19_ARMS])
    )
    arm = None
    for brand, lo, hi in _Q19_ARMS:
        cond = (
            (F.col("p_brand") == brand)
            & (F.col("l_quantity") >= lo)
            & (F.col("l_quantity") <= hi)
        )
        arm = cond if arm is None else (arm | cond)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(arm)
        .agg(
            stable_round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


ORACLE_Q19 = f"""
SELECT {sql_stable_round("sum(l_extendedprice * (1 - l_discount))", 4)} AS revenue,
       count(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#11' AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#22' AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#33' AND l_quantity BETWEEN 20 AND 30)
""".strip()


def q_argmax_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-balance supplier(s) per nation (TPC-H Q2's correlated-max
    shape): aggregate the max per group, broadcast it back onto the
    scan, keep the rows that attain it. Ties all survive — identical to
    the correlated-subquery semantics, and one small broadcast instead
    of a whole-table sort."""
    supp = load_table(spark, sf_dir, "supplier")
    mx = supp.groupBy("s_nationkey").agg(F.max("s_acctbal").alias("max_bal"))
    return (
        supp.join(F.broadcast(mx), on="s_nationkey")
        .filter(F.col("s_acctbal") == F.col("max_bal"))
        .select(
            "s_nationkey",
            "s_suppkey",
            "s_name",
            stable_round(F.col("s_acctbal"), 4).alias("s_acctbal"),
        )
    )


ORACLE_ARGMAX = f"""
SELECT s_nationkey, s_suppkey, s_name,
       {sql_stable_round("s_acctbal", 4)} AS s_acctbal
FROM supplier s
WHERE s_acctbal = (SELECT max(s2.s_acctbal) FROM supplier s2
                   WHERE s2.s_nationkey = s.s_nationkey)
""".strip()


def q_rollup_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouping-sets pricing summary: ROLLUP(returnflag, linestatus)
    yields per-pair, per-flag, and grand-total rows in ONE pass — Spark
    expands the sets before the exchange so it still shuffles once."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        stable_round(F.sum("l_quantity"), 4).alias("sum_qty"),
        stable_round(F.sum("l_extendedprice"), 4).alias("sum_price"),
        F.count(F.lit(1)).alias("n_rows"),
    )


ORACLE_ROLLUP = f"""
SELECT l_returnflag, l_linestatus,
       {sql_stable_round("sum(l_quantity)", 4)} AS sum_qty,
       {sql_stable_round("sum(l_extendedprice)", 4)} AS sum_price,
       count(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""".strip()


def q_cube_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE(returnflag, shipmode-proxy): all 2^2 grouping sets in one
    pass — like ROLLUP, Catalyst expands the sets below a single
    exchange. Uses orders-status × priority (both low-cardinality; a
    cube over high-cardinality keys multiplies rows by 2^k and should
    be grouping-set-pruned instead)."""
    orders = load_table(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        stable_round(F.sum("o_totalprice"), 4).alias("total_price"),
    )


def q_grouping_sets_mixed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARBITRARY grouping sets — the general form ROLLUP/CUBE are
    sugar for: per-source totals, per-language totals, and the grand
    total, but NOT the (source × lang) cross — the exact set list a
    report wants without paying for the 2^k cube. One pass: Spark
    SQL's GROUPING SETS expands only the requested sets below a
    single exchange; GROUPING() flags disambiguate real NULLs from
    set placeholders in both engines."""
    docs = load_table(spark, sf_dir, "documents")
    docs.createOrReplaceTempView("documents_gs")
    return spark.sql(
        """
        SELECT source, lang,
               CAST(grouping(source) AS INT) AS g_source,
               CAST(grouping(lang) AS INT) AS g_lang,
               count(*) AS n_docs,
               CAST(sum(n_chars) AS BIGINT) AS total_chars
        FROM documents_gs
        GROUP BY GROUPING SETS ((source), (lang), ())
        """
    )


ORACLE_GROUPING_SETS = """
SELECT source, lang,
       CAST(grouping(source) AS INT) AS g_source,
       CAST(grouping(lang) AS INT) AS g_lang,
       count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY GROUPING SETS ((source), (lang), ())
""".strip()


ORACLE_CUBE = f"""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n_orders,
       {sql_stable_round("sum(o_totalprice)", 4)} AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""".strip()


_EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_events_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user event-type matrix as ONE-shuffle conditional
    aggregation. Deliberately NOT DataFrame.pivot(): with an implicit
    value list pivot runs a distinct-collect job first, and even with an
    explicit list its pivotfirst plan aggregates by (user, type) then
    re-shuffles by user — two exchanges where count(when(...)) needs
    one. Missing combinations are 0 by count semantics (matches COUNT
    FILTER)."""
    ev = load_table(spark, sf_dir, "events")
    return ev.groupBy("user_id").agg(
        *[
            F.count(F.when(F.col("event_type") == t, 1)).alias(t)
            for t in _EVENT_TYPES
        ]
    )


ORACLE_PIVOT = """
SELECT user_id,
       count(*) FILTER (event_type = 'click') AS click,
       count(*) FILTER (event_type = 'error') AS error,
       count(*) FILTER (event_type = 'purchase') AS purchase,
       count(*) FILTER (event_type = 'signup') AS signup,
       count(*) FILTER (event_type = 'view') AS view
FROM events
GROUP BY user_id
""".strip()


def q_weighted_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantity-WEIGHTED median extended price per return flag — the
    weighted quantile no built-in aggregate expresses (percentile
    treats rows equally; here each row carries l_quantity units).
    Lower weighted median: the smallest price whose running weight
    reaches half the group's total — computed as a DISTRIBUTED
    SELECTION, not a per-group sort. A naive cumulative window over
    each group serializes the whole group through one task (measured:
    54.8× at the ×64 soak — the classic low-cardinality-window
    scale-killer); instead:

    1. histogram: Σw per (group, ⌊price⌋ bucket) — one map-side-
       combined shuffle, histogram-sized output;
    2. the cumulative walk runs over the HISTOGRAM (≤ #buckets rows
       per group) to find each group's crossing bucket;
    3. only the crossing bucket's raw rows (a ~1/#buckets sliver)
       are re-scanned and orderd for the exact crossing price.

    Weights are exact BIGINTs so the 2·cum ≥ total crossing is
    integer arithmetic and the picked price is a raw stored double on
    both engines; the picked value is tie-order invariant."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        "l_extendedprice",
        F.col("l_quantity").cast("long").alias("w"),
    )
    bucketed = li.withColumn(
        "b", F.floor(F.col("l_extendedprice")).cast("long")
    )
    # r11 optimization (guide §2.4): cache the bucket histogram — it
    # feeds both the cumulative walk and the totals branch, and each
    # re-ran the full lineitem scan+aggregate.
    hist = bucketed.groupBy("l_returnflag", "b").agg(
        F.sum("w").alias("bw")
    ).cache()
    hw = Window.partitionBy("l_returnflag").orderBy("b").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_hist = hist.withColumn("cum", F.sum("bw").over(hw))
    totals = hist.groupBy("l_returnflag").agg(
        F.sum("bw").alias("total_weight")
    )
    crossing_bucket = (
        cum_hist.join(F.broadcast(totals), "l_returnflag")
        .filter(F.col("cum") * 2 >= F.col("total_weight"))
        .groupBy("l_returnflag")
        .agg(
            F.min_by(F.struct("b", "cum", "bw"), "b").alias("x"),
            F.max("total_weight").alias("total_weight"),
        )
        .select(
            "l_returnflag",
            F.col("x.b").alias("b"),
            (F.col("x.cum") - F.col("x.bw")).alias("cum_before"),
            "total_weight",
        )
    )
    sliver = bucketed.join(
        F.broadcast(crossing_bucket), ["l_returnflag", "b"]
    )
    sw = Window.partitionBy("l_returnflag").orderBy(
        "l_extendedprice"
    ).rowsBetween(Window.unboundedPreceding, Window.currentRow)
    in_bucket = sliver.withColumn(
        "cum_w", F.col("cum_before") + F.sum("w").over(sw)
    )
    return (
        in_bucket.filter(F.col("cum_w") * 2 >= F.col("total_weight"))
        .groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("weighted_median_price"),
            F.max("total_weight").alias("total_weight"),
        )
    )


ORACLE_WEIGHTED_MEDIAN = """
WITH t AS (
  SELECT l_returnflag, l_extendedprice,
         CAST(l_quantity AS BIGINT) AS w,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag
           ORDER BY l_extendedprice, l_orderkey, l_linenumber
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_w,
         sum(CAST(l_quantity AS BIGINT)) OVER (
           PARTITION BY l_returnflag) AS total_weight
  FROM lineitem
)
SELECT l_returnflag,
       min(l_extendedprice) AS weighted_median_price,
       CAST(max(total_weight) AS BIGINT) AS total_weight
FROM t WHERE cum_w * 2 >= total_weight
GROUP BY l_returnflag
""".strip()


def q_revenue_share_hierarchy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Percent-of-parent hierarchical rollup: nation revenue with its
    share of the region AND of the grand total in one result — the
    drill-down readout every BI layer derives from a two-level
    hierarchy. One fact aggregate to |nations| rows (orders shuffle
    once on custkey for the customer→nation map, dims broadcast), then
    region/total shares come from window sums over the TINY rollup —
    no second fact pass. Revenue sums are exact cents; shares are one
    double division each, 6-dp stable-rounded."""
    from pyspark.sql import Window

    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("cents"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"),
        F.col("n_name").alias("nation_name"),
        "n_regionkey",
    )
    region = load_table(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("n_regionkey"),
        F.col("r_name").alias("region_name"),
    )
    per_nation = (
        orders.join(F.broadcast(cust), "o_custkey")
        .join(F.broadcast(nation), "c_nationkey")
        .join(F.broadcast(region), "n_regionkey")
        .groupBy("region_name", "nation_name")
        .agg(F.sum("cents").alias("cents"))
    )
    w_r = Window.partitionBy("region_name")
    w_t = Window.partitionBy()
    return per_nation.select(
        "region_name",
        "nation_name",
        (F.col("cents").cast("double") / 100.0).alias("revenue"),
        stable_round(
            F.col("cents").cast("double")
            / F.sum("cents").over(w_r).cast("double"),
            6,
        ).alias("share_of_region"),
        stable_round(
            F.col("cents").cast("double")
            / F.sum("cents").over(w_t).cast("double"),
            6,
        ).alias("share_of_total"),
    )


ORACLE_REVENUE_SHARE = """
WITH per_nation AS (
  SELECT r.r_name AS region_name, n.n_name AS nation_name,
         sum(CAST(floor(o.o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders o
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
  JOIN region r ON r.r_regionkey = n.n_regionkey
  GROUP BY 1, 2
)
SELECT region_name, nation_name,
       CAST(cents AS DOUBLE) / 100.0 AS revenue,
       floor((CAST(cents AS DOUBLE)
              / CAST(sum(cents) OVER (PARTITION BY region_name) AS DOUBLE))
             * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE
         AS share_of_region,
       floor((CAST(cents AS DOUBLE)
              / CAST(sum(cents) OVER () AS DOUBLE))
             * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE
         AS share_of_total
FROM per_nation
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "weighted_median": q_weighted_median,
    "revenue_share_hierarchy": q_revenue_share_hierarchy,
    "tpch_q4_semijoin": q_tpch_q4_semijoin,
    "tpch_q22_antijoin": q_tpch_q22_antijoin,
    "tpch_q19_disjunct": q_tpch_q19_disjunct,
    "argmax_per_group": q_argmax_per_group,
    "rollup_pricing": q_rollup_pricing,
    "grouping_sets_mixed": q_grouping_sets_mixed,
    "cube_volume": q_cube_volume,
    "pivot_events_user": q_pivot_events_user,
}

ORACLES: dict[str, str] = {
    "weighted_median": ORACLE_WEIGHTED_MEDIAN,
    "revenue_share_hierarchy": ORACLE_REVENUE_SHARE,
    "tpch_q4_semijoin": ORACLE_Q4,
    "tpch_q22_antijoin": ORACLE_Q22,
    "tpch_q19_disjunct": ORACLE_Q19,
    "argmax_per_group": ORACLE_ARGMAX,
    "rollup_pricing": ORACLE_ROLLUP,
    "grouping_sets_mixed": ORACLE_GROUPING_SETS,
    "cube_volume": ORACLE_CUBE,
    "pivot_events_user": ORACLE_PIVOT,
}
