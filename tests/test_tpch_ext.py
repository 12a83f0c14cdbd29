"""Extended TPC-H shapes (plans/tpch_ext.py): oracle equivalence at
sf0.001 plus plan-shape guards for the optimizer behaviors each shape
is designed around (double-dimension broadcast, outer-join null
preservation, semi+anti self-join co-partitioning)."""

from __future__ import annotations

import hashlib
import re

import duckdb
import pytest
from pyspark.sql import functions as F

from monasca_aggregator_spark.plans import tpch_ext
from tests.conftest import SF_SMALL, explain_str


def _norm(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            elif isinstance(v, bool):
                v = str(int(v))
            vals.append(str(v))
        lines.append("\x1f".join(vals))
    lines.sort()
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(tpch_ext.QUERIES))
def test_matches_oracle(spark, name, duck):
    df = tpch_ext.QUERIES[name](spark, SF_SMALL)
    got = df.collect()
    got_hash = _norm([tuple(r) for r in got], df.columns)

    res = duck.execute(tpch_ext.ORACLES[name])
    exp_rows = res.fetchall()
    exp_cols = [d[0] for d in res.description]

    assert sorted(df.columns) == sorted(exp_cols)
    assert len(got) == len(exp_rows)
    assert len(got) > 0 or name == "tpch_q7_two_nation"  # selective pair
    assert got_hash == _norm(exp_rows, exp_cols)


def test_q7_broadcasts_nation_twice(spark):
    plan = explain_str(tpch_ext.q_tpch_q7(spark, SF_SMALL))
    # two independent broadcast joins against the nation dim
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) >= 4


def test_q13_preserves_orderless_customers(spark):
    """The LEFT JOIN filter sits in the join condition, so customers
    with zero (matching) orders must appear in the c_count=0 bucket."""
    df = tpch_ext.q_tpch_q13(spark, SF_SMALL)
    by_count = {r.c_count: r.custdist for r in df.collect()}
    n_cust = spark.read.parquet(f"{SF_SMALL}/customer.parquet").count()
    assert sum(by_count.values()) == n_cust  # every customer lands once
    assert "LeftOuter" in explain_str(df)


def test_q21_semi_and_anti_self_joins(spark):
    plan = explain_str(tpch_ext.q_tpch_q21(spark, SF_SMALL))
    assert "LeftSemi" in plan
    assert "LeftAnti" in plan


def test_q11_threshold_broadcasts_not_windows(spark):
    plan = explain_str(tpch_ext.q_tpch_q11(spark, SF_SMALL))
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan


def test_q17_joins_back_per_part_average(spark):
    """The correlated avg subquery must become a broadcast join-back,
    and filtering against it must match a driver-side recomputation."""
    df = tpch_ext.q_tpch_q17(spark, SF_SMALL)
    assert "BroadcastHashJoin" in explain_str(df)
    li = spark.read.parquet(f"{SF_SMALL}/lineitem.parquet")
    part = spark.read.parquet(f"{SF_SMALL}/part.parquet").filter(
        F.col("p_brand") == "Brand#1"
    )
    avgs = {
        r.l_partkey: r.a
        for r in li.groupBy("l_partkey")
        .agg(F.avg("l_quantity").alias("a"))
        .collect()
    }
    rows = li.join(part, li.l_partkey == part.p_partkey).collect()
    expected = sum(
        r.l_extendedprice
        for r in rows
        if r.l_quantity < 0.5 * avgs[r.l_partkey]
    ) / 7.0
    got = df.first().avg_yearly
    assert got == pytest.approx(expected, rel=1e-6)


def test_basket_size_hist_moments(spark, sf_small):
    """The histogram's totals must reproduce the lineitem/order counts
    exactly, shares sum to 1, and the second moment equals the
    co-purchase fan-out cost Σ n_orders·size² implied by the rows."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.plans.tpch_ext import (
        q_orders_basket_size_hist,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    rows = q_orders_basket_size_hist(spark, sf_small).collect()
    li = load_table(spark, sf_small, "lineitem")
    n_lines = li.count()
    n_orders = li.select("l_orderkey").distinct().count()
    assert sum(r.n_orders for r in rows) == n_orders
    assert sum(r.n_orders * r.basket_size for r in rows) == n_lines
    assert abs(sum(r.order_share for r in rows) - 1.0) < 1e-3
    assert abs(sum(r.line_share for r in rows) - 1.0) < 1e-3
