"""Bucketed co-located joins: two tables bucketed on the join key must
join with ZERO exchanges (the pay-the-shuffle-once-at-write-time story
that makes repeated 100 TB fact⋈fact joins viable)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from monasca_aggregator_spark.sources.tables import load_table, write_bucketed
from tests.conftest import explain_str


@pytest.fixture(scope="module")
def bucketed(spark, sf_small):
    # managed tables land in the session's warehouse dir
    # (./spark-warehouse, gitignored); DROP TABLE removes the files
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount", "l_quantity"
    )
    orders = load_table(spark, sf_small, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    write_bucketed(li, "li_bkt", ["l_orderkey"], num_buckets=8)
    write_bucketed(orders, "ord_bkt", ["o_orderkey"], num_buckets=8)
    yield spark.table("li_bkt"), spark.table("ord_bkt")
    spark.sql("DROP TABLE IF EXISTS li_bkt")
    spark.sql("DROP TABLE IF EXISTS ord_bkt")


def test_bucketed_join_has_no_exchange(spark, bucketed):
    li, orders = bucketed
    # make sure broadcast doesn't mask the bucketing (force SMJ path)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = li.join(orders, li.l_orderkey == orders.o_orderkey)
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan
        assert "SortMergeJoin" in plan
        assert "Bucketed: true" in plan
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")


def test_bucketed_join_result_matches_plain_join(spark, bucketed, sf_small):
    li, orders = bucketed
    bucketed_rev = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("l_extendedprice").alias("rev"), F.count(F.lit(1)).alias("n"))
    )
    li0 = load_table(spark, sf_small, "lineitem")
    ord0 = load_table(spark, sf_small, "orders")
    plain = (
        li0.join(ord0, li0.l_orderkey == ord0.o_orderkey)
        .groupBy("o_custkey")
        .agg(F.sum("l_extendedprice").alias("rev"), F.count(F.lit(1)).alias("n"))
    )
    a = {(r.o_custkey, r.n): r.rev for r in bucketed_rev.collect()}
    b = {(r.o_custkey, r.n): r.rev for r in plain.collect()}
    assert a.keys() == b.keys()
    assert all(abs(a[k] - b[k]) < 1e-6 for k in a)


def test_snapshot_diff_zero_exchange_on_bucketed_snapshots(spark, sf_small):
    """The CDC join (operators/snapshot.py) over two snapshots
    bucket-written on the id plans with NO Exchange: the full-outer
    join runs as a per-bucket local merge — at 100 TB the shuffle is
    paid once at write time, then every drop diff is exchange-free."""
    from monasca_aggregator_spark.operators.snapshot import snapshot_diff
    from monasca_aggregator_spark.sources.tables import (
        load_table,
        write_bucketed,
    )

    docs = load_table(spark, sf_small, "documents")
    old = docs.filter(F.pmod("doc_id", F.lit(20)) != 0).select(
        "doc_id", F.md5("text").alias("fingerprint")
    )
    new = docs.select("doc_id", F.md5("text").alias("fingerprint"))
    write_bucketed(old, "snap_old", ["doc_id"], num_buckets=8)
    write_bucketed(new, "snap_new", ["doc_id"], num_buckets=8)
    try:
        diff = snapshot_diff(
            spark.table("snap_old"),
            spark.table("snap_new"),
            id_col="doc_id",
            fingerprint_col="fingerprint",
        )
        plan = diff._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        counts = {
            r.status: r.n
            for r in diff.groupBy("status").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert counts.get("added", 0) > 0
        assert counts.get("unchanged", 0) > 0
        assert "removed" not in counts
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_old")
        spark.sql("DROP TABLE IF EXISTS snap_new")
