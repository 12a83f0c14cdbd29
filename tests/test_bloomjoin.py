"""Bloom-filter join pruning: exactness (no false negatives, join
result identical to a plain join), real probe-side reduction, and a
plan that stays JVM-side (no Python UDF, filter on the scan side)."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.bloomjoin import (
    bloom_might_contain,
    bloom_pruned_join,
    build_bloom,
)
from monasca_aggregator_spark.sources.tables import load_table
from tests.conftest import explain_str


def test_no_false_negatives_and_low_fp_rate(spark):
    keys = spark.range(0, 1000).select(F.col("id").alias("k"))
    words = build_bloom(keys, "k")
    probe = spark.range(0, 100_000).select(F.col("id").alias("k"))
    survived = probe.filter(bloom_might_contain(F.col("k"), words)).count()
    # all 1000 true keys pass; 64 Kib bits / 1000 keys / 5 hashes → ~1% fp
    assert survived >= 1000
    assert survived - 1000 < 0.03 * 99_000


def test_join_result_identical_to_plain_join(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    ords = (
        load_table(spark, sf_small, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey", "o_orderdate")
        .withColumnRenamed("o_orderkey", "l_orderkey")
    )
    plain = li.join(ords, "l_orderkey").groupBy().agg(
        F.count(F.lit(1)), F.sum("l_quantity")
    )
    pruned = bloom_pruned_join(li, ords, "l_orderkey").groupBy().agg(
        F.count(F.lit(1)), F.sum("l_quantity")
    )
    assert plain.collect() == pruned.collect()


def test_probe_reduction_and_jvm_only_plan(spark, sf_small):
    li = load_table(spark, sf_small, "lineitem").select("l_orderkey")
    ords = (
        load_table(spark, sf_small, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(F.col("o_orderkey").alias("l_orderkey"))
    )
    words = build_bloom(ords, "l_orderkey")
    pruned = li.filter(bloom_might_contain(F.col("l_orderkey"), words))
    n_all, n_pruned, n_true = (
        li.count(),
        pruned.count(),
        li.join(ords, "l_orderkey", "left_semi").count(),
    )
    assert n_true <= n_pruned < n_all * 0.5  # real scan-side reduction
    plan = explain_str(pruned)
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # pure scan-side filter, no shuffle


def test_null_keys_never_pass(spark):
    keys = spark.range(0, 10).select(F.col("id").alias("k"))
    words = build_bloom(keys, "k")
    probe = spark.createDataFrame([(None,), (3,)], "k long")
    got = [
        r.k
        for r in probe.filter(
            bloom_might_contain(F.col("k"), words)
        ).collect()
    ]
    assert got == [3]
