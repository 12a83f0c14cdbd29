"""Skew-mitigation utilities: salted join / two-stage agg must be
result-identical to their plain counterparts, and the salted join must
actually spread a hot key across salt buckets."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators import skew


@pytest.fixture(scope="module")
def skewed(spark):
    # one hot key (k=0 carries 90% of rows) + a long tail
    big = spark.range(0, 10_000).select(
        F.when(F.col("id") % 10 != 0, 0).otherwise(F.col("id") % 100).alias("k"),
        F.col("id").alias("v"),
    )
    small = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 10).alias("w")
    )
    return big, small


def test_salted_join_equals_plain_join(spark, skewed):
    big, small = skewed
    plain = big.join(small, ["k"]).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    salted = skew.salted_join(big, small, ["k"], num_salts=8).groupBy("k").agg(
        F.count(F.lit(1)).alias("n"), F.sum("v").alias("sv"), F.sum("w").alias("sw")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_salted_left_join_keeps_unmatched_big_rows(spark):
    big = spark.createDataFrame([(1, "a"), (99, "b")], "k int, x string")
    small = spark.createDataFrame([(1, "m")], "k int, y string")
    out = skew.salted_join(big, small, ["k"], num_salts=4, how="left")
    rows = {(r.k, r.y) for r in out.collect()}
    assert rows == {(1, "m"), (99, None)}


def test_salted_join_rejects_right_join(spark, skewed):
    big, small = skewed
    with pytest.raises(ValueError):
        skew.salted_join(big, small, ["k"], how="right")


def test_salt_spreads_hot_key(spark, skewed):
    big, _ = skewed
    dist = (
        skew.with_salt(big.filter(F.col("k") == 0), 8)
        .groupBy("__salt")
        .count()
        .collect()
    )
    assert len(dist) == 8  # hot key occupies every salt bucket
    counts = [r["count"] for r in dist]
    assert max(counts) < sum(counts) * 0.5  # no bucket dominates


def test_two_stage_agg_equals_plain_agg(spark, skewed):
    big, _ = skewed
    plain = dict(
        (r.k, (r.total, r.rows))
        for r in big.groupBy("k")
        .agg(F.sum("v").alias("total"), F.count(F.lit(1)).alias("rows"))
        .collect()
    )
    staged = dict(
        (r.k, (r.total, r.rows))
        for r in skew.two_stage_agg(
            big,
            ["k"],
            [F.sum("v").alias("s"), F.count(F.lit(1)).alias("n")],
            [F.sum("s").alias("total"), F.sum("n").alias("rows")],
        ).collect()
    )
    assert plain == staged
