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


def test_aqe_skew_join_splits_the_hot_partition(spark):
    """AQE's runtime skew-join handling — the zero-code-change
    complement of the salting utilities: a 90%-hot key makes one
    shuffle partition dwarf the median, and the executed adaptive
    plan must show SortMergeJoin(skew=true) (the hot partition split
    into advisory-size chunks, the other side's rows duplicated to
    match). Post-join aggregations can inhibit the rewrite because
    the split breaks hash-partitioning guarantees —
    forceOptimizeSkewedJoin accepts the extra exchange, the right
    trade at 100 TB where the skewed straggler, not the extra
    shuffle, is the wall-clock."""
    from pyspark.sql import functions as F

    saved = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.forceOptimizeSkewedJoin",
        )
    }
    try:
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin."
            "skewedPartitionThresholdInBytes",
            "256KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "128KB"
        )
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.autoBroadcastJoinThreshold", "-1"
        )
        spark.conf.set(
            "spark.sql.adaptive.forceOptimizeSkewedJoin", "true"
        )
        left = spark.range(1_500_000).select(
            F.when(F.col("id") % 10 < 9, 0)
            .otherwise(F.col("id") % 1000)
            .alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("v"),
        )
        right = spark.range(1000).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("w")
        )
        j = left.join(right, "k")
        rows = j.collect()
        assert len(rows) == 1_500_000  # every left row matches once
        plan = j._sc._jvm.PythonSQLUtils.explainString(
            j._jdf.queryExecution(), "formatted"
        )
        assert "skew=true" in plan, plan[:1500]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_aqe_coalesces_post_shuffle_partitions(spark):
    """AQE's third runtime re-plan proof beside skew-split and DPP:
    a groupBy over tiny data plans spark.sql.shuffle.partitions
    reducers statically, and AQE coalesces them to a handful at
    runtime (AQEShuffleRead coalesced) — the knob that makes ONE
    shuffle.partitions setting serve 100 TB facts and kB dims in the
    same job without hand-tuning every stage."""
    df = (
        spark.range(10_000)
        .select((F.col("id") % 50).alias("k"))
        .groupBy("k")
        .count()
    )
    assert len(df.collect()) == 50  # execute THIS plan so AQE finalizes it
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "AQEShuffleRead" in plan and "coalesced" in plan, plan[:2000]


