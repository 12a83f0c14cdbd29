"""Distributed global rank / NTILE (operators/rank.py): must equal the
single-partition window formulation exactly, for any bucket fan-out."""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.rank import (
    global_rank,
    ntile_from_rank,
)


def _scores(spark, n=97):
    # deliberately collide scores so buckets hold runs of ties
    return spark.range(n).select(
        F.col("id"),
        ((F.col("id") * 37 % 11) / F.lit(10.0)).alias("score"),
    )


def test_global_rank_equals_global_window(spark):
    df = _scores(spark)
    got = global_rank(
        df,
        F.floor(F.col("score") * 5).cast("int"),
        [F.col("score").asc(), F.col("id").asc()],
        rank_col="rk",
    )
    w = Window.orderBy(F.col("score").asc(), F.col("id").asc())
    want = df.withColumn("rk", F.row_number().over(w))
    assert sorted(got.select("id", "rk").collect()) == sorted(
        want.select("id", "rk").collect()
    )


def test_ntile_from_rank_matches_sql_ntile(spark):
    for n, tiles in [(97, 10), (100, 10), (5, 8), (64, 7)]:
        df = _scores(spark, n)
        ranked = global_rank(
            df,
            F.floor(F.col("score") * 5).cast("int"),
            [F.col("score").asc(), F.col("id").asc()],
            rank_col="rk",
            total_col="n_total",
        )
        got = ranked.select(
            "id",
            ntile_from_rank(F.col("rk"), F.col("n_total"), tiles).alias(
                "tile"
            ),
        )
        w = Window.orderBy(F.col("score").asc(), F.col("id").asc())
        want = df.select("id", F.ntile(tiles).over(w).alias("tile"))
        assert sorted(got.collect()) == sorted(want.collect()), (n, tiles)


def test_global_rank_single_bucket_degenerates_gracefully(spark):
    df = _scores(spark, 23)
    got = global_rank(
        df, F.lit(0), [F.col("score").asc(), F.col("id").asc()],
        rank_col="rk", total_col="t",
    )
    rows = got.select("rk", "t").collect()
    assert sorted(r.rk for r in rows) == list(range(1, 24))
    assert all(r.t == 23 for r in rows)


def test_global_cumsum_equals_global_window(spark):
    """global_cumsum must equal sum() OVER (ORDER BY ... ROWS UNBOUNDED
    PRECEDING) exactly, including the grand total, for descending sort
    with log2 buckets (the lineitem_abc_class shape)."""
    from monasca_aggregator_spark.operators.rank import global_cumsum

    df = spark.range(1, 120).select(
        F.col("id"),
        ((F.col("id") * 53 % 17) * 10 + 1).cast("long").alias("v"),
    )
    got = global_cumsum(
        df,
        (-F.floor(F.log2(F.col("v").cast("double") + F.lit(1.0)))).cast(
            "int"
        ),
        [F.col("v").desc(), F.col("id").asc()],
        F.col("v"),
        cum_col="cum",
        total_col="total",
    )
    w = Window.orderBy(F.col("v").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    want = df.withColumn("cum", F.sum("v").over(w))
    assert sorted(got.select("id", "cum").collect()) == sorted(
        want.select("id", "cum").collect()
    )
    tot = df.agg(F.sum("v")).first()[0]
    assert got.select("total").distinct().collect() == [(tot,)]
