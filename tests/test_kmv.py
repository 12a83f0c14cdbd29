"""KMV (bottom-k theta) sketch: exactness below the cap, estimator
accuracy above it, and lossless union re-sketching.

The set-operation capability itself (intersection cardinality) is
oracle-gated through `agg_distinct_overlap` / `agg_window_stickiness`
in plans/series_ext.py; these tests pin the operator's numeric
contract on controlled synthetic sets where the TRUE cardinalities
are known by construction.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.kmv import (
    kmv_agg,
    kmv_agg_if,
    kmv_estimate,
    kmv_intersect_estimate,
    kmv_merge,
)


def _sets_df(spark, n_a, n_b, n_shared):
    """Two integer sets: A = [0, n_a), B = [n_a - n_shared, n_a - n_shared
    + n_b) so |A∩B| = n_shared exactly."""
    a = spark.range(n_a).select(
        F.lit("a").alias("grp"), F.col("id").alias("member")
    )
    b = spark.range(n_b).select(
        F.lit("b").alias("grp"),
        (F.col("id") + n_a - n_shared).alias("member"),
    )
    return a.unionByName(b)


def test_exact_below_cap(spark):
    df = _sets_df(spark, 300, 200, 50)
    k = 1024
    sk = df.groupBy("grp").agg(kmv_agg(F.col("member"), k).alias("sk"))
    est = sk.select(
        "grp", kmv_estimate(F.col("sk"), k).alias("est")
    ).collect()
    got = {r["grp"]: r["est"] for r in est}
    assert got == {"a": 300.0, "b": 200.0}  # exact, not approximate


def test_intersection_exact_below_cap(spark):
    k = 1024
    df = _sets_df(spark, 300, 200, 50)
    sks = df.groupBy("grp").agg(kmv_agg(F.col("member"), k).alias("sk"))
    a = sks.filter(F.col("grp") == "a").select(
        F.col("sk").alias("sk_a")
    )
    b = sks.filter(F.col("grp") == "b").select(
        F.col("sk").alias("sk_b")
    )
    row = (
        a.crossJoin(b)
        .select(
            kmv_intersect_estimate(
                F.col("sk_a"), F.col("sk_b"), k
            ).alias("inter")
        )
        .collect()[0]
    )
    assert row["inter"] == 50.0


def test_estimate_saturated_within_tolerance(spark):
    # 50k distinct at k=1024: standard error ~ 1/sqrt(k-1) ≈ 3.1%;
    # assert within 4 sigma (deterministic given xxhash64).
    k = 1024
    n = 50_000
    df = spark.range(n).select(
        F.lit("g").alias("grp"), F.col("id").alias("member")
    )
    sk = df.groupBy("grp").agg(kmv_agg(F.col("member"), k).alias("sk"))
    est = sk.select(kmv_estimate(F.col("sk"), k).alias("e")).collect()[
        0
    ]["e"]
    assert abs(est - n) / n < 4 / (k - 1) ** 0.5


def test_saturated_intersection_within_tolerance(spark):
    # |A|=|B|=30k, |A∩B|=15k, k=1024 — the ρ/K·|A∪B| estimator has
    # roughly ~1/sqrt(K) relative error; allow a loose 15% band.
    k = 1024
    df = _sets_df(spark, 30_000, 30_000, 15_000)
    sks = df.groupBy("grp").agg(kmv_agg(F.col("member"), k).alias("sk"))
    a = sks.filter(F.col("grp") == "a").select(F.col("sk").alias("x"))
    b = sks.filter(F.col("grp") == "b").select(F.col("sk").alias("y"))
    got = (
        a.crossJoin(b)
        .select(
            kmv_intersect_estimate(F.col("x"), F.col("y"), k).alias(
                "i"
            )
        )
        .collect()[0]["i"]
    )
    assert abs(got - 15_000) / 15_000 < 0.15


def test_merge_equals_direct_union_sketch(spark):
    # sketch(A) ∪ sketch(B) re-sketched == sketch(A ∪ B): the lossless
    # mergeability that makes per-window sketches re-aggregable the
    # same way the HLL rollup is.
    k = 64
    df = _sets_df(spark, 500, 400, 100)
    sks = df.groupBy("grp").agg(kmv_agg(F.col("member"), k).alias("sk"))
    a = sks.filter(F.col("grp") == "a").select(F.col("sk").alias("x"))
    b = sks.filter(F.col("grp") == "b").select(F.col("sk").alias("y"))
    merged = (
        a.crossJoin(b)
        .select(kmv_merge(F.col("x"), F.col("y"), k).alias("m"))
        .collect()[0]["m"]
    )
    direct = (
        df.groupBy()
        .agg(kmv_agg(F.col("member"), k).alias("sk"))
        .collect()[0]["sk"]
    )
    assert merged == direct


def test_conditional_agg_skips_non_matching(spark):
    # kmv_agg_if must NOT absorb xxhash64's null-seed value for rows
    # failing the predicate (the hash sits inside the when()).
    k = 64
    df = spark.range(10).select(
        F.col("id").alias("member"), (F.col("id") < 3).alias("keep")
    )
    sk = df.groupBy().agg(
        kmv_agg_if(F.col("member"), F.col("keep"), k).alias("sk"),
        kmv_agg_if(F.col("member"), F.lit(False), k).alias("none"),
    ).collect()[0]
    assert len(sk["sk"]) == 3
    assert sk["none"] == []
