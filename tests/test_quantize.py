"""Int8 scalar quantization (operators/quantize.py): reconstruction
bounds, constant-dimension handling, and fidelity of downstream math."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.quantize import (
    dimension_scales,
    quantization_report,
    quantize_int8,
)
from monasca_aggregator_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"
DIM = 64


def test_max_error_bounded_by_half_step(spark):
    emb = load_table(spark, SF, "embeddings")
    max_step = dimension_scales(emb, DIM).select(
        F.array_max("steps").alias("s")
    ).first().s
    worst = (
        quantization_report(emb, DIM)
        .agg(F.max("max_abs_err").alias("e"))
        .first()
        .e
    )
    assert worst <= max_step / 2 + 1e-9


def test_constant_dimension_roundtrips_exactly(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 5.0]), (1, [1.0, -3.0]), (2, [1.0, 0.5])],
        "vec_id long, embedding array<double>",
    )
    rows = quantize_int8(df, 2).select("vec_id", "dequant").collect()
    for r in rows:
        assert r.dequant[0] == 1.0  # step 0 → code 0 → exact min
    errs = {
        r.vec_id: r.max_abs_err
        for r in quantization_report(df, 2).collect()
    }
    assert all(e <= (5.0 - (-3.0)) / 255 / 2 + 1e-12 for e in errs.values())


def test_codes_are_int8_and_cosine_preserved(spark):
    from monasca_aggregator_spark.functions.vectors import cosine

    emb = load_table(spark, SF, "embeddings").limit(100)
    q = quantize_int8(emb, DIM)
    rng = q.select(
        F.array_min(F.col("q8").cast("array<int>")).alias("lo"),
        F.array_max(F.col("q8").cast("array<int>")).alias("hi"),
    ).agg(F.min("lo").alias("lo"), F.max("hi").alias("hi")).first()
    assert -128 <= rng.lo and rng.hi <= 127
    sims = q.select(
        cosine(
            F.col("embedding").cast("array<double>"), F.col("dequant")
        ).alias("c")
    ).agg(F.min("c").alias("c")).first()
    assert sims.c > 0.999


def test_checksum_pins_codes_deterministically(spark):
    emb = load_table(spark, SF, "embeddings")
    a = {r.vec_id: r.code_checksum
         for r in quantization_report(emb, DIM).collect()}
    b = {r.vec_id: r.code_checksum
         for r in quantization_report(emb, DIM).collect()}
    assert a == b and len(a) == 500


def test_quantize_error_report_bounds(spark, sf_small):
    """Int8 scalar quantization of 64-dim embeddings is near-lossless:
    per-label mean cosine vs the reconstruction stays ≈ 1, worst ≤
    mean, and MSE is tiny but positive (codes are clamped/rounded)."""
    from monasca_aggregator_spark.plans.similarity import (
        q_embedding_quantize_error,
    )

    rows = q_embedding_quantize_error(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert r.mse >= 0.0
        assert r.worst_cos <= r.mean_cos <= 1.0 + 1e-9
        assert r.mean_cos > 0.999, r  # 8-bit on 64 dims: ~1e-5 distortion
