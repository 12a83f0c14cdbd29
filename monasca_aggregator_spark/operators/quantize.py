"""Int8 scalar quantization of embedding columns.

Asymmetric per-dimension min/max quantization — the standard 4×
compression for embedding stores (and the input format for int8 ANN
kernels). Everything stays JVM-side:

- per-dimension min/max is ONE aggregate pass with 2·d aggregate
  expressions (map-side partials; the shuffle carries a single 2·d
  summary row, never vectors) — no posexplode, which would multiply
  the corpus by d before aggregating;
- the 1-row scale table broadcast-joins back onto the scan;
- quantize/dequantize are ``zip_with``/``transform`` expressions in
  whole-stage codegen.

All reported metrics are order-insensitive-exact so they hash-match a
SQL oracle: the code checksum is exact BIGINT arithmetic over the int8
codes, and max-abs-error is a max over per-element doubles computed by
the identical IEEE expression on both sides.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import stable_round


def dimension_scales(
    emb: DataFrame, dim: int, *, vec_col: str = "embedding"
) -> DataFrame:
    """1-row DataFrame with ``mins`` and ``steps`` arrays (step =
    (max−min)/255; 0 for constant dimensions)."""
    v = F.col(vec_col).cast("array<double>")
    aggs = []
    for i in range(dim):
        aggs.append(F.min(v[i]).alias(f"_mn{i}"))
        aggs.append(F.max(v[i]).alias(f"_mx{i}"))
    row = emb.agg(*aggs)
    mins = F.array(*[F.col(f"_mn{i}") for i in range(dim)])
    steps = F.array(
        *[
            (F.col(f"_mx{i}") - F.col(f"_mn{i}")) / F.lit(255.0)
            for i in range(dim)
        ]
    )
    return row.select(mins.alias("mins"), steps.alias("steps"))


def _q_code(x: Column, m: Column, s: Column) -> Column:
    """Quantized code in 0..255 (stored int8 would be code−128)."""
    raw = F.floor((x - m) / s + F.lit(0.5))
    clamped = F.greatest(F.lit(0.0), F.least(F.lit(255.0), raw))
    return F.when(s == 0.0, F.lit(0)).otherwise(clamped.cast("int"))


def quantize_int8(
    emb: DataFrame,
    dim: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Adds ``q8`` (array<tinyint>, codes −128..127) and ``dequant``
    (array<double>) next to the original columns."""
    scales = dimension_scales(emb, dim, vec_col=vec_col)
    v = F.col(vec_col).cast("array<double>")
    with_scales = emb.join(F.broadcast(scales))
    codes = F.zip_with(
        F.zip_with(v, F.col("mins"), lambda x, m: F.struct(x.alias("x"), m.alias("m"))),
        F.col("steps"),
        lambda xm, s: _q_code(xm.getField("x"), xm.getField("m"), s),
    )
    out = with_scales.withColumn("_codes", codes)
    dequant = F.zip_with(
        F.zip_with(
            F.col("_codes").cast("array<double>"),
            F.col("mins"),
            lambda c, m: F.struct(c.alias("c"), m.alias("m")),
        ),
        F.col("steps"),
        lambda cm, s: cm.getField("c") * s + cm.getField("m"),
    )
    return (
        out.withColumn("dequant", dequant)
        .withColumn(
            "q8",
            F.transform(
                F.col("_codes"), lambda c: (c - F.lit(128)).cast("byte")
            ),
        )
        .drop("_codes", "mins", "steps")
    )


def quantization_report(
    emb: DataFrame,
    dim: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-vector fidelity: an exact integer checksum of the codes
    (pins every code value) and the max absolute reconstruction
    error (≤ step/2 by construction — asserted in tests)."""
    q = quantize_int8(emb, dim, id_col=id_col, vec_col=vec_col)
    codes_1based = F.zip_with(
        F.col("q8").cast("array<long>"),
        F.sequence(F.lit(1), F.lit(dim)).cast("array<long>"),
        lambda c, i: (c + 128) * i,
    )
    checksum = F.aggregate(
        codes_1based, F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    err = F.array_max(
        F.zip_with(
            F.col(vec_col).cast("array<double>"),
            F.col("dequant"),
            lambda x, y: F.abs(x - y),
        )
    )
    return q.select(
        F.col(id_col),
        checksum.alias("code_checksum"),
        stable_round(err, 6).alias("max_abs_err"),
    )
