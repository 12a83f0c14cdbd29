"""Semi-structured (JSON) column handling.

The reference's envelope carries free-form maps (``value_meta``,
``meta`` — models/metric_envelope.go); real metric pipelines also carry
JSON property bags. This module treats a JSON string column as a typed
struct via ``from_json`` — parsing happens JVM-side inside codegen, the
schema projection prunes to only the extracted fields, and the
downstream aggregate partial-aggregates map-side, so at 100 TB the cost
is one parquet scan + one tiny shuffle of per-group partials.

Numeric outputs avoid float accumulation entirely: ``k`` is integral,
so sums are exact BIGINTs in both engines and the average is a single
exact division — no rounding epsilon to disagree on.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monasca_aggregator_spark.sources.tables import load_table

K_HIGH = 50


def q_events_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type stats over a field extracted from the JSON props
    bag: typed ``from_json`` parse (not string get_json_object per
    field — one parse serves every extracted field), then a standard
    partial-aggregated groupBy."""
    ev = load_table(spark, sf_dir, "events")
    k = F.from_json(F.col("props"), "k INT").getField("k")
    parsed = ev.select("event_type", k.alias("k"))
    return (
        parsed.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.count("k").alias("n_with_k"),
            F.sum(
                F.when(F.col("k") >= K_HIGH, 1).otherwise(0)
            ).alias("n_k_high"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            (
                F.sum("k").cast("double") / F.count("k").cast("double")
            ).alias("avg_k"),
        )
    )


ORACLE_JSON_PROPS = f"""
WITH p AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
SELECT event_type,
       count(*) AS n_events,
       count(k) AS n_with_k,
       CAST(coalesce(sum(CASE WHEN k >= {K_HIGH} THEN 1 ELSE 0 END), 0)
            AS BIGINT) AS n_k_high,
       min(k) AS min_k,
       max(k) AS max_k,
       CAST(sum(k) AS DOUBLE) / CAST(count(k) AS DOUBLE) AS avg_k
FROM p
GROUP BY event_type
""".strip()


def q_events_variant_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT path over the same property bag: ``parse_json``
    builds the binary variant encoding ONCE per row (open schema — no
    up-front struct declaration, unlike ``from_json``), then
    ``variant_get`` extracts typed fields at query time. The right
    tool when the bag's shape drifts across producers: adding a field
    tomorrow needs no schema change today, and extraction stays
    JVM-side (no Python UDF, no string re-parse per field).

    Output: per (event_type, k-decile) histogram — exact BIGINT
    counts and sums, so the DuckDB oracle (json_extract on the raw
    string) hashes identically.
    """
    ev = load_table(spark, sf_dir, "events")
    v = F.parse_json(F.col("props"))
    k = F.variant_get(v, "$.k", "int")
    return (
        ev.select("event_type", k.alias("k"))
        .filter(F.col("k").isNotNull())
        .groupBy(
            "event_type",
            (F.floor(F.col("k") / F.lit(10)) * 10)
            .cast("long")
            .alias("k_decile"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").cast("long").alias("sum_k"),
        )
    )


ORACLE_VARIANT_PROPS = """
WITH p AS (
  SELECT event_type,
         CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
  FROM events
)
SELECT event_type,
       CAST((k // 10) * 10 AS BIGINT) AS k_decile,
       count(*) AS n,
       CAST(sum(k) AS BIGINT) AS sum_k
FROM p
WHERE k IS NOT NULL
GROUP BY event_type, k_decile
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "events_json_props": q_events_json_props,
    "events_variant_props": q_events_variant_props,
}

ORACLES: dict[str, str] = {
    "events_json_props": ORACLE_JSON_PROPS,
    "events_variant_props": ORACLE_VARIANT_PROPS,
}
