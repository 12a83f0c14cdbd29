"""Metric-envelope relation: the engine's input schema.

Wire format parity with the reference's MetricEnvelope JSON
(reference: models/metric_envelope.go, models/metric.go)::

    {"metric": {"name": str, "dimensions": {k: v}, "timestamp": float_ms,
                "value": float, "value_meta": {k: v}},
     "meta": {"tenantId": str, ...}, "creation_time": int_ms}

``parse_envelopes`` turns a Kafka-style value column (JSON string) into
the flat relation the operators consume; ``events_to_envelopes`` adapts
the driver's ``events`` test table into the same relation so the real
spec engine is exercised against plain-SQL oracles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ENVELOPE_JSON_SCHEMA = T.StructType(
    [
        T.StructField(
            "metric",
            T.StructType(
                [
                    T.StructField("name", T.StringType()),
                    T.StructField("dimensions", T.MapType(T.StringType(), T.StringType())),
                    T.StructField("timestamp", T.DoubleType()),  # epoch ms
                    T.StructField("value", T.DoubleType()),
                    T.StructField("value_meta", T.MapType(T.StringType(), T.StringType())),
                ]
            ),
        ),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType())),
        T.StructField("creation_time", T.LongType()),
    ]
)

# Flat relation consumed by operators.aggregate / streaming.pipeline:
ENVELOPE_COLUMNS = (
    "name",
    "dimensions",
    "timestamp",
    "value",
    "value_meta",
    "tenant_id",
    "meta",
)


def parse_envelopes(raw: DataFrame, value_col: str = "value") -> DataFrame:
    """JSON bytes/string column → flat envelope relation.

    Works identically on batch and streaming DataFrames (from_json is
    streaming-safe). Invalid JSON yields NULL metric and is dropped, the
    reference's behavior on unmarshal failure (server.go:300-304).
    """
    parsed = raw.select(
        F.from_json(F.col(value_col).cast("string"), ENVELOPE_JSON_SCHEMA).alias("e")
    )
    return parsed.filter(F.col("e.metric").isNotNull()).select(
        F.col("e.metric.name").alias("name"),
        F.col("e.metric.dimensions").alias("dimensions"),
        F.timestamp_millis(F.col("e.metric.timestamp").cast("bigint")).alias(
            "timestamp"
        ),
        F.col("e.metric.value").alias("value"),
        F.col("e.metric.value_meta").alias("value_meta"),
        F.col("e.meta").getItem("tenantId").alias("tenant_id"),
        F.col("e.meta").alias("meta"),
    )


def read_envelope_json(spark, path: str, *, streaming: bool = False) -> DataFrame:
    """Envelope relation from JSON-lines files (one MetricEnvelope per
    line — the Kafka wire format at rest). The streaming variant is the
    broker-less way to run the continuous pipeline: drop files into the
    directory and the watermarked plan consumes them incrementally."""
    reader = spark.readStream if streaming else spark.read
    raw = reader.text(path)
    return parse_envelopes(raw, value_col="value")


def events_to_envelopes(events: DataFrame, tenant_id: str = "t0") -> DataFrame:
    """Adapt the test `events` table to the envelope relation.

    event_type → metric name; user_id and props.k → dimensions; a fixed
    tenant (the test stream is single-tenant).
    """
    return events.select(
        F.col("event_type").alias("name"),
        F.create_map(
            F.lit("user_id"),
            F.col("user_id").cast("string"),
            F.lit("k"),
            F.get_json_object(F.col("props"), "$.k"),
        ).alias("dimensions"),
        F.col("ts").alias("timestamp"),
        F.col("value"),
        F.expr("map()").cast("map<string,string>").alias("value_meta"),
        F.lit(tenant_id).alias("tenant_id"),
        F.create_map(F.lit("tenantId"), F.lit(tenant_id)).alias("meta"),
    )
