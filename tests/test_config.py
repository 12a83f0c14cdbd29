"""EngineConfig parses the reference's config.yaml surface verbatim and
applies its viper defaults; the envelope JSON-lines file source feeds
the same parse the Kafka path uses."""

from __future__ import annotations

import json

from monasca_aggregator_spark.config import DEFAULTS, EngineConfig


def test_defaults_match_reference_viper_defaults():
    cfg = EngineConfig.from_dict({})
    # reference: server.go:90-112 SetDefault calls + config.yaml
    assert cfg.window_size_sec == DEFAULTS["windowSize"]
    assert cfg.window_lag_sec == DEFAULTS["windowLag"]
    assert cfg.consumer_topic == "metrics"
    assert cfg.producer_topic == "metrics"
    assert cfg.bootstrap_servers == "localhost:9092"
    assert cfg.group_id == "monasca-aggregation"


def test_reference_config_yaml_shape(tmp_path):
    p = tmp_path / "config.yaml"
    p.write_text(
        """
logging:
  level: INFO

windowSize: 60
windowLag: 5
consumerTopic: in-metrics
producerTopic: out-metrics

kafka:
  bootstrap.servers: broker-1:9092
  group.id: my-group

prometheus:
  endpoint: localhost:8080
""".strip()
    )
    cfg = EngineConfig.from_yaml(str(p))
    assert cfg.window_size_sec == 60
    assert cfg.window_lag_sec == 5
    assert cfg.consumer_topic == "in-metrics"
    assert cfg.producer_topic == "out-metrics"
    assert cfg.bootstrap_servers == "broker-1:9092"
    assert cfg.group_id == "my-group"
    # unknown sections carried, not dropped
    assert cfg.extras["prometheus"]["endpoint"] == "localhost:8080"


def test_envelope_jsonl_file_source(spark, tmp_path):
    from monasca_aggregator_spark.sources.envelope import read_envelope_json

    lines = [
        json.dumps(
            {
                "metric": {
                    "name": "cpu.idle",
                    "dimensions": {"host": f"h{i}"},
                    "timestamp": 1000.0 * i,
                    "value": float(i),
                    "value_meta": {},
                },
                "meta": {"tenantId": "t0"},
                "creation_time": i,
            }
        )
        for i in range(5)
    ] + ["{not json"]  # malformed line → dropped, like the reference
    (tmp_path / "batch.jsonl").write_text("\n".join(lines))
    env = read_envelope_json(spark, str(tmp_path))
    rows = env.orderBy("value").collect()
    assert len(rows) == 5
    assert [r.dimensions["host"] for r in rows] == [f"h{i}" for i in range(5)]

    stream = read_envelope_json(spark, str(tmp_path), streaming=True)
    assert stream.isStreaming
    assert stream.columns == env.columns


def test_continuous_pipeline_composition_brokerless(spark, sf_small, tmp_path):
    """The whole-runtime composition (build_continuous_pipeline) run
    broker-less via injected file source + memory sink: two rules, each
    its own StreamingQuery, in/out counters in the progress events."""
    from monasca_aggregator_spark.config import (
        EngineConfig,
        build_continuous_pipeline,
    )
    from monasca_aggregator_spark.models import AggregationSpec
    from monasca_aggregator_spark.observability import IN_METRIC, OUT_METRIC
    from monasca_aggregator_spark.sources.envelope import events_to_envelopes
    from pyspark.sql import functions as F

    # heartbeat off: this is a BOUNDED availableNow replay — the
    # wall-clock heartbeat is for unbounded production topics (with a
    # rate source in the union, availableNow terminates after the data
    # batch without the watermark-flushing no-data batch)
    cfg = EngineConfig.from_dict(
        {"windowSize": 3600, "windowLag": 2, "heartbeat": False}
    )
    assert EngineConfig.from_dict({}).heartbeat  # production default ON
    specs = [
        AggregationSpec(
            name=f"r{i}",
            aggregated_metric_name=f"agg.{m}.sum",
            filtered_metric_name=m,
            function="sum",
        )
        for i, m in enumerate(["click", "view"])
    ]

    def source():
        raw_schema = spark.read.parquet(f"{sf_small}/events.parquet").schema
        raw = (
            spark.readStream.schema(raw_schema)
            .format("parquet")
            .option("pathGlobFilter", "events.parquet")
            .load(sf_small)
        )
        if dict(raw.dtypes)["ts"] == "bigint":
            raw = raw.withColumn(
                "ts", F.timestamp_micros(F.expr("ts div 1000"))
            )
        return events_to_envelopes(raw)

    def sink(plan, spec):
        return (
            plan.writeStream.format("memory")
            .queryName(f"cp_{spec.name}")
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / spec.name))
            .trigger(availableNow=True)
            .start()
        )

    queries = build_continuous_pipeline(
        spark, cfg, specs, checkpoint_dir=str(tmp_path), source=source,
        sink=sink,
    )
    assert len(queries) == 2
    observed = {}
    for q in queries:
        q.awaitTermination()
        for p in q.recentProgress:
            om = p["observedMetrics"] if isinstance(p, dict) else p.observedMetrics
            for k, v in om.items():
                observed[k] = observed.get(k, 0) + v["n"]
    # both rules produced windows; counters rode the micro-batches
    assert spark.table("cp_r0").count() > 0
    assert spark.table("cp_r1").count() > 0
    assert observed.get(IN_METRIC, 0) > 0
    assert observed.get(OUT_METRIC, 0) > 0
