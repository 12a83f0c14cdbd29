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
