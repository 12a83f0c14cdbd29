"""Engine runtime config — the reference's config.yaml surface
(reference: config.yaml, server.go:90-112 viper defaults).

``EngineConfig.from_yaml`` accepts the reference's file verbatim, so a
user switches engines by pointing this loader at their existing
config + aggregation-specifications files and calling
``build_continuous_pipeline``. Reference knobs that are
Spark-runtime concerns map as:

- windowSize / windowLag (seconds) → tumbling window size / watermark
- consumerTopic / producerTopic / kafka.* → sources.kafka options
- logging / prometheus endpoints → Spark's own log4j + metrics sinks
  (carried through for compatibility, not interpreted here)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

from monasca_aggregator_spark.models import AggregationSpec

DEFAULTS = {
    "windowSize": 10,
    "windowLag": 2,
    "consumerTopic": "metrics",
    "producerTopic": "metrics",
    "kafka": {
        "bootstrap.servers": "localhost:9092",
        "group.id": "monasca-aggregation",
    },
}


@dataclass(frozen=True)
class EngineConfig:
    window_size_sec: int = 10
    window_lag_sec: int = 2
    consumer_topic: str = "metrics"
    producer_topic: str = "metrics"
    bootstrap_servers: str = "localhost:9092"
    group_id: str = "monasca-aggregation"
    # wall-clock publication for quiet topics (the reference's ticker,
    # server.go:213-296): unions the rate-source heartbeat so windows
    # finalize at lag past close with no new data. On by default —
    # matching the reference's behavior; turn off for availableNow /
    # bounded-replay runs where the source drains and stops.
    heartbeat: bool = True
    extras: dict = field(default_factory=dict)

    @classmethod
    def from_dict(cls, raw: dict[str, Any]) -> "EngineConfig":
        merged = {**DEFAULTS, **(raw or {})}
        kafka = {**DEFAULTS["kafka"], **(merged.get("kafka") or {})}
        known = {
            "windowSize",
            "windowLag",
            "consumerTopic",
            "producerTopic",
            "kafka",
            "heartbeat",
        }
        return cls(
            window_size_sec=int(merged["windowSize"]),
            window_lag_sec=int(merged["windowLag"]),
            consumer_topic=str(merged["consumerTopic"]),
            producer_topic=str(merged["producerTopic"]),
            bootstrap_servers=str(kafka["bootstrap.servers"]),
            group_id=str(kafka["group.id"]),
            heartbeat=bool(merged.get("heartbeat", True)),
            extras={k: v for k, v in merged.items() if k not in known},
        )

    @classmethod
    def from_yaml(cls, path: str) -> "EngineConfig":
        import yaml

        with open(path) as f:
            return cls.from_dict(yaml.safe_load(f) or {})


def build_continuous_pipeline(
    spark,
    config: EngineConfig,
    specs: list[AggregationSpec],
    *,
    checkpoint_dir: str,
    source=None,
    sink=None,
):
    """The reference's whole runtime as one call: Kafka envelopes in →
    every (non-rollup) rule's watermarked windowed aggregation →
    envelope JSON back to Kafka. Returns the started StreamingQueries
    (one per rule — independent state stores and output topics keep one
    hot rule from stalling the rest; reference runs them in one loop,
    server.go:306-310).

    ``source``/``sink`` default to the Kafka edges (needs a broker +
    connector); inject alternatives to run the SAME composition
    against files/memory — ``source: () -> streaming DataFrame`` of
    envelopes, ``sink: (plan, spec) -> StreamingQuery``. (This is also
    how the broker-less tests cover the full runtime.)

    ``config.heartbeat`` (default ON — the reference's wall-clock
    ticker) unions the rate-source heartbeat so quiet topics still
    publish at lag past close. Set it false for BOUNDED replays
    (availableNow sinks): with a rate source in the union, availableNow
    terminates after the data batch without the watermark-flushing
    no-data batch and emits nothing.
    """
    from monasca_aggregator_spark.observability import (
        IN_METRIC,
        OUT_METRIC,
        count_edge,
    )
    from monasca_aggregator_spark.sources.kafka import (
        read_envelope_stream,
        write_envelope_stream,
    )
    from monasca_aggregator_spark.streaming.pipeline import (
        build_streaming_aggregation,
    )

    env = (
        source()
        if source is not None
        else read_envelope_stream(
            spark, config.bootstrap_servers, config.consumer_topic
        )
    )
    # reference parity: in_messages/out_messages counters
    # (server.go:42-48) — observe() metrics per micro-batch in each
    # query's StreamingQueryProgress.observedMetrics
    env, _ = count_edge(env, IN_METRIC, streaming=True)
    if config.heartbeat:
        from monasca_aggregator_spark.streaming.pipeline import (
            with_wallclock_heartbeat,
        )

        # counted ABOVE the heartbeat union so in_messages stays a
        # true consumed-envelope count (ticks are not messages)
        env = with_wallclock_heartbeat(env, spark)
    queries = []
    for spec in specs:
        plan = build_streaming_aggregation(
            env, spec, config.window_size_sec, config.window_lag_sec
        )
        plan, _ = count_edge(plan, OUT_METRIC, streaming=True)
        if sink is not None:
            queries.append(sink(plan, spec))
        else:
            queries.append(
                write_envelope_stream(
                    plan,
                    config.bootstrap_servers,
                    config.producer_topic,
                    checkpoint_dir=f"{checkpoint_dir}/{spec.name}",
                )
            )
    return queries
