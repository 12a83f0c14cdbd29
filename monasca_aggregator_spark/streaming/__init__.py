from monasca_aggregator_spark.streaming.pipeline import (
    build_streaming_aggregation,
    run_events_stream_to_memory,
)

__all__ = ["build_streaming_aggregation", "run_events_stream_to_memory"]
