from monasca_aggregator_spark.functions.windows import (
    window_id,
    window_start_ms,
    window_start_sec,
)

__all__ = ["window_id", "window_start_ms", "window_start_sec"]
