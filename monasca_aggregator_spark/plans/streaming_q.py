"""Driver-facing streaming query: the Structured Streaming path run to
completion over the events table, with a plain-SQL oracle — proving the
streaming plan computes exactly what the batch/SQL semantics say.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.models import AggregationSpec
from monasca_aggregator_spark.streaming.pipeline import run_events_stream_to_memory

_W_MS = 3600 * 1000


def q_agg_streaming(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = AggregationSpec(
        name="stream_avg_purchase",
        aggregated_metric_name="agg.purchase.avg",
        filtered_metric_name="purchase",
        function="avg",
        grouped_dimensions=("user_id",),
    )
    out = run_events_stream_to_memory(
        spark, sf_dir, spec, query_name="q_agg_streaming"
    )
    return out.select(
        "window_ts_ms",
        F.col("dimensions").getItem("user_id").alias("user_id"),
        stable_round(F.col("value"), 4).alias("value"),
    )


ORACLE_STREAMING = f"""
SELECT (epoch_ms(ts) // {_W_MS}) * {_W_MS} AS window_ts_ms,
       CAST(user_id AS VARCHAR) AS user_id,
       {sql_stable_round("avg(value)", 4)} AS value
FROM events
WHERE event_type = 'purchase'
GROUP BY 1, 2
""".strip()


def q_agg_streaming_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming delta/rate: max_by/min_by are streaming-safe aggregates,
    so the reference's rate metric runs under the watermarked windowed
    plan unchanged — no custom state store operator needed."""
    spec = AggregationSpec(
        name="stream_rate_signup",
        aggregated_metric_name="agg.signup.rate",
        filtered_metric_name="signup",
        function="rate",
        grouped_dimensions=("user_id",),
    )
    out = run_events_stream_to_memory(
        spark, sf_dir, spec, query_name="q_agg_streaming_rate"
    )
    return out.select(
        "window_ts_ms",
        F.col("dimensions").getItem("user_id").alias("user_id"),
        stable_round(F.col("value"), 8).alias("value"),
    )


ORACLE_STREAMING_RATE = f"""
SELECT (epoch_ms(ts) // {_W_MS}) * {_W_MS} AS window_ts_ms,
       CAST(user_id AS VARCHAR) AS user_id,
       {sql_stable_round(
           "(arg_max(value, ts) - arg_min(value, ts)) / "
           "nullif((max(epoch_ms(ts)) - min(epoch_ms(ts))) / 1000.0, 0.0)",
           8,
       )} AS value
FROM events
WHERE event_type = 'signup'
GROUP BY 1, 2
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "agg_streaming": q_agg_streaming,
    "agg_streaming_rate": q_agg_streaming_rate,
}

ORACLES: dict[str, str] = {
    "agg_streaming": ORACLE_STREAMING,
    "agg_streaming_rate": ORACLE_STREAMING_RATE,
}
