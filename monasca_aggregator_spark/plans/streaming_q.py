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


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "agg_streaming": q_agg_streaming,
}

ORACLES: dict[str, str] = {
    "agg_streaming": ORACLE_STREAMING,
}
