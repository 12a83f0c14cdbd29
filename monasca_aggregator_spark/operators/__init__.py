from monasca_aggregator_spark.operators.aggregate import (
    build_aggregation,
    matches_metric,
)

__all__ = ["build_aggregation", "matches_metric"]
