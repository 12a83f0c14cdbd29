"""PySpark-native continuous metric aggregation engine.

A from-scratch re-expression of the capabilities of
monasca/monasca-aggregator (reference: /root/reference, Go) on Apache
Spark: declarative DataFrame plans compiled from the same YAML rule DSL,
batch + Structured Streaming execution, plus large-scale data-pipeline
operators (dedup, similarity search, text analysis, multimodal columns).
"""

from monasca_aggregator_spark.models import AggregationSpec, Rollup
from monasca_aggregator_spark.specs import load_specs, load_specs_from_yaml
from monasca_aggregator_spark.operators.aggregate import build_aggregation

__all__ = [
    "AggregationSpec",
    "Rollup",
    "load_specs",
    "load_specs_from_yaml",
    "build_aggregation",
]

__version__ = "0.1.0"
