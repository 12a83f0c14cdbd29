"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

_REPO = Path(__file__).resolve().parent
if str(_REPO) not in sys.path:
    sys.path.insert(0, str(_REPO))

from monasca_aggregator_spark.registry import all_oracles, all_queries  # noqa: E402


def _configure(spark: SparkSession) -> SparkSession:
    """Session conf the engine relies on (the driver builds its own
    session, so set these here rather than assuming session.get_spark)."""
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try:
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    except Exception:
        pass  # static in some builds; load_table copes either way
    return spark


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the spec engine's
    two-stage rollup aggregation over the event stream."""
    _configure(spark)
    from monasca_aggregator_spark.plans.metrics import q_agg_rollup

    return q_agg_rollup(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out = {}
    for name, fn in all_queries().items():
        out[name] = _wrap(fn)
    return out


def _wrap(fn):
    def runner(spark: SparkSession, sf_dir: str) -> DataFrame:
        return fn(_configure(spark), sf_dir)

    return runner


def oracle_sql() -> dict[str, str]:
    return all_oracles()
