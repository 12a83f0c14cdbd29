"""Central query/oracle registry consumed by __spark_entry__.py.

Every implemented operator from SURVEY.md §2 registers here as a
(query builder, DuckDB oracle SQL) pair; rows-only entries register a
query with no oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from monasca_aggregator_spark.plans import metrics, tpch


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        out.update(mod.QUERIES)
    return out


def all_oracles() -> dict[str, str]:
    out: dict[str, str] = {}
    for mod in _modules():
        out.update(mod.ORACLES)
    return out


def _modules():
    mods = [metrics, tpch]
    for name in (
        "analytic",
        "tpch_ext",
        "pipeline_ops",
        "dedup",
        "textops",
        "similarity",
        "semistruct",
        "streaming_q",
        "temporal",
        "series",
    ):
        try:
            mod = __import__(
                f"monasca_aggregator_spark.plans.{name}", fromlist=[name]
            )
            mods.append(mod)
        except ImportError:
            pass
    return mods
