"""Parquet table catalog for the test datasets.

Column-pruned, predicate-pushdown-friendly scans: callers select/filter
on the returned DataFrame and Catalyst pushes both into the parquet
reader (asserted in tests/test_plans.py).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# The driver's parquet stores event-time columns as TIMESTAMP(NANOS),
# which Spark's vectorized reader rejects; with
# spark.sql.legacy.parquet.nanosAsLong=true they surface as bigint ns and
# are converted here (ns → µs integer division, exact — matches DuckDB's
# µs truncation of the same values).
_NANO_TS_COLS = {
    "events": ("ts",),
    "lineitem": ("l_shipdate",),
    "orders": ("o_orderdate",),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            df = df.withColumn(
                col, F.timestamp_micros((F.col(col) / 1000).cast("bigint"))
            )
    # Some SFs store µs TIMESTAMP_NTZ instead of nanos; normalize to
    # session-TZ TIMESTAMP (session is UTC, so values are unchanged) so
    # unix_millis & friends apply uniformly.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    return df


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use."""
    for name in TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            spark.read.parquet(path).createOrReplaceTempView(name)
