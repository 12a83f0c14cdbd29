"""Parquet table catalog for the test datasets.

Column-pruned, predicate-pushdown-friendly scans: callers select/filter
on the returned DataFrame and Catalyst pushes both into the parquet
reader (asserted in tests/test_plans.py).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

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


def _estimated_scan_tasks(spark: SparkSession, path: str) -> int:
    """Scan parallelism estimate from file bytes ÷ maxPartitionBytes.

    Cheap (no plan analysis). An upper bound: parquet row groups below
    the split size collapse into fewer tasks, never more.
    """
    max_bytes = int(
        spark.conf.get("spark.sql.files.maxPartitionBytes", "134217728").rstrip("b")
    )
    return max(1, -(-os.path.getsize(path) // max_bytes))


def load_table(
    spark: SparkSession, sf_dir: str, name: str, *, fan_out: bool = False
) -> DataFrame:
    """Catalog scan. ``fan_out=True`` guarantees cluster-wide parallelism
    for compute-dense consumers (shingling, hashing, vector math):

    A parquet file is splittable only at row-group boundaries, so a
    small/single-row-group file scans as ONE task no matter how many
    cores exist, serializing everything pipelined with the scan. When the
    estimated scan task count is below the session's parallelism,
    round-robin repartition to fan the work out. At real scale (many
    files / row groups) the condition is false and this is a no-op — no
    extra shuffle. Catalyst still pushes filters and column pruning
    through Repartition to the scan, so express cheap row filters BEFORE
    expensive derived columns: a pushed-down predicate over a derived
    column inlines its whole expression below the exchange and
    re-serializes the compute (see operators/dedup.py).

    Scan-cheap consumers (vectorized columnar agg/join) should keep the
    default: partial aggregation below the first shuffle already
    parallelizes them at scale, and an unconditional repartition would
    pay a full-table shuffle for nothing.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.parquet(path)
    for col in _NANO_TS_COLS.get(name, ()):
        if col in df.columns and dict(df.dtypes)[col] == "bigint":
            # integer `div`, not `/1000`: double division rounds to
            # nearest (±1 µs at 2024-epoch magnitudes); DuckDB floors
            df = df.withColumn(
                col, F.timestamp_micros(F.expr(f"{col} div 1000"))
            )
    # Some SFs store µs TIMESTAMP_NTZ instead of nanos; normalize to
    # session-TZ TIMESTAMP (session is UTC, so values are unchanged) so
    # unix_millis & friends apply uniformly.
    for col, dtype in df.dtypes:
        if dtype == "timestamp_ntz":
            df = df.withColumn(col, F.col(col).cast("timestamp"))
    if fan_out:
        target = spark.sparkContext.defaultParallelism
        if _estimated_scan_tasks(spark, path) < target:
            df = df.repartition(target)
    return df


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: Sequence[str],
    *,
    num_buckets: int = 32,
    sort_cols: Sequence[str] | None = None,
) -> None:
    """Persist a fact table bucketed (and optionally sorted) by its join
    key. Two tables bucketed the same way join with ZERO exchanges —
    at 100 TB this turns every repeated fact⋈fact join on that key from
    a full-cluster shuffle into a local merge per bucket; the shuffle is
    paid once at write time. (Bucketing requires saveAsTable — the
    bucket layout lives in the metastore.)
    """
    writer = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    writer.saveAsTable(table_name)


def register_tables(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view for spark.sql() use — through
    load_table so views carry the same normalized timestamp types the
    DataFrame API sees."""
    for name in TABLES:
        if os.path.exists(os.path.join(sf_dir, f"{name}.parquet")):
            load_table(spark, sf_dir, name).createOrReplaceTempView(name)


def load_evolving(
    spark: SparkSession,
    path: str,
    *,
    defaults: dict[str, object] | None = None,
) -> DataFrame:
    """Read a parquet dataset whose schema EVOLVED across batches
    (older files missing newer columns) — the long-lived-dataset read
    path plain ``spark.read.parquet`` gets wrong (it samples one
    file's footer and silently drops newer columns, or errors).

    ``mergeSchema=true`` unions all footers (newer columns surface as
    NULL in older files); ``defaults`` then back-fills chosen columns
    so downstream plans never special-case the old batches. At
    warehouse scale footer-merge cost is per-FILE metadata, not data —
    and belongs in a table format's manifest; the read shape here is
    identical.
    """
    df = spark.read.option("mergeSchema", "true").parquet(path)
    for col, val in (defaults or {}).items():
        df = df.withColumn(col, F.coalesce(F.col(col), F.lit(val)))
    return df
