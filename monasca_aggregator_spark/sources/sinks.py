"""Sharded dataset writers — the output side of a training pipeline.

The failure modes at 100 TB are file-count pathologies, not
correctness: an unpartitioned write emits one file per shuffle
partition per directory (tiny-file explosion when partitionBy columns
are present), and a naive coalesce serializes the whole write through
a few tasks. ``write_sharded`` pins both down:

- rows are shuffled BY the partition columns first, so each output
  directory is produced by as few tasks as own its data (no
  n_partitions × n_dirs tiny files);
- inside a directory, ``maxRecordsPerFile`` rolls files at a target
  row count, so shard size is bounded no matter how skewed a
  partition is;
- with no partition columns, an explicit hash ``repartition(n)``
  spreads rows into ~equal shards (id-hashed → rerun-stable layout).

Kafka output (the reference's sink, server.go:150-185) lives in
sources/kafka.py; this module is the file-dataset counterpart.
"""

from __future__ import annotations

import math
import os
import shutil
import uuid
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_sharded(
    df: DataFrame,
    path: str,
    *,
    partition_by: Sequence[str] = (),
    target_rows_per_file: int | None = None,
    shard_key: str | None = None,
    n_shards: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
    bloom_filter_cols: Sequence[str] = (),
    bloom_filter_ndv: int = 1_000_000,
) -> None:
    """Write ``df`` as a sharded dataset with bounded file sizes.

    partition_by: hive-style directory partitioning (read-side
        partition pruning — the scan-cost lever for downstream jobs).
    target_rows_per_file: roll files at this row count
        (spark.sql.files ``maxRecordsPerFile``).
    shard_key/n_shards: without partition columns, hash-repartition on
        ``shard_key`` into ``n_shards`` writer tasks for even shards.
    bloom_filter_cols: write a parquet BLOOM FILTER per listed column
        (``parquet.bloom.filter.enabled#col``) sized for
        ``bloom_filter_ndv`` distinct values per row group — the
        data-skipping structure for POINT lookups on high-cardinality
        columns where min/max stats can't prune (a random id hits
        every file's min/max range; the bloom filter lets the reader
        skip row groups that definitely lack the key). Costs ~1.2
        bytes/NDV of file size per column; worth it on id-shaped join
        keys, wasted on low-cardinality columns (dictionary + min/max
        already handle those).
    """
    if partition_by:
        # one shuffle keyed by the partition cols: each directory's rows
        # land in the writer tasks that own them
        df = df.repartition(*[F.col(c) for c in partition_by])
    elif n_shards is not None:
        if shard_key is not None:
            df = df.repartition(n_shards, F.col(shard_key))
        else:
            df = df.repartition(n_shards)

    writer = df.write.mode(mode).format(fmt)
    if target_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", target_rows_per_file)
    for c in bloom_filter_cols:
        writer = writer.option(f"parquet.bloom.filter.enabled#{c}", "true")
        writer = writer.option(
            f"parquet.bloom.filter.expected.ndv#{c}", str(bloom_filter_ndv)
        )
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.save(path)


def plan_shards(n_rows: int, target_rows_per_file: int) -> int:
    """Shard count for an even layout at a target file size."""
    return max(1, math.ceil(n_rows / target_rows_per_file))


def write_range_sorted(
    df: DataFrame,
    path: str,
    order_by: Sequence[str],
    *,
    n_shards: int,
    target_rows_per_file: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Globally range-sorted shard layout: rows are range-partitioned
    on ``order_by`` (one skew-aware sampled shuffle) and sorted within
    each shard, so shard k's key range precedes shard k+1's and every
    parquet row group carries tight, disjoint min/max stats — the
    layout that turns a key-range predicate into file- and
    row-group-level data skipping for every downstream scan."""
    cols = [F.col(c) for c in order_by]
    out = df.repartitionByRange(n_shards, *cols).sortWithinPartitions(*cols)
    writer = out.write.mode(mode).format(fmt)
    if target_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", target_rows_per_file)
    writer.save(path)


def zorder_value(cols: Sequence[str], *, bits: int = 16) -> F.Column:
    """Z-order (Morton) key from non-negative integer columns: bit i of
    column j lands at interleaved position ``i·n_cols + j``. Pure
    bitwise column expressions (shift/and/or), so the key computes
    JVM-side inside whole-stage codegen. Callers pre-scale values into
    [0, 2^bits); total bits must fit a long (n_cols·bits ≤ 63)."""
    n = len(cols)
    if n * bits > 63:
        raise ValueError("n_cols * bits must be <= 63")
    z = F.lit(0).cast("long")
    for j, c in enumerate(cols):
        col = F.col(c).cast("long")
        for i in range(bits):
            bit = F.shiftright(col, i).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, i * n + j))
    return z


def write_zordered(
    df: DataFrame,
    path: str,
    cols: Sequence[str],
    *,
    bits: int = 16,
    n_shards: int,
    target_rows_per_file: int | None = None,
    mode: str = "overwrite",
    fmt: str = "parquet",
) -> None:
    """Multi-dimensional clustering: range-partition + sort on the
    Z-order key so a predicate on ANY prefix/subset of ``cols`` hits a
    small band of shards (each file covers a compact hyper-rectangle
    of the key space, and its per-column parquet min/max stay tight —
    unlike a lexicographic sort, which only skips on the leading
    column)."""
    z = zorder_value(cols, bits=bits).alias("__z")
    out = (
        df.withColumn("__z", z)
        .repartitionByRange(n_shards, F.col("__z"))
        .sortWithinPartitions("__z")
        .drop("__z")
    )
    writer = out.write.mode(mode).format(fmt)
    if target_rows_per_file is not None:
        writer = writer.option("maxRecordsPerFile", target_rows_per_file)
    writer.save(path)


def merge_upsert(
    spark: SparkSession,
    path: str,
    updates: DataFrame,
    key_cols: Sequence[str],
    partition_col: str,
) -> None:
    """Copy-on-write MERGE (upsert by key) into a hive-partitioned
    parquet dataset — the backfill/correction primitive a metrics store
    needs (late re-aggregations replacing published windows) and the
    Delta/Iceberg MERGE shape without a table format.

    Cost model is partition-local: only partitions PRESENT in
    ``updates`` are read, merged (base rows losing to same-key update
    rows via left-anti), staged, and swapped in with dynamic partition
    overwrite — untouched partitions are never read or rewritten, so
    the cost scales with the update footprint, not the dataset. The
    staging round-trip exists because Spark cannot overwrite a path it
    is reading (and it doubles as the commit point: the final write is
    all-or-nothing per partition directory).

    On an object store, swap the directory swap for a manifest-commit
    table format; the plan shape stays identical.
    """
    key_cols = list(key_cols)
    parts = [
        r[0] for r in updates.select(partition_col).distinct().collect()
    ]
    base = spark.read.parquet(path)
    affected = base.filter(F.col(partition_col).isin(parts))
    merged = affected.join(
        updates.select(*key_cols).distinct(), key_cols, "left_anti"
    ).unionByName(updates.select(*base.columns))
    staging = f"{path}__merge_{uuid.uuid4().hex[:8]}"
    try:
        merged.write.mode("overwrite").parquet(staging)
        (
            spark.read.parquet(staging)
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(path)
        )
    finally:
        shutil.rmtree(staging, ignore_errors=True)


def compact_dataset(
    spark: SparkSession,
    path: str,
    *,
    target_rows_per_file: int,
    partition_by: Sequence[str] = (),
) -> int:
    """Rewrite a parquet dataset into right-sized shards (the
    maintenance pass that undoes streaming/incremental tiny-file
    accumulation). Reads, re-shards via ``write_sharded`` into a
    staging dir, then swaps directories. Returns the new file count.

    At warehouse scale run this per partition directory on a schedule;
    here the whole dataset fits one pass. Directory swap is a
    same-filesystem rename — object stores want a manifest commit
    instead."""
    df = spark.read.parquet(path)
    n_rows = df.count()
    staging = f"{path}__compact_{uuid.uuid4().hex[:8]}"
    try:
        write_sharded(
            df,
            staging,
            partition_by=partition_by,
            target_rows_per_file=target_rows_per_file,
            n_shards=(
                None if partition_by else plan_shards(n_rows, target_rows_per_file)
            ),
        )
        old = f"{path}__old_{uuid.uuid4().hex[:8]}"
        os.rename(path, old)
        os.rename(staging, path)
        shutil.rmtree(old)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return sum(
        1
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )


def write_audit_publish(
    df: DataFrame,
    spark: SparkSession,
    path: str,
    checks: Sequence,
    *,
    partition_by: Sequence[str] = (),
    target_rows_per_file: int = 250_000,
) -> dict:
    """Write-Audit-Publish: stage the dataset, run every audit check
    against the STAGED files (never the in-memory plan — the audit
    must see exactly the bytes readers will), and only then swap the
    staging directory into place. A failing audit leaves the previous
    published data untouched and removes the staging dir — bad data is
    never visible to a reader, which is the entire point of WAP over
    write-then-validate.

    ``checks``: callables ``(DataFrame) -> (bool, str)`` evaluated on
    a fresh scan of the staged parquet. Returns a manifest dict
    {published, n_rows, checks: [(name, ok, detail)]}; raises
    ValueError on audit failure after cleanup. Swap mechanics match
    compact_dataset (same-filesystem rename; object stores commit a
    manifest instead)."""
    staging = f"{path}__wap_{uuid.uuid4().hex[:8]}"
    results = []
    try:
        write_sharded(
            df,
            staging,
            partition_by=partition_by,
            target_rows_per_file=target_rows_per_file,
        )
        staged = spark.read.parquet(staging)
        n_rows = staged.count()
        ok_all = True
        for check in checks:
            ok, detail = check(staged)
            results.append(
                (getattr(check, "__name__", "check"), bool(ok), str(detail))
            )
            ok_all = ok_all and bool(ok)
        if not ok_all:
            raise ValueError(f"WAP audit failed: {results}")
        if os.path.exists(path):
            old = f"{path}__old_{uuid.uuid4().hex[:8]}"
            os.rename(path, old)
            os.rename(staging, path)
            shutil.rmtree(old)
        else:
            os.rename(staging, path)
    finally:
        shutil.rmtree(staging, ignore_errors=True)
    return {"published": True, "n_rows": n_rows, "checks": results}


def committed_sink_files(out_dir: str) -> list[str]:
    """Files the streaming file sink has COMMITTED, per its
    ``_spark_metadata`` log — the reader half of the reference's
    publish-then-commit contract (server.go:222-258: output becomes
    visible only at offset commit).

    A stopped/killed query can abort an in-flight ``addBatch`` and
    leave orphan part files in the directory while the abort cleans
    them up; metadata-aware readers (Spark itself, when it reads a
    directory that carries ``_spark_metadata``) never see those.
    Listing the directory raw races that cleanup — this helper reads
    the commit log instead, so callers observe exactly the committed
    prefix.

    Compaction contract: every ``spark.sql.streaming.fileSink.log
    .compactInterval``-th batch (default 10) writes ``N.compact``
    re-listing every prior entry; the per-batch files it supersedes
    may still sit beside it, so concatenating all log files would
    double-count every pre-compaction batch.  Keep the newest compact
    plus strictly-later per-batch logs.
    """
    import json

    meta = os.path.join(out_dir, "_spark_metadata")
    if not os.path.isdir(meta):
        return []
    entries = []  # (batch_id, is_compact, filename)
    for name in os.listdir(meta):
        if name.startswith("."):
            continue  # in-progress temp files
        stem, _, suffix = name.partition(".")
        if not stem.isdigit():
            continue
        entries.append((int(stem), suffix == "compact", name))
    compacts = [e for e in entries if e[1]]
    floor = max(c[0] for c in compacts) if compacts else -1
    keep = sorted(
        e for e in entries if (e[1] and e[0] == floor) or e[0] > floor
    )
    files: list[str] = []
    for _, _, name in keep:
        with open(os.path.join(meta, name)) as f:
            for line in f:
                line = line.strip()
                if line.startswith("{"):
                    rec = json.loads(line)
                    if "path" in rec:
                        files.append(rec["path"])
    return files
