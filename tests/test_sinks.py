"""Sharded writer (sources/sinks.py): directory layout, file rolling,
and roundtrip fidelity on a real local write."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

from monasca_aggregator_spark.sources.sinks import plan_shards, write_sharded
from monasca_aggregator_spark.sources.tables import load_table


def _parquet_files(root: Path) -> list[Path]:
    return [p for p in root.rglob("*.parquet") if p.is_file()]


def test_partitioned_write_prunes_and_rolls_files(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = tmp_path / "by_lang"
    write_sharded(
        docs,
        str(out),
        partition_by=["lang"],
        target_rows_per_file=40,
    )
    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {p.name for p in out.iterdir() if p.is_dir()}
    assert dirs == {f"lang={la}" for la in langs}

    # maxRecordsPerFile: no file exceeds the target
    for f in _parquet_files(out):
        n = spark.read.parquet(str(f)).count()
        assert n <= 40

    # roundtrip: same rows, and partition pruning reaches the scan
    back = spark.read.parquet(str(out))
    assert back.count() == docs.count()
    one = next(iter(langs))
    pruned = back.filter(F.col("lang") == one)
    assert pruned.count() == docs.filter(F.col("lang") == one).count()


def test_partitioned_write_avoids_tiny_file_explosion(
    spark, sf_small, tmp_path
):
    """Pre-shuffling by the partition cols caps files per directory at
    the writer-task count that owns the data — NOT
    shuffle_partitions × n_dirs."""
    docs = load_table(spark, sf_small, "documents").repartition(8)
    out = tmp_path / "compact"
    write_sharded(docs, str(out), partition_by=["lang"])
    for d in out.iterdir():
        if d.is_dir():
            # without the repartition this would be up to 8 files/dir
            assert len(_parquet_files(d)) <= 2


def test_unpartitioned_hash_sharding_is_even(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = tmp_path / "shards"
    write_sharded(docs, str(out), shard_key="doc_id", n_shards=5)
    files = _parquet_files(out)
    assert len(files) == 5
    sizes = sorted(spark.read.parquet(str(f)).count() for f in files)
    # hash sharding: no shard more than ~2x the smallest
    assert sizes[-1] <= 2 * max(1, sizes[0])


def test_plan_shards():
    assert plan_shards(0, 100) == 1
    assert plan_shards(100, 100) == 1
    assert plan_shards(101, 100) == 2
