"""Streaming FROM the snapshot table (sources/table_stream.py): each
commit's rows arrive exactly once, restarts resume from the
checkpoint with no side state, starting_version skips history, and a
write-sink → stream-source chain closes the lakehouse loop."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.sources.table_log import snapshot_write
from monasca_aggregator_spark.sources.table_stream import register


def _tbl(spark, path, lo, hi):
    snapshot_write(
        spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ),
        path,
    )


def _drain(spark, path, out_dir, ck, opts=None):
    reader = spark.readStream.format("snapshot_table").option("path", path)
    for k, v in (opts or {}).items():
        reader = reader.option(k, v)
    q = (
        reader.load()
        .writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def test_stream_from_table_exactly_once(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "tbl")
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck")
    _tbl(spark, path, 0, 5)
    _tbl(spark, path, 5, 8)

    _drain(spark, path, out, ck)
    assert {r.k for r in spark.read.parquet(out).collect()} == set(range(8))

    # new commits between runs: a restarted query with the same
    # checkpoint consumes ONLY them (the commit log is the offset
    # truth — no side state to lose)
    _tbl(spark, path, 8, 12)
    _drain(spark, path, out, ck)
    got = sorted(r.k for r in spark.read.parquet(out).collect())
    assert got == list(range(12)), got  # no duplicates, no gaps

    # idle restart: nothing new, nothing re-served
    _drain(spark, path, out, ck)
    assert sorted(
        r.k for r in spark.read.parquet(out).collect()
    ) == list(range(12))


def test_stream_from_table_starting_version(spark, tmp_path):
    register(spark)
    path = str(tmp_path / "tbl2")
    _tbl(spark, path, 0, 5)   # version 1
    _tbl(spark, path, 5, 8)   # version 2
    out = str(tmp_path / "out2")
    _drain(
        spark,
        path,
        out,
        str(tmp_path / "ck2"),
        opts={"starting_version": "1"},
    )
    # version 1's initial load skipped; only version 2's rows arrive
    assert {r.k for r in spark.read.parquet(out).collect()} == {5, 6, 7}


def test_sink_to_source_chain_closes_the_loop(spark, tmp_path):
    """The lakehouse loop end to end: the near-dedup SINK writes
    survivors into the snapshot table; a second pipeline SUBSCRIBES to
    the same table via the snapshot_table source and sees exactly the
    survivor rows, per commit, exactly once."""
    from monasca_aggregator_spark.streaming.pipeline import (
        minhash_dedup_sink,
    )

    register(spark)
    index_path = str(tmp_path / "chain_idx")
    docs_path = str(tmp_path / "chain_docs")
    sink = minhash_dedup_sink(index_path, docs_path)
    schema = "doc_id long, text string"
    sink(
        spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog near the river bank"),
                (2, "the quick brown fox jumps over the lazy dog near the river side"),
            ],
            schema,
        ),
        0,
    )  # 2 is an in-batch near-dup of 1: only 1 survives
    out = str(tmp_path / "chain_out")
    _drain(spark, docs_path, out, str(tmp_path / "chain_ck"))
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1}

    sink(
        spark.createDataFrame(
            [(3, "a wholly new document about parquet commit logs and manifests")],
            schema,
        ),
        1,
    )
    _drain(spark, docs_path, out, str(tmp_path / "chain_ck"))
    assert {r.doc_id for r in spark.read.parquet(out).collect()} == {1, 3}


def test_stream_from_table_timestamp_column(spark, tmp_path):
    """r9: Spark writes parquet TIMESTAMP UTC-normalized but pyarrow
    reads it tz-naive, and the Arrow row serializer used to crash on
    naive values (tz_convert on a tz-naive Timestamp). Timestamps now
    round-trip through the snapshot_table source exactly."""
    register(spark)
    path = str(tmp_path / "ts_tbl")
    snapshot_write(
        spark.range(0, 5).select(
            F.col("id"),
            F.timestamp_millis(
                F.lit(1_700_000_000_000) + F.col("id") * 1000
            ).alias("ts"),
        ),
        path,
    )
    out = str(tmp_path / "ts_out")
    _drain(spark, path, out, str(tmp_path / "ts_ck"))
    got = spark.read.parquet(out)
    assert got.count() == 5
    ms = sorted(
        r.m
        for r in got.select(
            F.unix_millis("ts").alias("m")
        ).collect()
    )
    assert ms == [1_700_000_000_000 + i * 1000 for i in range(5)]
