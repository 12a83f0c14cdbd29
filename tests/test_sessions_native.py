"""Native F.session_window sessionization: exact-gap boundary
semantics vs the islands formulation, and batch ≡ streaming."""

from __future__ import annotations

import datetime as dt
import time as _time

import pytest
from pyspark.sql import functions as F

from monasca_aggregator_spark.plans import temporal

UTC = dt.timezone.utc
GAP_H = 12


def _events(spark, rows):
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    data = [
        (i, base + dt.timedelta(hours=h), uid, "e", float(v), "{}")
        for i, (h, uid, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )


def test_exact_gap_merges_in_both_formulations(spark, monkeypatch):
    # Spark's session_window is INCLUSIVE at the gap boundary: an
    # event exactly 12 h after its predecessor MERGES (window is
    # [ts, ts+gap]), matching the islands rule diff <= gap. An event
    # one ms past the gap splits in both.
    df = _events(spark, [(0, 1, 1.0), (GAP_H, 1, 2.0)])
    monkeypatch.setattr(
        temporal, "load_table", lambda spark, sf_dir, name: df
    )
    native = temporal.q_sessions_native(spark, "x").collect()
    islands = temporal.q_sessions_user(spark, "x").collect()
    assert len(native) == len(islands) == 1
    assert native[0]["session_end_ms"] == islands[0]["session_end_ms"]
    # 1 ms past the gap -> two sessions in both formulations
    df2 = _events(
        spark, [(0, 1, 1.0), (GAP_H + 1 / 3600000.0, 1, 2.0)]
    )
    monkeypatch.setattr(
        temporal, "load_table", lambda spark, sf_dir, name: df2
    )
    assert len(temporal.q_sessions_native(spark, "x").collect()) == 2
    assert len(temporal.q_sessions_user(spark, "x").collect()) == 2


def test_session_window_streaming_equals_batch(spark, tmp_path):
    # the reason sessions_native exists: the SAME aggregation runs
    # under Structured Streaming. Feed two files, compare the final
    # sessions to the batch result over the union.
    src = tmp_path / "sn_src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows1 = [
        (i, base + dt.timedelta(hours=i % 5), i % 3, float(i))
        for i in range(30)
    ]
    rows2 = [
        (i, base + dt.timedelta(hours=40 + i % 5), i % 3, float(i))
        for i in range(30, 60)
    ]
    for rows in (rows1, rows2):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "value double"
        ).coalesce(1).write.mode("append").parquet(str(src))
        _time.sleep(1.1)

    batch_src = spark.read.parquet(str(src))

    def sessions(df):
        return (
            df.groupBy(
                "user_id", F.session_window("ts", "12 hours")
            )
            .agg(
                F.count(F.lit(1)).alias("n_events"),
                F.sum("value").alias("value_sum"),
            )
            .select(
                "user_id",
                F.unix_millis(F.col("session_window.start")).alias(
                    "s_ms"
                ),
                F.unix_millis(F.col("session_window.end")).alias(
                    "e_ms"
                ),
                "n_events",
                "value_sum",
            )
        )

    stream = (
        spark.readStream.schema(batch_src.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "0 seconds")
    )
    q = (
        sessions(stream)
        .writeStream.format("memory")
        .queryName("sn_stream_out")
        .outputMode("complete")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sn_ckpt"))
        .start()
    )
    q.awaitTermination()

    want = {
        (r["user_id"], r["s_ms"], r["e_ms"], r["n_events"],
         r["value_sum"])
        for r in sessions(batch_src).collect()
    }
    got = {
        (r["user_id"], r["s_ms"], r["e_ms"], r["n_events"],
         r["value_sum"])
        for r in spark.table("sn_stream_out").collect()
    }
    assert got == want


def test_session_window_append_mode_finalizes_past_watermark(
    spark, tmp_path
):
    # append mode only emits a session once the watermark passes its
    # close — the production output mode (complete mode re-emits the
    # world). Two files: early sessions, then a much-later event that
    # advances the watermark far enough to finalize them.
    src = tmp_path / "sa_src"
    src.mkdir()
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    early = [
        (i, base + dt.timedelta(minutes=i), 1, float(i))
        for i in range(5)
    ]
    late = [(99, base + dt.timedelta(days=10), 1, 1.0)]
    for rows in (early, late):
        spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "value double"
        ).coalesce(1).write.mode("append").parquet(str(src))
        _time.sleep(1.1)

    stream = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
        .withWatermark("ts", "1 hour")
    )
    q = (
        stream.groupBy(
            "user_id", F.session_window("ts", "12 hours")
        )
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_millis(F.col("session_window.start")).alias("s_ms"),
            "n_events",
        )
        .writeStream.format("memory")
        .queryName("sa_stream_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "sa_ckpt"))
        .start()
    )
    q.awaitTermination()
    out = spark.table("sa_stream_out").collect()
    # the early 5-event session is finalized by the day-10 watermark;
    # the day-10 session itself is still open (never emitted)
    assert [(r["n_events"]) for r in out] == [5]
    assert out[0]["s_ms"] == int(base.timestamp() * 1000)
