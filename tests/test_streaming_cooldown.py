"""Streaming alert cooldown ≡ batch incident grouping over a replay,
including idempotence under re-delivered windows."""

from __future__ import annotations

import time as _time

from pyspark.sql import Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.streaming.pipeline import (
    streaming_alert_cooldown,
)

H = 3600 * 1000
COOL = 3 * H


def _batch_incidents(spark, rows):
    """Reference: the same gaps-and-islands the batch query uses."""
    df = spark.createDataFrame(rows, "event_type string, window_ts_ms long")
    ordw = Window.partitionBy("event_type").orderBy("window_ts_ms")
    runw = ordw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    marked = df.withColumn(
        "is_new",
        F.when(
            F.lag("window_ts_ms").over(ordw).isNull()
            | (
                F.col("window_ts_ms")
                - F.lag("window_ts_ms").over(ordw)
                > COOL
            ),
            1,
        ).otherwise(0),
    ).withColumn("incident_id", F.sum("is_new").over(runw))
    return {
        (r["event_type"], r["incident_id"], r["incident_start_ms"],
         r["incident_end_ms"], r["n_breach_windows"])
        for r in marked.groupBy("event_type", "incident_id")
        .agg(
            F.min("window_ts_ms").alias("incident_start_ms"),
            F.max("window_ts_ms").alias("incident_end_ms"),
            F.count(F.lit(1)).alias("n_breach_windows"),
        )
        .collect()
    }


def test_streaming_cooldown_equals_batch(spark, tmp_path):
    base = 1_700_000_000_000 // H * H
    # metric m: breaches at hours 0,1,4 (one incident: gaps <= 3h),
    # then 10,11 (second incident). metric x: single breach at 2.
    win = lambda h: base + h * H  # noqa: E731
    b1 = [("m", win(0)), ("m", win(1)), ("x", win(2))]
    # file 2 REPLAYS (m, win(1)) and adds the rest — replay must not
    # split or double-count incidents
    b2 = [("m", win(1)), ("m", win(4)), ("m", win(10)), ("m", win(11))]
    src = tmp_path / "cd_src"
    src.mkdir()
    for rows in (b1, b2):
        spark.createDataFrame(
            rows, "event_type string, window_ts_ms long"
        ).coalesce(1).write.mode("append").parquet(str(src))
        _time.sleep(1.1)

    raw = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_alert_cooldown(raw, cooldown_ms=COOL)
        .writeStream.format("memory")
        .queryName("cd_stream_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "cd_ckpt"))
        .start()
    )
    q.awaitTermination()

    # update mode re-emits touched incidents; keep the LAST emission
    # per (key, incident)
    final = {}
    for r in spark.table("cd_stream_out").collect():
        final[(r["event_type"], r["incident_id"])] = (
            r["event_type"],
            r["incident_id"],
            r["incident_start_ms"],
            r["incident_end_ms"],
            r["n_breach_windows"],
        )
    got = set(final.values())
    want = _batch_incidents(spark, b1 + [r for r in b2 if r not in b1])
    assert got == want
    # sanity: exactly 3 incidents (2 for m, 1 for x)
    assert len(got) == 3
