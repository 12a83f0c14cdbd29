"""Streaming KMV distinct: state ≡ batch sketch, estimate exact below
cap, replay-safe (idempotent merge)."""

from __future__ import annotations

import time as _time

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.kmv import kmv_agg
from monasca_aggregator_spark.streaming.pipeline import (
    streaming_kmv_distinct,
)


def test_streaming_kmv_state_equals_batch_sketch(spark, tmp_path):
    src = tmp_path / "kmv_src"
    src.mkdir()
    rows1 = [(i % 97, "click" if i % 2 else "view") for i in range(400)]
    # batch 2 replays some members and adds new ones — idempotent merge
    rows2 = [
        (i % 211, "click" if i % 2 else "view") for i in range(300, 900)
    ]
    for rows in (rows1, rows2):
        spark.createDataFrame(
            rows, "user_id long, event_type string"
        ).coalesce(1).write.mode("append").parquet(str(src))
        _time.sleep(1.1)

    raw = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    q = (
        streaming_kmv_distinct(raw, k=64)
        .writeStream.format("memory")
        .queryName("kmv_stream_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "kmv_ckpt"))
        .start()
    )
    q.awaitTermination()

    batch = spark.read.parquet(str(src))
    want = {
        r["event_type"]: (r["sk"], r["n"])
        for r in batch.groupBy("event_type")
        .agg(
            kmv_agg(F.col("user_id"), 64).alias("sk"),
            F.countDistinct("user_id").alias("n"),
        )
        .collect()
    }
    out = spark.table("kmv_stream_out").collect()
    # update mode: one emission per key per micro-batch; keep the last
    last = {}
    for r in out:
        last[r["event_type"]] = r
    assert set(last) == set(want)
    for etype, r in last.items():
        want_sk, want_n = want[etype]
        assert r["sk"] == want_sk  # state ≡ batch sketch, element-wise
        if len(want_sk) < 64:  # exact mode: estimate == true distinct
            assert r["n_distinct"] == float(want_n)
        else:  # saturated: within the standard error band
            assert abs(r["n_distinct"] - want_n) / want_n < 4 / 63**0.5
