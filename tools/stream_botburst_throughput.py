"""streaming_bot_burst END-TO-END throughput (r11, VERDICT r10 stretch
#8): rate-micro-batch event generation → watermarked 1-minute tumbling
window per user → burst filter → noop sink, measured like the main
stream_throughput tool. Prints one JSON line {events, alerts, wall_s,
busy_s, ev_per_s_wall, ev_per_s_busy, state_rows_max}.

Synthetic mix: 100k users; every 100th user is a scripted client
emitting ~7.5 events/min (bursts — above the ≥5/min rule), the rest
emit 2/min (never alert). Event time is derived deterministically from
the rate source's value, so alert counts are reproducible for a fixed
(rows_per_batch, n_batches).

``state_rows_max`` is the max streaming-state row count across
micro-batches — the bounded-state claim (state = users active per
open minute, watermark-expired) made measurable.

Usage: python tools/stream_botburst_throughput.py [rows_per_batch] [n_batches]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))

_N_USERS = 100_000


def main() -> None:
    rows_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import functions as F

    from monasca_aggregator_spark.session import get_spark
    from monasca_aggregator_spark.streaming.pipeline import (
        streaming_bot_burst,
    )

    spark = get_spark("botburst-throughput")
    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(rows_per_batch))
        .option("numPartitions", "32")
        .load()
    )
    user = (F.col("value") % _N_USERS).alias("user_id")
    seq = (F.col("value") / _N_USERS).cast("long")
    # bursty every-100th user: ~7.5 events/min; the rest: 2/min
    ts_ms = (
        F.when((F.col("value") % _N_USERS) % 100 == 0, seq * 8_000)
        .otherwise(seq * 30_000 + (F.col("value") % _N_USERS) % 29_000)
        + 60_000  # keep event time off the epoch watermark boundary
    )
    events = rate.select(
        user, F.timestamp_millis(ts_ms).alias("ts")
    )
    alerts = streaming_bot_burst(events)

    t0 = time.time()
    q = (
        alerts.writeStream.format("noop")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        done = 0
        while done < n_batches:
            time.sleep(0.2)
            rp = q.recentProgress
            done = sum(1 for r in rp if r["numInputRows"] > 0)
        wall = time.time() - t0
        rp = q.recentProgress
        n_rows = sum(r["numInputRows"] for r in rp)
        n_alerts = sum(
            int(r["sink"].get("numOutputRows", 0) or 0)
            for r in rp
            if r["numInputRows"]
        )
        busy = (
            sum(
                r["durationMs"]["triggerExecution"]
                for r in rp
                if r["numInputRows"]
            )
            / 1000.0
        )
        state_max = max(
            (
                op.get("numRowsTotal", 0)
                for r in rp
                for op in r.get("stateOperators", [])
            ),
            default=0,
        )
    finally:
        q.stop()
        q.awaitTermination()
    out = {
        "events": n_rows,
        "alerts": n_alerts,
        "wall_s": round(wall, 1),
        "busy_s": round(busy, 1),
        "ev_per_s_wall": int(n_rows / wall),
        "ev_per_s_busy": int(n_rows / busy) if busy else None,
        "state_rows_max": state_max,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
