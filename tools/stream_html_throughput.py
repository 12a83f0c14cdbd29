"""Streaming HTML-ingestion throughput: the first-stage cost of a
web-corpus pipeline measured END TO END as a continuous stream —
HTML → main-content extraction → normalized-content fingerprint dedup
(watermark-bounded state) → quality gate → noop sink, i.e. exactly
``streaming.pipeline.curate_document_stream`` (SURVEY §2 rows 93c/45a).
Prints one JSON line {docs, kept, wall_s, busy_s, docs_per_s_*}.

The document stream is synthesized JVM-SIDE from the built-in
``rate-micro-batch`` source (no Python generator in the loop, so the
measured number is the extraction+dedup+quality path, not generation):
every row becomes a realistic boilerplate-wrapped HTML page whose main
content varies by row value; ~1 in 7 rows repeats a previous page's
content so the fingerprint dedup state actually drops re-crawls, and
every 13th page is all-chrome so extraction exercises its quarantine
drop.

Usage: python tools/stream_html_throughput.py [rows_per_batch] [n_batches]

``rows_per_batch`` here is the TOTAL per micro-batch (the
rate-micro-batch contract — NOT per-partition like
stream_throughput.py's Python DataSource); defaults 200000 x 15 =
3M documents.

Stage isolation (measured r8, same synthesis, 1M docs each): page
generation + extraction + quality gate alone stream at ~62K docs/s;
adding ``dropDuplicatesWithinWatermark`` lands the full path at
~13-14K docs/s — the dedup state exchange (full rows with text
payloads shuffling to the state partitions) dominates, not the
extraction. HDFS-backed vs RocksDB state store measured within noise
at this state size (~29K keys/batch); RocksDB is configured anyway
because its state cost is incremental while the default provider
re-snapshots the whole map per batch — the posture that matters at
real watermark sizes.
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def main() -> None:
    rows_per_batch = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    from pyspark.sql import functions as F

    from monasca_aggregator_spark.session import get_spark
    from monasca_aggregator_spark.streaming.pipeline import (
        curate_document_stream,
    )

    spark = get_spark("stream-html-throughput")
    # RocksDB state store for the dedup state: the default HDFS-backed
    # provider snapshots the full state map into the checkpoint every
    # micro-batch, which dominates wall time once fingerprint state
    # accumulates; RocksDB (bundled with Spark 4) makes state cost
    # incremental. Runtime SQL conf — applies to queries started after.
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state."
        "RocksDBStateStoreProvider",
    )

    rate = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", str(rows_per_batch))
        .option("numPartitions", "32")
        # 1 h of event time per micro-batch: the 10-minute dedup
        # watermark passes each batch's rows by the NEXT batch, so
        # append-mode emissions flush and `kept` counts honestly
        # (with a small advance the curated rows sit in state until
        # the watermark reaches them and the sink reports ~0)
        .option("advanceMillisPerBatch", "3600000")
        .load()
    )
    # JVM-side page synthesis: paragraph words keyed by a content id
    # (value folded to 1/7 duplication), nav/footer chrome around it,
    # every 13th page all-chrome (extraction must quarantine it).
    content_id = (F.col("value") - F.col("value") % 7).cast("long")
    # the content id rides INSIDE the long paragraph — a short
    # standalone "<p>page N</p>" block is (correctly) classified as
    # chrome by the extractor's min-length rule and the distinction
    # would vanish before the fingerprint
    para = F.concat(
        F.lit("<p>article ident"),
        content_id.cast("string"),
        F.lit(" opens here. "),
        F.repeat(
            F.concat(
                F.lit("token"),
                (content_id % 997).cast("string"),
                F.lit(" plain words carry the trainable content here. "),
            ),
            12,
        ),
        F.lit("</p>"),
    )
    page = F.concat(
        F.lit(
            "<html><head><title>t</title></head><body>"
            '<nav><a href="/">Home</a> <a href="/a">About</a> '
            '<a href="/c">Contact</a></nav><div class="sidebar">'
            '<a href="/x">x</a> <a href="/y">y</a></div>'
        ),
        F.when(F.col("value") % 13 == 0, F.lit("")).otherwise(para),
        F.lit('<div class="footer">&copy; corp</div></body></html>'),
    )
    docs = rate.select(
        F.col("value").alias("doc_id"),
        page.alias("text"),
        F.col("timestamp").alias("ingest_ts"),
    )
    curated = curate_document_stream(docs, dedup_within="10 minutes")

    t0 = time.time()
    q = (
        curated.writeStream.format("noop")
        .outputMode("append")
        .trigger(processingTime="0 seconds")
        .start()
    )
    try:
        done = 0
        while done < n_batches:
            time.sleep(0.2)
            done = sum(1 for r in q.recentProgress if r["numInputRows"] > 0)
        wall = time.time() - t0
        rp = q.recentProgress
        n_rows = sum(r["numInputRows"] for r in rp)
        kept = sum(
            r["sink"]["numOutputRows"]
            for r in rp
            if r["numInputRows"] and r["sink"]["numOutputRows"] >= 0
        )
        busy = sum(
            r["durationMs"]["triggerExecution"]
            for r in rp
            if r["numInputRows"]
        ) / 1000.0
    finally:
        q.stop()
        q.awaitTermination()
    out = {
        "docs": n_rows,
        "kept": kept,
        "wall_s": round(wall, 1),
        "busy_s": round(busy, 1),
        "docs_per_s_wall": int(n_rows / wall),
        "docs_per_s_busy": int(n_rows / busy) if busy else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
