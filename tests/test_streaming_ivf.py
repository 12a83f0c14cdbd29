"""Streaming IVF index maintenance (streaming/pipeline.ivf_index_sink):
the thin (vec_id, cell) map appended per micro-batch must equal the
batch-built assignment over the same vectors, probes through the
stream-built map must equal a fresh ivf_ann with the same centroids,
and replayed batches (multi-batch rewinds included) must skip.
"""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.similarity import (
    assign_cells,
    ivf_ann,
    train_ivf_centroids_local,
)
from monasca_aggregator_spark.sources.table_log import (
    snapshot_read,
    snapshot_versions,
)
from monasca_aggregator_spark.sources.tables import load_table
from monasca_aggregator_spark.streaming.pipeline import ivf_index_sink

_DIM = 64


def _centroids(spark, sf_small, path):
    emb = load_table(spark, sf_small, "embeddings")
    cents = train_ivf_centroids_local(emb, n_centroids=8, n_iter=2)
    cents.write.mode("overwrite").parquet(path)
    return emb


def test_stream_built_index_equals_batch_assignment(
    spark, sf_small, tmp_path
):
    cent_path = str(tmp_path / "cents")
    index_path = str(tmp_path / "ivf_idx")
    emb = _centroids(spark, sf_small, cent_path)

    # stream the corpus in as jsonl micro-batches (3 files)
    src = tmp_path / "embs"
    src.mkdir()
    rows = [
        (r.vec_id, [float(x) for x in r.embedding])
        for r in emb.select("vec_id", "embedding").collect()
    ]
    third = (len(rows) + 2) // 3
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        (src / f"b{i}.jsonl").write_text(
            "\n".join(
                json.dumps({"vec_id": vid, "embedding": v})
                for vid, v in chunk
            )
        )
    stream = (
        spark.readStream.schema("vec_id long, embedding array<double>")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    q = (
        stream.writeStream.foreachBatch(
            ivf_index_sink(index_path, cent_path)
        )
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    assert len(snapshot_versions(index_path)) >= 2
    streamed = {
        (r.vec_id, r.cell)
        for r in snapshot_read(spark, index_path).collect()
    }
    cents = spark.read.parquet(cent_path)
    batch = {
        (r.vec_id, r.cell)
        for r in assign_cells(emb, cents).select("vec_id", "cell").collect()
    }
    assert streamed == batch

    # probe parity: searching through the stream-built map equals a
    # fresh ivf_ann with the same centroids
    queries = emb.filter(F.col("vec_id") < 5)
    via_stream = {
        tuple(r)
        for r in ivf_ann(
            emb,
            queries,
            k=5,
            centroids=cents,
            cell_map=snapshot_read(spark, index_path),
            dim=_DIM,
        ).collect()
    }
    fresh = {
        tuple(r)
        for r in ivf_ann(
            emb, queries, k=5, centroids=cents, dim=_DIM
        ).collect()
    }
    assert via_stream == fresh


def test_ivf_sink_replay_and_rewind_skip(spark, sf_small, tmp_path):
    cent_path = str(tmp_path / "cents")
    index_path = str(tmp_path / "ivf_idx_rw")
    emb = _centroids(spark, sf_small, cent_path)
    b1 = emb.filter(F.col("vec_id") % 2 == 0)
    b2 = emb.filter(F.col("vec_id") % 2 == 1)
    sink = ivf_index_sink(index_path, cent_path)
    sink(b1, 0)
    sink(b2, 1)
    versions = snapshot_versions(index_path)
    n = snapshot_read(spark, index_path).count()
    sink(b1, 0)  # two-batch rewind: both replays no-op
    sink(b2, 1)
    assert snapshot_versions(index_path) == versions
    assert snapshot_read(spark, index_path).count() == n
