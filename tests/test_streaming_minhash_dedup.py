"""Live cross-snapshot NEAR-dedup sink
(streaming/pipeline.minhash_dedup_sink): near-dups of already-ingested
docs drop at ingest time, batch-internal near-dup pairs collapse to
their lowest-id survivor, the docs snapshot stays near-dedup-clean at
every version boundary, and replays skip."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.sources.table_log import (
    snapshot_read,
    snapshot_versions,
)
from monasca_aggregator_spark.streaming.pipeline import minhash_dedup_sink

_SCHEMA = "doc_id long, text string"

_B1 = [
    (1, "the quick brown fox jumps over the lazy dog near the river bank"),
    (3, "completely different subject matter about spark structured streaming state"),
    (4, "metrics aggregation windows publish after the configured lag deadline passes"),
]
_B2 = [
    # near-dup of doc 1 (already ingested) -> dropped by the index probe
    (2, "the quick brown fox jumps over the lazy dog near the river side"),
    # near-dup of doc 4 -> dropped
    (5, "metrics aggregation windows publish after the configured lag deadline elapses"),
    # fresh -> kept
    (6, "a third unrelated document mentioning parquet snapshots and commit logs"),
]
_B3 = [
    # internal near-dup pair, unrelated to the corpus: keep 7, drop 8
    (7, "entirely novel sentences describing adaptive query execution and shuffle plans"),
    (8, "entirely novel sentences describing adaptive query execution and shuffle graphs"),
]


def test_near_dups_drop_at_ingest(spark, tmp_path):
    index_path = str(tmp_path / "nd_index")
    docs_path = str(tmp_path / "nd_docs")
    sink = minhash_dedup_sink(index_path, docs_path)

    sink(spark.createDataFrame(_B1, _SCHEMA), 0)
    sink(spark.createDataFrame(_B2, _SCHEMA), 1)
    sink(spark.createDataFrame(_B3, _SCHEMA), 2)

    kept = {
        r.doc_id for r in snapshot_read(spark, docs_path).collect()
    }
    assert kept == {1, 3, 4, 6, 7}
    # the index only carries survivors
    idx_ids = {
        r.doc_id for r in snapshot_read(spark, index_path).collect()
    }
    assert idx_ids == kept
    # every version boundary is a clean training view
    assert len(snapshot_versions(docs_path)) == 3

    # replays (incl. a two-batch rewind) are no-ops on both tables
    vi = snapshot_versions(index_path)
    vd = snapshot_versions(docs_path)
    sink(spark.createDataFrame(_B2, _SCHEMA), 1)
    sink(spark.createDataFrame(_B3, _SCHEMA), 2)
    assert snapshot_versions(index_path) == vi
    assert snapshot_versions(docs_path) == vd
    assert {
        r.doc_id for r in snapshot_read(spark, docs_path).collect()
    } == kept


def test_fully_dropped_batch_still_commits(spark, tmp_path):
    """A batch whose every doc is a near-dup still commits (the
    batch_id marker is what makes its replay skip) and the table
    keeps reading cleanly across the survivor-less version."""
    index_path = str(tmp_path / "nd2_index")
    docs_path = str(tmp_path / "nd2_docs")
    sink = minhash_dedup_sink(index_path, docs_path)
    sink(spark.createDataFrame(_B1, _SCHEMA), 0)
    dup_only = [
        (2, "the quick brown fox jumps over the lazy dog near the river side"),
    ]
    sink(spark.createDataFrame(dup_only, _SCHEMA), 1)
    kept = {r.doc_id for r in snapshot_read(spark, docs_path).collect()}
    assert kept == {1, 3, 4}
    assert len(snapshot_versions(docs_path)) == 2
    # replay of the survivor-less batch skips on the marker
    v = snapshot_versions(docs_path)
    sink(spark.createDataFrame(dup_only, _SCHEMA), 1)
    assert snapshot_versions(docs_path) == v


def test_dedup_sink_through_checkpointed_stream(spark, tmp_path):
    """The sink under a REAL checkpointed file stream: first run
    ingests two micro-batches (maxFilesPerTrigger=1), a restarted
    query with the same checkpoint consumes only the file added
    in-between, and cross-batch near-dups drop across the restart
    boundary — exactly-once end to end, not just in direct calls."""
    import json as _json

    index_path = str(tmp_path / "ck_index")
    docs_path = str(tmp_path / "ck_docs")
    src = tmp_path / "src"
    src.mkdir()

    def write_file(name, rows):
        (src / name).write_text(
            "\n".join(
                _json.dumps({"doc_id": i, "text": t}) for i, t in rows
            )
        )

    write_file("a.jsonl", _B1[:2])   # docs 1, 3
    write_file("b.jsonl", _B1[2:])   # doc 4

    def run():
        stream = (
            spark.readStream.schema(_SCHEMA)
            .option("maxFilesPerTrigger", "1")
            .json(str(src))
        )
        q = (
            stream.writeStream.foreachBatch(
                minhash_dedup_sink(index_path, docs_path)
            )
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    assert {
        r.doc_id for r in snapshot_read(spark, docs_path).collect()
    } == {1, 3, 4}
    n_versions = len(snapshot_versions(docs_path))

    # restart with new files: a near-dup of doc 1 (drop) + fresh doc 6
    write_file("c.jsonl", [_B2[0], _B2[2]])
    run()
    assert {
        r.doc_id for r in snapshot_read(spark, docs_path).collect()
    } == {1, 3, 4, 6}
    # the restarted query consumed ONLY the new file: exactly one
    # more docs version, and re-running with nothing new adds none
    assert len(snapshot_versions(docs_path)) == n_versions + 1
    run()
    assert len(snapshot_versions(docs_path)) == n_versions + 1


def test_hot_bucket_cap_bounds_probe_fanout(spark, tmp_path):
    """The incremental probe's hot-bucket cap (r8, measured-regression
    fix): a degenerate stored corpus (100 copies of one text share
    EVERY band bucket) explodes candidates uncapped; with the cap the
    hot buckets are dropped before the join — bounded fan-out, zero
    false pairs — while a normal near-dup (size-1 buckets) still
    pairs under the same cap."""
    from monasca_aggregator_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs_incremental,
    )

    dup_text = (
        "the same boilerplate header repeated across the whole corpus "
        "making every band bucket one hundred documents hot"
    )
    corpus = spark.createDataFrame(
        [(i, dup_text) for i in range(100)]
        + [(200, "a genuinely unique document about parquet manifests")],
        _SCHEMA,
    )
    index = minhash_index(corpus)
    probe = spark.createDataFrame(
        [
            (300, dup_text),  # hits only hot buckets
            (301, "a genuinely unique document about parquet manifolds"),
        ],
        _SCHEMA,
    )
    uncapped = minhash_lsh_pairs_incremental(probe, index, corpus)
    assert (
        uncapped.filter(F.col("id_new") == 300).count() == 100
    )  # the explosion
    capped = minhash_lsh_pairs_incremental(
        probe, index, corpus, max_bucket_size=16
    )
    rows = {(r.id_new, r.id_indexed) for r in capped.collect()}
    # hot-bucket candidates gone; the selective near-dup still pairs
    assert not any(a == 300 for a, _ in rows)
    assert (301, 200) in rows
