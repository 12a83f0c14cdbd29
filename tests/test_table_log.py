"""Log-structured snapshot table: append/overwrite lineage, time
travel, concurrency conflict, and vacuum retention."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from monasca_aggregator_spark.sources.table_log import (
    snapshot_expire,
    snapshot_history,
    snapshot_read,
    snapshot_versions,
    snapshot_write,
)


def _df(spark, lo, hi, tag):
    return spark.range(lo, hi).select(
        F.col("id"), F.lit(tag).alias("batch")
    )


def test_append_overwrite_and_time_travel(spark, tmp_path):
    path = str(tmp_path / "tbl")
    r1 = snapshot_write(_df(spark, 0, 100, "a"), path)
    r2 = snapshot_write(_df(spark, 100, 150, "b"), path, mode="append")
    r3 = snapshot_write(_df(spark, 0, 10, "c"), path, mode="overwrite")
    assert [r["version"] for r in (r1, r2, r3)] == [1, 2, 3]
    assert snapshot_versions(path) == [1, 2, 3]
    # time travel: every version reads exactly its committed state
    assert snapshot_read(spark, path, version=1).count() == 100
    v2 = snapshot_read(spark, path, version=2)
    assert v2.count() == 150
    assert v2.groupBy("batch").count().orderBy("batch").collect()[0][1] == 100
    assert snapshot_read(spark, path).count() == 10  # latest = overwrite
    hist = snapshot_history(path)
    assert [h["op"] for h in hist] == ["append", "append", "overwrite"]
    assert hist[2]["parent"] == 2
    # a reader planned from v2's file list is unaffected by v3
    assert sorted(r.id for r in v2.filter("batch = 'b'").collect()) == list(
        range(100, 150)
    )


def test_commit_conflict_raises(spark, tmp_path, monkeypatch):
    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 10, "a"), path)
    # true race: a second writer lands version 2 AFTER this writer has
    # read the log (both saw parent=1) — patch the listing to the
    # stale view, then plant the winner's commit
    import json
    import os

    from monasca_aggregator_spark.sources import table_log

    fake = {
        "version": 2,
        "op": "append",
        "parent": 1,
        "files": table_log._read_commit(path, 1)["files"],
        "n_new_files": 0,
    }
    with open(table_log._version_file(path, 2), "w") as f:
        json.dump(fake, f)
    monkeypatch.setattr(
        table_log, "snapshot_versions", lambda p: [1]
    )
    with pytest.raises(RuntimeError, match="concurrent commit"):
        table_log.snapshot_write(
            _df(spark, 10, 20, "b"), path, mode="append"
        )
    monkeypatch.undo()
    # the loser's data dir is unreferenced, not corrupting: the
    # winner's committed state reads fine
    assert snapshot_read(spark, path).count() == 10
    assert os.path.exists(table_log._version_file(path, 2))
    # and the WINNER's commit record is byte-identical — os.rename
    # would have silently replaced it (loser wins, winner's files
    # dropped); the os.link exclusive-create publish cannot
    assert table_log._read_commit(path, 2) == fake
    # the loser's tmp file is cleaned up either way
    assert not [
        f
        for f in os.listdir(table_log._log_dir(path))
        if f.startswith(".tmp-")
    ]


def test_expire_keeps_time_travel_window_and_deletes_dead_files(
    spark, tmp_path
):
    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 50, "a"), path)                # v1
    snapshot_write(_df(spark, 50, 60, "b"), path, mode="append")  # v2
    snapshot_write(_df(spark, 0, 5, "c"), path, mode="overwrite")  # v3
    snapshot_write(_df(spark, 5, 9, "d"), path, mode="append")     # v4
    res = snapshot_expire(path, keep_last=2)
    assert res["removed_versions"] == [1, 2]
    assert snapshot_versions(path) == [3, 4]
    # v1/v2's files (batches a, b) are dead after the overwrite → gone
    assert res["removed_files"] > 0
    with pytest.raises(ValueError, match="expired|not in table"):
        snapshot_read(spark, path, version=1)
    # surviving versions still read perfectly
    assert snapshot_read(spark, path, version=3).count() == 5
    assert snapshot_read(spark, path, version=4).count() == 9
    # expiring everything but the tip still reads
    snapshot_expire(path, keep_last=1)
    assert snapshot_read(spark, path).count() == 9


def test_snapshot_sink_versions_each_microbatch(spark, tmp_path):
    """Streaming into the snapshot table: one version per micro-batch,
    time-travel to any batch boundary, replayed batch ids skipped."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.loadgen_source import register
    from monasca_aggregator_spark.sources.table_log import snapshot_sink

    register(spark)
    path = str(tmp_path / "stream_tbl")
    stream = (
        spark.readStream.format("metric_envelopes")
        .option("partitions", "1")
        .option("rows_per_batch", "10")
        .load()
    )
    sink = snapshot_sink(path)
    q = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    import time as _time

    deadline = _time.time() + 60
    try:
        while _time.time() < deadline:
            if len(snapshot_versions(path)) >= 3:
                break
            _time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    versions = snapshot_versions(path)
    assert len(versions) >= 3
    # each version is a strictly growing append; version k holds the
    # first k committed micro-batches
    hist = snapshot_history(path)
    counts = [
        snapshot_read(spark, path, version=v).count() for v in versions
    ]
    assert counts == sorted(counts) and counts[0] > 0
    assert all(h.get("batch_id") is not None for h in hist)
    # replaying the SAME batch id is a no-op
    df = snapshot_read(spark, path)
    n_before = len(versions)
    sink(df.limit(1), hist[-1]["batch_id"])
    assert len(snapshot_versions(path)) == n_before
    # a new batch id commits
    sink(df.limit(1), hist[-1]["batch_id"] + 1)
    assert len(snapshot_versions(path)) == n_before + 1


def test_snapshot_schema_evolution_across_commits(spark, tmp_path):
    """An append commit may carry a new column (Iceberg/Delta
    add-column semantics): merge_schema=True reads the union schema
    with the old files' missing column as NULL; the default read of a
    PRE-evolution version is untouched (no merge cost, old schema)."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.table_log import (
        snapshot_read,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 10, "a"), path)
    evolved = _df(spark, 10, 15, "b").withColumn("quality", F.lit(0.9))
    snapshot_write(evolved, path, mode="append")

    merged = snapshot_read(spark, path, merge_schema=True)
    assert "quality" in merged.columns
    assert merged.count() == 15
    assert merged.filter(F.col("quality").isNull()).count() == 10
    # time travel to v1 needs no merge and shows the old schema
    v1 = snapshot_read(spark, path, version=1)
    assert "quality" not in v1.columns and v1.count() == 10


def test_snapshot_changes_feed_per_commit(spark, tmp_path):
    """CDF across appends and an overwrite: each commit's inserts and
    deletes are attributed to its own version, an overwrite deletes
    the prior live set, and the feed of an empty range is an empty
    frame with the feed schema."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_changes,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 2, "a"), path)  # v1: ids 0,1
    snapshot_write(_df(spark, 2, 3, "a"), path)  # v2: +id 2
    snapshot_write(_df(spark, 9, 10, "b"), path, mode="overwrite")  # v3

    step = snapshot_changes(spark, path, start_version=1, end_version=2)
    rows = {(r.id, r._change_type, r._commit_version)
            for r in step.collect()}
    assert rows == {(2, "insert", 2)}

    full = snapshot_changes(spark, path, start_version=1)
    rows = {(r.id, r._change_type, r._commit_version)
            for r in full.collect()}
    assert rows == {
        (2, "insert", 2),
        (9, "insert", 3),
        (0, "delete", 3),
        (1, "delete", 3),
        (2, "delete", 3),
    }

    empty = snapshot_changes(spark, path, start_version=3, end_version=3)
    assert empty.count() == 0
    assert {"_change_type", "_commit_version"} <= set(empty.columns)


def test_snapshot_changes_sees_schema_evolution(spark, tmp_path):
    """A CDF range spanning an add-column commit unions by name: rows
    from pre-evolution files carry NULL in the new column."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.table_log import (
        snapshot_changes,
        snapshot_write,
    )

    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 2, "a"), path)  # v1
    snapshot_write(_df(spark, 2, 4, "a"), path)  # v2 (old schema)
    evolved = _df(spark, 4, 5, "b").withColumn("quality", F.lit(0.9))
    snapshot_write(evolved, path, mode="append")  # v3 (new column)

    feed = snapshot_changes(spark, path, start_version=1)
    assert "quality" in feed.columns
    got = {(r.id, r.quality) for r in feed.collect()}
    assert got == {(2, None), (3, None), (4, 0.9)}


def test_cdf_incrementally_maintains_a_rollup(spark, tmp_path):
    """The CDF's advertised use, proven end to end: a downstream
    per-key rollup maintained ONLY from snapshot_changes (inserts add,
    deletes subtract, zero-count keys drop) equals recomputing the
    rollup from the latest snapshot — across an append AND a
    corrective overwrite. The incremental consumer never reads the
    full table."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.table_log import (
        snapshot_changes,
        snapshot_read,
        snapshot_write,
    )

    def ev(rows):
        return spark.createDataFrame(rows, "user long, v long")

    path = str(tmp_path / "tbl")
    snapshot_write(ev([(1, 10), (1, 5), (2, 7)]), path)  # v1
    snapshot_write(ev([(2, 3), (3, 1)]), path)  # v2 append
    # v3: correction — user 1's rows re-stated, user 3 removed
    snapshot_write(ev([(1, 4), (2, 7), (2, 3)]), path, mode="overwrite")

    def rollup(df):
        return df.groupBy("user").agg(
            F.count(F.lit(1)).alias("n"), F.sum("v").alias("s")
        )

    # downstream state as of v1, then fold the v1→v3 feed into it
    state = rollup(snapshot_read(spark, path, version=1))
    feed = snapshot_changes(spark, path, start_version=1)
    sign = F.when(F.col("_change_type") == "insert", 1).otherwise(-1)
    delta = feed.groupBy("user").agg(
        F.sum(sign).alias("dn"), F.sum(sign * F.col("v")).alias("ds")
    )
    merged = (
        state.join(delta, "user", "full_outer")
        .select(
            "user",
            (F.coalesce("n", F.lit(0)) + F.coalesce("dn", F.lit(0))).alias(
                "n"
            ),
            (F.coalesce("s", F.lit(0)) + F.coalesce("ds", F.lit(0))).alias(
                "s"
            ),
        )
        .filter(F.col("n") > 0)
    )
    expect = {
        (r.user, r.n, r.s)
        for r in rollup(snapshot_read(spark, path)).collect()
    }
    got = {(r.user, r.n, r.s) for r in merged.collect()}
    assert got == expect == {(1, 1, 4), (2, 2, 10)}


def test_snapshot_merge_sink_upserts_latest_per_key(spark, tmp_path):
    """Streaming MERGE-upsert sink (r8): the snapshot table holds
    exactly one latest row per key after each micro-batch, keeps time
    travel to every batch boundary, dedups within a batch by
    order_col, and skips replayed batch ids (multi-batch rewinds
    included)."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_merge_sink,
    )

    path = str(tmp_path / "dim_tbl")
    sink = snapshot_merge_sink(path, ["k"], "seq")
    schema = "k string, v string, seq long"

    b0 = spark.createDataFrame(
        # within-batch dup of key a: seq 2 must win
        [("a", "a0", 1), ("a", "a1", 2), ("b", "b0", 1)], schema
    )
    b1 = spark.createDataFrame(
        [("b", "b1", 3), ("c", "c0", 1)], schema
    )
    sink(b0, 0)
    sink(b1, 1)

    latest = {
        r.k: r.v
        for r in snapshot_read(spark, path).select("k", "v").collect()
    }
    assert latest == {"a": "a1", "b": "b1", "c": "c0"}
    # time travel: version 0 is the pre-merge state of batch 0
    v0 = snapshot_versions(path)[0]
    asof0 = {
        r.k: r.v
        for r in snapshot_read(spark, path, version=v0)
        .select("k", "v")
        .collect()
    }
    assert asof0 == {"a": "a1", "b": "b0"}
    # replays (including a two-batch rewind) are no-ops
    versions = snapshot_versions(path)
    sink(b0, 0)
    sink(b1, 1)
    assert snapshot_versions(path) == versions
    assert {
        r.k: r.v
        for r in snapshot_read(spark, path).select("k", "v").collect()
    } == latest


def test_partition_evolution_across_commits(spark, tmp_path):
    """Iceberg-style partition-spec evolution (r8): commits may each
    pick a different hive layout (or none); reads union the layouts
    transparently with each group's partition columns restored under
    its own basePath, old data never rewritten; time travel sees each
    version's own layout mix; unpartitioned-only tables keep the
    single-reader fast path."""
    from monasca_aggregator_spark.sources.table_log import snapshot_write

    path = str(tmp_path / "evo_tbl")
    a = spark.createDataFrame(
        [(1, "d1", "s1", 10), (2, "d2", "s1", 20)],
        "id long, day string, source string, v long",
    )
    b = spark.createDataFrame(
        [(3, "d2", "s2", 30)],
        "id long, day string, source string, v long",
    )
    c = spark.createDataFrame(
        [(4, "d3", "s2", 40)],
        "id long, day string, source string, v long",
    )
    snapshot_write(a, path, partition_by=["day"])
    snapshot_write(b, path, partition_by=["source"])
    snapshot_write(c, path)  # layout evolves back to unpartitioned

    latest = snapshot_read(spark, path)
    rows = {r.id: (r.day, r.source, r.v) for r in latest.collect()}
    assert rows == {
        1: ("d1", "s1", 10),
        2: ("d2", "s1", 20),
        3: ("d2", "s2", 30),
        4: ("d3", "s2", 40),
    }
    # time travel to v1: only layout A
    v1 = snapshot_versions(path)[0]
    assert {
        r.id for r in snapshot_read(spark, path, version=v1).collect()
    } == {1, 2}
    # partition pruning still works on a layout's own column: the day
    # filter prunes commit A's directories (plan shows the pushdown)
    pruned = latest.filter(latest.day == "d1")
    assert {r.id for r in pruned.collect()} == {1}


def test_commit_log_stats_prune_file_listing(spark, tmp_path):
    """Manifest-level data skipping (r8): snapshot_write(stats_cols=)
    records per-file min/max in the commit log; snapshot_read(prune=)
    drops provably-non-overlapping files BEFORE listing — fewer input
    files, identical rows after the real predicate; files without
    stats are always kept (pruning is an optimization, not a
    filter)."""
    from monasca_aggregator_spark.sources.table_log import snapshot_write

    path = str(tmp_path / "stats_tbl")
    for lo in (0, 100, 200, 300):
        df = spark.range(lo, lo + 100).select(
            F.col("id").alias("k"), (F.col("id") * 2).alias("v")
        )
        snapshot_write(
            df.coalesce(1), path, stats_cols=["k"]
        )
    full = snapshot_read(spark, path)
    assert len(full.inputFiles()) == 4

    pruned = snapshot_read(spark, path, prune={"k": (150, 160)})
    assert len(pruned.inputFiles()) == 1
    got = {r.k for r in pruned.filter("k BETWEEN 150 AND 160").collect()}
    assert got == set(range(150, 161))
    # equivalence: pruned + predicate == full + predicate
    assert got == {
        r.k for r in full.filter("k BETWEEN 150 AND 160").collect()
    }
    # a predicate outside every file: empty result, schema intact
    empty = snapshot_read(spark, path, prune={"k": (1000, 2000)})
    assert empty.count() == 0
    assert set(empty.columns) == {"k", "v"}
    # a commit WITHOUT stats is never pruned away
    extra = spark.range(5000, 5010).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snapshot_write(extra.coalesce(1), path)  # no stats_cols
    pruned2 = snapshot_read(spark, path, prune={"k": (150, 160)})
    assert len(pruned2.inputFiles()) == 2  # the hit file + statless


def test_snapshot_compact_then_expire(spark, tmp_path):
    """Compaction (r8): many tiny per-commit files rewrite to ONE
    overwrite commit with identical rows; time travel to pre-compact
    versions still works; expire afterwards reclaims the superseded
    files while the compacted version keeps serving; recorded stats
    survive so manifest pruning still applies."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_compact,
        snapshot_expire,
        snapshot_write,
    )

    path = str(tmp_path / "cmp_tbl")
    for lo in range(0, 50, 10):
        snapshot_write(
            spark.range(lo, lo + 10).select(F.col("id").alias("k")).coalesce(1),
            path,
        )
    before = snapshot_read(spark, path)
    assert len(before.inputFiles()) == 5

    rec = snapshot_compact(spark, path, shards=1, stats_cols=["k"])
    assert rec["compacted_from"] == 5
    after = snapshot_read(spark, path)
    assert len(after.inputFiles()) == 1
    assert {r.k for r in after.collect()} == set(range(50))
    # time travel to a pre-compact version still works
    assert snapshot_read(spark, path, version=2).count() == 20

    # expire history: superseded tiny files are reclaimed, the
    # compacted version keeps serving, stats-based pruning holds
    removed = snapshot_expire(path, keep_last=1)
    assert removed["removed_files"] >= 5
    assert {r.k for r in snapshot_read(spark, path).collect()} == set(
        range(50)
    )
    pruned = snapshot_read(spark, path, prune={"k": (100, 200)})
    assert pruned.count() == 0


def test_snapshot_delete_rewrites_only_touched_files(spark, tmp_path):
    """Copy-on-write DELETE: only files containing matching rows are
    rewritten; untouched files carry into the new version BY
    REFERENCE (same physical paths, stats preserved); time travel
    still sees the deleted rows; a no-match predicate commits
    nothing."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_delete,
    )

    path = str(tmp_path / "tbl")
    # two appends → two disjoint file sets with recorded stats
    snapshot_write(
        _df(spark, 0, 100, "a"), path, shards=1, stats_cols=("id",)
    )
    snapshot_write(
        _df(spark, 100, 200, "b"),
        path,
        mode="append",
        shards=1,
        stats_cols=("id",),
    )
    before = snapshot_read(spark, path).count()
    assert before == 200

    rec = snapshot_delete(spark, path, "id >= 190", stats_cols=("id",))
    assert rec["op"] == "delete"
    assert rec["n_deleted"] == 10
    assert rec["n_rewritten_files"] == 1  # only commit 2's file
    after = snapshot_read(spark, path)
    assert after.count() == 190
    assert after.filter("id >= 190").count() == 0
    # the v1 file survives untouched, by the same physical path
    v1_files = set(snapshot_history(path)[0]["files"])
    assert v1_files <= set(rec["files"])
    # time travel: the pre-delete version still has the rows
    assert snapshot_read(spark, path, version=2).count() == 200
    # stats carried/re-recorded → manifest pruning still works:
    # id<=50 provably misses every rewritten file
    pruned = snapshot_read(spark, path, prune={"id": (0, 50)})
    assert pruned.count() == 100  # only the v1 file listed
    # no-match delete: no new commit
    v_before = snapshot_versions(path)[-1]
    rec2 = snapshot_delete(spark, path, "id < 0")
    assert rec2["n_deleted"] == 0
    assert snapshot_versions(path)[-1] == v_before


def test_snapshot_delete_null_predicate_keeps_row(spark, tmp_path):
    """SQL DELETE semantics: rows where the predicate evaluates NULL
    survive (only TRUE deletes)."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_delete,
    )

    path = str(tmp_path / "tbl")
    df = spark.createDataFrame(
        [(1, 5), (2, None), (3, 50)], "id int, x int"
    )
    snapshot_write(df, path, shards=1)
    rec = snapshot_delete(spark, path, "x > 10")
    assert rec["n_deleted"] == 1
    got = sorted(
        r["id"] for r in snapshot_read(spark, path).collect()
    )
    assert got == [1, 2]  # NULL x survives


def test_snapshot_delete_respects_partition_layouts(spark, tmp_path):
    """Partition evolution + delete: a predicate over the hive
    partition column rewrites only the touched layout's files and
    keeps each group's own basePath semantics readable."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_delete,
    )

    path = str(tmp_path / "tbl")
    d1 = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(10)],
        "id int, part string",
    )
    snapshot_write(d1, path, partition_by=("part",))
    d2 = spark.createDataFrame(
        [(100 + i, "z") for i in range(5)], "id int, part string"
    )
    snapshot_write(d2, path, mode="append")  # unpartitioned commit
    rec = snapshot_delete(spark, path, "part = 'x'")
    assert rec["n_deleted"] == 5
    out = snapshot_read(spark, path)
    assert out.count() == 10
    assert out.filter("part = 'x'").count() == 0
    assert out.filter("part = 'z'").count() == 5


def test_snapshot_compact_zorder_clusters_files(spark, tmp_path):
    """cluster_by compaction: each rewritten file covers a compact
    hyper-rectangle of (a, b) space, so a predicate on EITHER column
    prunes files via the re-recorded commit-log stats — the
    lexicographic-sort counterexample (trailing column never prunes)
    is the thing Z-order fixes."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_compact,
    )

    path = str(tmp_path / "tbl")
    grid = spark.createDataFrame(
        [(a, b) for a in range(64) for b in range(64)],
        "a int, b int",
    )
    snapshot_write(grid, path, shards=4)
    rec = snapshot_compact(
        spark,
        path,
        shards=16,
        stats_cols=("a", "b"),
        cluster_by=("a", "b"),
        cluster_bits=6,
    )
    assert rec["clustered_by"] == ["a", "b"]
    n_files = len(rec["files"])
    assert n_files > 4
    # band predicates on EACH dimension must prune a real fraction of
    # the files at the manifest level
    stats = rec["file_groups"][-1]["stats"]
    for col, lo, hi in (("a", 0, 7), ("b", 0, 7)):
        kept = [
            f
            for f, st in stats.items()
            if st[col] is None
            or (st[col][0] <= hi and st[col][1] >= lo)
        ]
        assert len(kept) < n_files, f"no manifest pruning on {col}"
    # and the pruned read still returns exactly the right rows
    out = snapshot_read(spark, path, prune={"a": (0, 7)}).filter(
        "a <= 7"
    )
    assert out.count() == 8 * 64


def test_snapshot_tags_pin_versions_against_expiry(spark, tmp_path):
    """The reproducibility loop: tag the version a training run read,
    commit more, expire aggressively — the tagged version AND its
    data files survive and read back exactly; drop the tag and the
    next expire reclaims it. Tags are immutable (exclusive create)."""
    import pytest

    from monasca_aggregator_spark.sources.table_log import (
        snapshot_expire,
        snapshot_tag,
        snapshot_tags,
        snapshot_untag,
    )

    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 100, "a"), path, shards=1)
    snapshot_tag(path, "run-x")  # pins v1
    for i in range(4):
        snapshot_write(
            _df(spark, 100 * (i + 2), 100 * (i + 3), "b"),
            path,
            mode="overwrite",
            shards=1,
        )
    assert snapshot_tags(path) == {"run-x": 1}
    # immutable: re-tagging the same name raises
    with pytest.raises(RuntimeError, match="immutable"):
        snapshot_tag(path, "run-x", version=3)
    r = snapshot_expire(path, keep_last=2)
    assert 1 not in r["removed_versions"]  # pinned survives
    assert 1 in r["kept_versions"]
    got = snapshot_read(spark, path, tag="run-x")
    assert got.count() == 100
    assert got.filter("batch = 'a'").count() == 100
    # read by tag + version together is an error; unknown tag too
    with pytest.raises(ValueError, match="not both"):
        snapshot_read(spark, path, tag="run-x", version=1)
    with pytest.raises(ValueError, match="not found"):
        snapshot_read(spark, path, tag="nope")
    # drop the pin → next expire reclaims version 1 and its files
    snapshot_untag(path, "run-x")
    v1_files = set(snapshot_history(path)[0]["files"])
    r2 = snapshot_expire(path, keep_last=2)
    assert 1 in r2["removed_versions"]
    import os

    assert not any(os.path.exists(f) for f in v1_files)


def test_snapshot_delete_then_expire_vacuums_nested_dirs(
    spark, tmp_path
):
    """ADVICE r8 (high): delete commits nest rewritten files under
    data/<commit>/g{i}/, and the expire prune used to treat such a
    commit dir as empty (no TOP-LEVEL parquet) and os.remove the
    subdirectory — IsADirectoryError, breaking the documented
    delete→expire vacuum workflow. Live parquet must be detected
    recursively and dead commit dirs removed whole."""
    import os

    from monasca_aggregator_spark.sources.table_log import (
        snapshot_delete,
    )

    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 100, "a"), path, shards=1)     # v1
    snapshot_delete(spark, path, "id >= 90")                     # v2
    snapshot_write(_df(spark, 0, 5, "c"), path, mode="overwrite")  # v3
    # v2's rewrite lives under data/<commit>/g0/ — the nested layout
    res = snapshot_expire(path, keep_last=1)
    assert res["removed_versions"] == [1, 2]
    assert snapshot_read(spark, path).count() == 5
    # every dead commit dir is gone; only v3's dir survives
    from monasca_aggregator_spark.sources import table_log

    ddir = table_log._data_dir(path)
    assert len(os.listdir(ddir)) == 1
    # hive-partitioned commit dirs prune the same way
    path2 = str(tmp_path / "tbl2")
    d = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(10)],
        "id int, part string",
    )
    snapshot_write(d, path2, partition_by=("part",))               # v1
    snapshot_write(_df(spark, 0, 3, "z"), path2, mode="overwrite")  # v2
    res2 = snapshot_expire(path2, keep_last=1)
    assert res2["removed_versions"] == [1]
    assert len(os.listdir(table_log._data_dir(path2))) == 1
    assert snapshot_read(spark, path2).count() == 3


def test_snapshot_delete_all_rows_keeps_table_readable(
    spark, tmp_path
):
    """ADVICE r8: a predicate deleting EVERY row is a legal DELETE;
    the empty version must stay readable (empty relation with the
    recorded schema) and appendable."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_delete,
    )

    path = str(tmp_path / "tbl")
    # partitioned layout: partitionBy of an empty survivor relation
    # emits NO files, so the delete commit's file list is truly empty
    d = spark.createDataFrame(
        [(i, "x" if i % 2 else "y") for i in range(20)],
        "id int, part string",
    )
    snapshot_write(d, path, partition_by=("part",))
    rec = snapshot_delete(spark, path, "id >= 0")
    assert rec["n_deleted"] == 20
    assert rec["files"] == []
    out = snapshot_read(spark, path)
    assert out.count() == 0
    assert set(out.columns) == {"id", "part"}
    # time travel still sees the pre-delete rows
    assert snapshot_read(spark, path, version=1).count() == 20
    # the table keeps working: append on top of the empty version
    d2 = spark.createDataFrame([(100, "z")], "id int, part string")
    snapshot_write(d2, path, mode="append")
    assert snapshot_read(spark, path).count() == 1


def test_snapshot_delete_matches_percent_encoded_paths(
    spark, tmp_path
):
    """ADVICE r8 (medium): input_file_name() returns percent-encoded
    URIs; a hive partition VALUE with a space produces file paths the
    old 'strip file:' normalization never matched, so rows matching
    the DELETE predicate silently survived as 'untouched'."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_delete,
    )

    path = str(tmp_path / "tbl")
    d = spark.createDataFrame(
        [(1, "a b"), (2, "a b"), (3, "c")], "id int, part string"
    )
    snapshot_write(d, path, partition_by=("part",))
    rec = snapshot_delete(spark, path, "part = 'a b'")
    assert rec["n_deleted"] == 2
    out = snapshot_read(spark, path)
    assert out.count() == 1
    assert out.filter("part = 'a b'").count() == 0


def test_snapshot_update_rewrites_only_touched_rows(spark, tmp_path):
    """Row-level UPDATE (r9, the DML sibling of snapshot_delete):
    only files containing matching rows are rewritten; untouched
    files carry by reference; untouched ROWS in rewritten files keep
    their values; assignments read the PRE-update row (a swap works);
    time travel sees pre-update values; NULL predicate rows are
    unchanged; unknown SET targets fail loudly."""
    import pytest as _pytest

    from monasca_aggregator_spark.sources.table_log import (
        snapshot_update,
    )

    path = str(tmp_path / "tbl")
    snapshot_write(
        _df(spark, 0, 100, "a"), path, shards=1, stats_cols=("id",)
    )
    snapshot_write(
        _df(spark, 100, 200, "b"), path, mode="append", shards=1,
        stats_cols=("id",),
    )
    rec = snapshot_update(
        spark, path, {"batch": "'hot'"}, "id >= 190",
        stats_cols=("id",),
    )
    assert rec["op"] == "update"
    assert rec["n_updated"] == 10
    assert rec["n_rewritten_files"] == 1  # only commit 2's file
    out = snapshot_read(spark, path)
    assert out.count() == 200  # UPDATE never changes row count
    assert out.filter("batch = 'hot'").count() == 10
    assert out.filter("id = 150 AND batch = 'b'").count() == 1
    # v1's file carries by the same physical path
    v1_files = set(snapshot_history(path)[0]["files"])
    assert v1_files <= set(rec["files"])
    # time travel: pre-update version unchanged
    assert (
        snapshot_read(spark, path, version=2)
        .filter("batch = 'hot'").count() == 0
    )
    # swap semantics: both assignments read the pre-update row
    path2 = str(tmp_path / "tbl2")
    d = spark.createDataFrame([(1, 10, 20), (2, 3, 4)], "id int, a int, b int")
    snapshot_write(d, path2, shards=1)
    snapshot_update(spark, path2, {"a": "b", "b": "a"}, "id = 1")
    got = {r.id: (r.a, r.b) for r in snapshot_read(spark, path2).collect()}
    assert got[1] == (20, 10) and got[2] == (3, 4)
    # NULL predicate -> unchanged; no-match -> no new commit
    path3 = str(tmp_path / "tbl3")
    d3 = spark.createDataFrame([(1, 5), (2, None)], "id int, x int")
    snapshot_write(d3, path3, shards=1)
    rec3 = snapshot_update(spark, path3, {"id": "id + 100"}, "x > 1")
    assert rec3["n_updated"] == 1
    assert {r.id for r in snapshot_read(spark, path3).collect()} == {101, 2}
    v_before = snapshot_versions(path3)[-1]
    assert snapshot_update(spark, path3, {"id": "0"}, "x < 0")["n_updated"] == 0
    assert snapshot_versions(path3)[-1] == v_before
    with _pytest.raises(ValueError, match="SET targets"):
        snapshot_update(spark, path3, {"nope": "1"}, "x > 1")


def test_snapshot_restore_repoints_without_copy(spark, tmp_path):
    """RESTORE (r9): a new commit re-references a prior version's
    files by reference (n_new_files=0, same physical paths); the bad
    commits stay readable history; restore-to-tip is a no-op; expire
    after restore keeps exactly the referenced files alive."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_delete,
        snapshot_restore,
    )

    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 100, "a"), path, shards=1)      # v1
    snapshot_delete(spark, path, "id >= 50")                     # v2
    snapshot_write(_df(spark, 0, 1, "c"), path, mode="overwrite")  # v3
    rec = snapshot_restore(path, 1)                              # v4
    assert rec["version"] == 4 and rec["op"] == "restore"
    assert rec["restored_from"] == 1 and rec["n_new_files"] == 0
    assert set(rec["files"]) == set(snapshot_history(path)[0]["files"])
    assert snapshot_read(spark, path).count() == 100
    # the bad states stay in history
    assert snapshot_read(spark, path, version=2).count() == 50
    assert snapshot_read(spark, path, version=3).count() == 1
    # restore-to-tip: no new commit
    tip = snapshot_versions(path)[-1]
    assert snapshot_restore(path, tip)["version"] == tip
    assert snapshot_versions(path)[-1] == tip
    # vacuum: v1's files survive (referenced by the restore tip)
    snapshot_expire(path, keep_last=1)
    assert snapshot_read(spark, path).count() == 100
    import pytest as _pytest

    with _pytest.raises(ValueError, match="not in table"):
        snapshot_restore(path, 2)  # expired


def test_snapshot_orphans_finds_unreferenced_files(spark, tmp_path):
    """Orphan detection (r9): a conflict-losing writer's data dir is
    never referenced by the commit log; snapshot_orphans reports it
    and remove=True reclaims it without touching live files."""
    import os

    from monasca_aggregator_spark.sources import table_log
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_orphans,
    )

    path = str(tmp_path / "tbl")
    snapshot_write(_df(spark, 0, 10, "a"), path, shards=1)
    assert snapshot_orphans(path)["n_orphans"] == 0
    # plant a loser's dir: data written, commit never published
    loser = os.path.join(table_log._data_dir(path), "deadbeef0000")
    _df(spark, 50, 60, "x").write.parquet(loser)
    rep = snapshot_orphans(path)
    assert rep["n_orphans"] >= 1 and rep["bytes"] > 0
    assert all("deadbeef0000" in p for p in rep["orphans"])
    rep2 = snapshot_orphans(path, remove=True)
    assert rep2["removed"] and rep2["n_orphans"] == rep["n_orphans"]
    assert not os.path.exists(loser)
    assert snapshot_orphans(path)["n_orphans"] == 0
    assert snapshot_read(spark, path).count() == 10


def test_snapshot_clone_is_zero_copy_and_independent(spark, tmp_path):
    """Shallow clone (r9): the clone's first commit references the
    source's files by reference; appends diverge into the clone's
    own storage; expiring the CLONE never deletes source files (the
    ownership rule), and the source keeps reading."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_clone,
        snapshot_delete,
    )

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    snapshot_write(_df(spark, 0, 50, "a"), src, shards=1)
    snapshot_write(_df(spark, 50, 60, "b"), src, mode="append", shards=1)
    rec = snapshot_clone(src, dst)
    assert rec["op"] == "clone" and rec["n_new_files"] == 0
    assert snapshot_read(spark, dst).count() == 60
    # divergence: clone evolves, source untouched
    snapshot_write(_df(spark, 100, 105, "c"), dst, mode="append")
    snapshot_delete(spark, dst, "id < 10")
    assert snapshot_read(spark, dst).count() == 55
    assert snapshot_read(spark, src).count() == 60
    # vacuum the clone down to its tip: source files survive
    snapshot_expire(dst, keep_last=1)
    assert snapshot_read(spark, dst).count() == 55
    assert snapshot_read(spark, src).count() == 60
    assert snapshot_read(spark, src, version=1).count() == 50
    # clone of a PAST version; existing-table guard
    import pytest as _pytest

    dst2 = str(tmp_path / "dst2")
    snapshot_clone(src, dst2, version=1)
    assert snapshot_read(spark, dst2).count() == 50
    with _pytest.raises(FileExistsError):
        snapshot_clone(src, dst2)


def test_snapshot_sink_auto_compacts(spark, tmp_path):
    """auto_compact_every=N (r9): after every N stream commits the
    sink rewrites the table as one compact version, so the tip's
    file count stays bounded while time travel and totals hold."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_sink,
    )

    path = str(tmp_path / "tbl")
    sink = snapshot_sink(path, auto_compact_every=3)
    for b in range(7):
        sink(_df(spark, b * 10, b * 10 + 10, f"b{b}"), b)
    hist = snapshot_history(path)
    n_compact = sum(1 for h in hist if "compacted_from" in h)
    assert n_compact == 2  # after commits 3 and 6 (post-compact count resets)
    tip = hist[-1]
    assert snapshot_read(spark, path).count() == 70
    # the tip (or the last compaction) holds few files, not 7+
    last_compact = [h for h in hist if "compacted_from" in h][-1]
    assert len(last_compact["files"]) == 1
    # replayed batch id: still skipped, no extra commits
    n_before = len(snapshot_versions(path))
    sink(_df(spark, 0, 1, "replay"), 3)
    assert len(snapshot_versions(path)) == n_before


def test_snapshot_bloom_point_lookup_skips_files(spark, tmp_path):
    """Bloom-filter data skipping (r10): snapshot_write(bloom_cols=)
    records a per-file Bloom filter; snapshot_read(point=) drops
    files whose filter PROVES the key absent — the skipping min/max
    can't do when every file spans the whole key range. Same contract
    as prune: never a filter, rows identical after the real
    predicate; commits without filters are always kept."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_read,
        snapshot_write,
    )

    path = str(tmp_path / "bloom_tbl")
    # 4 files of INTERLEAVED keys (id % 4 == shard): min/max spans
    # the full range in every file, so stats pruning can never skip
    for shard in range(4):
        df = (
            spark.range(0, 400)
            .filter(F.col("id") % 4 == shard)
            .select(F.col("id").alias("k"), (F.col("id") * 2).alias("v"))
        )
        snapshot_write(df.coalesce(1), path, bloom_cols=["k"])
    full = snapshot_read(spark, path)
    assert len(full.inputFiles()) == 4

    # key 157 lives only in shard 1's file: bloom keeps exactly the
    # file(s) that might contain it — at 10 bits/value the other 3
    # files prune with ~1% fpp each, so ≤ 2 files survive
    looked = snapshot_read(spark, path, point={"k": 157})
    assert 1 <= len(looked.inputFiles()) <= 2
    got = [r.v for r in looked.filter("k = 157").collect()]
    assert got == [314]
    # equivalence with the unpruned read
    assert got == [r.v for r in full.filter("k = 157").collect()]

    # an absent key may prune every file: empty result, schema intact
    missing = snapshot_read(spark, path, point={"k": 99999})
    assert missing.filter("k = 99999").count() == 0
    assert set(missing.columns) == {"k", "v"}

    # a commit WITHOUT bloom_cols is never skipped
    extra = spark.range(10_000, 10_001).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snapshot_write(extra.coalesce(1), path)
    again = snapshot_read(spark, path, point={"k": 157})
    got2 = [r.v for r in again.filter("k = 157").collect()]
    assert got2 == [314]
    # the no-bloom file is in the scan even though 157 isn't in it
    assert len(again.inputFiles()) >= 2


def test_bloom_canon_numeric_types_coincide():
    """ADVICE r10 (medium): a DOUBLE column written as 5.0 must still
    match a point lookup written as Python int 5 — str() alone hashed
    '5' vs '5.0' and WRONGLY pruned the file holding the value,
    breaking the 'pruning is never a filter' contract. All integral
    numerics (int / float / Decimal) canonicalize to one form."""
    import decimal

    from monasca_aggregator_spark.sources.table_log import (
        _bloom_build,
        _bloom_canon,
        _bloom_might_contain,
    )

    # the reproduced bug: float-written filter probed with an int
    bloom = _bloom_build([5.0, 6.0, 7.5])
    assert _bloom_might_contain(bloom, 5)
    assert _bloom_might_contain(bloom, 7.5)
    # and the reverse: int-written filter probed with a float/Decimal
    bloom_i = _bloom_build([5, 6, 7])
    assert _bloom_might_contain(bloom_i, 5.0)
    assert _bloom_might_contain(bloom_i, decimal.Decimal("6.00"))
    # canonical forms, directly
    assert _bloom_canon(5) == _bloom_canon(5.0) == _bloom_canon(
        decimal.Decimal("5.0")
    )
    assert _bloom_canon(7.25) == _bloom_canon(decimal.Decimal("7.250"))
    # bool stays textual (True must not collide with int 1's form)
    assert _bloom_canon(True) == b"True"
    # inf/nan fall through without raising
    assert _bloom_canon(float("inf")) == b"inf"


def test_snapshot_bloom_double_column_int_lookup(spark, tmp_path):
    """End-to-end pin of the ADVICE r10 bloom bug: point-lookup with
    an int against a DOUBLE column must keep the file containing the
    value (5 vs 5.0 canonicalize identically)."""
    from monasca_aggregator_spark.sources.table_log import (
        snapshot_read,
        snapshot_write,
    )

    path = str(tmp_path / "bloom_dbl")
    for shard in range(2):
        df = (
            spark.range(0, 100)
            .filter(F.col("id") % 2 == shard)
            .select(
                F.col("id").cast("double").alias("k"),
                (F.col("id") * 2).alias("v"),
            )
        )
        snapshot_write(df.coalesce(1), path, bloom_cols=["k"])
    looked = snapshot_read(spark, path, point={"k": 57})
    got = [r.v for r in looked.filter("k = 57").collect()]
    assert got == [114]


def test_snapshot_metadata_stats_counts_without_data_scan(
    spark, tmp_path
):
    """snapshot_metadata_stats (r11, the Iceberg files-metadata-table
    pattern): COUNT(*) and per-file stats answered from the commit
    log + footers alone — sum(n_rows) equals the real count at every
    version/tag, and commits that predate row-count recording fall
    back to footer reads (pinned by stripping row_counts from a
    commit record)."""
    import json

    from monasca_aggregator_spark.sources.table_log import (
        snapshot_metadata_stats,
        snapshot_read,
        snapshot_tag,
        snapshot_write,
    )

    path = str(tmp_path / "meta_tbl")
    df1 = spark.range(0, 100).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snapshot_write(df1.repartition(3), path, stats_cols=["k"])
    snapshot_tag(path, "first")
    df2 = spark.range(100, 150).select(
        F.col("id").alias("k"), (F.col("id") * 2).alias("v")
    )
    snapshot_write(df2.coalesce(1), path)

    meta = snapshot_metadata_stats(spark, path)
    got = meta.agg(F.sum("n_rows")).collect()[0][0]
    assert got == 150 == snapshot_read(spark, path).count()
    # per-file rows: one per data file, counts positive
    assert meta.count() == len(snapshot_read(spark, path).inputFiles())
    assert meta.filter("n_rows <= 0").count() == 0
    # v1 stats recorded k min/max as JSON
    v1 = snapshot_metadata_stats(spark, path, version=1)
    assert v1.agg(F.sum("n_rows")).collect()[0][0] == 100
    st = json.loads(v1.filter("stats IS NOT NULL").first().stats)
    assert "k" in st and st["k"][0] >= 0
    # tag resolution
    assert (
        snapshot_metadata_stats(spark, path, tag="first")
        .agg(F.sum("n_rows"))
        .collect()[0][0]
        == 100
    )

    # pre-upgrade fallback: strip row_counts from the latest commit
    log_dir = tmp_path / "meta_tbl" / "_log"
    latest = sorted(log_dir.glob("v*.json"))[-1]
    rec = json.loads(latest.read_text())
    for g in rec["file_groups"]:
        g.pop("row_counts", None)
    latest.write_text(json.dumps(rec))
    again = snapshot_metadata_stats(spark, path)
    assert again.agg(F.sum("n_rows")).collect()[0][0] == 150
