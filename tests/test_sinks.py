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
    # PROVE the pruning physically: the predicate must land in the
    # scan's PartitionFilters (directory-level skip — at 100 TB this
    # is the difference between reading one partition and all of them)
    plan = pruned._sc._jvm.PythonSQLUtils.explainString(
        pruned._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan
    pf = next(
        ln for ln in plan.splitlines() if "PartitionFilters" in ln
    )
    assert "lang" in pf and pf.strip() != "PartitionFilters: []"
    # and the executed scan reads ONLY the matching directory's files
    pruned.collect()
    n_part_files = len(list((out / f"lang={one}").glob("*.parquet")))
    scan_line = next(
        ln for ln in plan.splitlines() if "number of files" in ln
    ) if "number of files" in plan else None
    if scan_line:  # metric present in formatted explain on this build
        assert int(scan_line.split()[-1]) <= n_part_files


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


def test_range_sorted_write_yields_disjoint_file_ranges(
    spark, sf_small, tmp_path
):
    from monasca_aggregator_spark.sources.sinks import write_range_sorted

    docs = load_table(spark, sf_small, "documents").repartition(8)
    out = tmp_path / "range_sorted"
    write_range_sorted(docs, str(out), ["doc_id"], n_shards=4)

    ranges = []
    for f in _parquet_files(out):
        stats = (
            spark.read.parquet(str(f))
            .agg(F.min("doc_id"), F.max("doc_id"), F.count(F.lit(1)))
            .collect()[0]
        )
        if stats[2]:
            ranges.append((stats[0], stats[1]))
    ranges.sort()
    assert len(ranges) > 1
    for (lo1, hi1), (lo2, hi2) in zip(ranges, ranges[1:]):
        assert hi1 < lo2, "file key ranges must be disjoint and ordered"

    back = spark.read.parquet(str(out))
    assert back.count() == docs.count()


def test_zorder_value_interleaves_bits(spark):
    from monasca_aggregator_spark.sources.sinks import zorder_value

    df = spark.createDataFrame(
        [(3, 0), (0, 3), (2, 1)], "x long, y long"
    )
    out = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", zorder_value(["x", "y"], bits=2).alias("z")
        ).collect()
    }
    # bit i of x → position 2i; bit i of y → position 2i+1
    assert out[(3, 0)] == 0b0101
    assert out[(0, 3)] == 0b1010
    assert out[(2, 1)] == 0b0110


def test_zordered_write_keeps_both_columns_tight(spark, tmp_path):
    """Each z-ordered file covers a compact square of the 2-D key
    space, so per-file min/max spans stay small on BOTH columns — a
    lexicographic sort would leave the second column's span at full
    width in every file."""
    import itertools

    from monasca_aggregator_spark.sources.sinks import write_zordered

    rows = [(x, y) for x, y in itertools.product(range(64), range(64))]
    df = spark.createDataFrame(rows, "x long, y long").repartition(16)
    out = tmp_path / "zordered"
    write_zordered(df, str(out), ["x", "y"], bits=6, n_shards=16)

    spans = []
    for f in _parquet_files(out):
        s = (
            spark.read.parquet(str(f))
            .agg(F.min("x"), F.max("x"), F.min("y"), F.max("y"),
                 F.count(F.lit(1)))
            .collect()[0]
        )
        if s[4]:
            spans.append((s[1] - s[0], s[3] - s[2]))
    assert len(spans) >= 8
    # average span per file ≪ full width (63) on BOTH dimensions
    avg_x = sum(s[0] for s in spans) / len(spans)
    avg_y = sum(s[1] for s in spans) / len(spans)
    assert avg_x <= 32 and avg_y <= 32


def test_merge_upsert_updates_inserts_and_leaves_other_partitions(
    spark, tmp_path
):
    from monasca_aggregator_spark.sources.sinks import merge_upsert

    base = spark.createDataFrame(
        [(1, "a", 10.0), (2, "a", 20.0), (3, "b", 30.0), (4, "c", 40.0)],
        "k long, p string, v double",
    )
    path = str(tmp_path / "ds")
    base.write.partitionBy("p").parquet(path)
    untouched_before = {
        f.name: f.stat().st_mtime_ns
        for f in (tmp_path / "ds" / "p=c").rglob("*.parquet")
    }

    updates = spark.createDataFrame(
        [(2, "a", 21.0), (9, "a", 90.0), (3, "b", 31.0)],
        "k long, p string, v double",
    )
    merge_upsert(spark, path, updates, ["k"], "p")

    got = {
        (r.k, r.p): r.v for r in spark.read.parquet(path).collect()
    }
    assert got == {
        (1, "a"): 10.0,   # untouched row in a touched partition
        (2, "a"): 21.0,   # updated
        (9, "a"): 90.0,   # inserted
        (3, "b"): 31.0,   # updated
        (4, "c"): 40.0,   # untouched partition
    }
    untouched_after = {
        f.name: f.stat().st_mtime_ns
        for f in (tmp_path / "ds" / "p=c").rglob("*.parquet")
    }
    assert untouched_after == untouched_before  # p=c never rewritten


def test_compact_dataset_reduces_files_and_preserves_rows(
    spark, tmp_path
):
    from monasca_aggregator_spark.sources.sinks import compact_dataset

    path = str(tmp_path / "tiny")
    df = spark.range(0, 500).withColumn("v", F.col("id") * 2)
    df.repartition(25).write.parquet(path)
    assert len(_parquet_files(tmp_path / "tiny")) >= 25

    n_files = compact_dataset(spark, path, target_rows_per_file=1000)
    assert n_files == 1
    assert len(_parquet_files(tmp_path / "tiny")) == 1
    got = sorted((r.id, r.v) for r in spark.read.parquet(path).collect())
    assert got == [(i, 2 * i) for i in range(500)]


def test_write_audit_publish_gates_bad_data(spark, tmp_path):
    """WAP: a passing audit publishes atomically; a failing audit on
    the NEXT write leaves the previously published data untouched and
    cleans up its staging dir — readers never see the bad drop."""
    import os

    import pytest
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.sinks import write_audit_publish

    good = spark.range(100).select(
        F.col("id"), (F.col("id") % 5).alias("k")
    )
    path = str(tmp_path / "wap_ds")

    def no_nulls(df):
        n = df.filter(F.col("k").isNull()).count()
        return n == 0, f"{n} null keys"

    def min_rows(df):
        n = df.count()
        return n >= 50, f"{n} rows"

    manifest = write_audit_publish(
        good, spark, path, [no_nulls, min_rows]
    )
    assert manifest["published"] and manifest["n_rows"] == 100
    assert spark.read.parquet(path).count() == 100

    bad = spark.range(10).select(
        F.col("id"), F.lit(None).cast("long").alias("k")
    )
    with pytest.raises(ValueError, match="WAP audit failed"):
        write_audit_publish(bad, spark, path, [no_nulls, min_rows])
    # previous publish intact, no stray staging/old dirs
    assert spark.read.parquet(path).count() == 100
    leftovers = [
        d for d in os.listdir(tmp_path) if "__wap_" in d or "__old_" in d
    ]
    assert leftovers == []


def test_load_evolving_merges_schemas_and_backfills(spark, tmp_path):
    """Batch 1 lacks the `lang` column added in batch 2: the merged
    read surfaces it everywhere, defaults back-fill the old rows, and
    plain aggregation over the union just works."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.tables import load_evolving

    p = str(tmp_path / "evolving")
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "id long, text string"
    ).write.mode("append").parquet(p)
    spark.createDataFrame(
        [(3, "c", "en"), (4, "d", "de")], "id long, text string, lang string"
    ).write.mode("append").parquet(p)

    df = load_evolving(spark, p, defaults={"lang": "unknown"})
    assert set(df.columns) == {"id", "text", "lang"}
    got = {
        r.lang: r.n
        for r in df.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {"unknown": 2, "en": 1, "de": 1}


def test_range_sorted_layout_enables_rowgroup_skipping(
    spark, sf_small, tmp_path
):
    """The read-side payoff of the range-sorted layout: the predicate
    reaches the parquet scan (PushedFilters) AND every row group
    carries tight doc_id min/max statistics, so the reader can skip
    whole row groups by stats — the mechanism that turns a selective
    point/range query on 100 TB into a handful of row-group reads."""
    import pyarrow.parquet as pq

    from monasca_aggregator_spark.sources.sinks import write_range_sorted
    from tests.conftest import explain_str

    docs = load_table(spark, sf_small, "documents").repartition(8)
    out = tmp_path / "rs"
    write_range_sorted(docs, str(out), ["doc_id"], n_shards=4)

    lo, hi = 10, 20
    back = spark.read.parquet(str(out)).filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
    )
    plan = explain_str(back)
    assert "PushedFilters" in plan and "GreaterThanOrEqual(doc_id" in plan

    # every row group must carry doc_id stats; globally they must be
    # selective: only a minority of row groups intersect [lo, hi]
    n_rg, n_hit = 0, 0
    for f in _parquet_files(out):
        meta = pq.ParquetFile(str(f)).metadata
        idx = {
            meta.row_group(0).column(i).path_in_schema: i
            for i in range(meta.num_columns)
        }
        ci = idx["doc_id"]
        for g in range(meta.num_row_groups):
            st = meta.row_group(g).column(ci).statistics
            assert st is not None and st.has_min_max
            n_rg += 1
            if not (st.max < lo or st.min > hi):
                n_hit += 1
    assert n_rg >= 4
    assert n_hit < n_rg, "a sorted layout must let most row groups skip"
    assert back.count() == docs.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") <= hi)
    ).count()


def test_dynamic_partition_pruning_reaches_sharded_fact(
    spark, sf_small, tmp_path
):
    """Dynamic partition pruning: a dim-side filter the planner cannot
    see statically still prunes the hive-partitioned fact at RUNTIME
    via an injected subquery filter — on a 100 TB fact this is the
    difference between scanning the partitions a dim filter selects
    and scanning everything. Proven on the physical plan, not inferred
    from row counts."""
    from monasca_aggregator_spark.sources.sinks import write_sharded

    docs = load_table(spark, sf_small, "documents")
    out = tmp_path / "fact_by_lang"
    write_sharded(docs, str(out), partition_by=["lang"])
    fact = spark.read.parquet(str(out))
    # dim: (lang, family) — the filter selects a family, not a lang,
    # so static pruning is impossible; DPP must inject the lang set
    dim = (
        docs.select("lang")
        .distinct()
        .withColumn(
            "family",
            F.when(F.col("lang").isin("en", "de"), "germanic").otherwise(
                "other"
            ),
        )
    )
    dim.write.parquet(str(tmp_path / "dim"))
    d = spark.read.parquet(str(tmp_path / "dim")).filter(
        F.col("family") == "germanic"
    )
    j = fact.join(d, "lang").groupBy("family").count()
    plan = j._sc._jvm.PythonSQLUtils.explainString(
        j._jdf.queryExecution(), "formatted"
    )
    assert "dynamicpruning" in plan.lower(), plan[:2000]
    # and the answer is right
    expect = docs.filter(F.col("lang").isin("en", "de")).count()
    got = {r.family: r["count"] for r in j.collect()}
    assert got == {"germanic": expect}


def test_bloom_filter_columns_land_in_parquet(spark, tmp_path):
    """bloom_filter_cols writes a per-row-group parquet bloom filter:
    pinned via the deterministic size delta (the filter is ~1.2
    bytes/NDV of extra file payload on otherwise identical data —
    pyarrow in this container can't surface bloom offsets directly)
    and via an unchanged read-back. The skip benefit needs a reader
    with bloom support (Spark's vectorized reader uses it for point
    lookups); the WRITE side is what this layout controls."""
    import glob
    import os

    df = spark.range(0, 20000).selectExpr(
        "id as k", "cast(id as double) as v"
    )
    plain, bloomed = str(tmp_path / "plain"), str(tmp_path / "bloomed")
    write_sharded(df, plain, n_shards=1)
    write_sharded(
        df, bloomed, n_shards=1,
        bloom_filter_cols=["k"], bloom_filter_ndv=20000,
    )

    def total(p):
        return sum(
            os.path.getsize(f) for f in glob.glob(p + "/part-*.parquet")
        )

    delta = total(bloomed) - total(plain)
    assert delta > 10_000, delta  # ~1.2 B/NDV → >10 KB at ndv=20k
    back = spark.read.parquet(bloomed)
    assert back.count() == 20000
    assert back.filter("k = 12345").count() == 1


def test_committed_sink_files_compaction_no_double_count(tmp_path):
    """committed_sink_files must read the newest compact PLUS strictly
    later per-batch logs — naively concatenating all log files would
    double-count every pre-compaction batch (the flaky-duplicate class
    the loadgen test documented); in-progress temp files are ignored,
    and a missing metadata dir means no committed output."""
    import json

    from monasca_aggregator_spark.sources.sinks import (
        committed_sink_files,
    )

    out = tmp_path / "sink"
    meta = out / "_spark_metadata"
    meta.mkdir(parents=True)

    def entry(path):
        return json.dumps({"path": path, "size": 1, "action": "add"})

    # batches 0..2, then 3.compact RE-LISTING f0..f3, then batch 4
    (meta / "0").write_text("v1\n" + entry("f0"))
    (meta / "1").write_text("v1\n" + entry("f1"))
    (meta / "2").write_text("v1\n" + entry("f2"))
    (meta / "3.compact").write_text(
        "v1\n" + "\n".join(entry(f"f{i}") for i in range(4))
    )
    (meta / "4").write_text("v1\n" + entry("f4"))
    (meta / ".5.tmp").write_text("v1\n" + entry("SHOULD_NOT_APPEAR"))

    got = committed_sink_files(str(out))
    assert sorted(got) == [f"f{i}" for i in range(5)]
    assert len(got) == len(set(got)), "double-counted pre-compaction files"

    assert committed_sink_files(str(tmp_path / "nope")) == []
