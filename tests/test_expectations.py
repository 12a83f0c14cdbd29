"""Expectations engine: exact violation counts on a crafted dirty table."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monasca_aggregator_spark.operators import expectations as E

ROWS = [
    # (id, grp, qty, status)
    (1, "a", 10, "ok"),
    (2, "a", -5, "ok"),      # range violation
    (None, "b", 20, "ok"),   # not_null violation
    (3, "b", 30, "bad"),     # in_set violation
    (3, "b", 40, "ok"),      # duplicate (id,grp) with next row
    (3, "b", 50, "ok"),
]


@pytest.fixture(scope="module")
def dirty(spark):
    return spark.createDataFrame(
        ROWS, "id long, grp string, qty long, status string"
    )


def test_check_counts_every_rule(dirty):
    rules = [
        E.not_null("id"),
        E.in_range("qty", 0, 100),
        E.in_set("status", {"ok", "meh"}),
        E.satisfies("qty_even", F.col("qty") % 2 == 0),
        E.unique("id", "grp"),
    ]
    rep = {r.rule: r for r in E.check(dirty, rules).collect()}
    assert all(
        r.checked == 6
        for name, r in rep.items()
        if not name.startswith("unique")
    )
    assert rep["not_null(id)"].violations == 1
    assert rep["range(qty)"].violations == 1
    assert rep["in_set(status)"].violations == 1
    assert rep["satisfies(qty_even)"].violations == 1  # qty=-5 is odd
    # uniqueness checks NON-NULL key tuples only (null-key rows are the
    # not-null rule's business): 5 non-null (id,grp) tuples, distinct
    # = {(1,a),(2,a),(3,b)} = 3 → checked 5, violations 5 - 3 = 2
    assert rep["unique(id,grp)"].checked == 5
    assert rep["unique(id,grp)"].violations == 2
    assert not any(r.passed for r in rep.values())


def test_check_clean_table_passes(spark):
    df = spark.createDataFrame(
        [(1, 5), (2, 6)], "id long, qty long"
    )
    rep = E.check(
        df, [E.not_null("id"), E.in_range("qty", 0, 10), E.unique("id")]
    ).collect()
    assert all(r.passed and r.violations == 0 for r in rep)


def test_check_is_single_pass(dirty):
    """Predicate + uniqueness rules compile to ONE aggregate (two-stage
    for the distinct): the physical plan contains no Join and only one
    scan of the input."""
    plan = E.check(
        dirty, [E.not_null("id"), E.in_range("qty", 0, 100), E.unique("id")]
    )._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan


def test_rule_validation():
    with pytest.raises(ValueError):
        E.Rule("bad")
    with pytest.raises(ValueError):
        E.check(None, [])


def test_observe_rules_streaming_gate(spark, tmp_path):
    """Per-micro-batch violation counts surface in observedMetrics —
    batch 1 is clean, batch 2 carries one range and one null
    violation."""
    import time as _time

    src = tmp_path / "exp_src"
    src.mkdir()
    clean = [(1, 5), (2, 7)]
    dirty = [(3, -1), (None, 5), (4, 9)]
    for rows in (clean, dirty):
        spark.createDataFrame(rows, "id long, qty long").coalesce(
            1
        ).write.mode("append").parquet(str(src))
        _time.sleep(1.1)

    raw = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    gated = E.observe_rules(
        raw, [E.not_null("id"), E.in_range("qty", 0, 10)]
    )
    q = (
        gated.writeStream.format("memory")
        .queryName("exp_gate_out")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "exp_ckpt"))
        .start()
    )
    q.awaitTermination()
    batches = [
        p.observedMetrics["expectations"]
        for p in q.recentProgress
        if "expectations" in (p.observedMetrics or {})
    ]
    totals = {"checked": 0, "not_null(id)": 0, "range(qty)": 0}
    for m in batches:
        totals["checked"] += m["checked"]
        totals["not_null(id)"] += m["not_null(id)"]
        totals["range(qty)"] += m["range(qty)"]
    assert totals == {"checked": 5, "not_null(id)": 1, "range(qty)": 1}
    # per-batch granularity: some batch saw zero violations
    assert any(m["not_null(id)"] == 0 and m["range(qty)"] == 0 for m in batches)
