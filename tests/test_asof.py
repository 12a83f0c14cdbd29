"""asof_join / sessionize semantics on hand-built cases: backward
inclusive matching, no-prior-row nulls, atomic row carry with null
fields, session merge/split around the gap."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.asof import asof_join, sessionize


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def test_asof_backward_inclusive(spark):
    left = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "L1"),
            (1, _ts("2024-01-01 12:00:00"), "L2"),
            (2, _ts("2024-01-01 09:00:00"), "L3"),  # no prior right row
        ],
        "k int, ts timestamp, l string",
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 09:30:00"), "old"),
            (1, _ts("2024-01-01 12:00:00"), "tie"),  # equal ts → matches (inclusive)
            (1, _ts("2024-01-01 13:00:00"), "future"),  # never matches
            (2, _ts("2024-01-01 11:00:00"), "late"),
        ],
        "k int, ts timestamp, r string",
    )
    got = {
        (r.k, r.l): (r.right_r, r.right_ts)
        for r in asof_join(left, right, ["k"]).collect()
    }
    assert got[(1, "L1")] == ("old", _ts("2024-01-01 09:30:00"))
    assert got[(1, "L2")] == ("tie", _ts("2024-01-01 12:00:00"))
    assert got[(2, "L3")] == (None, None)


def test_asof_carries_row_atomically_with_null_fields(spark):
    """A newer right row with a NULL field must not fall back to an
    older row's value for that field."""
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 12:00:00"))], "k int, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), "x", 1.0),
            (1, _ts("2024-01-01 11:00:00"), None, 2.0),  # newest, null field
        ],
        "k int, ts timestamp, a string, b double",
    )
    row = asof_join(left, right, ["k"]).first()
    assert row.right_b == 2.0
    assert row.right_a is None  # NOT "x"


def test_sessionize_merges_within_gap_and_splits_beyond(spark):
    ev = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 1.0),
            (1, _ts("2024-01-01 10:20:00"), 2.0),  # same session (< 30 min)
            (1, _ts("2024-01-01 11:30:00"), 4.0),  # new session (> 30 min)
            (2, _ts("2024-01-01 10:00:00"), 8.0),  # other key, own session
        ],
        "user_id int, ts timestamp, value double",
    )
    out = sessionize(
        ev, ["user_id"], gap="30 minutes", aggs=[F.sum("value").alias("v")]
    )
    rows = {
        (r.user_id, r.session_start_ms): (r.n_events, r.v, r.session_end_ms)
        for r in out.collect()
    }
    base = int(_ts("2024-01-01 10:00:00").timestamp() * 1000)
    gap_ms = 30 * 60 * 1000
    assert rows[(1, base)] == (2, 3.0, base + 20 * 60 * 1000 + gap_ms)
    assert rows[(1, base + 90 * 60 * 1000)][0] == 1
    assert rows[(2, base)] == (1, 8.0, base + gap_ms)
    assert len(rows) == 3


def test_asof_join_is_single_shuffle(spark, sf_small):
    """The union+carry formulation must shuffle once (hash by join keys
    for the window sort) — no range-join candidate explosion, no second
    exchange. At 100 TB this is the difference between a join and an
    outage."""
    from monasca_aggregator_spark.plans.temporal import q_asof_purchase_click
    from tests.conftest import explain_str

    plan = explain_str(q_asof_purchase_click(spark, sf_small))
    # formatted explain lists each Exchange's partitioning in Arguments
    n_exchanges = plan.count("hashpartitioning")
    assert n_exchanges == 1, plan
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_asof_join_matches_pandas_merge_asof(spark):
    """Random seeded batch ≡ pandas.merge_asof (backward, inclusive) —
    an independent reference implementation of the same semantics."""
    import random

    import pandas as pd

    rng = random.Random(17)
    left = [
        (rng.randrange(5), rng.randrange(0, 10_000) * 1000, float(i))
        for i in range(300)
    ]
    # unique right timestamps: with (k, ts) duplicates the pick among
    # ties is defined by input order in pandas but unordered in a
    # distributed sort — not a semantics difference worth pinning
    right = [
        (rng.randrange(5), (i * 7919 % 10_000) * 1000, float(1000 + i))
        for i in range(300)
    ]
    ldf = spark.createDataFrame(left, "k int, ts_ms long, lv double").select(
        "k", F.timestamp_millis("ts_ms").alias("ts"), "lv"
    )
    rdf = spark.createDataFrame(right, "k int, ts_ms long, rv double").select(
        "k", F.timestamp_millis("ts_ms").alias("ts"), "rv"
    )
    got = (
        asof_join(ldf, rdf, ["k"])
        .select("k", F.unix_millis("ts").alias("ts_ms"), "lv", "right_rv")
        .toPandas()
        .sort_values(["k", "ts_ms", "lv"])
        .reset_index(drop=True)
    )

    lp = pd.DataFrame(left, columns=["k", "ts_ms", "lv"]).sort_values("ts_ms")
    rp = pd.DataFrame(right, columns=["k", "ts_ms", "rv"]).sort_values("ts_ms")
    want = (
        pd.merge_asof(lp, rp, on="ts_ms", by="k", direction="backward")
        .sort_values(["k", "ts_ms", "lv"])
        .reset_index(drop=True)
    )
    assert len(got) == len(want)
    for g, w in zip(got.itertuples(), want.itertuples()):
        assert (g.k, g.ts_ms, g.lv) == (w.k, w.ts_ms, w.lv)
        if pd.isna(w.rv):
            assert g.right_rv is None or pd.isna(g.right_rv)
        else:
            assert g.right_rv == w.rv


def test_range_join_boundaries_and_long_intervals(spark):
    """Inclusive on both ends; intervals spanning many buckets still
    match exactly once per true pair."""
    import datetime as dt

    from monasca_aggregator_spark.operators.asof import range_join

    t = lambda s: dt.datetime.fromisoformat(s)
    pts = spark.createDataFrame(
        [(1, t("2024-01-01 00:00:00")),
         (2, t("2024-01-08 00:00:00")),
         (3, t("2024-02-15 12:00:00")),
         (4, t("2024-03-01 00:00:01"))],
        "pid long, ts timestamp",
    )
    iv = spark.createDataFrame(
        [(10, t("2024-01-01 00:00:00"), t("2024-01-08 00:00:00")),  # 1-week
         (20, t("2024-01-15 00:00:00"), t("2024-03-01 00:00:00"))],  # 6-week
        "iid long, s timestamp, e timestamp",
    )
    out = range_join(
        pts, iv, point_ts="ts", start_ts="s", end_ts="e", bucket="7 days"
    )
    pairs = sorted((r.pid, r.iid) for r in out.collect())
    # pid1: start boundary inclusive; pid2: end boundary inclusive;
    # pid3: inside the long interval (bucket-spanning); pid4: 1s late
    assert pairs == [(1, 10), (2, 10), (3, 20)]
    # exactly-once: no dedup artifacts even for multi-bucket intervals
    assert len(pairs) == len(set(pairs))


def test_range_join_plan_is_equi_not_nested_loop(spark):
    import datetime as dt

    from monasca_aggregator_spark.operators.asof import range_join
    from tests.conftest import explain_str

    t = dt.datetime.fromisoformat
    pts = spark.createDataFrame(
        [(1, t("2024-01-01"))], "pid long, ts timestamp"
    )
    iv = spark.createDataFrame(
        [(1, t("2024-01-01"), t("2024-01-02"))],
        "iid long, s timestamp, e timestamp",
    )
    plan = explain_str(
        range_join(pts, iv, point_ts="ts", start_ts="s", end_ts="e")
    )
    assert "NestedLoop" not in plan  # bucketized equi-join, hash-able


def test_events_retention_invariants(spark, sf_small):
    """Week-0 retention is exactly 1.0, cohorts only shrink-or-hold vs
    their own week 0, and cohort sizes sum to the distinct user count."""
    from monasca_aggregator_spark.plans.temporal import q_events_retention
    from monasca_aggregator_spark.sources.tables import load_table

    rows = q_events_retention(spark, sf_small).collect()
    assert rows, "empty retention matrix"
    week0 = {r.cohort_week_ms: r.n_active for r in rows if r.week_index == 0}
    for r in rows:
        assert r.week_index >= 0
        assert r.cohort_week_ms in week0, "cohort missing its week 0"
        assert r.n_active <= week0[r.cohort_week_ms]
        if r.week_index == 0:
            assert r.retention == 1.0
        assert 0.0 < r.retention <= 1.0
    n_users = (
        load_table(spark, sf_small, "events").select("user_id").distinct().count()
    )
    assert sum(week0.values()) == n_users


def test_metric_gapfill_dense_and_bracketed(spark, sf_small):
    """The filled series is a contiguous 15-min grid per metric, never
    null, and every interpolated value lies between its bracketing
    observed values."""
    from monasca_aggregator_spark.plans.temporal import (
        _GAP_STEP_MS,
        q_metric_gapfill,
    )

    rows = q_metric_gapfill(spark, sf_small).collect()
    by_metric: dict[str, list] = {}
    for r in rows:
        assert r.value is not None
        by_metric.setdefault(r.event_type, []).append(r)
    n_interp = 0
    for series in by_metric.values():
        series.sort(key=lambda r: r.window_ts_ms)
        steps = {
            b.window_ts_ms - a.window_ts_ms
            for a, b in zip(series, series[1:])
        }
        assert steps == {_GAP_STEP_MS}, "grid has holes or duplicates"
        # endpoints are observed by construction (grid = [min, max])
        assert not series[0].is_interpolated
        assert not series[-1].is_interpolated
        for i, r in enumerate(series):
            if not r.is_interpolated:
                continue
            n_interp += 1
            prev = next(
                s for s in reversed(series[:i]) if not s.is_interpolated
            )
            nxt = next(s for s in series[i + 1 :] if not s.is_interpolated)
            lo, hi = sorted((prev.value, nxt.value))
            assert lo - 1e-4 <= r.value <= hi + 1e-4
    assert n_interp > 0, "test data produced no gaps to interpolate"


def test_asof_nearest_directions_and_ties(spark):
    from monasca_aggregator_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 100), (1, 200), (2, 50)], "k long, ts long"
    )
    right = spark.createDataFrame(
        [(1, 90, "b90"), (1, 205, "a205"), (2, 40, "b40"), (2, 60, "a60")],
        "k long, ts long, tag string",
    )
    out = {
        (r.k, r.ts): r.near_tag
        for r in asof_join_nearest(
            left, right, ["k"], right_prefix="near_", order_col="tag"
        ).collect()
    }
    assert out[(1, 100)] == "b90"   # backward nearer (10 < 105)
    assert out[(1, 200)] == "a205"  # forward nearer (5 < 110)
    # k=2 ts=50: |50-40|=10 == |60-50|=10 → tie goes backward
    assert out[(2, 50)] == "b40"


def test_asof_nearest_equal_ts_tie_breaks_to_min_order_col(spark):
    """ADVICE r2: duplicate right rows at the SAME (key, ts) must
    resolve to the smallest ``order_col`` in BOTH directions — the
    oracle ranks equal-distance candidates by event_id ASC, and a
    naive ascending sort made the backward ``last`` carry pick the
    largest instead."""
    from monasca_aggregator_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame(
        [(1, 100), (1, 10)], "k long, ts long"
    )
    right = spark.createDataFrame(
        # backward tie group at ts=90 and forward tie group at ts=20
        [(1, 90, "id2"), (1, 90, "id1"), (1, 20, "id9"), (1, 20, "id3")],
        "k long, ts long, tag string",
    )
    out = {
        (r.k, r.ts): (r.near_tag, r.near_ts)
        for r in asof_join_nearest(
            left, right, ["k"], right_prefix="near_", order_col="tag"
        ).collect()
    }
    # left ts=100 → backward pick ts=90, min tag within the tie group
    assert out[(1, 100)] == ("id1", 90)
    # left ts=10 → forward pick ts=20, min tag within the tie group
    assert out[(1, 10)] == ("id3", 20)


def test_asof_nearest_no_match_keeps_nulls(spark):
    from monasca_aggregator_spark.operators.asof import asof_join_nearest

    left = spark.createDataFrame([(9, 10)], "k long, ts long")
    right = spark.createDataFrame([(1, 5, "x")], "k long, ts long, tag string")
    row = asof_join_nearest(left, right, ["k"], right_prefix="n_").collect()[0]
    assert row.n_tag is None and row.n_ts is None
