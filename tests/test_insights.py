"""Round-3 insights queries: semantics pins on hand-built data plus
plan-shape assertions (no row-Python, broadcast joins where promised).
The DuckDB oracle gate (tools/check_correctness.py + the staged R6
driver window) covers full-output parity; these tests pin the
behaviors a hash can't explain."""

from __future__ import annotations

from datetime import datetime, timezone

import pytest
from pyspark.sql import functions as F

from tests.conftest import explain_str

DAY_MS = 86_400_000


def _write_events(spark, tmp_path, rows):
    """rows: (event_id, day, sec_in_day, user_id, event_type, value)"""
    data = [
        (
            eid,
            datetime.fromtimestamp(
                day * 86_400 + sec, tz=timezone.utc
            ),
            uid,
            et,
            float(v),
            "{}",
        )
        for eid, day, sec, uid, et, v in rows
    ]
    df = spark.createDataFrame(
        data,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    df.write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    return str(tmp_path)


def test_ab_test_flags_a_real_difference(spark, tmp_path):
    """Variant 1 (odd users) converts 4/4, variant 0 (even) 0/4 on one
    day → z must be large and flagged significant; counts exact."""
    from monasca_aggregator_spark.plans.insights import q_events_ab_test

    rows = []
    eid = 0
    for uid in range(8):
        rows.append((eid, 0, 10 + uid, uid, "view", 1.0))
        eid += 1
        if uid % 2 == 1:
            rows.append((eid, 0, 100 + uid, uid, "purchase", 5.0))
            eid += 1
    sf = _write_events(spark, tmp_path, rows)
    out = q_events_ab_test(spark, sf).collect()
    assert len(out) == 1
    r = out[0]
    assert (r.n0, r.n1, r.c0, r.c1) == (4, 4, 0, 4)
    assert r.p0 == 0.0 and r.p1 == 1.0
    assert r.significant and r.z_score > 2.0


def test_dau_mau_trailing_window_and_clip(spark, tmp_path):
    """User A active day 0 only, user B active days 0 and 29. Day 29's
    MAU must NOT include A (window is 28 days) but day 27's must."""
    from monasca_aggregator_spark.plans.insights import q_events_dau_mau

    rows = [
        (0, 0, 10, 1, "view", 1.0),   # A on day 0
        (1, 0, 20, 2, "view", 1.0),   # B on day 0
        (2, 27, 10, 2, "view", 1.0),  # B on day 27
        (3, 29, 10, 2, "view", 1.0),  # B on day 29
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.day: (r.dau, r.mau) for r in q_events_dau_mau(spark, sf).collect()}
    assert got[0] == (2, 2)
    assert got[27] == (1, 2)   # A's day-0 activity still inside 28d
    assert got[29] == (1, 1)   # A aged out; only B
    # only observed days reported
    assert set(got) == {0, 27, 29}


def test_interarrival_cv_separates_bot_from_bursty(spark, tmp_path):
    """A metronomic user (constant 60 s gaps) gets cv≈0/is_metronomic;
    a bursty user with the same mean gap does not."""
    from monasca_aggregator_spark.plans.insights import (
        q_events_interarrival_cv,
    )

    rows = []
    eid = 0
    for i in range(6):  # bot: every 60s
        rows.append((eid, 0, 60 * i, 1, "view", 1.0))
        eid += 1
    for sec in (0, 5, 10, 15, 20, 300):  # bursty human
        rows.append((eid, 0, sec, 2, "view", 1.0))
        eid += 1
    sf = _write_events(spark, tmp_path, rows)
    got = {r.user_id: r for r in q_events_interarrival_cv(spark, sf).collect()}
    assert got[1].cv == 0.0 and got[1].is_metronomic
    assert got[1].mean_gap_s == 60.0
    assert got[2].cv > 1.0 and not got[2].is_metronomic


def test_hod_dow_weekday_is_arithmetic_utc(spark, tmp_path):
    """Day 0 (1970-01-01) is a Thursday → dow=(0+4)%7=4; day 3 is a
    Sunday → dow=0. Pure integer derivation, no calendar API."""
    from monasca_aggregator_spark.plans.insights import (
        q_metric_hod_dow_heatmap,
    )

    rows = [
        (0, 0, 3 * 3600 + 5, 1, "view", 2.0),   # Thu 03h
        (1, 3, 23 * 3600 + 5, 1, "view", 4.0),  # Sun 23h
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.dow, r.hod): r for r in q_metric_hod_dow_heatmap(spark, sf).collect()
    }
    assert set(got) == {(4, 3), (0, 23)}
    assert got[(4, 3)].avg_value == 2.0 and got[(4, 3)].share == 0.5


def test_slo_budget_integer_threshold(spark, tmp_path):
    """3 good hours + 1 bad (mean > 1.2x overall) out of 4 → budget
    (1% of 4 windows = 0.04) blown 25x over, flagged exhausted."""
    from monasca_aggregator_spark.plans.insights import (
        q_metric_slo_error_budget,
    )

    rows = [
        (0, 0, 0 * 3600 + 1, 1, "api", 10.0),
        (1, 0, 1 * 3600 + 1, 1, "api", 10.0),
        (2, 0, 2 * 3600 + 1, 1, "api", 10.0),
        (3, 0, 3 * 3600 + 1, 1, "api", 100.0),  # spike hour
    ]
    sf = _write_events(spark, tmp_path, rows)
    r = q_metric_slo_error_budget(spark, sf).collect()[0]
    # overall mean 32.5; 1.2x = 39 → only the 100 hour is bad
    assert (r.n_windows, r.n_bad) == (4, 1)
    assert r.exhausted and r.budget_consumed == 25.0


def test_markov_accuracy_argmax_and_tiebreak(spark, tmp_path):
    """From 'a' the stream goes a→b twice and a→c once → predict b,
    accuracy 2/3; a 1-1 tie picks the lexicographically first type."""
    from monasca_aggregator_spark.plans.insights import (
        q_events_markov_accuracy,
    )

    seq1 = ["a", "b", "a", "b", "a", "c"]           # a→b, b→a, a→b, b→a, a→c
    rows = [(i, 0, 10 * i, 1, t, 1.0) for i, t in enumerate(seq1)]
    # user 2: tie d→x once, d→y once
    rows += [
        (10, 0, 5, 2, "d", 1.0),
        (11, 0, 15, 2, "y", 1.0),
        (12, 0, 25, 2, "d", 1.0),
        (13, 0, 35, 2, "x", 1.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.from_type: r for r in q_events_markov_accuracy(spark, sf).collect()}
    assert got["a"].predicted_next == "b"
    assert got["a"].n_from == 3 and got["a"].n_correct == 2
    assert got["a"].top1_accuracy == pytest.approx(2 / 3, abs=1e-6)
    assert got["d"].predicted_next == "x"  # tie → lexicographic


def test_repeat_rate_first_order_is_new(spark, sf_small):
    """Every customer's first order is 'new'; sum of n_new_customers
    across months equals the distinct customer count."""
    from monasca_aggregator_spark.plans.insights import q_orders_repeat_rate
    from monasca_aggregator_spark.sources.tables import load_table

    rows = q_orders_repeat_rate(spark, sf_small).collect()
    n_cust = (
        load_table(spark, sf_small, "orders")
        .select("o_custkey")
        .distinct()
        .count()
    )
    assert sum(r.n_new_customers for r in rows) == n_cust
    assert all(r.n_repeat + r.n_new_customers == r.n_orders for r in rows)


def test_funnel_window_depth_sliding_start_and_bound(spark, tmp_path):
    """The chain may start at ANY view (not just the first), and must
    complete inside the 6 h window:
    - user 1: view@0h, click@7h, purchase@8h; view@6.5h → the SECOND
      view chains (click/purchase inside ITS window) → depth 3
    - user 2: view@0h, click@1h, purchase@7h → purchase misses the
      6 h bound from the only view → depth 2
    - user 3: click before view only → depth 1
    """
    from monasca_aggregator_spark.plans.insights import (
        q_funnel_window_depth,
    )

    H = 3600
    rows = [
        (0, 0, 0 * H, 1, "view", 1.0),
        (1, 0, 7 * H, 1, "click", 1.0),
        (2, 0, 8 * H, 1, "purchase", 1.0),
        (3, 0, 6 * H + 1800, 1, "view", 1.0),
        (4, 0, 0 * H, 2, "view", 1.0),
        (5, 0, 1 * H, 2, "click", 1.0),
        (6, 0, 7 * H, 2, "purchase", 1.0),
        (7, 0, 1 * H, 3, "click", 1.0),
        (8, 0, 2 * H, 3, "view", 1.0),
    ]
    sf = _write_events(spark, tmp_path, rows)
    got = {r.depth: r for r in q_funnel_window_depth(spark, sf).collect()}
    assert got[3].n_users == 1            # user 1 via the second view
    assert got[2].n_users == 1            # user 2 stops at click
    assert got[1].n_users == 1            # user 3 never chains
    assert got[1].n_reaching == 3 and got[3].n_reaching == 1
    assert got[3].reach_share == pytest.approx(1 / 3, abs=1e-6)


def test_retention_bitmap_wide_crosses_word_boundary(spark, tmp_path):
    """A user active in bucket 0 and bucket 70 (6 h buckets) exercises
    BOTH 63-bit words: cohort 0, retained at offset 70 via word 1."""
    from monasca_aggregator_spark.plans.insights import (
        q_events_retention_bitmap_wide,
    )

    BUCKET_S = 6 * 3600
    T0_DAY = 19723  # 2024-01-01 in epoch days
    base = T0_DAY * 86_400
    rows = [
        (0, 0, 0, 1, "view", 1.0),
        (1, 0, 70 * BUCKET_S, 1, "view", 1.0),
        (2, 0, 65 * BUCKET_S, 2, "view", 1.0),  # cohort IN word 1
    ]
    # _write_events uses day*86400+sec; shift into the 2024 epoch
    rows = [(e, base // 86_400, s, u, t, v) for e, _, s, u, t, v in rows]
    sf = _write_events(spark, tmp_path, rows)
    got = {
        (r.cohort_b, r.offset): r.retained
        for r in q_events_retention_bitmap_wide(spark, sf).collect()
    }
    assert got[(0, 0)] == 1      # user 1 at cohort
    assert got[(0, 70)] == 1     # ...retained via word 1
    assert got[(65, 0)] == 1     # user 2's cohort derived FROM word 1
    assert got.get((0, 1), 0) == 0


def test_insights_plan_shapes(spark, sf_small):
    """No row-at-a-time Python anywhere; the fence/frontier/vocab
    summaries ride as broadcast joins as documented."""
    from monasca_aggregator_spark.plans import insights as I

    for name, fn in I.QUERIES.items():
        plan = explain_str(fn(spark, sf_small))
        assert "BatchEvalPython" not in plan, name
    for name in ("quality_iqr_outliers", "orders_open_aging"):
        plan = explain_str(I.QUERIES[name](spark, sf_small))
        assert "Broadcast" in plan, name
