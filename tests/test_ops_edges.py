"""Edge-semantics pins for the late-round operators, on hand-built
frames (load_table monkeypatched so the exact plan bodies run):
k-anonymity at the threshold boundary, burn-rate blip suppression,
attribution credit conservation, and rolling-WAU window mechanics."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F


@contextlib.contextmanager
def _inject(mod, df):
    orig = mod.load_table
    mod.load_table = lambda *_a, **_k: df
    try:
        yield
    finally:
        mod.load_table = orig


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, event_type string, user_id long, t long, value double"
    ).select(
        "event_id",
        "event_type",
        "user_id",
        F.timestamp_millis(F.col("t")).alias("ts"),
        "value",
        F.lit("{}").alias("props"),
    )


T0 = 1_700_000_000_000  # fixed epoch anchor


def test_kanon_releases_exactly_at_k_and_suppresses_below(spark):
    import monasca_aggregator_spark.plans.temporal as tmod
    from monasca_aggregator_spark.plans.temporal import (
        _KANON_K,
        q_events_kanon,
    )

    rows = []
    eid = 0
    # group A: exactly k rows -> released; group B: k-1 rows -> residual
    for i in range(_KANON_K):
        rows.append((eid, "a", i, T0 + i, 1.0)); eid += 1
    for i in range(_KANON_K - 1):
        rows.append((eid, "b", i, T0 + i, 1.0)); eid += 1
    with _inject(tmod, _events(spark, rows)):
        out = q_events_kanon(spark, "unused").collect()
    by_type = {}
    for r in out:
        by_type.setdefault(r.event_type, []).append(r)
    (a,) = by_type["a"]
    assert not a.suppressed and a.n == _KANON_K and a.day is not None
    (b,) = by_type["b"]
    assert b.suppressed and b.n == _KANON_K - 1 and b.day is None


def test_burn_rate_requires_both_windows(spark):
    """A 5-minute error blip inside an otherwise healthy hour must NOT
    page (fast breaches, slow doesn't); a sustained breach pages."""
    import monasca_aggregator_spark.plans.series as smod
    from monasca_aggregator_spark.plans.series import q_metric_burn_rate

    rows = []
    eid = 0
    # hour 1: one 5-min window all errors, rest of the hour clean+dense
    h1 = (T0 // 3_600_000) * 3_600_000
    for i in range(10):
        rows.append((eid, "error", 1, h1 + i * 1_000, 1.0)); eid += 1
    for i in range(990):
        rows.append((eid, "ok", 1, h1 + 600_000 + i * 3_000, 1.0)); eid += 1
    # hour 2: sustained 50% errors
    h2 = h1 + 3_600_000
    for i in range(100):
        rows.append((eid, "error", 1, h2 + i * 30_000, 1.0)); eid += 1
        rows.append((eid + 1000, "ok", 1, h2 + i * 30_000 + 1, 1.0))
        eid += 1
    with _inject(smod, _events(spark, rows)):
        out = q_metric_burn_rate(spark, "unused").collect()
    blip = [r for r in out if r.window_ts_ms == h1]
    assert blip and not any(r.burning for r in blip)
    sustained = [r for r in out if h2 <= r.window_ts_ms < h2 + 3_600_000]
    assert sustained and all(r.burning for r in sustained)


def test_attribution_conserves_value_and_skips_touchless(spark):
    """Per-purchase credit sums to v_e6 - (v_e6 mod n_touch) (floor
    division remainder only); purchases with no prior-24h click
    contribute nothing."""
    import monasca_aggregator_spark.plans.temporal as tmod
    from monasca_aggregator_spark.plans.temporal import (
        q_events_attribution,
    )

    rows = [
        # user 1: 3 clicks then a purchase of 10.0 -> 3 credits
        (1, "click", 1, T0 + 1_000, 0.0),
        (2, "click", 1, T0 + 2_000, 0.0),
        (3, "click", 1, T0 + 3_000, 0.0),
        (4, "purchase", 1, T0 + 10_000, 10.0),
        # user 2: purchase with NO clicks -> absent entirely
        (5, "purchase", 2, T0 + 10_000, 99.0),
        # user 3: click AFTER the purchase -> not attributed
        (6, "purchase", 3, T0 + 10_000, 7.0),
        (7, "click", 3, T0 + 20_000, 0.0),
    ]
    with _inject(tmod, _events(spark, rows)):
        out = q_events_attribution(spark, "unused").collect()
    assert len(out) == 1
    r = out[0]
    assert r.n_touches == 3 and r.n_purchases == 1
    # 10.0 -> 10_000_000 e6; //3 = 3_333_333 per touch; x3 = 9_999_999
    # e6 = 9.999999, which the 4-dp display rounding shows as 10.0 —
    # conservation holds to the floor-division remainder (< n_touch e-6)
    assert abs(r.credited_value - 10.0) < 1e-9


def test_rolling_wau_window_mechanics(spark):
    """A user active only on day 0 counts toward WAU for days 0-6 and
    never day 7; DAU only on day 0."""
    import monasca_aggregator_spark.plans.temporal as tmod
    from monasca_aggregator_spark.plans.temporal import (
        q_events_rolling_wau,
    )

    day_ms = 86_400_000
    d0 = (T0 // day_ms) * day_ms
    rows = [(1, "click", 42, d0 + 1_000, 1.0)]
    # a second always-active user extends the reporting span to day 9
    rows += [
        (10 + i, "view", 7, d0 + i * day_ms + 2_000, 1.0) for i in range(10)
    ]
    with _inject(tmod, _events(spark, rows)):
        out = {r.day: r for r in q_events_rolling_wau(spark, "unused").collect()}
    days = sorted(out)
    assert len(days) == 10
    for i, day in enumerate(days):
        expect_wau = 2 if i <= 6 else 1
        assert out[day].n_wau == expect_wau, (i, day)
        assert out[day].n_dau == (2 if i == 0 else 1)


def test_out_of_order_detects_only_late_arrivals(spark):
    """A perfectly ordered series reports zero lateness; swapping two
    arrivals makes exactly the displaced event late by the frontier
    gap."""
    import monasca_aggregator_spark.plans.series as smod
    from monasca_aggregator_spark.plans.series import (
        q_metric_out_of_order,
    )

    rows = [(i, "ordered", 1, T0 + i * 1_000, 1.0) for i in range(10)]
    # "swapped": event_id 105 carries an EARLIER ts than 104 → late by 5s
    rows += [
        (100, "swapped", 1, T0 + 0, 1.0),
        (101, "swapped", 1, T0 + 10_000, 1.0),
        (102, "swapped", 1, T0 + 5_000, 1.0),
    ]
    with _inject(smod, _events(spark, rows)):
        out = {r.event_type: r for r in q_metric_out_of_order(spark, "x").collect()}
    assert out["ordered"].n_late == 0
    assert out["ordered"].max_lateness_ms == 0
    s = out["swapped"]
    assert s.n_late == 1 and s.max_lateness_ms == 5_000
    assert s.total_lateness_ms == 5_000


def test_ldiversity_suppresses_homogeneous_cell(spark):
    """The case k-anonymity cannot catch: a LARGE cell whose rows all
    share one sensitive tier is suppressed (attribute disclosure),
    while a same-size diverse cell releases. props.k drives the tier."""
    import monasca_aggregator_spark.plans.temporal as tmod
    from monasca_aggregator_spark.plans.temporal import (
        _LDIV_L,
        q_events_ldiversity,
    )

    def _ev(spark, rows):
        return spark.createDataFrame(
            rows,
            "event_id long, event_type string, user_id long,"
            " t long, k int",
        ).select(
            "event_id",
            "event_type",
            "user_id",
            F.timestamp_millis(F.col("t")).alias("ts"),
            F.lit(1.0).alias("value"),
            F.concat(F.lit('{"k": '), F.col("k"), F.lit("}")).alias(
                "props"
            ),
        )

    rows, eid = [], 0
    # 'homog': 50 rows, ALL tier 0 (k in 0..24) → big but 1 tier
    for i in range(50):
        rows.append((eid, "homog", i, T0 + i, 3)); eid += 1
    # 'divers': 50 rows across tiers 0..3 (k = 0,25,50,75 cycling)
    for i in range(50):
        rows.append((eid, "divers", i, T0 + i, (i % 4) * 25)); eid += 1
    with _inject(tmod, _ev(spark, rows)):
        out = q_events_ldiversity(spark, "unused").collect()
    by_type = {r.event_type: r for r in out}
    h = by_type["homog"]
    assert h.suppressed and h.day is None and h.n == 50
    d = by_type["divers"]
    assert not d.suppressed and d.n_tiers >= _LDIV_L and d.n == 50


def test_ar1_fit_recovers_phi_and_halflife(spark):
    """A synthetic exact AR(1) recursion v_t = c + φ·v_{t−1} with
    φ=0.5 recovers φ exactly (it's deterministic, so OLS is exact);
    half-life = −ln2/ln(0.5) = 1 hour. A constant series → NULL φ."""
    import math

    import monasca_aggregator_spark.plans.series_ext as smod
    from monasca_aggregator_spark.plans.series_ext import (
        q_metric_ar1_fit,
    )

    rows, eid = [], 0
    h0 = (T0 // 3_600_000) * 3_600_000
    # exact recursion in e2 units: v_{t+1} = 100 + v_t/2, v_0 = 6400
    # (values in e2 cents: value = v/100 so e2 round-trips exactly)
    v = 640000
    for t in range(12):
        rows.append((eid, "ar", 1, h0 + t * 3_600_000, v / 100.0))
        eid += 1
        v = 10000 + v // 2
    for t in range(6):
        rows.append((eid, "const", 1, h0 + t * 3_600_000, 7.0))
        eid += 1
    with _inject(smod, _events(spark, rows)):
        out = {r.event_type: r for r in q_metric_ar1_fit(
            spark, "unused"
        ).collect()}
    ar = out["ar"]
    assert ar.n_pairs == 11
    # v//2 floors on odd values, so the recursion is AR(1) to ~1e-5
    assert abs(ar.phi - 0.5) < 1e-4
    assert abs(ar.halflife_hours - 1.0) < 1e-3
    assert abs(ar.intercept - 100.0) < 0.05
    assert out["const"].phi is None


def test_did_cancels_baseline_and_recovers_lift(spark):
    """A 40-point PRE-EXISTING level difference between arms cancels
    out of the double difference; a genuine post-only +20-point lift
    in the treatment arm is recovered exactly."""
    import monasca_aggregator_spark.plans.insights as imod
    from monasca_aggregator_spark.plans.insights import q_events_ab_did

    DAY0 = 1_704_067_200_000  # 2024-01-01 (the query's epoch anchor)
    rows, eid = [], 0
    for uid in range(10):
        treat = uid % 2 == 1
        for day in range(30):
            t = DAY0 + day * 86_400_000 + uid * 1000
            rows.append((eid, "view", uid, t, 1.0)); eid += 1
            post = day >= 15
            if treat:
                # 60% pre; post adds day%5==3 → 80%
                conv = day % 5 in (0, 1, 2) or (post and day % 5 == 3)
            else:
                conv = day % 5 == 0  # 20% both periods
            if conv:
                rows.append((eid, "purchase", uid, t + 1, 1.0)); eid += 1
    with _inject(imod, _events(spark, rows)):
        (r,) = q_events_ab_did(spark, "unused").collect()
    assert abs(r.rate_ctrl_pre - 0.2) < 1e-9
    assert abs(r.rate_ctrl_post - 0.2) < 1e-9
    assert abs(r.rate_treat_pre - 0.6) < 1e-9
    assert abs(r.rate_treat_post - 0.8) < 1e-9
    # naive post-only contrast would read 0.6; DiD reads the true 0.2
    assert abs(r.did - 0.2) < 1e-9
    assert r.z > 2.0


def test_anova_days_separates_between_from_within(spark):
    """A metric constant within each day but stepping across days is
    pure BETWEEN variance (η²=1, F undefined at zero within-variance);
    a metric repeating the same hourly pattern every day is pure
    WITHIN variance (η²=0)."""
    import monasca_aggregator_spark.plans.series_ext as smod
    from monasca_aggregator_spark.plans.series_ext import (
        q_metric_anova_days,
    )

    rows, eid = [], 0
    h0 = (T0 // 86_400_000) * 86_400_000
    for day in range(5):
        for hour in range(24):
            t = h0 + day * 86_400_000 + hour * 3_600_000
            rows.append((eid, "between", 1, t, float(100 * (day + 1))))
            eid += 1
            rows.append((eid, "within", 1, t, float(10 + hour)))
            eid += 1
    with _inject(smod, _events(spark, rows)):
        out = {r.event_type: r for r in q_metric_anova_days(
            spark, "unused"
        ).collect()}
    b = out["between"]
    assert b.n_hours == 120 and b.n_days == 5
    assert abs(b.eta2_between_days - 1.0) < 1e-9
    assert b.f_stat is None  # zero within-day variance
    w = out["within"]
    assert abs(w.eta2_between_days) < 1e-9


def test_peak_prominence_scipy_semantics(spark):
    """Hand series pinning the scipy contract: a plateau ripple near
    a high ridge has tiny prominence, the global max bases at the
    series-edge minimum, plateaus count once (first sample), and
    endpoints are never peaks."""
    import monasca_aggregator_spark.plans.series_ext as smod
    from monasca_aggregator_spark.plans.series_ext import (
        q_metric_peak_prominence,
    )

    # hourly values (e2 = value·100): shape
    # idx:  1   2   3   4   5   6   7   8   9
    # v  : 10 100  95  98  95  40 300 300  20
    # peaks: idx2 (v=100, higher terrain right at idx7 → col min
    # (2,7)=40 → prom 60); idx4 (v=98, cols: left min(2,4)=95?? left
    # higher idx2: min(2,4)=95; right higher idx7: min(4,7)=40 →
    # bases max(95,40)=95 → prom 3 — the ripple); idx7 (v=300 plateau
    # FIRST sample, no higher → bases = edge minima: left min=10,
    # right min=20 → max=20 → prom 280). idx8 (plateau second) and
    # idx9 (endpoint) are not peaks.
    vals = [10, 100, 95, 98, 95, 40, 300, 300, 20]
    rows = [
        (i, "m", 1, T0 + i * 3_600_000, v / 100.0)
        for i, v in enumerate(vals)
    ]
    with _inject(smod, _events(spark, rows)):
        out = sorted(
            q_metric_peak_prominence(spark, "unused").collect(),
            key=lambda r: r.rank,
        )
    got = [(r.rank, r.peak_e2, r.prominence_e2) for r in out]
    assert got == [(1, 300, 280), (2, 100, 60), (3, 98, 3)]
