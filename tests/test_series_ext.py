"""Edge semantics for plans/series_ext.py on synthetic events.

Oracle parity at sf0.01 is covered by tools/check_correctness.py /
the driver; these tests pin the BEHAVIOR on constructed series where
the right answer is known by design: cooldown island splitting, CUSUM
step detection, and MAD's robustness to the spike it is hunting.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from monasca_aggregator_spark.plans import series_ext

UTC = dt.timezone.utc
H = 3600 * 1000


def _events(spark, rows):
    """rows: (hour_index, event_type, value) -> events-shaped df."""
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    data = [
        (
            i,
            base + dt.timedelta(hours=h),
            1000 + i,
            et,
            float(v),
            "{}",
        )
        for i, (h, et, v) in enumerate(rows)
    ]
    return spark.createDataFrame(
        data, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )


@pytest.fixture()
def patched_loader(monkeypatch):
    def patch(df):
        monkeypatch.setattr(
            series_ext,
            "load_table",
            lambda spark, sf_dir, name: df,
        )

    return patch


def test_cooldown_splits_only_after_quiet_gap(spark, patched_loader):
    # hours 0,1 breach (contiguous) ... gap of 2h (within 3h cooldown)
    # ... hour 4 breaches -> SAME incident; hour 10 (gap 6h) -> new.
    rows = [(h, "m", 1.0) for h in range(12)]  # baseline mean=1
    for h in (0, 1, 4, 10):
        rows.append((h, "m", 100.0))  # push those hours above mean
    df = _events(spark, rows)
    patched_loader(df)
    out = series_ext.q_metric_alert_cooldown(spark, "ignored").collect()
    spans = sorted(
        (r["incident_start_ms"] // H % 100, r["incident_end_ms"] // H % 100,
         r["n_breach_windows"])
        for r in out
    )
    # epoch-relative hours: recover via modulo against the first start
    first = min(s for s, _, _ in spans)
    spans = [(s - first, e - first, n) for s, e, n in spans]
    assert spans == [(0, 4, 3), (10, 10, 1)]


def test_cusum_locates_step_change(spark, patched_loader):
    # 30 hours at 10, then 30 hours at 14: a sustained +40% level
    # shift no single-window outlier test sees. Offline CUSUM against
    # the global mean drifts on BOTH sides of the break; the
    # changepoint estimate is the argmax of the CUSUM statistic,
    # which must land on the shift boundary (hour 29, the last
    # low-level window).
    rows = [(h, "m", 10.0) for h in range(30)]
    rows += [(h, "m", 14.0) for h in range(30, 60)]
    df = _events(spark, rows)
    patched_loader(df)
    out = series_ext.q_metric_cusum(spark, "ignored").collect()
    base = min(r["window_ts_ms"] // H for r in out)
    assert any(r["is_change"] for r in out), "step never alarmed"
    peak = max(out, key=lambda r: r["changepoint_stat"])
    assert peak["window_ts_ms"] // H - base in (28, 29, 30)
    # a flat series of the same length must never alarm
    flat = _events(spark, [(h, "m", 10.0) for h in range(60)])
    patched_loader(flat)
    quiet = series_ext.q_metric_cusum(spark, "ignored").collect()
    assert not any(r["is_change"] for r in quiet)


def test_mad_flags_spike_zscore_would_mask(spark, patched_loader):
    # One colossal spike inflates stddev so much that a second,
    # smaller-but-real spike sits under 3 sigma — but both clear the
    # MAD fence, because the median/MAD baseline ignores outliers.
    rows = [(h, "m", 10.0) for h in range(48)]
    rows.append((10, "m", 100000.0))  # colossal spike at hour 10
    rows.append((20, "m", 400.0))  # real-but-smaller spike at hour 20
    df = _events(spark, rows)
    patched_loader(df)
    out = series_ext.q_metric_mad_anomaly(spark, "ignored").collect()
    base = min(r["window_ts_ms"] // H for r in out)
    flagged = {
        r["window_ts_ms"] // H - base for r in out if r["is_anomaly"]
    }
    assert 10 in flagged and 20 in flagged
    # sanity: quiet hours are not flagged
    assert 5 not in flagged and 30 not in flagged


def test_overlap_counts_exact_on_constructed_hour(spark, patched_loader):
    # hour 0: users 1..6 click, users 5..8 purchase -> both={5,6}.
    rows = []
    data = [(u, "click") for u in range(1, 7)] + [
        (u, "purchase") for u in range(5, 9)
    ]
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = [
        (i, base, u, et, 1.0, "{}") for i, (u, et) in enumerate(data)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    patched_loader(df)
    out = series_ext.q_agg_distinct_overlap(spark, "ignored").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_click"], r["n_purchase"], r["n_both"], r["n_union"]) == (
        6, 4, 2, 8,
    )
    assert r["jaccard"] == 0.25


def test_top_contributors_only_for_breaching_windows(
    spark, patched_loader
):
    # flat series except one spike hour where user 42 contributes 90%:
    # contributors reported ONLY for that window, user 42 rank 1.
    base = dt.datetime(2024, 1, 1, tzinfo=UTC)
    rows = []
    eid = 0
    for h in range(48):
        rows.append((eid, base + dt.timedelta(hours=h), 1, "m", 10.0,
                     "{}"))
        eid += 1
    rows.append((eid, base + dt.timedelta(hours=10), 42, "m", 900.0,
                 "{}"))
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    patched_loader(df)
    out = series_ext.q_metric_top_contributors(spark, "x").collect()
    assert out, "spike window produced no contributors"
    windows = {r["window_ts_ms"] // H for r in out}
    assert windows == {int(base.timestamp() * 1000) // H + 10}
    top = next(r for r in out if r["rank"] == 1)
    assert top["user_id"] == 42
    assert top["share"] == 90000 / 91000


def test_mix_drift_zero_when_stable_and_scales_with_swap(
    spark, patched_loader
):
    # week 1 and 2: identical 50/50 mix -> drift 0.
    # week 3: 75/25 -> L1 = |0.75-0.5| + |0.25-0.5| = 0.5.
    base = dt.datetime(1970, 1, 1, tzinfo=UTC)  # epoch-aligned weeks
    rows = []
    eid = 0
    mixes = [(2, 2), (2, 2), (3, 1)]
    for wk, (na, nb) in enumerate(mixes):
        t = base + dt.timedelta(days=7 * wk)
        for _ in range(na):
            rows.append((eid, t, 1, "a", 1.0, "{}")); eid += 1
        for _ in range(nb):
            rows.append((eid, t, 1, "b", 1.0, "{}")); eid += 1
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    patched_loader(df)
    out = {
        r["week_ms"] // (7 * 24 * H): r["l1_drift"]
        for r in series_ext.q_metric_mix_drift(spark, "x").collect()
    }
    assert out == {1: 0.0, 2: 0.5}


def test_autocorr_detects_perfect_seasonality(spark, patched_loader):
    # period-24 sawtooth repeated for 6 days -> lag-24 pairs are
    # identical -> r = 1. A linear ramp also gives r near 1, so the
    # contrast case is alternating noise with period 2 (anti-phase at
    # lag 24 after the odd-window shift): constructed so lag-24
    # correlation is exactly -1.
    rows = [(h, "m", 10.0 + (h % 24)) for h in range(144)]
    patched_loader(_events(spark, rows))
    out = series_ext.q_metric_autocorr(spark, "x").collect()
    assert len(out) == 1 and abs(out[0]["autocorr_24h"] - 1.0) < 1e-12
    # flat series: zero variance -> NULL, not 0
    patched_loader(_events(spark, [(h, "m", 5.0) for h in range(72)]))
    out = series_ext.q_metric_autocorr(spark, "x").collect()
    assert out[0]["autocorr_24h"] is None


def test_seasonal_decompose_splits_cycle_from_trend(
    spark, patched_loader
):
    # constructed series: value = 100*day + 10*hod over 4 full days.
    # Trend medians recover the daily level; hour-of-day medians
    # recover the cycle (constant across days -> residual == 0).
    rows = []
    for d in range(4):
        for hod in range(24):
            rows.append((d * 24 + hod, "m", 100.0 * d + 10.0 * hod))
    patched_loader(_events(spark, rows))
    out = series_ext.q_metric_seasonal_decompose(spark, "x").collect()
    assert len(out) == 96
    # additivity is exact by construction
    for r in out:
        assert r["value"] == r["trend"] + r["seasonal"] + r["residual"]
    # the same (hod) has the same seasonal in every day
    by_hod = {}
    for r in out:
        hod = (r["window_ts_ms"] // (3600 * 1000)) % 24
        by_hod.setdefault(hod, set()).add(r["seasonal"])
    assert all(len(v) == 1 for v in by_hod.values())
    # a pure-trend shift leaves residuals at zero everywhere
    assert all(abs(r["residual"]) < 60 for r in out)


def test_holtwinters_distribution_matches_reference(spark, sf_small):
    """The applyInPandas plumbing must reproduce the shared reference
    fit exactly: rebuild each metric's dense hourly series driver-side
    and compare every forecast horizon bit-for-bit."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.plans.series_ext import (
        _HOUR_MS,
        _HW_HORIZON,
        _HW_SEASON,
        _hourly_window,
        holt_winters_fit_forecast,
        q_metric_forecast_holtwinters,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    got = {
        (r.event_type, r.h): r.forecast_value
        for r in q_metric_forecast_holtwinters(spark, sf_small).collect()
    }
    ev = load_table(spark, sf_small, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = (
        ev.groupBy(F.col("event_type"), _hourly_window())
        .agg(F.sum("e2").alias("v"))
        .collect()
    )
    series: dict[str, dict[int, float]] = {}
    for r in hourly:
        series.setdefault(r.event_type, {})[r.window_ts_ms // _HOUR_MS] = float(r.v)
    assert got
    for et, dense in series.items():
        lo, hi = min(dense), max(dense)
        xs = [dense.get(x, 0.0) for x in range(lo, hi + 1)]
        fc = holt_winters_fit_forecast(xs, _HW_SEASON, _HW_HORIZON)
        for h in range(1, _HW_HORIZON + 1):
            assert got[(et, h)] == fc[h - 1] / 100.0, (et, h)


def test_holtwinters_tracks_trend_and_season():
    """On a clean synthetic series (level+trend+sinusoid-ish season),
    the 1..m-step forecast error is small relative to the signal."""
    from monasca_aggregator_spark.plans.series_ext import (
        holt_winters_fit_forecast,
    )

    m = 24
    season = [10.0 if i % m < 12 else -10.0 for i in range(m)]
    xs = [100.0 + 0.5 * t + season[t % m] for t in range(m * 6)]
    fc = holt_winters_fit_forecast(xs, m, m)
    truth = [100.0 + 0.5 * (len(xs) - 1 + h) + season[(len(xs) - 1 + h) % m]
             for h in range(1, m + 1)]
    mae = sum(abs(a - b) for a, b in zip(fc, truth)) / m
    assert mae < 2.0, mae


def test_hw_backtest_scores_and_wins_on_seasonal_series(spark, sf_small):
    """The bake-off query runs on real data and reproduces the shared
    one-step reference; on a clean seasonal+trend synthetic, HW must
    beat seasonal-naive."""
    from monasca_aggregator_spark.plans.series_ext import (
        _HW_SEASON,
        holt_winters_one_step,
        q_metric_backtest_hw_vs_snaive,
    )

    rows = q_metric_backtest_hw_vs_snaive(spark, sf_small).collect()
    assert rows and all(r.n_scored > 0 for r in rows)
    for r in rows:
        assert r.hw_wins == (r.mae_hw < r.mae_snaive)

    m = _HW_SEASON
    season = [5.0 if i % m < 12 else -5.0 for i in range(m)]
    xs = [50.0 + 0.3 * t + season[t % m] for t in range(m * 5)]
    fc = holt_winters_one_step(xs, m)
    mae_hw = sum(abs(xs[t] - f) for t, f in fc) / len(fc)
    mae_sn = sum(abs(xs[t] - xs[t - m]) for t, _ in fc) / len(fc)
    assert mae_hw < mae_sn  # trend makes snaive lag by 0.3*24/step


def test_shape_search_is_scale_and_level_invariant(spark, tmp_path):
    """A metric that is an affine transform (3x + 1000) of the query
    pattern must rank first with distance ≈ 0 — that's the point of
    z-normalization; a reversed pattern must rank behind it."""
    import datetime as dt

    import pandas as pd

    from monasca_aggregator_spark.plans.series_ext import (
        q_series_shape_search,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows, eid = [], 0
    base = [10.0 + (i % 7) * 3.0 for i in range(48)]  # query source
    for h, v in enumerate(base):
        rows.append((eid, t0 + dt.timedelta(hours=h), 1, "click", v, "{}")); eid += 1
        # affine twin: same shape, different scale+level
        rows.append((eid, t0 + dt.timedelta(hours=h), 1, "view", 3.0 * v + 1000.0, "{}")); eid += 1
        # reversed shape: different
        rows.append((eid, t0 + dt.timedelta(hours=h), 1, "error", base[len(base) - 1 - h], "{}")); eid += 1
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    out = q_series_shape_search(spark, str(tmp_path)).collect()
    # the period-7 base makes several click offsets exact repeats of
    # the query — also perfect matches; the affine 'view' twin must be
    # among the ~0-distance hits (scale/level invariance), and every
    # top hit must beat the best reversed-shape window
    view_dists = [r.z_dist for r in out if r.name == "view"]
    assert view_dists and min(view_dists) < 1e-4
    assert out[0].z_dist < 1e-4
    error_dists = [r.z_dist for r in out if r.name == "error"]
    if error_dists:
        assert min(error_dists) > 1e-4


def test_mttr_consistent_with_cooldown_incidents(spark, sf_small):
    """metric_mttr must be the exact per-metric aggregate of the
    cooldown incident table it composes: counts, breach windows, and
    the MTTR mean recomputed from the incident rows; single-incident
    metrics report NULL MTBF."""
    from monasca_aggregator_spark.plans.series_ext import (
        _HOUR_MS,
        q_metric_alert_cooldown,
        q_metric_mttr,
    )

    inc = q_metric_alert_cooldown(spark, sf_small).collect()
    got = {r.event_type: r for r in q_metric_mttr(spark, sf_small).collect()}
    by_m = {}
    for r in inc:
        by_m.setdefault(r.event_type, []).append(r)
    assert set(got) == set(by_m)
    for m, rows in by_m.items():
        g = got[m]
        assert g.n_incidents == len(rows)
        assert g.n_breach_windows == sum(r.n_breach_windows for r in rows)
        durs = [
            (r.incident_end_ms - r.incident_start_ms) // _HOUR_MS + 1
            for r in rows
        ]
        assert abs(g.mttr_hours - sum(durs) / len(durs)) < 1e-3
        if len(rows) == 1:
            assert g.mtbf_hours is None
        else:
            starts = sorted(r.incident_start_ms for r in rows)
            want = ((starts[-1] - starts[0]) // _HOUR_MS) / (len(rows) - 1)
            assert abs(g.mtbf_hours - want) < 1e-3


def test_capacity_eta_consistent_with_trend(spark, sf_small):
    """metric_capacity_eta must agree with metric_trend's slope, emit a
    coherent verdict per metric, and produce an ETA only for growing
    metrics still under capacity (and then a positive one that solves
    fit_now + slope·eta = capacity)."""
    from monasca_aggregator_spark.plans.series_ext import (
        q_metric_capacity_eta,
        q_metric_trend,
    )

    trend = {r.event_type: r for r in q_metric_trend(spark, sf_small).collect()}
    rows = q_metric_capacity_eta(spark, sf_small).collect()
    assert set(r.event_type for r in rows) == set(trend)
    for r in rows:
        t = trend[r.event_type]
        if t.slope_per_hour is not None and r.slope_per_hour is not None:
            assert abs(r.slope_per_hour - t.slope_per_hour) < 1e-5
        if r.verdict == "exhausts":
            assert r.eta_hours is not None and r.eta_hours > 0
            recon = r.fit_now + r.slope_per_hour * r.eta_hours
            assert abs(recon - r.capacity) <= max(0.05, 0.01 * r.capacity)
        else:
            assert r.eta_hours is None


def test_pacf_cuts_off_for_ar1(spark, monkeypatch):
    """Durbin-Levinson PACF (r9): for a synthetic AR(1) hourly
    series, PACF(1) ≈ φ and PACF(k≥2) ≈ 0 — the cut-off that
    identifies AR order; ACF meanwhile decays geometrically (no
    cut-off). Deterministic series, exact pin."""
    import math

    import monasca_aggregator_spark.plans.series_ext as SE
    from pyspark.sql import functions as F

    # AR(1) with phi=0.8, deterministic "innovations"
    phi = 0.8
    n = 400
    rng_vals = [math.sin(1000003.0 * i * i + 7.0) for i in range(n)]
    xs = [0.0]
    for i in range(1, n):
        xs.append(phi * xs[-1] + rng_vals[i])
    rows = [
        ("m", 1_700_000_000_000 + i * 3_600_000, 100.0 + x)
        for i, x in enumerate(xs)
    ]
    df = spark.createDataFrame(
        rows, "event_type string, ts_ms long, value double"
    ).select(
        "event_type",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        "value",
    )
    monkeypatch.setattr(
        SE, "load_table", lambda spark, sf_dir, name, **kw: df
    )
    pacf = {
        r.lag: r.pacf
        for r in SE.q_metric_pacf(spark, "x").collect()
    }
    assert abs(pacf[1] - phi) < 0.12
    assert all(abs(pacf[k]) < 0.15 for k in range(2, 13))
    acf = {
        r.lag: r.acf
        for r in SE.q_metric_correlogram(spark, "x").collect()
    }
    # geometric ACF decay: acf(2) ≈ acf(1)², still clearly nonzero
    assert acf[2] > 0.3 and abs(acf[2] - acf[1] ** 2) < 0.15
