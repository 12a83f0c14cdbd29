"""plans/spectral.py semantics pins on hand-built series. The DuckDB
oracle gate covers full-output parity at sf0.01; these pin the
behaviors a hash can't explain (which period a clean cycle lights up,
the sign/strength conventions of the trend tests, the constant-series
NULL guards)."""

from __future__ import annotations

from datetime import datetime, timezone

HOUR = 3600


def _ts(hour):
    return datetime.fromtimestamp(hour * HOUR, tz=timezone.utc)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def test_walsh_finds_the_daily_cycle(spark, tmp_path):
    """A clean 24 h square cycle scores ≈1 at period 24 and ≈0 at the
    incommensurate period 9... (period list has no 9 — use 6: a 24 h
    square wave correlates 0 with a balanced 6 h wave). A constant
    metric reports NULL (zero deviation)."""
    rows = []
    eid = 0
    for h in range(96):  # 4 full days
        v = 10.0 if h % 24 < 12 else 2.0
        rows.append((eid, _ts(h), 1, "cyclic", v, "{}"))
        eid += 1
        rows.append((eid, _ts(h), 1, "flat", 5.0, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.spectral import (
        q_metric_walsh_periodogram,
    )

    out = {
        (r.event_type, r.period): r.walsh_score
        for r in q_metric_walsh_periodogram(spark, str(tmp_path)).collect()
    }
    assert out[("cyclic", 24)] == 1.0
    # balanced 6 h wave over the 12-high/12-low day: exactly half the
    # high hours are +1 and half −1 → zero correlation
    assert abs(out[("cyclic", 6)]) < 1e-9
    assert out[("flat", 24)] is None


def test_mann_kendall_signs_and_constant_guard(spark, tmp_path):
    """Strictly increasing → tau_b = 1 / 'increasing'; strictly
    decreasing → −1 / 'decreasing'; constant → NULL stats, 'no_trend'
    (not NaN — the 0/0 guard)."""
    rows = []
    eid = 0
    for h in range(48):
        rows.append((eid, _ts(h), 1, "up", float(h), "{}"))
        eid += 1
        rows.append((eid, _ts(h), 1, "down", float(100 - h), "{}"))
        eid += 1
        rows.append((eid, _ts(h), 1, "const", 7.0, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.spectral import (
        q_metric_mann_kendall,
    )

    out = {
        r.event_type: r
        for r in q_metric_mann_kendall(spark, str(tmp_path)).collect()
    }
    assert out["up"].tau_b == 1.0
    assert out["up"].trend == "increasing"
    assert out["down"].tau_b == -1.0
    assert out["down"].trend == "decreasing"
    assert out["const"].tau_b is None
    assert out["const"].z_score is None
    assert out["const"].trend == "no_trend"
    # S = n(n-1)/2 pairs, all concordant, for the increasing series
    assert out["up"].s_stat == 48 * 47 // 2


def test_kruskal_wallis_separates_hourly_effect(spark, tmp_path):
    """A metric whose value depends only on hour-of-day gets a large
    H (ranks perfectly separated by group); an all-equal metric hits
    the tie-correction==0 guard and reports NULL."""
    rows = []
    eid = 0
    for h in range(96):
        rows.append(
            (eid, _ts(h), 1, "hod", float(h % 24), "{}")
        )
        eid += 1
        rows.append((eid, _ts(h), 1, "same", 3.0, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.spectral import (
        q_metric_kruskal_wallis,
    )

    out = {
        r.event_type: r
        for r in q_metric_kruskal_wallis(spark, str(tmp_path)).collect()
    }
    assert out["hod"].k_groups == 24
    # perfect separation: H approaches its maximum n-1 = 95 for fully
    # ordered groups; with 4 ties per group it stays close
    assert out["hod"].kw_h > 80
    assert out["same"].kw_h is None
