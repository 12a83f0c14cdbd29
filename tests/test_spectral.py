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


def test_grubbs_finds_the_planted_outlier(spark, tmp_path):
    """One wild hour in an otherwise flat series: grubbs_g points at
    exactly that hour and g_max_fraction says that single point
    carries essentially all the variance; an all-equal series hits
    the zero-variance NULL guard."""
    rows = []
    eid = 0
    for h in range(48):
        v = 100.0 if h == 17 else 5.0
        rows.append((eid, _ts(h), 1, "spiky", v, "{}"))
        eid += 1
        rows.append((eid, _ts(h), 1, "flat", 5.0, "{}"))
        eid += 1
    _write_events(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.spectral import q_metric_grubbs

    out = {
        r.event_type: r
        for r in q_metric_grubbs(spark, str(tmp_path)).collect()
    }
    assert out["spiky"].suspect_ts_ms == 17 * 3600 * 1000
    assert out["spiky"].grubbs_g > 6  # ~sqrt(n-1) for a lone spike
    assert out["spiky"].g_max_fraction > 0.99
    assert out["flat"].grubbs_g is None


def test_welch_t_sign_and_magnitude(spark, tmp_path):
    """Source 'long' has strictly larger doc lengths than 'short':
    welch_t for (long, short) is positive and large; equal-length
    sources give t = 0."""
    docs = []
    did = 0
    for i in range(30):
        docs.append((did, "x", "en", "long", 1000 + i)); did += 1
        docs.append((did, "x", "en", "short", 100 + i)); did += 1
        docs.append((did, "x", "en", "same_a", 500 + i)); did += 1
        docs.append((did, "x", "en", "same_b", 500 + i)); did += 1
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from monasca_aggregator_spark.plans.spectral import (
        q_corpus_welch_ttest,
    )

    out = {
        (r.s1, r.s2): r
        for r in q_corpus_welch_ttest(spark, str(tmp_path)).collect()
    }
    assert out[("long", "short")].welch_t > 50
    assert out[("same_a", "same_b")].welch_t == 0.0
    # equal n and equal variance: Welch df = n1 + n2 - 2
    assert abs(out[("same_a", "same_b")].welch_df - 58) < 0.01


def test_pps_systematic_is_fixed_size_and_weight_proportional(
    spark, tmp_path
):
    """Equal weights: PPS systematic degenerates to an every-(n/k)th
    systematic sample of exactly k docs; a doc carrying half the
    total weight is always selected."""
    docs = [(i, "x", "en", "s", 10) for i in range(1000)]
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_sample_pps_systematic,
    )

    out = q_sample_pps_systematic(spark, str(tmp_path)).collect()
    assert len(out) == 100  # exactly k under equal weights
    ids = [r.doc_id for r in out]
    gaps = {b - a for a, b in zip(ids, ids[1:])}
    assert gaps == {10}  # every 10th doc

    # now give one doc half the total weight: it must be selected
    docs[500] = (500, "x", "en", "s", 10 * 999)
    spark.createDataFrame(
        docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out2 = q_sample_pps_systematic(spark, str(tmp_path)).collect()
    assert any(r.doc_id == 500 for r in out2)
