"""plans/diag.py semantics pins on hand-built data. The DuckDB oracle
gate covers full-output parity at sf0.01; these pin the behaviors a
hash can't explain (which series a stationarity test flags, the
direction conventions of the diagnostics, the degenerate-input
guards)."""

from __future__ import annotations

import math
from datetime import datetime, timezone

HOUR = 3600


def _ts(hour):
    return datetime.fromtimestamp(hour * HOUR, tz=timezone.utc)


def _write_events(spark, tmp_path, rows):
    spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string"
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))


def _series_events(series: dict[str, list[float]]):
    rows, eid = [], 0
    for name, vals in series.items():
        for h, v in enumerate(vals):
            rows.append((eid, _ts(h), 1, name, float(v), "{}"))
            eid += 1
    return rows


def test_runs_test_flags_regimes_and_oscillation(spark, tmp_path):
    """A two-regime series (all lows then all highs) has 2 runs →
    'clustered'; a strict alternation has n runs → 'oscillating'; a
    pseudo-random series is 'random'."""
    n = 96
    regimes = [1.0] * (n // 2) + [9.0] * (n // 2)
    alternating = [1.0 if h % 2 else 9.0 for h in range(n)]
    # deterministic pseudo-random walk values around the median
    noisy = [5.0 + math.sin(h * 1.7) * 3 + (h * 7 % 5) for h in range(n)]
    _write_events(
        spark,
        tmp_path,
        _series_events(
            {"regimes": regimes, "alt": alternating, "noisy": noisy}
        ),
    )
    from monasca_aggregator_spark.plans.diag import q_metric_runs_test

    out = {
        r.event_type: r
        for r in q_metric_runs_test(spark, str(tmp_path)).collect()
    }
    assert out["regimes"].runs == 2
    assert out["regimes"].verdict == "clustered"
    assert out["alt"].runs == n
    assert out["alt"].verdict == "oscillating"
    assert out["noisy"].verdict == "random"


def test_ljung_box_separates_ar_from_noise(spark, tmp_path):
    """A strongly autocorrelated series (smooth daily sine) gets a
    huge Q / 'autocorrelated'; an alternating high-frequency series is
    also autocorrelated (negative lag-1); a hash-scrambled series is
    'white_noise'."""
    import hashlib

    n = 96
    sine = [100 + 50 * math.sin(2 * math.pi * h / 24) for h in range(n)]
    # md5-driven values: deterministic, effectively white noise (a
    # linear-congruential "scramble" is itself autocorrelated)
    scrambled = [
        float(
            int(hashlib.md5(str(h).encode()).hexdigest()[:8], 16) % 1000
        )
        for h in range(n)
    ]
    _write_events(
        spark,
        tmp_path,
        _series_events({"sine": sine, "scrambled": scrambled}),
    )
    from monasca_aggregator_spark.plans.diag import q_metric_ljung_box

    out = {
        r.event_type: r
        for r in q_metric_ljung_box(spark, str(tmp_path)).collect()
    }
    assert out["sine"].verdict == "autocorrelated"
    assert out["sine"].lb_q > 100
    assert out["scrambled"].verdict == "white_noise"
    assert out["scrambled"].n_lags == 12


def test_kpss_and_dickey_fuller_agree_on_the_2x2(spark, tmp_path):
    """The classical pairing: a strong (noisy) linear trend is KPSS-
    nonstationary AND DF-unit_root; mean-reverting noise is KPSS-
    stationary AND DF-stationary. A NOISELESS ramp would leave DF's t
    undefined (zero residual variance) — that guard is pinned
    separately below."""
    import hashlib

    def _h(i):
        return int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)

    n = 96
    trend = [10.0 * h + _h(h) % 7 for h in range(n)]
    noise = [50.0 + _h(h) % 21 - 10 for h in range(n)]
    _write_events(
        spark, tmp_path, _series_events({"trend": trend, "noise": noise})
    )
    from monasca_aggregator_spark.plans.diag import (
        q_metric_dickey_fuller,
        q_metric_kpss,
    )

    kpss = {
        r.event_type: r
        for r in q_metric_kpss(spark, str(tmp_path)).collect()
    }
    df = {
        r.event_type: r
        for r in q_metric_dickey_fuller(spark, str(tmp_path)).collect()
    }
    assert kpss["trend"].verdict == "nonstationary"
    assert df["trend"].verdict == "unit_root"
    assert kpss["noise"].verdict == "stationary"
    assert df["noise"].verdict == "stationary"


def test_turning_points_and_hurst_regimes(spark, tmp_path):
    """A monotone ramp has 0 turning points ('smooth') and a
    persistent Hurst regime; a strict alternation turns at every
    interior point ('alternating') and is mean-reverting."""
    n = 96
    ramp = [float(h) for h in range(n)]
    alt = [1.0 if h % 2 else 9.0 for h in range(n)]
    _write_events(
        spark, tmp_path, _series_events({"ramp": ramp, "alt": alt})
    )
    from monasca_aggregator_spark.plans.diag import (
        q_metric_hurst_rs,
        q_metric_turning_points,
    )

    tp = {
        r.event_type: r
        for r in q_metric_turning_points(spark, str(tmp_path)).collect()
    }
    assert tp["ramp"].turning_points == 0
    assert tp["ramp"].verdict == "smooth"
    assert tp["alt"].turning_points == n - 2
    assert tp["alt"].verdict == "alternating"

    hurst = {
        r.event_type: r
        for r in q_metric_hurst_rs(spark, str(tmp_path)).collect()
    }
    assert hurst["ramp"].regime == "persistent"
    assert hurst["alt"].regime == "mean_reverting"
    assert hurst["ramp"].hurst > hurst["alt"].hurst


def _write_docs(spark, tmp_path, rows):
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_odds_ratio_surfaces_source_specific_words(spark, tmp_path):
    """A word concentrated in one source tops that source's log-odds
    ranking; a uniformly common word does not."""
    common = "alpha beta gamma delta epsilon zeta eta theta"
    rows = []
    for i in range(20):
        rows.append((i, common + " zebra", "en", "sa", 50))
    for i in range(20, 40):
        rows.append((i, common + " walrus", "en", "sb", 50))
    _write_docs(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.diag import q_text_odds_ratio

    got = q_text_odds_ratio(spark, str(tmp_path)).collect()
    top = {
        r.source: r.word for r in got if r.rank == 1
    }
    assert top["sa"] == "zebra"
    assert top["sb"] == "walrus"
    # the shared vocabulary never outranks the marker words
    for r in got:
        if r.word in common.split():
            assert r.log_odds_z < [
                x.log_odds_z for x in got
                if x.source == r.source and x.rank == 1
            ][0]


def test_bigram_cond_entropy_orders_template_vs_prose(spark, tmp_path):
    """A looping template (next token forced) scores ~0 conditional
    entropy; a random sequence over a small vocabulary scores near
    ln(vocab) (heads repeat, successors vary — all-UNIQUE tokens
    would score 0 too, since every head has one successor);
    branching factor = exp(H)."""
    import hashlib

    loop = " ".join(["click here now"] * 40)
    vocab = [f"v{j}" for j in range(8)]
    prose = " ".join(
        vocab[
            int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16) % 8
        ]
        for i in range(400)
    )
    rows = [
        (1, loop, "en", "tmpl", len(loop)),
        (2, prose, "en", "prose", len(prose)),
    ]
    _write_docs(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.diag import (
        q_text_bigram_cond_entropy,
    )

    out = {
        r.source: r
        for r in q_text_bigram_cond_entropy(spark, str(tmp_path)).collect()
    }
    assert out["tmpl"].cond_entropy_nats < 0.1
    # 8-word random sequence: H(w2|w1) approaches ln 8 ≈ 2.08
    assert out["prose"].cond_entropy_nats > 1.5
    for r in out.values():
        assert abs(
            r.branching_factor - math.exp(r.cond_entropy_nats)
        ) < 0.01 * r.branching_factor


def test_ngram13_decontamination_catches_verbatim_leak(spark, tmp_path):
    """A training doc sharing a verbatim 13-gram with a benchmark doc
    (doc_id % 20 == 0) is flagged; unrelated docs are not."""
    leak = " ".join(f"w{i}" for i in range(13))
    rows = [
        (0, "filler " + leak + " trailer", "en", "s", 60),  # benchmark
        (1, "intro " + leak + " outro", "en", "s", 60),  # contaminated
        (2, " ".join(f"u{i}" for i in range(30)), "en", "s", 60),
    ]
    _write_docs(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.diag import (
        q_decontaminate_ngram13,
    )

    got = q_decontaminate_ngram13(spark, str(tmp_path)).collect()
    assert [r.doc_id for r in got] == [1]
    assert got[0].n_hits == 1


def test_sbc_quadrants(spark, tmp_path):
    """Hand-built monthly demand hits all four Syntetos-Boylan
    quadrants: steady monthly demand → smooth; steady but sparse →
    intermittent; every month but wildly variable → erratic; sparse
    AND variable → lumpy."""
    from monasca_aggregator_spark.plans.diag import q_demand_pattern_sbc

    li, part = [], []
    brands = {
        "B_smooth": [(m, 10.0) for m in range(12)],
        "B_intermit": [(m, 10.0) for m in range(0, 12, 3)],
        "B_erratic": [(m, 1.0 if m % 2 else 200.0) for m in range(12)],
        "B_lumpy": [(0, 1.0), (5, 300.0), (11, 2.0)],
    }
    pk, lk = 1, 1
    for brand, months in brands.items():
        part.append((pk, f"part{pk}", brand, "t", 1, 10.0))
        for m, qty in months:
            li.append(
                (
                    lk,
                    pk,
                    1,
                    1,
                    qty,
                    qty * 10,
                    0.0,
                    0.0,
                    "N",
                    "O",
                    datetime(2024, 1 + m % 12, 15, tzinfo=timezone.utc),
                )
            )
            lk += 1
        pk += 1
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        part,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))

    out = {
        r.brand: r.pattern
        for r in q_demand_pattern_sbc(spark, str(tmp_path)).collect()
    }
    assert out == {
        "B_smooth": "smooth",
        "B_intermit": "intermittent",
        "B_erratic": "erratic",
        "B_lumpy": "lumpy",
    }


def test_brown_forsythe_detects_spread_difference(spark, tmp_path):
    """Two equal-mean sources with very different spread push W far
    above 1; two identical-spread sources keep W near 0."""
    from monasca_aggregator_spark.plans.diag import (
        q_corpus_brown_forsythe,
    )

    rows = []
    i = 0
    for k in range(30):
        rows.append((i, "t", "en", "tight", 100 + (k % 3)))
        i += 1
        rows.append((i, "t", "en", "wide", 100 + (k % 3) * 50 - 50))
        i += 1
    _write_docs(spark, tmp_path, rows)
    got = q_corpus_brown_forsythe(spark, str(tmp_path)).collect()[0]
    assert got.n_groups == 2
    assert got.bf_stat > 10


def test_quality_signal_correlation_contract(spark, tmp_path):
    """chars↔tokens correlate ~1 on uniform-word docs; a degenerate
    (zero-variance) pair reports NULL, not an error."""
    from monasca_aggregator_spark.plans.diag import (
        q_quality_signal_correlation,
    )

    rows = []
    for i in range(20):
        text = " ".join(["word"] * (10 + i * 5))
        rows.append((i, text, "en", "s", len(text)))
    _write_docs(spark, tmp_path, rows)
    got = {
        (r.signal_a, r.signal_b): r.pearson_r
        for r in q_quality_signal_correlation(spark, str(tmp_path)).collect()
    }
    assert len(got) == 6
    assert got[("chars", "tokens")] is not None
    assert got[("chars", "tokens")] > 0.999
    # 'word' is not a stopword: stops is all-zero → degenerate pairs
    assert got[("tokens", "stops")] is None


def test_dickey_fuller_degenerate_guard(spark, tmp_path):
    """A noiseless ramp has zero residual variance: DF's t is
    undefined — the operator reports 'degenerate' with NULL stats
    instead of raising (the ANSI divide-by-zero path)."""
    n = 96
    ramp = [10.0 * h for h in range(n)]
    _write_events(spark, tmp_path, _series_events({"ramp": ramp}))
    from monasca_aggregator_spark.plans.diag import (
        q_metric_dickey_fuller,
    )

    got = q_metric_dickey_fuller(spark, str(tmp_path)).collect()
    assert len(got) == 1
    assert got[0].verdict == "degenerate"
    assert got[0].df_t is None and got[0].beta is None
