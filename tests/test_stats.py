"""plans/stats.py semantics pins on hand-built data. The DuckDB oracle
gate covers full-output parity at sf0.01; these pin the closed-form
behaviors a hash can't explain (Gini extremes, Benford algebra,
censoring, rank-correlation extremes, sweep-line backlog)."""

from __future__ import annotations

import math
from datetime import datetime, timezone

from pyspark.sql import functions as F

from tests.conftest import explain_str

DAY = 86_400


def _ts(day, sec=0):
    return datetime.fromtimestamp(day * DAY + sec, tz=timezone.utc)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _tpch_dims(spark, tmp_path):
    _write(
        spark,
        tmp_path,
        "nation",
        [(0, "ALPHA", 0), (1, "BETA", 0)],
        "n_nationkey int, n_name string, n_regionkey int",
    )
    _write(
        spark,
        tmp_path,
        "customer",
        [(i, f"c{i}", i // 4, 0.0, "SEG") for i in range(8)],
        "c_custkey long, c_name string, c_nationkey int,"
        " c_acctbal double, c_mktsegment string",
    )


def test_gini_extremes(spark, tmp_path):
    """Equal revenues → Gini 0; one whale → the closed-form value
    (a=[1,1,1,97]: G = (2·394 − 5·100)/(4·100) = 0.72)."""
    from monasca_aggregator_spark.plans.stats import (
        q_revenue_gini_by_nation,
    )

    _tpch_dims(spark, tmp_path)
    orders, ok = [], 0
    for cust in range(4):  # nation 0: all equal
        orders.append((ok, cust, "O", 10.0, _ts(0), "P"))
        ok += 1
    for cust, rev in zip(range(4, 8), [1.0, 1.0, 1.0, 97.0]):
        orders.append((ok, cust, "O", rev, _ts(0), "P"))
        ok += 1
    _write(
        spark,
        tmp_path,
        "orders",
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    out = {
        r.nation: r
        for r in q_revenue_gini_by_nation(spark, str(tmp_path)).collect()
    }
    assert out["ALPHA"].gini == 0.0
    assert out["ALPHA"].revenue == 40
    assert math.isclose(out["BETA"].gini, 0.72, abs_tol=1e-9)
    # scale shape: rank offsets and the nation dim ride broadcast joins
    plan = explain_str(q_revenue_gini_by_nation(spark, str(tmp_path)))
    assert "BroadcastHashJoin" in plan


def test_benford_algebra(spark, tmp_path):
    """30 values leading with '1', 10 with '2': shares 0.75/0.25 and
    deviation = share − log10(1 + 1/d) exactly."""
    from monasca_aggregator_spark.plans.stats import q_orders_benford

    rows = [(i, 0, "O", 150.0, _ts(0), "P") for i in range(30)]
    rows += [(30 + i, 0, "O", 25.0, _ts(0), "P") for i in range(10)]
    _write(
        spark,
        tmp_path,
        "orders",
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    out = {r.digit: r for r in q_orders_benford(spark, str(tmp_path)).collect()}
    assert out[1].observed == 30 and out[2].observed == 10
    assert math.isclose(out[1].share, 0.75, abs_tol=1e-9)
    exp1 = math.log10(2.0)
    assert math.isclose(out[1].expected, round(exp1, 6), abs_tol=1e-6)
    assert math.isclose(
        out[1].deviation, 0.75 - out[1].expected, abs_tol=1e-6
    )
    assert math.isclose(sum(r.share for r in out.values()), 1.0, abs_tol=1e-6)


def test_survival_hazard_censoring(spark, tmp_path):
    """User A: purchases day 0 and day 3 → death at duration 3.
    User B: one purchase day 0, stream frontier day 10 → censored at
    10. at_risk counts down as users leave; hazard = deaths/at_risk."""
    from monasca_aggregator_spark.plans.stats import (
        q_events_survival_hazard,
    )

    rows = [
        (0, _ts(0), 1, "purchase", 1.0, "{}"),
        (1, _ts(3), 1, "purchase", 1.0, "{}"),
        (2, _ts(0), 2, "purchase", 1.0, "{}"),
        (3, _ts(10), 9, "view", 1.0, "{}"),  # frontier, not a purchase
    ]
    _write(
        spark,
        tmp_path,
        "events",
        rows,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )
    out = {r.day: r for r in q_events_survival_hazard(spark, str(tmp_path)).collect()}
    assert set(out) == {3, 10}
    assert out[3].at_risk == 2 and out[3].deaths == 1 and out[3].censored == 0
    assert math.isclose(out[3].hazard, 0.5, abs_tol=1e-9)
    assert out[10].at_risk == 1 and out[10].deaths == 0 and out[10].censored == 1
    assert out[10].hazard == 0.0


def _docs(spark, tmp_path, texts):
    rows = [
        (i, t, "en", "web", len(t)) for i, t in enumerate(texts)
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )


def test_spearman_extremes(spark, tmp_path):
    """Token count monotone in length → ρ = 1; anti-monotone → ρ = −1
    (exact, since ranks are tie-broken integers)."""
    from monasca_aggregator_spark.plans.stats import q_corpus_spearman

    _docs(spark, tmp_path, ["a", "b c", "d e f", "g h i j"])
    r = q_corpus_spearman(spark, str(tmp_path)).collect()[0]
    assert r.n_docs == 4 and r.sum_d2 == 0 and r.spearman == 1.0

    # longer text, FEWER tokens: pad with a single long token
    _docs(
        spark,
        tmp_path,
        ["a b c d", "bb cc e", "ccccc f", "ddddddddd"],
    )
    r = q_corpus_spearman(spark, str(tmp_path)).collect()[0]
    assert r.spearman == -1.0


def test_backlog_sweep_line(spark, tmp_path):
    """Order 1 opens Jan, last ship Jan (closes into Feb); order 2
    opens Jan, last ship Mar (closes into Apr). Backlog: Jan 2, Feb 1,
    Apr 0."""
    from monasca_aggregator_spark.plans.stats import q_orders_backlog

    jan, feb, mar = (
        datetime(2024, 1, 10, tzinfo=timezone.utc),
        datetime(2024, 2, 5, tzinfo=timezone.utc),
        datetime(2024, 3, 20, tzinfo=timezone.utc),
    )
    _write(
        spark,
        tmp_path,
        "orders",
        [(1, 0, "O", 10.0, jan, "P"), (2, 0, "O", 10.0, jan, "P")],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    li_schema = (
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp"
    )
    _write(
        spark,
        tmp_path,
        "lineitem",
        [
            (1, 0, 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", jan),
            (2, 0, 0, 1, 1.0, 1.0, 0.0, 0.0, "N", "O", jan),
            (2, 0, 0, 2, 1.0, 1.0, 0.0, 0.0, "N", "O", mar),
        ],
        li_schema,
    )
    out = {
        (r.year, r.month): r
        for r in q_orders_backlog(spark, str(tmp_path)).collect()
    }
    assert out[(2024, 1)].opened == 2 and out[(2024, 1)].backlog == 2
    assert out[(2024, 2)].closed == 1 and out[(2024, 2)].backlog == 1
    assert out[(2024, 4)].closed == 1 and out[(2024, 4)].backlog == 0


def test_mannwhitney_closed_form_no_ties(spark, tmp_path):
    """Sources A=[1,2,3] vs B=[4,5,6]: U_A = 0, rank-biserial = −1,
    z = −9/(2·√(9·7/12)) — the textbook normal-approximation value."""
    from monasca_aggregator_spark.plans.stats import q_corpus_mannwhitney

    rows = [
        (i, "t", "en", src, v)
        for i, (src, v) in enumerate(
            [("A", 1), ("A", 2), ("A", 3), ("B", 4), ("B", 5), ("B", 6)]
        )
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        r.source: r
        for r in q_corpus_mannwhitney(spark, str(tmp_path)).collect()
    }
    a = out["A"]
    assert a.n_docs == 3 and a.u_stat == 0.0
    assert a.rank_biserial == -1.0
    expected_z = -9.0 / (2.0 * math.sqrt(9.0 * 7.0 / 12.0))
    assert abs(a.z - expected_z) < 1e-6
    b = out["B"]
    assert b.u_stat == 9.0 and b.rank_biserial == 1.0


def test_mannwhitney_tie_correction(spark, tmp_path):
    """All six docs the same length: U = mean(U) (z numerator 0) and
    the tie term removes ALL variance — z is NULL by the nullif
    contract (both engines), read as 'no detectable shift'."""
    from monasca_aggregator_spark.plans.stats import q_corpus_mannwhitney

    rows = [
        (i, "t", "en", "A" if i < 3 else "B", 7) for i in range(6)
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        r.source: r
        for r in q_corpus_mannwhitney(spark, str(tmp_path)).collect()
    }
    # identical values → every rank is the average rank → U == n1·n2/2
    assert out["A"].u_stat == 4.5 and out["A"].rank_biserial == 0.0
    assert out["A"].z is None  # variance fully tie-cancelled -> NULL


def test_bootstrap_ci_deterministic_and_brackets_mean(spark, tmp_path):
    """The order-stat CI brackets the sample mean on well-behaved
    data, replicate count is exactly B, and a rerun is bit-identical
    (the draws are pure hash functions of (doc_id, rep))."""
    from monasca_aggregator_spark.plans.stats import (
        _BOOT_B,
        q_quality_bootstrap_ci,
    )

    rows = [
        (i, "t", "en", "web", 100 + (i * 37) % 50) for i in range(200)
    ]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out1 = q_quality_bootstrap_ci(spark, str(tmp_path)).collect()
    out2 = q_quality_bootstrap_ci(spark, str(tmp_path)).collect()
    assert out1 == out2
    r = out1[0]
    assert r.n_boot == _BOOT_B
    assert r.ci_lo <= r.mean_chars <= r.ci_hi
    assert r.ci_lo < r.ci_hi


def test_bootstrap_weights_match_python_ladder(spark, tmp_path):
    """One replicate's weighted mean recomputed in pure Python from
    the same integer hash ladder — pins the draw, not just the shape."""
    from monasca_aggregator_spark.plans.stats import (
        _BOOT_B,
        _BOOT_CUTS,
        _BOOT_MOD,
        _BOOT_MULT,
        q_quality_bootstrap_ci,
    )

    vals = {i: 100 + 13 * i for i in range(40)}
    rows = [(i, "t", "en", "web", v) for i, v in vals.items()]
    _write(
        spark,
        tmp_path,
        "documents",
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )

    def weight(doc_id, rep):
        h = (doc_id * _BOOT_B + rep) % _BOOT_MOD * _BOOT_MULT % _BOOT_MOD
        for k, c in enumerate(_BOOT_CUTS):
            if h < c:
                return k
        return 6

    means = []
    for rep in range(_BOOT_B):
        num = sum(weight(i, rep) * v for i, v in vals.items())
        den = sum(weight(i, rep) for i in vals)
        if den:
            means.append(num / den)
    means.sort()
    lo, hi = means[1], means[-2]
    r = q_quality_bootstrap_ci(spark, str(tmp_path)).collect()[0]
    assert abs(r.ci_lo - lo) < 1e-6 and abs(r.ci_hi - hi) < 1e-6


def test_nrr_decomposition_closed_form(spark, tmp_path):
    """cust1 100→150 (expansion 50), cust2 100→gone (churn), cust3
    50→20 (contraction 30): Jan base 250, retained 170, NRR 0.68;
    the frontier month (Feb) emits no row — no fake churn."""
    from monasca_aggregator_spark.plans.stats import q_orders_nrr

    jan, feb = (
        datetime(2024, 1, 10, tzinfo=timezone.utc),
        datetime(2024, 2, 15, tzinfo=timezone.utc),
    )
    _write(
        spark,
        tmp_path,
        "orders",
        [
            (1, 1, "O", 100.0, jan, "P"),
            (2, 1, "O", 150.0, feb, "P"),
            (3, 2, "O", 100.0, jan, "P"),
            (4, 3, "O", 50.0, jan, "P"),
            (5, 3, "O", 20.0, feb, "P"),
        ],
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    out = q_orders_nrr(spark, str(tmp_path)).collect()
    assert len(out) == 1  # Feb is the frontier: no next-month data
    r = out[0]
    assert str(r.month) == "2024-01-01"
    assert r.base_customers == 3 and r.base_rev == 250
    assert r.retained_rev == 170 and r.churn_rev == 100
    assert r.expansion_rev == 50 and r.contraction_rev == 30
    assert abs(r.nrr - 0.68) < 1e-9


def test_anomaly_fdr_discovers_injected_spike(spark, tmp_path):
    """BH at α=5%: a 100× spike against a tight leave-one-out
    same-hour-of-day baseline is the family's rank-1 p-value and
    survives the m-way correction; a constant metric contributes
    p=1 cells and zero discoveries. LOO matters: the spiked day must
    not inflate its own σ (include-self caps z at ~√(n−1))."""
    from monasca_aggregator_spark.plans.stats import (
        q_metric_anomaly_fdr,
    )

    events, eid = [], 0
    # spiky: hour 0 of days 1..10 — nine jittered-normal days
    # (100.00 + i cents) and one 10000.00 spike
    for d in range(1, 10):
        events.append(
            (eid, _ts(d), 1, "spiky", 100.0 + d * 0.01, "{}")
        )
        eid += 1
    events.append((eid, _ts(10), 1, "spiky", 10000.0, "{}"))
    eid += 1
    # flat: ten identical days → num=0 → p=1 everywhere
    for d in range(1, 11):
        events.append((eid, _ts(d), 1, "flat", 50.0, "{}"))
        eid += 1
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    out = {
        r["event_type"]: r
        for r in q_metric_anomaly_fdr(spark, str(tmp_path)).collect()
    }
    assert out["spiky"]["n_discoveries"] == 1
    assert out["spiky"]["min_p"] < 1e-6
    assert out["flat"]["n_discoveries"] == 0
    assert out["flat"]["min_p"] == 1.0


def test_lognormal_fit_flags_shape_mismatch(spark, tmp_path):
    """A geometric ladder (exactly lognormal-shaped: ln-lengths
    uniform) has implied≈actual median (ratio ~1); a one-sided
    heavy-tail mixture pushes exp(μ) above the true median."""
    from monasca_aggregator_spark.plans.stats import (
        q_corpus_lognormal_fit,
    )

    docs = []
    did = 0
    # 'clean': lengths 2^5..2^11 — ln symmetric around 2^8=256
    for i, ln_len in enumerate(range(5, 12)):
        docs.append((did, "x", "en", "clean", 2 ** ln_len)); did += 1
    # 'tail': 9 docs at 100 chars + 1 doc at 1e6 → exp(mu) >> median
    for i in range(9):
        docs.append((did, "x", "en", "tail", 100)); did += 1
    docs.append((did, "x", "en", "tail", 1_000_000)); did += 1
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        r["source"]: r
        for r in q_corpus_lognormal_fit(spark, str(tmp_path)).collect()
    }
    clean = out["clean"]
    assert clean.actual_median == 256.0
    assert abs(clean.median_ratio - 1.0) < 0.01
    tail = out["tail"]
    assert tail.actual_median == 100.0
    assert tail.median_ratio > 2.0  # exp(mu) dragged far above median


def test_hill_tail_index_separates_pareto_from_bounded(spark, tmp_path):
    """A geometric (Pareto-like, α=1 in ln-space) tail reads a small
    hill_alpha; a tightly bounded tail (every exceedance barely above
    the threshold) reads a huge one. The threshold is the exact p90
    interpolation in tenths."""
    from monasca_aggregator_spark.plans.stats import q_corpus_hill_tail

    docs, did = [], 0
    # 'heavy': 90 docs at 100 chars, tail 2^k·100 for k=1..10
    for _ in range(90):
        docs.append((did, "x", "en", "heavy", 100)); did += 1
    for k in range(1, 11):
        docs.append((did, "x", "en", "heavy", 100 * 2 ** k)); did += 1
    # 'light': 90 docs at 100 chars, tail all at 101
    for _ in range(90):
        docs.append((did, "x", "en", "light", 100)); did += 1
    for _ in range(10):
        docs.append((did, "x", "en", "light", 101)); did += 1
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    out = {
        r["source"]: r
        for r in q_corpus_hill_tail(spark, str(tmp_path)).collect()
    }
    heavy, light = out["heavy"], out["light"]
    assert heavy.n_tail == 10 and light.n_tail == 10
    # heavy: exceedances 200..102400 over u≈190 → mean ln ratio ≈ 3.4
    assert heavy.hill_alpha < 0.5
    # light: every exceedance is within 1% of u → alpha explodes
    assert light.hill_alpha > 50
