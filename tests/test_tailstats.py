"""plans/tailstats.py semantics pins on hand-built data. The DuckDB
oracle gate covers full-output parity at sf0.01; these pin the
behaviors a hash can't explain: the Gumbel moment fit against a
hand-computed reference, cointegration flagging a constructed
equilibrium pair (and NOT flagging independent walks), the Croston
fold against a hand-run integer SES, and the Shapley values against
the textbook coalition computation (plus efficiency)."""

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


def test_gumbel_fit_matches_hand_computed_moments(spark, tmp_path):
    """On a series whose daily maxima are a known arithmetic ramp the
    MoM fit reproduces the hand-computed μ/β, the 30-day return level
    sits ABOVE the fitted location, and a constant-maxima series is
    degenerate (NULLs)."""
    # 20 days × 24 h; hour h of day d carries d+1 units at noon so the
    # daily max ramp is exactly 1, 2, ..., 20
    ramp, flat = [], []
    for d in range(20):
        for h in range(24):
            ramp.append(float(d + 1) if h == 12 else 0.5)
            flat.append(7.0 if h == 12 else 0.5)
    _write_events(
        spark, tmp_path, _series_events({"ramp": ramp, "flat": flat})
    )
    from monasca_aggregator_spark.plans.tailstats import (
        q_metric_extreme_value,
    )

    out = {
        r.event_type: r
        for r in q_metric_extreme_value(spark, str(tmp_path)).collect()
    }
    maxima = list(range(1, 21))
    n = len(maxima)
    mean = sum(maxima) / n
    var = sum((x - mean) ** 2 for x in maxima) / (n - 1)
    beta = math.sqrt(var) * math.sqrt(6) / math.pi
    mu = mean - 0.5772156649015329 * beta
    r = out["ramp"]
    assert r.n_days == 20
    assert abs(r.gumbel_beta - beta) < 1e-3
    assert abs(r.gumbel_mu - mu) < 1e-3
    assert r.return_level_30d > r.gumbel_mu
    # the observed max of a 20-day sample should not be implausible
    assert 0.0 < r.exceed_prob_max < 1.0
    f = out["flat"]
    assert f.gumbel_mu is None and f.return_level_30d is None


def test_cointegration_flags_equilibrium_not_independent(
    spark, tmp_path
):
    """y = 2x + bounded alternation shares a long-run equilibrium with
    x → 'cointegrated' with hedge_beta ≈ 2; an independent
    deterministic walk against x does not."""
    import random

    n = 240
    rng = random.Random(42)
    # genuine random walks (seeded): a cyclic pseudo-walk would be
    # mean-reverting and cointegrate with anything
    x, acc = [], 500.0
    for _ in range(n):
        acc += rng.choice([-3.0, -1.0, 1.0, 3.0])
        x.append(acc)
    y = [2.0 * v + (1.0 if h % 2 else -1.0) for h, v in enumerate(x)]
    z, acc2 = [], 500.0
    for _ in range(n):
        acc2 += rng.choice([-3.0, -1.0, 1.0, 3.0])
        z.append(acc2)
    _write_events(
        spark, tmp_path, _series_events({"ax": x, "by": y, "cz": z})
    )
    from monasca_aggregator_spark.plans.tailstats import (
        q_metric_cointegration,
    )

    out = {
        (r.metric_a, r.metric_b): r
        for r in q_metric_cointegration(spark, str(tmp_path)).collect()
    }
    pair = out[("ax", "by")]
    assert pair.verdict == "cointegrated"
    assert abs(pair.hedge_beta - 2.0) < 0.01
    assert pair.adf_t < -3.34
    indep = out[("ax", "cz")]
    assert indep.verdict == "not_cointegrated"


def _hand_croston(demands_e2, months, alpha_den=10):
    """Reference integer fold: e6 state, round-half-up SES steps."""
    z = demands_e2[0] * 10000
    p = None
    pm = months[0]
    for d, m in zip(demands_e2[1:], months[1:]):
        q = (m - pm) * 1000000
        if p is None:
            p = q
        z = (9 * z + d * 10000 + 5) // 10
        p = (9 * p + q + 5) // 10
        pm = m
    return z / 1e6 / 100.0, p / 1e6


def test_croston_fold_matches_hand_run_integer_ses(spark, tmp_path):
    """One brand with demands at months 0,1,3,6 (sizes 10,20,40,80)
    reproduces the hand-run integer fold exactly; a single-demand
    brand is excluded (needs ≥ 2 demand months)."""
    li, part = [], [(1, "p", "B_main", "t", 1, 10.0), (2, "p", "B_one", "t", 1, 10.0)]
    lk = 0
    for m, qty in [(0, 10.0), (1, 20.0), (3, 40.0), (6, 80.0)]:
        li.append(
            (
                lk, 1, 1, 1, qty, qty * 10, 0.0, 0.0, "N", "O",
                datetime(2024, 1 + m, 15, tzinfo=timezone.utc),
            )
        )
        lk += 1
    li.append(
        (
            lk, 2, 1, 1, 5.0, 50.0, 0.0, 0.0, "N", "O",
            datetime(2024, 3, 15, tzinfo=timezone.utc),
        )
    )
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
    from monasca_aggregator_spark.plans.tailstats import q_demand_croston

    rows = q_demand_croston(spark, str(tmp_path)).collect()
    out = {r.brand: r for r in rows}
    assert "B_one" not in out  # single demand month: no interval
    z_ref, p_ref = _hand_croston([1000, 2000, 4000, 8000], [0, 1, 3, 6])
    r = out["B_main"]
    assert r.n_demand_months == 4
    assert abs(r.size_hat - round(z_ref, 4)) < 1e-9
    assert abs(r.interval_hat - round(p_ref, 4)) < 1e-9
    assert abs(r.croston_forecast - r.size_hat / r.interval_hat) < 1e-3
    assert abs(r.sba_forecast - 0.95 * r.croston_forecast) < 1e-3


def test_shapley_matches_textbook_coalitions(spark, tmp_path):
    """Journeys {A}×2 (1 converts) and {A,B}×1 (converts): v(A)=0.5,
    v(AB)=1, v(B)=v(∅)=0 → φ_A = 0.75, φ_B = 0.25, and the values
    sum to v(grand coalition) (efficiency)."""
    rows = [
        # u1: A then purchase
        (0, _ts(0), 1, "click", 1.0, "{}"),
        (1, _ts(1), 1, "purchase", 1.0, "{}"),
        # u2: A, never purchases
        (2, _ts(0), 2, "click", 1.0, "{}"),
        # u3: A and B then purchase
        (3, _ts(0), 3, "click", 1.0, "{}"),
        (4, _ts(1), 3, "view", 1.0, "{}"),
        (5, _ts(2), 3, "purchase", 1.0, "{}"),
    ]
    _write_events(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.tailstats import (
        q_events_attribution_shapley,
    )

    out = {
        r.channel: r
        for r in q_events_attribution_shapley(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(out) == {"click", "view"}
    assert out["click"].n_journeys == 3
    assert out["click"].n_conversions == 2
    assert abs(out["click"].shapley_value - 0.75) < 1e-9
    assert abs(out["view"].shapley_value - 0.25) < 1e-9
    # efficiency: Σφ = v(grand coalition) = conversion rate of {A,B}
    total = out["click"].shapley_value + out["view"].shapley_value
    assert abs(total - 1.0) < 1e-9


def test_shapley_touches_after_first_purchase_do_not_count(
    spark, tmp_path
):
    """Only touches STRICTLY BEFORE the first purchase form the
    journey; a user whose only touch comes after their purchase
    contributes no journey for it."""
    rows = [
        (0, _ts(0), 1, "purchase", 1.0, "{}"),
        (1, _ts(1), 1, "click", 1.0, "{}"),  # after purchase: ignored
        (2, _ts(0), 2, "view", 1.0, "{}"),  # no purchase: journey, conv 0
    ]
    _write_events(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.tailstats import (
        q_events_attribution_shapley,
    )

    rows_out = q_events_attribution_shapley(spark, str(tmp_path)).collect()
    out = {r.channel: r for r in rows_out}
    # u1 has no pre-purchase touches → no journey; u2's {view} journey
    # never converts → every marginal is 0
    assert out["view"].n_journeys == 1
    assert out["view"].n_conversions == 0
    assert all(abs(r.shapley_value) < 1e-12 for r in rows_out)


def _write_li_orders_part(spark, tmp_path, li, orders, part):
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        orders,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        part,
        "p_partkey long, p_name string, p_brand string, p_type string,"
        " p_size int, p_retailprice double",
    ).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))


def test_safety_stock_matches_hand_formulas(spark, tmp_path):
    """One brand shipping 10 units every week for 10 weeks with a
    constant 14-day order→ship lead reproduces the textbook numbers:
    σ_w from the sparse-sum formula over the GLOBAL span, SS =
    1.6449·σ·√2, ROP = μ·2 + SS; a non-causal line (ship < order)
    stays OUT of the lead estimate but IN the demand series."""
    from datetime import timedelta

    base = datetime(2024, 1, 7, tzinfo=timezone.utc)
    li, orders = [], []
    for wk in range(10):
        ship = base + timedelta(weeks=wk)
        li.append(
            (wk, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", ship)
        )
        orders.append(
            (wk, 1, "O", 100.0, ship - timedelta(days=14), "1-URGENT")
        )
    # non-causal: order AFTER ship — excluded from lead, counted in demand
    li.append((99, 1, 1, 1, 10.0, 100.0, 0.0, 0.0, "N", "O", base))
    orders.append(
        (99, 1, "O", 100.0, base + timedelta(days=30), "1-URGENT")
    )
    part = [(1, "p", "B", "t", 1, 10.0)]
    _write_li_orders_part(spark, tmp_path, li, orders, part)
    from monasca_aggregator_spark.plans.tailstats import (
        q_brand_safety_stock,
    )

    rows = q_brand_safety_stock(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.lead_days == 14.0  # the non-causal line is excluded
    # demand: week 0 carries 20 (ramp line + non-causal line), weeks
    # 1..9 carry 10 each over W = span weeks
    w = r.n_weeks
    demands = [20.0] + [10.0] * 9 + [0.0] * (w - 10)
    mu = sum(demands) / w
    var = sum((d - mu) ** 2 for d in demands) / (w - 1)
    assert abs(r.mu_week - round(mu, 4)) < 1e-9
    assert abs(r.sigma_week - math.sqrt(var)) < 1e-3
    lead_w = 2.0
    ss = 1.6449 * r.sigma_week * math.sqrt(lead_w)
    assert abs(r.safety_stock - ss) < 1e-3
    assert abs(r.reorder_point - (r.mu_week * lead_w + ss)) < 2e-3


def test_sample_entropy_zero_for_periodic_positive_for_noise(
    spark, tmp_path
):
    """A strict period-2 alternation has A = B (every first-2 match
    extends to the 3rd point) → SampEn = 0; a deterministic noisy
    series has A < B → SampEn > 0."""
    n = 96
    periodic = [10.0 if h % 2 else 90.0 for h in range(n)]
    noisy = [
        50.0 + math.sin(h * 1.9) * 30 + (h * 11 % 13) * 3
        for h in range(n)
    ]
    _write_events(
        spark,
        tmp_path,
        _series_events({"periodic": periodic, "noisy": noisy}),
    )
    from monasca_aggregator_spark.plans.tailstats import (
        q_metric_sample_entropy,
    )

    out = {
        r.event_type: r
        for r in q_metric_sample_entropy(spark, str(tmp_path)).collect()
    }
    p = out["periodic"]
    assert p.a_matches == p.b_matches > 0
    assert p.sampen == 0.0
    nz = out["noisy"]
    assert nz.sampen is None or nz.sampen > 0.0


def test_richclub_dense_core_reads_phi_one(spark, tmp_path):
    """A 4-part clique (every pair co-ordered twice) plus 12 spoke
    parts each co-ordered twice with ONE core part: at the top degree
    percentile only the core qualifies and φ = 1.0; φ never decreases
    toward higher thresholds on this graph."""
    li, ok = [], 0
    core = [1, 2, 3, 4]
    # clique: each core pair appears in 2 orders
    for rep in range(2):
        for i in range(4):
            for j in range(i + 1, 4):
                for p in (core[i], core[j]):
                    li.append(
                        (
                            ok, p, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
                            datetime(2024, 1, 10, tzinfo=timezone.utc),
                        )
                    )
                ok += 1
    # spokes: parts 10..21, each twice with core part 1
    for s in range(10, 22):
        for rep in range(2):
            for p in (1, s):
                li.append(
                    (
                        ok, p, 1, 1, 1.0, 10.0, 0.0, 0.0, "N", "O",
                        datetime(2024, 1, 10, tzinfo=timezone.utc),
                    )
                )
            ok += 1
    spark.createDataFrame(
        li,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    from monasca_aggregator_spark.plans.tailstats import q_graph_richclub

    rows = q_graph_richclub(spark, str(tmp_path)).collect()
    assert [r.deg_percentile for r in rows] == [25, 50, 75, 90]
    # degrees: part 1 has 15, parts 2-4 have 3, spokes have 1 →
    # sorted degs = [1×12, 3×3, 15]; p90 position ceil(0.9·16)=15 → k=3
    top = rows[-1]
    assert top.k == 3
    assert top.n_k == 1  # only part 1 exceeds k=3 → φ undefined
    assert top.phi is None
    # p75: position 12 → k=1; club = parts 2,3,4 (deg 3) + part 1 →
    # clique of 4 → φ = 1.0
    p75 = rows[2]
    assert p75.k == 1 and p75.n_k == 4 and p75.e_k == 6
    assert p75.phi == 1.0
    phis = [r.phi for r in rows if r.phi is not None]
    assert phis == sorted(phis)  # non-decreasing toward the core


def test_design_effect_orderings_and_proportional_value(
    spark, tmp_path
):
    """Two strata — one varied, one constant: DEFF(neyman) ≤
    DEFF(proportional) ≤ 1, and DEFF(proportional) equals the
    within-stratum variance share Σ(N_h/N)σ²_h / σ²_tot exactly."""
    rows = []
    i = 0
    lens_a = [100, 300, 500, 700, 900, 1100] * 5  # varied
    for ln in lens_a:
        rows.append((i, "x", "en", "varied", ln))
        i += 1
    for _ in range(30):
        rows.append((i, "x", "en", "constant", 400))
        i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_sample_design_effect,
    )

    out = {
        r.design: r
        for r in q_sample_design_effect(spark, str(tmp_path)).collect()
    }
    assert set(out) == {"equal", "neyman", "proportional"}
    assert out["neyman"].deff <= out["proportional"].deff <= 1.0
    # hand value for proportional: within-variance share
    all_lens = lens_a + [400] * 30
    n_tot = len(all_lens)
    mu = sum(all_lens) / n_tot
    var_tot = sum((x - mu) ** 2 for x in all_lens) / n_tot
    mu_a = sum(lens_a) / len(lens_a)
    var_a = sum((x - mu_a) ** 2 for x in lens_a) / len(lens_a)
    expected = (len(lens_a) / n_tot) * var_a / var_tot
    assert abs(out["proportional"].deff - expected) < 1e-3
    assert out["neyman"].n_eff >= out["proportional"].n_eff


def test_friedman_flags_dow_effect_within_hod_blocks(spark, tmp_path):
    """A metric that is always highest on one weekday (inside every
    hour-of-day block) maxes the Friedman Q → 'dow_effect'; a
    deterministic noise metric with no weekday structure does not."""
    n_days = 28
    spike, flat = [], []
    for d in range(n_days):
        for h in range(24):
            spike.append(100.0 if d % 7 == 2 else 10.0 + (d * 24 + h) % 5)
            flat.append(10.0 + ((d * 24 + h) * 7) % 11)
    _write_events(
        spark, tmp_path, _series_events({"spike": spike, "flat": flat})
    )
    from monasca_aggregator_spark.plans.tailstats import q_metric_friedman

    out = {
        r.event_type: r
        for r in q_metric_friedman(spark, str(tmp_path)).collect()
    }
    assert out["spike"].n_blocks == 24
    assert out["spike"].verdict == "dow_effect"
    # one treatment always ranked top: Q at its k=7 maximum region
    assert out["spike"].q_stat > 20
    assert out["flat"].verdict == "no_dow_effect"


def test_granger_directed_cause_detected_not_reversed(spark, tmp_path):
    """y_t = 0.5·y_{t−1} + 2·x_{t−1} + tiny wiggle with i.i.d.-ish x:
    x→y reads granger_causes with γ ≈ 2; the reverse direction finds
    no evidence."""
    import random

    rng = random.Random(7)
    n = 400
    x = [100.0 + rng.choice([-30.0, -10.0, 10.0, 30.0]) for _ in range(n)]
    y = [100.0]
    for t in range(1, n):
        y.append(0.5 * y[t - 1] + 2.0 * x[t - 1] + (1.0 if t % 2 else -1.0))
    _write_events(
        spark, tmp_path, _series_events({"xcause": x, "yeffect": y})
    )
    from monasca_aggregator_spark.plans.tailstats import q_metric_granger

    out = {
        (r.cause, r.effect): r
        for r in q_metric_granger(spark, str(tmp_path)).collect()
    }
    fwd = out[("xcause", "yeffect")]
    assert fwd.verdict == "granger_causes"
    assert abs(fwd.cross_lag_coef - 2.0) < 0.05
    rev = out[("yeffect", "xcause")]
    assert rev.verdict == "no_evidence"


def test_sprt_null_never_rejects_strong_effect_rejects_early(
    spark, tmp_path
):
    """A/A data (conversion independent of the user_id%2 arm) keeps
    the always-valid p at 1 with no rejection day; a deterministic
    always-converts-vs-never arm split rejects and stamps
    first_rejection on every row."""
    rows, eid = [], 0
    for day in range(10):
        for u in range(1, 41):
            rows.append(
                (eid, _ts(day * 24), u, "view", 1.0, "{}")
            )
            eid += 1
            # null: 50% convert in BOTH arms (u%4 < 2 picks half of
            # each u%2 arm) → θ̂ = 0 exactly, Λ < 1, p pegged at 1
            if u % 4 < 2:
                rows.append(
                    (eid, _ts(day * 24 + 1), u, "purchase", 1.0, "{}")
                )
                eid += 1
    _write_events(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.tailstats import q_events_ab_sprt

    out = q_events_ab_sprt(spark, str(tmp_path)).collect()
    assert all(r.first_rejection is None for r in out)
    assert all(r.always_valid_p == 1.0 for r in out)

    # strong effect: odd users (arm 1) convert, even users never
    rows2, eid = [], 0
    for day in range(10):
        for u in range(1, 81):
            rows2.append((eid, _ts(day * 24), u, "view", 1.0, "{}"))
            eid += 1
            if u % 2 == 1:
                rows2.append(
                    (eid, _ts(day * 24 + 1), u, "purchase", 1.0, "{}")
                )
                eid += 1
    tmp2 = tmp_path / "strong"
    tmp2.mkdir()
    _write_events(spark, tmp2, rows2)
    out2 = sorted(
        q_events_ab_sprt(spark, str(tmp2)).collect(),
        key=lambda r: r.day,
    )
    assert out2[-1].first_rejection is not None
    assert out2[-1].lift == 1.0
    assert out2[-1].always_valid_p < 0.05


def test_amoc_locates_constructed_level_shift(spark, tmp_path):
    """A series that steps 10 → 50 at hour 60 of 120 puts the argmax
    split exactly at the boundary with the two segment means and a
    variance_reduction ≈ 1; a constant series reports NULL
    reduction."""
    n = 120
    step = [10.0 if h < 60 else 50.0 for h in range(n)]
    const = [7.0] * n
    _write_events(
        spark, tmp_path, _series_events({"step": step, "const": const})
    )
    from monasca_aggregator_spark.plans.tailstats import (
        q_metric_amoc_changepoint,
    )

    out = {
        r.event_type: r
        for r in q_metric_amoc_changepoint(spark, str(tmp_path)).collect()
    }
    s = out["step"]
    # split AFTER hour index 59: the best cut has 60 hours before
    assert s.n_before == 60 and s.n_after == 60
    assert s.mean_before == 10.0 and s.mean_after == 50.0
    assert s.variance_reduction > 0.999
    assert out["const"].variance_reduction is None


def test_juilland_d_high_for_even_low_for_concentrated(
    spark, tmp_path
):
    """A word appearing equally in every source scores D ≈ 1; a word
    living in ONE source scores low D with n_sources = 1."""
    rows, i = [], 0
    for src in ("s1", "s2", "s3", "s4"):
        for _ in range(5):
            text = "common common common " + (
                "rare rare rare" if src == "s1" else "filler fill pad"
            )
            rows.append((i, text, "en", src, len(text)))
            i += 1
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from monasca_aggregator_spark.plans.tailstats import (
        q_text_dispersion_juilland,
    )

    out = {
        r.word: r
        for r in q_text_dispersion_juilland(spark, str(tmp_path)).collect()
    }
    assert out["common"].n_sources == 4
    assert out["common"].juilland_d > 0.99
    assert out["rare"].n_sources == 1
    assert out["rare"].juilland_d < 0.05


def test_temporal_split_boundary_and_spanning_users(spark, tmp_path):
    """10 days × 10 events/day: the 80th-percentile boundary lands on
    day 7 (0-indexed day 8 reaches cum 80%); a user active on both
    sides counts as spanning, one wholly inside train does not."""
    rows, eid = [], 0
    for d in range(10):
        for i in range(10):
            # user 1 is active every day (spans); user 2 only days 0-2
            u = 1 if i < 5 else (2 if d < 3 else 3)
            rows.append((eid, _ts(d * 24 + i), u, "view", 1.0, "{}"))
            eid += 1
    _write_events(spark, tmp_path, rows)
    from monasca_aggregator_spark.plans.tailstats import (
        q_split_temporal_leakage,
    )

    r = q_split_temporal_leakage(spark, str(tmp_path)).collect()[0]
    # cumulative hits 80 of 100 events at day index 7 (days 0..7)
    assert r.n_train_events == 80 and r.n_test_events == 20
    assert r.n_spanning_users >= 1
    # user 2's last event is day 2 (train side): not spanning
    assert r.n_spanning_users < r.n_train_users
    assert 0.0 < r.leakage_frac <= 1.0


def test_gate_kappa_identical_gates_read_one(spark, tmp_path):
    """Documents engineered so the two gates AGREE on every row
    (long docs also pass quality, short fail both) → κ = 1; then a
    corpus where the length gate fires on a quality-failing doc
    pushes κ below 1."""
    # quality = .4*stop_ratio + .3*min(n_tokens/100,1) + .3*(1-punct)
    good = ("the a of and to in is " * 40).strip()  # long, stopword-rich
    bad = "zzz. qqq. vvv."  # short, punctuated, no stopwords
    rows = [(i, good, "en", "s", len(good)) for i in range(10)]
    rows += [(10 + i, bad, "en", "s", len(bad)) for i in range(10)]
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    from monasca_aggregator_spark.plans.tailstats import (
        q_quality_gate_kappa,
    )

    r = q_quality_gate_kappa(spark, str(tmp_path)).collect()[0]
    assert r.both_keep == 10 and r.both_drop == 10
    assert r.len_only == 0 and r.quality_only == 0
    assert r.kappa == 1.0

    # long but junk text: length gate keeps, quality gate drops
    junk = ("zzz. " * 80).strip()
    rows2 = rows + [(100 + i, junk, "en", "s", len(junk)) for i in range(5)]
    tmp2 = tmp_path / "mixed"
    tmp2.mkdir()
    spark.createDataFrame(
        rows2, "doc_id long, text string, lang string, source string,"
        " n_chars long"
    ).write.mode("overwrite").parquet(str(tmp2 / "documents.parquet"))
    r2 = q_quality_gate_kappa(spark, str(tmp2)).collect()[0]
    assert r2.len_only == 5
    assert r2.kappa < 1.0


def test_haar_topk_finds_the_step_at_the_right_scale(spark, tmp_path):
    """A series that is 0 for 64 hours then 100 for 64 hours puts its
    dominant Haar coefficient exactly at scale 128 starting at the
    series origin, with the step magnitude, and it carries (nearly)
    all the detail energy."""
    n = 128
    step = [0.0] * 64 + [100.0] * 64
    _write_events(spark, tmp_path, _series_events({"step": step}))
    from monasca_aggregator_spark.plans.tailstats import (
        q_metric_haar_topk,
    )

    rows = q_metric_haar_topk(spark, str(tmp_path)).collect()
    top = [r for r in rows if r.rk == 1][0]
    assert top.scale_hours == 128
    assert top.block_start_hour == 0
    # unnormalized d = 0·64 − 100·64 = −6400; coef = d/√128
    assert abs(top.coef_norm - (-6400.0 / math.sqrt(128.0))) < 0.01
    assert top.energy_share > 0.99


def test_western_electric_rules_fire_on_constructed_patterns(
    spark, tmp_path
):
    """An 8-run above the mean fires R4 (and only at the 8th point);
    a single extreme outlier fires R1; a clean alternating series
    fires neither."""
    # base: alternation around 50 (keeps σ honest), then 8 points at 60
    base = [40.0, 60.0] * 30
    run8 = base + [70.0] * 8
    spike = base + [5000.0]
    alt = base
    _write_events(
        spark,
        tmp_path,
        _series_events({"run8": run8, "spike": spike, "alt": alt}),
    )
    from monasca_aggregator_spark.plans.tailstats import (
        q_metric_western_electric,
    )

    out = {
        r.event_type: r
        for r in q_metric_western_electric(spark, str(tmp_path)).collect()
    }
    assert out["run8"].n_eight_one_side >= 1
    assert out["spike"].n_beyond_3s >= 1
    a = out["alt"]
    assert (
        a.n_beyond_3s == 0
        and a.n_eight_one_side == 0
        and a.n_two_of_three_2s == 0
    )


def test_pinball_rewards_calibrated_quantile(spark, tmp_path):
    """On a strictly periodic series where the trailing-28 p90 is the
    26th sorted value, the forecast and coverage are exactly
    derivable; a series with one huge late spike pays the 9× under-
    forecast penalty visibly in its mean loss."""
    n = 100
    # repeat 1..28 so the trailing-28 frame is always a permutation
    # of 1..28 → forecast = sorted[26] = 26
    periodic = [float((h % 28) + 1) for h in range(n)]
    spiky = periodic[:]
    spiky[90] = 1000.0
    _write_events(
        spark,
        tmp_path,
        _series_events({"periodic": periodic, "spiky": spiky}),
    )
    from monasca_aggregator_spark.plans.tailstats import (
        q_metric_pinball_backtest,
    )

    out = {
        r.event_type: r
        for r in q_metric_pinball_backtest(spark, str(tmp_path)).collect()
    }
    p = out["periodic"]
    assert p.n_scored == n - 28
    # exact expectation over the 72 SCORED hours (not a whole number
    # of periods), forecast is always the 26th sorted value = 26
    ys = [float((h % 28) + 1) for h in range(28, n)]
    losses = [
        (0.9 * (y - 26) if y >= 26 else 0.1 * (26 - y)) for y in ys
    ]
    assert abs(p.mean_pinball_loss - sum(losses) / len(ys)) < 1e-3
    cov = sum(1 for y in ys if y <= 26) / len(ys)
    assert abs(p.coverage - cov) < 1e-3
    assert out["spiky"].mean_pinball_loss > p.mean_pinball_loss + 5
