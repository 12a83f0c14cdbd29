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
