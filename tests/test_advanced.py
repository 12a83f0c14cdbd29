"""Edge semantics for plans/advanced.py on constructed inputs.

Oracle parity at sf0.01 is covered by tools/check_correctness.py; here
each shape is pinned on data where the right answer is known by
construction: IVM merge == direct recompute, overlapping sessions'
true max concurrency, a hand-built basket's lift, a known triangle,
and SCD2 interval closure.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from monasca_aggregator_spark.plans import advanced

UTC = dt.timezone.utc


def _events(spark, rows):
    """rows: (event_id, ts, user_id, event_type, value, props)"""
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )


@pytest.fixture()
def patched_loader(monkeypatch):
    def patch(df):
        monkeypatch.setattr(
            advanced, "load_table",
            lambda spark, sf_dir, name, **kw: df,
        )

    return patch


def test_incremental_merge_equals_direct(spark, patched_loader):
    # events straddling the IVM cutoff; merged partials must equal a
    # direct full-history aggregation bit-for-bit
    c = advanced._IVM_CUTOFF_MS
    base = dt.datetime.fromtimestamp(c / 1000, UTC)
    rows = [
        (i, base + dt.timedelta(hours=h), 1, "m", float(v), "{}")
        for i, (h, v) in enumerate(
            [(-30, 1.25), (-30, 2.5), (-1, 3.0), (0, 4.75), (5, 0.5),
             (5, 1.0)]
        )
    ]
    df = _events(spark, rows)
    patched_loader(df)
    got = advanced.q_agg_incremental_rollup(spark, "x").collect()
    direct = (
        df.groupBy(
            "event_type",
            ((F.unix_millis("ts") / 3600000).cast("long") * 3600000
             ).alias("w"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
            ).alias("s1"),
        )
        .collect()
    )
    want = {
        (r["event_type"], r["w"]): (r["n"], r["s1"] / 100.0)
        for r in direct
    }
    assert len(got) == len(want)
    for r in got:
        n, sv = want[(r["event_type"], r["window_ts_ms"])]
        assert (r["n"], r["sum_value"]) == (n, sv)
        assert r["avg_value"] == sv / n


def test_concurrency_counts_true_overlap(spark, patched_loader):
    # three users: A spans 0-10 min, B 5-15 min, C 40-45 min
    # -> max concurrency 2 (A∩B); C alone later in the same hour.
    base = dt.datetime(2024, 3, 1, tzinfo=UTC)
    rows = []
    eid = 0
    for uid, (m0, m1) in ((1, (0, 10)), (2, (5, 15)), (3, (40, 45))):
        for m in (m0, m1):
            rows.append(
                (eid, base + dt.timedelta(minutes=m), uid, "e", 1.0,
                 "{}")
            )
            eid += 1
    patched_loader(_events(spark, rows))
    out = advanced.q_sessions_concurrency(spark, "x").collect()
    assert len(out) == 1
    assert out[0]["max_concurrent"] == 2


def test_assoc_rules_lift_on_constructed_baskets(spark, patched_loader):
    # 4 baskets: {a,b} x2, {a} x1, {b} x1 -> n_a=3, n_b=3, n_ab=2,
    # support=0.5, conf=2/3 both ways, lift = 2*4/(3*3) = 8/9.
    base = dt.datetime(2024, 3, 1, tzinfo=UTC)
    rows = []
    eid = 0
    baskets = [("a", "b"), ("a", "b"), ("a",), ("b",)]
    for day, items in enumerate(baskets):
        for it in items:
            rows.append(
                (eid, base + dt.timedelta(days=day), 7, it, 1.0, "{}")
            )
            eid += 1
    patched_loader(_events(spark, rows))
    out = advanced.q_events_assoc_rules(spark, "x").collect()
    assert len(out) == 1
    r = out[0]
    assert (r["type_a"], r["type_b"]) == ("a", "b")
    assert (r["n_a"], r["n_b"], r["n_both"]) == (3, 3, 2)
    assert r["support"] == 0.5
    assert r["conf_a_to_b"] == r["conf_b_to_a"] == 2 / 3
    assert r["lift"] == 2 * 4 / 9


def test_triangles_on_known_graph(spark, patched_loader):
    # docs 1,2,3 identical -> clique K3 (one triangle, each vertex in
    # 1); docs 4,5 identical pair -> edge, no triangle; doc 6 alone.
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta", "en", "s", 20),
            (2, "alpha beta gamma delta", "en", "s", 20),
            (3, "alpha beta gamma delta", "en", "s", 20),
            (4, "zeta eta theta iota", "en", "s", 18),
            (5, "zeta eta theta iota", "en", "s", 18),
            (6, "unrelated totally different words here", "en", "s", 30),
        ],
        "doc_id long, text string, lang string, source string, "
        "n_chars long",
    )
    patched_loader(docs)
    out = {
        r["doc_id"]: r["n_triangles"]
        for r in advanced.q_graph_triangles(spark, "x").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1}


def test_scd2_intervals_close_and_stay_open(spark, patched_loader):
    # user 1: k=10 (tier 0) at t0, k=30 (tier 1) at t1, k=35 (tier 1,
    # no change) at t2, k=80 (tier 3) at t3 -> 3 intervals, last open.
    base = dt.datetime(2024, 3, 1, tzinfo=UTC)
    ks = [(0, 10), (1, 30), (2, 35), (3, 80)]
    rows = [
        (i, base + dt.timedelta(hours=h), 1, "e", 1.0, '{"k": %d}' % k)
        for i, (h, k) in enumerate(ks)
    ]
    patched_loader(_events(spark, rows))
    out = sorted(
        advanced.q_scd2_user_tier(spark, "x").collect(),
        key=lambda r: r["valid_from_ms"],
    )
    t = lambda h: int(  # noqa: E731
        (base + dt.timedelta(hours=h)).timestamp() * 1000
    )
    assert [(r["tier"], r["valid_from_ms"], r["valid_to_ms"])
            for r in out] == [
        (0, t(0), t(1)),
        (1, t(1), t(3)),
        (3, t(3), None),
    ]


def test_markov_probabilities_on_constructed_chain(spark, monkeypatch):
    # user path a->b->a->b->a and user path a->c: from 'a' transitions
    # are b,b,c -> P(b|a)=2/3, P(c|a)=1/3; from 'b': a,a -> P(a|b)=1.
    from monasca_aggregator_spark.plans import temporal

    base = dt.datetime(2024, 3, 1, tzinfo=UTC)
    seq1 = ["a", "b", "a", "b", "a"]
    rows = [
        (i, base + dt.timedelta(minutes=i), 1, t, 1.0, "{}")
        for i, t in enumerate(seq1)
    ]
    rows += [
        (10, base, 2, "a", 1.0, "{}"),
        (11, base + dt.timedelta(minutes=1), 2, "c", 1.0, "{}"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string"
    )
    monkeypatch.setattr(
        temporal, "load_table", lambda spark, sf_dir, name: df
    )
    out = {
        (r["from_type"], r["to_type"]): (r["n_trans"], r["p_transition"])
        for r in temporal.q_events_markov(spark, "x").collect()
    }
    assert out[("a", "b")] == (2, 2 / 3)
    assert out[("a", "c")] == (1, 1 / 3)
    assert out[("b", "a")] == (2, 1.0)
    assert ("c", "a") not in out  # chain ends never emit transitions


def test_enrich_scd2_uses_historical_tier(spark, patched_loader):
    # user 1 changes tier mid-history: events BEFORE the change must
    # carry the OLD tier, not the latest — the as-of property.
    base = dt.datetime(2024, 3, 4, tzinfo=UTC)  # epoch-aligned day
    rows = [
        (0, base + dt.timedelta(hours=1), 1, "e", 1.0, '{"k": 10}'),
        (1, base + dt.timedelta(hours=2), 1, "e", 1.0, '{"k": 10}'),
        (2, base + dt.timedelta(days=1), 1, "e", 1.0, '{"k": 80}'),
    ]
    patched_loader(_events(spark, rows))
    out = {
        (r["tier"], r["day_ms"]): r["n_events"]
        for r in advanced.q_events_enrich_scd2(spark, "x").collect()
    }
    d0 = int(base.timestamp() * 1000)
    d1 = d0 + 86400000
    assert out == {(0, d0): 2, (3, d1): 1}


def test_retention_bitmap_equals_direct_distinct(spark, sf_small):
    """The bitmap algebra must reproduce the straightforward
    formulation: cohort = each user's first active day; retained(c, k)
    = distinct cohort-c users active on day c+k."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.plans.advanced import (
        q_events_retention_bitmap,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    got = {
        (r.cohort_day, r.day_offset): r.retained
        for r in q_events_retention_bitmap(spark, sf_small).collect()
    }
    ev = load_table(spark, sf_small, "events").select(
        "user_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day"),
    ).distinct()
    first = ev.groupBy("user_id").agg(F.min("day").alias("cohort"))
    direct = {
        (r.cohort, r.day - r.cohort): r.n
        for r in ev.join(first, "user_id")
        .groupBy("cohort", "day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    # bitmap result enumerates all offsets (zeros included); the direct
    # form only has active cells — every nonzero cell must agree and
    # every direct cell must appear
    for cell, n in direct.items():
        assert got[cell] == n, cell
    for cell, n in got.items():
        if n:
            assert direct[cell] == n, cell


def test_cdc_apply_delete_removes_key(spark, tmp_path):
    """A user whose LAST changelog entry is a delete must be absent
    from the applied state; earlier deletes are overridden by later
    upserts."""
    import datetime as dt

    import pandas as pd

    from monasca_aggregator_spark.plans.advanced import q_cdc_apply_latest

    t0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1: signup → update → error(delete) ⇒ absent
        (1, t0, 1, "signup", 1.0, "{}"),
        (2, t0 + dt.timedelta(minutes=1), 1, "click", 2.0, "{}"),
        (3, t0 + dt.timedelta(minutes=2), 1, "error", 0.0, "{}"),
        # user 2: error(delete) → purchase ⇒ present, last value 9.5
        (4, t0, 2, "error", 0.0, "{}"),
        (5, t0 + dt.timedelta(minutes=1), 2, "purchase", 9.5, "{}"),
    ]
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    out = {r.user_id: r for r in q_cdc_apply_latest(spark, str(tmp_path)).collect()}
    assert 1 not in out
    assert out[2].last_value == 9.5 and out[2].last_op == "U"
    assert out[2].n_changes == 2


def test_curation_funnel_first_failing_reason(spark, tmp_path):
    import pandas as pd

    from monasca_aggregator_spark.plans.pipeline_ops import q_curation_funnel

    docs = [
        # too_short wins even though it would also fail low_stopword
        (0, "tiny doc", "en", "s", 8),
        # >=10 tokens, >20% punct chars → high_punct
        (1, "a b c d e f g h i j !!!! ;;;; ???? %%%% ****", "en", "s", 44),
        # >=10 tokens, clean, no stopwords → low_stopword
        (2, "alpha beta gamma delta epsilon zeta eta iota kappa lambda mu", "en", "s", 61),
        # >=10 tokens with plenty of stopwords → kept
        (3, "the cat sat on the mat and the dog sat on the log today", "en", "s", 56),
    ]
    pd.DataFrame(
        docs, columns=["doc_id", "text", "lang", "source", "n_chars"]
    ).to_parquet(tmp_path / "documents.parquet")
    rep = {
        r.reason: r.n_docs
        for r in q_curation_funnel(spark, str(tmp_path)).collect()
    }
    assert rep == {"too_short": 1, "high_punct": 1, "low_stopword": 1, "kept": 1}


def test_theilsen_robust_to_outlier(spark, tmp_path):
    """One corrupted hour swings OLS hard but barely moves Theil–Sen."""
    import datetime as dt

    import pandas as pd

    from monasca_aggregator_spark.plans.series_ext import (
        q_metric_trend,
        q_metric_trend_theilsen,
    )

    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for h in range(24):
        v = 10.0 + h  # clean slope: +1/hour
        if h == 23:
            v = 10000.0  # corrupted final hour
        rows.append((h, t0 + dt.timedelta(hours=h), 1, "click", v, "{}"))
    pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value", "props"],
    ).to_parquet(tmp_path / "events.parquet")
    ts = q_metric_trend_theilsen(spark, str(tmp_path)).collect()[0]
    ols = q_metric_trend(spark, str(tmp_path)).collect()[0]
    assert abs(ts.slope_per_hour - 1.0) < 1.1  # near the true slope
    assert ols.slope_per_hour > 100  # OLS dragged by the outlier
