"""Markov removal-effect attribution: hand-computed chain + privacy
gate pins (r9)."""

from __future__ import annotations

from pyspark.sql import functions as F


def test_markov_removal_effect_hand_computed(spark, tmp_path, monkeypatch):
    """A two-channel chain where channel A is on EVERY converting
    path and channel B on none: A's removal effect is 1.0, B's is
    0.0, shares 1/0 — the causal answer position heuristics can't
    see. Journeys (one per user, same day):

      u1: A -> purchase        u2: A -> purchase
      u3: B -> (no purchase)   u4: B -> (no purchase)
    """
    import monasca_aggregator_spark.plans.temporal as T

    rows = []
    base_ms = 1_700_000_000_000
    for uid, (ch, conv) in enumerate(
        [("A", True), ("A", True), ("B", False), ("B", False)], 1
    ):
        rows.append((uid, 1000 + uid, base_ms + uid * 1000, ch))
        if conv:
            rows.append(
                (uid, 2000 + uid, base_ms + uid * 1000 + 500, "purchase")
            )
    df = spark.createDataFrame(
        rows, "user_id long, event_id long, ts_ms long, event_type string"
    ).select(
        "user_id",
        "event_id",
        F.timestamp_millis(F.col("ts_ms")).alias("ts"),
        "event_type",
    )
    monkeypatch.setattr(
        T, "load_table", lambda spark, sf_dir, name, **kw: df
    )
    got = {
        r.channel: r
        for r in T.q_events_attribution_markov(spark, "ignored").collect()
    }
    assert got["A"].removal_effect == 1.0
    assert got["B"].removal_effect == 0.0
    assert got["A"].attribution_share == 1.0
    assert got["B"].attribution_share == 0.0


def test_markov_attribution_deterministic_on_testdata(spark, sf_small):
    """Same input → identical output across reruns (driver solve is
    deterministic), shares sum to 1, effects in [0, 1]."""
    import monasca_aggregator_spark.plans.temporal as T

    a = sorted(
        tuple(r)
        for r in T.q_events_attribution_markov(spark, sf_small).collect()
    )
    b = sorted(
        tuple(r)
        for r in T.q_events_attribution_markov(spark, sf_small).collect()
    )
    assert a == b and a
    shares = [r[2] for r in a if r[2] is not None]
    assert abs(sum(shares) - 1.0) < 1e-4
    assert all(0.0 <= r[1] <= 1.0 for r in a)
