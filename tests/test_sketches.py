"""Sketch aggregates — the bounded-state swaps SURVEY notes for the
exact window aggregations (approx_percentile/t-digest for median,
approx_count_distinct/HLL++ for cardinality) must land within their
documented error bounds of the exact answers on real data."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.sources.envelope import events_to_envelopes
from monasca_aggregator_spark.sources.tables import load_table


def test_approx_percentile_within_accuracy(spark, sf_small):
    env = events_to_envelopes(load_table(spark, sf_small, "events"))
    vals = env.filter(F.col("name") == "view")
    row = vals.agg(
        F.expr("percentile(value, 0.95)").alias("exact"),
        F.expr("approx_percentile(value, 0.95, 10000)").alias("approx"),
        F.count(F.lit(1)).alias("n"),
    ).first()
    # accuracy parameter 10000 → rank error ≤ n/10000
    assert row.n > 100
    rank_tolerance = row.n / 10000 + 1
    # convert rank tolerance to a value bound via the empirical quantiles
    lo, hi = vals.approxQuantile(
        "value", [max(0.0, 0.95 - rank_tolerance / row.n) - 0.01,
                  min(1.0, 0.95 + rank_tolerance / row.n) + 0.01], 0.0
    )
    assert lo <= row.approx <= hi


def test_approx_count_distinct_within_rsd(spark, sf_small):
    env = events_to_envelopes(load_table(spark, sf_small, "events"))
    users = env.select(F.col("dimensions").getItem("user_id").alias("u"))
    row = users.agg(
        F.count_distinct("u").alias("exact"),
        F.approx_count_distinct("u", rsd=0.02).alias("approx"),
    ).first()
    # HLL++ rsd 2% → allow 4 standard deviations
    assert abs(row.approx - row.exact) <= max(4, 0.08 * row.exact)


def test_cosine_zero_vector_is_null_not_error(spark):
    """Zero-magnitude embeddings must not poison ANN results (the
    division guard yields NULL, which sorts last under DESC)."""
    from monasca_aggregator_spark.functions.vectors import as_double, cosine

    df = spark.createDataFrame(
        [([0.0, 0.0],), ([1.0, 0.0],)], "v array<double>"
    )
    a = df.select(
        cosine(as_double(F.col("v")), F.array(F.lit(1.0), F.lit(0.0))).alias(
            "c"
        )
    ).collect()
    assert a[1].c == 1.0
    assert a[0].c is None or a[0].c != a[0].c  # null or NaN, never a crash


def test_sketch_query_variants_equal_exact_at_small_n(spark, sf_small):
    """The driver-facing sketch queries (agg_distinct_hll,
    agg_p95_sketch) are exact below their sparse/sample thresholds —
    at test SF they must equal their exact counterparts row-for-row."""
    from monasca_aggregator_spark.plans import metrics

    hll = {
        r.window_ts_ms: r.distinct_users
        for r in metrics.q_agg_distinct_hll(spark, sf_small).collect()
    }
    exact = {
        r.window_ts_ms: r.distinct_users
        for r in metrics.q_agg_distinct_users(spark, sf_small).collect()
    }
    assert hll == exact

    p95 = metrics.q_agg_p95_sketch(spark, sf_small)
    rows = {r.window_ts_ms: r.p95_value for r in p95.collect()}
    assert len(rows) > 10 and all(v is not None for v in rows.values())


def test_hll_rollup_merge_equals_direct_daily(spark, sf_small):
    """Sketch mergeability: daily estimate from unioned hourly sketches
    must equal the estimate of a sketch built directly over the day."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.tables import load_table

    ev = load_table(spark, sf_small, "events").filter(
        F.col("event_type") == "click"
    )
    hour = (F.unix_millis("ts") / F.lit(3600000)).cast("long")
    day = F.floor(hour / 24)
    merged = (
        ev.groupBy(hour.alias("h"))
        .agg(F.hll_sketch_agg(F.col("user_id"), 14).alias("sk"))
        .groupBy(F.floor(F.col("h") / 24).alias("d"))
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("est"))
    )
    direct = ev.groupBy(day.alias("d")).agg(
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), 14)).alias(
            "est"
        )
    )
    m = {r.d: r.est for r in merged.collect()}
    d = {r.d: r.est for r in direct.collect()}
    assert m == d and m


def test_sketch_error_report_shows_precision_monotonicity(spark, sf_small):
    """The accuracy gate must (a) cover every method, (b) show the
    error curve moving the right way along each precision dial —
    finer precision never means larger mean error on the same data."""
    from monasca_aggregator_spark.plans.metrics import q_sketch_error_report

    rows = {
        (r.method, r.param): r
        for r in q_sketch_error_report(spark, sf_small).collect()
    }
    assert set(rows) == {
        ("hll++", "rsd=0.05"), ("hll++", "rsd=0.15"),
        ("ds_hll", "lgK=6"), ("ds_hll", "lgK=10"), ("gk", "acc=20"),
    }
    for r in rows.values():
        assert r.n_windows > 0 and r.mean_rel_err >= 0.0
        assert r.max_rel_err >= r.mean_rel_err
    assert (
        rows[("hll++", "rsd=0.05")].mean_rel_err
        <= rows[("hll++", "rsd=0.15")].mean_rel_err
    )
    assert (
        rows[("ds_hll", "lgK=10")].mean_rel_err
        <= rows[("ds_hll", "lgK=6")].mean_rel_err
    )
