"""Metric-series statistics queries + oracles (events table).

Extends the reference's 7 aggregation functions (sum/count/avg/min/max/
delta/rate — aggregation/*.go) with the dispersion + distribution-shape
statistics a monitoring pipeline needs next: variance bands per window,
percentile-clipped (winsorized) aggregates, and cross-metric
correlation. All three stay fully declarative: the raw event scan is
touched once per query, and everything after the first groupBy operates
on aggregated series that are orders of magnitude smaller than the
input — the shape that survives a 100 TB scan.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.sources.tables import load_table

_HOUR_MS = 3600 * 1000
_W_SQL = f"(epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS}"


def _hourly_window() -> F.Column:
    return (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
        * F.lit(_HOUR_MS)
    ).alias("window_ts_ms")


# ---------------------------------------------------------------- stddev


def q_agg_stddev(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dispersion per (metric, hourly window): sample stddev + variance
    alongside the mean — the error-band columns next to the reference's
    avg output. Single shuffle keyed by (metric, window) with map-side
    partial aggregation; the exchange carries one summary row per
    group, never raw events.

    Numerics: Spark's stddev_samp (streaming M2 merge) and DuckDB's
    differ in final-ulp accumulation, which flips stable_round at
    half-ULP boundaries across thousands of groups. Values are exact
    integer cents, so the moments are summed as exact bigints
    (Σe2, Σe2²) and variance derived as
    (n·Σx² − (Σx)²) / (n(n−1)·100²): identical integers → identical
    doubles → identical output on both engines, no epsilon at all.
    (Per-group Σe2² stays far below bigint range for any realistic
    per-window row count; the groups are time-bounded.)"""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    g = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("e2").alias("s1"),
        F.sum(F.col("e2") * F.col("e2")).alias("s2"),
    )
    n = F.col("n")
    var = F.when(
        n > 1,
        (F.col("s2") * n - F.col("s1") * F.col("s1")).cast("double")
        / (n * (n - 1) * F.lit(10000.0)),
    )
    return g.select(
        "event_type",
        "window_ts_ms",
        "n",
        (F.col("s1").cast("double") / (n * F.lit(100.0))).alias("avg_value"),
        F.sqrt(var).alias("stddev_value"),
        var.alias("var_value"),
    )


ORACLE_STDDEV = f"""
WITH e AS (
  SELECT event_type, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS e2
  FROM events
), g AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         count(*) AS n, sum(e2) AS s1, sum(e2 * e2) AS s2
  FROM e GROUP BY 1, 2
)
SELECT event_type, window_ts_ms, n,
       CAST(s1 AS DOUBLE) / (n * 100.0::DOUBLE) AS avg_value,
       sqrt(CASE WHEN n > 1 THEN CAST(s2 * n - s1 * s1 AS DOUBLE)
                 / (n * (n - 1) * 10000.0::DOUBLE) END) AS stddev_value,
       CASE WHEN n > 1 THEN CAST(s2 * n - s1 * s1 AS DOUBLE)
            / (n * (n - 1) * 10000.0::DOUBLE) END AS var_value
FROM g
""".strip()


# ------------------------------------------------------------- winsorize

_WINS_LO_PCT = 5  # clamp below the 5th percentile
_WINS_HI_PCT = 95  # and above the 95th


def q_metric_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (percentile-clipped) hourly aggregates: per metric,
    clamp values below p05 / above p95, then aggregate — the
    outlier-robust variant of the reference's avg rule.

    The percentiles are EXACT DISCRETE order statistics computed from a
    value histogram, not an interpolating percentile() call: values are
    integer cents, so groupBy (metric, value_cents) collapses the corpus
    to ≤ a few thousand histogram cells per metric (map-side partial
    agg; the shuffle carries distinct values, not rows), a cumulative
    sum over that tiny histogram finds the ranks, and the thresholds
    broadcast back to the scan. Everything stays in integer arithmetic
    until the final division, so engine and oracle agree bit-for-bit
    with no rounding epsilon — and the histogram path is exactly how
    you'd compute an exact percentile over 100 TB (the raw data is
    never sorted, only its value histogram is)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hist = ev.groupBy("event_type", "e2").agg(F.count(F.lit(1)).alias("c"))
    w_cum = (
        Window.partitionBy("event_type")
        .orderBy("e2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_all = Window.partitionBy("event_type")
    cum = hist.select(
        "event_type",
        "e2",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("n"),
    )
    k_lo = F.floor((F.lit(_WINS_LO_PCT) * F.col("n") + 99) / 100)
    k_hi = F.floor((F.lit(_WINS_HI_PCT) * F.col("n") + 99) / 100)
    bounds = cum.groupBy("event_type").agg(
        F.min(F.when(F.col("cum") >= k_lo, F.col("e2"))).alias("lo_e2"),
        F.min(F.when(F.col("cum") >= k_hi, F.col("e2"))).alias("hi_e2"),
    )
    clamped = ev.join(F.broadcast(bounds), "event_type").select(
        "event_type",
        _hourly_window(),
        F.greatest(F.least(F.col("e2"), F.col("hi_e2")), F.col("lo_e2")).alias(
            "ce2"
        ),
        (F.col("e2") < F.col("lo_e2")).cast("long").alias("is_lo"),
        (F.col("e2") > F.col("hi_e2")).cast("long").alias("is_hi"),
    )
    return clamped.groupBy("event_type", "window_ts_ms").agg(
        F.count(F.lit(1)).alias("n"),
        (
            F.sum("ce2").cast("double") / (F.count(F.lit(1)) * F.lit(100.0))
        ).alias("avg_winsorized"),
        F.sum("is_lo").alias("n_clamped_lo"),
        F.sum("is_hi").alias("n_clamped_hi"),
    )


ORACLE_WINSORIZE = f"""
WITH e AS (
  SELECT event_type, ts,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS e2
  FROM events
), hist AS (
  SELECT event_type, e2, count(*) AS c FROM e GROUP BY 1, 2
), cum AS (
  SELECT event_type, e2,
         sum(c) OVER (PARTITION BY event_type ORDER BY e2
                      ROWS UNBOUNDED PRECEDING) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM hist
), bounds AS (
  SELECT event_type,
         min(CASE WHEN cum >= ({_WINS_LO_PCT} * n + 99) // 100
                  THEN e2 END) AS lo_e2,
         min(CASE WHEN cum >= ({_WINS_HI_PCT} * n + 99) // 100
                  THEN e2 END) AS hi_e2
  FROM cum GROUP BY 1
), clamped AS (
  SELECT e.event_type, {_W_SQL} AS window_ts_ms,
         greatest(least(e2, hi_e2), lo_e2) AS ce2,
         CASE WHEN e2 < lo_e2 THEN 1 ELSE 0 END AS is_lo,
         CASE WHEN e2 > hi_e2 THEN 1 ELSE 0 END AS is_hi
  FROM e JOIN bounds ON e.event_type = bounds.event_type
)
SELECT event_type, window_ts_ms,
       count(*) AS n,
       CAST(sum(ce2) AS DOUBLE) / (count(*) * 100.0::DOUBLE)
         AS avg_winsorized,
       CAST(sum(is_lo) AS BIGINT) AS n_clamped_lo,
       CAST(sum(is_hi) AS BIGINT) AS n_clamped_hi
FROM clamped
GROUP BY 1, 2
""".strip()


# ----------------------------------------------------------- correlation


def q_metric_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise Pearson correlation between the hourly mean series of
    every metric pair — 'which metrics move together' is the first
    question asked of an aggregated metric store. Aggregate-then-
    correlate: the event scan collapses to one row per (metric, window)
    FIRST (single shuffle over raw data), and the pair join + corr run
    on that tiny series table (#metrics × #windows rows), so the
    pair-join cost is independent of corpus size. Window means are
    rounded to 4 decimals on both sides before corr so both engines
    correlate identical inputs; corr's own accumulation is then rounded
    too."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        stable_round(F.avg("value"), 4).alias("wv")
    )
    a, b = hourly.alias("a"), hourly.alias("b")
    pairs = a.join(
        b,
        (F.col("a.window_ts_ms") == F.col("b.window_ts_ms"))
        & (F.col("a.event_type") < F.col("b.event_type")),
    )
    return pairs.groupBy(
        F.col("a.event_type").alias("metric_a"),
        F.col("b.event_type").alias("metric_b"),
    ).agg(
        F.count(F.lit(1)).alias("n_windows"),
        stable_round(F.corr(F.col("a.wv"), F.col("b.wv")), 4).alias("corr"),
    )


ORACLE_CORRELATION = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS w,
         {sql_stable_round("avg(value)")} AS wv
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS metric_a, b.event_type AS metric_b,
       count(*) AS n_windows,
       {sql_stable_round("corr(a.wv, b.wv)")} AS corr
FROM hourly a JOIN hourly b
  ON a.w = b.w AND a.event_type < b.event_type
GROUP BY 1, 2
""".strip()


def q_metric_lead_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEADING-INDICATOR matrix: Pearson correlation between metric
    A's hourly mean at window t and metric B's at t+1h, for every
    ORDERED pair A≠B — 'which metric moves one hour before which'
    is the next question after metric_correlation's contemporaneous
    matrix (a strong asymmetric lead-lag correlation is the standard
    signal for cascade/root-cause ordering). Same aggregate-then-
    correlate shape: the event scan collapses to one row per (metric,
    window) first, the lag join + corr run on the tiny series table
    (#metrics × #windows rows), so pair cost is independent of corpus
    size. Window means are 4-dp-rounded before corr on both engines
    (identical inputs → identical accumulations), corr rounded too."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        stable_round(F.avg("value"), 4).alias("wv")
    )
    a, b = hourly.alias("a"), hourly.alias("b")
    pairs = a.join(
        b,
        (F.col("a.window_ts_ms") + F.lit(_HOUR_MS) == F.col("b.window_ts_ms"))
        & (F.col("a.event_type") != F.col("b.event_type")),
    )
    return pairs.groupBy(
        F.col("a.event_type").alias("metric_lead"),
        F.col("b.event_type").alias("metric_lag"),
    ).agg(
        F.count(F.lit(1)).alias("n_windows"),
        stable_round(F.corr(F.col("a.wv"), F.col("b.wv")), 4).alias(
            "lead_corr"
        ),
    )


ORACLE_LEAD_LAG = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS w,
         {sql_stable_round("avg(value)")} AS wv
  FROM events GROUP BY 1, 2
)
SELECT a.event_type AS metric_lead, b.event_type AS metric_lag,
       count(*) AS n_windows,
       {sql_stable_round("corr(a.wv, b.wv)")} AS lead_corr
FROM hourly a JOIN hourly b
  ON a.w + {_HOUR_MS} = b.w AND a.event_type <> b.event_type
GROUP BY 1, 2
""".strip()


_MOVERS_K = 3


def q_metric_topk_movers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K hour-over-hour MOVERS per metric: the K windows where a
    metric's hourly mean jumped most vs its previous reported window
    (either direction) — the 'what changed' triage view an on-call
    pulls up first. Lag is over the previous REPORTED window (row
    lag), so a gap in the series compares across the gap rather than
    emitting nulls — the same arrival-ordered convention as
    lag_delta_user. Deterministic: means 4-dp-rounded before the
    subtraction (identical doubles → identical delta on both
    engines), rank ties break on window_ts_ms ascending. The window
    functions run on the collapsed series (#metrics × #windows rows),
    partitioned by metric — no global sort, no raw-event window."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        stable_round(F.avg("value"), 4).alias("wv")
    )
    w = Window.partitionBy("event_type").orderBy("window_ts_ms")
    d = (
        hourly.select(
            "event_type",
            "window_ts_ms",
            F.lag("wv").over(w).alias("prev_wv"),
            "wv",
        )
        .filter(F.col("prev_wv").isNotNull())
        .withColumn(
            "delta", stable_round(F.col("wv") - F.col("prev_wv"), 4)
        )
    )
    rk = Window.partitionBy("event_type").orderBy(
        F.abs(F.col("delta")).desc(), F.col("window_ts_ms").asc()
    )
    return (
        d.withColumn("rk", F.row_number().over(rk))
        .filter(F.col("rk") <= _MOVERS_K)
        .select(
            "event_type", "rk", "window_ts_ms", "prev_wv", "wv", "delta"
        )
    )


ORACLE_TOPK_MOVERS = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS w,
         {sql_stable_round("avg(value)")} AS wv
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT event_type, w AS window_ts_ms,
         lag(wv) OVER (PARTITION BY event_type ORDER BY w) AS prev_wv,
         wv
  FROM hourly
), d AS (
  SELECT event_type, window_ts_ms, prev_wv, wv,
         {sql_stable_round("(wv - prev_wv)")} AS delta
  FROM lagged WHERE prev_wv IS NOT NULL
)
SELECT event_type, rk, window_ts_ms, prev_wv, wv, delta
FROM (
  SELECT *, CAST(row_number() OVER (
           PARTITION BY event_type
           ORDER BY abs(delta) DESC, window_ts_ms ASC) AS INT) AS rk
  FROM d
) t WHERE rk <= {_MOVERS_K}
""".strip()


_M4_BUCKET_MS = 6 * 3600 * 1000  # 6-hour pixel buckets


def q_metric_downsample_m4(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 series downsampling (Jugel et al., VLDB 2014): per
    (metric, time bucket) keep exactly min/max/first/last — the four
    points that make a line chart pixel-identical to the full series,
    and the standard way a dashboard reads a 100 TB metric store
    without scanning it into the browser. Pure single-shuffle
    aggregation: min/max are plain aggregates, first/last are
    min_by/max_by selections ordered by event time (microsecond event
    times are collision-free here, so selection is deterministic); no
    accumulation arithmetic at all, so engine and oracle compare
    exactly with no rounding."""
    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    bucket = (
        (F.unix_millis(F.col("ts")) / F.lit(_M4_BUCKET_MS)).cast("long")
        * F.lit(_M4_BUCKET_MS)
    )
    return ev.groupBy(
        F.col("event_type"), bucket.alias("bucket_ts_ms")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("v_min"),
        F.max("value").alias("v_max"),
        F.min_by("value", t_us).alias("v_first"),
        F.max_by("value", t_us).alias("v_last"),
    )


ORACLE_M4 = f"""
SELECT event_type,
       (epoch_ms(ts) // {_M4_BUCKET_MS}) * {_M4_BUCKET_MS} AS bucket_ts_ms,
       count(*) AS n,
       min(value) AS v_min,
       max(value) AS v_max,
       arg_min(value, epoch_us(ts)) AS v_first,
       arg_max(value, epoch_us(ts)) AS v_last
FROM events
GROUP BY 1, 2
""".strip()


_ALERT_HI_E4 = 150_0000  # fire when hourly mean > 150 (e4 fixed-point)
_ALERT_LO_E4 = 100_0000  # clear when it falls back below 100


def q_metric_alert_hysteresis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold alerting with hysteresis over the aggregated series —
    the alert rule a monitoring pipeline runs on the reference's output
    stream: FIRE after two consecutive windows above HI, stay active
    until a window at/below LO (so flapping around one threshold never
    pages twice). The fired/cleared state machine is the classic
    gaps-and-islands rewrite: mark definite transition points, then
    carry the latest transition forward with last_value(ignorenulls)
    over the per-metric window — no recursion, no UDF, state carried by
    a bounded per-metric sort. Signal compared in e4 fixed-point so the
    threshold test is an exact integer compare on both engines."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.floor(F.avg(F.col("value") * 10000) + F.lit(0.5))
        .cast("long")
        .alias("wv_e4")
    )
    w_ord = Window.partitionBy("event_type").orderBy("window_ts_ms")
    prev = F.lag("wv_e4").over(w_ord)
    fire = (F.col("wv_e4") > _ALERT_HI_E4) & (prev > _ALERT_HI_E4)
    clear = F.col("wv_e4") <= _ALERT_LO_E4
    transition = F.when(fire, F.lit(1)).when(clear, F.lit(0))
    carried = F.last(transition, ignorenulls=True).over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return hourly.select(
        "event_type",
        "window_ts_ms",
        "wv_e4",
        F.coalesce(carried == 1, F.lit(False)).alias("alert_active"),
    )


ORACLE_ALERT = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         CAST(floor(avg(value * 10000) + 0.5) AS BIGINT) AS wv_e4
  FROM events GROUP BY 1, 2
), t AS (
  SELECT *,
         CASE WHEN wv_e4 > {_ALERT_HI_E4}
               AND lag(wv_e4) OVER (PARTITION BY event_type
                                    ORDER BY window_ts_ms) > {_ALERT_HI_E4}
              THEN 1
              WHEN wv_e4 <= {_ALERT_LO_E4} THEN 0 END AS transition
  FROM hourly
)
SELECT event_type, window_ts_ms, wv_e4,
       coalesce(last_value(transition IGNORE NULLS)
                OVER (PARTITION BY event_type ORDER BY window_ts_ms
                      ROWS UNBOUNDED PRECEDING) = 1,
                FALSE) AS alert_active
FROM t
""".strip()


# ------------------------------------------- counter rate with resets


def q_metric_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reset-aware counter increase per (metric, series, hour) — the
    Prometheus ``increase()`` semantics the reference's naive
    delta (last−first) gets WRONG whenever a counter restarts: on a
    reset the new sample is smaller than its predecessor, so the true
    increase is the sum of POSITIVE inter-sample deltas only, with the
    post-reset sample contributing its full value implicitly at the
    next delta. Series key = (event_type, user_id), deltas from lag()
    over event time; boundary deltas belong to the window of the later
    sample (the standard attribution). One window function + one
    groupBy — both keyed by the series, shuffle-partitionable."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    # e6 fixed-point per SAMPLE, then integer lag deltas: the per-window
    # sum is an integer sum — immune to cross-engine float add order
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    with_delta = ev.select(
        "event_type",
        "user_id",
        "ts",
        (v_e6 - F.lag(v_e6).over(w)).alias("delta"),
    )
    return (
        with_delta.filter(F.col("delta").isNotNull())
        .groupBy(
            F.col("event_type"),
            (
                (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
                * F.lit(_HOUR_MS)
            ).alias("window_ts_ms"),
        )
        .agg(
            stable_round(
                F.sum(F.greatest(F.lit(0).cast("long"), F.col("delta")))
                / F.lit(1_000_000.0),
                4,
            ).alias("increase"),
            F.sum(
                F.when(F.col("delta") < 0, 1).otherwise(0)
            ).cast("long").alias("n_resets"),
        )
    )


ORACLE_COUNTER_RATE = f"""
WITH v AS (
  SELECT event_type, user_id, ts, event_id,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6
  FROM events
), d AS (
  SELECT event_type, user_id, ts,
         v_e6 - lag(v_e6) OVER (PARTITION BY event_type, user_id
                                ORDER BY ts, event_id) AS delta
  FROM v
)
SELECT event_type, {_W_SQL} AS window_ts_ms,
       {sql_stable_round("CAST(sum(greatest(0, delta)) AS BIGINT) / 1000000.0", 4)} AS increase,
       CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_resets
FROM d
WHERE delta IS NOT NULL
GROUP BY 1, 2
""".strip()


_HOUR_US = 3600 * 1_000_000


def q_metric_rate_prom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus ``rate()`` with BOUNDARY EXTRAPOLATION per (metric,
    hour) — the full public ``extrapolatedRate`` algorithm
    (prometheus/promql/functions.go), which the naive delta/Δt (the
    reference's ``rate`` and row 18n's ``increase``) both
    under-report: samples rarely land exactly on window boundaries,
    so Prometheus scales the observed counter delta by how much of
    the window the samples actually cover — extrapolating to the
    boundary when the nearest sample is close (< 1.1× the average
    sample spacing), by half a spacing when not, and clamping the
    start extrapolation where a positive counter would have to dip
    below zero.

    Exactness: per-series counter deltas + reset corrections
    (correction += previous value at each drop — the Prometheus
    semantics, NOT positive-delta sum) are exact e6 integers; the
    extrapolation factor is float but computed by the IDENTICAL
    expression tree in both engines over identical integer inputs,
    and each series' rate pre-rounds to an e6 integer BEFORE the
    per-metric sum, so the cross-series total is order-independent.

    Scale: one lag window + one aggregate, both keyed by (series,
    window); the per-metric rollup is metric×hour-sized with
    map-side partials.
    """
    ev = load_table(spark, sf_dir, "events")
    t_us = F.unix_micros(F.col("ts"))
    v_e6 = F.floor(
        F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    base = ev.select(
        "event_type",
        "user_id",
        "event_id",
        t_us.alias("t_us"),
        v_e6.alias("v"),
        (
            F.expr(f"unix_micros(ts) div {_HOUR_US}") * F.lit(_HOUR_US)
        ).alias("w_us"),
    )
    lag_w = Window.partitionBy(
        "event_type", "user_id", "w_us"
    ).orderBy(F.col("t_us").asc(), F.col("event_id").asc())
    with_prev = base.withColumn("prev", F.lag("v").over(lag_w))
    per_series = (
        with_prev.groupBy("event_type", "user_id", "w_us")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("t_us").alias("t_first"),
            F.max("t_us").alias("t_last"),
            F.min_by("v", "t_us").alias("v_first"),
            F.max_by("v", "t_us").alias("v_last"),
            F.sum(
                F.when(F.col("v") < F.col("prev"), F.col("prev"))
                .otherwise(F.lit(0).cast("long"))
            ).alias("corr"),
        )
        .filter((F.col("n") >= 2) & (F.col("t_last") > F.col("t_first")))
    )
    # the Prometheus algorithm, expression-for-expression (seconds as
    # doubles over exact integer inputs; mirrored verbatim in SQL)
    delta = (F.col("v_last") - F.col("v_first") + F.col("corr")).cast(
        "double"
    ) / F.lit(1_000_000.0)
    si = (F.col("t_last") - F.col("t_first")).cast("double") / F.lit(
        1_000_000.0
    )
    avg_dur = si / (F.col("n") - F.lit(1)).cast("double")
    d_start0 = (F.col("t_first") - F.col("w_us")).cast(
        "double"
    ) / F.lit(1_000_000.0)
    d_end = (
        F.col("w_us") + F.lit(_HOUR_US) - F.col("t_last")
    ).cast("double") / F.lit(1_000_000.0)
    d_zero = si * (
        F.col("v_first").cast("double")
        / (F.col("v_last") - F.col("v_first") + F.col("corr")).cast(
            "double"
        )
    )
    d_start = F.when(
        (delta > 0) & (F.col("v_first") >= 0) & (d_zero < d_start0),
        d_zero,
    ).otherwise(d_start0)
    threshold = avg_dur * F.lit(1.1)
    ext = (
        si
        + F.when(d_start < threshold, d_start).otherwise(
            avg_dur / F.lit(2.0)
        )
        + F.when(d_end < threshold, d_end).otherwise(
            avg_dur / F.lit(2.0)
        )
    )
    rate = delta * (ext / si) / F.lit(3600.0)
    rate_e6 = F.floor(rate * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    return (
        per_series.select(
            "event_type",
            (F.col("w_us") / F.lit(1000)).cast("long").alias(
                "window_ts_ms"
            ),
            rate_e6.alias("r"),
        )
        .groupBy("event_type", "window_ts_ms")
        .agg(
            F.count(F.lit(1)).alias("n_series"),
            stable_round(
                F.sum("r").cast("double") / F.lit(1_000_000.0), 6
            ).alias("rate_sum"),
        )
    )


ORACLE_RATE_PROM = f"""
WITH base AS (
  SELECT event_type, user_id, event_id,
         epoch_us(ts) AS t_us,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v,
         (epoch_us(ts) // {_HOUR_US}) * {_HOUR_US} AS w_us
  FROM events
), p AS (
  SELECT *, lag(v) OVER (PARTITION BY event_type, user_id, w_us
                         ORDER BY t_us, event_id) AS prev
  FROM base
), s AS (
  SELECT event_type, user_id, w_us,
         count(*) AS n,
         min(t_us) AS t_first, max(t_us) AS t_last,
         arg_min(v, t_us) AS v_first, arg_max(v, t_us) AS v_last,
         sum(CASE WHEN v < prev THEN prev ELSE 0 END) AS corr
  FROM p GROUP BY 1, 2, 3
  HAVING count(*) >= 2 AND max(t_us) > min(t_us)
), r AS (
  SELECT event_type, w_us,
         CAST(v_last - v_first + corr AS DOUBLE) / 1000000.0 AS delta,
         CAST(t_last - t_first AS DOUBLE) / 1000000.0 AS si,
         (CAST(t_last - t_first AS DOUBLE) / 1000000.0)
           / CAST(n - 1 AS DOUBLE) AS avg_dur,
         CAST(t_first - w_us AS DOUBLE) / 1000000.0 AS d_start0,
         CAST(w_us + {_HOUR_US} - t_last AS DOUBLE) / 1000000.0
           AS d_end,
         (CAST(t_last - t_first AS DOUBLE) / 1000000.0)
           * (CAST(v_first AS DOUBLE)
              / CAST(v_last - v_first + corr AS DOUBLE)) AS d_zero,
         v_first
  FROM s
), x AS (
  SELECT event_type, w_us, delta, si, avg_dur, d_end,
         CASE WHEN delta > 0 AND v_first >= 0 AND d_zero < d_start0
              THEN d_zero ELSE d_start0 END AS d_start
  FROM r
), y AS (
  SELECT event_type, w_us,
         CAST(floor(
           delta * ((si
             + (CASE WHEN d_start < avg_dur * 1.1 THEN d_start
                     ELSE avg_dur / 2.0 END)
             + (CASE WHEN d_end < avg_dur * 1.1 THEN d_end
                     ELSE avg_dur / 2.0 END)) / si) / 3600.0
           * 1000000.0 + 0.5) AS BIGINT) AS r_e6
  FROM x
)
SELECT event_type, CAST(w_us // 1000 AS BIGINT) AS window_ts_ms,
       CAST(count(*) AS BIGINT) AS n_series,
       {sql_stable_round(
           "CAST(sum(r_e6) AS DOUBLE) / 1000000.0", 6)} AS rate_sum
FROM y GROUP BY 1, 2
""".strip()


# ----------------------------------------------------- retention tiers

_TIERS = ((60_000, "1m"), (300_000, "5m"), (3_600_000, "1h"))


def q_metric_retention_tiers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downsampled retention tiers (monitoring storage policy: 1-minute
    resolution kept hot, 5-minute and 1-hour tiers kept long) computed
    ALGEBRAICALLY: the raw scan happens once for the 1m tier; 5m and 1h
    re-aggregate the 1m (sum, count) partials — avg stays exact because
    sums and counts re-roll, never averages of averages (the same
    algebra the HLL rollup, 18k, applies to distincts). Output value =
    per-tier avg plus the re-rolled count."""
    ev = load_table(spark, sf_dir, "events")
    # e6 fixed-point BEFORE summing: integer sums are associativity-
    # independent, so re-rolled tiers hash identically cross-engine
    # (float sums differ in the last ulp by add order)
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    base = (
        ev.groupBy(
            F.col("event_type"),
            (
                (F.unix_millis(F.col("ts")) / F.lit(60_000)).cast("long")
                * F.lit(60_000)
            ).alias("w1m"),
        )
        .agg(F.sum(v_e6).alias("s"), F.count(F.lit(1)).alias("c"))
        # r11 (guide §2.4): the 1m partials feed every tier's
        # re-rollup — uncached, the events scan re-executed per tier
        # (3 FileScans → 1); the relation is |metrics|×|minutes|.
        .cache()
    )
    tiers = []
    for ms, label in _TIERS:
        t = (
            base.groupBy(
                "event_type",
                ((F.col("w1m") / F.lit(ms)).cast("long") * F.lit(ms)).alias(
                    "window_ts_ms"
                ),
            )
            .agg(F.sum("s").alias("s"), F.sum("c").alias("c"))
            .select(
                F.lit(label).alias("tier"),
                "event_type",
                "window_ts_ms",
                stable_round(
                    F.col("s") / F.lit(1_000_000.0) / F.col("c"), 4
                ).alias("avg_value"),
                F.col("c").cast("long").alias("n_samples"),
            )
        )
        tiers.append(t)
    out = tiers[0]
    for t in tiers[1:]:
        out = out.unionByName(t)
    return out


_TIER_SQL = "\nUNION ALL\n".join(
    f"""SELECT '{label}' AS tier, event_type,
       (w1m // {ms}) * {ms} AS window_ts_ms,
       {sql_stable_round("sum(s) / 1000000.0 / sum(c)", 4)} AS avg_value,
       CAST(sum(c) AS BIGINT) AS n_samples
FROM base GROUP BY 1, 2, 3"""
    for ms, label in _TIERS
)

ORACLE_RETENTION_TIERS = f"""
WITH base AS (
  SELECT event_type, (epoch_ms(ts) // 60000) * 60000 AS w1m,
         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT)
           AS s,
         count(*) AS c
  FROM events GROUP BY 1, 2
)
{_TIER_SQL}
""".strip()


# ------------------------------------------- equi-depth histogram

_ED_BUCKETS = 10


def q_metric_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-DEPTH value histogram per metric (decile buckets holding
    equal counts, with data-driven edges) — the complement of the
    fixed-edge Prometheus-style buckets in metric_histogram: equal-
    width buckets waste resolution on sparse tails, equi-depth puts
    the resolution where the mass is (the summary a query optimizer
    or an SLO dashboard wants). ntile over (value, event_id) — the id
    tiebreak makes bucket membership total and cross-engine exact;
    per-metric window + one tiny groupBy."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy(
        F.col("value").asc(), F.col("event_id").asc()
    )
    return (
        ev.select(
            "event_type",
            "value",
            F.ntile(_ED_BUCKETS).over(w).alias("bucket"),
        )
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_samples"),
            stable_round(F.min("value"), 4).alias("lo"),
            stable_round(F.max("value"), 4).alias("hi"),
        )
    )


ORACLE_HISTOGRAM_EQUIDEPTH = f"""
WITH t AS (
  SELECT event_type, value,
         ntile({_ED_BUCKETS}) OVER (PARTITION BY event_type
                                    ORDER BY value, event_id) AS bucket
  FROM events
)
SELECT event_type, bucket, count(*) AS n_samples,
       {sql_stable_round("min(value)", 4)} AS lo,
       {sql_stable_round("max(value)", 4)} AS hi
FROM t GROUP BY 1, 2
""".strip()


# ------------------------------------------------- staleness report


def q_metric_staleness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric ingestion freshness: last sample time, sample count,
    and staleness versus the stream's frontier (the newest event
    anywhere) — the operational complement of the reference's
    stale-window GC (server.go:213-296): before trusting a dashboard,
    you ask which series have silently stopped reporting. One groupBy
    + a broadcast 1-row frontier; integer-ms arithmetic throughout."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_samples"),
        F.unix_millis(F.max("ts")).alias("last_ts_ms"),
    )
    frontier = ev.agg(
        F.unix_millis(F.max("ts")).alias("__frontier_ms")
    )
    return per.crossJoin(F.broadcast(frontier)).select(
        "event_type",
        "n_samples",
        "last_ts_ms",
        (F.col("__frontier_ms") - F.col("last_ts_ms")).alias("staleness_ms"),
    )


ORACLE_STALENESS = """
SELECT event_type, count(*) AS n_samples,
       epoch_ms(max(ts)) AS last_ts_ms,
       (SELECT epoch_ms(max(ts)) FROM events) - epoch_ms(max(ts))
         AS staleness_ms
FROM events GROUP BY 1
""".strip()


def q_metric_out_of_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order ARRIVAL analysis per metric — the measurement that
    justifies the windowLag/watermark setting (reference server.go's
    lag; our `withWatermark`): using event_id as the arrival proxy, an
    event is late if its event time precedes the running event-time
    frontier of everything that arrived before it, and its lateness is
    the distance behind that frontier. `max observed lateness` IS the
    empirical watermark bound: set lag above the p-high of this and
    late drops vanish. One running-max window per series + one
    aggregate; integer-ms arithmetic throughout."""
    ev = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    t_ms = F.unix_millis(F.col("ts"))
    frontier = F.max(t_ms).over(w)
    marked = ev.select(
        "event_type",
        t_ms.alias("t"),
        frontier.alias("frontier"),
    ).withColumn(
        "lateness_ms",
        F.when(
            F.col("frontier").isNotNull() & (F.col("t") < F.col("frontier")),
            F.col("frontier") - F.col("t"),
        ).otherwise(F.lit(0)),
    )
    return marked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum((F.col("lateness_ms") > 0).cast("long")).alias("n_late"),
        stable_round(
            F.sum((F.col("lateness_ms") > 0).cast("long")).cast("double")
            / F.count(F.lit(1)),
            4,
        ).alias("late_frac"),
        F.max("lateness_ms").alias("max_lateness_ms"),
        F.sum("lateness_ms").alias("total_lateness_ms"),
    )


ORACLE_OUT_OF_ORDER = f"""
WITH marked AS (
  SELECT event_type, epoch_ms(ts) AS t,
         max(epoch_ms(ts)) OVER (
           PARTITION BY event_type ORDER BY event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ) AS frontier
  FROM events
), late AS (
  SELECT event_type,
         CASE WHEN frontier IS NOT NULL AND t < frontier
              THEN frontier - t ELSE 0 END AS lateness_ms
  FROM marked
)
SELECT event_type, count(*) AS n_events,
       CAST(sum(CASE WHEN lateness_ms > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       {sql_stable_round(
           "CAST(sum(CASE WHEN lateness_ms > 0 THEN 1 ELSE 0 END)"
           " AS DOUBLE) / count(*)", 4)} AS late_frac,
       CAST(max(lateness_ms) AS BIGINT) AS max_lateness_ms,
       CAST(sum(lateness_ms) AS BIGINT) AS total_lateness_ms
FROM late GROUP BY 1
""".strip()


def q_metric_availability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric AVAILABILITY: the fraction of expected hourly
    windows (the corpus's global [min, max] hour span — every series
    is expected every hour) in which the series actually reported —
    the SLA complement of `metric_staleness` (staleness says how far
    behind NOW a series is; availability says how gap-free its
    history was). Distinct present hours per metric is a two-level
    partial-able aggregate; the expected-hour span is a broadcast
    1-row aggregate; the ratio divides exact integers."""
    ev = load_table(spark, sf_dir, "events")
    hour = (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
    )
    present = ev.groupBy("event_type").agg(
        F.countDistinct(hour).alias("hours_present")
    )
    span = ev.agg(
        (F.max(hour) - F.min(hour) + F.lit(1)).alias("hours_expected")
    )
    return present.crossJoin(F.broadcast(span)).select(
        "event_type",
        "hours_present",
        "hours_expected",
        stable_round(
            F.col("hours_present").cast("double")
            / F.col("hours_expected"),
            4,
        ).alias("availability"),
        (F.col("hours_expected") - F.col("hours_present")).alias(
            "hours_missed"
        ),
    )


ORACLE_AVAILABILITY = f"""
WITH present AS (
  SELECT event_type,
         count(DISTINCT epoch_ms(ts) // {_HOUR_MS}) AS hours_present
  FROM events GROUP BY 1
), span AS (
  SELECT max(epoch_ms(ts) // {_HOUR_MS})
         - min(epoch_ms(ts) // {_HOUR_MS}) + 1 AS hours_expected
  FROM events
)
SELECT event_type, hours_present,
       CAST(hours_expected AS BIGINT) AS hours_expected,
       {sql_stable_round(
           "CAST(hours_present AS DOUBLE) / hours_expected", 4)}
         AS availability,
       CAST(hours_expected - hours_present AS BIGINT) AS hours_missed
FROM present, span
""".strip()


def q_metric_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per (metric, hour) — the gauge semantics
    a plain avg() gets wrong under irregular sampling (a value held
    for 50 minutes must weigh 50× one held for a minute; Monasca's
    Ceilometer lineage and billing meters integrate, not average).
    Piecewise-constant-left integration: each sample's value is held
    until the next sample of its (event_type, user_id) series; a
    segment belongs to the window its STARTING sample falls in, and
    segments from all series of a metric pool into one window
    integral (Σ v·dt / Σ dt).

    Cross-engine determinism: values quantize to e3 fixed point per
    sample, so the integral numerator Σ v_e3·dt_ms and denominator
    Σ dt_ms are exact BIGINT sums (≈10¹⁵ max — no overflow) and the
    single final division is reproducible. Scale shape: one lead()
    per series partition + one partial-aggregated groupBy, both keyed
    by series/metric — the same two-exchange shape as counter_rate."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    v_e3 = F.floor(F.col("value") * F.lit(1000.0) + F.lit(0.5)).cast("long")
    t_ms = F.unix_millis(F.col("ts"))
    seg = ev.select(
        "event_type",
        "ts",
        v_e3.alias("v_e3"),
        (F.lead(t_ms).over(w) - t_ms).alias("dt_ms"),
    ).filter(F.col("dt_ms").isNotNull())
    return seg.groupBy(
        "event_type",
        (
            (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
            * F.lit(_HOUR_MS)
        ).alias("window_ts_ms"),
    ).agg(
        stable_round(
            F.sum(F.col("v_e3") * F.col("dt_ms")).cast("double")
            / F.nullif(
                F.lit(1000.0) * F.sum("dt_ms").cast("double"), F.lit(0.0)
            ),
            4,
        ).alias("twa"),
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("dt_ms").alias("covered_ms"),
    )


ORACLE_TWA = f"""
WITH s AS (
  SELECT event_type, ts,
         CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS v_e3,
         lead(epoch_ms(ts)) OVER (PARTITION BY event_type, user_id
                                  ORDER BY ts, event_id)
           - epoch_ms(ts) AS dt_ms
  FROM events
)
SELECT event_type, {_W_SQL} AS window_ts_ms,
       {sql_stable_round(
           "CAST(sum(v_e3 * dt_ms) AS DOUBLE)"
           " / nullif(1000.0 * CAST(sum(dt_ms) AS DOUBLE), 0.0)", 4)}
         AS twa,
       count(*) AS n_segments,
       CAST(sum(dt_ms) AS BIGINT) AS covered_ms
FROM s WHERE dt_ms IS NOT NULL
GROUP BY 1, 2
""".strip()


_EWMA_ALPHA = 0.2


def q_metric_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: batch EWMA per (metric, series) — the smoothed line
    every dashboard draws, as a BATCH backfill of the streaming
    operator (streaming/pipeline.streaming_ewma): same fold
    ewma = α·v + (1−α)·ewma seeded with the first sample, so
    re-running history through this query reproduces EXACTLY what the
    live stream computed (pinned in test_series.py — the
    batch ≡ streaming bridge for an order-dependent fold that no SQL
    window frame expresses; hence no oracle). One series-keyed
    shuffle into applyInPandas; the fold itself is pandas
    ewm(adjust=False), vectorized per series."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events")

    def _fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(["ts_ms", "event_id"], kind="mergesort")
        pdf["ewma"] = (
            pdf["value"].ewm(alpha=_EWMA_ALPHA, adjust=False).mean()
        )
        return pdf[["event_type", "user_id", "ts_ms", "value", "ewma"]]

    prepared = ev.select(
        "event_type",
        "user_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        "event_id",
        F.col("value").cast("double").alias("value"),
    )
    return prepared.groupBy("event_type", "user_id").applyInPandas(
        _fold,
        "event_type string, user_id bigint, ts_ms bigint, "
        "value double, ewma double",
    )


_BURN_FAST_MS = 5 * 60 * 1000
_BURN_PCT = 5  # alert threshold: ≥5% error ratio in BOTH windows


def q_metric_burn_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-window SLO burn-rate alert (the Google-SRE two-window
    rule): a 5-minute window pages only when BOTH its own error ratio
    AND its enclosing hour's ratio breach the threshold — the fast
    window gives response time, the slow window suppresses blips.
    Two partial-aggregated window counts joined on the hour key (the
    hourly side is tiny → broadcast). The breach test cross-multiplies
    integer counts (err·100 ≥ pct·total) so no float ever enters the
    alert decision — exact in both engines."""
    ev = load_table(spark, sf_dir, "events")
    is_err = F.when(F.col("event_type") == "error", 1).otherwise(0)
    t_ms = F.unix_millis(F.col("ts"))
    fast = ev.groupBy(
        ((t_ms / F.lit(_BURN_FAST_MS)).cast("long") * F.lit(_BURN_FAST_MS)
         ).alias("window_ts_ms")
    ).agg(
        F.count(F.lit(1)).alias("n_fast"),
        F.sum(is_err).cast("long").alias("err_fast"),
    )
    slow = ev.groupBy(
        ((t_ms / F.lit(_HOUR_MS)).cast("long") * F.lit(_HOUR_MS)
         ).alias("hour_ts_ms")
    ).agg(
        F.count(F.lit(1)).alias("n_slow"),
        F.sum(is_err).cast("long").alias("err_slow"),
    )
    joined = fast.withColumn(
        "hour_ts_ms",
        F.expr(f"(window_ts_ms div {_HOUR_MS}) * {_HOUR_MS}"),
    ).join(F.broadcast(slow), "hour_ts_ms")
    burning = (
        (F.col("err_fast") * 100 >= F.lit(_BURN_PCT) * F.col("n_fast"))
        & (F.col("err_slow") * 100 >= F.lit(_BURN_PCT) * F.col("n_slow"))
    )
    return joined.select(
        "window_ts_ms",
        "n_fast",
        "err_fast",
        "n_slow",
        "err_slow",
        burning.alias("burning"),
    )


ORACLE_BURN_RATE = f"""
WITH fast AS (
  SELECT (epoch_ms(ts) // {_BURN_FAST_MS}) * {_BURN_FAST_MS}
           AS window_ts_ms,
         count(*) AS n_fast,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err_fast
  FROM events GROUP BY 1
), slow AS (
  SELECT {_W_SQL} AS hour_ts_ms, count(*) AS n_slow,
         CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
              AS BIGINT) AS err_slow
  FROM events GROUP BY 1
)
SELECT window_ts_ms, n_fast, err_fast, n_slow, err_slow,
       (err_fast * 100 >= {_BURN_PCT} * n_fast
        AND err_slow * 100 >= {_BURN_PCT} * n_slow) AS burning
FROM fast JOIN slow
  ON (window_ts_ms // {_HOUR_MS}) * {_HOUR_MS} = hour_ts_ms
""".strip()


def q_metric_cardinality_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Series-cardinality report per metric — the label-explosion
    audit every metric store needs (a runaway dimension multiplies
    state and cost): distinct series (user_id plays the dimension),
    sample volume, samples-per-series density, and each metric's
    share of total corpus cardinality. One exact distinct aggregate
    (two-level partial-able groupBy) + a broadcast 1-row total."""
    ev = load_table(spark, sf_dir, "events")
    per = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("n_series"),
        F.count(F.lit(1)).alias("n_samples"),
    )
    total = per.agg(F.sum("n_series").alias("total_series"))
    return (
        per.crossJoin(F.broadcast(total))
        .select(
            "event_type",
            "n_series",
            "n_samples",
            stable_round(
                F.col("n_samples").cast("double") / F.col("n_series"), 4
            ).alias("samples_per_series"),
            stable_round(
                F.col("n_series").cast("double") / F.col("total_series"), 4
            ).alias("cardinality_share"),
        )
    )


ORACLE_CARDINALITY = f"""
WITH per AS (
  SELECT event_type, count(DISTINCT user_id) AS n_series,
         count(*) AS n_samples
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(sum(n_series) AS BIGINT) AS total_series FROM per
)
SELECT event_type, n_series, n_samples,
       {sql_stable_round(
           "CAST(n_samples AS DOUBLE) / CAST(n_series AS DOUBLE)", 4)}
         AS samples_per_series,
       {sql_stable_round(
           "CAST(n_series AS DOUBLE) / CAST(total_series AS DOUBLE)", 4)}
         AS cardinality_share
FROM per, tot
""".strip()


def q_anomaly_seasonal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEASONAL-baseline anomaly score: each (metric, hour-window)'s
    value is z-scored against the SAME-HOUR-OF-DAY history — the
    baseline that catches a quiet 3 a.m. spike which a trailing-window
    z-score (`anomaly_zscore`) would wash out against busy daytime
    hours. Hourly aggregate → (metric, hour-of-day) baseline stats
    (≤ 24·|metrics| rows, broadcast back) → score. Exact integer-e6
    window sums; the baseline mean/std divide exact integers so both
    engines agree bit-for-bit. Windows with < 3 same-hour samples or
    zero variance emit NULL score (insufficient baseline)."""
    ev = load_table(spark, sf_dir, "events")
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    hourly = (
        ev.groupBy(
            "event_type",
            (
                (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
                * F.lit(_HOUR_MS)
            ).alias("window_ts_ms"),
        )
        .agg(
            (F.sum(v_e6).cast("double") / (F.count(F.lit(1)) * 1_000_000.0)
             ).alias("wv")
        )
    )
    hod = F.expr(f"(window_ts_ms div {_HOUR_MS}) % 24")
    # r11 (guide §2.4): the hourly series feeds the hour-of-day
    # baseline aggregate AND the score join-back — uncached, the
    # events scan+shuffle re-executed per branch; the relation is
    # bounded at |metrics|×|hours| (2 events FileScans → 1).
    with_hod = hourly.withColumn("hod", hod).cache()
    base = with_hod.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n_hist"),
        F.avg("wv").alias("mu"),
        F.stddev_samp("wv").alias("sd"),
    )
    score = F.when(
        (F.col("n_hist") >= 3) & (F.col("sd") > 0),
        stable_round((F.col("wv") - F.col("mu")) / F.col("sd"), 4),
    )
    return (
        with_hod.join(F.broadcast(base), ["event_type", "hod"])
        .select(
            "event_type",
            "window_ts_ms",
            F.col("hod").cast("long").alias("hod"),
            stable_round(F.col("wv"), 4).alias("wv"),
            "n_hist",
            score.alias("season_z"),
        )
    )


ORACLE_ANOMALY_SEASONAL = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
              AS DOUBLE) / (count(*) * 1000000.0::DOUBLE) AS wv
  FROM events GROUP BY 1, 2
), h AS (
  SELECT *, (window_ts_ms // {_HOUR_MS}) % 24 AS hod FROM hourly
), base AS (
  SELECT event_type, hod, count(*) AS n_hist,
         avg(wv) AS mu, stddev_samp(wv) AS sd
  FROM h GROUP BY 1, 2
)
SELECT h.event_type, h.window_ts_ms, CAST(h.hod AS BIGINT) AS hod,
       {sql_stable_round("h.wv", 4)} AS wv,
       base.n_hist,
       CASE WHEN base.n_hist >= 3 AND base.sd > 0
            THEN {sql_stable_round("(h.wv - base.mu) / base.sd", 4)}
       END AS season_z
FROM h JOIN base USING (event_type, hod)
""".strip()


def q_metric_wow_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week change per (metric, day): each day's volume and
    e6-exact value sum against the same weekday one week earlier
    (lag 7 on the collapsed daily series — a per-series window over a
    day-count-bounded relation, not the raw corpus). The change ratio
    divides exact integers; days without a prior week emit NULL."""
    ev = load_table(spark, sf_dir, "events")
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    daily = ev.groupBy(
        "event_type", F.to_date("ts").cast("string").alias("day")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v_e6).alias("sum_e6"),
    )
    w = Window.partitionBy("event_type").orderBy("day")
    prev_n = F.lag("n", 7).over(w)
    prev_sum = F.lag("sum_e6", 7).over(w)
    return daily.select(
        "event_type",
        "day",
        "n",
        prev_n.alias("n_prev_week"),
        F.when(
            prev_n > 0,
            stable_round(
                F.col("n").cast("double") / prev_n.cast("double"), 4
            ),
        ).alias("count_wow"),
        F.when(
            prev_sum > 0,
            stable_round(
                F.col("sum_e6").cast("double") / prev_sum.cast("double"), 4
            ),
        ).alias("value_wow"),
    )


ORACLE_WOW = f"""
WITH daily AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         count(*) AS n,
         CAST(sum(CAST(floor(value * 1000000.0 + 0.5) AS BIGINT))
              AS BIGINT) AS sum_e6
  FROM events GROUP BY 1, 2
), lagged AS (
  SELECT *,
         lag(n, 7) OVER (PARTITION BY event_type ORDER BY day) AS pn,
         lag(sum_e6, 7) OVER (PARTITION BY event_type ORDER BY day) AS ps
  FROM daily
)
SELECT event_type, day, n, pn AS n_prev_week,
       CASE WHEN pn > 0
            THEN {sql_stable_round(
                "CAST(n AS DOUBLE) / CAST(pn AS DOUBLE)", 4)}
       END AS count_wow,
       CASE WHEN ps > 0
            THEN {sql_stable_round(
                "CAST(sum_e6 AS DOUBLE) / CAST(ps AS DOUBLE)", 4)}
       END AS value_wow
FROM lagged
""".strip()


# ---------------------------------------- longest silent gap per metric


def q_metric_longest_gap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest SILENT GAP per metric: the widest stretch of hourly
    windows with no samples, and when it began — ``metric_staleness``
    answers "is it silent NOW?", this answers "what's the worst outage
    this series ever had?" (the coverage question asked before
    trusting a backfill or an SLA report). Consecutive-window deltas
    via lag over the COLLAPSED distinct-window series (bounded by
    corpus-span hours, never raw rows); argmax by (gap, earliest
    start) through one max_by struct — unique key, engine-stable."""
    ev = load_table(spark, sf_dir, "events")
    wins = ev.select(
        "event_type", _hourly_window()
    ).distinct()
    lagw = Window.partitionBy("event_type").orderBy("window_ts_ms")
    gaps = wins.select(
        "event_type",
        "window_ts_ms",
        (
            F.col("window_ts_ms")
            - F.lag("window_ts_ms").over(lagw)
            - F.lit(_HOUR_MS)
        ).alias("gap_ms"),
        F.lag("window_ts_ms").over(lagw).alias("prev_ms"),
    ).filter(F.col("gap_ms").isNotNull())
    pick = F.struct(F.col("gap_ms"), (-F.col("prev_ms")).alias("np"))
    return gaps.groupBy("event_type").agg(
        (F.count(F.lit(1)) + 1).alias("n_windows"),
        F.sum(F.when(F.col("gap_ms") > 0, 1).otherwise(0)).alias("n_gaps"),
        (F.max("gap_ms") / F.lit(_HOUR_MS)).cast("long").alias(
            "longest_gap_hours"
        ),
        (F.max_by("prev_ms", pick) + F.lit(_HOUR_MS)).alias(
            "gap_start_ms"
        ),
    )


ORACLE_LONGEST_GAP = f"""
WITH wins AS (
  SELECT DISTINCT event_type, {_W_SQL} AS w FROM events
),
gaps AS (
  SELECT event_type, w,
         w - lag(w) OVER (PARTITION BY event_type ORDER BY w)
           - {_HOUR_MS} AS gap_ms,
         lag(w) OVER (PARTITION BY event_type ORDER BY w) AS prev_ms
  FROM wins
)
SELECT event_type,
       count(*) + 1 AS n_windows,
       CAST(sum(CASE WHEN gap_ms > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_gaps,
       CAST(max(gap_ms) // {_HOUR_MS} AS BIGINT) AS longest_gap_hours,
       max(CASE WHEN rk = 1 THEN prev_ms END) + {_HOUR_MS}
         AS gap_start_ms
FROM (
  SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY gap_ms DESC, prev_ms ASC) AS rk
  FROM gaps WHERE gap_ms IS NOT NULL
)
GROUP BY event_type
""".strip()


def q_metric_flappiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold FLAPPINESS report per metric (r8): how often the
    hourly series CROSSES the alert threshold (sign changes of
    value−HI between consecutive windows) and the longest
    continuously-above run — the tuning readout behind
    `metric_alert_hysteresis`: a metric with many crossings and short
    runs needs a wider HI/LO gap before its alert rule pages anyone.
    Same e4 fixed-point hourly series and per-metric lag() window;
    the run-length is the gaps-and-islands group count, all exact
    integers, metric-sized output."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.floor(F.avg(F.col("value") * 10000) + F.lit(0.5))
        .cast("long")
        .alias("wv_e4")
    )
    w_ord = Window.partitionBy("event_type").orderBy("window_ts_ms")
    above = (F.col("wv_e4") > _ALERT_HI_E4).cast("int")
    state = hourly.select(
        "event_type", "window_ts_ms", above.alias("ab")
    ).withColumn("prev_ab", F.lag("ab").over(w_ord))
    crossings = state.withColumn(
        "crossed",
        (
            F.col("prev_ab").isNotNull()
            & (F.col("ab") != F.col("prev_ab"))
        ).cast("long"),
    )
    # gaps-and-islands: run id = cumulative crossing count
    run_id = F.sum("crossed").over(
        w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        crossings.withColumn("run_id", run_id)
        .groupBy("event_type", "run_id")
        .agg(
            F.first("ab").alias("ab"),
            F.count(F.lit(1)).alias("run_len"),
        )
    )
    per_runs = runs.groupBy("event_type").agg(
        F.max(
            F.when(F.col("ab") == 1, F.col("run_len")).otherwise(0)
        ).cast("long").alias("longest_above_run"),
    )
    per_cross = crossings.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum("crossed").cast("long").alias("n_crossings"),
        F.sum(F.col("ab").cast("long")).cast("long").alias("n_above"),
    )
    return per_cross.join(per_runs, "event_type").select(
        "event_type",
        "n_windows",
        "n_above",
        "n_crossings",
        "longest_above_run",
    )


ORACLE_FLAPPINESS = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         CAST(floor(avg(value * 10000) + 0.5) AS BIGINT) AS wv_e4
  FROM events GROUP BY 1, 2
), st AS (
  SELECT event_type, window_ts_ms,
         CASE WHEN wv_e4 > {_ALERT_HI_E4} THEN 1 ELSE 0 END AS ab,
         lag(CASE WHEN wv_e4 > {_ALERT_HI_E4} THEN 1 ELSE 0 END)
           OVER w AS prev_ab
  FROM hourly
  WINDOW w AS (PARTITION BY event_type ORDER BY window_ts_ms)
), cr AS (
  SELECT *,
         CASE WHEN prev_ab IS NOT NULL AND ab != prev_ab
              THEN 1 ELSE 0 END AS crossed
  FROM st
), runs_src AS (
  SELECT *,
         sum(crossed) OVER (PARTITION BY event_type
                            ORDER BY window_ts_ms
                            ROWS UNBOUNDED PRECEDING) AS run_id
  FROM cr
), runs AS (
  SELECT event_type, run_id, any_value(ab) AS ab,
         count(*) AS run_len
  FROM runs_src GROUP BY 1, 2
), per_runs AS (
  SELECT event_type,
         CAST(max(CASE WHEN ab = 1 THEN run_len ELSE 0 END) AS BIGINT)
           AS longest_above_run
  FROM runs GROUP BY 1
), per_cross AS (
  SELECT event_type, count(*) AS n_windows,
         CAST(sum(ab) AS BIGINT) AS n_above,
         CAST(sum(crossed) AS BIGINT) AS n_crossings
  FROM cr GROUP BY 1
)
SELECT event_type, n_windows, n_above, n_crossings, longest_above_run
FROM per_cross JOIN per_runs USING (event_type)
""".strip()


def q_metric_type_inference(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric TYPE inference (r8): classify each metric as counter /
    gauge from its per-series delta signature — the metadata audit a
    metrics store runs when instrumentation ships no type hints
    (Prometheus counter vs gauge semantics decide whether
    increase()/rate() or avg() is even meaningful downstream — rows
    18n/8 consume the answer). Per series (metric, user) the deltas
    come from one lag() window on exact e6 integers; per metric the
    report carries n_deltas, the non-negative share, and the CASE
    classification (counter ≥99% non-negative, mostly_monotonic ≥80%,
    else gauge). Output is metric-count-sized."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type", "user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    d = ev.select(
        "event_type", (v_e6 - F.lag(v_e6).over(w)).alias("delta")
    ).filter(F.col("delta").isNotNull())
    per = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_deltas"),
        F.sum((F.col("delta") >= 0).cast("long")).alias("n_nonneg"),
    )
    share = F.col("n_nonneg").cast("double") / F.col("n_deltas").cast(
        "double"
    )
    return per.select(
        "event_type",
        "n_deltas",
        stable_round(share, 4).alias("nonneg_share"),
        F.when(share >= 0.99, F.lit("counter"))
        .when(share >= 0.80, F.lit("mostly_monotonic"))
        .otherwise(F.lit("gauge"))
        .alias("inferred_type"),
    )


ORACLE_TYPE_INFERENCE = f"""
WITH v AS (
  SELECT event_type, user_id, ts, event_id,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6
  FROM events
), d AS (
  SELECT event_type,
         v_e6 - lag(v_e6) OVER (PARTITION BY event_type, user_id
                                ORDER BY ts, event_id) AS delta
  FROM v
), per AS (
  SELECT event_type, count(*) AS n_deltas,
         sum(CASE WHEN delta >= 0 THEN 1 ELSE 0 END) AS n_nonneg
  FROM d WHERE delta IS NOT NULL GROUP BY 1
)
SELECT event_type, CAST(n_deltas AS BIGINT) AS n_deltas,
       {sql_stable_round(
           "CAST(n_nonneg AS DOUBLE) / CAST(n_deltas AS DOUBLE)", 4)}
         AS nonneg_share,
       CASE WHEN n_nonneg::DOUBLE / n_deltas >= 0.99 THEN 'counter'
            WHEN n_nonneg::DOUBLE / n_deltas >= 0.80
              THEN 'mostly_monotonic'
            ELSE 'gauge' END AS inferred_type
FROM per
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "anomaly_seasonal": q_anomaly_seasonal,
    "metric_availability": q_metric_availability,
    "metric_out_of_order": q_metric_out_of_order,
    "metric_wow_change": q_metric_wow_change,
    "metric_burn_rate": q_metric_burn_rate,
    "metric_cardinality_report": q_metric_cardinality_report,
    "metric_ewma": q_metric_ewma,  # rows-only (order-dependent fold)
    "metric_twa": q_metric_twa,
    "agg_stddev": q_agg_stddev,
    "metric_alert_hysteresis": q_metric_alert_hysteresis,
    "metric_downsample_m4": q_metric_downsample_m4,
    "metric_winsorize": q_metric_winsorize,
    "metric_correlation": q_metric_correlation,
    "metric_lead_lag": q_metric_lead_lag,
    "metric_topk_movers": q_metric_topk_movers,
    "metric_counter_rate": q_metric_counter_rate,
    "metric_rate_prom": q_metric_rate_prom,
    "metric_type_inference": q_metric_type_inference,
    "metric_flappiness": q_metric_flappiness,
    "metric_retention_tiers": q_metric_retention_tiers,
    "metric_histogram_equidepth": q_metric_histogram_equidepth,
    "metric_staleness": q_metric_staleness,
    "metric_longest_gap": q_metric_longest_gap,
}

ORACLES: dict[str, str] = {
    "metric_rate_prom": ORACLE_RATE_PROM,
    "metric_longest_gap": ORACLE_LONGEST_GAP,
    "anomaly_seasonal": ORACLE_ANOMALY_SEASONAL,
    "metric_availability": ORACLE_AVAILABILITY,
    "metric_out_of_order": ORACLE_OUT_OF_ORDER,
    "metric_wow_change": ORACLE_WOW,
    "metric_burn_rate": ORACLE_BURN_RATE,
    "metric_cardinality_report": ORACLE_CARDINALITY,
    "metric_twa": ORACLE_TWA,
    "agg_stddev": ORACLE_STDDEV,
    "metric_alert_hysteresis": ORACLE_ALERT,
    "metric_downsample_m4": ORACLE_M4,
    "metric_winsorize": ORACLE_WINSORIZE,
    "metric_correlation": ORACLE_CORRELATION,
    "metric_lead_lag": ORACLE_LEAD_LAG,
    "metric_topk_movers": ORACLE_TOPK_MOVERS,
    "metric_counter_rate": ORACLE_COUNTER_RATE,
    "metric_type_inference": ORACLE_TYPE_INFERENCE,
    "metric_flappiness": ORACLE_FLAPPINESS,
    "metric_retention_tiers": ORACLE_RETENTION_TIERS,
    "metric_histogram_equidepth": ORACLE_HISTOGRAM_EQUIDEPTH,
    "metric_staleness": ORACLE_STALENESS,
}
