"""Series set-operations + robust-statistics queries (events table).

Extends plans/series.py with four capabilities a monitoring pipeline
reaches for next, each one past the edge of what the reference's
per-window aggregates (/root/reference/aggregation/*.go) can express:

- KMV sketch SET OPERATIONS (operators/kmv.py): distinct-count
  intersections across segments and across adjacent windows — the
  question HLL union (plans/metrics.py `agg_distinct_rollup_hll`)
  structurally cannot answer.
- MAD robust anomaly: median/median-absolute-deviation outlier flags,
  immune to the outliers that inflate the mean/σ z-score's own
  baseline (complements `anomaly_zscore` and `anomaly_seasonal`).
- CUSUM changepoint: cumulative-sum drift detection expressed as
  prefix-sum minus running-extremum — pure window functions, no
  order-dependent UDF fold.
- Alert cooldown: gaps-and-islands incident grouping so one sustained
  breach pages once, not once per window (the operational complement
  of `metric_alert_hysteresis`).

All four share the series family's scale posture: the raw scan is
aggregated to a per-(metric, hour) series FIRST (one shuffle with
map-side partials; the collapsed series is |metrics| x |hours| rows,
orders of magnitude smaller than the input), and everything after
operates on that collapsed series with broadcast join-backs or
per-metric window functions.  Numerics are exact-integer or
whole-number-in-double throughout so the DuckDB oracle hashes match
bit-for-bit.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.operators.kmv import (
    kmv_agg_if,
    kmv_estimate,
    kmv_intersect_estimate,
)
from monasca_aggregator_spark.sources.tables import load_table

_HOUR_MS = 3600 * 1000
_W_SQL = f"(epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS}"
_KMV_K = 1024  # exact below 1024 distinct/group; ±~3% beyond


def _hourly_window() -> F.Column:
    return (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
        * F.lit(_HOUR_MS)
    ).alias("window_ts_ms")


# ------------------------------------------------- KMV segment overlap


def q_agg_distinct_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per hourly window: distinct clickers, distinct purchasers, and
    their INTERSECTION / union / Jaccard — "how many of this hour's
    buyers also clicked" — via KMV sketches (operators/kmv.py).

    One shuffle keyed by window; both sketches build in the same
    groupBy pass over one scan (conditional collect, NULLs skipped),
    so adding a segment adds a column, not a pass.  State is <= 2k
    hashes per window regardless of user count; at k=1024 the sketch
    is exact below 1024 distinct users/window (always true at test
    SFs -> DuckDB oracle-exact) and ±~3% beyond (the 100 TB mode).
    """
    ev = (
        load_table(spark, sf_dir, "events")
        .select("ts", "user_id", "event_type")
        .filter(F.col("event_type").isin("click", "purchase"))
    )
    is_click = F.col("event_type") == "click"
    g = ev.groupBy(_hourly_window()).agg(
        kmv_agg_if(F.col("user_id"), is_click, _KMV_K).alias("sk_a"),
        kmv_agg_if(F.col("user_id"), ~is_click, _KMV_K).alias("sk_b"),
    )
    n_both = kmv_intersect_estimate(
        F.col("sk_a"), F.col("sk_b"), _KMV_K
    ).cast("long")
    n_a = kmv_estimate(F.col("sk_a"), _KMV_K).cast("long")
    n_b = kmv_estimate(F.col("sk_b"), _KMV_K).cast("long")
    return g.select(
        "window_ts_ms",
        n_a.alias("n_click"),
        n_b.alias("n_purchase"),
        n_both.alias("n_both"),
        (n_a + n_b - n_both).alias("n_union"),
        (
            n_both.cast("double") / (n_a + n_b - n_both).cast("double")
        ).alias("jaccard"),
    )


ORACLE_DISTINCT_OVERLAP = f"""
WITH w AS (
  SELECT {_W_SQL} AS window_ts_ms, user_id,
         bool_or(event_type = 'click') AS a,
         bool_or(event_type = 'purchase') AS b
  FROM events
  WHERE event_type IN ('click', 'purchase')
  GROUP BY 1, 2
)
SELECT window_ts_ms,
       count(*) FILTER (a) AS n_click,
       count(*) FILTER (b) AS n_purchase,
       count(*) FILTER (a AND b) AS n_both,
       count(*) AS n_union,
       CAST(count(*) FILTER (a AND b) AS DOUBLE)
         / CAST(count(*) AS DOUBLE) AS jaccard
FROM w GROUP BY 1
""".strip()


# ---------------------------------------------- KMV window stickiness


def q_agg_window_stickiness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Hour-over-hour user stickiness: |active(W) ∩ active(W-1h)| and
    the retained fraction of the previous hour's actives — sketch
    REUSE across windows (build the per-window KMV once, then answer
    every adjacent-window intersection from the sketch table alone,
    no second raw scan).

    The sketch table is |hours| rows; the adjacency is a self-join on
    window_ts_ms - 1h (broadcastable, never a global-order window
    function).  Windows with no predecessor hour report NULLs — a gap
    is "unknown", not "0 retained".
    """
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    sk = ev.groupBy(_hourly_window()).agg(
        kmv_agg_if(F.col("user_id"), F.lit(True), _KMV_K).alias("sk")
    )
    prev = sk.select(
        (F.col("window_ts_ms") + F.lit(_HOUR_MS)).alias("window_ts_ms"),
        F.col("sk").alias("sk_prev"),
    )
    j = sk.join(F.broadcast(prev), "window_ts_ms", "left")
    n_active = kmv_estimate(F.col("sk"), _KMV_K).cast("long")
    n_prev = kmv_estimate(F.col("sk_prev"), _KMV_K).cast("long")
    n_ret = kmv_intersect_estimate(
        F.col("sk"), F.col("sk_prev"), _KMV_K
    ).cast("long")
    return j.select(
        "window_ts_ms",
        n_active.alias("n_active"),
        n_prev.alias("n_prev"),
        n_ret.alias("n_retained"),
        (n_ret.cast("double") / n_prev.cast("double")).alias(
            "retention_ratio"
        ),
    )


ORACLE_WINDOW_STICKINESS = f"""
WITH w AS (
  SELECT DISTINCT {_W_SQL} AS w_ms, user_id FROM events
), c AS (
  SELECT w_ms, count(*) AS n FROM w GROUP BY 1
), i AS (
  SELECT a.w_ms, count(*) AS nb
  FROM w a JOIN w b
    ON b.user_id = a.user_id AND b.w_ms = a.w_ms - {_HOUR_MS}
  GROUP BY 1
)
SELECT c.w_ms AS window_ts_ms,
       c.n AS n_active,
       p.n AS n_prev,
       CASE WHEN p.n IS NULL THEN NULL
            ELSE COALESCE(i.nb, 0) END AS n_retained,
       CASE WHEN p.n IS NULL THEN NULL
            ELSE CAST(COALESCE(i.nb, 0) AS DOUBLE)
                 / CAST(p.n AS DOUBLE) END AS retention_ratio
FROM c
LEFT JOIN c p ON p.w_ms = c.w_ms - {_HOUR_MS}
LEFT JOIN i ON i.w_ms = c.w_ms
""".strip()


# ------------------------------------------------- MAD robust anomaly

# flag when |v - median| > 3 * 1.4826 * MAD, evaluated in scaled
# integers: dev = dev2/2 with dev2 = |2v - med2|, mad = mad4/4 with
# mad4 = 2*median(dev2); dev > 4.4478*mad  <=>
# dev2/2 > 4.4478*mad4/4  <=>  20000*dev2 > 44478*mad4  (x10000).
_MAD_NUM = 44478
_MAD_LHS = 20000


def q_metric_mad_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-metric outlier flags: hourly load v (sum of cent
    values, exact BIGINT) vs the metric's MEDIAN and MAD — the
    median-based siblings of `anomaly_zscore`'s mean/σ, robust to the
    very outliers being hunted (one giant spike inflates σ enough to
    hide the next one; it barely moves the MAD).

    Three aggregations over progressively tiny data: raw -> hourly
    series (one shuffle, map-side partials), series -> per-metric
    median (|metrics| rows, broadcast back), deviations -> per-metric
    MAD (broadcast back).  The decision inequality
    20000*dev2 > 44478*mad4 is pure BIGINT cross-multiplication —
    doubled/quadrupled fixed-point medians, no float in the flag.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    # r11 (guide §2.4): `hourly` feeds the median AND the deviation
    # join, `dev` feeds the MAD AND the output join — uncached, the
    # corpus scan re-executed 4×. Both are |metrics|×|hours|-bounded.
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    ).cache()
    med = hourly.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(v, 0.5D) AS BIGINT)").alias("med2")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(F.lit(2) * F.col("v") - F.col("med2"))
    ).cache()
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(dev2, 0.5D) AS BIGINT)").alias("mad4")
    )
    out = dev.join(F.broadcast(mad), "event_type")
    return out.select(
        "event_type",
        "window_ts_ms",
        "v",
        (F.col("med2").cast("double") / F.lit(2.0)).alias("median_v"),
        (F.col("mad4").cast("double") / F.lit(4.0)).alias("mad_v"),
        (
            F.col("dev2") * F.lit(_MAD_LHS)
            > F.col("mad4") * F.lit(_MAD_NUM)
        ).alias("is_anomaly"),
    )


ORACLE_MAD_ANOMALY = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), m AS (
  SELECT event_type, CAST(2 * median(v) AS BIGINT) AS med2
  FROM e GROUP BY 1
), d AS (
  SELECT e.*, m.med2, abs(2 * e.v - m.med2) AS dev2
  FROM e JOIN m USING (event_type)
), md AS (
  SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4
  FROM d GROUP BY 1
)
SELECT d.event_type, d.window_ts_ms,
       CAST(d.v AS BIGINT) AS v,
       CAST(d.med2 AS DOUBLE) / 2.0 AS median_v,
       CAST(md.mad4 AS DOUBLE) / 4.0 AS mad_v,
       d.dev2 * {_MAD_LHS} > md.mad4 * {_MAD_NUM} AS is_anomaly
FROM d JOIN md USING (event_type)
""".strip()


# --------------------------------------------------- CUSUM changepoint

_CUSUM_H = 5.0  # alarm threshold in per-window sigma units


def q_metric_cusum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric CUSUM drift detection over the hourly series.

    The textbook recursion S+_t = max(0, S+_{t-1} + x_t - mu) looks
    order-dependent, but rewrites exactly as prefix-sum minus running
    minimum: S+_t = P_t - min_{i<=t} P_i with P_t = sum(x_i - mu).
    Centering by the per-metric mean mu = T/n is kept integral by
    scaling through n: P'_t = n*C_t - t*T (C_t = cumulative sum), so
    S+ = (P'_t - runmin P'_t)/n — every comparison input is exact
    BIGINT window arithmetic, identical on both engines.

    Alarm when S+ or S- exceeds H=5 sigma of the per-metric series
    (sigma from exact integer moments, same construction as
    `agg_stddev`).  Plan: one raw shuffle to the hourly series, then
    per-metric window functions over |hours| rows and one broadcast
    join of |metrics| stat rows.  (BIGINT headroom: |n*C_t| <=
    n_windows * sum(e2); at 2^63 that allows ~1e14 windows x values —
    re-scale to days or decimal(38) long before that.)
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    )
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("t_sum"),
        F.sum(F.col("v") * F.col("v")).alias("t_sq"),
    )
    w = (
        Window.partitionBy("event_type")
        .orderBy("window_ts_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = hourly.join(F.broadcast(stats), "event_type")
    d = d.withColumn("c_t", F.sum("v").over(w)).withColumn(
        "t_idx", F.count(F.lit(1)).over(w)
    )
    p = F.col("c_t") * F.col("n") - F.col("t_idx") * F.col("t_sum")
    d = d.withColumn("p_t", p)
    d = d.withColumn("p_min", F.min("p_t").over(w)).withColumn(
        "p_max", F.max("p_t").over(w)
    )
    n = F.col("n")
    var = F.when(
        n > 1,
        (F.col("t_sq") * n - F.col("t_sum") * F.col("t_sum")).cast(
            "double"
        )
        / (n * (n - 1)).cast("double"),
    ).otherwise(F.lit(0.0))
    sigma = F.sqrt(var)
    s_plus = (F.col("p_t") - F.col("p_min")).cast("double") / n.cast(
        "double"
    )
    s_minus = (F.col("p_max") - F.col("p_t")).cast("double") / n.cast(
        "double"
    )
    return d.select(
        "event_type",
        "window_ts_ms",
        "v",
        s_plus.alias("cusum_pos"),
        s_minus.alias("cusum_neg"),
        # |P_t|/n — argmax over t is the offline changepoint location
        # estimator (S+ alone peaks at series end after a recovery)
        (F.abs(F.col("p_t")).cast("double") / n.cast("double")).alias(
            "changepoint_stat"
        ),
        (
            (s_plus > sigma * F.lit(_CUSUM_H))
            | (s_minus > sigma * F.lit(_CUSUM_H))
        ).alias("is_change"),
    )


ORACLE_CUSUM = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, count(*) AS n, sum(v) AS t_sum,
         sum(v * v) AS t_sq
  FROM e GROUP BY 1
), d AS (
  SELECT e.event_type, e.window_ts_ms, e.v, s.n, s.t_sum, s.t_sq,
         sum(e.v) OVER win AS c_t,
         count(*) OVER win AS t_idx
  FROM e JOIN s USING (event_type)
  WINDOW win AS (PARTITION BY e.event_type ORDER BY e.window_ts_ms
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
), p AS (
  SELECT *, c_t * n - t_idx * t_sum AS p_t FROM d
), r AS (
  SELECT *,
         min(p_t) OVER win AS p_min,
         max(p_t) OVER win AS p_max,
         CASE WHEN n > 1 THEN
           sqrt(CAST(t_sq * n - t_sum * t_sum AS DOUBLE)
                / CAST(n * (n - 1) AS DOUBLE))
         ELSE 0.0 END AS sigma
  FROM p
  WINDOW win AS (PARTITION BY event_type ORDER BY window_ts_ms
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
)
SELECT event_type, window_ts_ms, CAST(v AS BIGINT) AS v,
       CAST(p_t - p_min AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_pos,
       CAST(p_max - p_t AS DOUBLE) / CAST(n AS DOUBLE) AS cusum_neg,
       CAST(abs(p_t) AS DOUBLE) / CAST(n AS DOUBLE)
         AS changepoint_stat,
       (CAST(p_t - p_min AS DOUBLE) / CAST(n AS DOUBLE)
          > sigma * {_CUSUM_H})
       OR (CAST(p_max - p_t AS DOUBLE) / CAST(n AS DOUBLE)
          > sigma * {_CUSUM_H}) AS is_change
FROM r
""".strip()


# ----------------------------------------------------- alert cooldown

_COOLDOWN_MS = 3 * _HOUR_MS  # new incident only after a 3 h quiet gap


def q_metric_alert_cooldown(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incident grouping with a cooldown: hourly breach windows
    (hourly mean above the metric's overall mean, exact cross-
    multiplied integer test s1*N > T*cnt) collapse into ONE incident
    row while gaps stay within 3 h — a sustained breach pages once,
    with its span and window count, not once per hour.

    Gaps-and-islands: lag() the breach windows per metric, mark island
    starts where the gap exceeds the cooldown, running-sum the marks
    into an incident id, then aggregate per incident.  All operators
    after the first shuffle act on the breach subset of the collapsed
    series — tiny — and every ordering key is unique (metric, window),
    so the plan is deterministic on both engines.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("s1"), F.count(F.lit(1)).alias("cnt")
    )
    tot = hourly.groupBy("event_type").agg(
        F.sum("s1").alias("t_sum"), F.sum("cnt").alias("t_cnt")
    )
    j = hourly.join(F.broadcast(tot), "event_type")
    # mean_hour > mean_overall  <=>  s1 * t_cnt > t_sum * cnt
    breaches = j.filter(
        F.col("s1") * F.col("t_cnt") > F.col("t_sum") * F.col("cnt")
    )
    ordw = Window.partitionBy("event_type").orderBy("window_ts_ms")
    runw = (
        Window.partitionBy("event_type")
        .orderBy("window_ts_ms")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = breaches.withColumn(
        "is_new",
        F.when(
            F.lag("window_ts_ms").over(ordw).isNull()
            | (
                F.col("window_ts_ms") - F.lag("window_ts_ms").over(ordw)
                > F.lit(_COOLDOWN_MS)
            ),
            F.lit(1),
        ).otherwise(F.lit(0)),
    ).withColumn("incident_id", F.sum("is_new").over(runw))
    return marked.groupBy("event_type", "incident_id").agg(
        F.min("window_ts_ms").alias("incident_start_ms"),
        F.max("window_ts_ms").alias("incident_end_ms"),
        F.count(F.lit(1)).alias("n_breach_windows"),
    )


ORACLE_ALERT_COOLDOWN = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s1,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, sum(s1) AS t_sum, sum(cnt) AS t_cnt
  FROM e GROUP BY 1
), b AS (
  SELECT e.event_type, e.window_ts_ms
  FROM e JOIN t USING (event_type)
  WHERE e.s1 * t.t_cnt > t.t_sum * e.cnt
), m AS (
  SELECT event_type, window_ts_ms,
         CASE WHEN lag(window_ts_ms) OVER w IS NULL
                OR window_ts_ms - lag(window_ts_ms) OVER w
                   > {_COOLDOWN_MS}
              THEN 1 ELSE 0 END AS is_new
  FROM b
  WINDOW w AS (PARTITION BY event_type ORDER BY window_ts_ms)
), g AS (
  SELECT *, sum(is_new) OVER (PARTITION BY event_type
                              ORDER BY window_ts_ms
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND CURRENT ROW) AS incident_id
  FROM m
)
SELECT event_type, CAST(incident_id AS BIGINT) AS incident_id,
       min(window_ts_ms) AS incident_start_ms,
       max(window_ts_ms) AS incident_end_ms,
       count(*) AS n_breach_windows
FROM g GROUP BY 1, 2
""".strip()


_ACF_MAX_LAG = 12  # correlogram depth in hours


def q_metric_correlogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ACF CORRELOGRAM per metric (r9): Pearson autocorrelation at
    every lag 1..{_ACF_MAX_LAG} hours over the hourly series — the
    full Box-Jenkins identification view the single-lag rows (lag-24
    seasonality strength, AR(1) φ) sample one point of: a slow decay
    says trend/AR, a spike at k says period-k seasonality, and the
    first insignificant lag calibrates every trailing-window baseline
    the anomaly family uses.

    Exactness: paired sums n, Σx, Σy, Σxy, Σx², Σy² are exact
    integers (cross products in DEC38/HUGEINT); each r is one
    closed-form float over them, identical in both engines.

    Scale: the raw scan collapses to the |metrics|×|hours| series
    once; the lag pairing is ONE equi-join of that collapsed series
    against its {_ACF_MAX_LAG}-fold lag explosion (join key (metric,
    hour) — series-sized × lag count, never raw rows); the Pearson
    sums aggregate with map-side partials to |metrics|×lags rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    hourly = ev.groupBy(
        "event_type",
        F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("h"),
    ).agg(F.sum("e2").alias("v"))
    lagged = hourly.select(
        "event_type",
        F.explode(
            F.sequence(F.lit(1), F.lit(_ACF_MAX_LAG))
        ).alias("lag"),
        (F.col("h") + F.col("lag")).alias("h2"),
        F.col("v").alias("x"),
    )
    y = hourly.select(
        "event_type", F.col("h").alias("h2"), F.col("v").alias("y")
    )
    dec = "decimal(38,0)"
    sums = (
        lagged.join(y, ["event_type", "h2"])
        .groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias(
                "sxy"
            ),
            F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias(
                "sxx"
            ),
            F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias(
                "syy"
            ),
        )
        .filter(F.col("n") >= 3)
    )
    num = (
        F.col("n").cast(dec) * F.col("sxy")
        - F.col("sx").cast(dec) * F.col("sy").cast(dec)
    ).cast("double")
    vx = (
        F.col("n").cast(dec) * F.col("sxx")
        - F.col("sx").cast(dec) * F.col("sx").cast(dec)
    ).cast("double")
    vy = (
        F.col("n").cast(dec) * F.col("syy")
        - F.col("sy").cast(dec) * F.col("sy").cast(dec)
    ).cast("double")
    return sums.select(
        "event_type",
        "lag",
        F.col("n").alias("n_pairs"),
        stable_round(num / F.sqrt(vx * vy), 6).alias("acf"),
    )


ORACLE_CORRELOGRAM = f"""
WITH hourly AS (
  SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT a.event_type, l.lag, a.v AS x, b.v AS y
  FROM hourly a,
       unnest(range(1, {_ACF_MAX_LAG} + 1)) AS l(lag),
       hourly b
  WHERE b.event_type = a.event_type AND b.h = a.h + l.lag
), s AS (
  SELECT event_type, lag, count(*) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY 1, 2 HAVING count(*) >= 3
)
SELECT event_type, CAST(lag AS INT) AS lag,
       CAST(n AS BIGINT) AS n_pairs,
       {sql_stable_round(
           "CAST(CAST(n AS HUGEINT) * sxy"
           " - CAST(sx AS HUGEINT) * sy AS DOUBLE)"
           " / sqrt(CAST(CAST(n AS HUGEINT) * sxx"
           "             - CAST(sx AS HUGEINT) * sx AS DOUBLE)"
           "        * CAST(CAST(n AS HUGEINT) * syy"
           "               - CAST(sy AS HUGEINT) * sy AS DOUBLE))",
           6)} AS acf
FROM s
""".strip()


def q_metric_fano_factor(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FANO FACTOR of hourly event COUNTS per metric (r9): var/mean
    of the counting process — the dispersion classifier that
    complements the per-user inter-arrival CV: F ≈ 1 is Poisson
    (memoryless traffic), F ≫ 1 over-dispersed (bursty/incident-
    driven, trailing-window baselines will over-page), F < 1
    under-dispersed (metronomic/scheduled — a bot or a cron). Uses
    population variance from exact integer count moments:
    F = (k·Σc² − (Σc)²) / (k·Σc) with k hourly windows.

    Exactness: Σc² carried in DEC38/HUGEINT; one final division.
    Scale: the raw scan collapses to |metrics|×|hours| counts, then
    a metric-sized aggregate."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", "ts"
    )
    hourly = ev.groupBy(
        "event_type",
        F.expr(f"unix_millis(ts) div {_HOUR_MS}").alias("h"),
    ).agg(F.count(F.lit(1)).alias("c"))
    dec = "decimal(38,0)"
    per = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("c").alias("s"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias(
            "q"
        ),
    )
    num = (
        F.col("k").cast(dec) * F.col("q")
        - F.col("s").cast(dec) * F.col("s").cast(dec)
    ).cast("double")
    den = (F.col("k").cast(dec) * F.col("s").cast(dec)).cast("double")
    fano = num / den
    return per.select(
        "event_type",
        F.col("k").alias("n_windows"),
        F.col("s").alias("n_events"),
        stable_round(fano, 6).alias("fano"),
        F.when(fano > 1.5, F.lit("overdispersed"))
        .when(fano < 0.67, F.lit("underdispersed"))
        .otherwise(F.lit("poisson_like"))
        .alias("dispersion"),
    )


ORACLE_FANO = f"""
WITH hourly AS (
  SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h,
         count(*) AS c
  FROM events GROUP BY 1, 2
), per AS (
  SELECT event_type, count(*) AS k,
         CAST(sum(c) AS BIGINT) AS s,
         sum(CAST(c AS HUGEINT) * c) AS q
  FROM hourly GROUP BY 1
)
SELECT event_type, CAST(k AS BIGINT) AS n_windows,
       s AS n_events,
       {sql_stable_round(
           "CAST(CAST(k AS HUGEINT) * q"
           " - CAST(s AS HUGEINT) * s AS DOUBLE)"
           " / CAST(CAST(k AS HUGEINT) * s AS DOUBLE)", 6)} AS fano,
       CASE WHEN CAST(CAST(k AS HUGEINT) * q
                      - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(CAST(k AS HUGEINT) * s AS DOUBLE) > 1.5
              THEN 'overdispersed'
            WHEN CAST(CAST(k AS HUGEINT) * q
                      - CAST(s AS HUGEINT) * s AS DOUBLE)
                 / CAST(CAST(k AS HUGEINT) * s AS DOUBLE) < 0.67
              THEN 'underdispersed'
            ELSE 'poisson_like' END AS dispersion
FROM per
""".strip()


def q_metric_pacf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: PARTIAL autocorrelation per metric (r9) — the
    correlogram's Box-Jenkins partner: PACF at lag k is the
    correlation left after regressing out lags 1..k−1, computed by
    the Durbin-Levinson recursion over the EXACT ACF vector the
    `metric_correlogram` plan produces. ACF cuts off → MA order;
    PACF cuts off → AR order — together they pick the baseline model
    the anomaly/forecast family assumes.

    rows-only: the recursion is a sequential fold over the ≤
    |metrics|×{_ACF_MAX_LAG} collected ACF table (bounded driver
    work, the attribution-matrix class); recursion pinned against a
    known AR(1) process in tests/test_series_ext.py.
    """
    acf_rows = q_metric_correlogram(spark, sf_dir).collect()
    by_metric: dict[str, dict[int, float]] = {}
    for r in acf_rows:
        by_metric.setdefault(r.event_type, {})[r.lag] = r.acf
    out = []
    for m in sorted(by_metric):
        got = by_metric[m]
        kmax = max(got)
        rho = [1.0] + [got.get(k, 0.0) for k in range(1, kmax + 1)]
        # Durbin-Levinson: phi[k][k] is the PACF at lag k
        phi_prev: list[float] = []
        v = 1.0
        for k in range(1, kmax + 1):
            num = rho[k] - sum(
                phi_prev[j] * rho[k - 1 - j]
                for j in range(len(phi_prev))
            )
            a = num / v if v > 0 else 0.0
            phi = [
                phi_prev[j] - a * phi_prev[k - 2 - j]
                for j in range(len(phi_prev))
            ] + [a]
            v = v * (1.0 - a * a)
            phi_prev = phi
            out.append((m, k, round(a, 6)))
    return spark.createDataFrame(
        out, "event_type string, lag int, pacf double"
    )


_MAINT_START_H = 2  # daily maintenance window [02:00, 04:00) UTC
_MAINT_END_H = 4


def q_metric_alert_maintenance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Alert MAINTENANCE-WINDOW suppression per metric (the
    Alertmanager mute/silence semantics): breach windows (the
    cooldown family's exact cross-multiplied hourly-mean test) that
    fall inside the recurring daily maintenance window
    [{_MAINT_START_H:02d}:00, {_MAINT_END_H:02d}:00) UTC are
    SUPPRESSED — counted, auditable, but not paged. The report says
    how much of each metric's alert volume the silence policy
    swallows (a high suppressed fraction means maintenance is hiding
    a real problem).

    Exactness: hour-of-day is integer arithmetic on the window
    timestamp; every output is exact BIGINT counts + one division.
    Scale: runs entirely on the collapsed |metrics|×|hours| breach
    relation."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("s1"), F.count(F.lit(1)).alias("cnt")
    )
    tot = hourly.groupBy("event_type").agg(
        F.sum("s1").alias("t_sum"), F.sum("cnt").alias("t_cnt")
    )
    breaches = hourly.join(F.broadcast(tot), "event_type").filter(
        F.col("s1") * F.col("t_cnt") > F.col("t_sum") * F.col("cnt")
    )
    hod = F.pmod(
        F.expr(f"window_ts_ms div {_HOUR_MS}"), F.lit(24)
    )
    flagged = breaches.withColumn(
        "suppressed",
        (hod >= _MAINT_START_H) & (hod < _MAINT_END_H),
    )
    return flagged.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_breach"),
        F.sum(F.col("suppressed").cast("long")).alias("n_suppressed"),
        F.sum((~F.col("suppressed")).cast("long")).alias("n_fired"),
        stable_round(
            F.sum(F.col("suppressed").cast("long")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("suppressed_frac"),
    )


ORACLE_ALERT_MAINTENANCE = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s1,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, sum(s1) AS t_sum, sum(cnt) AS t_cnt
  FROM e GROUP BY 1
), b AS (
  SELECT e.event_type, e.window_ts_ms,
         ((e.window_ts_ms // {_HOUR_MS}) % 24 >= {_MAINT_START_H}
          AND (e.window_ts_ms // {_HOUR_MS}) % 24 < {_MAINT_END_H})
           AS suppressed
  FROM e JOIN t USING (event_type)
  WHERE e.s1 * t.t_cnt > t.t_sum * e.cnt
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_breach,
       CAST(sum(CASE WHEN suppressed THEN 1 ELSE 0 END) AS BIGINT)
         AS n_suppressed,
       CAST(sum(CASE WHEN suppressed THEN 0 ELSE 1 END) AS BIGINT)
         AS n_fired,
       {sql_stable_round(
           "CAST(sum(CASE WHEN suppressed THEN 1 ELSE 0 END)"
           " AS DOUBLE) / CAST(count(*) AS DOUBLE)", 4)}
         AS suppressed_frac
FROM b GROUP BY 1
""".strip()


def q_metric_alert_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Alert CO-FIRING matrix (incident correlation): for every
    metric pair that ever breaches in the same hour, the Jaccard of
    their breach-hour sets — the signal an on-call uses to collapse
    duplicate pages ("these two always fire together — one alert,
    not two") and to find hidden causal fan-out. Same exact breach
    definition as the cooldown/maintenance family, so the three
    reports never disagree about what an alert is.

    Scale: breach sets live on the collapsed |metrics|×|hours|
    relation; the pair join is an equi-join ON THE HOUR (each hour
    contributes |metrics-breaching-that-hour|² pairs — bounded by
    the metric count, never corpus rows), and per-metric set sizes
    broadcast back onto the |pairs| rows."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    # r11 (guide §2.4): `hourly` feeds the per-metric totals AND the
    # breach filter, and the breach set `b` feeds its sizes plus BOTH
    # sides of the co-firing self-join — uncached, the corpus scan
    # re-executed up to 8×. Both relations are bounded at
    # |metrics|×|hours|; cache each once.
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("s1"), F.count(F.lit(1)).alias("cnt")
    ).cache()
    tot = hourly.groupBy("event_type").agg(
        F.sum("s1").alias("t_sum"), F.sum("cnt").alias("t_cnt")
    )
    b = (
        hourly.join(F.broadcast(tot), "event_type")
        .filter(
            F.col("s1") * F.col("t_cnt") > F.col("t_sum") * F.col("cnt")
        )
        .select("event_type", "window_ts_ms")
    ).cache()
    sizes = b.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n")
    )
    b2 = b.select(
        F.col("event_type").alias("metric_b"),
        F.col("window_ts_ms"),
    )
    both = (
        b.join(b2, "window_ts_ms")
        .filter(F.col("event_type") < F.col("metric_b"))
        .groupBy(
            F.col("event_type").alias("metric_a"), F.col("metric_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("metric_a"), F.col("n").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("metric_b"), F.col("n").alias("n_b")
    )
    return (
        both.join(F.broadcast(sa), "metric_a")
        .join(F.broadcast(sb), "metric_b")
        .select(
            "metric_a",
            "metric_b",
            "n_a",
            "n_b",
            "n_both",
            stable_round(
                F.col("n_both").cast("double")
                / (
                    F.col("n_a") + F.col("n_b") - F.col("n_both")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


ORACLE_ALERT_OVERLAP = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS s1,
         count(*) AS cnt
  FROM events GROUP BY 1, 2
), t AS (
  SELECT event_type, sum(s1) AS t_sum, sum(cnt) AS t_cnt
  FROM e GROUP BY 1
), b AS (
  SELECT e.event_type, e.window_ts_ms
  FROM e JOIN t USING (event_type)
  WHERE e.s1 * t.t_cnt > t.t_sum * e.cnt
), sizes AS (
  SELECT event_type, count(*) AS n FROM b GROUP BY 1
), cof AS (
  SELECT a.event_type AS metric_a, c.event_type AS metric_b,
         count(*) AS n_both
  FROM b a JOIN b c ON a.window_ts_ms = c.window_ts_ms
                   AND a.event_type < c.event_type
  GROUP BY 1, 2
)
SELECT metric_a, metric_b,
       CAST(sa.n AS BIGINT) AS n_a, CAST(sb.n AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       {sql_stable_round(
           "CAST(n_both AS DOUBLE)"
           " / CAST(sa.n + sb.n - n_both AS DOUBLE)", 6)} AS jaccard
FROM cof
JOIN sizes sa ON sa.event_type = metric_a
JOIN sizes sb ON sb.event_type = metric_b
""".strip()


def q_metric_mttr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability scorecard per metric: incident count, MTTR (mean
    incident duration in hours, inclusive of the last breach window)
    and MTBF (mean hours between incident STARTS) — the SRE summary
    one level above `metric_alert_cooldown`'s per-incident rows
    (cooldown answers "what paged", this answers "how broken is this
    metric per month" for error-budget planning; Google SRE book ch.4
    line). Built by COMPOSING the oracle-exact cooldown query, so the
    incident definition cannot drift between the two reports.

    Exactness: durations and start gaps are exact BIGINT hour counts;
    each mean is ONE division of two exact integers, 4-dp half-up.
    Metrics with a single incident report NULL MTBF on both engines.
    Plan shape: one |incidents|-row aggregate on top of the cooldown
    plan — nothing new shuffles."""
    inc = q_metric_alert_cooldown(spark, sf_dir)
    dur_h = (
        (F.col("incident_end_ms") - F.col("incident_start_ms"))
        / F.lit(_HOUR_MS)
    ).cast("long") + F.lit(1)
    g = inc.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_incidents"),
        F.sum("n_breach_windows").alias("n_breach_windows"),
        F.sum(dur_h).alias("sum_dur_h"),
        F.min("incident_start_ms").alias("first_ms"),
        F.max("incident_start_ms").alias("last_ms"),
    )
    mttr = stable_round(
        F.col("sum_dur_h").cast("double")
        / F.col("n_incidents").cast("double"),
        4,
    )
    mtbf = F.when(
        F.col("n_incidents") > 1,
        stable_round(
            ((F.col("last_ms") - F.col("first_ms")) / F.lit(_HOUR_MS))
            .cast("long")
            .cast("double")
            / (F.col("n_incidents") - 1).cast("double"),
            4,
        ),
    )
    return g.select(
        "event_type",
        "n_incidents",
        "n_breach_windows",
        mttr.alias("mttr_hours"),
        mtbf.alias("mtbf_hours"),
    )


ORACLE_MTTR = f"""
WITH inc AS ({ORACLE_ALERT_COOLDOWN}),
g AS (
  SELECT event_type, count(*) AS n_incidents,
         CAST(sum(n_breach_windows) AS BIGINT) AS n_breach_windows,
         sum((incident_end_ms - incident_start_ms) // {_HOUR_MS} + 1)
           AS sum_dur_h,
         min(incident_start_ms) AS first_ms,
         max(incident_start_ms) AS last_ms
  FROM inc GROUP BY 1
)
SELECT event_type, n_incidents, n_breach_windows,
       {sql_stable_round(
           "CAST(sum_dur_h AS DOUBLE) / n_incidents::DOUBLE", 4)}
         AS mttr_hours,
       CASE WHEN n_incidents > 1 THEN
         {sql_stable_round(
             "CAST((last_ms - first_ms) // " + str(_HOUR_MS)
             + " AS DOUBLE) / (n_incidents - 1)::DOUBLE", 4)}
       END AS mtbf_hours
FROM g
""".strip()


# ------------------------------------------------------- linear trend


_CAP_FACTOR = 1.5  # capacity = 1.5× the mean hourly load


def q_metric_capacity_eta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capacity time-to-exhaustion per metric: hours until the OLS
    trend line crosses the capacity ceiling — the question a capacity
    planner actually asks `metric_trend`'s slope ("when do we hit the
    wall", Google SRE forecasting line). Capacity here is the
    1.5×-mean-hourly-load stand-in (a real deployment broadcasts its
    provisioned limits); the ETA extrapolates the SAME exact-integer
    normal equations as metric_trend, so the two reports can't
    disagree about the slope.

    eta_h = (capacity − fit_now) / slope with fit_now = intercept +
    slope·x_max, reported only for growing metrics still under
    capacity (shrinking/flat → NULL + verdict). Every input to the
    double arithmetic is an exact BIGINT power sum and the expression
    trees match the oracle term for term, so both engines produce the
    identical doubles. Plan: one collapsed-series shuffle + one
    per-metric aggregate (the metric_trend plan plus a max)."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    )
    x = (F.col("window_ts_ms") / F.lit(_HOUR_MS)).cast("long")
    g = hourly.select(
        "event_type", x.alias("x"), F.col("v").alias("y")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.max("x").alias("xm"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = num / den
    intercept = (
        F.col("sy").cast("double") - slope * F.col("sx").cast("double")
    ) / n.cast("double")
    fit_now = intercept + slope * F.col("xm").cast("double")
    cap = F.lit(_CAP_FACTOR) * (
        F.col("sy").cast("double") / n.cast("double")
    )
    eta = (cap - fit_now) / slope
    growing = (n > 1) & (slope > 0)
    exhaustable = growing & (cap > fit_now)
    return g.select(
        "event_type",
        "n",
        F.when(n > 1, stable_round(slope / F.lit(100.0), 6)).alias(
            "slope_per_hour"
        ),
        F.when(n > 1, stable_round(fit_now / F.lit(100.0), 4)).alias(
            "fit_now"
        ),
        stable_round(cap / F.lit(100.0), 4).alias("capacity"),
        F.when(exhaustable, stable_round(eta, 2)).alias("eta_hours"),
        F.when(~(n > 1), F.lit("insufficient_history"))
        .when(~(slope > 0), F.lit("not_growing"))
        .when(~(cap > fit_now), F.lit("already_over"))
        .otherwise(F.lit("exhausts"))
        .alias("verdict"),
    )


ORACLE_CAPACITY_ETA = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), xy AS (
  SELECT event_type, window_ts_ms // {_HOUR_MS} AS x, v AS y FROM e
), g AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx, max(x) AS xm
  FROM xy GROUP BY 1
), d AS (
  SELECT event_type, n, xm, sy,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS slope,
         (CAST(sy AS DOUBLE)
          - (CAST(n * sxy - sx * sy AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE))
            * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
  FROM g
), f AS (
  SELECT event_type, n, slope,
         intercept + slope * CAST(xm AS DOUBLE) AS fit_now,
         {_CAP_FACTOR} * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS cap
  FROM d
)
SELECT event_type, n,
       CASE WHEN n > 1 THEN
         {sql_stable_round("slope / 100.0", 6)} END AS slope_per_hour,
       CASE WHEN n > 1 THEN
         {sql_stable_round("fit_now / 100.0", 4)} END AS fit_now,
       {sql_stable_round("cap / 100.0", 4)} AS capacity,
       CASE WHEN n > 1 AND slope > 0 AND cap > fit_now THEN
         {sql_stable_round("(cap - fit_now) / slope", 2)} END
         AS eta_hours,
       CASE WHEN NOT (n > 1) THEN 'insufficient_history'
            WHEN NOT (slope > 0) THEN 'not_growing'
            WHEN NOT (cap > fit_now) THEN 'already_over'
            ELSE 'exhausts' END AS verdict
FROM f
""".strip()


def q_metric_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-metric linear trend over the hourly series: OLS slope and
    intercept of v ~ t via the closed-form normal equations on EXACT
    integer power sums (n, Σx, Σy, Σxy, Σx²; x = epoch-hour index,
    y = hourly load in cents) — identical BIGINTs on both engines, so
    the final double divisions agree bit-for-bit.  The drift detector
    to pair with `metric_cusum`'s changepoints: CUSUM finds the break,
    the slope says how fast the level is moving.

    One shuffle to the collapsed series, one tiny per-metric aggregate
    — the same two-exchange plan as `agg_stddev`. Σx² headroom: epoch
    hours (~5e5) squared times 720 windows ≈ 2e14 ≪ 2^63; re-origin x
    per metric before the corpus spans ~10⁶ hours.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    )
    x = (F.col("window_ts_ms") / F.lit(_HOUR_MS)).cast("long")
    g = hourly.select(
        "event_type", x.alias("x"), F.col("v").alias("y")
    ).groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = F.when(n > 1, num / den)
    intercept = F.when(
        n > 1,
        (F.col("sy").cast("double") - slope * F.col("sx").cast("double"))
        / n.cast("double"),
    )
    return g.select(
        "event_type",
        "n",
        (slope / F.lit(100.0)).alias("slope_per_hour"),
        (intercept / F.lit(100.0)).alias("intercept_value"),
    )


ORACLE_TREND = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), xy AS (
  SELECT event_type, window_ts_ms // {_HOUR_MS} AS x, v AS y FROM e
), g AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * y) AS sxy, sum(x * x) AS sxx
  FROM xy GROUP BY 1
)
SELECT event_type, n,
       CASE WHEN n > 1 THEN
         (CAST(n * sxy - sx * sy AS DOUBLE)
          / CAST(n * sxx - sx * sx AS DOUBLE)) / 100.0 END
         AS slope_per_hour,
       CASE WHEN n > 1 THEN
         ((CAST(sy AS DOUBLE)
           - (CAST(n * sxy - sx * sy AS DOUBLE)
              / CAST(n * sxx - sx * sx AS DOUBLE))
             * CAST(sx AS DOUBLE))
          / CAST(n AS DOUBLE)) / 100.0 END AS intercept_value
FROM g
""".strip()


def q_metric_trend_theilsen(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-metric trend: the Theil–Sen estimator (median of all
    pairwise slopes) over the same integer-cents hourly series as
    `metric_trend` — outlier-resistant where OLS is not (one corrupted
    hour moves OLS by its full leverage, Theil–Sen by at most one rank
    step). Pair enumeration is per-metric O(n²) over the COLLAPSED
    series (n ≈ hours, not events) in one Arrow applyInPandas batch;
    the corpus-wide shuffle is the same two-exchange hourly collapse
    the rest of the series family uses. Slopes are exact rationals of
    BIGINT (Δcents / Δhours) evaluated in double — bit-identical on
    both engines; the even-count median averages two such doubles,
    also deterministic.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("y")
    ).select(
        "event_type",
        (F.col("window_ts_ms") / F.lit(_HOUR_MS)).cast("long").alias("x"),
        "y",
    )

    def _theilsen(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        x = pdf["x"].to_numpy(dtype="float64")
        y = pdf["y"].to_numpy(dtype="float64")
        n = len(x)
        if n < 2:
            return pd.DataFrame(
                {
                    "event_type": pdf["event_type"].iloc[:1],
                    "n_points": [n],
                    "slope_per_hour": [None],
                }
            )
        dx = x[None, :] - x[:, None]
        dy = y[None, :] - y[:, None]
        iu = np.triu_indices(n, k=1)
        slopes = dy[iu] / dx[iu]
        return pd.DataFrame(
            {
                "event_type": [pdf["event_type"].iloc[0]],
                "n_points": [n],
                "slope_per_hour": [float(np.median(slopes)) / 100.0],
            }
        )

    return hourly.groupBy("event_type").applyInPandas(
        _theilsen,
        schema="event_type string, n_points long, slope_per_hour double",
    )


ORACLE_THEILSEN = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS y
  FROM events GROUP BY 1, 2
), xy AS (
  SELECT event_type, window_ts_ms // {_HOUR_MS} AS x, y FROM e
), pairs AS (
  SELECT a.event_type,
         CAST(b.y - a.y AS DOUBLE) / CAST(b.x - a.x AS DOUBLE) AS s
  FROM xy a JOIN xy b ON a.event_type = b.event_type AND b.x > a.x
), n AS (
  SELECT event_type, CAST(count(*) AS BIGINT) AS n_points FROM xy GROUP BY 1
)
SELECT n.event_type, n.n_points,
       CASE WHEN n.n_points > 1 THEN (SELECT median(s) FROM pairs p
              WHERE p.event_type = n.event_type) / 100.0 END AS slope_per_hour
FROM n
""".strip()


_SHAPE_W = 24
_SHAPE_TOPK = 10


def q_series_shape_search(
    spark: SparkSession,
    sf_dir: str,
    query_window: DataFrame | None = None,
) -> DataFrame:
    """Time-series SHAPE search (per the retrieved EDBT'19 distributed
    time-series-similarity line): find the top-10 sliding 24-hour
    windows — across ALL metrics and offsets — most similar to a query
    pattern (default: the 'click' metric's first complete day), under
    z-normalized Euclidean distance (scale/level-invariant, the
    standard similarity for "which metric moved like this one").

    Plan shape: the corpus collapses to the hourly series once; each
    metric's sliding windows, the exact BIGINT Σy / Σy² z-stats, and
    the raw value array all come from ONE ordered window frame
    (per-metric sort, no self-join, no interpreted fold for the norm).
    The query pattern is a broadcast 1-row RELATION — pass your own
    via ``query_window`` (columns qstart, qarr, qmu, qsd) or let it
    default to a subquery over the same corpus; either way the plan
    builds without launching a job, so the operator composes into
    multi-query and streaming plans.  For z-normalized series the
    distance collapses algebraically:
        ‖a−b‖² = 2W − 2·(Σyq − W·μ·μq)/(σ·σq)
    where Σyq is an exact BIGINT dot product (order-independent
    integer fold), so both engines evaluate the identical scalar
    double expression from identical integers — no summation-order
    ambiguity.  Incomplete (gapped) and flat (σ=0) windows are
    excluded on both sides; the query window excludes itself via its
    qstart key.  An empty corpus yields an empty typed result through
    the same plan (empty broadcast side), no special-casing.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type").alias("name"), _hourly_window()).agg(
        F.sum("e2").alias("y")
    ).select(
        "name",
        (F.col("window_ts_ms") / F.lit(_HOUR_MS)).cast("long").alias("h"),
        "y",
    )
    frame = (
        Window.partitionBy("name")
        .orderBy("h")
        .rowsBetween(Window.currentRow, _SHAPE_W - 1)
    )
    mu = F.col("s1").cast("double") / F.lit(float(_SHAPE_W))
    wins = (
        hourly.select(
            "name",
            F.col("h").alias("start_h"),
            F.collect_list("y").over(frame).alias("arr"),
            F.collect_list("h").over(frame).alias("hs"),
            F.sum("y").over(frame).alias("s1"),
            F.sum(F.col("y") * F.col("y")).over(frame).alias("s2"),
        )
        .filter(
            (F.size("arr") == _SHAPE_W)
            & (
                F.element_at("hs", _SHAPE_W) - F.element_at("hs", 1)
                == _SHAPE_W - 1
            )
        )
        .select(
            "name",
            "start_h",
            "arr",
            mu.alias("mu"),
            (
                F.col("s2").cast("double") / F.lit(float(_SHAPE_W))
                - mu * mu
            ).alias("var"),
        )
        .filter(F.col("var") > 0)
    )

    if query_window is None:
        query_window = (
            wins.filter(F.col("name") == "click")
            .orderBy("start_h")
            .limit(1)
            .select(
                F.col("start_h").alias("qstart"),
                F.col("arr").alias("qarr"),
                F.col("mu").alias("qmu"),
                F.sqrt("var").alias("qsd"),
            )
        )

    s_yq = F.aggregate(
        F.zip_with("arr", "qarr", lambda x, y: x * y),
        F.lit(0).cast("long"),
        lambda a, x: a + x,
    )
    num = s_yq.cast("double") - F.lit(float(_SHAPE_W)) * F.col("mu") * F.col(
        "qmu"
    )
    dist2 = F.lit(2.0 * _SHAPE_W) - F.lit(2.0) * (
        num / (F.sqrt(F.col("var")) * F.col("qsd"))
    )
    scored = (
        wins.crossJoin(F.broadcast(query_window))
        .filter(
            ~(
                (F.col("name") == "click")
                & (F.col("start_h") == F.col("qstart"))
            )
        )
        .select(
            "name",
            "start_h",
            stable_round(
                F.sqrt(F.greatest(dist2, F.lit(0.0))), 6
            ).alias("z_dist"),
        )
    )
    w = Window.orderBy(
        F.col("z_dist").asc(), F.col("name").asc(), F.col("start_h").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _SHAPE_TOPK)
        .select("rank", "name", "start_h", "z_dist")
    )


def _shape_oracle() -> str:
    w, k = _SHAPE_W, _SHAPE_TOPK
    stats = f"""
  SELECT name, start_h, arr,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT), arr),
                          (a, x) -> a + x) AS DOUBLE) / {w}.0 AS mu,
         CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                list_transform(arr, x -> x * x)), (a, x) -> a + x) AS DOUBLE)
           / {w}.0 AS s2m
  FROM ok"""
    return f"""
WITH e AS (
  SELECT event_type AS name, {_W_SQL} AS wms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS y
  FROM events GROUP BY 1, 2
), hh AS (
  SELECT name, wms // {_HOUR_MS} AS h, y FROM e
), win AS (
  SELECT name, h AS start_h,
         list(y) OVER fr AS arr, list(h) OVER fr AS hs
  FROM hh
  WINDOW fr AS (PARTITION BY name ORDER BY h
                ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING)
), ok AS (
  SELECT name, start_h, arr FROM win
  WHERE len(arr) = {w} AND hs[{w}] - hs[1] = {w - 1}
), st AS ({stats}
), zs AS (
  SELECT name, start_h, arr, mu, s2m - mu * mu AS var FROM st
  WHERE s2m - mu * mu > 0
), q AS (
  SELECT arr AS qarr, mu AS qmu, sqrt(var) AS qsd, start_h AS qstart
  FROM zs WHERE name = 'click' ORDER BY start_h LIMIT 1
), scored AS (
  -- identical algebra to the Spark plan: exact BIGINT dot product,
  -- then ||a-b||^2 = 2W - 2*(Syq - W*mu*qmu)/(sd*qsd) in doubles
  SELECT z.name, z.start_h,
         floor(sqrt(greatest(
             {2.0 * w} - 2.0 * (
               (CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                    list_transform(range(1, {w + 1}),
                                   i -> z.arr[i] * q.qarr[i])),
                  (a, x) -> a + x) AS DOUBLE)
                - {float(w)} * z.mu * q.qmu)
               / (sqrt(z.var) * q.qsd)),
             0.0::DOUBLE)) * 1000000.0::DOUBLE + 0.5::DOUBLE)
           / 1000000.0::DOUBLE AS z_dist
  FROM zs z, q
  WHERE NOT (z.name = 'click' AND z.start_h = q.qstart)
)
SELECT rank, name, start_h, z_dist FROM (
  SELECT *, row_number() OVER (ORDER BY z_dist ASC, name ASC,
                               start_h ASC) AS rank
  FROM scored
) WHERE rank <= {k}
""".strip()


ORACLE_SHAPE_SEARCH = _shape_oracle()


# -------------------------------------------- seasonal-naive backtest

_SEASON_MS = 24 * _HOUR_MS  # same-hour-yesterday seasonality


_HW_ALPHA, _HW_BETA, _HW_GAMMA = 0.3, 0.05, 0.2
_HW_SEASON = 24
_HW_HORIZON = 24


def holt_winters_fit_forecast(xs, season: int, horizon: int):
    """Additive Holt–Winters on an evenly spaced series (plain floats).

    Classic triple exponential smoothing: level/trend/seasonal states
    updated per step with (α, β, γ); init level = first-season mean,
    trend = mean season-over-season step, seasonals = first-season
    deviations. Returns the h-step-ahead forecasts (1..horizon).
    Shared by the Spark plan and the pytest reference so the pinning
    test exercises the DISTRIBUTION plumbing, not a re-derivation.
    """
    n = len(xs)
    if n < 2 * season:
        raise ValueError("need >= 2 seasons to initialize")
    s0 = sum(xs[:season]) / season
    s1 = sum(xs[season : 2 * season]) / season
    level = s0
    trend = (s1 - s0) / season
    # detrended seasonal init: subtracting the in-season trend ramp
    # (centered on the season mean) keeps the trend out of the
    # seasonal components, which γ would otherwise unlearn only slowly
    mid = (season - 1) / 2.0
    seas = [xs[i] - (s0 + (i - mid) * trend) for i in range(season)]
    for t, x in enumerate(xs):
        si = t % season
        prev_level = level
        level = _HW_ALPHA * (x - seas[si]) + (1 - _HW_ALPHA) * (
            level + trend
        )
        trend = _HW_BETA * (level - prev_level) + (1 - _HW_BETA) * trend
        seas[si] = _HW_GAMMA * (x - level) + (1 - _HW_GAMMA) * seas[si]
    last = n - 1
    return [
        level + h * trend + seas[(last + h) % season]
        for h in range(1, horizon + 1)
    ]


def holt_winters_one_step(xs, season: int):
    """In-sample one-step-ahead forecasts: f_t = (level+trend+seas)
    BEFORE the state update at t. Same init as
    holt_winters_fit_forecast; forecasts start after the 2-season
    init window (earlier points trained the init)."""
    n = len(xs)
    if n < 2 * season:
        raise ValueError("need >= 2 seasons to initialize")
    s0 = sum(xs[:season]) / season
    s1 = sum(xs[season : 2 * season]) / season
    level = s0
    trend = (s1 - s0) / season
    mid = (season - 1) / 2.0
    seas = [xs[i] - (s0 + (i - mid) * trend) for i in range(season)]
    out = []
    for t, x in enumerate(xs):
        si = t % season
        if t >= 2 * season:
            out.append((t, level + trend + seas[si]))
        prev_level = level
        level = _HW_ALPHA * (x - seas[si]) + (1 - _HW_ALPHA) * (
            level + trend
        )
        trend = _HW_BETA * (level - prev_level) + (1 - _HW_BETA) * trend
        seas[si] = _HW_GAMMA * (x - level) + (1 - _HW_GAMMA) * seas[si]
    return out


def q_metric_backtest_hw_vs_snaive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """rows-only: forecaster bake-off per metric — one-step-ahead
    in-sample MAE of Holt–Winters vs the seasonal-naive baseline
    (f_t = x_{t−24}), both scored over the same post-init points of
    the collapsed hourly series. The go/no-go gate before promoting a
    stateful forecaster: if HW does not beat same-hour-yesterday,
    ship the baseline. One Arrow applyInPandas per metric; the fold
    is the shared pinned reference implementation."""
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    ).select(
        "event_type",
        (F.col("window_ts_ms") / F.lit(_HOUR_MS)).cast("long").alias("x"),
        "v",
    )

    def _bt(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x")
        lo, hi = int(pdf["x"].iloc[0]), int(pdf["x"].iloc[-1])
        dense = {int(x): float(v) for x, v in zip(pdf["x"], pdf["v"])}
        xs = [dense.get(x, 0.0) for x in range(lo, hi + 1)]
        cols = ["event_type", "n_scored", "mae_hw", "mae_snaive", "hw_wins"]
        try:
            fc = holt_winters_one_step(xs, _HW_SEASON)
        except ValueError:
            return pd.DataFrame(columns=cols)
        err_hw = err_sn = 0.0
        for t, f in fc:
            err_hw += abs(xs[t] - f)
            err_sn += abs(xs[t] - xs[t - _HW_SEASON])
        n = len(fc)
        return pd.DataFrame(
            [
                (
                    pdf["event_type"].iloc[0],
                    n,
                    err_hw / n / 100.0,
                    err_sn / n / 100.0,
                    err_hw < err_sn,
                )
            ],
            columns=cols,
        )

    return hourly.groupBy("event_type").applyInPandas(
        _bt,
        schema=(
            "event_type string, n_scored long, mae_hw double,"
            " mae_snaive double, hw_wins boolean"
        ),
    )


def q_metric_forecast_holtwinters(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Triple-exponential (additive Holt–Winters) 24-hour forecast per
    metric — the stateful forecaster `metric_forecast_snaive` is the
    baseline for: level + trend + 24-hour seasonal components fitted
    by one sequential pass over each metric's COLLAPSED hourly series
    (≤ |hours| points) inside one Arrow applyInPandas batch. The
    recursion is inherently order-dependent → rows-only entry; the
    fit is pinned exactly in pytest against the shared reference
    implementation, and gaps are filled with the series' running
    absence marker (0 load) so state updates stay hourly-spaced.
    """
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    ).select(
        "event_type",
        (F.col("window_ts_ms") / F.lit(_HOUR_MS)).cast("long").alias("x"),
        "v",
    )

    def _hw(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("x")
        lo, hi = int(pdf["x"].iloc[0]), int(pdf["x"].iloc[-1])
        dense = {int(x): float(v) for x, v in zip(pdf["x"], pdf["v"])}
        xs = [dense.get(x, 0.0) for x in range(lo, hi + 1)]
        try:
            fc = holt_winters_fit_forecast(xs, _HW_SEASON, _HW_HORIZON)
        except ValueError:
            return pd.DataFrame(
                columns=["event_type", "h", "forecast_value"]
            ).astype({"event_type": str, "h": "int64", "forecast_value": float})
        return pd.DataFrame(
            {
                "event_type": pdf["event_type"].iloc[0],
                "h": range(1, _HW_HORIZON + 1),
                "forecast_value": [f / 100.0 for f in fc],
            }
        )

    return hourly.groupBy("event_type").applyInPandas(
        _hw, schema="event_type string, h long, forecast_value double"
    )


def q_metric_forecast_snaive(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Seasonal-naive forecast backtest per metric: forecast(W) =
    actual(W − 24 h), scored over every window that HAS a same-hour-
    yesterday predecessor — the baseline any fancier forecaster must
    beat, and the cheapest way to quantify how seasonal each metric
    actually is.

    The predecessor lookup is a self-join on (metric, W−24h) over the
    collapsed series — gap-safe where a ROWS-frame lag(24) silently
    pairs wrong hours across missing windows.  Errors aggregate as
    exact integer sums (Σ|a−f|, Σa in cents), divided once at the end:
    MAE and WAPE carry no float-summation order dependence, which is
    what keeps the oracle hash stable (a per-row float sMAPE sum would
    not be).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    )
    prev = hourly.select(
        "event_type",
        (F.col("window_ts_ms") + F.lit(_SEASON_MS)).alias(
            "window_ts_ms"
        ),
        F.col("v").alias("f"),
    )
    scored = hourly.join(prev, ["event_type", "window_ts_ms"])
    g = scored.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_forecasts"),
        F.sum(F.abs(F.col("v") - F.col("f"))).alias("sae"),
        F.sum("v").alias("sa"),
    )
    return g.select(
        "event_type",
        "n_forecasts",
        (
            F.col("sae").cast("double")
            / (F.col("n_forecasts") * F.lit(100)).cast("double")
        ).alias("mae"),
        (F.col("sae").cast("double") / F.col("sa").cast("double")).alias(
            "wape"
        ),
    )


ORACLE_FORECAST_SNAIVE = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), j AS (
  SELECT a.event_type, a.v, b.v AS f
  FROM e a JOIN e b
    ON b.event_type = a.event_type
   AND b.window_ts_ms = a.window_ts_ms - {_SEASON_MS}
), g AS (
  SELECT event_type, count(*) AS n_forecasts,
         sum(abs(v - f)) AS sae, sum(v) AS sa
  FROM j GROUP BY 1
)
SELECT event_type, n_forecasts,
       CAST(sae AS DOUBLE) / CAST(n_forecasts * 100 AS DOUBLE) AS mae,
       CAST(sae AS DOUBLE) / CAST(sa AS DOUBLE) AS wape
FROM g
""".strip()


# -------------------------------------------- anomaly top contributors


def q_metric_top_contributors(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Attribution for anomalous windows: for every hourly window that
    breaches the MAD fence (same integer inequality as
    `metric_mad_anomaly`), the top-3 users by share of that window's
    load — the "what changed" page a responder opens after the "it
    changed" alert.

    The contributor aggregation keys by (metric, window, user) — one
    shuffle with map-side partials; ranking windows partition by
    (metric, window), so no global ordering exists anywhere. The MAD
    baseline reuses the per-metric broadcast from the anomaly query;
    only breaching windows reach the rank, so the rank input is a few
    rows per anomaly, not the corpus.  Share = user_e2/total_e2 is one
    exact-integer division; ties rank by user_id (total order).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        "user_id",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    # r11 (guide §2.4): the per-(metric, window, user) collapse feeds
    # the hourly rollup AND the contributor join, `hourly` feeds the
    # median AND deviation branches, `dev` the MAD AND breach filter —
    # uncached, the corpus scan re-executed 5×; one scan after.
    per_user = ev.groupBy(
        F.col("event_type"), _hourly_window(), F.col("user_id")
    ).agg(F.sum("e2").alias("u_e2")).cache()
    hourly = per_user.groupBy("event_type", "window_ts_ms").agg(
        F.sum("u_e2").alias("v")
    ).cache()
    med = hourly.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(v, 0.5D) AS BIGINT)").alias("med2")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(F.lit(2) * F.col("v") - F.col("med2"))
    ).cache()
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(dev2, 0.5D) AS BIGINT)").alias("mad4")
    )
    anomalous = (
        dev.join(F.broadcast(mad), "event_type")
        .filter(
            F.col("dev2") * F.lit(_MAD_LHS)
            > F.col("mad4") * F.lit(_MAD_NUM)
        )
        .select("event_type", "window_ts_ms", "v")
    )
    contrib = per_user.join(
        anomalous, ["event_type", "window_ts_ms"]
    )
    w = Window.partitionBy("event_type", "window_ts_ms").orderBy(
        F.col("u_e2").desc(), F.col("user_id")
    )
    ranked = contrib.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= 3
    )
    return ranked.select(
        "event_type",
        "window_ts_ms",
        "rank",
        "user_id",
        (F.col("u_e2").cast("double") / F.lit(100.0)).alias(
            "user_value"
        ),
        (F.col("u_e2").cast("double") / F.col("v").cast("double")).alias(
            "share"
        ),
    )


ORACLE_TOP_CONTRIBUTORS = f"""
WITH pu AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms, user_id,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS u_e2
  FROM events GROUP BY 1, 2, 3
), h AS (
  SELECT event_type, window_ts_ms, sum(u_e2) AS v
  FROM pu GROUP BY 1, 2
), m AS (
  SELECT event_type, CAST(2 * median(v) AS BIGINT) AS med2
  FROM h GROUP BY 1
), d AS (
  SELECT h.*, abs(2 * h.v - m.med2) AS dev2
  FROM h JOIN m USING (event_type)
), md AS (
  SELECT event_type, CAST(2 * median(dev2) AS BIGINT) AS mad4
  FROM d GROUP BY 1
), an AS (
  SELECT d.event_type, d.window_ts_ms, d.v
  FROM d JOIN md USING (event_type)
  WHERE d.dev2 * {_MAD_LHS} > md.mad4 * {_MAD_NUM}
), r AS (
  SELECT pu.event_type, pu.window_ts_ms, pu.user_id, pu.u_e2, an.v,
         row_number() OVER (PARTITION BY pu.event_type, pu.window_ts_ms
                            ORDER BY pu.u_e2 DESC, pu.user_id) AS rank
  FROM pu JOIN an USING (event_type, window_ts_ms)
)
SELECT event_type, window_ts_ms, rank, user_id,
       CAST(u_e2 AS DOUBLE) / 100.0 AS user_value,
       CAST(u_e2 AS DOUBLE) / CAST(v AS DOUBLE) AS share
FROM r WHERE rank <= 3
""".strip()


# -------------------------------------------------- weekly mix drift

_WEEK_MS = 7 * 24 * _HOUR_MS  # epoch-aligned weeks (not calendar)


def q_metric_mix_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Week-over-week drift of the event-type MIX: L1 distance between
    consecutive weeks' type-share distributions — the corpus-health
    gauge that catches "errors doubled as a share of traffic" even
    when absolute volume looks flat.

    Float-sum trap avoided by construction: L1 = Σ_t |a_t/b − c_t/d|
    would sum doubles in engine-dependent order.  Instead each term
    cross-multiplies to |a_t·d − c_t·b| (exact BIGINT), the Σ runs
    over integers (order-free), and ONE division by b·d happens at
    the end — bit-identical on both engines.  Types absent in a week
    enter as zero counts via the full-outer type alignment.  Weeks are
    epoch-aligned 7-day buckets (deterministic; no calendar/locale
    week-start ambiguity).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (
            (F.unix_millis(F.col("ts")) / F.lit(_WEEK_MS)).cast("long")
            * F.lit(_WEEK_MS)
        ).alias("week_ms"),
    )
    # r11 (guide §2.4): the |weeks|×|types|-bounded weekly count
    # table feeds the totals, the shifted previous-week copy AND the
    # alignment join — uncached, the events scan re-executed per
    # consumer (4 FileScans → 1).
    weekly = ev.groupBy("week_ms", "event_type").agg(
        F.count(F.lit(1)).alias("a")
    ).cache()
    totals = weekly.groupBy("week_ms").agg(F.sum("a").alias("b"))
    prev = weekly.select(
        (F.col("week_ms") + F.lit(_WEEK_MS)).alias("week_ms"),
        F.col("event_type"),
        F.col("a").alias("c"),
    )
    aligned = weekly.join(
        prev, ["week_ms", "event_type"], "full_outer"
    ).fillna({"a": 0, "c": 0})
    prev_tot = totals.select(
        (F.col("week_ms") + F.lit(_WEEK_MS)).alias("week_ms"),
        F.col("b").alias("d"),
    )
    j = (
        aligned.join(F.broadcast(totals), "week_ms", "left")
        .join(F.broadcast(prev_tot), "week_ms", "left")
        .filter(F.col("b").isNotNull() & F.col("d").isNotNull())
    )
    g = j.groupBy("week_ms", "b", "d").agg(
        F.sum(
            F.abs(F.col("a") * F.col("d") - F.col("c") * F.col("b"))
        ).alias("num")
    )
    return g.select(
        "week_ms",
        F.col("b").alias("n_events"),
        (
            F.col("num").cast("double")
            / (F.col("b") * F.col("d")).cast("double")
        ).alias("l1_drift"),
    )


ORACLE_MIX_DRIFT = f"""
WITH e AS (
  SELECT event_type,
         (epoch_ms(ts) // {_WEEK_MS}) * {_WEEK_MS} AS week_ms
  FROM events
), w AS (
  SELECT week_ms, event_type, count(*) AS a FROM e GROUP BY 1, 2
), t AS (
  SELECT week_ms, sum(a) AS b FROM w GROUP BY 1
), al AS (
  SELECT COALESCE(w.week_ms, p.week_ms + {_WEEK_MS}) AS week_ms,
         COALESCE(w.event_type, p.event_type) AS event_type,
         COALESCE(w.a, 0) AS a, COALESCE(p.a, 0) AS c
  FROM w
  FULL OUTER JOIN w p
    ON p.event_type = w.event_type
   AND p.week_ms = w.week_ms - {_WEEK_MS}
), j AS (
  SELECT al.week_ms, al.a, al.c, t.b, tp.b AS d
  FROM al
  JOIN t ON t.week_ms = al.week_ms
  JOIN t tp ON tp.week_ms = al.week_ms - {_WEEK_MS}
)
SELECT week_ms, CAST(b AS BIGINT) AS n_events,
       CAST(sum(abs(a * d - c * b)) AS DOUBLE)
         / CAST(b * d AS DOUBLE) AS l1_drift
FROM j GROUP BY week_ms, b, d
""".strip()


# -------------------------------------------- seasonal autocorrelation


def q_metric_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-24h autocorrelation per metric — the seasonality-STRENGTH
    score that says whether `metric_forecast_snaive` is the right
    model before anyone trusts its backtest: r ≈ 1 means same-hour-
    yesterday explains the series, r ≈ 0 means the "seasonality" is
    noise.

    Pearson r over the (v_t, v_{t-24h}) pairs aligned by the same
    gap-safe self-join as the backtest.  Every moment (n, Σx, Σy, Σxy,
    Σx², Σy²) is an exact BIGINT; r's numerator/denominator assemble
    from identical integers on both engines, and the one sqrt+divide
    at the end is deterministic IEEE — the same discipline as
    `metric_trend`.  NULL when either side is constant (zero
    variance): "undefined", not 0.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    )
    prev = hourly.select(
        "event_type",
        (F.col("window_ts_ms") + F.lit(_SEASON_MS)).alias(
            "window_ts_ms"
        ),
        F.col("v").alias("y"),
    )
    pairs = hourly.join(prev, ["event_type", "window_ts_ms"]).select(
        "event_type", F.col("v").alias("x"), "y"
    )
    g = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    n = F.col("n")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    dx = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    dy = (n * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    r = F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy))
    return g.select(
        "event_type", F.col("n").alias("n_pairs"), r.alias("autocorr_24h")
    )


ORACLE_AUTOCORR = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), p AS (
  SELECT a.event_type, a.v AS x, b.v AS y
  FROM e a JOIN e b
    ON b.event_type = a.event_type
   AND b.window_ts_ms = a.window_ts_ms - {_SEASON_MS}
), g AS (
  SELECT event_type, count(*) AS n,
         sum(x) AS sx, sum(y) AS sy, sum(x * y) AS sxy,
         sum(x * x) AS sxx, sum(y * y) AS syy
  FROM p GROUP BY 1
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0
            THEN CAST(n * sxy - sx * sy AS DOUBLE)
                 / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)
                        * CAST(n * syy - sy * sy AS DOUBLE))
       END AS autocorr_24h
FROM g
""".strip()


# ----------------------------------------------- LTTB downsampling

_LTTB_OUT = 100  # target points per series


def q_metric_downsample_lttb(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Largest-Triangle-Three-Buckets downsampling (Steinarsson 2013)
    per metric — the PERCEPTUAL companion to `metric_downsample_m4`:
    M4 is pixel-exact for a known pixel width, LTTB picks the N points
    that best preserve the line's visual shape at any width (the
    default downsampler in Grafana/Plotly ecosystems).

    The greedy selection (each bucket keeps the point maximizing the
    triangle area with the PREVIOUSLY selected point and the next
    bucket's centroid) is inherently sequential per series, so it runs
    as one applyInPandas pass over the already-collapsed hourly series
    — ≤ |hours| points per metric, a few KB; the raw corpus never
    reaches Python. Rows-only: order-dependent greedy (exactness vs a
    numpy reference + shape properties pinned in
    tests/test_lttb.py).
    """
    import numpy as np
    import pandas as pd

    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        (F.sum("e2").cast("double") / F.lit(100.0)).alias("v")
    )

    def _lttb(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("window_ts_ms")
        x = pdf["window_ts_ms"].to_numpy(dtype=float)
        y = pdf["v"].to_numpy(dtype=float)
        idx = lttb_indices(x, y, _LTTB_OUT)
        return pd.DataFrame(
            {
                "event_type": key[0],
                "window_ts_ms": pdf["window_ts_ms"].to_numpy()[idx],
                "v": pdf["v"].to_numpy()[idx],
            }
        )

    return hourly.groupBy("event_type").applyInPandas(
        _lttb, "event_type string, window_ts_ms long, v double"
    )


def lttb_indices(x, y, n_out: int):
    """Classic LTTB index selection; shared by the Spark path and the
    test reference. Keeps first/last points; one point per interior
    bucket; ties break to the earliest point (argmax first hit)."""
    import numpy as np

    n = len(x)
    if n <= n_out:
        return np.arange(n)
    idx = [0]
    edges = np.linspace(1, n - 1, n_out - 1).astype(int)
    prev = 0
    for b in range(n_out - 2):
        lo, hi = edges[b], edges[b + 1]
        nlo, nhi = hi, (n if b == n_out - 3 else edges[b + 2])
        cx, cy = x[nlo:nhi].mean(), y[nlo:nhi].mean()
        ax, ay = x[prev], y[prev]
        area = np.abs(
            (ax - cx) * (y[lo:hi] - ay) - (ax - x[lo:hi]) * (cy - ay)
        )
        prev = lo + int(np.argmax(area))
        idx.append(prev)
    idx.append(n - 1)
    return np.asarray(idx)


# ------------------------------------------ seasonal decomposition

_DAY_MS = 24 * _HOUR_MS


def q_metric_seasonal_decompose(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Robust additive decomposition per metric: v = trend + seasonal
    + residual, with trend = per-(metric, day) MEDIAN and seasonal =
    per-(metric, hour-of-day) median of the detrended series — the
    STL-lite split that turns "traffic is weird" into WHICH component
    is weird (trend shift → capacity, seasonal shift → usage pattern,
    residual spike → incident; feed `anomaly_zscore` the residual and
    the 3 a.m. spike stops hiding behind the daily cycle).

    Medians keep the doubled/quadrupled fixed-point discipline of
    `metric_mad_anomaly` (t2 = 2·median(v), s4 = 2·median(2v − t2) —
    all BIGINT), and every output is ONE division of an exact integer
    (residual's numerator is 4v − 2·t2 − s4), so both engines emit
    identical doubles.  Two tiny broadcast join-backs; the collapsed
    series is touched, never raw events.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.sum("e2").alias("v")
    )
    # r11 (guide §2.4): `hourly` feeds the trend aggregate AND the
    # detrend join, `dt` feeds the seasonal aggregate AND the output
    # join — uncached, the events scan re-executed 4×. Both relations
    # are bounded at |metrics|×|hours|.
    hourly = hourly.withColumn(
        "day_ms",
        (F.col("window_ts_ms") / F.lit(_DAY_MS)).cast("long")
        * F.lit(_DAY_MS),
    ).withColumn(
        "hod",
        ((F.col("window_ts_ms") - F.col("day_ms")) / F.lit(_HOUR_MS))
        .cast("int"),
    ).cache()
    trend = hourly.groupBy("event_type", "day_ms").agg(
        F.expr("CAST(2 * percentile(v, 0.5D) AS BIGINT)").alias("t2")
    )
    dt = hourly.join(F.broadcast(trend), ["event_type", "day_ms"]).cache()
    seas = dt.groupBy("event_type", "hod").agg(
        F.expr(
            "CAST(2 * percentile(2 * v - t2, 0.5D) AS BIGINT)"
        ).alias("s4")
    )
    out = dt.join(F.broadcast(seas), ["event_type", "hod"])
    return out.select(
        "event_type",
        "window_ts_ms",
        (F.col("v").cast("double") / F.lit(100.0)).alias("value"),
        (F.col("t2").cast("double") / F.lit(200.0)).alias("trend"),
        (F.col("s4").cast("double") / F.lit(400.0)).alias("seasonal"),
        (
            (
                F.lit(4) * F.col("v")
                - F.lit(2) * F.col("t2")
                - F.col("s4")
            ).cast("double")
            / F.lit(400.0)
        ).alias("residual"),
    )


ORACLE_SEASONAL_DECOMPOSE = f"""
WITH e AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), h AS (
  SELECT *, (window_ts_ms // {_DAY_MS}) * {_DAY_MS} AS day_ms,
         CAST((window_ts_ms - (window_ts_ms // {_DAY_MS}) * {_DAY_MS})
              // {_HOUR_MS} AS INTEGER) AS hod
  FROM e
), t AS (
  SELECT event_type, day_ms, CAST(2 * median(v) AS BIGINT) AS t2
  FROM h GROUP BY 1, 2
), d AS (
  SELECT h.*, t.t2 FROM h JOIN t USING (event_type, day_ms)
), sn AS (
  SELECT event_type, hod,
         CAST(2 * median(2 * v - t2) AS BIGINT) AS s4
  FROM d GROUP BY 1, 2
)
SELECT d.event_type, d.window_ts_ms,
       CAST(d.v AS DOUBLE) / 100.0 AS value,
       CAST(d.t2 AS DOUBLE) / 200.0 AS trend,
       CAST(sn.s4 AS DOUBLE) / 400.0 AS seasonal,
       CAST(4 * d.v - 2 * d.t2 - sn.s4 AS DOUBLE) / 400.0 AS residual
FROM d JOIN sn USING (event_type, hod)
""".strip()


# ------------------------------------- rolling distinct via KMV merge

_ROLL_HOURS = 24


def q_agg_rolling_distinct_kmv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rolling 24 h distinct users per hour from HOURLY KMV sketches —
    sliding-window cardinality by sketch RE-AGGREGATION: build one
    sketch per hour (one raw shuffle), then each rolling window merges
    24 sketch rows via flatten → distinct → slice — pure column
    algebra on ≤ 24·k hashes, the bounded-state path where the exact
    formulation (`events_rolling_wau`'s distinct (user, day) fan-out)
    grows with true cardinality.

    The 24-way merge reuses the lossless-union property pinned in
    test_kmv.py: merging per-hour sketches equals sketching the
    window's union, so below the cap the estimate is EXACT and the
    DuckDB oracle (exact rolling distinct) matches bit-for-bit; above
    the cap this same plan degrades to ±3% instead of degrading to a
    bigger shuffle.  Windows with no events in some trailing hours
    merge only the present hours (gap-safe offset join, same idiom as
    `agg_window_stickiness`).
    """
    ev = load_table(spark, sf_dir, "events").select("ts", "user_id")
    sk = ev.groupBy(_hourly_window()).agg(
        kmv_agg_if(F.col("user_id"), F.lit(True), _KMV_K).alias("sk")
    )
    # offset join: target window w collects hour sketches w-23h..w
    offsets = spark.range(_ROLL_HOURS).select(
        (F.col("id") * F.lit(_HOUR_MS)).alias("off")
    )
    fan = sk.crossJoin(F.broadcast(offsets)).select(
        (F.col("window_ts_ms") + F.col("off")).alias("target_ms"),
        "sk",
    )
    # only emit targets that themselves have events (match the
    # oracle's "per active hour" row set)
    active = sk.select(F.col("window_ts_ms").alias("target_ms"))
    merged = (
        fan.join(F.broadcast(active), "target_ms")
        .groupBy("target_ms")
        .agg(F.flatten(F.collect_list("sk")).alias("all_h"))
        .select(
            "target_ms",
            F.slice(
                F.array_sort(F.array_distinct(F.col("all_h"))),
                1,
                _KMV_K,
            ).alias("sk"),
        )
    )
    return merged.select(
        F.col("target_ms").alias("window_ts_ms"),
        kmv_estimate(F.col("sk"), _KMV_K).cast("long").alias(
            "n_active_24h"
        ),
    )


ORACLE_ROLLING_DISTINCT = f"""
WITH w AS (
  SELECT DISTINCT {_W_SQL} AS w_ms, user_id FROM events
), hours AS (
  SELECT DISTINCT w_ms FROM w
)
SELECT h.w_ms AS window_ts_ms,
       count(DISTINCT u.user_id) AS n_active_24h
FROM hours h
JOIN w u ON u.w_ms BETWEEN h.w_ms - {(_ROLL_HOURS - 1)} * {_HOUR_MS}
                       AND h.w_ms
GROUP BY 1
""".strip()


# ------------------------------------------------------------- apdex

_APDEX_T_E2 = 5000  # satisfied threshold T = 50.00 value units


def q_metric_apdex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apdex score per (metric, hour): (satisfied + tolerating/2) /
    total with satisfied ≤ T and tolerating ≤ 4T — the contractual
    SLA number distilled from the latency histogram (industry
    standard; one number a customer signs).

    Counts are conditional integer aggregates in ONE pass (no second
    scan per class); the half-weight evaluates as (2·sat + tol) /
    (2·total) — a single division of exact BIGINTs, no 0.5 float
    anywhere.  Same one-shuffle plan as every series query.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    t = F.lit(_APDEX_T_E2)
    g = ev.groupBy(F.col("event_type"), _hourly_window()).agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum((F.col("e2") <= t).cast("long")).alias("n_sat"),
        F.sum(
            ((F.col("e2") > t) & (F.col("e2") <= t * 4)).cast("long")
        ).alias("n_tol"),
    )
    return g.select(
        "event_type",
        "window_ts_ms",
        "n_total",
        "n_sat",
        "n_tol",
        (
            (F.lit(2) * F.col("n_sat") + F.col("n_tol")).cast("double")
            / (F.lit(2) * F.col("n_total")).cast("double")
        ).alias("apdex"),
    )


ORACLE_APDEX = f"""
SELECT event_type, {_W_SQL} AS window_ts_ms,
       count(*) AS n_total,
       CAST(sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                          <= {_APDEX_T_E2} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_sat,
       CAST(sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                          > {_APDEX_T_E2}
                      AND CAST(floor(value * 100 + 0.5) AS BIGINT)
                          <= {4 * _APDEX_T_E2} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_tol,
       CAST(2 * sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                              <= {_APDEX_T_E2} THEN 1 ELSE 0 END)
            + sum(CASE WHEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                            > {_APDEX_T_E2}
                        AND CAST(floor(value * 100 + 0.5) AS BIGINT)
                            <= {4 * _APDEX_T_E2} THEN 1 ELSE 0 END)
            AS DOUBLE)
         / CAST(2 * count(*) AS DOUBLE) AS apdex
FROM events GROUP BY 1, 2
""".strip()


# --------------------------------- tail-latency (p95) trend per metric


def q_metric_p95_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TAIL-latency trend: exact discrete p95 of the value per
    (metric, day), then the OLS slope of that daily-p95 series — mean
    trends (``metric_trend``) hide tail regressions, and "p95 is
    drifting up 2ms/day" is the on-call question the mean never
    answers. p95 is the smallest value whose cumulative count reaches
    ceil(0.95·n) (rank-based — both engines pick the identical row);
    the slope reuses the exact-BIGINT power-sum normal equations of
    ``metric_trend`` on (epoch-day, p95-cents) points.

    Scale: the percentile never windows over raw rows — (metric, day,
    value-cents) counts aggregate first (bounded by distinct values
    per day), the cumulative runs over that histogram, and the OLS
    input is one row per (metric, day).
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_millis(F.col("ts")) / F.lit(_DAY_MS))
        .cast("long")
        .alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hist = ev.groupBy("event_type", "day", "e2").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    pw = Window.partitionBy("event_type", "day")
    cum_w = pw.orderBy("e2").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    with_cum = hist.select(
        "event_type",
        "day",
        "e2",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(pw).alias("n"),
    )
    # ceil(0.95·n) in integers: (95·n + 99) div 100
    need = ((F.lit(95) * F.col("n") + F.lit(99)) / F.lit(100)).cast("long")
    p95 = (
        with_cum.filter(F.col("cum") >= need)
        .groupBy("event_type", "day")
        .agg(F.min("e2").alias("p95_e2"))
    )
    g = p95.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("day").alias("sx"),
        F.sum("p95_e2").alias("sy"),
        F.sum(F.col("day") * F.col("p95_e2")).alias("sxy"),
        F.sum(F.col("day") * F.col("day")).alias("sxx"),
        F.min_by("p95_e2", "day").alias("first_e2"),
        F.max_by("p95_e2", "day").alias("last_e2"),
    )
    n = F.col("n_days")
    num = (n * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = (n * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    slope = F.when(n > 1, num / den)
    return g.select(
        "event_type",
        "n_days",
        (slope / F.lit(100.0)).alias("p95_slope_per_day"),
        (F.col("first_e2") / F.lit(100.0)).alias("p95_first"),
        (F.col("last_e2") / F.lit(100.0)).alias("p95_last"),
    )


ORACLE_P95_TREND = f"""
WITH e AS (
  SELECT event_type, epoch_ms(ts) // {_DAY_MS} AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS e2
  FROM events
), hist AS (
  SELECT event_type, day, e2, count(*) AS cnt
  FROM e GROUP BY 1, 2, 3
), with_cum AS (
  SELECT event_type, day, e2,
         sum(cnt) OVER (PARTITION BY event_type, day ORDER BY e2
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type, day) AS n
  FROM hist
), p95 AS (
  SELECT event_type, day, min(e2) AS p95_e2
  FROM with_cum WHERE cum >= (95 * n + 99) // 100
  GROUP BY 1, 2
), g AS (
  SELECT event_type, count(*) AS n_days, sum(day) AS sx,
         sum(p95_e2) AS sy, sum(day * p95_e2) AS sxy,
         sum(day * day) AS sxx,
         min_by(p95_e2, day) AS first_e2, max_by(p95_e2, day) AS last_e2
  FROM p95 GROUP BY 1
)
SELECT event_type, n_days,
       CASE WHEN n_days > 1 THEN
         (CAST(n_days * sxy - sx * sy AS DOUBLE)
          / CAST(n_days * sxx - sx * sx AS DOUBLE)) / 100.0 END
         AS p95_slope_per_day,
       CAST(first_e2 AS DOUBLE) / 100.0 AS p95_first,
       CAST(last_e2 AS DOUBLE) / 100.0 AS p95_last
FROM g
""".strip()


# ----------------------- Population Stability Index (PSI) per metric


_PSI_BUCKETS = 10


def q_metric_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index per metric: the industry-standard
    distribution-shift score (Σ (p−q)·ln(p/q) over reference-period
    deciles; <0.1 stable, >0.25 major shift) between the corpus's
    first and second half by day — the ML-monitoring sibling of
    ``corpus_ks_by_source``'s KS (KS is a max-gap test statistic; PSI
    is the banded magnitude score model-risk teams alert on).

    Reference decile EDGES are exact discrete order statistics from
    the first-half value histogram (the winsorize machinery: per-value
    counts → cumulative → smallest value at each k/10 rank). Both
    periods then bucket THEIR HISTOGRAMS against the 9 broadcast
    edges (bucket = Σ(edge < v) over the bounded (metric, value)
    relation — never a per-raw-row edge scan), counts get add-1
    smoothing so empty buckets stay finite, and each bucket's
    (p−q)·ln(p/q) term is e6-fixed before the order-free sum.

    Scale: two scans collapse to (metric, period, value) histograms;
    everything after runs on histogram cells and a ≤ 9·|metrics| edge
    relation.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_millis(F.col("ts")) / F.lit(86_400_000))
        .cast("long")
        .alias("day"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    span = ev.agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    # deterministic midpoint: first half = reference period
    ev = ev.crossJoin(F.broadcast(span)).select(
        "event_type",
        "e2",
        (F.col("day") < (F.col("d0") + F.col("d1") + 1) / 2).alias(
            "is_ref"
        ),
    )
    # r11 optimization (guide §2.4): the histogram is bounded by
    # distinct (metric, period, value) cells and feeds BOTH the edge
    # derivation and the bucketing join — materialize it once instead
    # of re-scanning events per branch.
    hist = ev.groupBy("event_type", "is_ref", "e2").agg(
        F.count(F.lit(1)).alias("cnt")
    ).cache()
    ref = hist.filter(F.col("is_ref"))
    cum_w = (
        Window.partitionBy("event_type")
        .orderBy("e2")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    all_w = Window.partitionBy("event_type")
    cum = ref.select(
        "event_type",
        "e2",
        F.sum("cnt").over(cum_w).alias("cum"),
        F.sum("cnt").over(all_w).alias("n"),
    )
    # all 9 decile edges in ONE aggregate pass over the cumulative
    # histogram (9 conditional mins), then a stack() unpivot — the
    # per-edge filter+groupBy loop this replaces launched 9 sub-jobs
    def _need(k: int):
        return (
            (F.lit(k) * F.col("n") + F.lit(_PSI_BUCKETS - 1))
            / F.lit(_PSI_BUCKETS)
        ).cast("long")

    edges_wide = cum.groupBy("event_type").agg(
        *[
            F.min(
                F.when(F.col("cum") >= _need(k), F.col("e2"))
            ).alias(f"_e{k}")
            for k in range(1, _PSI_BUCKETS)
        ]
    )
    stack = ", ".join(
        f"{k}, _e{k}" for k in range(1, _PSI_BUCKETS)
    )
    edges = edges_wide.select(
        "event_type",
        F.expr(
            f"stack({_PSI_BUCKETS - 1}, {stack}) AS (k, edge)"
        ),
    )
    # bucket of a histogram cell = number of edges strictly below it
    bucketed = (
        hist.join(F.broadcast(edges), "event_type")
        .select(
            "event_type",
            "is_ref",
            "e2",
            "cnt",
            (F.col("edge") < F.col("e2")).cast("long").alias("above"),
        )
        .groupBy("event_type", "is_ref", "e2", "cnt")
        .agg(F.sum("above").alias("bucket"))
    )
    per_bucket = bucketed.groupBy("event_type", "bucket").agg(
        F.sum(F.when(F.col("is_ref"), F.col("cnt")).otherwise(0)).alias(
            "n_ref"
        ),
        F.sum(F.when(~F.col("is_ref"), F.col("cnt")).otherwise(0)).alias(
            "n_cur"
        ),
    ).cache()  # ≤ buckets·|metrics| rows; reused by tot + join
    tot = per_bucket.groupBy("event_type").agg(
        F.sum("n_ref").alias("t_ref"), F.sum("n_cur").alias("t_cur")
    )
    j = per_bucket.join(F.broadcast(tot), "event_type")
    # add-1 smoothing keeps empty buckets finite; p/q as ONE double
    # division of exact cross-products, term e6-fixed pre-sum
    p_num = (F.col("n_ref") + 1).cast("double")
    q_num = (F.col("n_cur") + 1).cast("double")
    p_den = (F.col("t_ref") + _PSI_BUCKETS).cast("double")
    q_den = (F.col("t_cur") + _PSI_BUCKETS).cast("double")
    p = p_num / p_den
    q = q_num / q_den
    term6 = F.floor((p - q) * F.log(p / q) * F.lit(1e6) + F.lit(0.5)).cast(
        "long"
    )
    out = j.groupBy("event_type").agg(
        F.max("t_ref").alias("n_ref"),
        F.max("t_cur").alias("n_cur"),
        F.sum(term6).alias("psi6"),
    )
    psi = F.col("psi6").cast("double") / F.lit(1e6)
    return out.select(
        "event_type",
        "n_ref",
        "n_cur",
        stable_round(psi, 6).alias("psi"),
        F.when(psi < 0.1, "stable")
        .when(psi < 0.25, "moderate_shift")
        .otherwise("major_shift")
        .alias("verdict"),
    )


_PSI_EDGE_KS = ", ".join(str(k) for k in range(1, _PSI_BUCKETS))

ORACLE_PSI = f"""
WITH e AS (
  SELECT event_type, epoch_ms(ts) // 86400000 AS day,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS e2
  FROM events
),
span AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
tagged AS (
  SELECT event_type, e2, day < (d0 + d1 + 1) / 2 AS is_ref
  FROM e CROSS JOIN span
),
hist AS (
  SELECT event_type, is_ref, e2, count(*) AS cnt
  FROM tagged GROUP BY 1, 2, 3
),
cum AS (
  SELECT event_type, e2,
         sum(cnt) OVER (PARTITION BY event_type ORDER BY e2
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(cnt) OVER (PARTITION BY event_type) AS n
  FROM hist WHERE is_ref
),
edges AS (
  SELECT event_type, k, min(e2) AS edge
  FROM cum CROSS JOIN (SELECT unnest([{_PSI_EDGE_KS}]) AS k) ks
  WHERE cum >= (k * n + {_PSI_BUCKETS - 1}) // {_PSI_BUCKETS}
  GROUP BY 1, 2
),
bucketed AS (
  SELECT h.event_type, h.is_ref, h.e2, h.cnt,
         sum(CASE WHEN ed.edge < h.e2 THEN 1 ELSE 0 END) AS bucket
  FROM hist h JOIN edges ed ON ed.event_type = h.event_type
  GROUP BY 1, 2, 3, 4
),
per_bucket AS (
  SELECT event_type, bucket,
         sum(CASE WHEN is_ref THEN cnt ELSE 0 END) AS n_ref,
         sum(CASE WHEN NOT is_ref THEN cnt ELSE 0 END) AS n_cur
  FROM bucketed GROUP BY 1, 2
),
tot AS (
  SELECT event_type, sum(n_ref) AS t_ref, sum(n_cur) AS t_cur
  FROM per_bucket GROUP BY 1
),
terms AS (
  SELECT p.event_type, t.t_ref, t.t_cur,
         CAST(floor(
           (CAST(p.n_ref + 1 AS DOUBLE) / CAST(t.t_ref + {_PSI_BUCKETS}
              AS DOUBLE)
            - CAST(p.n_cur + 1 AS DOUBLE) / CAST(t.t_cur + {_PSI_BUCKETS}
              AS DOUBLE))
           * ln((CAST(p.n_ref + 1 AS DOUBLE) / CAST(t.t_ref +
                {_PSI_BUCKETS} AS DOUBLE))
              / (CAST(p.n_cur + 1 AS DOUBLE) / CAST(t.t_cur +
                {_PSI_BUCKETS} AS DOUBLE)))
           * 1e6 + 0.5) AS BIGINT) AS term6
  FROM per_bucket p JOIN tot t ON t.event_type = p.event_type
)
SELECT event_type,
       CAST(max(t_ref) AS BIGINT) AS n_ref,
       CAST(max(t_cur) AS BIGINT) AS n_cur,
       {sql_stable_round("CAST(sum(term6) AS DOUBLE) / 1e6", 6)} AS psi,
       CASE WHEN CAST(sum(term6) AS DOUBLE) / 1e6 < 0.1 THEN 'stable'
            WHEN CAST(sum(term6) AS DOUBLE) / 1e6 < 0.25
              THEN 'moderate_shift'
            ELSE 'major_shift' END AS verdict
FROM terms GROUP BY event_type
""".strip()


# --------------------------------- topographic peak prominence

_PEAK_TOPK = 3


def q_metric_peak_prominence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Topographic peak PROMINENCE per metric (the scipy
    ``find_peaks(prominence=)`` semantics): a local maximum's
    prominence is its height above the highest COL separating it from
    higher terrain — min-between-here-and-the-next-higher-point on
    each side, prominence = v − max(left base, right base). This is
    the alerting question raw local maxima can't answer: a 2%-ripple
    "peak" on a plateau has near-zero prominence while a genuine
    spike keeps its full height — the peak-DETECTION face of the
    series family (M4/LTTB draw the shape, SAX names it, this ranks
    its summits). Top-3 peaks per metric by (prominence DESC, ts).

    Semantics pinned to scipy's: plateaus count once at their FIRST
    sample (strict > previous, ≥ next); series endpoints are not
    peaks; a side with no higher point bases at the minimum to the
    series EDGE. Everything is exact e2 integers — prominence
    included — so the oracle matches bit-for-bit.

    Scale: per-metric joins between the collapsed hourly series and
    its peak set (|series|×|peaks| per metric, both bounded by the
    time range — the same cost class as `series_shape_search`'s
    windows); no global windows, no collect."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    hourly = ev.groupBy(
        "event_type",
        (
            (F.col("ts_ms") / F.lit(_HOUR_MS)).cast("long")
            * F.lit(_HOUR_MS)
        ).alias("w"),
    ).agg(F.sum("e2").alias("v"))
    iw = Window.partitionBy("event_type").orderBy("w")
    # r11 (guide §2.4): the indexed series feeds FOUR consumers
    # (peaks, and `ser` joined in twice more) and each re-ran the
    # corpus scan + hourly shuffle + window — cache the bounded
    # |metrics|×|hours| relation once.
    s = hourly.select(
        "event_type",
        "w",
        "v",
        F.row_number().over(iw).alias("i"),
        F.lag("v").over(iw).alias("pv"),
        F.lead("v").over(iw).alias("nv"),
    ).cache()
    peaks = s.filter(
        (F.col("v") > F.col("pv")) & (F.col("v") >= F.col("nv"))
    ).select(
        "event_type",
        F.col("w").alias("pw"),
        F.col("v").alias("peak_v"),
        F.col("i").alias("pi"),
    )
    ser = s.select("event_type", "i", "v")
    # nearest strictly-higher terrain on each side of every peak
    higher = peaks.join(ser, "event_type").filter(
        F.col("v") > F.col("peak_v")
    )
    lr = higher.groupBy("event_type", "pw", "peak_v", "pi").agg(
        F.max(F.when(F.col("i") < F.col("pi"), F.col("i"))).alias("li"),
        F.min(F.when(F.col("i") > F.col("pi"), F.col("i"))).alias("ri"),
    )
    bounds = peaks.join(
        lr, ["event_type", "pw", "peak_v", "pi"], "left"
    )
    # base on each side: min v strictly between the col index (or the
    # series edge) and the peak — non-empty by construction (the
    # immediate neighbors are lower, so a higher point is ≥2 away)
    cols = bounds.join(ser, "event_type").groupBy(
        "event_type", "pw", "peak_v", "pi"
    ).agg(
        F.min(
            F.when(
                (F.col("i") < F.col("pi"))
                & (F.col("i") > F.coalesce(F.col("li"), F.lit(0))),
                F.col("v"),
            )
        ).alias("lc"),
        F.min(
            F.when(
                (F.col("i") > F.col("pi"))
                & (
                    F.col("i")
                    < F.coalesce(F.col("ri"), F.lit(2**62))
                ),
                F.col("v"),
            )
        ).alias("rc"),
    )
    prom = F.col("peak_v") - F.greatest(
        F.coalesce(F.col("lc"), F.col("rc")),
        F.coalesce(F.col("rc"), F.col("lc")),
    )
    tw = Window.partitionBy("event_type").orderBy(
        prom.desc(), F.col("pw")
    )
    return (
        cols.withColumn("rank", F.row_number().over(tw))
        .filter(F.col("rank") <= _PEAK_TOPK)
        .select(
            "event_type",
            "rank",
            F.col("pw").alias("window_ts_ms"),
            F.col("peak_v").alias("peak_e2"),
            prom.alias("prominence_e2"),
        )
    )


ORACLE_PEAK_PROMINENCE = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS w,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), s AS (
  SELECT event_type, w, v,
         row_number() OVER pw AS i,
         lag(v) OVER pw AS pv, lead(v) OVER pw AS nv
  FROM hourly
  WINDOW pw AS (PARTITION BY event_type ORDER BY w)
), peaks AS (
  SELECT event_type, w AS pw, v AS peak_v, i AS pi
  FROM s WHERE v > pv AND v >= nv
), lr AS (
  SELECT p.event_type, p.pw, p.peak_v, p.pi,
         max(CASE WHEN t.i < p.pi THEN t.i END) AS li,
         min(CASE WHEN t.i > p.pi THEN t.i END) AS ri
  FROM peaks p
  LEFT JOIN s t ON t.event_type = p.event_type AND t.v > p.peak_v
  GROUP BY 1, 2, 3, 4
), cols AS (
  SELECT b.event_type, b.pw, b.peak_v,
         min(CASE WHEN t.i < b.pi
                   AND t.i > coalesce(b.li, 0)
              THEN t.v END) AS lc,
         min(CASE WHEN t.i > b.pi
                   AND t.i < coalesce(b.ri, 4611686018427387904)
              THEN t.v END) AS rc
  FROM lr b
  JOIN s t ON t.event_type = b.event_type
  GROUP BY b.event_type, b.pw, b.peak_v, b.pi
)
SELECT event_type, CAST(rank AS INT) AS rank,
       pw AS window_ts_ms, CAST(peak_v AS BIGINT) AS peak_e2,
       CAST(prominence AS BIGINT) AS prominence_e2
FROM (
  SELECT *,
         peak_v - greatest(coalesce(lc, rc), coalesce(rc, lc))
           AS prominence,
         row_number() OVER (
           PARTITION BY event_type
           ORDER BY peak_v - greatest(coalesce(lc, rc),
                                      coalesce(rc, lc)) DESC,
                    pw) AS rank
  FROM cols
) WHERE rank <= {_PEAK_TOPK}
""".strip()


# ------------------------------- day-level variance decomposition

_DAY_MS_ANOVA = 24 * 3600 * 1000


def q_metric_anova_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA per metric with DAYS as groups — the variance
    DECOMPOSITION the anomaly family implicitly assumes an answer to:
    is this metric's noise hour-to-hour jitter WITHIN a day
    (trailing-window baselines work) or day-to-day level shifts
    BETWEEN days (only the seasonal/day-relative baselines can work)?
    η² = SS_between/SS_total is the fraction of hourly variance
    explained by which day it is; F = (SS_b/(k−1))/(SS_w/(n−k)) the
    classical test statistic.

    Exactness: the only divisions inside the sums — S_d² div n_d and
    S² div n — run as exact two-step long division
    (q = S div n, r = S mod n → S² div n = q·S + (r·S) div n) with
    BOTH products q·S and r·S carried in DEC38/HUGEINT: a direct
    DECIMAL(38,0) ``div`` of S² silently overflows its BIGINT result
    in Spark, while the two-step quotients each fit BIGINT by
    construction (each ≤ S·max(n)/n ≤ S·… bounded by S itself), so
    Spark's decimal ``div`` is exact for them — and r·S alone can
    pass 2⁶³ at 100 TB metric-level sums (r ≤ 719 hours × S ≈
    7·10¹⁷), which the hypothesis property test pins. Each floor
    loses <1 against terms ~10³², identically in both engines; the
    final η²/F are single double divisions.

    Scale: raw scan → |metrics|×|hours| series (one shuffle); the
    day aggregate and metric rollup are metric-sized."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    hourly = ev.groupBy(
        "event_type",
        (
            (F.col("ts_ms") / F.lit(_HOUR_MS)).cast("long")
            * F.lit(_HOUR_MS)
        ).alias("w"),
    ).agg(F.sum("e2").alias("v"))
    per_day = hourly.groupBy(
        "event_type",
        F.expr(f"w div {_DAY_MS_ANOVA}").alias("day"),
    ).agg(
        F.count(F.lit(1)).alias("nd"),
        F.sum("v").alias("sd"),
        F.sum(F.col("v").cast(_DEC_AR) * F.col("v").cast(_DEC_AR)).alias(
            "qd"
        ),
    )
    # exact floor(sd² / nd): q·sd + (r·sd) div nd — r·sd carried in
    # DEC38 (decimal div is exact when the QUOTIENT fits BIGINT,
    # which (r·sd) div nd ≤ sd always does)
    td = F.expr("sd div nd").cast(_DEC_AR) * F.col("sd").cast(
        _DEC_AR
    ) + F.expr(
        f"(CAST(sd % nd AS {_DEC_AR}) * sd) div nd"
    ).cast(_DEC_AR)
    per_metric = per_day.groupBy("event_type").agg(
        F.sum("nd").alias("n"),
        F.count(F.lit(1)).alias("k"),
        F.sum("sd").alias("s"),
        F.sum("qd").alias("q"),
        F.sum(td).alias("a"),
    )
    b = F.expr("s div n").cast(_DEC_AR) * F.col("s").cast(
        _DEC_AR
    ) + F.expr(
        f"(CAST(s % n AS {_DEC_AR}) * s) div n"
    ).cast(_DEC_AR)
    ss_b = (F.col("a") - b).cast("double")
    ss_w = (F.col("q") - F.col("a")).cast("double")
    ss_t = (F.col("q") - b).cast("double")
    eta2 = F.when(ss_t > 0, ss_b / ss_t)
    f_stat = F.when(
        (F.col("k") > 1) & (F.col("n") > F.col("k")) & (ss_w > 0),
        (ss_b / (F.col("k") - 1).cast("double"))
        / (ss_w / (F.col("n") - F.col("k")).cast("double")),
    )
    return per_metric.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("k").cast("long").alias("n_days"),
        stable_round(eta2, 6).alias("eta2_between_days"),
        stable_round(f_stat, 4).alias("f_stat"),
    )


ORACLE_ANOVA_DAYS = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS w,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), per_day AS (
  SELECT event_type, w // {_DAY_MS_ANOVA} AS day,
         count(*) AS nd, sum(v) AS sd,
         sum(CAST(v AS HUGEINT) * v) AS qd
  FROM hourly GROUP BY 1, 2
), per_metric AS (
  SELECT event_type, sum(nd) AS n, count(*) AS k, sum(sd) AS s,
         sum(qd) AS q,
         sum(CAST(sd // nd AS HUGEINT) * sd
             + ((sd % nd) * sd) // nd) AS a
  FROM per_day GROUP BY 1
), f AS (
  SELECT event_type, n, k, q, a,
         CAST(s // n AS HUGEINT) * s + ((s % n) * s) // n AS b
  FROM per_metric
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       CAST(k AS BIGINT) AS n_days,
       {sql_stable_round(
           "CASE WHEN CAST(q - b AS DOUBLE) > 0 THEN"
           " CAST(a - b AS DOUBLE) / CAST(q - b AS DOUBLE) END", 6)}
         AS eta2_between_days,
       {sql_stable_round(
           "CASE WHEN k > 1 AND n > k AND CAST(q - a AS DOUBLE) > 0"
           " THEN (CAST(a - b AS DOUBLE) / (k - 1))"
           " / (CAST(q - a AS DOUBLE) / (n - k)) END", 4)} AS f_stat
FROM f
""".strip()


# ----------------------------------------- AR(1) mean-reversion fit

_DEC_AR = "decimal(38,0)"


def q_metric_ar1_fit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """AR(1) fit per metric: v_t = c + φ·v_{t−1} + ε over the hourly
    series — the MEAN-REVERSION readout beside the family's trend
    (OLS/Theil–Sen) and seasonality (lag-24 autocorr) fits: φ near 1
    means shocks persist (capacity-style drift — alert on level), φ
    near 0 means they wash out next hour (alert on spikes instead),
    and the shock HALF-LIFE −ln2/lnφ converts φ into the operator's
    unit ("how long until half the deviation is gone"). The
    Holt-Winters bake-off asks which forecaster wins; this asks what
    the series' memory IS.

    φ by OLS over the (v_{t−1}, v_t) lag pairs: φ = (n·Σxy − Σx·Σy)
    / (n·Σxx − Σx²), every sum an exact integer (DEC38 — v ≈ 10¹⁵
    e2-units per metric-hour at 100 TB puts v² at 10³⁰ and the
    n-scaled sums near 10³⁵, inside DEC38; DuckDB mirrors in
    HUGEINT), then ONE division into doubles; ln() is IEEE-identical
    both engines. A constant series (zero variance) reports NULL φ.

    Scale: raw scan collapses to the |metrics|×|hours| series first
    (one shuffle, map-side partials); the lag() window partitions BY
    METRIC over the collapsed series; the fit is a metric-sized
    aggregate.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    hourly = ev.groupBy(
        "event_type",
        (
            (F.col("ts_ms") / F.lit(_HOUR_MS)).cast("long")
            * F.lit(_HOUR_MS)
        ).alias("window_ts_ms"),
    ).agg(F.sum("e2").alias("v"))
    w = Window.partitionBy("event_type").orderBy("window_ts_ms")
    pairs = hourly.select(
        "event_type",
        F.lag("v").over(w).alias("x"),
        F.col("v").alias("y"),
    ).filter(F.col("x").isNotNull())
    s = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(_DEC_AR) * F.col("y").cast(_DEC_AR)).alias(
            "sxy"
        ),
        F.sum(F.col("x").cast(_DEC_AR) * F.col("x").cast(_DEC_AR)).alias(
            "sxx"
        ),
    )
    num = (
        F.col("n").cast(_DEC_AR) * F.col("sxy")
        - F.col("sx").cast(_DEC_AR) * F.col("sy").cast(_DEC_AR)
    ).cast("double")
    den = (
        F.col("n").cast(_DEC_AR) * F.col("sxx")
        - F.col("sx").cast(_DEC_AR) * F.col("sx").cast(_DEC_AR)
    ).cast("double")
    phi = F.when(den != 0, num / den)
    intercept_e2 = (
        F.col("sy").cast("double") - phi * F.col("sx").cast("double")
    ) / F.col("n").cast("double")
    halflife = F.when(
        (phi > 0) & (phi < 1),
        -F.log(F.lit(2.0)) / F.log(phi),
    )
    return s.select(
        "event_type",
        F.col("n").alias("n_pairs"),
        stable_round(phi, 6).alias("phi"),
        stable_round(intercept_e2 / F.lit(100.0), 4).alias("intercept"),
        stable_round(halflife, 4).alias("halflife_hours"),
    )


ORACLE_AR1 = f"""
WITH hourly AS (
  SELECT event_type, {_W_SQL} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), pairs AS (
  SELECT event_type,
         lag(v) OVER (PARTITION BY event_type
                      ORDER BY window_ts_ms) AS x,
         v AS y
  FROM hourly
), s AS (
  SELECT event_type, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx
  FROM pairs WHERE x IS NOT NULL GROUP BY 1
), f AS (
  SELECT event_type, n,
         CASE WHEN CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)
                   != 0
              THEN CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                   / CAST(n * sxx - CAST(sx AS HUGEINT) * sx
                          AS DOUBLE)
         END AS phi,
         CAST(sy AS DOUBLE) AS syd, CAST(sx AS DOUBLE) AS sxd
  FROM s
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       {sql_stable_round("phi", 6)} AS phi,
       {sql_stable_round("(syd - phi * sxd) / n / 100.0", 4)}
         AS intercept,
       {sql_stable_round(
           "CASE WHEN phi > 0 AND phi < 1"
           " THEN -ln(2.0) / ln(phi) END", 4)} AS halflife_hours
FROM f
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "metric_ar1_fit": q_metric_ar1_fit,
    "metric_anova_days": q_metric_anova_days,
    "metric_peak_prominence": q_metric_peak_prominence,
    "metric_p95_trend": q_metric_p95_trend,
    "metric_psi": q_metric_psi,
    "agg_distinct_overlap": q_agg_distinct_overlap,
    "agg_window_stickiness": q_agg_window_stickiness,
    "metric_mad_anomaly": q_metric_mad_anomaly,
    "metric_cusum": q_metric_cusum,
    "metric_alert_cooldown": q_metric_alert_cooldown,
    "metric_alert_maintenance": q_metric_alert_maintenance,
    "metric_correlogram": q_metric_correlogram,
    "metric_fano_factor": q_metric_fano_factor,
    "metric_pacf": q_metric_pacf,  # rows-only (Durbin-Levinson fold)
    "metric_alert_overlap": q_metric_alert_overlap,
    "metric_mttr": q_metric_mttr,
    "metric_capacity_eta": q_metric_capacity_eta,
    "metric_trend": q_metric_trend,
    "metric_trend_theilsen": q_metric_trend_theilsen,
    "series_shape_search": q_series_shape_search,
    "metric_forecast_snaive": q_metric_forecast_snaive,
    "metric_forecast_holtwinters": q_metric_forecast_holtwinters,  # rows-only (recursive state)
    "metric_backtest_hw_vs_snaive": q_metric_backtest_hw_vs_snaive,  # rows-only (recursive state)
    "metric_top_contributors": q_metric_top_contributors,
    "metric_mix_drift": q_metric_mix_drift,
    "metric_autocorr": q_metric_autocorr,
    "metric_downsample_lttb": q_metric_downsample_lttb,  # rows-only
    "metric_seasonal_decompose": q_metric_seasonal_decompose,
    "agg_rolling_distinct_kmv": q_agg_rolling_distinct_kmv,
    "metric_apdex": q_metric_apdex,
}

ORACLES: dict[str, str] = {
    "metric_ar1_fit": ORACLE_AR1,
    "metric_anova_days": ORACLE_ANOVA_DAYS,
    "metric_peak_prominence": ORACLE_PEAK_PROMINENCE,
    "metric_p95_trend": ORACLE_P95_TREND,
    "metric_psi": ORACLE_PSI,
    "agg_distinct_overlap": ORACLE_DISTINCT_OVERLAP,
    "agg_window_stickiness": ORACLE_WINDOW_STICKINESS,
    "metric_mad_anomaly": ORACLE_MAD_ANOMALY,
    "metric_cusum": ORACLE_CUSUM,
    "metric_alert_cooldown": ORACLE_ALERT_COOLDOWN,
    "metric_alert_maintenance": ORACLE_ALERT_MAINTENANCE,
    "metric_correlogram": ORACLE_CORRELOGRAM,
    "metric_fano_factor": ORACLE_FANO,
    "metric_alert_overlap": ORACLE_ALERT_OVERLAP,
    "metric_mttr": ORACLE_MTTR,
    "metric_capacity_eta": ORACLE_CAPACITY_ETA,
    "metric_trend": ORACLE_TREND,
    "metric_trend_theilsen": ORACLE_THEILSEN,
    "series_shape_search": ORACLE_SHAPE_SEARCH,
    "metric_forecast_snaive": ORACLE_FORECAST_SNAIVE,
    "metric_top_contributors": ORACLE_TOP_CONTRIBUTORS,
    "metric_mix_drift": ORACLE_MIX_DRIFT,
    "metric_autocorr": ORACLE_AUTOCORR,
    "metric_seasonal_decompose": ORACLE_SEASONAL_DECOMPOSE,
    "agg_rolling_distinct_kmv": ORACLE_ROLLING_DISTINCT,
    "metric_apdex": ORACLE_APDEX,
}
