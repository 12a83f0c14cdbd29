"""Driver-facing temporal-operator queries + oracles (events table).

asof_purchase_click: point-in-time join — each purchase picks up the
same user's most recent prior click (DuckDB ``ASOF LEFT JOIN`` is the
oracle, so these are exactly its semantics: backward, inclusive).

sessions_user: session windows per user with a 12 h inactivity gap
(Spark ``session_window``; oracle is the classic gaps-and-islands SQL).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.operators.asof import (
    asof_join,
    asof_join_nearest,
    sessionize,
)
from monasca_aggregator_spark.sources.tables import load_table

SESSION_GAP = "12 hours"
_GAP_SQL = "INTERVAL 12 HOUR"


def q_asof_purchase_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases, clicks, ["user_id"], right_prefix="last_click_"
    )
    return joined.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        stable_round(F.col("purchase_value"), 4).alias("purchase_value"),
        F.unix_millis("last_click_ts").alias("click_ts_ms"),
        stable_round(F.col("last_click_click_value"), 4).alias("click_value"),
    )


ORACLE_ASOF = f"""
WITH p AS (
  SELECT user_id, ts, value AS purchase_value FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, value AS click_value FROM events
  WHERE event_type = 'click'
)
SELECT p.user_id, epoch_ms(p.ts) AS ts_ms,
       {sql_stable_round("p.purchase_value", 4)} AS purchase_value,
       epoch_ms(c.ts) AS click_ts_ms,
       {sql_stable_round("c.click_value", 4)} AS click_value
FROM p ASOF LEFT JOIN c
  ON p.user_id = c.user_id AND p.ts >= c.ts
""".strip()


def q_asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-direction as-of: each purchase pairs with the click
    closest in time either way (ties backward) — attribution when the
    influencing interaction may come just after the conversion event
    lands (clock skew between client streams). Both directions resolve
    in ONE user-keyed window sort (operators/asof.py
    asof_join_nearest); event_id breaks equal-ts click ties so the
    pick is deterministic."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", "event_id"
    )
    joined = asof_join_nearest(
        purchases,
        clicks,
        ["user_id"],
        right_prefix="near_",
        order_col="event_id",
    )
    gap = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("near_ts"))
    return joined.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        stable_round(F.col("purchase_value"), 4).alias("purchase_value"),
        F.unix_millis("near_ts").alias("click_ts_ms"),
        F.col("near_event_id").alias("click_event_id"),
        F.when(F.col("near_ts").isNull(), F.lit(None).cast("string"))
        .when(gap >= 0, F.lit("backward"))
        .otherwise(F.lit("forward"))
        .alias("direction"),
    )


ORACLE_ASOF_NEAREST = f"""
WITH p AS (
  SELECT user_id, ts, value AS purchase_value FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, event_id FROM events WHERE event_type = 'click'
), ranked AS (
  SELECT p.user_id, p.ts AS pts, p.purchase_value,
         c.ts AS cts, c.event_id,
         row_number() OVER (
           PARTITION BY p.user_id, p.ts, p.purchase_value
           ORDER BY abs(epoch_us(p.ts) - epoch_us(c.ts)),
                    CASE WHEN c.ts <= p.ts THEN 0 ELSE 1 END,
                    c.event_id
         ) AS rk
  FROM p LEFT JOIN c ON p.user_id = c.user_id
)
SELECT user_id, epoch_ms(pts) AS ts_ms,
       {sql_stable_round("purchase_value", 4)} AS purchase_value,
       epoch_ms(cts) AS click_ts_ms,
       event_id AS click_event_id,
       CASE WHEN cts IS NULL THEN NULL
            WHEN cts <= pts THEN 'backward' ELSE 'forward' END AS direction
FROM ranked WHERE rk = 1
""".strip()


def q_sessions_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    out = sessionize(
        ev,
        ["user_id"],
        gap=SESSION_GAP,
        aggs=[F.sum("value").alias("value_sum")],
    )
    return out.select(
        "user_id",
        "session_start_ms",
        "session_end_ms",
        "n_events",
        stable_round(F.col("value_sum"), 4).alias("value_sum"),
    )


ORACLE_SESSIONS = f"""
WITH marked AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   <= {_GAP_SQL}
              THEN 0 ELSE 1 END AS new_session
  FROM events
), numbered AS (
  SELECT *, sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS session_id
  FROM marked
)
SELECT user_id,
       epoch_ms(min(ts)) AS session_start_ms,
       epoch_ms(max(ts) + {_GAP_SQL}) AS session_end_ms,
       count(*) AS n_events,
       {sql_stable_round("sum(value)", 4)} AS value_sum
FROM numbered
GROUP BY user_id, session_id
""".strip()


_CAP_MS = 24 * 3600 * 1000  # max session duration before a forced split


def q_sessions_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with BOTH an inactivity gap (12 h, the family
    convention) and a maximum-duration cap (24 h): long chains of
    sub-gap events can otherwise fuse into one unbounded session (the
    always-on-device pathology), so production analytics stacks split
    at a duration ceiling too. Split semantics are fixed-offset from
    the gap-session's first event (sub-session k covers
    [start + k·cap, start + (k+1)·cap)) — the closed-form variant
    (re-anchoring at each split is inherently sequential); documented
    and mirrored exactly in the oracle.

    Plan: one per-user ordered window (lag → new-session flag →
    running sum = gap-session id), then pure arithmetic for the cap
    split — no second window, no iteration. Output: per day-of-start,
    session counts, how many exist only because of the cap, and exact
    mean events/duration.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts")
    w = Window.partitionBy("user_id").orderBy("ts")
    gap_ms = 12 * 3600 * 1000
    prev = F.lag(F.unix_millis("ts")).over(w)
    new_sess = (
        prev.isNull()
        | ((F.unix_millis("ts") - prev) > F.lit(gap_ms))
    ).cast("long")
    sid = F.sum(new_sess).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    marked = ev.select("user_id", "ts", sid.alias("sid"))
    sess_w = Window.partitionBy("user_id", "sid")
    start_ms = F.min(F.unix_millis("ts")).over(sess_w)
    sub = F.floor(
        (F.unix_millis("ts") - start_ms) / F.lit(_CAP_MS)
    ).cast("long")
    per_sub = (
        marked.select(
            "user_id", "sid", "ts", sub.alias("sub")
        )
        .groupBy("user_id", "sid", "sub")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(F.unix_millis("ts")).alias("s_ms"),
            F.max(F.unix_millis("ts")).alias("e_ms"),
        )
    )
    day_ms = (
        F.col("s_ms") - F.pmod(F.col("s_ms"), F.lit(86_400_000))
    ).alias("day_ms")
    return (
        per_sub.groupBy(day_ms)
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum((F.col("sub") > 0).cast("long")).alias("n_cap_splits"),
            F.sum("n_events").alias("total_events"),
            F.sum(F.col("e_ms") - F.col("s_ms")).alias("total_dur_ms"),
        )
        .select(
            "day_ms",
            "n_sessions",
            "n_cap_splits",
            stable_round(
                F.col("total_events").cast("double")
                / F.col("n_sessions").cast("double"),
                6,
            ).alias("mean_events"),
            stable_round(
                F.col("total_dur_ms").cast("double")
                / F.col("n_sessions").cast("double")
                / F.lit(1000.0),
                6,
            ).alias("mean_dur_sec"),
        )
    )


ORACLE_SESSIONS_CAPPED = f"""
WITH marked AS (
  SELECT user_id, ts,
         CASE WHEN epoch_ms(ts) - epoch_ms(lag(ts) OVER (
                PARTITION BY user_id ORDER BY ts)) > {12 * 3600 * 1000}
              OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                 IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), numbered AS (
  SELECT user_id, ts, sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sid
  FROM marked
), subbed AS (
  SELECT user_id, sid, ts,
         (epoch_ms(ts) - min(epoch_ms(ts)) OVER (
            PARTITION BY user_id, sid)) // {_CAP_MS} AS sub
  FROM numbered
), per_sub AS (
  SELECT user_id, sid, sub, count(*) AS n_events,
         min(epoch_ms(ts)) AS s_ms, max(epoch_ms(ts)) AS e_ms
  FROM subbed GROUP BY user_id, sid, sub
)
SELECT CAST(s_ms - s_ms % 86400000 AS BIGINT) AS day_ms,
       count(*) AS n_sessions,
       CAST(coalesce(sum(CASE WHEN sub > 0 THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS n_cap_splits,
       {sql_stable_round(
           "CAST(sum(n_events) AS DOUBLE) / CAST(count(*) AS DOUBLE)", 6
       )} AS mean_events,
       {sql_stable_round(
           "CAST(sum(e_ms - s_ms) AS DOUBLE) / CAST(count(*) AS DOUBLE)"
           " / 1000.0", 6
       )} AS mean_dur_sec
FROM per_sub
GROUP BY day_ms
""".strip()


def q_moving_avg_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user 5-event trailing moving average over purchase values —
    the event-sequence smoothing every metrics/feature pipeline has.
    ONE shuffle on user_id, then a bounded ROWS frame (constant state
    per row at any scale; a RANGE frame would be time-based — same
    plan shape)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-4, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        stable_round(F.avg("value").over(w), 4).alias("ma5"),
    )


ORACLE_MOVING_AVG = f"""
SELECT user_id, event_id,
       {sql_stable_round(
           "avg(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC "
           "ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)", 4)} AS ma5
FROM events WHERE event_type = 'purchase'
""".strip()


def q_lag_delta_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-over-event delta and inter-arrival gap per user (lag) —
    the row-level counterpart of the spec engine's windowed delta
    (delta_metric.go computes last-first per window; this exposes every
    consecutive step). First event per user yields nulls."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "signup"
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    return ev.select(
        "user_id",
        "event_id",
        stable_round(F.col("value") - F.lag("value").over(w), 4).alias(
            "delta_value"
        ),
        (
            (F.unix_millis("ts") - F.unix_millis(F.lag("ts").over(w)))
            / F.lit(1000.0)
        ).alias("gap_sec"),
    )


def q_running_total_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative (unbounded-preceding) running total per user — the
    third frame shape next to moving_avg (bounded ROWS) and lag
    (offset): balances, lifetime spend, cumulative usage. Shuffles once
    on user_id; within a partition Spark evaluates the running frame
    incrementally (no per-row rescan). Values are summed as exact
    integer cents — floor(v*100+0.5) — so the cumulative sum is
    order-insensitive exact BIGINT arithmetic in both engines instead
    of an accumulation-order-dependent double."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cents = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    return ev.select(
        "user_id",
        "event_id",
        (F.sum(cents).over(w) / F.lit(100.0)).alias("running_value"),
        F.count(F.lit(1)).over(w).alias("running_n"),
    )


ORACLE_RUNNING_TOTAL = """
SELECT user_id, event_id,
       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) OVER w / 100.0 AS running_value,
       count(*) OVER w AS running_n
FROM events WHERE event_type = 'purchase'
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""".strip()


ORACLE_LAG_DELTA = f"""
SELECT user_id, event_id,
       {sql_stable_round(
           "value - lag(value) OVER (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)",
           4)} AS delta_value,
       (epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
            ORDER BY ts ASC, event_id ASC)) / 1000.0 AS gap_sec
FROM events WHERE event_type = 'signup'
""".strip()


def q_range_join_ship(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True range join (no equi-key): returned high-discount line items
    shipped within 7 days of any urgent order's date, aggregated per
    order. Runs through operators.asof.range_join — time-bucketized
    equi-join + exact filter, not the BroadcastNestedLoopJoin a naive
    theta-join compiles to."""
    from monasca_aggregator_spark.operators.asof import range_join

    li = (
        load_table(spark, sf_dir, "lineitem")
        .filter((F.col("l_returnflag") == "R") & (F.col("l_discount") >= 0.09))
        .select("l_orderkey", "l_linenumber", "l_shipdate", "l_extendedprice")
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select(
            "o_orderkey",
            F.col("o_orderdate").alias("win_start"),
            (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias(
                "win_end"
            ),
        )
    )
    joined = range_join(
        li,
        orders,
        point_ts="l_shipdate",
        start_ts="win_start",
        end_ts="win_end",
        bucket="7 days",
    )
    return joined.groupBy("o_orderkey").agg(
        F.count(F.lit(1)).alias("n_shipments"),
        stable_round(F.sum("l_extendedprice"), 4).alias("shipped_value"),
    )


ORACLE_RANGE_JOIN = f"""
SELECT o.o_orderkey,
       count(*) AS n_shipments,
       {sql_stable_round("sum(l.l_extendedprice)", 4)} AS shipped_value
FROM lineitem l
JOIN orders o
  ON l.l_shipdate BETWEEN o.o_orderdate AND o.o_orderdate + INTERVAL 7 DAY
WHERE l.l_returnflag = 'R' AND l.l_discount >= 0.09
  AND o.o_orderpriority = '1-URGENT'
GROUP BY 1
""".strip()


_HOUR_MS = 3_600_000
_ATTR_WINDOW_H = 24


def q_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Funnel conversion per purchase-hour: fraction of purchases with
    an attributable click (same user, within the trailing 24 h) — the
    as-of join re-used as an analysis step instead of an enrichment.
    Attribution is the backward as-of match plus a window bound, then
    one small groupBy over (hour)."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    joined = asof_join(purchases, clicks, ["user_id"], right_prefix="c_")
    attributed = (
        F.col("c_ts").isNotNull()
        & (
            F.unix_millis("ts") - F.unix_millis("c_ts")
            <= F.lit(_ATTR_WINDOW_H * _HOUR_MS)
        )
    ).cast("long")
    wcol = (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
        * F.lit(_HOUR_MS)
    )
    return joined.groupBy(wcol.alias("window_ts_ms")).agg(
        F.count(F.lit(1)).alias("n_purchases"),
        F.sum(attributed).alias("n_attributed"),
        stable_round(
            F.sum(attributed) / F.count(F.lit(1)), 4
        ).alias("conversion"),
    )


ORACLE_FUNNEL = f"""
WITH p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.user_id, p.ts,
         CASE WHEN c.ts IS NOT NULL
                   AND epoch_ms(p.ts) - epoch_ms(c.ts)
                       <= {_ATTR_WINDOW_H * _HOUR_MS}
              THEN 1 ELSE 0 END AS attributed
  FROM p ASOF LEFT JOIN c
    ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT (epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS} AS window_ts_ms,
       count(*) AS n_purchases,
       CAST(sum(attributed) AS BIGINT) AS n_attributed,
       {sql_stable_round("sum(attributed)::DOUBLE / count(*)", 4)}
         AS conversion
FROM j
GROUP BY 1
""".strip()


def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metric anomaly detection: each hourly window's mean value scored
    against the trailing 24 windows' mean/stddev (the self-baselining
    alert rule monitoring systems run on aggregated series — a natural
    consumer of the reference's aggregate output stream). Two
    aggregation levels, ONE shuffle: the windowed groupBy keys by
    (metric, window) and the trailing frame re-sorts within metric —
    per-metric series state is 24 rows regardless of scale. Z is
    computed from the ROUNDED window means so the engine and oracle
    agree bit-for-bit after division."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wcol = (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS))
        .cast("long")
        * F.lit(_HOUR_MS)
    )
    hourly = ev.groupBy(
        F.col("event_type"), wcol.alias("window_ts_ms")
    ).agg(stable_round(F.avg("value"), 4).alias("wv"))
    frame = (
        Window.partitionBy("event_type")
        .orderBy("window_ts_ms")
        .rowsBetween(-24, -1)
    )
    mu = F.avg("wv").over(frame)
    sd = F.stddev_samp("wv").over(frame)
    z = stable_round(
        F.when(sd > 0, (F.col("wv") - mu) / sd), 4
    )
    return hourly.select(
        "event_type",
        "window_ts_ms",
        "wv",
        z.alias("z"),
        F.coalesce(F.abs(z) > F.lit(3.0), F.lit(False)).alias("is_anomaly"),
    )


_HIST_LO, _HIST_HI, _HIST_BUCKETS = 0.0, 320.0, 16


def q_metric_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(metric, hourly window) value histogram — the
    Prometheus-style export shape for aggregated series. The bucket id
    is plain clamped arithmetic (identical expression in the oracle,
    sidestepping width_bucket dialect differences), so the whole query
    is one groupBy whose key adds a 0-16 bucket — same shuffle
    cardinality class as the plain windowed aggregation."""
    ev = load_table(spark, sf_dir, "events")
    wcol = (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
        * F.lit(_HOUR_MS)
    )
    step = (_HIST_HI - _HIST_LO) / _HIST_BUCKETS
    bucket = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(_HIST_LO)) / F.lit(step)),
            F.lit(0),
        ),
        F.lit(_HIST_BUCKETS - 1),
    )
    return ev.groupBy(
        F.col("event_type"),
        wcol.alias("window_ts_ms"),
        bucket.alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))


def q_metric_histogram_exemplars(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Histogram EXEMPLARS (r8, the OpenMetrics/Prometheus exemplar
    contract): each (metric, hourly window, bucket) cell carries its
    count PLUS one concrete trace-back sample — the event id and
    value of the bucket's maximum observation — so a latency spike in
    a dashboard bucket links to an actual event to inspect.
    Deterministic pick: greatest (value_e6, event_id) pair, exact
    integers. One window over the same (type, window, bucket) key the
    plain histogram groups by — same shuffle cardinality class, count
    and exemplar resolved in a single pass (no join back)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wcol = (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
        * F.lit(_HOUR_MS)
    )
    step = (_HIST_HI - _HIST_LO) / _HIST_BUCKETS
    bucket = F.least(
        F.greatest(
            F.floor((F.col("value") - F.lit(_HIST_LO)) / F.lit(step)),
            F.lit(0),
        ),
        F.lit(_HIST_BUCKETS - 1),
    )
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    keyed = ev.select(
        F.col("event_type"),
        wcol.alias("window_ts_ms"),
        bucket.alias("bucket"),
        v_e6.alias("v_e6"),
        "event_id",
    )
    pw = Window.partitionBy("event_type", "window_ts_ms", "bucket")
    ow = pw.orderBy(F.col("v_e6").desc(), F.col("event_id").desc())
    return (
        keyed.withColumn("n", F.count(F.lit(1)).over(pw))
        .withColumn("__rn", F.row_number().over(ow))
        .filter(F.col("__rn") == 1)
        .select(
            "event_type",
            "window_ts_ms",
            "bucket",
            F.col("n").cast("long").alias("n"),
            F.col("event_id").alias("exemplar_event_id"),
            stable_round(
                F.col("v_e6").cast("double") / F.lit(1_000_000.0), 4
            ).alias("exemplar_value"),
        )
    )


ORACLE_HISTOGRAM_EXEMPLARS = f"""
WITH keyed AS (
  SELECT event_type,
         (epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS} AS window_ts_ms,
         CAST(least(greatest(floor((value - {_HIST_LO}) / 20.0), 0),
                    {_HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6,
         event_id
  FROM events
)
SELECT event_type, window_ts_ms, bucket,
       CAST(count(*) OVER w AS BIGINT) AS n,
       event_id AS exemplar_event_id,
       {sql_stable_round("CAST(v_e6 AS DOUBLE) / 1000000.0", 4)}
         AS exemplar_value
FROM keyed
WINDOW w AS (PARTITION BY event_type, window_ts_ms, bucket)
QUALIFY row_number() OVER (PARTITION BY event_type, window_ts_ms,
                           bucket ORDER BY v_e6 DESC, event_id DESC) = 1
""".strip()


_TRAIL_S = 3600  # trailing time-frame width (seconds)


def q_events_trailing_1h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-based trailing window per event: each purchase annotated
    with the user's event count and spend over the PRECEDING HOUR —
    a ``RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW`` frame on the
    epoch-second axis, the irregular-sample sibling of
    ``moving_avg_user``'s fixed ROWS frame (a row-count frame spans a
    different wall-clock width per user; velocity rules — fraud
    checks, rate limits — need the time frame). Frame bounds are
    integer seconds and the spend sums exact cents, so both engines
    include the identical row set (inclusive bounds on equal
    timestamps) and sum the same BIGINTs.

    Scale: the window partitions by user — per-user streams are short
    and the shuffle is the same user-keyed exchange every per-user
    window op pays; nothing global."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.unix_seconds(F.col("ts")).alias("t_s"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
        "event_type",
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("t_s")
        .rangeBetween(-_TRAIL_S, 0)
    )
    annotated = ev.select(
        "event_id",
        "user_id",
        "t_s",
        "event_type",
        F.count(F.lit(1)).over(w).alias("n_trailing_1h"),
        F.sum("e2").over(w).alias("spend_e2"),
    )
    return annotated.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "n_trailing_1h",
        stable_round(
            F.col("spend_e2").cast("double") / F.lit(100.0), 2
        ).alias("trailing_1h_value"),
    )


ORACLE_TRAILING_1H = f"""
WITH e AS (
  SELECT event_id, user_id, epoch(ts) AS t_s, event_type,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS e2
  FROM events
),
ann AS (
  SELECT event_id, user_id, event_type,
         count(*) OVER w AS n_trailing_1h,
         sum(e2) OVER w AS spend_e2
  FROM e
  WINDOW w AS (PARTITION BY user_id ORDER BY t_s
               RANGE BETWEEN {_TRAIL_S} PRECEDING AND CURRENT ROW)
)
SELECT event_id, user_id, n_trailing_1h,
       {sql_stable_round("CAST(spend_e2 AS DOUBLE) / 100.0", 2)}
         AS trailing_1h_value
FROM ann WHERE event_type = 'purchase'
""".strip()


_NH_SCHEMA = 2  # Prometheus native-histogram schema: base = 2^(1/2^s)


def q_metric_histogram_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus NATIVE (exponential-bucket) histogram per (metric,
    hour): bucket k holds values in (2^((k−1)/4), 2^(k/4)] at schema 2
    — resolution follows the data's magnitude with no pre-declared
    bounds, the fixed-bucket histogram's (24h) successor in Prometheus
    ≥2.40. k = ceil(log2(v)·2^s) exactly as the exposition format
    defines it; non-positive values land in the zero bucket (k NULL),
    mirroring the spec's separate zero-bucket count.

    Cross-engine: one log2 per ROW but bucket ids are small ints, and
    the upper-bound column is pow(2, k/4) e6-rounded — same ln/exp
    parity class as the corpus-LM scores. Bucket count per group is
    bounded by the VALUE RANGE (4 buckets per octave), not row count,
    so the groupBy key fans out like the fixed histogram's 0-16."""
    ev = load_table(spark, sf_dir, "events")
    wcol = (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
        * F.lit(_HOUR_MS)
    )
    scale = F.lit(float(2**_NH_SCHEMA))
    k = F.when(
        F.col("value") > 0,
        F.ceil(F.log2(F.col("value")) * scale).cast("long"),
    )
    g = ev.groupBy(
        F.col("event_type"),
        wcol.alias("window_ts_ms"),
        k.alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    le = F.when(
        F.col("bucket").isNotNull(),
        stable_round(
            F.pow(F.lit(2.0), F.col("bucket").cast("double") / scale), 6
        ),
    )
    return g.select(
        "event_type", "window_ts_ms", "bucket", le.alias("le"), "n"
    )


ORACLE_HISTOGRAM_NATIVE = f"""
WITH e AS (
  SELECT event_type,
         (epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS} AS window_ts_ms,
         CASE WHEN value > 0
              THEN CAST(ceil(log2(value) * {2**_NH_SCHEMA}) AS BIGINT)
         END AS bucket
  FROM events
)
SELECT event_type, window_ts_ms, bucket,
       CASE WHEN bucket IS NOT NULL THEN
         floor(pow(2.0, CAST(bucket AS DOUBLE) / {2**_NH_SCHEMA})
               * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE
       END AS le,
       count(*) AS n
FROM e GROUP BY 1, 2, 3
""".strip()


_HQ_Q = 0.95
_HIST_STEP = (_HIST_HI - _HIST_LO) / _HIST_BUCKETS


def q_metric_histogram_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prometheus ``histogram_quantile``: estimate p95 per (metric,
    hour) FROM the fixed-bucket histogram (24h's export shape) by
    linear interpolation inside the bucket where the cumulative count
    crosses q·total — quantiles served off pre-aggregated buckets
    without touching raw samples, which is how a metric store answers
    dashboards at scale. Everything after the histogram groupBy runs
    over ≤ #buckets rows per series-window; the interpolation divides
    exact integer counts, so both engines produce identical doubles."""
    from pyspark.sql import Window

    hist = q_metric_histogram(spark, sf_dir)
    w = Window.partitionBy("event_type", "window_ts_ms").orderBy("bucket")
    tot_w = Window.partitionBy("event_type", "window_ts_ms")
    cum = (
        hist.withColumn("cum", F.sum("n").over(w))
        .withColumn("total", F.sum("n").over(tot_w))
        .withColumn("target", F.lit(_HQ_Q) * F.col("total"))
        .withColumn("cum_before", F.col("cum") - F.col("n"))
    )
    crossing = cum.filter(
        (F.col("cum_before") < F.col("target"))
        & (F.col("cum") >= F.col("target"))
    )
    p95 = (
        F.lit(_HIST_LO)
        + F.col("bucket") * F.lit(_HIST_STEP)
        + F.lit(_HIST_STEP)
        * (F.col("target") - F.col("cum_before"))
        / F.col("n")
    )
    return crossing.select(
        "event_type",
        "window_ts_ms",
        "total",
        stable_round(p95, 4).alias("p95_est"),
    )


# the Window import lives at module scope in the builders above; keep
# the SQL mirror on the identical integer-count arithmetic
ORACLE_HISTOGRAM_QUANTILE = f"""
WITH hist AS (
  SELECT event_type,
         (epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS} AS window_ts_ms,
         CAST(least(greatest(floor((value - {_HIST_LO}) /
              {_HIST_STEP}), 0), {_HIST_BUCKETS - 1}) AS BIGINT) AS bucket,
         count(*) AS n
  FROM events GROUP BY 1, 2, 3
), cum AS (
  SELECT *,
         sum(n) OVER (PARTITION BY event_type, window_ts_ms
                      ORDER BY bucket) AS cum,
         sum(n) OVER (PARTITION BY event_type, window_ts_ms) AS total
  FROM hist
)
SELECT event_type, window_ts_ms, CAST(total AS BIGINT) AS total,
       {sql_stable_round(
           f"{_HIST_LO} + bucket * {_HIST_STEP} + {_HIST_STEP}"
           " * (0.95::DOUBLE * total - (cum - n)) / n", 4)} AS p95_est
FROM cum
WHERE (cum - n) < 0.95::DOUBLE * total
  AND cum >= 0.95::DOUBLE * total
""".strip()


_B_SQL = (
    f"least(greatest(floor((value - {_HIST_LO}) / "
    f"{(_HIST_HI - _HIST_LO) / _HIST_BUCKETS}), 0), {_HIST_BUCKETS - 1})"
)

ORACLE_HISTOGRAM = f"""
SELECT event_type,
       (epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS} AS window_ts_ms,
       CAST({_B_SQL} AS BIGINT) AS bucket,
       count(*) AS n
FROM events
GROUP BY 1, 2, 3
""".strip()


_Z_SQL = sql_stable_round("CASE WHEN sd > 0 THEN (wv - mu) / sd END", 4)

ORACLE_ANOMALY = f"""
WITH hourly AS (
  SELECT event_type,
         (epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS} AS window_ts_ms,
         {sql_stable_round("avg(value)", 4)} AS wv
  FROM events GROUP BY 1, 2
),
scored AS (
  SELECT event_type, window_ts_ms, wv,
         avg(wv) OVER f AS mu,
         stddev_samp(wv) OVER f AS sd
  FROM hourly
  WINDOW f AS (PARTITION BY event_type ORDER BY window_ts_ms
               ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)
)
SELECT event_type, window_ts_ms, wv,
       {_Z_SQL} AS z,
       coalesce(abs({_Z_SQL}) > 3, false) AS is_anomaly
FROM scored
""".strip()


_WEEK_MS = 7 * 24 * 3_600_000


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen week, then
    the distinct-user count per (cohort, weeks-since-cohort) with the
    retained fraction vs week 0 — the classic product-analytics readout
    over the events stream. Three exchanges, all map-side-combinable:
    distinct (user, week) pairs, the per-user min-week cohort agg
    (co-partitioned with the join that follows, so the join itself adds
    no exchange), and the final small groupBy. The window for the
    retention denominator runs over the already-aggregated matrix
    (rows = cohorts × weeks, data-size-independent)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wk = (
        (F.unix_millis(F.col("ts")) / F.lit(_WEEK_MS)).cast("long")
        * F.lit(_WEEK_MS)
    )
    pairs = ev.select("user_id", wk.alias("wk")).distinct()
    cohort = pairs.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    j = pairs.join(cohort, "user_id")
    g = j.groupBy(
        F.col("cohort_wk").alias("cohort_week_ms"),
        ((F.col("wk") - F.col("cohort_wk")) / F.lit(_WEEK_MS))
        .cast("long")
        .alias("week_index"),
    ).agg(F.count(F.lit(1)).alias("n_active"))
    denom = F.first("n_active").over(
        Window.partitionBy("cohort_week_ms")
        .orderBy("week_index")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return g.select(
        "cohort_week_ms",
        "week_index",
        "n_active",
        stable_round(F.col("n_active") / denom, 4).alias("retention"),
    )


ORACLE_RETENTION = f"""
WITH pairs AS (
  SELECT DISTINCT user_id,
         (epoch_ms(ts) // {_WEEK_MS}) * {_WEEK_MS} AS wk
  FROM events
), cohort AS (
  SELECT user_id, min(wk) AS cohort_wk FROM pairs GROUP BY 1
), g AS (
  SELECT c.cohort_wk AS cohort_week_ms,
         (p.wk - c.cohort_wk) // {_WEEK_MS} AS week_index,
         count(*) AS n_active
  FROM pairs p JOIN cohort c USING (user_id)
  GROUP BY 1, 2
)
SELECT cohort_week_ms, week_index, n_active,
       {sql_stable_round(
           "n_active::DOUBLE / first_value(n_active) OVER "
           "(PARTITION BY cohort_week_ms ORDER BY week_index "
           "ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)", 4)}
         AS retention
FROM g
""".strip()


_DAY_RET_MS = 24 * 3600 * 1000  # daily cohorts: the test events
# span ~30 days, so DAY-grain cohorts give the fit a real curve
# (week-grain yields one cohort with two points)


def q_events_retention_halflife(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retention HALF-LIFE per cohort (r8): fit the exponential-decay
    model retention(w) = e^(a + b·w) to each cohort's daily curve by OLS on
    ln(retention) over days 1+, and report half-life = −ln 2 / b
    days — the single number growth teams quote where
    `events_retention` hands back the whole matrix. Same matrix
    build; the fit is closed-form OLS over the cohort×week aggregate
    (corpus-size-independent), slope from exact n_active ratios,
    cohorts with <2 post-week-0 points or non-negative slope report
    NULL half-life (no decay to fit)."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wk = (
        (F.unix_millis(F.col("ts")) / F.lit(_DAY_RET_MS)).cast("long")
        * F.lit(_DAY_RET_MS)
    )
    pairs = ev.select("user_id", wk.alias("wk")).distinct()
    cohort = pairs.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    g = (
        pairs.join(cohort, "user_id")
        .groupBy(
            F.col("cohort_wk").alias("cohort_day_ms"),
            ((F.col("wk") - F.col("cohort_wk")) / F.lit(_DAY_RET_MS))
            .cast("long")
            .alias("w"),
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    base = F.first("n_active").over(
        Window.partitionBy("cohort_day_ms")
        .orderBy("w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    pts = g.withColumn("n0", base).filter(F.col("w") >= 1)
    y = F.log(F.col("n_active").cast("double") / F.col("n0").cast("double"))
    x = F.col("w").cast("double")
    fit = pts.groupBy("cohort_day_ms").agg(
        F.count(F.lit(1)).alias("n_pts"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * x).alias("sxx"),
        F.sum(x * y).alias("sxy"),
    )
    slope = (
        F.col("n_pts") * F.col("sxy") - F.col("sx") * F.col("sy")
    ) / (F.col("n_pts") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return fit.filter(F.col("n_pts") >= 2).select(
        "cohort_day_ms",
        "n_pts",
        stable_round(slope, 6).alias("decay_slope"),
        F.when(
            slope < 0,
            stable_round(-F.log(F.lit(2.0)) / slope, 4),
        ).alias("half_life_days"),
    )


ORACLE_RETENTION_HALFLIFE = f"""
WITH pairs AS (
  SELECT DISTINCT user_id,
         (epoch_ms(ts) // {_DAY_RET_MS}) * {_DAY_RET_MS} AS wk
  FROM events
), cohort AS (
  SELECT user_id, min(wk) AS cohort_wk FROM pairs GROUP BY 1
), g AS (
  SELECT c.cohort_wk AS cohort_day_ms,
         (p.wk - c.cohort_wk) // {_DAY_RET_MS} AS w,
         count(*) AS n_active
  FROM pairs p JOIN cohort c USING (user_id)
  GROUP BY 1, 2
), pts AS (
  SELECT cohort_day_ms, w, n_active,
         first_value(n_active) OVER (PARTITION BY cohort_day_ms
           ORDER BY w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS n0
  FROM g QUALIFY w >= 1
), fit AS (
  SELECT cohort_day_ms, count(*) AS n_pts,
         sum(w::DOUBLE) AS sx,
         sum(ln(n_active::DOUBLE / n0::DOUBLE)) AS sy,
         sum(w::DOUBLE * w::DOUBLE) AS sxx,
         sum(w::DOUBLE * ln(n_active::DOUBLE / n0::DOUBLE)) AS sxy
  FROM pts GROUP BY 1
), s AS (
  SELECT cohort_day_ms, n_pts,
         (n_pts * sxy - sx * sy) / (n_pts * sxx - sx * sx) AS slope
  FROM fit WHERE n_pts >= 2
)
SELECT cohort_day_ms, n_pts,
       {sql_stable_round("slope", 6)} AS decay_slope,
       CASE WHEN slope < 0 THEN
         {sql_stable_round("-ln(2.0) / slope", 4)}
       END AS half_life_days
FROM s
""".strip()


_GAP_STEP_MS = 900_000  # 15-minute windows → ~50% occupancy at test SF


def q_metric_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-fill + linear interpolation of the aggregated metric series:
    densify each metric's 15-min window grid between its first and last
    observation, and linearly interpolate the missing windows from the
    bracketing observed values (the resample step every downstream
    consumer of the reference's aggregate stream needs). The grid is
    generated per metric with ``sequence`` — its size is bounded by the
    TIME SPAN, not the corpus, so everything after the first windowed
    groupBy is data-size-independent. Interpolation is two
    ignore-nulls window passes (last-before / first-after), no
    self-join."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    wcol = (
        (F.unix_millis(F.col("ts")) / F.lit(_GAP_STEP_MS)).cast("long")
        * F.lit(_GAP_STEP_MS)
    )
    observed = ev.groupBy(
        F.col("event_type"), wcol.alias("w")
    ).agg(stable_round(F.avg("value"), 4).alias("wv"))
    grid = (
        observed.groupBy("event_type")
        .agg(F.min("w").alias("lo"), F.max("w").alias("hi"))
        .select(
            "event_type",
            F.explode(
                F.sequence("lo", "hi", F.lit(_GAP_STEP_MS).cast("long"))
            ).alias("w"),
        )
    )
    filled = grid.join(observed, ["event_type", "w"], "left")
    back = (
        Window.partitionBy("event_type")
        .orderBy("w")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    fwd = (
        Window.partitionBy("event_type")
        .orderBy("w")
        .rowsBetween(0, Window.unboundedFollowing)
    )
    prev_v = F.last("wv", ignorenulls=True).over(back)
    prev_w = F.last(
        F.when(F.col("wv").isNotNull(), F.col("w")), ignorenulls=True
    ).over(back)
    next_v = F.first("wv", ignorenulls=True).over(fwd)
    next_w = F.first(
        F.when(F.col("wv").isNotNull(), F.col("w")), ignorenulls=True
    ).over(fwd)
    interp = F.when(
        prev_v.isNotNull() & next_v.isNotNull() & (next_w != prev_w),
        prev_v
        + (next_v - prev_v)
        * ((F.col("w") - prev_w) / (next_w - prev_w)),
    ).otherwise(F.coalesce(prev_v, next_v))
    return filled.select(
        "event_type",
        F.col("w").alias("window_ts_ms"),
        stable_round(F.coalesce(F.col("wv"), interp), 4).alias("value"),
        F.col("wv").isNull().alias("is_interpolated"),
    )


ORACLE_GAPFILL = f"""
WITH observed AS (
  SELECT event_type,
         (epoch_ms(ts) // {_GAP_STEP_MS}) * {_GAP_STEP_MS} AS w,
         {sql_stable_round("avg(value)", 4)} AS wv
  FROM events GROUP BY 1, 2
), grid AS (
  SELECT event_type, unnest(generate_series(lo, hi, {_GAP_STEP_MS})) AS w
  FROM (SELECT event_type, min(w) AS lo, max(w) AS hi
        FROM observed GROUP BY 1)
), filled AS (
  SELECT g.event_type, g.w, o.wv
  FROM grid g LEFT JOIN observed o
    ON g.event_type = o.event_type AND g.w = o.w
), ctx AS (
  SELECT event_type, w, wv,
         last_value(wv IGNORE NULLS) OVER b AS prev_v,
         last_value(CASE WHEN wv IS NOT NULL THEN w END IGNORE NULLS)
           OVER b AS prev_w,
         first_value(wv IGNORE NULLS) OVER f AS next_v,
         first_value(CASE WHEN wv IS NOT NULL THEN w END IGNORE NULLS)
           OVER f AS next_w
  FROM filled
  WINDOW b AS (PARTITION BY event_type ORDER BY w
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         f AS (PARTITION BY event_type ORDER BY w
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_type, w AS window_ts_ms,
       {sql_stable_round(
           "coalesce(wv, CASE WHEN prev_v IS NOT NULL AND next_v IS NOT NULL "
           "AND next_w <> prev_w THEN prev_v + (next_v - prev_v) * "
           "((w - prev_w)::DOUBLE / (next_w - prev_w)) "
           "ELSE coalesce(prev_v, next_v) END)", 4)} AS value,
       wv IS NULL AS is_interpolated
FROM ctx
""".strip()


def q_user_event_seq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-ordered event sequences — the sequence-assembly
    step for behavioral/recommendation training data (each user's
    history becomes one training example). ONE shuffle keyed by
    user_id; collect_list partial-aggregates map-side and sort_array
    orders the bounded per-user list AFTER aggregation, so there is no
    global sort anywhere. Ties on timestamp break by event_type via
    struct ordering, making the sequence string deterministic. At
    100 TB per-user histories are bounded by retention; pathological
    hot keys would be chunked per (user, day) first — the same plan
    with a composite key."""
    ev = load_table(spark, sf_dir, "events")
    t_ms = F.unix_millis(F.col("ts"))
    seq = F.sort_array(
        F.collect_list(F.struct(t_ms.alias("t"), F.col("event_type")))
    )
    return (
        ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min(t_ms).alias("first_ms"),
            F.max(t_ms).alias("last_ms"),
            seq.alias("seq"),
        )
        .select(
            "user_id",
            "n_events",
            "first_ms",
            "last_ms",
            F.array_join(
                F.transform(
                    F.col("seq"),
                    lambda x: F.concat_ws(
                        ":", x["t"].cast("string"), x["event_type"]
                    ),
                ),
                "|",
            ).alias("seq_str"),
        )
    )


ORACLE_USER_SEQ = """
SELECT user_id,
       count(*) AS n_events,
       min(epoch_ms(ts)) AS first_ms,
       max(epoch_ms(ts)) AS last_ms,
       string_agg(epoch_ms(ts) || ':' || event_type, '|'
                  ORDER BY epoch_ms(ts), event_type) AS seq_str
FROM events
GROUP BY 1
""".strip()


def q_events_cumulative_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily growth accounting: active users, NEW users (first event
    that day), and the cumulative user count — the canonical
    'users over time' chart. first-seen is one groupBy(user) over raw
    events; everything after (daily counts, running sum) operates on
    the per-user/per-day aggregates, and the cumulative window orders a
    ~#days-row series, so no stage's state scales with event volume."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    day = (
        (F.unix_millis(F.col("ts")) / F.lit(86400000)).cast("long")
        * F.lit(86400000)
    ).alias("day_ts_ms")
    active = ev.groupBy(day).agg(
        F.count_distinct("user_id").alias("n_active")
    )
    first_seen = ev.groupBy("user_id").agg(
        F.min(
            (F.unix_millis(F.col("ts")) / F.lit(86400000)).cast("long")
            * F.lit(86400000)
        ).alias("day_ts_ms")
    )
    new_users = first_seen.groupBy("day_ts_ms").agg(
        F.count(F.lit(1)).alias("n_new")
    )
    w = Window.orderBy("day_ts_ms").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        active.join(new_users, "day_ts_ms", "left")
        .fillna({"n_new": 0})
        .withColumn("cumulative_users", F.sum("n_new").over(w))
    )


ORACLE_CUMULATIVE_USERS = """
WITH active AS (
  SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ts_ms,
         count(DISTINCT user_id) AS n_active
  FROM events GROUP BY 1
), fs AS (
  SELECT user_id, min((epoch_ms(ts) // 86400000) * 86400000) AS day_ts_ms
  FROM events GROUP BY 1
), nu AS (
  SELECT day_ts_ms, count(*) AS n_new FROM fs GROUP BY 1
)
SELECT active.day_ts_ms, n_active,
       coalesce(n_new, 0) AS n_new,
       CAST(sum(coalesce(n_new, 0)) OVER (ORDER BY active.day_ts_ms
                                          ROWS UNBOUNDED PRECEDING)
            AS BIGINT) AS cumulative_users
FROM active LEFT JOIN nu ON active.day_ts_ms = nu.day_ts_ms
""".strip()


SEQ_PATTERN_K = 20


def q_events_seq_patterns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K behavioral 3-event sequence patterns: per user, events in
    (ts, event_id) order yield sliding event_type trigrams via lead();
    global counts pick the K most common — the sequence-mining pass
    behind funnel discovery and next-event models.

    Scale shape: the lead() windows partition by user_id (parallel,
    bounded per-user state); the pattern groupBy partial-aggregates
    map-side into at most |event_type|³ groups, so the ranking window
    runs over a corpus-size-INDEPENDENT aggregate (≤125 rows here) —
    the one place an unpartitioned window is safe."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    tri = (
        ev.select("user_id", "ts", "event_id", "event_type")
        .withColumn("e2", F.lead("event_type", 1).over(w))
        .withColumn("e3", F.lead("event_type", 2).over(w))
        .filter(F.col("e3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "e2", "e3").alias("pattern")
        )
    )
    counts = tri.groupBy("pattern").agg(F.count(F.lit(1)).alias("n"))
    w2 = Window.orderBy(F.col("n").desc(), F.col("pattern").asc())
    return (
        counts.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= SEQ_PATTERN_K)
        .select("rank", "pattern", "n")
    )


ORACLE_SEQ_PATTERNS = f"""
WITH o AS (
  SELECT event_type,
         lead(event_type, 1) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e2,
         lead(event_type, 2) OVER (PARTITION BY user_id
                                   ORDER BY ts, event_id) AS e3
  FROM events
), p AS (
  SELECT event_type || '>' || e2 || '>' || e3 AS pattern
  FROM o WHERE e3 IS NOT NULL
), c AS (
  SELECT pattern, count(*) AS n FROM p GROUP BY 1
)
SELECT rank, pattern, n FROM (
  SELECT *, row_number() OVER (ORDER BY n DESC, pattern ASC) AS rank
  FROM c
) t WHERE rank <= {SEQ_PATTERN_K}
""".strip()


def q_funnel_strict_ordered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Strict-ORDER funnel: a user converts stage 2 only with a click
    strictly after their first view, and stage 3 only with a purchase
    strictly after that click — the sequence-sensitive counterpart of
    `funnel_conversion`'s windowed as-of attribution (which ignores
    later-stage ordering). Three per-user min-aggregates chained by
    conditional joins; every join keys on user_id, so the three hash
    joins reuse one partitioning and the corpus never re-shuffles on
    a new key. Output is the 3-row stage table (corpus-size-
    independent)."""
    ev = load_table(spark, sf_dir, "events")
    # r11 (guide §2.4): each stage feeds the next stage's join AND
    # its own union branch, so the chain re-executed per consumer
    # (6 events scans in the initial plan → 3, one per event type).
    # The cached relations are per-user firsts — funnel-state-sized.
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t1"))
        .cache()
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t1"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t2"))
        .cache()
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .filter(F.col("ts") > F.col("t2"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t3"))
    )
    stages = [
        v.select(F.lit(1).alias("stage"), F.lit("view").alias("event"), "user_id"),
        c.select(F.lit(2).alias("stage"), F.lit("view>click").alias("event"), "user_id"),
        p.select(
            F.lit(3).alias("stage"),
            F.lit("view>click>purchase").alias("event"),
            "user_id",
        ),
    ]
    out = stages[0]
    for s in stages[1:]:
        out = out.unionByName(s)
    return out.groupBy("stage", "event").agg(
        F.countDistinct("user_id").alias("n_users")
    )


ORACLE_FUNNEL_STRICT = """
WITH v AS (
  SELECT user_id, min(ts) AS t1 FROM events
  WHERE event_type = 'view' GROUP BY 1
), c AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN v USING (user_id)
  WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY 1
), p AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN c USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY 1
)
SELECT stage, event, count(*) AS n_users FROM (
  SELECT 1 AS stage, 'view' AS event, user_id FROM v
  UNION ALL
  SELECT 2, 'view>click', user_id FROM c
  UNION ALL
  SELECT 3, 'view>click>purchase', user_id FROM p
) GROUP BY 1, 2
""".strip()


_KANON_K = 8


def q_events_kanon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity release gate over the quasi-identifier
    (event_type, day): groups with ≥ k rows are released with their
    counts; smaller groups are SUPPRESSED and only reported as a
    per-event_type residual (day NULL) so the release leaks no group
    below the threshold — the minimum governance pass before
    publishing per-cell usage tables. One partial-aggregated groupBy
    builds the cells; the release/residual split is a second aggregate
    over the (already tiny) cell table."""
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.to_date("ts").cast("string").alias("day")
    ).agg(F.count(F.lit(1)).alias("n"))
    released = cells.filter(F.col("n") >= _KANON_K).select(
        "event_type", "day", "n", F.lit(False).alias("suppressed")
    )
    residual = (
        cells.filter(F.col("n") < _KANON_K)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"))
        .select(
            "event_type",
            F.lit(None).cast("string").alias("day"),
            "n",
            F.lit(True).alias("suppressed"),
        )
    )
    return released.unionByName(residual)


ORACLE_KANON = f"""
WITH cells AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n, FALSE AS suppressed
FROM cells WHERE n >= {_KANON_K}
UNION ALL
SELECT event_type, NULL, CAST(sum(n) AS BIGINT), TRUE
FROM cells WHERE n < {_KANON_K} GROUP BY 1
""".strip()


_LDIV_L = 3  # minimum distinct sensitive values per released cell
_LDIV_TIER = 25  # props.k (0..99) → sensitive tier 0..3


def q_events_ldiversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-DIVERSITY release gate (Machanavajjhala 2007) over the
    quasi-identifier (event_type, day) with the user TIER (props.k ÷
    25) as the sensitive attribute — the disclosure check k-anonymity
    (`events_kanon`) structurally cannot make: a 1000-row cell whose
    rows all share ONE tier passes any k yet tells an attacker every
    member's tier exactly. A cell releases only when it contains ≥ l
    distinct sensitive values; homogeneous cells are SUPPRESSED and
    reported as a per-event_type residual (day NULL), so the release
    leaks no attribute below the diversity floor.

    Scale: one partial-aggregated groupBy over (event_type, day)
    computing count + distinct-tier count (two-phase countDistinct —
    the tier domain is 4 values, so the distinct expansion is
    bounded); the release/residual split is a second aggregate over
    the already-tiny cell table."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        F.floor(
            F.from_json(F.col("props"), "k INT").getField("k")
            / F.lit(_LDIV_TIER)
        )
        .cast("int")
        .alias("tier"),
    )
    cells = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        F.countDistinct("tier").alias("n_tiers"),
    )
    released = cells.filter(F.col("n_tiers") >= _LDIV_L).select(
        "event_type",
        "day",
        "n",
        "n_tiers",
        F.lit(False).alias("suppressed"),
    )
    residual = (
        cells.filter(F.col("n_tiers") < _LDIV_L)
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"))
        .select(
            "event_type",
            F.lit(None).cast("string").alias("day"),
            "n",
            F.lit(None).cast("long").alias("n_tiers"),
            F.lit(True).alias("suppressed"),
        )
    )
    return released.unionByName(residual)


ORACLE_LDIVERSITY = f"""
WITH cells AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         count(*) AS n,
         count(DISTINCT CAST(CAST(json_extract_string(props, '$.k')
                                  AS INTEGER) // {_LDIV_TIER}
                             AS INTEGER)) AS n_tiers
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n, CAST(n_tiers AS BIGINT) AS n_tiers,
       FALSE AS suppressed
FROM cells WHERE n_tiers >= {_LDIV_L}
UNION ALL
SELECT event_type, NULL, CAST(sum(n) AS BIGINT),
       CAST(NULL AS BIGINT), TRUE
FROM cells WHERE n_tiers < {_LDIV_L} GROUP BY 1
""".strip()


_TCLOSE_M = 4  # sensitive-attribute domain size (tiers 0..3)
# t = 1/5: suppress when EMD > 0.2 — the exact test cross-multiplies
# to 5·Σ|cum| > (m−1)·n·N, all integers
_TCLOSE_T_DEN = 5


def q_events_tcloseness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-CLOSENESS release gate (Li, Li & Venkatasubramanian 2007)
    over the same (event_type, day) quasi-identifier and user-tier
    sensitive attribute as `events_kanon`/`events_ldiversity` — the
    third privacy lens: l-diversity counts distinct values but a cell
    can be 99% one tier and still pass; t-closeness bounds how far
    the cell's tier DISTRIBUTION may drift from the global one, via
    the ordered-attribute Earth Mover's Distance
    EMD = (1/(m−1))·Σᵢ |Σ_{{j≤i}} (p_j − q_j)|.

    Exactness: the EMD test is fully integer — per-cell tier counts
    and global counts cross-multiply so Σ|cumulative| compares
    against (m−1)·n·N/t with no float anywhere near the branch; the
    displayed emd is one final division. Cells failing t suppress
    into a per-event_type residual, the l-diversity convention.

    Scale: one (event_type, day)-keyed aggregate with a fixed-width
    {_TCLOSE_M}-bucket pivot (bounded domain), a broadcast 1-row
    global distribution, and a second aggregate over the tiny cell
    table."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.to_date("ts").cast("string").alias("day"),
        F.floor(
            F.from_json(F.col("props"), "k INT").getField("k")
            / F.lit(_LDIV_TIER)
        )
        .cast("int")
        .alias("tier"),
    )
    # r11 (guide §2.4): ONE corpus scan — the global tier
    # distribution rolls up exactly from the cached (event_type, day)
    # cell table (every event lands in exactly one cell), and the
    # released/residual split re-reads the cache instead of
    # re-scanning (4 FileScans → 1).
    cells = ev.groupBy("event_type", "day").agg(
        F.count(F.lit(1)).alias("n"),
        *[
            F.sum((F.col("tier") == i).cast("long")).alias(f"c{i}")
            for i in range(_TCLOSE_M)
        ],
    ).cache()
    glob = cells.groupBy().agg(
        F.sum("n").alias("big_n"),
        *[
            F.sum(f"c{i}").alias(f"r{i}")
            for i in range(_TCLOSE_M)
        ],
    )
    j = cells.crossJoin(F.broadcast(glob))
    # cumulative (c_j·N − r_j·n) partial sums — carried in DEC38
    # (c·N reaches ~10²² at 100 TB, past BIGINT; DuckDB mirrors in
    # HUGEINT)
    dec = "decimal(38,0)"
    cums = []
    acc = None
    for i in range(_TCLOSE_M - 1):
        term = F.col(f"c{i}").cast(dec) * F.col("big_n").cast(
            dec
        ) - F.col(f"r{i}").cast(dec) * F.col("n").cast(dec)
        acc = term if acc is None else acc + term
        cums.append(F.abs(acc))
    sum_abs = cums[0] + cums[1] + cums[2]
    nn = F.col("n").cast(dec) * F.col("big_n").cast(dec)
    suppressed = (
        sum_abs * F.lit(_TCLOSE_T_DEN) > F.lit(_TCLOSE_M - 1) * nn
    )
    emd = stable_round(
        sum_abs.cast("double")
        / (F.lit(float(_TCLOSE_M - 1)) * nn.cast("double")),
        6,
    )
    flagged = j.select(
        "event_type", "day", "n", emd.alias("emd"),
        suppressed.alias("_sup"),
    )
    released = flagged.filter(~F.col("_sup")).select(
        "event_type",
        "day",
        "n",
        "emd",
        F.lit(False).alias("suppressed"),
    )
    residual = (
        flagged.filter(F.col("_sup"))
        .groupBy("event_type")
        .agg(F.sum("n").alias("n"))
        .select(
            "event_type",
            F.lit(None).cast("string").alias("day"),
            "n",
            F.lit(None).cast("double").alias("emd"),
            F.lit(True).alias("suppressed"),
        )
    )
    return released.unionByName(residual)


_TC_TIER_SQL = (
    f"CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)"
    f" // {_LDIV_TIER} AS INTEGER)"
)
_TC_CUM = " + ".join(
    "abs("
    + " + ".join(
        f"(CAST(c{j} AS HUGEINT) * big_n"
        f" - CAST(r{j} AS HUGEINT) * n)"
        for j in range(i + 1)
    )
    + ")"
    for i in range(_TCLOSE_M - 1)
)

ORACLE_TCLOSENESS = f"""
WITH ev AS (
  SELECT event_type, CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
         {_TC_TIER_SQL} AS tier
  FROM events
), cells AS (
  SELECT event_type, day, count(*) AS n,
         {", ".join(
             f"CAST(sum(CASE WHEN tier = {i} THEN 1 ELSE 0 END)"
             f" AS BIGINT) AS c{i}" for i in range(_TCLOSE_M))}
  FROM ev GROUP BY 1, 2
), g AS (
  SELECT count(*) AS big_n,
         {", ".join(
             f"CAST(sum(CASE WHEN tier = {i} THEN 1 ELSE 0 END)"
             f" AS BIGINT) AS r{i}" for i in range(_TCLOSE_M))}
  FROM ev
), f AS (
  SELECT event_type, day, n,
         ({_TC_CUM}) AS sum_abs,
         CAST(n AS HUGEINT) * big_n AS nn
  FROM cells, g
)
SELECT event_type, day, n,
       {sql_stable_round(
           "CAST(sum_abs AS DOUBLE)"
           f" / ({float(_TCLOSE_M - 1)!r} * CAST(nn AS DOUBLE))", 6)}
         AS emd,
       FALSE AS suppressed
FROM f WHERE sum_abs * {_TCLOSE_T_DEN} <= {_TCLOSE_M - 1} * nn
UNION ALL
SELECT event_type, NULL, CAST(sum(n) AS BIGINT),
       CAST(NULL AS DOUBLE), TRUE
FROM f WHERE sum_abs * {_TCLOSE_T_DEN} > {_TCLOSE_M - 1} * nn
GROUP BY 1
""".strip()


def q_events_attribution_markov(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MARKOV REMOVAL-EFFECT attribution (Anderl et al. 2016 — the
    data-driven model beside the heuristic linear/U-shaped/time-decay
    rows): per-(user, day) journeys feed a first-order chain over
    touch states with absorbing CONV (first purchase) and NULL (day
    ends unconverted); a channel's credit is how much the chain's
    START→CONV probability DROPS when that channel is removed
    (removal effect, normalized to shares). Answers "which touch is
    causally load-bearing" where position heuristics just assert an
    answer.

    rows-only by design: the absorption probability solves the
    (I−Q)x = b linear system of the ≤ |event_types|+1 transient
    states — a bounded DRIVER-side numpy solve over the collected
    transition-count table (state-count² rows, the `metric ×
    metric`-matrix class), not SQL-expressible; determinism and a
    hand-computed chain are pinned in tests/test_attribution.py.

    Scale: the Spark side is the per-(user, day) sequence window +
    one transition-count aggregate — the `events_markov` plan; ONLY
    the bounded count table reaches the driver."""
    import numpy as np

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.to_date("ts").alias("day"),
        "ts",
        "event_id",
        "event_type",
    )
    w = Window.partitionBy("user_id", "day").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    # truncate each journey at its FIRST purchase (the conversion)
    marked = ev.withColumn(
        "purch_seen",
        F.sum((F.col("event_type") == "purchase").cast("int")).over(
            w.rowsBetween(Window.unboundedPreceding, -1)
        ),
    ).filter(F.coalesce(F.col("purch_seen"), F.lit(0)) == 0)
    # r11: the journey-end (last→NULL) transitions used to come from a
    # SECOND aggregate over the same windowed lineage (groupBy(user,
    # day).max_by + filter), so the events scan and the (user, day)
    # window ran twice. lead() inside the SAME window marks each
    # journey's last row (the window order is identical, so "lead is
    # null" ≡ the old max_by row), and that row emits its extra
    # state→NULL transition in the same pass — one scan, one window,
    # one aggregate; the collected transition multiset is unchanged.
    seq = (
        marked.withColumn(
            "state",
            F.when(F.col("event_type") == "purchase", F.lit("CONV"))
            .otherwise(F.col("event_type")),
        )
        .withColumn("prev", F.lag("state").over(w))
        .withColumn("nxt", F.lead("state").over(w))
    )
    base_edge = F.struct(
        F.coalesce(F.col("prev"), F.lit("START")).alias("src"),
        F.col("state").alias("dst"),
    )
    end_edge = F.struct(
        F.col("state").alias("src"), F.lit("NULL").alias("dst")
    )
    trans = (
        seq.select(
            F.explode(
                F.when(
                    F.col("nxt").isNull() & (F.col("state") != "CONV"),
                    F.array(base_edge, end_edge),
                ).otherwise(F.array(base_edge))
            ).alias("e")
        )
        .groupBy(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
        .agg(F.count(F.lit(1)).alias("c"))
    )
    counts = {(r.src, r.dst): r.c for r in trans.collect()}
    states = sorted(
        {s for s, _ in counts} | {d for _, d in counts}
        - {"CONV", "NULL"}
    )
    idx = {s: i for i, s in enumerate(states)}
    m = len(states)

    def conv_prob(removed: str | None) -> float:
        q = np.zeros((m, m))
        b = np.zeros(m)
        # row totals keep the full outgoing mass: transitions INTO
        # the removed state are NOT renormalized away — their
        # probability falls to NULL (the removal-effect semantics;
        # renormalizing would just route around the removed channel
        # and measure ~0 for everything)
        row_tot = {
            s: sum(c for (a, _d), c in counts.items() if a == s)
            for s in states
        }
        # removed-state transitions fall to NULL: drop its row
        for (a, d), c in counts.items():
            if a == removed or d == removed:
                continue
            if a in idx and row_tot[a] > 0:
                p = c / row_tot[a]
                if d == "CONV":
                    b[idx[a]] += p
                elif d in idx:
                    q[idx[a], idx[d]] += p
        if removed is not None and removed in idx:
            q[idx[removed], :] = 0.0
            b[idx[removed]] = 0.0
        x = np.linalg.solve(np.eye(m) - q, b)
        return float(x[idx["START"]])

    base = conv_prob(None)
    channels = [s for s in states if s != "START"]
    effects = {
        c: max(0.0, 1.0 - (conv_prob(c) / base if base > 0 else 0.0))
        for c in channels
    }
    tot = sum(effects.values())
    rows = [
        (
            c,
            round(effects[c], 6),
            round(effects[c] / tot, 6) if tot > 0 else None,
        )
        for c in sorted(channels)
    ]
    return spark.createDataFrame(
        rows,
        "channel string, removal_effect double, attribution_share double",
    )


_ATTR_WINDOW_MS = 24 * 3600 * 1000


def q_events_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINEAR multi-touch attribution: each purchase's value splits
    equally across the user's clicks in the preceding 24 h, and
    credit aggregates by the CLICK's day — the report marketing runs
    to value touchpoints (the funnel queries only count conversions;
    this distributes revenue back onto the touches). User-keyed join
    (per-user event volumes are bounded) + per-purchase touch count
    from one window; the per-touch credit uses integer floor division
    of the e6 value so the day-level sums are exact BIGINTs in both
    engines."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_millis(F.col("ts")).alias("t_p"),
        v_e6.alias("v_e6"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_millis(F.col("ts")).alias("t_c"),
        F.to_date("ts").cast("string").alias("click_day"),
    )
    j = p.join(c, "user_id").filter(
        (F.col("t_c") < F.col("t_p"))
        & (F.col("t_c") >= F.col("t_p") - F.lit(_ATTR_WINDOW_MS))
    )
    w = Window.partitionBy("purchase_id")
    credited = j.withColumn("n_touch", F.count(F.lit(1)).over(w)).withColumn(
        "credit_e6", F.expr("v_e6 div n_touch")
    )
    return credited.groupBy("click_day").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        stable_round(
            F.sum("credit_e6").cast("double") / F.lit(1_000_000.0), 4
        ).alias("credited_value"),
    )


ORACLE_ATTRIBUTION = f"""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS t_p,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_ms(ts) AS t_c,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS click_day
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.purchase_id, p.v_e6, c.click_day
  FROM p JOIN c USING (user_id)
  WHERE c.t_c < p.t_p AND c.t_c >= p.t_p - {_ATTR_WINDOW_MS}
), credited AS (
  SELECT *,
         v_e6 // count(*) OVER (PARTITION BY purchase_id) AS credit_e6
  FROM j
)
SELECT click_day, count(*) AS n_touches,
       count(DISTINCT purchase_id) AS n_purchases,
       {sql_stable_round(
           "CAST(sum(credit_e6) AS DOUBLE) / 1000000.0", 4)}
         AS credited_value
FROM credited GROUP BY 1
""".strip()


def q_events_attribution_ushape(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """POSITION-BASED (U-shaped, 40/20/40) multi-touch attribution —
    the industry-standard alternative to `events_attribution`'s equal
    split: the FIRST touch (discovery) and the LAST touch (closer)
    each get 40% of the purchase value, the middles share the rest.
    Exact integer scheme per purchase with n touches: n=1 → all,
    n=2 → v div 2 each, n≥3 → first = last = 2·v div 5, each middle =
    (v − first − last) div (n−2) — every credit a BIGINT both engines
    derive from the same floor divisions, position ranks tie-broken
    (t_c, click event_id)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_millis(F.col("ts")).alias("t_p"),
        v_e6.alias("v_e6"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.col("event_id").alias("click_id"),
        F.unix_millis(F.col("ts")).alias("t_c"),
        F.to_date("ts").cast("string").alias("click_day"),
    )
    j = p.join(c, "user_id").filter(
        (F.col("t_c") < F.col("t_p"))
        & (F.col("t_c") >= F.col("t_p") - F.lit(_ATTR_WINDOW_MS))
    )
    pw = W.partitionBy("purchase_id")
    ow = pw.orderBy("t_c", "click_id")
    ranked = j.select(
        "purchase_id",
        "v_e6",
        "click_day",
        F.row_number().over(ow).alias("rn"),
        F.count(F.lit(1)).over(pw).alias("n"),
    )
    end_credit = F.expr("v_e6 * 2 div 5")
    credit = (
        F.when(F.col("n") == 1, F.col("v_e6"))
        .when(F.col("n") == 2, F.expr("v_e6 div 2"))
        .when((F.col("rn") == 1) | (F.col("rn") == F.col("n")), end_credit)
        .otherwise(F.expr("(v_e6 - 2 * (v_e6 * 2 div 5)) div (n - 2)"))
    )
    return (
        ranked.withColumn("credit_e6", credit.cast("long"))
        .groupBy("click_day")
        .agg(
            F.count(F.lit(1)).alias("n_touches"),
            F.sum(
                ((F.col("rn") == 1) | (F.col("rn") == F.col("n")))
                .cast("long")
            ).alias("n_end_touches"),
            stable_round(
                F.sum("credit_e6").cast("double") / F.lit(1_000_000.0), 4
            ).alias("credited_value"),
        )
    )


ORACLE_ATTRIBUTION_USHAPE = f"""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS t_p,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, event_id AS click_id, epoch_ms(ts) AS t_c,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS click_day
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.purchase_id, p.v_e6, c.click_day, c.t_c, c.click_id
  FROM p JOIN c USING (user_id)
  WHERE c.t_c < p.t_p AND c.t_c >= p.t_p - {_ATTR_WINDOW_MS}
), ranked AS (
  SELECT purchase_id, v_e6, click_day,
         row_number() OVER (PARTITION BY purchase_id
                            ORDER BY t_c, click_id) AS rn,
         count(*) OVER (PARTITION BY purchase_id) AS n
  FROM j
), credited AS (
  SELECT click_day, rn, n,
         CASE WHEN n = 1 THEN v_e6
              WHEN n = 2 THEN v_e6 // 2
              WHEN rn = 1 OR rn = n THEN (v_e6 * 2) // 5
              ELSE (v_e6 - 2 * ((v_e6 * 2) // 5)) // (n - 2)
         END AS credit_e6
  FROM ranked
)
SELECT click_day,
       count(*) AS n_touches,
       CAST(coalesce(sum(CASE WHEN rn = 1 OR rn = n THEN 1 ELSE 0 END),
         0) AS BIGINT) AS n_end_touches,
       {sql_stable_round(
           "CAST(sum(credit_e6) AS DOUBLE) / 1000000.0", 4)}
         AS credited_value
FROM credited GROUP BY 1
""".strip()


def q_events_rolling_wau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-7-day active users per day (rolling WAU, with same-day
    DAU): a user active on day d stays 'active' for days d..d+6, so
    each DISTINCT (user, day) pair fans out into ≤ 7 rows and one
    countDistinct per day does the rest — no per-day rescan of
    history, no self-join over the window. The fanout factor is the
    window length (constant), the exchange carries (day, user) pairs
    deduped map-side, and days past the data's end are clipped via a
    broadcast 1-row max."""
    ev = load_table(spark, sf_dir, "events")
    days = ev.select(
        "user_id", F.to_date("ts").alias("d")
    ).distinct()
    maxd = days.agg(F.max("d").alias("max_d"))
    fan = days.select(
        "user_id",
        "d",
        F.explode(
            F.expr("sequence(d, date_add(d, 6))")
        ).alias("day"),
    ).crossJoin(F.broadcast(maxd)).filter(F.col("day") <= F.col("max_d"))
    return fan.groupBy(F.col("day").cast("string").alias("day")).agg(
        F.countDistinct("user_id").alias("n_wau"),
        F.countDistinct(
            F.when(F.col("day") == F.col("d"), F.col("user_id"))
        ).alias("n_dau"),
    )


ORACLE_ROLLING_WAU = """
WITH days AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
), maxd AS (
  SELECT max(d) AS max_d FROM days
), fan AS (
  SELECT user_id, d, d + CAST(k AS INTEGER) AS day
  FROM days, unnest(range(0, 7)) AS u(k), maxd
  WHERE d + CAST(k AS INTEGER) <= max_d
)
SELECT CAST(day AS VARCHAR) AS day,
       count(DISTINCT user_id) AS n_wau,
       count(DISTINCT CASE WHEN day = d THEN user_id END) AS n_dau
FROM fan GROUP BY 1
""".strip()


# --------------------------------------------- native session windows


def q_sessions_native(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's NATIVE ``F.session_window`` — the
    same gap rule as `sessions_user`'s gaps-and-islands formulation
    but expressed as a first-class windowed AGGREGATION: one groupBy,
    no lag/cumsum window chain, and (unlike the islands form) directly
    legal in Structured Streaming with watermark-bounded state.

    Boundary semantics are IDENTICAL to the islands form — pinned in
    tests/test_sessions_native.py: a session's window is [ts, ts+gap]
    INCLUSIVE, so an event exactly 12 h after its predecessor merges
    (diff <= gap), exactly like the islands rule; only diff > gap
    splits.  The two formulations therefore share one oracle, and
    session_end_ms is the window's end = last event + gap, matching
    the islands query's max(ts)+gap convention.

    Scale: one shuffle keyed by user; session merge happens inside the
    aggregation operator (map-side partial sessions merge in the
    reducer) — no second window pass over the sessionized rows.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "value"
    )
    g = ev.groupBy(
        "user_id", F.session_window("ts", SESSION_GAP)
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("value").alias("value_sum"),
    )
    return g.select(
        "user_id",
        F.unix_millis(F.col("session_window.start")).alias(
            "session_start_ms"
        ),
        F.unix_millis(F.col("session_window.end")).alias(
            "session_end_ms"
        ),
        "n_events",
        stable_round(F.col("value_sum"), 4).alias("value_sum"),
    )


ORACLE_SESSIONS_NATIVE = ORACLE_SESSIONS  # same gap semantics, same output shape


# ------------------------------------------- Markov event transitions


def q_events_markov(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams: P(next = b | current = a) with counts — the next-event
    model `events_seq_patterns`' raw trigram counts don't normalize
    into, and the input for behavioral simulation / anomaly-of-flow
    detection.

    lead() per user over the total (ts, event_id) order produces the
    transition pairs; the matrix groupBy partial-aggregates map-side
    into ≤ |event_type|² groups, and the normalizing per-source
    totals are a sum window over that corpus-size-independent
    aggregate (one corpus pass — a joined-back totals aggregate
    re-ran the scan+window). Probability = exact-integer division
    (n_ab / n_a), one division per output row.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    # r12 (guide §2.4): the normalizing totals used to be a separate
    # aggregate JOINED back — the broadcast side's plan re-ran the
    # corpus scan + per-user window a second time (no exchange reuse
    # across the differently-pruned subtrees). A sum window over the
    # ≤|event_type|² pairs relation computes the same totals in the
    # same pass: one scan, one window, one aggregate.
    n_from = F.sum("n_trans").over(
        Window.partitionBy("from_type").rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return pairs.select(
        "from_type",
        "to_type",
        "n_trans",
        n_from.cast("long").alias("n_from"),
        (
            F.col("n_trans").cast("double") / n_from.cast("double")
        ).alias("p_transition"),
    )


ORACLE_MARKOV = """
WITH t AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), p AS (
  SELECT event_type AS from_type, next_type AS to_type,
         count(*) AS n_trans
  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT from_type, sum(n_trans) AS n_from FROM p GROUP BY 1
)
SELECT p.from_type, p.to_type, p.n_trans,
       CAST(tot.n_from AS BIGINT) AS n_from,
       CAST(p.n_trans AS DOUBLE) / CAST(tot.n_from AS DOUBLE)
         AS p_transition
FROM p JOIN tot USING (from_type)
""".strip()


def q_events_dwell_by_transition(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Transition DWELL-TIME matrix (r8): for every (from_type →
    to_type) pair, how long users sit between the two events — the
    TIMING face of `events_markov` (which gives the probabilities):
    view→purchase with a 10 s median dwell is a different product
    story than the same probability at 2 h. Same lead() shape (one
    user-keyed window), dwell in exact ms from the lead timestamp;
    the matrix aggregate is ≤ |event_type|² groups, sums exact
    BIGINT ms, mean rounded once."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .withColumn("next_ms", F.lead(F.unix_millis("ts")).over(w))
        .filter(F.col("next_type").isNotNull())
        .select(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
            (F.col("next_ms") - F.unix_millis("ts")).alias("dwell_ms"),
        )
    )
    return trans.groupBy("from_type", "to_type").agg(
        F.count(F.lit(1)).alias("n_trans"),
        F.sum("dwell_ms").alias("total_dwell_ms"),
        F.max("dwell_ms").alias("max_dwell_ms"),
        stable_round(
            F.sum("dwell_ms").cast("double")
            / F.count(F.lit(1)).cast("double")
            / F.lit(1000.0),
            4,
        ).alias("mean_dwell_s"),
    )


ORACLE_DWELL_TRANSITION = f"""
WITH t AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type,
         lead(epoch_ms(ts)) OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id)
           - epoch_ms(ts) AS dwell_ms
  FROM events
)
SELECT from_type, to_type,
       count(*) AS n_trans,
       CAST(sum(dwell_ms) AS BIGINT) AS total_dwell_ms,
       CAST(max(dwell_ms) AS BIGINT) AS max_dwell_ms,
       {sql_stable_round(
           "CAST(sum(dwell_ms) AS DOUBLE) / count(*) / 1000.0", 4)}
         AS mean_dwell_s
FROM t WHERE to_type IS NOT NULL
GROUP BY 1, 2
""".strip()


# -------------------------------------------- user lifecycle weekly

_WEEK_MS = 7 * 24 * 3600 * 1000


def q_events_lifecycle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly growth accounting with full lifecycle states: per
    epoch-week, how many active users are NEW (first week ever),
    RETAINED (also active the week before), or RESURRECTED (active,
    but last seen ≥ 2 weeks ago) — plus CHURNED (active last week,
    silent this week), the count `events_cumulative_users`' running
    totals can't give.

    One shuffle to distinct (user, week); per-user lag() classifies
    active weeks and lead() emits each churn row in the SAME window
    pass — a user churns in week w+1 exactly when their next active
    week isn't w+1.  All counts are exact integers on a
    |users|×|weeks|-bounded relation, never raw events.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        (
            (F.unix_millis(F.col("ts")) / F.lit(_WEEK_MS)).cast("long")
            * F.lit(_WEEK_MS)
        ).alias("week_ms"),
    )
    # r12 (VERDICT r11 #2/#3): the r11 shape cached the distinct
    # (user, week) set — USER-PROPORTIONAL state, and the cache
    # regressed its own query (0.37→0.72 s) because three consumers'
    # saved re-scans cost less than the materialization. One window
    # pass now produces everything: lag() classifies the active week,
    # and lead() emits the CHURN row in the same pass — a user churns
    # in week w+1 exactly when their next active week isn't w+1
    # (that is what the old anti-join tested: (u, w+WEEK) absent from
    # the active set ⟺ the next active week after w is > w+WEEK or
    # doesn't exist). Each active week explodes into its state row
    # plus an optional churn row; ONE groupBy+pivot counts all four
    # states. No cache, no anti-join, no full-outer week-grid join —
    # single linear pipeline (3 FileScans → 1 without the cache).
    uw = ev.distinct()
    w = Window.partitionBy("user_id").orderBy("week_ms")
    marked = uw.select(
        "week_ms",
        F.lag("week_ms").over(w).alias("prev_week"),
        F.lead("week_ms").over(w).alias("next_week"),
    )
    state = (
        F.when(F.col("prev_week").isNull(), F.lit("new"))
        .when(
            F.col("week_ms") - F.col("prev_week") == F.lit(_WEEK_MS),
            F.lit("retained"),
        )
        .otherwise(F.lit("resurrected"))
    )
    churns = F.col("next_week").isNull() | (
        F.col("next_week") > F.col("week_ms") + F.lit(_WEEK_MS)
    )
    emitted = marked.select(
        F.explode(
            F.concat(
                F.array(F.struct(F.col("week_ms"), state.alias("state"))),
                F.when(
                    churns,
                    F.array(
                        F.struct(
                            (F.col("week_ms") + F.lit(_WEEK_MS)).alias(
                                "week_ms"
                            ),
                            F.lit("churned").alias("state"),
                        )
                    ),
                ).otherwise(F.array().cast(
                    "array<struct<week_ms:bigint,state:string>>"
                )),
            )
        ).alias("e")
    ).select(F.col("e.week_ms").alias("week_ms"), F.col("e.state"))
    out = (
        emitted.groupBy("week_ms")
        .pivot("state", ["new", "retained", "resurrected", "churned"])
        .count()
        .na.fill(0, ["new", "retained", "resurrected", "churned"])
    )
    return out.select(
        "week_ms",
        F.col("new").cast("long").alias("n_new"),
        F.col("retained").cast("long").alias("n_retained"),
        F.col("resurrected").cast("long").alias("n_resurrected"),
        F.col("churned").cast("long").alias("n_churned"),
    )


ORACLE_LIFECYCLE = f"""
WITH uw AS (
  SELECT DISTINCT user_id,
         (epoch_ms(ts) // {_WEEK_MS}) * {_WEEK_MS} AS week_ms
  FROM events
), cl AS (
  SELECT user_id, week_ms,
         lag(week_ms) OVER (PARTITION BY user_id ORDER BY week_ms)
           AS prev_week
  FROM uw
), act AS (
  SELECT week_ms,
         count(*) FILTER (prev_week IS NULL) AS n_new,
         count(*) FILTER (week_ms - prev_week = {_WEEK_MS})
           AS n_retained,
         count(*) FILTER (prev_week IS NOT NULL
                          AND week_ms - prev_week > {_WEEK_MS})
           AS n_resurrected
  FROM cl GROUP BY 1
), ch AS (
  SELECT p.week_ms + {_WEEK_MS} AS week_ms, count(*) AS n_churned
  FROM uw p
  LEFT JOIN uw c ON c.user_id = p.user_id
                AND c.week_ms = p.week_ms + {_WEEK_MS}
  WHERE c.user_id IS NULL
  GROUP BY 1
)
SELECT COALESCE(act.week_ms, ch.week_ms) AS week_ms,
       CAST(COALESCE(act.n_new, 0) AS BIGINT) AS n_new,
       CAST(COALESCE(act.n_retained, 0) AS BIGINT) AS n_retained,
       CAST(COALESCE(act.n_resurrected, 0) AS BIGINT) AS n_resurrected,
       CAST(COALESCE(ch.n_churned, 0) AS BIGINT) AS n_churned
FROM act FULL OUTER JOIN ch ON ch.week_ms = act.week_ms
""".strip()


# --------------------------------------------- active-time accounting


def q_sessions_active_time(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Engagement DURATION accounting: per (user, day) total active
    milliseconds and session count, where active time is the span of
    each gap-based session (first→last event; single-event sessions
    contribute 0 ms) attributed to the session's start day — the
    time-on-product number per-day event COUNTS always get asked to
    become.

    Same islands machinery as `sessions_user` (one user-keyed
    shuffle), then a (user, day) rollup of the session relation —
    |sessions| rows, not events.  Durations are exact epoch-ms
    integers end-to-end.
    """
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_millis(F.col("ts")).alias("ts_ms")
    )
    uw = Window.partitionBy("user_id").orderBy("ts_ms")
    gap_ms = 12 * 3600 * 1000
    new_sess = F.when(
        F.lag("ts_ms").over(uw).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(uw) > F.lit(gap_ms)),
        F.lit(1),
    ).otherwise(F.lit(0))
    marked = ev.withColumn("is_new", new_sess).withColumn(
        "sess_id",
        F.sum("is_new").over(
            uw.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = marked.groupBy("user_id", "sess_id").agg(
        F.min("ts_ms").alias("start_ms"),
        F.max("ts_ms").alias("end_ms"),
    )
    day_ms = 24 * 3600 * 1000
    return (
        sessions.withColumn(
            "day_ms",
            (F.col("start_ms") / F.lit(day_ms)).cast("long")
            * F.lit(day_ms),
        )
        .groupBy("user_id", "day_ms")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.sum(F.col("end_ms") - F.col("start_ms"))
            .cast("long")
            .alias("active_ms"),
        )
    )


ORACLE_ACTIVE_TIME = """
WITH m AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts))
                   OVER (PARTITION BY user_id ORDER BY epoch_ms(ts))
                   <= 43200000
              THEN 0 ELSE 1 END AS new_session
  FROM events
), n AS (
  SELECT *, sum(new_session) OVER (
           PARTITION BY user_id ORDER BY ts_ms
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sess_id
  FROM m
), sess AS (
  SELECT user_id, sess_id, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
  FROM n GROUP BY 1, 2
)
SELECT user_id,
       (start_ms // 86400000) * 86400000 AS day_ms,
       count(*) AS n_sessions,
       CAST(sum(end_ms - start_ms) AS BIGINT) AS active_ms
FROM sess GROUP BY 1, 2
""".strip()


_GAP_US = 12 * 3600 * 1_000_000


def q_sessions_entry_exit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session entry/exit behavior matrix: which event type OPENS a
    session vs which CLOSES it, with session and user counts per
    (entry, exit) cell — the landing/abandonment readout product
    analytics runs on sessionized streams. Same island semantics as
    `sessions_user` (gap ≤ 12 h), first/last picked by row_number on
    the deterministic (ts, event_id) order; every window shares the
    ONE user-keyed sort, and the output is ≤ |event_types|² rows."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.col("us") - F.lag("us").over(w_ord) <= F.lit(_GAP_US), F.lit(0)
    ).otherwise(F.lit(1))
    marked = ev.withColumn("new_sess", new_sess).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    w_s = Window.partitionBy("user_id", "sess_id").orderBy("ts", "event_id")
    w_sd = Window.partitionBy("user_id", "sess_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    per_sess = (
        marked.withColumn("rn_a", F.row_number().over(w_s))
        .withColumn("rn_d", F.row_number().over(w_sd))
        .groupBy("user_id", "sess_id")
        .agg(
            F.max(F.when(F.col("rn_a") == 1, F.col("event_type"))).alias(
                "entry_type"
            ),
            F.max(F.when(F.col("rn_d") == 1, F.col("event_type"))).alias(
                "exit_type"
            ),
        )
    )
    return per_sess.groupBy("entry_type", "exit_type").agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("user_id").alias("n_users"),
    )


_PATH_CAP = 8
_PATH_TOP = 15


def q_sessions_top_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top USER JOURNEYS: the most common full event-type paths
    through a session (first 8 steps, '>'-joined), with session
    and user counts — the flow readout between `sessions_entry_exit`'s
    2-cell matrix and `events_markov`'s memoryless transitions (paths
    keep the whole ordered journey; the cap bounds both string size
    and the path-space cardinality the groupBy keys on). Session
    islands and the (ts, event_id) total order are exactly
    `sessions_user`'s; paths assemble as sort_array over per-session
    collected structs (deterministic — the sort key is unique), and
    top-15 by (sessions, path) is TakeOrdered."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    w_ord = Window.partitionBy("user_id").orderBy("ts", "event_id")
    new_sess = F.when(
        F.col("us") - F.lag("us").over(w_ord) <= F.lit(_GAP_US), F.lit(0)
    ).otherwise(F.lit(1))
    marked = ev.withColumn("new_sess", new_sess).withColumn(
        "sess_id",
        F.sum("new_sess").over(
            w_ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    per_sess = marked.groupBy("user_id", "sess_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sort_array(
            F.collect_list(F.struct("us", "event_id", "event_type"))
        ).alias("seq"),
    )
    path = F.concat_ws(
        ">",
        F.transform(
            F.slice(F.col("seq"), 1, _PATH_CAP), lambda s: s.event_type
        ),
    )
    return (
        per_sess.select(
            "user_id",
            path.alias("path"),
            (F.col("n_events") > _PATH_CAP).alias("truncated"),
        )
        .groupBy("path", "truncated")
        .agg(
            F.count(F.lit(1)).alias("n_sessions"),
            F.countDistinct("user_id").alias("n_users"),
        )
        .orderBy(
            F.col("n_sessions").desc(), F.col("path"), F.col("truncated")
        )
        .limit(_PATH_TOP)
    )


ORACLE_SESSIONS_TOP_PATHS = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   <= {_GAP_SQL}
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), numbered AS (
  SELECT *, sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sess_id
  FROM marked
), per_sess AS (
  SELECT user_id, sess_id, count(*) AS n_events,
         array_to_string(
           (list(event_type ORDER BY ts, event_id))[1:{_PATH_CAP}], '>'
         ) AS path
  FROM numbered GROUP BY 1, 2
)
SELECT path, n_events > {_PATH_CAP} AS truncated,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM per_sess
GROUP BY 1, 2
ORDER BY n_sessions DESC, path, truncated
LIMIT {_PATH_TOP}
""".strip()


ORACLE_SESSIONS_ENTRY_EXIT = f"""
WITH marked AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   <= {_GAP_SQL}
              THEN 0 ELSE 1 END AS new_sess
  FROM events
), numbered AS (
  SELECT *, sum(new_sess) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS sess_id
  FROM marked
), ranked AS (
  SELECT *,
         row_number() OVER (PARTITION BY user_id, sess_id
                            ORDER BY ts, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, sess_id
                            ORDER BY ts DESC, event_id DESC) AS rn_d
  FROM numbered
), per_sess AS (
  SELECT user_id, sess_id,
         max(CASE WHEN rn_a = 1 THEN event_type END) AS entry_type,
         max(CASE WHEN rn_d = 1 THEN event_type END) AS exit_type
  FROM ranked GROUP BY 1, 2
)
SELECT entry_type, exit_type,
       CAST(count(*) AS BIGINT) AS n_sessions,
       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
FROM per_sess GROUP BY 1, 2
""".strip()


def q_events_attribution_timedecay(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TIME-DECAY multi-touch attribution (r8) — completes the
    attribution family (equal-split `events_attribution`, U-shaped
    `events_attribution_ushape`): a touch's credit halves for every
    hour it precedes the purchase (1-hour half-life over the 24 h
    window), the industry default when recency drives influence.

    Exact integer scheme: Δh = whole hours before the purchase
    (0..23), weight = 2^(23−Δh) — a BIGINT power of two, so per-touch
    credit is `v_e6 * w div Σw` with every term exact in both engines
    (no IEEE pow, whose last-ulp behavior differs across engines).
    Same user-keyed join + purchase-window shape as the siblings."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    v_e6 = F.floor(F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)).cast(
        "long"
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.unix_millis(F.col("ts")).alias("t_p"),
        v_e6.alias("v_e6"),
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id",
        F.unix_millis(F.col("ts")).alias("t_c"),
        F.to_date("ts").cast("string").alias("click_day"),
    )
    j = p.join(c, "user_id").filter(
        (F.col("t_c") < F.col("t_p"))
        & (F.col("t_c") >= F.col("t_p") - F.lit(_ATTR_WINDOW_MS))
    )
    weighted = j.withColumn(
        "w", F.expr("shiftleft(CAST(1 AS BIGINT), 23 - CAST((t_p - t_c) div 3600000 AS INT))")
    )
    pw = W.partitionBy("purchase_id")
    credited = weighted.withColumn(
        "sum_w", F.sum("w").over(pw)
    ).withColumn("credit_e6", F.expr("v_e6 * w div sum_w"))
    return credited.groupBy("click_day").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.countDistinct("purchase_id").alias("n_purchases"),
        stable_round(
            F.sum("credit_e6").cast("double") / F.lit(1_000_000.0), 4
        ).alias("credited_value"),
    )


ORACLE_ATTRIBUTION_TIMEDECAY = f"""
WITH p AS (
  SELECT user_id, event_id AS purchase_id, epoch_ms(ts) AS t_p,
         CAST(floor(value * 1000000.0 + 0.5) AS BIGINT) AS v_e6
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, epoch_ms(ts) AS t_c,
         CAST(CAST(ts AS DATE) AS VARCHAR) AS click_day
  FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.purchase_id, p.v_e6, c.click_day,
         (1::BIGINT << CAST(23 - (p.t_p - c.t_c) // 3600000 AS INT)) AS w
  FROM p JOIN c USING (user_id)
  WHERE c.t_c < p.t_p AND c.t_c >= p.t_p - {_ATTR_WINDOW_MS}
), credited AS (
  SELECT click_day, purchase_id,
         v_e6 * w // sum(w) OVER (PARTITION BY purchase_id) AS credit_e6
  FROM j
)
SELECT click_day, count(*) AS n_touches,
       count(DISTINCT purchase_id) AS n_purchases,
       {sql_stable_round(
           "CAST(sum(credit_e6) AS DOUBLE) / 1000000.0", 4)}
         AS credited_value
FROM credited GROUP BY 1
""".strip()


_ASOF_TOL_MS = 6 * 3600 * 1000  # 6 h: a click older than this is stale


def q_asof_tolerance_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join with TOLERANCE (r8) — pandas ``merge_asof(...,
    tolerance=...)`` / kdb wj semantics: each purchase takes the last
    preceding click ONLY if it is at most ``_ASOF_TOL_MS`` old;
    staler matches are rejected to unmatched (NULL click columns,
    match_age_ms carries the age for matched rows). The plain as-of
    (`asof_purchase_click`) attributes a purchase to a week-old
    click; with tolerance the attribution window is explicit. Same
    union+carry as-of machinery (operators/asof.py) + one row-local
    CASE — no extra shuffle."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", F.col("value").alias("purchase_value")
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts", F.col("value").alias("click_value")
    )
    joined = asof_join(
        purchases, clicks, ["user_id"], right_prefix="last_click_"
    )
    age = F.unix_millis(F.col("ts")) - F.unix_millis(
        F.col("last_click_ts")
    )
    ok = F.col("last_click_ts").isNotNull() & (age <= _ASOF_TOL_MS)
    return joined.select(
        "user_id",
        F.unix_millis("ts").alias("ts_ms"),
        stable_round(F.col("purchase_value"), 4).alias("purchase_value"),
        F.when(ok, F.unix_millis("last_click_ts")).alias("click_ts_ms"),
        F.when(
            ok, stable_round(F.col("last_click_click_value"), 4)
        ).alias("click_value"),
        F.when(ok, age).alias("match_age_ms"),
    )


ORACLE_ASOF_TOLERANCE = f"""
WITH p AS (
  SELECT user_id, ts, value AS purchase_value FROM events
  WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts, value AS click_value FROM events
  WHERE event_type = 'click'
), m AS (
  SELECT p.user_id, p.ts AS pts, p.purchase_value,
         c.ts AS cts, c.click_value,
         epoch_ms(p.ts) - epoch_ms(c.ts) AS age
  FROM p ASOF LEFT JOIN c
    ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT user_id, epoch_ms(pts) AS ts_ms,
       {sql_stable_round("purchase_value", 4)} AS purchase_value,
       CASE WHEN cts IS NOT NULL AND age <= {_ASOF_TOL_MS}
            THEN epoch_ms(cts) END AS click_ts_ms,
       CASE WHEN cts IS NOT NULL AND age <= {_ASOF_TOL_MS}
            THEN {sql_stable_round("click_value", 4)} END AS click_value,
       CASE WHEN cts IS NOT NULL AND age <= {_ASOF_TOL_MS}
            THEN age END AS match_age_ms
FROM m
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sessions_entry_exit": q_sessions_entry_exit,
    "sessions_top_paths": q_sessions_top_paths,
    "sessions_active_time": q_sessions_active_time,
    "events_lifecycle": q_events_lifecycle,
    "events_markov": q_events_markov,
    "events_dwell_by_transition": q_events_dwell_by_transition,
    "sessions_native": q_sessions_native,
    "events_rolling_wau": q_events_rolling_wau,
    "events_attribution": q_events_attribution,
    "events_attribution_ushape": q_events_attribution_ushape,
    "events_attribution_timedecay": q_events_attribution_timedecay,
    "asof_tolerance_click": q_asof_tolerance_click,
    "events_seq_patterns": q_events_seq_patterns,
    "funnel_strict_ordered": q_funnel_strict_ordered,
    "events_kanon": q_events_kanon,
    "events_ldiversity": q_events_ldiversity,
    "events_tcloseness": q_events_tcloseness,
    "events_attribution_markov": q_events_attribution_markov,  # rows-only (driver matrix solve)
    "metric_histogram_quantile": q_metric_histogram_quantile,
    "user_event_seq": q_user_event_seq,
    "events_cumulative_users": q_events_cumulative_users,
    "asof_purchase_click": q_asof_purchase_click,
    "asof_nearest_click": q_asof_nearest_click,
    "anomaly_zscore": q_anomaly_zscore,
    "metric_histogram": q_metric_histogram,
    "metric_histogram_exemplars": q_metric_histogram_exemplars,
    "metric_histogram_native": q_metric_histogram_native,
    "events_trailing_1h": q_events_trailing_1h,
    "funnel_conversion": q_funnel_conversion,
    "sessions_user": q_sessions_user,
    "sessions_capped": q_sessions_capped,
    "moving_avg_user": q_moving_avg_user,
    "lag_delta_user": q_lag_delta_user,
    "running_total_user": q_running_total_user,
    "range_join_ship": q_range_join_ship,
    "events_retention": q_events_retention,
    "events_retention_halflife": q_events_retention_halflife,
    "metric_gapfill": q_metric_gapfill,
}

ORACLES: dict[str, str] = {
    "sessions_entry_exit": ORACLE_SESSIONS_ENTRY_EXIT,
    "sessions_top_paths": ORACLE_SESSIONS_TOP_PATHS,
    "sessions_active_time": ORACLE_ACTIVE_TIME,
    "events_lifecycle": ORACLE_LIFECYCLE,
    "events_markov": ORACLE_MARKOV,
    "events_dwell_by_transition": ORACLE_DWELL_TRANSITION,
    "sessions_native": ORACLE_SESSIONS_NATIVE,
    "events_rolling_wau": ORACLE_ROLLING_WAU,
    "events_attribution": ORACLE_ATTRIBUTION,
    "events_attribution_ushape": ORACLE_ATTRIBUTION_USHAPE,
    "events_attribution_timedecay": ORACLE_ATTRIBUTION_TIMEDECAY,
    "asof_tolerance_click": ORACLE_ASOF_TOLERANCE,
    "events_seq_patterns": ORACLE_SEQ_PATTERNS,
    "funnel_strict_ordered": ORACLE_FUNNEL_STRICT,
    "events_kanon": ORACLE_KANON,
    "events_ldiversity": ORACLE_LDIVERSITY,
    "events_tcloseness": ORACLE_TCLOSENESS,
    "metric_histogram_quantile": ORACLE_HISTOGRAM_QUANTILE,
    "user_event_seq": ORACLE_USER_SEQ,
    "events_cumulative_users": ORACLE_CUMULATIVE_USERS,
    "range_join_ship": ORACLE_RANGE_JOIN,
    "events_retention": ORACLE_RETENTION,
    "events_retention_halflife": ORACLE_RETENTION_HALFLIFE,
    "metric_gapfill": ORACLE_GAPFILL,
    "anomaly_zscore": ORACLE_ANOMALY,
    "metric_histogram": ORACLE_HISTOGRAM,
    "metric_histogram_exemplars": ORACLE_HISTOGRAM_EXEMPLARS,
    "metric_histogram_native": ORACLE_HISTOGRAM_NATIVE,
    "events_trailing_1h": ORACLE_TRAILING_1H,
    "funnel_conversion": ORACLE_FUNNEL,
    "asof_purchase_click": ORACLE_ASOF,
    "asof_nearest_click": ORACLE_ASOF_NEAREST,
    "sessions_user": ORACLE_SESSIONS,
    "sessions_capped": ORACLE_SESSIONS_CAPPED,
    "moving_avg_user": ORACLE_MOVING_AVG,
    "lag_delta_user": ORACLE_LAG_DELTA,
    "running_total_user": ORACLE_RUNNING_TOTAL,
}
