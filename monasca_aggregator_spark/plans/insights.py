"""Round-3 operator additions: experiment analysis, engagement and
behavioral statistics (events), corpus-health signals (documents,
embeddings) and an open-order aging report (orders).

Every query is oracle-backed with cross-engine-exact numerics: counts
and sums ride as BIGINTs, order-sensitive double folds are avoided by
fixed-point integer accumulation (the ``agg_stddev`` moment pattern),
and every emitted double goes through ``stable_round`` with the
identical ``floor(x·10^d + 0.5)/10^d`` algebra on both engines.

Scale posture: each query touches its fact table once, aggregates with
map-side partials on bounded keys (day, source, label, user), and joins
only broadcast-sized summaries back — no self-joins, no windows over
unpartitioned data, no driver collects.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.text import tokens
from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.sources.tables import load_table

_DAY_MS = 86_400_000


# ---------------------------------------------------------- A/B z-test


def q_events_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z-test per day between deterministic variants
    (user_id mod 2 — the stateless bucket assignment split_train_val
    uses): conversion = user had ≥1 'purchase' among their events that
    day. The classic experiment-analysis readout.

    Plan: events collapse to distinct (day, variant, user, converted)
    in one aggregation (map-side partial), then one tiny per-day
    aggregate; the z statistic is pure scalar algebra over exact
    BIGINT counts, so both engines compute identical doubles.
    """
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_millis("ts") / F.lit(_DAY_MS)).cast("long")
    per_user = (
        ev.groupBy(
            day.alias("day"),
            F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
            "user_id",
        )
        .agg(
            F.max(
                (F.col("event_type") == "purchase").cast("int")
            ).alias("converted")
        )
    )
    daily = per_user.groupBy("day").agg(
        F.sum((F.col("variant") == 0).cast("long")).alias("n0"),
        F.sum((F.col("variant") == 1).cast("long")).alias("n1"),
        F.sum(
            ((F.col("variant") == 0) & (F.col("converted") == 1)).cast("long")
        ).alias("c0"),
        F.sum(
            ((F.col("variant") == 1) & (F.col("converted") == 1)).cast("long")
        ).alias("c1"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0").cast("double")
    p1 = F.col("c1").cast("double") / F.col("n1").cast("double")
    pp = (F.col("c0") + F.col("c1")).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    se = F.sqrt(
        pp
        * (F.lit(1.0) - pp)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    z = (p1 - p0) / se
    return (
        daily.filter((F.col("n0") > 0) & (F.col("n1") > 0))
        .select(
            "day",
            "n0",
            "n1",
            "c0",
            "c1",
            stable_round(p0, 6).alias("p0"),
            stable_round(p1, 6).alias("p1"),
            stable_round(z, 4).alias("z_score"),
            (F.abs(z) > F.lit(1.959964)).alias("significant"),
        )
    )


ORACLE_AB_TEST = f"""
WITH pu AS (
  SELECT epoch_ms(ts) // {_DAY_MS} AS day,
         CAST(user_id % 2 AS INT) AS variant, user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1, 2, 3
), d AS (
  SELECT day,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN variant = 0 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c0,
         CAST(sum(CASE WHEN variant = 1 AND converted = 1 THEN 1 ELSE 0 END)
              AS BIGINT) AS c1
  FROM pu GROUP BY 1
)
SELECT CAST(day AS BIGINT) AS day, n0, n1, c0, c1,
       {sql_stable_round("c0::DOUBLE / n0::DOUBLE", 6)} AS p0,
       {sql_stable_round("c1::DOUBLE / n1::DOUBLE", 6)} AS p1,
       {sql_stable_round(
           "(c1::DOUBLE / n1::DOUBLE - c0::DOUBLE / n0::DOUBLE)"
           " / sqrt((c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE"
           " * (1.0::DOUBLE - (c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE)"
           " * (1.0::DOUBLE / n0::DOUBLE + 1.0::DOUBLE / n1::DOUBLE))", 4)}
         AS z_score,
       abs((c1::DOUBLE / n1::DOUBLE - c0::DOUBLE / n0::DOUBLE)
           / sqrt((c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE
             * (1.0::DOUBLE - (c0 + c1)::DOUBLE / (n0 + n1)::DOUBLE)
             * (1.0::DOUBLE / n0::DOUBLE + 1.0::DOUBLE / n1::DOUBLE)))
         > 1.959964 AS significant
FROM d WHERE n0 > 0 AND n1 > 0
""".strip()


_Z_ALPHA = 1.959964  # two-sided alpha = 0.05
_Z_POWER = 0.841621  # power = 0.80
_MDE_TARGET = 0.02  # the "can we see a 2-point lift?" planning target


def q_events_ab_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Experiment POWER / MDE readout per day — the planning
    companion of `events_ab_test` (which answers "did it move?";
    this answers "could we even have seen it move?"): with the
    day's observed control conversion p₀ and arm sizes, the minimum
    detectable ABSOLUTE effect at α=0.05 / power 0.8 is
    MDE = (z_{{α/2}} + z_{{pow}})·√(p₀(1−p₀)(1/n₀ + 1/n₁)), and the
    required per-arm n to detect a {_MDE_TARGET:.0%} lift is the
    standard two-proportion formula — an experiment dashboard's
    sample-size row, computed in-engine from the same distinct
    (day, variant, user, converted) collapse as the z-test.

    Determinism: counts are exact BIGINTs; every emitted double is
    the identical closed-form expression over them in both engines
    (z constants as shared literals), through stable_round.
    """
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_millis("ts") / F.lit(_DAY_MS)).cast("long")
    per_user = ev.groupBy(
        day.alias("day"),
        F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
        "user_id",
    ).agg(
        F.max(
            (F.col("event_type") == "purchase").cast("int")
        ).alias("converted")
    )
    daily = per_user.groupBy("day").agg(
        F.sum((F.col("variant") == 0).cast("long")).alias("n0"),
        F.sum((F.col("variant") == 1).cast("long")).alias("n1"),
        F.sum(
            ((F.col("variant") == 0) & (F.col("converted") == 1)).cast(
                "long"
            )
        ).alias("c0"),
    )
    p0 = F.col("c0").cast("double") / F.col("n0").cast("double")
    mde = F.lit(_Z_ALPHA + _Z_POWER) * F.sqrt(
        p0
        * (F.lit(1.0) - p0)
        * (
            F.lit(1.0) / F.col("n0").cast("double")
            + F.lit(1.0) / F.col("n1").cast("double")
        )
    )
    p1t = p0 + F.lit(_MDE_TARGET)
    n_req = (
        F.lit((_Z_ALPHA + _Z_POWER) ** 2)
        * (p0 * (F.lit(1.0) - p0) + p1t * (F.lit(1.0) - p1t))
        / F.lit(_MDE_TARGET * _MDE_TARGET)
    )
    return (
        daily.filter(
            (F.col("n0") > 0) & (F.col("n1") > 0) & (F.col("c0") > 0)
        )
        .select(
            "day",
            "n0",
            "n1",
            stable_round(p0, 6).alias("p0"),
            stable_round(mde, 6).alias("mde_abs"),
            stable_round(mde / p0, 6).alias("mde_rel"),
            (mde <= F.lit(_MDE_TARGET)).alias("powered_for_target"),
            F.ceil(n_req).cast("long").alias("n_per_arm_for_target"),
        )
    )


_P0_SQL = "c0::DOUBLE / n0::DOUBLE"
_MDE_SQL = (
    f"{_Z_ALPHA + _Z_POWER!r} * sqrt(({_P0_SQL})"
    f" * (1.0::DOUBLE - {_P0_SQL})"
    " * (1.0::DOUBLE / n0::DOUBLE + 1.0::DOUBLE / n1::DOUBLE))"
)

ORACLE_AB_POWER = f"""
WITH pu AS (
  SELECT epoch_ms(ts) // {_DAY_MS} AS day,
         CAST(user_id % 2 AS INT) AS variant, user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1, 2, 3
), d AS (
  SELECT day,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1,
         CAST(sum(CASE WHEN variant = 0 AND converted = 1
                       THEN 1 ELSE 0 END) AS BIGINT) AS c0
  FROM pu GROUP BY 1
)
SELECT CAST(day AS BIGINT) AS day, n0, n1,
       {sql_stable_round(_P0_SQL, 6)} AS p0,
       {sql_stable_round(_MDE_SQL, 6)} AS mde_abs,
       {sql_stable_round(f"({_MDE_SQL}) / ({_P0_SQL})", 6)} AS mde_rel,
       ({_MDE_SQL}) <= {_MDE_TARGET!r} AS powered_for_target,
       CAST(ceil({(_Z_ALPHA + _Z_POWER) ** 2!r}
            * (({_P0_SQL}) * (1.0::DOUBLE - ({_P0_SQL}))
               + (({_P0_SQL}) + {_MDE_TARGET!r})
                 * (1.0::DOUBLE - (({_P0_SQL}) + {_MDE_TARGET!r})))
            / {_MDE_TARGET * _MDE_TARGET!r}) AS BIGINT)
         AS n_per_arm_for_target
FROM d WHERE n0 > 0 AND n1 > 0 AND c0 > 0
""".strip()


# ------------------------------------------------------- DAU/MAU ratio


_MAU_DAYS = 28


def q_events_dau_mau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Engagement stickiness per day: DAU, trailing-28-day MAU and the
    DAU/MAU ratio — the growth metric next to rolling WAU
    (events_rolling_wau) but over the monthly horizon.

    Plan: events collapse to distinct (user, day) once; each pair then
    fans into the ≤28 future days it keeps the user 'monthly-active'
    for (bounded ×28 generator, the events_rolling_wau shape — never a
    per-day window over raw events), and one countDistinct per target
    day finishes it. Only days observed in the data are reported.
    """
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_millis("ts") / F.lit(_DAY_MS)).cast("long")
    # r11 (guide §2.4): the |users|×|days|-bounded distinct pair set
    # feeds the day grid, the DAU count AND the ×28 fan-out —
    # uncached, the corpus scan+distinct re-executed 3×
    # (3 FileScans → 1).
    pairs = ev.select("user_id", day.alias("day")).distinct().cache()
    days = pairs.select("day").distinct()
    dau = pairs.groupBy("day").agg(
        F.countDistinct("user_id").alias("dau")
    )
    fan = pairs.select(
        "user_id",
        F.explode(
            F.sequence(F.col("day"), F.col("day") + F.lit(_MAU_DAYS - 1))
        ).alias("day"),
    ).join(days, "day")
    mau = fan.groupBy("day").agg(F.countDistinct("user_id").alias("mau"))
    return (
        dau.join(mau, "day")
        .select(
            "day",
            "dau",
            "mau",
            stable_round(
                F.col("dau").cast("double") / F.col("mau").cast("double"), 6
            ).alias("stickiness"),
        )
    )


ORACLE_DAU_MAU = f"""
WITH pairs AS (
  SELECT DISTINCT user_id, epoch_ms(ts) // {_DAY_MS} AS day FROM events
), days AS (
  SELECT DISTINCT day FROM pairs
), dau AS (
  SELECT day, CAST(count(DISTINCT user_id) AS BIGINT) AS dau
  FROM pairs GROUP BY 1
), fan AS (
  SELECT p.user_id, p.day + o.off AS day
  FROM pairs p, (SELECT unnest(range(0, {_MAU_DAYS})) AS off) o
), mau AS (
  SELECT f.day, CAST(count(DISTINCT f.user_id) AS BIGINT) AS mau
  FROM fan f JOIN days USING (day) GROUP BY 1
)
SELECT CAST(dau.day AS BIGINT) AS day, dau, mau,
       {sql_stable_round("dau::DOUBLE / mau::DOUBLE", 6)} AS stickiness
FROM dau JOIN mau ON dau.day = mau.day
""".strip()


# ------------------------------------------- hour×weekday usage heatmap


def q_metric_hod_dow_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Usage heatmap per metric: event count and mean value for every
    (hour-of-day × day-of-week) cell — the seasonality fingerprint
    behind the seasonal-baseline anomaly detector (anomaly_seasonal).

    Weekday is derived ARITHMETICALLY ((epoch_days + 4) mod 7,
    0 = Sunday; 1970-01-01 was a Thursday) so both engines agree by
    integer construction instead of calendar-function conventions
    (Spark's dayofweek is 1-based Sunday, DuckDB's 0-based). Mean
    values come from exact integer-cent sums. One aggregation over
    the scan; output is a fixed ≤ |metrics|·168 cells.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        (F.unix_millis("ts") / F.lit(_DAY_MS)).cast("long").alias("d"),
        F.pmod(
            (F.unix_millis("ts") / F.lit(3_600_000)).cast("long"), F.lit(24)
        ).alias("hod"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    cells = (
        ev.select(
            "event_type",
            F.pmod(F.col("d") + F.lit(4), F.lit(7)).alias("dow"),
            "hod",
            "e2",
        )
        .groupBy("event_type", "dow", "hod")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("e2").alias("s2"))
    )
    totals = cells.groupBy("event_type").agg(F.sum("n").alias("n_total"))
    return (
        cells.join(F.broadcast(totals), "event_type")
        .select(
            "event_type",
            "dow",
            "hod",
            "n",
            stable_round(
                F.col("s2").cast("double")
                / (F.col("n").cast("double") * F.lit(100.0)),
                4,
            ).alias("avg_value"),
            stable_round(
                F.col("n").cast("double") / F.col("n_total").cast("double"), 6
            ).alias("share"),
        )
    )


ORACLE_HOD_DOW = f"""
WITH e AS (
  SELECT event_type,
         (epoch_ms(ts) // {_DAY_MS} + 4) % 7 AS dow,
         (epoch_ms(ts) // 3600000) % 24 AS hod,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS e2
  FROM events
), cells AS (
  SELECT event_type, dow, hod, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(e2) AS BIGINT) AS s2
  FROM e GROUP BY 1, 2, 3
), t AS (
  SELECT event_type, CAST(sum(n) AS BIGINT) AS n_total
  FROM cells GROUP BY 1
)
SELECT cells.event_type, CAST(dow AS BIGINT) AS dow,
       CAST(hod AS BIGINT) AS hod, n,
       {sql_stable_round("s2::DOUBLE / (n::DOUBLE * 100.0::DOUBLE)", 4)}
         AS avg_value,
       {sql_stable_round("n::DOUBLE / n_total::DOUBLE", 6)} AS share
FROM cells JOIN t USING (event_type)
""".strip()


# --------------------------------------------------- IQR outlier audit


def q_quality_iqr_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Tukey-fence audit of document length: Q1/Q3/IQR on
    n_chars, 1.5·IQR fences, and the count/fraction of docs outside
    them — the distribution-drift gate before a corpus refresh lands.

    Plan: one small per-source quantile aggregate (exact interpolated
    percentiles over BIGINT inputs — identical doubles on both
    engines, the funnel_time_to_convert precedent), broadcast back
    onto the scan for the outlier count. Two passes over documents,
    zero wide shuffles.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("n_chars")
    )
    fences = docs.groupBy("source").agg(
        F.percentile(F.col("n_chars"), F.lit(0.25)).alias("q1"),
        F.percentile(F.col("n_chars"), F.lit(0.75)).alias("q3"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    lo = F.col("q1") - F.lit(1.5) * (F.col("q3") - F.col("q1"))
    hi = F.col("q3") + F.lit(1.5) * (F.col("q3") - F.col("q1"))
    out = (
        docs.join(F.broadcast(fences), "source")
        .groupBy("source")
        .agg(
            F.first("q1").alias("q1"),
            F.first("q3").alias("q3"),
            F.first("n_docs").alias("n_docs"),
            F.sum(
                (
                    (F.col("n_chars").cast("double") < lo)
                    | (F.col("n_chars").cast("double") > hi)
                ).cast("long")
            ).alias("n_outliers"),
        )
    )
    return out.select(
        "source",
        "n_docs",
        stable_round(F.col("q1"), 4).alias("q1"),
        stable_round(F.col("q3"), 4).alias("q3"),
        stable_round(F.col("q3") - F.col("q1"), 4).alias("iqr"),
        F.col("n_outliers"),
        stable_round(
            F.col("n_outliers").cast("double") / F.col("n_docs").cast("double"),
            6,
        ).alias("outlier_frac"),
    )


ORACLE_IQR_OUTLIERS = f"""
WITH f AS (
  SELECT source, quantile_cont(n_chars, 0.25) AS q1,
         quantile_cont(n_chars, 0.75) AS q3,
         CAST(count(*) AS BIGINT) AS n_docs
  FROM documents GROUP BY 1
), o AS (
  SELECT d.source, CAST(count(*) FILTER (WHERE
           d.n_chars::DOUBLE < f.q1 - 1.5 * (f.q3 - f.q1)
           OR d.n_chars::DOUBLE > f.q3 + 1.5 * (f.q3 - f.q1))
         AS BIGINT) AS n_outliers
  FROM documents d JOIN f USING (source) GROUP BY 1
)
SELECT f.source, n_docs,
       {sql_stable_round("q1", 4)} AS q1,
       {sql_stable_round("q3", 4)} AS q3,
       {sql_stable_round("q3 - q1", 4)} AS iqr,
       n_outliers,
       {sql_stable_round("n_outliers::DOUBLE / n_docs::DOUBLE", 6)}
         AS outlier_frac
FROM f JOIN o USING (source)
""".strip()


# ----------------------------------------------------- open-order aging


def q_orders_open_aging(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order aging report: orders not yet finished ('F') bucketed
    by age as of the dataset frontier (max order date), per priority —
    the operational backlog view every order pipeline runs.

    Plan: the as-of frontier is a broadcast 1-row aggregate riding the
    plan (no driver collect); buckets are pure integer arithmetic;
    money sums are exact BIGINT cents.
    """
    orders = load_table(spark, sf_dir, "orders")
    frontier = orders.agg(
        F.max(F.to_date("o_orderdate")).alias("as_of")
    )
    age = F.datediff(F.col("as_of"), F.to_date("o_orderdate"))
    bucket = (
        F.when(age <= 30, F.lit("0-30"))
        .when(age <= 90, F.lit("31-90"))
        .when(age <= 365, F.lit("91-365"))
        .otherwise(F.lit("365+"))
    )
    return (
        orders.filter(F.col("o_orderstatus") != "F")
        .crossJoin(F.broadcast(frontier))
        .groupBy(
            F.col("o_orderpriority").alias("priority"),
            bucket.alias("age_bucket"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("long")
            ).alias("cents"),
        )
        .select(
            "priority",
            "age_bucket",
            "n_orders",
            stable_round(F.col("cents").cast("double") / F.lit(100.0), 2)
            .alias("open_value"),
        )
    )


ORACLE_OPEN_AGING = f"""
WITH f AS (
  SELECT max(CAST(o_orderdate AS DATE)) AS as_of FROM orders
), b AS (
  SELECT o_orderpriority AS priority,
         CASE
           WHEN date_diff('day', CAST(o_orderdate AS DATE), f.as_of) <= 30
             THEN '0-30'
           WHEN date_diff('day', CAST(o_orderdate AS DATE), f.as_of) <= 90
             THEN '31-90'
           WHEN date_diff('day', CAST(o_orderdate AS DATE), f.as_of) <= 365
             THEN '91-365'
           ELSE '365+'
         END AS age_bucket,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
  FROM orders, f WHERE o_orderstatus <> 'F'
)
SELECT priority, age_bucket, CAST(count(*) AS BIGINT) AS n_orders,
       {sql_stable_round("sum(cents)::DOUBLE / 100.0::DOUBLE", 2)}
         AS open_value
FROM b GROUP BY 1, 2
""".strip()


# -------------------------------------------------- embedding norm audit


def q_embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-quality audit per label: L2-norm distribution (mean,
    sample stddev, min, max) — collapsed/exploded vectors are the
    classic silent failure of an embedding job, and the norm histogram
    catches both before similarity math consumes them.

    Numerics: the per-vector norm is a sequential fold over the
    float32 dims (identical doubles both engines, the explicit
    list_reduce ≡ F.aggregate shape), then fixed-pointed to BIGINT
    micro-units so the per-label moment sums are exact integers — the
    agg_stddev determinism pattern; no order-sensitive double sums.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    norm = F.sqrt(
        F.aggregate(
            "embedding",
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )
    )
    nf = F.floor(norm * F.lit(1_000_000.0) + F.lit(0.5)).cast("long")
    stats = (
        emb.select("label", nf.alias("nf"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("nf").alias("s1"),
            F.sum(F.col("nf") * F.col("nf")).alias("s2"),
            F.min("nf").alias("mn"),
            F.max("nf").alias("mx"),
        )
    )
    mean = F.col("s1").cast("double") / (
        F.col("n").cast("double") * F.lit(1e6)
    )
    var = (
        (
            F.col("n").cast("double") * F.col("s2").cast("double")
            - F.col("s1").cast("double") * F.col("s1").cast("double")
        )
        / (
            F.col("n").cast("double")
            * (F.col("n") - F.lit(1)).cast("double")
            * F.lit(1e12)
        )
    )
    return stats.filter(F.col("n") > 1).select(
        "label",
        "n",
        stable_round(mean, 6).alias("mean_norm"),
        stable_round(F.sqrt(var), 6).alias("std_norm"),
        stable_round(F.col("mn").cast("double") / F.lit(1e6), 6).alias(
            "min_norm"
        ),
        stable_round(F.col("mx").cast("double") / F.lit(1e6), 6).alias(
            "max_norm"
        ),
    )


ORACLE_NORM_STATS = f"""
WITH n AS (
  SELECT label,
         CAST(floor(sqrt(list_reduce(list_prepend(0.0::DOUBLE,
                list_transform(embedding,
                               x -> x::DOUBLE * x::DOUBLE)),
              (a, v) -> a + v)) * 1000000.0::DOUBLE + 0.5::DOUBLE)
           AS BIGINT) AS nf
  FROM embeddings
), s AS (
  SELECT label, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(nf) AS BIGINT) AS s1,
         CAST(sum(nf * nf) AS BIGINT) AS s2,
         CAST(min(nf) AS BIGINT) AS mn, CAST(max(nf) AS BIGINT) AS mx
  FROM n GROUP BY 1
)
SELECT CAST(label AS INT) AS label, n,
       {sql_stable_round("s1::DOUBLE / (n::DOUBLE * 1000000.0::DOUBLE)", 6)}
         AS mean_norm,
       {sql_stable_round(
           "sqrt((n::DOUBLE * s2::DOUBLE - s1::DOUBLE * s1::DOUBLE)"
           " / (n::DOUBLE * (n - 1)::DOUBLE * 1000000000000.0::DOUBLE))", 6)}
         AS std_norm,
       {sql_stable_round("mn::DOUBLE / 1000000.0::DOUBLE", 6)} AS min_norm,
       {sql_stable_round("mx::DOUBLE / 1000000.0::DOUBLE", 6)} AS max_norm
FROM s WHERE n > 1
""".strip()


# --------------------------------------------- inter-arrival regularity


_MIN_EVENTS_CV = 5


def q_events_interarrival_cv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user inter-event regularity: mean gap and coefficient of
    variation over consecutive-event gaps — CV near 0 means metronomic
    (bot-like) traffic, CV ≈ 1 is Poisson-random human arrivals. The
    behavioral-abuse signal next to events_markov.

    Plan: one per-user ordered window (lag) produces integer gap
    seconds; ties broken by event_id so both engines pick the same
    neighbor; moments are exact BIGINT sums (gaps are ≤ ~1e6 s, so
    Σgap² stays far under int64). Users below 5 events
    are excluded — CV over 2-3 gaps is noise.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").asc(), F.col("event_id").asc()
    )
    gaps = (
        ev.select(
            "user_id",
            "ts",
            "event_id",
            F.lag(F.unix_micros("ts")).over(w).alias("prev_us"),
            F.unix_micros("ts").alias("us"),
        )
        .filter(F.col("prev_us").isNotNull())
        .select(
            "user_id",
            F.floor((F.col("us") - F.col("prev_us")) / F.lit(1_000_000))
            .cast("long")
            .alias("gap_s"),
        )
    )
    stats = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_gaps"),
        F.sum("gap_s").alias("s1"),
        F.sum(F.col("gap_s") * F.col("gap_s")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.col("n_gaps").cast("double")
    var = (
        F.col("n_gaps").cast("double") * F.col("s2").cast("double")
        - F.col("s1").cast("double") * F.col("s1").cast("double")
    ) / (
        F.col("n_gaps").cast("double")
        * (F.col("n_gaps") - F.lit(1)).cast("double")
    )
    cv = F.sqrt(var) / mean
    return stats.filter(
        (F.col("n_gaps") >= F.lit(_MIN_EVENTS_CV)) & (F.col("s1") > 0)
    ).select(
        "user_id",
        "n_gaps",
        stable_round(mean, 4).alias("mean_gap_s"),
        stable_round(cv, 4).alias("cv"),
        (cv < F.lit(0.1)).alias("is_metronomic"),
    )


ORACLE_INTERARRIVAL = f"""
WITH g AS (
  SELECT user_id,
         CAST(floor((epoch_us(ts) - lag(epoch_us(ts)) OVER
             (PARTITION BY user_id ORDER BY ts, event_id))
           / 1000000) AS BIGINT) AS gap_s
  FROM events
), s AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_gaps,
         CAST(sum(gap_s) AS BIGINT) AS s1,
         CAST(sum(gap_s * gap_s) AS BIGINT) AS s2
  FROM g WHERE gap_s IS NOT NULL GROUP BY 1
)
SELECT user_id, n_gaps,
       {sql_stable_round("s1::DOUBLE / n_gaps::DOUBLE", 4)} AS mean_gap_s,
       {sql_stable_round(
           "sqrt((n_gaps::DOUBLE * s2::DOUBLE - s1::DOUBLE * s1::DOUBLE)"
           " / (n_gaps::DOUBLE * (n_gaps - 1)::DOUBLE))"
           " / (s1::DOUBLE / n_gaps::DOUBLE)", 4)} AS cv,
       sqrt((n_gaps::DOUBLE * s2::DOUBLE - s1::DOUBLE * s1::DOUBLE)
            / (n_gaps::DOUBLE * (n_gaps - 1)::DOUBLE))
         / (s1::DOUBLE / n_gaps::DOUBLE) < 0.1 AS is_metronomic
FROM s WHERE n_gaps >= {_MIN_EVENTS_CV} AND s1 > 0
""".strip()


# ------------------------------------------------- hapax / vocab health


def q_text_hapax_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary health: vocabulary size, hapax-legomenon
    count (tokens occurring exactly once within the source), hapax
    ratio and type-token ratio — a flat hapax tail flags template spam
    or deduplication failures; an inflated one flags OCR noise.

    Plan: explode → per-(source, token) counts (the exchange carries
    8-byte xxhash64 token keys, never strings) → per-source summary.
    Bounded by per-source vocabulary, not corpus size.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select(
        "source",
        F.explode(F.split(F.col("text"), " ")).alias("token"),
    ).select("source", F.xxhash64("token").alias("tok"))
    counts = toks.groupBy("source", "tok").agg(
        F.count(F.lit(1)).alias("c")
    )
    out = counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum((F.col("c") == 1).cast("long")).alias("hapax"),
        F.sum("c").alias("n_tokens"),
    )
    return out.select(
        "source",
        "vocab",
        "hapax",
        "n_tokens",
        stable_round(
            F.col("hapax").cast("double") / F.col("vocab").cast("double"), 6
        ).alias("hapax_ratio"),
        stable_round(
            F.col("vocab").cast("double") / F.col("n_tokens").cast("double"),
            6,
        ).alias("type_token_ratio"),
    )


ORACLE_HAPAX = f"""
WITH toks AS (
  SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
), c AS (
  SELECT source, token, CAST(count(*) AS BIGINT) AS c
  FROM toks GROUP BY 1, 2
), s AS (
  SELECT source, CAST(count(*) AS BIGINT) AS vocab,
         CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM c GROUP BY 1
)
SELECT source, vocab, hapax, n_tokens,
       {sql_stable_round("hapax::DOUBLE / vocab::DOUBLE", 6)}
         AS hapax_ratio,
       {sql_stable_round("vocab::DOUBLE / n_tokens::DOUBLE", 6)}
         AS type_token_ratio
FROM s
""".strip()


# ------------------------------------------------ bigram LM doc scoring


_BIGRAM_K = 0.5


def q_text_bigram_logprob(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit BIGRAM log-probability per document with add-k
    smoothing — the next step up from text_unigram_logprob toward the
    CCNet LM-perplexity filter: word-salad docs that pass the unigram
    gate (right words, wrong order) score low here.

    p(w2|w1) = (c(w1 w2) + k) / (c(w1 ·) + k·V), k = 0.5,
    V = corpus vocabulary. Plan: one exploded-bigram aggregation fits
    the model (vocabulary-bounded); scoring joins each doc's bigrams
    against the broadcast-scale count tables. Determinism: each
    bigram's log-prob is fixed-pointed to BIGINT micro-nats BEFORE the
    per-doc sum, so document scores are exact integer sums — no
    order-sensitive double accumulation (the lesson series_ext's shape
    search relearned this round).
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] as w1, concat(t[i], ' ', t[i+1]) as bg))"
            )
        ).alias("p"),
    ).select("doc_id", F.col("p.w1").alias("w1"), F.col("p.bg").alias("bg"))

    # r11: materialize the vocabulary-bounded bigram counts once and
    # derive the w1 marginal from THEM (sum of c_bg per leading token
    # — the same multiset, since tokens never contain the split char)
    # instead of a second corpus-sized explode+aggregate.
    bg_counts = bigrams.groupBy("bg").agg(
        F.count(F.lit(1)).alias("c_bg")
    ).cache()
    w1_counts = bg_counts.groupBy(
        F.split(F.col("bg"), " ").getItem(0).alias("w1")
    ).agg(F.sum("c_bg").alias("c_w1"))
    vocab_n = (
        docs.select(F.explode(F.split(F.col("text"), " ")).alias("token"))
        .agg(F.countDistinct("token").alias("v"))
    )
    lp = (
        bg_counts.join(
            w1_counts,
            F.split(F.col("bg"), " ").getItem(0) == F.col("w1"),
        )
        .crossJoin(F.broadcast(vocab_n))
        .select(
            "bg",
            F.floor(
                F.log(
                    (F.col("c_bg").cast("double") + F.lit(_BIGRAM_K))
                    / (
                        F.col("c_w1").cast("double")
                        + F.lit(_BIGRAM_K) * F.col("v").cast("double")
                    )
                )
                * F.lit(1_000_000.0)
            ).cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        bigrams.join(lp, "bg")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            stable_round(
                F.col("s").cast("double")
                / (F.col("n_bigrams").cast("double") * F.lit(1e6)),
                4,
            ).alias("avg_logprob"),
        )
    )


ORACLE_BIGRAM_LOGPROB = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), bg AS (
  SELECT doc_id, t[i] AS w1, t[i] || ' ' || t[i + 1] AS b
  FROM toks, unnest(range(1, len(t))) AS u(i)
), cb AS (
  SELECT b, CAST(count(*) AS BIGINT) AS c_bg FROM bg GROUP BY 1
), cw AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c_w1 FROM bg GROUP BY 1
), v AS (
  SELECT CAST(count(DISTINCT token) AS BIGINT) AS v FROM (
    SELECT unnest(string_split(text, ' ')) AS token FROM documents)
), lp AS (
  SELECT cb.b,
         CAST(floor(ln((c_bg::DOUBLE + {_BIGRAM_K})
                       / (c_w1::DOUBLE + {_BIGRAM_K} * v.v::DOUBLE))
                    * 1000000.0::DOUBLE) AS BIGINT) AS lp_micro
  FROM cb JOIN cw ON string_split(cb.b, ' ')[1] = cw.w1, v
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       {sql_stable_round(
           "sum(lp_micro)::DOUBLE / (count(*)::DOUBLE * 1000000.0::DOUBLE)",
           4)} AS avg_logprob
FROM bg JOIN lp ON bg.b = lp.b
GROUP BY doc_id
""".strip()


def q_events_ab_srm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLE-RATIO-MISMATCH guardrail per day (r9 — the first check
    every experimentation platform runs BEFORE reading any metric:
    Fabijan et al. 2019 report most corrupted experiments are caught
    here): the deterministic user_id-mod-2 split is designed 50/50,
    so the daily unique-user counts per arm must match a binomial —
    the χ²(1 df) statistic (n₀−E)²/E + (n₁−E)²/E with E = N/2 flags
    days where assignment, logging, or bot filtering broke one arm.
    A significant z-test on a day with SRM is NOISE, not a result —
    this row is the gate the other four A/B rows (z, CUPED, DiD,
    power/MDE) must pass through.

    Exactness: counts are exact BIGINTs; χ² = (n₀−n₁)²/N is one
    division of exact integers (algebraically identical to the
    two-cell form at E = N/2); the 3.841459 flag is the shared
    χ²₁ 95% literal.
    """
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_millis("ts") / F.lit(_DAY_MS)).cast("long")
    users = ev.select(
        day.alias("day"),
        F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
        "user_id",
    ).distinct()
    daily = users.groupBy("day").agg(
        F.sum((F.col("variant") == 0).cast("long")).alias("n0"),
        F.sum((F.col("variant") == 1).cast("long")).alias("n1"),
    )
    d = F.col("n0") - F.col("n1")
    chi2 = (d * d).cast("double") / (
        F.col("n0") + F.col("n1")
    ).cast("double")
    return daily.select(
        "day",
        "n0",
        "n1",
        stable_round(chi2, 4).alias("chi2"),
        (chi2 > F.lit(3.841459)).alias("srm_detected"),
    )


ORACLE_AB_SRM = f"""
WITH u AS (
  SELECT DISTINCT epoch_ms(ts) // {_DAY_MS} AS day,
         CAST(user_id % 2 AS INT) AS variant, user_id
  FROM events
), d AS (
  SELECT day,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n1
  FROM u GROUP BY 1
)
SELECT CAST(day AS BIGINT) AS day, n0, n1,
       {sql_stable_round(
           "CAST((n0 - n1) * (n0 - n1) AS DOUBLE)"
           " / CAST(n0 + n1 AS DOUBLE)", 4)} AS chi2,
       (CAST((n0 - n1) * (n0 - n1) AS DOUBLE)
        / CAST(n0 + n1 AS DOUBLE)) > 3.841459 AS srm_detected
FROM d
""".strip()


_KN_D = 0.75  # absolute discount (the standard Kneser-Ney setting)


def q_text_kneser_ney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-fit INTERPOLATED KNESER-NEY bigram scoring per doc
    (Kneser & Ney 1995; Chen & Goodman 1999's interpolated form) —
    the principled smoothing beside `text_bigram_logprob`'s add-k:
    mass discounted from observed bigrams is redistributed by the
    CONTINUATION probability (how many distinct histories a word
    follows), the fix for add-k's famous "San Francisco" failure
    (frequent-but-one-history words stop leaking probability).

        P(w₂|w₁) = (c(w₁w₂) − D)/c(w₁·)
                   + (D·N₁₊(w₁·)/c(w₁·)) · N₁₊(·w₂)/B

    with D = {_KN_D}, N₁₊ the distinct-continuation counts and B the
    distinct bigram types. Corpus-fit scoring means every scored
    bigram is observed (c ≥ 1 > D — no clamp branch).

    Determinism: all counts exact BIGINT; each distinct bigram's
    log-prob evaluates the identical double tree in both engines and
    fixes to micro-nats BEFORE the per-doc integer sum.

    Scale: the model tables are vocabulary-/bigram-type-bounded
    aggregations with map-side partials; scoring is one join of the
    doc-bigram relation against the model keyed by the bigram."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select(
        "doc_id", F.split(F.col("text"), " ").alias("t")
    ).filter(F.size("t") >= 2)
    bigrams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(t) - 2),"
                " i -> struct(t[i] as w1, t[i+1] as w2))"
            )
        ).alias("p"),
    ).select(
        "doc_id", F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    # r11: materialize the bigram-type counts once (they feed four
    # consumers) and derive the history marginal from THEM (sum of
    # c_bg per w1 — the identical multiset) instead of a second
    # corpus-sized explode+aggregate.
    cb = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c_bg")
    ).cache()
    cw = cb.groupBy("w1").agg(F.sum("c_bg").alias("c_w1"))
    nw1 = cb.groupBy("w1").agg(F.count(F.lit(1)).alias("n_w1"))
    nw2 = cb.groupBy("w2").agg(F.count(F.lit(1)).alias("n_w2"))
    btypes = cb.agg(F.count(F.lit(1)).alias("bt"))
    p = (
        (F.col("c_bg").cast("double") - F.lit(_KN_D))
        / F.col("c_w1").cast("double")
        + (
            F.lit(_KN_D)
            * F.col("n_w1").cast("double")
            / F.col("c_w1").cast("double")
        )
        * (F.col("n_w2").cast("double") / F.col("bt").cast("double"))
    )
    lp = (
        cb.join(cw, "w1")
        .join(nw1, "w1")
        .join(nw2, "w2")
        .crossJoin(F.broadcast(btypes))
        .select(
            "w1",
            "w2",
            F.floor(F.log(p) * F.lit(1_000_000.0))
            .cast("long")
            .alias("lp_micro"),
        )
    )
    return (
        bigrams.join(lp, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.sum("lp_micro").alias("s"),
        )
        .select(
            "doc_id",
            "n_bigrams",
            stable_round(
                F.col("s").cast("double")
                / (F.col("n_bigrams").cast("double") * F.lit(1e6)),
                4,
            ).alias("avg_logprob_kn"),
        )
    )


ORACLE_KNESER_NEY = f"""
WITH toks AS (
  SELECT doc_id, string_split(text, ' ') AS t FROM documents
  WHERE len(string_split(text, ' ')) >= 2
), bg AS (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
), cb AS (
  SELECT w1, w2, CAST(count(*) AS BIGINT) AS c_bg
  FROM bg GROUP BY 1, 2
), cw AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS c_w1 FROM bg GROUP BY 1
), n1 AS (
  SELECT w1, CAST(count(*) AS BIGINT) AS n_w1 FROM cb GROUP BY 1
), n2 AS (
  SELECT w2, CAST(count(*) AS BIGINT) AS n_w2 FROM cb GROUP BY 1
), bt AS (
  SELECT CAST(count(*) AS BIGINT) AS bt FROM cb
), lp AS (
  SELECT cb.w1, cb.w2,
         CAST(floor(ln(
           (CAST(c_bg AS DOUBLE) - {_KN_D}) / CAST(c_w1 AS DOUBLE)
           + ({_KN_D} * CAST(n_w1 AS DOUBLE) / CAST(c_w1 AS DOUBLE))
             * (CAST(n_w2 AS DOUBLE) / CAST(bt.bt AS DOUBLE))
         ) * 1000000.0) AS BIGINT) AS lp_micro
  FROM cb JOIN cw USING (w1) JOIN n1 USING (w1)
       JOIN n2 USING (w2), bt
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       {sql_stable_round(
           "sum(lp_micro)::DOUBLE"
           " / (count(*)::DOUBLE * 1000000.0::DOUBLE)", 4)}
         AS avg_logprob_kn
FROM bg JOIN lp USING (w1, w2)
GROUP BY doc_id
""".strip()


# ------------------------------------------------- SLO error budget


_SLO_TARGET_GOOD = 0.99


def q_metric_slo_error_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SLO error-budget accounting per metric over the dataset span:
    hourly windows are 'good' when their mean value stays within 1.2×
    the metric's overall mean; with a 99% objective
    the budget is 1% of windows, and the report shows consumed vs
    remaining — the monthly-review view the two-window burn-rate alert
    (metric_burn_rate) escalates into.

    Determinism: 'good' is decided by exact integer cross-
    multiplication (window_sum·overall_n·10 ≤ 12·window_n·overall_sum)
    — no double thresholds anywhere near the branch; only the final
    report fractions are doubles.
    """
    ev = load_table(spark, sf_dir, "events").select(
        F.col("event_type").alias("name"),
        (F.unix_millis("ts") / F.lit(3_600_000)).cast("long").alias("h"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    hourly = ev.groupBy("name", "h").agg(
        F.sum("e2").alias("ws"), F.count(F.lit(1)).alias("wn")
    )
    overall = hourly.groupBy("name").agg(
        F.sum("ws").alias("os"), F.sum("wn").alias("on")
    )
    j = hourly.join(F.broadcast(overall), "name")
    bad = (
        F.col("ws") * F.col("on") * F.lit(10)
        > F.lit(12) * F.col("wn") * F.col("os")
    ).cast("long")
    rep = j.groupBy("name").agg(
        F.count(F.lit(1)).alias("n_windows"),
        F.sum(bad).alias("n_bad"),
    )
    budget = F.col("n_windows").cast("double") * F.lit(
        1.0 - _SLO_TARGET_GOOD
    )
    return rep.select(
        "name",
        "n_windows",
        "n_bad",
        stable_round(budget, 4).alias("budget_windows"),
        stable_round(
            F.col("n_bad").cast("double") / budget, 4
        ).alias("budget_consumed"),
        (F.col("n_bad").cast("double") > budget).alias("exhausted"),
    )


ORACLE_SLO_BUDGET = f"""
WITH h AS (
  SELECT event_type AS name, epoch_ms(ts) // 3600000 AS h,
         CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS ws,
         CAST(count(*) AS BIGINT) AS wn
  FROM events GROUP BY 1, 2
), o AS (
  SELECT name, CAST(sum(ws) AS BIGINT) AS os, CAST(sum(wn) AS BIGINT) AS onn
  FROM h GROUP BY 1
), r AS (
  SELECT h.name, CAST(count(*) AS BIGINT) AS n_windows,
         CAST(sum(CASE WHEN ws * onn * 10 > 12 * wn * os
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_bad
  FROM h JOIN o USING (name) GROUP BY 1
)
SELECT name, n_windows, n_bad,
       {sql_stable_round(
           f"n_windows::DOUBLE * {1.0 - _SLO_TARGET_GOOD}", 4)}
         AS budget_windows,
       {sql_stable_round(
           f"n_bad::DOUBLE / (n_windows::DOUBLE * {1.0 - _SLO_TARGET_GOOD})",
           4)} AS budget_consumed,
       n_bad::DOUBLE > n_windows::DOUBLE * {1.0 - _SLO_TARGET_GOOD}
         AS exhausted
FROM r
""".strip()


# -------------------------------------------- dedup cluster histogram


def q_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup QA readout: the cluster-SIZE histogram of the exact
    pair graph's connected components — how much of the duplication is
    pairs vs. giant template families decides whether canonical-keep
    or cluster-cap is the right removal policy. Runs the same
    large-star/small-star components as dedup_clusters, then one tiny
    aggregate; the oracle extends the recursive-CTE closure."""
    from monasca_aggregator_spark.operators import dedup as D
    from monasca_aggregator_spark.plans.dedup import THRESHOLD

    pairs = D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents", fan_out=True),
        threshold=THRESHOLD,
    )
    comp = D.connected_components(pairs)
    sizes = comp.groupBy("cluster_id").agg(
        F.count(F.lit(1)).alias("size")
    )
    return (
        sizes.groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_clusters"))
        .select(
            "size",
            "n_clusters",
            (F.col("size") * F.col("n_clusters")).alias("n_docs"),
        )
    )


def _cluster_sizes_oracle() -> str:
    from monasca_aggregator_spark.plans.dedup import _NGRAM_CTES

    return f"""
WITH RECURSIVE {_NGRAM_CTES}, und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(src, dst) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
), labels AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
), csz AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS size
  FROM labels GROUP BY 1
)
SELECT size, CAST(count(*) AS BIGINT) AS n_clusters,
       CAST(size * count(*) AS BIGINT) AS n_docs
FROM csz GROUP BY size
""".strip()


# ------------------------------------------------- session bounce rate


def q_sessions_bounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-analytics staple per session-start day: session count,
    bounce rate (single-event sessions) and mean session depth — the
    daily rollup on top of the gap sessionizer. Counts are exact
    BIGINTs; only the two report ratios are doubles."""
    from monasca_aggregator_spark.operators.asof import sessionize
    from monasca_aggregator_spark.plans.temporal import SESSION_GAP

    ev = load_table(spark, sf_dir, "events")
    sess = sessionize(ev, ["user_id"], gap=SESSION_GAP)
    day = (F.col("session_start_ms") / F.lit(_DAY_MS)).cast("long")
    rep = sess.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum((F.col("n_events") == 1).cast("long")).alias("n_bounce"),
        F.sum("n_events").alias("total_events"),
    )
    return rep.select(
        "day",
        "n_sessions",
        "n_bounce",
        stable_round(
            F.col("n_bounce").cast("double")
            / F.col("n_sessions").cast("double"),
            6,
        ).alias("bounce_rate"),
        stable_round(
            F.col("total_events").cast("double")
            / F.col("n_sessions").cast("double"),
            4,
        ).alias("avg_depth"),
    )


def _bounce_oracle() -> str:
    from monasca_aggregator_spark.plans.temporal import _GAP_SQL

    return f"""
WITH marked AS (
  SELECT user_id, ts,
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
), sess AS (
  SELECT user_id, session_id, epoch_ms(min(ts)) AS start_ms,
         CAST(count(*) AS BIGINT) AS n_events
  FROM numbered GROUP BY 1, 2
), rep AS (
  SELECT start_ms // {_DAY_MS} AS day,
         CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_bounce,
         CAST(sum(n_events) AS BIGINT) AS total_events
  FROM sess GROUP BY 1
)
SELECT CAST(day AS BIGINT) AS day, n_sessions, n_bounce,
       {sql_stable_round("n_bounce::DOUBLE / n_sessions::DOUBLE", 6)}
         AS bounce_rate,
       {sql_stable_round("total_events::DOUBLE / n_sessions::DOUBLE", 4)}
         AS avg_depth
FROM rep
""".strip()


# -------------------------------------------- repeat-purchase rate


def q_orders_repeat_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer repeat-purchase accounting per order month: how many
    orders come from customers with an earlier order, and how many new
    customers arrive — the acquisition-vs-retention revenue split.
    One per-customer ordered window (row_number, (date, orderkey)
    tie-break identical on both engines); month is integer
    year·100+month arithmetic on the date."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date("o_orderdate").alias("d"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("d").asc(), F.col("o_orderkey").asc()
    )
    seq = orders.withColumn("rn", F.row_number().over(w))
    month = (F.year("d") * F.lit(100) + F.month("d")).cast("long")
    rep = seq.groupBy(month.alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum((F.col("rn") > 1).cast("long")).alias("n_repeat"),
        F.sum((F.col("rn") == 1).cast("long")).alias("n_new_customers"),
    )
    return rep.select(
        "month",
        "n_orders",
        "n_repeat",
        "n_new_customers",
        stable_round(
            F.col("n_repeat").cast("double")
            / F.col("n_orders").cast("double"),
            6,
        ).alias("repeat_rate"),
    )


ORACLE_REPEAT_RATE = f"""
WITH seq AS (
  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d, o_orderkey,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
           AS rn
  FROM orders
), rep AS (
  SELECT CAST(year(d) * 100 + month(d) AS BIGINT) AS month,
         CAST(count(*) AS BIGINT) AS n_orders,
         CAST(sum(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repeat,
         CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_new_customers
  FROM seq GROUP BY 1
)
SELECT month, n_orders, n_repeat, n_new_customers,
       {sql_stable_round("n_repeat::DOUBLE / n_orders::DOUBLE", 6)}
         AS repeat_rate
FROM rep
""".strip()


# ----------------------------------------- Markov top-1 accuracy eval


def q_events_markov_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine model evaluation: top-1 accuracy of the first-order
    Markov next-event model (events_markov) measured in-sample — per
    source state, the fraction of transitions the argmax prediction
    gets right. The eval-inside-the-pipeline pattern: no data leaves
    the engine to score a model the engine fitted.

    Argmax tie-break is (count desc, to_type asc) on both engines;
    accuracy = exact-integer n_correct / n_from.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    pick = Window.partitionBy("from_type").orderBy(
        F.col("n").desc(), F.col("to_type").asc()
    )
    ranked = trans.withColumn("rk", F.row_number().over(pick))
    totals = trans.groupBy("from_type").agg(F.sum("n").alias("n_from"))
    best = ranked.filter(F.col("rk") == 1).select(
        "from_type",
        F.col("to_type").alias("predicted_next"),
        F.col("n").alias("n_correct"),
    )
    return (
        best.join(totals, "from_type")
        .select(
            "from_type",
            "predicted_next",
            F.col("n_from").cast("long").alias("n_from"),
            F.col("n_correct").cast("long").alias("n_correct"),
            stable_round(
                F.col("n_correct").cast("double")
                / F.col("n_from").cast("double"),
                6,
            ).alias("top1_accuracy"),
        )
    )


ORACLE_MARKOV_ACCURACY = f"""
WITH t AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
), p AS (
  SELECT event_type AS from_type, next_type AS to_type,
         CAST(count(*) AS BIGINT) AS n
  FROM t WHERE next_type IS NOT NULL GROUP BY 1, 2
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY from_type
                               ORDER BY n DESC, to_type ASC) AS rk
  FROM p
), tot AS (
  SELECT from_type, CAST(sum(n) AS BIGINT) AS n_from FROM p GROUP BY 1
)
SELECT r.from_type, r.to_type AS predicted_next, tot.n_from,
       r.n AS n_correct,
       {sql_stable_round("r.n::DOUBLE / tot.n_from::DOUBLE", 6)}
         AS top1_accuracy
FROM ranked r JOIN tot USING (from_type) WHERE r.rk = 1
""".strip()


# ---------------------------------------- dedup token-impact report


def q_corpus_dedup_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation impact statement per source: documents and whitespace
    tokens before vs after canonical near-dup removal — the number a
    training-mix owner actually asks for ('how many tokens does this
    policy cost me?'). Composition of the existing pair→component→
    anti-join pipeline with a per-source token account; the removed
    set stays broadcast-sized (bounded by duplicates)."""
    from monasca_aggregator_spark.operators import dedup as D
    from monasca_aggregator_spark.plans.dedup import THRESHOLD

    docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("long").alias("n_tok"),
        "text",
    )
    pairs = D.ngram_jaccard_pairs(docs, threshold=THRESHOLD)
    comp = D.connected_components(pairs)
    removed = comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    flagged = docs.join(
        F.broadcast(removed.withColumn("rm", F.lit(1))), "doc_id", "left"
    )
    rep = flagged.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs_before"),
        F.sum((F.col("rm").isNull()).cast("long")).alias("docs_after"),
        F.sum("n_tok").alias("tokens_before"),
        F.sum(
            F.when(F.col("rm").isNull(), F.col("n_tok")).otherwise(F.lit(0))
        ).alias("tokens_after"),
    )
    return rep.select(
        "source",
        "docs_before",
        "docs_after",
        "tokens_before",
        "tokens_after",
        stable_round(
            (F.col("tokens_before") - F.col("tokens_after")).cast("double")
            / F.col("tokens_before").cast("double"),
            6,
        ).alias("token_removal_frac"),
    )


def _dedup_impact_oracle() -> str:
    from monasca_aggregator_spark.plans.dedup import _NGRAM_CTES

    return f"""
WITH RECURSIVE {_NGRAM_CTES}, und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(src, dst) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
), labels AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
), removed AS (
  SELECT doc_id FROM labels WHERE doc_id <> cluster_id
), d AS (
  SELECT doc_id, source,
         CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok,
         doc_id IN (SELECT doc_id FROM removed) AS rm
  FROM documents
), rep AS (
  SELECT source, CAST(count(*) AS BIGINT) AS docs_before,
         CAST(sum(CASE WHEN NOT rm THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_after,
         CAST(sum(n_tok) AS BIGINT) AS tokens_before,
         CAST(sum(CASE WHEN NOT rm THEN n_tok ELSE 0 END) AS BIGINT)
           AS tokens_after
  FROM d GROUP BY 1
)
SELECT source, docs_before, docs_after, tokens_before, tokens_after,
       {sql_stable_round(
           "(tokens_before - tokens_after)::DOUBLE / tokens_before::DOUBLE",
           6)} AS token_removal_frac
FROM rep
""".strip()


# ------------------------------------- embedding anisotropy histogram


_COS_BINS = 10


def q_embedding_pair_cosine_hist(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Embedding-space anisotropy check: the cosine-similarity
    histogram over DETERMINISTIC adjacent-id pairs (vec_id ↔
    vec_id+1) — a healthy embedding space puts random-pair cosine
    near 0; mass piled near 1 flags collapsed representations
    (the Ethayarajh anisotropy probe, engine-level).

    Deterministic pairing keeps it oracle-exact AND O(n): one
    self-join on an arithmetic key, sequential-fold dot products
    (identical doubles both engines), fixed [-1,1] decile bins.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    a = emb.select(
        F.col("vec_id").alias("ida"), F.col("embedding").alias("ea")
    )
    b = emb.select(
        (F.col("vec_id") - F.lit(1)).alias("ida"),
        F.col("embedding").alias("eb"),
    )

    def _fold(u, v):
        return F.aggregate(
            F.zip_with(u, v, lambda x, y: x.cast("double") * y.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    j = a.join(b, "ida")
    cos = _fold(F.col("ea"), F.col("eb")) / (
        F.sqrt(_fold(F.col("ea"), F.col("ea")))
        * F.sqrt(_fold(F.col("eb"), F.col("eb")))
    )
    binned = j.select(
        F.least(
            F.lit(_COS_BINS - 1),
            F.floor((cos + F.lit(1.0)) / F.lit(2.0 / _COS_BINS)).cast("int"),
        ).alias("bin")
    )
    # r11 (guide §2.4): ONE pass over the pair join — the pair total
    # rolls up exactly from the cached ≤|bins|-row histogram (every
    # pair lands in exactly one bin, NULL included); previously the
    # self-join + fold re-executed for the count (4 FileScans → 2,
    # one per join side).
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n")
    ).cache()
    total = hist.agg(F.sum("n").alias("n_pairs"))
    return (
        hist
        .crossJoin(F.broadcast(total))
        .select(
            "bin",
            "n",
            stable_round(
                F.col("n").cast("double") / F.col("n_pairs").cast("double"), 6
            ).alias("frac"),
        )
    )


ORACLE_COSINE_HIST = f"""
WITH j AS (
  SELECT a.vec_id AS ida, a.embedding AS ea, b.embedding AS eb
  FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
), c AS (
  SELECT LEAST({_COS_BINS - 1}, CAST(floor(
    ((list_reduce(list_prepend(0.0::DOUBLE,
        list_transform(range(1, len(ea) + 1),
                       i -> ea[i]::DOUBLE * eb[i]::DOUBLE)),
        (acc, x) -> acc + x)
      / (sqrt(list_reduce(list_prepend(0.0::DOUBLE,
           list_transform(range(1, len(ea) + 1),
                          i -> ea[i]::DOUBLE * ea[i]::DOUBLE)),
           (acc, x) -> acc + x))
         * sqrt(list_reduce(list_prepend(0.0::DOUBLE,
             list_transform(range(1, len(eb) + 1),
                            i -> eb[i]::DOUBLE * eb[i]::DOUBLE)),
             (acc, x) -> acc + x))))
     + 1.0::DOUBLE) / {2.0 / _COS_BINS}) AS INT)) AS bin
  FROM j
), t AS (SELECT CAST(count(*) AS BIGINT) AS n_pairs FROM c)
SELECT CAST(bin AS INT) AS bin, CAST(count(*) AS BIGINT) AS n,
       {sql_stable_round("count(*)::DOUBLE / max(t.n_pairs)::DOUBLE", 6)}
         AS frac
FROM c, t GROUP BY bin
""".strip()


# --------------------------------------- shipping delay distribution


def q_lineitem_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fulfilment SLA view per order priority: distribution of the
    order-to-ship latency (days between order date and each line's
    ship date) — median, p90, and the fraction slower than 90 days.
    Exact integer day arithmetic feeding the interpolated-percentile
    built-in (identical doubles both engines); fact⋈fact equi-join on
    the order key, then one bounded aggregation."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", F.to_date("l_shipdate").alias("ship_d")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        F.to_date("o_orderdate").alias("order_d"),
    )
    d = li.join(orders, "l_orderkey").select(
        "priority",
        F.datediff(F.col("ship_d"), F.col("order_d"))
        .cast("long")
        .alias("delay_d"),
    )
    return (
        d.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum((F.col("delay_d") > 90).cast("long")).alias("n_slow"),
            stable_round(F.median("delay_d"), 4).alias("median_delay_d"),
            stable_round(
                F.percentile(F.col("delay_d"), F.lit(0.9)), 4
            ).alias("p90_delay_d"),
        )
        .select(
            "priority",
            "n_items",
            "n_slow",
            "median_delay_d",
            "p90_delay_d",
            stable_round(
                F.col("n_slow").cast("double") / F.col("n_items").cast("double"),
                6,
            ).alias("slow_frac"),
        )
    )


ORACLE_SHIP_DELAY = f"""
WITH d AS (
  SELECT o.o_orderpriority AS priority,
         CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                        CAST(l.l_shipdate AS DATE)) AS BIGINT) AS delay_d
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
)
SELECT priority, CAST(count(*) AS BIGINT) AS n_items,
       CAST(sum(CASE WHEN delay_d > 90 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_slow,
       {sql_stable_round("median(delay_d)", 4)} AS median_delay_d,
       {sql_stable_round("quantile_cont(delay_d, 0.9)", 4)} AS p90_delay_d,
       {sql_stable_round(
           "sum(CASE WHEN delay_d > 90 THEN 1 ELSE 0 END)::DOUBLE"
           " / count(*)::DOUBLE", 6)} AS slow_frac
FROM d GROUP BY 1
""".strip()


# ------------------------------------------- near-dup graph degrees


def q_graph_degree_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree histogram of the exact near-dup pair graph: how many
    docs have 1, 2, … near-duplicate partners — the connectivity
    fingerprint that says whether the graph is pair-dominated or
    hub-dominated BEFORE running components/PageRank on it. Degrees
    from one union+groupBy over the pair list; no closure needed, so
    the oracle is recursion-free."""
    from monasca_aggregator_spark.operators import dedup as D
    from monasca_aggregator_spark.plans.dedup import THRESHOLD

    pairs = D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents", fan_out=True),
        threshold=THRESHOLD,
    )
    ends = pairs.select(F.col("id_a").alias("doc_id")).unionAll(
        pairs.select(F.col("id_b").alias("doc_id"))
    )
    deg = ends.groupBy("doc_id").agg(F.count(F.lit(1)).alias("degree"))
    return (
        deg.groupBy("degree")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .select(F.col("degree").cast("long").alias("degree"), "n_docs")
    )


def _degree_hist_oracle() -> str:
    from monasca_aggregator_spark.plans.dedup import _NGRAM_CTES

    return f"""
WITH {_NGRAM_CTES}, ends AS (
  SELECT id_a AS doc_id FROM pairs
  UNION ALL
  SELECT id_b FROM pairs
), deg AS (
  SELECT doc_id, CAST(count(*) AS BIGINT) AS degree
  FROM ends GROUP BY 1
)
SELECT degree, CAST(count(*) AS BIGINT) AS n_docs
FROM deg GROUP BY degree
""".strip()


# ---------------------------------------------- windowFunnel depth


_FUNNEL_W_MS = 6 * 3600 * 1000  # chain must complete within 6 h


def q_funnel_window_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ClickHouse-``windowFunnel`` semantics: per user, the maximum
    ordered-chain depth view → click → purchase completable within a
    6-hour window STARTING AT ANY view (funnel_strict_ordered chains
    only from the first view and has no window bound — this is the
    sliding variant real funnel analytics uses). Output: per depth,
    how many users top out there, plus the ≥depth conversion share.

    Greedy-earliest chaining is optimal for a fixed sequence (taking
    the earliest qualifying next step maximizes the remaining window),
    so each step collapses to ONE per-(user, start) min-aggregation
    instead of an exists-join — three user-keyed equi-joins with range
    filters, no unbounded fan-out, exact BIGINT micro timestamps.
    """
    ev = load_table(spark, sf_dir, "events")
    w_us = _FUNNEL_W_MS * 1000
    v = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.unix_micros("ts").alias("vts")
    )
    c = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.unix_micros("ts").alias("cts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_micros("ts").alias("pts")
    )
    step2 = (
        v.join(c, "user_id")
        .filter(
            (F.col("cts") > F.col("vts"))
            & (F.col("cts") <= F.col("vts") + F.lit(w_us))
        )
        .groupBy("user_id", "vts")
        .agg(F.min("cts").alias("c1"))
        # r11 (guide §2.4): step2 feeds the depth-3 chain AND the
        # depth-2 distinct — cache the collapsed per-(user, start)
        # relation so the view⋈click join runs once (d1's second
        # view scan stays: a pushed-filter thin-column re-scan is
        # cheaper than caching a corpus-sized event slice).
        .cache()
    )
    step3 = (
        step2.join(p, "user_id")
        .filter(
            (F.col("pts") > F.col("c1"))
            & (F.col("pts") <= F.col("vts") + F.lit(w_us))
        )
        .select("user_id")
        .distinct()
        .withColumn("d3", F.lit(1))
    )
    d2 = step2.select("user_id").distinct().withColumn("d2", F.lit(1))
    d1 = v.select("user_id").distinct()
    depth = (
        d1.join(d2, "user_id", "left")
        .join(step3, "user_id", "left")
        .select(
            "user_id",
            (
                F.lit(1)
                + F.coalesce(F.col("d2"), F.lit(0))
                + F.coalesce(F.col("d3"), F.lit(0))
            ).alias("depth"),
        )
    )
    by_depth = depth.groupBy("depth").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    w_cum = Window.orderBy(F.col("depth").desc()).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # r11 (guide §2.4, closing batch): n_total = Σ n_users over the
    # ≤4-row depth table — the old separate depth.count() consumed
    # the d1⋈d2⋈d3 join chain a SECOND time (5 events scans → 4, one
    # whole join+distinct branch gone). Both windows run over the
    # same bounded relation (UNPARTITIONED_WINDOW_ALLOWED entry).
    w_all = Window.orderBy(F.col("depth").desc()).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    return (
        by_depth.withColumn("n_total", F.sum("n_users").over(w_all))
        .withColumn("n_reaching", F.sum("n_users").over(w_cum))
        .select(
            F.col("depth").cast("long").alias("depth"),
            "n_users",
            F.col("n_reaching").cast("long").alias("n_reaching"),
            stable_round(
                F.col("n_reaching").cast("double")
                / F.col("n_total").cast("double"),
                6,
            ).alias("reach_share"),
        )
    )


ORACLE_FUNNEL_WINDOW = f"""
WITH v AS (
  SELECT user_id, epoch_us(ts) AS vts FROM events
  WHERE event_type = 'view'
), c AS (
  SELECT user_id, epoch_us(ts) AS cts FROM events
  WHERE event_type = 'click'
), p AS (
  SELECT user_id, epoch_us(ts) AS pts FROM events
  WHERE event_type = 'purchase'
), s2 AS (
  SELECT v.user_id, v.vts, min(c.cts) AS c1
  FROM v JOIN c ON v.user_id = c.user_id
  WHERE c.cts > v.vts AND c.cts <= v.vts + {_FUNNEL_W_MS * 1000}
  GROUP BY 1, 2
), s3 AS (
  SELECT DISTINCT s2.user_id
  FROM s2 JOIN p ON s2.user_id = p.user_id
  WHERE p.pts > s2.c1 AND p.pts <= s2.vts + {_FUNNEL_W_MS * 1000}
), depth AS (
  SELECT d1.user_id,
         1 + (CASE WHEN d2.user_id IS NOT NULL THEN 1 ELSE 0 END)
           + (CASE WHEN s3.user_id IS NOT NULL THEN 1 ELSE 0 END) AS depth
  FROM (SELECT DISTINCT user_id FROM v) d1
  LEFT JOIN (SELECT DISTINCT user_id FROM s2) d2 USING (user_id)
  LEFT JOIN s3 USING (user_id)
), bd AS (
  SELECT depth, CAST(count(*) AS BIGINT) AS n_users FROM depth GROUP BY 1
), t AS (SELECT CAST(count(*) AS BIGINT) AS n_total FROM depth)
SELECT CAST(bd.depth AS BIGINT) AS depth, bd.n_users,
       CAST(sum(bd2.n_users) AS BIGINT) AS n_reaching,
       {sql_stable_round(
           "sum(bd2.n_users)::DOUBLE / max(t.n_total)::DOUBLE", 6)}
         AS reach_share
FROM bd JOIN bd bd2 ON bd2.depth >= bd.depth, t
GROUP BY bd.depth, bd.n_users
""".strip()


# -------------------------------- wide (multi-word) retention bitmap


_RB_BUCKET_MS = 6 * 3600 * 1000   # 6-hour cohort buckets
_RB_HORIZON = 120                 # 30 days of 6h buckets → 2 words
_RB_OFFSETS = 120                 # full-horizon triangle: probes word 1


def q_events_retention_bitmap_wide(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Retention triangle at 6-HOUR granularity from per-user activity
    bitmaps spanning MORE than one machine word — the chunked-word
    algebra events_retention_bitmap's docstring promises (horizon
    120 buckets = 2×63-bit words — 63 usable bits per BIGINT,
    the sign bit stays clear; same per-word bit_or / bit-test algebra,
    word index = bucket div 63). Exercises real
    multi-word state on the 30-day test corpus, which a daily-bucket
    bitmap never leaves word 0 for.

    Out-of-horizon events are filtered explicitly on both engines
    (Spark's shiftleft wraps mod 64 — the r2 ADVICE class).
    """
    ev = load_table(spark, sf_dir, "events")
    epoch0 = 1_704_067_200_000  # 2024-01-01 UTC, the corpus day-0
    # floor, not cast-truncate: a pre-epoch ts must map to bucket -1
    # (excluded) exactly like DuckDB's // — truncation would fold it
    # into bucket 0 and silently diverge (r3 ADVICE)
    b = F.floor(
        (F.unix_millis("ts") - F.lit(epoch0)) / F.lit(_RB_BUCKET_MS)
    ).cast("long")
    base = (
        ev.select("user_id", b.alias("b"))
        .filter(F.col("b").between(0, _RB_HORIZON - 1))
        .groupBy("user_id", (F.col("b") / F.lit(63)).cast("long").alias("w"))
        .agg(
            # 63 bits per word: bit 63 is the sign bit, and DuckDB
            # (correctly) refuses 1::BIGINT << 63 — same split both sides
            F.expr(
                "bit_or(shiftleft(1L, cast(pmod(b, 63) as int)))"
            ).alias("word")
        )
    )
    words = base.groupBy("user_id").agg(
        F.max(F.when(F.col("w") == 0, F.col("word"))).alias("w0"),
        F.max(F.when(F.col("w") == 1, F.col("word"))).alias("w1"),
    ).select(
        "user_id",
        F.coalesce("w0", F.lit(0)).alias("w0"),
        F.coalesce("w1", F.lit(0)).alias("w1"),
    )
    tz0 = F.bit_count((F.col("w0").bitwiseAND(-F.col("w0"))) - F.lit(1))
    tz1 = F.bit_count((F.col("w1").bitwiseAND(-F.col("w1"))) - F.lit(1))
    cohort = F.when(F.col("w0") != 0, tz0).otherwise(F.lit(63) + tz1)
    cohorts = words.withColumn("cohort_b", cohort)
    offs = F.explode(
        F.sequence(F.lit(0), F.lit(_RB_OFFSETS - 1))
    ).alias("offset")
    cells = (
        cohorts.select("w0", "w1", "cohort_b", offs)
        .withColumn("t", F.col("cohort_b") + F.col("offset"))
        .filter(F.col("t") <= _RB_HORIZON - 1)
        .withColumn(
            "bit",
            F.expr(
                "(case when t < 63 then shiftright(w0, cast(t as int))"
                " else shiftright(w1, cast(t - 63 as int)) end) & 1L"
            ),
        )
    )
    return (
        cells.groupBy("cohort_b", "offset")
        .agg(F.sum("bit").alias("retained"))
        .select(
            F.col("cohort_b").cast("long").alias("cohort_b"),
            F.col("offset").cast("long").alias("offset"),
            F.col("retained").cast("long").alias("retained"),
        )
    )


ORACLE_RETENTION_WIDE = f"""
WITH e AS (
  SELECT user_id,
         (epoch_ms(ts) - 1704067200000) // {_RB_BUCKET_MS} AS b
  FROM events
  WHERE (epoch_ms(ts) - 1704067200000) // {_RB_BUCKET_MS}
        BETWEEN 0 AND {_RB_HORIZON - 1}
), pw AS (
  SELECT user_id, b // 63 AS w,
         bit_or(1::BIGINT << CAST(b % 63 AS INT)) AS word
  FROM e GROUP BY 1, 2
), words AS (
  SELECT user_id,
         coalesce(max(CASE WHEN w = 0 THEN word END), 0) AS w0,
         coalesce(max(CASE WHEN w = 1 THEN word END), 0) AS w1
  FROM pw GROUP BY 1
), c AS (
  SELECT user_id, w0, w1,
         CASE WHEN w0 <> 0
              THEN bit_count(((w0 & -w0) - 1)::BIGINT)
              ELSE 63 + bit_count(((w1 & -w1) - 1)::BIGINT) END AS cohort_b
  FROM words
), cells AS (
  SELECT cohort_b, o.off AS "offset",
         CASE WHEN cohort_b + o.off < 63
              THEN (w0 >> CAST(cohort_b + o.off AS INT)) & 1
              ELSE (w1 >> CAST(cohort_b + o.off - 63 AS INT)) & 1
         END AS bit
  FROM c, (SELECT unnest(range(0, {_RB_OFFSETS})) AS off) o
  WHERE cohort_b + o.off <= {_RB_HORIZON - 1}
)
SELECT CAST(cohort_b AS BIGINT) AS cohort_b,
       CAST("offset" AS BIGINT) AS "offset",
       CAST(sum(bit) AS BIGINT) AS retained
FROM cells GROUP BY 1, 2
""".strip()


# ------------------------------------------- Heaps'-law growth curve


_HEAPS_K = 10


def q_corpus_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth fingerprint (Heaps/Herdan law, the companion
    to corpus_zipf_alpha): cumulative distinct-token count V(N) at 10
    corpus prefixes (deciles of docs in doc_id order) plus the fitted
    exponent β of V ≈ K·N^β — natural corpora sit near β ≈ 0.5–0.7;
    a flat curve flags template spam, a near-linear one OCR noise.

    Scale posture: prefixes come from the distributed NTILE
    (operators/rank.py — no single-task global sort); each token
    contributes ONE (first-seen doc) row to the prefix accounting; the
    OLS runs over ten e6-fixed-point-quantized points, so the fit is
    exact-integer arithmetic → identical doubles on both engines (the
    corpus_zipf_alpha convention).

    r11 optimization (guide §2.3/§2.4): per-doc token counts come from
    ``size(split(...))`` (no explode/groupBy pass — the only consumer
    of the exploded relation is the first-seen vocabulary aggregate);
    boundary docs and decile token sums ride ONE groupBy(k) instead of
    two; and the two ≤10-row intermediates (the per-decile table and
    the joined points) are lazily cached so the 3-4 reuses of each
    stop re-executing the corpus-sized lineage (the pre-r11 plan
    tokenized the corpus 4×: 140-Exchange plan → 20); the 10-row
    cumsum window over the cached kagg is on the plan-audit
    bounded-window allowlist.
    """
    from monasca_aggregator_spark.operators.rank import (
        global_rank,
        ntile_from_rank,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    # size(split()) counts exactly what explode-then-count counted
    # (split never yields an empty array; null text drops out of both
    # formulations via the filter — explode emits nothing for null)
    per_doc = docs.filter(F.col("text").isNotNull()).select(
        "doc_id", F.size(F.split(F.col("text"), " ")).alias("nt")
    )
    ranked = global_rank(
        per_doc,
        (F.col("doc_id") / F.lit(1024)).cast("long"),
        [F.col("doc_id").asc()],
        rank_col="rk",
        total_col="n_docs",
    )
    deciled = ranked.withColumn(
        "k", ntile_from_rank(F.col("rk"), F.col("n_docs"), _HEAPS_K)
    )
    # boundary doc + per-decile token sum in ONE aggregate; ≤10 rows,
    # eagerly materialized — reused 3× below without recomputation
    kagg = deciled.groupBy("k").agg(
        F.max("doc_id").alias("boundary_doc"),
        F.sum("nt").alias("dt"),
    ).cache()
    bounds = kagg.select("k", "boundary_doc")
    wk = Window.orderBy("k").rowsBetween(Window.unboundedPreceding, 0)
    cum_tok = kagg.select("k", "dt").withColumn(
        "n_tokens_cum", F.sum("dt").over(wk)
    )
    # vocab at each boundary: tokens whose FIRST doc is ≤ boundary
    tok = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("token")
    )
    first_seen = tok.groupBy("token").agg(F.min("doc_id").alias("fd"))
    vocab_cum = (
        first_seen.join(F.broadcast(bounds))
        .filter(F.col("fd") <= F.col("boundary_doc"))
        .groupBy("k")
        .agg(F.count(F.lit(1)).alias("vocab_cum"))
    )
    pts = (
        cum_tok.join(vocab_cum, "k")
        .join(bounds, "k")
        .select("k", "boundary_doc", "n_tokens_cum", "vocab_cum")
    ).cache()
    lx = F.floor(
        F.log(F.col("n_tokens_cum").cast("double")) * 1e6 + 0.5
    ).cast("long")
    ly = F.floor(
        F.log(F.col("vocab_cum").cast("double")) * 1e6 + 0.5
    ).cast("long")
    g = pts.select(lx.alias("x"), ly.alias("y")).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    beta = (
        (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
            "double"
        )
        / (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
            "double"
        )
    )
    fit = g.select(stable_round(beta, 6).alias("heaps_beta"))
    return (
        pts.crossJoin(F.broadcast(fit))
        .select(
            F.col("k").cast("long").alias("k"),
            F.col("boundary_doc").cast("long").alias("boundary_doc"),
            F.col("n_tokens_cum").cast("long").alias("n_tokens_cum"),
            "vocab_cum",
            "heaps_beta",
        )
    )


ORACLE_HEAPS = f"""
WITH per_doc AS (
  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS nt
  FROM documents
), deciled AS (
  SELECT doc_id, nt, ntile({_HEAPS_K}) OVER (ORDER BY doc_id) AS k
  FROM per_doc
), bounds AS (
  SELECT k, CAST(max(doc_id) AS BIGINT) AS boundary_doc
  FROM deciled GROUP BY 1
), cum AS (
  SELECT k, CAST(sum(sum(nt)) OVER (ORDER BY k
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
           AS n_tokens_cum
  FROM deciled GROUP BY k
), fs AS (
  SELECT token, min(doc_id) AS fd FROM (
    SELECT doc_id, unnest(string_split(text, ' ')) AS token FROM documents
  ) GROUP BY token
), vc AS (
  SELECT b.k, CAST(count(*) AS BIGINT) AS vocab_cum
  FROM fs, bounds b WHERE fs.fd <= b.boundary_doc GROUP BY 1
), pts AS (
  SELECT cum.k, bounds.boundary_doc, cum.n_tokens_cum, vc.vocab_cum
  FROM cum JOIN vc USING (k) JOIN bounds USING (k)
), q AS (
  SELECT CAST(floor(ln(n_tokens_cum::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           AS x,
         CAST(floor(ln(vocab_cum::DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
           AS y
  FROM pts
), fit AS (
  SELECT {sql_stable_round(
      "(count(*) * sum(x * y) - sum(x) * sum(y))::DOUBLE"
      " / (count(*) * sum(x * x) - sum(x) * sum(x))::DOUBLE", 6)}
           AS heaps_beta
  FROM q
)
SELECT CAST(k AS BIGINT) AS k, boundary_doc, n_tokens_cum, vocab_cum,
       heaps_beta
FROM pts, fit
""".strip()


# ------------------------------------------------ CUPED A/B analysis


_CUPED_SPLIT_DAY = 15  # pre-period = days < 15, post = days ≥ 15


def q_events_ab_did(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DIFFERENCE-IN-DIFFERENCES experiment readout (the classic
    causal-inference design): effect = (treatment post − treatment
    pre) − (control post − control pre) on per-user-day conversion —
    the estimator that survives what breaks the plain z-test
    (`events_ab_test`): a level DIFFERENCE between the arms that
    existed BEFORE the treatment (bad randomization, pre-existing
    cohort skew) cancels out of the double difference. Completes the
    experimentation family: z-test (clean randomization), CUPED
    (variance reduction), DiD (baseline-shift robustness).

    Cells share `events_ab_test`'s exact protocol: variant =
    user_id mod 2, conversion = any purchase in the (user, day),
    pre/post at corpus day 15 (`_CUPED_SPLIT_DAY`). The SE is the
    four-cell binomial sum √(Σ p(1−p)/n) folded in one FIXED
    parenthesization so both engines produce the identical double;
    everything upstream is exact BIGINT counts.

    Scale: one distinct (user, day, variant, converted) collapse with
    map-side partials, then a 4-cell reduction — scalar algebra after
    that.
    """
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(
        (F.unix_millis("ts") - F.lit(1_704_067_200_000))
        / F.lit(_DAY_MS)
    ).cast("long")
    per_ud = (
        ev.select(
            F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
            (day >= _CUPED_SPLIT_DAY).cast("int").alias("post"),
            "user_id",
            day.alias("day"),
            (F.col("event_type") == "purchase").cast("int").alias("p"),
        )
        .groupBy("variant", "post", "user_id", "day")
        .agg(F.max("p").alias("converted"))
    )
    cells = per_ud.groupBy("variant", "post").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("converted").cast("long").alias("c"),
    )
    wide = cells.groupBy().pivot("variant", [0, 1]).agg(
        F.sum(F.when(F.col("post") == 0, F.col("n"))).alias("n_pre"),
        F.sum(F.when(F.col("post") == 0, F.col("c"))).alias("c_pre"),
        F.sum(F.when(F.col("post") == 1, F.col("n"))).alias("n_post"),
        F.sum(F.when(F.col("post") == 1, F.col("c"))).alias("c_post"),
    )

    def rate(c, n):
        return F.col(c).cast("double") / F.col(n).cast("double")

    p0a, p0b = rate("0_c_pre", "0_n_pre"), rate("0_c_post", "0_n_post")
    p1a, p1b = rate("1_c_pre", "1_n_pre"), rate("1_c_post", "1_n_post")
    did = (p1b - p1a) - (p0b - p0a)

    def vterm(p, n):
        return p * (F.lit(1.0) - p) / F.col(n).cast("double")

    se = F.sqrt(
        (
            (vterm(p0a, "0_n_pre") + vterm(p0b, "0_n_post"))
            + vterm(p1a, "1_n_pre")
        )
        + vterm(p1b, "1_n_post")
    )
    return wide.select(
        F.col("0_n_pre").alias("n_ctrl_pre"),
        F.col("0_n_post").alias("n_ctrl_post"),
        F.col("1_n_pre").alias("n_treat_pre"),
        F.col("1_n_post").alias("n_treat_post"),
        stable_round(p0a, 6).alias("rate_ctrl_pre"),
        stable_round(p0b, 6).alias("rate_ctrl_post"),
        stable_round(p1a, 6).alias("rate_treat_pre"),
        stable_round(p1b, 6).alias("rate_treat_post"),
        stable_round(did, 6).alias("did"),
        stable_round(se, 6).alias("se"),
        stable_round(did / se, 4).alias("z"),
    )


ORACLE_AB_DID = f"""
WITH per_ud AS (
  SELECT CAST(user_id % 2 AS INT) AS variant,
         CASE WHEN (epoch_ms(ts) - 1704067200000) // {_DAY_MS}
                   >= {_CUPED_SPLIT_DAY} THEN 1 ELSE 0 END AS post,
         user_id,
         (epoch_ms(ts) - 1704067200000) // {_DAY_MS} AS day,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS converted
  FROM events GROUP BY 1, 2, 3, 4
), cells AS (
  SELECT variant, post, count(*) AS n, sum(converted) AS c
  FROM per_ud GROUP BY 1, 2
), wide AS (
  SELECT
    max(CASE WHEN variant=0 AND post=0 THEN n END) AS n0a,
    max(CASE WHEN variant=0 AND post=0 THEN c END) AS c0a,
    max(CASE WHEN variant=0 AND post=1 THEN n END) AS n0b,
    max(CASE WHEN variant=0 AND post=1 THEN c END) AS c0b,
    max(CASE WHEN variant=1 AND post=0 THEN n END) AS n1a,
    max(CASE WHEN variant=1 AND post=0 THEN c END) AS c1a,
    max(CASE WHEN variant=1 AND post=1 THEN n END) AS n1b,
    max(CASE WHEN variant=1 AND post=1 THEN c END) AS c1b
  FROM cells
), r AS (
  SELECT *,
    CAST(c0a AS DOUBLE)/n0a AS p0a, CAST(c0b AS DOUBLE)/n0b AS p0b,
    CAST(c1a AS DOUBLE)/n1a AS p1a, CAST(c1b AS DOUBLE)/n1b AS p1b
  FROM wide
), f AS (
  SELECT *,
    (p1b - p1a) - (p0b - p0a) AS did,
    sqrt(((p0a*(1.0 - p0a)/n0a + p0b*(1.0 - p0b)/n0b)
          + p1a*(1.0 - p1a)/n1a)
         + p1b*(1.0 - p1b)/n1b) AS se
  FROM r
)
SELECT CAST(n0a AS BIGINT) AS n_ctrl_pre,
       CAST(n0b AS BIGINT) AS n_ctrl_post,
       CAST(n1a AS BIGINT) AS n_treat_pre,
       CAST(n1b AS BIGINT) AS n_treat_post,
       {sql_stable_round("p0a", 6)} AS rate_ctrl_pre,
       {sql_stable_round("p0b", 6)} AS rate_ctrl_post,
       {sql_stable_round("p1a", 6)} AS rate_treat_pre,
       {sql_stable_round("p1b", 6)} AS rate_treat_post,
       {sql_stable_round("did", 6)} AS did,
       {sql_stable_round("se", 6)} AS se,
       {sql_stable_round("did / se", 4)} AS z
FROM f
""".strip()


def q_events_ab_test_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUPED variance-reduced experiment readout (Deng et al. WSDM'13,
    the standard trick on every experimentation platform): per-user
    pre-period value is the covariate, θ = cov(pre, post)/var(pre),
    and the adjusted post metric Y − θ(X − μ_X) shrinks variance by
    the pre/post correlation² without biasing the treatment effect.

    Everything is algebra over ONE exact integer-cent aggregate per
    user: θ comes from the pooled BIGINT moment sums, per-variant
    adjusted means expand to Σ_v Y − θ(Σ_v X − n_v·μ_X) — no
    per-row double accumulation anywhere, so both engines compute
    identical doubles (the moment-expansion convention of agg_stddev).
    Output: one row with raw and CUPED-adjusted lift plus the variance
    reduction factor 1 − ρ².
    """
    ev = load_table(spark, sf_dir, "events")
    # corpus-relative day (epoch 2024-01-01) — absolute epoch days
    # would put the 15-day split before every event
    # floor before the cast so pre-epoch rows land on day -1 exactly
    # like DuckDB's // (truncation maps them to day 0 — r3 ADVICE)
    day = F.floor(
        (F.unix_millis("ts") - F.lit(1_704_067_200_000)) / F.lit(_DAY_MS)
    ).cast("long")
    e2 = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    per_user = (
        ev.select(
            "user_id",
            F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
            day.alias("day"),
            e2.alias("e2"),
        )
        .groupBy("user_id", "variant")
        .agg(
            F.sum(
                F.when(F.col("day") < _CUPED_SPLIT_DAY, F.col("e2")).otherwise(
                    F.lit(0)
                )
            ).alias("x"),
            F.sum(
                F.when(F.col("day") >= _CUPED_SPLIT_DAY, F.col("e2")).otherwise(
                    F.lit(0)
                )
            ).alias("y"),
        )
    )
    m = per_user.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.when(F.col("variant") == 0, F.lit(1)).otherwise(F.lit(0)))
        .alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("x")).otherwise(F.lit(0)))
        .alias("sx0"),
        F.sum(F.when(F.col("variant") == 0, F.col("y")).otherwise(F.lit(0)))
        .alias("sy0"),
        F.sum(F.when(F.col("variant") == 1, F.lit(1)).otherwise(F.lit(0)))
        .alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("x")).otherwise(F.lit(0)))
        .alias("sx1"),
        F.sum(F.when(F.col("variant") == 1, F.col("y")).otherwise(F.lit(0)))
        .alias("sy1"),
    )
    n = F.col("n").cast("double")
    cov = (
        F.col("n").cast("double") * F.col("sxy").cast("double")
        - F.col("sx").cast("double") * F.col("sy").cast("double")
    )
    varx = (
        F.col("n").cast("double") * F.col("sxx").cast("double")
        - F.col("sx").cast("double") * F.col("sx").cast("double")
    )
    vary = (
        F.col("n").cast("double") * F.col("syy").cast("double")
        - F.col("sy").cast("double") * F.col("sy").cast("double")
    )
    theta = cov / varx
    mu_x = F.col("sx").cast("double") / n
    raw0 = F.col("sy0").cast("double") / F.col("n0").cast("double")
    raw1 = F.col("sy1").cast("double") / F.col("n1").cast("double")
    adj0 = raw0 - theta * (
        F.col("sx0").cast("double") / F.col("n0").cast("double") - mu_x
    )
    adj1 = raw1 - theta * (
        F.col("sx1").cast("double") / F.col("n1").cast("double") - mu_x
    )
    rho2 = (cov * cov) / (varx * vary)
    cents = F.lit(100.0)
    return m.select(
        F.col("n0").cast("long").alias("n0"),
        F.col("n1").cast("long").alias("n1"),
        stable_round(theta, 6).alias("theta"),
        stable_round((raw1 - raw0) / cents, 4).alias("raw_lift"),
        stable_round((adj1 - adj0) / cents, 4).alias("cuped_lift"),
        stable_round(F.lit(1.0) - rho2, 6).alias("var_ratio"),
    )


ORACLE_CUPED = f"""
WITH pu AS (
  SELECT user_id, CAST(user_id % 2 AS INT) AS variant,
         CAST(sum(CASE WHEN (epoch_ms(ts) - 1704067200000) // {_DAY_MS}
                            < {_CUPED_SPLIT_DAY}
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS x,
         CAST(sum(CASE WHEN (epoch_ms(ts) - 1704067200000) // {_DAY_MS}
                            >= {_CUPED_SPLIT_DAY}
                  THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                  ELSE 0 END) AS BIGINT) AS y
  FROM events GROUP BY 1, 2
), m AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         CAST(sum(x * x) AS BIGINT) AS sxx,
         CAST(sum(y * y) AS BIGINT) AS syy,
         CAST(sum(x * y) AS BIGINT) AS sxy,
         CAST(sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
         CAST(sum(CASE WHEN variant = 0 THEN x ELSE 0 END) AS BIGINT) AS sx0,
         CAST(sum(CASE WHEN variant = 0 THEN y ELSE 0 END) AS BIGINT) AS sy0,
         CAST(sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
         CAST(sum(CASE WHEN variant = 1 THEN x ELSE 0 END) AS BIGINT) AS sx1,
         CAST(sum(CASE WHEN variant = 1 THEN y ELSE 0 END) AS BIGINT) AS sy1
  FROM pu
)
SELECT n0, n1,
       {sql_stable_round(
           "(n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
           " / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)", 6)}
         AS theta,
       {sql_stable_round(
           "(sy1::DOUBLE / n1::DOUBLE - sy0::DOUBLE / n0::DOUBLE)"
           " / 100.0::DOUBLE", 4)} AS raw_lift,
       {sql_stable_round(
           "((sy1::DOUBLE / n1::DOUBLE"
           "   - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
           "      / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))"
           "     * (sx1::DOUBLE / n1::DOUBLE - sx::DOUBLE / n::DOUBLE))"
           "  - (sy0::DOUBLE / n0::DOUBLE"
           "   - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
           "      / (n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE))"
           "     * (sx0::DOUBLE / n0::DOUBLE - sx::DOUBLE / n::DOUBLE)))"
           " / 100.0::DOUBLE", 4)} AS cuped_lift,
       {sql_stable_round(
           "1.0::DOUBLE - ((n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE)"
           " * (n::DOUBLE * sxy::DOUBLE - sx::DOUBLE * sy::DOUBLE))"
           " / ((n::DOUBLE * sxx::DOUBLE - sx::DOUBLE * sx::DOUBLE)"
           "  * (n::DOUBLE * syy::DOUBLE - sy::DOUBLE * sy::DOUBLE))", 6)}
         AS var_ratio
FROM m
""".strip()


# -------------------------------- token burstiness (Church–Gale VMR)


_TREND_TOP = 20
_TREND_MIN_C = 5  # current-crawl support floor


def q_text_trending_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TRENDING TERMS between crawl snapshots (r9): top-{_TREND_TOP}
    tokens by smoothed frequency-ratio rise from the previous crawl
    to the current one — the vocabulary-drift monitor a corpus team
    watches between ingestion batches (new jargon, event spikes,
    spam campaigns), the time-axis sibling of `text_burstiness`'s
    variance lens. Snapshots are the doc_id-parity split the
    profile-drift family uses (prev = even, cur = odd — determinism
    mechanics under oracle test; real deployments pass crawl ids).

    ratio = ((c_cur+1)/(N_cur+V)) / ((c_prev+1)/(N_prev+V)) — add-1
    smoothed shares so NEW tokens rank (prev count 0), with a
    current-support floor of {_TREND_MIN_C}. Ranking is EXACT: the
    ratio quantizes to e6 by integer long-division of the DEC38
    cross products ((c_cur+1)·(N_prev+V)·10⁶ div
    (c_prev+1)·(N_cur+V)) before the top-K, so order can't drift.

    Scale: one (crawl, token) vocabulary-bounded aggregation, a
    2-row crawl-totals broadcast, TakeOrdered top-K."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select(
        F.pmod(F.col("doc_id"), F.lit(2)).cast("int").alias("crawl"),
        F.explode(tokens(F.col("text"))).alias("token"),
    )
    per = toks.groupBy("token").agg(
        F.sum((F.col("crawl") == 0).cast("long")).alias("c_prev"),
        F.sum((F.col("crawl") == 1).cast("long")).alias("c_cur"),
    )
    tot = per.agg(
        F.sum("c_prev").alias("n_prev"),
        F.sum("c_cur").alias("n_cur"),
        F.count(F.lit(1)).alias("v"),
    )
    dec = "decimal(38,0)"
    j = per.filter(F.col("c_cur") >= _TREND_MIN_C).crossJoin(
        F.broadcast(tot)
    )
    q_e6 = F.expr(
        "(CAST(c_cur + 1 AS decimal(38,0))"
        " * CAST(n_prev + v AS decimal(38,0)) * 1000000)"
        " div (CAST(c_prev + 1 AS decimal(38,0))"
        "      * CAST(n_cur + v AS decimal(38,0)))"
    )
    ranked = j.select(
        "token", "c_prev", "c_cur", q_e6.alias("q")
    )
    return (
        ranked.orderBy(F.col("q").desc(), F.col("token"))
        .limit(_TREND_TOP)
        .select(
            "token",
            "c_prev",
            "c_cur",
            stable_round(
                F.col("q").cast("double") / F.lit(1e6), 6
            ).alias("rise_ratio"),
        )
    )


ORACLE_TRENDING_TERMS = rf"""
WITH toks AS (
  SELECT CAST(doc_id % 2 AS INT) AS crawl,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM documents
), per AS (
  SELECT token,
         CAST(sum(CASE WHEN crawl = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_prev,
         CAST(sum(CASE WHEN crawl = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS c_cur
  FROM toks GROUP BY 1
), tot AS (
  SELECT CAST(sum(c_prev) AS BIGINT) AS n_prev,
         CAST(sum(c_cur) AS BIGINT) AS n_cur,
         CAST(count(*) AS BIGINT) AS v
  FROM per
), r AS (
  SELECT token, c_prev, c_cur,
         (CAST(c_cur + 1 AS HUGEINT) * (n_prev + v) * 1000000)
           // (CAST(c_prev + 1 AS HUGEINT) * (n_cur + v)) AS q
  FROM per, tot WHERE c_cur >= {_TREND_MIN_C}
)
SELECT token, c_prev, c_cur,
       {sql_stable_round("CAST(q AS DOUBLE) / 1000000.0", 6)}
         AS rise_ratio
FROM r ORDER BY q DESC, token LIMIT {_TREND_TOP}
""".strip()


_BURST_MIN_DF = 20  # tokens must appear in ≥ this many docs
_BURST_TOP = 25


def q_text_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token BURSTINESS: variance-to-mean ratio of per-document counts
    (Church & Gale 1995) for every token in ≥ 20 docs, top-25 — a
    Poisson process gives VMR ≈ 1 (function words), topical/content
    words clump (VMR ≫ 1). The signal behind burstiness-aware
    retrieval weighting and topic-word extraction, orthogonal to raw
    frequency (PMI finds pairs, this finds single clumping terms).

    Exactness: per-(token, doc) counts are integers, so mean and
    variance come from exact (n, Σc, Σc²) moments over the FULL doc
    universe — docs not containing the token contribute zero counts
    via the closed form (zeros don't need rows: Σc and Σc² are sums
    over occurrences only, n is the corpus doc count broadcast in) —
    VMR = (n·Σc² − (Σc)²) / ((n−1)·Σc) as one division of exact
    DECIMAL(38,0) products. Vocabulary-bounded aggregates; top-25 by
    (e6 VMR, token) is TakeOrdered."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    n_docs = docs.count()
    tok = docs.select(
        "doc_id", F.explode(tokens(F.col("text"))).alias("token")
    )
    per_doc = tok.groupBy("token", "doc_id").agg(
        F.count(F.lit(1)).alias("c")
    )
    dec = "decimal(38,0)"
    g = per_doc.groupBy("token").agg(
        F.count(F.lit(1)).alias("df"),
        F.sum("c").alias("sc"),
        F.sum(F.col("c").cast(dec) * F.col("c").cast(dec)).alias("sc2"),
    )
    n = F.lit(n_docs).cast(dec)
    vmr = (
        (n * F.col("sc2") - F.col("sc").cast(dec) * F.col("sc").cast(dec))
        .cast("double")
        / ((F.lit(n_docs - 1)) * F.col("sc")).cast("double")
    )
    return (
        g.filter(F.col("df") >= _BURST_MIN_DF)
        .select(
            "token",
            "df",
            F.col("sc").alias("n_occurrences"),
            stable_round(vmr, 6).alias("burstiness"),
        )
        .orderBy(F.col("burstiness").desc(), F.col("token"))
        .limit(_BURST_TOP)
    )


ORACLE_BURSTINESS = rf"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM documents
),
per_doc AS (
  SELECT token, doc_id, count(*) AS c FROM tok GROUP BY 1, 2
),
nd AS (SELECT count(*) AS n FROM documents),
g AS (
  SELECT token, count(*) AS df,
         sum(c) AS sc, sum(CAST(c AS HUGEINT) * c) AS sc2
  FROM per_doc GROUP BY token
)
SELECT token, df, CAST(sc AS BIGINT) AS n_occurrences,
       {sql_stable_round(
           "CAST(CAST(n AS HUGEINT) * sc2"
           "     - CAST(sc AS HUGEINT) * sc AS DOUBLE)"
           " / CAST((n - 1) * CAST(sc AS HUGEINT) AS DOUBLE)", 6)}
         AS burstiness
FROM g CROSS JOIN nd
WHERE df >= {_BURST_MIN_DF}
ORDER BY burstiness DESC, token
LIMIT {_BURST_TOP}
""".strip()


# -------------------------------------------------------------- registry

_LN2 = 0.6931471805599453  # shared literal: bits = nats / _LN2


def q_events_next_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional NEXT-EVENT entropy per state — the uncertainty
    companion of `events_markov_accuracy` (top-1 accuracy says how
    often the argmax wins; entropy says how much signal there is to
    win): H(next | from=f) = −Σ p·ln p over the observed transition
    distribution out of each event type, in nats and bits. Low-entropy
    states are where a next-event model earns its keep; ln(k) is the
    ceiling for k observed successors.

    Exactness: p = n/n_from is a ratio of exact BIGINTs; each
    −p·ln p term = (n/n_from)·ln(n_from/n) is e6-fixed to a BIGINT
    BEFORE the order-free sum (the JSD/PSI pre-rounded-term trick, so
    float addition order can't diverge between engines); bits divide
    by the shared _LN2 literal. Same transition relation as the
    Markov queries: one user-partitioned lead window, one bounded
    groupBy."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.withColumn("next_type", F.lead("event_type").over(w))
        .filter(F.col("next_type").isNotNull())
        .groupBy(
            F.col("event_type").alias("from_type"),
            F.col("next_type").alias("to_type"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
    )
    totals = trans.groupBy("from_type").agg(
        F.sum("n").alias("n_from"),
        F.count(F.lit(1)).alias("n_next_types"),
    )
    t6 = F.floor(
        (F.col("n").cast("double") / F.col("n_from").cast("double"))
        * F.log(
            F.col("n_from").cast("double") / F.col("n").cast("double")
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    per = trans.join(totals, "from_type").select(
        "from_type", "n_from", "n_next_types", t6.alias("t6")
    )
    return (
        per.groupBy("from_type", "n_from", "n_next_types")
        .agg(F.sum("t6").alias("s6"))
        .select(
            "from_type",
            F.col("n_from").cast("long").alias("n_from"),
            F.col("n_next_types").cast("long").alias("n_next_types"),
            stable_round(F.col("s6").cast("double") / F.lit(1e6), 6).alias(
                "entropy_nats"
            ),
            stable_round(
                F.col("s6").cast("double") / F.lit(1e6) / F.lit(_LN2), 6
            ).alias("entropy_bits"),
        )
    )


ORACLE_NEXT_ENTROPY = f"""
WITH seq AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS to_type
  FROM events
), trans AS (
  SELECT from_type, to_type, count(*) AS n
  FROM seq WHERE to_type IS NOT NULL GROUP BY 1, 2
), tot AS (
  SELECT from_type, sum(n) AS n_from, count(*) AS n_next_types
  FROM trans GROUP BY 1
), terms AS (
  SELECT t.from_type, o.n_from, o.n_next_types,
         CAST(floor((CAST(t.n AS DOUBLE) / CAST(o.n_from AS DOUBLE))
              * ln(CAST(o.n_from AS DOUBLE) / CAST(t.n AS DOUBLE))
              * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS t6
  FROM trans t JOIN tot o USING (from_type)
)
SELECT from_type, CAST(n_from AS BIGINT) AS n_from,
       CAST(n_next_types AS BIGINT) AS n_next_types,
       {sql_stable_round("CAST(sum(t6) AS DOUBLE) / 1000000.0", 6)}
         AS entropy_nats,
       {sql_stable_round(
           f"CAST(sum(t6) AS DOUBLE) / 1000000.0 / {_LN2!r}", 6
       )} AS entropy_bits
FROM terms GROUP BY 1, 2, 3
""".strip()


def q_events_audience_overlap(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AUDIENCE overlap matrix (r8): exact Jaccard between the user
    sets of every event-type pair — which behaviors share an audience
    (near-1: redundant instrumentation or a forced funnel; near-0:
    disjoint segments). The exact-set sibling of the KMV sketch set
    ops (rows 18z1-2, which estimate per-window); audiences per TYPE
    are |users|-bounded, so exactness is affordable at any corpus
    size: distinct (type, user) pairs collapse first (one map-side-
    combinable shuffle), the pair intersection is a self-join on
    user_id (co-partitioned), and |A∪B| = |A|+|B|−|A∩B| closes the
    Jaccard from broadcast per-type totals — the output is
    ≤ |types|² rows."""
    ev = load_table(spark, sf_dir, "events")
    # r11 (guide §2.4): the distinct (type, user) relation feeds the
    # per-type sizes AND both self-join sides — uncached, the corpus
    # scan+distinct re-executed 3× (4 FileScans → 1).
    tu = ev.select("event_type", "user_id").distinct().cache()
    sizes = tu.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_users")
    )
    a = tu.select(F.col("event_type").alias("type_a"), "user_id")
    b = tu.select(F.col("event_type").alias("type_b"), "user_id")
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    sa = sizes.select(
        F.col("event_type").alias("type_a"), F.col("n_users").alias("n_a")
    )
    sb = sizes.select(
        F.col("event_type").alias("type_b"), F.col("n_users").alias("n_b")
    )
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            F.col("n_a").cast("long").alias("n_a"),
            F.col("n_b").cast("long").alias("n_b"),
            F.col("n_both").cast("long").alias("n_both"),
            stable_round(
                F.col("n_both").cast("double")
                / (
                    F.col("n_a") + F.col("n_b") - F.col("n_both")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


ORACLE_AUDIENCE_OVERLAP = f"""
WITH tu AS (
  SELECT DISTINCT event_type, user_id FROM events
), sizes AS (
  SELECT event_type, count(*) AS n_users FROM tu GROUP BY 1
), inter AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM tu a JOIN tu b
    ON a.user_id = b.user_id AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT type_a, type_b,
       CAST(sa.n_users AS BIGINT) AS n_a,
       CAST(sb.n_users AS BIGINT) AS n_b,
       CAST(n_both AS BIGINT) AS n_both,
       {sql_stable_round(
           "CAST(n_both AS DOUBLE) / "
           "CAST(sa.n_users + sb.n_users - n_both AS DOUBLE)", 6)}
         AS jaccard
FROM inter
JOIN sizes sa ON sa.event_type = inter.type_a
JOIN sizes sb ON sb.event_type = inter.type_b
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_burstiness": q_text_burstiness,
    "events_ab_test": q_events_ab_test,
    "events_ab_power": q_events_ab_power,
    "events_ab_srm": q_events_ab_srm,
    "text_kneser_ney": q_text_kneser_ney,
    "text_trending_terms": q_text_trending_terms,
    "events_ab_did": q_events_ab_did,
    "events_dau_mau": q_events_dau_mau,
    "metric_hod_dow_heatmap": q_metric_hod_dow_heatmap,
    "quality_iqr_outliers": q_quality_iqr_outliers,
    "orders_open_aging": q_orders_open_aging,
    "embedding_norm_stats": q_embedding_norm_stats,
    "events_interarrival_cv": q_events_interarrival_cv,
    "text_hapax_ratio": q_text_hapax_ratio,
    "text_bigram_logprob": q_text_bigram_logprob,
    "metric_slo_error_budget": q_metric_slo_error_budget,
    "dedup_cluster_sizes": q_dedup_cluster_sizes,
    "sessions_bounce": q_sessions_bounce,
    "orders_repeat_rate": q_orders_repeat_rate,
    "events_markov_accuracy": q_events_markov_accuracy,
    "events_next_entropy": q_events_next_entropy,
    "events_audience_overlap": q_events_audience_overlap,
    "funnel_window_depth": q_funnel_window_depth,
    "events_retention_bitmap_wide": q_events_retention_bitmap_wide,
    "corpus_heaps_law": q_corpus_heaps_law,
    "events_ab_test_cuped": q_events_ab_test_cuped,
    "corpus_dedup_impact": q_corpus_dedup_impact,
    "embedding_pair_cosine_hist": q_embedding_pair_cosine_hist,
    "lineitem_ship_delay": q_lineitem_ship_delay,
    "graph_degree_hist": q_graph_degree_hist,
}

ORACLES: dict[str, str] = {
    "text_burstiness": ORACLE_BURSTINESS,
    "events_ab_test": ORACLE_AB_TEST,
    "events_ab_power": ORACLE_AB_POWER,
    "events_ab_srm": ORACLE_AB_SRM,
    "text_kneser_ney": ORACLE_KNESER_NEY,
    "text_trending_terms": ORACLE_TRENDING_TERMS,
    "events_ab_did": ORACLE_AB_DID,
    "events_dau_mau": ORACLE_DAU_MAU,
    "metric_hod_dow_heatmap": ORACLE_HOD_DOW,
    "quality_iqr_outliers": ORACLE_IQR_OUTLIERS,
    "orders_open_aging": ORACLE_OPEN_AGING,
    "embedding_norm_stats": ORACLE_NORM_STATS,
    "events_interarrival_cv": ORACLE_INTERARRIVAL,
    "text_hapax_ratio": ORACLE_HAPAX,
    "text_bigram_logprob": ORACLE_BIGRAM_LOGPROB,
    "metric_slo_error_budget": ORACLE_SLO_BUDGET,
    "dedup_cluster_sizes": _cluster_sizes_oracle(),
    "sessions_bounce": _bounce_oracle(),
    "orders_repeat_rate": ORACLE_REPEAT_RATE,
    "events_markov_accuracy": ORACLE_MARKOV_ACCURACY,
    "events_next_entropy": ORACLE_NEXT_ENTROPY,
    "events_audience_overlap": ORACLE_AUDIENCE_OVERLAP,
    "funnel_window_depth": ORACLE_FUNNEL_WINDOW,
    "events_retention_bitmap_wide": ORACLE_RETENTION_WIDE,
    "corpus_heaps_law": ORACLE_HEAPS,
    "events_ab_test_cuped": ORACLE_CUPED,
    "corpus_dedup_impact": _dedup_impact_oracle(),
    "embedding_pair_cosine_hist": ORACLE_COSINE_HIST,
    "lineitem_ship_delay": ORACLE_SHIP_DELAY,
    "graph_degree_hist": _degree_hist_oracle(),
}
