"""Series randomness / stationarity diagnostics + corpus effect-size
statistics (round 11).

Reference parity: the reference engine (Go, ~/reference —
aggregation/aggregation_rule.go) emits windowed aggregates; this
module answers the battery of follow-up questions a monitoring team
asks OF that output before trusting any model fitted to it: "is the
series random noise or structured?" (Wald-Wolfowitz runs test,
turning-point test), "is there autocorrelation at ANY lag, jointly?"
(Ljung-Box portmanteau over the correlogram family's lags), "is the
level stationary enough to baseline?" (KPSS), "is it long-range
dependent?" (Hurst rescaled range) — each Spark-first and
DuckDB-oracle-backed.

Numerics (house style): hourly values ride as exact scaled integers
(e2 = value·100, DEC38/HUGEINT sums); every statistic stays integer
until ONE fixed-shape double expression; per-lag / per-cell float
terms are PRE-ROUNDED to integers so their sums are exact and
order-independent; ``stable_round`` on every reported double.

Scale posture (per query, also in each docstring): every operator
collapses the raw scan to the |metrics|×|hours| series (ONE shuffle
with map-side partials) or |sources|/|brands|-bounded moment rows;
windows are always partitioned by the metric/source key; the only
joins after collapse are key-bounded (metric-sized broadcast or
vocabulary-co-partitioned).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.plans.spectral import _HOURLY_SQL, _hourly_e2
from monasca_aggregator_spark.sources.tables import load_table

_DEC = "decimal(38,0)"

_RT_MIN_HOURS = 48  # runs/turning-point tests need a real series
_LB_LAGS = 12  # Ljung-Box portmanteau lags (Box-Jenkins default m≈n/60)
_LB_CHI2_05_12 = 21.0261  # χ²(12) upper 5% critical value
_KPSS_CRIT_05 = 0.463  # KPSS level-stationarity 5% critical value


# ---------------------------------------- Wald-Wolfowitz runs test


def q_metric_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WALD-WOLFOWITZ RUNS TEST per metric (Wald & Wolfowitz 1940):
    the hourly series dichotomizes against its exact median (ties
    dropped, the classical convention) and the run count R over the
    above/below sign sequence tests randomness — too FEW runs means
    level clustering (regimes/trend), too MANY means oscillation
    (negative autocorrelation). The nonparametric gatekeeper for the
    family's baseline/anomaly rows: a series that fails it violates
    the i.i.d. assumption trailing-window z-scores lean on.

    Exactness: the median rides as m2 = v_lo + v_hi (the two middle
    order statistics under a deterministic (v, h) ordering — exact
    integers, no engine median() semantics); signs compare 2v vs m2
    exactly; R, n1, n2 are exact counts; E[R], Var[R], z are ONE
    fixed-shape double expression. stable_round(4).

    Scale: ranking + lag are windows over the collapsed
    |metrics|×|hours| series partitioned BY METRIC; the median
    join-back broadcasts a metric-sized relation."""
    hourly = _hourly_e2(spark, sf_dir)
    n_ok = (
        hourly.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n_hours"))
        .filter(F.col("n_hours") >= _RT_MIN_HOURS)
    )
    h = hourly.join(F.broadcast(n_ok), "event_type")
    rn = F.row_number().over(
        Window.partitionBy("event_type").orderBy("v", "h")
    )
    ranked = h.select("event_type", "n_hours", "h", "v", rn.alias("rn"))
    lo = F.floor((F.col("n_hours") + 1) / 2)
    hi = F.floor(F.col("n_hours") / 2) + 1
    m2 = (
        ranked.groupBy("event_type")
        .agg(
            (
                F.sum(F.when(F.col("rn") == lo, F.col("v")).otherwise(0))
                + F.sum(
                    F.when(F.col("rn") == hi, F.col("v")).otherwise(0)
                )
            ).alias("m2")
        )
    )
    signed = (
        h.join(F.broadcast(m2), "event_type")
        .withColumn(
            "s",
            F.when(2 * F.col("v") > F.col("m2"), F.lit(1)).when(
                2 * F.col("v") < F.col("m2"), F.lit(0)
            ),
        )
        .filter(F.col("s").isNotNull())
    )
    wh = Window.partitionBy("event_type").orderBy("h")
    runs = signed.withColumn(
        "chg",
        F.when(
            F.lag("s").over(wh).isNotNull()
            & (F.col("s") != F.lag("s").over(wh)),
            1,
        ).otherwise(0),
    )
    agg = runs.groupBy("event_type").agg(
        (F.sum("chg") + 1).alias("r"),
        F.sum("s").alias("n1"),
        (F.count(F.lit(1)) - F.sum("s")).alias("n2"),
    )
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    n = n1 + n2
    e_r = 1 + 2 * n1 * n2 / n
    var_r = (
        2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    )
    z = (F.col("r").cast("double") - e_r) / F.sqrt(var_r)
    degenerate = (F.col("n1") == 0) | (F.col("n2") == 0)
    return agg.select(
        "event_type",
        F.col("r").cast("long").alias("runs"),
        F.col("n1").cast("long").alias("n_above"),
        F.col("n2").cast("long").alias("n_below"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(e_r, 4))
        .alias("expected_runs"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(z, 4))
        .alias("z_score"),
        F.when(degenerate, F.lit("degenerate"))
        .when(z < -1.96, F.lit("clustered"))
        .when(z > 1.96, F.lit("oscillating"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    ).orderBy("event_type")


ORACLE_RUNS_TEST = f"""
WITH hourly AS (
{_HOURLY_SQL}
), ok AS (
  SELECT event_type, count(*) AS n_hours FROM hourly GROUP BY 1
  HAVING count(*) >= {_RT_MIN_HOURS}
), ranked AS (
  SELECT h.event_type, ok.n_hours, h.h, h.v,
         row_number() OVER (PARTITION BY h.event_type
                            ORDER BY h.v, h.h) AS rn
  FROM hourly h JOIN ok USING (event_type)
), med AS (
  SELECT event_type,
         sum(CASE WHEN rn = (n_hours + 1) // 2 THEN v ELSE 0 END)
         + sum(CASE WHEN rn = n_hours // 2 + 1 THEN v ELSE 0 END)
           AS m2
  FROM ranked GROUP BY 1
), signed AS (
  SELECT h.event_type, h.h,
         CASE WHEN 2 * h.v > m.m2 THEN 1
              WHEN 2 * h.v < m.m2 THEN 0 END AS s
  FROM hourly h JOIN med m USING (event_type)
  JOIN ok USING (event_type)
  WHERE 2 * h.v <> m.m2
), runs AS (
  SELECT event_type, s,
         CASE WHEN lag(s) OVER (PARTITION BY event_type ORDER BY h)
                   IS NOT NULL
               AND s <> lag(s) OVER (PARTITION BY event_type
                                     ORDER BY h)
              THEN 1 ELSE 0 END AS chg
  FROM signed
), agg AS (
  SELECT event_type, sum(chg) + 1 AS r, sum(s) AS n1,
         count(*) - sum(s) AS n2
  FROM runs GROUP BY 1
)
SELECT event_type, CAST(r AS BIGINT) AS runs,
       CAST(n1 AS BIGINT) AS n_above, CAST(n2 AS BIGINT) AS n_below,
       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
       {sql_stable_round(
           "1 + 2.0 * n1 * n2 / (n1 + n2)", 4)} END AS expected_runs,
       CASE WHEN n1 = 0 OR n2 = 0 THEN NULL ELSE
       {sql_stable_round(
           "(CAST(r AS DOUBLE) - (1 + 2.0 * n1 * n2 / (n1 + n2)))"
           " / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))"
           "        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)"
           "           * (n1 + n2 - 1)))", 4)} END AS z_score,
       CASE WHEN n1 = 0 OR n2 = 0 THEN 'degenerate'
            WHEN (CAST(r AS DOUBLE) - (1 + 2.0 * n1 * n2 / (n1 + n2)))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))) < -1.96
              THEN 'clustered'
            WHEN (CAST(r AS DOUBLE) - (1 + 2.0 * n1 * n2 / (n1 + n2)))
                 / sqrt(2.0 * n1 * n2 * (2.0 * n1 * n2 - (n1 + n2))
                        / (CAST(n1 + n2 AS DOUBLE) * (n1 + n2)
                           * (n1 + n2 - 1))) > 1.96
              THEN 'oscillating'
            ELSE 'random' END AS verdict
FROM agg ORDER BY event_type
""".strip()


# ----------------------------------------------- Ljung-Box portmanteau


def q_metric_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LJUNG-BOX PORTMANTEAU test per metric (Ljung & Box 1978):
    Q = n(n+2)·Σ_k ρ̂_k²/(n−k) over lags 1..{_LB_LAGS} of the hourly
    series — the JOINT "is there autocorrelation at any lag?" answer
    the family's per-lag correlogram row leaves to eyeballing. ρ̂_k
    is the pairwise-complete Pearson autocorrelation (the
    correlogram's own estimator, so the two rows agree by
    construction); n is the series length in observed hours.

    Exactness: per-lag Pearson sums are exact integers; each lag's
    ρ̂_k²/(n−k) term pre-rounds to an e12 integer so Q's sum is
    exact and order-independent across partitionings and engines;
    ONE final multiply-divide in double. stable_round(4).

    Scale: identical shape to the correlogram (series-sized ×
    {_LB_LAGS} lag explosion, map-side-partial Pearson sums), then a
    metric-sized aggregate of the {_LB_LAGS} pre-rounded terms."""
    hourly = _hourly_e2(spark, sf_dir)
    n_h = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours")
    )
    lagged = hourly.select(
        "event_type",
        F.explode(F.sequence(F.lit(1), F.lit(_LB_LAGS))).alias("lag"),
        (F.col("h") + F.col("lag")).alias("h2"),
        F.col("v").alias("x"),
    )
    y = hourly.select(
        "event_type", F.col("h").alias("h2"), F.col("v").alias("y")
    )
    sums = (
        lagged.join(y, ["event_type", "h2"])
        .groupBy("event_type", "lag")
        .agg(
            F.count(F.lit(1)).alias("np"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x").cast(_DEC) * F.col("y").cast(_DEC)).alias(
                "sxy"
            ),
            F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).alias(
                "sxx"
            ),
            F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).alias(
                "syy"
            ),
        )
        .filter(F.col("np") >= 3)
        .join(F.broadcast(n_h), "event_type")
    )
    num = (
        F.col("np").cast(_DEC) * F.col("sxy")
        - F.col("sx").cast(_DEC) * F.col("sy").cast(_DEC)
    ).cast("double")
    vx = (
        F.col("np").cast(_DEC) * F.col("sxx")
        - F.col("sx").cast(_DEC) * F.col("sx").cast(_DEC)
    ).cast("double")
    vy = (
        F.col("np").cast(_DEC) * F.col("syy")
        - F.col("sy").cast(_DEC) * F.col("sy").cast(_DEC)
    ).cast("double")
    rho = num / F.sqrt(vx * vy)
    term_e12 = F.floor(
        rho * rho
        / (F.col("n_hours").cast("double") - F.col("lag"))
        * F.lit(1e12)
        + F.lit(0.5)
    ).cast("long")
    agg = sums.select(
        "event_type", "n_hours", term_e12.alias("t12")
    ).groupBy("event_type", "n_hours").agg(
        F.count(F.lit(1)).alias("n_lags"),
        F.sum("t12").alias("s12"),
    )
    n = F.col("n_hours").cast("double")
    q_stat = n * (n + 2) * F.col("s12").cast("double") / F.lit(1e12)
    full = F.col("n_lags") == _LB_LAGS
    return agg.select(
        "event_type",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("n_lags").cast("int").alias("n_lags"),
        stable_round(q_stat, 4).alias("lb_q"),
        F.when(~full, F.lit(None).cast("string"))
        .when(q_stat > _LB_CHI2_05_12, F.lit("autocorrelated"))
        .otherwise(F.lit("white_noise"))
        .alias("verdict"),
    ).orderBy("event_type")


ORACLE_LJUNG_BOX = f"""
WITH hourly AS (
{_HOURLY_SQL}
), nh AS (
  SELECT event_type, count(*) AS n_hours FROM hourly GROUP BY 1
), pairs AS (
  SELECT a.event_type, l.lag, a.v AS x, b.v AS y
  FROM hourly a,
       unnest(range(1, {_LB_LAGS} + 1)) AS l(lag),
       hourly b
  WHERE b.event_type = a.event_type AND b.h = a.h + l.lag
), s AS (
  SELECT event_type, lag, count(*) AS np,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY 1, 2 HAVING count(*) >= 3
), terms AS (
  SELECT s.event_type, nh.n_hours,
         CAST(floor(
           pow(CAST(np * sxy - sx * sy AS DOUBLE)
               / sqrt(CAST(np * sxx - sx * sx AS DOUBLE)
                      * CAST(np * syy - sy * sy AS DOUBLE)), 2)
           / (CAST(nh.n_hours AS DOUBLE) - s.lag) * 1e12 + 0.5
         ) AS BIGINT) AS t12
  FROM s JOIN nh USING (event_type)
), agg AS (
  SELECT event_type, n_hours, count(*) AS n_lags,
         CAST(sum(t12) AS BIGINT) AS s12
  FROM terms GROUP BY 1, 2
)
SELECT event_type, CAST(n_hours AS BIGINT) AS n_hours,
       CAST(n_lags AS INT) AS n_lags,
       {sql_stable_round(
           "CAST(n_hours AS DOUBLE) * (n_hours + 2)"
           " * CAST(s12 AS DOUBLE) / 1e12", 4)} AS lb_q,
       CASE WHEN n_lags <> {_LB_LAGS} THEN NULL
            WHEN CAST(n_hours AS DOUBLE) * (n_hours + 2)
                 * CAST(s12 AS DOUBLE) / 1e12 > {_LB_CHI2_05_12}
              THEN 'autocorrelated'
            ELSE 'white_noise' END AS verdict
FROM agg ORDER BY event_type
""".strip()


# -------------------------------------------------- KPSS stationarity


def q_metric_kpss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KPSS LEVEL-STATIONARITY test per metric (Kwiatkowski,
    Phillips, Schmidt & Shin 1992, lag-0 short-run variance variant):
    η = Σ_t S_t² / (n²·σ̂²) over the demeaned hourly series' partial
    sums — the null is STATIONARITY, making it the complement of the
    family's Mann-Kendall row (whose null is no-trend): a series
    rejecting both is trend-nonstationary; rejecting neither is
    safely baseline-able. The lag-0 variant is exact-integer
    friendly and documented (long-run-variance bandwidths trade
    exactness for HAC robustness this synthetic series doesn't
    need).

    Exactness: with P_t the prefix sum and S the total,
    n·S_t = n·P_t − t·S stays integer; η = Σ(nP_t−tS)² /
    (n²(nΣv²−S²)) is exact integers with ONE double division.
    stable_round(6).

    Scale: ONE prefix-sum window over the collapsed series
    partitioned BY METRIC, then a metric-sized aggregate."""
    hourly = _hourly_e2(spark, sf_dir)
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC)).alias("q"),
    ).filter(F.col("n") >= _RT_MIN_HOURS)
    wh = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type").orderBy("h")
    pref = hourly.select(
        "event_type",
        F.sum("v").over(wh).alias("p"),
        F.row_number().over(wt).alias("t"),
    )
    j = pref.join(F.broadcast(tot), "event_type")
    ns_t = (
        F.col("n").cast(_DEC) * F.col("p").cast(_DEC)
        - F.col("t").cast(_DEC) * F.col("s").cast(_DEC)
    )
    agg = j.groupBy("event_type", "n", "s", "q").agg(
        F.sum(ns_t * ns_t).alias("ss2")
    )
    den = (
        F.col("n").cast(_DEC)
        * F.col("n").cast(_DEC)
        * (
            F.col("n").cast(_DEC) * F.col("q")
            - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
        )
    ).cast("double")
    eta = F.col("ss2").cast("double") / den
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        stable_round(eta, 6).alias("kpss_eta"),
        F.when(eta > _KPSS_CRIT_05, F.lit("nonstationary"))
        .otherwise(F.lit("stationary"))
        .alias("verdict"),
    ).orderBy("event_type")


ORACLE_KPSS = f"""
WITH hourly AS (
{_HOURLY_SQL}
), tot AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS HUGEINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS q
  FROM hourly GROUP BY 1 HAVING count(*) >= {_RT_MIN_HOURS}
), pref AS (
  SELECT event_type,
         sum(v) OVER (PARTITION BY event_type ORDER BY h
                      ROWS UNBOUNDED PRECEDING) AS p,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS t
  FROM hourly
), agg AS (
  SELECT p.event_type, t.n, t.s, t.q,
         sum((CAST(t.n AS HUGEINT) * p.p - p.t * t.s)
             * (CAST(t.n AS HUGEINT) * p.p - p.t * t.s)) AS ss2
  FROM pref p JOIN tot t USING (event_type)
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       {sql_stable_round(
           "CAST(ss2 AS DOUBLE)"
           " / CAST(CAST(n AS HUGEINT) * n * (CAST(n AS HUGEINT) * q"
           "        - s * s) AS DOUBLE)", 6)} AS kpss_eta,
       CASE WHEN CAST(ss2 AS DOUBLE)
                 / CAST(CAST(n AS HUGEINT) * n * (CAST(n AS HUGEINT)
                        * q - s * s) AS DOUBLE) > {_KPSS_CRIT_05}
            THEN 'nonstationary' ELSE 'stationary' END AS verdict
FROM agg ORDER BY event_type
""".strip()


# ------------------------------------------------ turning-point test


def q_metric_turning_points(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TURNING-POINT randomness test per metric (the classical
    Kendall peaks-and-troughs count): T = #{t : v_{t−1}<v_t>v_{t+1}
    or v_{t−1}>v_t<v_{t+1}} over the hourly series (strict — ties
    yield no turning point), against E[T]=2(n−2)/3 and
    Var[T]=(16n−29)/90 under i.i.d. — the cheap local-structure
    screen beside the runs test's global one: smooth trends turn too
    RARELY, alternating noise too OFTEN.

    Exactness: T is an exact count from strict integer comparisons;
    E, Var, z are one fixed-shape double expression. stable_round(4).

    Scale: one lag/lead window over the collapsed series partitioned
    BY METRIC, then a metric-sized aggregate."""
    hourly = _hourly_e2(spark, sf_dir)
    wh = Window.partitionBy("event_type").orderBy("h")
    lagged = hourly.select(
        "event_type",
        "v",
        F.lag("v").over(wh).alias("pv"),
        F.lead("v").over(wh).alias("nv"),
    )
    tp = F.when(
        (
            (F.col("pv") < F.col("v")) & (F.col("v") > F.col("nv"))
        )
        | ((F.col("pv") > F.col("v")) & (F.col("v") < F.col("nv"))),
        1,
    ).otherwise(0)
    agg = (
        lagged.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                F.when(
                    F.col("pv").isNotNull() & F.col("nv").isNotNull(),
                    tp,
                ).otherwise(0)
            ).alias("t"),
        )
        .filter(F.col("n") >= _RT_MIN_HOURS)
    )
    n = F.col("n").cast("double")
    e_t = 2 * (n - 2) / 3
    var_t = (16 * n - 29) / 90
    z = (F.col("t").cast("double") - e_t) / F.sqrt(var_t)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("t").cast("long").alias("turning_points"),
        stable_round(e_t, 4).alias("expected"),
        stable_round(z, 4).alias("z_score"),
        F.when(z < -1.96, F.lit("smooth"))
        .when(z > 1.96, F.lit("alternating"))
        .otherwise(F.lit("random"))
        .alias("verdict"),
    ).orderBy("event_type")


ORACLE_TURNING_POINTS = f"""
WITH hourly AS (
{_HOURLY_SQL}
), lagged AS (
  SELECT event_type, v,
         lag(v) OVER (PARTITION BY event_type ORDER BY h) AS pv,
         lead(v) OVER (PARTITION BY event_type ORDER BY h) AS nv
  FROM hourly
), agg AS (
  SELECT event_type, count(*) AS n,
         sum(CASE WHEN pv IS NOT NULL AND nv IS NOT NULL
                   AND ((pv < v AND v > nv) OR (pv > v AND v < nv))
                  THEN 1 ELSE 0 END) AS t
  FROM lagged GROUP BY 1 HAVING count(*) >= {_RT_MIN_HOURS}
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       CAST(t AS BIGINT) AS turning_points,
       {sql_stable_round("2.0 * (n - 2) / 3", 4)} AS expected,
       {sql_stable_round(
           "(CAST(t AS DOUBLE) - 2.0 * (n - 2) / 3)"
           " / sqrt((16.0 * n - 29) / 90)", 4)} AS z_score,
       CASE WHEN (CAST(t AS DOUBLE) - 2.0 * (n - 2) / 3)
                 / sqrt((16.0 * n - 29) / 90) < -1.96 THEN 'smooth'
            WHEN (CAST(t AS DOUBLE) - 2.0 * (n - 2) / 3)
                 / sqrt((16.0 * n - 29) / 90) > 1.96
              THEN 'alternating'
            ELSE 'random' END AS verdict
FROM agg ORDER BY event_type
""".strip()


# ------------------------------------------- Hurst rescaled range R/S


def q_metric_hurst_rs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HURST RESCALED RANGE per metric (Hurst 1951; Mandelbrot &
    Wallis 1969): R/S = range(demeaned partial sums)/stddev over the
    full hourly window, and the single-window Hurst proxy
    H ≈ ln(R/S)/ln(n/2) — the long-range-dependence screen beside
    KPSS: H≈0.5 is memoryless, H→1 says shocks persist (capacity
    forecasts must widen), H<0.5 says mean-reverting (the AR(1) row's
    regime). Single-window by design — the multi-scale log-log fit
    adds estimator variance the dashboard doesn't need.

    Exactness: n·S_t = n·P_t − t·S keeps partial sums integer;
    R/S = (max − min of nS_t) / sqrt(nΣv²−S²) is exact integers into
    ONE double expression (both √n factors cancel). stable_round(6).

    Scale: one prefix-sum window partitioned BY METRIC + a
    metric-sized aggregate — same shape as KPSS."""
    hourly = _hourly_e2(spark, sf_dir)
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC)).alias("q"),
    ).filter(F.col("n") >= _RT_MIN_HOURS)
    wh = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wt = Window.partitionBy("event_type").orderBy("h")
    pref = hourly.select(
        "event_type",
        F.sum("v").over(wh).alias("p"),
        F.row_number().over(wt).alias("t"),
    )
    j = pref.join(F.broadcast(tot), "event_type")
    ns_t = (
        F.col("n").cast(_DEC) * F.col("p").cast(_DEC)
        - F.col("t").cast(_DEC) * F.col("s").cast(_DEC)
    )
    agg = j.groupBy("event_type", "n", "s", "q").agg(
        F.max(ns_t).alias("mx"),
        F.min(ns_t).alias("mn"),
    )
    # R/S = ((mx-mn)/n) / (sqrt(n q - s²)/n) — the n's cancel
    rs = (F.col("mx") - F.col("mn")).cast("double") / F.sqrt(
        (
            F.col("n").cast(_DEC) * F.col("q")
            - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
        ).cast("double")
    )
    n = F.col("n").cast("double")
    hurst = F.log(rs) / F.log(n / 2)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        stable_round(rs, 6).alias("rescaled_range"),
        stable_round(hurst, 4).alias("hurst"),
        F.when(hurst > 0.65, F.lit("persistent"))
        .when(hurst < 0.35, F.lit("mean_reverting"))
        .otherwise(F.lit("memoryless"))
        .alias("regime"),
    ).orderBy("event_type")


ORACLE_HURST_RS = f"""
WITH hourly AS (
{_HOURLY_SQL}
), tot AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS HUGEINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS q
  FROM hourly GROUP BY 1 HAVING count(*) >= {_RT_MIN_HOURS}
), pref AS (
  SELECT event_type,
         sum(v) OVER (PARTITION BY event_type ORDER BY h
                      ROWS UNBOUNDED PRECEDING) AS p,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS t
  FROM hourly
), agg AS (
  SELECT p.event_type, t.n, t.s, t.q,
         max(CAST(t.n AS HUGEINT) * p.p - p.t * t.s) AS mx,
         min(CAST(t.n AS HUGEINT) * p.p - p.t * t.s) AS mn
  FROM pref p JOIN tot t USING (event_type)
  GROUP BY 1, 2, 3, 4
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       {sql_stable_round(
           "CAST(mx - mn AS DOUBLE)"
           " / sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE))",
           6)} AS rescaled_range,
       {sql_stable_round(
           "ln(CAST(mx - mn AS DOUBLE)"
           "   / sqrt(CAST(CAST(n AS HUGEINT) * q - s * s"
           "          AS DOUBLE))) / ln(CAST(n AS DOUBLE) / 2)",
           4)} AS hurst,
       CASE WHEN ln(CAST(mx - mn AS DOUBLE)
                    / sqrt(CAST(CAST(n AS HUGEINT) * q - s * s
                           AS DOUBLE))) / ln(CAST(n AS DOUBLE) / 2)
                 > 0.65 THEN 'persistent'
            WHEN ln(CAST(mx - mn AS DOUBLE)
                    / sqrt(CAST(CAST(n AS HUGEINT) * q - s * s
                           AS DOUBLE))) / ln(CAST(n AS DOUBLE) / 2)
                 < 0.35 THEN 'mean_reverting'
            ELSE 'memoryless' END AS regime
FROM agg ORDER BY event_type
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "metric_runs_test": q_metric_runs_test,
    "metric_ljung_box": q_metric_ljung_box,
    "metric_kpss": q_metric_kpss,
    "metric_turning_points": q_metric_turning_points,
    "metric_hurst_rs": q_metric_hurst_rs,
}

ORACLES: dict[str, str] = {
    "metric_runs_test": ORACLE_RUNS_TEST,
    "metric_ljung_box": ORACLE_LJUNG_BOX,
    "metric_kpss": ORACLE_KPSS,
    "metric_turning_points": ORACLE_TURNING_POINTS,
    "metric_hurst_rs": ORACLE_HURST_RS,
}


# ================================ text / corpus statistics (round 11)

_OR_ALPHA0 = 1000.0  # Dirichlet prior strength (Monroe et al. 2008)
_OR_MIN_COUNT = 5  # corpus count floor before a word can rank
_OR_TOPK = 5  # characteristic words reported per source
_CE_MIN_BIGRAMS = 50  # bigram floor before conditional entropy means much
_NG13 = 13  # the GPT-3 decontamination n-gram length
_NG13_BENCH_MOD = 20  # doc_id % 20 == 0 is the 'benchmark' slice


def q_text_odds_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FIGHTIN' WORDS log-odds keywords per source (Monroe, Colaresi
    & Quinn 2008): for each (source, word), the log-odds-ratio of the
    word in the source vs the REST of the corpus, shrunk by an
    informative Dirichlet prior α_w = α₀·y_w/N and standardized by
    its asymptotic variance 1/(y_sw+α_w) + 1/(y_rw+α_w) — the
    statistically-grounded upgrade of raw TF-IDF "characteristic
    terms": the prior damps high-frequency words without a stoplist
    and the z-scale makes sources comparable. Top-{_OR_TOPK} words
    per source by z.

    Exactness: all counts exact integers; α, δ, σ, z are ONE
    fixed-shape double expression per (source, word); ranking is on
    the PRE-ROUNDED e6 integer z (word breaks ties) so the top-K cut
    is engine-stable.

    Scale: the corpus explode collapses to (source, word) counts
    (map-side partials); word totals join co-partitioned ON WORD
    (vocabulary-sized, never corpus-sized); source totals and the
    corpus total broadcast (|sources| and 1 row); the per-source
    top-K is a partitioned window over ≤ vocabulary rows."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    words = docs.select(
        "source",
        F.explode(
            F.split(F.lower(F.trim(F.col("text"))), r"\s+")
        ).alias("w"),
    )
    y_sw = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("y_sw")
    )
    n_s = words.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    y_w = (
        words.groupBy("w")
        .agg(F.count(F.lit(1)).alias("y_w"))
        .filter(F.col("y_w") >= _OR_MIN_COUNT)
    )
    n_tot = words.agg(F.count(F.lit(1)).alias("n_corpus"))
    j = (
        y_sw.join(y_w, "w")
        .join(F.broadcast(n_s), "source")
        .join(F.broadcast(n_tot))
    )
    alpha = (
        F.lit(_OR_ALPHA0)
        * F.col("y_w").cast("double")
        / F.col("n_corpus").cast("double")
    )
    ysw = F.col("y_sw").cast("double")
    yrw = (F.col("y_w") - F.col("y_sw")).cast("double")
    ns = F.col("n_s").cast("double")
    nr = (F.col("n_corpus") - F.col("n_s")).cast("double")
    delta = F.log(
        (ysw + alpha) / (ns + F.lit(_OR_ALPHA0) - ysw - alpha)
    ) - F.log((yrw + alpha) / (nr + F.lit(_OR_ALPHA0) - yrw - alpha))
    z = delta / F.sqrt(1.0 / (ysw + alpha) + 1.0 / (yrw + alpha))
    z_e6 = F.floor(z * F.lit(1e6) + F.lit(0.5)).cast("long")
    ranked = j.select(
        "source", "w", "y_sw", z_e6.alias("z_e6")
    ).withColumn(
        "rank",
        F.row_number().over(
            Window.partitionBy("source").orderBy(
                F.col("z_e6").desc(), F.col("w")
            )
        ),
    )
    return (
        ranked.filter(F.col("rank") <= _OR_TOPK)
        .select(
            "source",
            F.col("rank").cast("int").alias("rank"),
            F.col("w").alias("word"),
            F.col("y_sw").cast("long").alias("n_in_source"),
            stable_round(F.col("z_e6").cast("double") / 1e6, 4).alias(
                "log_odds_z"
            ),
        )
        .orderBy("source", "rank")
    )


ORACLE_ODDS_RATIO = rf"""
WITH words AS (
  SELECT source,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS w
  FROM documents
), ysw AS (
  SELECT source, w, count(*) AS y_sw FROM words GROUP BY 1, 2
), ns AS (
  SELECT source, count(*) AS n_s FROM words GROUP BY 1
), yw AS (
  SELECT w, count(*) AS y_w FROM words GROUP BY 1
  HAVING count(*) >= {_OR_MIN_COUNT}
), tot AS (
  SELECT count(*) AS n_corpus FROM words
), z AS (
  SELECT ysw.source, ysw.w, ysw.y_sw,
         CAST(floor(
           (ln((ysw.y_sw + {_OR_ALPHA0} * yw.y_w / tot.n_corpus)
               / (ns.n_s + {_OR_ALPHA0} - ysw.y_sw
                  - {_OR_ALPHA0} * yw.y_w / tot.n_corpus))
            - ln((yw.y_w - ysw.y_sw
                  + {_OR_ALPHA0} * yw.y_w / tot.n_corpus)
                 / (tot.n_corpus - ns.n_s + {_OR_ALPHA0}
                    - (yw.y_w - ysw.y_sw)
                    - {_OR_ALPHA0} * yw.y_w / tot.n_corpus)))
           / sqrt(1.0 / (ysw.y_sw
                         + {_OR_ALPHA0} * yw.y_w / tot.n_corpus)
                  + 1.0 / (yw.y_w - ysw.y_sw
                           + {_OR_ALPHA0} * yw.y_w / tot.n_corpus))
           * 1e6 + 0.5) AS BIGINT) AS z_e6
  FROM ysw JOIN yw USING (w) JOIN ns USING (source), tot
), ranked AS (
  SELECT source, w, y_sw, z_e6,
         row_number() OVER (PARTITION BY source
                            ORDER BY z_e6 DESC, w) AS rank
  FROM z
)
SELECT source, CAST(rank AS INT) AS rank, w AS word,
       CAST(y_sw AS BIGINT) AS n_in_source,
       {sql_stable_round("CAST(z_e6 AS DOUBLE) / 1e6", 4)}
         AS log_odds_z
FROM ranked WHERE rank <= {_OR_TOPK}
ORDER BY source, rank
""".strip()


# -------------------------------------- bigram conditional entropy


def q_text_bigram_cond_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BIGRAM CONDITIONAL ENTROPY H(w₂|w₁) per source (Shannon 1951's
    printed-English estimate, corpus form): Σ (c₁₂/N)·ln(c₁/c₁₂)
    over within-doc adjacent token pairs — how predictable the NEXT
    token is given the current one. The sequential complement to the
    family's unigram entropy / LZ78 rows: templated or looping
    sources score low (next token forced), diverse prose scores near
    its branching capacity. exp(H) is the effective branching
    factor, directly comparable across sources.

    Exactness: bigram and head counts are exact integers; each
    bigram's c₁₂·ln(c₁/c₁₂) term pre-rounds to an e9 integer so the
    per-source sum is exact and order-independent; ONE division by N
    at the end. stable_round(6)/(4).

    Scale: the bigram explode collapses to (source, w₁, w₂) counts
    with map-side partials (vocabulary²-bounded, never raw-corpus-
    sized); head counts join co-partitioned on (source, w₁); source
    totals broadcast."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select(
        "source",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t"),
    ).filter(F.size("t") >= 2)
    pairs = toks.select(
        "source",
        F.explode(
            F.expr(
                "transform(sequence(1, size(t) - 1),"
                " i -> struct(element_at(t, i) AS w1,"
                "             element_at(t, i + 1) AS w2))"
            )
        ).alias("bg"),
    ).select("source", F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    c12 = pairs.groupBy("source", "w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    c1 = c12.groupBy("source", "w1").agg(F.sum("c12").alias("c1"))
    n = c12.groupBy("source").agg(
        F.sum("c12").alias("n_bigrams"),
        F.count(F.lit(1)).alias("n_distinct"),
    ).filter(F.col("n_bigrams") >= _CE_MIN_BIGRAMS)
    term_e9 = F.floor(
        F.col("c12").cast("double")
        * F.log(F.col("c1").cast("double") / F.col("c12").cast("double"))
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    s = (
        c12.join(c1, ["source", "w1"])
        .select("source", term_e9.alias("t9"))
        .groupBy("source")
        .agg(F.sum("t9").alias("s9"))
    )
    h = (
        F.col("s9").cast("double")
        / F.lit(1e9)
        / F.col("n_bigrams").cast("double")
    )
    return (
        s.join(F.broadcast(n), "source")
        .select(
            "source",
            F.col("n_bigrams").cast("long").alias("n_bigrams"),
            F.col("n_distinct").cast("long").alias("n_distinct_bigrams"),
            stable_round(h, 6).alias("cond_entropy_nats"),
            stable_round(F.exp(h), 4).alias("branching_factor"),
        )
        .orderBy("source")
    )


ORACLE_BIGRAM_COND_ENTROPY = rf"""
WITH toks AS (
  SELECT source, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents WHERE len(string_split_regex(lower(trim(text)),
                                              '\s+')) >= 2
), pairs AS (
  SELECT source, t[i] AS w1, t[i + 1] AS w2
  FROM toks, unnest(range(1, len(t))) AS u(i)
), c12 AS (
  SELECT source, w1, w2, count(*) AS c12 FROM pairs GROUP BY 1, 2, 3
), c1 AS (
  SELECT source, w1, sum(c12) AS c1 FROM c12 GROUP BY 1, 2
), n AS (
  SELECT source, CAST(sum(c12) AS BIGINT) AS n_bigrams,
         count(*) AS n_distinct
  FROM c12 GROUP BY 1 HAVING sum(c12) >= {_CE_MIN_BIGRAMS}
), s AS (
  SELECT c12.source,
         CAST(sum(CAST(floor(CAST(c12.c12 AS DOUBLE)
                             * ln(CAST(c1.c1 AS DOUBLE) / c12.c12)
                             * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS s9
  FROM c12 JOIN c1 USING (source, w1) GROUP BY 1
)
SELECT s.source, n.n_bigrams,
       CAST(n.n_distinct AS BIGINT) AS n_distinct_bigrams,
       {sql_stable_round(
           "CAST(s9 AS DOUBLE) / 1e9 / n_bigrams", 6)}
         AS cond_entropy_nats,
       {sql_stable_round(
           "exp(CAST(s9 AS DOUBLE) / 1e9 / n_bigrams)", 4)}
         AS branching_factor
FROM s JOIN n USING (source) ORDER BY source
""".strip()


# ---------------------------------- 13-gram benchmark decontamination


def q_decontaminate_ngram13(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """13-GRAM COLLISION decontamination (the GPT-3 appendix-C rule,
    Brown et al. 2020): a training doc is contaminated if ANY of its
    {_NG13}-token n-grams appears verbatim in the benchmark slice
    (doc_id % {_NG13_BENCH_MOD} == 0, the family's benchmark
    convention) — the strict exact-overlap complement to the trigram
    CONTAINMENT row (34e), which measures fuzzy coverage: this one
    catches verbatim leakage a coverage threshold can miss on long
    docs. Reports each contaminated doc with its hit count.

    Exactness: exact string-equality joins on the gram; counts are
    exact integers; contamination is one division. stable_round(4).

    Scale: the benchmark gram set is broadcast (benchmark slices are
    small by definition — eval sets, not corpora); the training side
    explodes to grams but never shuffles ON the gram — the join is a
    broadcast hash probe, then a doc-keyed count. Same posture as
    34e's broadcast containment."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select(
        "doc_id",
        F.split(F.lower(F.trim(F.col("text"))), r"\s+").alias("t"),
    ).filter(F.size("t") >= _NG13)
    grams = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(t) - {_NG13 - 1}),"
                f" i -> array_join(slice(t, i, {_NG13}), ' '))"
            )
        ).alias("g"),
    )
    bench = (
        grams.filter(F.col("doc_id") % _NG13_BENCH_MOD == 0)
        .select("g")
        .distinct()
    )
    train = grams.filter(F.col("doc_id") % _NG13_BENCH_MOD != 0)
    n_grams = train.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams13")
    )
    hits = (
        train.join(F.broadcast(bench), "g")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_hits"))
    )
    return (
        hits.join(n_grams, "doc_id")
        .select(
            "doc_id",
            F.col("n_grams13").cast("long").alias("n_grams13"),
            F.col("n_hits").cast("long").alias("n_hits"),
            stable_round(
                F.col("n_hits").cast("double")
                / F.col("n_grams13").cast("double"),
                4,
            ).alias("hit_fraction"),
        )
        .orderBy("doc_id")
    )


ORACLE_NGRAM13 = rf"""
WITH toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - {_NG13 - 2}),
                i -> array_to_string(t[i:i+{_NG13 - 1}], ' '))) AS g
  FROM toks WHERE len(t) >= {_NG13}
), b AS (
  SELECT DISTINCT g FROM grams WHERE doc_id % {_NG13_BENCH_MOD} = 0
), tr AS (
  SELECT doc_id, g FROM grams WHERE doc_id % {_NG13_BENCH_MOD} <> 0
), ng AS (
  SELECT doc_id, count(*) AS n_grams13 FROM tr GROUP BY 1
), hits AS (
  SELECT tr.doc_id, count(*) AS n_hits FROM tr JOIN b USING (g)
  GROUP BY 1
)
SELECT hits.doc_id, ng.n_grams13, hits.n_hits,
       {sql_stable_round(
           "CAST(n_hits AS DOUBLE) / n_grams13", 4)} AS hit_fraction
FROM hits JOIN ng USING (doc_id) ORDER BY doc_id
""".strip()


# --------------------------------- quality-vs-duplication cross signal


def q_quality_vs_duplication(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QUALITY × DUPLICATION cross-signal: per quality decile (the
    same distributed NTILE as the quality_deciles row), the exact
    duplicate rate 1 − distinct(normalized text)/docs — the lineage
    question every curation pipeline should answer before ordering
    its stages: if low-quality deciles are ALSO the duplicated ones,
    dedup-first saves the quality pass most of its work; if dup rate
    is flat, stage order is free. Uses the exact-dedup normalization
    (lowercase, strip non-alphanumerics, collapse whitespace) so the
    number agrees with the dedup family by construction.

    Exactness: decile assignment is the exact distributed rank
    (operators/rank.py — bucket histogram + broadcast offsets, no
    single-task global sort); dup rate is exact distinct counts; avg
    quality sums exact e4 integers.

    Scale: rank is the skew-safe bucketed form; the distinct count
    shuffles (decile, norm-text-hash)-keyed with map-side partials;
    output is 10 rows."""
    from monasca_aggregator_spark.operators.dedup import normalize_text
    from monasca_aggregator_spark.operators.rank import (
        global_rank,
        ntile_from_rank,
    )
    from monasca_aggregator_spark.operators.textops import quality_scores
    from monasca_aggregator_spark.plans.textops import N_DECILES

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    scores = quality_scores(docs).select("doc_id", "quality")
    ranked = global_rank(
        scores,
        F.floor(F.col("quality") * 50).cast("int"),
        [F.col("quality").asc(), F.col("doc_id").asc()],
        rank_col="rk",
        total_col="n_total",
    )
    decile = ntile_from_rank(
        F.col("rk"), F.col("n_total"), N_DECILES
    ).alias("decile")
    with_text = ranked.select("doc_id", "quality", decile).join(
        docs.select("doc_id", normalize_text(F.col("text")).alias("nt")),
        "doc_id",
    )
    q_e4 = F.floor(F.col("quality") * 10000 + F.lit(0.5)).cast("long")
    agg = with_text.select("decile", q_e4.alias("q_e4"), "nt").groupBy(
        "decile"
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("nt").alias("n_distinct"),
        F.sum("q_e4").alias("sq"),
    )
    return agg.select(
        F.col("decile").cast("int").alias("decile"),
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("n_distinct").cast("long").alias("n_distinct"),
        stable_round(
            1.0
            - F.col("n_distinct").cast("double")
            / F.col("n_docs").cast("double"),
            4,
        ).alias("dup_rate"),
        stable_round(
            F.col("sq").cast("double")
            / F.col("n_docs").cast("double")
            / 10000.0,
            4,
        ).alias("avg_quality"),
    ).orderBy("decile")


def _oracle_quality_vs_duplication() -> str:
    from monasca_aggregator_spark.plans.textops import (
        _QUALITY_EXPR,
        _STOPLIST_SQL,
        N_DECILES,
    )

    return rf"""
WITH t AS (
  SELECT doc_id, text,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text,
         len(toks) AS n_tokens,
         len(list_intersect(toks, {_STOPLIST_SQL})) AS n_stop,
         len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         length(text) AS n_chars
  FROM t
), q AS (
  SELECT doc_id, text, {_QUALITY_EXPR} AS quality FROM m
), r AS (
  SELECT doc_id, quality,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS nt,
         ntile({N_DECILES}) OVER (ORDER BY quality ASC, doc_id ASC)
           AS decile
  FROM q
)
SELECT CAST(decile AS INT) AS decile, count(*) AS n_docs,
       count(DISTINCT nt) AS n_distinct,
       {sql_stable_round(
           "1.0 - CAST(count(DISTINCT nt) AS DOUBLE) / count(*)", 4)}
         AS dup_rate,
       {sql_stable_round(
           "CAST(sum(CAST(floor(quality * 10000 + 0.5) AS BIGINT))"
           " AS DOUBLE) / count(*) / 10000.0", 4)} AS avg_quality
FROM r GROUP BY 1 ORDER BY 1
""".strip()


QUERIES.update(
    {
        "text_odds_ratio": q_text_odds_ratio,
        "text_bigram_cond_entropy": q_text_bigram_cond_entropy,
        "decontaminate_ngram13": q_decontaminate_ngram13,
        "quality_vs_duplication": q_quality_vs_duplication,
    }
)

ORACLES.update(
    {
        "text_odds_ratio": ORACLE_ODDS_RATIO,
        "text_bigram_cond_entropy": ORACLE_BIGRAM_COND_ENTROPY,
        "decontaminate_ngram13": ORACLE_NGRAM13,
        "quality_vs_duplication": _oracle_quality_vs_duplication(),
    }
)
