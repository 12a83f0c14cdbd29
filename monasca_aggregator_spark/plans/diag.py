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
    hourly = _hourly_e2(spark, sf_dir, cached=True)
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
    hourly = _hourly_e2(spark, sf_dir, cached=True)
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
    hourly = _hourly_e2(spark, sf_dir, cached=True)
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
    # r11 (guide §2.4): ONE corpus explode — the word totals, source
    # totals and corpus total all roll up exactly from the cached
    # (source, word) count table (every token lands in exactly one
    # cell, all partials are integer counts), where each previously
    # re-ran the explode as its own aggregate (4 corpus passes → 1).
    y_sw = (
        words.groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("y_sw"))
        .cache()
    )
    n_s = y_sw.groupBy("source").agg(F.sum("y_sw").alias("n_s"))
    y_w = (
        y_sw.groupBy("w")
        .agg(F.sum("y_sw").alias("y_w"))
        .filter(F.col("y_w") >= _OR_MIN_COUNT)
    )
    n_tot = y_sw.agg(F.sum("y_sw").alias("n_corpus"))
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
    ).cache()  # r11: feeds c1, n and the term join — one explode
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
    # r11 (guide §2.4): global_rank reads its input twice (rank
    # branch + bucket histogram) — cache the thin per-doc quality
    # projection so the corpus-wide quality scoring runs once, not
    # per branch (3 text scans → 2: the normalize join keeps its own
    # pushed-column scan).
    scores = quality_scores(docs).select("doc_id", "quality").cache()
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


# ============================== stats / tpch / graph batch (round 11)

_BF_MIN_DOCS = 5  # per-group floor for the variance-equality test
_SBC_ADI_CUT = 1.32  # Syntetos-Boylan ADI cutoff
_SBC_CV2_CUT = 0.49  # Syntetos-Boylan CV² cutoff
_JACC_K = 20  # predicted links reported
_JACC_MINSUP = 2  # co-purchase support floor (graph family convention)


def q_corpus_brown_forsythe(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BROWN-FORSYTHE variance-equality test across sources (Brown &
    Forsythe 1974 — Levene's test on MEDIAN-centered deviations):
    W = ((N−k)/(k−1))·Σn_j(z̄_j−z̄)²/ΣΣ(z_ij−z̄_j)² over doc length —
    the missing third leg beside the family's mean tests (Welch,
    Mann-Whitney): two sources can share a mean and still differ in
    SPREAD, which breaks every pooled-variance assumption downstream.
    Median-centering (not mean) is what makes it robust to the heavy
    tails the Hill/lognormal rows document.

    Exactness: each source's median rides as m2 = v_lo + v_hi (exact
    two-middle order statistics); deviations z = |2x − m2| stay
    integer (the doubling cancels between numerator and denominator);
    per-group float terms pre-round to e6 integers so both engines
    sum identical values; ONE final expression. stable_round(4).

    Scale: ranking is a window partitioned BY SOURCE; everything
    after is |sources|-bounded moments."""
    # r11 (guide §2.4): the thin 3-column projection feeds the
    # eligibility count, the median ranking and the deviation pass —
    # uncached, the corpus scan re-executed 4× (4 FileScans → 1).
    docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "doc_id", "source", F.col("n_chars").cast("long").alias("x")
    ).cache()
    n_ok = (
        docs.groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_g"))
        .filter(F.col("n_g") >= _BF_MIN_DOCS)
    )
    d = docs.join(F.broadcast(n_ok), "source")
    rn = F.row_number().over(
        Window.partitionBy("source").orderBy("x", "doc_id")
    )
    ranked = d.select("source", "n_g", "x", rn.alias("rn"))
    lo = F.floor((F.col("n_g") + 1) / 2)
    hi = F.floor(F.col("n_g") / 2) + 1
    m2 = ranked.groupBy("source").agg(
        (
            F.sum(F.when(F.col("rn") == lo, F.col("x")).otherwise(0))
            + F.sum(F.when(F.col("rn") == hi, F.col("x")).otherwise(0))
        ).alias("m2")
    )
    z = d.join(F.broadcast(m2), "source").select(
        "source",
        F.abs(2 * F.col("x") - F.col("m2")).alias("z"),
    )
    per = z.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum("z").alias("s_j"),
        F.sum(F.col("z").cast(_DEC) * F.col("z").cast(_DEC)).alias(
            "q_j"
        ),
    )
    ssw_term = F.floor(
        (
            F.col("n_j").cast(_DEC) * F.col("q_j")
            - F.col("s_j").cast(_DEC) * F.col("s_j").cast(_DEC)
        ).cast("double")
        / F.col("n_j").cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    sb_term = F.floor(
        (F.col("s_j").cast(_DEC) * F.col("s_j").cast(_DEC)).cast(
            "double"
        )
        / F.col("n_j").cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    agg = per.select(
        "n_j", "s_j", ssw_term.alias("w6"), sb_term.alias("b6")
    ).agg(
        F.count(F.lit(1)).alias("k"),
        F.sum("n_j").alias("n"),
        F.sum("s_j").alias("s"),
        F.sum("w6").alias("ssw6"),
        F.sum("b6").alias("sb6"),
    )
    n = F.col("n").cast("double")
    k = F.col("k").cast("double")
    ssb = (
        F.col("sb6").cast("double") / F.lit(1e6)
        - F.col("s").cast("double")
        * F.col("s").cast("double")
        / n
    )
    ssw = F.col("ssw6").cast("double") / F.lit(1e6)
    w = (n - k) / (k - 1) * ssb / ssw
    return agg.select(
        F.col("k").cast("int").alias("n_groups"),
        F.col("n").cast("long").alias("n_docs"),
        (F.col("k") - 1).cast("long").alias("df1"),
        (F.col("n") - F.col("k")).cast("long").alias("df2"),
        stable_round(w, 4).alias("bf_stat"),
    )


ORACLE_BROWN_FORSYTHE = f"""
WITH d AS (
  SELECT doc_id, source, CAST(n_chars AS BIGINT) AS x FROM documents
), ok AS (
  SELECT source, count(*) AS n_g FROM d GROUP BY 1
  HAVING count(*) >= {_BF_MIN_DOCS}
), ranked AS (
  SELECT d.source, ok.n_g, d.x,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY d.x, d.doc_id) AS rn
  FROM d JOIN ok USING (source)
), med AS (
  SELECT source,
         sum(CASE WHEN rn = (n_g + 1) // 2 THEN x ELSE 0 END)
         + sum(CASE WHEN rn = n_g // 2 + 1 THEN x ELSE 0 END) AS m2
  FROM ranked GROUP BY 1
), z AS (
  SELECT d.source, abs(2 * d.x - med.m2) AS z
  FROM d JOIN med USING (source) JOIN ok USING (source)
), per AS (
  SELECT source, count(*) AS n_j, CAST(sum(z) AS HUGEINT) AS s_j,
         sum(CAST(z AS HUGEINT) * z) AS q_j
  FROM z GROUP BY 1
), agg AS (
  SELECT count(*) AS k, sum(n_j) AS n, sum(s_j) AS s,
         sum(CAST(floor(CAST(n_j * q_j - s_j * s_j AS DOUBLE)
                        / n_j * 1e6 + 0.5) AS BIGINT)) AS ssw6,
         sum(CAST(floor(CAST(s_j * s_j AS DOUBLE)
                        / n_j * 1e6 + 0.5) AS BIGINT)) AS sb6
  FROM per
)
SELECT CAST(k AS INT) AS n_groups, CAST(n AS BIGINT) AS n_docs,
       CAST(k - 1 AS BIGINT) AS df1, CAST(n - k AS BIGINT) AS df2,
       {sql_stable_round(
           "(CAST(n AS DOUBLE) - k) / (k - 1)"
           " * (CAST(sb6 AS DOUBLE) / 1e6"
           "    - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n)"
           " / (CAST(ssw6 AS DOUBLE) / 1e6)", 4)} AS bf_stat
FROM agg
""".strip()


# ------------------------------------------------ Cramér's V effect size


def q_corpus_cramers_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CRAMÉR'S V effect size of the lang × source association
    (Cramér 1946), with the Bergsma 2013 bias correction — the
    magnitude companion to the family's χ² independence row (88):
    χ² says WHETHER crawl skew exists, V says HOW MUCH on a [0,1]
    scale that doesn't grow with corpus size, and the corrected
    variant stays honest on small tables where raw V inflates.

    Exactness: observed and marginal counts are exact integers; each
    cell's (O−E)²/E term (zero cells included — they contribute E)
    pre-rounds to an e9 integer so χ²'s sum is exact; V and V+ are
    ONE expression. stable_round(4)/(6).

    Scale: the scan collapses to |langs|×|sources| observed cells;
    the zero-cell completion is a broadcast cross of the two
    marginal relations (≤ hundreds of rows)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "lang", "source"
    )
    # r11 (guide §2.4): ONE corpus scan — the lang/source marginals
    # and the grand total all roll up exactly from the cached
    # |langs|×|sources| observed-cell table (every doc lands in
    # exactly one cell); each previously re-scanned the corpus, and
    # the marginal COUNT aggregates re-ran it again (6 scans → 1).
    obs = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("o")
    ).cache()
    rows = obs.groupBy("lang").agg(F.sum("o").alias("r"))
    cols = obs.groupBy("source").agg(F.sum("o").alias("c"))
    n_tot = obs.agg(F.sum("o").alias("n"))
    cells = (
        F.broadcast(rows)
        .crossJoin(F.broadcast(cols))
        .join(obs, ["lang", "source"], "left")
        .join(F.broadcast(n_tot))
        .select(
            "lang",
            "source",
            "r",
            "c",
            "n",
            F.coalesce(F.col("o"), F.lit(0)).alias("o"),
        )
    )
    e = (
        F.col("r").cast("double")
        * F.col("c").cast("double")
        / F.col("n").cast("double")
    )
    term_e9 = F.floor(
        (F.col("o").cast("double") - e)
        * (F.col("o").cast("double") - e)
        / e
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    agg = cells.select(
        "n", term_e9.alias("t9")
    ).groupBy("n").agg(
        F.sum("t9").alias("chi9"),
    )
    counts = (
        F.broadcast(rows.agg(F.count(F.lit(1)).alias("n_langs")))
        .crossJoin(
            F.broadcast(cols.agg(F.count(F.lit(1)).alias("n_sources")))
        )
    )
    j = agg.crossJoin(F.broadcast(counts))
    n = F.col("n").cast("double")
    r = F.col("n_langs").cast("double")
    c = F.col("n_sources").cast("double")
    chi2 = F.col("chi9").cast("double") / F.lit(1e9)
    v = F.sqrt(chi2 / (n * (F.least(r, c) - 1)))
    phi2p = F.greatest(
        F.lit(0.0), chi2 / n - (r - 1) * (c - 1) / (n - 1)
    )
    rp = r - (r - 1) * (r - 1) / (n - 1)
    cp = c - (c - 1) * (c - 1) / (n - 1)
    vp = F.sqrt(phi2p / (F.least(rp, cp) - 1))
    return j.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("n_langs").cast("int").alias("n_langs"),
        F.col("n_sources").cast("int").alias("n_sources"),
        stable_round(chi2, 4).alias("chi2"),
        stable_round(v, 6).alias("cramers_v"),
        stable_round(vp, 6).alias("cramers_v_corrected"),
    )


ORACLE_CRAMERS_V = f"""
WITH d AS (SELECT lang, source FROM documents),
obs AS (SELECT lang, source, count(*) AS o FROM d GROUP BY 1, 2),
r AS (SELECT lang, count(*) AS r FROM d GROUP BY 1),
c AS (SELECT source, count(*) AS c FROM d GROUP BY 1),
t AS (SELECT count(*) AS n FROM d),
cells AS (
  SELECT r.lang, c.source, r.r, c.c, t.n, coalesce(obs.o, 0) AS o
  FROM r CROSS JOIN c CROSS JOIN t
  LEFT JOIN obs ON obs.lang = r.lang AND obs.source = c.source
), agg AS (
  SELECT n,
         sum(CAST(floor(
           (o - CAST(r AS DOUBLE) * c / n)
           * (o - CAST(r AS DOUBLE) * c / n)
           / (CAST(r AS DOUBLE) * c / n) * 1e9 + 0.5) AS BIGINT))
           AS chi9
  FROM cells GROUP BY 1
), k AS (
  SELECT (SELECT count(*) FROM r) AS n_langs,
         (SELECT count(*) FROM c) AS n_sources
)
SELECT CAST(n AS BIGINT) AS n_docs, CAST(n_langs AS INT) AS n_langs,
       CAST(n_sources AS INT) AS n_sources,
       {sql_stable_round("CAST(chi9 AS DOUBLE) / 1e9", 4)} AS chi2,
       {sql_stable_round(
           "sqrt(CAST(chi9 AS DOUBLE) / 1e9 / (CAST(n AS DOUBLE)"
           " * (least(CAST(n_langs AS DOUBLE), n_sources) - 1)))",
           6)} AS cramers_v,
       {sql_stable_round(
           "sqrt(greatest(0.0, CAST(chi9 AS DOUBLE) / 1e9 / n"
           "  - (CAST(n_langs AS DOUBLE) - 1) * (n_sources - 1)"
           "    / (CAST(n AS DOUBLE) - 1))"
           " / (least(CAST(n_langs AS DOUBLE)"
           "     - (CAST(n_langs AS DOUBLE) - 1)"
           "       * (n_langs - 1) / (CAST(n AS DOUBLE) - 1),"
           "     CAST(n_sources AS DOUBLE)"
           "     - (CAST(n_sources AS DOUBLE) - 1)"
           "       * (n_sources - 1) / (CAST(n AS DOUBLE) - 1)) - 1))",
           6)} AS cramers_v_corrected
FROM agg CROSS JOIN k
""".strip()


# ---------------------------------------------- Atkinson index per nation


def q_revenue_atkinson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ATKINSON INEQUALITY INDEX (ε=1) of customer revenue per nation
    (Atkinson 1970): A = 1 − exp(mean ln x)/mean x — the
    welfare-theoretic member of the family's inequality battery
    (Gini, Theil, Lorenz): unlike Gini it is subgroup-decomposable
    and its ε=1 form says directly "what fraction of total revenue
    could be given up if it were equally distributed, for equal
    welfare". Scale-free, so the exact-cent integers feed it
    unit-safely.

    Exactness: customer revenue sums exact e2 cents; each customer's
    ln(rev) pre-rounds to an e9 integer so the per-nation log-sum is
    exact; ONE final expression. stable_round(6).

    Scale: fact scan collapses to per-customer sums (map-side
    partials), nation broadcast-joined; output |nations|."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("p_e2"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        F.col("n_nationkey").alias("c_nationkey"), "n_name"
    )
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(F.sum("p_e2").alias("rev"))
        .filter(F.col("rev") > 0)
        .join(F.broadcast(cust), "o_custkey")
        .join(F.broadcast(nation), "c_nationkey")
    )
    ln_e9 = F.floor(
        F.log(F.col("rev").cast("double")) * F.lit(1e9) + F.lit(0.5)
    ).cast("long")
    agg = per_cust.select("n_name", "rev", ln_e9.alias("l9")).groupBy(
        "n_name"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("rev").alias("s"),
        F.sum("l9").alias("l9s"),
    )
    n = F.col("n").cast("double")
    mean_x = F.col("s").cast("double") / n
    geo = F.exp(F.col("l9s").cast("double") / n / F.lit(1e9))
    return agg.select(
        F.col("n_name").alias("nation"),
        F.col("n").cast("long").alias("n_customers"),
        stable_round(mean_x / 100.0, 2).alias("mean_revenue"),
        stable_round(1.0 - geo / mean_x, 6).alias("atkinson"),
    ).orderBy("nation")


ORACLE_ATKINSON = f"""
WITH pc AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS rev
  FROM orders GROUP BY 1 HAVING sum(floor(o_totalprice * 100 + 0.5))
                                > 0
), j AS (
  SELECT n.n_name AS nation, pc.rev,
         CAST(floor(ln(CAST(pc.rev AS DOUBLE)) * 1e9 + 0.5)
              AS BIGINT) AS l9
  FROM pc JOIN customer c ON c.c_custkey = pc.o_custkey
  JOIN nation n ON n.n_nationkey = c.c_nationkey
), agg AS (
  SELECT nation, count(*) AS n, CAST(sum(rev) AS BIGINT) AS s,
         CAST(sum(l9) AS BIGINT) AS l9s
  FROM j GROUP BY 1
)
SELECT nation, CAST(n AS BIGINT) AS n_customers,
       {sql_stable_round(
           "CAST(s AS DOUBLE) / n / 100.0", 2)} AS mean_revenue,
       {sql_stable_round(
           "1.0 - exp(CAST(l9s AS DOUBLE) / n / 1e9)"
           " / (CAST(s AS DOUBLE) / n)", 6)} AS atkinson
FROM agg ORDER BY nation
""".strip()


# ------------------------------------- Syntetos-Boylan demand patterns


def q_demand_pattern_sbc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SYNTETOS-BOYLAN demand-pattern classification per part brand
    (Syntetos, Boylan & Croston 2005): ADI (average inter-demand
    interval over the brand's month span) × CV² (squared coefficient
    of variation of nonzero monthly demand) quadrant —
    smooth / intermittent / erratic / lumpy — the standard answer to
    WHICH forecasting model each demand stream deserves (Croston for
    intermittent, SBA for lumpy, exponential smoothing for smooth),
    feeding the family's forecast rows the per-series routing they
    assume.

    Exactness: monthly demand sums exact e2 quantity integers; ADI
    is one exact-integer ratio; CV² = (nQ−S²)/S² exact integers with
    ONE division. stable_round(4).

    Scale: fact scan collapses to (brand, month) sums with map-side
    partials (brand broadcast-joined from part); |brands| output."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        (F.year("l_shipdate") * 12 + F.month("l_shipdate")).alias("m"),
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
        .cast("long")
        .alias("q_e2"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    monthly = (
        li.join(
            F.broadcast(part),
            li.l_partkey == part.p_partkey,
        )
        .groupBy("p_brand", "m")
        .agg(F.sum("q_e2").alias("d"))
        .filter(F.col("d") > 0)
    )
    agg = monthly.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_d"),
        F.min("m").alias("m0"),
        F.max("m").alias("m1"),
        F.sum("d").alias("s"),
        F.sum(F.col("d").cast(_DEC) * F.col("d").cast(_DEC)).alias("q"),
    )
    adi = (F.col("m1") - F.col("m0") + 1).cast("double") / F.col(
        "n_d"
    ).cast("double")
    cv2 = (
        F.col("n_d").cast(_DEC) * F.col("q")
        - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
    ).cast("double") / (
        F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
    ).cast("double")
    return agg.select(
        F.col("p_brand").alias("brand"),
        F.col("n_d").cast("long").alias("n_demand_months"),
        (F.col("m1") - F.col("m0") + 1).cast("long").alias("span_months"),
        stable_round(adi, 4).alias("adi"),
        stable_round(cv2, 4).alias("cv2"),
        F.when(
            (adi < _SBC_ADI_CUT) & (cv2 < _SBC_CV2_CUT), F.lit("smooth")
        )
        .when(
            (adi >= _SBC_ADI_CUT) & (cv2 < _SBC_CV2_CUT),
            F.lit("intermittent"),
        )
        .when(
            (adi < _SBC_ADI_CUT) & (cv2 >= _SBC_CV2_CUT),
            F.lit("erratic"),
        )
        .otherwise(F.lit("lumpy"))
        .alias("pattern"),
    ).orderBy("brand")


ORACLE_SBC = f"""
WITH monthly AS (
  SELECT p.p_brand AS brand,
         date_part('year', l.l_shipdate) * 12
           + date_part('month', l.l_shipdate) AS m,
         CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS d
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2 HAVING sum(floor(l.l_quantity * 100 + 0.5)) > 0
), agg AS (
  SELECT brand, count(*) AS n_d, min(m) AS m0, max(m) AS m1,
         CAST(sum(d) AS HUGEINT) AS s,
         sum(CAST(d AS HUGEINT) * d) AS q
  FROM monthly GROUP BY 1
)
SELECT brand, CAST(n_d AS BIGINT) AS n_demand_months,
       CAST(m1 - m0 + 1 AS BIGINT) AS span_months,
       {sql_stable_round(
           "CAST(m1 - m0 + 1 AS DOUBLE) / n_d", 4)} AS adi,
       {sql_stable_round(
           "CAST(n_d * q - s * s AS DOUBLE)"
           " / CAST(s * s AS DOUBLE)", 4)} AS cv2,
       CASE WHEN CAST(m1 - m0 + 1 AS DOUBLE) / n_d < {_SBC_ADI_CUT}
             AND CAST(n_d * q - s * s AS DOUBLE) / CAST(s * s AS DOUBLE)
                 < {_SBC_CV2_CUT} THEN 'smooth'
            WHEN CAST(m1 - m0 + 1 AS DOUBLE) / n_d >= {_SBC_ADI_CUT}
             AND CAST(n_d * q - s * s AS DOUBLE) / CAST(s * s AS DOUBLE)
                 < {_SBC_CV2_CUT} THEN 'intermittent'
            WHEN CAST(m1 - m0 + 1 AS DOUBLE) / n_d < {_SBC_ADI_CUT}
             AND CAST(n_d * q - s * s AS DOUBLE) / CAST(s * s AS DOUBLE)
                 >= {_SBC_CV2_CUT} THEN 'erratic'
            ELSE 'lumpy' END AS pattern
FROM agg ORDER BY brand
""".strip()


# ----------------------------------------------- margin audit per brand


def q_lineitem_margin_by_brand(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """REALIZED-vs-RETAIL margin per part brand: Σ extprice·(1−disc)
    against Σ p_retailprice·quantity — the pricing-power audit the
    dispersion (22z) and elasticity (22z7) rows bracket: dispersion
    says prices VARY, elasticity says demand RESPONDS, this says who
    actually sells above or below list and by how much.

    Exactness: both sides ride exact e4 integers (price_e2 ×
    (100−disc_e2) and retail_e2 × qty_e2 — same scale by
    construction); margin is ONE division. stable_round(2)/(4).

    Scale: ONE fact scan with a broadcast part join, collapsed to
    |brands| rows with map-side partials."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("price_e2"),
        F.floor(F.col("l_discount") * 100 + F.lit(0.5))
        .cast("long")
        .alias("disc_e2"),
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
        .cast("long")
        .alias("qty_e2"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey",
        "p_brand",
        F.floor(F.col("p_retailprice") * 100 + F.lit(0.5))
        .cast("long")
        .alias("retail_e2"),
    )
    j = li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
    realized_e4 = F.col("price_e2").cast(_DEC) * (
        100 - F.col("disc_e2")
    )
    retail_e4 = F.col("retail_e2").cast(_DEC) * F.col("qty_e2")
    agg = j.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(realized_e4).alias("re4"),
        F.sum(retail_e4).alias("le4"),
    )
    margin = (
        F.col("re4").cast("double") - F.col("le4").cast("double")
    ) / F.col("le4").cast("double")
    return agg.select(
        F.col("p_brand").alias("brand"),
        F.col("n_lines").cast("long").alias("n_lines"),
        stable_round(
            F.col("re4").cast("double") / F.lit(1e4), 2
        ).alias("realized_revenue"),
        stable_round(
            F.col("le4").cast("double") / F.lit(1e4), 2
        ).alias("retail_value"),
        stable_round(margin, 4).alias("margin_frac"),
    ).orderBy("brand")


ORACLE_MARGIN = f"""
WITH j AS (
  SELECT p.p_brand AS brand,
         CAST(floor(l.l_extendedprice * 100 + 0.5) AS HUGEINT)
           * (100 - CAST(floor(l.l_discount * 100 + 0.5) AS BIGINT))
           AS re4,
         CAST(floor(p.p_retailprice * 100 + 0.5) AS HUGEINT)
           * CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) AS le4
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
), agg AS (
  SELECT brand, count(*) AS n_lines, sum(re4) AS re4, sum(le4) AS le4
  FROM j GROUP BY 1
)
SELECT brand, CAST(n_lines AS BIGINT) AS n_lines,
       {sql_stable_round(
           "CAST(re4 AS DOUBLE) / 1e4", 2)} AS realized_revenue,
       {sql_stable_round(
           "CAST(le4 AS DOUBLE) / 1e4", 2)} AS retail_value,
       {sql_stable_round(
           "(CAST(re4 AS DOUBLE) - CAST(le4 AS DOUBLE))"
           " / CAST(le4 AS DOUBLE)", 4)} AS margin_frac
FROM agg ORDER BY brand
""".strip()


# --------------------------------------- Jaccard-coefficient link pred


def q_graph_jaccard_linkpred(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JACCARD-COEFFICIENT link prediction (Liben-Nowell & Kleinberg
    2003's neighborhood-overlap baseline) on the co-purchase part
    graph: candidate non-edges score |Γ(a)∩Γ(c)| / |Γ(a)∪Γ(c)| —
    the DEGREE-NORMALIZED sibling of the family's common-neighbor
    and Adamic-Adar rows: it discounts hub pairs that share many
    neighbors merely by being hubs, the failure mode raw counts
    have on skewed degree distributions. Top-{_JACC_K} non-adjacent
    pairs.

    Exactness: cn and degrees are exact integers; the score is one
    exact rational pre-rounded to an e6 integer for the engine-stable
    top-K cut (pair keys break ties). stable_round(6).

    Scale: identical shape to graph_adamic_adar (Σ basket² basket
    join collapsed to the part dimension, Σ deg² wedge enumeration,
    TakeOrdered top-K) with two broadcast degree joins
    (part-dimension-sized)."""
    # r12 (VERDICT r11 #2): the distinct (order, part) relation is
    # CORPUS-PROPORTIONAL — caching it cannot survive 100 TB, and a
    # measured A/B (1.58 s cached vs 1.54 s uncached at sf0.1 under
    # the clearCache protocol) shows exchange reuse already covers
    # the self-join's two identical sides without it.
    items = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    o2 = items.select(
        F.col("l_orderkey"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        items.join(o2, "l_orderkey")
        .filter(F.col("l_partkey") < F.col("p2"))
        .groupBy(
            F.col("l_partkey").alias("a"), F.col("p2").alias("b")
        )
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= _JACC_MINSUP)
        .select("a", "b")
        # r11: localCheckpoint instead of cache() — eager and released
        # with the plan, where the cache entry leaked into the session
        .cache()
    )
    adj = pairs.select(
        F.col("a").alias("v"), F.col("b").alias("n")
    ).unionByName(
        pairs.select(F.col("b").alias("v"), F.col("a").alias("n"))
    )
    deg = adj.groupBy("v").agg(F.count(F.lit(1)).alias("d"))
    w1 = adj.select(F.col("v").alias("m"), F.col("n").alias("a"))
    w2 = adj.select(F.col("v").alias("m"), F.col("n").alias("c"))
    cand = (
        w1.join(w2, "m")
        .filter(F.col("a") < F.col("c"))
        .groupBy("a", "c")
        .agg(F.count(F.lit(1)).alias("cn"))
        .join(
            pairs.select("a", F.col("b").alias("c")),
            ["a", "c"],
            "left_anti",
        )
        .join(
            F.broadcast(deg.select(F.col("v").alias("a"),
                                   F.col("d").alias("da"))),
            "a",
        )
        .join(
            F.broadcast(deg.select(F.col("v").alias("c"),
                                   F.col("d").alias("dc"))),
            "c",
        )
    )
    j_e6 = F.floor(
        F.col("cn").cast("double")
        / (F.col("da") + F.col("dc") - F.col("cn")).cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    return (
        cand.select("a", "c", "cn", j_e6.alias("j6"))
        .orderBy(F.col("j6").desc(), F.col("a"), F.col("c"))
        .limit(_JACC_K)
        .select(
            F.col("a").alias("part_a"),
            F.col("c").alias("part_b"),
            F.col("cn").cast("long").alias("common_neighbors"),
            stable_round(F.col("j6").cast("double") / 1e6, 6).alias(
                "jaccard"
            ),
        )
    )


ORACLE_JACCARD_LINKPRED = f"""
WITH items AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM items a
  JOIN items b ON a.l_orderkey = b.l_orderkey
              AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING count(*) >= {_JACC_MINSUP}
), adj AS (
  SELECT a AS v, b AS n FROM e UNION ALL SELECT b, a FROM e
), deg AS (
  SELECT v, count(*) AS d FROM adj GROUP BY 1
), cand AS (
  SELECT w1.n AS a, w2.n AS c, count(*) AS cn
  FROM adj w1 JOIN adj w2 ON w2.v = w1.v AND w1.n < w2.n
  GROUP BY 1, 2
), ne AS (
  SELECT cand.* FROM cand
  WHERE NOT EXISTS (
    SELECT 1 FROM e WHERE e.a = cand.a AND e.b = cand.c
  )
), scored AS (
  SELECT ne.a, ne.c, ne.cn,
         CAST(floor(CAST(ne.cn AS DOUBLE)
                    / (da.d + dc.d - ne.cn) * 1e6 + 0.5) AS BIGINT)
           AS j6
  FROM ne JOIN deg da ON da.v = ne.a JOIN deg dc ON dc.v = ne.c
)
SELECT a AS part_a, c AS part_b,
       CAST(cn AS BIGINT) AS common_neighbors,
       {sql_stable_round("CAST(j6 AS DOUBLE) / 1e6", 6)} AS jaccard
FROM scored ORDER BY j6 DESC, a, c LIMIT {_JACC_K}
""".strip()


QUERIES.update(
    {
        "corpus_brown_forsythe": q_corpus_brown_forsythe,
        "corpus_cramers_v": q_corpus_cramers_v,
        "revenue_atkinson": q_revenue_atkinson,
        "demand_pattern_sbc": q_demand_pattern_sbc,
        "lineitem_margin_by_brand": q_lineitem_margin_by_brand,
        "graph_jaccard_linkpred": q_graph_jaccard_linkpred,
    }
)

ORACLES.update(
    {
        "corpus_brown_forsythe": ORACLE_BROWN_FORSYTHE,
        "corpus_cramers_v": ORACLE_CRAMERS_V,
        "revenue_atkinson": ORACLE_ATKINSON,
        "demand_pattern_sbc": ORACLE_SBC,
        "lineitem_margin_by_brand": ORACLE_MARGIN,
        "graph_jaccard_linkpred": ORACLE_JACCARD_LINKPRED,
    }
)


# ------------------------------------------ Dickey-Fuller unit root

_DF_CRIT_05 = -2.86  # DF with constant, 5% (MacKinnon large-n)


def q_metric_dickey_fuller(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DICKEY-FULLER unit-root test per metric (Dickey & Fuller 1979,
    constant / no-augmentation form): OLS of Δv_t on v_{t−1} over
    consecutive-hour pairs, t = β̂/se(β̂) against the −2.86 critical
    value — the null is a UNIT ROOT, the exact mirror of KPSS's
    stationary null, so running both yields the classical 2×2
    verdict (both reject → hard case; DF rejects alone → stationary;
    KPSS rejects alone → unit root; neither → underpowered). Lag-0
    augmentation documented: the synthetic hourly series has no
    higher-order AR structure worth the lost exactness.

    Exactness: all OLS moment sums are exact integers over
    consecutive-hour (v_{t−1}, Δv_t) pairs; β̂ and
    t = B·√((n−2)/(C·(A − B²/C))) are ONE fixed-shape double
    expression over the three exact aggregates A, B, C.
    stable_round(6)/(4).

    Scale: the lag pairing is ONE self-join of the collapsed hourly
    series on (metric, h+1) — series-sized; everything after is a
    metric-sized aggregate."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    nxt = hourly.select(
        "event_type",
        (F.col("h") - 1).alias("h"),
        F.col("v").alias("v_next"),
    )
    pairs = hourly.join(nxt, ["event_type", "h"]).select(
        "event_type",
        F.col("v").alias("x"),
        (F.col("v_next") - F.col("v")).alias("y"),
    )
    agg = pairs.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
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
    ).filter(F.col("n") >= _RT_MIN_HOURS)
    a = (
        F.col("n").cast(_DEC) * F.col("syy")
        - F.col("sy").cast(_DEC) * F.col("sy").cast(_DEC)
    ).cast("double")
    b = (
        F.col("n").cast(_DEC) * F.col("sxy")
        - F.col("sx").cast(_DEC) * F.col("sy").cast(_DEC)
    ).cast("double")
    c = (
        F.col("n").cast(_DEC) * F.col("sxx")
        - F.col("sx").cast(_DEC) * F.col("sx").cast(_DEC)
    ).cast("double")
    n = F.col("n").cast("double")
    beta = b / c
    t = b * F.sqrt((n - 2) / (c * (a - b * b / c)))
    # zero regressor variance (constant series) or zero residual
    # variance (perfectly deterministic Δ) leaves t undefined — report
    # the degeneracy instead of a fabricated verdict. Division-free
    # form (a·c − b² ≤ 0 ⟺ residual variance ≤ 0 for c > 0) so the
    # guard itself can't divide by zero under ANSI.
    degenerate = (c <= 0) | (a * c - b * b <= 0)
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_pairs"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(beta, 6))
        .alias("beta"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(t, 4))
        .alias("df_t"),
        F.when(degenerate, F.lit("degenerate"))
        .when(t < _DF_CRIT_05, F.lit("stationary"))
        .otherwise(F.lit("unit_root"))
        .alias("verdict"),
    ).orderBy("event_type")


ORACLE_DICKEY_FULLER = f"""
WITH hourly AS (
{_HOURLY_SQL}
), pairs AS (
  SELECT a.event_type, a.v AS x, b.v - a.v AS y
  FROM hourly a
  JOIN hourly b ON b.event_type = a.event_type AND b.h = a.h + 1
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM pairs GROUP BY 1 HAVING count(*) >= {_RT_MIN_HOURS}
), term AS (
  SELECT event_type, n,
         CAST(n * syy - sy * sy AS DOUBLE) AS a,
         CAST(n * sxy - sx * sy AS DOUBLE) AS b,
         CAST(n * sxx - sx * sx AS DOUBLE) AS c
  FROM agg
)
SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN c <= 0 OR a * c - b * b <= 0 THEN NULL ELSE
       {sql_stable_round("b / c", 6)} END AS beta,
       CASE WHEN c <= 0 OR a * c - b * b <= 0 THEN NULL ELSE
       {sql_stable_round(
           "b * sqrt((CAST(n AS DOUBLE) - 2) / (c * (a - b * b / c)))",
           4)} END AS df_t,
       CASE WHEN c <= 0 OR a * c - b * b <= 0 THEN 'degenerate'
            WHEN b * sqrt((CAST(n AS DOUBLE) - 2)
                          / (c * (a - b * b / c))) < {_DF_CRIT_05}
              THEN 'stationary'
            ELSE 'unit_root' END AS verdict
FROM term ORDER BY event_type
""".strip()


# ------------------------------------- quality-signal correlation matrix


def q_quality_signal_correlation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """QUALITY-SIGNAL CORRELATION matrix: pairwise Pearson between the
    per-doc curation signals (chars, tokens, distinct-stopword hits,
    heuristic quality) — the redundancy audit a filter-stack needs
    before adding its next signal: two signals correlating ≥0.9 gate
    the same documents twice, and a quality score that correlates ~1
    with raw length is just a length filter in disguise. A pair with
    a zero-variance signal reports NULL (not an error) — the signal
    is degenerate on that corpus, which is itself the finding.

    Exactness: all 14 moment sums (4 sums, 4 squares, 6 cross
    products) are exact integers from ONE aggregate pass; each r is
    one closed-form double. stable_round(6).

    Scale: one corpus scan → a 1-row moment aggregate (map-side
    partials) → 6 output rows projected from it."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    from monasca_aggregator_spark.functions.text import STOPWORDS
    from monasca_aggregator_spark.operators.textops import quality_expr

    # r11 (guide §2.4, closing batch): quality_scores is a pure
    # per-row projection of the SAME rows, so the doc_id self-join
    # (two corpus scans + two corpus-sized join exchanges) was pure
    # waste — the identical quality_e4 expression (stable_round(…,4)
    # then e4 fixed-point, copied from quality_scores' output shape)
    # inlines into the one projection. 2 scans → 1, join gone.
    quality_e4 = (
        F.floor(
            stable_round(quality_expr(F.col("text")), 4) * 10000
            + F.lit(0.5)
        )
        .cast("long")
        .alias("quality_e4")
    )
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    sig = docs.select(
        F.col("n_chars").cast("long").alias("chars"),
        F.size(toks).cast("long").alias("tokens"),
        F.size(F.array_intersect(toks, stop_arr))
        .cast("long")
        .alias("stops"),
        quality_e4,
    )
    names = ["chars", "tokens", "stops", "quality_e4"]
    aggs = [F.count(F.lit(1)).alias("n")]
    for a in names:
        aggs.append(F.sum(a).alias(f"s_{a}"))
        aggs.append(
            F.sum(F.col(a).cast(_DEC) * F.col(a).cast(_DEC)).alias(
                f"q_{a}"
            )
        )
    for i, a in enumerate(names):
        for b_ in names[i + 1 :]:
            aggs.append(
                F.sum(F.col(a).cast(_DEC) * F.col(b_).cast(_DEC)).alias(
                    f"x_{a}_{b_}"
                )
            )
    mom = sig.agg(*aggs)

    def _r(a: str, b_: str):
        num = (
            F.col("n").cast(_DEC) * F.col(f"x_{a}_{b_}")
            - F.col(f"s_{a}").cast(_DEC) * F.col(f"s_{b_}").cast(_DEC)
        ).cast("double")
        va = (
            F.col("n").cast(_DEC) * F.col(f"q_{a}")
            - F.col(f"s_{a}").cast(_DEC) * F.col(f"s_{a}").cast(_DEC)
        ).cast("double")
        vb = (
            F.col("n").cast(_DEC) * F.col(f"q_{b_}")
            - F.col(f"s_{b_}").cast(_DEC) * F.col(f"s_{b_}").cast(_DEC)
        ).cast("double")
        return F.when(
            (va <= 0) | (vb <= 0), F.lit(None).cast("double")
        ).otherwise(stable_round(num / F.sqrt(va * vb), 6))

    pairs = [
        (a, b_)
        for i, a in enumerate(names)
        for b_ in names[i + 1 :]
    ]
    # r11 (guide §2.4): the 6 output rows explode out of ONE pass over
    # the 1-row moment aggregate — the previous per-pair unionByName
    # re-ran the corpus aggregate once per branch (6 scans). Same
    # expressions, same rows.
    entries = [
        F.struct(
            F.lit(a).alias("signal_a"),
            F.lit(b_).alias("signal_b"),
            _r(a, b_).alias("pearson_r"),
        )
        for a, b_ in pairs
    ]
    return (
        mom.select(
            F.col("n").cast("long").alias("n_docs"),
            F.explode(F.array(*entries)).alias("e"),
        )
        .select("e.signal_a", "e.signal_b", "n_docs", "e.pearson_r")
        .orderBy("signal_a", "signal_b")
    )


def _oracle_quality_signal_correlation() -> str:
    from monasca_aggregator_spark.plans.textops import (
        _QUALITY_EXPR,
        _STOPLIST_SQL,
    )

    names = ["chars", "tokens", "stops", "quality_e4"]
    moment_sql = ["count(*) AS n"]
    for a in names:
        moment_sql.append(f"CAST(sum({a}) AS HUGEINT) AS s_{a}")
        moment_sql.append(f"sum(CAST({a} AS HUGEINT) * {a}) AS q_{a}")
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            moment_sql.append(
                f"sum(CAST({a} AS HUGEINT) * {b}) AS x_{a}_{b}"
            )
    selects = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            r = sql_stable_round(
                f"CAST(n * x_{a}_{b} - s_{a} * s_{b} AS DOUBLE)"
                f" / sqrt(CAST(n * q_{a} - s_{a} * s_{a} AS DOUBLE)"
                f"        * CAST(n * q_{b} - s_{b} * s_{b} AS DOUBLE))",
                6,
            )
            guarded = (
                f"CASE WHEN n * q_{a} - s_{a} * s_{a} <= 0"
                f" OR n * q_{b} - s_{b} * s_{b} <= 0"
                f" THEN NULL ELSE {r} END"
            )
            selects.append(
                f"SELECT '{a}' AS signal_a, '{b}' AS signal_b,"
                f" CAST(n AS BIGINT) AS n_docs, {guarded} AS pearson_r"
                " FROM mom"
            )
    union = "\nUNION ALL\n".join(selects)
    return rf"""
WITH t AS (
  SELECT doc_id, text, n_chars,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
), m AS (
  SELECT doc_id, text, n_chars,
         len(toks) AS n_tokens,
         len(list_intersect(toks, {_STOPLIST_SQL})) AS n_stop,
         len(regexp_extract_all(text, '[.,!?;:]')) AS n_punct,
         length(text) AS n_chars2
  FROM t
), sig AS (
  SELECT CAST(n_chars AS BIGINT) AS chars,
         CAST(n_tokens AS BIGINT) AS tokens,
         CAST(n_stop AS BIGINT) AS stops,
         CAST(floor(({_QUALITY_EXPR.replace('n_chars', 'n_chars2')})
                    * 10000 + 0.5) AS BIGINT) AS quality_e4
  FROM m
), mom AS (
  SELECT {', '.join(moment_sql)} FROM sig
)
SELECT * FROM ({union}) ORDER BY signal_a, signal_b
""".strip()


QUERIES.update(
    {
        "metric_dickey_fuller": q_metric_dickey_fuller,
        "quality_signal_correlation": q_quality_signal_correlation,
    }
)

ORACLES.update(
    {
        "metric_dickey_fuller": ORACLE_DICKEY_FULLER,
        "quality_signal_correlation": _oracle_quality_signal_correlation(),
    }
)


# ---------------------------------------------- seasonal strength η²

_SEAS_MIN_HOURS = 48


def q_metric_seasonal_strength(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SEASONAL STRENGTH per metric (Wang, Smith & Hyndman 2006's
    strength-of-seasonality feature, hour-of-day form): η² = SSB/SST
    with hour-of-day as the 24 seasonal groups — the EFFECT-SIZE
    companion to the family's Kruskal-Wallis row (that one answers
    "is there an hourly effect?", this one answers "how much of the
    variance does it explain?" on a [0,1] scale), and the routing
    feature the STL/Holt-Winters rows assume: strength <0.3 says
    skip the seasonal component.

    Exactness: group sums are exact integers; per-group S_g²/n_g
    terms pre-round to e6 integers so SSB's sum is exact; η² is ONE
    final expression. Zero total variance reports NULL.
    stable_round(6).

    Scale: the collapsed hourly series aggregates to ≤24 group rows
    per metric (map-side partials), then a metric-sized fold."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    tot = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC)).alias("q"),
    ).filter(F.col("n") >= _SEAS_MIN_HOURS)
    per_g = hourly.groupBy(
        "event_type", (F.col("h") % 24).alias("g")
    ).agg(
        F.count(F.lit(1)).alias("n_g"),
        F.sum("v").alias("s_g"),
    )
    term_e6 = F.floor(
        (F.col("s_g").cast(_DEC) * F.col("s_g").cast(_DEC)).cast(
            "double"
        )
        / F.col("n_g").cast("double")
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    sb = per_g.select("event_type", term_e6.alias("t6")).groupBy(
        "event_type"
    ).agg(F.sum("t6").alias("sb6"), F.count(F.lit(1)).alias("n_groups"))
    j = sb.join(F.broadcast(tot), "event_type")
    n = F.col("n").cast("double")
    grand = (
        F.col("s").cast("double") * F.col("s").cast("double") / n
    )
    ssb = F.col("sb6").cast("double") / F.lit(1e6) - grand
    sst = F.col("q").cast("double") - grand
    eta2 = ssb / sst
    return j.select(
        "event_type",
        F.col("n").cast("long").alias("n_hours"),
        F.col("n_groups").cast("int").alias("n_groups"),
        F.when(sst <= 0, F.lit(None).cast("double"))
        .otherwise(stable_round(eta2, 6))
        .alias("seasonal_strength"),
        F.when(sst <= 0, F.lit("degenerate"))
        .when(eta2 >= 0.6, F.lit("strong"))
        .when(eta2 >= 0.3, F.lit("moderate"))
        .otherwise(F.lit("weak"))
        .alias("regime"),
    ).orderBy("event_type")


ORACLE_SEASONAL_STRENGTH = f"""
WITH hourly AS (
{_HOURLY_SQL}
), tot AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS HUGEINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS q
  FROM hourly GROUP BY 1 HAVING count(*) >= {_SEAS_MIN_HOURS}
), per_g AS (
  SELECT event_type, h % 24 AS g, count(*) AS n_g,
         CAST(sum(v) AS HUGEINT) AS s_g
  FROM hourly GROUP BY 1, 2
), sb AS (
  SELECT event_type,
         CAST(sum(CAST(floor(CAST(s_g * s_g AS DOUBLE) / n_g * 1e6
                             + 0.5) AS BIGINT)) AS BIGINT) AS sb6,
         count(*) AS n_groups
  FROM per_g GROUP BY 1
), j AS (
  SELECT sb.event_type, tot.n, sb.n_groups,
         CAST(sb6 AS DOUBLE) / 1e6
           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n AS ssb,
         CAST(q AS DOUBLE)
           - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n AS sst
  FROM sb JOIN tot USING (event_type)
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       CAST(n_groups AS INT) AS n_groups,
       CASE WHEN sst <= 0 THEN NULL ELSE
       {sql_stable_round("ssb / sst", 6)} END AS seasonal_strength,
       CASE WHEN sst <= 0 THEN 'degenerate'
            WHEN ssb / sst >= 0.6 THEN 'strong'
            WHEN ssb / sst >= 0.3 THEN 'moderate'
            ELSE 'weak' END AS regime
FROM j ORDER BY event_type
""".strip()


# ------------------------------------------- cadence churn-risk screen

_CHURN_AT_RISK = 2  # silent for > 2× own mean gap
_CHURN_CHURNED = 4  # silent for > 4× own mean gap


def q_customer_churn_risk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CADENCE-BASED churn-risk screen per market segment: each
    repeat customer's silence (dataset frontier − last order) is
    compared to their OWN mean inter-order gap — silent > 2× own
    cadence is at_risk, > 4× is churned — the per-customer
    calibration the RFM row's global recency quintiles can't give a
    heterogeneous base (a quarterly buyer is not "at risk" after 30
    quiet days; a weekly buyer is). Segment rollup: active/at_risk/
    churned counts + share.

    Exactness: gaps are exact integer days; the classification
    compares silence·n_gaps vs k·total_gap_days by integer
    cross-multiplication — no division anywhere near a threshold.
    Single-order customers are excluded (no cadence to calibrate
    against; documented).

    Scale: orders collapse to per-customer (first, last, n) in one
    aggregate — mean gap needs only (last−first)/(n−1), not a lag
    window; customer/segment joins broadcast; |segments| output."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("d"),
    )
    frontier = orders.agg(F.max("d").alias("front"))
    per_cust = (
        orders.groupBy("o_custkey")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("d").alias("first_d"),
            F.max("d").alias("last_d"),
        )
        .filter(F.col("n_orders") >= 2)
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    j = per_cust.join(F.broadcast(cust), "o_custkey").crossJoin(
        F.broadcast(frontier)
    )
    silence = F.col("front") - F.col("last_d")
    n_gaps = F.col("n_orders") - 1
    total_gap = F.col("last_d") - F.col("first_d")
    # silence / (total_gap / n_gaps) > k  ⟺  silence·n_gaps > k·total_gap
    churned = silence * n_gaps > _CHURN_CHURNED * total_gap
    at_risk = silence * n_gaps > _CHURN_AT_RISK * total_gap
    labeled = j.select(
        "c_mktsegment",
        F.when(churned, F.lit("churned"))
        .when(at_risk, F.lit("at_risk"))
        .otherwise(F.lit("active"))
        .alias("status"),
    )
    agg = labeled.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.when(F.col("status") == "active", 1).otherwise(0)).alias(
            "n_active"
        ),
        F.sum(
            F.when(F.col("status") == "at_risk", 1).otherwise(0)
        ).alias("n_at_risk"),
        F.sum(
            F.when(F.col("status") == "churned", 1).otherwise(0)
        ).alias("n_churned"),
    )
    return agg.select(
        F.col("c_mktsegment").alias("segment"),
        F.col("n_customers").cast("long").alias("n_customers"),
        F.col("n_active").cast("long").alias("n_active"),
        F.col("n_at_risk").cast("long").alias("n_at_risk"),
        F.col("n_churned").cast("long").alias("n_churned"),
        stable_round(
            F.col("n_churned").cast("double")
            / F.col("n_customers").cast("double"),
            4,
        ).alias("churn_frac"),
    ).orderBy("segment")


ORACLE_CHURN_RISK = f"""
WITH o AS (
  SELECT o_custkey, date_diff('day', DATE '1970-01-01',
                              CAST(o_orderdate AS DATE)) AS d
  FROM orders
), front AS (SELECT max(d) AS front FROM o),
pc AS (
  SELECT o_custkey, count(*) AS n_orders, min(d) AS first_d,
         max(d) AS last_d
  FROM o GROUP BY 1 HAVING count(*) >= 2
), lab AS (
  SELECT c.c_mktsegment,
         CASE WHEN (front.front - pc.last_d) * (pc.n_orders - 1)
                   > {_CHURN_CHURNED} * (pc.last_d - pc.first_d)
              THEN 'churned'
              WHEN (front.front - pc.last_d) * (pc.n_orders - 1)
                   > {_CHURN_AT_RISK} * (pc.last_d - pc.first_d)
              THEN 'at_risk'
              ELSE 'active' END AS status
  FROM pc JOIN customer c ON c.c_custkey = pc.o_custkey, front
)
SELECT c_mktsegment AS segment, count(*) AS n_customers,
       CAST(sum(CASE WHEN status = 'active' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_active,
       CAST(sum(CASE WHEN status = 'at_risk' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_at_risk,
       CAST(sum(CASE WHEN status = 'churned' THEN 1 ELSE 0 END)
            AS BIGINT) AS n_churned,
       {sql_stable_round(
           "CAST(sum(CASE WHEN status = 'churned' THEN 1 ELSE 0 END)"
           " AS DOUBLE) / count(*)", 4)} AS churn_frac
FROM lab GROUP BY 1 ORDER BY 1
""".strip()


QUERIES.update(
    {
        "metric_seasonal_strength": q_metric_seasonal_strength,
        "customer_churn_risk": q_customer_churn_risk,
    }
)

ORACLES.update(
    {
        "metric_seasonal_strength": ORACLE_SEASONAL_STRENGTH,
        "customer_churn_risk": ORACLE_CHURN_RISK,
    }
)
