"""Decision-layer statistics batch (round 11 continuation):
extreme-value return levels, pairwise dynamics (cointegration /
Granger), intermittent-demand forecasting and inventory policy,
coalition attribution, regularity and run-rule monitors, wavelet
synopses, always-valid experimentation, and split/gate audits.

Reference parity: the reference engine (Go, ~/reference —
aggregation/aggregation_rule.go) stops at windowed aggregates; this
module supplies the decision layer a capacity/marketing/supply/
experimentation team runs ON those aggregates: "what daily peak
should we provision for?" (Gumbel block-maxima return levels), "do
these two metrics share a long-run equilibrium or merely
correlate?" (Engle-Granger cointegration) and "does one PREDICT the
other?" (lag-1 Granger), "what's the demand-per-period forecast for
an intermittent SKU and how much stock covers it?" (Croston / SBA —
the exact methods the Syntetos-Boylan classifier in plans/diag.py
routes TO — plus the safety-stock policy), "which touchpoint
actually earns the conversion credit?" (exact Shapley values over
touch-channel coalitions), "is the series regular, day-of-week
driven, level-shifted, or out of control?" (sample entropy,
Friedman blocked ranks, AMOC, Western Electric rules, Haar top-K),
"can we stop the experiment early — honestly?" (mixture-SPRT), and
"are the pipeline's splits and gates sound?" (temporal leakage,
Kish design effect, gate-agreement kappa, pinball-calibrated
quantile forecasts, Juilland dispersion, rich-club structure).

Numerics (house style): inputs ride as exact scaled integers
(e2 = value·100, DEC38/HUGEINT sums); statistics stay integer until
ONE fixed-shape double expression; where a second regression stage
needs float intermediates (cointegration residuals), each residual is
PRE-ROUNDED to an e6 integer so downstream sums are exact and
order-independent; sequential folds (Croston's SES) run as ordered
array reductions with INTEGER state updated by round-half-up division
— bit-identical in both engines by construction. ``stable_round`` on
every reported double.

Scale posture: every operator collapses the raw scan to a
|metrics|×|hours|, |brands|×|months|, or |channels|-bounded relation
in ONE shuffle with map-side partials; windows partition by the
series key; the Shapley coalition table is 2^c ≤ 16 rows by
construction (c = distinct touch channels, a schema constant, never
data volume).
"""

from __future__ import annotations

import math
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.operators.rank import global_rank
from monasca_aggregator_spark.plans.spectral import _HOURLY_SQL, _hourly_e2
from monasca_aggregator_spark.sources.tables import load_table

_DEC = "decimal(38,0)"

_EV_MIN_DAYS = 14  # block-maxima fit needs a real run of daily blocks
_EULER_GAMMA = 0.5772156649015329
_SQRT6_OVER_PI = 0.7796968012336761  # √6/π, the Gumbel MoM scale factor
_EV_RETURN_T = 30  # return period (days) for the reported level

_EV_LNLN = math.log(-math.log(1 - 1 / float(_EV_RETURN_T)))

_EG_MIN_HOURS = 48  # Engle-Granger needs a real overlap
_EG_CRIT_05 = -3.34  # EG 5% critical value, 2 variables, no trend

_CROSTON_ALPHA_NUM = 1  # α = 1/10 — the classical Croston smoothing
_CROSTON_ALPHA_DEN = 10

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


# ------------------------------------- Gumbel block-maxima return level


def q_metric_extreme_value(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """GUMBEL BLOCK-MAXIMA fit per metric (Gumbel 1958; method of
    moments): daily maxima of the hourly series are the blocks; the
    Gumbel location/scale come from their exact first two moments
    (β̂ = s·√6/π, μ̂ = x̄ − γβ̂), and the reported 30-day RETURN LEVEL
    μ̂ − β̂·ln(−ln(1 − 1/T)) answers the capacity question the
    family's percentile rows cannot: "what hourly peak should we
    expect once a month?" — extrapolating BEYOND the observed range,
    which is exactly what extreme-value theory licenses and an
    empirical p99 does not. exceed_prob_max = 1 − G(observed max) is
    the sanity check: a fit that makes its own maximum astronomically
    unlikely is wrong.

    Exactness: daily maxima are exact e2 integers; n, Σx, Σx² ride
    DEC38; mean/variance/β/μ/return level are ONE fixed-shape double
    expression. stable_round(4)/(6). Degenerate (zero-variance)
    series report NULL.

    Scale: the corpus scan collapses to |metrics|×|hours| (ONE
    shuffle, map-side partials), then |metrics|×|days| maxima, then
    |metrics| moment rows. Days grow with the observation window,
    never data volume."""
    hourly = _hourly_e2(spark, sf_dir)
    daily_max = (
        hourly.groupBy(
            "event_type",
            F.floor(F.col("h") / F.lit(24)).cast("long").alias("d"),
        )
        .agg(F.max("v").alias("mx"))
    )
    agg = (
        daily_max.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("mx").alias("s"),
            F.sum(F.col("mx").cast(_DEC) * F.col("mx").cast(_DEC)).alias(
                "q"
            ),
            F.max("mx").alias("obs_max"),
        )
        .filter(F.col("n") >= _EV_MIN_DAYS)
    )
    n = F.col("n").cast("double")
    # sample variance from exact integer moments: (nQ − S²)/(n(n−1))
    var_num = (
        F.col("n").cast(_DEC) * F.col("q")
        - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
    ).cast("double")
    s_dev = F.sqrt(var_num / (n * (n - 1.0))) / F.lit(100.0)
    mean = F.col("s").cast("double") / n / F.lit(100.0)
    beta = s_dev * F.lit(_SQRT6_OVER_PI)
    mu = mean - F.lit(_EULER_GAMMA) * beta
    rl = mu - beta * F.lit(_EV_LNLN)
    z = (F.col("obs_max").cast("double") / F.lit(100.0) - mu) / beta
    p_exceed = 1.0 - F.exp(-F.exp(-z))
    degenerate = var_num == 0
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_days"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(mu, 4))
        .alias("gumbel_mu"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(beta, 4))
        .alias("gumbel_beta"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(rl, 4))
        .alias("return_level_30d"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(p_exceed, 6))
        .alias("exceed_prob_max"),
    ).orderBy("event_type")


ORACLE_EXTREME_VALUE = f"""
WITH hourly AS (
{_HOURLY_SQL}
), daily AS (
  SELECT event_type, h // 24 AS d, max(v) AS mx
  FROM hourly GROUP BY 1, 2
), agg AS (
  SELECT event_type, count(*) AS n,
         CAST(sum(mx) AS HUGEINT) AS s,
         sum(CAST(mx AS HUGEINT) * mx) AS q,
         max(mx) AS obs_max
  FROM daily GROUP BY 1 HAVING count(*) >= {_EV_MIN_DAYS}
), fit AS (
  SELECT event_type, n, obs_max, n * q - s * s AS var_num,
         CAST(s AS DOUBLE) / n / 100.0 AS mean_d,
         sqrt(CAST(n * q - s * s AS DOUBLE)
              / (CAST(n AS DOUBLE) * (n - 1.0))) / 100.0
           * {_SQRT6_OVER_PI} AS beta
  FROM agg
), gum AS (
  SELECT event_type, n, obs_max, var_num, beta,
         mean_d - {_EULER_GAMMA} * beta AS mu
  FROM fit
)
SELECT event_type, CAST(n AS BIGINT) AS n_days,
       CASE WHEN var_num = 0 THEN NULL ELSE
       {sql_stable_round("mu", 4)} END AS gumbel_mu,
       CASE WHEN var_num = 0 THEN NULL ELSE
       {sql_stable_round("beta", 4)} END AS gumbel_beta,
       CASE WHEN var_num = 0 THEN NULL ELSE
       {sql_stable_round(f"mu - beta * ({_EV_LNLN})", 4)}
         END AS return_level_30d,
       CASE WHEN var_num = 0 THEN NULL ELSE
       {sql_stable_round(
           "1.0 - exp(-exp(-((CAST(obs_max AS DOUBLE) / 100.0 - mu)"
           " / beta)))", 6)} END AS exceed_prob_max
FROM gum ORDER BY event_type
""".strip()


# --------------------------------------- Engle-Granger cointegration


def q_metric_cointegration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ENGLE-GRANGER COINTEGRATION test per metric pair (Engle &
    Granger 1987, two-step): step 1 regresses metric b's hourly
    series on metric a's by exact-integer OLS over their common
    hours; step 2 runs a Dickey-Fuller test (no constant, no
    augmentation) on the residual spread — t < −3.34 (the EG 5%
    critical value for two variables) means the pair shares a
    long-run equilibrium, so the SPREAD is the thing to alert on,
    not either series. The upgrade over the family's correlation
    rows: two trending series correlate spuriously; cointegration
    says their difference is stationary, which correlation cannot.

    Exactness: step-1 OLS slope/intercept come from exact DEC38
    moments of the e2 series (ONE fixed-shape double each);
    each residual is then PRE-ROUNDED to an e6 integer so the
    step-2 sums (Σe_{t−1}Δe, Σe², Σ(Δe−ρe)²-via-moments) are exact
    and order-free; ρ̂, se, t are ONE fixed-shape expression.
    stable_round(4)/(6).

    Scale: ONE corpus shuffle to |metrics|×|hours|, then a
    co-partitioned self-join on the hour key bounded by
    |metrics|² pairs; the residual window partitions BY PAIR.
    Hours grow with the observation window, never data volume."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    a = hourly.select(
        F.col("event_type").alias("ma"),
        "h",
        F.col("v").alias("x"),
    )
    b = hourly.select(
        F.col("event_type").alias("mb"),
        "h",
        F.col("v").alias("y"),
    )
    pairs = (
        a.join(b, "h")
        .filter(F.col("ma") < F.col("mb"))
    )
    mom = (
        pairs.groupBy("ma", "mb")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("x").alias("sx"),
            F.sum("y").alias("sy"),
            F.sum(F.col("x").cast(_DEC) * F.col("x").cast(_DEC)).alias(
                "sxx"
            ),
            F.sum(F.col("x").cast(_DEC) * F.col("y").cast(_DEC)).alias(
                "sxy"
            ),
        )
        .filter(F.col("n") >= _EG_MIN_HOURS)
    )
    nn = F.col("n").cast(_DEC)
    slope_num = (nn * F.col("sxy") - F.col("sx").cast(_DEC) * F.col("sy").cast(_DEC)).cast("double")
    slope_den = (nn * F.col("sxx") - F.col("sx").cast(_DEC) * F.col("sx").cast(_DEC)).cast("double")
    fit = mom.select(
        "ma",
        "mb",
        F.col("n").alias("n_hours"),
        (slope_num / slope_den).alias("beta"),
        (
            (
                F.col("sy").cast("double")
                - (slope_num / slope_den) * F.col("sx").cast("double")
            )
            / F.col("n").cast("double")
        ).alias("alpha"),
    )
    resid = (
        pairs.join(F.broadcast(fit), ["ma", "mb"])
        .select(
            "ma",
            "mb",
            "n_hours",
            "beta",
            "alpha",
            "h",
            # e6-integer residual: downstream sums are exact and
            # order-free regardless of partitioning
            F.floor(
                (
                    F.col("y").cast("double")
                    - F.col("alpha")
                    - F.col("beta") * F.col("x").cast("double")
                )
                * F.lit(1e4)
                + F.lit(0.5)
            )
            .cast("long")
            .alias("e"),
        )
    )
    wp = Window.partitionBy("ma", "mb").orderBy("h")
    lagged = resid.withColumn("ep", F.lag("e").over(wp)).filter(
        F.col("ep").isNotNull()
    )
    # DF regression through the origin on the residual spread:
    # Δe_t = ρ·e_{t−1} + u_t
    st2 = lagged.groupBy("ma", "mb", "n_hours", "beta", "alpha").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(
            F.col("ep").cast(_DEC) * (F.col("e") - F.col("ep")).cast(_DEC)
        ).alias("sed"),
        F.sum(F.col("ep").cast(_DEC) * F.col("ep").cast(_DEC)).alias(
            "see"
        ),
        F.sum(
            (F.col("e") - F.col("ep")).cast(_DEC)
            * (F.col("e") - F.col("ep")).cast(_DEC)
        ).alias("sdd"),
    )
    rho = F.col("sed").cast("double") / F.col("see").cast("double")
    # Σû² = Σ(Δe − ρe)² expanded in exact moments: sdd − sed²/see
    ssr = (
        F.col("sdd").cast("double")
        - F.col("sed").cast("double")
        * F.col("sed").cast("double")
        / F.col("see").cast("double")
    )
    se = F.sqrt(
        ssr
        / (F.col("m").cast("double") - 1.0)
        / F.col("see").cast("double")
    )
    t_stat = rho / se
    # ssr ≤ 0 in doubles: both engines evaluate the SAME expression on
    # the same exact integers, so the comparison is engine-identical
    # (an exact sdd·see = sed² integer test would overflow DEC38)
    degenerate = (F.col("see") == 0) | (ssr <= 0)
    return st2.select(
        F.col("ma").alias("metric_a"),
        F.col("mb").alias("metric_b"),
        F.col("n_hours").cast("long").alias("n_hours"),
        stable_round(F.col("beta"), 6).alias("hedge_beta"),
        stable_round(F.col("alpha") / F.lit(100.0), 4).alias(
            "spread_alpha"
        ),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(t_stat, 4))
        .alias("adf_t"),
        F.when(degenerate, F.lit("degenerate"))
        .when(t_stat < F.lit(_EG_CRIT_05), F.lit("cointegrated"))
        .otherwise(F.lit("not_cointegrated"))
        .alias("verdict"),
    ).orderBy("metric_a", "metric_b")


ORACLE_COINTEGRATION = f"""
WITH hourly AS (
{_HOURLY_SQL}
), pairs AS (
  SELECT a.event_type AS ma, b.event_type AS mb, a.h,
         a.v AS x, b.v AS y
  FROM hourly a JOIN hourly b USING (h)
  WHERE a.event_type < b.event_type
), mom AS (
  SELECT ma, mb, count(*) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(x AS HUGEINT) * y) AS sxy
  FROM pairs GROUP BY 1, 2 HAVING count(*) >= {_EG_MIN_HOURS}
), fit AS (
  SELECT ma, mb, n AS n_hours,
         CAST(n * sxy - sx * sy AS DOUBLE)
           / CAST(n * sxx - sx * sx AS DOUBLE) AS beta,
         (CAST(sy AS DOUBLE)
          - CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE)
            * CAST(sx AS DOUBLE)) / n AS alpha
  FROM mom
), resid AS (
  SELECT p.ma, p.mb, f.n_hours, f.beta, f.alpha, p.h,
         CAST(floor((CAST(p.y AS DOUBLE) - f.alpha
                     - f.beta * CAST(p.x AS DOUBLE)) * 1e4 + 0.5)
              AS BIGINT) AS e
  FROM pairs p JOIN fit f USING (ma, mb)
), lagged AS (
  SELECT ma, mb, n_hours, beta, alpha, e,
         lag(e) OVER (PARTITION BY ma, mb ORDER BY h) AS ep
  FROM resid
), st2 AS (
  SELECT ma, mb, n_hours, beta, alpha, count(*) AS m,
         sum(CAST(ep AS HUGEINT) * (e - ep)) AS sed,
         sum(CAST(ep AS HUGEINT) * ep) AS see,
         sum(CAST(e - ep AS HUGEINT) * (e - ep)) AS sdd
  FROM lagged WHERE ep IS NOT NULL
  GROUP BY 1, 2, 3, 4, 5
)
SELECT ma AS metric_a, mb AS metric_b,
       CAST(n_hours AS BIGINT) AS n_hours,
       {sql_stable_round("beta", 6)} AS hedge_beta,
       {sql_stable_round("alpha / 100.0", 4)} AS spread_alpha,
       CASE WHEN see = 0
              OR CAST(sdd AS DOUBLE)
                 - CAST(sed AS DOUBLE) * CAST(sed AS DOUBLE)
                   / CAST(see AS DOUBLE) <= 0 THEN NULL ELSE
       {sql_stable_round(
           "(CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))"
           " / sqrt((CAST(sdd AS DOUBLE)"
           "         - CAST(sed AS DOUBLE) * CAST(sed AS DOUBLE)"
           "           / CAST(see AS DOUBLE))"
           "        / (CAST(m AS DOUBLE) - 1.0)"
           "        / CAST(see AS DOUBLE))", 4)} END AS adf_t,
       CASE WHEN see = 0
              OR CAST(sdd AS DOUBLE)
                 - CAST(sed AS DOUBLE) * CAST(sed AS DOUBLE)
                   / CAST(see AS DOUBLE) <= 0 THEN 'degenerate'
            WHEN (CAST(sed AS DOUBLE) / CAST(see AS DOUBLE))
                 / sqrt((CAST(sdd AS DOUBLE)
                         - CAST(sed AS DOUBLE) * CAST(sed AS DOUBLE)
                           / CAST(see AS DOUBLE))
                        / (CAST(m AS DOUBLE) - 1.0)
                        / CAST(see AS DOUBLE)) < {_EG_CRIT_05}
                 THEN 'cointegrated'
            ELSE 'not_cointegrated' END AS verdict
FROM st2 ORDER BY metric_a, metric_b
""".strip()


# ------------------------------------------- Croston / SBA forecast


def q_demand_croston(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CROSTON / SBA intermittent-demand forecast per part brand
    (Croston 1972; Syntetos & Boylan 2005 bias correction): separate
    exponential smoothing (α = 0.1) of the nonzero monthly demand
    SIZES and the INTER-DEMAND INTERVALS, forecast = ẑ/p̂ per month
    and SBA = (1 − α/2)·ẑ/p̂ — exactly the per-series methods the
    `demand_pattern_sbc` classifier (plans/diag.py) routes
    intermittent/lumpy streams to; this row closes that loop with
    the forecasts themselves.

    Convention (documented contract): demands ordered by month;
    brands need ≥ 2 demand months; ẑ initializes to the first demand
    size, p̂ to the SECOND demand's interval (so its own update is a
    fixed point — no future data in the init); updates fold over
    demands 2..k.

    The sequential fold runs INSIDE both engines as an ordered array
    reduction with INTEGER state: ẑ and p̂ ride e6-scaled longs and
    each SES step is round-half-up integer division
    ((9·state + new·scale + 5) // 10) — bit-identical across engines
    by construction, no float in the fold. Spark: `aggregate` with a
    struct state; DuckDB: `list_reduce` with a flat VARCHAR-list
    state (a struct accumulator loses LIST fields across iterations
    in DuckDB 1.0).

    Scale: the fact scan collapses to |brands|×|months| sums (ONE
    shuffle, map-side partials); the per-brand fold is over ≤ the
    month span (a time-window constant), collected per brand — 25
    brands × ≤ 84 months, never corpus-sized."""
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
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_brand", "m")
        .agg(F.sum("q_e2").alias("d"))
        .filter(F.col("d") > 0)
    )
    seq = monthly.groupBy("p_brand").agg(
        F.count(F.lit(1)).alias("k"),
        F.array_sort(
            F.collect_list(F.struct(F.col("m"), F.col("d")))
        ).alias("ms"),
    ).filter(F.col("k") >= 2)
    # state: (z e6-long, p e6-long, pm last-demand-month, i index)
    folded = seq.withColumn(
        "st",
        F.expr(
            """aggregate(
              ms,
              struct(cast(0 as long) as z, cast(0 as long) as p,
                     cast(0 as long) as pm, cast(0 as long) as i),
              (acc, e) -> if(
                acc.i = 0,
                struct(e.d * cast(10000 as long) as z,
                       cast(0 as long) as p,
                       cast(e.m as long) as pm,
                       cast(1 as long) as i),
                struct(
                  cast((9 * acc.z + e.d * 10000 + 5) div 10 as long)
                    as z,
                  cast((9 * if(acc.i = 1,
                               (e.m - acc.pm) * 1000000,
                               acc.p)
                        + (e.m - acc.pm) * 1000000 + 5) div 10
                       as long) as p,
                  cast(e.m as long) as pm,
                  acc.i + 1 as i))
            )"""
        ),
    )
    z = F.col("st.z").cast("double") / F.lit(1e6) / F.lit(100.0)
    p = F.col("st.p").cast("double") / F.lit(1e6)
    return folded.select(
        F.col("p_brand").alias("brand"),
        F.col("k").cast("long").alias("n_demand_months"),
        stable_round(z, 4).alias("size_hat"),
        stable_round(p, 4).alias("interval_hat"),
        stable_round(z / p, 4).alias("croston_forecast"),
        stable_round(
            z / p * F.lit(1.0 - _CROSTON_ALPHA_NUM / (2.0 * _CROSTON_ALPHA_DEN)),
            4,
        ).alias("sba_forecast"),
    ).orderBy("brand")


# DuckDB fold: flat VARCHAR-list state [z, p, pm, i] (see module
# docstring — struct accumulators lose LIST fields; scalars ride as
# strings). list_reduce has no init: elements are transformed into
# state-shaped entries whose FIRST-element form is the correct
# post-first-demand state.
ORACLE_CROSTON = f"""
WITH monthly AS (
  SELECT p.p_brand AS brand,
         date_part('year', l.l_shipdate) * 12
           + date_part('month', l.l_shipdate) AS m,
         CAST(sum(CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT))
              AS BIGINT) AS d
  FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
  GROUP BY 1, 2 HAVING sum(floor(l.l_quantity * 100 + 0.5)) > 0
), seqs AS (
  SELECT brand, count(*) AS k,
         list_transform(
           list_sort(list({{'m': m, 'd': d}})),
           e -> [CAST(e.d * 10000 AS VARCHAR),
                 '0', CAST(e.m AS VARCHAR), '1']
         ) AS entries
  FROM monthly GROUP BY 1 HAVING count(*) >= 2
), folded AS (
  SELECT brand, k,
         list_reduce(entries, (acc, e) -> [
           CAST((9 * CAST(acc[1] AS BIGINT)
                 + CAST(e[1] AS BIGINT) + 5) // 10 AS VARCHAR),
           CAST((9 * CASE WHEN CAST(acc[4] AS BIGINT) = 1
                     THEN (CAST(e[3] AS BIGINT)
                           - CAST(acc[3] AS BIGINT)) * 1000000
                     ELSE CAST(acc[2] AS BIGINT) END
                 + (CAST(e[3] AS BIGINT)
                    - CAST(acc[3] AS BIGINT)) * 1000000 + 5) // 10
                AS VARCHAR),
           e[3],
           CAST(CAST(acc[4] AS BIGINT) + 1 AS VARCHAR)
         ]) AS st
  FROM seqs
), outv AS (
  SELECT brand, k,
         CAST(st[1] AS DOUBLE) / 1e6 / 100.0 AS z,
         CAST(st[2] AS DOUBLE) / 1e6 AS p
  FROM folded
)
SELECT brand, CAST(k AS BIGINT) AS n_demand_months,
       {sql_stable_round("z", 4)} AS size_hat,
       {sql_stable_round("p", 4)} AS interval_hat,
       {sql_stable_round("z / p", 4)} AS croston_forecast,
       {sql_stable_round("z / p * 0.95", 4)} AS sba_forecast
FROM outv ORDER BY brand
""".strip()


# --------------------------------------- Shapley coalition attribution


def q_events_attribution_shapley(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """EXACT SHAPLEY-VALUE conversion attribution over touch-channel
    coalitions (Shapley 1953; the marketing form of Zhao, Mahboobi &
    Bagheri 2018): each user's journey is the SET of distinct
    non-purchase event types seen strictly before their first
    purchase (all their events, if they never purchase); the
    characteristic function v(S) is the observed conversion rate of
    journeys whose touch set is exactly S (unobserved coalitions
    contribute v = 0, the standard data-driven convention); a
    channel's Shapley value is its average marginal contribution
    across all coalition orderings — the unique credit split that is
    efficient, symmetric, and dummy-free, unlike the family's
    first/last/U-shape/Markov heuristics (events_attribution*).

    Exactness: v(S) is ONE division of exact counts; each weighted
    marginal term |S|!·(c−1−|S|)!/c!·(v(S∪i)−v(S)) is PRE-ROUNDED to
    an e12 integer so the per-channel sum is exact and order-free;
    the final value is ONE rescale. stable_round(6).

    Scale: journeys collapse per user (user-partitioned window +
    groupBy), coalition counts are ≤ 2^c rows (c = |touch channels|,
    a SCHEMA constant ≤ 4 here — never data volume); the power set,
    the self-join on S→S∪{i}, and the Shapley sum all run on that
    2^c-row relation. The only corpus-sized work is the per-user
    collapse."""
    ev = load_table(spark, sf_dir, "events")
    fp = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id")
        .agg(F.min(F.unix_millis("ts")).alias("fp_ms"))
    )
    touches = (
        ev.filter(F.col("event_type") != "purchase")
        .join(fp, "user_id", "left")
        .filter(
            F.col("fp_ms").isNull()
            | (F.unix_millis("ts") < F.col("fp_ms"))
        )
    )
    # r11 (guide §2.4): the per-user journey collapse feeds the
    # coalition counts (consumed TWICE through v's marginal self-join)
    # and the totals row — uncached, the touch⋈first-purchase corpus
    # pass re-executed 3× (8 events scans in the initial plan → 3,
    # one per pushed event-type predicate). v itself is ≤2^c rows.
    journeys = touches.groupBy("user_id").agg(
        F.array_join(
            F.array_sort(F.collect_set("event_type")), ","
        ).alias("s"),
        F.max(F.col("fp_ms").isNotNull().cast("int")).alias("conv"),
    ).cache()
    coal = journeys.groupBy("s").agg(
        F.count(F.lit(1)).alias("n_j"),
        F.sum("conv").alias("n_c"),
    )
    channels = (
        ev.filter(F.col("event_type") != "purchase")
        .select(F.col("event_type").alias("ch"))
        .distinct()
    )
    chlist = channels.agg(
        F.array_sort(F.collect_list("ch")).alias("chs"),
        F.count(F.lit(1)).alias("c"),
    )
    masks = chlist.select(
        "chs",
        "c",
        F.explode(
            F.sequence(F.lit(0), F.expr("shiftleft(1, c) - 1"))
        ).alias("mask"),
    ).select(
        "chs",
        "c",
        "mask",
        F.array_join(
            F.expr(
                "transform(filter(transform(chs, (x, i) -> "
                "struct(x as ch, i as ix)), "
                "p -> (shiftright(mask, p.ix) & 1) = 1), p -> p.ch)"
            ),
            ",",
        ).alias("s"),
        F.bit_count(F.col("mask")).alias("sz"),
    )
    v = masks.join(F.broadcast(coal), "s", "left").select(
        "chs",
        "c",
        "mask",
        "sz",
        F.coalesce(
            F.col("n_c").cast("double") / F.col("n_j").cast("double"),
            F.lit(0.0),
        ).alias("v"),
    ).cache()
    # marginal pairs: for channel i not in S, join v(S) to v(S ∪ {i})
    base = v.select(
        "chs", "c", F.col("mask").alias("m0"), F.col("sz").alias("sz0"),
        F.col("v").alias("v0"),
    ).crossJoin(
        spark.range(0, 16).select(F.col("id").cast("int").alias("ix"))
    ).filter(
        (F.col("ix") < F.col("c"))
        & F.expr("(m0 & shiftleft(1, ix)) = 0")
    )
    with_i = base.withColumn("m1", F.expr("m0 + shiftleft(1, ix)"))
    v1 = v.select(F.col("mask").alias("m1"), F.col("v").alias("v1"))
    terms = (
        with_i.join(F.broadcast(v1), "m1")
        .select(
            F.element_at(F.col("chs"), F.col("ix") + 1).alias("channel"),
            "c",
            "sz0",
            (
                F.factorial(F.col("sz0")).cast("double")
                * F.factorial(F.col("c") - 1 - F.col("sz0")).cast(
                    "double"
                )
                / F.factorial(F.col("c")).cast("double")
                * (F.col("v1") - F.col("v0"))
            ).alias("term"),
        )
        .select(
            "channel",
            # e12-integer term: the per-channel sum is exact/order-free
            F.floor(F.col("term") * F.lit(1e12) + F.lit(0.5))
            .cast("long")
            .alias("t12"),
        )
    )
    tot = journeys.agg(
        F.count(F.lit(1)).alias("n_journeys"),
        F.sum("conv").alias("n_conversions"),
    )
    return (
        terms.groupBy("channel")
        .agg(F.sum("t12").alias("phi12"))
        .crossJoin(F.broadcast(tot))
        .select(
            "channel",
            F.col("n_journeys").cast("long").alias("n_journeys"),
            F.col("n_conversions").cast("long").alias("n_conversions"),
            stable_round(
                F.col("phi12").cast("double") / F.lit(1e12), 6
            ).alias("shapley_value"),
        )
        .orderBy("channel")
    )


ORACLE_SHAPLEY = f"""
WITH fp AS (
  SELECT user_id, min(epoch_ms(ts)) AS fp_ms
  FROM events WHERE event_type = 'purchase' GROUP BY 1
), touches AS (
  SELECT e.user_id, e.event_type,
         CASE WHEN f.fp_ms IS NOT NULL THEN 1 ELSE 0 END AS has_fp
  FROM events e LEFT JOIN fp f USING (user_id)
  WHERE e.event_type <> 'purchase'
    AND (f.fp_ms IS NULL OR epoch_ms(e.ts) < f.fp_ms)
), journeys AS (
  SELECT user_id,
         list_aggregate(list_sort(list(DISTINCT event_type)),
                        'string_agg', ',') AS s,
         max(has_fp) AS conv
  FROM touches GROUP BY 1
), coal AS (
  SELECT s, count(*) AS n_j, sum(conv) AS n_c FROM journeys GROUP BY 1
), chl AS (
  SELECT list_sort(list(DISTINCT event_type)) AS chs,
         count(DISTINCT event_type) AS c
  FROM events WHERE event_type <> 'purchase'
), masks AS (
  SELECT chs, c, mask,
         list_aggregate(
           list_transform(
             list_filter(range(1, c + 1),
                         ix -> ((mask >> (ix - 1)) & 1) = 1),
             ix -> chs[ix]),
           'string_agg', ',') AS s,
         bit_count(CAST(mask AS BIGINT)) AS sz
  FROM chl, unnest(range(0, (1 << c))) AS t(mask)
), v AS (
  SELECT m.chs, m.c, m.mask, m.sz,
         coalesce(CAST(n_c AS DOUBLE) / n_j, 0.0) AS v
  FROM masks m LEFT JOIN coal ON coalesce(m.s, '') = coal.s
), terms AS (
  SELECT v0.chs[ix + 1] AS channel,
         CAST(floor(
           (CAST(factorial(CAST(v0.sz AS INTEGER)) AS DOUBLE)
            * CAST(factorial(CAST(v0.c - 1 - v0.sz AS INTEGER))
                   AS DOUBLE)
            / CAST(factorial(CAST(v0.c AS INTEGER)) AS DOUBLE)
            * (v1.v - v0.v)) * 1e12 + 0.5) AS BIGINT) AS t12
  FROM v v0
  JOIN unnest(range(0, 16)) AS u(ix) ON ix < v0.c
  JOIN v v1 ON v1.mask = v0.mask + (1 << ix)
  WHERE ((v0.mask >> ix) & 1) = 0
), tot AS (
  SELECT count(*) AS n_journeys, sum(conv) AS n_conversions
  FROM journeys
)
SELECT channel,
       CAST(n_journeys AS BIGINT) AS n_journeys,
       CAST(n_conversions AS BIGINT) AS n_conversions,
       {sql_stable_round("CAST(sum(t12) AS DOUBLE) / 1e12", 6)}
         AS shapley_value
FROM terms, tot
GROUP BY 1, 2, 3 ORDER BY channel
""".strip()


QUERIES.update(
    {
        "metric_extreme_value": q_metric_extreme_value,
        "metric_cointegration": q_metric_cointegration,
        "demand_croston": q_demand_croston,
        "events_attribution_shapley": q_events_attribution_shapley,
    }
)

ORACLES.update(
    {
        "metric_extreme_value": ORACLE_EXTREME_VALUE,
        "metric_cointegration": ORACLE_COINTEGRATION,
        "demand_croston": ORACLE_CROSTON,
        "events_attribution_shapley": ORACLE_SHAPLEY,
    }
)


# ------------------------------------------- safety stock / reorder


_SS_Z95 = 1.6449  # 95% cycle-service-level normal quantile
_SS_MIN_WEEKS = 8


def q_brand_safety_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAFETY STOCK + REORDER POINT per part brand (the classical
    normal-demand model — Silver, Pyke & Peterson 1998): weekly
    demand mean/σ over the GLOBAL week span (zero-demand weeks count
    — computed from sparse sums, never densified), replenishment
    lead time estimated as the mean order→ship latency over CAUSAL
    lines only (ship ≥ order — the synthetic dates carry no
    causality, so non-causal lines are excluded from the lead
    estimate and the exclusion is part of the contract), safety stock
    = z₀.₉₅·σ_w·√L_w and reorder point = μ_w·L_w + SS — the
    inventory-policy layer above the family's demand-pattern router
    (`demand_pattern_sbc`) and forecasts (`demand_croston`).

    Exactness: weekly sums exact e2; mean/variance from exact DEC38
    moments over W calendar weeks (sparse zeros enter via W, not via
    generated rows); lead time an exact day-sum ratio; the
    policy numbers are ONE fixed-shape double expression each.
    stable_round(4).

    Scale: fact scan → |brands|×|weeks| sums (ONE shuffle, map-side
    partials); the lead-time join is fact⋈fact CO-PARTITIONED on
    l_orderkey/o_orderkey; the global week span is a broadcast 1-row
    aggregate."""
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_partkey",
        F.floor(
            F.datediff(F.col("l_shipdate"), F.lit("1970-01-01").cast("date"))
            / F.lit(7)
        )
        .cast("long")
        .alias("w"),
        F.datediff(
            F.col("l_shipdate"), F.lit("1970-01-01").cast("date")
        ).alias("ship_day"),
        F.floor(F.col("l_quantity") * 100 + F.lit(0.5))
        .cast("long")
        .alias("q_e2"),
    )
    part = load_table(spark, sf_dir, "part").select(
        "p_partkey", "p_brand"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.datediff(
            F.col("o_orderdate"), F.lit("1970-01-01").cast("date")
        ).alias("order_day"),
    )
    lo = li.join(orders, li.l_orderkey == orders.o_orderkey).join(
        F.broadcast(part), li.l_partkey == part.p_partkey
    )
    # r11 (guide §2.4): ONE pass over the fact⋈fact⋈dim join — span,
    # weekly sums and the causal lead-time partials all fold through
    # the (brand, week) aggregate (every line belongs to exactly one
    # cell, and all partials are exact integer sums, so the per-brand
    # rollup is bit-identical to aggregating the join directly). The
    # previous shape re-ran the lineitem⋈orders join three times.
    causal = F.col("ship_day") >= F.col("order_day")
    weekly = lo.groupBy("p_brand", "w").agg(
        F.sum("q_e2").alias("d"),
        F.count(F.when(causal, 1)).alias("nl"),
        F.sum(
            F.when(
                causal,
                (F.col("ship_day") - F.col("order_day")).cast("long"),
            )
        ).alias("ls"),
    ).cache()  # bounded |brands|×|weeks| rows; feeds span + mom
    span = weekly.agg(
        (F.max("w") - F.min("w") + 1).cast("long").alias("weeks")
    )
    # n_lines > 0 replicates the old mom⋈lead INNER join: a brand with
    # zero causal lines had no lead row and was dropped there too
    mom = (
        weekly.groupBy("p_brand")
        .agg(
            F.sum("d").alias("s"),
            F.sum(
                F.col("d").cast(_DEC) * F.col("d").cast(_DEC)
            ).alias("q"),
            F.sum("nl").alias("n_lines"),
            F.sum("ls").alias("lead_days_sum"),
        )
        .filter(F.col("n_lines") > 0)
    )
    j = (
        mom.crossJoin(F.broadcast(span))
        .filter(F.col("weeks") >= _SS_MIN_WEEKS)
    )
    wk = F.col("weeks").cast("double")
    mu_w = F.col("s").cast("double") / wk / F.lit(100.0)
    # variance over ALL W weeks incl. zeros: (W·Q − S²)/(W(W−1))
    var_num = (
        F.col("weeks").cast(_DEC) * F.col("q")
        - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
    ).cast("double")
    sigma_w = F.sqrt(var_num / (wk * (wk - 1.0))) / F.lit(100.0)
    lead_w = (
        F.col("lead_days_sum").cast("double")
        / F.col("n_lines").cast("double")
        / F.lit(7.0)
    )
    ss = F.lit(_SS_Z95) * sigma_w * F.sqrt(lead_w)
    return j.select(
        F.col("p_brand").alias("brand"),
        F.col("weeks").alias("n_weeks"),
        stable_round(mu_w, 4).alias("mu_week"),
        stable_round(sigma_w, 4).alias("sigma_week"),
        stable_round(lead_w * 7.0, 4).alias("lead_days"),
        stable_round(ss, 4).alias("safety_stock"),
        stable_round(mu_w * lead_w + ss, 4).alias("reorder_point"),
    ).orderBy("brand")


ORACLE_SAFETY_STOCK = f"""
WITH lo AS (
  SELECT p.p_brand AS brand,
         date_diff('day', DATE '1970-01-01',
                   CAST(l.l_shipdate AS DATE)) // 7 AS w,
         date_diff('day', DATE '1970-01-01',
                   CAST(l.l_shipdate AS DATE))
           - date_diff('day', DATE '1970-01-01',
                       CAST(o.o_orderdate AS DATE)) AS lead_days,
         CAST(floor(l.l_quantity * 100 + 0.5) AS BIGINT) AS q_e2
  FROM lineitem l
  JOIN orders o ON o.o_orderkey = l.l_orderkey
  JOIN part p ON p.p_partkey = l.l_partkey
), span AS (
  SELECT max(w) - min(w) + 1 AS weeks FROM lo
), weekly AS (
  SELECT brand, w, CAST(sum(q_e2) AS BIGINT) AS d
  FROM lo GROUP BY 1, 2
), lead AS (
  SELECT brand, count(*) AS n_lines,
         CAST(sum(lead_days) AS BIGINT) AS lead_days_sum
  FROM lo WHERE lead_days >= 0 GROUP BY 1
), mom AS (
  SELECT brand, CAST(sum(d) AS HUGEINT) AS s,
         sum(CAST(d AS HUGEINT) * d) AS q
  FROM weekly GROUP BY 1
), j AS (
  SELECT mom.brand, s, q, n_lines, lead_days_sum, weeks
  FROM mom JOIN lead USING (brand), span
  WHERE weeks >= {_SS_MIN_WEEKS}
), calc AS (
  SELECT brand, weeks,
         CAST(s AS DOUBLE) / weeks / 100.0 AS mu_w,
         sqrt(CAST(weeks * q - s * s AS DOUBLE)
              / (CAST(weeks AS DOUBLE) * (weeks - 1.0))) / 100.0
           AS sigma_w,
         CAST(lead_days_sum AS DOUBLE) / n_lines / 7.0 AS lead_w
  FROM j
)
SELECT brand, CAST(weeks AS BIGINT) AS n_weeks,
       {sql_stable_round("mu_w", 4)} AS mu_week,
       {sql_stable_round("sigma_w", 4)} AS sigma_week,
       {sql_stable_round("lead_w * 7.0", 4)} AS lead_days,
       {sql_stable_round(
           f"{_SS_Z95} * sigma_w * sqrt(lead_w)", 4)} AS safety_stock,
       {sql_stable_round(
           f"mu_w * lead_w + {_SS_Z95} * sigma_w * sqrt(lead_w)",
           4)} AS reorder_point
FROM calc ORDER BY brand
""".strip()


# --------------------------------------------- sample entropy (SampEn)


_SE_MIN_HOURS = 72
_SE_R_FRAC = 0.2  # tolerance r = 0.2·σ, the field's default


def q_metric_sample_entropy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SAMPLE ENTROPY per metric (Richman & Moorman 2000, m = 2,
    r = 0.2σ; aligned-template variant — A and B both count over
    full 3-hour templates, documented): the regularity measure the
    family's Hurst/LZ rows bracket — LOW SampEn means repeating
    patterns (template matches persist one step longer than chance),
    HIGH means irregularity. SampEn = −ln(A/B) with B = pairs of
    templates matching on their first 2 points and A = those also
    matching on the 3rd; self-matches excluded by the h < h'
    pairing.

    Exactness: the tolerance is an INTEGER e2 threshold
    (floor(0.2·σ_e2 + ½), σ from exact DEC38 moments — both engines
    evaluate the same fixed-shape expression), so every match
    comparison is exact integer arithmetic; A, B are exact counts
    and SampEn is ONE log of their ratio. stable_round(4).

    Scale: the corpus collapses to |metrics|×|hours| first (ONE
    shuffle); templates need CONSECUTIVE hours (h+1, h+2 present —
    lead() checked against the hour number, not row adjacency); the
    pair join is metric-co-partitioned and |hours|²-bounded — hours
    grow with the observation window, never data volume (the
    Mann-Kendall pair-join argument)."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    stats = (
        hourly.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC)).alias(
                "q"
            ),
        )
        .filter(F.col("n") >= _SE_MIN_HOURS)
    )
    nn = F.col("n").cast("double")
    var_num = (
        F.col("n").cast(_DEC) * F.col("q")
        - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
    ).cast("double")
    r_e2 = F.floor(
        F.lit(_SE_R_FRAC) * F.sqrt(var_num / (nn * (nn - 1.0)))
        + F.lit(0.5)
    ).cast("long")
    tol = stats.select("event_type", r_e2.alias("r"))
    wh = Window.partitionBy("event_type").orderBy("h")
    tmpl = (
        hourly.withColumn("h1", F.lead("h").over(wh))
        .withColumn("v1", F.lead("v").over(wh))
        .withColumn("h2", F.lead("h", 2).over(wh))
        .withColumn("v2", F.lead("v", 2).over(wh))
        .filter(
            (F.col("h1") == F.col("h") + 1)
            & (F.col("h2") == F.col("h") + 2)
        )
        .join(F.broadcast(tol), "event_type")
    )
    a_t = tmpl.select(
        "event_type", "r",
        F.col("h").alias("ha"), F.col("v").alias("a0"),
        F.col("v1").alias("a1"), F.col("v2").alias("a2"),
    )
    b_t = tmpl.select(
        "event_type",
        F.col("h").alias("hb"), F.col("v").alias("b0"),
        F.col("v1").alias("b1"), F.col("v2").alias("b2"),
    )
    pairs = a_t.join(b_t, "event_type").filter(
        F.col("ha") < F.col("hb")
    )
    m2 = (
        F.abs(F.col("a0") - F.col("b0")) <= F.col("r")
    ) & (F.abs(F.col("a1") - F.col("b1")) <= F.col("r"))
    m3 = m2 & (F.abs(F.col("a2") - F.col("b2")) <= F.col("r"))
    agg = pairs.groupBy("event_type", "r").agg(
        F.sum(m2.cast("long")).alias("b_cnt"),
        F.sum(m3.cast("long")).alias("a_cnt"),
        F.count(F.lit(1)).alias("n_pairs"),
    )
    sampen = -F.log(
        F.col("a_cnt").cast("double") / F.col("b_cnt").cast("double")
    )
    return agg.select(
        "event_type",
        (F.col("r").cast("double") / F.lit(100.0)).alias("tolerance"),
        F.col("b_cnt").cast("long").alias("b_matches"),
        F.col("a_cnt").cast("long").alias("a_matches"),
        F.when(
            (F.col("a_cnt") == 0) | (F.col("b_cnt") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(stable_round(sampen, 4))
        .alias("sampen"),
    ).orderBy("event_type")


ORACLE_SAMPLE_ENTROPY = f"""
WITH hourly AS (
{_HOURLY_SQL}
), stats AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS HUGEINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS q
  FROM hourly GROUP BY 1 HAVING count(*) >= {_SE_MIN_HOURS}
), tol AS (
  SELECT event_type,
         CAST(floor({_SE_R_FRAC}
                    * sqrt(CAST(n * q - s * s AS DOUBLE)
                           / (CAST(n AS DOUBLE) * (n - 1.0)))
                    + 0.5) AS BIGINT) AS r
  FROM stats
), tmpl AS (
  SELECT t.event_type, tol.r, t.h, t.v,
         lead(t.v) OVER w AS v1, lead(t.h) OVER w AS h1,
         lead(t.v, 2) OVER w AS v2, lead(t.h, 2) OVER w AS h2
  FROM hourly t JOIN tol USING (event_type)
  WINDOW w AS (PARTITION BY t.event_type ORDER BY t.h)
), full3 AS (
  SELECT event_type, r, h, v, v1, v2 FROM tmpl
  WHERE h1 = h + 1 AND h2 = h + 2
), pairs AS (
  SELECT a.event_type, a.r,
         CASE WHEN abs(a.v - b.v) <= a.r
               AND abs(a.v1 - b.v1) <= a.r THEN 1 ELSE 0 END AS m2,
         CASE WHEN abs(a.v - b.v) <= a.r
               AND abs(a.v1 - b.v1) <= a.r
               AND abs(a.v2 - b.v2) <= a.r THEN 1 ELSE 0 END AS m3
  FROM full3 a JOIN full3 b
    ON a.event_type = b.event_type AND a.h < b.h
), agg AS (
  SELECT event_type, r, sum(m2) AS b_cnt, sum(m3) AS a_cnt
  FROM pairs GROUP BY 1, 2
)
SELECT event_type, CAST(r AS DOUBLE) / 100.0 AS tolerance,
       CAST(b_cnt AS BIGINT) AS b_matches,
       CAST(a_cnt AS BIGINT) AS a_matches,
       CASE WHEN a_cnt = 0 OR b_cnt = 0 THEN NULL ELSE
       {sql_stable_round(
           "-ln(CAST(a_cnt AS DOUBLE) / CAST(b_cnt AS DOUBLE))",
           4)} END AS sampen
FROM agg ORDER BY event_type
""".strip()


# ------------------------------------------------ rich-club coefficient


_RC_MINSUP = 2  # same support floor as the co-purchase graph family
_RC_QS = (25, 50, 75, 90)  # degree-percentile thresholds


def q_graph_richclub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RICH-CLUB COEFFICIENT of the co-purchase graph (Zhou &
    Mondragón 2004): φ(k) = 2·E_k / (N_k·(N_k−1)) over the subgraph
    of nodes with degree > k, with k swept at the EXACT degree
    percentiles {_RC_QS} (k_q = the degree at sorted position
    ⌈q·N⌉ — data-driven thresholds discriminate at any graph
    density, where a fixed k list saturates) — do the highest-degree
    parts preferentially co-occur with EACH OTHER (φ→1: an
    interconnected core the family's assortativity number can only
    hint at) or only with the periphery? The structural complement
    to graph_assortativity / graph_kcore.

    Exactness: k_q is an exact order statistic (row_number over a
    deterministic (deg, node) order); N_k, E_k exact counts; φ is
    ONE division. stable_round(6).

    Scale: edges from the Σ basket² order-key co-partitioned
    self-join (support ≥ {_RC_MINSUP}); degrees are a part-sized
    aggregate BROADCAST onto the edge list; the percentile sweep is
    a 4-row literal join over the bounded degree/edge relations.
    Same ×N-replica cost-model note as its graph siblings: replicas
    densify the support graph rather than scale it
    (docs/SCALING.md).
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    a = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1")
    )
    b = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2")
    )
    # r11 optimization (guide §2.4): edges and deg are each consumed
    # by 2-4 downstream branches; without materialization every branch
    # re-ran the Σ basket² self-join (360-Exchange plan). Both are
    # bounded (support-floored pair graph / part-sized degree table) —
    # eagerly localCheckpoint so the self-join runs ONCE.
    edges = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _RC_MINSUP)
        .select("p1", "p2")
    ).cache()
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionByName(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).cache()
    qs = spark.createDataFrame(
        [(int(q),) for q in _RC_QS], "q long"
    )
    # distributed global order statistic: bucket by deg itself
    # (monotone, ties share a bucket), never a one-task global sort
    ranked = global_rank(
        deg,
        F.col("deg"),
        [F.col("deg"), F.col("p")],
        rank_col="rn",
        total_col="n_nodes",
    )
    ks = (
        qs.crossJoin(
            F.broadcast(
                ranked.select("n_nodes").limit(1)
            )
        )
        .select(
            "q",
            F.ceil(
                F.col("q") * F.col("n_nodes") / F.lit(100)
            ).cast("long").alias("pos"),
        )
        .join(ranked, F.col("pos") == F.col("rn"))
        .select("q", F.col("deg").alias("k"))
    ).cache()  # 4 rows; reused by nk, ed and the output join
    nk = (
        deg.crossJoin(F.broadcast(ks))
        .filter(F.col("deg") > F.col("k"))
        .groupBy("q", "k")
        .agg(F.count(F.lit(1)).alias("n_k"))
    )
    ed = (
        edges.join(
            F.broadcast(
                deg.select(F.col("p").alias("p1"), F.col("deg").alias("d1"))
            ),
            "p1",
        )
        .join(
            F.broadcast(
                deg.select(F.col("p").alias("p2"), F.col("deg").alias("d2"))
            ),
            "p2",
        )
        .crossJoin(F.broadcast(ks))
        .filter((F.col("d1") > F.col("k")) & (F.col("d2") > F.col("k")))
        .groupBy("q", "k")
        .agg(F.count(F.lit(1)).alias("e_k"))
    )
    out = (
        ks.join(nk, ["q", "k"], "left")
        .join(ed, ["q", "k"], "left")
        .select(
            "q",
            "k",
            F.coalesce(F.col("n_k"), F.lit(0)).cast("long").alias("n_k"),
            F.coalesce(F.col("e_k"), F.lit(0)).cast("long").alias("e_k"),
        )
    )
    phi = (
        F.lit(2.0)
        * F.col("e_k").cast("double")
        / (F.col("n_k").cast("double") * (F.col("n_k").cast("double") - 1.0))
    )
    return out.select(
        F.col("q").cast("long").alias("deg_percentile"),
        F.col("k").cast("long").alias("k"),
        "n_k",
        "e_k",
        F.when(F.col("n_k") < 2, F.lit(None).cast("double"))
        .otherwise(stable_round(phi, 6))
        .alias("phi"),
    ).orderBy("deg_percentile")


ORACLE_RICHCLUB = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT a.p AS p1, b.p AS p2
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {_RC_MINSUP}
), deg AS (
  SELECT p, count(*) AS deg FROM (
    SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges
  ) GROUP BY 1
), ranked AS (
  SELECT deg, row_number() OVER (ORDER BY deg, p) AS rn,
         count(*) OVER () AS n_nodes
  FROM deg
), ks AS (
  SELECT q, deg AS k
  FROM (SELECT unnest({list(_RC_QS)}) AS q) qs
  JOIN ranked ON rn = CAST(ceil(q * n_nodes / 100.0) AS BIGINT)
), nk AS (
  SELECT q, k, count(*) AS n_k
  FROM deg, ks WHERE deg > k GROUP BY 1, 2
), ed AS (
  SELECT q, k, count(*) AS e_k
  FROM edges e
  JOIN deg d1 ON d1.p = e.p1
  JOIN deg d2 ON d2.p = e.p2, ks
  WHERE d1.deg > k AND d2.deg > k GROUP BY 1, 2
)
SELECT ks.q AS deg_percentile, ks.k,
       coalesce(n_k, 0) AS n_k, coalesce(e_k, 0) AS e_k,
       CASE WHEN coalesce(n_k, 0) < 2 THEN NULL ELSE
       {sql_stable_round(
           "2.0 * coalesce(e_k, 0)"
           " / (CAST(n_k AS DOUBLE) * (n_k - 1.0))", 6)} END AS phi
FROM ks LEFT JOIN nk USING (q, k) LEFT JOIN ed USING (q, k)
ORDER BY deg_percentile
""".strip()


QUERIES.update(
    {
        "brand_safety_stock": q_brand_safety_stock,
        "metric_sample_entropy": q_metric_sample_entropy,
        "graph_richclub": q_graph_richclub,
    }
)

ORACLES.update(
    {
        "brand_safety_stock": ORACLE_SAFETY_STOCK,
        "metric_sample_entropy": ORACLE_SAMPLE_ENTROPY,
        "graph_richclub": ORACLE_RICHCLUB,
    }
)


# --------------------------------------------- Friedman blocked ranks


_FR_MIN_DAYS = 14  # need the dow × hod grid reasonably filled
_FR_CHI2_05_6 = 12.5916  # χ²(6) upper 5% critical value (k−1 = 6)


def q_metric_friedman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FRIEDMAN BLOCKED RANK TEST per metric (Friedman 1937): is
    there a DAY-OF-WEEK effect after CONTROLLING for hour-of-day?
    Each of the 24 hour-of-day blocks ranks the 7 day-of-week
    totals; Q = 12/(n·k·(k+1))·ΣR_j² − 3n(k+1) against χ²(6) — the
    two-way nonparametric design the family's Kruskal-Wallis row
    (one-way, hour groups) cannot express: a metric can show a
    strong weekday pattern that KW's hour-of-day grouping never
    sees.

    Exactness: (hod, dow) cell totals are exact e2 sums; ranks ride
    DOUBLED integers (average rank = (2·min_rank + ties − 1)/2, so
    2·rank is always integral — ties stay exact); R_j and Q are ONE
    fixed-shape expression. stable_round(4).

    Scale: the corpus collapses to |metrics|×24×7 cells in ONE
    shuffle with map-side partials; the rank window partitions by
    (metric, hod); output is |metrics| rows."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    cells = (
        hourly.groupBy(
            "event_type",
            F.pmod(F.col("h"), F.lit(24)).alias("hod"),
            F.pmod(F.floor(F.col("h") / F.lit(24)) + 4, F.lit(7)).alias(
                "dow"
            ),
        )
        .agg(F.sum("v").alias("cv"), F.count(F.lit(1)).alias("nh"))
    )
    ok = (
        hourly.groupBy("event_type")
        .agg(
            (F.max(F.floor(F.col("h") / 24)) - F.min(F.floor(F.col("h") / 24)) + 1).alias("days"),
        )
        .filter(F.col("days") >= _FR_MIN_DAYS)
        .select("event_type")
    )
    # complete grid only: blocks missing a treatment can't rank 7 —
    # require all 7 dow cells per (metric, hod) block
    full_blocks = (
        cells.groupBy("event_type", "hod")
        .agg(F.count(F.lit(1)).alias("ncell"))
        .filter(F.col("ncell") == 7)
        .select("event_type", "hod")
    )
    c = cells.join(F.broadcast(ok), "event_type").join(
        full_blocks, ["event_type", "hod"]
    )
    wb = Window.partitionBy("event_type", "hod").orderBy("cv")
    # doubled average rank: 2·min_rank + ties − 1 (exact under ties)
    ranked = c.select(
        "event_type",
        "hod",
        "dow",
        (
            2 * F.rank().over(wb)
            + F.count(F.lit(1)).over(
                Window.partitionBy("event_type", "hod", "cv")
            )
            - 1
        ).alias("r2"),
    )
    per_dow = ranked.groupBy("event_type", "dow").agg(
        F.sum("r2").alias("rj2"),
        F.count(F.lit(1)).alias("n_blocks"),
    )
    agg = per_dow.groupBy("event_type").agg(
        F.sum(
            F.col("rj2").cast(_DEC) * F.col("rj2").cast(_DEC)
        ).alias("sr2"),
        F.max("n_blocks").alias("n"),
        F.min("n_blocks").alias("n_min"),
    ).filter(F.col("n") == F.col("n_min"))
    nb = F.col("n").cast("double")
    k = F.lit(7.0)
    # Q with doubled ranks: ΣR_j² = sr2/4
    q_stat = (
        F.lit(12.0)
        / (nb * k * (k + 1.0))
        * (F.col("sr2").cast("double") / F.lit(4.0))
        - F.lit(3.0) * nb * (k + 1.0)
    )
    return agg.select(
        "event_type",
        F.col("n").cast("long").alias("n_blocks"),
        stable_round(q_stat, 4).alias("q_stat"),
        F.when(q_stat > F.lit(_FR_CHI2_05_6), F.lit("dow_effect"))
        .otherwise(F.lit("no_dow_effect"))
        .alias("verdict"),
    ).orderBy("event_type")


ORACLE_FRIEDMAN = f"""
WITH hourly AS (
{_HOURLY_SQL}
), cells AS (
  SELECT event_type, h % 24 AS hod, ((h // 24) + 4) % 7 AS dow,
         CAST(sum(v) AS HUGEINT) AS cv
  FROM hourly GROUP BY 1, 2, 3
), ok AS (
  SELECT event_type
  FROM hourly GROUP BY 1
  HAVING max(h // 24) - min(h // 24) + 1 >= {_FR_MIN_DAYS}
), full_blocks AS (
  SELECT event_type, hod FROM cells GROUP BY 1, 2
  HAVING count(*) = 7
), ranked AS (
  SELECT c.event_type, c.hod, c.dow,
         2 * rank() OVER (PARTITION BY c.event_type, c.hod
                          ORDER BY c.cv)
           + count(*) OVER (PARTITION BY c.event_type, c.hod, c.cv)
           - 1 AS r2
  FROM cells c
  JOIN ok USING (event_type)
  JOIN full_blocks USING (event_type, hod)
), per_dow AS (
  SELECT event_type, dow, CAST(sum(r2) AS HUGEINT) AS rj2,
         count(*) AS n_blocks
  FROM ranked GROUP BY 1, 2
), agg AS (
  SELECT event_type, sum(rj2 * rj2) AS sr2,
         max(n_blocks) AS n, min(n_blocks) AS n_min
  FROM per_dow GROUP BY 1 HAVING max(n_blocks) = min(n_blocks)
)
SELECT event_type, CAST(n AS BIGINT) AS n_blocks,
       {sql_stable_round(
           "12.0 / (CAST(n AS DOUBLE) * 7.0 * 8.0)"
           " * (CAST(sr2 AS DOUBLE) / 4.0)"
           " - 3.0 * CAST(n AS DOUBLE) * 8.0", 4)} AS q_stat,
       CASE WHEN 12.0 / (CAST(n AS DOUBLE) * 7.0 * 8.0)
                 * (CAST(sr2 AS DOUBLE) / 4.0)
                 - 3.0 * CAST(n AS DOUBLE) * 8.0 > {_FR_CHI2_05_6}
            THEN 'dow_effect' ELSE 'no_dow_effect' END AS verdict
FROM agg ORDER BY event_type
""".strip()


# ------------------------------------------- Granger causality screen


_GC_MIN_HOURS = 72


def q_metric_granger(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRANGER CAUSALITY screen per DIRECTED metric pair (Granger
    1969, lag-1 bivariate form): does yesterday's x improve the
    one-hour-ahead prediction of y beyond y's own past? OLS of y_t
    on (y_{t−1}, x_{t−1}) in closed form from exact centered
    moments; the report is t(γ̂) for the cross-lag term against
    ±1.96 — the DIRECTED temporal complement to the family's
    lead-lag correlation (which is symmetric evidence) and
    `metric_cointegration` (which is about levels, not increments).

    Exactness: the ten raw moments over aligned consecutive-hour
    triples ride DEC38; centered moments, β̂/γ̂, SSR and t are ONE
    fixed-shape double expression chain. stable_round(4)/(6).
    Degenerate (singular normal equations) pairs report NULL.

    Scale: ONE corpus shuffle to |metrics|×|hours|; the pair
    alignment is an hour-co-partitioned join bounded by |metrics|²
    pairs; moments collapse per pair with map-side partials."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    wh = Window.partitionBy("event_type").orderBy("h")
    lagged = (
        hourly.withColumn("hp", F.lag("h").over(wh))
        .withColumn("vp", F.lag("v").over(wh))
        .filter(F.col("hp") == F.col("h") - 1)
        .select("event_type", "h", F.col("v").alias("y"), F.col("vp").alias("u"))
    )
    xs = hourly.select(
        F.col("event_type").alias("mx"),
        (F.col("h") + 1).alias("h"),
        F.col("v").alias("w"),
    )
    j = (
        lagged.join(xs, "h")
        .filter(F.col("event_type") != F.col("mx"))
    )
    mom = (
        j.groupBy(
            F.col("mx").alias("cause"),
            F.col("event_type").alias("effect"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("y").alias("sy"),
            F.sum("u").alias("su"),
            F.sum("w").alias("sw"),
            F.sum(F.col("y").cast(_DEC) * F.col("y").cast(_DEC)).alias("syy"),
            F.sum(F.col("u").cast(_DEC) * F.col("u").cast(_DEC)).alias("suu"),
            F.sum(F.col("w").cast(_DEC) * F.col("w").cast(_DEC)).alias("sww"),
            F.sum(F.col("u").cast(_DEC) * F.col("y").cast(_DEC)).alias("suy"),
            F.sum(F.col("w").cast(_DEC) * F.col("y").cast(_DEC)).alias("swy"),
            F.sum(F.col("u").cast(_DEC) * F.col("w").cast(_DEC)).alias("suw"),
        )
        .filter(F.col("n") >= _GC_MIN_HOURS)
    )
    nn = F.col("n").cast(_DEC)
    cuu = (nn * F.col("suu") - F.col("su").cast(_DEC) * F.col("su").cast(_DEC)).cast("double")
    cww = (nn * F.col("sww") - F.col("sw").cast(_DEC) * F.col("sw").cast(_DEC)).cast("double")
    cuw = (nn * F.col("suw") - F.col("su").cast(_DEC) * F.col("sw").cast(_DEC)).cast("double")
    cuy = (nn * F.col("suy") - F.col("su").cast(_DEC) * F.col("sy").cast(_DEC)).cast("double")
    cwy = (nn * F.col("swy") - F.col("sw").cast(_DEC) * F.col("sy").cast(_DEC)).cast("double")
    cyy = (nn * F.col("syy") - F.col("sy").cast(_DEC) * F.col("sy").cast(_DEC)).cast("double")
    det = cuu * cww - cuw * cuw
    beta = (cuy * cww - cwy * cuw) / det
    gamma = (cwy * cuu - cuy * cuw) / det
    # SSR·n (scaled residual variance): n·SSR = cyy − β·cuy − γ·cwy
    nssr = cyy - beta * cuy - gamma * cwy
    nd = F.col("n").cast("double")
    sigma2n = nssr / (nd - 3.0)
    t_gamma = gamma / F.sqrt(sigma2n * cuu / det)
    degenerate = (det <= 0) | (nssr <= 0)
    return mom.select(
        "cause",
        "effect",
        F.col("n").cast("long").alias("n_hours"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(gamma, 6))
        .alias("cross_lag_coef"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(t_gamma, 4))
        .alias("t_stat"),
        F.when(degenerate, F.lit("degenerate"))
        .when(F.abs(t_gamma) > 1.96, F.lit("granger_causes"))
        .otherwise(F.lit("no_evidence"))
        .alias("verdict"),
    ).orderBy("cause", "effect")


ORACLE_GRANGER = f"""
WITH hourly AS (
{_HOURLY_SQL}
), lagged AS (
  SELECT event_type, h, v AS y,
         lag(v) OVER (PARTITION BY event_type ORDER BY h) AS u,
         lag(h) OVER (PARTITION BY event_type ORDER BY h) AS hp
  FROM hourly
), al AS (
  SELECT l.event_type AS effect, x.event_type AS cause, l.h,
         l.y, l.u, x.v AS w
  FROM lagged l
  JOIN hourly x ON x.h = l.h - 1 AND x.event_type <> l.event_type
  WHERE l.hp = l.h - 1
), mom AS (
  SELECT cause, effect, count(*) AS n,
         CAST(sum(y) AS HUGEINT) AS sy, CAST(sum(u) AS HUGEINT) AS su,
         CAST(sum(w) AS HUGEINT) AS sw,
         sum(CAST(y AS HUGEINT) * y) AS syy,
         sum(CAST(u AS HUGEINT) * u) AS suu,
         sum(CAST(w AS HUGEINT) * w) AS sww,
         sum(CAST(u AS HUGEINT) * y) AS suy,
         sum(CAST(w AS HUGEINT) * y) AS swy,
         sum(CAST(u AS HUGEINT) * w) AS suw
  FROM al GROUP BY 1, 2 HAVING count(*) >= {_GC_MIN_HOURS}
), cm AS (
  SELECT cause, effect, n,
         CAST(n * suu - su * su AS DOUBLE) AS cuu,
         CAST(n * sww - sw * sw AS DOUBLE) AS cww,
         CAST(n * suw - su * sw AS DOUBLE) AS cuw,
         CAST(n * suy - su * sy AS DOUBLE) AS cuy,
         CAST(n * swy - sw * sy AS DOUBLE) AS cwy,
         CAST(n * syy - sy * sy AS DOUBLE) AS cyy
  FROM mom
), fit AS (
  SELECT cause, effect, n, cuu, cuw, cuy, cwy, cyy,
         cuu * cww - cuw * cuw AS det,
         (cuy * cww - cwy * cuw) / (cuu * cww - cuw * cuw) AS beta,
         (cwy * cuu - cuy * cuw) / (cuu * cww - cuw * cuw) AS gamma
  FROM cm
), fin AS (
  SELECT cause, effect, n, det, gamma,
         cyy - beta * cuy - gamma * cwy AS nssr, cuu
  FROM fit
)
SELECT cause, effect, CAST(n AS BIGINT) AS n_hours,
       CASE WHEN det <= 0 OR nssr <= 0 THEN NULL ELSE
       {sql_stable_round("gamma", 6)} END AS cross_lag_coef,
       CASE WHEN det <= 0 OR nssr <= 0 THEN NULL ELSE
       {sql_stable_round(
           "gamma / sqrt((nssr / (CAST(n AS DOUBLE) - 3.0))"
           " * cuu / det)", 4)} END AS t_stat,
       CASE WHEN det <= 0 OR nssr <= 0 THEN 'degenerate'
            WHEN abs(gamma / sqrt((nssr / (CAST(n AS DOUBLE) - 3.0))
                                  * cuu / det)) > 1.96
              THEN 'granger_causes'
            ELSE 'no_evidence' END AS verdict
FROM fin ORDER BY cause, effect
""".strip()


QUERIES.update(
    {
        "metric_friedman": q_metric_friedman,
        "metric_granger": q_metric_granger,
    }
)

ORACLES.update(
    {
        "metric_friedman": ORACLE_FRIEDMAN,
        "metric_granger": ORACLE_GRANGER,
    }
)


# ----------------------------------------- mixture-SPRT (always valid)


_DAY_MS_AB = 86_400_000
_SPRT_TAU2 = 0.0001  # mixture prior on the effect (≈1% lift scale)
_SPRT_ALPHA_INV = 20.0  # reject when Λ > 1/α, α = 0.05


def q_events_ab_sprt(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MIXTURE SEQUENTIAL PROBABILITY RATIO TEST over the running A/B
    experiment (Wald 1945; the always-valid mSPRT form of Johari,
    Koomen, Pekelis & Walsh 2017): the same user_id%2 split and
    daily-conversion outcome as `events_ab_test`, but monitored
    CUMULATIVELY — Λ_d from the normal-mixture likelihood ratio over
    all data through day d, rejecting when Λ > 1/α. The property the
    fixed-horizon z-test row cannot offer: peeking every day at THIS
    statistic never inflates the false-positive rate, so the row also
    answers "when could we have honestly stopped?" (first_rejection
    day rides on every row).

    Exactness: cumulative counts are exact prefix sums (window over
    the ≤|days| daily table); θ̂, V, log Λ are ONE fixed-shape double
    chain; always_valid_p = min(1, e^{−log Λ}). stable_round(4)/(6).

    Scale: events collapse to (day, variant, user) conversions in ONE
    shuffle; everything after runs on the |days|-bounded daily table
    (window partitioned — the stream per experiment is one series, a
    monitoring cadence, never data volume)."""
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_millis("ts") / F.lit(_DAY_MS_AB)).cast("long")
    per_user = ev.groupBy(
        day.alias("day"),
        F.pmod(F.col("user_id"), F.lit(2)).cast("int").alias("variant"),
        "user_id",
    ).agg(
        F.max((F.col("event_type") == "purchase").cast("int")).alias(
            "conv"
        )
    )
    daily = per_user.groupBy("day").agg(
        F.sum((F.col("variant") == 0).cast("long")).alias("n0"),
        F.sum((F.col("variant") == 1).cast("long")).alias("n1"),
        F.sum(
            ((F.col("variant") == 0) & (F.col("conv") == 1)).cast("long")
        ).alias("c0"),
        F.sum(
            ((F.col("variant") == 1) & (F.col("conv") == 1)).cast("long")
        ).alias("c1"),
    )
    wcum = (
        Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    )
    # the experiment is ONE series: the |days|-bounded window is the
    # monitoring cadence (plan-audit allowlisted shape for daily
    # cumulative experiment monitors)
    cum = daily.select(
        "day",
        F.sum("n0").over(wcum).alias("N0"),
        F.sum("n1").over(wcum).alias("N1"),
        F.sum("c0").over(wcum).alias("C0"),
        F.sum("c1").over(wcum).alias("C1"),
    ).filter((F.col("N0") > 0) & (F.col("N1") > 0))
    p0 = F.col("C0").cast("double") / F.col("N0").cast("double")
    p1 = F.col("C1").cast("double") / F.col("N1").cast("double")
    pp = (F.col("C0") + F.col("C1")).cast("double") / (
        F.col("N0") + F.col("N1")
    ).cast("double")
    v = pp * (1.0 - pp) * (
        F.lit(1.0) / F.col("N0").cast("double")
        + F.lit(1.0) / F.col("N1").cast("double")
    )
    theta = p1 - p0
    tau2 = F.lit(_SPRT_TAU2)
    log_lambda = 0.5 * F.log(v / (v + tau2)) + (
        theta * theta * tau2 / (2.0 * v * (v + tau2))
    )
    degenerate = v == 0
    scored = cum.select(
        "day",
        (F.col("N0") + F.col("N1")).alias("n_users"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(theta, 6))
        .alias("lift"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(log_lambda, 4))
        .alias("log_lambda"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(
            stable_round(
                F.least(F.lit(1.0), F.exp(-log_lambda)), 6
            )
        )
        .alias("always_valid_p"),
        F.when(
            ~degenerate
            & (log_lambda > F.lit(math.log(_SPRT_ALPHA_INV))),
            F.col("day"),
        ).alias("rej_day"),
    )
    first_rej = scored.agg(F.min("rej_day").alias("first_rejection"))
    return (
        scored.drop("rej_day")
        .crossJoin(F.broadcast(first_rej))
        .orderBy("day")
    )


ORACLE_AB_SPRT = f"""
WITH pu AS (
  SELECT epoch_ms(ts) // {_DAY_MS_AB} AS day,
         CAST(user_id % 2 AS INT) AS variant, user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
           AS conv
  FROM events GROUP BY 1, 2, 3
), daily AS (
  SELECT day,
         sum(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS n0,
         sum(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS n1,
         sum(CASE WHEN variant = 0 AND conv = 1 THEN 1 ELSE 0 END)
           AS c0,
         sum(CASE WHEN variant = 1 AND conv = 1 THEN 1 ELSE 0 END)
           AS c1
  FROM pu GROUP BY 1
), cum AS (
  SELECT day,
         sum(n0) OVER w AS N0, sum(n1) OVER w AS N1,
         sum(c0) OVER w AS C0, sum(c1) OVER w AS C1
  FROM daily
  WINDOW w AS (ORDER BY day ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), sc AS (
  SELECT day, N0 + N1 AS n_users,
         CAST(C1 AS DOUBLE) / N1 - CAST(C0 AS DOUBLE) / N0 AS theta,
         (CAST(C0 + C1 AS DOUBLE) / (N0 + N1))
           * (1.0 - CAST(C0 + C1 AS DOUBLE) / (N0 + N1))
           * (1.0 / N0 + 1.0 / N1) AS v
  FROM cum WHERE N0 > 0 AND N1 > 0
), ll AS (
  SELECT day, n_users, theta, v,
         0.5 * ln(v / (v + {_SPRT_TAU2}))
           + theta * theta * {_SPRT_TAU2}
             / (2.0 * v * (v + {_SPRT_TAU2})) AS log_lambda
  FROM sc
), fr AS (
  SELECT min(CASE WHEN v <> 0
                   AND log_lambda > {math.log(_SPRT_ALPHA_INV)}
                  THEN day END) AS first_rejection
  FROM ll
)
SELECT day, CAST(n_users AS BIGINT) AS n_users,
       CASE WHEN v = 0 THEN NULL ELSE
       {sql_stable_round("theta", 6)} END AS lift,
       CASE WHEN v = 0 THEN NULL ELSE
       {sql_stable_round("log_lambda", 4)} END AS log_lambda,
       CASE WHEN v = 0 THEN NULL ELSE
       {sql_stable_round(
           "least(1.0, exp(-log_lambda))", 6)} END AS always_valid_p,
       first_rejection
FROM ll, fr ORDER BY day
""".strip()


# ------------------------------------------- AMOC changepoint (Hinkley)


_AMOC_MIN_SEG = 12  # hours per side — no 3-hour "regimes"


def q_metric_amoc_changepoint(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """AT-MOST-ONE-CHANGE mean changepoint per metric (Hinkley 1970;
    the binary-segmentation step of Scott & Knott 1974): the split
    hour maximizing the between-segment sum of squares BSS(t) =
    (S₁n₂ − S₂n₁)²/(n·n₁·n₂) — equivalently minimizing the two-segment
    SSE — with ≥ {_AMOC_MIN_SEG} hours per side. Where the family's
    CUSUM/Page-Hinkley rows DETECT drift sequentially, this row
    LOCATES the single most likely level shift and sizes it
    (mean_before/after, variance_reduction = BSS/TSS) — the
    retrospective complement.

    Exactness: prefix sums S₁, Q₁ are exact DEC38 windows; BSS
    PRE-ROUNDS to an e6 integer and candidates rank on
    (bss_e6 DESC, hour ASC) — a deterministic argmax with no float
    comparison ambiguity; reported means/fractions are ONE division
    each. stable_round(4)/(6).

    Scale: ONE corpus shuffle to |metrics|×|hours|; the candidate
    sweep is a metric-partitioned window over that bounded series;
    WindowGroupLimit keeps the rank-1 filter streaming."""
    hourly = _hourly_e2(spark, sf_dir)
    wcum = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wall = Window.partitionBy("event_type")
    c = hourly.select(
        "event_type",
        "h",
        F.sum("v").over(wcum).alias("s1"),
        F.row_number()
        .over(Window.partitionBy("event_type").orderBy("h"))
        .alias("i"),
        F.sum("v").over(wall).alias("s"),
        F.count(F.lit(1)).over(wall).alias("n"),
        F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC))
        .over(wall)
        .alias("q"),
        F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC))
        .over(wcum)
        .alias("q1"),
    ).filter(
        (F.col("i") >= _AMOC_MIN_SEG)
        & (F.col("i") <= F.col("n") - _AMOC_MIN_SEG)
    )
    n1 = F.col("i").cast(_DEC)
    n2 = (F.col("n") - F.col("i")).cast(_DEC)
    s1 = F.col("s1").cast(_DEC)
    s2 = (F.col("s") - F.col("s1")).cast(_DEC)
    num = (s1 * n2 - s2 * n1).cast("double")
    den = (
        F.col("n").cast("double")
        * F.col("i").cast("double")
        * (F.col("n") - F.col("i")).cast("double")
    )
    bss = num * num / den
    cand = c.select(
        "event_type",
        "h",
        "i",
        "n",
        "s1",
        "s",
        "q",
        F.floor(bss / F.lit(1e4) + F.lit(0.5)).cast("long").alias(
            "bss_e"
        ),
        bss.alias("bss"),
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("bss_e").desc(), F.col("h").asc()
    )
    best = cand.withColumn("rk", F.row_number().over(wr)).filter(
        F.col("rk") == 1
    )
    tss = (
        F.col("n").cast(_DEC) * F.col("q")
        - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
    ).cast("double") / F.col("n").cast("double")
    m1 = F.col("s1").cast("double") / F.col("i").cast("double") / 100.0
    m2 = (
        (F.col("s") - F.col("s1")).cast("double")
        / (F.col("n") - F.col("i")).cast("double")
        / 100.0
    )
    degenerate = tss == 0
    return best.select(
        "event_type",
        F.col("h").cast("long").alias("change_hour"),
        F.col("i").cast("long").alias("n_before"),
        (F.col("n") - F.col("i")).cast("long").alias("n_after"),
        stable_round(m1, 4).alias("mean_before"),
        stable_round(m2, 4).alias("mean_after"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(F.col("bss") / tss, 6))
        .alias("variance_reduction"),
    ).orderBy("event_type")


ORACLE_AMOC = f"""
WITH hourly AS (
{_HOURLY_SQL}
), c AS (
  SELECT event_type, h,
         sum(v) OVER wc AS s1,
         row_number() OVER (PARTITION BY event_type ORDER BY h) AS i,
         sum(v) OVER wa AS s,
         count(*) OVER wa AS n,
         sum(CAST(v AS HUGEINT) * v) OVER wa AS q
  FROM hourly
  WINDOW wc AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         wa AS (PARTITION BY event_type)
), cand AS (
  SELECT event_type, h, i, n, s1, s, q,
         CAST(floor(
           CAST(CAST(s1 AS HUGEINT) * (n - i)
                - CAST(s - s1 AS HUGEINT) * i AS DOUBLE)
           * CAST(CAST(s1 AS HUGEINT) * (n - i)
                  - CAST(s - s1 AS HUGEINT) * i AS DOUBLE)
           / (CAST(n AS DOUBLE) * i * (n - i)) / 1e4 + 0.5)
           AS BIGINT) AS bss_e,
         CAST(CAST(s1 AS HUGEINT) * (n - i)
              - CAST(s - s1 AS HUGEINT) * i AS DOUBLE)
         * CAST(CAST(s1 AS HUGEINT) * (n - i)
                - CAST(s - s1 AS HUGEINT) * i AS DOUBLE)
         / (CAST(n AS DOUBLE) * i * (n - i)) AS bss
  FROM c
  WHERE i >= {_AMOC_MIN_SEG} AND i <= n - {_AMOC_MIN_SEG}
), best AS (
  SELECT *, row_number() OVER (PARTITION BY event_type
                               ORDER BY bss_e DESC, h ASC) AS rk
  FROM cand
)
SELECT event_type, CAST(h AS BIGINT) AS change_hour,
       CAST(i AS BIGINT) AS n_before,
       CAST(n - i AS BIGINT) AS n_after,
       {sql_stable_round(
           "CAST(s1 AS DOUBLE) / i / 100.0", 4)} AS mean_before,
       {sql_stable_round(
           "CAST(s - s1 AS DOUBLE) / (n - i) / 100.0",
           4)} AS mean_after,
       CASE WHEN CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE) / n
                 = 0 THEN NULL ELSE
       {sql_stable_round(
           "bss / (CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE)"
           " / n)", 6)} END AS variance_reduction
FROM best WHERE rk = 1 ORDER BY event_type
""".strip()


# ------------------------------------------ Juilland dispersion


_JD_TOP_WORDS = 20


def q_text_dispersion_juilland(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JUILLAND'S D DISPERSION for the top corpus words (Juilland &
    Chang-Rodríguez 1964): D = 1 − CV/√(m−1) over each word's
    RELATIVE frequencies across the m sources (absent sources count
    as 0 — the grid completes by a broadcast cross join) — frequency
    says a word is common, dispersion says it is common EVERYWHERE;
    a high-frequency low-D word is one source's tic, not corpus
    vocabulary. The lexical-statistics companion to the family's
    odds-ratio keywords (which find the tics) from the opposite
    direction.

    Exactness: counts and per-source token totals are exact; each
    relative frequency PRE-ROUNDS to an e9 integer so the CV moments
    are exact and order-free; D is ONE fixed-shape expression.
    stable_round(6).

    Scale: the corpus explode collapses to (source, word) counts
    (map-side partials); per-source totals attach as a sum window
    over the source partition of the same relation; the
    top-{_JD_TOP_WORDS} cut is a TakeOrdered over the word
    aggregate."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    # r12 (VERDICT r11 #3, guide §2.4): the r11 shape cached the
    # (source, word) count table for three consumers and still paid a
    # grid cross-join + left join back. The grid's zero-filled rows
    # contribute NOTHING to the moments (rf9 = 0 adds 0 to sf/qf and
    # fails rf9 > 0), and every word shares the same m = |sources| —
    # so the whole grid is redundant: attach the per-source total as
    # a sum window over the source partition of the SAME counts
    # relation, aggregate the present rows per word, and cross-join
    # the scalar source count (a column-pruned one-column scan of
    # documents — every doc emits ≥1 split token, so the sources in
    # counts are exactly the sources in documents). One corpus
    # explode, no cache, no grid, no join-back; the top-word cut
    # becomes a TakeOrdered over the word aggregate.
    counts = (
        docs.select(
            "source",
            F.explode(F.split(F.col("text"), " ")).alias("w"),
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wsrc = Window.partitionBy("source")
    present = counts.select(
        "w",
        "n",
        # e9 relative frequency — exact moments downstream
        F.floor(
            F.col("n").cast("double")
            / F.sum("n").over(wsrc).cast("double")
            * F.lit(1e9)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("rf9"),
    )
    m_sources = docs.agg(
        F.countDistinct("source").alias("m")
    )
    agg = (
        present.groupBy("w")
        .agg(
            F.sum("n").alias("cf"),
            F.sum("rf9").alias("sf"),
            F.sum(
                F.col("rf9").cast(_DEC) * F.col("rf9").cast(_DEC)
            ).alias("qf"),
            F.sum((F.col("rf9") > 0).cast("long")).alias("n_sources"),
        )
        .orderBy(F.col("cf").desc(), F.col("w"))
        .limit(_JD_TOP_WORDS)
        .join(F.broadcast(m_sources))
    )
    mm = F.col("m").cast("double")
    mean = F.col("sf").cast("double") / mm
    # population CV over the m sources
    var = (
        F.col("m").cast(_DEC) * F.col("qf")
        - F.col("sf").cast(_DEC) * F.col("sf").cast(_DEC)
    ).cast("double") / (mm * mm)
    cv = F.sqrt(var) / mean
    d = 1.0 - cv / F.sqrt(mm - 1.0)
    degenerate = F.col("sf") == 0
    return agg.select(
        F.col("w").alias("word"),
        F.col("cf").cast("long").alias("corpus_freq"),
        F.col("n_sources").cast("long").alias("n_sources"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(d, 6))
        .alias("juilland_d"),
    ).orderBy(F.col("corpus_freq").desc(), "word")


ORACLE_JUILLAND = f"""
WITH counts AS (
  SELECT source, w, count(*) AS n
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents)
  GROUP BY 1, 2
), totals AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS t FROM counts GROUP BY 1
), top AS (
  SELECT w, CAST(sum(n) AS BIGINT) AS cf
  FROM counts GROUP BY 1
  ORDER BY cf DESC, w LIMIT {_JD_TOP_WORDS}
), filled AS (
  SELECT top.w, top.cf, totals.source,
         CAST(floor(CAST(coalesce(c.n, 0) AS DOUBLE) / totals.t * 1e9
                    + 0.5) AS BIGINT) AS rf9
  FROM top CROSS JOIN totals
  LEFT JOIN counts c ON c.source = totals.source AND c.w = top.w
), agg AS (
  SELECT w, cf, count(*) AS m,
         CAST(sum(rf9) AS HUGEINT) AS sf,
         sum(CAST(rf9 AS HUGEINT) * rf9) AS qf,
         sum(CASE WHEN rf9 > 0 THEN 1 ELSE 0 END) AS n_sources
  FROM filled GROUP BY 1, 2
)
SELECT w AS word, CAST(cf AS BIGINT) AS corpus_freq,
       CAST(n_sources AS BIGINT) AS n_sources,
       CASE WHEN sf = 0 THEN NULL ELSE
       {sql_stable_round(
           "1.0 - (sqrt(CAST(m * qf - sf * sf AS DOUBLE)"
           "            / (CAST(m AS DOUBLE) * m))"
           "       / (CAST(sf AS DOUBLE) / m))"
           " / sqrt(CAST(m AS DOUBLE) - 1.0)", 6)} END AS juilland_d
FROM agg ORDER BY corpus_freq DESC, word
""".strip()


QUERIES.update(
    {
        "events_ab_sprt": q_events_ab_sprt,
        "metric_amoc_changepoint": q_metric_amoc_changepoint,
        "text_dispersion_juilland": q_text_dispersion_juilland,
    }
)

ORACLES.update(
    {
        "events_ab_sprt": ORACLE_AB_SPRT,
        "metric_amoc_changepoint": ORACLE_AMOC,
        "text_dispersion_juilland": ORACLE_JUILLAND,
    }
)


# --------------------------------------- temporal split leakage audit


_TSPLIT_FRAC = 80  # train fraction in percent (exact integer math)


def q_split_temporal_leakage(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TEMPORAL TRAIN/TEST SPLIT + LEAKAGE SURFACE audit over the
    event stream: the boundary day is the exact 80th-percentile
    event day (first day whose cumulative event count reaches
    ⌈0.8·N⌉ — an order statistic, not a calendar guess), and the
    report counts the users ACTIVE ON BOTH SIDES — exactly the rows
    where user-level features fitted on train leak future behavior
    into test. The time-ordered counterpart of `split_train_val`
    (hash split: no temporal hygiene) and the audit
    `split_group_aware` solves by construction (group-exclusive
    splits sacrifice the time ordering this one keeps).

    Exactness: every number is an exact count; the boundary is an
    integer cross-multiplication (cum·100 ≥ N·{_TSPLIT_FRAC}), never
    a float percentile. leakage_frac is ONE division.

    Scale: events collapse to |days| counts and |users| min/max-day
    rows in ONE shuffle each (map-side partials); the boundary
    cumsum runs on the ≤|days| table (bounded window — audit
    allowlisted); output is one row."""
    ev = load_table(spark, sf_dir, "events")
    day = F.floor(
        F.unix_millis(F.col("ts")) / F.lit(_DAY_MS_AB)
    ).cast("long")
    # r11 (guide §2.4): cached ≤|days|-row count table — the boundary
    # cumsum, the total and the train/test event counts all derive
    # from it (each previously re-scanned the event stream; the
    # per-user pass below is the only other corpus scan left).
    daily = ev.groupBy(day.alias("d")).agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    wcum = Window.orderBy("d").rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = daily.agg(F.sum("c").alias("n"))
    boundary = (
        daily.select("d", F.sum("c").over(wcum).alias("cum"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("cum") * 100 >= F.col("n") * _TSPLIT_FRAC)
        .agg(F.min("d").alias("b"))
    )
    users = ev.groupBy("user_id").agg(
        F.min(day).alias("d0"), F.max(day).alias("d1"),
        F.count(F.lit(1)).alias("ne"),
    )
    j = users.crossJoin(F.broadcast(boundary))
    agg = j.agg(
        F.max("b").alias("boundary_day"),
        F.sum((F.col("d0") <= F.col("b")).cast("long")).alias(
            "n_train_users"
        ),
        F.sum((F.col("d1") > F.col("b")).cast("long")).alias(
            "n_test_users"
        ),
        F.sum(
            (
                (F.col("d0") <= F.col("b")) & (F.col("d1") > F.col("b"))
            ).cast("long")
        ).alias("n_spanning_users"),
    )
    # exact rollup of the daily counts (every event lands in exactly
    # one day cell) — no third scan of the event stream
    ev_counts = daily.crossJoin(F.broadcast(boundary)).agg(
        F.sum(
            F.when(F.col("d") <= F.col("b"), F.col("c")).otherwise(0)
        ).alias("n_train_events"),
        F.sum(
            F.when(F.col("d") > F.col("b"), F.col("c")).otherwise(0)
        ).alias("n_test_events"),
    )
    leak = (
        F.col("n_spanning_users").cast("double")
        / F.col("n_test_users").cast("double")
    )
    return (
        agg.select(
            "boundary_day",
            "n_train_users",
            "n_test_users",
            "n_spanning_users",
            F.when(F.col("n_test_users") == 0, F.lit(None).cast("double"))
            .otherwise(stable_round(leak, 6))
            .alias("leakage_frac"),
        )
        .crossJoin(F.broadcast(ev_counts))
        .select(
            "boundary_day",
            "n_train_events",
            "n_test_events",
            "n_train_users",
            "n_test_users",
            "n_spanning_users",
            "leakage_frac",
        )
    )


ORACLE_TSPLIT = f"""
WITH daily AS (
  SELECT epoch_ms(ts) // {_DAY_MS_AB} AS d, count(*) AS c
  FROM events GROUP BY 1
), tot AS (
  SELECT CAST(sum(c) AS BIGINT) AS n FROM daily
), b AS (
  SELECT min(d) AS b FROM (
    SELECT d, sum(c) OVER (ORDER BY d ROWS BETWEEN UNBOUNDED
                           PRECEDING AND CURRENT ROW) AS cum
    FROM daily
  ), tot WHERE cum * 100 >= n * {_TSPLIT_FRAC}
), users AS (
  SELECT user_id, min(epoch_ms(ts) // {_DAY_MS_AB}) AS d0,
         max(epoch_ms(ts) // {_DAY_MS_AB}) AS d1
  FROM events GROUP BY 1
), ua AS (
  SELECT max(b.b) AS boundary_day,
         sum(CASE WHEN d0 <= b.b THEN 1 ELSE 0 END) AS n_train_users,
         sum(CASE WHEN d1 > b.b THEN 1 ELSE 0 END) AS n_test_users,
         sum(CASE WHEN d0 <= b.b AND d1 > b.b THEN 1 ELSE 0 END)
           AS n_spanning_users
  FROM users, b
), ec AS (
  SELECT sum(CASE WHEN epoch_ms(ts) // {_DAY_MS_AB} <= b.b
                  THEN 1 ELSE 0 END) AS n_train_events,
         sum(CASE WHEN epoch_ms(ts) // {_DAY_MS_AB} > b.b
                  THEN 1 ELSE 0 END) AS n_test_events
  FROM events, b
)
SELECT CAST(boundary_day AS BIGINT) AS boundary_day,
       CAST(n_train_events AS BIGINT) AS n_train_events,
       CAST(n_test_events AS BIGINT) AS n_test_events,
       CAST(n_train_users AS BIGINT) AS n_train_users,
       CAST(n_test_users AS BIGINT) AS n_test_users,
       CAST(n_spanning_users AS BIGINT) AS n_spanning_users,
       CASE WHEN n_test_users = 0 THEN NULL ELSE
       {sql_stable_round(
           "CAST(n_spanning_users AS DOUBLE) / n_test_users",
           6)} END AS leakage_frac
FROM ua, ec
""".strip()


# --------------------------------------------- gate agreement (kappa)


_KAPPA_MIN_CHARS = 200  # length gate
_KAPPA_MIN_QUALITY = 0.5  # quality gate (quality_scores scale)


def q_quality_gate_kappa(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COHEN'S KAPPA between the length gate (n_chars ≥
    {_KAPPA_MIN_CHARS}) and the quality gate (quality ≥
    {_KAPPA_MIN_QUALITY}) (Cohen 1960): chance-corrected agreement
    of the two binary KEEP decisions — the DECISION-level companion
    to `quality_signal_correlation` (which correlates the scores): a
    κ near 1 means the quality filter is a length filter in
    disguise and one of the two stages is redundant; κ near 0 means
    they prune different documents and the stage order matters.

    Exactness: the 2×2 confusion counts are exact; p_o, p_e, κ are
    ONE fixed-shape expression over them. stable_round(6).

    Scale: one corpus pass computes both gates row-local (the
    quality expression is the shared quality_scores form), then ONE
    4-cell aggregate."""
    from monasca_aggregator_spark.operators.textops import (
        quality_scores,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    scored = quality_scores(docs).join(
        docs.select("doc_id", "n_chars"), "doc_id"
    )
    gates = scored.select(
        (F.col("n_chars") >= _KAPPA_MIN_CHARS).cast("int").alias("g1"),
        (F.col("quality") >= _KAPPA_MIN_QUALITY).cast("int").alias("g2"),
    )
    cm = gates.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(((F.col("g1") == 1) & (F.col("g2") == 1)).cast("long")).alias("a"),
        F.sum(((F.col("g1") == 1) & (F.col("g2") == 0)).cast("long")).alias("b"),
        F.sum(((F.col("g1") == 0) & (F.col("g2") == 1)).cast("long")).alias("c"),
        F.sum(((F.col("g1") == 0) & (F.col("g2") == 0)).cast("long")).alias("d"),
    )
    nn = F.col("n").cast("double")
    po = (F.col("a") + F.col("d")).cast("double") / nn
    pe = (
        (F.col("a") + F.col("b")).cast("double")
        * (F.col("a") + F.col("c")).cast("double")
        + (F.col("c") + F.col("d")).cast("double")
        * (F.col("b") + F.col("d")).cast("double")
    ) / (nn * nn)
    kappa = (po - pe) / (1.0 - pe)
    degenerate = pe == 1.0
    return cm.select(
        F.col("n").cast("long").alias("n_docs"),
        F.col("a").cast("long").alias("both_keep"),
        F.col("b").cast("long").alias("len_only"),
        F.col("c").cast("long").alias("quality_only"),
        F.col("d").cast("long").alias("both_drop"),
        stable_round(po, 6).alias("observed_agreement"),
        F.when(degenerate, F.lit(None).cast("double"))
        .otherwise(stable_round(kappa, 6))
        .alias("kappa"),
    )


ORACLE_GATE_KAPPA = f"""
WITH q AS ({{oracle_quality}}),
g AS (
  SELECT CASE WHEN d.n_chars >= {_KAPPA_MIN_CHARS} THEN 1 ELSE 0 END
           AS g1,
         CASE WHEN q.quality >= {_KAPPA_MIN_QUALITY} THEN 1 ELSE 0 END
           AS g2
  FROM q JOIN documents d USING (doc_id)
), cm AS (
  SELECT count(*) AS n,
         sum(CASE WHEN g1 = 1 AND g2 = 1 THEN 1 ELSE 0 END) AS a,
         sum(CASE WHEN g1 = 1 AND g2 = 0 THEN 1 ELSE 0 END) AS b,
         sum(CASE WHEN g1 = 0 AND g2 = 1 THEN 1 ELSE 0 END) AS c,
         sum(CASE WHEN g1 = 0 AND g2 = 0 THEN 1 ELSE 0 END) AS d
  FROM g
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(a AS BIGINT) AS both_keep, CAST(b AS BIGINT) AS len_only,
       CAST(c AS BIGINT) AS quality_only,
       CAST(d AS BIGINT) AS both_drop,
       {sql_stable_round(
           "CAST(a + d AS DOUBLE) / n", 6)} AS observed_agreement,
       CASE WHEN (CAST(a + b AS DOUBLE) * (a + c)
                  + CAST(c + d AS DOUBLE) * (b + d))
                 / (CAST(n AS DOUBLE) * n) = 1.0 THEN NULL ELSE
       {sql_stable_round(
           "(CAST(a + d AS DOUBLE) / n"
           " - (CAST(a + b AS DOUBLE) * (a + c)"
           "    + CAST(c + d AS DOUBLE) * (b + d))"
           "   / (CAST(n AS DOUBLE) * n))"
           " / (1.0 - (CAST(a + b AS DOUBLE) * (a + c)"
           "           + CAST(c + d AS DOUBLE) * (b + d))"
           "          / (CAST(n AS DOUBLE) * n))", 6)} END AS kappa
FROM cm
""".strip()


def _oracle_gate_kappa() -> str:
    from monasca_aggregator_spark.plans.textops import ORACLE_QUALITY

    return ORACLE_GATE_KAPPA.format(oracle_quality=ORACLE_QUALITY)


QUERIES.update(
    {
        "split_temporal_leakage": q_split_temporal_leakage,
        "quality_gate_kappa": q_quality_gate_kappa,
    }
)

ORACLES.update(
    {
        "split_temporal_leakage": ORACLE_TSPLIT,
        "quality_gate_kappa": _oracle_gate_kappa(),
    }
)


# ------------------------------------------- Haar wavelet top-k


_HAAR_J = 8  # coarsest level: 2^8 = 256-hour blocks
_HAAR_K = 10  # reported coefficients per metric


def q_metric_haar_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-K HAAR WAVELET COEFFICIENTS per metric (Haar 1910; the
    wavelet synopsis of Matias, Vitter & Wang 1998): the hourly
    series (absent hours read as exact 0 — it is a sum measure)
    decomposes over dyadic blocks at levels 1..{_HAAR_J}; the K
    largest-energy detail coefficients name WHERE and AT WHAT SCALE
    the series moves (a level-7 coefficient is a multi-day regime
    edge, a level-1 coefficient a single-hour spike) — the
    scale-localized complement to the family's global downsamplers
    (M4, LTTB) and the Walsh periodogram's global frequencies.

    Exactness: a level-j detail is d = L−R over exact e2 block sums;
    its ENERGY is d²/2^j, ranked as the exact integer d²·2^(J−j) —
    the ordering never touches a float; energy_share is ONE division
    of DEC38 integers. stable_round(4)/(6).

    Scale: the |metrics|×|hours| collapse explodes ×{_HAAR_J} level
    rows (a literal, not data) and re-aggregates per (metric, level,
    block) with map-side partials; ranking is a metric-partitioned
    top-K window (WindowGroupLimit)."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    base = hourly.groupBy("event_type").agg(
        F.min("h").alias("h0"),
        # levels cap at 2^j ≤ span: a supra-span level would measure
        # only the data/zero-padding boundary, not the series
        F.floor(
            F.log2((F.max("h") - F.min("h") + 1).cast("double"))
        ).cast("int").alias("jmax"),
    )
    idx = hourly.join(F.broadcast(base), "event_type").select(
        "event_type", (F.col("h") - F.col("h0")).alias("i"), "v",
        "h0", "jmax",
    )
    lv = idx.select(
        "event_type",
        "i",
        "v",
        "h0",
        F.explode(
            F.sequence(
                F.lit(1), F.least(F.lit(_HAAR_J), F.col("jmax"))
            )
        ).alias("j"),
    )
    blocks = lv.groupBy(
        "event_type",
        "h0",
        "j",
        F.expr("shiftright(i, j)").alias("b"),
    ).agg(
        F.sum(
            F.when(
                F.expr("(shiftright(i, j - 1) & 1) = 0"), F.col("v")
            ).otherwise(-F.col("v"))
        ).alias("d")
    )
    # exact integer energy rank: d² · 2^(J−j)  (∝ d²/2^j)
    scaled = blocks.select(
        "event_type",
        "h0",
        "j",
        "b",
        "d",
        (
            F.col("d").cast(_DEC)
            * F.col("d").cast(_DEC)
            * F.pow(F.lit(2.0), F.lit(_HAAR_J) - F.col("j")).cast(
                "long"
            ).cast(_DEC)
        ).alias("e_int"),
    )
    tot = scaled.groupBy("event_type").agg(
        F.sum("e_int").alias("te")
    )
    wr = Window.partitionBy("event_type").orderBy(
        F.col("e_int").desc(), F.col("j").asc(), F.col("b").asc()
    )
    top = (
        scaled.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _HAAR_K)
        .join(F.broadcast(tot), "event_type")
    )
    coef = (
        F.col("d").cast("double")
        / F.sqrt(F.pow(F.lit(2.0), F.col("j").cast("double")))
        / F.lit(100.0)
    )
    share = F.col("e_int").cast("double") / F.col("te").cast("double")
    return top.select(
        "event_type",
        F.col("rk").cast("long").alias("rk"),
        F.expr("cast(shiftleft(1, j) as bigint)").alias(
            "scale_hours"
        ),
        F.expr("cast(h0 + b * shiftleft(1, j) as bigint)").alias(
            "block_start_hour"
        ),
        stable_round(coef, 4).alias("coef_norm"),
        F.when(F.col("te") == 0, F.lit(None).cast("double"))
        .otherwise(stable_round(share, 6))
        .alias("energy_share"),
    ).orderBy("event_type", "rk")


ORACLE_HAAR = f"""
WITH hourly AS (
{_HOURLY_SQL}
), base AS (
  SELECT event_type, min(h) AS h0,
         CAST(floor(log2(max(h) - min(h) + 1)) AS INT) AS jmax
  FROM hourly GROUP BY 1
), lv AS (
  SELECT h.event_type, b.h0, h.h - b.h0 AS i, h.v, j
  FROM hourly h JOIN base b USING (event_type),
       unnest(range(1, {_HAAR_J} + 1)) AS t(j)
  WHERE j <= b.jmax
), blocks AS (
  SELECT event_type, h0, j, i >> j AS b,
         CAST(sum(CASE WHEN ((i >> (j - 1)) & 1) = 0 THEN v
                       ELSE -v END) AS HUGEINT) AS d
  FROM lv GROUP BY 1, 2, 3, 4
), scaled AS (
  SELECT event_type, h0, j, b, d,
         d * d * CAST(1 << ({_HAAR_J} - j) AS HUGEINT) AS e_int
  FROM blocks
), tot AS (
  SELECT event_type, sum(e_int) AS te FROM scaled GROUP BY 1
), top AS (
  SELECT s.*, t.te,
         row_number() OVER (PARTITION BY s.event_type
                            ORDER BY s.e_int DESC, s.j, s.b) AS rk
  FROM scaled s JOIN tot t USING (event_type)
)
SELECT event_type, CAST(rk AS BIGINT) AS rk,
       CAST(1 << j AS BIGINT) AS scale_hours,
       CAST(h0 + b * (1 << j) AS BIGINT) AS block_start_hour,
       {sql_stable_round(
           "CAST(d AS DOUBLE) / sqrt(power(2.0, j)) / 100.0",
           4)} AS coef_norm,
       CASE WHEN te = 0 THEN NULL ELSE
       {sql_stable_round(
           "CAST(e_int AS DOUBLE) / CAST(te AS DOUBLE)",
           6)} END AS energy_share
FROM top WHERE rk <= {_HAAR_K}
ORDER BY event_type, rk
""".strip()


# ------------------------------------- Western Electric run rules


def q_metric_western_electric(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WESTERN ELECTRIC CONTROL-CHART RULES per metric (Western
    Electric Company 1956; the Shewhart-chart run rules): against
    the series' own μ/σ baseline, count the hours firing each
    classical rule — R1: one point beyond 3σ; R2: 2 of 3 successive
    beyond 2σ, same side; R3: 4 of 5 successive beyond 1σ, same
    side; R4: 8 successive on one side of μ. The operator's-eye
    complement to the family's z-score/CUSUM rows: R4 pages on a
    sustained small shift no single-point test sees, R1 on the
    spike no run test sees.

    Exactness: μ, σ come from exact DEC38 moments; every zone test
    compares the INTEGER 10⁴·(v_e2·n − S·100)² against zone
    constants times the exact variance numerator (cross-multiplied —
    no float enters any rule decision); rule counts are exact.

    Scale: ONE corpus shuffle to |metrics|×|hours|; the run rules
    are metric-partitioned lag windows over that bounded series."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    mom = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC)).alias("q"),
    ).filter(F.col("n") >= 24)
    j = hourly.join(F.broadcast(mom), "event_type")
    # dev² vs k²σ², cross-multiplied exactly:
    # (v·n − S)² · (n−1)  vs  k² · n · (nQ − S²)
    dev = (
        F.col("v").cast(_DEC) * F.col("n").cast(_DEC)
        - F.col("s").cast(_DEC)
    )
    dev2 = dev * dev * (F.col("n").cast(_DEC) - 1)
    varnum = F.col("n").cast(_DEC) * (
        F.col("n").cast(_DEC) * F.col("q")
        - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
    )
    side = F.when(dev > 0, F.lit(1)).when(dev < 0, F.lit(-1)).otherwise(
        F.lit(0)
    )
    z = j.select(
        "event_type",
        "h",
        side.alias("sd"),
        (dev2 > 9 * varnum).cast("int").alias("z3"),
        (dev2 > 4 * varnum).cast("int").alias("z2"),
        (dev2 > 1 * varnum).cast("int").alias("z1"),
    )
    wh = Window.partitionBy("event_type").orderBy("h")
    w3 = wh.rowsBetween(-2, 0)
    w5 = wh.rowsBetween(-4, 0)
    w8 = wh.rowsBetween(-7, 0)
    flags = z.select(
        "event_type",
        "h",
        F.col("z3").alias("r1"),
        # 2-of-3 beyond 2σ same side: count signed 2σ exceedances
        (
            (F.sum(F.col("z2") * F.col("sd")).over(w3) >= 2)
            | (F.sum(F.col("z2") * F.col("sd")).over(w3) <= -2)
        ).cast("int").alias("r2"),
        (
            (F.sum(F.col("z1") * F.col("sd")).over(w5) >= 4)
            | (F.sum(F.col("z1") * F.col("sd")).over(w5) <= -4)
        ).cast("int").alias("r3"),
        (
            (F.sum("sd").over(w8) == 8) | (F.sum("sd").over(w8) == -8)
        ).cast("int").alias("r4"),
        F.row_number().over(wh).alias("i"),
    )
    # windows shorter than the rule length can't fire the rule
    counted = flags.select(
        "event_type",
        "r1",
        F.when(F.col("i") >= 3, F.col("r2")).otherwise(0).alias("r2"),
        F.when(F.col("i") >= 5, F.col("r3")).otherwise(0).alias("r3"),
        F.when(F.col("i") >= 8, F.col("r4")).otherwise(0).alias("r4"),
    )
    agg = counted.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_hours"),
        F.sum("r1").alias("n_beyond_3s"),
        F.sum("r2").alias("n_two_of_three_2s"),
        F.sum("r3").alias("n_four_of_five_1s"),
        F.sum("r4").alias("n_eight_one_side"),
    )
    return agg.select(
        "event_type",
        F.col("n_hours").cast("long").alias("n_hours"),
        F.col("n_beyond_3s").cast("long").alias("n_beyond_3s"),
        F.col("n_two_of_three_2s").cast("long").alias(
            "n_two_of_three_2s"
        ),
        F.col("n_four_of_five_1s").cast("long").alias(
            "n_four_of_five_1s"
        ),
        F.col("n_eight_one_side").cast("long").alias(
            "n_eight_one_side"
        ),
    ).orderBy("event_type")


ORACLE_WESTERN_ELECTRIC = f"""
WITH hourly AS (
{_HOURLY_SQL}
), mom AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS HUGEINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS q
  FROM hourly GROUP BY 1 HAVING count(*) >= 24
), z AS (
  SELECT h.event_type, h.h,
         CASE WHEN CAST(h.v AS HUGEINT) * m.n - m.s > 0 THEN 1
              WHEN CAST(h.v AS HUGEINT) * m.n - m.s < 0 THEN -1
              ELSE 0 END AS sd,
         CASE WHEN (CAST(h.v AS HUGEINT) * m.n - m.s)
                   * (CAST(h.v AS HUGEINT) * m.n - m.s) * (m.n - 1)
                   > 9 * m.n * (m.n * m.q - m.s * m.s)
              THEN 1 ELSE 0 END AS z3,
         CASE WHEN (CAST(h.v AS HUGEINT) * m.n - m.s)
                   * (CAST(h.v AS HUGEINT) * m.n - m.s) * (m.n - 1)
                   > 4 * m.n * (m.n * m.q - m.s * m.s)
              THEN 1 ELSE 0 END AS z2,
         CASE WHEN (CAST(h.v AS HUGEINT) * m.n - m.s)
                   * (CAST(h.v AS HUGEINT) * m.n - m.s) * (m.n - 1)
                   > 1 * m.n * (m.n * m.q - m.s * m.s)
              THEN 1 ELSE 0 END AS z1
  FROM hourly h JOIN mom m USING (event_type)
), flags AS (
  SELECT event_type, z3 AS r1,
         CASE WHEN row_number() OVER wh >= 3
               AND abs(sum(z2 * sd) OVER w3) >= 2
              THEN 1 ELSE 0 END AS r2,
         CASE WHEN row_number() OVER wh >= 5
               AND abs(sum(z1 * sd) OVER w5) >= 4
              THEN 1 ELSE 0 END AS r3,
         CASE WHEN row_number() OVER wh >= 8
               AND abs(sum(sd) OVER w8) = 8
              THEN 1 ELSE 0 END AS r4
  FROM z
  WINDOW wh AS (PARTITION BY event_type ORDER BY h),
         w3 AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW),
         w5 AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
         w8 AS (PARTITION BY event_type ORDER BY h
                ROWS BETWEEN 7 PRECEDING AND CURRENT ROW)
)
SELECT event_type, count(*) AS n_hours,
       CAST(sum(r1) AS BIGINT) AS n_beyond_3s,
       CAST(sum(r2) AS BIGINT) AS n_two_of_three_2s,
       CAST(sum(r3) AS BIGINT) AS n_four_of_five_1s,
       CAST(sum(r4) AS BIGINT) AS n_eight_one_side
FROM flags GROUP BY 1 ORDER BY event_type
""".strip()


QUERIES.update(
    {
        "metric_haar_topk": q_metric_haar_topk,
        "metric_western_electric": q_metric_western_electric,
    }
)

ORACLES.update(
    {
        "metric_haar_topk": ORACLE_HAAR,
        "metric_western_electric": ORACLE_WESTERN_ELECTRIC,
    }
)


# ------------------------------------- pinball quantile backtest


_PB_WIN = 28  # trailing window (hours) feeding the quantile forecast
_PB_Q_NUM = 9  # q = 0.9
_PB_Q_DEN = 10


def q_metric_pinball_backtest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PINBALL-LOSS BACKTEST of a trailing p90 forecast per metric
    (the quantile-scoring rule of Koenker & Bassett 1978; the
    forecast-evaluation layer the family's point backtests
    (`metric_backtest_hw_vs_snaive`, MAE/MAPE) cannot provide): the
    forecast for hour t is the EXACT empirical p90 of the previous
    {_PB_WIN} hours (order statistic at ⌈0.9·28⌉ of the sorted
    frame — both engines index the same sorted array, no quantile()
    semantics in play); the score is the pinball loss
    q·(y−ŷ)⁺ + (1−q)·(ŷ−y)⁺, whose expectation is MINIMIZED by the
    true p90 — so a calibrated quantile forecast wins this number
    even when a biased one wins MAE. coverage = the fraction of
    hours with y ≤ ŷ (should sit near 0.9 for a calibrated p90).

    Exactness: forecasts and losses stay exact e2 integers (the
    pinball numerator rides ×{_PB_Q_DEN}); means are ONE division.
    stable_round(4)/(6).

    Scale: ONE corpus shuffle to |metrics|×|hours|; the trailing
    frame is a metric-partitioned window whose collected array is
    {_PB_WIN} elements by construction — a constant, never data."""
    hourly = _hourly_e2(spark, sf_dir)
    wf = (
        Window.partitionBy("event_type")
        .orderBy("h")
        .rowsBetween(-_PB_WIN, -1)
    )
    pos = -(-_PB_WIN * _PB_Q_NUM // _PB_Q_DEN)  # ceil(0.9·28) = 26
    with_f = (
        hourly.withColumn("arr", F.collect_list("v").over(wf))
        .filter(F.size("arr") == _PB_WIN)
        .withColumn(
            "fc", F.element_at(F.sort_array("arr"), pos)
        )
    )
    # pinball ×10 (q = 9/10): 9·(y−ŷ)⁺ + 1·(ŷ−y)⁺ — exact integers
    loss10 = F.when(
        F.col("v") >= F.col("fc"),
        (F.col("v") - F.col("fc")) * _PB_Q_NUM,
    ).otherwise(
        (F.col("fc") - F.col("v")) * (_PB_Q_DEN - _PB_Q_NUM)
    )
    agg = with_f.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_scored"),
        F.sum(loss10.cast(_DEC)).alias("l10"),
        F.sum((F.col("v") <= F.col("fc")).cast("long")).alias("cov"),
    )
    mean_loss = (
        F.col("l10").cast("double")
        / F.col("n_scored").cast("double")
        / F.lit(float(_PB_Q_DEN))
        / F.lit(100.0)
    )
    return agg.select(
        "event_type",
        F.col("n_scored").cast("long").alias("n_scored"),
        stable_round(mean_loss, 4).alias("mean_pinball_loss"),
        stable_round(
            F.col("cov").cast("double") / F.col("n_scored").cast("double"),
            4,
        ).alias("coverage"),
    ).orderBy("event_type")


ORACLE_PINBALL = f"""
WITH hourly AS (
{_HOURLY_SQL}
), framed AS (
  SELECT event_type, h, v,
         list_sort(list(v) OVER (PARTITION BY event_type ORDER BY h
                   ROWS BETWEEN {_PB_WIN} PRECEDING
                   AND 1 PRECEDING)) AS arr
  FROM hourly
), fc AS (
  SELECT event_type, h, v,
         arr[{-(-_PB_WIN * _PB_Q_NUM // _PB_Q_DEN)}] AS fc
  FROM framed WHERE len(arr) = {_PB_WIN}
), agg AS (
  SELECT event_type, count(*) AS n_scored,
         sum(CAST(CASE WHEN v >= fc
                  THEN (v - fc) * {_PB_Q_NUM}
                  ELSE (fc - v) * {_PB_Q_DEN - _PB_Q_NUM} END
             AS HUGEINT)) AS l10,
         sum(CASE WHEN v <= fc THEN 1 ELSE 0 END) AS cov
  FROM fc GROUP BY 1
)
SELECT event_type, CAST(n_scored AS BIGINT) AS n_scored,
       {sql_stable_round(
           f"CAST(l10 AS DOUBLE) / n_scored / {float(_PB_Q_DEN)}"
           " / 100.0", 4)} AS mean_pinball_loss,
       {sql_stable_round(
           "CAST(cov AS DOUBLE) / n_scored", 4)} AS coverage
FROM agg ORDER BY event_type
""".strip()


QUERIES.update({"metric_pinball_backtest": q_metric_pinball_backtest})
ORACLES.update({"metric_pinball_backtest": ORACLE_PINBALL})
