"""Spectral / nonparametric trend statistics (round 10): Walsh
square-wave periodogram, Mann-Kendall trend test, Kruskal-Wallis
hour-of-day effect, Grubbs max deviate, Welch's t per source pair.

Reference parity: the reference engine (Go, ~/reference —
aggregation/aggregation_rule.go's windowed
sum/count/avg/min/max/delta/rate) stops at windowed aggregates; these answer the three
follow-up questions its output feeds into ("does this metric CYCLE,
and at what period?", "is there a monotone trend, without assuming
normal errors?", "does hour-of-day move the distribution, not just
the mean?") — each Spark-first and DuckDB-oracle-backed.

Numerics: hourly values ride as exact scaled integers (e2 = value·100
units, DEC38 sums); the Walsh and Mann-Kendall statistics stay
integer until ONE final division, and Kruskal-Wallis reduces each
metric to its ≤ |groups| exact integer (R2_g, n_g) pairs before a
deterministic sorted-order fold — both engines sum the same ≤ 24
doubles in the same order, so ``stable_round`` hashes match.

Scale posture (per query, also in each docstring):
- `metric_walsh_periodogram`: raw scan collapses to the
  |metrics|×|hours| series (one shuffle with map-side partials);
  the per-period correlations are a 4-way cross of that bounded
  relation — |metrics|×|hours|×4 rows, never corpus-sized.
- `metric_mann_kendall`: pair enumeration is a self-join of the
  collapsed hourly series WITHIN each metric — Σ|hours|²/2 pairs per
  metric, bounded by the observation window (hours grow with TIME,
  not data volume; 100 TB over the same month is the same 720-hour
  join), co-partitioned on the metric key so no broadcast is needed.
- `metric_kruskal_wallis`: ranks come from one window over the
  collapsed series; everything after is a |metrics|×24 aggregate.
- `metric_grubbs`: two aggregates over the collapsed series (moments,
  then argmax join-back); metric-sized output.
- `corpus_welch_ttest`: the corpus scan collapses to |sources| moment
  rows; the pair cross is |sources|².
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

_WALSH_PERIODS = (24, 12, 8, 6)  # hours per square-wave cycle
_MK_MIN_HOURS = 24  # Mann-Kendall needs a non-trivial series
_KW_MIN_HOURS = 48  # ≥ 2 full days before hour-of-day groups mean much


def _hourly_e2(
    spark: SparkSession, sf_dir: str, *, cached: bool = False
) -> DataFrame:
    """|metrics|×|hours| exact-integer series: Σ floor(value·100+½)
    per (event_type, hour) — the shared first shuffle of the family
    (map-side partial agg collapses the corpus-sized scan).

    ``cached=True`` (r11, guide §2.4): callers that consume the
    series from two or more branches (a per-metric moment aggregate
    joined back onto the series is the family's standard shape)
    lazily cache it so the events scan+shuffle runs once per query
    instead of once per branch — the relation is bounded at
    |metrics|×|hours|, the house materialization class.
    Single-consumer callers keep the default lazy form."""
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    out = ev.groupBy(
        "event_type",
        # floor, not truncate-toward-zero: matches the oracle's `//`
        # for pre-epoch (negative) timestamps (ADVICE r10)
        F.floor(F.col("ts_ms") / F.lit(_HOUR_MS)).cast("long").alias("h"),
    ).agg(F.sum("e2").alias("v"))
    return out.cache() if cached else out


_HOURLY_SQL = f"""
  SELECT event_type, epoch_ms(ts) // {_HOUR_MS} AS h,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
""".strip()


# ------------------------------------------ Walsh square-wave periodogram


def q_metric_walsh_periodogram(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WALSH SQUARE-WAVE PERIODOGRAM per metric: the normalized
    correlation of the hourly series with a ±1 square wave at period
    P ∈ {_WALSH_PERIODS} hours — the integer-exact spectral screen
    (Walsh-Fourier analysis; Walsh 1923) that says WHICH period a
    metric cycles at before the heavier seasonal fits (STL, lag-24
    autocorrelation) run. A sine-basis DFT would put cos() INSIDE
    the aggregate (engine-dependent ulps under reordered float
    sums); the square-wave basis s_P(h) = +1 if h mod P < P/2 else
    −1 keeps every sum an exact integer, and |score| ∈ [0, 1] is
    comparable across metrics and periods.

    score(P) = (n·Σv·s − S·Σs) / Σ|n·v_h − S|  — the mean-removed
    correlation with the wave, computed as exact DEC38 integers
    (mean removal multiplies through by n instead of dividing),
    then ONE final division.

    Scale: one corpus-sized shuffle collapses to |metrics|×|hours|;
    the 4 periods come from a literal explode over that bounded
    relation. Hours grow with the observation WINDOW, not data
    volume."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    dec = "decimal(38,0)"
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
    )
    periods = spark.createDataFrame(
        [(p,) for p in _WALSH_PERIODS], "period int"
    )
    per = hourly.join(F.broadcast(periods))
    wave = F.when(
        F.col("h") % F.col("period") < F.col("period") / 2, F.lit(1)
    ).otherwise(F.lit(-1))
    terms = per.select(
        "event_type",
        "period",
        (F.col("v").cast(dec) * wave).alias("vs"),
        wave.alias("sgn"),
        F.col("v").cast(dec).alias("v"),
    )
    agg = terms.groupBy("event_type", "period").agg(
        F.sum("vs").alias("svs"),
        F.sum("sgn").alias("ss"),
    )
    joined = agg.join(F.broadcast(stats), "event_type")
    # Σ|n·v_h − S| needs n and S per metric, so it is a second pass
    # over the (already collapsed) hourly relation
    dev = (
        hourly.join(F.broadcast(stats), "event_type")
        .select(
            "event_type",
            F.abs(
                F.col("v").cast(dec) * F.col("n").cast(dec)
                - F.col("s").cast(dec)
            ).alias("d"),
        )
        .groupBy("event_type")
        .agg(F.sum("d").alias("sad"))
    )
    num = (
        F.col("n").cast(dec) * F.col("svs")
        - F.col("s").cast(dec) * F.col("ss").cast(dec)
    ).cast("double")
    return (
        joined.join(F.broadcast(dev), "event_type")
        .select(
            "event_type",
            "period",
            F.col("n").alias("n_hours"),
            F.when(F.col("sad") == 0, F.lit(None).cast("double"))
            .otherwise(
                stable_round(num / F.col("sad").cast("double"), 6)
            )
            .alias("walsh_score"),
        )
        .orderBy("event_type", "period")
    )


ORACLE_WALSH = f"""
WITH hourly AS (
{_HOURLY_SQL}
), stats AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS HUGEINT) AS s
  FROM hourly GROUP BY 1
), terms AS (
  SELECT h.event_type, p.period,
         CASE WHEN h.h % p.period < p.period / 2.0
              THEN 1 ELSE -1 END AS sgn, h.v
  FROM hourly h, (SELECT unnest([{", ".join(map(str, _WALSH_PERIODS))}])
                  AS period) p
), agg AS (
  SELECT event_type, period,
         sum(CAST(v AS HUGEINT) * sgn) AS svs,
         CAST(sum(sgn) AS HUGEINT) AS ss
  FROM terms GROUP BY 1, 2
), dev AS (
  SELECT h.event_type,
         sum(abs(CAST(h.v AS HUGEINT) * st.n - st.s)) AS sad
  FROM hourly h JOIN stats st USING (event_type) GROUP BY 1
)
SELECT a.event_type, CAST(a.period AS INT) AS period,
       CAST(st.n AS BIGINT) AS n_hours,
       CASE WHEN d.sad = 0 THEN NULL ELSE
       {sql_stable_round(
           "CAST(st.n * a.svs - st.s * a.ss AS DOUBLE)"
           " / CAST(d.sad AS DOUBLE)", 6)} END AS walsh_score
FROM agg a
JOIN stats st USING (event_type)
JOIN dev d ON d.event_type = a.event_type
ORDER BY a.event_type, a.period
""".strip()


# --------------------------------------------------- Mann-Kendall trend


def q_metric_mann_kendall(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MANN-KENDALL trend test per metric (Mann 1945, Kendall 1975):
    S = Σ_(i<j) sign(v_j − v_i) over the hourly series, with
    Kendall's tau-b tie correction and the normal-approximation Z —
    the nonparametric companion to the family's OLS/Theil-Sen slope
    fits: it detects a monotone trend without assuming linearity or
    normal errors, and is the standard test in operational capacity
    review (is this metric drifting at all, before asking how fast).

    Exactness: S, the tie counts, and both variance terms are exact
    integers (DEC38); tau_b = S/√((n0−n1)·n0) and Z use ONE final
    double expression each. Time ties are impossible (hours are
    distinct), so the tau-b denominator's time side is n0 exactly.

    Scale: the self-join runs WITHIN each metric over the collapsed
    |metrics|×|hours| series — pairs grow with the observation
    window squared, not with data volume; both sides repartition on
    the metric key so the join is co-located."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    n_ok = (
        hourly.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _MK_MIN_HOURS)
    )
    h = hourly.join(F.broadcast(n_ok.select("event_type")), "event_type")
    a = h.select(
        "event_type", F.col("h").alias("hi"), F.col("v").alias("vi")
    )
    b = h.select(
        "event_type", F.col("h").alias("hj"), F.col("v").alias("vj")
    )
    pairs = a.join(b, "event_type").filter(F.col("hi") < F.col("hj"))
    s_stat = pairs.groupBy("event_type").agg(
        F.sum(
            F.when(F.col("vj") > F.col("vi"), 1)
            .when(F.col("vj") < F.col("vi"), -1)
            .otherwise(0)
        ).alias("s")
    )
    dec = "decimal(38,0)"
    ties = (
        h.groupBy("event_type", "v")
        .agg(F.count(F.lit(1)).alias("t"))
        .groupBy("event_type")
        .agg(
            F.sum(
                F.col("t").cast(dec) * (F.col("t") - 1) / 2
            ).alias("n1"),
            F.sum(
                F.col("t").cast(dec)
                * (F.col("t") - 1)
                * (2 * F.col("t") + 5)
            ).alias("tv"),
        )
    )
    j = (
        s_stat.join(ties, "event_type")
        .join(F.broadcast(n_ok), "event_type")
    )
    n0 = F.col("n").cast(dec) * (F.col("n") - 1) / 2
    # exact-integer numerator, ONE division in double — mirrors the
    # oracle's evaluation shape (DuckDB `/` is float division), so the
    # 6th rounded decimal can't flip on a decimal-scale boundary
    # (ADVICE r10)
    var_s = (
        F.col("n").cast(dec)
        * (F.col("n") - 1)
        * (2 * F.col("n") + 5)
        - F.col("tv")
    ).cast("double") / 18
    z = (
        F.col("s")
        - F.when(F.col("s") > 0, 1)
        .when(F.col("s") < 0, -1)
        .otherwise(0)
    ).cast("double") / F.sqrt(var_s.cast("double"))
    tau = F.col("s").cast("double") / F.sqrt(
        ((n0 - F.col("n1")) * n0).cast("double")
    )
    # a CONSTANT series ties everything: both denominators are 0 and
    # 0/0 would emit NaN (engine-dependent hash) — report NULL instead
    return j.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("s").cast("long").alias("s_stat"),
        F.when((n0 - F.col("n1")) * n0 == 0, F.lit(None).cast("double"))
        .otherwise(stable_round(tau, 6))
        .alias("tau_b"),
        F.when(var_s == 0, F.lit(None).cast("double"))
        .otherwise(stable_round(z, 6))
        .alias("z_score"),
        F.when(var_s == 0, F.lit("no_trend"))
        .when(z > 1.96, F.lit("increasing"))
        .when(z < -1.96, F.lit("decreasing"))
        .otherwise(F.lit("no_trend"))
        .alias("trend"),
    )


ORACLE_MANN_KENDALL = f"""
WITH hourly AS (
{_HOURLY_SQL}
), ok AS (
  SELECT event_type, count(*) AS n FROM hourly GROUP BY 1
  HAVING count(*) >= {_MK_MIN_HOURS}
), s AS (
  SELECT a.event_type,
         CAST(sum(CASE WHEN b.v > a.v THEN 1
                       WHEN b.v < a.v THEN -1 ELSE 0 END)
              AS HUGEINT) AS s
  FROM hourly a
  JOIN hourly b ON b.event_type = a.event_type AND a.h < b.h
  JOIN ok ON ok.event_type = a.event_type
  GROUP BY 1
), ties AS (
  SELECT event_type,
         sum(CAST(t AS HUGEINT) * (t - 1) / 2) AS n1,
         sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS tv
  FROM (SELECT event_type, v, count(*) AS t
        FROM hourly JOIN ok USING (event_type) GROUP BY 1, 2)
  GROUP BY 1
)
SELECT s.event_type, CAST(ok.n AS BIGINT) AS n_hours,
       CAST(s.s AS BIGINT) AS s_stat,
       CASE WHEN (CAST(ok.n AS HUGEINT) * (ok.n - 1) / 2 - t.n1)
                 * (CAST(ok.n AS HUGEINT) * (ok.n - 1) / 2) = 0
            THEN NULL ELSE
       {sql_stable_round(
           "CAST(s.s AS DOUBLE) / sqrt(CAST("
           "(CAST(ok.n AS HUGEINT) * (ok.n - 1) / 2 - t.n1)"
           " * (CAST(ok.n AS HUGEINT) * (ok.n - 1) / 2)"
           " AS DOUBLE))", 6)} END AS tau_b,
       CASE WHEN CAST(ok.n AS HUGEINT) * (ok.n - 1)
                 * (2 * ok.n + 5) - t.tv = 0 THEN NULL ELSE
       {sql_stable_round(
           "CAST(s.s - CASE WHEN s.s > 0 THEN 1"
           " WHEN s.s < 0 THEN -1 ELSE 0 END AS DOUBLE)"
           " / sqrt(CAST((CAST(ok.n AS HUGEINT) * (ok.n - 1)"
           " * (2 * ok.n + 5) - t.tv) / 18 AS DOUBLE))", 6)}
         END AS z_score,
       CASE WHEN CAST(ok.n AS HUGEINT) * (ok.n - 1)
                 * (2 * ok.n + 5) - t.tv = 0 THEN 'no_trend'
            WHEN CAST(s.s - CASE WHEN s.s > 0 THEN 1
                 WHEN s.s < 0 THEN -1 ELSE 0 END AS DOUBLE)
                 / sqrt(CAST((CAST(ok.n AS HUGEINT) * (ok.n - 1)
                 * (2 * ok.n + 5) - t.tv) / 18 AS DOUBLE)) > 1.96
              THEN 'increasing'
            WHEN CAST(s.s - CASE WHEN s.s > 0 THEN 1
                 WHEN s.s < 0 THEN -1 ELSE 0 END AS DOUBLE)
                 / sqrt(CAST((CAST(ok.n AS HUGEINT) * (ok.n - 1)
                 * (2 * ok.n + 5) - t.tv) / 18 AS DOUBLE)) < -1.96
              THEN 'decreasing'
            ELSE 'no_trend' END AS trend
FROM s JOIN ok USING (event_type) JOIN ties t USING (event_type)
""".strip()


# ------------------------------------------------- Kruskal-Wallis H


def q_metric_kruskal_wallis(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KRUSKAL-WALLIS hour-of-day effect per metric (Kruskal &
    Wallis 1952): H over the hourly series with hour-of-day as the
    24 groups — the rank-based (distribution-free) counterpart to
    the family's day-level ANOVA row: it asks whether hour-of-day
    shifts the DISTRIBUTION of the metric, robust to the heavy
    tails that invalidate the F test's normality assumption.

    Ranks use the midrank (average-rank) tie convention, carried as
    exact DOUBLED integers: 2·r̄(v) = 2·(#strictly smaller) + (#tied)
    + 1. Each metric reduces to its ≤ 24 exact-integer (R2_g, n_g)
    pairs; H and the tie correction then evaluate in ONE
    deterministic sorted-order fold over that bounded array (both
    engines sum the same ≤ 24 doubles in the same group order), so
    the rounded output is engine-stable.

    Scale: ranking is one window over the collapsed |metrics|×|hours|
    series partitioned BY METRIC; the fold input is |metrics|×24."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    n_ok = (
        hourly.groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= _KW_MIN_HOURS)
    )
    h = hourly.join(F.broadcast(n_ok), "event_type").select(
        "event_type",
        "n",
        (F.col("h") % 24).alias("g"),
        "v",
    )
    # midrank ×2 per distinct value: 2·(count below) + ties + 1
    byval = h.groupBy("event_type", "n", "v").agg(
        F.count(F.lit(1)).alias("t")
    )
    wv = (
        Window.partitionBy("event_type")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    ranked = byval.select(
        "event_type",
        "n",
        "v",
        "t",
        (
            2 * F.coalesce(F.sum("t").over(wv), F.lit(0))
            + F.col("t")
            + 1
        ).alias("r2"),
    )
    # group rank sums: join hour rows back to their value's midrank
    gsum = (
        h.join(ranked.select("event_type", "v", "r2"), ["event_type", "v"])
        .groupBy("event_type", "n", "g")
        .agg(
            F.count(F.lit(1)).alias("ng"),
            F.sum("r2").alias("rg2"),
        )
    )
    dec = "decimal(38,0)"
    tie = byval.groupBy("event_type").agg(
        F.sum(
            F.col("t").cast(dec) * F.col("t") * F.col("t")
            - F.col("t")
        ).alias("t3t")
    )
    # deterministic fold: sorted (g, rg2, ng) triples per metric
    folded = (
        gsum.groupBy("event_type", "n")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("g", "rg2", "ng"))
            ).alias("gs"),
            F.count(F.lit(1)).alias("k_groups"),
        )
        .select(
            "event_type",
            "n",
            "k_groups",
            F.expr(
                "aggregate(gs, cast(0.0 as double), (acc, x) ->"
                " acc + (cast(x.rg2 as double) * cast(x.rg2 as double))"
                " / (4.0 * cast(x.ng as double)))"
            ).alias("srq"),
        )
    )
    j = folded.join(tie, "event_type").join(
        F.broadcast(n_ok.select("event_type")), "event_type"
    )
    nn = F.col("n").cast("double")
    h_raw = 12.0 / (nn * (nn + 1.0)) * F.col("srq") - 3.0 * (nn + 1.0)
    corr = 1.0 - F.col("t3t").cast("double") / (nn * nn * nn - nn)
    return j.select(
        "event_type",
        F.col("n").alias("n_hours"),
        F.col("k_groups").cast("int").alias("k_groups"),
        stable_round(
            F.when(corr == 0, F.lit(None).cast("double")).otherwise(
                h_raw / corr
            ),
            6,
        ).alias("kw_h"),
    )


ORACLE_KRUSKAL_WALLIS = f"""
WITH hourly AS (
{_HOURLY_SQL}
), ok AS (
  SELECT event_type, count(*) AS n FROM hourly GROUP BY 1
  HAVING count(*) >= {_KW_MIN_HOURS}
), h AS (
  SELECT hourly.event_type, ok.n, hourly.h % 24 AS g, v
  FROM hourly JOIN ok USING (event_type)
), byval AS (
  SELECT event_type, n, v, count(*) AS t FROM h GROUP BY 1, 2, 3
), ranked AS (
  SELECT event_type, v, t,
         2 * coalesce(sum(t) OVER (PARTITION BY event_type ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           + t + 1 AS r2
  FROM byval
), gsum AS (
  SELECT h.event_type, h.n, h.g, count(*) AS ng,
         CAST(sum(r.r2) AS HUGEINT) AS rg2
  FROM h JOIN ranked r ON r.event_type = h.event_type AND r.v = h.v
  GROUP BY 1, 2, 3
), folded AS (
  SELECT event_type, n, count(*) AS k_groups,
         list_sum(list_transform(
             list_sort(list({{'g': g, 'rg2': rg2, 'ng': ng}})),
             x -> CAST(x.rg2 AS DOUBLE) * CAST(x.rg2 AS DOUBLE)
                  / (4.0 * CAST(x.ng AS DOUBLE)))) AS srq
  FROM gsum GROUP BY 1, 2
), tie AS (
  SELECT event_type,
         sum(CAST(t AS HUGEINT) * t * t - t) AS t3t
  FROM byval GROUP BY 1
)
SELECT f.event_type, CAST(f.n AS BIGINT) AS n_hours,
       CAST(f.k_groups AS INT) AS k_groups,
       CASE WHEN 1.0 - CAST(t.t3t AS DOUBLE)
                 / (CAST(f.n AS DOUBLE) * f.n * f.n - f.n) = 0
            THEN NULL ELSE
       {sql_stable_round(
           "(12.0 / (CAST(f.n AS DOUBLE) * (f.n + 1.0)) * f.srq"
           " - 3.0 * (f.n + 1.0))"
           " / (1.0 - CAST(t.t3t AS DOUBLE)"
           "    / (CAST(f.n AS DOUBLE) * f.n * f.n - f.n))", 6)}
       END AS kw_h
FROM folded f JOIN tie t USING (event_type)
""".strip()


# ---------------------------------------------- Grubbs max deviate


def q_metric_grubbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRUBBS MAX STUDENTIZED DEVIATE per metric (Grubbs 1950): the
    single most extreme hour's |v − mean|/sd over the hourly series,
    WHICH hour it was, and the fraction of the theoretical maximum
    deviate (n−1)/√n it reaches — the "was there even one wild hour"
    screen that complements the family's windowed/trailing anomaly
    detectors (those find local breaks; this ranks the global
    worst). g_max_fraction ≈ 1 means ONE point carries essentially
    all the variance (a lone spike); small fractions mean the
    extreme is unremarkable against the series' own spread.

    Exactness: G = max|n·v_i − S| / √(n·Σv² − S²) — multiplying the
    deviation through by n keeps numerator AND variance term exact
    DEC38 integers; ONE final sqrt-division. The argmax hour breaks
    ties by smallest hour (deterministic).

    Scale: the raw scan collapses to |metrics|×|hours| (one shuffle,
    map-side partials); the argmax is a per-metric max_by over that
    bounded relation; output is metric-sized."""
    hourly = _hourly_e2(spark, sf_dir, cached=True)
    dec = "decimal(38,0)"
    stats = hourly.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v").cast(dec) * F.col("v").cast(dec)).alias("q"),
    )
    dev = hourly.join(F.broadcast(stats), "event_type").select(
        "event_type",
        "n",
        "s",
        "q",
        "h",
        F.abs(
            F.col("v").cast(dec) * F.col("n").cast(dec)
            - F.col("s").cast(dec)
        ).alias("d"),
    )
    mx = dev.groupBy("event_type").agg(F.max("d").alias("dmax"))
    arg = (
        dev.join(F.broadcast(mx), "event_type")
        .filter(F.col("d") == F.col("dmax"))
        .groupBy("event_type")
        .agg(F.min("h").alias("suspect_h"))
    )
    agg = (
        stats.join(mx, "event_type")
        .join(F.broadcast(arg), "event_type")
    )
    var_n = (
        F.col("n").cast(dec) * F.col("q")
        - F.col("s").cast(dec) * F.col("s").cast(dec)
    ).cast("double")
    g = F.col("dmax").cast("double") / F.sqrt(var_n)
    g_max = (F.col("n").cast("double") - 1.0) / F.sqrt(
        F.col("n").cast("double")
    )
    return agg.select(
        "event_type",
        F.col("n").alias("n_hours"),
        (F.col("suspect_h") * _HOUR_MS).alias("suspect_ts_ms"),
        F.when(var_n == 0, F.lit(None).cast("double"))
        .otherwise(stable_round(g, 6))
        .alias("grubbs_g"),
        F.when(var_n == 0, F.lit(None).cast("double"))
        .otherwise(stable_round(g / g_max, 6))
        .alias("g_max_fraction"),
    )


ORACLE_GRUBBS = f"""
WITH hourly AS (
{_HOURLY_SQL}
), stats AS (
  SELECT event_type, count(*) AS n, CAST(sum(v) AS HUGEINT) AS s,
         sum(CAST(v AS HUGEINT) * v) AS q
  FROM hourly GROUP BY 1
), dev AS (
  SELECT h.event_type, st.n, st.s, st.q, h.h,
         abs(CAST(h.v AS HUGEINT) * st.n - st.s) AS d
  FROM hourly h JOIN stats st USING (event_type)
), mx AS (
  SELECT event_type, max(d) AS dmax FROM dev GROUP BY 1
), arg AS (
  SELECT dev.event_type, min(h) AS suspect_h
  FROM dev JOIN mx ON mx.event_type = dev.event_type
                  AND dev.d = mx.dmax
  GROUP BY 1
), agg AS (
  SELECT st.event_type, st.n, st.s, st.q, mx.dmax, arg.suspect_h
  FROM stats st JOIN mx USING (event_type) JOIN arg USING (event_type)
)
SELECT event_type, CAST(n AS BIGINT) AS n_hours,
       CAST(suspect_h * {_HOUR_MS} AS BIGINT) AS suspect_ts_ms,
       CASE WHEN CAST(n AS HUGEINT) * q - s * s = 0 THEN NULL ELSE
       {sql_stable_round(
           "CAST(dmax AS DOUBLE)"
           " / sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE))",
           6)} END AS grubbs_g,
       CASE WHEN CAST(n AS HUGEINT) * q - s * s = 0 THEN NULL ELSE
       {sql_stable_round(
           "(CAST(dmax AS DOUBLE)"
           " / sqrt(CAST(CAST(n AS HUGEINT) * q - s * s AS DOUBLE)))"
           " / ((CAST(n AS DOUBLE) - 1.0) / sqrt(CAST(n AS DOUBLE)))",
           6)} END AS g_max_fraction
FROM agg
""".strip()


# ---------------------------------------------- Welch's t per source pair


def q_corpus_welch_ttest(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WELCH'S UNEQUAL-VARIANCE t-TEST between every source pair over
    document length (Welch 1947): t and the Welch-Satterthwaite
    degrees of freedom — the parametric twin of the family's
    Mann-Whitney row (that one is rank-robust; this one is the
    textbook first answer and comes with an effect direction), run
    pairwise so a corpus-mix dashboard can rank WHICH source pairs
    differ, not just whether any do.

    Exactness: per-source n, Σx, Σx² are exact integers (DEC38);
    sample variance, t, and df are ONE fixed-shape double expression
    per pair. stable_round(6).

    Scale: the corpus scan collapses to |sources| moment rows; the
    pair cross is |sources|²."""
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").cast("long").alias("x")
    )
    dec = "decimal(38,0)"
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("q"),
    )
    a = per.select(
        F.col("source").alias("s1"),
        F.col("n").alias("n1"),
        F.col("s").alias("sa"),
        F.col("q").alias("qa"),
    )
    b = per.select(
        F.col("source").alias("s2"),
        F.col("n").alias("n2"),
        F.col("s").alias("sb"),
        F.col("q").alias("qb"),
    )
    j = a.join(F.broadcast(b)).filter(F.col("s1") < F.col("s2"))
    n1 = F.col("n1").cast("double")
    n2 = F.col("n2").cast("double")
    m1 = F.col("sa").cast("double") / n1
    m2 = F.col("sb").cast("double") / n2
    v1 = (
        F.col("n1").cast(dec) * F.col("qa")
        - F.col("sa").cast(dec) * F.col("sa").cast(dec)
    ).cast("double") / (n1 * n1 * (n1 - 1.0))
    v2 = (
        F.col("n2").cast(dec) * F.col("qb")
        - F.col("sb").cast(dec) * F.col("sb").cast(dec)
    ).cast("double") / (n2 * n2 * (n2 - 1.0))
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / F.sqrt(se2)
    df = (se2 * se2) / (
        (v1 / n1) * (v1 / n1) / (n1 - 1.0)
        + (v2 / n2) * (v2 / n2) / (n2 - 1.0)
    )
    return j.select(
        "s1",
        "s2",
        F.col("n1").alias("n_docs_1"),
        F.col("n2").alias("n_docs_2"),
        stable_round(t, 6).alias("welch_t"),
        stable_round(df, 4).alias("welch_df"),
    ).orderBy("s1", "s2")


ORACLE_WELCH = f"""
WITH per AS (
  SELECT source, count(*) AS n, CAST(sum(n_chars) AS HUGEINT) AS s,
         sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
  FROM documents GROUP BY 1
), j AS (
  SELECT a.source AS s1, b.source AS s2,
         a.n AS n1, b.n AS n2,
         CAST(a.s AS DOUBLE) / a.n AS m1,
         CAST(b.s AS DOUBLE) / b.n AS m2,
         CAST(a.n * a.q - a.s * a.s AS DOUBLE)
           / (CAST(a.n AS DOUBLE) * a.n * (a.n - 1.0)) AS v1,
         CAST(b.n * b.q - b.s * b.s AS DOUBLE)
           / (CAST(b.n AS DOUBLE) * b.n * (b.n - 1.0)) AS v2
  FROM per a JOIN per b ON a.source < b.source
)
SELECT s1, s2, CAST(n1 AS BIGINT) AS n_docs_1,
       CAST(n2 AS BIGINT) AS n_docs_2,
       {sql_stable_round(
           "(m1 - m2) / sqrt(v1 / n1 + v2 / n2)", 6)} AS welch_t,
       {sql_stable_round(
           "(v1 / n1 + v2 / n2) * (v1 / n1 + v2 / n2)"
           " / ((v1 / n1) * (v1 / n1) / (n1 - 1.0)"
           "    + (v2 / n2) * (v2 / n2) / (n2 - 1.0))", 4)}
         AS welch_df
FROM j ORDER BY s1, s2
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "metric_walsh_periodogram": q_metric_walsh_periodogram,
    "metric_mann_kendall": q_metric_mann_kendall,
    "metric_kruskal_wallis": q_metric_kruskal_wallis,
    "metric_grubbs": q_metric_grubbs,
    "corpus_welch_ttest": q_corpus_welch_ttest,
}

ORACLES: dict[str, str] = {
    "metric_walsh_periodogram": ORACLE_WALSH,
    "metric_mann_kendall": ORACLE_MANN_KENDALL,
    "metric_kruskal_wallis": ORACLE_KRUSKAL_WALLIS,
    "metric_grubbs": ORACLE_GRUBBS,
    "corpus_welch_ttest": ORACLE_WELCH,
}
