"""Distribution-statistics additions (late round 3): inequality,
conformance, survival, rank-correlation and backlog accounting.

Reference parity: the reference engine (Go, ~/reference) exposes only
windowed sum/count/avg/min/max/delta/rate; these queries extend the
same relational surface to the distribution-shape questions an
operator of that system asks next ("is revenue concentrated?", "does
the value stream look fabricated?", "how long until the second
conversion?"). All are expressed Spark-first and oracle-backed.

Cross-engine exactness: every count/sum rides as BIGINT (DECIMAL(38,0)
where products of ranks can pass 2^63 at corpus scale — DuckDB's
HUGEINT mirrors it); each emitted double is ONE division of exact
integers passed through ``stable_round``'s shared
floor(x·10^d + 0.5)/10^d algebra.

Scale posture: no global single-task windows — global/grouped ranks go
through the bucket-histogram offset scheme (operators/rank.py); the
only unpartitioned windows here run over bounded summaries (9 Benford
digits, ~36 duration days, ~90 months).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.functions.text import tokens
from monasca_aggregator_spark.operators.rank import global_rank
from monasca_aggregator_spark.sources.tables import load_table

_DAY_MS = 86_400_000
_DEC = "decimal(38,0)"


# ------------------------------------------- Gini coefficient per nation


def q_revenue_gini_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-inequality audit: per nation, the Gini coefficient of
    customer order-revenue — the Lorenz-curve summary beside
    ``orders_concentration_hhi``'s Σshare² (HHI weights whales, Gini
    weights the whole curve).

    With per-customer revenue a₁≤…≤aₙ (ties broken by custkey) and
    rank i, G = (2·Σi·aᵢ − (n+1)·T) / (n·T) — every term an exact
    integer, one final division.

    Scale: ranking inside a nation NEVER funnels the nation through one
    task (the naive ``row_number() OVER (PARTITION BY nation)`` would —
    25 tasks for the whole corpus). Rows bucket by revenue (monotone
    coarsening, a div 1024), rank locally per (nation, bucket), and a
    per-nation prefix sum over the tiny (nation, bucket) histogram
    broadcasts start offsets back: i = offset + local rank. Σi·aᵢ
    accumulates in DECIMAL(38,0) (i·a reaches ~n²·max_a ≈ 10²² at
    100 TB, past BIGINT).
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice")).cast("long").alias("rev"),
    )
    per_cust = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("rev").alias("a"))
        .withColumn("_b", (F.col("a") / F.lit(1024)).cast("long"))
    )
    local_w = Window.partitionBy("c_nationkey", "_b").orderBy(
        "a", "c_custkey"
    )
    ranked = per_cust.withColumn("_lr", F.row_number().over(local_w))
    hist = per_cust.groupBy("c_nationkey", "_b").agg(
        F.count(F.lit(1)).alias("_n")
    )
    # tiny relation (|nations| × |revenue buckets| rows): the prefix
    # window scans the histogram, never the customer table
    off_w = (
        Window.partitionBy("c_nationkey")
        .orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = hist.select(
        "c_nationkey",
        "_b",
        (F.sum("_n").over(off_w) - F.col("_n")).alias("_off"),
    )
    with_rank = ranked.join(
        F.broadcast(offsets), ["c_nationkey", "_b"]
    ).withColumn("i", (F.col("_off") + F.col("_lr")).cast("long"))
    per_nation = with_rank.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a").alias("t"),
        F.sum(F.col("i").cast(_DEC) * F.col("a").cast(_DEC)).alias("s"),
    )
    num = (
        F.lit(2).cast(_DEC) * F.col("s")
        - (F.col("n") + F.lit(1)).cast(_DEC) * F.col("t").cast(_DEC)
    ).cast("double")
    den = (F.col("n").cast(_DEC) * F.col("t").cast(_DEC)).cast("double")
    out = per_nation.join(
        F.broadcast(nation),
        per_nation["c_nationkey"] == nation["n_nationkey"],
    )
    return out.select(
        F.col("n_name").alias("nation"),
        F.col("n").alias("n_customers"),
        F.col("t").alias("revenue"),
        stable_round(num / den, 6).alias("gini"),
    )


ORACLE_GINI = f"""
WITH pc AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT) AS a
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), r AS (
  SELECT c_nationkey, a,
         row_number() OVER (
           PARTITION BY c_nationkey ORDER BY a, o_custkey
         ) AS i
  FROM pc
), pn AS (
  SELECT c_nationkey,
         count(*) AS n,
         CAST(sum(a) AS BIGINT) AS t,
         sum(CAST(i AS HUGEINT) * a) AS s
  FROM r GROUP BY 1
)
SELECT nn.n_name AS nation,
       CAST(pn.n AS BIGINT) AS n_customers,
       pn.t AS revenue,
       {sql_stable_round(
           "CAST(2 * pn.s - (pn.n + 1) * CAST(pn.t AS HUGEINT) AS DOUBLE)"
           " / CAST(CAST(pn.n AS HUGEINT) * pn.t AS DOUBLE)", 6)} AS gini
FROM pn JOIN nation nn ON nn.n_nationkey = pn.c_nationkey
""".strip()


def q_revenue_theil_by_nation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Theil T inequality index of customer revenue per nation
    (Theil 1967) — the third inequality lens beside Gini (whole
    Lorenz curve) and HHI (whale weight): T = (1/n)·Σ (xᵢ/μ)·ln(xᵢ/μ)
    = Σ (xᵢ/T)·ln(xᵢ·n/T). Theil is additively DECOMPOSABLE
    (between-group + within-group), which Gini is not — the reason
    economists reach for it when inequality must be attributed to
    segments; T=0 is perfect equality, ln(n) maximal concentration.

    Float determinism: revenues are exact BIGINTs (the Gini query's
    scheme); each customer's term evaluates the IDENTICAL double
    expression in both engines and pre-rounds to an e9 integer
    BEFORE the per-nation sum, so the cross-customer total is
    order-independent.

    Scale: one customer-keyed aggregate, a broadcast join of the
    25-row nation totals back to customers, one more nation-keyed
    aggregate with map-side partials — no windows, no sort.
    """
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, sf_dir, "nation").select(
        "n_nationkey", "n_name"
    )
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.floor(F.col("o_totalprice")).cast("long").alias("rev"),
    )
    per_cust = (
        orders.join(
            F.broadcast(cust), orders["o_custkey"] == cust["c_custkey"]
        )
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("rev").alias("a"))
    )
    totals = per_cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n"), F.sum("a").alias("t")
    )
    j = per_cust.join(F.broadcast(totals), "c_nationkey")
    term = (
        F.col("a").cast("double") / F.col("t").cast("double")
    ) * F.log(
        F.col("a").cast("double")
        * F.col("n").cast("double")
        / F.col("t").cast("double")
    )
    term_e9 = F.floor(
        term * F.lit(1_000_000_000.0) + F.lit(0.5)
    ).cast("long")
    per_nation = j.groupBy("c_nationkey").agg(
        F.max("n").alias("n_customers"),
        F.max("t").alias("revenue"),
        F.sum(term_e9).alias("theil_e9"),
    )
    return (
        per_nation.join(
            F.broadcast(nation),
            per_nation["c_nationkey"] == nation["n_nationkey"],
        )
        .select(
            F.col("n_name").alias("nation"),
            F.col("n_customers"),
            F.col("revenue"),
            stable_round(
                F.col("theil_e9").cast("double")
                / F.lit(1_000_000_000.0),
                6,
            ).alias("theil"),
        )
    )


ORACLE_THEIL = f"""
WITH pc AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT)
           AS a
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), tot AS (
  SELECT c_nationkey, count(*) AS n, CAST(sum(a) AS BIGINT) AS t
  FROM pc GROUP BY 1
), terms AS (
  SELECT pc.c_nationkey, tot.n, tot.t,
         CAST(floor(
           (CAST(pc.a AS DOUBLE) / CAST(tot.t AS DOUBLE))
             * ln(CAST(pc.a AS DOUBLE) * CAST(tot.n AS DOUBLE)
                  / CAST(tot.t AS DOUBLE))
           * 1000000000.0 + 0.5) AS BIGINT) AS term_e9
  FROM pc JOIN tot USING (c_nationkey)
), pn AS (
  SELECT c_nationkey, max(n) AS n_customers, max(t) AS revenue,
         CAST(sum(term_e9) AS BIGINT) AS theil_e9
  FROM terms GROUP BY 1
)
SELECT nn.n_name AS nation,
       CAST(pn.n_customers AS BIGINT) AS n_customers,
       pn.revenue,
       {sql_stable_round(
           "CAST(pn.theil_e9 AS DOUBLE) / 1000000000.0", 6)} AS theil
FROM pn JOIN nation nn ON nn.n_nationkey = pn.c_nationkey
""".strip()


# ------------------------------------------------ Benford's-law audit


def q_orders_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford first-digit conformance audit over order totals — the
    classic fabricated-data screen (naturally-grown monetary amounts
    lead with '1' ~30.1% of the time; uniform or invented values
    don't). Emits, per leading digit 1–9, the observed count/share and
    the deviation from log₁₀(1 + 1/d).

    Plan: one scan → 9-group aggregate (map-side partials); the total
    rides a window over those 9 rows. Shares are one exact-integer
    division; the Benford expectation is scalar double math identical
    in both engines.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        F.floor(F.col("o_totalprice")).cast("long").alias("v")
    )
    digits = (
        orders.filter(F.col("v") >= 1)
        .select(
            F.substring(F.col("v").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
        .groupBy("digit")
        .agg(F.count(F.lit(1)).alias("observed"))
    )
    tot_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    with_tot = digits.withColumn("_t", F.sum("observed").over(tot_w))
    share = F.col("observed").cast("double") / F.col("_t").cast("double")
    expected = F.log10(
        F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")
    )
    return with_tot.select(
        "digit",
        "observed",
        stable_round(share, 6).alias("share"),
        stable_round(expected, 6).alias("expected"),
        stable_round(share - expected, 6).alias("deviation"),
    )


ORACLE_BENFORD = f"""
WITH d AS (
  SELECT CAST(substring(CAST(CAST(floor(o_totalprice) AS BIGINT)
                             AS VARCHAR), 1, 1) AS INT) AS digit
  FROM orders WHERE floor(o_totalprice) >= 1
), g AS (
  SELECT digit, count(*) AS observed FROM d GROUP BY 1
), t AS (
  SELECT digit, observed, sum(observed) OVER () AS tot FROM g
)
SELECT digit, observed,
       {sql_stable_round(
           "CAST(observed AS DOUBLE) / CAST(tot AS DOUBLE)", 6)} AS share,
       {sql_stable_round(
           "log10(1.0::DOUBLE + 1.0::DOUBLE / CAST(digit AS DOUBLE))",
           6)} AS expected,
       {sql_stable_round(
           "CAST(observed AS DOUBLE) / CAST(tot AS DOUBLE)"
           " - log10(1.0::DOUBLE + 1.0::DOUBLE / CAST(digit AS DOUBLE))",
           6)} AS deviation
FROM t
""".strip()


# --------------------------------------- discrete survival hazard table


def q_events_survival_hazard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-second-purchase survival table (the Kaplan-Meier
    ingredient): for each whole day d since a user's FIRST purchase,
    how many users were still at risk, how many had their second
    purchase that day (deaths), and how many ran out of observation
    window (censored at the stream frontier). hazard(d) =
    deaths/at_risk — the exact discrete-time hazard; S(t) is its
    running product downstream.

    Plan: purchases rank per user (high-cardinality key — full
    parallelism), collapse to one (first_ts, second_ts) row per user,
    censor against the broadcast 1-row stream frontier, then aggregate
    to a ≤|days| table; the at-risk prefix runs over THAT table, never
    the events. Every emitted number except hazard is an exact BIGINT;
    hazard is one division.
    """
    ev = load_table(spark, sf_dir, "events")
    p = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.unix_millis("ts").alias("ms"), "event_id"
    )
    w = Window.partitionBy("user_id").orderBy("ms", "event_id")
    per_user = (
        p.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .groupBy("user_id")
        .agg(
            F.max(F.when(F.col("rn") == 1, F.col("ms"))).alias("t1"),
            F.max(F.when(F.col("rn") == 2, F.col("ms"))).alias("t2"),
        )
    )
    frontier = ev.agg(F.max(F.unix_millis("ts")).alias("fr"))
    per_user = per_user.crossJoin(F.broadcast(frontier))
    dur = F.floor(
        (F.coalesce(F.col("t2"), F.col("fr")) - F.col("t1"))
        / F.lit(_DAY_MS)
    ).cast("long")
    event = F.col("t2").isNotNull()
    day_tbl = (
        per_user.select(dur.alias("day"), event.alias("e"))
        .groupBy("day")
        .agg(
            F.sum(F.col("e").cast("long")).alias("deaths"),
            F.sum((~F.col("e")).cast("long")).alias("censored"),
        )
    )
    # bounded summary: one row per whole day of follow-up
    tot_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum_w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    leaving = F.col("deaths") + F.col("censored")
    out = day_tbl.select(
        "day",
        "deaths",
        "censored",
        (
            F.sum(leaving).over(tot_w)
            - (F.sum(leaving).over(cum_w) - leaving)
        ).alias("at_risk"),
    )
    return out.select(
        "day",
        "at_risk",
        "deaths",
        "censored",
        stable_round(
            F.col("deaths").cast("double") / F.col("at_risk").cast("double"),
            6,
        ).alias("hazard"),
    )


ORACLE_SURVIVAL = f"""
WITH p AS (
  SELECT user_id, epoch_ms(ts) AS ms, event_id,
         row_number() OVER (
           PARTITION BY user_id ORDER BY epoch_ms(ts), event_id
         ) AS rn
  FROM events WHERE event_type = 'purchase'
), u AS (
  SELECT user_id,
         max(CASE WHEN rn = 1 THEN ms END) AS t1,
         max(CASE WHEN rn = 2 THEN ms END) AS t2
  FROM p WHERE rn <= 2 GROUP BY 1
), f AS (
  SELECT max(epoch_ms(ts)) AS fr FROM events
), d AS (
  SELECT CAST(floor((coalesce(t2, f.fr) - t1) / {_DAY_MS})
              AS BIGINT) AS day,
         (t2 IS NOT NULL) AS e
  FROM u CROSS JOIN f
), g AS (
  SELECT day,
         CAST(sum(CASE WHEN e THEN 1 ELSE 0 END) AS BIGINT) AS deaths,
         CAST(sum(CASE WHEN e THEN 0 ELSE 1 END) AS BIGINT) AS censored
  FROM d GROUP BY 1
), a AS (
  SELECT day, deaths, censored,
         CAST(sum(deaths + censored) OVER ()
              - (sum(deaths + censored) OVER (
                   ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 - (deaths + censored)) AS BIGINT) AS at_risk
  FROM g
)
SELECT day, at_risk, deaths, censored,
       {sql_stable_round(
           "CAST(deaths AS DOUBLE) / CAST(at_risk AS DOUBLE)", 6)} AS hazard
FROM a
""".strip()


# ------------------------------------- exact Spearman rank correlation


def q_corpus_spearman(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Spearman rank correlation between document length
    (n_chars) and whitespace-token count — the monotone-association
    readout a curation pipeline runs before trusting one signal as a
    proxy for the other (Pearson exists as metric_correlation; Spearman
    is outlier-robust).

    Ranks are tie-broken by doc_id, so both engines produce the
    IDENTICAL integer rank permutation and ρ = 1 − 6Σd²/(n(n²−1)) is
    exact integer math into one division.

    Scale: both rankings use operators/rank.py's bucket-histogram
    global rank (no single-task global sort); Σd² accumulates in
    DECIMAL(38,0) — d² reaches n² ≈ 10¹⁸ and the sum 10²⁷ at 10⁹ docs,
    past BIGINT (DuckDB mirrors with HUGEINT).
    """
    # r11 (guide §2.4): each global_rank reads its input twice (rank
    # branch + bucket histogram) and the two ranks chain — uncached,
    # the corpus tokenize re-executed up to 4×. Cache the thin
    # 3-column projection once and pin the first rank round.
    docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "doc_id",
        F.col("n_chars").alias("x"),
        F.size(tokens(F.col("text"))).cast("long").alias("y"),
    ).cache()
    rx = global_rank(
        docs,
        (F.col("x") / F.lit(64)).cast("long"),
        [F.col("x"), F.col("doc_id")],
        rank_col="rx",
    ).cache()
    rxy = global_rank(
        rx,
        (F.col("y") / F.lit(16)).cast("long"),
        [F.col("y"), F.col("doc_id")],
        rank_col="ry",
        total_col="n_total",
    )
    d = (F.col("rx") - F.col("ry")).cast(_DEC)
    s = rxy.agg(
        F.max("n_total").alias("n"),
        F.sum(d * d).alias("d2"),
    )
    nd = F.col("n").cast("double")
    rho = F.lit(1.0) - F.lit(6.0) * F.col("d2").cast("double") / (
        nd * (nd * nd - F.lit(1.0))
    )
    return s.select(
        F.col("n").alias("n_docs"),
        F.col("d2").cast("long").alias("sum_d2"),
        stable_round(rho, 6).alias("spearman"),
    )


ORACLE_SPEARMAN = rf"""
WITH t AS (
  SELECT doc_id, n_chars AS x,
         CAST(len(string_split_regex(lower(trim(text)), '\s+'))
              AS BIGINT) AS y
  FROM documents
), r AS (
  SELECT row_number() OVER (ORDER BY x, doc_id) AS rx,
         row_number() OVER (ORDER BY y, doc_id) AS ry
  FROM t
), s AS (
  SELECT count(*) AS n,
         sum(CAST(rx - ry AS HUGEINT) * (rx - ry)) AS d2
  FROM r
)
SELECT CAST(n AS BIGINT) AS n_docs,
       CAST(d2 AS BIGINT) AS sum_d2,
       {sql_stable_round(
           "1.0::DOUBLE - 6.0::DOUBLE * CAST(d2 AS DOUBLE)"
           " / (CAST(n AS DOUBLE)"
           "    * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - 1.0::DOUBLE))",
           6)} AS spearman
FROM s
""".strip()


def q_corpus_jarque_bera(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jarque-Bera normality test of doc length per source (Jarque &
    Bera 1980): JB = n/6·(S² + K²/4) from population skewness S and
    excess kurtosis K — the moment-based screen that says whether a
    source's length distribution is even ROUGHLY normal before anyone
    fits a Gaussian to it (the lognormal/Hill rows already suspect it
    isn't; this quantifies the rejection). JB ~ χ²₂ under normality;
    the 95% flag uses the 5.991465 critical value.

    Exactness: power sums Σx, Σx², Σx³, Σx⁴ are exact integers (x²
    in BIGINT, x³/x⁴ carried in DECIMAL(38,0) — x⁴ ≈ 10²⁰ per doc
    passes BIGINT; DuckDB mirrors in HUGEINT); the moment algebra is
    the IDENTICAL double expression tree in both engines over those
    integers.

    Scale: one source-keyed aggregate with map-side partials; output
    is |sources| rows.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    x = F.col("n_chars")
    x2 = (x * x).alias("x2")
    per = docs.select(
        "source", x.alias("x"), x2
    ).groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(F.col("x2").cast(_DEC)).alias("s2"),
        F.sum(F.col("x2").cast(_DEC) * F.col("x").cast(_DEC)).alias(
            "s3"
        ),
        F.sum(F.col("x2").cast(_DEC) * F.col("x2").cast(_DEC)).alias(
            "s4"
        ),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    s2d = F.col("s2").cast("double")
    s3d = F.col("s3").cast("double")
    s4d = F.col("s4").cast("double")
    m2 = s2d / nd - mu * mu
    m3 = (
        s3d / nd
        - F.lit(3.0) * mu * (s2d / nd)
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        s4d / nd
        - F.lit(4.0) * mu * (s3d / nd)
        + F.lit(6.0) * mu * mu * (s2d / nd)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    skew = m3 / (m2 * F.sqrt(m2))
    kurt = m4 / (m2 * m2) - F.lit(3.0)
    jb = nd / F.lit(6.0) * (
        skew * skew + kurt * kurt / F.lit(4.0)
    )
    return per.select(
        "source",
        F.col("n").alias("n_docs"),
        stable_round(skew, 6).alias("skewness"),
        stable_round(kurt, 6).alias("kurtosis_excess"),
        stable_round(jb, 4).alias("jb"),
        (jb > F.lit(5.991465)).alias("normal_rejected"),
    )


_JB_MU = "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)"
_JB_M2 = (
    f"CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - ({_JB_MU}) * ({_JB_MU})"
)
_JB_M3 = (
    f"CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 3.0::DOUBLE * ({_JB_MU})"
    f" * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 2.0::DOUBLE * ({_JB_MU}) * ({_JB_MU}) * ({_JB_MU})"
)
_JB_M4 = (
    f"CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)"
    f" - 4.0::DOUBLE * ({_JB_MU})"
    f" * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" + 6.0::DOUBLE * ({_JB_MU}) * ({_JB_MU})"
    f" * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    f" - 3.0::DOUBLE * ({_JB_MU}) * ({_JB_MU}) * ({_JB_MU})"
    f" * ({_JB_MU})"
)
_JB_SKEW = f"({_JB_M3}) / (({_JB_M2}) * sqrt({_JB_M2}))"
_JB_KURT = f"({_JB_M4}) / (({_JB_M2}) * ({_JB_M2})) - 3.0::DOUBLE"
_JB_STAT = (
    f"CAST(n AS DOUBLE) / 6.0::DOUBLE * (({_JB_SKEW}) * ({_JB_SKEW})"
    f" + ({_JB_KURT}) * ({_JB_KURT}) / 4.0::DOUBLE)"
)

ORACLE_JARQUE_BERA = f"""
WITH per AS (
  SELECT source, count(*) AS n,
         CAST(sum(n_chars) AS BIGINT) AS s1,
         sum(CAST(n_chars * n_chars AS HUGEINT)) AS s2,
         sum(CAST(n_chars * n_chars AS HUGEINT) * n_chars) AS s3,
         sum(CAST(n_chars * n_chars AS HUGEINT)
             * (n_chars * n_chars)) AS s4
  FROM documents GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       {sql_stable_round(_JB_SKEW, 6)} AS skewness,
       {sql_stable_round(_JB_KURT, 6)} AS kurtosis_excess,
       {sql_stable_round(_JB_STAT, 4)} AS jb,
       ({_JB_STAT}) > 5.991465 AS normal_rejected
FROM per
""".strip()


_TAU_CAP = 1200  # bounded pair sample: ≤ _TAU_CAP² / 2 pairs
_TAU_P = 2147483647  # Mersenne prime 2^31−1 (same family as the
_TAU_MULT = 2654435761  # dedup estimator gates' multiplicative hash)


def q_corpus_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b between doc length and whitespace-token count
    (Kendall 1938, tie-corrected) — the pair-concordance sibling of
    `corpus_spearman`: Spearman measures monotone association via
    ranks, tau-b via the fraction of concordant pairs, is more robust
    to a few wild ranks, and its ties handling is explicit. Exact
    integer pair counts (concordant / discordant / x-ties / y-ties)
    into one closed-form float.

    Pairs are quadratic, so the statistic runs on a DETERMINISTIC
    multiplicative-hash sample of ≤ {_TAU_CAP} docs (the estimator
    gates' `_calibration_docs` pattern — SQL-reproducible, rerun-
    stable; at oracle SF the sample is the whole corpus): a
    calibration GATE, ~0.7M pairs via one broadcast self-join on the
    bounded sample, never corpus-quadratic.
    """
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        n_docs = pq.ParquetFile(path).metadata.num_rows
    except Exception:
        n_docs = load_table(spark, sf_dir, "documents").count()
    every = max(1, n_docs // _TAU_CAP)
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    pri = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_TAU_P)) * F.lit(_TAU_MULT),
        F.lit(_TAU_P),
    )
    s = docs.filter(F.pmod(pri, F.lit(every)) == 0).select(
        "doc_id",
        F.col("n_chars").alias("x"),
        F.size(tokens(F.col("text"))).cast("long").alias("y"),
    )
    b = s.select(
        F.col("doc_id").alias("jd"),
        F.col("x").alias("xj"),
        F.col("y").alias("yj"),
    )
    pairs = s.join(F.broadcast(b), F.col("doc_id") < F.col("jd"))
    dx = F.col("x") - F.col("xj")
    dy = F.col("y") - F.col("yj")
    agg = pairs.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum((dx * dy > 0).cast("long")).alias("c"),
        F.sum((dx * dy < 0).cast("long")).alias("d"),
        F.sum((dx == 0).cast("long")).alias("tx"),
        F.sum((dy == 0).cast("long")).alias("ty"),
    )
    denom = F.sqrt(
        (F.col("n_pairs") - F.col("tx")).cast("double")
        * (F.col("n_pairs") - F.col("ty")).cast("double")
    )
    return agg.select(
        "n_pairs",
        F.col("c").alias("concordant"),
        F.col("d").alias("discordant"),
        F.col("tx").alias("ties_x"),
        F.col("ty").alias("ties_y"),
        stable_round(
            (F.col("c") - F.col("d")).cast("double") / denom, 6
        ).alias("tau_b"),
    )


ORACLE_KENDALL_TAU = rf"""
WITH s AS (
  SELECT d.doc_id, d.n_chars AS x,
         CAST(len(string_split_regex(lower(trim(d.text)), '\s+'))
              AS BIGINT) AS y
  FROM documents d,
       (SELECT greatest(count(*) // {_TAU_CAP}, 1) AS every
        FROM documents) n
  WHERE ((d.doc_id % {_TAU_P}) * {_TAU_MULT}) % {_TAU_P}
          % n.every = 0
), p AS (
  SELECT a.x - b.x AS dx, a.y - b.y AS dy
  FROM s a JOIN s b ON a.doc_id < b.doc_id
), agg AS (
  SELECT count(*) AS n_pairs,
         CAST(sum(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS c,
         CAST(sum(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS d,
         CAST(sum(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS tx,
         CAST(sum(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS ty
  FROM p
)
SELECT CAST(n_pairs AS BIGINT) AS n_pairs,
       c AS concordant, d AS discordant,
       tx AS ties_x, ty AS ties_y,
       {sql_stable_round(
           "CAST(c - d AS DOUBLE)"
           " / sqrt(CAST(n_pairs - tx AS DOUBLE)"
           "        * CAST(n_pairs - ty AS DOUBLE))", 6)} AS tau_b
FROM agg
""".strip()


# --------------------------------------------- open-order backlog series


def q_orders_backlog(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Open-order backlog time series: per calendar month, how many
    orders opened, how many finished shipping (an order closes the
    month AFTER its last lineitem ships), and how many were open at
    month end — the operational WIP gauge (Little's law numerator)
    that the reference's windowed counters can't see because it needs
    interval, not point, semantics.

    Sweep-line rewrite of the interval overlap (the
    sessions_concurrency pattern on a fact⋈fact lifecycle): +1 at the
    open month, −1 after the close month, prefix-summed over the tiny
    month table — never a per-month interval join. Orders without
    lineitems (none at any tested SF) would drop from the inner join;
    exact BIGINT throughout.
    """
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship"))
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = od.join(li, od["o_orderkey"] == li["l_orderkey"]).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "om"
        ),
        (F.year("ship") * 12 + F.month("ship")).alias("cm"),
    )
    opened = j.groupBy(F.col("om").alias("m")).agg(
        F.count(F.lit(1)).alias("opened")
    )
    closed = j.groupBy(F.col("cm").alias("m")).agg(
        F.count(F.lit(1)).alias("closed")
    )
    months = opened.join(closed, "m", "full_outer").select(
        "m",
        F.coalesce("opened", F.lit(0)).alias("opened"),
        F.coalesce("closed", F.lit(0)).alias("closed"),
    )
    # bounded summary: one row per month over the dataset's time span
    cum_w = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return months.select(
        (F.col("m") / F.lit(12)).cast("long").alias("year"),
        (F.col("m") % 12 + 1).cast("int").alias("month"),
        "opened",
        "closed",
        (
            F.sum("opened").over(cum_w) - F.sum("closed").over(cum_w)
        ).alias("backlog"),
    )


ORACLE_BACKLOG = """
WITH li AS (
  SELECT l_orderkey, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
), j AS (
  SELECT year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS om,
         year(li.ship) * 12 + month(li.ship) AS cm
  FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
), opened AS (
  SELECT om AS m, count(*) AS opened FROM j GROUP BY 1
), closed AS (
  SELECT cm AS m, count(*) AS closed FROM j GROUP BY 1
), months AS (
  SELECT coalesce(opened.m, closed.m) AS m,
         CAST(coalesce(opened, 0) AS BIGINT) AS opened,
         CAST(coalesce(closed, 0) AS BIGINT) AS closed
  FROM opened FULL OUTER JOIN closed ON opened.m = closed.m
)
SELECT CAST(m // 12 AS BIGINT) AS year,
       CAST(m % 12 + 1 AS INT) AS month,
       opened, closed,
       CAST(sum(opened) OVER w - sum(closed) OVER w AS BIGINT) AS backlog
FROM months
WINDOW w AS (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
""".strip()


def q_orders_littles_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LITTLE'S LAW consistency audit per month (r9): L = λ·W holds
    for ANY stable flow system, so the ratio L/(λ·W) — month-end
    backlog over (arrival rate × mean cycle time of that month's
    arrivals) — is the queueing sanity check an ops team runs on its
    own order metrics: a ratio drifting from ~1 means the flow is
    NOT in steady state (ramping backlog, seasonal surge, cohort
    drift) and capacity math built on averages will mislead. Uses
    the `orders_backlog` machinery for L and the same open/close
    months for W.

    Exactness: λ·W algebraically cancels to Σ(cycle months) of the
    month's arrivals, so the ratio is ONE division of two exact
    BIGINTs (backlog over cycle-month sum) — plus the mean cycle as
    a second exact division for display. NULL ratio where no
    arrivals."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(F.max("l_shipdate").alias("ship"))
    )
    od = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate"
    )
    j = od.join(li, od["o_orderkey"] == li["l_orderkey"]).select(
        (F.year("o_orderdate") * 12 + F.month("o_orderdate") - 1).alias(
            "om"
        ),
        (F.year("ship") * 12 + F.month("ship")).alias("cm"),
    )
    opened = j.groupBy(F.col("om").alias("m")).agg(
        F.count(F.lit(1)).alias("opened"),
        F.sum(F.col("cm") - F.col("om")).alias("w_sum"),
    )
    closed = j.groupBy(F.col("cm").alias("m")).agg(
        F.count(F.lit(1)).alias("closed")
    )
    months = opened.join(closed, "m", "full_outer").select(
        "m",
        F.coalesce("opened", F.lit(0)).alias("opened"),
        F.coalesce("w_sum", F.lit(0)).alias("w_sum"),
        F.coalesce("closed", F.lit(0)).alias("closed"),
    )
    cum_w = Window.orderBy("m").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    base = months.select(
        "m",
        "opened",
        "closed",
        "w_sum",
        (
            F.sum("opened").over(cum_w) - F.sum("closed").over(cum_w)
        ).alias("backlog"),
    )
    return base.select(
        (F.col("m") / F.lit(12)).cast("long").alias("year"),
        (F.col("m") % 12 + 1).cast("int").alias("month"),
        "opened",
        "closed",
        "backlog",
        F.when(
            F.col("opened") > 0,
            stable_round(
                F.col("w_sum").cast("double")
                / F.col("opened").cast("double"),
                4,
            ),
        ).alias("avg_cycle_months"),
        F.when(
            F.col("w_sum") > 0,
            stable_round(
                F.col("backlog").cast("double")
                / F.col("w_sum").cast("double"),
                4,
            ),
        ).alias("littles_ratio"),
    )


ORACLE_LITTLES_LAW = """
WITH li AS (
  SELECT l_orderkey, max(l_shipdate) AS ship FROM lineitem GROUP BY 1
), j AS (
  SELECT year(o.o_orderdate) * 12 + month(o.o_orderdate) - 1 AS om,
         year(li.ship) * 12 + month(li.ship) AS cm
  FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
), opened AS (
  SELECT om AS m, count(*) AS opened,
         CAST(sum(cm - om) AS BIGINT) AS w_sum
  FROM j GROUP BY 1
), closed AS (
  SELECT cm AS m, count(*) AS closed FROM j GROUP BY 1
), months AS (
  SELECT coalesce(opened.m, closed.m) AS m,
         CAST(coalesce(opened, 0) AS BIGINT) AS opened,
         CAST(coalesce(w_sum, 0) AS BIGINT) AS w_sum,
         CAST(coalesce(closed, 0) AS BIGINT) AS closed
  FROM opened FULL OUTER JOIN closed ON opened.m = closed.m
), b AS (
  SELECT m, opened, closed, w_sum,
         CAST(sum(opened) OVER w - sum(closed) OVER w AS BIGINT)
           AS backlog
  FROM months
  WINDOW w AS (ORDER BY m ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
)
SELECT CAST(m // 12 AS BIGINT) AS year,
       CAST(m % 12 + 1 AS INT) AS month,
       opened, closed, backlog,
       CASE WHEN opened > 0 THEN
         floor(CAST(w_sum AS DOUBLE) / CAST(opened AS DOUBLE)
               * 10000.0::DOUBLE + 0.5::DOUBLE) / 10000.0::DOUBLE
       END AS avg_cycle_months,
       CASE WHEN w_sum > 0 THEN
         floor(CAST(backlog AS DOUBLE) / CAST(w_sum AS DOUBLE)
               * 10000.0::DOUBLE + 0.5::DOUBLE) / 10000.0::DOUBLE
       END AS littles_ratio
FROM b
""".strip()


def q_corpus_ks_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Kolmogorov–Smirnov distance of each source's
    document-length distribution vs the REST of the corpus — the
    distribution-shift detector behind "did source s7's crawl change":
    D = max over lengths v of |F_source(v) − F_rest(v)|.

    Exactness: for source-vs-rest both denominators are per-source
    CONSTANTS (n_s and N−n_s), so the max runs over exact BIGINT
    cross-multiplied numerators |cum_s·(N−n_s) − cum_rest·n_s| and
    ONE division converts the winner to a double — no per-step
    rounding to disagree on the argmax.

    Scale: the sup is attained at a jump point, so it suffices to
    evaluate at the distinct length values; the grid is
    |sources| × |distinct n_chars| (a bounded summary, not row count),
    built by cross-joining two aggregates; the ordered window runs on
    the aggregated grid partitioned per source — the same
    aggregate-then-window shape as the weighted-median rewrite.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "source", F.col("n_chars").alias("v")
    )
    # r11 (guide §2.4): the collapsed (source, length) count table
    # feeds THREE consumers (per-source totals, per-length totals,
    # the grid left join) and the grand total rolls up from it —
    # cache the bounded summary once instead of four corpus scans.
    sv = docs.groupBy("source", "v").agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    srcs = sv.groupBy("source").agg(F.sum("c").alias("n_s"))
    vals = sv.groupBy("v").agg(F.sum("c").alias("c_tot"))
    grid = srcs.crossJoin(vals).join(
        sv, ["source", "v"], "left"
    ).select(
        "source",
        "n_s",
        "v",
        "c_tot",
        F.coalesce("c", F.lit(0)).alias("c"),
    )
    w = (
        Window.partitionBy("source")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum_s = F.sum("c").over(w)
    cum_tot = F.sum("c_tot").over(w)
    # exact rollup of the cached summary (every doc lands in exactly
    # one (source, v) cell) — not a fourth corpus scan
    total = F.broadcast(sv.agg(F.sum("c").alias("n_total")))
    stepped = grid.select(
        "source", "n_s", cum_s.alias("cum_s"), cum_tot.alias("cum_tot")
    ).crossJoin(total)
    n_rest = F.col("n_total") - F.col("n_s")
    num = F.abs(
        F.col("cum_s").cast(_DEC) * n_rest.cast(_DEC)
        - (F.col("cum_tot") - F.col("cum_s")).cast(_DEC)
        * F.col("n_s").cast(_DEC)
    )
    return (
        stepped.groupBy("source", "n_s", "n_total")
        .agg(F.max(num).alias("max_num"))
        .select(
            "source",
            F.col("n_s").alias("n_docs"),
            stable_round(
                F.col("max_num").cast("double")
                / (
                    F.col("n_s").cast("double")
                    * (F.col("n_total") - F.col("n_s")).cast("double")
                ),
                8,
            ).alias("ks_distance"),
        )
    )


ORACLE_KS = f"""
WITH sv AS (
  SELECT source, n_chars AS v, count(*) AS c
  FROM documents GROUP BY source, n_chars
), srcs AS (
  SELECT source, sum(c) AS n_s FROM sv GROUP BY source
), vals AS (
  SELECT v, sum(c) AS c_tot FROM sv GROUP BY v
), grid AS (
  SELECT s.source, s.n_s, t.v, t.c_tot, coalesce(x.c, 0) AS c
  FROM srcs s CROSS JOIN vals t
  LEFT JOIN sv x ON x.source = s.source AND x.v = t.v
), stepped AS (
  SELECT source, n_s,
         sum(c) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_s,
         sum(c_tot) OVER (PARTITION BY source ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tot
  FROM grid
), tot AS (SELECT count(*) AS n_total FROM documents)
SELECT source,
       CAST(n_s AS BIGINT) AS n_docs,
       {sql_stable_round(
           "CAST(max(abs(CAST(cum_s AS HUGEINT) * (n_total - n_s) - "
           "CAST(cum_tot - cum_s AS HUGEINT) * n_s)) AS DOUBLE) / "
           "(CAST(n_s AS DOUBLE) * CAST(n_total - n_s AS DOUBLE))", 8
       )} AS ks_distance
FROM stepped CROSS JOIN tot
GROUP BY source, n_s, n_total
""".strip()


def q_lang_source_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """χ² independence audit of the lang × source contingency table —
    "is language mix uniform across sources, or does some crawl skew?"
    Each cell's contribution is (O·N − r·c)² / (N·r·c): ONE exact
    division of DECIMAL(38,0) integers (O·N−r·c can pass 2^63 at
    corpus scale). The total χ² is the sum of the PRE-ROUNDED e6 cell
    integers — summing exact BIGINTs instead of doubles removes the
    float-addition-order ambiguity between engines; the bounded cell
    count (langs × sources) makes the final relation tiny.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    # r11 (guide §2.4): ONE corpus scan — marginals and the grand
    # total roll up exactly from the cached |langs|×|sources| cell
    # table (every doc lands in exactly one cell); each previously
    # re-scanned the corpus (4 FileScans → 1).
    cells = docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("o")
    ).cache()
    rows_ = cells.groupBy("lang").agg(F.sum("o").alias("r"))
    cols_ = cells.groupBy("source").agg(F.sum("o").alias("c"))
    n = F.broadcast(cells.agg(F.sum("o").alias("n")))
    full = (
        rows_.crossJoin(cols_)
        .join(cells, ["lang", "source"], "left")
        .select(
            "lang",
            "source",
            "r",
            "c",
            F.coalesce("o", F.lit(0)).alias("o"),
        )
        .crossJoin(n)
    )
    dev = (
        F.col("o").cast(_DEC) * F.col("n").cast(_DEC)
        - F.col("r").cast(_DEC) * F.col("c").cast(_DEC)
    )
    term = (dev * dev).cast("double") / (
        F.col("n").cast("double")
        * F.col("r").cast("double")
        * F.col("c").cast("double")
    )
    t6 = F.floor(term * 1_000_000 + F.lit(0.5)).cast("long")
    agg = full.agg(
        F.count(F.lit(1)).alias("n_cells"),
        F.max("n").alias("n_docs"),
        F.sum(t6).alias("chi2_e6"),
        F.count_distinct("lang").alias("n_langs"),
        F.count_distinct("source").alias("n_sources"),
    )
    dof = (F.col("n_langs") - 1) * (F.col("n_sources") - 1)
    chi2 = F.col("chi2_e6").cast("double") / F.lit(1e6)
    return agg.select(
        "n_docs",
        "n_cells",
        dof.cast("long").alias("dof"),
        stable_round(chi2, 6).alias("chi2"),
        stable_round(chi2 / dof.cast("double"), 6).alias("chi2_per_dof"),
    )


ORACLE_CHI2 = f"""
WITH cells AS (
  SELECT lang, source, count(*) AS o FROM documents GROUP BY lang, source
), r AS (SELECT lang, sum(o) AS r FROM cells GROUP BY lang),
c AS (SELECT source, sum(o) AS c FROM cells GROUP BY source),
tot AS (SELECT count(*) AS n FROM documents),
full_grid AS (
  SELECT r.lang, c.source, r.r, c.c, coalesce(x.o, 0) AS o, tot.n
  FROM r CROSS JOIN c CROSS JOIN tot
  LEFT JOIN cells x ON x.lang = r.lang AND x.source = c.source
), terms AS (
  SELECT n, lang, source,
         CAST(floor(
           CAST((CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c) *
                (CAST(o AS HUGEINT) * n - CAST(r AS HUGEINT) * c)
             AS DOUBLE)
           / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE) * CAST(c AS DOUBLE))
           * 1000000 + 0.5) AS BIGINT) AS t6
  FROM full_grid
)
SELECT CAST(max(n) AS BIGINT) AS n_docs,
       count(*) AS n_cells,
       CAST((count(DISTINCT lang) - 1) * (count(DISTINCT source) - 1)
         AS BIGINT) AS dof,
       {sql_stable_round("CAST(sum(t6) AS DOUBLE) / 1e6", 6)} AS chi2,
       {sql_stable_round(
           "CAST(sum(t6) AS DOUBLE) / 1e6 / "
           "CAST((count(DISTINCT lang) - 1) * "
           "(count(DISTINCT source) - 1) AS DOUBLE)", 6
       )} AS chi2_per_dof
FROM terms
""".strip()


# ------------------------------------- Mann–Whitney U test per source


def q_corpus_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann–Whitney U rank-sum test of document length, each source vs
    the rest of the corpus — the NONPARAMETRIC location-shift screen
    beside ``corpus_ks_by_source``'s max-gap distance (KS reacts to any
    distribution difference; U answers the directional question "does
    this source run systematically longer/shorter?"). Standard
    large-sample normal approximation with the tie-corrected variance
    (Mann & Whitney 1947; no continuity correction — documented so the
    z matches the formula exactly).

    Arithmetic is exact until the final division: average ranks carry
    as the INTEGER 2·rank (2·cum_before + t + 1 for a tie-run of t),
    rank sums and U as DECIMAL(38,0) (rank·count reaches ~n² ≈ 10²² at
    100 TB, past BIGINT), the tie term Σ(t³−t) likewise; z is one
    float expression over those integers.

    Scale: ranking never touches per-doc rows in a window — per-value
    counts aggregate first (distinct doc lengths are bounded by the
    max document size, independent of corpus row count), the
    unpartitioned prefix window runs over THAT bounded histogram, and
    double-ranks join back by value (broadcast).
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "source", F.col("n_chars").alias("v")
    )
    # r11 (guide §2.4, closing batch): ONE corpus pass — the bounded
    # (source, value) cell table is cached and byval/ranked/totals all
    # roll up from it (Σ n_sv per v is the identical count multiset),
    # where before byval's two consumers and sv each re-scanned
    # documents (3 scans → 1).
    sv = (
        docs.groupBy("source", "v")
        .agg(F.count(F.lit(1)).alias("n_sv"))
        .cache()
    )
    byval = sv.groupBy("v").agg(F.sum("n_sv").alias("cnt"))
    cum_w = Window.orderBy("v").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    # dr = 2·(average rank of a value's tie run): integer by construction
    ranked = byval.select(
        "v",
        "cnt",
        (
            F.lit(2) * (F.sum("cnt").over(cum_w) - F.col("cnt"))
            + F.col("cnt")
            + F.lit(1)
        ).alias("dr"),
    )
    totals = byval.agg(
        F.sum("cnt").alias("n_total"),
        F.sum(
            F.col("cnt").cast(_DEC) * F.col("cnt").cast(_DEC) * F.col("cnt")
            - F.col("cnt")
        ).alias("tie3"),
    )
    per_source = (
        sv.join(F.broadcast(ranked), "v")
        .groupBy("source")
        .agg(
            F.sum("n_sv").alias("n_s"),
            F.sum(F.col("n_sv").cast(_DEC) * F.col("dr").cast(_DEC)).alias(
                "r2"
            ),
        )
        .crossJoin(F.broadcast(totals))
    )
    n_s = F.col("n_s").cast(_DEC)
    n_rest = (F.col("n_total") - F.col("n_s")).cast(_DEC)
    n_tot = F.col("n_total").cast(_DEC)
    two_u = F.col("r2") - n_s * (n_s + F.lit(1))
    num = (two_u - n_s * n_rest).cast("double")
    # var(U) = n1·n2/12 · ((N+1) − Σ(t³−t)/(N(N−1))); z = num / (2·√var)
    var = (
        (n_s * n_rest).cast("double")
        / F.lit(12.0)
        * (
            (n_tot + F.lit(1)).cast("double")
            - F.col("tie3").cast("double")
            / (n_tot * (n_tot - F.lit(1))).cast("double")
        )
    )
    return per_source.select(
        "source",
        F.col("n_s").cast("long").alias("n_docs"),
        stable_round(two_u.cast("double") / F.lit(2.0), 4).alias("u_stat"),
        # all-tie degenerate case: variance 0 → z NULL (not NaN/error),
        # same nullif contract as the oracle
        stable_round(
            num / F.nullif(F.lit(2.0) * F.sqrt(var), F.lit(0.0)), 6
        ).alias("z"),
        # rank-biserial effect size: 2U/(n1·n2) − 1 == num/(n1·n2)
        stable_round(num / (n_s * n_rest).cast("double"), 6).alias(
            "rank_biserial"
        ),
    )


ORACLE_MANNWHITNEY = f"""
WITH d AS (SELECT source, n_chars AS v FROM documents),
byval AS (SELECT v, count(*) AS cnt FROM d GROUP BY v),
ranked AS (
  SELECT v, cnt,
         2 * (sum(cnt) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cnt)
           + cnt + 1 AS dr
  FROM byval
),
tot AS (
  SELECT sum(cnt) AS n_total,
         sum(CAST(cnt AS HUGEINT) * cnt * cnt - cnt) AS tie3
  FROM byval
),
sv AS (SELECT source, v, count(*) AS n_sv FROM d GROUP BY source, v),
per_source AS (
  SELECT s.source, sum(s.n_sv) AS n_s,
         sum(CAST(s.n_sv AS HUGEINT) * r.dr) AS r2
  FROM sv s JOIN ranked r ON s.v = r.v
  GROUP BY s.source
)
SELECT source,
       CAST(n_s AS BIGINT) AS n_docs,
       {sql_stable_round(
           "CAST(r2 - CAST(n_s AS HUGEINT) * (n_s + 1) AS DOUBLE) / 2.0", 4
       )} AS u_stat,
       {sql_stable_round(
           "CAST(r2 - CAST(n_s AS HUGEINT) * (n_s + 1)"
           "     - CAST(n_s AS HUGEINT) * (n_total - n_s) AS DOUBLE)"
           " / nullif(2.0 * sqrt("
           "   CAST(CAST(n_s AS HUGEINT) * (n_total - n_s) AS DOUBLE) / 12.0"
           "   * (CAST(n_total + 1 AS DOUBLE)"
           "      - CAST(tie3 AS DOUBLE)"
           "        / CAST(CAST(n_total AS HUGEINT) * (n_total - 1)"
           "               AS DOUBLE))), 0.0)", 6
       )} AS z,
       {sql_stable_round(
           "CAST(r2 - CAST(n_s AS HUGEINT) * (n_s + 1)"
           "     - CAST(n_s AS HUGEINT) * (n_total - n_s) AS DOUBLE)"
           " / CAST(CAST(n_s AS HUGEINT) * (n_total - n_s) AS DOUBLE)", 6
       )} AS rank_biserial
FROM per_source CROSS JOIN tot
""".strip()


# --------------------------------- Poisson-bootstrap CI per source


_BOOT_B = 32
_BOOT_MULT = 2654435761
_BOOT_MOD = 2147483647
# inverse-CDF cutoffs of Poisson(1) scaled to the hash modulus: a draw
# h ∈ [0, MOD) maps to weight k where h < cutoff_k first holds — the
# integer-threshold form keeps both engines comparing the SAME ints
_BOOT_CUTS = tuple(
    int(c * _BOOT_MOD)
    for c in (
        0.36787944117144233,  # P(X=0)
        0.7357588823428847,  # P(X<=1)
        0.9196986029286058,  # P(X<=2)
        0.9810118431238462,  # P(X<=3)
        0.9963401531726563,  # P(X<=4)
        0.9994058151824183,  # P(X<=5)
    )
)


def _boot_weight(h):
    """Poisson(1) weight from an integer hash via the cutoff ladder."""
    expr = F.lit(6)
    for k in range(len(_BOOT_CUTS) - 1, -1, -1):
        expr = F.when(h < F.lit(_BOOT_CUTS[k]), F.lit(k)).otherwise(expr)
    return expr


def _sql_boot_weight(h: str) -> str:
    arms = " ".join(
        f"WHEN {h} < {c} THEN {k}" for k, c in enumerate(_BOOT_CUTS)
    )
    return f"CASE {arms} ELSE 6 END"


def q_quality_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence interval for mean document length
    per source — the single-pass, shuffle-free bootstrap (Chamandy et
    al., Google 2012): instead of resampling n rows with replacement B
    times (B corpus shuffles), every row draws B independent
    Poisson(1) weights and each replicate is one weighted mean. The CI
    is the order-statistic interval of the B replicate means (2nd
    smallest / 2nd largest of B=32 ≈ a 94% interval) — rank-based, no
    quantile interpolation, so both engines pick identical rows.

    Determinism: the per-(doc, replicate) draw is the same
    multiplicative-hash uniform the sampling family uses
    (sample_consistent_k), mapped through integer inverse-CDF cutoffs
    — both engines compare the same BIGINTs, no float RNG anywhere.

    Scale: the fan-out is rows×B before a partial agg collapses it to
    sources×B groups; replicate means are one exact-integer division
    each, and the order-stat windows run over B=32 rows per source.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", F.col("n_chars").alias("v")
    )
    reps = docs.select(
        "source",
        "v",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("rep"),
        F.col("doc_id"),
    )
    # reduce mod-MOD BEFORE the multiplicative step: the raw
    # (doc_id·B + rep)·MULT product overflows BIGINT once ids pass
    # ~2^32 (caught by the ×64 soak, where replica-shifted ids do) —
    # the two-step form keeps every intermediate < 2^63 at any id
    h = F.pmod(
        F.pmod(F.col("doc_id") * _BOOT_B + F.col("rep"), F.lit(_BOOT_MOD))
        * F.lit(_BOOT_MULT),
        F.lit(_BOOT_MOD),
    )
    weighted = reps.select(
        "source", "rep", "v", _boot_weight(h).alias("w")
    )
    per_rep = (
        weighted.groupBy("source", "rep")
        .agg(
            F.sum(F.col("w") * F.col("v")).alias("num"),
            F.sum("w").alias("den"),
        )
        .filter(F.col("den") > 0)
        .select(
            "source",
            "rep",
            (F.col("num").cast("double") / F.col("den")).alias("m"),
        )
    )
    asc = Window.partitionBy("source").orderBy(
        F.col("m").asc(), F.col("rep").asc()
    )
    desc = Window.partitionBy("source").orderBy(
        F.col("m").desc(), F.col("rep").desc()
    )
    bounds = (
        per_rep.select(
            "source",
            "m",
            F.row_number().over(asc).alias("ra"),
            F.row_number().over(desc).alias("rd"),
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_boot"),
            F.min(F.when(F.col("ra") == 2, F.col("m"))).alias("lo"),
            F.min(F.when(F.col("rd") == 2, F.col("m"))).alias("hi"),
        )
    )
    point = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("v").cast("double") / F.count(F.lit(1))).alias("mean_raw"),
    )
    return point.join(bounds, "source").select(
        "source",
        "n_docs",
        "n_boot",
        stable_round(F.col("mean_raw"), 6).alias("mean_chars"),
        stable_round(F.col("lo"), 6).alias("ci_lo"),
        stable_round(F.col("hi"), 6).alias("ci_hi"),
    )


ORACLE_BOOTSTRAP_CI = f"""
WITH reps AS (
  SELECT d.source, d.n_chars AS v, t.rep,
         ((d.doc_id * {_BOOT_B} + t.rep) % {_BOOT_MOD})
           * {_BOOT_MULT} % {_BOOT_MOD} AS h
  FROM documents d, (SELECT unnest(range({_BOOT_B})) AS rep) t
),
per_rep AS (
  SELECT source, rep,
         CAST(sum(CAST({_sql_boot_weight('h')} AS BIGINT) * v) AS DOUBLE)
           / CAST(sum({_sql_boot_weight('h')}) AS BIGINT) AS m
  FROM reps GROUP BY source, rep
  HAVING sum({_sql_boot_weight('h')}) > 0
),
ranked AS (
  SELECT source, m,
         row_number() OVER (PARTITION BY source ORDER BY m ASC, rep ASC)
           AS ra,
         row_number() OVER (PARTITION BY source ORDER BY m DESC, rep DESC)
           AS rd
  FROM per_rep
),
bounds AS (
  SELECT source, count(*) AS n_boot,
         min(CASE WHEN ra = 2 THEN m END) AS lo,
         min(CASE WHEN rd = 2 THEN m END) AS hi
  FROM ranked GROUP BY source
),
point AS (
  SELECT source, count(*) AS n_docs,
         CAST(sum(n_chars) AS DOUBLE) / count(*) AS mean_raw
  FROM documents GROUP BY source
)
SELECT p.source, CAST(p.n_docs AS BIGINT) AS n_docs,
       CAST(b.n_boot AS BIGINT) AS n_boot,
       {sql_stable_round('p.mean_raw', 6)} AS mean_chars,
       {sql_stable_round('b.lo', 6)} AS ci_lo,
       {sql_stable_round('b.hi', 6)} AS ci_hi
FROM point p JOIN bounds b ON p.source = b.source
""".strip()


# ------------------------ customer revenue-segment migration matrix


_SEG_WHALE = 400_000  # monthly whole-currency spend thresholds
_SEG_REGULAR = 150_000


def _seg(rev):
    return (
        F.when(rev >= _SEG_WHALE, "whale")
        .when(rev >= _SEG_REGULAR, "regular")
        .otherwise("light")
    )


def q_orders_segment_migration(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Customer revenue-SEGMENT migration matrix: for every customer
    active in month m, which spend segment (whale/regular/light by
    fixed monthly thresholds) they land in at m+1 — or 'churned' —
    summed over all month pairs. The flow-matrix view of the lifecycle
    question ``orders_nrr`` answers in aggregate dollars: NRR says the
    revenue held, this says WHO moved between tiers to make it so.

    Same co-partitioned (customer, month+1) self-join as NRR, exact
    BIGINT revenue into deterministic CASE tiers, frontier month
    excluded via the broadcast 1-row max; output is the ≤ 3×4 matrix.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("mo"),
        F.floor(F.col("o_totalprice")).cast("long").alias("rev"),
    )
    # r11 (guide §2.4): the (customer, month) rollup feeds the
    # shifted next-month copy, the frontier AND the pairing join —
    # uncached, the orders scan re-executed per consumer
    # (3 FileScans → 1).
    cm = orders.groupBy("o_custkey", "mo").agg(
        F.sum("rev").alias("rev")
    ).cache()
    nxt = cm.select(
        "o_custkey",
        F.add_months(F.col("mo"), -1).alias("mo"),
        F.col("rev").alias("rev_next"),
    )
    frontier = cm.agg(F.max("mo").alias("max_mo"))
    paired = (
        cm.join(nxt, ["o_custkey", "mo"], "left")
        .crossJoin(F.broadcast(frontier))
        .filter(F.col("mo") < F.col("max_mo"))
    )
    seg_to = F.when(
        F.col("rev_next").isNull(), F.lit("churned")
    ).otherwise(_seg(F.col("rev_next")))
    return (
        paired.select(
            _seg(F.col("rev")).alias("seg_from"), seg_to.alias("seg_to")
        )
        .groupBy("seg_from", "seg_to")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


ORACLE_SEGMENT_MIGRATION = f"""
WITH cm AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
frontier AS (SELECT max(mo) AS max_mo FROM cm),
paired AS (
  SELECT c.rev, n.rev AS rev_next
  FROM cm c
  LEFT JOIN cm n ON n.o_custkey = c.o_custkey
    AND n.mo = CAST(c.mo + INTERVAL 1 MONTH AS DATE)
  CROSS JOIN frontier f
  WHERE c.mo < f.max_mo
),
seg AS (
  SELECT CASE WHEN rev >= {_SEG_WHALE} THEN 'whale'
              WHEN rev >= {_SEG_REGULAR} THEN 'regular'
              ELSE 'light' END AS seg_from,
         CASE WHEN rev_next IS NULL THEN 'churned'
              WHEN rev_next >= {_SEG_WHALE} THEN 'whale'
              WHEN rev_next >= {_SEG_REGULAR} THEN 'regular'
              ELSE 'light' END AS seg_to
  FROM paired
)
SELECT seg_from, seg_to, count(*) AS n_transitions
FROM seg GROUP BY 1, 2
""".strip()


# ------------------------------- net revenue retention per month


def q_orders_nrr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net-revenue-retention accounting per calendar month: of the
    customers who spent in month m, how much of that revenue shows up
    in m+1, split into retained / expansion / contraction / churn —
    the SaaS-finance readout beside ``orders_repeat_rate``'s count
    view (NRR weights customers by revenue, repeat-rate doesn't).

    NRR(m) = (base-customer revenue in m+1) / (base revenue in m);
    expansion = Σ max(0, Δ) over retained customers, contraction the
    mirror, churn = spend of customers with no m+1 order. New-customer
    revenue in m+1 is excluded by definition (it lands in m+1's own
    base row). Revenue rides as exact whole-currency BIGINTs (the
    corpus convention, see ORACLE_GINI); NRR is one final division.

    Scale: one shuffle to (customer, month) partials; the consecutive
    -month pairing is a self-join on (custkey, month+1) — co-
    partitioned on custkey, never a window over the order fact. The
    final agg is |months| rows; the frontier month (no m+1 data)
    drops via a broadcast 1-row max instead of emitting fake churn.
    """
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.to_date(F.date_trunc("month", F.col("o_orderdate"))).alias("mo"),
        F.floor(F.col("o_totalprice")).cast("long").alias("rev"),
    )
    # r11 (guide §2.4): the (customer, month) rollup feeds the
    # shifted next-month copy, the frontier AND the pairing join —
    # uncached, the orders scan re-executed per consumer
    # (3 FileScans → 1).
    cm = orders.groupBy("o_custkey", "mo").agg(
        F.sum("rev").alias("rev")
    ).cache()
    nxt = cm.select(
        "o_custkey",
        F.add_months(F.col("mo"), -1).alias("mo"),
        F.col("rev").alias("rev_next"),
    )
    frontier = cm.agg(F.max("mo").alias("max_mo"))
    paired = (
        cm.join(nxt, ["o_custkey", "mo"], "left")
        .crossJoin(F.broadcast(frontier))
        .filter(F.col("mo") < F.col("max_mo"))
    )
    nxt_rev = F.coalesce(F.col("rev_next"), F.lit(0))
    out = paired.groupBy("mo").agg(
        F.count(F.lit(1)).alias("base_customers"),
        F.sum("rev").alias("base_rev"),
        F.sum(nxt_rev).alias("retained_rev"),
        F.sum(
            F.when(F.col("rev_next").isNull(), F.col("rev")).otherwise(0)
        ).alias("churn_rev"),
        F.sum(F.greatest(nxt_rev - F.col("rev"), F.lit(0))).alias(
            "expansion_rev"
        ),
        F.sum(
            F.when(
                F.col("rev_next").isNotNull(),
                F.greatest(F.col("rev") - F.col("rev_next"), F.lit(0)),
            ).otherwise(0)
        ).alias("contraction_rev"),
    )
    return out.select(
        F.col("mo").alias("month"),
        "base_customers",
        "base_rev",
        "retained_rev",
        "churn_rev",
        "expansion_rev",
        "contraction_rev",
        stable_round(
            F.col("retained_rev").cast("double")
            / F.col("base_rev").cast("double"),
            6,
        ).alias("nrr"),
    )


ORACLE_NRR = f"""
WITH cm AS (
  SELECT o_custkey, CAST(date_trunc('month', o_orderdate) AS DATE) AS mo,
         CAST(sum(CAST(floor(o_totalprice) AS BIGINT)) AS BIGINT) AS rev
  FROM orders GROUP BY 1, 2
),
frontier AS (SELECT max(mo) AS max_mo FROM cm),
paired AS (
  SELECT c.mo, c.rev, n.rev AS rev_next
  FROM cm c
  LEFT JOIN cm n ON n.o_custkey = c.o_custkey
    AND n.mo = CAST(c.mo + INTERVAL 1 MONTH AS DATE)
  CROSS JOIN frontier f
  WHERE c.mo < f.max_mo
)
SELECT mo AS month,
       count(*) AS base_customers,
       CAST(sum(rev) AS BIGINT) AS base_rev,
       CAST(sum(coalesce(rev_next, 0)) AS BIGINT) AS retained_rev,
       CAST(sum(CASE WHEN rev_next IS NULL THEN rev ELSE 0 END) AS BIGINT)
         AS churn_rev,
       CAST(sum(greatest(coalesce(rev_next, 0) - rev, 0)) AS BIGINT)
         AS expansion_rev,
       CAST(sum(CASE WHEN rev_next IS NOT NULL
                     THEN greatest(rev - rev_next, 0) ELSE 0 END) AS BIGINT)
         AS contraction_rev,
       {sql_stable_round(
           "CAST(sum(coalesce(rev_next, 0)) AS DOUBLE)"
           " / CAST(sum(rev) AS DOUBLE)", 6)} AS nrr
FROM paired GROUP BY mo
""".strip()


def q_orders_seasonality_index(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue SEASONALITY index per calendar month (r8): each
    month-of-year's mean monthly revenue as a percentage of the
    all-months mean — the classical seasonal index every demand
    planner normalizes forecasts with (index > 100 = a structurally
    strong month), with the month's observation count so a thin month
    is visibly thin. Revenue sums are exact e2 cents per
    (year, month); the index divides two exact-integer-derived means
    once. Two tiny aggregates after the one fact groupBy —
    month-grid-sized output."""
    o = load_table(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("yr"),
        F.month("o_orderdate").alias("mo"),
        F.floor(F.col("o_totalprice") * F.lit(100.0) + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    per_ym = o.groupBy("yr", "mo").agg(
        F.sum("e2").alias("rev_e2"), F.count(F.lit(1)).alias("n_orders")
    )
    per_mo = per_ym.groupBy("mo").agg(
        F.count(F.lit(1)).alias("n_years"),
        F.sum("rev_e2").alias("rev_e2"),
        F.sum("n_orders").alias("n_orders"),
    )
    total = per_mo.agg(
        F.sum("rev_e2").alias("t_rev"), F.sum("n_years").alias("t_ym")
    )
    mean_mo = F.col("rev_e2").cast("double") / F.col("n_years").cast(
        "double"
    )
    mean_all = F.col("t_rev").cast("double") / F.col("t_ym").cast(
        "double"
    )
    return (
        per_mo.crossJoin(F.broadcast(total))
        .select(
            "mo",
            F.col("n_years").cast("long").alias("n_year_months"),
            F.col("n_orders").cast("long").alias("n_orders"),
            stable_round(mean_mo / mean_all * F.lit(100.0), 4).alias(
                "seasonality_index"
            ),
        )
    )


ORACLE_SEASONALITY = f"""
WITH o AS (
  SELECT year(o_orderdate) AS yr, month(o_orderdate) AS mo,
         CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT) AS e2
  FROM orders
), per_ym AS (
  SELECT yr, mo, sum(e2) AS rev_e2, count(*) AS n_orders
  FROM o GROUP BY 1, 2
), per_mo AS (
  SELECT mo, count(*) AS n_years, sum(rev_e2) AS rev_e2,
         sum(n_orders) AS n_orders
  FROM per_ym GROUP BY 1
), total AS (
  SELECT sum(rev_e2) AS t_rev, sum(n_years) AS t_ym FROM per_mo
)
SELECT mo, CAST(n_years AS BIGINT) AS n_year_months,
       CAST(n_orders AS BIGINT) AS n_orders,
       {sql_stable_round(
           "(CAST(rev_e2 AS DOUBLE) / n_years)"
           " / (CAST(t_rev AS DOUBLE) / t_ym) * 100.0", 4)}
         AS seasonality_index
FROM per_mo, total
""".strip()


# --------------------------- FDR-controlled anomaly discovery (BH)

_FDR_ALPHA = 0.05  # target false-discovery rate
_HOUR_MS_FDR = 3600 * 1000
_W_SQL_STATS = f"(epoch_ms(ts) // {_HOUR_MS_FDR}) * {_HOUR_MS_FDR}"


def q_metric_anomaly_fdr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benjamini–Hochberg FDR-controlled anomaly DISCOVERY (BH 1995)
    — the multiple-testing correction the rest of the anomaly family
    skips: screening |metrics|×|hours| cells at a fixed per-cell
    threshold pages on noise proportionally to the number of cells,
    so the screen controls the expected FALSE-DISCOVERY RATE at α=5%
    across the whole test family instead.

    Per cell: leave-one-out baseline over the same (metric,
    hour-of-day) stratum (`anomaly_seasonal`'s stratification, minus
    the self-masking bias — one spiked day cannot inflate its own
    σ), one-sided Cantelli p-value p = den/(den + num²) with
    num = n·v − S and den = (n−1)(Q−v²) − (S−v)² — distribution-free,
    pure integer ratios, so both engines compute the identical
    double. A constant stratum with a spike (den=0, num>0) is a
    certain anomaly (p=0); fewer than 3 observations → untested
    (p=1). BH: rank all m cells by p ascending (bucket-histogram
    global rank — no single-task sort), find the largest k with
    p(k) ≤ α·k/m, reject ranks ≤ k.

    Output is the per-metric summary (cells, discoveries, min p, max
    z) — on a null corpus ZERO discoveries is the statistically
    correct answer (the detector is pinned on injected spikes in
    pytest, the `orders_duplicate_invoices` contract), while min_p /
    max_z stay non-trivially data-dependent.

    Scale: raw scan → |metrics|×|hours| series (one shuffle,
    map-side partials); stratum stats are a |metrics|×24 broadcast
    join-back; Q = Σv² rides DECIMAL(38,0) (v ≈ 10¹⁵ per metric-hour
    at 100 TB → v² ≈ 10³⁰, past BIGINT; num², den ≈ 10³² stay inside
    DEC38); the BH rank runs over the collapsed cell table via
    operators/rank.py.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.floor(F.col("value") * 100 + F.lit(0.5))
        .cast("long")
        .alias("e2"),
    )
    cells = ev.groupBy(
        "event_type",
        (
            (F.col("ts_ms") / F.lit(_HOUR_MS_FDR)).cast("long")
            * F.lit(_HOUR_MS_FDR)
        ).alias("window_ts_ms"),
    ).agg(F.sum("e2").alias("v")).cache()
    # r11 (guide §2.4): `cells` feeds the stratum aggregate AND the
    # join-back, and `ranked` feeds the BH cutoff AND the final
    # summary — each consumer re-ran the corpus scan (global_rank
    # itself reads its input twice: rank branch + bucket histogram,
    # so the raw scan executed up to 8×). Both relations are bounded
    # at |metrics|×|hours|; cache each once.
    hod = (
        (F.col("window_ts_ms") / F.lit(_HOUR_MS_FDR)).cast("long") % 24
    ).alias("hod")
    strata = (
        cells.select("event_type", hod, "v")
        .groupBy("event_type", "hod")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("v").alias("s"),
            F.sum(F.col("v").cast(_DEC) * F.col("v").cast(_DEC)).alias(
                "q"
            ),
        )
    )
    j = cells.withColumn("hod", hod).join(
        F.broadcast(strata), ["event_type", "hod"]
    )
    num = (
        F.col("n").cast(_DEC) * F.col("v").cast(_DEC)
        - F.col("s").cast(_DEC)
    )
    den = (F.col("n") - 1).cast(_DEC) * (
        F.col("q") - F.col("v").cast(_DEC) * F.col("v").cast(_DEC)
    ) - (F.col("s").cast(_DEC) - F.col("v").cast(_DEC)) * (
        F.col("s").cast(_DEC) - F.col("v").cast(_DEC)
    )
    scored = j.select(
        "event_type",
        "window_ts_ms",
        num.alias("num"),
        den.alias("den"),
        F.when(F.col("n") < 3, F.lit(1.0))
        .when(num <= 0, F.lit(1.0))
        .when(den == 0, F.lit(0.0))
        .otherwise(
            den.cast("double")
            / (den.cast("double") + num.cast("double") * num.cast("double"))
        )
        .alias("p"),
    )
    ranked = global_rank(
        scored,
        F.floor(F.col("p") * F.lit(256.0)).cast("long"),
        [F.col("p"), F.col("event_type"), F.col("window_ts_ms")],
        rank_col="i",
        total_col="m",
    ).cache()
    cutoff = ranked.agg(
        F.max(
            F.when(
                F.col("p")
                <= F.lit(_FDR_ALPHA) * F.col("i") / F.col("m"),
                F.col("i"),
            )
        ).alias("k")
    )
    z = F.when(
        (F.col("den") > 0) & (F.col("num") > 0),
        F.col("num").cast("double")
        / F.sqrt(F.col("den").cast("double")),
    )
    return (
        ranked.crossJoin(F.broadcast(cutoff))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_cells"),
            F.sum(
                (F.col("i") <= F.coalesce(F.col("k"), F.lit(0)))
                .cast("long")
            ).alias("n_discoveries"),
            stable_round(F.min("p"), 8).alias("min_p"),
            stable_round(F.max(z), 4).alias("max_z"),
        )
    )


ORACLE_ANOMALY_FDR = f"""
WITH cells AS (
  SELECT event_type, {_W_SQL_STATS} AS window_ts_ms,
         sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS v
  FROM events GROUP BY 1, 2
), strata AS (
  SELECT event_type,
         (window_ts_ms // {_HOUR_MS_FDR}) % 24 AS hod,
         count(*) AS n, sum(v) AS s,
         sum(CAST(v AS HUGEINT) * v) AS q
  FROM cells GROUP BY 1, 2
), scored AS (
  SELECT c.event_type, c.window_ts_ms,
         CAST(st.n AS HUGEINT) * c.v - st.s AS num,
         CAST(st.n - 1 AS HUGEINT)
           * (st.q - CAST(c.v AS HUGEINT) * c.v)
           - CAST(st.s - c.v AS HUGEINT) * (st.s - c.v) AS den,
         CASE
           WHEN st.n < 3 THEN 1.0::DOUBLE
           WHEN CAST(st.n AS HUGEINT) * c.v - st.s <= 0
             THEN 1.0::DOUBLE
           WHEN CAST(st.n - 1 AS HUGEINT)
                  * (st.q - CAST(c.v AS HUGEINT) * c.v)
                  - CAST(st.s - c.v AS HUGEINT) * (st.s - c.v) = 0
             THEN 0.0::DOUBLE
           ELSE CAST(CAST(st.n - 1 AS HUGEINT)
                  * (st.q - CAST(c.v AS HUGEINT) * c.v)
                  - CAST(st.s - c.v AS HUGEINT) * (st.s - c.v)
                    AS DOUBLE)
                / (CAST(CAST(st.n - 1 AS HUGEINT)
                     * (st.q - CAST(c.v AS HUGEINT) * c.v)
                     - CAST(st.s - c.v AS HUGEINT) * (st.s - c.v)
                       AS DOUBLE)
                   + CAST(CAST(st.n AS HUGEINT) * c.v - st.s AS DOUBLE)
                     * CAST(CAST(st.n AS HUGEINT) * c.v - st.s
                            AS DOUBLE))
         END AS p
  FROM cells c
  JOIN strata st ON st.event_type = c.event_type
               AND st.hod = (c.window_ts_ms // {_HOUR_MS_FDR}) % 24
), ranked AS (
  SELECT *,
         row_number() OVER (ORDER BY p, event_type, window_ts_ms)
           AS i,
         count(*) OVER () AS m
  FROM scored
), cutoff AS (
  SELECT max(CASE WHEN p <= {_FDR_ALPHA} * i / m THEN i END) AS k
  FROM ranked
)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n_cells,
       CAST(sum(CASE WHEN i <= coalesce(k, 0) THEN 1 ELSE 0 END)
            AS BIGINT) AS n_discoveries,
       {sql_stable_round("min(p)", 8)} AS min_p,
       {sql_stable_round(
           "max(CASE WHEN den > 0 AND num > 0 THEN"
           " CAST(num AS DOUBLE) / sqrt(CAST(den AS DOUBLE)) END)",
           4)} AS max_z
FROM ranked, cutoff
GROUP BY 1
""".strip()


# -------------------------------------- lognormal length-shape fit


def q_corpus_lognormal_fit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Lognormal FIT of the doc-length distribution per source
    (method of moments on ln-length) — natural text lengths follow a
    heavy-tailed roughly-lognormal law; a source whose fitted shape
    disagrees with its own empirical median (implied exp(μ) vs actual)
    is mixed/truncated/machine-generated — the DISTRIBUTION-SHAPE
    screen beside `quality_iqr_outliers`' per-doc fences and
    `corpus_ks_by_source`'s cross-source distance.

    Exactness: ln(n_chars) quantizes to e6 fixed-point BEFORE
    aggregation (floor(ln·10⁶ + ½), IEEE ln identical both engines) so
    the moment sums are exact BIGINT/DEC38 — a raw float Σln would be
    summation-ORDER dependent and break cross-engine hashes. The
    actual median rides the family's 2·median-as-BIGINT trick; σ² =
    (n·Q − S²)/n² in one exact expression.

    Scale: row-local ln + quantize, one source-keyed aggregate with
    map-side partials, source-sized output. The per-source median
    needs the grouped percentile only (bounded groups at any corpus
    size — the same posture as `corpus_mannwhitney`'s rank stage)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("n_chars") > 0
    )
    l_e6 = F.floor(
        F.log(F.col("n_chars").cast("double")) * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    per = docs.select("source", l_e6.alias("l"), "n_chars").groupBy(
        "source"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("l").alias("s"),
        F.sum(F.col("l").cast(_DEC) * F.col("l").cast(_DEC)).alias("q"),
        F.expr("CAST(2 * percentile(n_chars, 0.5D) AS BIGINT)").alias(
            "med2"
        ),
    )
    mu = F.col("s").cast("double") / F.col("n").cast("double") / F.lit(
        1e6
    )
    var = (
        (
            F.col("n").cast(_DEC) * F.col("q")
            - F.col("s").cast(_DEC) * F.col("s").cast(_DEC)
        ).cast("double")
        / (F.col("n").cast("double") * F.col("n").cast("double"))
        / F.lit(1e12)
    )
    implied = F.exp(mu)
    actual = F.col("med2").cast("double") / F.lit(2.0)
    return per.select(
        "source",
        F.col("n").alias("n_docs"),
        stable_round(mu, 6).alias("mu_ln"),
        stable_round(F.sqrt(var), 6).alias("sigma_ln"),
        stable_round(implied, 2).alias("implied_median"),
        actual.alias("actual_median"),
        stable_round(implied / actual, 4).alias("median_ratio"),
    )


ORACLE_LOGNORMAL = f"""
WITH d AS (
  SELECT source,
         CAST(floor(ln(CAST(n_chars AS DOUBLE)) * 1000000.0 + 0.5)
              AS BIGINT) AS l,
         n_chars
  FROM documents WHERE n_chars > 0
), per AS (
  SELECT source, count(*) AS n, sum(l) AS s,
         sum(CAST(l AS HUGEINT) * l) AS q,
         CAST(2 * median(n_chars) AS BIGINT) AS med2
  FROM d GROUP BY 1
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       {sql_stable_round("CAST(s AS DOUBLE) / n / 1e6", 6)} AS mu_ln,
       {sql_stable_round(
           "sqrt(CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE)"
           " / (CAST(n AS DOUBLE) * n) / 1e12)", 6)} AS sigma_ln,
       {sql_stable_round(
           "exp(CAST(s AS DOUBLE) / n / 1e6)", 2)} AS implied_median,
       CAST(med2 AS DOUBLE) / 2.0 AS actual_median,
       {sql_stable_round(
           "exp(CAST(s AS DOUBLE) / n / 1e6)"
           " / (CAST(med2 AS DOUBLE) / 2.0)", 4)} AS median_ratio
FROM per
""".strip()


# ------------------------------------ Hill tail-index estimator


def q_corpus_hill_tail(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HILL tail-index estimate per source (Hill 1975, the standard
    peaks-over-threshold heavy-tail measure): over the exceedances
    above each source's p90 length, α̂ = n_tail / Σ ln(x/u) — small α̂
    (≲2) means a power-law tail heavy enough that MEANS are unstable
    (one document can dominate a token budget; cap or chunk first),
    large α̂ means the tail decays fast and mean-based planning is
    safe. The tail-SHAPE complement of `corpus_lognormal_fit` (body
    shape) and `quality_iqr_outliers` (point outliers).

    Exactness: the threshold is 10·percentile(x, 0.9) as an exact
    BIGINT (linear interpolation at rank 0.9(n−1) yields tenths —
    Spark percentile ≡ DuckDB quantile_cont); each exceedance's
    ln(x/u) quantizes to e6 BEFORE the sum (raw float Σln is
    order-dependent), so α̂ is one division of exact integers.

    Scale: two source-keyed aggregates (threshold, then tail moments
    after a broadcast join-back) with map-side partials; output is
    source-sized."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True).filter(
        F.col("n_chars") > 0
    )
    thr = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.expr("CAST(10 * percentile(n_chars, 0.9D) AS BIGINT)").alias(
            "thr10"
        ),
    )
    j = docs.join(F.broadcast(thr), "source").filter(
        F.col("n_chars") * 10 > F.col("thr10")
    )
    l_e6 = F.floor(
        F.log(
            F.col("n_chars").cast("double") * F.lit(10.0)
            / F.col("thr10").cast("double")
        )
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    tail = j.groupBy("source").agg(
        F.first("n_docs").alias("n_docs"),
        F.first("thr10").alias("thr10"),
        F.count(F.lit(1)).alias("n_tail"),
        F.sum(l_e6).alias("s_l"),
    )
    return tail.select(
        "source",
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("thr10").cast("double") / F.lit(10.0)).alias(
            "threshold_chars"
        ),
        F.col("n_tail").cast("long").alias("n_tail"),
        stable_round(
            F.when(
                F.col("s_l") > 0,
                F.col("n_tail").cast("double")
                * F.lit(1e6)
                / F.col("s_l").cast("double"),
            ),
            4,
        ).alias("hill_alpha"),
    )


ORACLE_HILL = f"""
WITH d AS (
  SELECT source, n_chars FROM documents WHERE n_chars > 0
), thr AS (
  SELECT source, count(*) AS n_docs,
         CAST(10 * quantile_cont(n_chars, 0.9) AS BIGINT) AS thr10
  FROM d GROUP BY 1
), tail AS (
  SELECT d.source, max(t.n_docs) AS n_docs, max(t.thr10) AS thr10,
         count(*) AS n_tail,
         sum(CAST(floor(ln(CAST(d.n_chars AS DOUBLE) * 10.0
                          / CAST(t.thr10 AS DOUBLE))
                        * 1000000.0 + 0.5) AS BIGINT)) AS s_l
  FROM d JOIN thr t USING (source)
  WHERE d.n_chars * 10 > t.thr10
  GROUP BY 1
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(thr10 AS DOUBLE) / 10.0 AS threshold_chars,
       CAST(n_tail AS BIGINT) AS n_tail,
       {sql_stable_round(
           "CASE WHEN s_l > 0 THEN"
           " CAST(n_tail AS DOUBLE) * 1e6 / CAST(s_l AS DOUBLE) END",
           4)} AS hill_alpha
FROM tail
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "metric_anomaly_fdr": q_metric_anomaly_fdr,
    "corpus_lognormal_fit": q_corpus_lognormal_fit,
    "corpus_hill_tail": q_corpus_hill_tail,
    "orders_seasonality_index": q_orders_seasonality_index,
    "revenue_gini_by_nation": q_revenue_gini_by_nation,
    "revenue_theil_by_nation": q_revenue_theil_by_nation,
    "corpus_jarque_bera": q_corpus_jarque_bera,
    "corpus_kendall_tau": q_corpus_kendall_tau,
    "orders_littles_law": q_orders_littles_law,
    "orders_benford": q_orders_benford,
    "events_survival_hazard": q_events_survival_hazard,
    "corpus_spearman": q_corpus_spearman,
    "orders_backlog": q_orders_backlog,
    "corpus_ks_by_source": q_corpus_ks_by_source,
    "lang_source_chi2": q_lang_source_chi2,
    "corpus_mannwhitney": q_corpus_mannwhitney,
    "quality_bootstrap_ci": q_quality_bootstrap_ci,
    "orders_nrr": q_orders_nrr,
    "orders_segment_migration": q_orders_segment_migration,
}

ORACLES: dict[str, str] = {
    "metric_anomaly_fdr": ORACLE_ANOMALY_FDR,
    "corpus_lognormal_fit": ORACLE_LOGNORMAL,
    "corpus_hill_tail": ORACLE_HILL,
    "orders_seasonality_index": ORACLE_SEASONALITY,
    "revenue_gini_by_nation": ORACLE_GINI,
    "revenue_theil_by_nation": ORACLE_THEIL,
    "corpus_jarque_bera": ORACLE_JARQUE_BERA,
    "corpus_kendall_tau": ORACLE_KENDALL_TAU,
    "orders_littles_law": ORACLE_LITTLES_LAW,
    "orders_benford": ORACLE_BENFORD,
    "events_survival_hazard": ORACLE_SURVIVAL,
    "corpus_spearman": ORACLE_SPEARMAN,
    "orders_backlog": ORACLE_BACKLOG,
    "corpus_ks_by_source": ORACLE_KS,
    "lang_source_chi2": ORACLE_CHI2,
    "corpus_mannwhitney": ORACLE_MANNWHITNEY,
    "quality_bootstrap_ci": ORACLE_BOOTSTRAP_CI,
    "orders_nrr": ORACLE_NRR,
    "orders_segment_migration": ORACLE_SEGMENT_MIGRATION,
}
