"""Data-quality audit queries (round 4): cross-fact consistency,
snapshot drift, duplicate-event accounting, PII exposure, embedding
health, and purchase-cadence summaries.

Reference parity: the reference engine (Go, ~/reference) ships no
data-quality surface at all; these extend the audit family
(audit_referential, audit_expectations, profile_documents) with the
checks a production ingest runs continuously. All Spark-first,
oracle-backed, and exact: counts/sums ride as BIGINT (DECIMAL(38,0)
where products can pass 2^63), money in e2/e6 fixed point, every
emitted double is one division of exact integers through the shared
``stable_round`` algebra.

Scale posture: every query is scan → (join on a key) → partial-agg →
tiny shuffle. No global windows over row-scale relations; the one
per-customer window (order gaps) partitions by customer key. PII
regexes run in JVM codegen (``regexp_count``), not Python.
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
from monasca_aggregator_spark.sources.tables import load_table

_DEC = "decimal(38,0)"


def _e2(col: F.Column) -> F.Column:
    return F.floor(col * 100 + F.lit(0.5)).cast("long")


def q_orders_consistency_audit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Cross-fact money reconciliation: recompute every order's total
    from its lineitems — Σ extendedprice·(1−discount)·(1+tax) — and
    report, per order priority, how many orders disagree with the
    stored ``o_totalprice`` and by how much. The books-balance check
    a warehouse runs after every load; TPC-H data generated per spec
    reconciles exactly, so every mismatch is injected corruption.

    Exactness: prices/rates quantized to integer cents/percent
    (e2 = floor(x·100+0.5)), so a line's contribution is the exact
    BIGINT e2·(100−d2)·(100+t2) in e6 fixed point; per-order sums
    accumulate in DECIMAL(38,0). Orders with no lineitems surface in
    ``n_no_lines`` via the left join's null side.
    """
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        (
            _e2(F.col("l_extendedprice"))
            * (F.lit(100) - _e2(F.col("l_discount")))
            * (F.lit(100) + _e2(F.col("l_tax")))
        ).alias("line_e6"),
    )
    per_order = li.groupBy("l_orderkey").agg(
        F.sum(F.col("line_e6").cast(_DEC)).alias("recomputed_e6")
    )
    orders = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("l_orderkey"),
        F.col("o_orderpriority").alias("priority"),
        (_e2(F.col("o_totalprice")) * F.lit(10_000))
        .cast(_DEC)
        .alias("stored_e6"),
    )
    j = orders.join(per_order, "l_orderkey", "left")
    diff = F.col("stored_e6") - F.col("recomputed_e6")
    return (
        j.groupBy("priority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.col("recomputed_e6").isNull().cast("long")
            ).alias("n_no_lines"),
            F.sum(
                (
                    F.col("recomputed_e6").isNotNull() & (diff != 0)
                ).cast("long")
            ).alias("n_mismatched"),
            F.sum(
                F.when(
                    F.col("recomputed_e6").isNotNull(), F.abs(diff)
                ).otherwise(F.lit(0).cast(_DEC))
            ).alias("abs_diff_e6"),
        )
        .select(
            "priority",
            "n_orders",
            "n_no_lines",
            "n_mismatched",
            stable_round(
                F.col("abs_diff_e6").cast("double") / F.lit(1e6), 2
            ).alias("abs_diff_dollars"),
        )
    )


ORACLE_ORDERS_CONSISTENCY = f"""
WITH li AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
         * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
         * (100 + CAST(floor(l_tax * 100 + 0.5) AS BIGINT)) AS line_e6
  FROM lineitem
), per_order AS (
  SELECT l_orderkey, sum(CAST(line_e6 AS HUGEINT)) AS recomputed_e6
  FROM li GROUP BY l_orderkey
), j AS (
  SELECT o.o_orderpriority AS priority,
         CAST(floor(o.o_totalprice * 100 + 0.5) AS HUGEINT) * 10000
           AS stored_e6,
         p.recomputed_e6
  FROM orders o LEFT JOIN per_order p ON o.o_orderkey = p.l_orderkey
)
SELECT priority,
       count(*) AS n_orders,
       CAST(coalesce(sum(CASE WHEN recomputed_e6 IS NULL THEN 1 ELSE 0
         END), 0) AS BIGINT) AS n_no_lines,
       CAST(coalesce(sum(CASE WHEN recomputed_e6 IS NOT NULL
         AND stored_e6 - recomputed_e6 <> 0 THEN 1 ELSE 0 END), 0)
         AS BIGINT) AS n_mismatched,
       {sql_stable_round(
           "CAST(coalesce(sum(CASE WHEN recomputed_e6 IS NOT NULL "
           "THEN abs(stored_e6 - recomputed_e6) ELSE 0 END), 0) "
           "AS DOUBLE) / 1e6", 2)} AS abs_diff_dollars
FROM j
GROUP BY priority
""".strip()


def q_profile_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-over-snapshot profile drift per source: split the
    corpus into two deterministic halves (doc_id parity stands in for
    yesterday/today), profile each half with the SAME one-pass
    aggregate — docs, null texts, distinct langs, exact mean chars —
    and emit the side-by-side readout a nightly data-quality diff
    alerts on. One scan, conditional aggregation (no self-join, no
    second pass).
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    is_new = F.pmod(F.col("doc_id"), F.lit(2)) == 1
    g = docs.groupBy("source").agg(
        F.sum((~is_new).cast("long")).alias("n_old"),
        F.sum(is_new.cast("long")).alias("n_new"),
        F.count_distinct(
            F.when(~is_new, F.col("lang"))
        ).alias("langs_old"),
        F.count_distinct(
            F.when(is_new, F.col("lang"))
        ).alias("langs_new"),
        F.sum(F.when(~is_new, F.col("n_chars"))).alias("chars_old"),
        F.sum(F.when(is_new, F.col("n_chars"))).alias("chars_new"),
    )
    mean_old = F.col("chars_old").cast("double") / F.col("n_old").cast(
        "double"
    )
    mean_new = F.col("chars_new").cast("double") / F.col("n_new").cast(
        "double"
    )
    return g.select(
        "source",
        "n_old",
        "n_new",
        "langs_old",
        "langs_new",
        stable_round(mean_old, 4).alias("mean_chars_old"),
        stable_round(mean_new, 4).alias("mean_chars_new"),
        stable_round(mean_new - mean_old, 4).alias("mean_chars_drift"),
    )


ORACLE_PROFILE_DRIFT = f"""
WITH g AS (
  SELECT source,
         CAST(coalesce(sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END),
           0) AS BIGINT) AS n_old,
         CAST(coalesce(sum(CASE WHEN doc_id % 2 = 1 THEN 1 ELSE 0 END),
           0) AS BIGINT) AS n_new,
         CAST(count(DISTINCT CASE WHEN doc_id % 2 = 0 THEN lang END)
           AS BIGINT) AS langs_old,
         CAST(count(DISTINCT CASE WHEN doc_id % 2 = 1 THEN lang END)
           AS BIGINT) AS langs_new,
         sum(CASE WHEN doc_id % 2 = 0 THEN n_chars END) AS chars_old,
         sum(CASE WHEN doc_id % 2 = 1 THEN n_chars END) AS chars_new
  FROM documents GROUP BY source
)
SELECT source, n_old, n_new, langs_old, langs_new,
       {sql_stable_round(
           "CAST(chars_old AS DOUBLE) / CAST(n_old AS DOUBLE)", 4
       )} AS mean_chars_old,
       {sql_stable_round(
           "CAST(chars_new AS DOUBLE) / CAST(n_new AS DOUBLE)", 4
       )} AS mean_chars_new,
       {sql_stable_round(
           "CAST(chars_new AS DOUBLE) / CAST(n_new AS DOUBLE) - "
           "CAST(chars_old AS DOUBLE) / CAST(n_old AS DOUBLE)", 4
       )} AS mean_chars_drift
FROM g
""".strip()


def q_events_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """At-least-once ingestion accounting per day: how many event rows
    share a (user_id, event_type, ts) identity with another row — the
    redelivery-rate readout that sizes a streaming dedup's state. Two
    partial aggregations (identity → count, then day rollup), both
    map-side combinable; no distinct-on-row-scale shuffle beyond the
    identity key's."""
    ev = load_table(spark, sf_dir, "events")
    per_key = ev.groupBy(
        F.date_trunc("day", F.col("ts")).alias("day"),
        "user_id",
        "event_type",
        "ts",
    ).agg(F.count(F.lit(1)).alias("c"))
    return (
        per_key.groupBy("day")
        .agg(
            F.sum("c").alias("n_events"),
            F.count(F.lit(1)).alias("n_identities"),
            F.sum(F.col("c") - 1).alias("n_redelivered"),
        )
        .select(
            F.unix_millis("day").alias("day_ms"),
            "n_events",
            "n_identities",
            "n_redelivered",
            stable_round(
                F.col("n_redelivered").cast("double")
                / F.col("n_events").cast("double"),
                6,
            ).alias("dup_rate"),
        )
    )


ORACLE_EVENTS_DUP_RATE = f"""
WITH per_key AS (
  SELECT date_trunc('day', ts) AS day, user_id, event_type, ts,
         count(*) AS c
  FROM events GROUP BY 1, 2, 3, 4
)
SELECT CAST(epoch_ms(day) AS BIGINT) AS day_ms,
       CAST(sum(c) AS BIGINT) AS n_events,
       count(*) AS n_identities,
       CAST(sum(c - 1) AS BIGINT) AS n_redelivered,
       {sql_stable_round(
           "CAST(sum(c - 1) AS DOUBLE) / CAST(sum(c) AS DOUBLE)", 6
       )} AS dup_rate
FROM per_key
GROUP BY day
""".strip()


# RE2 (DuckDB) ∩ Java (Spark) compatible patterns — no lookaround, no
# backrefs; \b and bounded classes work identically in both engines.
_PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def q_text_pii_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII exposure report per source: match counts and affected-doc
    counts for email / URL / IPv4 patterns — the measurement pass that
    precedes ``text_scrub``'s redaction (you scrub what you can count).
    All three regexes run JVM-side via ``regexp_count`` in one scan;
    patterns are written in the RE2∩Java dialect so the DuckDB oracle
    evaluates the identical language."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for kind, pat in _PII_PATTERNS.items():
        c = F.regexp_count(F.col("text"), F.lit(pat))
        aggs.append(F.sum(c.cast("long")).alias(f"n_{kind}"))
        aggs.append(
            F.sum((c > 0).cast("long")).alias(f"docs_with_{kind}")
        )
    return docs.groupBy("source").agg(*aggs)


ORACLE_PII_AUDIT = """
SELECT source,
       count(*) AS n_docs,
       CAST(coalesce(sum(len(regexp_extract_all(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'))), 0)
         AS BIGINT) AS n_email,
       CAST(coalesce(sum(CASE WHEN regexp_matches(text,
         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')
         THEN 1 ELSE 0 END), 0) AS BIGINT) AS docs_with_email,
       CAST(coalesce(sum(len(regexp_extract_all(text,
         'https?://[^\\s]+'))), 0) AS BIGINT) AS n_url,
       CAST(coalesce(sum(CASE WHEN regexp_matches(text,
         'https?://[^\\s]+') THEN 1 ELSE 0 END), 0) AS BIGINT)
         AS docs_with_url,
       CAST(coalesce(sum(len(regexp_extract_all(text,
         '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b'))),
         0) AS BIGINT) AS n_ipv4,
       CAST(coalesce(sum(CASE WHEN regexp_matches(text,
         '\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b')
         THEN 1 ELSE 0 END), 0) AS BIGINT) AS docs_with_ipv4
FROM documents
GROUP BY source
""".strip()


def q_embedding_dim_variance(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-dimension embedding health: mean and variance of every
    coordinate — the dead/degenerate-dimension audit run before
    trusting cosine geometry (a near-zero-variance dim adds bias to
    every distance; a huge-variance dim dominates them all). One
    posexplode + one (dim)-keyed partial agg; components quantized to
    e6 integers so both engines sum identical BIGINTs (squares ride
    DECIMAL(38,0) — e6² ≈ 10¹² per row passes 2^63 near 10⁷ rows).

    Output: top-5 highest- and lowest-variance dims (flagged), so the
    result stays bounded regardless of d.
    """
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    flat = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        )
    )
    v6 = F.floor(F.col("v") * 1_000_000 + F.lit(0.5)).cast("long")
    per_dim = flat.select("dim", v6.alias("v6")).groupBy("dim").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("v6").cast(_DEC)).alias("s1"),
        F.sum(
            (F.col("v6").cast(_DEC) * F.col("v6").cast(_DEC))
        ).alias("s2"),
    )
    nd = F.col("n").cast("double")
    mean = F.col("s1").cast("double") / nd / F.lit(1e6)
    var = (
        F.col("s2").cast("double") / nd
        - (F.col("s1").cast("double") / nd) ** 2
    ) / F.lit(1e12)
    stats = per_dim.select(
        "dim",
        "n",
        stable_round(mean, 8).alias("mean"),
        stable_round(var, 8).alias("variance"),
    )
    top = stats.orderBy(F.col("variance").desc(), "dim").limit(5).select(
        F.lit("high").alias("flag"), "dim", "n", "mean", "variance"
    )
    bottom = stats.orderBy(F.col("variance").asc(), "dim").limit(5).select(
        F.lit("low").alias("flag"), "dim", "n", "mean", "variance"
    )
    return top.unionAll(bottom)


ORACLE_EMBEDDING_DIM_VARIANCE = f"""
WITH flat AS (
  SELECT unnest(range(0, len(embedding))) AS dim,
         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5)
           AS BIGINT) AS v6
  FROM embeddings
), per_dim AS (
  SELECT dim, count(*) AS n,
         sum(CAST(v6 AS HUGEINT)) AS s1,
         sum(CAST(v6 AS HUGEINT) * CAST(v6 AS HUGEINT)) AS s2
  FROM flat GROUP BY dim
), stats AS (
  SELECT dim, n,
         {sql_stable_round(
             "CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) / 1e6", 8
         )} AS mean,
         {sql_stable_round(
             "(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) - "
             "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) ^ 2) / 1e12", 8
         )} AS variance
  FROM per_dim
)
SELECT * FROM (
  SELECT 'high' AS flag, dim, n, mean, variance FROM stats
  ORDER BY variance DESC, dim LIMIT 5
)
UNION ALL
SELECT * FROM (
  SELECT 'low' AS flag, dim, n, mean, variance FROM stats
  ORDER BY variance ASC, dim LIMIT 5
)
""".strip()


def q_orders_gap_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Purchase-cadence summary per market segment: each customer's
    inter-order gaps (lag over the per-customer date sequence,
    (date, orderkey) tie-break) roll up to segment-level median/p90 —
    the replenishment-cycle readout behind inventory and CRM timing.
    The window partitions by customer key (no global sort); gaps are
    exact integer days into the interpolated-percentile built-in
    (identical doubles both engines)."""
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.to_date("o_orderdate").alias("d"),
    )
    cust = load_table(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    w = Window.partitionBy("o_custkey").orderBy("d", "o_orderkey")
    gaps = (
        orders.withColumn("prev_d", F.lag("d").over(w))
        .filter(F.col("prev_d").isNotNull())
        .select(
            "o_custkey",
            F.datediff(F.col("d"), F.col("prev_d"))
            .cast("long")
            .alias("gap_d"),
        )
        .join(F.broadcast(cust), "o_custkey")
    )
    return (
        gaps.groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_gaps"),
            F.sum("gap_d").alias("sum_gap_d"),
            stable_round(F.median("gap_d"), 4).alias("median_gap_d"),
            stable_round(
                F.percentile(F.col("gap_d"), F.lit(0.9)), 4
            ).alias("p90_gap_d"),
        )
        .withColumnRenamed("c_mktsegment", "segment")
    )


ORACLE_ORDERS_GAP = f"""
WITH seq AS (
  SELECT o_custkey,
         CAST(o_orderdate AS DATE) AS d,
         lag(CAST(o_orderdate AS DATE)) OVER (
           PARTITION BY o_custkey
           ORDER BY CAST(o_orderdate AS DATE), o_orderkey
         ) AS prev_d
  FROM orders
), gaps AS (
  SELECT s.o_custkey,
         CAST(date_diff('day', s.prev_d, s.d) AS BIGINT) AS gap_d
  FROM seq s WHERE s.prev_d IS NOT NULL
)
SELECT c.c_mktsegment AS segment,
       count(*) AS n_gaps,
       CAST(sum(g.gap_d) AS BIGINT) AS sum_gap_d,
       {sql_stable_round("CAST(median(g.gap_d) AS DOUBLE)", 4)}
         AS median_gap_d,
       {sql_stable_round(
           "CAST(quantile_cont(g.gap_d, 0.9) AS DOUBLE)", 4
       )} AS p90_gap_d
FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
GROUP BY c.c_mktsegment
""".strip()


# ----------------------- language-mix entropy per source (crawl audit)


def q_lang_entropy_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-DIVERSITY audit per source: Shannon entropy of each
    crawl's language mix (nats) plus the dominant language and its
    share — the scalar companion to ``lang_source_chi2``'s full-grid
    independence test ("is this source monolingual or a grab-bag?"
    read per row, not per matrix). H = ln(N) − (Σ n_l·ln n_l)/N with
    every n_l·ln(n_l) term e6-fixed to a BIGINT before the
    order-insensitive sum — the χ² query's pre-rounded-term trick, so
    both engines add identical integers. The relation is |sources| ×
    |langs| aggregates; dominant lang via max_by on the unique
    (count, lang) key."""
    docs = load_table(spark, sf_dir, "documents").select("source", "lang")
    cells = docs.groupBy("source", "lang").agg(
        F.count(F.lit(1)).alias("n_l")
    )
    term6 = F.floor(
        F.col("n_l").cast("double") * F.log(F.col("n_l").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    g = cells.groupBy("source").agg(
        F.sum("n_l").alias("n_docs"),
        F.count(F.lit(1)).alias("n_langs"),
        F.sum(term6).alias("s6"),
        F.max_by("lang", F.struct(F.col("n_l"), F.col("lang"))).alias(
            "top_lang"
        ),
        F.max("n_l").alias("top_n"),
    )
    n = F.col("n_docs").cast("double")
    entropy = F.log(n) - F.col("s6").cast("double") / F.lit(1e6) / n
    return g.select(
        "source",
        "n_docs",
        "n_langs",
        "top_lang",
        stable_round(F.col("top_n").cast("double") / n, 6).alias(
            "top_share"
        ),
        stable_round(entropy, 6).alias("lang_entropy"),
    )


ORACLE_LANG_ENTROPY = f"""
WITH cells AS (
  SELECT source, lang, count(*) AS n_l FROM documents GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY source
             ORDER BY n_l DESC, lang DESC) AS rk
  FROM cells
),
g AS (
  SELECT source,
         sum(n_l) AS n_docs,
         count(*) AS n_langs,
         sum(CAST(floor(CAST(n_l AS DOUBLE) * ln(CAST(n_l AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT)) AS s6,
         max(CASE WHEN rk = 1 THEN lang END) AS top_lang,
         max(n_l) AS top_n
  FROM ranked GROUP BY source
)
SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
       CAST(n_langs AS BIGINT) AS n_langs, top_lang,
       {sql_stable_round(
           "CAST(top_n AS DOUBLE) / CAST(n_docs AS DOUBLE)", 6
       )} AS top_share,
       {sql_stable_round(
           "ln(CAST(n_docs AS DOUBLE))"
           " - CAST(s6 AS DOUBLE) / 1e6 / CAST(n_docs AS DOUBLE)", 6
       )} AS lang_entropy
FROM g
""".strip()


# -------------------- vocabulary Jensen-Shannon divergence per source


_JSD_BUCKETS = 256


def q_text_jsd_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary DIVERGENCE per source: Jensen-Shannon divergence
    (nats, symmetric, bounded by ln 2) between each source's hashed
    unigram distribution and the rest of the corpus — completes the
    shift-detection family per signal: PSI on metric values, KS on doc
    lengths, χ² on language counts, JSD on the VOCABULARY itself (the
    signal that moves when a crawl's content drifts topically).

    Same md5-first-byte 256-bucket hashing as DSIR (SQL-reproducible),
    add-1 smoothing, and every m-, p- and q-side ln term is e6-fixed
    per bucket BEFORE the order-free integer sum:
    JSD = [Σp·ln p + Σq·ln q − 2·Σm·ln m]/2 with m=(p+q)/2 (the
    halved mixture already absorbs the ln 2; identical distributions
    give 0, disjoint supports give ln 2) — expanded so each term is
    one ln of one exact-integer ratio.
    Buckets are 256-row broadcast aggregates per side; the doc scan
    collapses to (source, bucket) counts in one shuffle.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    tb = docs.select(
        "source",
        F.explode(tokens(F.col("text"))).alias("token"),
    ).select(
        "source",
        F.conv(F.substring(F.md5("token"), 1, 2), 16, 10)
        .cast("int")
        .alias("b"),
    )
    # r11 (guide §2.4): ONE corpus explode — the per-bucket totals,
    # grand total and per-source totals all roll up exactly from the
    # cached ≤|sources|×256-row (source, bucket) count table (every
    # token lands in exactly one cell); each previously re-ran the
    # tokenize+explode as its own aggregate (3 corpus passes → 1).
    sb = tb.groupBy("source", "b").agg(
        F.count(F.lit(1)).alias("n_sb")
    ).cache()
    tot_b = sb.groupBy("b").agg(F.sum("n_sb").alias("n_b"))
    grand = sb.agg(F.sum("n_sb").alias("n_all"))
    per_source_tot = sb.groupBy("source").agg(F.sum("n_sb").alias("n_s"))
    full = (
        tot_b.crossJoin(F.broadcast(per_source_tot))
        .join(sb, ["source", "b"], "left")
        .crossJoin(F.broadcast(grand))
        .select(
            "source",
            "b",
            F.coalesce(F.col("n_sb"), F.lit(0)).alias("n_sb"),
            (F.col("n_b") - F.coalesce(F.col("n_sb"), F.lit(0))).alias(
                "n_rb"
            ),
            "n_s",
            (F.col("n_all") - F.col("n_s")).alias("n_r"),
        )
    )
    bkt = F.lit(_JSD_BUCKETS)
    p = (F.col("n_sb") + 1).cast("double") / (F.col("n_s") + bkt).cast(
        "double"
    )
    q = (F.col("n_rb") + 1).cast("double") / (F.col("n_r") + bkt).cast(
        "double"
    )
    m = (p + q) / F.lit(2.0)

    def e6(col):
        return F.floor(col * F.lit(1e6) + F.lit(0.5)).cast("long")

    terms = full.select(
        "source",
        "n_s",
        e6(p * F.log(p)).alias("pl6"),
        e6(q * F.log(q)).alias("ql6"),
        e6(m * F.log(m)).alias("ml6"),
    )
    g = terms.groupBy("source").agg(
        F.max("n_s").alias("n_tokens"),
        F.sum("pl6").alias("sp6"),
        F.sum("ql6").alias("sq6"),
        F.sum("ml6").alias("sm6"),
    )
    jsd = (
        (F.col("sp6") + F.col("sq6") - 2 * F.col("sm6")).cast("double")
        / F.lit(1e6)
        / F.lit(2.0)
    )
    return g.select(
        "source",
        "n_tokens",
        stable_round(jsd, 6).alias("jsd"),
        stable_round(jsd / F.log(F.lit(2.0)), 6).alias("jsd_normalized"),
    )


ORACLE_TEXT_JSD = rf"""
WITH tb AS (
  SELECT source,
         CAST('0x' || substr(md5(unnest(
           string_split_regex(lower(trim(text)), '\s+'))), 1, 2)
           AS INTEGER) AS b
  FROM documents
),
sb AS (SELECT source, b, count(*) AS n_sb FROM tb GROUP BY 1, 2),
tot_b AS (SELECT b, count(*) AS n_b FROM tb GROUP BY 1),
grand AS (SELECT count(*) AS n_all FROM tb),
pst AS (SELECT source, sum(n_sb) AS n_s FROM sb GROUP BY 1),
full_grid AS (
  SELECT p.source, t.b,
         coalesce(s.n_sb, 0) AS n_sb,
         t.n_b - coalesce(s.n_sb, 0) AS n_rb,
         p.n_s, g.n_all - p.n_s AS n_r
  FROM tot_b t CROSS JOIN pst p CROSS JOIN grand g
  LEFT JOIN sb s ON s.source = p.source AND s.b = t.b
),
terms AS (
  SELECT source, n_s,
         CAST(floor((CAST(n_sb + 1 AS DOUBLE) / (n_s + {_JSD_BUCKETS}))
           * ln(CAST(n_sb + 1 AS DOUBLE) / (n_s + {_JSD_BUCKETS}))
           * 1e6 + 0.5) AS BIGINT) AS pl6,
         CAST(floor((CAST(n_rb + 1 AS DOUBLE) / (n_r + {_JSD_BUCKETS}))
           * ln(CAST(n_rb + 1 AS DOUBLE) / (n_r + {_JSD_BUCKETS}))
           * 1e6 + 0.5) AS BIGINT) AS ql6,
         CAST(floor(
           ((CAST(n_sb + 1 AS DOUBLE) / (n_s + {_JSD_BUCKETS})
             + CAST(n_rb + 1 AS DOUBLE) / (n_r + {_JSD_BUCKETS})) / 2.0)
           * ln((CAST(n_sb + 1 AS DOUBLE) / (n_s + {_JSD_BUCKETS})
             + CAST(n_rb + 1 AS DOUBLE) / (n_r + {_JSD_BUCKETS})) / 2.0)
           * 1e6 + 0.5) AS BIGINT) AS ml6
  FROM full_grid
),
g AS (
  SELECT source, max(n_s) AS n_tokens,
         sum(pl6) AS sp6, sum(ql6) AS sq6, sum(ml6) AS sm6
  FROM terms GROUP BY source
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       {sql_stable_round(
           "CAST(sp6 + sq6 - 2 * sm6 AS DOUBLE) / 1e6 / 2.0", 6
       )} AS jsd,
       {sql_stable_round(
           "(CAST(sp6 + sq6 - 2 * sm6 AS DOUBLE) / 1e6 / 2.0)"
           " / ln(2.0)", 6
       )} AS jsd_normalized
FROM g
""".strip()


def q_corpus_checksum_by_source(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Dataset CONTENT FINGERPRINT per source — the reproducibility
    audit a training run ships so "the corpus you trained on is the
    corpus I have" is checkable without sorting or diffing: per
    source, doc count, distinct normalized texts, total chars, and an
    order-free XOR fold of each doc's md5-derived 60-bit content hash.
    Two copies agree iff every component agrees; XOR has multiset
    PARITY semantics (a text appearing twice cancels), which is why
    the fingerprint is the TUPLE with counts, not the xor alone —
    documented contract, same as content-addressable store etags.

    Exactness: the hash is the md5 prefix both engines compute
    identically on the `normalize_text` canonical form (the exact-
    dedup normalization, so the fingerprint is invariant to the same
    cosmetic differences exact dedup ignores). One scan, one bounded
    groupBy; XOR is associative/commutative so the fold is shuffle-
    partial-friendly like any algebraic aggregate."""
    from monasca_aggregator_spark.operators.dedup import normalize_text

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    norm = normalize_text(F.col("text"))
    h = F.conv(F.substring(F.md5(norm), 1, 15), 16, 10).cast("long")
    per = docs.select(
        "source", norm.alias("nt"), h.alias("h"), "n_chars"
    )
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.countDistinct("nt").alias("distinct_texts"),
        F.sum("n_chars").alias("total_chars"),
        F.expr("bit_xor(h)").alias("content_xor"),
    )


ORACLE_CORPUS_CHECKSUM = r"""
WITH n AS (
  SELECT source, n_chars,
         trim(regexp_replace(regexp_replace(lower(text),
              '[^a-z0-9\s]', '', 'g'), '\s+', ' ', 'g')) AS nt
  FROM documents
)
SELECT source, CAST(count(*) AS BIGINT) AS docs,
       CAST(count(DISTINCT nt) AS BIGINT) AS distinct_texts,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       bit_xor(CAST('0x' || substr(md5(nt), 1, 15) AS BIGINT))
         AS content_xor
FROM n GROUP BY source
""".strip()


_SKEW_TOPK = 10


def q_lineitem_key_skew(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JOIN-KEY skew report for the fact table's supplier key — the
    DETECTION counterpart of the salting / AQE-skew-join mitigations
    (tests/test_skew.py): before picking a strategy you measure which
    keys are hot. Top-_SKEW_TOPK hottest l_suppkey values with row
    count, share of the fact table, and hot-over-mean ratio (how many
    average keys' worth of rows the hot key drags through one join
    partition).

    Exactness: counts are exact BIGINTs; share and ratio are one
    division each against the broadcast 1-row grand total. Plan
    shape: one partial-agg groupBy on the key, TakeOrderedAndProject
    for the top-K (never a global sort), rank window over the ≤K-row
    result (the text_vocab_topk bounded-window pattern), 1-row
    broadcast crossJoin for the totals. At 100 TB: the per-key
    relation is dimension-sized, the report is K rows."""
    li = load_table(spark, sf_dir, "lineitem").select("l_suppkey")
    per = li.groupBy("l_suppkey").agg(F.count(F.lit(1)).alias("cnt"))
    tot = per.agg(
        F.sum("cnt").alias("total"),
        F.count(F.lit(1)).alias("n_keys"),
    )
    top = per.orderBy(
        F.col("cnt").desc(), F.col("l_suppkey").asc()
    ).limit(_SKEW_TOPK)
    rk = F.row_number().over(
        Window.orderBy(F.col("cnt").desc(), F.col("l_suppkey").asc())
    )
    return (
        top.crossJoin(F.broadcast(tot))
        .withColumn("rank", rk)
        .select(
            "rank",
            "l_suppkey",
            F.col("cnt").cast("long").alias("cnt"),
            stable_round(
                F.col("cnt").cast("double")
                * F.lit(100.0)
                / F.col("total").cast("double"),
                4,
            ).alias("share_pct"),
            stable_round(
                F.col("cnt").cast("double")
                * F.col("n_keys").cast("double")
                / F.col("total").cast("double"),
                4,
            ).alias("hot_over_mean"),
        )
    )


ORACLE_KEY_SKEW = f"""
WITH per AS (
  SELECT l_suppkey, count(*) AS cnt FROM lineitem GROUP BY 1
), tot AS (
  SELECT sum(cnt) AS total, count(*) AS n_keys FROM per
), top AS (
  SELECT l_suppkey, cnt FROM per
  ORDER BY cnt DESC, l_suppkey ASC LIMIT {_SKEW_TOPK}
)
SELECT row_number() OVER (ORDER BY cnt DESC, l_suppkey ASC) AS rank,
       l_suppkey, CAST(cnt AS BIGINT) AS cnt,
       {sql_stable_round(
           "CAST(cnt AS DOUBLE) * 100.0 / CAST(total AS DOUBLE)", 4
       )} AS share_pct,
       {sql_stable_round(
           "CAST(cnt AS DOUBLE) * CAST(n_keys AS DOUBLE)"
           " / CAST(total AS DOUBLE)", 4
       )} AS hot_over_mean
FROM top CROSS JOIN tot
""".strip()


_DUP_INV_DAYS = 7  # same customer + same cents within this window


def q_orders_duplicate_invoices(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Duplicate-invoice screen — the classic payables audit: pairs of
    orders from the SAME customer with the IDENTICAL total (exact
    integer cents) placed within _DUP_INV_DAYS of each other are
    double-billing suspects. Reported per month of the earlier order:
    suspect pairs, distinct orders involved, and dollars at risk (the
    duplicated side of each pair, exact cents).

    Exactness: totals compare as e2 BIGINTs (never float equality);
    the day distance is an integer datediff; dollars divide once at
    the end. Plan shape: a SELF-JOIN co-partitioned on (custkey,
    price_e2) — the join key includes the exact total, so the shuffle
    matches only genuinely identical amounts and the date window is a
    residual filter; okey_a < okey_b deduplicates pairs. At 100 TB
    the exchange carries one row per order, and the per-key fan-out is
    bounded by how many same-cent orders one customer places in a
    window — the natural audit cardinality."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_custkey",
        _e2(F.col("o_totalprice")).alias("price_e2"),
        F.to_date("o_orderdate").alias("d"),
    )
    a, b = o.alias("a"), o.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_custkey") == F.col("b.o_custkey"))
        & (F.col("a.price_e2") == F.col("b.price_e2"))
        & (F.col("a.o_orderkey") < F.col("b.o_orderkey"))
        & (
            F.abs(F.datediff(F.col("b.d"), F.col("a.d")))
            <= F.lit(_DUP_INV_DAYS)
        ),
    ).select(
        F.date_format(
            F.least(F.col("a.d"), F.col("b.d")), "yyyy-MM"
        ).alias("month"),
        F.col("a.o_orderkey").alias("k1"),
        F.col("b.o_orderkey").alias("k2"),
        F.col("a.price_e2").alias("price_e2"),
    )
    return pairs.groupBy("month").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.size(
            F.array_distinct(
                F.flatten(
                    F.collect_list(F.array(F.col("k1"), F.col("k2")))
                )
            )
        )
        .cast("long")
        .alias("n_orders_involved"),
        stable_round(
            F.sum("price_e2").cast("double") / F.lit(100.0), 2
        ).alias("dollars_at_risk"),
    )


ORACLE_DUP_INVOICES = f"""
WITH o AS (
  SELECT o_orderkey, o_custkey,
         CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS price_e2,
         CAST(o_orderdate AS DATE) AS d
  FROM orders
), pairs AS (
  SELECT strftime(least(a.d, b.d), '%Y-%m') AS month,
         a.o_orderkey AS k1, b.o_orderkey AS k2, a.price_e2
  FROM o a JOIN o b
    ON a.o_custkey = b.o_custkey AND a.price_e2 = b.price_e2
   AND a.o_orderkey < b.o_orderkey
   AND abs(date_diff('day', a.d, b.d)) <= {_DUP_INV_DAYS}
)
SELECT month, CAST(count(*) AS BIGINT) AS n_pairs,
       CAST(len(list_distinct(flatten(list([k1, k2])))) AS BIGINT)
         AS n_orders_involved,
       {sql_stable_round("CAST(sum(price_e2) AS DOUBLE) / 100.0", 2)}
         AS dollars_at_risk
FROM pairs GROUP BY month
""".strip()


# ------------------------------------ Burrows' Delta stylometry

_BURROWS_K = 30  # most-frequent corpus words ("function words")


def q_corpus_burrows_delta(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Burrows' DELTA between every source pair (Burrows 2002, the
    standard stylometric distance): z-score each source's relative
    frequency of the corpus's top-30 words (high-frequency words ≈
    function words — style carriers, not topic carriers), Delta(a,b)
    = mean |z_a − z_b|. Two crawls of the same underlying site read
    as near-zero Delta even when topics differ; a source whose
    "style" sits far from every other is machine-generated or a
    different register — the STYLE face of the divergence family
    (`text_jsd_by_source` measures vocabulary mix, this measures how
    the shared vocabulary is USED).

    Exactness: relative frequencies quantize to e9 by integer
    division (count·10⁹ div total); z = (S·f − T)/√(S·Q − T²) from
    exact BIGINT/DEC38 moments over the dense source×word grid
    (missing words count 0 — absence is a stylistic signal), then
    e6-quantized before the pairwise sums so Delta is an integer sum
    into ONE division. Zero-variance words are excluded (reported in
    n_words).

    Scale: token counts are a vocabulary-bounded aggregate with
    map-side partials; the top-K word list broadcasts; everything
    after lives on the |sources|×30 grid and the |sources|² pair
    table."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select(
        "source", F.explode(tokens(F.col("text"))).alias("w")
    ).filter(F.col("w") != "")
    # r11 optimization (guide §2.4): counts (vocab×source aggregate)
    # feeds top/totals/grid, the ≤|sources|·30 grid feeds stats+z, and
    # z self-joins — materialize each bounded relation once instead of
    # re-running the corpus explode per branch (94-Exchange plan → 8).
    counts = toks.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    top = (
        counts.groupBy("w")
        .agg(F.sum("c").alias("tc"))
        .orderBy(F.col("tc").desc(), F.col("w"))
        .limit(_BURROWS_K)
        .select("w")
    )
    totals = counts.groupBy("source").agg(F.sum("c").alias("tot"))
    grid = (
        totals.crossJoin(F.broadcast(top))
        .join(counts, ["source", "w"], "left")
        .select(
            "source",
            "w",
            F.expr(
                "coalesce(c, 0) * 1000000000 div tot"
            ).alias("f"),
        )
    ).cache()
    stats = grid.groupBy("w").agg(
        F.count(F.lit(1)).alias("s"),
        F.sum("f").alias("t"),
        F.sum(F.col("f").cast(_DEC) * F.col("f").cast(_DEC)).alias("q"),
    )
    den = (
        F.col("s").cast(_DEC) * F.col("q")
        - F.col("t").cast(_DEC) * F.col("t").cast(_DEC)
    ).cast("double")
    z = grid.join(F.broadcast(stats), "w").filter(den > 0).select(
        "source",
        "w",
        F.floor(
            (
                F.col("s").cast(_DEC) * F.col("f").cast(_DEC)
                - F.col("t").cast(_DEC)
            ).cast("double")
            / F.sqrt(den)
            * F.lit(1_000_000.0)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("z_e6"),
    ).cache()
    zb = z.select(
        F.col("source").alias("source_b"),
        "w",
        F.col("z_e6").alias("zb_e6"),
    )
    pairs = (
        z.join(zb, "w")
        .filter(F.col("source") < F.col("source_b"))
        .groupBy(
            F.col("source").alias("source_a"), F.col("source_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_words"),
            F.sum(F.abs(F.col("z_e6") - F.col("zb_e6"))).alias(
                "sum_dz"
            ),
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        F.col("n_words").cast("long").alias("n_words"),
        stable_round(
            F.col("sum_dz").cast("double")
            / F.col("n_words").cast("double")
            / F.lit(1e6),
            6,
        ).alias("delta"),
    )


ORACLE_BURROWS = rf"""
WITH toks AS (
  SELECT source, unnest(string_split_regex(lower(trim(text)), '\s+'))
           AS w
  FROM documents
), counts AS (
  SELECT source, w, count(*) AS c FROM toks WHERE w <> ''
  GROUP BY 1, 2
), top AS (
  SELECT w FROM (
    SELECT w, sum(c) AS tc FROM counts GROUP BY 1
  ) ORDER BY tc DESC, w LIMIT {_BURROWS_K}
), totals AS (
  SELECT source, sum(c) AS tot FROM counts GROUP BY 1
), grid AS (
  SELECT t.source, p.w,
         (coalesce(c.c, 0) * 1000000000) // t.tot AS f
  FROM totals t CROSS JOIN top p
  LEFT JOIN counts c ON c.source = t.source AND c.w = p.w
), stats AS (
  SELECT w, count(*) AS s, sum(f) AS t,
         sum(CAST(f AS HUGEINT) * f) AS q
  FROM grid GROUP BY 1
), z AS (
  SELECT g.source, g.w,
         CAST(floor(CAST(st.s * CAST(g.f AS HUGEINT) - st.t AS DOUBLE)
                    / sqrt(CAST(st.s * st.q
                                - CAST(st.t AS HUGEINT) * st.t
                                AS DOUBLE))
                    * 1000000.0 + 0.5) AS BIGINT) AS z_e6
  FROM grid g JOIN stats st USING (w)
  WHERE CAST(st.s * st.q - CAST(st.t AS HUGEINT) * st.t AS DOUBLE) > 0
)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(count(*) AS BIGINT) AS n_words,
       {sql_stable_round(
           "CAST(sum(abs(a.z_e6 - b.z_e6)) AS DOUBLE)"
           " / count(*) / 1e6", 6)} AS delta
FROM z a JOIN z b ON a.w = b.w AND a.source < b.source
GROUP BY 1, 2
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "corpus_burrows_delta": q_corpus_burrows_delta,
    "corpus_checksum_by_source": q_corpus_checksum_by_source,
    "orders_duplicate_invoices": q_orders_duplicate_invoices,
    "lineitem_key_skew": q_lineitem_key_skew,
    "lang_entropy_by_source": q_lang_entropy_by_source,
    "text_jsd_by_source": q_text_jsd_by_source,
    "orders_consistency_audit": q_orders_consistency_audit,
    "profile_drift": q_profile_drift,
    "events_dup_rate": q_events_dup_rate,
    "text_pii_audit": q_text_pii_audit,
    "embedding_dim_variance": q_embedding_dim_variance,
    "orders_gap_summary": q_orders_gap_summary,
}

ORACLES: dict[str, str] = {
    "corpus_burrows_delta": ORACLE_BURROWS,
    "corpus_checksum_by_source": ORACLE_CORPUS_CHECKSUM,
    "orders_duplicate_invoices": ORACLE_DUP_INVOICES,
    "lineitem_key_skew": ORACLE_KEY_SKEW,
    "lang_entropy_by_source": ORACLE_LANG_ENTROPY,
    "text_jsd_by_source": ORACLE_TEXT_JSD,
    "orders_consistency_audit": ORACLE_ORDERS_CONSISTENCY,
    "profile_drift": ORACLE_PROFILE_DRIFT,
    "events_dup_rate": ORACLE_EVENTS_DUP_RATE,
    "text_pii_audit": ORACLE_PII_AUDIT,
    "embedding_dim_variance": ORACLE_EMBEDDING_DIM_VARIANCE,
    "orders_gap_summary": ORACLE_ORDERS_GAP,
}
