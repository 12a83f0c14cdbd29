"""Warehouse-pattern queries: incremental view maintenance, sweep-line
concurrency, association rules, triangle counting, SCD2 intervals.

Five classic relational/ETL shapes a team replacing the reference's
single-purpose aggregator (/root/reference/server.go) with a general
engine will ask for next.  Each is expressed so the expensive part is
a single keyed shuffle over data that has already been collapsed or
blocked, and each is exact-integer (or whole-number double) so the
DuckDB oracle hashes match:

- `agg_incremental_rollup`: algebraic partial-aggregate MERGE — update
  a materialized hourly rollup from a delta batch without rescanning
  the base (the batch mirror of streaming/pipeline.py's stage-2
  publish; pairs with sinks.py's dynamic partition overwrite).
- `sessions_concurrency`: max concurrent user sessions per hour via a
  +1/−1 boundary sweep (RANGE-framed running sum — deterministic under
  ties where a ROWS frame is not).
- `events_assoc_rules`: pairwise event-type association (support /
  confidence / lift) over (user, day) baskets — the self-join is
  bounded by the item vocabulary, not the corpus.
- `graph_triangles`: per-document triangle participation in the exact
  near-dup pair graph — triangle enumeration joins ORIENTED edges
  (lower id → higher id) so each triangle is generated exactly once
  and hub vertices don't explode the join.
- `scd2_user_tier`: slowly-changing-dimension type-2 intervals from an
  event stream (change detection + lead() interval close — the
  point-in-time dimension table an as-of join consumes).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.operators import dedup as D
from monasca_aggregator_spark.operators.asof import asof_join
from monasca_aggregator_spark.plans.dedup import _NGRAM_CTES, THRESHOLD
from monasca_aggregator_spark.sources.tables import load_table

_HOUR_MS = 3600 * 1000
_W_SQL = f"(epoch_ms(ts) // {_HOUR_MS}) * {_HOUR_MS}"


def _hourly_window() -> F.Column:
    return (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
        * F.lit(_HOUR_MS)
    ).alias("window_ts_ms")


# -------------------------------------- incremental rollup maintenance

# base/delta split point: day 24 of the 30-day corpus (2024-01-24T00Z)
_IVM_CUTOFF_MS = 1_706_054_400_000


def q_agg_incremental_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental view maintenance for the hourly rollup: the
    materialized BASE aggregate (events before the cutoff) is updated
    with a DELTA batch (events at/after it) by merging algebraic
    partials — (sum, count) re-aggregate exactly; avg is derived at
    read time, never averaged-of-averages (same discipline as
    `metric_retention_tiers`).

    The base raw events are NEVER rescanned: each side collapses to
    per-(metric, hour) partials in its own single shuffle, and the
    merge aggregates the union of two already-tiny partial tables. In
    production the delta touches only its own hour-partitions, so the
    merge is a dynamic-partition-overwrite of just those partitions
    (sources/sinks.py `merge_upsert`); windows untouched by the delta
    carry over byte-identical — the property the oracle asserts by
    recomputing the rollup from the full raw history.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "event_type",
        "ts",
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    cutoff = F.lit(_IVM_CUTOFF_MS)

    def partials(df: DataFrame) -> DataFrame:
        return df.groupBy(F.col("event_type"), _hourly_window()).agg(
            F.sum("e2").alias("s1"), F.count(F.lit(1)).alias("cnt")
        )

    base = partials(ev.filter(F.unix_millis(F.col("ts")) < cutoff))
    delta = partials(ev.filter(F.unix_millis(F.col("ts")) >= cutoff))
    merged = (
        base.unionByName(delta)
        .groupBy("event_type", "window_ts_ms")
        .agg(F.sum("s1").alias("s1"), F.sum("cnt").alias("cnt"))
    )
    return merged.select(
        "event_type",
        "window_ts_ms",
        F.col("cnt").alias("n"),
        (F.col("s1").cast("double") / F.lit(100.0)).alias("sum_value"),
        (
            F.col("s1").cast("double")
            / (F.col("cnt") * F.lit(100)).cast("double")
        ).alias("avg_value"),
    )


ORACLE_INCREMENTAL_ROLLUP = f"""
SELECT event_type, {_W_SQL} AS window_ts_ms,
       count(*) AS n,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / 100.0 AS sum_value,
       CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE)
         / CAST(count(*) * 100 AS DOUBLE) AS avg_value
FROM events GROUP BY 1, 2
""".strip()


# ------------------------------------------- sessions concurrency sweep

_GAP_MS = 30 * 60 * 1000  # session gap, matches plans/temporal.py


def q_sessions_concurrency(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Max CONCURRENT user sessions per hour — capacity planning's
    question, which per-window counts can't answer (a count of 50
    sessions/hour may be 50 sequential or 50 simultaneous).

    Sessions are the gap-based islands of `sessions_user` (30 min);
    each [start, end] emits +1 at start and −1 at end+1ms (inclusive
    overlap), and concurrency is the running sum over the boundary
    stream.  Tie handling matches a RANGE frame: boundaries at the
    same millisecond are collapsed to ONE net delta first (groupBy
    b_ms), so every sampled point sees the post-tie total and the
    result is deterministic under ties.  Reported per hour as the max
    over that hour's session-start points (hours without boundaries
    inherit no row — interior hours of long sessions are bounded by
    the session-gap rule anyway).

    Scale: the running sum is the DISTRIBUTED prefix-sum operator
    (operators/rank.global_cumsum, day-bucketed: per-day local cumsum
    + broadcast offsets from the ≤ #days-row histogram) — the
    boundary stream never funnels through one task, unlike a bare
    ``sum() OVER (ORDER BY b_ms)``.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.unix_millis(F.col("ts")).alias("ts_ms")
    )
    uw = Window.partitionBy("user_id").orderBy("ts_ms")
    new_sess = F.when(
        F.lag("ts_ms").over(uw).isNull()
        | (F.col("ts_ms") - F.lag("ts_ms").over(uw) > F.lit(_GAP_MS)),
        F.lit(1),
    ).otherwise(F.lit(0))
    marked = ev.withColumn("is_new", new_sess).withColumn(
        "sess_id",
        F.sum("is_new").over(
            Window.partitionBy("user_id")
            .orderBy("ts_ms")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    sessions = marked.groupBy("user_id", "sess_id").agg(
        F.min("ts_ms").alias("start_ms"), F.max("ts_ms").alias("end_ms")
    )
    # r11 (guide §2.4): both boundaries explode out of ONE pass over
    # the sessionization (the start/end unionByName re-ran the
    # scan+windows+groupBy per branch); same (b_ms, delta) multiset.
    bounds = sessions.select(
        F.explode(
            F.array(
                F.struct(
                    F.col("start_ms").alias("b_ms"),
                    F.lit(1).alias("delta"),
                ),
                F.struct(
                    (F.col("end_ms") + F.lit(1)).alias("b_ms"),
                    F.lit(-1).alias("delta"),
                ),
            )
        ).alias("e")
    ).select("e.b_ms", "e.delta")
    from monasca_aggregator_spark.operators.rank import global_cumsum

    # collapse same-ms boundaries to one net delta: a ROWS cumsum over
    # the collapsed stream ≡ the RANGE-frame sweep at every point.
    # Cached (r11): global_cumsum reads it twice (local cumsum +
    # day-bucket histogram); it is the collapsed boundary histogram.
    per_ms = bounds.groupBy("b_ms").agg(
        F.sum("delta").alias("net"),
        F.max((F.col("delta") == 1).cast("int")).alias("has_start"),
    ).cache()
    sweep = global_cumsum(
        per_ms,
        F.floor(F.col("b_ms") / F.lit(86_400_000)).cast("long"),
        [F.col("b_ms").asc()],
        F.col("net"),
        cum_col="conc",
    )
    return (
        sweep.filter(F.col("has_start") == 1)  # sample at session starts
        .groupBy(
            (
                (F.col("b_ms") / F.lit(_HOUR_MS)).cast("long")
                * F.lit(_HOUR_MS)
            ).alias("window_ts_ms")
        )
        .agg(F.max("conc").alias("max_concurrent"))
    )


ORACLE_SESSIONS_CONCURRENCY = f"""
WITH e AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms FROM events
), m AS (
  SELECT user_id, ts_ms,
         CASE WHEN lag(ts_ms) OVER w IS NULL
                OR ts_ms - lag(ts_ms) OVER w > {_GAP_MS}
              THEN 1 ELSE 0 END AS is_new
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms)
), s AS (
  SELECT user_id, ts_ms,
         sum(is_new) OVER (PARTITION BY user_id ORDER BY ts_ms
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS sess_id
  FROM m
), sess AS (
  SELECT user_id, sess_id, min(ts_ms) AS start_ms, max(ts_ms) AS end_ms
  FROM s GROUP BY 1, 2
), b AS (
  SELECT start_ms AS b_ms, 1 AS delta FROM sess
  UNION ALL
  SELECT end_ms + 1, -1 FROM sess
), sweep AS (
  SELECT b_ms, delta,
         sum(delta) OVER (ORDER BY b_ms RANGE BETWEEN UNBOUNDED
                          PRECEDING AND CURRENT ROW) AS conc
  FROM b
)
SELECT (b_ms // {_HOUR_MS}) * {_HOUR_MS} AS window_ts_ms,
       CAST(max(conc) AS BIGINT) AS max_concurrent
FROM sweep WHERE delta = 1 GROUP BY 1
""".strip()


# --------------------------------------------- association rules (lift)


def q_events_assoc_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise event-type association over (user, day) baskets:
    support, directional confidence, and lift for every type pair —
    "do users who error on a day also purchase that day?".

    Baskets collapse to distinct (user, day, type) first (one
    shuffle); the pair join is per-basket and bounded by the item
    VOCABULARY (|types|² pairs max per basket), not the corpus — the
    a<b orientation halves it and dedupes mirror pairs.  Single-item
    and basket totals are broadcast back; every ratio is a division
    of exact BIGINT counts.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        F.date_trunc("DAY", F.col("ts")).alias("day"),
        F.col("event_type"),
    )
    # r11 (guide §2.4): the distinct basket-item relation feeds the
    # basket total, the single-item counts and BOTH pair-join sides —
    # uncached, the corpus scan+distinct re-executed 5×; cache the
    # collapsed (user, day, type) relation once.
    items = ev.distinct().cache()
    n_baskets = items.select("user_id", "day").distinct().agg(
        F.count(F.lit(1)).alias("n_baskets")
    )  # 1-row broadcast, not a driver-side count()
    singles = items.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_single")
    )
    a = items.select(
        "user_id", "day", F.col("event_type").alias("type_a")
    )
    b = items.select(
        "user_id", "day", F.col("event_type").alias("type_b")
    )
    pairs = (
        a.join(b, ["user_id", "day"])
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = singles.select(
        F.col("event_type").alias("type_a"),
        F.col("n_single").alias("n_a"),
    )
    nb = singles.select(
        F.col("event_type").alias("type_b"),
        F.col("n_single").alias("n_b"),
    )
    out = (
        pairs.join(F.broadcast(na), "type_a")
        .join(F.broadcast(nb), "type_b")
        .crossJoin(F.broadcast(n_baskets))
    )
    dbl = lambda c: F.col(c).cast("double")  # noqa: E731
    return out.select(
        "type_a",
        "type_b",
        "n_a",
        "n_b",
        "n_both",
        (dbl("n_both") / dbl("n_baskets")).alias("support"),
        (dbl("n_both") / dbl("n_a")).alias("conf_a_to_b"),
        (dbl("n_both") / dbl("n_b")).alias("conf_b_to_a"),
        (
            dbl("n_both") * dbl("n_baskets") / (dbl("n_a") * dbl("n_b"))
        ).alias("lift"),
    )


ORACLE_ASSOC_RULES = """
WITH items AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS day, event_type
  FROM events
), nb AS (
  SELECT count(*) AS n FROM (SELECT DISTINCT user_id, day FROM items)
), singles AS (
  SELECT event_type, count(*) AS n_single FROM items GROUP BY 1
), pairs AS (
  SELECT a.event_type AS type_a, b.event_type AS type_b,
         count(*) AS n_both
  FROM items a
  JOIN items b ON b.user_id = a.user_id AND b.day = a.day
              AND a.event_type < b.event_type
  GROUP BY 1, 2
)
SELECT p.type_a, p.type_b,
       sa.n_single AS n_a, sb.n_single AS n_b, p.n_both,
       CAST(p.n_both AS DOUBLE) / CAST(nb.n AS DOUBLE) AS support,
       CAST(p.n_both AS DOUBLE) / CAST(sa.n_single AS DOUBLE)
         AS conf_a_to_b,
       CAST(p.n_both AS DOUBLE) / CAST(sb.n_single AS DOUBLE)
         AS conf_b_to_a,
       CAST(p.n_both AS DOUBLE) * CAST(nb.n AS DOUBLE)
         / (CAST(sa.n_single AS DOUBLE) * CAST(sb.n_single AS DOUBLE))
         AS lift
FROM pairs p
JOIN singles sa ON sa.event_type = p.type_a
JOIN singles sb ON sb.event_type = p.type_b
CROSS JOIN nb
""".strip()


# ------------------------------------------------- triangle counting


def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document triangle participation in the exact near-dup pair
    graph (the `dedup_ngram_jaccard` edges) — triangle density
    separates a tight duplicate CLIQUE (template spam) from a loose
    chain of pairwise-similars, which connected components
    (`dedup_clusters`) cannot distinguish.

    Enumeration joins ORIENTED edges (doc_id low → high): wedges
    a<b<c from (a,b)⋈(b,c), closed against the oriented edge (a,c),
    so each triangle is produced exactly once and a hub vertex only
    fans out to its HIGHER-id neighbors — at scale the orientation is
    by degree (join the degree table, order (deg, id)), which bounds
    wedge fan-out by arboricity instead of max-degree; id-order keeps
    the oracle's enumeration identical here.  Edges are a collapsed
    pair table, orders of magnitude smaller than the corpus.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    pairs = D.ngram_jaccard_pairs(docs, threshold=THRESHOLD).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )  # already oriented a < b
    # the wedge + closure reference `pairs` three times and Spark does
    # not dedupe common subplans across self-joins — without a cache
    # the expensive shingle join runs 3x. The pair table is the
    # collapsed edge list (tiny vs the corpus), so caching it is the
    # bounded-state choice at any scale.
    pairs = pairs.cache()
    e1 = pairs.select(F.col("a"), F.col("b").alias("m"))
    e2 = pairs.select(F.col("a").alias("m"), F.col("b").alias("c"))
    wedges = e1.join(e2, "m").select("a", "m", "c")
    tris = wedges.join(
        pairs.select(
            F.col("a").alias("a"), F.col("b").alias("c")
        ).withColumn("closed", F.lit(1)),
        ["a", "c"],
    )
    per_vertex = (
        tris.select(F.col("a").alias("doc_id"))
        .unionByName(tris.select(F.col("m").alias("doc_id")))
        .unionByName(tris.select(F.col("c").alias("doc_id")))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    return per_vertex


ORACLE_TRIANGLES = f"""
WITH {_NGRAM_CTES}, e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
), tri AS (
  SELECT e1.a, e1.b AS m, e2.b AS c
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), v AS (
  SELECT a AS doc_id FROM tri
  UNION ALL SELECT m FROM tri
  UNION ALL SELECT c FROM tri
)
SELECT doc_id, count(*) AS n_triangles FROM v GROUP BY 1
""".strip()


def q_graph_clustering(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GLOBAL clustering coefficient (transitivity) of the exact
    near-dup pair graph (r8) — one scalar row that separates clique-y
    duplication (template spam: most wedges close) from chain-y
    duplication (drifting revisions: few close):
    C = 3·triangles / wedges, wedges = Σ_v deg_v·(deg_v−1)/2.

    Complements `graph_triangles` (per-node counts) and
    `graph_degree_hist` (degree shape) with the closure RATE. Degrees
    come from one groupBy over the collapsed edge list; triangles
    reuse the oriented a<b<c wedge-closure join. Everything after
    pair generation is edge-table-sized."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    pairs = D.ngram_jaccard_pairs(docs, threshold=THRESHOLD).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    pairs = pairs.cache()
    deg = (
        pairs.select(F.col("a").alias("v"))
        .unionByName(pairs.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedge_tot = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(F.expr("d * (d - 1) div 2")).alias("n_wedges"),
    )
    e1 = pairs.select(F.col("a"), F.col("b").alias("m"))
    e2 = pairs.select(F.col("a").alias("m"), F.col("b").alias("c"))
    tri_cnt = (
        e1.join(e2, "m")
        .join(
            pairs.select(F.col("a"), F.col("b").alias("c")),
            ["a", "c"],
        )
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    edges_cnt = pairs.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        wedge_tot.crossJoin(F.broadcast(edges_cnt))
        .crossJoin(F.broadcast(tri_cnt))
        .select(
            "n_nodes",
            "n_edges",
            "n_wedges",
            "n_triangles",
            F.when(
                F.col("n_wedges") > 0,
                stable_round(
                    F.lit(3.0)
                    * F.col("n_triangles").cast("double")
                    / F.col("n_wedges").cast("double"),
                    6,
                ),
            ).alias("transitivity"),
        )
    )


ORACLE_CLUSTERING = f"""
WITH {_NGRAM_CTES}, e AS (
  SELECT id_a AS a, id_b AS b FROM pairs
), deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM e UNION ALL SELECT b FROM e
  ) GROUP BY 1
), w AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(d * (d - 1) // 2) AS BIGINT) AS n_wedges
  FROM deg
), t AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM e e1
  JOIN e e2 ON e2.a = e1.b
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
), ec AS (
  SELECT CAST(count(*) AS BIGINT) AS n_edges FROM e
)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0 THEN
         {sql_stable_round(
             "3.0 * CAST(n_triangles AS DOUBLE) / CAST(n_wedges AS DOUBLE)",
             6)}
       END AS transitivity
FROM w, t, ec
""".strip()


# ------------------------------------------------------ SCD2 intervals

_TIER_DIV = 25  # props.k (0..99) → tiers 0..3


def q_scd2_user_tier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 build from the event stream:
    each user's tier (props.k ÷ 25) becomes [valid_from, valid_to)
    intervals — the point-in-time dimension table that an as-of join
    (`asof_purchase_click`) or temporal query consumes.

    Change detection per user over (ts, event_id)-ordered events (the
    event_id tiebreak makes the order TOTAL, so change rows are
    deterministic under same-ms events); interval close via lead().
    The open current interval reports NULL valid_to.  One shuffle
    keyed by user; the dimension output is |changes| rows, not
    |events|.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        # floor-division on BOTH engines: a bare CAST(double AS INT)
        # truncates in Spark but ROUNDS in DuckDB
        F.floor(
            F.from_json(F.col("props"), "k INT").getField("k")
            / F.lit(_TIER_DIV)
        )
        .cast("int")
        .alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    changes = ev.withColumn("prev_tier", F.lag("tier").over(w)).filter(
        F.col("prev_tier").isNull()
        | (F.col("tier") != F.col("prev_tier"))
    )
    cw = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    return changes.select(
        "user_id",
        "tier",
        F.col("ts_ms").alias("valid_from_ms"),
        F.lead("ts_ms").over(cw).alias("valid_to_ms"),
    )


ORACLE_SCD2 = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)
              // {_TIER_DIV} AS INTEGER) AS tier
  FROM events
), c AS (
  SELECT *, lag(tier) OVER w AS prev_tier
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
), ch AS (
  SELECT user_id, tier, ts_ms, event_id FROM c
  WHERE prev_tier IS NULL OR tier <> prev_tier
)
SELECT user_id, tier, ts_ms AS valid_from_ms,
       lead(ts_ms) OVER (PARTITION BY user_id
                         ORDER BY ts_ms, event_id) AS valid_to_ms
FROM ch
""".strip()


# -------------------------------------------- referential integrity


def q_audit_referential(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan-FK counts for
    every edge of the TPC-H-ish schema (lineitem→orders/part/supplier,
    orders→customer, customer→nation, supplier→nation) — the
    ingestion gate a pipeline runs BEFORE joins silently drop rows
    (an inner join "losing" 2% of revenue is this audit's failure
    mode surfacing downstream).

    Each edge is one LEFT ANTI join: dimension keys project to a
    single column (broadcast for nation/customer/supplier-sized
    sides), facts shuffle at most once on the FK. Output is one row
    per edge: total rows, orphan rows, orphan fraction (exact-integer
    division) — a fixed-size report regardless of corpus size.
    """
    # r11 optimization (guide §2.3): ONE scan per fact table computes
    # every outgoing edge's total + orphan count in a single aggregate
    # (broadcast left joins against deduped match-marked key sets
    # preserve row counts exactly), instead of 2 scans per edge — the
    # lineitem side drops from 6 scans to 1.
    by_fact: dict[str, list[tuple[str, str, str]]] = {
        "lineitem": [
            ("l_orderkey", "orders", "o_orderkey"),
            ("l_partkey", "part", "p_partkey"),
            ("l_suppkey", "supplier", "s_suppkey"),
        ],
        "orders": [("o_custkey", "customer", "c_custkey")],
        "customer": [("c_nationkey", "nation", "n_nationkey")],
        "supplier": [("s_nationkey", "nation", "n_nationkey")],
    }
    parts = []
    for fact, edges in by_fact.items():
        f = load_table(spark, sf_dir, fact).select(
            *[F.col(fk) for fk, _, _ in edges]
        )
        for i, (fk, dim, pk) in enumerate(edges):
            # r12 (guide §2.4, measured): no dedup of the dim key —
            # every edge targets the dim's PRIMARY KEY (unique by the
            # schema contract; enforcing that is audit_expectations'
            # unique-rule business, not this edge audit's), and the
            # DuckDB oracle joins the raw dim table the same way. The
            # distinct was one full exchange per edge — 7 exchanges,
            # ~0.4 s each at sf0.1 for the orders key alone.
            d = (
                load_table(spark, sf_dir, dim)
                .select(F.col(pk).alias(f"_k{i}"))
                .withColumn(f"_m{i}", F.lit(1))
            )
            f = f.join(
                F.broadcast(d), F.col(fk) == F.col(f"_k{i}"), "left"
            )
        agg = f.agg(
            F.count(F.lit(1)).alias("n_rows"),
            *[
                F.count(F.when(F.col(f"_m{i}").isNull(), 1)).alias(
                    f"_o{i}"
                )
                for i in range(len(edges))
            ],
        )
        # r12 (guide §1.2): the edge rows derive from the one agg row
        # via inline() INSIDE the same plan — the r11 shape cached the
        # 1-row agg and selected it once per edge, paying a cache
        # materialization job per fact every run under the clearCache
        # protocol. One linear pipeline per fact, no InMemoryRelation.
        parts.append(
            agg.select(
                F.inline(
                    F.array(
                        *[
                            F.struct(
                                F.lit(
                                    f"{fact}.{fk}->{dim}.{pk}"
                                ).alias("fk_edge"),
                                F.col("n_rows").alias("n_rows"),
                                F.col(f"_o{i}").alias("n_orphans"),
                                (
                                    F.col(f"_o{i}").cast("double")
                                    / F.col("n_rows").cast("double")
                                ).alias("orphan_frac"),
                            )
                            for i, (fk, dim, pk) in enumerate(edges)
                        ]
                    )
                )
            )
        )
    out = parts[0]
    for p_df in parts[1:]:
        out = out.unionByName(p_df)
    return out


ORACLE_AUDIT_REFERENTIAL = """
WITH e AS (
  SELECT 'lineitem.l_orderkey->orders.o_orderkey' AS fk_edge,
         (SELECT count(*) FROM lineitem) AS n_rows,
         (SELECT count(*) FROM lineitem l LEFT JOIN orders o
            ON o.o_orderkey = l.l_orderkey
          WHERE o.o_orderkey IS NULL) AS n_orphans
  UNION ALL
  SELECT 'lineitem.l_partkey->part.p_partkey',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l LEFT JOIN part p
            ON p.p_partkey = l.l_partkey
          WHERE p.p_partkey IS NULL)
  UNION ALL
  SELECT 'lineitem.l_suppkey->supplier.s_suppkey',
         (SELECT count(*) FROM lineitem),
         (SELECT count(*) FROM lineitem l LEFT JOIN supplier s
            ON s.s_suppkey = l.l_suppkey
          WHERE s.s_suppkey IS NULL)
  UNION ALL
  SELECT 'orders.o_custkey->customer.c_custkey',
         (SELECT count(*) FROM orders),
         (SELECT count(*) FROM orders o LEFT JOIN customer c
            ON c.c_custkey = o.o_custkey
          WHERE c.c_custkey IS NULL)
  UNION ALL
  SELECT 'customer.c_nationkey->nation.n_nationkey',
         (SELECT count(*) FROM customer),
         (SELECT count(*) FROM customer c LEFT JOIN nation n
            ON n.n_nationkey = c.c_nationkey
          WHERE n.n_nationkey IS NULL)
  UNION ALL
  SELECT 'supplier.s_nationkey->nation.n_nationkey',
         (SELECT count(*) FROM supplier),
         (SELECT count(*) FROM supplier s LEFT JOIN nation n
            ON n.n_nationkey = s.s_nationkey
          WHERE n.n_nationkey IS NULL)
)
SELECT fk_edge, CAST(n_rows AS BIGINT) AS n_rows,
       CAST(n_orphans AS BIGINT) AS n_orphans,
       CAST(n_orphans AS DOUBLE) / CAST(n_rows AS DOUBLE)
         AS orphan_frac
FROM e
""".strip()


# --------------------------------------- SCD2 as-of enrichment


def q_events_enrich_scd2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Point-in-time enrichment: every event tagged with the user tier
    VALID AT its event time (the `scd2_user_tier` dimension consumed
    the way a warehouse consumes SCD2 — an as-of join, not a
    latest-value join, so historical events get historical
    attributes), then rolled up to events-per-(tier, day).

    r12 (guide §2.4): the SCD2 dimension is itself DERIVED from the
    same events scan, so the interval build + per-user range join
    reduce to ONE window pass over one scan: lag() marks the tier
    CHANGE rows (the q_scd2_user_tier change detection verbatim), and
    each event's valid-at tier is the tier of the latest change at or
    before its timestamp — a running max of the (ts_ms, event_id,
    tier) struct over change rows in a RANGE frame. The range frame
    (not rows) reproduces the old join's semantics exactly: the
    interval condition compared ts_ms only, so an event at the same
    millisecond as a change gets the change's tier regardless of
    event_id order, and among same-ms changes the highest event_id
    owns the (non-empty) interval — precisely the struct max. Events
    before a user's first change report tier NULL ("unknown then",
    never backfilled; max over an empty frame is NULL). One shuffle
    keyed by user, one sort (the range frame's ts_ms order is a
    prefix of the lag window's (ts_ms, event_id)), no join. Output is
    ≤ |tiers+1| × |days| rows.
    """
    day_ms = 24 * _HOUR_MS
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        # integer epoch-ms day: Spark date_trunc yields TIMESTAMP and
        # DuckDB DATE — different stringifications; integers agree
        (
            (F.unix_millis(F.col("ts")) / F.lit(day_ms)).cast("long")
            * F.lit(day_ms)
        ).alias("day_ms"),
        F.floor(
            F.from_json(F.col("props"), "k INT").getField("k")
            / F.lit(_TIER_DIV)
        )
        .cast("int")
        .alias("tier"),
    )
    w = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    marked = ev.withColumn("prev_tier", F.lag("tier").over(w))
    is_change = F.col("prev_tier").isNull() | (
        F.col("tier") != F.col("prev_tier")
    )
    wr = (
        Window.partitionBy("user_id")
        .orderBy("ts_ms")
        .rangeBetween(Window.unboundedPreceding, 0)
    )
    asof = F.max(
        F.when(
            is_change, F.struct("ts_ms", "event_id", "tier")
        )
    ).over(wr)
    j = marked.select(
        "day_ms", asof.getField("tier").alias("tier")
    )
    return j.groupBy("tier", "day_ms").agg(
        F.count(F.lit(1)).alias("n_events")
    )


ORACLE_ENRICH_SCD2 = f"""
WITH e AS (
  SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
         CAST(CAST(json_extract_string(props, '$.k') AS INTEGER)
              // {_TIER_DIV} AS INTEGER) AS tier
  FROM events
), c AS (
  SELECT *, lag(tier) OVER w AS prev_tier
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
), ch AS (
  SELECT user_id, tier, ts_ms, event_id FROM c
  WHERE prev_tier IS NULL OR tier <> prev_tier
), dim AS (
  SELECT user_id, tier, ts_ms AS valid_from_ms,
         lead(ts_ms) OVER (PARTITION BY user_id
                           ORDER BY ts_ms, event_id) AS valid_to_ms
  FROM ch
), ev AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         (epoch_ms(ts) // 86400000) * 86400000 AS day_ms
  FROM events
)
SELECT d.tier, ev.day_ms, count(*) AS n_events
FROM ev
LEFT JOIN dim d
  ON d.user_id = ev.user_id
 AND ev.ts_ms >= d.valid_from_ms
 AND (d.valid_to_ms IS NULL OR ev.ts_ms < d.valid_to_ms)
GROUP BY 1, 2
""".strip()


# ------------------------------------------------- RFM segmentation


def q_events_rfm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation over purchase events: per user,
    recency (whole days since last purchase vs the corpus frontier),
    frequency, and monetary value, each scored into quintiles 1..5 —
    the classic marketing/retention segmentation, done the exact way:
    ntile with a user_id tiebreak (the `metric_histogram_equidepth`
    idiom) so bucket boundaries are identical on both engines, and an
    rfm_code = 100r+10f+m summary per user.

    Two aggregates (per-user rollup, 1-row frontier broadcast), then
    each quintile comes from the DISTRIBUTED rank operator
    (operators/rank.py: range-bucketed local rank + broadcast prefix
    offsets + exact ntile arithmetic) — no |users|-sized relation ever
    funnels through one task, unlike a bare ``ntile() OVER (ORDER
    BY …)``. Buckets: recency by day (corpus-span-bounded histogram),
    frequency/monetary by floor(log2) (≤64 buckets each), all monotone
    in their quintile's sort order with exact-tie bucket sharing, so
    the result is bit-identical to the naive window.
    """
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "purchase"
    ).select(
        "user_id",
        F.unix_millis(F.col("ts")).alias("ts_ms"),
        F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long").alias("e2"),
    )
    # r11 (guide §2.4): ONE corpus scan — the frontier is the exact
    # max of the per-user maxima, and the per-user rollup is cached
    # because the three chained global_rank rounds each consume their
    # input twice (rank branch + bucket histogram), re-executing the
    # whole upstream lineage 2^3·2 = 16× before (initial plan: 16
    # events FileScans → 1).
    per_user = ev.groupBy("user_id").agg(
        F.max("ts_ms").alias("last_ms"),
        F.count(F.lit(1)).alias("frequency"),
        F.sum("e2").alias("m_e2"),
    ).cache()
    frontier = per_user.agg(F.max("last_ms").alias("max_ms"))
    j = per_user.crossJoin(F.broadcast(frontier)).select(
        "user_id",
        (
            (F.col("max_ms") - F.col("last_ms")) / F.lit(86_400_000)
        ).cast("long").alias("recency_days"),
        "frequency",
        (F.col("m_e2").cast("double") / F.lit(100.0)).alias("monetary"),
        F.col("m_e2"),
    )
    from monasca_aggregator_spark.operators.rank import (
        global_rank,
        ntile_from_rank,
    )

    scored = j
    for round_i, (score, bucket, order) in enumerate((
        (
            "r_score",
            (-F.col("recency_days")).cast("long"),
            [F.col("recency_days").desc(), F.col("user_id").asc()],
        ),
        (
            "f_score",
            F.floor(F.log2(F.col("frequency").cast("double"))).cast("int"),
            [F.col("frequency").asc(), F.col("user_id").asc()],
        ),
        (
            "m_score",
            F.floor(
                F.log2(F.col("m_e2").cast("double") + F.lit(1.0))
            ).cast("int"),
            [F.col("m_e2").asc(), F.col("user_id").asc()],
        ),
    )):
        scored = global_rank(
            scored, bucket, order, rank_col="_rk", total_col="_tot"
        ).withColumn(
            score, ntile_from_rank(F.col("_rk"), F.col("_tot"), 5)
        ).drop("_rk", "_tot")
        if round_i < 2:
            # the next global_rank reads this relation twice — pin
            # each round's |users|-row output so re-execution never
            # compounds across rounds (the final round's output has
            # a single consumer and stays lazy)
            scored = scored.cache()
    return scored.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        "r_score",
        "f_score",
        "m_score",
        (
            F.col("r_score") * 100
            + F.col("f_score") * 10
            + F.col("m_score")
        ).alias("rfm_code"),
    )


ORACLE_RFM = """
WITH ev AS (
  SELECT user_id, epoch_ms(ts) AS ts_ms,
         CAST(floor(value * 100 + 0.5) AS BIGINT) AS e2
  FROM events WHERE event_type = 'purchase'
), fr AS (
  SELECT max(ts_ms) AS max_ms FROM ev
), pu AS (
  SELECT user_id, max(ts_ms) AS last_ms, count(*) AS frequency,
         CAST(sum(e2) AS BIGINT) AS m_e2
  FROM ev GROUP BY 1
), j AS (
  SELECT user_id,
         (fr.max_ms - pu.last_ms) // 86400000 AS recency_days,
         frequency, m_e2
  FROM pu CROSS JOIN fr
), sc AS (
  SELECT *,
         ntile(5) OVER (ORDER BY recency_days DESC, user_id) AS r_score,
         ntile(5) OVER (ORDER BY frequency ASC, user_id) AS f_score,
         ntile(5) OVER (ORDER BY m_e2 ASC, user_id) AS m_score
  FROM j
)
SELECT user_id, CAST(recency_days AS BIGINT) AS recency_days,
       frequency,
       CAST(m_e2 AS DOUBLE) / 100.0 AS monetary,
       r_score, f_score, m_score,
       CAST(r_score * 100 + f_score * 10 + m_score AS INTEGER)
         AS rfm_code
FROM sc
""".strip()


# ------------------------------------------- revenue concentration HHI


def q_orders_concentration_hhi(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Revenue-concentration audit: per nation, the Herfindahl-
    Hirschman index of customer order-revenue shares (Σ share²,
    ×10,000 in the antitrust convention) — "is this market five whales
    or a thousand minnows", the risk gauge behind quota sampling and
    load-balancing decisions alike.

    Revenue aggregates in whole currency units (exact BIGINT; cents
    would square into overflow territory ~10⁹ customers sooner), and
    HHI = Σa²/T² evaluates as one division of two exact integers —
    no float share summation.  orders⋈customer broadcasts the
    dimension; two-level aggregate; output is |nations| rows.
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
            F.broadcast(cust),
            orders["o_custkey"] == cust["c_custkey"],
        )
        .groupBy("c_nationkey", "c_custkey")
        .agg(F.sum("rev").alias("a"))
    )
    per_nation = per_cust.groupBy("c_nationkey").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("a").alias("t"),
        F.sum(F.col("a") * F.col("a")).alias("sa2"),
    )
    out = per_nation.join(
        F.broadcast(nation),
        per_nation["c_nationkey"] == nation["n_nationkey"],
    )
    return out.select(
        F.col("n_name").alias("nation"),
        "n_customers",
        (
            F.col("sa2").cast("double")
            * F.lit(10000.0)
            / (F.col("t") * F.col("t")).cast("double")
        ).alias("hhi"),
    )


ORACLE_HHI = """
WITH pc AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(sum(CAST(floor(o.o_totalprice) AS BIGINT)) AS BIGINT)
           AS a
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
  GROUP BY 1, 2
), pn AS (
  SELECT c_nationkey, count(*) AS n_customers,
         CAST(sum(a) AS BIGINT) AS t,
         CAST(sum(a * a) AS BIGINT) AS sa2
  FROM pc GROUP BY 1
)
SELECT n.n_name AS nation, pn.n_customers,
       CAST(pn.sa2 AS DOUBLE) * 10000.0
         / CAST(pn.t * pn.t AS DOUBLE) AS hhi
FROM pn JOIN nation n ON n.n_nationkey = pn.c_nationkey
""".strip()


# ---------------------------------------------- Pareto decile curve


def q_events_pareto_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Activity-concentration curve: users ranked into event-count
    deciles (decile 1 = heaviest), each decile's share and CUMULATIVE
    share of all events — the 80/20 diagnostic for "is this corpus a
    handful of power users", and the sampling-bias check before any
    per-user cap.

    Deciles come from the distributed rank operator (operators/
    rank.py: floor(log2) range buckets → per-bucket local rank →
    broadcast prefix offsets → exact ntile arithmetic), bit-identical
    to ``ntile(10) OVER (ORDER BY n DESC, user_id)`` with no
    single-task sort of the |users| relation; shares are integer sums
    divided once, and the cumulative share's numerator is an integer
    window cumsum over 10 rows — no float accumulation anywhere.
    """
    from monasca_aggregator_spark.operators.rank import (
        global_rank,
        ntile_from_rank,
    )

    ev = load_table(spark, sf_dir, "events").select("user_id")
    # r11 (guide §2.4): global_rank reads its input twice (rank
    # branch + bucket histogram) — cache the per-user rollup so the
    # events scan runs once, not per branch.
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n")
    ).cache()
    # sort is (n DESC, user_id): -floor(log2 n) is monotone
    # non-decreasing along it and exact-ties share a bucket (≤64)
    ranked = global_rank(
        per_user,
        (-F.floor(F.log2(F.col("n").cast("double")))).cast("int"),
        [F.col("n").desc(), F.col("user_id").asc()],
        rank_col="_rk",
        total_col="_tot",
    )
    dec = ranked.withColumn(
        "decile", ntile_from_rank(F.col("_rk"), F.col("_tot"), 10)
    ).drop("_rk", "_tot")
    # ≤10-row relation consumed by the total AND the output cumsum
    g = dec.groupBy("decile").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("n").alias("n_events"),
    ).cache()
    tot = g.agg(F.sum("n_events").alias("total"))
    cw = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = g.crossJoin(F.broadcast(tot)).withColumn(
        "cum_events", F.sum("n_events").over(cw)
    )
    return out.select(
        "decile",
        "n_users",
        F.col("n_events").cast("long").alias("n_events"),
        (
            F.col("n_events").cast("double") / F.col("total").cast("double")
        ).alias("share"),
        (
            F.col("cum_events").cast("double")
            / F.col("total").cast("double")
        ).alias("cum_share"),
    )


ORACLE_PARETO = """
WITH pu AS (
  SELECT user_id, count(*) AS n FROM events GROUP BY 1
), d AS (
  SELECT *, ntile(10) OVER (ORDER BY n DESC, user_id) AS decile
  FROM pu
), g AS (
  SELECT decile, count(*) AS n_users,
         CAST(sum(n) AS BIGINT) AS n_events
  FROM d GROUP BY 1
), t AS (
  SELECT CAST(sum(n_events) AS BIGINT) AS total FROM g
)
SELECT g.decile, g.n_users, g.n_events,
       CAST(g.n_events AS DOUBLE) / CAST(t.total AS DOUBLE) AS share,
       CAST(sum(g.n_events) OVER (ORDER BY g.decile
                                  ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW) AS DOUBLE)
         / CAST(t.total AS DOUBLE) AS cum_share
FROM g CROSS JOIN t
""".strip()


# ----------------------------------------------- co-purchase affinity

_COPURCHASE_MIN_SUPPORT = 3  # pairs must co-occur in >= 3 orders


_ITEMSIM_TOPK = 5


def q_copurchase_cosine_topk(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Item-item collaborative similarity: each part's top-5 neighbors
    by basket-cooccurrence COSINE, cos(i,j) = n_ij/√(n_i·n_j) — the
    scoring layer `orders_copurchase`'s support/lift counts feed (the
    classic item-based recommender built from nothing but the pair
    table). Candidate pairs come only from shared baskets (per-order
    fan-out bounded by basket size, never items²); all counts are
    exact BIGINTs so the cosine is one deterministic double per pair,
    6-dp-rounded before the per-item rank with id tie-break."""
    from pyspark.sql import Window

    # r11 optimization (guide §2.4): the distinct basket relation feeds
    # three consumers (singles + both self-join sides); materialize the
    # post-shuffle result once instead of re-running the distinct per
    # branch — at scale one materialized pass beats three full shuffles
    # of the fact table.
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    ).cache()
    singles = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_single")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("p_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p_a") != F.col("p_b"))  # both directions: per-item lists
        .groupBy("p_a", "p_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
    )
    na = singles.select(F.col("l_partkey").alias("p_a"), F.col("n_single").alias("n_a"))
    nb = singles.select(F.col("l_partkey").alias("p_b"), F.col("n_single").alias("n_b"))
    scored = (
        pairs.join(na, "p_a")
        .join(nb, "p_b")
        .select(
            F.col("p_a").alias("item"),
            F.col("p_b").alias("neighbor"),
            "n_both",
            stable_round(
                F.col("n_both").cast("double")
                / F.sqrt((F.col("n_a") * F.col("n_b")).cast("double")),
                6,
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("item").orderBy(
        F.col("cosine").desc(), F.col("neighbor").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _ITEMSIM_TOPK)
        .select("item", "rank", "neighbor", "n_both", "cosine")
    )


ORACLE_COPURCHASE_COSINE = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), singles AS (
  SELECT l_partkey, count(*) AS n_single FROM li GROUP BY 1
), pairs AS (
  SELECT a.l_partkey AS item, b.l_partkey AS neighbor,
         CAST(count(*) AS BIGINT) AS n_both
  FROM li a JOIN li b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey != b.l_partkey
  GROUP BY 1, 2
), scored AS (
  SELECT item, neighbor, n_both,
         floor((CAST(n_both AS DOUBLE)
                / sqrt(CAST(na.n_single * nb.n_single AS DOUBLE)))
               * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE
           AS cosine
  FROM pairs
  JOIN singles na ON na.l_partkey = pairs.item
  JOIN singles nb ON nb.l_partkey = pairs.neighbor
)
SELECT item, rank, neighbor, n_both, cosine FROM (
  SELECT *, row_number() OVER (PARTITION BY item
                               ORDER BY cosine DESC, neighbor ASC) AS rank
  FROM scored
) WHERE rank <= {_ITEMSIM_TOPK}
""".strip()


def q_orders_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket affinity on REAL baskets: part pairs co-occurring
    in at least MIN_SUPPORT orders, with co-count and lift — the
    `events_assoc_rules` shape at its actual scale challenge: the item
    vocabulary here is |parts| (thousands), not five event types, so
    the naive items×items matrix is infeasible and the bound must come
    from the DATA: the pair fan-out is per-ORDER (≤ (basket size
    choose 2), baskets are ≤ 7 lineitems), and the min-support HAVING
    prunes the pair table before the lift join touches it.

    Exactness: counts are BIGINTs; lift = n_ab·N/(n_a·n_b) evaluates
    as one exact-integer-built double expression, same on both
    engines.  Ties/order: pairs oriented p_a < p_b.
    """
    # r11 optimization: one materialized distinct pass feeds all four
    # consumers (n_orders, singles, both self-join sides) — the
    # copurchase_cosine_topk treatment.
    li = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey"
    ).distinct().cache()
    n_orders = li.select("l_orderkey").distinct().agg(
        F.count(F.lit(1)).alias("n_orders")
    )
    singles = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_single")
    )
    a = li.select("l_orderkey", F.col("l_partkey").alias("p_a"))
    b = li.select("l_orderkey", F.col("l_partkey").alias("p_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("p_a") < F.col("p_b"))
        .groupBy("p_a", "p_b")
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= _COPURCHASE_MIN_SUPPORT)
    )
    na = singles.select(
        F.col("l_partkey").alias("p_a"), F.col("n_single").alias("n_a")
    )
    nb = singles.select(
        F.col("l_partkey").alias("p_b"), F.col("n_single").alias("n_b")
    )
    out = (
        pairs.join(na, "p_a")
        .join(nb, "p_b")
        .crossJoin(F.broadcast(n_orders))
    )
    return out.select(
        "p_a",
        "p_b",
        "n_a",
        "n_b",
        "n_both",
        (
            F.col("n_both").cast("double")
            * F.col("n_orders").cast("double")
            / (F.col("n_a").cast("double") * F.col("n_b").cast("double"))
        ).alias("lift"),
    )


ORACLE_COPURCHASE = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), no AS (
  SELECT count(DISTINCT l_orderkey) AS n_orders FROM li
), s AS (
  SELECT l_partkey, count(*) AS n_single FROM li GROUP BY 1
), p AS (
  SELECT a.l_partkey AS p_a, b.l_partkey AS p_b, count(*) AS n_both
  FROM li a JOIN li b ON b.l_orderkey = a.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
  HAVING count(*) >= {_COPURCHASE_MIN_SUPPORT}
)
SELECT p.p_a, p.p_b, sa.n_single AS n_a, sb.n_single AS n_b, p.n_both,
       CAST(p.n_both AS DOUBLE) * CAST(no.n_orders AS DOUBLE)
         / (CAST(sa.n_single AS DOUBLE) * CAST(sb.n_single AS DOUBLE))
         AS lift
FROM p
JOIN s sa ON sa.l_partkey = p.p_a
JOIN s sb ON sb.l_partkey = p.p_b
CROSS JOIN no
""".strip()


# ------------------------------------------------- ABC classification


def q_lineitem_abc_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC inventory classification: parts ranked by revenue, classed
    A while cumulative revenue ≤ 80% of total, B to 95%, C beyond —
    the warehouse-ops label behind stocking policy, and the
    label-assigning sibling of `events_pareto_deciles`' share curve.

    The class test is cross-multiplied integers (cum·100 ≤ 80·total),
    never a float share compare; the cumulative revenue over
    (revenue DESC, partkey) — a total order, identical on both
    engines — comes from the DISTRIBUTED cumsum operator
    (operators/rank.global_cumsum: floor(log2) range buckets →
    per-bucket local cumsum → broadcast prefix offsets), so the
    |parts| relation never funnels through one task. Output is the
    3-row class rollup.
    """
    from monasca_aggregator_spark.operators.rank import global_cumsum

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey",
        F.floor(F.col("l_extendedprice")).cast("long").alias("rev"),
    )
    per_part = li.groupBy("l_partkey").agg(F.sum("rev").alias("a"))
    cum = global_cumsum(
        per_part,
        (-F.floor(F.log2(F.col("a").cast("double") + F.lit(1.0)))).cast(
            "int"
        ),
        [F.col("a").desc(), F.col("l_partkey").asc()],
        F.col("a"),
        cum_col="cum",
        total_col="total",
    )
    cls = F.when(
        F.col("cum") * 100 <= F.col("total") * 80, F.lit("A")
    ).when(
        F.col("cum") * 100 <= F.col("total") * 95, F.lit("B")
    ).otherwise(F.lit("C"))
    labeled = cum.withColumn("abc_class", cls)
    return labeled.groupBy("abc_class").agg(
        F.count(F.lit(1)).cast("long").alias("n_parts"),
        (F.sum("a").cast("double") / F.lit(1.0)).alias("revenue"),
        (
            F.sum("a").cast("double") / F.max("total").cast("double")
        ).alias("rev_share"),
    )


ORACLE_ABC = """
WITH pp AS (
  SELECT l_partkey,
         CAST(sum(CAST(floor(l_extendedprice) AS BIGINT)) AS BIGINT)
           AS a
  FROM lineitem GROUP BY 1
), t AS (
  SELECT CAST(sum(a) AS BIGINT) AS total FROM pp
), c AS (
  SELECT l_partkey, a,
         CAST(sum(a) OVER (ORDER BY a DESC, l_partkey
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS BIGINT) AS cum
  FROM pp
), lab AS (
  SELECT c.*, t.total,
         CASE WHEN c.cum * 100 <= t.total * 80 THEN 'A'
              WHEN c.cum * 100 <= t.total * 95 THEN 'B'
              ELSE 'C' END AS abc_class
  FROM c CROSS JOIN t
)
SELECT abc_class, CAST(count(*) AS BIGINT) AS n_parts,
       CAST(sum(a) AS DOUBLE) / 1.0 AS revenue,
       CAST(sum(a) AS DOUBLE) / CAST(max(total) AS DOUBLE) AS rev_share
FROM lab GROUP BY 1
""".strip()


# ------------------------------------------------ anomaly ensemble


def q_anomaly_ensemble(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consensus anomaly detection: the trailing-window z-score, the
    MAD fence, and the seasonal (hour-of-day) z-score VOTE per
    (metric, window), and two-of-three flags the window — the
    ensemble that survives each detector's blind spot (σ-inflation
    masks the z-score, daily cycles fool the trailing baseline, and
    the seasonal baseline needs history the other two don't).

    Semantically the COMPOSITION of the three existing oracle-exact
    queries — q_anomaly_zscore, q_metric_mad_anomaly,
    q_anomaly_seasonal — joined on their identical (metric, window)
    row sets; the oracle nests each detector's full SQL as a CTE
    subquery.  Detectors that abstain (NULL score, insufficient
    history) vote false, never block the row.

    r11 (guide §2.2, §2.4): all three detectors key their hourly
    aggregate by the IDENTICAL window expression, so the fused
    groupBy below computes each detector's base aggregate (rounded
    mean, exact cent sum, exact e6 mean) in ONE events scan + ONE
    shuffle, verbatim per-column — previously each detector re-ran
    its own corpus scan and the ensemble joined three copies of the
    same key set (7 events FileScans → 1).  Every downstream stat
    (trailing frame, MAD medians, hour-of-day baseline) consumes the
    cached |metrics|×|hours| relation; the flag expressions are
    copied unchanged from the three detectors, and the 3-way key
    join is gone because the keys already live on one relation.
    """
    from monasca_aggregator_spark.plans.series_ext import (
        _MAD_LHS,
        _MAD_NUM,
    )

    ev = load_table(spark, sf_dir, "events")
    wcol = (
        (F.unix_millis(F.col("ts")) / F.lit(_HOUR_MS)).cast("long")
        * F.lit(_HOUR_MS)
    )
    e2 = F.floor(F.col("value") * 100 + F.lit(0.5)).cast("long")
    e6 = F.floor(
        F.col("value") * F.lit(1_000_000.0) + F.lit(0.5)
    ).cast("long")
    hourly = (
        ev.groupBy(F.col("event_type"), wcol.alias("window_ts_ms"))
        .agg(
            # q_anomaly_zscore's hourly mean (rounded)
            stable_round(F.avg("value"), 4).alias("wv_z"),
            # q_metric_mad_anomaly's exact cent sum
            F.sum(e2).alias("v"),
            # q_anomaly_seasonal's exact e6 mean
            (
                F.sum(e6).cast("double")
                / (F.count(F.lit(1)) * 1_000_000.0)
            ).alias("wv_s"),
        )
        .cache()
    )

    # trailing-window z-score flag (q_anomaly_zscore, verbatim)
    frame = (
        Window.partitionBy("event_type")
        .orderBy("window_ts_ms")
        .rowsBetween(-24, -1)
    )
    mu_t = F.avg("wv_z").over(frame)
    sd_t = F.stddev_samp("wv_z").over(frame)
    z_t = stable_round(
        F.when(sd_t > 0, (F.col("wv_z") - mu_t) / sd_t), 4
    )
    flag_trailing = F.coalesce(F.abs(z_t) > F.lit(3.0), F.lit(False))

    # MAD fence flag (q_metric_mad_anomaly, verbatim)
    med = hourly.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(v, 0.5D) AS BIGINT)").alias("med2")
    )
    dev = hourly.join(F.broadcast(med), "event_type").withColumn(
        "dev2", F.abs(F.lit(2) * F.col("v") - F.col("med2"))
    ).cache()
    mad = dev.groupBy("event_type").agg(
        F.expr("CAST(2 * percentile(dev2, 0.5D) AS BIGINT)").alias("mad4")
    )

    # seasonal hour-of-day flag (q_anomaly_seasonal, verbatim)
    hod = F.expr(f"(window_ts_ms div {_HOUR_MS}) % 24")
    with_hod = dev.withColumn("hod", hod)
    base = with_hod.groupBy("event_type", "hod").agg(
        F.count(F.lit(1)).alias("n_hist"),
        F.avg("wv_s").alias("mu"),
        F.stddev_samp("wv_s").alias("sd"),
    )
    season_z = F.when(
        (F.col("n_hist") >= 3) & (F.col("sd") > 0),
        stable_round((F.col("wv_s") - F.col("mu")) / F.col("sd"), 4),
    )
    flag_seasonal = F.coalesce(F.abs(season_z) > 3, F.lit(False))

    j = (
        with_hod.join(F.broadcast(mad), "event_type")
        .join(F.broadcast(base), ["event_type", "hod"])
        .select(
            "event_type",
            "window_ts_ms",
            flag_trailing.alias("flag_trailing"),
            (
                F.col("dev2") * F.lit(_MAD_LHS)
                > F.col("mad4") * F.lit(_MAD_NUM)
            ).alias("flag_mad"),
            flag_seasonal.alias("flag_seasonal"),
        )
    )
    votes = (
        F.col("flag_trailing").cast("int")
        + F.col("flag_mad").cast("int")
        + F.col("flag_seasonal").cast("int")
    )
    return j.select(
        "event_type",
        "window_ts_ms",
        "flag_trailing",
        "flag_mad",
        "flag_seasonal",
        votes.alias("votes"),
        (votes >= F.lit(2)).alias("consensus"),
    )


def _oracle_ensemble() -> str:
    from monasca_aggregator_spark.plans.series import (
        ORACLE_ANOMALY_SEASONAL,
    )
    from monasca_aggregator_spark.plans.series_ext import (
        ORACLE_MAD_ANOMALY,
    )
    from monasca_aggregator_spark.plans.temporal import ORACLE_ANOMALY

    return f"""
WITH z AS ({ORACLE_ANOMALY}),
m AS ({ORACLE_MAD_ANOMALY}),
sz AS ({ORACLE_ANOMALY_SEASONAL})
SELECT z.event_type, z.window_ts_ms,
       z.is_anomaly AS flag_trailing,
       m.is_anomaly AS flag_mad,
       coalesce(abs(sz.season_z) > 3, false) AS flag_seasonal,
       CAST(CAST(z.is_anomaly AS INTEGER)
            + CAST(m.is_anomaly AS INTEGER)
            + CAST(coalesce(abs(sz.season_z) > 3, false) AS INTEGER)
            AS INTEGER) AS votes,
       (CAST(z.is_anomaly AS INTEGER)
        + CAST(m.is_anomaly AS INTEGER)
        + CAST(coalesce(abs(sz.season_z) > 3, false) AS INTEGER))
         >= 2 AS consensus
FROM z
JOIN m USING (event_type, window_ts_ms)
JOIN sz USING (event_type, window_ts_ms)
""".strip()


# ------------------------------------------------- cohort LTV matrix

_MONTH_DAYS = 30  # epoch-aligned 30-day "months" (no calendar skew)


def q_orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer-lifetime-value matrix: customers grouped by
    first-order cohort (epoch-aligned 30-day buckets), revenue per
    (cohort, periods-since-cohort) with the CUMULATIVE per-customer
    value — the revenue-weighted sibling of `events_retention`'s
    user-count matrix, and the payback-period readout acquisition
    spend is judged against.

    Per-customer first-order agg co-partitions with the join that
    follows (one shuffle on custkey), the matrix is |cohorts|² cells,
    and the running cumulative sums integer revenue over ordered
    periods — exact division only at the final avg-LTV column.
    """
    mo_ms = _MONTH_DAYS * 24 * 3600 * 1000
    orders = load_table(spark, sf_dir, "orders").select(
        "o_custkey",
        F.unix_millis(F.col("o_orderdate")).alias("ts_ms"),
        F.floor(F.col("o_totalprice")).cast("long").alias("rev"),
    )
    bucket = lambda c: (c / F.lit(mo_ms)).cast("long")  # noqa: E731
    first = orders.groupBy("o_custkey").agg(
        F.min("ts_ms").alias("first_ms")
    )
    # r11 (guide §2.4): the per-customer cohort relation feeds the
    # cohort sizes AND the revenue join — uncached, the orders scan +
    # first-order aggregate re-executed per consumer (3 FileScans →
    # 2: one for the cached rollup, one for the revenue join probe).
    cohorts = first.select(
        "o_custkey", bucket(F.col("first_ms")).alias("cohort")
    ).cache()
    sized = cohorts.groupBy("cohort").agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    j = orders.join(cohorts, "o_custkey").select(
        "cohort",
        (bucket(F.col("ts_ms")) - F.col("cohort")).alias("period"),
        "rev",
    )
    cell = j.groupBy("cohort", "period").agg(
        F.sum("rev").alias("revenue")
    )
    w = Window.partitionBy("cohort").orderBy("period").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = cell.withColumn("cum_revenue", F.sum("revenue").over(w)).join(
        F.broadcast(sized), "cohort"
    )
    return out.select(
        F.col("cohort").cast("long").alias("cohort"),
        F.col("period").cast("long").alias("period"),
        "n_customers",
        F.col("revenue").cast("long").alias("revenue"),
        F.col("cum_revenue").cast("long").alias("cum_revenue"),
        (
            F.col("cum_revenue").cast("double")
            / F.col("n_customers").cast("double")
        ).alias("avg_ltv"),
    )


ORACLE_COHORT_LTV = f"""
WITH o AS (
  SELECT o_custkey, epoch_ms(o_orderdate) AS ts_ms,
         CAST(floor(o_totalprice) AS BIGINT) AS rev
  FROM orders
), f AS (
  SELECT o_custkey, min(ts_ms) // {_MONTH_DAYS * 86400000} AS cohort
  FROM o GROUP BY 1
), sz AS (
  SELECT cohort, count(*) AS n_customers FROM f GROUP BY 1
), cell AS (
  SELECT f.cohort,
         o.ts_ms // {_MONTH_DAYS * 86400000} - f.cohort AS period,
         CAST(sum(o.rev) AS BIGINT) AS revenue
  FROM o JOIN f USING (o_custkey)
  GROUP BY 1, 2
)
SELECT CAST(cell.cohort AS BIGINT) AS cohort,
       CAST(cell.period AS BIGINT) AS period,
       sz.n_customers,
       cell.revenue,
       CAST(sum(cell.revenue) OVER (PARTITION BY cell.cohort
                                    ORDER BY cell.period
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS BIGINT)
         AS cum_revenue,
       CAST(sum(cell.revenue) OVER (PARTITION BY cell.cohort
                                    ORDER BY cell.period
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND CURRENT ROW) AS DOUBLE)
         / CAST(sz.n_customers AS DOUBLE) AS avg_ltv
FROM cell JOIN sz USING (cohort)
""".strip()


def q_cdc_apply_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-data-capture apply: the event stream is read as a
    changelog (signup→INSERT, click/view/purchase→UPDATE,
    error→DELETE), keyed by user, ordered by (ts, event_id); the query
    materializes the final table state — one row per surviving key
    with its last value and change count. This is the log-to-table
    half of CDC ingestion (Debezium-style apply), expressed as one
    window rank per key: the shuffle is keyed by user_id only, and at
    100 TB the per-key state is the changelog's per-key depth, not the
    table width.
    """
    ev = load_table(spark, sf_dir, "events")
    op = (
        F.when(F.col("event_type") == "signup", F.lit("I"))
        .when(F.col("event_type") == "error", F.lit("D"))
        .otherwise(F.lit("U"))
    )
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    ranked = (
        ev.select(
            "user_id", "ts", "event_id", "value", op.alias("op")
        )
        .withColumn("rn", F.row_number().over(w))
    )
    last = ranked.filter(F.col("rn") == 1)
    counts = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_changes")
    )
    return (
        last.filter(F.col("op") != "D")
        .join(counts, "user_id")
        .select(
            "user_id",
            F.col("value").alias("last_value"),
            F.col("op").alias("last_op"),
            "n_changes",
        )
    )


ORACLE_CDC_APPLY = """
WITH log AS (
  SELECT user_id, ts, event_id, value,
         CASE event_type WHEN 'signup' THEN 'I'
                         WHEN 'error' THEN 'D'
                         ELSE 'U' END AS op
  FROM events
), ranked AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM log
), counts AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_changes FROM log GROUP BY user_id
)
SELECT r.user_id, r.value AS last_value, r.op AS last_op, c.n_changes
FROM ranked r JOIN counts c ON r.user_id = c.user_id
WHERE r.rn = 1 AND r.op <> 'D'
""".strip()


def q_stats_join_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size estimation from exact key histograms — the statistics
    a cost-based optimizer needs before picking a join strategy:
    distinct keys each side, exact output cardinality
    Σ_k n_left(k)·n_right(k), and the worst single-key fan-out (the
    skew signal that says 'salt this join'). Two partial-aggregated
    key histograms joined on the key; the fact table never shuffles
    its rows, only its histogram."""
    li = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cl"))
    )
    orders = (
        load_table(spark, sf_dir, "orders")
        .groupBy(F.col("o_orderkey").alias("k"))
        .agg(F.count(F.lit(1)).alias("cr"))
    )
    joined = li.join(orders, "k").agg(
        F.sum(F.col("cl") * F.col("cr")).alias("join_rows"),
        F.max(F.col("cl") * F.col("cr")).alias("max_key_fanout"),
        F.count(F.lit(1)).alias("n_matching_keys"),
    )
    nl = li.agg(F.count(F.lit(1)).alias("n_keys_left"))
    nr = orders.agg(F.count(F.lit(1)).alias("n_keys_right"))
    return joined.crossJoin(nl).crossJoin(nr).select(
        "n_keys_left",
        "n_keys_right",
        "n_matching_keys",
        "join_rows",
        "max_key_fanout",
    )


ORACLE_JOIN_ESTIMATE = """
WITH l AS (SELECT l_orderkey AS k, count(*) AS cl FROM lineitem GROUP BY 1),
     r AS (SELECT o_orderkey AS k, count(*) AS cr FROM orders GROUP BY 1),
     j AS (
       SELECT CAST(sum(cl * cr) AS BIGINT) AS join_rows,
              CAST(max(cl * cr) AS BIGINT) AS max_key_fanout,
              CAST(count(*) AS BIGINT) AS n_matching_keys
       FROM l JOIN r USING (k)
     )
SELECT CAST((SELECT count(*) FROM l) AS BIGINT) AS n_keys_left,
       CAST((SELECT count(*) FROM r) AS BIGINT) AS n_keys_right,
       n_matching_keys, join_rows, max_key_fanout
FROM j
""".strip()


_TOKEN_SALT = "r2salt"


def q_privacy_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Privacy-preserving release: user ids replaced by salted-MD5
    pseudonyms BEFORE aggregation — the de-identification step that
    precedes sharing usage tables (stable across runs for joinability,
    non-invertible without the salt, and the released table carries
    only tokens + aggregates). Per-token activity profile with the
    distinct-day count that drives k-anonymity review downstream;
    grouping happens on the token itself, proving the pipeline never
    needs the raw id after the projection."""
    ev = load_table(spark, sf_dir, "events")
    token = F.md5(
        F.concat(F.lit(_TOKEN_SALT), F.col("user_id").cast("string"))
    )
    return (
        ev.select(
            token.alias("user_token"),
            F.col("event_type"),
            F.to_date("ts").alias("day"),
        )
        .groupBy("user_token")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("day").alias("active_days"),
            F.countDistinct("event_type").alias("n_types"),
        )
    )


ORACLE_PRIVACY_TOKENIZE = f"""
SELECT md5('{_TOKEN_SALT}' || CAST(user_id AS VARCHAR)) AS user_token,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(count(DISTINCT CAST(ts AS DATE)) AS BIGINT) AS active_days,
       CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
FROM events GROUP BY 1
""".strip()


def q_funnel_time_to_convert(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Conversion-latency distribution: for every purchase with a
    prior click (backward as-of within the user), the click→purchase
    gap in seconds, summarized per purchase day as median / p90 /
    conversion count. The as-of attach is the one-shuffle union-carry
    join; gaps are exact BIGINT seconds so the interpolated
    percentiles are deterministic doubles on both engines."""
    ev = load_table(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts"
    )
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", "ts"
    )
    joined = asof_join(purchases, clicks, ["user_id"], right_prefix="c_")
    gap_s = (
        (F.unix_micros("ts") - F.unix_micros("c_ts")) / F.lit(1_000_000)
    ).cast("long")
    return (
        joined.filter(F.col("c_ts").isNotNull())
        .select(F.to_date("ts").alias("day"), gap_s.alias("gap_s"))
        .groupBy("day")
        .agg(
            F.count(F.lit(1)).alias("n_conversions"),
            stable_round(F.median("gap_s"), 4).alias("median_gap_s"),
            stable_round(
                F.percentile(F.col("gap_s"), F.lit(0.9)), 4
            ).alias("p90_gap_s"),
        )
    )


ORACLE_TIME_TO_CONVERT = """
WITH p AS (
  SELECT user_id, ts FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts FROM events WHERE event_type = 'click'
), j AS (
  SELECT p.user_id, p.ts,
         (epoch_us(p.ts) - epoch_us(c.ts)) // 1000000 AS gap_s
  FROM p ASOF JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
)
SELECT CAST(ts AS DATE) AS day,
       CAST(count(*) AS BIGINT) AS n_conversions,
       floor(median(gap_s) * 10000.0::DOUBLE + 0.5::DOUBLE) / 10000.0::DOUBLE
         AS median_gap_s,
       floor(quantile_cont(gap_s, 0.9) * 10000.0::DOUBLE + 0.5::DOUBLE)
         / 10000.0::DOUBLE AS p90_gap_s
FROM j GROUP BY 1
""".strip()


def q_events_retention_bitmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily retention triangle computed FROM per-user activity
    bitmaps — the roaring-bitmap-index pattern at engine level: one
    groupBy folds each user's activity into a single 64-bit word
    (``bit_or(1 << day)``), after which every retention cell is pure
    bit arithmetic (cohort day = lowest set bit via
    ``bit_count((b & -b) - 1)``, retained-at-offset = bit test) — no
    second pass over raw events and no per-(user, day) distinct. At
    100 TB the event table is touched once; the bitmap relation is
    |users| rows of 16 bytes.

    Horizon ≤ 63 days fits one BIGINT; longer horizons chunk into an
    array of words (same algebra per word).

    Dataset coupling (ADVICE r2): the epoch is the test corpus' fixed
    day-0 (2024-01-01) and the single-word form only represents days
    0..63 — Spark's shiftleft masks the shift amount mod 64 (Java
    semantics), so an out-of-horizon event would silently set a WRONG
    bit while DuckDB's ``<<`` yields 0.  Both engines therefore filter
    to the representable horizon explicitly: events outside [0, 63]
    days from the epoch are out of scope by contract, never wrapped.
    """
    ev = load_table(spark, sf_dir, "events")
    dd = F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
    bm = (
        ev.select(
            "user_id",
            dd.alias("dd"),
            F.expr(
                "shiftleft(1L, datediff(cast(ts as date), date'2024-01-01'))"
            ).alias("bit"),
        )
        .filter(F.col("dd").between(0, 63))
        .drop("dd")
        .groupBy("user_id")
        .agg(F.bit_or("bit").alias("bitmap"))
        .withColumn(
            "cohort_day",
            F.bit_count(
                (F.col("bitmap").bitwiseAND(-F.col("bitmap"))) - F.lit(1)
            ),
        )
    )
    offsets = F.explode(F.sequence(F.lit(0), F.lit(29))).alias("day_offset")
    return (
        bm.select("bitmap", "cohort_day", offsets)
        .filter(F.col("cohort_day") + F.col("day_offset") <= 29)
        .groupBy("cohort_day", "day_offset")
        .agg(
            F.sum(
                F.expr(
                    "cast(shiftright(bitmap, cast(cohort_day + day_offset as int)) & 1 as bigint)"
                )
            ).alias("retained")
        )
        .select(
            F.col("cohort_day").cast("long").alias("cohort_day"),
            F.col("day_offset").cast("long").alias("day_offset"),
            F.col("retained"),
        )
    )


ORACLE_RETENTION_BITMAP = r"""
WITH bm AS (
  SELECT user_id,
         bit_or(1::BIGINT << CAST(date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS INT)) AS bitmap
  FROM events
  WHERE date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) BETWEEN 0 AND 63
  GROUP BY user_id
), c AS (
  SELECT bitmap, bit_count(((bitmap & -bitmap) - 1)::BIGINT) AS cohort_day FROM bm
)
SELECT CAST(cohort_day AS BIGINT) AS cohort_day,
       CAST(o.day_offset AS BIGINT) AS day_offset,
       CAST(sum(((bitmap >> CAST(cohort_day + o.day_offset AS INT)) & 1)::BIGINT) AS BIGINT) AS retained
FROM c, (SELECT unnest(range(0, 30)) AS day_offset) o
WHERE cohort_day + o.day_offset <= 29
GROUP BY 1, 2
""".strip()


def q_audit_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate (operators/expectations.py): 8
    rules over lineitem compiled into ONE whole-stage-codegen'd
    aggregate pass — no joins, map-side partials, fixed-size report.
    TPC-H invariants double as the ruleset (discount ∈ [0,.1],
    quantity ∈ [1,50], flag/status domains, positive price, PK
    uniqueness)."""
    from monasca_aggregator_spark.operators import expectations as E

    li = load_table(spark, sf_dir, "lineitem")
    rules = [
        E.not_null("l_orderkey"),
        E.not_null("l_partkey"),
        E.in_range("l_discount", 0.0, 0.1),
        E.in_range("l_quantity", 1, 50),
        E.in_set("l_returnflag", {"A", "N", "R"}),
        E.in_set("l_linestatus", {"O", "F"}),
        E.satisfies("price_positive", F.col("l_extendedprice") > 0),
        E.unique("l_orderkey", "l_linenumber"),
    ]
    return E.check(li, rules)


def _exp_rule(name: str, where: str) -> str:
    return f"""
SELECT '{name}' AS rule,
       CAST(count(*) FILTER (WHERE NOT ({where})) AS BIGINT) AS violations,
       CAST(count(*) AS BIGINT) AS checked,
       count(*) FILTER (WHERE NOT ({where})) = 0 AS passed
FROM lineitem"""


ORACLE_EXPECTATIONS = (
    "\nUNION ALL".join(
        [
            _exp_rule("not_null(l_orderkey)", "l_orderkey IS NOT NULL"),
            _exp_rule("not_null(l_partkey)", "l_partkey IS NOT NULL"),
            _exp_rule(
                "range(l_discount)",
                "coalesce(l_discount >= 0.0 AND l_discount <= 0.1, FALSE)",
            ),
            _exp_rule(
                "range(l_quantity)",
                "coalesce(l_quantity >= 1 AND l_quantity <= 50, FALSE)",
            ),
            _exp_rule(
                "in_set(l_returnflag)",
                "coalesce(l_returnflag IN ('A','N','R'), FALSE)",
            ),
            _exp_rule(
                "in_set(l_linestatus)",
                "coalesce(l_linestatus IN ('F','O'), FALSE)",
            ),
            _exp_rule(
                "satisfies(price_positive)",
                "coalesce(l_extendedprice > 0, FALSE)",
            ),
        ]
    )
    + """
UNION ALL
SELECT 'unique(l_orderkey,l_linenumber)' AS rule,
       CAST(count(*) - (SELECT count(*) FROM (
           SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
           WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)) AS BIGINT) AS violations,
       CAST(count(*) AS BIGINT) AS checked,
       count(*) = (SELECT count(*) FROM (
           SELECT DISTINCT l_orderkey, l_linenumber FROM lineitem
           WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL)) AS passed
FROM lineitem
WHERE l_orderkey IS NOT NULL AND l_linenumber IS NOT NULL"""
).strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "audit_expectations": q_audit_expectations,
    "events_retention_bitmap": q_events_retention_bitmap,
    "privacy_tokenize": q_privacy_tokenize,
    "funnel_time_to_convert": q_funnel_time_to_convert,
    "cdc_apply_latest": q_cdc_apply_latest,
    "stats_join_estimate": q_stats_join_estimate,
    "agg_incremental_rollup": q_agg_incremental_rollup,
    "sessions_concurrency": q_sessions_concurrency,
    "events_assoc_rules": q_events_assoc_rules,
    "graph_triangles": q_graph_triangles,
    "graph_clustering": q_graph_clustering,
    "scd2_user_tier": q_scd2_user_tier,
    "audit_referential": q_audit_referential,
    "events_enrich_scd2": q_events_enrich_scd2,
    "events_rfm": q_events_rfm,
    "orders_concentration_hhi": q_orders_concentration_hhi,
    "events_pareto_deciles": q_events_pareto_deciles,
    "orders_copurchase": q_orders_copurchase,
    "copurchase_cosine_topk": q_copurchase_cosine_topk,
    "lineitem_abc_class": q_lineitem_abc_class,
    "anomaly_ensemble": q_anomaly_ensemble,
    "orders_cohort_ltv": q_orders_cohort_ltv,
}

ORACLES: dict[str, str] = {
    "audit_expectations": ORACLE_EXPECTATIONS,
    "events_retention_bitmap": ORACLE_RETENTION_BITMAP,
    "privacy_tokenize": ORACLE_PRIVACY_TOKENIZE,
    "funnel_time_to_convert": ORACLE_TIME_TO_CONVERT,
    "cdc_apply_latest": ORACLE_CDC_APPLY,
    "stats_join_estimate": ORACLE_JOIN_ESTIMATE,
    "agg_incremental_rollup": ORACLE_INCREMENTAL_ROLLUP,
    "sessions_concurrency": ORACLE_SESSIONS_CONCURRENCY,
    "events_assoc_rules": ORACLE_ASSOC_RULES,
    "graph_triangles": ORACLE_TRIANGLES,
    "graph_clustering": ORACLE_CLUSTERING,
    "scd2_user_tier": ORACLE_SCD2,
    "audit_referential": ORACLE_AUDIT_REFERENTIAL,
    "events_enrich_scd2": ORACLE_ENRICH_SCD2,
    "events_rfm": ORACLE_RFM,
    "orders_concentration_hhi": ORACLE_HHI,
    "events_pareto_deciles": ORACLE_PARETO,
    "orders_copurchase": ORACLE_COPURCHASE,
    "copurchase_cosine_topk": ORACLE_COPURCHASE_COSINE,
    "lineitem_abc_class": ORACLE_ABC,
    "anomaly_ensemble": _oracle_ensemble(),
    "orders_cohort_ltv": ORACLE_COHORT_LTV,
}
