"""Association / concentration / behavioral mining (round 10):
market-basket lift, co-purchase degree assortativity, Lorenz revenue
deciles, bot-signature detection, event path trigrams, Dunning G²
collocations, Simpson vocabulary diversity, stopword-profile cosine,
Markov entropy rate, Chao1 vocabulary richness, MTLD lexical
diversity, LZ78 phrase complexity (the last two run their sequential
folds INSIDE both engines as ordered array reductions).

Reference parity: the reference engine (Go, ~/reference —
aggregation/aggregation_rule.go) emits windowed aggregates; these are the association-rule / concentration /
behavioral questions a pipeline asks of the SAME relational surface
next, each Spark-first and DuckDB-oracle-backed.

Numerics: every statistic aggregates as exact integers (counts,
e2-cents, DEC38/HUGEINT squares); doubles appear only in ONE final
expression per row — a fixed-shape tree both engines evaluate
identically — passed through ``stable_round``.

Scale posture (per query, also in each docstring):
- `basket_association_lift` / `graph_assortativity`: the pair
  enumeration is the `orders_copurchase` cost class — a self-join of
  the order→part list co-partitioned on the ORDER key, Σ basket²
  rows (baskets are bounded by order size, not corpus size);
  everything after runs on the part-pair aggregate.
- `revenue_lorenz_deciles`: one customer-sized aggregate, a 10-bucket
  ntile window over it, then 10-row math.
- `events_bot_detection`: two stacked aggregates (user×minute, then
  user) with map-side partials; the report is a TakeOrdered top-K.
- `events_ngram_paths` / `events_entropy_rate`: one window
  partitioned BY USER over the event stream (per-user sequences are
  bounded), then a trigram- or |types|²-sized aggregate (entropy
  rate folds its bounded cell array in deterministic sorted order).
- `text_collocation_g2` / `text_simpson_diversity` /
  `text_stopword_cosine`: the corpus-sized explode shuffles once into
  vocabulary- or source-bounded aggregates (the `text_bigram_pmi`
  cost class); G² marginals come from the already-collapsed bigram
  table, and the stopword profile is |sources|×20 before the
  |sources|² cosine cross.
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

_LIFT_MINSUP = 2  # orders containing the pair
_LIFT_K = 20
_BOT_K = 20
_BOT_BURST = 5  # events in one minute that marks a burst
_BOT_RATE = 2.0  # events per active minute
_PATH_K = 20
_G2_MIN_COUNT = 5
_G2_K = 20
_STOPWORDS = (
    "the", "a", "an", "of", "to", "and", "in", "is", "it", "that",
    "for", "on", "as", "with", "at", "by", "this", "be", "are", "was",
)


# ------------------------------------------------ market-basket lift


def q_basket_association_lift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MARKET-BASKET ASSOCIATION RULES (Agrawal & Srikant 1994's
    support/confidence plus Brin 1997's lift) over the order→part
    bipartite relation: for every part pair bought together in ≥
    _LIFT_MINSUP orders, lift = N·n_ab/(n_a·n_b) says how much more
    often the pair co-occurs than independence predicts — the
    classical cross-sell screen beside the family's co-purchase
    cosine and link-prediction rows (those rank NEIGHBORS; this
    calibrates each rule against the independence baseline).

    Exactness: n_ab, n_a, n_b, N are exact counts; lift and
    confidence are ONE division each (DEC38 product first), rounded
    BEFORE ranking, (p1, p2) breaks ties; TakeOrdered keeps a K-row
    heap per partition.

    Scale: the self-join runs on the distinct (order, part) list
    co-partitioned on the ORDER key — Σ basket² pairs, bounded by
    basket size; part marginals broadcast onto the collapsed pair
    aggregate."""
    # r11 optimization: one materialized distinct pass feeds all four
    # consumers (n_orders, marginals, both self-join sides).
    li = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    ).cache()
    n_orders = li.agg(
        F.countDistinct("l_orderkey").alias("n_orders")
    )
    n_a = li.groupBy("l_partkey").agg(
        F.count(F.lit(1)).alias("n_part")
    )
    a = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p1")
    )
    b = li.select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p2")
    )
    pairs = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _LIFT_MINSUP)
    )
    dec = "decimal(38,0)"
    scored = (
        pairs.join(
            F.broadcast(
                n_a.select(
                    F.col("l_partkey").alias("p1"),
                    F.col("n_part").alias("na"),
                )
            ),
            "p1",
        )
        .join(
            F.broadcast(
                n_a.select(
                    F.col("l_partkey").alias("p2"),
                    F.col("n_part").alias("nb"),
                )
            ),
            "p2",
        )
        .join(F.broadcast(n_orders))
        .select(
            "p1",
            "p2",
            "n_ab",
            stable_round(
                (
                    F.col("n_ab").cast(dec) * F.col("n_orders").cast(dec)
                ).cast("double")
                / (F.col("na").cast(dec) * F.col("nb").cast(dec)).cast(
                    "double"
                ),
                6,
            ).alias("lift"),
            stable_round(
                F.col("n_ab").cast("double") / F.col("na").cast("double"),
                6,
            ).alias("confidence"),
        )
    )
    w = Window.orderBy(
        F.col("lift").desc(), F.col("p1").asc(), F.col("p2").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _LIFT_K)
        .select("rk", "p1", "p2", "n_ab", "lift", "confidence")
    )


ORACLE_LIFT = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), n AS (SELECT count(DISTINCT o) AS n_orders FROM li),
marg AS (SELECT p, count(*) AS np FROM li GROUP BY 1),
pairs AS (
  SELECT a.p AS p1, b.p AS p2, count(*) AS n_ab
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {_LIFT_MINSUP}
), scored AS (
  SELECT p1, p2, n_ab,
         {sql_stable_round(
             "CAST(CAST(n_ab AS HUGEINT) * n.n_orders AS DOUBLE)"
             " / CAST(CAST(ma.np AS HUGEINT) * mb.np AS DOUBLE)",
             6)} AS lift,
         {sql_stable_round(
             "CAST(n_ab AS DOUBLE) / ma.np", 6)} AS confidence
  FROM pairs, n
  JOIN marg ma ON ma.p = pairs.p1
  JOIN marg mb ON mb.p = pairs.p2
)
SELECT rk, p1, p2, n_ab, lift, confidence FROM (
  SELECT *, row_number() OVER
    (ORDER BY lift DESC, p1 ASC, p2 ASC) AS rk
  FROM scored
) WHERE rk <= {_LIFT_K}
""".strip()


# -------------------------------------------- degree assortativity


def q_graph_assortativity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DEGREE ASSORTATIVITY of the co-purchase graph (Newman 2002):
    the Pearson correlation of endpoint degrees over the edge list —
    positive means hubs connect to hubs (assortative mixing; dedup
    and recommendation walk lengths behave very differently there),
    negative means hub-and-spoke. The one-number structural readout
    beside the family's degree histogram, transitivity, and PageRank
    rows.

    Exactness: edges and degrees are exact counts; the five moment
    sums over the 2E directed pairs ride DEC38; r is ONE final
    expression. stable_round(6).

    Scale: edges come from the `orders_copurchase` self-join
    (Σ basket², order-key co-partitioned, support ≥ _LIFT_MINSUP);
    degrees are a part-sized aggregate broadcast back onto the edge
    list; the correlation is a single global aggregate."""
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
    # r11 optimization (guide §2.4): edges feeds deg + both directed
    # halves, deg feeds both endpoint broadcasts + n_nodes — both are
    # bounded (support-floored pair graph / part-sized degrees), so
    # materialize each once instead of re-running the Σ basket²
    # self-join per branch.
    edges = (
        a.join(b, "o")
        .filter(F.col("p1") < F.col("p2"))
        .groupBy("p1", "p2")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _LIFT_MINSUP)
        .select("p1", "p2")
    ).cache()
    deg = (
        edges.select(F.col("p1").alias("p"))
        .unionByName(edges.select(F.col("p2").alias("p")))
        .groupBy("p")
        .agg(F.count(F.lit(1)).alias("deg"))
    ).cache()
    directed = edges.unionByName(
        edges.select(F.col("p2").alias("p1"), F.col("p1").alias("p2"))
    )
    xy = (
        directed.join(
            F.broadcast(
                deg.select(F.col("p").alias("p1"), F.col("deg").alias("x"))
            ),
            "p1",
        )
        .join(
            F.broadcast(
                deg.select(F.col("p").alias("p2"), F.col("deg").alias("y"))
            ),
            "p2",
        )
        .select("x", "y")
    )
    dec = "decimal(38,0)"
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x").cast(dec) * F.col("y").cast(dec)).alias("sxy"),
        F.sum(F.col("x").cast(dec) * F.col("x").cast(dec)).alias("sxx"),
        F.sum(F.col("y").cast(dec) * F.col("y").cast(dec)).alias("syy"),
    )
    n_nodes = deg.agg(F.count(F.lit(1)).alias("n_nodes"))
    num = (
        F.col("n").cast(dec) * F.col("sxy")
        - F.col("sx").cast(dec) * F.col("sy").cast(dec)
    ).cast("double")
    den = F.sqrt(
        (
            F.col("n").cast(dec) * F.col("sxx")
            - F.col("sx").cast(dec) * F.col("sx").cast(dec)
        ).cast("double")
        * (
            F.col("n").cast(dec) * F.col("syy")
            - F.col("sy").cast(dec) * F.col("sy").cast(dec)
        ).cast("double")
    )
    return s.join(F.broadcast(n_nodes)).select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        (F.col("n") / 2).cast("long").alias("n_edges"),
        F.when(den == 0, F.lit(None).cast("double"))
        .otherwise(stable_round(num / den, 6))
        .alias("assortativity"),
    )


ORACLE_ASSORTATIVITY = f"""
WITH li AS (
  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
), edges AS (
  SELECT a.p AS p1, b.p AS p2
  FROM li a JOIN li b ON a.o = b.o AND a.p < b.p
  GROUP BY 1, 2 HAVING count(*) >= {_LIFT_MINSUP}
), deg AS (
  SELECT p, count(*) AS deg FROM (
    SELECT p1 AS p FROM edges UNION ALL SELECT p2 FROM edges
  ) GROUP BY 1
), directed AS (
  SELECT p1, p2 FROM edges
  UNION ALL SELECT p2, p1 FROM edges
), xy AS (
  SELECT da.deg AS x, db.deg AS y
  FROM directed d
  JOIN deg da ON da.p = d.p1 JOIN deg db ON db.p = d.p2
), s AS (
  SELECT count(*) AS n,
         CAST(sum(x) AS HUGEINT) AS sx, CAST(sum(y) AS HUGEINT) AS sy,
         sum(CAST(x AS HUGEINT) * y) AS sxy,
         sum(CAST(x AS HUGEINT) * x) AS sxx,
         sum(CAST(y AS HUGEINT) * y) AS syy
  FROM xy
)
SELECT (SELECT count(*) FROM deg) AS n_nodes,
       CAST(n / 2 AS BIGINT) AS n_edges,
       CASE WHEN (CAST(n AS HUGEINT) * sxx - sx * sx) *
                 (CAST(n AS HUGEINT) * syy - sy * sy) = 0 THEN NULL
       ELSE {sql_stable_round(
           "CAST(CAST(n AS HUGEINT) * sxy - sx * sy AS DOUBLE)"
           " / sqrt(CAST(CAST(n AS HUGEINT) * sxx - sx * sx AS DOUBLE)"
           "        * CAST(CAST(n AS HUGEINT) * syy - sy * sy"
           "               AS DOUBLE))", 6)} END AS assortativity
FROM s
""".strip()


# ------------------------------------------------ Lorenz revenue deciles


def q_revenue_lorenz_deciles(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LORENZ CURVE of customer revenue in deciles: customers sorted
    by total order revenue split into 10 equal-count buckets; each
    bucket reports its revenue share and the cumulative share — the
    curve the family's Gini/Theil single numbers summarize, in the
    form a curation dashboard plots ("the top decile is 38% of
    revenue"). ntile(10) over (revenue, custkey) is deterministic
    under ties.

    Exactness: revenue rides as e2-cents BIGINT; shares are ONE
    division of exact integers. The decile window and the cumulative
    sum run over a 10-row relation.

    Scale: one customer-sized aggregate (map-side partials); the
    decile split is operators/rank.py's DISTRIBUTED global rank
    (log-bucketed local rank + broadcast prefix offsets — the only
    single-task window is the ~60-row bucket histogram), layered
    with exact NTILE semantics; then 10-row math. A naive global
    ntile window would single-task-sort every customer."""
    from monasca_aggregator_spark.operators.rank import (
        global_rank,
        ntile_from_rank,
    )

    rev = (
        load_table(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .agg(
            F.sum(
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast(
                    "long"
                )
            ).alias("cents")
        )
        # r11 (guide §2.4): global_rank reads its input twice (rank
        # branch + bucket histogram) — cache the per-customer rollup
        # so the orders scan runs once, not per branch.
        .cache()
    )
    # ln-scale bucket: monotone in cents, equal cents share a bucket,
    # ~60 buckets across any realistic revenue range
    ranked = global_rank(
        rev,
        F.floor(F.log(F.col("cents").cast("double") + 2.0) * 4).cast(
            "int"
        ),
        [F.col("cents").asc(), F.col("o_custkey").asc()],
        rank_col="rk",
        total_col="n_total",
    )
    by_dec = (
        ranked.withColumn(
            "decile", ntile_from_rank(F.col("rk"), F.col("n_total"), 10)
        )
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum("cents").alias("rev"),
        )
        # 10-row relation consumed by the total AND the output join
        .cache()
    )
    total = by_dec.agg(F.sum("rev").alias("t"))
    wc = Window.orderBy("decile").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        by_dec.join(F.broadcast(total))
        .withColumn("cum_rev", F.sum("rev").over(wc))
        .select(
            "decile",
            "n_customers",
            F.col("rev").alias("revenue_cents"),
            stable_round(
                F.col("rev").cast("double") / F.col("t").cast("double"), 6
            ).alias("share"),
            stable_round(
                F.col("cum_rev").cast("double")
                / F.col("t").cast("double"),
                6,
            ).alias("cum_share"),
        )
        .orderBy("decile")
    )


ORACLE_LORENZ = f"""
WITH rev AS (
  SELECT o_custkey,
         sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), d AS (
  SELECT cents,
         ntile(10) OVER (ORDER BY cents ASC, o_custkey ASC) AS decile
  FROM rev
), by_dec AS (
  SELECT decile, count(*) AS n_customers,
         CAST(sum(cents) AS BIGINT) AS rev
  FROM d GROUP BY 1
), t AS (SELECT sum(rev) AS t FROM by_dec)
SELECT decile, n_customers, rev AS revenue_cents,
       {sql_stable_round("CAST(rev AS DOUBLE) / t.t", 6)} AS share,
       {sql_stable_round(
           "CAST(sum(rev) OVER (ORDER BY decile"
           " ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)"
           " AS DOUBLE) / t.t", 6)} AS cum_share
FROM by_dec, t
ORDER BY decile
""".strip()


# ------------------------------------------------ bot-signature report


def q_events_bot_detection(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """BOT-SIGNATURE screen per user: burst size (max events in any
    single minute), sustained rate (events per ACTIVE minute), and
    the flag both thresholds imply — the abuse/automation gate a
    training-data pipeline runs before user-behavior events become
    features (a scripted client's metronomic cadence is exactly what
    the family's Fano/inter-arrival-CV rows detect at the metric
    level; this is the per-ACTOR version). Top-_BOT_K by burst
    keeps the report bounded.

    Exactness: counts are exact; rate is ONE division. Rounded
    before ranking; user_id breaks ties.

    Scale: two stacked aggregates — (user, minute) then user — both
    with map-side partials; the report is a TakeOrdered heap, never
    a global sort of users."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        # floor, not truncate-toward-zero: matches the oracle's `//`
        # for pre-epoch (negative) timestamps (ADVICE r10)
        F.floor(F.unix_millis(F.col("ts")) / F.lit(60000))
        .cast("long")
        .alias("minute"),
    )
    per_min = ev.groupBy("user_id", "minute").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_user = per_min.groupBy("user_id").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("active_minutes"),
        F.max("c").alias("max_per_minute"),
    )
    rate = F.col("n_events").cast("double") / F.col(
        "active_minutes"
    ).cast("double")
    scored = per_user.select(
        "user_id",
        "n_events",
        "active_minutes",
        "max_per_minute",
        stable_round(rate, 6).alias("events_per_active_minute"),
        (
            (F.col("max_per_minute") >= _BOT_BURST)
            | (rate >= _BOT_RATE)
        ).alias("bot_flag"),
    )
    w = Window.orderBy(
        F.col("max_per_minute").desc(),
        F.col("n_events").desc(),
        F.col("user_id").asc(),
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _BOT_K)
        .select(
            "rk",
            "user_id",
            "n_events",
            "active_minutes",
            "max_per_minute",
            "events_per_active_minute",
            "bot_flag",
        )
    )


ORACLE_BOT = f"""
WITH per_min AS (
  SELECT user_id, epoch_ms(ts) // 60000 AS minute, count(*) AS c
  FROM events GROUP BY 1, 2
), per_user AS (
  SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
         count(*) AS active_minutes, max(c) AS max_per_minute
  FROM per_min GROUP BY 1
), scored AS (
  SELECT user_id, n_events, active_minutes, max_per_minute,
         {sql_stable_round(
             "CAST(n_events AS DOUBLE) / active_minutes", 6)}
           AS events_per_active_minute,
         (max_per_minute >= {_BOT_BURST}
          OR CAST(n_events AS DOUBLE) / active_minutes >= {_BOT_RATE})
           AS bot_flag
  FROM per_user
)
SELECT rk, user_id, n_events, active_minutes, max_per_minute,
       events_per_active_minute, bot_flag
FROM (
  SELECT *, row_number() OVER (ORDER BY max_per_minute DESC,
      n_events DESC, user_id ASC) AS rk
  FROM scored
) WHERE rk <= {_BOT_K}
""".strip()


# ------------------------------------------------ event path trigrams


def q_events_ngram_paths(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TOP event-type TRIGRAMS across user journeys: the most common
    3-step paths (sequential pattern mining's frequent-episode
    baseline) — the path-shape complement to the family's Markov
    transition matrix (pairwise) and session top-paths (entry
    prefix) rows; 3-step windows are where funnel shapes first
    become visible. Ordered by (ts, event_id) within user so ties
    are deterministic.

    Exactness: pure counts. Top-_PATH_K by count, trigram breaks
    ties.

    Scale: ONE window partitioned by user (per-user sequences are
    bounded), a trigram-vocabulary aggregate with map-side partials,
    then a TakeOrdered heap."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = (
        ev.select(
            "user_id",
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
            F.lead("event_type", 2).over(w).alias("e3"),
        )
        .filter(F.col("e3").isNotNull())
        .groupBy("e1", "e2", "e3")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    wr = Window.orderBy(
        F.col("n").desc(),
        F.col("e1").asc(),
        F.col("e2").asc(),
        F.col("e3").asc(),
    )
    return (
        tri.withColumn("rk", F.row_number().over(wr))
        .filter(F.col("rk") <= _PATH_K)
        .select("rk", "e1", "e2", "e3", "n")
    )


ORACLE_NGRAM_PATHS = f"""
WITH seq AS (
  SELECT user_id, event_type AS e1,
         lead(event_type, 1) OVER w AS e2,
         lead(event_type, 2) OVER w AS e3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), tri AS (
  SELECT e1, e2, e3, count(*) AS n FROM seq
  WHERE e3 IS NOT NULL GROUP BY 1, 2, 3
)
SELECT rk, e1, e2, e3, n FROM (
  SELECT *, row_number() OVER
    (ORDER BY n DESC, e1 ASC, e2 ASC, e3 ASC) AS rk
  FROM tri
) WHERE rk <= {_PATH_K}
""".strip()


# ------------------------------------------------ Dunning G² collocations


def q_text_collocation_g2(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DUNNING LOG-LIKELIHOOD (G²) collocations (Dunning 1993): the
    2×2 contingency test over adjacent bigrams — the
    low-count-robust ranking PMI famously is not (PMI inflates rare
    pairs; G² weights evidence by volume), and the second opinion
    the phrase-mining stage wants beside `text_bigram_pmi`. Same
    tokenization as the PMI row (split on single space), marginals
    from the bigram table so the contingency sums to the bigram
    total exactly.

    G² = 2·Σ O·ln(O/E) over the 4 cells (zero cells contribute 0);
    every O is an exact count and E a ratio of exact integers — the
    ln tree has a fixed 4-term shape both engines evaluate
    identically; rounded BEFORE ranking, (w1, w2) breaks ties.

    Scale: the corpus-sized explode collapses once into the bigram
    vocabulary aggregate (map-side partials); marginals are two
    re-aggregations of THAT table joined back vocabulary-sized;
    top-K is a heap."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    grams = (
        docs.select(F.split(F.col("text"), " ").alias("ws"))
        .select(
            F.explode(
                F.expr(
                    "transform(sequence(0, size(ws) - 2),"
                    " i -> struct(ws[i] as w1, ws[i + 1] as w2))"
                )
            ).alias("g")
        )
        .select("g.w1", "g.w2")
    )
    # r11 optimization (guide §2.4): the bigram vocabulary aggregate
    # feeds four consumers (row/col marginals, the total, and the
    # contingency join) — materialize it once so the corpus-sized
    # explode collapses exactly one time.
    big = grams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c")
    ).cache()
    ra = big.groupBy("w1").agg(F.sum("c").alias("ra"))
    cb = big.groupBy("w2").agg(F.sum("c").alias("cb"))
    tot = big.agg(F.sum("c").alias("t"))
    j = (
        big.filter(F.col("c") >= _G2_MIN_COUNT)
        .join(ra, "w1")
        .join(cb, "w2")
        .join(F.broadcast(tot))
    )
    o11 = F.col("c").cast("double")
    o12 = (F.col("ra") - F.col("c")).cast("double")
    o21 = (F.col("cb") - F.col("c")).cast("double")
    o22 = (
        F.col("t") - F.col("ra") - F.col("cb") + F.col("c")
    ).cast("double")
    t = F.col("t").cast("double")
    r1 = F.col("ra").cast("double")
    r2 = (F.col("t") - F.col("ra")).cast("double")
    c1 = F.col("cb").cast("double")
    c2 = (F.col("t") - F.col("cb")).cast("double")

    def term(o, row, col):
        return F.when(o > 0, o * F.log(o * t / (row * col))).otherwise(
            F.lit(0.0)
        )

    g2 = 2.0 * (
        term(o11, r1, c1)
        + term(o12, r1, c2)
        + term(o21, r2, c1)
        + term(o22, r2, c2)
    )
    scored = j.select(
        "w1", "w2", F.col("c").alias("n_ab"),
        stable_round(g2, 4).alias("g2"),
    )
    w = Window.orderBy(
        F.col("g2").desc(), F.col("w1").asc(), F.col("w2").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _G2_K)
        .select("rk", "w1", "w2", "n_ab", "g2")
    )


_G2_TERM = (
    "CASE WHEN {o} > 0 THEN {o} * ln({o} * t / ({row} * {col}))"
    " ELSE 0 END"
)


ORACLE_G2 = f"""
WITH w AS (
  SELECT string_split(text, ' ') AS ws FROM documents
), g AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM w, unnest(range(1, len(ws))) AS t(i)
), big AS (
  SELECT w1, w2, count(*) AS c FROM g GROUP BY 1, 2
), ra AS (SELECT w1, CAST(sum(c) AS BIGINT) AS ra FROM big GROUP BY 1),
cb AS (SELECT w2, CAST(sum(c) AS BIGINT) AS cb FROM big GROUP BY 1),
tot AS (SELECT CAST(sum(c) AS BIGINT) AS tt FROM big),
j AS (
  SELECT w1, w2, c,
         CAST(c AS DOUBLE) AS o11,
         CAST(ra - c AS DOUBLE) AS o12,
         CAST(cb - c AS DOUBLE) AS o21,
         CAST(tt - ra - cb + c AS DOUBLE) AS o22,
         CAST(tt AS DOUBLE) AS t,
         CAST(ra AS DOUBLE) AS r1, CAST(tt - ra AS DOUBLE) AS r2,
         CAST(cb AS DOUBLE) AS c1, CAST(tt - cb AS DOUBLE) AS c2
  FROM big JOIN ra USING (w1) JOIN cb USING (w2), tot
  WHERE c >= {_G2_MIN_COUNT}
), scored AS (
  SELECT w1, w2, c AS n_ab,
         {sql_stable_round(
             "2.0 * ("
             + _G2_TERM.format(o="o11", row="r1", col="c1") + " + "
             + _G2_TERM.format(o="o12", row="r1", col="c2") + " + "
             + _G2_TERM.format(o="o21", row="r2", col="c1") + " + "
             + _G2_TERM.format(o="o22", row="r2", col="c2") + ")",
             4)} AS g2
  FROM j
)
SELECT rk, w1, w2, n_ab, g2 FROM (
  SELECT *, row_number() OVER
    (ORDER BY g2 DESC, w1 ASC, w2 ASC) AS rk
  FROM scored
) WHERE rk <= {_G2_K}
""".strip()


# ------------------------------------------------ Simpson diversity


def q_text_simpson_diversity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SIMPSON VOCABULARY DIVERSITY per source (Simpson 1949):
    D = Σ n_w(n_w−1) / (N(N−1)) — the probability two tokens drawn
    without replacement from a source are the SAME word — plus the
    effective vocabulary 1/D. The repeat-probability complement to
    the family's entropy/Zipf/Heaps/hapax rows: D is exact under
    integer counts (entropy is not), so it gives the corpus-mix
    dashboard a hash-stable concentration number per source.

    Exactness: Σ n(n−1) rides DEC38; D is ONE division; 1/D one
    more on the already-rounded-free exact ratio (computed from the
    same integers, not from rounded D).

    Scale: the corpus explode collapses to (source, word) counts
    (map-side partials), then a source-sized aggregate."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    words = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    )
    counts = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("n")
    )
    dec = "decimal(38,0)"
    per = counts.groupBy("source").agg(
        F.sum("n").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("n").cast(dec) * (F.col("n") - 1)).alias("ss"),
    )
    d_num = F.col("ss").cast("double")
    d_den = (
        F.col("n_tokens").cast(dec) * (F.col("n_tokens") - 1)
    ).cast("double")
    return per.select(
        "source",
        "n_tokens",
        "n_types",
        stable_round(d_num / d_den, 8).alias("simpson"),
        stable_round(d_den / d_num, 4).alias("effective_vocab"),
    ).orderBy("source")


ORACLE_SIMPSON = f"""
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), counts AS (
  SELECT source, w, count(*) AS n FROM words GROUP BY 1, 2
), per AS (
  SELECT source, CAST(sum(n) AS BIGINT) AS n_tokens,
         count(*) AS n_types,
         sum(CAST(n AS HUGEINT) * (n - 1)) AS ss
  FROM counts GROUP BY 1
)
SELECT source, n_tokens, n_types,
       {sql_stable_round(
           "CAST(ss AS DOUBLE) / CAST(CAST(n_tokens AS HUGEINT)"
           " * (n_tokens - 1) AS DOUBLE)", 8)} AS simpson,
       {sql_stable_round(
           "CAST(CAST(n_tokens AS HUGEINT) * (n_tokens - 1) AS DOUBLE)"
           " / CAST(ss AS DOUBLE)", 4)} AS effective_vocab
FROM per ORDER BY source
""".strip()


# ------------------------------------------------ stopword-profile cosine


def q_text_stopword_cosine(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """STOPWORD-PROFILE COSINE between sources: each source's counts
    over a fixed 20-word function-word list, cosine
    between every source pair — function-word profiles are the
    classical register/authorship fingerprint (the corpus-level
    cousin of the family's Burrows' Delta row, which works per
    document) and a cheap drift screen between ingestion sources.

    Exactness: integer count vectors; Σab and the two norms ride
    DEC38; cosine is ONE sqrt-division expression. stable_round(6).

    Scale: the explode filters to the broadcast 20-word list BEFORE
    the aggregate, so the profile relation is |sources|×20; the
    cosine cross is |sources|²."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    words = docs.select(
        "source", F.explode(F.split(F.col("text"), " ")).alias("w")
    ).filter(F.col("w").isin(*_STOPWORDS))
    # r11 (guide §2.4): the |sources|×20-row profile feeds both
    # cosine sides AND the norms — uncached, the corpus explode
    # re-executed 3×; cache the bounded profile once.
    prof = words.groupBy("source", "w").agg(
        F.count(F.lit(1)).alias("n")
    ).cache()
    a = prof.select(
        F.col("source").alias("s1"), "w", F.col("n").alias("na")
    )
    b = prof.select(
        F.col("source").alias("s2"), "w", F.col("n").alias("nb")
    )
    dec = "decimal(38,0)"
    dots = (
        a.join(b, "w")
        .filter(F.col("s1") < F.col("s2"))
        .groupBy("s1", "s2")
        .agg(
            F.sum(F.col("na").cast(dec) * F.col("nb").cast(dec)).alias(
                "dot"
            )
        )
    )
    norms = prof.groupBy("source").agg(
        F.sum(F.col("n").cast(dec) * F.col("n").cast(dec)).alias("nn")
    )
    return (
        dots.join(
            F.broadcast(
                norms.select(
                    F.col("source").alias("s1"), F.col("nn").alias("na2")
                )
            ),
            "s1",
        )
        .join(
            F.broadcast(
                norms.select(
                    F.col("source").alias("s2"), F.col("nn").alias("nb2")
                )
            ),
            "s2",
        )
        .select(
            "s1",
            "s2",
            stable_round(
                F.col("dot").cast("double")
                / F.sqrt(
                    F.col("na2").cast("double")
                    * F.col("nb2").cast("double")
                ),
                6,
            ).alias("cosine"),
        )
        .orderBy("s1", "s2")
    )


_STOP_SQL = ", ".join(f"'{w}'" for w in _STOPWORDS)

ORACLE_STOPWORD_COSINE = f"""
WITH words AS (
  SELECT source, unnest(string_split(text, ' ')) AS w FROM documents
), prof AS (
  SELECT source, w, count(*) AS n FROM words
  WHERE w IN ({_STOP_SQL}) GROUP BY 1, 2
), dots AS (
  SELECT a.source AS s1, b.source AS s2,
         sum(CAST(a.n AS HUGEINT) * b.n) AS dot
  FROM prof a JOIN prof b ON a.w = b.w AND a.source < b.source
  GROUP BY 1, 2
), norms AS (
  SELECT source, sum(CAST(n AS HUGEINT) * n) AS nn
  FROM prof GROUP BY 1
)
SELECT s1, s2,
       {sql_stable_round(
           "CAST(dot AS DOUBLE)"
           " / sqrt(CAST(na.nn AS DOUBLE) * CAST(nb.nn AS DOUBLE))",
           6)} AS cosine
FROM dots
JOIN norms na ON na.source = dots.s1
JOIN norms nb ON nb.source = dots.s2
ORDER BY s1, s2
""".strip()


# ------------------------------------------------ Markov entropy rate


def q_events_entropy_rate(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """MARKOV ENTROPY RATE of the event stream (Shannon 1948): H =
    −Σ_ij (n_ij/T)·ln(n_ij/n_i•) over user-ordered transition counts
    — nats of genuine surprise per step once first-order structure
    is accounted for, with perplexity e^H as "effective branching
    factor". The one-number compressibility readout over the same
    transition table the family's Markov accuracy / next-entropy
    rows consume: falling H under stable volume means journeys are
    getting more scripted (bots, or a funnel redesign working).

    Exactness: transition counts and marginals are exact integers;
    each term's ln is a ratio of integers, and the ≤ |types|² terms
    sum in ONE deterministic sorted-order fold (the Kruskal-Wallis
    convention — both engines add the same doubles in the same
    order). e^H on the final scalar.

    Scale: ONE window partitioned by user builds transitions; counts
    collapse to the |types|² table (map-side partials); the fold
    input is that bounded array."""
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        ev.select(
            F.col("event_type").alias("e1"),
            F.lead("event_type", 1).over(w).alias("e2"),
        )
        .filter(F.col("e2").isNotNull())
        .groupBy("e1", "e2")
        .agg(F.count(F.lit(1)).alias("n"))
        # r11 (guide §2.4): the |types|²-bounded transition table
        # feeds the marginals, the totals AND the fold join —
        # uncached, the corpus-wide user-ordered window re-executed
        # per consumer (4 FileScans → 1).
        .cache()
    )
    marg = trans.groupBy("e1").agg(F.sum("n").alias("ni"))
    tot = trans.agg(
        F.sum("n").alias("t"),
        F.count(F.lit(1)).alias("n_cells"),
    )
    n_states = marg.agg(F.count(F.lit(1)).alias("n_states"))
    folded = (
        trans.join(marg, "e1")
        .select(F.struct("e1", "e2", "n", "ni").alias("cell"))
        .agg(F.sort_array(F.collect_list("cell")).alias("cells"))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(n_states))
    )
    h = F.expr(
        "aggregate(cells, cast(0.0 as double), (acc, x) ->"
        " acc + (cast(x.n as double) / cast(t as double))"
        "     * ln(cast(x.ni as double) / cast(x.n as double)))"
    )
    return folded.select(
        F.col("t").alias("n_transitions"),
        F.col("n_states").cast("int").alias("n_states"),
        stable_round(h, 6).alias("entropy_rate_nats"),
        stable_round(F.exp(h), 4).alias("perplexity"),
    )


ORACLE_ENTROPY_RATE = f"""
WITH seq AS (
  SELECT event_type AS e1,
         lead(event_type, 1) OVER
           (PARTITION BY user_id ORDER BY ts, event_id) AS e2
  FROM events
), trans AS (
  SELECT e1, e2, count(*) AS n FROM seq
  WHERE e2 IS NOT NULL GROUP BY 1, 2
), marg AS (SELECT e1, CAST(sum(n) AS BIGINT) AS ni FROM trans
            GROUP BY 1),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS t FROM trans),
ns AS (SELECT count(*) AS n_states FROM marg),
folded AS (
  SELECT list_sort(list({{'e1': e1, 'e2': e2, 'n': n, 'ni': ni}}))
           AS cells
  FROM trans JOIN marg USING (e1)
)
SELECT t AS n_transitions, CAST(n_states AS INT) AS n_states,
       {sql_stable_round(
           "list_sum(list_transform(cells, x ->"
           " (CAST(x.n AS DOUBLE) / CAST(t AS DOUBLE))"
           " * ln(CAST(x.ni AS DOUBLE) / CAST(x.n AS DOUBLE))))",
           6)} AS entropy_rate_nats,
       {sql_stable_round(
           "exp(list_sum(list_transform(cells, x ->"
           " (CAST(x.n AS DOUBLE) / CAST(t AS DOUBLE))"
           " * ln(CAST(x.ni AS DOUBLE) / CAST(x.n AS DOUBLE)))))",
           4)} AS perplexity
FROM folded, tot, ns
""".strip()


# ------------------------------------------------ Chao1 richness


def q_corpus_chao1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHAO1 VOCABULARY-RICHNESS estimator per source (Chao 1984,
    bias-corrected form): V̂ = V + F1(F1−1)/(2(F2+1)) from the
    observed type count and the singleton/doubleton counts — the
    ecology species-richness estimator applied to vocabulary: "how
    many word types does this source REALLY have, given how many
    we've only seen once?" The forward-looking complement to the
    family's Heaps-law fit (that extrapolates the growth CURVE; this
    estimates the asymptote from the tail shape), plus the coverage
    estimate 1 − F1/N (Good-Turing) saying how much of the source's
    token mass is already represented.

    Exactness: V, F1, F2, N are exact counts; the estimator and
    coverage are ONE fixed-shape expression each. stable_round.

    Scale: the corpus explode collapses to (source, word) counts
    (map-side partials), then TWO source-sized aggregations."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    counts = (
        docs.select(
            "source", F.explode(F.split(F.col("text"), " ")).alias("w")
        )
        .groupBy("source", "w")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per = counts.groupBy("source").agg(
        F.count(F.lit(1)).alias("v_obs"),
        F.sum("n").alias("n_tokens"),
        F.sum(F.when(F.col("n") == 1, 1).otherwise(0)).alias("f1"),
        F.sum(F.when(F.col("n") == 2, 1).otherwise(0)).alias("f2"),
    )
    f1 = F.col("f1").cast("double")
    f2 = F.col("f2").cast("double")
    chao1 = F.col("v_obs").cast("double") + f1 * (f1 - 1.0) / (
        2.0 * (f2 + 1.0)
    )
    coverage = 1.0 - f1 / F.col("n_tokens").cast("double")
    return per.select(
        "source",
        "n_tokens",
        "v_obs",
        "f1",
        "f2",
        stable_round(chao1, 4).alias("chao1"),
        stable_round(coverage, 6).alias("coverage"),
    ).orderBy("source")


ORACLE_CHAO1 = f"""
WITH counts AS (
  SELECT source, w, count(*) AS n
  FROM (SELECT source, unnest(string_split(text, ' ')) AS w
        FROM documents)
  GROUP BY 1, 2
), per AS (
  SELECT source, count(*) AS v_obs,
         CAST(sum(n) AS BIGINT) AS n_tokens,
         CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
         CAST(sum(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
  FROM counts GROUP BY 1
)
SELECT source, n_tokens, v_obs, f1, f2,
       {sql_stable_round(
           "CAST(v_obs AS DOUBLE) + CAST(f1 AS DOUBLE)"
           " * (f1 - 1.0) / (2.0 * (f2 + 1.0))", 4)} AS chao1,
       {sql_stable_round(
           "1.0 - CAST(f1 AS DOUBLE) / n_tokens", 6)} AS coverage
FROM per ORDER BY source
""".strip()


_MTLD_TTR = 0.72  # McCarthy & Jarvis factor-completion threshold


def q_text_mtld(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MTLD lexical diversity per source (McCarthy & Jarvis 2010,
    forward pass): walk each document's tokens left-to-right, close a
    "factor" every time the running type-token ratio drops below
    0.72, and report tokens-per-factor — the length-INVARIANT
    lexical-diversity measure (raw TTR falls with document length;
    MTLD is the field's standard fix) beside the family's
    hapax/Simpson/entropy rows. Per-source mean over per-doc MTLD;
    docs whose TTR never dips (no factor, zero partial) report
    unfactored and stay out of the mean.

    The sequential fold runs INSIDE both engines as an ordered
    array reduction (Spark `aggregate` with a struct state; DuckDB
    `list_reduce` with a flat-list state — a struct-typed
    accumulator loses its list field across iterations in DuckDB
    1.0, so the state rides as [n, f, ...types]); the per-doc MTLD
    is ONE fixed-shape expression, e4-fixed before the exact
    integer source mean.

    Scale: row-local compute, O(tokens × factor length) per doc
    (factors reset at the threshold, so the type array stays
    factor-sized); the corpus collapses to a source-sized mean."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    st = F.expr(
        f"""aggregate(
          ws,
          struct(cast(array() as array<string>) as ty,
                 0 as n, 0 as f),
          (acc, w) -> if(
            cast(size(if(array_contains(acc.ty, w), acc.ty,
                         array_append(acc.ty, w))) as double)
              / (acc.n + 1) < {_MTLD_TTR},
            struct(cast(array() as array<string>) as ty,
                   0 as n, acc.f + 1 as f),
            struct(if(array_contains(acc.ty, w), acc.ty,
                      array_append(acc.ty, w)) as ty,
                   acc.n + 1 as n, acc.f as f)))"""
    )
    per_doc = docs.select(
        "source",
        F.split(F.col("text"), " ").alias("ws"),
    ).select(
        "source",
        F.size("ws").alias("n_tokens"),
        st.alias("st"),
    )
    partial = F.when(
        F.col("st.n") > 0,
        (
            1.0
            - F.size("st.ty").cast("double")
            / F.col("st.n").cast("double")
        )
        / F.lit(1.0 - _MTLD_TTR),
    ).otherwise(F.lit(0.0))
    denom = F.col("st.f").cast("double") + partial
    mtld = F.when(
        denom > 0,
        F.least(
            F.col("n_tokens").cast("double"),
            F.col("n_tokens").cast("double") / denom,
        ),
    )
    scored = per_doc.select(
        "source",
        F.floor(mtld * 10000 + F.lit(0.5)).cast("long").alias("m4"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("m4").isNull(), 1).otherwise(0)).alias(
                "n_unfactored"
            ),
            F.count("m4").alias("n_scored"),
            F.sum("m4").alias("sm4"),
        )
        .select(
            "source",
            "n_docs",
            "n_unfactored",
            stable_round(
                F.col("sm4").cast("double")
                / (F.col("n_scored").cast("double") * 10000.0),
                4,
            ).alias("mean_mtld"),
        )
        .orderBy("source")
    )


ORACLE_MTLD = f"""
WITH folded AS (
  SELECT source, len(ws) AS n_tokens,
    list_reduce(
      list_transform(ws, w -> ['1', '0', w]),
      (acc, x) -> CASE
        WHEN CAST(len(CASE WHEN list_contains(acc[3:], x[3])
                      THEN acc[3:]
                      ELSE list_append(acc[3:], x[3]) END) AS DOUBLE)
             / (CAST(acc[1] AS INT) + 1) < {_MTLD_TTR}
        THEN ['0', CAST(CAST(acc[2] AS INT) + 1 AS VARCHAR)]
        ELSE list_concat(
               [CAST(CAST(acc[1] AS INT) + 1 AS VARCHAR), acc[2]],
               CASE WHEN list_contains(acc[3:], x[3])
                    THEN acc[3:]
                    ELSE list_append(acc[3:], x[3]) END)
      END) AS st
  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
), per_doc AS (
  SELECT source, n_tokens,
         CAST(st[1] AS INT) AS rem_n,
         CAST(st[2] AS INT) AS f,
         len(st) - 2 AS rem_ty
  FROM folded
), m AS (
  SELECT source,
         CASE WHEN (f + CASE WHEN rem_n > 0
                    THEN (1.0 - CAST(rem_ty AS DOUBLE) / rem_n)
                         / {1.0 - _MTLD_TTR}
                    ELSE 0.0 END) > 0
         THEN CAST(floor(LEAST(CAST(n_tokens AS DOUBLE),
              CAST(n_tokens AS DOUBLE)
              / (f + CASE WHEN rem_n > 0
                     THEN (1.0 - CAST(rem_ty AS DOUBLE) / rem_n)
                          / {1.0 - _MTLD_TTR}
                     ELSE 0.0 END)) * 10000 + 0.5) AS BIGINT)
         END AS m4
  FROM per_doc
)
SELECT source, count(*) AS n_docs,
       CAST(sum(CASE WHEN m4 IS NULL THEN 1 ELSE 0 END) AS BIGINT)
         AS n_unfactored,
       {sql_stable_round(
           "CAST(sum(m4) AS DOUBLE) / (count(m4) * 10000.0)", 4)}
         AS mean_mtld
FROM m GROUP BY source ORDER BY source
""".strip()


def q_text_lz_complexity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """LZ78 PHRASE COMPLEXITY per source (Ziv & Lempel 1978): the
    token stream's incremental-parse phrase count over its length —
    the in-engine twin of the gzip-compressibility quality signal
    web-corpus pipelines use (highly repetitive boilerplate parses
    into few long phrases → low ratio; diverse prose stays near 1).
    Complements MTLD: MTLD sees TYPE diversity, LZ78 sees STRUCTURE
    (a doc cycling 'a b a b …' has 2 types but also collapses here).

    The incremental parse is the same cross-engine ordered array
    reduction as `text_mtld` (Spark `aggregate` struct state; DuckDB
    `list_reduce` flat-list state — [n, cur, ...dict] — because
    struct accumulators lose list fields in DuckDB 1.0; the
    first-element-as-init semantics are aligned by seeding the
    count at 1). Per-doc ratio e4-fixed before the exact source
    mean.

    Scale: row-local compute, O(tokens × dict size) per doc; the
    corpus collapses to a source-sized mean."""
    from monasca_aggregator_spark.operators.textops import (
        lz78_phrases,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    per_doc = docs.select(
        "source", F.split(F.col("text"), " ").alias("ws")
    ).select(
        "source",
        F.size("ws").alias("n_tokens"),
        lz78_phrases(F.col("ws")).alias("phrases"),
    )
    ratio = F.col("phrases").cast("double") / F.col(
        "n_tokens"
    ).cast("double")
    scored = per_doc.filter(F.col("n_tokens") > 0).select(
        "source",
        F.floor(ratio * 10000 + F.lit(0.5)).cast("long").alias("r4"),
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("r4").alias("sr4"),
        )
        .select(
            "source",
            "n_docs",
            stable_round(
                F.col("sr4").cast("double")
                / (F.col("n_docs").cast("double") * 10000.0),
                4,
            ).alias("mean_lz_ratio"),
        )
        .orderBy("source")
    )


ORACLE_LZ = f"""
WITH folded AS (
  SELECT source, len(ws) AS n_tokens,
    list_reduce(
      list_transform(ws, w -> ['1', '', w]),
      (acc, x) -> CASE
        WHEN list_contains(acc[3:],
             CASE WHEN acc[2] = '' THEN x[3]
                  ELSE acc[2] || ' ' || x[3] END)
        THEN list_concat([acc[1],
             CASE WHEN acc[2] = '' THEN x[3]
                  ELSE acc[2] || ' ' || x[3] END], acc[3:])
        ELSE list_concat(
             [CAST(CAST(acc[1] AS INT) + 1 AS VARCHAR), ''],
             list_append(acc[3:],
               CASE WHEN acc[2] = '' THEN x[3]
                    ELSE acc[2] || ' ' || x[3] END))
      END) AS st
  FROM (SELECT source, string_split(text, ' ') AS ws FROM documents)
), per_doc AS (
  SELECT source, n_tokens,
         CAST(st[1] AS INT)
           + CASE WHEN st[2] <> '' THEN 1 ELSE 0 END AS phrases
  FROM folded WHERE n_tokens > 0
), m AS (
  SELECT source,
         CAST(floor(CAST(phrases AS DOUBLE) / n_tokens * 10000
                    + 0.5) AS BIGINT) AS r4
  FROM per_doc
)
SELECT source, count(*) AS n_docs,
       {sql_stable_round(
           "CAST(sum(r4) AS DOUBLE) / (count(*) * 10000.0)", 4)}
         AS mean_lz_ratio
FROM m GROUP BY source ORDER BY source
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "text_lz_complexity": q_text_lz_complexity,
    "text_mtld": q_text_mtld,
    "corpus_chao1": q_corpus_chao1,
    "events_entropy_rate": q_events_entropy_rate,
    "basket_association_lift": q_basket_association_lift,
    "graph_assortativity": q_graph_assortativity,
    "revenue_lorenz_deciles": q_revenue_lorenz_deciles,
    "events_bot_detection": q_events_bot_detection,
    "events_ngram_paths": q_events_ngram_paths,
    "text_collocation_g2": q_text_collocation_g2,
    "text_simpson_diversity": q_text_simpson_diversity,
    "text_stopword_cosine": q_text_stopword_cosine,
}

ORACLES: dict[str, str] = {
    "text_lz_complexity": ORACLE_LZ,
    "text_mtld": ORACLE_MTLD,
    "corpus_chao1": ORACLE_CHAO1,
    "events_entropy_rate": ORACLE_ENTROPY_RATE,
    "basket_association_lift": ORACLE_LIFT,
    "graph_assortativity": ORACLE_ASSORTATIVITY,
    "revenue_lorenz_deciles": ORACLE_LORENZ,
    "events_bot_detection": ORACLE_BOT,
    "events_ngram_paths": ORACLE_NGRAM_PATHS,
    "text_collocation_g2": ORACLE_G2,
    "text_simpson_diversity": ORACLE_SIMPSON,
    "text_stopword_cosine": ORACLE_STOPWORD_COSINE,
}
