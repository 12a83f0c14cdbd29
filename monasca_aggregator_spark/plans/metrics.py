"""Driver-facing queries exercising the spec engine (reference parity).

Each entry runs a real AggregationSpec through
``operators.aggregate.build_aggregation`` on the ``events`` table
(adapted to the envelope relation) and projects the map-typed output
dimensions to plain columns so the DuckDB oracle can reproduce it in
plain SQL.

Window size is 3600 s (hourly, epoch-aligned), the reference's
windowSize knob (reference: config.yaml `windowSize`).

Float policy: sums/avgs are rounded to 4 decimals on BOTH sides (double
summation is order-dependent under parallel partial aggregation);
min/max/delta/rate involve no reordered accumulation, so they compare
exactly.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.functions.windows import window_start_ms
from monasca_aggregator_spark.models import AggregationSpec, Rollup
from monasca_aggregator_spark.operators.aggregate import build_aggregation
from monasca_aggregator_spark.sources.envelope import events_to_envelopes
from monasca_aggregator_spark.sources.tables import load_table

WINDOW_SEC = 3600
_W_MS = WINDOW_SEC * 1000

# DuckDB SQL fragment for the same epoch-aligned window start (ms).
_W_SQL = f"(epoch_ms(ts) // {_W_MS}) * {_W_MS}"


def _run(
    spark: SparkSession,
    sf_dir: str,
    spec: AggregationSpec,
    *,
    round_value: int | None,
    dim_keys: tuple[str, ...],
) -> DataFrame:
    env = events_to_envelopes(load_table(spark, sf_dir, "events"))
    out = build_aggregation(env, spec, WINDOW_SEC)
    cols = [F.col("window_ts_ms")]
    for k in dim_keys:
        cols.append(F.col("dimensions").getItem(k).alias(k))
    value = F.col("value")
    if round_value is not None:
        value = stable_round(value, round_value)
    cols.append(value.alias("value"))
    return out.select(*cols)


def _spec(function: str, metric: str, **kw) -> AggregationSpec:
    return AggregationSpec(
        name=f"{function}_{metric}",
        aggregated_metric_name=f"agg.{metric}.{function}",
        filtered_metric_name=metric,
        function=function,
        **kw,
    )


def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _spec("count", "purchase", grouped_dimensions=("user_id",))
    return _run(spark, sf_dir, spec, round_value=None, dim_keys=("user_id",))


def q_agg_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _spec("sum", "click", grouped_dimensions=("user_id",))
    return _run(spark, sf_dir, spec, round_value=4, dim_keys=("user_id",))


def q_agg_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _spec("avg", "view", grouped_dimensions=("user_id",))
    return _run(spark, sf_dir, spec, round_value=4, dim_keys=("user_id",))


def q_agg_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _spec("min", "error", grouped_dimensions=("user_id",))
    return _run(spark, sf_dir, spec, round_value=None, dim_keys=("user_id",))


def q_agg_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _spec("max", "error", grouped_dimensions=("user_id",))
    return _run(spark, sf_dir, spec, round_value=None, dim_keys=("user_id",))


def q_agg_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _spec("delta", "signup", grouped_dimensions=("user_id",))
    return _run(spark, sf_dir, spec, round_value=4, dim_keys=("user_id",))


def q_agg_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    spec = _spec("rate", "signup", grouped_dimensions=("user_id",))
    return _run(spark, sf_dir, spec, round_value=8, dim_keys=("user_id",))


def q_agg_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """filteredDimensions: keep only metrics with dim k=7."""
    spec = _spec(
        "count",
        "click",
        filtered_dimensions={"k": "7"},
        grouped_dimensions=("user_id",),
    )
    return _run(spark, sf_dir, spec, round_value=None, dim_keys=("user_id",))


def q_agg_rejected(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rejectedDimensions: drop metrics from user_id=13."""
    spec = _spec(
        "count",
        "purchase",
        rejected_dimensions={"user_id": "13"},
        grouped_dimensions=("user_id",),
    )
    return _run(spark, sf_dir, spec, round_value=None, dim_keys=("user_id",))


def q_agg_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-dimension grouping (user_id x k)."""
    spec = _spec("avg", "view", grouped_dimensions=("user_id", "k"))
    return _run(spark, sf_dir, spec, round_value=4, dim_keys=("user_id", "k"))


def q_agg_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage: avg per (window,user) then sum of the avgs per window
    (the reference's rollup concept, aggregation-specifications.yaml
    Aggregation3)."""
    spec = _spec(
        "avg",
        "purchase",
        grouped_dimensions=("user_id",),
        rollup=Rollup(function="sum", grouped_dimensions=()),
    )
    return _run(spark, sf_dir, spec, round_value=4, dim_keys=())


def q_agg_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-window distinct cardinality (beyond the reference's 7
    functions; the metric every monitoring pipeline adds first). Exact
    count_distinct = two-phase shuffle; at extreme cardinality swap in
    approx_count_distinct (HLL++, one pass) — same plan shape."""
    env = events_to_envelopes(load_table(spark, sf_dir, "events"))
    w = window_start_ms(F.col("timestamp"), WINDOW_SEC)
    return (
        env.filter(F.col("name") == "click")
        .groupBy(w.alias("window_ts_ms"))
        .agg(
            F.count_distinct(
                F.col("dimensions").getItem("user_id")
            ).alias("distinct_users")
        )
    )


ORACLE_DISTINCT = f"""
SELECT {_W_SQL} AS window_ts_ms,
       count(DISTINCT user_id) AS distinct_users
FROM events WHERE event_type = 'click' GROUP BY 1
""".strip()


def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-window median (linear-interpolated, matching DuckDB's
    quantile_cont). Exact percentiles need the full value multiset per
    group (one shuffle); at 100 TB use approx_percentile (t-digest
    sketch, map-side combinable) — same query shape, bounded state."""
    env = events_to_envelopes(load_table(spark, sf_dir, "events"))
    w = window_start_ms(F.col("timestamp"), WINDOW_SEC)
    return (
        env.filter(F.col("name") == "view")
        .groupBy(w.alias("window_ts_ms"))
        .agg(stable_round(F.median("value"), 4).alias("median_value"))
    )


ORACLE_MEDIAN = f"""
SELECT {_W_SQL} AS window_ts_ms,
       {sql_stable_round("median(value)", 4)} AS median_value
FROM events WHERE event_type = 'view' GROUP BY 1
""".strip()


def q_agg_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window distinct cardinality via HLL++ sketch
    (approx_count_distinct) — the bounded-state path that replaces
    exact count_distinct's two-phase shuffle at 100 TB: one pass,
    map-side-combinable fixed-size sketches. At rsd=0.005 HLL++ stays
    in its exact sparse representation up to ~6k distincts per group,
    so at test SFs (≤ a few hundred distinct users per window) the
    result is bit-exact vs the DuckDB COUNT(DISTINCT) oracle; at real
    scale error is bounded by rsd (tests/test_sketches.py asserts the
    bound)."""
    env = events_to_envelopes(load_table(spark, sf_dir, "events"))
    w = window_start_ms(F.col("timestamp"), WINDOW_SEC)
    return (
        env.filter(F.col("name") == "click")
        .groupBy(w.alias("window_ts_ms"))
        .agg(
            F.approx_count_distinct(
                F.col("dimensions").getItem("user_id"), rsd=0.005
            ).alias("distinct_users")
        )
    )


ORACLE_DISTINCT_HLL = f"""
SELECT {_W_SQL} AS window_ts_ms,
       count(DISTINCT user_id) AS distinct_users
FROM events WHERE event_type = 'click' GROUP BY 1
""".strip()


def q_agg_distinct_rollup_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch REAGGREGATION: hourly DataSketches-HLL sketches of
    distinct users, merged to daily via hll_union_agg — the
    pre-aggregated rollup a 100 TB metric store serves 'daily uniques'
    from WITHOUT rescanning raw events (distinct counts don't sum; the
    sketches union losslessly). Two aggregation levels but the second
    one only touches #hours sketch rows. At lgConfigK=14 the sketch
    stays in its exact coupon representation for the test-SF
    cardinalities (≤ ~600/day, verified exact vs COUNT DISTINCT at
    sf0.1); at real scale error is the sketch's ±rsd. The reference has
    no distinct support at all — rollup here exercises its two-stage
    rollup concept (aggregation_rule.go:88) on a non-additive metric."""
    ev = load_table(spark, sf_dir, "events").filter(
        F.col("event_type") == "click"
    )
    hour = (F.unix_millis(F.col("ts")) / F.lit(_W_MS)).cast("long")
    hourly = ev.groupBy(hour.alias("h")).agg(
        F.hll_sketch_agg(F.col("user_id"), 14).alias("sk")
    )
    day = F.floor(F.col("h") / 24).cast("long") * F.lit(86400000)
    return hourly.groupBy(day.alias("day_ts_ms")).agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("distinct_users")
    )


ORACLE_DISTINCT_ROLLUP_HLL = f"""
SELECT (epoch_ms(ts) // 86400000) * 86400000 AS day_ts_ms,
       count(DISTINCT user_id) AS distinct_users
FROM events WHERE event_type = 'click' GROUP BY 1
""".strip()


def q_agg_p95_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-window p95 via the Greenwald-Khanna quantile sketch
    (approx_percentile) — the bounded-state swap for exact percentiles
    (which need the whole value multiset per group). GK at accuracy a
    guarantees rank error ≤ n/a; with n < a it retains every sample and
    returns the exact discrete percentile, so at test SFs it equals the
    DuckDB quantile_disc oracle bit-for-bit; at scale the state is
    O(a·log n) per group and error stays bounded."""
    env = events_to_envelopes(load_table(spark, sf_dir, "events"))
    w = window_start_ms(F.col("timestamp"), WINDOW_SEC)
    return (
        env.filter(F.col("name") == "view")
        .groupBy(w.alias("window_ts_ms"))
        .agg(
            F.expr("approx_percentile(value, 0.95, 100000)").alias(
                "p95_value"
            )
        )
    )


ORACLE_P95_SKETCH = f"""
SELECT {_W_SQL} AS window_ts_ms,
       quantile_disc(value, 0.95) AS p95_value
FROM events WHERE event_type = 'view' GROUP BY 1
""".strip()


def q_agg_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """p50/p90/p99 latency-style bands per window in ONE aggregation —
    approx_percentile takes the quantile array, so all three come from
    a single GK sketch per group (one shuffle, one state), not three
    passes. Exact below the sketch's sample threshold at test SFs, so
    the discrete-quantile oracle matches bit-for-bit."""
    env = events_to_envelopes(load_table(spark, sf_dir, "events"))
    w = window_start_ms(F.col("timestamp"), WINDOW_SEC)
    bands = F.expr(
        "approx_percentile(value, array(0.5, 0.9, 0.99), 100000)"
    )
    return (
        env.filter(F.col("name") == "view")
        .groupBy(w.alias("window_ts_ms"))
        .agg(bands.alias("b"))
        .select(
            "window_ts_ms",
            F.col("b")[0].alias("p50"),
            F.col("b")[1].alias("p90"),
            F.col("b")[2].alias("p99"),
        )
    )


ORACLE_PERCENTILE_BANDS = f"""
SELECT {_W_SQL} AS window_ts_ms,
       quantile_disc(value, 0.5) AS p50,
       quantile_disc(value, 0.9) AS p90,
       quantile_disc(value, 0.99) AS p99
FROM events WHERE event_type = 'view' GROUP BY 1
""".strip()


def q_sketch_error_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH ACCURACY GATE: measured relative error of the engine's
    bounded-state estimators vs exact answers on this corpus, one row
    per (method, precision) — the distinct-count/quantile counterpart
    of ann_recall_report (VERDICT r4's quality-gate pattern). The
    SHIPPED precisions (rsd=0.005, GK acc=100000) are exact at test
    SFs by design, so this report deliberately runs the COARSE end of
    each precision dial (HLL++ rsd 0.05/0.15, DataSketches-HLL lgK
    6/10, GK accuracy 20) to expose the real error curve an operator
    consults when trading state size for accuracy at 100 TB.

    Rows-only by design: the measured error of an approximate sketch
    is itself the quantity (error-bound compliance is pinned in
    tests/test_sketches.py).

    Plan shape: ONE aggregation pass computes the exact answer and
    every estimate per hourly window (single shuffle, map-side
    partials — the sketches make that possible); the per-window
    relation unpivots via stack() and collapses to ≤ 5 summary rows."""
    ev = load_table(spark, sf_dir, "events")
    hour = (
        (F.unix_millis(F.col("ts")) / F.lit(_W_MS)).cast("long")
        * F.lit(_W_MS)
    ).alias("window_ts_ms")
    per_w = ev.groupBy(hour).agg(
        F.count_distinct("user_id").alias("exact_d"),
        F.approx_count_distinct("user_id", rsd=0.05).alias("hll_05"),
        F.approx_count_distinct("user_id", rsd=0.15).alias("hll_15"),
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), 6)).alias(
            "ds_lgk6"
        ),
        F.hll_sketch_estimate(F.hll_sketch_agg(F.col("user_id"), 10)).alias(
            "ds_lgk10"
        ),
        F.expr("percentile(value, 0.95)").alias("exact_p95"),
        F.expr("approx_percentile(value, 0.95, 20)").alias("gk_20"),
    )
    unpiv = per_w.select(
        F.expr(
            "stack(5,"
            " 'hll++', 'rsd=0.05', CAST(hll_05 AS DOUBLE), CAST(exact_d AS DOUBLE),"
            " 'hll++', 'rsd=0.15', CAST(hll_15 AS DOUBLE), CAST(exact_d AS DOUBLE),"
            " 'ds_hll', 'lgK=6',   CAST(ds_lgk6 AS DOUBLE), CAST(exact_d AS DOUBLE),"
            " 'ds_hll', 'lgK=10',  CAST(ds_lgk10 AS DOUBLE), CAST(exact_d AS DOUBLE),"
            " 'gk',    'acc=20',   gk_20, exact_p95"
            ") AS (method, param, est, exact)"
        )
    ).withColumn(
        "rel_err", F.abs(F.col("est") - F.col("exact")) / F.abs("exact")
    )
    return (
        unpiv.groupBy("method", "param")
        .agg(
            F.count(F.lit(1)).alias("n_windows"),
            stable_round(F.avg("rel_err"), 6).alias("mean_rel_err"),
            stable_round(F.max("rel_err"), 6).alias("max_rel_err"),
        )
        .orderBy("method", "param")
    )


def q_agg_p95_tdigest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: per-window p95 via the from-scratch mergeable
    t-digest (operators/tdigest.py) — map-side partial digests, then a
    merge that shuffles only centroid arrays. Interpolated (not
    discrete) quantiles, so no bit-exact SQL oracle; accuracy vs the
    exact percentile is pinned in tests/test_tdigest.py (rank error
    ≪ 1/δ)."""
    from monasca_aggregator_spark.operators.tdigest import tdigest_quantiles

    env = events_to_envelopes(load_table(spark, sf_dir, "events"))
    w = window_start_ms(F.col("timestamp"), WINDOW_SEC)
    views = env.filter(F.col("name") == "view").select(
        w.alias("window_ts_ms"), "value"
    )
    return tdigest_quantiles(
        views, ["window_ts_ms"], "value", {"p95_value": 0.95}
    )


def q_agg_p95_tdigest_rollup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """rows-only: sketch RE-AGGREGATION for quantiles — hourly
    t-digests per metric materialize once (centroid arrays, raw values
    never leave their map task), then DAILY p95 comes from merging the
    hourly digests alone (operators/tdigest.py
    tdigest_digests → tdigest_merge_quantiles), the t-digest twin of
    `agg_distinct_rollup_hll`'s HLL union rollup. At 100 TB the daily
    pass reads |metrics|×24 digest rows instead of the day's raw
    events; accuracy vs the exact daily percentile is pinned in
    tests/test_tdigest.py."""
    from monasca_aggregator_spark.operators.tdigest import (
        tdigest_digests,
        tdigest_merge_quantiles,
    )

    env = events_to_envelopes(load_table(spark, sf_dir, "events"))
    hour_ms = window_start_ms(F.col("timestamp"), WINDOW_SEC)
    day_ms = (
        F.col("hour_ms") - F.pmod(F.col("hour_ms"), F.lit(86400000))
    ).alias("day_ms")
    per_hour = env.select(
        F.col("name"), hour_ms.alias("hour_ms"), "value"
    )
    hourly = tdigest_digests(per_hour, ["name", "hour_ms"], "value")
    daily_keyed = hourly.withColumn("day_ms", day_ms).drop("hour_ms")
    return tdigest_merge_quantiles(
        daily_keyed, ["name", "day_ms"], {"p95_value": 0.95}
    )


def q_agg_multi_tenant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-tenant isolation through the REAL spec engine: the test
    stream is sharded into 3 synthetic tenants (user_id mod 3) and one
    rule runs over all of them — tenants ride the groupBy key
    (reference keys its window cache by tenant+dims the same way,
    aggregation.go), so isolation costs zero extra passes and the
    output carries per-tenant windows."""
    ev = load_table(spark, sf_dir, "events")
    env = events_to_envelopes(ev).withColumn(
        "tenant_id",
        F.concat(F.lit("t"), F.pmod(F.col("dimensions")["user_id"].cast("long"), F.lit(3)).cast("string")),
    )
    spec = _spec("count", "click")
    out = build_aggregation(env, spec, WINDOW_SEC)
    return out.select(
        "window_ts_ms",
        "tenant_id",
        F.col("value").cast("long").alias("value"),
    )


ORACLE_MULTI_TENANT = f"""
SELECT {_W_SQL} AS window_ts_ms,
       't' || CAST(user_id % 3 AS VARCHAR) AS tenant_id,
       CAST(count(*) AS BIGINT) AS value
FROM events WHERE event_type = 'click'
GROUP BY 1, 2
""".strip()


def q_agg_multi_rule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-rule fan-out (reference: server.go:306-310 iterates every
    rule per message): ONE cached envelope scan feeds N rule plans whose
    outputs union. Spark analog of the reference's rule loop — the scan
    and JSON-ish adaptation run once, each rule is its own groupBy over
    the shared cached relation."""
    specs = [
        _spec("sum", "click", grouped_dimensions=("user_id",)),
        _spec("count", "purchase", grouped_dimensions=("user_id",)),
        _spec("max", "error", grouped_dimensions=("user_id",)),
    ]
    env = events_to_envelopes(
        load_table(spark, sf_dir, "events")
    ).cache()
    outs = []
    for spec in specs:
        out = build_aggregation(env, spec, WINDOW_SEC)
        outs.append(
            out.select(
                F.lit(spec.name).alias("rule"),
                "window_ts_ms",
                F.col("dimensions").getItem("user_id").alias("user_id"),
                stable_round(F.col("value"), 4).alias("value"),
            )
        )
    result = outs[0]
    for o in outs[1:]:
        result = result.unionByName(o)
    return result


ORACLE_MULTI_RULE = f"""
SELECT 'sum_click' AS rule, {_W_SQL} AS window_ts_ms,
       CAST(user_id AS VARCHAR) AS user_id,
       {sql_stable_round("sum(value)", 4)} AS value
FROM events WHERE event_type = 'click' GROUP BY 2, 3
UNION ALL
SELECT 'count_purchase', {_W_SQL}, CAST(user_id AS VARCHAR),
       {sql_stable_round("CAST(count(*) AS DOUBLE)", 4)}
FROM events WHERE event_type = 'purchase' GROUP BY 2, 3
UNION ALL
SELECT 'max_error', {_W_SQL}, CAST(user_id AS VARCHAR),
       {sql_stable_round("max(value)", 4)}
FROM events WHERE event_type = 'error' GROUP BY 2, 3
""".strip()


def _oracle(
    inner_fn: str,
    metric: str,
    *,
    where: str = "",
    group_dims: tuple[str, ...] = ("user_id",),
    round_value: int | None = None,
) -> str:
    dim_select = {
        "user_id": "CAST(user_id AS VARCHAR) AS user_id",
        "k": "json_extract_string(props, '$.k') AS k",
    }
    dims_sql = "".join(f", {dim_select[d]}" for d in group_dims)
    dims_names = "".join(f", {d}" for d in group_dims)
    val = inner_fn
    if round_value is not None:
        val = sql_stable_round(val, round_value)
    return f"""
SELECT {_W_SQL} AS window_ts_ms{dims_sql}, {val} AS value
FROM events
WHERE event_type = '{metric}'{where}
GROUP BY 1{dims_names and ', ' + ', '.join(str(i + 2) for i in range(len(group_dims)))}
""".strip()


_SLIDE_SEC = WINDOW_SEC // 2
_SLIDE_MS = _SLIDE_SEC * 1000


def q_agg_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HOPPING (sliding) windows — beyond the reference's tumbling-only
    DSL: 1-hour windows advancing every 30 minutes, so each sample
    contributes to size/slide = 2 overlapping windows and a dashboard
    gets a smoothed series without re-scanning raw data. Built on
    ``F.window(ts, size, slide)``: Catalyst compiles the membership to
    an Expand (each row replicated JVM-side into its 2 windows) below
    a partial aggregate — one shuffle of per-(window, group) partials,
    exactly the tumbling plan's shape ×2 rows."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window(
        F.col("ts"), f"{WINDOW_SEC} seconds", f"{_SLIDE_SEC} seconds"
    )
    return (
        ev.filter(F.col("event_type") == "view")
        .groupBy(
            F.unix_millis(win.start).alias("window_ts_ms"),
            F.col("user_id"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            stable_round(F.avg("value"), 4).alias("value"),
        )
    )


# each event lands in the 2 hops covering it: starts at
# floor-to-slide(t) and floor-to-slide(t) − slide, kept when the event
# is inside [start, start + window)
ORACLE_SLIDING = f"""
WITH hops AS (
  SELECT user_id, value, epoch_ms(ts) AS t,
         (epoch_ms(ts) // {_SLIDE_MS}) * {_SLIDE_MS}
           - k * {_SLIDE_MS} AS window_ts_ms
  FROM events, unnest(range(0, 2)) AS u(k)
  WHERE event_type = 'view'
)
SELECT window_ts_ms, user_id, count(*) AS n,
       {sql_stable_round("avg(value)", 4)} AS value
FROM hops
WHERE t >= window_ts_ms AND t < window_ts_ms + {_W_MS}
GROUP BY 1, 2
""".strip()


ORACLES: dict[str, str] = {
    "agg_sliding": ORACLE_SLIDING,
    "agg_count": _oracle("CAST(count(*) AS DOUBLE)", "purchase"),
    "agg_sum": _oracle("sum(value)", "click", round_value=4),
    "agg_avg": _oracle("avg(value)", "view", round_value=4),
    "agg_min": _oracle("min(value)", "error"),
    "agg_max": _oracle("max(value)", "error"),
    "agg_delta": _oracle(
        sql_stable_round("arg_max(value, ts) - arg_min(value, ts)", 4), "signup"
    ),
    "agg_rate": _oracle(
        sql_stable_round(
            "(arg_max(value, ts) - arg_min(value, ts)) / "
            "nullif((max(epoch_ms(ts)) - min(epoch_ms(ts))) / 1000.0, 0.0)",
            8,
        ),
        "signup",
    ),
    "agg_filtered": _oracle(
        "CAST(count(*) AS DOUBLE)",
        "click",
        where=" AND json_extract_string(props, '$.k') = '7'",
    ),
    "agg_rejected": _oracle(
        "CAST(count(*) AS DOUBLE)", "purchase", where=" AND user_id != 13"
    ),
    "agg_grouped": _oracle("avg(value)", "view", group_dims=("user_id", "k"), round_value=4),
    "agg_rollup": f"""
WITH g AS (
  SELECT {_W_SQL} AS window_ts_ms, user_id, avg(value) AS v
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT window_ts_ms, {sql_stable_round("sum(v)", 4)} AS value FROM g GROUP BY 1
""".strip(),
    "agg_multi_rule": ORACLE_MULTI_RULE,
    "agg_multi_tenant": ORACLE_MULTI_TENANT,
    "agg_distinct_users": ORACLE_DISTINCT,
    "agg_median": ORACLE_MEDIAN,
    "agg_distinct_hll": ORACLE_DISTINCT_HLL,
    "agg_distinct_rollup_hll": ORACLE_DISTINCT_ROLLUP_HLL,
    "agg_p95_sketch": ORACLE_P95_SKETCH,
    "agg_percentile_bands": ORACLE_PERCENTILE_BANDS,
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "agg_sliding": q_agg_sliding,
    "agg_count": q_agg_count,
    "agg_sum": q_agg_sum,
    "agg_avg": q_agg_avg,
    "agg_min": q_agg_min,
    "agg_max": q_agg_max,
    "agg_delta": q_agg_delta,
    "agg_rate": q_agg_rate,
    "agg_filtered": q_agg_filtered,
    "agg_rejected": q_agg_rejected,
    "agg_grouped": q_agg_grouped,
    "agg_rollup": q_agg_rollup,
    "agg_multi_rule": q_agg_multi_rule,
    "agg_multi_tenant": q_agg_multi_tenant,
    "agg_distinct_users": q_agg_distinct_users,
    "agg_median": q_agg_median,
    "agg_distinct_hll": q_agg_distinct_hll,
    "agg_distinct_rollup_hll": q_agg_distinct_rollup_hll,
    "agg_p95_sketch": q_agg_p95_sketch,
    "agg_p95_tdigest": q_agg_p95_tdigest,
    "sketch_error_report": q_sketch_error_report,  # rows-only (measures err)
    "agg_p95_tdigest_rollup": q_agg_p95_tdigest_rollup,  # rows-only (interpolated sketch)
    "agg_percentile_bands": q_agg_percentile_bands,
}
