"""Compile an AggregationSpec into a declarative DataFrame plan.

The reference iterates every message through every rule, keeping running
aggregates in a hash-of-hashes keyed by (window, tenant+dims)
(reference: aggregation/aggregation_rule.go:50-77, caching.go). Here the
whole rule compiles to::

    filter (name / dims / reject / grouped-keys-present)   -- pushdown-able
      → groupBy(window_start, tenant, *grouped_dims)       -- ONE shuffle
      → agg(function)                                       -- partial agg map-side
      → [groupBy(window_start, tenant, *rollup_dims).agg]   -- optional rollup

and Catalyst/Tungsten choose the physical strategy. At scale this is a
single hash-partitioned shuffle on a high-cardinality uniform key; the
rollup stage re-shuffles the already-aggregated (small) output.

Semantics notes vs the reference:
- ``delta``/``rate`` take first/last by **event time** by default
  (``min_by``/``max_by`` built-ins). The reference uses Kafka *arrival*
  order (delta_metric.go, rate_metric.go), which is nondeterministic
  under repartitioning; event-time order is the deterministic fix.
  Exact reference parity is opt-in: ``spec.time_source = "arrival"``
  (YAML ``timeSource: arrival``) orders first/last by an explicit
  arrival column (``arrival_col`` — e.g. the Kafka offset), making the
  arrival semantics reproducible because the order key is data, not
  executor scheduling.
- ``rate`` over a single sample yields NULL (Δt=0) instead of the
  reference's accidental ``-value/-elapsed`` on its zero-initialized
  struct (rate_metric.go:36-42).

Expected input is the metric-envelope relation produced by
``sources.envelope`` (columns: name, dimensions map<string,string>,
timestamp, value, tenant_id, meta).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.windows import window_start_ms
from monasca_aggregator_spark.models import AggregationSpec

# Aggregate expression factories: (value, event-time ms, order key) →
# Column. ``order`` is the first/last ordering for delta/rate — the
# event time itself in the default mode (max_by(ts, ts) ≡ max(ts)), an
# arrival column under time_source="arrival".
_AGG_EXPRS = {
    "count": lambda value, ts, order: F.count(F.lit(1)).cast("double"),
    "sum": lambda value, ts, order: F.sum(value),
    "avg": lambda value, ts, order: F.avg(value),
    "min": lambda value, ts, order: F.min(value),
    "max": lambda value, ts, order: F.max(value),
    # last-by-order minus first-by-order
    "delta": lambda value, ts, order: F.max_by(value, order)
    - F.min_by(value, order),
    # delta / elapsed seconds between the SAME first/last picks; NULL
    # when they coincide (single sample, or equal timestamps)
    "rate": lambda value, ts, order: (
        F.max_by(value, order) - F.min_by(value, order)
    )
    / F.nullif(
        (F.max_by(ts, order) - F.min_by(ts, order)) / F.lit(1000.0),
        F.lit(0.0),
    ),
    # beyond the reference's seven: sketch aggregates with bounded,
    # map-side-combinable state — the forms that work unchanged as
    # streaming aggregations (exact distinct/percentile state is
    # unbounded per group). Exact in HLL++ sparse mode / below the GK
    # sample threshold (see plans.metrics sketch queries).
    "distinct": lambda value, ts, order: F.approx_count_distinct(
        value, rsd=0.005
    ).cast("double"),
    "p95": lambda value, ts, order: F.percentile_approx(
        value, F.lit(0.95), F.lit(100000)
    ),
}

# Rollup input is the first stage's (value, window_ts_ms) output, so
# event time is constant within a group: delta degenerates to 0 and rate
# to NULL, mirroring the reference's behavior of re-running the metric
# holders on aggregated envelopes (aggregation_rule.go:104-125).


def matches_metric(spec: AggregationSpec, name: Column, dims: Column) -> Column:
    """Predicate equivalent of Rule.MatchesMetric
    (reference: aggregation/aggregation_rule.go:139-173)."""
    pred = name == F.lit(spec.filtered_metric_name)
    for k, v in spec.filtered_dimensions.items():
        pred = pred & (dims.getItem(k) == F.lit(v))
    for k, v in spec.rejected_dimensions.items():
        if v == "":
            # empty value ⇒ reject every value of this key
            pred = pred & dims.getItem(k).isNull()
        else:
            # reject only the exact k=v pair (absent key passes)
            pred = pred & (
                dims.getItem(k).isNull() | (dims.getItem(k) != F.lit(v))
            )
    for k in spec.grouped_dimensions:
        pred = pred & dims.getItem(k).isNotNull()
    return pred


def build_aggregation(
    df: DataFrame,
    spec: AggregationSpec,
    window_size_sec: int,
    *,
    ts_col: str = "timestamp",
    value_col: str = "value",
    name_col: str = "name",
    dims_col: str = "dimensions",
    tenant_col: str = "tenant_id",
    arrival_col: str | None = None,
) -> DataFrame:
    """Return the aggregated-metric DataFrame for one rule.

    Output schema: window_ts_ms bigint, tenant_id, name string,
    dimensions map<string,string>, value double — one row per
    (window, tenant, group), like the envelopes the reference emits from
    Rule.GetMetrics (aggregation/aggregation_rule.go:80-136).
    """
    ts = F.col(ts_col)
    dims = F.col(dims_col)

    matched = df.filter(matches_metric(spec, F.col(name_col), dims))

    window_ts = window_start_ms(ts, window_size_sec).alias("window_ts_ms")
    group_cols = [window_ts, F.col(tenant_col)]
    for k in spec.grouped_dimensions:
        group_cols.append(dims.getItem(k).alias(f"__dim_{k}"))

    ts_ms = F.unix_millis(ts)
    if spec.time_source == "arrival":
        if arrival_col is None:
            raise ValueError(
                f"rule {spec.name}: time_source='arrival' needs "
                "arrival_col (e.g. the Kafka offset column)"
            )
        order = F.col(arrival_col)
    else:
        order = ts_ms
    agg_value = _AGG_EXPRS[spec.function](F.col(value_col), ts_ms, order)
    out = matched.groupBy(*group_cols).agg(agg_value.alias("value"))

    if spec.rollup is not None:
        # Second stage over the subset keys; input event time is the
        # window start, constant per group (see note above).
        roll_ts = F.col("window_ts_ms")
        roll_groups = [F.col("window_ts_ms"), F.col(tenant_col)]
        for k in spec.rollup.grouped_dimensions:
            roll_groups.append(F.col(f"__dim_{k}"))
        roll_value = _AGG_EXPRS[spec.rollup.function](
            F.col("value"), roll_ts, roll_ts
        )
        out = out.groupBy(*roll_groups).agg(roll_value.alias("value"))
        out_dim_keys = spec.rollup.grouped_dimensions
    else:
        out_dim_keys = spec.grouped_dimensions

    # Output dimensions = filteredDimensions ∪ grouped values
    # (reference: aggregation/metric_holder.go:44-61).
    dim_entries: list[Column] = []
    for k, v in spec.filtered_dimensions.items():
        dim_entries += [F.lit(k), F.lit(v)]
    for k in out_dim_keys:
        dim_entries += [F.lit(k), F.col(f"__dim_{k}")]
    out_dims = F.create_map(*dim_entries) if dim_entries else F.create_map()

    return out.select(
        F.col("window_ts_ms"),
        F.col(tenant_col),
        F.lit(spec.aggregated_metric_name).alias("name"),
        out_dims.alias("dimensions"),
        F.col("value"),
    )
