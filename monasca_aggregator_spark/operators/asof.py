"""As-of (point-in-time) join and session windows.

Operators Spark lacks as built-ins but a metrics/training pipeline
needs constantly: "join each fact to the latest dimension state as of
its event time" and "group events into activity sessions".

``asof_join`` uses the union + running-carry formulation, NOT a range
join: tag both sides, union them, sort within each key partition by
(ts, side), and carry the last-seen right-side row forward with a
running ``last(ignorenulls)`` window. Cost is ONE shuffle of
|left|+|right| rows keyed by the join keys — no key×key quadratic
blowup, no range-join candidate explosion; this is the shape that
survives 100 TB. (A hot key still serializes its window sort; salt it
with operators.skew first if one key dominates.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "right_",
) -> DataFrame:
    """For each left row, attach the right row with the greatest
    ``right_ts`` ≤ ``left_ts`` within the same ``on`` keys (backward,
    inclusive — DuckDB/pandas ``ASOF JOIN`` semantics). Left rows with
    no prior right row keep NULLs (left join).

    Output: all left columns + each right non-key column as
    ``{right_prefix}{col}`` (including ``{right_prefix}{right_ts}``).
    """
    on = list(on)
    right_cols = [c for c in right.columns if c not in on]
    # Pack the right row into ONE struct so last(ignorenulls) carries
    # the whole row atomically — per-column carries would mix rows when
    # a right column is legitimately NULL.
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*right_cols).alias("__r"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    # right rows sort before left rows at equal ts → inclusive match
    w = (
        Window.partitionBy(*on)
        .orderBy(F.col("__ts").asc(), F.col("__is_left").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = u.withColumn("__last_r", F.last("__r", ignorenulls=True).over(w))
    return carried.filter(F.col("__is_left") == 1).select(
        *left.columns,
        *[
            F.col(f"__last_r.{c}").alias(f"{right_prefix}{c}")
            for c in right_cols
        ],
    )


def sessionize(
    events: DataFrame,
    keys: Sequence[str],
    *,
    ts_col: str = "ts",
    gap: str = "30 minutes",
    aggs: Sequence[F.Column] = (),
) -> DataFrame:
    """Session windows: consecutive events per key belong to one session
    while inter-event gaps stay < ``gap`` (Spark's built-in
    ``session_window`` — state-store backed in streaming, merge-based in
    batch; the window CLOSES ``gap`` after the last event).

    Output: keys + session_start/session_end (epoch ms; end = last
    event + gap) + n_events + any extra ``aggs``.
    """
    grouped = events.groupBy(
        *keys, F.session_window(F.col(ts_col), gap).alias("__w")
    ).agg(F.count(F.lit(1)).alias("n_events"), *aggs)
    return grouped.select(
        *keys,
        F.unix_millis(F.col("__w.start")).alias("session_start_ms"),
        F.unix_millis(F.col("__w.end")).alias("session_end_ms"),
        "n_events",
        *[c for c in grouped.columns if c not in (*keys, "__w", "n_events")],
    )


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    *,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bucket: str = "7 days",
) -> DataFrame:
    """Interval join: every (point, interval) pair with
    ``start_ts <= point_ts <= end_ts`` — no equi-key required.

    A naive theta-join compiles to BroadcastNestedLoopJoin (every point
    against every interval: |P|×|I| comparisons). This instead
    bucketizes time at ``bucket`` granularity: each point maps to ONE
    bucket, each interval explodes to the buckets it overlaps
    (ceil(len/bucket)+1 rows — choose ``bucket`` ≳ the typical interval
    length so the fan-out stays ~2×), and candidates meet in an
    EQUI-join on the bucket id before the exact range filter. That is
    a hash shuffle both sides on a uniform key — the plan that
    survives 100 TB. Every true pair shares a bucket by construction,
    so the result is exact, and each pair meets in exactly one bucket
    (the point's), so no dedup is needed.
    """
    bucket_sec = F.lit(_interval_seconds(bucket))
    p_b = (F.unix_timestamp(F.col(point_ts)) / bucket_sec).cast("bigint")
    s_b = (F.unix_timestamp(F.col(start_ts)) / bucket_sec).cast("bigint")
    e_b = (F.unix_timestamp(F.col(end_ts)) / bucket_sec).cast("bigint")

    p = points.withColumn("__bucket", p_b)
    i = intervals.withColumn("__bucket", F.explode(F.sequence(s_b, e_b)))
    out = p.join(i, "__bucket").filter(
        (F.col(point_ts) >= F.col(start_ts))
        & (F.col(point_ts) <= F.col(end_ts))
    )
    return out.drop("__bucket")


def _interval_seconds(spec: str) -> int:
    """'7 days' / '12 hours' / '90 seconds' → seconds."""
    n, unit = spec.split()
    mult = {
        "second": 1,
        "seconds": 1,
        "minute": 60,
        "minutes": 60,
        "hour": 3600,
        "hours": 3600,
        "day": 86400,
        "days": 86400,
    }[unit]
    return int(n) * mult


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    *,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_prefix: str = "right_",
    order_col: str | None = None,
) -> DataFrame:
    """For each left row, attach the right row whose ``right_ts`` is
    NEAREST to ``left_ts`` in EITHER direction (pandas
    ``merge_asof(direction='nearest')``), ties to the backward side.

    Same union-carry shape as ``asof_join`` — still exactly ONE
    shuffle of |left|+|right| rows — but BOTH directions resolve in
    the same window sort: a backward ``last(ignorenulls)`` over
    (unbounded, current) and a forward ``first(ignorenulls)`` over
    (current, unbounded) share one partitioned ordering, so the
    nearest pick is a row-local comparison of the two carried
    structs. ``order_col`` (a right-side column) breaks equal-ts
    right-row ties deterministically: the SMALLEST ``order_col``
    within an (``on``, ``right_ts``) tie group wins in either
    direction.  One sort can't serve both carries here (ascending
    makes backward-``last`` pick the largest, forward-``first`` the
    smallest), so tie groups are collapsed to their min-``order_col``
    row BEFORE the union — only that row can ever win, because equal
    distance + equal direction implies equal ``right_ts``.  The dedup
    window shuffles on the same keys as the carry, so it co-partitions
    with (and under AQE reuses) the main exchange.
    """
    on = list(on)
    right_cols = [c for c in right.columns if c not in on]
    if order_col is not None:
        w_tie = Window.partitionBy(*on, F.col(right_ts)).orderBy(
            F.col(order_col).asc_nulls_first()
        )
        right = (
            right.withColumn("__tie_rn", F.row_number().over(w_tie))
            .filter(F.col("__tie_rn") == 1)
            .drop("__tie_rn")
        )
    r = right.select(
        *on,
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(*right_cols).alias("__r"),
    )
    l = left.select(
        *left.columns,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
    )
    u = l.unionByName(r, allowMissingColumns=True)
    base = Window.partitionBy(*on).orderBy(
        F.col("__ts").asc(), F.col("__is_left").asc()
    )
    w_back = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    w_fwd = base.rowsBetween(Window.currentRow, Window.unboundedFollowing)
    carried = u.withColumn(
        "__prev", F.last("__r", ignorenulls=True).over(w_back)
    ).withColumn("__next", F.first("__r", ignorenulls=True).over(w_fwd))
    d_prev = F.col("__ts") - F.col(f"__prev.{right_ts}")
    d_next = F.col(f"__next.{right_ts}") - F.col("__ts")
    nearest = (
        F.when(F.col("__prev").isNull(), F.col("__next"))
        .when(F.col("__next").isNull(), F.col("__prev"))
        .when(d_prev <= d_next, F.col("__prev"))  # tie → backward
        .otherwise(F.col("__next"))
    )
    return (
        carried.filter(F.col("__is_left") == 1)
        .withColumn("__pick", nearest)
        .select(
            *left.columns,
            *[
                F.col(f"__pick.{c}").alias(f"{right_prefix}{c}")
                for c in right_cols
            ],
        )
    )
