"""Distributed global ranking without a single-partition sort.

``row_number() OVER (ORDER BY ...)`` with no PARTITION BY funnels the
entire relation through ONE task — the canonical scale cliff. This
operator computes the identical global rank with bounded parallelism:

1. bucket every row by a caller-supplied expression that is monotone
   in the sort key (e.g. ``floor(score * 50)``) — one hash shuffle,
   full parallelism;
2. rank locally within each bucket (per-bucket window);
3. aggregate per-bucket counts (map-side partials; result has one row
   per bucket, corpus-size-independent);
4. prefix-sum the tiny bucket table into start offsets (a window over
   ≤ #buckets rows — bounded by bucket fan-out, never by the corpus);
5. broadcast-join offsets back: global_rank = offset + local_rank.

The only global ordering work ever done on one task is step 4 over the
bucket histogram. ``ntile_from_rank`` layers exact SQL NTILE semantics
(first ``n mod k`` tiles one row larger) on the computed rank.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_BUCKET = "_grk_bucket"
_LOCAL = "_grk_local"
_OFFSET = "_grk_offset"
_TOTAL = "_grk_total"


def global_rank(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    *,
    rank_col: str = "global_rank",
    total_col: str | None = None,
) -> DataFrame:
    """Exact 1-based dense global row_number over ``order_by``.

    ``bucket`` MUST be monotone non-decreasing in ``order_by``'s sort
    order and rows with equal sort keys must share a bucket (use the
    leading sort column itself, coarsened); ties are broken by the
    caller's trailing order columns, so pass a unique tie-breaker for
    determinism. ``total_col`` optionally exposes the relation's total
    row count on every row (comes free from the bucket histogram — no
    extra pass or count() action).
    """
    b = df.withColumn(_BUCKET, bucket)
    local_w = Window.partitionBy(_BUCKET).orderBy(*order_by)
    ranked = b.withColumn(_LOCAL, F.row_number().over(local_w))

    hist = b.groupBy(_BUCKET).agg(F.count(F.lit(1)).alias("_n"))
    # tiny relation: one row per bucket. The unpartitioned windows here
    # scan #buckets rows, not the corpus.
    off_w = (
        Window.orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = hist.select(
        _BUCKET,
        (F.sum("_n").over(off_w) - F.col("_n")).alias(_OFFSET),
        F.sum("_n").over(tot_w).alias(_TOTAL),
    )

    out = ranked.join(F.broadcast(offsets), _BUCKET).withColumn(
        rank_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col(_TOTAL).cast("long"))
    return out.drop(_BUCKET, _LOCAL, _OFFSET, _TOTAL)


def global_cumsum(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    value: Column,
    *,
    cum_col: str = "global_cumsum",
    total_col: str | None = None,
) -> DataFrame:
    """Exact running ``sum(value) OVER (ORDER BY order_by)`` without a
    single-partition sort — the cumulative-share sibling of
    ``global_rank`` (same bucket contract: monotone non-decreasing in
    the sort order, equal sort keys share a bucket).

    Steps mirror global_rank with the count histogram replaced by a
    per-bucket SUM: local cumsum within each bucket (full
    parallelism), prefix-sum the ≤ #buckets-row sum histogram into
    start offsets on one task, broadcast back. ``total_col``
    optionally exposes the grand total on every row for share /
    threshold tests (cum·100 ≤ 80·total and friends)."""
    _VAL = "_gcs_value"
    b = df.withColumn(_BUCKET, bucket).withColumn(_VAL, value)
    local_w = (
        Window.partitionBy(_BUCKET)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cummed = b.withColumn(_LOCAL, F.sum(_VAL).over(local_w))

    hist = b.groupBy(_BUCKET).agg(F.sum(_VAL).alias("_s"))
    off_w = (
        Window.orderBy(_BUCKET)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot_w = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    offsets = hist.select(
        _BUCKET,
        (F.sum("_s").over(off_w) - F.col("_s")).alias(_OFFSET),
        F.sum("_s").over(tot_w).alias(_TOTAL),
    )

    out = cummed.join(F.broadcast(offsets), _BUCKET).withColumn(
        cum_col, (F.col(_OFFSET) + F.col(_LOCAL)).cast("long")
    )
    if total_col is not None:
        out = out.withColumn(total_col, F.col(_TOTAL).cast("long"))
    return out.drop(_BUCKET, _LOCAL, _OFFSET, _TOTAL, _VAL)


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """Exact SQL NTILE(n) from a precomputed global rank: with
    q = total div n and rem = total mod n, the first ``rem`` tiles get
    q+1 rows. Pure integer arithmetic, codegen-friendly."""
    q = (total / n).cast("long")
    rem = total % n
    big_span = rem * (q + 1)
    return (
        F.when(rank <= big_span, ((rank - 1) / (q + 1)).cast("long") + 1)
        .otherwise(rem + ((rank - 1 - big_span) / q).cast("long") + 1)
        .cast("int")
    )
