"""Count-Min sketch: bounded-state frequency estimation.

The reference keeps exact per-key counters in memory (caching.go) —
viable only while the key space fits. The CMS is the standard mergeable
summary for when it doesn't (Cormode & Muthukrishnan 2005): a d×w
counter grid where every key increments one counter per row (chosen by
d independent hashes) and a point query reads the MIN of its d
counters. Estimates never undercount, and overshoot is ≤ εN with
probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.

Spark-first shape: the "sketch" IS a DataFrame of (d, bucket, c) cells.
Rows expand to d hash cells via posexplode of a pure-codegen hash array
(xxhash64 seeded per row of the grid — no Python in the hot path), and
groupBy(d, bucket) partial-aggregates map-side, so the shuffle carries
at most d×w cells per partition regardless of corpus size. Merging two
sketches is union + groupBy sum — the same algebra the t-digest and
Space-Saving operators use (operators/tdigest.py, heavyhitters.py).

Spark also ships a built-in `count_min_sketch()` aggregate returning an
opaque binary; this table form keeps the cells queryable/joinable and
its merge algebra visible to Catalyst.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_WIDTH = 2048
DEFAULT_DEPTH = 4


def count_min_table(
    df: DataFrame,
    key_col: str,
    *,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
    weight_col: str | None = None,
) -> DataFrame:
    """Build the (d, bucket, c) sketch table over df[key_col].

    c sums `weight_col` when given (counting bytes, tokens, …),
    else 1 per row.
    """
    cells = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
            for i in range(depth)
        ]
    )
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.select(F.posexplode(cells).alias("d", "bucket"), w.alias("w"))
        .groupBy("d", "bucket")
        .agg(F.sum("w").alias("c"))
    )


def cms_merge(a: DataFrame, b: DataFrame) -> DataFrame:
    """Merge two sketches built with identical (width, depth)."""
    return a.unionByName(b).groupBy("d", "bucket").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    probes: DataFrame,
    key_col: str,
    *,
    width: int = DEFAULT_WIDTH,
    depth: int = DEFAULT_DEPTH,
) -> DataFrame:
    """Point-query estimates for every row of `probes`.

    The sketch is ≤ d×w rows by construction, so it broadcasts; the
    probe side never shuffles. Missing cells count as 0 (a key whose
    cell was never touched has true count 0).
    """
    cells = F.array(
        *[
            F.pmod(F.xxhash64(F.col(key_col), F.lit(i)), F.lit(width))
            for i in range(depth)
        ]
    )
    probe_cells = probes.select(
        F.col(key_col), F.posexplode(cells).alias("d", "bucket")
    )
    return (
        probe_cells.join(F.broadcast(sketch), ["d", "bucket"], "left")
        .groupBy(key_col)
        .agg(F.min(F.coalesce(F.col("c"), F.lit(0))).alias("est_count"))
    )
