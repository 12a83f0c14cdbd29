"""Skew mitigation: salted joins and two-stage aggregation.

At 100 TB a handful of hot keys (one tenant with 100× the metrics, one
shingle in every document) turn a shuffle join/agg into a single
straggler task. First line of defense is AQE's skew-join splitting
(enabled in session.py); these utilities cover the cases AQE cannot:

- ``salted_join``: AQE only splits *sort-merge* join partitions; a hot
  build-side key that must shuffle (too big to broadcast) still
  serializes. Salting re-keys the big side with a random salt and
  replicates the matching small-side rows across all salts, spreading
  one hot key over ``num_salts`` tasks.
- ``two_stage_agg``: pre-aggregate on (key, salt), then finish on key.
  For built-in algebraic aggregates Spark's map-side partial
  aggregation already does this implicitly; the explicit form is for
  when the first stage must materialize (e.g., distinct-heavy or
  high-cardinality-combiner aggregates where per-mapper hash tables
  thrash).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, num_salts: int, col_name: str = "__salt") -> DataFrame:
    """Uniform random salt column in [0, num_salts)."""
    return df.withColumn(
        col_name, (F.rand(seed=42) * num_salts).cast("int")
    )


def replicate_salts(
    df: DataFrame, num_salts: int, col_name: str = "__salt"
) -> DataFrame:
    """Cross the (small) side with every salt value — size × num_salts."""
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(num_salts - 1))
    ).alias(col_name)
    return df.select("*", salts)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: Sequence[str],
    *,
    num_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join where ``big`` has skewed join keys.

    big gets a random salt; small is replicated across all salts; the
    join key becomes (on..., salt) so one hot key spreads over
    ``num_salts`` shuffle partitions. Cost: small side shuffles
    num_salts× — use only when small is too big to broadcast and big's
    keys are skewed (otherwise broadcast() or a plain join wins).
    Result is identical to ``big.join(small, on, how)``.
    """
    if how not in ("inner", "left", "left_outer", "leftouter"):
        # right/full would emit unmatched small-side rows once PER SALT
        raise ValueError(f"salted_join supports inner/left only, got {how}")
    b = with_salt(big, num_salts)
    s = replicate_salts(small, num_salts)
    return b.join(s, [*on, "__salt"], how).drop("__salt")


def two_stage_agg(
    df: DataFrame,
    keys: Sequence[str | Column],
    partial_aggs: Sequence[Column],
    final_aggs: Sequence[Column],
    *,
    num_salts: int = 16,
) -> DataFrame:
    """groupBy(keys) in two shuffles: (keys, salt) then (keys).

    ``partial_aggs`` aggregate raw rows within a salt bucket;
    ``final_aggs`` combine the per-salt partials (their input columns
    are the partial aliases). Example::

        two_stage_agg(df, ["k"],
                      [F.sum("v").alias("s"), F.count("*").alias("n")],
                      [F.sum("s").alias("total"), F.sum("n").alias("rows")])
    """
    salted = with_salt(df, num_salts)
    partial = salted.groupBy(*keys, "__salt").agg(*partial_aggs)
    return partial.groupBy(*keys).agg(*final_aggs)
