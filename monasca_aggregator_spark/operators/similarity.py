"""Similarity search over embedding columns.

- ``cosine_topk``: brute-force exact top-k — the baseline. The query
  side broadcasts; the corpus scan stays partitioned, so cost is one
  pass over the corpus per batch of queries (the right brute-force shape
  at 100 TB: queries × corpus flops, no shuffle of the corpus).
- ``lsh_ann``: random-hyperplane LSH buckets as the scale path —
  candidates only within matching buckets, exact cosine re-rank.

All vector math is zip_with/aggregate column expressions (JVM, no
Python). Similarities are rounded before ranking and ties broken by id
so results are stable and oracle-comparable.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import stable_round
from monasca_aggregator_spark.functions.vectors import as_double, cosine


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-matches excluded).

    Output: (query_id, rank, neighbor_id, sim).
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("c_vec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def _hyperplanes(num_planes: int, dim: int) -> list[list[float]]:
    rng = random.Random(42)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]


def lsh_ann(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: sign-random-projection buckets, exact re-rank
    within the query's bucket. 2^num_planes buckets; recall grows as
    num_planes shrinks. Output: (query_id, rank, neighbor_id, sim).
    """
    planes = _hyperplanes(num_planes, dim)

    def bucket(vec_col_name: str) -> F.Column:
        vec = F.col(vec_col_name)
        acc = F.lit(0).cast("bigint")
        for p, plane in enumerate(planes):
            lit_plane = F.array(*[F.lit(x) for x in plane])
            d = F.aggregate(
                F.zip_with(vec, lit_plane, lambda x, y: x * y),
                F.lit(0.0),
                lambda a, x: a + x,
            )
            acc = acc.bitwiseOR(
                F.shiftleft(F.when(d > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint"), p)
            )
        return acc

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
    ).withColumn("bucket", bucket("q_vec"))
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("c_vec"),
    ).withColumn("bucket", bucket("c_vec"))

    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(cosine(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )
