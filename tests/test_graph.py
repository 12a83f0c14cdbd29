"""PageRank — exact-trajectory, structure, and stability pins."""

from __future__ import annotations

from monasca_aggregator_spark.operators.graph import (
    pagerank_local,
    pagerank_pairs,
)


def _pairs_df(spark, pairs):
    return spark.createDataFrame(pairs, "id_a long, id_b long")


def test_pagerank_matches_local_reference_exactly(spark):
    """The e12 integer recurrence makes the distributed trajectory
    bit-for-bit equal to the local reference — not approximately."""
    import random

    rng = random.Random(5)
    pairs = list(
        {
            tuple(sorted(rng.sample(range(60), 2)))
            for _ in range(150)
        }
    )
    got = {
        r.id: r.rank_e12
        for r in pagerank_pairs(
            _pairs_df(spark, pairs), n_iter=8
        ).collect()
    }
    want = pagerank_local(pairs, n_iter=8)
    assert got == want


def test_pagerank_star_ranks_hub_highest(spark):
    """On a star graph the hub must outrank every leaf, leaves tie,
    and total mass stays ≈ 1."""
    pairs = [(0, i) for i in range(1, 9)]
    rows = pagerank_pairs(_pairs_df(spark, pairs), n_iter=12).collect()
    ranks = {r.id: r.rank for r in rows}
    hub, leaves = ranks[0], [v for k, v in ranks.items() if k != 0]
    assert all(hub > leaf for leaf in leaves)
    assert max(leaves) - min(leaves) < 1e-12
    assert abs(sum(ranks.values()) - 1.0) < 1e-3


def test_pagerank_partitioning_invariant(spark):
    pairs = [(i, (i + 1) % 20) for i in range(20)] + [(0, 10), (5, 15)]
    a = {
        r.id: r.rank_e12
        for r in pagerank_pairs(_pairs_df(spark, pairs), n_iter=6).collect()
    }
    b = {
        r.id: r.rank_e12
        for r in pagerank_pairs(
            _pairs_df(spark, pairs).repartition(16), n_iter=6
        ).collect()
    }
    assert a == b
