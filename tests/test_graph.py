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


def test_kcore_peels_appendages(spark):
    """Triangle + tail: the 2-core is exactly the triangle — the tail
    chain peels off transitively (removing 4 drops 3's degree to 2...
    removing 5 first exposes 4, etc.)."""
    from monasca_aggregator_spark.operators.graph import kcore_pairs

    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5)],
        "id_a long, id_b long",
    )
    out = {r.node: r.degree for r in kcore_pairs(pairs, k=2).collect()}
    assert out == {0: 2, 1: 2, 2: 2}


def test_kcore_brute_force_random(spark):
    import random

    from monasca_aggregator_spark.operators.graph import kcore_pairs

    rng = random.Random(3)
    edges = {
        tuple(sorted((rng.randrange(30), rng.randrange(30))))
        for _ in range(60)
    }
    edges = [(a, b) for a, b in edges if a != b]

    def brute(k):
        es = set(edges)
        while True:
            deg = {}
            for a, b in es:
                deg[a] = deg.get(a, 0) + 1
                deg[b] = deg.get(b, 0) + 1
            drop = {n for n, d in deg.items() if d < k}
            if not drop:
                return deg
            es = {(a, b) for a, b in es if a not in drop and b not in drop}

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    for k in (2, 3):
        want = brute(k)
        got = {r.node: r.degree for r in kcore_pairs(pairs, k=k).collect()}
        assert got == want, k


def test_ann_pairs_are_contained_in_exact_pairs(spark, sf_small):
    """The bucketed candidate generator must be a strict SUBSET of the
    exact block-matmul at the same threshold, with identical rounded
    sims on every pair it does return — and the k-core computed on the
    candidate graph must be ⊆ the exact graph's core (k-core is
    monotone under edge addition). This pins the 100 TB default
    (graph_kcore_ann / graph_pagerank_ann) to the small-scale oracle
    (graph_kcore)."""
    from monasca_aggregator_spark.operators.graph import kcore_pairs
    from monasca_aggregator_spark.operators.similarity import (
        ann_candidate_pairs,
        embedding_cosine_pairs,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    emb = load_table(spark, sf_small, "embeddings")
    thr = 0.35
    exact = {
        (r.id_a, r.id_b): r.sim
        for r in embedding_cosine_pairs(emb, threshold=thr).collect()
    }
    cand = {
        (r.id_a, r.id_b): r.sim
        for r in ann_candidate_pairs(emb, threshold=thr, n_cells=4).collect()
    }
    assert cand, "candidate generator returned nothing at sf_small"
    missing = set(cand) - set(exact)
    assert not missing, f"candidate pairs not in exact set: {missing}"
    for p, s in cand.items():
        assert s == exact[p], (p, s, exact[p])
    # recall is < 1 by construction (and these synthetic embeddings
    # are only weakly clustered at thr=0.35, so cell splits cost more
    # than on a real near-dup corpus) — guard against collapse, not
    # for a recall target: that dial is n_cells
    assert len(cand) >= 0.25 * len(exact), (len(cand), len(exact))

    core_exact = {
        r.node
        for r in kcore_pairs(
            spark.createDataFrame(
                [(a, b) for a, b in exact], "id_a long, id_b long"
            ),
            k=2,
        ).collect()
    }
    core_cand = {
        r.node
        for r in kcore_pairs(
            spark.createDataFrame(
                [(a, b) for a, b in cand], "id_a long, id_b long"
            ),
            k=2,
        ).collect()
    }
    assert core_cand <= core_exact


def test_pagerank_exact_query_matches_local_reference(spark, sf_small):
    """graph_pagerank_exact must replay the identical e12 integer
    recurrence as the driver-side reference on the same trigram pair
    graph — the property that makes its recursive-CTE oracle possible."""
    from monasca_aggregator_spark.operators import dedup as D
    from monasca_aggregator_spark.operators.graph import pagerank_local
    from monasca_aggregator_spark.plans.dedup import (
        _PR_EXACT_ITER,
        THRESHOLD,
        q_graph_pagerank_exact,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents", fan_out=True)
    pairs = [
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, threshold=THRESHOLD)
        .select("id_a", "id_b")
        .collect()
    ]
    want = pagerank_local(pairs, n_iter=_PR_EXACT_ITER)
    got = {
        r.id: r.rank_e12
        for r in q_graph_pagerank_exact(spark, sf_small).collect()
    }
    assert got == want
