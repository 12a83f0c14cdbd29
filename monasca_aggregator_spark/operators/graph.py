"""Distributed PageRank over an undirected pair graph.

The iterative-graph-analytics member of the operator family, next to
the large-star/small-star connected components (operators/dedup.py):
rank the nodes of the near-dup similarity graph (or any pair
relation) by power iteration. Reference shape: Page et al. 1999;
the distributed formulation is the classic "join ranks onto edges,
aggregate contributions by destination" — each iteration is one
keyed join plus one partial-aggregated groupBy, both on the node id.

EXACT-INTEGER determinism: ranks live in e12 fixed point. Per-edge
contributions are integer floor divisions rank/degree, the incoming
sum is an exact BIGINT total (join/partition order can never change
it), and the damping update is integer multiply-then-divide — so the
whole trajectory is bit-for-bit reproducible across partitionings
and equal to a local reference implementing the same recurrence
(tests/test_graph.py). Floor losses leak ~1 ulp of mass per node per
iteration — deterministic, and irrelevant at e12 resolution.

Scale: edges (×2 for symmetry) shuffle once per iteration keyed by
node id; the edge relation is cached (reused every iteration) and
ranks are localCheckpoint'd per round to keep lineage flat — the CC
operator's convention. Only scalar counts reach the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_E12 = 10**12


def pagerank_pairs(
    pairs: DataFrame,
    *,
    n_iter: int = 10,
    damping_pct: int = 85,
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """PageRank over the undirected graph given as (id_a, id_b) pairs.

    Nodes are the ids appearing in any pair (isolated docs have no
    edges and no rank — the caller decides their default). Returns
    (id, rank_e12, rank) with Σ rank ≈ 1.
    """
    # r11 optimization: the fwd/rev union consumed the pair generator
    # twice (different projections defeat exchange reuse) — for the
    # shingle/embedding self-join generators that doubled the most
    # expensive stage of the whole query. Materialize the pair list
    # once; the operator is already eager (n_nodes count below).
    pairs = pairs.select(id_a, id_b).localCheckpoint()
    fwd = pairs.select(
        F.col(id_a).alias("src"), F.col(id_b).alias("dst")
    )
    rev = pairs.select(
        F.col(id_b).alias("src"), F.col(id_a).alias("dst")
    )
    edges = fwd.unionByName(rev)
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg"))
    # cache(), not localCheckpoint: the r9 sweep measured the eager
    # checkpoint ~1 s slower here (it materializes all pre-AQE
    # shuffle partitions; the cache substitutes InMemoryRelation into
    # every later job's plan just as cheaply)
    edges_deg = edges.join(deg, "src").cache()

    # EVERY downstream lineage must read the cache, not the (possibly
    # expensive) pair generator: deriving nodes/initial ranks from
    # `deg` directly re-ran the upstream join once per checkpoint
    # (measured 4-5 executions of a shingle self-join at sf0.1 before
    # this read-through-cache restructuring).
    nodes = edges_deg.select("src", "deg").distinct()
    n_nodes = nodes.count()  # also materializes the edge cache
    if n_nodes == 0:
        edges_deg.unpersist()
        return pairs.sparkSession.createDataFrame(
            [], "id long, rank_e12 long, rank double"
        )
    base_e12 = ((100 - damping_pct) * _E12) // (100 * n_nodes)
    init_e12 = _E12 // n_nodes

    ranks = nodes.select(
        F.col("src").alias("id"), F.lit(init_e12).alias("rank_e12")
    )
    for i in range(n_iter):
        contrib = edges_deg.join(
            ranks, edges_deg["src"] == ranks["id"]
        ).select(
            F.col("dst").alias("id"),
            F.expr("rank_e12 div deg").alias("c"),
        )
        ranks = (
            contrib.groupBy("id")
            .agg(F.sum("c").alias("in_sum"))
            .select(
                "id",
                (
                    F.lit(base_e12)
                    + F.expr(f"({damping_pct} * in_sum) div 100")
                ).alias("rank_e12"),
            )
        )
        # flatten lineage every other round — the r9 MEASURED optimum
        # of the checkpoint-cadence sweep at sf0.1 (warm best-of-3):
        # every-2nd 5.7 s < every-round 6.2 s < edges-localCheckpoint
        # 7.0 s < single-mid-chain 10.8 s < none 12.1 s. Longer
        # unchecked chains get sharply SLOWER because each iteration
        # re-analyzes the self-referencing join lineage (attribute
        # dedup clones the subtree per round) — truncation keeps the
        # per-iteration plan constant-size; the checkpoint jobs
        # themselves are cheap reads of the cached edge relation.
        if i % 2 == 1 or i == n_iter - 1:
            ranks = ranks.localCheckpoint()
    edges_deg.unpersist()
    return ranks.select(
        "id",
        "rank_e12",
        (F.col("rank_e12") / F.lit(float(_E12))).alias("rank"),
    )


def pagerank_local(
    pairs: list[tuple[int, int]],
    *,
    n_iter: int = 10,
    damping_pct: int = 85,
) -> dict[int, int]:
    """Driver-side reference with the IDENTICAL integer recurrence —
    the test oracle for pagerank_pairs (same module so the fixed-point
    scheme can't drift)."""
    adj: dict[int, list[int]] = {}
    for a, b in pairs:
        adj.setdefault(a, []).append(b)
        adj.setdefault(b, []).append(a)
    n = len(adj)
    if n == 0:
        return {}
    base = ((100 - damping_pct) * _E12) // (100 * n)
    ranks = {v: _E12 // n for v in adj}
    for _ in range(n_iter):
        incoming = {v: 0 for v in adj}
        for u, nbrs in adj.items():
            c = ranks[u] // len(nbrs)
            for v in nbrs:
                incoming[v] += c
        ranks = {
            v: base + (damping_pct * s) // 100
            for v, s in incoming.items()
        }
    return ranks


def kcore_pairs(
    pairs: DataFrame,
    *,
    k: int = 2,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """k-core of an undirected pair graph: the maximal subgraph where
    every node keeps degree ≥ k — iterative peeling (remove the
    under-degree nodes, recompute degrees, repeat to fixpoint). The
    standard cluster-quality gate on near-dup graphs: a 2-core member
    sits in a dense duplicate cluster; a degree-1 appendage is a
    borderline pair the curator can re-verify.

    Each round is one degree aggregation + one semi-join on the node
    id (same key both ways → AQE reuses the partitioning); edges are
    re-filtered against the surviving node set, and only the scalar
    survivor count reaches the driver for the convergence check.
    Rounds are bounded by the degeneracy peeling depth (≤ max_iter
    backstop), with localCheckpoint per round keeping lineage flat —
    the connected-components convention.

    Output: (node, degree) for the k-core's members (degree WITHIN
    the core).
    """
    # r11 (guide §2.4): the fwd/rev symmetrizing union can consume the
    # pair GENERATOR twice when exchange reuse cannot dedupe the
    # mirrored projections — materializing the pair list once is
    # structural insurance for ANY generator (interleaved A/B at
    # sf0.1: 2.68 vs 2.89 s median on the embedding generator, i.e.
    # no cost even where reuse already fired). localCheckpoint, not
    # cache(): a lazy cache of the CPU-bound tiny-byte pair stage is
    # coalesced to ~1 task by AQE at materialization (the documented
    # cached-plan-replanning side-effect — measured 2.5→12.6 s on
    # graph_kcore), while the eager checkpoint materializes with the
    # generator's own parallelism (pagerank_pairs' measured choice).
    pairs = pairs.select(id_a, id_b).localCheckpoint()
    edges = (
        pairs.select(F.col(id_a).alias("u"), F.col(id_b).alias("v"))
        .union(pairs.select(F.col(id_b).alias("u"), F.col(id_a).alias("v")))
        .distinct()
        .localCheckpoint()
    )
    # r11 (guide §1.2): 2 driver actions per peel round instead of 4 —
    # the surviving edge count carries across rounds in a driver
    # variable (the previous round's pruned.count IS this round's
    # edges.count, both over the same checkpointed relation), and the
    # empty-core exit falls out of the same count (keep empty ⇒
    # pruned empty), so the separate keep.count() job disappears.
    # Same fixpoint, same output, half the per-round job latency.
    # (Measured dead end: lazily chaining several peel rounds per
    # materialization to amortize actions — AQE already splits each
    # round's stages into their own jobs, so the chained plan saved
    # nothing and cost extra planning + lost overlap; reverted.)
    n_edges = edges.count()
    for _ in range(max_iter):
        deg = edges.groupBy("u").agg(F.count(F.lit(1)).alias("degree"))
        keep = deg.filter(F.col("degree") >= k).select("u")
        pruned = (
            edges.join(keep, "u", "left_semi")
            .join(keep.select(F.col("u").alias("v")), "v", "left_semi")
            .localCheckpoint()
        )
        n_pruned = pruned.count()
        edges = pruned
        if n_pruned == n_edges or n_pruned == 0:
            break
        n_edges = n_pruned
    return (
        edges.groupBy("u")
        .agg(F.count(F.lit(1)).alias("degree"))
        .filter(F.col("degree") >= k)
        .select(F.col("u").alias("node"), "degree")
    )
