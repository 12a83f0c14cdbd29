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

import pandas as pd  # module-level: pandas_udf type hints must resolve

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import stable_round
from monasca_aggregator_spark.functions.vectors import (
    as_double,
    cosine,
    cosine_fixed,
)


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (self-matches excluded).

    Output: (query_id, rank, neighbor_id, sim).

    Pass ``dim`` when the embedding width is a known constant: the
    similarity then compiles as an unrolled whole-stage-codegen
    expression instead of the interpreted ``aggregate`` fold — same
    doubles (identical left-fold order), ~50× faster on all-pairs
    scans (functions/vectors.cosine_fixed).
    """
    from monasca_aggregator_spark.functions.vectors import cosine_fixed

    q = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col)).alias("q_vec")
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("c_vec"),
    )
    sim = (
        cosine_fixed(F.col("q_vec"), F.col("c_vec"), dim)
        if dim
        else cosine(F.col("q_vec"), F.col("c_vec"))
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(sim, 6).alias("sim"),
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


def embedding_cosine_pairs(
    emb: DataFrame,
    *,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_blocks: int = 8,
) -> DataFrame:
    """Exact embedding-cosine near-dup: all pairs (id_a < id_b) with
    cosine ≥ threshold. Output: (id_a, id_b, sim), sim rounded to 6 dp.

    Block-matrix shape — the exact-all-pairs design that survives scale:
    vectors are hashed into ``num_blocks`` blocks; every block pair
    (i ≤ j) becomes one group whose similarity matrix is ONE numpy
    matmul inside applyInPandas (Arrow batches, no per-row Python).
    Work is the irreducible O(n²·d) flops split into n²/B² tiles;
    memory per task is two blocks of vectors + one tile of sims;
    replication factor is B (each block ships to B groups). Raise
    ``num_blocks`` ∝ corpus size so a tile fits executor memory.
    """
    import numpy as np
    import pandas as pd

    spark = emb.sparkSession
    pairs = [(i, j) for i in range(num_blocks) for j in range(i, num_blocks)]
    block_pairs = spark.createDataFrame(pairs, "ba int, bb int")

    v = emb.select(
        F.col(id_col).alias("vid"),
        as_double(F.col(vec_col)).alias("vec"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(num_blocks))
        .cast("int")
        .alias("block"),
    )
    # tagged union: group (ba, bb) holds block ba tagged 'a' + block bb
    # tagged 'b'; block_pairs is tiny → broadcast, so building the
    # replicated relation is a map-only stage over the corpus
    tagged = v.join(
        F.broadcast(block_pairs),
        (F.col("block") == F.col("ba")) | (F.col("block") == F.col("bb")),
    ).select(
        "ba",
        "bb",
        "vid",
        "vec",
        (F.col("block") == F.col("ba")).alias("is_a"),
        (F.col("block") == F.col("bb")).alias("is_b"),
    )

    out_schema = "id_a bigint, id_b bigint, sim double"

    def _tile(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        ba, bb = key
        a = pdf[pdf["is_a"]]
        b = pdf[pdf["is_b"]]
        if len(a) == 0 or len(b) == 0:
            return pd.DataFrame({"id_a": [], "id_b": [], "sim": []}).astype(
                {"id_a": "int64", "id_b": "int64", "sim": "float64"}
            )
        A = np.vstack(a["vec"].to_numpy())
        B = np.vstack(b["vec"].to_numpy())
        A /= np.maximum(np.linalg.norm(A, axis=1, keepdims=True), 1e-300)
        B /= np.maximum(np.linalg.norm(B, axis=1, keepdims=True), 1e-300)
        # half-up at 6 dp — same convention as functions.rounding
        # .stable_round / the DuckDB oracles (np.round is half-to-even)
        sims = np.floor((A @ B.T) * 1e6 + 0.5) / 1e6
        ia, ib = np.nonzero(sims >= threshold)
        id_a = a["vid"].to_numpy()[ia]
        id_b = b["vid"].to_numpy()[ib]
        s = sims[ia, ib]
        if ba == bb:
            # diagonal tile: each unordered pair appears twice (+ self
            # pairs); keep the strictly ordered copy
            keep = id_a < id_b
            id_a, id_b, s = id_a[keep], id_b[keep], s[keep]
        else:
            # off-diagonal tile: each unordered pair appears exactly
            # once, in hash-block order — reorder by id, never drop
            id_a, id_b = np.minimum(id_a, id_b), np.maximum(id_a, id_b)
        return pd.DataFrame({"id_a": id_a, "id_b": id_b, "sim": s})

    return tagged.groupBy("ba", "bb").applyInPandas(_tile, out_schema)


def train_ivf_centroids(
    corpus: DataFrame,
    *,
    n_centroids: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    sample_fraction: float | None = None,
) -> DataFrame:
    """Spherical k-means (Lloyd) centroid training for IVF cells.

    Each iteration is two distributed passes, no driver-side data loops:
    1. assign: broadcast the (tiny) centroid table, argmax-cosine per
       vector — one codegen'd pass over the (sampled) corpus;
    2. update: posexplode vectors to (cell, dim, value), groupBy
       (cell, dim) avg — ONE shuffle of n_rows×dim scalars, then the
       n_centroids×dim result collapses back to arrays.
    Only the centroid table (n_centroids × dim doubles) ever reaches the
    driver, once per iteration — that's the broadcast for the next pass.
    At 100 TB you train on a hash-sample (``sample_fraction``): IVF
    cell quality needs a representative sample, not the full corpus,
    so training cost is independent of corpus size. Empty cells keep
    their previous centroid. Init = deterministic id-hash sample
    (reproducible, partitioning-independent).
    """
    vecs = corpus.select(
        F.col(id_col).alias("__id"), as_double(F.col(vec_col)).alias("__vec")
    )
    if sample_fraction is not None:
        # deterministic hash-sample, same trick as the init below
        n_total = vecs.count()
        keep = max(n_centroids, int(n_total * sample_fraction))
        vecs = (
            vecs.withColumn("__h", F.xxhash64(F.col("__id")))
            .orderBy("__h")
            .limit(keep)
            .drop("__h")
        )
    vecs = vecs.cache()

    cents = (
        vecs.select(
            F.col("__id").alias("cent_id"),
            F.col("__vec").alias("cent_vec"),
            F.xxhash64(F.col("__id")).alias("__h"),
        )
        .orderBy("__h")
        .limit(n_centroids)
        .drop("__h")
    )
    # re-key cells 0..n-1 so cell ids are stable across iterations
    cents = [
        (i, list(r.cent_vec))
        for i, r in enumerate(cents.collect())
    ]
    spark = corpus.sparkSession

    for _ in range(n_iter):
        # Arrow-batch argmax (nearest_centroid_udf) — the old
        # crossJoin+window shape shuffled corpus × n_centroids rows
        # per iteration just to pick a max
        cell_of = nearest_centroid_udf(cents)
        assigned = vecs.select(
            "__id", "__vec", cell_of(F.col("__vec")).alias("cell")
        )
        # r11 (guide §5): the result is collected anyway, so assemble
        # the n_centroids×dim arrays on the driver from the raw
        # (cell, dim, mean) rows instead of a second groupBy(cell) +
        # array_sort shuffle whose only purpose was the array shape —
        # one exchange and ~2 jobs fewer per Lloyd iteration; the avg
        # aggregate (and therefore every mean value) is unchanged.
        means = (
            assigned.select(
                "cell",
                F.posexplode(F.col("__vec")).alias("dim", "val"),
            )
            .groupBy("cell", "dim")
            .agg(F.avg("val").alias("m"))
            .collect()
        )
        by_cell: dict[int, dict[int, float]] = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.dim] = r.m
        updated = {
            c: [dm[i] for i in range(len(dm))]
            for c, dm in by_cell.items()
        }
        cents = [
            (cid, updated.get(cid, vec)) for cid, vec in cents
        ]

    vecs.unpersist()
    return spark.createDataFrame(cents, "cent_id int, cent_vec array<double>")


def train_ivf_centroids_local(
    corpus: DataFrame,
    *,
    n_centroids: int = 16,
    n_iter: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    cap: int = 4096,
) -> DataFrame:
    """Driver-side spherical k-means over a bounded deterministic
    hash-sample — the production IVF training posture (FAISS-style):
    for a handful of centroids you never distribute Lloyd; you train
    on a sample and broadcast the result. Same init rule as
    ``train_ivf_centroids`` (the ``n_centroids`` vectors with the
    smallest id-hash), same update (mean per cell, empty cell keeps
    its centroid, argmax-cosine assignment), folded in numpy after
    ONE TakeOrdered collect of ≤ ``cap`` vectors — driver memory
    bounded by construction, zero per-iteration Spark jobs. The
    distributed trainer remains the reference implementation; this is
    the gate/bench-budget variant (an n_iter=3 distributed train costs
    ~6 s of fixed per-iteration job overhead at ANY corpus size)."""
    import numpy as np

    rows = (
        corpus.select(
            F.col(id_col).alias("__id"),
            as_double(F.col(vec_col)).alias("__vec"),
            F.xxhash64(F.col(id_col)).alias("__h"),
        )
        .orderBy("__h")
        .limit(cap)
        .collect()
    )
    V = np.array([r["__vec"] for r in rows], dtype=np.float64)
    k = min(n_centroids, len(rows))
    C = V[:k].copy()  # rows arrive hash-ascending: same init
    Vn = V / np.where(
        (vnorm := np.linalg.norm(V, axis=1, keepdims=True)) == 0, 1, vnorm
    )
    for _ in range(n_iter):
        Cn = C / np.where(
            (cn := np.linalg.norm(C, axis=1, keepdims=True)) == 0, 1, cn
        )
        cell = (Vn @ Cn.T).argmax(axis=1)
        for j in range(k):
            members = V[cell == j]
            if len(members):
                C[j] = members.mean(axis=0)
    return corpus.sparkSession.createDataFrame(
        [(i, [float(x) for x in C[i]]) for i in range(k)],
        "cent_id int, cent_vec array<double>",
    )


def ivf_ann(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    n_probe: int = 4,
    centroids: DataFrame | None = None,
    cell_map: DataFrame | None = None,
    dim: int | None = None,
) -> DataFrame:
    """IVF (inverted-file) approximate top-k: partition the corpus into
    centroid cells, search only the query's ``n_probe`` nearest cells.
    Output: (query_id, rank, neighbor_id, sim); recall < 1 by design.

    Pass ``centroids`` (from ``train_ivf_centroids``) for k-means-
    sharpened cells; default centroids are a deterministic hash-sample
    of the corpus (same plan shape, lower recall — at real scale you
    train once offline on a sample and broadcast). Cell assignment is
    one broadcast-probe pass over the corpus — the inverted file is
    just a ``cell`` column, so it partitions/prunes like any other key.
    Queries join only their probed cells: the scan cost drops by
    ~n_probe/n_centroids vs brute force.

    Pass ``dim`` when the embedding width is a known constant: probe
    scoring and the exact re-rank then compile as unrolled codegen
    arithmetic instead of interpreted aggregate folds (identical
    doubles — functions/vectors.cosine_fixed).
    """
    from monasca_aggregator_spark.functions.vectors import cosine_fixed

    def _cos(a, b):
        return cosine_fixed(a, b, dim) if dim else cosine(a, b)

    if centroids is not None:
        cents = centroids.select("cent_id", "cent_vec")
    else:
        # deterministic "training" sample: the n_centroids corpus
        # vectors with the smallest id-hash (stable across partitioning)
        cents = (
            corpus.select(
                F.col(id_col).alias("cent_id"),
                as_double(F.col(vec_col)).alias("cent_vec"),
                F.xxhash64(F.col(id_col)).alias("__h"),
            )
            .orderBy("__h")
            .limit(n_centroids)
            .drop("__h")
        )

    def nearest_cells(side: DataFrame, id_out: str, vec_out: str, n: int):
        """Attach the n nearest centroid ids as ``cell`` rows."""
        scored = side.crossJoin(F.broadcast(cents)).select(
            F.col(id_out),
            F.col(vec_out),
            "cent_id",
            _cos(F.col(vec_out), F.col("cent_vec")).alias("__csim"),
        )
        w = Window.partitionBy(id_out).orderBy(
            F.col("__csim").desc(), F.col("cent_id").asc()
        )
        return (
            scored.withColumn("__r", F.row_number().over(w))
            .filter(F.col("__r") <= n)
            .select(id_out, vec_out, F.col("cent_id").alias("cell"))
        )

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("c_vec"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
    )
    # corpus side (n=1): Arrow-batch argmax — no crossJoin/window over
    # the big relation; the query side keeps the top-n window (queries
    # are a tiny relation by construction)
    if cell_map is not None:
        # persisted index: the per-ingest assignment pass is skipped —
        # the thin (id, cell) map joins back onto the corpus scan
        inverted = c.join(
            cell_map.select(
                F.col(id_col).alias("neighbor_id"), "cell"
            ),
            "neighbor_id",
        )
    else:
        cents_lit = [
            (r.cent_id, list(r.cent_vec))
            for r in cents.select("cent_id", "cent_vec").collect()
        ]
        cell_of = nearest_centroid_udf(cents_lit)
        inverted = c.select(
            "neighbor_id", "c_vec", cell_of(F.col("c_vec")).alias("cell")
        )
    probes = nearest_cells(q, "query_id", "q_vec", n_probe)

    scored = (
        inverted.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(_cos(F.col("q_vec"), F.col("c_vec")), 6).alias("sim"),
        )
        # no dedup needed: each corpus vector lives in exactly ONE cell,
        # so a (query, neighbor) pair arises from at most one probed cell
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def nearest_centroid_udf(
    cents: list[tuple[int, list[float]]], *, round6: bool = False
):
    """Arrow-vectorized argmax-cosine cell assignment against a small
    in-closure centroid matrix: each Arrow batch of vectors becomes
    ONE numpy matmul (batch × dim @ dim × n_centroids) — no crossJoin,
    no per-row window shuffle, no per-row Python. A literal column-
    expression formulation was tried first and is ~10× slower: n_cent
    × dim inline literals make a huge interpreted HOF tree, while the
    matmul is BLAS. Centroids are sorted by cent_id and np.argmax
    takes the FIRST max, so ties break on the lower cent_id —
    identical to the window formulation's (sim DESC, cent_id ASC).
    Zero vectors get norm clamped, scoring 0 against every centroid →
    they land deterministically in the lowest cell id."""
    import numpy as np

    order = sorted(cents, key=lambda t: t[0])
    cids = np.array([c for c, _ in order], dtype="int32")
    cmat = np.vstack([v for _, v in order]).astype("float64")
    cmat /= np.maximum(np.linalg.norm(cmat, axis=1, keepdims=True), 1e-300)

    @F.pandas_udf("int")
    def cell_of(vs: pd.Series) -> pd.Series:
        m = np.vstack(vs.to_numpy()).astype("float64")
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sims = m @ cmat.T
        if round6:
            # half-up to 6 dp BEFORE the argmax so a SQL oracle
            # computing rounded cosines picks identical cells even
            # when raw doubles differ in the last ulp
            sims = np.floor(sims * 1e6 + 0.5) / 1e6
        return pd.Series(cids[np.argmax(sims, axis=1)])

    return cell_of


def assign_cells(
    corpus: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    round6: bool = False,
) -> DataFrame:
    """Nearest-centroid (argmax cosine) cell assignment.

    Output: (<id_col>, cell, <vec_col> as double array). The centroid
    table (bounded) is collected once and inlined as literals, so the
    assignment is a single map-only codegen pass over the corpus —
    the same inverted-file step ivf_ann uses, exposed so other
    operators (semantic dedup, cluster QA) can share it. Ties break
    on the lower cent_id, so assignment is deterministic."""
    cents = [
        (r.cent_id, list(r.cent_vec))
        for r in centroids.select("cent_id", "cent_vec").collect()
    ]
    cell_of = nearest_centroid_udf(cents, round6=round6)
    return corpus.select(
        F.col(id_col),
        cell_of(as_double(F.col(vec_col))).alias("cell"),
        as_double(F.col(vec_col)).alias(vec_col),
    )


def semantic_dedup_pairs(
    corpus: DataFrame,
    *,
    threshold: float = 0.92,
    n_centroids: int = 8,
    n_iter: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    round_assign: bool = False,
) -> DataFrame:
    """SemDeDup-shaped semantic near-dup pruning (Abbas et al. 2023):
    cluster embeddings with spherical k-means, then compare pairs only
    WITHIN each cluster — cross-cluster pairs are below threshold by
    construction of the clustering, so the O(n²) pair work drops to
    Σ|cell|², at the cost of missing pairs the clustering splits.

    Output: (cell, id_a, id_b, sim) with id_a < id_b, sim ≥ threshold,
    half-up-rounded to 6 dp (the embedding_cosine_pairs convention).

    Scale shape: training sees a sample (train_ivf_centroids), the
    assignment is one broadcast-probe pass, and each cell's similarity
    matrix is ONE numpy matmul inside applyInPandas. At 100 TB raise
    n_centroids ∝ corpus so a cell fits a task (cells are the unit of
    memory); a degenerate giant cell should be sub-tiled with
    embedding_cosine_pairs' block scheme rather than densified here."""
    import numpy as np
    import pandas as pd

    if centroids is None:
        centroids = train_ivf_centroids(
            corpus,
            n_centroids=n_centroids,
            n_iter=n_iter,
            id_col=id_col,
            vec_col=vec_col,
        )
    assigned = assign_cells(
        corpus, centroids, id_col=id_col, vec_col=vec_col,
        round6=round_assign,
    ).select(
        F.col("cell"),
        F.col(id_col).alias("__id"),
        F.col(vec_col).alias("__vec"),
    )

    out_schema = "cell int, id_a bigint, id_b bigint, sim double"

    def _cell_pairs(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        (cell,) = key
        if len(pdf) < 2:
            return pd.DataFrame(
                {"cell": [], "id_a": [], "id_b": [], "sim": []}
            ).astype(
                {
                    "cell": "int32",
                    "id_a": "int64",
                    "id_b": "int64",
                    "sim": "float64",
                }
            )
        pdf = pdf.sort_values("__id")
        ids = pdf["__id"].to_numpy()
        m = np.vstack(pdf["__vec"].to_numpy())
        m /= np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-300)
        sims = np.floor((m @ m.T) * 1e6 + 0.5) / 1e6
        ia, ib = np.nonzero(np.triu(sims >= threshold, k=1))
        return pd.DataFrame(
            {
                "cell": np.full(len(ia), cell, dtype="int32"),
                "id_a": ids[ia],
                "id_b": ids[ib],
                "sim": sims[ia, ib],
            }
        )

    return assigned.groupBy("cell").applyInPandas(_cell_pairs, out_schema)


_ANN_PAIRS_MULT = 2654435761  # Knuth multiplicative hash
_ANN_PAIRS_MOD = 2147483647


def ann_candidate_pairs(
    emb: DataFrame,
    *,
    threshold: float,
    n_cells: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Bucketed near-dup candidate pairs — the 100 TB default input
    for graph analytics (k-core / PageRank / triangles) over the
    near-dup graph.

    The exact block-matmul (``embedding_cosine_pairs``) is O(n²·d)
    flops no matter how it is tiled; at corpus scale the graph queries
    should consume CANDIDATE pairs from a bucketed generator instead.
    This one is the IVF same-cell scheme: ``n_cells`` deterministic
    hash-sampled centroids (multiplicative-hash priority — no training
    pass, rerun-stable), one broadcast-matmul assignment pass, then
    pairwise cosine only WITHIN each cell — Σ|cell|² work. Raise
    ``n_cells`` ∝ corpus so a cell fits a task.

    Output: (id_a, id_b, sim), id_a < id_b, sim ≥ threshold, 6 dp
    half-up — a SUBSET of embedding_cosine_pairs at the same
    threshold (pairs the cell split separates are missed; recall is
    the n_cells dial). The ⊆ relation and every returned sim matching
    the exact generator are pinned in tests/test_graph.py.
    """
    # two-step pmod: id*MULT overflows BIGINT past ~2^32 ids (throws
    # under ANSI mode, wraps otherwise) — reduce id first, exactly as
    # q_dedup_semantic_cells / q_ann_ivf_cells / q_sample_consistent_k
    pri = F.pmod(
        F.pmod(F.col(id_col), F.lit(_ANN_PAIRS_MOD))
        * F.lit(_ANN_PAIRS_MULT),
        F.lit(_ANN_PAIRS_MOD),
    )
    picked = (
        emb.select(
            F.col(id_col),
            as_double(F.col(vec_col)).alias("cent_vec"),
            pri.alias("pri"),
        )
        .orderBy("pri", id_col)
        .limit(n_cells)  # TakeOrdered — bounded driver payload
        .collect()
    )
    cents = emb.sparkSession.createDataFrame(
        [(i, list(r.cent_vec)) for i, r in enumerate(picked)],
        "cent_id int, cent_vec array<double>",
    )
    return semantic_dedup_pairs(
        emb,
        threshold=threshold,
        centroids=cents,
        id_col=id_col,
        vec_col=vec_col,
    ).select("id_a", "id_b", "sim")


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
    planes_per_table: int = 4,
    num_tables: int = 8,
    dim: int = 64,
) -> DataFrame:
    """Approximate top-k: multi-table sign-random-projection LSH with
    exact cosine re-rank. Output: (query_id, rank, neighbor_id, sim).

    Amplification shape matters: ONE m-plane table is pure AND
    (collision prob (1−θ/π)^m — with m=8 recall collapses to ~2% on
    near-orthogonal data). L tables of m planes OR the tables together:
    P = 1−(1−p^m)^L, so m controls candidate selectivity and L buys
    recall. Candidate volume ∝ L·n²/2^m per table; tune (m, L) to the
    corpus's similarity profile.
    """
    planes = _hyperplanes(planes_per_table * num_tables, dim)

    def table_buckets(vec_col_name: str) -> F.Column:
        """array<struct<table:int, bucket:bigint>> — one entry per table.

        The plane dots stay as aggregate() HOFs ON PURPOSE: unrolling
        all L·m planes × dim terms into one projection (tried r5)
        overflows whole-stage codegen's method-size budget and the
        fallback interpreted tree is ~5× SLOWER than the HOF form —
        the fixed-dim rationale only pays below the codegen ceiling.

        Built as ONE ``F.expr`` SQL string, not per-plane Column
        algebra: the Column form issued thousands of py4j calls
        (L·m plane arrays × dim literals + per-HOF lambda bridging)
        and measured ~9 s of pure DataFrame BUILD time at any SF
        (r8); the single JVM-side parse of the same expression is
        ~100 ms. Identical semantics — float literals rendered with
        repr() round-trip exactly."""
        entries = []
        for t in range(num_tables):
            bits = []
            for p in range(planes_per_table):
                plane = planes[t * planes_per_table + p]
                arr = ",".join(f"{x!r}D" for x in plane)
                dot = (
                    f"aggregate(zip_with({vec_col_name}, array({arr}),"
                    " (x, y) -> x * y), 0.0D, (a, x) -> a + x)"
                )
                bits.append(
                    "shiftleft(CAST(CASE WHEN "
                    f"{dot} > 0.0D THEN 1 ELSE 0 END AS BIGINT), {p})"
                )
            bucket = " | ".join(bits)
            entries.append(
                f"named_struct('table', {t}, 'bucket', ({bucket}))"
            )
        return F.expr("array(" + ",".join(entries) + ")")

    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
        F.explode_outer(table_buckets(vec_col)).alias("tb"),
    ).select("query_id", "q_vec", "tb.table", "tb.bucket")
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        as_double(F.col(vec_col)).alias("c_vec"),
        F.explode_outer(table_buckets(vec_col)).alias("tb"),
    ).select("neighbor_id", "c_vec", "tb.table", "tb.bucket")

    scored = (
        c.join(F.broadcast(q), ["table", "bucket"])
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(
                cosine_fixed(F.col("q_vec"), F.col("c_vec"), dim), 6
            ).alias("sim"),
        )
        .distinct()  # a pair can collide in several tables
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def kcenter_coreset(
    corpus: DataFrame,
    *,
    k: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int = 64,
) -> DataFrame:
    """Greedy k-center CORESET selection (Gonzalez 1985 2-approx,
    the farthest-point-first heuristic behind diversity-driven data
    pruning / active-learning selection): pick the vector farthest
    (cosine distance, e6-rounded, id tie-break) from everything chosen
    so far, k times. Output: (rank, vec_id, radius) where radius is
    the covering distance when that center was picked — the k-center
    objective's trace (radius is non-increasing; radius[k] bounds OPT
    within 2×).

    Distributed shape: per-round state is ONE column (min distance to
    the chosen set), updated by a codegen `least(d, dist-to-new-
    center)` pass — the new center rides as a LITERAL array (64
    terms, far below the codegen ceiling), so each of the k rounds is
    one corpus scan + a 1-row TakeOrdered; no shuffle at all. Lineage
    is cut per round (localCheckpoint) so round k doesn't replay
    rounds 1..k-1 — the k-core/PageRank iteration discipline.
    """
    from monasca_aggregator_spark.functions.rounding import stable_round
    from monasca_aggregator_spark.functions.vectors import norm_fixed

    spark = corpus.sparkSession
    vecs = corpus.select(
        F.col(id_col).alias("__id"), as_double(F.col(vec_col)).alias("__v")
    )
    vecs = vecs.select(
        "__id", "__v", norm_fixed(F.col("__v"), dim).alias("__n")
    ).localCheckpoint()

    first = vecs.orderBy("__id").limit(1).collect()[0]
    centers = [(1, first["__id"], None)]
    center_vec = list(first["__v"])

    state = vecs.select("__id", "__v", "__n", F.lit(None).cast("double").alias("__d"))
    for rank in range(2, k + 1):
        c_norm = sum(x * x for x in center_vec) ** 0.5
        dot = F.element_at(F.col("__v"), 1) * F.lit(center_vec[0])
        for i in range(1, dim):
            dot = dot + F.element_at(F.col("__v"), i + 1) * F.lit(
                center_vec[i]
            )
        dist = stable_round(
            F.lit(1.0) - F.try_divide(dot, F.col("__n") * F.lit(c_norm)), 6
        )
        state = state.select(
            "__id",
            "__v",
            "__n",
            F.least(F.coalesce(F.col("__d"), F.lit(2.0)), dist).alias("__d"),
        ).localCheckpoint()
        far = (
            state.orderBy(F.col("__d").desc(), F.col("__id").asc())
            .limit(1)
            .collect()[0]
        )
        centers.append((rank, far["__id"], float(far["__d"])))
        center_vec = list(far["__v"])

    return spark.createDataFrame(
        centers, "rank int, vec_id long, radius double"
    )


def save_ivf_index(
    corpus: DataFrame,
    centroids: DataFrame,
    path: str,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> None:
    """Persist an IVF index: the (tiny) centroid table plus the THIN
    (id, cell) assignment map — vectors are NOT copied into the index
    (the same thin-index rationale as the incremental MinHash index:
    a fat index multiplies every probe join). Build cost — the full
    corpus assignment pass — is paid once at ingest; probes then skip
    it entirely (ivf_probe)."""
    assign_cells(corpus, centroids, id_col=id_col, vec_col=vec_col).select(
        id_col, "cell"
    ).write.mode("overwrite").parquet(f"{path}/cells")
    centroids.select("cent_id", "cent_vec").write.mode(
        "overwrite"
    ).parquet(f"{path}/centroids")


def ivf_probe(
    corpus: DataFrame,
    queries: DataFrame,
    path: str,
    *,
    k: int = 10,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Search a PERSISTED IVF index from a cold start: load the
    centroid table and thin cell map written by save_ivf_index and
    run the probe join — identical results to a fresh ivf_ann with
    the same centroids (pinned in tests), but the corpus-wide
    assignment pass never reruns. This is the serving-path shape: the
    index ages with the corpus snapshot it was built from; rebuild on
    ingest, not per query."""
    spark = corpus.sparkSession
    return ivf_ann(
        corpus,
        queries,
        k=k,
        n_probe=n_probe,
        id_col=id_col,
        vec_col=vec_col,
        centroids=spark.read.parquet(f"{path}/centroids"),
        cell_map=spark.read.parquet(f"{path}/cells"),
    )
