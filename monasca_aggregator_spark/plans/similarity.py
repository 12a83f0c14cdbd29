"""Driver-facing similarity-search queries + oracles (embeddings table).

ann_cosine_topk is exact brute force with a SQL oracle (similarities
rounded to 6 dp before ranking on both sides, ties broken by neighbor
id, so rank order is deterministic). ann_lsh is the approximate scale
path → rows-only.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.functions.vectors import (
    as_double,
    cosine_fixed,
    dist2_fixed,
    dot_fixed,
    norm_fixed,
)
from monasca_aggregator_spark.operators.similarity import (
    cosine_topk,
    ivf_ann,
    lsh_ann,
    train_ivf_centroids,
)
from monasca_aggregator_spark.sources.tables import load_table

K = 10
N_QUERIES = 10


def _corpus_queries(spark: SparkSession, sf_dir: str):
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    return emb, emb.filter(F.col("vec_id") < N_QUERIES)


def q_ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _corpus_queries(spark, sf_dir)
    return cosine_topk(corpus, queries, k=K)


ORACLE_ANN = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS neighbor_id, embedding::DOUBLE[] AS cv FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id,
         floor((list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))))
               * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
  FROM c CROSS JOIN q
  WHERE query_id != neighbor_id
)
SELECT query_id, rank, neighbor_id, sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {K}
""".strip()


FILTER_LANG = "en"


def q_ann_filtered(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-FILTERED vector search: exact top-k cosine restricted
    to corpus vectors whose document is English — the pre-filtered
    search every production vector store offers (filter + ANN in one
    query). The predicate lives on the documents dim table and reaches
    the corpus as a LEFT SEMI join on vec_id (broadcast — the filter
    survivors' ids are small relative to the corpus), so the expensive
    similarity math runs only on qualifying vectors; at 100 TB the
    same shape holds with the semi-join feeding IVF/PQ cells instead
    of the brute-force scan."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    docs = load_table(spark, sf_dir, "documents")
    keep = docs.filter(F.col("lang") == FILTER_LANG).select(
        F.col("doc_id").alias("vec_id")
    )
    corpus = emb.join(F.broadcast(keep), "vec_id", "left_semi")
    _, queries = _corpus_queries(spark, sf_dir)
    return cosine_topk(corpus, queries, k=K)


ORACLE_ANN_FILTERED = f"""
WITH q AS (
  SELECT vec_id AS query_id, embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT e.vec_id AS neighbor_id, e.embedding::DOUBLE[] AS cv
  FROM embeddings e JOIN documents d ON e.vec_id = d.doc_id
  WHERE d.lang = '{FILTER_LANG}'
), scored AS (
  SELECT query_id, neighbor_id,
         floor((list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(cv, cv))))
               * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
  FROM c CROSS JOIN q
  WHERE query_id != neighbor_id
)
SELECT query_id, rank, neighbor_id, sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {K}
""".strip()


_IC_MULT = 2654435761
_IC_MOD = 2147483647
_IC_CELLS = 8
_IC_PROBE = 3


def q_ann_ivf_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED IVF search: the full inverted-file pipeline —
    deterministic hash-sampled centroids (SQL-reproducible priority),
    6-dp-rounded argmax cell assignment, top-n_probe cell selection
    per query, candidate join restricted to probed cells, exact
    rounded re-rank — under the driver's exact hash gate. The
    k-means-trained `ann_ivf_kmeans` stays rows-only (recall pinned
    in pytest); this pins the SEARCH machinery itself."""
    from pyspark.sql import Window

    from monasca_aggregator_spark.functions.vectors import as_double, cosine
    from monasca_aggregator_spark.operators.similarity import assign_cells

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    pri = F.pmod(
        F.pmod(F.col("vec_id"), F.lit(_IC_MOD)) * F.lit(_IC_MULT),
        F.lit(_IC_MOD),
    )  # two-step mod: id*MULT overflows BIGINT past ~2^32 ids
    picked = (
        emb.select(
            "vec_id",
            as_double(F.col("embedding")).alias("cent_vec"),
            pri.alias("pri"),
        )
        .orderBy("pri", "vec_id")
        .limit(_IC_CELLS)
        .collect()
    )
    cents = spark.createDataFrame(
        [(i, list(r.cent_vec)) for i, r in enumerate(picked)],
        "cent_id int, cent_vec array<double>",
    )
    inverted = assign_cells(emb, cents, round6=True).select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cell"),
        F.col("embedding").alias("c_vec"),
    )
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        as_double(F.col("embedding")).alias("q_vec"),
    )
    probe_scored = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "q_vec",
        "cent_id",
        stable_round(
            cosine(F.col("q_vec"), F.col("cent_vec")), 6
        ).alias("csim"),
    )
    pw = Window.partitionBy("query_id").orderBy(
        F.col("csim").desc(), F.col("cent_id").asc()
    )
    probes = (
        probe_scored.withColumn("rk", F.row_number().over(pw))
        .filter(F.col("rk") <= _IC_PROBE)
        .select("query_id", "q_vec", F.col("cent_id").alias("cell"))
    )
    scored = (
        inverted.join(F.broadcast(probes), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            stable_round(
                cosine(F.col("q_vec"), F.col("c_vec")), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= K)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


ORACLE_ANN_IVF_CELLS = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), cents AS (
  SELECT row_number() OVER (ORDER BY pri, vec_id) - 1 AS cent_id, e
  FROM (
    SELECT vec_id, e, (vec_id % {_IC_MOD}) * {_IC_MULT} % {_IC_MOD} AS pri FROM v
  ) ORDER BY pri, vec_id LIMIT {_IC_CELLS}
), ascored AS (
  SELECT v.vec_id, c.cent_id,
         floor(list_cosine_similarity(v.e, c.e) * 1000000.0::DOUBLE
               + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
  FROM v CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cent_id AS cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cent_id ASC) AS rk
    FROM ascored
  ) WHERE rk = 1
), probes AS (
  SELECT query_id, cell FROM (
    SELECT a.vec_id AS query_id, a.cent_id AS cell,
           row_number() OVER (PARTITION BY a.vec_id
                              ORDER BY a.sim DESC, a.cent_id ASC) AS rk
    FROM ascored a WHERE a.vec_id < {N_QUERIES}
  ) WHERE rk <= {_IC_PROBE}
), cand AS (
  SELECT p.query_id, n.vec_id AS neighbor_id,
         floor(list_cosine_similarity(qv.e, nv.e) * 1000000.0::DOUBLE
               + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
  FROM probes p
  JOIN assigned n ON n.cell = p.cell AND n.vec_id != p.query_id
  JOIN v qv ON qv.vec_id = p.query_id
  JOIN v nv ON nv.vec_id = n.vec_id
)
SELECT query_id, rank, neighbor_id, sim FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM cand
) WHERE rank <= {K}
""".strip()


def q_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _corpus_queries(spark, sf_dir)
    return lsh_ann(corpus, queries, k=K, dim=_DIM)


def q_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus, queries = _corpus_queries(spark, sf_dir)
    return ivf_ann(corpus, queries, k=K, dim=_DIM)


def q_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with spherical-k-means-trained cells (train_ivf_centroids):
    same probe budget as ann_ivf, sharper cells, higher recall
    (0.52 vs 0.40 at n_probe=4/16 cells on sf0.001)."""
    corpus, queries = _corpus_queries(spark, sf_dir)
    cents = train_ivf_centroids(corpus, n_centroids=16, n_iter=3)
    return ivf_ann(corpus, queries, k=K, centroids=cents, dim=_DIM)


def q_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ANN (operators/pq.py): 32×-compressed ADC
    scan (m=16 subspaces × 16 codes) + exact top-50 re-rank —
    recall@10 ≈ 0.86 vs 0.49 scan-only on sf0.001."""
    from monasca_aggregator_spark.operators.pq import pq_ann

    corpus, queries = _corpus_queries(spark, sf_dir)
    return pq_ann(corpus, queries, k_out=K)


def q_ann_ivfpq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF+PQ COMPOSED index (r11, the VERDICT r10 stretch —
    operators/pq.py `ivfpq_ann`, the FAISS IVFPQ shape without
    residual encoding): coarse cells bound WHICH rows the search
    touches (~n_probe/n_centroids of the corpus), PQ codes bound the
    BYTES per touched row (32× smaller), exact re-rank restores
    precision on the ≤ queries×50 candidate set. Rows-only: recall of
    a composed approximate index is the measured quantity; its
    recall@10 rides in `ann_recall_report` beside lsh/ivf/pq and
    tests/test_pq.py pins the floor."""
    from monasca_aggregator_spark.operators.pq import ivfpq_ann

    corpus, queries = _corpus_queries(spark, sf_dir)
    return ivfpq_ann(corpus, queries, k_out=K, dim=_DIM)


_PCA_K = 8


def q_embedding_pca(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed PCA fit (one-pass partial moments, no shuffle) +
    projection of every embedding to 8 components. Rows-only: the
    eigen-solve is not SQL-expressible; tests/test_pca.py pins the
    math against local numpy instead."""
    from monasca_aggregator_spark.operators.pca import pca_fit, pca_project

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    model = pca_fit(emb, "embedding", k=_PCA_K)
    return pca_project(emb, model, "embedding", keep_cols=("vec_id",))


_DIM = 64


def q_embedding_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Int8 scalar quantization fidelity report: per-vector exact code
    checksum + max reconstruction error. The scale fit is one aggregate
    pass producing a 2·d summary row (broadcast back); quantization is
    codegen zip_with. Deterministically oracle-able because the
    checksum is exact integer arithmetic and max-abs-err is a max over
    identical IEEE expressions."""
    from monasca_aggregator_spark.operators.quantize import (
        quantization_report,
    )

    return quantization_report(
        load_table(spark, sf_dir, "embeddings", fan_out=True), _DIM
    )


ORACLE_QUANTIZE = """
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), u AS (
  SELECT vec_id, unnest(e) AS x, unnest(range(1, len(e) + 1)) AS pos FROM v
), sc AS (
  SELECT pos, min(x) AS m, (max(x) - min(x)) / 255.0::DOUBLE AS s
  FROM u GROUP BY pos
), qe AS (
  SELECT vec_id, pos, x, m, s,
         CASE WHEN s = 0 THEN 0
              ELSE CAST(greatest(0.0::DOUBLE, least(255.0::DOUBLE,
                        floor((x - m) / s + 0.5::DOUBLE))) AS INTEGER)
         END AS code
  FROM u JOIN sc USING (pos)
)
SELECT vec_id,
       CAST(sum(CAST(code AS BIGINT) * pos) AS BIGINT) AS code_checksum,
       floor(max(abs(x - (code * s + m))) * 1000000.0::DOUBLE + 0.5::DOUBLE)
         / 1000000.0::DOUBLE AS max_abs_err
FROM qe GROUP BY vec_id
""".strip()


def q_embedding_centroid_accuracy(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Nearest-CENTROID classification eval per label — the cheapest
    representation probe there is (one prototype per class, Rocchio
    1971 line): every vector is assigned to the class centroid with
    the highest cosine, and per-label accuracy says which classes a
    prototype model separates (reads beside `embedding_knn_accuracy`:
    k-NN measures local neighborhood quality, this measures global
    class geometry — a class can pass one and fail the other).

    Exactness: centroid components are the e6 exact-integer means of
    `embedding_centroids` (floor(s/n + 0.5) on exact sums); each
    vector's components e6-fix once, so every dot/norm is an exact
    BIGINT (< 2⁵³, double-exact for the one final division) and the
    e6-rounded cosine ties break by label ascending — both engines
    replay the identical total order.

    Plan shape: TWO Arrow block passes (the embedding_knn_accuracy
    precedent — the unrolled-JVM formulation measured 7.3 s at sf0.1,
    this runs in well under a second). Pass 1: per-partition
    per-label int64 partial sums (|labels|·(d+1) numbers per
    partition, zero shuffle — the embedding_pca moment-partials
    idiom) collected as the bounded centroid summary. Pass 2: one
    int64 matmul per batch against the broadcast L×d centroid matrix
    — every dot/norm is an exact integer (< 2⁵³, so the one float64
    division is bit-identical to the SQL oracle's), argmax over
    label-ascending columns replays the (cos desc, label asc) total
    order. At 100 TB both passes stay single-scan and shuffle-free."""
    import math

    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    src = emb.select(
        "label", F.col("embedding").cast("array<double>").alias("e")
    )

    def _partials(batches):
        for pdf in batches:
            if not len(pdf):
                continue
            x6 = np.floor(
                np.stack(pdf["e"].to_numpy()) * 1e6 + 0.5
            ).astype(np.int64)
            lab = pdf["label"].to_numpy()
            labels, ns, sums = [], [], []
            for lb in np.unique(lab):
                mask = lab == lb
                labels.append(int(lb))
                ns.append(int(mask.sum()))
                sums.append(x6[mask].sum(axis=0).tolist())
            yield pd.DataFrame({"label": labels, "n": ns, "s": sums})

    parts = src.mapInPandas(
        _partials, "label int, n long, s array<long>"
    ).collect()
    acc: dict[int, tuple[int, list[int]]] = {}
    for r in parts:
        n0, s0 = acc.get(r.label, (0, [0] * _DIM))
        acc[r.label] = (n0 + r.n, [a + b for a, b in zip(s0, r.s)])
    # m = floor(s/n + 0.5): int/int true division is the identical
    # IEEE double division the SQL oracle performs
    labels_sorted = sorted(acc)
    cmat = np.array(
        [
            [
                int(math.floor(acc[lb][1][i] / acc[lb][0] + 0.5))
                for i in range(_DIM)
            ]
            for lb in labels_sorted
        ],
        dtype=np.int64,
    )
    lvec = np.array(labels_sorted, dtype=np.int64)
    ncn = np.sqrt((cmat * cmat).sum(axis=1).astype(np.float64))
    bc = spark.sparkContext.broadcast((cmat, lvec, ncn))

    def _assign(batches):
        m, lv, nc = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            x6 = np.floor(
                np.stack(pdf["e"].to_numpy()) * 1e6 + 0.5
            ).astype(np.int64)
            dots = x6 @ m.T  # exact int64
            nx = np.sqrt((x6 * x6).sum(axis=1).astype(np.float64))
            # oracle algebra: dot / (sqrt(nx)·sqrt(nc)), ONE division.
            # Zero-norm guard (ADVICE r6): a vector/centroid whose
            # components all e6-quantize to 0 would yield 0/0 → NaN →
            # undefined int cast; both engines pin the sentinel
            # cos6 = -1000000 (cosine -1) so the argmax stays the
            # deterministic smallest-label pick.
            denom = nx[:, None] * nc[None, :]
            safe = np.where(denom == 0.0, 1.0, denom)
            cos6 = np.floor(
                dots.astype(np.float64) / safe * 1e6 + 0.5
            ).astype(np.int64)
            cos6 = np.where(denom == 0.0, np.int64(-1000000), cos6)
            # columns are label-ascending: argmax's first-max pick IS
            # the (cos6 desc, label asc) tie-break
            idx = np.argmax(cos6, axis=1)
            yield pd.DataFrame(
                {
                    "label": pdf["label"].to_numpy(),
                    "predicted": lv[idx].astype(np.int32),
                }
            )

    pred = src.mapInPandas(_assign, "label int, predicted int")
    return (
        pred.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(
                (F.col("predicted") == F.col("label")).cast("long")
            ).alias("n_correct"),
        )
        .select(
            "label",
            "n_vecs",
            "n_correct",
            stable_round(
                F.col("n_correct").cast("double")
                / F.col("n_vecs").cast("double"),
                6,
            ).alias("accuracy"),
        )
    )


ORACLE_CENTROID_ACCURACY = f"""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), xe AS (
  SELECT vec_id, label,
         list_transform(e, x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT))
           AS xe
  FROM v
), flat AS (
  SELECT label, unnest(range(1, len(xe) + 1)) AS dim, unnest(xe) AS x6
  FROM xe
), cent AS (
  SELECT label, dim,
         CAST(floor(CAST(sum(x6) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
           AS m
  FROM flat GROUP BY 1, 2
), cl AS (
  SELECT label AS cand, list(m ORDER BY dim) AS mv FROM cent GROUP BY 1
), scored AS (
  SELECT x.vec_id, x.label, c.cand,
         CASE WHEN list_dot_product(x.xe, x.xe) = 0
                OR list_dot_product(c.mv, c.mv) = 0
              THEN CAST(-1000000 AS BIGINT)  -- zero-norm sentinel
              ELSE CAST(floor(list_dot_product(x.xe, c.mv)
                     / (sqrt(list_dot_product(x.xe, x.xe))
                        * sqrt(list_dot_product(c.mv, c.mv)))
                     * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
         END AS cos6
  FROM xe x CROSS JOIN cl c
), pred AS (
  SELECT vec_id, label, cand AS predicted
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
               ORDER BY cos6 DESC, cand ASC) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT label, count(*) AS n_vecs,
       CAST(sum(CASE WHEN predicted = label THEN 1 ELSE 0 END)
            AS BIGINT) AS n_correct,
       {sql_stable_round(
           "sum(CASE WHEN predicted = label THEN 1 ELSE 0 END)::DOUBLE"
           " / count(*)::DOUBLE", 6)} AS accuracy
FROM pred GROUP BY label
""".strip()


def q_embedding_quantize_error(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Int8 quantization DISTORTION gate per label: mean squared
    reconstruction error and (the number an ANN deployment actually
    cares about) the mean and worst COSINE between each original
    vector and its dequantized reconstruction — read before switching
    a vector store to int8 codes (`embedding_quantize` pins the codes;
    this reports what the compression does to the geometry, per class
    so a collapsed label can't hide in the corpus mean).

    Exactness: per-vector squared error and cosine are the unrolled
    left-fold doubles of the `ann_cosine_topk` convention (identical
    IEEE order as DuckDB's list_dot_product), e6-fixed per vector
    BEFORE the order-free integer sums. Plan shape: the 2·d scale
    summary broadcasts back (operators/quantize.py), quant/dequant and
    both folds run in whole-stage codegen, one groupBy(label) —
    |labels| output rows, nothing wider than the label aggregate
    shuffles."""
    from monasca_aggregator_spark.operators.quantize import quantize_int8

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = quantize_int8(emb, _DIM)
    # r11 optimization: project the original and dequantized vectors to
    # PLAIN column names first — the fixed-dim folds then assemble as
    # one JVM-parsed SQL string instead of ~1.2k py4j Column calls
    # (functions/vectors.py header), and the dequant transform is
    # evaluated once per row rather than risking re-inline per term.
    qp = q.select(
        "label",
        as_double(F.col("embedding")).alias("v"),
        F.col("dequant").alias("dq"),
    )
    v = F.col("v")
    dq = F.col("dq")
    se6 = F.floor(
        dist2_fixed(v, dq, _DIM) * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    cos6 = F.floor(
        (
            dot_fixed(v, dq, _DIM)
            / (norm_fixed(v, _DIM) * norm_fixed(dq, _DIM))
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    g = qp.select(
        "label", se6.alias("se6"), cos6.alias("cos6")
    ).groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("se6").alias("sse6"),
        F.sum("cos6").alias("scos6"),
        F.min("cos6").alias("worst6"),
    )
    return g.select(
        "label",
        "n_vecs",
        stable_round(
            F.col("sse6").cast("double")
            / F.lit(1e6)
            / (F.col("n_vecs") * F.lit(_DIM)).cast("double"),
            9,
        ).alias("mse"),
        stable_round(
            F.col("scos6").cast("double")
            / F.lit(1e6)
            / F.col("n_vecs").cast("double"),
            6,
        ).alias("mean_cos"),
        (F.col("worst6").cast("double") / F.lit(1e6)).alias("worst_cos"),
    )


ORACLE_QUANTIZE_ERROR = f"""
WITH v AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS e FROM embeddings
), u AS (
  SELECT vec_id, unnest(e) AS x, unnest(range(1, len(e) + 1)) AS pos FROM v
), sc AS (
  SELECT pos, min(x) AS m, (max(x) - min(x)) / 255.0::DOUBLE AS s
  FROM u GROUP BY pos
), scales AS (
  SELECT list(m ORDER BY pos) AS ms, list(s ORDER BY pos) AS ss FROM sc
), r AS (
  SELECT vec_id, label, e,
         list_transform(range(1, len(e) + 1), i ->
           CASE WHEN ss[i] = 0.0 THEN ms[i]
                ELSE greatest(0.0::DOUBLE, least(255.0::DOUBLE,
                       floor((e[i] - ms[i]) / ss[i] + 0.5::DOUBLE)))
                     * ss[i] + ms[i]
           END) AS dq
  FROM v CROSS JOIN scales
), pv AS (
  SELECT label,
         CAST(floor(list_dot_product(
                list_transform(range(1, len(e) + 1), i -> e[i] - dq[i]),
                list_transform(range(1, len(e) + 1), i -> e[i] - dq[i]))
              * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS se6,
         CAST(floor(list_dot_product(e, dq)
                / (sqrt(list_dot_product(e, e))
                   * sqrt(list_dot_product(dq, dq)))
              * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS cos6
  FROM r
)
SELECT label, count(*) AS n_vecs,
       {sql_stable_round(
           "CAST(sum(se6) AS DOUBLE) / 1e6"
           f" / (count(*) * {_DIM})::DOUBLE", 9)} AS mse,
       {sql_stable_round(
           "CAST(sum(cos6) AS DOUBLE) / 1e6 / count(*)::DOUBLE", 6)}
         AS mean_cos,
       CAST(min(cos6) AS DOUBLE) / 1e6 AS worst_cos
FROM pv GROUP BY label
""".strip()


def q_embedding_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid components (long format) — the class-profile
    pass behind cluster QA, label-drift checks, and nearest-centroid
    classifiers. posexplode flattens vectors to (label, dim, value)
    and ONE groupBy keyed by (label, dim) partial-aggregates map-side,
    so the exchange carries #labels × d summary rows regardless of
    corpus size — the same moment-partial shape as the distributed PCA
    operator (operators/pca.py). Long output avoids cross-engine float
    array comparison; components are integer-summed in e6 fixed point
    scaled from float32 inputs, so sums are exact and the oracle
    matches bit-for-bit."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    flat = emb.select(
        "label", F.posexplode(F.col("embedding").cast("array<double>")).alias("dim", "v")
    )
    v_e6 = F.floor(F.col("v") * 1000000 + F.lit(0.5)).cast("long")
    return (
        flat.select("label", "dim", v_e6.alias("v_e6"))
        .groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n"),
            (
                F.sum("v_e6").cast("double")
                / (F.count(F.lit(1)) * F.lit(1000000.0))
            ).alias("centroid_v"),
        )
    )


def q_embedding_centroid_affinity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Label-to-label affinity matrix: pairwise cosine between class
    centroids — the confusion-risk readout (two labels whose centroids
    cosine ≈ 1 are the ones a classifier will blur). Rides the exact
    e6 fixed-point centroid sums of `embedding_centroids`, re-quantizes
    each mean component to an e6 integer (floor(s/n + 0.5) on exact
    inputs — deterministic both engines, overflow-safe at any corpus
    size since magnitudes are bounded by the unit-ish vectors, not the
    row count), then cosines are exact-integer dot products divided
    once in double. The joined relation is #labels × d rows — driver
    math, corpus-size-independent after the one centroid shuffle."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    flat = emb.select(
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    v_e6 = F.floor(F.col("v") * 1000000 + F.lit(0.5)).cast("long")
    cent = (
        flat.select("label", "dim", v_e6.alias("v_e6"))
        .groupBy("label", "dim")
        .agg(F.sum("v_e6").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "dim",
            F.floor(
                F.col("s").cast("double") / F.col("n") + F.lit(0.5)
            ).cast("long").alias("m"),
        )
    )
    norms = cent.groupBy("label").agg(
        F.sum(F.col("m") * F.col("m")).alias("nn")
    )
    a = cent.select(
        F.col("label").alias("label_a"), "dim", F.col("m").alias("ma")
    )
    b = cent.select(
        F.col("label").alias("label_b"), "dim", F.col("m").alias("mb")
    )
    dots = (
        a.join(b, "dim")
        .filter(F.col("label_a") < F.col("label_b"))
        .groupBy("label_a", "label_b")
        .agg(F.sum(F.col("ma") * F.col("mb")).alias("dot"))
    )
    na = norms.select(F.col("label").alias("label_a"), F.col("nn").alias("na"))
    nb = norms.select(F.col("label").alias("label_b"), F.col("nn").alias("nb"))
    return (
        dots.join(na, "label_a")
        .join(nb, "label_b")
        .select(
            "label_a",
            "label_b",
            stable_round(
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na").cast("double"))
                    * F.sqrt(F.col("nb").cast("double"))
                ),
                6,
            ).alias("cosine"),
        )
    )


def q_embedding_centroid_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-label embedding DRIFT between two corpus snapshots (r8):
    the retrain/re-embed audit — when a new embedding model or a new
    crawl lands, per-class centroid movement is the first number to
    check before anything downstream consumes the vectors. Snapshots
    are the deterministic vec_id-parity halves (the oracle-able
    stand-in for snapshot A/B); drift per label = 1 − cosine of the
    two halves' centroids, on the same exact e6 fixed-point centroid
    sums as `embedding_centroid_affinity` (one posexplode shuffle,
    then label×dim-sized math; corpus-size-independent after the
    centroid aggregate)."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    flat = emb.select(
        "label",
        (F.col("vec_id") % 2).cast("int").alias("half"),
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    )
    v_e6 = F.floor(F.col("v") * 1000000 + F.lit(0.5)).cast("long")
    cent = (
        flat.select("label", "half", "dim", v_e6.alias("v_e6"))
        .groupBy("label", "half", "dim")
        .agg(F.sum("v_e6").alias("s"), F.count(F.lit(1)).alias("n"))
        .select(
            "label",
            "half",
            "dim",
            F.col("n"),
            F.floor(
                F.col("s").cast("double") / F.col("n") + F.lit(0.5)
            ).cast("long").alias("m"),
        )
    )
    a = cent.filter(F.col("half") == 0).select(
        "label", "dim", F.col("m").alias("ma"), F.col("n").alias("n_a")
    )
    b = cent.filter(F.col("half") == 1).select(
        "label", "dim", F.col("m").alias("mb"), F.col("n").alias("n_b")
    )
    per = (
        a.join(b, ["label", "dim"])
        .groupBy("label")
        .agg(
            F.first("n_a").cast("long").alias("n_a"),
            F.first("n_b").cast("long").alias("n_b"),
            F.sum(F.col("ma") * F.col("mb")).alias("dot"),
            F.sum(F.col("ma") * F.col("ma")).alias("na2"),
            F.sum(F.col("mb") * F.col("mb")).alias("nb2"),
        )
    )
    cos = F.col("dot").cast("double") / (
        F.sqrt(F.col("na2").cast("double"))
        * F.sqrt(F.col("nb2").cast("double"))
    )
    return per.select(
        "label",
        "n_a",
        "n_b",
        stable_round(cos, 6).alias("cosine"),
        stable_round(F.lit(1.0) - cos, 6).alias("drift"),
    )


ORACLE_CENTROID_DRIFT = f"""
WITH flat AS (
  SELECT label, CAST(vec_id % 2 AS INT) AS half, i - 1 AS dim,
         CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT) AS v_e6
  FROM (SELECT label, vec_id, embedding::DOUBLE[] AS e FROM embeddings),
       unnest(range(1, len(e) + 1)) AS t(i)
), cent AS (
  SELECT label, half, dim, count(*) AS n,
         CAST(floor(CAST(sum(v_e6) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
           AS m
  FROM flat GROUP BY 1, 2, 3
), per AS (
  SELECT a.label,
         CAST(any_value(a.n) AS BIGINT) AS n_a,
         CAST(any_value(b.n) AS BIGINT) AS n_b,
         sum(a.m * b.m) AS dot,
         sum(a.m * a.m) AS na2,
         sum(b.m * b.m) AS nb2
  FROM cent a JOIN cent b ON a.label = b.label AND a.dim = b.dim
  WHERE a.half = 0 AND b.half = 1
  GROUP BY 1
)
SELECT label, n_a, n_b,
       {sql_stable_round(
           "CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) "
           "* sqrt(CAST(nb2 AS DOUBLE)))", 6)} AS cosine,
       {sql_stable_round(
           "1.0 - CAST(dot AS DOUBLE) / (sqrt(CAST(na2 AS DOUBLE)) "
           "* sqrt(CAST(nb2 AS DOUBLE)))", 6)} AS drift
FROM per
""".strip()


ORACLE_CENTROID_AFFINITY = """
WITH flat AS (
  SELECT label, i - 1 AS dim,
         CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT) AS v_e6
  FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
       unnest(range(1, len(e) + 1)) AS t(i)
), cent AS (
  SELECT label, dim,
         CAST(floor(CAST(sum(v_e6) AS DOUBLE) / count(*) + 0.5) AS BIGINT) AS m
  FROM flat GROUP BY 1, 2
), norms AS (
  SELECT label, sum(m * m) AS nn FROM cent GROUP BY 1
), dots AS (
  SELECT a.label AS label_a, b.label AS label_b, sum(a.m * b.m) AS dot
  FROM cent a JOIN cent b ON a.dim = b.dim AND a.label < b.label
  GROUP BY 1, 2
)
SELECT label_a, label_b,
       floor((CAST(dot AS DOUBLE)
              / (sqrt(CAST(na.nn AS DOUBLE)) * sqrt(CAST(nb.nn AS DOUBLE))))
             * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE AS cosine
FROM dots
JOIN norms na ON na.label = dots.label_a
JOIN norms nb ON nb.label = dots.label_b
""".strip()


ORACLE_CENTROIDS = """
WITH flat AS (
  SELECT label, i - 1 AS dim,
         CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT) AS v_e6
  FROM (SELECT label, embedding::DOUBLE[] AS e FROM embeddings),
       unnest(range(1, len(e) + 1)) AS t(i)
)
SELECT label, dim, count(*) AS n,
       CAST(sum(v_e6) AS DOUBLE) / (count(*) * 1000000.0::DOUBLE)
         AS centroid_v
FROM flat GROUP BY 1, 2
""".strip()


def q_media_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: the multimodal plumbing end-to-end through the
    driver harness — documents adapted to the binary media relation
    (payload = utf-8 bytes + typed width/height metadata), decoded to
    feature vectors in mapInPandas (deterministic stub decoder — the
    real PPM/PNG/WAV codecs are exercised in test_multimodal.py), then
    a per-channel-count summary. Proves schema, Arrow batching, and
    the no-shuffle scan→project→ArrowEvalPython plan shape on real
    testdata."""
    from monasca_aggregator_spark.operators.multimodal import (
        decode_image_features,
        documents_as_media,
    )

    docs = load_table(spark, sf_dir, "documents")
    feats = decode_image_features(documents_as_media(docs), n_features=8)
    return feats.groupBy("channels").agg(
        F.count(F.lit(1)).alias("n_media"),
        F.min("width").alias("min_width"),
        F.max("height").alias("max_height"),
    )


def q_embedding_effective_rank(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """rows-only: EFFECTIVE RANK of the embedding space, overall and
    per label (Roy & Vetterli 2007: exp of the eigenvalue-spectrum
    entropy) plus the participation ratio (Σλ)²/Σλ² and the top-8
    variance share — the spectrum-shape health check beside the
    per-DIMENSION variance audit (`embedding_dim_variance` sees dead
    coordinates; this sees dead DIRECTIONS after any rotation: an
    embedding model whose 64-d space behaves like 9 effective
    dimensions wastes capacity and hurts ANN separability, the
    anisotropy row's finding made quantitative).

    Plan: ONE pass of partition-wise exact moment partials per label
    (the pca_fit sweep grouped by label — n, Σx, XᵀX per partition ×
    label), d×d eigendecompositions driver-side on the collected
    |labels|·d² partials. rows-only: eigenvalues are not
    SQL-expressible; spectrum invariants pinned in
    tests/test_pca.py."""
    import numpy as np
    import pandas as pd
    from collections.abc import Iterator

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)

    def _partials(
        batches: "Iterator[pd.DataFrame]",
    ) -> "Iterator[pd.DataFrame]":
        acc: dict[int, list] = {}
        for pdf in batches:
            for lab, v in zip(pdf["label"], pdf["embedding"]):
                if v is None:
                    continue
                x = np.asarray(v, dtype=np.float64)
                slot = acc.get(int(lab))
                if slot is None:
                    acc[int(lab)] = [1, x.copy(), np.outer(x, x)]
                else:
                    slot[0] += 1
                    slot[1] += x
                    slot[2] += np.outer(x, x)
        if acc:
            yield pd.DataFrame(
                {
                    "label": list(acc),
                    "n": [v[0] for v in acc.values()],
                    "s": [list(v[1]) for v in acc.values()],
                    "m": [list(v[2].ravel()) for v in acc.values()],
                }
            )

    parts = emb.select("label", "embedding").mapInPandas(
        _partials,
        "label int, n long, s array<double>, m array<double>",
    ).collect()

    def _spectrum(n: int, s: np.ndarray, m: np.ndarray):
        d = s.shape[0]
        mean = s / n
        cov = (m.reshape(d, d) - n * np.outer(mean, mean)) / max(
            1, n - 1
        )
        lam = np.maximum(np.linalg.eigvalsh(cov), 0.0)[::-1]
        tot = lam.sum()
        if tot <= 0:
            return None
        p = lam / tot
        nz = p[p > 0]
        erank = float(np.exp(-(nz * np.log(nz)).sum()))
        prat = float(tot * tot / (lam * lam).sum())
        top8 = float(lam[:8].sum() / tot)
        return erank, prat, top8

    by_label: dict[int | None, list] = {}
    for r in parts:
        s = np.asarray(r.s)
        m = np.asarray(r.m)
        slot = by_label.get(r.label)
        if slot is None:
            by_label[r.label] = [r.n, s, m]
        else:
            slot[0] += r.n
            slot[1] = slot[1] + s
            slot[2] = slot[2] + m
    rows = []
    tot_n, tot_s, tot_m = 0, None, None
    for lab in sorted(by_label):
        n, s, m = by_label[lab]
        tot_n += n
        tot_s = s if tot_s is None else tot_s + s
        tot_m = m if tot_m is None else tot_m + m
        spec = _spectrum(n, s, m)
        if spec:
            rows.append(
                (str(lab), n, len(s), *[round(x, 4) for x in spec])
            )
    spec = _spectrum(tot_n, tot_s, tot_m)
    rows.append(
        ("ALL", tot_n, len(tot_s), *[round(x, 4) for x in spec])
    )
    return spark.createDataFrame(
        rows,
        "label string, n_vecs long, d int, effective_rank double,"
        " participation_ratio double, top8_var_ratio double",
    )


def q_media_audio_vad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: energy-VAD over REAL WAV clips end-to-end through
    the driver harness (operators/multimodal.audio_vad — Rabiner &
    Sambur energy endpointing): documents become deterministic
    silence|tone|silence[|tone] WAV payloads
    (documents_as_wav_media — every third doc carries a second tone
    burst), real stdlib-wave decode + numpy frame-RMS segmentation in
    mapInPandas, then a segment-count × speech-time summary. The
    known clip structure pins the expected distribution in
    tests/test_multimodal.py; hash-specific frame arithmetic, so no
    SQL oracle. Plan: scan → ArrowEvalPython → one tiny aggregate."""
    from monasca_aggregator_spark.operators.multimodal import (
        audio_vad,
        documents_as_wav_media,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    vad = audio_vad(documents_as_wav_media(docs))
    return vad.groupBy("n_segments").agg(
        F.count(F.lit(1)).alias("n_clips"),
        F.min("speech_ms").alias("min_speech_ms"),
        F.max("speech_ms").alias("max_speech_ms"),
    )


def q_embedding_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding OUTLIER report: the 5 vectors farthest from
    their label centroid by cosine — mislabel/contamination triage for
    an embedding corpus (the vectors a labeler should look at first).

    Exactness discipline: everything before the final sqrt/divide is
    BIGINT — v_e6 components (e6 fixed point, as `embedding_centroids`),
    centroid component sums S_d, dot numerator Σ v_e6·S_d, and both
    norm sums — so both engines rank identical round-6 similarities
    (ties by vec_id).  Plan: one posexplode shuffle keyed (label, dim)
    for the sums, broadcast back (|labels|·d rows), per-vector dot in
    one more keyed aggregation, rank window per label over ≤ |label|
    rows.  (BIGINT headroom: Σ_d v_e6·S_d ≤ d·1e6·n·1e6 — re-scale to
    e4 past ~10⁸ vectors.)
    """
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    flat = emb.select(
        "vec_id",
        "label",
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "dim", "v"
        ),
    ).select(
        "vec_id",
        "label",
        "dim",
        F.floor(F.col("v") * 1000000 + F.lit(0.5))
        .cast("long")
        .alias("v_e6"),
    )
    # r11 (guide §2.4): the |labels|·d centroid-sum relation feeds
    # the norm aggregate AND the per-vector dot join — uncached, the
    # corpus posexplode+shuffle re-executed per consumer
    # (3 FileScans → 2).
    csum = flat.groupBy("label", "dim").agg(
        F.sum("v_e6").alias("s_d")
    ).cache()
    cnorm = csum.groupBy("label").agg(
        F.sum(F.col("s_d") * F.col("s_d")).alias("c2")
    )
    per_vec = (
        flat.join(F.broadcast(csum), ["label", "dim"])
        .groupBy("label", "vec_id")
        .agg(
            F.sum(F.col("v_e6") * F.col("s_d")).alias("dot_n"),
            F.sum(F.col("v_e6") * F.col("v_e6")).alias("v2"),
        )
    )
    j = per_vec.join(F.broadcast(cnorm), "label")
    sim = F.when(
        (F.col("v2") > 0) & (F.col("c2") > 0),
        F.col("dot_n").cast("double")
        / F.sqrt(F.col("v2").cast("double") * F.col("c2").cast("double")),
    )
    scored = j.select(
        "label",
        "vec_id",
        stable_round(sim, 6).alias("centroid_sim"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("label").orderBy(
        F.col("centroid_sim").asc(), F.col("vec_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("label", "rank", "vec_id", "centroid_sim")
    )


ORACLE_EMBEDDING_OUTLIERS = """
WITH flat AS (
  SELECT vec_id, label, i - 1 AS dim,
         CAST(floor(e[i] * 1000000 + 0.5) AS BIGINT) AS v_e6
  FROM (SELECT vec_id, label, embedding::DOUBLE[] AS e
        FROM embeddings),
       unnest(range(1, len(e) + 1)) AS t(i)
), cs AS (
  SELECT label, dim, CAST(sum(v_e6) AS BIGINT) AS s_d
  FROM flat GROUP BY 1, 2
), cn AS (
  SELECT label, CAST(sum(s_d * s_d) AS BIGINT) AS c2
  FROM cs GROUP BY 1
), pv AS (
  SELECT f.label, f.vec_id,
         CAST(sum(f.v_e6 * c.s_d) AS BIGINT) AS dot_n,
         CAST(sum(f.v_e6 * f.v_e6) AS BIGINT) AS v2
  FROM flat f JOIN cs c ON c.label = f.label AND c.dim = f.dim
  GROUP BY 1, 2
), scored AS (
  SELECT pv.label, pv.vec_id,
         CASE WHEN pv.v2 > 0 AND cn.c2 > 0 THEN
           floor((CAST(pv.dot_n AS DOUBLE)
                  / sqrt(CAST(pv.v2 AS DOUBLE) * CAST(cn.c2 AS DOUBLE)))
                 * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE
         END AS centroid_sim
  FROM pv JOIN cn USING (label)
)
SELECT label, rank, vec_id, centroid_sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY label
                               ORDER BY centroid_sim ASC, vec_id ASC)
            AS rank
  FROM scored
) t WHERE rank <= 5
""".strip()


def q_ann_mmr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Diversified retrieval: brute-force candidate pool -> greedy MMR
    re-rank (operators/mmr.py, lambda=0.7, pool=50). Rows-only: the
    greedy selection is order-dependent; exactness vs a numpy
    reference is pinned in tests/test_mmr.py."""
    from monasca_aggregator_spark.operators.mmr import mmr_rerank

    corpus, queries = _corpus_queries(spark, sf_dir)
    return mmr_rerank(corpus, queries, k=K, pool=50, lam=0.7)


def q_ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN QUALITY GATE: recall@K of every approximate search method
    against the exact brute-force top-K, as one small report row per
    method — so a recall regression (bad centroid training, a broken
    probe path, a codebook bug) shows up in the bench/correctness
    files, not only in pytest docstrings (VERDICT r4 stretch item).

    recall = |approx ∩ exact| / |exact| over the same N_QUERIES query
    vectors, K=10; ties and rounding follow each method's own
    conventions, so the report measures the methods as shipped.
    Rows-only by design: recall of an approximate index is itself the
    measured quantity — there is no SQL-expressible expected value;
    floors are pinned in tests/test_similarity.py (ivf > 0) and
    tests/test_pq.py (pq ≥ 0.7).

    Budget shape (r8, the estimator-gate treatment applied here —
    VERDICT r7 next-round #4): per-method cost at bench SF is FIXED
    overhead, not data volume (500-row sf0.01 and 2000-row sf0.1
    measure identically — Catalyst planning/codegen of the HOF-heavy
    LSH projection, Arrow stage spin-up, per-job scheduling), so
    corpus sampling buys nothing; instead the five independent
    materializations run CONCURRENTLY (thread-parallel job
    submission — Spark's scheduler interleaves them across the idle
    cores), and the k-means chain trains via
    ``train_ivf_centroids_local`` (driver-fold over the bounded
    hash-sample — the FAISS posture; the distributed trainer stays
    the corpus-scale reference, exercised by ann_ivf_kmeans/
    ann_ivf_cells). Each method's result is N_QUERIES × K rows, so
    the intersection with the exact set is driver-side set algebra on
    ≤100-row collections — no union/join job. Wall drops from the sum
    of five builds (~18 s at sf0.1) to roughly the slowest one.
    """
    from concurrent.futures import ThreadPoolExecutor

    from monasca_aggregator_spark.operators.pq import (
        ivfpq_ann,
        pq_ann,
        train_pq_codebooks,
    )
    from monasca_aggregator_spark.operators.similarity import (
        train_ivf_centroids_local,
    )

    corpus, queries = _corpus_queries(spark, sf_dir)
    corpus = corpus.cache()
    corpus.count()  # populate before the concurrent consumers race

    def _pairs(df: DataFrame) -> set[tuple]:
        return {
            (r.query_id, r.neighbor_id)
            for r in df.select("query_id", "neighbor_id").collect()
        }

    def _ivf_kmeans() -> set[tuple]:
        cents = train_ivf_centroids_local(corpus, n_centroids=16, n_iter=3)
        return _pairs(ivf_ann(corpus, queries, k=K, centroids=cents, dim=_DIM))

    try:
        with ThreadPoolExecutor(max_workers=7) as pool:
            # r12 (guide §1.2): pq and ivfpq train the IDENTICAL
            # codebook tensor (same corpus, same m/k, deterministic
            # hash-sample + Lloyd init) — train it once on its own
            # future so both paths share it without delaying the
            # other submissions.
            books_fut = pool.submit(
                lambda: train_pq_codebooks(corpus)
            )
            futs = {
                "__exact": pool.submit(
                    lambda: _pairs(cosine_topk(corpus, queries, k=K))
                ),
                "ann_lsh": pool.submit(
                    lambda: _pairs(lsh_ann(corpus, queries, k=K, dim=_DIM))
                ),
                "ann_ivf": pool.submit(
                    lambda: _pairs(ivf_ann(corpus, queries, k=K, dim=_DIM))
                ),
                "ann_ivf_kmeans": pool.submit(_ivf_kmeans),
                "ann_pq": pool.submit(
                    lambda: _pairs(
                        pq_ann(
                            corpus,
                            queries,
                            k_out=K,
                            books=books_fut.result(),
                        )
                    )
                ),
                "ann_ivfpq": pool.submit(
                    lambda: _pairs(
                        ivfpq_ann(
                            corpus,
                            queries,
                            k_out=K,
                            dim=_DIM,
                            books=books_fut.result(),
                        )
                    )
                ),
            }
            got = {name: f.result() for name, f in futs.items()}
    finally:
        corpus.unpersist()
    exact = got.pop("__exact")
    n_exact = len(exact)
    rows = [
        (
            method,
            K,
            N_QUERIES,
            n_exact,
            len(pairs & exact),
            round(len(pairs & exact) / float(n_exact), 4),
        )
        for method, pairs in sorted(got.items())
    ]
    return spark.createDataFrame(
        rows,
        "method string, k int, n_queries int, n_exact long, "
        "n_hits long, recall double",
    )


KNN_K = 5
EMB_DIM = 64  # testdata embedding width; codegen-unrolled similarity


def q_embedding_knn_accuracy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space QUALITY eval: leave-one-out k-NN label accuracy
    — for every vector, do its 5 exact-cosine nearest neighbors
    majority-vote its own label? The standard representation-quality
    probe (a space where neighbors share labels embeds semantics; one
    where they don't is noise) run before trusting embeddings for
    dedup/search. Per-label accuracy surfaces which classes collapse.

    Exactness: sims follow the 6-dp-rounded cosine convention
    (`ann_cosine_topk`: dot/(|a||b|), floor(x·1e6+0.5)); neighbor rank
    ties break (sim desc, neighbor_id asc), vote ties (votes desc,
    label asc) — total orders both engines replay identically.

    Plan shape: ONE Arrow block-matmul pass — the reference side (the
    eval sample, bounded BY DESIGN: this table is the held-out probe
    set, not the corpus) broadcasts as a numpy matrix, each partition's
    block computes its sims/top-5/vote vectorized, and only (query_id,
    label, predicted) leaves Python. The all-pairs JVM formulation
    (crossJoin + per-pair cosine) measured 59-84 s at sf0.1 — the
    interpreted/unrolled array fold per pair is the wrong tool when
    numpy does the whole 2000×2000×64 product in milliseconds. The
    driver-side collect of the broadcast side is a bounded-summary
    collect (same class as the centroid/codebook collects). At corpus
    scale the vote runs over `ann_ivf` candidates instead.
    """
    import numpy as np
    import pandas as pd

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    side = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e"), "label"
    ).collect()
    ids = np.array([r.vec_id for r in side], dtype=np.int64)
    mat = np.array([r.e for r in side], dtype=np.float64)
    lbls = np.array([r.label for r in side], dtype=np.int64)
    order = np.argsort(ids)
    ids, mat, lbls = ids[order], mat[order], lbls[order]
    norms = np.sqrt((mat * mat).sum(axis=1))
    bc = spark.sparkContext.broadcast((ids, mat, lbls, norms))
    k = KNN_K

    def _vote(batches):
        r_ids, r_mat, r_lbls, r_norms = bc.value
        pos = {int(i): p for p, i in enumerate(r_ids)}
        for pdf in batches:
            if not len(pdf):
                continue
            q = np.stack(pdf["e"].to_numpy()).astype(np.float64)
            qn = np.sqrt((q * q).sum(axis=1))
            # oracle algebra: dot first, ONE division — not
            # pre-normalized rows (different last-ulp rounding)
            sims = (q @ r_mat.T) / np.outer(qn, r_norms)
            sim6 = np.floor(sims * 1e6 + 0.5).astype(np.int64)
            out_pred = np.empty(len(pdf), dtype=np.int64)
            qids = pdf["vec_id"].to_numpy()
            for i, qid in enumerate(qids):
                row = sim6[i].copy()
                # self-exclusion sentinel: far below any real e6 sim
                # (±1e6) but safely negatable — int64.min would wrap
                # to ITSELF under the lexsort negation and rank first
                row[pos[int(qid)]] = -(10**12)
                # top-k by (sim desc, neighbor_id asc): ids are sorted
                # ascending, so lexsort with -row primary does both
                top = np.lexsort((r_ids, -row))[:k]
                votes: dict[int, int] = {}
                for lb in r_lbls[top]:
                    votes[int(lb)] = votes.get(int(lb), 0) + 1
                out_pred[i] = min(
                    votes, key=lambda lb: (-votes[lb], lb)
                )
            yield pd.DataFrame(
                {
                    "query_id": qids,
                    "label": pdf["label"].to_numpy(),
                    "predicted": out_pred,
                }
            )

    scored = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("e"),
        "label",
    ).mapInPandas(
        _vote, "query_id bigint, label int, predicted bigint"
    )
    return (
        scored.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(
                (F.col("predicted") == F.col("label")).cast("long")
            ).alias("n_correct"),
        )
        .select(
            "label",
            "n",
            "n_correct",
            stable_round(
                F.col("n_correct").cast("double") / F.col("n").cast("double"),
                6,
            ).alias("accuracy"),
        )
    )


ORACLE_KNN_ACCURACY = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e, label FROM embeddings
), scored AS (
  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id, b.label AS n_label,
         floor((list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e))
                  * sqrt(list_dot_product(b.e, b.e))))
               * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
  FROM v a CROSS JOIN v b WHERE a.vec_id <> b.vec_id
), nn AS (
  SELECT query_id, n_label FROM (
    SELECT query_id, n_label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY sim DESC, neighbor_id ASC) AS rank
    FROM scored
  ) t WHERE rank <= {KNN_K}
), votes AS (
  SELECT query_id, n_label, count(*) AS cnt FROM nn
  GROUP BY query_id, n_label
), pred AS (
  SELECT query_id, n_label AS predicted FROM (
    SELECT query_id, n_label,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY cnt DESC, n_label ASC) AS rk
    FROM votes
  ) t WHERE rk = 1
)
SELECT v.label,
       count(*) AS n,
       CAST(coalesce(sum(CASE WHEN p.predicted = v.label THEN 1 ELSE 0
         END), 0) AS BIGINT) AS n_correct,
       floor(CAST(coalesce(sum(CASE WHEN p.predicted = v.label THEN 1
         ELSE 0 END), 0) AS DOUBLE) / CAST(count(*) AS DOUBLE)
         * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE
         AS accuracy
FROM pred p JOIN v ON v.vec_id = p.query_id
GROUP BY v.label
""".strip()


# --------------------------- TwoNN intrinsic-dimension estimation


def q_embedding_intrinsic_dim(
    spark: SparkSession, sf_dir: str, *, sample_every: int = 1
) -> DataFrame:
    """INTRINSIC dimension of the embedding space via TwoNN (Facco et
    al., Scientific Reports 2017): using only each point's two nearest
    neighbors, ID = n / Σ ln(r₂/r₁) — the representation diagnostic
    that says how many degrees of freedom the vectors actually use
    (collapsed or anisotropic embeddings report far below the ambient
    64; a healthy space sits near the data manifold's dimension).

    Determinism: squared distances are unrolled codegen left-folds
    e6-fixed BEFORE ranking (the ann_cosine_topk contract applied to
    distances), neighbor ties break by id, ln(r₂/r₁) = ½ln(d₂/d₁)
    from the two e6 INTEGERS, each point's term e6-fixed pre-sum.
    Exact-duplicate points (d₁ = 0, ratio undefined) are dropped and
    counted — standard TwoNN practice.

    Scale: ``sample_every`` IS the wired 100 TB path — keep 1-in-N
    vectors by the deterministic two-step multiplicative id hash (the
    ``decontaminate_embedding`` selection, SQL-reproducible,
    rerun-stable), then run the identical estimator on the sample: ID
    is a distribution property, thousands of points suffice (TwoNN's
    own experiments use O(10³)). The registered query keeps the
    default 1 (full corpus = the exact oracle shape at test SF);
    sample-vs-full agreement is pinned in tests/test_similarity.py."""
    from monasca_aggregator_spark.functions.vectors import dist2_fixed

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    if sample_every > 1:
        emb = emb.filter(
            F.pmod(
                F.pmod(F.col("vec_id"), F.lit(_DC_MOD)) * F.lit(_DC_MULT),
                F.lit(_DC_MOD),
            )
            % F.lit(sample_every)
            == 0
        )
    a = emb.select("vec_id", as_double(F.col("embedding")).alias("va"))
    b = emb.select(
        F.col("vec_id").alias("nb_id"),
        as_double(F.col("embedding")).alias("vb"),
    )
    d6 = F.floor(
        dist2_fixed(F.col("va"), F.col("vb"), _DIM) * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    pairs = (
        a.crossJoin(b)
        .filter(F.col("vec_id") != F.col("nb_id"))
        .select("vec_id", "nb_id", d6.alias("d6"))
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("d6").asc(), F.col("nb_id").asc()
    )
    two = (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .groupBy("vec_id")
        .agg(
            F.min(F.when(F.col("rk") == 1, F.col("d6"))).alias("d1"),
            F.min(F.when(F.col("rk") == 2, F.col("d6"))).alias("d2"),
        )
    )
    term6 = F.floor(
        F.lit(0.5)
        * F.log(F.col("d2").cast("double") / F.col("d1").cast("double"))
        * F.lit(1e6)
        + F.lit(0.5)
    ).cast("long")
    g = two.select(
        (F.col("d1") > 0).alias("ok"),
        F.when(F.col("d1") > 0, term6).alias("t6"),
    ).agg(
        F.sum(F.col("ok").cast("long")).alias("n_points"),
        F.sum((~F.col("ok")).cast("long")).alias("n_dropped_dups"),
        F.sum("t6").alias("s6"),
    )
    mean_lr = F.col("s6").cast("double") / F.lit(1e6) / F.col(
        "n_points"
    ).cast("double")
    return g.select(
        "n_points",
        "n_dropped_dups",
        stable_round(mean_lr, 6).alias("mean_log_ratio"),
        stable_round(F.lit(1.0) / mean_lr, 4).alias("intrinsic_dim"),
    )


ORACLE_INTRINSIC_DIM = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
),
pairs AS (
  SELECT a.vec_id, b.vec_id AS nb_id,
         CAST(floor(list_sum(list_transform(range(1, {_DIM} + 1),
                i -> (a.e[i] - b.e[i]) * (a.e[i] - b.e[i])))
              * 1e6 + 0.5) AS BIGINT) AS d6
  FROM v a CROSS JOIN v b
  WHERE a.vec_id != b.vec_id
),
two AS (
  SELECT vec_id,
         min(CASE WHEN rk = 1 THEN d6 END) AS d1,
         min(CASE WHEN rk = 2 THEN d6 END) AS d2
  FROM (
    SELECT *, row_number() OVER (PARTITION BY vec_id
                                 ORDER BY d6 ASC, nb_id ASC) AS rk
    FROM pairs
  ) WHERE rk <= 2
  GROUP BY vec_id
),
terms AS (
  SELECT d1 > 0 AS ok,
         CASE WHEN d1 > 0 THEN
           CAST(floor(0.5 * ln(CAST(d2 AS DOUBLE) / CAST(d1 AS DOUBLE))
                      * 1e6 + 0.5) AS BIGINT) END AS t6
  FROM two
)
SELECT CAST(sum(CASE WHEN ok THEN 1 ELSE 0 END) AS BIGINT) AS n_points,
       CAST(sum(CASE WHEN ok THEN 0 ELSE 1 END) AS BIGINT)
         AS n_dropped_dups,
       {sql_stable_round(
           "CAST(sum(t6) AS DOUBLE) / 1e6"
           " / sum(CASE WHEN ok THEN 1 ELSE 0 END)", 6)}
         AS mean_log_ratio,
       {sql_stable_round(
           "1.0 / (CAST(sum(t6) AS DOUBLE) / 1e6"
           " / sum(CASE WHEN ok THEN 1 ELSE 0 END))", 4)}
         AS intrinsic_dim
FROM terms
""".strip()


# ------------------------------------ IVF n_probe recall/cost sweep


_NP_SWEEP = (1, 2, 4, 8)
_NP_CELLS = 16


def q_ann_nprobe_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF TUNING CURVE: recall@K vs n_probe for the inverted-file
    search (hash-sampled 16-cell index) — the scan-fraction/recall
    trade-off table an operator reads before fixing n_probe at scale
    (probing p of c cells scans ~p/c of the corpus). Completes the
    ANN quality tooling: ann_recall_report compares METHODS at fixed
    settings, this sweeps the one knob IVF deployments actually turn.
    Rows-only (recall of an approximate index is the measured
    quantity); recall monotonicity in n_probe is pinned in
    tests/test_similarity.py — more probed cells is a candidate
    superset ranked by true cosine, so recall can only grow."""
    corpus, queries = _corpus_queries(spark, sf_dir)
    corpus = corpus.cache()
    exact = (
        cosine_topk(corpus, queries, k=K)
        .select("query_id", "neighbor_id")
        .cache()
    )
    try:
        n_exact = exact.count()
        out = None
        for n_probe in _NP_SWEEP:
            approx = ivf_ann(
                corpus,
                queries,
                k=K,
                n_centroids=_NP_CELLS,
                n_probe=n_probe,
                dim=_DIM,
            ).select("query_id", "neighbor_id")
            hits = approx.join(
                exact, ["query_id", "neighbor_id"], "left_semi"
            ).count()
            row = spark.createDataFrame(
                [(n_probe, _NP_CELLS, n_exact, hits)],
                "n_probe int, n_cells int, n_exact long, n_hits long",
            )
            out = row if out is None else out.unionByName(row)
    finally:
        # every probe's hits are already counted — the sweep table
        # below is literals-only, so the caches release safely here
        exact.unpersist()
        corpus.unpersist()
    return out.select(
        "n_probe",
        "n_cells",
        F.round(
            F.col("n_probe").cast("double") / F.col("n_cells"), 4
        ).alias("scan_fraction"),
        "n_exact",
        "n_hits",
        F.round(F.col("n_hits") / F.col("n_exact").cast("double"), 4).alias(
            "recall"
        ),
    )


# ----------------------------- k-center coreset (diversity selection)


_KC_K = 8


def q_sample_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset over the embeddings — the k most
    mutually-distant vectors (operators/similarity.kcenter_coreset),
    the diversity-first counterpart of the quality-first samplers:
    coverage of embedding space with k exemplars, radius trace
    included. Rows-only: the greedy pick sequence is inherently
    order-dependent (each round depends on the previous argmax) — not
    single-statement SQL; the exact pick order and the non-increasing
    radius invariant are pinned in tests/test_similarity.py."""
    from monasca_aggregator_spark.operators.similarity import (
        kcenter_coreset,
    )

    return kcenter_coreset(
        load_table(spark, sf_dir, "embeddings", fan_out=True),
        k=_KC_K,
        dim=_DIM,
    )


# ---------------------- hard-negative mining for contrastive training


_HN_K = 5


def q_embedding_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining: for each anchor vector, the top-k most
    similar vectors with a DIFFERENT label — the pairs a contrastive
    trainer (SimCSE/InfoNCE line) needs most, since random negatives
    are trivially far and teach nothing. Same exact-brute-force +
    e6-rounding + id-tie-break determinism contract as
    ``ann_cosine_topk``; the label-mismatch predicate rides the same
    scan, and at 100 TB the identical shape runs per IVF cell (the
    candidate generator already in-repo) instead of corpus-wide.

    Output: (query_id, rank, neighbor_id, neighbor_label, sim)."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    q = emb.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("q_label"),
        as_double(F.col("embedding")).alias("q_vec"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        as_double(F.col("embedding")).alias("c_vec"),
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .filter(F.col("neighbor_label") != F.col("q_label"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            stable_round(
                cosine_fixed(F.col("q_vec"), F.col("c_vec"), _DIM), 6
            ).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _HN_K)
        .select("query_id", "rank", "neighbor_id", "neighbor_label", "sim")
    )


ORACLE_HARD_NEGATIVES = f"""
WITH q AS (
  SELECT vec_id AS query_id, label AS q_label,
         embedding::DOUBLE[] AS qv
  FROM embeddings WHERE vec_id < {N_QUERIES}
), c AS (
  SELECT vec_id AS neighbor_id, label AS neighbor_label,
         embedding::DOUBLE[] AS cv
  FROM embeddings
), scored AS (
  SELECT query_id, neighbor_id, neighbor_label,
         floor((list_dot_product(qv, cv)
               / (sqrt(list_dot_product(qv, qv))
                  * sqrt(list_dot_product(cv, cv))))
               * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
  FROM c CROSS JOIN q
  WHERE neighbor_label != q_label
)
SELECT query_id, rank, neighbor_id, neighbor_label, sim
FROM (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY sim DESC, neighbor_id ASC) AS rank
  FROM scored
) t
WHERE rank <= {_HN_K}
""".strip()


# --------------------- class-balance weights (effective sample number)


_CB_BETA = 0.999


def q_class_balance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Class-balanced loss weights per label via the effective number
    of samples (Cui et al., CVPR 2019): E_n = (1−β^n)/(1−β), weight ∝
    1/E_n — the re-weighting table a trainer broadcasts when classes
    are imbalanced (inverse-frequency overweights rare-class near-dups;
    effective number discounts them).

    Cross-engine exactness: β^n spelled exp(n·ln β) identically on
    both sides (the corpus-LM queries' established ln/exp parity),
    raw weights e9-fixed to BIGINTs immediately, so the normalization
    (mean weight = 1 across labels) is exact-integer arithmetic with
    ONE final division. The whole computation is one |labels|-row
    aggregate — broadcast-sized at any corpus scale.
    """
    counts = (
        load_table(spark, sf_dir, "embeddings")
        .groupBy("label")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    beta = F.lit(_CB_BETA)
    w_raw = (F.lit(1.0) - beta) / (
        F.lit(1.0) - F.exp(F.col("n") * F.log(beta))
    )
    w9 = F.floor(w_raw * F.lit(1e9) + F.lit(0.5)).cast("long")
    with_w = counts.select("label", "n", w9.alias("w9"))
    tot = with_w.agg(
        F.sum("w9").alias("sum_w9"),
        F.count(F.lit(1)).alias("n_labels"),
    )
    return (
        with_w.crossJoin(F.broadcast(tot))
        .select(
            "label",
            "n",
            stable_round(F.col("w9").cast("double") / F.lit(1e9), 9).alias(
                "weight_raw"
            ),
            stable_round(
                (F.col("w9") * F.col("n_labels")).cast("double")
                / F.col("sum_w9").cast("double"),
                6,
            ).alias("weight_norm"),
        )
    )


ORACLE_CLASS_WEIGHTS = f"""
WITH counts AS (
  SELECT label, count(*) AS n FROM embeddings GROUP BY label
),
w AS (
  SELECT label, n,
         CAST(floor((1.0 - {_CB_BETA}) / (1.0 - exp(n * ln({_CB_BETA})))
                    * 1e9 + 0.5) AS BIGINT) AS w9
  FROM counts
),
tot AS (SELECT sum(w9) AS sum_w9, count(*) AS n_labels FROM w)
SELECT label, CAST(n AS BIGINT) AS n,
       {sql_stable_round("CAST(w9 AS DOUBLE) / 1e9", 9)} AS weight_raw,
       {sql_stable_round(
           "CAST(w9 * n_labels AS DOUBLE) / CAST(sum_w9 AS DOUBLE)", 6
       )} AS weight_norm
FROM w CROSS JOIN tot
""".strip()


# ------------------------- embedding-space benchmark decontamination


_DC_MULT = 2654435761
_DC_MOD = 2147483647
_DC_EVERY = 25  # ~4% of vectors play the held-out benchmark role
_DC_TAU = 0.8  # cosine at/above this flags train/test overlap


def q_decontaminate_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SEMANTIC benchmark decontamination: every training vector is
    scored by its max cosine against the held-out benchmark set, and
    near-matches (sim ≥ τ) are flagged for removal — the
    embedding-space sibling of ``text_decontaminate``'s trigram
    containment (lexical overlap misses paraphrases; embedding
    similarity catches them — the Gopher/GPT-3 decontamination line
    continued in embedding space).

    The benchmark here is a deterministic hash-sample of the vectors
    (multiplicative-hash id selection, SQL-reproducible — stand-in
    for the real eval-set embeddings a lab would broadcast). Exact
    brute force against the SMALL benchmark side is the right shape
    at 100 TB too: benchmark sets are thousands of rows — broadcast
    them, one pass over the corpus, no shuffle; sims e6-rounded, ties
    to the smallest benchmark id, same determinism contract as
    ann_cosine_topk.

    Output: every corpus vector with its nearest benchmark neighbor,
    the rounded max-cosine, and the contamination verdict.
    """
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    is_bench = (
        F.pmod(
            F.pmod(F.col("vec_id"), F.lit(_DC_MOD)) * F.lit(_DC_MULT),
            F.lit(_DC_MOD),
        )  # two-step mod: id*MULT overflows BIGINT past ~2^32 ids
        % F.lit(_DC_EVERY)
        == 0
    )
    # norms precomputed ONCE per row (identical op tree to the oracle's
    # dot/(sqrt·sqrt), so the same doubles — the pair expression drops
    # from 3 unrolled folds to 1)
    bench = emb.filter(is_bench).select(
        F.col("vec_id").alias("bench_id"),
        as_double(F.col("embedding")).alias("b_vec"),
    )
    bench = bench.select(
        "bench_id", "b_vec", norm_fixed(F.col("b_vec"), _DIM).alias("b_n")
    )
    corpus = emb.filter(~is_bench).select(
        "vec_id", as_double(F.col("embedding")).alias("c_vec")
    )
    corpus = corpus.select(
        "vec_id", "c_vec", norm_fixed(F.col("c_vec"), _DIM).alias("c_n")
    )
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "bench_id",
        stable_round(
            F.try_divide(
                dot_fixed(F.col("c_vec"), F.col("b_vec"), _DIM),
                F.col("c_n") * F.col("b_n"),
            ),
            6,
        ).alias("sim"),
    )
    # argmax per vector as an ALGEBRAIC aggregate, not a sort+window:
    # partial aggregation collapses |bench| pairs per vector map-side
    # before the exchange (measured 4.7× vs row_number at sf0.1, and
    # the shuffle shrinks from all pairs to one row per vector at any
    # scale). (sim, −bench_id) is unique per vector, so max_by's
    # tie-break equals the oracle's (sim DESC, bench_id ASC) pick.
    best = F.struct(F.col("sim"), (-F.col("bench_id")).alias("nb"))
    return (
        scored.groupBy("vec_id")
        .agg(
            F.max_by("bench_id", best).alias("nearest_bench_id"),
            F.max("sim").alias("sim"),
        )
        .select(
            "vec_id",
            "nearest_bench_id",
            "sim",
            (F.col("sim") >= _DC_TAU).alias("contaminated"),
        )
    )


ORACLE_DECONTAMINATE_EMB = f"""
WITH b AS (
  SELECT vec_id AS bench_id, embedding::DOUBLE[] AS bv
  FROM embeddings
  WHERE (vec_id % {_DC_MOD}) * {_DC_MULT} % {_DC_MOD} % {_DC_EVERY} = 0
), c AS (
  SELECT vec_id, embedding::DOUBLE[] AS cv
  FROM embeddings
  WHERE (vec_id % {_DC_MOD}) * {_DC_MULT} % {_DC_MOD} % {_DC_EVERY} != 0
), scored AS (
  SELECT vec_id, bench_id,
         floor((list_dot_product(cv, bv)
               / (sqrt(list_dot_product(cv, cv))
                  * sqrt(list_dot_product(bv, bv))))
               * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
  FROM c CROSS JOIN b
)
SELECT vec_id, bench_id AS nearest_bench_id, sim,
       sim >= {_DC_TAU} AS contaminated
FROM (
  SELECT *, row_number() OVER (PARTITION BY vec_id
                               ORDER BY sim DESC, bench_id ASC) AS rk
  FROM scored
) t
WHERE rk = 1
""".strip()


def q_embedding_silhouette(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label SILHOUETTE against class centroids (Rousseeuw 1987,
    the centroid-simplified form): for every vector, a = distance to
    its own label's centroid, b = distance to the nearest OTHER
    centroid, s = (b−a)/max(a,b) ∈ [−1, 1] — mean and worst s per
    label say which classes are cohesive and separated vs bleeding
    into a neighbor (completes the class-geometry triad:
    `embedding_knn_accuracy` = local neighborhoods,
    `embedding_centroid_accuracy` = argmax assignment, this = margin).

    Exactness: vectors and centroids e6-quantize to BIGINT (the
    centroid_accuracy convention, floor(s/n + 0.5) means); squared
    distance expands to dxx − 2·dxm + dmm with each dot an exact
    integer (< 2⁵³, so the doubles agree engine-to-engine); per-vector
    a, b, s e6-fix BEFORE the order-free sums. Zero distances guard
    through nullif → s = 0 sentinel, mirrored in SQL.

    Plan shape: one posexplode + bounded (label, dim) groupBy builds
    the L×d centroid relation; vectors crossJoin the BROADCAST ≤L-row
    centroid list with unrolled codegen dots (L·d ops per row, no
    shuffle); one bounded groupBy(label). At 100 TB: still one scan —
    centroids are a bounded summary, the cross join is row-local."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    xe = F.transform(
        as_double(F.col("embedding")),
        lambda x: F.floor(x * F.lit(1e6) + F.lit(0.5)).cast("long"),
    )
    v = emb.select("vec_id", "label", xe.alias("xe"))
    ex = v.select(
        "label", F.posexplode("xe").alias("dim", "x6")
    )
    cent = ex.groupBy(F.col("label").alias("cand"), "dim").agg(
        F.floor(
            F.sum("x6").cast("double") / F.count(F.lit(1)).cast("double")
            + F.lit(0.5)
        )
        .cast("long")
        .alias("m")
    )
    cl = cent.groupBy("cand").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("dim", "m"))),
            lambda s: s["m"],
        ).alias("mv")
    )
    scored = v.crossJoin(F.broadcast(cl)).select(
        "vec_id",
        "label",
        "cand",
        (
            dot_fixed(F.col("xe"), F.col("xe"), _DIM)
            - F.lit(2) * dot_fixed(F.col("xe"), F.col("mv"), _DIM)
            + dot_fixed(F.col("mv"), F.col("mv"), _DIM)
        ).alias("d2"),
    )
    per = scored.groupBy("vec_id", "label").agg(
        F.sqrt(
            F.min(
                F.when(F.col("cand") == F.col("label"), F.col("d2"))
            ).cast("double")
        ).alias("da"),
        F.sqrt(
            F.min(
                F.when(F.col("cand") != F.col("label"), F.col("d2"))
            ).cast("double")
        ).alias("db"),
    )
    e6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)).cast(  # noqa: E731
        "long"
    )
    s = F.coalesce(
        (F.col("db") - F.col("da"))
        / F.nullif(F.greatest("da", "db"), F.lit(0.0)),
        F.lit(0.0),
    )
    f = per.select(
        "label",
        e6(F.col("da")).alias("da6"),
        e6(F.col("db")).alias("db6"),
        e6(s).alias("s6"),
    )
    return f.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        stable_round(
            F.sum("da6").cast("double")
            / (F.count("da6").cast("double") * F.lit(1e6)),
            6,
        ).alias("mean_intra"),
        stable_round(
            F.sum("db6").cast("double")
            / (F.count("db6").cast("double") * F.lit(1e6)),
            6,
        ).alias("mean_nearest"),
        stable_round(
            F.sum("s6").cast("double")
            / (F.count("s6").cast("double") * F.lit(1e6)),
            6,
        ).alias("mean_silhouette"),
        (F.min("s6").cast("double") / F.lit(1e6)).alias(
            "min_silhouette"
        ),
    )


ORACLE_SILHOUETTE = f"""
WITH v AS (
  SELECT vec_id, label,
         list_transform(embedding::DOUBLE[],
           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)) AS xe
  FROM embeddings
), flat AS (
  SELECT label, unnest(range(1, len(xe) + 1)) AS dim, unnest(xe) AS x6
  FROM v
), cent AS (
  SELECT label AS cand, dim,
         CAST(floor(CAST(sum(x6) AS DOUBLE) / count(*) + 0.5) AS BIGINT)
           AS m
  FROM flat GROUP BY 1, 2
), cl AS (
  SELECT cand, list(m ORDER BY dim) AS mv FROM cent GROUP BY 1
), sc AS (
  SELECT x.vec_id, x.label, c.cand,
         list_dot_product(x.xe, x.xe)
           - 2 * list_dot_product(x.xe, c.mv)
           + list_dot_product(c.mv, c.mv) AS d2
  FROM v x CROSS JOIN cl c
), per AS (
  SELECT vec_id, label,
         sqrt(min(CASE WHEN cand = label THEN d2 END)) AS da,
         sqrt(min(CASE WHEN cand <> label THEN d2 END)) AS db
  FROM sc GROUP BY 1, 2
), f AS (
  SELECT label,
         CAST(floor(da * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
           AS da6,
         CAST(floor(db * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT)
           AS db6,
         CAST(floor(coalesce((db - da) / nullif(greatest(da, db), 0.0),
                             0.0)
              * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS s6
  FROM per
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       {sql_stable_round(
           "CAST(sum(da6) AS DOUBLE)"
           " / (CAST(count(da6) AS DOUBLE) * 1000000.0)", 6
       )} AS mean_intra,
       {sql_stable_round(
           "CAST(sum(db6) AS DOUBLE)"
           " / (CAST(count(db6) AS DOUBLE) * 1000000.0)", 6
       )} AS mean_nearest,
       {sql_stable_round(
           "CAST(sum(s6) AS DOUBLE)"
           " / (CAST(count(s6) AS DOUBLE) * 1000000.0)", 6
       )} AS mean_silhouette,
       CAST(min(s6) AS DOUBLE) / 1000000.0 AS min_silhouette
FROM f GROUP BY label
""".strip()


_TRUNC_KS = (16, 32)  # matryoshka prefix widths to audit


def q_embedding_truncation_fidelity(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Matryoshka TRUNCATION fidelity per label (the MRL question,
    Kusupati et al. 2022: can we serve prefix-truncated vectors?):
    for k ∈ {16, 32} of 64 dims, the cosine between each vector and
    its k-prefix truncation is exactly ‖x[:k]‖ / ‖x‖ — mass retained
    in the prefix. Per-label mean + worst-vector min say which classes
    survive cheap truncation and which need the full width (reads
    beside `embedding_dim_variance`: that audits dims globally, this
    audits the serving decision per class).

    Numerics: both norms are the sequential float folds of the
    `embedding_norm_stats` convention (identical doubles both
    engines), fidelity is ONE division e6-fixed per vector before the
    order-free integer sums; zero-norm vectors → NULL via nullif
    (skipped by both engines' aggregates, counted implicitly by
    n_vecs vs the non-null aggregate count). One scan, bounded
    groupBy."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)

    def ssq(col):
        return F.aggregate(
            col,
            F.lit(0.0),
            lambda a, x: a + x.cast("double") * x.cast("double"),
        )

    full = F.sqrt(ssq(F.col("embedding")))
    cols = [F.col("label")]
    for k in _TRUNC_KS:
        fid = F.sqrt(ssq(F.slice(F.col("embedding"), 1, k))) / F.nullif(
            full, F.lit(0.0)
        )
        cols.append(
            F.floor(fid * F.lit(1e6) + F.lit(0.5))
            .cast("long")
            .alias(f"f{k}")
        )
    per = emb.select(*cols)
    aggs = [F.count(F.lit(1)).alias("n_vecs")]
    for k in _TRUNC_KS:
        aggs += [
            stable_round(
                F.sum(f"f{k}").cast("double")
                / (F.count(f"f{k}").cast("double") * F.lit(1e6)),
                6,
            ).alias(f"mean_fid{k}"),
            (F.min(f"f{k}").cast("double") / F.lit(1e6)).alias(
                f"min_fid{k}"
            ),
        ]
    return per.groupBy("label").agg(*aggs)


def _sql_ssq(expr: str) -> str:
    return (
        "list_reduce(list_prepend(0.0::DOUBLE, list_transform("
        + expr
        + ", x -> x::DOUBLE * x::DOUBLE)), (a, v) -> a + v)"
    )


ORACLE_TRUNCATION_FIDELITY = f"""
WITH per AS (
  SELECT label,
         {", ".join(
             f"CAST(floor(sqrt({_sql_ssq(f'embedding[1:{k}]')})"
             f" / nullif(sqrt({_sql_ssq('embedding')}), 0.0)"
             f" * 1000000.0::DOUBLE + 0.5::DOUBLE) AS BIGINT) AS f{k}"
             for k in _TRUNC_KS
         )}
  FROM embeddings
)
SELECT label, CAST(count(*) AS BIGINT) AS n_vecs,
       {", ".join(
           sql_stable_round(
               f"CAST(sum(f{k}) AS DOUBLE)"
               f" / (CAST(count(f{k}) AS DOUBLE) * 1000000.0)", 6
           )
           + f" AS mean_fid{k}, "
           + f"CAST(min(f{k}) AS DOUBLE) / 1000000.0 AS min_fid{k}"
           for k in _TRUNC_KS
       )}
FROM per GROUP BY label
""".strip()


def q_embedding_whiten_eval(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """WHITENING fix-and-measure for anisotropic embeddings (Su et
    al. 2021 "whitening sentence representations" line; rows-only —
    the eigen-solve is not SQL): `embedding_pair_cosine_hist` PROBES
    the collapsed-representation pathology (random pairs all share a
    dominant direction, so every cosine is high and retrieval
    contrast dies); this query applies the standard fix — PCA-whiten
    z = (x−μ)·W·Λ^(−½) — and reports the anisotropy (mean cosine
    over deterministic adjacent-id pairs) BEFORE and AFTER on the
    same pairs, so the probe's pathology and the fix's effect are one
    measured row.

    Scale: the PCA fit is the one-pass O(d²)-state partial-moment
    sweep (operators/pca.py, no shuffle); whitening and the pair
    cosines are row-local (one arithmetic-key self-join for the
    adjacent pairs); the output is a single row.
    """
    from monasca_aggregator_spark.operators.pca import pca_fit, pca_project

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    model = pca_fit(emb, "embedding", k=_DIM)
    proj = pca_project(
        emb, model, "embedding", out_col="p", keep_cols=("vec_id",)
    )
    scale = [
        float(1.0 / (ev + 1e-9) ** 0.5)
        for ev in model.explained_variance
    ]
    white = proj.select(
        "vec_id",
        F.zip_with(
            F.col("p").cast("array<double>"),
            F.array(*[F.lit(s) for s in scale]),
            lambda v, s: v * s,
        ).alias("w"),
    )
    raw = emb.select(
        "vec_id", F.col("embedding").cast("array<double>").alias("e")
    )
    # r11: materialize the joined (raw, whitened) relation once — it
    # feeds both sides of the adjacent-id self-join, and each copy
    # re-ran the whitening projection.
    rw = raw.join(white, "vec_id").cache()
    both = rw.alias("a").join(
        rw.select(
            (F.col("vec_id") - 1).alias("vec_id"),
            F.col("e").alias("e2"),
            F.col("w").alias("w2"),
        )
        .alias("b"),
        "vec_id",
    )

    def _cos(x, y):
        dot = F.aggregate(
            F.zip_with(x, y, lambda a, b: a * b),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        nx = F.sqrt(
            F.aggregate(
                F.zip_with(x, x, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        ny = F.sqrt(
            F.aggregate(
                F.zip_with(y, y, lambda a, b: a * b),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
        )
        return dot / (nx * ny)

    return both.agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.avg(_cos(F.col("e"), F.col("e2"))).alias("mean_cos_raw"),
        F.avg(_cos(F.col("w"), F.col("w2"))).alias(
            "mean_cos_whitened"
        ),
    )


_HUB_K = 5  # kNN fan-out for the graph-health diagnostic
_HUB_CAP = 125  # sample bound: stride = max(1, n div _HUB_CAP)


def q_embedding_knn_hubness(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """kNN-GRAPH health diagnostic (Radovanović 2010's hubness line):
    build the exact k=5 cosine kNN graph over a deterministic sample
    and report the structural symptoms of a degenerate embedding
    space — HUBNESS (a few points appear in everyone's neighbor
    list: max in-degree, in-degree spread) and ANTIHUBS (points in
    nobody's list), plus EDGE RECIPROCITY (mutual-neighbor fraction —
    low reciprocity degrades kNN classification and graph-based
    dedup). The recall gates measure whether ANN finds the true
    neighbors; this measures whether the true-neighbor GRAPH itself
    is healthy enough to trust.

    Mechanics reuse the proven cross-engine pair: `cosine_topk`'s
    unrolled left-fold cosine, e6-quantized sim, (sim DESC, neighbor
    ASC) ties — identical in DuckDB via list_dot_product (the
    ORACLE_ANN contract). In-degree moments are exact integers (Σd²
    BIGINT) into one division.

    Scale: the diagnostic is a statistic, not a per-item output —
    the sample is SELF-BOUNDING (the estimator-gate pattern): the
    modulo stride is computed FROM the corpus count inside the query
    (stride = max(1, n div 125), the same scalar arithmetic in both
    engines), so the all-pairs scan stays ~125² at ANY corpus size
    instead of growing with it; everything after is edge-list-sized
    (≤125·k rows).
    """
    raw = load_table(spark, sf_dir, "embeddings", fan_out=True)
    stride = raw.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"count(1) div {_HUB_CAP}"),
        ).alias("__stride")
    )
    # r11 (guide §2.4): the ≤_HUB_CAP-row sample feeds BOTH
    # cosine_topk sides and the n_nodes count — uncached, each
    # consumer re-ran the embeddings scan + stride filter (5 corpus
    # FileScans → the one count-only stride scan + one sample scan).
    emb = raw.crossJoin(F.broadcast(stride)).filter(
        F.col("vec_id") % F.col("__stride") == 0
    ).drop("__stride").cache()
    edges = (
        cosine_topk(emb, emb, k=_HUB_K, dim=_DIM)
        .select("query_id", "neighbor_id")
        # r11: eager + released with the plan (the cache entry leaked
        # into the session and the three consumers raced a lazy fill)
        .cache()
    )
    n_nodes = emb.agg(F.count(F.lit(1)).alias("n_nodes"))
    tot = edges.agg(F.count(F.lit(1)).alias("n_edges"))
    indeg = edges.groupBy("neighbor_id").agg(
        F.count(F.lit(1)).alias("d")
    )
    ind = indeg.agg(
        F.max("d").alias("max_in_degree"),
        F.sum(F.col("d") * F.col("d")).alias("sum_d2"),
        F.count(F.lit(1)).alias("n_with_in"),
    )
    rev = edges.select(
        F.col("query_id").alias("neighbor_id"),
        F.col("neighbor_id").alias("query_id"),
    )
    recip = (
        edges.join(rev, ["query_id", "neighbor_id"], "left_semi")
        .agg(F.count(F.lit(1)).alias("n_mutual"))
    )
    j = (
        n_nodes.crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(ind))
        .crossJoin(F.broadcast(recip))
    )
    mean_in = F.col("n_edges").cast("double") / F.col("n_nodes").cast(
        "double"
    )
    var_in = (
        F.col("sum_d2").cast("double")
        / F.col("n_nodes").cast("double")
        - mean_in * mean_in
    )
    return j.select(
        F.col("n_nodes").cast("long").alias("n_nodes"),
        F.lit(_HUB_K).cast("int").alias("k"),
        F.col("n_edges").cast("long").alias("n_edges"),
        stable_round(
            F.col("n_mutual").cast("double")
            / F.col("n_edges").cast("double"),
            6,
        ).alias("reciprocity"),
        F.col("max_in_degree").cast("long").alias("max_in_degree"),
        (F.col("n_nodes") - F.col("n_with_in"))
        .cast("long")
        .alias("n_antihubs"),
        stable_round(F.sqrt(var_in), 6).alias("sd_in_degree"),
    )


ORACLE_KNN_HUBNESS = f"""
WITH stride AS (
  SELECT greatest(1, count(*) // {_HUB_CAP}) AS st FROM embeddings
), s AS (
  SELECT vec_id, embedding::DOUBLE[] AS e
  FROM embeddings, stride WHERE vec_id % st = 0
), scored AS (
  SELECT a.vec_id AS q, b.vec_id AS n,
         floor((list_dot_product(a.e, b.e)
               / (sqrt(list_dot_product(a.e, a.e))
                  * sqrt(list_dot_product(b.e, b.e))))
               * 1000000.0::DOUBLE + 0.5::DOUBLE)
           / 1000000.0::DOUBLE AS sim
  FROM s a JOIN s b ON a.vec_id != b.vec_id
), edges AS (
  SELECT q, n FROM (
    SELECT *, row_number() OVER (PARTITION BY q
                                 ORDER BY sim DESC, n ASC) AS rk
    FROM scored
  ) WHERE rk <= {_HUB_K}
), nn AS (
  SELECT count(*) AS n_nodes FROM s
), tot AS (
  SELECT count(*) AS n_edges FROM edges
), ind AS (
  SELECT max(d) AS max_in_degree, sum(d * d) AS sum_d2,
         count(*) AS n_with_in
  FROM (SELECT n, count(*) AS d FROM edges GROUP BY 1)
), rec AS (
  SELECT count(*) AS n_mutual FROM edges e1
  WHERE EXISTS (SELECT 1 FROM edges e2
                WHERE e2.q = e1.n AND e2.n = e1.q)
)
SELECT CAST(n_nodes AS BIGINT) AS n_nodes,
       CAST({_HUB_K} AS INT) AS k,
       CAST(n_edges AS BIGINT) AS n_edges,
       {sql_stable_round(
           "CAST(n_mutual AS DOUBLE) / CAST(n_edges AS DOUBLE)", 6)}
         AS reciprocity,
       CAST(max_in_degree AS BIGINT) AS max_in_degree,
       CAST(n_nodes - n_with_in AS BIGINT) AS n_antihubs,
       {sql_stable_round(
           "sqrt(CAST(sum_d2 AS DOUBLE) / n_nodes"
           " - (CAST(n_edges AS DOUBLE) / n_nodes)"
           "   * (CAST(n_edges AS DOUBLE) / n_nodes))", 6)}
         AS sd_in_degree
FROM nn, tot, ind, rec
""".strip()


def q_embedding_triplet_violations(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """TRIPLET-violation rate per label — the metric-learning eval
    beside kNN accuracy and silhouette: for deterministic triplets
    (anchor, positive = next same-label vector by vec_id, negative =
    the same within-label rank in the NEXT label), a violation is
    cos(anchor, negative) ≥ cos(anchor, positive) — exactly the pairs
    a triplet/contrastive loss would still be paying for. High rate
    in one label = that class's vectors aren't separable from its
    neighbor class.

    Determinism: triplet construction is pure window/rank arithmetic
    (total order by vec_id); cosines are the shared e6-rounded
    ``cosine_fixed`` (the ann_cosine_topk convention, oracle-matched
    by ``list_dot_product``), and the violation compares the ROUNDED
    values so both engines branch identically.

    Scale: one label-partitioned rank window, one equi-join on
    (label, rank), row-local cosines — no all-pairs anything."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    ranked = emb.select(
        "vec_id",
        "label",
        as_double(F.col("embedding")).alias("v"),
        F.row_number()
        .over(Window.partitionBy("label").orderBy("vec_id"))
        .alias("rk"),
    )
    w = Window.partitionBy("label").orderBy("vec_id")
    anchors = ranked.select(
        "vec_id",
        "label",
        "v",
        "rk",
        F.lead("vec_id").over(w).alias("pos_id"),
        F.lead("v").over(w).alias("pv"),
    ).filter(F.col("pos_id").isNotNull())
    nl = emb.agg(F.countDistinct("label").alias("l"))
    a2 = anchors.crossJoin(F.broadcast(nl)).withColumn(
        "nlabel", F.pmod(F.col("label") + 1, F.col("l")).cast("int")
    )
    negs = ranked.select(
        F.col("label").alias("nlabel"),
        F.col("rk"),
        F.col("v").alias("nv"),
    )
    trip = a2.join(negs, ["nlabel", "rk"])
    cos_ap = F.floor(
        cosine_fixed(F.col("v"), F.col("pv"), EMB_DIM)
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    cos_an = F.floor(
        cosine_fixed(F.col("v"), F.col("nv"), EMB_DIM)
        * F.lit(1_000_000.0)
        + F.lit(0.5)
    ).cast("long")
    return (
        trip.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_triplets"),
            F.sum((cos_an >= cos_ap).cast("long")).alias(
                "n_violations"
            ),
        )
        .select(
            "label",
            "n_triplets",
            "n_violations",
            stable_round(
                F.col("n_violations").cast("double")
                / F.col("n_triplets").cast("double"),
                6,
            ).alias("violation_rate"),
        )
    )


_COS6_SQL = (
    "floor((list_dot_product({a}, {b})"
    " / (sqrt(list_dot_product({a}, {a}))"
    " * sqrt(list_dot_product({b}, {b}))))"
    " * 1000000.0::DOUBLE + 0.5::DOUBLE) / 1000000.0::DOUBLE"
)

ORACLE_TRIPLET = f"""
WITH ranked AS (
  SELECT vec_id, label, embedding::DOUBLE[] AS v,
         row_number() OVER (PARTITION BY label ORDER BY vec_id)
           AS rk
  FROM embeddings
), nl AS (
  SELECT count(DISTINCT label) AS l FROM embeddings
), anchors AS (
  SELECT vec_id, label, v, rk,
         lead(vec_id) OVER w AS pos_id, lead(v) OVER w AS pv
  FROM ranked
  WINDOW w AS (PARTITION BY label ORDER BY vec_id)
), trip AS (
  SELECT a.label, a.v, a.pv, n.v AS nv
  FROM anchors a
  CROSS JOIN nl
  JOIN ranked n ON n.label = (a.label + 1) % nl.l AND n.rk = a.rk
  WHERE a.pos_id IS NOT NULL
)
SELECT label, CAST(count(*) AS BIGINT) AS n_triplets,
       CAST(sum(CASE WHEN ({_COS6_SQL.format(a="v", b="nv")})
                      >= ({_COS6_SQL.format(a="v", b="pv")})
                THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
       {sql_stable_round(
           "CAST(sum(CASE WHEN (" + _COS6_SQL.format(a="v", b="nv")
           + ") >= (" + _COS6_SQL.format(a="v", b="pv")
           + ") THEN 1 ELSE 0 END) AS DOUBLE)"
           " / CAST(count(*) AS DOUBLE)", 6)} AS violation_rate
FROM trip GROUP BY 1
""".strip()


def q_embedding_cka(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: LINEAR CKA re-embedding similarity (Kornblith et
    al. 2019 — operators/procrustes.linear_cka), the
    rotation-INVARIANT complement of the Procrustes row: snapshot B
    under a pure signed-permutation isometry must score CKA ≈ 1.0
    (basis changes are not drift), while a rank-halving corruption
    (top half of B's dims zeroed — real information loss) scores
    visibly lower; the gap is what separates "the new embedding
    model re-oriented the space" from "it collapsed it". Two
    scenarios reported side by side, ground truth known by
    construction and pinned in tests/test_procrustes.py.

    Plan: ONE mapInPandas moment-partial scan for BOTH scenarios
    (r12, guide §2.4 — the per-scenario linear_cka calls re-scanned
    the corpus; both share the A-side moments), O(d²) task state, no
    shuffle, driver-side Frobenius norms — the procrustes_alignment
    cost shape."""
    from monasca_aggregator_spark.operators.procrustes import (
        linear_cka_multi,
    )

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        F.col("embedding").cast("array<double>").alias("a")
    )
    both = emb.withColumn(
        "b_iso",
        F.expr(
            "transform(reverse(a),"
            " (x, i) -> CASE WHEN i % 2 = 0 THEN x ELSE -x END)"
        ),
    ).withColumn(
        "b_col",
        F.expr(
            "transform(b_iso, (x, i) -> CASE WHEN i < size(b_iso)"
            " div 2 THEN CAST(0.0 AS DOUBLE) ELSE x END)"
        ),
    )
    r = linear_cka_multi(both, "a", ["b_iso", "b_col"])
    r_iso, r_col = r["b_iso"], r["b_col"]
    return spark.createDataFrame(
        [
            ("isometry", r_iso["n_pairs"], round(r_iso["cka"], 6)),
            (
                "rank_collapsed",
                r_col["n_pairs"],
                round(r_col["cka"], 6),
            ),
        ],
        "scenario string, n_pairs long, cka double",
    )


def q_embedding_procrustes_drift(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Rotation-aware re-embedding drift (rows-only; Schönemann 1966
    orthogonal Procrustes — operators/procrustes.py): raw drift
    numbers (`embedding_centroid_drift`) cannot tell a harmless
    global change of basis from real per-item movement; this one
    aligns the two snapshots with the OPTIMAL rotation first and
    reports the residual that remains.

    Snapshot B is a deterministic exact isometry of A (reverse the
    dims, flip alternate signs — a signed permutation, so ground
    truth is known: before-RMSD is large, after-RMSD is ~0 and
    alignment_gain ~1; real movement injected in pytest lands in the
    after-residual instead). One mapInPandas scan folds (n, Σ‖a‖²,
    Σ‖b‖², aᵀb) partials per partition — O(d²) task state, no
    shuffle; the d×d SVD is driver-side (d = 64 here).
    """
    from monasca_aggregator_spark.operators.procrustes import (
        procrustes_alignment,
    )

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True).select(
        F.col("embedding").cast("array<double>").alias("a")
    )
    pairs = emb.withColumn(
        "b",
        F.expr(
            "transform(reverse(a),"
            " (x, i) -> CASE WHEN i % 2 = 0 THEN x ELSE -x END)"
        ),
    )
    r = procrustes_alignment(pairs, "a", "b")
    return spark.createDataFrame(
        [
            (
                r["n_pairs"],
                float(r["rmsd_before"]),
                float(r["rmsd_after"]),
                float(r["alignment_gain"]),
            )
        ],
        "n_pairs long, rmsd_before double, rmsd_after double,"
        " alignment_gain double",
    )


_JL_K = 16  # projected dimensions
_JL_BINS = 20  # distortion-ratio bins of width 0.1 over [0, 2)


def q_embedding_jl_distortion(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """JOHNSON-LINDENSTRAUSS random-projection DISTORTION audit
    (Achlioptas 2003's ±1 database-friendly projection): every
    embedding projects to k=16 dims through a DETERMINISTIC
    sign matrix s(i,j) = ±1 from parity of (73·i + 151·j), and the
    report histograms the pairwise-distance distortion ratio
    ‖Pa−Pb‖/(√k·‖a−b‖) over the deterministic adjacent-id pairs
    (the `embedding_pair_cosine_hist` protocol) — the measured
    answer to "how much does a cheap 4× dimensionality cut bend MY
    corpus's geometry" before committing an ANN index or a dedup
    threshold to the projected space. JL says mass concentrates at
    1; heavy tails mean this corpus needs a bigger k.

    Exactness: the projection and both distance folds are
    sequential left-folds over fixed index sequences — identical
    IEEE evaluation order in Spark's `aggregate` and DuckDB's
    `list_reduce`, the `ann_cosine_topk` convention — so the binned
    ratios are bit-identical and the histogram is hash-exact.

    Scale: projection is row-local whole-stage-codegen arithmetic
    (no Python); pairing is ONE equi-join on vec_id+1 (O(n), no
    cartesian); output is a 20-row histogram."""
    emb = load_table(spark, sf_dir, "embeddings")
    proj = F.expr(
        f"""transform(sequence(0, {_JL_K - 1}), j ->
              aggregate(sequence(0, {EMB_DIM - 1}),
                        cast(0.0 as double),
                        (acc, i) -> acc
                          + (case when (i * 73 + j * 151) % 2 = 0
                             then 1.0 else -1.0 end)
                          * cast(embedding[i] as double)))"""
    )
    # r11: the interpreted-HOF projection is the expensive part and
    # base feeds both sides of the adjacent-id join — materialize it
    # once so every vector projects exactly once.
    base = emb.select(
        "vec_id", "embedding", proj.alias("p")
    ).cache()
    a = base.select(
        F.col("vec_id").alias("ida"),
        F.col("embedding").alias("ea"),
        F.col("p").alias("pa"),
    )
    b = base.select(
        (F.col("vec_id") - F.lit(1)).alias("ida"),
        F.col("embedding").alias("eb"),
        F.col("p").alias("pb"),
    )

    def _d2(u, v):
        return F.aggregate(
            F.zip_with(
                u,
                v,
                lambda x, y: (x.cast("double") - y.cast("double"))
                * (x.cast("double") - y.cast("double")),
            ),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    j = a.join(b, "ida")
    d2 = _d2(F.col("ea"), F.col("eb"))
    p2 = _d2(F.col("pa"), F.col("pb"))
    ratio = F.sqrt(p2 / (F.lit(float(_JL_K)) * d2))
    binned = j.filter(d2 > 0).select(
        F.least(
            F.lit(_JL_BINS - 1),
            F.floor(ratio * F.lit(10.0)).cast("int"),
        ).alias("bin")
    )
    # r11: the pair total is the sum of the ≤20-row histogram —
    # materialize the histogram once and aggregate IT, replacing the
    # second full pass over the pair relation.
    hist = binned.groupBy("bin").agg(
        F.count(F.lit(1)).alias("n")
    ).cache()
    total = hist.agg(F.sum("n").alias("n_pairs"))
    return (
        hist.crossJoin(F.broadcast(total))
        .select(
            "bin",
            "n",
            stable_round(
                F.col("n").cast("double")
                / F.col("n_pairs").cast("double"),
                6,
            ).alias("frac"),
        )
        .orderBy("bin")
    )


_JL_PROJ_SQL = f"""
  list_transform(range(0, {_JL_K}), j ->
    list_reduce(list_prepend(0.0::DOUBLE,
      list_transform(range(0, {EMB_DIM}), i ->
        (CASE WHEN (i * 73 + j * 151) % 2 = 0
         THEN 1.0::DOUBLE ELSE -1.0::DOUBLE END)
        * embedding[i + 1]::DOUBLE)),
      (acc, x) -> acc + x))
""".strip()

_JL_D2 = (
    "list_reduce(list_prepend(0.0::DOUBLE,"
    " list_transform(range(1, len({u}) + 1),"
    " i -> ({u}[i]::DOUBLE - {v}[i]::DOUBLE)"
    " * ({u}[i]::DOUBLE - {v}[i]::DOUBLE))),"
    " (acc, x) -> acc + x)"
)

ORACLE_JL = f"""
WITH base AS (
  SELECT vec_id, embedding, {_JL_PROJ_SQL} AS p FROM embeddings
), j AS (
  SELECT a.embedding AS ea, b.embedding AS eb, a.p AS pa, b.p AS pb
  FROM base a JOIN base b ON b.vec_id = a.vec_id + 1
), r AS (
  SELECT LEAST({_JL_BINS - 1}, CAST(floor(
           sqrt({_JL_D2.format(u="pa", v="pb")}
                / ({_JL_K}.0 * {_JL_D2.format(u="ea", v="eb")}))
           * 10.0) AS INT)) AS bin
  FROM j
  WHERE {_JL_D2.format(u="ea", v="eb")} > 0
), t AS (SELECT count(*) AS n_pairs FROM r)
SELECT bin, count(*) AS n,
       {sql_stable_round("CAST(count(*) AS DOUBLE) / t.n_pairs", 6)}
         AS frac
FROM r, t GROUP BY bin, t.n_pairs ORDER BY bin
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "embedding_jl_distortion": q_embedding_jl_distortion,
    "embedding_procrustes_drift": q_embedding_procrustes_drift,
    "embedding_cka": q_embedding_cka,  # rows-only (driver Frobenius norms)
    "embedding_triplet_violations": q_embedding_triplet_violations,
    "embedding_knn_hubness": q_embedding_knn_hubness,
    "embedding_whiten_eval": q_embedding_whiten_eval,  # rows-only
    "embedding_knn_accuracy": q_embedding_knn_accuracy,
    "decontaminate_embedding": q_decontaminate_embedding,
    "embedding_hard_negatives": q_embedding_hard_negatives,
    "class_balance_weights": q_class_balance_weights,
    "sample_kcenter": q_sample_kcenter,  # rows-only (greedy sequence)
    "ann_nprobe_sweep": q_ann_nprobe_sweep,  # rows-only (measured recall)
    "embedding_intrinsic_dim": q_embedding_intrinsic_dim,
    "ann_mmr": q_ann_mmr,  # rows-only (greedy order-dependent)
    "embedding_outliers": q_embedding_outliers,
    "media_image_features": q_media_image_features,  # rows-only (stub decode)
    "media_audio_vad": q_media_audio_vad,  # rows-only (real WAV decode)
    "embedding_effective_rank": q_embedding_effective_rank,  # rows-only (driver eigh)
    "embedding_centroids": q_embedding_centroids,
    "embedding_centroid_affinity": q_embedding_centroid_affinity,
    "embedding_centroid_drift": q_embedding_centroid_drift,
    "embedding_pca": q_embedding_pca,  # rows-only (eigen-solve not in SQL)
    "embedding_quantize": q_embedding_quantize,
    "embedding_quantize_error": q_embedding_quantize_error,
    "embedding_truncation_fidelity": q_embedding_truncation_fidelity,
    "embedding_silhouette": q_embedding_silhouette,
    "embedding_centroid_accuracy": q_embedding_centroid_accuracy,
    "ann_cosine_topk": q_ann_cosine_topk,
    "ann_filtered": q_ann_filtered,
    "ann_ivf_cells": q_ann_ivf_cells,
    "ann_pq": q_ann_pq,  # rows-only (approximate recall by design)
    "ann_ivfpq": q_ann_ivfpq,  # rows-only (composed index, recall gated)
    "ann_recall_report": q_ann_recall_report,  # rows-only (measures recall)
    "ann_lsh": q_ann_lsh,  # rows-only (approximate recall by design)
    "ann_ivf": q_ann_ivf,  # rows-only (approximate recall by design)
    "ann_ivf_kmeans": q_ann_ivf_kmeans,  # rows-only (approximate)
}

ORACLES: dict[str, str] = {
    "embedding_jl_distortion": ORACLE_JL,
    "embedding_truncation_fidelity": ORACLE_TRUNCATION_FIDELITY,
    "embedding_silhouette": ORACLE_SILHOUETTE,
    "embedding_knn_accuracy": ORACLE_KNN_ACCURACY,
    "decontaminate_embedding": ORACLE_DECONTAMINATE_EMB,
    "embedding_hard_negatives": ORACLE_HARD_NEGATIVES,
    "class_balance_weights": ORACLE_CLASS_WEIGHTS,
    "embedding_intrinsic_dim": ORACLE_INTRINSIC_DIM,
    "embedding_outliers": ORACLE_EMBEDDING_OUTLIERS,
    "embedding_centroids": ORACLE_CENTROIDS,
    "embedding_centroid_affinity": ORACLE_CENTROID_AFFINITY,
    "embedding_centroid_drift": ORACLE_CENTROID_DRIFT,
    "embedding_knn_hubness": ORACLE_KNN_HUBNESS,
    "ann_cosine_topk": ORACLE_ANN,
    "embedding_triplet_violations": ORACLE_TRIPLET,
    "ann_filtered": ORACLE_ANN_FILTERED,
    "ann_ivf_cells": ORACLE_ANN_IVF_CELLS,
    "embedding_quantize": ORACLE_QUANTIZE,
    "embedding_quantize_error": ORACLE_QUANTIZE_ERROR,
    "embedding_centroid_accuracy": ORACLE_CENTROID_ACCURACY,
}
