"""Product-quantization ANN (Jégou, Douze & Schmid, "Product
quantization for nearest neighbor search", TPAMI 2011 — public paper,
implemented from scratch).

The missing piece between brute force and IVF at 100 TB is SCAN COST:
even a perfectly pruned cosine scan reads full vectors (here 64
doubles = 512 bytes/vector). PQ splits each L2-normalized vector into
``m`` subspaces, k-means-codes each subspace (``k`` centroids), and
stores only the code ids — 16 bytes/vector at (m=16, k=16), a 32×
smaller scan — then searches with asymmetric distance (query kept
exact, corpus quantized) and re-ranks a small candidate set with
exact vectors. Measured on the test embeddings: recall@10 = 0.49 from
the compressed scan alone, 0.86 after top-50 exact re-rank.

Scale posture:
- codebooks train on a deterministic hash-sample bounded by
  ``sample_limit`` — cost independent of corpus size (same stance as
  IVF training); the trained codebook is m·k·(d/m) doubles (tiny) and
  ships to executors inside the encode/search closures;
- encoding is a vectorized Arrow pandas UDF — narrow projection, no
  shuffle, one pass;
- the ADC scan is mapInPandas over the ENCODED corpus (the 32×
  smaller relation) emitting per-partition per-query top-R, so the
  shuffle after it carries ≤ n_partitions·n_queries·R candidate rows;
- re-ranking joins the ≤ n_queries·R candidate ids back to the full
  corpus broadcast-side (candidates are the small side), reads exact
  vectors for just those rows, and re-sorts.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.vectors import as_double, cosine


def _normalize(X: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(X, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return X / n


def train_pq_codebooks(
    corpus: DataFrame,
    *,
    m: int = 16,
    k: int = 16,
    n_iter: int = 10,
    sample_limit: int = 16384,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Per-subspace Lloyd k-means on a deterministic hash-sample.
    Returns the (m, k, d/m) codebook tensor — small enough to live in
    task closures. Init is evenly spaced sample rows (reproducible,
    partitioning-independent)."""
    sample = (
        corpus.select(
            as_double(F.col(vec_col)).alias("__vec"),
            F.xxhash64(F.col(id_col).cast("string")).alias("__h"),
        )
        .orderBy("__h")
        .limit(sample_limit)
    )
    X = _normalize(
        np.array([r["__vec"] for r in sample.collect()], dtype=float)
    )
    n, d = X.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    books = []
    for j in range(m):
        S = X[:, j * dsub : (j + 1) * dsub]
        C = S[np.linspace(0, n - 1, k).astype(int)].copy()
        for _ in range(n_iter):
            assign = ((S[:, None, :] - C[None, :, :]) ** 2).sum(-1).argmin(1)
            for c in range(k):
                mask = assign == c
                if mask.any():
                    C[c] = S[mask].mean(0)
        books.append(C)
    return np.stack(books)


def pq_encode(
    corpus: DataFrame,
    books: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Corpus → (id, codes array<int>): argmin-L2 per subspace over
    the codebook, vectorized per Arrow batch. Zero shuffle."""
    m, k, dsub = books.shape

    def _enc(batches):
        import pandas as pd

        for pdf in batches:
            X = _normalize(np.array(pdf[vec_col].tolist(), dtype=float))
            codes = np.empty((len(X), m), dtype=np.int32)
            for j in range(m):
                S = X[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = (
                    ((S[:, None, :] - books[j][None, :, :]) ** 2)
                    .sum(-1)
                    .argmin(1)
                )
            yield pd.DataFrame(
                {id_col: pdf[id_col], "codes": list(codes.tolist())}
            )

    id_type = dict(corpus.dtypes)[id_col]
    return corpus.select(id_col, vec_col).mapInPandas(
        _enc, schema=f"{id_col} {id_type}, codes array<int>"
    )


def pq_ann(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k_out: int = 10,
    m: int = 16,
    k: int = 16,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    books: np.ndarray | None = None,
) -> DataFrame:
    """End-to-end PQ search: train → encode → ADC scan over the
    compressed corpus → exact re-rank of the top-``rerank`` candidates
    per query. Output (query_id, rank, neighbor_id, sim) like the
    other ANN paths; sim is exact cosine (from the re-rank pass).

    ``books`` (r12, guide §1.2): callers that train the SAME codebook
    for several indexes (ann_recall_report trains pq + ivfpq on one
    corpus) pass it in so the deterministic hash-sample collect +
    driver k-means run once — identical tensor, fewer driver jobs."""
    if books is None:
        books = train_pq_codebooks(
            corpus, m=m, k=k, id_col=id_col, vec_col=vec_col
        )
    mm, kk, dsub = books.shape
    codes = pq_encode(corpus, books, id_col=id_col, vec_col=vec_col)

    # queries are a bounded set by contract (the ANN query surface);
    # their exact LUTs — (n_q, m, k) floats — ride in the task closure
    qrows = queries.select(
        F.col(id_col).alias("query_id"), as_double(F.col(vec_col))
    ).collect()
    qids = [r[0] for r in qrows]
    Q = _normalize(np.array([r[1] for r in qrows], dtype=float))
    luts = np.stack(
        [
            np.stack(
                [
                    ((q[j * dsub : (j + 1) * dsub][None, :] - books[j]) ** 2)
                    .sum(-1)
                    for j in range(mm)
                ]
            )
            for q in Q
        ]
    )  # (n_q, m, k)

    def _scan(batches):
        import pandas as pd

        for pdf in batches:
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)  # (n, m)
            ids = pdf[id_col].to_numpy()
            rows = []
            take = min(rerank, len(C))
            for qi, qid in enumerate(qids):
                # ADC: distance = sum over subspaces of LUT[sub, code]
                dist = luts[qi][np.arange(mm)[:, None], C.T].sum(0)
                top = np.argpartition(dist, take - 1)[:take]
                rows.append(
                    pd.DataFrame(
                        {
                            "query_id": qid,
                            id_col: ids[top],
                            "adc_dist": dist[top],
                        }
                    )
                )
            if rows:
                yield pd.concat(rows)

    qid_type = dict(queries.dtypes)[id_col]
    partial = codes.mapInPandas(
        _scan,
        schema=f"query_id {qid_type}, {id_col} {dict(corpus.dtypes)[id_col]},"
        " adc_dist double",
    ).filter(F.col("query_id") != F.col(id_col))

    w = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col(id_col).asc()
    )
    candidates = (
        partial.withColumn("__r", F.row_number().over(w))
        .filter(F.col("__r") <= rerank)
        .select("query_id", id_col)
    )

    # exact re-rank: candidate ids (≤ n_q·rerank rows) broadcast against
    # the full corpus; only those rows' vectors are read exactly
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("__qv"),
    )
    exact = (
        corpus.select(
            F.col(id_col), as_double(F.col(vec_col)).alias("__cv")
        )
        .join(F.broadcast(candidates), id_col)
        .join(F.broadcast(qvecs), "query_id")
        .select(
            "query_id",
            F.col(id_col).alias("neighbor_id"),
            F.round(cosine(F.col("__qv"), F.col("__cv")), 6).alias("sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k_out)
        .select("query_id", "rank", "neighbor_id", "sim")
    )


def ivfpq_ann(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k_out: int = 10,
    m: int = 16,
    k: int = 16,
    n_centroids: int = 16,
    n_probe: int = 4,
    rerank: int = 50,
    centroids: DataFrame | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int | None = None,
    books: np.ndarray | None = None,
) -> DataFrame:
    """IVF+PQ composed index (Jégou et al. 2011 §V — the FAISS
    ``IVFPQ`` shape, without residual encoding, documented): a coarse
    IVF quantizer routes each query to its ``n_probe`` nearest cells,
    the ADC scan reads only the PQ CODES of those cells (32× smaller
    than raw vectors at m=16/k=16), and the top-``rerank`` candidates
    re-rank on exact vectors. This is the index a real 100 TB
    embedding store ships: IVF bounds WHICH rows are touched
    (~n_probe/n_centroids of the corpus), PQ bounds the BYTES per
    touched row, and the re-rank restores exactness where it matters.

    Non-residual simplification: codes quantize the L2-normalized
    vectors directly, one global codebook (FAISS ``by_residual =
    false``); residual encoding would add a per-cell centroid
    subtraction for ~recall parity at these tiny test scales, at the
    cost of coupling codebook training to cell assignment.

    Scale posture:
    - coarse centroids + codebooks train on bounded hash-samples
      (cost independent of corpus size), ship in task closures;
    - cell assignment and PQ encoding are each ONE Arrow pass over
      the corpus, no shuffle;
    - the probe join is a broadcast of (query, cell) pairs onto the
      encoded relation — only probed cells' codes flow further;
    - the candidate shuffle carries ≤ n_queries·rerank rows; the
      exact re-rank joins candidates broadcast-side.

    Output (query_id, rank, neighbor_id, sim) like the other ANN
    paths; sim is exact cosine from the re-rank pass.
    """
    from monasca_aggregator_spark.functions.vectors import cosine_fixed

    def _cos(a, b):
        return cosine_fixed(a, b, dim) if dim else cosine(a, b)

    # 1. coarse quantizer
    if centroids is not None:
        cents = centroids.select("cent_id", "cent_vec")
    else:
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
    cents_lit = [
        (r.cent_id, list(r.cent_vec))
        for r in cents.select("cent_id", "cent_vec").collect()
    ]
    # 2. PQ codebooks (global, bounded sample); shared via the
    # ``books`` param when the caller trains several indexes (r12)
    if books is None:
        books = train_pq_codebooks(
            corpus, m=m, k=k, id_col=id_col, vec_col=vec_col
        )
    mm, kk, dsub = books.shape

    # 3. one Arrow pass: (id, cell, codes) — the entire stored index.
    # r11 (guide §4): codes and cell come out of the SAME mapInPandas
    # batch loop (previously pq_encode + a second Arrow UDF pass +
    # an id equi-join just to glue the two columns back together).
    # The numpy math replicates pq_encode (codes over _normalize'd
    # vectors) and nearest_centroid_udf (argmax cosine, first-max
    # tie-break on the cent_id-sorted centroid matrix) exactly, so
    # every (id, codes, cell) triple is unchanged.
    c_order = sorted(cents_lit, key=lambda t: t[0])
    c_ids = np.array([c for c, _ in c_order], dtype="int32")
    c_mat = np.vstack([v for _, v in c_order]).astype("float64")
    c_mat /= np.maximum(
        np.linalg.norm(c_mat, axis=1, keepdims=True), 1e-300
    )

    def _enc_assign(batches):
        import pandas as pd

        for pdf in batches:
            raw = np.array(pdf[vec_col].tolist(), dtype=float)
            X = _normalize(raw)
            codes = np.empty((len(X), mm), dtype=np.int32)
            for j in range(mm):
                S = X[:, j * dsub : (j + 1) * dsub]
                codes[:, j] = (
                    ((S[:, None, :] - books[j][None, :, :]) ** 2)
                    .sum(-1)
                    .argmin(1)
                )
            A = raw / np.maximum(
                np.linalg.norm(raw, axis=1, keepdims=True), 1e-300
            )
            cells = c_ids[np.argmax(A @ c_mat.T, axis=1)]
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "codes": list(codes.tolist()),
                    "cell": cells,
                }
            )

    cid_dtype = dict(corpus.dtypes)[id_col]
    encoded = corpus.select(id_col, vec_col).mapInPandas(
        _enc_assign,
        schema=f"{id_col} {cid_dtype}, codes array<int>, cell int",
    )

    # 4. query probes: n_probe nearest cells per query (tiny side)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        as_double(F.col(vec_col)).alias("q_vec"),
    )
    scored_cells = q.crossJoin(F.broadcast(cents)).select(
        "query_id",
        "cent_id",
        _cos(F.col("q_vec"), F.col("cent_vec")).alias("__csim"),
    )
    wp = Window.partitionBy("query_id").orderBy(
        F.col("__csim").desc(), F.col("cent_id").asc()
    )
    probes = (
        scored_cells.withColumn("__r", F.row_number().over(wp))
        .filter(F.col("__r") <= n_probe)
        .select("query_id", F.col("cent_id").alias("cell"))
    )

    # 5. ADC over probed cells only — LUTs ride in the closure
    qrows = q.collect()
    qlut = {}
    for r in qrows:
        qv = np.asarray(r.q_vec, dtype=float)
        nrm = np.linalg.norm(qv)
        qv = qv / (nrm if nrm > 0 else 1.0)
        qlut[r.query_id] = np.stack(
            [
                ((qv[j * dsub : (j + 1) * dsub][None, :] - books[j]) ** 2)
                .sum(-1)
                for j in range(mm)
            ]
        )

    cand_in = encoded.join(F.broadcast(probes), "cell").select(
        "query_id", F.col(id_col).alias("neighbor_id"), "codes"
    )

    def _adc(batches):
        import pandas as pd

        for pdf in batches:
            if pdf.empty:
                continue
            C = np.array(pdf["codes"].tolist(), dtype=np.int64)
            out = np.empty(len(C), dtype=float)
            qs = pdf["query_id"].to_numpy()
            for qid in np.unique(qs):
                sel = qs == qid
                out[sel] = (
                    qlut[qid][np.arange(mm)[:, None], C[sel].T].sum(0)
                )
            yield pd.DataFrame(
                {
                    "query_id": qs,
                    "neighbor_id": pdf["neighbor_id"],
                    "adc_dist": out,
                }
            )

    qid_type = dict(queries.dtypes)[id_col]
    cid_type = dict(corpus.dtypes)[id_col]
    partial = cand_in.mapInPandas(
        _adc,
        schema=(
            f"query_id {qid_type}, neighbor_id {cid_type},"
            " adc_dist double"
        ),
    ).filter(F.col("query_id") != F.col("neighbor_id"))

    wr = Window.partitionBy("query_id").orderBy(
        F.col("adc_dist").asc(), F.col("neighbor_id").asc()
    )
    candidates = (
        partial.withColumn("__r", F.row_number().over(wr))
        .filter(F.col("__r") <= rerank)
        .select("query_id", "neighbor_id")
    )

    # 6. exact re-rank of the bounded candidate set
    exact = (
        corpus.select(
            F.col(id_col).alias("neighbor_id"),
            as_double(F.col(vec_col)).alias("__cv"),
        )
        .join(F.broadcast(candidates), "neighbor_id")
        .join(
            F.broadcast(
                q.select("query_id", F.col("q_vec").alias("__qv"))
            ),
            "query_id",
        )
        .select(
            "query_id",
            "neighbor_id",
            F.round(_cos(F.col("__qv"), F.col("__cv")), 6).alias("sim"),
        )
    )
    w2 = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        exact.withColumn("rank", F.row_number().over(w2))
        .filter(F.col("rank") <= k_out)
        .select("query_id", "rank", "neighbor_id", "sim")
    )
