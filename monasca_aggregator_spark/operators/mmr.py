"""Maximal Marginal Relevance (MMR) diversified top-k retrieval.

Plain top-k by cosine returns near-duplicates of each other when the
corpus has them (and a training-data corpus always does — that's what
the dedup family is for).  MMR re-ranks a candidate pool greedily:

    argmax_c  λ·sim(q, c) − (1−λ)·max_{s∈selected} sim(c, s)

so each pick is relevant to the query AND far from what's already
picked — the standard diversity re-rank (Carbonell & Goldstein '98).

Scale shape: the expensive part stays the existing ANN candidate
generation (operators/similarity.py `cosine_topk` / `ivf_ann` — brute
or bucketed, one Arrow matmul per block).  MMR itself touches only
the POOL (pool × d floats per query, e.g. 50×64), grouped per query
and re-ranked in one vectorized applyInPandas pass — per-query work
is O(k · pool · d) on a few-KB matrix, independent of corpus size.
The greedy loop is order-dependent, so this is a rows-only operator:
exactness is pinned against a numpy reference in tests/test_mmr.py,
ties broken by neighbor_id for determinism.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.similarity import cosine_topk


def mmr_select(
    qv: np.ndarray,
    cand_ids: np.ndarray,
    cand_vecs: np.ndarray,
    *,
    k: int,
    lam: float,
) -> list[tuple[int, int, float]]:
    """Greedy MMR over one query's candidate pool (unit-normalized
    vectors in, cosine = dot).  Returns [(rank, neighbor_id,
    mmr_score)].  Shared by the Spark path and the test reference."""
    n = len(cand_ids)
    rel = cand_vecs @ qv  # sim(q, c) for all candidates
    # sim(c_i, c_j) matrix once; pool is small by construction
    cc = cand_vecs @ cand_vecs.T
    picked: list[int] = []
    out: list[tuple[int, int, float]] = []
    mask = np.zeros(n, dtype=bool)
    for rank in range(1, min(k, n) + 1):
        if picked:
            div = cc[:, picked].max(axis=1)
        else:
            div = np.zeros(n)
        score = lam * rel - (1.0 - lam) * div
        score[mask] = -np.inf
        best = score.max()
        # deterministic tie-break: smallest neighbor_id among argmaxes
        ties = np.flatnonzero(score >= best - 1e-12)
        i = ties[np.argmin(cand_ids[ties])]
        picked.append(i)
        mask[i] = True
        out.append((rank, int(cand_ids[i]), float(score[i])))
    return out


def mmr_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    k: int = 10,
    pool: int = 50,
    lam: float = 0.7,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Diversified top-k: ANN candidate pool → per-query greedy MMR.

    Output: (query_id, rank, neighbor_id, mmr_score), rank 1..k in
    selection order."""
    cands = cosine_topk(corpus, queries, k=pool)
    cvec = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("nv"),
    )
    qvec = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("qv")
    )
    pooled = cands.join(cvec, "neighbor_id").join(
        F.broadcast(qvec), "query_id"
    )

    def _rerank(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        qv = np.asarray(pdf["qv"].iloc[0], dtype=float)
        qv = qv / np.linalg.norm(qv)
        vecs = np.stack(
            [np.asarray(v, dtype=float) for v in pdf["nv"]]
        )
        vecs = vecs / np.linalg.norm(vecs, axis=1, keepdims=True)
        ids = pdf["neighbor_id"].to_numpy()
        rows = mmr_select(qv, ids, vecs, k=k, lam=lam)
        return pd.DataFrame(
            [(key[0], r, nid, s) for r, nid, s in rows],
            columns=["query_id", "rank", "neighbor_id", "mmr_score"],
        )

    return pooled.groupBy("query_id").applyInPandas(
        _rerank,
        "query_id long, rank int, neighbor_id long, mmr_score double",
    )
