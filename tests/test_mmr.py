"""MMR diversified retrieval: Spark path ≡ shared-greedy numpy
reference, and the diversity property itself (a clique of near-identical
candidates yields at most one pick while plain top-k returns them all).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.mmr import mmr_rerank, mmr_select


def _emb_df(spark, vecs):
    rows = [(i, [float(x) for x in v], 0) for i, v in enumerate(vecs)]
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )


def test_mmr_matches_reference_on_real_table(spark, sf_small):
    from monasca_aggregator_spark.sources.tables import load_table

    corpus = load_table(spark, sf_small, "embeddings", fan_out=True)
    queries = corpus.filter(F.col("vec_id") < 3)
    got = (
        mmr_rerank(corpus, queries, k=5, pool=20, lam=0.7)
        .orderBy("query_id", "rank")
        .collect()
    )
    # reference: same candidate pool (via the same cosine_topk), same
    # greedy on numpy
    from monasca_aggregator_spark.operators.similarity import cosine_topk

    cands = cosine_topk(corpus, queries, k=20).collect()
    vecs = {
        r["vec_id"]: np.asarray(r["embedding"], dtype=float)
        for r in corpus.collect()
    }
    by_q: dict[int, list[int]] = {}
    for r in cands:
        by_q.setdefault(r["query_id"], []).append(r["neighbor_id"])
    want = []
    for qid in sorted(by_q):
        qv = vecs[qid] / np.linalg.norm(vecs[qid])
        ids = np.array(sorted(by_q[qid]))
        m = np.stack([vecs[i] for i in ids])
        m = m / np.linalg.norm(m, axis=1, keepdims=True)
        for rank, nid, _ in mmr_select(qv, ids, m, k=5, lam=0.7):
            want.append((qid, rank, nid))
    assert [(r["query_id"], r["rank"], r["neighbor_id"]) for r in got] == want


def test_mmr_diversifies_clique(spark):
    # query along axis0; a clique of 5 mutual near-copies at relevance
    # 0.8 (sim within clique ~1.0) and 3 equally-relevant vectors that
    # are FAR from the clique (sim to it 0.28). Plain top-5 by cosine
    # returns the whole clique; MMR must stop at 2 clique members
    # because after the first pick the clique's diversity penalty (1.0)
    # dwarfs the distinct vectors' (0.28). The query vector itself is a
    # 9th row so candidate relevances are untainted.
    query = [np.array([1.0, 0.0, 0.0, 0.0])]
    rng = np.random.default_rng(7)
    base = np.array([0.8, 0.6, 0.0, 0.0])
    copies = [base + rng.normal(0, 0.005, 4) for _ in range(5)]
    distinct = [
        np.array([0.8, -0.6, 0.0, 0.0]),
        np.array([0.8, 0.0, 0.6, 0.0]),
        np.array([0.8, 0.0, 0.0, 0.6]),
    ]
    # ids: 0 query, 1-5 copies, 6-8 distinct
    corpus = _emb_df(spark, query + copies + distinct)
    queries = corpus.filter(F.col("vec_id") == 0)
    out = mmr_rerank(
        corpus, queries, k=5, pool=8, lam=0.7
    ).collect()
    picked = {r["neighbor_id"] for r in out}
    n_copies = len(picked & {1, 2, 3, 4, 5})
    assert n_copies <= 2
    assert picked >= {6, 7, 8}  # every distinct direction got picked


def test_mmr_rank1_is_plain_topk_winner(spark):
    # first pick has no diversity term -> must equal cosine top-1
    rng = np.random.default_rng(3)
    corpus = _emb_df(spark, rng.normal(size=(30, 8)))
    queries = corpus.filter(F.col("vec_id") < 2)
    from monasca_aggregator_spark.operators.similarity import cosine_topk

    top1 = {
        r["query_id"]: r["neighbor_id"]
        for r in cosine_topk(corpus, queries, k=1).collect()
    }
    got = {
        r["query_id"]: r["neighbor_id"]
        for r in mmr_rerank(corpus, queries, k=3, pool=10).collect()
        if r["rank"] == 1
    }
    assert got == top1
