"""Product-quantization ANN (operators/pq.py): codebook shape, encode
round-trip, ADC+rerank recall vs exact brute force on real embeddings."""

from __future__ import annotations

import numpy as np

from monasca_aggregator_spark.operators.pq import (
    pq_ann,
    pq_encode,
    train_pq_codebooks,
)
from monasca_aggregator_spark.operators.similarity import cosine_topk
from monasca_aggregator_spark.sources.tables import load_table
from tests.conftest import SF_SMALL


def _emb(spark):
    return load_table(spark, SF_SMALL, "embeddings", fan_out=True)


def test_codebooks_shape_and_determinism(spark):
    emb = _emb(spark)
    b1 = train_pq_codebooks(emb, m=8, k=16, n_iter=3)
    b2 = train_pq_codebooks(emb, m=8, k=16, n_iter=3)
    assert b1.shape == (8, 16, 8)  # 64-dim / 8 subspaces
    assert np.array_equal(b1, b2)  # hash-sample + fixed init → stable


def test_encode_emits_valid_bounded_codes(spark):
    emb = _emb(spark)
    books = train_pq_codebooks(emb, m=8, k=16, n_iter=3)
    codes = pq_encode(emb, books).collect()
    assert len(codes) == emb.count()
    for r in codes:
        assert len(r.codes) == 8
        assert all(0 <= c < 16 for c in r.codes)


def test_pq_rerank_recall_beats_bare_scan(spark):
    emb = _emb(spark)
    queries = emb.filter("vec_id < 10")
    got = pq_ann(emb, queries, k_out=10, m=16, k=16, rerank=50).collect()
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    approx = {(r.query_id, r.neighbor_id) for r in got}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.7  # measured 0.86; floor leaves headroom

    # contract: 10 ranked rows per query, sims sorted desc within query
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) == 10
        sims = [r.sim for r in rows]
        assert sims == sorted(sims, reverse=True)


def test_ivfpq_composed_index_recall_and_contract(spark):
    """IVFPQ (r11, the VERDICT r10 stretch): the composed index's
    recall is bounded by the IVF routing (it only sees probed cells)
    and must not lose MORE than routing does — within probed cells the
    ADC+exact-re-rank pipeline recovers the true within-cell top-k.
    Pin: recall(ivfpq) >= recall(ivf with identical coarse
    quantizer) − small slack, and the output contract matches the
    other ANN paths."""
    from monasca_aggregator_spark.operators.pq import ivfpq_ann
    from monasca_aggregator_spark.operators.similarity import ivf_ann

    emb = _emb(spark)
    queries = emb.filter("vec_id < 10")
    exact = {
        (r.query_id, r.neighbor_id)
        for r in cosine_topk(emb, queries, k=10).collect()
    }
    got = ivfpq_ann(
        emb, queries, k_out=10, m=16, k=16, n_centroids=16, n_probe=4
    ).collect()
    approx = {(r.query_id, r.neighbor_id) for r in got}
    recall_ivfpq = len(exact & approx) / len(exact)

    ivf = {
        (r.query_id, r.neighbor_id)
        for r in ivf_ann(
            emb, queries, k=10, n_centroids=16, n_probe=4
        ).collect()
    }
    recall_ivf = len(exact & ivf) / len(exact)
    # the PQ stage inside probed cells must not cost recall beyond
    # rounding ties (measured: equality at sf0.001)
    assert recall_ivfpq >= recall_ivf - 0.05
    assert recall_ivfpq > 0.2  # measured 0.39; floor leaves headroom

    # contract: k_out ranked rows per query, sims sorted desc
    by_q = {}
    for r in got:
        by_q.setdefault(r.query_id, []).append(r)
    assert len(by_q) == 10
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r.rank)
        assert len(rows) == 10
        sims = [r.sim for r in rows]
        assert sims == sorted(sims, reverse=True)
        assert all(r.query_id != r.neighbor_id for r in rows)
