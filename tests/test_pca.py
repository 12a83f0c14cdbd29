"""Distributed PCA: the partial-moment fit must agree with a local
numpy PCA on the same data, components must be orthonormal with
descending explained variance, and the projection must reconstruct."""

from __future__ import annotations

import numpy as np
import pytest

from monasca_aggregator_spark.operators.pca import pca_fit, pca_project


def _synthetic(spark, n=400, seed=7):
    rng = np.random.default_rng(seed)
    # strong direction + two weaker ones + noise, d=8
    basis = np.linalg.qr(rng.normal(size=(8, 8)))[0]
    scales = np.array([5.0, 2.0, 1.0, 0.3, 0.3, 0.3, 0.3, 0.3])
    x = rng.normal(size=(n, 8)) * scales @ basis.T + rng.normal(
        size=8
    )
    rows = [(i, [float(v) for v in x[i]]) for i in range(n)]
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<double>"),
        x,
    )


def test_fit_matches_local_numpy(spark):
    df, x = _synthetic(spark)
    model = pca_fit(df.repartition(7), "embedding", k=3)

    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False)
    evals, evecs = np.linalg.eigh(cov)
    order = np.argsort(evals)[::-1][:3]
    assert np.allclose(model.mean, mean, atol=1e-9)
    assert np.allclose(model.explained_variance, evals[order], atol=1e-9)
    for j, col in enumerate(order):
        # eigenvectors match up to sign
        assert abs(float(model.components[:, j] @ evecs[:, col])) == (
            pytest.approx(1.0, abs=1e-9)
        )


def test_components_orthonormal_variance_descending(spark):
    df, _ = _synthetic(spark)
    model = pca_fit(df, "embedding", k=4)
    gram = model.components.T @ model.components
    assert np.allclose(gram, np.eye(4), atol=1e-9)
    ev = model.explained_variance
    assert all(ev[i] >= ev[i + 1] for i in range(len(ev) - 1))
    assert 0.0 < model.explained_variance_ratio.sum() <= 1.0 + 1e-12
    # the planted strong direction dominates
    assert model.explained_variance_ratio[0] > 0.5


def test_fit_is_partitioning_invariant(spark):
    df, _ = _synthetic(spark)
    m1 = pca_fit(df.repartition(1), "embedding", k=2)
    m13 = pca_fit(df.repartition(13), "embedding", k=2)
    assert np.allclose(m1.components, m13.components, atol=1e-8)
    assert np.allclose(
        m1.explained_variance, m13.explained_variance, atol=1e-8
    )


def test_projection_reconstructs_at_full_rank(spark):
    df, x = _synthetic(spark, n=100)
    model = pca_fit(df, "embedding", k=8)
    proj = {
        r.vec_id: np.asarray(r.pca, dtype=np.float64)
        for r in pca_project(
            df, model, "embedding", keep_cols=("vec_id",)
        ).collect()
    }
    for i in range(100):
        recon = model.mean + proj[i] @ model.components.T
        # float32 projection column → ~1e-4 relative accuracy
        assert np.allclose(recon, x[i], atol=5e-3)


def test_embedding_effective_rank_spectrum_invariants(spark, monkeypatch):
    """Effective rank (r9, Roy & Vetterli 2007): a corpus spanning
    exactly 3 directions has effective rank ≈ 3 (and participation
    ratio ≤ effective rank ≤ d); reruns are identical."""
    import numpy as np

    import monasca_aggregator_spark.plans.similarity as SIM

    rng = np.random.default_rng(7)
    basis = rng.standard_normal((3, 16))
    rows = []
    for i in range(120):
        w = rng.standard_normal(3)
        v = (w @ basis).astype(float)
        rows.append((i, [float(x) for x in v], i % 2))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )
    monkeypatch.setattr(
        SIM, "load_table", lambda spark, sf_dir, name, **kw: df
    )
    out = {
        r.label: r
        for r in SIM.q_embedding_effective_rank(spark, "x").collect()
    }
    assert set(out) == {"0", "1", "ALL"}
    for r in out.values():
        assert 1.0 <= r.participation_ratio <= r.effective_rank + 1e-6
        assert r.effective_rank <= r.d
        # rank-3 data: AT MOST 3 live directions (entropy of an
        # uneven 3-eigenvalue spectrum can sit below 3)
        assert 1.5 < r.effective_rank <= 3.02
        assert r.top8_var_ratio == 1.0
    again = {
        r.label: tuple(r)
        for r in SIM.q_embedding_effective_rank(spark, "x").collect()
    }
    assert again == {k: tuple(v) for k, v in out.items()}
