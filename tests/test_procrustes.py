"""operators/procrustes.py pins: exact isometry recovery, real-drift
residual attribution, identity baseline."""

from __future__ import annotations

import numpy as np


def _pairs_df(spark, a, b):
    rows = [(x.tolist(), y.tolist()) for x, y in zip(a, b)]
    return spark.createDataFrame(
        rows, "a array<double>, b array<double>"
    )


def test_procrustes_recovers_exact_isometry(spark):
    """B = A under a signed permutation (an orthogonal map): the
    before-RMSD is large, the after-RMSD collapses to ~0, gain ~1,
    and the recovered rotation maps A onto B."""
    from monasca_aggregator_spark.operators.procrustes import (
        procrustes_alignment,
    )

    rng = np.random.RandomState(7)
    a = rng.randn(200, 16)
    perm = np.eye(16)[::-1] * np.where(np.arange(16) % 2, -1.0, 1.0)
    b = a @ perm
    r = procrustes_alignment(_pairs_df(spark, a, b), "a", "b")
    assert r["n_pairs"] == 200
    assert r["rmsd_before"] > 1.0
    assert r["rmsd_after"] < 1e-5
    assert r["alignment_gain"] > 0.999999
    assert np.allclose(a @ r["rotation"], b, atol=1e-8)


def test_procrustes_residual_is_real_drift(spark):
    """Rotation + genuine per-item noise: the rotation part is
    absorbed (after << before) but the injected noise magnitude
    survives in the after-residual — per-item movement cannot be
    explained away as basis change."""
    from monasca_aggregator_spark.operators.procrustes import (
        procrustes_alignment,
    )

    rng = np.random.RandomState(11)
    a = rng.randn(500, 16)
    perm = np.eye(16)[::-1] * np.where(np.arange(16) % 2, -1.0, 1.0)
    noise = rng.randn(500, 16) * 0.1
    b = a @ perm + noise
    r = procrustes_alignment(_pairs_df(spark, a, b), "a", "b")
    expected_noise_rmsd = float(
        np.sqrt((noise**2).sum() / 500)
    )
    assert r["rmsd_after"] < r["rmsd_before"] / 3
    # residual ≈ injected noise magnitude (±25%)
    assert abs(r["rmsd_after"] - expected_noise_rmsd) < (
        0.25 * expected_noise_rmsd
    )


def test_procrustes_identity_and_null_rows(spark):
    """B = A → zero residuals both sides; rows with a NULL side are
    excluded from the pairing."""
    from monasca_aggregator_spark.operators.procrustes import (
        procrustes_alignment,
    )

    rng = np.random.RandomState(3)
    a = rng.randn(50, 8)
    df = _pairs_df(spark, a, a)
    null_row = spark.createDataFrame(
        [([1.0] * 8, None)], "a array<double>, b array<double>"
    )
    r = procrustes_alignment(df.unionByName(null_row), "a", "b")
    assert r["n_pairs"] == 50
    assert r["rmsd_before"] < 1e-6
    assert r["rmsd_after"] < 1e-6


def test_procrustes_query_headline(spark, sf_small):
    """The registered rows-only query: the synthesized snapshot B is
    a pure isometry of A, so the headline is before>0, after~0,
    gain~1."""
    from monasca_aggregator_spark.plans.similarity import (
        q_embedding_procrustes_drift,
    )

    (row,) = q_embedding_procrustes_drift(spark, sf_small).collect()
    assert row["n_pairs"] == 500
    assert row["rmsd_before"] > 0.5
    assert row["rmsd_after"] < 1e-6
    assert row["alignment_gain"] > 0.999


def test_linear_cka_invariance_and_sensitivity(spark):
    """Linear CKA (r9): exactly 1.0 under an orthogonal transform +
    isotropic scale (the changes a re-embedding is allowed to make),
    strictly lower when dimensions are zeroed (real information
    loss), and symmetric."""
    import numpy as np

    from monasca_aggregator_spark.operators.procrustes import linear_cka

    rng = np.random.default_rng(11)
    x = rng.standard_normal((200, 12))
    q, _ = np.linalg.qr(rng.standard_normal((12, 12)))
    y_iso = 2.5 * (x @ q)                     # rotation + scale
    y_cut = x.copy()
    y_cut[:, :6] = 0.0                        # rank collapse
    def df(a, b):
        return spark.createDataFrame(
            [([float(v) for v in ai], [float(v) for v in bi])
             for ai, bi in zip(a, b)],
            "a array<double>, b array<double>",
        )
    r1 = linear_cka(df(x, y_iso), "a", "b")
    assert abs(r1["cka"] - 1.0) < 1e-9
    r2 = linear_cka(df(x, y_cut), "a", "b")
    assert r2["cka"] < 0.95
    r2t = linear_cka(df(y_cut, x), "a", "b")
    assert abs(r2["cka"] - r2t["cka"]) < 1e-9
    assert r1["n_pairs"] == r2["n_pairs"] == 200
