"""Orthogonal Procrustes alignment between two embedding snapshots —
the re-embedding audit that SEES THROUGH rotations.

When a corpus is re-embedded (new model revision, retrained
projection head), raw per-vector or per-centroid drift
(`embedding_centroid_drift`) conflates two very different events: a
GLOBAL isometry of the space (harmless — every downstream cosine is
unchanged once indexes rebuild) and REAL per-item movement (the thing
that invalidates cached neighbors). The orthogonal Procrustes problem
(Schönemann 1966) separates them: find the rotation R minimizing
Σ‖aᵢR − bᵢ‖² over paired snapshots; the residual AFTER the optimal
rotation is the real drift, and the drop from the before-residual is
the part that was just a change of basis.

Closed form via the cross-covariance M = Σ aᵢᵀbᵢ (d×d): R = UVᵀ from
SVD(M), and the residuals need only scalars —

    before² = Σ‖a‖² + Σ‖b‖² − 2·tr(M)
    after²  = Σ‖a‖² + Σ‖b‖² − 2·Σσᵢ(M)

Scale shape (the `pca_fit` sweep): every partition folds its paired
vectors into (n, Σ‖a‖², Σ‖b‖², M) with one numpy matmul per Arrow
batch — O(d²) state per task regardless of row count, no shuffle; only
the few-KB partials reach the driver, where the d×d SVD runs (d =
embedding width). At 100 TB this is a single scan of the pair join.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("na2", T.DoubleType()),
        T.StructField("nb2", T.DoubleType()),
        T.StructField("m", T.ArrayType(T.DoubleType())),  # flat d×d
    ]
)


def procrustes_alignment(
    pairs: DataFrame, a_col: str, b_col: str
) -> dict:
    """Solve orthogonal Procrustes over ``pairs`` (one row per shared
    item, both snapshot vectors present). Returns::

        {n_pairs, rmsd_before, rmsd_after, alignment_gain, rotation}

    ``rmsd_*`` are per-pair root-mean-square distances before/after
    the optimal rotation; ``alignment_gain`` is the fraction of the
    before-disparity explained by the isometry (1.0 = pure rotation,
    0.0 = nothing was basis change); ``rotation`` is the d×d numpy
    orthogonal matrix for callers that want to re-align snapshot A.
    """

    def _partials(
        batches: Iterator[pd.DataFrame],
    ) -> Iterator[pd.DataFrame]:
        n, na2, nb2, m = 0, 0.0, 0.0, None
        for pdf in batches:
            mask = pdf[a_col].notna() & pdf[b_col].notna()
            if not mask.any():
                continue
            a = np.asarray(
                np.stack(pdf.loc[mask, a_col]), dtype=np.float64
            )
            b = np.asarray(
                np.stack(pdf.loc[mask, b_col]), dtype=np.float64
            )
            n += a.shape[0]
            na2 += float((a * a).sum())
            nb2 += float((b * b).sum())
            m = a.T @ b if m is None else m + a.T @ b
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "na2": [na2],
                    "nb2": [nb2],
                    "m": [list(m.ravel())],
                }
            )

    parts = (
        pairs.select(a_col, b_col)
        .mapInPandas(_partials, _PARTIAL_SCHEMA)
        .collect()
    )
    if not parts:
        raise ValueError("procrustes_alignment: no complete pairs")
    n = sum(p.n for p in parts)
    na2 = sum(p.na2 for p in parts)
    nb2 = sum(p.nb2 for p in parts)
    d = int(round(len(parts[0].m) ** 0.5))
    m = np.sum(
        [np.asarray(p.m).reshape(d, d) for p in parts], axis=0
    )
    u, sig, vt = np.linalg.svd(m)
    rotation = u @ vt
    before2 = max(na2 + nb2 - 2.0 * float(np.trace(m)), 0.0)
    after2 = max(na2 + nb2 - 2.0 * float(sig.sum()), 0.0)
    rmsd_before = (before2 / n) ** 0.5
    rmsd_after = (after2 / n) ** 0.5
    gain = 1.0 - (after2 / before2) if before2 > 0 else 0.0
    return {
        "n_pairs": n,
        "rmsd_before": rmsd_before,
        "rmsd_after": rmsd_after,
        "alignment_gain": gain,
        "rotation": rotation,
    }


def linear_cka(pairs: DataFrame, col_a: str, col_b: str) -> dict:
    """LINEAR CKA between two paired representations (Kornblith et
    al. 2019, "Similarity of Neural Network Representations
    Revisited"): CKA = ‖C_ab‖²_F / (‖C_aa‖_F · ‖C_bb‖_F) over
    CENTERED cross-covariances — 1.0 iff the two spaces agree up to
    an orthogonal transform + isotropic scale (exactly the changes a
    re-embedding is allowed to make), dropping as real
    representational information diverges. The model-version
    comparison metric Procrustes RMSD complements: RMSD measures the
    residual after the best rotation, CKA measures subspace
    agreement regardless of rotation.

    One mapInPandas scan folds (n, Σa, Σb, ΣaaT, ΣbbT, ΣabT)
    partials per partition — O(d²) task state, no shuffle; the
    Frobenius norms are driver-side on the summed d×d matrices.
    """
    import numpy as np
    import pandas as pd

    schema = (
        "n long, sa array<double>, sb array<double>,"
        " maa array<double>, mbb array<double>, mab array<double>"
    )

    def _partials(batches):
        # r12 (guide §4.2): fold whole Arrow batches through numpy
        # matmuls (X.T@X per batch) instead of a per-row Python loop
        # of np.outer calls — same O(d²) task state, two orders of
        # magnitude less interpreter work per batch.
        n, sa, sb, maa, mbb, mab = 0, None, None, None, None, None
        for pdf in batches:
            mask = pdf[col_a].notna() & pdf[col_b].notna()
            if not mask.any():
                continue
            x = np.asarray(
                np.stack(pdf.loc[mask, col_a]), dtype=np.float64
            )
            y = np.asarray(
                np.stack(pdf.loc[mask, col_b]), dtype=np.float64
            )
            if sa is None:
                da, db = x.shape[1], y.shape[1]
                sa, sb = np.zeros(da), np.zeros(db)
                maa = np.zeros((da, da))
                mbb = np.zeros((db, db))
                mab = np.zeros((da, db))
            n += x.shape[0]
            sa += x.sum(axis=0)
            sb += y.sum(axis=0)
            maa += x.T @ x
            mbb += y.T @ y
            mab += x.T @ y
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "sa": [list(sa)],
                    "sb": [list(sb)],
                    "maa": [list(maa.ravel())],
                    "mbb": [list(mbb.ravel())],
                    "mab": [list(mab.ravel())],
                }
            )

    parts = pairs.select(col_a, col_b).mapInPandas(
        _partials, schema
    ).collect()
    if not parts:
        raise ValueError("linear_cka: empty input")
    n = sum(p.n for p in parts)
    sa = np.sum([np.asarray(p.sa) for p in parts], axis=0)
    sb = np.sum([np.asarray(p.sb) for p in parts], axis=0)
    da, db = sa.shape[0], sb.shape[0]
    maa = np.sum(
        [np.asarray(p.maa).reshape(da, da) for p in parts], axis=0
    )
    mbb = np.sum(
        [np.asarray(p.mbb).reshape(db, db) for p in parts], axis=0
    )
    mab = np.sum(
        [np.asarray(p.mab).reshape(da, db) for p in parts], axis=0
    )
    ma, mb = sa / n, sb / n
    caa = maa - n * np.outer(ma, ma)
    cbb = mbb - n * np.outer(mb, mb)
    cab = mab - n * np.outer(ma, mb)
    num = float((cab * cab).sum())
    den = float(
        np.sqrt((caa * caa).sum()) * np.sqrt((cbb * cbb).sum())
    )
    return {"n_pairs": int(n), "cka": num / den if den > 0 else None}


def linear_cka_multi(
    pairs: DataFrame, col_a: str, cols_b: list[str]
) -> dict[str, dict]:
    """Linear CKA of ``col_a`` against SEVERAL candidate columns in
    ONE mapInPandas scan (r12, guide §2.4/§4.2): the per-scenario
    calls each re-scanned the corpus; all scenarios share (n, Σa,
    ΣaaT), and each adds only its own (Σb, ΣbbT, ΣabT) — the scan
    runs once and the per-batch work is one numpy matmul per matrix.
    Rows where ``col_a`` or ANY candidate column is null are dropped
    (the scenario columns are derived from col_a in every caller, so
    their nullity is identical). Returns {col_b: linear_cka-dict}.
    """
    import numpy as np
    import pandas as pd

    k = len(cols_b)
    schema = (
        "n long, sa array<double>, maa array<double>,"
        " sb array<array<double>>, mbb array<array<double>>,"
        " mab array<array<double>>"
    )

    def _partials(batches):
        n, sa, maa = 0, None, None
        sb = mbb = mab = None
        for pdf in batches:
            mask = pdf[col_a].notna()
            for cb in cols_b:
                mask = mask & pdf[cb].notna()
            if not mask.any():
                continue
            x = np.asarray(
                np.stack(pdf.loc[mask, col_a]), dtype=np.float64
            )
            ys = [
                np.asarray(
                    np.stack(pdf.loc[mask, cb]), dtype=np.float64
                )
                for cb in cols_b
            ]
            if sa is None:
                da = x.shape[1]
                sa, maa = np.zeros(da), np.zeros((da, da))
                sb = [np.zeros(y.shape[1]) for y in ys]
                mbb = [
                    np.zeros((y.shape[1], y.shape[1])) for y in ys
                ]
                mab = [np.zeros((da, y.shape[1])) for y in ys]
            n += x.shape[0]
            sa += x.sum(axis=0)
            maa += x.T @ x
            for i, y in enumerate(ys):
                sb[i] += y.sum(axis=0)
                mbb[i] += y.T @ y
                mab[i] += x.T @ y
        if n:
            yield pd.DataFrame(
                {
                    "n": [n],
                    "sa": [list(sa)],
                    "maa": [list(maa.ravel())],
                    "sb": [[list(v) for v in sb]],
                    "mbb": [[list(v.ravel()) for v in mbb]],
                    "mab": [[list(v.ravel()) for v in mab]],
                }
            )

    parts = (
        pairs.select(col_a, *cols_b)
        .mapInPandas(_partials, schema)
        .collect()
    )
    if not parts:
        raise ValueError("linear_cka_multi: empty input")
    n = sum(p.n for p in parts)
    sa = np.sum([np.asarray(p.sa) for p in parts], axis=0)
    da = sa.shape[0]
    maa = np.sum(
        [np.asarray(p.maa).reshape(da, da) for p in parts], axis=0
    )
    ma = sa / n
    caa = maa - n * np.outer(ma, ma)
    fa = float(np.sqrt((caa * caa).sum()))
    out: dict[str, dict] = {}
    for i in range(k):
        sb = np.sum([np.asarray(p.sb[i]) for p in parts], axis=0)
        db = sb.shape[0]
        mbb = np.sum(
            [np.asarray(p.mbb[i]).reshape(db, db) for p in parts],
            axis=0,
        )
        mab = np.sum(
            [np.asarray(p.mab[i]).reshape(da, db) for p in parts],
            axis=0,
        )
        mb = sb / n
        cbb = mbb - n * np.outer(mb, mb)
        cab = mab - n * np.outer(ma, mb)
        num = float((cab * cab).sum())
        den = fa * float(np.sqrt((cbb * cbb).sum()))
        out[cols_b[i]] = {
            "n_pairs": int(n),
            "cka": num / den if den > 0 else None,
        }
    return out
