"""Distributed PCA over an embedding column — the dimensionality
reduction step of large-scale embedding pipelines (compress vectors
before ANN indexing / clustering / dedup).

Scale shape (the textbook one-pass moment sweep):

1. FIT: every partition folds its vectors into (count, Σx, ΣxxT) with
   numpy — O(d²) state per task regardless of row count — and only
   those partials (a few KB each) reach the driver. No shuffle at all;
   at 100 TB this is a single scan. The d×d eigendecomposition is
   driver-side numpy (d is embedding width, ≤ a few thousand).
2. PROJECT: the (mean, components) matrix is broadcast inside an
   Arrow-batched mapInPandas; each batch is one numpy matmul. Again no
   shuffle, and the output column is k floats instead of d.

Component signs are canonicalized (largest-|coordinate| positive) so
fits are deterministic across partitionings and engines.
"""

from __future__ import annotations

from collections.abc import Iterator
from dataclasses import dataclass

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_PARTIAL_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("s", T.ArrayType(T.DoubleType())),
        T.StructField("m", T.ArrayType(T.DoubleType())),  # flattened d×d
    ]
)


@dataclass(frozen=True)
class PCAModel:
    mean: np.ndarray          # (d,)
    components: np.ndarray    # (d, k), orthonormal columns
    explained_variance: np.ndarray        # (k,) eigenvalues, descending
    explained_variance_ratio: np.ndarray  # (k,)


def pca_fit(df: DataFrame, vec_col: str, k: int) -> PCAModel:
    """Fit PCA on ``df[vec_col]`` (array<float/double>) via the
    one-pass partial-moment sweep described in the module docstring."""

    def _partials(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n, s, m = 0, None, None
        for pdf in batches:
            vecs = [v for v in pdf[vec_col] if v is not None]
            if not vecs:
                continue
            x = np.asarray(np.stack(vecs), dtype=np.float64)
            n += x.shape[0]
            s = x.sum(axis=0) if s is None else s + x.sum(axis=0)
            m = x.T @ x if m is None else m + x.T @ x
        if n:
            yield pd.DataFrame(
                {"n": [n], "s": [list(s)], "m": [list(m.ravel())]}
            )

    parts = (
        df.select(F.col(vec_col).alias(vec_col))
        .mapInPandas(_partials, _PARTIAL_SCHEMA)
        .collect()
    )
    if not parts:
        raise ValueError("pca_fit: empty input")
    n = sum(p.n for p in parts)
    s = np.sum([np.asarray(p.s) for p in parts], axis=0)
    d = s.shape[0]
    m = np.sum([np.asarray(p.m).reshape(d, d) for p in parts], axis=0)
    mean = s / n
    cov = (m - n * np.outer(mean, mean)) / max(1, n - 1)
    evals, evecs = np.linalg.eigh(cov)  # ascending
    order = np.argsort(evals)[::-1][:k]
    comps = evecs[:, order]
    evals = np.maximum(evals[order], 0.0)
    # canonical sign: the largest-|coordinate| of each component is > 0
    flip = np.sign(comps[np.abs(comps).argmax(axis=0), np.arange(comps.shape[1])])
    flip[flip == 0] = 1.0
    comps = comps * flip
    total_var = max(np.trace(cov), 1e-300)
    return PCAModel(mean, comps, evals, evals / total_var)


def pca_project(
    df: DataFrame,
    model: PCAModel,
    vec_col: str,
    *,
    out_col: str = "pca",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Project vectors onto the fitted components: out = (x − μ)·W.
    Broadcast model, one matmul per Arrow batch, zero shuffle."""
    mean, comps = model.mean, model.components
    out_fields = [
        f for f in df.schema.fields if f.name in keep_cols
    ] + [T.StructField(out_col, T.ArrayType(T.FloatType()))]
    out_schema = T.StructType(out_fields)
    cols = list(keep_cols) + [vec_col]

    def _proj(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            x = np.asarray(np.stack(pdf[vec_col].to_list()), dtype=np.float64)
            p = (x - mean) @ comps
            out = {c: pdf[c] for c in keep_cols}
            out[out_col] = [row.astype(np.float32).tolist() for row in p]
            yield pd.DataFrame(out)

    return df.select(*cols).mapInPandas(_proj, out_schema)
