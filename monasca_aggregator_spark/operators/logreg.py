"""Distributed logistic regression trained with aggregate-only passes.

The fastText-style quality/language classifier of a curation pipeline,
built Spark-first: each gradient-descent iteration is ONE aggregate
pass over the corpus — every partition partial-sums its per-row
gradient contributions, the exchange carries d+1 numbers per
partition (corpus-size-independent), and only the (d+1)-vector ever
reaches the driver. The next iteration's sigmoid scores inline the
updated weights as literals, so scoring stays inside whole-stage
codegen (exp/log are JVM intrinsics — no UDF anywhere).

Exact-integer determinism: per-row gradient components quantize to e9
fixed point BEFORE summing, so the cross-partition sum is an exact
BIGINT total independent of partition order, and the weight trajectory
is bit-for-bit reproducible — tests/test_logreg.py pins it against a
local numpy reference applying the identical quantization. (Magnitude
audit: |contribution| ≤ max|feature|, so 1e9-scaled longs stay far from
BIGINT range for any realistic partition row count.)

At 100 TB, n_iter full passes are the cost driver — like the k-means
trainer (operators/similarity.train_ivf_centroids) you fit on a
deterministic hash-sample via ``sample_fraction`` and only the final
scoring pass touches the full corpus.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_E9 = 1_000_000_000.0


@dataclass(frozen=True)
class LogRegModel:
    feature_cols: tuple[str, ...]
    bias: float
    weights: tuple[float, ...]

    def margin(self) -> Column:
        z = F.lit(self.bias)
        for w, c in zip(self.weights, self.feature_cols):
            z = z + F.lit(w) * F.col(c)
        return z

    def score(self) -> Column:
        """P(label=1 | x) — codegen sigmoid over the literal weights."""
        return F.lit(1.0) / (F.lit(1.0) + F.exp(-self.margin()))


def logreg_fit(
    df: DataFrame,
    feature_cols: list[str],
    label_col: str,
    *,
    n_iter: int = 15,
    lr: float = 1.0,
    sample_fraction: float | None = None,
    id_col: str | None = None,
) -> LogRegModel:
    """Batch gradient descent from zero weights.

    Update: w ← w − lr · Σ_rows (σ(z) − y)·x / n  (bias likewise with
    x ≡ 1). The Σ is an exact integer sum of e9-quantized per-row
    contributions; n comes free from the same aggregate. With
    ``sample_fraction`` (requires ``id_col``) training runs on a
    deterministic xxhash64 row sample — rerun-stable, partition-
    independent — and corpus cost drops to one scoring pass."""
    feats = list(feature_cols)
    train = df.select(
        *[F.col(c).cast("double").alias(c) for c in feats],
        F.col(label_col).cast("double").alias("__y"),
        *([F.col(id_col)] if id_col else []),
    )
    if sample_fraction is not None:
        if id_col is None:
            raise ValueError("sample_fraction requires id_col")
        mod = 1_000_000
        train = train.filter(
            F.pmod(F.xxhash64(F.col(id_col)), F.lit(mod))
            < F.lit(int(mod * sample_fraction))
        )
    train = train.cache()

    bias = 0.0
    weights = [0.0] * len(feats)
    try:
        for _ in range(n_iter):
            model = LogRegModel(tuple(feats), bias, tuple(weights))
            resid = model.score() - F.col("__y")
            sums = train.agg(
                F.count(F.lit(1)).alias("n"),
                F.sum(
                    F.floor(resid * F.lit(_E9) + F.lit(0.5)).cast("long")
                ).alias("g0"),
                *[
                    F.sum(
                        F.floor(
                            resid * F.col(c) * F.lit(_E9) + F.lit(0.5)
                        ).cast("long")
                    ).alias(f"g{i + 1}")
                    for i, c in enumerate(feats)
                ],
            ).collect()[0]
            n = float(sums["n"])
            bias = bias - lr * (sums["g0"] / _E9) / n
            weights = [
                w - lr * (sums[f"g{i + 1}"] / _E9) / n
                for i, w in enumerate(weights)
            ]
    finally:
        train.unpersist()
    return LogRegModel(tuple(feats), bias, tuple(weights))


def logreg_fit_local(
    rows: list[tuple],
    n_features: int,
    *,
    n_iter: int = 15,
    lr: float = 1.0,
) -> tuple[float, list[float]]:
    """Driver-side reference implementation with the IDENTICAL e9
    quantization — the test oracle for logreg_fit (rows = (features…,
    y)). Kept here so the quantization constant can't drift between
    implementation and oracle."""
    import math

    bias, weights = 0.0, [0.0] * n_features
    n = len(rows)
    for _ in range(n_iter):
        g = [0] * (n_features + 1)
        for row in rows:
            z = bias + sum(w * x for w, x in zip(weights, row))
            resid = 1.0 / (1.0 + math.exp(-z)) - row[n_features]
            g[0] += int(math.floor(resid * _E9 + 0.5))
            for i in range(n_features):
                g[i + 1] += int(
                    math.floor(resid * row[i] * _E9 + 0.5)
                )
        bias -= lr * (g[0] / _E9) / n
        weights = [
            w - lr * (g[i + 1] / _E9) / n for i, w in enumerate(weights)
        ]
    return bias, weights
