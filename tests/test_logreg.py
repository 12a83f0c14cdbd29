"""Distributed logistic regression — exact-trajectory and quality
pins. The e9-quantized gradient sums make the distributed fit
bit-for-bit reproducible, so the local reference must match EXACTLY,
not approximately — any drift in fold order or quantization breaks it.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.logreg import (
    logreg_fit,
    logreg_fit_local,
)


FEATS = ["stop_ratio", "punct_ratio", "len_score"]


def _features(spark, sf_small):
    """Distillation setup: label = top-half composite quality."""
    from monasca_aggregator_spark.operators.textops import quality_scores
    from monasca_aggregator_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents")
    q = quality_scores(docs)
    median = q.agg(F.expr("percentile(quality, 0.5)").alias("m")).collect()[
        0
    ].m
    return q.select(
        "doc_id",
        "stop_ratio",
        "punct_ratio",
        F.least(F.col("n_tokens") / F.lit(100.0), F.lit(1.0)).alias(
            "len_score"
        ),
        (F.col("quality") >= F.lit(median)).cast("double").alias("label"),
    )


def test_distributed_fit_matches_local_reference_exactly(spark, sf_small):
    feats = _features(spark, sf_small)
    model = logreg_fit(feats, FEATS, "label", n_iter=10, lr=1.0)

    rows = [
        tuple(getattr(r, c) for c in FEATS) + (r.label,)
        for r in feats.collect()
    ]
    bias, weights = logreg_fit_local(rows, len(FEATS), n_iter=10, lr=1.0)
    assert model.bias == bias
    assert list(model.weights) == weights


def test_fit_is_partitioning_invariant(spark, sf_small):
    feats = _features(spark, sf_small)
    m1 = logreg_fit(feats, FEATS, "label", n_iter=5)
    m32 = logreg_fit(feats.repartition(32), FEATS, "label", n_iter=5)
    assert m1 == m32


def test_classifier_beats_majority_class(spark, sf_small):
    feats = _features(spark, sf_small)
    model = logreg_fit(feats, FEATS, "label", n_iter=30, lr=4.0)
    scored = feats.select(
        "label", (model.score() >= 0.5).cast("double").alias("pred")
    )
    agg = scored.agg(
        F.avg((F.col("pred") == F.col("label")).cast("double")).alias("acc"),
        F.avg("label").alias("base"),
    ).collect()[0]
    majority = max(agg.base, 1.0 - agg.base)
    assert agg.acc > majority


def test_sampled_fit_requires_id_and_stays_deterministic(spark, sf_small):
    import pytest

    feats = _features(spark, sf_small)
    with pytest.raises(ValueError):
        logreg_fit(feats, FEATS, "label", sample_fraction=0.5)
    a = logreg_fit(
        feats, FEATS, "label", n_iter=3, sample_fraction=0.5,
        id_col="doc_id",
    )
    b = logreg_fit(
        feats.repartition(16), FEATS, "label", n_iter=3,
        sample_fraction=0.5, id_col="doc_id",
    )
    assert a == b
