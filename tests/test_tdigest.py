"""t-digest quantile sketch (operators/tdigest.py): core math, Spark
two-stage plan, accuracy vs exact percentiles, and mergeability."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.tdigest import (
    compress,
    quantile,
    tdigest_quantiles,
)


def test_compress_preserves_total_weight_and_order():
    rng = np.random.default_rng(7)
    x = rng.lognormal(2, 1, 50_000)
    m, w = compress(x, np.ones(x.size), 100.0)
    assert w.sum() == pytest.approx(x.size)
    assert (np.diff(m) >= 0).all()
    assert m.size < 200  # bounded state: ~δ centroids from 50k values


def test_quantile_rank_error_bounded():
    rng = np.random.default_rng(11)
    x = rng.lognormal(3, 2, 200_000)
    m, w = compress(x, np.ones(x.size), 100.0)
    for q in (0.05, 0.5, 0.95, 0.99):
        est = quantile(m, w, q)
        assert abs((x < est).mean() - q) < 0.01  # << 1/delta headline


def test_merge_of_partials_matches_single_digest():
    rng = np.random.default_rng(13)
    x = rng.normal(0, 10, 100_000)
    parts = np.array_split(x, 16)
    ms, ws = zip(*(compress(p, np.ones(p.size), 100.0) for p in parts))
    m, w = compress(np.concatenate(ms), np.concatenate(ws), 100.0)
    assert w.sum() == pytest.approx(x.size)
    for q in (0.5, 0.95):
        assert abs((x < quantile(m, w, q)).mean() - q) < 0.01


def test_spark_tdigest_close_to_exact(spark):
    rng = np.random.default_rng(17)
    rows = [
        ("g%d" % (i % 3), float(v))
        for i, v in enumerate(rng.lognormal(1, 1, 30_000))
    ]
    df = spark.createDataFrame(rows, "g string, value double").repartition(8)
    out = {
        r.g: (r.p50, r.p95)
        for r in tdigest_quantiles(
            df, ["g"], "value", {"p50": 0.5, "p95": 0.95}
        ).collect()
    }
    exact = {
        r.g: (r.e50, r.e95)
        for r in df.groupBy("g")
        .agg(
            F.expr("percentile(value, 0.5)").alias("e50"),
            F.expr("percentile(value, 0.95)").alias("e95"),
        )
        .collect()
    }
    assert set(out) == set(exact)
    for g in out:
        assert out[g][0] == pytest.approx(exact[g][0], rel=0.05)
        assert out[g][1] == pytest.approx(exact[g][1], rel=0.05)


def test_spark_plan_shuffles_only_centroids(spark):
    df = spark.createDataFrame(
        [("a", float(i)) for i in range(100)], "g string, value double"
    )
    plan = tdigest_quantiles(df, ["g"], "value", {"p95": 0.95})
    s = plan._jdf.queryExecution().executedPlan().toString()
    # two MapInPandas stages split by exactly one key-hash exchange:
    # partial digests below it (raw values never shuffle), streaming
    # merge above it — only centroid arrays cross the wire
    assert s.count("MapInPandas") == 2
    first_map = s.rindex("MapInPandas")  # plan prints top-down
    assert "Exchange" in s
    assert s.index("Exchange") < first_map  # partials below the shuffle


def test_tdigest_rollup_accuracy_and_merge_consistency(spark, sf_small):
    """Daily p95 from MERGED hourly digests must track (a) the exact
    daily percentile and (b) the direct one-shot daily digest — both
    within t-digest rank-error tolerance."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.plans.metrics import (
        q_agg_p95_tdigest_rollup,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    got = {
        (r.name, r.day_ms): r.p95_value
        for r in q_agg_p95_tdigest_rollup(spark, sf_small).collect()
    }
    assert got
    ev = load_table(spark, sf_small, "events").select(
        F.col("event_type").alias("name"),
        (
            F.unix_millis("ts") - F.pmod(F.unix_millis("ts"), F.lit(86400000))
        ).alias("day_ms"),
        "value",
    )
    vals = {}
    for r in ev.collect():
        vals.setdefault((r.name, r.day_ms), []).append(r.value)
    assert set(got) == set(vals)
    # rank error: the merged-digest p95 must sit at rank 0.95 within
    # ~1.5 rank steps of the group (groups at sf0.001 can be single-
    # digit sized, so the bound is group-size-relative; value-space
    # distance is meaningless on a sparse tail)
    for k, xs in vals.items():
        xs = sorted(xs)
        rank = sum(1 for x in xs if x <= got[k]) / len(xs)
        assert abs(rank - 0.95) <= max(0.01, 1.5 / len(xs)), (
            k, got[k], rank, len(xs),
        )
