"""LTTB downsampling: Spark path ≡ shared reference, and the shape
properties that make it the perceptual downsampler (endpoints kept,
one point per bucket, peaks survive)."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from monasca_aggregator_spark.plans.series_ext import (
    lttb_indices,
    q_metric_downsample_lttb,
)


def test_endpoints_and_count():
    x = np.arange(1000.0)
    y = np.sin(x / 20)
    idx = lttb_indices(x, y, 100)
    assert len(idx) == 100
    assert idx[0] == 0 and idx[-1] == 999
    assert (np.diff(idx) > 0).all()  # strictly increasing


def test_peak_survives_downsampling():
    # a single sharp spike in flat data must be among the selected
    # points — the property minmax-less strided sampling lacks
    x = np.arange(2000.0)
    y = np.zeros(2000)
    y[777] = 100.0
    idx = lttb_indices(x, y, 50)
    assert 777 in idx


def test_small_series_passthrough():
    x = np.arange(20.0)
    y = x * 2
    assert list(lttb_indices(x, y, 100)) == list(range(20))


def test_spark_path_equals_reference(spark, sf_small):
    from monasca_aggregator_spark.sources.tables import load_table

    got = (
        q_metric_downsample_lttb(spark, sf_small)
        .orderBy("event_type", "window_ts_ms")
        .collect()
    )
    ev = (
        load_table(spark, sf_small, "events")
        .select(
            "event_type",
            ((F.unix_millis("ts") / 3600000).cast("long") * 3600000
             ).alias("w"),
            F.floor(F.col("value") * 100 + F.lit(0.5))
            .cast("long")
            .alias("e2"),
        )
        .groupBy("event_type", "w")
        .agg((F.sum("e2").cast("double") / F.lit(100.0)).alias("v"))
        .collect()
    )
    series: dict[str, list] = {}
    for r in ev:
        series.setdefault(r["event_type"], []).append((r["w"], r["v"]))
    want = []
    for et in sorted(series):
        pts = sorted(series[et])
        x = np.array([p[0] for p in pts], dtype=float)
        y = np.array([p[1] for p in pts], dtype=float)
        for i in lttb_indices(x, y, 100):
            want.append((et, pts[i][0], pts[i][1]))
    assert [(r["event_type"], r["window_ts_ms"], r["v"]) for r in got] == want
