"""Metric-series statistics (plans/series.py): semantics vs numpy on
sf0.001 plus plan-shape guards (broadcast threshold join, partial
aggregation)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from monasca_aggregator_spark.plans import series
from monasca_aggregator_spark.sources.tables import load_table
from tests.conftest import SF_SMALL, explain_str


def _window_ms(ts):
    ms = ts.astype("datetime64[ms]").astype("int64")
    return ms // 3600000 * 3600000


@pytest.fixture(scope="module")
def events_pdf(spark):
    return (
        load_table(spark, SF_SMALL, "events")
        .select("event_type", "ts", "value")
        .toPandas()
    )


def test_stddev_matches_numpy(spark, events_pdf):
    out = series.q_agg_stddev(spark, SF_SMALL).toPandas()
    pdf = events_pdf.copy()
    pdf["e2"] = np.floor(pdf["value"] * 100 + 0.5).astype("int64")
    pdf["w"] = _window_ms(pdf["ts"])
    exp = (
        pdf.groupby(["event_type", "w"])["e2"]
        .agg(
            xn="count",
            xsd=lambda s: (s.astype(float) / 100).std(ddof=1),
        )
        .reset_index()
        .rename(columns={"w": "window_ts_ms"})
    )
    merged = out.merge(exp, on=["event_type", "window_ts_ms"], how="outer")
    assert merged["n"].notna().all() and merged["xn"].notna().all()
    assert (merged["n"] == merged["xn"]).all()
    multi = merged[merged["n"] > 1]
    assert np.allclose(multi["stddev_value"], multi["xsd"], rtol=1e-9)
    # single-observation windows have undefined sample stddev
    single = merged[merged["n"] == 1]
    assert single["stddev_value"].isna().all()


def test_winsorize_thresholds_and_clamping(spark, events_pdf):
    out = series.q_metric_winsorize(spark, SF_SMALL).toPandas()
    pdf = events_pdf.copy()
    pdf["e2"] = np.floor(pdf["value"] * 100 + 0.5).astype("int64")
    for et, sub in pdf.groupby("event_type"):
        vals = np.sort(sub["e2"].to_numpy())
        n = len(vals)
        lo = vals[math.ceil(0.05 * n) - 1]
        hi = vals[math.ceil(0.95 * n) - 1]
        clamped = np.clip(sub["e2"], lo, hi)
        got = out[out["event_type"] == et]
        # total clamp counts match the exact discrete order statistics
        assert got["n_clamped_lo"].sum() == int((sub["e2"] < lo).sum())
        assert got["n_clamped_hi"].sum() == int((sub["e2"] > hi).sum())
        # corpus-wide winsorized mean matches numpy's
        w_avg = (got["avg_winsorized"] * got["n"]).sum() / got["n"].sum()
        assert abs(w_avg - clamped.mean() / 100.0) < 1e-9


def test_winsorize_broadcasts_thresholds(spark):
    plan = explain_str(series.q_metric_winsorize(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan  # bounds join-back never shuffles events
    assert "HashAggregate" in plan


def test_correlation_bounds_and_pairs(spark, events_pdf):
    out = series.q_metric_correlation(spark, SF_SMALL).toPandas()
    types = sorted(events_pdf["event_type"].unique())
    n_pairs = len(types) * (len(types) - 1) // 2
    assert len(out) == n_pairs
    assert (out["metric_a"] < out["metric_b"]).all()
    ok = out["corr"].dropna()
    assert ((ok >= -1.0000001) & (ok <= 1.0000001)).all()
    # self-correlation sanity: correlate a series with itself via the
    # same rounded hourly means → exactly 1
    pdf = events_pdf.copy()
    pdf["w"] = _window_ms(pdf["ts"])
    hourly = pdf.groupby(["event_type", "w"])["value"].mean()
    hourly = np.floor(hourly * 10000 + 0.5) / 10000
    a = hourly.xs(types[0], level=0)
    b = hourly.xs(types[1], level=0)
    j = np.corrcoef(*a.to_frame("a").join(b.to_frame("b"), how="inner").T.values)
    got = out[(out["metric_a"] == types[0]) & (out["metric_b"] == types[1])][
        "corr"
    ].iloc[0]
    assert abs(got - j[0, 1]) < 1e-3


def test_m4_envelope_contains_series(spark, events_pdf):
    out = series.q_metric_downsample_m4(spark, SF_SMALL).toPandas()
    pdf = events_pdf.copy()
    pdf["b"] = (
        pdf["ts"].astype("datetime64[ms]").astype("int64")
        // series._M4_BUCKET_MS
        * series._M4_BUCKET_MS
    )
    g = pdf.groupby(["event_type", "b"])["value"]
    exp = g.agg(["count", "min", "max"]).reset_index()
    merged = out.merge(
        exp,
        left_on=["event_type", "bucket_ts_ms"],
        right_on=["event_type", "b"],
        how="outer",
    )
    assert merged["n"].notna().all() and merged["count"].notna().all()
    assert (merged["n"] == merged["count"]).all()
    assert (merged["v_min"] == merged["min"]).all()
    assert (merged["v_max"] == merged["max"]).all()
    # first/last are real series points inside the envelope
    assert ((out["v_first"] >= out["v_min"]) & (out["v_first"] <= out["v_max"])).all()
    assert ((out["v_last"] >= out["v_min"]) & (out["v_last"] <= out["v_max"])).all()
    # and match the time-ordered endpoints
    srt = pdf.sort_values("ts").groupby(["event_type", "b"])["value"]
    firsts = srt.first().reset_index().rename(columns={"value": "xf"})
    merged2 = out.merge(
        firsts, left_on=["event_type", "bucket_ts_ms"], right_on=["event_type", "b"]
    )
    assert (merged2["v_first"] == merged2["xf"]).all()


def test_alert_hysteresis_state_machine(spark, monkeypatch):
    """Hand-built series: needs 2 consecutive windows over HI to fire,
    stays fired through the deadband, clears at/below LO."""
    import monasca_aggregator_spark.plans.series as S

    rows = []
    #                 signal:  50  160  170  120  110  90  160  170
    # (HI=150, LO=100) state:  off  off  ON   ON   ON  off  off  ON
    for i, v in enumerate([50, 160, 170, 120, 110, 90, 160, 170]):
        rows.append((i, "m", float(v)))
    import datetime

    base = datetime.datetime(2024, 1, 1)
    df = spark.createDataFrame(
        [
            (base + datetime.timedelta(hours=i), et, v)
            for i, et, v in rows
        ],
        "ts timestamp, event_type string, value double",
    )
    monkeypatch.setattr(
        S, "load_table", lambda spark, sf, name, **kw: df
    )
    out = [
        r.alert_active
        for r in sorted(
            S.q_metric_alert_hysteresis(spark, "x").collect(),
            key=lambda r: r.window_ts_ms,
        )
    ]
    assert out == [False, False, True, True, True, False, False, True]


def test_batch_ewma_reproduces_streaming_fold(spark, sf_small, tmp_path):
    """The batch EWMA backfill must reproduce the live streaming
    operator EXACTLY: replay the same events through streaming_ewma in
    two time-ordered micro-batches and compare every (series, ts)
    smoothed value bit-for-bit — the batch ≡ streaming bridge for an
    order-dependent fold."""
    import time as _time

    from pyspark.sql import functions as F

    from monasca_aggregator_spark.plans.series import q_metric_ewma
    from monasca_aggregator_spark.sources.tables import load_table
    from monasca_aggregator_spark.streaming.pipeline import streaming_ewma

    batch = {
        (r.event_type, r.user_id, r.ts_ms): r.ewma
        for r in q_metric_ewma(spark, sf_small).collect()
    }

    ev = load_table(spark, sf_small, "events").select(
        "event_type",
        F.col("user_id").cast("string").alias("user_id"),
        "ts",
        "value",
    )
    mid = ev.agg(F.expr("percentile(unix_millis(ts), 0.5)")).collect()[0][0]
    src = tmp_path / "ewma_src"
    src.mkdir()
    for i, part in enumerate(
        [
            ev.filter(F.unix_millis("ts") <= mid),
            ev.filter(F.unix_millis("ts") > mid),
        ]
    ):
        part.coalesce(1).write.mode("append").parquet(str(src))
        _time.sleep(1.1)

    raw = (
        spark.readStream.schema(spark.read.parquet(str(src)).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src))
    )
    out = streaming_ewma(
        raw, alpha=0.2, key_cols=("event_type", "user_id"),
        ts_col="ts", value_col="value",
    )
    q = (
        out.writeStream.format("memory")
        .queryName("ewma_bridge_out")
        .outputMode("update")
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ewma_ckpt"))
        .start()
    )
    q.awaitTermination()

    streamed = {
        (r.event_type, int(r.user_id), r.ts_ms): r.ewma
        for r in spark.table("ewma_bridge_out").collect()
    }
    assert streamed.keys() == batch.keys()
    assert all(streamed[k] == batch[k] for k in batch)
