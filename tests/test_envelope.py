"""Envelope wire-format parsing
(reference: models/metric_envelope.go, server.go:300-304)."""

from __future__ import annotations

import json

from monasca_aggregator_spark.sources.envelope import (
    ENVELOPE_COLUMNS,
    parse_envelopes,
)


def _raw(spark, payloads):
    return spark.createDataFrame([(p,) for p in payloads], "value string")


def _envelope(name="cpu", ts_ms=1_700_000_000_000.0, value=1.5, **kw):
    e = {
        "metric": {
            "name": name,
            "dimensions": {"host": "h1"},
            "timestamp": ts_ms,
            "value": value,
            "value_meta": {"unit": "pct"},
        },
        "meta": {"tenantId": "tenant-a", "region": "r1"},
        "creation_time": 1_700_000_000,
    }
    e.update(kw)
    return json.dumps(e)


def test_parse_well_formed(spark):
    df = parse_envelopes(_raw(spark, [_envelope()]))
    assert df.columns == list(ENVELOPE_COLUMNS)
    r = df.collect()[0]
    assert r.name == "cpu"
    assert r.dimensions == {"host": "h1"}
    assert r.value == 1.5
    assert r.tenant_id == "tenant-a"
    # float ms → timestamp, ms precision preserved
    assert int(r.timestamp.timestamp() * 1000) == 1_700_000_000_000


def test_invalid_json_dropped(spark):
    # reference drops messages that fail to unmarshal (server.go:300-304)
    df = parse_envelopes(
        _raw(spark, ["{not json", '{"meta": {}}', _envelope(name="ok")])
    )
    rows = df.collect()
    assert [r.name for r in rows] == ["ok"]


def test_missing_tenant_is_null(spark):
    payload = json.loads(_envelope())
    del payload["meta"]["tenantId"]
    df = parse_envelopes(_raw(spark, [json.dumps(payload)]))
    assert df.collect()[0].tenant_id is None
