"""Multimodal plumbing: binary payload columns, mapInPandas decode
(stubbed codec), metadata-driven resize/frame-sample. The Spark-side
contract — schemas, Arrow batching, partition preservation, null
handling — is the real surface under test; pixel/sample decode is a
deterministic fake (operators/multimodal._decode_stub)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators import multimodal as M
from monasca_aggregator_spark.sources.tables import load_table
from tests.conftest import explain_str


@pytest.fixture(scope="module")
def media(spark, sf_small):
    return M.documents_as_media(load_table(spark, sf_small, "documents"))


def test_media_relation_schema(media):
    assert media.schema == M.MEDIA_SCHEMA or [
        (f.name, f.dataType) for f in media.schema.fields
    ] == [(f.name, f.dataType) for f in M.MEDIA_SCHEMA.fields]
    row = media.first()
    assert isinstance(row.payload, (bytes, bytearray))
    assert set(row.meta) == {"width", "height"}


def test_decode_image_features_schema_and_determinism(spark, media):
    out = M.decode_image_features(media, n_features=16)
    assert out.schema == M.IMAGE_FEATURES_SCHEMA
    rows = {r.media_id: r for r in out.filter(F.col("media_id") < 5).collect()}
    assert len(rows) == 5
    for r in rows.values():
        assert len(r.features) == 16
        assert all(0.0 <= x <= 1.0 for x in r.features)
        assert r.width == r.media_id % 64 + 32
    # deterministic: same payload → same features on re-run
    again = {
        r.media_id: r.features
        for r in M.decode_image_features(media, n_features=16)
        .filter(F.col("media_id") < 5)
        .collect()
    }
    assert {k: list(v.features) for k, v in rows.items()} == {
        k: list(v) for k, v in again.items()
    }


def test_decode_plan_is_arrow_not_row_python(spark, media):
    plan = explain_str(M.decode_image_features(media))
    assert "MapInPandas" in plan
    assert "BatchEvalPython" not in plan  # no row-at-a-time Python


def test_decode_real_is_explicitly_stubbed():
    with pytest.raises(NotImplementedError):
        M.decode_real(b"\x00", "image")


def test_resize_updates_metadata_jvm_side(spark, media):
    out = M.resize_images(media, width=224, height=224)
    row = out.first()
    assert row.meta["width"] == "224" and row.meta["height"] == "224"
    # metadata update is column math — no Python eval nodes at all
    plan = explain_str(out)
    assert "EvalPython" not in plan and "MapInPandas" not in plan


def test_sample_frames_explodes_by_metadata(spark):
    vids = spark.createDataFrame(
        [
            (1, "video", b"vvvv", {"n_frames": "25"}),
            (2, "video", b"wwww", {"n_frames": "3"}),
            (3, "video", b"x", None),  # no metadata → dropped
            (4, "image", b"i", {"n_frames": "99"}),  # wrong type → dropped
        ],
        M.MEDIA_SCHEMA,
    )
    out = M.sample_frames(vids, every_n=10)
    got = {(r.media_id, r.frame_index) for r in out.collect()}
    assert got == {(1, 0), (1, 10), (1, 20), (2, 0)}
