"""Multimodal (image/audio/video) columns for the data pipeline.

Media travel as opaque ``binary`` payload columns plus typed metadata —
the only layout that scales: Spark shuffles/spills binary columns like
any other, nothing row-by-row touches the driver, and Arrow moves the
bytes to Python decode UDFs in vectorized batches.

    MEDIA_SCHEMA: media_id bigint, media_type string (image|audio|video),
                  payload binary, meta map<string,string>

Decode / feature-extraction run as ``mapInPandas`` generators: one
Arrow batch in → one pandas frame out, so peak memory is one batch per
task regardless of corpus size, and partition-level parallelism is
preserved (no shuffle is introduced — .explain shows scan → project →
ArrowEvalPython only).

The actual codecs (PIL/libsndfile/ffmpeg) are NOT in this environment.
Each operator routes through ``_decode_stub`` — a clearly-marked
deterministic fake deriving pixel/sample statistics from the payload
bytes — and ``decode_real`` raises NotImplementedError until a codec is
installed. The Spark-side contract (schemas, batching, UDF signatures,
null handling) is the real, tested surface.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("media_type", T.StringType(), False),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
        T.StructField("features", T.ArrayType(T.FloatType()), True),
    ]
)

FRAME_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("frame_index", T.IntegerType(), False),
        T.StructField("frame_payload", T.BinaryType(), True),
    ]
)


def decode_real(payload: bytes, media_type: str):
    """Real codec entry point — requires PIL / soundfile / ffmpeg."""
    raise NotImplementedError(
        "no media codecs in this environment; wire PIL/soundfile here "
        "and flip use_stub=False"
    )


def _decode_stub(payload: bytes, n_features: int) -> list[float]:
    """STUB decode: deterministic pseudo-features from the payload bytes
    (sha256 expansion). Stands in for 'decode + embed' so the Spark
    plumbing is exercised with realistic shapes."""
    if payload is None:
        return None
    out: list[float] = []
    counter = 0
    while len(out) < n_features:
        h = hashlib.sha256(payload + counter.to_bytes(4, "big")).digest()
        out.extend(b / 255.0 for b in h)
        counter += 1
    return out[:n_features]


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapt the documents table into the media relation (payload =
    utf-8 bytes) so multimodal plumbing runs against driver testdata."""
    return docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("image").alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.create_map(
            F.lit("width"),
            (F.pmod(F.col("doc_id"), F.lit(64)) + 32).cast("string"),
            F.lit("height"),
            (F.pmod(F.col("doc_id"), F.lit(48)) + 32).cast("string"),
        ).alias("meta"),
    )


def decode_image_features(
    media: DataFrame, *, n_features: int = 16, use_stub: bool = True
) -> DataFrame:
    """payload → (width, height, channels, feature vector).

    mapInPandas: dimensions come from typed metadata; the pixel decode
    is stubbed (see module docstring). Arrow batch size is governed by
    spark.sql.execution.arrow.maxRecordsPerBatch — tune it down for
    multi-MB payloads so a batch fits executor memory.
    """

    def _decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [
                _decode_stub(p, n_features)
                if use_stub
                else decode_real(p, "image")
                for p in pdf["payload"]
            ]
            metas = pdf["meta"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": [
                        int(m.get("width", 0)) if m is not None else None
                        for m in metas
                    ],
                    "height": [
                        int(m.get("height", 0)) if m is not None else None
                        for m in metas
                    ],
                    "channels": [3] * len(pdf),
                    "features": feats,
                }
            )

    return media.filter(F.col("media_type") == "image").mapInPandas(
        _decode, IMAGE_FEATURES_SCHEMA
    )


def resize_images(media: DataFrame, *, width: int, height: int) -> DataFrame:
    """Resize = payload transform + metadata update.

    The pixel resample is stubbed as identity on bytes; the metadata
    (the part queries filter on) is updated for real, JVM-side.
    """
    new_meta = F.map_concat(
        F.map_filter(
            F.coalesce(F.col("meta"), F.create_map()),
            lambda k, _: ~k.isin("width", "height"),
        ),
        F.create_map(
            F.lit("width"),
            F.lit(str(width)),
            F.lit("height"),
            F.lit(str(height)),
        ),
    )
    return media.withColumn("meta", new_meta)


def sample_frames(media: DataFrame, *, every_n: int = 10) -> DataFrame:
    """video payload → one row per sampled frame index.

    Frame COUNT comes from typed metadata (n_frames); the per-frame
    payload slice is stubbed as the whole payload. The explode stays
    JVM-side — only real decode would need mapInPandas.
    """
    n_frames = F.coalesce(
        F.element_at(F.col("meta"), "n_frames").cast("int"), F.lit(0)
    )
    idx = F.sequence(
        F.lit(0), F.greatest(n_frames - 1, F.lit(0)), F.lit(every_n)
    )
    return (
        media.filter(F.col("media_type") == "video")
        .filter(n_frames > 0)
        .select(
            "media_id",
            F.explode(idx).alias("frame_index"),
            F.col("payload").alias("frame_payload"),
        )
    )
