"""GIF (LZW) and IMA-ADPCM codec tests: pure-codec roundtrips, the
malformed-input ValueError contract, and the Spark Arrow paths where
both compressed formats flow through the SAME feature extractors as
their lossless twins."""

from __future__ import annotations

import random

import numpy as np
import pytest

from monasca_aggregator_spark.operators.adpcm import (
    decode_ima_adpcm_wav,
    encode_ima_adpcm_wav,
)
from monasca_aggregator_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    encode_gif,
)


def _pal_image(shape=(40, 56), ncol=7, seed=0):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
    return pal[rng.integers(0, ncol, shape)]


def test_gif_lzw_roundtrip_through_width_growth_and_table_overflow():
    rng = np.random.default_rng(0)
    cases = [
        (2400, 4, 2),  # several width bumps
        (60000, 250, 8),  # wide alphabet
        (4096 * 40, 200, 8),  # forces table-full CLEAR resets
        (500, 2, 2),
        (1, 1, 2),
    ]
    for n, hi, mcs in cases:
        data = rng.integers(0, hi, n).astype(np.uint8).tobytes()
        assert _lzw_decode(mcs, _lzw_encode(mcs, data), n) == data


def test_gif_image_roundtrip_exact():
    for shape, ncol in [((40, 60), 5), ((128, 96), 250), ((1, 1), 1),
                        ((301, 17), 256)]:
        img = _pal_image(shape, ncol, seed=ncol)
        assert (decode_gif(encode_gif(img)) == img).all()
    # gradient: long LZW dictionary chains
    g = np.repeat(np.arange(200, dtype=np.uint8)[None, :], 150, axis=0)
    img = np.stack([g, g * 0 + 7, g // 2], axis=-1)
    assert (decode_gif(encode_gif(img)) == img).all()
    # 2-D gray input expands to 3 identical channels
    gray = (np.add.outer(np.arange(33), np.arange(77)) % 256).astype(
        np.uint8
    )
    d = decode_gif(encode_gif(gray))
    assert d.shape == (33, 77, 3) and (d[:, :, 0] == gray).all()


def test_gif_interlaced_stream_decodes():
    """Hand-build an interlaced variant by re-ordering rows per the
    4-pass GIF scheme and setting the interlace flag."""
    img = _pal_image((32, 16), 4, seed=3)
    base = bytearray(encode_gif(img))
    # image descriptor starts right after header+GCT: find 0x2C block
    idx = base.index(0x2C, 13)
    flags_at = idx + 9
    assert base[flags_at] == 0
    # rows in interlace file order: passes at strides 8/8/4/2
    order = np.concatenate(
        [np.arange(s, 32, t) for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
    )
    inter = img[order]
    re = bytearray(encode_gif(inter))
    ridx = re.index(0x2C, 13)
    re[ridx + 9] |= 0x40  # claim interlace; decoder must undo the order
    assert (decode_gif(bytes(re)) == img).all()


def test_gif_malformed_payloads_raise_valueerror_only():
    full = encode_gif(_pal_image())
    for cut in (3, 7, 12, len(full) // 3, len(full) - 2):
        with pytest.raises(ValueError):
            decode_gif(full[:cut])
    rng = random.Random(1)
    for _ in range(100):
        sick = bytearray(full)
        for _ in range(4):
            sick[rng.randrange(len(sick))] = rng.randrange(256)
        try:
            decode_gif(bytes(sick))
        except ValueError:
            pass  # only ValueError may escape
    # >256 distinct colors is rejected with a quantize hint
    many = np.zeros((20, 20, 3), dtype=np.uint8)
    many[..., 0] = np.arange(400).reshape(20, 20) % 256
    many[..., 1] = np.arange(400).reshape(20, 20) // 256
    with pytest.raises(ValueError, match="quantize"):
        encode_gif(many)


def test_adpcm_roundtrip_snr_and_compression():
    t = np.arange(44100) / 44100.0
    mono = 0.5 * np.sin(2 * np.pi * 440 * t) + 0.2 * np.sin(
        2 * np.pi * 1234 * t
    )
    stereo = np.empty(len(mono) * 2)
    stereo[0::2] = mono
    stereo[1::2] = 0.3 * np.sin(2 * np.pi * 220 * t)
    for x, nch in ((mono, 1), (stereo, 2)):
        enc = encode_ima_adpcm_wav(x, sample_rate=44100, n_channels=nch)
        rate, ch, dec = decode_ima_adpcm_wav(enc)
        assert (rate, ch) == (44100, nch) and len(dec) == len(x)
        snr = 20 * np.log10(
            np.sqrt(np.mean(x**2)) / np.sqrt(np.mean((dec - x) ** 2))
        )
        assert snr > 25, snr  # 4-bit IMA typically lands ~40 dB
        assert len(enc) < 0.30 * (len(x) * 2)  # ~4x vs 16-bit PCM


def test_adpcm_length_edges_and_corruption_contract():
    rng = np.random.default_rng(0)
    for n in (1, 7, 504, 505, 506, 1009):
        x = rng.uniform(-0.8, 0.8, n)
        _, _, dec = decode_ima_adpcm_wav(
            encode_ima_adpcm_wav(x, sample_rate=8000)
        )
        assert len(dec) == n
    full = encode_ima_adpcm_wav(
        rng.uniform(-0.5, 0.5, 2000), sample_rate=8000
    )
    for cut in (2, 10, 30, 45):
        with pytest.raises(ValueError):
            decode_ima_adpcm_wav(full[:cut])
    # stereo with an ODD interleaved count can't split into equal
    # channels — must be the module's ValueError contract, not an
    # IndexError from an empty final-block segment (ADVICE r4)
    with pytest.raises(ValueError, match="multiple of n_channels"):
        encode_ima_adpcm_wav(
            rng.uniform(-0.5, 0.5, 1011), sample_rate=8000, n_channels=2
        )


def test_gif_features_and_thumbnail_match_png_twin_through_spark(spark):
    """The SAME palettized image as PNG (lossless truth) and GIF flows
    through decode_image_features and media_thumbnails: identical
    dims, identical features (GIF is lossless for <=256-color images),
    thumbnail re-encoded as GIF with pixel-identical content."""
    from monasca_aggregator_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_image_features,
        decode_real,
        encode_png,
        media_thumbnails,
    )

    img = _pal_image((40, 56), 11, seed=5)
    rows = [
        (1, "image", bytearray(encode_png(img)), {}),
        (2, "image", bytearray(encode_gif(img)), {}),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = {
        r.media_id: r
        for r in decode_image_features(media, use_stub=False).collect()
    }
    assert (got[2].width, got[2].height, got[2].channels) == (
        got[1].width,
        got[1].height,
        got[1].channels,
    ) == (56, 40, 3)
    assert got[1].features == got[2].features  # both lossless
    thumbs = {
        r.media_id: r for r in media_thumbnails(media, side=8).collect()
    }
    assert thumbs[2].thumb_format == "gif"
    a = decode_real(bytes(thumbs[1].thumb_payload), "image")
    b = decode_real(bytes(thumbs[2].thumb_payload), "image")
    assert (a == b).all()


def test_adpcm_spectral_features_match_pcm_twin_through_spark(spark):
    """The SAME tone as PCM WAV and IMA-ADPCM WAV through the Arrow
    spectral path: identical sample_rate/duration, dominant bin within
    one FFT bin (ADPCM is lossy but 40 dB SNR keeps the peak put)."""
    import monasca_aggregator_spark.operators.multimodal as M

    t = np.arange(2000) / 8000.0
    x = 0.6 * np.sin(2 * np.pi * 500 * t)
    import io
    import wave as wavemod

    buf = io.BytesIO()
    with wavemod.open(buf, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(8000)
        f.writeframes((x * 32767).astype("<i2").tobytes())
    rows = [
        (1, "audio", bytearray(buf.getvalue())),
        (2, "audio", bytearray(encode_ima_adpcm_wav(x, sample_rate=8000))),
    ]
    media = spark.createDataFrame(
        rows, "media_id long, media_type string, payload binary"
    )
    out = {
        r.media_id: r for r in M.audio_spectral_features(media).collect()
    }
    assert out[1].sample_rate == out[2].sample_rate == 8000
    bin_hz = 8000 / 2000
    assert abs(out[1].dominant_hz - 500.0) <= bin_hz
    assert abs(out[2].dominant_hz - 500.0) <= bin_hz
    # ADPCM's quantization noise is broadband, which drags the
    # magnitude-weighted centroid upward — the peak and the energy
    # rolloff stay put, so those are the codec-invariants to pin
    assert abs(out[1].rolloff_hz - out[2].rolloff_hz) <= bin_hz


def test_gif_subrect_frames_extensions_and_stereo_adpcm_edges():
    """Spec corners: a frame smaller than the logical screen lands at
    its (left, top) offset on a palette[0] background; extension
    blocks before the image are skipped; stereo ADPCM roundtrips at
    non-block-multiple lengths."""
    img = np.zeros((10, 10, 3), np.uint8)
    img[:] = (1, 2, 3)
    base = bytearray(encode_gif(img))
    idx = base.index(0x2C, 13)
    base[6:8] = (12).to_bytes(2, "little")
    base[8:10] = (12).to_bytes(2, "little")
    base[idx + 1 : idx + 3] = (2).to_bytes(2, "little")  # left
    base[idx + 3 : idx + 5] = (1).to_bytes(2, "little")  # top
    out = decode_gif(bytes(base))
    assert out.shape == (12, 12, 3)
    assert (out[1:11, 2:12] == (1, 2, 3)).all()
    gce = bytes([0x21, 0xF9, 4, 0, 0, 0, 0, 0])
    with_ext = bytes(base[:idx]) + gce + bytes(base[idx:])
    assert (decode_gif(with_ext) == out).all()
    rng = np.random.default_rng(1)
    for n in (3, 505, 777):
        x = rng.uniform(-0.7, 0.7, n * 2)
        enc = encode_ima_adpcm_wav(x, sample_rate=8000, n_channels=2)
        _, c, dec = decode_ima_adpcm_wav(enc)
        assert c == 2 and len(dec) == len(x)
