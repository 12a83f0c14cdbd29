"""IMA/DVI ADPCM WAV codec (format tag 0x11) — stdlib+numpy only.

The pipeline's REAL compressed-audio codec: 4 bits per sample against
PCM's 16, decoded with the public IMA ADPCM algorithm (IMA Digital
Audio Focus and Technical Working Groups, 1992; the same tables every
implementation ships). stdlib ``wave`` refuses non-PCM streams, so
this module parses the RIFF chunks itself: ``fmt `` (tag 0x11), the
optional ``fact`` sample count, and ``data`` as a sequence of
independent blocks — each block carries a (predictor, step-index)
header per channel, making blocks independently decodable (the
property that lets a 100 TB audio corpus split mid-file at block
boundaries).

Encoder included so roundtrip tests exercise the real quantizer:
IMA ADPCM is lossy; the test contract is bounded reconstruction error
(quantization SNR), not bit equality.

Malformed payloads raise ValueError (the shared multimodal decode
contract: corrupt rows null out, tasks never fail).

Reference parity: no media path exists in the reference (SURVEY §2
row 35 is a scope extension); semantics follow the public IMA spec.
"""

from __future__ import annotations

import numpy as np

_STEP_TABLE = np.array(
    [
        7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31,
        34, 37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130,
        143, 157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408,
        449, 494, 544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282,
        1411, 1552, 1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327,
        3660, 4026, 4428, 4871, 5358, 5894, 6484, 7132, 7845, 8630,
        9493, 10442, 11487, 12635, 13899, 15289, 16818, 18500, 20350,
        22385, 24623, 27086, 29794, 32767,
    ],
    dtype=np.int64,
)
_INDEX_TABLE = np.array(
    [-1, -1, -1, -1, 2, 4, 6, 8, -1, -1, -1, -1, 2, 4, 6, 8],
    dtype=np.int64,
)


def _decode_nibbles(
    nibbles: np.ndarray, predictor: int, index: int
) -> np.ndarray:
    """Sequential IMA recurrence over one channel's nibble stream."""
    out = np.empty(len(nibbles), dtype=np.int64)
    pred = int(predictor)
    idx = int(index)
    step_t = _STEP_TABLE
    idx_t = _INDEX_TABLE
    for i, nib in enumerate(nibbles):
        step = int(step_t[idx])
        diff = step >> 3
        if nib & 1:
            diff += step >> 2
        if nib & 2:
            diff += step >> 1
        if nib & 4:
            diff += step
        if nib & 8:
            pred -= diff
        else:
            pred += diff
        pred = max(-32768, min(32767, pred))
        idx = max(0, min(88, idx + int(idx_t[nib])))
        out[i] = pred
    return out


def _riff_chunks(payload: bytes) -> dict[bytes, bytes]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    chunks: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(payload):
        cid = payload[pos : pos + 4]
        ln = int.from_bytes(payload[pos + 4 : pos + 8], "little")
        body = payload[pos + 8 : pos + 8 + ln]
        if len(body) != ln:
            raise ValueError(f"truncated {cid!r} chunk")
        chunks.setdefault(cid, body)
        pos += 8 + ln + (ln & 1)  # chunks are word-aligned
    return chunks


def decode_ima_adpcm_wav(payload: bytes) -> tuple[int, int, np.ndarray]:
    """IMA-ADPCM WAV → (sample_rate, n_channels, float64 samples in
    [-1, 1], channels interleaved) — the same contract as
    ``multimodal.wav_samples`` so downstream features are
    codec-agnostic."""
    chunks = _riff_chunks(payload)
    fmt = chunks.get(b"fmt ")
    data = chunks.get(b"data")
    if fmt is None or data is None:
        raise ValueError("missing fmt/data chunk")
    tag = int.from_bytes(fmt[0:2], "little")
    if tag != 0x11:
        raise ValueError(f"not IMA ADPCM (format tag 0x{tag:x})")
    nch = int.from_bytes(fmt[2:4], "little")
    rate = int.from_bytes(fmt[4:8], "little")
    block_align = int.from_bytes(fmt[12:14], "little")
    bits = int.from_bytes(fmt[14:16], "little")
    if bits != 4:
        raise ValueError(f"unsupported ADPCM bit depth {bits}")
    if nch not in (1, 2):
        raise ValueError(f"unsupported channel count {nch}")
    if block_align < 4 * nch or block_align % (4 * nch):
        raise ValueError(f"bad block_align {block_align} for {nch}ch")
    spb = (block_align - 4 * nch) * 2 // nch + 1  # samples/block/chan
    total = None
    if b"fact" in chunks and len(chunks[b"fact"]) >= 4:
        total = int.from_bytes(chunks[b"fact"][:4], "little")
    per_chan: list[list[np.ndarray]] = [[] for _ in range(nch)]
    for off in range(0, len(data) - block_align + 1, block_align):
        block = data[off : off + block_align]
        body_parts: list[np.ndarray] = []
        preds, idxs = [], []
        for c in range(nch):
            hdr = block[4 * c : 4 * c + 4]
            preds.append(
                int.from_bytes(hdr[0:2], "little", signed=True)
            )
            idxs.append(min(88, hdr[2]))
        body = np.frombuffer(block[4 * nch :], dtype=np.uint8)
        lo = body & 0x0F
        hi = body >> 4
        nibs = np.empty(len(body) * 2, dtype=np.uint8)
        nibs[0::2] = lo  # low nibble first, per the IMA WAV layout
        nibs[1::2] = hi
        if nch == 1:
            chan_nibs = [nibs]
        else:
            # stereo: 4-byte (8-nibble) groups alternate channels
            groups = nibs.reshape(-1, 8)
            chan_nibs = [
                groups[0::2].reshape(-1),
                groups[1::2].reshape(-1),
            ]
        for c in range(nch):
            dec = _decode_nibbles(chan_nibs[c], preds[c], idxs[c])
            # the header predictor IS sample 0 of the block
            per_chan[c].append(
                np.concatenate(([preds[c]], dec[: spb - 1]))
            )
    if not per_chan[0]:
        raise ValueError("no complete ADPCM block in data chunk")
    chans = [np.concatenate(p) for p in per_chan]
    if total is not None:
        chans = [c[:total] for c in chans]
    inter = np.empty(len(chans[0]) * nch, dtype=np.float64)
    for c in range(nch):
        inter[c::nch] = chans[c] / 32768.0
    return rate, nch, inter


def encode_ima_adpcm_wav(
    samples: np.ndarray,
    *,
    sample_rate: int,
    n_channels: int = 1,
    samples_per_block: int = 505,
) -> bytes:
    """float64 [-1, 1] interleaved samples → IMA-ADPCM WAV bytes."""
    if n_channels not in (1, 2):
        raise ValueError("mono or stereo only")
    if (samples_per_block - 1) % 8:
        raise ValueError("samples_per_block must be 8k+1")
    if len(samples) % n_channels:
        # an odd interleaved count with stereo would leave chans[1]
        # one short; the final block would then index an empty segment
        # (IndexError) instead of honouring the ValueError contract
        raise ValueError(
            f"interleaved sample count {len(samples)} is not a "
            f"multiple of n_channels={n_channels}"
        )
    x = np.clip(
        np.asarray(samples, dtype=np.float64) * 32768.0, -32768, 32767
    ).astype(np.int64)
    nch = n_channels
    chans = [x[c::nch] for c in range(nch)]
    n = len(chans[0])
    block_align = 4 * nch + (samples_per_block - 1) * nch // 2
    out_blocks: list[bytes] = []
    idx = [0] * nch
    pos = 0
    while pos < n:
        take = min(samples_per_block, n - pos)
        block = bytearray()
        nib_streams: list[np.ndarray] = []
        for c in range(nch):
            seg = chans[c][pos : pos + take]
            pred = int(seg[0])
            block_hdr_at = len(block)
            block += int(pred).to_bytes(2, "little", signed=True)
            block += bytes([idx[c], 0])
            nibs = np.zeros(samples_per_block - 1, dtype=np.uint8)
            cur_idx = idx[c]
            for i in range(1, take):
                step = int(_STEP_TABLE[cur_idx])
                delta = int(seg[i]) - pred
                nib = 0
                if delta < 0:
                    nib = 8
                    delta = -delta
                if delta >= step:
                    nib |= 4
                    delta -= step
                if delta >= step >> 1:
                    nib |= 2
                    delta -= step >> 1
                if delta >= step >> 2:
                    nib |= 1
                # reconstruct exactly as the decoder will
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                pred += -diff if nib & 8 else diff
                pred = max(-32768, min(32767, pred))
                cur_idx = max(0, min(88, cur_idx + int(_INDEX_TABLE[nib])))
                nibs[i - 1] = nib
            idx[c] = cur_idx
            nib_streams.append(nibs)
            del block_hdr_at
        if nch == 1:
            packed_nibs = nib_streams[0]
        else:
            g0 = nib_streams[0].reshape(-1, 8)
            g1 = nib_streams[1].reshape(-1, 8)
            packed_nibs = np.stack([g0, g1], axis=1).reshape(-1)
        packed = (
            packed_nibs[0::2] | (packed_nibs[1::2] << 4)
        ).astype(np.uint8)
        block += packed.tobytes()
        out_blocks.append(bytes(block))
        pos += take
    data = b"".join(out_blocks)
    fmt = (
        (0x11).to_bytes(2, "little")
        + nch.to_bytes(2, "little")
        + int(sample_rate).to_bytes(4, "little")
        + (sample_rate * block_align // samples_per_block).to_bytes(
            4, "little"
        )
        + block_align.to_bytes(2, "little")
        + (4).to_bytes(2, "little")
        + (2).to_bytes(2, "little")
        + samples_per_block.to_bytes(2, "little")
    )
    fact = n.to_bytes(4, "little")
    body = (
        b"WAVE"
        + b"fmt "
        + len(fmt).to_bytes(4, "little")
        + fmt
        + b"fact"
        + len(fact).to_bytes(4, "little")
        + fact
        + b"data"
        + len(data).to_bytes(4, "little")
        + data
    )
    return b"RIFF" + len(body).to_bytes(4, "little") + body
