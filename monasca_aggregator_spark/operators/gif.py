"""Pure-stdlib+numpy GIF codec (LZW) for the multimodal decode path.

GIF is the third REAL compressed image codec in the pipeline (after
PNG's zlib inflate and baseline JPEG's Huffman+IDCT): variable-width
LZW over palette indices, per the GIF89a specification (CompuServe,
public spec) — no PIL. Scope: first frame of GIF87a/GIF89a streams,
global or local color table, interlaced or sequential row order;
transparency index is honored by leaving the palette color in place
(features don't carry alpha). Animated streams decode to frame 0,
matching ``sample_frames``'s "video is a sequence of stills" model.

The encoder emits a real LZW-compressed single-frame GIF (dictionary
rebuild on table overflow, 256-color palette built from the image)
so roundtrip tests exercise the actual compression path, not a
stored-literal shortcut.

Malformed/truncated payloads raise ValueError (never Index/KeyError —
the decode contract shared with operators/jpeg.py so one corrupt
payload nulls its row instead of failing the Spark task).

Reference parity: the reference pipeline has no media path at all
(SURVEY §2 row 35 is a scope extension); decode semantics follow the
public GIF89a spec only.
"""

from __future__ import annotations

import numpy as np


def _lzw_decode(min_code_size: int, data: bytes, n_expected: int) -> bytes:
    """GIF-variant LZW: variable code width starting at
    ``min_code_size+1`` bits, CLEAR resets the table, EOI terminates.
    Returns exactly ``n_expected`` palette indices (spec-compliant
    streams may omit EOI; extra output is truncated)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    # bit reader state over the concatenated sub-block payload
    bitpos = 0
    nbits = len(data) * 8

    def read_code(width: int) -> int:
        nonlocal bitpos
        if bitpos + width > nbits:
            return -1  # ran off the end: treat as implicit EOI
        byte0 = bitpos >> 3
        val = int.from_bytes(
            data[byte0 : byte0 + 3].ljust(3, b"\0"), "little"
        )
        val = (val >> (bitpos & 7)) & ((1 << width) - 1)
        bitpos += width
        return val

    table: list[bytes] = []

    def reset_table() -> None:
        table.clear()
        table.extend(bytes([i]) for i in range(clear))
        table.append(b"")  # CLEAR placeholder
        table.append(b"")  # EOI placeholder

    reset_table()
    width = min_code_size + 1
    prev: bytes | None = None
    while len(out) < n_expected:
        code = read_code(width)
        if code == -1 or code == eoi:
            break
        if code == clear:
            reset_table()
            width = min_code_size + 1
            prev = None
            continue
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            raise ValueError("corrupt GIF LZW stream (code out of range)")
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError("truncated GIF LZW stream")
    return bytes(out[:n_expected])


def _lzw_encode(min_code_size: int, indices: bytes) -> bytes:
    """GIF-variant LZW encoder (dict keyed on (prefix_code, byte);
    emits CLEAR on table overflow per the spec's recommended policy)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    if indices and max(indices) >= clear:
        raise ValueError(
            f"symbol {max(indices)} needs a larger min_code_size "
            f"than {min_code_size} (alphabet is 0..{clear - 1})"
        )
    out = bytearray()
    acc = 0
    accbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, accbits
        acc |= code << accbits
        accbits += width
        while accbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            accbits -= 8

    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    width = min_code_size + 1
    emit(clear, width)
    if not indices:
        emit(eoi, width)
    else:
        cur = indices[0]
        for b in indices[1:]:
            key = (cur, b)
            if key in table:
                cur = table[key]
                continue
            emit(cur, width)
            if next_code < 4096:
                table[key] = next_code
                next_code += 1
                # width sync: the decoder appends its matching entry
                # one code LATER than we assign (it has nothing to
                # append after the first post-clear code), so its
                # table length trails next_code by one — widen when
                # next_code passes 2^width, not when it reaches it
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            else:
                emit(clear, width)
                table.clear()
                next_code = eoi + 1
                width = min_code_size + 1
            cur = b
        emit(cur, width)
        emit(eoi, width)
    if accbits:
        out.append(acc & 0xFF)
    return bytes(out)


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif(payload: bytes) -> np.ndarray:
    """First frame of a GIF87a/GIF89a stream → (h, w, 3) uint8 RGB."""
    try:
        return _decode_gif_checked(payload)
    except (IndexError, KeyError) as exc:
        raise ValueError(f"truncated or malformed GIF: {exc!r}") from exc


def _decode_gif_checked(payload: bytes) -> np.ndarray:
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload (missing GIF8xa signature)")
    sw = int.from_bytes(payload[6:8], "little")
    sh = int.from_bytes(payload[8:10], "little")
    flags = payload[10]
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(payload[pos : pos + 3 * n], dtype=np.uint8)
        if len(gct) != 3 * n:
            raise ValueError("truncated global color table")
        gct = gct.reshape(n, 3)
        pos += 3 * n
    while True:
        if pos >= len(payload):
            raise ValueError("no image data before EOF")
        block = payload[pos]
        pos += 1
        if block == 0x3B:  # trailer
            raise ValueError("no image data in GIF")
        if block == 0x21:  # extension: label + sub-blocks
            pos += 1
            while payload[pos]:
                pos += 1 + payload[pos]
            pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"unexpected GIF block 0x{block:02x}")
        # image descriptor
        left = int.from_bytes(payload[pos : pos + 2], "little")
        top = int.from_bytes(payload[pos + 2 : pos + 4], "little")
        w = int.from_bytes(payload[pos + 4 : pos + 6], "little")
        h = int.from_bytes(payload[pos + 6 : pos + 8], "little")
        iflags = payload[pos + 8]
        pos += 9
        pal = gct
        if iflags & 0x80:  # local color table
            n = 2 << (iflags & 0x07)
            pal = np.frombuffer(
                payload[pos : pos + 3 * n], dtype=np.uint8
            )
            if len(pal) != 3 * n:
                raise ValueError("truncated local color table")
            pal = pal.reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF image has no color table")
        min_code = payload[pos]
        pos += 1
        if not 2 <= min_code <= 11:
            raise ValueError(f"bad LZW min code size {min_code}")
        chunks = []
        while payload[pos]:
            ln = payload[pos]
            seg = payload[pos + 1 : pos + 1 + ln]
            if len(seg) != ln:
                raise ValueError("truncated GIF data sub-block")
            chunks.append(seg)
            pos += 1 + ln
        idx = np.frombuffer(
            _lzw_decode(min_code, b"".join(chunks), w * h), dtype=np.uint8
        )
        if int(idx.max(initial=0)) >= len(pal):
            raise ValueError("palette index out of range")
        rows = idx.reshape(h, w)
        if iflags & 0x40:  # interlaced: rows stored in 4 passes
            order = np.concatenate(
                [np.arange(start, h, step) for start, step in _INTERLACE_PASSES]
            )
            deinter = np.empty_like(rows)
            deinter[order] = rows
            rows = deinter
        img = pal[rows]  # (h, w, 3)
        # place the frame on the logical screen if smaller (frame 0 of
        # animations may be a sub-rectangle); background = palette[0]
        if (w, h) != (sw, sh) or left or top:
            canvas = np.zeros((sh, sw, 3), dtype=np.uint8)
            canvas[:] = pal[0]
            canvas[top : top + h, left : left + w] = img
            img = canvas
        return img


def encode_gif(arr: np.ndarray) -> bytes:
    """(h, w, 3) or (h, w) uint8 → single-frame GIF89a with a real
    LZW-compressed data stream. Images with >256 distinct colors are
    rejected (quantization is out of scope — generate test inputs from
    palettized sources)."""
    a = np.asarray(arr, dtype=np.uint8)
    if a.ndim == 2:
        a = np.stack([a] * 3, axis=-1)
    if a.ndim != 3 or a.shape[2] != 3:
        raise ValueError("expected (h, w[, 3]) uint8")
    h, w = a.shape[:2]
    flat = a.reshape(-1, 3)
    pal, inv = np.unique(flat, axis=0, return_inverse=True)
    if len(pal) > 256:
        raise ValueError(f"{len(pal)} distinct colors > 256; quantize first")
    # palette size must be a power of two ≥ 2 with min_code_size ≥ 2
    size_bits = max(2, int(len(pal) - 1).bit_length())
    n_slots = 1 << size_bits
    table = np.zeros((n_slots, 3), dtype=np.uint8)
    table[: len(pal)] = pal
    min_code = size_bits
    out = bytearray()
    out += b"GIF89a"
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += bytes([0x80 | (size_bits - 1), 0, 0])  # GCT flag+size
    out += table.tobytes()
    out += b"\x2c" + b"\0\0\0\0"  # image descriptor at (0,0)
    out += w.to_bytes(2, "little") + h.to_bytes(2, "little")
    out += b"\0"  # no LCT, not interlaced
    out += bytes([min_code])
    stream = _lzw_encode(min_code, inv.astype(np.uint8).tobytes())
    for i in range(0, len(stream), 255):
        seg = stream[i : i + 255]
        out += bytes([len(seg)]) + seg
    out += b"\0\x3b"
    return bytes(out)
