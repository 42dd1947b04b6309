"""GIF codec (87a/89a) — pure Python LZW + numpy, no external libs.

Decode renders the FIRST frame onto the logical screen: header + logical
screen descriptor, global/local color tables, extension-block skipping
(the 89a graphic-control transparency index is honored by substituting
the backdrop color), GIF LZW decompression (little-endian bit packing,
growing code width to 12 bits, clear/EOI codes), and 4-pass row
interlacing — down to the repo-wide (h, w, 3) uint8 RGB contract.
Animation beyond frame 0 is out of scope by design: corpus image dedup
and feature extraction key off the first frame, and the reference
framework itself has no in-process codec (its media path hands blobs to
service UDF parsers, reference python/pathway/xpacks/llm/parsers.py:53-746).

Encode emits a single-frame 89a with a power-of-two palette built from
the image's distinct colors (ValueError above 256 — real encoders
quantize; fixtures don't need to) — enough for format-preserving resize
and deterministic test fixtures.
"""

from __future__ import annotations

import struct

import numpy as np

_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def is_gif(data: bytes) -> bool:
    return bytes(data[:6]) in (b"GIF87a", b"GIF89a")


def _color_table(data: bytes, pos: int, packed: int) -> tuple[np.ndarray | None, int]:
    if not packed & 0x80:
        return None, pos
    n = 2 << (packed & 0x07)
    table = data[pos : pos + 3 * n]
    if len(table) < 3 * n:
        raise ValueError("GIF: truncated color table")
    return np.frombuffer(table, dtype=np.uint8).reshape(n, 3), pos + 3 * n


def _subblocks(data: bytes, pos: int) -> tuple[bytes, int]:
    """Concatenate data sub-blocks starting at ``pos`` → (bytes, next)."""
    parts = []
    while True:
        if pos >= len(data):
            raise ValueError("GIF: truncated sub-blocks")
        n = data[pos]
        pos += 1
        if n == 0:
            return b"".join(parts), pos
        parts.append(data[pos : pos + n])
        if len(parts[-1]) < n:
            raise ValueError("GIF: truncated sub-blocks")
        pos += n


def _lzw_decode(data: bytes, min_code_size: int, expect: int) -> np.ndarray:
    """GIF LZW → uint8 index array of length ``expect``."""
    if not 2 <= min_code_size <= 8:
        raise ValueError("GIF: bad LZW minimum code size")
    clear = 1 << min_code_size
    eoi = clear + 1
    out = np.empty(expect, dtype=np.uint8)
    n_out = 0
    # dictionary as (prefix_code, tail_byte); roots are implicit
    prefix = np.zeros(4096, dtype=np.int32)
    tail = np.zeros(4096, dtype=np.uint8)
    next_code = eoi + 1
    width = min_code_size + 1
    acc = nbits = 0
    pos = 0
    prev = -1
    buf = np.empty(4096, dtype=np.uint8)  # expansion stack for one code

    def expand(code: int) -> tuple[int, int]:
        """Walk the chain → (first_byte, length); bytes land in buf reversed."""
        k = 0
        c = code
        while c >= clear:
            buf[k] = tail[c]
            c = int(prefix[c])
            k += 1
        buf[k] = c
        return c, k + 1

    while n_out < expect:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("GIF: LZW stream ended early")
            acc |= data[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            next_code = eoi + 1
            width = min_code_size + 1
            prev = -1
            continue
        if code == eoi:
            break
        if prev < 0:  # first code after clear must be a root
            if code >= clear:
                raise ValueError("GIF: bad first LZW code")
            out[n_out] = code
            n_out += 1
            prev = code
            continue
        if code < next_code:
            first, k = expand(code)
        elif code == next_code:  # KwKwK case
            first, k = expand(prev)
            buf[1 : k + 1] = buf[:k].copy()
            buf[0] = first  # will be reversed below; tail byte = first of prev
            k += 1
        else:
            raise ValueError("GIF: LZW code out of range")
        take = min(k, expect - n_out)
        out[n_out : n_out + take] = buf[:k][::-1][:take]
        n_out += take
        if next_code < 4096:
            prefix[next_code] = prev
            tail[next_code] = first
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = code
    if n_out < expect:
        raise ValueError("GIF: LZW produced too few pixels")
    return out


def decode(data: bytes) -> np.ndarray:
    """GIF bytes → first frame composed on the logical screen as
    (h, w, 3) uint8 RGB.  ValueError on non-GIF/corrupt input."""
    data = bytes(data)
    if not is_gif(data) or len(data) < 13:
        raise ValueError("GIF: bad signature")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError("GIF: zero logical screen")
    gct, pos = _color_table(data, 13, packed)
    transparent = -1
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer before any image
            raise ValueError("GIF: no image data")
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF: truncated extension")
            label = data[pos]
            payload, pos = _subblocks(data, pos + 1)
            if label == 0xF9 and len(payload) >= 4 and payload[0] & 0x01:
                transparent = payload[3]
            continue
        if block != 0x2C:
            raise ValueError("GIF: unknown block 0x%02x" % block)
        left, top, iw, ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        lct, pos = _color_table(data, pos, ipacked)
        table = lct if lct is not None else gct
        if table is None:
            raise ValueError("GIF: image without color table")
        if iw == 0 or ih == 0:
            raise ValueError("GIF: zero image size")
        min_code = data[pos]
        stream, pos = _subblocks(data, pos + 1)
        idx = _lzw_decode(stream, min_code, iw * ih).reshape(ih, iw)
        if ipacked & 0x40:  # interlaced: rows arrive in 4 passes
            ordered = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n = len(range(start, ih, step))
                ordered[start::step] = idx[src : src + n]
                src += n
            idx = ordered
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("GIF: color index out of range")
        # backdrop = background color (or black when bg is out of range)
        if gct is not None and bg_idx < len(gct):
            backdrop = gct[bg_idx]
        else:
            backdrop = np.zeros(3, dtype=np.uint8)
        canvas = np.broadcast_to(backdrop, (sh, sw, 3)).copy()
        frame = table[idx.astype(np.int64)]
        if 0 <= transparent < len(table):
            mask = idx == transparent
            frame = np.where(mask[..., None], backdrop, frame)
        y1, x1 = min(top + ih, sh), min(left + iw, sw)
        canvas[top:y1, left:x1] = frame[: y1 - top, : x1 - left]
        return np.ascontiguousarray(canvas)
    raise ValueError("GIF: truncated stream")


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF LZW compressor (dict-based, emits clear on table overflow)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out = bytearray()
    acc = nbits = 0
    width = min_code_size + 1

    def emit(code: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[bytes, int] = {bytes([i]): i for i in range(clear)}
    next_code = eoi + 1
    emit(clear)
    seq = b""
    for v in indices.tobytes():
        cand = seq + bytes([v])
        if cand in table:
            seq = cand
            continue
        emit(table[seq])
        if next_code < 4096:
            table[cand] = next_code
            next_code += 1
            if next_code - 1 == (1 << width) and width < 12:
                width += 1
        else:
            emit(clear)
            table = {bytes([i]): i for i in range(clear)}
            next_code = eoi + 1
            width = min_code_size + 1
        seq = bytes([v])
    if seq:
        emit(table[seq])
    emit(eoi)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → single-frame GIF89a.  The palette is the
    image's distinct colors (≤256, else ValueError).  Deterministic."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("GIF encode expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("GIF encode: >256 distinct colors (quantize first)")
    depth = max(1, (len(colors) - 1).bit_length())
    n_pal = 1 << depth
    pal = np.zeros((n_pal, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    min_code = max(2, depth)
    lzw = _lzw_encode(idx.astype(np.uint8), min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
        + pal.tobytes()
        + b"\x2c"
        + struct.pack("<HHHHB", 0, 0, w, h, 0)
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3b"
    )
