"""Baseline PNG codec — stdlib zlib + numpy, no external image libs.

Decode covers full non-interlaced baseline PNG per the public spec
(RFC 2083 / ISO 15948): chunk walk with CRC verification, IHDR parse,
zlib inflate of the concatenated IDAT stream, per-scanline unfilter
(filter types 0 None / 1 Sub / 2 Up / 3 Average / 4 Paeth), bit-depth
expansion (1/2/4/8/16), and color-type mapping — 0 grayscale, 2
truecolor, 3 palette (PLTE), 4 gray+alpha, 6 RGBA — down to the
repo-wide image contract of a (h, w, 3) uint8 RGB array (alpha
dropped, 16-bit samples reduced to their high byte).  Adam7 interlace
(interlace_method=1) is decoded too: the seven passes are independent
sub-images sharing the filter machinery, scattered back onto the full
grid by their (x0, y0, dx, dy) lattice.

Encode emits 8-bit truecolor, filter type 0, one IDAT — enough for
format-preserving resize (multimodal.resize_images) and for planting
deterministic test fixtures.

The reference framework has no in-process image codec at all — its
media path hands blobs to service UDF parsers (reference
python/pathway/xpacks/llm/parsers.py:53-746).  This kernel exists so
decode_image / resize_images / image_dhash are REAL for the second
most common corpus image format; it runs per-executor behind
Arrow-batched mapInPandas, the appropriate boundary for inherently
imperative decode work.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel for each color type
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}
# bit depths the spec allows per color type
_VALID_DEPTHS = {
    0: (1, 2, 4, 8, 16),
    2: (8, 16),
    3: (1, 2, 4, 8),
    4: (8, 16),
    6: (8, 16),
}


def is_png(data: bytes) -> bool:
    return bytes(data[:8]) == _SIGNATURE


def _chunks(data: bytes):
    """Yield (type, payload) walking the chunk stream; verifies each CRC."""
    pos = 8
    n = len(data)
    while pos + 8 <= n:
        (length,) = struct.unpack_from(">I", data, pos)
        ctype = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        if len(payload) != length or pos + 12 + length > n:
            raise ValueError("PNG: truncated chunk %r" % ctype)
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if crc != zlib.crc32(ctype + payload) & 0xFFFFFFFF:
            raise ValueError("PNG: CRC mismatch in %r chunk" % ctype)
        yield ctype, payload
        pos += 12 + length
        if ctype == b"IEND":
            return
    raise ValueError("PNG: missing IEND")


def _unfilter(raw: bytes, h: int, row_bytes: int, fbpp: int) -> np.ndarray:
    """Reverse per-scanline filtering → (h, row_bytes) uint8 matrix."""
    if len(raw) != h * (1 + row_bytes):
        raise ValueError("PNG: decompressed size mismatch")
    flat = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + row_bytes)
    out = np.zeros((h, row_bytes), dtype=np.uint8)
    prev = np.zeros(row_bytes, dtype=np.int64)
    for y in range(h):
        ftype = int(flat[y, 0])
        cur = flat[y, 1:].astype(np.int64)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub: left-neighbour prefix sum per byte lane
            for c in range(fbpp):
                cur[c::fbpp] = np.cumsum(cur[c::fbpp]) & 0xFF
        elif ftype == 2:  # Up
            cur = (cur + prev) & 0xFF
        elif ftype == 3:  # Average
            for x in range(row_bytes):
                left = cur[x - fbpp] if x >= fbpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for x in range(row_bytes):
                a = cur[x - fbpp] if x >= fbpp else 0
                b = prev[x]
                c = prev[x - fbpp] if x >= fbpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError("PNG: unknown filter type %d" % ftype)
        prev = cur
        out[y] = cur.astype(np.uint8)
    return out


def _expand_samples(rows: np.ndarray, w: int, channels: int, depth: int) -> np.ndarray:
    """(h, row_bytes) packed bytes → (h, w*channels) samples at native
    depth (uint8 for ≤8-bit; 16-bit already reduced to its high byte)."""
    if depth == 8:
        return rows[:, : w * channels]
    if depth == 16:
        return rows[:, : w * channels * 2 : 2]  # high byte ≈ 8-bit value
    # 1/2/4-bit: unpack each byte big-endian-first, regroup depth bits
    bits = np.unpackbits(rows, axis=1)
    per_row = w * channels  # samples per scanline (sub-byte packing)
    weights = 1 << np.arange(depth - 1, -1, -1)
    usable = bits[:, : per_row * depth].reshape(rows.shape[0], per_row, depth)
    return (usable * weights).sum(axis=2).astype(np.uint8)


# Adam7 pass lattice: (x_start, y_start, x_step, y_step) per pass.
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def _decode_subimage(
    raw: bytes, offset: int, w: int, h: int, channels: int, depth: int
) -> tuple[np.ndarray, int]:
    """Unfilter + expand one (sub-)image of the decompressed stream →
    ((h, w, channels) native-depth samples, next offset).  Each Adam7
    pass filters independently, so this is the shared unit for both the
    non-interlaced whole image and each interlace pass."""
    bpp_bits = depth * channels
    row_bytes = (w * bpp_bits + 7) // 8
    fbpp = max(1, bpp_bits // 8)
    nbytes = h * (1 + row_bytes)
    rows = _unfilter(raw[offset : offset + nbytes], h, row_bytes, fbpp)
    samples = _expand_samples(rows, w, channels, depth)
    return samples.reshape(h, w, channels), offset + nbytes


def decode(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB; every malformed-stream escape
    (zlib errors, short reads...) is normalized to ValueError."""
    try:
        return _decode_impl(data)
    except ValueError:
        raise
    except (struct.error, zlib.error, IndexError, KeyError, OverflowError, TypeError) as exc:
        raise ValueError(
            "PNG: malformed stream (%s)" % type(exc).__name__
        ) from exc


def _decode_impl(data: bytes) -> np.ndarray:
    """PNG bytes → (h, w, 3) uint8 RGB.  ValueError on non-PNG input
    and corrupt streams."""
    data = bytes(data)
    if not is_png(data):
        raise ValueError("PNG: bad signature")
    ihdr = None
    plte = None
    idat = []
    for ctype, payload in _chunks(data):
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", payload)
        elif ctype == b"PLTE":
            plte = np.frombuffer(payload, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat.append(payload)
    if ihdr is None or not idat:
        raise ValueError("PNG: missing IHDR/IDAT")
    w, h, depth, color_type, compression, filter_method, interlace = ihdr
    if compression != 0 or filter_method != 0:
        raise ValueError("PNG: unknown compression/filter method")
    if interlace not in (0, 1):
        raise ValueError("PNG: unknown interlace method %d" % interlace)
    if color_type not in _CHANNELS or depth not in _VALID_DEPTHS[color_type]:
        raise ValueError("PNG: invalid depth/color-type combination")
    if w == 0 or h == 0:
        raise ValueError("PNG: zero dimension")
    if w * h > 100_000_000:  # allocation-bomb guard for corrupt headers
        raise ValueError("PNG: dimensions exceed the 100M-pixel kernel cap")
    channels = _CHANNELS[color_type]
    # bound the inflate by the geometry the header promises — a zlib bomb
    # in IDAT cannot expand past one extra byte (which then mismatches)
    bpp_bits_all = depth * channels
    if interlace == 1:
        expected = sum(
            ph * (1 + (pw * bpp_bits_all + 7) // 8)
            for x0, y0, dx, dy in _ADAM7
            for pw, ph in [((w - x0 + dx - 1) // dx, (h - y0 + dy - 1) // dy)]
            if pw and ph
        )
    else:
        expected = h * (1 + (w * bpp_bits_all + 7) // 8)
    d = zlib.decompressobj()
    raw = d.decompress(b"".join(idat), expected + 1)
    if interlace == 1:
        px = np.zeros((h, w, channels), dtype=np.uint8)
        off = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:  # empty pass contributes zero bytes
                continue
            sub, off = _decode_subimage(raw, off, pw, ph, channels, depth)
            px[y0::dy, x0::dx] = sub
        if off != len(raw):
            raise ValueError("PNG: decompressed size mismatch")
    else:
        px, off = _decode_subimage(raw, 0, w, h, channels, depth)
        if off != len(raw):
            raise ValueError("PNG: decompressed size mismatch")

    if color_type == 3:
        if plte is None:
            raise ValueError("PNG: palette image without PLTE")
        idx = px[..., 0].astype(np.int64)
        if int(idx.max(initial=0)) >= len(plte):
            raise ValueError("PNG: palette index out of range")
        return np.ascontiguousarray(plte[idx])
    if depth < 8:  # grayscale sub-byte: scale to full 8-bit range
        px = (px.astype(np.uint16) * 255 // ((1 << depth) - 1)).astype(np.uint8)
    if color_type == 0:
        return np.ascontiguousarray(np.repeat(px, 3, axis=2))
    if color_type == 4:
        return np.ascontiguousarray(np.repeat(px[..., :1], 3, axis=2))
    return np.ascontiguousarray(px[..., :3])  # 2 (exact) or 6 (drop alpha)


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def encode(arr: np.ndarray, *, level: int = 6, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB → truecolor 8-bit PNG, filter 0, one IDAT.
    Deterministic (fixed zlib strategy) — same array, same bytes.
    ``interlace=True`` emits Adam7 pass order (each pass its own
    filter-0 scanline block) — used to plant interlaced fixtures."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("PNG encode expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, int(interlace))
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = arr[y0::dy, x0::dx]
            ph, pw = sub.shape[:2]
            if ph == 0 or pw == 0:
                continue
            block = np.zeros((ph, 1 + pw * 3), dtype=np.uint8)
            block[:, 1:] = sub.reshape(ph, pw * 3)
            parts.append(block.tobytes())
        idat = zlib.compress(b"".join(parts), level)
    else:
        scanlines = np.zeros((h, 1 + w * 3), dtype=np.uint8)
        scanlines[:, 1:] = arr.reshape(h, w * 3)
        idat = zlib.compress(scanlines.tobytes(), level)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )
