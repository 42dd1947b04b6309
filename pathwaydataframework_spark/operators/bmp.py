"""BMP (Windows DIB) codec — pure struct + numpy, no external libs.

Decode covers the uncompressed forms a corpus actually contains:
BITMAPINFOHEADER and its V2-V5 extensions (the first 40 bytes share one
layout), BI_RGB at 1/4/8-bit palette, 16-bit (X1R5G5B5), 24-bit BGR and
32-bit BGRX, plus BI_BITFIELDS when the masks are the canonical
A8R8G8B8 / X8R8G8B8 / R5G6B5 layouts.  Bottom-up rows (positive
biHeight) and top-down rows (negative biHeight) both map onto the
repo-wide (h, w, 3) uint8 RGB contract; rows are 4-byte aligned per the
public format spec.  RLE4/RLE8/PNG/JPEG embeddings raise ValueError —
same boundary policy as the other codecs (multimodal.py header note).

Encode emits 24-bit BI_RGB bottom-up — enough for format-preserving
resize and deterministic test fixtures.

The reference framework has no in-process image codec at all — its
media path hands blobs to service UDF parsers (reference
python/pathway/xpacks/llm/parsers.py:53-746); this kernel keeps
decode_image / image_dhash / resize_images REAL for header-sniffed BMPs
(multimodal.attach_media_meta already reads their dimensions JVM-side).
"""

from __future__ import annotations

import struct

import numpy as np


def is_bmp(data: bytes) -> bool:
    return bytes(data[:2]) == b"BM"


def decode(data: bytes) -> np.ndarray:
    """BMP bytes → (h, w, 3) uint8 RGB.  ValueError on non-BMP input,
    compressed variants, and malformed streams (all parse escapes are
    normalized to ValueError)."""
    try:
        return _decode_impl(data)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError, TypeError) as exc:
        raise ValueError(
            "BMP: malformed stream (%s)" % type(exc).__name__
        ) from exc


def _decode_impl(data: bytes) -> np.ndarray:
    data = bytes(data)
    if not is_bmp(data) or len(data) < 54:
        raise ValueError("BMP: bad signature or truncated header")
    (pix_off,) = struct.unpack_from("<I", data, 10)
    (hdr_size,) = struct.unpack_from("<I", data, 14)
    if hdr_size < 40:
        raise ValueError("BMP: only BITMAPINFOHEADER(+) supported")
    w, h_signed = struct.unpack_from("<ii", data, 18)
    planes, bits = struct.unpack_from("<HH", data, 26)
    (compression,) = struct.unpack_from("<I", data, 30)
    (clr_used,) = struct.unpack_from("<I", data, 46)
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0 or planes != 1:
        raise ValueError("BMP: invalid dimensions/planes")
    if w * h > 100_000_000:
        raise ValueError("BMP: dimensions exceed the 100M-pixel kernel cap")

    masks = None
    if compression == 3:  # BI_BITFIELDS: masks follow the 40-byte header
        if len(data) < 66:
            raise ValueError("BMP: truncated bitfield masks")
        masks = struct.unpack_from("<III", data, 54)
    elif compression != 0:
        raise ValueError(
            "BMP: compression %d is outside the uncompressed kernel "
            "(RLE/embedded streams; plug Pillow in production)" % compression
        )

    row_bytes = (w * bits + 31) // 32 * 4
    need = row_bytes * h
    px = data[pix_off : pix_off + need]
    if len(px) < need:
        raise ValueError("BMP: truncated pixel data")
    rows = np.frombuffer(px, dtype=np.uint8).reshape(h, row_bytes)
    if not top_down:
        rows = rows[::-1]

    if bits in (1, 4, 8):
        n_colors = clr_used or (1 << bits)
        pal_off = 14 + hdr_size + (12 if compression == 3 and hdr_size == 40 else 0)
        pal = data[pal_off : pal_off + 4 * n_colors]
        if len(pal) < 4 * n_colors:
            raise ValueError("BMP: truncated palette")
        # palette entries are BGRX → RGB
        table = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 4)[:, 2::-1]
        if bits == 8:
            idx = rows[:, :w]
        else:
            bits_arr = np.unpackbits(rows, axis=1)
            weights = 1 << np.arange(bits - 1, -1, -1)
            idx = (
                bits_arr[:, : w * bits].reshape(h, w, bits) * weights
            ).sum(axis=2)
        idx = idx.astype(np.int64)
        if int(idx.max(initial=0)) >= len(table):
            raise ValueError("BMP: palette index out of range")
        return np.ascontiguousarray(table[idx])

    if bits == 16:
        vals = rows[:, : w * 2].reshape(h, w, 2)
        v = vals[..., 0].astype(np.uint32) | (vals[..., 1].astype(np.uint32) << 8)
        rm, gm, bm = masks if masks else (0x7C00, 0x03E0, 0x001F)
        return _from_masks(v, rm, gm, bm)
    if bits == 24:
        bgr = rows[:, : w * 3].reshape(h, w, 3)
        return np.ascontiguousarray(bgr[..., ::-1])
    if bits == 32:
        quad = rows[:, : w * 4].reshape(h, w, 4)
        if masks:
            v = (
                quad[..., 0].astype(np.uint32)
                | (quad[..., 1].astype(np.uint32) << 8)
                | (quad[..., 2].astype(np.uint32) << 16)
                | (quad[..., 3].astype(np.uint32) << 24)
            )
            return _from_masks(v, *masks)
        return np.ascontiguousarray(quad[..., 2::-1])  # BGRX → RGB
    raise ValueError("BMP: unsupported bit depth %d" % bits)


def _from_masks(v: np.ndarray, rm: int, gm: int, bm: int) -> np.ndarray:
    """Extract channels through arbitrary contiguous bit masks, scaling
    each to the full 0-255 range."""
    out = np.zeros(v.shape + (3,), dtype=np.uint8)
    for ch, mask in enumerate((rm, gm, bm)):
        if mask == 0:
            raise ValueError("BMP: zero channel mask")
        shift = (mask & -mask).bit_length() - 1
        width = (mask >> shift).bit_length()
        chan = (v & mask) >> shift
        out[..., ch] = (chan * 255 // ((1 << width) - 1)).astype(np.uint8)
    return np.ascontiguousarray(out)


def encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → 24-bit BI_RGB bottom-up BMP.
    Deterministic — same array, same bytes."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("BMP encode expects (h, w, 3) uint8")
    h, w, _ = arr.shape
    row_bytes = (w * 3 + 3) // 4 * 4
    rows = np.zeros((h, row_bytes), dtype=np.uint8)
    rows[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
    pixels = rows.tobytes()
    header = struct.pack(
        "<2sIHHI", b"BM", 14 + 40 + len(pixels), 0, 0, 14 + 40
    ) + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(pixels), 2835, 2835, 0, 0)
    return header + pixels
