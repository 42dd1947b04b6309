"""BMP (Windows DIB) codec — pure struct + numpy, no external libs.

Decode covers the forms a corpus actually contains: BITMAPINFOHEADER
and its V2-V5 extensions (the first 40 bytes share one layout), BI_RGB
at 1/4/8-bit palette, 16-bit (X1R5G5B5), 24-bit BGR and 32-bit BGRX,
BI_BITFIELDS when the masks are the canonical A8R8G8B8 / X8R8G8B8 /
R5G6B5 layouts, and the run-length-compressed palette forms BI_RLE8 /
BI_RLE4 (compression 1/2 — encoded runs, absolute mode with 2-byte
padding, end-of-line / end-of-bitmap / delta escapes, per the public
format spec; top-down RLE is rejected, as the spec forbids it).
Bottom-up rows (positive biHeight) and top-down rows (negative
biHeight) both map onto the repo-wide (h, w, 3) uint8 RGB contract;
uncompressed rows are 4-byte aligned.  PNG/JPEG embeddings
(compression 4/5) raise ValueError — same boundary policy as the
other codecs (multimodal.py header note).

Encode emits 24-bit BI_RGB bottom-up, or 8-bit BI_RLE8 via
:func:`encode_rle8` — enough for format-preserving resize and
deterministic test fixtures (including raw-video AVI DIB streams,
which avi.py routes here by the same compression field).

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
    elif compression in (1, 2):  # BI_RLE8 / BI_RLE4
        want_bits = 8 if compression == 1 else 4
        if bits != want_bits:
            raise ValueError(
                "BMP: BI_RLE%d requires %d-bit pixels, header declares %d"
                % (want_bits, want_bits, bits)
            )
        if top_down:
            # the public spec forbids compressing top-down DIBs
            raise ValueError("BMP: top-down DIBs cannot be RLE-compressed")
        idx = _decode_rle(data[pix_off:], w, h, compression)[::-1]
        return _apply_palette(data, hdr_size, bits, clr_used, idx, pal_shift=0)
    elif compression != 0:
        raise ValueError(
            "BMP: compression %d is outside this kernel "
            "(embedded PNG/JPEG streams; plug Pillow in production)"
            % compression
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
        if bits == 8:
            idx = rows[:, :w]
        else:
            bits_arr = np.unpackbits(rows, axis=1)
            weights = 1 << np.arange(bits - 1, -1, -1)
            idx = (
                bits_arr[:, : w * bits].reshape(h, w, bits) * weights
            ).sum(axis=2)
        return _apply_palette(
            data,
            hdr_size,
            bits,
            clr_used,
            idx,
            pal_shift=12 if compression == 3 and hdr_size == 40 else 0,
        )

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


def _apply_palette(
    data: bytes,
    hdr_size: int,
    bits: int,
    clr_used: int,
    idx: np.ndarray,
    *,
    pal_shift: int,
) -> np.ndarray:
    """(h, w) palette-index array → (h, w, 3) RGB through the BGRX
    color table that follows the info header (shared by the
    uncompressed ≤8-bit path and the RLE paths)."""
    n_colors = clr_used or (1 << bits)
    pal_off = 14 + hdr_size + pal_shift
    pal = data[pal_off : pal_off + 4 * n_colors]
    if len(pal) < 4 * n_colors:
        raise ValueError("BMP: truncated palette")
    # palette entries are BGRX → RGB
    table = np.frombuffer(pal, dtype=np.uint8).reshape(-1, 4)[:, 2::-1]
    idx = idx.astype(np.int64)
    if int(idx.max(initial=0)) >= len(table):
        raise ValueError("BMP: palette index out of range")
    return np.ascontiguousarray(table[idx])


def _decode_rle(stream: bytes, w: int, h: int, fmt: int) -> np.ndarray:
    """BI_RLE8 (fmt=1) / BI_RLE4 (fmt=2) pixel stream → (h, w) palette
    index array in BOTTOM-UP line order (line 0 = bottom row, as stored;
    the caller flips).  Implements the public spec exactly: encoded runs
    (RLE4 alternating the byte's high/low nibbles), absolute mode
    (literal pixels, padded to a 2-byte boundary), and the 00-escapes —
    end of line, end of bitmap, delta (dx right, dy UP in bottom-up
    space).  Pixels no run ever touches (delta jumps, early end-of-line)
    take index 0 — the spec leaves them undefined; 0 is the
    deterministic choice mainstream decoders make.  Hostile streams
    (runs past the row, deltas outside the bitmap, truncation before
    end-of-bitmap) raise ValueError rather than writing out of bounds.
    """
    idx = np.zeros((h, w), dtype=np.uint8)
    x = y = i = 0
    n = len(stream)
    while True:
        if i + 2 > n:
            raise ValueError("BMP: truncated RLE stream")
        cnt, val = stream[i], stream[i + 1]
        i += 2
        if cnt:  # encoded run
            if y >= h or x + cnt > w:
                raise ValueError("BMP: RLE run exceeds bitmap bounds")
            if fmt == 1:
                idx[y, x : x + cnt] = val
            else:  # alternate high/low nibble across the run
                idx[y, x : x + cnt] = [
                    (val >> 4) if j % 2 == 0 else (val & 0x0F)
                    for j in range(cnt)
                ]
            x += cnt
        elif val == 0:  # end of line
            x, y = 0, y + 1
        elif val == 1:  # end of bitmap
            return idx
        elif val == 2:  # delta: move right dx, up dy (bottom-up space)
            if i + 2 > n:
                raise ValueError("BMP: truncated RLE delta")
            dx, dy = stream[i], stream[i + 1]
            i += 2
            x, y = x + dx, y + dy
            if x > w or y > h:
                raise ValueError("BMP: RLE delta exceeds bitmap bounds")
        else:  # absolute mode: `val` literal pixels, 2-byte aligned
            cnt = val
            if y >= h or x + cnt > w:
                raise ValueError("BMP: RLE absolute run exceeds bounds")
            nbytes = cnt if fmt == 1 else (cnt + 1) // 2
            if i + nbytes > n:
                raise ValueError("BMP: truncated RLE absolute run")
            if fmt == 1:
                idx[y, x : x + cnt] = np.frombuffer(
                    stream, dtype=np.uint8, count=cnt, offset=i
                )
            else:
                b = np.frombuffer(
                    stream, dtype=np.uint8, count=nbytes, offset=i
                )
                nib = np.empty(nbytes * 2, dtype=np.uint8)
                nib[0::2] = b >> 4
                nib[1::2] = b & 0x0F
                idx[y, x : x + cnt] = nib[:cnt]
            x += cnt
            i += nbytes + (nbytes & 1)  # pad to the 2-byte boundary


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


def rle8_compress(idx: np.ndarray) -> bytes:
    """(h, w) uint8 palette-index array → BI_RLE8 pixel stream in
    bottom-up line order: encoded runs (≤255) + end-of-line per row,
    end-of-bitmap closing the stream.  Pure encoded runs — no absolute
    mode, no deltas — so every spec-conforming decoder accepts it.
    Deterministic: same array, same bytes.  Also the per-frame payload
    builder for avi.py's RLE DIB streams."""
    idx = np.asarray(idx, dtype=np.uint8)
    if idx.ndim != 2 or idx.size == 0:
        raise ValueError("RLE8 compress expects a non-empty (h, w) array")
    out = bytearray()
    for row in idx[::-1]:  # bottom-up storage order
        j, w = 0, len(row)
        while j < w:
            run = 1
            while j + run < w and row[j + run] == row[j] and run < 255:
                run += 1
            out += bytes((run, int(row[j])))
            j += run
        out += b"\x00\x00"  # end of line
    out[-2:] = b"\x00\x01"  # the last row closes with end-of-bitmap
    return bytes(out)


def encode_rle8(idx: np.ndarray, palette) -> bytes:
    """(h, w) uint8 palette-index array + ``[(r, g, b), ...]`` palette →
    standalone 8-bit BI_RLE8 BMP (bottom-up, biCompression=1).  The
    fixture writer for the RLE decode path.  Deterministic — same
    inputs, same bytes."""
    idx = np.asarray(idx, dtype=np.uint8)
    if idx.ndim != 2 or idx.size == 0:
        raise ValueError("BMP RLE8 encode expects a non-empty (h, w) array")
    pal = list(palette)
    if not 0 < len(pal) <= 256:
        raise ValueError("BMP RLE8 encode: palette must hold 1-256 colors")
    if int(idx.max(initial=0)) >= len(pal):
        raise ValueError("BMP RLE8 encode: palette index out of range")
    h, w = idx.shape
    stream = rle8_compress(idx)
    pal_bytes = b"".join(bytes((b, g, r, 0)) for r, g, b in pal)
    pix_off = 14 + 40 + len(pal_bytes)
    header = struct.pack(
        "<2sIHHI", b"BM", pix_off + len(stream), 0, 0, pix_off
    ) + struct.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, len(stream), 2835, 2835,
        len(pal), len(pal),
    )
    return header + pal_bytes + stream


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
