"""GIF codec (87a/89a) — pure Python LZW + numpy, no external libs.

Decode composes frames onto the logical screen: header + logical screen
descriptor, global/local color tables, graphic-control transparency and
disposal methods (leave / restore-background / restore-previous), GIF
LZW decompression (little-endian bit packing, growing code width to 12
bits, clear/EOI codes), and 4-pass row interlacing — down to the
repo-wide (h, w, 3) uint8 RGB contract.  ``decode`` returns the first
frame (what image dedup / feature extraction key off);
``decode_frames`` returns canvas snapshots for every frame, which is
what makes ``multimodal.frame_sample`` REAL for animated GIFs.  The
reference framework has no in-process codec at all (its media path
hands blobs to service UDF parsers, reference
python/pathway/xpacks/llm/parsers.py:53-746).

Encode emits 89a files with power-of-two palettes built from distinct
colors (ValueError above 256 — real encoders quantize; fixtures don't
need to): ``encode`` single-frame, ``encode_animated`` multi-frame with
per-frame local color tables, offsets, delays, transparency and
disposal — enough for format-preserving resize and for planting
deterministic animation fixtures.
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
    # LZW expands at most ~(8/9)*4096 output bytes per input byte; an
    # `expect` beyond that bound is a corrupt header's allocation bomb
    if expect > len(data) * 3700 + 4096:
        raise ValueError("GIF: pixel count impossible for stream length")
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


_PARSE_ERRORS = (struct.error, IndexError, KeyError, OverflowError, TypeError)


def _valueerror_boundary(fn):
    """Normalize malformed-stream escapes to ValueError (the contract
    every corpus-scale consumer catches)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        try:
            return fn(*args, **kwargs)
        except ValueError:
            raise
        except _PARSE_ERRORS as exc:
            raise ValueError(
                "GIF: malformed stream (%s)" % type(exc).__name__
            ) from exc

    return wrapped


@_valueerror_boundary
def count_frames(data: bytes) -> int:
    """Number of image descriptors — a cheap structural walk, no LZW
    decode (frame_sample uses it to pick indices before composing)."""
    data = bytes(data)
    if not is_gif(data) or len(data) < 13:
        raise ValueError("GIF: bad signature")
    _sw, _sh, packed, _bg, _a = struct.unpack_from("<HHBBB", data, 6)
    _gct, pos = _color_table(data, 13, packed)
    n = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:
            break
        if block == 0x21:
            _payload, pos = _subblocks(data, pos + 1)
            continue
        if block != 0x2C:
            raise ValueError("GIF: unknown block 0x%02x" % block)
        _l, _t, _iw, _ih, ipacked = struct.unpack_from("<HHHHB", data, pos)
        pos += 9
        _lct, pos = _color_table(data, pos, ipacked)
        _stream, pos = _subblocks(data, pos + 1)
        n += 1
    return n


@_valueerror_boundary
def decode_frames(data: bytes, *, max_frames: int | None = None) -> list[np.ndarray]:
    """GIF bytes → frames composed on the logical screen, each a
    (h, w, 3) uint8 RGB canvas snapshot.  Honors per-frame graphic-
    control transparency and disposal methods 0/1 (leave) and 2
    (restore-to-background); 3 (restore-previous) restores the
    pre-frame canvas.  ValueError on non-GIF/corrupt input."""
    data = bytes(data)
    if not is_gif(data) or len(data) < 13:
        raise ValueError("GIF: bad signature")
    sw, sh, packed, bg_idx, _aspect = struct.unpack_from("<HHBBB", data, 6)
    if sw == 0 or sh == 0:
        raise ValueError("GIF: zero logical screen")
    if sw * sh > 100_000_000:
        raise ValueError("GIF: dimensions exceed the 100M-pixel kernel cap")
    gct, pos = _color_table(data, 13, packed)
    if gct is not None and bg_idx < len(gct):
        backdrop = gct[bg_idx]
    else:
        backdrop = np.zeros(3, dtype=np.uint8)
    canvas = np.broadcast_to(backdrop, (sh, sw, 3)).copy()
    frames: list[np.ndarray] = []
    transparent = -1
    disposal = 0
    while pos < len(data):
        block = data[pos]
        pos += 1
        if block == 0x3B:  # trailer
            break
        if block == 0x21:  # extension
            if pos >= len(data):
                raise ValueError("GIF: truncated extension")
            label = data[pos]
            payload, pos = _subblocks(data, pos + 1)
            if label == 0xF9 and len(payload) >= 4:
                disposal = (payload[0] >> 2) & 0x07
                transparent = payload[3] if payload[0] & 0x01 else -1
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
        y1, x1 = min(top + ih, sh), min(left + iw, sw)
        ch, cw = y1 - top, x1 - left
        if ch > 0 and cw > 0:
            prev_rect = canvas[top:y1, left:x1].copy()
            sub_idx = idx[:ch, :cw]
            frame_px = table[sub_idx.astype(np.int64)]
            if 0 <= transparent < len(table):
                mask = (sub_idx == transparent)[..., None]
                frame_px = np.where(mask, canvas[top:y1, left:x1], frame_px)
            canvas[top:y1, left:x1] = frame_px
        frames.append(canvas.copy())
        if max_frames is not None and len(frames) >= max_frames:
            return frames
        if ch > 0 and cw > 0:
            if disposal == 2:  # restore rect to background
                canvas[top:y1, left:x1] = backdrop
            elif disposal == 3:  # restore rect to pre-frame content
                canvas[top:y1, left:x1] = prev_rect
        transparent = -1
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image data")
    return frames


def decode(data: bytes) -> np.ndarray:
    """GIF bytes → FIRST frame composed on the logical screen as
    (h, w, 3) uint8 RGB.  ValueError on non-GIF/corrupt input."""
    return decode_frames(data, max_frames=1)[0]


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


def _palettize(arr: np.ndarray) -> tuple[np.ndarray, np.ndarray, int, int]:
    """(h, w, 3) → (padded power-of-two palette, index array, depth,
    min LZW code size).  ValueError above 256 distinct colors."""
    flat = arr.reshape(-1, 3)
    colors, idx = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise ValueError("GIF encode: >256 distinct colors (quantize first)")
    depth = max(1, (len(colors) - 1).bit_length())
    pal = np.zeros((1 << depth, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    return pal, idx.astype(np.uint8), depth, max(2, depth)


def _image_block(
    arr: np.ndarray, left: int, top: int, *, local_palette: bool
) -> tuple[bytes, np.ndarray, int]:
    """Image descriptor (+ optional local color table) + LZW sub-blocks
    for one frame → (bytes, palette, depth)."""
    h, w, _ = arr.shape
    pal, idx, depth, min_code = _palettize(arr)
    lzw = _lzw_encode(idx, min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    packed = (0x80 | ((depth - 1) & 0x07)) if local_palette else 0
    out = (
        b"\x2c"
        + struct.pack("<HHHHB", left, top, w, h, packed)
        + (pal.tobytes() if local_palette else b"")
        + bytes([min_code])
        + bytes(blocks)
    )
    return out, pal, depth


def _as_rgb(arr: np.ndarray) -> np.ndarray:
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[..., None], 3, axis=2)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise ValueError("GIF encode expects (h, w, 3) uint8")
    return arr


def encode(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → single-frame GIF89a.  The palette is the
    image's distinct colors (≤256, else ValueError).  Deterministic."""
    arr = _as_rgb(arr)
    h, w, _ = arr.shape
    body, pal, depth = _image_block(arr, 0, 0, local_palette=False)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) & 0x07), 0, 0)
        + pal.tobytes()
        + body
        + b"\x3b"
    )


def encode_animated(
    frames: list[dict],
    *,
    screen: tuple[int, int] | None = None,
    delay_cs: int = 4,
) -> bytes:
    """Multi-frame GIF89a for planting animation fixtures.  Each frame
    dict: ``img`` ((h, w, 3) uint8, required), ``left``/``top`` offsets,
    ``disposal`` (0-3), ``transparent`` (an RGB triple present in the
    frame's palette, rendered see-through), ``delay_cs``.  Every frame
    carries its own local color table, so palettes never need merging."""
    if not frames:
        raise ValueError("GIF encode_animated: no frames")
    first = _as_rgb(frames[0]["img"])
    if screen is None:
        screen = (
            max(_as_rgb(f["img"]).shape[1] + f.get("left", 0) for f in frames),
            max(_as_rgb(f["img"]).shape[0] + f.get("top", 0) for f in frames),
        )
    sw, sh = screen
    # global table only provides the backdrop (bg_idx 0 = first frame's
    # first palette color); frames use local tables
    gpal, _idx, gdepth, _mc = _palettize(first)
    out = bytearray(
        b"GIF89a"
        + struct.pack("<HHBBB", sw, sh, 0x80 | ((gdepth - 1) & 0x07), 0, 0)
        + gpal.tobytes()
    )
    # Netscape looping extension — what real animated GIFs carry
    out += b"\x21\xff\x0bNETSCAPE2.0\x03\x01\x00\x00\x00"
    for f in frames:
        img = _as_rgb(f["img"])
        pal, _i, _d, _m = _palettize(img)
        t_idx = 0
        t_flag = 0
        if f.get("transparent") is not None:
            want = np.asarray(f["transparent"], dtype=np.uint8)
            hits = np.where((pal == want).all(axis=1))[0]
            if not len(hits):
                raise ValueError("GIF: transparent color not in frame palette")
            t_idx, t_flag = int(hits[0]), 1
        gce_packed = ((f.get("disposal", 0) & 0x07) << 2) | t_flag
        out += bytes(
            [0x21, 0xF9, 4, gce_packed]
        ) + struct.pack("<H", f.get("delay_cs", delay_cs)) + bytes([t_idx, 0])
        body, _p, _dd = _image_block(
            img, f.get("left", 0), f.get("top", 0), local_palette=True
        )
        out += body
    out += b"\x3b"
    return bytes(out)
