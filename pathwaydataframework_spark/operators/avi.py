"""AVI (RIFF) demuxer for intra-frame streams — pure struct reads, no
codec libraries.

Two video formats go all the way to pixels in this container: the AVI
is a RIFF chunk tree whose ``movi`` LIST carries one frame per
``##dc``/``##db`` chunk, and the payloads are either complete JPEGs
(Motion-JPEG — operators/jpeg.py decodes those) or DIB pixel data —
raw uncompressed arrays (BI_RGB) or run-length streams
(BI_RLE8/BI_RLE4) — each wrapping into a standalone BMP the
operators/bmp.py kernel decodes.  ``mjpeg_frames`` / ``dib_frames``
walk the tree (including ``rec `` sub-LISTs, word-aligned chunk sizes)
and return standalone image blobs; ``multimodal.frame_sample`` uses
them to emit real frames.  Inter-frame codecs (H.264 etc. inside
MP4/AVI) remain the documented boundary (DEVIATIONS.md #5) — both
demuxers simply find no decodable frames there and the caller falls
back.

``encode_mjpeg`` / ``encode_dib`` / ``encode_rle8`` emit minimal
valid single-stream AVIs (hdrl with avih/strh/strf + movi) for planting deterministic
fixtures.

The reference framework has no in-process media path at all — it hands
blobs to service UDF parsers (reference
python/pathway/xpacks/llm/parsers.py:53-746).
"""

from __future__ import annotations

import struct


def is_avi(data: bytes) -> bool:
    return (
        len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"AVI "
    )


def _walk(
    data: bytes,
    start: int,
    end: int,
    frames: list[bytes],
    headers: list[tuple[bytes, bytes]] | None = None,
) -> None:
    # explicit stack: adversarially nested LISTs must not hit the
    # interpreter recursion limit
    stack = [(start, end)]
    while stack:
        pos, limit = stack.pop()
        while pos + 8 <= limit:
            fourcc = data[pos : pos + 4]
            (size,) = struct.unpack_from("<I", data, pos + 4)
            body_start = pos + 8
            body_end = body_start + size
            if body_end > limit:
                raise ValueError("AVI: truncated chunk %r" % fourcc)
            if fourcc in (b"LIST", b"RIFF"):
                stack.append((body_end + (size & 1), limit))  # resume after
                pos, limit = body_start + 4, body_end  # descend (skip type)
                continue
            if fourcc[2:4] in (b"dc", b"db"):
                frames.append(bytes(data[body_start:body_end]))
            elif headers is not None and fourcc in (b"strh", b"strf"):
                # tree order: each strf follows its stream's strh
                headers.append((bytes(fourcc), bytes(data[body_start:body_end])))
            pos = body_end + (size & 1)  # chunks are word-aligned


def _demux(
    data: bytes, headers: list[tuple[bytes, bytes]] | None = None
) -> list[bytes]:
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    frames: list[bytes] = []
    try:
        _walk(
            data,
            12,
            min(len(data), 8 + struct.unpack_from("<I", data, 4)[0]),
            frames,
            headers,
        )
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(
            "AVI: malformed stream (%s)" % type(exc).__name__
        ) from exc
    return frames


def mjpeg_frames(data: bytes) -> list[bytes]:
    """AVI bytes → list of raw JPEG frame payloads (possibly empty for
    non-MJPEG streams).  ValueError on non-AVI input or malformed trees
    (all parse escapes normalized).

    Selection is by SOI sniff, not the declared compression, because
    headerless capture files (movi-only, no hdrl — see
    test_avi_rec_sublist_and_alignment) must still demux; callers that
    can meet a declared-raw stream should route through
    :func:`image_frames`, which checks the strf first (a raw BGR frame
    can legitimately START with FF D8 and would hijack this sniff)."""
    return [f for f in _demux(data) if f[:2] == b"\xff\xd8"]


def _first_vids_strf(headers: list[tuple[bytes, bytes]]) -> bytes | None:
    """The first ``vids`` stream's strf payload (a BITMAPINFOHEADER,
    possibly with palette/mask tail) from a tree-ordered strh/strf
    list — None when no video stream declares one."""
    want_strf = False
    for fourcc, payload in headers:
        if fourcc == b"strh":
            want_strf = payload[:4] == b"vids"
        elif fourcc == b"strf" and want_strf:
            return payload if len(payload) >= 40 else None
    return None


def video_format(data: bytes) -> dict | None:
    """The first video stream's declared format: ``{'width', 'height'
    (sign preserved — negative = top-down rows), 'bpp', 'compression'}``
    where compression is the BITMAPINFOHEADER value (0 = BI_RGB raw,
    else the codec fourcc as an int, e.g. 'MJPG').  None when the AVI
    declares no video stream."""
    headers: list[tuple[bytes, bytes]] = []
    _demux(data, headers)
    strf = _first_vids_strf(headers)
    if strf is None:
        return None
    w, h = struct.unpack_from("<ii", strf, 4)
    (bpp,) = struct.unpack_from("<H", strf, 14)
    (compression,) = struct.unpack_from("<I", strf, 16)
    return {"width": w, "height": h, "bpp": bpp, "compression": compression}


def _wrap_dibs(strf: bytes, frames: list[bytes]) -> list[bytes]:
    """DIB payloads + their stream's strf → standalone BMP blobs.
    Empty unless the strf declares a layout the bmp.py kernel decodes:
    BI_RGB (raw pixel arrays at a supported depth) or BI_RLE8/BI_RLE4
    (run-length streams at the depth the spec ties to each) — hostile
    w<=0/h==0 headers would make the expected frame size non-positive
    and let every foreign chunk masquerade as a frame.  For BI_RGB the
    frame-size floor is exact row arithmetic; for RLE the payload is
    variable-length, so the floor is the 2-byte end-of-bitmap minimum
    and the bmp.py RLE bounds checks are the decode-time backstop."""
    (compression,) = struct.unpack_from("<I", strf, 16)
    w, h = struct.unpack_from("<ii", strf, 4)
    (bpp,) = struct.unpack_from("<H", strf, 14)
    if compression == 0:
        if w <= 0 or h == 0 or bpp not in (1, 4, 8, 16, 24, 32):
            return []
        need = (w * bpp + 31) // 32 * 4 * abs(h)
    elif compression in (1, 2):  # BI_RLE8 / BI_RLE4 (spec: bottom-up only)
        if w <= 0 or h <= 0 or bpp != (8 if compression == 1 else 4):
            return []
        need = 2  # at least the end-of-bitmap escape
    elif compression == 3:  # BI_BITFIELDS: masks ride in the strf tail,
        # landing at byte 54 of the wrapped BMP — exactly where the
        # bmp.py kernel reads them
        if w <= 0 or h == 0 or bpp not in (16, 32) or len(strf) < 52:
            return []
        need = (w * bpp + 31) // 32 * 4 * abs(h)
    else:
        return []
    pix_off = 14 + len(strf)
    out = []
    for f in frames:
        if len(f) < need:  # truncated/foreign chunk — skip, don't crash
            continue
        file_header = struct.pack(
            "<2sIHHI", b"BM", pix_off + len(f), 0, 0, pix_off
        )
        out.append(file_header + strf + f)
    return out


def dib_frames(data: bytes) -> list[bytes]:
    """AVI bytes → list of standalone BMP blobs, one per frame — for
    streams whose video format is a DIB the bmp.py kernel decodes:
    uncompressed BI_RGB (each ``##db``/``##dc`` payload is the raw
    pixel array described by the stream's strf BITMAPINFOHEADER) or
    run-length BI_RLE8/BI_RLE4 (each payload is the RLE pixel stream);
    prefixing a BITMAPFILEHEADER + that strf (palette included, for
    ≤8-bit streams) yields a standalone BMP.  Empty for other codecs
    (MJPG → :func:`mjpeg_frames`; inter-frame codecs → the documented
    boundary).  ValueError on non-AVI/malformed input."""
    headers: list[tuple[bytes, bytes]] = []
    frames = _demux(data, headers)
    strf = _first_vids_strf(headers)
    return _wrap_dibs(strf, frames) if strf is not None else []


def image_frames(data: bytes) -> list[bytes]:
    """AVI bytes → standalone image blobs, one per frame, in ONE RIFF
    walk — the dispatch ``frame_sample`` uses: a stream whose strf
    declares BI_RGB, BI_RLE8/BI_RLE4 or BI_BITFIELDS wraps its DIB
    payloads as BMPs; anything else
    (declared MJPG, or headerless movi-only capture files with no strf
    at all) keeps the complete-JPEG payloads.  Checking the declared
    compression FIRST prevents a raw BGR frame that happens to start
    with the JPEG SOI marker (FF D8) from hijacking the MJPEG sniff.
    Empty for inter-frame codec streams (neither raw nor JPEG — the
    documented boundary).  ValueError on non-AVI/malformed input."""
    headers: list[tuple[bytes, bytes]] = []
    frames = _demux(data, headers)
    strf = _first_vids_strf(headers)
    if strf is not None:
        (compression,) = struct.unpack_from("<I", strf, 16)
        if compression in (0, 1, 2, 3):  # BI_RGB / RLE8 / RLE4 / BITFIELDS
            return _wrap_dibs(strf, frames)
    return [f for f in frames if f[:2] == b"\xff\xd8"]


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def _encode_avi(
    payloads: list[bytes],
    *,
    fourcc: bytes,
    strf: bytes,
    w: int,
    h: int,
    fps: int,
    chunk_id: bytes,
) -> bytes:
    """Shared container assembly for the fixture encoders: one vids
    stream (hdrl with avih/strh/strf) + a movi LIST of per-frame
    chunks.  avih flags stay 0: no idx1 chunk is written, so
    AVIF_HASINDEX (0x10) must be off or strict players would reject the
    advertised-but-missing index; demuxers (ours included) stream the
    movi list directly."""
    usec_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max(len(p) for p in payloads)
    avih = struct.pack(
        "<14I",
        usec_per_frame, max_bytes * fps, 0, 0,
        len(payloads), 0, 1, max_bytes, w, h, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + fourcc
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0,
                      len(payloads), max_bytes, 0, 0, 0)
        + struct.pack("<4H", 0, 0, w, h)
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(chunk_id, p) for p in payloads))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)


def encode_mjpeg(
    frames: list[bytes], *, width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG frame payloads → minimal single-stream MJPEG AVI."""
    if not frames:
        raise ValueError("AVI encode: no frames")
    strf = struct.pack(  # BITMAPINFOHEADER with MJPG fourcc
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    return _encode_avi(
        frames, fourcc=b"MJPG", strf=strf, w=width, h=height, fps=fps,
        chunk_id=b"00dc",
    )


def encode_dib(frames: list, *, fps: int = 25) -> bytes:
    """(h, w, 3) uint8 RGB arrays → minimal single-stream uncompressed
    (BI_RGB 24-bit bottom-up) AVI — ``00db`` chunks carrying the raw
    DIB pixel rows the bmp.py encoder would write, for planting
    deterministic raw-video fixtures.  All frames must share one
    shape (one strf describes the whole stream)."""
    import numpy as np

    if not frames:
        raise ValueError("AVI encode: no frames")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if any(a.ndim != 3 or a.shape[2] != 3 for a in arrs):
        raise ValueError("AVI DIB encode expects (h, w, 3) uint8 frames")
    if len({a.shape for a in arrs}) != 1:
        raise ValueError("AVI DIB encode: all frames must share one shape")
    h, w, _ = arrs[0].shape
    row_bytes = (w * 3 + 3) // 4 * 4

    def dib(a):
        rows = np.zeros((h, row_bytes), dtype=np.uint8)
        rows[:, : w * 3] = a[::-1, :, ::-1].reshape(h, w * 3)  # bottom-up BGR
        return rows.tobytes()

    payloads = [dib(a) for a in arrs]
    strf = struct.pack(  # BITMAPINFOHEADER, biCompression=0 (BI_RGB)
        "<IiiHHIIiiII", 40, w, h, 1, 24, 0, row_bytes * h, 2835, 2835, 0, 0,
    )
    return _encode_avi(
        payloads, fourcc=b"DIB ", strf=strf, w=w, h=h, fps=fps,
        chunk_id=b"00db",
    )


def encode_rle8(frames: list, palette, *, fps: int = 25) -> bytes:
    """(h, w) uint8 palette-index arrays + ``[(r, g, b), ...]`` palette
    → minimal single-stream BI_RLE8 AVI: ``00dc`` chunks carry the RLE
    pixel streams :func:`~pathwaydataframework_spark.operators.bmp.
    rle8_compress` emits, and the strf is the BITMAPINFOHEADER
    (biCompression=1) with the BGRX palette in its tail — exactly where
    :func:`dib_frames`' standalone-BMP wrap expects it.  All frames
    must share one shape.  Deterministic fixture writer, like
    :func:`encode_dib`."""
    import numpy as np

    from pathwaydataframework_spark.operators import bmp

    if not frames:
        raise ValueError("AVI encode: no frames")
    arrs = [np.asarray(f, dtype=np.uint8) for f in frames]
    if any(a.ndim != 2 for a in arrs):
        raise ValueError("AVI RLE8 encode expects (h, w) uint8 index frames")
    if len({a.shape for a in arrs}) != 1:
        raise ValueError("AVI RLE8 encode: all frames must share one shape")
    pal = list(palette)
    if not 0 < len(pal) <= 256:
        raise ValueError("AVI RLE8 encode: palette must hold 1-256 colors")
    if any(int(a.max(initial=0)) >= len(pal) for a in arrs):
        raise ValueError("AVI RLE8 encode: palette index out of range")
    h, w = arrs[0].shape
    payloads = [bmp.rle8_compress(a) for a in arrs]
    pal_bytes = b"".join(bytes((b, g, r, 0)) for r, g, b in pal)
    strf = struct.pack(  # BITMAPINFOHEADER, biCompression=1 (BI_RLE8)
        "<IiiHHIIiiII", 40, w, h, 1, 8, 1, max(len(p) for p in payloads),
        2835, 2835, len(pal), len(pal),
    ) + pal_bytes
    return _encode_avi(
        payloads, fourcc=b"RLE8", strf=strf, w=w, h=h, fps=fps,
        chunk_id=b"00dc",
    )
