"""AVI (RIFF) MJPEG demuxer — pure struct reads, no codec libraries.

Motion-JPEG is the one video format this container can take all the way
to pixels: the AVI is a RIFF chunk tree whose ``movi`` LIST carries one
complete JPEG per ``##dc``/``##db`` chunk, and operators/jpeg.py already
decodes those.  ``mjpeg_frames`` walks the tree (including ``rec ``
sub-LISTs, word-aligned chunk sizes) and returns the raw JPEG payloads;
``multimodal.frame_sample`` uses it to emit real frames.  Inter-frame
codecs (H.264 etc. inside MP4/AVI) remain the documented boundary
(DEVIATIONS.md #5) — ``is_avi``/``mjpeg_frames`` simply find no JPEG
chunks there and the caller falls back.

``encode_mjpeg`` emits a minimal valid single-stream MJPEG AVI
(hdrl with avih/strh/strf + movi) for planting deterministic fixtures.

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


def _walk(data: bytes, start: int, end: int, out: list[bytes]) -> None:
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
                payload = bytes(data[body_start:body_end])
                if payload[:2] == b"\xff\xd8":  # a complete JPEG frame
                    out.append(payload)
            pos = body_end + (size & 1)  # chunks are word-aligned


def mjpeg_frames(data: bytes) -> list[bytes]:
    """AVI bytes → list of raw JPEG frame payloads (possibly empty for
    non-MJPEG streams).  ValueError on non-AVI input or malformed trees
    (all parse escapes normalized)."""
    data = bytes(data)
    if not is_avi(data):
        raise ValueError("not an AVI (missing RIFF/AVI header)")
    out: list[bytes] = []
    try:
        _walk(
            data, 12, min(len(data), 8 + struct.unpack_from("<I", data, 4)[0]), out
        )
    except ValueError:
        raise
    except (struct.error, IndexError, OverflowError) as exc:
        raise ValueError(
            "AVI: malformed stream (%s)" % type(exc).__name__
        ) from exc
    return out


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    out = fourcc + struct.pack("<I", len(payload)) + payload
    if len(payload) & 1:
        out += b"\x00"
    return out


def _list(list_type: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", list_type + payload)


def encode_mjpeg(
    frames: list[bytes], *, width: int, height: int, fps: int = 25
) -> bytes:
    """JPEG frame payloads → minimal single-stream MJPEG AVI."""
    if not frames:
        raise ValueError("AVI encode: no frames")
    usec_per_frame = 1_000_000 // max(fps, 1)
    max_bytes = max(len(f) for f in frames)
    avih = struct.pack(
        "<14I",
        # flags 0: no idx1 chunk is written, so AVIF_HASINDEX (0x10) must
        # be off or strict players would reject the advertised-but-missing
        # index; demuxers (ours included) stream the movi list directly
        usec_per_frame, max_bytes * fps, 0, 0,
        len(frames), 0, 1, max_bytes, width, height, 0, 0, 0, 0,
    )
    strh = (
        b"vids" + b"MJPG"
        + struct.pack("<IHHIIIIIIIII", 0, 0, 0, 0, 1, fps, 0, len(frames),
                      max_bytes, 0, 0, 0)
        + struct.pack("<4H", 0, 0, width, height)
    )
    strf = struct.pack(  # BITMAPINFOHEADER with MJPG fourcc
        "<IiiHH4sIiiII", 40, width, height, 1, 24, b"MJPG",
        width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", f) for f in frames))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi)
