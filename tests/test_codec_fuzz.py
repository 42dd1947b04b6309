"""Corpus-robustness contract for every media kernel: corrupt input may
be REJECTED but only ever via ValueError — at 100 TB, malformed blobs
are guaranteed, and any other exception type escapes the per-blob
except-clause in the mapInPandas consumers and kills the executor task.
Deterministic mutation fuzz (byte flips, truncations, both) over every
codec's own valid output, plus allocation-bomb guards for headers that
promise absurd geometry."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pathwaydataframework_spark.operators import avi, bmp, gif, jpeg, png, wavcodec


def _corpus():
    rng = np.random.default_rng(42)
    img = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
    pcm = rng.integers(-30000, 30000, 500).astype(np.int32)
    return {
        "jpeg": (jpeg.encode(img), jpeg.decode),
        "jpeg_prog": (jpeg.encode(img, progressive=True), jpeg.decode),
        "png": (png.encode(img), png.decode),
        "png_adam7": (png.encode(img, interlace=True), png.decode),
        "bmp": (bmp.encode(img), bmp.decode),
        "gif": (gif.encode(img // 32 * 32), gif.decode),
        "gif_anim": (
            gif.encode_animated(
                [dict(img=img // 32 * 32), dict(img=img // 16 * 16)]
            ),
            gif.decode_frames,
        ),
        "avi": (
            avi.encode_mjpeg([jpeg.encode(img)], width=16, height=16),
            avi.mjpeg_frames,
        ),
        "avi_dib": (avi.encode_dib([img, img]), avi.dib_frames),
        "avi_dispatch": (avi.encode_dib([img]), avi.image_frames),
        "wav_pcm": (wavcodec.encode_pcm16(pcm), wavcodec.decode),
        "wav_ulaw": (wavcodec.encode(pcm, tag=7), wavcodec.decode),
    }


@pytest.mark.parametrize("name", sorted(_corpus()))
def test_mutation_fuzz_only_valueerror_escapes(name):
    data, fn = _corpus()[name]
    rng = np.random.default_rng(abs(hash(name)) % (2**32))
    for trial in range(300):
        buf = bytearray(data)
        kind = trial % 3
        if kind == 0:  # flip 1-3 random bytes
            for _ in range(int(rng.integers(1, 4))):
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        elif kind == 1:  # truncate anywhere
            buf = buf[: int(rng.integers(1, len(buf)))]
        else:  # truncate + flip
            buf = buf[: int(rng.integers(8, len(buf)))]
            if len(buf) > 1:
                buf[int(rng.integers(0, len(buf)))] = int(rng.integers(0, 256))
        try:
            fn(bytes(buf))
        except ValueError:
            pass  # the one allowed rejection channel


def test_allocation_bomb_guards():
    # GIF logical screen claiming 65535x65535 must refuse before the
    # canvas allocation, not after
    huge_gif = b"GIF89a" + struct.pack("<HHBBB", 65535, 65535, 0, 0, 0)
    with pytest.raises(ValueError, match="cap|color table|truncated|image"):
        gif.decode(huge_gif + b"\x3b")
    # JPEG SOF claiming 65535x65535
    sof = struct.pack(">BHHB", 8, 65535, 65535, 1) + bytes([1, 0x11, 0])
    huge_jpg = (
        b"\xff\xd8" + b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
        + b"\xff\xd9"
    )
    with pytest.raises(ValueError, match="cap"):
        jpeg.decode(huge_jpg)
    # PNG zlib bomb: tiny IDAT inflating far past the declared geometry
    bomb = __import__("zlib").compress(b"\x00" * 10_000_000, 9)

    def chunk(t, p):
        import zlib as z

        return (
            struct.pack(">I", len(p)) + t + p
            + struct.pack(">I", z.crc32(t + p) & 0xFFFFFFFF)
        )

    data = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="mismatch"):
        png.decode(data)  # bounded inflate: stops at expected+1 bytes
    # BMP header claiming huge dims with no pixel data
    hdr = bytearray(bmp.encode(np.zeros((2, 2, 3), np.uint8)))
    struct.pack_into("<ii", hdr, 18, 40000, 40000)
    with pytest.raises(ValueError, match="cap"):
        bmp.decode(bytes(hdr))


def test_deeply_nested_avi_does_not_recurse():
    # 50k nested LISTs: the walk must be iterative, not recursive
    inner = avi._chunk(b"00dc", b"\xff\xd8payload")
    for _ in range(50_000):
        inner = avi._list(b"rec ", inner)
    data = avi._chunk(b"RIFF", b"AVI " + inner)
    (frame,) = avi.mjpeg_frames(data)
    assert frame == b"\xff\xd8payload"
