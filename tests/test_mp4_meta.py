"""ISO-BMFF metadata box-walk tests (multimodal.mp4_meta) plus the
attach_media_meta(deep=True) path that carries MP4 duration/dimensions
and JPEG SOF dimensions through one Arrow-batched pandas UDF.

Frame decode stays out of scope (inter-frame codecs — DEVIATIONS.md #5);
the reference's media path is service UDF parsers (reference
python/pathway/xpacks/llm/parsers.py:53-746)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pathwaydataframework_spark.operators import jpeg, multimodal


def _box(ctype: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + ctype + payload


def _mp4(w=640, h=360, timescale=600, duration=3300, codec=b"avc1") -> bytes:
    ftyp = _box(b"ftyp", b"isom" + struct.pack(">I", 512) + b"isommp41")
    mvhd = _box(
        b"mvhd",
        bytes(4) + bytes(8) + struct.pack(">II", timescale, duration) + bytes(80),
    )
    tkhd = _box(
        b"tkhd",
        bytes(4)
        + bytes(8)
        + struct.pack(">I", 1)
        + bytes(4)
        + bytes(4)
        + bytes(8)
        + bytes(8)
        + bytes(36)
        + struct.pack(">II", w << 16, h << 16),
    )
    entry = struct.pack(">I", 16) + codec + bytes(8)
    stsd = _box(b"stsd", bytes(4) + struct.pack(">I", 1) + entry)
    mdia = _box(b"mdia", _box(b"minf", _box(b"stbl", stsd)))
    return ftyp + _box(b"moov", mvhd + _box(b"trak", tkhd + mdia))


def test_mp4_meta_v0_full():
    meta = multimodal.mp4_meta(_mp4())
    assert meta == {
        "duration_ms": 5500,  # 3300 ticks at timescale 600
        "width": 640,
        "height": 360,
        "codec": "avc1",
        "track_count": 1,
    }


def test_mp4_meta_v1_and_64bit_largesize_boxes():
    # version-1 mvhd (64-bit times) inside a file that also carries a
    # 64-bit-largesize free box at top level — both size paths exercised
    mvhd1 = _box(
        b"mvhd",
        b"\x01"
        + bytes(3)
        + bytes(16)  # 64-bit ctime/mtime
        + struct.pack(">I", 600)
        + struct.pack(">Q", 1200)
        + bytes(80),
    )
    big_free = struct.pack(">I", 1) + b"free" + struct.pack(">Q", 16)
    data = _box(b"ftyp", b"isom" + bytes(4)) + big_free + _box(b"moov", mvhd1)
    meta = multimodal.mp4_meta(data)
    assert meta["duration_ms"] == 2000
    assert meta["track_count"] == 0
    assert meta["width"] is None


def test_mp4_meta_audio_only_track_has_no_dims():
    # zero width/height in tkhd (audio track) → dims stay None
    data = _mp4(w=0, h=0, codec=b"mp4a")
    meta = multimodal.mp4_meta(data)
    assert meta["width"] is None and meta["height"] is None
    assert meta["codec"] == "mp4a"
    assert meta["track_count"] == 1


def test_mp4_meta_rejects_non_bmff():
    with pytest.raises(ValueError, match="ftyp"):
        multimodal.mp4_meta(b"definitely not an mp4 file at all")
    # truncated/corrupt box stream after a valid ftyp: degrades to
    # all-None, never crashes (walk stops at the malformed box)
    meta = multimodal.mp4_meta(_box(b"ftyp", b"isom") + b"\xff\xff")
    assert meta["duration_ms"] is None


def test_jpeg_dims_walks_to_sof():
    data = jpeg.encode(np.zeros((24, 40, 3), dtype=np.uint8), quality=90)
    assert multimodal._jpeg_dims(data) == (40, 24)
    assert multimodal._jpeg_dims(b"\xff\xd8\xff\xee\x00\x04ab") is None


def test_attach_media_meta_deep(spark):
    rows = [
        (1, bytearray(_mp4())),
        (2, bytearray(jpeg.encode(np.full((8, 6, 3), 99, np.uint8)))),
        (3, bytearray(b"GIF89a" + struct.pack("<HH", 12, 34) + bytes(4))),
        (4, bytearray(b"plain bytes")),
    ]
    df = spark.createDataFrame(rows, "id long, data binary")
    out = {
        r["id"]: r["media_meta"].asDict()
        for r in multimodal.attach_media_meta(df, deep=True).collect()
    }
    assert out[1] == {
        "media_type": "video", "width": 640, "height": 360, "duration_ms": 5500
    }
    assert out[2]["media_type"] == "image"
    assert (out[2]["width"], out[2]["height"]) == (6, 8)
    # fixed-offset formats keep their JVM-sniffed values under deep=True
    assert (out[3]["width"], out[3]["height"]) == (12, 34)
    assert out[4] == {
        "media_type": "unknown", "width": None, "height": None, "duration_ms": None
    }


def test_attach_media_meta_shallow_leaves_variable_offset_fields_null(spark):
    df = spark.createDataFrame([(1, bytearray(_mp4()))], "id long, data binary")
    (row,) = multimodal.attach_media_meta(df).collect()
    meta = row["media_meta"].asDict()
    assert meta["media_type"] == "video"  # sniff is JVM-side either way
    assert meta["width"] is None and meta["duration_ms"] is None
