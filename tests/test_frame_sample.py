"""frame_sample's real demux paths: animated GIF (gif.decode_frames —
composition, disposal, transparency, even sampling, PNG re-encode) and
MJPEG AVI (avi.mjpeg_frames RIFF walk, verbatim JPEG payloads), plus the
byte-slice fallback for codec-bound containers and the fixed-offset AVI
branch of the JVM-side sniffer."""

from __future__ import annotations

import numpy as np
import pytest

from pathwaydataframework_spark.operators import avi, gif, jpeg, multimodal, png


def _animated_fixture(n=10):
    # frame i is a full-screen constant 20*i + 5
    return gif.encode_animated(
        [dict(img=np.full((6, 8, 3), 20 * i + 5, dtype=np.uint8)) for i in range(n)]
    )


def _mjpeg_fixture(n=6):
    frames = [
        jpeg.encode(np.full((16, 16, 3), 30 * i + 10, dtype=np.uint8), quality=95)
        for i in range(n)
    ]
    return avi.encode_mjpeg(frames, width=16, height=16, fps=5), frames


# -- kernels ------------------------------------------------------------------


def test_gif_count_frames_structural_walk():
    data = _animated_fixture(7)
    assert gif.count_frames(data) == 7
    assert gif.count_frames(gif.encode(np.zeros((3, 3, 3), np.uint8))) == 1


def test_avi_roundtrip_and_walk():
    data, frames = _mjpeg_fixture(4)
    out = avi.mjpeg_frames(data)
    assert out == frames  # verbatim payloads, order preserved
    with pytest.raises(ValueError, match="RIFF"):
        avi.mjpeg_frames(b"not an avi")


def test_avi_rec_sublist_and_alignment():
    # odd-sized frames force the word-alignment path; a 'rec ' LIST wraps
    # the chunks the way capture software does
    f1 = jpeg.encode(np.full((8, 8, 3), 50, np.uint8)) + b"\x00"  # make even? no: raw
    f1 = f1 if len(f1) % 2 == 1 else f1 + b"\xd9"  # ensure odd length
    import struct as s

    rec = avi._list(b"rec ", avi._chunk(b"00dc", f1))
    movi = avi._list(b"movi", rec)
    data = avi._chunk(b"RIFF", b"AVI " + movi)
    (out,) = avi.mjpeg_frames(data)
    assert out == f1


# -- frame_sample through Spark ----------------------------------------------


def test_frame_sample_animated_gif(spark):
    data = _animated_fixture(10)
    df = spark.createDataFrame(
        [(1, bytearray(data))], "media_id long, data binary"
    )
    rows = multimodal.frame_sample(df, n_frames=4).orderBy("frame_idx").collect()
    # 10 frames sampled at 4 evenly: original indices 0, 2, 5, 7
    assert [r["frame_idx"] for r in rows] == [0, 2, 5, 7]
    for r in rows:
        img = png.decode(bytes(r["frame_bytes"]))  # standalone PNG per frame
        assert img.shape == (6, 8, 3)
        assert (img == 20 * r["frame_idx"] + 5).all()


def test_frame_sample_mjpeg_avi(spark):
    data, frames = _mjpeg_fixture(6)
    df = spark.createDataFrame(
        [(7, bytearray(data))], "media_id long, data binary"
    )
    rows = multimodal.frame_sample(df, n_frames=3).orderBy("frame_idx").collect()
    assert [r["frame_idx"] for r in rows] == [0, 2, 4]
    for r in rows:
        assert bytes(r["frame_bytes"]) == frames[r["frame_idx"]]
        img = jpeg.decode(bytes(r["frame_bytes"]))
        assert img.shape == (16, 16, 3)


def test_frame_sample_fallback_slices_unknown(spark):
    blob = bytes(range(100)) * 4
    df = spark.createDataFrame([(3, bytearray(blob))], "media_id long, data binary")
    rows = multimodal.frame_sample(df, n_frames=4).orderBy("frame_idx").collect()
    assert len(rows) == 4  # stub path unchanged for codec-bound containers
    step = len(blob) // 4
    assert bytes(rows[1]["frame_bytes"]) == blob[step : 2 * step]


def test_fewer_frames_than_requested(spark):
    data = _animated_fixture(2)
    df = spark.createDataFrame([(1, bytearray(data))], "media_id long, data binary")
    rows = multimodal.frame_sample(df, n_frames=8).collect()
    assert len(rows) == 2  # never fabricates frames beyond the real count


# -- sniffer ------------------------------------------------------------------


def test_attach_media_meta_avi_fixed_offsets(spark):
    data, _ = _mjpeg_fixture(6)  # 6 frames @ 5 fps → 1200 ms
    df = spark.createDataFrame([(1, bytearray(data))], "media_id long, data binary")
    (row,) = multimodal.attach_media_meta(df).select("media_meta.*").collect()
    assert row["media_type"] == "video"
    assert row["width"] == 16 and row["height"] == 16
    assert row["duration_ms"] == 1200


# -- raw (BI_RGB) DIB AVI (r10) ------------------------------------------------


def _dib_fixture(n=5, shape=(6, 8)):
    h, w = shape
    frames = [np.full((h, w, 3), 25 * i + 5, dtype=np.uint8) for i in range(n)]
    return avi.encode_dib(frames, fps=10), frames


def test_avi_dib_roundtrip_and_format():
    from pathwaydataframework_spark.operators import bmp

    data, frames = _dib_fixture(4)
    fmt = avi.video_format(data)
    assert fmt == {"width": 8, "height": 6, "bpp": 24, "compression": 0}
    bmps = avi.dib_frames(data)
    assert len(bmps) == 4
    for blob, arr in zip(bmps, frames):
        assert bmp.is_bmp(blob)  # standalone BMP per frame
        assert (bmp.decode(blob) == arr).all()
    # an MJPEG stream is NOT raw — dib_frames stays empty, mjpeg path owns it
    mdata, _ = _mjpeg_fixture(2)
    assert avi.dib_frames(mdata) == []
    assert avi.video_format(mdata)["compression"] != 0
    with pytest.raises(ValueError, match="RIFF"):
        avi.dib_frames(b"not an avi")


def test_avi_dib_skips_truncated_frames():
    data, frames = _dib_fixture(3)
    # append a movi LIST holding a short foreign 00db chunk after the
    # real one: the demuxer must skip it (not crash, not emit a broken
    # BMP)
    movi_extra = avi._list(b"movi", avi._chunk(b"00db", b"\x01\x02"))
    body = data[12 : 8 + int.from_bytes(data[4:8], "little")]
    patched = avi._chunk(b"RIFF", b"AVI " + body + movi_extra)
    bmps = avi.dib_frames(patched)
    assert len(bmps) == 3  # the short chunk is dropped


def test_frame_sample_raw_dib_avi(spark):
    from pathwaydataframework_spark.operators import bmp

    data, frames = _dib_fixture(5)
    df = spark.createDataFrame(
        [(9, bytearray(data))], "media_id long, data binary"
    )
    rows = multimodal.frame_sample(df, n_frames=3).orderBy("frame_idx").collect()
    # 5 frames sampled at 3 evenly: original indices 0, 1, 3
    assert [r["frame_idx"] for r in rows] == [0, 1, 3]
    for r in rows:
        img = bmp.decode(bytes(r["frame_bytes"]))  # standalone BMP per frame
        assert img.shape == (6, 8, 3)
        assert (img == 25 * r["frame_idx"] + 5).all()


def test_image_frames_soi_lookalike_raw_stream_not_hijacked():
    """A raw BI_RGB frame can legitimately START with FF D8 (bottom-left
    pixel B=0xFF, G=0xD8) — the declared-compression dispatch must route
    it to the BMP wrap, never the MJPEG sniff (code-review r10)."""
    from pathwaydataframework_spark.operators import bmp

    arr = np.zeros((4, 4, 3), dtype=np.uint8)
    # bottom-left pixel, bottom-up BGR payload → chunk starts ff d8
    arr[3, 0] = (0, 0xD8, 0xFF)  # R, G, B
    data = avi.encode_dib([arr, arr], fps=5)
    # the payload really does look like a JPEG SOI to a 2-byte sniff
    assert avi.mjpeg_frames(data) != []
    # ...but the dispatch checks the declared compression first
    imgs = avi.image_frames(data)
    assert len(imgs) == 2
    for blob in imgs:
        assert bmp.is_bmp(blob)
        assert (bmp.decode(blob) == arr).all()
    # declared-MJPG and headerless streams still take the JPEG path
    mdata, mframes = _mjpeg_fixture(2)
    assert avi.image_frames(mdata) == mframes
    movi = avi._list(b"movi", avi._chunk(b"00dc", mframes[0]))
    headerless = avi._chunk(b"RIFF", b"AVI " + movi)
    assert avi.image_frames(headerless) == [mframes[0]]


def test_dib_frames_rejects_hostile_dimensions():
    """w<=0 / h==0 / odd bit depths in the strf must yield NO frames —
    a non-positive expected frame size would otherwise let every
    foreign chunk masquerade as a decodable BMP (code-review r10)."""
    import struct as s

    data, _ = _dib_fixture(2)

    def patch_strf(w, h, bpp):
        # rebuild the fixture with a corrupted BITMAPINFOHEADER
        strf = s.pack("<IiiHHIIiiII", 40, w, h, 1, bpp, 0, 0, 0, 0, 0, 0)
        strh = (b"vids" + b"DIB " + s.pack("<IHHIIIIIIIII", *([0] * 12))
                + s.pack("<4H", 0, 0, 8, 6))
        hdrl = avi._list(b"hdrl", avi._list(
            b"strl", avi._chunk(b"strh", strh) + avi._chunk(b"strf", strf)))
        movi = avi._list(b"movi", avi._chunk(b"00db", b"\x01\x02\x03\x04"))
        return avi._chunk(b"RIFF", b"AVI " + hdrl + movi)

    assert avi.dib_frames(patch_strf(0, 6, 24)) == []
    assert avi.dib_frames(patch_strf(-8, 6, 24)) == []
    assert avi.dib_frames(patch_strf(8, 0, 24)) == []
    assert avi.dib_frames(patch_strf(8, 6, 7)) == []
    # the healthy fixture still demuxes
    assert len(avi.dib_frames(data)) == 2

def test_avi_rle8_roundtrip_and_dispatch(spark):
    """A BI_RLE8 AVI (compression=1, palette in the strf tail) demuxes
    through the same DIB wrap as BI_RGB: dib_frames/image_frames emit
    standalone RLE BMPs the bmp.py kernel decodes back to the exact
    palette pixels, video_format reports the declared compression, and
    frame_sample samples real decodable frames — the r10 raw-AVI path
    extended to the run-length form (VERDICT r10 item 8)."""
    from pathwaydataframework_spark.operators import bmp

    pal = [(0, 0, 0), (255, 0, 0), (0, 200, 0), (30, 40, 50)]
    rng = np.random.RandomState(3)
    frames = [
        rng.randint(0, len(pal), size=(6, 9)).astype(np.uint8)
        for _ in range(4)
    ]
    data = avi.encode_rle8(frames, pal, fps=10)
    assert avi.video_format(data) == {
        "width": 9, "height": 6, "bpp": 8, "compression": 1,
    }
    table = np.array(pal, dtype=np.uint8)
    bmps = avi.dib_frames(data)
    assert len(bmps) == 4
    for blob, idx in zip(bmps, frames):
        assert bmp.is_bmp(blob)
        assert (bmp.decode(blob) == table[idx.astype(int)]).all()
    # the declared-compression dispatch routes RLE to the BMP wrap too
    assert avi.image_frames(data) == bmps
    # frame_sample emits the wrapped RLE BMPs as real frames
    df = spark.createDataFrame(
        [(5, bytearray(data))], "media_id long, data binary"
    )
    rows = (
        multimodal.frame_sample(df, n_frames=2).orderBy("frame_idx").collect()
    )
    assert [r["frame_idx"] for r in rows] == [0, 2]
    for r in rows:
        got = bmp.decode(bytes(r["frame_bytes"]))
        assert (got == table[frames[r["frame_idx"]].astype(int)]).all()


def test_avi_rle8_hostile_headers_and_short_chunks():
    """RLE streams get the same hostility guards as BI_RGB: a strf
    declaring RLE8 at a non-8 bit depth (or w<=0 / top-down h<0) yields
    no frames, and a sub-2-byte chunk (shorter than the end-of-bitmap
    escape) is skipped rather than wrapped."""
    import struct as s

    pal = [(0, 0, 0), (9, 9, 9)]
    idx = np.zeros((3, 4), dtype=np.uint8)
    data = avi.encode_rle8([idx, idx], pal, fps=5)

    def patched(w=None, h=None, bpp=None):
        blob = bytearray(data)
        off = blob.index(b"strf") + 8  # strf payload = BITMAPINFOHEADER
        if w is not None:
            s.pack_into("<i", blob, off + 4, w)
        if h is not None:
            s.pack_into("<i", blob, off + 8, h)
        if bpp is not None:
            s.pack_into("<H", blob, off + 14, bpp)
        return bytes(blob)

    assert len(avi.dib_frames(data)) == 2  # baseline: intact file demuxes
    assert avi.dib_frames(patched(bpp=4)) == []   # RLE8 must be 8-bit
    assert avi.dib_frames(patched(w=0)) == []
    assert avi.dib_frames(patched(w=-4)) == []
    assert avi.dib_frames(patched(h=-3)) == []    # top-down RLE forbidden
    # a 1-byte chunk can't even hold the end-of-bitmap escape — skipped
    movi_extra = avi._list(b"movi", avi._chunk(b"00dc", b"\x00"))
    body = data[12 : 8 + int.from_bytes(data[4:8], "little")]
    patched_tree = avi._chunk(b"RIFF", b"AVI " + body + movi_extra)
    assert len(avi.dib_frames(patched_tree)) == 2

def test_avi_bitfields_dib_stream_wraps_and_decodes():
    """A BI_BITFIELDS DIB stream (compression=3, 16-bit R5G6B5 with the
    channel masks in the strf tail) wraps into standalone BMPs whose
    masks land at byte 54 — exactly where the bmp.py kernel reads them —
    and decodes to the mask-scaled RGB the kernel's _from_masks math
    defines."""
    import struct as s

    from pathwaydataframework_spark.operators import bmp

    w, h = 3, 2
    # R5G6B5 pixels, chosen so each 5/6-bit channel scales exactly:
    # 0xF800 = pure red, 0x07E0 = pure green, 0x001F = pure blue
    lines = [  # bottom-up storage order
        [0xF800, 0x07E0, 0x001F],
        [0x0000, 0xFFFF, 0xF81F],
    ]
    row_bytes = (w * 16 + 31) // 32 * 4  # 8: 6 px bytes + 2 pad
    payload = b"".join(
        b"".join(s.pack("<H", p) for p in row) + b"\x00" * (row_bytes - w * 2)
        for row in lines
    )
    strf = s.pack(
        "<IiiHHIIiiII", 40, w, h, 1, 16, 3, len(payload), 0, 0, 0, 0
    ) + s.pack("<III", 0xF800, 0x07E0, 0x001F)
    strh = b"vids" + b"\x00" * 52
    hdrl = avi._list(
        b"hdrl",
        avi._chunk(b"avih", b"\x00" * 56)
        + avi._list(b"strl", avi._chunk(b"strh", strh)
                    + avi._chunk(b"strf", strf)),
    )
    movi = avi._list(b"movi", avi._chunk(b"00db", payload))
    data = avi._chunk(b"RIFF", b"AVI " + hdrl + movi)
    assert avi.video_format(data)["compression"] == 3
    (blob,) = avi.dib_frames(data)
    assert avi.image_frames(data) == [blob]
    got = bmp.decode(blob)
    # top row = line 1 (bottom-up flip)
    expect = np.array(
        [
            [[0, 0, 0], [255, 255, 255], [255, 0, 255]],
            [[255, 0, 0], [0, 255, 0], [0, 0, 255]],
        ],
        dtype=np.uint8,
    )
    assert (got == expect).all()
    # a masks-less BITFIELDS strf (40 bytes, nothing at the tail) or an
    # unsupported depth yields no frames instead of a broken wrap
    bad = bytearray(data)
    off = bad.index(b"strf") + 8
    s.pack_into("<H", bad, off + 14, 24)  # bpp 24 under BITFIELDS
    assert avi.dib_frames(bytes(bad)) == []
