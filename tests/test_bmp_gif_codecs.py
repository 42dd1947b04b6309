"""BMP + GIF codec tests (operators/bmp.py, operators/gif.py) — the
last two common corpus image formats behind decode_image.  Mirrors
test_png_codec.py: roundtrip, hand-built streams vs known pixels,
third-party-file decode (including a cross-format consistency check:
the same logo shipped as BMP and GIF must decode to near-identical
pixels through two fully independent code paths), and integration
through decode_image / image_dhash / resize_images."""

from __future__ import annotations

import os
import struct

import numpy as np
import pytest

from pathwaydataframework_spark.operators import bmp, gif, multimodal

_IMGHDR = (
    "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
    "test/imghdrdata/"
)


# -- BMP ----------------------------------------------------------------------


def test_bmp_roundtrip_lossless():
    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (13, 21)]:  # widths straddle 4-byte padding
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        dec = bmp.decode(bmp.encode(img))
        assert dec.shape == img.shape
        assert (dec == img).all()


def test_bmp_top_down_vs_bottom_up():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    img[0] = [255, 0, 0]  # top row red
    data = bytearray(bmp.encode(img))
    # flip biHeight to negative (top-down) without touching pixel data:
    # the same bytes must now decode vertically mirrored
    struct.pack_into("<i", data, 22, -2)
    flipped = bmp.decode(bytes(data))
    assert (flipped == img[::-1]).all()


def test_bmp_8bit_palette_hand_built():
    # 3×2 8-bit palette image, hand-assembled: rows padded to 4 bytes,
    # bottom-up, palette entries stored BGRX
    pal = [(10, 20, 30), (200, 100, 0), (0, 0, 255), (1, 2, 3)]
    idx = np.array([[0, 1, 2], [3, 0, 1]], dtype=np.uint8)
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    rows = b""  # bottom-up: last row first, 3 px + 1 pad byte
    for y in (1, 0):
        rows += bytes(idx[y]) + b"\x00"
    pix_off = 14 + 40 + len(pal_bytes)
    data = (
        struct.pack("<2sIHHI", b"BM", pix_off + len(rows), 0, 0, pix_off)
        + struct.pack("<IiiHHIIiiII", 40, 3, 2, 1, 8, 0, len(rows), 0, 0, 4, 0)
        + pal_bytes
        + rows
    )
    expect = np.array(pal, dtype=np.uint8)[idx.astype(int)]
    assert (bmp.decode(data) == expect).all()


def test_bmp_16bit_555_scales_channels():
    # one pixel, X1R5G5B5: r=31 g=0 b=16 → 255, 0, 131 (16*255//31)
    v = (31 << 10) | (0 << 5) | 16
    rows = struct.pack("<H", v) + b"\x00\x00"  # padded to 4
    data = (
        struct.pack("<2sIHHI", b"BM", 14 + 40 + 4, 0, 0, 54)
        + struct.pack("<IiiHHIIiiII", 40, 1, 1, 1, 16, 0, 4, 0, 0, 0, 0)
        + rows
    )
    assert (bmp.decode(data)[0, 0] == [255, 0, 16 * 255 // 31]).all()


def test_bmp_rejects_embedded_streams_and_garbage():
    img = np.zeros((2, 2, 3), dtype=np.uint8)
    data = bytearray(bmp.encode(img))
    struct.pack_into("<I", data, 30, 4)  # biCompression = BI_JPEG (embedded)
    with pytest.raises(ValueError, match="compression"):
        bmp.decode(bytes(data))
    # RLE declared on a header whose bit depth the spec forbids
    struct.pack_into("<I", data, 30, 1)  # BI_RLE8 on a 24-bit header
    with pytest.raises(ValueError, match="BI_RLE8 requires"):
        bmp.decode(bytes(data))
    with pytest.raises(ValueError, match="signature|truncated"):
        bmp.decode(b"not a bmp")


def _rle_bmp(w, h, bits, compression, pal, stream, clr_used=None):
    """Hand-assemble a standalone RLE BMP around a raw pixel stream."""
    pal_bytes = b"".join(bytes([b, g, r, 0]) for r, g, b in pal)
    pix_off = 14 + 40 + len(pal_bytes)
    n_colors = len(pal) if clr_used is None else clr_used
    return (
        struct.pack("<2sIHHI", b"BM", pix_off + len(stream), 0, 0, pix_off)
        + struct.pack(
            "<IiiHHIIiiII", 40, w, h, 1, bits, compression, len(stream),
            0, 0, n_colors, 0,
        )
        + pal_bytes
        + stream
    )


def test_bmp_rle8_forward_math_golden():
    """Hand-written BI_RLE8 stream exercising every construct the public
    spec defines — encoded run, absolute mode (odd count ⇒ pad byte),
    end-of-line (rest of row ⇒ index 0), delta (dx right, dy UP in
    bottom-up space; skipped pixels ⇒ index 0), end-of-bitmap — against
    a pixel grid derived BY HAND from the spec."""
    pal = [(10, 20, 30), (200, 100, 0), (0, 0, 255), (7, 8, 9)]
    stream = (
        b"\x03\x01"                  # line0: run 3 × idx1        x0-2
        + b"\x00\x03\x02\x00\x02\x00"  # abs 3: 2,0,2 (+pad)      x3-5
        + b"\x00\x00"                # end of line → line1
        + b"\x02\x03"                # line1: run 2 × idx3        x0-1
        + b"\x00\x02\x02\x01"        # delta dx=2 dy=1 → x4, line2
        + b"\x02\x02"                # line2: run 2 × idx2        x4-5
        + b"\x00\x00"                # end of line → line3
        + b"\x04\x03"                # line3: run 4 × idx3        x0-3
        + b"\x00\x01"                # end of bitmap (x4-5 stay 0)
    )
    got = bmp.decode(_rle_bmp(6, 4, 8, 1, pal, stream))
    lines = np.array(  # bottom-up line order, as the stream writes them
        [
            [1, 1, 1, 2, 0, 2],
            [3, 3, 0, 0, 0, 0],
            [0, 0, 0, 0, 2, 2],
            [3, 3, 3, 3, 0, 0],
        ],
        dtype=np.int64,
    )
    expect = np.array(pal, dtype=np.uint8)[lines[::-1]]  # flip to top-down
    assert (got == expect).all()


def test_bmp_rle4_forward_math_golden():
    """BI_RLE4: encoded runs alternate the byte's high/low nibbles;
    absolute mode packs two pixels per byte padded to a 2-byte
    boundary."""
    pal = [(9, 9, 9), (50, 60, 70), (200, 210, 220)]
    stream = (
        b"\x04\x12"          # line0: 1,2,1,2                     x0-3
        + b"\x00\x03\x01\x20"  # abs 3 nibbles: 0,1,2 (2 bytes, even)
        + b"\x00\x00"        # end of line → line1
        + b"\x07\x21"        # line1: 2,1,2,1,2,1,2               x0-6
        + b"\x00\x01"        # end of bitmap
    )
    got = bmp.decode(_rle_bmp(7, 2, 4, 2, pal, stream))
    lines = np.array(
        [[1, 2, 1, 2, 0, 1, 2], [2, 1, 2, 1, 2, 1, 2]], dtype=np.int64
    )
    expect = np.array(pal, dtype=np.uint8)[lines[::-1]]
    assert (got == expect).all()


def test_bmp_rle_hostile_streams_rejected():
    """Hostile RLE input raises instead of writing out of bounds: a run
    past the row, a truncated stream (no end-of-bitmap), a delta
    leaving the bitmap, and top-down RLE (forbidden by the spec)."""
    pal = [(0, 0, 0), (255, 255, 255)]
    with pytest.raises(ValueError, match="exceeds bitmap bounds"):
        bmp.decode(_rle_bmp(6, 2, 8, 1, pal, b"\x07\x01\x00\x01"))
    with pytest.raises(ValueError, match="truncated RLE"):
        bmp.decode(_rle_bmp(6, 2, 8, 1, pal, b"\x02\x01"))
    with pytest.raises(ValueError, match="delta exceeds"):
        bmp.decode(_rle_bmp(6, 2, 8, 1, pal, b"\x00\x02\xff\xff\x00\x01"))
    blob = bytearray(_rle_bmp(6, 2, 8, 1, pal, b"\x00\x01"))
    struct.pack_into("<i", blob, 22, -2)  # biHeight < 0: top-down
    with pytest.raises(ValueError, match="top-down"):
        bmp.decode(bytes(blob))
    # an RLE4 declared on an 8-bit header is rejected before any decode
    with pytest.raises(ValueError, match="BI_RLE4 requires"):
        bmp.decode(_rle_bmp(6, 2, 8, 2, pal, b"\x00\x01"))


def test_bmp_rle8_encode_roundtrip():
    """encode_rle8 → decode is lossless for any palette image, and the
    compressor's output replays through the golden-path decoder (pure
    encoded runs, EOL per row, EOB last)."""
    rng = np.random.RandomState(7)
    idx = rng.randint(0, 5, size=(13, 11)).astype(np.uint8)
    pal = [(0, 0, 0), (255, 0, 0), (0, 255, 0), (0, 0, 255), (40, 50, 60)]
    blob = bmp.encode_rle8(idx, pal)
    assert (bmp.decode(blob) == np.array(pal, dtype=np.uint8)[
        idx.astype(int)
    ]).all()
    # a long constant row compresses to runs of <=255
    wide = np.full((1, 700), 3, dtype=np.uint8)
    stream = bmp.rle8_compress(wide)
    assert stream == b"\xff\x03\xff\x03\xbe\x03\x00\x01"
    assert (
        bmp.decode(bmp.encode_rle8(wide, pal))
        == np.array(pal, dtype=np.uint8)[wide.astype(int)]
    ).all()


# -- GIF ----------------------------------------------------------------------


def test_gif_roundtrip_small_palette():
    img = np.zeros((10, 13, 3), dtype=np.uint8)
    img[::2, :, 0] = 255
    img[:, ::3, 1] = 128
    dec = gif.decode(gif.encode(img))
    assert dec.shape == img.shape
    assert (dec == img).all()


def test_gif_roundtrip_256_colors_crosses_code_widths():
    # 90k pixels over a full 256-color palette forces the LZW code width
    # through 9→12 bits and past a 4096-entry table reset — decoder and
    # encoder must agree on the boundary rule or pixels shear
    rng = np.random.default_rng(5)
    pal = np.unique(rng.integers(0, 256, (256, 3), dtype=np.uint8), axis=0)
    img = pal[rng.integers(0, len(pal), (300, 300))]
    assert (gif.decode(gif.encode(img)) == img).all()


def test_gif_interlaced_rows_reordered():
    # hand-build an interlaced stream: rows are stored in 4-pass order
    img = np.zeros((8, 2, 3), dtype=np.uint8)
    img[:, :, 0] = np.arange(8)[:, None] * 30  # row y has red = 30y
    plain = gif.encode(img)
    # re-encode by permuting rows into pass order and setting the flag
    pass_order = [0, 4, 2, 6, 1, 3, 5, 7]
    permuted = gif.encode(img[pass_order])
    data = bytearray(permuted)
    # image descriptor follows 6+7 header + 3*palette; find 0x2C marker
    i = data.index(0x2C, 13)
    data[i + 9] |= 0x40  # packed field: interlace flag
    assert (gif.decode(bytes(data)) == img).all()
    assert (gif.decode(plain) == img).all()


def test_gif_transparent_index_takes_backdrop():
    # 89a graphic-control extension: transparent pixels render as the
    # background color, not the palette entry
    img = np.array([[[255, 0, 0], [0, 255, 0]]], dtype=np.uint8)
    data = bytearray(gif.encode(img))
    # find the palette index of red (encoder sorts colors lexicographically)
    colors = np.unique(img.reshape(-1, 3), axis=0)
    red_idx = int(np.where((colors == [255, 0, 0]).all(axis=1))[0][0])
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, red_idx, 0])
    i = bytes(data).index(0x2C, 13)
    data[i:i] = gce
    out = gif.decode(bytes(data))
    # background index 0 → first palette color = green (lexicographic)
    assert (out[0, 0] == colors[0]).all()  # red pixel replaced by backdrop
    assert (out[0, 1] == [0, 255, 0]).all()


def test_gif_rejects_garbage():
    with pytest.raises(ValueError, match="signature"):
        gif.decode(b"not a gif")
    with pytest.raises(ValueError, match="truncated|image"):
        gif.decode(b"GIF89a" + struct.pack("<HHBBB", 2, 2, 0, 0, 0))


# -- third-party + integration ------------------------------------------------


def test_decode_third_party_files_and_cross_format_consistency():
    pb, pg = _IMGHDR + "python.bmp", _IMGHDR + "python.gif"
    if not (os.path.exists(pb) and os.path.exists(pg)):
        pytest.skip("no third-party bmp/gif available")
    b = bmp.decode(open(pb, "rb").read()).astype(int)
    g = gif.decode(open(pg, "rb").read()).astype(int)
    assert b.shape == g.shape == (16, 16, 3)
    # same logo through two independent decoders: palette quantization
    # apart, pixels must agree
    assert np.abs(b - g).mean() < 10
    assert np.corrcoef(b.ravel(), g.ravel())[0, 1] > 0.9


def test_decode_image_dispatch_and_dhash():
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[..., 0] = np.tile(np.linspace(0, 255, 32).astype(np.uint8), (32, 1))
    img[..., 2] = 77
    h_ppm = multimodal.image_dhash(multimodal._ppm_encode(img))
    assert multimodal.image_dhash(bmp.encode(img)) == h_ppm  # lossless
    assert multimodal.image_dhash(gif.encode(img)) == h_ppm  # ≤256 colors


def test_resize_images_bmp_gif_branches(spark):
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:, :] = 200
    df = spark.createDataFrame(
        [
            (1, bytearray(bmp.encode(img))),
            (2, bytearray(gif.encode(img))),
        ],
        "media_id long, data binary",
    )
    rows = {
        r["media_id"]: bytes(r["resized"])
        for r in multimodal.resize_images(df, width=8, height=8).collect()
    }
    out_b = bmp.decode(rows[1])  # format preserved: BMP in, BMP out
    out_g = gif.decode(rows[2])
    for out in (out_b, out_g):
        assert out.shape == (8, 8, 3)
        assert (out[:, :4] == 0).all() and (out[:, 4:] == 200).all()
    assert bmp.is_bmp(rows[1]) and gif.is_gif(rows[2])
