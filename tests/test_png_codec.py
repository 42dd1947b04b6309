"""Baseline PNG codec tests (operators/png.py) — closes deviation #5's
PNG half: stdlib-zlib decode kernel behind the existing multimodal
plumbing.  Mirrors test_jpeg_codec.py's structure: roundtrip, hand-built
filtered streams vs known pixels, golden-bytes pin, third-party-file
decode, and integration through decode_image / image_dhash /
resize_images."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from pathwaydataframework_spark.operators import multimodal, png


def _chunk(ctype: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + ctype
        + payload
        + struct.pack(">I", zlib.crc32(ctype + payload) & 0xFFFFFFFF)
    )


def _build(ihdr_fields, *chunks) -> bytes:
    out = b"\x89PNG\r\n\x1a\n" + _chunk(
        b"IHDR", struct.pack(">IIBBBBB", *ihdr_fields)
    )
    for ctype, payload in chunks:
        out += _chunk(ctype, payload)
    return out + _chunk(b"IEND", b"")


def _forward_filter(arr: np.ndarray, ftypes) -> bytes:
    """Apply PNG filters 0-4 FORWARD (independent reference math) so the
    decoder's unfilter is checked against spec arithmetic, not itself."""
    h, w, _ = arr.shape
    raw = arr.reshape(h, w * 3).astype(np.int64)
    out = bytearray()
    prev = np.zeros(w * 3, dtype=np.int64)
    for y, ft in zip(range(h), ftypes):
        cur = raw[y]
        out.append(ft)
        for x in range(w * 3):
            a = int(cur[x - 3]) if x >= 3 else 0
            b = int(prev[x])
            c = int(prev[x - 3]) if x >= 3 else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
            out.append((int(cur[x]) - pred) & 0xFF)
        prev = cur
    return bytes(out)


def test_roundtrip_lossless():
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, (13, 9, 3), dtype=np.uint8)
    dec = png.decode(png.encode(img))
    assert dec.shape == img.shape
    assert (dec == img).all()  # PNG is lossless — exact equality


def test_unfilter_all_five_types_vs_forward_math():
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (5, 7, 3), dtype=np.uint8)
    for fts in [(0, 1, 2, 3, 4), (4, 4, 4, 4, 4), (3, 1, 4, 2, 0)]:
        data = _build(
            (7, 5, 8, 2, 0, 0, 0),
            (b"IDAT", zlib.compress(_forward_filter(img, fts))),
        )
        assert (png.decode(data) == img).all(), f"filter set {fts}"


def test_grayscale_8bit_replicates_channels():
    rng = np.random.default_rng(1)
    g = rng.integers(0, 256, (6, 6), dtype=np.uint8)
    raw = b"".join(b"\x00" + g[y].tobytes() for y in range(6))
    data = _build((6, 6, 8, 0, 0, 0, 0), (b"IDAT", zlib.compress(raw)))
    dec = png.decode(data)
    assert (dec[..., 0] == g).all() and (dec[..., 1] == g).all()


def test_palette_4bit_odd_width():
    plte = np.array(
        [[255, 0, 0], [0, 255, 0], [0, 0, 255], [10, 20, 30]], dtype=np.uint8
    )
    idx = np.array([[0, 1, 2, 3, 0], [3, 2, 1, 0, 1]], dtype=np.uint8)
    packed = bytearray()
    for y in range(2):
        packed.append(0)
        r = idx[y]
        packed.extend(
            [(r[0] << 4) | r[1], (r[2] << 4) | r[3], r[4] << 4]
        )  # 5 px → 3 bytes, low nibble padded
    data = _build(
        (5, 2, 4, 3, 0, 0, 0),
        (b"PLTE", plte.tobytes()),
        (b"IDAT", zlib.compress(bytes(packed))),
    )
    assert (png.decode(data) == plte[idx]).all()


def test_16bit_rgb_keeps_high_byte():
    rng = np.random.default_rng(2)
    hi = rng.integers(0, 256, (3, 4, 3), dtype=np.uint8)
    s16 = (hi.astype(np.uint16) << 8) | 0x7F
    raw = b"".join(b"\x00" + s16[y].astype(">u2").tobytes() for y in range(3))
    data = _build((4, 3, 16, 2, 0, 0, 0), (b"IDAT", zlib.compress(raw)))
    assert (png.decode(data) == hi).all()


def test_rgba_drops_alpha():
    rng = np.random.default_rng(4)
    rgba = rng.integers(0, 256, (4, 4, 4), dtype=np.uint8)
    raw = b"".join(b"\x00" + rgba[y].tobytes() for y in range(4))
    data = _build((4, 4, 8, 6, 0, 0, 0), (b"IDAT", zlib.compress(raw)))
    assert (png.decode(data) == rgba[..., :3]).all()


def test_1bit_gray_scales_to_full_range():
    packed = bytes([0, 0b10101010, 0b10000000])  # 9 px wide, 1 row
    data = _build((9, 1, 1, 0, 0, 0, 0), (b"IDAT", zlib.compress(packed)))
    dec = png.decode(data)
    expect = np.array([1, 0, 1, 0, 1, 0, 1, 0, 1]) * 255
    assert (dec[0, :, 0] == expect).all()


def test_golden_fixed_bytes_decode():
    # kernel-vs-precomputed-pixels pin: this exact byte string must keep
    # decoding to this exact pixel block (mirrors
    # test_jpeg_codec.test_golden_fixed_bytes_decode).
    img = np.array(
        [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [255, 255, 255]]],
        dtype=np.uint8,
    )
    data = png.encode(img)
    assert (png.decode(data) == img).all()
    # byte-level determinism of the encoder (same array → same file)
    assert data == png.encode(img)
    # frozen prefix: signature + IHDR for a 2×2 8-bit truecolor image
    assert data[:33] == bytes.fromhex(
        "89504e470d0a1a0a0000000d49484452000000020000000208020000"
        "00fdd49a73"
    )


def test_rejects_garbage_and_bad_crc():
    with pytest.raises(ValueError, match="signature"):
        png.decode(b"not a png")
    good = bytearray(png.encode(np.zeros((3, 3, 3), dtype=np.uint8)))
    good[-20] ^= 0xFF
    with pytest.raises(ValueError, match="CRC|truncated"):
        png.decode(bytes(good))


def test_adam7_roundtrip_matches_plain():
    rng = np.random.default_rng(11)
    # sizes straddling the 8×8 lattice: tiny (most passes empty), odd,
    # exact-multiple, and sub-8 in one dimension
    for h, w in [(1, 1), (3, 5), (8, 8), (13, 21), (7, 40)]:
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        data = png.encode(img, interlace=True)
        # IHDR carries interlace_method=1
        assert data[28] == 1
        dec = png.decode(data)
        assert dec.shape == img.shape
        assert (dec == img).all(), (h, w)
        assert (png.decode(png.encode(img)) == dec).all()


def test_adam7_per_pass_filters_vs_forward_math():
    # hand-build an interlaced stream where every pass uses non-zero
    # filter types; filter state must reset per pass (spec: each pass is
    # filtered as an independent image)
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (10, 11, 3), dtype=np.uint8)
    parts = []
    for i, (x0, y0, dx, dy) in enumerate(png._ADAM7):
        sub = np.ascontiguousarray(img[y0::dy, x0::dx])
        if sub.size == 0:
            continue
        fts = [(i + 1 + y) % 5 for y in range(sub.shape[0])]
        parts.append(_forward_filter(sub, fts))
    data = _build(
        (11, 10, 8, 2, 0, 0, 1), (b"IDAT", zlib.compress(b"".join(parts)))
    )
    assert (png.decode(data) == img).all()


def test_decode_real_third_party_png_if_present():
    # convention check against files no code in this repo produced
    import os

    candidates = [
        "/mnt/sandboxing/model_tools_env/v1/python/install/lib/python3.11/"
        "test/imghdrdata/python.png",
    ]
    path = next((p for p in candidates if os.path.exists(p)), None)
    if path is None:
        pytest.skip("no third-party png available")
    img = png.decode(open(path, "rb").read())
    assert img.shape == (16, 16, 3)
    assert 0 < img.mean() < 255


def test_image_dhash_png_matches_ppm():
    img = np.zeros((32, 32, 3), dtype=np.uint8)
    img[..., 0] = np.tile(np.linspace(0, 255, 32).astype(np.uint8), (32, 1))
    img[..., 1] = np.tile(
        np.linspace(0, 255, 32).astype(np.uint8)[:, None], (1, 32)
    )
    img[..., 2] = 128
    h_ppm = multimodal.image_dhash(multimodal._ppm_encode(img))
    h_png = multimodal.image_dhash(png.encode(img))
    assert h_ppm is not None
    # lossless codec: the perceptual hash is bit-identical, not just close
    assert h_png == h_ppm


def test_resize_images_png_branch(spark):
    img = np.zeros((16, 16, 3), dtype=np.uint8)
    img[:, 8:, :] = 200
    df = spark.createDataFrame(
        [(1, bytearray(png.encode(img)))], "media_id long, data binary"
    )
    (row,) = multimodal.resize_images(df, width=8, height=8).collect()
    out = png.decode(bytes(row["resized"]))  # format preserved: PNG in, PNG out
    assert out.shape == (8, 8, 3)
    assert (out[:, :4] == 0).all() and (out[:, 4:] == 200).all()
