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
        "bmp_rle8": (
            bmp.encode_rle8(
                (img[..., 0] // 32).astype(np.uint8),
                [(i * 36, 255 - i * 36, i) for i in range(8)],
            ),
            bmp.decode,
        ),
        "avi_rle8": (
            avi.encode_rle8(
                [(img[..., 0] // 32).astype(np.uint8)] * 2,
                [(i * 36, 255 - i * 36, i) for i in range(8)],
            ),
            avi.dib_frames,
        ),
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

def test_rle_random_streams_never_escape_valueerror():
    """Arbitrary bytes as an RLE pixel stream (the part an attacker
    controls in a wrapped AVI frame) must decode or raise ValueError —
    never IndexError/OverflowError/numpy bounds errors; and whenever a
    random stream DOES decode, every emitted index must stay inside the
    palette (the guard runs before the table lookup)."""
    import struct as s

    pal_n = 4
    pal_bytes = b"".join(bytes([i, i, i, 0]) for i in range(pal_n))
    pix_off = 14 + 40 + len(pal_bytes)

    def wrap(stream, compression, bits, w=8, h=6):
        return (
            s.pack("<2sIHHI", b"BM", pix_off + len(stream), 0, 0, pix_off)
            + s.pack("<IiiHHIIiiII", 40, w, h, 1, bits, compression,
                     len(stream), 0, 0, pal_n, 0)
            + pal_bytes
            + stream
        )

    rng = np.random.default_rng(7)
    decoded = rejected = 0
    for trial in range(400):
        if trial % 2 == 0:
            # pure random bytes: overwhelmingly rejected
            n = int(rng.integers(0, 40))
            stream = bytearray(rng.integers(0, 256, n, dtype=np.uint8))
        else:
            # structured-random: valid-ish opcode soup (small runs,
            # EOLs, absolute runs, deltas) closed by EOB...
            stream = bytearray()
            for _ in range(int(rng.integers(0, 10))):
                op = int(rng.integers(0, 4))
                if op == 0:
                    stream += bytes(
                        (int(rng.integers(1, 5)), int(rng.integers(0, 4)))
                    )
                elif op == 1:
                    stream += b"\x00\x00"  # end of line
                elif op == 2:  # absolute run of 3 (+ pad)
                    stream += bytes(
                        (0, 3) + tuple(rng.integers(0, 4, 3)) + (0,)
                    )
                else:  # small delta
                    stream += bytes(
                        (0, 2, int(rng.integers(0, 3)),
                         int(rng.integers(0, 2)))
                    )
            stream += b"\x00\x01"
            if trial % 4 == 3 and len(stream) > 2:
                # ...half of those get one corrupted byte
                stream[int(rng.integers(0, len(stream)))] = int(
                    rng.integers(0, 256)
                )
        for compression, bits in ((1, 8), (2, 4)):
            try:
                out = bmp.decode(wrap(bytes(stream), compression, bits))
            except ValueError:
                rejected += 1
                continue
            decoded += 1
            assert out.shape == (6, 8, 3)
    # the property must have exercised BOTH the accept and reject paths
    assert decoded > 0 and rejected > 0


def test_flac_structured_random_roundtrip():
    """r12 FLAC property (the structured-random RLE pattern): seeded-RNG
    signals across lengths, channel counts, block sizes and every
    encoder knob roundtrip bit-exactly; a quarter of trials then get a
    random byte corrupted and must decode-or-ValueError, never crash.
    Exercises partial trailing blocks, CONSTANT runs, both Rice
    methods, partitions, escapes, wasted bits and all stereo modes
    under arbitrary data rather than the fixed fixtures."""
    import numpy as np

    from pathwaydataframework_spark.operators import flac

    rng = np.random.default_rng(1207)
    decoded = rejected = 0
    stereo_modes = [None, "mid_side", "left_side", "right_side"]
    for trial in range(40):
        n = int(rng.integers(0, 3000))
        ch = int(rng.integers(1, 3))
        x = rng.integers(-32768, 32768, (n, ch), dtype=np.int64).astype(
            np.int32
        )
        if trial % 5 == 0 and n:
            x[: n // 2] = int(rng.integers(-5, 5))  # constant runs
        if trial % 7 == 0:
            x = (x // 8) * 8  # shared low zero bits
        kw = dict(
            block_size=int(rng.choice([64, 256, 1024])),
            force=[None, "verbatim", "lpc"][int(rng.integers(0, 3))],
            rice2=bool(rng.integers(0, 2)),
            partition_order=0,
            auto_wasted=bool(rng.integers(0, 2)),
        )
        if rng.integers(0, 2) and kw["block_size"] >= 256:
            kw["partition_order"] = int(rng.integers(0, 3))
        if rng.integers(0, 4) == 0:
            kw["escape_bits"] = 17
        if ch == 2:
            kw["stereo"] = stereo_modes[int(rng.integers(0, 4))]
        try:
            enc = flac.encode(x, **kw)
        except ValueError:
            continue  # partition order vs short final block: fail-fast
        y, _, _ = flac.decode(enc)
        assert np.array_equal(y, x), (trial, kw)
        decoded += 1
        if trial % 4 == 0 and len(enc) > 50:
            mut = bytearray(enc)
            mut[int(rng.integers(0, len(mut)))] ^= int(
                rng.integers(1, 256)
            )
            try:
                flac.decode(bytes(mut))
            except ValueError:
                rejected += 1
    assert decoded > 25 and rejected > 0
