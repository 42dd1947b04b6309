"""FLAC codec (r12): roundtrip every decoder branch, cross-codec
fingerprint identity vs WAV, fixed-offset STREAMINFO sniffing, and
malformed-input robustness (CRC gates + byte-mutation fuzz)."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pathwaydataframework_spark.operators import flac


def _sig(n, ch=1, stride=37):
    x = np.array(
        [((i * stride + c * 11) % 4096) - 2048 for i in range(n) for c in range(ch)],
        dtype=np.int32,
    )
    return x.reshape(n, ch) if n else np.zeros((0, ch), np.int32)


def _wav(samples):
    x = np.asarray(samples, dtype=np.int16).reshape(-1)
    payload = struct.pack(f"<{x.size}h", *x.tolist())
    return (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 16000, 2, 16)
        + b"data" + struct.pack("<I", len(payload)) + payload
    )


@pytest.mark.parametrize(
    "kw",
    [
        {},
        {"force": "verbatim"},
        {"force": "lpc"},
        {"partition_order": 2},
        {"rice2": True},
        {"rice2": True, "partition_order": 3},
        {"escape_bits": 14},
        {"auto_wasted": True},
    ],
)
def test_flac_roundtrip_mono_branches(kw):
    x = _sig(1024)
    if kw.get("auto_wasted"):
        x = (x // 4) * 4  # two shared low zero bits
    y, sr, scale = flac.decode(flac.encode(x, **kw))
    assert sr == 8000 and scale == 32768
    assert np.array_equal(y, x)


@pytest.mark.parametrize("stereo", ["mid_side", "left_side", "right_side", None])
def test_flac_roundtrip_stereo_decorrelation(stereo):
    x = _sig(1000, ch=2)
    y, _, _ = flac.decode(flac.encode(x, stereo=stereo))
    assert np.array_equal(y, x)


def test_flac_roundtrip_shapes_and_extremes():
    for n, ch in [(4097, 2), (5, 1), (0, 1), (3, 2), (1024, 1)]:
        x = _sig(n, ch)
        y, _, _ = flac.decode(flac.encode(x, block_size=1024))
        assert y.shape == (n, ch) and np.array_equal(y, x)
    const = np.full((2048, 1), -32768, np.int32)  # CONSTANT subframes
    assert np.array_equal(flac.decode(flac.encode(const))[0], const)
    swing = np.array([[32767], [-32768]] * 600, np.int32)
    assert np.array_equal(flac.decode(flac.encode(swing))[0], swing)


def test_flac_streaminfo_fields():
    x = _sig(3000)
    si = flac.parse_streaminfo(flac.encode(x, sample_rate=44100))
    assert si["sample_rate"] == 44100
    assert si["channels"] == 1
    assert si["bits_per_sample"] == 16
    assert si["total_samples"] == 3000
    with pytest.raises(ValueError, match="magic"):
        flac.parse_streaminfo(b"not flac at all")


def test_flac_fingerprints_match_wav_twin():
    """The cross-codec pin: a FLAC encode of the same samples yields
    byte-identical envelope AND spectral fingerprints as the WAV —
    the decoder's integers are exact, so the whole downstream dedup
    surface is codec-agnostic."""
    from pathwaydataframework_spark.operators import multimodal as mm

    x = _sig(1024)
    wav_bytes, flac_bytes = _wav(x), flac.encode(x)
    assert mm.audio_fingerprint(wav_bytes) == mm.audio_fingerprint(flac_bytes)
    assert mm.audio_fingerprint(flac_bytes) is not None
    assert mm.audio_spectral_fingerprint(
        wav_bytes
    ) == mm.audio_spectral_fingerprint(flac_bytes)
    e_wav = mm._haar_band_energies(wav_bytes, windows=8, bands=5)
    e_flac = mm._haar_band_energies(flac_bytes, windows=8, bands=5)
    assert np.array_equal(e_wav, e_flac)


def test_flac_crc_gates_reject_corruption():
    # single frame (1024 samples / 1024 block): the stream's last two
    # bytes ARE the frame CRC-16 — flipping one is a clean CRC reject
    enc = bytearray(flac.encode(_sig(1024)))
    enc[-1] ^= 0xFF
    with pytest.raises(ValueError, match="CRC-16"):
        flac.decode(bytes(enc))
    # a mid-payload flip derails Rice decoding itself — still a
    # ValueError (truncated / CRC / sync), never a crash
    enc2 = bytearray(flac.encode(_sig(1024)))
    enc2[len(enc2) // 2] ^= 0xFF
    with pytest.raises(ValueError):
        flac.decode(bytes(enc2))
    # header CRC-8: flip a bit inside the frame header (byte right
    # after the metadata ends is the sync byte; +4 sits in the header)
    enc3 = bytearray(flac.encode(_sig(1024)))
    hdr_at = 8 + 34 + 4  # magic + STREAMINFO block + block header
    enc3[hdr_at + 4] ^= 0x01
    with pytest.raises(ValueError):
        flac.decode(bytes(enc3))


def test_flac_mutation_fuzz_never_crashes():
    """Byte-mutation robustness (the test_codec_fuzz pattern): flipping
    any single byte of a valid stream either still decodes or raises
    ValueError — never an unhandled exception or a hang."""
    base = flac.encode(_sig(512), block_size=256)
    for pos in range(0, len(base), 7):
        for flip in (0x01, 0x80, 0xFF):
            mut = bytearray(base)
            mut[pos] ^= flip
            try:
                flac.decode(bytes(mut))
            except ValueError:
                pass


def test_flac_media_meta_sniff(spark):
    """attach_media_meta reads FLAC type + duration from the
    fixed-offset STREAMINFO fields as pure column expressions."""
    import pyspark.sql.functions as F  # noqa: F401

    from pathwaydataframework_spark.operators import multimodal

    blob = flac.encode(_sig(16000), sample_rate=8000)
    df = spark.createDataFrame(
        [(0, blob), (1, b"not media")], "id long, data binary"
    )
    rows = {
        r["id"]: r["media_meta"].asDict()
        for r in multimodal.attach_media_meta(df).collect()
    }
    assert rows[0]["media_type"] == "audio"
    assert rows[0]["duration_ms"] == 2000  # 16000 samples at 8 kHz
    assert rows[1]["media_type"] == "unknown"


def test_flac_encoder_fails_fast_on_bit_width_overflow():
    """The fixture encoder raises instead of silently masking a value
    that does not fit its bit width (escaped residuals, verbatim and
    warmup samples) — a masked write would corrupt the stream and
    surface as a confusing roundtrip mismatch (ADVICE r12)."""
    # escaped residual wider than escape_bits
    w = flac._BitWriter()
    with pytest.raises(ValueError, match="does not fit"):
        flac._write_residual(w, [300], 0, 1, escape_bits=4)
    # in-range escape still writes
    flac._write_residual(flac._BitWriter(), [7, -8], 0, 2, escape_bits=4)
    # verbatim sample wider than the effective bps
    with pytest.raises(ValueError, match="does not fit"):
        flac._write_subframe(flac._BitWriter(), [70000], 16, force="verbatim")
    # warmup sample (fixed path) wider than the effective bps
    with pytest.raises(ValueError, match="does not fit"):
        flac._write_subframe(
            flac._BitWriter(), [40000, 1, 2, 3], 16
        )
    # constant subframe out of range
    with pytest.raises(ValueError, match="does not fit"):
        flac._write_subframe(flac._BitWriter(), [40000] * 8, 16)
