"""wavcodec kernel tests: G.711 expansion/compression pinned bit-exact
against the stdlib's independent C implementation (audioop, present on
this Python), IMA ADPCM vs straight-line reference math, PCM/float
container parsing, and integration through wav_features /
audio_fingerprint for the newly decodable format tags."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from pathwaydataframework_spark.operators import multimodal, wavcodec as wc

try:  # deprecated (removed in 3.13) but the best oracle where available
    import audioop
except ImportError:  # pragma: no cover
    audioop = None


def _wav(tag, channels, rate, bits, block_align, payload):
    return (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack(
            "<IHHIIHH", 16, tag, channels, rate,
            rate * channels * max(bits // 8, 1), block_align, bits,
        )
        + b"data" + struct.pack("<I", len(payload)) + payload
    )


# -- G.711 vs the stdlib C implementation -------------------------------------


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_g711_expand_bit_exact_all_256_bytes():
    all_bytes = bytes(range(256))
    ref_u = np.frombuffer(audioop.ulaw2lin(all_bytes, 2), "<i2").astype(np.int32)
    assert (wc.mulaw_expand(np.frombuffer(all_bytes, np.uint8)) == ref_u).all()
    ref_a = np.frombuffer(audioop.alaw2lin(all_bytes, 2), "<i2").astype(np.int32)
    assert (wc.alaw_expand(np.frombuffer(all_bytes, np.uint8)) == ref_a).all()


@pytest.mark.skipif(audioop is None, reason="audioop removed")
def test_g711_compress_bit_exact_incl_boundaries():
    rng = np.random.default_rng(1)
    x = np.concatenate(
        [
            rng.integers(-32768, 32768, 20000),
            np.arange(-300, 300),
            np.array([0, -1, 1, 32767, -32768, 8158 << 2, (8159 << 2) + 3]),
        ]
    ).astype(np.int32)
    pcm = x.astype("<i2").tobytes()
    assert (
        wc._mulaw_compress(x)
        == np.frombuffer(audioop.lin2ulaw(pcm, 2), np.uint8)
    ).all()
    assert (
        wc._alaw_compress(x)
        == np.frombuffer(audioop.lin2alaw(pcm, 2), np.uint8)
    ).all()


# -- container decode ---------------------------------------------------------


def test_pcm16_and_pcm24_decode():
    rng = np.random.default_rng(2)
    x = rng.integers(-32768, 32768, (500, 2)).astype(np.int16)
    s, sr, scale = wc.decode(wc.encode_pcm16(x, sample_rate=16000))
    assert sr == 16000 and scale == 32768 and (s == x).all()
    # 24-bit: widen little-endian triplets incl. negative values
    vals = np.array([0, 1, -1, (1 << 23) - 1, -(1 << 23), 123456], np.int32)
    b = bytearray()
    for v in vals:
        b += struct.pack("<i", int(v))[:3]
    s, _sr, scale = wc.decode(_wav(1, 1, 8000, 24, 3, bytes(b)))
    assert scale == 1 << 23 and (s[:, 0] == vals).all()


def test_float32_decode():
    rng = np.random.default_rng(3)
    f = (rng.random(100) * 2 - 1).astype("<f4")
    s, sr, scale = wc.decode(_wav(3, 1, 44100, 32, 4, f.tobytes()))
    assert scale is None
    assert np.allclose(s[:, 0], f.astype(np.float64))


def test_extensible_subformat_pcm():
    x = np.arange(-50, 50, dtype=np.int16)
    ext = struct.pack("<HHIIHH", 0xFFFE, 1, 8000, 16000, 2, 16)
    # cbSize, validBits, channelMask(4B), then the GUID whose first two
    # bytes are the real format tag (1 = PCM)
    ext += struct.pack("<HHIH", 22, 16, 1, 1) + b"\x00" * 14
    data = (
        b"RIFF" + struct.pack("<I", 36 + 24 + x.nbytes) + b"WAVE"
        + b"fmt " + struct.pack("<I", len(ext)) + ext
        + b"data" + struct.pack("<I", x.nbytes) + x.astype("<i2").tobytes()
    )
    s, _sr, scale = wc.decode(data)
    assert scale == 32768 and (s[:, 0] == x).all()


def test_ima_adpcm_vs_reference_math():
    nibbles = [3, 8, 15, 0, 7, 12, 1, 9]
    pred0, idx0 = 1000, 20
    block = struct.pack("<hBB", pred0, idx0, 0) + bytes(
        nibbles[i] | (nibbles[i + 1] << 4) for i in range(0, 8, 2)
    )
    # straight-line reference decode (independent of the vectorized path)
    exp, p, ix = [pred0], pred0, idx0
    for nib in nibbles:
        st = int(wc._IMA_STEPS[ix])
        d = st >> 3
        if nib & 1:
            d += st >> 2
        if nib & 2:
            d += st >> 1
        if nib & 4:
            d += st
        p = max(-32768, min(32767, p - d if nib & 8 else p + d))
        ix = max(0, min(88, ix + int(wc._IMA_INDEX[nib & 7])))
        exp.append(p)
    s, _sr, scale = wc.decode(_wav(0x11, 1, 8000, 4, len(block), block))
    assert scale == 32768
    assert s[:, 0].tolist() == exp


def test_ima_adpcm_stereo_channel_interleave():
    blk = (
        struct.pack("<hBB", 100, 10, 0)
        + struct.pack("<hBB", -200, 30, 0)
        + bytes([0x11] * 4)  # channel 0: nibble 1 (always +diff)
        + bytes([0x88] * 4)  # channel 1: nibble 8 (sign bit → -diff)
    )
    s, _sr, _scale = wc.decode(_wav(0x11, 2, 8000, 4, len(blk), blk))
    assert s.shape == (9, 2)
    assert s[0, 0] == 100 and s[0, 1] == -200
    assert (np.diff(s[:, 0]) > 0).all() and (np.diff(s[:, 1]) < 0).all()


def test_rejects_unknown_tag_and_garbage():
    with pytest.raises(ValueError, match="RIFF"):
        wc.decode(b"not a wav")
    with pytest.raises(ValueError, match="format tag"):
        wc.decode(_wav(0x55, 1, 8000, 16, 2, b"\x00\x00"))


# -- integration --------------------------------------------------------------


def test_wav_features_g711_matches_pcm_features():
    rng = np.random.default_rng(5)
    x = rng.integers(-20000, 20000, 4000).astype(np.int32)
    pcm = multimodal.wav_features(wc.encode_pcm16(x, sample_rate=8000))
    ulaw = multimodal.wav_features(wc.encode(x, sample_rate=8000, tag=7))
    alaw = multimodal.wav_features(wc.encode(x, sample_rate=8000, tag=6))
    assert ulaw[0] == alaw[0] == pcm[0]  # same duration
    # G.711 is lossy but close: rms/peak within a few percent
    for feats in (ulaw, alaw):
        assert abs(feats[1] - pcm[1]) / pcm[1] < 0.05
        assert abs(feats[2] - pcm[2]) / pcm[2] < 0.05


def test_audio_fingerprint_survives_g711_transcode():
    # the energy ENVELOPE (which window is louder) survives companding
    rng = np.random.default_rng(6)
    env = np.repeat(rng.integers(1000, 20000, 33), 100).astype(np.float64)
    x = (env * np.sin(np.arange(3300) * 0.7)).astype(np.int32)
    fp_pcm = multimodal.audio_fingerprint(wc.encode_pcm16(x))
    fp_ulaw = multimodal.audio_fingerprint(wc.encode(x, tag=7))
    assert fp_pcm is not None and fp_ulaw is not None
    ham = sum(
        bin(a ^ b).count("1") for a, b in zip(fp_pcm, fp_ulaw)
    )
    assert ham <= 2  # near-identical envelope bits across the transcode
    # float WAV: exact-integer contract refuses, as documented
    f = (np.sin(np.arange(3300) * 0.7)).astype("<f4")
    float_wav = _wav(3, 1, 8000, 32, 4, f.tobytes())
    assert multimodal.audio_fingerprint(float_wav) is None
