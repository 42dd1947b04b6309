"""RIFF/WAVE parser + sample decoders beyond what stdlib ``wave`` reads.

Format tags covered (public WAVE/G.711/IMA specifications):

- 1 / 0xFFFE-PCM: integer PCM at 8 (unsigned), 16, 24, 32 bit
- 3 / 0xFFFE-float: IEEE float32/float64
- 6: A-law (G.711) — segment/mantissa expansion, vectorized
- 7: µ-law (G.711) — bias-133 expansion, vectorized
- 0x11: IMA/DVI ADPCM — block header (predictor + step index) + 4-bit
  nibbles, per-channel 4-byte interleave, the standard 89-entry step
  table and [-1,-1,-1,-1,2,4,6,8] index adaptation

``decode`` returns (samples, sample_rate, scale): integer formats keep
their EXACT native integers (int32 array, ``scale`` = 2^(bits-1) so
``samples/scale`` normalizes; G.711 and ADPCM expand to exact 16-bit
integers), floats return float64 with scale None.  Channels stay
separate — shape (n_frames, n_channels).

The integer-exactness matters downstream: ``multimodal.audio_fingerprint``
builds exact-integer energy envelopes, and its DuckDB oracle replays the
bits from hex — decoders that rounded through float would break that.
stdlib ``wave`` (kept for the PCM fast path elsewhere) rejects every
non-PCM tag here; the reference framework has no audio path at all
(media goes to service UDF parsers, reference
python/pathway/xpacks/llm/parsers.py:53-746).
"""

from __future__ import annotations

import struct

import numpy as np

# IMA ADPCM step table (public IMA/DVI ADPCM specification) and the
# index-adaptation table for the 3-bit magnitude of each nibble.
_IMA_STEPS = np.array([
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34, 37,
    41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143, 157, 173,
    190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494, 544, 598, 658,
    724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552, 1707, 1878, 2066,
    2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428, 4871, 5358, 5894,
    6484, 7132, 7845, 8630, 9493, 10442, 11487, 12635, 13899, 15289,
    16818, 18500, 20350, 22385, 24623, 27086, 29794, 32767,
], dtype=np.int32)
_IMA_INDEX = np.array([-1, -1, -1, -1, 2, 4, 6, 8], dtype=np.int32)


def is_wav(data: bytes) -> bool:
    return (
        len(data) >= 12
        and bytes(data[:4]) == b"RIFF"
        and bytes(data[8:12]) == b"WAVE"
    )


def _chunks(data: bytes):
    pos = 12
    n = len(data)
    while pos + 8 <= n:
        fourcc = data[pos : pos + 4]
        (size,) = struct.unpack_from("<I", data, pos + 4)
        body = data[pos + 8 : pos + 8 + size]
        if len(body) < size:
            size = len(body)  # tolerate a truncated final chunk
        yield fourcc, body
        pos += 8 + size + (size & 1)  # chunks are word-aligned


def mulaw_expand(u: np.ndarray) -> np.ndarray:
    """G.711 µ-law byte → exact linear int16 (bias-133 expansion)."""
    u = (~np.asarray(u, dtype=np.uint8)).astype(np.int32)
    sign = u & 0x80
    exponent = (u >> 4) & 0x07
    mantissa = u & 0x0F
    magnitude = (((mantissa << 3) + 0x84) << exponent) - 0x84
    return np.where(sign != 0, -magnitude, magnitude).astype(np.int32)


def alaw_expand(a: np.ndarray) -> np.ndarray:
    """G.711 A-law byte → exact linear int16 (even-bit inversion +
    segment expansion; sign bit SET means positive in A-law)."""
    a = (np.asarray(a, dtype=np.uint8) ^ 0x55).astype(np.int32)
    sign = a & 0x80
    exponent = (a >> 4) & 0x07
    mantissa = a & 0x0F
    magnitude = np.where(
        exponent == 0,
        (mantissa << 4) + 8,
        ((mantissa << 4) + 0x108) << np.maximum(exponent - 1, 0),
    )
    return np.where(sign != 0, magnitude, -magnitude).astype(np.int32)


def _ima_adpcm_decode(
    body: bytes, channels: int, block_align: int
) -> np.ndarray:
    """IMA ADPCM data chunk → (n, channels) exact int16-range int32.
    Each block: per-channel 4-byte header (predictor int16, step index,
    reserved), then nibble words interleaved 4 bytes per channel."""
    out_blocks = []
    for start in range(0, len(body) - len(body) % block_align, block_align):
        block = body[start : start + block_align]
        preds = np.empty(channels, dtype=np.int32)
        idxs = np.empty(channels, dtype=np.int32)
        for c in range(channels):
            p, si = struct.unpack_from("<hB", block, 4 * c)
            preds[c] = p
            idxs[c] = min(max(int(si), 0), 88)
        data_bytes = np.frombuffer(block[4 * channels :], dtype=np.uint8)
        words = data_bytes.size // (4 * channels)
        chans = []
        for c in range(channels):
            # channel c owns bytes [4c, 4c+4) of every 4*channels group
            grp = data_bytes[: words * 4 * channels].reshape(words, channels, 4)
            byts = grp[:, c, :].reshape(-1)
            nibbles = np.empty(byts.size * 2, dtype=np.uint8)
            nibbles[0::2] = byts & 0x0F  # low nibble first, per spec
            nibbles[1::2] = byts >> 4
            samples = np.empty(nibbles.size + 1, dtype=np.int32)
            pred, idx = int(preds[c]), int(idxs[c])
            samples[0] = pred  # the header predictor IS sample 0
            steps = _IMA_STEPS
            for i, nib in enumerate(nibbles):
                step = int(steps[idx])
                diff = step >> 3
                if nib & 1:
                    diff += step >> 2
                if nib & 2:
                    diff += step >> 1
                if nib & 4:
                    diff += step
                pred = pred - diff if nib & 8 else pred + diff
                pred = min(max(pred, -32768), 32767)
                idx = min(max(idx + int(_IMA_INDEX[nib & 7]), 0), 88)
                samples[i + 1] = pred
            chans.append(samples)
        out_blocks.append(np.stack(chans, axis=1))
    if not out_blocks:
        return np.zeros((0, channels), dtype=np.int32)
    return np.concatenate(out_blocks, axis=0)


def decode(data: bytes) -> tuple[np.ndarray, int, int | None]:
    """See ``_decode_impl``; parse escapes normalize to ValueError."""
    try:
        return _decode_impl(data)
    except ValueError:
        raise
    except (struct.error, IndexError, KeyError, OverflowError, TypeError) as exc:
        raise ValueError(
            "WAV: malformed stream (%s)" % type(exc).__name__
        ) from exc


def _decode_impl(data: bytes) -> tuple[np.ndarray, int, int | None]:
    """WAV bytes → (samples (n_frames, n_channels), sample_rate, scale).

    Integer formats return exact int32 samples with ``scale`` =
    2^(bits-1) (16-bit scale for G.711/ADPCM expansions); IEEE-float
    formats return float64 with scale None.  ValueError on non-WAV
    input, missing fmt/data, or an unsupported format tag.
    """
    data = bytes(data)
    if not is_wav(data):
        raise ValueError("WAV: bad RIFF/WAVE header")
    fmt = None
    body = None
    for fourcc, chunk in _chunks(data):
        if fourcc == b"fmt ":
            fmt = chunk
        elif fourcc == b"data":
            body = chunk
    if fmt is None or body is None or len(fmt) < 16:
        raise ValueError("WAV: missing fmt/data chunk")
    tag, channels, rate, _brate, block_align, bits = struct.unpack_from(
        "<HHIIHH", fmt, 0
    )
    if channels == 0 or rate == 0:
        raise ValueError("WAV: zero channels/rate")
    if tag == 0xFFFE and len(fmt) >= 26:  # extensible: subformat GUID
        (tag,) = struct.unpack_from("<H", fmt, 24)

    if tag == 1:  # integer PCM
        width = bits // 8
        if width not in (1, 2, 3, 4):
            raise ValueError("WAV: unsupported PCM width %d" % bits)
        n = len(body) // (width * channels) * channels
        if width == 1:
            x = np.frombuffer(body[: n], dtype=np.uint8).astype(np.int32) - 128
        elif width == 2:
            x = np.frombuffer(body[: n * 2], dtype="<i2").astype(np.int32)
        elif width == 4:
            x = np.frombuffer(body[: n * 4], dtype="<i4").astype(np.int32)
        else:  # 24-bit: widen little-endian triplets
            b = np.frombuffer(body[: n * 3], dtype=np.uint8).reshape(-1, 3)
            x = (
                b[:, 0].astype(np.int32)
                | (b[:, 1].astype(np.int32) << 8)
                | (b[:, 2].astype(np.int32) << 16)
            )
            x = np.where(x >= 1 << 23, x - (1 << 24), x)
        return x.reshape(-1, channels), rate, 1 << (8 * width - 1)
    if tag == 3:  # IEEE float
        width = bits // 8
        if width not in (4, 8):
            raise ValueError("WAV: unsupported float width %d" % bits)
        dt = "<f4" if width == 4 else "<f8"
        n = len(body) // (width * channels) * channels
        x = np.frombuffer(body[: n * width], dtype=dt).astype(np.float64)
        return x.reshape(-1, channels), rate, None
    if tag == 6:  # A-law
        n = len(body) // channels * channels
        x = alaw_expand(np.frombuffer(body[:n], dtype=np.uint8))
        return x.reshape(-1, channels), rate, 1 << 15
    if tag == 7:  # µ-law
        n = len(body) // channels * channels
        x = mulaw_expand(np.frombuffer(body[:n], dtype=np.uint8))
        return x.reshape(-1, channels), rate, 1 << 15
    if tag == 0x11:  # IMA ADPCM
        if block_align < 4 * channels:
            raise ValueError("WAV: bad ADPCM block align")
        return _ima_adpcm_decode(body, channels, block_align), rate, 1 << 15
    raise ValueError("WAV: unsupported format tag 0x%x" % tag)


def encode_pcm16(
    samples: np.ndarray, *, sample_rate: int = 8000
) -> bytes:
    """(n,) or (n, ch) int16-range array → canonical PCM16 WAV bytes
    (the 44-byte header the JVM-side sniffer reads)."""
    x = np.asarray(samples, dtype=np.int16)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    payload = x.astype("<i2").tobytes()
    byte_rate = sample_rate * ch * 2
    return (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, ch, sample_rate,
                                byte_rate, ch * 2, 16)
        + b"data" + struct.pack("<I", len(payload)) + payload
    )


def encode(
    samples: np.ndarray,
    *,
    sample_rate: int = 8000,
    tag: int = 1,
) -> bytes:
    """Fixture encoder for the non-PCM tags: ``tag`` 6 (A-law) and 7
    (µ-law) compress int16-range input through the G.711 segment search
    (decode(encode(x)) == the G.711 quantization of x); tag 1 defers to
    ``encode_pcm16``."""
    if tag == 1:
        return encode_pcm16(samples, sample_rate=sample_rate)
    x = np.asarray(samples, dtype=np.int32)
    if x.ndim == 1:
        x = x[:, None]
    ch = x.shape[1]
    flat = x.reshape(-1)
    if tag == 7:
        comp = _mulaw_compress(flat)
    elif tag == 6:
        comp = _alaw_compress(flat)
    else:
        raise ValueError("encode supports tags 1, 6, 7")
    payload = comp.tobytes()
    byte_rate = sample_rate * ch
    return (
        b"RIFF" + struct.pack("<I", 36 + len(payload)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, tag, ch, sample_rate,
                                byte_rate, ch, 8)
        + b"data" + struct.pack("<I", len(payload)) + payload
    )


def _bitlen(v: np.ndarray) -> np.ndarray:
    """Element-wise bit length of non-negative int32 (exact: float64
    log2 is exact for ints below 2^53)."""
    return np.where(
        v <= 0, 0, (np.floor(np.log2(np.maximum(v, 1))) + 1).astype(np.int32)
    )


def _mulaw_compress(x: np.ndarray) -> np.ndarray:
    """linear2ulaw, the canonical public G.711 algorithm: shift to the
    14-bit domain first (so borderline samples land in the same segment
    the reference C implementation picks), bias 33, segment search."""
    x = np.asarray(x, dtype=np.int32)
    v = x >> 2
    mask = np.where(v < 0, 0x7F, 0xFF)
    v = np.where(v < 0, -v, v)
    v = np.minimum(v, 8159) + 33
    seg = np.maximum(_bitlen(v) - 6, 0)
    uval = (seg << 4) | ((v >> (seg + 1)) & 0x0F)
    return np.where(seg >= 8, 0x7F ^ mask, uval ^ mask).astype(np.uint8)


def _alaw_compress(x: np.ndarray) -> np.ndarray:
    """linear2alaw: 13-bit domain, negatives mapped via -v-1, segment
    search over the A-law boundaries."""
    x = np.asarray(x, dtype=np.int32)
    v = x >> 3
    neg = v < 0
    v = np.where(neg, -v - 1, v)
    mask = np.where(neg, 0x55, 0xD5)
    seg = np.maximum(_bitlen(v) - 5, 0)
    mant = np.where(seg < 2, (v >> 1) & 0x0F, (v >> seg) & 0x0F)
    aval = (seg << 4) | mant
    return np.where(seg >= 8, 0x7F ^ mask, aval ^ mask).astype(np.uint8)
