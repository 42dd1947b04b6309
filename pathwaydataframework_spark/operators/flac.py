"""FLAC decoder + fixture encoder (public spec: RFC 9639 / xiph.org).

Scope — the lossless integer path a data pipeline actually meets:

- STREAMINFO parse (sample rate, channels, bits/sample, total samples)
- frame decode: all block-size/sample-rate/sample-size header codes,
  UTF-8-coded frame/sample numbers, CRC-8 header + CRC-16 frame checks
- subframes: CONSTANT, VERBATIM, FIXED orders 0-4, LPC orders 1-32
  (warmup + quantized coefficients + shift), wasted-bits unary prefix
- residuals: Rice method 0 (4-bit params) and Rice2 method 1 (5-bit),
  all partition orders, escape (raw-bits) partitions
- stereo decorrelation: independent, left/side, right/side, mid/side
  (side channels carry the spec's +1 bit)

``decode`` returns the same contract as ``wavcodec.decode``: exact
int32 samples shaped (n_frames, n_channels), the sample rate, and
``scale`` = 2^(bits-1) — so the downstream exact-integer fingerprint /
feature arithmetic (multimodal.audio_fingerprint and the Haar spectral
kernel) is decoder-agnostic.  ``encode`` is the fixture writer (the
encode_rle8 precedent): FIXED-predictor subframes with single-partition
Rice residuals, correct CRCs, enough to exercise every decoder branch
from deterministic pure-Python bytes.

Like every codec here this is pure Python over small Arrow batches —
the 100 TB path keeps decode inside mapInPandas workers, one crossing
per batch.  The reference handles media via service-UDF parsers
(/root/reference/python/pathway/xpacks/llm/parsers.py:53-746); the
in-engine codec is the Spark-native self-contained analogue.
"""

from __future__ import annotations

import struct

import numpy as np

_FIXED_COEFFS = {
    0: [],
    1: [1],
    2: [2, -1],
    3: [3, -3, 1],
    4: [4, -6, 4, -1],
}

# frame-header block-size codes 2..5 and 8..15 (0=reserved, 1=192,
# 6/7=explicit 8/16-bit follows)
_BLOCK_SIZES = {1: 192, 2: 576, 3: 1152, 4: 2304, 5: 4608,
                8: 256, 9: 512, 10: 1024, 11: 2048, 12: 4096,
                13: 8192, 14: 16384, 15: 32768}
_SAMPLE_RATES = {1: 88200, 2: 176400, 3: 192000, 4: 8000, 5: 16000,
                 6: 22050, 7: 24000, 8: 32000, 9: 44100, 10: 48000,
                 11: 96000}
_SAMPLE_SIZES = {1: 8, 2: 12, 4: 16, 5: 20, 6: 24, 7: 32}


def is_flac(data: bytes) -> bool:
    return len(data) >= 8 and bytes(data[:4]) == b"fLaC"


def _crc8(buf: bytes) -> int:
    crc = 0
    for b in buf:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 else (crc << 1) & 0xFF
    return crc


def _crc16(buf: bytes) -> int:
    crc = 0
    for b in buf:
        crc ^= b << 8
        for _ in range(8):
            crc = ((crc << 1) ^ 0x8005) & 0xFFFF if crc & 0x8000 else (crc << 1) & 0xFFFF
    return crc


class _Bits:
    """MSB-first bit reader over bytes; byte-position tracking so frame
    CRC-16 can hash the exact consumed span."""

    def __init__(self, buf: bytes, byte_pos: int = 0):
        self.buf = buf
        self.pos = byte_pos * 8

    def byte_pos(self) -> int:
        return self.pos // 8

    def align(self) -> None:
        self.pos = (self.pos + 7) // 8 * 8

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        end = self.pos + n
        if end > len(self.buf) * 8:
            raise ValueError("FLAC: truncated stream")
        first, last = self.pos // 8, (end - 1) // 8
        word = int.from_bytes(self.buf[first : last + 1], "big")
        word >>= (last + 1) * 8 - end
        self.pos = end
        return word & ((1 << n) - 1)

    def read_signed(self, n: int) -> int:
        v = self.read(n)
        return v - (1 << n) if v >> (n - 1) else v

    def unary(self) -> int:
        q = 0
        while self.read(1) == 0:
            q += 1
            if q > 1 << 20:
                raise ValueError("FLAC: runaway unary code")
        return q


def _read_utf8_coded(bits: _Bits) -> int:
    b0 = bits.read(8)
    if b0 < 0x80:
        return b0
    n = 0
    while (b0 << n) & 0x80:
        n += 1
    if n < 2 or n > 7:
        raise ValueError("FLAC: bad UTF-8-coded number")
    v = b0 & (0x7F >> n)
    for _ in range(n - 1):
        c = bits.read(8)
        if c & 0xC0 != 0x80:
            raise ValueError("FLAC: bad UTF-8-coded continuation")
        v = (v << 6) | (c & 0x3F)
    return v


def parse_streaminfo(data: bytes) -> dict:
    """STREAMINFO fields from the mandatory first metadata block —
    fixed offsets (bytes 8..42 of the stream), which is what makes
    FLAC metadata replayable by plain hex arithmetic in a SQL oracle."""
    data = bytes(data)
    if not is_flac(data):
        raise ValueError("FLAC: bad magic")
    if len(data) < 8 + 34:
        raise ValueError("FLAC: truncated STREAMINFO")
    hdr = data[4]
    if hdr & 0x7F != 0:
        raise ValueError("FLAC: first metadata block is not STREAMINFO")
    si = data[8 : 8 + 34]
    sample_rate = (si[10] << 12) | (si[11] << 4) | (si[12] >> 4)
    channels = ((si[12] >> 1) & 0x07) + 1
    bps = (((si[12] & 1) << 4) | (si[13] >> 4)) + 1
    total = ((si[13] & 0x0F) << 32) | int.from_bytes(si[14:18], "big")
    if sample_rate == 0:
        raise ValueError("FLAC: zero sample rate")
    return {
        "min_block": int.from_bytes(si[0:2], "big"),
        "max_block": int.from_bytes(si[2:4], "big"),
        "sample_rate": sample_rate,
        "channels": channels,
        "bits_per_sample": bps,
        "total_samples": total,
        "md5": si[18:34].hex(),
    }


def _skip_metadata(data: bytes) -> int:
    """Return the byte offset of the first audio frame."""
    pos = 4
    while True:
        if pos + 4 > len(data):
            raise ValueError("FLAC: truncated metadata")
        last = data[pos] & 0x80
        size = int.from_bytes(data[pos + 1 : pos + 4], "big")
        pos += 4 + size
        if last:
            return pos


def _decode_residual(bits: _Bits, block_size: int, order: int) -> list[int]:
    method = bits.read(2)
    if method > 1:
        raise ValueError("FLAC: reserved residual method")
    pbits = 4 if method == 0 else 5
    escape = (1 << pbits) - 1
    part_order = bits.read(4)
    nparts = 1 << part_order
    if block_size % nparts:
        raise ValueError("FLAC: block size not divisible by partitions")
    out: list[int] = []
    for p in range(nparts):
        n = (block_size >> part_order) - (order if p == 0 else 0)
        if n < 0:
            raise ValueError("FLAC: partition shorter than predictor order")
        param = bits.read(pbits)
        if param == escape:
            raw = bits.read(5)
            for _ in range(n):
                out.append(bits.read_signed(raw) if raw else 0)
        else:
            for _ in range(n):
                q = bits.unary()
                u = (q << param) | bits.read(param)
                out.append((u >> 1) ^ -(u & 1))
    return out


def _decode_subframe(bits: _Bits, block_size: int, bps: int) -> list[int]:
    if bits.read(1):
        raise ValueError("FLAC: bad subframe padding bit")
    ftype = bits.read(6)
    wasted = 0
    if bits.read(1):
        wasted = bits.unary() + 1
    eff = bps - wasted
    if eff <= 0:
        raise ValueError("FLAC: wasted bits exceed sample size")
    if ftype == 0:  # CONSTANT
        v = bits.read_signed(eff)
        out = [v] * block_size
    elif ftype == 1:  # VERBATIM
        out = [bits.read_signed(eff) for _ in range(block_size)]
    elif 8 <= ftype <= 12:  # FIXED
        order = ftype - 8
        if order > block_size:
            raise ValueError("FLAC: fixed order exceeds block")
        out = [bits.read_signed(eff) for _ in range(order)]
        res = _decode_residual(bits, block_size, order)
        coef = _FIXED_COEFFS[order]
        for r in res:
            pred = sum(c * out[-1 - i] for i, c in enumerate(coef))
            out.append(r + pred)
    elif ftype >= 32:  # LPC
        order = ftype - 31
        if order > block_size:
            raise ValueError("FLAC: LPC order exceeds block")
        out = [bits.read_signed(eff) for _ in range(order)]
        precision = bits.read(4) + 1
        if precision == 16:
            raise ValueError("FLAC: invalid LPC precision")
        shift = bits.read_signed(5)
        if shift < 0:
            raise ValueError("FLAC: negative LPC shift")
        coef = [bits.read_signed(precision) for _ in range(order)]
        res = _decode_residual(bits, block_size, order)
        for r in res:
            pred = sum(c * out[-1 - i] for i, c in enumerate(coef)) >> shift
            out.append(r + pred)
    else:
        raise ValueError("FLAC: reserved subframe type %d" % ftype)
    if wasted:
        out = [v << wasted for v in out]
    return out


def decode(data: bytes) -> tuple[np.ndarray, int, int]:
    """FLAC bytes → (samples (n, channels) int32, sample_rate, scale) —
    the ``wavcodec.decode`` contract.  ValueError on malformed input,
    CRC mismatch, or capabilities outside the spec subset above."""
    data = bytes(data)
    info = parse_streaminfo(data)
    pos = _skip_metadata(data)
    channels = info["channels"]
    chans: list[list[int]] = [[] for _ in range(channels)]
    n_total = info["total_samples"]
    while pos < len(data) and (n_total == 0 or len(chans[0]) < n_total):
        if pos + 2 > len(data):
            break
        bits = _Bits(data, pos)
        sync = bits.read(14)
        if sync != 0x3FFE:
            raise ValueError("FLAC: lost frame sync")
        if bits.read(1):
            raise ValueError("FLAC: reserved frame bit")
        bits.read(1)  # blocking strategy
        bs_code = bits.read(4)
        sr_code = bits.read(4)
        ch_code = bits.read(4)
        ss_code = bits.read(3)
        if bits.read(1):
            raise ValueError("FLAC: reserved frame bit 2")
        _read_utf8_coded(bits)
        if bs_code == 0:
            raise ValueError("FLAC: reserved block size code")
        elif bs_code == 6:
            block_size = bits.read(8) + 1
        elif bs_code == 7:
            block_size = bits.read(16) + 1
        else:
            block_size = _BLOCK_SIZES[bs_code]
        if sr_code == 12:
            bits.read(8)
        elif sr_code in (13, 14):
            bits.read(16)
        elif sr_code == 15:
            raise ValueError("FLAC: invalid sample rate code")
        bps = info["bits_per_sample"] if ss_code == 0 else _SAMPLE_SIZES.get(ss_code)
        if bps is None:
            raise ValueError("FLAC: reserved sample size code")
        hdr_end = bits.byte_pos()
        crc8 = bits.read(8)
        if _crc8(data[pos:hdr_end]) != crc8:
            raise ValueError("FLAC: frame header CRC-8 mismatch")
        if ch_code < 8:
            if ch_code + 1 != channels:
                raise ValueError("FLAC: frame/STREAMINFO channel mismatch")
            subs = [
                _decode_subframe(bits, block_size, bps)
                for _ in range(channels)
            ]
        elif ch_code in (8, 9, 10):
            if channels != 2:
                raise ValueError("FLAC: stereo decorrelation needs 2 channels")
            # the SIDE channel carries one extra bit, per spec
            if ch_code == 8:  # left/side
                left = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                subs = [left, [l - s for l, s in zip(left, side)]]
            elif ch_code == 9:  # right/side
                side = _decode_subframe(bits, block_size, bps + 1)
                right = _decode_subframe(bits, block_size, bps)
                subs = [[r + s for r, s in zip(right, side)], right]
            else:  # mid/side
                mid = _decode_subframe(bits, block_size, bps)
                side = _decode_subframe(bits, block_size, bps + 1)
                subs = [[], []]
                for m, s in zip(mid, side):
                    m = (m << 1) | (s & 1)
                    subs[0].append((m + s) >> 1)
                    subs[1].append((m - s) >> 1)
        else:
            raise ValueError("FLAC: reserved channel assignment")
        bits.align()
        body_end = bits.byte_pos()
        crc16 = bits.read(16)
        if _crc16(data[pos:body_end]) != crc16:
            raise ValueError("FLAC: frame CRC-16 mismatch")
        for c in range(channels):
            chans[c].extend(subs[c])
        pos = bits.byte_pos()
    if n_total and len(chans[0]) < n_total:
        raise ValueError("FLAC: stream ends before total_samples")
    if n_total:
        chans = [c[:n_total] for c in chans]
    x = np.array(chans, dtype=np.int64).T.astype(np.int32)
    if x.size == 0:
        x = np.zeros((0, channels), dtype=np.int32)
    return x, info["sample_rate"], 1 << (info["bits_per_sample"] - 1)


# ---------------------------------------------------------------------------
# fixture encoder


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, v: int, n: int) -> None:
        self.acc = (self.acc << n) | (v & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.out.append((self.acc >> self.nbits) & 0xFF)
        self.acc &= (1 << self.nbits) - 1

    def align(self) -> None:
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.out)


def _check_fits(v: int, n: int, what: str) -> None:
    """Fail fast when a signed value cannot be represented in ``n``-bit
    two's complement — ``_BitWriter.write`` masks to the low bits, so an
    out-of-range escaped residual / verbatim / warmup sample would
    silently corrupt the stream and surface as a confusing roundtrip
    mismatch instead of an error (ADVICE r12; matches the existing
    'rice overflow' guard)."""
    # n == 0 is legal FLAC (a 0-bit raw partition encodes all-zero
    # residuals): only the value 0 "fits" a zero-width field
    fits = (v == 0) if n <= 0 else (-(1 << (n - 1)) <= v < (1 << (n - 1)))
    if not fits:
        raise ValueError(
            f"fixture encoder: {what} {v} does not fit {n}-bit "
            "two's complement"
        )


def _best_fixed_order(x: list[int], max_order: int = 2) -> int:
    best, best_cost = 0, None
    for order in range(max_order + 1):
        res = _residual_fixed(x, order)
        cost = sum(abs(r) for r in res[order:])
        if best_cost is None or cost < best_cost:
            best, best_cost = order, cost
    return best


def _residual_fixed(x: list[int], order: int) -> list[int]:
    coef = _FIXED_COEFFS[order]
    return [
        x[i] - sum(c * x[i - 1 - j] for j, c in enumerate(coef))
        for i in range(order, len(x))
    ]


def _rice_param(res: list[int]) -> int:
    if not res:
        return 0
    mean = sum(abs(r) for r in res) / len(res) + 1
    p = 0
    while (1 << p) < mean and p < 14:
        p += 1
    return p


def _write_residual(
    w: _BitWriter,
    res: list[int],
    order: int,
    block_size: int,
    *,
    partition_order: int = 0,
    rice2: bool = False,
    escape_bits: int | None = None,
) -> None:
    pbits = 5 if rice2 else 4
    escape = (1 << pbits) - 1
    nparts = 1 << partition_order
    if block_size % nparts or (block_size >> partition_order) <= order:
        raise ValueError("fixture encoder: bad partition order")
    w.write(1 if rice2 else 0, 2)
    w.write(partition_order, 4)
    idx = 0
    for p in range(nparts):
        n = (block_size >> partition_order) - (order if p == 0 else 0)
        part = res[idx : idx + n]
        idx += n
        if escape_bits is not None:
            w.write(escape, pbits)
            w.write(escape_bits, 5)
            for r in part:
                _check_fits(r, escape_bits, "escaped residual")
                w.write(r, escape_bits)
            continue
        param = _rice_param(part)
        if param >= escape:
            param = escape - 1
        w.write(param, pbits)
        for r in part:
            # zigzag: 2r for r >= 0, 2|r|-1 for r < 0
            u = (abs(r) << 1) - (1 if r < 0 else 0)
            q = u >> param
            if q > 1 << 16:
                raise ValueError("fixture encoder: rice overflow")
            w.write(1, q + 1)  # q zeros then a 1 — written as value 1
            w.write(u & ((1 << param) - 1), param)


def _write_subframe(
    w: _BitWriter,
    ch: list[int],
    bps: int,
    *,
    force: str | None = None,
    partition_order: int = 0,
    rice2: bool = False,
    escape_bits: int | None = None,
    auto_wasted: bool = False,
) -> None:
    bs = len(ch)
    wasted = 0
    if auto_wasted and any(ch):
        while wasted < 8 and all(v % (1 << (wasted + 1)) == 0 for v in ch if v):
            wasted += 1
        if wasted:
            ch = [v >> wasted for v in ch]
    eff = bps - wasted
    w.write(0, 1)
    if force == "verbatim":
        w.write(1, 6)
    elif force == "lpc":
        w.write(32, 6)  # LPC order 1
    elif len(set(ch)) == 1 and force is None:
        w.write(0, 6)  # CONSTANT
    else:
        order = _best_fixed_order(ch) if bs > 2 else 0
        w.write(8 + order, 6)
    if wasted:
        w.write(1, 1)
        w.write(1, wasted)  # unary: (wasted-1) zeros then a 1
    else:
        w.write(0, 1)
    if force == "verbatim":
        for v in ch:
            _check_fits(v, eff, "verbatim sample")
            w.write(v, eff)
    elif force == "lpc":
        # order-1 LPC with coefficient 1, shift 0 — numerically the
        # fixed order-1 predictor, but through the decoder's LPC path
        if bs < 1:
            raise ValueError("fixture encoder: LPC needs a warmup sample")
        _check_fits(ch[0], eff, "LPC warmup sample")
        w.write(ch[0], eff)
        w.write(2 - 1, 4)  # precision 2
        w.write(0, 5)  # shift 0
        w.write(1, 2)  # coefficient +1 in 2-bit two's complement
        res = [ch[i] - ch[i - 1] for i in range(1, bs)]
        _write_residual(
            w, res, 1, bs, partition_order=partition_order, rice2=rice2,
            escape_bits=escape_bits,
        )
    elif len(set(ch)) == 1 and force is None:
        _check_fits(ch[0], eff, "constant sample")
        w.write(ch[0], eff)
    else:
        order = _best_fixed_order(ch) if bs > 2 else 0
        for v in ch[:order]:
            _check_fits(v, eff, "warmup sample")
            w.write(v, eff)
        _write_residual(
            w, _residual_fixed(ch, order), order, bs,
            partition_order=partition_order, rice2=rice2,
            escape_bits=escape_bits,
        )


def encode(
    samples: np.ndarray,
    *,
    sample_rate: int = 8000,
    block_size: int = 1024,
    force: str | None = None,
    partition_order: int = 0,
    rice2: bool = False,
    escape_bits: int | None = None,
    stereo: str | None = None,
    auto_wasted: bool = False,
) -> bytes:
    """Fixture FLAC encoder (the encode_rle8 precedent): 16-bit, FIXED
    predictor by default (order 0-2 per subframe, CONSTANT when flat),
    single-partition Rice residuals, correct CRC-8/CRC-16 — decodes
    bit-exactly back to the input through :func:`decode` (pinned in
    tests).  Knobs exist so fixtures can drive EVERY decoder branch:
    ``force`` 'verbatim'/'lpc' subframes, ``partition_order`` > 0,
    ``rice2`` (5-bit params), ``escape_bits`` (raw escape partitions),
    ``stereo`` 'mid_side'/'left_side'/'right_side' decorrelation, and
    ``auto_wasted`` (shift out shared low zero bits)."""
    x = np.asarray(samples, dtype=np.int32)
    if x.ndim == 1:
        x = x[:, None]
    n, channels = x.shape
    if channels < 1 or channels > 8:
        raise ValueError("encode supports 1-8 channels")
    if stereo is not None and channels != 2:
        raise ValueError("stereo decorrelation needs exactly 2 channels")
    if np.any(x > 32767) or np.any(x < -32768):
        raise ValueError("encode is 16-bit fixture-grade")
    bps = 16
    out = bytearray(b"fLaC")
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2  # min/max frame size: unknown
    si += bytes([
        (sample_rate >> 12) & 0xFF,
        (sample_rate >> 4) & 0xFF,
        ((sample_rate & 0xF) << 4) | ((channels - 1) << 1) | ((bps - 1) >> 4),
        ((bps - 1) & 0xF) << 4 | ((n >> 32) & 0xF),
    ])
    si += struct.pack(">I", n & 0xFFFFFFFF)
    si += b"\x00" * 16  # md5: unset
    out += bytes([0x80]) + len(si).to_bytes(3, "big") + si
    frame_no = 0
    for start in range(0, n, block_size):
        blk = x[start : start + block_size]
        bs = blk.shape[0]
        w = _BitWriter()
        w.write(0x3FFE, 14)
        w.write(0, 1)
        w.write(0, 1)  # fixed block-size strategy
        w.write(7, 4)  # block size: 16-bit field follows
        w.write(0, 4)  # sample rate: from STREAMINFO
        ch_code = {None: channels - 1, "left_side": 8, "right_side": 9,
                   "mid_side": 10}[stereo]
        w.write(ch_code, 4)
        w.write(4, 3)  # sample size: 16-bit
        w.write(0, 1)
        if frame_no < 0x80:
            w.write(frame_no, 8)
        else:  # 2-byte UTF-8 form (fixtures never exceed it)
            if frame_no >= 1 << 11:
                raise ValueError("fixture encoder: too many frames")
            w.write(0xC0 | (frame_no >> 6), 8)
            w.write(0x80 | (frame_no & 0x3F), 8)
        w.write(bs - 1, 16)
        w.align()
        hdr = w.bytes()
        w = _BitWriter()
        for b in hdr:
            w.write(b, 8)
        w.write(_crc8(hdr), 8)
        kw = dict(
            force=force, partition_order=partition_order, rice2=rice2,
            escape_bits=escape_bits, auto_wasted=auto_wasted,
        )
        if stereo is None:
            for c in range(channels):
                _write_subframe(w, [int(v) for v in blk[:, c]], bps, **kw)
        else:
            left = [int(v) for v in blk[:, 0]]
            right = [int(v) for v in blk[:, 1]]
            side = [l - r for l, r in zip(left, right)]
            if stereo == "left_side":
                _write_subframe(w, left, bps, **kw)
                _write_subframe(w, side, bps + 1, **kw)
            elif stereo == "right_side":
                _write_subframe(w, side, bps + 1, **kw)
                _write_subframe(w, right, bps, **kw)
            else:  # mid_side
                mid = [(l + r) >> 1 for l, r in zip(left, right)]
                _write_subframe(w, mid, bps, **kw)
                _write_subframe(w, side, bps + 1, **kw)
        w.align()
        body = w.bytes()
        out += body + struct.pack(">H", _crc16(body))
        frame_no += 1
    return bytes(out)
