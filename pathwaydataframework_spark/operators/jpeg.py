"""Pure-python/numpy baseline JPEG codec.

Closes the r4 deviation #5 gap: the container has no codec libraries, so
JPEG — the format real multimodal corpora actually use — previously hit
the ``NotImplementedError`` boundary in multimodal.py.  This module
implements the baseline sequential DCT process from the public JPEG
specification (ITU-T T.81): marker parse, DQT/DHT/DRI, Huffman entropy
decode with byte-stuffing and restart markers, dequantize → dezigzag →
8×8 IDCT (one numpy matrix sandwich per block), nearest-neighbor chroma
upsampling, YCbCr→RGB.  The encoder emits valid baseline files (4:4:4,
4:2:0, or grayscale) whose quant/Huffman tables are carried in the file
itself, as the format requires — so decode(encode(x)) never depends on
both sides sharing out-of-band constants.

Reference parity: the reference parses media via service-backed UDF
parsers (xpacks/llm/parsers.py:53-746 call out to unstructured/docling);
here the kernel is local and the Spark-side plumbing (mapInPandas batch
shape in multimodal.py) is unchanged.

Out of scope (raises ValueError): progressive (SOF2), arithmetic coding,
12-bit precision, hierarchical — rare in web corpora and detectable up
front.  Speed: this is a per-executor Python kernel behind Arrow-batched
``mapInPandas``; a production cluster swaps in Pillow/libjpeg-turbo
without touching the plan.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# zigzag scan order, DERIVED rather than transcribed: anti-diagonals of
# the 8×8 block, odd diagonals walked top-down, even ones bottom-up
# (T.81 Figure 5) — index k of the scan → flat row-major position.
_ZIGZAG: list[int] = []
for _s in range(15):
    _rng = range(max(0, _s - 7), min(_s, 7) + 1)
    for _r in (_rng if _s % 2 else reversed(_rng)):
        _ZIGZAG.append(_r * 8 + (_s - _r))
assert len(_ZIGZAG) == 64 and _ZIGZAG[:6] == [0, 1, 8, 16, 9, 2]

# 8×8 DCT-II basis matrix M[u, x] = c(u)/2 · cos((2x+1)uπ/16):
# forward F = M f Mᵀ, inverse f = Mᵀ F M.
_DCT_M = np.array(
    [
        [
            (math.sqrt(0.5) if u == 0 else 1.0)
            / 2.0
            * math.cos((2 * x + 1) * u * math.pi / 16.0)
            for x in range(8)
        ]
        for u in range(8)
    ]
)

# Base quantization tables (luminance/chrominance).  These only set the
# ENCODER's rate/quality trade-off — every file carries its tables in
# DQT, and the decoder always uses the file's own.
_QUANT_LUM = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
])
_QUANT_CHROM = np.array(
    [17, 18, 24, 47, 99, 99, 99, 99,
     18, 21, 26, 66, 99, 99, 99, 99,
     24, 26, 56, 99, 99, 99, 99, 99,
     47, 66, 99, 99, 99, 99, 99, 99] + [99] * 32
)

# Huffman tables for the ENCODER (bit-length counts + symbol order).
# Shape follows the well-known baseline tables; like the quant tables
# they are embedded in each emitted file's DHT, so decoding correctness
# never depends on these exact values.
_DC_LUM = ([0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0], list(range(12)))
_DC_CHROM = ([0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0], list(range(12)))


def _ac_symbols() -> list[int]:
    """Symbol order for the encoder's AC tables: EOB, ZRL, then every
    (run, size) pair ordered by size-then-run — a valid, complete order
    (all 162 baseline AC symbols)."""
    syms = [0x00, 0xF0]
    for size in range(1, 11):
        for run in range(16):
            syms.append((run << 4) | size)
    return syms


def _ac_counts(symbols: list[int]) -> list[int]:
    """Bit-length distribution for the encoder's 162 AC symbols: the
    canonical-validity-checked baseline distribution (short codes for the
    front of the symbol order).  Verified valid: the running canonical
    code never exceeds its length's capacity and the all-ones 16-bit code
    stays unused, as T.81 C.2 requires."""
    counts = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 125]
    assert sum(counts) == len(symbols)
    return counts


_AC_LUM = (_ac_counts(_ac_symbols()), _ac_symbols())
_AC_CHROM = _AC_LUM


def _build_decode_table(counts: list[int], symbols: list[int]) -> dict:
    """(length, code) → symbol for canonical JPEG Huffman codes."""
    table: dict[tuple[int, int], int] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            table[(length, code)] = symbols[k]
            k += 1
            code += 1
        code <<= 1
    return table


def _build_encode_table(counts: list[int], symbols: list[int]) -> dict:
    return {s: (ln, c) for (ln, c), s in _build_decode_table(counts, symbols).items()}


class _BitReader:
    """MSB-first bit reader over an unstuffed entropy segment."""

    def __init__(self, buf: bytes):
        self._buf = buf
        self._pos = 0
        self._bit = 0

    def bit(self) -> int:
        if self._pos >= len(self._buf):
            # T.81 F.2.2.5: a truncated final byte pads with 1-bits
            return 1
        b = (self._buf[self._pos] >> (7 - self._bit)) & 1
        self._bit += 1
        if self._bit == 8:
            self._bit = 0
            self._pos += 1
        return b

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v


def _decode_symbol(br: _BitReader, table: dict) -> int:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid JPEG: bad Huffman code")


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map a t-bit magnitude to its signed coefficient."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode(data: bytes) -> np.ndarray:
    """Baseline JPEG → (h, w, 3) uint8 RGB array.

    Supports SOF0/SOF1, 8-bit, 1 or 3 components, any H/V sampling
    factors ≤ 2 (covers 4:4:4 / 4:2:2 / 4:4:0 / 4:2:0), DRI/RST
    intervals.  Raises ValueError for anything else (progressive,
    arithmetic, CMYK, 12-bit).
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None  # (h, w, comps) ; comps = [(id, H, V, tq)]
    restart_interval = 0
    i = 2
    scan = None
    while i < len(data):
        if data[i] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        marker = data[i + 1]
        i += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:
            continue
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                    p += 64
                else:
                    tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                    p += 128
                dz = np.zeros(64, dtype=np.int32)
                dz[_ZIGZAG] = tbl  # stored in zigzag order
                quant[tq] = dz.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode_table(counts, symbols)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/SOF1 baseline
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG (SOF0/1) supported")
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 15))
            scan = (scan_comps, i + seglen)
            break
        # APPn/COM/others: skipped
        i += seglen
    if frame is None or scan is None:
        raise ValueError("invalid JPEG: missing SOF/SOS")
    h, w, comps = frame
    if len(comps) not in (1, 3):
        raise ValueError("only grayscale/YCbCr JPEG supported")
    scan_comps, entropy_start = scan

    # split the entropy-coded bytes into restart segments, unstuffing FF00
    segments: list[bytearray] = []
    cur = bytearray()
    p = entropy_start
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1] if p + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(cur)
                cur = bytearray()
                p += 2
                continue
            break  # real marker (EOI)
        cur.append(b)
        p += 1
    segments.append(cur)

    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    by_id = {c[0]: c for c in comps}
    planes = {
        cid: np.zeros((mcuy * V * 8, mcux * H * 8), dtype=np.float64)
        for cid, H, V, _ in comps
    }
    pred = {c[0]: 0 for c in comps}
    seg_idx = 0
    br = _BitReader(bytes(segments[0]))
    mcu_in_seg = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_in_seg == restart_interval:
                seg_idx += 1
                if seg_idx >= len(segments):
                    raise ValueError("invalid JPEG: missing restart segment")
                br = _BitReader(bytes(segments[seg_idx]))
                pred = {c[0]: 0 for c in comps}
                mcu_in_seg = 0
            mcu_in_seg += 1
            for cs, td, ta in scan_comps:
                cid, H, V, tq = by_id[cs]
                qt = quant[tq]
                dc_tbl = huff[(0, td)]
                ac_tbl = huff[(1, ta)]
                for v in range(V):
                    for u in range(H):
                        zz = np.zeros(64, dtype=np.int32)
                        t = _decode_symbol(br, dc_tbl)
                        diff = _extend(br.bits(t), t)
                        pred[cid] += diff
                        zz[0] = pred[cid]
                        k = 1
                        while k < 64:
                            rs = _decode_symbol(br, ac_tbl)
                            r, size = rs >> 4, rs & 15
                            if size == 0:
                                if r == 15:  # ZRL: 16 zeros
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("invalid JPEG: AC run overflow")
                            zz[k] = _extend(br.bits(size), size)
                            k += 1
                        block = np.zeros(64, dtype=np.float64)
                        block[_ZIGZAG] = zz
                        block = block.reshape(8, 8) * qt
                        pix = _DCT_M.T @ block @ _DCT_M + 128.0
                        y0 = (my * V + v) * 8
                        x0 = (mx * H + u) * 8
                        planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
    # upsample each plane to full MCU-grid resolution, crop, convert
    full = []
    for cid, H, V, _tq in comps:
        pl = planes[cid]
        pl = np.repeat(np.repeat(pl, vmax // V, axis=0), hmax // H, axis=1)
        full.append(pl[:h, :w])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255)
        return np.dstack([y, y, y]).astype(np.uint8)
    y, cb, cr = full
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    return np.clip(np.dstack([r, g, b]), 0, 255).round().astype(np.uint8)


class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self._acc = (self._acc << 1) | ((value >> i) & 1)
            self._nbits += 1
            if self._nbits == 8:
                self.out.append(self._acc)
                if self._acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self._acc = 0
                self._nbits = 0

    def flush(self) -> None:
        if self._nbits:
            self.write((1 << (8 - self._nbits)) - 1, 8 - self._nbits)  # pad with 1s


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base.astype(np.int64) * scale + 50) // 100, 1, 255).astype(np.int32)


def _encode_block(
    bw: _BitWriter, block: np.ndarray, qt: np.ndarray, pred: int, dc_enc: dict, ac_enc: dict
) -> int:
    coefs = _DCT_M @ (block.astype(np.float64) - 128.0) @ _DCT_M.T
    q = np.round(coefs / qt).astype(np.int32).reshape(-1)[_ZIGZAG]

    def mag(v: int) -> tuple[int, int]:
        t = int(v).bit_length() if v > 0 else int(-v).bit_length()
        bits = v if v >= 0 else v + (1 << t) - 1
        return t, bits

    diff = int(q[0]) - pred
    t, bits = mag(diff)
    ln, code = dc_enc[t]
    bw.write(code, ln)
    if t:
        bw.write(bits, t)
    run = 0
    for k in range(1, 64):
        v = int(q[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = ac_enc[0xF0]
            bw.write(code, ln)
            run -= 16
        t, bits = mag(v)
        ln, code = ac_enc[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run = 0
    if run:
        ln, code = ac_enc[0x00]
        bw.write(code, ln)
    return int(q[0])


def encode(arr: np.ndarray, *, quality: int = 90, subsampling: str = "4:4:4") -> bytes:
    """(h, w, 3) or (h, w) uint8 array → baseline JPEG bytes.

    ``subsampling``: "4:4:4" (no chroma subsampling) or "4:2:0" (2×2
    box-averaged chroma — what most web JPEGs use, and the decoder's
    upsampling test path).  Grayscale input emits a 1-component file.
    """
    arr = np.asarray(arr, dtype=np.uint8)
    gray = arr.ndim == 2
    if not gray and (arr.ndim != 3 or arr.shape[2] != 3):
        raise ValueError("expected (h, w, 3) RGB or (h, w) grayscale")
    if subsampling not in ("4:4:4", "4:2:0"):
        raise ValueError("subsampling must be 4:4:4 or 4:2:0")
    h, w = arr.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    qlum = _scaled_quant(_QUANT_LUM, quality).reshape(8, 8)
    qchrom = _scaled_quant(_QUANT_CHROM, quality).reshape(8, 8)

    if gray:
        y = arr.astype(np.float64)
        planes = [(y, qlum, 1, 1)]
    else:
        rgb = arr.astype(np.float64)
        r, g, b = rgb[..., 0], rgb[..., 1], rgb[..., 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
        cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
        if subsampling == "4:2:0":
            # pad to even dims (edge replicate), then 2×2 box average
            cbp = np.pad(cb, ((0, h % 2), (0, w % 2)), mode="edge")
            crp = np.pad(cr, ((0, h % 2), (0, w % 2)), mode="edge")
            cb = (cbp[0::2, 0::2] + cbp[1::2, 0::2] + cbp[0::2, 1::2] + cbp[1::2, 1::2]) / 4.0
            cr = (crp[0::2, 0::2] + crp[1::2, 0::2] + crp[0::2, 1::2] + crp[1::2, 1::2]) / 4.0
            planes = [(y, qlum, 2, 2), (cb, qchrom, 1, 1), (cr, qchrom, 1, 1)]
        else:
            planes = [(y, qlum, 1, 1), (cb, qchrom, 1, 1), (cr, qchrom, 1, 1)]

    hmax = max(p[2] for p in planes)
    vmax = max(p[3] for p in planes)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    padded = []
    for pl, qt, H, V in planes:
        th, tw = mcuy * V * 8, mcux * H * 8
        ph, pw_ = pl.shape
        pl = np.pad(pl, ((0, th - ph), (0, tw - pw_)), mode="edge")
        padded.append((pl, qt, H, V))

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )

    def dqt(tid: int, qt: np.ndarray) -> bytes:
        zz = qt.reshape(-1)[_ZIGZAG].astype(np.uint8).tobytes()
        return b"\xff\xdb" + struct.pack(">H", 67) + bytes([tid]) + zz

    out += dqt(0, qlum)
    if not gray:
        out += dqt(1, qchrom)

    ncomp = 1 if gray else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for idx, (_pl, _qt, H, V) in enumerate(padded):
        sof += bytes([idx + 1, (H << 4) | V, 0 if idx == 0 else 1])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof

    def dht(tc: int, th_: int, counts: list[int], symbols: list[int]) -> bytes:
        body = bytes([(tc << 4) | th_]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    out += dht(0, 0, *_DC_LUM) + dht(1, 0, *_AC_LUM)
    if not gray:
        out += dht(0, 1, *_DC_CHROM) + dht(1, 1, *_AC_CHROM)

    sos = bytes([ncomp])
    for idx in range(ncomp):
        sos += bytes([idx + 1, 0 if idx == 0 else 0x11])
    sos += b"\x00\x3f\x00"
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos

    enc_tables = [
        (_build_encode_table(*_DC_LUM), _build_encode_table(*_AC_LUM))
    ] + [(_build_encode_table(*_DC_CHROM), _build_encode_table(*_AC_CHROM))] * (ncomp - 1)
    bw = _BitWriter()
    preds = [0] * ncomp
    for my in range(mcuy):
        for mx in range(mcux):
            for ci, (pl, qt, H, V) in enumerate(padded):
                dc_enc, ac_enc = enc_tables[ci]
                for v in range(V):
                    for u in range(H):
                        y0 = (my * V + v) * 8
                        x0 = (mx * H + u) * 8
                        preds[ci] = _encode_block(
                            bw, pl[y0 : y0 + 8, x0 : x0 + 8], qt, preds[ci], dc_enc, ac_enc
                        )
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"
