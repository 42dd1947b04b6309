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

Progressive (SOF2) decodes too (r6): the decoder accumulates quantized
coefficients per component across scans — spectral selection, successive
approximation (DC/AC first + refinement passes, EOB runs), interleaved
and non-interleaved scan orders — then runs one batched IDCT per
component; ``encode(progressive=True)`` emits a full scan script whose
pixels are pinned bit-identical to the sequential path.  Out of scope
(raises ValueError): arithmetic coding, 12-bit precision, hierarchical,
lossless.  Speed: this is a per-executor Python kernel behind Arrow-batched
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


def _split_entropy(data: bytes, start: int) -> tuple[list[bytes], int]:
    """Entropy-coded bytes from ``start`` → (restart segments with FF00
    unstuffed, position of the next real marker's 0xFF)."""
    segments: list[bytes] = []
    cur = bytearray()
    p = start
    while p < len(data):
        b = data[p]
        if b == 0xFF:
            nxt = data[p + 1] if p + 1 < len(data) else 0xD9
            if nxt == 0x00:
                cur.append(0xFF)
                p += 2
                continue
            if 0xD0 <= nxt <= 0xD7:
                segments.append(bytes(cur))
                cur = bytearray()
                p += 2
                continue
            break  # real marker (EOI / next SOS / tables)
        cur.append(b)
        p += 1
    segments.append(bytes(cur))
    return segments, p


def _decode_block_into(
    br: _BitReader,
    blk: np.ndarray,
    dc_tbl: dict | None,
    ac_tbl: dict | None,
    Ss: int,
    Se: int,
    Ah: int,
    Al: int,
    pred: dict,
    cs: int,
    eobrun: int,
) -> int:
    """Decode one data unit's contribution to its 64-coefficient store
    (zigzag order).  Handles every scan kind with one state machine:
    sequential (Ss=0, Se=63, Ah=Al=0), progressive DC first/refine and
    progressive AC first/refine (T.81 G.2: spectral selection +
    successive approximation).  Returns the updated EOB-run counter."""
    if Ss == 0:
        if Ah == 0:
            t = _decode_symbol(br, dc_tbl)
            diff = _extend(br.bits(t), t)
            pred[cs] += diff
            # valid 8-bit-precision DC coefficients fit int32 even shifted
            # by Al<=13; corrupt streams can run pred far outside — bound
            # it here instead of relying on NumPy int32 overflow behavior
            if not (-(1 << 17) <= pred[cs] <= (1 << 17)):
                raise ValueError("invalid JPEG: DC out of range")
            blk[0] = pred[cs] << Al
        else:  # DC refinement: one raw bit per block
            if br.bit():
                blk[0] |= 1 << Al
        if Se == 0:
            return eobrun
        k = 1
    else:
        k = Ss
    if Ah == 0:  # sequential AC / progressive AC first pass
        if eobrun > 0:
            return eobrun - 1
        while k <= Se:
            rs = _decode_symbol(br, ac_tbl)
            r, size = rs >> 4, rs & 15
            if size == 0:
                if r == 15:  # ZRL: 16 zeros
                    k += 16
                    continue
                eobrun = (1 << r) - 1  # EOBn: this block + 2^r-1+bits more
                if r:
                    eobrun += br.bits(r)
                break
            k += r
            if k > Se:
                raise ValueError("invalid JPEG: AC run overflow")
            blk[k] = _extend(br.bits(size), size) << Al
            k += 1
        return eobrun
    # progressive AC refinement (T.81 G.2.2 / the classic jdphuff walk):
    # runs count zero-HISTORY coefficients only; already-nonzero ones read
    # a correction bit in passing
    p1 = 1 << Al
    m1 = -1 << Al
    if eobrun == 0:
        while k <= Se:
            rs = _decode_symbol(br, ac_tbl)
            r, size = rs >> 4, rs & 15
            newval = 0
            if size == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.bits(r)
                    break
                # ZRL: skip 16 zero-history coefficients
            else:
                if size != 1:
                    raise ValueError("invalid JPEG: refinement size != 1")
                newval = p1 if br.bit() else m1
            while k <= Se:
                if blk[k] != 0:
                    if br.bit() and (blk[k] & p1) == 0:
                        blk[k] += p1 if blk[k] > 0 else m1
                    k += 1
                elif r == 0:
                    break
                else:
                    r -= 1
                    k += 1
            if newval and k <= Se:
                blk[k] = newval
            k += 1
    if eobrun > 0:
        while k <= Se:  # inside an EOB run: corrections only
            if blk[k] != 0:
                if br.bit() and (blk[k] & p1) == 0:
                    blk[k] += p1 if blk[k] > 0 else m1
            k += 1
        eobrun -= 1
    return eobrun


_PARSE_ERRORS = (
    struct.error, KeyError, IndexError, AttributeError, OverflowError,
    TypeError, ZeroDivisionError,
)


def decode(data: bytes) -> np.ndarray:
    """JPEG → (h, w, 3) uint8 RGB array — see ``_decode_impl``; any
    malformed-stream escape (missing tables, out-of-range reads,
    coefficient overflow...) is normalized to ValueError so corpus-scale
    consumers need exactly one except-clause per blob."""
    try:
        return _decode_impl(data)
    except ValueError:
        raise
    except _PARSE_ERRORS as exc:
        raise ValueError(
            "invalid JPEG: malformed stream (%s)" % type(exc).__name__
        ) from exc


def _decode_impl(data: bytes) -> np.ndarray:
    """JPEG → (h, w, 3) uint8 RGB array.

    Supports baseline sequential (SOF0/SOF1) and progressive (SOF2)
    DCT, 8-bit, 1 or 3 components, any integral sampling factors,
    DRI/RST intervals, multi-scan files.  The decoder accumulates
    quantized coefficients per component across scans (zigzag order),
    then dequantizes and runs one batched IDCT per component.  Raises
    ValueError for arithmetic coding, 12-bit precision, hierarchical.
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    quant: dict[int, np.ndarray] = {}  # tq → zigzag-order int32[64]
    huff: dict[tuple[int, int], dict] = {}  # (class, id) → decode table
    frame = None  # (h, w, comps) ; comps = [(id, H, V, tq)]
    restart_interval = 0
    coefs: dict[int, np.ndarray] = {}  # cid → (bh, bw, 64) int32, zigzag
    grid = None  # (hmax, vmax, mcux, mcuy)
    saw_scan = False
    i = 2
    while i + 1 < len(data):
        if data[i] != 0xFF:
            raise ValueError("invalid JPEG: expected marker")
        marker = data[i + 1]
        if marker == 0xFF:  # fill byte before a marker
            i += 1
            continue
        i += 2
        if marker == 0xD8:
            continue
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7:  # stray RST
            continue
        (seglen,) = struct.unpack(">H", data[i : i + 2])
        seg = data[i + 2 : i + seglen]
        if marker == 0xDB:  # DQT (tables arrive in zigzag order)
            p = 0
            while p < len(seg):
                pq, tq = seg[p] >> 4, seg[p] & 15
                p += 1
                if pq == 0:
                    quant[tq] = np.frombuffer(
                        seg[p : p + 64], dtype=np.uint8
                    ).astype(np.int32)
                    p += 64
                else:
                    quant[tq] = np.frombuffer(
                        seg[p : p + 128], dtype=">u2"
                    ).astype(np.int32)
                    p += 128
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                tc, th = seg[p] >> 4, seg[p] & 15
                counts = list(seg[p + 1 : p + 17])
                n = sum(counts)
                symbols = list(seg[p + 17 : p + 17 + n])
                huff[(tc, th)] = _build_decode_table(counts, symbols)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 sequential, SOF2 progressive
            precision = seg[0]
            if precision != 8:
                raise ValueError("only 8-bit JPEG supported")
            h, w = struct.unpack(">HH", seg[1:5])
            if h * w > 100_000_000:
                raise ValueError("invalid JPEG: dimensions exceed the 100M-pixel kernel cap")
            ncomp = seg[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, tq))
            frame = (h, w, comps)
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError(
                "only DCT sequential/progressive JPEG (SOF0/1/2) supported"
            )
        elif marker == 0xDD:  # DRI
            (restart_interval,) = struct.unpack(">H", seg[0:2])
        elif marker == 0xDA:  # SOS — decode this scan's entropy data now
            if frame is None:
                raise ValueError("invalid JPEG: SOS before SOF")
            h, w, comps = frame
            if len(comps) not in (1, 3):
                raise ValueError("only grayscale/YCbCr JPEG supported")
            if grid is None:
                hmax = max(c[1] for c in comps)
                vmax = max(c[2] for c in comps)
                grid = (hmax, vmax, -(-w // (8 * hmax)), -(-h // (8 * vmax)))
                for cid, H, V, _tq in comps:
                    coefs[cid] = np.zeros(
                        (grid[3] * V, grid[2] * H, 64), dtype=np.int32
                    )
            hmax, vmax, mcux, mcuy = grid
            ns = seg[0]
            scan_comps = []
            for c in range(ns):
                cs, tdta = seg[1 + 2 * c : 3 + 2 * c]
                scan_comps.append((cs, tdta >> 4, tdta & 15))
            Ss, Se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            Ah, Al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 15
            segments, i = _split_entropy(data, i + seglen)
            saw_scan = True

            by_id = {c[0]: c for c in comps}
            if ns > 1:  # interleaved: MCU order over the padded grid
                total = mcux * mcuy
            else:  # non-interleaved: the component's own 8×8 block grid
                _, H0, V0, _ = by_id[scan_comps[0][0]]
                bw0 = -(-(-(-w * H0 // hmax)) // 8)
                bh0 = -(-(-(-h * V0 // vmax)) // 8)
                total = bw0 * bh0
            pred = {cs: 0 for cs, _, _ in scan_comps}
            eobrun = 0
            seg_idx = 0
            br = _BitReader(segments[0])
            in_seg = 0
            for unit in range(total):
                if restart_interval and in_seg == restart_interval:
                    seg_idx += 1
                    if seg_idx >= len(segments):
                        raise ValueError("invalid JPEG: missing restart segment")
                    br = _BitReader(segments[seg_idx])
                    pred = {cs: 0 for cs, _, _ in scan_comps}
                    eobrun = 0
                    in_seg = 0
                in_seg += 1
                if ns > 1:
                    my, mx = divmod(unit, mcux)
                    for cs, td, ta in scan_comps:
                        _, H, V, _tq = by_id[cs]
                        dc_tbl = huff.get((0, td))
                        ac_tbl = huff.get((1, ta))
                        for v in range(V):
                            for u in range(H):
                                eobrun = _decode_block_into(
                                    br,
                                    coefs[cs][my * V + v, mx * H + u],
                                    dc_tbl, ac_tbl, Ss, Se, Ah, Al,
                                    pred, cs, eobrun,
                                )
                else:
                    cs, td, ta = scan_comps[0]
                    by, bx = divmod(unit, bw0)
                    eobrun = _decode_block_into(
                        br, coefs[cs][by, bx],
                        huff.get((0, td)), huff.get((1, ta)),
                        Ss, Se, Ah, Al, pred, cs, eobrun,
                    )
            continue  # i already points at the next marker
        # APPn/COM/others: skipped
        i += seglen
    if frame is None or not saw_scan:
        raise ValueError("invalid JPEG: missing SOF/SOS")
    h, w, comps = frame
    hmax, vmax, _mcux, _mcuy = grid

    # dequantize → dezigzag → one batched IDCT per component → upsample
    full = []
    for cid, H, V, tq in comps:
        arr = coefs[cid]
        deq = arr.astype(np.float64) * quant[tq]
        blocks = np.zeros(arr.shape, dtype=np.float64)
        blocks[..., _ZIGZAG] = deq  # natural[zigzag[k]] = scan[k]
        blocks = blocks.reshape(arr.shape[0], arr.shape[1], 8, 8)
        pix = _DCT_M.T @ blocks @ _DCT_M + 128.0
        plane = pix.transpose(0, 2, 1, 3).reshape(
            arr.shape[0] * 8, arr.shape[1] * 8
        )
        plane = np.repeat(np.repeat(plane, vmax // V, axis=0), hmax // H, axis=1)
        full.append(plane[:h, :w])
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


# Progressive AC table: the 162 baseline (run, size) symbols plus the 14
# EOBn run-length symbols (0x10..0xE0) progressive scans emit.  Canonical
# lengths: EOB at 2 bits, ZRL at 4, the rest at 8 — Kraft-valid with
# slack (64 + 16 + 174 < 256 eight-bit slots), so the all-ones code
# stays unused as T.81 C.2 requires.  Compression is mediocre; like
# every other table here it travels in the file's own DHT.
_AC_PROG = (
    [0, 1, 0, 1, 0, 0, 0, 174] + [0] * 8,
    [0x00, 0xF0]
    + [n << 4 for n in range(1, 15)]
    + [(run << 4) | size for size in range(1, 11) for run in range(16)],
)
assert sum(_AC_PROG[0]) == len(_AC_PROG[1]) == 176


class _ProgACState:
    """EOB-run + pending-correction-bit accumulator for one progressive
    AC scan (first or refinement pass)."""

    def __init__(self, bw: _BitWriter, ac_enc: dict):
        self.bw = bw
        self.ac = ac_enc
        self.eobrun = 0
        self.pending: list[int] = []

    def flush(self) -> None:
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            ln, code = self.ac[n << 4]
            self.bw.write(code, ln)
            if n:
                self.bw.write(self.eobrun - (1 << n), n)
            self.eobrun = 0
        for b in self.pending:
            self.bw.write(b, 1)
        self.pending.clear()

    def bump_eob(self, corrections: list[int]) -> None:
        self.eobrun += 1
        self.pending.extend(corrections)
        if self.eobrun == 0x7FFF:
            self.flush()


def _encode_ac_first_block(state: _ProgACState, band: np.ndarray, Al: int) -> None:
    """Progressive AC first pass for one block's band (zigzag slice):
    magnitude point transform (shift toward zero), runs + EOBn."""
    bw = state.bw
    vals = [
        (abs(int(v)) >> Al) * (1 if v > 0 else -1) for v in band
    ]
    last = -1
    for idx, v in enumerate(vals):
        if v:
            last = idx
    if last < 0:
        state.bump_eob([])
        return
    state.flush()
    run = 0
    for idx in range(last + 1):
        v = vals[idx]
        if v == 0:
            run += 1
            continue
        while run > 15:
            ln, code = state.ac[0xF0]
            bw.write(code, ln)
            run -= 16
        t = abs(v).bit_length()
        bits = v if v >= 0 else v + (1 << t) - 1
        ln, code = state.ac[(run << 4) | t]
        bw.write(code, ln)
        bw.write(bits, t)
        run = 0
    if last < len(vals) - 1:
        state.bump_eob([])


def _encode_ac_refine_block(state: _ProgACState, band: np.ndarray, Al: int) -> None:
    """Progressive AC refinement for one block's band: newly-significant
    coefficients as (run,1)+sign, correction bits for history-nonzero
    coefficients riding behind the next emitted code (T.81 G.1.2.3)."""
    bw = state.bw
    absv = [abs(int(v)) >> Al for v in band]
    eob = 0  # index one past the last newly-significant coefficient
    for idx, t in enumerate(absv):
        if t == 1:
            eob = idx + 1
    run = 0
    br_bits: list[int] = []
    for idx, t in enumerate(absv):
        if t == 0:
            run += 1
            continue
        # any nonzero: first discharge zero-runs > 15 as ZRLs, but only
        # while a newly-significant coefficient still lies ahead — the
        # decoder reads each ZRL's correction bits inline, so buffered
        # bits must ride with the code covering their positions
        while run > 15 and idx < eob:
            state.flush()
            ln, code = state.ac[0xF0]
            bw.write(code, ln)
            for b in br_bits:
                bw.write(b, 1)
            br_bits = []
            run -= 16
        if t > 1:  # history-nonzero: correction bit rides the next code
            br_bits.append(t & 1)
            continue
        state.flush()
        ln, code = state.ac[(run << 4) | 1]
        bw.write(code, ln)
        bw.write(1 if band[idx] > 0 else 0, 1)
        for b in br_bits:
            bw.write(b, 1)
        br_bits = []
        run = 0
    if eob < len(absv):  # trailing zeros/corrections fold into the EOB run
        state.bump_eob(br_bits)


def encode(
    arr: np.ndarray,
    *,
    quality: int = 90,
    subsampling: str = "4:4:4",
    progressive: bool = False,
) -> bytes:
    """(h, w, 3) or (h, w) uint8 array → JPEG bytes.

    ``subsampling``: "4:4:4" (no chroma subsampling) or "4:2:0" (2×2
    box-averaged chroma — what most web JPEGs use, and the decoder's
    upsampling test path).  Grayscale input emits a 1-component file.
    ``progressive=True`` emits an SOF2 file with spectral selection AND
    one successive-approximation level (DC+AC first passes at Al=1,
    refinement scans at Ah=1/Al=0) — the quantized coefficients are
    identical to the sequential file's, so decode() must reproduce the
    sequential pixels bit-for-bit; the tests pin exactly that.
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
    out += (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(
        ">H", 2 + len(sof)
    ) + sof

    def dht(tc: int, th_: int, counts: list[int], symbols: list[int]) -> bytes:
        body = bytes([(tc << 4) | th_]) + bytes(counts) + bytes(symbols)
        return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body

    if progressive:
        out += dht(0, 0, *_DC_LUM) + dht(1, 0, *_AC_PROG)
        if not gray:
            out += dht(0, 1, *_DC_CHROM)
        return bytes(out) + _emit_progressive_scans(
            padded, gray, ncomp, mcux, mcuy, hmax, vmax, h, w
        )

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


def _emit_progressive_scans(
    padded: list,
    gray: bool,
    ncomp: int,
    mcux: int,
    mcuy: int,
    hmax: int,
    vmax: int,
    h: int,
    w: int,
) -> bytes:
    """Entropy-code the progressive scan script: DC first (interleaved,
    Al=1) → AC first passes per component (spectral bands, Al=1) → DC
    refinement (raw bits, Al=0) → AC refinement passes (Ah=1, Al=0).
    Two successive-approximation levels exercise every decoder path;
    the final coefficients equal the sequential encoding's exactly."""
    # quantized coefficients per component, zigzag order, padded grid
    comp_zig = []
    for pl, qt, _H, _V in padded:
        bh, bwid = pl.shape[0] // 8, pl.shape[1] // 8
        blocks = pl.reshape(bh, 8, bwid, 8).transpose(0, 2, 1, 3)
        coef = _DCT_M @ (blocks - 128.0) @ _DCT_M.T
        q = np.round(coef / qt).astype(np.int32)
        comp_zig.append(q.reshape(bh, bwid, 64)[..., _ZIGZAG])

    dc_encs = [_build_encode_table(*_DC_LUM)] + [
        _build_encode_table(*_DC_CHROM)
    ] * (ncomp - 1)
    ac_enc = _build_encode_table(*_AC_PROG)

    def sos_header(specs: list[tuple[int, int, int]], Ss: int, Se: int, Ah: int, Al: int) -> bytes:
        body = bytes([len(specs)])
        for ci, td, ta in specs:
            body += bytes([ci + 1, (td << 4) | ta])
        body += bytes([Ss, Se, (Ah << 4) | Al])
        return b"\xff\xda" + struct.pack(">H", 2 + len(body)) + body

    def mcu_blocks():
        """(component index, block row, block col) in interleaved order."""
        for my in range(mcuy):
            for mx in range(mcux):
                for ci, (_pl, _qt, H, V) in enumerate(padded):
                    for v in range(V):
                        for u in range(H):
                            yield ci, my * V + v, mx * H + u

    def emit_dc_first(Al: int) -> bytes:
        bw = _BitWriter()
        preds = [0] * ncomp
        for ci, by, bx in mcu_blocks():
            val = int(comp_zig[ci][by, bx, 0]) >> Al  # arithmetic shift (T.81 G.1.2.1)
            diff = val - preds[ci]
            preds[ci] = val
            t = abs(diff).bit_length()
            bits = diff if diff >= 0 else diff + (1 << t) - 1
            ln, code = dc_encs[ci][t]
            bw.write(code, ln)
            if t:
                bw.write(bits, t)
        bw.flush()
        return bytes(bw.out)

    def emit_dc_refine(Al: int) -> bytes:
        bw = _BitWriter()
        for ci, by, bx in mcu_blocks():
            bw.write((int(comp_zig[ci][by, bx, 0]) >> Al) & 1, 1)
        bw.flush()
        return bytes(bw.out)

    def emit_ac(ci: int, Ss: int, Se: int, Al: int, refine: bool) -> bytes:
        _pl, _qt, H, V = padded[ci]
        bh0 = -(-(-(-h * V // vmax)) // 8)  # the component's TRUE block grid
        bw0 = -(-(-(-w * H // hmax)) // 8)
        bw = _BitWriter()
        state = _ProgACState(bw, ac_enc)
        block_fn = _encode_ac_refine_block if refine else _encode_ac_first_block
        for by in range(bh0):
            for bx in range(bw0):
                block_fn(state, comp_zig[ci][by, bx, Ss : Se + 1], Al)
        state.flush()
        bw.flush()
        return bytes(bw.out)

    dc_specs = [(ci, 0 if ci == 0 else 1, 0) for ci in range(ncomp)]
    bands = lambda ci: [(1, 5), (6, 63)] if ci == 0 else [(1, 63)]  # noqa: E731
    out = bytearray()
    out += sos_header(dc_specs, 0, 0, 0, 1) + emit_dc_first(1)
    for ci in range(ncomp):
        for s0, s1 in bands(ci):
            out += sos_header([(ci, 0, 0)], s0, s1, 0, 1) + emit_ac(
                ci, s0, s1, 1, refine=False
            )
    out += sos_header(dc_specs, 0, 0, 1, 0) + emit_dc_refine(0)
    for ci in range(ncomp):
        for s0, s1 in bands(ci):
            out += sos_header([(ci, 0, 0)], s0, s1, 1, 0) + emit_ac(
                ci, s0, s1, 0, refine=True
            )
    out += b"\xff\xd9"
    return bytes(out)


def is_jpeg(data: bytes) -> bool:
    return len(data) >= 3 and data[:3] == b"\xff\xd8\xff"
