"""Multimodal (image/audio/video) column operators — north-star addendum.

Design: media are opaque ``binary`` columns + a typed metadata struct.

- **Header parsing stays JVM-side.**  Container sniffing (WAV / PNG /
  BMP / GIF magic) and dimension extraction are pure column expressions —
  fixed-offset integer fields read with ``conv(hex(substring(...)))`` —
  so ``attach_media_meta`` runs inside whole-stage codegen with no Python
  crossing at all.
- **Sample/pixel decode crosses to Python once per Arrow batch** via
  ``mapInPandas``: real kernels for WAV features/fingerprints across
  integer PCM, IEEE float, G.711 and IMA ADPCM (r6,
  ``operators/wavcodec.py``),
  P6 PPM (numpy), baseline JPEG (r5, pure-numpy ``operators/jpeg.py``),
  baseline PNG (r6, stdlib-zlib ``operators/png.py``), uncompressed BMP
  (r6, ``operators/bmp.py``) and GIF87a/89a first frame (r6, pure-LZW
  ``operators/gif.py``) — decode, dHash, resize, features all run on
  real pixels for those formats.
  Variable-offset container metadata (MP4/ISO-BMFF box walk, JPEG SOF
  dimensions) is read by the pure-struct ``mp4_meta`` kernel behind
  ``attach_media_meta(deep=True)``.  PNG covers Adam7 interlace and
  JPEG covers progressive (SOF2) too.  The one remaining compressed
  format — video FRAME decode — needs codecs this container lacks;
  that kernel raises ``NotImplementedError`` with the same plumbing,
  so production swaps in PyAV without touching the plan.
"""

from __future__ import annotations

import hashlib
import math
from typing import Callable, Iterator

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

MEDIA_META_SCHEMA = "media_type string, width int, height int, duration_ms int"


def _uint(col: Column, pos: int, nbytes: int, *, little_endian: bool) -> Column:
    """Unsigned integer at 1-based byte offset ``pos``, parsed JVM-side."""
    byts = [
        F.conv(F.hex(F.substring(col, pos + i, 1)), 16, 10).cast("long")
        for i in range(nbytes)
    ]
    if little_endian:
        byts = list(reversed(byts))
    out = byts[0]
    for b in byts[1:]:
        out = out * 256 + b
    return out


def attach_media_meta(
    df: DataFrame, binary_col: str = "data", *, deep: bool = False
) -> DataFrame:
    """Derive the typed metadata struct from raw bytes — REAL container
    sniffing as pure column expressions (no Python, no UDF):

    - WAV (``RIFF....WAVE``): duration from byte-rate and payload length
      (canonical 16-byte PCM fmt chunk: byte_rate at offset 29).
    - FLAC (``fLaC`` + STREAMINFO): duration from the fixed-offset
      20-bit sample rate / 36-bit total-samples fields (r12).
    - MP3 (``ID3`` tag, or — r13 — a BARE stream whose first bytes
      validate as an MPEG-1 Layer III header): the first frame header
      is located THROUGH the synchsafe tag size (a computed-offset
      substr — still no Python) and validated before any number is
      emitted.  Duration: exact ``frames*1152/rate`` when a Xing/Info
      VBR header sits at the computed 4+side-info offset with the
      FRAMES flag set (r13 — the CBR estimate is 2x+ off on VBR
      files); otherwise the CBR estimate payload*8/bitrate (r12).
    - PNG: big-endian IHDR width/height at offsets 17/21.
    - BMP: little-endian SIGNED int32 width/height at offsets 19/23
      (top-down BMPs store a negative biHeight; reported as |height|).
    - GIF (``GIF8``): little-endian uint16 logical-screen size at 7/9.
    - MP4/ISO-BMFF (``ftyp`` at offset 5): media_type='video'.

    Unknown containers get media_type='unknown' and null fields.

    ``deep=True`` additionally fills the fields that live at VARIABLE
    offsets — MP4 width/height/duration via the ``mp4_meta`` box walk
    and JPEG dimensions via the SOF marker walk — through one
    Arrow-batched scalar pandas UDF, coalesced under the JVM-sniffed
    values (fixed-offset formats never cross to Python for nothing:
    their fields come from the codegen'd expressions either way).
    """
    d = F.col(binary_col)
    is_wav = (F.substring(d, 1, 4) == F.lit(b"RIFF")) & (
        F.substring(d, 9, 4) == F.lit(b"WAVE")
    )
    # the full 4-byte prefix including the discriminating \x89 — matching
    # only bytes 2-4 would tag any blob with 'PNG' at offset 1 as an image
    is_png = F.substring(d, 1, 4) == F.lit(b"\x89PNG")
    is_bmp = F.substring(d, 1, 2) == F.lit(b"BM")
    is_gif = F.substring(d, 1, 4) == F.lit(b"GIF8")
    # JPEG: SOI + marker prefix.  Type only — dimensions live in the SOF
    # segment at a variable offset (the jpeg.py kernel reads them); a
    # fixed-offset column expression cannot reach them.
    is_jpg = F.substring(d, 1, 3) == F.lit(b"\xff\xd8\xff")
    # ISO-BMFF: every file starts with an 'ftyp' box — its fourcc sits at
    # bytes 5-8.  Dimensions/duration live in moov at variable offsets
    # (deep=True reaches them via the mp4_meta box walk).
    is_mp4 = F.substring(d, 5, 4) == F.lit(b"ftyp")
    # AVI: RIFF form type 'AVI '.  The universal writer layout puts the
    # avih payload at absolute offset 32 (RIFF 12 + LIST-hdrl 12 + chunk
    # header 8): µs/frame @33, total frames @49, width @65, height @69
    # (1-based) — fixed-offset reads like the other containers.
    is_avi = (F.substring(d, 1, 4) == F.lit(b"RIFF")) & (
        F.substring(d, 9, 4) == F.lit(b"AVI ")
    ) & (F.substring(d, 25, 4) == F.lit(b"avih"))
    # MP3 (r12, extended r13/r14): an ID3v2 tag marks the family — the
    # tag SIZE is a fixed-offset synchsafe u28 (bytes 7-10), so the first
    # MPEG frame header sits at the COMPUTED offset 11+size — and, r13,
    # a BARE stream (no tag — old rips, stream dumps) is recognized by
    # the same Layer III header validation at offset 0.  r14 widens the
    # accepted versions from MPEG-1-only to MPEG-2 (version bits 10:
    # 22.05/24/16 kHz) and MPEG-2.5 (bits 00: 11.025/12/8 kHz) with
    # their own bitrate column and 576 samples/frame; version bits 01
    # (reserved) stay rejected.  All still pure column expressions via
    # substr-with-column-pos.
    # Duration: a Xing/Info header (the LAME/VBR convention — 4 header
    # bytes + 2 CRC bytes when the protection bit is 0 + side-info
    # bytes into the first frame; side info 17 mono / 32 otherwise for
    # MPEG-1, 9 / 17 for MPEG-2/2.5) with the FRAMES flag set gives the
    # EXACT frames*samples_per_frame/rate; otherwise the standard CBR
    # estimate payload_bytes*8/bitrate, emitted only when the frame
    # validates with a defined bitrate (frame DATA stays undecoded —
    # the lossy-codec boundary, DEVIATIONS.md #5, same stance as MP4).
    def _uint_at(pos_col: Column) -> Column:
        return F.conv(
            F.hex(F.substr(d, pos_col, F.lit(1))), 16, 10
        ).cast("long")

    is_id3 = F.substring(d, 1, 3) == F.lit(b"ID3")
    id3_size = (
        _uint(d, 7, 1, little_endian=False) * F.lit(1 << 21)
        + _uint(d, 8, 1, little_endian=False) * F.lit(1 << 14)
        + _uint(d, 9, 1, little_endian=False) * F.lit(1 << 7)
        + _uint(d, 10, 1, little_endian=False)
    )
    # 1-based position of the first MPEG header byte: past the tag for
    # ID3 files, byte 1 for bare streams
    mp3_pos = F.when(is_id3, id3_size + 11).otherwise(F.lit(1).cast("long"))
    mp3_h1 = _uint_at(mp3_pos)
    mp3_h2 = _uint_at(mp3_pos + 1)
    mp3_h3 = _uint_at(mp3_pos + 2)
    mp3_h4 = _uint_at(mp3_pos + 3)
    # version bits 4-3 of byte 2: 11=MPEG-1, 10=MPEG-2, 00=MPEG-2.5,
    # 01=reserved (rejected)
    mp3_ver = F.floor(mp3_h2 / 8) % 4
    mp3_frame_ok = (
        (mp3_h1 == 255)
        # 11-bit sync: top 3 bits of byte 2 all set
        & (F.floor(mp3_h2 / 32) == 7)
        # Layer III (bits 2-1 = 01)
        & (F.floor(mp3_h2 / 2) % 4 == 1)
        & (mp3_ver != 1)
    )
    is_mp3_bare = (~is_id3) & mp3_frame_ok
    is_mp3 = is_id3 | is_mp3_bare
    # Layer III bitrate columns: MPEG-1 vs MPEG-2/2.5 (indices 0 and
    # 15 are free/bad in both — no duration estimate)
    mp3_kbps = F.lit(None).cast("long")
    _V1 = (None, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224,
           256, 320, None)
    _V2 = (None, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144,
           160, None)
    for idx in range(1, 15):
        mp3_kbps = F.when(
            F.floor(mp3_h3 / 16) == idx,
            F.when(mp3_ver == 3, F.lit(_V1[idx]))
            .otherwise(F.lit(_V2[idx]))
            .cast("long"),
        ).otherwise(mp3_kbps)
    # Sample rate (header bits 3-2 of byte 3): MPEG-1 44.1/48/32 kHz;
    # MPEG-2 halves and MPEG-2.5 quarters the same column (all exact
    # integer divisions: 22050/24000/16000 and 11025/12000/8000)
    mp3_base_rate = (
        F.when(F.floor(mp3_h3 / 4) % 4 == 0, F.lit(44100))
        .when(F.floor(mp3_h3 / 4) % 4 == 1, F.lit(48000))
        .when(F.floor(mp3_h3 / 4) % 4 == 2, F.lit(32000))
        .cast("long")
    )
    mp3_rate = (
        F.when(mp3_ver == 3, mp3_base_rate)
        .when(mp3_ver == 2, mp3_base_rate / 2)
        .otherwise(mp3_base_rate / 4)
        .cast("long")
    )
    # samples per frame, Layer III: 1152 MPEG-1, 576 MPEG-2/2.5
    mp3_spf = F.when(mp3_ver == 3, F.lit(1152)).otherwise(F.lit(576))
    # Xing/Info VBR header: 4 header bytes + (2 CRC bytes when the
    # protection bit — bit 0 of byte 2 — is 0, i.e. CRC-protected) +
    # side-info bytes into the frame.  Side info: MPEG-1 17 bytes mono
    # (channel mode bits 7-6 of byte 4 == 11) else 32; MPEG-2/2.5
    # 9 mono else 17.  FRAMES flag = bit 0 of the big-endian u32 after
    # the magic; frame count = the next big-endian u32.  Duration is
    # then EXACT frames*spf/rate — the CBR estimate can be 2x+ off on
    # VBR files.
    mp3_mono = F.floor(mp3_h4 / 64) == 3
    mp3_side = F.when(
        mp3_ver == 3,
        F.when(mp3_mono, F.lit(17)).otherwise(F.lit(32)),
    ).otherwise(F.when(mp3_mono, F.lit(9)).otherwise(F.lit(17)))
    mp3_crc = F.when(mp3_h2 % 2 == 0, F.lit(2)).otherwise(F.lit(0))
    xing_pos = mp3_pos + 4 + mp3_crc + mp3_side
    xing_magic = F.substr(d, xing_pos, F.lit(4))
    has_xing = (xing_magic == F.lit(b"Xing")) | (xing_magic == F.lit(b"Info"))
    xing_frames_flag = _uint_at(xing_pos + 7) % 2 == 1
    xing_frames = (
        _uint_at(xing_pos + 8) * F.lit(1 << 24)
        + _uint_at(xing_pos + 9) * F.lit(1 << 16)
        + _uint_at(xing_pos + 10) * F.lit(1 << 8)
        + _uint_at(xing_pos + 11)
    )
    # FLAC: magic + the mandatory STREAMINFO first metadata block
    # (header byte 5 = last-flag<<7 | type, type 0) — sample rate is a
    # 20-bit field at bytes 19-21, total samples 36 bits at 22-26, all
    # FIXED offsets, so duration comes from codegen'd expressions like
    # WAV's (flac.py decodes the actual frames)
    is_flac = (F.substring(d, 1, 4) == F.lit(b"fLaC")) & (
        _uint(d, 5, 1, little_endian=False) % 128 == 0
    )
    flac_rate = (
        _uint(d, 19, 1, little_endian=False) * 4096
        + _uint(d, 20, 1, little_endian=False) * 16
        + F.floor(_uint(d, 21, 1, little_endian=False) / 16)
    )
    flac_total = (
        (_uint(d, 22, 1, little_endian=False) % 16) * F.lit(1 << 32)
        + _uint(d, 23, 4, little_endian=False)
    )
    byte_rate = _uint(d, 29, 4, little_endian=True)

    def _signed32(u: Column) -> Column:
        # biWidth/biHeight are SIGNED (negative height = top-down BMP);
        # reinterpret the unsigned read and report the magnitude
        return F.abs(F.when(u >= F.lit(1 << 31), u - F.lit(1 << 32)).otherwise(u))

    null_i = F.lit(None).cast("int")
    media_type = (
        F.when(is_wav | is_flac | is_mp3, F.lit("audio"))
        .when(is_mp4 | is_avi, F.lit("video"))
        .when(is_png | is_bmp | is_gif | is_jpg, F.lit("image"))
        .otherwise(F.lit("unknown"))
    )
    width = (
        F.when(is_png, _uint(d, 17, 4, little_endian=False))
        .when(is_bmp, _signed32(_uint(d, 19, 4, little_endian=True)))
        .when(is_gif, _uint(d, 7, 2, little_endian=True))
        .when(is_avi, _uint(d, 65, 4, little_endian=True))
        .cast("int")
    )
    height = (
        F.when(is_png, _uint(d, 21, 4, little_endian=False))
        .when(is_bmp, _signed32(_uint(d, 23, 4, little_endian=True)))
        .when(is_gif, _uint(d, 9, 2, little_endian=True))
        .when(is_avi, _uint(d, 69, 4, little_endian=True))
        .cast("int")
    )
    duration_ms = (
        F.when(is_wav & (byte_rate > 0), ((F.length(d) - 44) * 1000 / byte_rate))
        .when(is_flac & (flac_rate > 0), flac_total * 1000 / flac_rate)
        .when(
            is_mp3 & mp3_frame_ok & has_xing & xing_frames_flag
            & mp3_rate.isNotNull(),
            # Xing/Info frame count → exact: frames * spf / rate (ms)
            xing_frames * mp3_spf * 1000 / mp3_rate,
        )
        .when(
            is_mp3 & mp3_frame_ok & mp3_kbps.isNotNull(),
            # CBR estimate: payload bits / bitrate (bits per ms = kbps);
            # mp3_pos - 1 bytes of tag precede the audio stream
            (F.length(d) - (mp3_pos - 1)) * 8 / mp3_kbps,
        )
        .when(
            is_avi,
            (_uint(d, 33, 4, little_endian=True)  # µs per frame
             * _uint(d, 49, 4, little_endian=True)) / 1000,  # × frames
        )
        .otherwise(null_i)
        .cast("int")
    )
    if deep:
        deep_col = _deep_meta_udf()(d)
        width = F.coalesce(width, deep_col["width"])
        height = F.coalesce(height, deep_col["height"])
        duration_ms = F.coalesce(duration_ms, deep_col["duration_ms"])
    return df.withColumn(
        "media_meta",
        F.struct(
            media_type.alias("media_type"),
            width.alias("width"),
            height.alias("height"),
            duration_ms.alias("duration_ms"),
        ),
    )


def mp4_meta(data: bytes) -> dict:
    """ISO-BMFF (MP4/MOV/M4A) metadata via a GENERAL pure-struct box
    walk — no frame decode (inter-frame codecs are the documented
    boundary, DEVIATIONS.md #5; the reference's media path is service
    UDF parsers, reference python/pathway/xpacks/llm/parsers.py:53-746).

    Walks the top-level box stream (32-bit sizes, size==1 → 64-bit
    largesize, size==0 → to-end-of-enclosing), then:

    - ``moov/mvhd`` (v0/v1): timescale + duration → duration_ms,
    - ``moov/trak`` count → track_count,
    - each ``trak/tkhd`` (v0/v1): 16.16 fixed-point width/height —
      first visual track (nonzero dims) wins,
    - first ``trak/mdia/minf/stbl/stsd`` sample-entry fourcc → codec.

    Returns dict(duration_ms, width, height, codec, track_count) with
    None for anything absent; raises ValueError if the stream is not
    ISO-BMFF (no leading ftyp box).
    """
    import struct as _struct

    data = bytes(data)

    def boxes(start: int, end: int):
        pos = start
        while pos + 8 <= end:
            (size,) = _struct.unpack_from(">I", data, pos)
            btype = data[pos + 4 : pos + 8]
            hdr = 8
            if size == 1:
                if pos + 16 > end:
                    return
                (size,) = _struct.unpack_from(">Q", data, pos + 8)
                hdr = 16
            elif size == 0:
                size = end - pos
            if size < hdr or pos + size > end:
                return
            yield btype, pos + hdr, pos + size
            pos += size

    def find(start: int, end: int, btype: bytes):
        for t, s, e in boxes(start, end):
            if t == btype:
                return s, e
        return None

    top = list(boxes(0, len(data)))
    if not top or top[0][0] != b"ftyp":
        raise ValueError("not an ISO-BMFF stream (no leading ftyp box)")
    out: dict = {
        "duration_ms": None,
        "width": None,
        "height": None,
        "codec": None,
        "track_count": None,
    }
    moov = find(0, len(data), b"moov")
    if moov is None:
        return out
    ms, me = moov
    mvhd = find(ms, me, b"mvhd")
    if mvhd is not None:
        s, e = mvhd
        version = data[s]
        if version == 1 and e - s >= 32:
            (timescale,) = _struct.unpack_from(">I", data, s + 20)
            (duration,) = _struct.unpack_from(">Q", data, s + 24)
        elif e - s >= 20:
            (timescale,) = _struct.unpack_from(">I", data, s + 12)
            (duration,) = _struct.unpack_from(">I", data, s + 16)
        else:
            timescale = 0
            duration = 0
        if timescale:
            out["duration_ms"] = duration * 1000 // timescale
    traks = [(s, e) for t, s, e in boxes(ms, me) if t == b"trak"]
    out["track_count"] = len(traks)
    for ts, te in traks:
        tkhd = find(ts, te, b"tkhd")
        if tkhd is not None:
            s, e = tkhd
            off = s + (88 if data[s] == 1 else 76)  # v1 has 64-bit times
            if e - off >= 8:
                (w_fx, h_fx) = _struct.unpack_from(">II", data, off)
                if w_fx and h_fx and out["width"] is None:
                    out["width"] = w_fx >> 16  # 16.16 fixed point
                    out["height"] = h_fx >> 16
        if out["codec"] is None:
            path = (b"mdia", b"minf", b"stbl", b"stsd")
            span: tuple[int, int] | None = (ts, te)
            for part in path:
                span = find(span[0], span[1], part) if span else None
            if span is not None and span[1] - span[0] >= 16:
                # stsd payload: version+flags(4) entry_count(4), then the
                # first sample entry: size(4) + format fourcc(4)
                out["codec"] = data[span[0] + 12 : span[0] + 16].decode(
                    "ascii", "replace"
                )
    return out


def _jpeg_dims(data: bytes) -> tuple[int, int] | None:
    """(width, height) from the first SOFn marker via the standard
    segment walk (any SOF0-15 except DHT/DNL/DAC carries dimensions —
    works for progressive files too, whose PIXEL decode stays out of
    scope)."""
    import struct as _struct

    if data[:3] != b"\xff\xd8\xff":
        return None
    pos = 2
    n = len(data)
    while pos + 4 <= n:
        if data[pos] != 0xFF:
            return None
        marker = data[pos + 1]
        if marker == 0xD8 or 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2  # standalone markers have no length field
            continue
        (seg_len,) = _struct.unpack_from(">H", data, pos + 2)
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if pos + 9 > n:
                return None
            (h,) = _struct.unpack_from(">H", data, pos + 5)
            (w,) = _struct.unpack_from(">H", data, pos + 7)
            return w, h
        if marker == 0xDA:  # SOS: entropy data follows, no SOF seen
            return None
        pos += 2 + seg_len
    return None


def _deep_meta_udf():
    """Scalar pandas UDF filling variable-offset metadata (MP4 box walk
    + JPEG SOF dims) — one Arrow crossing per batch; fixed-offset
    formats return all-null rows and keep their JVM-derived values."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def _fn(blobs):
        ws, hs, ds = [], [], []
        for raw in blobs:
            w = h = dur = None
            data = bytes(raw or b"")
            if len(data) >= 12 and data[4:8] == b"ftyp":
                try:
                    meta = mp4_meta(data)
                    w, h, dur = meta["width"], meta["height"], meta["duration_ms"]
                except ValueError:
                    pass
            elif data[:3] == b"\xff\xd8\xff":
                dims = _jpeg_dims(data)
                if dims is not None:
                    w, h = dims
            ws.append(w)
            hs.append(h)
            ds.append(dur)
        return pd.DataFrame({"width": ws, "height": hs, "duration_ms": ds})

    # real annotation objects (`from __future__ import annotations`
    # stringifies inline hints, which pandas_udf inference can't eval)
    _fn.__annotations__ = {"blobs": pd.Series, "return": pd.DataFrame}
    return pandas_udf(_fn, "width int, height int, duration_ms int")


def wav_features(data: bytes) -> list[float]:
    """REAL audio feature kernel for WAV (operators/wavcodec.py + numpy,
    no external codec): [duration_s, rms, peak, zero_crossing_rate].
    Covers integer PCM 8/16/24/32, IEEE float32/64, G.711 µ-law/A-law
    and IMA ADPCM — every WAVE format tag the wavcodec parser decodes."""
    import numpy as np

    from pathwaydataframework_spark.operators import wavcodec as _wav

    samples, sr, scale = _wav.decode(bytes(data))
    n = samples.shape[0]
    # interleave channels into one stream — the historical feature
    # contract (rms/peak are channel-order invariant; zcr matches the
    # raw-stream reading used before multi-format support)
    x = samples.reshape(-1).astype(np.float64)
    if scale is not None:
        x = x / float(scale)
    if x.size == 0 or sr == 0:
        return [0.0, 0.0, 0.0, 0.0]
    return [
        n / sr,
        float(np.sqrt(np.mean(x * x))),
        float(np.max(np.abs(x))),
        float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))),
    ]


def decode_image(data: bytes):
    """bytes → (h, w, 3) uint8 RGB for the formats with REAL in-repo
    kernels: P6 PPM (numpy), baseline JPEG (operators/jpeg.py),
    baseline PNG incl. Adam7 (operators/png.py), uncompressed BMP
    (operators/bmp.py) and GIF87a/89a first frame (operators/gif.py).
    Raises ValueError for anything else — the honest codec boundary
    (production swaps Pillow in front; every consumer below keeps its
    plan)."""
    from pathwaydataframework_spark.operators import bmp as _bmp
    from pathwaydataframework_spark.operators import gif as _gif
    from pathwaydataframework_spark.operators import jpeg as _jpeg
    from pathwaydataframework_spark.operators import png as _png

    data = bytes(data)
    if _jpeg.is_jpeg(data):
        return _jpeg.decode(data)
    if _png.is_png(data):
        return _png.decode(data)
    if _bmp.is_bmp(data):
        return _bmp.decode(data)
    if _gif.is_gif(data):
        return _gif.decode(data)
    return _ppm_decode(data)


def _default_image_decoder(data: bytes) -> list[float]:
    """8-dim image feature: REAL pixel statistics for decodable formats
    (PPM/JPEG — per-channel means, luminance mean/std, aspect, log-area,
    edge energy), deterministic sha-derived fallback for codec-bound
    blobs so the plumbing keeps flowing."""
    import numpy as np

    try:
        img = decode_image(bytes(data or b""))
        px = img.astype(np.float64)
        lum = 0.299 * px[..., 0] + 0.587 * px[..., 1] + 0.114 * px[..., 2]
        h, w = lum.shape
        edge = float(np.mean(np.abs(np.diff(lum, axis=1)))) if w > 1 else 0.0
        return [
            float(px[..., 0].mean()) / 255.0,
            float(px[..., 1].mean()) / 255.0,
            float(px[..., 2].mean()) / 255.0,
            float(lum.mean()) / 255.0,
            float(lum.std()) / 255.0,
            w / (h + w),
            math.log1p(h * w) / 20.0,
            edge / 255.0,
        ]
    except (ValueError, TypeError, IndexError):
        digest = hashlib.sha256(data or b"").digest()
        return [b / 255.0 for b in digest[:8]]


def extract_features(
    df: DataFrame,
    *,
    binary_col: str = "data",
    id_col: str = "media_id",
    decoder: Callable[[bytes], list[float]] | None = None,
    feature_dim: int = 8,
) -> DataFrame:
    """binary column → fixed-dim feature vector via Arrow-batched
    mapInPandas (one Python crossing per batch; partition-parallel).
    Pass ``decoder=wav_features`` (feature_dim=4) for real PCM audio."""
    decoder = decoder or _default_image_decoder
    id_type = dict(df.dtypes)[id_col]
    out_schema = f"{id_col} {id_type}, features array<double>"

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            feats = [decoder(bytes(x)) if x is not None else [0.0] * feature_dim for x in pdf[binary_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "features": feats})

    return df.select(id_col, binary_col).mapInPandas(_mapper, out_schema)


def frame_sample(
    df: DataFrame,
    *,
    binary_col: str = "data",
    id_col: str = "media_id",
    n_frames: int = 4,
) -> DataFrame:
    """video/animation binary → n sampled frame rows (explode pattern).

    REAL demux for the two containers the in-repo codecs can take to
    pixels, STUB byte-slices for the rest:

    - **animated GIF** (operators/gif.py): a cheap structural walk
      counts frames, ``decode_frames`` composes the canvas (disposal +
      transparency), and each sampled snapshot is re-encoded as PNG —
      a standalone image blob any downstream ``decode_image`` consumer
      reads.  ``frame_idx`` is the ORIGINAL frame number.
    - **MJPEG AVI** (operators/avi.py): the RIFF walk yields one
      complete JPEG per ``##dc`` chunk; sampled payloads are emitted
      verbatim (already standalone images).
    - **raw (BI_RGB) AVI** (operators/avi.py dib_frames, r10): each
      ``##db``/``##dc`` payload is an uncompressed DIB pixel array —
      wrapped with the stream's BITMAPINFOHEADER into a standalone BMP
      the operators/bmp.py kernel decodes, so raw-video AVIs sample to
      real decodable frames too.
    - anything else (inter-frame codecs — DEVIATIONS.md #5): the
      deterministic byte-slice stub, so the plumbing shape survives
      until production swaps in a PyAV kernel.
    """
    out_schema = (
        f"{id_col} {dict(df.dtypes)[id_col]}, frame_idx int, frame_bytes binary"
    )

    def _sample_indices(total: int) -> list[int]:
        if total <= n_frames:
            return list(range(total))
        return [i * total // n_frames for i in range(n_frames)]

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        from pathwaydataframework_spark.operators import avi as _avi
        from pathwaydataframework_spark.operators import gif as _gif
        from pathwaydataframework_spark.operators import png as _png

        for pdf in batches:
            ids, idxs, frames = [], [], []

            def emit(mid, i, blob):
                ids.append(mid)
                idxs.append(i)
                frames.append(blob)

            for mid, raw in zip(pdf[id_col], pdf[binary_col]):
                raw = bytes(raw or b"")
                if _gif.is_gif(raw):
                    picks = _sample_indices(_gif.count_frames(raw))
                    if picks:
                        composed = _gif.decode_frames(
                            raw, max_frames=picks[-1] + 1
                        )
                        for i in picks:
                            emit(mid, i, _png.encode(composed[i]))
                        continue
                elif _avi.is_avi(raw):
                    # one RIFF walk; the declared compression routes to
                    # BMP-wrapped DIBs or verbatim JPEGs (avi.py)
                    imgs = _avi.image_frames(raw)
                    if imgs:
                        for i in _sample_indices(len(imgs)):
                            emit(mid, i, imgs[i])
                        continue
                step = max(len(raw) // n_frames, 1)
                for i in range(n_frames):
                    emit(mid, i, raw[i * step : (i + 1) * step])
            yield pd.DataFrame({id_col: ids, "frame_idx": idxs, "frame_bytes": frames})

    return df.select(id_col, binary_col).mapInPandas(_mapper, out_schema)


def _ppm_decode(data: bytes):
    """P6 PPM → (h, w, 3) uint8 array.  Raises ValueError on other formats."""
    import numpy as np

    if not data.startswith(b"P6"):
        raise ValueError("not a P6 PPM")
    parts: list[int] = []
    pos = 2
    while len(parts) < 3:
        while pos < len(data) and data[pos : pos + 1].isspace():
            pos += 1
        if data[pos : pos + 1] == b"#":  # comment line
            pos = data.index(b"\n", pos) + 1
            continue
        end = pos
        while end < len(data) and not data[end : end + 1].isspace():
            end += 1
        parts.append(int(data[pos:end]))
        pos = end
    pos += 1  # single whitespace after maxval
    w, h, _maxval = parts
    px = np.frombuffer(data, dtype=np.uint8, count=w * h * 3, offset=pos)
    return px.reshape(h, w, 3)


def _ppm_encode(arr) -> bytes:
    h, w, _ = arr.shape
    return b"P6\n%d %d\n255\n" % (w, h) + arr.tobytes()


def ppm_resize(data: bytes, width: int, height: int) -> bytes:
    """REAL nearest-neighbor resize for P6 PPM (pure numpy indexing)."""
    import numpy as np

    img = _ppm_decode(data)
    h, w, _ = img.shape
    rows = (np.arange(height) * h // height).clip(0, h - 1)
    cols = (np.arange(width) * w // width).clip(0, w - 1)
    return _ppm_encode(np.ascontiguousarray(img[rows][:, cols]))


def resize_images(
    df: DataFrame,
    *,
    binary_col: str = "data",
    id_col: str = "media_id",
    width: int = 224,
    height: int = 224,
) -> DataFrame:
    """Image resize stage: REAL kernels for P6 PPM (numpy
    nearest-neighbor, PPM out), baseline JPEG (operators/jpeg.py decode
    → nearest resize → re-encode, JPEG out), baseline PNG
    (operators/png.py, PNG out), uncompressed BMP (operators/bmp.py,
    BMP out) and GIF (operators/gif.py, GIF out) — format preserved in
    every case; other codec-bound formats raise NotImplementedError
    through the same mapInPandas plumbing — swap the kernel, keep the
    plan."""
    out_schema = f"{id_col} {dict(df.dtypes)[id_col]}, resized binary"

    def _mapper(batches: Iterator) -> Iterator:
        import numpy as np
        import pandas as pd

        from pathwaydataframework_spark.operators import bmp as _bmp
        from pathwaydataframework_spark.operators import gif as _gif
        from pathwaydataframework_spark.operators import jpeg as _jpeg
        from pathwaydataframework_spark.operators import png as _png

        def _nearest(img):
            h, w, _ = img.shape
            rows = (np.arange(height) * h // height).clip(0, h - 1)
            cols = (np.arange(width) * w // width).clip(0, w - 1)
            return np.ascontiguousarray(img[rows][:, cols])

        for pdf in batches:
            out = []
            for raw in pdf[binary_col]:
                data = bytes(raw or b"")
                try:
                    if _jpeg.is_jpeg(data):
                        out.append(_jpeg.encode(_nearest(_jpeg.decode(data))))
                    elif _png.is_png(data):
                        out.append(_png.encode(_nearest(_png.decode(data))))
                    elif _bmp.is_bmp(data):
                        out.append(_bmp.encode(_nearest(_bmp.decode(data))))
                    elif _gif.is_gif(data):
                        out.append(_gif.encode(_nearest(_gif.decode(data))))
                    else:
                        out.append(ppm_resize(data, width, height))
                except ValueError as exc:
                    raise NotImplementedError(
                        "only P6 PPM, baseline JPEG/PNG/BMP/GIF resize "
                        "kernels are available in this container; plug a "
                        "Pillow kernel in production"
                    ) from exc
            yield pd.DataFrame({id_col: pdf[id_col], "resized": out})

    return df.select(id_col, binary_col).mapInPandas(_mapper, out_schema)


# -- perceptual image dedup ---------------------------------------------------


def image_dhash(data: bytes, *, hash_size: int = 8) -> list[int] | None:
    """dHash perceptual fingerprint (difference hash — the standard
    public near-dup image fingerprint): nearest-neighbor sample the image
    to (hash_size+1) x hash_size integer luminances, set bit c of row r
    when the right neighbor is strictly brighter.

    Returns ``hash_size`` row-bytes (each 0..255) so the downstream
    Hamming arithmetic is plain integer XOR/popcount; None for blobs with
    no in-repo decode kernel (P6 PPM and baseline JPEG are REAL —
    production swaps a Pillow decode in front for the rest, the
    fingerprint/blocking stay identical).

    All arithmetic downstream of the decode is integer (luminance =
    299R + 587G + 114B, floor index maps), so an external SQL oracle
    replays the exact bits for PPM inputs (whose pixels are the literal
    blob bytes).
    """
    import numpy as np

    try:
        img = decode_image(bytes(data))
    except (ValueError, TypeError):
        return None
    h, w, _ = img.shape
    if h == 0 or w == 0:
        # a syntactically valid "P6\n0 0\n255\n" header decodes to an
        # empty array; indexing it would raise instead of honoring the
        # None-for-undecodable contract
        return None
    rows = [(r * h) // hash_size for r in range(hash_size)]
    cols = [(c * w) // (hash_size + 1) for c in range(hash_size + 1)]
    g = img.astype(np.int64)
    lum = 299 * g[..., 0] + 587 * g[..., 1] + 114 * g[..., 2]
    sub = lum[np.ix_(rows, cols)]
    bits = sub[:, 1:] > sub[:, :-1]
    return [
        int(sum(1 << c for c in range(hash_size) if bits[r, c]))
        for r in range(hash_size)
    ]


def perceptual_dedup_pairs(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    binary_col: str = "data",
    max_hamming: int = 3,
    hash_size: int = 8,
) -> DataFrame:
    """Near-duplicate image pairs by dHash Hamming distance <= max_hamming.

    The image-corpus analogue of SimHash text dedup, with the same
    pigeonhole blocking: the hash's ``max_hamming + 1`` byte-groups are
    equi-join keys — two hashes within ``max_hamming`` MUST agree on at
    least one whole group, so candidate recall is exact (no probabilistic
    misses), and verification is a popcount over XORed row-bytes.

    One Python crossing (the Arrow-batched decode+hash), then pure column
    expressions: banded equi-join on (group_idx, group_bytes), never
    all-pairs.  Returns (id_a, id_b, hamming).
    """
    id_type = dict(df.dtypes)[id_col]

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            hashes = [
                image_dhash(bytes(x), hash_size=hash_size) if x is not None else None
                for x in pdf[binary_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "dhash": hashes})

    hashed = df.select(id_col, binary_col).mapInPandas(
        _mapper, f"{id_col} {id_type}, dhash array<int>"
    )
    return hamming_dedup_pairs(
        hashed,
        id_col=id_col,
        hash_col="dhash",
        max_hamming=max_hamming,
        n_bytes=hash_size,
    )


def _hamming(ha: str, hb: str) -> Column:
    """Σ popcount(a_i XOR b_i) over two byte-array fingerprint columns —
    the single definition both the batch-internal and batch-vs-corpus
    Hamming paths verify with."""
    return F.aggregate(
        F.zip_with(ha, hb, lambda x, y: F.bit_count(x.bitwiseXOR(y))),
        F.lit(0),
        lambda acc, x: acc + x,
    ).cast("long")


def hamming_dedup_pairs(
    hashed: DataFrame,
    *,
    id_col: str,
    hash_col: str,
    max_hamming: int,
    n_bytes: int,
) -> DataFrame:
    """Near-duplicate pairs over any byte-array fingerprint column by
    Hamming distance <= max_hamming — the shared blocking/verify engine
    behind :func:`perceptual_dedup_pairs` (images) and
    :func:`audio_dedup_pairs` (audio).

    Pigeonhole blocking: the ``max_hamming + 1`` byte-groups are equi-join
    keys — two fingerprints within ``max_hamming`` MUST agree on a whole
    group, so candidate recall is exact; verification is popcount over
    XORed bytes.  Never all-pairs.  Returns (id_a, id_b, hamming).
    """
    if max_hamming < 0:
        raise ValueError(f"max_hamming must be >= 0, got {max_hamming}")
    from pathwaydataframework_spark.operators.dedup import (
        collapse_pairs_by_signature,
    )

    h = hashed.filter(F.col(hash_col).isNotNull()).localCheckpoint(eager=True)

    def _rep_group_pairs(reps: DataFrame) -> DataFrame:
        # r15: reps arrives with the fingerprint carry column attached
        # (collapse_pairs_by_signature) — no left-semi join back to h
        banded = fingerprint_index(
            reps, id_col=id_col, hash_col=hash_col,
            max_hamming=max_hamming, n_bytes=n_bytes,
        )
        a = banded.select(
            F.col(id_col).alias("rep_a"), F.col(hash_col).alias("ha"), "g", "gv"
        )
        b = banded.select(
            F.col(id_col).alias("rep_b"), F.col(hash_col).alias("hb"), "g", "gv"
        )
        return (
            a.join(b, on=["g", "gv"])
            .filter(F.col("rep_a") < F.col("rep_b"))
            .select("rep_a", "rep_b", "ha", "hb")
            .distinct()
            .withColumn("hamming", _hamming("ha", "hb"))
            .filter(F.col("hamming") <= F.lit(max_hamming))
            .select("rep_a", "rep_b", "hamming")
        )

    # identical fingerprint bytes ⇒ hamming 0; collapse bounds the hot-group
    # hazard (k identical media blobs: O(k) membership rows, not O(k²) join
    # rows per byte-group)
    return collapse_pairs_by_signature(
        h.select(id_col, hash_col),
        id_col,
        hash_col,
        _rep_group_pairs,
        intra_extras={"hamming": F.lit(0)},
    )


def _decode_audio(data: bytes):
    """Codec dispatch for the exact-integer audio kernels: FLAC by
    magic (``flac.decode`` — lossless integers, the same contract),
    everything else through ``wavcodec.decode``.  Both return
    (samples (n, channels), rate, scale) with exact int32 samples for
    integer formats, so the fingerprint/feature arithmetic downstream
    is codec-agnostic (pinned: a FLAC encode of the same samples
    fingerprints identically to the WAV)."""
    from pathwaydataframework_spark.operators import flac as _flac
    from pathwaydataframework_spark.operators import wavcodec as _wav

    if _flac.is_flac(bytes(data)):
        return _flac.decode(bytes(data))
    return _wav.decode(bytes(data))


def audio_fingerprint(data: bytes, *, frames: int = 33) -> list[int] | None:
    """Energy-envelope fingerprint for WAV/FLAC — the audio near-dup
    analogue of dHash: split the sample stream into ``frames`` equal
    windows (floor boundaries), per-window energy = Σ sample² as EXACT
    integer arithmetic on the decoded integer samples, set bit f when
    window f+1 is strictly louder than window f.

    Covers every integer format wavcodec decodes (PCM 8/16/24/32,
    G.711 µ-law/A-law, IMA ADPCM — their expansions are exact integers,
    so the arithmetic stays exact end-to-end; the q_audio_dedup oracle
    replays PCM16 fixtures from hex) plus FLAC (r12, flac.py — lossless
    integers through the same dispatch, so a WAV and its FLAC encode
    fingerprint IDENTICALLY).  Robust to uniform gain only in
    the strict sense of sign-preserving monotone scalings (integer
    doubling preserves every comparison); resistant to small local
    edits (each touches <= 2 comparisons).  Returns (frames-1)/8
    row-bytes; None for non-audio/float-WAV blobs or streams with fewer
    samples than frames.  (frames-1) must be a multiple of 8.
    """
    import numpy as np

    bits = frames - 1
    if bits <= 0 or bits % 8:
        raise ValueError("frames - 1 must be a positive multiple of 8")
    try:
        samples, _sr, scale = _decode_audio(bytes(data))
    except ValueError:
        return None
    if scale is None:  # float streams: no exact-integer energy contract
        return None
    if samples.shape[1] != 1:
        # honest boundary: a stereo stream fingerprinted as interleaved
        # mono would break the gain/edit-locality properties per channel —
        # refuse rather than silently mis-fingerprint
        return None
    x = samples[:, 0].astype(np.int64)
    if x.size < frames:
        return None
    # window of sample j = (j*frames)//n — the floor-map inverse, chosen so
    # a SQL oracle recomputes the assignment with one integer expression
    win = (np.arange(x.size) * frames) // x.size
    # same exactness guard as _haar_band_energies (ADVICE r12): 24/32-bit
    # samples square past int64 — go arbitrary-precision there so the
    # window comparisons stay exact
    if x.size and int(np.abs(x).max()) >= (1 << 16):
        x = x.astype(object)
    energy = [int((x[win == f] ** 2).sum()) for f in range(frames)]
    fp_bits = [energy[f + 1] > energy[f] for f in range(bits)]
    return [
        int(sum(1 << c for c in range(8) if fp_bits[r * 8 + c]))
        for r in range(bits // 8)
    ]


def audio_dedup_pairs(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    binary_col: str = "data",
    max_hamming: int = 3,
    frames: int = 33,
) -> DataFrame:
    """Near-duplicate audio pairs by energy-envelope fingerprint Hamming
    distance — one Arrow-batched decode crossing, then the shared
    pigeonhole blocking (:func:`hamming_dedup_pairs`)."""
    # validate driver-side: deferring to the per-row fingerprint call
    # would launch the job and fail every task with an executor traceback
    if frames - 1 <= 0 or (frames - 1) % 8:
        raise ValueError("frames - 1 must be a positive multiple of 8")
    id_type = dict(df.dtypes)[id_col]
    n_bytes = (frames - 1) // 8

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fps = [
                audio_fingerprint(bytes(x), frames=frames) if x is not None else None
                for x in pdf[binary_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "afp": fps})

    hashed = df.select(id_col, binary_col).mapInPandas(
        _mapper, f"{id_col} {id_type}, afp array<int>"
    )
    return hamming_dedup_pairs(
        hashed, id_col=id_col, hash_col="afp", max_hamming=max_hamming, n_bytes=n_bytes
    )


def audio_spectral_fingerprint(
    data: bytes, *, windows: int = 8, bands: int = 5
) -> list[int] | None:
    """Haar-band SPECTRAL fingerprint for WAV — the frequency-domain
    extension of :func:`audio_fingerprint` (which sees only the energy
    ENVELOPE and cannot separate two signals with the same loudness
    curve but different timbre).  FFT-free and exact-integer, so a SQL
    oracle replays every bit:

    - Split the sample stream into ``windows`` temporal windows.
    - For dyadic band ``k`` in 1..``bands``, partition samples into
      blocks of ``2^k`` on ABSOLUTE index; each block's Haar detail
      coefficient is ``sum(first half) - sum(second half)`` — an
      integer band-pass at ~``rate/2^k`` (k=1 = highest octave).
    - Each block contributes its squared coefficient to the window its
      FIRST sample falls in: ``f = (blk * 2^k * windows) // n`` — the
      same floor map as the envelope fingerprint, so blocks never need
      splitting and the oracle recomputes the assignment with one
      integer expression.
    - Within each window, set bit ``f*(bands-1) + (k-1)`` when band
      ``k+1`` (the next LOWER octave) carries strictly more energy
      than band ``k`` — the spectral tilt, per window.

    Like the envelope: exact integer arithmetic end-to-end — int64 fast
    path for <= 16-bit magnitudes (details |c| <= 2^15 * 2^(k-1),
    energies fit int64 for any stream below ~2^27 samples at the
    deepest default band), arbitrary-precision for deeper (PCM24/32,
    high-bps FLAC) samples whose squares would wrap — invariant under
    integer gain doubling (energies scale by 4 uniformly — every
    comparison survives), local edits touch only their window's bits.
    Returns ``windows*(bands-1)/8`` row-bytes; None for non-WAV /
    float-WAV / stereo blobs or streams shorter than ``windows``
    samples.  ``windows*(bands-1)`` must be a multiple of 8.
    """
    bits = windows * (bands - 1)
    if bits <= 0 or bits % 8:
        raise ValueError(
            "windows * (bands - 1) must be a positive multiple of 8"
        )
    energy = _haar_band_energies(data, windows=windows, bands=bands)
    if energy is None:
        return None
    fp_bits = [
        bool(energy[f, k + 1] > energy[f, k])
        for f in range(windows)
        for k in range(1, bands)
    ]
    return [
        int(sum(1 << c for c in range(8) if fp_bits[r * 8 + c]))
        for r in range(bits // 8)
    ]


def _haar_band_energies(data: bytes, *, windows: int, bands: int):
    """Shared kernel of :func:`audio_spectral_fingerprint` and
    :func:`audio_spectral_energies`: the (windows, bands+1) int64
    energy matrix (column 0 unused — bands are 1-indexed), or None at
    the decode boundaries (non-audio, float, stereo, shorter than
    ``windows`` samples).  Decodes WAV or FLAC (:func:`_decode_audio`)."""
    import numpy as np

    try:
        samples, _sr, scale = _decode_audio(bytes(data))
    except ValueError:
        return None
    if scale is None or samples.shape[1] != 1:
        return None  # same honest boundaries as audio_fingerprint
    x = samples[:, 0].astype(np.int64)
    n = x.size
    if n < windows:
        return None
    # Exactness guard (ADVICE r12): the int64 fast path is proven only
    # for <= 16-bit magnitudes (|c| <= 2^15 * 2^(k-1), squares ~2^38 —
    # headroom to ~2^27 samples at the default deepest band).  PCM24/32
    # and high-bps FLAC can push a single detail coefficient to ~2^35,
    # whose SQUARE wraps int64 — so deep streams take the arbitrary-
    # precision object path instead of silently presenting wrapped
    # values as exact-integer features.  Comparisons (the fingerprint)
    # stay exact either way.
    deep = bool(np.abs(x).max() >= (1 << 16)) if n else False
    j = np.arange(n)
    energy = np.zeros((windows, bands + 1), dtype=object if deep else np.int64)
    for k in range(1, bands + 1):
        blk = j >> k
        sign = 1 - 2 * ((j >> (k - 1)) & 1)
        coeff = np.zeros(int(blk[-1]) + 1, dtype=np.int64)
        np.add.at(coeff, blk, sign * x)
        f = (np.arange(coeff.size, dtype=np.int64) << k) * windows // n
        if deep:
            e_k = np.zeros(windows, dtype=object)
            sq = coeff.astype(object) ** 2
        else:
            e_k = np.zeros(windows, dtype=np.int64)
            sq = coeff * coeff
        np.add.at(e_k, f, sq)
        energy[:, k] = e_k
    return energy


def audio_spectral_energies(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    binary_col: str = "data",
    windows: int = 8,
    bands: int = 5,
) -> DataFrame:
    """The raw Haar band-energy matrix as a FEATURE table — one row per
    (id, window, band) with the exact-integer energy — for downstream
    curation models (speech/music/noise separation, silence trimming,
    bandwidth detection) rather than dedup: the spectral analogue of
    the text quality-signal operators.  Long format so the schema is
    independent of ``windows``/``bands`` and a SQL oracle states every
    cell; rows only for decodable mono integer WAV blobs (the
    fingerprint's None boundary drops the rest, as do deep 24/32-bit
    streams whose exact energies exceed the schema's int64 range — the
    fingerprint path still covers those).  One Arrow-batched
    decode crossing; output is (windows x bands) rows per blob —
    thousands of times smaller than the audio itself."""
    if windows <= 0 or bands <= 0:
        raise ValueError("windows and bands must be positive")
    id_type = dict(df.dtypes)[id_col]

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            ids, fs, ks, es = [], [], [], []
            for i, x in zip(pdf[id_col], pdf[binary_col]):
                if x is None:
                    continue
                energy = _haar_band_energies(
                    bytes(x), windows=windows, bands=bands
                )
                if energy is None:
                    continue
                if int(energy[:, 1:].max()) > (1 << 63) - 1:
                    # deep (24/32-bit) streams whose exact energies
                    # exceed the schema's int64 range: skip the blob
                    # (the None boundary) rather than emit wrapped
                    # values — the fingerprint path still covers them
                    # (its comparisons are arbitrary-precision)
                    continue
                for f in range(windows):
                    for k in range(1, bands + 1):
                        ids.append(i)
                        fs.append(f)
                        ks.append(k)
                        es.append(int(energy[f, k]))
            yield pd.DataFrame(
                {id_col: ids, "window": fs, "band": ks, "energy": es}
            )

    return df.select(id_col, binary_col).mapInPandas(
        _mapper,
        f"{id_col} {id_type}, window long, band long, energy long",
    )


def audio_spectral_pairs(
    df: DataFrame,
    *,
    id_col: str = "media_id",
    binary_col: str = "data",
    max_hamming: int = 3,
    windows: int = 8,
    bands: int = 5,
) -> DataFrame:
    """Near-duplicate audio pairs by Haar-band spectral fingerprint
    Hamming distance — one Arrow-batched decode crossing, then the
    shared pigeonhole blocking (:func:`hamming_dedup_pairs`): no
    all-pairs anywhere, the same scale shape as the envelope path."""
    bits = windows * (bands - 1)
    if bits <= 0 or bits % 8:
        raise ValueError(
            "windows * (bands - 1) must be a positive multiple of 8"
        )
    id_type = dict(df.dtypes)[id_col]
    n_bytes = bits // 8

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            fps = [
                audio_spectral_fingerprint(
                    bytes(x), windows=windows, bands=bands
                )
                if x is not None
                else None
                for x in pdf[binary_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "sfp": fps})

    hashed = df.select(id_col, binary_col).mapInPandas(
        _mapper, f"{id_col} {id_type}, sfp array<int>"
    )
    return hamming_dedup_pairs(
        hashed, id_col=id_col, hash_col="sfp", max_hamming=max_hamming, n_bytes=n_bytes
    )


def fingerprint_index(
    df: DataFrame,
    *,
    id_col: str,
    hash_col: str,
    max_hamming: int,
    n_bytes: int,
) -> DataFrame:
    """Persistable banded fingerprint index: (id, hash, g, gv) rows — one
    per pigeonhole byte-group.  Write it to parquet once; incoming batches
    match against it without re-fingerprinting the corpus (the multimodal
    analogue of dedup.minhash_band_index)."""
    groups = max_hamming + 1
    if groups > n_bytes:
        raise ValueError("max_hamming + 1 groups need max_hamming < n_bytes")
    base, extra = divmod(n_bytes, groups)
    bounds, start = [], 1
    for gi in range(groups):
        ln = base + (1 if gi < extra else 0)
        bounds.append((gi, start, ln))
        start += ln
    return (
        df.filter(F.col(hash_col).isNotNull())
        .select(
            id_col,
            hash_col,
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(gi).alias("g"), F.slice(hash_col, st, ln).alias("gv")
                        )
                        for gi, st, ln in bounds
                    ]
                )
            ).alias("band"),
        )
        .select(
            id_col, hash_col, F.col("band.g").alias("g"), F.col("band.gv").alias("gv")
        )
    )


def incremental_hamming_pairs(
    batch_hashed: DataFrame,
    index: DataFrame,
    *,
    id_col: str,
    hash_col: str,
    max_hamming: int,
    n_bytes: int,
) -> DataFrame:
    """Match an incoming batch of fingerprints AGAINST a persisted
    :func:`fingerprint_index` — the incremental path of a continuously
    ingesting media pipeline: only the batch is fingerprinted/banded, the
    corpus contributes stored index rows, and the band equi-join scales
    with the BATCH.  Band parameters must match the index's (kept explicit
    rather than guessed).  Returns (new_id, corpus_id, hamming)."""
    banded = fingerprint_index(
        batch_hashed,
        id_col=id_col,
        hash_col=hash_col,
        max_hamming=max_hamming,
        n_bytes=n_bytes,
    )
    a = banded.select(
        F.col(id_col).alias("new_id"), F.col(hash_col).alias("ha"), "g", "gv"
    )
    b = index.select(
        F.col(id_col).alias("corpus_id"), F.col(hash_col).alias("hb"), "g", "gv"
    )
    return (
        a.join(b, on=["g", "gv"])
        .select("new_id", "corpus_id", "ha", "hb")
        .distinct()
        .withColumn("hamming", _hamming("ha", "hb"))
        .filter(F.col("hamming") <= F.lit(max_hamming))
        .select("new_id", "corpus_id", "hamming")
    )
