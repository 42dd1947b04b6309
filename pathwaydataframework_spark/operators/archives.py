"""Archive-shard and WARC ingestion — how 100 TB corpora actually arrive.

Training corpora ship as container files: Common Crawl WARC/WET (one
gzip member per record), tar/tar.gz/tar.bz2/tar.xz shards, zip bundles,
and bare .gz files.  Spark's ``binaryFile`` source reads each shard as
one row; the exploders here fan a shard row out to one row per member /
WARC record through ``mapInPandas`` (Arrow-batched, stdlib-only:
zipfile/tarfile/zlib — no external deps):

- ``explode_archive``: (path, content) → (path, member, size, data)
- ``explode_warc``: (path, content) → one row per WARC record with the
  WARC headers that matter (type, target URI, date, content type) and —
  for ``response`` records — the parsed HTTP status/content-type and
  the HTTP payload split out of the body
- ``read_archive`` / ``read_warc``: ``spark.read.format("binaryFile")``
  wrappers so a directory of shards becomes a member/record DataFrame
  in one call

Scale notes: binaryFile does not split individual files, so parallelism
is one task per shard — exactly right for ~1 GB WARC segments on a
1000-executor cluster (set ``spark.sql.files.maxPartitionBytes`` has no
effect here; shard count is the unit of parallelism).  Records stream
out in Arrow batches, so a shard's members never need to fit in one
pandas block beyond the current batch.  Malformed containers raise
ValueError per the repo-wide kernel contract (test_codec_fuzz.py).

The reference framework ingests such corpora through service UDF
parsers (reference python/pathway/xpacks/llm/parsers.py:53-746) and
per-format connectors; here the container walk is local and the
Spark-side plumbing is the same binary-column pattern as multimodal.py.
"""

from __future__ import annotations

import io
import struct
import tarfile
import zipfile
import zlib
from typing import Iterator

from pyspark.sql import DataFrame, SparkSession

ARCHIVE_SCHEMA = "path string, member string, size long, data binary"
WARC_SCHEMA = (
    "path string, record_idx long, warc_type string, target_uri string, "
    "warc_date string, content_type string, http_status int, "
    "http_content_type string, body binary"
)


#: Input-chunk sizes for multi-member gzip inflate.  They bound the
#: bytes zlib re-surfaces as a ``unused_data`` COPY at each member
#: boundary, which is what keeps the walk linear (see _gzip_members).
#: The first chunk of each member is small because in the Common Crawl
#: layout most members END within a few KB — a large first chunk would
#: pay its size back as the unused_data copy on every one of ~100k
#: members per shard; members that don't finish continue with big
#: chunks so large members stay cheap too.
_GZ_CHUNK_FIRST = 64 << 10
_GZ_CHUNK = 1 << 20


def _gzip_members(data: bytes) -> Iterator[bytes]:
    """Decompressed payload of every gzip member (multi-member streams:
    the Common Crawl layout is one member per WARC record).

    Linear-time walk: input is fed as bounded memoryview slices, so the
    cost per member is O(member + chunk).  The tempting one-liner —
    ``d.decompress(data[pos:])`` per member — is quadratic in disguise:
    the slice copies the whole remaining tail AND ``unused_data`` hands
    most of it back as a second copy, so a 1 GB Common Crawl shard with
    ~100k record-members would memcpy ~100 TB.  Measured (scripts/
    gzip_walk_spotcheck.py, SCALE.md r8 "corpus ingestion"): 53.7 s →
    0.5 s (~103x) on a 100k-member CC-layout shard, with the gap
    growing quadratically in shard size."""
    mv = memoryview(data)
    n = len(data)
    pos = 0
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = []
        start = pos
        size = _GZ_CHUNK_FIRST
        while not d.eof:
            if pos >= n:
                raise ValueError("gzip: truncated member")
            chunk = mv[pos : pos + size]
            try:
                out.append(d.decompress(chunk))
            except zlib.error as exc:
                raise ValueError("gzip: corrupt member (%s)" % exc) from exc
            pos += len(chunk)
            if d.eof:
                pos -= len(d.unused_data)
            size = _GZ_CHUNK
        if pos <= start:
            raise ValueError("gzip: member made no progress")
        yield b"".join(out)


def iter_archive_members(path: str, data: bytes) -> Iterator[tuple[str, bytes]]:
    """(member name, member bytes) for zip / tar(.gz/.bz2/.xz) / bare
    gzip containers.  Directories are skipped.  ValueError on anything
    unrecognized or corrupt."""
    data = bytes(data)
    if data[:4] in (b"PK\x03\x04", b"PK\x05\x06"):
        try:
            with zipfile.ZipFile(io.BytesIO(data)) as zf:
                for info in zf.infolist():
                    if info.is_dir():
                        continue
                    yield info.filename, zf.read(info)
            return
        except (zipfile.BadZipFile, struct.error, EOFError, zlib.error) as exc:
            raise ValueError("zip: corrupt archive (%s)" % exc) from exc
    # tar variants (incl. compressed) — tarfile sniffs the compression
    try:
        with tarfile.open(fileobj=io.BytesIO(data), mode="r:*") as tf:
            for info in tf:
                if not info.isfile():
                    continue
                fh = tf.extractfile(info)
                if fh is not None:
                    yield info.name, fh.read()
        return
    except tarfile.TarError:
        pass  # not a tar — fall through to bare gzip
    except (struct.error, EOFError, zlib.error, OSError) as exc:
        raise ValueError("tar: corrupt archive (%s)" % exc) from exc
    if data[:2] == b"\x1f\x8b":  # bare gzip: one member, derived name
        name = path.rsplit("/", 1)[-1]
        if name.endswith(".gz"):
            name = name[:-3]
        yield name, b"".join(_gzip_members(data))
        return
    raise ValueError("archive: unrecognized container format")


def parse_warc(data: bytes) -> list[dict]:
    """WARC/1.x bytes (plain or gzip, multi-member) → list of records:
    dict(warc_type, target_uri, warc_date, content_type, body bytes,
    http_status, http_content_type).  For ``response`` records carrying
    an HTTP response, the status line and headers are split off and
    ``body`` is the HTTP payload; other records keep the raw block.
    ValueError on malformed streams."""
    data = bytes(data)
    if data[:2] == b"\x1f\x8b":
        data = b"".join(_gzip_members(data))
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record CRLFs
        while pos < n and data[pos : pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            break
        if not data[pos : pos + 5] == b"WARC/":
            raise ValueError("WARC: missing version line at offset %d" % pos)
        hdr_end = data.find(b"\r\n\r\n", pos)
        if hdr_end < 0:
            raise ValueError("WARC: unterminated header block")
        headers: dict[str, str] = {}
        for line in data[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
        try:
            length = int(headers["content-length"])
        except (KeyError, ValueError) as exc:
            raise ValueError("WARC: bad/missing Content-Length") from exc
        body_start = hdr_end + 4
        if body_start + length > n:
            raise ValueError("WARC: truncated record body")
        block = data[body_start : body_start + length]
        rec = {
            "warc_type": headers.get("warc-type"),
            "target_uri": headers.get("warc-target-uri"),
            "warc_date": headers.get("warc-date"),
            "content_type": headers.get("content-type"),
            "http_status": None,
            "http_content_type": None,
            "body": block,
        }
        if (rec["content_type"] or "").startswith("application/http"):
            # body = HTTP message: status line, headers, CRLFCRLF, payload
            split = block.find(b"\r\n\r\n")
            if split >= 0:
                head = block[:split].split(b"\r\n")
                parts = head[0].split()
                if len(parts) >= 2 and parts[0][:5] == b"HTTP/":
                    try:
                        rec["http_status"] = int(parts[1])
                    except ValueError:
                        pass
                for line in head[1:]:
                    k, _, v = line.partition(b":")
                    if k.strip().lower() == b"content-type":
                        rec["http_content_type"] = v.strip().decode(
                            "utf-8", "replace"
                        )
                        break
                rec["body"] = block[split + 4 :]
        records.append(rec)
        pos = body_start + length
    return records


def explode_archive(
    df: DataFrame, *, binary_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """One row per archive member (zip/tar/gz shards → corpus files)."""

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            paths, members, sizes, blobs = [], [], [], []
            for p, raw in zip(pdf[path_col], pdf[binary_col]):
                for name, blob in iter_archive_members(str(p), bytes(raw or b"")):
                    paths.append(p)
                    members.append(name)
                    sizes.append(len(blob))
                    blobs.append(blob)
            yield pd.DataFrame(
                {"path": paths, "member": members, "size": sizes, "data": blobs}
            )

    return df.select(path_col, binary_col).mapInPandas(_mapper, ARCHIVE_SCHEMA)


def explode_warc(
    df: DataFrame, *, binary_col: str = "content", path_col: str = "path"
) -> DataFrame:
    """One row per WARC record (Common Crawl WARC/WET shards)."""

    def _mapper(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: dict[str, list] = {
                "path": [], "record_idx": [], "warc_type": [],
                "target_uri": [], "warc_date": [], "content_type": [],
                "http_status": [], "http_content_type": [], "body": [],
            }
            for p, raw in zip(pdf[path_col], pdf[binary_col]):
                for i, rec in enumerate(parse_warc(bytes(raw or b""))):
                    rows["path"].append(p)
                    rows["record_idx"].append(i)
                    for k in (
                        "warc_type", "target_uri", "warc_date",
                        "content_type", "http_status", "http_content_type",
                        "body",
                    ):
                        rows[k].append(rec[k])
            yield pd.DataFrame(rows)

    return df.select(path_col, binary_col).mapInPandas(_mapper, WARC_SCHEMA)


def read_archive(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of zip/tar/gz shards → member DataFrame."""
    return explode_archive(spark.read.format("binaryFile").load(path))


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of WARC/WET shards → record DataFrame."""
    return explode_warc(spark.read.format("binaryFile").load(path))
