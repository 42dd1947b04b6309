"""Spot-check: linear-time multi-member gzip walk vs the r6 tail-slice
version, on synthetic Common Crawl-layout shards (one gzip member per
WARC record).  Records the measurement the archives.py docstring cites
(SCALE.md "corpus ingestion").

The r6 path decompressed ``data[pos:]`` per member: the slice copies the
whole remaining tail, and zlib hands most of it back again as
``unused_data`` — two O(shard) memcpys per member, quadratic overall.
The r7 rewrite (archives._gzip_members) feeds bounded memoryview chunks,
so each member costs O(member + chunk).

Usage: python3 scripts/gzip_walk_spotcheck.py [n_members] [record_bytes]
"""

from __future__ import annotations

import gzip
import sys
import time
import zlib
from collections.abc import Iterator

sys.path.insert(0, ".")

from pathwaydataframework_spark.operators.archives import _gzip_members


def _gzip_members_r6(data: bytes) -> Iterator[bytes]:
    """The pre-r7 implementation, verbatim (git 5efe3c7), kept here only
    as the measurement baseline."""
    pos = 0
    while pos < len(data):
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(data[pos:])
        except zlib.error as exc:
            raise ValueError("gzip: corrupt member (%s)" % exc) from exc
        while not d.eof:
            if not d.unconsumed_tail:
                raise ValueError("gzip: truncated member")
            chunk += d.decompress(d.unconsumed_tail)
        yield chunk
        consumed = len(data) - pos - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip: member made no progress")
        pos += consumed


def make_shard(n_members: int, record_bytes: int) -> bytes:
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n\r\n" + b"x" * record_bytes)
    return b"".join(
        gzip.compress(rec + str(i).encode(), compresslevel=1)
        for i in range(n_members)
    )


def main() -> None:
    n_members = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    record_bytes = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000
    shard = make_shard(n_members, record_bytes)
    mb = len(shard) / 1e6
    print(f"shard: {n_members} members, {mb:.1f} MB compressed")

    t0 = time.perf_counter()
    new = list(_gzip_members(shard))
    t_new = time.perf_counter() - t0

    t0 = time.perf_counter()
    old = list(_gzip_members_r6(shard))
    t_old = time.perf_counter() - t0

    assert new == old, "implementations disagree"
    print(
        f"r6 tail-slice: {t_old:.2f} s ({mb / t_old:.1f} MB/s)   "
        f"r7 linear: {t_new:.2f} s ({mb / t_new:.1f} MB/s)   "
        f"speedup {t_old / t_new:.0f}x"
    )


if __name__ == "__main__":
    main()
