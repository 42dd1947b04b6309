"""Archive-shard + WARC ingestion (operators/archives.py): member
explosion for zip / tar.gz / bare gzip, multi-member gzip streams
(the Common Crawl one-member-per-record layout), WARC/HTTP record
parsing, and the end-to-end shard → records → strip_html → text
pipeline through Spark."""

from __future__ import annotations

import gzip
import io
import tarfile
import zipfile

import pyspark.sql.functions as F
import pytest

from pathwaydataframework_spark.operators import archives
from pathwaydataframework_spark.operators.parsers import strip_html


def _warc_record(warc_type: str, uri: str | None, body: bytes,
                 content_type: str = "application/http; msgtype=response"):
    hdrs = [
        b"WARC/1.0",
        b"WARC-Type: " + warc_type.encode(),
        b"WARC-Date: 2024-01-01T00:00:00Z",
        b"Content-Type: " + content_type.encode(),
        b"Content-Length: " + str(len(body)).encode(),
    ]
    if uri:
        hdrs.insert(2, b"WARC-Target-URI: " + uri.encode())
    return b"\r\n".join(hdrs) + b"\r\n\r\n" + body + b"\r\n\r\n"


def _http_response(payload: bytes, status=200, ctype=b"text/html"):
    return (
        b"HTTP/1.1 " + str(status).encode() + b" OK\r\n"
        b"Content-Type: " + ctype + b"\r\n"
        b"Content-Length: " + str(len(payload)).encode() + b"\r\n\r\n"
        + payload
    )


HTML1 = b"<html><body><h1>Title</h1><p>Hello corpus world.</p></body></html>"
HTML2 = b"<html><body><p>Second &amp; page</p></body></html>"


def _warc_bytes() -> bytes:
    info = _warc_record(
        "warcinfo", None, b"software: test\r\n",
        content_type="application/warc-fields",
    )
    r1 = _warc_record("response", "http://a.example/", _http_response(HTML1))
    r2 = _warc_record(
        "response", "http://b.example/x", _http_response(HTML2, status=404)
    )
    return info + r1 + r2


def test_parse_warc_plain_and_per_record_gzip():
    for raw in (
        _warc_bytes(),
        # Common Crawl layout: each record its own gzip member
        b"".join(
            gzip.compress(r)
            for r in (
                _warc_record("warcinfo", None, b"x\r\n",
                             content_type="application/warc-fields"),
                _warc_record("response", "http://a.example/",
                             _http_response(HTML1)),
            )
        ),
    ):
        recs = archives.parse_warc(raw)
        assert recs[0]["warc_type"] == "warcinfo"
        resp = recs[1]
        assert resp["warc_type"] == "response"
        assert resp["target_uri"] == "http://a.example/"
        assert resp["http_status"] == 200
        assert resp["http_content_type"] == "text/html"
        assert resp["body"] == HTML1  # HTTP envelope split off


def test_parse_warc_rejects_malformed():
    with pytest.raises(ValueError, match="version line"):
        archives.parse_warc(b"NOT A WARC")
    trunc = _warc_bytes()[:-40]
    with pytest.raises(ValueError, match="truncated|unterminated"):
        archives.parse_warc(trunc)


def test_iter_archive_members_zip_tar_gz():
    files = {"a/one.txt": b"alpha", "two.jsonl": b'{"x":1}\n{"x":2}'}
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        for n, b in files.items():
            zf.writestr(n, b)
    tbuf = io.BytesIO()
    with tarfile.open(fileobj=tbuf, mode="w:gz") as tf:
        for n, b in files.items():
            ti = tarfile.TarInfo(n)
            ti.size = len(b)
            tf.addfile(ti, io.BytesIO(b))
    for blob in (zbuf.getvalue(), tbuf.getvalue()):
        got = dict(archives.iter_archive_members("s.bin", blob))
        assert got == files
    # bare gzip: single member named after the shard minus .gz
    got = dict(
        archives.iter_archive_members("dir/doc.txt.gz", gzip.compress(b"plain"))
    )
    assert got == {"doc.txt": b"plain"}
    with pytest.raises(ValueError, match="unrecognized|corrupt"):
        list(archives.iter_archive_members("x", b"garbage here"))


def test_multi_member_gzip_stream():
    members = [b"first", b"second" * 100, b""]
    stream = b"".join(gzip.compress(m) for m in members)
    assert list(archives._gzip_members(stream)) == members
    with pytest.raises(ValueError, match="truncated|corrupt"):
        list(archives._gzip_members(stream[:-5]))


def test_explode_archive_spark(spark, tmp_path):
    zbuf = io.BytesIO()
    with zipfile.ZipFile(zbuf, "w") as zf:
        zf.writestr("docs/d1.txt", b"doc one")
        zf.writestr("docs/d2.txt", b"doc two!")
    (tmp_path / "shard0.zip").write_bytes(zbuf.getvalue())
    out = archives.read_archive(spark, str(tmp_path)).orderBy("member")
    rows = out.collect()
    assert [(r["member"], bytes(r["data"]), r["size"]) for r in rows] == [
        ("docs/d1.txt", b"doc one", 7),
        ("docs/d2.txt", b"doc two!", 8),
    ]


def test_warc_to_text_pipeline_spark(spark, tmp_path):
    # the Common Crawl shape end-to-end: gzip'd WARC shard on disk →
    # binaryFile → record rows → HTML responses → JVM-side strip_html
    (tmp_path / "seg-00000.warc.gz").write_bytes(gzip.compress(_warc_bytes()))
    recs = archives.read_warc(spark, str(tmp_path))
    texts = (
        recs.filter(
            (F.col("warc_type") == "response") & (F.col("http_status") == 200)
        )
        .select(
            "target_uri",
            strip_html(F.col("body").cast("string")).alias("text"),
        )
        .collect()
    )
    assert len(texts) == 1
    assert texts[0]["target_uri"] == "http://a.example/"
    assert "Hello corpus world." in texts[0]["text"]
    assert "<p>" not in texts[0]["text"]
    # full record inventory survives the explode
    assert recs.count() == 3
    assert recs.filter(F.col("http_status") == 404).count() == 1
