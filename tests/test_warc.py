"""WARC reader: record framing, gzip members, charset handling."""

import gzip

import pyarrow as pa
import pytest

from smartreader_ray.sources.warc import (
    iter_warc_records,
    make_warc,
    warc_pages_batch,
)


def test_roundtrip_plain_and_gzip():
    pages = [("http://a.test/", "<html><body>Alpha</body></html>"),
             ("http://b.test/", "<html><body>Bèta ünïcode</body></html>")]
    for compress in (False, True):
        blob = make_warc(pages, compress=compress)
        out = warc_pages_batch(
            pa.table({"bytes": pa.array([blob], type=pa.binary())})
        )
        assert out.column("doc_id").to_pylist() == [u for u, _ in pages]
        assert out.column("html").to_pylist() == [h for _, h in pages]


def test_non_response_records_skipped():
    blob = make_warc([("http://a.test/", "<p>keep</p>")])
    info = (b"WARC/1.0\r\nWARC-Type: warcinfo\r\nContent-Length: 5\r\n\r\n"
            b"x: y\n\r\n\r\n")
    out = warc_pages_batch(
        pa.table({"bytes": pa.array([info + blob], type=pa.binary())})
    )
    assert out.num_rows == 1
    assert out.column("html")[0].as_py() == "<p>keep</p>"


def test_declared_charset_decodes():
    body = "café".encode("latin-1")
    http = (b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=ISO-8859-1\r\n\r\n") + body
    rec = (b"WARC/1.0\r\nWARC-Type: response\r\n"
           b"WARC-Target-URI: http://c.test/\r\n"
           b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
           ) + http + b"\r\n\r\n"
    out = warc_pages_batch(pa.table({"bytes": pa.array([rec], type=pa.binary())}))
    assert out.column("html")[0].as_py() == "café"


def test_broken_magic_raises():
    with pytest.raises(ValueError, match="not a WARC record"):
        list(iter_warc_records(b"HTTP/1.1 200 OK\r\n\r\nnope"))


def test_read_warc_from_files(ray_session, tmp_path):
    from smartreader_ray.sources.warc import read_warc

    for i in range(3):
        (tmp_path / f"shard{i}.warc.gz").write_bytes(
            make_warc([(f"http://s{i}.test/p{j}", f"<p>doc {i}-{j}</p>")
                       for j in range(4)], compress=True)
        )
    ds = read_warc(str(tmp_path))
    rows = ds.take_all()
    assert len(rows) == 12
    assert {r["doc_id"] for r in rows} == {
        f"http://s{i}.test/p{j}" for i in range(3) for j in range(4)
    }
