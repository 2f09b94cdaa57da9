"""From-scratch WARC reader: the standard web-crawl interchange format
(ISO 28500), the raw input one step upstream of this engine's span
tables in a real web-scale pipeline (crawl → WARC → extract → Lance).

Format essentials (public spec): a WARC file is a concatenation of
records; each record is

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...          (until blank line)
    \\r\\n
    <Content-Length bytes of block>
    \\r\\n\\r\\n                                (record separator)

``response`` records carry an HTTP response message as the block; the
page bytes follow the HTTP headers. ``.warc.gz`` files are per-record
gzip members — stdlib ``gzip.GzipFile`` iterates concatenated members
transparently.

Ray shape: one binary file → one flat ``map_batches`` emitting one row
per page. File-level parallelism comes from the ``read_binary_files``
block layout (one crawl shard per task — exactly how CC-style corpora
are laid out); nothing shuffles.
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator, Optional

import pyarrow as pa

_MAX_HEADER = 64 * 1024


def _parse_http_block(block: bytes) -> tuple[dict, bytes]:
    """Split an HTTP response message into (lowercased headers, body)."""
    sep = block.find(b"\r\n\r\n")
    if sep < 0:
        return {}, block
    head, body = block[:sep], block[sep + 4:]
    headers: dict = {}
    for line in head.split(b"\r\n")[1:]:  # [0] is the status line
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
    return headers, body


def _charset_of(headers: dict) -> Optional[str]:
    ctype = headers.get("content-type", "")
    if "charset=" in ctype:
        return ctype.split("charset=", 1)[1].split(";")[0].strip(" \"'")
    return None


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Yield every record of a (possibly gzipped) WARC byte string as
    ``{"headers": {lower-name: value}, "block": bytes}``. Tolerant of
    trailing garbage; raises on a structurally broken header.
    """
    if data[:2] == b"\x1f\x8b":
        data = gzip.GzipFile(fileobj=io.BytesIO(data)).read()
    pos, n = 0, len(data)
    while pos < n:
        # skip inter-record CRLFs
        while pos < n and data[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        head_end = data.find(b"\r\n\r\n", pos, pos + _MAX_HEADER)
        if head_end < 0:
            return  # truncated tail
        head = data[pos:head_end].split(b"\r\n")
        if not head[0].startswith(b"WARC/"):
            raise ValueError(
                f"not a WARC record at offset {pos}: {head[0][:40]!r}"
            )
        headers: dict = {}
        for line in head[1:]:
            if b":" in line:
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode("latin-1")] = (
                    v.strip().decode("latin-1")
                )
        length = int(headers.get("content-length", "0"))
        block_start = head_end + 4
        yield {"headers": headers, "block": data[block_start:block_start + length]}
        pos = block_start + length


def warc_pages_batch(batch: pa.Table, bytes_col: str = "bytes") -> pa.Table:
    """Binary WARC files → one row per ``response`` record:
    (doc_id = WARC-Target-URI, html). Non-response records (warcinfo,
    request, metadata) are skipped; page bytes decode via the declared
    HTTP charset, falling back to UTF-8 with replacement (same policy
    as the charset seam in ``stages/extract.py``).
    """
    ids, htmls = [], []
    for blob in batch.column(bytes_col).to_pylist():
        for rec in iter_warc_records(blob):
            h = rec["headers"]
            if h.get("warc-type") != "response":
                continue
            http_headers, body = _parse_http_block(rec["block"])
            charset = _charset_of(http_headers) or "utf-8"
            try:
                text = body.decode(charset, errors="replace")
            except LookupError:  # unknown charset label
                text = body.decode("utf-8", errors="replace")
            ids.append(h.get("warc-target-uri", h.get("warc-record-id", "")))
            htmls.append(text)
    return pa.Table.from_pydict(
        {
            "doc_id": pa.array(ids, type=pa.string()),
            "html": pa.array(htmls, type=pa.string()),
        }
    )


def read_warc(paths):
    """WARC file path(s) → Dataset of (doc_id, html), one task per file."""
    import ray.data

    ds = ray.data.read_binary_files(paths)
    return ds.map_batches(warc_pages_batch, batch_format="pyarrow")


def make_warc(pages: list[tuple[str, str]], compress: bool = False) -> bytes:
    """Deterministic WARC writer (for tests/benchmarks — no external
    data): one ``response`` record per (uri, html) pair, UTF-8, minimal
    HTTP envelope. ``compress=True`` emits one gzip member per record,
    the standard .warc.gz layout."""
    out = bytearray()
    for uri, html in pages:
        body = html.encode("utf-8")
        http = (
            b"HTTP/1.1 200 OK\r\n"
            b"Content-Type: text/html; charset=utf-8\r\n"
            b"Content-Length: " + str(len(body)).encode() + b"\r\n\r\n"
        ) + body
        rec = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + uri.encode("utf-8") + b"\r\n"
            b"Content-Type: application/http;msgtype=response\r\n"
            b"Content-Length: " + str(len(http)).encode() + b"\r\n\r\n"
        ) + http + b"\r\n\r\n"
        if compress:
            out += gzip.compress(bytes(rec))
        else:
            out += rec
    return bytes(out)
