"""Sitemap discovery: XML sitemap writer + parser (sitemaps.org 0.9).

The crawl-ingestion triangle below the socket: WARC reading
(`sources/warc.py`), robots politeness (`functions/robots.py`), and —
here — URL discovery. The reference has no crawl layer at all (its
fetch is one HttpClient GET, SmartReader.cs:2365-2396); a web-scale
pipeline discovers work from per-host sitemaps, so the writer/parser
pair is implemented from scratch on stdlib ``xml.etree`` and exercised
end-to-end by the ``sitemap_gate`` round-trip oracle (deterministic
blobs built from the documents table, re-parsed, robots- and
freshness-gated, replayed arithmetically in SQL — same pattern as
``warc_extract``).

Deterministic by construction: entries are serialized in the exact
order given, no timestamps are invented, and the parser returns
document order.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from xml.sax.saxutils import escape

__all__ = ["make_sitemap", "make_sitemap_index", "parse_sitemap"]

_NS = "http://www.sitemaps.org/schemas/sitemap/0.9"


def make_sitemap(entries: list[tuple[str, str | None]]) -> bytes:
    """Serialize ``[(loc, lastmod-or-None)]`` as a sitemaps.org urlset.
    Entry order is preserved byte-for-byte (no reordering, no added
    whitespace variance) so blobs are reproducible."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           f'<urlset xmlns="{_NS}">']
    for loc, lastmod in entries:
        out.append("<url>")
        out.append(f"<loc>{escape(loc)}</loc>")
        if lastmod is not None:
            out.append(f"<lastmod>{escape(lastmod)}</lastmod>")
        out.append("</url>")
    out.append("</urlset>")
    return "\n".join(out).encode("utf-8")


def make_sitemap_index(locs: list[str]) -> bytes:
    """Serialize child-sitemap locations as a sitemapindex."""
    out = ['<?xml version="1.0" encoding="UTF-8"?>',
           f'<sitemapindex xmlns="{_NS}">']
    for loc in locs:
        out.append(f"<sitemap><loc>{escape(loc)}</loc></sitemap>")
    out.append("</sitemapindex>")
    return "\n".join(out).encode("utf-8")


def parse_sitemap(payload: bytes) -> tuple[str, list[tuple[str, str | None]]]:
    """Parse a sitemap blob. Returns ``(kind, entries)`` where kind is
    ``"urlset"`` or ``"sitemapindex"`` and entries are
    ``[(loc, lastmod-or-None)]`` in document order. Namespace-tolerant:
    accepts the sitemaps.org namespace or none (wild sitemaps omit it).
    Raises ``ValueError`` on malformed XML or an unknown root — callers
    turn that into an error row, never a task failure."""
    try:
        root = ET.fromstring(payload)
    except ET.ParseError as exc:
        raise ValueError(f"sitemap parse error: {exc}") from exc

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    kind = local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        raise ValueError(f"not a sitemap root: {root.tag!r}")
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries: list[tuple[str, str | None]] = []
    for el in root:
        if local(el.tag) != child_tag:
            continue
        loc, lastmod = None, None
        for f in el:
            name = local(f.tag)
            if name == "loc":
                loc = (f.text or "").strip()
            elif name == "lastmod":
                lastmod = (f.text or "").strip() or None
        if loc:
            entries.append((loc, lastmod))
    return kind, entries
