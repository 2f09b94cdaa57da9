"""Sitemap writer/parser round trip and malformed-input policy."""

import pytest

from smartreader_ray.sources.sitemap import (make_sitemap,
                                             make_sitemap_index,
                                             parse_sitemap)


def test_urlset_round_trip_preserves_order_and_lastmod():
    entries = [
        ("https://a.org/1", "2024-01-02"),
        ("https://a.org/2", None),
        ("https://a.org/<&>", "2024-12-31"),  # escaping round-trips
    ]
    kind, out = parse_sitemap(make_sitemap(entries))
    assert kind == "urlset"
    assert out == entries


def test_sitemapindex_round_trip():
    locs = [f"https://h{i}.org/sitemap.xml" for i in range(5)]
    kind, out = parse_sitemap(make_sitemap_index(locs))
    assert kind == "sitemapindex"
    assert [loc for loc, _ in out] == locs


def test_parse_tolerates_missing_namespace():
    raw = b"<urlset><url><loc>https://x.org/a</loc></url></urlset>"
    kind, out = parse_sitemap(raw)
    assert kind == "urlset" and out == [("https://x.org/a", None)]


def test_parse_rejects_malformed_and_unknown_root():
    with pytest.raises(ValueError, match="parse error"):
        parse_sitemap(b"<urlset><url>")
    with pytest.raises(ValueError, match="not a sitemap root"):
        parse_sitemap(b"<rss/>")


def test_entries_without_loc_are_skipped():
    raw = (b'<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
           b"<url><lastmod>2024-01-01</lastmod></url>"
           b"<url><loc>https://x.org/b</loc></url></urlset>")
    _, out = parse_sitemap(raw)
    assert out == [("https://x.org/b", None)]
