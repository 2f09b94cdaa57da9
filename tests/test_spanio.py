"""Span codec tests: assemble/chunk round-trip + flattener semantics."""

from smartreader_ray.dom import parse_html
from smartreader_ray.spanio import (
    assemble_html,
    flatten_element,
    flatten_html,
    html_to_spans,
    spans_equal,
)


def test_chunk_roundtrip():
    html = "<html><body>" + "x" * 200_000 + "</body></html>"
    spans = html_to_spans(html, chunk_size=64 * 1024)
    assert len(spans) == 4
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]
    assert assemble_html(spans) == html


def test_assemble_sorts_by_offset_and_skips_media():
    spans = [
        {"kind": "html", "text": "b", "media_ref": "", "offset": 1},
        {"kind": "media", "text": "", "media_ref": "m.png", "offset": 2},
        {"kind": "html", "text": "a", "media_ref": "", "offset": 0},
    ]
    assert assemble_html(spans) == "ab"


def test_flatten_interleaves_text_and_media():
    doc = parse_html(
        "<body><div><p>one two</p>"
        '<img src="i.png" alt="pic"><p>three</p>'
        '<iframe src="https://player.example/e"></iframe></div></body>'
    )
    spans = flatten_element(doc.body)
    kinds = [s["kind"] for s in spans]
    assert kinds == ["text", "image", "text", "embed"]
    assert spans[0]["text"] == "one two"
    assert spans[1]["media_ref"] == "i.png"
    assert spans[1]["text"] == "pic"
    assert [s["offset"] for s in spans] == [0, 1, 2, 3]


def test_flatten_collapses_whitespace_and_drops_empty():
    spans = flatten_html("<div>  a \n b  </div><div>   </div>")
    assert len(spans) == 1
    assert spans[0]["text"] == "a b"


def test_spans_equal():
    a = flatten_html("<p>x</p><img src='u'>")
    b = flatten_html("<div><p>x</p></div><img src='u'>")  # same flattened view
    assert spans_equal(a, b)
    c = flatten_html("<p>y</p><img src='u'>")
    assert not spans_equal(a, c)
