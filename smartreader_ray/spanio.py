"""Span ⇄ HTML codecs — the engine's interchange data model.

``BASELINE.json.input_hint``: documents are interleaved text+media spans
``list<struct<kind, text, media_ref, offset>>``. Raw markup travels in
``kind="html"`` spans; extracted articles flatten to ``kind="text"`` runs
plus ``kind="image" | "video" | "embed"`` media spans. The flattener is the
per-row invariant used against the reference fixtures (span-sequence
equality on (kind, text, media_ref, order) — applied identically to our
output and to the reference's ``expected.html``).
"""

from __future__ import annotations

from typing import Iterable, Optional

from .dom import CommentNode, Element, TextNode, collapse_whitespace, parse_html
from .dom.node import ParentNode

#: default chunking for synthetic span construction (~64 KB)
DEFAULT_CHUNK = 64 * 1024

#: media element → span kind
_MEDIA_KINDS = {
    "IMG": "image",
    "PICTURE": "image",
    "VIDEO": "video",
    "AUDIO": "video",
    "IFRAME": "embed",
    "EMBED": "embed",
    "OBJECT": "embed",
}

#: elements that break a text run (block-level display, readability's O8
#: plaintext rules put newlines at P/BR — we break runs at all blocks so
#: the invariant is insensitive to inline-markup serialization)
_BLOCK_BREAKERS = frozenset(
    """ADDRESS ARTICLE ASIDE BLOCKQUOTE BODY CAPTION DD DIV DL DT FIELDSET
    FIGCAPTION FIGURE FOOTER FORM H1 H2 H3 H4 H5 H6 HEADER HR LI MAIN NAV
    OL P PRE SECTION TABLE TBODY TD TFOOT TH THEAD TR UL BR""".split()
)

_SKIP_SUBTREES = frozenset({"SCRIPT", "STYLE", "NOSCRIPT", "TEMPLATE", "HEAD"})


def make_span(kind: str, text: str = "", media_ref: str = "", offset: int = 0) -> dict:
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


# ---------------------------------------------------------------------------
# assemble: spans -> source html (input side)
# ---------------------------------------------------------------------------
def assemble_html(spans: Iterable[dict]) -> str:
    """Concatenate ``kind='html'`` span text in offset order (F1 rule)."""
    html_spans = [s for s in spans if s.get("kind") == "html"]
    html_spans.sort(key=lambda s: s.get("offset", 0))
    return "".join(s.get("text") or "" for s in html_spans)


def html_to_spans(html: str, chunk_size: int = DEFAULT_CHUNK) -> list[dict]:
    """Chunk raw HTML into consecutive ``kind='html'`` spans (≥1 per doc)."""
    if not html:
        return [make_span("html", "", "", 0)]
    spans = []
    for i, start in enumerate(range(0, len(html), chunk_size)):
        spans.append(make_span("html", html[start:start + chunk_size], "", i))
    return spans


# ---------------------------------------------------------------------------
# flatten: extracted DOM -> interleaved text+media spans (output side)
# ---------------------------------------------------------------------------
def _media_ref_of(el: Element) -> str:
    for attr in ("src", "poster", "data", "srcset", "href"):
        v = el.get_attribute(attr)
        if v:
            if attr == "srcset":
                return v.split(",")[0].strip().split(" ")[0]
            return v
    return ""


def flatten_element(root: ParentNode) -> list[dict]:
    """DFS over the extracted article emitting interleaved spans.

    - text runs break at block boundaries, are whitespace-collapsed and
      trimmed; empty runs are dropped
    - media elements emit (kind, text=alt/caption, media_ref=resolved src)
      at their document position
    """
    spans: list[dict] = []
    buf: list[str] = []

    def flush() -> None:
        if buf:
            text = collapse_whitespace("".join(buf)).strip()
            del buf[:]
            if text:
                spans.append(make_span("text", text, "", len(spans)))

    def walk(node) -> None:
        if isinstance(node, TextNode):
            buf.append(node.data)
            return
        if isinstance(node, CommentNode):
            return
        if isinstance(node, Element):
            tag = node.tag
            if tag in _SKIP_SUBTREES:
                return
            kind = _MEDIA_KINDS.get(tag)
            if kind is not None:
                ref = _media_ref_of(node)
                if tag == "PICTURE":
                    # pick the nested img's src if present
                    imgs = node.get_elements_by_tag_name("img")
                    if imgs:
                        ref = _media_ref_of(imgs[0]) or ref
                flush()
                alt = node.get_attribute("alt") or node.get_attribute("title") or ""
                spans.append(make_span(kind, collapse_whitespace(alt).strip(), ref, len(spans)))
                return
            breaker = tag in _BLOCK_BREAKERS
            if breaker:
                flush()
            for child in node.childNodes:
                walk(child)
            if breaker:
                flush()

    for child in root.childNodes:
        walk(child)
    flush()
    return spans


def flatten_html(html: str) -> list[dict]:
    """Parse an HTML (fragment or document) and flatten its body."""
    doc = parse_html(html)
    body = doc.body if doc.body is not None else doc
    return flatten_element(body)


def spans_equal(a: list[dict], b: list[dict]) -> bool:
    """The per-row invariant: equality on (kind, text, media_ref, order)."""
    if len(a) != len(b):
        return False
    for sa, sb in zip(a, b):
        if (
            sa["kind"] != sb["kind"]
            or sa["text"] != sb["text"]
            or sa["media_ref"] != sb["media_ref"]
        ):
            return False
    return True
