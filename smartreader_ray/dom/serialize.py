"""HTML serialization matching the conventions the fixture corpus pins
(AngleSharp default formatter, used by ``Article.Serializer`` —
reference ``Article.cs:73``): text escapes ``& < > \xa0``; attribute
values escape ``& " \xa0``; attributes always double-quoted; void
elements have no end tag; raw-text elements serialize unescaped."""

from __future__ import annotations

from .node import (
    CommentNode,
    Document,
    Element,
    ParentNode,
    RAW_TEXT_ELEMENTS,
    TextNode,
    VOID_ELEMENTS,
)


def _escape_text(s: str) -> str:
    if ("&" in s) or ("<" in s) or (">" in s) or ("\xa0" in s):
        s = s.replace("&", "&amp;").replace("\xa0", "&nbsp;")
        s = s.replace("<", "&lt;").replace(">", "&gt;")
    return s


def _escape_attr(s: str) -> str:
    if ("&" in s) or ('"' in s) or ("\xa0" in s):
        s = s.replace("&", "&amp;").replace("\xa0", "&nbsp;")
        s = s.replace('"', "&quot;")
    return s


def _start_tag(el: Element, out: list[str]) -> None:
    out.append("<")
    out.append(el.xml_name or el.local_name)
    for name, value in el.attrs.items():
        out.append(" ")
        out.append(name)
        out.append('="')
        out.append(_escape_attr(value))
        out.append('"')
    out.append(">")


def _serialize_node(node, out: list[str]) -> None:
    if isinstance(node, TextNode):
        parent = node.parent
        if isinstance(parent, Element) and parent.local_name in RAW_TEXT_ELEMENTS:
            out.append(node.data)
        else:
            out.append(_escape_text(node.data))
        return
    if isinstance(node, CommentNode):
        out.append("<!--")
        out.append(node.data)
        out.append("-->")
        return
    if isinstance(node, Element):
        _start_tag(node, out)
        if node.local_name in VOID_ELEMENTS:
            return
        for c in node.childNodes:
            _serialize_node(c, out)
        out.append("</")
        out.append(node.xml_name or node.local_name)
        out.append(">")


def inner_html(node: ParentNode) -> str:
    out: list[str] = []
    for c in node.childNodes:
        _serialize_node(c, out)
    return "".join(out)


def outer_html(node) -> str:
    out: list[str] = []
    _serialize_node(node, out)
    return "".join(out)


def set_inner_html(el: Element, html: str) -> None:
    """Replace el's children with the parse of ``html`` (fragment-ish:
    re-parses through the document parser and adopts body children)."""
    from .parser import parse_html

    doc = parse_html(html)
    while el.first_child is not None:
        el.remove_child(el.first_child)
    body = doc.body
    if body is not None:
        for c in list(body.childNodes):
            el.append_child(c)


def document_html(doc: Document) -> str:
    return inner_html(doc)
