"""Minimal mutable DOM + HTML parser + serializer (stdlib-only)."""

from .node import (
    COMMENT_NODE,
    DOCUMENT_NODE,
    ELEMENT_NODE,
    TEXT_NODE,
    CommentNode,
    Document,
    Element,
    Node,
    ParentNode,
    TextNode,
    VOID_ELEMENTS,
)
from .parser import parse_html
from .selectors import element_matches, query_selector, query_selector_all
from .serialize import inner_html, outer_html, set_inner_html
from .text import collapse_whitespace

__all__ = [
    "COMMENT_NODE",
    "DOCUMENT_NODE",
    "ELEMENT_NODE",
    "TEXT_NODE",
    "CommentNode",
    "Document",
    "Element",
    "Node",
    "ParentNode",
    "TextNode",
    "VOID_ELEMENTS",
    "parse_html",
    "element_matches",
    "query_selector",
    "query_selector_all",
    "inner_html",
    "outer_html",
    "set_inner_html",
    "collapse_whitespace",
]
