"""Text helpers matching the HTML5 space-character rules the reference
relies on (AngleSharp ``StringExtensions.Collapse``, used by
``NodeUtility.GetInnerText`` — reference ``NodeUtility.cs:405-412``)."""

from __future__ import annotations

# HTML5 "space characters": space, tab, LF, FF, CR (NOT U+00A0).
_HTML_SPACE = " \t\n\f\r"
_SPACE_SET = frozenset(_HTML_SPACE)

import re

_COLLAPSE_RE = re.compile(r"[ \t\n\f\r]+")


def collapse_whitespace(text: str) -> str:
    """Collapse runs of HTML5 space characters into a single space."""
    return _COLLAPSE_RE.sub(" ", text)


def is_html_space(ch: str) -> bool:
    return ch in _SPACE_SET
