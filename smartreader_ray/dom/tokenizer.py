"""One-shot HTML tokenizer, behavior-compatible with stdlib html.parser.

The stdlib ``HTMLParser`` is built for incremental feeding: every token
pays for buffer management, ``updatepos`` line counting (an O(segment)
newline count per data chunk), a two-pass start-tag scan
(``check_for_whole_start_tag`` then ``parse_starttag``), and
re-entrancy bookkeeping. Our engine always has the whole document in
memory, so this module scans it once with no position accounting.

Observable behavior (the exact sequence of ``handle_*`` calls,
including tolerant-recovery quirks for malformed markup) is kept
IDENTICAL to ``html.parser`` with ``convert_charrefs=True`` — verified
by the differential test in ``tests/test_dom.py`` which replays the
fixture corpus plus adversarial snippets through both tokenizers and
asserts equal event streams. Patterns below intentionally match the
stdlib's (CPython ``html/parser.py`` / ``_markupbase.py``, PSF
license) so recovery semantics line up.
"""

from __future__ import annotations

import re
from html import unescape

# stdlib-equivalent patterns (html/parser.py)
_TAGFIND = re.compile(r'([a-zA-Z][^\t\n\r\f />\x00]*)(?:\s|/(?!>))*')
_ATTRFIND = re.compile(
    r'((?<=[\'"\s/])[^\s/>][^\s/=>]*)(\s*=+\s*'
    r'(\'[^\']*\'|"[^"]*"|(?![\'"])[^>\s]*))?(?:\s|/(?!>))*')
_LOCATESTART = re.compile(r"""
  <[a-zA-Z][^\t\n\r\f />\x00]*       # tag name
  (?:[\s/]*                          # optional whitespace before attribute name
    (?:(?<=['"\s/])[^\s/>][^\s/=>]*  # attribute name
      (?:\s*=+\s*                    # value indicator
        (?:'[^']*'                   # LITA-enclosed value
          |"[^"]*"                   # LIT-enclosed value
          |(?!['"])[^>\s]*           # bare value
         )
        \s*                          # possibly followed by a space
       )?(?:\s|/(?!>))*
     )*
   )?
  \s*                                # trailing whitespace
""", re.VERBOSE)
_ENDTAGFIND = re.compile(r'</\s*([a-zA-Z][-.a-zA-Z0-9:_]*)\s*>')
_COMMENTCLOSE = re.compile(r'--\s*>')
# _markupbase patterns
_DECLNAME = re.compile(r'[a-zA-Z][-_.a-zA-Z0-9]*\s*')
_MARKEDSECTIONCLOSE = re.compile(r']\s*]\s*>')
_MSMARKEDSECTIONCLOSE = re.compile(r']\s*>')

_ASCII_LETTERS = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ")
_BOGUS_START_NEXT = frozenset("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ=/")

# fast path: plain attribute-less start tag — one regex, no attr loop.
# (The general path gives identical results; this just skips three regex
# calls for the majority shape: <p>, <div>, <br>, …)
_SIMPLE_START = re.compile(r'<([a-zA-Z][a-zA-Z0-9]*)>')

_cdata_close_cache: dict[str, re.Pattern] = {}


def _cdata_close(tag: str) -> re.Pattern:
    pat = _cdata_close_cache.get(tag)
    if pat is None:
        pat = re.compile(r'</\s*%s\s*>' % tag, re.I)
        _cdata_close_cache[tag] = pat
    return pat


def tokenize(text: str, tb) -> None:
    """Drive ``tb`` (a tree builder exposing the HTMLParser handler
    surface: handle_starttag/startendtag/endtag/data/comment/decl/pi,
    unknown_decl, CDATA_CONTENT_ELEMENTS, and a ``cdata_elem``
    attribute) over the whole of ``text`` in one pass."""
    n = len(text)
    i = 0
    handle_data = tb.handle_data
    find = text.find
    tb.cdata_elem = None
    while i < n:
        cdata = tb.cdata_elem
        if cdata:
            m = _cdata_close(cdata).search(text, i)
            if m is None:
                # unterminated raw-text element: stdlib leaves the tail
                # unprocessed (dropped at close())
                return
            j = m.start()
            if i < j:
                handle_data(text[i:j])
            tb.handle_endtag(cdata)
            tb.cdata_elem = None
            i = m.end()
            continue
        j = find('<', i)
        if j < 0:
            j = n
        if i < j:
            handle_data(unescape(text[i:j]))
        i = j
        if i >= n:
            break
        c = text[i + 1] if i + 1 < n else ''
        if c in _ASCII_LETTERS:
            k = _parse_starttag(text, i, tb)
        elif c == '/':
            k = _parse_endtag(text, i, tb)
        elif text.startswith('<!--', i):
            k = _parse_comment(text, i, tb)
        elif c == '?':
            k = _parse_pi(text, i, tb)
        elif c == '!':
            k = _parse_html_declaration(text, i, tb)
        elif i + 1 < n:
            handle_data('<')
            i += 1
            continue
        else:
            # lone '<' at EOF: emitted by the end-of-input flush below
            k = -1
            i = _eof_fallback(text, i, tb)
            continue
        if k < 0:
            # incomplete construct at EOF — stdlib end=True fallback
            i = _eof_fallback(text, i, tb)
            continue
        i = k
    # (nothing buffered in one-shot mode; loop consumed everything)


def _eof_fallback(text: str, i: int, tb) -> int:
    """stdlib goahead(end=1) recovery for a construct with no terminator:
    emit up to the next '>' (inclusive) or '<' or one char, as data."""
    k = text.find('>', i + 1)
    if k < 0:
        k = text.find('<', i + 1)
        if k < 0:
            k = i + 1
    else:
        k += 1
    tb.handle_data(unescape(text[i:k]))
    return k


def _parse_starttag(text: str, i: int, tb) -> int:
    sm = _SIMPLE_START.match(text, i)
    if sm:
        tag = sm.group(1).lower()
        tb.handle_starttag(tag, [])
        if tag in tb.CDATA_CONTENT_ELEMENTS:
            tb.cdata_elem = tag
        return sm.end()
    # merged check_for_whole_start_tag + parse_starttag
    m = _LOCATESTART.match(text, i)
    j = m.end()
    nxt = text[j:j + 1]
    if nxt == '>':
        endpos = j + 1
    elif nxt == '/':
        if text.startswith('/>', j):
            endpos = j + 2
        else:  # '/' at EOF
            return -1
    elif nxt == '':
        return -1
    elif nxt in _BOGUS_START_NEXT:
        # end of input in or before attribute value
        return -1
    else:
        endpos = j if j > i else i + 1

    tagm = _TAGFIND.match(text, i + 1)
    tag = tagm.group(1).lower()
    attrs = []
    k = tagm.end()
    while k < endpos:
        am = _ATTRFIND.match(text, k)
        if not am:
            break
        attrname, rest, attrvalue = am.group(1, 2, 3)
        if not rest:
            attrvalue = None
        elif attrvalue[:1] == '\'' == attrvalue[-1:] or \
                attrvalue[:1] == '"' == attrvalue[-1:]:
            attrvalue = attrvalue[1:-1]
        if attrvalue:
            attrvalue = unescape(attrvalue)
        attrs.append((attrname.lower(), attrvalue))
        k = am.end()

    end = text[k:endpos].strip()
    if end not in ('>', '/>'):
        tb.handle_data(text[i:endpos])
        return endpos
    if end.endswith('/>'):
        tb.handle_startendtag(tag, attrs)
    else:
        tb.handle_starttag(tag, attrs)
        if tag in tb.CDATA_CONTENT_ELEMENTS:
            tb.cdata_elem = tag
    return endpos


def _parse_endtag(text: str, i: int, tb) -> int:
    # common case first: a well-formed close tag (implies a '>' exists,
    # so the stdlib's "no '>' anywhere → incomplete" check is subsumed)
    m = _ENDTAGFIND.match(text, i)
    if m:
        elem = m.group(1).lower()
        if tb.cdata_elem is not None and elem != tb.cdata_elem:
            return_pos = text.find('>', i + 1) + 1
            tb.handle_data(text[i:return_pos])
            return return_pos
        tb.handle_endtag(elem)
        tb.cdata_elem = None
        return m.end()
    gt = text.find('>', i + 1)
    if gt < 0:
        return -1
    gtpos = gt + 1
    if tb.cdata_elem is not None:
        tb.handle_data(text[i:gtpos])
        return gtpos
    namem = _TAGFIND.match(text, i + 2)
    if not namem:
        if text[i:i + 3] == '</>':
            return i + 3
        return _parse_bogus_comment(text, i, tb)
    tagname = namem.group(1).lower()
    gt2 = text.find('>', namem.end())
    tb.handle_endtag(tagname)
    return gt2 + 1


def _parse_bogus_comment(text: str, i: int, tb) -> int:
    pos = text.find('>', i + 2)
    if pos == -1:
        return -1
    tb.handle_comment(text[i + 2:pos])
    return pos + 1


def _parse_comment(text: str, i: int, tb) -> int:
    m = _COMMENTCLOSE.search(text, i + 4)
    if not m:
        return -1
    tb.handle_comment(text[i + 4:m.start()])
    return m.end()


def _parse_pi(text: str, i: int, tb) -> int:
    gt = text.find('>', i + 2)
    if gt < 0:
        return -1
    tb.handle_pi(text[i + 2:gt])
    return gt + 1


def _parse_html_declaration(text: str, i: int, tb) -> int:
    if text[i:i + 4] == '<!--':
        return _parse_comment(text, i, tb)
    if text[i:i + 3] == '<![':
        return _parse_marked_section(text, i, tb)
    if text[i:i + 9].lower() == '<!doctype':
        gt = text.find('>', i + 9)
        if gt == -1:
            return -1
        tb.handle_decl(text[i + 2:gt])
        return gt + 1
    return _parse_bogus_comment(text, i, tb)


def _parse_marked_section(text: str, i: int, tb) -> int:
    # _markupbase.parse_marked_section, including its raising behavior
    # for unknown section keywords (kept for stdlib bug-compatibility;
    # the extraction layer turns it into an error row either way)
    if i + 3 == len(text):
        return -1
    m = _DECLNAME.match(text, i + 3)
    if not m:
        raise AssertionError(
            "expected name token at %r" % text[i:i + 20]
        )
    if m.end() == len(text):
        return -1
    sect = m.group().strip().lower()
    if sect in ("temp", "cdata", "ignore", "include", "rcdata"):
        close = _MARKEDSECTIONCLOSE.search(text, i + 3)
    elif sect in ("if", "else", "endif"):
        close = _MSMARKEDSECTIONCLOSE.search(text, i + 3)
    else:
        raise AssertionError(
            'unknown status keyword %r in marked section' % text[i + 3:m.end()]
        )
    if not close:
        return -1
    tb.unknown_decl(text[i + 3:close.start()])
    return close.end()
