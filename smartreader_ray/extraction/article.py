"""Article output record + plaintext conversion + time-to-read.

Semantics follow the reference's ``Article.cs`` (ConvertToPlaintext
:268-344, Length :103) and ``TimeToReadCalculator.cs:10-70``.
"""

from __future__ import annotations

import unicodedata
from dataclasses import dataclass, field
from datetime import datetime
from typing import Optional

from ..dom import Element
from . import regexes

#: chars/minute by language (TimeToReadCalculator.cs:10-29)
CHARACTERS_MINUTE = {
    "Arabic": 612, "Chinese": 255, "Dutch": 978, "English": 987,
    "Finnish": 1078, "French": 998, "German": 920, "Hebrew": 833,
    "Italian": 950, "Japanese": 357, "Polish": 916, "Portuguese": 913,
    "Swedish": 917, "Slovenian": 885, "Spanish": 1025, "Russian": 986,
    "Turkish": 1054,
}

#: ISO-639-1 primary subtag → CultureInfo.EnglishName prefix
#: (stand-in for the .NET culture table, SmartReader.cs:2528-2546)
LANG_ENGLISH_NAME = {
    "ar": "Arabic", "zh": "Chinese", "nl": "Dutch", "en": "English",
    "fi": "Finnish", "fr": "French", "de": "German", "he": "Hebrew",
    "it": "Italian", "ja": "Japanese", "pl": "Polish", "pt": "Portuguese",
    "sv": "Swedish", "sl": "Slovenian", "es": "Spanish", "ru": "Russian",
    "tr": "Turkish", "cs": "Czech", "da": "Danish", "el": "Greek",
    "hu": "Hungarian", "ko": "Korean", "no": "Norwegian", "ro": "Romanian",
    "uk": "Ukrainian", "vi": "Vietnamese", "hi": "Hindi", "th": "Thai",
    "id": "Indonesian", "fa": "Persian", "ht": "Haitian",
}


def english_language_name(language: Optional[str]) -> Optional[str]:
    if not language:
        return None
    primary = language.split("-")[0].split("_")[0].strip().lower()
    return LANG_ENGLISH_NAME.get(primary)


def chars_per_minute(language: Optional[str]) -> int:
    name = english_language_name(language)
    if name is None:
        return 960  # average excluding outliers (TimeToReadCalculator.cs:66)
    for key, value in CHARACTERS_MINUTE.items():
        if name.startswith(key):
            return value
    return 960


def _convert_to_text(el: Element, out: list[str]) -> None:
    """Article.cs:317-344 — newline before P/BR, after P."""
    if el.node_type == 1 and el.node_name in ("P", "BR"):
        out.append("\n")
    for child in el.childNodes:
        if isinstance(child, Element):
            _convert_to_text(child, out)
        elif child.node_type == 3:
            out.append(child.data)
    if el.node_type == 1 and el.node_name == "P":
        out.append("\n")


#: every Unicode Z-category codepoint (Zs + Zl + Zp) — the set the
#: reference's char.IsWhiteSpace-ish "space" test reduces to here; a
#: frozenset lookup replaces a per-char unicodedata.category call
_Z_SPACE = frozenset(
    "\x20\xa0\u1680\u2000\u2001\u2002\u2003\u2004\u2005\u2006\u2007"
    "\u2008\u2009\u200a\u2028\u2029\u202f\u205f\u3000"
)


def convert_to_plaintext(el: Element) -> str:
    """Article.cs:268-312 — whitespace-normalizing DOM→text conversion.

    Drop rule (faithful to the reference's char loop): a Z-category space
    is dropped iff the next char is a newline, the previous char was a
    newline, or the previous char was a space."""
    sb: list[str] = []
    _convert_to_text(el, sb)
    text = regexes.ELIMINATE_TABS.sub(" ", "".join(sb))

    out: list[str] = []
    append = out.append
    z_set = _Z_SPACE
    prev_space = False
    prev_newline = False
    n = len(text)
    for i, ch in enumerate(text):
        if ch in z_set:
            if not (
                prev_space
                or prev_newline
                or (i + 1 < n and text[i + 1] in "\r\n")
            ):
                append(ch)
            prev_space = True
            prev_newline = False
        else:
            append(ch)
            prev_space = False
            prev_newline = ch == "\n" or ch == "\r"

    text = "".join(out).strip()
    return regexes.NORMALIZE_NEWLINES.sub("\n\n", text)


#: lazily-built per-char UTF-16 letter weights (see count_letters)
_LETTER_WEIGHT: dict[str, int] = {}


def count_letters(text: str) -> int:
    """TimeToReadCalculator.cs:42 — chars that are not ' ' nor punctuation.

    Counted in UTF-16 code units (.NET ``char`` semantics): astral-plane
    characters contribute 2 (surrogates are category Cs — neither space
    nor punctuation). Classified once per distinct char (memo dict) and
    multiplied by occurrence counts — C-speed counting via Counter.
    """
    from collections import Counter

    weights = _LETTER_WEIGHT
    total = 0
    for ch, n in Counter(text).items():
        w = weights.get(ch)
        if w is None:
            if ord(ch) > 0xFFFF:
                w = 2
            elif ch != " " and not unicodedata.category(ch).startswith("P"):
                w = 1
            else:
                w = 0
            weights[ch] = w
        total += w * n
    return total


def time_to_read_seconds(element_text: str, plain_text: str, language: Optional[str]) -> int:
    """TimeToReadCalculator.cs:33-47 (whole minutes, min 1, 0 when empty)."""
    if not plain_text:
        return 0
    weight = chars_per_minute(language)
    letter_count = count_letters(element_text)
    minutes = letter_count // weight
    return max(minutes, 1) * 60


@dataclass
class ArticleResult:
    uri: str
    title: str = ""
    byline: str = ""
    dir: str = ""
    language: str = ""
    author: str = ""
    site_name: str = ""
    excerpt: str = ""
    featured_image: str = ""
    publication_date: Optional[datetime] = None
    alternative_language_uris: dict = field(default_factory=dict)
    is_readable: bool = False
    completed: bool = True
    error: str = ""
    content_html: str = ""
    text_content: str = ""
    length: int = 0
    time_to_read_s: int = 0
    element: Optional[Element] = None
    # extraction metrics (north-rule lineage/metrics requirement)
    chars_kept: int = 0
    chars_dropped: int = 0
    top_candidate_score: float = 0.0
    n_candidates: int = 0
    attempts: int = 0
    parse_ms: float = 0.0
