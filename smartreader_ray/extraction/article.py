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


def convert_to_plaintext(el: Element) -> str:
    """Article.cs:268-312 — whitespace-normalizing DOM→text conversion."""
    sb: list[str] = []
    _convert_to_text(el, sb)
    text = "".join(sb)
    text = regexes.ELIMINATE_TABS.sub(" ", text)

    out: list[str] = []
    previous_space = False
    previous_newline = False
    n = len(text)
    for i in range(n):
        ch = text[i]
        is_space = unicodedata.category(ch).startswith("Z")
        is_newline = ch in ("\r", "\n")
        is_next_newline = i < n - 1 and text[i + 1] in ("\r", "\n")
        if (
            (is_space and is_next_newline)
            or (previous_newline and is_space)
            or (previous_space and is_space)
        ):
            pass
        else:
            out.append(ch)
        previous_space = is_space
        previous_newline = is_newline

    text = "".join(out).strip()
    return regexes.NORMALIZE_NEWLINES.sub("\n\n", text)


def count_letters(text: str) -> int:
    """TimeToReadCalculator.cs:42 — chars that are not ' ' nor punctuation.

    Counted in UTF-16 code units (.NET ``char`` semantics): astral-plane
    characters contribute 2 (surrogates are category Cs — neither space
    nor punctuation).
    """
    count = 0
    for ch in text:
        if ord(ch) > 0xFFFF:
            count += 2
        elif ch != " " and not unicodedata.category(ch).startswith("P"):
            count += 1
    return count


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
