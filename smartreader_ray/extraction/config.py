"""Frozen extractor configuration (reference tunables, SmartReader.cs:59-170).

The reference exposes these as mutable ``Reader`` properties plus four
*global static* delegates (``Article.cs:73-117``); here everything is one
immutable config object closed over by the ``map_batches`` UDF / actor
constructor, so pipelines are hermetic.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Callable, Optional


def _default_min_content_length() -> dict[str, int]:
    return {"Default": 140, "English": 140}


@dataclass(frozen=True)
class ExtractorConfig:
    max_elems_to_parse: int = 0
    n_top_candidates: int = 5
    char_threshold: int = 500
    ancestors_depth: int = 5
    paragraph_threshold: int = 25
    classes_to_preserve: tuple[str, ...] = ("page",)
    keep_classes: bool = False
    continue_if_not_readable: bool = True
    disable_jsonld: bool = False
    min_content_length_readerable: dict = field(default_factory=_default_min_content_length)
    min_score_readerable: int = 20
    force_header_encoding: bool = False
    link_density_modifier: float = 0.0
    pre_clean_page: bool = False
    debug: bool = False

    # logging surface (SmartReader.cs:118-122): ``logger`` receives every
    # trace message; "info"-level sites fire when debug or logging=="info",
    # issue-level sites (role removal, not-readable warning) always fire.
    logging: str = "issue"  # "issue" | "info"
    logger: Optional[Callable[[str], None]] = None

    # extension surface: hooks run on the document element before parsing /
    # on the article element after (SmartReader.cs:373-435)
    custom_operations_start: tuple[Callable, ...] = ()
    custom_operations_end: tuple[Callable, ...] = ()

    # pluggable visibility predicate (SmartReader.cs:152)
    is_node_visible: Optional[Callable] = None

    # delegate equivalents (Article.cs:73-117): serializer(el)->str,
    # converter(el)->str, language_identification(text, lang)->lang,
    # create_summary(text, excerpt)->excerpt
    serializer: Optional[Callable] = None
    converter: Optional[Callable] = None
    language_identification: Optional[Callable] = None
    create_summary: Optional[Callable] = None

    # regex override surface (RegularExpressions.cs + SmartReader.cs:2440-2508):
    # mapping of {"unlikelyCandidates": pattern, ...} replacing the default,
    # and {"byline": extra_alternative, ...} appended with "|".
    replace_regexes: tuple[tuple[str, str], ...] = ()
    add_regex_options: tuple[tuple[str, str], ...] = ()

    def build_regexes(self):
        """Resolve the effective per-pipeline regex set."""
        from . import regexes as R

        resolved = {
            "unlikelyCandidates": R.UNLIKELY_CANDIDATES,
            "possibleCandidates": R.OK_MAYBE_ITS_A_CANDIDATE,
            "positive": R.POSITIVE,
            "negative": R.NEGATIVE,
            "extraneous": R.EXTRANEOUS,
            "byline": R.BYLINE,
            "videos": R.VIDEOS,
            "shareElements": R.SHARE_ELEMENTS,
        }
        for key, pattern in self.replace_regexes:
            resolved[key] = re.compile(pattern, re.I)
        for key, option in self.add_regex_options:
            base = resolved[key].pattern
            if key == "videos":
                resolved[key] = re.compile(f"{base[:-1]}|{option})", re.I)
            elif key == "shareElements":
                resolved[key] = re.compile(rf"(\b|_)(share|sharedaddy|{option})(\b|_)", re.I)
            else:
                resolved[key] = re.compile(f"{base}|{option}", re.I)
        return resolved


DEFAULT_CONFIG = ExtractorConfig()
