"""Extraction core: (uri, html) → ArticleResult, pure per document."""

from .article import ArticleResult, convert_to_plaintext, time_to_read_seconds
from .config import DEFAULT_CONFIG, ExtractorConfig
from .core import ExtractionBudgetExceeded, Extractor, parse_article
from .metadata import get_article_metadata, get_jsonld, text_similarity, try_parse_date
from .urialg import PageUri

__all__ = [
    "ArticleResult",
    "convert_to_plaintext",
    "time_to_read_seconds",
    "DEFAULT_CONFIG",
    "ExtractorConfig",
    "ExtractionBudgetExceeded",
    "Extractor",
    "parse_article",
    "get_article_metadata",
    "get_jsonld",
    "text_similarity",
    "try_parse_date",
    "PageUri",
]
