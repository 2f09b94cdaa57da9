"""Ray Data batch stages: the extractor actor, size probe, metrics fold."""

from .extract import (
    ARTICLE_SCHEMA,
    ExtractBatch,
    SizeProbe,
    article_to_row,
    rows_to_table,
)

__all__ = [
    "ARTICLE_SCHEMA",
    "ExtractBatch",
    "SizeProbe",
    "article_to_row",
    "rows_to_table",
]
