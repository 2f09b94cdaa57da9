"""Pipelines: streaming extraction with skew routing + checkpointed runs."""

from .extract import build_extraction_pipeline, corpus_metrics
from .checkpoint import CheckpointedExtraction, read_manifest

__all__ = [
    "build_extraction_pipeline",
    "corpus_metrics",
    "CheckpointedExtraction",
    "read_manifest",
]
