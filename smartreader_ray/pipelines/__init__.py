"""Pipelines: streaming extraction with skew routing + checkpointed runs."""

from .extract import build_extraction_pipeline, corpus_metrics
from .training_data import build_curation_pipeline, build_training_pipeline
from .checkpoint import (
    CheckpointedExtraction,
    CheckpointedTransform,
    files_fingerprint,
    read_manifest,
    read_manifest_header,
)

__all__ = [
    "build_extraction_pipeline",
    "build_curation_pipeline",
    "build_training_pipeline",
    "corpus_metrics",
    "CheckpointedExtraction",
    "CheckpointedTransform",
    "files_fingerprint",
    "read_manifest",
    "read_manifest_header",
]
