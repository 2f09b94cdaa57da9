"""smartreader_ray — Ray-Data-native main-content extraction engine.

A from-scratch reimplementation of the SmartReader/Readability extraction
semantics (reference: Strumenta/SmartReader) expressed as Ray Data
pipelines: stateless ``map_batches`` over zero-copy Arrow batches with
actor-pool stages for the warm HTML parser, plus the corpus-level
operators a web-scale training-data pipeline needs (dedup, similarity,
text stats).
"""

__version__ = "0.1.0"
