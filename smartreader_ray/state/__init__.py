"""Shared mutable state: the one shape the Dataset API can't express.

Everything else in this engine is a pure batch transform or a keyed
exchange; raw ``@ray.remote`` actors appear ONLY here, for state that
must mutate across batches — the incremental dedup index.
"""

from .dedup_index import BandKeyShard, DedupIndex, FingerprintShard, NearDupIndex

__all__ = ["BandKeyShard", "DedupIndex", "FingerprintShard", "NearDupIndex"]
