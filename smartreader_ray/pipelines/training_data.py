"""End-to-end training-data curation: the operators composed.

quality filter → exact full-content dedup → deterministic per-language
sample — the canonical corpus-curation chain, built entirely from the
engine's own primitives so the whole pipeline stays streaming:

* the filter is a vectorized Arrow mask (no rows leave the read that
  fail it),
* the dedup ships only (fingerprint, doc_id) into its shuffle,
* the winner set comes back via the distributed hash join (NOT a
  broadcast — the surviving-id set is corpus-sized at 100 TB),
* the sample ranks ids by md5 so any engine reproduces it.

Every stage is SQL-expressible, so the composed pipeline has an EXACT
DuckDB oracle (see ``__ray_entry__.oracle_sql()["training_sample"]``) —
end-to-end hash equality, not just per-operator checks.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc


def build_training_pipeline(docs_ds, min_chars: int = 200, n_per_lang: int = 10):
    """documents(doc_id, text, lang) → (lang, doc_id) curated sample."""
    from ..functions import fingerprint_dedup, hash_join, stratified_sample

    def quality_filter(batch: pa.Table) -> pa.Table:
        mask = pc.greater_equal(
            pc.utf8_length(pc.coalesce(batch.column("text"), pa.scalar(""))),
            pa.scalar(min_chars),
        )
        return batch.filter(mask)

    filtered = docs_ds.map_batches(quality_filter, batch_format="pyarrow")
    winners = fingerprint_dedup(filtered)  # (fingerprint, keep_doc_id, n_dups)
    survivors = hash_join(
        filtered, winners, "doc_id", "keep_doc_id",
        ["doc_id", "lang"], ["n_dups"],
    )
    return stratified_sample(survivors, "lang", n_per_lang)
