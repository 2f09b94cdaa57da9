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


def build_curation_pipeline(docs_ds, eval_snippets,
                            min_distinct_num: int = 1,
                            min_distinct_den: int = 2,
                            cap: int = 10):
    """The safety-side curation chain, composed end to end:

    PII redaction → repetition filter (keep docs with n_distinct/n_tokens
    ≥ min_distinct_num/min_distinct_den — integer cross-multiplication,
    no float thresholds) → test-set decontamination (drop docs containing
    any eval snippet) → per-source cap.

    Streaming shape: redaction + repetition run fused in ONE map_batches
    (stats are never joined back — they filter in place, so rejected
    text dies in the batch that scored it); the contamination flag is an
    actor stage with the snippet DFA built once per actor; only the
    final (source, doc_id) pair enters the groupby. Every stage is
    SQL-expressible → end-to-end hash oracle
    (``__ray_entry__.oracle_sql()["curated_corpus"]``).
    """
    from ..functions import (
        decontaminate,
        per_source_cap,
        pii_redact,
        repetition_stats,
    )

    def redact_and_filter(batch: pa.Table) -> pa.Table:
        red = pii_redact(batch)  # doc_id, text(redacted), had_pii
        red = red.append_column("source", batch.column("source"))
        rep = repetition_stats(red)
        n_tokens = rep.column("n_tokens").to_numpy(zero_copy_only=False)
        n_distinct = rep.column("n_distinct").to_numpy(zero_copy_only=False)
        keep = n_distinct * min_distinct_den >= n_tokens * min_distinct_num
        return red.select(["doc_id", "text", "source"]).filter(pa.array(keep))

    curated = docs_ds.map_batches(redact_and_filter, batch_format="pyarrow")
    flagged = decontaminate(curated, eval_snippets)
    clean = flagged.map_batches(
        lambda b: b.filter(pc.invert(b.column("contaminated"))),
        batch_format="pyarrow",
    )
    return per_source_cap(clean, cap=cap)


def build_zscore_tfidf_pipeline(docs_ds, z_lo: float = -1.0,
                                z_hi: float = 2.0, k: int = 1):
    """Composed chain #3: per-language length z-score gate → TF-IDF top
    term over the SURVIVING corpus (survivor-count N, survivor-only DF).

    Every stage is a round-3 operator (`standardize.zscore_by`,
    `ngrams.tfidf_top_terms`), and the whole chain is checked against a
    single SQL statement (`__ray_entry__.py: zscore_tfidf_chain`) — an
    end-to-end hash gate like `training_sample` / `curated_corpus`.
    The z filter operates on the ROUNDED z (round-to-6), so the gate
    boundary is identical on both sides.
    """
    import pyarrow.compute as pc

    from ..functions.ngrams import tfidf_top_terms
    from ..functions.standardize import zscore_by

    scored = zscore_by(docs_ds, key_col="lang", value_col="n_chars")

    def gate(batch: pa.Table) -> pa.Table:
        z = batch.column("z")
        keep = pc.and_(
            pc.and_(pc.is_valid(z), pc.greater_equal(z, z_lo)),
            pc.less_equal(z, z_hi),
        )
        return batch.filter(keep).select(["doc_id", "text"])

    survivors = scored.map_batches(gate, batch_format="pyarrow")
    return tfidf_top_terms(survivors, k=k)
