"""Corpus-level operators: dedup, similarity search, text analysis.

These are the wide/stateful operations the extraction reference doesn't
have (SURVEY §2.7) but a 100 TB training-data pipeline needs. Design
rules: pre-aggregate inside map_batches before any groupby; broadcast
small sides with ray.put; vectorize with numpy/pyarrow.compute.
"""

from .lm import (ccnet_head_middle_tail, lm_score, source_crossent,
                 train_bigram_lm)
from .dedup import (
    connected_components,
    label_propagation_components,
    duplicate_passages,
    longest_common_runs,
    passage_clusters,
    exact_dedup,
    fingerprint_dedup,
    minhash_dedup,
    minhash_lsh_candidates,
    ngram_jaccard,
    ngram_novelty,
    ngram_jaccard_pairs,
    passage_star_edges,
    simhash_batch,
    simhash_neardup,
    template_score,
    verify_candidate_pairs,
    verify_candidate_pairs_distributed,
)
from .curation import (
    chunk_documents,
    decontaminate,
    normalize_text_batch,
    normalized_dedup,
    pack_sequences,
    per_source_cap,
    pii_redact,
    repetition_stats,
    token_dropout,
    winsorize_stats,
)
from .winnow import containment_pairs, winnow_dedup, winnow_fingerprints
from .join import asof_join, broadcast_join, hash_join, range_join, semi_join
from .similarity import (
    ann_ivf,
    ann_ivf_bucketed,
    ann_topk,
    bitext_mine,
    embedding_neardup,
    hard_negatives,
    ivf_build_index,
    kmeans_centroids,
)
from .sampling import (balanced_interleave, dsir_select, epoch_shuffle,
                       temperature_mix, mix_threshold_hex,
                       stratified_sample, weighted_mix)
from .sketch import (
    approx_distinct,
    approx_distinct_by,
    approx_quantile_by,
    exact_distinct_by,
    exact_quantile_by,
)
from .reshape import pivot_counts
from .topk import top_k, top_k_by
from .windows import sessionize, sliding_window, tumbling_window
from .textstats import (
    bpe_token_stats,
    doc_fingerprint,
    gopher_rules,
    language_id,
    quality_stats,
    token_stats,
)
from .ngrams import (bigram_counts, bm25_search, cooccurrence_window,
                     freq_spectrum, term_doc_freq, tfidf_top_terms,
                     vocab_growth, zipf_fit)
from .setops import except_by_content, intersect_by_content
from .sketch import frequent_terms
from .similarity import kmeans_fit
from .bpe import bpe_pair_counts, bpe_train, word_histogram
from .graph import (basket_pairs, consecutive_edges, hits, pagerank,
                    triangle_count)
from .standardize import corr_by, linreg_by, mad_outliers, zscore_by
from .windows import cumulative_by, funnel, late_events
from .reshape import (fixed_width_histogram, json_field_agg, latest_by,
                      mode_by, profile_table,
                      range_partition_by_quantiles, rollup_agg,
                      sort_bounds, unpivot)
from .robots import parse_robots_txt, robots_gate
from .windows import (interval_window_overlap, resample_daily,
                      retention_cohorts, user_day_paths)
from .setops import table_diff
from .topk import skyline
from .fuzzy import edit1_pairs, is_edit1
from .ngrams import phrase_count

__all__ = [
    "exact_dedup",
    "duplicate_passages",
    "longest_common_runs",
    "lm_score",
    "train_bigram_lm",
    "ccnet_head_middle_tail",
    "zipf_fit",
    "hard_negatives",
    "source_crossent",
    "connected_components",
    "label_propagation_components",
    "passage_clusters",
    "passage_star_edges",
    "decontaminate",
    "chunk_documents",
    "pack_sequences",
    "per_source_cap",
    "pii_redact",
    "normalize_text_batch",
    "normalized_dedup",
    "funnel",
    "cumulative_by",
    "fixed_width_histogram",
    "json_field_agg",
    "mode_by",
    "rollup_agg",
    "retention_cohorts",
    "resample_daily",
    "mad_outliers",
    "profile_table",
    "sort_bounds",
    "latest_by",
    "unpivot",
    "user_day_paths",
    "interval_window_overlap",
    "table_diff",
    "skyline",
    "edit1_pairs",
    "is_edit1",
    "phrase_count",
    "winsorize_stats",
    "token_dropout",
    "winnow_fingerprints",
    "winnow_dedup",
    "containment_pairs",
    "freq_spectrum",
    "vocab_growth",
    "parse_robots_txt",
    "robots_gate",
    "bpe_pair_counts",
    "bpe_train",
    "word_histogram",
    "repetition_stats",
    "hash_join",
    "semi_join",
    "stratified_sample",
    "temperature_mix",
    "weighted_mix",
    "mix_threshold_hex",
    "approx_distinct",
    "approx_distinct_by",
    "approx_quantile_by",
    "exact_quantile_by",
    "asof_join",
    "range_join",
    "pivot_counts",
    "ngram_jaccard_pairs",
    "exact_distinct_by",
    "sliding_window",
    "bpe_token_stats",
    "fingerprint_dedup",
    "sessionize",
    "tumbling_window",
    "ann_ivf_bucketed",
    "ivf_build_index",
    "verify_candidate_pairs_distributed",
    "minhash_lsh_candidates",
    "ngram_jaccard",
    "simhash_batch",
    "simhash_neardup",
    "ann_ivf",
    "ann_topk",
    "embedding_neardup",
    "kmeans_centroids",
    "minhash_dedup",
    "verify_candidate_pairs",
    "broadcast_join",
    "top_k",
    "top_k_by",
    "doc_fingerprint",
    "language_id",
    "quality_stats",
    "token_stats",
    "term_doc_freq",
    "bigram_counts",
    "tfidf_top_terms",
    "except_by_content",
    "intersect_by_content",
    "frequent_terms",
    "kmeans_fit",
    "zscore_by",
    "corr_by",
    "linreg_by",
    "consecutive_edges",
    "pagerank",
    "hits",
    "basket_pairs",
    "triangle_count",
    "cooccurrence_window",
    "late_events",
    "range_partition_by_quantiles",
    "gopher_rules",
    "dsir_select",
    "epoch_shuffle",
    "ngram_novelty",
    "template_score",
    "bitext_mine",
    "balanced_interleave",
    "bm25_search",
]
