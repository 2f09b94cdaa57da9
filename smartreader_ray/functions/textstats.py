"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting. All vectorized per batch; language ID holds its
profile tables as warm actor state.
"""

from __future__ import annotations

import re
import unicodedata

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_WS_RE = re.compile(r"\s+")

#: minimal stopword profiles for the n-gram/stopword language heuristic
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "with", "was", "on"},
    "de": {"der", "die", "und", "das", "ist", "nicht", "ein", "mit", "auf", "für", "von", "zu"},
    "fr": {"le", "la", "les", "et", "des", "est", "un", "une", "dans", "que", "pour", "qui"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "en", "que", "por", "para"},
    "it": {"il", "la", "che", "di", "e", "un", "una", "per", "con", "del", "non", "sono"},
    "pt": {"o", "a", "os", "as", "e", "um", "uma", "que", "de", "para", "com", "não"},
    "nl": {"de", "het", "een", "en", "van", "is", "dat", "op", "te", "met", "voor", "niet"},
}


def token_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """doc_id + n_tokens (whitespace) + n_chars_nospace + avg_token_len."""
    text = batch.column(text_col)
    trimmed = pc.utf8_trim_whitespace(text)
    tokens = pc.split_pattern_regex(trimmed, r"\s+")
    n_tokens = pc.list_value_length(tokens)
    no_space = pc.replace_substring_regex(text, r"\s", "")
    n_chars = pc.utf8_length(no_space)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_chars_nospace": pc.cast(n_chars, pa.int64()),
        }
    )


def quality_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality-scoring signals: lengths, punctuation ratio, mean word
    length, digit ratio, stopword ratio (en)."""
    rows = batch.column(text_col).to_pylist()
    n_chars, n_tokens, punct_ratio, digit_ratio, mean_wl, stop_ratio = (
        [], [], [], [], [], []
    )
    en_stop = _STOPWORDS["en"]
    for text in rows:
        t = text or ""
        toks = t.split()
        n = len(t)
        n_chars.append(n)
        n_tokens.append(len(toks))
        if n:
            punct = sum(1 for c in t if unicodedata.category(c).startswith("P"))
            digit = sum(1 for c in t if c.isdigit())
            punct_ratio.append(punct / n)
            digit_ratio.append(digit / n)
        else:
            punct_ratio.append(0.0)
            digit_ratio.append(0.0)
        if toks:
            mean_wl.append(sum(len(w) for w in toks) / len(toks))
            stop_ratio.append(sum(1 for w in toks if w.lower() in en_stop) / len(toks))
        else:
            mean_wl.append(0.0)
            stop_ratio.append(0.0)
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars, type=pa.int64()),
            "n_tokens": pa.array(n_tokens, type=pa.int64()),
            "punct_ratio": pa.array(punct_ratio, type=pa.float64()),
            "digit_ratio": pa.array(digit_ratio, type=pa.float64()),
            "mean_token_len": pa.array(mean_wl, type=pa.float64()),
            "stopword_ratio_en": pa.array(stop_ratio, type=pa.float64()),
        }
    )


class LanguageId:
    """Warm actor: stopword profiles built once; per-batch scoring.

    Heuristic analogue of the reference's optional FastText stage
    (``SmartReader.NaturalLanguageProcessing/NLP.cs:16-32``) — same
    pipeline position (separate actor-pool map_batches), stdlib model.
    """

    def __init__(self):
        self.profiles = {lang: frozenset(ws) for lang, ws in _STOPWORDS.items()}

    def predict(self, text: str) -> tuple[str, float]:
        toks = [w.lower() for w in (text or "").split()[:400]]
        if not toks:
            return "und", 0.0
        best_lang, best_score = "und", 0.0
        for lang, stops in self.profiles.items():
            score = sum(1 for w in toks if w in stops) / len(toks)
            if score > best_score:
                best_lang, best_score = lang, score
        return (best_lang if best_score > 0.02 else "und"), best_score

    def __call__(self, batch: pa.Table) -> pa.Table:
        preds, scores = [], []
        for text in batch.column("text").to_pylist():
            lang, score = self.predict(text)
            preds.append(lang)
            scores.append(round(score, 6))
        return pa.Table.from_pydict(
            {
                "doc_id": batch.column("doc_id"),
                "pred_lang": pa.array(preds, type=pa.string()),
                "lang_score": pa.array(scores, type=pa.float64()),
            }
        )


def language_id(ds):
    return ds.select_columns(["doc_id", "text"]).map_batches(
        LanguageId, batch_format="pyarrow", concurrency=(1, 8)
    )


def doc_fingerprint(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling (polynomial) hash over the normalized text — a
    stable content fingerprint for exact-dup detection and lineage."""
    fps = []
    for text in batch.column(text_col).to_pylist():
        norm = _WS_RE.sub(" ", (text or "").strip().lower())
        h = np.uint64(1469598103934665603)
        prime = np.uint64(1099511628211)
        for b in norm.encode():
            h = np.uint64((int(h) ^ b) * int(prime) & 0xFFFFFFFFFFFFFFFF)
        fps.append(int(h))
    return pa.Table.from_pydict(
        {
            "doc_id": batch.column("doc_id"),
            "fingerprint": pa.array(np.array(fps, dtype=np.uint64), type=pa.uint64()),
        }
    )
