"""Gopher rule-cascade gate and DSIR importance selection."""

import math

import numpy as np
import pyarrow as pa

from smartreader_ray.functions.textstats import _GOPHER_RULES, gopher_rules


def test_gopher_rule_order_and_verdicts():
    t = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5, 6], type=pa.int64()),
        "text": [
            # passes every rule (60 words, the/a stopwords, 10% top word)
            "the a quick brown fox jumps over lazy dog now " * 6,
            # mean word length 2 < 3
            "aa " * 100,
            # >20% single word, stopwords present
            "the and of " + "wordsalad " * 60,
            # empty doc: one zero-length token -> word_count fires first
            "",
            # 100 words but 0 distinct stopwords
            " ".join(f"tok{i % 37}" for i in range(100)),
            # numeric words: alpha ratio 0 -> alpha_words (len 3 passes rule 2)
            "123 456 789 " * 20,
        ],
    })
    out = gopher_rules(t, min_words=10)
    assert out.column("verdict").to_pylist() == [
        "pass", "mean_word_length", "repetition", "word_count",
        "stopwords", "alpha_words",
    ]
    assert out.column("n_words").to_pylist()[0] == 60


def test_gopher_first_failure_wins():
    # fails word_count AND stopwords: word_count is first in _GOPHER_RULES
    t = pa.table({
        "doc_id": pa.array([1], type=pa.int64()),
        "text": ["zz yy xx"],
    })
    out = gopher_rules(t, min_words=50)
    assert out.column("verdict").to_pylist() == ["word_count"]
    assert _GOPHER_RULES[0] == "word_count"


def _brute_dsir_scores(rows, target_lang, B):
    import hashlib

    def buckets(text):
        toks = text.strip().split(" ")
        return [int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % B
                for t in toks]

    c_raw = np.zeros(B, np.int64)
    c_tgt = np.zeros(B, np.int64)
    for r in rows:
        for b in buckets(r["text"]):
            c_raw[b] += 1
            if r["lang"] == target_lang:
                c_tgt[b] += 1
    n_raw, n_tgt = int(c_raw.sum()), int(c_tgt.sum())
    w = [math.floor(1_000_000.0 * math.log(
        float(ct + 1) * float(n_raw + B)
        / (float(cr + 1) * float(n_tgt + B))))
        for ct, cr in zip(c_tgt.tolist(), c_raw.tolist())]
    return {r["doc_id"]: sum(w[b] for b in buckets(r["text"]))
            for r in rows}


def test_dsir_select_matches_brute_force(ray_session):
    import ray.data

    rng = np.random.default_rng(7)
    vocab_en = ["the", "a", "of", "cat", "dog", "house"]
    vocab_de = ["der", "die", "und", "katze", "hund", "haus"]
    rows = []
    for i in range(60):
        lang = "en" if i % 3 == 0 else "de"
        vocab = vocab_en if lang == "en" else vocab_de
        n = int(rng.integers(3, 12))
        rows.append({
            "doc_id": i, "lang": lang,
            "text": " ".join(rng.choice(vocab, n)),
        })
    expected = _brute_dsir_scores(rows, "en", 64)
    top = sorted(expected.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    from smartreader_ray.functions.sampling import dsir_select

    ds = ray.data.from_items(rows).repartition(5)
    got = dsir_select(ds, target_lang="en", n_buckets=64, k=10).take_all()
    assert [(r["doc_id"], r["score"]) for r in got] == top
    # english docs dominate the selection
    en_ids = {r["doc_id"] for r in rows if r["lang"] == "en"}
    assert sum(r["doc_id"] in en_ids for r in got) >= 8


def test_dsir_partitioning_invariance(ray_session):
    import ray.data

    rows = [{"doc_id": i, "lang": "en" if i % 2 else "fr",
             "text": f"alpha beta w{i % 5} gamma"} for i in range(40)]
    from smartreader_ray.functions.sampling import dsir_select

    outs = []
    for parts in (1, 3, 8):
        ds = ray.data.from_items(rows).repartition(parts)
        outs.append([(r["doc_id"], r["score"])
                     for r in dsir_select(ds, n_buckets=32, k=15).take_all()])
    assert outs[0] == outs[1] == outs[2]


def test_dsir_empty_target_slice(ray_session):
    import ray.data

    from smartreader_ray.functions.sampling import dsir_select

    # no doc matches the target language: weights become a uniform
    # penalty but scoring still runs and returns deterministic rows
    rows = [{"doc_id": i, "lang": "de", "text": f"w{i % 3} alpha"}
            for i in range(12)]
    out = dsir_select(ray.data.from_items(rows).repartition(3),
                      target_lang="en", n_buckets=16, k=5).take_all()
    assert len(out) == 5
    assert [r["doc_id"] for r in out] == sorted(
        r["doc_id"] for r in out)[:5] or len({r["score"] for r in out}) >= 1


def test_gopher_rules_empty_batch():
    import pyarrow as pa

    from smartreader_ray.functions.textstats import gopher_rules

    t = pa.table({"doc_id": pa.array([], type=pa.int64()),
                  "text": pa.array([], type=pa.string())})
    out = gopher_rules(t)
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "n_words", "verdict"]
