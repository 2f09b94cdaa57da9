"""sentence_stats kernel vs a naive per-doc reference."""

import re

import pyarrow as pa


def test_sentence_stats_matches_naive():
    from smartreader_ray.functions.textstats import sentence_stats

    texts = [
        "a b. c d e! f",
        "",
        "   ",
        "one two three",
        "x? y!! z... ",
        "!!!",
        "a.b.c",          # boundaries without spaces
    ]
    b = pa.table({"doc_id": pa.array(range(len(texts)), type=pa.int64()),
                  "text": texts})
    got = {r["doc_id"]: r for r in sentence_stats(b).to_pylist()}
    for did, t in enumerate(texts):
        pieces = [p.strip() for p in re.split(r"[.!?]+", t)]
        toks = [len(re.findall(r"\S+", p)) for p in pieces if p]
        r = got[did]
        assert r["n_sentences"] == len(toks)
        assert r["total_sent_tokens"] == sum(toks)
        assert r["max_sentence_tokens"] == (max(toks) if toks else 0)
        exp_mean = (sum(toks) / len(toks)) if toks else 0.0
        assert r["mean_sentence_tokens"] == exp_mean


def test_compression_stats_invariants(ray_session):
    """Repetitive text compresses below prose, prose below noise;
    output equals a driver-side zlib on the same bytes; partitioning-
    invariant."""
    import zlib

    import numpy as np
    import pyarrow as pa
    import ray.data

    from smartreader_ray.functions.textstats import compression_stats

    rng = np.random.default_rng(2)
    noise = "".join(chr(33 + int(c)) for c in rng.integers(0, 90, 4000))
    docs = {
        0: "spam " * 800,
        1: ("the quick brown fox jumps over the lazy dog and then "
            "wanders home across the quiet evening fields ") * 40,
        2: noise,
        3: "",
    }
    t = pa.table({"doc_id": pa.array(list(docs), type=pa.int64()),
                  "text": pa.array(list(docs.values()))})
    for parts in (1, 3):
        rows = {r["doc_id"]: r for r in ray.data.from_arrow(t)
                .repartition(parts)
                .map_batches(compression_stats, batch_format="pyarrow")
                .take_all()}
        for did, text in docs.items():
            raw = text.encode()
            assert rows[did]["n_bytes"] == len(raw)
            assert rows[did]["n_zlib_bytes"] == len(zlib.compress(raw, 6))
        r = {d: rows[d]["n_zlib_bytes"] / max(1, rows[d]["n_bytes"])
             for d in (0, 1, 2)}
        assert r[0] < r[1] < r[2]  # spam << prose << noise


def test_readability_stats_kernel(ray_session):
    """Sentence segmentation handles terminal punctuation without an
    empty trailing sentence; counts and the FK formula match a naive
    computation."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from smartreader_ray.functions.textstats import readability_stats

    docs = {
        0: "the cat sat. the dog ran! was it fun?",   # closed tail
        1: "plain words with no punctuation at all",   # 1 sentence
        2: "one. two. three",                          # open tail
        3: "a",                                        # minimal
    }
    t = pa.table({"doc_id": pa.array(list(docs), type=pa.int64()),
                  "text": pa.array(list(docs.values()))})
    rows = {r["doc_id"]: r for r in ray.data.from_arrow(t)
            .map_batches(readability_stats, batch_format="pyarrow")
            .take_all()}
    import re
    for did, text in docs.items():
        w = len(text.split())
        segs = [x for x in re.split(r"[.!?]+", text) if x.strip()]
        s = max(1, len(segs))
        v = len(re.findall(r"[aeiouAEIOU]+", text))
        r = rows[did]
        assert (r["n_words"], r["n_sentences"], r["n_vowel_groups"]) \
            == (w, s, v), (did, r)
        want = 0.39 * (float(w) / s) + 11.8 * (float(v) / w) - 15.59
        assert r["fk_grade"] == want


def test_char_entropy_extremes(ray_session):
    import math

    import ray.data

    from smartreader_ray.functions import char_entropy

    docs = [
        {"doc_id": 1, "text": "aaaaaaaa"},        # zero entropy
        {"doc_id": 2, "text": "abcdefgh"},        # maximal: ln(8)
        {"doc_id": 3, "text": ""},                # empty
        {"doc_id": 4, "text": "aabb"},            # ln(2)
    ]
    out = {r["doc_id"]: r
           for r in ray.data.from_items(docs)
           .map_batches(char_entropy, batch_format="pyarrow")
           .take_all()}
    assert out[1]["entropy_nano"] == 0 and out[1]["n_distinct"] == 1
    # uniform over 8 chars: each term floor(1e9 * (1/8) * ln 8)
    import numpy as np
    term = int(np.floor(1e9 * ((np.float64(1.0) / 8.0)
                               * np.log(np.float64(8.0) / 1.0))))
    assert out[2]["entropy_nano"] == 8 * term
    assert out[3] == {"doc_id": 3, "n_chars": 0, "n_distinct": 0,
                      "entropy_nano": 0}
    assert abs(out[4]["entropy_nano"] / 1e9 - math.log(2)) < 1e-8
