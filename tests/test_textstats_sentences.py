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
