"""BPE training: histogram sufficiency, determinism, SQL companion."""

import random
from collections import Counter

import pyarrow as pa

from smartreader_ray.functions.bpe import (END, bpe_pair_counts, bpe_train,
                                           bpe_train_from_histogram,
                                           word_histogram)


def _naive_bpe(texts, num_merges):
    """Independent reference: trains on the FULL token-occurrence list
    (no histogram shortcut) — proves the histogram is sufficient."""
    seqs = [list(w) + [END] for t in texts for w in t.split() if w]
    merges = []
    for rank in range(num_merges):
        counts = Counter()
        for sym in seqs:
            for i in range(len(sym) - 1):
                counts[(sym[i], sym[i + 1])] += 1
        if not counts:
            break
        (left, right), n = min(counts.items(),
                               key=lambda kv: (-kv[1], kv[0]))
        if n < 2:
            break
        merges.append((rank, left, right, n))
        joined = left + right
        out_seqs = []
        for sym in seqs:
            i, out = 0, []
            while i < len(sym):
                if (i + 1 < len(sym) and sym[i] == left
                        and sym[i + 1] == right):
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            out_seqs.append(out)
        seqs = out_seqs
    return merges


def test_bpe_paper_example():
    # Sennrich et al. toy vocabulary: first merge is the most frequent
    # weighted pair with deterministic tie-break
    hist = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = bpe_train_from_histogram(hist, 4)
    assert merges[0][1:] == ("e", "s", 9)       # es in newest+widest
    assert merges[1][1:] == ("es", "t", 9)
    assert merges[2][1:] == ("est", END, 9)
    assert merges[3][1:] == ("l", "o", 7)       # low + lower


def test_histogram_path_equals_naive_occurrence_path():
    rng = random.Random(5)
    vocab = ["aa", "ab", "abab", "ba", "bab", "c", "cc", "abc"]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randrange(1, 15)))
             for _ in range(80)]
    hist = Counter(w for t in texts for w in t.split() if w)
    got = bpe_train_from_histogram(dict(hist), 10)
    want = _naive_bpe(texts, 10)
    assert got == want


def test_bpe_train_dataset_matches_driver_loop(ray_session):
    import ray.data

    texts = ["the cat sat", "the bat", "a cat", "", "the the the"]
    t = pa.table({"text": texts})
    out = pa.concat_tables(
        list(
            bpe_train(ray.data.from_arrow(t).repartition(3),
                      num_merges=6)
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    got = list(zip(out.column("rank").to_pylist(),
                   out.column("left").to_pylist(),
                   out.column("right").to_pylist(),
                   out.column("pair_count").to_pylist()))
    hist = Counter(w for s in texts for w in s.split() if w)
    assert got == bpe_train_from_histogram(dict(hist), 6)


def test_word_histogram_drops_empty_and_counts(ray_session):
    import ray.data

    t = pa.table({"text": ["a  a b", " ", None, "b"]})
    out = pa.concat_tables(
        list(word_histogram(ray.data.from_arrow(t))
             .iter_batches(batch_format="pyarrow", batch_size=None))
    )
    got = dict(zip(out.column("word").to_pylist(),
                   out.column("c").to_pylist()))
    assert got == {"a": 2, "b": 2}


def test_bpe_pair_counts_differential_duckdb(ray_session):
    import duckdb
    import ray.data

    rng = random.Random(9)
    vocab = ["alpha", "beta", "gamma", "aa", "ab"]
    texts = [" ".join(rng.choice(vocab)
                      for _ in range(rng.randrange(0, 10)))
             for _ in range(50)]
    t = pa.table({"text": texts})
    got = pa.concat_tables(
        list(
            bpe_pair_counts(ray.data.from_arrow(t).repartition(4),
                            top_k=12)
            .iter_batches(batch_format="pyarrow", batch_size=None)
        )
    )
    con = duckdb.connect()
    con.register("documents", t)
    want = con.execute("""
        WITH toks AS (
            SELECT a[i] AS w
            FROM (SELECT string_split(trim(text), ' ') AS a
                  FROM documents),
                 UNNEST(generate_series(1, len(a))) AS t(i)
        ), words AS (
            SELECT w, CAST(count(*) AS BIGINT) AS c FROM toks
            WHERE length(w) > 0 GROUP BY w
        ), pairs AS (
            SELECT substring(w, i, 1) AS l, substring(w, i + 1, 1) AS r, c
            FROM words, UNNEST(generate_series(1, length(w) - 1)) AS t(i)
        )
        SELECT l, r, CAST(SUM(c) AS BIGINT) AS n FROM pairs
        GROUP BY l, r ORDER BY n DESC, l, r LIMIT 12
    """).arrow()
    for col in ("l", "r", "n"):
        assert got.column(col).to_pylist() == \
            want.column(col).to_pylist(), col
