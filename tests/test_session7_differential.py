"""Differential tests: session-7 operators vs naive single-process
reference implementations on randomized (seeded) inputs — the same
pin-the-optimized-kernel-to-the-obvious-definition strategy the DOM
caches use (test_properties.py)."""

import math
import random

import pyarrow as pa


def _rand_docs(seed, n_docs=40, vocab=("aa", "bb", "cc", "dd", "ee"),
               max_lines=6, max_toks=5):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        lines = [" ".join(rng.choice(vocab)
                          for _ in range(rng.randint(1, max_toks)))
                 for _ in range(rng.randint(1, max_lines))]
        docs.append({"doc_id": i, "text": "\n".join(lines),
                     "lang": rng.choice(["en", "fr", "de"])})
    return docs


def test_line_dedup_matches_naive(ray_session):
    import ray.data

    from smartreader_ray.functions import line_dedup

    for seed in (1, 2, 3):
        docs = _rand_docs(seed)
        # naive: count every line corpus-wide, drop count >= 2
        from collections import Counter
        cnt = Counter(ln for d in docs for ln in d["text"].split("\n"))
        out = {r["doc_id"]: r
               for r in line_dedup(ray.data.from_items(docs),
                                   min_count=2).take_all()}
        for d in docs:
            lines = d["text"].split("\n")
            kept = [ln for ln in lines if cnt[ln] < 2]
            r = out[d["doc_id"]]
            assert r["n_lines"] == len(lines)
            assert r["n_removed"] == len(lines) - len(kept)
            assert r["clean_text"] == "\n".join(kept)


def test_chi2_terms_matches_naive(ray_session):
    import ray.data

    from smartreader_ray.functions import chi2_terms

    docs = _rand_docs(7)
    for d in docs:  # the tokenizer splits on single spaces only
        d["text"] = d["text"].replace("\n", " ")
    out = chi2_terms(ray.data.from_items(docs), label_col="lang",
                     top_k=100).take_all()
    # naive contingency recomputation (float tree need not match
    # bit-for-bit here; compare the integer counts and sign/ordering)
    n = len(docs)
    langs = sorted({d["lang"] for d in docs})
    doc_terms = {d["doc_id"]: set(d["text"].replace("\n", " ").split())
                 for d in docs}
    for r in out:
        a = sum(1 for d in docs
                if d["lang"] == r["label"]
                and r["term"] in doc_terms[d["doc_id"]])
        t = sum(1 for d in docs if r["term"] in doc_terms[d["doc_id"]])
        assert r["df_in"] == a
        assert r["df_out"] == t - a
        n_label = sum(1 for d in docs if d["lang"] == r["label"])
        if t == n or n_label == n:
            assert r["chi2"] == 0.0
        else:
            b, c = n_label - a, t - a
            dd = n - n_label - c
            num = n * (a * dd - b * c) ** 2
            den = (a + b) * (c + dd) * (a + c) * (b + dd)
            assert abs(r["chi2"] - num / den) < 1e-9 * max(1.0, num / den)
    assert {r["label"] for r in out} == set(langs)


def test_search_eval_matches_naive_bm25(ray_session):
    import ray.data

    from smartreader_ray.functions import search_eval

    docs = _rand_docs(11, max_lines=1, max_toks=12)
    for d in docs:
        d["text"] = d["text"].replace("\n", " ")
    queries = [("aa", "bb"), ("cc", "dd")]
    out = {r["query"]: r
           for r in search_eval(ray.data.from_items(docs), queries,
                                k=10).take_all()}

    toks = {d["doc_id"]: d["text"].split() for d in docs}
    n = float(len(docs))
    avg = sum(len(t) for t in toks.values()) / n
    for t1, t2 in queries:
        df = {w: sum(1 for t in toks.values() if w in t)
              for w in (t1, t2)}
        idf = {w: math.log(1.0 + (n - df[w] + 0.5) / (df[w] + 0.5))
               for w in (t1, t2)}

        def score(ts):
            s = 0.0
            for w in (t1, t2):
                tf = ts.count(w)
                s += idf[w] * ((tf * 2.2)
                               / (tf + 1.2 * (0.25 + 0.75
                                              * (len(ts) / avg))))
            return s

        cands = [(score(ts), i) for i, ts in toks.items()
                 if t1 in ts or t2 in ts]
        cands.sort(key=lambda x: (-x[0], x[1]))
        top = cands[:10]
        rel_ids = {i for i, ts in toks.items()
                   if any(x == t1 and y == t2
                          for x, y in zip(ts, ts[1:]))}
        ranks = [j + 1 for j, (_, i) in enumerate(top) if i in rel_ids]
        r = out[f"{t1} {t2}"]
        assert r["n_relevant"] == len(rel_ids)
        assert r["hits"] == len(ranks)
        assert r["first_rank"] == (ranks[0] if ranks else 0)
        assert r["dcg_q27720"] == sum(27720 // (i + 1) for i in ranks)


def test_kcore_matches_naive_peeling(ray_session):
    import ray.data

    from smartreader_ray.functions import kcore_rounds

    rng = random.Random(13)
    edges = {(rng.randint(0, 19), rng.randint(0, 19)) for _ in range(60)}
    edges = {(a, b) for a, b in edges if a != b}
    canon = {(min(a, b), max(a, b)) for a, b in edges}
    k, rounds = 3, 4

    cur = set(canon)
    for _ in range(rounds):
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        alive = {v for v, d in deg.items() if d >= k}
        cur = {(a, b) for a, b in cur if a in alive and b in alive}
    deg = {}
    for a, b in cur:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1

    ds = ray.data.from_items(
        [{"src": a, "dst": b} for a, b in sorted(edges)])
    out = {r["v"]: r["deg"]
           for r in kcore_rounds(ds, k=k, rounds=rounds).take_all()}
    assert out == deg


def test_log_odds_terms_matches_naive(ray_session):
    import ray.data

    from smartreader_ray.functions import log_odds_terms

    docs = _rand_docs(17)
    for d in docs:  # the tokenizer splits on single spaces only
        d["text"] = d["text"].replace("\n", " ")
    out = log_odds_terms(ray.data.from_items(docs), label_col="lang",
                         target_label="en", top_k=100).take_all()
    cf1, cf2 = {}, {}
    for d in docs:
        for w in d["text"].replace("\n", " ").split():
            (cf1 if d["lang"] == "en" else cf2)[w] = \
                (cf1 if d["lang"] == "en" else cf2).get(w, 0) + 1
    vocab = set(cf1) | set(cf2)
    n1, n2, v = sum(cf1.values()), sum(cf2.values()), len(vocab)
    for r in out:
        c1, c2 = cf1.get(r["term"], 0), cf2.get(r["term"], 0)
        assert r["cf_target"] == c1 and r["cf_rest"] == c2
        d1 = math.log((c1 + 0.5) / (n1 + 0.5 * v - c1 - 0.5))
        d2 = math.log((c2 + 0.5) / (n2 + 0.5 * v - c2 - 0.5))
        z = (d1 - d2) / math.sqrt(1.0 / (c1 + 0.5) + 1.0 / (c2 + 0.5))
        assert abs(r["z"] - z) < 1e-12
