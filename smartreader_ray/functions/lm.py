"""CCNet-style model-based quality scoring: n-gram LM perplexity.

CCNet (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data") ranks web documents by the perplexity of
a language model trained on held-in high-quality text — low perplexity
≈ fluent, in-distribution prose; high ≈ boilerplate/gibberish. The
reference engine delegates NLP scoring to a pluggable model
(SmartReader.NaturalLanguageProcessing/NLP.cs); no model binaries exist
in this container, so the model here is a from-scratch token-bigram LM
with add-one smoothing — small enough to train distributed in one
groupby and broadcast whole, real enough to rank documents.

Ray shape (the two-phase broadcast pattern):

1. **Train** (`train_bigram_lm`): per-block Arrow ``group_by`` partial
   bigram counts over the held-in slice → one vocab²-bounded groupby →
   driver collects the (bounded, asserted) count table, derives prefix
   counts by summation, and ``ray.put``s the model once.
2. **Score** (`lm_score`): shuffle-free ``map_batches`` — each worker
   resolves the model ref once and scores transitions vectorized.

Oracle strategy (the repo's degeneration pattern): the float perplexity
is order-sensitive to sum per doc, so the HASH GATE compares the exact
integer sufficient statistics instead — per doc ``n_trans``,
``sum_bigram_c`` (Σ c₂(w_{i−1},w_i)), ``sum_prefix_c`` (Σ c₁(w_{i−1})),
``n_oov`` — all replayable in SQL from the same held-in slice. The
perplexity itself is a pure closed-form function of per-transition
counts (p = (c₂+1)/(c₁+V)) and is differential-tested against a scalar
reference; given equal integer counts, both engines evaluate the same
expression tree.

Tokenizer is single-space split of the trimmed text — exactly DuckDB's
``string_split(trim(text), ' ')``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _tokens(t: str | None) -> list[str]:
    return (t or "").strip().split(" ")


def train_bigram_lm(ds, text_col: str = "text",
                    max_vocab_entries: int = 5_000_000) -> dict:
    """Train the bigram LM over ``ds`` (the HELD-IN slice — pass a
    filtered Dataset; the caller owns what counts as held-in).

    Returns the model dict: ``{"c2": {(w1, w2): n}, "c1": {w1: n},
    "V": vocab_size}`` where ``c1`` counts transition PREFIXES (so
    ``c1[w] = Σ_w2 c2[w, w2]``, derived driver-side — no second
    exchange) and ``V`` = number of distinct prefix tokens + 1 (the
    add-one smoothing denominator's unseen-event slot).

    The collected count table is vocab²-bounded, NOT corpus-bounded;
    ``max_vocab_entries`` asserts that loudly. At 100 TB with an open
    vocabulary, shard the model by prefix hash instead (the
    ``state/dedup_index`` actor pattern) — this trainer names that path
    rather than silently collecting an unbounded table.
    """
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        w1s, w2s = [], []
        for t in batch.column(text_col).to_pylist():
            toks = _tokens(t)
            if len(toks) < 2:
                continue
            w1s.extend(toks[:-1])
            w2s.extend(toks[1:])
        t = pa.table({"w1": pa.array(w1s, type=pa.string()),
                      "w2": pa.array(w2s, type=pa.string())})
        g = t.group_by(["w1", "w2"]).aggregate([([], "count_all")])
        return pa.Table.from_pydict(
            {"w1": g.column("w1"), "w2": g.column("w2"),
             "n": g.column("count_all")}
        )

    totals = (
        ds.select_columns([text_col])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
    )
    c2: dict = {}
    for b in totals.iter_batches(batch_format="pyarrow", batch_size=None):
        for w1, w2, n in zip(b.column("w1").to_pylist(),
                             b.column("w2").to_pylist(),
                             b.column("n").to_pylist()):
            c2[(w1, w2)] = int(n)
            if len(c2) > max_vocab_entries:
                raise ValueError(
                    f"bigram vocabulary exceeds {max_vocab_entries} "
                    "entries; shard the LM by prefix hash (actor pool) "
                    "instead of broadcasting it"
                )
    c1: dict = {}
    for (w1, _), n in c2.items():
        c1[w1] = c1.get(w1, 0) + n
    return {"c2": c2, "c1": c1, "V": len(c1) + 1}


class _LMScorer:
    """Actor-pool stage: resolve the broadcast model once per worker,
    score each doc's transitions. Emits the exact integer sufficient
    statistics (the hash-gated columns) plus the float ``log2_ppl``
    (order-deterministic per doc: sequential sum in token order)."""

    def __init__(self, model_ref):
        import ray

        m = ray.get(model_ref)
        self.c2 = m["c2"]
        self.c1 = m["c1"]
        self.V = m["V"]

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids, n_tr, s_big, s_pfx, n_oov, ppl = [], [], [], [], [], []
        doc_ids = batch.column("doc_id").to_pylist()
        for doc_id, t in zip(doc_ids, batch.column("text").to_pylist()):
            toks = _tokens(t)
            if len(toks) < 2:
                continue  # no transitions — mirrors the SQL inner join
            cc2 = np.fromiter(
                (self.c2.get((a, b), 0)
                 for a, b in zip(toks[:-1], toks[1:])),
                dtype=np.int64, count=len(toks) - 1,
            )
            cc1 = np.fromiter(
                (self.c1.get(a, 0) for a in toks[:-1]),
                dtype=np.int64, count=len(toks) - 1,
            )
            ids.append(doc_id)
            n_tr.append(len(cc2))
            s_big.append(int(cc2.sum()))
            s_pfx.append(int(cc1.sum()))
            n_oov.append(int((cc2 == 0).sum()))
            # add-one smoothed per-transition probability; numpy's pairwise
            # sum over the fixed token order is deterministic per doc
            # (partitioning-invariant), though not bit-equal to a naive
            # left-to-right sum — hence ints in the hash gate, not this
            logp = np.log2((cc2 + 1).astype(np.float64)
                           / (cc1 + self.V).astype(np.float64))
            ppl.append(round(float(-logp.sum() / len(logp)), 6))
        id_type = batch.schema.field("doc_id").type
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=id_type),
                "n_trans": pa.array(n_tr, type=pa.int64()),
                "sum_bigram_c": pa.array(s_big, type=pa.int64()),
                "sum_prefix_c": pa.array(s_pfx, type=pa.int64()),
                "n_oov": pa.array(n_oov, type=pa.int64()),
                "log2_ppl": pa.array(ppl, type=pa.float64()),
            }
        )


def lm_score(ds, model: dict, text_col: str = "text",
             concurrency=(1, 4), batch_size: int = 64):
    """Score every doc in ``ds`` against a trained bigram LM (see
    module docstring). Returns (doc_id, n_trans, sum_bigram_c,
    sum_prefix_c, n_oov, log2_ppl); docs with < 2 tokens are omitted."""
    import ray

    model_ref = ray.put(model)
    return ds.select_columns(["doc_id", text_col]).map_batches(
        _LMScorer,
        fn_constructor_args=(model_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def train_bigram_lm_by(ds, key_col: str = "lang", text_col: str = "text",
                       max_vocab_entries: int = 5_000_000) -> dict:
    """Per-key (per-LANGUAGE — the actual CCNet shape: one KenLM per
    language) bigram LM training: one distributed count pass keyed by
    (key, w1, w2), then per-key models built driver-side behind the same
    vocab bound as :func:`train_bigram_lm`.

    Returns ``{key: model}`` where each model has the
    :func:`train_bigram_lm` shape. A key absent from ``ds`` simply has
    no entry; scorers must define the empty-model convention (see
    :func:`lm_score_by`: V=1, every transition OOV)."""
    from ray.data.aggregate import Sum

    def partial_counts(batch: pa.Table) -> pa.Table:
        ks, w1s, w2s = [], [], []
        for k, t in zip(batch.column(key_col).to_pylist(),
                        batch.column(text_col).to_pylist()):
            toks = _tokens(t)
            if len(toks) < 2:
                continue
            ks.extend([k] * (len(toks) - 1))
            w1s.extend(toks[:-1])
            w2s.extend(toks[1:])
        t = pa.table({"k": pa.array(ks, type=pa.string()),
                      "w1": pa.array(w1s, type=pa.string()),
                      "w2": pa.array(w2s, type=pa.string())})
        g = t.group_by(["k", "w1", "w2"]).aggregate([([], "count_all")])
        return pa.Table.from_pydict(
            {"k": g.column("k"), "w1": g.column("w1"),
             "w2": g.column("w2"), "n": g.column("count_all")}
        )

    totals = (
        ds.select_columns([key_col, text_col])
        .map_batches(partial_counts, batch_format="pyarrow")
        .groupby(["k", "w1", "w2"])
        .aggregate(Sum("n", alias_name="n"))
    )
    c2_by: dict = {}
    n_entries = 0
    for b in totals.iter_batches(batch_format="pyarrow", batch_size=None):
        for k, w1, w2, n in zip(b.column("k").to_pylist(),
                                b.column("w1").to_pylist(),
                                b.column("w2").to_pylist(),
                                b.column("n").to_pylist()):
            c2_by.setdefault(k, {})[(w1, w2)] = int(n)
            n_entries += 1
            if n_entries > max_vocab_entries:
                raise ValueError(
                    f"per-key bigram vocabulary exceeds {max_vocab_entries} "
                    "entries; shard the LM by (key, prefix) hash instead"
                )
    models: dict = {}
    for k, c2 in c2_by.items():
        c1: dict = {}
        for (w1, _), n in c2.items():
            c1[w1] = c1.get(w1, 0) + n
        models[k] = {"c2": c2, "c1": c1, "V": len(c1) + 1}
    return models


class _LMScorerBy:
    """Per-key scorer: resolves the broadcast {key: model} map once per
    worker; a row whose key has no model scores against the empty model
    (V=1, every transition OOV) — the same convention the SQL oracle
    replays with COALESCEs."""

    def __init__(self, models_ref):
        import ray

        self.models = ray.get(models_ref)

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = {"c2": {}, "c1": {}, "V": 1}
        ids, ks, n_tr, s_big, s_pfx, n_oov, ppl = [], [], [], [], [], [], []
        for doc_id, k, t in zip(batch.column("doc_id").to_pylist(),
                                batch.column(batch.column_names[1]).to_pylist(),
                                batch.column("text").to_pylist()):
            toks = _tokens(t)
            if len(toks) < 2:
                continue
            m = self.models.get(k, empty)
            c2, c1, V = m["c2"], m["c1"], m["V"]
            cc2 = np.fromiter(
                (c2.get((a, b), 0) for a, b in zip(toks[:-1], toks[1:])),
                dtype=np.int64, count=len(toks) - 1,
            )
            cc1 = np.fromiter(
                (c1.get(a, 0) for a in toks[:-1]),
                dtype=np.int64, count=len(toks) - 1,
            )
            ids.append(doc_id)
            ks.append(k)
            n_tr.append(len(cc2))
            s_big.append(int(cc2.sum()))
            s_pfx.append(int(cc1.sum()))
            n_oov.append(int((cc2 == 0).sum()))
            logp = np.log2((cc2 + 1).astype(np.float64)
                           / (cc1 + V).astype(np.float64))
            ppl.append(round(float(-logp.sum() / len(logp)), 6))
        id_type = batch.schema.field("doc_id").type
        key_name = batch.column_names[1]
        return pa.Table.from_pydict(
            {
                "doc_id": pa.array(ids, type=id_type),
                key_name: pa.array(ks, type=pa.string()),
                "n_trans": pa.array(n_tr, type=pa.int64()),
                "sum_bigram_c": pa.array(s_big, type=pa.int64()),
                "sum_prefix_c": pa.array(s_pfx, type=pa.int64()),
                "n_oov": pa.array(n_oov, type=pa.int64()),
                "log2_ppl": pa.array(ppl, type=pa.float64()),
            }
        )


def lm_score_by(ds, models: dict, key_col: str = "lang",
                text_col: str = "text", concurrency=(1, 4),
                batch_size: int = 64):
    """Score every doc against ITS key's model (see
    :func:`train_bigram_lm_by`). Output adds ``key_col``; docs with
    < 2 tokens are omitted."""
    import ray

    models_ref = ray.put(models)
    return ds.select_columns(["doc_id", key_col, text_col]).map_batches(
        _LMScorerBy,
        fn_constructor_args=(models_ref,),
        batch_format="pyarrow",
        concurrency=concurrency,
        batch_size=batch_size,
    )


def lm_perplexity_reference(held_texts: list[str], text: str) -> float | None:
    """Scalar reference implementation (tests only): train on
    ``held_texts``, return the add-one-smoothed bigram log2-perplexity
    of ``text`` — None if it has no transitions."""
    c2: dict = {}
    c1: dict = {}
    for h in held_texts:
        toks = _tokens(h)
        for a, b in zip(toks[:-1], toks[1:]):
            c2[(a, b)] = c2.get((a, b), 0) + 1
            c1[a] = c1.get(a, 0) + 1
    V = len(c1) + 1
    toks = _tokens(text)
    if len(toks) < 2:
        return None
    import math

    logs = [math.log2((c2.get((a, b), 0) + 1) / (c1.get(a, 0) + V))
            for a, b in zip(toks[:-1], toks[1:])]
    return round(-sum(logs) / len(logs), 6)
