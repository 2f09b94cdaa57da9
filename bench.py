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


def _init_ray(num_cpus: int):
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    return ray


def _consume(ds) -> int:
    """Stream the dataset to completion; return row count (no driver
    materialization of payload columns)."""
    n = 0
    for batch in ds.iter_batches(batch_format="pyarrow", batch_size=4096):
        n += batch.num_rows
    return n


def _fixture_corpus_ds(replicas: int):
    import pyarrow as pa
    import ray.data

    from smartreader_ray.sources import fixture_spans_table

    base = fixture_spans_table()
    tables = []
    for r in range(replicas):
        ids = pa.array(
            [f"{v}~{r}" for v in base.column("doc_id").to_pylist()], type=pa.string()
        )
        tables.append(pa.Table.from_arrays([ids, base.column("spans")], names=["doc_id", "spans"]))
    return ray.data.from_arrow(tables), base


def bench_extract_fixtures(replicas: int = 8):
    """Flagship: real-web-page extraction throughput (docs/s, MB/s)."""
    from smartreader_ray.pipelines import build_extraction_pipeline

    ds, base = _fixture_corpus_ds(replicas)
    total_bytes = sum(
        sum(len(s["text"]) for s in spans)
        for spans in base.column("spans").to_pylist()
    ) * replicas
    n_docs = base.num_rows * replicas
    t0 = time.time()
    out = build_extraction_pipeline(ds, batch_size=4, include_content=False)
    rows = _consume(out)
    dt = time.time() - t0
    assert rows == n_docs, (rows, n_docs)
    return dt, {"docs": n_docs, "bytes": total_bytes, "docs_per_s": round(n_docs / dt, 2),
                "mb_per_s": round(total_bytes / dt / 1e6, 2)}


def bench_extract_documents(sf_dir: str):
    from smartreader_ray.pipelines import build_extraction_pipeline
    from smartreader_ray.sources import documents_to_spans

    t0 = time.time()
    ds = build_extraction_pipeline(
        documents_to_spans(sf_dir), batch_size=64, include_content=False
    )
    rows = _consume(ds)
    dt = time.time() - t0
    return dt, {"docs": rows, "docs_per_s": round(rows / dt, 2)}


def bench_query(fn, sf_dir: str):
    t0 = time.time()
    result = fn(sf_dir)
    if hasattr(result, "iter_batches"):
        _consume(result)
    dt = time.time() - t0
    return dt


def run_main() -> dict:
    sf_dir = _sf_dir()
    num_cpus = _num_cpus()
    _init_ray(num_cpus)

    import __ray_entry__ as entrymod

    queries = {}
    t_fix, fix_stats = bench_extract_fixtures()
    queries["extract_fixture_corpus"] = round(t_fix, 3)
    t_doc, doc_stats = bench_extract_documents(sf_dir)
    queries["extract_documents"] = round(t_doc, 3)

    q = entrymod.queries()
    for name in (
        "exact_dedup", "minhash_candidates", "simhash_neardup", "token_stats",
        "ann_topk", "embed_neardup", "lineitem_pricing", "top_orders",
        "events_by_type", "language_id",
    ):
        queries[name] = round(bench_query(q[name], sf_dir), 3)

    total = round(sum(queries.values()), 3)
    return {
        "metric": "documents/sec extraction throughput on the interleaved-span corpus",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "throughput": {"fixture_corpus": fix_stats, "documents": doc_stats},
    }


def run_single() -> dict:
    """Child mode for --scaling: flagship extraction only."""
    num_cpus = _num_cpus()
    _init_ray(num_cpus)
    dt, stats = bench_extract_fixtures()
    return {"num_cpus": num_cpus, "sec": round(dt, 3), **stats}


def run_scaling() -> dict:
    """Same job, same input, fresh processes at 8 then 32 CPUs."""
    results = {}
    for n in (8, 32):
        env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
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
    thr8 = results[8]["docs_per_s"]
    thr32 = results[32]["docs_per_s"]
    efficiency = round((thr32 / thr8) / (32 / 8), 3)
    return {
        "metric": "scaling efficiency N->4N (num_cpus 8 vs 32, fresh processes)",
        "value": efficiency,
        "unit": "efficiency",
        "throughput_8": thr8,
        "throughput_32": thr32,
        "sec_8": results[8]["sec"],
        "sec_32": results[32]["sec"],
        "docs": results[8]["docs"],
        "efficiency": efficiency,
    }


def main() -> None:
    import ray

    if "--scaling" in sys.argv:
        report = run_scaling()
    elif "--single" in sys.argv:
        report = run_single()
        print(json.dumps(report))
        ray.shutdown()
        return
    else:
        report = run_main()
    print(json.dumps(report))
    if ray.is_initialized():
        ray.shutdown()


if __name__ == "__main__":
    main()
