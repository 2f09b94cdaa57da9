"""Cluster entry point for multimodal sequence packing.

Submit with::

    ray job submit --working-dir . -- \
        python jobs/pack_job.py --input /data/spans --output /data/packed \
        --num-partitions 256 --budget 256 --media-cost 64

Packs every interleaved document's spans into fixed-budget training
sequences (``spanio.pack_spans_batch``: text spans cost their token
count, each media span a fixed patch budget; prefix-packing boundary
rule). Resumable via the same manifest protocol as ``extract_job``:
one fsync'd line per committed partition in ``<output>/_MANIFEST.jsonl``;
re-submitting skips committed partitions (north-rule: "resuming cleanly
from the last committed partition").

Input: an interleaved-span table (parquet shards or a single file) with
columns (doc_id, spans:list<struct<kind,text,media_ref,offset>>).
Output: partitioned parquet of packed-sequence rows (doc_id, seq_idx,
n_spans, n_text_tokens, n_media, cost) + manifest with per-partition
packing metrics (docs, sequences, token/media/cost totals).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def pack_metrics(part) -> dict:
    """Per-partition packing rollup over the committed output rows:
    docs (rows with seq_idx==0 — every non-empty doc emits sequence 0),
    sequences, text tokens, media spans, total cost. One vectorized
    pass; the partition is output-sized, never the input."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def partial(b: pa.Table) -> pa.Table:
        def s(col):
            v = pc.sum(b.column(col)).as_py()
            return int(v) if v is not None else 0

        docs = pc.sum(pc.cast(pc.equal(b.column("seq_idx"), 0),
                              pa.int64())).as_py() or 0
        return pa.table({
            "docs": pa.array([int(docs)], type=pa.int64()),
            "sequences": pa.array([b.num_rows], type=pa.int64()),
            "text_tokens": pa.array([s("n_text_tokens")], type=pa.int64()),
            "media_spans": pa.array([s("n_media")], type=pa.int64()),
            "cost": pa.array([s("cost")], type=pa.int64()),
        })

    import pandas as pd

    t = part.map_batches(partial, batch_format="pyarrow").to_pandas()
    tot = t.sum() if len(t) else pd.Series(dtype="int64")
    return {
        "docs": int(tot.get("docs", 0)),
        "sequences": int(tot.get("sequences", 0)),
        "text_tokens": int(tot.get("text_tokens", 0)),
        "media_spans": int(tot.get("media_spans", 0)),
        "cost": int(tot.get("cost", 0)),
    }


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="span table path")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--budget", type=int, default=256,
                    help="sequence token budget")
    ap.add_argument("--media-cost", type=int, default=64,
                    help="token cost charged per media span")
    ap.add_argument("--max-partitions", type=int, default=None,
                    help="stop after N partitions (testing)")
    ap.add_argument("--mode", choices=("auto", "files", "hash"),
                    default="auto")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from smartreader_ray.pipelines.checkpoint import (
        CheckpointedTransform,
        files_fingerprint,
    )
    from smartreader_ray.spanio import pack_spans_batch

    budget, media_cost = args.budget, args.media_cost

    def transform(ds):
        return ds.map_batches(
            pack_spans_batch, batch_format="pyarrow",
            fn_kwargs={"budget": budget, "media_cost": media_cost},
        )

    input_fp = ""
    if os.path.isfile(args.input):
        input_fp = files_fingerprint([args.input])
    elif os.path.isdir(args.input):
        import glob as _glob

        listing = sorted(
            _glob.glob(os.path.join(args.input, "**", "*"), recursive=True)
        )
        input_fp = files_fingerprint([p for p in listing if os.path.isfile(p)])

    job = CheckpointedTransform(
        args.output,
        transform,
        num_partitions=args.num_partitions,
        input_fingerprint=input_fp,
        metrics_fn=pack_metrics,
    )
    pending = job.pending_partitions()
    print(
        f"partitions: {args.num_partitions} total, "
        f"{args.num_partitions - len(pending)} committed, "
        f"{len(pending)} pending",
        file=sys.stderr,
    )
    import glob

    input_files = None
    if args.mode in ("auto", "files"):
        if os.path.isdir(args.input):
            input_files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        elif args.mode == "files" and os.path.isfile(args.input):
            input_files = [args.input]
        if args.mode == "files" and not input_files:
            ap.error(f"--mode files: no parquet files found under {args.input}")
    if input_files:
        summary = job.run_files(input_files, max_partitions=args.max_partitions)
    else:
        import ray.data

        summary = job.run(
            lambda: ray.data.read_parquet(args.input),
            max_partitions=args.max_partitions,
        )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
