"""Cluster entry point for the extraction pipeline.

Submit with::

    ray job submit --working-dir . -- \
        python jobs/extract_job.py --input /data/spans --output /data/out \
        --num-partitions 256

The job is resumable: each completed partition commits one fsync'd line
to ``<output>/_MANIFEST.jsonl``; re-submitting the same command skips
committed partitions and processes only the remainder (north-rule:
"resuming cleanly from the last committed partition").

Input: an F1 interleaved-span table (parquet, or Lance where the reader
is available) with columns (doc_id:string, spans:list<struct<kind,text,
media_ref,offset>>). Output: partitioned parquet of article rows
(ARTICLE_SCHEMA) + manifest with per-partition lineage/metrics.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# the job ships with --working-dir .; make the package importable when the
# script is invoked as jobs/extract_job.py from the repo root
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="span table path (parquet/lance)")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--num-partitions", type=int, default=64)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--base-uri", default="https://localhost/")
    ap.add_argument("--time-budget-s", type=float, default=0.0,
                    help="per-document wall-clock budget (0 = unbounded)")
    ap.add_argument("--max-partitions", type=int, default=None,
                    help="stop after N partitions (testing)")
    ap.add_argument("--mode", choices=("auto", "files", "hash"), default="auto",
                    help="partitioning: 'files' slices the input file listing "
                         "(each wave reads ONLY its slice — the at-scale mode); "
                         "'hash' filters each wave by doc_id hash (K full "
                         "scans); 'auto' picks files for a directory of "
                         "parquet shards, hash otherwise")
    args = ap.parse_args(argv)

    import ray

    if not ray.is_initialized():
        ray.init(include_dashboard=False)

    from smartreader_ray.pipelines import (
        CheckpointedExtraction,
        files_fingerprint,
    )
    from smartreader_ray.sources import read_spans

    # hash-mode resumes rely on the constructor fingerprint (run_files
    # fingerprints its slice listing itself): derive one from the input
    # path so a resume against a DIFFERENT input fails fast instead of
    # silently skipping/double-processing partitions
    input_fp = ""
    if os.path.isfile(args.input):
        input_fp = files_fingerprint([args.input])
    elif os.path.isdir(args.input):
        import glob as _glob

        listing = sorted(
            _glob.glob(os.path.join(args.input, "**", "*"), recursive=True)
        )
        input_fp = files_fingerprint(
            [p for p in listing if os.path.isfile(p)]
        )

    job = CheckpointedExtraction(
        args.output,
        num_partitions=args.num_partitions,
        base_uri=args.base_uri,
        batch_size=args.batch_size,
        time_budget_s=args.time_budget_s,
        input_fingerprint=input_fp,
    )
    pending = job.pending_partitions()
    print(
        f"partitions: {args.num_partitions} total, "
        f"{args.num_partitions - len(pending)} committed, {len(pending)} pending",
        file=sys.stderr,
    )
    import glob

    input_files = None
    if args.mode in ("auto", "files"):
        if os.path.isdir(args.input) and not os.path.isdir(
            os.path.join(args.input, "_versions")  # lance layout → hash mode
        ):
            input_files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
        elif args.mode == "files" and os.path.isfile(args.input):
            input_files = [args.input]
        if args.mode == "files" and not input_files:
            ap.error(f"--mode files: no parquet files found under {args.input}")
    if input_files:
        summary = job.run_files(input_files, max_partitions=args.max_partitions)
    else:
        summary = job.run(
            lambda: read_spans(args.input), max_partitions=args.max_partitions
        )
    print(json.dumps(summary))
    ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
