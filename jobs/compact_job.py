"""Post-crawl compaction: many small per-wave outputs → K stable
hash-bucketed partitions.

An incremental crawl (`jobs/crawl_job.py`) appends one directory per
wave; after hundreds of waves the corpus is thousands of small files —
bad read parallelism, bad pruning. This job rewrites the accepted
corpus as ``<out>/bucket=<hash(doc_id) % K>/*.parquet`` (hive layout
via Ray's own ``partition_cols`` write — the `ivf_build_index`
pattern), giving downstream jobs a stable, deterministic partitioning
key they can co-partition against.

Resume contract: compaction is by nature a full rewrite, so the unit of
commit is the WHOLE run — an fsync'd ``_COMPACT_MANIFEST.json`` written
only after the bucket write completes and row counts reconcile.
Re-running with the same input wave set is a no-op; a crash mid-write
leaves no manifest, so the re-run rewrites into a fresh staging dir and
atomically swaps it in (the half-written attempt is removed); a GROWN
wave set invalidates the manifest and recompacts. Input rows are
preserved exactly (no dedup here — the crawl job already deduped).

Usage::

    python jobs/compact_job.py --input /data/corpus --output /data/compacted \
        --num-buckets 64
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MANIFEST = "_COMPACT_MANIFEST.json"


def _wave_listing(input_dir: str) -> list[str]:
    return sorted(
        d for d in glob.glob(os.path.join(input_dir, "wave=*"))
        if os.path.isdir(d)
    )


def run_compact(input_dir: str, output: str, *, num_buckets: int = 64,
                id_col: str = "doc_id") -> dict:
    """Compact every wave under ``input_dir``; returns the run summary.
    Owns no Ray session (caller inits)."""
    import pyarrow as pa
    import ray.data

    from smartreader_ray.functions.dedup import _hash64

    waves = _wave_listing(input_dir)
    if not waves:
        raise FileNotFoundError(f"no wave=* directories under {input_dir}")
    wave_names = [os.path.basename(w) for w in waves]

    os.makedirs(output, exist_ok=True)
    man_path = os.path.join(output, MANIFEST)
    if os.path.exists(man_path):
        with open(man_path) as f:
            man = json.load(f)
        if (man.get("waves") == wave_names
                and man.get("num_buckets") == num_buckets):
            return {"compacted": False, "reason": "up to date", **man}

    files = sorted(
        p for w in waves for p in glob.glob(os.path.join(w, "*.parquet"))
    )
    ds = ray.data.read_parquet(files)

    def stamp(batch: pa.Table) -> pa.Table:
        ids = [str(v) for v in batch.column(id_col).to_pylist()]
        import numpy as np

        bucket = (_hash64(ids) % np.uint64(num_buckets)).astype(np.int64)
        return batch.append_column("bucket", pa.array(bucket, type=pa.int64()))

    staging = os.path.join(output, "_staging")
    if os.path.exists(staging):
        shutil.rmtree(staging)  # half-written attempt from a crash
    os.makedirs(staging)
    stamped = ds.map_batches(stamp, batch_format="pyarrow")
    stamped.write_parquet(staging, partition_cols=["bucket"])

    # reconcile BEFORE commit: every input row must be in the staging set
    rows_in = ds.count()
    rows_out = ray.data.read_parquet(staging).count()
    if rows_in != rows_out:
        raise RuntimeError(
            f"compaction row mismatch: {rows_in} in, {rows_out} staged"
        )

    # swap staging into place, then commit the manifest (fsync + rename)
    for d in glob.glob(os.path.join(output, "bucket=*")):
        shutil.rmtree(d)
    for d in glob.glob(os.path.join(staging, "bucket=*")):
        os.replace(d, os.path.join(output, os.path.basename(d)))
    shutil.rmtree(staging)
    man = {
        "waves": wave_names, "num_buckets": num_buckets,
        "rows": rows_out, "id_col": id_col,
    }
    tmp = man_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(man, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, man_path)
    return {"compacted": True, **man}


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", required=True, help="crawl output dir (wave=*)")
    ap.add_argument("--output", required=True, help="compacted corpus dir")
    ap.add_argument("--num-buckets", type=int, default=64)
    ap.add_argument("--id-col", default="doc_id")
    args = ap.parse_args(argv)

    import ray

    owns = not ray.is_initialized()
    if owns:
        ray.init(include_dashboard=False)
    summary = run_compact(args.input, args.output,
                          num_buckets=args.num_buckets, id_col=args.id_col)
    print(json.dumps(summary))
    if owns:
        ray.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
