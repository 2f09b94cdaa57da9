"""Checkpointed, resumable extraction runs.

North-rule requirement: "resuming cleanly from the last committed
partition" with per-partition lineage + metrics. Unit of commit = one
input partition (a hash-slice of doc_ids, or one input shard at real
scale). Each committed partition appends one fsync'd line to
``out/_MANIFEST.jsonl``; a restart diffs pending = all − committed at
planning time (a set difference, no shuffle) and processes only those.

Output layout: ``out/part-{pid:05d}/*.parquet`` — one directory per
partition so a partial run never corrupts a committed one, and downstream
readers can read the directory tree as one dataset.
"""

from __future__ import annotations

import json
import os
import time
from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc

from ..extraction import ExtractorConfig
from .extract import build_extraction_pipeline, corpus_metrics

MANIFEST = "_MANIFEST.jsonl"


def read_manifest(out_dir: str) -> dict[int, dict]:
    path = os.path.join(out_dir, MANIFEST)
    committed: dict[int, dict] = {}
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    rec = json.loads(line)
                    committed[rec["partition_id"]] = rec
    return committed


def _append_manifest(out_dir: str, record: dict) -> None:
    path = os.path.join(out_dir, MANIFEST)
    with open(path, "a") as f:
        f.write(json.dumps(record, sort_keys=True) + "\n")
        f.flush()
        os.fsync(f.fileno())


def _partition_filter(pid: int, num_partitions: int):
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        ids = batch.column("doc_id")
        hashes = pa.array(
            [_stable_hash(v) % num_partitions for v in ids.to_pylist()],
            type=pa.int64(),
        )
        mask = pc.equal(hashes, pid)
        out = batch.filter(mask)
        return out.append_column(
            "partition_id", pa.array([pid] * out.num_rows, type=pa.int64())
        )

    return fn


def _stable_hash(s: str) -> int:
    # deterministic across processes (unlike hash()); cheap FNV-1a
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


class CheckpointedExtraction:
    """Run extraction partition-by-partition with manifest commits.

    At 100 TB each "partition" is a slice of the input file listing (so a
    wave reads only its own files); here partitions are hash-slices of
    doc_id over the same input, which exercises identical resume logic.
    """

    def __init__(
        self,
        out_dir: str,
        num_partitions: int = 8,
        config: Optional[ExtractorConfig] = None,
        base_uri: str = "https://localhost/",
        batch_size: int = 16,
        time_budget_s: float = 0.0,
    ):
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.config = config
        self.base_uri = base_uri
        self.batch_size = batch_size
        self.time_budget_s = time_budget_s
        os.makedirs(out_dir, exist_ok=True)

    def pending_partitions(self) -> list[int]:
        committed = read_manifest(self.out_dir)
        return [p for p in range(self.num_partitions) if p not in committed]

    def run(self, make_input_ds, max_partitions: Optional[int] = None) -> dict:
        """``make_input_ds()`` → fresh spans Dataset (lazy) per wave.

        Returns summary {partitions_run, docs, ...}. Safe to re-invoke
        after a crash: committed partitions are skipped.
        """
        ran = 0
        totals = {"docs": 0, "readable": 0, "completed": 0}
        for pid in self.pending_partitions():
            if max_partitions is not None and ran >= max_partitions:
                break
            started = time.time()
            part_dir = os.path.join(self.out_dir, f"part-{pid:05d}")
            # a crashed earlier attempt may have left partial files: the
            # partition is not in the manifest, so DELETE the directory and
            # rewrite from scratch (write_parquet appends new files; stale
            # ones would otherwise be read back or double-counted)
            if os.path.isdir(part_dir):
                import shutil

                shutil.rmtree(part_dir)
            ds = make_input_ds().map_batches(
                _partition_filter(pid, self.num_partitions),
                batch_format="pyarrow",
            )
            out = build_extraction_pipeline(
                ds,
                config=self.config,
                base_uri=self.base_uri,
                batch_size=self.batch_size,
                time_budget_s=self.time_budget_s,
            )
            out.write_parquet(part_dir)
            metrics = corpus_metrics(_read_part(part_dir))
            _append_manifest(
                self.out_dir,
                {
                    "partition_id": pid,
                    "row_count": metrics["docs"],
                    "wall_ms": round((time.time() - started) * 1000.0, 1),
                    "metrics": metrics,
                },
            )
            ran += 1
            totals["docs"] += metrics["docs"]
            totals["readable"] += metrics["readable"]
            totals["completed"] += metrics["completed"]
        return {"partitions_run": ran, **totals}

    def result_dataset(self):
        """All committed partitions as one Dataset."""
        import glob

        import ray.data

        committed = sorted(read_manifest(self.out_dir))
        files = [
            f
            for p in committed
            for f in sorted(
                glob.glob(os.path.join(self.out_dir, f"part-{p:05d}", "*.parquet"))
            )
        ]
        return ray.data.read_parquet(files) if files else None


def _read_part(part_dir: str):
    import glob

    import ray.data

    return ray.data.read_parquet(sorted(glob.glob(os.path.join(part_dir, "*.parquet"))))
