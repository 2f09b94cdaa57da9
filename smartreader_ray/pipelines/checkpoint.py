"""Checkpointed, resumable extraction runs.

North-rule requirement: "resuming cleanly from the last committed
partition" with per-partition lineage + metrics. Unit of commit = one
input partition. Two partitioning modes:

* **File-sliced** (``run_files``) — partition ``pid`` = every
  ``num_partitions``-th file of the sorted input listing. A wave reads
  ONLY its own files, so a K-partition run reads the corpus exactly once
  (the 100 TB mode).
* **Hash-sliced** (``run``) — partition ``pid`` = doc_ids with
  ``hash(doc_id) % K == pid`` over one logical input. Each wave re-scans
  the input and filters; K waves = K scans. Only for inputs with no file
  layout (in-memory tables, tests).

Each committed partition appends one fsync'd line to
``out/_MANIFEST.jsonl``; a restart diffs pending = all − committed at
planning time (a set difference, no shuffle) and processes only those.
The FIRST manifest line is a header recording ``num_partitions`` and an
input fingerprint: re-invoking with a different partition count (which
would silently remap the hash modulus / file slices) or a different
input fails fast instead of skipping/double-processing documents.

Output layout: ``out/part-{pid:05d}/*.parquet`` — one directory per
partition so a partial run never corrupts a committed one, and downstream
readers can read the directory tree as one dataset.
"""

from __future__ import annotations

import hashlib
import json
import os
import time
from typing import Callable, Optional, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from ..extraction import ExtractorConfig
from .extract import build_extraction_pipeline, corpus_metrics

MANIFEST = "_MANIFEST.jsonl"


def read_manifest(out_dir: str) -> dict[int, dict]:
    """Committed partitions (header line excluded)."""
    committed: dict[int, dict] = {}
    for rec in _manifest_records(out_dir):
        if "partition_id" in rec:
            committed[rec["partition_id"]] = rec
    return committed


def read_manifest_header(out_dir: str) -> Optional[dict]:
    for rec in _manifest_records(out_dir):
        if rec.get("header"):
            return rec
    return None


def _manifest_records(out_dir: str):
    path = os.path.join(out_dir, MANIFEST)
    if os.path.exists(path):
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    yield json.loads(line)


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


def _tag_partition(pid: int):
    def fn(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "partition_id", pa.array([pid] * batch.num_rows, type=pa.int64())
        )

    return fn


def _stable_hash(s: str) -> int:
    # deterministic across processes (unlike hash()); cheap FNV-1a
    h = 0xCBF29CE484222325
    for b in s.encode():
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def files_fingerprint(files: Sequence[str]) -> str:
    """Order-insensitive fingerprint of an input file listing (name+size)."""
    h = hashlib.sha256()
    for f in sorted(files):
        size = os.path.getsize(f) if os.path.exists(f) else -1
        h.update(f"{os.path.basename(f)}\x1f{size}\x1e".encode())
    return h.hexdigest()[:16]


class CheckpointedTransform:
    """Generic checkpointed per-partition run of ANY Dataset transform.

    ``transform(ds) -> ds`` is applied to each partition's input slice
    and the result written to ``out/part-{pid:05d}/``; one fsync'd
    manifest line commits the partition. Resume, header guards,
    file-sliced vs hash-sliced modes and the partial-directory cleanup
    are identical for every pipeline — extraction
    (:class:`CheckpointedExtraction`) is just this with the extraction
    pipeline bound as the transform. ``metrics_fn(part_ds) -> dict``
    (optional) computes the per-partition lineage metrics; integer
    metrics are summed into the run totals.
    """

    def __init__(
        self,
        out_dir: str,
        transform: Callable,
        num_partitions: int = 8,
        input_fingerprint: str = "",
        metrics_fn: Optional[Callable] = None,
    ):
        self.out_dir = out_dir
        self.num_partitions = num_partitions
        self.input_fingerprint = input_fingerprint
        self._transform = transform
        self._metrics_fn = metrics_fn
        os.makedirs(out_dir, exist_ok=True)

    # ------------------------------------------------------------------
    # manifest header: resume-safety guard (num_partitions + input id)
    # ------------------------------------------------------------------
    def _check_or_write_header(self, fingerprint: str, mode: str) -> None:
        hdr = read_manifest_header(self.out_dir)
        if hdr is None:
            _append_manifest(
                self.out_dir,
                {
                    "header": 1,
                    "num_partitions": self.num_partitions,
                    "input_fingerprint": fingerprint,
                    "mode": mode,
                },
            )
            return
        if hdr["num_partitions"] != self.num_partitions:
            raise ValueError(
                f"manifest at {self.out_dir} was written with "
                f"num_partitions={hdr['num_partitions']}; resuming with "
                f"{self.num_partitions} would remap partitions and skip or "
                "double-process documents. Use the original partition count "
                "or a fresh out_dir."
            )
        if hdr.get("mode", mode) != mode:
            raise ValueError(
                f"manifest at {self.out_dir} was written in {hdr['mode']!r} "
                f"partitioning mode; cannot resume in {mode!r} mode."
            )
        if fingerprint and hdr.get("input_fingerprint") and (
            hdr["input_fingerprint"] != fingerprint
        ):
            raise ValueError(
                f"manifest at {self.out_dir} was written for input "
                f"{hdr['input_fingerprint']}; current input is {fingerprint}. "
                "Committed partition ids would not correspond to the same "
                "documents. Use a fresh out_dir."
            )

    def pending_partitions(self) -> list[int]:
        committed = read_manifest(self.out_dir)
        return [p for p in range(self.num_partitions) if p not in committed]

    # ------------------------------------------------------------------
    # the two run modes
    # ------------------------------------------------------------------
    def run(self, make_input_ds, max_partitions: Optional[int] = None) -> dict:
        """Hash-sliced mode: ``make_input_ds()`` → fresh spans Dataset
        (lazy) per wave; each wave filters to its doc_id hash slice.

        Safe to re-invoke after a crash: committed partitions are skipped,
        and a header mismatch (different num_partitions / input) raises.
        NOTE each wave scans the whole input — use :meth:`run_files` when
        the input has a file layout.
        """
        self._check_or_write_header(self.input_fingerprint, mode="hash")

        def make_wave_ds(pid: int):
            return make_input_ds().map_batches(
                _partition_filter(pid, self.num_partitions),
                batch_format="pyarrow",
            )

        return self._run_waves(make_wave_ds, max_partitions)

    def run_files(
        self,
        input_files: Sequence[str],
        reader: Optional[Callable] = None,
        max_partitions: Optional[int] = None,
    ) -> dict:
        """File-sliced mode: partition ``pid`` reads ONLY
        ``sorted(input_files)[pid::num_partitions]`` — the whole run reads
        each input file exactly once (vs K full scans in hash mode).

        ``reader(files) -> Dataset`` defaults to ``ray.data.read_parquet``;
        it must yield the schema the bound transform expects (for
        extraction: doc_id, spans).
        """
        files = sorted(input_files)
        if not files:
            raise ValueError("run_files needs a non-empty input file list")
        self._check_or_write_header(files_fingerprint(files), mode="files")
        if reader is None:
            import ray.data

            reader = ray.data.read_parquet

        def make_wave_ds(pid: int):
            wave_files = files[pid :: self.num_partitions]
            if not wave_files:
                return None
            return reader(wave_files).map_batches(
                _tag_partition(pid), batch_format="pyarrow"
            )

        return self._run_waves(make_wave_ds, max_partitions)

    def _empty_metrics(self) -> dict:
        return {"docs": 0}

    def _run_waves(self, make_wave_ds, max_partitions: Optional[int]) -> dict:
        from collections import defaultdict

        ran = 0
        totals: dict = defaultdict(int)
        for k in self._empty_metrics():
            totals[k] = 0
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
            ds = make_wave_ds(pid)
            if ds is None:  # more partitions than files: commit empty
                metrics = dict(self._empty_metrics())
            else:
                out = self._transform(ds)
                out.write_parquet(part_dir)
                part = _read_part(part_dir)
                metrics = (
                    self._metrics_fn(part) if self._metrics_fn is not None
                    else {"docs": part.count()}
                )
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
            for k, v in metrics.items():
                if isinstance(v, (int,)) and not isinstance(v, bool):
                    totals[k] += v
        return {"partitions_run": ran, **dict(totals)}

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


class CheckpointedExtraction(CheckpointedTransform):
    """Checkpointed extraction: :class:`CheckpointedTransform` with the
    extraction pipeline bound as the transform and the corpus rollup as
    the per-partition metrics."""

    def __init__(
        self,
        out_dir: str,
        num_partitions: int = 8,
        config: Optional[ExtractorConfig] = None,
        base_uri: str = "https://localhost/",
        batch_size: int = 16,
        time_budget_s: float = 0.0,
        input_fingerprint: str = "",
    ):
        def transform(ds):
            return build_extraction_pipeline(
                ds,
                config=config,
                base_uri=base_uri,
                batch_size=batch_size,
                time_budget_s=time_budget_s,
            )

        super().__init__(
            out_dir,
            transform,
            num_partitions=num_partitions,
            input_fingerprint=input_fingerprint,
            metrics_fn=corpus_metrics,
        )
        self.config = config
        self.base_uri = base_uri
        self.batch_size = batch_size
        self.time_budget_s = time_budget_s

    def _empty_metrics(self) -> dict:
        return {"docs": 0, "readable": 0, "completed": 0, "chars_kept": 0}


def _read_part(part_dir: str):
    import glob

    import ray.data

    return ray.data.read_parquet(sorted(glob.glob(os.path.join(part_dir, "*.parquet"))))
