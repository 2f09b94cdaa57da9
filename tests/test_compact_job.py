"""Post-crawl compaction job (jobs/compact_job.py)."""

import glob
import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _mk_corpus(tmp: str, n_waves: int = 3, rows_per: int = 40) -> str:
    corpus = os.path.join(tmp, "corpus")
    i = 0
    for w in range(n_waves):
        d = os.path.join(corpus, f"wave=wave_{w:03d}.warc.gz")
        os.makedirs(d)
        t = pa.table(
            {
                "doc_id": pa.array(
                    [f"http://{j}.example/" for j in range(i, i + rows_per)],
                    type=pa.string(),
                ),
                "text": [f"doc {j} body" for j in range(i, i + rows_per)],
                "n_tokens": pa.array([3] * rows_per, type=pa.int64()),
            }
        )
        pq.write_table(t, os.path.join(d, "part-0.parquet"))
        i += rows_per
    return corpus


def _bucket_rows(output: str) -> dict:
    out = {}
    for d in sorted(glob.glob(os.path.join(output, "bucket=*"))):
        ids = []
        for p in glob.glob(os.path.join(d, "*.parquet")):
            ids.extend(pq.read_table(p, columns=["doc_id"])
                       .column("doc_id").to_pylist())
        out[os.path.basename(d)] = ids
    return out


def test_compact_preserves_rows_and_is_deterministic(ray_session, tmp_path):
    from jobs.compact_job import run_compact
    from smartreader_ray.functions.dedup import _hash64

    corpus = _mk_corpus(str(tmp_path))
    output = str(tmp_path / "compacted")
    s = run_compact(corpus, output, num_buckets=8)
    assert s["compacted"] and s["rows"] == 120
    buckets = _bucket_rows(output)
    all_ids = [i for ids in buckets.values() for i in ids]
    assert len(all_ids) == 120 and len(set(all_ids)) == 120
    # bucket assignment is the documented deterministic rule
    for bname, ids in buckets.items():
        b = int(bname.split("=")[1])
        got = (_hash64(ids) % np.uint64(8)).astype(np.int64)
        assert (got == b).all()
    # re-run with the same wave set is a no-op
    again = run_compact(corpus, output, num_buckets=8)
    assert not again["compacted"] and again["reason"] == "up to date"


def test_compact_recovers_from_crash_and_recompacts_on_growth(
        ray_session, tmp_path):
    from jobs.compact_job import run_compact

    corpus = _mk_corpus(str(tmp_path), n_waves=2)
    output = str(tmp_path / "compacted")
    # simulate a crashed attempt: stale staging + partial bucket dirs,
    # no manifest
    os.makedirs(os.path.join(output, "_staging", "bucket=3"))
    os.makedirs(os.path.join(output, "bucket=9"))
    with open(os.path.join(output, "bucket=9", "junk.parquet"), "w") as f:
        f.write("partial")
    s = run_compact(corpus, output, num_buckets=4)
    assert s["compacted"] and s["rows"] == 80
    assert not os.path.exists(os.path.join(output, "_staging"))
    assert not os.path.exists(os.path.join(output, "bucket=9"))
    # a new wave invalidates the manifest -> full recompact
    _mk = os.path.join(corpus, "wave=wave_zzz.warc.gz")
    os.makedirs(_mk)
    t = pa.table(
        {
            "doc_id": pa.array(["http://new.example/"], type=pa.string()),
            "text": ["new"], "n_tokens": pa.array([1], type=pa.int64()),
        }
    )
    pq.write_table(t, os.path.join(_mk, "part-0.parquet"))
    s2 = run_compact(corpus, output, num_buckets=4)
    assert s2["compacted"] and s2["rows"] == 81
    with open(os.path.join(output, "_COMPACT_MANIFEST.json")) as f:
        man = json.load(f)
    assert len(man["waves"]) == 3


def test_compact_refuses_empty_input(ray_session, tmp_path):
    from jobs.compact_job import run_compact

    with pytest.raises(FileNotFoundError):
        run_compact(str(tmp_path), str(tmp_path / "out"))
