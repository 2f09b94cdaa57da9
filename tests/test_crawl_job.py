"""End-to-end incremental crawl job (jobs/crawl_job.py): WARC waves →
extract → quality gate → incremental exact+near dedup → curated append,
with crash-resume via manifest + index snapshots."""

import glob
import json
import os
import shutil

import pyarrow.parquet as pq
import pytest


def _mk_waves(tmp: str) -> str:
    from smartreader_ray.sources import wrap_document_html
    from smartreader_ray.sources.warc import make_warc

    base_b = ("the quick brown fox jumps over the lazy dog and keeps running "
              "through the wide open field towards the distant river bank "
              "every single morning before the sun rises over the eastern "
              "hills and the village wakes to another quiet day of work")
    near_b = base_b.replace("quiet", "busy")  # 1 of ~45 tokens changed
    texts_w0 = {
        "http://a.example/": "alpha beta gamma delta epsilon zeta eta theta",
        "http://b.example/": base_b,
        "http://c.example/": "one two three four five six seven eight nine",
        "http://junk.example/": "too short",  # fails the 5-token gate
    }
    texts_w1 = {
        "http://a-dup.example/": texts_w0["http://a.example/"],  # exact dup
        "http://b-near.example/": near_b,                        # near dup
        "http://d.example/": "fresh content nobody has ever crawled before "
                             "with many new tokens to pass the gate",
    }
    crawl = os.path.join(tmp, "crawl")
    os.makedirs(crawl, exist_ok=True)
    for name, texts in (("wave_000.warc.gz", texts_w0),
                        ("wave_001.warc.gz", texts_w1)):
        pages = [(uri, wrap_document_html(uri, t)) for uri, t in texts.items()]
        with open(os.path.join(crawl, name), "wb") as f:
            f.write(make_warc(pages, compress=True))
    return crawl


def _accepted_ids(output: str) -> dict:
    out = {}
    for d in sorted(glob.glob(os.path.join(output, "wave=*"))):
        ids = set()
        for p in glob.glob(os.path.join(d, "*.parquet")):
            ids |= set(pq.read_table(p, columns=["doc_id"])
                       .column("doc_id").to_pylist())
        out[os.path.basename(d)] = ids
    return out


def test_crawl_job_two_waves(ray_session, tmp_path):
    from jobs.crawl_job import run_crawl

    crawl = _mk_waves(str(tmp_path))
    output = str(tmp_path / "corpus")
    summary = run_crawl(crawl, output, min_tokens=5, num_shards=2)
    assert summary["waves_run"] == 2 and summary["accepted"] == 4
    got = _accepted_ids(output)
    assert got["wave=wave_000.warc.gz"] == {
        "http://a.example/", "http://b.example/", "http://c.example/"
    }
    # wave 1: exact dup of A dropped, near dup of B dropped, D accepted
    assert got["wave=wave_001.warc.gz"] == {"http://d.example/"}
    assert summary["index"]["exact"]["entries"] == 5  # A B C + B-near + D (near-dropped docs still exact-indexed)
    # re-running the same command is a no-op
    again = run_crawl(crawl, output, min_tokens=5, num_shards=2)
    assert again["waves_run"] == 0 and again["waves_skipped"] == 2


def test_crawl_job_resume_after_crash(ray_session, tmp_path):
    """Wave 2 must reject wave-1 dups AFTER a simulated crash: the index
    actors died, so rejection proves the snapshot reload works."""
    from jobs.crawl_job import run_crawl

    crawl = _mk_waves(str(tmp_path))
    output = str(tmp_path / "corpus")

    # run only wave 0, then simulate a crash mid-wave-1: partial output
    # dir + stale (post-wave-1) snapshot exist, but NO manifest line
    first = run_crawl(crawl, output, min_tokens=5, num_shards=2,
                      max_waves=1)
    assert first["waves_run"] == 1
    partial = os.path.join(output, "wave=wave_001.warc.gz")
    os.makedirs(partial)
    with open(os.path.join(partial, "garbage.parquet"), "w") as f:
        f.write("partial write from crashed run")
    os.makedirs(os.path.join(output, "_state", "wave_001.warc.gz"),
                exist_ok=True)

    # resume in what is effectively a NEW session for the index actors:
    # run_crawl builds fresh actors and must reload the wave-0 snapshot
    resumed = run_crawl(crawl, output, min_tokens=5, num_shards=2)
    assert resumed["waves_skipped"] == 1 and resumed["waves_run"] == 1
    got = _accepted_ids(output)
    assert got["wave=wave_001.warc.gz"] == {"http://d.example/"}
    # the partial file was overwritten, not merged
    assert not os.path.exists(os.path.join(partial, "garbage.parquet"))
    # manifest: one header + exactly one line per wave
    with open(os.path.join(output, "_CRAWL_MANIFEST.jsonl")) as f:
        recs = [json.loads(l) for l in f if l.strip()]
    assert [r.get("wave") for r in recs] == [
        None, "wave_000.warc.gz", "wave_001.warc.gz"
    ]
    assert resumed["index"]["exact"]["entries"] == 5


def test_crawl_job_param_mismatch_refuses(ray_session, tmp_path):
    from jobs.crawl_job import run_crawl

    crawl = _mk_waves(str(tmp_path))
    output = str(tmp_path / "corpus")
    run_crawl(crawl, output, min_tokens=5, num_shards=2, max_waves=1)
    with pytest.raises(ValueError) as ei:
        run_crawl(crawl, output, min_tokens=7, num_shards=2)
    assert "parameter mismatch" in str(ei.value)


def test_index_snapshot_round_trip(ray_session, tmp_path):
    import ray.data

    from smartreader_ray.state import DedupIndex, NearDupIndex

    import random

    rng = random.Random(99)
    words = [f"w{j}" for j in range(400)]
    # genuinely distinct texts — near-identical ones would (correctly)
    # be rejected by the near-dup index
    docs = [{"doc_id": i,
             "text": " ".join(rng.sample(words, 30))}
            for i in range(20)]
    idx = DedupIndex(num_shards=3)
    kept = idx.filter_new(ray.data.from_items(docs)).count()
    assert kept == 20
    idx.save(str(tmp_path / "exact"))
    idx2 = DedupIndex.load(str(tmp_path / "exact"))
    assert idx2.stats()["entries"] == 20
    # everything already indexed → all dropped by the restored index
    assert idx2.filter_new(ray.data.from_items(docs)).count() == 0

    near = NearDupIndex(num_shards=3, num_hashes=32, bands=8)
    assert near.filter_new(ray.data.from_items(docs)).count() == 20
    near.save(str(tmp_path / "near"))
    near2 = NearDupIndex.load(str(tmp_path / "near"))
    assert near2.stats()["band_keys"] == near.stats()["band_keys"]
    assert near2.filter_new(ray.data.from_items(docs)).count() == 0
    # kind mismatch refuses
    with pytest.raises(ValueError):
        DedupIndex.load(str(tmp_path / "near"))
