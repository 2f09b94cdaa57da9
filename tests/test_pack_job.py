"""Resumable multimodal packing job (jobs/pack_job.py)."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq


def _span_type():
    return pa.list_(pa.struct([
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int64()),
    ]))


def _mk_spans(tmp: str, n_files: int = 2, docs_per: int = 6) -> str:
    from smartreader_ray.spanio import make_span

    d = os.path.join(tmp, "spans")
    os.makedirs(d)
    i = 0
    for f in range(n_files):
        rows_doc, rows_spans = [], []
        for _ in range(docs_per):
            spans = [make_span("text", " ".join(["w"] * (3 + i % 7)), "", 0)]
            if i % 2 == 0:
                spans.append(make_span("image", "", f"img://{i}/1", 1))
            spans.append(make_span("text", " ".join(["x"] * 9), "", 2))
            rows_doc.append(i)
            rows_spans.append(spans)
            i += 1
        t = pa.table({
            "doc_id": pa.array(rows_doc, type=pa.int64()),
            "spans": pa.array(rows_spans, type=_span_type()),
        })
        pq.write_table(t, os.path.join(d, f"part-{f}.parquet"))
    return d


def test_pack_job_resumable_and_matches_kernel(ray_session, tmp_path):
    import glob

    import ray.data

    from jobs.pack_job import pack_metrics
    from smartreader_ray.pipelines.checkpoint import CheckpointedTransform
    from smartreader_ray.spanio import pack_spans_batch

    spans_dir = _mk_spans(str(tmp_path))
    out = str(tmp_path / "packed")
    budget, mcost = 10, 4

    def transform(ds):
        return ds.map_batches(
            pack_spans_batch, batch_format="pyarrow",
            fn_kwargs={"budget": budget, "media_cost": mcost})

    files = sorted(glob.glob(os.path.join(spans_dir, "*.parquet")))
    job = CheckpointedTransform(out, transform, num_partitions=2,
                                metrics_fn=pack_metrics)
    s = job.run_files(files)
    assert s["partitions_run"] == 2 and s["docs"] == 12

    # manifest: one committed line per partition, metrics carried
    lines = [json.loads(ln) for ln in
             open(os.path.join(out, "_MANIFEST.jsonl"))
             if '"partition_id"' in ln]
    assert sorted(ln["partition_id"] for ln in lines) == [0, 1]
    assert all(ln["metrics"]["sequences"] > 0 for ln in lines)

    # resume: a second run is a no-op
    job2 = CheckpointedTransform(out, transform, num_partitions=2,
                                 metrics_fn=pack_metrics)
    assert job2.pending_partitions() == []
    s2 = job2.run_files(files)
    assert s2["partitions_run"] == 0

    # committed output == the kernel applied to the whole input
    got = (job2.result_dataset().to_pandas()
           .sort_values(["doc_id", "seq_idx"]).reset_index(drop=True))
    whole = pa.concat_tables([pq.read_table(f) for f in files])
    exp = (pack_spans_batch(whole, budget=budget, media_cost=mcost)
           .to_pandas().sort_values(["doc_id", "seq_idx"])
           .reset_index(drop=True))
    assert got.equals(exp)

    # metrics totals agree with the data
    assert s["sequences"] == len(exp)
    assert s["cost"] == int(exp["cost"].sum())
    assert s["text_tokens"] == int(exp["n_text_tokens"].sum())
