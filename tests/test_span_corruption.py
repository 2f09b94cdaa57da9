"""Tests for span_corruption (`functions/curation.py`)."""

import numpy as np
import pyarrow as pa


class TestSpanCorruption:
    def test_structure_invariants(self, ray_session):
        import ray.data

        from smartreader_ray.functions.curation import span_corruption

        rng = np.random.default_rng(79)
        words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
        texts = [" ".join(words[rng.integers(0, 5, 60)])
                 for _ in range(50)]
        t = pa.table({
            "doc_id": pa.array(range(50), type=pa.int64()),
            "text": pa.array(texts),
        })
        got = span_corruption(
            ray.data.from_arrow(t).repartition(4),
            mask_rate=0.3).to_pandas()
        assert len(got) == 50
        for _, row in got.iterrows():
            orig = texts[int(row["doc_id"])].split(" ")
            inp = row["input_text"].split(" ")
            tgt = (row["target_text"].split(" ")
                   if row["target_text"] else [])
            sent_in = [x for x in inp if x.startswith("<extra_id_")]
            sent_tg = [x for x in tgt if x.startswith("<extra_id_")]
            # sentinels agree and are numbered 0..k-1 in order
            assert sent_in == sent_tg
            assert sent_in == [f"<extra_id_{i}>"
                               for i in range(len(sent_in))]
            # every original token appears exactly once, in input or
            # target (reconstruction property)
            kept = [x for x in inp if not x.startswith("<extra_id_")]
            masked = [x for x in tgt if not x.startswith("<extra_id_")]
            assert len(kept) + len(masked) == len(orig)
            assert int(row["n_masked"]) == len(masked)

    def test_deterministic_and_partition_invariant(self, ray_session):
        import ray.data

        from smartreader_ray.functions.curation import span_corruption

        t = pa.table({
            "doc_id": pa.array(range(30), type=pa.int64()),
            "text": pa.array(["one two three four five six"] * 30),
        })
        a = span_corruption(ray.data.from_arrow(t)).to_pandas()
        b = span_corruption(
            ray.data.from_arrow(t).repartition(7)).to_pandas()
        assert a.equals(b)
        # masking keys on doc_id, so identical texts under different
        # ids corrupt differently (no cross-doc correlation)
        assert a["input_text"].nunique() > 1

    def test_zero_rate_identity(self, ray_session):
        import ray.data

        from smartreader_ray.functions.curation import span_corruption

        t = pa.table({
            "doc_id": pa.array([1], type=pa.int64()),
            "text": pa.array(["a b c"]),
        })
        got = span_corruption(ray.data.from_arrow(t),
                              mask_rate=0.0).to_pandas()
        assert got["input_text"].iloc[0] == "a b c"
        assert got["target_text"].iloc[0] == ""
        assert got["n_masked"].iloc[0] == 0
