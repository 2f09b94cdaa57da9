"""Margin-criterion bitext mining."""

import numpy as np
import pyarrow as pa


def _mk(rng, n, label, planted=None):
    rows = []
    for i in range(n):
        v = rng.standard_normal(8)
        rows.append({"vec_id": label * 1000 + i,
                     "embedding": v.tolist(), "label": label})
    return rows


def test_bitext_mine_matches_brute_force(ray_session):
    import ray.data

    from smartreader_ray.functions.similarity import bitext_mine

    rng = np.random.default_rng(11)
    rows = _mk(rng, 12, 0) + _mk(rng, 15, 1)
    ds = ray.data.from_items(rows).repartition(4)
    out = bitext_mine(ds, src_label=0, tgt_label=1).take_all()

    def norm(v):
        v = np.asarray(v, dtype=np.float64)
        return v / np.linalg.norm(v)

    a = [(r["vec_id"], norm(r["embedding"])) for r in rows if r["label"] == 0]
    b = [(r["vec_id"], norm(r["embedding"])) for r in rows if r["label"] == 1]

    def top(q, side, k):
        sims = sorted(((float(q @ v), -i) for i, v in side), reverse=True)
        return [-negi for _, negi in sims[:k]]

    best_src = {i: top(v, a, 1)[0] for i, v in b}
    assert len(out) == 12
    for r in out:
        src_vec = dict(a)[r["src_id"]]
        t1, t2 = top(src_vec, b, 2)
        assert (r["best_tgt"], r["second_tgt"]) == (t1, t2)
        assert r["mutual"] == (best_src[t1] == r["src_id"])


def test_bitext_mine_planted_pair_is_mutual(ray_session):
    import ray.data

    from smartreader_ray.functions.similarity import bitext_mine

    rng = np.random.default_rng(3)
    rows = _mk(rng, 6, 0) + _mk(rng, 6, 1)
    # plant an exact translation pair: tgt 1003 = src 2 direction
    v = np.asarray(rows[2]["embedding"])
    rows[6 + 3]["embedding"] = (v * 2.0).tolist()  # same direction
    ds = ray.data.from_items(rows)
    out = {r["src_id"]: r for r in
           bitext_mine(ds, src_label=0, tgt_label=1).take_all()}
    assert out[2]["best_tgt"] == 1003
    assert out[2]["mutual"]
