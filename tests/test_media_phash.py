"""ImagePHashStage: average-hash vs a naive reference on real BMPs."""

import numpy as np
import pyarrow as pa


def _naive_ahash(px):
    h, w = px.shape[:2]
    gray = px.astype(np.int64).sum(axis=2) // 3
    s = [[gray[(j * h) // 8][(k * w) // 8] for k in range(8)]
         for j in range(8)]
    flat = [v for row in s for v in row]
    mean = sum(flat) // 64
    ph = 0
    for b, v in enumerate(flat):
        if v >= mean:
            ph |= 1 << b
    return format(ph, "016x")


def test_phash_matches_naive_and_buckets():
    from smartreader_ray.stages.codecs import bmp_encode
    from smartreader_ray.stages.media import ImagePHashStage

    rng = np.random.default_rng(7)
    imgs = [rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            for h, w in [(48, 64), (100, 37), (8, 8), (9, 250)]]
    imgs.append(imgs[0].copy())       # exact visual dup -> same hash
    b = pa.table({
        "doc_id": pa.array(range(len(imgs)), type=pa.int64()),
        "media_ref": [f"m{i}" for i in range(len(imgs))],
        "payload": pa.array([bmp_encode(p) for p in imgs],
                            type=pa.binary()),
    })
    out = ImagePHashStage()(b).to_pylist()
    for r, px in zip(out, imgs):
        assert r["error"] == ""
        assert r["phash"] == _naive_ahash(px)
    assert out[0]["phash"] == out[4]["phash"]


def test_phash_decode_error_row():
    from smartreader_ray.stages.media import ImagePHashStage

    b = pa.table({
        "doc_id": pa.array([0], type=pa.int64()),
        "media_ref": ["bad"],
        "payload": pa.array([b"not-an-image"], type=pa.binary()),
    })
    r = ImagePHashStage()(b).to_pylist()[0]
    assert r["phash"] == "" and r["error"]
