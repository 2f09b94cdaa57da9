"""Resize / frame-sample / feature-extract media stages (stages/media.py)."""

import numpy as np
import pyarrow as pa

from smartreader_ray.stages.media import (
    ByteHistogramFeatures,
    FrameSampleStage,
    ImageResizeStage,
    fake_image_encode,
    fake_video_encode,
)


def _media_batch():
    img = fake_image_encode(512, 256, bytes(range(256)) * 8)
    vid = fake_video_encode([bytes([i]) * 4 for i in range(25)])
    return pa.table(
        {
            "doc_id": pa.array(["d1", "d2", "d3"], type=pa.string()),
            "media_ref": pa.array(["a.img", "b.vid", "broken"], type=pa.string()),
            "payload": pa.array([img, vid, b"garbage"], type=pa.binary()),
        }
    )


def test_resize_shrinks_and_errors():
    out = ImageResizeStage(max_dim=128)(_media_batch())
    rows = {r["media_ref"]: r for r in out.to_pylist()}
    ok = rows["a.img"]
    assert (ok["src_width"], ok["src_height"]) == (512, 256)
    assert ok["width"] == 128 and ok["height"] == 64
    assert len(ok["payload"]) < 8 + 256 * 8  # byte budget shrank
    assert ok["payload"][:4] == b"FIMG"
    # non-FIMG payloads -> error rows, never exceptions
    assert rows["broken"]["error"].startswith("not a FIMG")
    assert rows["b.vid"]["error"]  # video payload isn't an image either


def test_frame_sampling_expands_rows():
    out = FrameSampleStage(every_k=10)(_media_batch())
    rows = [r for r in out.to_pylist() if r["media_ref"] == "b.vid"]
    assert [r["frame_idx"] for r in rows] == [0, 10, 20]
    assert rows[1]["frame"] == bytes([10]) * 4
    errs = [r for r in out.to_pylist() if r["error"]]
    assert {r["media_ref"] for r in errs} == {"a.img", "broken"}


def test_byte_histogram_features():
    out = ByteHistogramFeatures()(_media_batch())
    rows = {r["media_ref"]: r for r in out.to_pylist()}
    v = np.array(rows["a.img"]["embedding"])
    assert v.shape == (256,)
    assert abs(v.sum() - 1.0) < 1e-5
    # uniform pixel bytes dominate the histogram of the FIMG payload
    assert v.min() >= 0


def test_media_stage_pipeline(ray_session):
    """End-to-end actor-pool plumbing: resize then feature-extract."""
    import ray.data

    ds = ray.data.from_arrow(_media_batch())
    out = (
        ds.map_batches(ImageResizeStage, batch_format="pyarrow",
                       concurrency=(1, 2), batch_size=2)
        .filter(expr="error == ''")
        .map_batches(ByteHistogramFeatures, batch_format="pyarrow",
                     concurrency=(1, 2), batch_size=2)
    ).take_all()
    assert len(out) == 1 and out[0]["media_ref"] == "a.img"
    assert len(out[0]["embedding"]) == 256
