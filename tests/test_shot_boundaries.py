"""ShotBoundaryStage: demux + decode + consecutive-frame delta."""

import numpy as np
import pyarrow as pa


def _frame(value: int) -> bytes:
    from smartreader_ray.stages.codecs import bmp_encode

    px = np.full((8, 8, 3), value, dtype=np.uint8)
    return bmp_encode(px)


def test_shot_boundary_detects_scene_change():
    from smartreader_ray.stages.media import ShotBoundaryStage, fvid_encode

    # frames: 10,10,10 | 200,200 → one boundary at index 3
    clip = fvid_encode([_frame(10)] * 3 + [_frame(200)] * 2)
    batch = pa.table({
        "doc_id": pa.array([7], type=pa.int64()),
        "media_ref": ["vid://7"],
        "payload": pa.array([clip], type=pa.binary()),
    })
    out = ShotBoundaryStage(threshold=10.0)(batch)
    rows = out.to_pylist()
    assert len(rows) == 1
    assert rows[0]["frame_idx"] == 3
    assert rows[0]["delta"] == 190.0
    assert rows[0]["error"] == ""


def test_shot_boundary_threshold_and_error_row():
    from smartreader_ray.stages.media import ShotBoundaryStage, fvid_encode

    clip = fvid_encode([_frame(10), _frame(15)])  # delta 5 ≤ 10
    batch = pa.table({
        "doc_id": pa.array([1, 2], type=pa.int64()),
        "media_ref": ["vid://1", "vid://bad"],
        "payload": pa.array([clip, b"not a container"],
                            type=pa.binary()),
    })
    out = ShotBoundaryStage(threshold=10.0)(batch).to_pylist()
    # no boundary from the quiet clip; one error row for the bad payload
    assert len(out) == 1
    assert out[0]["doc_id"] == 2 and out[0]["frame_idx"] == -1
    assert out[0]["error"] != ""
