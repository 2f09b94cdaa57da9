"""Set-ops by content (functions/setops.py) + z-score (standardize.py)."""

import math

import pyarrow as pa
import pytest

from smartreader_ray.functions.setops import (
    except_by_content,
    intersect_by_content,
)
from smartreader_ray.functions.standardize import zscore_by


def _left():
    return pa.table(
        {
            "doc_id": pa.array([10, 11, 12, 13], type=pa.int64()),
            "text": ["shared one", "only left", "shared one", "shared two"],
        }
    )


def _right():
    return pa.table(
        {
            "doc_id": pa.array([1, 2], type=pa.int64()),
            "text": ["shared one", "shared two"],
        }
    )


def test_except_by_content(ray_session):
    import ray.data

    out = except_by_content(
        ray.data.from_arrow(_left()), ray.data.from_arrow(_right())
    ).take_all()
    # only "only left" survives; one row per distinct content
    assert [r["doc_id"] for r in out] == [11]


def test_intersect_by_content_min_id(ray_session):
    import ray.data

    out = intersect_by_content(
        ray.data.from_arrow(_left()), ray.data.from_arrow(_right())
    ).take_all()
    # "shared one" → min(10, 12) = 10; "shared two" → 13
    assert sorted(r["doc_id"] for r in out) == [10, 13]


def test_intersect_right_duplicates_no_pair_blowup(ray_session):
    import ray.data

    right_dup = pa.table(
        {
            "doc_id": pa.array(list(range(50)), type=pa.int64()),
            "text": ["shared one"] * 50,
        }
    )
    out = intersect_by_content(
        ray.data.from_arrow(_left()), ray.data.from_arrow(right_dup)
    ).take_all()
    assert sorted(r["doc_id"] for r in out) == [10]


def test_zscore_exact_values(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
            "lang": ["en", "en", "en", "fr"],
            "n_chars": pa.array([10, 20, 30, 7], type=pa.int64()),
        }
    )
    out = zscore_by(ray.data.from_arrow(t), "lang", "n_chars").take_all()
    by_id = {r["doc_id"]: r["z"] for r in out}
    std = math.sqrt((100 + 400 + 900) / 3 - 20.0**2)
    assert by_id[0] == round((10 - 20.0) / std, 6)
    assert by_id[1] == 0.0
    assert by_id[2] == round((30 - 20.0) / std, 6)
    # single-value key: variance 0 → null
    assert by_id[3] is None


def test_zscore_key_guard(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "lang": ["en", "fr"],
            "n_chars": pa.array([1, 2], type=pa.int64()),
        }
    )
    with pytest.raises(NotImplementedError):
        zscore_by(ray.data.from_arrow(t), "lang", "n_chars",
                  broadcast_keys_max=1)


def test_zscore_overflow_guard(ray_session):
    import ray.data

    t = pa.table(
        {
            "doc_id": pa.array([0, 1], type=pa.int64()),
            "lang": ["en", "en"],
            "n_chars": pa.array([4_000_000_000, 1], type=pa.int64()),
        }
    )
    with pytest.raises(Exception):  # OverflowError surfaces as RayTaskError
        zscore_by(ray.data.from_arrow(t), "lang", "n_chars").take_all()
