"""ORC + Arrow-IPC connectors: typed roundtrip fidelity, nulls,
multi-file layout, empty-dir behavior."""

import numpy as np
import pyarrow as pa
import pytest


def _table(n=200, seed=7):
    rng = np.random.default_rng(seed)
    vals = rng.normal(size=n)
    ints = pa.array(np.where(np.arange(n) % 9 == 0, None,
                             rng.integers(0, 1 << 40, n)).tolist(),
                    type=pa.int64())
    return pa.table({
        "id": pa.array(np.arange(n), type=pa.int64()),
        "f": pa.array(vals, type=pa.float64()),
        "s": pa.array([f"row-{i}" if i % 7 else None for i in range(n)]),
        "big": ints,
        "ts": pa.array([1700000000000000 + i for i in range(n)],
                       type=pa.timestamp("us")),
    })


@pytest.mark.parametrize("mod", ["orc", "ipc"])
def test_roundtrip_fidelity(ray_session, mod, tmp_path):
    import ray.data

    if mod == "orc":
        from smartreader_ray.sources.orc import read_orc as rd
        from smartreader_ray.sources.orc import write_orc as wr
    else:
        from smartreader_ray.sources.ipc import read_ipc as rd
        from smartreader_ray.sources.ipc import write_ipc as wr

    t = _table()
    out = str(tmp_path / mod)
    wr(ray.data.from_arrow(t).repartition(5), out)
    import os
    assert len(os.listdir(out)) >= 2  # multi-file layout, no funnel
    back = rd(out).to_pandas().sort_values("id").reset_index(drop=True)
    want = t.to_pandas().sort_values("id").reset_index(drop=True)
    # ORC's type system stores timestamps at ns — value-preserving for
    # us inputs; normalize the unit before the exact compare
    back["ts"] = back["ts"].astype("datetime64[us]")
    import pandas as pd
    pd.testing.assert_frame_equal(back[want.columns.tolist()], want)
