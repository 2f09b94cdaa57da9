"""Local stand-in for the driver's correctness gate: run each queries()
entry and its oracle_sql() side-by-side on one sf dir and compare
row-count, schema (column names), and an order-insensitive value hash.

Usage: python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def to_pandas(result):
    import pandas as pd
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def value_hash(df) -> str:
    import pandas as pd

    df = df.reindex(sorted(df.columns), axis=1)
    rows = []
    for row in df.itertuples(index=False):
        cells = []
        for v in row:
            if isinstance(v, float):
                cells.append(f"{v:.9g}")
            else:
                cells.append(str(v))
        rows.append("\x1f".join(cells))
    rows.sort()
    return hashlib.sha256("\x1e".join(rows).encode()).hexdigest()[:16]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import duckdb
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            import time

            t0 = time.time()
            got = to_pandas(fn(sf_dir))
            dt = time.time() - t0
        except Exception as exc:
            import traceback

            traceback.print_exc()
            print(f"FAIL {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        if name not in oracles:
            print(f"ok   {name}: rows={len(got)} (rows-only, {dt:.1f}s)")
            if len(got) == 0 and name not in ("embed_neardup_lsh",):
                print(f"     WARNING: zero rows")
            continue
        exp = con.sql(oracles[name]).df()
        ok_rows = len(got) == len(exp)
        ok_cols = sorted(got.columns) == sorted(exp.columns)
        ok_hash = value_hash(got) == value_hash(exp) if ok_rows and ok_cols else False
        status = "ok  " if (ok_rows and ok_cols and ok_hash) else "FAIL"
        if status == "FAIL":
            failures += 1
        print(
            f"{status} {name}: rows {len(got)}/{len(exp)} cols_ok={ok_cols} "
            f"hash_ok={ok_hash} ({dt:.1f}s)"
        )
        if not ok_cols:
            print(f"     got  cols: {sorted(got.columns)}")
            print(f"     want cols: {sorted(exp.columns)}")
        elif not ok_hash and ok_rows:
            merged = _first_diff(got, exp)
            if merged is not None:
                print(f"     first diff:\n{merged}")
    sys.exit(1 if failures else 0)


def _first_diff(got, exp):
    import pandas as pd

    g = got.reindex(sorted(got.columns), axis=1)
    e = exp.reindex(sorted(exp.columns), axis=1)
    key = list(g.columns)[0]
    try:
        g = g.sort_values(list(g.columns)).reset_index(drop=True)
        e = e.sort_values(list(e.columns)).reset_index(drop=True)
        neq = (g != e) & ~(g.isna() & e.isna())
        bad = neq.any(axis=1)
        if bad.any():
            i = bad.idxmax()
            return pd.concat([g.loc[[i]], e.loc[[i]]], keys=["got", "exp"])
    except Exception:
        return None
    return None


if __name__ == "__main__":
    main()
