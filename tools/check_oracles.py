"""Local stand-in for the driver's correctness gate.

Runs every ``queries()`` entry and, where an ``oracle_sql()`` twin exists,
compares row count + sorted-column schema + order-insensitive value hash
against DuckDB — the same comparison shape the driver applies at sf=0.01.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    from ray.data import Dataset

    if isinstance(res, Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def value_hash(df: pd.DataFrame) -> str:
    """Order-insensitive: sort columns by name, sort rows by all columns,
    hash the stable string repr of values."""
    import hashlib

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    df = df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)
    h = hashlib.blake2b(digest_size=12)
    for c in df.columns:
        col = df[c]
        if np.issubdtype(col.dtype, np.floating):
            h.update(np.ascontiguousarray(col.to_numpy()).tobytes())
        else:
            h.update("\x1f".join(map(str, col.tolist())).encode())
    return h.hexdigest()


def main() -> int:
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        wall = time.perf_counter() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(got)} rows ({wall:.1f}s) [no oracle]")
            continue
        want = con.sql(oracles[name]).df()
        ok_rows = len(got) == len(want)
        schema_g = {c: str(got[c].dtype) for c in sorted(got.columns)}
        schema_w = {c: str(want[c].dtype) for c in sorted(want.columns)}
        ok_schema = sorted(got.columns) == sorted(want.columns)
        ok_hash = ok_rows and ok_schema and value_hash(got) == value_hash(want)
        status = "OK   " if (ok_rows and ok_schema and ok_hash) else "FAIL "
        if status.startswith("FAIL"):
            failures.append(name)
        print(f"{status} {name}: rows {len(got)}/{len(want)} schema={'ok' if ok_schema else (schema_g, schema_w)} hash={'ok' if ok_hash else 'MISMATCH'} ({wall:.1f}s)")
        if not ok_hash and ok_rows and ok_schema:
            merged = got[sorted(got.columns)].sort_values(sorted(got.columns)).reset_index(drop=True)
            mw = want[sorted(want.columns)].sort_values(sorted(want.columns)).reset_index(drop=True)
            for c in merged.columns:
                a, b = merged[c], mw[c]
                if a.dtype != b.dtype:
                    print(f"    dtype diff {c}: {a.dtype} vs {b.dtype}")
                try:
                    neq = (a != b)
                    if neq.any():
                        i = int(np.nonzero(neq.to_numpy())[0][0])
                        print(f"    first diff {c}@{i}: {a.iloc[i]!r} vs {b.iloc[i]!r}")
                except Exception:
                    pass
    print(f"\n{len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
