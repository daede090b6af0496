#!/usr/bin/env python
"""Local stand-in for the driver's CORRECTNESS check: run selected
`queries()` entries and their `oracle_sql()` twins at sf0.01 (or
$GRAFT_SF_DIR) and value-compare after sorting columns by name and rows
by all columns — the same normalization the driver hashes under.

Usage: python scripts/check_contract.py [query ...]   (default: all)
"""

from __future__ import annotations

import os
import sys
import time


def _norm(df):
    import pandas as pd

    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    df = df.sort_values(list(df.columns), kind="mergesort",
                        na_position="last")
    return df.reset_index(drop=True)


def _to_pandas(obj):
    import pandas as pd
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def main() -> int:
    import duckdb
    import pandas as pd
    import ray

    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.01")
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(
            os.environ.get("RAY_GRAFT_CPUS", "16")),
            include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    names = sys.argv[1:] or list(qs)
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    failures = 0
    for name in names:
        if name not in qs:
            print(f"{name}: NO SUCH QUERY")
            failures += 1
            continue
        t0 = time.time()
        try:
            got = _norm(_to_pandas(qs[name](sf_dir)))
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ENGINE ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        wall = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(got)} ({wall:.1f}s) [rows-only, "
                  "no oracle]")
            continue
        try:
            want = _norm(con.execute(oracles[name]).fetchdf())
        except Exception as e:  # noqa: BLE001
            print(f"{name}: ORACLE ERROR {type(e).__name__}: {e}")
            failures += 1
            continue
        status = "OK"
        if len(got) != len(want):
            status = f"ROWS {len(got)} != {len(want)}"
        elif list(got.columns) != list(want.columns):
            status = f"SCHEMA {list(got.columns)} != {list(want.columns)}"
        else:
            try:
                pd.testing.assert_frame_equal(
                    got, want, check_dtype=False, check_exact=False,
                    rtol=0, atol=1e-9)
            except AssertionError as e:
                status = "VALUES DIFFER: " + str(e).split("\n")[0]
        print(f"{name}: {status} rows={len(got)} ({wall:.1f}s)")
        if status != "OK":
            failures += 1
    return 1 if failures else 0


if __name__ == "__main__":
    rc = main()
    import ray
    ray.shutdown()
    sys.exit(rc)
