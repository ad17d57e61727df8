"""Local stand-in for the driver's correctness gate: run every
queries() entry at a given sf and compare to oracle_sql() via DuckDB
(row count + schema + order-insensitive value comparison).

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def to_pandas(res):
    import pyarrow as pa

    try:
        import ray.data

        if isinstance(res, ray.data.Dataset):
            return res.to_pandas()
    except ImportError:
        pass
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    issues = []
    if len(ray_df) != len(sql_df):
        issues.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    a, b = normalize(ray_df.copy()), normalize(sql_df.copy())
    if list(a.columns) != list(b.columns):
        issues.append(f"columns ray={list(a.columns)} sql={list(b.columns)}")
        return issues
    if [str(t) for t in a.dtypes] != [str(t) for t in b.dtypes]:
        issues.append(
            f"dtypes ray={[str(t) for t in a.dtypes]} sql={[str(t) for t in b.dtypes]}"
        )
    if len(a) == len(b):
        try:
            pd.testing.assert_frame_equal(
                a, b, check_dtype=False, check_exact=False, rtol=1e-6, atol=1e-6
            )
        except AssertionError as e:
            issues.append("values: " + str(e).split("\n")[1][:200])
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local", num_cpus=8, include_dashboard=False,
            logging_level="ERROR",
        )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            continue
        dt = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(ray_df)} rows ({dt:.1f}s, no oracle)")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"FAIL  {name}: oracle raised {e}")
            continue
        issues = compare(name, ray_df, sql_df)
        if issues:
            failures.append(name)
            print(f"FAIL  {name} ({dt:.1f}s): " + "; ".join(issues))
        else:
            print(f"ok    {name}: {len(ray_df)} rows ({dt:.1f}s)")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL QUERIES MATCH")


if __name__ == "__main__":
    main()
