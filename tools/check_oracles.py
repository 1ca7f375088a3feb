"""Local stand-in for the driver's correctness gate: run every query in
__ray_entry__.queries() and compare row-count + order-insensitive values
against oracle_sql() via DuckDB. Usage:

    python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, ".")

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(obj) -> pd.DataFrame:
    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        if df[col].dtype == object:
            df[col] = df[col].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    import ray.data
    ray.data.DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entry
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    queries = entry.queries()
    oracles = entry.oracle_sql()
    failures = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL  {name}: query raised {type(exc).__name__}: {exc}")
            failures += 1
            continue
        elapsed = time.time() - t0
        if name not in oracles:
            print(f"rows  {name}: {len(mine)} rows ({elapsed:.1f}s, no oracle)")
            continue
        try:
            theirs = canon(con.sql(oracles[name]).df())
        except Exception as exc:
            print(f"FAIL  {name}: oracle raised {exc}")
            failures += 1
            continue
        if len(mine) != len(theirs):
            print(f"FAIL  {name}: rows {len(mine)} vs oracle {len(theirs)}")
            failures += 1
            continue
        if list(mine.columns) != list(theirs.columns):
            print(f"FAIL  {name}: columns {list(mine.columns)} vs {list(theirs.columns)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(mine, theirs, check_dtype=False)
            print(f"OK    {name}: {len(mine)} rows ({elapsed:.1f}s)")
        except AssertionError as exc:
            print(f"FAIL  {name}: values differ: {str(exc)[:300]}")
            failures += 1
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
