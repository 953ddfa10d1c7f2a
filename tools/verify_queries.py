"""Local replica of the driver's correctness gate: run every queries() entry
at a given sf_dir and compare against oracle_sql() via DuckDB — row count,
column names, and order-insensitive values (sorted by all columns).

Usage: python tools/verify_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
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


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> str:
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        return f"SCHEMA MISMATCH ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}"
    if len(ray_df) != len(sql_df):
        return f"ROWCOUNT MISMATCH ray={len(ray_df)} sql={len(sql_df)}"
    a, b = canon(ray_df), canon(sql_df)
    for c in a.columns:
        av, bv = a[c], b[c]
        if pd.api.types.is_float_dtype(av) or pd.api.types.is_float_dtype(bv):
            import numpy as np

            if not np.allclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9, equal_nan=True):
                bad = int(np.argmax(~np.isclose(av.astype(float), bv.astype(float), rtol=0, atol=1e-9)))
                return f"VALUE MISMATCH col={c} row={bad} ray={av.iloc[bad]} sql={bv.iloc[bad]}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                bad = (av.astype(str) != bv.astype(str)).idxmax()
                return f"VALUE MISMATCH col={c} row={bad} ray={av[bad]!r} sql={bv[bad]!r}"
    return "OK"


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    sqls = entry.oracle_sql()
    results = {}
    import time

    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as e:
            results[name] = f"RAY ERROR {type(e).__name__}: {str(e)[:200]}"
            print(f"{name:38s} {results[name]}")
            continue
        if name in sqls:
            try:
                sql_df = con.sql(sqls[name]).df()
            except Exception as e:
                results[name] = f"SQL ERROR {type(e).__name__}: {str(e)[:200]}"
                print(f"{name:38s} {results[name]}")
                continue
            results[name] = compare(name, ray_df, sql_df)
        else:
            results[name] = f"rows-only ({len(ray_df)} rows)"
        print(f"{name:38s} {results[name]}  [{time.time()-t0:.1f}s]")

    bad = [n for n, r in results.items() if r not in ("OK",) and not r.startswith("rows-only")]
    print(f"\n{len(results)-len(bad)}/{len(results)} ok; failures: {bad}")
    ray.shutdown()


if __name__ == "__main__":
    main()
