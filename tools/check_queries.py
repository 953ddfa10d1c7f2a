"""Local driver-style correctness check: run selected queries() vs oracle_sql()
with DuckDB over an sf dir and report rows/schema/value-hash matches.

Usage: python tools/check_queries.py [sf_dir] [query ...]
"""

from __future__ import annotations

import hashlib
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
ONLY = sys.argv[2:] if len(sys.argv) > 2 else None

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(res, pd.DataFrame):
        return res
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res.to_pandas()  # ray Dataset


def _canon(v):
    import numpy as np

    if isinstance(v, (np.integer, int)):
        return int(v)
    if isinstance(v, (np.floating, float)):
        return round(float(v), 9)
    return str(v)


def value_hash(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)]
    rows = sorted(tuple(_canon(x) for x in r)
                  for r in df.itertuples(index=False, name=None))
    h = hashlib.sha256()
    for r in rows:
        h.update(repr(r).encode())
    return h.hexdigest()[:16]


def main():
    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("GRAFT_CHECK_CPUS", "8")),
                 include_dashboard=False, logging_level="ERROR")
    import ray.data as _rd

    _rd.DataContext.get_current().enable_progress_bars = False

    from nhse_probabilistic_linkage_ray.pipelines.queries import oracle_sql, queries

    con = duckdb.connect()
    for t in TABLES:
        p = f"{SF}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

    qs, sqls = queries(), oracle_sql()
    names = ONLY or list(qs)
    for name in names:
        if name not in sqls:
            print(f"{name}: (no oracle)")
            continue
        try:
            mine = to_pandas(qs[name](SF))
            orc = con.execute(sqls[name]).fetchdf()
            schema_ok = sorted(mine.columns) == sorted(orc.columns)
            rows_ok = len(mine) == len(orc)
            hash_ok = value_hash(mine) == value_hash(orc) if schema_ok else False
            flag = "OK " if (schema_ok and rows_ok and hash_ok) else "FAIL"
            print(f"{flag} {name}: rows {len(mine)}/{len(orc)} schema={schema_ok} hash={hash_ok}")
            if flag == "FAIL":
                print("  mine:", mine.head(3).to_dict("records"))
                print("  orc: ", orc.head(3).to_dict("records"))
                print("  mine dtypes:", dict(mine.dtypes.astype(str)))
                print("  orc dtypes: ", dict(orc.dtypes.astype(str)))
        except Exception as e:
            import traceback
            print(f"ERR {name}: {type(e).__name__}: {e}")
            traceback.print_exc()
    ray.shutdown()


if __name__ == "__main__":
    main()
