"""Local stand-in for the driver's correctness gate: run every queries()
entry at sf0.01 side-by-side with its oracle_sql() in DuckDB and compare
row count, column names, and order-insensitive values.

Run:  python scripts/check_oracle.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np
import pandas as pd
import ray

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    if hasattr(res, "to_pandas"):
        return res.to_pandas()
    raise TypeError(type(res))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype(np.int64)
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype(np.float64).round(9)
    return df.sort_values(list(df.columns), kind="stable").reset_index(drop=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    import __ray_entry__ as e
    qs = e.queries()
    sqls = e.oracle_sql()

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            mine = canon(to_df(fn(sf_dir)))
        except Exception as ex:
            print(f"[FAIL] {name}: ray query raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        if name not in sqls:
            print(f"[rows-only] {name}: {len(mine)} rows, "
                  f"cols={list(mine.columns)}")
            continue
        try:
            oracle = canon(con.execute(sqls[name]).fetchdf())
        except Exception as ex:
            print(f"[FAIL] {name}: oracle raised {type(ex).__name__}: {ex}")
            failures += 1
            continue
        ok_rows = len(mine) == len(oracle)
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(mine, oracle, check_dtype=False,
                                              check_exact=False, rtol=0, atol=1e-9)
                ok_vals = True
            except AssertionError as ex:
                msg = str(ex).splitlines()[:6]
        if ok_rows and ok_cols and ok_vals:
            print(f"[OK]   {name}: {len(mine)} rows")
        else:
            failures += 1
            print(f"[FAIL] {name}: rows {len(mine)} vs {len(oracle)}; "
                  f"cols {list(mine.columns)} vs {list(oracle.columns)}")
            if ok_rows and ok_cols:
                print("       " + " / ".join(msg))
                diff = (mine != oracle) & ~(mine.isna() & oracle.isna())
                bad = diff.any(axis=1)
                print(mine[bad].head(3))
                print(oracle[bad].head(3))
    ray.shutdown()
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
