"""Local replica of the driver's correctness gate.

Runs every queries()[name](sf_dir) via Ray AND oracle_sql()[name] via DuckDB
over the same parquet tables, then compares row count, column names, and an
order-insensitive value hash (columns sorted by name, rows sorted by all
columns, values stringified with float rounding).

Usage: python scripts/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(obj) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(obj, pd.DataFrame):
        return obj
    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    return obj.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64":
            df[c] = df[c].round(9)
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("int32", "uint32", "int16"):
            df[c] = df[c].astype("int64")
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")

    qs, sqls = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = canon(to_pandas(fn(sf_dir)))
        except Exception as exc:
            print(f"FAIL {name}: ray query raised {type(exc).__name__}: {exc}")
            failures.append(name)
            continue
        sql = sqls.get(name)
        if sql is None:
            print(f"ROWS-ONLY {name}: rows={len(got)} cols={list(got.columns)}")
            continue
        try:
            exp = canon(con.execute(sql).fetchdf())
        except Exception as exc:
            print(f"FAIL {name}: oracle SQL raised {exc}")
            failures.append(name)
            continue
        if list(got.columns) != list(exp.columns):
            print(f"FAIL {name}: columns {list(got.columns)} vs {list(exp.columns)}")
            failures.append(name)
            continue
        if len(got) != len(exp):
            print(f"FAIL {name}: rows {len(got)} vs {len(exp)}")
            failures.append(name)
            continue
        if not got.astype(str).equals(exp.astype(str)):
            neq = (got.astype(str) != exp.astype(str)).any(axis=1)
            print(f"FAIL {name}: {neq.sum()} mismatched rows; first:")
            idx = neq[neq].index[0]
            print("  ray   :", got.loc[idx].to_dict())
            print("  oracle:", exp.loc[idx].to_dict())
            failures.append(name)
            continue
        print(f"OK   {name}: rows={len(got)}")
    ray.shutdown()
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
