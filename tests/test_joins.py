"""Partitioned hash join tests (engine/joins.py — both sides large)."""

from __future__ import annotations

import pyarrow as pa
import pytest


@pytest.fixture()
def sides(ray_session):
    import ray.data as rd

    left = rd.from_arrow(pa.table({
        "k": [1, 2, 3, 4, 2], "lv": ["a", "b", "c", "d", "b2"],
    }))
    right = rd.from_arrow(pa.table({
        "k": [2, 3, 3, 5], "rv": [20, 30, 31, 50],
    }))
    return left, right


def test_inner_join(sides):
    from engine.joins import hash_join

    left, right = sides
    out = hash_join(left, right, on="k", num_buckets=4).to_pandas()
    got = sorted(map(tuple, out[["k", "lv", "rv"]].values.tolist()))
    assert got == [(2, "b", 20), (2, "b2", 20), (3, "c", 30), (3, "c", 31)]
    assert out["k"].dtype == "int64"  # int dtype survives the bucket merge


def test_outer_join(sides):
    from engine.joins import hash_join

    left, right = sides
    out = hash_join(left, right, on="k", num_buckets=4, how="outer").to_pandas()
    assert len(out) == 7  # 4 matches + k=1,4 left-only + k=5 right-only
    assert set(out["k"]) == {1, 2, 3, 4, 5}


def test_string_keys(ray_session):
    import ray.data as rd

    from engine.joins import hash_join

    ls = rd.from_arrow(pa.table({"s": ["x", "y"], "a": [1, 2]}))
    rs = rd.from_arrow(pa.table({"s": ["y", "z"], "b": [9, 8]}))
    out = hash_join(ls, rs, on="s").to_pandas()
    assert out[["s"]].values.tolist() == [["y"]]


def test_bucket_count_invariance(sides):
    from engine.joins import hash_join

    left, right = sides
    a = hash_join(left, right, on="k", num_buckets=2).to_pandas()
    b = hash_join(left, right, on="k", num_buckets=16).to_pandas()
    key = lambda df: sorted(map(tuple, df[["k", "lv", "rv"]].values.tolist()))
    assert key(a) == key(b)


def test_matches_duckdb_on_testdata(ray_session):
    import duckdb

    import __ray_entry__ as e
    from scripts.check_oracle import canon, to_pandas

    sf = "/root/testdata/sf0.001"
    got = canon(to_pandas(e.queries()["large_join"](sf)))
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    exp = canon(con.execute(e.oracle_sql()["large_join"]).fetchdf())
    assert got.astype(str).equals(exp.astype(str))
