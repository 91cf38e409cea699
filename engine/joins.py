"""Explicit partitioned hash join — both sides large (SURVEY.md §2.5).

The reference has no relational joins (its only lookup is the job_id point
lookup); this is the scale primitive for when BOTH sides are too big to
broadcast: tag + bucket each side by ``hash(key) % num_buckets``, union the
two streams, hash-partition once on the bucket column, and merge matching
buckets pairwise inside ``map_groups``. One all-to-all exchange total.

Partitioning assumptions (documented per the custom-operator rule):
- the join key hashes uniformly (int keys use a Fibonacci multiplier, strings
  use md5 — never Python ``hash()``, which is per-process salted);
- a single bucket's rows fit in one worker's heap — size ``num_buckets`` so
  max(bucket) ≈ a block; salt hot keys into sub-buckets before calling this
  if one key alone exceeds that (key skew is the caller's knowledge).

Broadcast joins (small side) live in engine/queries.py (AttachSegment); use
those whenever one side fits in the object store — no shuffle at all.
"""

from __future__ import annotations

import hashlib

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

_FIB = 0x9E3779B97F4A7C15


def _bucket_of_column(col: pa.ChunkedArray | pa.Array, num_buckets: int) -> pa.Array:
    typ = col.type
    if pa.types.is_integer(typ):
        import numpy as np

        arr = pc.cast(col, pa.uint64()).to_numpy(zero_copy_only=False)
        arr = arr.astype(np.uint64)
        v = arr ^ (arr >> np.uint64(33))
        v = v * np.uint64(_FIB)  # wraps mod 2^64 (numpy semantics)
        v ^= v >> np.uint64(29)
        return pa.array((v % np.uint64(num_buckets)).astype(np.int32))
    # strings / binary: md5 (engine.partition policy)
    out = [
        int(hashlib.md5(str(v).encode()).hexdigest()[:8], 16) % num_buckets
        for v in col.to_pylist()
    ]
    return pa.array(out, type=pa.int32())


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset", on: str,
              num_buckets: int = 32, how: str = "inner",
              suffixes: tuple[str, str] = ("", "_r")) -> "ray.data.Dataset":
    """Partitioned hash join of two Datasets on column ``on``.

    Returns a Dataset with pandas-merge column semantics (shared non-key
    columns get ``suffixes``). ``how`` ∈ inner|left|right|outer.
    """
    l_schema = left.schema()
    r_schema = right.schema()
    l_names = list(l_schema.names)
    r_names = list(r_schema.names)
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    all_names = l_names + [n for n in r_names if n not in l_names]

    def _prep(side: int, own: list[str], other: list[str],
              other_types: dict) -> object:
        def f(t: pa.Table) -> pa.Table:
            n = t.num_rows
            cols = {name: t[name] for name in own}
            for name in other:
                if name not in cols:
                    cols[name] = pa.nulls(n, type=other_types[name])
            cols["__side"] = pa.array([side] * n, type=pa.int8())
            cols["__bucket"] = _bucket_of_column(t[on], num_buckets)
            return pa.table({name: cols[name] for name in all_names}
                            | {"__side": cols["__side"],
                               "__bucket": cols["__bucket"]})

        return f

    tagged = left.map_batches(
        _prep(0, l_names, r_names, r_types), batch_format="pyarrow"
    ).union(
        right.map_batches(
            _prep(1, r_names, l_names, l_types), batch_format="pyarrow"
        )
    )

    def merge_bucket(g: pd.DataFrame) -> pd.DataFrame:
        lg = g[g["__side"] == 0][l_names].copy()
        rg = g[g["__side"] == 1][r_names].copy()
        # the null-padding floatified integer columns on the way through
        # pandas; restore them (each side's own columns are null-free here)
        for frame, types in ((lg, l_types), (rg, r_types)):
            for name, typ in types.items():
                if name in frame and pa.types.is_integer(typ) \
                        and frame[name].dtype == "float64":
                    frame[name] = frame[name].astype("int64")
        return lg.merge(rg, on=on, how=how, suffixes=suffixes)

    return tagged.groupby("__bucket").map_groups(merge_bucket,
                                                 batch_format="pandas")
