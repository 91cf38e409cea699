"""Explicit url-hash partitioning (north_rule: "explicit repartitioning by
url-hash"; SURVEY.md §4.2 item 1).

The hash is md5-based (process- and engine-independent — Python's ``hash()``
is salted per process and MUST NOT be used for partitioning):

    bucket(url) = int(md5(url)[:8 hex], 16) % num_buckets

md5 rather than a faster hash because the DuckDB oracle can compute the
identical bucket (``strtol(substr(md5(url),1,8),16) % B``), making the
partitioner itself correctness-checkable.

Two layouts:
- ``with_url_hash``: adds ``url_hash``/``bucket`` columns vectorized (the
  partitioning key reused across stages — ONE key for dedup, checkpointing
  and output layout, per the shuffle-minimization rule).
- ``write_partitioned``: hash-partitioned Parquet output via
  ``partition_cols`` — each task appends to its buckets' directories, so
  co-location needs NO all-to-all shuffle; a bucket directory is the
  resume/retry unit. url-hash (not crawl order) decorrelates giant-page
  clusters from single partitions.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

DEFAULT_BUCKETS = 64


def url_bucket(url: str, num_buckets: int = DEFAULT_BUCKETS) -> int:
    return int(hashlib.md5(url.encode()).hexdigest()[:8], 16) % num_buckets


def add_url_hash_batch(t: pa.Table, url_col: str = "url",
                       num_buckets: int = DEFAULT_BUCKETS) -> pa.Table:
    urls = t[url_col].to_pylist()
    hashes = [int(hashlib.md5(u.encode()).hexdigest()[:8], 16) for u in urls]
    buckets = [h % num_buckets for h in hashes]
    return t.append_column(
        "url_hash", pa.array(hashes, type=pa.int64())
    ).append_column("bucket", pa.array(buckets, type=pa.int32()))


def with_url_hash(ds: "ray.data.Dataset", url_col: str = "url",
                  num_buckets: int = DEFAULT_BUCKETS) -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: add_url_hash_batch(t, url_col, num_buckets),
        batch_format="pyarrow",
    )


def write_partitioned(ds: "ray.data.Dataset", out_dir: str,
                      url_col: str = "url",
                      num_buckets: int = DEFAULT_BUCKETS) -> None:
    """Hash-partitioned output layout: out_dir/bucket=K/*.parquet.

    No shuffle: every task writes rows into the directories of the buckets it
    holds. Readers prune with read_parquet(out_dir, filter=bucket == k)."""
    with_url_hash(ds, url_col, num_buckets).write_parquet(
        out_dir, partition_cols=["bucket"]
    )


def bucket_filter(ds: "ray.data.Dataset", bucket: int, url_col: str = "url",
                  num_buckets: int = DEFAULT_BUCKETS) -> "ray.data.Dataset":
    """Row-level bucket selection for hash-granular resume (costs a scan —
    prefer file-granular checkpoint partitions when the input is many files,
    engine/checkpoint.py)."""

    def keep(t: pa.Table) -> pa.Table:
        urls = t[url_col].to_pylist()
        mask = pa.array(
            [url_bucket(u, num_buckets) == bucket for u in urls]
        )
        return t.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


def stable_split_batch(t: pa.Table, id_col: str = "doc_id",
                      train_pct: int = 80, val_pct: int = 10,
                      salt: str = "split") -> pa.Table:
    """Deterministic train/val/test assignment — the stable-split primitive
    of a training-data pipeline: membership depends only on (salt, id), so
    it is reproducible across runs/engines and shards never migrate when the
    corpus grows. Same md5 discipline as the url partitioner (SQL-checkable:
    ``CAST('0x'||substr(md5(salt||':'||id),1,8) AS BIGINT) % 100``)."""
    ids = t[id_col].to_pylist()
    pcts = [
        int(hashlib.md5(f"{salt}:{i}".encode()).hexdigest()[:8], 16) % 100
        for i in ids
    ]
    split = [
        "train" if p < train_pct else
        ("val" if p < train_pct + val_pct else "test")
        for p in pcts
    ]
    return t.append_column("split", pa.array(split, type=pa.string()))


def stable_split(ds: "ray.data.Dataset", id_col: str = "doc_id",
                 train_pct: int = 80, val_pct: int = 10,
                 salt: str = "split") -> "ray.data.Dataset":
    return ds.map_batches(
        lambda t: stable_split_batch(t, id_col, train_pct, val_pct, salt),
        batch_format="pyarrow",
    )
