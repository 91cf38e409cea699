"""Checkpoint store: partition manifests, atomic commit, resume, GC.

Replaces the reference's nothing (its in-memory jobs_store dies on restart,
app/main.py:97; temp files are GC'd blind after 24 h, app/main.py:301-343).
SURVEY.md §4.2 items 4-5.

Layout (resumable output — one directory per partition, never one giant file):

    out_dir/
      part-00007/*.parquet          extracted rows of partition 7
      _manifest/part-00007.json     lineage + metrics, written AFTER the data

Partitions are **file-granular**: the input parquet files are split into
``num_partitions`` contiguous groups, so each partition re-reads only its own
files on retry (no P× re-scan of the whole input). Atomicity: data is written
to ``part-NNNNN.tmp`` then renamed; the manifest is written tmp+rename after
the data rename — a crash at any point leaves either a complete committed
partition or an ignorable tmp dir.

On resume, completed partitions are skipped via the manifest 'done' set — the
§2.5 anti-join, implemented as a driver-side broadcast set because the
manifest is tiny (one row per partition).
"""

from __future__ import annotations

import json
import os
import shutil
import time

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

import ray.data

from engine.pipeline import PipelineConfig, extract_pages
from engine.schema import MANIFEST


def _settle_fsspec_http_import() -> None:
    """Ray's parquet path resolution probes ``fsspec.implementations.http``
    on every read/write. With aiohttp absent that import always fails —
    harmlessly (ModuleNotFoundError → "not http") when sequential, but two
    run_extraction partitions resolving paths CONCURRENTLY can race the
    retried import and leave a half-initialized module in sys.modules,
    after which every later call in the process dies with a bare
    ImportError Ray doesn't catch. Settle it once at import time: if the
    dependency is missing, register a minimal stub whose sentinel class
    keeps Ray's isinstance() checks returning False."""
    try:
        from fsspec.implementations.http import HTTPFileSystem  # noqa: F401
    except ModuleNotFoundError:
        import sys
        import types

        mod = types.ModuleType("fsspec.implementations.http")

        class HTTPFileSystem:  # sentinel — nothing is ever an instance
            pass

        mod.HTTPFileSystem = HTTPFileSystem
        sys.modules["fsspec.implementations.http"] = mod
    except ImportError:
        pass  # already settled by an earlier racer; leave it alone


_settle_fsspec_http_import()


def plan_partitions(input_paths: list[str], num_partitions: int) -> list[list[str]]:
    """Split input files into ≤ num_partitions contiguous, sorted groups."""
    paths = sorted(input_paths)
    num_partitions = min(num_partitions, len(paths))
    per = (len(paths) + num_partitions - 1) // num_partitions
    return [paths[i : i + per] for i in range(0, len(paths), per)]


def _manifest_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_manifest")


def _manifest_path(out_dir: str, pid: int) -> str:
    return os.path.join(_manifest_dir(out_dir), f"part-{pid:05d}.json")


def part_dir(out_dir: str, pid: int) -> str:
    return os.path.join(out_dir, f"part-{pid:05d}")


def load_manifest(out_dir: str) -> list[dict]:
    mdir = _manifest_dir(out_dir)
    if not os.path.isdir(mdir):
        return []
    rows = []
    for name in sorted(os.listdir(mdir)):
        if name.startswith("part-") and name.endswith(".json"):
            with open(os.path.join(mdir, name)) as f:
                rows.append(json.load(f))
    return rows


def manifest_table(out_dir: str) -> pa.Table:
    rows = load_manifest(out_dir)
    if not rows:
        return MANIFEST.empty_table()
    return pa.Table.from_pylist(rows, schema=MANIFEST)


def done_partitions(out_dir: str) -> set[int]:
    return {m["partition_id"] for m in load_manifest(out_dir) if m.get("done")}


def _atomic_write_json(path: str, payload: dict) -> None:
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(payload, f)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def _parquet_files(root: str) -> list[str]:
    out = []
    for dirpath, _dirs, names in os.walk(root):
        out.extend(os.path.join(dirpath, n) for n in names if n.endswith(".parquet"))
    return sorted(out)


def _partition_metrics(pdir: str) -> tuple[int, int, int]:
    """(rows, rows_ok, rows_err) from the committed partition files —
    column-pruned read of just 'status'."""
    rows = ok = 0
    for path in _parquet_files(pdir):
        t = pq.read_table(path, columns=["status"])
        rows += t.num_rows
        ok += pc.sum(pc.cast(pc.equal(t["status"], "ok"), pa.int64())).as_py() or 0
    return rows, ok, rows - ok


def run_extraction(
    input_paths: list[str] | str,
    out_dir: str,
    cfg: PipelineConfig = PipelineConfig(),
    num_partitions: int = 16,
    resume: bool = True,
    url_hash_buckets: int = 0,
    max_in_flight: int = 2,
) -> pa.Table:
    """Checkpointed extraction over parquet shards; returns the manifest table.

    Up to ``max_in_flight`` partitions execute concurrently on this driver
    (each is internally a fully parallel streaming Dataset; Ray's streaming
    executors share the cluster's resource manager, so while partition P
    drains through its write ramp, P+1's read ramp is already filling the
    pool — strictly sequential partitions idled the cluster at every
    boundary). Each partition's commit protocol is unchanged and
    independent: tmp-dir write → rename → manifest-after-data, so crash
    atomicity and resume semantics are exactly the sequential ones. On a
    multi-node deployment each partition is one `ray job submit` unit or
    several drivers share the partition list — the manifest protocol is
    what coordinates them.
    """
    if isinstance(input_paths, str):
        input_paths = [
            os.path.join(input_paths, n)
            for n in os.listdir(input_paths)
            if n.endswith(".parquet")
        ]
    os.makedirs(_manifest_dir(out_dir), exist_ok=True)
    done = done_partitions(out_dir) if resume else set()

    def run_partition(pid: int, files: list[str]) -> None:
        t0 = time.time()
        bytes_in = sum(os.path.getsize(f) for f in files)
        pdir = part_dir(out_dir, pid)
        tmp_dir = pdir + ".tmp"
        shutil.rmtree(tmp_dir, ignore_errors=True)
        shutil.rmtree(pdir, ignore_errors=True)  # partial from a dead run

        pages = ray.data.read_parquet(files, columns=["url", "html"])
        extracted = extract_pages(pages, cfg)
        if url_hash_buckets > 0:
            # §4.2 item 1: url-hash layout inside each checkpoint partition
            # (engine.partition; no shuffle — tasks append to bucket dirs)
            from engine.partition import with_url_hash

            with_url_hash(extracted, num_buckets=url_hash_buckets).write_parquet(
                tmp_dir, partition_cols=["bucket"]
            )
        else:
            extracted.write_parquet(tmp_dir)
        os.replace(tmp_dir, pdir)

        rows, ok, err = _partition_metrics(pdir)
        _atomic_write_json(
            _manifest_path(out_dir, pid),
            {
                "partition_id": pid,
                "rows_in": rows,
                "rows_ok": ok,
                "rows_err": err,
                "bytes_in": bytes_in,
                "wall_s": time.time() - t0,
                "output_path": pdir,
                "done": True,
            },
        )

    todo = [(pid, files)
            for pid, files in enumerate(plan_partitions(input_paths,
                                                        num_partitions))
            if pid not in done]
    if max_in_flight <= 1 or len(todo) <= 1:
        for pid, files in todo:
            run_partition(pid, files)
    else:
        from concurrent.futures import (FIRST_EXCEPTION, ThreadPoolExecutor,
                                        wait)

        with ThreadPoolExecutor(max_workers=max_in_flight) as pool:
            # fail fast like the sequential path: on the first partition
            # failure, cancel every QUEUED partition (pool.map would let
            # all of them run to completion before re-raising); only the
            # ≤ max_in_flight already-running ones drain. Completed
            # partitions stay committed — resume picks up from there.
            futs = [pool.submit(run_partition, pid, files)
                    for pid, files in todo]
            done_f, not_done = wait(futs, return_when=FIRST_EXCEPTION)
            errs = [f.exception() for f in done_f if f.exception()]
            if errs:
                for f in not_done:
                    f.cancel()
                raise errs[0]
    return manifest_table(out_dir)


def read_extracted(out_dir: str) -> "ray.data.Dataset":
    """S4 analog — results are queryable, not re-served (SURVEY.md §2.1 S4).

    Projects to exactly the EXTRACTED schema columns: bucketed runs
    (url_hash_buckets > 0) write hive ``bucket=N/`` dirs and keep the helper
    ``url_hash`` column, which would otherwise leak schema differences into
    downstream consumers depending on how the run was written."""
    from engine.schema import EXTRACTED

    files = sorted(
        f
        for d in os.listdir(out_dir)
        if d.startswith("part-") and d != "_manifest" and not d.endswith(".tmp")
        for f in _parquet_files(os.path.join(out_dir, d))
    )
    return ray.data.read_parquet(files).select_columns(list(EXTRACTED.names))


def gc_runs(root_dir: str, retention_hours: float = 24.0) -> int:
    """S5 analog of cleanup_old_temp_files (app/main.py:301-343): drop whole
    run directories whose newest manifest is older than the retention window.
    Returns the number of runs deleted (A4 cleanup count)."""
    if not os.path.isdir(root_dir):
        return 0
    cutoff = time.time() - retention_hours * 3600
    deleted = 0
    for name in os.listdir(root_dir):
        run_dir = os.path.join(root_dir, name)
        mdir = _manifest_dir(run_dir)
        if not os.path.isdir(mdir):
            continue
        newest = max(
            (os.path.getmtime(os.path.join(mdir, f)) for f in os.listdir(mdir)),
            default=0,
        )
        if newest < cutoff:
            shutil.rmtree(run_dir, ignore_errors=True)
            deleted += 1
    return deleted
