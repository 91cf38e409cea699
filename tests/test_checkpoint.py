"""Checkpoint/resume tests (SURVEY.md §5.2 item 5) + stats layer."""

from __future__ import annotations

import os
import time

import pyarrow as pa
import pyarrow.parquet as pq

from engine import checkpoint as cp
from engine import stats
from engine.fixtures import write_pages_parquet
from engine.pipeline import PipelineConfig

CFG = PipelineConfig(batch_size=16, max_actors=2)


def test_plan_partitions():
    files = [f"f{i}" for i in range(10)]
    parts = cp.plan_partitions(files, 4)
    assert sum(len(p) for p in parts) == 10
    assert [f for p in parts for f in p] == sorted(files)
    assert cp.plan_partitions(["a"], 8) == [["a"]]


def test_run_and_resume(ray_session, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_pages_parquet(src, 80, seed=21, num_files=4)

    manifest = cp.run_extraction(src, out, CFG, num_partitions=4)
    assert manifest.num_rows == 4
    assert all(manifest["done"].to_pylist())
    assert sum(manifest["rows_in"].to_pylist()) == 80

    # capture manifest mtimes, then resume: nothing should recompute
    mtimes = {
        f: os.path.getmtime(os.path.join(out, "_manifest", f))
        for f in os.listdir(os.path.join(out, "_manifest"))
    }
    time.sleep(0.05)
    manifest2 = cp.run_extraction(src, out, CFG, num_partitions=4)
    mtimes2 = {
        f: os.path.getmtime(os.path.join(out, "_manifest", f))
        for f in os.listdir(os.path.join(out, "_manifest"))
    }
    assert mtimes == mtimes2  # completed partitions untouched
    assert manifest2.num_rows == 4


def test_partial_run_resumes_only_missing(ray_session, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_pages_parquet(src, 60, seed=22, num_files=3)

    # clean full run → reference output
    ref_out = str(tmp_path / "ref")
    cp.run_extraction(src, ref_out, CFG, num_partitions=3)
    ref = cp.read_extracted(ref_out).take_all()

    # simulate a killed run: run all, then delete partition 1's manifest AND data
    cp.run_extraction(src, out, CFG, num_partitions=3)
    os.remove(os.path.join(out, "_manifest", "part-00001.json"))
    import shutil

    shutil.rmtree(cp.part_dir(out, 1))
    assert cp.done_partitions(out) == {0, 2}

    cp.run_extraction(src, out, CFG, num_partitions=3)
    assert cp.done_partitions(out) == {0, 1, 2}

    got = cp.read_extracted(out).take_all()
    key = lambda r: (r["url"], r["markdown_text"])
    assert sorted(ref, key=key) == sorted(got, key=key)  # equals a clean run


def test_tmp_dir_from_dead_run_is_cleaned(ray_session, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_pages_parquet(src, 20, seed=23, num_files=1)
    os.makedirs(cp.part_dir(out, 0) + ".tmp")  # orphaned tmp from a crash
    cp.run_extraction(src, out, CFG, num_partitions=1)
    assert not os.path.exists(cp.part_dir(out, 0) + ".tmp")
    assert cp.done_partitions(out) == {0}


def test_gc_runs(tmp_path):
    root = str(tmp_path / "runs")
    old = os.path.join(root, "run_old", "_manifest")
    new = os.path.join(root, "run_new", "_manifest")
    os.makedirs(old)
    os.makedirs(new)
    with open(os.path.join(old, "part-00000.json"), "w") as f:
        f.write("{}")
    with open(os.path.join(new, "part-00000.json"), "w") as f:
        f.write("{}")
    past = time.time() - 48 * 3600
    os.utime(os.path.join(old, "part-00000.json"), (past, past))
    assert cp.gc_runs(root, retention_hours=24) == 1
    assert not os.path.exists(os.path.join(root, "run_old"))
    assert os.path.exists(os.path.join(root, "run_new"))


def test_stats_layer(ray_session, tmp_path):
    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_pages_parquet(src, 60, seed=24, num_files=2)
    manifest = cp.run_extraction(src, out, CFG, num_partitions=2)

    extracted = cp.read_extracted(out)
    by_status = {r["status"]: r["count"] for r in stats.job_stats(extracted).take_all()}
    assert by_status.get("ok", 0) > 40

    roll = stats.run_rollup(manifest)
    assert roll["partitions"] == 2
    assert roll["rows_in"] == 60
    assert roll["rows_ok"] == by_status.get("ok", 0)

    top = stats.list_rows(extracted, "n_chars", status="ok", limit=5,
                          tiebreak="url").take_all()
    assert len(top) == 5
    assert top[0]["n_chars"] >= top[-1]["n_chars"]

    chunks = stats.explode_chunks(extracted)
    assert chunks.count() >= extracted.count()  # giant rows explode into >1

    roll2 = stats.content_length_rollup(extracted)
    assert roll2["rows"] == 60


def test_url_hash_bucketed_output(ray_session, tmp_path):
    import glob

    from engine.partition import url_bucket

    src = str(tmp_path / "pages")
    out = str(tmp_path / "out")
    write_pages_parquet(src, 40, seed=31, num_files=2)
    manifest = cp.run_extraction(src, out, CFG, num_partitions=2,
                                 url_hash_buckets=8)
    assert manifest.num_rows == 2
    files = glob.glob(f"{out}/part-*/bucket=*/*.parquet")
    assert files
    for f in files[:4]:
        b = int(f.split("bucket=")[1].split("/")[0])
        t = pq.read_table(f, columns=["url"])
        assert all(url_bucket(u, 8) == b for u in t["url"].to_pylist())
    # read_extracted handles the nested layout; rows complete
    assert cp.read_extracted(out).count() == 40
