"""Sketch-operator throughput evidence: HyperLogLog registers and
count-min sketch over 1M rows, fast (polars xxhash) path vs the
SQL-checkable md5 path (100k rows — it is a per-row Python loop kept for
oracle parity; 'fast' is the 100-TB path).

Run: python scripts/bench_sketches.py   (owns its Ray session)
Prints one JSON line; compare against BASELINE.md "Sketch throughput".
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import ray
    import ray.data as rd

    from bench import calibrate_single_thread
    from engine.stats import cms_counts, hll_estimate, hll_registers

    calib = calibrate_single_thread()
    ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
             include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    rng = np.random.RandomState(42)
    n = 1_000_000
    vals = rng.randint(0, 300_000, n)
    ds = rd.from_arrow(pa.table({"k": vals})).repartition(64).materialize()
    small = rd.from_arrow(pa.table({"k": vals[:100_000]})) \
        .repartition(16).materialize()

    # warm the worker pool before timing (CLAUDE.md)
    ds.map_batches(lambda t: t, batch_format="pyarrow").count()

    out: dict = {"rows_fast": n, "rows_md5": 100_000,
                 "calib_1t_sec": calib}

    t0 = time.time()
    regs = hll_registers(ds, "k", m=1024, method="fast").to_pandas()
    out["hll_fast_sec"] = round(time.time() - t0, 3)
    est = hll_estimate(regs, m=1024)
    true = len(np.unique(vals))
    out["hll_rel_err"] = round(abs(est - true) / true, 4)

    t0 = time.time()
    cms_counts(ds, "k", d=4, w=4096, method="fast").materialize()
    out["cms_fast_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    hll_registers(small, "k", m=1024, method="md5").materialize()
    out["hll_md5_sec"] = round(time.time() - t0, 3)

    t0 = time.time()
    cms_counts(small, "k", d=4, w=4096, method="md5").materialize()
    out["cms_md5_sec"] = round(time.time() - t0, 3)

    out["hll_fast_rows_per_sec"] = round(n / out["hll_fast_sec"])
    out["cms_fast_rows_per_sec"] = round(n / out["cms_fast_sec"])
    ray.shutdown()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
