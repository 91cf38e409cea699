"""Parallel pages-fixture generation (sf1 soak prep, VERDICT r4 #3).

Writes the SAME shards (same names, same rows — gen_page_row is pure in
the row index) as engine.fixtures.write_pages_parquet, but fans the 64
shards across worker processes: 1M pages drop from ~50 min serial to a
few minutes. Emits the bench's _COMPLETE marker so bench.py treats the
directory as its own cache. Parity caveat (verified): the docx/pdf rows
embed zip DOS timestamps, so BOTH the serial and this parallel path are
content-identical only modulo those few bytes — regenerating serially
twice differs on the same rows.

Usage: python scripts/gen_pages_parallel.py N_ROWS OUT_DIR [NUM_FILES] [WORKERS]
"""

from __future__ import annotations

import os
import sys
from concurrent.futures import ProcessPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SEED = 42
WEIGHT = 16  # bench.py PAGE_WEIGHT


def write_shard(args: "tuple[int, int, int, str]") -> str:
    f, lo, hi, out_dir = args
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.fixtures import PAGES, gen_page_row

    rows = [gen_page_row(i, seed=SEED, weight=WEIGHT) for i in range(lo, hi)]
    shard = pa.table(
        {
            "url": [r["url"] for r in rows],
            "warc_ts": [r["warc_ts"] for r in rows],
            "html": [r["html"] for r in rows],
            "text": [r["text"] for r in rows],
            "lang": [r["lang"] for r in rows],
        },
        schema=PAGES,
    )
    path = os.path.join(out_dir, f"pages-{f:05d}.parquet")
    pq.write_table(shard, path)
    return path


def main() -> None:
    n_rows = int(sys.argv[1])
    out_dir = sys.argv[2]
    num_files = int(sys.argv[3]) if len(sys.argv) > 3 else 64
    workers = int(sys.argv[4]) if len(sys.argv) > 4 else 24
    os.makedirs(out_dir, exist_ok=True)
    per = (n_rows + num_files - 1) // num_files
    jobs = [(f, f * per, min((f + 1) * per, n_rows), out_dir)
            for f in range(num_files) if f * per < n_rows]
    with ProcessPoolExecutor(max_workers=workers) as ex:
        for i, p in enumerate(ex.map(write_shard, jobs)):
            print(f"{i + 1}/{len(jobs)} {p}", flush=True)
    with open(os.path.join(out_dir, "_COMPLETE"), "w") as f:
        f.write(str(n_rows))


if __name__ == "__main__":
    main()
