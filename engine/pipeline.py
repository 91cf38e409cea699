"""The Dataset graph: read → gate → (skew split) → actor extract → sink.

Ray rebuild of the reference's POST /convert spine (SURVEY.md §3.1): the job
store dissolves into columns; validation/size gating is vectorized; the
conversion happens in an autoscaling actor pool.

Scale notes (the 100 TB design, tested single-node):
- default is a SINGLE scan: per-row skew is absorbed by small row-batches and
  Ray's dynamic block splitting; ``skew_split=True`` switches to the two-branch
  M3 layout (large rows → batch_size=1 pool) at the cost of a second scan of
  the input — use it when giant-row stragglers dominate a partition.
- ``columns=`` pruning at the read: the extract stage needs only (url, html).
- output is written partitioned (one dir per checkpoint partition) by
  engine.checkpoint.run_extraction, never one giant file.
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from engine.extract import ExtractActor
from engine.schema import LARGE_FILE_THRESHOLD, MAX_FILE_SIZE


@dataclass(frozen=True)
class PipelineConfig:
    """Frozen config (replaces the reference env-var surface, app/main.py:205-215)."""

    max_file_size: int = MAX_FILE_SIZE  # app/main.py:205
    large_threshold: int = LARGE_FILE_THRESHOLD  # app/main.py:206
    batch_size: int = 32  # rows/batch on the small branch
    large_batch_size: int = 1  # rows/batch on the large branch (M3)
    min_actors: int = 1
    max_actors: int = 16
    num_cpus: float = 1.0
    skew_split: bool = False


def read_pages(source: str | list[str], columns: list[str] | None = None,
               **kwargs) -> "ray.data.Dataset":
    """S1 — Parquet ingress (replaces multipart HTTP, app/main.py:641)."""
    return ray.data.read_parquet(source, columns=columns, **kwargs)


def extract_pages(pages: "ray.data.Dataset",
                  cfg: PipelineConfig = PipelineConfig()) -> "ray.data.Dataset":
    """pages(url, html, ...) → extracted table (EXTRACTED schema)."""
    concurrency = (cfg.min_actors, cfg.max_actors)
    if not cfg.skew_split:
        return pages.map_batches(
            ExtractActor,
            fn_constructor_kwargs={"max_file_size": cfg.max_file_size},
            batch_format="pyarrow",
            batch_size=cfg.batch_size,
            concurrency=concurrency,
            num_cpus=cfg.num_cpus,
        )

    thresh = cfg.large_threshold

    def keep_small(t: pa.Table) -> pa.Table:
        return t.filter(pc.less_equal(pc.binary_length(t["html"]), thresh))

    def keep_large(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(pc.binary_length(t["html"]), thresh))

    small = pages.map_batches(keep_small, batch_format="pyarrow").map_batches(
        ExtractActor,
        fn_constructor_kwargs={"max_file_size": cfg.max_file_size},
        batch_format="pyarrow",
        batch_size=cfg.batch_size,
        concurrency=concurrency,
        num_cpus=cfg.num_cpus,
    )
    large = pages.map_batches(keep_large, batch_format="pyarrow").map_batches(
        ExtractActor,
        fn_constructor_kwargs={"max_file_size": cfg.max_file_size},
        batch_format="pyarrow",
        batch_size=cfg.large_batch_size,
        concurrency=(1, max(2, cfg.max_actors // 4)),
        num_cpus=cfg.num_cpus,
    )
    return small.union(large)


def extract_from_parquet(source: str | list[str],
                         cfg: PipelineConfig = PipelineConfig(),
                         **read_kwargs) -> "ray.data.Dataset":
    """Flagship read→extract pipeline with column pruning at the read."""
    pages = read_pages(source, columns=["url", "html"], **read_kwargs)
    return extract_pages(pages, cfg)
