"""Golden-fixture writer (SURVEY.md §5.2 item 1; FIXTURES.md F2).

``python tests/gen_fixtures.py --write-golden`` regenerates
``tests/fixtures/golden_extracted.parquet``: the single-threaded oracle's
output over the tiny (200-row) pages corpus. Committed once, hand-reviewed;
pytest asserts byte equality per url thereafter.

Why the engine's own single-threaded run is the normative oracle: the sandbox
has no network and no markitdown wheel, so byte-identity is defined against
the frozen spec in engine/mdserialize.py + engine/pdfx + engine/docxx, and the
invariant that actually matters at scale is *distributed == sequential* at any
parallelism (SURVEY.md §2.2 "byte-identity note").
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import pyarrow as pa
import pyarrow.parquet as pq

from engine.extract import extract_row
from engine.fixtures import gen_pages_table
from engine.schema import EXTRACTED

TINY_ROWS = 200
SEED = 42
FIXTURE_DIR = Path(__file__).resolve().parent / "fixtures"
GOLDEN_PATH = FIXTURE_DIR / "golden_extracted.parquet"


def oracle_extract(pages: pa.Table) -> pa.Table:
    """Single-threaded reference run — deterministic, row order = input order."""
    out: dict[str, list] = {name: [] for name in EXTRACTED.names}
    for i in range(pages.num_rows):
        row = extract_row(pages["html"][i].as_py() or b"")
        out["url"].append(pages["url"][i].as_py())
        for k, v in row.items():
            out[k].append(v)
    return pa.table(out, schema=EXTRACTED)


def main() -> None:
    pages = gen_pages_table(TINY_ROWS, seed=SEED)
    golden = oracle_extract(pages)
    if "--write-golden" in sys.argv:
        FIXTURE_DIR.mkdir(parents=True, exist_ok=True)
        pq.write_table(golden, GOLDEN_PATH)
        statuses = golden["status"].to_pylist()
        summary = {
            "rows": golden.num_rows,
            "ok": statuses.count("ok"),
            "failed": statuses.count("failed"),
            "rejected": statuses.count("rejected"),
            "total_md_bytes": sum(
                len(s.encode()) for s in golden["markdown_text"].to_pylist()
            ),
        }
        (FIXTURE_DIR / "golden_summary.json").write_text(json.dumps(summary, indent=2))
        print(f"wrote {GOLDEN_PATH}: {summary}")
    else:
        print(golden.to_pandas().head())


if __name__ == "__main__":
    main()
