"""WARC ingestion tests: parser framing, gzip members, Dataset read,
and the archive → extraction chain."""

from __future__ import annotations

import pyarrow as pa

from engine import warc
from engine.fixtures import gen_pages_table


def _pages(n=12):
    t = gen_pages_table(n, seed=42, weight=4)
    return list(zip(t["url"].to_pylist(), t["html"].to_pylist()))


def test_warc_roundtrip_plain_and_gzip(tmp_path):
    rows = _pages()
    for gz, name in ((False, "a.warc"), (True, "b.warc.gz")):
        p = str(tmp_path / name)
        warc.write_warc(p, rows, gzip_members=gz)
        t = warc.warc_rows(open(p, "rb").read())
        assert t["url"].to_pylist() == [u for u, _ in rows]
        assert t["html"].to_pylist() == [h for _, h in rows]
        assert set(t["warc_date"].to_pylist()) == {"2026-01-01T00:00:00Z"}


def test_warc_skips_non_response_records():
    rec = (b"WARC/1.0\r\nWARC-Type: metadata\r\nContent-Length: 2\r\n"
           b"\r\nxy\r\n\r\n")
    assert warc.warc_rows(rec).num_rows == 0
    # truncated trailing garbage does not raise
    assert warc.warc_rows(rec + b"WARC/1.0\r\nbroken").num_rows == 0


def test_read_warc_dataset_and_extract_chain(ray_session, tmp_path):
    import ray.data as rd

    rows = _pages(20)
    half = len(rows) // 2
    warc.write_warc(str(tmp_path / "p0.warc"), rows[:half])
    warc.write_warc(str(tmp_path / "p1.warc.gz"), rows[half:],
                    gzip_members=True)
    ds = warc.read_warc([str(tmp_path / "p0.warc"),
                         str(tmp_path / "p1.warc.gz")])
    got = {r["url"]: r["html"] for r in ds.take_all()}
    assert got == dict(rows)

    # archive -> extraction chain: distributed over the WARC read equals
    # the sequential kernel over the same pages
    from engine.extract import extract_batch

    ext = ds.map_batches(
        lambda t: extract_batch(t.select(["url", "html"])),
        batch_format="pyarrow", batch_size=4)
    dist = {r["url"]: r["markdown_text"] for r in ext.take_all()}
    seq_t = extract_batch(pa.table({
        "url": pa.array([u for u, _ in rows]),
        "html": pa.array([h for _, h in rows], type=pa.binary())}))
    seq = dict(zip(seq_t["url"].to_pylist(),
                   seq_t["markdown_text"].to_pylist()))
    assert dist == seq
