"""BPE tokenizer training (engine/tokenize.py: word_counts/bpe_train/
bpe_apply/bpe_segment_counts)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from engine.tokenize import (DRIVER_WORD_TYPES_MAX, _merge_word, bpe_apply,
                             bpe_segment_counts, bpe_train, word_counts)


def _ref_train(wc: dict, k: int):
    """Brute-force reference: full recount every round."""
    words = {w: list(w) for w in wc}
    merges = []
    for _ in range(k):
        pc_ = {}
        for w, n in wc.items():
            syms = words[w]
            for a, b in zip(syms, syms[1:]):
                pc_[(a, b)] = pc_.get((a, b), 0) + n
        live = [(p, c) for p, c in pc_.items() if c > 0]
        if not live:
            break
        best, c = min(live, key=lambda x: (-x[1], x[0]))
        merges.append((best[0], best[1], c))
        for w in words:
            words[w] = _merge_word(words[w], best)
    return merges


WC = {"lower": 4, "lowest": 3, "newer": 6, "wider": 2, "low": 5,
      "aaaa": 7, "aaa": 2, "x": 9}


def _table(wc):
    return pa.table({"word": list(wc), "n": list(wc.values())})


def test_incremental_matches_brute_force():
    got = bpe_train(_table(WC), 10)
    gl = list(zip(got["lhs"].to_pylist(), got["rhs"].to_pylist(),
                  got["pair_count"].to_pylist()))
    assert gl == _ref_train(WC, 10)


def test_merge_is_left_to_right_nonoverlapping():
    assert _merge_word(list("aaaa"), ("a", "a")) == ["aa", "aa"]
    assert _merge_word(list("aaa"), ("a", "a")) == ["aa", "a"]
    assert _merge_word(["aa", "a", "aa"], ("aa", "a")) == ["aaa", "aa"]


def test_overlapping_pair_positions_are_counted():
    # 'aaa'×1: pair (a,a) occurs at 2 positions
    got = bpe_train(_table({"aaa": 1}), 1)
    assert got["pair_count"].to_pylist() == [2]


def test_tie_break_is_lexicographic():
    got = bpe_train(_table({"ba": 1, "ab": 1}), 1)
    assert (got["lhs"].to_pylist(), got["rhs"].to_pylist()) == (["a"], ["b"])


def test_pipe_words_dropped_and_cap_enforced():
    got = bpe_train(_table({"a|b": 100, "cd": 1}), 1)
    assert got["lhs"].to_pylist() == ["c"]
    import engine.tokenize as tk
    old = tk.DRIVER_WORD_TYPES_MAX
    tk.DRIVER_WORD_TYPES_MAX = 1
    try:
        with pytest.raises(ValueError, match="word-type table"):
            bpe_train(_table(WC), 1)
    finally:
        tk.DRIVER_WORD_TYPES_MAX = old


def test_apply_in_rank_order():
    merges_tbl = bpe_train(_table(WC), 6)
    merges = list(zip(merges_tbl["lhs"].to_pylist(),
                      merges_tbl["rhs"].to_pylist()))
    for w in WC:
        if "|" in w:
            continue
        assert "".join(bpe_apply(w, merges)) == w  # lossless segmentation


def test_distributed_word_counts_and_segments(ray_session):
    import ray.data as rd

    rows = [{"doc_id": 0, "text": "low lower low"},
            {"doc_id": 1, "text": "newest"},
            {"doc_id": 2, "text": ""}]
    wc = dict(zip(*[word_counts(rd.from_items(rows)).to_pandas()[c]
                    for c in ("word", "n")]))
    assert wc == {"low": 2, "lower": 1, "newest": 1}

    merges_tbl = bpe_train(_table(WC), 4)
    merges = list(zip(merges_tbl["lhs"].to_pylist(),
                      merges_tbl["rhs"].to_pylist()))
    out = (bpe_segment_counts(rd.from_items(rows), merges)
           .to_pandas().set_index("doc_id")["n_symbols"].to_dict())
    want = {i: sum(len(bpe_apply(w, merges)) for w in r["text"].split())
            for i, r in ((r["doc_id"], r) for r in rows)}
    assert out == want
    # parallelism invariance
    out16 = (bpe_segment_counts(rd.from_items(rows).repartition(3), merges)
             .to_pandas().set_index("doc_id")["n_symbols"].to_dict())
    assert out16 == want


def test_chunk_token_windows(ray_session):
    import pytest
    import ray.data as rd

    from engine.tokenize import chunk_token_windows

    rows = [{"doc_id": 0, "text": " ".join(f"t{i}" for i in range(10))},
            {"doc_id": 1, "text": "single"},
            {"doc_id": 2, "text": ""},          # no chunks
            {"doc_id": 3, "text": " ".join(f"u{i}" for i in range(4))}]
    out = (chunk_token_windows(rd.from_items(rows), size=4, stride=3)
           .to_pandas().sort_values(["doc_id", "chunk_idx"]))
    got = list(zip(out.doc_id, out.chunk_idx, out.chunk))
    assert got == [
        (0, 0, "t0 t1 t2 t3"), (0, 1, "t3 t4 t5 t6"),
        (0, 2, "t6 t7 t8 t9"),                  # every token covered
        (1, 0, "single"),                        # short doc: one chunk
        (3, 0, "u0 u1 u2 u3"),                   # exactly size: one chunk
    ]
    with pytest.raises(ValueError):
        chunk_token_windows(rd.from_items(rows), size=4, stride=5)


def test_token_windows_null_text(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from engine.tokenize import chunk_token_windows

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1], "text": pa.array(["a b", None])}))
    out = chunk_token_windows(ds, size=2, stride=2).to_pandas()
    assert list(out.doc_id) == [0]  # null text yields no chunks


def test_segment_counts_skip_pipe_words(ray_session):
    import ray.data as rd

    from engine.tokenize import bpe_segment_counts

    ds = rd.from_items([{"doc_id": 0, "text": "ab a|b cd"}])
    out = bpe_segment_counts(ds, []).to_pandas()
    # 'a|b' skipped on both sides (the SQL separator rule); 2+2 chars
    assert list(out.n_symbols) == [4]
