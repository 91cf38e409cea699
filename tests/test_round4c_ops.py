"""Round-4c operator tests: redirect resolution (pointer doubling)."""

from __future__ import annotations

import pyarrow as pa


def test_resolve_redirects(ray_session):
    import ray.data as rd

    from engine.graph import resolve_redirects

    # 10-node chain 0..9->10 (9 hops for src 0), a 2-cycle, a self-loop,
    # and two srcs converging on the same chain
    src = list(range(10)) + [50, 51, 60, 70, 71]
    dst = list(range(1, 11)) + [51, 50, 60, 8, 8]
    edges = rd.from_arrow(pa.table({"src": src, "dst": dst})).repartition(3)
    out = resolve_redirects(edges, max_hops=16).to_pandas() \
        .set_index("src").sort_index()
    assert out.loc[0, "final"] == 10 and out.loc[0, "hops"] == 10
    assert out.loc[7, "final"] == 10 and out.loc[7, "hops"] == 3
    for cyc in (50, 51, 60):
        assert out.loc[cyc, "resolved"] == 0
        assert pa.compute.is_null(pa.scalar(out.loc[cyc, "final"])).as_py() \
            or out.loc[cyc, "final"] != out.loc[cyc, "final"]  # NaN
    assert out.loc[70, "final"] == 10 and out.loc[70, "hops"] == 3
    assert out.loc[71, "final"] == 10 and out.loc[71, "hops"] == 3


def test_resolve_redirects_hop_bound(ray_session):
    import ray.data as rd

    from engine.graph import resolve_redirects

    edges = rd.from_arrow(pa.table({
        "src": [0, 1, 2, 3], "dst": [1, 2, 3, 4],
    }))
    out = resolve_redirects(edges, max_hops=2).to_pandas() \
        .set_index("src").sort_index()
    assert out.loc[0, "resolved"] == 0  # 4 hops > bound
    assert out.loc[1, "resolved"] == 0  # 3 hops > bound
    assert out.loc[2, "final"] == 4 and out.loc[2, "hops"] == 2
    assert out.loc[3, "final"] == 4 and out.loc[3, "hops"] == 1


def test_bigram_lm_score(ray_session):
    import ray.data as rd

    from engine.textstats import bigram_lm_score

    # corpus: "a b" x3 docs, plus "a c" once, plus a short doc
    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b", "a b", "a b", "a c", "solo"],
    })).repartition(2)
    out = bigram_lm_score(ds).to_pandas().set_index("doc_id").sort_index()
    # c1(a)=4, c2(a b)=3, c2(a c)=1; bitlen: 4->3, 3->2, 1->1
    assert out.loc[0, "lm_bits"] == 3 - 2 and out.loc[0, "n_pairs"] == 1
    assert out.loc[3, "lm_bits"] == 3 - 1 and out.loc[3, "n_pairs"] == 1
    assert out.loc[4, "lm_bits"] == 0 and out.loc[4, "n_pairs"] == 0
