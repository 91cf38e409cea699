"""Text-analysis tests: language-ID, quality, token counts, fingerprints."""

from __future__ import annotations

import pyarrow as pa

from engine import textstats as ts


def test_detect_lang():
    assert ts.detect_lang("the cat and the dog sat in the house of it") == "en"
    assert ts.detect_lang("el perro y la casa de los niños en la calle") == "es"
    assert ts.detect_lang("der Hund und die Katze ist in den Haus mit") == "de"
    assert ts.detect_lang("le chat et la maison des enfants dans un jardin") == "fr"
    assert ts.detect_lang("这是一个中文句子，用来测试语言识别功能。") == "zh"
    assert ts.detect_lang("") == "und"
    assert ts.detect_lang("12345 67890 !!!") == "und"


def test_langid_stage(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1],
        "text": ["the cat and the dog in the house", "el perro de la casa y los gatos"],
    }))
    out = ds.map_batches(ts.LangIdStage, batch_format="pyarrow",
                         concurrency=1).take_all()
    assert [r["lang_pred"] for r in sorted(out, key=lambda r: r["doc_id"])] == ["en", "es"]


def test_quality_features_and_score():
    good = ("this is a reasonably long document with the usual mix of words "
            "and punctuation, written for the quality scorer to like it. "
            "it has enough tokens and variety to pass the bar easily, and "
            "more sentences follow to pad the token count above twenty.")
    f = ts.quality_features(good)
    assert f["n_tokens"] > 20
    assert 0 < f["stopword_ratio"] < 1
    assert ts.quality_score(f) == 1.0

    junk = "x " * 100  # hyper-repetitive, no stopwords
    fj = ts.quality_features(junk)
    assert ts.quality_score(fj) < 0.5
    assert ts.quality_score(ts.quality_features("")) < 0.3


def test_token_counts():
    assert ts.count_tokens_ws("a b  c") == 3
    assert ts.count_tokens_ws("") == 0
    assert ts.count_tokens_bpeish("hello world, it's 42") >= 5


def test_token_count_batch_matches_scalar():
    texts = ["a b  c", "", "hello world", "  leading and trailing  "]
    t = pa.table({"text": texts})
    out = ts.token_count_batch(t)
    assert out["n_tokens_ws"].to_pylist() == [ts.count_tokens_ws(s) for s in texts]


def test_fingerprints():
    assert ts.md5_fingerprint("abc") == "900150983cd24fb0d6963f7d28e17f72"
    a = ts.winnow_fingerprints("the quick brown fox jumps over the lazy dog " * 5)
    b = ts.winnow_fingerprints("the quick brown fox jumps over the lazy dog " * 5)
    assert a == b and len(a) > 0
    # winnowing is alignment-robust: a shifted copy shares most fingerprints
    text = "the quick brown fox jumps over the lazy dog and runs away " * 10
    fa = set(ts.winnow_fingerprints(text))
    fb = set(ts.winnow_fingerprints("PREFIX then " + text))
    assert len(fa & fb) / len(fa) > 0.8
    assert ts.winnow_fingerprints("") == []


_MIXED_TEXTS = [
    "the cat and the dog sat in the house of it",
    "el perro y la casa de los ninos en la calle",
    "der Hund und die Katze ist in den Haus mit",
    "le chat et la maison des enfants dans un jardin",
    "这是一个中文句子，用来测试语言识别功能。",
    "", "12345 67890 !!!", "x " * 100,
    "mixed text with, punctuation; and: some? tokens! here.",
    "word9 the9 a b  c", "  leading and trailing  ",
    "the and of to a in is that for it",
    "aaaaaaaaaaaaaaaaaaaaaaaa bbbbbbbbbbbbbbbbbb",
]


def test_langid_stage_matches_scalar():
    # the vectorized Arrow kernel is pinned to detect_lang row-for-row on
    # ASCII+CJK corpora (RE2-vs-Python Unicode word classes documented)
    t = pa.table({"text": _MIXED_TEXTS})
    out = ts.LangIdStage()(t)["lang_pred"].to_pylist()
    assert out == [ts.detect_lang(s) for s in _MIXED_TEXTS]


def test_quality_stage_matches_scalar():
    t = pa.table({"text": _MIXED_TEXTS})
    out = ts.QualityStage()(t)
    keys = ("n_tokens", "n_uniq", "n_stop", "uniq_ratio", "punct_ratio",
            "stopword_ratio", "mean_token_len")
    for i, s in enumerate(_MIXED_TEXTS):
        f = ts.quality_features(s)
        for k in keys:
            assert out[k][i].as_py() == f[k], (i, k)
        assert out["quality"][i].as_py() == ts.quality_score(f)


def test_quality_stage(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(pa.table({"doc_id": [0], "text": ["the cat sat on the mat today again"]}))
    out = ds.map_batches(ts.QualityStage, batch_format="pyarrow",
                         concurrency=1).take_all()[0]
    assert set(out) >= {"n_tokens", "uniq_ratio", "punct_ratio",
                        "stopword_ratio", "mean_token_len", "quality"}


def test_doc_frequency(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from engine.textstats import doc_frequency

    ds = rd.from_arrow(pa.table({"text": [
        "apple banana apple",     # apple counts ONCE per doc
        "banana cherry",
        "apple",
        "",
    ]})).repartition(2)
    out = doc_frequency(ds).to_pandas().set_index("token")["df"].to_dict()
    assert out == {"apple": 2, "banana": 2, "cherry": 1}


def test_exact_percentiles(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from engine.stats import exact_percentiles

    ds = rd.from_arrow(pa.table({"v": list(range(1, 11))})).repartition(3)
    out = exact_percentiles(ds, "v", qs=(0.25, 0.5, 0.75, 0.9))
    got = dict(zip(out["q"].to_pylist(), out["value"].to_pylist()))
    # ceil(q*n) rank convention — pinned against DuckDB quantile_disc
    assert got == {0.25: 3, 0.5: 5, 0.75: 8, 0.9: 9}


def test_exact_percentiles_empty(ray_session):
    import ray.data as rd
    import pyarrow as pa

    from engine.stats import exact_percentiles

    empty = rd.from_arrow(pa.table({"v": pa.array([], type=pa.int64())}))
    out = exact_percentiles(empty, "v")
    assert out.num_rows == 0


def test_window_dup_stats(ray_session):
    import ray.data as rd

    from engine.textstats import window_dup_stats

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "a b c d e",    # shares "a b c" with doc 1
            "a b c x y",
            "q q q q",      # intra-doc repeat: "q q q" twice, overlap union
            "p",            # shorter than k -> zero windows
        ],
    })).repartition(2)
    out = window_dup_stats(ds, k=3).to_pandas() \
        .set_index("doc_id").sort_index()
    rows = {i: tuple(out.loc[i]) for i in out.index}
    # (n_windows, n_dup_windows, n_covered_tokens)
    assert rows[0] == (3, 1, 3)
    assert rows[1] == (3, 1, 3)
    assert rows[2] == (2, 2, 4)   # union of [1,4) and [2,5) = 4 tokens
    assert rows[3] == (0, 0, 0)


def test_cut_dup_windows(ray_session):
    import ray.data as rd

    from engine.textstats import cut_dup_windows

    ds = rd.from_arrow(pa.table({
        "doc_id": [0, 1, 2, 3, 4],
        "text": [
            "a b c d e",      # "a b c" shared with doc 1 -> cut pos 1-3
            "a b c x y",
            "q q q q",        # both windows dup -> fully removed
            "p",              # shorter than k, untouched
            "m1 m2   m3",     # clean but whitespace-normalized
        ],
    })).repartition(2)
    out = cut_dup_windows(ds, k=3).to_pandas().set_index("doc_id")
    assert out.loc[0, "text"] == "d e" and out.loc[0, "n_removed_tokens"] == 3
    assert out.loc[1, "text"] == "x y" and out.loc[1, "n_removed_tokens"] == 3
    assert out.loc[2, "text"] == "" and out.loc[2, "n_removed_tokens"] == 4
    assert out.loc[3, "text"] == "p" and out.loc[3, "n_removed_tokens"] == 0
    assert out.loc[4, "text"] == "m1 m2 m3"
    assert out.loc[4, "n_removed_tokens"] == 0
