"""Round-3 continuation operators: PII redaction, grouped percentiles,
latest-per-key, bigram counts, lag deltas, stratified sampling — each checked
against an independent pandas/numpy/hashlib reference (the oracle gate covers
the SQL twins; these pin the library API semantics directly)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def test_redact_pii_batch_masks_and_counts():
    from engine.textops import redact_pii_batch

    t = pa.table({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "mail a.b-c_d%e+f@sub.host.example.org now",
            "call +1-202-555-0143 or +1-999-555-0000 today",
            "both x@y.io and +1-000-555-1234.",
            "no pii here, just an @ sign and 555-1234",
        ],
    })
    out = redact_pii_batch(t)
    assert out["n_email"].to_pylist() == [1, 0, 1, 0]
    assert out["n_phone"].to_pylist() == [0, 2, 1, 0]
    clean = out["text_clean"].to_pylist()
    assert clean[0] == "mail <EMAIL> now"
    assert clean[1] == "call <PHONE> or <PHONE> today"
    assert clean[2] == "both <EMAIL> and <PHONE>."
    assert clean[3] == t["text"][3].as_py()  # untouched


def test_group_percentiles_matches_numpy_reference(ray_session):
    import ray.data as rd

    from engine.stats import group_percentiles

    rng = np.random.RandomState(3)
    n = 700
    df = pd.DataFrame({
        "k": rng.choice(["a", "b", "c"], n),
        "v": rng.randint(0, 40, n),
    })
    qs = (0.1, 0.5, 0.9)
    out = group_percentiles(
        rd.from_pandas(df).repartition(5), "k", "v", qs=qs
    ).to_pandas().set_index(["k", "q"])["value"]
    for k, g in df.groupby("k"):
        vals = np.sort(g["v"].to_numpy())
        for q in qs:
            rank = max(1, int(np.ceil(q * len(vals))))  # percentile_disc
            assert out[(k, q)] == vals[rank - 1], (k, q)


def test_first_per_key_keep_last(ray_session):
    import ray.data as rd

    from engine.dedup import first_per_key

    rng = np.random.RandomState(5)
    n = 300
    df = pd.DataFrame({
        "user_id": rng.randint(0, 25, n),
        "ts": rng.randint(0, 50, n),
        "event_id": np.arange(n),
        "v": rng.randint(0, 9, n),
    })
    ds = rd.from_pandas(df).repartition(4)
    out = first_per_key(ds, key_col="user_id", keep="last").to_pandas()
    ref = df.sort_values(["user_id", "ts", "event_id", "v"]) \
        .drop_duplicates("user_id", keep="last")
    assert sorted(map(tuple, out[["user_id", "event_id"]].values.tolist())) \
        == sorted(map(tuple, ref[["user_id", "event_id"]].values.tolist()))
    with pytest.raises(ValueError):
        first_per_key(ds, key_col="user_id", keep="middle")


def _ref_bigrams(texts: list[str]) -> dict[str, int]:
    from collections import Counter

    c: Counter = Counter()
    for s in texts:
        toks = s.split()  # ASCII corpus: matches RE2 \s+ split w/o empties
        c.update(f"{a} {b}" for a, b in zip(toks, toks[1:]))
    return dict(c)


def test_bigram_counts_matches_counter_reference(ray_session):
    import ray.data as rd

    from engine.textstats import bigram_counts

    texts = [
        "a b c a b",
        "  leading and trailing  ",
        "single",
        "",
        "a b",
        "x  y\tz\nw",  # runs of mixed whitespace collapse
        "b a " * 40,
    ]
    rng = np.random.RandomState(9)
    words = ["tok%d" % i for i in range(30)]
    texts += [" ".join(rng.choice(words, rng.randint(0, 12)))
              for _ in range(200)]
    ds = rd.from_items([{"text": s} for s in texts]).repartition(6)
    out = bigram_counts(ds).to_pandas()
    got = dict(zip(out["bigram"], out["n"].astype(int)))
    assert got == _ref_bigrams(texts)


def test_lag_delta_datetime_and_numeric(ray_session):
    import ray.data as rd

    from engine.windows import lag_delta

    rng = np.random.RandomState(13)
    n = 400
    df = pd.DataFrame({
        "user_id": rng.randint(0, 12, n),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.randint(0, 10**6, n), unit="s"),
        "event_id": np.arange(n),
    })
    out = lag_delta(rd.from_pandas(df).repartition(5)).to_pandas() \
        .sort_values(["user_id", "ts", "event_id"])
    ref = df.sort_values(["user_id", "ts", "event_id"])
    expect = (ref.groupby("user_id")["ts"].diff().dt.total_seconds()
              * 1_000_000).fillna(-1).astype("int64")
    assert out["gap_us"].to_numpy().tolist() == expect.to_numpy().tolist()

    # numeric (epoch-seconds) ts column: same contract
    df2 = df.assign(ts=rng.randint(0, 1000, n).astype("int64"))
    out2 = lag_delta(rd.from_pandas(df2).repartition(3)).to_pandas() \
        .sort_values(["user_id", "ts", "event_id"])
    ref2 = df2.sort_values(["user_id", "ts", "event_id"])
    expect2 = (ref2.groupby("user_id")["ts"].diff() * 1_000_000) \
        .fillna(-1).astype("int64")
    assert out2["gap_us"].to_numpy().tolist() == expect2.to_numpy().tolist()


def test_stratified_sample_membership_and_stability(ray_session):
    import ray.data as rd

    from engine.partition import stratified_sample

    n = 2000
    df = pd.DataFrame({
        "id": np.arange(n),
        "stratum": np.repeat(["hot", "cold", "other", "zero"], n // 4),
    })
    rates = {"hot": 80, "cold": 5, "zero": 0}
    ds = rd.from_pandas(df).repartition(4)
    out = stratified_sample(ds, "stratum", "id", rates,
                            default_pct=25).to_pandas()

    def kept(s: str, i: int, pct: int) -> bool:
        h = int.from_bytes(
            hashlib.md5(f"strat:{s}:{i}".encode()).digest()[:4], "big")
        return h % 100 < pct

    expect = {(s, i) for s, i in zip(df["stratum"], df["id"])
              if kept(s, i, rates.get(s, 25))}
    got = set(zip(out["stratum"], out["id"]))
    assert got == expect
    assert not any(s == "zero" for s, _ in got)
    # rough rate sanity per stratum (binomial, wide margins)
    n_hot = sum(1 for s, _ in got if s == "hot")
    n_cold = sum(1 for s, _ in got if s == "cold")
    assert 330 <= n_hot <= 460 and n_cold <= 60
    # deterministic: a second run returns the identical sample
    out2 = stratified_sample(ds, "stratum", "id", rates,
                             default_pct=25).to_pandas()
    assert got == set(zip(out2["stratum"], out2["id"]))
