"""Round-4 operator tests: KLL quantile sketch, PDF needs_ocr / decrypt."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from engine import stats as st


def test_kll_weight_and_bound_property():
    rng = np.random.RandomState(11)
    for _ in range(8):
        n = rng.randint(3000, 80000)
        data = rng.uniform(0, 1000, n)
        k = int(rng.choice([256, 512, 1024]))
        nb = rng.randint(1, 40)
        parts = (np.split(data, np.sort(rng.choice(n, nb - 1, replace=False)))
                 if nb > 1 else [data])
        sketches = [st.kll_build(p, k) for p in parts]
        rng.shuffle(sketches)
        while len(sketches) > 1:  # arbitrary tree-merge order
            sketches = [st.kll_merge(sketches[i:i + 2], k)
                        for i in range(0, len(sketches), 2)]
        sk = sketches[0]
        assert st.kll_total_weight(sk) == n  # weight exactly preserved
        bound = st.kll_rank_error_bound(n, k)
        assert bound < 0.05 * n
        srt = np.sort(data)
        for q in (0.01, 0.2, 0.5, 0.8, 0.99):
            v = st.kll_quantile_values(sk, [q])[0]
            target = int(np.ceil(q * n)) or 1
            lo = np.searchsorted(srt, v, side="left") + 1
            hi = np.searchsorted(srt, v, side="right")
            err = (0 if lo <= target <= hi
                   else min(abs(target - lo), abs(target - hi)))
            assert err <= bound, (q, err, bound, n, k)


def test_kll_small_input_exact():
    # below capacity the sketch never compacts: answers == quantile_disc
    data = np.arange(100, dtype=float)
    sk = st.kll_build(data, k=512)
    for q in (0.01, 0.25, 0.5, 0.9, 1.0):
        target = int(np.ceil(q * 100)) or 1
        assert st.kll_quantile_values(sk, [q])[0] == float(target - 1)


def test_kll_partials_pipeline(ray_session):
    import ray.data as rd

    n = 20000
    vals = np.repeat(np.arange(10), n // 10).astype(float)
    rng = np.random.RandomState(3)
    rng.shuffle(vals)
    ds = rd.from_arrow(pa.table({"val": vals})).repartition(8)
    pairs = st.kll_quantiles(ds, "val", [0.05, 0.45, 0.95], k=1024)
    # mid-run targets: sketch value pinned to the exact quantile
    assert [v for _, v in pairs] == [0.0, 4.0, 9.0]
