"""HyperLogLog distinct-count sketch: accuracy vs exact counts, merge
associativity (partial states from different batch splits agree)."""

import numpy as np
import pyarrow as pa
import pytest

from indexer_ray.pipelines.sketches import (
    _hll_estimate,
    _hll_hash64,
    _hll_registers,
    hyperloglog_distinct,
)


def test_hll_core_accuracy():
    rng = np.random.default_rng(7)
    for true_n in (50, 1000, 20_000):
        vals = [f"user{v}" for v in rng.choice(10**9, size=true_n, replace=False)]
        regs = _hll_registers(_hll_hash64(vals), p=12)
        est = _hll_estimate(regs)
        assert abs(est - true_n) / true_n < 0.05, (true_n, est)


def test_hll_merge_equals_single_pass():
    vals = [f"u{i}" for i in range(5000)]
    whole = _hll_registers(_hll_hash64(vals), p=10)
    a = _hll_registers(_hll_hash64(vals[:2000]), p=10)
    b = _hll_registers(_hll_hash64(vals[1500:]), p=10)  # overlap on purpose
    assert (np.maximum(a, b) == whole).all()


def test_hyperloglog_distinct_grouped(ray_session):
    import ray.data as rd

    rng = np.random.default_rng(3)
    n = 30_000
    groups = rng.choice(["a", "b", "c"], size=n)
    # group-specific user universes of very different sizes
    universe = {"a": 300, "b": 4000, "c": 15_000}
    users = np.array([rng.integers(0, universe[g]) for g in groups])
    t = pa.table(
        {
            "event_type": pa.array(groups.tolist(), type=pa.string()),
            "user_id": pa.array(users, type=pa.int64()),
        }
    )
    out = (
        hyperloglog_distinct(rd.from_arrow(t), key="user_id", group_col="event_type", p=12)
        .to_pandas()
        .set_index("event_type")["approx_distinct"]
    )
    import pandas as pd

    exact = pd.DataFrame({"g": groups, "u": users}).groupby("g")["u"].nunique()
    for g in ("a", "b", "c"):
        rel = abs(out[g] - exact[g]) / exact[g]
        assert rel < 0.05, (g, out[g], exact[g])


def test_value_histogram_and_quantiles(ray_session):
    import pyarrow as pa
    import ray.data as rd

    from indexer_ray.pipelines.sketches import histogram_quantiles, value_histogram

    rng = np.random.default_rng(5)
    v = rng.uniform(0, 500, size=20_000)
    t = pa.table({"value": pa.array(v, type=pa.float64())})
    ds = rd.from_arrow(t)
    h = value_histogram(ds, "value", lo=0.0, width=10.0, bins=50).to_pandas()
    assert h["n"].sum() == 20_000
    # exact per-bucket counts
    expect = np.clip(np.floor(v / 10.0).astype(np.int64), 0, 49)
    eu, ec = np.unique(expect, return_counts=True)
    got = h.sort_values("bucket")
    assert got["bucket"].tolist() == eu.tolist()
    assert got["n"].tolist() == ec.tolist()
    # quantiles within one bin width of exact
    qs = histogram_quantiles(ds, "value", 0.0, 10.0, 50, [0.5, 0.95])
    for q, est in qs.items():
        assert abs(est - np.quantile(v, q)) <= 10.0, (q, est)


def test_hyperloglog_group_dtype_preserved(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "g": pa.array([1, 1, 2, 2, 2], type=pa.int64()),
            "u": pa.array([10, 11, 10, 12, 10], type=pa.int64()),
        }
    )
    out = hyperloglog_distinct(rd.from_arrow(t), key="u", group_col="g", p=10).to_pandas()
    # group column keeps its integer identity, not str(g)
    assert sorted(out["g"].tolist()) == [1, 2]
    got = out.set_index("g")["approx_distinct"]
    assert got[1] == 2 and got[2] == 2  # linear counting is exact here


def test_hyperloglog_null_group_does_not_raise(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "g": pa.array(["a", None, "a", None], type=pa.string()),
            "u": pa.array([1, 2, 3, 4], type=pa.int64()),
        }
    )
    out = hyperloglog_distinct(rd.from_arrow(t), key="u", group_col="g", p=10).to_pandas()
    assert len(out) == 2  # 'a' and the null group
    by_null = out[out["g"].isna()]["approx_distinct"]
    assert len(by_null) == 1 and by_null.iloc[0] == 2


# ------------------------------------------------------ KLL quantiles


def test_kll_rank_error_bound(ray_session):
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from indexer_ray.pipelines.sketches import kll_quantiles

    rng = np.random.default_rng(5)
    vals = rng.lognormal(mean=3.0, sigma=1.5, size=50_000)  # heavy tail
    df = pd.DataFrame({"value": vals})
    ds = rd.from_pandas(df).repartition(16)
    qs = [0.1, 0.5, 0.9, 0.99]
    out = kll_quantiles(ds, "value", qs, k=200)
    assert out["n"].tolist() == [50_000] * 4
    srt = np.sort(vals)
    for q, est in zip(qs, out["estimate"]):
        # rank error: the estimate's true rank within eps of q
        r = np.searchsorted(srt, est) / len(srt)
        assert abs(r - q) < 0.02, (q, est, r)


def test_kll_merge_equals_stream():
    import numpy as np

    from indexer_ray.pipelines.sketches import KLL

    rng = np.random.default_rng(1)
    a, b = rng.normal(size=5000), rng.normal(size=5000)
    both = np.concatenate([a, b])
    merged = KLL(100).add_many(a).merge(KLL(100).add_many(b))
    assert merged.n == 10_000
    srt = np.sort(both)
    for q in (0.25, 0.5, 0.75):
        r = np.searchsorted(srt, merged.quantile(q)) / len(srt)
        assert abs(r - q) < 0.05


def test_kll_deterministic():
    import numpy as np

    from indexer_ray.pipelines.sketches import KLL

    vals = np.arange(20_000, dtype=np.float64)[::-1]
    a = KLL(64).add_many(vals)
    b = KLL(64).add_many(vals)
    assert a.quantile(0.5) == b.quantile(0.5)
    assert [sorted(l) for l in a.levels] == [sorted(l) for l in b.levels]


def test_kll_small_input_exact():
    import numpy as np

    from indexer_ray.pipelines.sketches import KLL

    s = KLL(200).add_many(np.asarray([3.0, 1.0, 2.0]))
    assert s.quantile(0.0) == 1.0
    assert s.quantile(0.5) == 2.0
    assert s.quantile(1.0) == 3.0
