"""Index-accelerated phrase search and deterministic per-group uniform
sampling — brute oracles + layout-independence."""

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _docs(texts: dict[int, str]) -> pd.DataFrame:
    return pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )


def _build(docs: pd.DataFrame, out: str, mode: str = "plain"):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from indexer_ray.pipelines.build import BuildConfig, build_index

    src = out + "_docs.parquet"
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), src)
    build_index([src], out, BuildConfig(mode=mode, id_column="doc_id", n_partitions=4))
    return out


def test_phrase_search_equals_scan(ray_session, tmp_path):
    from indexer_ray.pipelines.query import IndexSearcher, phrase_search
    from indexer_ray.pipelines.text_analysis import phrase_match_docs

    texts = {
        0: "quick brown fox",            # adjacent -> hit
        1: "quick and also brown",       # both words, NOT adjacent -> pruned by verify
        2: "only quick here",            # fails the AND -> pruned by index
        3: "Quick, brown!",              # punct separators, case fold -> hit
        4: "brown quick reversed",       # order matters -> verify drops
        5: "irrelevant text",
    }
    docs = _docs(texts)
    idx = _build(docs, str(tmp_path / "idx"))
    ds = rd.from_pandas(docs)
    got = sorted(
        phrase_search(IndexSearcher(idx), ds, "quick brown")
        .to_pandas()["doc_id"]
        .tolist()
    )
    want = sorted(phrase_match_docs(ds, "quick brown").to_pandas()["doc_id"].tolist())
    assert got == want == [0, 3]


def test_phrase_search_missing_term_empty(ray_session, tmp_path):
    from indexer_ray.pipelines.query import IndexSearcher, phrase_search

    docs = _docs({0: "alpha beta", 1: "beta gamma"})
    idx = _build(docs, str(tmp_path / "idx"))
    out = phrase_search(IndexSearcher(idx), rd.from_pandas(docs), "alpha zzz")
    assert out.count() == 0


def test_phrase_search_rejects_conformance_index(ray_session, tmp_path):
    from indexer_ray.pipelines.query import IndexSearcher, phrase_search

    docs = _docs({0: "alpha beta"})
    idx = _build(docs, str(tmp_path / "idx"), mode="conformance")
    with pytest.raises(ValueError):
        phrase_search(IndexSearcher(idx), rd.from_pandas(docs), "alpha beta")


def _brute_sample(df: pd.DataFrame, k: int) -> pd.DataFrame:
    from indexer_ray.pipelines.sampling import _bucket_of

    d = df.assign(_b=_bucket_of(df["doc_id"].to_numpy()))
    d = d.sort_values(["source", "_b", "doc_id"])
    keep = d.groupby("source", sort=False).cumcount() < k
    return (
        d.loc[keep, ["doc_id", "source"]]
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )


def test_sample_per_group_matches_brute_and_counts(ray_session):
    from indexer_ray.pipelines.sampling import sample_per_group

    rng = np.random.default_rng(11)
    df = pd.DataFrame(
        {
            "doc_id": np.arange(2000, dtype="int64"),
            "source": rng.choice([f"dom{i}" for i in range(17)], 2000),
        }
    )
    got = (
        sample_per_group(rd.from_pandas(df), k=5, group_col="source")
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    want = _brute_sample(df, 5)
    pd.testing.assert_frame_equal(got, want)
    assert (got.groupby("source").size() == 5).all()


def test_sample_per_group_layout_independent(ray_session):
    """Same sample no matter how rows are batched/partitioned — the
    determinism hash_split promises, extended to the grouped sampler."""
    from indexer_ray.pipelines.sampling import sample_per_group

    rng = np.random.default_rng(13)
    df = pd.DataFrame(
        {
            "doc_id": rng.permutation(1000).astype("int64"),
            "source": rng.choice(["a", "b", "c"], 1000),
        }
    )
    a = (
        sample_per_group(rd.from_pandas(df), k=7, group_col="source")
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    b = (
        sample_per_group(
            rd.from_pandas(df).repartition(13), k=7, group_col="source"
        )
        .to_pandas()
        .sort_values(["source", "doc_id"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_sample_per_group_small_groups_whole(ray_session):
    from indexer_ray.pipelines.sampling import sample_per_group

    df = pd.DataFrame(
        {"doc_id": np.arange(4, dtype="int64"), "source": ["x", "x", "y", "y"]}
    )
    got = sample_per_group(rd.from_pandas(df), k=10, group_col="source").to_pandas()
    assert len(got) == 4


def test_member_mask_handles_hash_range_ids(ray_session):
    """Hash-assigned doc ids span the full uint64 range; ids >= 2^63
    reorder under an int64 cast, so the broadcast filters must cast
    BEFORE sorting (the regression this pins: np.sort(uint64).astype(i8)
    is NOT sorted)."""
    from indexer_ray.pipelines.query import _member_mask

    cand = np.array([3, 2**63 + 5, 17, 2**64 - 1], dtype=np.uint64)
    bad = np.sort(cand).astype(np.int64)
    assert not np.all(bad[:-1] <= bad[1:])  # the old code's broken precondition
    good = np.sort(cand.astype(np.int64))
    probe = cand.astype(np.int64)
    others = np.array([4, -12, 2**62], dtype=np.int64)
    assert _member_mask(good, probe).all()
    assert not _member_mask(good, others).any()
    assert not _member_mask(np.empty(0, dtype=np.int64), probe).any()


def test_mixture_sample_matches_brute_and_is_nested(ray_session):
    import re

    import ray.data as rd

    from indexer_ray.pipelines.sampling import _bucket_of, mixture_sample

    rng = np.random.default_rng(21)
    n = 4000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "source": rng.choice(["web", "wiki", "forum", "code"], size=n),
            "text": ["x"] * n,
        }
    )
    rates = {"web": 0.3, "wiki": 1.0, "forum": 0.0}
    got = (
        mixture_sample(rd.from_pandas(df), rates, default=0.05)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    b = _bucket_of(df["doc_id"].to_numpy())
    cut = df["source"].map(lambda s: int(round(rates.get(s, 0.05) * 10000))).to_numpy()
    want = df[b < cut].reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got["source"] != "forum").all()
    assert set(got[got["source"] == "wiki"]["doc_id"]) == set(
        df[df["source"] == "wiki"]["doc_id"]
    )
    # nested: raising every rate only ADDS rows
    bigger = (
        mixture_sample(rd.from_pandas(df), {"web": 0.6, "wiki": 1.0, "forum": 0.2}, default=0.1)
        .to_pandas()
    )
    assert set(got["doc_id"]).issubset(set(bigger["doc_id"]))


def test_mixture_sample_rejects_bad_rates(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sampling import mixture_sample

    df = pd.DataFrame({"doc_id": [1], "source": ["a"], "text": ["x"]})
    with pytest.raises(ValueError):
        mixture_sample(rd.from_pandas(df), {"a": 1.5})
    with pytest.raises(ValueError):
        mixture_sample(rd.from_pandas(df), {"a": 0.5}, default=-0.1)


def _brute_token_budget(df: pd.DataFrame, budget: int) -> pd.DataFrame:
    import re

    from indexer_ray.pipelines.sampling import _bucket_of

    d = df.copy()
    d["bucket"] = _bucket_of(d["doc_id"].to_numpy())
    d["n_tokens"] = [len(re.findall(r"\S+", t or "")) for t in d["text"]]
    d = d.sort_values(["bucket", "doc_id"], kind="mergesort")
    run = d["n_tokens"].cumsum()
    return (
        d.loc[run <= budget, ["doc_id", "n_tokens"]]
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_token_budget_sample_matches_brute(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sampling import token_budget_sample

    rng = np.random.default_rng(22)
    n = 3000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [" ".join(["w"] * int(rng.integers(0, 40))) for _ in range(n)],
        }
    )
    # budget=0 selects nothing (Ray's to_pandas drops the schema of a
    # fully-empty Dataset, so compare the count rather than the frame)
    assert token_budget_sample(rd.from_pandas(df), 0, n_parts=8).count() == 0
    for budget in (137, 5000, 10**9):
        got = (
            token_budget_sample(rd.from_pandas(df), budget, n_parts=8)
            .to_pandas()
            .sort_values("doc_id")
            .reset_index(drop=True)
            .astype({"doc_id": "int64", "n_tokens": "int64"})
        )
        want = _brute_token_budget(df, budget)
        pd.testing.assert_frame_equal(got, want)
    # budget larger than the corpus keeps everything
    assert len(_brute_token_budget(df, 10**9)) == n


def test_token_budget_sample_nested_and_layout_independent(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sampling import token_budget_sample

    rng = np.random.default_rng(23)
    n = 2000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [" ".join(["t"] * int(rng.integers(1, 30))) for _ in range(n)],
        }
    )
    small = set(
        token_budget_sample(rd.from_pandas(df), 2000, n_parts=8).to_pandas()["doc_id"]
    )
    big = set(
        token_budget_sample(rd.from_pandas(df), 6000, n_parts=8).to_pandas()["doc_id"]
    )
    assert small.issubset(big)
    # different partition count and block layout -> identical selection
    alt = set(
        token_budget_sample(
            rd.from_pandas(df.sample(frac=1.0, random_state=0)).repartition(7),
            2000,
            n_parts=3,
        )
        .to_pandas()["doc_id"]
    )
    assert alt == small


def test_stratified_sample_matches_brute(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sampling import _bucket_of, stratified_sample

    rng = np.random.default_rng(91)
    n = 4000
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "score": rng.integers(0, 1000, size=n).astype(np.int64),
        }
    )
    boundaries, rates = [250.0, 700.0], [1.0, 0.3, 0.0]
    got = (
        stratified_sample(rd.from_pandas(df), "score", boundaries, rates)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    stratum = np.searchsorted(np.array(boundaries), df["score"].to_numpy(), side="left")
    cut = np.array([10000, 3000, 0])[stratum]
    keep = _bucket_of(df["doc_id"].to_numpy()) < cut
    want = df[keep].assign(stratum=stratum[keep].astype("int64")).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want)
    assert (got[got["stratum"] == 0].shape[0] == (stratum == 0).sum())  # rate 1.0 keeps all
    assert (got["stratum"] != 2).all()  # rate 0.0 drops all
    # boundary equality goes to the LOWER stratum (score <= b0 -> stratum 0)
    eq = df[df["score"] == 250]
    if len(eq):
        kept_eq = got[got["doc_id"].isin(eq["doc_id"])]
        assert (kept_eq["stratum"] == 0).all()


def test_stratified_sample_validation(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.sampling import stratified_sample

    df = pd.DataFrame({"doc_id": [1], "score": [1.0]})
    with pytest.raises(ValueError):
        stratified_sample(rd.from_pandas(df), "score", [1.0], [0.5])  # len mismatch
    with pytest.raises(ValueError):
        stratified_sample(rd.from_pandas(df), "score", [2.0, 1.0], [0.1, 0.2, 0.3])
    with pytest.raises(ValueError):
        stratified_sample(rd.from_pandas(df), "score", [1.0], [0.5, 1.5])


def test_token_budget_prefix_property(ray_session):
    """Budgets are NESTED and the selection is a hash-order PREFIX: the
    docs kept at budget B are exactly the first |kept| docs of the
    (bucket, id) order — for random corpora (hypothesis-style sweep over
    seeds/budgets without a Ray call per example)."""
    import ray.data as rd

    from indexer_ray.pipelines.sampling import _bucket_of, token_budget_sample

    rng = np.random.default_rng(97)
    n = 1200
    df = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [" ".join(["t"] * int(rng.integers(0, 25))) for _ in range(n)],
        }
    )
    order = np.lexsort((df["doc_id"].to_numpy(), _bucket_of(df["doc_id"].to_numpy())))
    ordered_ids = df["doc_id"].to_numpy()[order]
    prev: set = set()
    for budget in (500, 2000, 7000):
        kept = set(
            token_budget_sample(rd.from_pandas(df), budget, n_parts=8)
            .to_pandas()["doc_id"]
        )
        assert prev.issubset(kept)  # nested
        # prefix: kept == first len(kept) ids in hash order
        assert kept == set(ordered_ids[: len(kept)])
        prev = kept
