"""Index-backed per-doc keyword extraction and the search+snippet
result-page composition — brute-force oracles, incl. the salted-hot-term
df-correction path."""

import math

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from indexer_ray.conformance.lexer import tokenize_plain


def _brute_keywords(texts_by_id: dict[int, str], m: int) -> pd.DataFrame:
    tf: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for did, text in texts_by_id.items():
        toks = tokenize_plain(text or "")
        if not toks:
            continue
        c: dict[str, int] = {}
        for t in toks:
            c[t] = c.get(t, 0) + 1
        tf[did] = c
        for t in c:
            df[t] = df.get(t, 0) + 1
    n = len(tf)
    rows = []
    for did, c in tf.items():
        scored = sorted(
            (
                (-int(math.floor(v * abs(math.log(n / df[t])) * 1e6 + 0.5)), t)
                for t, v in c.items()
            )
        )[:m]
        rows.extend(
            (did, r, t, -negq) for r, (negq, t) in enumerate(scored)
        )
    return (
        pd.DataFrame(rows, columns=["doc_id", "rank", "term", "score_q"])
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )


def _build(docs: pd.DataFrame, out: str, **cfg_kw):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from indexer_ray.pipelines.build import BuildConfig, build_index

    src = out + "_docs.parquet"
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), src)
    build_index(
        [src],
        out,
        BuildConfig(mode="plain", id_column="doc_id", **cfg_kw),
    )
    return out


def test_doc_keywords_matches_brute(ray_session, tmp_path):
    from indexer_ray.pipelines.query import doc_keywords

    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(40)]
    texts = {
        i: " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for i in range(120)
    }
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=4)
    got = (
        doc_keywords(idx, m=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    want = _brute_keywords(texts, 3)
    pd.testing.assert_frame_equal(
        got.astype({"score_q": "int64"}), want.astype({"score_q": "int64"})
    )


def test_doc_keywords_salted_hot_term_uses_global_df(ray_session, tmp_path):
    from indexer_ray.pipelines.query import doc_keywords
    from indexer_ray.state.manifest import IndexManifest

    # 'hotword' in half the docs -> df 100 of 200; a tiny run budget forces
    # salting, so each salt partition sees only a SLICE of its postings.
    # Without the global-df correction idf would use the partial df.
    texts = {}
    for i in range(200):
        parts = [f"unique{i}", f"filler{i % 7}"]
        if i < 100:
            parts.append("hotword")
        texts[i] = " ".join(parts)
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(
        docs,
        str(tmp_path / "idx"),
        n_partitions=8,
        target_run_postings=20,
        hot_df_ratio=0.3,
    )
    man = IndexManifest.load(idx)
    assert "hotword" in man.hot_terms and man.hot_terms["hotword"] > 1
    got = (
        doc_keywords(idx, m=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    want = _brute_keywords(texts, 3)
    pd.testing.assert_frame_equal(
        got.astype({"score_q": "int64"}), want.astype({"score_q": "int64"})
    )


def test_search_snippets_known(ray_session, tmp_path):
    from indexer_ray.pipelines.query import IndexSearcher, search_snippets

    texts = {
        0: "alpha beta gamma needle delta",      # needle at pos 3
        1: "needle first here",                  # pos 0
        2: "nothing relevant at all",            # no hit
        3: "xx yy zz haystack needle needle",    # 'haystack' (pos 3) first
    }
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=2)
    s = IndexSearcher(idx)
    docs_ds = rd.from_pandas(docs)
    out = (
        search_snippets(s, docs_ds, "needle haystack", k=10, width=2)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    # every scored doc appears exactly once with a consistent quantized score
    hits = dict(s.search("needle haystack", k=10))
    assert sorted(out["doc_id"]) == sorted(hits)
    for _, r in out.iterrows():
        assert r["score_q"] == int(math.floor(hits[r["doc_id"]] * 1e6 + 0.5))
    by_doc = out.set_index("doc_id")
    assert by_doc.loc[0, "pos"] == 3
    assert by_doc.loc[0, "snippet"] == "beta gamma needle delta"
    assert by_doc.loc[1, "pos"] == 0
    assert by_doc.loc[1, "snippet"] == "needle first here"
    # first occurrence of ANY query token: 'haystack' precedes 'needle'
    assert by_doc.loc[3, "pos"] == 3
    assert by_doc.loc[3, "snippet"] == "yy zz haystack needle needle"
    # ranks are the quantize-then-rank order, dense from 0
    assert out["rank"].tolist() == list(range(len(out)))


def test_search_snippets_respects_k(ray_session, tmp_path):
    from indexer_ray.pipelines.query import IndexSearcher, search_snippets

    # doc 0 lacks the term so idf stays nonzero (tf-idf drops score==0)
    texts = {0: "only fillers here"}
    texts.update({i: f"common word{i}" for i in range(1, 30)})
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=2)
    s = IndexSearcher(idx)
    out = search_snippets(s, rd.from_pandas(docs), "common", k=5, width=1).to_pandas()
    assert len(out) == 5
    assert sorted(out["rank"].tolist()) == list(range(5))


def _brute_nll(texts_by_id: dict[int, str]) -> pd.DataFrame:
    tf: dict[int, dict[str, int]] = {}
    cf: dict[str, int] = {}
    for did, text in texts_by_id.items():
        toks = tokenize_plain(text or "")
        if not toks:
            continue
        c: dict[str, int] = {}
        for t in toks:
            c[t] = c.get(t, 0) + 1
            cf[t] = cf.get(t, 0) + 1
        tf[did] = c
    total = sum(cf.values())
    rows = [
        (
            did,
            sum(
                int(math.floor(v * math.log(total / cf[t]) * 1e6 + 0.5))
                for t, v in c.items()
            ),
            sum(c.values()),
        )
        for did, c in tf.items()
    ]
    return (
        pd.DataFrame(rows, columns=["doc_id", "nll_q", "n_tokens"])
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def test_doc_unigram_nll_matches_brute(ray_session, tmp_path):
    from indexer_ray.pipelines.query import doc_unigram_nll

    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(vocab, size=rng.integers(3, 25))) for i in range(100)
    }
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=4)
    got = (
        doc_unigram_nll(idx)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"nll_q": "int64", "n_tokens": "int64"})
    )
    pd.testing.assert_frame_equal(got, _brute_nll(texts))


def test_doc_unigram_nll_salted_hot_cf(ray_session, tmp_path):
    from indexer_ray.pipelines.query import doc_unigram_nll
    from indexer_ray.state.manifest import IndexManifest

    texts = {}
    for i in range(200):
        parts = [f"unique{i}", f"filler{i % 5}"]
        if i < 120:
            parts.extend(["hotword"] * 2)  # tf 2 so cf != df
        texts[i] = " ".join(parts)
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(
        docs,
        str(tmp_path / "idx"),
        n_partitions=8,
        target_run_postings=20,
        hot_df_ratio=0.3,
    )
    assert IndexManifest.load(idx).hot_terms.get("hotword", 0) > 1
    got = (
        doc_unigram_nll(idx)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"nll_q": "int64", "n_tokens": "int64"})
    )
    pd.testing.assert_frame_equal(got, _brute_nll(texts))


def test_search_snippets_handles_hash_range_ids(ray_session, tmp_path):
    """Hash-assigned doc ids >= 2^63: search() yields unsigned Python ints
    from uint64 postings; search_snippets must (a) not overflow the int64
    rank arrays and (b) tie-break + key rank_map on the SIGNED int64 view —
    the same cast-before-sort convention as _member_mask (ADVICE r3)."""
    from indexer_ray.pipelines.query import IndexSearcher, search_snippets

    big0 = 2**63 + 5          # signed view: -(2**63) + 5  (negative)
    big1 = 2**64 - 1          # signed view: -1
    texts = {
        7: "alpha needle omega",
        big0: "alpha needle omega",   # identical text => identical score
        big1: "needle solo",
        9: "no match here",           # keeps idf nonzero (Q6 drops score==0)
    }
    docs = pd.DataFrame(
        {
            "doc_id": pd.array(list(texts), dtype="uint64"),
            "text": list(texts.values()),
        }
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=2)
    s = IndexSearcher(idx)
    out = (
        search_snippets(s, rd.from_pandas(docs), "needle", k=10, width=1)
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    assert len(out) == 3
    sb0 = int(np.uint64(big0).astype(np.int64))
    sb1 = int(np.uint64(big1).astype(np.int64))
    assert set(out["doc_id"]) == {7, sb0, sb1}
    # all three hits tie on score; the tie-break is the SIGNED id asc:
    # big0's signed view (-(2^63)+5) < big1's (-1) < 7
    assert out["doc_id"].tolist() == [sb0, sb1, 7]
    assert (out["snippet"].str.contains("needle")).all()


def test_index_stats_tolerate_sparse_partitions(ray_session, tmp_path):
    """n_partitions >> vocabulary leaves some partitions EMPTY; the build
    writes no dir for those, and the full-index scan ops must skip them
    instead of raising FileNotFoundError (caught by the r04 bench over a
    500-doc corpus at n_partitions=32)."""
    import os

    from indexer_ray.pipelines.query import doc_keywords, doc_unigram_nll
    from indexer_ray.state.manifest import IndexManifest, part_dir

    texts = {0: "alpha beta alpha", 1: "beta gamma", 2: "alpha delta"}
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=16)
    m = IndexManifest.load(idx)
    missing = [
        p
        for p in range(m.n_partitions)
        if not os.path.exists(os.path.join(part_dir(idx, p), "blocks.parquet"))
    ]
    assert missing, "fixture must actually produce empty partitions"

    kw = doc_keywords(idx, m=2).to_pandas()
    assert set(kw["doc_id"]) == {0, 1, 2}
    want = _brute_keywords(texts, 2)
    pd.testing.assert_frame_equal(
        kw.sort_values(["doc_id", "rank"]).reset_index(drop=True).astype({"score_q": "int64"}),
        want.astype({"score_q": "int64"}),
    )

    nll = (
        doc_unigram_nll(idx)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
        .astype({"nll_q": "int64", "n_tokens": "int64"})
    )
    pd.testing.assert_frame_equal(nll, _brute_nll(texts))


def _brute_mlt(texts: dict[int, str], seed: int, m: int, k: int):
    tf_by_doc: dict[int, dict[str, int]] = {}
    df: dict[str, int] = {}
    for did, text in texts.items():
        toks = tokenize_plain(text or "")
        if not toks:
            continue
        c: dict[str, int] = {}
        for t in toks:
            c[t] = c.get(t, 0) + 1
        tf_by_doc[did] = c
        for t in c:
            df[t] = df.get(t, 0) + 1
    n = len(tf_by_doc)
    seed_tf = tf_by_doc[seed]
    scored = sorted(
        (
            (-int(math.floor(c * abs(math.log(n / df[t])) * 1e6 + 0.5)), t)
            for t, c in seed_tf.items()
            if int(math.floor(c * abs(math.log(n / df[t])) * 1e6 + 0.5)) > 0
        )
    )
    kws = [t for _, t in scored[:m]]
    hits = []
    for did, c in tf_by_doc.items():
        if did == seed:
            continue
        s = sum(c.get(t, 0) * abs(math.log(n / df[t])) for t in kws if t in c)
        if s > 0:
            hits.append((did, int(math.floor(s * 1e6 + 0.5))))
    hits.sort(key=lambda r: (-r[1], r[0]))
    return hits[:k]


def test_more_like_this_matches_brute(ray_session, tmp_path):
    from indexer_ray.pipelines.query import more_like_this

    rng = np.random.default_rng(101)
    themes = {
        "astro": ["galaxy", "nebula", "orbit", "telescope", "stellar"],
        "cook": ["recipe", "flour", "oven", "saute", "broth"],
        "law": ["statute", "plaintiff", "verdict", "appeal", "counsel"],
    }
    common = ["the", "and", "report", "notes"]
    texts = {}
    for i in range(90):
        th = list(themes)[i % 3]
        texts[i] = " ".join(
            list(rng.choice(themes[th], size=8)) + list(rng.choice(common, size=4))
        )
    docs = pd.DataFrame(
        {"doc_id": pd.array(sorted(texts), dtype="int64"),
         "text": [texts[kk] for kk in sorted(texts)]}
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=4)

    import ray.data as rd

    from indexer_ray.pipelines.query import IndexSearcher

    s = IndexSearcher(idx)
    ds = rd.from_pandas(docs)
    for seed in (0, 1, 2):
        got = more_like_this(s, ds, seed, m=4, k=8)
        want = _brute_mlt(texts, seed, 4, 8)
        assert list(zip(got["doc_id"], got["score_q"])) == want, seed
        assert got["rank"].tolist() == list(range(len(want)))
        # same-theme docs dominate the neighbors
        theme = list(themes)[seed % 3]
        top = got["doc_id"].head(4).tolist()
        assert all(int(d) % 3 == seed % 3 for d in top), (seed, top)


def test_more_like_this_guards(ray_session, tmp_path):
    import ray.data as rd

    from indexer_ray.pipelines.query import IndexSearcher, more_like_this

    docs = pd.DataFrame({"doc_id": pd.array([0, 1], dtype="int64"),
                         "text": ["alpha beta", "beta gamma"]})
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=2)
    s = IndexSearcher(idx)
    with pytest.raises(KeyError):
        more_like_this(s, rd.from_pandas(docs), 99)


def test_ccnet_perplexity_buckets_ntile(ray_session, tmp_path):
    from indexer_ray.pipelines.query import ccnet_perplexity_buckets

    rng = np.random.default_rng(23)
    vocab = [f"w{i}" for i in range(30)]
    texts = {
        i: " ".join(rng.choice(vocab, size=rng.integers(3, 25)))
        for i in range(101)  # not divisible by 3: exercises the remainder
    }
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=4)
    out = (
        ccnet_perplexity_buckets(idx, n_parts=8)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert len(out) == 101
    sizes = out["bucket"].value_counts().sort_index()
    # NTILE(3) over 101 rows: first two buckets get 34, last gets 33
    assert sizes.tolist() == [34, 34, 33]
    assert out["label"].map({"head": 1, "middle": 2, "tail": 3}).tolist() == \
        out["bucket"].tolist()
    # rank semantics: every head ppl <= every middle ppl <= every tail ppl
    assert out.loc[out["bucket"] == 1, "ppl_q"].max() <= \
        out.loc[out["bucket"] == 2, "ppl_q"].min()
    assert out.loc[out["bucket"] == 2, "ppl_q"].max() <= \
        out.loc[out["bucket"] == 3, "ppl_q"].min()
    # NTILE against pandas replay of the same total order
    replay = out.sort_values(["ppl_q", "doc_id"]).reset_index(drop=True)
    n, k = len(replay), 3
    q, r = divmod(n, k)
    want = [min(i // (q + 1), r - 1) + 1 if i < r * (q + 1) or q == 0
            else r + (i - r * (q + 1)) // q + 1 for i in range(n)]
    assert replay["bucket"].tolist() == want
    # determinism across runs
    again = (
        ccnet_perplexity_buckets(idx, n_parts=8)
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, again)


def test_proximity_topk_minimal_windows(ray_session, tmp_path):
    import ray.data as rd

    from indexer_ray.pipelines.query import IndexSearcher, proximity_topk

    texts = {
        0: "alpha beta gamma",                      # window 3
        1: "alpha x x beta x gamma",                # window 6 (spans all three)
        2: "gamma beta alpha",                      # window 3, any order
        3: "alpha beta alpha gamma",                # window 3 via 2nd alpha
        4: "alpha beta",                            # missing gamma -> pruned
        5: "x alpha x x gamma x x x beta x",        # window 8
        6: "no query terms here at all",
    }
    docs = pd.DataFrame(
        {"doc_id": pd.array(list(texts), dtype="int64"), "text": list(texts.values())}
    )
    idx = _build(docs, str(tmp_path / "idx"), n_partitions=2)
    out = (
        proximity_topk(
            IndexSearcher(idx), rd.from_pandas(docs), "alpha beta gamma", k=10
        )
        .to_pandas()
        .sort_values("rank")
        .reset_index(drop=True)
    )
    want = {0: 3, 1: 6, 2: 3, 3: 3, 5: 8}
    assert dict(zip(out["doc_id"], out["window_len"])) == want
    # rank order: (window asc, doc_id asc)
    assert out["doc_id"].tolist() == [0, 2, 3, 1, 5]
    assert out["rank"].tolist() == list(range(5))
