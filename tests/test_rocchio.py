"""Rocchio pseudo-relevance feedback: the expansion must pick the term
that co-occurs with the query inside the feedback docs, and a document
that never mentions the query but matches the expansion must enter the
final ranking (the whole point of blind feedback)."""

import os

import pandas as pd
import pytest


@pytest.fixture(scope="module")
def rocchio_setup(ray_session, tmp_path_factory):
    from indexer_ray.pipelines.build import BuildConfig, build_index
    from indexer_ray.pipelines.query import IndexSearcher

    base = tmp_path_factory.mktemp("rocchio")
    docs_path = os.path.join(base, "docs.parquet")
    # feedback docs pair 'needle' with 'gemstone'; doc 50+ are pure
    # gemstone docs that never say needle; filler keeps idf meaningful
    rows = []
    for i in range(8):
        rows.append((i, "needle gemstone needle gemstone shared corpus"))
    for i in range(8, 12):
        rows.append((i, "gemstone vault gemstone vault deep storage"))
    for i in range(12, 60):
        rows.append((i, f"filler{i} common words drift apart slowly here"))
    df = pd.DataFrame(rows, columns=["doc_id", "text"])
    df.to_parquet(docs_path, index=False)
    idx = os.path.join(base, "index")
    build_index([docs_path], idx, BuildConfig(mode="plain", id_column="doc_id",
                                              n_partitions=4))
    return IndexSearcher(idx), docs_path


def test_rocchio_expands_with_cooccurring_term(rocchio_setup):
    from indexer_ray.pipelines.query import search_rocchio

    s, docs_path = rocchio_setup
    out = search_rocchio(s, docs_path, "needle", k=12, n_fb=5, m_exp=1)
    assert out["exp_terms"].iloc[0] == "gemstone"
    # the gemstone-only docs (8..11) never contain 'needle' but must now rank
    assert set(range(8, 12)) <= set(out["doc_id"])


def test_rocchio_rank_contract(rocchio_setup):
    from indexer_ray.pipelines.query import search_rocchio

    s, docs_path = rocchio_setup
    out = search_rocchio(s, docs_path, "needle", k=10, n_fb=5, m_exp=2)
    assert out["rank"].tolist() == list(range(len(out)))
    # scores non-increasing, doc_id asc within equal scores
    sq = out["score_q"].tolist()
    assert all(a >= b for a, b in zip(sq, sq[1:]))
    for a, b in zip(out.itertuples(), out.iloc[1:].itertuples()):
        if a.score_q == b.score_q:
            assert a.doc_id < b.doc_id


def test_rocchio_no_feedback_docs_returns_empty(rocchio_setup):
    from indexer_ray.pipelines.query import search_rocchio

    s, docs_path = rocchio_setup
    out = search_rocchio(s, docs_path, "zzznotindexedzzz", k=10)
    assert len(out) == 0


# --------------------------------------------- mine_hard_negatives


def test_hard_negatives_excludes_relevant(rocchio_setup):
    from indexer_ray.pipelines.evaluation import mine_hard_negatives
    from indexer_ray.pipelines.query import search_rocchio  # noqa: F401

    s, _ = rocchio_setup
    # query 'needle' matches docs 0-7; mark 0, 1 relevant
    qrels = pd.DataFrame({"query_id": [0, 0], "doc_id": [0, 1]})
    out = mine_hard_negatives(s, ["needle"], qrels, k=4)
    assert 0 not in set(out["doc_id"]) and 1 not in set(out["doc_id"])
    # negatives are the remaining needle docs, ranks dense from 0
    assert out["rank"].tolist() == [0, 1, 2, 3]
    assert set(out["doc_id"]) <= set(range(2, 8))


def test_hard_negatives_multi_query_ids(rocchio_setup):
    from indexer_ray.pipelines.evaluation import mine_hard_negatives

    s, _ = rocchio_setup
    qrels = pd.DataFrame({"query_id": [1], "doc_id": [8]})
    out = mine_hard_negatives(s, ["needle", "gemstone"], qrels, k=3)
    by_q = dict(tuple(out.groupby("query_id")))
    assert set(by_q) == {0, 1}
    assert 8 not in set(by_q[1]["doc_id"])  # excluded only for query 1


# --------------------------------------------- search_wildcard


def test_wildcard_expands_prefix(rocchio_setup):
    from indexer_ray.pipelines.query import search_wildcard

    s, _ = rocchio_setup
    # 'gem*' must expand to 'gemstone' and find the gemstone docs
    out = search_wildcard(s, "gem*", k=12)
    assert "gemstone" in out["exp_terms"].iloc[0].split()
    assert set(range(8, 12)) <= set(out["doc_id"])


def test_wildcard_no_m2_inflation(rocchio_setup):
    """a plain token repeated by its own expansion must not get the
    duplicate-token m^2 weight: 'needle need*' == 'needle' + other
    need-prefix terms (none here), so scores equal the plain query's."""
    import math

    from indexer_ray.pipelines.query import search_wildcard

    s, _ = rocchio_setup
    wild = search_wildcard(s, "needle need*", k=10)
    base = s.search("needle", k=None, scorer="tfidf", algorithm="exhaustive")
    base_q = sorted((-(int(math.floor(sc * 1e6 + 0.5))), d) for d, sc in base)[:10]
    assert wild["doc_id"].tolist() == [d for _, d in base_q]
    assert wild["score_q"].tolist() == [-q for q, _ in base_q]


def test_wildcard_requires_token(rocchio_setup):
    import pytest

    from indexer_ray.pipelines.query import search_wildcard

    s, _ = rocchio_setup
    with pytest.raises(ValueError):
        search_wildcard(s, "!!*", k=5)


# --------------------------------------------- ltr_features


def test_ltr_features_values(rocchio_setup):
    from indexer_ray.pipelines.evaluation import ltr_features

    s, docs_path = rocchio_setup
    out = ltr_features(s, docs_path, "needle gemstone", k=10)
    row = out[out["doc_id"] == 0].iloc[0]
    # doc 0: "needle gemstone needle gemstone shared corpus"
    assert row["n_matched"] == 2
    assert row["sum_tf"] == 4
    assert row["dl"] == 6
    assert row["min_window"] == 2  # adjacent pair
    # gemstone-only docs match one term -> window sentinel
    g = out[out["doc_id"] == 8].iloc[0]
    assert g["n_matched"] == 1 and g["min_window"] == -1
    # ranks dense, tfidf_q non-increasing
    assert out["rank"].tolist() == list(range(len(out)))
    tq = out["tfidf_q"].tolist()
    assert all(a >= b for a, b in zip(tq, tq[1:]))
    assert (out["bm25_q"] > 0).all()


def test_ltr_min_window_multi_term(rocchio_setup):
    from indexer_ray.pipelines.evaluation import ltr_features

    s, docs_path = rocchio_setup
    # three-term query over the feedback docs: needle..gemstone..shared
    out = ltr_features(s, docs_path, "needle gemstone shared", k=5)
    row = out[out["doc_id"] == 0].iloc[0]
    # "needle gemstone needle gemstone shared corpus": best span is
    # positions 2..4 (needle, gemstone, shared) -> window 3
    assert row["min_window"] == 3
