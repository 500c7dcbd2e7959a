"""Query-service actor pool (Q9 analogue; pipelines/serve.py)."""

import pytest

from indexer_ray.pipelines.build import BuildConfig, build_index
from indexer_ray.pipelines.query import IndexSearcher
from indexer_ray.pipelines.serve import QueryService, _merge_topk


@pytest.fixture(scope="module")
def served_index(ray_session, tiny_pages, tmp_path_factory):
    idx = str(tmp_path_factory.mktemp("srv") / "idx")
    build_index([tiny_pages], idx, BuildConfig(n_partitions=4, tokenize_actors=2))
    return idx


def test_service_matches_local_searcher(served_index, ray_session):
    svc = QueryService(served_index, replicas=2)
    try:
        local = IndexSearcher(served_index)
        for q in ("needle17", "needle42 needle43", "2024"):
            assert svc.search(q, k=5) == local.search(q, k=5, scorer="bm25", algorithm="auto")
        # every replica answers identically (round robin cycles through both)
        outs = svc.search_many(["needle17"] * 4, k=3)
        assert all(o == outs[0] for o in outs)
    finally:
        svc.shutdown()


def test_merge_topk_tie_break():
    a = [(5, 2.0), (1, 1.0)]
    b = [(3, 2.0), (2, 1.5)]
    assert _merge_topk([a, b], 3) == [(3, 2.0), (5, 2.0), (2, 1.5)]
