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


def test_sharded_search_rank_identical_to_single_index(ray_session, tiny_pages, tmp_path_factory):
    """Doc-sharded deployment: two half-corpus shard indexes queried with
    gathered global stats must equal the single full-corpus index exactly."""
    import pyarrow.parquet as pq

    from indexer_ray.pipelines.serve import ShardedSearcher
    from indexer_ray.sources.pages import reference_queries

    root = tmp_path_factory.mktemp("shards")
    t = pq.read_table(tiny_pages)
    half = t.num_rows // 2
    a, b = str(root / "a.parquet"), str(root / "b.parquet")
    pq.write_table(t.slice(0, half), a)
    pq.write_table(t.slice(half), b)
    cfg = dict(n_partitions=4, block_size=16, tokenize_actors=2)
    idx_a, idx_b = str(root / "idx_a"), str(root / "idx_b")
    build_index([a], idx_a, BuildConfig(id_offset=0, **cfg))
    build_index([b], idx_b, BuildConfig(id_offset=half, **cfg))
    full_idx = str(root / "idx_full")
    build_index([tiny_pages], full_idx, BuildConfig(**cfg))

    sharded = ShardedSearcher([idx_a, idx_b])
    local = IndexSearcher(full_idx)
    assert sharded.n_docs == local.n_docs
    assert sharded.avgdl == pytest.approx(local.avgdl)
    try:
        for q in reference_queries():
            for scorer in ("tfidf", "bm25"):
                got = sharded.search(q["query"], k=10, scorer=scorer, algorithm="auto")
                want = local.search(q["query"], k=10, scorer=scorer, algorithm="auto")
                assert [d for d, _ in got] == [d for d, _ in want], (q["query"], scorer)
                for (_, gs_), (_, ws) in zip(got, want):
                    assert gs_ == pytest.approx(ws, rel=1e-12)
    finally:
        sharded.shutdown()
