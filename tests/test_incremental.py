"""Incremental re-index tests (A5 analogue: lib.rs:210-224 mtime skip,
re-expressed as a (url, warc_ts) freshness anti-join; SURVEY.md §2.4)."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from indexer_ray.pipelines.build import BuildConfig, build_index
from indexer_ray.pipelines.incremental import build_delta_index, filter_expired
from indexer_ray.sources.pages import generate_pages_parquet


@pytest.fixture(scope="module")
def prior_index(tmp_path_factory, ray_session):
    root = tmp_path_factory.mktemp("incr")
    pages = str(root / "pages.parquet")
    generate_pages_parquet(pages, n_rows=300, seed=42)
    idx = str(root / "index")
    build_index([pages], idx, BuildConfig(n_partitions=4))
    return root, pages, idx


def _second_batch(root, pages: str) -> str:
    """200 unchanged + 50 re-crawled (newer warc_ts) + 60 brand-new pages."""
    t = pq.read_table(pages)
    unchanged = t.slice(0, 200)
    recrawled = t.slice(200, 50)
    bumped = recrawled.set_column(
        recrawled.schema.get_field_index("warc_ts"),
        "warc_ts",
        pa.compute.add(recrawled.column("warc_ts"), pa.scalar(10**9, type=pa.duration("us"))),
    )
    new_path = str(root / "pages2_new.parquet")
    generate_pages_parquet(new_path, n_rows=60, seed=42, start=1000)
    newt = pq.read_table(new_path)
    merged = pa.concat_tables([unchanged, bumped, newt]).combine_chunks()
    out = str(root / "pages2.parquet")
    pq.write_table(merged, out)
    return out


@pytest.mark.parametrize("method", ["broadcast", "join"])
def test_filter_expired(prior_index, method, ray_session):
    import ray.data as rd

    root, pages, idx = prior_index
    pages2 = _second_batch(root, pages)
    expired = filter_expired(rd.read_parquet(pages2), idx, method=method)
    t = expired.to_pandas()
    # exactly the 50 re-crawled + 60 new pages need indexing
    assert len(t) == 110
    assert set(t.columns) >= {"url", "warc_ts", "html", "text", "lang"}
    urls = set(t["url"])
    orig = pq.read_table(pages, columns=["url"]).column("url").to_pylist()
    assert sum(1 for u in orig[200:250] if u in urls) == 50
    assert sum(1 for u in orig[:200] if u in urls) == 0


def test_build_delta_index(prior_index, ray_session, tmp_path):
    root, pages, idx = prior_index
    pages2 = _second_batch(root, pages)
    delta_dir = str(tmp_path / "delta")
    manifest, n = build_delta_index(
        [pages2], idx, delta_dir, BuildConfig(n_partitions=4), method="broadcast"
    )
    assert n == 110
    assert manifest.n_docs == 110
    # delta index is searchable on its own
    from indexer_ray.pipelines.query import IndexSearcher

    s = IndexSearcher(delta_dir)
    hits = s.search("needle1005", k=5)
    assert len(hits) >= 1


def test_build_delta_index_rerunnable(prior_index, ray_session, tmp_path):
    """A second build_delta_index over the same inputs must neither crash
    (round-1: the fresh build wiped its own _input) nor double-index."""
    root, pages, idx = prior_index
    pages2 = _second_batch(root, pages)
    delta_dir = str(tmp_path / "delta_rerun")
    m1, n1 = build_delta_index(
        [pages2], idx, delta_dir, BuildConfig(n_partitions=4), method="broadcast"
    )
    m2, n2 = build_delta_index(
        [pages2], idx, delta_dir, BuildConfig(n_partitions=4), method="broadcast"
    )
    assert (n1, m1.n_docs) == (n2, m2.n_docs) == (110, 110)
    # resume path also works and reuses the checkpointed subset
    m3, n3 = build_delta_index(
        [pages2], idx, delta_dir, BuildConfig(n_partitions=4),
        method="broadcast", resume=True,
    )
    assert (n3, m3.n_docs) == (110, 110)


def test_no_changes_returns_zero(prior_index, ray_session, tmp_path):
    root, pages, idx = prior_index
    manifest, n = build_delta_index(
        [pages], idx, str(tmp_path / "d2"), BuildConfig(n_partitions=4), method="broadcast"
    )
    assert n == 0 and manifest is None
