"""_docmap_stats: fast no-shuffle path for disjoint-range fragments (the
dense-id layout) and the groupby-dedup fallback for overlapping ranges
(hash/native ids), per the manifest retry contract."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from indexer_ray.pipelines.build import _docmap_stats


def _write_frag(path, ids, dls):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(ids, type=pa.uint64()),
                "doc_len": pa.array(dls, type=pa.uint32()),
                "url": pa.array([f"u://{i}" for i in ids], type=pa.string()),
            }
        ),
        path,
    )


def test_disjoint_fast_path(ray_session, tmp_path):
    d = tmp_path / "docmap"
    d.mkdir()
    _write_frag(str(d / "a.parquet"), [0, 1, 2], [10, 20, 30])
    _write_frag(str(d / "b.parquet"), [3, 4], [5, 5])
    n, total, max_c = _docmap_stats(str(d))
    assert (n, total, max_c) == (5, 70, 1)


def test_overlap_falls_back_and_dedups(ray_session, tmp_path):
    """Duplicate doc_ids across overlapping fragments (a retry artifact /
    hash-id layout) must be DEDUPED in the stats and reported via
    max_rows_per_doc_id — not double-counted into N/avgdl (round-1 ADVICE:
    raw row counts skewed idf)."""
    d = tmp_path / "docmap"
    d.mkdir()
    _write_frag(str(d / "a.parquet"), [0, 1, 2], [10, 20, 30])
    _write_frag(str(d / "b.parquet"), [2, 3], [30, 40])  # id 2 duplicated
    n, total, max_c = _docmap_stats(str(d))
    assert n == 4  # distinct ids
    assert total == 100  # one doc_len per id
    assert max_c == 2


def test_within_file_duplicate_detected(ray_session, tmp_path):
    d = tmp_path / "docmap"
    d.mkdir()
    _write_frag(str(d / "a.parquet"), [0, 1, 1], [10, 20, 20])
    n, total, max_c = _docmap_stats(str(d))
    assert (n, max_c) == (2, 2)


def test_empty_docmap(ray_session, tmp_path):
    d = tmp_path / "docmap"
    d.mkdir()
    assert _docmap_stats(str(d)) == (0, 0, 0)


def test_hash_mode_duplicate_url_raises(ray_session, tmp_path):
    """End-to-end: a hash-id build over input with a duplicated url must
    fail loudly (collision/duplicate detection), not silently skew stats."""
    import pytest

    from indexer_ray.pipelines.build import BuildConfig, build_index

    pages = pa.table(
        {
            "url": pa.array(["u://same", "u://same", "u://other"], type=pa.string()),
            "warc_ts": pa.array([0, 1, 2], type=pa.timestamp("us")),
            "html": pa.array([b""] * 3, type=pa.binary()),
            "text": pa.array(["alpha beta", "gamma delta", "epsilon zeta"], type=pa.string()),
            "lang": pa.array(["en"] * 3, type=pa.string()),
        }
    )
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    with pytest.raises(RuntimeError, match="collision or duplicate url"):
        build_index(
            [p],
            str(tmp_path / "idx"),
            BuildConfig(n_partitions=2, id_assign="hash", tokenize_actors=1),
        )
