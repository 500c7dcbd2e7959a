"""Tests for the LSM-style index merge (pipelines/merge.py): merged
base+delta must be query- and postings-equivalent to a fresh build over
the newest corpus, across id modes and superseded-set regimes, with the
build's resume contract intact."""

import glob
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _pages(texts, changed, scheme="u"):
    n = len(texts)
    return pa.table(
        {
            "url": pa.array([f"{scheme}://{i}" for i in range(n)], type=pa.string()),
            "warc_ts": pa.array(
                [1_000_000 if i in changed else 0 for i in range(n)],
                type=pa.timestamp("us"),
            ),
            "html": pa.array([b""] * n, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
        }
    )


def _corpus(n_docs=300, vocab=150, seed=7, words=25):
    rng = np.random.default_rng(seed)
    v = [f"w{i}" for i in range(vocab)]
    probs = 1.0 / np.arange(1, vocab + 1)
    probs /= probs.sum()
    return [" ".join(rng.choice(v, size=words, p=probs)) for _ in range(n_docs)]


@pytest.fixture()
def merged_setup(tmp_path, ray_session):
    """base(v1) + delta(v2 changed docs) + fresh(v2) builds, one per id
    mode on demand."""
    from indexer_ray.pipelines.build import BuildConfig, build_index
    from indexer_ray.pipelines.incremental import build_delta_index

    def make(id_assign, **cfg_kw):
        root = tmp_path / id_assign
        root.mkdir(exist_ok=True)
        texts2 = _corpus()
        changed = {i for i in range(len(texts2)) if i % 4 == 0}
        texts1 = [("old junk line" if i in changed else t) for i, t in enumerate(texts2)]
        pq.write_table(_pages(texts1, set()), str(root / "v1.parquet"))
        pq.write_table(_pages(texts2, changed), str(root / "v2.parquet"))
        cfg = BuildConfig(mode="plain", n_partitions=8, id_assign=id_assign, **cfg_kw)
        build_index([str(root / "v1.parquet")], str(root / "idx_base"), cfg)
        _, n_exp = build_delta_index(
            [str(root / "v2.parquet")], str(root / "idx_base"), str(root / "idx_delta"), cfg
        )
        assert n_exp == len(changed)
        build_index([str(root / "v2.parquet")], str(root / "idx_fresh"), cfg)
        return root

    return make


def _urlmap(index_dir):
    fs = sorted(glob.glob(os.path.join(index_dir, "docmap", "*.parquet")))
    t = pq.read_table(fs, columns=["doc_id", "url"])
    return dict(zip(t.column("doc_id").to_pylist(), t.column("url").to_pylist()))


def _assert_equivalent(merged_dir, fresh_dir, by_url):
    from indexer_ray.pipelines.query import IndexSearcher

    sm, sf = IndexSearcher(merged_dir), IndexSearcher(fresh_dir)
    for q in ("w0 w2", "w5 w30 w1", "junk old", "w100"):
        rm, rf = sm.search(q, k=15), sf.search(q, k=15)
        if by_url:
            um, uf = _urlmap(merged_dir), _urlmap(fresh_dir)
            a = sorted((um[d], round(s, 9)) for d, s in rm)
            b = sorted((uf[d], round(s, 9)) for d, s in rf)
        else:
            a = [(d, round(s, 9)) for d, s in rm]
            b = [(d, round(s, 9)) for d, s in rf]
        assert a == b, f"query {q!r} diverged"
    if not by_url:  # hash/native ids are identical -> postings comparable
        for t in ("w0", "w10", "w80", "junk"):
            dm, tm = sm.term_postings(t)
            df, tf = sf.term_postings(t)
            assert np.array_equal(dm, df) and np.array_equal(tm, tf), t


def test_merge_hash_ids_equals_fresh_build(merged_setup):
    from indexer_ray.pipelines.merge import merge_indexes

    root = merged_setup("hash")
    m = merge_indexes(str(root / "idx_base"), str(root / "idx_delta"), str(root / "idx_m"))
    f = __import__("indexer_ray.state.manifest", fromlist=["IndexManifest"]).IndexManifest.load(
        str(root / "idx_fresh")
    )
    assert (m.n_docs, m.total_doc_len) == (f.n_docs, f.total_doc_len)
    _assert_equivalent(str(root / "idx_m"), str(root / "idx_fresh"), by_url=False)


def test_merge_dense_ids_equals_fresh_build_by_url(merged_setup):
    from indexer_ray.pipelines.merge import merge_indexes

    root = merged_setup("dense")
    m = merge_indexes(str(root / "idx_base"), str(root / "idx_delta"), str(root / "idx_m"))
    assert m.n_docs == 300 and m.total_doc_len == 7500
    _assert_equivalent(str(root / "idx_m"), str(root / "idx_fresh"), by_url=True)
    # remapped delta ids are collision-free with surviving base ids
    um = _urlmap(str(root / "idx_m"))
    assert len(um) == 300 and len(set(um.values())) == 300


def test_merge_join_regime_equals_broadcast(merged_setup):
    from indexer_ray.pipelines.merge import merge_indexes
    from indexer_ray.pipelines.query import IndexSearcher

    root = merged_setup("hash")
    merge_indexes(str(root / "idx_base"), str(root / "idx_delta"), str(root / "idx_b"))
    merge_indexes(
        str(root / "idx_base"),
        str(root / "idx_delta"),
        str(root / "idx_j"),
        broadcast_urls_threshold=0,  # force the distributed-join regime
    )
    sb, sj = IndexSearcher(str(root / "idx_b")), IndexSearcher(str(root / "idx_j"))
    for q in ("w0 w2", "junk old"):
        assert [(d, round(s, 9)) for d, s in sb.search(q, k=15)] == [
            (d, round(s, 9)) for d, s in sj.search(q, k=15)
        ]
    for t in ("w0", "junk"):
        db, tb = sb.term_postings(t)
        dj, tj = sj.term_postings(t)
        assert np.array_equal(db, dj) and np.array_equal(tb, tj)


def test_merge_resume_after_phase1(merged_setup):
    """Kill after phase 1 (raw + docmap written, no partitions encoded):
    resume must complete to the same index."""
    from indexer_ray.pipelines import merge as merge_mod
    from indexer_ray.pipelines.merge import merge_indexes
    from indexer_ray.pipelines.query import IndexSearcher

    root = merged_setup("hash")
    out = str(root / "idx_resume")

    orig = merge_mod._encode_partition_batch

    def _boom(*a, **k):
        # runs inside Ray workers: the raise propagates to the driver
        raise RuntimeError("injected crash before encode")

    merge_mod._encode_partition_batch = _boom
    try:
        with pytest.raises(Exception):
            merge_indexes(str(root / "idx_base"), str(root / "idx_delta"), out)
    finally:
        merge_mod._encode_partition_batch = orig
    # phase 1 checkpointed, no commit point yet
    assert not os.path.exists(os.path.join(out, "manifest.json"))
    assert os.path.exists(os.path.join(out, "progress.json"))
    # resume completes from the phase-1 checkpoint
    m = merge_indexes(str(root / "idx_base"), str(root / "idx_delta"), out, resume=True)
    assert m.n_docs == 300
    merge_indexes(str(root / "idx_base"), str(root / "idx_delta"), str(root / "idx_ref"))
    sr, sf = IndexSearcher(out), IndexSearcher(str(root / "idx_ref"))
    for q in ("w0 w2", "junk old"):
        assert [(d, round(s, 9)) for d, s in sr.search(q, k=10)] == [
            (d, round(s, 9)) for d, s in sf.search(q, k=10)
        ]


def test_merge_rejects_tokenizer_mismatch(tmp_path, ray_session):
    from indexer_ray.pipelines.build import BuildConfig, build_index
    from indexer_ray.pipelines.merge import merge_indexes

    texts = _corpus(n_docs=40)
    pq.write_table(_pages(texts, set()), str(tmp_path / "p.parquet"))
    build_index(
        [str(tmp_path / "p.parquet")],
        str(tmp_path / "ia"),
        BuildConfig(mode="plain", n_partitions=4),
    )
    build_index(
        [str(tmp_path / "p.parquet")],
        str(tmp_path / "ib"),
        BuildConfig(mode="conformance", n_partitions=4),
    )
    with pytest.raises(ValueError, match="tokenizer config mismatch"):
        merge_indexes(str(tmp_path / "ia"), str(tmp_path / "ib"), str(tmp_path / "im"))


def test_merge_preserves_hot_term_salting(tmp_path, ray_session):
    """A term hot enough to be salted at build time must stay salted —
    and findable — in the merged index (union of hot sets, same routing)."""
    from indexer_ray.pipelines.build import BuildConfig, build_index
    from indexer_ray.pipelines.incremental import build_delta_index
    from indexer_ray.pipelines.merge import merge_indexes
    from indexer_ray.pipelines.query import IndexSearcher
    from indexer_ray.state.manifest import IndexManifest

    n = 200
    texts2 = [f"hotword filler{i % 37} tail{i % 11}" for i in range(n)]
    changed = {i for i in range(n) if i % 5 == 0}
    texts1 = [("stale text" if i in changed else t) for i, t in enumerate(texts2)]
    pq.write_table(_pages(texts1, set()), str(tmp_path / "v1.parquet"))
    pq.write_table(_pages(texts2, changed), str(tmp_path / "v2.parquet"))
    # tiny run budget -> 'hotword' (df-ratio ~1) must be salted
    cfg = BuildConfig(mode="plain", n_partitions=8, target_run_postings=64)
    build_index([str(tmp_path / "v1.parquet")], str(tmp_path / "base"), cfg)
    build_delta_index(
        [str(tmp_path / "v2.parquet")], str(tmp_path / "base"), str(tmp_path / "delta"), cfg
    )
    m = merge_indexes(str(tmp_path / "base"), str(tmp_path / "delta"), str(tmp_path / "m"))
    assert "hotword" in m.hot_terms and m.hot_terms["hotword"] >= 2
    s = IndexSearcher(str(tmp_path / "m"))
    d, t = s.term_postings("hotword")
    assert len(d) == n  # every doc, across all salted runs
    assert np.array_equal(np.sort(d), d)  # runs concatenate doc_id-sorted


# ------------------------------------------------------------ merge_many
def _three_generations(tmp_path, id_assign):
    """gen0: 200 docs (stale text for the to-be-updated ones); gen1
    re-indexes i%8==0 (intermediate) and i%8==4 (final); gen2 re-indexes
    i%8==0 (final).  Truth = final state: last generation wins."""
    from indexer_ray.pipelines.build import BuildConfig, build_index

    n = 200
    final = _corpus(n_docs=n, seed=13)
    v0 = [
        ("stale zero text" if i % 8 in (0, 4) else t) for i, t in enumerate(final)
    ]
    g1_ids = [i for i in range(n) if i % 8 in (0, 4)]
    g1_txt = [("middle junk words" if i % 8 == 0 else final[i]) for i in g1_ids]
    g2_ids = [i for i in range(n) if i % 8 == 0]
    g2_txt = [final[i] for i in g2_ids]

    def pages_for(ids, texts):
        m = len(ids)
        return pa.table(
            {
                "url": pa.array([f"u://{i}" for i in ids], type=pa.string()),
                "warc_ts": pa.array([0] * m, type=pa.timestamp("us")),
                "html": pa.array([b""] * m, type=pa.binary()),
                "text": pa.array(texts, type=pa.string()),
            }
        )

    cfg = BuildConfig(mode="plain", n_partitions=4, id_assign=id_assign)
    dirs = []
    for name, ids, texts in (
        ("g0", list(range(n)), v0),
        ("g1", g1_ids, g1_txt),
        ("g2", g2_ids, g2_txt),
    ):
        pq.write_table(pages_for(ids, texts), str(tmp_path / f"{name}.parquet"))
        build_index([str(tmp_path / f"{name}.parquet")], str(tmp_path / name), cfg)
        dirs.append(str(tmp_path / name))
    pq.write_table(
        pages_for(list(range(n)), final), str(tmp_path / "final.parquet")
    )
    build_index([str(tmp_path / "final.parquet")], str(tmp_path / "fresh"), cfg)
    return dirs, str(tmp_path / "fresh")


def test_merge_many_last_generation_wins_hash(tmp_path, ray_session):
    from indexer_ray.pipelines.merge import merge_many
    from indexer_ray.pipelines.query import IndexSearcher

    dirs, fresh = _three_generations(tmp_path, "hash")
    m = merge_many(dirs, str(tmp_path / "m"))
    sm, sf = IndexSearcher(str(tmp_path / "m")), IndexSearcher(fresh)
    assert m.n_docs == 200
    for q in ("w0 w2", "middle junk", "stale zero"):
        assert [(d, round(s, 9)) for d, s in sm.search(q, k=15)] == [
            (d, round(s, 9)) for d, s in sf.search(q, k=15)
        ]
    for t in ("w0", "middle", "stale", "zero"):
        dm, tm = sm.term_postings(t)
        df, tf = sf.term_postings(t)
        assert np.array_equal(dm, df) and np.array_equal(tm, tf), t


def test_merge_many_dense_by_url(tmp_path, ray_session):
    from indexer_ray.pipelines.merge import merge_many
    from indexer_ray.pipelines.query import IndexSearcher

    dirs, fresh = _three_generations(tmp_path, "dense")
    m = merge_many(dirs, str(tmp_path / "m"))
    assert m.n_docs == 200
    sm, sf = IndexSearcher(str(tmp_path / "m")), IndexSearcher(fresh)
    um, uf = _urlmap(str(tmp_path / "m")), _urlmap(fresh)
    assert len(um) == 200 and len(set(um.values())) == 200
    for q in ("w0 w2", "middle junk", "stale zero"):
        a = sorted((um[d], round(s, 9)) for d, s in sm.search(q, k=15))
        b = sorted((uf[d], round(s, 9)) for d, s in sf.search(q, k=15))
        assert a == b, q


def test_merge_many_cascade_equals_single_pass(tmp_path, ray_session):
    from indexer_ray.pipelines.merge import merge_many
    from indexer_ray.pipelines.query import IndexSearcher

    dirs, _ = _three_generations(tmp_path, "hash")
    merge_many(dirs, str(tmp_path / "single"))
    # threshold 0 forces the pairwise cascade (join regime inside)
    merge_many(dirs, str(tmp_path / "cascade"), broadcast_urls_threshold=0)
    ss = IndexSearcher(str(tmp_path / "single"))
    sc = IndexSearcher(str(tmp_path / "cascade"))
    for t in ("w0", "middle", "stale"):
        ds_, ts_ = ss.term_postings(t)
        dc_, tc_ = sc.term_postings(t)
        assert np.array_equal(ds_, dc_) and np.array_equal(ts_, tc_), t


# ------------------------------------------------------------ delete_docs
@pytest.fixture()
def delete_setup(tmp_path, ray_session):
    """full corpus index + fresh index over the corpus minus the deleted
    urls, one per id mode on demand."""
    from indexer_ray.pipelines.build import BuildConfig, build_index

    def make(id_assign):
        root = tmp_path / f"del_{id_assign}"
        root.mkdir(exist_ok=True)
        texts = _corpus()
        deleted = {i for i in range(len(texts)) if i % 5 == 0}
        pq.write_table(_pages(texts, set()), str(root / "full.parquet"))
        kept_tbl = _pages(texts, set()).filter(
            pa.array([i not in deleted for i in range(len(texts))])
        )
        pq.write_table(kept_tbl, str(root / "kept.parquet"))
        cfg = BuildConfig(mode="plain", n_partitions=8, id_assign=id_assign)
        build_index([str(root / "full.parquet")], str(root / "idx_full"), cfg)
        build_index([str(root / "kept.parquet")], str(root / "idx_kept_fresh"), cfg)
        urls = [f"u://{i}" for i in sorted(deleted)]
        return root, urls

    return make


def test_delete_docs_hash_ids_equals_fresh_build(delete_setup):
    from indexer_ray.pipelines.merge import delete_docs

    root, urls = delete_setup("hash")
    m = delete_docs(str(root / "idx_full"), urls, str(root / "idx_del"))
    assert m.n_docs == 300 - len(urls)
    _assert_equivalent(str(root / "idx_del"), str(root / "idx_kept_fresh"), by_url=False)
    # deleted urls are gone from the docmap
    um = _urlmap(str(root / "idx_del"))
    assert set(urls).isdisjoint(set(um.values()))


def test_delete_docs_dataset_join_regime_equals_broadcast(delete_setup, ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.merge import delete_docs
    from indexer_ray.pipelines.query import IndexSearcher

    root, urls = delete_setup("hash")
    url_ds = rd.from_arrow(pa.table({"url": pa.array(urls, type=pa.string())}))
    delete_docs(
        str(root / "idx_full"), urls, str(root / "idx_del_b")
    )
    delete_docs(
        str(root / "idx_full"), url_ds, str(root / "idx_del_j"),
        broadcast_urls_threshold=0,
    )
    sb = IndexSearcher(str(root / "idx_del_b"))
    sj = IndexSearcher(str(root / "idx_del_j"))
    for q in ("w0 w2", "w5 w30 w1", "w100"):
        assert [(d, round(s, 9)) for d, s in sb.search(q, k=15)] == [
            (d, round(s, 9)) for d, s in sj.search(q, k=15)
        ]
    for t in ("w0", "w10", "w80"):
        db, tb = sb.term_postings(t)
        dj, tj = sj.term_postings(t)
        assert np.array_equal(db, dj) and np.array_equal(tb, tj)


def test_delete_docs_noop_and_unknown_urls(delete_setup):
    from indexer_ray.pipelines.merge import delete_docs
    from indexer_ray.pipelines.query import IndexSearcher

    root, _ = delete_setup("hash")
    m = delete_docs(
        str(root / "idx_full"), ["u://nope", "x://absent"], str(root / "idx_noop")
    )
    assert m.n_docs == 300
    s0 = IndexSearcher(str(root / "idx_full"))
    s1 = IndexSearcher(str(root / "idx_noop"))
    for q in ("w0 w2", "w100"):
        assert [(d, round(s, 9)) for d, s in s0.search(q, k=15)] == [
            (d, round(s, 9)) for d, s in s1.search(q, k=15)
        ]
