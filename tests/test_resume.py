"""Checkpoint/resume + determinism (SURVEY.md §5.5, north rule: resumable
from per-partition checkpoints; retried/resumed partitions byte-identical)."""

import glob
import json
import os
import shutil

import pytest

from indexer_ray.pipelines.build import BuildConfig, build_index
from indexer_ray.pipelines.query import IndexSearcher


def _cfg(**kw):
    base = dict(
        n_partitions=8,
        block_size=16,
        sample_docs=100,
        hot_df_ratio=0.10,
        tokenize_actors=2,
        batch_size=64,
        keep_raw=True,
    )
    base.update(kw)
    return BuildConfig(**base)


def _file_bytes(path):
    with open(path, "rb") as f:
        return f.read()


def _parts_snapshot(index_dir):
    out = {}
    for d in sorted(glob.glob(os.path.join(index_dir, "parts", "*"))):
        pid = os.path.basename(d)
        out[pid] = (
            _file_bytes(os.path.join(d, "blocks.parquet")),
            _file_bytes(os.path.join(d, "dict.parquet")),
        )
    return out


@pytest.fixture(scope="module")
def reference_build(ray_session, tiny_pages, tmp_path_factory):
    index_dir = str(tmp_path_factory.mktemp("idx") / "ref")
    m = build_index([tiny_pages], index_dir, _cfg())
    return index_dir, m


def test_resume_after_partial_phase2(ray_session, tiny_pages, reference_build, tmp_path_factory):
    ref_dir, _ = reference_build
    idx = str(tmp_path_factory.mktemp("idx") / "resume")
    build_index([tiny_pages], idx, _cfg())
    # simulate a crash after phase 1 + two completed partitions: remove the
    # manifest (commit point), and wipe all but two part checkpoints
    os.remove(os.path.join(idx, "manifest.json"))
    kept = sorted(os.listdir(os.path.join(idx, "parts")))[:2]
    for d in sorted(os.listdir(os.path.join(idx, "parts"))):
        if d not in kept:
            shutil.rmtree(os.path.join(idx, "parts", d))
    m = build_index([tiny_pages], idx, _cfg(), resume=True)
    assert _parts_snapshot(idx) == _parts_snapshot(ref_dir)
    ref_m = json.load(open(os.path.join(ref_dir, "manifest.json")))
    new_m = json.load(open(os.path.join(idx, "manifest.json")))
    assert new_m["n_docs"] == ref_m["n_docs"]
    assert new_m["total_doc_len"] == ref_m["total_doc_len"]


def test_determinism_across_batching(ray_session, tiny_pages, reference_build, tmp_path_factory):
    """Different batch sizes / scheduling -> byte-identical index artifacts
    (the raw shuffle layout differs; the encoded output must not)."""
    ref_dir, _ = reference_build
    idx = str(tmp_path_factory.mktemp("idx") / "alt")
    build_index([tiny_pages], idx, _cfg(batch_size=47, tokenize_actors=3))
    assert _parts_snapshot(idx) == _parts_snapshot(ref_dir)


def test_resume_skips_completed_partitions(ray_session, tiny_pages, reference_build):
    """A no-op resume re-encodes nothing (checkpoint markers respected)."""
    ref_dir, _ = reference_build
    metas_before = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(ref_dir, "parts", "*", "blocks.parquet"))
    }
    inputs = json.load(open(os.path.join(ref_dir, "progress.json")))["input_files"]
    build_index(inputs, ref_dir, _cfg(), resume=True)
    metas_after = {
        p: os.path.getmtime(p)
        for p in glob.glob(os.path.join(ref_dir, "parts", "*", "blocks.parquet"))
    }
    assert metas_before == metas_after


def test_queries_work_after_resume(ray_session, tiny_pages, reference_build, tmp_path_factory):
    ref_dir, _ = reference_build
    s = IndexSearcher(ref_dir)
    assert s.search("needle17", k=3)
