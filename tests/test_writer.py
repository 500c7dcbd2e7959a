"""Resumable partitioned-parquet sink: skip-finished resume, manifest-last
commit, byte determinism."""

import glob
import hashlib
import json
import os

import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from indexer_ray.sources.writer import read_partitioned, write_partitioned_resumable


def _corpus(n=2000, seed=3):
    rng = np.random.default_rng(seed)
    return pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype=np.int64),
            "text": [f"doc {i} {rng.integers(0, 9)}" for i in range(n)],
        }
    )


def _file_hashes(out):
    return {
        os.path.relpath(f, out): hashlib.blake2b(open(f, "rb").read()).hexdigest()
        for f in sorted(glob.glob(os.path.join(out, "part_*", "data.parquet")))
    }


def test_write_read_roundtrip_and_determinism(ray_session, tmp_path):
    df = _corpus()
    out1, out2 = str(tmp_path / "w1"), str(tmp_path / "w2")
    m1 = write_partitioned_resumable(rd.from_pandas(df), out1, "doc_id", n_parts=8)
    write_partitioned_resumable(
        rd.from_pandas(df.sample(frac=1.0, random_state=7)).repartition(5),
        out2,
        "doc_id",
        n_parts=8,
    )
    assert m1["n_rows"] == len(df)
    back = (
        read_partitioned(out1).to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(back, df)
    # byte-identical across input layouts (route + in-partition sort)
    assert _file_hashes(out1) == _file_hashes(out2)


def test_resume_skips_finished_partitions(ray_session, tmp_path):
    df = _corpus()
    out = str(tmp_path / "w")
    write_partitioned_resumable(rd.from_pandas(df), out, "doc_id", n_parts=8)
    before = _file_hashes(out)

    # simulate a crash: two partitions lose their marker + file; the
    # manifest (written last) is gone too
    for p in (1, 5):
        os.remove(os.path.join(out, f"part_{p}", "_done.json"))
        os.remove(os.path.join(out, f"part_{p}", "data.parquet"))
    os.remove(os.path.join(out, "manifest.json"))
    with pytest.raises(FileNotFoundError):
        read_partitioned(out)

    # poison the finished partitions' files: resume must NOT rewrite them
    finished = [p for p in range(8) if p not in (1, 5)]
    sentinel = {}
    for p in finished:
        fp = os.path.join(out, f"part_{p}", "data.parquet")
        sentinel[p] = os.path.getmtime(fp)

    m = write_partitioned_resumable(
        rd.from_pandas(df), out, "doc_id", n_parts=8, resume=True
    )
    assert m["n_rows"] == len(df)
    after = _file_hashes(out)
    assert after == before  # rewritten partitions reproduce bytes exactly
    for p in finished:
        fp = os.path.join(out, f"part_{p}", "data.parquet")
        assert os.path.getmtime(fp) == sentinel[p]  # untouched

    back = read_partitioned(out).to_pandas().sort_values("doc_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(back, df)


def test_fresh_write_clears_stale_output(ray_session, tmp_path):
    df = _corpus(500)
    out = str(tmp_path / "w")
    write_partitioned_resumable(rd.from_pandas(df), out, "doc_id", n_parts=4)
    # a fresh (non-resume) write over fewer rows must not leave stale rows
    write_partitioned_resumable(
        rd.from_pandas(df.head(100)), out, "doc_id", n_parts=4
    )
    back = read_partitioned(out).to_pandas()
    assert len(back) == 100
    assert json.load(open(os.path.join(out, "manifest.json")))["n_rows"] == 100
