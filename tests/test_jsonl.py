"""JSONL source: vectorized NDJSON shard reader + deterministic export
sink (sources/jsonl.py) — roundtrips, gzip magic detection, pruning."""

import gzip
import json
import os

import pandas as pd
import pytest


@pytest.fixture()
def docs_df():
    import pyarrow.parquet as pq

    return (
        pq.read_table("/root/testdata/sf0.001/documents.parquet")
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )


def _read_sorted(path_or_dir, columns=None):
    from indexer_ray.sources.jsonl import read_jsonl

    out = read_jsonl(path_or_dir, columns=columns).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def test_jsonl_roundtrip_plain_and_gzip(ray_session, docs_df, tmp_path):
    import ray.data as rd

    from indexer_ray.sources.jsonl import write_jsonl

    out = str(tmp_path / "plain")
    paths = write_jsonl(rd.from_pandas(docs_df), out, compress=False)
    assert all(p.endswith(".jsonl") for p in paths)
    back = _read_sorted(out)
    pd.testing.assert_frame_equal(back[docs_df.columns.tolist()], docs_df)

    outz = str(tmp_path / "gz")
    pathsz = write_jsonl(rd.from_pandas(docs_df), outz, compress=True)
    assert all(p.endswith(".jsonl.gz") for p in pathsz)
    backz = _read_sorted(outz)
    pd.testing.assert_frame_equal(backz[docs_df.columns.tolist()], docs_df)


def test_jsonl_export_idempotent_naming(ray_session, docs_df, tmp_path):
    import ray.data as rd

    from indexer_ray.sources.jsonl import write_jsonl

    out = str(tmp_path / "idem")
    a = write_jsonl(rd.from_pandas(docs_df), out, compress=True)
    b = write_jsonl(rd.from_pandas(docs_df), out, compress=True)
    assert a == b  # content-addressed: identical data -> identical shards
    assert len(os.listdir(out)) == len(set(a))


def test_jsonl_gzip_magic_not_extension(ray_session, docs_df, tmp_path):
    # a gzipped file MIS-labeled .jsonl must still parse (magic detection)
    rows = docs_df.head(5)
    payload = "".join(
        json.dumps(r, ensure_ascii=False) + "\n"
        for r in rows.to_dict("records")
    ).encode("utf-8")
    p = str(tmp_path / "mislabeled.jsonl")
    with open(p, "wb") as f:
        f.write(gzip.compress(payload))
    back = _read_sorted(p)
    pd.testing.assert_frame_equal(back[rows.columns.tolist()],
                                  rows.reset_index(drop=True))


def test_jsonl_column_pruning_and_unicode(ray_session, tmp_path):
    rows = [
        {"doc_id": 1, "text": "héllo wörld ünïcode", "extra": "drop me"},
        {"doc_id": 2, "text": "plain ascii", "extra": "drop me too"},
    ]
    p = str(tmp_path / "u.jsonl")
    with open(p, "w", encoding="utf-8") as f:
        for r in rows:
            f.write(json.dumps(r, ensure_ascii=False) + "\n")
    back = _read_sorted(p, columns=["doc_id", "text"])
    assert back.columns.tolist() == ["doc_id", "text"]
    assert back["text"].tolist() == ["héllo wörld ünïcode", "plain ascii"]


def test_jsonl_discovery_recursive_sorted(tmp_path):
    from indexer_ray.sources.jsonl import discover_jsonl_files

    (tmp_path / "sub").mkdir()
    for name in ("b.jsonl", "a.jsonl.gz", "sub/c.ndjson", "skip.txt"):
        (tmp_path / name).write_text("")
    got = discover_jsonl_files(str(tmp_path))
    assert [os.path.basename(p) for p in got] == [
        "a.jsonl.gz",
        "b.jsonl",
        "c.ndjson",
    ]


def test_index_jsonl_corpus_e2e(ray_session, docs_df, tmp_path):
    import ray.data as rd

    from indexer_ray.pipelines.query import IndexSearcher
    from indexer_ray.sources.jsonl import index_jsonl_corpus, write_jsonl

    shards = str(tmp_path / "shards")
    write_jsonl(rd.from_pandas(docs_df[["doc_id", "text"]]), shards,
                compress=True)
    idx = str(tmp_path / "idx")
    manifest, n = index_jsonl_corpus(shards, idx)
    assert n == len(docs_df)
    s = IndexSearcher(idx)
    hits = s.search("batch window", k=5)
    assert len(hits) > 0
    # resume path: second call with resume=True reuses the extraction
    manifest2, n2 = index_jsonl_corpus(shards, idx, resume=True)
    assert n2 == n


def test_cli_index_jsonl_corpus(ray_session, tmp_path, capsys):
    import ray.data as rd

    from indexer_ray.cli import main
    from indexer_ray.sources.jsonl import write_jsonl

    rows = pd.DataFrame(
        {
            "doc_id": pd.array(range(5), dtype="int64"),
            "text": [f"needle{i} running fast words here" for i in range(5)],
        }
    )
    d = tmp_path / "dump"
    write_jsonl(rd.from_pandas(rows), str(d), compress=True)
    idx = str(tmp_path / "idx")
    rc = main(["index", "-p", str(d), "-o", idx, "--corpus", "jsonl"])
    assert rc == 0
    assert "Indexed 5 docs" in capsys.readouterr().out
    rc = main(["search", "-i", idx, "-q", "needle2", "-c", "3"])
    assert rc == 0
    assert "2" in capsys.readouterr().out
    assert main(["verify", "-i", idx, "--deep"]) == 0
