"""WARC ingestion tests (ISO 28500 / WARC 1.0): fixture-writer roundtrip
over plain + per-record-gzip files, HTTP-response unwrapping, record-type
and content-type routing, tolerant truncation, and the end-to-end
WARC -> build_index -> search path."""

import gzip

import numpy as np
import pytest

from indexer_ray.sources.warc import (
    _parse_warc_records,
    discover_warc_files,
    index_warc_corpus,
    parse_warc_file,
    read_warc,
    write_warc,
)


def _recs(n=6):
    return [
        {
            "url": f"https://host{i % 3}.test/p/{i}",
            "date": f"2021-05-0{1 + i % 9}T12:00:0{i % 10}Z",
            "ctype": "text/plain; charset=utf-8",
            "body": f"document {i} body with needle{i} and ünïcode",
        }
        for i in range(n)
    ]


@pytest.mark.parametrize("compress", [False, True])
@pytest.mark.parametrize("http_wrap", [False, True])
def test_roundtrip_plain_and_gzip(tmp_path, compress, http_wrap):
    p = str(tmp_path / ("a.warc.gz" if compress else "a.warc"))
    recs = _recs()
    write_warc(p, recs, compress=compress, http_wrap=http_wrap)
    t = parse_warc_file(p)
    assert t.num_rows == len(recs)  # warcinfo record skipped
    assert t.column("url").to_pylist() == [r["url"] for r in recs]
    assert t.column("text").to_pylist() == [r["body"] for r in recs]
    ts = t.column("warc_ts").to_pylist()
    assert ts[0].year == 2021 and ts[1].second == 1


def test_html_records_extract_text_and_keep_bytes(tmp_path):
    p = str(tmp_path / "h.warc")
    html = "<html><head><title>T</title></head><body><p>hello link</p></body></html>"
    write_warc(
        p,
        [{"url": "https://x.test/1", "ctype": "text/html", "body": html}],
        http_wrap=True,
    )
    t = parse_warc_file(p)
    assert t.num_rows == 1
    assert t.column("html").to_pylist()[0] == html.encode()
    assert "hello link" in t.column("text").to_pylist()[0]


def test_type_routing_and_skips(tmp_path):
    p = str(tmp_path / "m.warc")
    write_warc(
        p,
        [
            {"url": "https://x.test/t", "ctype": "text/plain", "body": "keep me"},
            {"url": "https://x.test/img", "ctype": "image/png", "body": b"\x89PNG"},
        ],
    )
    # append a request record manually: must be skipped
    with open(p, "ab") as f:
        block = b"GET / HTTP/1.1\r\nHost: x\r\n\r\n"
        f.write(
            b"WARC/1.0\r\nWARC-Type: request\r\n"
            b"WARC-Target-URI: https://x.test/t\r\n"
            + f"Content-Length: {len(block)}\r\n".encode()
            + b"\r\n"
            + block
            + b"\r\n\r\n"
        )
    t = parse_warc_file(p)
    assert t.column("url").to_pylist() == ["https://x.test/t", "https://x.test/img"]
    # unrouted content-type -> empty text (build's Q9 empty-doc drop)
    assert t.column("text").to_pylist() == ["keep me", ""]


def test_charset_and_latin1_fallback(tmp_path):
    p = str(tmp_path / "c.warc")
    body = "café".encode("latin-1")
    write_warc(
        p,
        [{"url": "https://x.test/l1", "ctype": "text/plain; charset=latin-1", "body": body}],
    )
    t = parse_warc_file(p)
    assert t.column("text").to_pylist() == ["café"]


def test_chunked_response_skipped(tmp_path):
    p = str(tmp_path / "ch.warc")
    body = b"5\r\nhello\r\n0\r\n\r\n"
    block = (
        b"HTTP/1.1 200 OK\r\nContent-Type: text/plain\r\n"
        b"Transfer-Encoding: chunked\r\n\r\n" + body
    )
    rec = (
        b"WARC/1.0\r\nWARC-Type: response\r\n"
        b"WARC-Target-URI: https://x.test/chunk\r\n"
        b"WARC-Date: 2020-01-01T00:00:00Z\r\n"
        + f"Content-Length: {len(block)}\r\n".encode()
        + b"\r\n"
        + block
        + b"\r\n\r\n"
    )
    with open(p, "wb") as f:
        f.write(rec)
    assert parse_warc_file(p).num_rows == 0


def test_truncation_yields_prefix(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, _recs(4))
    raw = open(p, "rb").read()
    cut = str(tmp_path / "cut.warc")
    with open(cut, "wb") as f:
        f.write(raw[: len(raw) - 40])  # clip into the last record's block
    t = parse_warc_file(cut)
    assert 1 <= t.num_rows < 5
    assert t.column("text").to_pylist()[0].startswith("document 0")


def test_obs_fold_header_continuation():
    block = b"payload"
    rec = (
        b"WARC/1.1\r\nWARC-Type: resource\r\n"
        b"WARC-Target-URI: https://x.test/\r\n fold-tail\r\n"
        b"Content-Type: text/plain\r\n"
        + f"Content-Length: {len(block)}\r\n".encode()
        + b"\r\n"
        + block
        + b"\r\n\r\n"
    )
    out = list(_parse_warc_records(rec))
    assert len(out) == 1
    assert out[0][0]["warc-target-uri"] == "https://x.test/ fold-tail"


def test_discover_and_read_warc_dataset(tmp_path, ray_session):
    d = tmp_path / "crawl"
    d.mkdir()
    write_warc(str(d / "a.warc"), _recs(3))
    write_warc(str(d / "sub_b.warc.gz"), _recs(5)[3:], compress=True)
    (d / "notes.txt").write_text("not a warc")
    files = discover_warc_files(str(d))
    assert [f.rsplit("/", 1)[1] for f in files] == ["a.warc", "sub_b.warc.gz"]
    df = read_warc(str(d)).to_pandas().sort_values("url").reset_index(drop=True)
    assert len(df) == 5
    assert df["text"].str.contains("needle").all()


def test_index_warc_corpus_e2e(tmp_path, ray_session):
    from indexer_ray.pipelines.query import IndexSearcher

    d = tmp_path / "crawl"
    d.mkdir()
    write_warc(str(d / "a.warc"), _recs(8), http_wrap=True)
    idx = str(tmp_path / "idx")
    manifest, n = index_warc_corpus(str(d), idx)
    assert n == 8
    s = IndexSearcher(idx)
    hits = s.search("needle3", k=3)
    assert len(hits) == 1
    # resolve back to the url via the docmap join
    doc_id = hits[0][0]
    import pyarrow.parquet as pq
    import glob as g

    dm = pq.read_table(g.glob(idx + "/docmap/*.parquet"))
    urls = dict(zip(dm.column("doc_id").to_pylist(), dm.column("url").to_pylist()))
    assert urls[doc_id].endswith("/p/3")


def test_empty_dir_returns_typed_empty(tmp_path, ray_session):
    ds = read_warc(str(tmp_path))
    assert ds.count() == 0
    assert set(ds.schema().names) == {"url", "warc_ts", "html", "text", "lang"}


def test_export_warc_roundtrip(tmp_path, ray_session):
    import ray.data as rd

    from indexer_ray.sources.warc import export_warc

    d = tmp_path / "in"
    d.mkdir()
    write_warc(str(d / "a.warc"), _recs(6))
    src = read_warc(str(d)).to_pandas().sort_values("url").reset_index(drop=True)
    out_dir = str(tmp_path / "out")
    manifest = export_warc(rd.from_pandas(src), out_dir, compress=True)
    assert sum(m["n_records"] for m in manifest) == 6
    back = read_warc(out_dir).to_pandas().sort_values("url").reset_index(drop=True)
    assert back["url"].tolist() == src["url"].tolist()
    assert back["text"].tolist() == src["text"].tolist()
    assert (back["warc_ts"] == src["warc_ts"]).all()
    # idempotent: identical re-export lands on the same content-derived shards
    manifest2 = export_warc(rd.from_pandas(src), out_dir, compress=True)
    assert [m["path"] for m in manifest2] == [m["path"] for m in manifest]


def test_export_warc_html_payload(tmp_path, ray_session):
    import pandas as pd
    import ray.data as rd

    from indexer_ray.sources.warc import export_warc

    html = b"<html><body><p>round trip</p></body></html>"
    df = pd.DataFrame(
        {"url": ["https://x.test/h"], "html": [html], "text": ["ignored"]}
    )
    out_dir = str(tmp_path / "out")
    export_warc(rd.from_pandas(df), out_dir, compress=False, http_wrap=True)
    back = read_warc(out_dir).to_pandas()
    assert back["html"][0] == html  # original bytes, via text/html record
    assert "round trip" in back["text"][0]


def test_recrawl_incremental_delta(tmp_path, ray_session):
    """WARC re-crawl through the freshness machinery: warc_ts plays the
    reference's mtime role, so filter_expired over a fresh crawl keeps
    exactly the re-crawled-newer and never-seen urls; the merged index
    serves the UPDATED content (newest-url-wins)."""
    from indexer_ray.pipelines.incremental import filter_expired
    from indexer_ray.pipelines.merge import merge_indexes
    from indexer_ray.pipelines.build import build_index
    from indexer_ray.pipelines.query import IndexSearcher

    d1 = tmp_path / "crawl1"
    d1.mkdir()
    recs = [
        {
            "url": f"https://h.test/p/{i}",
            "date": "2021-03-01T00:00:00Z",
            "body": f"original body{i} oldtoken{i}",
        }
        for i in range(5)
    ]
    write_warc(str(d1 / "a.warc"), recs)
    idx1 = str(tmp_path / "idx1")
    manifest, n = index_warc_corpus(str(d1), idx1)
    assert n == 5

    d2 = tmp_path / "crawl2"
    d2.mkdir()
    v2 = [
        # re-crawled NEWER: must re-index
        {"url": "https://h.test/p/1", "date": "2021-04-01T00:00:00Z",
         "body": "updated body1 newtoken1"},
        {"url": "https://h.test/p/2", "date": "2021-04-01T00:00:00Z",
         "body": "updated body2 newtoken2"},
        # unchanged date: must be skipped
        {"url": "https://h.test/p/3", "date": "2021-03-01T00:00:00Z",
         "body": "original body3 oldtoken3"},
        # never seen: must index
        {"url": "https://h.test/p/9", "date": "2021-04-01T00:00:00Z",
         "body": "brand new page newtoken9"},
    ]
    write_warc(str(d2 / "b.warc"), v2)
    fresh = read_warc(str(d2))
    delta = filter_expired(fresh, idx1).to_pandas()
    assert sorted(delta["url"]) == [
        "https://h.test/p/1", "https://h.test/p/2", "https://h.test/p/9",
    ]

    # delta build + compaction: newest wins, old tokens for p/1 disappear
    delta_pages = str(tmp_path / "delta_pages")
    import ray.data as rd
    rd.from_pandas(delta).write_parquet(delta_pages)
    import glob as g
    idx2 = str(tmp_path / "idx2")
    build_index(sorted(g.glob(delta_pages + "/*.parquet")), idx2)
    merged = str(tmp_path / "merged")
    merge_indexes(idx1, idx2, merged)
    s = IndexSearcher(merged)
    assert len(s.search("newtoken1", k=5)) == 1
    assert len(s.search("oldtoken1", k=5)) == 0  # superseded content gone
    assert len(s.search("oldtoken3", k=5)) == 1  # untouched page stays


def test_cli_index_warc_corpus(tmp_path, ray_session, capsys):
    from indexer_ray.cli import main

    d = tmp_path / "crawl"
    d.mkdir()
    write_warc(str(d / "a.warc.gz"), _recs(5), compress=True)
    idx = str(tmp_path / "idx")
    rc = main(["index", "-p", str(d), "-o", idx, "--corpus", "warc"])
    assert rc == 0
    assert "Indexed 5 docs" in capsys.readouterr().out
    rc = main(["search", "-i", idx, "-q", "needle2", "-c", "3"])
    assert rc == 0
    assert "/p/2" in capsys.readouterr().out
    # verify subcommand accepts the warc-built index
    assert main(["verify", "-i", idx, "--deep"]) == 0
