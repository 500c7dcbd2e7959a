"""Sitemap ingestion tests (sitemaps.org protocol): urlset roundtrip
(plain + gzip), lastmod W3C datetime forms, sitemapindex one-level
resolution, namespace-agnostic parsing, malformed handling."""

import pyarrow as pa

from indexer_ray.sources.sitemap import (
    discover_sitemaps,
    parse_sitemap,
    read_sitemaps,
    write_sitemap,
)


def test_urlset_roundtrip_plain_and_gzip(tmp_path, ray_session):
    entries = [
        ("https://a.test/p/1", "2021-03-04"),
        ("https://a.test/p/2", "2021-03-04T12:30:00Z"),
        ("https://a.test/p/3", None),
    ]
    write_sitemap(str(tmp_path / "a.xml"), entries)
    write_sitemap(str(tmp_path / "b.xml.gz"), [("https://b.test/x", None)], compress=True)
    df = read_sitemaps(str(tmp_path)).to_pandas().sort_values("url").reset_index(drop=True)
    assert df["url"].tolist() == [
        "https://a.test/p/1", "https://a.test/p/2", "https://a.test/p/3",
        "https://b.test/x",
    ]
    assert df["lastmod"][0].day == 4 and df["lastmod"][1].hour == 12
    assert df["lastmod"].isna().tolist() == [False, False, True, True]


def test_sitemapindex_one_level(tmp_path, ray_session):
    write_sitemap(str(tmp_path / "child1.xml"), [("https://s.test/1", None)])
    write_sitemap(str(tmp_path / "child2.xml.gz"), [("https://s.test/2", None)], compress=True)
    sub = tmp_path / "sub"
    sub.mkdir()
    write_sitemap(
        str(sub / "index.xml"),
        ["../child1.xml", str(tmp_path / "child2.xml.gz"),
         "https://remote.test/sitemap.xml"],  # remote: skipped offline
    )
    files = discover_sitemaps(str(sub / "index.xml"))
    assert len(files) == 2
    df = read_sitemaps(str(sub / "index.xml")).to_pandas()
    assert sorted(df["url"]) == ["https://s.test/1", "https://s.test/2"]


def test_namespace_agnostic_and_malformed():
    bare = b"<urlset><url><loc>https://x.test/</loc></url></urlset>"
    kind, entries = parse_sitemap(bare)
    assert kind == "urlset" and entries == [("https://x.test/", None)]
    assert parse_sitemap(b"<html><body>nope</body></html>") == ("", [])
    assert parse_sitemap(b"not xml at all") == ("", [])
    assert parse_sitemap(b"<urlset><url><lastmod>bogus</lastmod></url></urlset>") == (
        "urlset", [],
    )


def test_empty_dir_typed_empty(tmp_path, ray_session):
    ds = read_sitemaps(str(tmp_path))
    assert ds.count() == 0
    assert set(ds.schema().names) == {"url", "lastmod", "sitemap"}
