"""Link extraction / host link graph tests: RFC 3986 resolution forms,
<base href> re-basing, attribute quoting and entity variants, skip rules
(fragment-only, javascript:/mailto:), binary html columns, and the
combiner-pre-aggregated host rollup."""

import pyarrow as pa
import pytest

from indexer_ray.pipelines.links import (
    _links_of,
    extract_links,
    host_indegree,
    host_link_counts,
)


def test_resolution_forms():
    page = "https://www.example.com/a/b/page.html"
    html = (
        '<a href="https://other.org/x">abs</a>'
        '<a href="//cdn.net/y">scheme-rel</a>'
        '<a href="/root">root</a>'
        '<a href="sib.html">rel</a>'
        '<a href="../up">dotdot</a>'
        '<a href="?q=1">query</a>'
    )
    out = [d for _, d in _links_of(page, html)]
    assert out == [
        "https://other.org/x",
        "https://cdn.net/y",
        "https://www.example.com/root",
        "https://www.example.com/a/b/sib.html",
        "https://www.example.com/a/up",
        "https://www.example.com/a/b/page.html?q=1",
    ]


def test_skip_rules_and_area():
    html = (
        '<a href="#top">frag</a><a href="javascript:void(0)">js</a>'
        '<a href="MAILTO:a@b.c">mail</a><a href="tel:+1">tel</a>'
        '<a name="anchor">no href</a><area href="/map">m</area>'
        '<a href="">empty</a>'
    )
    out = [d for _, d in _links_of("https://h.test/p", html)]
    assert out == ["https://h.test/map"]


def test_quoting_entities_case():
    html = (
        "<A HREF=/upper>u</A>"
        "<a href='/single'>s</a>"
        "<a href=/bare>b</a>"
        '<a href="/e?a=1&amp;b=2">ent</a>'
    )
    out = [d for _, d in _links_of("https://h.test/", html)]
    assert out == [
        "https://h.test/upper",
        "https://h.test/single",
        "https://h.test/bare",
        "https://h.test/e?a=1&b=2",  # charrefs unescaped in attributes
    ]


def test_base_tag_first_wins():
    html = (
        '<base href="https://cdn.example.org/assets/">'
        '<base href="https://ignored.test/">'
        '<a href="img.png">x</a>'
    )
    out = [d for _, d in _links_of("https://h.test/page", html)]
    assert out == ["https://cdn.example.org/assets/img.png"]


def test_malformed_html_keeps_prefix():
    html = '<a href="/ok">fine</a><a href="/also-ok" <<<'
    out = [d for _, d in _links_of("https://h.test/", html)]
    assert "https://h.test/ok" in out


def test_extract_links_dataset_binary_column(ray_session):
    import ray.data as rd

    t = pa.table(
        {
            "url": ["https://a.test/1", "https://b.test/2"],
            "html": pa.array(
                [b'<a href="/x">x</a><a href="/x">x again</a>', b"no links here"],
                type=pa.binary(),
            ),
        }
    )
    df = extract_links(rd.from_arrow(t)).to_pandas()
    # duplicates kept (edge multiplicity)
    assert df["dst_url"].tolist() == ["https://a.test/x", "https://a.test/x"]
    assert df["src_url"].tolist() == ["https://a.test/1", "https://a.test/1"]


def test_host_rollup_and_indegree(ray_session):
    import ray.data as rd

    rows = []
    for i in range(20):
        rows.append(
            {
                "url": f"https://s{i % 2}.test/p/{i}",
                "html": '<a href="https://hub.test/h">1</a><a href="/self">2</a>',
            }
        )
    ds = rd.from_items(rows)
    g = host_link_counts(ds).to_pandas().sort_values(
        ["src_host", "dst_host"]
    ).reset_index(drop=True)
    # each source host: 10 links to hub.test + 10 self links
    assert len(g) == 4
    assert g["n_links"].tolist() == [10, 10, 10, 10]
    ind = host_indegree(ds).to_pandas().set_index("dst_host")["in_links"]
    assert ind["hub.test"] == 20 and ind["s0.test"] == 10


def test_ports_stripped_in_host():
    out = _links_of("https://h.test:8443/", '<a href="https://x.test:80/a">x</a>')
    from indexer_ray.pipelines.links import _host_of

    assert _host_of(out[0][1]) == "x.test"
    assert _host_of("https://h.test:8443/") == "h.test"


def test_pagerank_integer_exact(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.links import pagerank_hosts

    edges = [("a", "b", 2), ("b", "a", 1), ("b", "c", 1), ("d", "a", 3)]
    t = pa.table(
        {
            "src_host": [e[0] for e in edges],
            "dst_host": [e[1] for e in edges],
            "n_links": [e[2] for e in edges],
        }
    )
    out = (
        pagerank_hosts(rd.from_arrow(t), iters=3)
        .to_pandas()
        .set_index("host")["rank"]
        .to_dict()
    )

    # exact integer reference (same published formula)
    scale, damping = 10**12, 85
    nodes = sorted({e[0] for e in edges} | {e[1] for e in edges})
    r0 = scale // len(nodes)
    base = ((100 - damping) * r0) // 100
    ow: dict = {}
    for s, _, n in edges:
        ow[s] = ow.get(s, 0) + n
    r = {h: r0 for h in nodes}
    for _ in range(3):
        inflow = {h: 0 for h in nodes}
        for s, d, n in edges:
            inflow[d] += r[s] * n // ow[s]
        r = {h: base + damping * inflow[h] // 100 for h in nodes}
    assert out == r
    # hub 'a' (2 inbound sources) outranks leaf 'c'; dangling 'd' at base floor
    assert out["a"] > out["c"] > 0 and out["d"] == min(out.values())


def test_pagerank_empty_and_determinism(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.links import pagerank_hosts

    empty = pa.table(
        {
            "src_host": pa.array([], pa.string()),
            "dst_host": pa.array([], pa.string()),
            "n_links": pa.array([], pa.int64()),
        }
    )
    assert pagerank_hosts(rd.from_arrow(empty)).count() == 0
    t = pa.table(
        {
            "src_host": [f"h{i % 13}" for i in range(60)],
            "dst_host": [f"h{(i * 7) % 13}" for i in range(60)],
            "n_links": [1 + i % 3 for i in range(60)],
        }
    )
    a = pagerank_hosts(rd.from_arrow(t), iters=2).to_pandas()
    b = pagerank_hosts(rd.from_arrow(t).repartition(7), iters=2).to_pandas()
    a = a.sort_values("host").reset_index(drop=True)
    b = b.sort_values("host").reset_index(drop=True)
    assert a.equals(b)  # layout-independent


def test_pagerank_regimes_agree(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.links import pagerank_hosts

    t = pa.table(
        {
            "src_host": [f"h{i % 11}" for i in range(80)],
            "dst_host": [f"h{(i * 3 + 1) % 11}" for i in range(80)],
            "n_links": [1 + i % 4 for i in range(80)],
        }
    )
    a = pagerank_hosts(rd.from_arrow(t), iters=3).to_pandas()
    b = pagerank_hosts(
        rd.from_arrow(t), iters=3, broadcast_hosts_threshold=0
    ).to_pandas()
    a = a.sort_values("host").reset_index(drop=True)
    b = b.sort_values("host").reset_index(drop=True)
    assert a.equals(b)


def test_crawl_frontier(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.links import crawl_frontier

    pages = rd.from_items(
        [
            {
                "url": "https://a.test/p/1",
                "html": '<a href="HTTPS://B.Test:443/x#frag">1</a>'
                '<a href="/new1">2</a><a href="/new1">dup</a>'
                '<a href="/seen1">3</a>',
            },
            {
                "url": "https://c.test/p/2",
                "html": '<a href="https://b.test/x">same canon</a>'
                '<a href="/n1">a</a><a href="/n2">b</a><a href="/n3">c</a>',
            },
        ]
    )
    seen = ["https://a.test/seen1", "https://a.test/p/1", "https://c.test/p/2"]
    out = (
        crawl_frontier(pages, seen)
        .to_pandas()
        .sort_values("url")
        .reset_index(drop=True)
    )
    # canonicalization collapses the two b.test forms; seen urls dropped
    assert out["url"].tolist() == [
        "https://a.test/new1",
        "https://b.test/x",
        "https://c.test/n1",
        "https://c.test/n2",
        "https://c.test/n3",
    ]
    assert out["host"].tolist() == ["a.test", "b.test", "c.test", "c.test", "c.test"]
    # per-host politeness cap: smallest urls win
    capped = (
        crawl_frontier(pages, seen, per_host_cap=2)
        .to_pandas()
        .sort_values("url")["url"]
        .tolist()
    )
    assert capped == [
        "https://a.test/new1",
        "https://b.test/x",
        "https://c.test/n1",
        "https://c.test/n2",
    ]
    # regime equivalence: forced routed anti-join matches broadcast
    forced = (
        crawl_frontier(pages, seen, broadcast_threshold=0)
        .to_pandas()
        .sort_values("url")["url"]
        .tolist()
    )
    assert forced == out["url"].tolist()


def test_anchor_texts(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.links import anchor_texts

    pages = rd.from_items(
        [
            {
                "url": "https://b.test/2",  # later src: must sort after a.test
                "html": '<a href="https://hub.test/x">awesome page</a>',
            },
            {
                "url": "https://a.test/1",
                "html": '<a href="https://hub.test/x">great <b>docs</b> here</a>'
                '<a href="/y">   </a>'  # whitespace-only: dropped
                '<a href="/z">self link text</a>',
            },
        ]
    )
    out = (
        anchor_texts(pages)
        .to_pandas()
        .sort_values("dst_url")
        .reset_index(drop=True)
    )
    hub = out[out["dst_url"] == "https://hub.test/x"].iloc[0]
    # deterministic (src_url, idx) concat order; markup inside flows through
    assert hub["anchor_text"] == "great docs here awesome page"
    assert hub["n_anchors"] == 2
    assert out[out["dst_url"] == "https://a.test/z"]["anchor_text"].iloc[0] == (
        "self link text"
    )
    assert "https://a.test/y" not in set(out["dst_url"])


def test_anchor_text_index_e2e(ray_session, tmp_path):
    """The anchor-text signal end-to-end: aggregate anchors, index the
    aggregated text keyed by target url, find a page by words OTHERS use
    to link to it (the page's own body never contains them)."""
    import glob

    import pandas as pd
    import ray.data as rd

    from indexer_ray.pipelines.build import build_index
    from indexer_ray.pipelines.links import anchor_texts
    from indexer_ray.pipelines.query import IndexSearcher

    pages = rd.from_items(
        [
            {
                "url": f"https://s{i}.test/p",
                # the quantum anchors all point at one target; the other
                # anchors spread across targets so the corpus has >1 doc
                # (a 1-doc corpus scores idf 0 — the reference's
                # zero-score drop rule would return nothing)
                "html": '<a href="https://target.test/paper">'
                f"groundbreaking quantum result {i}</a>"
                f'<a href="https://other{i}.test/page">cooking recipe {i}</a>',
            }
            for i in range(6)
        ]
    )
    agg = anchor_texts(pages).to_pandas()
    corpus = pd.DataFrame(
        {
            "url": agg["dst_url"],
            "warc_ts": pd.Timestamp("2021-01-01"),
            "text": agg["anchor_text"],
        }
    )
    pages_dir = str(tmp_path / "anchor_pages")
    rd.from_pandas(corpus).write_parquet(pages_dir)
    idx = str(tmp_path / "anchor_idx")
    build_index(sorted(glob.glob(pages_dir + "/*.parquet")), idx)
    s = IndexSearcher(idx)
    hits = s.search_urls("groundbreaking quantum", k=3)
    assert hits and hits[0][0] == "https://target.test/paper"


def test_anchor_texts_cap_keeps_true_count(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.links import anchor_texts

    pages = rd.from_items(
        [
            {
                "url": f"https://s{i:02d}.test/p",
                "html": f'<a href="https://hub.test/x">w{i:02d}</a>',
            }
            for i in range(6)
        ]
    )
    out = anchor_texts(pages, max_anchors=3).to_pandas().iloc[0]
    assert out["anchor_text"] == "w00 w01 w02"  # first 3 in src order
    assert out["n_anchors"] == 6  # true count survives the cap


# --------------------------------------------------- hits_hosts


def _hits_edges():
    import pandas as pd

    # star: hub0 links to a1,a2,a3; hub1 links to a1,a2; a3 links back
    return pd.DataFrame(
        {
            "src_host": ["hub0", "hub0", "hub0", "hub1", "hub1", "a3"],
            "dst_host": ["a1", "a2", "a3", "a1", "a2", "hub0"],
            "n_links": [1, 1, 1, 1, 1, 1],
        }
    )


def test_hits_hub_and_authority_ordering(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.links import hits_hosts

    out = (
        hits_hosts(rd.from_pandas(_hits_edges()), iters=3)
        .to_pandas()
        .set_index("host")
    )
    # hub0 points at all three authorities -> best hub; a1/a2 receive from
    # both hubs -> best authorities and equal by symmetry
    assert out["hub"].idxmax() == "hub0"
    assert out.loc["a1", "auth"] == out.loc["a2", "auth"]
    assert out.loc["a1", "auth"] > out.loc["a3", "auth"]
    assert out.loc["a1", "auth"] > out.loc["hub1", "auth"]
    assert out.loc["hub1", "hub"] > out.loc["a1", "hub"]


def test_hits_regimes_identical(ray_session):
    import pandas as pd
    import ray.data as rd

    from indexer_ray.pipelines.links import hits_hosts

    edges = pd.DataFrame(
        {
            "src_host": [f"s{i % 7}" for i in range(60)],
            "dst_host": [f"s{(i * 3 + 1) % 11}" for i in range(60)],
            "n_links": [(i % 4) + 1 for i in range(60)],
        }
    )
    a = (
        hits_hosts(rd.from_pandas(edges), iters=2)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    b = (
        hits_hosts(rd.from_pandas(edges), iters=2, broadcast_hosts_threshold=0)
        .to_pandas()
        .sort_values("host")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(a, b)


def test_hits_empty_edges(ray_session):
    import pandas as pd
    import ray.data as rd

    from indexer_ray.pipelines.links import hits_hosts

    empty = pd.DataFrame({"src_host": [], "dst_host": [], "n_links": []})
    out = hits_hosts(rd.from_pandas(empty)).to_pandas()
    assert len(out) == 0
