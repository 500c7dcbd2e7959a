"""HTML link extraction and the host-level link graph — the web-corpus
structure pass (crawl frontier seeding, in-degree/PageRank features,
spam-host heuristics all start from this edge list).

Reference analogue: html.rs walks the DOM for text only; link extraction
is the same walk keeping `<a href>` / `<area href>` attributes instead
(stdlib html.parser, matching the extractor chain's parser family).

Semantics (documented; the SQL oracle reproduces them on the synthetic
corpus):
 - hrefs resolve against the page url per RFC 3986 (stdlib urljoin); a
   `<base href>` tag, first one wins, re-bases the page per the HTML spec;
 - fragment-only hrefs (`#top`) are self-links and are dropped; so are
   non-navigational schemes (javascript:, mailto:, data:, tel:);
 - duplicates are KEPT in the edge list (multiplicity is the graph
   weight) and collapse only in the host rollup's count.

Scale design: extraction is a pure map (per-row HTML parsing is
inherently serial, the documented T1-style vectorization exemption); the
host rollup pre-aggregates per batch (Counter combiner) so the global
groupby shuffles one row per distinct (src_host, dst_host) pair per
block, not one per link.
"""

from __future__ import annotations

from html.parser import HTMLParser
from urllib.parse import urljoin, urlparse

import pyarrow as pa

_SKIP_SCHEMES = ("javascript:", "mailto:", "data:", "tel:")


class _LinkParser(HTMLParser):
    """Collect resolved link targets from a[href] / area[href]; honour the
    first <base href> (HTML spec: later base tags are ignored)."""

    def __init__(self, page_url: str) -> None:
        super().__init__(convert_charrefs=True)
        self.base = page_url
        self._base_seen = False
        self.out: list[tuple[str, str]] = []  # (raw href, resolved)

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "base" and not self._base_seen:
            href = next((v for k, v in attrs if k == "href" and v), None)
            if href:
                self.base = urljoin(self.base, href)
                self._base_seen = True
            return
        if tag not in ("a", "area"):
            return
        href = next((v for k, v in attrs if k == "href" and v is not None), None)
        if href is None:
            return
        h = href.strip()
        if not h or h.startswith("#"):
            return  # fragment-only: self-link
        if h.lower().startswith(_SKIP_SCHEMES):
            return
        self.out.append((href, urljoin(self.base, h)))


def _links_of(page_url: str, html) -> list[tuple[str, str]]:
    if html is None:
        return []
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    if not html:
        return []
    p = _LinkParser(page_url or "")
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # keep whatever parsed before the malformed tail
    return p.out


def _host_of(u: str) -> str:
    try:
        netloc = urlparse(u).netloc.lower()
    except ValueError:
        return ""
    return netloc.rsplit(":", 1)[0] if ":" in netloc else netloc


def extract_links(ds, url_col: str = "url", html_col: str = "html"):
    """Dataset -> edge list (src_url, href, dst_url), one row per anchor
    occurrence (duplicates kept — multiplicity is the edge weight)."""

    def _batch(t: pa.Table) -> pa.Table:
        srcs, hrefs, dsts = [], [], []
        for u, h in zip(t.column(url_col).to_pylist(), t.column(html_col).to_pylist()):
            for raw, resolved in _links_of(u, h):
                srcs.append(u)
                hrefs.append(raw)
                dsts.append(resolved)
        return pa.table(
            {
                "src_url": pa.array(srcs, type=pa.string()),
                "href": pa.array(hrefs, type=pa.string()),
                "dst_url": pa.array(dsts, type=pa.string()),
            }
        )

    return ds.map_batches(_batch, batch_format="pyarrow")


def host_link_counts(ds, url_col: str = "url", html_col: str = "html"):
    """Host-level link graph: (src_host, dst_host, n_links), combiner
    pre-aggregated per batch, then one small groupby-sum shuffle."""

    def _partial(t: pa.Table) -> pa.Table:
        from collections import Counter

        c: Counter = Counter()
        for u, h in zip(t.column(url_col).to_pylist(), t.column(html_col).to_pylist()):
            sh = _host_of(u or "")
            for _, resolved in _links_of(u, h):
                c[(sh, _host_of(resolved))] += 1
        src, dst, n = [], [], []
        for (s, d), v in c.items():
            src.append(s)
            dst.append(d)
            n.append(v)
        return pa.table(
            {
                "src_host": pa.array(src, type=pa.string()),
                "dst_host": pa.array(dst, type=pa.string()),
                "n_links": pa.array(n, type=pa.int64()),
            }
        )

    import ray.data  # noqa: F401  (Sum aggregate import side)
    from ray.data.aggregate import Sum

    return (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["src_host", "dst_host"])
        .aggregate(Sum("n_links", alias_name="n_links"))
    )


def host_indegree(ds, url_col: str = "url", html_col: str = "html"):
    """In-degree per destination host (distinct-source-weighted edges
    collapse naturally: this sums link multiplicities into the host)."""
    from ray.data.aggregate import Sum

    return (
        host_link_counts(ds, url_col, html_col)
        .groupby("dst_host")
        .aggregate(Sum("n_links", alias_name="in_links"))
    )
