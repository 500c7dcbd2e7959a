"""Sitemap ingestion (sitemaps.org protocol, public spec) — the crawl's
SEED source: a site's urlset files enumerate fetchable urls + lastmod
freshness, and a sitemap INDEX file points at child sitemaps.  Pairs with
pipelines/links.crawl_frontier (outlink discovery) and the incremental
build's (url, warc_ts) freshness key (lastmod plays the same role).

From-spec, stdlib only: xml.etree with namespace-agnostic tag matching
(real-world sitemaps mix default-namespace and bare tags), plain or
gzipped files (.xml / .xml.gz), `<urlset>` and `<sitemapindex>` roots,
`<loc>` required, `<lastmod>` optional W3C datetime (date-only or full
timestamp).  Malformed files yield no rows, never an exception.

Scale shape: INDEX files are tiny and resolve driver-side at discovery
(one level, matching the protocol's one-level-of-nesting rule); the
urlset files — the big side, 50k urls each at the spec cap — parse one
Ray task per file, no shuffle."""

from __future__ import annotations

import glob as _glob
import gzip
import os
from datetime import datetime, timezone
from xml.etree import ElementTree

import pyarrow as pa

_SCHEMA = pa.schema(
    {
        "url": pa.string(),
        "lastmod": pa.timestamp("us"),
        "sitemap": pa.string(),
    }
)


def _local_tag(el) -> str:
    t = el.tag
    return t.rsplit("}", 1)[-1] if "}" in t else t


def _read_bytes(path: str) -> bytes:
    with open(path, "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)
        except OSError:
            return b""
    return raw


def _parse_lastmod(s: str | None) -> int | None:
    """W3C datetime (YYYY-MM-DD or full ISO 8601) -> epoch us."""
    if not s:
        return None
    try:
        dt = datetime.fromisoformat(s.strip().replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1e6)
    except ValueError:
        return None


def parse_sitemap(raw: bytes) -> tuple[str, list]:
    """-> ("urlset", [(loc, lastmod_us|None)]) or ("index", [child locs])
    or ("", []) for malformed/foreign xml."""
    try:
        root = ElementTree.fromstring(raw)
    except ElementTree.ParseError:
        return "", []
    kind = _local_tag(root)
    if kind == "urlset":
        out = []
        for u in root:
            if _local_tag(u) != "url":
                continue
            loc, lastmod = None, None
            for c in u:
                if _local_tag(c) == "loc":
                    loc = (c.text or "").strip()
                elif _local_tag(c) == "lastmod":
                    lastmod = _parse_lastmod(c.text)
            if loc:
                out.append((loc, lastmod))
        return "urlset", out
    if kind == "sitemapindex":
        out = []
        for s in root:
            if _local_tag(s) != "sitemap":
                continue
            for c in s:
                if _local_tag(c) == "loc" and c.text and c.text.strip():
                    out.append(c.text.strip())
        return "index", out
    return "", []


def discover_sitemaps(root_or_paths) -> list[str]:
    """Driver-side discovery: directory glob (*.xml / *.xml.gz), file, or
    explicit list; sitemapindex files resolve ONE level (protocol rule) —
    local child paths relative to the index file's directory; http(s)
    children are skipped (no network offline) with their count returned
    via the second element.  Returns sorted urlset file paths."""
    if isinstance(root_or_paths, (list, tuple)):
        paths = sorted(str(p) for p in root_or_paths)
    elif os.path.isfile(root_or_paths):
        paths = [root_or_paths]
    else:
        paths = sorted(
            p
            for pat in ("*.xml", "*.xml.gz")
            for p in _glob.glob(os.path.join(root_or_paths, "**", pat), recursive=True)
        )
    urlsets: list[str] = []
    for p in paths:
        kind, entries = parse_sitemap(_read_bytes(p))
        if kind == "urlset":
            urlsets.append(p)
        elif kind == "index":
            base = os.path.dirname(p)
            for loc in entries:
                if loc.startswith(("http://", "https://")):
                    continue  # remote child: unreachable offline
                child = loc if os.path.isabs(loc) else os.path.join(base, loc)
                if os.path.isfile(child):
                    urlsets.append(child)
    return sorted(set(urlsets))


def read_sitemaps(root_or_paths):
    """Dataset (url, lastmod, sitemap): one parse task per urlset file."""
    import ray.data as rd

    files = discover_sitemaps(root_or_paths)
    if not files:
        return rd.from_arrow(_SCHEMA.empty_table())

    def _batch(batch: dict) -> pa.Table:
        urls, mods, src = [], [], []
        for p in batch["path"]:
            _, entries = parse_sitemap(_read_bytes(p))
            for loc, lastmod in entries:
                urls.append(loc)
                mods.append(lastmod)
                src.append(p)
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "lastmod": pa.array(mods, type=pa.timestamp("us")),
                "sitemap": pa.array(src, type=pa.string()),
            }
        )

    return rd.from_items([{"path": p} for p in files]).map_batches(
        _batch, batch_size=1
    )


def write_sitemap(path: str, entries: list, compress: bool = False) -> None:
    """Fixture writer: entries = [(url, lastmod_iso|None)] -> urlset file,
    or a list of child paths -> sitemapindex (entries as plain strings)."""
    if entries and isinstance(entries[0], str):
        body = "".join(
            f"<sitemap><loc>{e}</loc></sitemap>" for e in entries
        )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + body
            + "</sitemapindex>"
        )
    else:
        body = "".join(
            f"<url><loc>{u}</loc>"
            + (f"<lastmod>{lm}</lastmod>" if lm else "")
            + "</url>"
            for u, lm in entries
        )
        xml = (
            '<?xml version="1.0" encoding="UTF-8"?>'
            '<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">'
            + body
            + "</urlset>"
        )
    data = xml.encode("utf-8")
    with open(path, "wb") as f:
        f.write(gzip.compress(data) if compress else data)
