"""WARC (Web ARChive) ingestion — the webtext analogue of the reference's
file-corpus input mode (lib.rs:150-193 discovers files; SURVEY.md S1-S4).
Web-scale corpora (Common Crawl and friends) ship as WARC, so a user
switching their crawl pipeline here ingests it natively instead of
pre-exploding archives into files.

From-spec, stdlib-only (the same pattern as the PDF/PNG/JPEG decoders):
the WARC 1.0/1.1 record grammar per ISO 28500 — `WARC/1.x` version line,
CRLF-terminated named headers (with obs-fold continuation lines), a blank
line, a Content-Length-byte block, then CRLF CRLF — plus the per-record-
gzip-member convention used by crawl archives (`.warc.gz`: each record its
own gzip member; stdlib gzip handles concatenated members natively).

`read_warc` emits the repo's pages shape (url, warc_ts, html, text, lang):
 - `response` records carry an HTTP/1.x message in the block: status line
   and headers are stripped, the payload is the body (chunked
   transfer-encoding is NOT decoded — crawlers store decoded payloads;
   such records are skipped rather than mis-decoded);
 - `resource` / `conversion` records carry the payload directly;
 - all other record types (warcinfo, request, metadata, revisit, ...) are
   skipped, as is any malformed/truncated tail (tolerant reader: a bad
   record ends that FILE's parse, never the job).
Payload routing: text/html keeps the raw bytes in `html` and extracts
`text` via the reference-parity extractor chain (functions/extractors.py);
text/plain decodes straight to `text`; anything else yields empty text and
is dropped by the build's empty-doc rule (Q9), mirroring S4's
unregistered-extension drop.

Scale design: discovery is driver-side names-only; parsing is one Ray task
per WARC file — the standard Common-Crawl work granularity (~1 GiB/file),
so a 100-TB crawl is ~10^5 independent tasks with no shuffle.  Records
stream out of the byte scan; only one file's bytes are resident per task.
"""

from __future__ import annotations

import glob as _glob
import gzip
import os
from datetime import datetime, timezone

import pyarrow as pa

_PAGES_SCHEMA = pa.schema(
    {
        "url": pa.string(),
        "warc_ts": pa.timestamp("us"),
        "html": pa.binary(),
        "text": pa.string(),
        "lang": pa.string(),
    }
)

_CRLF = b"\r\n"


def _parse_warc_records(data: bytes):
    """Yield (headers: dict[str,str] lower-keyed, block: bytes) per record.

    Tolerant: stops at the first structural violation instead of raising
    (a truncated crawl file yields its complete prefix)."""
    pos = 0
    n = len(data)
    while pos < n:
        # skip inter-record padding (spec mandates exactly CRLFCRLF, but
        # tolerate extra blank lines seen in the wild)
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            return
        eol = data.find(_CRLF, pos)
        if eol < 0 or not data[pos:eol].startswith(b"WARC/"):
            return
        pos = eol + 2
        headers: dict[str, str] = {}
        last_key = None
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                return
            line = data[pos:eol]
            pos = eol + 2
            if not line:
                break  # blank line: block follows
            if line[:1] in (b" ", b"\t") and last_key:
                # RFC 822 obs-fold continuation
                headers[last_key] += " " + line.strip().decode("latin-1")
                continue
            sep = line.find(b":")
            if sep < 0:
                return
            last_key = line[:sep].strip().decode("latin-1").lower()
            headers[last_key] = line[sep + 1 :].strip().decode("latin-1")
        try:
            clen = int(headers.get("content-length", ""))
        except ValueError:
            return
        if clen < 0 or pos + clen > n:
            return  # truncated block
        yield headers, data[pos : pos + clen]
        pos += clen


def _http_payload(block: bytes) -> tuple[str, bytes] | None:
    """Split an HTTP/1.x response message into (content-type, body).
    None for non-HTTP blocks or chunked transfer-encoding (stored-chunked
    payloads would mis-decode — skip, per module docstring)."""
    if not block.startswith(b"HTTP/"):
        return None
    head_end = block.find(b"\r\n\r\n")
    if head_end < 0:
        return None
    ctype = ""
    for line in block[:head_end].split(_CRLF)[1:]:
        sep = line.find(b":")
        if sep < 0:
            continue
        k = line[:sep].strip().lower()
        v = line[sep + 1 :].strip().decode("latin-1")
        if k == b"content-type":
            ctype = v
        elif k == b"transfer-encoding" and "chunked" in v.lower():
            return None
    return ctype, block[head_end + 4 :]


def _parse_warc_date(s: str) -> int | None:
    """WARC-Date (ISO 8601 UTC, `2017-03-06T04:03:53Z`) -> epoch us."""
    try:
        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1e6)
    except ValueError:
        return None


def _decode_text(body: bytes, ctype: str) -> str:
    """Decode a text payload honouring a `charset=` parameter; utf-8 with
    latin-1 fallback otherwise (never raises)."""
    charset = "utf-8"
    for part in ctype.split(";")[1:]:
        k, _, v = part.partition("=")
        if k.strip().lower() == "charset" and v.strip():
            charset = v.strip().strip('"').lower()
    for cs in (charset, "utf-8", "latin-1"):
        try:
            return body.decode(cs)
        except (UnicodeDecodeError, LookupError):
            continue
    return ""


def parse_warc_file(path: str) -> pa.Table:
    """One WARC file -> pages-shaped Arrow table (the per-task body)."""
    from indexer_ray.functions.extractors import get_extractor

    with open(path, "rb") as f:
        raw = f.read()
    if raw[:2] == b"\x1f\x8b":
        try:
            raw = gzip.decompress(raw)  # concatenated members supported
        except OSError:
            raw = b""
    html_extract = get_extractor("html")
    urls, tss, htmls, texts = [], [], [], []
    for headers, block in _parse_warc_records(raw):
        rtype = headers.get("warc-type", "").lower()
        if rtype == "response":
            payload = _http_payload(block)
            if payload is None:
                continue
            ctype, body = payload
        elif rtype in ("resource", "conversion"):
            ctype, body = headers.get("content-type", ""), block
        else:
            continue
        uri = headers.get("warc-target-uri", "").strip("<>")
        if not uri:
            continue
        base = ctype.split(";")[0].strip().lower()
        if base == "text/html":
            text = html_extract(body) or ""
            html_bytes = body
        elif base == "text/plain":
            text = _decode_text(body, ctype)
            html_bytes = b""
        else:
            text, html_bytes = "", b""  # S4 analogue: unrouted type
        urls.append(uri)
        tss.append(_parse_warc_date(headers.get("warc-date", "")))
        htmls.append(html_bytes)
        texts.append(text)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([""] * len(urls), type=pa.string()),
        }
    )


def discover_warc_files(root_or_paths) -> list[str]:
    """Driver-side names-only discovery: a directory (recursive
    *.warc / *.warc.gz glob), a single file, or an explicit list.
    Deterministic (sorted)."""
    if isinstance(root_or_paths, (list, tuple)):
        return sorted(str(p) for p in root_or_paths)
    if os.path.isfile(root_or_paths):
        return [root_or_paths]
    out = []
    for pat in ("*.warc", "*.warc.gz"):
        out += _glob.glob(os.path.join(root_or_paths, "**", pat), recursive=True)
    return sorted(out)


def read_warc(root_or_paths, concurrency: int | None = None):
    """Pages-shaped Dataset over WARC file(s): one parse task per file
    (no shuffle; the build's normal partitioning takes over downstream)."""
    import ray.data as rd

    files = discover_warc_files(root_or_paths)
    if not files:
        return rd.from_arrow(_PAGES_SCHEMA.empty_table())

    def _batch(batch: dict) -> pa.Table:
        tables = [parse_warc_file(p) for p in batch["path"]]
        return pa.concat_tables(tables) if tables else _PAGES_SCHEMA.empty_table()

    return rd.from_items([{"path": p} for p in files]).map_batches(
        _batch, batch_size=1, concurrency=concurrency
    )


def index_warc_corpus(root_or_paths, index_dir: str, config=None, resume: bool = False):
    """End-to-end crawl ingestion: WARC -> pages parquet -> build_index,
    with the same materialize-then-build resume contract as
    index_file_corpus (per-file lineage, manifest-last commit).
    Returns (manifest, n_pages)."""
    import shutil

    import pyarrow.parquet as pq

    from indexer_ray.pipelines.build import build_index

    pages_dir = index_dir.rstrip("/") + "_pages"
    marker = os.path.join(pages_dir, "_EXTRACTION_COMPLETE")
    if not (resume and os.path.exists(marker)):
        shutil.rmtree(pages_dir, ignore_errors=True)
        read_warc(root_or_paths).write_parquet(pages_dir)
        os.makedirs(pages_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write("ok")
    files = sorted(_glob.glob(os.path.join(pages_dir, "*.parquet")))
    if not files:
        return None, 0
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    manifest = build_index(files, index_dir, config, resume=resume)
    return manifest, n


# ---------------------------------------------------------------------------
# Fixture writer (tests/driver query — exact inverse of the reader subset)
# ---------------------------------------------------------------------------


def write_warc(
    path: str,
    records: list[dict],
    compress: bool = False,
    http_wrap: bool = False,
) -> None:
    """Write records [{url, date, ctype, body(bytes|str)}] as a WARC file
    (leading warcinfo record; `compress` -> one gzip member per record;
    `http_wrap` -> response records with an HTTP/1.1 200 envelope, else
    resource records)."""

    def _record(headers: list[tuple[str, str]], block: bytes) -> bytes:
        head = b"WARC/1.0\r\n" + b"".join(
            f"{k}: {v}\r\n".encode("latin-1") for k, v in headers
        )
        head += f"Content-Length: {len(block)}\r\n".encode()
        return head + _CRLF + block + _CRLF + _CRLF

    chunks = [
        _record(
            [
                ("WARC-Type", "warcinfo"),
                ("WARC-Date", "2020-01-01T00:00:00Z"),
                ("Content-Type", "application/warc-fields"),
            ],
            b"software: indexer_ray fixture writer\r\n",
        )
    ]
    for r in records:
        body = r["body"].encode("utf-8") if isinstance(r["body"], str) else r["body"]
        ctype = r.get("ctype", "text/plain")
        if http_wrap:
            block = (
                b"HTTP/1.1 200 OK\r\n"
                + f"Content-Type: {ctype}\r\n".encode("latin-1")
                + f"Content-Length: {len(body)}\r\n".encode()
                + _CRLF
                + body
            )
            headers = [
                ("WARC-Type", "response"),
                ("WARC-Target-URI", r["url"]),
                ("WARC-Date", r.get("date", "2020-01-01T00:00:00Z")),
                ("Content-Type", "application/http;msgtype=response"),
            ]
        else:
            block = body
            headers = [
                ("WARC-Type", "resource"),
                ("WARC-Target-URI", r["url"]),
                ("WARC-Date", r.get("date", "2020-01-01T00:00:00Z")),
                ("Content-Type", ctype),
            ]
        chunks.append(_record(headers, block))
    with open(path, "wb") as f:
        for c in chunks:
            f.write(gzip.compress(c) if compress else c)


def export_warc(
    ds,
    out_dir: str,
    compress: bool = True,
    http_wrap: bool = False,
):
    """Inverse path: a pages-shaped Dataset (url, warc_ts, text and/or
    html) -> a directory of WARC shards, one file per input block (the
    same no-shuffle granularity as read_warc's one-task-per-file).  Rows
    with an `html` payload export as text/html records (original bytes);
    text-only rows as text/plain.  Shard names are content-derived
    (blake2b of the block's urls) so re-running an identical export is
    idempotent — the resumability convention of the parquet sink.

    Returns the shard manifest as a list of {path, n_records}, collected
    via take_all() — bounded: one row per BLOCK, not per record."""
    import hashlib
    from datetime import datetime, timezone

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    def _write(t: pa.Table) -> pa.Table:
        urls = t.column("url").to_pylist()
        if not urls:
            return pa.table({"path": pa.array([], type=pa.string()),
                             "n_records": pa.array([], type=pa.int64())})
        texts = (
            t.column("text").to_pylist()
            if "text" in t.schema.names
            else [None] * len(urls)
        )
        htmls = (
            t.column("html").to_pylist()
            if "html" in t.schema.names
            else [None] * len(urls)
        )
        tss = (
            t.column("warc_ts").to_pylist()
            if "warc_ts" in t.schema.names
            else [None] * len(urls)
        )
        recs = []
        for u, txt, h, ts in zip(urls, texts, htmls, tss):
            if ts is None:
                date = "2020-01-01T00:00:00Z"
            else:
                dt = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
                date = dt.astimezone(timezone.utc).strftime("%Y-%m-%dT%H:%M:%SZ")
            if h:
                recs.append({"url": u, "date": date, "ctype": "text/html",
                             "body": bytes(h)})
            else:
                recs.append({"url": u, "date": date,
                             "ctype": "text/plain; charset=utf-8",
                             "body": txt or ""})
        digest = hashlib.blake2b(
            "\x00".join(urls).encode("utf-8"), digest_size=10
        ).hexdigest()
        path = os.path.join(out_dir, f"shard-{digest}{ext}")
        write_warc(path, recs, compress=compress, http_wrap=http_wrap)
        return pa.table(
            {
                "path": pa.array([path], type=pa.string()),
                "n_records": pa.array([len(recs)], type=pa.int64()),
            }
        )

    manifest = ds.map_batches(_write, batch_format="pyarrow").take_all()
    return sorted(manifest, key=lambda r: r["path"])
