"""Deterministic synthetic `pages` corpus (FIXTURES.md F1) and the reference
query set (F2).

Schema (the authoritative input shape from BASELINE.json `input_hint`):
    url: string, warc_ts: timestamp[us], html: binary, text: string,
    lang: string

Every byte is a pure function of (seed, row index) via a counter-based
splitmix64 hash — independent of chunk size, writer parallelism, or wall
clock — so any two generators (and resumed generations) produce identical
tables.  Word stream is Zipf(s=1.07) over a 50k-word synthetic vocabulary
(hot-head skew like real web text); fixed row indices inject punctuation
runs, numerics, mixed alphanumerics, Unicode probes, and a per-row
``needle{i}`` term for exact-match tests.  ``text`` is DEFINED as
``extract_text(html)``, which makes the north-rule invariant
"byte-identical extracted text per url" testable by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from indexer_ray.conformance.extract import extract_text

VOCAB_SIZE = 50_000
ZIPF_S = 1.07
_LANGS = ("en", "en", "en", "de", "fr")
_PUNCT = (".", ",", "!", "?", ";", ":")
_M = np.uint64(0xFFFFFFFFFFFFFFFF)

_SYLLABLES = (
    "ba be bi bo bu da de di do du fa fe fi fo fu ga ge gi go gu "
    "ka ke ki ko ku la le li lo lu ma me mi mo mu na ne ni no nu "
    "pa pe pi po pu ra re ri ro ru sa se si so su ta te ti to tu "
    "va ve vi vo vu za ze zi zo zu"
).split()


def _splitmix64(x: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (x + np.uint64(0x9E3779B97F4A7C15)) & _M
        z = ((z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)) & _M
        z = ((z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)) & _M
        return z ^ (z >> np.uint64(31))


def _hash_u01(seed: int, stream: int, counters: np.ndarray) -> np.ndarray:
    """Uniform [0,1) per counter, derived from (seed, stream, counter)."""
    x = counters.astype(np.uint64)
    with np.errstate(over="ignore"):
        x = x + (np.uint64(seed) * np.uint64(0x5851F42D4C957F2D)) & _M
        x = x + (np.uint64(stream) * np.uint64(0x14057B7EF767814F)) & _M
    return (_splitmix64(x) >> np.uint64(11)).astype(np.float64) / float(1 << 53)


def make_vocab(size: int = VOCAB_SIZE) -> list[str]:
    base = len(_SYLLABLES)
    words = []
    for k in range(size):
        x, parts = k + base, []
        while x > 0:
            parts.append(_SYLLABLES[x % base])
            x //= base
        words.append("".join(parts))
    return words


def _zipf_cdf(size: int = VOCAB_SIZE, s: float = ZIPF_S) -> np.ndarray:
    w = 1.0 / np.arange(1, size + 1, dtype=np.float64) ** s
    cdf = np.cumsum(w)
    return cdf / cdf[-1]


_VOCAB: list[str] | None = None
_CDF: np.ndarray | None = None


def _tables() -> tuple[list[str], np.ndarray]:
    global _VOCAB, _CDF
    if _VOCAB is None:
        _VOCAB = make_vocab()
        _CDF = _zipf_cdf()
    return _VOCAB, _CDF


def _row_html(i: int, words: list[str]) -> tuple[str, str, str]:
    """Returns (url, lang, html_str) for global row index i."""
    lang = _LANGS[i % len(_LANGS)]
    url = f"https://site{i % 997}.example/{lang}/page/{i:012d}"
    # inject probes at fixed indices
    if i % 13 == 0:
        words = words + ["2024", "3.14", "abc123"]
    if i % 251 == 0:
        words = words + ["ΣΟΦΟΣ", "café", "naïve"]
    words = words + [f"needle{i}"]
    # sprinkle punctuation deterministically
    out = []
    for j, w in enumerate(words):
        out.append(w)
        if (i + j) % 7 == 0:
            out.append(_PUNCT[(i + j) % len(_PUNCT)])
    mid = len(out) // 2
    p1, p2 = " ".join(out[:mid]), " ".join(out[mid:])
    title = " ".join(words[:3])
    html = (
        f"<html><head><title>{title}</title></head>"
        f'<body><div class="c{i % 7}"><p>{p1}</p><p>{p2}</p>'
        f'<a href="/l/{i % 89}">{words[0] if words else "x"}</a></div></body></html>'
    )
    return url, lang, html


def generate_pages_batch(start: int, n: int, seed: int = 42) -> pa.Table:
    """Rows [start, start+n) of the pages table — pure function of seed."""
    vocab, cdf = _tables()
    idx = np.arange(start, start + n, dtype=np.int64)
    # doc length: 30..200 words
    dlen = (30 + _hash_u01(seed, 1, idx) * 170).astype(np.int64)
    max_len = int(dlen.max()) if n else 0
    # word ranks for the full (n, max_len) grid, chunk-size independent:
    # counter for (row i, word j) = i * 2^20 + j
    counters = (idx[:, None] * np.int64(1 << 20)) + np.arange(max_len, dtype=np.int64)[None, :]
    u = _hash_u01(seed, 2, counters.ravel()).reshape(n, max_len)
    ranks = np.searchsorted(cdf, u, side="right")
    urls, langs, htmls, texts = [], [], [], []
    for r in range(n):
        i = int(idx[r])
        words = [vocab[k] for k in ranks[r, : dlen[r]]]
        url, lang, html = _row_html(i, words)
        urls.append(url)
        langs.append(lang)
        htmls.append(html.encode("utf-8"))
        texts.append(extract_text(html))
    ts = pa.array(
        (np.int64(1735689600_000000) + idx * np.int64(1_000_000)),  # 2025-01-01 UTC + i sec
        type=pa.timestamp("us"),
    )
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": ts,
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    )


def generate_pages_parquet(
    path: str,
    n_rows: int,
    seed: int = 42,
    start: int = 0,
    chunk: int = 20_000,
    row_group_size: int = 4096,
) -> str:
    """Write rows [start, start+n_rows) to one parquet file.

    Small row groups matter: they are the unit of read parallelism for
    Ray's parquet reader AND the task unit of the dense-id build path."""
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    writer = None
    for s in range(start, start + n_rows, chunk):
        t = generate_pages_batch(s, min(chunk, start + n_rows - s), seed=seed)
        if writer is None:
            writer = pq.ParquetWriter(path, t.schema)
        writer.write_table(t, row_group_size=row_group_size)
    if writer is not None:
        writer.close()
    return path


def generate_pages_dir(
    out_dir: str, n_rows: int, seed: int = 42, rows_per_file: int = 50_000
) -> list[str]:
    """Write the corpus as a directory of parquet shards (the realistic
    multi-file layout; shard boundaries don't affect content)."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for s in range(0, n_rows, rows_per_file):
        p = os.path.join(out_dir, f"pages-{s:012d}.parquet")
        generate_pages_parquet(p, min(rows_per_file, n_rows - s), seed=seed, start=s)
        paths.append(p)
    return paths


def generate_pages_dir_parallel(
    out_dir: str, n_rows: int, seed: int = 42, rows_per_file: int = 50_000
) -> list[str]:
    """Parallel shard generation via Ray tasks (shards are pure functions of
    (seed, row range), so this is byte-identical to the sequential path).
    Requires an initialised Ray session; falls back to sequential without."""
    import os

    import ray

    if not ray.is_initialized():
        return generate_pages_dir(out_dir, n_rows, seed=seed, rows_per_file=rows_per_file)
    os.makedirs(out_dir, exist_ok=True)

    @ray.remote(num_cpus=1)
    def _gen(path: str, rows: int, start: int) -> str:
        return generate_pages_parquet(path, rows, seed=seed, start=start)

    refs = []
    for s in range(0, n_rows, rows_per_file):
        p = os.path.join(out_dir, f"pages-{s:012d}.parquet")
        refs.append(_gen.remote(p, min(rows_per_file, n_rows - s), s))
    return ray.get(refs)


def reference_queries() -> list[dict]:
    """The fixed reference query set (FIXTURES.md F2)."""
    vocab, _ = _tables()
    hot = vocab[0]
    mid = vocab[100]
    rare = vocab[20_000]
    qs = [
        f"needle17",
        f"needle42 needle43",
        hot,
        f"{hot} {mid}",
        f"{mid} {rare}",
        rare,
        "the and of",  # all stop words -> empty
        ". , /",  # punctuation-only
        "2024",
        "3.14",
        "abc123",
        "running run",
        "indexes indexing",
        "has having",
        "ΣΟΦΟΣ",
        "café",
        f"{vocab[3]} {vocab[7]} {vocab[11]}",
        f"{vocab[500]} needle99",
        f"{mid} {mid}",  # duplicate query token (double accumulation quirk)
        f"{vocab[1]}",
        f"{vocab[2]} 2024",
        f"{vocab[40_000]}",
    ]
    return [{"query_id": i, "query": q, "k": 10} for i, q in enumerate(qs)]
