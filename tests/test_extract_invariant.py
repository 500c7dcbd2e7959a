"""North-rule per-row invariant: byte-identical extracted text per url
(BASELINE.json input_hint), plus html-source build equivalence."""

import glob
import os

import pyarrow.parquet as pq

from indexer_ray.conformance.extract import extract_text
from indexer_ray.pipelines.build import BuildConfig, build_index


def test_extract_text_byte_identical_per_url(tiny_pages):
    t = pq.read_table(tiny_pages, columns=["url", "html", "text"])
    for url, html, text in zip(
        t.column("url").to_pylist(),
        t.column("html").to_pylist(),
        t.column("text").to_pylist(),
    ):
        assert extract_text(html) == text, url  # byte-for-byte


def _parts_bytes(index_dir):
    out = {}
    for d in sorted(glob.glob(os.path.join(index_dir, "parts", "*"))):
        with open(os.path.join(d, "blocks.parquet"), "rb") as f:
            out[os.path.basename(d)] = f.read()
    return out


def test_html_source_build_equals_text_source(ray_session, tiny_pages, tmp_path):
    """Indexing the html column through the extractor produces the same index
    as indexing the text column directly — with verify_extract=True the
    tokenize actors also assert the invariant per row in-flight."""
    cfg = dict(n_partitions=4, block_size=16, tokenize_actors=2, batch_size=64)
    idx_text = str(tmp_path / "from_text")
    idx_html = str(tmp_path / "from_html")
    build_index([tiny_pages], idx_text, BuildConfig(source="text", **cfg))
    build_index(
        [tiny_pages], idx_html, BuildConfig(source="html", verify_extract=True, **cfg)
    )
    assert _parts_bytes(idx_text) == _parts_bytes(idx_html)
