"""JSONL (newline-delimited JSON) corpus source + export sink.

Web-text dumps overwhelmingly ship as JSONL shards — one JSON object per
line with document fields — usually gzipped.  This reader mirrors the
WARC source's shape (sources/warc.py): one parse task per shard, no
shuffle, the build's normal partitioning takes over downstream.  Parsing
is pyarrow's vectorized C++ NDJSON reader (pyarrow.json.read_json), not a
Python json loop; gzip is auto-detected from the file bytes.

The export sink writes deterministic shard files (one per input block
group) so a JSONL corpus can round-trip byte-stably through the engine.
"""

from __future__ import annotations

import glob as _glob
import gzip
import io
import json
import os

import pyarrow as pa


def discover_jsonl_files(root_or_paths) -> list[str]:
    """Sorted .jsonl / .jsonl.gz / .ndjson(.gz) files under a directory,
    or the given explicit path list (order preserved for lists)."""
    if isinstance(root_or_paths, (list, tuple)):
        return [str(p) for p in root_or_paths]
    root = str(root_or_paths)
    if os.path.isfile(root):
        return [root]
    out = []
    for pat in ("*.jsonl", "*.jsonl.gz", "*.ndjson", "*.ndjson.gz"):
        out.extend(_glob.glob(os.path.join(root, "**", pat), recursive=True))
    return sorted(out)


def parse_jsonl_file(path: str, columns: list[str] | None = None) -> pa.Table:
    """One shard -> Arrow table via the vectorized NDJSON reader.  Gzip is
    detected from the magic bytes (not the extension — mislabeled dumps
    are common).  `columns` prunes after parse (the arrow reader has no
    projection pushdown; the per-task working set is one shard)."""
    from pyarrow import json as pajson

    with open(path, "rb") as f:
        head = f.read(2)
    if head == b"\x1f\x8b":
        with gzip.open(path, "rb") as f:
            data = f.read()
        table = pajson.read_json(io.BytesIO(data))
    else:
        table = pajson.read_json(path)
    if columns is not None:
        keep = [c for c in columns if c in table.column_names]
        table = table.select(keep)
    return table


def read_jsonl(root_or_paths, columns: list[str] | None = None,
               concurrency: int | None = None):
    """Dataset over JSONL shard(s): one parse task per file.  Column
    pruning happens inside the task so only requested fields leave it."""
    import ray.data as rd

    files = discover_jsonl_files(root_or_paths)
    if not files:
        return rd.from_items([])

    def _batch(batch: dict) -> pa.Table:
        tables = [parse_jsonl_file(p, columns) for p in batch["path"]]
        return pa.concat_tables(tables, promote_options="default")

    return rd.from_items([{"path": p} for p in files]).map_batches(
        _batch, batch_size=1, concurrency=concurrency
    )


def write_jsonl(ds, out_dir: str, compress: bool = False,
                shard_rows: int = 100_000) -> list[str]:
    """Export a Dataset as JSONL shards under `out_dir`.  Shard names are
    content-addressed (blake2b of the shard bytes) so re-exports of
    identical data are idempotent and a torn write is never mistaken for
    a finished shard (same discipline as export_warc).  Row order inside
    a shard follows the block order; key order inside a line is the
    column order.  Returns the shard paths."""
    import hashlib

    os.makedirs(out_dir, exist_ok=True)
    paths = []
    for i, batch in enumerate(ds.iter_batches(batch_size=shard_rows,
                                              batch_format="pyarrow")):
        buf = io.BytesIO()
        cols = batch.column_names
        arrays = [batch.column(c).to_pylist() for c in cols]
        for row in zip(*arrays):
            buf.write(json.dumps(dict(zip(cols, row)),
                                 ensure_ascii=False).encode("utf-8"))
            buf.write(b"\n")
        data = buf.getvalue()
        if compress:
            data = gzip.compress(data, mtime=0)  # deterministic bytes
        tag = hashlib.blake2b(data, digest_size=8).hexdigest()
        ext = ".jsonl.gz" if compress else ".jsonl"
        path = os.path.join(out_dir, f"shard-{i:05d}-{tag}{ext}")
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            f.write(data)
        os.replace(tmp, path)
        paths.append(path)
    return paths


def index_jsonl_corpus(root_or_paths, index_dir: str, config=None,
                       resume: bool = False,
                       id_column: str = "doc_id",
                       text_column: str = "text"):
    """End-to-end JSONL ingestion: shards -> pages parquet -> build_index,
    the same materialize-then-build resume contract as index_warc_corpus
    (sources/warc.py): extraction runs once behind a completion marker,
    the build resumes from its own per-partition checkpoints.  Returns
    (manifest, n_docs)."""
    import glob as g
    import shutil

    import pyarrow.parquet as pq

    from indexer_ray.pipelines.build import BuildConfig, build_index

    if config is None:
        # JSONL docs carry native ids, not urls — key the build on them
        config = BuildConfig(id_column=id_column)

    pages_dir = index_dir.rstrip("/") + "_pages"
    marker = os.path.join(pages_dir, "_EXTRACTION_COMPLETE")
    if not (resume and os.path.exists(marker)):
        shutil.rmtree(pages_dir, ignore_errors=True)
        read_jsonl(root_or_paths, columns=[id_column, text_column]).write_parquet(
            pages_dir
        )
        os.makedirs(pages_dir, exist_ok=True)
        with open(marker, "w") as f:
            f.write("ok")
    files = sorted(g.glob(os.path.join(pages_dir, "*.parquet")))
    if not files:
        return None, 0
    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    manifest = build_index(files, index_dir, config, resume=resume)
    return manifest, n
