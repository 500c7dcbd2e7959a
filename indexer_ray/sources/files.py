"""File-corpus ingestion — the reference's primary input mode
(`indexer index --path ./docs`: recursive discovery lib.rs:150-193,
extension dispatch to parsers lib.rs:226-258; SURVEY.md S1-S4).

`read_file_corpus` walks a directory tree on the driver (names + stat
only — cheap even for millions of files), then extracts file contents in
parallel Ray tasks via the extension->parser registry
(functions/extractors.py).  The output is a pages-shaped Dataset
(url, warc_ts, html, text, lang) that feeds the normal parquet build:
`index_file_corpus` materializes it (the build's per-file resume/lineage
contract) and runs `build_index`.

Reference semantics kept: unregistered extensions are DROPPED (S4);
hidden files (dot-prefixed) are skipped unless `include_hidden`
(lib.rs:150-193; the exec-bit rule is Q10, consciously excluded);
undecodable/unparseable files yield no text and are skipped by the
build's empty-doc rule (Q9).
"""

from __future__ import annotations

import os

import pyarrow as pa

from indexer_ray.functions.extractors import get_extractor


def discover_files(
    root: str,
    include_hidden: bool = False,
    skip_paths: list[str] | None = None,
) -> list[dict]:
    """Driver-side recursive walk: [{path, ext, mtime_us}] for files whose
    extension has a registered extractor.  Deterministic (sorted).

    Skip entries match either the BASENAME or the FULL PATH of an entry,
    and apply to directories during recursion too (a skipped directory's
    whole subtree is pruned) — the reference's skip semantics
    (lib.rs:158-179)."""
    skipset = {os.path.normpath(s) for s in (skip_paths or [])}

    def _skipped(dirpath: str, name: str) -> bool:
        return bool(skipset) and (
            name in skipset
            or os.path.normpath(os.path.join(dirpath, name)) in skipset
        )

    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        if not include_hidden:
            dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        dirnames[:] = [d for d in dirnames if not _skipped(dirpath, d)]
        dirnames.sort()
        for name in sorted(filenames):
            if not include_hidden and name.startswith("."):
                continue
            if _skipped(dirpath, name):
                continue
            ext = name.rsplit(".", 1)[-1].lower() if "." in name else ""
            if get_extractor(ext) is None:
                continue  # S4: unregistered extension -> dropped
            p = os.path.join(dirpath, name)
            try:
                mtime_us = int(os.stat(p).st_mtime * 1e6)
            except OSError:
                continue  # dangling symlink / deleted mid-walk: skip
            out.append({"path": p, "ext": ext, "mtime_us": mtime_us})
    return out


def _extract_batch(batch: dict, registry: dict) -> pa.Table:
    """Stateless task body: read + extract one descriptor batch.  Returns
    pages-shaped rows; extraction failure -> empty text (Q9 skip).

    `registry` is a DRIVER-TIME snapshot of the needed extractors, shipped
    with the task: resolving `get_extractor` inside the worker would see a
    fresh module whose runtime registrations (register_extractor) never
    happened there."""
    urls, tss, texts = [], [], []
    for path, ext, mtime in zip(batch["path"], batch["ext"], batch["mtime_us"]):
        extractor = registry[str(ext)]
        try:
            with open(path, "rb") as f:
                raw = f.read()
            text = extractor(raw)
        except (OSError, ValueError):
            text = None
        urls.append(str(path))
        tss.append(int(mtime))
        texts.append(text or "")
    n = len(urls)
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(tss, type=pa.timestamp("us")),
            "html": pa.array([b""] * n, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array([""] * n, type=pa.string()),
        }
    )


def read_file_corpus(
    root: str,
    include_hidden: bool = False,
    skip_paths: list[str] | None = None,
    batch_size: int = 64,
):
    """Pages-shaped Dataset over a directory of txt/md/csv/html/xml/pdf
    files (plus any runtime-registered types).  url = file path,
    warc_ts = mtime (the incremental pipeline's freshness key — so
    `filter_expired` gives the reference's mtime-skip re-index behavior
    on file corpora too)."""
    import ray.data as rd

    descriptors = discover_files(root, include_hidden, skip_paths)
    if not descriptors:
        return rd.from_arrow(
            pa.table(
                {
                    "url": pa.array([], type=pa.string()),
                    "warc_ts": pa.array([], type=pa.timestamp("us")),
                    "html": pa.array([], type=pa.binary()),
                    "text": pa.array([], type=pa.string()),
                    "lang": pa.array([], type=pa.string()),
                }
            )
        )
    registry = {d["ext"]: get_extractor(d["ext"]) for d in descriptors}
    return rd.from_items(descriptors).map_batches(
        _extract_batch, fn_kwargs={"registry": registry}, batch_size=batch_size
    )


def index_file_corpus(
    root: str,
    index_dir: str,
    config=None,
    include_hidden: bool = False,
    skip_paths: list[str] | None = None,
    resume: bool = False,
):
    """End-to-end reference-CLI analogue: discover -> extract -> build.

    The extracted pages are materialized to parquet next to the index
    (sibling dir, same pattern as build_delta_index: the build's
    resume/lineage contract is per input file), then `build_index` runs
    with its full checkpoint/resume machinery.  Returns (manifest, n_files).
    """
    import glob as _glob
    import shutil

    from indexer_ray.pipelines.build import build_index

    if config is not None and getattr(config, "source", "text") != "text":
        raise ValueError(
            "index_file_corpus extracts text during ingestion; "
            "BuildConfig.source must stay 'text' (got "
            f"{config.source!r} — a files corpus has no html column)"
        )
    pages_dir = index_dir.rstrip("/") + "_pages"
    marker = os.path.join(pages_dir, "_EXTRACTION_COMPLETE")
    # resume only trusts a COMPLETE extraction: a crash mid-write leaves
    # parquet fragments but no marker, and indexing a partial corpus
    # silently drops documents (ids would also shift on rebuild)
    if resume and os.path.exists(marker):
        pass  # reuse the materialized extraction (ids must stay stable)
    else:
        shutil.rmtree(pages_dir, ignore_errors=True)
        read_file_corpus(root, include_hidden, skip_paths).write_parquet(pages_dir)
        os.makedirs(pages_dir, exist_ok=True)  # 0-row write creates no dir
        with open(marker, "w") as f:
            f.write("ok")
    files = sorted(_glob.glob(os.path.join(pages_dir, "*.parquet")))
    if not files:
        return None, 0
    import pyarrow.parquet as pq

    n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
    manifest = build_index(files, index_dir, config, resume=resume)
    return manifest, n
