"""Resumable partitioned-parquet sink for ARBITRARY datasets — the
generic output contract the index build's per-partition checkpoints
implement specifically (state/manifest.py): one directory per key-hash
partition, a `_done.json` marker committed AFTER the partition's file,
and a manifest written LAST, so a failed run re-executes only unfinished
partitions and a reader never sees a partial corpus as complete.

Determinism: rows route by the same key_partition hash as every routed
op in this repo and sort by `sort_cols` inside the partition before
writing, so a resumed run produces byte-identical partition files.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def write_partitioned_resumable(
    ds,
    out_dir: str,
    key_col: str,
    n_parts: int = 64,
    sort_cols: list[str] | None = None,
    resume: bool = False,
) -> dict:
    """Write `ds` to `out_dir/part_<p>/data.parquet` (+ `_done.json` per
    partition, `manifest.json` last).  On `resume=True`, partitions whose
    marker exists are SKIPPED — their rows never re-route and their files
    are untouched.  Returns the manifest dict.

    Shape: one groupby-route shuffle, one write task per partition; the
    driver sees only per-partition row counts (n_parts rows)."""
    from indexer_ray.functions.hashing import key_partition

    os.makedirs(out_dir, exist_ok=True)
    manifest_path = os.path.join(out_dir, "manifest.json")
    if not resume:
        for p in range(n_parts):
            d = os.path.join(out_dir, f"part_{p}")
            if os.path.exists(d):
                import shutil

                shutil.rmtree(d)
        if os.path.exists(manifest_path):
            os.remove(manifest_path)

    done = {
        p
        for p in range(n_parts)
        if os.path.exists(os.path.join(out_dir, f"part_{p}", "_done.json"))
    }
    sort_cols = sort_cols or [key_col]

    def _route(t: pa.Table) -> pa.Table:
        keys = t.column(key_col).to_numpy(zero_copy_only=False)
        part = key_partition(keys.astype(np.uint64), n_parts)
        return t.append_column("__part", pa.array(part, type=pa.int32()))

    def _write(g) -> "pa.Table":
        import pandas as pd

        p = int(g["__part"].iloc[0])
        if p in done:  # resumed: already committed
            return pa.table({"part": pa.array([p], type=pa.int32()),
                             "n_rows": pa.array([-1], type=pa.int64())})
        g = g.sort_values(sort_cols, kind="mergesort").drop(columns=["__part"])
        pdir = os.path.join(out_dir, f"part_{p}")
        os.makedirs(pdir, exist_ok=True)
        fp = os.path.join(pdir, "data.parquet")
        tbl = pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)
        pq.write_table(tbl, fp + ".tmp", row_group_size=16384)
        os.replace(fp + ".tmp", fp)  # file visible only when complete
        with open(os.path.join(pdir, "_done.json"), "w") as f:
            json.dump({"part": p, "n_rows": len(g)}, f)
        return pa.table({"part": pa.array([p], type=pa.int32()),
                         "n_rows": pa.array([int(len(g))], type=pa.int64())})

    counts = (
        ds.map_batches(_route, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("__part")
        .map_groups(_write, batch_format="pandas")
        .to_pandas()  # n_parts rows — bounded
    )
    parts = {}
    for p in range(n_parts):
        dj = os.path.join(out_dir, f"part_{p}", "_done.json")
        if os.path.exists(dj):
            with open(dj) as f:
                parts[str(p)] = json.load(f)["n_rows"]
    manifest = {
        "key_col": key_col,
        "n_parts": n_parts,
        "sort_cols": sort_cols,
        "partitions": parts,
        "n_rows": int(sum(parts.values())),
    }
    tmp = manifest_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(manifest, f)
    os.replace(tmp, manifest_path)
    return manifest


def read_partitioned(out_dir: str):
    """Read back a write_partitioned_resumable output (manifest-gated:
    raises if the manifest is missing — a partial run is not a corpus)."""
    import glob as _glob

    import ray.data as rd

    manifest_path = os.path.join(out_dir, "manifest.json")
    if not os.path.exists(manifest_path):
        raise FileNotFoundError(
            f"{manifest_path} missing — incomplete write (resume the writer)"
        )
    files = sorted(_glob.glob(os.path.join(out_dir, "part_*", "data.parquet")))
    return rd.read_parquet(files)
