"""Parquet table reads shared by the driver contract and bench."""

from __future__ import annotations

import os


def read_parquet_clean(paths, **kwargs):
    """``ray.data.read_parquet`` with schema-level metadata stripped.

    Parquet written by pandas carries a `pandas` metadata dict that makes
    the Arrow schema UNHASHABLE (hash(schema) raises "unhashable type:
    'dict'"), which defeats Ray's schema-deduplication fast path and logs
    a warning on every block concatenation — including concatenations
    INSIDE the ReadParquet task when one read task spans several
    fragments, which a post-read strip map cannot reach.  Overriding the
    dataset schema with the file schema minus metadata fixes it at the
    source: every block the read emits is already clean, no extra
    operator in the plan; column data is untouched."""
    import pyarrow.parquet as pq
    import ray.data as rd

    first = paths[0] if isinstance(paths, (list, tuple)) else paths
    if os.path.isdir(first):
        import glob as _glob

        cands = sorted(_glob.glob(os.path.join(first, "*.parquet")))
        first = cands[0] if cands else first
    schema = pq.read_schema(first).remove_metadata()
    cols = kwargs.get("columns")
    if cols:  # the override must match the projected read schema
        import pyarrow as pa

        schema = pa.schema([schema.field(c) for c in cols])
    return rd.read_parquet(paths, schema=schema, **kwargs)
