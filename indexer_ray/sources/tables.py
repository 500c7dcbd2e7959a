"""Parquet table reads shared by the driver contract and bench."""

from __future__ import annotations


def read_parquet_clean(paths, **kwargs):
    """``ray.data.read_parquet`` + strip schema-level metadata.

    Parquet written by pandas carries a `pandas` metadata dict that makes
    the Arrow schema UNHASHABLE (hash(schema) raises "unhashable type:
    'dict'"), which defeats Ray's schema-deduplication fast path and logs
    a warning on every block concatenation of every downstream stage.
    The strip map fuses into the read stage, so all downstream blocks
    carry a clean (hashable) schema; column data is untouched."""
    import ray.data as rd

    return rd.read_parquet(paths, **kwargs).map_batches(
        lambda b: b.replace_schema_metadata(None),
        batch_format="pyarrow",
        zero_copy_batch=True,
    )
