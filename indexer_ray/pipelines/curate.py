"""End-to-end corpus curation: the canonical admission → dedup → mixing
chain a web crawl goes through before training, composed from this
repo's operators so the whole chain stays streaming and oracle-checkable.

Stage order matters and is fixed: quality ADMISSION first (cheap pure
map, shrinks everything downstream), exact DEDUP second (keeps the
smallest doc_id per distinct content), MIXTURE sampling last (rates are
defined over the deduplicated admitted pool).  Near-dup removal /
decontamination slot between dedup and mixing — they are Dataset-in/
Dataset-out (dedup.drop_duplicates_ds, dedup.decontaminate_ds) and
compose the same way; the default chain keeps to the SQL-expressible
stages so the driver oracle can hash-check the full composition.
"""

from __future__ import annotations

import pyarrow as pa


def curate_corpus(
    ds,
    rates: dict[str, float],
    default: float = 0.0,
    min_tokens: int = 5,
    max_digit_pct: int = 30,
    min_alpha_pct: int = 50,
    group_col: str = "source",
    join_partitions: int | None = None,
):
    """documents Dataset -> curated Dataset (original columns).

    Shape: both keep-sets (quality-admitted ids, exact-dedup keeper ids)
    stay DISTRIBUTED and semi-join the corpus with inner hash joins —
    no driver materialization, no broadcast of corpus-sized id sets;
    the mixture draw is a pure map."""
    import ray

    from indexer_ray.pipelines.dedup import exact_duplicates
    from indexer_ray.pipelines.sampling import mixture_sample
    from indexer_ray.pipelines.text_analysis import quality_filter

    jp = join_partitions or max(2, int(ray.cluster_resources().get("CPU", 8)) // 2)

    admitted = quality_filter(
        ds, min_tokens=min_tokens, max_digit_pct=max_digit_pct,
        min_alpha_pct=min_alpha_pct,
    )
    keepers = exact_duplicates(ds).map_batches(
        lambda t: pa.table({"doc_id": t.column("keep_doc_id")}),
        batch_format="pyarrow",
    )
    kept = ds.join(admitted, "inner", jp, on=("doc_id",)).join(
        keepers, "inner", jp, on=("doc_id",)
    )
    return mixture_sample(kept, rates, default=default, group_col=group_col)
