"""Driver-side workaround for a Ray Data wart: empty sort/shuffle ranges
lose their schema.

`ArrowBlockAccessor.merge_sorted_blocks` (ray/data/_internal/arrow_block.py)
drops zero-row input blocks and, when a reduce range is entirely empty,
returns `_empty_table()` — a ZERO-COLUMN table — even though every typed
empty block fed to it carried the stage schema.  The streaming executor
then logs "Operator produced a RefBundle with a different schema ...
new schema: ." for every such range and marks the operator's schema as
diverged, which defeats schema dedup for the rest of the stream.

A zero-row bundle carries no schema information, so its "divergence" is
a false alarm: the executor's own recovery (keep the previous schema)
is exactly right, only the warning and the diverged flag are wrong.
This patch narrows `dedupe_schemas_with_validation` so that a 0-row
bundle with an empty schema adopts the previous schema SILENTLY; every
other input goes through Ray's original code path untouched (real
schema divergences still warn).

Applied on package import; the function runs only in the driver process
(the streaming executor), so no worker-side import ordering matters.
Remove when Ray's sort reduce preserves the schema of typed empty
blocks upstream.
"""

from __future__ import annotations

_PATCHED = False


def apply() -> None:
    global _PATCHED
    if _PATCHED:
        return
    try:
        from ray.data._internal.execution import streaming_executor_state as _ses
        from ray.data.block import _is_empty_schema
    except Exception:  # Ray internals moved — fail open, warnings return
        return

    _orig = _ses.dedupe_schemas_with_validation

    def _patched(old_schema, bundle, warn=True, enforce_schemas=False):
        if (
            not _is_empty_schema(old_schema)
            and _is_empty_schema(bundle.schema)
            and (bundle.num_rows() or 0) == 0
        ):
            # empty range from a sort/shuffle reduce: no schema info in a
            # 0-row bundle — adopt the previous schema without the
            # divergence warning OR flag (the flag is one-shot per
            # operator; an empty bundle must not consume the slot a real
            # divergence would report on)
            try:
                from ray.data._internal.execution.interfaces import RefBundle

                return (
                    RefBundle(
                        bundle.blocks,
                        schema=old_schema,
                        owns_blocks=bundle.owns_blocks,
                        output_split_idx=bundle.output_split_idx,
                        _cached_object_meta=bundle._cached_object_meta,
                        _cached_preferred_locations=(
                            bundle._cached_preferred_locations
                        ),
                    ),
                    False,
                )
            except Exception:  # constructor drift — at least drop the warn
                return _orig(
                    old_schema, bundle, warn=False, enforce_schemas=enforce_schemas
                )
        return _orig(old_schema, bundle, warn=warn, enforce_schemas=enforce_schemas)

    _patched._indexer_ray_patch = True  # idempotence marker
    if not getattr(_orig, "_indexer_ray_patch", False):
        _ses.dedupe_schemas_with_validation = _patched
    _PATCHED = True
