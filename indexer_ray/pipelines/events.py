"""Event-stream-shaped operators over the `events` table
(event_id, ts, user_id, event_type, value, props).

Ray Data is a batch engine (no watermarks); stream semantics are expressed
as ordered, partitioned batch computations (ray_guide: streaming-shaped
workloads).  Tumbling windows pre-aggregate inside map_batches (one row per
(window, key) per batch) before the small groupby — the shuffle moves
aggregates, not events.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc


def _tumble_batch(batch: pa.Table, window: str) -> pa.Table:
    ts = batch.column("ts")
    # keep timestamp[us] through the pandas round-trip (floor_temporal +
    # from_pandas otherwise coerce to [s]/[ns], breaking oracle schema parity)
    bucket = pc.floor_temporal(ts, unit=window).cast(pa.timestamp("us"))
    t = batch.set_column(batch.schema.get_field_index("ts"), "window_start", bucket)
    df = t.select(["window_start", "event_type", "value"]).to_pandas()
    g = (
        df.groupby(["window_start", "event_type"], sort=False)
        .agg(n_events=("value", "size"), sum_value=("value", "sum"))
        .reset_index()
    )
    return pa.Table.from_pandas(g, preserve_index=False)


def tumbling_window_stats(events_ds, window: str = "hour"):
    """(window_start, event_type, n_events, sum_value) tumbling aggregate."""
    from ray.data.aggregate import Sum

    partial = events_ds.map_batches(
        lambda b: _tumble_batch(b, window), batch_format="pyarrow",
        zero_copy_batch=True, batch_size=8192
    )
    agg = partial.groupby(["window_start", "event_type"]).aggregate(
        Sum("n_events", alias_name="n_events"), Sum("sum_value", alias_name="sum_value")
    )

    # Ray's aggregate normalizes hour-aligned timestamps to timestamp[s];
    # restore [us] so the output schema matches the input ts unit.
    def _fix_unit(b: pa.Table) -> pa.Table:
        i = b.schema.get_field_index("window_start")
        return b.set_column(i, "window_start", b.column("window_start").cast(pa.timestamp("us")))

    return agg.map_batches(_fix_unit, batch_format="pyarrow")


def extract_props_key(events_ds, key: str = "k"):
    """Scalar JSON extraction over the `props` column: (event_id, k_value).
    Vectorized per batch with the C json parser; null-safe (missing key or
    bad JSON -> null, matching SQL json_extract semantics)."""
    import json

    def _extract(batch: pa.Table) -> pa.Table:
        out = []
        for p in batch.column("props").to_pylist():
            try:
                v = json.loads(p).get(key) if p else None
            except (ValueError, AttributeError):
                v = None
            out.append(int(v) if v is not None else None)
        return pa.table(
            {
                "event_id": batch.column("event_id"),
                "k_value": pa.array(out, type=pa.int64()),
            }
        )

    return events_ds.map_batches(_extract, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=8192)


def sessionize(events_ds, gap_minutes: float = 30.0):
    """Session windows per user: events sorted by ts within a user group;
    a gap > `gap_minutes` starts a new session.  Output: one row per session
    (user_id, session_idx, session_start, session_end, n_events).

    Partitioning assumption: one user's events fit one group (true for any
    realistic user; pathological users would need the salting treatment)."""

    def per_user(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["ts", "event_id"])
        gap = g["ts"].diff().dt.total_seconds().fillna(0.0) / 60.0
        session_idx = (gap > gap_minutes).cumsum()
        out = (
            g.assign(session_idx=session_idx)
            .groupby("session_idx", sort=True)
            .agg(
                user_id=("user_id", "first"),
                session_start=("ts", "min"),
                session_end=("ts", "max"),
                n_events=("event_id", "size"),
            )
            .reset_index()
        )
        return out[["user_id", "session_idx", "session_start", "session_end", "n_events"]]

    return events_ds.groupby("user_id").map_groups(per_user, batch_format="pandas")
