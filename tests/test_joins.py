"""asof_join edge cases: equality match, no-match sentinel, per-user
isolation, equal-ts right rows resolving to max event_id."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from indexer_ray.pipelines.joins import asof_join


def _ds(rows):
    import ray.data as rd

    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], type=pa.int64()),
            "user_id": pa.array([r[1] for r in rows], type=pa.int64()),
            "ts": pa.array(
                [np.datetime64(r[2], "us") for r in rows], type=pa.timestamp("us")
            ),
        }
    )
    return rd.from_arrow(t)


def test_asof_join_semantics(ray_session):
    # user 1: clicks at t=10, t=20 (two rows at t=20 -> max event_id wins)
    # user 2: no clicks at all
    left = _ds(
        [
            (100, 1, "2024-01-01T00:00:05"),  # before any click -> -1
            (101, 1, "2024-01-01T00:00:10"),  # equal ts -> matches click@10
            (102, 1, "2024-01-01T00:00:15"),  # -> click@10
            (103, 1, "2024-01-01T00:00:25"),  # -> max-id click@20
            (104, 2, "2024-01-01T00:00:30"),  # other user -> -1
        ]
    )
    right = _ds(
        [
            (7, 1, "2024-01-01T00:00:10"),
            (8, 1, "2024-01-01T00:00:20"),
            (9, 1, "2024-01-01T00:00:20"),  # same (user, ts): 9 > 8 wins
        ]
    )
    out = (
        asof_join(left, right)
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {
            "event_id": [100, 101, 102, 103, 104],
            "matched_event_id": [-1, 7, 7, 9, -1],
        }
    ).astype("int64")
    pd.testing.assert_frame_equal(out, expect)


def test_asof_join_vs_pandas_merge_asof(ray_session):
    """Random case diffed against pandas.merge_asof per user."""
    rng = np.random.default_rng(4)
    n_users = 7
    lrows, rrows = [], []
    eid = 0
    for u in range(n_users):
        for _ in range(rng.integers(3, 30)):
            ts = f"2024-01-01T{rng.integers(0,24):02d}:{rng.integers(0,60):02d}:{rng.integers(0,60):02d}"
            lrows.append((eid, u, ts))
            eid += 1
        for _ in range(rng.integers(0, 10)):
            ts = f"2024-01-01T{rng.integers(0,24):02d}:{rng.integers(0,60):02d}:{rng.integers(0,60):02d}"
            rrows.append((eid, u, ts))
            eid += 1
    out = asof_join(_ds(lrows), _ds(rrows)).to_pandas()
    got = dict(zip(out["event_id"], out["matched_event_id"]))
    # spec: per left row, right row with max ts <= left.ts, ties -> max id
    for le, lu, lts in lrows:
        lts = np.datetime64(lts, "us")
        cands = [
            (np.datetime64(rts, "us"), re)
            for re, ru, rts in rrows
            if ru == lu and np.datetime64(rts, "us") <= lts
        ]
        want = max(cands)[1] if cands else -1
        assert got[le] == want, (le, got[le], want)


def test_interval_join_semantics(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.joins import interval_join

    left = _ds(
        [
            (1, 1, "2024-01-01T00:00:05"),  # before any interval -> -1
            (2, 1, "2024-01-01T00:00:10"),  # == start -> inside
            (3, 1, "2024-01-01T00:00:20"),  # == end -> inside
            (4, 1, "2024-01-01T00:00:25"),  # in the gap -> -1
            (5, 1, "2024-01-01T00:00:35"),  # second interval
            (6, 2, "2024-01-01T00:00:15"),  # other user, no intervals -> -1
        ]
    )
    iv = pa.table(
        {
            "user_id": pa.array([1, 1], type=pa.int64()),
            "interval_id": pa.array([100, 200], type=pa.int64()),
            "start_ts": pa.array(
                [np.datetime64("2024-01-01T00:00:10", "us"), np.datetime64("2024-01-01T00:00:30", "us")],
                type=pa.timestamp("us"),
            ),
            "end_ts": pa.array(
                [np.datetime64("2024-01-01T00:00:20", "us"), np.datetime64("2024-01-01T00:00:40", "us")],
                type=pa.timestamp("us"),
            ),
        }
    )
    out = (
        interval_join(left, rd.from_arrow(iv))
        .to_pandas()
        .sort_values("event_id")
        .reset_index(drop=True)
    )
    expect = pd.DataFrame(
        {"event_id": [1, 2, 3, 4, 5, 6], "interval_id": [-1, 100, 100, -1, 200, -1]}
    ).astype("int64")
    pd.testing.assert_frame_equal(out, expect)


def test_window_distinct_users_matches_pandas(ray_session):
    import ray.data as rd

    from indexer_ray.pipelines.events import window_distinct_users

    rng = np.random.default_rng(61)
    n = 5000
    ts = pd.to_datetime("2024-01-01") + pd.to_timedelta(
        rng.integers(0, 72 * 3600, size=n), unit="s"
    )
    df = pd.DataFrame(
        {
            "event_id": np.arange(n, dtype=np.int64),
            "ts": ts.astype("datetime64[us]"),
            "user_id": rng.integers(0, 50, size=n).astype(np.int64),
            "event_type": rng.choice(["a", "b"], size=n),
            "value": rng.random(n),
            "props": ["{}"] * n,
        }
    )
    got = (
        window_distinct_users(rd.from_pandas(df))
        .to_pandas()
        .sort_values("window_start")
        .reset_index(drop=True)
    )
    want = (
        df.assign(w=df["ts"].dt.floor("h"))
        .groupby("w")["user_id"]
        .nunique()
        .reset_index()
        .rename(columns={"w": "window_start", "user_id": "n_users"})
        .astype({"n_users": "int64"})
    )
    want["window_start"] = want["window_start"].astype("datetime64[us]")
    pd.testing.assert_frame_equal(got, want)
