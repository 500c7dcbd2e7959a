"""Exact per-group discrete quantiles (PERCENTILE_DISC semantics)."""

import duckdb
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

from indexer_ray.pipelines.relational import group_quantiles


def _brute(df: pd.DataFrame, qs, value_col="v", group_col="g") -> pd.DataFrame:
    rows = []
    for g, sub in df.groupby(group_col):
        vals = np.sort(sub[value_col].to_numpy())
        n = len(vals)
        for q in sorted(qs):
            pos = min(int(np.ceil(q * n)), n) - 1
            rows.append((g, int(round(q * 100)), int(vals[pos])))
    return (
        pd.DataFrame(rows, columns=[group_col, "q_pct", "value"])
        .sort_values([group_col, "q_pct"])
        .reset_index(drop=True)
        .astype({"q_pct": "int64", "value": "int64"})
    )


def test_group_quantiles_matches_brute_and_duckdb(ray_session):
    rng = np.random.default_rng(31)
    n = 5000
    df = pd.DataFrame(
        {
            "g": rng.choice(["a", "b", "c"], size=n),
            # tie-heavy discrete values exercise the cumulative-count walk
            "v": rng.integers(0, 40, size=n).astype(np.int64),
        }
    )
    qs = [0.1, 0.5, 0.9, 0.99, 1.0]
    got = (
        group_quantiles(rd.from_pandas(df), qs, value_col="v", group_col="g")
        .to_pandas()
        .sort_values(["g", "q_pct"])
        .reset_index(drop=True)
        .astype({"q_pct": "int64", "value": "int64"})
    )
    pd.testing.assert_frame_equal(got, _brute(df, qs))
    # independent cross-check against DuckDB's quantile_disc
    con = duckdb.connect()
    con.register("t", df)
    for q in qs:
        d = con.execute(
            f"SELECT g, quantile_disc(v, {q}) AS value FROM t GROUP BY g ORDER BY g"
        ).fetchdf()
        mine = got[got["q_pct"] == int(round(q * 100))].reset_index(drop=True)
        assert mine["value"].tolist() == d["value"].tolist()


def test_group_quantiles_single_row_groups_and_validation(ray_session):
    df = pd.DataFrame({"g": ["x", "y"], "v": np.array([7, 3], dtype=np.int64)})
    got = (
        group_quantiles(rd.from_pandas(df), [0.5, 1.0], value_col="v", group_col="g")
        .to_pandas()
        .sort_values(["g", "q_pct"])
        .reset_index(drop=True)
    )
    assert got["value"].tolist() == [7, 7, 3, 3]
    with pytest.raises(ValueError):
        group_quantiles(rd.from_pandas(df), [], value_col="v")
    with pytest.raises(ValueError):
        group_quantiles(rd.from_pandas(df), [0.0], value_col="v")
    with pytest.raises(ValueError):
        group_quantiles(rd.from_pandas(df), [1.5], value_col="v")
