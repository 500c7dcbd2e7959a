"""Grouped-aggregate rollups over the TPC-H-ish fact tables.

The reference engine has no relational layer (SURVEY.md §2.7); these show
the same partial-aggregate-then-small-groupby shape the text rollups use
generalizes to fact tables.  Oracle-checked columns stay integer/exact
(count, min, max) — float sums are order-dependent and would hash-mismatch
against SQL.
"""

from __future__ import annotations


def pricing_counts(lineitem_ds):
    """Per (l_returnflag, l_linestatus): row count and exact quantity range."""
    from ray.data.aggregate import Count, Max, Min

    return lineitem_ds.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Count(alias_name="n_rows"),
        Min("l_quantity", alias_name="min_qty"),
        Max("l_quantity", alias_name="max_qty"),
    )


def orders_by_priority(orders_ds):
    """Order counts per priority per status — a two-key rollup."""
    from ray.data.aggregate import Count, Max

    return orders_ds.groupby(["o_orderpriority", "o_orderstatus"]).aggregate(
        Count(alias_name="n_orders"),
        Max("o_totalprice", alias_name="max_price"),
    )


def customers_by_region(customer_ds, nation_tbl, region_tbl):
    """Customer counts per (region, nation) via BROADCAST join: nation and
    region are dimension tables (25 / 5 rows at any TPC-H scale), so the
    custkey->name mapping is a ray.put dict read once per actor — the big
    side never shuffles for the join, only the tiny per-batch partial
    aggregate does (ray_guide: broadcast small sides).

    `nation_tbl` / `region_tbl` are pyarrow Tables (driver-small).
    Output: (r_name, n_name, n_customers, max_acctbal_cents)."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray
    from ray.data.aggregate import Max, Sum

    r_names = dict(
        zip(
            region_tbl.column("r_regionkey").to_pylist(),
            region_tbl.column("r_name").to_pylist(),
        )
    )
    lookup = {
        int(nk): (r_names[rk], nn)
        for nk, nn, rk in zip(
            nation_tbl.column("n_nationkey").to_pylist(),
            nation_tbl.column("n_name").to_pylist(),
            nation_tbl.column("n_regionkey").to_pylist(),
        )
    }
    lookup_ref = ray.put(lookup)

    class _Annotate:
        def __init__(self):
            self.lookup = ray.get(lookup_ref)  # once per actor

        def __call__(self, batch: pa.Table) -> pa.Table:
            nk = batch.column("c_nationkey").to_pylist()
            # acctbal in exact integer cents: float max is bit-stable, but
            # keep the oracle compare integer anyway
            bal = np.round(
                batch.column("c_acctbal").to_numpy(zero_copy_only=False) * 100
            ).astype("int64")
            pairs = [self.lookup[int(k)] for k in nk]
            df = pd.DataFrame(
                {
                    "r_name": [p[0] for p in pairs],
                    "n_name": [p[1] for p in pairs],
                    "bal_cents": bal,
                }
            )
            g = (
                df.groupby(["r_name", "n_name"], sort=False)
                .agg(n_customers=("bal_cents", "size"), max_bal=("bal_cents", "max"))
                .reset_index()
            )
            return pa.table(
                {
                    "r_name": pa.array(g["r_name"], type=pa.string()),
                    "n_name": pa.array(g["n_name"], type=pa.string()),
                    "n_customers": pa.array(g["n_customers"], type=pa.int64()),
                    "max_bal": pa.array(g["max_bal"], type=pa.int64()),
                }
            )

    return (
        customer_ds.select_columns(["c_nationkey", "c_acctbal"])
        .map_batches(
            _Annotate,
            batch_format="pyarrow",
            zero_copy_batch=True,
            batch_size=8192,
            concurrency=(1, 8),
        )
        .groupby(["r_name", "n_name"])
        .aggregate(
            Sum("n_customers", alias_name="n_customers"),
            Max("max_bal", alias_name="max_acctbal_cents"),
        )
    )


def group_quantiles(ds, qs: list[float], value_col: str, group_col: str = "source"):
    """EXACT discrete quantiles (PERCENTILE_DISC semantics: smallest value
    whose cumulative fraction >= q) of an integer-valued column per group
    — distribution reporting for corpus curation ("p50/p90/p99 doc length
    per domain") without an approximate sketch.

    Scale shape: the expensive reduction is a (group, value) COUNT rollup
    — each batch pre-reduces to its distinct (group, value) pairs, the
    distributed groupby sums those, and the per-group finisher walks a
    value-sorted cumulative count (group cardinality = |distinct values|,
    bounded for discrete columns like token counts — NOT n_rows).  Exact
    and order-independent, so SQL's quantile_disc is the oracle.

    Output: (group_col, q_pct int64 = round(q*100), value int64)."""
    import pandas as pd
    import pyarrow as pa
    from ray.data.aggregate import Sum

    if not qs or any(not (0.0 < q <= 1.0) for q in qs):
        raise ValueError(f"qs must be fractions in (0, 1], got {qs}")
    qarr = sorted(qs)

    def _partial(t: pa.Table) -> pa.Table:
        df = t.select([group_col, value_col]).to_pandas()
        g = (
            df.groupby([group_col, value_col], sort=False)
            .size()
            .reset_index(name="cnt")
        )
        return pa.table(
            {
                group_col: pa.array(g[group_col]),
                "value": pa.array(g[value_col].astype("int64")),
                "cnt": pa.array(g["cnt"].astype("int64")),
            }
        )

    counts = ds.map_batches(_partial, batch_format="pyarrow",
        zero_copy_batch=True, batch_size=8192)
    rolled = counts.groupby([group_col, "value"]).aggregate(
        Sum("cnt", alias_name="cnt")
    )

    import numpy as np

    def _finish(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("value", kind="mergesort")
        cum = g["cnt"].cumsum().to_numpy()
        total = cum[-1]
        vals = g["value"].to_numpy()
        # smallest value with cum/total >= q  <=>  first cum >= ceil(q*total)
        need = np.minimum(np.ceil(np.asarray(qarr) * total), total)
        idx = np.searchsorted(cum, need, side="left")
        return pd.DataFrame(
            {
                group_col: [g[group_col].iloc[0]] * len(qarr),
                "q_pct": np.round(np.asarray(qarr) * 100).astype(np.int64),
                "value": vals[idx].astype(np.int64),
            }
        )

    return rolled.groupby(group_col).map_groups(_finish, batch_format="pandas")
