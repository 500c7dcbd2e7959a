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
