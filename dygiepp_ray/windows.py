"""Window-function family over Ray Data (formalizes the groupby→map_groups
idiom used by top-N-per-key, sessionization, running aggregates).

Ray Data has no native OVER(PARTITION BY … ORDER BY …); the portable shape is
one hash shuffle on the partition key and a vectorized pandas kernel per
group. Partition-key cardinality must exceed the cluster's core count for
parallelism; a single giant partition is the caller's skew to solve (pre-salt
by a secondary key when order within the salt is still correct).
"""

from __future__ import annotations

from typing import Callable

import pandas as pd

import ray.data


def window(ds: "ray.data.Dataset", partition_by: str | list[str],
           order_by: str | list[str], fn: Callable[[pd.DataFrame], pd.DataFrame],
           ascending: bool | list[bool] = True) -> "ray.data.Dataset":
    """Sort each partition by `order_by`, then apply `fn` (frame in → frame
    out) — the generic OVER() kernel."""
    keys = [partition_by] if isinstance(partition_by, str) else list(partition_by)
    order = [order_by] if isinstance(order_by, str) else list(order_by)

    def per_group(g: pd.DataFrame) -> pd.DataFrame:
        return fn(g.sort_values(order, ascending=ascending))

    return ds.groupby(keys).map_groups(per_group, batch_format="pandas")


def row_number(ds, partition_by, order_by, ascending=True,
               out_col: str = "rn") -> "ray.data.Dataset":
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g[out_col] = range(1, len(g) + 1)
        return g

    return window(ds, partition_by, order_by, fn, ascending)


def top_n_per_key(ds, partition_by, order_by, n: int,
                  ascending=False) -> "ray.data.Dataset":
    return window(ds, partition_by, order_by, lambda g: g.head(n), ascending)


def lag_diff(ds, partition_by, order_by, value_col: str,
             out_col: str = "delta") -> "ray.data.Dataset":
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g[out_col] = g[value_col].diff()
        return g

    return window(ds, partition_by, order_by, fn)


def running_sum(ds, partition_by, order_by, value_col: str,
                out_col: str = "running") -> "ray.data.Dataset":
    def fn(g: pd.DataFrame) -> pd.DataFrame:
        g = g.copy()
        g[out_col] = g[value_col].cumsum()
        return g

    return window(ds, partition_by, order_by, fn)
