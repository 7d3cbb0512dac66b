"""Shuffle-aware aggregation helpers (SURVEY.md §2.5 A1/A8, §7.3).

The KB span/pair counts (make_kb.py:198-220) are the engine's one mandatory
all-to-all shuffle, and the keys are Zipfian (popular entities). Strategy:

1. `partial_count` — combine INSIDE each `map_batches` block first (pyarrow
   `Table.group_by(...).aggregate([("", "count_all")])`), so at most one row
   per (key, block) enters the shuffle. This alone bounds any key's shuffle
   fan-in to the number of blocks, independent of its row popularity.
2. optional salting (`salt_buckets > 1`) — a deterministic salt column spreads
   a hot key across `salt_buckets` reducers for the first groupby, then a
   second (tiny) groupby folds the salt away. Use when the number of blocks
   itself is huge (100 TB → 10^5-10^6 blocks) and a single reducer per hot
   key would still be a straggler.

Both phases stream; nothing is materialized on the driver.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Sum


def strip_schema_metadata(t: pa.Table) -> pa.Table:
    """Drop schema metadata before a shuffle: the b'pandas' metadata dict
    that rides along from pandas-written parquet makes `pa.Schema`
    unhashable in Ray's shuffle schema-dedup (warning spam per block) and
    makes otherwise-identical block schemas compare unequal."""
    return t.replace_schema_metadata(None) if t.schema.metadata else t


def _block_partial_count(keys: list[str]):
    def fn(batch: pa.Table) -> pa.Table:
        batch = strip_schema_metadata(batch)
        g = batch.select(keys).group_by(keys).aggregate([([], "count_all")])
        # rename ONLY the count column by name — pyarrow's key/aggregate
        # column ordering has varied across versions, so a positional rename
        # could silently swap keys and counts
        return g.rename_columns(
            ["partial_count" if n == "count_all" else n for n in g.column_names]
        )

    return fn


def grouped_count(ds: "ray.data.Dataset", keys: list[str], out_name: str = "count",
                  salt_buckets: int = 1) -> "ray.data.Dataset":
    """Partial+final grouped count. `keys` are the groupby columns; result has
    columns keys + [out_name]."""
    partial = ds.map_batches(_block_partial_count(keys), batch_format="pyarrow")
    if salt_buckets > 1:
        import numpy as np

        def stamp_salt(batch: pa.Table) -> pa.Table:
            # Per-row salt (row position mod buckets): a hot key's partial
            # rows — one per upstream block — spread across salt_buckets
            # reducers. The salt is folded away by the second groupby, so its
            # exact assignment never affects the result.
            salts = pa.array(np.arange(batch.num_rows) % salt_buckets, pa.int32())
            return batch.append_column("_salt", salts)

        salted = partial.map_batches(stamp_salt, batch_format="pyarrow")
        first = salted.groupby(keys + ["_salt"]).aggregate(
            Sum("partial_count", alias_name="_salted_count")
        )
        final = first.groupby(keys).aggregate(Sum("_salted_count", alias_name=out_name))
        return final
    return partial.groupby(keys).aggregate(Sum("partial_count", alias_name=out_name))


def partial_final_agg(ds: "ray.data.Dataset", keys: list[str],
                      spec: list[tuple[str, str | None, str]]) -> "ray.data.Dataset":
    """Generic partial+final grouped aggregation.

    `spec` = [(out_name, col, op)] with op ∈ {sum, count, mean, min, max}
    (col=None for count). Phase 1 aggregates INSIDE each Arrow block with
    `pyarrow.Table.group_by`, so the shuffle moves ≤ one row per (key, block)
    instead of every input row; phase 2 is a small Ray groupby combining the
    partials (sum-of-sums, sum-of-counts, min-of-mins, …; mean = Σsum/Σcount).
    This is the A1/A2 pattern generalized — use it instead of
    `ds.groupby().aggregate()` whenever the per-block group count is much
    smaller than the block row count.
    """
    need_count = any(op in ("count", "mean") for _, _, op in spec)
    sum_cols = sorted({col for _, col, op in spec if op in ("sum", "mean")})
    min_cols = sorted({col for _, col, op in spec if op == "min"})
    max_cols = sorted({col for _, col, op in spec if op == "max"})

    def block_agg(t: pa.Table) -> pa.Table:
        t = strip_schema_metadata(t)
        aggs = [(c, "sum") for c in sum_cols]
        aggs += [(c, "min") for c in min_cols]
        aggs += [(c, "max") for c in max_cols]
        if need_count:
            aggs.append(([], "count_all"))
        # arrow names results "{col}_{fn}" / "count_all" and puts keys last
        return t.group_by(keys).aggregate(aggs)

    partial = ds.map_batches(block_agg, batch_format="pyarrow")
    final_aggs = [Sum(f"{c}_sum", alias_name=f"{c}_sum") for c in sum_cols]
    if need_count:
        final_aggs.append(Sum("count_all", alias_name="count_all"))
    from ray.data.aggregate import Max as _Max, Min as _Min

    final_aggs += [_Min(f"{c}_min", alias_name=f"{c}_min") for c in min_cols]
    final_aggs += [_Max(f"{c}_max", alias_name=f"{c}_max") for c in max_cols]
    combined = partial.groupby(keys).aggregate(*final_aggs)

    def project(t: pa.Table) -> pa.Table:
        cols = {k: t.column(k) for k in keys}
        for out_name, col, op in spec:
            if op == "sum":
                cols[out_name] = t.column(f"{col}_sum")
            elif op == "count":
                cols[out_name] = t.column("count_all")
            elif op == "mean":
                cols[out_name] = pc.divide(
                    pc.cast(t.column(f"{col}_sum"), pa.float64()),
                    pc.cast(t.column("count_all"), pa.float64()),
                )
            elif op == "min":
                cols[out_name] = t.column(f"{col}_min")
            elif op == "max":
                cols[out_name] = t.column(f"{col}_max")
        return pa.table(cols)

    return combined.map_batches(project, batch_format="pyarrow")


def distinct_first(ds: "ray.data.Dataset", keys: list[str]) -> "ray.data.Dataset":
    """A8/D3 exact dedup: keep the first row per key group, deterministically
    (rows sorted by all columns within the group before taking the head)."""
    import pandas as pd

    def first(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(list(g.columns)).head(1)

    return ds.groupby(keys).map_groups(first, batch_format="pandas")


def top_k(ds: "ray.data.Dataset", col: str, k: int, descending: bool = True) -> "ray.data.Dataset":
    """T2 global top-k: per-block prune to k candidates first so the global
    sort only sees num_blocks × k rows, then sort+limit."""
    def block_topk(batch: pa.Table) -> pa.Table:
        batch = strip_schema_metadata(batch)
        idx = pc.select_k_unstable(batch, k=min(k, batch.num_rows),
                                   sort_keys=[(col, "descending" if descending else "ascending")])
        return batch.take(idx)

    pruned = ds.map_batches(block_topk, batch_format="pyarrow")
    return pruned.sort(col, descending=descending).limit(k)
