"""Join operators (SURVEY.md §2.4).

- `broadcast_lookup` — small side `ray.put` once, dict-mapped per batch (J1
  when one side is a dimension table; no shuffle).
- `hash_join` — the portable big-big equi-join: stamp `_bucket = hash(key) %
  B` on both sides, union, `groupby(_bucket)`, join matching buckets pairwise
  inside `map_groups` with a pandas merge. ONE shuffle, B-way parallel merge,
  no driver materialization. Salt knob: raise B for hot keys; a single bucket
  only ever holds ~|A|/B + |B|/B rows.
- `zip_join_assert` — J2 shard-collect semantics: 1:1 key join with
  multiplicity asserts (03_collect_shards.py:36-46).
"""

from __future__ import annotations

from typing import Literal

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def broadcast_lookup(big: "ray.data.Dataset", small_df: pd.DataFrame, key: str,
                     value_cols: list[str]) -> "ray.data.Dataset":
    """Map value columns of a small table onto the big side by key."""
    maps = {c: dict(zip(small_df[key], small_df[c])) for c in value_cols}
    ref = ray.put(maps)

    def add(df: pd.DataFrame) -> pd.DataFrame:
        m = ray.get(ref)
        for c in value_cols:
            df[c] = df[key].map(m[c])
        return df

    return big.map_batches(add, batch_format="pandas")


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              on: str, n_buckets: int = 32,
              how: Literal["inner", "left"] = "inner",
              left_cols: list[str] | None = None,
              right_cols: list[str] | None = None) -> "ray.data.Dataset":
    """Bucketed hash join of two large Datasets on an integer/string key."""

    def stamp(side: str):
        def fn(t: pa.Table) -> pa.Table:
            key = t.column(on)
            if pa.types.is_integer(key.type):
                import numpy as np

                vals = pc.cast(key, pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
                buckets = pa.array((vals & ((1 << 62) - 1)) % n_buckets)
            else:
                # deterministic string bucket: length+first-byte mix is too
                # weak; use arrow's 64-bit hash via dictionary indices fallback
                import numpy as np

                vals = key.to_pylist()
                import hashlib

                buckets = pa.array(
                    np.fromiter(
                        (
                            int.from_bytes(
                                hashlib.blake2b(str(v).encode(), digest_size=4).digest(), "big"
                            )
                            % n_buckets
                            for v in vals
                        ),
                        dtype=np.int64,
                        count=len(vals),
                    )
                )
            t = t.append_column("_bucket", pc.cast(buckets, pa.int32()))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    lcols = sorted(set(left_cols or left.schema().names) | {on})
    rcols = sorted(set(right_cols or right.schema().names) | {on})
    def _types(ds) -> dict:
        # Dataset.schema() reports numpy dtypes for pandas-backed blocks —
        # normalize everything to Arrow DataTypes for the null padding
        sch = ds.schema()
        out = {}
        for name, typ in zip(sch.names, sch.types):
            if not isinstance(typ, pa.DataType):
                try:
                    typ = pa.from_numpy_dtype(typ)
                except (pa.ArrowNotImplementedError, TypeError):
                    typ = pa.string()
            out[name] = typ
        return out

    l_schema = _types(left)
    r_schema = _types(right)
    all_cols = sorted(set(lcols) | set(rcols))

    def align(keep: list[str], types: dict):
        def fn(t: pa.Table) -> pa.Table:
            # pad to the union schema with typed nulls so both sides union
            arrays, names = [], []
            for c in all_cols:
                if c in keep:
                    arrays.append(t.column(c))
                else:
                    other = r_schema.get(c) or l_schema.get(c) or pa.string()
                    arrays.append(pa.nulls(t.num_rows, other))
                names.append(c)
            arrays.append(t.column("_bucket"))
            names.append("_bucket")
            arrays.append(t.column("_side"))
            names.append("_side")
            return pa.Table.from_arrays(arrays, names=names)

        return fn

    l = left.select_columns(lcols).map_batches(stamp("l"), batch_format="pyarrow").map_batches(
        align(lcols, l_schema), batch_format="pyarrow"
    )
    r = right.select_columns(rcols).map_batches(stamp("r"), batch_format="pyarrow").map_batches(
        align(rcols, r_schema), batch_format="pyarrow"
    )

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ldf = df[df["_side"] == "l"][lcols]
        rdf = df[df["_side"] == "r"][rcols]
        return ldf.merge(rdf, on=on, how=how)

    return l.union(r).groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def zip_join_assert(a: "ray.data.Dataset", b: "ray.data.Dataset", on: str,
                    b_cols: list[str]) -> "ray.data.Dataset":
    """J2 — 1:1 join with uniqueness asserts (shard-collect semantics)."""

    def stamp(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    a2 = a.map_batches(stamp("a"), batch_format="pyarrow")
    b2 = b.select_columns([on, *b_cols]).map_batches(stamp("b"), batch_format="pyarrow")

    def zip_group(df: pd.DataFrame) -> pd.DataFrame:
        av = df[df["_side"] == "a"]
        bv = df[df["_side"] == "b"]
        assert len(av) == 1 and len(bv) == 1, f"{on}={df[on].iloc[0]!r} not unique 1:1"
        row = av.drop(columns=["_side"]).iloc[0].to_dict()
        for c in b_cols:
            row[c] = bv.iloc[0][c]
        return pd.DataFrame([row])

    return a2.union(b2).groupby(on).map_groups(zip_group, batch_format="pandas")
