"""Shard-collect pipeline (SURVEY.md §3.3; dw-experiments/2020-09-03).

Two models' prediction runs over the same corpus → one merged set:
1. drop `_failed_prediction` marker rows from BOTH sides (the reference skips
   docs marked by upstream failures — 03_collect_shards.py:23, 44-50);
2. zip-join on doc_key with 1:1 asserts (03_collect_shards.py:36-46);
3. merge the two models' coref clusters with the D1 worklist algorithm
   (merge.py:51-100).

Returns documents with model A's predictions plus `merged_clusters`.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data

from ..stages.coref import merge_clusters


def _drop_failed(ds: "ray.data.Dataset") -> "ray.data.Dataset":
    if "_failed_prediction" not in ds.schema().names:
        return ds

    def keep_ok(t: pa.Table) -> pa.Table:
        return t.filter(pc.invert(pc.fill_null(t["_failed_prediction"], False)))

    return ds.map_batches(keep_ok, batch_format="pyarrow")


def collect_model_runs(run_a: "ray.data.Dataset", run_b: "ray.data.Dataset",
                       carry_cols: list[str] | None = None) -> "ray.data.Dataset":
    """J2 + D1: failed-row skip, 1:1 zip-join on doc_key, cluster merge.
    `carry_cols`: model-A columns to keep alongside doc_key (default: the
    prediction columns present)."""
    a = _drop_failed(run_a)
    b = _drop_failed(run_b)
    default_carry = [c for c in ("sentences", "predicted_ner", "predicted_relations",
                                 "predicted_events", "predicted_clusters")
                     if c in run_a.schema().names]
    carry = carry_cols or default_carry

    def stamp(side: str):
        def fn(t: pa.Table) -> pa.Table:
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    a2 = a.select_columns(["doc_key", *carry]).map_batches(stamp("a"), batch_format="pyarrow")
    b2 = b.select_columns(["doc_key", "predicted_clusters"]).map_batches(
        stamp("b"), batch_format="pyarrow"
    )

    def zip_merge(df: pd.DataFrame) -> pd.DataFrame:
        av = df[df["_side"] == "a"]
        bv = df[df["_side"] == "b"]
        key = df["doc_key"].iloc[0]
        if len(av) == 0 or len(bv) == 0:
            # one model failed this doc → reference drops it from the merge
            return pd.DataFrame(columns=["doc_key", *carry, "merged_clusters"])
        assert len(av) == 1 and len(bv) == 1, f"doc_key {key!r} not unique"

        def to_lists(clusters):
            if clusters is None:
                return []
            return [[(m["start"], m["end"]) for m in c] for c in list(clusters)]

        merged = merge_clusters(
            to_lists(av["predicted_clusters"].iloc[0]) if "predicted_clusters" in av else [],
            to_lists(bv["predicted_clusters"].iloc[0]),
        )
        row = {c: av.iloc[0][c] for c in ("doc_key", *carry)}
        row["merged_clusters"] = [
            [{"start": s, "end": e} for (s, e) in c] for c in merged
        ]
        return pd.DataFrame([row])

    return a2.union(b2).groupby("doc_key").map_groups(zip_merge, batch_format="pandas")
