"""Small operators: T3 adaptive cutoff, T5 seeded shuffle/split, D2 key
dedup, P7 schema mapper, A6 mean-over-namespaces.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data


def adaptive_cutoff_filter(ds: "ray.data.Dataset", score_col: str, threshold: float,
                           count: int) -> "ray.data.Dataset":
    """T3 — dygie_visualize_util.py:63-148 / predict.py:94-95 (TOPK_DECODE):
    among rows with score ≥ threshold, find the count-th highest score as the
    adaptive cutoff, then keep ALL rows with score ≥ cutoff (ties extend past
    `count`). Two passes: a small global top-(count) of candidate scores
    (block-local prune first), broadcast the cutoff, then a streaming filter.
    """
    def block_candidates(t: pa.Table) -> pa.Table:
        t = t.filter(pc.greater_equal(t[score_col], threshold))
        t = t.select([score_col])
        if t.num_rows > count:
            idx = pc.select_k_unstable(t, k=count, sort_keys=[(score_col, "descending")])
            t = t.take(idx)
        return t

    cand = ds.map_batches(block_candidates, batch_format="pyarrow")
    scores = sorted(cand.to_pandas()[score_col].tolist(), reverse=True)  # ≤ blocks×count rows
    if not scores:
        cutoff = threshold
    elif len(scores) < count:
        cutoff = scores[-1]
    else:
        cutoff = scores[count - 1]
    cutoff_ref = ray.put(float(cutoff))

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater_equal(t[score_col], ray.get(cutoff_ref)))

    return ds.map_batches(keep, batch_format="pyarrow")


def seeded_shuffle(ds: "ray.data.Dataset", seed: int = 100) -> "ray.data.Dataset":
    """T5 — preprocess.py:386-390 (seed 100 at preprocess.py:340)."""
    return ds.random_shuffle(seed=seed)


def seeded_split(ds: "ray.data.Dataset", fractions: list[float], seed: int = 100):
    """T5 — seeded train/dev/test split. Deterministic per-row assignment by
    hash of a stable key column would be resumable; here we follow the
    reference's shuffle-then-slice semantics via split_proportionately."""
    return ds.random_shuffle(seed=seed).split_proportionately(fractions[:-1])


def stratified_sample(ds: "ray.data.Dataset", key: str, id_col: str, n: int,
                      seed: int = 42) -> "ray.data.Dataset":
    """Deterministic per-stratum sample: for each `key` group keep the `n`
    rows with the smallest splitmix64(id ^ seed) — hash order instead of a
    shuffle, so the sample is stable across runs, block layouts and cluster
    sizes. Block-local per-key prune first (each block contributes ≤ n rows
    per key), then a tiny per-key final top-n — the same two-phase shape as
    `top_k`, so the shuffle sees blocks × strata × n rows, not the input."""
    import numpy as np

    from .dedup import _splitmix64

    seed64 = np.uint64(seed)

    def prune(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["_h"] = _splitmix64(
            df[id_col].to_numpy().astype(np.uint64) ^ seed64)
        df = df.sort_values([key, "_h", id_col])
        return df.groupby(key, as_index=False).head(n)

    pruned = ds.map_batches(prune, batch_format="pandas")

    def final(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["_h", id_col]).head(n)
        return g.drop(columns=["_h"])

    return pruned.groupby(key).map_groups(final, batch_format="pandas")


def dedup_doc_keys(batch: pa.Table, seen: set | None = None,
                   key_col: str = "doc_key") -> pa.Table:
    """D2 — preprocess.py:403-405: append '+' until the key is unique.
    Batch-local by default (pass a shared `seen` only in tests; cross-block
    uniqueness at scale comes from including the shard id in the key)."""
    seen = set() if seen is None else seen
    keys = batch.column(key_col).to_pylist()
    out = []
    for k in keys:
        while k in seen:
            k = k + "+"
        seen.add(k)
        out.append(k)
    i = batch.column_names.index(key_col)
    return batch.set_column(i, key_col, pa.array(out, pa.string()))


def map_schema_labels(label_map: dict[str, str], ner_to_entity: bool = True):
    """P7 — scripts/data/schema_mapper.py:22-50: NER labels → 'ENTITY',
    relation labels remapped via dict, unmapped relations DROPPED."""

    def fn(batch: pa.Table) -> pa.Table:
        ner_col = batch.column("ner").to_pylist()
        rel_col = batch.column("relations").to_pylist()
        new_ner, new_rel = [], []
        for doc_ner, doc_rel in zip(ner_col, rel_col):
            new_ner.append(
                [
                    [{**m, "label": "ENTITY"} if ner_to_entity else m for m in sent]
                    for sent in doc_ner
                ]
            )
            new_rel.append(
                [
                    [{**r, "label": label_map[r["label"]]} for r in sent
                     if r["label"] in label_map]
                    for sent in doc_rel
                ]
            )
        ner_i = batch.column_names.index("ner")
        rel_i = batch.column_names.index("relations")
        batch = batch.set_column(ner_i, "ner", pa.array(new_ner, batch.schema.field("ner").type))
        batch = batch.set_column(rel_i, "relations",
                                 pa.array(new_rel, batch.schema.field("relations").type))
        return batch

    return fn


def mean_over_namespaces(metrics: dict[str, dict[str, float]]) -> dict[str, float]:
    """A6 — ner.py:150-168: average precision/recall/f1 across
    `{dataset}__task` namespaces into MEAN__*."""
    if not metrics:
        return {}
    keys = sorted({k for m in metrics.values() for k in m})
    return {
        f"MEAN__{k}": sum(m.get(k, 0.0) for m in metrics.values()) / len(metrics)
        for k in keys
    }


def json_extract_int(ds: "ray.data.Dataset", col: str, field: str,
                     out_col: str) -> "ray.data.Dataset":
    """Extract an integer field from a flat-JSON string column.

    Vectorized regex fast path (`"field": <int>` — covers flat scalar
    payloads without a per-row parser); rows the regex misses (nested,
    string-quoted, absent) fall back to `json.loads` only for that subset,
    so the hot path stays C-speed. Output is nullable Int64 (absent field
    -> null)."""
    import re

    import pandas as pd

    pattern = re.compile(r'"%s"\s*:\s*(-?\d+)\s*[,}]' % re.escape(field))

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        vals = pd.to_numeric(df[col].str.extract(pattern, expand=False),
                             errors="coerce")
        # a nested container anywhere past the opening brace means the regex
        # could have matched a non-top-level key — route to the real parser
        nested = df[col].str.slice(1).str.contains(r"[{\[]", regex=True,
                                                   na=False)
        vals = vals.mask(nested)
        miss = vals.isna() & df[col].notna()
        if miss.any():
            import json as _json

            def slow(s):
                try:
                    v = _json.loads(s).get(field)
                except (ValueError, AttributeError):
                    return None
                return v if isinstance(v, int) else None

            vals = vals.astype("object")
            vals.loc[miss] = df.loc[miss, col].map(slow)
            vals = pd.to_numeric(vals, errors="coerce")
        df[out_col] = vals.astype("Int64") if vals.isna().any() \
            else vals.astype("int64")
        return df

    return ds.map_batches(fn, batch_format="pandas")


def profile_columns(ds, columns: list[str]) -> pd.DataFrame:
    """Data-quality profile of selected columns (reference data validators
    family, generalized — the Deequ-style stats collection every ingest at
    scale runs first): one row per column with n_rows, n_null, n_distinct,
    and VARCHAR-normalized min/max.

    Scale shape: ONE stats scan emits a single wide partial row per block
    (min/max computed in the column's NATIVE dtype so numeric ordering
    matches SQL's cast-after-aggregate, null/row counts as int64); the
    driver combines |blocks| rows. n_distinct streams separately as
    per-block-compacted (column, value-string) rows through distinct_first
    — the shuffle moves at most one row per distinct value per block, never
    the raw column. Supports int and string columns (floats/timestamps are
    excluded by contract: their VARCHAR forms are renderer-specific)."""
    import numpy as np

    from ..aggregates import distinct_first, grouped_count

    def block_stats(df: pd.DataFrame) -> pd.DataFrame:
        row = {"_n": [len(df)]}
        for c in columns:
            s = df[c]
            sv = s.dropna()
            row[f"{c}__null"] = [int(s.isna().sum())]
            row[f"{c}__min"] = [sv.min() if len(sv) else None]
            row[f"{c}__max"] = [sv.max() if len(sv) else None]
        return pd.DataFrame(row)

    st = ds.map_batches(block_stats, batch_format="pandas").to_pandas()

    def long_vals(df: pd.DataFrame) -> pd.DataFrame:
        parts = []
        for c in columns:
            sv = df[c].dropna().astype(str).drop_duplicates()
            parts.append(pd.DataFrame({
                "column_name": np.repeat(c, len(sv)),
                "val": sv.to_numpy(object)}))
        return pd.concat(parts, ignore_index=True)

    dn = grouped_count(
        distinct_first(ds.map_batches(long_vals, batch_format="pandas"),
                       ["column_name", "val"]).select_columns(["column_name"]),
        ["column_name"], out_name="n_distinct").to_pandas()
    n_distinct = dict(zip(dn["column_name"], dn["n_distinct"].astype(int)))

    n_rows = int(st["_n"].sum())
    out = []
    for c in columns:
        mn = st[f"{c}__min"].dropna()
        mx = st[f"{c}__max"].dropna()
        out.append({
            "column_name": c,
            "n_rows": n_rows,
            "n_null": int(st[f"{c}__null"].sum()),
            "n_distinct": int(n_distinct.get(c, 0)),
            "min_v": str(mn.min()) if len(mn) else None,
            "max_v": str(mx.max()) if len(mx) else None,
        })
    return pd.DataFrame(out)
