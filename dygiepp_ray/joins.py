"""Join operators (SURVEY.md §2.4).

- `broadcast_lookup` — small side `ray.put` once, dict-mapped per batch (J1
  when one side is a dimension table; no shuffle).
- `hash_join` — the portable big-big equi-join: stamp `_bucket = hash(key) %
  B` on both sides, union, `groupby(_bucket)`, join matching buckets pairwise
  inside `map_groups` with a pandas merge. ONE shuffle, B-way parallel merge,
  no driver materialization. Salt knob: raise B for hot keys; a single bucket
  only ever holds ~|A|/B + |B|/B rows.
- `zip_join_assert` — J2 shard-collect semantics: 1:1 key join with
  multiplicity asserts (03_collect_shards.py:36-46), bucketed so each group
  is a B-th of the keys (vectorized merge), not one tiny pandas frame per key.
"""

from __future__ import annotations

import hashlib
from typing import Literal

import numpy as np
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


def _bucket_array(key, n_buckets: int) -> pa.Array:
    """Deterministic per-row bucket ids for an int or string key column.

    Integer keys: masked modulo, fully vectorized. String keys:
    dictionary-encode first, blake2b ONLY the (small) per-chunk dictionary,
    then gather per-row buckets through the indices — no per-row Python in
    the hot path. Null keys land in bucket 0 (they never match in the merge)."""
    if isinstance(key, pa.ChunkedArray) and pa.types.is_integer(key.type):
        vals = pc.cast(key, pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        return pa.array((vals.astype(np.int64) & ((1 << 62) - 1)) % n_buckets, pa.int32())
    if not isinstance(key, pa.ChunkedArray):
        key = pa.chunked_array([key])
    if pa.types.is_integer(key.type):
        vals = pc.cast(key, pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        return pa.array((vals.astype(np.int64) & ((1 << 62) - 1)) % n_buckets, pa.int32())
    enc = pc.dictionary_encode(key)
    chunks = enc.chunks if isinstance(enc, pa.ChunkedArray) else [enc]
    out = []
    for chunk in chunks:
        d = chunk.dictionary.to_pylist()
        small = np.fromiter(
            (
                int.from_bytes(
                    hashlib.blake2b(str(v).encode(), digest_size=4).digest(), "big"
                ) % n_buckets
                for v in d
            ),
            dtype=np.int64, count=len(d),
        )
        idx = chunk.indices.fill_null(0).to_numpy(zero_copy_only=False)
        out.append(small[idx.astype(np.int64)])
    merged = np.concatenate(out) if out else np.zeros(0, dtype=np.int64)
    return pa.array(merged, pa.int32())


def _restore_int_dtypes(df: pd.DataFrame, cols: list[str], schema: dict) -> pd.DataFrame:
    """The union pads one-sided columns with typed nulls, so pandas inflates
    their int columns to float64 (NaN) — cast back once the side's own
    (null-free) rows are selected."""
    for c in cols:
        typ = schema.get(c)
        if typ is not None and pa.types.is_integer(typ) and df[c].dtype.kind == "f":
            df[c] = df[c].astype(typ.to_pandas_dtype())
    return df


def _arrow_types(ds: "ray.data.Dataset") -> dict:
    """{col: pyarrow.DataType} from a Dataset schema (numpy dtypes from
    pandas-backed blocks normalized to Arrow)."""
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


def _align_to(all_cols: list[str], keep: list[str], types: dict,
              extra: list[str]):
    """Arrow-side union aligner: project to `all_cols` padding the columns
    this side lacks with TYPED nulls (so the union schema is stable and
    ints survive), carrying `extra` stamp columns through."""

    def fn(t: pa.Table) -> pa.Table:
        arrays, names = [], []
        for c in all_cols:
            if c in keep:
                arrays.append(t.column(c))
            else:
                arrays.append(pa.nulls(t.num_rows, types.get(c, pa.string())))
            names.append(c)
        for c in extra:
            arrays.append(t.column(c))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    return fn


def hash_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              on: str, n_buckets: int = 32,
              how: Literal["inner", "left", "outer"] = "inner",
              left_cols: list[str] | None = None,
              right_cols: list[str] | None = None,
              left_types: dict | None = None,
              right_types: dict | None = None,
              bucket_post=None) -> "ray.data.Dataset":
    """Bucketed hash join of two large Datasets on an integer/string key.

    `left_types` / `right_types` ({col: pyarrow.DataType}) skip the
    `Dataset.schema()` probes — on a lazy non-read input, schema inference
    executes the whole upstream plan once just to learn the column types, so
    callers chaining joins off expensive pipelines should pass them.

    `how="outer"` is a FULL OUTER join: because both sides co-bucket on the
    key, every key's rows land in exactly one bucket, so the per-bucket
    pandas outer merge composes to the global full outer join with no
    cross-bucket bookkeeping.

    `bucket_post(df) -> df` is the aggregate-pushdown hook: it runs on each
    bucket's merged rows INSIDE the join task. A downstream reduction (e.g.
    a grouped count/sum whose result is tiny) passed here means the full
    joined rows never leave the task — only the per-bucket partials travel,
    turning join→aggregate into ONE shuffle plus a trivial final combine."""

    def stamp(side: str):
        def fn(t: pa.Table) -> pa.Table:
            from .aggregates import strip_schema_metadata

            t = strip_schema_metadata(t)
            t = t.append_column("_bucket", _bucket_array(t.column(on), n_buckets))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    lcols = sorted(set(left_cols or (left_types or left.schema().names)) | {on})
    rcols = sorted(set(right_cols or (right_types or right.schema().names)) | {on})
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        # a shared non-key column would come out _x/_y-suffixed from some
        # buckets and unsuffixed from empty ones — reject up front
        raise ValueError(
            f"hash_join: non-key columns {sorted(overlap)} exist on both sides; "
            "pass left_cols/right_cols (or rename) to disambiguate"
        )

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

    l_schema = left_types if left_types is not None else _types(left)
    r_schema = right_types if right_types is not None else _types(right)
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
        ldf = _restore_int_dtypes(df[df["_side"] == "l"][lcols].copy(), lcols, l_schema)
        rdf = _restore_int_dtypes(df[df["_side"] == "r"][rcols].copy(), rcols, r_schema)
        merged = ldf.merge(rdf, on=on, how=how)
        return bucket_post(merged) if bucket_post is not None else merged

    return l.union(r).groupby("_bucket").map_groups(join_bucket, batch_format="pandas")


def zip_join_assert(a: "ray.data.Dataset", b: "ray.data.Dataset", on: str,
                    b_cols: list[str], n_buckets: int = 64,
                    a_cols: list[str] | None = None) -> "ray.data.Dataset":
    """J2 — 1:1 join with uniqueness asserts (shard-collect semantics).

    Bucketed by hash(key) % B: each map_groups call merges a B-th of the key
    space with ONE vectorized pandas merge (per-side key uniqueness + key-set
    equality asserted per bucket), instead of building a one-row DataFrame
    per key — millions of tiny groups at scale. Pass `a_cols` to skip the
    schema probe (which executes a lazy upstream plan)."""
    a_cols = list(a_cols) if a_cols is not None else list(a.schema().names)

    def stamp(side: str):
        def fn(t: pa.Table) -> pa.Table:
            from .aggregates import strip_schema_metadata

            t = strip_schema_metadata(t)
            t = t.append_column("_bucket", _bucket_array(t.column(on), n_buckets))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    a2 = a.map_batches(stamp("a"), batch_format="pyarrow")
    b2 = b.select_columns([on, *b_cols]).map_batches(stamp("b"), batch_format="pyarrow")

    def zip_bucket(df: pd.DataFrame) -> pd.DataFrame:
        av = df[df["_side"] == "a"]
        bv = df[df["_side"] == "b"]
        assert av[on].is_unique and bv[on].is_unique, f"{on} not unique (1:1 zip join)"
        assert len(av) == len(bv) and set(av[on]) == set(bv[on]), (
            f"{on} key sets differ between zip-join sides"
        )
        merged = av[a_cols].merge(bv[[on, *b_cols]], on=on, how="inner")
        assert len(merged) == len(av)
        return merged

    return a2.union(b2).groupby("_bucket").map_groups(zip_bucket, batch_format="pandas")


def asof_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
              by: str, left_on: str, right_on: str,
              left_cols: list[str], right_cols: list[str],
              n_buckets: int = 32,
              direction: Literal["backward", "forward"] = "backward",
              left_types: dict | None = None,
              right_types: dict | None = None) -> "ray.data.Dataset":
    """As-of join: for each left row, the single right row with the same
    `by` key and the greatest `right_on` <= `left_on` (direction=backward;
    forward = smallest >=). Left-outer semantics (unmatched -> nulls).

    Ray Data has no native as-of join; this is the bucketed composition:
    stamp `_bucket = hash(by) % B` on BOTH sides (all history of a key is
    co-located with all its probes), union, groupby(_bucket), then one
    vectorized `pandas.merge_asof` per bucket over sorted frames. ONE
    shuffle; per-bucket cost ~(|L|+|R|)/B log. Partitioning assumption: a
    single `by` key's history fits in one task (band-partition `right_on`
    within the key for pathological single-key streams).

    Determinism: ties on (by, right_on) are broken by sorting the right
    side on (right_on, *right_cols) — the LAST row wins in merge_asof, so
    the max of `right_cols` under lexicographic order is the deterministic
    representative. Keep (by, right_on) unique on the right for SQL-ASOF
    parity (SQL leaves the tie representative unspecified).

    Pass `left_types` / `right_types` ({col: pa.DataType}) when a side is a
    lazy pipeline — the default `.schema()` probe executes the upstream
    plan once just to learn column types."""
    lcols = [by, left_on, *left_cols]
    rcols = [by, right_on, *right_cols]
    overlap = set(lcols) & set(rcols) - {by}
    if overlap:
        raise ValueError(f"asof_join: overlapping non-key columns {sorted(overlap)}")

    def stamp(side: str):
        def fn(t: pa.Table) -> pa.Table:
            from .aggregates import strip_schema_metadata

            t = strip_schema_metadata(t)
            t = t.append_column("_bucket", _bucket_array(t.column(by), n_buckets))
            return t.append_column("_side", pa.array([side] * t.num_rows, pa.string()))

        return fn

    # pad each side with TYPED null columns of the other so the union is
    # schema-stable (merge_asof runs on the split frames, not the union)
    all_cols = [*lcols, *[c for c in rcols if c != by]]
    l_schema = {c: t for c, t in
                (left_types or _arrow_types(left)).items() if c in lcols}
    r_schema = {c: t for c, t in
                (right_types or _arrow_types(right)).items() if c in rcols}
    types = {**r_schema, **l_schema}

    l = (left.select_columns(lcols)
         .map_batches(stamp("l"), batch_format="pyarrow")
         .map_batches(_align_to(all_cols, lcols, types, ["_bucket", "_side"]),
                      batch_format="pyarrow"))
    r = (right.select_columns(rcols)
         .map_batches(stamp("r"), batch_format="pyarrow")
         .map_batches(_align_to(all_cols, rcols, types, ["_bucket", "_side"]),
                      batch_format="pyarrow"))

    def asof_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ldf = _restore_int_dtypes(df[df["_side"] == "l"][lcols].copy(),
                                  lcols, l_schema)
        rdf = _restore_int_dtypes(df[df["_side"] == "r"][rcols].copy(),
                                  rcols, r_schema)
        if rdf.empty:
            for c in rcols:
                if c != by:
                    ldf[c] = None
            return ldf
        # datetime resolutions may diverge across the union ([s] vs [us]);
        # merge_asof requires identical on-key dtypes — upcast losslessly
        if (ldf[left_on].dtype.kind == "M" and
                rdf[right_on].dtype != ldf[left_on].dtype):
            rdf[right_on] = rdf[right_on].astype(ldf[left_on].dtype)
        rdf = rdf.sort_values([right_on, *right_cols], kind="mergesort")
        ldf = ldf.sort_values(left_on, kind="mergesort")
        out = pd.merge_asof(ldf, rdf, left_on=left_on, right_on=right_on,
                            by=by, direction=direction)
        return out

    return l.union(r).groupby("_bucket").map_groups(asof_bucket,
                                                    batch_format="pandas")


def interval_join(left: "ray.data.Dataset", right: "ray.data.Dataset",
                  on: str, left_ts: str, right_start: str, right_end: str,
                  left_cols: list[str], right_cols: list[str],
                  bucket_width: int, n_buckets: int = 32,
                  post_filter=None, left_types: dict | None = None,
                  right_types: dict | None = None) -> "ray.data.Dataset":
    """Range (interval) join: left row ⨝ right row when `on` keys are equal
    and right_start <= left_ts < right_end (half-open). All three time
    columns are int64 (e.g. epoch micros).

    Ray Data has no native range join; this is the banding composition:
    each left row is stamped with its single time band g = ts //
    bucket_width; each right row is REPLICATED to every band its interval
    overlaps (replication factor = interval_len / bucket_width + 1 — pick
    `bucket_width` near the typical interval length to bound it). Both
    sides then hash-bucket on (on, g) — ONE shuffle — and each bucket does
    a vectorized pandas equi-merge + exact range filter. A (left, right)
    pair meets in exactly one band (the left row's), so no dedup pass is
    needed. `post_filter(df) -> df` runs in-bucket (e.g. drop self-pairs)."""
    lcols = [on, left_ts, *left_cols]
    rcols = [on, right_start, right_end, *right_cols]
    overlap = set(lcols) & set(rcols) - {on}
    if overlap:
        raise ValueError(f"interval_join: overlapping columns {sorted(overlap)}")

    def stamp_left(t: pa.Table) -> pa.Table:
        from .aggregates import strip_schema_metadata

        t = strip_schema_metadata(t)
        g = pc.divide(pc.cast(t.column(left_ts), pa.int64()),
                      pa.scalar(bucket_width, pa.int64()))
        return t.append_column("_g", pc.cast(g, pa.int64()))

    def replicate_right(t: pa.Table) -> pa.Table:
        from .aggregates import strip_schema_metadata

        t = strip_schema_metadata(t)
        s = np.asarray(t.column(right_start).to_numpy(zero_copy_only=False),
                       dtype=np.int64) // bucket_width
        # end is exclusive: the band of (end - 1)
        e = (np.asarray(t.column(right_end).to_numpy(zero_copy_only=False),
                        dtype=np.int64) - 1) // bucket_width
        reps = np.maximum(e - s + 1, 0).astype(np.int64)
        idx = np.repeat(np.arange(t.num_rows), reps)
        # offsets 0..rep-1 per source row, fully vectorized (a python list
        # of per-row aranges is an O(rows) interpreter loop)
        ends = np.cumsum(reps)
        offs = (np.arange(int(ends[-1]) if len(ends) else 0, dtype=np.int64)
                - np.repeat(ends - reps, reps))
        out = t.take(pa.array(idx, pa.int64()))
        return out.append_column("_g", pa.array(np.repeat(s, reps) + offs,
                                                pa.int64()))

    def stamp_bucket(side: str):
        def fn(t: pa.Table) -> pa.Table:
            # COARSE bucket of (key, band): the Ray group count stays at
            # n_buckets and the per-bucket pandas merge on [on, _g] does the
            # fine matching vectorized. (The first version used key-bucket ×
            # band as the group key — one near-empty pandas group per
            # distinct band at scale, which dominated wall time.)
            kh = _bucket_array(t.column(on), 1 << 30).to_numpy(
                zero_copy_only=False).astype(np.uint64)
            g = t.column("_g").to_numpy(zero_copy_only=False).astype(np.uint64)
            mix = (kh * np.uint64(0x9E3779B97F4A7C15)) ^ g
            t = t.append_column(
                "_bucket", pa.array((mix % np.uint64(n_buckets)).astype(np.int64),
                                    pa.int64()))
            return t.append_column("_side", pa.array([side] * t.num_rows,
                                                     pa.string()))

        return fn

    all_cols = [*lcols, *[c for c in rcols if c != on]]
    l_schema = {c: t for c, t in
                (left_types or _arrow_types(left)).items() if c in lcols}
    r_schema = {c: t for c, t in
                (right_types or _arrow_types(right)).items() if c in rcols}
    types = {**r_schema, **l_schema}

    l = (left.select_columns(lcols)
         .map_batches(stamp_left, batch_format="pyarrow")
         .map_batches(stamp_bucket("l"), batch_format="pyarrow")
         .map_batches(_align_to(all_cols, lcols, types,
                                ["_g", "_bucket", "_side"]),
                      batch_format="pyarrow"))
    r = (right.select_columns(rcols)
         .map_batches(replicate_right, batch_format="pyarrow")
         .map_batches(stamp_bucket("r"), batch_format="pyarrow")
         .map_batches(_align_to(all_cols, rcols, types,
                                ["_g", "_bucket", "_side"]),
                      batch_format="pyarrow"))

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ldf = _restore_int_dtypes(df[df["_side"] == "l"][[*lcols, "_g"]].copy(),
                                  lcols, l_schema)
        rdf = _restore_int_dtypes(df[df["_side"] == "r"][[*rcols, "_g"]].copy(),
                                  rcols, r_schema)
        merged = ldf.merge(rdf, on=[on, "_g"], how="inner")
        ts = merged[left_ts].to_numpy(dtype=np.int64, na_value=0) \
            if len(merged) else np.zeros(0, dtype=np.int64)
        if len(merged):
            keep = ((merged[right_start].to_numpy(dtype=np.int64) <= ts)
                    & (ts < merged[right_end].to_numpy(dtype=np.int64)))
            merged = merged[keep]
        merged = merged.drop(columns=["_g"])
        if post_filter is not None:
            merged = post_filter(merged)
        return merged

    return l.union(r).groupby("_bucket").map_groups(join_bucket,
                                                    batch_format="pandas")


def skew_join(left: "ray.data.Dataset", right: "ray.data.Dataset", on: str,
              hot_threshold: int = 10_000, n_buckets: int = 32,
              left_types: dict | None = None,
              right_types: dict | None = None,
              hot_keys=None) -> "ray.data.Dataset":
    """Skew-aware inner join by SALT-AND-REPLICATE, in ONE stamped pass per
    side.

    A plain bucketed hash join sends every row of a hot key to ONE bucket
    task — at web scale a single 30%-of-the-corpus key serializes the whole
    join behind one straggler. Here hot LEFT rows are salted round-robin
    across all `n_buckets` buckets and hot RIGHT rows are REPLICATED into
    every bucket, so the hottest key's merge work spreads B ways while the
    join stays one union + one groupby shuffle. Unlike the earlier
    broadcast variant, neither side is ever `materialize()`d (at 100 TB a
    fact-side snapshot doubles storage traffic) and no row data crosses the
    driver — the only driver-side value is the hot-key list itself (keys
    with left count > `hot_threshold`, few by definition).

    The histogram pass streams over `left.select_columns([on])` — a
    key-column projection, not a full-row pass. Callers whose left side is
    an expensive lazy chain should pass `hot_keys` (any iterable of key
    values) to skip that pass entirely.

    Requires the right side to be small PER HOT KEY (the usual dim-table
    case): each hot right row is duplicated `n_buckets` ways. Results are
    identical to `hash_join(left, right, on)` — each (hot-left, hot-right)
    pair meets exactly once, in the left row's salted bucket — pinned by a
    pytest equivalence test."""
    from .aggregates import grouped_count, strip_schema_metadata

    lt = left_types or _arrow_types(left)
    rt = right_types or _arrow_types(right)

    if hot_keys is None:
        counts = grouped_count(left.select_columns([on]), [on], out_name="_n")
        hot_keys = sorted(
            r[on] for r in counts.map_batches(
                lambda t: t.filter(pc.greater(t["_n"],
                                              pa.scalar(hot_threshold))),
                batch_format="pyarrow").take_all()
        )
    hot = sorted(hot_keys)
    if not hot:
        return hash_join(left, right, on, n_buckets=n_buckets,
                         left_types=lt, right_types=rt)
    hot_arr = pa.array(hot)

    lcols = sorted(set(lt) | {on})
    rcols = sorted(set(rt) | {on})
    overlap = (set(lcols) & set(rcols)) - {on}
    if overlap:
        raise ValueError(
            f"skew_join: non-key columns {sorted(overlap)} exist on both "
            "sides; rename to disambiguate")
    all_cols = sorted(set(lcols) | set(rcols))

    def pad(t: pa.Table, keep: list[str], n_copies: int = 1) -> pa.Table:
        arrays, names = [], []
        for c in all_cols:
            if c in keep:
                col = t.column(c)
                arrays.append(pa.chunked_array([col] * n_copies)
                              if n_copies > 1 else col)
            else:
                arrays.append(pa.nulls(t.num_rows * n_copies,
                                       rt.get(c) or lt.get(c) or pa.string()))
            names.append(c)
        return pa.Table.from_arrays(arrays, names=names)

    def stamp_left(t: pa.Table) -> pa.Table:
        t = strip_schema_metadata(t)
        bucket = _bucket_array(t.column(on), n_buckets).to_numpy(
            zero_copy_only=False).copy()
        is_hot = pc.is_in(t.column(on), value_set=hot_arr).to_numpy(
            zero_copy_only=False)
        if is_hot.any():  # salt: spread hot rows round-robin over buckets
            bucket[is_hot] = np.arange(int(is_hot.sum())) % n_buckets
        out = pad(t, lcols)
        out = out.append_column("_bucket", pa.array(bucket, pa.int32()))
        return out.append_column(
            "_side", pa.array(["l"] * t.num_rows, pa.string()))

    def stamp_right(t: pa.Table) -> pa.Table:
        t = strip_schema_metadata(t)
        is_hot = pc.is_in(t.column(on), value_set=hot_arr)
        cold = t.filter(pc.invert(is_hot))
        cold_out = pad(cold, rcols).append_column(
            "_bucket", _bucket_array(cold.column(on), n_buckets))
        parts = [cold_out]
        hot_t = t.filter(is_hot)
        if hot_t.num_rows:  # replicate each hot right row into every bucket
            rep = pad(hot_t, rcols, n_copies=n_buckets)
            bkt = np.repeat(np.arange(n_buckets, dtype=np.int32),
                            hot_t.num_rows)
            parts.append(rep.append_column("_bucket", pa.array(bkt, pa.int32())))
        out = pa.concat_tables(parts)
        return out.append_column(
            "_side", pa.array(["r"] * out.num_rows, pa.string()))

    l = left.select_columns(lcols).map_batches(stamp_left,
                                               batch_format="pyarrow")
    r = right.select_columns(rcols).map_batches(stamp_right,
                                                batch_format="pyarrow")

    def join_bucket(df: pd.DataFrame) -> pd.DataFrame:
        ldf = _restore_int_dtypes(df[df["_side"] == "l"][lcols].copy(),
                                  lcols, lt)
        rdf = _restore_int_dtypes(df[df["_side"] == "r"][rcols].copy(),
                                  rcols, rt)
        return ldf.merge(rdf, on=on, how="inner")

    return l.union(r).groupby("_bucket").map_groups(join_bucket,
                                                    batch_format="pandas")


def _schema_fields(ds: "ray.data.Dataset"):
    s = ds.schema()
    return [pa.field(n, t) for n, t in zip(s.names, s.types)]
