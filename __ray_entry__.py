"""Driver contract for the graft builder (Ray Data target).

`entry()` — flagship KG pipeline over /root/testdata/sf0.001.
`queries()` — one entry per implemented operator/pipeline (SURVEY.md §2 and
the training-data ops); each callable takes sf_dir and returns a Dataset /
DataFrame / pyarrow Table.
`oracle_sql()` — DuckDB-equivalent SQL for every SQL-expressible query (same
column names; floats rounded identically on both sides so value-hashes agree).

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ray.init()/ray.shutdown().
"""

from __future__ import annotations

import hashlib
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Max, Sum

from dygiepp_ray.aggregates import distinct_first, grouped_count, top_k
from dygiepp_ray.corpus import ENTITY_LEXICON, EVENT_TRIGGERS, RELATION_PATTERNS, write_corpus
from dygiepp_ray.functions.strings import STOPWORDS
from dygiepp_ray.pipelines import kg as kgp
from dygiepp_ray.pipelines.docs_adapter import DOC_LEXICON, DOC_TRIGGERS, documents_as_corpus
from dygiepp_ray.pipelines.evaluate import transitive_closure
from dygiepp_ray.stages.dedup import (
    exact_duplicates,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_near_dups,
)
from dygiepp_ray.stages.linking import EntityLinker, build_alias_table
from dygiepp_ray.stages.multimodal import ImageDecoder, synth_media_table
from dygiepp_ray.stages.similarity import embedding_near_dups, knn_brute_force, knn_lsh
from dygiepp_ray.stages.text import LangId, fingerprint, normalize_text, quality_score, token_stats
from dygiepp_ray.stages.triples import flatten_ner_mentions

# ---------------------------------------------------------------- helpers


def _kernel_conc() -> tuple[int, int]:
    """Kernel actor-pool size tracks the Ray session's CPU count (leave two
    CPUs for the read/flatten stages so the pipeline doesn't serialize)."""
    try:
        cpus = int(ray.cluster_resources().get("CPU", 4))
    except Exception:  # noqa: BLE001 — not initialised yet
        cpus = 4
    return (1, max(2, cpus - 2))


_SCHEMA_CACHE: dict = {}


def _clean_schema(path: str, columns: list[str] | None) -> "pa.Schema":
    """Projected, metadata-free read schema: the b'pandas' metadata written
    into the testdata parquet makes block schemas unhashable/unequal in
    Ray's shuffle schema-dedup (per-block warning spam)."""
    key = (path, tuple(columns) if columns else None)
    if key not in _SCHEMA_CACHE:
        import pyarrow.parquet as pq

        full = pq.read_schema(path)
        names = columns if columns else full.names
        _SCHEMA_CACHE[key] = pa.schema(
            [full.field(c).remove_metadata() for c in names])
    return _SCHEMA_CACHE[key]


def _read(sf_dir: str, table: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    path = os.path.join(sf_dir, f"{table}.parquet")
    return ray.data.read_parquet(path, columns=columns,
                                 schema=_clean_schema(path, columns))


def _sf_tag(sf_dir: str) -> str:
    return os.path.basename(os.path.normpath(sf_dir)) or "sf"


_CODE_SALT_CACHE: list = []


def _code_salt() -> str:
    """Hash of the engine-module sources that produce the persisted /tmp
    stores — folded into every store fingerprint so CODE changes (not just
    corpus regeneration) invalidate cached stores (ADVICE r3: a stale store
    built by an older kernel would be compared against a fresh oracle)."""
    if not _CODE_SALT_CACHE:
        import hashlib

        import dygiepp_ray.corpus
        import dygiepp_ray.pipelines.kg
        import dygiepp_ray.stages.dedup
        import dygiepp_ray.stages.invindex
        import dygiepp_ray.stages.kernel
        import dygiepp_ray.stages.similarity

        h = hashlib.blake2b(digest_size=6)
        for mod in (dygiepp_ray.stages.kernel, dygiepp_ray.pipelines.kg,
                    dygiepp_ray.stages.dedup, dygiepp_ray.stages.similarity,
                    dygiepp_ray.stages.invindex, dygiepp_ray.corpus):
            with open(mod.__file__, "rb") as fh:
                h.update(fh.read())
        _CODE_SALT_CACHE.append(h.hexdigest())
    return _CODE_SALT_CACHE[0]


def _learned_weights_path() -> str:
    """Train-once cache of the learned v2 scorer artifact (deterministic:
    fixed-seed corpus + full-batch GD), keyed on the code salt so scorer /
    trainer changes retrain; built to a temp file renamed into place."""
    import dygiepp_ray.stages.learned as _learned_mod

    salt_mods = hashlib.blake2b(digest_size=6)
    with open(_learned_mod.__file__, "rb") as fh:
        salt_mods.update(fh.read())
    path = (f"/tmp/dygiepp_ray_scorer/v2-{_code_salt()}-"
            f"{salt_mods.hexdigest()}.npz")
    if not os.path.exists(path):
        os.makedirs(os.path.dirname(path), exist_ok=True)
        from dygiepp_ray.corpus import write_corpus
        from dygiepp_ray.stages.learned import (
            collect_coref_pairs,
            corpus_sentences,
            fit_coref_weights,
            save_learned_weights,
            train_scorer,
        )

        train_dir = "/tmp/dygiepp_ray_train_corpus/entry_seed42_n80"
        marker = os.path.join(train_dir, "_done")
        if not os.path.exists(marker):
            write_corpus(train_dir, n_files=80, seed=42, n_shards=4)
            with open(marker, "w") as fh:
                fh.write("ok")
        sents = corpus_sentences(train_dir)
        weights = train_scorer(sents, ENTITY_LEXICON, RELATION_PATTERNS,
                               EVENT_TRIGGERS)
        coref_w = fit_coref_weights(collect_coref_pairs(sents, ENTITY_LEXICON))
        # keep the .npz suffix on the temp name — np.savez appends one
        tmp = path.replace(".npz", f".build-{os.getpid()}.npz")
        save_learned_weights(tmp, weights, coref_w)
        try:
            os.rename(tmp, path)
        except OSError:
            os.unlink(tmp)
    return path


def _store_tag(sf_dir: str, table: str) -> str:
    """sf tag + a fingerprint (mtime+size) of the source table + a code
    salt, so persisted /tmp stores (dedup store, inverted index, LSH index)
    rebuild when the test corpus is regenerated OR the engine code changes,
    instead of silently serving stale content (ADVICE r2/r3)."""
    p = os.path.join(sf_dir, f"{table}.parquet")
    try:
        if os.path.isdir(p):
            sts = [os.stat(os.path.join(p, f)) for f in sorted(os.listdir(p))]
            fp = f"{sum(s.st_mtime_ns for s in sts):x}-{sum(s.st_size for s in sts):x}"
        else:
            st = os.stat(p)
            fp = f"{st.st_mtime_ns:x}-{st.st_size:x}"
    except OSError:
        fp = "nosrc"
    return f"{_sf_tag(sf_dir)}-{fp}-{_code_salt()}"


_SYNTH_N_FILES = {"sf0.001": 100, "sf0.01": 400, "sf0.1": 2000}


def _synth_n_files(sf_dir: str) -> int:
    return _SYNTH_N_FILES.get(_sf_tag(sf_dir), 100)


def _synth_lexicon(sf_dir: str) -> dict:
    """Entity lexicon matching the sf level's corpus vocabulary (Heaps-law
    scale grading, corpus.scaled_entity_lexicon — VERDICT r4 #6). At
    sf0.001 this IS the base lexicon; larger tiers add entities so degree
    distributions stay non-degenerate for the capped graph/rule operators.
    Every consumer pairs this with an oracle re-walk using the SAME
    lexicon, so engine and oracle stay in lockstep at every tier."""
    from dygiepp_ray.corpus import scaled_entity_lexicon

    return scaled_entity_lexicon(_synth_n_files(sf_dir))


def _synth_corpus_dir(sf_dir: str) -> str:
    """Deterministic synthetic north-rule corpus sized to the sf level,
    cached under /tmp (same seed → byte-identical). The `_sv` suffix
    versions the cache: these corpora carry the scale-graded vocabulary,
    so pre-round-5 caches must not be reused."""
    tag = _sf_tag(sf_dir)
    n_files = _synth_n_files(sf_dir)
    path = f"/tmp/dygiepp_ray_corpus/{tag}_sv"
    marker = os.path.join(path, "_done")
    if not os.path.exists(marker):
        write_corpus(path, n_files=n_files, seed=42, n_shards=8,
                     vocab_n=n_files)
        with open(marker, "w") as fh:
            fh.write("ok")
    return path


def _synth_triples(sf_dir: str) -> "ray.data.Dataset":
    return kgp.kg_triples(_synth_corpus_dir(sf_dir), concurrency=_kernel_conc(),
                          entity_lexicon=_synth_lexicon(sf_dir))


# ---------------------------------------------------------- oracle plumbing
#
# Independent pure-python recomputations (dygiepp_ray/oracle.py) written as
# parquet under /tmp so oracle_sql() can `read_parquet` them — this gives the
# non-relational queries (the kg_* flagship family, dedup, standoff, ...)
# full value-hash driver checks instead of rows-only. Only generated at the
# correctness scales (sf0.001 / sf0.01); bench runs at sf0.1 skip it.

_ORACLE_CACHE: dict = {}


def _oracle_enabled(sf_dir: str) -> bool:
    return _sf_tag(sf_dir) in ("sf0.001", "sf0.01")


def _reduced_entity_lexicon() -> dict:
    return {k: v for i, (k, v) in enumerate(sorted(ENTITY_LEXICON.items()))
            if i % 4 != 0}


def _oracle_triples_table(sf_dir: str, reduced: bool = False):
    from dygiepp_ray import oracle as _o

    key = (_sf_tag(sf_dir), "tri_reduced" if reduced else "tri")
    if key not in _ORACLE_CACHE:
        lex = (_reduced_entity_lexicon() if reduced
               else _synth_lexicon(sf_dir))
        _ORACLE_CACHE[key] = _o.expected_triples(_synth_corpus_dir(sf_dir),
                                                 entity_lexicon=lex)
    return _ORACLE_CACHE[key]


def _oracle_docs_table(sf_dir: str, max_doc_id: int | None = None):
    from dygiepp_ray import oracle as _o

    key = (_sf_tag(sf_dir), "docs", max_doc_id)
    if key not in _ORACLE_CACHE:
        _ORACLE_CACHE[key] = _o.prep_documents_from_docs_table(sf_dir, max_doc_id)
    return _ORACLE_CACHE[key]


def _oracle_corpus_docs(sf_dir: str):
    from dygiepp_ray import oracle as _o

    key = (_sf_tag(sf_dir), "corpus_docs")
    if key not in _ORACLE_CACHE:
        _ORACLE_CACHE[key] = _o.prep_documents(_synth_corpus_dir(sf_dir))
    return _ORACLE_CACHE[key]


def _write_oracle(sf_dir: str, name: str, build) -> None:
    """Write `<name>.parquet` to the oracle dir (once per sf per process);
    `build` is a zero-arg callable returning a pyarrow Table."""
    if not _oracle_enabled(sf_dir):
        return
    key = (_sf_tag(sf_dir), "file", name)
    if key in _ORACLE_CACHE:
        return
    from dygiepp_ray import oracle as _o

    _o.write_oracle(name, build())
    _ORACLE_CACHE[key] = True


def _ensure_triples_oracle(sf_dir: str) -> None:
    _write_oracle(sf_dir, "kg_triples", lambda: _oracle_triples_table(sf_dir))


def _docs_predicted(sf_dir: str) -> "ray.data.Dataset":
    """documents table → corpus shape → prep → extraction kernel (DOC lexicon)."""
    corpus = documents_as_corpus(sf_dir)
    docs = kgp.documents_dataset(corpus)
    lex = {**ENTITY_LEXICON, **DOC_LEXICON}
    trig = {**EVENT_TRIGGERS, **DOC_TRIGGERS}
    return kgp.extract(docs, concurrency=_kernel_conc(),
                       entity_lexicon=lex, relation_patterns=RELATION_PATTERNS,
                       event_triggers=trig)


_STOP_SQL = ",".join(f"'{w}'" for w in STOPWORDS)


def _round_cols(ds: "ray.data.Dataset", spec: dict[str, int]) -> "ray.data.Dataset":
    from dygiepp_ray.functions.strings import round_half_up

    def fn(df: pd.DataFrame) -> pd.DataFrame:
        for col, nd in spec.items():
            df[col] = round_half_up(df[col].astype("float64"), nd)
        return df

    return ds.map_batches(fn, batch_format="pandas")


# ------------------------------------------------------------------ entry


def entry() -> Any:
    """Flagship: sf0.001 documents + synthetic north-rule corpus → prep →
    extraction kernel → canonicalized triples (streaming end to end)."""
    sf_dir = "/root/testdata/sf0.001"
    corpus = documents_as_corpus(sf_dir).union(
        ray.data.read_parquet(_synth_corpus_dir(sf_dir))
    )
    docs = kgp.documents_dataset(corpus)
    lex = {**ENTITY_LEXICON, **DOC_LEXICON}
    trig = {**EVENT_TRIGGERS, **DOC_TRIGGERS}
    predicted = kgp.extract(docs, concurrency=_kernel_conc(), entity_lexicon=lex,
                            relation_patterns=RELATION_PATTERNS, event_triggers=trig)
    return kgp.triples_dataset(predicted)


# ---------------------------------------------------------------- queries


def queries() -> dict[str, Callable[[str], Any]]:
    q: dict[str, Callable[[str], Any]] = {}

    # ---- relational core (engine primitives over the TPC-H-ish tables)

    def tpch_q1_agg(sf_dir: str):
        ds = _read(sf_dir, "lineitem",
                   ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice",
                    "l_discount", "l_shipdate"])

        def prep(t: pa.Table) -> pa.Table:
            t = t.filter(pc.less_equal(t["l_shipdate"], pa.scalar(pd.Timestamp("1998-09-01"))))
            disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
            return t.append_column("disc_price", disc)

        from dygiepp_ray.aggregates import partial_final_agg

        agg = partial_final_agg(
            ds.map_batches(prep, batch_format="pyarrow"),
            ["l_returnflag", "l_linestatus"],
            [
                ("sum_qty", "l_quantity", "sum"),
                ("sum_base_price", "l_extendedprice", "sum"),
                ("sum_disc_price", "disc_price", "sum"),
                ("avg_qty", "l_quantity", "mean"),
                ("n", None, "count"),
            ],
        )
        return _round_cols(agg, {"sum_qty": 2, "sum_base_price": 2,
                                 "sum_disc_price": 2, "avg_qty": 6})

    q["tpch_q1_agg"] = tpch_q1_agg

    def filter_project_revenue(sf_dir: str):
        ds = _read(sf_dir, "lineitem", ["l_extendedprice", "l_discount", "l_quantity"])

        def prep(t: pa.Table) -> pa.Table:
            m = pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], pa.scalar(0.05)),
                        pc.less_equal(t["l_discount"], pa.scalar(0.07))),
                pc.less(t["l_quantity"], pa.scalar(24.0)),
            )
            t = t.filter(m)
            return t.append_column("rev", pc.multiply(t["l_extendedprice"], t["l_discount"]))

        total = ds.map_batches(prep, batch_format="pyarrow").aggregate(Sum("rev", alias_name="revenue"))
        from dygiepp_ray.functions.strings import round_half_up

        return pd.DataFrame({"revenue": [float(round_half_up(total["revenue"] or 0.0, 2))]})

    q["filter_project_revenue"] = filter_project_revenue

    def broadcast_join_orders(sf_dir: str):
        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]).to_pandas()
        seg_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_mktsegment"])))

        def add_segment(df: pd.DataFrame) -> pd.DataFrame:
            # broadcast small side: ray.get hits the local object store (J4)
            df["c_mktsegment"] = df["o_custkey"].map(ray.get(seg_ref))
            return df

        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
            add_segment, batch_format="pandas"
        )
        agg = partial_final_agg(ds, ["c_mktsegment"],
                                [("n_orders", None, "count"),
                                 ("sum_total", "o_totalprice", "sum")])
        return _round_cols(agg, {"sum_total": 2})

    q["broadcast_join_orders"] = broadcast_join_orders

    def anti_join_orders(sf_dir: str):
        # orders with no lineitem rows (broadcast key-set anti-join, J5).
        # The key set is broadcast ONCE as a ready-made Arrow array — not
        # rebuilt from a Python list in every batch.
        lkeys = _read(sf_dir, "lineitem", ["l_orderkey"]).unique("l_orderkey")
        lkeys_ref = ray.put(pa.array(sorted(lkeys)))

        def drop_with_items(t: pa.Table) -> pa.Table:
            mask = pc.invert(pc.is_in(t["o_orderkey"], value_set=ray.get(lkeys_ref)))
            return t.filter(mask)

        return _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
            drop_with_items, batch_format="pyarrow"
        )

    q["anti_join_orders"] = anti_join_orders

    def topk_orders(sf_dir: str):
        ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        return top_k(ds, "o_totalprice", 100)

    q["topk_orders"] = topk_orders

    def distinct_status_priority(sf_dir: str):
        ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        return distinct_first(ds, ["o_orderstatus", "o_orderpriority"])

    q["distinct_status_priority"] = distinct_status_priority

    def events_count_salted(sf_dir: str):
        ds = _read(sf_dir, "events", ["event_type"])
        return grouped_count(ds, ["event_type"], out_name="n", salt_buckets=8)

    q["events_count_salted"] = events_count_salted

    def events_user_daily(sf_dir: str):
        ds = _read(sf_dir, "events", ["user_id", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            df["day"] = df["ts"].dt.strftime("%Y-%m-%d")
            return df[["user_id", "day", "value"]]

        from dygiepp_ray.aggregates import partial_final_agg

        agg = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"),
            ["user_id", "day"],
            [("n_events", None, "count"), ("sum_value", "value", "sum")],
        )
        return _round_cols(agg, {"sum_value": 2})

    q["events_user_daily"] = events_user_daily

    def events_retention(sf_dir: str):
        # day-over-day cohort retention: users active on day d AND d+1.
        # Distinct (user, day) first — the only corpus-width shuffle, ≤ one
        # row per (user, day, block) — then a bucketed self-join on user_id
        # whose bucket_post filters day adjacency and emits per-day PARTIAL
        # counts, so the per-user day cross product never leaves the join
        # task (per-user distinct days are bounded by the calendar, so no
        # skew salt is needed).
        from dygiepp_ray.aggregates import (grouped_count, partial_final_agg,
                                            strip_schema_metadata)
        from dygiepp_ray.joins import hash_join

        ds = _read(sf_dir, "events", ["user_id", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            # timedelta .dt.days is unit-agnostic (the parquet ts is us, not
            # ns — an int64 divide by ns-per-day would be off by 1000)
            epoch_day = (df["ts"].dt.normalize()
                         - pd.Timestamp("1970-01-01")).dt.days
            return pd.DataFrame({"user_id": df["user_id"].astype("int64"),
                                 "ym": epoch_day.astype("int64")})

        um = grouped_count(
            ds.map_batches(prep, batch_format="pandas"),
            ["user_id", "ym"], out_name="_c", salt_buckets=4,
        ).select_columns(["user_id", "ym"]).materialize()
        nxt = um.map_batches(
            lambda t: strip_schema_metadata(t).rename_columns(
                ["user_id", "ym_next"]),
            batch_format="pyarrow")

        def adj_counts(m: pd.DataFrame) -> pd.DataFrame:
            hit = m[m["ym_next"] == m["ym"] + 1]
            vc = hit["ym"].value_counts()
            return pd.DataFrame({
                "ym": vc.index.to_numpy(dtype="int64"),
                "retained": vc.to_numpy(dtype="int64")})

        pairs = hash_join(
            um, nxt, on="user_id", n_buckets=32,
            left_types={"user_id": pa.int64(), "ym": pa.int64()},
            right_types={"user_id": pa.int64(), "ym_next": pa.int64()},
            bucket_post=adj_counts)
        agg = partial_final_agg(pairs, ["ym"],
                                [("retained", "retained", "sum")])

        def fmt(df: pd.DataFrame) -> pd.DataFrame:
            day = pd.to_datetime(df["ym"], unit="D").dt.strftime("%Y-%m-%d")
            return pd.DataFrame({
                "day": day,
                "retained": df["retained"].astype("int64")})

        return agg.map_batches(fmt, batch_format="pandas")

    q["events_retention"] = events_retention

    def region_nation_join(sf_dir: str):
        region = _read(sf_dir, "region").to_pandas()
        r_ref = ray.put(dict(zip(region["r_regionkey"], region["r_name"])))

        def add_region(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {"n_name": df["n_name"], "r_name": df["n_regionkey"].map(ray.get(r_ref))}
            )

        return _read(sf_dir, "nation", ["n_name", "n_regionkey"]).map_batches(
            add_region, batch_format="pandas"
        )

    q["region_nation_join"] = region_nation_join

    def lineitem_orders_join(sf_dir: str):
        # big-big bucketed hash join (joins.py): lineitem ⋈ orders on orderkey
        from dygiepp_ray.joins import hash_join

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"])

        def rev(t: pa.Table) -> pa.Table:
            r = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
            return pa.table({"l_orderkey": t["l_orderkey"], "revenue": r})

        li = li.map_batches(rev, batch_format="pyarrow")
        orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"]).map_batches(
            lambda t: t.rename_columns(["l_orderkey", "o_orderpriority"]),
            batch_format="pyarrow",
        )
        from dygiepp_ray.aggregates import partial_final_agg

        def per_bucket_agg(df: pd.DataFrame) -> pd.DataFrame:
            # aggregate-pushdown: reduce inside the join bucket so the full
            # joined rows never leave the task — only ≤5 partial rows per
            # bucket travel to the (tiny) final combine
            return df.groupby("o_orderpriority", as_index=False).agg(
                n_items=("revenue", "size"), sum_revenue=("revenue", "sum"))

        joined = hash_join(li, orders, on="l_orderkey", n_buckets=16,
                           bucket_post=per_bucket_agg)
        agg = partial_final_agg(joined, ["o_orderpriority"],
                                [("n_items", "n_items", "sum"),
                                 ("sum_revenue", "sum_revenue", "sum")])
        return _round_cols(agg, {"sum_revenue": 2})

    q["lineitem_orders_join"] = lineitem_orders_join

    def top2_orders_per_cust(sf_dir: str):
        # top-2 orders per customer: ONE coarse-bucket shuffle + vectorized
        # in-bucket cumcount (windows.top_n_per_key), not a fine-key groupby
        from dygiepp_ray.windows import top_n_per_key

        ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
        return top_n_per_key(ds, "o_custkey", ["o_totalprice", "o_orderkey"],
                             n=2, ascending=[False, True])

    q["top2_orders_per_cust"] = top2_orders_per_cust

    def q_orders_moving_sum(sf_dir: str):
        # ROWS-frame windowed aggregate: trailing 3-order spend per customer
        # (SUM ... ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) — exact cents,
        # ONE coarse-bucket shuffle + vectorized shifted-cumsum kernel
        from dygiepp_ray.windows import moving_sum

        ds = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"])

        def cents(df: pd.DataFrame) -> pd.DataFrame:
            c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                         + 0.5).astype("int64")
            return df.drop(columns=["o_totalprice"]).assign(cents=c)

        out = moving_sum(ds.map_batches(cents, batch_format="pandas"),
                         "o_custkey", ["o_orderdate", "o_orderkey"],
                         "cents", k=3, out_col="moving_cents")
        return out.map_batches(
            lambda df: df[["o_custkey", "o_orderkey", "moving_cents"]],
            batch_format="pandas")

    q["orders_moving_sum"] = q_orders_moving_sum

    def q_orders_trailing7(sf_dir: str):
        # RANGE-frame trailing window: 7-day trailing spend per customer
        # over the per-day sums table (peers pre-aggregated per the
        # trailing_range_sum contract) — day ints via timedelta .dt.days
        # (unit-agnostic; see ROUND4_NOTES events gotcha)
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import trailing_range_sum

        ds = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            day = (df["o_orderdate"]
                   - pd.Timestamp("1970-01-01")).dt.days.astype("int64")
            cents = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                             + 0.5).astype("int64")
            return pd.DataFrame({"o_custkey": df["o_custkey"],
                                 "day": day, "cents": cents})

        daily = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"),
            ["o_custkey", "day"], [("day_cents", "cents", "sum")])
        return trailing_range_sum(daily, "o_custkey", "day", "day_cents",
                                  width=7, out_col="trailing7_cents")

    q["orders_trailing7"] = q_orders_trailing7

    def q_orders_rank_in_priority(sf_dir: str):
        # SQL rank() with gaps: order rank by spend (cents, DESC) within
        # priority — peers share ranks, next rank skips (windows.rank_with_ties)
        from dygiepp_ray.windows import rank_with_ties

        ds = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority", "o_totalprice"])

        def cents(df: pd.DataFrame) -> pd.DataFrame:
            c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                         + 0.5).astype("int64")
            return pd.DataFrame({"o_orderkey": df["o_orderkey"],
                                 "o_orderpriority": df["o_orderpriority"],
                                 "cents": c})

        out = rank_with_ties(ds.map_batches(cents, batch_format="pandas"),
                             "o_orderpriority", ["cents"], ascending=False,
                             out_col="rnk")
        return out.map_batches(
            lambda df: df[["o_orderkey", "o_orderpriority", "rnk"]],
            batch_format="pandas")

    q["orders_rank_in_priority"] = q_orders_rank_in_priority

    def q_orders_ntile(sf_dir: str):
        # SQL NTILE(4) by spend within priority (exact remainder rule:
        # first n mod k tiles get the extra row); orderkey tiebreak makes
        # the order total so both engines see identical row order
        from dygiepp_ray.windows import ntile

        ds = _read(sf_dir, "orders",
                   ["o_orderkey", "o_orderpriority", "o_totalprice"])

        def cents(df: pd.DataFrame) -> pd.DataFrame:
            c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                         + 0.5).astype("int64")
            return pd.DataFrame({"o_orderkey": df["o_orderkey"],
                                 "o_orderpriority": df["o_orderpriority"],
                                 "cents": c})

        out = ntile(ds.map_batches(cents, batch_format="pandas"),
                    "o_orderpriority", ["cents", "o_orderkey"], k=4,
                    out_col="tile")
        return out.map_batches(
            lambda df: df[["o_orderkey", "o_orderpriority", "tile"]],
            batch_format="pandas")

    q["orders_ntile"] = q_orders_ntile

    def q_tpch_q3(sf_dir: str):
        # TPC-H Q3 shape: customer ⋈ orders ⋈ lineitem — two bucketed hash
        # joins on DIFFERENT keys (custkey, then re-keyed on orderkey), all
        # filters pushed to the reads, the revenue aggregate pushed inside
        # the second join's buckets, and the global top-10 via block-local
        # prune + a tiny sort (deterministic orderkey tiebreak). Revenue is
        # exact int64: cents × (100 − discount_pct), unit 1e-4 dollars.
        from dygiepp_ray.joins import hash_join

        cut = pd.Timestamp("1998-06-01")

        cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"]
                     ).map_batches(
            lambda df: df.loc[df["c_mktsegment"] == "BUILDING", ["c_custkey"]]
                         .rename(columns={"c_custkey": "o_custkey"}),
            batch_format="pandas")
        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate"]
                       ).map_batches(
            lambda df: df[df["o_orderdate"] < cut], batch_format="pandas")
        sub = hash_join(
            orders, cust, on="o_custkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                        "o_orderdate": pa.timestamp("us")},
            right_types={"o_custkey": pa.int64()},
            bucket_post=lambda df: df[["o_orderkey", "o_orderdate"]])

        def rev(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["l_shipdate"] > cut]
            ext = np.floor(df["l_extendedprice"].to_numpy(np.float64) * 100.0
                           + 0.5).astype("int64")
            disc = np.floor(df["l_discount"].to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")
            return pd.DataFrame({"o_orderkey": df["l_orderkey"].to_numpy("int64"),
                                 "rev_s": ext * (100 - disc)})

        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"]
                   ).map_batches(rev, batch_format="pandas")

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["o_orderkey", "o_orderdate"],
                           as_index=False)["rev_s"].sum()
            return g.rename(columns={"rev_s": "revenue_s"})

        joined = hash_join(
            li, sub, on="o_orderkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "rev_s": pa.int64()},
            right_types={"o_orderkey": pa.int64(),
                         "o_orderdate": pa.timestamp("us")},
            bucket_post=per_bucket)
        from dygiepp_ray.aggregates import partial_final_agg

        agg = partial_final_agg(joined, ["o_orderkey", "o_orderdate"],
                                [("revenue_s", "revenue_s", "sum")])

        def prune(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(["revenue_s", "o_orderkey"],
                                  ascending=[False, True]).head(10)

        return (agg.map_batches(prune, batch_format="pandas")
                .sort(["revenue_s", "o_orderkey"], descending=[True, False])
                .limit(10))

    q["tpch_q3"] = q_tpch_q3

    def q_tpch_q5(sf_dir: str):
        # TPC-H Q5 shape: region/nation dims BROADCAST (tiny by nature),
        # the three fact-scale tables (lineitem, orders×customer, supplier)
        # joined through bucketed hash joins on three DIFFERENT keys
        # (suppkey, custkey, then orderkey), the c_nation = s_nation local
        # filter and per-nation revenue partials pushed inside the final
        # join's buckets. Exact revenue ints as in tpch_q3.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1997-01-01")

        nat = _read(sf_dir, "nation",
                    ["n_nationkey", "n_name", "n_regionkey"]).to_pandas()
        reg = _read(sf_dir, "region",
                    ["r_regionkey", "r_name"]).to_pandas()
        asia = reg.loc[reg["r_name"] == "ASIA", "r_regionkey"].iloc[0]
        nat = nat[nat["n_regionkey"] == asia]
        nat_names = dict(zip(nat["n_nationkey"].astype(int),
                             nat["n_name"]))
        nat_ref = ray.put(nat_names)

        def li_prep(df: pd.DataFrame) -> pd.DataFrame:
            ext = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                           * 100.0 + 0.5).astype("int64")
            disc = np.floor(df["l_discount"].to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")
            return pd.DataFrame({
                "l_suppkey": df["l_suppkey"],
                "o_orderkey": df["l_orderkey"].to_numpy("int64"),
                "rev_s": ext * (100 - disc)})

        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_suppkey", "l_extendedprice",
                    "l_discount"]).map_batches(li_prep,
                                               batch_format="pandas")

        def supp_prep(df: pd.DataFrame) -> pd.DataFrame:
            nats = ray.get(nat_ref)
            df = df[df["s_nationkey"].isin(nats)]
            return pd.DataFrame({"l_suppkey": df["s_suppkey"],
                                 "s_nat": df["s_nationkey"].astype("int64")})

        supp = _read(sf_dir, "supplier",
                     ["s_suppkey", "s_nationkey"]).map_batches(
            supp_prep, batch_format="pandas")
        li_n = hash_join(
            li, supp, on="l_suppkey", n_buckets=16,
            left_types={"l_suppkey": pa.int64(), "o_orderkey": pa.int64(),
                        "rev_s": pa.int64()},
            right_types={"l_suppkey": pa.int64(), "s_nat": pa.int64()},
            bucket_post=lambda df: df[["o_orderkey", "rev_s", "s_nat"]])

        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate"]
                       ).map_batches(
            lambda df: df.loc[(df["o_orderdate"] >= lo)
                              & (df["o_orderdate"] < hi),
                              ["o_orderkey", "o_custkey"]],
            batch_format="pandas")

        def cust_prep(df: pd.DataFrame) -> pd.DataFrame:
            nats = ray.get(nat_ref)
            df = df[df["c_nationkey"].isin(nats)]
            return pd.DataFrame({"o_custkey": df["c_custkey"],
                                 "c_nat": df["c_nationkey"].astype("int64")})

        cust = _read(sf_dir, "customer",
                     ["c_custkey", "c_nationkey"]).map_batches(
            cust_prep, batch_format="pandas")
        ord_n = hash_join(
            orders, cust, on="o_custkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
            right_types={"o_custkey": pa.int64(), "c_nat": pa.int64()},
            bucket_post=lambda df: df[["o_orderkey", "c_nat"]])

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["s_nat"] == df["c_nat"]]
            g = df.groupby("s_nat", as_index=False)["rev_s"].sum()
            return g.rename(columns={"s_nat": "nat", "rev_s": "revenue_s"})

        j = hash_join(
            li_n, ord_n, on="o_orderkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "rev_s": pa.int64(),
                        "s_nat": pa.int64()},
            right_types={"o_orderkey": pa.int64(), "c_nat": pa.int64()},
            bucket_post=per_bucket)
        agg = partial_final_agg(j, ["nat"],
                                [("revenue_s", "revenue_s", "sum")])

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            nats = ray.get(nat_ref)
            return pd.DataFrame({
                "n_name": df["nat"].map(nats),
                "revenue_s": df["revenue_s"].astype("int64")})

        return finish(agg.to_pandas())

    q["tpch_q5"] = q_tpch_q5

    def q_order_latency_stats(sf_dir: str):
        # accumulating-snapshot latency: days from order placement to FIRST
        # shipment, aggregated per priority — per-order min shipdate via
        # partial+final min (never the line rows through the join), one
        # bucketed join to orders, per-priority moment partials in-bucket
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        li = _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])

        def li_prep(df: pd.DataFrame) -> pd.DataFrame:
            d = (df["l_shipdate"]
                 - pd.Timestamp("1970-01-01")).dt.days.astype("int64")
            return pd.DataFrame({"o_orderkey": df["l_orderkey"],
                                 "ship_day": d})

        first_ship = partial_final_agg(
            li.map_batches(li_prep, batch_format="pandas"),
            ["o_orderkey"], [("first_ship", "ship_day", "min")])

        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_orderdate", "o_orderpriority"]
                       ).map_batches(
            lambda df: pd.DataFrame({
                "o_orderkey": df["o_orderkey"],
                "o_orderpriority": df["o_orderpriority"],
                "order_day": (df["o_orderdate"] - pd.Timestamp("1970-01-01")
                              ).dt.days.astype("int64")}),
            batch_format="pandas")

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            lat = (df["first_ship"] - df["order_day"]).astype("int64")
            t = pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                              "lat": lat})
            g = t.groupby("o_orderpriority")["lat"].agg(
                ["count", "sum", "min", "max"]).reset_index()
            return pd.DataFrame({"o_orderpriority": g["o_orderpriority"],
                                 "n_p": g["count"].astype("int64"),
                                 "s_p": g["sum"].astype("int64"),
                                 "mn_p": g["min"].astype("int64"),
                                 "mx_p": g["max"].astype("int64")})

        j = hash_join(
            first_ship, orders, on="o_orderkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "first_ship": pa.int64()},
            right_types={"o_orderkey": pa.int64(),
                         "o_orderpriority": pa.string(),
                         "order_day": pa.int64()},
            bucket_post=per_bucket)
        agg = partial_final_agg(
            j, ["o_orderpriority"],
            [("n_orders", "n_p", "sum"), ("sum_days", "s_p", "sum"),
             ("min_days", "mn_p", "min"), ("max_days", "mx_p", "max")])

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n_orders"].to_numpy("int64")
            s = df["sum_days"].to_numpy("int64")
            df = df.copy()
            # sums are NEGATIVE on this data (synthetic shipdates can
            # precede orderdates) — DuckDB // truncates toward zero while
            # numpy floors, so mirror with sign·(|s| // n)
            df["mean_days"] = np.sign(s) * (np.abs(s) // np.maximum(n, 1))
            return df

        return agg.map_batches(finish, batch_format="pandas")

    q["order_latency_stats"] = q_order_latency_stats

    def events_sessions(sf_dir: str):
        # gap-based sessionization (30-min inactivity gap) per user —
        # coarse-bucket shuffle + one boolean session-start mask per bucket
        from dygiepp_ray.windows import sessionize

        ds = _read(sf_dir, "events", ["user_id", "event_id", "ts"])
        out = sessionize(ds, "user_id", "ts", pd.Timedelta(minutes=30),
                         tiebreak_col="event_id")
        return out.map_batches(
            lambda df: df[["user_id", "n_sessions", "n_events"]],
            batch_format="pandas")

    q["events_sessions"] = events_sessions

    def q_events_transitions(sf_dir: str):
        # first-order event-flow mining: counts of adjacent
        # (prev_type -> next_type) transitions per user timeline — one
        # coarse-bucket shuffle, |states|²-bounded partials per bucket
        from dygiepp_ray.windows import transition_counts

        ds = _read(sf_dir, "events", ["user_id", "event_id", "ts",
                                      "event_type"])
        return transition_counts(ds, "user_id", ["ts", "event_id"],
                                 "event_type")

    q["events_transitions"] = q_events_transitions

    def q_events_cobaskets(sf_dir: str):
        # association mining: support of unordered event-type pairs
        # co-occurring in the same (user, day) basket — distinct baskets,
        # ONE coarse-bucket shuffle on the basket key, in-task self-merge
        # (pair fanout bounded by the tiny per-basket type count), pair
        # partials, tiny final combine
        from dygiepp_ray.aggregates import distinct_first, partial_final_agg

        ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            day = (df["ts"] - pd.Timestamp("1970-01-01")).dt.days.astype(
                "int64")
            return pd.DataFrame({"user_id": df["user_id"], "day": day,
                                 "t": df["event_type"]}).drop_duplicates()

        baskets = distinct_first(
            ds.map_batches(prep, batch_format="pandas"),
            ["user_id", "day", "t"])

        def stamp(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            h = pd.util.hash_pandas_object(df[["user_id", "day"]],
                                           index=False).to_numpy()
            df["_bk"] = (h % np.uint64(64)).astype("int64")
            return df

        def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns=["_bk"])
            m = df.merge(df, on=["user_id", "day"])
            m = m[m["t_x"] < m["t_y"]]
            g = m.groupby(["t_x", "t_y"], sort=False, as_index=False).size()
            return g.rename(columns={"t_x": "type_a", "t_y": "type_b",
                                     "size": "s_p"})

        partials = (baskets.map_batches(stamp, batch_format="pandas")
                    .groupby("_bk")
                    .map_groups(pair_partials, batch_format="pandas"))
        return partial_final_agg(partials, ["type_a", "type_b"],
                                 [("support", "s_p", "sum")])

    q["events_cobaskets"] = q_events_cobaskets

    def q_events_lift(sf_dir: str):
        # association LIFT per co-basket type pair: support(ab)·N /
        # (supp(a)·supp(b)) in exact ppm — pair support via the cobaskets
        # coarse-bucket shuffle, per-type basket counts via a type-bounded
        # grouped count, N via one distinct reduce; the final arithmetic
        # runs on the driver over the types²-bounded pair table with
        # python bigints (HUGEINT twin in SQL — BIGINT products overflow)
        from dygiepp_ray.aggregates import distinct_first, partial_final_agg

        ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            day = (df["ts"] - pd.Timestamp("1970-01-01")).dt.days.astype(
                "int64")
            return pd.DataFrame({"user_id": df["user_id"], "day": day,
                                 "t": df["event_type"]}).drop_duplicates()

        baskets = distinct_first(
            ds.map_batches(prep, batch_format="pandas"),
            ["user_id", "day", "t"]).materialize()

        def stamp(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            h = pd.util.hash_pandas_object(df[["user_id", "day"]],
                                           index=False).to_numpy()
            df["_bk"] = (h % np.uint64(64)).astype("int64")
            return df

        def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns=["_bk"])
            m = df.merge(df, on=["user_id", "day"])
            m = m[m["t_x"] < m["t_y"]]
            g = m.groupby(["t_x", "t_y"], sort=False, as_index=False).size()
            return g.rename(columns={"t_x": "type_a", "t_y": "type_b",
                                     "size": "s_p"})

        pairs = partial_final_agg(
            baskets.map_batches(stamp, batch_format="pandas")
            .groupby("_bk").map_groups(pair_partials, batch_format="pandas"),
            ["type_a", "type_b"], [("support", "s_p", "sum")]).to_pandas()

        tc = grouped_count(baskets.select_columns(["t"]), ["t"],
                           out_name="n_t").to_pandas()
        n_baskets = int(distinct_first(
            baskets.select_columns(["user_id", "day"]),
            ["user_id", "day"]).count())

        n_of = dict(zip(tc["t"], tc["n_t"].astype(int)))
        lift = [int(s) * n_baskets * 1_000_000
                // (n_of[a] * n_of[b])
                for a, b, s in zip(pairs["type_a"], pairs["type_b"],
                                   pairs["support"])]
        out = pd.DataFrame({
            "type_a": pairs["type_a"], "type_b": pairs["type_b"],
            "support": pairs["support"].astype("int64"),
            "n_a": pairs["type_a"].map(n_of).astype("int64"),
            "n_b": pairs["type_b"].map(n_of).astype("int64"),
            "n_baskets": np.int64(n_baskets),
            "lift_ppm": np.array(lift, dtype="int64")})
        return out

    q["events_lift"] = q_events_lift

    def q_events_user_growth(sf_dir: str):
        # cumulative unique-user growth curve at HOUR granularity (the
        # event stream spans ~a day at test SFs): per-user first-seen hour
        # (user-sized min reduce), new-user counts per hour (span-sized),
        # driver cumsum — the vocab_growth min-slice trick on the user
        # dimension. Hour index = epoch_us // 3.6e9, exact integer both
        # sides (no float time arithmetic).
        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "events", ["user_id", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            hour = ((df["ts"] - pd.Timestamp("1970-01-01"))
                    // pd.Timedelta(hours=1)).astype("int64")
            return pd.DataFrame({"user_id": df["user_id"], "hour": hour})

        first = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"),
            ["user_id"], [("h0", "hour", "min")])
        per_hour = partial_final_agg(
            first.map_batches(
                lambda df: pd.DataFrame(
                    {"hour": df["h0"],
                     "one": np.ones(len(df), "int64")}),
                batch_format="pandas"),
            ["hour"], [("new_users", "one", "sum")]).to_pandas()
        out = per_hour.sort_values("hour").reset_index(drop=True)
        out["new_users"] = out["new_users"].astype("int64")
        out["cum_users"] = out["new_users"].cumsum().astype("int64")
        return out[["hour", "new_users", "cum_users"]]

    q["events_user_growth"] = q_events_user_growth

    def q_conversion_latency(sf_dir: str):
        # first-view -> first-purchase conversion latency: per-user
        # conditional min timestamps (sentinel int64 max for absent),
        # ONE user-sized reduce, then a scalar partial+final over exact
        # microsecond latencies (converted = first purchase strictly
        # after first view; SQL twin via epoch_us)
        from dygiepp_ray.aggregates import partial_final_agg

        SENT = np.int64(2 ** 62)
        ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            us = ((df["ts"] - pd.Timestamp("1970-01-01"))
                  // pd.Timedelta(microseconds=1)).astype("int64")
            is_v = (df["event_type"] == "view").to_numpy()
            is_p = (df["event_type"] == "purchase").to_numpy()
            out = pd.DataFrame({
                "user_id": df["user_id"],
                "v_us": np.where(is_v, us, SENT),
                "p_us": np.where(is_p, us, SENT)})
            return out.groupby("user_id", as_index=False).min()

        per_user = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"),
            ["user_id"], [("v_us", "v_us", "min"),
                          ("p_us", "p_us", "min")])

        def scalar(df: pd.DataFrame) -> pd.DataFrame:
            v = df["v_us"].to_numpy("int64")
            p = df["p_us"].to_numpy("int64")
            has_v = v < SENT
            conv = has_v & (p < SENT) & (p > v)
            lat = (p - v)[conv]
            return pd.DataFrame({
                "nv_p": [int(has_v.sum())], "nc_p": [int(conv.sum())],
                "s_p": [int(lat.sum())],
                "mx_p": [int(lat.max()) if len(lat) else 0]})

        tot = per_user.map_batches(scalar,
                                   batch_format="pandas").to_pandas()
        nv = int(tot["nv_p"].sum())
        nc = int(tot["nc_p"].sum())
        s = int(tot["s_p"].sum())
        return pd.DataFrame({
            "n_viewers": [nv], "n_converted": [nc],
            "mean_latency_us": [s // max(nc, 1)],
            "max_latency_us": [int(tot["mx_p"].max()) if nc else 0],
            "conversion_ppm": [nc * 1_000_000 // max(nv, 1)]})

    q["conversion_latency"] = q_conversion_latency

    def q_hll_accuracy(sf_dir: str):
        # sketch-accuracy audit for HyperLogLog (the count-distinct twin
        # of minhash_accuracy / quantile_sketch_error): per-group HLL
        # estimate vs exact distinct users, signed error in ppm of the
        # exact value. The HLL side re-walks in the oracle parquet; the
        # exact side is live SQL — the driver compares both joined.
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import distinct_first
        from dygiepp_ray.stages.sketch import hll_ndv

        _write_oracle(sf_dir, "approx_distinct_users",
                      lambda: _o.expected_hll_ndv(sf_dir))
        ev = _read(sf_dir, "events", ["event_type", "user_id"])
        est = hll_ndv(ev, "user_id", by="event_type").to_pandas()
        dp = distinct_first(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            ["event_type", "user_id"])
        exact = grouped_count(dp.select_columns(["event_type"]),
                              ["event_type"],
                              out_name="n_exact").to_pandas()
        m = est.merge(exact, on="event_type")
        nd = m["ndv"].to_numpy("int64")
        ne = m["n_exact"].to_numpy("int64")
        d = nd - ne
        # DuckDB // TRUNCATES toward zero on negatives; mirror via
        # sign * (|d| // n) — the label_centroids discipline
        err = np.sign(d) * (np.abs(d) * 1_000_000 // np.maximum(ne, 1))
        return pd.DataFrame({
            "event_type": m["event_type"],
            "ndv_est": nd, "n_exact": ne,
            "err_ppm": err.astype("int64")
        }).sort_values("event_type").reset_index(drop=True)

    q["hll_accuracy"] = q_hll_accuracy

    def q_cms_accuracy(sf_dir: str):
        # count-min overestimate audit completing the sketch-audit family
        # (minhash / quantile / HLL / CMS): sketch point estimates vs the
        # exact token counts for the same probes; CMS guarantees est >=
        # exact, continuously asserted by overrun_ppm >= 0
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.stages.sketch import cms_point_counts

        _write_oracle(sf_dir, "cms_token_counts",
                      lambda: _o.expected_cms_token_counts(sf_dir))
        probes = ["scan", "merge", "window", "zzz-missing"]

        def toks(df: pd.DataFrame) -> pd.DataFrame:
            e = df["text"].str.lower().str.split().explode()
            return pd.DataFrame({"token": e[e.notna()]})

        stream = _read(sf_dir, "documents", ["text"]).map_batches(
            toks, batch_format="pandas")
        est = cms_point_counts(stream, "token", probes).to_pandas()

        stream2 = _read(sf_dir, "documents", ["text"]).map_batches(
            toks, batch_format="pandas").map_batches(
            lambda df: df[df["token"].isin(probes)].groupby(
                "token", as_index=False).size().rename(
                columns={"size": "n_p"}),
            batch_format="pandas")
        exact = partial_final_agg(stream2, ["token"],
                                  [("n_exact", "n_p", "sum")]).to_pandas()
        m = est.merge(exact, on="token", how="left").fillna(0)
        ev = m["est"].to_numpy("int64")
        ne = m["n_exact"].astype("int64").to_numpy()
        return pd.DataFrame({
            "token": m["token"], "est": ev, "n_exact": ne,
            "overrun_ppm": (ev - ne) * 1_000_000 // np.maximum(ne, 1)
        }).sort_values("token").reset_index(drop=True)

    q["cms_accuracy"] = q_cms_accuracy

    def q_events_heatmap(sf_dir: str):
        # weekday x hour activity heatmap: one salted grouped count on
        # integer (dow, hour) keys (epoch-exact; Thursday = day 0 of the
        # 1970 epoch, documented — no locale weekday function drift)
        ds = _read(sf_dir, "events", ["event_id", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            td = df["ts"] - pd.Timestamp("1970-01-01")
            day = (td // pd.Timedelta(days=1)).astype("int64")
            hour = ((td // pd.Timedelta(hours=1)).astype("int64")) % 24
            return pd.DataFrame({"dow": day % 7, "hour": hour})

        return grouped_count(
            ds.map_batches(prep, batch_format="pandas"),
            ["dow", "hour"], out_name="n_events", salt_buckets=4)

    q["events_heatmap"] = q_events_heatmap

    def q_events_ohlc(sf_dir: str):
        # daily OHLC candles per event type: order-based first/last
        # selections need the sorted in-bucket kernel (windows.ohlc), not a
        # plain partial+final agg; values are raw-double SELECTIONS (no
        # arithmetic) so they hash-match SQL bit for bit
        from dygiepp_ray.windows import ohlc

        ds = _read(sf_dir, "events", ["event_type", "ts", "event_id",
                                      "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            day = (df["ts"] - pd.Timestamp("1970-01-01")).dt.days.astype(
                "int64")
            return pd.DataFrame({"event_type": df["event_type"], "day": day,
                                 "ts": df["ts"], "event_id": df["event_id"],
                                 "value": df["value"]})

        return ohlc(ds.map_batches(prep, batch_format="pandas"),
                    ["event_type", "day"], ["ts", "event_id"], "value")

    q["events_ohlc"] = q_events_ohlc

    def q_user_day_outer(sf_dir: str):
        # FULL OUTER join (hash_join how="outer"): per-(user, day) purchase
        # vs click activity — co-bucketed keys make the per-bucket pandas
        # outer merge compose to the global full outer join. Composite key
        # user*1e6+day keeps the single-column join contract; unmatched
        # sides fill 0 (COALESCE twin in the SQL oracle).
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

        def prep(kind: str):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                df = df[df["event_type"] == kind]
                day = (df["ts"]
                       - pd.Timestamp("1970-01-01")).dt.days.astype("int64")
                key = df["user_id"].to_numpy("int64") * 1_000_000 + day
                return pd.DataFrame({
                    "ud": key, "one": np.ones(len(df), "int64")})
            return fn

        p = partial_final_agg(
            ds.map_batches(prep("purchase"), batch_format="pandas"),
            ["ud"], [("n_purchase", "one", "sum")])
        c = partial_final_agg(
            ds.map_batches(prep("click"), batch_format="pandas"),
            ["ud"], [("n_click", "one", "sum")])
        j = hash_join(p, c, on="ud", how="outer", n_buckets=16,
                      left_types={"ud": pa.int64(),
                                  "n_purchase": pa.int64()},
                      right_types={"ud": pa.int64(), "n_click": pa.int64()})

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            ud = df["ud"].to_numpy("int64")
            return pd.DataFrame({
                "user_id": ud // 1_000_000,
                "day": ud % 1_000_000,
                "n_purchase": df["n_purchase"].fillna(0).to_numpy(
                    "float64").astype("int64"),
                "n_click": df["n_click"].fillna(0).to_numpy(
                    "float64").astype("int64")})

        return j.map_batches(finish, batch_format="pandas")

    q["user_day_outer"] = q_user_day_outer

    def q_events_daily_dense(sf_dir: str):
        # dense daily series with gap filling: the distributed work is one
        # partial+final (type, day) count; the scaffold (full day range ×
        # observed types) is generated from that AGGREGATED table — bounded
        # by |types| × day-span, never the event rows — and left-joined
        # through the bucketed hash join with zero fill
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        ds = _read(sf_dir, "events", ["event_type", "ts"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            day = (df["ts"]
                   - pd.Timestamp("1970-01-01")).dt.days.astype("int64")
            return pd.DataFrame({"event_type": df["event_type"], "day": day,
                                 "one": np.ones(len(df), "int64")})

        counts = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"),
            ["event_type", "day"], [("n_obs", "one", "sum")]).materialize()
        cp = counts.to_pandas()  # |types| × observed days — aggregate-sized
        lo, hi = int(cp["day"].min()), int(cp["day"].max())
        types = sorted(cp["event_type"].unique())
        scaffold = pd.DataFrame(
            [(t, d) for t in types for d in range(lo, hi + 1)],
            columns=["event_type", "day"])
        scaffold["td"] = (scaffold["event_type"] + "|"
                          + scaffold["day"].astype(str))
        obs = counts.map_batches(
            lambda df: pd.DataFrame({
                "td": df["event_type"] + "|" + df["day"].astype(str),
                "n_obs": df["n_obs"]}),
            batch_format="pandas")
        j = hash_join(ray.data.from_pandas(scaffold[["td", "event_type",
                                                     "day"]]),
                      obs, on="td", how="left", n_buckets=8,
                      left_types={"td": pa.string(),
                                  "event_type": pa.string(),
                                  "day": pa.int64()},
                      right_types={"td": pa.string(), "n_obs": pa.int64()})
        return j.map_batches(
            lambda df: pd.DataFrame({
                "event_type": df["event_type"], "day": df["day"],
                "n": df["n_obs"].fillna(0).to_numpy("float64"
                                                    ).astype("int64")}),
            batch_format="pandas")

    q["events_daily_dense"] = q_events_daily_dense

    def q_late_events(sf_dir: str):
        # streaming watermark semantics: an event is LATE if its timestamp
        # trails the watermark (max ts among events that ARRIVED earlier)
        # by more than 1 hour. The synthetic stream's event_id order IS its
        # ts order (zero inversions — no lateness), so the operator
        # contract defines arrival as the bijective multiplicative-hash
        # permutation (event_id · 2654435761) mod 2^32 — simulated
        # out-of-order ingestion, mirrored verbatim in the SQL oracle.
        # Global exclusive running max via the banded ordered_prefix_max
        # scan; per-type late counts. Sentinel rows (no predecessor)
        # compare false exactly like SQL's NULL window frame.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import ordered_prefix_max

        LATE_US = 3_600_000_000

        ds = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            us = ((df["ts"] - pd.Timestamp("1970-01-01"))
                  // pd.Timedelta(microseconds=1)).astype("int64")
            arr = (df["event_id"].to_numpy("int64")
                   * 2654435761) % 4294967296
            return pd.DataFrame({"arrival": arr,
                                 "event_type": df["event_type"],
                                 "ts_us": us})

        wm = ordered_prefix_max(
            ds.map_batches(prep, batch_format="pandas"),
            "arrival", "ts_us", out_col="wm")

        def flag(df: pd.DataFrame) -> pd.DataFrame:
            late = (df["wm"].to_numpy("int64")
                    > df["ts_us"].to_numpy("int64") + LATE_US)
            return pd.DataFrame({"event_type": df["event_type"],
                                 "one": np.ones(len(df), "int64"),
                                 "late": late.astype("int64")})

        return partial_final_agg(
            wm.map_batches(flag, batch_format="pandas"), ["event_type"],
            [("n_events", "one", "sum"), ("n_late", "late", "sum")])

    q["late_events"] = q_late_events

    def q_order_size_histogram(sf_dir: str):
        # fanout profile (count-of-counts): distribution of lines-per-order
        # — two stacked partial+final grouped counts; the second level's key
        # domain is the tiny set of observed fanouts
        c1 = grouped_count(_read(sf_dir, "lineitem", ["l_orderkey"]),
                           ["l_orderkey"], out_name="n_lines")
        return grouped_count(c1.select_columns(["n_lines"]),
                             ["n_lines"], out_name="n_orders")

    q["order_size_histogram"] = q_order_size_histogram

    def q_profile_orders(sf_dir: str):
        # Deequ-style ingest profile of the orders table: per column n_rows,
        # n_null, exact n_distinct, native-ordered min/max — one wide-partial
        # stats scan + a per-block-compacted distinct stream
        from dygiepp_ray.stages.misc import profile_columns

        cols = ["o_orderkey", "o_custkey", "o_orderstatus", "o_orderpriority"]
        return profile_columns(_read(sf_dir, "orders", cols), cols)

    q["profile_orders"] = q_profile_orders

    def orders_monthly(sf_dir: str):
        ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"month": df["o_orderdate"].dt.strftime("%Y-%m"),
                                 "o_totalprice": df["o_totalprice"]})

        from dygiepp_ray.aggregates import partial_final_agg

        agg = partial_final_agg(ds.map_batches(prep, batch_format="pandas"),
                                ["month"],
                                [("n_orders", None, "count"),
                                 ("sum_total", "o_totalprice", "sum")])
        return _round_cols(agg, {"sum_total": 2})

    q["orders_monthly"] = orders_monthly

    def customer_acctbal_stats(sf_dir: str):
        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "customer", ["c_nationkey", "c_acctbal"])
        agg = partial_final_agg(ds, ["c_nationkey"],
                                [("n", None, "count"),
                                 ("min_bal", "c_acctbal", "min"),
                                 ("max_bal", "c_acctbal", "max"),
                                 ("avg_bal", "c_acctbal", "mean")])
        return _round_cols(agg, {"min_bal": 2, "max_bal": 2, "avg_bal": 6})

    q["customer_acctbal_stats"] = customer_acctbal_stats

    def running_order_total(sf_dir: str):
        # window family: running sum per customer ordered by date
        from dygiepp_ray.functions.strings import round_half_up
        from dygiepp_ray.windows import running_sum

        ds = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate",
                                      "o_totalprice"])
        out = running_sum(ds, "o_custkey", ["o_orderdate", "o_orderkey"],
                          "o_totalprice", out_col="running_total")

        def project(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_custkey": df["o_custkey"],
                "o_orderkey": df["o_orderkey"],
                "running_total": round_half_up(df["running_total"].astype("float64"), 2),
            })

        return out.map_batches(project, batch_format="pandas")

    q["running_order_total"] = running_order_total

    def asof_join_orders(sf_dir: str):
        # as-of join: each event matched to the user's latest order at-or-
        # before the event time. Right side pre-reduced to unique
        # (custkey, orderdate) — max orderkey as the deterministic tie
        # representative — so SQL-ASOF (tie-ambiguous) parity holds.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import asof_join

        events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        orders = partial_final_agg(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate", "o_orderkey"]),
            ["o_custkey", "o_orderdate"], [("o_orderkey", "o_orderkey", "max")])
        orders = orders.map_batches(
            lambda t: pa.table({"user_id": t.column("o_custkey"),
                                "o_orderdate": pc.cast(t.column("o_orderdate"),
                                                       pa.timestamp("us")),
                                "o_orderkey": t.column("o_orderkey")}),
            batch_format="pyarrow")
        return asof_join(events, orders, by="user_id",
                         left_on="ts", right_on="o_orderdate",
                         left_cols=["event_id"], right_cols=["o_orderkey"],
                         n_buckets=16,
                         left_types={"user_id": pa.int64(),
                                     "ts": pa.timestamp("us"),
                                     "event_id": pa.int64()},
                         right_types={"user_id": pa.int64(),
                                      "o_orderdate": pa.timestamp("us"),
                                      "o_orderkey": pa.int64()})

    q["asof_join_orders"] = asof_join_orders

    def range_join_events(sf_dir: str):
        # range (interval) join: pairs of events of the same user within a
        # 10-minute trailing window (half-open, self-pairs excluded),
        # counted per user. Window replication factor <= 2 at the 10-min
        # band width; the grouped count collapses the pair table.
        from dygiepp_ray.joins import interval_join

        win_us = 600_000_000  # 10 minutes in micros

        ev = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
        left = ev.map_batches(
            lambda t: pa.table({
                "user_id": t.column("user_id"),
                "event_id": t.column("event_id"),
                "ts_us": pc.cast(t.column("ts"), pa.int64()),
            }), batch_format="pyarrow")
        right = ev.map_batches(
            lambda t: pa.table({
                "user_id": t.column("user_id"),
                "eid_b": t.column("event_id"),
                "win_start": pc.cast(t.column("ts"), pa.int64()),
                "win_end": pc.add(pc.cast(t.column("ts"), pa.int64()),
                                  pa.scalar(win_us, pa.int64())),
            }), batch_format="pyarrow")
        pairs = interval_join(
            left, right, on="user_id", left_ts="ts_us",
            right_start="win_start", right_end="win_end",
            left_cols=["event_id"], right_cols=["eid_b"],
            bucket_width=win_us, n_buckets=16,
            post_filter=lambda df: df[df["event_id"] != df["eid_b"]])
        return grouped_count(pairs.select_columns(["user_id"]), ["user_id"],
                             out_name="n")

    q["range_join_events"] = range_join_events

    def quantiles_price(sf_dir: str):
        # exact distributed quantiles by histogram refinement (3 streaming
        # passes, no sort) — DuckDB quantile_disc rank semantics
        from dygiepp_ray.aggregates import distributed_quantiles

        ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_extendedprice"])
        return distributed_quantiles(ds, "l_extendedprice",
                                     [0.25, 0.5, 0.75, 0.9, 0.99],
                                     by="l_returnflag")

    q["quantiles_price"] = quantiles_price

    def approx_quantiles_price(sf_dir: str):
        # ONE-PASS approximate quantiles (mergeable fixed-bin histogram
        # sketch, stages/sketch.py): error ≤ one bin width
        # ((110000−0)/2^16 ≈ 1.68), vs the exact 3-pass
        # distributed_quantiles behind `quantiles_price`. Every float
        # expression (bin, edge value, ceil-rank) is mirrored verbatim in
        # the SQL oracle.
        from dygiepp_ray.stages.sketch import histogram_quantiles

        ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
        return histogram_quantiles(ds, "l_extendedprice",
                                   probs=[0.25, 0.5, 0.75, 0.9, 0.99],
                                   lo=0.0, hi=110000.0, bits=16)

    q["approx_quantiles_price"] = approx_quantiles_price

    def q_quantile_sketch_error(sf_dir: str):
        # sketch-accuracy audit for the histogram-quantile sketch (the
        # quantile twin of minhash_accuracy): one-pass approximate vs
        # exact 3-pass quantiles on the same column, per-prob error.
        # Both pipelines stream; the join is 5 rows on the driver. The
        # error must stay within one bin width (110000/2^16 ≈ 1.68) —
        # the sketch's documented bound, now continuously asserted by
        # this query's oracle.
        from dygiepp_ray.aggregates import distributed_quantiles
        from dygiepp_ray.functions.strings import round_half_up
        from dygiepp_ray.stages.sketch import histogram_quantiles

        def _pdf(x):
            return x.to_pandas() if hasattr(x, "to_pandas") else x

        probs = [0.25, 0.5, 0.75, 0.9, 0.99]
        ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
        ap = _pdf(histogram_quantiles(ds, "l_extendedprice", probs=probs,
                                      lo=0.0, hi=110000.0, bits=16))
        ex = _pdf(distributed_quantiles(
            _read(sf_dir, "lineitem", ["l_extendedprice"]),
            "l_extendedprice", probs))
        m = ap.merge(ex, left_on="prob", right_on="q")
        err = round_half_up(
            m["value"].to_numpy(np.float64) - m["v"].to_numpy(np.float64),
            6)
        return pd.DataFrame({
            "prob": m["prob"].astype(np.float64),
            "approx_value": m["value"].astype(np.float64),
            "exact_value": m["v"].astype(np.float64),
            "err_value": err}).sort_values("prob").reset_index(drop=True)

    q["quantile_sketch_error"] = q_quantile_sketch_error

    def q_orders_winsorized(sf_dir: str):
        # robust-aggregate curation: winsorize o_totalprice at the exact
        # p01/p99 cents cutoffs (distributed_quantiles, broadcast as two
        # scalars), then per-priority sums of raw vs clipped cents plus
        # clip counts — the outlier-robust revenue report. All int64.
        from dygiepp_ray.aggregates import (distributed_quantiles,
                                            partial_final_agg)

        def cents_prep(df: pd.DataFrame) -> pd.DataFrame:
            c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                         + 0.5).astype("int64")
            return pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                                 "cents": c})

        ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
                   ).map_batches(cents_prep, batch_format="pandas"
                                 ).materialize()
        qv = distributed_quantiles(ds, "cents", [0.01, 0.99])
        qv = qv.to_pandas() if hasattr(qv, "to_pandas") else qv
        cuts = {float(r["q"]): int(r["v"]) for _, r in qv.iterrows()}
        lo, hi = cuts[0.01], cuts[0.99]

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            c = df["cents"].to_numpy("int64")
            w = np.clip(c, lo, hi)
            g = pd.DataFrame({
                "o_orderpriority": df["o_orderpriority"],
                "raw_p": c, "win_p": w,
                "lo_p": (c < lo).astype("int64"),
                "hi_p": (c > hi).astype("int64")})
            return g.groupby("o_orderpriority", as_index=False).sum()

        return partial_final_agg(
            ds.map_batches(partials, batch_format="pandas"),
            ["o_orderpriority"],
            [("raw_cents", "raw_p", "sum"), ("win_cents", "win_p", "sum"),
             ("n_clipped_lo", "lo_p", "sum"),
             ("n_clipped_hi", "hi_p", "sum")])

    q["orders_winsorized"] = q_orders_winsorized

    def upsert_orders(sf_dir: str):
        # CDC-style upsert merge (last-writer-wins): base = orders; the
        # change stream is a deterministic transform of orders (every 7th
        # key re-priced, stamped one day later) mirrored exactly in the
        # oracle. Merge = union + per-key argmax on (version DESC,
        # src DESC) via the coarse-bucket argmax_per_key — ONE shuffle, no
        # join; ties (same version) resolve to the update side.
        from dygiepp_ray.aggregates import argmax_per_key

        ds = _read(sf_dir, "orders",
                   ["o_orderkey", "o_totalprice", "o_orderdate"])

        def base_rows(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_orderkey": df["o_orderkey"].astype("int64"),
                "o_totalprice": df["o_totalprice"],
                "version": (df["o_orderdate"]
                            - pd.Timestamp("1970-01-01")).dt.days
                           .astype("int64"),
                "src": np.zeros(len(df), dtype="int64")})

        def update_rows(df: pd.DataFrame) -> pd.DataFrame:
            upd = df[df["o_orderkey"] % 7 == 0]
            return pd.DataFrame({
                "o_orderkey": upd["o_orderkey"].astype("int64"),
                "o_totalprice": upd["o_totalprice"] + 1000.0,
                "version": ((upd["o_orderdate"]
                             - pd.Timestamp("1970-01-01")).dt.days
                            + 1).astype("int64"),
                "src": np.ones(len(upd), dtype="int64")})

        base = ds.map_batches(base_rows, batch_format="pandas")
        updates = ds.map_batches(update_rows, batch_format="pandas")
        merged = argmax_per_key(
            base.union(updates), key="o_orderkey",
            order_cols=["version", "src"], ascending=[False, False],
            keep_cols=["o_orderkey", "o_totalprice", "version"])

        def fmt(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["o_totalprice"] = df["o_totalprice"].round(2)
            return df

        return merged.map_batches(fmt, batch_format="pandas")

    q["upsert_orders"] = upsert_orders

    def edit1_part_names(sf_dir: str):
        # typo-level fuzzy matching over the part-name catalog: FastSS
        # deletion-neighborhood blocking (lossless for ed ≤ 1), exact
        # two-pointer verify inside coarse key buckets — the precision
        # complement to alias_pairs' trigram-Jaccard recall
        from dygiepp_ray.stages.linking import edit1_name_pairs

        ds = _read(sf_dir, "part", ["p_name"])
        names = grouped_count(
            ds.map_batches(
                lambda df: pd.DataFrame({"name": df["p_name"]}),
                batch_format="pandas"),
            ["name"], out_name="_n").select_columns(["name"])
        return edit1_name_pairs(names, name_col="name", min_len=2)

    q["edit1_part_names"] = edit1_part_names

    def approx_distinct_users(sf_dir: str):
        # HyperLogLog count-distinct (p=12, ~1.6% s.e.): partial registers
        # per block -> (group, register) max merge -> per-group estimate
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.sketch import hll_ndv

        _write_oracle(sf_dir, "approx_distinct_users",
                      lambda: _o.expected_hll_ndv(sf_dir))
        ev = _read(sf_dir, "events", ["event_type", "user_id"])
        return hll_ndv(ev, "user_id", by="event_type")

    q["approx_distinct_users"] = approx_distinct_users

    def events_props_sum(sf_dir: str):
        # JSON field extraction (vectorized regex fast path) -> grouped sum
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.stages.misc import json_extract_int

        ev = _read(sf_dir, "events", ["event_type", "props"])
        ext = json_extract_int(ev, "props", "k", "k_val")
        return partial_final_agg(ext.select_columns(["event_type", "k_val"]),
                                 ["event_type"], [("k_sum", "k_val", "sum")])

    q["events_props_sum"] = events_props_sum

    def pivot_status_priority(sf_dir: str):
        # long->wide pivot of grouped counts (closed category list)
        from dygiepp_ray.aggregates import pivot_counts

        ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        return pivot_counts(ds, "o_orderstatus", "o_orderpriority",
                            ["1-URGENT", "2-HIGH", "3-MEDIUM",
                             "4-NOT SPECIFIED", "5-LOW"])

    q["pivot_status_priority"] = pivot_status_priority

    def rollup_status_priority(sf_dir: str):
        # GROUP BY ROLLUP twin: one scan at the finest level, coarser levels
        # re-aggregated from the (tiny) finest result
        from dygiepp_ray.aggregates import rollup_count

        ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        return rollup_count(ds, ["o_orderstatus", "o_orderpriority"],
                            out_name="n")

    q["rollup_status_priority"] = rollup_status_priority

    def q_cube_status_priority(sf_dir: str):
        # GROUP BY CUBE twin: rollup's prefixes PLUS the cross marginals —
        # all 2^k grouping sets re-aggregated from one finest-level scan
        from dygiepp_ray.aggregates import cube_count

        ds = _read(sf_dir, "orders", ["o_orderstatus", "o_orderpriority"])
        return cube_count(ds, ["o_orderstatus", "o_orderpriority"],
                          out_name="n")

    q["cube_status_priority"] = q_cube_status_priority

    def q_orders_priority_share(sf_dir: str):
        # ratio-to-report: each priority's exact share of total spend in
        # ppm — one partial+final grouped sum; the grand total is a tiny
        # reduce over the per-group rows (never a second input scan)
        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"])

        def cents(df: pd.DataFrame) -> pd.DataFrame:
            c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                         + 0.5).astype("int64")
            return pd.DataFrame({"o_orderpriority": df["o_orderpriority"],
                                 "cents": c})

        g = partial_final_agg(
            ds.map_batches(cents, batch_format="pandas"),
            ["o_orderpriority"], [("sum_cents", "cents", "sum")]
        ).to_pandas()
        total = max(int(g["sum_cents"].sum()), 1)
        sc = g["sum_cents"].to_numpy("int64")
        return pd.DataFrame({
            "o_orderpriority": g["o_orderpriority"],
            "sum_cents": sc,
            "share_ppm": (sc * 1_000_000) // total})

    q["orders_priority_share"] = q_orders_priority_share

    def q_orders_monthly_growth(sf_dir: str):
        # window-over-aggregate composition: monthly revenue with
        # month-over-month delta — partial+final month sums (the
        # distributed pass), then one lag over the months-sized result
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import lag_diff

        ds = _read(sf_dir, "orders", ["o_orderdate", "o_totalprice"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                         + 0.5).astype("int64")
            return pd.DataFrame({
                "month": df["o_orderdate"].dt.strftime("%Y-%m"),
                "cents": c})

        monthly = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"), ["month"],
            [("sum_cents", "cents", "sum")])
        monthly = monthly.map_batches(
            lambda df: df.assign(_g=np.zeros(len(df), "int64")),
            batch_format="pandas")
        out = lag_diff(monthly, "_g", ["month"], "sum_cents",
                       out_col="delta_cents", n_buckets=1)

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            df = df.dropna(subset=["delta_cents"])  # first month has no lag
            return pd.DataFrame({
                "month": df["month"], "sum_cents": df["sum_cents"],
                "delta_cents": df["delta_cents"].astype("int64")})

        return out.map_batches(finish, batch_format="pandas")

    q["orders_monthly_growth"] = q_orders_monthly_growth

    def q_events_distinct_users(sf_dir: str):
        # EXACT distinct users per event type — the validation twin of the
        # HLL sketch query (approx_distinct_users): distinct (type, user)
        # via per-block dedup + one shuffle, then a tiny grouped count
        from dygiepp_ray.aggregates import distinct_first

        dp = distinct_first(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            ["event_type", "user_id"])
        return grouped_count(dp.select_columns(["event_type"]),
                             ["event_type"], out_name="n_users")

    q["events_distinct_users"] = q_events_distinct_users

    def q_doc_length_quantiles(sf_dir: str):
        # per-source document-length quantiles (corpus-shape QA before
        # mixing): grouped exact histogram-refinement quantiles reuse
        from dygiepp_ray.aggregates import distributed_quantiles

        ds = _read(sf_dir, "documents", ["source", "n_chars"])
        return distributed_quantiles(ds, "n_chars", [0.1, 0.5, 0.9],
                                     by="source")

    q["doc_length_quantiles"] = q_doc_length_quantiles

    def q_rfm_segments(sf_dir: str):
        # RFM customer segmentation: per-customer recency/frequency/
        # monetary reduce (one partial+final agg over orders), EXACT
        # distributed quartile cutoffs per dimension (quantile_disc
        # semantics), broadcast cutoffs score each customer 1-4, segment =
        # r·100+f·10+m, tiny per-segment count out. Boundary rule shared
        # with SQL: score = 1 + Σ (v > cutoff).
        from dygiepp_ray.aggregates import (distributed_quantiles,
                                            partial_final_agg)

        ds = _read(sf_dir, "orders",
                   ["o_custkey", "o_orderdate", "o_totalprice"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            day = (df["o_orderdate"]
                   - pd.Timestamp("1970-01-01")).dt.days.astype("int64")
            c = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                         + 0.5).astype("int64")
            return pd.DataFrame({"o_custkey": df["o_custkey"],
                                 "r_day": day, "one": np.ones(len(df),
                                                              "int64"),
                                 "mon": c})

        pc = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"), ["o_custkey"],
            [("r_day", "r_day", "max"), ("freq", "one", "sum"),
             ("mon", "mon", "sum")]).materialize()

        QS = [0.25, 0.5, 0.75]
        cuts = {}
        for col in ("r_day", "freq", "mon"):
            qv = distributed_quantiles(pc, col, QS)
            cuts[col] = [float(v) for v in qv.sort_values("q")["v"]]
        cuts_ref = ray.put(cuts)

        def score(df: pd.DataFrame) -> pd.DataFrame:
            cc = ray.get(cuts_ref)

            def s(col):
                v = df[col].to_numpy("int64")
                out = np.ones(len(df), "int64")
                for c in cc[col]:
                    out += (v > c).astype("int64")
                return out

            seg = s("r_day") * 100 + s("freq") * 10 + s("mon")
            return pd.DataFrame({"segment": seg,
                                 "one": np.ones(len(df), "int64")})

        return partial_final_agg(
            pc.map_batches(score, batch_format="pandas"), ["segment"],
            [("n_customers", "one", "sum")])

    q["rfm_segments"] = q_rfm_segments

    def q_orders_with_returns(sf_dir: str):
        # TPC-H Q4 shape (order-priority checking): orders in a 3-month
        # window having >= 1 returned lineitem (EXISTS semi-join), counted
        # per priority. Unlike semi_join_orders' broadcast-set path, the
        # EXISTS side here is UNBOUNDED (one key per order) — distinct
        # orderkeys reduce per block first, then ONE bucketed semi-join
        # whose buckets emit per-priority partial counts, so join output
        # never exceeds |priorities| x buckets rows.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        lo = pd.Timestamp("1997-07-01")
        hi = pd.Timestamp("1997-10-01")

        returned = grouped_count(
            _read(sf_dir, "lineitem", ["l_orderkey", "l_returnflag"]
                  ).map_batches(
                lambda df: df.loc[df["l_returnflag"] == "R",
                                  ["l_orderkey"]].rename(
                    columns={"l_orderkey": "o_orderkey"}),
                batch_format="pandas"),
            ["o_orderkey"], out_name="_c").select_columns(["o_orderkey"])

        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_orderdate", "o_orderpriority"]
                       ).map_batches(
            lambda df: df.loc[(df["o_orderdate"] >= lo)
                              & (df["o_orderdate"] < hi),
                              ["o_orderkey", "o_orderpriority"]],
            batch_format="pandas")

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby("o_orderpriority", as_index=False).size()
            return g.rename(columns={"size": "n_orders"})

        joined = hash_join(
            orders, returned, on="o_orderkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(),
                        "o_orderpriority": pa.string()},
            right_types={"o_orderkey": pa.int64()},
            bucket_post=per_bucket)
        return partial_final_agg(joined, ["o_orderpriority"],
                                 [("n_orders", "n_orders", "sum")])

    q["orders_with_returns"] = q_orders_with_returns

    def q_tpch_q10(sf_dir: str):
        # TPC-H Q10 shape (returned-item reporting): revenue lost to
        # returns per customer in a quarter, top 20 with name/nation
        # attached. lineitem(R) ⋈ orders(window) on orderkey with
        # per-custkey revenue partials pushed into the buckets, a
        # customer-sized partial+final sum, block-prune + tiny-sort top-20,
        # then the 20 winners' attributes come from a broadcast-filtered
        # customer/nation read (never a customer-wide join for 20 rows)
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        lo = pd.Timestamp("1997-07-01")
        hi = pd.Timestamp("1997-10-01")

        def rev(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["l_returnflag"] == "R"]
            ext = np.floor(df["l_extendedprice"].to_numpy(np.float64) * 100.0
                           + 0.5).astype("int64")
            disc = np.floor(df["l_discount"].to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")
            return pd.DataFrame(
                {"o_orderkey": df["l_orderkey"].to_numpy("int64"),
                 "rev_s": ext * (100 - disc)})

        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_extendedprice", "l_discount",
                    "l_returnflag"]).map_batches(rev, batch_format="pandas")
        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate"]
                       ).map_batches(
            lambda df: df.loc[(df["o_orderdate"] >= lo)
                              & (df["o_orderdate"] < hi),
                              ["o_orderkey", "o_custkey"]],
            batch_format="pandas")

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("o_custkey", as_index=False)["rev_s"].sum()

        joined = hash_join(
            li, orders, on="o_orderkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "rev_s": pa.int64()},
            right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
            bucket_post=per_bucket)
        agg = partial_final_agg(joined, ["o_custkey"],
                                [("revenue_s", "rev_s", "sum")])

        def prune(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(["revenue_s", "o_custkey"],
                                  ascending=[False, True]).head(20)

        top = (agg.map_batches(prune, batch_format="pandas")
               .sort(["revenue_s", "o_custkey"], descending=[True, False])
               .limit(20).to_pandas())

        keys = set(top["o_custkey"].tolist())
        cust = _read(sf_dir, "customer",
                     ["c_custkey", "c_name", "c_nationkey", "c_acctbal"]
                     ).map_batches(
            lambda df: df[df["c_custkey"].isin(keys)],
            batch_format="pandas").to_pandas()
        nat = _read(sf_dir, "nation", ["n_nationkey", "n_name"]).to_pandas()
        out = (top.merge(cust, left_on="o_custkey", right_on="c_custkey")
               .merge(nat, left_on="c_nationkey", right_on="n_nationkey"))
        out = out.sort_values(["revenue_s", "o_custkey"],
                              ascending=[False, True]).reset_index(drop=True)
        out["acctbal_cents"] = np.floor(
            out["c_acctbal"].to_numpy(np.float64) * 100.0 + 0.5
        ).astype("int64")
        return out[["o_custkey", "c_name", "n_name", "acctbal_cents",
                    "revenue_s"]]

    q["tpch_q10"] = q_tpch_q10

    def q_part_abc_classes(sf_dir: str):
        # Pareto / ABC inventory classification: parts by cumulative
        # revenue share (A <= 80%, B <= 95%, C rest), peers-inclusive
        # RANGE semantics so revenue ties share a class. Per-part revenue
        # reduce -> tie-aggregate to DISTINCT revenue values (unique, so
        # the banded ordered_prefix_sum contract holds) -> exact asc
        # prefix -> desc-inclusive cum = total - C(v) + g(v) -> class map
        # joined back per part by ONE bucketed hash_join on the revenue
        # value. Compare cum*100 <= pct*total in int64 (bound: total <
        # 9.2e16 — beyond that lift to the HUGEINT twin the SQL uses).
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join
        from dygiepp_ray.windows import ordered_prefix_sum

        def rev(df: pd.DataFrame) -> pd.DataFrame:
            ext = np.floor(df["l_extendedprice"].to_numpy(np.float64) * 100.0
                           + 0.5).astype("int64")
            disc = np.floor(df["l_discount"].to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")
            return pd.DataFrame(
                {"p_partkey": df["l_partkey"].to_numpy("int64"),
                 "rev_s": ext * (100 - disc)})

        per_part = partial_final_agg(
            _read(sf_dir, "lineitem",
                  ["l_partkey", "l_extendedprice", "l_discount"]
                  ).map_batches(rev, batch_format="pandas"),
            ["p_partkey"], [("revenue_s", "rev_s", "sum")]).materialize()

        ties = partial_final_agg(
            per_part.map_batches(
                lambda df: pd.DataFrame({
                    "revenue_s": df["revenue_s"],
                    "n_p": np.ones(len(df), "int64"),
                    "g_p": df["revenue_s"].to_numpy("int64")}),
                batch_format="pandas"),
            ["revenue_s"], [("n_parts", "n_p", "sum"),
                            ("g", "g_p", "sum")])
        ties = ties.map_batches(
            lambda df: df.assign(_g=np.int64(0)), batch_format="pandas")
        pref = ordered_prefix_sum(ties, "_g", "revenue_s", "g",
                                  out_col="c_asc").materialize()

        tot = pref.map_batches(
            lambda df: pd.DataFrame({"t": [int(df["g"].sum())]}),
            batch_format="pandas").to_pandas()
        total = int(tot["t"].sum())

        def classify(df: pd.DataFrame) -> pd.DataFrame:
            cum = (total - df["c_asc"].to_numpy("int64")
                   + df["g"].to_numpy("int64"))
            cls = np.where(cum * 100 <= 80 * total, "A",
                           np.where(cum * 100 <= 95 * total, "B", "C"))
            return pd.DataFrame({"revenue_s": df["revenue_s"],
                                 "abc_class": cls})

        classes = pref.map_batches(classify, batch_format="pandas")
        return hash_join(
            per_part, classes, on="revenue_s", n_buckets=16,
            left_types={"p_partkey": pa.int64(), "revenue_s": pa.int64()},
            right_types={"revenue_s": pa.int64(),
                         "abc_class": pa.string()})

    q["part_abc_classes"] = q_part_abc_classes

    def q_orders_cohort_ltv(sf_dir: str):
        # cohort LTV matrix: customers grouped by first-order month,
        # revenue tracked by month offset since that first order. Per-
        # customer min-month reduce, ONE bucketed join back to orders on
        # custkey with (cohort, offset) partials emitted in-bucket, then a
        # cohort-sized partial+final sum. Month arithmetic in integer
        # month indices (y*12+m), mirrored exactly in SQL.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            mi = (df["o_orderdate"].dt.year.to_numpy("int64") * 12
                  + df["o_orderdate"].dt.month.to_numpy("int64") - 1)
            cents = np.floor(df["o_totalprice"].to_numpy(np.float64) * 100.0
                             + 0.5).astype("int64")
            return pd.DataFrame({"o_custkey": df["o_custkey"],
                                 "month_ix": mi, "cents": cents})

        orders = _read(sf_dir, "orders",
                       ["o_custkey", "o_orderdate", "o_totalprice"]
                       ).map_batches(prep, batch_format="pandas"
                                     ).materialize()
        first = partial_final_agg(
            orders.select_columns(["o_custkey", "month_ix"]),
            ["o_custkey"], [("cohort_ix", "month_ix", "min")])

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            g = pd.DataFrame({
                "cohort_ix": df["cohort_ix"].to_numpy("int64"),
                "month_offset": df["month_ix"].to_numpy("int64")
                - df["cohort_ix"].to_numpy("int64"),
                "cents": df["cents"].to_numpy("int64"),
                "one": np.ones(len(df), "int64")})
            return g.groupby(["cohort_ix", "month_offset"],
                             as_index=False)[["cents", "one"]].sum()

        joined = hash_join(
            orders, first, on="o_custkey", n_buckets=16,
            left_types={"o_custkey": pa.int64(), "month_ix": pa.int64(),
                        "cents": pa.int64()},
            right_types={"o_custkey": pa.int64(), "cohort_ix": pa.int64()},
            bucket_post=per_bucket)
        return partial_final_agg(
            joined, ["cohort_ix", "month_offset"],
            [("revenue_cents", "cents", "sum"), ("n_orders", "one", "sum")])

    q["orders_cohort_ltv"] = q_orders_cohort_ltv

    def q_tpch_q13(sf_dir: str):
        # TPC-H Q13 shape: distribution of orders per customer INCLUDING
        # zero-order customers — per-custkey count reduce, one bucketed
        # LEFT join from the customer table (null -> 0), then the
        # count-of-counts aggregate
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        per_cust = partial_final_agg(
            _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]
                  ).map_batches(
                lambda df: pd.DataFrame(
                    {"c_custkey": df["o_custkey"],
                     "one": np.ones(len(df), "int64")}),
                batch_format="pandas"),
            ["c_custkey"], [("n_orders", "one", "sum")])
        cust = _read(sf_dir, "customer", ["c_custkey"])

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n_orders"].fillna(0).astype("int64")
            g = pd.DataFrame({"n_orders": n,
                              "one": np.ones(len(df), "int64")})
            return g.groupby("n_orders", as_index=False)["one"].sum()

        joined = hash_join(
            cust, per_cust, on="c_custkey", how="left", n_buckets=16,
            left_types={"c_custkey": pa.int64()},
            right_types={"c_custkey": pa.int64(), "n_orders": pa.int64()},
            bucket_post=per_bucket)
        return partial_final_agg(joined, ["n_orders"],
                                 [("n_customers", "one", "sum")])

    q["tpch_q13"] = q_tpch_q13

    def q_tpch_q7(sf_dir: str):
        # TPC-H Q7 shape: supplier-nation × customer-nation shipping
        # volume by ship year. Supplier is the SMALL dimension → its
        # suppkey→nationkey map broadcasts once (ray.put); customer scales
        # with SF → orders⋈customer is a bucketed hash join on custkey;
        # lineitem re-keys on orderkey for the second bucketed join with
        # the (supp-nation, year, revenue) partials pushed in-bucket.
        # Revenue exact int64: cents × (100 − disc_pct), as in tpch_q3.
        # Unlike canonical Q7 the nation pair is NOT restricted (the
        # synthetic supplier table is too thin at sf0.001 for any single
        # pair to survive) — output is all s_nat ≠ c_nat pairs × year,
        # bounded by |nation|² × years.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1998-01-01")

        supp = _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).to_pandas()
        snat_ref = ray.put(dict(zip(supp["s_suppkey"].astype(int),
                                    supp["s_nationkey"].astype(int))))

        def li_prep(df: pd.DataFrame) -> pd.DataFrame:
            df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
            ext = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                           * 100.0 + 0.5).astype("int64")
            disc = np.floor(df["l_discount"].to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")
            return pd.DataFrame({
                "o_orderkey": df["l_orderkey"].to_numpy("int64"),
                "s_nat": df["l_suppkey"].map(ray.get(snat_ref)).to_numpy("int64"),
                "l_year": df["l_shipdate"].dt.year.to_numpy("int64"),
                "rev_s": ext * (100 - disc)})

        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_suppkey", "l_extendedprice",
                    "l_discount", "l_shipdate"]).map_batches(
            li_prep, batch_format="pandas")

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
        cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]
                     ).map_batches(
            lambda df: pd.DataFrame({"o_custkey": df["c_custkey"],
                                     "c_nat": df["c_nationkey"].astype("int64")}),
            batch_format="pandas")
        ord_n = hash_join(
            orders, cust, on="o_custkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64()},
            right_types={"o_custkey": pa.int64(), "c_nat": pa.int64()},
            bucket_post=lambda df: df[["o_orderkey", "c_nat"]])

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["s_nat"] != df["c_nat"]]
            return df.groupby(["s_nat", "c_nat", "l_year"],
                              as_index=False)["rev_s"].sum()

        joined = hash_join(
            li, ord_n, on="o_orderkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "s_nat": pa.int64(),
                        "l_year": pa.int64(), "rev_s": pa.int64()},
            right_types={"o_orderkey": pa.int64(), "c_nat": pa.int64()},
            bucket_post=per_bucket)
        agg = partial_final_agg(joined, ["s_nat", "c_nat", "l_year"],
                                [("revenue_s", "rev_s", "sum"),
                                 ])
        return agg.map_batches(
            lambda df: df.assign(
                supp_nation="NATION_" + df["s_nat"].astype(str),
                cust_nation="NATION_" + df["c_nat"].astype(str))[
                ["supp_nation", "cust_nation", "l_year", "revenue_s"]],
            batch_format="pandas")

    q["tpch_q7"] = q_tpch_q7

    def q_tpch_q14(sf_dir: str):
        # TPC-H Q14 shape: promo revenue share per ship month. Per-
        # (partkey, month) revenue partials reduce OFF the fact table
        # first (partkey-bounded), then ONE bucketed dimension join with
        # part where the in-bucket hook collapses to per-month
        # (promo_s, total_s) partials — part is never broadcast. The
        # final ratio is computed on the month-sized frame with PYTHON
        # ints (promo_s × 1e6 overflows int64 at large SF; arbitrary-
        # precision floor-div mirrored by DuckDB's HUGEINT sum → //).
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        def li_prep(df: pd.DataFrame) -> pd.DataFrame:
            ext = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                           * 100.0 + 0.5).astype("int64")
            disc = np.floor(df["l_discount"].to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")
            month = (df["l_shipdate"].dt.year * 100
                     + df["l_shipdate"].dt.month).to_numpy("int64")
            return pd.DataFrame({"p_partkey": df["l_partkey"].to_numpy("int64"),
                                 "month": month, "rev_s": ext * (100 - disc)})

        li = partial_final_agg(
            _read(sf_dir, "lineitem",
                  ["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"]
                  ).map_batches(li_prep, batch_format="pandas"),
            ["p_partkey", "month"], [("rev_s", "rev_s", "sum")])

        part = _read(sf_dir, "part", ["p_partkey", "p_type"])

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            promo = np.where(df["p_type"].to_numpy(object) == "PROMO",
                             df["rev_s"].to_numpy("int64"), 0)
            g = pd.DataFrame({"month": df["month"].to_numpy("int64"),
                              "promo_s": promo,
                              "total_s": df["rev_s"].to_numpy("int64")})
            return g.groupby("month", as_index=False).sum()

        joined = hash_join(
            li, part, on="p_partkey", n_buckets=16,
            left_types={"p_partkey": pa.int64(), "month": pa.int64(),
                        "rev_s": pa.int64()},
            right_types={"p_partkey": pa.int64(), "p_type": pa.string()},
            bucket_post=per_bucket)
        agg = partial_final_agg(joined, ["month"],
                                [("promo_s", "promo_s", "sum"),
                                 ("total_s", "total_s", "sum")])

        def ratio(df: pd.DataFrame) -> pd.DataFrame:
            ppm = [int(p) * 1_000_000 // int(t) if t else 0
                   for p, t in zip(df["promo_s"], df["total_s"])]
            return df.assign(promo_ppm=np.asarray(ppm, "int64"))

        return agg.map_batches(ratio, batch_format="pandas")

    q["tpch_q14"] = q_tpch_q14

    def q_tpch_q18(sf_dir: str):
        # TPC-H Q18 shape: large-volume orders (Σ l_quantity > 175). The
        # per-orderkey quantity reduce happens OFF the fact table
        # (partial+final, orderkey-bounded); the tiny winner set then
        # flows through two bucketed joins (orders on orderkey, customer
        # on custkey) — never a broadcast, so the shape survives a
        # threshold that admits millions of winners at 100 TB. Quantities
        # are integral by data contract → exact int64 sums.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        qty = partial_final_agg(
            _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"]
                  ).map_batches(
                lambda df: pd.DataFrame({
                    "o_orderkey": df["l_orderkey"].to_numpy("int64"),
                    "qty": np.floor(df["l_quantity"].to_numpy(np.float64)
                                    + 0.5).astype("int64")}),
                batch_format="pandas"),
            ["o_orderkey"], [("sum_qty", "qty", "sum")])
        winners = qty.map_batches(
            lambda df: df[df["sum_qty"] > 175], batch_format="pandas")

        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_orderdate",
                        "o_totalprice"])
        w_ord = hash_join(
            winners, orders, on="o_orderkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "sum_qty": pa.int64()},
            right_types={"o_orderkey": pa.int64(), "o_custkey": pa.int64(),
                         "o_orderdate": pa.timestamp("us"),
                         "o_totalprice": pa.float64()},
            bucket_post=lambda df: df.rename(columns={"o_custkey": "c_custkey"}))
        cust = _read(sf_dir, "customer", ["c_custkey", "c_name"])
        out = hash_join(
            w_ord, cust, on="c_custkey", n_buckets=16,
            left_types={"o_orderkey": pa.int64(), "sum_qty": pa.int64(),
                        "c_custkey": pa.int64(),
                        "o_orderdate": pa.timestamp("us"),
                        "o_totalprice": pa.float64()},
            right_types={"c_custkey": pa.int64(), "c_name": pa.string()})
        return _round_cols(
            out.map_batches(
                lambda df: df[["c_name", "c_custkey", "o_orderkey",
                               "o_orderdate", "o_totalprice", "sum_qty"]],
                batch_format="pandas"),
            {"o_totalprice": 2})

    q["tpch_q18"] = q_tpch_q18

    def q_tpch_q22(sf_dir: str):
        # TPC-H Q22 shape: per-nation count/balance of above-average-
        # balance customers with NO urgent orders. The global positive-
        # balance mean broadcasts as the exact integer pair (Σcents, n) —
        # the comparison is cents·n > Σcents, NO float division anywhere.
        # The "no urgent orders" membership is a bucketed LEFT-join
        # marker anti-join against the per-custkey urgent-order reduce
        # (custkey-bounded), with the per-nation partials pushed into the
        # join bucket.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        def cents(col: pd.Series) -> np.ndarray:
            return np.floor(col.to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")

        pos = partial_final_agg(
            _read(sf_dir, "customer", ["c_acctbal"]).map_batches(
                lambda df: pd.DataFrame(
                    {"k": np.zeros(len(df), "int64"),
                     "bal_s": cents(df["c_acctbal"])}
                ).loc[lambda g: g["bal_s"] > 0],
                batch_format="pandas"),
            ["k"], [("sum_s", "bal_s", "sum"), ("n_pos", None, "count")]
        ).to_pandas()
        sum_s, n_pos = int(pos["sum_s"].iloc[0]), int(pos["n_pos"].iloc[0])

        urgent = partial_final_agg(
            _read(sf_dir, "orders", ["o_custkey", "o_orderpriority"]
                  ).map_batches(
                lambda df: pd.DataFrame(
                    {"c_custkey": df.loc[df["o_orderpriority"] == "1-URGENT",
                                         "o_custkey"].to_numpy("int64"),
                     "one": 1}),
                batch_format="pandas"),
            ["c_custkey"], [("n_urgent", "one", "sum")])

        def rich(df: pd.DataFrame) -> pd.DataFrame:
            bal = cents(df["c_acctbal"])
            keep = bal * n_pos > sum_s
            return pd.DataFrame({
                "c_custkey": df["c_custkey"].to_numpy("int64")[keep],
                "nation": df["c_nationkey"].to_numpy("int64")[keep],
                "bal_s": bal[keep]})

        cust = _read(sf_dir, "customer",
                     ["c_custkey", "c_nationkey", "c_acctbal"]).map_batches(
            rich, batch_format="pandas")

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["n_urgent"].isna()]
            g = pd.DataFrame({"nation": df["nation"].to_numpy("int64"),
                              "bal_s": df["bal_s"].to_numpy("int64"),
                              "one": np.ones(len(df), "int64")})
            return g.groupby("nation", as_index=False).sum()

        joined = hash_join(
            cust, urgent, on="c_custkey", how="left", n_buckets=16,
            left_types={"c_custkey": pa.int64(), "nation": pa.int64(),
                        "bal_s": pa.int64()},
            right_types={"c_custkey": pa.int64(), "n_urgent": pa.int64()},
            bucket_post=per_bucket)
        return partial_final_agg(joined, ["nation"],
                                 [("n_cust", "one", "sum"),
                                  ("totacctbal_s", "bal_s", "sum")])

    q["tpch_q22"] = q_tpch_q22

    def q_tpch_q17(sf_dir: str):
        # TPC-H Q17 shape: revenue locked in "small" orders — lines whose
        # quantity is below 20% of their part's average. The per-part
        # (n, Σqty) stats reduce OFF the fact table, join back bucketed on
        # partkey, and the comparison is EXACT integers:
        # qty < 0.2·(Σ/n) ⇔ 5·qty_s·n < Σqty_s (both sides cents-scaled).
        # Per-bucket scalar partials; one tiny final reduce.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "l_partkey": df["l_partkey"].to_numpy("int64"),
                "qty_s": np.floor(df["l_quantity"].to_numpy(np.float64)
                                  * 100.0 + 0.5).astype("int64"),
                "ext_s": np.floor(df["l_extendedprice"].to_numpy(np.float64)
                                  * 100.0 + 0.5).astype("int64")})

        cols = ["l_partkey", "l_quantity", "l_extendedprice"]
        stats = partial_final_agg(
            _read(sf_dir, "lineitem", cols).map_batches(
                prep, batch_format="pandas"),
            ["l_partkey"], [("n_l", None, "count"),
                            ("sum_qty_s", "qty_s", "sum")])

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            small = (5 * df["qty_s"].to_numpy("int64")
                     * df["n_l"].to_numpy("int64")
                     < df["sum_qty_s"].to_numpy("int64"))
            ext = df["ext_s"].to_numpy("int64")[small]
            return pd.DataFrame({"k": np.zeros(1, "int64"),
                                 "n_small": np.array([small.sum()], "int64"),
                                 "total_part": np.array([ext.sum()], "int64")})

        joined = hash_join(
            _read(sf_dir, "lineitem", cols).map_batches(
                prep, batch_format="pandas"),
            stats, on="l_partkey", n_buckets=16,
            left_types={"l_partkey": pa.int64(), "qty_s": pa.int64(),
                        "ext_s": pa.int64()},
            right_types={"l_partkey": pa.int64(), "n_l": pa.int64(),
                         "sum_qty_s": pa.int64()},
            bucket_post=per_bucket)
        agg = partial_final_agg(joined, ["k"],
                                [("n_small", "n_small", "sum"),
                                 ("total_s", "total_part", "sum")])
        return agg.map_batches(
            lambda df: pd.DataFrame({
                "n_small": df["n_small"].astype("int64"),
                "total_s": df["total_s"].astype("int64"),
                "avg_yearly_s": (df["total_s"] // 7).astype("int64")}),
            batch_format="pandas")

    q["tpch_q17"] = q_tpch_q17

    def q_events_ab_lift(sf_dir: str):
        # experiment-analysis primitive: deterministic A/B assignment by
        # user_id parity, per-event-type mean lift of arm B over arm A in
        # exact ppm — conditional-indicator partials (the kg_star_query
        # trick), final ratio in PYTHON ints on the |event types|-sized
        # frame (sum·n·1e6 overflows int64 at scale; DuckDB mirrors in
        # HUGEINT then //).
        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "events", ["user_id", "event_type", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            b = (df["user_id"].to_numpy("int64") % 2 == 1)
            val = np.floor(df["value"].to_numpy(np.float64) * 100.0
                           + 0.5).astype("int64")
            return pd.DataFrame({
                "event_type": df["event_type"],
                "n_a": (~b).astype("int64"),
                "sum_a_s": np.where(b, 0, val),
                "n_b": b.astype("int64"),
                "sum_b_s": np.where(b, val, 0)})

        agg = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"), ["event_type"],
            [("n_a", "n_a", "sum"), ("sum_a_s", "sum_a_s", "sum"),
             ("n_b", "n_b", "sum"), ("sum_b_s", "sum_b_s", "sum")])

        def lift(df: pd.DataFrame) -> pd.DataFrame:
            out = []
            for na, sa, nb, sb in zip(df["n_a"], df["sum_a_s"],
                                      df["n_b"], df["sum_b_s"]):
                na, sa, nb, sb = int(na), int(sa), int(nb), int(sb)
                if sa > 0 and nb > 0:
                    out.append((sb * na * 1_000_000) // (sa * nb)
                               - 1_000_000)
                else:
                    out.append(0)
            return df.assign(lift_ppm=np.array(out, "int64"))

        return agg.map_batches(lift, batch_format="pandas")

    q["events_ab_lift"] = q_events_ab_lift

    def q_part_skyline(sf_dir: str):
        # skyline (Pareto frontier) query: parts not dominated on
        # (price min, size max). The frontier operator is ASSOCIATIVE —
        # frontier(frontier(A) ∪ frontier(B)) = frontier(A ∪ B) — so the
        # scale shape is block-local frontiers (each block emits only its
        # non-dominated rows) followed by ONE final frontier over the
        # union, whose input is bounded by Σ per-block frontier sizes,
        # never the table. Equal (price, size) rows do not dominate each
        # other (no strict inequality) — all copies survive.
        def frontier(df: pd.DataFrame) -> pd.DataFrame:
            df = df[["p_partkey", "p_retailprice", "p_size"]]
            if not len(df):
                return df
            gmax = df.groupby("p_retailprice")["p_size"].transform("max")
            cand = df[df["p_size"] == gmax]
            pu = (cand.drop_duplicates("p_retailprice")
                  [["p_retailprice", "p_size"]]
                  .sort_values("p_retailprice", kind="mergesort"))
            run = pu["p_size"].cummax().shift(1, fill_value=-1)
            keep = set(pu.loc[pu["p_size"] > run, "p_retailprice"])
            return cand[cand["p_retailprice"].isin(keep)]

        ds = _read(sf_dir, "part",
                   ["p_partkey", "p_retailprice", "p_size"]).map_batches(
            frontier, batch_format="pandas")
        return ds.map_batches(
            lambda df: df.assign(_k=np.zeros(len(df), "int64")),
            batch_format="pandas").groupby("_k").map_groups(
            lambda df: frontier(df.drop(columns=["_k"])),
            batch_format="pandas")

    q["part_skyline"] = q_part_skyline

    def q_lineitem_corr_matrix(sf_dir: str):
        # column-profiler completion: the pairwise Pearson matrix of the
        # four numeric lineitem measures from ONE scan of exact int64
        # moment partials (quantization contract per column: qty and
        # price on the unit grid, discount/tax ×100 — mirrored in SQL;
        # headroom: price² ≈ 1.2e10/row → ~7e8 rows in int64, re-scale
        # for bigger corpora). Final = the events_value_corr float tree
        # per pair on a 1-row frame.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.functions.strings import round_half_up

        cols = [("l_quantity", 1), ("l_extendedprice", 1),
                ("l_discount", 100), ("l_tax", 100)]
        names = [c for c, _ in cols]

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            xs = [np.floor(df[c].to_numpy(np.float64) * s + 0.5
                           ).astype("int64") for c, s in cols]
            row: dict = {"k": [0], "n": [np.int64(len(df))]}
            for i, x in enumerate(xs):
                row[f"s{i}"] = [x.sum()]
                row[f"ss{i}"] = [(x * x).sum()]
            for i in range(4):
                for j in range(i + 1, 4):
                    row[f"sp{i}{j}"] = [(xs[i] * xs[j]).sum()]
            return pd.DataFrame(row)

        spec = [("n", "n", "sum")]
        spec += [(f"s{i}", f"s{i}", "sum") for i in range(4)]
        spec += [(f"ss{i}", f"ss{i}", "sum") for i in range(4)]
        spec += [(f"sp{i}{j}", f"sp{i}{j}", "sum")
                 for i in range(4) for j in range(i + 1, 4)]
        agg = partial_final_agg(
            _read(sf_dir, "lineitem", names).map_batches(
                prep, batch_format="pandas"), ["k"], spec)

        def corr(df: pd.DataFrame) -> pd.DataFrame:
            r = df.iloc[0]
            n = float(int(r["n"]))
            out = []
            for i in range(4):
                for j in range(i + 1, 4):
                    sx, sy = float(int(r[f"s{i}"])), float(int(r[f"s{j}"]))
                    sxx, syy = float(int(r[f"ss{i}"])), float(int(r[f"ss{j}"]))
                    sxy = float(int(r[f"sp{i}{j}"]))
                    den = (n * sxx - sx * sx) * (n * syy - sy * sy)
                    c = (n * sxy - sx * sy) / np.sqrt(den) if den > 0 else 0.0
                    out.append((names[i], names[j],
                                float(round_half_up(c, 6))))
            return pd.DataFrame({
                "col_a": [o[0] for o in out],
                "col_b": [o[1] for o in out],
                "n": np.full(len(out), np.int64(n)),
                "corr_q": [o[2] for o in out]})

        return agg.map_batches(corr, batch_format="pandas")

    q["lineitem_corr_matrix"] = q_lineitem_corr_matrix

    def q_brand_return_rates(sf_dir: str):
        # brand-level return rates: per-partkey (lines, returned) reduce
        # off the fact table, ONE bucketed join against the part dimension
        # with per-brand partials emitted in-bucket, tiny brand reduce —
        # the conformed-dimension rollup at part cardinality (never a
        # broadcast of the part table)
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        li = _read(sf_dir, "lineitem", ["l_partkey", "l_returnflag"]
                   ).map_batches(
            lambda df: pd.DataFrame({
                "p_partkey": df["l_partkey"].to_numpy("int64"),
                "one": np.ones(len(df), "int64"),
                "ret": (df["l_returnflag"] == "R").to_numpy("int64")}),
            batch_format="pandas")
        per_part = partial_final_agg(
            li, ["p_partkey"], [("n_lines", "one", "sum"),
                                ("n_returned", "ret", "sum")])
        part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return df.groupby("p_brand", as_index=False)[
                ["n_lines", "n_returned"]].sum()

        joined = hash_join(
            per_part, part, on="p_partkey", n_buckets=16,
            left_types={"p_partkey": pa.int64(), "n_lines": pa.int64(),
                        "n_returned": pa.int64()},
            right_types={"p_partkey": pa.int64(), "p_brand": pa.string()},
            bucket_post=per_bucket)
        agg = partial_final_agg(
            joined, ["p_brand"], [("n_lines", "n_lines", "sum"),
                                  ("n_returned", "n_returned", "sum")])
        return agg.map_batches(
            lambda df: df.assign(
                return_ppm=df["n_returned"].to_numpy("int64") * 1_000_000
                // np.maximum(df["n_lines"].to_numpy("int64"), 1)),
            batch_format="pandas")

    q["brand_return_rates"] = q_brand_return_rates

    def semi_join_orders(sf_dir: str):
        # broadcast semi-join (WHERE EXISTS): orders of customers with
        # acctbal > 5000; the small side is a broadcast key set, the big
        # side streams — no shuffle
        from dygiepp_ray.state.broadcast import BroadcastSetFilter

        cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
        keys = cust.map_batches(
            lambda t: t.filter(pc.greater(t["c_acctbal"], pa.scalar(5000.0)))
                       .select(["c_custkey"]),
            batch_format="pyarrow",
        ).unique("c_custkey")
        keys_ref = ray.put(keys)
        return _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]).map_batches(
            BroadcastSetFilter,
            fn_constructor_kwargs={"keys_ref": keys_ref, "column": "o_custkey",
                                   "keep_if_member": True},
            batch_format="pyarrow", concurrency=(1, 4),
        )

    q["semi_join_orders"] = semi_join_orders

    def events_hopping_windows(sf_dir: str):
        # hopping-window aggregate (size 2h, hop 1h): each event lands in
        # exactly 2 windows — replicate in the map stage, then one salted
        # partial+final grouped aggregate
        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "events", ["ts", "value"])

        def explode(df: pd.DataFrame) -> pd.DataFrame:
            h = df["ts"].dt.floor("h")
            out = pd.DataFrame({
                "window_start": pd.concat(
                    [h, h - pd.Timedelta(hours=1)], ignore_index=True),
                "value": pd.concat([df["value"], df["value"]],
                                   ignore_index=True),
            })
            out["window_start"] = out["window_start"].dt.strftime(
                "%Y-%m-%d %H:%M:%S")
            return out

        agg = partial_final_agg(
            ds.map_batches(explode, batch_format="pandas"),
            ["window_start"],
            [("n_events", None, "count"), ("sum_value", "value", "sum")])
        return _round_cols(agg, {"sum_value": 2})

    q["events_hopping_windows"] = events_hopping_windows

    def bloom_anti_join_orders(sf_dir: str):
        # approximate anti-join via broadcast Bloom filter (fpr 1e-4):
        # the scale path for key sets too big to broadcast exactly
        from dygiepp_ray.state.broadcast import bloom_anti_join

        lkeys = _read(sf_dir, "lineitem", ["l_orderkey"]).unique("l_orderkey")
        return bloom_anti_join(_read(sf_dir, "orders", ["o_orderkey"]),
                               lkeys, "o_orderkey", fpr=1e-4)

    q["bloom_anti_join_orders"] = bloom_anti_join_orders

    def adaptive_topk_orders(sf_dir: str):
        from dygiepp_ray.stages.misc import adaptive_cutoff_filter

        ds = _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"])
        return adaptive_cutoff_filter(ds, "o_totalprice", threshold=100000.0, count=50)

    q["adaptive_topk_orders"] = adaptive_topk_orders

    def events_value_stats(sf_dir: str):
        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "events", ["event_type", "value"])
        agg = partial_final_agg(ds, ["event_type"],
                                [("min_value", "value", "min"),
                                 ("max_value", "value", "max"),
                                 ("avg_value", "value", "mean"),
                                 ("n", None, "count")])
        return _round_cols(agg, {"min_value": 4, "max_value": 4, "avg_value": 6})

    q["events_value_stats"] = events_value_stats

    def events_value_corr(sf_dir: str):
        # per-type Pearson corr(value, hour-of-day) from EXACT int64 moment
        # partials: value quantized at scale 1000 (max 560.21 -> x <= 5.6e5,
        # sum(x^2) <= 3e16 at sf0.1 — 100x headroom in int64), six sums per
        # (group, block) travel, the float expression tree over the exact
        # ints is mirrored verbatim in the SQL oracle
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.functions.strings import round_half_up

        ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
        SCALE = 1000

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            x = np.floor(df["value"].to_numpy(np.float64) * SCALE
                         + 0.5).astype("int64")
            y = df["ts"].dt.hour.to_numpy().astype("int64")
            return pd.DataFrame({"event_type": df["event_type"],
                                 "x": x, "y": y, "xx": x * x,
                                 "yy": y * y, "xy": x * y})

        agg = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"), ["event_type"],
            [("n", None, "count"), ("sx", "x", "sum"), ("sy", "y", "sum"),
             ("sxx", "xx", "sum"), ("syy", "yy", "sum"),
             ("sxy", "xy", "sum")])

        def corr(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n"].to_numpy("int64").astype("float64")
            sx = df["sx"].to_numpy("int64").astype("float64")
            sy = df["sy"].to_numpy("int64").astype("float64")
            sxx = df["sxx"].to_numpy("int64").astype("float64")
            syy = df["syy"].to_numpy("int64").astype("float64")
            sxy = df["sxy"].to_numpy("int64").astype("float64")
            den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
            with np.errstate(invalid="ignore", divide="ignore"):
                c = np.where(den2 > 0,
                             (n * sxy - sx * sy) / np.sqrt(den2), 0.0)
            return pd.DataFrame({
                "event_type": df["event_type"],
                "n": df["n"].to_numpy("int64"),
                "corr_vh": round_half_up(c, 6)})

        return agg.map_batches(corr, batch_format="pandas")

    q["events_value_corr"] = events_value_corr

    def events_funnel(sf_dir: str):
        # ordered conversion funnel view → click → purchase with
        # first-touch semantics (stage i binds to the earliest event
        # strictly after the user's first stage-(i-1) completion). Input is
        # pruned to the funnel's event types at the scan; users are
        # hash-bucketed (ONE shuffle) and the per-bucket kernel is a
        # vectorized groupby-min merge chain emitting 3-row partials.
        from dygiepp_ray.windows import funnel_counts

        ds = _read(sf_dir, "events", ["user_id", "event_type", "ts"])
        stages = ["view", "click", "purchase"]

        def keep(df: pd.DataFrame) -> pd.DataFrame:
            return df[df["event_type"].isin(stages)]

        return funnel_counts(ds.map_batches(keep, batch_format="pandas"),
                             stages)

    q["events_funnel"] = events_funnel

    def events_zscore_outliers(sf_dir: str):
        # per-type 3σ outliers from EXACT int64 moment partials: value
        # quantized at scale 100 (max 560.21 → x ≤ 5.7e4, Σx² ≈ n·1e7 —
        # int64 headroom to ~1e11 rows per type), flag comparison
        # (n·x − Σx)² > 9·(n·Σx² − Σx²) evaluated in float64 with the
        # identical expression tree in the SQL oracle. Two streaming
        # passes; the per-type stats broadcast is 5 rows.
        from dygiepp_ray.aggregates import group_zscore_outliers

        ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])
        SCALE = 100

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            x = np.floor(df["value"].to_numpy(np.float64) * SCALE
                         + 0.5).astype("int64")
            return pd.DataFrame({"event_id": df["event_id"].astype("int64"),
                                 "event_type": df["event_type"],
                                 "value_q": x})

        return group_zscore_outliers(
            ds.map_batches(prep, batch_format="pandas"), key="event_type",
            x_col="value_q", keep_cols=["event_id", "event_type", "value_q"],
            t_sigma=3)

    q["events_zscore_outliers"] = events_zscore_outliers

    def part_type_agg(sf_dir: str):
        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "part", ["p_type", "p_retailprice", "p_size"])
        agg = partial_final_agg(ds, ["p_type"],
                                [("avg_price", "p_retailprice", "mean"),
                                 ("max_size", "p_size", "max"),
                                 ("n_parts", None, "count")])
        return _round_cols(agg, {"avg_price": 6})

    q["part_type_agg"] = part_type_agg

    def doc_length_histogram(sf_dir: str):
        # histogram of whitespace-token counts in 10-token buckets
        ds = _read(sf_dir, "documents", ["doc_id", "text"])

        def bucketize(df: pd.DataFrame) -> pd.DataFrame:
            n = df["text"].str.split().str.len()
            return pd.DataFrame({"len_bucket": (n // 10) * 10})

        return grouped_count(
            ds.map_batches(bucketize, batch_format="pandas"),
            ["len_bucket"], out_name="n_docs",
        )

    q["doc_length_histogram"] = doc_length_histogram

    # ---- text analysis over documents

    def q_token_stats(sf_dir: str):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            token_stats, batch_format="pandas"
        )

    q["token_stats"] = q_token_stats

    def q_quality(sf_dir: str):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            quality_score, batch_format="pandas"
        )

    q["quality_score"] = q_quality

    def q_gopher_filter(sf_dir: str):
        # Gopher quality rules (Rae et al. 2021, SQL-mirrorable subset):
        # exact scaled-integer ratios + composite keep flag, pure per-row map
        from dygiepp_ray.stages.text import gopher_stats

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            gopher_stats, batch_format="pandas"
        )

    q["gopher_filter"] = q_gopher_filter

    def q_normalize(sf_dir: str):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            normalize_text, batch_format="pandas"
        )

    q["normalize_surface"] = q_normalize

    def q_canonicalize(sf_dir: str):
        from dygiepp_ray.functions.strings import canonicalize

        def fn(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"doc_id": df["doc_id"], "canon": df["text"].map(canonicalize)})

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            fn, batch_format="pandas"
        )

    q["canonicalize_docs"] = q_canonicalize

    def q_langid(sf_dir: str):
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            LangId, batch_format="pandas", concurrency=(1, 4)
        )

    q["lang_id"] = q_langid

    def q_langid_confusion(sf_dir: str):
        # language-ID quality audit: confusion matrix of the declared
        # `lang` column vs the n-gram-marker LangId prediction — one
        # bucketed join of the prediction stream against (doc_id, lang)
        # with in-bucket (lang, pred) partials (doc cardinality is
        # corpus-scale; never a broadcast)
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        pred = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            LangId, batch_format="pandas", concurrency=(1, 4)).map_batches(
            lambda df: df[["doc_id", "lang_pred"]], batch_format="pandas")
        truth = _read(sf_dir, "documents", ["doc_id", "lang"])

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            g = df.groupby(["lang", "lang_pred"], as_index=False).size()
            return g.rename(columns={"size": "n_p"})

        joined = hash_join(
            truth, pred, on="doc_id", n_buckets=16,
            left_types={"doc_id": pa.int64(), "lang": pa.string()},
            right_types={"doc_id": pa.int64(), "lang_pred": pa.string()},
            bucket_post=per_bucket)
        return partial_final_agg(joined, ["lang", "lang_pred"],
                                 [("n_docs", "n_p", "sum")])

    q["langid_confusion"] = q_langid_confusion

    def q_quality_length_corr(sf_dir: str):
        # curation diagnostic: per-source Pearson corr(doc length in
        # chars, 1e6-scaled quality score) from exact int64 moment
        # partials — the events_value_corr float tree verbatim. Overflow
        # headroom: y <= 1e6, x <= doc chars, sum(x*y) bounded ~5e15 at
        # sf0.1 (documented, ~1800x under int64).
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.functions.strings import round_half_up
        from dygiepp_ray.stages.text import quality_score

        ds = _read(sf_dir, "documents",
                   ["doc_id", "text", "source", "n_chars"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            qdf = quality_score(df[["doc_id", "text"]])
            x = df["n_chars"].to_numpy("int64")
            y = np.floor(qdf["quality"].to_numpy(np.float64) * 1e6
                         + 0.5).astype("int64")
            return pd.DataFrame({"source": df["source"].to_numpy(object),
                                 "x": x, "y": y, "xx": x * x,
                                 "yy": y * y, "xy": x * y})

        agg = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"), ["source"],
            [("n", None, "count"), ("sx", "x", "sum"), ("sy", "y", "sum"),
             ("sxx", "xx", "sum"), ("syy", "yy", "sum"),
             ("sxy", "xy", "sum")])

        def corr(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n"].to_numpy("int64").astype("float64")
            sx = df["sx"].to_numpy("int64").astype("float64")
            sy = df["sy"].to_numpy("int64").astype("float64")
            sxx = df["sxx"].to_numpy("int64").astype("float64")
            syy = df["syy"].to_numpy("int64").astype("float64")
            sxy = df["sxy"].to_numpy("int64").astype("float64")
            den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
            with np.errstate(invalid="ignore", divide="ignore"):
                c = np.where(den2 > 0,
                             (n * sxy - sx * sy) / np.sqrt(den2), 0.0)
            return pd.DataFrame({
                "source": df["source"],
                "n": df["n"].to_numpy("int64"),
                "corr_lq": round_half_up(c, 6)})

        return agg.map_batches(corr, batch_format="pandas")

    q["quality_length_corr"] = q_quality_length_corr

    def q_doc_readability(sf_dir: str):
        # Flesch-style readability as exact scaled ints (curation quality
        # signal; the [.!?]+ / [aeiouy]+ run-count contract is mirrored
        # verbatim in the SQL oracle). Stateless vectorized map — no
        # shuffle at any scale.
        from dygiepp_ray.stages.text import readability

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            readability, batch_format="pandas")

    q["doc_readability"] = q_doc_readability

    def q_doc_ttr(sf_dir: str):
        # per-doc type-token ratio (lexical diversity; low TTR flags
        # boilerplate). Lowercased whitespace tokens, exact ppm ints.
        from dygiepp_ray.stages.text import type_token_ratio

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            type_token_ratio, batch_format="pandas")

    q["doc_ttr"] = q_doc_ttr

    def q_hapax_rate(sf_dir: str):
        # per-source hapax-legomena share (vocabulary-health signal: a
        # high hapax share flags OCR noise / mojibake, a very low one
        # flags template text). One tokenize scan → salted (source, term)
        # count (vocab × sources bounded) → per-source indicator reduce;
        # exact ppm. Lowercased whitespace tokens (the doc_ttr contract).
        from dygiepp_ray.aggregates import partial_final_agg

        def explode(df: pd.DataFrame) -> pd.DataFrame:
            toks = df["text"].str.lower().str.split()
            lens = toks.str.len().fillna(0).astype(int).to_numpy()
            return pd.DataFrame({
                "source": np.repeat(df["source"].to_numpy(object), lens),
                "term": np.concatenate(
                    [np.asarray(t, dtype=object) for t in toks]
                ) if lens.sum() else np.array([], object)})

        counts = grouped_count(
            _read(sf_dir, "documents", ["source", "text"]).map_batches(
                explode, batch_format="pandas"),
            ["source", "term"], out_name="n", salt_buckets=8)

        def indicators(df: pd.DataFrame) -> pd.DataFrame:
            one = (df["n"].to_numpy("int64") == 1).astype("int64")
            return pd.DataFrame({"source": df["source"],
                                 "n_terms": np.ones(len(df), "int64"),
                                 "n_hapax": one,
                                 "n_tokens": df["n"].to_numpy("int64")})

        agg = partial_final_agg(
            counts.map_batches(indicators, batch_format="pandas"),
            ["source"], [("n_terms", "n_terms", "sum"),
                         ("n_hapax", "n_hapax", "sum"),
                         ("n_tokens", "n_tokens", "sum")])
        return agg.map_batches(
            lambda df: df.assign(
                hapax_ppm=(df["n_hapax"].astype("int64") * 1_000_000)
                // df["n_terms"].astype("int64").clip(lower=1)),
            batch_format="pandas")

    q["hapax_rate"] = q_hapax_rate

    def q_char_entropy(sf_dir: str):
        # per-doc character-distribution Shannon entropy as exact floored
        # nano-log integers (repetitive-text curation signal; the
        # decode-free cousin of compression_ratio). Stateless map — no
        # shuffle at any scale.
        from dygiepp_ray.stages.text import char_entropy

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            char_entropy, batch_format="pandas")

    q["char_entropy"] = q_char_entropy

    def q_events_attribution(sf_dir: str):
        # marketing-style LAST-TOUCH attribution: each purchase binds to
        # the user's most recent preceding non-purchase event within 7
        # days (strict (ts, event_id) order), else 'none'. One coarse
        # user-bucket shuffle, cython grouped scans in-bucket, per-type
        # partials out, tiny final sum.
        from dygiepp_ray.windows import last_touch_attribution

        ds = _read(sf_dir, "events",
                   ["event_id", "user_id", "event_type", "ts", "value"])
        return last_touch_attribution(ds, convert_type="purchase",
                                      window_us=7 * 86400 * 1_000_000)

    q["events_attribution"] = q_events_attribution

    def q_events_flow_trigrams(sf_dir: str):
        # process-mining refinement of events_transitions: the top-10
        # length-3 event-type flows over per-user (ts, event_id) order.
        # One user-bucket shuffle; the in-bucket kernel is pure numpy
        # shifts over the sorted frame (a trigram is valid iff all three
        # rows share the user); per-bucket partial counts, tiny final
        # sum, block-prune + 10-row sort with full lexicographic tiebreak.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import _bucketed

        ds = _read(sf_dir, "events", ["user_id", "event_type", "ts",
                                      "event_id"])

        def kernel(df: pd.DataFrame, ks: list) -> pd.DataFrame:
            u = df["user_id"].to_numpy()
            t = df["event_type"].to_numpy(object)
            if len(df) < 3:
                return pd.DataFrame({"t1": pd.Series(dtype=object),
                                     "t2": pd.Series(dtype=object),
                                     "t3": pd.Series(dtype=object),
                                     "n_part": pd.Series(dtype="int64")})
            ok = (u[:-2] == u[1:-1]) & (u[:-2] == u[2:])
            g = pd.DataFrame({"t1": t[:-2][ok], "t2": t[1:-1][ok],
                              "t3": t[2:][ok]})
            g["one"] = np.ones(len(g), "int64")
            return g.groupby(["t1", "t2", "t3"], as_index=False)["one"].sum(
            ).rename(columns={"one": "n_part"})

        partials = _bucketed(ds, ["user_id"], ["ts", "event_id"], True,
                             kernel, 64)
        agg = partial_final_agg(partials, ["t1", "t2", "t3"],
                                [("n", "n_part", "sum")])

        def prune(df: pd.DataFrame) -> pd.DataFrame:
            return df.sort_values(["n", "t1", "t2", "t3"],
                                  ascending=[False, True, True, True]
                                  ).head(10)

        return (agg.map_batches(prune, batch_format="pandas")
                .sort(["n", "t1", "t2", "t3"],
                      descending=[True, False, False, False]).limit(10))

    q["events_flow_trigrams"] = q_events_flow_trigrams

    def q_orders_streaks(sf_dir: str):
        # gaps-and-islands: per customer, streaks of CONSECUTIVE calendar
        # months with >= 1 order (integer month index; the mi − rn island
        # key). Distinct (cust, month) reduce first, then one customer-
        # bucket shuffle; every customer lives wholly in its bucket, so
        # bucket outputs are final rows — no second aggregate.
        from dygiepp_ray.windows import _bucketed

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            mi = (df["o_orderdate"].dt.year * 12
                  + df["o_orderdate"].dt.month - 1).astype("int64")
            return pd.DataFrame({"o_custkey": df["o_custkey"].astype("int64"),
                                 "mi": mi})

        months = grouped_count(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate"]
                  ).map_batches(prep, batch_format="pandas"),
            ["o_custkey", "mi"], out_name="_c", salt_buckets=4
        ).select_columns(["o_custkey", "mi"])

        def kernel(df: pd.DataFrame, ks: list) -> pd.DataFrame:
            rn = df.groupby("o_custkey", sort=False).cumcount()
            grp = df["mi"].to_numpy("int64") - rn.to_numpy("int64")
            g = pd.DataFrame({"o_custkey": df["o_custkey"].to_numpy("int64"),
                              "grp": grp,
                              "one": np.ones(len(df), "int64")})
            isl = g.groupby(["o_custkey", "grp"], as_index=False)["one"].sum()
            out = isl.groupby("o_custkey", as_index=False).agg(
                n_active_months=("one", "sum"), n_streaks=("one", "count"),
                longest_streak=("one", "max"))
            for c in ("n_active_months", "n_streaks", "longest_streak"):
                out[c] = out[c].astype("int64")
            return out

        return _bucketed(months, ["o_custkey"], ["mi"], True, kernel, 64)

    q["orders_streaks"] = q_orders_streaks

    def q_events_cusum(sf_dir: str):
        # change-point detection per event type: max CUSUM drift
        # |n·P_i − C_i·S| over the time-ordered prefix (evaluated at each
        # DISTINCT timestamp after per-ts aggregation — the documented
        # boundary contract; n·P − C·S avoids the non-integer mean
        # entirely). Two banded global prefix scans (values + counts) on
        # the (type, ts) tie-aggregated table, per-type totals broadcast
        # as exact int pairs. Headroom: n²·x̄ ≤ int64 for ~1e7 rows/type
        # at cents scale (re-scale beyond).
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import ordered_prefix_sum

        ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            ts_us = ((df["ts"] - pd.Timestamp(0))
                     // pd.Timedelta(1, "us")).to_numpy("int64")
            x = np.floor(df["value"].to_numpy(np.float64) * 100.0
                         + 0.5).astype("int64")
            return pd.DataFrame({"event_type": df["event_type"],
                                 "ts_us": ts_us, "x": x,
                                 "c": np.ones(len(df), "int64")})

        agg = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"),
            ["event_type", "ts_us"], [("x", "x", "sum"), ("c", "c", "sum")])
        p1 = ordered_prefix_sum(agg, "event_type", "ts_us", "x",
                                out_col="px")
        p2 = ordered_prefix_sum(p1, "event_type", "ts_us", "c",
                                out_col="pc")

        tot = partial_final_agg(agg, ["event_type"],
                                [("S", "x", "sum"), ("n", "c", "sum")]
                                ).to_pandas()
        tot_ref = ray.put({r.event_type: (int(r.n), int(r.S))
                           for r in tot.itertuples()})

        def drift(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(tot_ref)
            n = df["event_type"].map(lambda t: m[t][0]).to_numpy("int64")
            S = df["event_type"].map(lambda t: m[t][1]).to_numpy("int64")
            d = np.abs(n * df["px"].to_numpy("int64")
                       - df["pc"].to_numpy("int64") * S)
            return pd.DataFrame({"event_type": df["event_type"],
                                 "n_events": n, "total_s": S, "d": d})

        out = partial_final_agg(
            p2.map_batches(drift, batch_format="pandas"),
            ["event_type"], [("n_events", "n_events", "max"),
                             ("total_s", "total_s", "max"),
                             ("max_drift", "d", "max")])
        return out

    q["events_cusum"] = q_events_cusum

    def q_events_stationary(sf_dir: str):
        # long-run behavioral mix: the stationary distribution of the
        # per-user event-type Markov chain. Transition counts reduce to
        # a |types|² table (one user-bucket shuffle, numpy shift kernel);
        # the power iteration runs on the driver over that TINY matrix in
        # integer fixed point (π'_j = Σ_i π_i·n_ij // n_i — floored
        # per-term, deterministic; 60 rounds, scale 1e12). Rows with no
        # outgoing transitions redistribute uniformly (dangling contract,
        # as in PageRank). Oracle = independent dict re-walk.
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import _bucketed

        _write_oracle(sf_dir, "events_stationary",
                      lambda: _o.expected_events_stationary(sf_dir))
        ds = _read(sf_dir, "events", ["user_id", "event_type", "ts",
                                      "event_id"])

        def kernel(df: pd.DataFrame, ks: list) -> pd.DataFrame:
            u = df["user_id"].to_numpy()
            t = df["event_type"].to_numpy(object)
            if len(df) < 2:
                return pd.DataFrame({"t1": pd.Series(dtype=object),
                                     "t2": pd.Series(dtype=object),
                                     "n_part": pd.Series(dtype="int64")})
            ok = u[:-1] == u[1:]
            g = pd.DataFrame({"t1": t[:-1][ok], "t2": t[1:][ok]})
            g["one"] = np.ones(len(g), "int64")
            return g.groupby(["t1", "t2"], as_index=False)["one"].sum(
            ).rename(columns={"one": "n_part"})

        trans = partial_final_agg(
            _bucketed(ds, ["user_id"], ["ts", "event_id"], True, kernel,
                      64),
            ["t1", "t2"], [("n", "n_part", "sum")]).to_pandas()

        types = sorted(set(trans["t1"]) | set(trans["t2"]))
        ix = {t: i for i, t in enumerate(types)}
        k = len(types)
        n_ij = np.zeros((k, k), dtype=np.int64)
        for r in trans.itertuples():
            n_ij[ix[r.t1], ix[r.t2]] = int(r.n)
        row_n = n_ij.sum(axis=1)
        SCALE = 10**12
        pi = [SCALE // k + (1 if i < SCALE % k else 0) for i in range(k)]
        for _ in range(60):
            nxt = [0] * k
            for i in range(k):
                if row_n[i] == 0:
                    for j in range(k):
                        nxt[j] += pi[i] // k
                    continue
                for j in range(k):
                    if n_ij[i, j]:
                        nxt[j] += pi[i] * int(n_ij[i, j]) // int(row_n[i])
            pi = nxt
        return pd.DataFrame({
            "event_type": types,
            "pi_ppm": np.array([p // 10**6 for p in pi], "int64")})

    q["events_stationary"] = q_events_stationary

    def q_orders_hhi(sf_dir: str):
        # market-concentration audit: Herfindahl–Hirschman index of
        # revenue by customer. Per-customer revenue reduce, then
        # Σ share² as the exact integer ((Σ rev_k²)·1e6) // (Σ rev_k)² —
        # revenue quantized to WHOLE currency units by contract (cents²
        # would overflow the distributed Σ rev² at int64; the k-unit is
        # part of the operator contract and the SQL mirror). Final ratio
        # in Python ints on the 1-row frame.
        from dygiepp_ray.aggregates import partial_final_agg

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_custkey": df["o_custkey"].to_numpy("int64"),
                "rev_u": np.floor(df["o_totalprice"].to_numpy(np.float64)
                                  + 0.5).astype("int64")})

        per_cust = partial_final_agg(
            _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]
                  ).map_batches(prep, batch_format="pandas"),
            ["o_custkey"], [("rev_u", "rev_u", "sum")])

        def sq(df: pd.DataFrame) -> pd.DataFrame:
            r = df["rev_u"].to_numpy("int64")
            return pd.DataFrame({"k": np.zeros(1, "int64"),
                                 "n_cust": np.array([len(df)], "int64"),
                                 "sum_u": np.array([r.sum()], "int64"),
                                 "sum_sq": np.array([(r * r).sum()],
                                                    "int64")})

        tot = partial_final_agg(
            per_cust.map_batches(sq, batch_format="pandas"), ["k"],
            [("n_cust", "n_cust", "sum"), ("sum_u", "sum_u", "sum"),
             ("sum_sq", "sum_sq", "sum")])

        def hhi(df: pd.DataFrame) -> pd.DataFrame:
            n = int(df["n_cust"].iloc[0])
            s = int(df["sum_u"].iloc[0])
            sq_ = int(df["sum_sq"].iloc[0])
            h = (sq_ * 1_000_000) // (s * s) if s else 0
            return pd.DataFrame({
                "n_cust": np.array([n], "int64"),
                "total_rev_u": np.array([s], "int64"),
                "hhi_ppm": np.array([h], "int64")})

        return tot.map_batches(hhi, batch_format="pandas")

    q["orders_hhi"] = q_orders_hhi

    def q_events_autocorr(sf_dir: str):
        # seasonality audit: lag-24h autocorrelation of the DENSE hourly
        # count series per event type (zero-filled gaps; pairs (t, t+24)
        # over [min, max−24]). The (type, hour) count reduce is
        # distributed; the dense fill + exact int64 moments run on the
        # driver because the series is TIME-bounded, not corpus-bounded
        # (hours in the observation window — the events_user_growth
        # driver-cumsum contract). Pearson r via the events_value_corr
        # float tree, 6-dp rounded.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.functions.strings import round_half_up

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            hr = ((df["ts"] - pd.Timestamp(0))
                  // pd.Timedelta(1, "h")).to_numpy("int64")
            return pd.DataFrame({"event_type": df["event_type"],
                                 "hr": hr,
                                 "one": np.ones(len(df), "int64")})

        counts = partial_final_agg(
            _read(sf_dir, "events", ["event_type", "ts"]).map_batches(
                prep, batch_format="pandas"),
            ["event_type", "hr"], [("n", "one", "sum")]).to_pandas()

        LAG = 24
        rows = []
        for et, g in counts.groupby("event_type"):
            lo, hi = int(g["hr"].min()), int(g["hr"].max())
            series = np.zeros(hi - lo + 1, dtype=np.int64)
            series[g["hr"].to_numpy("int64") - lo] = g["n"].to_numpy("int64")
            if len(series) <= LAG:
                rows.append((et, 0, 0.0))
                continue
            x = series[:-LAG]
            y = series[LAG:]
            n = len(x)
            sx, sy = int(x.sum()), int(y.sum())
            sxx = int((x * x).sum())
            syy = int((y * y).sum())
            sxy = int((x * y).sum())
            den = (float(n) * sxx - float(sx) * sx) \
                * (float(n) * syy - float(sy) * sy)
            r = ((float(n) * sxy - float(sx) * sy) / np.sqrt(den)
                 if den > 0 else 0.0)
            rows.append((et, n, float(round_half_up(r, 6))))
        return pd.DataFrame({
            "event_type": [r[0] for r in rows],
            "n_pairs": np.array([r[1] for r in rows], "int64"),
            "autocorr_24h": [r[2] for r in rows]})

    q["events_autocorr"] = q_events_autocorr

    def q_events_type_overlap(sf_dir: str):
        # audience-overlap matrix: distinct-user Jaccard between event
        # types. The (type, user) distinct reduce shrinks to audience
        # size; ONE user-bucket pass emits per-(type-pair) intersection
        # partials (each user's type set is tiny — |types|² max pairs per
        # user); per-type totals broadcast; exact ppm.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import _bucketed

        tu = grouped_count(
            _read(sf_dir, "events", ["event_type", "user_id"]),
            ["event_type", "user_id"], out_name="_c", salt_buckets=4
        ).select_columns(["event_type", "user_id"]).materialize()

        sizes = grouped_count(tu.select_columns(["event_type"]),
                              ["event_type"], out_name="n_users"
                              ).to_pandas()
        size_ref = ray.put(dict(zip(sizes["event_type"],
                                    sizes["n_users"].astype(int))))

        def kernel(df: pd.DataFrame, ks: list) -> pd.DataFrame:
            rows = []
            for _u, g in df.groupby("user_id", sort=False):
                ts = sorted(g["event_type"])
                for i in range(len(ts)):
                    for j in range(i + 1, len(ts)):
                        rows.append((ts[i], ts[j]))
            if not rows:
                return pd.DataFrame({"t1": pd.Series(dtype=object),
                                     "t2": pd.Series(dtype=object),
                                     "n_part": pd.Series(dtype="int64")})
            g = pd.DataFrame(rows, columns=["t1", "t2"])
            g["one"] = np.ones(len(g), "int64")
            return g.groupby(["t1", "t2"], as_index=False)["one"].sum(
            ).rename(columns={"one": "n_part"})

        inter = partial_final_agg(
            _bucketed(tu, ["user_id"], ["event_type"], True, kernel, 64),
            ["t1", "t2"], [("n_common", "n_part", "sum")])

        def jac(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(size_ref)
            na = df["t1"].map(m).to_numpy("int64")
            nb = df["t2"].map(m).to_numpy("int64")
            c = df["n_common"].to_numpy("int64")
            return df.assign(
                n_a=na, n_b=nb,
                jaccard_ppm=c * 1_000_000 // (na + nb - c))

        return inter.map_batches(jac, batch_format="pandas")

    q["events_type_overlap"] = q_events_type_overlap

    def q_events_stickiness(sf_dir: str):
        # DAU/MAU stickiness per calendar month: Σ daily-active over the
        # month ÷ (days-with-activity × monthly-active), exact ppm. Two
        # shrinking distinct reduces — (user, day) first, then both the
        # per-(month, day) DAU and per-month MAU fold off it; no second
        # corpus scan.
        from dygiepp_ray.aggregates import partial_final_agg

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            day = ((df["ts"] - pd.Timestamp(0))
                   // pd.Timedelta(1, "D")).to_numpy("int64")
            month = (df["ts"].dt.year * 100
                     + df["ts"].dt.month).to_numpy("int64")
            return pd.DataFrame({"user_id": df["user_id"
                                               ].to_numpy("int64"),
                                 "day": day, "month": month})

        ud = grouped_count(
            _read(sf_dir, "events", ["user_id", "ts"]).map_batches(
                prep, batch_format="pandas"),
            ["user_id", "day", "month"], out_name="_c", salt_buckets=4
        ).select_columns(["user_id", "day", "month"]).materialize()

        dau = grouped_count(ud.select_columns(["month", "day"]),
                            ["month", "day"], out_name="dau")
        mu = grouped_count(ud.select_columns(["month", "user_id"]),
                           ["month", "user_id"], out_name="_c"
                           ).select_columns(["month"])
        mau = grouped_count(mu, ["month"], out_name="mau").to_pandas()
        mau_ref = ray.put(dict(zip(mau["month"].astype(int),
                                   mau["mau"].astype(int))))

        agg = partial_final_agg(
            dau.map_batches(
                lambda df: pd.DataFrame({
                    "month": df["month"].to_numpy("int64"),
                    "sum_dau": df["dau"].to_numpy("int64"),
                    "n_days": np.ones(len(df), "int64")}),
                batch_format="pandas"),
            ["month"], [("sum_dau", "sum_dau", "sum"),
                        ("n_days", "n_days", "sum")])

        def final(df: pd.DataFrame) -> pd.DataFrame:
            m = ray.get(mau_ref)
            mo = df["month"].to_numpy("int64")
            ma = np.array([m[int(x)] for x in mo], "int64")
            sd = df["sum_dau"].to_numpy("int64")
            nd = df["n_days"].to_numpy("int64")
            return pd.DataFrame({
                "month": mo, "mau": ma, "n_days": nd, "sum_dau": sd,
                "stickiness_ppm": sd * 1_000_000 // (nd * ma)})

        return agg.map_batches(final, batch_format="pandas")

    q["events_stickiness"] = q_events_stickiness

    def q_orders_rapid_repeat(sf_dir: str):
        # rapid-repeat detector (ops/fraud QA: possible double
        # submissions): same-customer order pairs placed ≤ 1 day apart
        # (an exact-price match is DEGENERATE on this synthetic corpus —
        # near-continuous totals — so the time-proximity contract is the
        # operative one). One customer-bucket pass; per-customer groups
        # are order-count-sized, pairs naturally sparse.
        from dygiepp_ray.windows import _bucketed

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_custkey": df["o_custkey"].to_numpy("int64"),
                "day": ((df["o_orderdate"] - pd.Timestamp(0))
                        // pd.Timedelta(1, "D")).to_numpy("int64"),
                "o_orderkey": df["o_orderkey"].to_numpy("int64")})

        ds = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]
                   ).map_batches(prep, batch_format="pandas")

        def kernel(df: pd.DataFrame, ks: list) -> pd.DataFrame:
            rows = []
            for _c, g in df.groupby("o_custkey", sort=False):
                if len(g) < 2:
                    continue
                d = g["day"].to_numpy("int64")
                k = g["o_orderkey"].to_numpy("int64")
                o = np.argsort(k, kind="stable")
                d, k = d[o], k[o]
                ii, jj = np.triu_indices(len(k), 1)
                ok = np.abs(d[ii] - d[jj]) <= 1
                for a, b, dd in zip(k[ii[ok]], k[jj[ok]],
                                    np.abs(d[ii[ok]] - d[jj[ok]])):
                    rows.append((int(_c), int(a), int(b), int(dd)))
            if not rows:
                return pd.DataFrame({
                    "o_custkey": pd.Series(dtype="int64"),
                    "orderkey_a": pd.Series(dtype="int64"),
                    "orderkey_b": pd.Series(dtype="int64"),
                    "days_apart": pd.Series(dtype="int64")})
            return pd.DataFrame(rows, columns=[
                "o_custkey", "orderkey_a", "orderkey_b", "days_apart"])

        return _bucketed(ds, ["o_custkey"], ["o_orderkey"], True,
                         kernel, 64)

    q["orders_rapid_repeat"] = q_orders_rapid_repeat

    def q_tpch_q15(sf_dir: str):
        # TPC-H Q15 shape: top supplier(s) by Q1-1996 revenue — per-
        # suppkey exact-int revenue reduce off the fact table, global max
        # as ONE tiny aggregate broadcast back as a scalar (ties: all
        # winners), supplier dimension attached by broadcast dict (the
        # small dimension, like tpch_q7's supplier side).
        from dygiepp_ray.aggregates import partial_final_agg

        lo, hi = pd.Timestamp("1996-01-01"), pd.Timestamp("1996-04-01")

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            df = df[(df["l_shipdate"] >= lo) & (df["l_shipdate"] < hi)]
            ext = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                           * 100.0 + 0.5).astype("int64")
            disc = np.floor(df["l_discount"].to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")
            return pd.DataFrame({"s_suppkey": df["l_suppkey"
                                                 ].to_numpy("int64"),
                                 "rev_s": ext * (100 - disc)})

        rev = partial_final_agg(
            _read(sf_dir, "lineitem",
                  ["l_suppkey", "l_extendedprice", "l_discount",
                   "l_shipdate"]).map_batches(prep, batch_format="pandas"),
            ["s_suppkey"], [("total_rev_s", "rev_s", "sum")]).materialize()
        mx = int(rev.aggregate(Max("total_rev_s"))["max(total_rev_s)"])
        supp = _read(sf_dir, "supplier", ["s_suppkey", "s_name"]
                     ).to_pandas()
        name_ref = ray.put(dict(zip(supp["s_suppkey"].astype(int),
                                    supp["s_name"])))

        def winners(df: pd.DataFrame) -> pd.DataFrame:
            df = df[df["total_rev_s"] == mx].copy()
            df["s_name"] = df["s_suppkey"].map(ray.get(name_ref))
            return df[["s_suppkey", "s_name", "total_rev_s"]]

        return rev.map_batches(winners, batch_format="pandas")

    q["tpch_q15"] = q_tpch_q15

    def q_user_features(sf_dir: str):
        # ML feature engineering: per-user behavioral feature vector from
        # the event stream (per-type counts, monetary total, first/last
        # seen, distinct active days) in TWO shrinking reduces: the
        # (user, day) tie-aggregation first, then the per-user combine
        # where n_active_days = the row count of the first reduce — no
        # separate distinct pass.
        from dygiepp_ray.aggregates import partial_final_agg

        ds = _read(sf_dir, "events",
                   ["user_id", "event_type", "ts", "value"])
        types = ["view", "click", "purchase", "signup", "error"]

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            ts_us = ((df["ts"] - pd.Timestamp(0))
                     // pd.Timedelta(1, "us")).to_numpy("int64")
            out = {"user_id": df["user_id"].to_numpy("int64"),
                   "day": ts_us // 86_400_000_000,
                   "value_s": np.floor(df["value"].to_numpy(np.float64)
                                       * 100.0 + 0.5).astype("int64"),
                   "first_us": ts_us, "last_us": ts_us}
            et = df["event_type"].to_numpy(object)
            for t in types:
                out[f"n_{t}"] = (et == t).astype("int64")
            return pd.DataFrame(out)

        per_day = partial_final_agg(
            ds.map_batches(prep, batch_format="pandas"),
            ["user_id", "day"],
            [("value_s", "value_s", "sum"),
             ("first_us", "first_us", "min"), ("last_us", "last_us", "max")]
            + [(f"n_{t}", f"n_{t}", "sum") for t in types])

        def day_row(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            df["one_day"] = np.ones(len(df), "int64")
            return df.drop(columns=["day"])

        return partial_final_agg(
            per_day.map_batches(day_row, batch_format="pandas"),
            ["user_id"],
            [("n_active_days", "one_day", "sum"),
             ("total_value_s", "value_s", "sum"),
             ("first_us", "first_us", "min"), ("last_us", "last_us", "max")]
            + [(f"n_{t}", f"n_{t}", "sum") for t in types])

    q["user_features"] = q_user_features

    def q_data_quality_checks(sf_dir: str):
        # dbt-test-style constraint validation suite: range / enum checks
        # as pure indicator scans, the referential check (every lineitem
        # points at an existing order) as a bucketed LEFT-join marker
        # count — ONE row per constraint with its violation count, so the
        # report is tiny at any corpus size. Planted expectations: the
        # synthetic tables are clean, so nonzero rows flag real drift.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        def li_checks(df: pd.DataFrame) -> pd.DataFrame:
            disc = df["l_discount"].to_numpy(np.float64)
            qty = df["l_quantity"].to_numpy(np.float64)
            return pd.DataFrame({
                "check_name": ["discount_range", "quantity_range"],
                "n_violations": [
                    int(((disc < 0.0) | (disc > 0.1)).sum()),
                    int(((qty < 1.0) | (qty > 50.0)).sum())],
                "n_checked": [len(df), len(df)]})

        li = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_discount", "l_quantity"])
        range_part = li.map_batches(li_checks, batch_format="pandas")

        def ev_checks(df: pd.DataFrame) -> pd.DataFrame:
            val = df["value"].to_numpy(np.float64)
            et = df["event_type"].to_numpy(object)
            known = {"view", "click", "purchase", "signup", "error"}
            return pd.DataFrame({
                "check_name": ["value_nonneg", "event_type_enum"],
                "n_violations": [
                    int((val < 0.0).sum()),
                    int(sum(e not in known for e in et))],
                "n_checked": [len(df), len(df)]})

        ev = _read(sf_dir, "events", ["event_type", "value"]).map_batches(
            ev_checks, batch_format="pandas")

        okeys = _read(sf_dir, "orders", ["o_orderkey"]).map_batches(
            lambda df: pd.DataFrame({
                "l_orderkey": df["o_orderkey"].to_numpy("int64"),
                "_m": np.ones(len(df), "int64")}),
            batch_format="pandas")

        def ref_bucket(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "check_name": ["orderkey_referential"],
                "n_violations": [int(df["_m"].isna().sum())],
                "n_checked": [len(df)]})

        ref = hash_join(
            li.map_batches(lambda df: df[["l_orderkey"]],
                           batch_format="pandas"),
            okeys, on="l_orderkey", how="left", n_buckets=16,
            left_types={"l_orderkey": pa.int64()},
            right_types={"l_orderkey": pa.int64(), "_m": pa.int64()},
            bucket_post=ref_bucket)

        return partial_final_agg(
            range_part.union(ev).union(ref), ["check_name"],
            [("n_violations", "n_violations", "sum"),
             ("n_checked", "n_checked", "sum")])

    q["data_quality_checks"] = q_data_quality_checks

    def q_compaction_plan(sf_dir: str):
        # lakehouse OPTIMIZE-style small-file compaction planner over the
        # REAL shard files of the synthetic corpus: first-fit-decreasing
        # bin packing into 24 KiB target groups. The file MANIFEST is
        # driver-scale BY NATURE (file count, not row count — the same
        # contract as build_kg's lineage manifests), so the deterministic
        # FFD runs on the driver; the plan itself is what downstream
        # rewrite tasks would fan out over. Oracle = independent FFD
        # re-walk written as parquet.
        from dygiepp_ray import oracle as _o

        corpus = _synth_corpus_dir(sf_dir)
        _write_oracle(sf_dir, "compaction_plan",
                      lambda: _o.expected_compaction_plan(corpus))
        import glob as _glob

        files = sorted(_glob.glob(os.path.join(corpus, "*.parquet")))
        man = pd.DataFrame({
            "path": [os.path.relpath(f, corpus) for f in files],
            "bytes": [os.path.getsize(f) for f in files]})
        TARGET = 24 * 1024
        man = man.sort_values(["bytes", "path"],
                              ascending=[False, True]).reset_index(drop=True)
        groups: list[int] = []
        fill: list[int] = []
        gid = []
        for b in man["bytes"]:
            placed = -1
            for i, f in enumerate(fill):
                if f + b <= TARGET:
                    placed = i
                    break
            if placed < 0:
                fill.append(int(b))
                placed = len(fill) - 1
            else:
                fill[placed] += int(b)
            gid.append(placed)
        man["group_id"] = np.array(gid, "int64")
        man["bytes"] = man["bytes"].astype("int64")
        gb = man.groupby("group_id")["bytes"].transform("sum")
        man["group_bytes"] = gb.astype("int64")
        return ray.data.from_pandas(
            man[["path", "bytes", "group_id", "group_bytes"]])

    q["compaction_plan"] = q_compaction_plan

    def q_user_delete_cascade(sf_dir: str):
        # GDPR-style delete-cascade audit: for the deletion cohort
        # (custkey/user_id ≡ 0 mod 97), count the rows each table would
        # lose — customer directly, orders via custkey, lineitem via the
        # orders CASCADE (bucketed join with in-bucket count partials),
        # events via user_id. The report is table-count-bounded.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join

        def row(name: str, n: int) -> pd.DataFrame:
            return pd.DataFrame({"table_name": [name],
                                 "n_rows": np.array([n], "int64")})

        n_cust = _read(sf_dir, "customer", ["c_custkey"]).map_batches(
            lambda df: row("customer",
                           int((df["c_custkey"] % 97 == 0).sum())),
            batch_format="pandas")

        orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"]
                       ).map_batches(
            lambda df: df[df["o_custkey"] % 97 == 0],
            batch_format="pandas").materialize()
        n_orders = orders.map_batches(
            lambda df: row("orders", len(df)), batch_format="pandas")

        okeys = orders.map_batches(
            lambda df: pd.DataFrame({
                "l_orderkey": df["o_orderkey"].to_numpy("int64"),
                "_m": np.ones(len(df), "int64")}),
            batch_format="pandas")
        n_li = hash_join(
            _read(sf_dir, "lineitem", ["l_orderkey"]), okeys,
            on="l_orderkey", how="left", n_buckets=16,
            left_types={"l_orderkey": pa.int64()},
            right_types={"l_orderkey": pa.int64(), "_m": pa.int64()},
            bucket_post=lambda df: row("lineitem",
                                       int(df["_m"].notna().sum())))

        n_ev = _read(sf_dir, "events", ["user_id"]).map_batches(
            lambda df: row("events", int((df["user_id"] % 97 == 0).sum())),
            batch_format="pandas")

        return partial_final_agg(
            n_cust.union(n_orders).union(n_li).union(n_ev),
            ["table_name"], [("n_rows", "n_rows", "sum")])

    q["user_delete_cascade"] = q_user_delete_cascade

    def q_orders_zorder(sf_dir: str):
        # data-layout op: 32-bit Z-order (Morton) key interleaving
        # (custkey mod 2^16, epoch-day mod 2^16) — the multi-column
        # clustering key a writer sorts on so range scans over EITHER
        # column touch few files. Pure vectorized bit math per batch; the
        # SQL oracle builds the identical 16-term shift expression.
        # Output: per order the z key plus the file assignment under a
        # 256-file layout (z >> 24), so the locality contract is itself
        # value-checked.
        def z(df: pd.DataFrame) -> pd.DataFrame:
            ck = (df["o_custkey"].to_numpy("int64") % (1 << 16)
                  ).astype(np.uint64)
            day = (((df["o_orderdate"] - pd.Timestamp(0))
                    // pd.Timedelta(1, "D")).to_numpy("int64")
                   % (1 << 16)).astype(np.uint64)
            zv = np.zeros(len(df), np.uint64)
            for b in range(16):
                bit = np.uint64(1) << np.uint64(b)
                zv |= ((ck & bit) << np.uint64(b)
                       ) | ((day & bit) << np.uint64(b + 1))
            zi = zv.astype("int64")
            return pd.DataFrame({
                "o_orderkey": df["o_orderkey"].to_numpy("int64"),
                "z_key": zi,
                "z_file": zi >> 24})

        return _read(sf_dir, "orders",
                     ["o_orderkey", "o_custkey", "o_orderdate"]
                     ).map_batches(z, batch_format="pandas")

    q["orders_zorder"] = q_orders_zorder

    def q_revenue_bootstrap(sf_dir: str):
        # Poisson-bootstrap CI for total lineitem revenue: 64 replicate
        # sums from ONE scan (weights = counter-mode splitmix64 of the
        # row key through the Poisson(1) inverse CDF — deterministic,
        # partitioning-invariant, the standard at-scale bootstrap); the
        # CI picks are ceil-rank order statistics of the 64-row replicate
        # table. Oracle = scalar re-walk sharing the weight family.
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.sketch import bootstrap_sum_replicates

        _write_oracle(sf_dir, "revenue_bootstrap",
                      lambda: _o.expected_revenue_bootstrap(sf_dir))

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            ext = np.floor(df["l_extendedprice"].to_numpy(np.float64)
                           * 100.0 + 0.5).astype("int64")
            disc = np.floor(df["l_discount"].to_numpy(np.float64) * 100.0
                            + 0.5).astype("int64")
            return pd.DataFrame({
                "k": df["l_orderkey"].to_numpy("int64") * 10
                + df["l_linenumber"].to_numpy("int64"),
                "rev_s": ext * (100 - disc)})

        ds = _read(sf_dir, "lineitem",
                   ["l_orderkey", "l_linenumber", "l_extendedprice",
                    "l_discount"]).map_batches(prep, batch_format="pandas")
        reps = bootstrap_sum_replicates(ds, "k", "rev_s", n_boot=64)

        def stats(df: pd.DataFrame) -> pd.DataFrame:
            total = int(df.loc[df["b"] == -1, "s"].iloc[0])
            reps_s = np.sort(df.loc[df["b"] >= 0, "s"].to_numpy("int64"))
            n = len(reps_s)

            def pick(p: float) -> int:
                import math

                return int(reps_s[max(math.ceil(p * n), 1) - 1])

            return pd.DataFrame({
                "stat": ["total", "p05", "p50", "p95"],
                "value_s": np.array([total, pick(0.05), pick(0.50),
                                     pick(0.95)], "int64")})

        return reps.map_batches(
            lambda df: df.assign(_k=np.zeros(len(df), "int64")),
            batch_format="pandas").groupby("_k").map_groups(
            lambda df: stats(df.drop(columns=["_k"])),
            batch_format="pandas")

    q["revenue_bootstrap"] = q_revenue_bootstrap

    def q_price_percentile_cont(sf_dir: str):
        # interpolated (percentile_cont-style) global percentiles of the
        # price in cents, INTEGER-EXACT: target rank r = 1 + (n−1)·p has
        # an exact milli fraction for decimal p, so value_milli =
        # v_lo·1000 + (v_hi − v_lo)·frac_milli needs no float at all.
        # The two discrete order statistics come from ONE
        # distributed_quantiles call with crafted probs (r−½)/n, whose
        # ceil recovers exactly ranks r and r+1 (the ±½ keeps the float
        # ceil away from integer boundaries). SQL mirrors the identical
        # integer expression from two quantile_disc pulls — NOT DuckDB's
        # quantile_cont (whose internal lerp tree is not mirrorable).
        import math

        from dygiepp_ray.aggregates import distributed_quantiles

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "cents": np.floor(df["l_extendedprice"
                                     ].to_numpy(np.float64) * 100.0
                                  + 0.5).astype("int64")})

        ds = _read(sf_dir, "lineitem", ["l_extendedprice"]).map_batches(
            prep, batch_format="pandas").materialize()
        n = ds.count()
        ps = [250, 500, 750, 900]  # milli-probabilities
        ranks = [1 + (n - 1) * p // 1000 for p in ps]
        fracs = [(n - 1) * p % 1000 for p in ps]
        probs = []
        for r in ranks:
            probs.append((r - 0.5) / n)
            probs.append((min(r + 1, n) - 0.5) / n)
        qv = distributed_quantiles(ds, "cents", probs)
        vmap = dict(zip(qv["q"], qv["v"]))
        rows = []
        for i, (p, fr) in enumerate(zip(ps, fracs)):
            v_lo = int(vmap[probs[2 * i]])
            v_hi = int(vmap[probs[2 * i + 1]])
            rows.append((p, v_lo * 1000 + (v_hi - v_lo) * fr))
        return pd.DataFrame({
            "p_milli": np.array([r[0] for r in rows], "int64"),
            "value_milli": np.array([r[1] for r in rows], "int64")})

    q["price_percentile_cont"] = q_price_percentile_cont

    def q_doc_length_sketch_by_source(sf_dir: str):
        # grouped one-pass sketch quantiles: per-source doc-length
        # p25/p50/p90 off the mergeable fixed-bin histogram (the grouped
        # companion of approx_quantiles_price; error ≤ one bin width,
        # range [0, 8192) covers n_chars by data contract)
        from dygiepp_ray.stages.sketch import histogram_quantiles_grouped

        ds = _read(sf_dir, "documents", ["source", "n_chars"])
        return histogram_quantiles_grouped(
            ds, "n_chars", "source", [0.25, 0.5, 0.9], lo=0.0, hi=8192.0,
            bits=13)

    q["doc_length_sketch_by_source"] = q_doc_length_sketch_by_source

    def q_orders_percentile_cont(sf_dir: str):
        # GROUPED interpolated percentiles (per-priority p50/p90 of the
        # order total in cents, integer-exact milli interpolation): the
        # new `rank_targets` hook on distributed_quantiles fetches ranks
        # r and r+1 PER GROUP in one 3-pass call (no per-group q can
        # express a rank across different group sizes); tags p_milli /
        # p_milli+10000 mark the lo/hi pulls. SQL mirrors the identical
        # integer expression from per-partition row_number pulls.
        from dygiepp_ray.aggregates import (distributed_quantiles,
                                            partial_final_agg)

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "o_orderpriority": df["o_orderpriority"].to_numpy(object),
                "cents": np.floor(df["o_totalprice"].to_numpy(np.float64)
                                  * 100.0 + 0.5).astype("int64")})

        ds = _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]
                   ).map_batches(prep, batch_format="pandas").materialize()
        ps = [500, 900]

        def rank_targets(n: int):
            out = []
            for p in ps:
                r = 1 + (n - 1) * p // 1000
                out.append((float(p), r))
                out.append((float(p + 10000), min(r + 1, n)))
            return out

        qv = distributed_quantiles(ds, "cents", [], by="o_orderpriority",
                                   rank_targets=rank_targets)
        counts = partial_final_agg(
            ds.map_batches(
                lambda df: df.assign(one=np.ones(len(df), "int64")),
                batch_format="pandas"),
            ["o_orderpriority"], [("n", "one", "sum")]).to_pandas()
        n_by = dict(zip(counts["o_orderpriority"],
                        counts["n"].astype(int)))
        vmap = {(r.o_orderpriority, int(r.q)): int(r.v)
                for r in qv.itertuples()}
        rows = []
        for g in sorted(n_by):
            n = n_by[g]
            for p in ps:
                fr = (n - 1) * p % 1000
                v_lo = vmap[(g, p)]
                v_hi = vmap[(g, p + 10000)]
                rows.append((g, p, v_lo * 1000 + (v_hi - v_lo) * fr))
        return pd.DataFrame({
            "o_orderpriority": [r[0] for r in rows],
            "p_milli": np.array([r[1] for r in rows], "int64"),
            "value_milli": np.array([r[2] for r in rows], "int64")})

    q["orders_percentile_cont"] = q_orders_percentile_cont

    def q_fingerprint(sf_dir: str):
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "fingerprint", lambda: _o.expected_fingerprint(sf_dir))
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            fingerprint, batch_format="pandas"
        )

    q["fingerprint"] = q_fingerprint

    def q_token_count_bpe(sf_dir: str):
        from dygiepp_ray.stages.text import token_count_bpe

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            token_count_bpe, batch_format="pandas"
        )

    q["token_count_bpe"] = q_token_count_bpe

    def q_dup_ngram_stats(sf_dir: str):
        from dygiepp_ray.stages.text import dup_ngram_stats

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            dup_ngram_stats, batch_format="pandas"
        )

    q["dup_ngram_stats"] = q_dup_ngram_stats

    def q_bigram_counts(sf_dir: str):
        # corpus-wide n-gram count table (salted partial+final shuffle)
        from dygiepp_ray.stages.text import bigram_counts

        ds = _read(sf_dir, "documents", ["text"])
        return bigram_counts(ds, min_count=20, salt_buckets=8)

    q["bigram_counts"] = q_bigram_counts

    def q_term_drift(sf_dir: str):
        # vocabulary drift between corpus slices (even vs odd doc_id):
        # one scan of (term, slice) indicator partials, vocab-sized
        # partial+final sum, scalar totals reduce, exact ppm rates
        from dygiepp_ray.stages.text import term_drift

        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        return term_drift(ds, min_count=20)

    q["term_drift"] = q_term_drift

    def q_vocab_growth(sf_dir: str):
        # Heaps-law vocabulary-growth curve over deterministic doc_id
        # slices: one tokenize scan, vocab-sized (term, slice) sum, two
        # slice-sized reduces, driver cumsum over n_slices rows
        from dygiepp_ray.stages.text import vocab_growth

        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        return vocab_growth(ds, n_slices=10)

    q["vocab_growth"] = q_vocab_growth

    def q_k_anonymity(sf_dir: str):
        # privacy QA companion to pii_redact: quasi-identifier groups
        # (lang, source) whose document count falls below k=5 — the
        # k-anonymity release check. One salted grouped count (group
        # cardinality = |lang|x|source|, schema-bounded) + a filter;
        # n_docs carried so the report shows how far below k each is
        cnt = grouped_count(
            _read(sf_dir, "documents", ["doc_id", "lang", "source"])
            .select_columns(["lang", "source"]),
            ["lang", "source"], out_name="n_docs", salt_buckets=4)
        return cnt.map_batches(
            lambda df: df[df["n_docs"] < 5], batch_format="pandas")

    q["k_anonymity"] = q_k_anonymity

    def q_oov_rate(sf_dir: str):
        # tokenizer-vocab coverage per source: rate of tokens outside the
        # top-16 corpus vocabulary (two scans; K-bounded vocab broadcast).
        # K=16 keeps the split non-degenerate on this corpus's 31-term
        # synthetic vocabulary; real corpora use K≈32000.
        from dygiepp_ray.stages.text import oov_rate

        ds = _read(sf_dir, "documents", ["source", "text"])
        return oov_rate(ds, vocab_k=16)

    q["oov_rate"] = q_oov_rate

    def q_lang_source_association(sf_dir: str):
        # lang × source contingency chi-square (is language mix independent
        # of source? — the corpus-balance QA before mixing training data).
        # The distributed work is ONE salted grouped count per (lang,
        # source); the statistic runs on the |langs|×|sources|-bounded cell
        # table with exact Python big-int arithmetic, scale-1e6 floor
        # division mirrored by DuckDB HUGEINT `//`.
        cells = grouped_count(_read(sf_dir, "documents", ["lang", "source"]),
                              ["lang", "source"], out_name="o").to_pandas()
        T = int(cells["o"].sum())
        rl = cells.groupby("lang")["o"].sum().to_dict()
        cs = cells.groupby("source")["o"].sum().to_dict()
        chi = 0
        for rw in cells.itertuples():
            o, r, c = int(rw.o), int(rl[rw.lang]), int(cs[rw.source])
            d = o * T - r * c
            chi += (d * d * 1_000_000) // (r * c * T)
        dof = (cells["lang"].nunique() - 1) * (cells["source"].nunique() - 1)
        return pd.DataFrame({"n_cells": [len(cells)], "dof": [int(dof)],
                             "chi2_scaled": [int(chi)]})

    q["lang_source_association"] = q_lang_source_association

    def q_span_corruption(sf_dir: str):
        # T5-style span-corruption denoising pairs (deterministic
        # block-aligned mask rule; no RNG state) — oracle = independent
        # scalar per-doc re-walk of the documented rule
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.text import span_corruption

        _write_oracle(sf_dir, "span_corruption",
                      lambda: _o.expected_span_corruption(sf_dir))
        return span_corruption(_read(sf_dir, "documents",
                                     ["doc_id", "text"]))

    q["span_corruption"] = q_span_corruption

    def q_embedding_drift(sf_dir: str):
        # embedding-space distribution shift between corpus slices (vec_id
        # parity): cosine between the two slice mean vectors. Per-block
        # partials are dim-sized EXACT int64 sum rows (quantized at 1e6);
        # the driver reduces 2×dim ints and computes one float64 cosine —
        # the embedding twin of term_drift. Oracle = scalar re-walk.
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "embedding_drift",
                      lambda: _o.expected_embedding_drift(sf_dir))
        ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        SCALE = 1_000_000

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            v = np.stack(df["embedding"].to_numpy())
            qv = np.floor(v.astype(np.float64) * SCALE + 0.5).astype("int64")
            a = (df["vec_id"].to_numpy("int64") % 2) == 0
            d = qv.shape[1]
            return pd.DataFrame({
                "dim": np.arange(d, dtype="int64"),
                "s_a": qv[a].sum(axis=0, dtype="int64"),
                "s_b": qv[~a].sum(axis=0, dtype="int64"),
                "n_a": np.full(d, int(a.sum()), dtype="int64"),
                "n_b": np.full(d, int((~a).sum()), dtype="int64")})

        agg = ds.map_batches(partials, batch_format="pandas").to_pandas()
        g = agg.groupby("dim", sort=True)[["s_a", "s_b"]].sum()
        n_a = int(agg[agg["dim"] == 0]["n_a"].sum())
        n_b = int(agg[agg["dim"] == 0]["n_b"].sum())
        sa = g["s_a"].to_numpy("int64").astype("float64")
        sb = g["s_b"].to_numpy("int64").astype("float64")
        den = np.sqrt(float((sa * sa).sum())) * np.sqrt(float((sb * sb).sum()))
        cos = float((sa * sb).sum() / den) if den > 0 else 0.0
        from dygiepp_ray.functions.strings import round_half_up

        return pd.DataFrame({
            "n_a": [n_a], "n_b": [n_b],
            "mean_cosine": [float(round_half_up(np.array([cos]), 6)[0])]})

    q["embedding_drift"] = q_embedding_drift

    def q_heavy_hitters_tokens(sf_dir: str):
        # exact frequent-items (count > N/k): Misra-Gries candidates from
        # per-block summaries, then an exact recount of candidates only.
        # Runs over the corpus token stream (Zipfian at every scale —
        # per-user event counts flatten out as the user count grows)
        from dygiepp_ray.stages.text import heavy_hitters

        def toks(df: pd.DataFrame) -> pd.DataFrame:
            e = df[["doc_id"]].assign(
                token=df["text"].str.lower().str.split()).explode("token")
            return e[e["token"].notna()][["token"]]

        stream = _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            toks, batch_format="pandas")
        return heavy_hitters(stream, "token", k=40, m=64)

    q["heavy_hitters_tokens"] = q_heavy_hitters_tokens

    def q_tfidf_top_terms(sf_dir: str):
        # per-doc top-3 terms by integer-scaled TF-IDF (exact, no float log)
        from dygiepp_ray.stages.text import tfidf_top_terms

        ds = _read(sf_dir, "documents", ["doc_id", "text"])
        return tfidf_top_terms(ds, top_n=3)

    q["tfidf_top_terms"] = q_tfidf_top_terms

    def q_ngram_lm_score(sf_dir: str):
        # model-based quality filtering shape: per-doc mean scaled bigram
        # conditional probability under the corpus LM (exact ints)
        from dygiepp_ray.stages.text import ngram_lm_score

        return ngram_lm_score(_read(sf_dir, "documents", ["doc_id", "text"]))

    q["ngram_lm_score"] = q_ngram_lm_score

    # ---- dedup suite

    def q_exact_dedup(sf_dir: str):
        return exact_duplicates(_read(sf_dir, "documents", ["doc_id", "text"]))

    q["exact_dedup"] = q_exact_dedup

    def q_minhash(sf_dir: str):
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "minhash_dups", lambda: _o.expected_minhash_pairs(sf_dir))
        return minhash_lsh_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                                 jaccard_threshold=0.8, concurrency=_kernel_conc())

    q["minhash_lsh_dups"] = q_minhash

    def q_simhash(sf_dir: str):
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "simhash_dups", lambda: _o.expected_simhash_pairs(sf_dir))
        return simhash_near_dups(_read(sf_dir, "documents", ["doc_id", "text"]),
                                 concurrency=_kernel_conc())

    q["simhash_dups"] = q_simhash

    def q_ngram(sf_dir: str):
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "ngram_dups", lambda: _o.expected_ngram_pairs(sf_dir))
        return ngram_jaccard_pairs(_read(sf_dir, "documents", ["doc_id", "text"]),
                                   threshold=0.5)

    q["ngram_jaccard_dups"] = q_ngram

    def q_minhash_accuracy(sf_dir: str):
        # sketch calibration audit: signature-estimated vs exact Jaccard
        # on every LSH candidate pair, exact scaled ints both sides
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.dedup import minhash_accuracy

        _write_oracle(sf_dir, "minhash_accuracy",
                      lambda: _o.expected_minhash_accuracy(sf_dir))
        return minhash_accuracy(_read(sf_dir, "documents",
                                      ["doc_id", "text"]))

    q["minhash_accuracy"] = q_minhash_accuracy

    def q_contrastive_pairs(sf_dir: str):
        # contrastive embedding-training pairs: LSH near-dup positives +
        # one deterministic hash-drawn negative each (vocabulary = ids in
        # positive pairs, dup-family-bounded broadcast)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.dedup import contrastive_pairs

        _write_oracle(sf_dir, "contrastive_pairs",
                      lambda: _o.expected_contrastive_pairs(sf_dir))
        return contrastive_pairs(_read(sf_dir, "documents",
                                       ["doc_id", "text"]))

    q["contrastive_pairs"] = q_contrastive_pairs

    def q_source_dup_rates(sf_dir: str):
        # per-source exact-duplication report (where is the boilerplate
        # coming from): docs whose content sha appears >1 time corpus-wide,
        # counted per source. One sha stamp scan, (sha, source) partial+
        # final, coarse sha-bucket per-group reduce (per-source partials
        # emitted only for groups with total > 1), source-sized final sum.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.stages.dedup import _text_sha

        docs = _read(sf_dir, "documents", ["doc_id", "text", "source"])
        stamped = docs.map_batches(_text_sha, batch_format="pyarrow")
        counts = partial_final_agg(
            stamped.map_batches(
                lambda df: df.groupby(["text_sha", "source"],
                                      as_index=False).size().rename(
                    columns={"size": "n_p"}),
                batch_format="pandas"),
            ["text_sha", "source"], [("n_ss", "n_p", "sum")])

        def stamp_bk(df: pd.DataFrame) -> pd.DataFrame:
            h = pd.util.hash_pandas_object(df["text_sha"],
                                           index=False).to_numpy()
            return df.assign(_bk=(h % np.uint64(32)).astype("int64"))

        def per_bucket(df: pd.DataFrame) -> pd.DataFrame:
            tot = df.groupby("text_sha")["n_ss"].transform("sum")
            out = pd.DataFrame({
                "source": df["source"],
                "n_p": df["n_ss"].to_numpy("int64"),
                "d_p": np.where(tot.to_numpy("int64") > 1,
                                df["n_ss"].to_numpy("int64"), 0)})
            return out.groupby("source", as_index=False)[
                ["n_p", "d_p"]].sum()

        agg = partial_final_agg(
            counts.map_batches(stamp_bk, batch_format="pandas")
            .groupby("_bk").map_groups(per_bucket, batch_format="pandas"),
            ["source"], [("n_docs", "n_p", "sum"),
                         ("n_dup_docs", "d_p", "sum")])

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n_docs"].to_numpy("int64")
            d = df["n_dup_docs"].to_numpy("int64")
            return df.assign(dup_ppm=d * 1_000_000 // np.maximum(n, 1))

        return agg.map_batches(finish, batch_format="pandas")

    q["source_dup_rates"] = q_source_dup_rates

    def q_collocations(sf_dir: str):
        # word2vec-style phrase detection: integer-scaled lift over
        # adjacent token pairs (kg_pair_pmi discipline, no float log);
        # marginals off the count table, attached by two bucketed joins
        from dygiepp_ray.stages.text import collocation_lift

        return collocation_lift(_read(sf_dir, "documents",
                                      ["doc_id", "text"]),
                                min_count=20)

    q["collocations"] = q_collocations

    def q_substring_dups(sf_dir: str):
        # substring-level dedup: winnowed char-k-gram fingerprints (shared
        # passages, not whole-doc similarity)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.dedup import substring_dup_pairs

        _write_oracle(sf_dir, "substring_dups",
                      lambda: _o.expected_substring_pairs(sf_dir))
        return substring_dup_pairs(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            k=20, w=8, min_shared=2, max_df=8)

    q["substring_dups"] = q_substring_dups

    def q_dedup_spans(sf_dir: str):
        # span-LEVEL exact dedup (Lee et al. 2022): every duplicated
        # k-token window removed from all but its globally-first occurrence
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.dedup import remove_dup_spans

        _write_oracle(sf_dir, "dedup_spans",
                      lambda: _o.expected_remove_dup_spans(sf_dir, k=10))
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        return remove_dup_spans(docs, k=10)

    q["dedup_spans"] = q_dedup_spans

    def q_decontaminate(sf_dir: str):
        # benchmark decontamination: docs with doc_id % 23 == 0 act as the
        # held-out eval set; flag training docs sharing any word 5-gram.
        # Eval n-grams broadcast once (ray.put), training side streams.
        from dygiepp_ray.stages.curate import decontaminate

        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        ev = docs.map_batches(
            lambda df: df[df["doc_id"] % 23 == 0], batch_format="pandas")
        train = docs.map_batches(
            lambda df: df[df["doc_id"] % 23 != 0], batch_format="pandas")
        return decontaminate(train, ev, n=5, concurrency=(1, 4))

    q["decontaminate_docs"] = q_decontaminate

    def q_fuzzy_decontaminate(sf_dir: str):
        # NEAR-dup decontamination (paraphrased/templated leakage the exact
        # n-gram check misses): both sides minhash-banded into ONE coarse
        # shuffle, cross-side-only verify in-bucket
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.curate import fuzzy_decontaminate

        _write_oracle(sf_dir, "fuzzy_decontaminate",
                      lambda: _o.expected_fuzzy_decontaminate(sf_dir))
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        ev = docs.map_batches(
            lambda df: df[df["doc_id"] % 5 == 0], batch_format="pandas")
        train = docs.map_batches(
            lambda df: df[df["doc_id"] % 5 != 0], batch_format="pandas")
        return fuzzy_decontaminate(train, ev, est_threshold=0.5)

    q["fuzzy_decontaminate"] = q_fuzzy_decontaminate

    def q_pii_redact(sf_dir: str):
        # PII redaction (emails → <EMAIL>, IPv4 → <IP>, phone → <PHONE>).
        # The corpus has no natural PII, so plant a deterministic
        # doc_id-derived contact line on even doc_ids (mirrored in the SQL
        # oracle) — the redaction regexes then do real work on both sides.
        from dygiepp_ray.stages.curate import pii_redact

        def plant_and_redact(df: pd.DataFrame) -> pd.DataFrame:
            ids = df["doc_id"].astype("int64")
            contact = (
                " contact u" + ids.astype(str) + "@ex.com ip 10.0."
                + (ids % 256).astype(str) + ".7 call 555-0199"
            )
            aug = df["text"].where(ids % 2 != 0, df["text"] + contact)
            return pii_redact(pd.DataFrame({"doc_id": ids, "text": aug}))

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            plant_and_redact, batch_format="pandas"
        )

    q["pii_redact_docs"] = q_pii_redact

    def q_keep_best(sf_dir: str):
        # priority dedup across two simulated crawls: crawl B re-crawls every
        # doc (ids offset +10M), byte-identical text when doc_id % 3 == 0,
        # else edited. Keep the highest-scoring copy per distinct text
        # (deterministic pseudo-score; ties → min doc_id).
        from dygiepp_ray.stages.curate import keep_best
        from dygiepp_ray.stages.dedup import _text_sha

        def crawl(offset: int, edit: bool):
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                ids = df["doc_id"].astype("int64") + offset
                text = df["text"]
                if edit:
                    text = text.where(df["doc_id"] % 3 == 0, text + " v2")
                return pd.DataFrame(
                    {
                        "doc_id": ids,
                        "text": text,
                        "score": (ids * 2654435761) % 1000,
                    }
                )
            return fn

        base = _read(sf_dir, "documents", ["doc_id", "text"])
        a = base.map_batches(crawl(0, False), batch_format="pandas")
        b = base.map_batches(crawl(10_000_000, True), batch_format="pandas")
        union = a.union(b).map_batches(_text_sha, batch_format="pyarrow")
        union = union.select_columns(["text_sha", "doc_id", "score"])
        return keep_best(union, key_col="text_sha", score_col="score",
                         id_col="doc_id")

    q["keep_best_dedup"] = q_keep_best

    def q_ccnet(sf_dir: str):
        # CCNet-style per-language quality terciles of the LM fluency score
        # (head / middle / tail) — score pass + exact distributed quantile
        # cutoffs + vectorized labeling
        from dygiepp_ray.stages.curate import ccnet_buckets

        return ccnet_buckets(
            _read(sf_dir, "documents", ["doc_id", "text", "lang"]))

    q["ccnet_buckets"] = q_ccnet

    def q_pack_sequences(sf_dir: str):
        # GPT-style concat-then-chunk sequence packing: 256-token training
        # sequences over 8 pack groups (deterministic doc_id order)
        from dygiepp_ray.stages.curate import pack_concat_chunks

        return pack_concat_chunks(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            seq_len=256, n_groups=8)

    q["pack_sequences"] = q_pack_sequences

    def q_mixture_sample(sf_dir: str):
        # temperature-based source mixing (tau=0.5 upsamples small sources);
        # a deterministic skew filter first (full corpus is uniform across
        # sources, which would make every quota equal)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.curate import mixture_sample

        _write_oracle(sf_dir, "mixture_sample",
                      lambda: _o.expected_mixture_sample(sf_dir))

        def skew(df: pd.DataFrame) -> pd.DataFrame:
            full = df["source"].isin(("src0", "src1", "src2"))
            return df[full | (df["doc_id"] % 3 == 0)]

        ds = _read(sf_dir, "documents", ["doc_id", "source"]).map_batches(
            skew, batch_format="pandas")
        return mixture_sample(ds, key="source", id_col="doc_id",
                              total=200, temperature=0.5, seed=42)

    q["mixture_sample"] = q_mixture_sample

    def q_bpe_merges(sf_dir: str):
        # distributed BPE vocabulary learning: one corpus pass builds the
        # word-TYPE table, the merge loop runs over that compacted table
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.bpe import learn_bpe

        _write_oracle(sf_dir, "bpe_merges",
                      lambda: _o.expected_bpe_merges(sf_dir))
        return learn_bpe(_read(sf_dir, "documents", ["text"]),
                         n_merges=12, min_count=2)

    q["bpe_merges"] = q_bpe_merges

    def q_bpe_encode(sf_dir: str):
        # tokenizer APPLICATION: learn the merge table, broadcast it once,
        # encode the corpus in an actor pool with a per-actor word-type
        # cache, per-block partial token counts + small grouped sum
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.bpe import encode_token_counts, learn_bpe

        _write_oracle(sf_dir, "bpe_encode",
                      lambda: _o.expected_bpe_token_counts(sf_dir))
        docs = _read(sf_dir, "documents", ["text"])
        merges = learn_bpe(docs, n_merges=12, min_count=2)
        return encode_token_counts(docs, merges)

    q["bpe_encode"] = q_bpe_encode

    def q_cms_token_counts(sf_dir: str):
        # count-min sketch point queries over the corpus token stream
        # (mergeable linear sketch: per-block partials, exact int64 merge)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.sketch import cms_point_counts

        _write_oracle(sf_dir, "cms_token_counts",
                      lambda: _o.expected_cms_token_counts(sf_dir))

        def toks(df: pd.DataFrame) -> pd.DataFrame:
            e = df["text"].str.lower().str.split().explode()
            return pd.DataFrame({"token": e[e.notna()]})

        stream = _read(sf_dir, "documents", ["text"]).map_batches(
            toks, batch_format="pandas")
        return cms_point_counts(
            stream, "token", ["scan", "merge", "window", "zzz-missing"])

    q["cms_token_counts"] = q_cms_token_counts

    def q_incremental_dedup(sf_dir: str):
        # cross-run dedup against a persisted fingerprint store: the "old
        # crawl" = even docs plus planted re-crawl copies of some odd docs
        # (ids offset +1M); the "new crawl" = odd docs, deduped by selective
        # bucket reads of the store
        from dygiepp_ray.stages.dedup import (
            build_dedup_store,
            dedup_against_store,
        )

        store = f"/tmp/dygiepp_ray_dedupstore/{_store_tag(sf_dir, 'documents')}"
        docs = _read(sf_dir, "documents", ["doc_id", "text"])

        marker = os.path.join(store, "_done")
        if not os.path.exists(marker):
            def old_side(df: pd.DataFrame) -> pd.DataFrame:
                even = df[df["doc_id"] % 2 == 0]
                planted = df[(df["doc_id"] % 2 == 1)
                             & (df["doc_id"] % 31 == 1)].copy()
                planted["doc_id"] = planted["doc_id"] + 1_000_000
                return pd.concat([even, planted], ignore_index=True)

            build_dedup_store(
                docs.map_batches(old_side, batch_format="pandas"), store)
            with open(marker, "w") as fh:
                fh.write("ok")

        new = docs.map_batches(lambda df: df[df["doc_id"] % 2 == 1],
                               batch_format="pandas")
        return dedup_against_store(new, store)

    q["incremental_dedup"] = q_incremental_dedup

    def q_incremental_neardup(sf_dir: str):
        # cross-run NEAR-dup against a persisted MinHash band store
        # (incremental_dedup's LSH sibling): "old crawl" = doc_id % 3 != 0
        # persisted as band-bucket-partitioned parquet; "new crawl" =
        # % 3 == 0, matched by selective bucket reads + exact integer
        # agreement test; best stored match per new doc
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.dedup import (build_neardup_store,
                                              neardup_against_store)

        _write_oracle(sf_dir, "incremental_neardup",
                      lambda: _o.expected_neardup_store(sf_dir))
        store = (f"/tmp/dygiepp_ray_neardupstore/"
                 f"{_store_tag(sf_dir, 'documents')}")
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        marker = os.path.join(store, "_done")
        if not os.path.exists(marker):
            build_neardup_store(
                docs.map_batches(lambda df: df[df["doc_id"] % 3 != 0],
                                 batch_format="pandas"), store)
            with open(marker, "w") as fh:
                fh.write("ok")
        new = docs.map_batches(lambda df: df[df["doc_id"] % 3 == 0],
                               batch_format="pandas")
        return neardup_against_store(new, store)

    q["incremental_neardup"] = q_incremental_neardup

    def q_compression_ratio(sf_dir: str):
        # zlib-compressibility quality signal (exact integer-scaled ratio)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.text import compression_ratio

        _write_oracle(sf_dir, "compression_ratio",
                      lambda: _o.expected_compression_ratio(sf_dir))
        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            compression_ratio, batch_format="pandas")

    q["compression_ratio"] = q_compression_ratio

    def q_neardup_clusters(sf_dir: str):
        # cluster-level near-dedup: LSH pairs -> connected components ->
        # keeper (min doc_id) per cluster
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.curate import neardup_clusters

        _write_oracle(sf_dir, "neardup_clusters",
                      lambda: _o.expected_neardup_clusters(sf_dir))
        return neardup_clusters(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            concurrency=_kernel_conc())

    q["neardup_clusters"] = q_neardup_clusters

    def q_skew_join_lineitem(sf_dir: str):
        # skew-aware join: ~30% of lineitem rows collapse onto skew_key 0
        # (a deliberately hot key); skew_join salts the hot left rows across
        # buckets and replicates the hot right rows — one shuffle, no
        # materialize, no driver broadcast
        from dygiepp_ray.joins import skew_join

        def lmap(df: pd.DataFrame) -> pd.DataFrame:
            ok = df["l_orderkey"].astype("int64")
            return pd.DataFrame({
                "l_orderkey": ok,
                "skew_key": np.where(ok % 10 < 3, 0, ok % 1000).astype(
                    "int64"),
            })

        left = _read(sf_dir, "lineitem", ["l_orderkey"]).map_batches(
            lmap, batch_format="pandas")

        def dmap(df: pd.DataFrame) -> pd.DataFrame:
            i = df["id"].astype("int64")
            return pd.DataFrame({"skew_key": i,
                                 "dim_val": (i * 7919) % 1000})

        right = ray.data.range(1000).map_batches(dmap, batch_format="pandas")
        return skew_join(
            left, right, "skew_key", hot_threshold=1000,
            left_types={"l_orderkey": pa.int64(), "skew_key": pa.int64()},
            right_types={"skew_key": pa.int64(), "dim_val": pa.int64()})

    q["skew_join_lineitem"] = q_skew_join_lineitem

    def q_chunk_documents(sf_dir: str):
        # RAG-prep chunking: 32-token windows every 24 tokens (8 overlap)
        from dygiepp_ray.stages.text import chunk_documents

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            chunk_documents, batch_format="pandas")

    q["chunk_documents"] = q_chunk_documents

    def q_term_contexts(sf_dir: str):
        # KWIC snippet extraction: first occurrence +/-3-token context for
        # a probe term list (token-index semantics, byte-safe)
        from dygiepp_ray.stages.text import term_contexts

        return _read(sf_dir, "documents", ["doc_id", "text"]).map_batches(
            lambda df: term_contexts(df, ("scan", "merge", "window")),
            batch_format="pandas")

    q["term_contexts"] = q_term_contexts

    def q_curation_funnel(sf_dir: str):
        # composed end-to-end curation: exact dedup -> near-dup clusters ->
        # quality filter; one status per input doc
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.pipelines.curation import curate_corpus

        _write_oracle(sf_dir, "curation_funnel",
                      lambda: _o.expected_curation(sf_dir))
        return curate_corpus(
            _read(sf_dir, "documents", ["doc_id", "text"]),
            concurrency=_kernel_conc())

    q["curation_funnel"] = q_curation_funnel

    def q_weighted_sample(sf_dir: str):
        # Efraimidis-Spirakis weighted sampling (weight = n_chars),
        # hash-determinized and partitioning-invariant
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.curate import weighted_sample

        _write_oracle(sf_dir, "weighted_sample",
                      lambda: _o.expected_weighted_sample(sf_dir))
        return weighted_sample(
            _read(sf_dir, "documents", ["doc_id", "n_chars"]),
            id_col="doc_id", weight_col="n_chars", k=100)

    q["weighted_sample"] = q_weighted_sample

    def q_knn_pq(sf_dir: str):
        # product-quantization ANN: fused PQ training (one pass/iter for all
        # subspaces), m-byte codes, ADC lookup-table scan
        import pyarrow.parquet as pq

        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.cluster import knn_pq, pq_train

        _write_oracle(sf_dir, "knn_pq", lambda: _o.expected_knn_pq(sf_dir))
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
        qvec = np.asarray(
            t.filter(pc.equal(t["vec_id"], 0)).column("embedding")
            .to_pylist()[0], dtype=np.float64)
        cb = pq_train(emb, m=4, k=16, n_iter=4)
        return knn_pq(emb, cb, qvec, k=10)

    q["knn_pq"] = q_knn_pq

    def q_bm25(sf_dir: str):
        # distributed BM25 ranking for a probe query (two streaming passes)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.text import bm25_scores

        _write_oracle(sf_dir, "bm25_scan_merge",
                      lambda: _o.expected_bm25(sf_dir))
        return bm25_scores(_read(sf_dir, "documents", ["doc_id", "text"]),
                           ("scan", "merge", "window"))

    q["bm25_scan_merge"] = q_bm25

    def q_emb_neardup(sf_dir: str):
        # the testdata embeddings have no natural near-dups (max cosine≈0.48),
        # so plant exact duplicates of vec_id<20 under offset ids: the
        # operator must find exactly those 20 pairs at threshold 0.9
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def dup_first20(t: pa.Table) -> pa.Table:
            mask = pc.less(t["vec_id"], 20)
            d = t.filter(mask)
            if d.num_rows == 0:
                return t
            dup = pa.table({
                "vec_id": pc.add(d["vec_id"], 1_000_000),
                "embedding": d["embedding"],
            })
            return pa.concat_tables([t, dup])

        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "embedding_neardups",
                      lambda: _o.expected_embedding_neardups(sf_dir))
        return embedding_near_dups(
            emb.map_batches(dup_first20, batch_format="pyarrow"), threshold=0.9
        )

    q["embedding_neardups"] = q_emb_neardup

    # ---- similarity search

    def q_knn(sf_dir: str):
        import pyarrow.parquet as pq

        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
        qvec = np.asarray(t.filter(pc.equal(t["vec_id"], 0)).column("embedding").to_pylist()[0],
                          dtype=np.float64)
        return knn_brute_force(emb, qvec, k=10)

    q["knn_cosine"] = q_knn

    def q_knn_lsh(sf_dir: str):
        import pyarrow.parquet as pq

        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "knn_lsh", lambda: _o.expected_knn_lsh(sf_dir))

        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"])
        qvec = np.asarray(t.filter(pc.equal(t["vec_id"], 0)).column("embedding").to_pylist()[0],
                          dtype=np.float64)
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        return knn_lsh(emb, qvec, k=10)

    q["knn_lsh"] = q_knn_lsh

    def q_knn_recall(sf_dir: str):
        # ANN-quality eval: recall@10 of the radius-1 LSH ANN vs exact
        # brute force for 8 queries, in ONE corpus scan (broadcast query
        # matrix, <=2k rows per (block, query) leave each task)
        import pyarrow.parquet as pq

        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.similarity import knn_recall_lsh

        qids = list(range(8))
        _write_oracle(sf_dir, "knn_recall",
                      lambda: _o.expected_knn_recall(sf_dir, qids, k=10))
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
        by_id = {int(i): v for i, v in zip(t.column("vec_id").to_pylist(),
                                           t.column("embedding").to_pylist())}
        queries = np.asarray([by_id[i] for i in qids], dtype=np.float64)
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
        return knn_recall_lsh(emb, queries, qids, k=10)

    q["knn_recall"] = q_knn_recall

    def q_knn_lsh_indexed(sf_dir: str):
        # the scale path for REPEATED queries: persisted signature-partitioned
        # index; each query reads only its Hamming-radius partitions
        import shutil

        import pyarrow.parquet as pq

        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.similarity import build_lsh_index, knn_lsh_indexed

        _write_oracle(sf_dir, "knn_lsh_indexed", lambda: _o.expected_knn_lsh(sf_dir))
        idx = f"/tmp/dygiepp_ray_lshidx/{_store_tag(sf_dir, 'embeddings')}"
        marker = os.path.join(idx, "_done")
        if not os.path.exists(marker):
            shutil.rmtree(idx, ignore_errors=True)
            build_lsh_index(_read(sf_dir, "embeddings", ["vec_id", "embedding"]), idx)
            with open(marker, "w") as fh:
                fh.write("ok")
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
        qvec = np.asarray(
            t.filter(pc.equal(t["vec_id"], 0)).column("embedding").to_pylist()[0],
            dtype=np.float64)
        return knn_lsh_indexed(idx, qvec, k=10)

    q["knn_lsh_indexed"] = q_knn_lsh_indexed

    # ---- k-means clustering / IVF ANN / semantic dedup

    def _fit_centroids(sf_dir: str, k: int, n_iter: int):
        """k-means centroids over the sf embeddings, cached per process (the
        three cluster queries share one fit)."""
        from dygiepp_ray.stages.cluster import kmeans_fit

        key = (_sf_tag(sf_dir), "centroids", k, n_iter)
        if key not in _ORACLE_CACHE:
            _ORACLE_CACHE[key] = kmeans_fit(
                _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                k=k, n_iter=n_iter)
        return _ORACLE_CACHE[key]

    def q_embedding_clusters(sf_dir: str):
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.cluster import kmeans_assign

        _write_oracle(sf_dir, "embedding_clusters",
                      lambda: _o.expected_embedding_clusters(sf_dir, k=8, n_iter=4))
        cents = _fit_centroids(sf_dir, k=8, n_iter=4)
        return kmeans_assign(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                             cents)

    q["embedding_clusters"] = q_embedding_clusters

    def q_embedding_silhouette(sf_dir: str):
        # per-cluster simplified silhouette (clustering-quality audit for
        # the k-means family): one assignment scan, k-row reduce, all
        # emitted numbers integer-exact on the 6-dp distance grid
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.cluster import embedding_silhouette

        _write_oracle(sf_dir, "embedding_silhouette",
                      lambda: _o.expected_embedding_silhouette(
                          sf_dir, k=8, n_iter=4))
        cents = _fit_centroids(sf_dir, k=8, n_iter=4)
        return embedding_silhouette(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]), cents)

    q["embedding_silhouette"] = q_embedding_silhouette

    def q_embedding_outliers(sf_dir: str):
        # embedding-space curation inspect list: the 10 farthest rows per
        # k-means cluster (exact scaled-int ordering, vec_id tiebreak) with
        # the cluster's exact mean distance attached; one stats scan
        # (k-row reduce, broadcast back) + one block-local-top-k scan
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.cluster import embedding_outliers

        _write_oracle(sf_dir, "embedding_outliers",
                      lambda: _o.expected_embedding_outliers(
                          sf_dir, k=8, n_iter=4, k_out=10))
        cents = _fit_centroids(sf_dir, k=8, n_iter=4)
        return embedding_outliers(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]),
            cents, k_out=10)

    q["embedding_outliers"] = q_embedding_outliers

    def q_knn_ivf(sf_dir: str):
        import pyarrow.parquet as pq

        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.cluster import knn_ivf

        _write_oracle(sf_dir, "knn_ivf",
                      lambda: _o.expected_knn_ivf(sf_dir, k=10, nprobe=2,
                                                  n_clusters=8, n_iter=3))
        t = pq.read_table(os.path.join(sf_dir, "embeddings.parquet"),
                          columns=["vec_id", "embedding"])
        qvec = np.asarray(
            t.filter(pc.equal(t["vec_id"], 0)).column("embedding").to_pylist()[0],
            dtype=np.float64)
        cents = _fit_centroids(sf_dir, k=8, n_iter=3)
        return knn_ivf(_read(sf_dir, "embeddings", ["vec_id", "embedding"]),
                       cents, qvec, k=10, nprobe=2)

    q["knn_ivf"] = q_knn_ivf

    def q_semantic_dedup(sf_dir: str):
        # same planted-duplicate table as embedding_neardups (the testdata
        # embeddings have no natural cosine-0.9 pairs): SemDeDup must find
        # exactly the 20 planted (i, i+1e6) pairs, each inside one cluster
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.cluster import kmeans_fit, semantic_dedup

        _write_oracle(sf_dir, "semantic_dedup",
                      lambda: _o.expected_semantic_dedup(sf_dir, threshold=0.9,
                                                         n_clusters=8, n_iter=3))
        emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])

        def dup_first20(t: pa.Table) -> pa.Table:
            mask = pc.less(t["vec_id"], 20)
            d = t.filter(mask)
            if d.num_rows == 0:
                return t
            dup = pa.table({
                "vec_id": pc.add(d["vec_id"], 1_000_000),
                "embedding": d["embedding"],
            })
            return pa.concat_tables([t, dup])

        planted = emb.map_batches(dup_first20, batch_format="pyarrow")
        key = (_sf_tag(sf_dir), "centroids_planted", 8, 3)
        if key not in _ORACLE_CACHE:
            _ORACLE_CACHE[key] = kmeans_fit(planted, k=8, n_iter=3)
        return semantic_dedup(planted, _ORACLE_CACHE[key], threshold=0.9)

    q["semantic_dedup"] = q_semantic_dedup

    # ---- KG construction (the flagship path; non-SQL → rows-only checks)

    def q_kg_triples(sf_dir: str):
        _ensure_triples_oracle(sf_dir)
        return _synth_triples(sf_dir)

    q["kg_triples"] = q_kg_triples

    def q_kg_triples_learned(sf_dir: str):
        # the flagship pipeline under LEARNED weights (stages/learned.py):
        # weights trained offline once per code salt (deterministic GD on a
        # fixed-seed corpus), shipped to every actor via the v2 .npz seam;
        # the oracle re-derives the learned decode independently from the
        # same artifact (oracle.expected_triples_learned)
        from dygiepp_ray import oracle as _o

        path = _learned_weights_path()
        _write_oracle(sf_dir, "kg_triples_learned",
                      lambda: _o.expected_triples_learned(
                          _synth_corpus_dir(sf_dir), path))
        return kgp.kg_triples(_synth_corpus_dir(sf_dir),
                              concurrency=_kernel_conc(), weights_path=path)

    q["kg_triples_learned"] = q_kg_triples_learned

    def q_kg_span_counts(sf_dir: str):
        _ensure_triples_oracle(sf_dir)
        return kgp.span_counts(_synth_triples(sf_dir), salt_buckets=8)

    q["kg_span_counts"] = q_kg_span_counts

    def q_kg_pair_counts(sf_dir: str):
        _ensure_triples_oracle(sf_dir)
        return kgp.pair_counts(_synth_triples(sf_dir), salt_buckets=8)

    q["kg_pair_counts"] = q_kg_pair_counts

    def q_kg_degree_hist(sf_dir: str):
        # out-degree distribution over distinct KB edges (three shrinking
        # grouped counts; only the first sees the triple table)
        _ensure_triples_oracle(sf_dir)
        return kgp.degree_histogram(_synth_triples(sf_dir), salt_buckets=4)

    q["kg_degree_hist"] = q_kg_degree_hist

    def q_kg_pair_pmi(sf_dir: str):
        # integer-scaled PMI per (subj,obj) — exact int64, no float log
        _ensure_triples_oracle(sf_dir)
        return kgp.pair_pmi(_synth_triples(sf_dir), scale=1000,
                            salt_buckets=4)

    q["kg_pair_pmi"] = q_kg_pair_pmi

    def q_kg_functional_conflicts(sf_dir: str):
        # functional-property violation QA: (subj, pred) slots asserting
        # more than one distinct canonical object
        _ensure_triples_oracle(sf_dir)
        return kgp.functional_conflicts(_synth_triples(sf_dir),
                                        salt_buckets=4)

    q["kg_functional_conflicts"] = q_kg_functional_conflicts

    def q_kg_triangles(sf_dir: str):
        # per-node triangle participation over the distinct undirected KG
        # edge set (degree-ordered wedge join; orientation-invariant result
        # lets the oracle use plain lexicographic self-joins)
        _ensure_triples_oracle(sf_dir)
        return kgp.triangle_counts(_synth_triples(sf_dir), salt_buckets=4)

    q["kg_triangles"] = q_kg_triangles

    def q_kg_edge_support(sf_dir: str):
        # per-edge triangle support + local-bridge flag (weak-tie QA over
        # the extracted graph; the k-truss peel's input table). Exhaustive
        # closed-wedge enumeration (exact at hubs, O(sqrt m) wedges each)
        # + one bucketed LEFT join back onto the edge set
        _ensure_triples_oracle(sf_dir)
        return kgp.edge_support(_synth_triples(sf_dir), salt_buckets=4)

    q["kg_edge_support"] = q_kg_edge_support

    def q_kg_degree_gini(sf_dir: str):
        # hub-concentration audit: exact-integer Gini of the undirected
        # degree distribution (tie-grouped distinct-degree table through
        # the banded global rank scan; see kgp.degree_gini)
        _ensure_triples_oracle(sf_dir)
        return kgp.degree_gini(_synth_triples(sf_dir), salt_buckets=4)

    q["kg_degree_gini"] = q_kg_degree_gini

    def q_kg_schema_violations(sf_dir: str):
        # schema QA: distinct (pred, subject) pairs whose modal-mention
        # subject type disagrees with the predicate's induced domain type
        # (the argmax of distinct-subject counts per pred; ties
        # lexicographic). The pred→domain table is PREDICATE-VOCABULARY
        # sized (schema-bounded by nature) → broadcast once via ray.put;
        # everything else is the domain_range join shape.
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import argmax_per_key, partial_final_agg
        from dygiepp_ray.joins import hash_join

        _ensure_triples_oracle(sf_dir)
        _write_oracle(sf_dir, "kg_mention_counts",
                      lambda: _o.expected_mention_counts(
                          _oracle_docs_table(sf_dir),
                          {**ENTITY_LEXICON, **DOC_LEXICON}))
        mentions = _docs_predicted(sf_dir).map_batches(
            flatten_ner_mentions, batch_format="pyarrow")
        counts = grouped_count(
            mentions.select_columns(["mention_norm", "label"]),
            ["mention_norm", "label"], out_name="n", salt_buckets=8)
        types = argmax_per_key(
            counts, key="mention_norm", order_cols=["n", "label"],
            ascending=[False, True],
            keep_cols=["mention_norm", "label", "n"]).map_batches(
            lambda df: pd.DataFrame({"subj_norm": df["mention_norm"],
                                     "subj_type": df["label"]}),
            batch_format="pandas")

        pairs = grouped_count(
            _synth_triples(sf_dir).select_columns(["subj_norm", "pred"]),
            ["subj_norm", "pred"], out_name="_c", salt_buckets=4
        ).select_columns(["subj_norm", "pred"])

        s_t = pa.string()
        typed = hash_join(
            pairs, types, on="subj_norm", how="left", n_buckets=16,
            left_types={"subj_norm": s_t, "pred": s_t},
            right_types={"subj_norm": s_t, "subj_type": s_t},
            bucket_post=lambda m: m.assign(
                subj_type=m["subj_type"].fillna("UNKNOWN"))).materialize()

        dom_counts = partial_final_agg(
            typed.map_batches(
                lambda df: df.assign(one=np.ones(len(df), "int64")),
                batch_format="pandas"),
            ["pred", "subj_type"], [("n", "one", "sum")])
        dom = argmax_per_key(dom_counts, key="pred",
                             order_cols=["n", "subj_type"],
                             ascending=[False, True],
                             keep_cols=["pred", "subj_type"]).to_pandas()
        dom_ref = ray.put(dict(zip(dom["pred"], dom["subj_type"])))

        def flag(df: pd.DataFrame) -> pd.DataFrame:
            exp = df["pred"].map(ray.get(dom_ref))
            bad = (df["subj_type"].to_numpy(object) != "UNKNOWN") \
                & (df["subj_type"].to_numpy(object) != exp.to_numpy(object))
            out = df.loc[bad, ["pred", "subj_norm", "subj_type"]].copy()
            out["expected_type"] = exp[bad].to_numpy(object)
            return out

        return typed.map_batches(flag, batch_format="pandas")

    q["kg_schema_violations"] = q_kg_schema_violations

    def q_kg_predicate_stats(sf_dir: str):
        # per-predicate schema stats (edge count, subj/obj cardinality,
        # integer-scaled fanout) — schema induction companion to the
        # functional-conflict QA
        _ensure_triples_oracle(sf_dir)
        return kgp.predicate_stats(_synth_triples(sf_dir), salt_buckets=4)

    q["kg_predicate_stats"] = q_kg_predicate_stats

    def q_kg_entity_kb(sf_dir: str):
        # the per-entity KB table (make_kb.py:90-103 lifecycle parity):
        # mention count, in/out degree, top predicate, sorted alias list
        _ensure_triples_oracle(sf_dir)
        return kgp.entity_kb(_synth_triples(sf_dir), salt_buckets=4)

    q["kg_entity_kb"] = q_kg_entity_kb

    def q_kg_mentions(sf_dir: str):
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "kg_mention_counts",
                      lambda: _o.expected_mention_counts(
                          _oracle_docs_table(sf_dir),
                          {**ENTITY_LEXICON, **DOC_LEXICON}))
        predicted = _docs_predicted(sf_dir)
        mentions = predicted.map_batches(flatten_ner_mentions, batch_format="pyarrow")
        return grouped_count(mentions.select_columns(["mention_norm", "label"]),
                             ["mention_norm", "label"], out_name="n", salt_buckets=8)

    q["kg_mention_counts"] = q_kg_mentions

    def q_kg_type_infer(sf_dir: str):
        # entity typing by modal mention label (ties: lexicographic): the
        # typed-mention count table reduced per entity with the coarse-
        # bucket argmax helper — one aggregate shuffle + one bucket shuffle
        # at unbounded entity cardinality
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import argmax_per_key

        _write_oracle(sf_dir, "kg_mention_counts",
                      lambda: _o.expected_mention_counts(
                          _oracle_docs_table(sf_dir),
                          {**ENTITY_LEXICON, **DOC_LEXICON}))
        predicted = _docs_predicted(sf_dir)
        mentions = predicted.map_batches(flatten_ner_mentions,
                                         batch_format="pyarrow")
        counts = grouped_count(
            mentions.select_columns(["mention_norm", "label"]),
            ["mention_norm", "label"], out_name="n", salt_buckets=8)
        top = argmax_per_key(counts, key="mention_norm",
                             order_cols=["n", "label"],
                             ascending=[False, True],
                             keep_cols=["mention_norm", "label", "n"])

        def rename(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"entity": df["mention_norm"],
                                 "etype": df["label"],
                                 "n_mentions": df["n"].astype("int64")})

        return top.map_batches(rename, batch_format="pandas")

    q["kg_type_infer"] = q_kg_type_infer

    def q_kg_star_query(sf_dir: str):
        # conjunctive star query: subjects asserting BOTH a USED-FOR and a
        # COMPARE edge, with per-predicate assertion counts — ONE
        # partial+final aggregate over conditional indicator columns (no
        # join, no pivot repartition)
        from dygiepp_ray.aggregates import partial_final_agg

        _ensure_triples_oracle(sf_dir)
        tri = _synth_triples(sf_dir).select_columns(["subj_norm", "pred"])
        P1, P2 = "USED-FOR", "COMPARE"

        def indicators(df: pd.DataFrame) -> pd.DataFrame:
            keep = df[df["pred"].isin([P1, P2])]
            return pd.DataFrame({
                "subj_norm": keep["subj_norm"],
                "c1": (keep["pred"] == P1).to_numpy("int64"),
                "c2": (keep["pred"] == P2).to_numpy("int64")})

        agg = partial_final_agg(
            tri.map_batches(indicators, batch_format="pandas"),
            ["subj_norm"], [("n_p1", "c1", "sum"), ("n_p2", "c2", "sum")])

        def both(df: pd.DataFrame) -> pd.DataFrame:
            df = df[(df["n_p1"] > 0) & (df["n_p2"] > 0)].copy()
            df["n_p1"] = df["n_p1"].astype("int64")
            df["n_p2"] = df["n_p2"].astype("int64")
            return df[["subj_norm", "n_p1", "n_p2"]]

        return agg.map_batches(both, batch_format="pandas")

    q["kg_star_query"] = q_kg_star_query

    def q_kg_linked(sf_dir: str):
        from dygiepp_ray import oracle as _o

        alias_entities = {f"E{i:03d}": [name] for i, name in
                          enumerate(sorted({**ENTITY_LEXICON, **DOC_LEXICON}))}
        _write_oracle(sf_dir, "kg_entity_links",
                      lambda: _o.expected_entity_link_counts(
                          _oracle_docs_table(sf_dir),
                          {**ENTITY_LEXICON, **DOC_LEXICON}, alias_entities))
        alias_ref = ray.put(build_alias_table(alias_entities))
        predicted = _docs_predicted(sf_dir)
        mentions = predicted.map_batches(flatten_ner_mentions, batch_format="pyarrow")
        linked = mentions.map_batches(
            EntityLinker, fn_constructor_kwargs=dict(alias_table_ref=alias_ref),
            batch_format="pandas", concurrency=_kernel_conc(),
        )
        return grouped_count(linked.select_columns(["entity_id"]), ["entity_id"], out_name="n")

    q["kg_entity_links"] = q_kg_linked

    def q_standoff_convert(sf_dir: str):
        # S7-S9 core: synthesize char-offset standoff annotations over the
        # documents text (first occurrence of each lexicon term, plus one
        # deliberately misaligned span per doc), convert, report drops
        from dygiepp_ray.sources.standoff import convert_standoff_batch

        terms = sorted(DOC_LEXICON)

        def synth(t: pa.Table) -> pa.Table:
            ent_t = pa.list_(pa.struct([("start_char", pa.int32()),
                                        ("end_char", pa.int32()),
                                        ("label", pa.string())]))
            rel_t = pa.list_(pa.struct([("e1", pa.int32()), ("e2", pa.int32()),
                                        ("label", pa.string())]))
            keys, texts, ents, rels = [], [], [], []
            for doc_id, text in zip(t.column("doc_id").to_pylist(),
                                    t.column("text").to_pylist()):
                es = []
                for term in terms:
                    p = text.find(term)
                    if p >= 0:
                        es.append({"start_char": p, "end_char": p + len(term),
                                   "label": DOC_LEXICON[term]})
                # one guaranteed-misaligned span (mid-token start)
                if len(text) > 3:
                    es.append({"start_char": 1, "end_char": 3, "label": "BAD"})
                rs = [{"e1": 0, "e2": 1, "label": "REL"}] if len(es) >= 2 else []
                keys.append(f"doc_{doc_id}")
                texts.append(text)
                ents.append(es)
                rels.append(rs)
            return pa.table({
                "doc_key": pa.array(keys, pa.string()),
                "text": pa.array(texts, pa.string()),
                "entities": pa.array(ents, ent_t),
                "relations": pa.array(rels, rel_t),
            })

        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "standoff_convert",
                      lambda: _o.expected_standoff_summary(sf_dir, DOC_LEXICON))
        converted = (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(synth, batch_format="pyarrow")
            .map_batches(convert_standoff_batch, batch_format="pyarrow")
        )

        def summarize(t: pa.Table) -> pa.Table:
            ner = t.column("ner").to_pylist()
            return pa.table({
                "doc_key": t.column("doc_key"),
                "n_aligned": pa.array([sum(len(s) for s in doc) for doc in ner], pa.int64()),
                "n_entities_dropped": t.column("n_entities_dropped"),
            })

        return converted.map_batches(summarize, batch_format="pyarrow")

    q["standoff_convert"] = q_standoff_convert

    def q_chemprot_convert(sf_dir: str):
        # S9 — full ChemProt-format path: documents → synthesized TSV fold
        # (per batch, distributed) → parse_chemprot → token alignment with
        # drop counters → per-doc summary
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.sources.formats import parse_chemprot
        from dygiepp_ray.sources.standoff import convert_standoff_batch

        _write_oracle(sf_dir, "chemprot_convert",
                      lambda: _o.expected_chemprot_summary(sf_dir, DOC_LEXICON))

        def synth_and_parse(t: pa.Table) -> pa.Table:
            from dygiepp_ray.oracle import synth_chemprot_fold

            a_tsv, e_tsv, r_tsv = synth_chemprot_fold(
                t.column("doc_id").to_pylist(), t.column("text").to_pylist(),
                DOC_LEXICON)
            return parse_chemprot(a_tsv, e_tsv, r_tsv)

        def summarize(t: pa.Table) -> pa.Table:
            ner = t.column("ner").to_pylist()
            return pa.table({
                "doc_key": t.column("doc_key"),
                "n_aligned": pa.array([sum(len(s) for s in doc) for doc in ner],
                                      pa.int64()),
                "n_entities_dropped": t.column("n_entities_dropped"),
                "n_relations_dropped": t.column("n_relations_dropped"),
            })

        return (
            _read(sf_dir, "documents", ["doc_id", "text"])
            .map_batches(synth_and_parse, batch_format="pyarrow")
            .map_batches(convert_standoff_batch, batch_format="pyarrow")
            .map_batches(summarize, batch_format="pyarrow")
        )

    q["chemprot_convert"] = q_chemprot_convert

    def q_kg_build_resume(sf_dir: str):
        # resumable materialization: build twice; second run must skip every
        # bucket via its lineage manifest. Output = one row per bucket with
        # the manifest's (row_count, sha256_xor) lineage plus the resume
        # counters — value-hash-checked against an independent per-bucket
        # recompute (VERDICT r2 #9: no longer rows-only).
        import json

        from dygiepp_ray import oracle as _o
        from dygiepp_ray.state.manifest import manifest_path

        corpus_dir = _synth_corpus_dir(sf_dir)
        lex = _synth_lexicon(sf_dir)
        _write_oracle(sf_dir, "kg_build_resume",
                      lambda: _o.expected_kg_build_manifest(
                          corpus_dir, n_buckets=16, entity_lexicon=lex))
        out_dir = f"/tmp/dygiepp_ray_kg/{_sf_tag(sf_dir)}"
        kgp.build_kg(corpus_dir, out_dir, n_buckets=16,
                     concurrency=_kernel_conc(), entity_lexicon=lex)
        second = kgp.build_kg(corpus_dir, out_dir, n_buckets=16,
                              concurrency=_kernel_conc(), entity_lexicon=lex)
        rows = []
        for b in range(16):
            with open(manifest_path(out_dir, b)) as fh:
                m = json.load(fh)
            rows.append({
                "bucket": int(m["bucket"]),
                "row_count": int(m["row_count"]),
                "sha256_xor": m["sha256_xor"],
                "second_written": len(second["written_buckets"]),
                "second_skipped": len(second["skipped_buckets"]),
            })
        return pd.DataFrame(rows)

    q["kg_build_resume"] = q_kg_build_resume

    def q_kg_graph_edges(sf_dir: str):
        _ensure_triples_oracle(sf_dir)
        return kgp.graph_edges(_synth_triples(sf_dir))

    q["kg_graph_edges"] = q_kg_graph_edges

    def q_kg_graph_nodes(sf_dir: str):
        _ensure_triples_oracle(sf_dir)
        return kgp.graph_nodes(_synth_triples(sf_dir), salt_buckets=8)

    q["kg_graph_nodes"] = q_kg_graph_nodes

    def q_kg_closure(sf_dir: str):
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "kg_closure",
                      lambda: _o.expected_closure(_oracle_triples_table(sf_dir)))
        tri = _synth_triples(sf_dir)
        return transitive_closure(
            tri.select_columns(["doc_id", "subj", "obj", "pred", "conf"])
        )

    q["kg_closure"] = q_kg_closure

    def _distinct_edge_ds(sf_dir: str):
        # distinct (subj_norm -> obj_norm) KG edge set: per-block dedup then
        # a partial+final grouped count, so the shuffle moves <= one row per
        # (pair, block) — the input both graph-analytics fixpoints run over
        tri = _synth_triples(sf_dir)
        return grouped_count(tri.select_columns(["subj_norm", "obj_norm"]),
                             ["subj_norm", "obj_norm"], out_name="_w"
                             ).select_columns(["subj_norm", "obj_norm"])

    def q_kg_components(sf_dir: str):
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import connected_components

        _write_oracle(sf_dir, "kg_components",
                      lambda: _o.expected_components(_oracle_triples_table(sf_dir)))
        # KG node vocab is lexicon-bounded -> broadcast mode, no auto-count
        return connected_components(_distinct_edge_ds(sf_dir),
                                    src="subj_norm", dst="obj_norm",
                                    mode="broadcast")

    q["kg_components"] = q_kg_components

    def q_kg_reciprocity(sf_dir: str):
        # edge-level reciprocity QA: share of directed non-loop edges in the
        # distinct KG edge set whose reverse edge also exists. Per-block
        # partials keyed on the UNORDERED pair (both orientations group
        # together), a pair-sized partial+final sum, then a scalar reduce —
        # one row out; never an all-pairs or driver-side edge scan.
        from dygiepp_ray.aggregates import partial_final_agg

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir)

        def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
            s = df["subj_norm"].to_numpy(object)
            o = df["obj_norm"].to_numpy(object)
            keep = s != o
            s, o = s[keep], o[keep]
            fwd = s < o
            out = pd.DataFrame({"u": np.where(fwd, s, o),
                                "v": np.where(fwd, o, s),
                                "f": fwd.astype("int64"),
                                "b": (~fwd).astype("int64")})
            return out.groupby(["u", "v"], as_index=False)[["f", "b"]].sum()

        pairs = partial_final_agg(
            edges.map_batches(pair_partials, batch_format="pandas"),
            ["u", "v"], [("f", "f", "sum"), ("b", "b", "sum")])

        def scalar(df: pd.DataFrame) -> pd.DataFrame:
            f = df["f"].to_numpy("int64")
            b = df["b"].to_numpy("int64")
            # edges are distinct -> f,b ∈ {0,1}; a reciprocal pair
            # contributes BOTH its directed edges to the numerator
            return pd.DataFrame({"n_p": [int(f.sum() + b.sum())],
                                 "r_p": [int(2 * np.minimum(f, b).sum())]})

        tot = pairs.map_batches(scalar, batch_format="pandas").to_pandas()
        n_edges = int(tot["n_p"].sum())
        n_recip = int(tot["r_p"].sum())
        return pd.DataFrame({
            "n_edges": [n_edges], "n_reciprocal": [n_recip],
            "reciprocity_ppm": [n_recip * 1_000_000 // max(n_edges, 1)]})

    q["kg_reciprocity"] = q_kg_reciprocity

    def q_kg_pagerank_weighted(sf_dir: str):
        # PageRank under assertion-multiplicity edge weights (the
        # reference MultiDiGraph's edge counts): exact divmod-split
        # integer shares, |V|-admission broadcast fixpoint
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import pagerank_weighted

        _write_oracle(sf_dir, "kg_pagerank_weighted",
                      lambda: _o.expected_pagerank_weighted(
                          _oracle_triples_table(sf_dir)))
        tri = _synth_triples(sf_dir)
        edges = grouped_count(
            tri.select_columns(["subj_norm", "obj_norm"]),
            ["subj_norm", "obj_norm"], out_name="w")
        return pagerank_weighted(edges, src="subj_norm", dst="obj_norm",
                                 weight="w")

    q["kg_pagerank_weighted"] = q_kg_pagerank_weighted

    def q_kg_symmetry(sf_dir: str):
        # per-predicate symmetry share (ontology QA: which predicates
        # behave symmetrically — sameAs-like vs strictly directed): share
        # of distinct (s, p, o) edges whose reverse (o, p, s) also exists
        # under the SAME predicate. kg_reciprocity's unordered-pair partial
        # shape, keyed (pred, u, v) so both orientations co-group, then a
        # per-pred partial+final sum — never an all-pairs or driver scan.
        # Complements kg_inverse_detect (cross-predicate inverses).
        from dygiepp_ray.aggregates import partial_final_agg

        _ensure_triples_oracle(sf_dir)
        edges = grouped_count(
            _synth_triples(sf_dir).select_columns(
                ["pred", "subj_norm", "obj_norm"]),
            ["pred", "subj_norm", "obj_norm"], out_name="_w"
        ).select_columns(["pred", "subj_norm", "obj_norm"])

        def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
            s = df["subj_norm"].to_numpy(object)
            o = df["obj_norm"].to_numpy(object)
            keep = s != o
            s, o = s[keep], o[keep]
            p = df["pred"].to_numpy(object)[keep]
            fwd = s < o
            out = pd.DataFrame({"pred": p,
                                "u": np.where(fwd, s, o),
                                "v": np.where(fwd, o, s),
                                "f": fwd.astype("int64"),
                                "b": (~fwd).astype("int64")})
            return out.groupby(["pred", "u", "v"],
                               as_index=False)[["f", "b"]].sum()

        pairs = partial_final_agg(
            edges.map_batches(pair_partials, batch_format="pandas"),
            ["pred", "u", "v"], [("f", "f", "sum"), ("b", "b", "sum")])

        def pred_partials(df: pd.DataFrame) -> pd.DataFrame:
            f = df["f"].to_numpy("int64")
            b = df["b"].to_numpy("int64")
            out = pd.DataFrame({"pred": df["pred"],
                                "n_e": f + b,
                                "n_s": 2 * np.minimum(f, b)})
            return out.groupby("pred", as_index=False)[["n_e", "n_s"]].sum()

        tot = partial_final_agg(
            pairs.map_batches(pred_partials, batch_format="pandas"),
            ["pred"], [("n_e", "n_e", "sum"), ("n_s", "n_s", "sum")])

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            ne = df["n_e"].to_numpy("int64")
            ns = df["n_s"].to_numpy("int64")
            return pd.DataFrame({
                "pred": df["pred"], "n_edges": ne, "n_symmetric": ns,
                "symmetry_ppm": ns * 1_000_000 // np.maximum(ne, 1)})

        return tot.map_batches(finish, batch_format="pandas")

    q["kg_symmetry"] = q_kg_symmetry

    def q_kg_conf_quantiles(sf_dir: str):
        # per-predicate extraction-confidence quantiles (calibration QA on
        # the triple table): exact histogram-refinement quantiles, grouped —
        # 3 streaming passes, no sort (aggregates.distributed_quantiles)
        from dygiepp_ray.aggregates import distributed_quantiles

        _ensure_triples_oracle(sf_dir)
        tri = _synth_triples(sf_dir).select_columns(["pred", "conf"])
        return distributed_quantiles(tri, "conf", [0.25, 0.5, 0.9],
                                     by="pred")

    q["kg_conf_quantiles"] = q_kg_conf_quantiles

    def q_kg_pred_cooccurrence(sf_dir: str):
        # predicate co-occurrence mining: support of unordered predicate
        # pairs extracted from the same document (schema-discovery signal:
        # which relation types travel together) — distinct (doc, pred),
        # one doc-key shuffle, in-task self-merge with fanout bounded by
        # the tiny per-doc predicate count
        from dygiepp_ray.aggregates import distinct_first, partial_final_agg

        _ensure_triples_oracle(sf_dir)
        dp = distinct_first(
            _synth_triples(sf_dir).select_columns(["doc_id", "pred"]),
            ["doc_id", "pred"])

        def stamp(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            h = pd.util.hash_pandas_object(df["doc_id"],
                                           index=False).to_numpy()
            df["_bk"] = (h % np.uint64(64)).astype("int64")
            return df

        def pair_partials(df: pd.DataFrame) -> pd.DataFrame:
            df = df.drop(columns=["_bk"])
            m = df.merge(df, on="doc_id")
            m = m[m["pred_x"] < m["pred_y"]]
            g = m.groupby(["pred_x", "pred_y"], sort=False,
                          as_index=False).size()
            return g.rename(columns={"pred_x": "pred_a", "pred_y": "pred_b",
                                     "size": "s_p"})

        partials = (dp.map_batches(stamp, batch_format="pandas")
                    .groupby("_bk")
                    .map_groups(pair_partials, batch_format="pandas"))
        return partial_final_agg(partials, ["pred_a", "pred_b"],
                                 [("support", "s_p", "sum")])

    q["kg_pred_cooccurrence"] = q_kg_pred_cooccurrence

    def q_kg_predicate_align(sf_dir: str):
        # ontology alignment between two independently-extracted KG slices
        # (doc parity): predicate pairs ranked by EXTENSION overlap —
        # Jaccard of their distinct (subj, obj) pair sets. Scale shape:
        # per-slice distinct (pred, pair), bucketed hash join on the pair
        # key with in-task (pred_a, pred_b) partials, per-pred totals
        # broadcast (predicate vocab is schema-bounded by nature).
        from dygiepp_ray.aggregates import (distinct_first, grouped_count,
                                            partial_final_agg)
        from dygiepp_ray.joins import hash_join

        _ensure_triples_oracle(sf_dir)
        tri = _synth_triples(sf_dir).select_columns(
            ["doc_id", "pred", "subj_norm", "obj_norm"])

        def slice_fn(par: int):
            # doc keys are strings — slice on length parity (vectorized,
            # mirrored by SQL length(); split measured non-degenerate)
            def fn(df: pd.DataFrame) -> pd.DataFrame:
                df = df[df["doc_id"].str.len() % 2 == par]
                return pd.DataFrame({
                    "pred": df["pred"],
                    "k": df["subj_norm"] + "|" + df["obj_norm"]})
            return fn

        a = distinct_first(tri.map_batches(slice_fn(0),
                                           batch_format="pandas"),
                           ["pred", "k"]).materialize()
        b = distinct_first(tri.map_batches(slice_fn(1),
                                           batch_format="pandas"),
                           ["pred", "k"]).materialize()
        na = grouped_count(a.select_columns(["pred"]), ["pred"],
                           out_name="n_a").to_pandas()
        nb = grouped_count(b.select_columns(["pred"]), ["pred"],
                           out_name="n_b").to_pandas()
        a2 = a.map_batches(lambda df: df.rename(columns={"pred": "pred_a"}),
                           batch_format="pandas")
        b2 = b.map_batches(lambda df: df.rename(columns={"pred": "pred_b"}),
                           batch_format="pandas")
        co = hash_join(
            a2, b2, on="k", n_buckets=16,
            left_types={"pred_a": pa.string(), "k": pa.string()},
            right_types={"pred_b": pa.string(), "k": pa.string()},
            bucket_post=lambda df: df.groupby(
                ["pred_a", "pred_b"], as_index=False).size().rename(
                columns={"size": "c_p"}))
        cc = partial_final_agg(co, ["pred_a", "pred_b"],
                               [("n_common", "c_p", "sum")])
        ra = ray.put(dict(zip(na["pred"], na["n_a"].astype(int))))
        rb = ray.put(dict(zip(nb["pred"], nb["n_b"].astype(int))))

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            A, B = ray.get(ra), ray.get(rb)
            n_a = df["pred_a"].map(A).to_numpy("int64")
            n_b = df["pred_b"].map(B).to_numpy("int64")
            c = df["n_common"].to_numpy("int64")
            return pd.DataFrame({
                "pred_a": df["pred_a"], "pred_b": df["pred_b"],
                "n_common": c, "n_a": n_a, "n_b": n_b,
                "jaccard_ppm": (c * 1_000_000) // (n_a + n_b - c)})

        return cc.map_batches(finish, batch_format="pandas")

    q["kg_predicate_align"] = q_kg_predicate_align

    def q_kg_neighbor_sample(sf_dir: str):
        # GraphSAGE-style bounded neighbor sampling for GNN training data:
        # a per-node fanout-capped adjacency sample (k=3), expanded two
        # hops, min-hop deduped. The cap is the scale lever — hop-2 fanout
        # is k², never deg². Contract: the sample is the deterministic
        # first-k by neighbor order (SQL row_number mirror); a production
        # variant swaps in hash order via stages.dedup._splitmix64 — the
        # structure (cap → bucketed hop join → min-hop reduce) is identical.
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.joins import hash_join
        from dygiepp_ray.windows import top_n_per_key

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).map_batches(
            lambda df: df[df["subj_norm"] != df["obj_norm"]],
            batch_format="pandas")
        adj = top_n_per_key(edges, "subj_norm", ["obj_norm"], n=3,
                            ascending=True).materialize()
        h1 = adj.map_batches(
            lambda df: pd.DataFrame({"seed": df["subj_norm"],
                                     "node": df["obj_norm"]}),
            batch_format="pandas")
        adj2 = adj.map_batches(
            lambda df: pd.DataFrame({"node": df["subj_norm"],
                                     "node2": df["obj_norm"]}),
            batch_format="pandas")
        h2 = hash_join(
            h1, adj2, on="node", n_buckets=16,
            left_types={"seed": pa.string(), "node": pa.string()},
            right_types={"node": pa.string(), "node2": pa.string()},
            bucket_post=lambda df: pd.DataFrame(
                {"seed": df["seed"], "node": df["node2"],
                 "hop": np.full(len(df), 2, "int64")}).drop_duplicates())
        h1h = h1.map_batches(
            lambda df: df.assign(hop=np.ones(len(df), "int64")),
            batch_format="pandas")
        u = h1h.union(h2).map_batches(
            lambda df: df[df["node"] != df["seed"]],
            batch_format="pandas")
        return partial_final_agg(u, ["seed", "node"],
                                 [("hop", "hop", "min")])

    q["kg_neighbor_sample"] = q_kg_neighbor_sample

    def q_kg_random_walks(sf_dir: str):
        # DeepWalk-style walk corpus (training data for node embeddings):
        # length-3 walks from every node, each step one bucketed hash join
        # frontier ⋈ ranked adjacency. Determinism contract: step t takes
        # the neighbor at rotation index (t−1) mod deg(cur) of the
        # obj-ordered adjacency (SQL row_number mirror; a production
        # sampler swaps in splitmix hash order — identical join structure).
        # Walks die at out-degree-0 nodes (inner join drops them).
        from dygiepp_ray.joins import hash_join
        from dygiepp_ray.windows import _bucketed

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).map_batches(
            lambda df: df[df["subj_norm"] != df["obj_norm"]],
            batch_format="pandas")

        def rank_kernel(df: pd.DataFrame, ks: list[str]) -> pd.DataFrame:
            g = df.groupby(ks, sort=False)
            df = df.copy()
            df["rn"] = g.cumcount().astype("int64")
            df["deg"] = g["obj_norm"].transform("size").astype("int64")
            return df

        adj = _bucketed(edges, ["subj_norm"], ["obj_norm"], True,
                        rank_kernel, 16).map_batches(
            lambda df: pd.DataFrame({"cur": df["subj_norm"],
                                     "nxt": df["obj_norm"],
                                     "rn": df["rn"], "deg": df["deg"]}),
            batch_format="pandas").materialize()

        frontier = adj.map_batches(
            lambda df: pd.DataFrame({"seed": df["cur"], "cur": df["cur"]})
                         .drop_duplicates(),
            batch_format="pandas")
        str_t, int_t = pa.string(), pa.int64()
        steps = []
        for t in (1, 2, 3):
            def pick(df, _t=t):
                df = df[df["rn"] == (_t - 1) % df["deg"]]
                return pd.DataFrame({"seed": df["seed"], "cur": df["nxt"]})

            frontier = hash_join(
                frontier, adj, on="cur", n_buckets=16,
                left_types={"seed": str_t, "cur": str_t},
                right_types={"cur": str_t, "nxt": str_t,
                             "rn": int_t, "deg": int_t},
                bucket_post=pick).materialize()
            steps.append(frontier.map_batches(
                lambda df, _t=t: pd.DataFrame({
                    "seed": df["seed"],
                    "step": np.full(len(df), _t, "int64"),
                    "node": df["cur"]}),
                batch_format="pandas"))
        return steps[0].union(*steps[1:])

    q["kg_random_walks"] = q_kg_random_walks

    def q_kg_assortativity(sf_dir: str):
        # degree assortativity of the undirected distinct KG edge set:
        # Pearson r over the symmetrized endpoint-degree pairs (the standard
        # Newman coefficient). Degrees come from a pair-sized grouped count;
        # the |V|-bounded degree table broadcasts under the same
        # lexicon-bounded admission contract as the graph fixpoints; moment
        # partials are exact int64 and the float expression tree over them
        # is mirrored verbatim in the SQL oracle (events_value_corr twin).
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.functions.strings import round_half_up

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir)

        def upair(df: pd.DataFrame) -> pd.DataFrame:
            s = df["subj_norm"].to_numpy(object)
            o = df["obj_norm"].to_numpy(object)
            keep = s != o
            s, o = s[keep], o[keep]
            fwd = s < o
            return pd.DataFrame({"u": np.where(fwd, s, o),
                                 "v": np.where(fwd, o, s)}).drop_duplicates()

        pairs = distinct_first(
            edges.map_batches(upair, batch_format="pandas"), ["u", "v"]
        ).materialize()

        def endpoints(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({
                "node": np.concatenate([df["u"].to_numpy(object),
                                        df["v"].to_numpy(object)])})

        deg_df = grouped_count(
            pairs.map_batches(endpoints, batch_format="pandas"),
            ["node"], out_name="deg").to_pandas()
        if len(deg_df) > 2_000_000:
            raise RuntimeError(
                "kg_assortativity: degree table exceeds the broadcast "
                "admission cap; route degrees through a bucketed hash_join")
        deg_ref = ray.put(dict(zip(deg_df["node"], deg_df["deg"].astype(int))))

        def moments(df: pd.DataFrame) -> pd.DataFrame:
            deg = ray.get(deg_ref)
            x = df["u"].map(deg).to_numpy("int64")
            y = df["v"].map(deg).to_numpy("int64")
            # symmetrized points: (x,y) and (y,x) per undirected edge
            return pd.DataFrame({
                "n": [2 * len(df)], "sx": [int(x.sum() + y.sum())],
                "sy": [int(x.sum() + y.sum())],
                "sxx": [int((x * x).sum() + (y * y).sum())],
                "syy": [int((x * x).sum() + (y * y).sum())],
                "sxy": [int(2 * (x * y).sum())]})

        m = pairs.map_batches(moments, batch_format="pandas").to_pandas()
        n = float(m["n"].sum())
        sx, sy = float(m["sx"].sum()), float(m["sy"].sum())
        sxx, syy = float(m["sxx"].sum()), float(m["syy"].sum())
        sxy = float(m["sxy"].sum())
        den2 = (n * sxx - sx * sx) * (n * syy - sy * sy)
        c = (n * sxy - sx * sy) / np.sqrt(den2) if den2 > 0 else 0.0
        return pd.DataFrame({
            "n_points": [int(m["n"].sum())],
            "assortativity": [float(round_half_up(np.array([c]), 6)[0])]})

    q["kg_assortativity"] = q_kg_assortativity

    def q_kg_kcore(sf_dir: str):
        # core number per node (largest surviving k-core) — deterministic
        # peel; broadcast mode (lexicon-bounded vocab), shuffle fallback
        # pinned equal in tests/test_graph.py
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import kcore_decomposition

        _write_oracle(sf_dir, "kg_kcore",
                      lambda: _o.expected_kcore(_oracle_triples_table(sf_dir)))
        return kcore_decomposition(_distinct_edge_ds(sf_dir),
                                   src="subj_norm", dst="obj_norm",
                                   mode="broadcast")

    q["kg_kcore"] = q_kg_kcore

    def q_kg_truss(sf_dir: str):
        # truss number per edge (edge-level cohesion; kg_kcore's edge
        # analog, edge_support's peel-to-fixpoint refinement). Driver peel
        # under the |E| admission bound, NO shuffle fallback by design
        # (per-round triangle recount); definition-based oracle re-walk
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import truss_decomposition

        _write_oracle(sf_dir, "kg_truss",
                      lambda: _o.expected_truss(_oracle_triples_table(sf_dir)))
        return truss_decomposition(_distinct_edge_ds(sf_dir),
                                   src="subj_norm", dst="obj_norm")

    q["kg_truss"] = q_kg_truss

    def q_kg_wsp(sf_dir: str):
        # multi-source WEIGHTED shortest paths (bounded at 4 edges) from
        # the 3 highest-degree hubs — the weighted companion of
        # kg_bfs_distances. Edge weight contract: w = 4 − min(mult, 3)
        # over the undirected assertion multiplicity (frequent assertions
        # are cheap, singletons cost 3) — deterministic, mirrored by the
        # oracle re-walk. Per-round state stays a Dataset (bucketed
        # relax join + grouped min); same deterministic seed rule as
        # kg_closeness.
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import strip_schema_metadata
        from dygiepp_ray.stages.graph import weighted_min_distances

        _ensure_triples_oracle(sf_dir)
        _write_oracle(sf_dir, "kg_wsp",
                      lambda: _o.expected_wsp(_oracle_triples_table(sf_dir),
                                              max_rounds=4))

        def canon(t: pa.Table) -> pa.Table:
            t = strip_schema_metadata(t)
            s = t.column("subj_norm").combine_chunks().cast(pa.string())
            o = t.column("obj_norm").combine_chunks().cast(pa.string())
            u = pc.min_element_wise(s, o)
            v = pc.max_element_wise(s, o)
            return pa.table({"u": u, "v": v}).filter(
                pc.invert(pc.equal(s, o)))

        cnt = grouped_count(
            _synth_triples(sf_dir).select_columns(
                ["subj_norm", "obj_norm"]).map_batches(
                canon, batch_format="pyarrow"),
            ["u", "v"], out_name="c", salt_buckets=4)

        def weight(df: pd.DataFrame) -> pd.DataFrame:
            c = df["c"].to_numpy("int64")
            return pd.DataFrame({"u": df["u"], "v": df["v"],
                                 "w": 4 - np.minimum(c, 3)})

        edges_w = cnt.map_batches(weight, batch_format="pandas"
                                  ).materialize()

        def explode(t: pa.Table) -> pa.Table:
            t = strip_schema_metadata(t)
            cols = []
            for cname in ("u", "v"):
                arr = t.column(cname).combine_chunks()
                cols.extend(arr.chunks if isinstance(arr, pa.ChunkedArray)
                            else [arr])
            return pa.table({"node": pa.concat_arrays(cols)})

        deg = grouped_count(edges_w.map_batches(explode,
                                                batch_format="pyarrow"),
                            ["node"], out_name="deg")
        seeds = (deg.sort(["deg", "node"], descending=[True, False])
                 .limit(3).select_columns(["node"]).materialize())
        return weighted_min_distances(edges_w, seeds, src="u", dst="v",
                                      w_col="w", max_rounds=4)

    q["kg_wsp"] = q_kg_wsp

    def q_kg_betweenness(sf_dir: str):
        # sampled betweenness centrality (hop-bounded Brandes from the 3
        # top-degree hubs; integer-exact floored dependency recursion —
        # see graph.py:betweenness_sampled). |E|-bounded admission, no
        # shuffle fallback by design; dict re-walk oracle.
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import betweenness_sampled

        _write_oracle(sf_dir, "kg_betweenness",
                      lambda: _o.expected_betweenness(
                          _oracle_triples_table(sf_dir)))
        return betweenness_sampled(_distinct_edge_ds(sf_dir),
                                   src="subj_norm", dst="obj_norm")

    q["kg_betweenness"] = q_kg_betweenness

    def q_kg_powerlaw(sf_dir: str):
        # scale-free-ness audit: log2-binned degree histogram + the
        # discrete-MLE power-law exponent α = 1 + n/Σ ln(d/(dmin−½)),
        # with the log SUM accumulated as floor(ln(·)·1e9) int64 per node
        # (float summation order would be partitioning-dependent; floored
        # nano-log terms make the reduce exact and the SQL mirror uses
        # the identical ln expression per row). dmin = 1 by contract.
        from dygiepp_ray.aggregates import partial_final_agg, \
            strip_schema_metadata

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).materialize()

        def sym(t: pa.Table) -> pa.Table:
            t = strip_schema_metadata(t)
            u = t.column("subj_norm")
            v = t.column("obj_norm")
            c = pa.chunked_array(list(u.chunks) + list(v.chunks), u.type)
            n = pa.chunked_array(list(v.chunks) + list(u.chunks), u.type)
            out = pa.table({"node": c, "nb": n})
            # self-loops excluded by contract (the SQL mirror's
            # subj <> obj)
            return out.filter(pc.invert(pc.equal(out["node"], out["nb"])))

        adj = grouped_count(
            edges.map_batches(sym, batch_format="pyarrow"),
            ["node", "nb"], out_name="_c").select_columns(["node", "nb"])
        deg = grouped_count(adj.select_columns(["node"]), ["node"],
                            out_name="deg")

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            d = df["deg"].to_numpy("int64").astype(np.float64)
            # floor(log2(d)) via the EXACT frexp exponent (float log2
            # differs from SQL's in the last ulp at powers of two); the
            # SQL mirror uses the binary-string length instead
            _m, ex = np.frexp(d)
            lb = (ex - 1).astype("int64")
            ln_nano = np.floor(np.log(d / 0.5) * 1e9).astype("int64")
            g = pd.DataFrame({"log2_bin": lb,
                              "one": np.ones(len(df), "int64"),
                              "ln_nano": ln_nano})
            return g.groupby("log2_bin", as_index=False).sum()

        hist = partial_final_agg(
            deg.map_batches(partials, batch_format="pandas"),
            ["log2_bin"], [("n_nodes", "one", "sum"),
                           ("ln_nano_sum", "ln_nano", "sum")])

        def alpha(df: pd.DataFrame) -> pd.DataFrame:
            n = int(df["n_nodes"].sum())
            s = int(df["ln_nano_sum"].sum())
            a = 1_000_000 + (n * 10**15) // s if s > 0 else 0
            out = df.sort_values("log2_bin").copy()
            out["alpha_micro"] = np.int64(a)
            return out[["log2_bin", "n_nodes", "alpha_micro"]]

        return hist.map_batches(
            lambda df: df.assign(_k=np.zeros(len(df), "int64")),
            batch_format="pandas").groupby("_k").map_groups(
            lambda df: alpha(df.drop(columns=["_k"])),
            batch_format="pandas")

    q["kg_powerlaw"] = q_kg_powerlaw

    def q_kg_richclub(sf_dir: str):
        # rich-club profile: for each power-of-two degree threshold k,
        # the edge density among nodes of degree > k — φ(k) close to 1
        # means the hubs form a clique-like core. Degrees broadcast under
        # the |V| vocabulary admission (the assortativity contract); ONE
        # edge scan emits per-k indicator partials; n_k comes off the
        # degree table the same way. density_ppm = E_k·1e6 //
        # (n_k·(n_k−1)/2), exact ints end to end.
        from dygiepp_ray.aggregates import partial_final_agg, \
            strip_schema_metadata

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).materialize()

        def canon(t: pa.Table) -> pa.Table:
            t = strip_schema_metadata(t)
            s = t.column("subj_norm").combine_chunks().cast(pa.string())
            o = t.column("obj_norm").combine_chunks().cast(pa.string())
            u = pc.min_element_wise(s, o)
            v = pc.max_element_wise(s, o)
            return pa.table({"u": u, "v": v}).filter(
                pc.invert(pc.equal(s, o)))

        und = grouped_count(edges.map_batches(canon,
                                              batch_format="pyarrow"),
                            ["u", "v"], out_name="_c"
                            ).select_columns(["u", "v"]).materialize()

        def explode(t: pa.Table) -> pa.Table:
            t = strip_schema_metadata(t)
            cols = []
            for cname in ("u", "v"):
                arr = t.column(cname).combine_chunks()
                cols.extend(arr.chunks if isinstance(arr, pa.ChunkedArray)
                            else [arr])
            return pa.table({"node": pa.concat_arrays(cols)})

        deg_df = grouped_count(
            und.map_batches(explode, batch_format="pyarrow"),
            ["node"], out_name="deg").to_pandas()
        deg_ref = ray.put(dict(zip(deg_df["node"],
                                   deg_df["deg"].astype(int))))
        max_deg = int(deg_df["deg"].max()) if len(deg_df) else 0
        # threshold grid capped at 1024 — part of the operator contract
        # (the SQL mirror enumerates the same fixed list)
        ks = [1 << i for i in range(max(max_deg, 1).bit_length())
              if (1 << i) < max_deg and (1 << i) <= 1024]

        def edge_partials(df: pd.DataFrame) -> pd.DataFrame:
            dm = ray.get(deg_ref)
            du = df["u"].map(dm).to_numpy("int64")
            dv = df["v"].map(dm).to_numpy("int64")
            rows = []
            for k in ks:
                rows.append((k, int(((du > k) & (dv > k)).sum())))
            return pd.DataFrame({"k": [r[0] for r in rows],
                                 "e_k": np.array([r[1] for r in rows],
                                                 "int64")})

        ek = partial_final_agg(
            und.map_batches(edge_partials, batch_format="pandas"),
            ["k"], [("e_k", "e_k", "sum")]).to_pandas()
        nk = {k: int((deg_df["deg"] > k).sum()) for k in ks}

        rows = []
        for r in ek.sort_values("k").itertuples():
            n = nk[int(r.k)]
            pairs = n * (n - 1) // 2
            rows.append((int(r.k), n, int(r.e_k),
                         int(r.e_k) * 1_000_000 // pairs if pairs else 0))
        return pd.DataFrame({
            "k": np.array([r[0] for r in rows], "int64"),
            "n_k": np.array([r[1] for r in rows], "int64"),
            "e_k": np.array([r[2] for r in rows], "int64"),
            "density_ppm": np.array([r[3] for r in rows], "int64")})

    q["kg_richclub"] = q_kg_richclub

    def q_kg_type_assortativity(sf_dir: str):
        # attribute assortativity: do edges connect entities of the SAME
        # type? Newman's discrete coefficient over the typed distinct
        # edge set (UNKNOWN is a category by contract):
        # r = (E·Tr − Σ aᵢbᵢ) / (E² − Σ aᵢbᵢ), all terms exact Python
        # ints off the type-cardinality-bounded mixing matrix;
        # r_ppm = sign(num)·(|num|·1e6 // den) — the TRUNCATING division
        # DuckDB's // applies to negatives (documented gotcha).
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import (argmax_per_key,
                                            partial_final_agg,
                                            strip_schema_metadata)
        from dygiepp_ray.joins import hash_join

        _ensure_triples_oracle(sf_dir)
        _write_oracle(sf_dir, "kg_mention_counts",
                      lambda: _o.expected_mention_counts(
                          _oracle_docs_table(sf_dir),
                          {**ENTITY_LEXICON, **DOC_LEXICON}))
        mentions = _docs_predicted(sf_dir).map_batches(
            flatten_ner_mentions, batch_format="pyarrow")
        counts = grouped_count(
            mentions.select_columns(["mention_norm", "label"]),
            ["mention_norm", "label"], out_name="n", salt_buckets=8)
        types = argmax_per_key(
            counts, key="mention_norm", order_cols=["n", "label"],
            ascending=[False, True],
            keep_cols=["mention_norm", "label"])

        edges = grouped_count(
            _synth_triples(sf_dir).select_columns(
                ["subj_norm", "obj_norm"]),
            ["subj_norm", "obj_norm"], out_name="_c", salt_buckets=4
        ).select_columns(["subj_norm", "obj_norm"])

        s_t = pa.string()
        t_subj = types.map_batches(
            lambda t: strip_schema_metadata(t).rename_columns(
                ["subj_norm", "subj_type"]), batch_format="pyarrow")
        t_obj = types.map_batches(
            lambda t: strip_schema_metadata(t).rename_columns(
                ["obj_norm", "obj_type"]), batch_format="pyarrow")
        typed_s = hash_join(
            edges, t_subj, on="subj_norm", how="left", n_buckets=16,
            left_types={"subj_norm": s_t, "obj_norm": s_t},
            right_types={"subj_norm": s_t, "subj_type": s_t},
            bucket_post=lambda m: m.assign(
                subj_type=m["subj_type"].fillna("UNKNOWN"))[
                ["obj_norm", "subj_type"]])

        def mix_partials(m: pd.DataFrame) -> pd.DataFrame:
            m = m.assign(obj_type=m["obj_type"].fillna("UNKNOWN"))
            g = m.groupby(["subj_type", "obj_type"]).size()
            idx = g.index.to_frame(index=False)
            idx["n"] = g.to_numpy("int64")
            return idx

        mix = partial_final_agg(
            hash_join(typed_s, t_obj, on="obj_norm", how="left",
                      n_buckets=16,
                      left_types={"obj_norm": s_t, "subj_type": s_t},
                      right_types={"obj_norm": s_t, "obj_type": s_t},
                      bucket_post=mix_partials),
            ["subj_type", "obj_type"], [("n", "n", "sum")]).to_pandas()

        E = int(mix["n"].sum())
        tr = int(mix.loc[mix["subj_type"] == mix["obj_type"], "n"].sum())
        a = mix.groupby("subj_type")["n"].sum()
        b = mix.groupby("obj_type")["n"].sum()
        sum_ab = sum(int(a.get(t, 0)) * int(b.get(t, 0))
                     for t in set(a.index) | set(b.index))
        num = E * tr - sum_ab
        den = E * E - sum_ab
        if den > 0:
            r_ppm = (1 if num >= 0 else -1) * (abs(num) * 1_000_000 // den)
        else:
            r_ppm = 0
        return pd.DataFrame({
            "n_edges": np.array([E], "int64"),
            "trace": np.array([tr], "int64"),
            "sum_ab": np.array([sum_ab], "int64"),
            "r_ppm": np.array([r_ppm], "int64")})

    q["kg_type_assortativity"] = q_kg_type_assortativity

    def q_kg_communities(sf_dir: str):
        # community detection by deterministic synchronous label propagation
        # (fixed rounds, exact integer votes, min-label ties); |V|-bounded
        # broadcast contract, streamed-rounds path pinned in tests
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import label_propagation

        _write_oracle(sf_dir, "kg_communities",
                      lambda: _o.expected_label_propagation(
                          _oracle_triples_table(sf_dir)))
        return label_propagation(_distinct_edge_ds(sf_dir),
                                 src="subj_norm", dst="obj_norm")

    q["kg_communities"] = q_kg_communities

    def q_kg_hits(sf_dir: str):
        # HITS hubs/authorities as the exact fixed-point integer spec
        # (max-rescale in micro-units); |V|-bounded broadcast contract,
        # streamed-pass path pinned in tests; oracle = dict re-walk
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import hits_scores

        _write_oracle(sf_dir, "kg_hits",
                      lambda: _o.expected_hits(_oracle_triples_table(sf_dir)))
        return hits_scores(_distinct_edge_ds(sf_dir),
                           src="subj_norm", dst="obj_norm")

    q["kg_hits"] = q_kg_hits

    def q_kg_clustering(sf_dir: str):
        # local clustering coefficient: triangle counts + degree, exact
        # scaled-integer cc, one bucketed LEFT join; SQL oracle extends the
        # kg_triangles self-join CTE with the degree table
        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).materialize()
        return kgp.clustering_coefficient(edges, scale=10_000,
                                          salt_buckets=4)

    q["kg_clustering"] = q_kg_clustering

    def q_orders_percentile(sf_dir: str):
        # exact percent_rank over large partitions: distinct (group, price)
        # counts, then the two-phase banded ordered_prefix_sum (few
        # partitions, each spanning the dataset — the opposite regime of
        # the per-key cumsum family); all rank arithmetic integer
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import ordered_prefix_sum

        counts = grouped_count(
            _read(sf_dir, "orders", ["o_orderpriority", "o_totalprice"]),
            ["o_orderpriority", "o_totalprice"], out_name="n").materialize()
        totals = {r["o_orderpriority"]: int(r["n_grp"])
                  for r in partial_final_agg(
                      counts, ["o_orderpriority"],
                      [("n_grp", "n", "sum")]).take_all()}
        tot_ref = ray.put(totals)
        pre = ordered_prefix_sum(counts, "o_orderpriority", "o_totalprice",
                                 "n", out_col="cum_n")

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            tot = ray.get(tot_ref)
            n_grp = df["o_orderpriority"].map(tot).astype("int64")
            n = df["n"].to_numpy("int64")
            cum = df["cum_n"].to_numpy("int64")
            den = np.maximum(n_grp.to_numpy() - 1, 1)
            return pd.DataFrame({
                "o_orderpriority": df["o_orderpriority"],
                "o_totalprice": df["o_totalprice"],
                "n": n, "cum_n": cum, "n_grp": n_grp,
                "pct_scaled": ((cum - n) * 1_000_000) // den,
            })

        return pre.map_batches(finish, batch_format="pandas")

    q["orders_percentile"] = q_orders_percentile

    def q_events_interarrival(sf_dir: str):
        # per-type inter-event gap statistics: deterministic (ts, event_id)
        # ordering inside coarse user buckets, exact microsecond integers
        from dygiepp_ray.aggregates import partial_final_agg
        from dygiepp_ray.windows import lag_diff

        ds = _read(sf_dir, "events",
                   ["event_id", "user_id", "event_type", "ts"])
        lagged = lag_diff(ds, ["user_id", "event_type"],
                          ["ts", "event_id"], value_col="ts",
                          out_col="gap")

        def per_block(df: pd.DataFrame) -> pd.DataFrame:
            g = df.dropna(subset=["gap"])
            us = (g["gap"] // pd.Timedelta(microseconds=1)).astype("int64")
            t = pd.DataFrame({"event_type": g["event_type"], "gap_us": us})
            gg = (t.groupby("event_type", sort=False)["gap_us"]
                  .agg(["count", "sum"]).reset_index())
            return pd.DataFrame({"event_type": gg["event_type"],
                                 "n_p": gg["count"].astype("int64"),
                                 "s_p": gg["sum"].astype("int64")})

        agg = partial_final_agg(
            lagged.map_batches(per_block, batch_format="pandas"),
            ["event_type"], [("n_gaps", "n_p", "sum"),
                             ("sum_gap_us", "s_p", "sum")])

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n_gaps"].to_numpy("int64")
            s = df["sum_gap_us"].to_numpy("int64")
            return pd.DataFrame({"event_type": df["event_type"],
                                 "n_gaps": n, "sum_gap_us": s,
                                 "mean_gap_us": s // np.maximum(n, 1)})

        return agg.map_batches(finish, batch_format="pandas")

    q["events_interarrival"] = q_events_interarrival

    def q_repo_stats(sf_dir: str):
        # per-repository inventory over the north-rule corpus shape: one
        # scan, distinct-pair (repo, kind, value) dedup shuffle, tiny final
        # sum; oracle = raw corpus + independent hashlib sha, aggregated in
        # SQL
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.repostats import repo_stats

        corpus_dir = _synth_corpus_dir(sf_dir)
        _write_oracle(sf_dir, "corpus_sha",
                      lambda: _o.expected_corpus_sha(corpus_dir))
        return repo_stats(ray.data.read_parquet(corpus_dir))

    q["repo_stats"] = q_repo_stats

    def q_repo_clones(sf_dir: str):
        # cross-repo exact clone detection on the content_sha256 invariant:
        # two partial+final shuffles, no content leaves the scan tasks
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.repostats import cross_repo_clones

        corpus_dir = _synth_corpus_dir(sf_dir)
        _write_oracle(sf_dir, "corpus_sha",
                      lambda: _o.expected_corpus_sha(corpus_dir))
        return cross_repo_clones(ray.data.read_parquet(corpus_dir),
                                 min_repos=2)

    q["repo_clones"] = q_repo_clones

    def q_kg_pagerank(sf_dir: str):
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import pagerank_fixedpoint

        _write_oracle(sf_dir, "kg_pagerank",
                      lambda: _o.expected_pagerank(_oracle_triples_table(sf_dir)))
        return pagerank_fixedpoint(_distinct_edge_ds(sf_dir),
                                   src="subj_norm", dst="obj_norm",
                                   mode="broadcast")

    q["kg_pagerank"] = q_kg_pagerank

    def q_kg_ppr(sf_dir: str):
        # PageRank personalized to the 3 lexicographically-smallest
        # subjects (entity relatedness): exact-int64 fixed point, teleport
        # mass pinned to the seed set; oracle = single-threaded dict
        # re-walk of the identical spec
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.graph import personalized_pagerank

        def seed_list() -> list[str]:
            t = _oracle_triples_table(sf_dir)
            return sorted(set(t.column("subj_norm").to_pylist()))[:3]

        _write_oracle(sf_dir, "kg_ppr",
                      lambda: _o.expected_personalized_pagerank(
                          _oracle_triples_table(sf_dir), seed_list()))
        edges = _distinct_edge_ds(sf_dir).materialize()
        seeds = (grouped_count(edges.select_columns(["subj_norm"]),
                               ["subj_norm"], out_name="_n")
                 .select_columns(["subj_norm"])
                 .sort("subj_norm").limit(3).map_batches(
                     lambda t: t.rename_columns(["node"]),
                     batch_format="pyarrow").materialize())
        return personalized_pagerank(edges, seeds, src="subj_norm",
                                     dst="obj_norm", mode="broadcast")

    q["kg_ppr"] = q_kg_ppr

    def q_kg_scc(sf_dir: str):
        # taxonomy-cycle QA: strongly connected components of the
        # HYPONYM-OF subgraph (a non-singleton SCC = a hierarchy cycle);
        # deterministic BSP trim+coloring, oracle = iterative Tarjan
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import strip_schema_metadata
        from dygiepp_ray.stages.graph import strongly_connected_components

        PRED = "HYPONYM-OF"
        _write_oracle(sf_dir, "kg_scc",
                      lambda: _o.expected_scc(_oracle_triples_table(sf_dir),
                                              pred=PRED))
        tri = _synth_triples(sf_dir).select_columns(
            ["subj_norm", "pred", "obj_norm"])

        def keep(t):
            t = strip_schema_metadata(t)
            return t.filter(pc.equal(t.column("pred"), PRED)).select(
                ["subj_norm", "obj_norm"])

        edges = grouped_count(
            tri.map_batches(keep, batch_format="pyarrow"),
            ["subj_norm", "obj_norm"], out_name="_n"
        ).select_columns(["subj_norm", "obj_norm"])
        return strongly_connected_components(edges, src="subj_norm",
                                             dst="obj_norm")

    q["kg_scc"] = q_kg_scc

    def q_kg_negative_samples(sf_dir: str):
        # corrupt-tail negative sampling (KG-embedding training data):
        # splitmix64 draws into the broadcast sorted vocabulary, own-tail
        # drop inline, true-edge collisions removed by one bucketed
        # anti-join marker pass (filtered, not re-drawn — contract)
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "kg_negative_samples",
                      lambda: _o.expected_negative_samples(
                          _oracle_triples_table(sf_dir), k=2))
        return kgp.negative_samples(_synth_triples(sf_dir), k=2)

    q["kg_negative_samples"] = q_kg_negative_samples

    def q_kg_transe_eval(sf_dir: str):
        # TransE-style link-ranking eval (raw MRR / hits@k) under
        # deterministic hash embeddings: broadcast vocab, one streaming
        # rank pass with per-(block, pred) partials — no joins
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "kg_transe_eval",
                      lambda: _o.expected_transe_eval(
                          _oracle_triples_table(sf_dir), dim=16, k_neg=32))
        return kgp.transe_eval(_synth_triples(sf_dir), dim=16, k_neg=32)

    q["kg_transe_eval"] = q_kg_transe_eval

    def q_kg_inverse_detect(sf_dir: str):
        # inverse/symmetric predicate detection (reverse-relation leakage
        # QA, Toutanova & Chen 2015): one bucketed self-join of the
        # distinct edge table against its reversed copy, per-bucket
        # (pred_a, pred_b) partials; overlap fraction in exact scaled ints
        _ensure_triples_oracle(sf_dir)
        return kgp.inverse_predicates(_synth_triples(sf_dir),
                                      salt_buckets=4)

    q["kg_inverse_detect"] = q_kg_inverse_detect

    def q_kg_khop(sf_dir: str):
        # 2-hop subgraph expansion from the 5 lexicographically-smallest
        # subjects: each hop is ONE bucketed semi-join of the distinct edge
        # table against the frontier (frontier stays a Dataset — no driver
        # node sets), min-hop combined with a partial+final aggregation.
        from dygiepp_ray.stages.graph import khop_subgraph

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).materialize()
        seeds = (grouped_count(edges.select_columns(["subj_norm"]),
                               ["subj_norm"], out_name="_n")
                 .select_columns(["subj_norm"])
                 .sort("subj_norm").limit(5).materialize())
        return khop_subgraph(edges, seeds, src="subj_norm", dst="obj_norm",
                             hops=2, node_type=pa.string())

    q["kg_khop_subgraph"] = q_kg_khop

    def q_kg_bfs_distances(sf_dir: str):
        # multi-source unweighted shortest paths within 3 hops of the 3
        # highest-degree entities (deterministic (deg DESC, name) tie-break
        # mirrored in the oracle's ORDER BY): per round ONE bucketed
        # semi-join + grouped distinct, min-dist partial+final at the end.
        from dygiepp_ray.aggregates import strip_schema_metadata
        from dygiepp_ray.stages.graph import bfs_distances

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).materialize()

        def sym(t):
            t = strip_schema_metadata(t)
            u = t.column("subj_norm")
            v = t.column("obj_norm")
            c = pa.chunked_array(list(u.chunks) + list(v.chunks), u.type)
            n = pa.chunked_array(list(v.chunks) + list(u.chunks), u.type)
            return pa.table({"node": c, "nb": n})

        adj = grouped_count(
            edges.map_batches(sym, batch_format="pyarrow"),
            ["node", "nb"], out_name="_c").select_columns(["node", "nb"])
        deg = grouped_count(adj.select_columns(["node"]), ["node"],
                            out_name="deg")
        seeds = (deg.sort(["deg", "node"], descending=[True, False])
                 .limit(3).select_columns(["node"]).materialize())
        return bfs_distances(edges, seeds, src="subj_norm", dst="obj_norm",
                             max_rounds=3, undirected=True,
                             node_type=pa.string())

    q["kg_bfs_distances"] = q_kg_bfs_distances

    def q_kg_closeness(sf_dir: str):
        # sampled-source closeness/harmonic centrality: per-seed BFS
        # distances from the 3 highest-degree hubs (same deterministic
        # seed rule as kg_bfs_distances) in ONE fused per-seed frontier
        # pipeline (bfs_distances_per_seed: k seeds cost the same dataset
        # executions as one), then a per-node exact-int reduce:
        # n_sources reaching, dist_sum, harmonic_ppm = sum 1e6//d. All
        # integer — no float centrality normalization to drift.
        from dygiepp_ray.aggregates import (partial_final_agg,
                                            strip_schema_metadata)
        from dygiepp_ray.stages.graph import bfs_distances_per_seed

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).materialize()

        def sym(t):
            t = strip_schema_metadata(t)
            u = t.column("subj_norm")
            v = t.column("obj_norm")
            c = pa.chunked_array(list(u.chunks) + list(v.chunks), u.type)
            n = pa.chunked_array(list(v.chunks) + list(u.chunks), u.type)
            return pa.table({"node": c, "nb": n})

        adj = grouped_count(
            edges.map_batches(sym, batch_format="pyarrow"),
            ["node", "nb"], out_name="_c").select_columns(["node", "nb"])
        deg = grouped_count(adj.select_columns(["node"]), ["node"],
                            out_name="deg")
        seeds = (deg.sort(["deg", "node"], descending=[True, False])
                 .limit(3).select_columns(["node"]).materialize())
        dists = bfs_distances_per_seed(
            edges, seeds, src="subj_norm", dst="obj_norm",
            max_rounds=3, undirected=True, node_type=pa.string())

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            d = df["dist"].to_numpy("int64")
            return pd.DataFrame({
                "node": df["node"],
                "n_p": np.ones(len(df), "int64"),
                "d_p": d,
                "h_p": np.where(d > 0, 1_000_000 // np.maximum(d, 1), 0)})

        return partial_final_agg(
            dists.map_batches(partials, batch_format="pandas"),
            ["node"], [("n_sources", "n_p", "sum"),
                       ("dist_sum", "d_p", "sum"),
                       ("harmonic_ppm", "h_p", "sum")])

    q["kg_closeness"] = q_kg_closeness

    def q_kg_eccentricity(sf_dir: str):
        # per-hub bounded eccentricity: same fused per-seed BFS as
        # kg_closeness, reduced per SEED instead of per node — reach
        # count, max distance (within the 3-round horizon), exact mean
        # distance in scaled ppm (floor)
        from dygiepp_ray.aggregates import (partial_final_agg,
                                            strip_schema_metadata)
        from dygiepp_ray.stages.graph import bfs_distances_per_seed

        _ensure_triples_oracle(sf_dir)
        edges = _distinct_edge_ds(sf_dir).materialize()

        def sym(t):
            t = strip_schema_metadata(t)
            u = t.column("subj_norm")
            v = t.column("obj_norm")
            c = pa.chunked_array(list(u.chunks) + list(v.chunks), u.type)
            n = pa.chunked_array(list(v.chunks) + list(u.chunks), u.type)
            return pa.table({"node": c, "nb": n})

        adj = grouped_count(
            edges.map_batches(sym, batch_format="pyarrow"),
            ["node", "nb"], out_name="_c").select_columns(["node", "nb"])
        deg = grouped_count(adj.select_columns(["node"]), ["node"],
                            out_name="deg")
        seeds = (deg.sort(["deg", "node"], descending=[True, False])
                 .limit(3).select_columns(["node"]).materialize())
        dists = bfs_distances_per_seed(
            edges, seeds, src="subj_norm", dst="obj_norm",
            max_rounds=3, undirected=True, node_type=pa.string())

        def partials(df: pd.DataFrame) -> pd.DataFrame:
            d = df["dist"].to_numpy("int64")
            g = pd.DataFrame({"seed": df["seed"],
                              "n_p": np.ones(len(df), "int64"),
                              "d_p": d, "m_p": d})
            return g.groupby("seed", as_index=False).agg(
                n_p=("n_p", "sum"), d_p=("d_p", "sum"), m_p=("m_p", "max"))

        agg = partial_final_agg(
            dists.map_batches(partials, batch_format="pandas"),
            ["seed"], [("n_reached", "n_p", "sum"),
                       ("dist_sum", "d_p", "sum"),
                       ("eccentricity", "m_p", "max")])

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            n = df["n_reached"].to_numpy("int64")
            s = df["dist_sum"].to_numpy("int64")
            return df.assign(
                mean_dist_ppm=s * 1_000_000 // np.maximum(n, 1))

        return agg.map_batches(finish, batch_format="pandas")

    q["kg_eccentricity"] = q_kg_eccentricity

    def q_kg_extraction_density(sf_dir: str):
        # extraction-quality QA per document: triple count, distinct
        # active sentences, triples-per-active-sentence in exact ppm —
        # the "is the extractor dead/hyperactive on this slice" report.
        # Distinct (doc, sentence) via per-block dedup + one grouped
        # count; combined with the per-doc triple count by a bucketed
        # join (doc cardinality is corpus-scale — never a broadcast).
        from dygiepp_ray.aggregates import (distinct_first,
                                            partial_final_agg)
        from dygiepp_ray.joins import hash_join

        _ensure_triples_oracle(sf_dir)
        tri = _synth_triples(sf_dir).materialize()
        per_doc = partial_final_agg(
            tri.map_batches(
                lambda df: pd.DataFrame(
                    {"doc_id": df["doc_id"],
                     "one": np.ones(len(df), "int64")}),
                batch_format="pandas"),
            ["doc_id"], [("n_triples", "one", "sum")])
        sents = distinct_first(
            tri.select_columns(["doc_id", "sentence"]),
            ["doc_id", "sentence"])
        per_sent = partial_final_agg(
            sents.map_batches(
                lambda df: pd.DataFrame(
                    {"doc_id": df["doc_id"],
                     "one": np.ones(len(df), "int64")}),
                batch_format="pandas"),
            ["doc_id"], [("n_active_sents", "one", "sum")])

        def finish(df: pd.DataFrame) -> pd.DataFrame:
            t = df["n_triples"].to_numpy("int64")
            s = df["n_active_sents"].to_numpy("int64")
            return df.assign(
                density_ppm=t * 1_000_000 // np.maximum(s, 1))

        joined = hash_join(
            per_doc, per_sent, on="doc_id", n_buckets=16,
            left_types={"doc_id": pa.string(), "n_triples": pa.int64()},
            right_types={"doc_id": pa.string(),
                         "n_active_sents": pa.int64()})
        return joined.map_batches(finish, batch_format="pandas")

    q["kg_extraction_density"] = q_kg_extraction_density

    def q_kg_edge_confidence(sf_dir: str):
        # per-edge assertion-confidence profile: n_assertions plus exact
        # scaled (1e4) min/max/sum of the 4-dp kernel confidences — the
        # fusion input a posterior-weighting pass consumes. One salted
        # partial+final aggregate over the raw (non-distinct) triples.
        from dygiepp_ray.aggregates import partial_final_agg

        _ensure_triples_oracle(sf_dir)

        def prep(df: pd.DataFrame) -> pd.DataFrame:
            c4 = np.floor(df["conf"].to_numpy(np.float64) * 1e4
                          + 0.5).astype("int64")
            return pd.DataFrame({
                "subj_norm": df["subj_norm"], "pred": df["pred"],
                "obj_norm": df["obj_norm"], "c4": c4,
                "one": np.ones(len(df), "int64")})

        tri = _synth_triples(sf_dir).select_columns(
            ["subj_norm", "pred", "obj_norm", "conf"]).map_batches(
            prep, batch_format="pandas")
        return partial_final_agg(
            tri, ["subj_norm", "pred", "obj_norm"],
            [("n_assertions", "one", "sum"),
             ("conf_min_scaled", "c4", "min"),
             ("conf_max_scaled", "c4", "max"),
             ("conf_sum_scaled", "c4", "sum")])

    q["kg_edge_confidence"] = q_kg_edge_confidence

    def q_kg_blocking_recall(sf_dir: str):
        # ER blocking-quality audit: production 16-band alias blocking vs
        # the exhaustive-recall width-1 banding (coarse ⊆ fine by band
        # nesting), one-row recall report; both sides stay banded — the
        # all-pairs truth lives only in the oracle at tiny scale
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.linking import alias_blocking_recall

        _write_oracle(sf_dir, "kg_blocking_recall",
                      lambda: _o.expected_alias_blocking_recall(
                          _oracle_triples_table(sf_dir)))
        return alias_blocking_recall(_synth_triples(sf_dir))

    q["kg_blocking_recall"] = q_kg_blocking_recall

    def q_kg_type_propagation(sf_dir: str):
        # KG completion by seeded label spreading: kg_type_infer's modal
        # types are the seeds; untyped entities adopt the modal type of
        # typed neighbors over 2 synchronous rounds (monotone, min-type
        # ties) — broadcast contract with local + streamed vote paths
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import argmax_per_key
        from dygiepp_ray.stages.graph import seeded_type_propagation

        _ensure_triples_oracle(sf_dir)
        _write_oracle(sf_dir, "kg_mention_counts",
                      lambda: _o.expected_mention_counts(
                          _oracle_docs_table(sf_dir),
                          {**ENTITY_LEXICON, **DOC_LEXICON}))

        def _types_table():
            mc = _o.expected_mention_counts(
                _oracle_docs_table(sf_dir),
                {**ENTITY_LEXICON, **DOC_LEXICON})
            df = mc.to_pandas().sort_values(
                ["mention_norm", "n", "label"],
                ascending=[True, False, True]).groupby(
                "mention_norm", sort=False).head(1)
            return pa.table({
                "entity": pa.array(df["mention_norm"].tolist(),
                                   pa.string()),
                "etype": pa.array(df["label"].tolist(), pa.string())})

        _write_oracle(sf_dir, "kg_type_propagation",
                      lambda: _o.expected_type_propagation(
                          _oracle_triples_table(sf_dir), _types_table()))

        mentions = _docs_predicted(sf_dir).map_batches(
            flatten_ner_mentions, batch_format="pyarrow")
        counts = grouped_count(
            mentions.select_columns(["mention_norm", "label"]),
            ["mention_norm", "label"], out_name="n", salt_buckets=8)
        seeds = argmax_per_key(
            counts, key="mention_norm", order_cols=["n", "label"],
            ascending=[False, True],
            keep_cols=["mention_norm", "label", "n"]).map_batches(
            lambda df: pd.DataFrame({"entity": df["mention_norm"],
                                     "etype": df["label"]}),
            batch_format="pandas")
        return seeded_type_propagation(
            _distinct_edge_ds(sf_dir), seeds,
            src="subj_norm", dst="obj_norm", n_iter=2)

    q["kg_type_propagation"] = q_kg_type_propagation

    def q_kg_pred_paths(sf_dir: str):
        # 2-hop predicate path statistics (schema induction): one bucketed
        # self-join on the shared mid entity, per-bucket (pred_a, pred_b)
        # partial counts — path rows never leave the join task
        _ensure_triples_oracle(sf_dir)
        return kgp.pred_path_counts(_synth_triples(sf_dir), salt_buckets=4)

    q["kg_pred_paths"] = q_kg_pred_paths

    def q_kg_rule_mining(sf_dir: str):
        # AMIE-lite 2-hop Horn rules pred_c(x,z) <= pred_a(x,y) & pred_b(y,z)
        # with integer-scaled standard confidence; the mid-degree cap (64)
        # bounds the path fanout and is part of the operator contract (the
        # SQL oracle applies the identical filter)
        _ensure_triples_oracle(sf_dir)
        return kgp.rule_mining(_synth_triples(sf_dir), max_mid_degree=64,
                               min_support=1, salt_buckets=4)

    q["kg_rule_mining"] = q_kg_rule_mining

    def q_kg_domain_range(sf_dir: str):
        # predicate domain/range signature induction: edges typed by the
        # modal-mention-label table (kg_type_infer's reduce) through two
        # bucketed left joins with in-task signature partials; per-pred
        # totals attached with a tiny join, share in exact scaled ints
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import argmax_per_key

        _ensure_triples_oracle(sf_dir)
        _write_oracle(sf_dir, "kg_mention_counts",
                      lambda: _o.expected_mention_counts(
                          _oracle_docs_table(sf_dir),
                          {**ENTITY_LEXICON, **DOC_LEXICON}))
        mentions = _docs_predicted(sf_dir).map_batches(
            flatten_ner_mentions, batch_format="pyarrow")
        counts = grouped_count(
            mentions.select_columns(["mention_norm", "label"]),
            ["mention_norm", "label"], out_name="n", salt_buckets=8)
        types = argmax_per_key(
            counts, key="mention_norm", order_cols=["n", "label"],
            ascending=[False, True],
            keep_cols=["mention_norm", "label", "n"]).map_batches(
            lambda df: pd.DataFrame({"entity": df["mention_norm"],
                                     "etype": df["label"]}),
            batch_format="pandas")
        return kgp.domain_range_signatures(_synth_triples(sf_dir), types,
                                           salt_buckets=4)

    q["kg_domain_range"] = q_kg_domain_range

    def q_kg_calibration(sf_dir: str):
        # reliability diagram of the LEARNED extractor against the
        # full-lexicon gold: equal-width confidence bins over the observed
        # envelope (two broadcast scalars), one bucketed left-join marker
        # pass with per-bin partials; precision in exact scaled ints
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.pipelines.evaluate import calibration_bins

        _ensure_triples_oracle(sf_dir)
        path = _learned_weights_path()
        _write_oracle(sf_dir, "kg_triples_learned",
                      lambda: _o.expected_triples_learned(
                          _synth_corpus_dir(sf_dir), path))
        preds = kgp.kg_triples(_synth_corpus_dir(sf_dir),
                               concurrency=_kernel_conc(),
                               weights_path=path)
        return calibration_bins(preds, _synth_triples(sf_dir),
                                n_bins=10, salt_buckets=4)

    q["kg_calibration"] = q_kg_calibration

    def q_source_quality_filter(sf_dir: str):
        # per-source quality curation (RefinedWeb/C4-style domain filter):
        # vectorized scoring, per-block per-source partials, ONE salted
        # aggregate; mean kept in exact scaled-integer arithmetic
        from dygiepp_ray.stages.curate import source_quality_stats

        return source_quality_stats(
            _read(sf_dir, "documents", ["doc_id", "text", "source"]),
            threshold_scaled=450_000, salt_buckets=4)

    q["source_quality_filter"] = q_source_quality_filter

    def q_kg_alias_type_conflicts(sf_dir: str):
        # sameAs QA: per-cluster type profile of every multi-member alias
        # cluster (over-eager merges visible as n_types >= 2; min_types=0
        # keeps the profile non-degenerate on corpora whose clusters are
        # type-pure). Same LSH/CC passes as kg_alias_merge; types attach
        # via bucketed left join; per-component reduce on coarse buckets
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.aggregates import argmax_per_key
        from dygiepp_ray.stages.linking import alias_type_conflicts

        _write_oracle(sf_dir, "kg_alias_mapping",
                      lambda: _o.expected_alias_mapping(
                          _oracle_triples_table(sf_dir)))
        _write_oracle(sf_dir, "kg_mention_counts",
                      lambda: _o.expected_mention_counts(
                          _oracle_docs_table(sf_dir),
                          {**ENTITY_LEXICON, **DOC_LEXICON}))
        mentions = _docs_predicted(sf_dir).map_batches(
            flatten_ner_mentions, batch_format="pyarrow")
        counts = grouped_count(
            mentions.select_columns(["mention_norm", "label"]),
            ["mention_norm", "label"], out_name="n", salt_buckets=8)
        types = argmax_per_key(
            counts, key="mention_norm", order_cols=["n", "label"],
            ascending=[False, True],
            keep_cols=["mention_norm", "label", "n"]).map_batches(
            lambda df: pd.DataFrame({"entity": df["mention_norm"],
                                     "etype": df["label"]}),
            batch_format="pandas")
        return alias_type_conflicts(_synth_triples(sf_dir), types,
                                    min_members=2, min_types=0)

    q["kg_alias_type_conflicts"] = q_kg_alias_type_conflicts

    def q_embedding_quantize(sf_dir: str):
        # SQ8 scalar quantization summary: per-dim global envelope from one
        # tiny per-block partial pass (2 x dim scalars broadcast back), then
        # one vectorized quantizing map; exact int outputs
        from dygiepp_ray.stages.similarity import scalar_quantize_stats

        return scalar_quantize_stats(
            _read(sf_dir, "embeddings", ["vec_id", "embedding"]))

    q["embedding_quantize"] = q_embedding_quantize

    def q_label_centroids(sf_dir: str):
        # per-class embedding prototypes in exact fixed-point arithmetic:
        # per-block (label, dim) int64 partial sums, ONE partial+final
        # aggregate; truncating integer mean mirrored by DuckDB's //
        from dygiepp_ray.stages.cluster import label_centroids

        return label_centroids(
            _read(sf_dir, "embeddings", ["embedding", "label"]))

    q["label_centroids"] = q_label_centroids

    def q_embedding_link(sf_dir: str):
        # nearest-class-prototype linking (the entity-linking shape over
        # the embeddings table): exact int64 fixed-point distances, tiny
        # prototype table broadcast once; oracle = scalar re-walk
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.cluster import embedding_link

        _write_oracle(sf_dir, "embedding_link",
                      lambda: _o.expected_embedding_link(sf_dir))

        def widen_label(t: "pa.Table") -> "pa.Table":
            i = t.schema.get_field_index("label")
            return t.set_column(i, "label",
                                pc.cast(t.column("label"), pa.int64()))

        return embedding_link(
            _read(sf_dir, "embeddings", ["vec_id", "label", "embedding"])
            .map_batches(widen_label, batch_format="pyarrow"))

    q["embedding_link"] = q_embedding_link

    def q_kg_redundant_edges(sf_dir: str):
        # transitive-reduction candidates: edges implied by a same-pred
        # 2-hop path through a third entity; per-(pred, mid) degree cap
        # (64) is part of the contract (identical filter in the oracle)
        _ensure_triples_oracle(sf_dir)
        return kgp.redundant_edges(_synth_triples(sf_dir),
                                   max_mid_degree=64, salt_buckets=4)

    q["kg_redundant_edges"] = q_kg_redundant_edges

    def q_kg_taxonomy_depth(sf_dir: str):
        # taxonomy layering QA over the HYPONYM-OF subgraph: depth = min
        # hops walking parent -> child from the 3 hub parents with the
        # most DISTINCT children (deterministic (count DESC, name)
        # tie-break; strict no-parent roots don't exist in cyclic
        # extractions, so hub roots keep the contract non-degenerate),
        # bounded at 4 rounds — both knobs mirrored in the recursive oracle
        from dygiepp_ray.aggregates import strip_schema_metadata
        from dygiepp_ray.stages.graph import bfs_distances

        _ensure_triples_oracle(sf_dir)
        tri = _synth_triples(sf_dir).map_batches(
            lambda t: t.filter(pc.equal(t.column("pred"), "HYPONYM-OF")),
            batch_format="pyarrow")
        hyp = grouped_count(
            tri.select_columns(["subj_norm", "obj_norm"]),
            ["subj_norm", "obj_norm"], out_name="_w"
        ).select_columns(["subj_norm", "obj_norm"]).materialize()
        fanout = grouped_count(
            hyp.select_columns(["obj_norm"]).map_batches(
                lambda t: strip_schema_metadata(t).rename_columns(["node"]),
                batch_format="pyarrow"),
            ["node"], out_name="n_children")
        seeds = (fanout.sort(["n_children", "node"],
                             descending=[True, False])
                 .limit(3).select_columns(["node"]).materialize())
        return bfs_distances(hyp, seeds, src="obj_norm",
                             dst="subj_norm", max_rounds=4,
                             undirected=False, node_type=pa.string())

    q["kg_taxonomy_depth"] = q_kg_taxonomy_depth

    def q_doc_novelty(sf_dir: str):
        # per-document corpus novelty (Lee et al. span-dedup profile as a
        # score): distinct k-token windows vs globally-first-won windows,
        # exact integer share; winner rule shared with dedup_spans
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.dedup import doc_novelty

        _write_oracle(sf_dir, "doc_novelty",
                      lambda: _o.expected_doc_novelty(sf_dir, k=10))
        return doc_novelty(_read(sf_dir, "documents", ["doc_id", "text"]),
                           k=10)

    q["doc_novelty"] = q_doc_novelty

    def q_knn_graph(sf_dir: str):
        # approximate kNN graph: top-5 cosine neighbors within each
        # coarse k-means cell (nprobe=1, SemDeDup scope contract); one
        # assignment pass + one cell shuffle, chunked in-cell GEMM
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.cluster import knn_graph

        _write_oracle(sf_dir, "knn_graph",
                      lambda: _o.expected_knn_graph(sf_dir, k=5,
                                                    n_clusters=8, n_iter=4))
        cents = _fit_centroids(sf_dir, k=8, n_iter=4)
        return knn_graph(_read(sf_dir, "embeddings",
                               ["vec_id", "embedding"]), cents, k=5)

    q["knn_graph"] = q_knn_graph

    def q_kg_functional_repair(sf_dir: str):
        # functional-slot conflict RESOLUTION: per (subj, pred) keep the
        # object with the most raw assertions (support DESC, obj ASC tie);
        # one salted support count + one coarse-bucket argmax reduce
        _ensure_triples_oracle(sf_dir)
        return kgp.functional_repair(_synth_triples(sf_dir), salt_buckets=4)

    q["kg_functional_repair"] = q_kg_functional_repair

    def q_kg_link_predict(sf_dir: str):
        # common-neighbor link prediction: candidate non-edges scored by
        # shared-neighbor counts; per-center degree cap (64) bounds the
        # wedge fanout and is part of the operator contract (the SQL oracle
        # applies the identical filter)
        _ensure_triples_oracle(sf_dir)
        return kgp.link_prediction(_synth_triples(sf_dir),
                                   max_center_degree=64, min_common=2,
                                   salt_buckets=4)

    q["kg_link_predict"] = q_kg_link_predict

    def q_kg_resource_allocation(sf_dir: str):
        # Resource-Allocation link prediction (Zhou, Lu & Zhang 2009):
        # the common-neighbor wedge machinery, each wedge additionally
        # weighted floor(1e12 / deg(center)) — the log-free cousin of
        # Adamic-Adar whose scoring is exactly mirrorable in integer SQL
        _ensure_triples_oracle(sf_dir)
        return kgp.link_prediction(_synth_triples(sf_dir),
                                   max_center_degree=64, min_common=2,
                                   salt_buckets=4,
                                   ra_scale=1_000_000_000_000)

    q["kg_resource_allocation"] = q_kg_resource_allocation

    def q_kg_neighbor_jaccard(sf_dir: str):
        # neighborhood-Jaccard entity-resolution candidates: pairs sharing
        # >= 2 neighbors scored by integer-scaled Jaccard of their FULL
        # neighborhoods; the per-center degree cap (64) bounds wedge fanout
        # and is mirrored in the SQL oracle (operator contract). Existing
        # edges stay, flagged is_edge.
        _ensure_triples_oracle(sf_dir)
        return kgp.neighborhood_jaccard(_synth_triples(sf_dir),
                                        max_center_degree=64, min_common=2,
                                        salt_buckets=4)

    q["kg_neighbor_jaccard"] = q_kg_neighbor_jaccard

    def q_kg_alias_merge(sf_dir: str):
        # canonical-entity merging beyond the rule canonicalizer: cluster
        # the {surface ∪ rule-canonical} name vocabulary by char-trigram
        # similarity (char-minhash LSH + exact verify), re-key the edge
        # table through the cluster representative with two bucketed left
        # joins, re-aggregate weights (north rule: canonicalization)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.linking import alias_merge_edges

        _write_oracle(sf_dir, "kg_alias_merge",
                      lambda: _o.expected_alias_merge(
                          _oracle_triples_table(sf_dir)))
        return alias_merge_edges(_synth_triples(sf_dir))

    q["kg_alias_merge"] = q_kg_alias_merge

    def q_kg_edge_provenance(sf_dir: str):
        # provenance rollup per KB edge (SURVEY §7 graph-materialize shape:
        # (subj,pred,obj,...,provenance)): distinct supporting docs per
        # edge + the smallest doc id as the sample citation. Two shrinking
        # partial+final aggregations — the first dedups (edge, doc) pairs
        # per block before its shuffle, the second runs over one row per
        # (edge, doc).
        _ensure_triples_oracle(sf_dir)
        tri = _synth_triples(sf_dir).select_columns(
            ["subj_norm", "pred", "obj_norm", "doc_id"])
        edge_doc = grouped_count(
            tri, ["subj_norm", "pred", "obj_norm", "doc_id"], out_name="_n"
        ).select_columns(["subj_norm", "pred", "obj_norm", "doc_id"])
        from dygiepp_ray.aggregates import partial_final_agg

        return partial_final_agg(
            edge_doc, ["subj_norm", "pred", "obj_norm"],
            [("n_docs", None, "count"), ("first_doc", "doc_id", "min")])

    q["kg_edge_provenance"] = q_kg_edge_provenance

    def q_kg_store_lookup(sf_dir: str):
        # subject-hash-partitioned triple store (serving-side layout) +
        # point lookup that reads ONLY the probed partitions; store cached
        # per corpus fingerprint (stale-store guard, ADVICE r2 pattern)
        import os as _os
        import shutil as _shutil

        from dygiepp_ray.pipelines.kg import materialize_by_subject, subject_lookup

        _ensure_triples_oracle(sf_dir)
        corpus = _synth_corpus_dir(sf_dir)
        sts = [_os.stat(_os.path.join(corpus, f))
               for f in sorted(_os.listdir(corpus))
               if f.endswith(".parquet")]
        # corpus fingerprint + code salt (kernel/store code changes must
        # invalidate the cached store), built into a temp dir renamed into
        # place atomically so concurrent runs never see a half-built store
        fp = (f"{sum(s.st_mtime_ns for s in sts):x}-"
              f"{sum(s.st_size for s in sts):x}-{_code_salt()}")
        store = f"/tmp/dygiepp_ray_kgstore/{_sf_tag(sf_dir)}-{fp}"
        if not _os.path.isdir(store):
            tmp = f"{store}.build-{_os.getpid()}"
            _shutil.rmtree(tmp, ignore_errors=True)
            materialize_by_subject(_synth_triples(sf_dir), tmp)
            try:
                _os.rename(tmp, store)
            except OSError:  # another run won the rename race
                _shutil.rmtree(tmp, ignore_errors=True)
        hits = subject_lookup(store, ["hash join", "merge sort", "zzz-missing"])
        return grouped_count(hits, ["subj_norm", "pred", "obj_norm"],
                             out_name="n")

    q["kg_store_lookup"] = q_kg_store_lookup

    def q_kg_diff(sf_dir: str):
        # KG-maintenance diff between two builds (full-lexicon old vs
        # reduced-lexicon new): removed / changed / added edges with both
        # weights; zero-padded union + one grouped sum IS the full-outer
        # join on the edge key — no driver sets, unchanged edges dropped
        from dygiepp_ray.pipelines.kg import edge_diff

        _ensure_triples_oracle(sf_dir)
        _write_oracle(sf_dir, "kg_triples_reduced",
                      lambda: _oracle_triples_table(sf_dir, reduced=True))
        return edge_diff(_synth_triples(sf_dir), _reduced_triples(sf_dir))

    q["kg_diff"] = q_kg_diff

    def q_collate_stats(sf_dir: str):
        # P5 collate over the documents-as-docs table: sentence conservation
        from dygiepp_ray.stages.collate import collate
        from ray.data.aggregate import Sum as _Sum

        docs = kgp.documents_dataset(documents_as_corpus(sf_dir))
        packed = collate(docs, max_spans=20000, max_sentences=16)

        def counts(t: pa.Table) -> pa.Table:
            sents = t.column("sentences").to_pylist()
            return pa.table({"n_sentences": pa.array([sum(len(s) for s in sents)], pa.int64())})

        return packed.map_batches(counts, batch_format="pyarrow").aggregate(
            _Sum("n_sentences", alias_name="total_sentences")
        ) or {}

    def q_collate(sf_dir: str):
        import pandas as _pd

        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "collate_pack",
                      lambda: _o.expected_collate_total(_oracle_docs_table(sf_dir)))
        res = q_collate_stats(sf_dir)
        return _pd.DataFrame({"total_sentences": [res["total_sentences"]]})

    q["collate_pack"] = q_collate

    def q_uncollate(sf_dir: str):
        # P5→extract→P6 round trip: per-sentence predictions are invariant to
        # packing; reports doc counts and total predicted-mention parity
        from dygiepp_ray.stages.collate import collate, uncollate_predictions

        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "uncollate_roundtrip",
                      lambda: _o.expected_uncollate_counts(
                          _oracle_docs_table(sf_dir), ENTITY_LEXICON))
        docs = kgp.documents_dataset(documents_as_corpus(sf_dir)).materialize()
        direct = kgp.extract(docs, concurrency=(1, 2))
        n_direct_mentions = direct.map_batches(
            lambda t: pa.table({"n": [sum(len(s) for doc in
                                          t.column("predicted_ner").to_pylist()
                                          for s in doc)]}),
            batch_format="pyarrow",
        ).sum("n")
        packed_pred = kgp.extract(collate(docs), concurrency=(1, 2))
        back = uncollate_predictions(packed_pred)
        n_back_mentions = back.map_batches(
            lambda df: pd.DataFrame({"n": [sum(len(s) for doc in df["predicted_ner"]
                                               for s in doc)]}),
            batch_format="pandas",
        ).sum("n")
        return pd.DataFrame(
            {
                "n_docs": [back.count()],
                "n_docs_orig": [docs.count()],
                "n_mentions_direct": [int(n_direct_mentions or 0)],
                "n_mentions_roundtrip": [int(n_back_mentions or 0)],
            }
        )

    q["uncollate_roundtrip"] = q_uncollate

    def q_seeded_split(sf_dir: str):
        from dygiepp_ray.stages.misc import seeded_split

        ds = _read(sf_dir, "documents", ["doc_id"])
        parts = seeded_split(ds, [0.8, 0.1, 0.1], seed=100)
        import pandas as _pd

        return _pd.DataFrame(
            {"split": ["train", "dev", "test"], "n": [p.count() for p in parts]}
        )

    q["seeded_split"] = q_seeded_split

    def q_stratified_sample(sf_dir: str):
        # deterministic hash-order sample per stratum (stable across runs,
        # block layouts and cluster sizes — unlike shuffle-based sampling)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.misc import stratified_sample

        _write_oracle(sf_dir, "stratified_sample_orders",
                      lambda: _o.expected_stratified_sample(sf_dir))
        ds = _read(sf_dir, "orders", ["o_orderpriority", "o_orderkey"])
        return stratified_sample(ds, "o_orderpriority", "o_orderkey",
                                 n=20, seed=42)

    q["stratified_sample_orders"] = q_stratified_sample

    def q_term_postings(sf_dir: str):
        # persisted hash-partitioned inverted index; the lookup reads ONLY
        # the buckets the probe terms hash into
        import os as _os

        from dygiepp_ray.stages.invindex import build_inverted_index, term_lookup

        idx = f"/tmp/dygiepp_ray_invidx/{_store_tag(sf_dir, 'documents')}"
        if not _os.path.isdir(idx) or not _os.listdir(idx):
            build_inverted_index(
                _read(sf_dir, "documents", ["doc_id", "text"]), idx)
        return term_lookup(idx, ["scan", "merge", "window", "zzz-missing"])

    q["term_postings"] = q_term_postings

    def q_schema_map(sf_dir: str):
        # P7 over the extracted predictions: remap predicted relation labels,
        # drop the rest; count per mapped label
        _ensure_triples_oracle(sf_dir)
        tri = _synth_triples(sf_dir)
        mapped = tri.map_batches(
            lambda t: t.filter(pc.is_in(t["pred"], value_set=pa.array(["USED-FOR"]))),
            batch_format="pyarrow",
        ).map_batches(
            lambda t: t.set_column(t.column_names.index("pred"), "pred",
                                   pa.array(["MECHANISM"] * t.num_rows, pa.string())),
            batch_format="pyarrow",
        )
        return grouped_count(mapped.select_columns(["pred"]), ["pred"], out_name="n")

    q["schema_map_relations"] = q_schema_map

    def q_coref_merge(sf_dir: str):
        # J2+D1: two models' cluster sets zip-joined on doc_key and merged.
        # Subset by doc_id < 200 (deterministic), not limit() (block-order
        # dependent under parallel reads).

        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "coref_cluster_merge",
                      lambda: _o.expected_cluster_merge(
                          _oracle_docs_table(sf_dir, max_doc_id=200),
                          {**ENTITY_LEXICON, **DOC_LEXICON}, DOC_LEXICON))
        corpus = documents_as_corpus(sf_dir, max_doc_id=200)
        docs = kgp.documents_dataset(corpus)
        a = kgp.extract(docs, concurrency=(1, 2),
                        entity_lexicon={**ENTITY_LEXICON, **DOC_LEXICON})
        b = kgp.extract(docs, concurrency=(1, 2), entity_lexicon=DOC_LEXICON)
        from dygiepp_ray.stages.coref import merge_clusters

        def stamp(side):
            return lambda t: t.append_column("_side", pa.array([side] * t.num_rows))

        au = a.select_columns(["doc_key", "predicted_clusters"]).map_batches(
            stamp("a"), batch_format="pyarrow")
        bu = b.select_columns(["doc_key", "predicted_clusters"]).map_batches(
            stamp("b"), batch_format="pyarrow")

        def zip_merge(df: pd.DataFrame) -> pd.DataFrame:
            # J2 zip-join (1:1 assert) + D1 merge, summarized to flat columns.
            # Model B's clusters are split in half (weaker-model simulation):
            # identical clusters are skipped by the reference's equality rule,
            # so divergent-but-overlapping sets are what the merge is FOR.
            av = df[df["_side"] == "a"]
            bv = df[df["_side"] == "b"]
            assert len(av) == 1 and len(bv) == 1, df["doc_key"].iloc[0]

            def to_lists(clusters):
                if clusters is None:
                    return []
                return [[(m["start"], m["end"]) for m in c] for c in list(clusters)]

            a_cl = to_lists(av["predicted_clusters"].iloc[0])
            b_cl = []
            for c in to_lists(bv["predicted_clusters"].iloc[0]):
                half = max(1, len(c) // 2)
                b_cl.append(c[:half])
                if c[half:]:
                    b_cl.append(c[half:])
            merged = merge_clusters(a_cl, b_cl)
            return pd.DataFrame(
                {"doc_key": [df["doc_key"].iloc[0]], "n_merged_clusters": [len(merged)]}
            )

        return au.union(bu).groupby("doc_key").map_groups(zip_merge, batch_format="pandas")

    q["coref_cluster_merge"] = q_coref_merge

    def _reduced_triples(sf_dir: str):
        # weaker-model simulation: kernel with a reduced entity lexicon
        reduced = {k: v for i, (k, v) in enumerate(sorted(ENTITY_LEXICON.items()))
                   if i % 4 != 0}
        return kgp.kg_triples(_synth_corpus_dir(sf_dir), concurrency=_kernel_conc(),
                              entity_lexicon=reduced)

    def q_kg_eval_prf(sf_dir: str):
        # J3+A2: corpus-level P/R/F1 of the reduced-lexicon model against the
        # full-lexicon model's triples (exact-match metric, greedy dedup)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.pipelines.evaluate import triple_prf

        _write_oracle(sf_dir, "kg_eval_prf",
                      lambda: pa.Table.from_pylist([_o.expected_triple_prf(
                          _oracle_triples_table(sf_dir),
                          _oracle_triples_table(sf_dir, reduced=True))]))

        def shape(ds):
            return ds.map_batches(
                lambda t: pa.table({"doc_id": t["doc_id"], "arg0": t["subj"],
                                    "arg1": t["obj"], "rel": t["pred"]}),
                batch_format="pyarrow",
            )

        res = triple_prf(shape(_synth_triples(sf_dir)), shape(_reduced_triples(sf_dir)))
        return pd.DataFrame([{k: (round(v, 6) if isinstance(v, float) else v)
                              for k, v in res.items()}])

    q["kg_eval_prf"] = q_kg_eval_prf

    def q_kg_p_at_k(sf_dir: str):
        # T2 — global confidence ranking, precision@{50,100,150,200}
        # (eval_utils.py:763-783 sweep semantics), fully streaming:
        # gold membership broadcast once as an Arrow key array, block-local
        # top-K prune on the pred side, one small global sort of
        # num_blocks x K rows. (At 100 TB swap the exact gold key array for
        # the Bloom broadcast in state/broadcast.py.)
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "kg_p_at_k",
                      lambda: _o.expected_p_at_k(
                          _oracle_triples_table(sf_dir),
                          _oracle_triples_table(sf_dir, reduced=True)))

        K = 200
        SORT_COLS = ["conf", "doc_id", "subj_norm", "obj_norm", "pred"]

        def key_col(t: pa.Table) -> "pa.ChunkedArray":
            return pc.binary_join_element_wise(
                t["doc_id"], t["subj_norm"], t["pred"], t["obj_norm"], "\x1f"
            )

        gold_keys = (
            _synth_triples(sf_dir)
            .map_batches(lambda t: pa.table({"k": key_col(t)}), batch_format="pyarrow")
            .unique("k")
        )
        gold_ref = ray.put(pa.array(sorted(gold_keys)))

        def stamp_and_prune(t: pa.Table) -> pa.Table:
            hit = pc.is_in(key_col(t), value_set=ray.get(gold_ref))
            sub = pa.table({
                "conf": t["conf"], "doc_id": t["doc_id"],
                "subj_norm": t["subj_norm"], "obj_norm": t["obj_norm"],
                "pred": t["pred"], "hit": hit,
            })
            if sub.num_rows > K:
                idx = pc.select_k_unstable(
                    sub, k=K,
                    sort_keys=[("conf", "descending")] +
                              [(c, "ascending") for c in SORT_COLS[1:]],
                )
                sub = sub.take(idx)
            return sub

        top = (
            _reduced_triples(sf_dir)
            .map_batches(stamp_and_prune, batch_format="pyarrow")
            .sort(SORT_COLS, descending=[True, False, False, False, False])
            .limit(K)
            .to_pandas()
        )
        rows = []
        for k in (50, 100, 150, 200):
            topk = top.head(k)
            rows.append({"k": k,
                         "precision_at_k": round(float(topk["hit"].sum()) / max(1, len(topk)), 6)})
        return pd.DataFrame(rows)

    q["kg_p_at_k"] = q_kg_p_at_k

    def q_kg_event_f1(sf_dir: str):
        # A4 — all four event-match variants: reduced-trigger model scored
        # against the full model's events (zip-joined on doc_key)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.pipelines.evaluate import event_f1
        from dygiepp_ray.joins import zip_join_assert

        red_trig = {k: v for i, (k, v) in enumerate(sorted(EVENT_TRIGGERS.items()))
                    if i % 3 != 0}
        _write_oracle(sf_dir, "kg_event_f1",
                      lambda: _o.expected_event_f1(
                          _oracle_corpus_docs(sf_dir), EVENT_TRIGGERS, red_trig))
        corpus = ray.data.read_parquet(_synth_corpus_dir(sf_dir))
        docs = kgp.documents_dataset(corpus)
        full = kgp.extract(docs, concurrency=_kernel_conc())
        red = kgp.extract(docs, concurrency=_kernel_conc(), event_triggers=red_trig)
        red_ren = red.select_columns(["doc_key", "predicted_events"]).map_batches(
            lambda t: t.rename_columns(["doc_key", "events_pred"]),
            batch_format="pyarrow",
        )
        joined = zip_join_assert(
            full.select_columns(["doc_key", "predicted_events"]),
            red_ren, "doc_key", ["events_pred"],
            a_cols=["doc_key", "predicted_events"],
        ).materialize()
        rows = []
        for variant in ("trig_id", "trig_class", "arg_id", "arg_class"):
            res = event_f1(joined, variant, gold_col="predicted_events",
                           pred_col="events_pred")
            rows.append({"variant": variant,
                         "precision": round(res["precision"], 6),
                         "recall": round(res["recall"], 6),
                         "f1": round(res["f1"], 6)})
        return pd.DataFrame(rows)

    q["kg_event_f1"] = q_kg_event_f1

    def _kernel_as_args(ds):
        return ds.map_batches(
            lambda t: pa.table({"doc_id": t["doc_id"], "arg0": t["subj"],
                                "arg1": t["obj"], "rel": t["pred"],
                                "conf": t["conf"]}),
            batch_format="pyarrow",
        )

    def q_srl_baseline(sf_dir: str):
        # M11 — deterministic SRL-frame stand-in over the corpus documents
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.pipelines.sweep import srl_baseline

        _write_oracle(sf_dir, "srl_baseline",
                      lambda: _o.expected_srl_baseline(_oracle_corpus_docs(sf_dir)))
        corpus = ray.data.read_parquet(_synth_corpus_dir(sf_dir))
        return srl_baseline(kgp.documents_dataset(corpus))

    q["srl_baseline"] = q_srl_baseline

    def q_kg_eval_sweep(sf_dir: str):
        # the eval_metric.py sweep: models x match-metric x collapse (+P@K)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.pipelines.sweep import eval_sweep, srl_baseline

        def _oracle_sweep():
            def shape_o(t):
                return pa.table({"doc_id": t.column("doc_id"),
                                 "arg0": t.column("subj"),
                                 "arg1": t.column("obj"),
                                 "rel": t.column("pred"),
                                 "conf": t.column("conf")})

            return _o.expected_eval_sweep(
                shape_o(_oracle_triples_table(sf_dir)),
                {"kernel_reduced": shape_o(_oracle_triples_table(sf_dir, reduced=True)),
                 "srl": _o.expected_srl_baseline(_oracle_corpus_docs(sf_dir))},
            )

        _write_oracle(sf_dir, "kg_eval_sweep", _oracle_sweep)
        corpus = ray.data.read_parquet(_synth_corpus_dir(sf_dir))
        docs = kgp.documents_dataset(corpus)
        # materialize the (small) triple tables: each sweep cell consumes its
        # inputs once, and re-running the kernel per cell would dominate
        gold = _kernel_as_args(_synth_triples(sf_dir)).materialize()
        models = {
            "kernel_reduced": _kernel_as_args(_reduced_triples(sf_dir)).materialize(),
            "srl": srl_baseline(docs).materialize(),
        }
        return eval_sweep(gold, models)

    q["kg_eval_sweep"] = q_kg_eval_sweep

    def q_coref_scores(sf_dir: str):
        # A5 — MUC/B³/CEAF-φ4/CoNLL of the reduced-lexicon model's clusters
        # against the full-lexicon model's, per-doc counters streamed
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.pipelines.coref_metrics import coref_scores
        from dygiepp_ray.joins import zip_join_assert

        reduced_lex = {k: v for i, (k, v) in enumerate(sorted(DOC_LEXICON.items()))
                       if i % 3 != 0}
        _write_oracle(sf_dir, "coref_scores",
                      lambda: _o.expected_coref_scores(
                          _oracle_docs_table(sf_dir, max_doc_id=200),
                          {**ENTITY_LEXICON, **DOC_LEXICON}, reduced_lex))
        corpus = documents_as_corpus(sf_dir, max_doc_id=200)
        docs = kgp.documents_dataset(corpus)
        full = kgp.extract(docs, concurrency=_kernel_conc(),
                           entity_lexicon={**ENTITY_LEXICON, **DOC_LEXICON})
        red = kgp.extract(docs, concurrency=_kernel_conc(), entity_lexicon=reduced_lex)
        red_ren = red.select_columns(["doc_key", "predicted_clusters"]).map_batches(
            lambda t: t.rename_columns(["doc_key", "clusters_pred"]),
            batch_format="pyarrow",
        )
        joined = zip_join_assert(
            full.select_columns(["doc_key", "predicted_clusters"]),
            red_ren, "doc_key", ["clusters_pred"],
            a_cols=["doc_key", "predicted_clusters"],
        )
        scores = coref_scores(joined, gold_col="predicted_clusters",
                              pred_col="clusters_pred")
        flat = {
            "muc_f1": scores["muc"]["f1"],
            "b3_f1": scores["b3"]["f1"],
            "ceaf_e_f1": scores["ceaf_e"]["f1"],
            "conll_f1": scores["conll_f1"],
            "mention_recall": scores["mention_recall"],
        }
        return pd.DataFrame([{k: round(v, 6) for k, v in flat.items()}])

    q["coref_scores"] = q_coref_scores

    def q_coref_antecedent_clusters(sf_dir: str):
        # M6 antecedent mode END TO END + M7 gated score propagation
        # (coref_prop=2): per-doc cluster counts and a sha over every
        # post-propagation NER mention, hash-checked against an
        # independent recompute
        import hashlib

        from dygiepp_ray import oracle as _o

        lex = {**ENTITY_LEXICON, **DOC_LEXICON}
        _write_oracle(sf_dir, "coref_antecedent_clusters",
                      lambda: _o.expected_antecedent_clusters(
                          _oracle_docs_table(sf_dir, max_doc_id=200), lex,
                          coref_prop=2))
        corpus = documents_as_corpus(sf_dir, max_doc_id=200)
        docs = kgp.documents_dataset(corpus)
        pred = kgp.extract(docs, concurrency=_kernel_conc(),
                           entity_lexicon=lex, coref_mode="antecedent",
                           coref_prop=2)

        def summarize(t):
            keys = t.column("doc_key").to_pylist()
            ners = t.column("predicted_ner").to_pylist()
            cls = t.column("predicted_clusters").to_pylist()
            rows = []
            for k, doc_ner, clusters in zip(keys, ners, cls):
                parts = [f"{si}:{m['start']}:{m['end']}:{m['label']}"
                         for si, sent in enumerate(doc_ner) for m in sent]
                rows.append({
                    "doc_key": k,
                    "n_clusters": len(clusters),
                    "n_clustered_mentions": sum(len(c) for c in clusters),
                    "mention_sig": hashlib.sha256(
                        "|".join(parts).encode()).hexdigest(),
                })
            return pd.DataFrame(rows, columns=[
                "doc_key", "n_clusters", "n_clustered_mentions",
                "mention_sig"])

        return pred.map_batches(summarize, batch_format="pyarrow")

    q["coref_antecedent_clusters"] = q_coref_antecedent_clusters

    # ---- multimodal plumbing (stubbed decode, real Ray plumbing)

    def q_media_features(sf_dir: str):
        from dygiepp_ray import oracle as _o

        _write_oracle(sf_dir, "media_features",
                      lambda: _o.expected_media_features(32, feature_dim=16))
        media = ray.data.from_arrow(synth_media_table(32, seed=5))
        feats = media.map_batches(
            ImageDecoder, fn_constructor_kwargs=dict(feature_dim=16),
            batch_format="pandas", batch_size=8, concurrency=(1, 2),
        )

        def project(df: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "media_id": df["media_id"],
                    "kind": df["kind"],
                    "dim": df["feature"].map(len),
                }
            )

        return feats.map_batches(project, batch_format="pandas")

    q["media_features"] = q_media_features

    def q_media_frames(sf_dir: str):
        # video frame-sampling plumbing: deterministic offsets, small-batch
        # actor pool (real extraction stubbed like the image decode)
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.multimodal import FrameSampler

        _write_oracle(sf_dir, "media_frames",
                      lambda: _o.expected_media_frames(32))
        media = ray.data.from_arrow(synth_media_table(32, seed=5))
        videos = media.map_batches(
            lambda df: df[df["kind"] == "video"], batch_format="pandas")
        out = videos.map_batches(
            FrameSampler, fn_constructor_kwargs=dict(n_frames=4),
            batch_format="pandas", batch_size=8, concurrency=(1, 2))
        return out.map_batches(
            lambda df: df.assign(
                frame_offset_ms=df["frame_offset_ms"].astype("int64")),
            batch_format="pandas")

    q["media_frames"] = q_media_frames

    def q_media_resize(sf_dir: str):
        # image resize plan: integer aspect-preserving dimension math
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.multimodal import Resizer

        _write_oracle(sf_dir, "media_resize",
                      lambda: _o.expected_media_resize(32))
        media = ray.data.from_arrow(synth_media_table(32, seed=5))
        images = media.map_batches(
            lambda df: df[df["kind"] == "image"], batch_format="pandas")
        return images.map_batches(
            Resizer, fn_constructor_kwargs=dict(max_side=512),
            batch_format="pandas", batch_size=8, concurrency=(1, 2))

    q["media_resize"] = q_media_resize

    def q_media_dedup(sf_dir: str):
        # exact binary-payload dedup over the media corpus with 16 planted
        # copies: per-block (sha, min_id, count) partials, one sha reduce
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.multimodal import (payload_dedup,
                                                   synth_media_table)

        _write_oracle(sf_dir, "media_dedup",
                      lambda: _o.expected_media_dedup(32, n_dups=16))
        t = synth_media_table(32, seed=5)
        mids = t["media_id"].to_pylist()
        payloads = t["payload"].to_pylist()
        kinds = t["kind"].to_pylist()
        for i in range(16):
            mids.append(f"d{32 + i:04d}")
            payloads.append(payloads[i])
            kinds.append(kinds[i])
        media = ray.data.from_arrow(pa.table({
            "media_id": pa.array(mids, pa.string()),
            "kind": pa.array(kinds, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })).repartition(4)
        return payload_dedup(media)

    q["media_dedup"] = q_media_dedup

    def q_media_neardup(sf_dir: str):
        # decode-free NEAR-dup over binary payloads: byte-4-gram SimHash,
        # 4-band routing (lossless at hamming <= 3 by pigeonhole),
        # in-bucket popcount verify; all-pairs brute-force oracle over
        # the shared planted corpus
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.oracle import _media_neardup_corpus
        from dygiepp_ray.stages.multimodal import payload_neardup_pairs

        _write_oracle(sf_dir, "media_neardup",
                      lambda: _o.expected_media_neardup(32, 12, 4))
        mids, payloads = _media_neardup_corpus(32, 12, 4)
        media = ray.data.from_arrow(pa.table({
            "media_id": pa.array(mids, pa.string()),
            "payload": pa.array(payloads, pa.binary()),
        })).repartition(4)
        return payload_neardup_pairs(media, max_hamming=3)

    q["media_neardup"] = q_media_neardup

    def q_pca_project(sf_dir: str):
        # distributed PCA projection: exact int64 Gram/sum partials (order-
        # independent) -> driver power-iteration basis -> broadcast project
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.similarity import pca_project

        _write_oracle(sf_dir, "pca_project",
                      lambda: _o.expected_pca_project(sf_dir))
        return pca_project(_read(sf_dir, "embeddings", ["vec_id", "embedding"]))

    q["pca_project"] = q_pca_project

    def q_dsir_select(sf_dir: str):
        # DSIR data selection: pick the 50 raw docs (doc_id % 7 != 0) whose
        # hashed-ngram distribution best matches the target slice
        # (doc_id % 7 == 0); exact integer-scaled importance scores
        from dygiepp_ray import oracle as _o
        from dygiepp_ray.stages.dsir import dsir_select

        _write_oracle(sf_dir, "dsir_select",
                      lambda: _o.expected_dsir_select(sf_dir, k=50))
        docs = _read(sf_dir, "documents", ["doc_id", "text"])
        target = docs.map_batches(
            lambda df: df[df["doc_id"] % 7 == 0], batch_format="pandas")
        raw = docs.map_batches(
            lambda df: df[df["doc_id"] % 7 != 0], batch_format="pandas")
        return dsir_select(raw, target, k=50)

    q["dsir_select"] = q_dsir_select

    # ---- rotating driver window ---------------------------------------------
    # The driver's CORRECTNESS artifact hash-checks only the FIRST 50
    # registered queries. Window policy (VERDICT r3 "Next round" #1): ROTATE
    # so that the union of CORRECTNESS_r*.json artifacts covers every
    # registered query. Round 3's window was the full flagship family
    # (all 21 kg_*, coref, converters, dedup, ANN, curation — all green in
    # CORRECTNESS_r03.json). Round 4 keeps 8 kg sentinels and fills the
    # rest with (a) the 17 queries never driver-checked before this round
    # and (b) 25 of the r2-only relational/text family — prioritizing the
    # ones whose implementation was rewritten since r2 (bucketed windows,
    # joins, quantiles). Mid-round-4 update: the 13 operators added in this
    # round's second session (kg_triples_learned, dsir_select, ... below)
    # would otherwise have NO driver artifact at all, so they take the
    # window slots of 13 r2-family queries that are (a) fully hash-green in
    # CORRECTNESS_r02.json and (b) implemented on code paths unchanged since
    # r2 (plain salted aggregates, broadcast semi/anti joins, sketches).
    # After r4 every one of the registered queries has a green row in at
    # least one artifact; nothing is permanently evicted — evicted names
    # stay registered and qcheck-verified every round.
    #
    # Session-4 update: the 13 operators from session 3 (kg_link_predict,
    # kg_ppr, kg_scc, ... below) also had no artifact, so the window now
    # holds 7 kg sentinels + ALL 43 never-driver-checked queries = 50.
    # Evicted to make room: kg_khop_subgraph (hash-green in r3) and the 12
    # r2-family relational/text queries (hash-green by name in r2; their
    # post-r2 rewrites stay pinned by qcheck + pytest equivalence tests).
    # Queries added in session 4 itself swap in for r3-green kg sentinels
    # one-for-one (kg_triples always stays); overflow past the sentinel
    # budget becomes the round-5 rotation list (see ROUND4_NOTES.md).
    # Round-5 window (VERDICT r4 "Next round" #1/#9): kg_triples sentinel +
    # 49 queries that have never appeared in ANY CORRECTNESS_r*.json,
    # prioritized per the verdict — the sketch/ANN accuracy-audit family,
    # the TPC-H family, the session-8/9 kg graph-analytics ops, the events
    # analytics family, and incremental_neardup. The remaining never-checked
    # queries (~79) are covered by the checked-in full-gate artifact
    # GATE_r5.json (all 269 queries, pass/fail + value hash at sf0.01);
    # registry growth is FROZEN this round until the union covers all.
    flagship = [
        "kg_triples",
        # accuracy-audit family — the rows that certify the approximate
        # operators' contracts (VERDICT #9 priority picks)
        "hll_accuracy", "cms_accuracy", "minhash_accuracy",
        "quantile_sketch_error", "kg_blocking_recall",
        # TPC-H family (zero driver rows so far)
        "tpch_q3", "tpch_q5", "tpch_q7", "tpch_q10", "tpch_q13",
        "tpch_q14", "tpch_q15", "tpch_q17", "tpch_q18", "tpch_q22",
        # incremental near-dup vs persisted band store
        "incremental_neardup",
        # session-8/9 kg graph-analytics ops
        "kg_truss", "kg_betweenness", "kg_communities", "kg_hits",
        "kg_closeness", "kg_wsp", "kg_clustering", "kg_powerlaw",
        "kg_richclub", "kg_type_assortativity", "kg_pagerank_weighted",
        "kg_reciprocity", "kg_assortativity", "kg_degree_gini",
        "kg_random_walks",
        # events analytics family
        "events_transitions", "events_cobaskets", "events_lift",
        "events_user_growth", "events_heatmap", "events_ohlc",
        "events_daily_dense", "events_stationary", "events_autocorr",
        "events_type_overlap", "events_stickiness", "events_attribution",
        # curation / media / ANN-graph stragglers
        "gopher_filter", "k_anonymity", "doc_novelty", "knn_graph",
        "media_dedup", "media_neardup",
    ]
    assert len(flagship) == 50, len(flagship)
    missing = [n for n in flagship if n not in q]
    assert not missing, f"flagship ordering references unknown queries: {missing}"
    ordered = {name: q[name] for name in flagship}
    ordered.update((name, fn) for name, fn in q.items() if name not in ordered)
    return ordered


# --------------------------------------------------------------- oracles


_QUALITY_SQL = f"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), s AS (
                SELECT doc_id,
                       length(toks)::BIGINT AS n_tokens,
                       length(list_filter(toks, x -> x IN ({_STOP_SQL})))::BIGINT AS n_stop,
                       length(list_distinct(toks))::BIGINT AS n_uniq
                FROM t
            ), r AS (
                SELECT doc_id, n_tokens,
                       round(n_stop::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
                       round(n_uniq::DOUBLE / greatest(n_tokens, 1), 6) AS uniq_ratio
                FROM s
            )
            SELECT doc_id, n_tokens, stop_ratio, uniq_ratio,
                   round(least(1.0,
                         (least(n_tokens, 100) / 100.0) * 0.4
                         + least(stop_ratio, 0.4) * 0.5
                         + uniq_ratio * 0.4), 6) AS quality
            FROM r
        """


_LANGID_SQL = f"""
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x <> '') AS toks,
                       length(regexp_replace(text, '[^一-鿿]', '', 'g')) AS cjk
                FROM documents
            ), s AS (
                SELECT doc_id, text, cjk,
                       greatest(length(toks), 1)::DOUBLE AS n,
                       length(list_filter(toks, x -> x IN
                           ('the','and','of','to','is','are','was','with','for','that')
                       ))::DOUBLE AS c_en,
                       length(list_filter(toks, x -> x IN
                           ('le','la','les','des','et','est','une','pour','dans','que')
                       ))::DOUBLE AS c_fr,
                       length(list_filter(toks, x -> x IN
                           ('el','los','las','es','una','por','para','con','del','como')
                       ))::DOUBLE AS c_es,
                       length(list_filter(toks, x -> x IN
                           ('der','die','das','und','ist','mit','für','ein','nicht','von')
                       ))::DOUBLE AS c_de
                FROM t
            ), sc AS (
                SELECT doc_id, text, cjk,
                       c_en/n AS s_en, c_fr/n AS s_fr, c_es/n AS s_es, c_de/n AS s_de
                FROM s
            )
            SELECT doc_id,
                   CASE WHEN cjk > 0.2 * length(text) THEN 'zh'
                        WHEN greatest(s_en, s_fr, s_es, s_de) = 0 THEN 'unknown'
                        WHEN s_de >= s_en AND s_de >= s_es AND s_de >= s_fr THEN 'de'
                        WHEN s_en >= s_es AND s_en >= s_fr THEN 'en'
                        WHEN s_es >= s_fr THEN 'es'
                        ELSE 'fr' END AS lang_pred,
                   round(CASE WHEN cjk > 0.2 * length(text)
                              THEN cjk::DOUBLE / greatest(length(text), 1)
                              ELSE greatest(s_en, s_fr, s_es, s_de) END, 6) AS lang_conf
            FROM sc
        """


def oracle_sql() -> dict[str, str]:
    lemma_case = (
        "CASE "
        "WHEN length(x) > 3 AND x LIKE '%ies' THEN substr(x, 1, length(x)-3) || 'y' "
        "WHEN length(x) > 4 AND (x LIKE '%sses' OR x LIKE '%shes' OR x LIKE '%ches' "
        "OR x LIKE '%xes' OR x LIKE '%zes') THEN substr(x, 1, length(x)-2) "
        "WHEN length(x) > 3 AND x LIKE '%s' AND NOT (x LIKE '%ss' OR x LIKE '%us' "
        "OR x LIKE '%is') THEN substr(x, 1, length(x)-1) "
        "ELSE x END"
    )
    return {
        "tpch_q1_agg": f"""
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   round(avg(l_quantity), 6) AS avg_qty,
                   count(*) AS n
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-01'
            GROUP BY l_returnflag, l_linestatus
        """,
        "filter_project_revenue": """
            SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
            FROM lineitem
            WHERE l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
        """,
        "broadcast_join_orders": """
            SELECT c.c_mktsegment,
                   count(*) AS n_orders,
                   round(sum(o.o_totalprice), 2) AS sum_total
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
            GROUP BY c.c_mktsegment
        """,
        "anti_join_orders": """
            SELECT o_orderkey FROM orders
            WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        """,
        "topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 100
        """,
        "distinct_status_priority": """
            SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
        """,
        "events_count_salted": """
            SELECT event_type, count(*) AS n FROM events GROUP BY event_type
        """,
        "events_user_daily": """
            SELECT user_id, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(*) AS n_events, round(sum(value), 2) AS sum_value
            FROM events GROUP BY user_id, day
        """,
        "events_retention": """
            WITH um AS (
                SELECT DISTINCT user_id,
                       datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS d
                FROM events
            )
            SELECT strftime(DATE '1970-01-01' + to_days(CAST(a.d AS INTEGER)),
                            '%Y-%m-%d') AS day,
                   count(*) AS retained
            FROM um a JOIN um b
              ON b.user_id = a.user_id AND b.d = a.d + 1
            GROUP BY day
        """,
        "region_nation_join": """
            SELECT n.n_name AS n_name, r.r_name AS r_name
            FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
        """,
        "events_value_stats": """
            SELECT event_type,
                   round(min(value), 4) AS min_value,
                   round(max(value), 4) AS max_value,
                   round(avg(value), 6) AS avg_value,
                   count(*) AS n
            FROM events GROUP BY event_type
        """,
        "events_funnel": """
            WITH v AS (
                SELECT user_id, min(ts) AS t1 FROM events
                WHERE event_type = 'view' GROUP BY user_id
            ), c AS (
                SELECT e.user_id, min(e.ts) AS t2
                FROM events e JOIN v ON v.user_id = e.user_id
                WHERE e.event_type = 'click' AND e.ts > v.t1
                GROUP BY e.user_id
            ), p AS (
                SELECT e.user_id, min(e.ts) AS t3
                FROM events e JOIN c ON c.user_id = e.user_id
                WHERE e.event_type = 'purchase' AND e.ts > c.t2
                GROUP BY e.user_id
            )
            SELECT 1 AS stage, 'view' AS stage_name,
                   (SELECT count(*) FROM v) AS n_users
            UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
            UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
        """,
        "events_zscore_outliers": """
            WITH m AS (
                SELECT event_id, event_type,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS value_q
                FROM events
            ), s AS (
                SELECT event_type, count(*) AS n, sum(value_q) AS sx,
                       sum(value_q * value_q) AS sxx
                FROM m GROUP BY event_type
            )
            SELECT m.event_id, m.event_type, m.value_q
            FROM m JOIN s USING (event_type)
            WHERE (CAST(n AS DOUBLE) * CAST(value_q AS DOUBLE)
                   - CAST(sx AS DOUBLE))
                  * (CAST(n AS DOUBLE) * CAST(value_q AS DOUBLE)
                     - CAST(sx AS DOUBLE))
                  > 9.0 * (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
        """,
        "events_value_corr": """
            WITH m AS (
                SELECT event_type,
                       CAST(floor(value * 1000 + 0.5) AS BIGINT) AS x,
                       CAST(hour(ts) AS BIGINT) AS y
                FROM events
            ), s AS (
                SELECT event_type, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
                       sum(y*y) AS syy, sum(x*y) AS sxy
                FROM m GROUP BY event_type
            )
            SELECT event_type, n,
                   round(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                         THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                              / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                         ELSE 0.0 END, 6) AS corr_vh
            FROM s
        """,
        "part_type_agg": """
            SELECT p_type,
                   round(avg(p_retailprice), 6) AS avg_price,
                   max(p_size) AS max_size,
                   count(*) AS n_parts
            FROM part GROUP BY p_type
        """,
        "doc_length_histogram": """
            SELECT (length(list_filter(regexp_split_to_array(text, '\\s+'),
                                       x -> x <> '')) // 10) * 10
                       AS len_bucket,
                   count(*) AS n_docs
            FROM documents GROUP BY len_bucket
        """,
        "token_stats": """
            WITH t AS (
                SELECT doc_id, text,
                       list_filter(regexp_split_to_array(text, '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            )
            SELECT doc_id,
                   length(toks)::BIGINT AS n_tokens,
                   length(text)::BIGINT AS n_chars,
                   round(length(regexp_replace(text, '\\s', '', 'g'))::DOUBLE
                         / greatest(length(toks), 1),
                         6) AS avg_token_len
            FROM t
        """,
        "quality_score": _QUALITY_SQL,
        "doc_readability": """
            WITH t AS (
                SELECT doc_id,
                       CAST(length(list_filter(
                           regexp_split_to_array(text, '\\s+'), x -> x <> ''))
                           AS BIGINT) AS n_words,
                       greatest(CAST(length(regexp_extract_all(text, '[.!?]+'))
                                     AS BIGINT), 1) AS n_sents,
                       CAST(length(regexp_extract_all(lower(text), '[aeiouy]+'))
                           AS BIGINT) AS n_syll
                FROM documents
            )
            SELECT doc_id, n_words, n_sents, n_syll,
                   CAST(206835 - (1015 * n_words) // n_sents
                        - (84600 * n_syll) // greatest(n_words, 1)
                        AS BIGINT) AS flesch_milli
            FROM t
        """,
        "char_entropy": """
            WITH ch AS (
                SELECT doc_id, unnest(regexp_extract_all(text, '(?s).'))
                           AS c
                FROM documents
            ), cc AS (
                SELECT doc_id, c, count(*) AS cnt FROM ch GROUP BY 1, 2
            ), agg AS (
                SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n,
                       CAST(sum(cnt * CAST(floor(
                           ln(CAST(cnt AS DOUBLE)) * 1000000000)
                           AS BIGINT)) AS BIGINT) AS term
                FROM cc GROUP BY 1
            )
            SELECT d.doc_id,
                   CAST(COALESCE(a.n, 0) AS BIGINT) AS n_chars_e,
                   CAST(CASE WHEN a.n > 0
                             THEN CAST(floor(ln(CAST(a.n AS DOUBLE))
                                             * 1000000000) AS BIGINT)
                                  - a.term // a.n
                             ELSE 0 END AS BIGINT) AS entropy_nano
            FROM documents d LEFT JOIN agg a USING (doc_id)
        """,
        "hapax_rate": """
            WITH e AS (
                SELECT source, unnest(list_filter(
                    regexp_split_to_array(lower(text), '\\s+'),
                    x -> x <> '')) AS term
                FROM documents
            ), c AS (
                SELECT source, term, count(*) AS n FROM e GROUP BY 1, 2
            )
            SELECT source,
                   CAST(count(*) AS BIGINT) AS n_terms,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT)
                       AS n_hapax,
                   CAST(sum(n) AS BIGINT) AS n_tokens,
                   CAST(sum(CASE WHEN n = 1 THEN 1 ELSE 0 END) * 1000000
                        // greatest(count(*), 1) AS BIGINT) AS hapax_ppm
            FROM c GROUP BY source
        """,
        "doc_ttr": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            )
            SELECT doc_id,
                   CAST(length(toks) AS BIGINT) AS n_tokens,
                   CAST(length(list_distinct(toks)) AS BIGINT) AS n_types,
                   CAST((length(list_distinct(toks)) * 1000000)
                        // greatest(length(toks), 1) AS BIGINT) AS ttr_ppm
            FROM t
        """,
        "events_attribution": """
            WITH e AS (
                SELECT user_id, event_type, value,
                       epoch_us(ts) AS ts_us,
                       row_number() OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id) AS rn
                FROM events
            ), w AS (
                SELECT *,
                       max(CASE WHEN event_type <> 'purchase' THEN rn END)
                           OVER (PARTITION BY user_id ORDER BY rn
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND 1 PRECEDING) AS src_rn
                FROM e
            ), p AS (
                SELECT w.user_id, w.value, w.ts_us, w.src_rn,
                       s.event_type AS src_type, s.ts_us AS src_ts
                FROM w LEFT JOIN e s
                     ON s.user_id = w.user_id AND s.rn = w.src_rn
                WHERE w.event_type = 'purchase'
            )
            SELECT CASE WHEN src_rn IS NOT NULL
                             AND ts_us - src_ts <= 604800000000
                        THEN src_type ELSE 'none' END AS attributed_type,
                   count(*) AS n_conversions,
                   CAST(sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS value_s
            FROM p GROUP BY 1
        """,
        "quality_length_corr": f"""
            WITH q AS ({_QUALITY_SQL}),
            m AS (
                SELECT d.source,
                       CAST(d.n_chars AS BIGINT) AS x,
                       CAST(floor(q.quality * 1000000 + 0.5) AS BIGINT)
                           AS y
                FROM documents d JOIN q USING (doc_id)
            ), s AS (
                SELECT source, count(*) AS n,
                       sum(x) AS sx, sum(y) AS sy, sum(x*x) AS sxx,
                       sum(y*y) AS syy, sum(x*y) AS sxy
                FROM m GROUP BY source
            )
            SELECT source, n,
                   round(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                         THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                              / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                         ELSE 0.0 END, 6) AS corr_lq
            FROM s
        """,
        "gopher_filter": """
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x <> '') AS toks,
                       regexp_split_to_array(text, '\\n') AS lines
                FROM documents
            ), s AS (
                SELECT doc_id,
                       length(toks)::BIGINT AS n_words,
                       length(lines)::BIGINT AS n_lines,
                       coalesce(list_sum(list_transform(toks, x -> length(x))),
                                0)::BIGINT AS sum_chars,
                       length(list_filter(toks, x -> contains(x, '#')
                              OR contains(x, '...')))::BIGINT AS n_symbol,
                       length(list_filter(toks,
                              x -> regexp_matches(x, '[a-z]')))::BIGINT AS n_alpha,
                       length(list_filter(lines, l -> starts_with(l, '-')
                              OR starts_with(l, '*')
                              OR starts_with(l, '•')))::BIGINT AS n_bullet,
                       length(list_filter(lines,
                              l -> ends_with(l, '...')))::BIGINT AS n_ell,
                       (list_contains(toks, 'the')::BIGINT
                        + list_contains(toks, 'be')::BIGINT
                        + list_contains(toks, 'to')::BIGINT
                        + list_contains(toks, 'of')::BIGINT
                        + list_contains(toks, 'and')::BIGINT
                        + list_contains(toks, 'that')::BIGINT
                        + list_contains(toks, 'have')::BIGINT
                        + list_contains(toks, 'with')::BIGINT) AS stop_hits
                FROM t
            ), r AS (
                SELECT doc_id, n_words, n_lines,
                       (sum_chars * 1000000) // greatest(n_words, 1) AS mwl_scaled,
                       (n_symbol * 1000000) // greatest(n_words, 1) AS symbol_scaled,
                       (n_bullet * 1000000) // greatest(n_lines, 1) AS bullet_scaled,
                       (n_ell * 1000000) // greatest(n_lines, 1) AS ellipsis_scaled,
                       (n_alpha * 1000000) // greatest(n_words, 1) AS alpha_scaled,
                       stop_hits
                FROM s
            )
            SELECT doc_id, n_words, n_lines, mwl_scaled, symbol_scaled,
                   bullet_scaled, ellipsis_scaled, alpha_scaled, stop_hits,
                   CAST(n_words >= 20 AND n_words <= 100000
                        AND mwl_scaled BETWEEN 3000000 AND 10000000
                        AND symbol_scaled <= 100000
                        AND bullet_scaled <= 900000
                        AND ellipsis_scaled <= 300000
                        AND alpha_scaled >= 800000
                        AND stop_hits >= 2 AS BIGINT) AS keep
            FROM r
        """,
        "source_quality_filter": f"""
            WITH t AS (
                SELECT doc_id, source,
                       list_filter(regexp_split_to_array(lower(text), '\\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), s AS (
                SELECT doc_id, source,
                       length(toks)::BIGINT AS n_tokens,
                       length(list_filter(toks, x -> x IN ({_STOP_SQL})))::BIGINT AS n_stop,
                       length(list_distinct(toks))::BIGINT AS n_uniq
                FROM t
            ), r AS (
                SELECT source, n_tokens,
                       round(n_stop::DOUBLE / greatest(n_tokens, 1), 6) AS stop_ratio,
                       round(n_uniq::DOUBLE / greatest(n_tokens, 1), 6) AS uniq_ratio
                FROM s
            ), q AS (
                SELECT source,
                       CAST(round(round(least(1.0,
                           (least(n_tokens, 100) / 100.0) * 0.4
                           + least(stop_ratio, 0.4) * 0.5
                           + uniq_ratio * 0.4), 6) * 1000000) AS BIGINT) AS qs
                FROM r
            ), agg AS (
                SELECT source, count(*) AS n_docs,
                       CAST(sum(qs) AS BIGINT) // count(*) AS mean_q_scaled
                FROM q GROUP BY source
            )
            SELECT source, n_docs, mean_q_scaled,
                   CAST(CASE WHEN mean_q_scaled >= 450000 THEN 1 ELSE 0 END
                        AS BIGINT) AS kept
            FROM agg
        """,
        "normalize_surface": """
            SELECT doc_id,
                   trim(regexp_replace(
                       regexp_replace(lower(text), '[^a-z0-9_\\s]', '', 'g'),
                       '\\s+', ' ', 'g')) AS norm
            FROM documents
        """,
        "canonicalize_docs": f"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(
                           regexp_split_to_array(
                               trim(regexp_replace(
                                   regexp_replace(lower(text), '[^a-z0-9_\\s]', '', 'g'),
                                   '\\s+', ' ', 'g')),
                               ' '),
                           x -> x NOT IN ({_STOP_SQL}) AND x <> '') AS toks
                FROM documents
            )
            SELECT doc_id,
                   array_to_string(list_transform(toks, x -> {lemma_case}), ' ') AS canon
            FROM t
        """,
        "lineitem_orders_join": """
            SELECT o.o_orderpriority,
                   count(*) AS n_items,
                   round(sum(l.l_extendedprice * (1 - l.l_discount)), 2) AS sum_revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            GROUP BY o.o_orderpriority
        """,
        "top2_orders_per_cust": """
            SELECT o_custkey, o_orderkey, o_totalprice FROM (
                SELECT o_custkey, o_orderkey, o_totalprice,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
                FROM orders)
            WHERE rn <= 2
        """,
        "orders_moving_sum": """
            SELECT o_custkey, o_orderkey,
                   CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                        OVER (PARTITION BY o_custkey
                              ORDER BY o_orderdate, o_orderkey
                              ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS moving_cents
            FROM orders
        """,
        "orders_rank_in_priority": """
            SELECT o_orderkey, o_orderpriority,
                   rank() OVER (PARTITION BY o_orderpriority
                                ORDER BY CAST(floor(o_totalprice * 100 + 0.5)
                                              AS BIGINT) DESC) AS rnk
            FROM orders
        """,
        "orders_ntile": """
            SELECT o_orderkey, o_orderpriority,
                   ntile(4) OVER (PARTITION BY o_orderpriority
                                  ORDER BY CAST(floor(o_totalprice * 100
                                                      + 0.5) AS BIGINT),
                                           o_orderkey) AS tile
            FROM orders
        """,
        "order_latency_stats": """
            WITH fs AS (
                SELECT l_orderkey AS o_orderkey,
                       min(CAST(CAST(l_shipdate AS DATE)
                                - DATE '1970-01-01' AS BIGINT))
                           AS first_ship
                FROM lineitem GROUP BY 1
            ), j AS (
                SELECT o_orderpriority,
                       first_ship
                       - CAST(CAST(o_orderdate AS DATE)
                              - DATE '1970-01-01' AS BIGINT) AS lat
                FROM fs JOIN orders USING (o_orderkey)
            )
            SELECT o_orderpriority, count(*) AS n_orders,
                   CAST(sum(lat) AS BIGINT) AS sum_days,
                   min(lat) AS min_days, max(lat) AS max_days,
                   CAST(sum(lat) AS BIGINT) // greatest(count(*), 1)
                       AS mean_days
            FROM j GROUP BY o_orderpriority
        """,
        "tpch_q5": """
            SELECT n_name,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                 AS BIGINT)
                            * (100 - CAST(floor(l_discount * 100 + 0.5)
                                          AS BIGINT))) AS BIGINT)
                       AS revenue_s
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            WHERE r_name = 'ASIA'
              AND c_nationkey = s_nationkey
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate < TIMESTAMP '1997-01-01'
            GROUP BY n_name
        """,
        "orders_trailing7": """
            WITH d AS (
                SELECT o_custkey,
                       CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                            AS BIGINT) AS day,
                       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS day_cents
                FROM orders GROUP BY 1, 2
            )
            SELECT o_custkey, day, day_cents,
                   CAST(sum(day_cents) OVER (
                       PARTITION BY o_custkey ORDER BY day
                       RANGE BETWEEN 6 PRECEDING AND CURRENT ROW)
                        AS BIGINT) AS trailing7_cents
            FROM d
        """,
        "tpch_q3": """
            SELECT o_orderkey, o_orderdate,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(floor(l_discount * 100 + 0.5)
                                          AS BIGINT))) AS BIGINT) AS revenue_s
            FROM customer
            JOIN orders ON c_custkey = o_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            WHERE c_mktsegment = 'BUILDING'
              AND o_orderdate < TIMESTAMP '1998-06-01'
              AND l_shipdate > TIMESTAMP '1998-06-01'
            GROUP BY o_orderkey, o_orderdate
            ORDER BY revenue_s DESC, o_orderkey
            LIMIT 10
        """,
        "late_events": """
            WITH w AS (
                SELECT event_type, epoch_us(ts) AS ts_us,
                       max(epoch_us(ts)) OVER (
                           ORDER BY (event_id * 2654435761) % 4294967296
                           ROWS BETWEEN UNBOUNDED PRECEDING
                                    AND 1 PRECEDING) AS wm
                FROM events
            )
            SELECT event_type, count(*) AS n_events,
                   CAST(sum(CASE WHEN wm > ts_us + 3600000000
                                 THEN 1 ELSE 0 END) AS BIGINT) AS n_late
            FROM w GROUP BY event_type
        """,
        "events_daily_dense": """
            WITH obs AS (
                SELECT event_type,
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                           AS day,
                       count(*) AS n_obs
                FROM events GROUP BY 1, 2
            ), env AS (
                SELECT min(day) AS lo, max(day) AS hi FROM obs
            ), days AS (
                SELECT unnest(generate_series(lo, hi)) AS day FROM env
            ), types AS (
                SELECT DISTINCT event_type FROM events
            )
            SELECT t.event_type, d.day,
                   CAST(COALESCE(o.n_obs, 0) AS BIGINT) AS n
            FROM types t CROSS JOIN days d
            LEFT JOIN obs o
                 ON o.event_type = t.event_type AND o.day = d.day
        """,
        "user_day_outer": """
            WITH p AS (
                SELECT user_id * 1000000
                       + CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                           AS ud,
                       count(*) AS n_purchase
                FROM events WHERE event_type = 'purchase' GROUP BY 1
            ), c AS (
                SELECT user_id * 1000000
                       + CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                           AS ud,
                       count(*) AS n_click
                FROM events WHERE event_type = 'click' GROUP BY 1
            )
            SELECT COALESCE(p.ud, c.ud) // 1000000 AS user_id,
                   COALESCE(p.ud, c.ud) % 1000000 AS day,
                   COALESCE(n_purchase, 0) AS n_purchase,
                   COALESCE(n_click, 0) AS n_click
            FROM p FULL OUTER JOIN c ON p.ud = c.ud
        """,
        "events_ohlc": """
            WITH e AS (
                SELECT event_type,
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                           AS day,
                       ts, event_id, value
                FROM events
            ), r AS (
                SELECT event_type, day, value,
                       row_number() OVER (PARTITION BY event_type, day
                                          ORDER BY ts, event_id) AS rn_a,
                       row_number() OVER (PARTITION BY event_type, day
                                          ORDER BY ts DESC, event_id DESC)
                           AS rn_d
                FROM e
            )
            SELECT event_type, day,
                   max(CASE WHEN rn_a = 1 THEN value END) AS open_v,
                   max(value) AS high_v, min(value) AS low_v,
                   max(CASE WHEN rn_d = 1 THEN value END) AS close_v,
                   count(*) AS n
            FROM r GROUP BY event_type, day
        """,
        "events_cobaskets": """
            WITH b AS (
                SELECT DISTINCT user_id,
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                           AS day,
                       event_type
                FROM events
            )
            SELECT x.event_type AS type_a, y.event_type AS type_b,
                   count(*) AS support
            FROM b x JOIN b y
                 ON x.user_id = y.user_id AND x.day = y.day
                AND x.event_type < y.event_type
            GROUP BY type_a, type_b
        """,
        "cms_accuracy": r"""
            WITH est AS (
                SELECT token, est FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/cms_token_counts.parquet')
            ), toks AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '\s+'),
                    x -> x <> '')) AS token
                FROM documents
            ), ex AS (
                SELECT token, count(*) AS n_exact FROM toks
                WHERE token IN ('scan', 'merge', 'window', 'zzz-missing')
                GROUP BY token
            )
            SELECT est.token, est.est,
                   CAST(coalesce(ex.n_exact, 0) AS BIGINT) AS n_exact,
                   CAST((est.est - coalesce(ex.n_exact, 0)) * 1000000
                        // greatest(coalesce(ex.n_exact, 0), 1)
                        AS BIGINT) AS overrun_ppm
            FROM est LEFT JOIN ex USING (token)
            ORDER BY est.token
        """,
        "events_heatmap": """
            SELECT (epoch_us(ts) // 86400000000) % 7 AS dow,
                   (epoch_us(ts) // 3600000000) % 24 AS hour,
                   count(*) AS n_events
            FROM events GROUP BY 1, 2
        """,
        "hll_accuracy": """
            WITH ex AS (
                SELECT event_type,
                       count(DISTINCT user_id) AS n_exact
                FROM events GROUP BY event_type
            ), est AS (
                SELECT event_type, ndv AS ndv_est FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/approx_distinct_users.parquet')
            )
            SELECT est.event_type, est.ndv_est, ex.n_exact,
                   CAST(CASE WHEN est.ndv_est >= ex.n_exact THEN 1
                             ELSE -1 END
                        * (abs(est.ndv_est - ex.n_exact) * 1000000
                           // greatest(ex.n_exact, 1)) AS BIGINT)
                       AS err_ppm
            FROM est JOIN ex USING (event_type)
            ORDER BY est.event_type
        """,
        "conversion_latency": """
            WITH u AS (
                SELECT user_id,
                       min(CASE WHEN event_type = 'view'
                                THEN epoch_us(ts) END) AS v_us,
                       min(CASE WHEN event_type = 'purchase'
                                THEN epoch_us(ts) END) AS p_us
                FROM events GROUP BY user_id
            ), c AS (
                SELECT count(v_us) AS nv,
                       CAST(sum(CASE WHEN p_us > v_us THEN 1 ELSE 0 END)
                            AS BIGINT) AS nc,
                       CAST(sum(CASE WHEN p_us > v_us THEN p_us - v_us
                                     ELSE 0 END) AS BIGINT) AS s,
                       CAST(coalesce(max(CASE WHEN p_us > v_us
                                              THEN p_us - v_us END), 0)
                            AS BIGINT) AS mx
                FROM u
            )
            SELECT nv AS n_viewers, nc AS n_converted,
                   CAST(s // greatest(nc, 1) AS BIGINT)
                       AS mean_latency_us,
                   mx AS max_latency_us,
                   CAST(nc * 1000000 // greatest(nv, 1) AS BIGINT)
                       AS conversion_ppm
            FROM c
        """,
        "events_user_growth": """
            WITH f AS (
                SELECT user_id,
                       min(epoch_us(ts) // 3600000000) AS hour
                FROM events GROUP BY user_id
            ), d AS (
                SELECT hour, count(*) AS new_users FROM f GROUP BY hour
            )
            SELECT hour, new_users,
                   CAST(sum(new_users) OVER (ORDER BY hour) AS BIGINT)
                       AS cum_users
            FROM d ORDER BY hour
        """,
        "events_lift": """
            WITH b AS (
                SELECT DISTINCT user_id,
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                           AS day,
                       event_type
                FROM events
            ), nb AS (
                SELECT count(*) AS n FROM (
                    SELECT DISTINCT user_id, day FROM b)
            ), tc AS (
                SELECT event_type, count(*) AS n_t FROM b
                GROUP BY event_type
            ), p AS (
                SELECT x.event_type AS type_a, y.event_type AS type_b,
                       count(*) AS support
                FROM b x JOIN b y
                     ON x.user_id = y.user_id AND x.day = y.day
                    AND x.event_type < y.event_type
                GROUP BY type_a, type_b
            )
            SELECT type_a, type_b, support,
                   ta.n_t AS n_a, tb.n_t AS n_b, nb.n AS n_baskets,
                   CAST(CAST(support AS HUGEINT) * nb.n * 1000000
                        // (CAST(ta.n_t AS HUGEINT) * tb.n_t)
                        AS BIGINT) AS lift_ppm
            FROM p
            CROSS JOIN nb
            JOIN tc ta ON ta.event_type = p.type_a
            JOIN tc tb ON tb.event_type = p.type_b
        """,
        "events_transitions": """
            WITH s AS (
                SELECT event_type,
                       lag(event_type) OVER (PARTITION BY user_id
                                             ORDER BY ts, event_id)
                           AS prev_type
                FROM events
            )
            SELECT prev_type AS prev_state, event_type AS next_state,
                   count(*) AS n
            FROM s WHERE prev_type IS NOT NULL
            GROUP BY prev_state, next_state
        """,
        "order_size_histogram": """
            WITH c AS (
                SELECT l_orderkey, count(*) AS n_lines
                FROM lineitem GROUP BY l_orderkey
            )
            SELECT n_lines, count(*) AS n_orders FROM c GROUP BY n_lines
        """,
        "profile_orders": """
            SELECT 'o_orderkey' AS column_name, count(*) AS n_rows,
                   CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_null,
                   count(DISTINCT o_orderkey) AS n_distinct,
                   CAST(min(o_orderkey) AS VARCHAR) AS min_v,
                   CAST(max(o_orderkey) AS VARCHAR) AS max_v
            FROM orders
            UNION ALL
            SELECT 'o_custkey', count(*),
                   CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   count(DISTINCT o_custkey),
                   CAST(min(o_custkey) AS VARCHAR),
                   CAST(max(o_custkey) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderstatus', count(*),
                   CAST(sum(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT),
                   count(DISTINCT o_orderstatus),
                   CAST(min(o_orderstatus) AS VARCHAR),
                   CAST(max(o_orderstatus) AS VARCHAR)
            FROM orders
            UNION ALL
            SELECT 'o_orderpriority', count(*),
                   CAST(sum(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0
                            END) AS BIGINT),
                   count(DISTINCT o_orderpriority),
                   CAST(min(o_orderpriority) AS VARCHAR),
                   CAST(max(o_orderpriority) AS VARCHAR)
            FROM orders
        """,
        "events_sessions": """
            WITH g AS (
                SELECT user_id, ts,
                       CASE WHEN lag(ts) OVER w IS NULL
                                 OR ts - lag(ts) OVER w > INTERVAL 30 MINUTE
                            THEN 1 ELSE 0 END AS new_session
                FROM events
                WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
            )
            SELECT user_id, sum(new_session)::BIGINT AS n_sessions,
                   count(*) AS n_events
            FROM g GROUP BY user_id
        """,
        "orders_monthly": """
            SELECT strftime(o_orderdate, '%Y-%m') AS month,
                   count(*) AS n_orders,
                   round(sum(o_totalprice), 2) AS sum_total
            FROM orders GROUP BY month
        """,
        "customer_acctbal_stats": """
            SELECT c_nationkey,
                   count(*) AS n,
                   round(min(c_acctbal), 2) AS min_bal,
                   round(max(c_acctbal), 2) AS max_bal,
                   round(avg(c_acctbal), 6) AS avg_bal
            FROM customer GROUP BY c_nationkey
        """,
        "running_order_total": """
            SELECT o_custkey, o_orderkey,
                   round(sum(o_totalprice) OVER (
                       PARTITION BY o_custkey
                       ORDER BY o_orderdate, o_orderkey), 2) AS running_total
            FROM orders
        """,
        "adaptive_topk_orders": """
            SELECT o_orderkey, o_totalprice FROM orders
            WHERE o_totalprice >= (
                SELECT min(o_totalprice) FROM (
                    SELECT o_totalprice FROM orders
                    WHERE o_totalprice >= 100000
                    ORDER BY o_totalprice DESC LIMIT 50))
        """,
        "asof_join_orders": """
            SELECT e.event_id, e.user_id, e.ts, o.o_orderdate, o.o_orderkey
            FROM events e ASOF LEFT JOIN (
                SELECT o_custkey AS user_id, o_orderdate,
                       max(o_orderkey) AS o_orderkey
                FROM orders GROUP BY o_custkey, o_orderdate
            ) o ON e.user_id = o.user_id AND e.ts >= o.o_orderdate
        """,
        "range_join_events": """
            SELECT a.user_id, count(*) AS n
            FROM events a JOIN events b
              ON a.user_id = b.user_id
             AND b.ts <= a.ts
             AND a.ts < b.ts + INTERVAL 10 MINUTE
             AND a.event_id <> b.event_id
            GROUP BY a.user_id
        """,
        "edit1_part_names": """
            WITH n AS (
                SELECT DISTINCT p_name AS name FROM part
                WHERE length(p_name) >= 2
            )
            SELECT a.name AS id_a, b.name AS id_b
            FROM n a JOIN n b ON a.name < b.name
            WHERE levenshtein(a.name, b.name) <= 1
        """,
        "upsert_orders": """
            WITH base AS (
                SELECT o_orderkey, o_totalprice,
                       CAST(datediff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE)) AS BIGINT)
                           AS version,
                       0 AS src
                FROM orders
            ), upd AS (
                SELECT o_orderkey, o_totalprice + 1000.0 AS o_totalprice,
                       CAST(datediff('day', DATE '1970-01-01',
                                     CAST(o_orderdate AS DATE)) + 1
                            AS BIGINT) AS version,
                       1 AS src
                FROM orders WHERE o_orderkey % 7 = 0
            ), u AS (
                SELECT * FROM base UNION ALL SELECT * FROM upd
            ), r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY o_orderkey
                    ORDER BY version DESC, src DESC) AS rk
                FROM u
            )
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice,
                   version
            FROM r WHERE rk = 1
        """,
        "approx_quantiles_price": """
            WITH params(prob) AS (
                VALUES (0.25), (0.5), (0.75), (0.9), (0.99)
            ), b AS (
                SELECT least(greatest(CAST(floor(
                           (l_extendedprice - 0.0) * (65536.0 / 110000.0))
                           AS BIGINT), 0), 65535) AS bin
                FROM lineitem
            ), c AS (
                SELECT bin, count(*) AS n FROM b GROUP BY bin
            ), w AS (
                SELECT bin, sum(n) OVER (ORDER BY bin) AS cum FROM c
            ), t AS (
                SELECT count(*) AS tot FROM lineitem
            ), r AS (
                SELECT prob,
                       (CAST(prob * 1000000 AS BIGINT) * tot + 999999)
                           // 1000000 AS rk
                FROM params, t
            ), pick AS (
                SELECT r.prob, min(w.bin) AS bin
                FROM r JOIN w ON w.cum >= r.rk GROUP BY r.prob
            )
            SELECT CAST(p.prob AS DOUBLE) AS prob,
                   round(0.0 + (p.bin + 1) / (65536.0 / 110000.0), 6)
                       AS value,
                   t.tot AS n
            FROM pick p, t
        """,
        "orders_winsorized": """
            WITH c AS (
                SELECT o_orderpriority,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM orders
            ), q AS (
                SELECT quantile_disc(cents, 0.01) AS lo,
                       quantile_disc(cents, 0.99) AS hi
                FROM c
            )
            SELECT o_orderpriority,
                   CAST(sum(cents) AS BIGINT) AS raw_cents,
                   CAST(sum(least(greatest(cents, q.lo), q.hi)) AS BIGINT)
                       AS win_cents,
                   CAST(sum(CASE WHEN cents < q.lo THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_clipped_lo,
                   CAST(sum(CASE WHEN cents > q.hi THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_clipped_hi
            FROM c, q GROUP BY o_orderpriority
        """,
        "quantile_sketch_error": """
            WITH b AS (
                SELECT least(greatest(CAST(floor(
                           (l_extendedprice - 0.0) * (65536.0 / 110000.0))
                           AS BIGINT), 0), 65535) AS bin
                FROM lineitem
            ), c AS (
                SELECT bin, count(*) AS n FROM b GROUP BY bin
            ), w AS (
                SELECT bin, sum(n) OVER (ORDER BY bin) AS cum FROM c
            ), t AS (
                SELECT count(*) AS tot FROM lineitem
            ), params(i, prob) AS (
                VALUES (1, 0.25), (2, 0.5), (3, 0.75), (4, 0.9), (5, 0.99)
            ), r AS (
                SELECT i, prob,
                       (CAST(prob * 1000000 AS BIGINT) * tot + 999999)
                           // 1000000 AS rk
                FROM params, t
            ), pick AS (
                SELECT r.i, r.prob, min(w.bin) AS bin
                FROM r JOIN w ON w.cum >= r.rk GROUP BY r.i, r.prob
            ), ql AS (
                SELECT quantile_disc(l_extendedprice,
                                     [0.25, 0.5, 0.75, 0.9, 0.99]) AS qs
                FROM lineitem
            ), ex AS (
                SELECT unnest(qs) AS exact_value,
                       generate_subscripts(qs, 1) AS i
                FROM ql
            )
            SELECT CAST(p.prob AS DOUBLE) AS prob,
                   round(0.0 + (p.bin + 1) / (65536.0 / 110000.0), 6)
                       AS approx_value,
                   CAST(ex.exact_value AS DOUBLE) AS exact_value,
                   round(round(0.0 + (p.bin + 1) / (65536.0 / 110000.0), 6)
                         - ex.exact_value, 6) AS err_value
            FROM pick p JOIN ex USING (i)
            ORDER BY prob
        """,
        "quantiles_price": """
            SELECT l_returnflag,
                   unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.75::DOUBLE,
                           0.9::DOUBLE, 0.99::DOUBLE]) AS q,
                   unnest(quantile_disc(l_extendedprice,
                                        [0.25, 0.5, 0.75, 0.9, 0.99])) AS v
            FROM lineitem GROUP BY l_returnflag
        """,
        "approx_distinct_users": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/approx_distinct_users.parquet')
        """,
        "events_props_sum": """
            SELECT event_type,
                   sum(CAST(json_extract_string(props, '$.k') AS BIGINT))::BIGINT AS k_sum
            FROM events GROUP BY event_type
        """,
        "pivot_status_priority": """
            SELECT o_orderstatus,
                   count(*) FILTER (o_orderpriority = '1-URGENT') AS n_1_urgent,
                   count(*) FILTER (o_orderpriority = '2-HIGH') AS n_2_high,
                   count(*) FILTER (o_orderpriority = '3-MEDIUM') AS n_3_medium,
                   count(*) FILTER (o_orderpriority = '4-NOT SPECIFIED')
                       AS n_4_not_specified,
                   count(*) FILTER (o_orderpriority = '5-LOW') AS n_5_low
            FROM orders GROUP BY o_orderstatus
        """,
        "cube_status_priority": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders
            GROUP BY CUBE (o_orderstatus, o_orderpriority)
        """,
        "rollup_status_priority": """
            SELECT o_orderstatus, o_orderpriority, count(*) AS n
            FROM orders
            GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
        """,
        "semi_join_orders": """
            SELECT o_orderkey, o_custkey FROM orders o
            WHERE EXISTS (SELECT 1 FROM customer c
                          WHERE c.c_custkey = o.o_custkey
                            AND c.c_acctbal > 5000)
        """,
        "events_hopping_windows": """
            WITH w AS (
                SELECT date_trunc('hour', ts) AS ws, value FROM events
                UNION ALL
                SELECT date_trunc('hour', ts) - INTERVAL 1 HOUR AS ws, value
                FROM events
            )
            SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
                   count(*) AS n_events,
                   round(sum(value), 2) AS sum_value
            FROM w GROUP BY ws
        """,
        "exact_dedup": """
            SELECT sha256(text) AS text_sha, min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY sha256(text)
        """,
        "decontaminate_docs": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), g AS (
                SELECT doc_id, len(toks) - 4 AS n_grams,
                       unnest(list_transform(range(1, len(toks) - 3),
                           i -> toks[i] || ' ' || toks[i+1] || ' ' ||
                                toks[i+2] || ' ' || toks[i+3] || ' ' ||
                                toks[i+4])) AS ng
                FROM t WHERE len(toks) >= 5
            ), ev AS (SELECT DISTINCT ng FROM g WHERE doc_id % 23 = 0)
            SELECT g.doc_id, max(g.n_grams) AS n_grams,
                   count(*) AS n_contam
            FROM g JOIN ev USING (ng)
            WHERE g.doc_id % 23 <> 0
            GROUP BY g.doc_id
        """,
        "fuzzy_decontaminate": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/fuzzy_decontaminate.parquet')
        """,
        "pii_redact_docs": r"""
            WITH aug AS (
                SELECT doc_id,
                       CASE WHEN doc_id % 2 = 0 THEN
                           text || ' contact u' || doc_id || '@ex.com ip 10.0.'
                                || (doc_id % 256) || '.7 call 555-0199'
                       ELSE text END AS text
                FROM documents
            ), p1 AS (
                SELECT doc_id, text,
                       len(regexp_extract_all(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                           AS n_email,
                       regexp_replace(text,
                           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                           '<EMAIL>', 'g') AS r1
                FROM aug
            ), p2 AS (
                SELECT doc_id, n_email,
                       len(regexp_extract_all(r1,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b')) AS n_ip,
                       regexp_replace(r1,
                           '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b',
                           '<IP>', 'g') AS r2
                FROM p1
            )
            SELECT doc_id,
                   regexp_replace(r2, '\b\d{3}-\d{4}\b', '<PHONE>', 'g') AS red,
                   n_email, n_ip,
                   len(regexp_extract_all(r2, '\b\d{3}-\d{4}\b')) AS n_phone
            FROM p2
        """,
        "keep_best_dedup": """
            WITH a AS (
                SELECT doc_id, text, (doc_id * 2654435761) % 1000 AS score
                FROM documents
            ), b AS (
                SELECT doc_id + 10000000 AS doc_id,
                       CASE WHEN doc_id % 3 = 0 THEN text
                            ELSE text || ' v2' END AS text,
                       ((doc_id + 10000000) * 2654435761) % 1000 AS score
                FROM documents
            ), u AS (
                SELECT * FROM a UNION ALL SELECT * FROM b
            ), r AS (
                SELECT sha256(text) AS text_sha, doc_id, score,
                       row_number() OVER (
                           PARTITION BY text
                           ORDER BY score DESC, doc_id ASC) AS rk,
                       count(*) OVER (PARTITION BY text) AS n_copies
                FROM u
            )
            SELECT text_sha, doc_id AS keep_id, score, n_copies
            FROM r WHERE rk = 1
        """,
        "lang_id": _LANGID_SQL,
        "langid_confusion": f"""
            WITH pred AS ({_LANGID_SQL})
            SELECT d.lang, p.lang_pred, count(*) AS n_docs
            FROM documents d JOIN pred p USING (doc_id)
            GROUP BY 1, 2
        """,
        "knn_cosine": """
            SELECT vec_id,
                   round(list_cosine_similarity(
                       embedding::DOUBLE[],
                       (SELECT embedding::DOUBLE[] FROM embeddings WHERE vec_id = 0)), 6)
                       AS cosine
            FROM embeddings
            ORDER BY cosine DESC, vec_id ASC LIMIT 10
        """,
        # -- broadcast-Bloom anti-join: deterministic hash family, zero false
        #    positives on this key set -> exact anti-join is the oracle
        "bloom_anti_join_orders": """
            SELECT o_orderkey FROM orders
            WHERE o_orderkey NOT IN (SELECT l_orderkey FROM lineitem)
        """,
        "seeded_split": """
            WITH c AS (SELECT count(*) AS total FROM documents)
            SELECT 'train' AS split, CAST(floor(total * 0.8) AS BIGINT) AS n FROM c
            UNION ALL
            SELECT 'dev', CAST(floor(total * 0.1) AS BIGINT) FROM c
            UNION ALL
            SELECT 'test', total - CAST(floor(total * 0.8) AS BIGINT)
                         - CAST(floor(total * 0.1) AS BIGINT) FROM c
        """,
        # -- pure-python recomputation oracles (dygiepp_ray/oracle.py writes
        #    these parquets from an independent single-threaded re-derivation
        #    of the corpus semantics before the Ray query runs)
        "fingerprint": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/fingerprint.parquet')
        """,
        "stratified_sample_orders": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/stratified_sample_orders.parquet')
        """,
        "term_postings": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '')) AS token
                FROM documents
            )
            SELECT token, doc_id, count(*) AS tf FROM toks
            WHERE token IN ('scan', 'merge', 'window', 'zzz-missing')
            GROUP BY token, doc_id
        """,
        "knn_lsh": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/knn_lsh.parquet')
        """,
        "knn_recall": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/knn_recall.parquet')
        """,
        "knn_lsh_indexed": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/knn_lsh_indexed.parquet')
        """,
        "minhash_lsh_dups": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/minhash_dups.parquet')
        """,
        "simhash_dups": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/simhash_dups.parquet')
        """,
        "ngram_jaccard_dups": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/ngram_dups.parquet')
        """,
        "minhash_accuracy": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/minhash_accuracy.parquet')
        """,
        "contrastive_pairs": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/contrastive_pairs.parquet')
        """,
        "source_dup_rates": """
            WITH c AS (
                SELECT text, count(*) AS n FROM documents GROUP BY text
            ), d AS (
                SELECT source, count(*) AS n_docs,
                       CAST(sum(CASE WHEN c.n > 1 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_dup_docs
                FROM documents JOIN c USING (text)
                GROUP BY source
            )
            SELECT source, n_docs, n_dup_docs,
                   CAST(n_dup_docs * 1000000
                        // greatest(n_docs, 1) AS BIGINT) AS dup_ppm
            FROM d
        """,
        "dedup_spans": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/dedup_spans.parquet')
        """,
        "substring_dups": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/substring_dups.parquet')
        """,
        "embedding_neardups": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/embedding_neardups.parquet')
        """,
        "embedding_clusters": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/embedding_clusters.parquet')
        """,
        "embedding_outliers": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/embedding_outliers.parquet')
        """,
        "knn_ivf": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/knn_ivf.parquet')
        """,
        "semantic_dedup": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/semantic_dedup.parquet')
        """,
        # -- BPE-ish pre-tokenizer counts: the IDENTICAL lookahead-free
        #    ASCII-anchored regex runs under RE2 here and Python re in the
        #    engine stage
        "token_count_bpe": r"""
            SELECT doc_id,
                   len(regexp_extract_all(text,
                       ' ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+'))
                       AS n_bpe,
                   len(regexp_extract_all(text, '[A-Za-z]+')) AS n_alpha,
                   len(regexp_extract_all(text, '[0-9]+')) AS n_num,
                   len(regexp_extract_all(text, '[^A-Za-z0-9 \t\n\r\f]+')) AS n_punct
            FROM documents
        """,
        "dup_ngram_stats": r"""
            WITH toks AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS t
                FROM documents
            ), base AS (
                SELECT doc_id, len(t) AS n_tokens,
                       list_transform(range(1, greatest(len(t) - 1, 1)),
                           i -> concat_ws(' ', t[i], t[i+1], t[i+2])) AS tg,
                       list_transform(range(1, greatest(len(t), 1)),
                           i -> concat_ws(' ', t[i], t[i+1])) AS bg
                FROM toks
            ), bcnt AS (
                SELECT doc_id, b, count(*) AS c
                FROM (SELECT doc_id, unnest(bg) AS b FROM base)
                GROUP BY doc_id, b
            ), btop AS (
                SELECT doc_id, max(c)::DOUBLE / sum(c) AS topf
                FROM bcnt GROUP BY doc_id
            )
            SELECT base.doc_id, base.n_tokens,
                   round(CASE WHEN len(tg) > 0
                              THEN 1.0 - len(list_distinct(tg)) / len(tg)
                              ELSE 0.0 END, 6) AS dup_trigram_frac,
                   round(COALESCE(btop.topf, 0.0), 6) AS top_bigram_frac
            FROM base LEFT JOIN btop USING (doc_id)
        """,
        "bigram_counts": r"""
            WITH t AS (
                SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), b AS (
                SELECT unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1]))
                           AS bigram
                FROM t WHERE len(toks) >= 2
            )
            SELECT bigram, count(*) AS n FROM b
            GROUP BY bigram HAVING count(*) >= 20
        """,
        "collocations": r"""
            WITH t AS (
                SELECT list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), b AS (
                SELECT unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1]))
                           AS bigram
                FROM t WHERE len(toks) >= 2
            ), p AS (
                SELECT split_part(bigram, ' ', 1) AS w1,
                       split_part(bigram, ' ', 2) AS w2,
                       count(*) AS n_pair
                FROM b GROUP BY 1, 2
            ), l AS (
                SELECT w1, CAST(sum(n_pair) AS BIGINT) AS n_1 FROM p
                GROUP BY w1
            ), r AS (
                SELECT w2, CAST(sum(n_pair) AS BIGINT) AS n_2 FROM p
                GROUP BY w2
            ), tt AS (
                SELECT CAST(sum(n_pair) AS BIGINT) AS total FROM p
            )
            SELECT p.w1, p.w2, p.n_pair, l.n_1, r.n_2,
                   CAST((p.n_pair * tt.total * 1000) // (l.n_1 * r.n_2)
                        AS BIGINT) AS lift_scaled
            FROM p JOIN l USING (w1) JOIN r USING (w2) CROSS JOIN tt
            WHERE p.n_pair >= 20
        """,
        "term_drift": r"""
            WITH toks AS (
                SELECT doc_id % 2 AS slice,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '')) AS term
                FROM documents
            ), tc AS (
                SELECT term,
                       CAST(sum(CASE WHEN slice = 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_a,
                       CAST(sum(CASE WHEN slice <> 0 THEN 1 ELSE 0 END)
                            AS BIGINT) AS n_b
                FROM toks GROUP BY term
            ), tot AS (
                SELECT greatest(CAST(sum(n_a) AS BIGINT), 1) AS na,
                       greatest(CAST(sum(n_b) AS BIGINT), 1) AS nb
                FROM tc
            )
            SELECT term, n_a, n_b,
                   CAST((n_a * 1000000) // na AS BIGINT) AS rate_a_ppm,
                   CAST((n_b * 1000000) // nb AS BIGINT) AS rate_b_ppm,
                   CAST((n_a * 1000000) // na - (n_b * 1000000) // nb
                        AS BIGINT) AS drift_ppm
            FROM tc, tot WHERE n_a + n_b >= 20
        """,
        "k_anonymity": """
            SELECT lang, source, count(*) AS n_docs
            FROM documents GROUP BY lang, source
            HAVING count(*) < 5
        """,
        "vocab_growth": r"""
            WITH toks AS (
                SELECT doc_id % 10 AS slice,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '')) AS term
                FROM documents
            ), fa AS (
                SELECT term, min(slice) AS s0 FROM toks GROUP BY term
            ), nt AS (
                SELECT slice, count(*) AS n_tokens FROM toks GROUP BY slice
            ), nv AS (
                SELECT s0 AS slice, count(*) AS new_terms FROM fa GROUP BY s0
            )
            SELECT nt.slice, nt.n_tokens,
                   CAST(sum(nt.n_tokens) OVER (ORDER BY nt.slice)
                        AS BIGINT) AS cum_tokens,
                   CAST(coalesce(nv.new_terms, 0) AS BIGINT) AS new_terms,
                   CAST(sum(coalesce(nv.new_terms, 0))
                        OVER (ORDER BY nt.slice) AS BIGINT) AS cum_vocab
            FROM nt LEFT JOIN nv ON nv.slice = nt.slice
            ORDER BY nt.slice
        """,
        "embedding_drift": """
            SELECT * FROM
            read_parquet('/tmp/dygiepp_ray_oracle/embedding_drift.parquet')
        """,
        "span_corruption": """
            SELECT * FROM
            read_parquet('/tmp/dygiepp_ray_oracle/span_corruption.parquet')
        """,
        "lang_source_association": """
            WITH cell AS (
                SELECT lang, source, count(*) AS o
                FROM documents GROUP BY lang, source
            ), r AS (
                SELECT lang, sum(o) AS rl FROM cell GROUP BY lang
            ), c AS (
                SELECT source, sum(o) AS cs FROM cell GROUP BY source
            ), t AS (
                SELECT sum(o) AS tt FROM cell
            ), x AS (
                SELECT CAST(cell.o AS HUGEINT) AS o,
                       CAST(r.rl AS HUGEINT) AS rl,
                       CAST(c.cs AS HUGEINT) AS cs,
                       CAST(t.tt AS HUGEINT) AS tt
                FROM cell JOIN r USING (lang) JOIN c USING (source)
                     CROSS JOIN t
            )
            SELECT (SELECT count(*) FROM cell) AS n_cells,
                   CAST(((SELECT count(*) FROM r) - 1)
                        * ((SELECT count(*) FROM c) - 1) AS BIGINT) AS dof,
                   CAST(sum((o * tt - rl * cs) * (o * tt - rl * cs)
                            * 1000000 // (rl * cs * tt)) AS BIGINT)
                       AS chi2_scaled
            FROM x
        """,
        "oov_rate": r"""
            WITH toks AS (
                SELECT source,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '')) AS term
                FROM documents
            ), vocab AS (
                SELECT term FROM (
                    SELECT term, count(*) AS c FROM toks GROUP BY term)
                ORDER BY c DESC, term LIMIT 16
            ), s AS (
                SELECT source, count(*) AS n_tokens,
                       CAST(sum(CASE WHEN term IN (SELECT term FROM vocab)
                                     THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
                FROM toks GROUP BY source
            )
            SELECT source, n_tokens, n_oov,
                   CAST(n_oov * 1000000 // greatest(n_tokens, 1) AS BIGINT)
                       AS oov_ppm
            FROM s
        """,
        "heavy_hitters_tokens": r"""
            WITH t AS (
                SELECT unnest(list_filter(
                    regexp_split_to_array(lower(text), '\s+'),
                    x -> x <> '')) AS token
                FROM documents
            ), tot AS (SELECT count(*) AS total FROM t)
            SELECT t.token, count(*) AS n FROM t, tot
            GROUP BY t.token, tot.total HAVING count(*) * 40 > tot.total
        """,
        "tfidf_top_terms": r"""
            WITH toks AS (
                SELECT doc_id,
                       unnest(list_filter(
                           regexp_split_to_array(lower(text), '\s+'),
                           x -> x <> '')) AS token
                FROM documents
            ), tf AS (
                SELECT doc_id, token, count(*) AS tf
                FROM toks GROUP BY doc_id, token
            ), df AS (
                SELECT token, count(DISTINCT doc_id) AS df
                FROM toks GROUP BY token
            ), nd AS (SELECT count(*) AS n_docs FROM documents),
            s AS (
                SELECT tf.doc_id, tf.token, tf.tf, df.df,
                       (tf.tf * nd.n_docs * 1000) // df.df AS score_scaled
                FROM tf JOIN df USING (token) CROSS JOIN nd
            ), r AS (
                SELECT *, row_number() OVER (
                    PARTITION BY doc_id
                    ORDER BY score_scaled DESC, token ASC) AS rk
                FROM s
            )
            SELECT doc_id, token, tf, df, score_scaled FROM r WHERE rk <= 3
        """,
        "ngram_lm_score": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), b AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1]))
                           AS bigram,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i])) AS w1
                FROM t WHERE len(toks) >= 2
            ), bc AS (
                SELECT bigram, count(*) AS n FROM b GROUP BY bigram
            ), lc AS (
                SELECT w1, count(*) AS n1 FROM b GROUP BY w1
            ), s AS (
                SELECT b.doc_id, (bc.n * 1000000) // lc.n1 AS p
                FROM b JOIN bc USING (bigram) JOIN lc USING (w1)
            ), agg AS (
                SELECT doc_id, count(*) AS n_bigrams, sum(p) AS totp
                FROM s GROUP BY doc_id
            )
            SELECT d.doc_id,
                   CAST(COALESCE(agg.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                   CAST(COALESCE(agg.totp // agg.n_bigrams, 0) AS BIGINT)
                       AS lm_score
            FROM documents d LEFT JOIN agg USING (doc_id)
        """,
        "pack_sequences": r"""
            WITH t AS (
                SELECT doc_id, doc_id % 8 AS pack_group,
                       len(list_filter(regexp_split_to_array(text, '\s+'),
                                       x -> x <> '')) AS n_tokens
                FROM documents
            ), c AS (
                SELECT *,
                       CAST(sum(n_tokens) OVER (
                           PARTITION BY pack_group ORDER BY doc_id
                           ROWS UNBOUNDED PRECEDING) - n_tokens
                           AS BIGINT) AS tok_start
                FROM t
            )
            SELECT doc_id, pack_group, n_tokens, tok_start,
                   tok_start // 256 AS seq_first,
                   (tok_start + greatest(n_tokens, 1) - 1) // 256 AS seq_last
            FROM c
        """,
        "mixture_sample": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/mixture_sample.parquet')
        """,
        "bpe_merges": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/bpe_merges.parquet')
        """,
        "bpe_encode": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/bpe_encode.parquet')
        """,
        "cms_token_counts": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/cms_token_counts.parquet')
        """,
        "curation_funnel": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/curation_funnel.parquet')
        """,
        "weighted_sample": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/weighted_sample.parquet')
        """,
        "knn_pq": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/knn_pq.parquet')
        """,
        "bm25_scan_merge": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/bm25_scan_merge.parquet')
        """,
        "media_frames": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/media_frames.parquet')
        """,
        "media_resize": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/media_resize.parquet')
        """,
        "media_dedup": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/media_dedup.parquet')
        """,
        "media_neardup": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/media_neardup.parquet')
        """,
        "term_contexts": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), probes AS (
                SELECT unnest(['scan', 'merge', 'window']) AS term
            ), hits AS (
                SELECT t.doc_id, probes.term, t.toks,
                       list_position(t.toks, probes.term) AS pos
                FROM t CROSS JOIN probes
            )
            SELECT doc_id, term, pos,
                   array_to_string(
                       toks[greatest(1, pos - 3) : least(len(toks), pos + 3)],
                       ' ') AS context
            FROM hits WHERE pos IS NOT NULL AND pos > 0
        """,
        "chunk_documents": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(text, '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), c AS (
                SELECT doc_id, toks,
                       unnest(range(0, len(toks), 24)) AS start_tok
                FROM t WHERE len(toks) > 0
            )
            SELECT doc_id, start_tok // 24 AS chunk_ix, start_tok,
                   least(32, len(toks) - start_tok) AS n_chunk_tokens,
                   array_to_string(
                       toks[start_tok + 1 : least(start_tok + 32, len(toks))],
                       ' ') AS chunk_text
            FROM c
        """,
        "skew_join_lineitem": """
            WITH l AS (
                SELECT l_orderkey,
                       CASE WHEN l_orderkey % 10 < 3 THEN 0
                            ELSE l_orderkey % 1000 END AS skew_key
                FROM lineitem
            ), d AS (
                SELECT i AS skew_key, (i * 7919) % 1000 AS dim_val
                FROM (SELECT unnest(range(1000)) AS i)
            )
            SELECT d.dim_val, l.l_orderkey, l.skew_key
            FROM l JOIN d USING (skew_key)
        """,
        "compression_ratio": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/compression_ratio.parquet')
        """,
        "neardup_clusters": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/neardup_clusters.parquet')
        """,
        "incremental_neardup": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/incremental_neardup.parquet')
        """,
        "incremental_dedup": """
            WITH old AS (
                SELECT doc_id, text FROM documents WHERE doc_id % 2 = 0
                UNION ALL
                SELECT doc_id + 1000000 AS doc_id, text FROM documents
                WHERE doc_id % 2 = 1 AND doc_id % 31 = 1
            ), o2 AS (
                SELECT sha256(text) AS sha, min(doc_id) AS dup_of
                FROM old GROUP BY sha256(text)
            ), nw AS (
                SELECT doc_id, sha256(text) AS sha FROM documents
                WHERE doc_id % 2 = 1
            )
            SELECT nw.doc_id, o2.dup_of FROM nw JOIN o2 USING (sha)
        """,
        "ccnet_buckets": r"""
            WITH t AS (
                SELECT doc_id,
                       list_filter(regexp_split_to_array(lower(text), '\s+'),
                                   x -> x <> '') AS toks
                FROM documents
            ), b AS (
                SELECT doc_id,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i] || ' ' || toks[i+1]))
                           AS bigram,
                       unnest(list_transform(range(1, len(toks)),
                                             i -> toks[i])) AS w1
                FROM t WHERE len(toks) >= 2
            ), bc AS (
                SELECT bigram, count(*) AS n FROM b GROUP BY bigram
            ), lc AS (
                SELECT w1, count(*) AS n1 FROM b GROUP BY w1
            ), s AS (
                SELECT b.doc_id, (bc.n * 1000000) // lc.n1 AS p
                FROM b JOIN bc USING (bigram) JOIN lc USING (w1)
            ), agg AS (
                SELECT doc_id, count(*) AS n_bigrams, sum(p) AS totp
                FROM s GROUP BY doc_id
            ), sc AS (
                SELECT d.doc_id, d.lang,
                       CAST(COALESCE(agg.totp // agg.n_bigrams, 0) AS BIGINT)
                           AS lm_score
                FROM documents d LEFT JOIN agg USING (doc_id)
            ), qq AS (
                SELECT lang, quantile_disc(lm_score, 1.0/3) AS c1,
                             quantile_disc(lm_score, 2.0/3) AS c2
                FROM sc GROUP BY lang
            )
            SELECT sc.doc_id, sc.lang, sc.lm_score,
                   CASE WHEN sc.lm_score <= qq.c1 THEN 'tail'
                        WHEN sc.lm_score <= qq.c2 THEN 'middle'
                        ELSE 'head' END AS bucket
            FROM sc JOIN qq USING (lang)
        """,
        "kg_triples": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
        """,
        "kg_triples_learned": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples_learned.parquet')
        """,
        "dsir_select": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/dsir_select.parquet')
        """,
        "kg_span_counts": """
            SELECT span_norm, count(*) AS count FROM (
                SELECT subj_norm AS span_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                UNION ALL
                SELECT obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ) GROUP BY span_norm
        """,
        "kg_pair_counts": """
            SELECT subj_norm, obj_norm, count(*) AS count
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            GROUP BY subj_norm, obj_norm
        """,
        "kg_degree_hist": """
            WITH e AS (
                SELECT DISTINCT subj_norm, obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), d AS (
                SELECT subj_norm, count(*) AS degree FROM e GROUP BY subj_norm
            )
            SELECT degree, count(*) AS n_nodes FROM d GROUP BY degree
        """,
        "kg_pair_pmi": """
            WITH p AS (
                SELECT subj_norm, obj_norm, count(*) AS n_pair
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                GROUP BY subj_norm, obj_norm
            ), s AS (
                SELECT subj_norm, sum(n_pair) AS n_s FROM p GROUP BY subj_norm
            ), o AS (
                SELECT obj_norm, sum(n_pair) AS n_o FROM p GROUP BY obj_norm
            ), t AS (SELECT sum(n_pair) AS total FROM p)
            SELECT p.subj_norm, p.obj_norm, p.n_pair,
                   CAST((p.n_pair * t.total * 1000) // (s.n_s * o.n_o)
                        AS BIGINT) AS pmi_scaled
            FROM p JOIN s USING (subj_norm) JOIN o USING (obj_norm)
            CROSS JOIN t
        """,
        "kg_functional_conflicts": """
            SELECT subj_norm, pred,
                   count(DISTINCT obj_norm) AS n_objs,
                   min(obj_norm) AS obj_min,
                   max(obj_norm) AS obj_max
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            GROUP BY subj_norm, pred
            HAVING count(DISTINCT obj_norm) > 1
        """,
        "kg_entity_kb": """
            WITH t AS (
                SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), m AS (
                SELECT entity, count(*) AS n_mentions FROM (
                    SELECT subj_norm AS entity FROM t
                    UNION ALL SELECT obj_norm FROM t
                ) GROUP BY entity
            ), e AS (
                SELECT DISTINCT subj_norm, pred, obj_norm FROM t
            ), dout AS (
                SELECT subj_norm AS entity, count(*) AS out_edges
                FROM e GROUP BY 1
            ), din AS (
                SELECT obj_norm AS entity, count(*) AS in_edges
                FROM e GROUP BY 1
            ), tp AS (
                SELECT entity, pred AS top_pred FROM (
                    SELECT subj_norm AS entity, pred, count(*) AS c,
                           row_number() OVER (
                               PARTITION BY subj_norm
                               ORDER BY count(*) DESC, pred) AS rn
                    FROM t GROUP BY subj_norm, pred
                ) WHERE rn = 1
            ), al AS (
                SELECT entity, string_agg(s, '|' ORDER BY s) AS aliases
                FROM (
                    SELECT DISTINCT subj_norm AS entity, subj AS s FROM t
                    UNION SELECT DISTINCT obj_norm, obj FROM t
                ) GROUP BY entity
            )
            SELECT m.entity, m.n_mentions,
                   CAST(coalesce(dout.out_edges, 0) AS BIGINT) AS out_edges,
                   CAST(coalesce(din.in_edges, 0) AS BIGINT) AS in_edges,
                   coalesce(tp.top_pred, '') AS top_pred,
                   al.aliases
            FROM m
            LEFT JOIN dout USING (entity)
            LEFT JOIN din USING (entity)
            LEFT JOIN tp ON tp.entity = m.entity
            JOIN al ON al.entity = m.entity
        """,
        "kg_predicate_stats": """
            WITH e AS (
                SELECT DISTINCT subj_norm, pred, obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            )
            SELECT pred, count(*) AS n_edges,
                   count(DISTINCT subj_norm) AS n_subj,
                   count(DISTINCT obj_norm) AS n_obj,
                   count(*) * 1000 // count(DISTINCT subj_norm)
                       AS fanout_scaled
            FROM e GROUP BY pred
        """,
        "kg_pred_paths": """
            WITH e AS (
                SELECT DISTINCT subj_norm, pred, obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            )
            SELECT a.pred AS pred_a, b.pred AS pred_b, count(*) AS n_paths
            FROM e a JOIN e b ON a.obj_norm = b.subj_norm
            GROUP BY 1, 2
        """,
        "kg_inverse_detect": """
            WITH e AS (
                SELECT DISTINCT subj_norm AS s, pred AS p, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), inv AS (
                SELECT a.p AS pred_a, b.p AS pred_b, count(*) AS n_inv
                FROM e a JOIN e b ON a.s = b.o AND a.o = b.s
                GROUP BY 1, 2
            ), tot AS (
                SELECT p AS pred_a, count(*) AS n_a FROM e GROUP BY 1
            )
            SELECT pred_a, pred_b, n_inv, n_a,
                   CAST((n_inv * 10000) // n_a AS BIGINT) AS frac_scaled
            FROM inv JOIN tot USING (pred_a)
        """,
        "kg_functional_repair": """
            WITH s AS (
                SELECT subj_norm, pred, obj_norm, count(*) AS support
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                GROUP BY 1, 2, 3
            ), r AS (
                SELECT subj_norm, pred, obj_norm, support,
                       count(*) OVER (PARTITION BY subj_norm, pred)
                           AS n_objs,
                       row_number() OVER (
                           PARTITION BY subj_norm, pred
                           ORDER BY support DESC, obj_norm) AS rk
                FROM s
            )
            SELECT subj_norm, pred, obj_norm, support,
                   CAST(n_objs AS BIGINT) AS n_objs
            FROM r WHERE rk = 1
        """,
        "knn_graph": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/knn_graph.parquet')
        """,
        "doc_novelty": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/doc_novelty.parquet')
        """,
        "kg_taxonomy_depth": """
            WITH RECURSIVE h AS (
                SELECT DISTINCT subj_norm AS child, obj_norm AS parent
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE pred = 'HYPONYM-OF'
            ), fanout AS (
                SELECT parent AS node, count(*) AS n_children
                FROM h GROUP BY parent
            ), roots AS (
                SELECT node FROM fanout
                ORDER BY n_children DESC, node LIMIT 3
            ), walk(node, dist) AS (
                SELECT node, 0 FROM roots
                UNION
                SELECT h.child, w.dist + 1
                FROM walk w JOIN h ON h.parent = w.node
                WHERE w.dist < 4
            )
            SELECT node, min(dist) AS dist FROM walk GROUP BY node
        """,
        "kg_redundant_edges": """
            WITH e AS (
                SELECT DISTINCT subj_norm AS s, pred AS p, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), nl AS (
                SELECT * FROM e WHERE s <> o
            ), ind AS (
                SELECT p, o AS mid, count(*) AS ind FROM nl GROUP BY 1, 2
            ), outd AS (
                SELECT p, s AS mid, count(*) AS outd FROM nl GROUP BY 1, 2
            ), ok AS (
                SELECT i.p, i.mid FROM ind i
                JOIN outd d ON i.p = d.p AND i.mid = d.mid
                WHERE i.ind <= 64 AND d.outd <= 64
            ), paths AS (
                SELECT DISTINCT a.p, a.s AS x, b.o AS z
                FROM nl a
                JOIN ok ON a.p = ok.p AND a.o = ok.mid
                JOIN nl b ON b.p = a.p AND b.s = a.o
            )
            SELECT e.s AS subj_norm, e.p AS pred, e.o AS obj_norm
            FROM e JOIN paths ON e.p = paths.p AND e.s = paths.x
                               AND e.o = paths.z
        """,
        "label_centroids": """
            WITH u AS (
                SELECT label,
                       CAST(round(CAST(unnest(embedding) AS DOUBLE) * 1000000)
                            AS BIGINT) AS x,
                       generate_subscripts(embedding, 1) AS d
                FROM embeddings
            )
            SELECT label, CAST(d AS BIGINT) AS d,
                   count(*) AS n_vecs,
                   CAST(sum(x) AS BIGINT) // count(*) AS centroid_scaled
            FROM u GROUP BY label, d
        """,
        "embedding_quantize": """
            WITH u AS (
                SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS x,
                       generate_subscripts(embedding, 1) AS d
                FROM embeddings
            ), mm AS (
                SELECT d, min(x) AS mn, max(x) AS mx FROM u GROUP BY d
            ), qq AS (
                SELECT u.vec_id,
                       CASE WHEN mm.mx = mm.mn THEN 0
                            ELSE least(255, CAST(floor(
                                ((u.x - mm.mn) * 255.0) / (mm.mx - mm.mn))
                                AS BIGINT))
                       END AS c
                FROM u JOIN mm USING (d)
            )
            SELECT vec_id, CAST(sum(c) AS BIGINT) AS code_sum,
                   min(c) AS code_min, max(c) AS code_max
            FROM qq GROUP BY vec_id
        """,
        "kg_alias_type_conflicts": """
            WITH map AS (
                SELECT name, component FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/kg_alias_mapping.parquet')
            ), m AS (
                SELECT * FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/kg_mention_counts.parquet')
            ), r AS (
                SELECT mention_norm AS entity, label AS etype,
                       row_number() OVER (
                           PARTITION BY mention_norm
                           ORDER BY n DESC, label) AS rk
                FROM m
            ), ty AS (
                SELECT entity, etype FROM r WHERE rk = 1
            ), mem AS (
                SELECT map.component, map.name, ty.etype
                FROM map LEFT JOIN ty ON map.name = ty.entity
            )
            SELECT component, count(*) AS n_members,
                   count(DISTINCT etype) AS n_types,
                   COALESCE(array_to_string(list_sort(
                       list(DISTINCT etype) FILTER (WHERE etype IS NOT NULL)
                   ), '|'), '') AS types
            FROM mem GROUP BY component
            HAVING count(*) >= 2
        """,
        "kg_calibration": """
            WITH p0 AS (
                SELECT DISTINCT doc_id, subj_norm, pred, obj_norm,
                       CAST(conf AS DOUBLE) AS conf
                FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/kg_triples_learned.parquet')
            ), mm AS (
                SELECT min(conf) AS cmin, max(conf) AS cmax FROM p0
            ), p AS (
                SELECT doc_id, subj_norm, pred, obj_norm,
                       CASE WHEN mm.cmax = mm.cmin THEN 0
                            ELSE least(9, CAST(floor(
                                ((conf - mm.cmin) * 10.0)
                                / (mm.cmax - mm.cmin)) AS BIGINT))
                       END AS bin
                FROM p0, mm
            ), g AS (
                SELECT DISTINCT doc_id, subj_norm, pred, obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), j AS (
                SELECT p.bin,
                       CASE WHEN g.doc_id IS NOT NULL THEN 1 ELSE 0 END AS ok
                FROM p LEFT JOIN g USING (doc_id, subj_norm, pred, obj_norm)
            )
            SELECT bin, count(*) AS n_pred,
                   CAST(sum(ok) AS BIGINT) AS n_correct,
                   CAST((CAST(sum(ok) AS BIGINT) * 10000) // count(*)
                        AS BIGINT) AS prec_scaled
            FROM j GROUP BY bin
        """,
        "kg_domain_range": """
            WITH m AS (
                SELECT * FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/kg_mention_counts.parquet')
            ), r AS (
                SELECT mention_norm AS entity, label AS etype,
                       row_number() OVER (
                           PARTITION BY mention_norm
                           ORDER BY n DESC, label) AS rk
                FROM m
            ), ty AS (
                SELECT entity, etype FROM r WHERE rk = 1
            ), e AS (
                SELECT DISTINCT subj_norm, pred, obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), typed AS (
                SELECT e.pred,
                       COALESCE(ts.etype, 'UNKNOWN') AS subj_type,
                       COALESCE(tobj.etype, 'UNKNOWN') AS obj_type
                FROM e LEFT JOIN ty ts ON e.subj_norm = ts.entity
                       LEFT JOIN ty tobj ON e.obj_norm = tobj.entity
            ), sig AS (
                SELECT pred, subj_type, obj_type, count(*) AS n_edges
                FROM typed GROUP BY 1, 2, 3
            ), tot AS (
                SELECT pred, count(*) AS n_pred FROM e GROUP BY 1
            )
            SELECT s.pred, s.subj_type, s.obj_type, s.n_edges, t.n_pred,
                   CAST((s.n_edges * 10000) // t.n_pred AS BIGINT)
                       AS frac_scaled
            FROM sig s JOIN tot t USING (pred)
        """,
        "kg_rule_mining": """
            WITH e AS (
                SELECT DISTINCT subj_norm AS s, pred AS p, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), ind AS (
                SELECT o AS mid, count(*) AS ind FROM e GROUP BY 1
            ), outd AS (
                SELECT s AS mid, count(*) AS outd FROM e GROUP BY 1
            ), ok AS (
                SELECT i.mid FROM ind i JOIN outd d ON i.mid = d.mid
                WHERE i.ind <= 64 AND d.outd <= 64
            ), paths AS (
                SELECT DISTINCT a.p AS pred_a, b.p AS pred_b,
                                a.s AS x, b.o AS z
                FROM e a JOIN ok ON a.o = ok.mid
                         JOIN e b ON b.s = a.o
            ), body AS (
                SELECT pred_a, pred_b, count(*) AS n_body
                FROM paths GROUP BY 1, 2
            ), sup AS (
                SELECT p.pred_a, p.pred_b, h.p AS pred_c,
                       count(*) AS n_support
                FROM paths p JOIN e h ON h.s = p.x AND h.o = p.z
                GROUP BY 1, 2, 3
            )
            SELECT s.pred_a, s.pred_b, s.pred_c, s.n_support, b.n_body,
                   CAST((s.n_support * 10000) // b.n_body AS BIGINT)
                       AS conf_scaled
            FROM sup s JOIN body b USING (pred_a, pred_b)
            WHERE s.n_support >= 1
        """,
        "kg_link_predict": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), adj AS (
                SELECT u AS c, v AS n FROM e UNION ALL SELECT v, u FROM e
            ), deg AS (
                SELECT c, count(*) AS d FROM adj GROUP BY c
            ), ok AS (
                SELECT adj.c, adj.n FROM adj JOIN deg USING (c)
                WHERE d <= 64
            ), p AS (
                SELECT a.n AS x, b.n AS y, count(*) AS common_neighbors
                FROM ok a JOIN ok b ON a.c = b.c AND a.n < b.n
                GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT p.x, p.y, p.common_neighbors FROM p
            WHERE NOT EXISTS (
                SELECT 1 FROM e WHERE e.u = p.x AND e.v = p.y)
        """,
        "kg_resource_allocation": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), adj AS (
                SELECT u AS c, v AS n FROM e UNION ALL SELECT v, u FROM e
            ), deg AS (
                SELECT c, count(*) AS d FROM adj GROUP BY c
            ), ok AS (
                SELECT adj.c, adj.n, d FROM adj JOIN deg USING (c)
                WHERE d <= 64
            ), p AS (
                SELECT a.n AS x, b.n AS y,
                       count(*) AS common_neighbors,
                       CAST(sum(1000000000000 // a.d) AS BIGINT) AS ra_score
                FROM ok a JOIN ok b ON a.c = b.c AND a.n < b.n
                GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT p.x, p.y, p.common_neighbors, p.ra_score FROM p
            WHERE NOT EXISTS (
                SELECT 1 FROM e WHERE e.u = p.x AND e.v = p.y)
        """,
        "kg_neighbor_jaccard": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), adj AS (
                SELECT u AS c, v AS n FROM e UNION ALL SELECT v, u FROM e
            ), deg AS (
                SELECT c, count(*) AS d FROM adj GROUP BY c
            ), ok AS (
                SELECT adj.c, adj.n FROM adj JOIN deg USING (c)
                WHERE d <= 64
            ), p AS (
                SELECT a.n AS x, b.n AS y, count(*) AS common_neighbors
                FROM ok a JOIN ok b ON a.c = b.c AND a.n < b.n
                GROUP BY 1, 2 HAVING count(*) >= 2
            )
            SELECT p.x, p.y, p.common_neighbors,
                   dx.d AS deg_x, dy.d AS deg_y,
                   CAST((p.common_neighbors * 1000000)
                        // (dx.d + dy.d - p.common_neighbors) AS BIGINT)
                       AS jaccard_scaled,
                   CASE WHEN EXISTS (
                       SELECT 1 FROM e WHERE e.u = p.x AND e.v = p.y)
                       THEN 1 ELSE 0 END AS is_edge
            FROM p
            JOIN deg dx ON dx.c = p.x
            JOIN deg dy ON dy.c = p.y
        """,
        "kg_bfs_distances": """
            WITH RECURSIVE d AS (
                SELECT DISTINCT subj_norm AS s, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), e AS (
                -- DuckDB 1.0 quirk: inside WITH RECURSIVE, a plain UNION in
                -- a NON-recursive CTE is executed as UNION ALL (no dedup),
                -- doubling reciprocal-edge degrees — dedup explicitly
                SELECT DISTINCT * FROM (
                    SELECT s AS src, o AS dst FROM d
                    UNION ALL SELECT o, s FROM d)
            ), deg AS (
                SELECT src AS node, count(*) AS dg FROM e GROUP BY src
            ), seeds AS (
                SELECT node FROM deg ORDER BY dg DESC, node LIMIT 3
            ), walk(node, dist) AS (
                SELECT node, 0 FROM seeds
                UNION
                SELECT e.dst, w.dist + 1
                FROM walk w JOIN e ON e.src = w.node
                WHERE w.dist < 3
            )
            SELECT node, min(dist) AS dist FROM walk GROUP BY node
        """,
        "kg_closeness": """
            WITH RECURSIVE d AS (
                SELECT DISTINCT subj_norm AS s, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), e AS (
                SELECT DISTINCT * FROM (
                    SELECT s AS src, o AS dst FROM d
                    UNION ALL SELECT o, s FROM d)
            ), deg AS (
                SELECT src AS node, count(*) AS dg FROM e GROUP BY src
            ), seeds AS (
                SELECT node FROM deg ORDER BY dg DESC, node LIMIT 3
            ), walk(seed, node, dist) AS (
                SELECT node, node, 0 FROM seeds
                UNION
                SELECT w.seed, e.dst, w.dist + 1
                FROM walk w JOIN e ON e.src = w.node
                WHERE w.dist < 3
            ), md AS (
                SELECT seed, node, min(dist) AS dist FROM walk
                GROUP BY seed, node
            )
            SELECT node, count(*) AS n_sources,
                   CAST(sum(dist) AS BIGINT) AS dist_sum,
                   CAST(sum(CASE WHEN dist > 0 THEN 1000000 // dist
                                 ELSE 0 END) AS BIGINT) AS harmonic_ppm
            FROM md GROUP BY node
        """,
        "kg_blocking_recall": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/kg_blocking_recall.parquet')
        """,
        "kg_type_propagation": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/kg_type_propagation.parquet')
        """,
        "kg_edge_confidence": """
            SELECT subj_norm, pred, obj_norm,
                   count(*) AS n_assertions,
                   CAST(min(CAST(floor(conf * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS conf_min_scaled,
                   CAST(max(CAST(floor(conf * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS conf_max_scaled,
                   CAST(sum(CAST(floor(conf * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS conf_sum_scaled
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            GROUP BY subj_norm, pred, obj_norm
        """,
        "kg_extraction_density": """
            SELECT doc_id, count(*) AS n_triples,
                   count(DISTINCT sentence) AS n_active_sents,
                   CAST(count(*) * 1000000
                        // greatest(count(DISTINCT sentence), 1)
                        AS BIGINT) AS density_ppm
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            GROUP BY doc_id
        """,
        "kg_eccentricity": """
            WITH RECURSIVE d AS (
                SELECT DISTINCT subj_norm AS s, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), e AS (
                SELECT DISTINCT * FROM (
                    SELECT s AS src, o AS dst FROM d
                    UNION ALL SELECT o, s FROM d)
            ), deg AS (
                SELECT src AS node, count(*) AS dg FROM e GROUP BY src
            ), seeds AS (
                SELECT node FROM deg ORDER BY dg DESC, node LIMIT 3
            ), walk(seed, node, dist) AS (
                SELECT node, node, 0 FROM seeds
                UNION
                SELECT w.seed, e.dst, w.dist + 1
                FROM walk w JOIN e ON e.src = w.node
                WHERE w.dist < 3
            ), md AS (
                SELECT seed, node, min(dist) AS dist FROM walk
                GROUP BY seed, node
            )
            SELECT seed, count(*) AS n_reached,
                   CAST(sum(dist) AS BIGINT) AS dist_sum,
                   CAST(max(dist) AS BIGINT) AS eccentricity,
                   CAST(CAST(sum(dist) AS BIGINT) * 1000000
                        // greatest(count(*), 1) AS BIGINT)
                       AS mean_dist_ppm
            FROM md GROUP BY seed
        """,
        "orders_monthly_growth": """
            WITH m AS (
                SELECT strftime(o_orderdate, '%Y-%m') AS month,
                       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS sum_cents
                FROM orders GROUP BY month
            ), g AS (
                SELECT month, sum_cents,
                       sum_cents - lag(sum_cents) OVER (ORDER BY month)
                           AS delta_cents
                FROM m
            )
            SELECT month, sum_cents, CAST(delta_cents AS BIGINT)
                       AS delta_cents
            FROM g WHERE delta_cents IS NOT NULL
        """,
        "events_distinct_users": """
            SELECT event_type, count(DISTINCT user_id) AS n_users
            FROM events GROUP BY event_type
        """,
        "rfm_segments": """
            WITH pc AS (
                SELECT o_custkey,
                       max(CAST(CAST(o_orderdate AS DATE)
                                - DATE '1970-01-01' AS BIGINT)) AS r_day,
                       count(*) AS freq,
                       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS mon
                FROM orders GROUP BY 1
            ), c AS (
                SELECT quantile_disc(r_day, [0.25, 0.5, 0.75]) AS rc,
                       quantile_disc(freq, [0.25, 0.5, 0.75]) AS fc,
                       quantile_disc(mon, [0.25, 0.5, 0.75]) AS mc
                FROM pc
            )
            SELECT (1 + CAST(r_day > rc[1] AS INT)
                      + CAST(r_day > rc[2] AS INT)
                      + CAST(r_day > rc[3] AS INT)) * 100
                   + (1 + CAST(freq > fc[1] AS INT)
                        + CAST(freq > fc[2] AS INT)
                        + CAST(freq > fc[3] AS INT)) * 10
                   + (1 + CAST(mon > mc[1] AS INT)
                        + CAST(mon > mc[2] AS INT)
                        + CAST(mon > mc[3] AS INT)) AS segment,
                   count(*) AS n_customers
            FROM pc, c GROUP BY segment
        """,
        "doc_length_quantiles": """
            SELECT source,
                   unnest([0.1::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE]) AS q,
                   CAST(unnest(quantile_disc(n_chars, [0.1, 0.5, 0.9]))
                        AS DOUBLE) AS v
            FROM documents GROUP BY source
        """,
        "orders_priority_share": """
            WITH g AS (
                SELECT o_orderpriority,
                       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5)
                                     AS BIGINT)) AS BIGINT) AS sum_cents
                FROM orders GROUP BY o_orderpriority
            ), t AS (
                SELECT greatest(CAST(sum(sum_cents) AS BIGINT), 1) AS total
                FROM g
            )
            SELECT o_orderpriority, sum_cents,
                   CAST(sum_cents * 1000000 // total AS BIGINT) AS share_ppm
            FROM g, t
        """,
        "kg_random_walks": """
            WITH e AS (
                SELECT DISTINCT subj_norm AS s, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), a AS (
                SELECT s, o,
                       row_number() OVER (PARTITION BY s ORDER BY o) - 1
                           AS rn,
                       count(*) OVER (PARTITION BY s) AS deg
                FROM e
            ), w0 AS (
                SELECT DISTINCT s AS seed, s AS cur FROM e
            ), w1 AS (
                SELECT seed, a.o AS cur FROM w0
                JOIN a ON a.s = w0.cur AND a.rn = 0 % a.deg
            ), w2 AS (
                SELECT seed, a.o AS cur FROM w1
                JOIN a ON a.s = w1.cur AND a.rn = 1 % a.deg
            ), w3 AS (
                SELECT seed, a.o AS cur FROM w2
                JOIN a ON a.s = w2.cur AND a.rn = 2 % a.deg
            )
            SELECT seed, 1 AS step, cur AS node FROM w1
            UNION ALL SELECT seed, 2, cur FROM w2
            UNION ALL SELECT seed, 3, cur FROM w3
        """,
        "kg_neighbor_sample": """
            WITH e AS (
                SELECT DISTINCT subj_norm AS s, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), a AS (
                SELECT s, o FROM (
                    SELECT s, o,
                           row_number() OVER (PARTITION BY s ORDER BY o)
                               AS rn
                    FROM e)
                WHERE rn <= 3
            ), h1 AS (
                SELECT s AS seed, o AS node, 1 AS hop FROM a
            ), h2 AS (
                SELECT h1.seed, a2.o AS node, 2 AS hop
                FROM h1 JOIN a a2 ON a2.s = h1.node
            ), u AS (
                SELECT * FROM h1 UNION ALL SELECT * FROM h2
            )
            SELECT seed, node, CAST(min(hop) AS BIGINT) AS hop
            FROM u WHERE node <> seed GROUP BY seed, node
        """,
        "kg_predicate_align": """
            WITH t AS (
                SELECT doc_id, pred, subj_norm || '|' || obj_norm AS k
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), a AS (
                SELECT DISTINCT pred, k FROM t WHERE length(doc_id) % 2 = 0
            ), b AS (
                SELECT DISTINCT pred, k FROM t
                WHERE length(doc_id) % 2 <> 0
            ), na AS (
                SELECT pred, count(*) AS n_a FROM a GROUP BY pred
            ), nb AS (
                SELECT pred, count(*) AS n_b FROM b GROUP BY pred
            ), c AS (
                SELECT a.pred AS pred_a, b.pred AS pred_b,
                       count(*) AS n_common
                FROM a JOIN b USING (k) GROUP BY 1, 2
            )
            SELECT pred_a, pred_b, n_common, n_a, n_b,
                   CAST(n_common * 1000000 // (n_a + n_b - n_common)
                        AS BIGINT) AS jaccard_ppm
            FROM c JOIN na ON na.pred = pred_a
                   JOIN nb ON nb.pred = pred_b
        """,
        "kg_pred_cooccurrence": """
            WITH dp AS (
                SELECT DISTINCT doc_id, pred
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            )
            SELECT x.pred AS pred_a, y.pred AS pred_b, count(*) AS support
            FROM dp x JOIN dp y
                 ON x.doc_id = y.doc_id AND x.pred < y.pred
            GROUP BY pred_a, pred_b
        """,
        "kg_conf_quantiles": """
            SELECT pred,
                   unnest([0.25::DOUBLE, 0.5::DOUBLE, 0.9::DOUBLE]) AS q,
                   unnest(quantile_disc(conf, [0.25, 0.5, 0.9])) AS v
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            GROUP BY pred
        """,
        "kg_reciprocity": """
            WITH e AS (
                SELECT DISTINCT subj_norm AS s, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), flags AS (
                SELECT CASE WHEN EXISTS (SELECT 1 FROM e e2
                                         WHERE e2.s = e.o AND e2.o = e.s)
                            THEN 1 ELSE 0 END AS rec
                FROM e
            )
            SELECT count(*) AS n_edges,
                   CAST(sum(rec) AS BIGINT) AS n_reciprocal,
                   CAST(CAST(sum(rec) AS BIGINT) * 1000000
                        // greatest(count(*), 1) AS BIGINT) AS reciprocity_ppm
            FROM flags
        """,
        "kg_pagerank_weighted": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/kg_pagerank_weighted.parquet')
        """,
        "kg_symmetry": """
            WITH e AS (
                SELECT DISTINCT pred, subj_norm AS s, obj_norm AS o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), flags AS (
                SELECT pred,
                       CASE WHEN EXISTS (SELECT 1 FROM e e2
                                         WHERE e2.pred = e.pred
                                           AND e2.s = e.o AND e2.o = e.s)
                            THEN 1 ELSE 0 END AS rec
                FROM e
            )
            SELECT pred, count(*) AS n_edges,
                   CAST(sum(rec) AS BIGINT) AS n_symmetric,
                   CAST(CAST(sum(rec) AS BIGINT) * 1000000
                        // greatest(count(*), 1) AS BIGINT) AS symmetry_ppm
            FROM flags GROUP BY pred
        """,
        "brand_return_rates": """
            SELECT p_brand,
                   count(*) AS n_lines,
                   CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_returned,
                   CAST(CAST(sum(CASE WHEN l_returnflag = 'R' THEN 1
                                      ELSE 0 END) AS BIGINT) * 1000000
                        // greatest(count(*), 1) AS BIGINT) AS return_ppm
            FROM lineitem JOIN part ON p_partkey = l_partkey
            GROUP BY p_brand
        """,
        "tpch_q13": """
            WITH pc AS (
                SELECT c_custkey, count(o_orderkey) AS n_orders
                FROM customer LEFT JOIN orders ON o_custkey = c_custkey
                GROUP BY c_custkey
            )
            SELECT n_orders, count(*) AS n_customers
            FROM pc GROUP BY n_orders
        """,
        "tpch_q7": """
            SELECT 'NATION_' || CAST(s_nationkey AS VARCHAR) AS supp_nation,
                   'NATION_' || CAST(c_nationkey AS VARCHAR) AS cust_nation,
                   CAST(year(l_shipdate) AS BIGINT) AS l_year,
                   CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                            * (100 - CAST(floor(l_discount * 100 + 0.5)
                                          AS BIGINT))) AS BIGINT) AS revenue_s
            FROM lineitem
            JOIN supplier ON s_suppkey = l_suppkey
            JOIN orders ON o_orderkey = l_orderkey
            JOIN customer ON c_custkey = o_custkey
            WHERE s_nationkey <> c_nationkey
              AND l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate < TIMESTAMP '1998-01-01'
            GROUP BY 1, 2, 3
        """,
        "tpch_q14": """
            WITH m AS (
                SELECT CAST(year(l_shipdate) * 100 + month(l_shipdate)
                            AS BIGINT) AS month,
                       sum(CASE WHEN p_type = 'PROMO'
                                THEN CAST(floor(l_extendedprice * 100 + 0.5)
                                          AS BIGINT)
                                     * (100 - CAST(floor(l_discount * 100
                                                         + 0.5) AS BIGINT))
                                ELSE 0 END) AS promo_s,
                       sum(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           * (100 - CAST(floor(l_discount * 100 + 0.5)
                                         AS BIGINT))) AS total_s
                FROM lineitem JOIN part ON p_partkey = l_partkey
                GROUP BY 1
            )
            SELECT month, CAST(promo_s AS BIGINT) AS promo_s,
                   CAST(total_s AS BIGINT) AS total_s,
                   CAST(CASE WHEN total_s > 0
                             THEN promo_s * 1000000 // total_s
                             ELSE 0 END AS BIGINT) AS promo_ppm
            FROM m
        """,
        "tpch_q18": """
            SELECT c_name, c_custkey, o_orderkey, o_orderdate,
                   round(o_totalprice, 2) AS o_totalprice,
                   CAST(sum(CAST(floor(l_quantity + 0.5) AS BIGINT))
                        AS BIGINT) AS sum_qty
            FROM customer
            JOIN orders ON o_custkey = c_custkey
            JOIN lineitem ON l_orderkey = o_orderkey
            GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
            HAVING sum(CAST(floor(l_quantity + 0.5) AS BIGINT)) > 175
        """,
        "tpch_q22": """
            WITH pos AS (
                SELECT CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                            AS BIGINT) AS sum_s,
                       count(*) AS n_pos
                FROM customer
                WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) > 0
            ), urgent AS (
                SELECT DISTINCT o_custkey FROM orders
                WHERE o_orderpriority = '1-URGENT'
            )
            SELECT c_nationkey AS nation, count(*) AS n_cust,
                   CAST(sum(CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT))
                        AS BIGINT) AS totacctbal_s
            FROM customer, pos
            WHERE CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) * n_pos > sum_s
              AND c_custkey NOT IN (SELECT o_custkey FROM urgent)
            GROUP BY c_nationkey
        """,
        "orders_cohort_ltv": """
            WITH o AS (
                SELECT o_custkey,
                       CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                            AS BIGINT) AS month_ix,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM orders
            ), f AS (
                SELECT o_custkey, min(month_ix) AS cohort_ix FROM o
                GROUP BY o_custkey
            )
            SELECT cohort_ix, month_ix - cohort_ix AS month_offset,
                   CAST(sum(cents) AS BIGINT) AS revenue_cents,
                   count(*) AS n_orders
            FROM o JOIN f USING (o_custkey)
            GROUP BY cohort_ix, month_offset
        """,
        "part_abc_classes": """
            WITH pr AS (
                SELECT l_partkey AS p_partkey,
                       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT)
                                * (100 - CAST(floor(l_discount * 100 + 0.5)
                                              AS BIGINT))) AS BIGINT)
                           AS revenue_s
                FROM lineitem GROUP BY l_partkey
            ), w AS (
                SELECT p_partkey, revenue_s,
                       CAST(sum(revenue_s) OVER (
                           ORDER BY revenue_s DESC
                           RANGE BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS HUGEINT) AS cum,
                       CAST(sum(revenue_s) OVER () AS HUGEINT) AS total
                FROM pr
            )
            SELECT p_partkey, revenue_s,
                   CASE WHEN cum * 100 <= 80 * total THEN 'A'
                        WHEN cum * 100 <= 95 * total THEN 'B'
                        ELSE 'C' END AS abc_class
            FROM w
        """,
        "tpch_q10": """
            WITH rev AS (
                SELECT o_custkey,
                       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT)
                                * (100 - CAST(floor(l_discount * 100 + 0.5)
                                              AS BIGINT))) AS BIGINT)
                           AS revenue_s
                FROM lineitem JOIN orders ON l_orderkey = o_orderkey
                WHERE l_returnflag = 'R'
                  AND o_orderdate >= TIMESTAMP '1997-07-01'
                  AND o_orderdate < TIMESTAMP '1997-10-01'
                GROUP BY o_custkey
                ORDER BY revenue_s DESC, o_custkey
                LIMIT 20
            )
            SELECT o_custkey, c_name, n_name,
                   CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT)
                       AS acctbal_cents,
                   revenue_s
            FROM rev
            JOIN customer ON c_custkey = o_custkey
            JOIN nation ON n_nationkey = c_nationkey
            ORDER BY revenue_s DESC, o_custkey
        """,
        "orders_with_returns": """
            SELECT o_orderpriority, count(*) AS n_orders
            FROM orders
            WHERE o_orderdate >= TIMESTAMP '1997-07-01'
              AND o_orderdate < TIMESTAMP '1997-10-01'
              AND EXISTS (SELECT 1 FROM lineitem
                          WHERE l_orderkey = o_orderkey
                            AND l_returnflag = 'R')
            GROUP BY o_orderpriority
        """,
        "kg_assortativity": """
            WITH p AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), nd AS (
                SELECT u AS node FROM p UNION ALL SELECT v FROM p
            ), d AS (
                SELECT node, count(*) AS deg FROM nd GROUP BY node
            ), pts AS (
                SELECT du.deg AS x, dv.deg AS y
                FROM p JOIN d du ON du.node = p.u
                       JOIN d dv ON dv.node = p.v
                UNION ALL
                SELECT dv.deg, du.deg
                FROM p JOIN d du ON du.node = p.u
                       JOIN d dv ON dv.node = p.v
            ), s AS (
                SELECT count(*) AS n, CAST(sum(x) AS BIGINT) AS sx,
                       CAST(sum(y) AS BIGINT) AS sy,
                       CAST(sum(x * x) AS BIGINT) AS sxx,
                       CAST(sum(y * y) AS BIGINT) AS syy,
                       CAST(sum(x * y) AS BIGINT) AS sxy
                FROM pts
            )
            SELECT n AS n_points,
                   round(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
                         THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                              / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                     * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
                         ELSE 0.0 END, 6) AS assortativity
            FROM s
        """,
        "kg_triangles": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), t AS (
                SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM e e1
                JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            ), n AS (
                SELECT a AS node FROM t
                UNION ALL SELECT b FROM t
                UNION ALL SELECT c FROM t
            )
            SELECT node, count(*) AS n_triangles FROM n GROUP BY node
        """,
        "tpch_q17": """
            WITH l AS (
                SELECT l_partkey,
                       CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_s,
                       CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                           AS ext_s
                FROM lineitem
            ), s AS (
                SELECT l_partkey, count(*) AS n_l, sum(qty_s) AS sum_qty_s
                FROM l GROUP BY 1
            )
            SELECT CAST(count(*) AS BIGINT) AS n_small,
                   CAST(sum(l.ext_s) AS BIGINT) AS total_s,
                   CAST(sum(l.ext_s) // 7 AS BIGINT) AS avg_yearly_s
            FROM l JOIN s USING (l_partkey)
            WHERE 5 * l.qty_s * s.n_l < s.sum_qty_s
        """,
        "events_ab_lift": """
            WITH e AS (
                SELECT event_type, user_id % 2 AS grp,
                       CAST(floor(value * 100 + 0.5) AS BIGINT) AS val_s
                FROM events
            ), a AS (
                SELECT event_type,
                       sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS n_a,
                       sum(CASE WHEN grp = 0 THEN val_s ELSE 0 END) AS sum_a_s,
                       sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS n_b,
                       sum(CASE WHEN grp = 1 THEN val_s ELSE 0 END) AS sum_b_s
                FROM e GROUP BY 1
            )
            SELECT event_type,
                   CAST(n_a AS BIGINT) AS n_a,
                   CAST(sum_a_s AS BIGINT) AS sum_a_s,
                   CAST(n_b AS BIGINT) AS n_b,
                   CAST(sum_b_s AS BIGINT) AS sum_b_s,
                   CAST(CASE WHEN sum_a_s > 0 AND n_b > 0
                             THEN (sum_b_s * n_a * 1000000) // (sum_a_s * n_b)
                                  - 1000000
                             ELSE 0 END AS BIGINT) AS lift_ppm
            FROM a
        """,
        "data_quality_checks": """
            SELECT 'discount_range' AS check_name,
                   CAST(sum(CASE WHEN l_discount < 0.0 OR l_discount > 0.1
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
                   count(*) AS n_checked
            FROM lineitem
            UNION ALL
            SELECT 'quantity_range',
                   CAST(sum(CASE WHEN l_quantity < 1.0 OR l_quantity > 50.0
                            THEN 1 ELSE 0 END) AS BIGINT), count(*)
            FROM lineitem
            UNION ALL
            SELECT 'value_nonneg',
                   CAST(sum(CASE WHEN value < 0.0 THEN 1 ELSE 0 END)
                        AS BIGINT), count(*)
            FROM events
            UNION ALL
            SELECT 'event_type_enum',
                   CAST(sum(CASE WHEN event_type NOT IN
                            ('view','click','purchase','signup','error')
                            THEN 1 ELSE 0 END) AS BIGINT), count(*)
            FROM events
            UNION ALL
            SELECT 'orderkey_referential',
                   CAST(sum(CASE WHEN o.o_orderkey IS NULL THEN 1 ELSE 0 END)
                        AS BIGINT), count(*)
            FROM lineitem l LEFT JOIN orders o ON l.l_orderkey = o.o_orderkey
        """,
        "orders_zorder": """
            WITH m AS (
                SELECT o_orderkey,
                       o_custkey % 65536 AS ck,
                       CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                            AS BIGINT) % 65536 AS day
                FROM orders
            ), zz AS (
                SELECT o_orderkey,
                       CAST((((ck >> 0) & 1) * 1) + (((day >> 0) & 1) * 2) + (((ck >> 1) & 1) * 4) + (((day >> 1) & 1) * 8) + (((ck >> 2) & 1) * 16) + (((day >> 2) & 1) * 32) + (((ck >> 3) & 1) * 64) + (((day >> 3) & 1) * 128) + (((ck >> 4) & 1) * 256) + (((day >> 4) & 1) * 512) + (((ck >> 5) & 1) * 1024) + (((day >> 5) & 1) * 2048) + (((ck >> 6) & 1) * 4096) + (((day >> 6) & 1) * 8192) + (((ck >> 7) & 1) * 16384) + (((day >> 7) & 1) * 32768) + (((ck >> 8) & 1) * 65536) + (((day >> 8) & 1) * 131072) + (((ck >> 9) & 1) * 262144) + (((day >> 9) & 1) * 524288) + (((ck >> 10) & 1) * 1048576) + (((day >> 10) & 1) * 2097152) + (((ck >> 11) & 1) * 4194304) + (((day >> 11) & 1) * 8388608) + (((ck >> 12) & 1) * 16777216) + (((day >> 12) & 1) * 33554432) + (((ck >> 13) & 1) * 67108864) + (((day >> 13) & 1) * 134217728) + (((ck >> 14) & 1) * 268435456) + (((day >> 14) & 1) * 536870912) + (((ck >> 15) & 1) * 1073741824) + (((day >> 15) & 1) * 2147483648) AS BIGINT) AS z_key
                FROM m
            )
            SELECT o_orderkey, z_key,
                   CAST(z_key >> 24 AS BIGINT) AS z_file
            FROM zz
        """,
        "orders_percentile_cont": """
            WITH c AS (
                SELECT o_orderpriority,
                       CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                           AS cents
                FROM orders
            ), t AS (
                SELECT o_orderpriority, count(*) AS n FROM c GROUP BY 1
            ), p AS (
                SELECT unnest([500, 900]) AS p_milli
            ), r AS (
                SELECT t.o_orderpriority, p.p_milli,
                       1 + ((t.n - 1) * p.p_milli) // 1000 AS rk,
                       ((t.n - 1) * p.p_milli) % 1000 AS fr,
                       t.n
                FROM p, t
            ), o AS (
                SELECT o_orderpriority, cents,
                       row_number() OVER (PARTITION BY o_orderpriority
                                          ORDER BY cents) AS rn
                FROM c
            )
            SELECT r.o_orderpriority,
                   CAST(r.p_milli AS BIGINT) AS p_milli,
                   CAST(lo.cents * 1000
                        + (hi.cents - lo.cents) * r.fr AS BIGINT)
                       AS value_milli
            FROM r
            JOIN o lo ON lo.o_orderpriority = r.o_orderpriority
                     AND lo.rn = r.rk
            JOIN o hi ON hi.o_orderpriority = r.o_orderpriority
                     AND hi.rn = least(r.rk + 1, r.n)
        """,
        "price_percentile_cont": """
            WITH c AS (
                SELECT CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
                    AS cents
                FROM lineitem
            ), t AS (
                SELECT count(*) AS n FROM c
            ), p AS (
                SELECT unnest([250, 500, 750, 900]) AS p_milli
            ), r AS (
                SELECT p_milli,
                       1 + ((n - 1) * p_milli) // 1000 AS rk,
                       ((n - 1) * p_milli) % 1000 AS fr,
                       n
                FROM p, t
            ), o AS (
                SELECT cents, row_number() OVER (ORDER BY cents) AS rn
                FROM c
            )
            SELECT CAST(r.p_milli AS BIGINT) AS p_milli,
                   CAST(lo.cents * 1000
                        + (hi.cents - lo.cents) * r.fr AS BIGINT)
                       AS value_milli
            FROM r
            JOIN o lo ON lo.rn = r.rk
            JOIN o hi ON hi.rn = least(r.rk + 1, r.n)
        """,
        "doc_length_sketch_by_source": """
            WITH b AS (
                SELECT source,
                       least(greatest(CAST(floor(
                           (n_chars - 0.0) * (8192.0 / 8192.0))
                           AS BIGINT), 0), 8191) AS bin
                FROM documents
            ), c AS (
                SELECT source, bin, count(*) AS n FROM b GROUP BY 1, 2
            ), w AS (
                SELECT source, bin,
                       sum(n) OVER (PARTITION BY source ORDER BY bin)
                           AS cum
                FROM c
            ), t AS (
                SELECT source, count(*) AS tot FROM documents GROUP BY 1
            ), params(prob) AS (VALUES (0.25), (0.5), (0.9)),
            r AS (
                SELECT t.source, prob,
                       (CAST(prob * 1000000 AS BIGINT) * tot + 999999)
                           // 1000000 AS rk
                FROM params, t
            ), pick AS (
                SELECT r.source, r.prob, min(w.bin) AS bin
                FROM r JOIN w ON w.source = r.source AND w.cum >= r.rk
                GROUP BY 1, 2
            )
            SELECT p.source, CAST(p.prob AS DOUBLE) AS prob,
                   round(0.0 + (p.bin + 1) / (8192.0 / 8192.0), 6)
                       AS value,
                   t.tot AS n
            FROM pick p JOIN t ON t.source = p.source
        """,
        "events_stickiness": """
            WITH ud AS (
                SELECT DISTINCT user_id,
                       CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
                           AS day,
                       CAST(year(ts) * 100 + month(ts) AS BIGINT) AS month
                FROM events
            ), dau AS (
                SELECT month, day, count(*) AS dau FROM ud GROUP BY 1, 2
            ), mau AS (
                SELECT month, count(DISTINCT user_id) AS mau FROM ud
                GROUP BY 1
            ), agg AS (
                SELECT month, sum(dau) AS sum_dau, count(*) AS n_days
                FROM dau GROUP BY 1
            )
            SELECT a.month, CAST(m.mau AS BIGINT) AS mau,
                   CAST(a.n_days AS BIGINT) AS n_days,
                   CAST(a.sum_dau AS BIGINT) AS sum_dau,
                   CAST(a.sum_dau * 1000000 // (a.n_days * m.mau)
                        AS BIGINT) AS stickiness_ppm
            FROM agg a JOIN mau m USING (month)
        """,
        "events_type_overlap": """
            WITH tu AS (
                SELECT DISTINCT event_type, user_id FROM events
            ), sz AS (
                SELECT event_type, count(*) AS n FROM tu GROUP BY 1
            ), iv AS (
                SELECT a.event_type AS t1, b.event_type AS t2,
                       count(*) AS n_common
                FROM tu a JOIN tu b
                     ON b.user_id = a.user_id
                    AND b.event_type > a.event_type
                GROUP BY 1, 2
            )
            SELECT iv.t1, iv.t2, CAST(iv.n_common AS BIGINT) AS n_common,
                   CAST(sa.n AS BIGINT) AS n_a,
                   CAST(sb.n AS BIGINT) AS n_b,
                   CAST(iv.n_common * 1000000
                        // (sa.n + sb.n - iv.n_common) AS BIGINT)
                       AS jaccard_ppm
            FROM iv JOIN sz sa ON sa.event_type = iv.t1
                    JOIN sz sb ON sb.event_type = iv.t2
        """,
        "orders_rapid_repeat": """
            WITH o AS (
                SELECT o_orderkey, o_custkey,
                       CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01'
                            AS BIGINT) AS d
                FROM orders
            )
            SELECT a.o_custkey,
                   a.o_orderkey AS orderkey_a,
                   b.o_orderkey AS orderkey_b,
                   CAST(abs(a.d - b.d) AS BIGINT) AS days_apart
            FROM o a JOIN o b
                 ON b.o_custkey = a.o_custkey
                AND b.o_orderkey > a.o_orderkey
            WHERE abs(a.d - b.d) <= 1
        """,
        "events_autocorr": """
            WITH h AS (
                SELECT event_type, epoch_us(ts) // 3600000000 AS hr,
                       count(*) AS n
                FROM events GROUP BY 1, 2
            ), env AS (
                SELECT event_type, min(hr) AS lo, max(hr) AS hi
                FROM h GROUP BY 1
            ), grid AS (
                SELECT e.event_type, unnest(generate_series(e.lo, e.hi))
                           AS hr
                FROM env e
            ), dense AS (
                SELECT g.event_type, g.hr,
                       CAST(COALESCE(h.n, 0) AS BIGINT) AS n
                FROM grid g LEFT JOIN h
                     ON h.event_type = g.event_type AND h.hr = g.hr
            ), pairs AS (
                SELECT a.event_type, a.n AS x, b.n AS y
                FROM dense a JOIN dense b
                     ON b.event_type = a.event_type AND b.hr = a.hr + 24
            ), s AS (
                SELECT event_type, count(*) AS n, sum(x) AS sx,
                       sum(y) AS sy, sum(x*x) AS sxx, sum(y*y) AS syy,
                       sum(x*y) AS sxy
                FROM pairs GROUP BY 1
            )
            SELECT event_type, CAST(n AS BIGINT) AS n_pairs,
                   round(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                                 > 0
                         THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                              / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                      - CAST(sx AS DOUBLE)
                                        * CAST(sx AS DOUBLE))
                                     * (CAST(n AS DOUBLE)
                                        * CAST(syy AS DOUBLE)
                                        - CAST(sy AS DOUBLE)
                                          * CAST(sy AS DOUBLE)))
                         ELSE 0.0 END, 6) AS autocorr_24h
            FROM s
        """,
        "events_stationary": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/events_stationary.parquet')
        """,
        "orders_hhi": """
            WITH pc AS (
                SELECT o_custkey,
                       CAST(sum(CAST(floor(o_totalprice + 0.5) AS BIGINT))
                            AS BIGINT) AS rev_u
                FROM orders GROUP BY 1
            ), t AS (
                SELECT count(*) AS n_cust, sum(rev_u) AS s,
                       sum(rev_u * rev_u) AS sq
                FROM pc
            )
            SELECT CAST(n_cust AS BIGINT) AS n_cust,
                   CAST(s AS BIGINT) AS total_rev_u,
                   CAST((sq * 1000000) // (s * s) AS BIGINT) AS hhi_ppm
            FROM t
        """,
        "compaction_plan": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/compaction_plan.parquet')
        """,
        "user_delete_cascade": """
            SELECT 'customer' AS table_name,
                   CAST(sum(CASE WHEN c_custkey % 97 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_rows
            FROM customer
            UNION ALL
            SELECT 'orders',
                   CAST(sum(CASE WHEN o_custkey % 97 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM orders
            UNION ALL
            SELECT 'lineitem', CAST(count(*) AS BIGINT)
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            WHERE o_custkey % 97 = 0
            UNION ALL
            SELECT 'events',
                   CAST(sum(CASE WHEN user_id % 97 = 0 THEN 1 ELSE 0 END)
                        AS BIGINT)
            FROM events
        """,
        "revenue_bootstrap": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/revenue_bootstrap.parquet')
        """,
        "events_cusum": """
            WITH a AS (
                SELECT event_type, epoch_us(ts) AS ts_us,
                       sum(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS x,
                       count(*) AS c
                FROM events GROUP BY 1, 2
            ), t AS (
                SELECT event_type, CAST(sum(x) AS BIGINT) AS s,
                       CAST(sum(c) AS BIGINT) AS n
                FROM a GROUP BY 1
            ), p AS (
                SELECT event_type,
                       CAST(sum(x) OVER w AS BIGINT) AS px,
                       CAST(sum(c) OVER w AS BIGINT) AS pc
                FROM a
                WINDOW w AS (PARTITION BY event_type ORDER BY ts_us
                             ROWS UNBOUNDED PRECEDING)
            )
            SELECT p.event_type, t.n AS n_events, t.s AS total_s,
                   CAST(max(abs(t.n * p.px - p.pc * t.s)) AS BIGINT)
                       AS max_drift
            FROM p JOIN t USING (event_type)
            GROUP BY 1, 2, 3
        """,
        "tpch_q15": """
            WITH r AS (
                SELECT l_suppkey AS s_suppkey,
                       CAST(sum(CAST(floor(l_extendedprice * 100 + 0.5)
                                     AS BIGINT)
                                * (100 - CAST(floor(l_discount * 100 + 0.5)
                                              AS BIGINT))) AS BIGINT)
                           AS total_rev_s
                FROM lineitem
                WHERE l_shipdate >= TIMESTAMP '1996-01-01'
                  AND l_shipdate < TIMESTAMP '1996-04-01'
                GROUP BY 1
            )
            SELECT r.s_suppkey, s.s_name, r.total_rev_s
            FROM r JOIN supplier s USING (s_suppkey)
            WHERE r.total_rev_s = (SELECT max(total_rev_s) FROM r)
        """,
        "user_features": """
            WITH d AS (
                SELECT user_id,
                       epoch_us(ts) // 86400000000 AS day,
                       sum(CAST(floor(value * 100 + 0.5) AS BIGINT))
                           AS value_s,
                       min(epoch_us(ts)) AS first_us,
                       max(epoch_us(ts)) AS last_us,
                       sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                           AS n_view,
                       sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
                           AS n_click,
                       sum(CASE WHEN event_type = 'purchase' THEN 1
                                ELSE 0 END) AS n_purchase,
                       sum(CASE WHEN event_type = 'signup' THEN 1
                                ELSE 0 END) AS n_signup,
                       sum(CASE WHEN event_type = 'error' THEN 1
                                ELSE 0 END) AS n_error
                FROM events GROUP BY 1, 2
            )
            SELECT user_id,
                   CAST(count(*) AS BIGINT) AS n_active_days,
                   CAST(sum(value_s) AS BIGINT) AS total_value_s,
                   CAST(min(first_us) AS BIGINT) AS first_us,
                   CAST(max(last_us) AS BIGINT) AS last_us,
                   CAST(sum(n_view) AS BIGINT) AS n_view,
                   CAST(sum(n_click) AS BIGINT) AS n_click,
                   CAST(sum(n_purchase) AS BIGINT) AS n_purchase,
                   CAST(sum(n_signup) AS BIGINT) AS n_signup,
                   CAST(sum(n_error) AS BIGINT) AS n_error
            FROM d GROUP BY user_id
        """,
        "events_flow_trigrams": """
            WITH w AS (
                SELECT event_type AS t1,
                       lead(event_type, 1) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t2,
                       lead(event_type, 2) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t3
                FROM events
            )
            SELECT t1, t2, t3, count(*) AS n FROM w
            WHERE t2 IS NOT NULL AND t3 IS NOT NULL
            GROUP BY 1, 2, 3
            ORDER BY n DESC, t1, t2, t3
            LIMIT 10
        """,
        "orders_streaks": """
            WITH m AS (
                SELECT DISTINCT o_custkey,
                       CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                            AS BIGINT) AS mi
                FROM orders
            ), r AS (
                SELECT o_custkey, mi,
                       row_number() OVER (PARTITION BY o_custkey
                                          ORDER BY mi) AS rn
                FROM m
            ), g AS (
                SELECT o_custkey, mi - rn AS grp, count(*) AS len
                FROM r GROUP BY 1, 2
            )
            SELECT o_custkey,
                   CAST(sum(len) AS BIGINT) AS n_active_months,
                   CAST(count(*) AS BIGINT) AS n_streaks,
                   CAST(max(len) AS BIGINT) AS longest_streak
            FROM g GROUP BY o_custkey
        """,
        "part_skyline": """
            SELECT p.p_partkey, p.p_retailprice, p.p_size
            FROM part p
            WHERE NOT EXISTS (
                SELECT 1 FROM part q
                WHERE q.p_retailprice <= p.p_retailprice
                  AND q.p_size >= p.p_size
                  AND (q.p_retailprice < p.p_retailprice
                       OR q.p_size > p.p_size))
        """,
        "lineitem_corr_matrix": """
            WITH m AS (
                SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS x0,
                       CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS x1,
                       CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS x2,
                       CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS x3
                FROM lineitem
            ), s AS (
                SELECT count(*) AS n,
                       sum(x0) AS s0, sum(x1) AS s1, sum(x2) AS s2,
                       sum(x3) AS s3,
                       sum(x0*x0) AS ss0, sum(x1*x1) AS ss1,
                       sum(x2*x2) AS ss2, sum(x3*x3) AS ss3,
                       sum(x0*x1) AS sp01, sum(x0*x2) AS sp02,
                       sum(x0*x3) AS sp03, sum(x1*x2) AS sp12,
                       sum(x1*x3) AS sp13, sum(x2*x3) AS sp23
                FROM m
            ), p AS (
                SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                       n, s0 AS sx, s1 AS sy, ss0 AS sxx, ss1 AS syy,
                       sp01 AS sxy FROM s
                UNION ALL SELECT 'l_quantity', 'l_discount',
                       n, s0, s2, ss0, ss2, sp02 FROM s
                UNION ALL SELECT 'l_quantity', 'l_tax',
                       n, s0, s3, ss0, ss3, sp03 FROM s
                UNION ALL SELECT 'l_extendedprice', 'l_discount',
                       n, s1, s2, ss1, ss2, sp12 FROM s
                UNION ALL SELECT 'l_extendedprice', 'l_tax',
                       n, s1, s3, ss1, ss3, sp13 FROM s
                UNION ALL SELECT 'l_discount', 'l_tax',
                       n, s2, s3, ss2, ss3, sp23 FROM s
            )
            SELECT col_a, col_b, CAST(n AS BIGINT) AS n,
                   round(CASE WHEN (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                                 * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                                    - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))
                                 > 0
                         THEN (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                              / sqrt((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                                      - CAST(sx AS DOUBLE)
                                        * CAST(sx AS DOUBLE))
                                     * (CAST(n AS DOUBLE)
                                        * CAST(syy AS DOUBLE)
                                        - CAST(sy AS DOUBLE)
                                          * CAST(sy AS DOUBLE)))
                         ELSE 0.0 END, 6) AS corr_q
            FROM p
        """,
        "kg_degree_gini": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), d AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT u AS node FROM e UNION ALL SELECT v FROM e
                ) GROUP BY node
            ), r AS (
                SELECT deg, row_number() OVER (ORDER BY deg, node) AS rn
                FROM d
            ), t AS (
                SELECT count(*) AS n, sum(deg) AS s0, sum(rn * deg) AS s1
                FROM r
            )
            SELECT CAST(n AS BIGINT) AS n_nodes,
                   CAST(s0 AS BIGINT) AS sum_deg,
                   CAST(((2 * s1 - (n + 1) * s0) * 1000000) // (n * s0)
                        AS BIGINT) AS gini_ppm
            FROM t
        """,
        "kg_schema_violations": """
            WITH m AS (
                SELECT * FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/kg_mention_counts.parquet')
            ), tyr AS (
                SELECT mention_norm AS entity, label AS etype,
                       row_number() OVER (
                           PARTITION BY mention_norm
                           ORDER BY n DESC, label) AS rk
                FROM m
            ), ty AS (
                SELECT entity, etype FROM tyr WHERE rk = 1
            ), p AS (
                SELECT DISTINCT subj_norm, pred
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), typed AS (
                SELECT p.pred, p.subj_norm,
                       COALESCE(ty.etype, 'UNKNOWN') AS subj_type
                FROM p LEFT JOIN ty ON p.subj_norm = ty.entity
            ), dc AS (
                SELECT pred, subj_type, count(*) AS n FROM typed
                GROUP BY 1, 2
            ), dr AS (
                SELECT pred, subj_type AS expected_type,
                       row_number() OVER (PARTITION BY pred
                                          ORDER BY n DESC, subj_type) AS rk
                FROM dc
            ), dom AS (
                SELECT pred, expected_type FROM dr WHERE rk = 1
            )
            SELECT t.pred, t.subj_norm, t.subj_type, d.expected_type
            FROM typed t JOIN dom d USING (pred)
            WHERE t.subj_type <> 'UNKNOWN'
              AND t.subj_type <> d.expected_type
        """,
        "kg_edge_support": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), t AS (
                SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM e e1
                JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            ), s AS (
                SELECT a AS u, b AS v FROM t
                UNION ALL SELECT a, c FROM t
                UNION ALL SELECT b, c FROM t
            ), sc AS (
                SELECT u, v, count(*) AS cnt FROM s GROUP BY u, v
            )
            SELECT e.u, e.v,
                   CAST(COALESCE(sc.cnt, 0) AS BIGINT) AS support,
                   CAST(CASE WHEN COALESCE(sc.cnt, 0) = 0 THEN 1 ELSE 0 END
                        AS BIGINT) AS is_bridge
            FROM e LEFT JOIN sc ON sc.u = e.u AND sc.v = e.v
        """,
        "kg_graph_edges": """
            SELECT subj_norm, pred, obj_norm,
                   count(*) AS weight,
                   round(max(conf::DOUBLE), 6) AS conf_max,
                   round((sum(CAST(round(conf::DOUBLE * 10000) AS BIGINT)) / 10000.0)
                         / count(*), 6) AS conf_mean
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            GROUP BY subj_norm, pred, obj_norm
        """,
        "kg_graph_nodes": """
            SELECT span_norm, count(*) AS mention_count FROM (
                SELECT subj_norm AS span_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                UNION ALL
                SELECT obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ) GROUP BY span_norm
        """,
        "kg_khop_subgraph": """
            WITH e AS (
                SELECT DISTINCT subj_norm, obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), seeds AS (
                SELECT DISTINCT subj_norm FROM e ORDER BY subj_norm LIMIT 5
            ), h1 AS (
                SELECT e.subj_norm, e.obj_norm FROM e JOIN seeds USING (subj_norm)
            ), f1 AS (
                SELECT DISTINCT obj_norm AS subj_norm FROM h1
            ), h2 AS (
                SELECT e.subj_norm, e.obj_norm FROM e JOIN f1 USING (subj_norm)
            ), u AS (
                SELECT subj_norm, obj_norm, 1 AS hop FROM h1
                UNION ALL
                SELECT subj_norm, obj_norm, 2 AS hop FROM h2
            )
            SELECT subj_norm, obj_norm, CAST(min(hop) AS BIGINT) AS hop
            FROM u GROUP BY subj_norm, obj_norm
        """,
        "schema_map_relations": """
            SELECT 'MECHANISM' AS pred, count(*) AS n
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            WHERE pred = 'USED-FOR'
        """,
        "kg_closure": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_closure.parquet')
        """,
        "kg_alias_merge": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_alias_merge.parquet')
        """,
        "kg_edge_provenance": """
            SELECT subj_norm, pred, obj_norm,
                   count(DISTINCT doc_id) AS n_docs,
                   min(doc_id) AS first_doc
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            GROUP BY subj_norm, pred, obj_norm
        """,
        "kg_store_lookup": """
            SELECT subj_norm, pred, obj_norm, count(*) AS n
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            WHERE subj_norm IN ('hash join', 'merge sort')
            GROUP BY subj_norm, pred, obj_norm
        """,
        "kg_diff": """
            WITH o AS (
                SELECT subj_norm, pred, obj_norm, count(*) AS w_o
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                GROUP BY 1, 2, 3
            ), n AS (
                SELECT subj_norm, pred, obj_norm, count(*) AS w_n
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples_reduced.parquet')
                GROUP BY 1, 2, 3
            )
            SELECT subj_norm, pred, obj_norm,
                   CAST(coalesce(w_o, 0) AS BIGINT) AS w_old,
                   CAST(coalesce(w_n, 0) AS BIGINT) AS w_new,
                   CASE WHEN w_o IS NULL THEN 'added'
                        WHEN w_n IS NULL THEN 'removed'
                        ELSE 'changed' END AS status
            FROM o FULL JOIN n USING (subj_norm, pred, obj_norm)
            WHERE coalesce(w_o, 0) != coalesce(w_n, 0)
        """,
        "kg_components": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_components.parquet')
        """,
        "kg_pagerank": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_pagerank.parquet')
        """,
        "kg_ppr": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_ppr.parquet')
        """,
        "kg_scc": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_scc.parquet')
        """,
        "kg_negative_samples": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/kg_negative_samples.parquet')
        """,
        "kg_transe_eval": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/kg_transe_eval.parquet')
        """,
        "kg_kcore": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_kcore.parquet')
        """,
        "kg_truss": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_truss.parquet')
        """,
        "kg_wsp": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_wsp.parquet')
        """,
        "kg_type_assortativity": """
            WITH m0 AS (
                SELECT * FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/kg_mention_counts.parquet')
            ), tyr AS (
                SELECT mention_norm AS entity, label AS etype,
                       row_number() OVER (
                           PARTITION BY mention_norm
                           ORDER BY n DESC, label) AS rk
                FROM m0
            ), ty AS (
                SELECT entity, etype FROM tyr WHERE rk = 1
            ), e AS (
                SELECT DISTINCT subj_norm, obj_norm
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            ), typed AS (
                SELECT COALESCE(ts.etype, 'UNKNOWN') AS st,
                       COALESCE(tobj.etype, 'UNKNOWN') AS ot
                FROM e LEFT JOIN ty ts ON e.subj_norm = ts.entity
                       LEFT JOIN ty tobj ON e.obj_norm = tobj.entity
            ), m AS (
                SELECT st, ot, count(*) AS n FROM typed GROUP BY 1, 2
            ), tot AS (SELECT sum(n) AS E FROM m),
            tr AS (
                SELECT COALESCE(sum(n), 0) AS t FROM m WHERE st = ot
            ), ra AS (SELECT st AS ty, sum(n) AS a FROM m GROUP BY 1),
            cb AS (SELECT ot AS ty, sum(n) AS b FROM m GROUP BY 1),
            ab AS (
                SELECT COALESCE(sum(ra.a * cb.b), 0) AS s
                FROM ra JOIN cb USING (ty)
            )
            SELECT CAST(E AS BIGINT) AS n_edges,
                   CAST(t AS BIGINT) AS trace,
                   CAST(s AS BIGINT) AS sum_ab,
                   CAST(CASE WHEN E * E - s > 0
                             THEN ((E * t - s) * 1000000) // (E * E - s)
                             ELSE 0 END AS BIGINT) AS r_ppm
            FROM tot, tr, ab
        """,
        "kg_richclub": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), d AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT u AS node FROM e UNION ALL SELECT v FROM e
                ) GROUP BY node
            ), mx AS (SELECT max(deg) AS m FROM d),
            ks AS (
                SELECT unnest([1, 2, 4, 8, 16, 32, 64, 128, 256, 512,
                               1024]) AS k
            ), kk AS (
                SELECT k FROM ks, mx WHERE k < m
            ), nk AS (
                SELECT kk.k, count(*) AS n_k
                FROM kk JOIN d ON d.deg > kk.k GROUP BY kk.k
            ), ekt AS (
                SELECT kk.k, count(*) AS e_k
                FROM kk
                JOIN e ON TRUE
                JOIN d du ON du.node = e.u
                JOIN d dv ON dv.node = e.v
                WHERE du.deg > kk.k AND dv.deg > kk.k
                GROUP BY kk.k
            )
            SELECT nk.k, CAST(nk.n_k AS BIGINT) AS n_k,
                   CAST(COALESCE(ekt.e_k, 0) AS BIGINT) AS e_k,
                   CAST(CASE WHEN nk.n_k >= 2
                             THEN COALESCE(ekt.e_k, 0) * 1000000
                                  // (nk.n_k * (nk.n_k - 1) // 2)
                             ELSE 0 END AS BIGINT) AS density_ppm
            FROM nk LEFT JOIN ekt ON ekt.k = nk.k
        """,
        "kg_powerlaw": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), d AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT u AS node FROM e UNION ALL SELECT v FROM e
                ) GROUP BY node
            ), pl AS (
                SELECT CAST(length(printf('%b', deg)) - 1 AS BIGINT)
                           AS log2_bin,
                       count(*) AS n_nodes,
                       sum(CAST(floor(ln(CAST(deg AS DOUBLE) / 0.5)
                                      * 1000000000) AS BIGINT)) AS ln_s
                FROM d GROUP BY 1
            ), t AS (
                SELECT sum(n_nodes) AS n, sum(ln_s) AS s FROM pl
            )
            SELECT pl.log2_bin, CAST(pl.n_nodes AS BIGINT) AS n_nodes,
                   CAST(1000000 + (t.n * 1000000000000000) // t.s
                        AS BIGINT) AS alpha_micro
            FROM pl, t
        """,
        "kg_betweenness": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/kg_betweenness.parquet')
        """,
        "embedding_silhouette": """
            SELECT * FROM read_parquet(
                '/tmp/dygiepp_ray_oracle/embedding_silhouette.parquet')
        """,
        "kg_communities": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_communities.parquet')
        """,
        "orders_percentile": """
            WITH c AS (
                SELECT o_orderpriority, o_totalprice, COUNT(*) AS n
                FROM orders GROUP BY 1, 2
            ), w AS (
                SELECT o_orderpriority, o_totalprice, n,
                       SUM(n) OVER (PARTITION BY o_orderpriority
                                    ORDER BY o_totalprice) AS cum_n,
                       SUM(n) OVER (PARTITION BY o_orderpriority) AS n_grp
                FROM c
            )
            SELECT o_orderpriority, o_totalprice,
                   CAST(n AS BIGINT) AS n,
                   CAST(cum_n AS BIGINT) AS cum_n,
                   CAST(n_grp AS BIGINT) AS n_grp,
                   CAST((cum_n - n) * 1000000 AS BIGINT)
                       // CAST(greatest(n_grp - 1, 1) AS BIGINT) AS pct_scaled
            FROM w
        """,
        "events_interarrival": """
            WITH g AS (
                SELECT event_type,
                       epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id, event_type
                           ORDER BY ts, event_id) AS gap_us
                FROM events
            )
            SELECT event_type, COUNT(*) AS n_gaps,
                   CAST(SUM(gap_us) AS BIGINT) AS sum_gap_us,
                   CAST(SUM(gap_us) AS BIGINT) // COUNT(*) AS mean_gap_us
            FROM g WHERE gap_us IS NOT NULL GROUP BY event_type
        """,
        "kg_hits": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_hits.parquet')
        """,
        "kg_clustering": """
            WITH e AS (
                SELECT DISTINCT least(subj_norm, obj_norm) AS u,
                                greatest(subj_norm, obj_norm) AS v
                FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
                WHERE subj_norm <> obj_norm
            ), t AS (
                SELECT e1.u AS a, e1.v AS b, e2.v AS c
                FROM e e1
                JOIN e e2 ON e2.u = e1.v
                JOIN e e3 ON e3.u = e1.u AND e3.v = e2.v
            ), tn AS (
                SELECT a AS node FROM t
                UNION ALL SELECT b FROM t
                UNION ALL SELECT c FROM t
            ), tc AS (
                SELECT node, count(*) AS n_triangles FROM tn GROUP BY node
            ), d AS (
                SELECT node, count(*) AS deg FROM (
                    SELECT u AS node FROM e UNION ALL SELECT v FROM e
                ) GROUP BY node
            )
            SELECT d.node, d.deg,
                   coalesce(tc.n_triangles, 0) AS n_triangles,
                   CASE WHEN d.deg >= 2
                        THEN (2 * coalesce(tc.n_triangles, 0) * 10000)
                             // (d.deg * (d.deg - 1))
                        ELSE 0 END AS cc_scaled
            FROM d LEFT JOIN tc USING (node)
        """,
        "repo_stats": """
            SELECT repo,
                   COUNT(*) AS n_files,
                   COUNT(DISTINCT lang) AS n_langs,
                   COUNT(DISTINCT "commit") AS n_commits,
                   COUNT(DISTINCT content_sha256) AS n_distinct_content,
                   CAST(SUM(strlen(content)) AS BIGINT) AS total_bytes
            FROM read_parquet('/tmp/dygiepp_ray_oracle/corpus_sha.parquet')
            GROUP BY repo
        """,
        "embedding_link": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/embedding_link.parquet')
        """,
        "repo_clones": """
            WITH per AS (
                SELECT content_sha256 AS sha, repo, COUNT(*) AS c
                FROM read_parquet('/tmp/dygiepp_ray_oracle/corpus_sha.parquet')
                GROUP BY 1, 2
            )
            SELECT sha,
                   COUNT(*) AS n_repos,
                   CAST(SUM(c) AS BIGINT) AS n_files,
                   MIN(repo) AS first_repo
            FROM per GROUP BY sha HAVING COUNT(*) >= 2
        """,
        "kg_type_infer": """
            WITH m AS (
                SELECT * FROM read_parquet(
                    '/tmp/dygiepp_ray_oracle/kg_mention_counts.parquet')
            ), r AS (
                SELECT mention_norm AS entity, label AS etype, n,
                       row_number() OVER (
                           PARTITION BY mention_norm
                           ORDER BY n DESC, label) AS rk
                FROM m
            )
            SELECT entity, etype, n AS n_mentions FROM r WHERE rk = 1
        """,
        "kg_star_query": """
            SELECT subj_norm,
                   CAST(sum(CASE WHEN pred = 'USED-FOR' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_p1,
                   CAST(sum(CASE WHEN pred = 'COMPARE' THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_p2
            FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_triples.parquet')
            GROUP BY subj_norm
            HAVING n_p1 > 0 AND n_p2 > 0
        """,
        "kg_mention_counts": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_mention_counts.parquet')
        """,
        "kg_entity_links": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_entity_links.parquet')
        """,
        "kg_eval_prf": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_eval_prf.parquet')
        """,
        "kg_p_at_k": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_p_at_k.parquet')
        """,
        "kg_event_f1": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_event_f1.parquet')
        """,
        "srl_baseline": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/srl_baseline.parquet')
        """,
        "kg_eval_sweep": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_eval_sweep.parquet')
        """,
        "coref_scores": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/coref_scores.parquet')
        """,
        "coref_cluster_merge": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/coref_cluster_merge.parquet')
        """,
        "coref_antecedent_clusters": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/coref_antecedent_clusters.parquet')
        """,
        "kg_build_resume": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/kg_build_resume.parquet')
        """,
        "pca_project": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/pca_project.parquet')
        """,
        "standoff_convert": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/standoff_convert.parquet')
        """,
        "chemprot_convert": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/chemprot_convert.parquet')
        """,
        "collate_pack": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/collate_pack.parquet')
        """,
        "uncollate_roundtrip": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/uncollate_roundtrip.parquet')
        """,
        "media_features": """
            SELECT * FROM read_parquet('/tmp/dygiepp_ray_oracle/media_features.parquet')
        """,
    }
