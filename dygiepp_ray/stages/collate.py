"""Collate / uncollate (SURVEY.md §2.2 P5/P6; reference
scripts/data/shared/collate.py, uncollate.py).

Collate packs sentences into cost-balanced pseudo-documents for the neural
kernel: sort ALL sentences by length, then greedily fill pseudo-docs bounded
by `max_spans_per_doc` (cost = len(sent)²; default 50000) and
`max_sentences_per_doc` (16) — collate.py:26-66, 97-105, defaults at 126-129.
Provenance keys `_orig_doc_key` / `_orig_sent_ix` ride along; coref is
stripped (collate refuses cross-sentence state).

Ray mapping: explode docs → sentence rows → `ds.sort("sent_cost")` →
blockwise greedy packing inside `map_batches`. The pack runs per sorted
block, not globally: blocks are contiguous length-ranges after the sort, so
per-block packing yields the same cost balance (± one pseudo-doc at each
block boundary) without a serial driver pass — the documented partitioning
assumption of this operator.

Uncollate reassembles originals: `groupby(_orig_doc_key).map_groups`, order
by `_orig_sent_ix`, ERROR on missing sentences (uncollate.py:53-94).
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa

import ray.data

MAX_SPANS_PER_DOC = 50000   # collate.py:126
MAX_SENTENCES_PER_DOC = 16  # collate.py:127


def explode_sentences(batch: pa.Table) -> pa.Table:
    """documents → one row per sentence with provenance + len² cost."""
    doc_keys = batch.column("doc_key").to_pylist()
    sentences_col = batch.column("sentences").to_pylist()
    datasets = (
        batch.column("dataset").to_pylist()
        if "dataset" in batch.column_names else ["" for _ in doc_keys]
    )
    rows = {"_orig_doc_key": [], "_orig_sent_ix": [], "dataset": [],
            "tokens": [], "sent_cost": []}
    for key, sentences, dset in zip(doc_keys, sentences_col, datasets):
        for ix, sent in enumerate(sentences):
            rows["_orig_doc_key"].append(key)
            rows["_orig_sent_ix"].append(ix)
            rows["dataset"].append(dset)
            rows["tokens"].append(sent)
            rows["sent_cost"].append(len(sent) * len(sent))
    return pa.table(
        {
            "_orig_doc_key": pa.array(rows["_orig_doc_key"], pa.string()),
            "_orig_sent_ix": pa.array(rows["_orig_sent_ix"], pa.int32()),
            "dataset": pa.array(rows["dataset"], pa.string()),
            "tokens": pa.array(rows["tokens"], pa.list_(pa.string())),
            "sent_cost": pa.array(rows["sent_cost"], pa.int64()),
        }
    )


def pack_batch(prefix: str, max_spans: int = MAX_SPANS_PER_DOC,
               max_sentences: int = MAX_SENTENCES_PER_DOC):
    """Greedy packer over one (sorted) block of sentence rows."""

    def fn(batch: pa.Table) -> pa.Table:
        import hashlib

        rows = batch.to_pylist()
        out = {"doc_key": [], "dataset": [], "sentences": [],
               "_orig_doc_keys": [], "_orig_sent_ixs": []}
        cur, cost = [], 0
        block_tag = (
            hashlib.blake2b(
                (rows[0]["_orig_doc_key"] + str(rows[0]["_orig_sent_ix"])).encode(),
                digest_size=4,
            ).hexdigest()
            if rows else "0"
        )

        def flush():
            nonlocal cur, cost
            if not cur:
                return
            out["doc_key"].append(f"{prefix}_{block_tag}_{len(out['doc_key'])}")
            out["dataset"].append(cur[0]["dataset"])
            out["sentences"].append([r["tokens"] for r in cur])
            out["_orig_doc_keys"].append([r["_orig_doc_key"] for r in cur])
            out["_orig_sent_ixs"].append([r["_orig_sent_ix"] for r in cur])
            cur, cost = [], 0

        for r in rows:
            c = r["sent_cost"]
            if cur and (cost + c > max_spans or len(cur) >= max_sentences
                        or r["dataset"] != cur[0]["dataset"]):
                flush()
            cur.append(r)
            cost += c
        flush()
        return pa.table(
            {
                "doc_key": pa.array(out["doc_key"], pa.string()),
                "dataset": pa.array(out["dataset"], pa.string()),
                "sentences": pa.array(out["sentences"], pa.list_(pa.list_(pa.string()))),
                "_orig_doc_keys": pa.array(out["_orig_doc_keys"], pa.list_(pa.string())),
                "_orig_sent_ixs": pa.array(out["_orig_sent_ixs"], pa.list_(pa.int32())),
            }
        )

    return fn


def collate(documents: "ray.data.Dataset", prefix: str = "collated",
            max_spans: int = MAX_SPANS_PER_DOC,
            max_sentences: int = MAX_SENTENCES_PER_DOC) -> "ray.data.Dataset":
    sents = documents.map_batches(explode_sentences, batch_format="pyarrow")
    return sents.sort("sent_cost").map_batches(
        pack_batch(prefix, max_spans, max_sentences), batch_format="pyarrow"
    )


PRED_SENT_COLS = ("predicted_ner", "predicted_relations", "predicted_events")


def uncollate_predictions(collated_pred: "ray.data.Dataset") -> "ray.data.Dataset":
    """The neural-stage round trip (reference predict path over collated
    pseudo-docs): pseudo-doc rows carrying per-sentence `predicted_*` lists →
    original documents with their sentences AND predictions restored, ordered
    by `_orig_sent_ix`. Coref clusters are NOT carried — collate strips doc-
    level coref state by design (collate.py:30-33)."""

    def explode(batch: pa.Table) -> pa.Table:
        pred_cols = [c for c in PRED_SENT_COLS if c in batch.column_names]
        rows: dict[str, list] = {"_orig_doc_key": [], "_orig_sent_ix": [], "tokens": []}
        for c in pred_cols:
            rows[c] = []
        keys_col = batch.column("_orig_doc_keys").to_pylist()
        ixs_col = batch.column("_orig_sent_ixs").to_pylist()
        sents_col = batch.column("sentences").to_pylist()
        preds = {c: batch.column(c).to_pylist() for c in pred_cols}
        for r in range(batch.num_rows):
            for j, (k, ix, s) in enumerate(zip(keys_col[r], ixs_col[r], sents_col[r])):
                rows["_orig_doc_key"].append(k)
                rows["_orig_sent_ix"].append(ix)
                rows["tokens"].append(s)
                for c in pred_cols:
                    rows[c].append(preds[c][r][j])
        out = {
            "_orig_doc_key": pa.array(rows["_orig_doc_key"], pa.string()),
            "_orig_sent_ix": pa.array(rows["_orig_sent_ix"], pa.int32()),
            "tokens": pa.array(rows["tokens"], pa.list_(pa.string())),
        }
        for c in pred_cols:
            out[c] = pa.array(rows[c], batch.schema.field(c).type.value_type)
        return pa.table(out)

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("_orig_sent_ix")
        ixs = df["_orig_sent_ix"].tolist()
        key = df["_orig_doc_key"].iloc[0]
        assert ixs == list(range(len(ixs))), f"doc {key!r}: missing sentences {ixs}"
        row = {"doc_key": key, "sentences": df["tokens"].tolist()}
        for c in PRED_SENT_COLS:
            if c in df.columns:
                row[c] = df[c].tolist()
        return pd.DataFrame([row])

    return (
        collated_pred.map_batches(explode, batch_format="pyarrow")
        .groupby("_orig_doc_key")
        .map_groups(reassemble, batch_format="pandas")
    )


def uncollate(collated: "ray.data.Dataset",
              expected_counts: dict[str, int] | None = None) -> "ray.data.Dataset":
    """Reassemble original documents; error on missing sentences when the
    expected per-doc sentence count is provided (uncollate.py:69-83)."""

    def explode(batch: pa.Table) -> pa.Table:
        rows = {"_orig_doc_key": [], "_orig_sent_ix": [], "tokens": []}
        for keys, ixs, sents in zip(
            batch.column("_orig_doc_keys").to_pylist(),
            batch.column("_orig_sent_ixs").to_pylist(),
            batch.column("sentences").to_pylist(),
        ):
            for k, ix, s in zip(keys, ixs, sents):
                rows["_orig_doc_key"].append(k)
                rows["_orig_sent_ix"].append(ix)
                rows["tokens"].append(s)
        return pa.table(
            {
                "_orig_doc_key": pa.array(rows["_orig_doc_key"], pa.string()),
                "_orig_sent_ix": pa.array(rows["_orig_sent_ix"], pa.int32()),
                "tokens": pa.array(rows["tokens"], pa.list_(pa.string())),
            }
        )

    def reassemble(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("_orig_sent_ix")
        key = df["_orig_doc_key"].iloc[0]
        ixs = df["_orig_sent_ix"].tolist()
        assert ixs == list(range(len(ixs))), f"doc {key!r}: missing sentences {ixs}"
        if expected_counts is not None:
            want = expected_counts.get(key)
            assert want is None or want == len(ixs), (
                f"doc {key!r}: {len(ixs)} sentences, expected {want}"
            )
        return pd.DataFrame(
            [{"doc_key": key, "sentences": df["tokens"].tolist()}]
        )

    return (
        collated.map_batches(explode, batch_format="pyarrow")
        .groupby("_orig_doc_key")
        .map_groups(reassemble, batch_format="pandas")
    )
