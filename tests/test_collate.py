"""Collate / uncollate (P5/P6)."""

import pyarrow as pa
import pytest

import ray.data

from dygiepp_ray.stages.collate import collate, uncollate


def _docs():
    rows = []
    for d in range(6):
        sents = [["w"] * (3 + (d + i) % 7) for i in range(4 + d % 3)]
        rows.append({"doc_key": f"doc{d}", "dataset": "ds1", "sentences": sents})
    return rows


def test_collate_bounds_and_provenance():
    ds = ray.data.from_items(_docs())
    packed = collate(ds, max_spans=150, max_sentences=3).to_pandas()
    for _, row in packed.iterrows():
        cost = sum(len(s) ** 2 for s in row["sentences"])
        assert len(row["sentences"]) <= 3
        assert cost <= 150 or len(row["sentences"]) == 1  # single huge sentence allowed
        assert len(row["_orig_doc_keys"]) == len(row["sentences"])
    # every original sentence appears exactly once
    seen = [
        (k, ix)
        for _, row in packed.iterrows()
        for k, ix in zip(row["_orig_doc_keys"], row["_orig_sent_ixs"])
    ]
    want = [(f"doc{d}", i) for d in range(6) for i in range(len(_docs()[d]["sentences"]))]
    assert sorted(seen) == sorted(want)


def test_collate_sorts_by_cost():
    ds = ray.data.from_items(_docs())
    packed = collate(ds).to_pandas()
    # within a pseudo-doc, sentences are non-decreasing in length (sorted input)
    for _, row in packed.iterrows():
        lens = [len(s) for s in row["sentences"]]
        assert lens == sorted(lens)


def test_uncollate_roundtrip():
    docs = _docs()
    ds = ray.data.from_items(docs)
    packed = collate(ds, max_spans=200, max_sentences=4)
    back = uncollate(packed).to_pandas().set_index("doc_key")
    for d in docs:
        got = [list(s) for s in back.loc[d["doc_key"], "sentences"]]
        assert got == d["sentences"]


def test_uncollate_missing_sentence_errors():
    docs = _docs()
    ds = ray.data.from_items(docs)
    packed = collate(ds).to_pandas()
    # drop one sentence from the packed set
    packed = packed.iloc[1:]
    broken = ray.data.from_pandas(packed)
    with pytest.raises(Exception):
        uncollate(broken).to_pandas()
