"""SciERC-format JSONL document source/sink (SURVEY.md §2.1 S1/S2; §1.2).

On-disk shape (doc/data.md:15-73): one JSON object per line with `doc_key`,
`sentences: [[tok]]`, and optional `ner` / `relations` / `clusters` /
`events` / `weight` / `dataset` / `predicted_*` — all span indices are
DOC-LEVEL, inclusive-end. Unknown fields must start with `_` (regex whitelist
document.py:143-156); empty-string tokens are a hard error and the document
is dropped with a report (document.py:65-86, 158-165).

The engine stores sentence-relative struct columns (schema.py). This module
converts both ways and proves `from_json ∘ to_json == identity`
(document_test.py:36-56 twin in tests/test_jsonl_roundtrip.py).
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

import ray.data

from ..functions.strings import cumsum_shifted

ALLOWED_FIELD_RE = re.compile(
    r"^(doc_key|dataset|sentences|weight|.*ner$|.*relations$|.*clusters$|.*events$|_.*)$"
)


class DocumentValidationError(ValueError):
    pass


def _sentence_of(starts: list[int], lengths: list[int], tok: int) -> int:
    """Doc-level token index → sentence index; error if out of range
    (document.py:22-33 semantics)."""
    for i, (s, n) in enumerate(zip(starts, lengths)):
        if s <= tok < s + n:
            return i
    raise DocumentValidationError(f"token {tok} outside document")


def from_scierc_json(js: dict) -> dict:
    """One JSONL object → engine row (sentence-relative nested fields)."""
    unknown = [k for k in js if not ALLOWED_FIELD_RE.match(k)]
    if unknown:
        raise DocumentValidationError(f"unexpected fields: {unknown}")
    if "doc_key" not in js or "sentences" not in js:
        raise DocumentValidationError("doc_key and sentences are mandatory")
    sentences = js["sentences"]
    if any(t == "" for s in sentences for t in s):
        raise DocumentValidationError("empty-string token")
    lengths = [len(s) for s in sentences]
    starts = cumsum_shifted(lengths)

    def rel_span(s: int, e: int, expect_sent: int | None = None) -> tuple[int, int, int]:
        si = _sentence_of(starts, lengths, s)
        se = _sentence_of(starts, lengths, e)
        if si != se:
            raise DocumentValidationError(f"span ({s},{e}) crosses sentences")
        if expect_sent is not None and si != expect_sent:
            # annotation filed under the wrong sentence list position: its
            # offsets would silently be interpreted relative to a different
            # sentence — reject the row (drop-with-report path)
            raise DocumentValidationError(
                f"span ({s},{e}) lies in sentence {si} but is filed under "
                f"sentence {expect_sent}"
            )
        return si, s - starts[si], e - starts[si]

    row = {
        "doc_key": js["doc_key"],
        "dataset": js.get("dataset"),
        "sentences": sentences,
        "sentence_starts": starts,
        "weight": js.get("weight"),
        "ner": None, "relations": None, "events": None, "clusters": None,
    }
    if "ner" in js:
        out = [[] for _ in sentences]
        for sent_ix, sent_ner in enumerate(js["ner"]):
            for s, e, label in sent_ner:
                si, rs, re_ = rel_span(s, e, expect_sent=sent_ix)
                out[sent_ix].append({"start": rs, "end": re_, "label": label})
        row["ner"] = out
    if "relations" in js:
        out = [[] for _ in sentences]
        for sent_ix, sent_rel in enumerate(js["relations"]):
            for s1, e1, s2, e2, label in sent_rel:
                _, rs1, re1 = rel_span(s1, e1, expect_sent=sent_ix)
                _, rs2, re2 = rel_span(s2, e2, expect_sent=sent_ix)
                out[sent_ix].append(
                    {"s1": rs1, "e1": re1, "s2": rs2, "e2": re2, "label": label}
                )
        row["relations"] = out
    if "events" in js:
        out = [[] for _ in sentences]
        for sent_ix, sent_events in enumerate(js["events"]):
            for event in sent_events:
                (trig_tok, etype), *args = event
                si, rtrig, _ = rel_span(trig_tok, trig_tok, expect_sent=sent_ix)
                out[sent_ix].append(
                    {
                        "trigger_tok": rtrig,
                        "event_type": etype,
                        "args": [
                            {"start": rel_span(s, e, expect_sent=sent_ix)[1],
                             "end": rel_span(s, e, expect_sent=sent_ix)[2],
                             "role": role}
                            for s, e, role in args
                        ],
                    }
                )
        row["events"] = out
    if "clusters" in js:
        # doc-level; spans crossing sentence boundaries are SKIPPED with the
        # reference's warning semantics (document.py:663-674)
        clusters = []
        for cluster in js["clusters"]:
            members = []
            for s, e in cluster:
                try:
                    _sentence_of(starts, lengths, s)
                    si = _sentence_of(starts, lengths, s)
                    if _sentence_of(starts, lengths, e) != si:
                        continue
                    members.append({"start": s, "end": e})
                except DocumentValidationError:
                    continue
            clusters.append(members)
        row["clusters"] = clusters
    return row


def to_scierc_json(row: dict) -> dict:
    """Engine row → JSONL object (doc-level indices restored). Inverse of
    `from_scierc_json` for every field it populates."""
    starts = row["sentence_starts"]
    js: dict = {"doc_key": row["doc_key"], "sentences": row["sentences"]}
    if row.get("dataset") is not None:
        js["dataset"] = row["dataset"]
    if row.get("weight") is not None:
        js["weight"] = row["weight"]
    if row.get("ner") is not None:
        js["ner"] = [
            [[m["start"] + st, m["end"] + st, m["label"]] for m in sent]
            for st, sent in zip(starts, row["ner"])
        ]
    if row.get("relations") is not None:
        js["relations"] = [
            [[r["s1"] + st, r["e1"] + st, r["s2"] + st, r["e2"] + st, r["label"]]
             for r in sent]
            for st, sent in zip(starts, row["relations"])
        ]
    if row.get("events") is not None:
        js["events"] = [
            [
                [[ev["trigger_tok"] + st, ev["event_type"]]]
                + [[a["start"] + st, a["end"] + st, a["role"]] for a in ev["args"]]
                for ev in sent
            ]
            for st, sent in zip(starts, row["events"])
        ]
    if row.get("clusters") is not None:
        js["clusters"] = [
            [[m["start"], m["end"]] for m in cluster] for cluster in row["clusters"]
        ]
    return js


def read_scierc_jsonl(path: str) -> tuple["ray.data.Dataset", list[str]]:
    """S1 — parse a JSONL file into the engine document table; returns
    (dataset, dropped_doc_keys). Dropping-with-report mirrors
    document.py:65-86. Driver-side line parse (JSONL shards are small); the
    heavy work stays in the Dataset."""
    rows, dropped = [], []
    with open(path) as fh:
        for line in fh:
            if not line.strip():
                continue
            js = json.loads(line)
            try:
                rows.append(from_scierc_json(js))
            except DocumentValidationError:
                dropped.append(js.get("doc_key", "<unknown>"))
    return ray.data.from_items(rows), dropped


def write_scierc_jsonl(ds: "ray.data.Dataset", path: str) -> int:
    """S2 — one json.dumps per document row, SINGLE file via a driver-side
    streaming iterator. Use for small exports / byte-compat with the
    reference's one-file-per-fold layout; the scale path is
    `write_scierc_jsonl_dir` (one shard per block, written inside tasks)."""
    n = 0
    with open(path, "w") as fh:
        for row in ds.iter_rows():
            fh.write(json.dumps(to_scierc_json(row)) + "\n")
            n += 1
    return n


def write_scierc_jsonl_dir(ds: "ray.data.Dataset", out_dir: str) -> int:
    """S2 scale path: JSONL shards written INSIDE map tasks (one file per
    block, named by task+block to be resumable/idempotent per shard); the
    driver only sees per-shard row counts. Returns total rows written."""
    import os
    import uuid

    os.makedirs(out_dir, exist_ok=True)

    def write_shard(batch: "pa.Table") -> "pa.Table":
        rows = batch.to_pylist()
        shard = os.path.join(out_dir, f"part-{uuid.uuid4().hex[:12]}.jsonl")
        tmp = shard + ".tmp"
        with open(tmp, "w") as fh:
            for row in rows:
                fh.write(json.dumps(to_scierc_json(row)) + "\n")
        os.rename(tmp, shard)  # atomic publish
        return pa.table({"n": pa.array([len(rows)], pa.int64())})

    counts = ds.map_batches(write_shard, batch_format="pyarrow")
    return int(counts.sum("n") or 0)
