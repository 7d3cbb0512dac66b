"""SciERC JSONL reader/writer: round-trip identity + golden reader facts
(engine twin of dygie/tests/data/document_test.py:36-56 and
dygie_test.py:24-97; golden facts from FIXTURES.md §2)."""

import json

import pytest

from dygiepp_ray.sources.jsonl import (
    DocumentValidationError,
    from_scierc_json,
    read_scierc_jsonl,
    to_scierc_json,
    write_scierc_jsonl,
)

# A small SciERC-shaped document (own construction, reference SHAPE only):
# 3 sentences, doc-level inclusive spans, one relation, one event, 2 clusters.
DOC = {
    "doc_key": "doc_alpha",
    "dataset": "scierc",
    "sentences": [
        ["We", "present", "a", "neural", "parser", "."],
        ["The", "parser", "uses", "beam", "search", "decoding", "."],
        ["It", "improves", "accuracy", "."],
    ],
    "ner": [
        [[3, 4, "Method"]],
        [[7, 7, "Method"], [9, 11, "Method"]],
        [[15, 15, "Metric"]],
    ],
    "relations": [
        [],
        [[9, 11, 7, 7, "USED-FOR"]],
        [],
    ],
    "events": [
        [],
        [[[8, "use_event"], [7, 7, "agent"], [9, 11, "artifact"]]],
        [],
    ],
    "clusters": [
        [[3, 4], [7, 7], [13, 13]],
        [[9, 11]],
    ],
}


def test_roundtrip_identity():
    assert to_scierc_json(from_scierc_json(DOC)) == DOC


def test_reader_golden_facts():
    row = from_scierc_json(DOC)
    # sentence offsets
    assert row["sentence_starts"] == [0, 6, 13]
    # sentence-relative NER of sentence 1: (1,1) and (3,5), both Method
    s1 = {(m["start"], m["end"], m["label"]) for m in row["ner"][1]}
    assert s1 == {(1, 1, "Method"), (3, 5, "Method")}
    # relation: spans (3,5)→(1,1) sentence-relative in sentence 1
    r = row["relations"][1][0]
    assert (r["s1"], r["e1"], r["s2"], r["e2"], r["label"]) == (3, 5, 1, 1, "USED-FOR")
    # event: trigger token 2 (sentence-relative), roles preserved
    ev = row["events"][1][0]
    assert ev["trigger_tok"] == 2 and ev["event_type"] == "use_event"
    assert [(a["start"], a["end"], a["role"]) for a in ev["args"]] == [
        (1, 1, "agent"), (3, 5, "artifact")
    ]
    # clusters stay doc-level
    assert row["clusters"][0] == [
        {"start": 3, "end": 4}, {"start": 7, "end": 7}, {"start": 13, "end": 13}
    ]


def test_validation_rejects():
    with pytest.raises(DocumentValidationError):
        from_scierc_json({**DOC, "bogus_field": 1})
    with pytest.raises(DocumentValidationError):
        from_scierc_json({"doc_key": "x", "sentences": [["ok", ""]]})
    with pytest.raises(DocumentValidationError):
        from_scierc_json({"sentences": [["a"]]})
    # allowed: underscore-prefixed metadata (carried opaquely upstream)
    from_scierc_json({"doc_key": "x", "sentences": [["a"]], "_meta": 1})


def test_cross_sentence_span_errors():
    bad = {
        "doc_key": "x",
        "sentences": [["a", "b"], ["c"]],
        "ner": [[[1, 2, "Method"]], []],  # crosses the boundary
    }
    with pytest.raises(DocumentValidationError):
        from_scierc_json(bad)


def test_file_roundtrip_and_drop_report(tmp_path):
    good = DOC
    bad = {"doc_key": "doc_bad", "sentences": [["x", ""]]}
    p = tmp_path / "docs.jsonl"
    with open(p, "w") as fh:
        fh.write(json.dumps(good) + "\n")
        fh.write(json.dumps(bad) + "\n")
    ds, dropped = read_scierc_jsonl(str(p))
    assert dropped == ["doc_bad"]
    out = tmp_path / "out.jsonl"
    n = write_scierc_jsonl(ds, str(out))
    assert n == 1
    assert json.loads(open(out).readline()) == DOC


def test_misfiled_sentence_index_rejected():
    # an annotation whose offsets resolve to sentence 1 but which is filed
    # under sentence 0 must be rejected, not silently re-based
    doc = json.loads(json.dumps(DOC))
    doc["ner"][0].append([7, 7, "Method"])  # span lives in sentence 1
    with pytest.raises(DocumentValidationError, match="filed under"):
        from_scierc_json(doc)


def test_sharded_jsonl_writer(tmp_path):
    import glob

    import ray.data

    from dygiepp_ray.sources.jsonl import write_scierc_jsonl_dir

    docs = [json.loads(json.dumps(DOC)) for _ in range(3)]
    for i, d in enumerate(docs):
        d["doc_key"] = f"doc_{i}"
    ds = ray.data.from_items([from_scierc_json(d) for d in docs])
    out = str(tmp_path / "shards")
    n = write_scierc_jsonl_dir(ds, out)
    assert n == 3
    lines = []
    for f in glob.glob(out + "/part-*.jsonl"):
        with open(f) as fh:
            lines += [json.loads(l) for l in fh]
    assert sorted(l["doc_key"] for l in lines) == ["doc_0", "doc_1", "doc_2"]
    assert all(l["sentences"] == DOC["sentences"] for l in lines)
