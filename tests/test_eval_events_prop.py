"""A4 event-F1 variants + M7 coref label propagation."""

import pyarrow as pa
import pytest

import ray.data

from dygiepp_ray.pipelines.evaluate import _event_sets, event_f1
from dygiepp_ray.stages.kernel import propagate_cluster_labels


def _ev(trig, etype, args):
    return {"trigger_tok": trig, "event_type": etype,
            "args": [{"start": s, "end": e, "role": r} for s, e, r in args]}


def test_event_set_variants():
    doc = [[_ev(5, "move", [(1, 2, "agent"), (7, 8, "dest")])]]
    assert _event_sets(doc, "trig_id") == {(0, 5)}
    assert _event_sets(doc, "trig_class") == {(0, 5, "move")}
    assert _event_sets(doc, "arg_id") == {(0, 1, 2, "move"), (0, 7, 8, "move")}
    assert _event_sets(doc, "arg_class") == {
        (0, 1, 2, "move", "agent"), (0, 7, 8, "move", "dest")
    }


def test_arg_match_ignores_trigger_offset():
    # reference invariant (event_metrics.py:56-58): arg matches even when the
    # trigger token differs, as long as the trigger TYPE matches
    gold = [[_ev(5, "move", [(1, 2, "agent")])]]
    pred = [[_ev(9, "move", [(1, 2, "agent")])]]
    assert _event_sets(gold, "arg_class") == _event_sets(pred, "arg_class")
    assert _event_sets(gold, "trig_id") != _event_sets(pred, "trig_id")


def test_event_f1_over_dataset():
    typ = pa.list_(pa.list_(pa.struct([
        ("trigger_tok", pa.int32()), ("event_type", pa.string()),
        ("args", pa.list_(pa.struct([
            ("start", pa.int32()), ("end", pa.int32()), ("role", pa.string())]))),
    ])))
    gold = [[[_ev(5, "move", [(1, 2, "agent")])]]]
    pred = [[[_ev(5, "move", [(1, 2, "agent")]), _ev(8, "meet", [])]]]
    ds = ray.data.from_arrow(pa.table({
        "events": pa.array(gold, typ), "predicted_events": pa.array(pred, typ),
    }))
    res = event_f1(ds, "trig_class")
    assert (res["tp"], res["fp"], res["fn"]) == (1, 1, 0)
    res_arg = event_f1(ds, "arg_class")
    assert res_arg["f1"] == 1.0


def test_propagate_cluster_labels_majority():
    doc_ner = [
        [{"start": 0, "end": 1, "label": "Method"}],
        [{"start": 0, "end": 1, "label": "Task"}, {"start": 3, "end": 4, "label": "Method"}],
    ]
    starts = [0, 5]
    clusters = [[{"start": 0, "end": 1}, {"start": 5, "end": 6}, {"start": 8, "end": 9}]]
    out = propagate_cluster_labels(doc_ner, clusters, starts, [5, 5], iterations=1)
    # votes: Method(0-1), Task(5-6), Method(8-9) → majority Method
    assert out[1][0]["label"] == "Method"


def test_propagate_tie_breaks_lexicographic():
    doc_ner = [[{"start": 0, "end": 0, "label": "ZZZ"}, {"start": 2, "end": 2, "label": "AAA"}]]
    clusters = [[{"start": 0, "end": 0}, {"start": 2, "end": 2}]]
    out = propagate_cluster_labels(doc_ner, clusters, [0], [4], iterations=2)
    assert {m["label"] for m in out[0]} == {"AAA"}


def test_propagate_noop_when_disabled():
    doc_ner = [[{"start": 0, "end": 0, "label": "X"}]]
    assert propagate_cluster_labels(doc_ner, [], [0], [1], iterations=0) == doc_ner
