"""Evaluation harness: F1 counters, J3 matching, closure, gold⋈pred join."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from dygiepp_ray.pipelines.evaluate import (
    closure_rows,
    compute_f1,
    join_gold_pred,
    micro_f1,
    relation_matching,
    span_match,
    transitive_closure,
    triple_prf,
)


def test_compute_f1():
    p, r, f1 = compute_f1(10, 20, 5)
    assert (p, r) == (0.5, 0.25)
    assert f1 == pytest.approx(2 * 0.5 * 0.25 / 0.75)
    assert compute_f1(0, 0, 0) == (0.0, 0.0, 0.0)


def test_span_match_metrics():
    assert span_match("Hash Join", "hash join", "exact")
    assert span_match("join", "hash join", "substring")
    assert span_match("a b c", "b c d", "jaccard", threshold=0.5)
    assert not span_match("a b c", "x y z", "jaccard", threshold=0.5)
    # F4 head: last non-stopword token
    assert span_match("the hash join", "a blocked hash join", "head")
    assert not span_match("hash join", "merge sort", "head")
    # F5 ROUGE-L F vs threshold
    assert span_match("fast hash join", "fast hash join", "rouge", threshold=0.99)
    assert not span_match("fast hash join", "slow merge sort", "rouge", threshold=0.3)
    with pytest.raises(ValueError):
        span_match("a", "b", "bogus_metric")


def test_rouge_l_values():
    from dygiepp_ray.functions.strings import rouge_l_f

    assert rouge_l_f("a b c d", "a b c d") == pytest.approx(1.0)
    assert rouge_l_f("a b c d", "a c") > 0  # subsequence, not substring
    assert rouge_l_f("a b", "x y") == 0.0
    # LCS order matters: reversed tokens share only a length-1 subsequence
    assert rouge_l_f("a b c", "c b a") < rouge_l_f("a b c", "a b c")


def test_relation_matching_greedy_dedup():
    gold = [{"arg0": "a", "arg1": "b", "rel": "R"}]
    pred = [
        {"arg0": "a", "arg1": "b", "rel": "R"},
        {"arg0": "a", "arg1": "b", "rel": "R"},  # second pred can't re-match
    ]
    assert relation_matching(gold, pred) == 1
    # reversed-direction match (eval_utils.py:283-335)
    pred_rev = [{"arg0": "b", "arg1": "a", "rel": "R"}]
    assert relation_matching(gold, pred_rev) == 1
    assert relation_matching(gold, pred_rev, match_reversed=False) == 0
    # label mismatch never matches
    assert relation_matching(gold, [{"arg0": "a", "arg1": "b", "rel": "X"}]) == 0


def test_closure_rows_fixpoint():
    rows = [
        {"arg0": "a", "arg1": "b", "rel": "R", "conf": 0.5},
        {"arg0": "b", "arg1": "c", "rel": "R", "conf": 0.5},
        {"arg0": "c", "arg1": "d", "rel": "R", "conf": 0.5},
    ]
    out = {(r["arg0"], r["arg1"]): r for r in closure_rows(rows)}
    assert set(out) == {("a", "b"), ("b", "c"), ("c", "d"),
                        ("a", "c"), ("b", "d"), ("a", "d")}
    assert out[("a", "c")]["conf"] == pytest.approx(0.25)
    # a→d via a→c(0.25)·c→d(0.5) or a→b(0.5)·b→d(0.25) — first found wins
    assert out[("a", "d")]["conf"] == pytest.approx(0.125)


def _docs_with_preds():
    ner_typ = pa.list_(pa.list_(pa.struct(
        [("start", pa.int32()), ("end", pa.int32()), ("label", pa.string())])))
    gold = [[[{"start": 0, "end": 1, "label": "M"}],
             [{"start": 2, "end": 2, "label": "T"}]]]
    pred = [[[{"start": 0, "end": 1, "label": "M"},
              {"start": 4, "end": 5, "label": "M"}],  # 1 FP
             []]]                                      # 1 FN
    t = pa.table({
        "doc_key": pa.array(["d1"]),
        "ner": pa.array(gold, ner_typ),
        "predicted_ner": pa.array(pred, ner_typ),
    })
    return ray.data.from_arrow(t)


def test_micro_f1_ner():
    res = micro_f1(_docs_with_preds(), task="ner")
    assert (res["tp"], res["fp"], res["fn"]) == (1, 1, 1)
    assert res["precision"] == 0.5 and res["recall"] == 0.5


def test_join_gold_pred_1to1():
    gold = ray.data.from_items([{"doc_key": "a", "x": 1}, {"doc_key": "b", "x": 2}])
    pred = ray.data.from_items([{"doc_key": "b", "y": 20}, {"doc_key": "a", "y": 10}])
    out = join_gold_pred(gold, pred, ["y"]).to_pandas().sort_values("doc_key")
    assert out["y"].tolist() == [10, 20] and out["x"].tolist() == [1, 2]


def test_triple_prf_perfect_and_degraded():
    gold = pd.DataFrame({
        "doc_id": ["d1", "d1", "d2"],
        "arg0": ["a", "b", "c"], "arg1": ["x", "y", "z"],
        "rel": ["R", "R", "S"],
    })
    perfect = triple_prf(ray.data.from_pandas(gold), ray.data.from_pandas(gold))
    assert perfect["f1"] == 1.0
    worse = gold.copy()
    worse.loc[2, "rel"] = "WRONG"
    res = triple_prf(ray.data.from_pandas(gold), ray.data.from_pandas(worse))
    assert res["n_matched"] == 2 and res["precision"] == pytest.approx(2 / 3)


def test_transitive_closure_dataset():
    tri = pd.DataFrame({
        "doc_id": ["d1", "d1", "d2"],
        "subj": ["a", "b", "q"], "obj": ["b", "c", "r"],
        "pred": ["R", "R", "R"], "conf": [0.5, 0.5, 0.9],
    })
    out = transitive_closure(ray.data.from_pandas(tri)).to_pandas()
    d1 = out[out["doc_id"] == "d1"]
    assert set(zip(d1["subj"], d1["obj"])) == {("a", "b"), ("b", "c"), ("a", "c")}
    assert len(out[out["doc_id"] == "d2"]) == 1  # no cross-doc closure


def _calibration_oracle(pred_rows, gold_rows, n_bins=10, scale=10_000):
    import math

    p = sorted(set(pred_rows))
    gold = {r[:4] for r in gold_rows}
    confs = [c for *_k, c in p]
    cmin, cmax = min(confs), max(confs)
    out: dict[int, list[int]] = {}
    for *k, c in p:
        if cmax == cmin:
            b = 0
        else:
            b = min(n_bins - 1,
                    int(math.floor(((c - cmin) * float(n_bins))
                                   / (cmax - cmin))))
        n, ok = out.setdefault(b, [0, 0])
        out[b][0] = n + 1
        out[b][1] = ok + (1 if tuple(k) in gold else 0)
    return {b: (n, ok, ok * scale // n) for b, (n, ok) in out.items()}


def test_calibration_bins_golden_and_invariance():
    import pandas as pd

    import ray.data
    from dygiepp_ray.pipelines.evaluate import calibration_bins

    pred_rows = [
        ("d1", "a", "P", "b", 0.1), ("d1", "a", "P", "c", 0.2),
        ("d2", "a", "P", "b", 0.9), ("d2", "x", "Q", "y", 1.0),
        ("d1", "a", "P", "b", 0.1),  # duplicate instance collapses
        ("d3", "m", "R", "n", 0.55),
    ]
    gold_rows = [("d1", "a", "P", "b"), ("d2", "a", "P", "b"),
                 ("d2", "x", "Q", "y")]
    want = _calibration_oracle(pred_rows, gold_rows)
    # envelope [.1, 1.0]: conf .1 -> bin 0 (correct), .2 -> bin 1 (wrong),
    # .9 -> bin 8, 1.0 -> bin 9 (both correct)
    assert want[0] == (1, 1, 10_000)
    assert want[1] == (1, 0, 0)
    assert want[8] == (1, 1, 10_000)
    assert want[9] == (1, 1, 10_000)
    pdf = pd.DataFrame(pred_rows, columns=["doc_id", "subj_norm", "pred",
                                           "obj_norm", "conf"])
    gdf = pd.DataFrame(gold_rows, columns=["doc_id", "subj_norm", "pred",
                                           "obj_norm"])
    for nparts in (1, 3):
        got = calibration_bins(
            ray.data.from_pandas(pdf).repartition(nparts),
            ray.data.from_pandas(gdf).repartition(nparts),
            salt_buckets=2, n_buckets=4).to_pandas()
        got_d = {int(b): (int(n), int(c), int(s)) for b, n, c, s in
                 zip(got["bin"], got["n_pred"], got["n_correct"],
                     got["prec_scaled"])}
        assert got_d == want


def test_calibration_bins_degenerate_envelope():
    import pandas as pd

    import ray.data
    from dygiepp_ray.pipelines.evaluate import calibration_bins

    pdf = pd.DataFrame([("d1", "a", "P", "b", 0.5), ("d1", "a", "P", "c", 0.5)],
                       columns=["doc_id", "subj_norm", "pred", "obj_norm",
                                "conf"])
    gdf = pd.DataFrame([("d1", "a", "P", "b")],
                       columns=["doc_id", "subj_norm", "pred", "obj_norm"])
    got = calibration_bins(ray.data.from_pandas(pdf),
                           ray.data.from_pandas(gdf), n_buckets=2).to_pandas()
    assert got["bin"].tolist() == [0]
    assert int(got["n_pred"].iloc[0]) == 2
    assert int(got["n_correct"].iloc[0]) == 1
    assert int(got["prec_scaled"].iloc[0]) == 5000
