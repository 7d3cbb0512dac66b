"""Coref metrics vs hand-computed textbook examples."""

import numpy as np
import pytest

import ray.data

from dygiepp_ray.pipelines.coref_metrics import (
    _hungarian_max,
    b3_counts,
    ceaf_e_counts,
    coref_scores,
    finalize,
    muc_counts,
)


def _fs(*clusters):
    return [frozenset(c) for c in clusters]


def test_muc_vilain_example():
    # Vilain et al. (1995)-style: key {a,b,c,d}, response {a,b}{c,d}
    key = _fs({(1, 1), (2, 2), (3, 3), (4, 4)})
    resp = _fs({(1, 1), (2, 2)}, {(3, 3), (4, 4)})
    rn, rd = muc_counts(key, resp)
    assert (rn, rd) == (2, 3)  # 4 mentions split into 2 partitions → (4-2)/(4-1)
    pn, pd_ = muc_counts(resp, key)
    assert (pn, pd_) == (2, 2)  # both response links are correct


def test_muc_perfect():
    key = _fs({(1, 1), (2, 2)}, {(3, 3), (4, 4), (5, 5)})
    assert muc_counts(key, key) == (3, 3)


def test_b3_identity_and_half():
    key = _fs({(1, 1), (2, 2)})
    num, den = b3_counts(key, key)
    assert num == 2.0 and den == 2
    # response splits the pair → each mention contributes 1/2·... : 1²/2 ×2 = 1
    resp = _fs({(1, 1)}, {(2, 2)})
    num, den = b3_counts(key, resp)
    assert num == pytest.approx(1.0) and den == 2


def test_ceaf_alignment():
    key = _fs({(1, 1), (2, 2)}, {(3, 3), (4, 4)})
    sim, nk, nr = ceaf_e_counts(key, key)
    assert sim == pytest.approx(2.0) and nk == nr == 2
    # crossed response: best alignment picks the better partner
    resp = _fs({(1, 1), (3, 3)}, {(2, 2), (4, 4)})
    sim, _, _ = ceaf_e_counts(key, resp)
    assert sim == pytest.approx(1.0)  # each pair shares exactly 1 of 2 mentions


def test_hungarian_max_simple():
    sim = np.array([[1.0, 0.0], [0.0, 2.0]])
    assert _hungarian_max(sim) == pytest.approx(3.0)
    sim = np.array([[2.0, 1.0], [2.0, 1.0]])  # forced split
    assert _hungarian_max(sim) == pytest.approx(3.0)
    assert _hungarian_max(np.zeros((0, 0))) == 0.0


def test_corpus_scores_perfect_and_streaming():
    clusters = [
        [[{"start": 0, "end": 1}, {"start": 5, "end": 5}],
         [{"start": 9, "end": 10}, {"start": 12, "end": 12}]],
        [[{"start": 2, "end": 2}, {"start": 7, "end": 8}]],
    ]
    ds = ray.data.from_items(
        [{"clusters": c, "predicted_clusters": c} for c in clusters]
    )
    scores = coref_scores(ds)
    assert scores["muc"]["f1"] == 1.0
    assert scores["b3"]["f1"] == 1.0
    assert scores["ceaf_e"]["f1"] == pytest.approx(1.0)
    assert scores["conll_f1"] == pytest.approx(1.0)
    assert scores["mention_recall"] == 1.0


def test_corpus_scores_degraded():
    gold = [[{"start": 0, "end": 0}, {"start": 1, "end": 1}, {"start": 2, "end": 2}]]
    pred = [[{"start": 0, "end": 0}, {"start": 1, "end": 1}]]
    ds = ray.data.from_items([{"clusters": gold, "predicted_clusters": pred}])
    s = coref_scores(ds)
    assert s["muc"]["precision"] == 1.0
    assert s["muc"]["recall"] == pytest.approx(0.5)
    assert s["mention_recall"] == pytest.approx(2 / 3)
