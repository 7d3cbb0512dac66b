"""M11 SRL-baseline stand-in + eval-metric sweep driver
(reference eval_utils.py:55-172, eval_metric.py:60-209)."""

import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from dygiepp_ray.pipelines.sweep import (
    SRLMAP,
    eval_sweep,
    srl_baseline,
    srl_sentence_relations,
)


def test_srlmap_resolves_duplicates_like_reference():
    # the reference's dict literal lists some stems twice; the LAST value
    # wins ("inhibit" -> EFFECT, "prevent" -> MECHANISM, "regulat" -> MECHANISM)
    assert SRLMAP["inhibit"] == "EFFECT"
    assert SRLMAP["prevent"] == "MECHANISM"
    assert SRLMAP["regulat"] == "MECHANISM"
    assert len(SRLMAP) >= 80


def test_srl_sentence_relations_positional_frames():
    rels = srl_sentence_relations(
        "the drug treats the disease quickly .".split()
    )
    assert len(rels) == 1
    r = rels[0]
    assert r["rel"] == "MECHANISM"  # "treat" stem
    assert r["arg0"] == "the drug"
    assert r["arg1"] == "the disease quickly"

    # stem match is substring + first-in-map-order: "used" contains "us"
    rels = srl_sentence_relations("hash join is used for queries .".split())
    assert [r["rel"] for r in rels] == ["MECHANISM"]

    # no predicate -> no frames; missing arg side -> no frame
    assert srl_sentence_relations("nothing here matches".split()) == []
    assert srl_sentence_relations("treats the disease .".split()) == []


def test_srl_baseline_dataset():
    docs = ray.data.from_arrow(pa.table({
        "doc_key": ["d1", "d2"],
        "sentences": pa.array(
            [[["the", "drug", "treats", "cancer", "."]],
             [["no", "frames", "here", "."]]],
            pa.list_(pa.list_(pa.string()))),
    }))
    out = srl_baseline(docs).to_pandas()
    assert list(out.columns) == ["doc_id", "arg0", "arg1", "rel", "conf"]
    assert out["doc_id"].tolist() == ["d1"]
    assert out["rel"].tolist() == ["MECHANISM"]


def test_eval_sweep_grid_shape_and_values():
    gold = ray.data.from_arrow(pa.table({
        "doc_id": ["d1", "d1", "d2"],
        "arg0": ["a", "b", "c"],
        "arg1": ["x", "y", "z"],
        "rel": ["MECHANISM", "EFFECT", "MECHANISM"],
        "conf": pa.array([0.9, 0.8, 0.7], pa.float32()),
    }))
    # pred: one exact hit, one arg-only hit (wrong label), one miss
    pred = ray.data.from_arrow(pa.table({
        "doc_id": ["d1", "d1", "d2"],
        "arg0": ["a", "b", "q"],
        "arg1": ["x", "y", "w"],
        "rel": ["MECHANISM", "MECHANISM", "EFFECT"],
        "conf": pa.array([1.0, 0.5, 0.2], pa.float32()),
    }))
    df = eval_sweep(gold, {"m": pred}, metrics=("exact",),
                    topks=(50, 100, 150, 200))
    assert len(df) == 2  # collapse x {False, True}
    strict = df[~df["collapse"]].iloc[0]
    loose = df[df["collapse"]].iloc[0]
    assert strict["precision"] == pytest.approx(1 / 3)
    assert loose["precision"] == pytest.approx(2 / 3)
    # P@K only on the non-collapse row
    assert strict["p_at_50"] == pytest.approx(1 / 3)
    assert pd.isna(loose["p_at_50"])
