"""DSIR importance-resampling selection (stages/dsir.py)."""

import numpy as np
import pandas as pd

import ray.data

from dygiepp_ray.stages.dsir import (
    dsir_select,
    feature_histogram,
    log_ratio_scaled,
)


def _corpus():
    rows = []
    # target-like docs talk about joins; noise docs about weather
    for i in range(40):
        rows.append((i, "hash join merge join bloom filter join index"))
    for i in range(40, 200):
        rows.append((i, f"rain clouds wind sun rain fog day{i % 9}"))
    # a few raw docs that LOOK like the target — these must win selection
    for i in range(200, 210):
        rows.append((i, "hash join bloom filter join merge join"))
    return pd.DataFrame(rows, columns=["doc_id", "text"])


def test_dsir_selects_target_like_docs():
    df = _corpus()
    ds = ray.data.from_pandas(df).repartition(4)
    target = ds.map_batches(lambda d: d[d["doc_id"] < 40],
                            batch_format="pandas")
    raw = ds.map_batches(lambda d: d[d["doc_id"] >= 40],
                         batch_format="pandas")
    got = dsir_select(raw, target, k=10).to_pandas()
    assert len(got) == 10
    assert set(got["doc_id"]) == set(range(200, 210))
    assert (got["dsir_score"] > 0).all()
    # descending score, doc_id tiebreak
    assert list(got["dsir_score"]) == sorted(got["dsir_score"], reverse=True)


def test_dsir_partitioning_invariant():
    """Same corpus in 1 block vs 7 blocks → identical selection and exact
    integer scores (the histograms and scores are order-independent)."""
    df = _corpus()

    def run(parts):
        ds = ray.data.from_pandas(df).repartition(parts)
        target = ds.map_batches(lambda d: d[d["doc_id"] < 40],
                                batch_format="pandas")
        raw = ds.map_batches(lambda d: d[d["doc_id"] >= 40],
                             batch_format="pandas")
        return dsir_select(raw, target, k=25).to_pandas().reset_index(
            drop=True)

    pd.testing.assert_frame_equal(run(1), run(7))


def test_log_ratio_scaled_exact_ints():
    t = np.array([10, 0, 5], dtype=np.int64)
    r = np.array([0, 10, 5], dtype=np.int64)
    out = log_ratio_scaled(t, r, scale=1_000_000)
    assert out.dtype == np.int64
    assert out[0] > 0 > out[1]
    # symmetric buckets cancel exactly
    assert out[2] == 0


def test_feature_histogram_counts():
    ds = ray.data.from_pandas(pd.DataFrame(
        {"doc_id": [0, 1], "text": ["a b a", "a"]}))
    h = feature_histogram(ds, dim=1 << 8)
    # unigrams: a×3, b×1; bigrams: "a b", "b a" — 6 total grams
    assert h.sum() == 6
