"""Join operators vs pandas oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from dygiepp_ray.joins import broadcast_lookup, hash_join, zip_join_assert


@pytest.fixture(scope="module")
def tables():
    rng = np.random.RandomState(5)
    left = pd.DataFrame({
        "k": rng.randint(0, 50, size=400),
        "lv": rng.randint(0, 1000, size=400),
    })
    right = pd.DataFrame({
        "k": np.arange(60),
        "rv": [f"v{i}" for i in range(60)],
    })
    return left, right


def test_hash_join_inner(tables):
    left, right = tables
    got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right),
                    on="k", n_buckets=8).to_pandas()
    want = left.merge(right, on="k", how="inner")
    got_s = got.sort_values(["k", "lv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    want_s = want.sort_values(["k", "lv"]).reset_index(drop=True)[["k", "lv", "rv"]]
    pd.testing.assert_frame_equal(got_s, want_s, check_dtype=False)


def test_hash_join_left(tables):
    left, right = tables
    right_small = right[right["k"] < 10]
    got = hash_join(ray.data.from_pandas(left), ray.data.from_pandas(right_small),
                    on="k", n_buckets=4, how="left").to_pandas()
    want = left.merge(right_small, on="k", how="left")
    assert len(got) == len(want)
    assert got["rv"].notna().sum() == want["rv"].notna().sum()


def test_hash_join_string_key():
    l = pd.DataFrame({"k": ["a", "b", "c", "a"], "x": [1, 2, 3, 4]})
    r = pd.DataFrame({"k": ["a", "c"], "y": [10, 30]})
    got = hash_join(ray.data.from_pandas(l), ray.data.from_pandas(r),
                    on="k", n_buckets=3).to_pandas()
    want = l.merge(r, on="k")
    assert sorted(zip(got["k"], got["x"], got["y"])) == sorted(zip(want["k"], want["x"], want["y"]))


def test_hash_join_bucket_post_aggregate(tables):
    # aggregate-pushdown: per-bucket reduction inside the join task sums to
    # the same totals as aggregating the full joined rows
    left, right = tables
    got = hash_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", n_buckets=8,
        bucket_post=lambda df: df.groupby("rv", as_index=False).agg(
            n=("lv", "size"), s=("lv", "sum")),
    ).to_pandas().groupby("rv", as_index=False)[["n", "s"]].sum()
    want = (left.merge(right, on="k", how="inner")
            .groupby("rv", as_index=False).agg(n=("lv", "size"), s=("lv", "sum")))
    pd.testing.assert_frame_equal(
        got.sort_values("rv").reset_index(drop=True),
        want.sort_values("rv").reset_index(drop=True), check_dtype=False)


def test_broadcast_lookup(tables):
    left, right = tables
    got = broadcast_lookup(ray.data.from_pandas(left), right, "k", ["rv"]).to_pandas()
    want = left.merge(right, on="k", how="left")
    assert got["rv"].fillna("·").tolist() == want["rv"].fillna("·").tolist()


def test_zip_join_assert_raises_on_dup():
    a = ray.data.from_items([{"doc_key": "d1", "x": 1}])
    b = ray.data.from_items([{"doc_key": "d1", "y": 1}, {"doc_key": "d1", "y": 2}])
    with pytest.raises(Exception):
        zip_join_assert(a, b, "doc_key", ["y"]).to_pandas()
