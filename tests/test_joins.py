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


def test_hash_join_full_outer(tables):
    left, right = tables
    # left keys 0..49 (some), right keys 0..59 — right-only keys exercise
    # the unmatched-right path; drop left keys < 5 for unmatched-left too
    left2 = left[left["k"] >= 5]
    got = hash_join(ray.data.from_pandas(left2), ray.data.from_pandas(right),
                    on="k", n_buckets=8, how="outer").to_pandas()
    want = left2.merge(right, on="k", how="outer")
    assert len(got) == len(want)
    assert int(got["lv"].isna().sum()) == int(want["lv"].isna().sum())
    assert int(got["rv"].isna().sum()) == int(want["rv"].isna().sum())
    got_s = got.sort_values(["k", "lv"], na_position="last").reset_index(drop=True)
    want_s = want.sort_values(["k", "lv"], na_position="last").reset_index(drop=True)
    pd.testing.assert_frame_equal(got_s[["k", "lv", "rv"]],
                                  want_s[["k", "lv", "rv"]],
                                  check_dtype=False)


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


def test_skew_join_matches_hash_join():
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from dygiepp_ray.joins import hash_join, skew_join

    rng = np.random.default_rng(11)
    # key 0 holds ~40% of left rows (hot); others uniform over 1..49
    keys = np.where(rng.random(3000) < 0.4, 0,
                    rng.integers(1, 50, 3000)).astype("int64")
    left = pd.DataFrame({"k": keys, "lv": np.arange(3000, dtype="int64")})
    right = pd.DataFrame({"k": np.arange(0, 50, dtype="int64"),
                          "rv": np.arange(100, 150, dtype="int64")})
    lds = ray.data.from_pandas(left).repartition(6)
    rds = ray.data.from_pandas(right).repartition(2)
    t = {"k": pa.int64(), "lv": pa.int64()}
    rt = {"k": pa.int64(), "rv": pa.int64()}

    got = (
        skew_join(lds, rds, "k", hot_threshold=500, left_types=t,
                  right_types=rt)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    exp = (
        hash_join(lds, rds, "k", left_types=t, right_types=rt)
        .to_pandas()[got.columns]
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["k"] == 0).sum() > 1000  # the hot key really is hot


def test_skew_join_no_hot_keys_falls_back():
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from dygiepp_ray.joins import skew_join

    left = pd.DataFrame({"k": [1, 2, 3], "lv": [10, 20, 30]})
    right = pd.DataFrame({"k": [2, 3, 4], "rv": [7, 8, 9]})
    got = skew_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right), "k",
        hot_threshold=100,
        left_types={"k": pa.int64(), "lv": pa.int64()},
        right_types={"k": pa.int64(), "rv": pa.int64()},
    ).to_pandas().sort_values("k").reset_index(drop=True)
    assert got["k"].tolist() == [2, 3]
    assert got["rv"].tolist() == [7, 8]


def test_skew_join_hot_keys_supplied_and_multirow_right():
    """Caller-supplied hot_keys skip the histogram pass; a hot key with
    SEVERAL right rows must still produce each (left, right) pair exactly
    once despite the replication."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    import ray.data
    from dygiepp_ray.joins import hash_join, skew_join

    rng = np.random.default_rng(5)
    keys = np.where(rng.random(2000) < 0.5, 7,
                    rng.integers(0, 20, 2000)).astype("int64")
    left = pd.DataFrame({"k": keys, "lv": np.arange(2000, dtype="int64")})
    # hot key 7 has 3 right rows; others 1
    right = pd.DataFrame({"k": np.r_[np.arange(20), 7, 7].astype("int64"),
                          "rv": np.arange(22, dtype="int64")})
    lds = ray.data.from_pandas(left).repartition(5)
    rds = ray.data.from_pandas(right).repartition(2)
    t = {"k": pa.int64(), "lv": pa.int64()}
    rt = {"k": pa.int64(), "rv": pa.int64()}
    got = (skew_join(lds, rds, "k", left_types=t, right_types=rt,
                     hot_keys=[7])
           .to_pandas().sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    exp = (hash_join(lds, rds, "k", left_types=t, right_types=rt)
           .to_pandas()[got.columns]
           .sort_values(["k", "lv", "rv"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got, exp, check_dtype=False)
    assert (got["k"] == 7).sum() == (keys == 7).sum() * 3
