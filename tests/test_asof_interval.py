"""asof_join / interval_join vs brute-force pandas oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from dygiepp_ray.joins import asof_join, interval_join


def _trades():
    return pd.DataFrame({
        "sym": ["a", "a", "a", "b", "b", "c"],
        "t": [10, 20, 30, 15, 40, 7],
        "qty": [1, 2, 3, 4, 5, 6],
    })


def _quotes():
    return pd.DataFrame({
        "sym": ["a", "a", "b", "b", "d"],
        "qt": [5, 25, 15, 35, 1],
        "px": [100.0, 101.0, 200.0, 201.0, 300.0],
    })


def test_asof_backward_matches_merge_asof():
    got = asof_join(
        ray.data.from_pandas(_trades()), ray.data.from_pandas(_quotes()),
        by="sym", left_on="t", right_on="qt",
        left_cols=["qty"], right_cols=["px"], n_buckets=4,
    ).to_pandas().sort_values(["sym", "t"]).reset_index(drop=True)
    exp = pd.merge_asof(
        _trades().sort_values("t"), _quotes().sort_values("qt"),
        left_on="t", right_on="qt", by="sym", direction="backward",
    ).sort_values(["sym", "t"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got[sorted(got.columns)], exp[sorted(exp.columns)])
    # spot semantics: trade(a,30) takes quote qt=25; trade(c,7) unmatched
    row = got[(got["sym"] == "a") & (got["t"] == 30)].iloc[0]
    assert row["qt"] == 25 and row["px"] == 101.0
    assert got[got["sym"] == "c"]["px"].isna().all()


def test_asof_forward_direction():
    got = asof_join(
        ray.data.from_pandas(_trades()), ray.data.from_pandas(_quotes()),
        by="sym", left_on="t", right_on="qt",
        left_cols=["qty"], right_cols=["px"], n_buckets=4,
        direction="forward",
    ).to_pandas()
    row = got[(got["sym"] == "a") & (got["t"] == 10)].iloc[0]
    assert row["qt"] == 25  # next quote at-or-after t=10
    assert got[(got["sym"] == "b") & (got["t"] == 40)]["px"].isna().all()


def test_asof_tie_determinism():
    # two right rows at the same (by, on): the lexicographically greatest
    # right_cols row must win, on every run
    right = pd.DataFrame({"sym": ["a", "a"], "qt": [5, 5], "px": [7.0, 9.0]})
    left = pd.DataFrame({"sym": ["a"], "t": [10], "qty": [1]})
    for _ in range(3):
        got = asof_join(
            ray.data.from_pandas(left), ray.data.from_pandas(right),
            by="sym", left_on="t", right_on="qt",
            left_cols=["qty"], right_cols=["px"], n_buckets=2,
        ).to_pandas()
        assert got["px"].tolist() == [9.0]


def _brute_interval(left, right, on, ts, start, end):
    out = []
    for _, lr in left.iterrows():
        for _, rr in right.iterrows():
            if lr[on] == rr[on] and rr[start] <= lr[ts] < rr[end]:
                out.append({**lr.to_dict(), **{c: rr[c] for c in right.columns
                                               if c != on}})
    return pd.DataFrame(out)


def test_interval_join_matches_bruteforce_across_bands():
    rng = np.random.RandomState(7)
    left = pd.DataFrame({
        "k": rng.randint(0, 4, 60),
        "ts": rng.randint(0, 1000, 60).astype(np.int64),
        "lid": np.arange(60),
    })
    right = pd.DataFrame({
        "k": rng.randint(0, 4, 25),
        "s": rng.randint(0, 900, 25).astype(np.int64),
        "rid": np.arange(25),
    })
    right["e"] = right["s"] + rng.randint(1, 400, 25)  # spans many 50-bands
    got = interval_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", left_ts="ts", right_start="s", right_end="e",
        left_cols=["lid"], right_cols=["rid"],
        bucket_width=50, n_buckets=4,
    ).to_pandas()
    exp = _brute_interval(left, right, "k", "ts", "s", "e")
    key = ["lid", "rid"]
    got_pairs = sorted(map(tuple, got[key].to_numpy().tolist()))
    exp_pairs = sorted(map(tuple, exp[key].to_numpy().tolist()))
    assert got_pairs == exp_pairs and len(got_pairs) > 0


def test_interval_join_halfopen_boundaries():
    left = pd.DataFrame({"k": [1, 1], "ts": np.array([100, 200], np.int64),
                         "lid": [0, 1]})
    right = pd.DataFrame({"k": [1], "s": np.array([100], np.int64),
                          "e": np.array([200], np.int64), "rid": [0]})
    got = interval_join(
        ray.data.from_pandas(left), ray.data.from_pandas(right),
        on="k", left_ts="ts", right_start="s", right_end="e",
        left_cols=["lid"], right_cols=["rid"], bucket_width=64, n_buckets=2,
    ).to_pandas()
    assert got["lid"].tolist() == [0]  # ts==start in, ts==end out


def test_interval_join_post_filter_drops_self_pairs():
    ev = pd.DataFrame({"k": [1, 1, 1], "ts": np.array([0, 5, 100], np.int64),
                       "eid": [0, 1, 2]})
    win = pd.DataFrame({"k": [1, 1, 1], "s": np.array([0, 5, 100], np.int64),
                        "wid": [0, 1, 2]})
    win["e"] = win["s"] + 10
    got = interval_join(
        ray.data.from_pandas(ev), ray.data.from_pandas(win),
        on="k", left_ts="ts", right_start="s", right_end="e",
        left_cols=["eid"], right_cols=["wid"], bucket_width=8, n_buckets=2,
        post_filter=lambda df: df[df["eid"] != df["wid"]],
    ).to_pandas()
    pairs = sorted(map(tuple, got[["eid", "wid"]].to_numpy().tolist()))
    assert pairs == [(1, 0)]  # ts=5 in [0,10) only; self-pairs removed


def test_overlapping_columns_rejected():
    ds = ray.data.from_pandas(_trades())
    with pytest.raises(ValueError):
        asof_join(ds, ds, by="sym", left_on="t", right_on="t",
                  left_cols=["qty"], right_cols=["qty"])
