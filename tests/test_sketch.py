"""HyperLogLog sketch: accuracy, distributed-merge determinism, dtypes."""

import numpy as np
import pandas as pd

import ray.data

from dygiepp_ray.stages.sketch import (
    hll_estimate,
    hll_ndv,
    hll_partial_registers,
)


def test_hll_accuracy_within_expected_error():
    # p=12 -> standard error ~1.6%; assert a generous 5% on 10k distinct
    vals = np.arange(10_000, dtype=np.int64)
    nz, regs = hll_partial_registers(vals, 12)
    est = hll_estimate(nz, regs, 12)
    assert abs(est - 10_000) / 10_000 < 0.05
    # duplication must not change the estimate at all (max-merge semantics)
    nz2, regs2 = hll_partial_registers(np.tile(vals, 3), 12)
    assert hll_estimate(nz2, regs2, 12) == est


def test_hll_small_range_linear_counting():
    vals = np.arange(50, dtype=np.int64)
    nz, regs = hll_partial_registers(vals, 12)
    est = hll_estimate(nz, regs, 12)
    assert abs(est - 50) <= 2  # linear counting is near-exact here


def test_hll_distributed_merge_matches_single_pass():
    rng = np.random.RandomState(11)
    df = pd.DataFrame({
        "g": np.repeat(["x", "y", "z"], 4000),
        "v": rng.randint(0, 1_000_000, 12000),
    })
    got = hll_ndv(ray.data.from_pandas(df).repartition(7), "v",
                  by="g").to_pandas().sort_values("g").reset_index(drop=True)
    exp = []
    for k in ("x", "y", "z"):
        nz, regs = hll_partial_registers(
            df.loc[df["g"] == k, "v"].to_numpy(), 12)
        exp.append(hll_estimate(nz, regs, 12))
    assert got["ndv"].tolist() == exp
    assert got["ndv"].dtype == np.int64


def test_hll_string_values_and_global():
    df = pd.DataFrame({"v": [f"id-{i % 700}" for i in range(5000)]})
    got = hll_ndv(ray.data.from_pandas(df).repartition(4), "v").to_pandas()
    assert len(got) == 1
    assert abs(int(got["ndv"].iloc[0]) - 700) / 700 < 0.05


def test_cms_point_counts_bounds_and_determinism():
    import numpy as np
    import pandas as pd
    import ray.data

    from dygiepp_ray.stages.sketch import cms_point_counts

    rng = np.random.default_rng(5)
    # Zipf-ish stream with known exact counts
    vals = (["alpha"] * 500 + ["beta"] * 120 + ["gamma"] * 7
            + [f"tail{i}" for i in rng.integers(0, 400, 2000)])
    df = pd.DataFrame({"token": vals})
    probes = ["alpha", "beta", "gamma", "never-seen"]
    got = cms_point_counts(
        ray.data.from_pandas(df).repartition(4), "token", probes,
        width=1024, depth=4,
    ).to_pandas().set_index("token")["est"]
    n = len(vals)
    exact = {"alpha": 500, "beta": 120, "gamma": 7, "never-seen": 0}
    for p in probes:
        assert got[p] >= exact[p]                 # CMS never undercounts
        assert got[p] <= exact[p] + int(np.e / 1024 * n) + 1
    # partition-layout invariance (linear sketch: adds commute)
    got2 = cms_point_counts(
        ray.data.from_pandas(df).repartition(11), "token", probes,
        width=1024, depth=4,
    ).to_pandas().set_index("token")["est"]
    assert (got == got2).all()
