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


def test_histogram_quantiles_within_bin_width_and_invariant():
    import numpy as np
    import pandas as pd

    import ray.data

    from dygiepp_ray.stages.sketch import histogram_quantiles

    rng = np.random.RandomState(8)
    x = rng.exponential(2000.0, size=5000) + 900.0
    df = pd.DataFrame({"v": x})
    probs = [0.25, 0.5, 0.9]
    lo, hi, bits = 0.0, 40000.0, 16
    width = (hi - lo) / (1 << bits)
    runs = []
    for nparts in (1, 7):
        got = histogram_quantiles(
            ray.data.from_pandas(df).repartition(nparts), "v",
            probs=probs, lo=lo, hi=hi, bits=bits).to_pandas()
        got = got.sort_values("prob").reset_index(drop=True)
        runs.append(got)
        assert got["n"].tolist() == [5000] * 3
        # each pick = upper edge of the bin holding the exact disc-quantile:
        # within one bin width above the exact order statistic
        xs = np.sort(x)
        for p, v in zip(got["prob"], got["value"]):
            exact = xs[int(np.ceil(p * len(xs))) - 1]
            assert exact <= v <= exact + width + 1e-9
    pd.testing.assert_frame_equal(runs[0], runs[1])


def test_histogram_quantiles_clips_out_of_range():
    import pandas as pd

    import ray.data

    from dygiepp_ray.stages.sketch import histogram_quantiles

    # values beyond hi land in the top bin; below lo in bin 0
    df = pd.DataFrame({"v": [-5.0, 0.5, 99.0, 1e9]})
    got = histogram_quantiles(ray.data.from_pandas(df), "v",
                              probs=[0.5, 1.0], lo=0.0, hi=100.0,
                              bits=4).to_pandas()
    assert got["n"].tolist() == [4, 4]
    # p=1.0 must pick the clipped top bin's upper edge (= hi)
    assert got.loc[got["prob"] == 1.0, "value"].iloc[0] == 100.0


def test_poisson_bootstrap_weights_distribution_and_determinism():
    from dygiepp_ray.stages.sketch import poisson_bootstrap_weights

    keys = np.arange(20000, dtype=np.int64)
    w = poisson_bootstrap_weights(keys, 8)
    # deterministic
    w2 = poisson_bootstrap_weights(keys, 8)
    assert (w == w2).all()
    # Poisson(1) moments: mean ~1, var ~1 (loose tolerance at n=160k)
    m = w.mean()
    v = w.var()
    assert abs(m - 1.0) < 0.02
    assert abs(v - 1.0) < 0.05
    assert w.min() >= 0 and w.max() <= 8


def test_bootstrap_sum_replicates_partition_invariance():
    from dygiepp_ray.stages.sketch import bootstrap_sum_replicates

    rng = np.random.RandomState(6)
    df = pd.DataFrame({"k": np.arange(500, dtype="int64"),
                       "x": rng.randint(0, 1000, size=500).astype("int64")})
    outs = []
    for nparts in (1, 5):
        got = bootstrap_sum_replicates(
            ray.data.from_pandas(df).repartition(nparts), "k", "x",
            n_boot=16).to_pandas().sort_values("b").reset_index(drop=True)
        outs.append(got)
    pd.testing.assert_frame_equal(outs[0], outs[1])
    assert int(outs[0].loc[outs[0]["b"] == -1, "s"].iloc[0]) \
        == int(df["x"].sum())
