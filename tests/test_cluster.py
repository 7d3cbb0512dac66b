"""k-means / IVF ANN / SemDeDup (stages/cluster.py).

Determinism is the load-bearing property: the distributed fit must equal a
single-threaded recompute bit-for-bit (integer-scaled sums), or the driver's
value-hash oracle checks would be flaky.
"""

import numpy as np
import pandas as pd
import pytest

import ray.data

from dygiepp_ray.stages.cluster import (
    kmeans_assign,
    kmeans_fit,
    knn_ivf,
    semantic_dedup,
)


def _toy(n=60, dim=8, seed=3):
    rng = np.random.RandomState(seed)
    # three well-separated blobs
    centers = rng.standard_normal((3, dim)) * 10
    vecs = np.concatenate(
        [centers[i % 3] + rng.standard_normal(dim) * 0.1 for i in range(n)]
    ).reshape(n, dim).astype(np.float32)
    return pd.DataFrame({"vec_id": np.arange(n, dtype=np.int64),
                         "embedding": list(vecs)})


@pytest.fixture(scope="module")
def toy_ds():
    return ray.data.from_pandas(_toy()).repartition(4)


def test_kmeans_fit_matches_single_threaded(toy_ds):
    df = _toy()
    cents = kmeans_fit(toy_ds, k=3, n_iter=4)
    # single-threaded recompute with the same integer-sum discipline
    mat = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    c = mat[:3].copy()
    scaled = np.rint(mat * 1e6).astype(np.int64)
    for _ in range(4):
        d = ((mat[:, None, :] - c[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(axis=1)
        for j in range(3):
            if (lab == j).any():
                c[j] = scaled[lab == j].sum(0).astype(np.float64) / (
                    1e6 * int((lab == j).sum()))
    assert np.array_equal(cents, c), "distributed fit must be exact"


def test_kmeans_assign_separates_blobs(toy_ds):
    cents = kmeans_fit(toy_ds, k=3, n_iter=4)
    out = kmeans_assign(toy_ds, cents).to_pandas().sort_values("vec_id")
    # rows i, i+3, i+6, ... belong to the same blob -> same cluster
    lab = out["cluster"].to_numpy()
    for i in range(3):
        assert len(set(lab[i::3])) == 1
    assert len(set(lab[:3])) == 3  # three distinct clusters
    assert (out["dist"] < 1.0).all()  # tight blobs


def test_knn_ivf_finds_query_neighborhood(toy_ds):
    df = _toy()
    cents = kmeans_fit(toy_ds, k=3, n_iter=4)
    q = np.asarray(df["embedding"][0], dtype=np.float64)
    out = knn_ivf(toy_ds, cents, q, k=5, nprobe=1).to_pandas()
    assert len(out) == 5
    assert out["vec_id"].iloc[0] == 0 and out["cosine"].iloc[0] == 1.0
    # all hits come from blob 0 (ids ≡ 0 mod 3): nprobe=1 restricts to the
    # query's own cluster
    assert (out["vec_id"] % 3 == 0).all()
    assert (out["cosine"].diff().dropna() <= 0).all()


def test_semantic_dedup_finds_planted_pairs(toy_ds):
    df = _toy()
    dup = df[df["vec_id"] < 5].copy()
    dup["vec_id"] += 1000
    planted = ray.data.from_pandas(
        pd.concat([df, dup], ignore_index=True)).repartition(4)
    cents = kmeans_fit(planted, k=3, n_iter=3)
    pairs = semantic_dedup(planted, cents, threshold=0.999999).to_pandas()
    got = set(zip(pairs["id_a"], pairs["id_b"]))
    assert {(i, i + 1000) for i in range(5)} <= got
    assert (pairs["id_a"] < pairs["id_b"]).all()
    exact = pairs[pairs["id_b"] >= 1000]
    assert (exact["cosine"] == 1.0).all()


def test_semantic_dedup_never_crosses_clusters(toy_ds):
    # threshold 0 would pair everything — but only WITHIN a cluster
    cents = kmeans_fit(toy_ds, k=3, n_iter=4)
    pairs = semantic_dedup(toy_ds, cents, threshold=-1.0).to_pandas()
    n = 60 // 3
    assert len(pairs) == 3 * (n * (n - 1) // 2)
    assert ((pairs["id_a"] % 3) == (pairs["id_b"] % 3)).all()


def test_pq_adc_approximates_exact_l2():
    import numpy as np
    import pandas as pd

    import ray.data
    from dygiepp_ray.stages.cluster import knn_pq, pq_encode_matrix, pq_train

    rng = np.random.default_rng(2)
    # 3 well-separated gaussian clumps in 16d
    centers = rng.normal(0, 5, (3, 16))
    x = np.concatenate([c + rng.normal(0, 0.1, (40, 16)) for c in centers])
    df = pd.DataFrame({"vec_id": np.arange(120, dtype="int64"),
                       "embedding": [v.tolist() for v in x]})
    ds = ray.data.from_pandas(df).repartition(3)
    cb = pq_train(ds, m=4, k=8, n_iter=3)
    assert cb.shape == (4, 8, 4)
    codes = pq_encode_matrix(x, cb)
    assert codes.shape == (120, 4)
    # ADC top-10 for a clump-0 query lands entirely inside clump 0
    got = knn_pq(ds, cb, x[0], k=10).to_pandas()
    assert len(got) == 10
    assert (got["vec_id"] < 40).all()
    # determinism across block layouts
    got2 = knn_pq(ray.data.from_pandas(df).repartition(7), cb, x[0],
                  k=10).to_pandas()
    assert got["vec_id"].tolist() == got2["vec_id"].tolist()
    assert got["adc"].tolist() == got2["adc"].tolist()


def test_label_centroids_golden_and_invariance():
    import numpy as np
    import pandas as pd

    import ray.data
    from dygiepp_ray.stages.cluster import label_centroids

    df = pd.DataFrame({
        "vec_id": [0, 1, 2, 3],
        "embedding": [[1.0, -0.5], [0.0, -0.5], [2.0, 2.0], [-3.0, 0.25]],
        "label": [7, 7, 9, 9],
    })
    # fixed-point oracle (scale 1e6, truncating division)
    want = {}
    for lab in (7, 9):
        rows = np.rint(np.array(
            [v for v, l in zip(df["embedding"], df["label"]) if l == lab],
            dtype=np.float64) * 1e6).astype(np.int64)
        s = rows.sum(axis=0)
        n = rows.shape[0]
        cent = np.sign(s) * (np.abs(s) // n)
        for d in range(2):
            want[(lab, d + 1)] = (n, int(cent[d]))
    assert want[(7, 1)] == (2, 500_000)
    assert want[(7, 2)] == (2, -500_000)
    assert want[(9, 2)] == (2, 1_125_000)
    for nparts in (1, 3):
        got = label_centroids(
            ray.data.from_pandas(df).repartition(nparts)).to_pandas()
        got_d = {(int(l), int(d)): (int(n), int(c)) for l, d, n, c in
                 zip(got["label"], got["d"], got["n_vecs"],
                     got["centroid_scaled"])}
        assert got_d == want


def test_knn_graph_matches_bruteforce_in_cell():
    import numpy as np
    import pandas as pd

    import ray.data
    from dygiepp_ray.functions.strings import round_half_up
    from dygiepp_ray.stages.cluster import knn_graph

    rng = np.random.RandomState(3)
    # two well-separated blobs so the cell contract is unambiguous
    a = rng.randn(12, 4) * 0.1 + np.array([5.0, 0, 0, 0])
    b = rng.randn(10, 4) * 0.1 + np.array([0, 5.0, 0, 0])
    mat = np.concatenate([a, b])
    ids = np.arange(len(mat))
    centroids = np.array([[5.0, 0, 0, 0], [0, 5.0, 0, 0]])
    df = pd.DataFrame({"vec_id": ids, "embedding": list(map(list, mat))})

    # brute-force in-cell oracle
    labels = np.array([0] * 12 + [1] * 10)
    nm = mat / np.linalg.norm(mat, axis=1)[:, None]
    want = set()
    for cell in (0, 1):
        sel = np.where(labels == cell)[0]
        cm = nm[sel]
        cos = round_half_up(cm @ cm.T, 6)
        for r in range(len(sel)):
            row = cos[r].copy()
            row[r] = np.inf
            order = np.lexsort((ids[sel], -row))
            take = [o for o in order if row[o] != np.inf][:3]
            for t in take:
                want.add((int(ids[sel][r]), int(ids[sel][t]),
                          float(row[t])))
    for nparts in (1, 3):
        got = knn_graph(ray.data.from_pandas(df).repartition(nparts),
                        centroids, k=3).to_pandas()
        got_s = {(int(s), int(n), float(c)) for s, n, c in
                 zip(got["vec_id"], got["nb_id"], got["cosine"])}
        assert got_s == want
        # every vector has exactly k neighbors (cells are large enough)
        assert got["vec_id"].value_counts().eq(3).all()


def test_embedding_link_golden_and_tie_break():
    import pandas as pd

    import ray.data
    from dygiepp_ray.stages.cluster import embedding_link

    df = pd.DataFrame({
        "vec_id": [0, 1, 2, 3, 4],
        "embedding": [[0.0, 0.0], [0.2, 0.0], [4.0, 4.0], [3.8, 4.0],
                      [2.0, 2.0]],  # equidistant from both prototypes
        "label": [1, 1, 2, 2, 1],
    })
    got = embedding_link(ray.data.from_pandas(df)).to_pandas().set_index(
        "vec_id").sort_index()
    # prototypes: label1 mean of rows 0,1,4 = (0.733..,0.666..) truncated;
    # label2 = (3.9, 4.0) — rows 0/1 link to 1, rows 2/3 to 2
    assert got.loc[0, "label_pred"] == 1
    assert got.loc[1, "label_pred"] == 1
    assert got.loc[2, "label_pred"] == 2
    assert got.loc[3, "label_pred"] == 2
    assert set(got["match"].unique()) <= {0, 1}
    # exact integers end-to-end
    assert str(got["dist_scaled2"].dtype) == "int64"


def test_embedding_link_partitioning_invariant():
    import pandas as pd

    import ray.data
    from dygiepp_ray.stages.cluster import embedding_link

    df = pd.DataFrame({
        "vec_id": list(range(12)),
        "embedding": [[(i * 7 % 5) / 3.0, (i * 3 % 7) / 5.0]
                      for i in range(12)],
        "label": [i % 3 for i in range(12)],
    })
    one = embedding_link(ray.data.from_pandas(df).repartition(1)).to_pandas(
        ).sort_values("vec_id").reset_index(drop=True)
    many = embedding_link(ray.data.from_pandas(df).repartition(5)).to_pandas(
        ).sort_values("vec_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(one, many)


def test_embedding_outliers_bruteforce_and_invariance():
    import numpy as np
    import pandas as pd

    import ray.data
    from dygiepp_ray.functions.strings import round_half_up
    from dygiepp_ray.stages.cluster import embedding_outliers

    rng = [(i * 31 % 17) / 7.0 for i in range(40)]
    df = pd.DataFrame({
        "vec_id": list(range(20)),
        "embedding": [[rng[2 * i], rng[2 * i + 1]] for i in range(20)],
    })
    cents = np.array([[0.0, 0.0], [2.0, 2.0]])
    # brute force: per-cluster top-3 by scaled dist desc, vec_id asc
    m = np.array(df["embedding"].tolist())
    d2 = ((m[:, None, :] - cents[None, :, :]) ** 2).sum(-1)
    lab = d2.argmin(1)
    ds = np.rint(round_half_up(np.sqrt(d2[np.arange(20), lab]), 6)
                 * 1e6).astype("int64")
    want = {}
    for j in (0, 1):
        mem = sorted([(-ds[i], i) for i in range(20) if lab[i] == j])[:3]
        want[j] = [(i, -negd) for negd, i in mem]
    for nparts in (1, 4):
        got = embedding_outliers(
            ray.data.from_pandas(df).repartition(nparts), cents, k_out=3)
        got_by = {j: [(int(r.vec_id), int(r.dist_scaled))
                      for r in got[got["cluster"] == j].itertuples()]
                  for j in (0, 1)}
        assert got_by == want
        # mean context column is the exact per-cluster integer mean
        for j in (0, 1):
            mean_j = int(ds[lab == j].sum()) // max(int((lab == j).sum()), 1)
            assert all(int(r.cluster_mean_scaled) == mean_j
                       for r in got[got["cluster"] == j].itertuples())


def test_embedding_silhouette_partition_invariance_and_bounds():
    from dygiepp_ray.stages.cluster import embedding_silhouette, kmeans_fit

    rng = np.random.RandomState(5)
    # two tight blobs + noise, ids deterministic
    mat = np.vstack([rng.normal(0, 0.1, size=(30, 4)),
                     rng.normal(3, 0.1, size=(30, 4)),
                     rng.normal(1.5, 1.0, size=(20, 4))])
    df = pd.DataFrame({"vec_id": np.arange(len(mat), dtype="int64"),
                       "embedding": list(mat)})
    ds = ray.data.from_pandas(df)
    cents = kmeans_fit(ds, k=3, n_iter=3)
    outs = []
    for nparts in (1, 4):
        got = embedding_silhouette(
            ray.data.from_pandas(df).repartition(nparts), cents
        ).to_pandas().sort_values("cluster").reset_index(drop=True)
        outs.append(got)
        assert got["n"].sum() == len(mat)
        assert (got["mean_sil_ppm"] >= 0).all()
        assert (got["mean_sil_ppm"] <= 1_000_000).all()
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # the two tight blobs should dominate: at least one cluster with a
    # high silhouette
    assert outs[0]["mean_sil_ppm"].max() > 700_000
