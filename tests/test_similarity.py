"""Similarity search vs numpy brute-force oracles."""

import numpy as np
import pandas as pd
import pytest

import ray.data

from dygiepp_ray.stages.similarity import (
    embedding_near_dups,
    knn_brute_force,
    knn_lsh,
)


@pytest.fixture(scope="module")
def emb_df():
    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    # plant near-dups: 100≈101, 102≈103
    vecs[101] = vecs[100] + 0.001 * rng.standard_normal(16).astype(np.float32)
    vecs[103] = vecs[102] + 0.001 * rng.standard_normal(16).astype(np.float32)
    return pd.DataFrame({"vec_id": np.arange(200), "embedding": list(vecs)})


def _oracle_topk(df, q, k):
    m = np.stack([np.asarray(v, dtype=np.float64) for v in df["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = np.asarray(q, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    cos = m @ qn
    order = sorted(zip(-cos, df["vec_id"]))[:k]
    return [int(v) for _, v in order]


def test_knn_brute_force_matches_oracle(emb_df):
    q = np.asarray(emb_df.loc[0, "embedding"])
    got = knn_brute_force(ray.data.from_pandas(emb_df), q, k=10).to_pandas()
    assert got["vec_id"].tolist() == _oracle_topk(emb_df, q, 10)
    assert got["cosine"].iloc[0] == pytest.approx(1.0, abs=1e-6)  # self
    assert got["cosine"].is_monotonic_decreasing


def test_knn_lsh_high_recall_on_near_dup(emb_df):
    q = np.asarray(emb_df.loc[100, "embedding"])
    got = knn_lsh(ray.data.from_pandas(emb_df), q, k=5, n_bits=8).to_pandas()
    # the planted near-identical vector must collide with the query bucket
    assert 100 in got["vec_id"].tolist() and 101 in got["vec_id"].tolist()
    # reported scores are true cosines (scan is exact within buckets)
    m = np.stack([np.asarray(v, dtype=np.float64) for v in emb_df["embedding"]])
    m = m / np.linalg.norm(m, axis=1, keepdims=True)
    qn = np.asarray(q, dtype=np.float64)
    qn = qn / np.linalg.norm(qn)
    true_cos = dict(zip(emb_df["vec_id"], m @ qn))
    for vid, c in zip(got["vec_id"], got["cosine"]):
        assert c == pytest.approx(true_cos[vid], abs=1e-5)
    assert got["cosine"].is_monotonic_decreasing


def test_embedding_near_dups_finds_planted(emb_df):
    got = embedding_near_dups(ray.data.from_pandas(emb_df), threshold=0.999).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (100, 101) in pairs and (102, 103) in pairs
    # oracle: no other pair of random gaussians reaches 0.999
    assert pairs == {(100, 101), (102, 103)}


def test_embedding_near_dups_multitable_recall():
    # moderately-similar pair (cos ≈ 0.93): one 10-bit table would miss it
    # ~78% of the time; 8 tables must find it
    rng = np.random.RandomState(8)
    vecs = rng.standard_normal((100, 16)).astype(np.float32)
    v = vecs[50] / np.linalg.norm(vecs[50])
    noise = rng.standard_normal(16).astype(np.float32)
    noise -= (noise @ v) * v  # orthogonal component
    noise /= np.linalg.norm(noise)
    target_cos = 0.93
    vecs[51] = target_cos * v + np.sqrt(1 - target_cos**2) * noise
    df = pd.DataFrame({"vec_id": np.arange(100), "embedding": list(vecs)})
    got = embedding_near_dups(ray.data.from_pandas(df), threshold=0.9).to_pandas()
    pairs = set(zip(got["id_a"], got["id_b"]))
    assert (50, 51) in pairs
    # each surviving pair is truly above threshold (exact verification)
    assert (got["cosine"] >= 0.9).all()
    # no duplicate pair rows despite multi-table collisions
    assert len(pairs) == len(got)


def test_lsh_index_matches_one_shot():
    # the persisted signature-partitioned index must return exactly what the
    # one-shot LSH scan returns (same planes/seed/radius/ranking math)
    import shutil

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from dygiepp_ray.stages.similarity import (
        build_lsh_index,
        knn_lsh,
        knn_lsh_indexed,
    )

    sf = "/root/testdata/sf0.001"
    t = pq.read_table(f"{sf}/embeddings.parquet", columns=["vec_id", "embedding"])
    qvec = np.asarray(t.column("embedding").to_pylist()[0], dtype=np.float64)
    emb = ray.data.read_parquet(f"{sf}/embeddings.parquet",
                                columns=["vec_id", "embedding"])
    idx = "/tmp/test_lsh_index"
    shutil.rmtree(idx, ignore_errors=True)
    build_lsh_index(emb, idx)
    a = knn_lsh_indexed(idx, qvec, k=10).to_pandas().reset_index(drop=True)
    b = knn_lsh(emb, qvec, k=10).to_pandas().reset_index(drop=True)
    assert a.equals(b) and len(a) == 10


def test_knn_recall_lsh_bounds_and_exact_self():
    import numpy as np
    import pandas as pd
    import ray.data

    from dygiepp_ray.stages.similarity import knn_recall_lsh

    rng = np.random.RandomState(3)
    vecs = rng.standard_normal((120, 16)).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(120, dtype=np.int64),
                       "embedding": list(vecs)})
    qids = [0, 5, 9]
    got = knn_recall_lsh(
        ray.data.from_pandas(df).repartition(4),
        vecs[qids], qids, k=10).to_pandas()
    assert sorted(got["query_id"]) == qids
    assert ((got["recall"] >= 0.0) & (got["recall"] <= 1.0)).all()
    # radius-n_bits LSH (near set = everything) must recall exactly 1.0
    full = knn_recall_lsh(
        ray.data.from_pandas(df).repartition(4),
        vecs[qids], qids, k=10, n_bits=1).to_pandas()
    # n_bits=1: near = {sig, sig^1} = both buckets -> candidate set == corpus
    assert (full["recall"] == 1.0).all()


def test_knn_recall_lsh_partitioning_invariant():
    import numpy as np
    import pandas as pd
    import ray.data

    from dygiepp_ray.stages.similarity import knn_recall_lsh

    rng = np.random.RandomState(11)
    vecs = rng.standard_normal((90, 8)).astype(np.float64)
    df = pd.DataFrame({"vec_id": np.arange(90, dtype=np.int64),
                       "embedding": list(vecs)})
    outs = []
    for nparts in (1, 5):
        got = knn_recall_lsh(
            ray.data.from_pandas(df).repartition(nparts),
            vecs[[2, 7]], [2, 7], k=5).to_pandas()
        outs.append(dict(zip(got["query_id"], got["recall"])))
    assert outs[0] == outs[1]


def test_scalar_quantize_stats_golden_and_invariance():
    import math

    import numpy as np
    import pandas as pd

    import ray.data
    from dygiepp_ray.stages.similarity import scalar_quantize_stats

    vecs = [[0.0, 1.0, 5.0], [1.0, 1.0, 7.0], [0.5, 1.0, 6.0]]
    df = pd.DataFrame({"vec_id": [10, 11, 12], "embedding": vecs})

    # brute-force oracle (dim 1 is degenerate -> code 0)
    arr = np.array(vecs, dtype=np.float64)
    mn, mx = arr.min(axis=0), arr.max(axis=0)
    want = {}
    for vid, row in zip(df["vec_id"], arr):
        codes = []
        for d in range(3):
            if mx[d] == mn[d]:
                codes.append(0)
            else:
                codes.append(min(255, int(math.floor(
                    ((row[d] - mn[d]) * 255.0) / (mx[d] - mn[d])))))
        want[vid] = (sum(codes), min(codes), max(codes))
    assert want[10] == (0, 0, 0)
    assert want[11] == (510, 0, 255)
    for nparts in (1, 3):
        got = scalar_quantize_stats(
            ray.data.from_pandas(df).repartition(nparts)).to_pandas()
        got_d = {int(v): (int(s), int(a), int(b)) for v, s, a, b in
                 zip(got["vec_id"], got["code_sum"], got["code_min"],
                     got["code_max"])}
        assert got_d == want
