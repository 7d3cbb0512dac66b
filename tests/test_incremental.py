"""Shard-level incremental KB build: append-only inputs recompute only the
new shards, and the incremental result equals a from-scratch build."""

import glob
import os
import shutil

import pyarrow.parquet as pq

from dygiepp_ray.corpus import write_corpus
from dygiepp_ray.pipelines.kg import build_kg_incremental


def _read_triples(out_dir: str):
    import pandas as pd

    files = sorted(glob.glob(os.path.join(out_dir, "shard=*", "*.parquet")))
    df = pd.concat([pq.read_table(f).to_pandas() for f in files],
                   ignore_index=True)
    cols = [c for c in df.columns]
    return df.sort_values(cols).reset_index(drop=True)[cols]


def test_incremental_append_only_recomputes_new_shards(tmp_path):
    corpus = str(tmp_path / "corpus")
    out = str(tmp_path / "kb")
    write_corpus(corpus, n_files=60, seed=3, n_shards=3)

    base = ["part-00000", "part-00001", "part-00002"]
    r1 = build_kg_incremental(corpus, out, concurrency=1, batch_size=32)
    assert r1["written_shards"] == base
    assert r1["skipped_shards"] == []

    # no-op re-run: everything skipped
    r2 = build_kg_incremental(corpus, out, concurrency=1, batch_size=32)
    assert r2["written_shards"] == []
    assert r2["skipped_shards"] == base

    # append one shard (fresh rows under a new shard file that sorts FIRST
    # — stems are the manifest key, so existing shards stay skipped)
    extra = str(tmp_path / "extra")
    write_corpus(extra, n_files=20, seed=11, n_shards=1)
    src = glob.glob(os.path.join(extra, "*.parquet"))[0]
    shutil.copy(src, os.path.join(corpus, "aa-extra.parquet"))

    r3 = build_kg_incremental(corpus, out, concurrency=1, batch_size=32)
    assert r3["written_shards"] == ["aa-extra"]
    assert r3["skipped_shards"] == base

    # incremental result == from-scratch build on the full corpus
    clean = str(tmp_path / "kb_clean")
    build_kg_incremental(corpus, clean, concurrency=1, batch_size=32)
    a = _read_triples(out)
    b = _read_triples(clean)
    import pandas as pd

    pd.testing.assert_frame_equal(a, b)
