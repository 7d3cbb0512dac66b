"""Corpus-shape analytics (repo_stats / cross_repo_clones) vs brute force."""

import hashlib

import pandas as pd
import pyarrow as pa

import ray.data

from dygiepp_ray.stages.repostats import cross_repo_clones, repo_stats


def _corpus_table():
    rows = [
        # repo, path, commit, lang, content
        ("org/a", "p1.py", "c1", "python", "def f():\n    pass\n"),
        ("org/a", "p2.py", "c1", "python", "# hash join wins\n"),
        ("org/a", "p3.md", "c2", "markdown", "shared body"),
        ("org/b", "q1.md", "c3", "markdown", "shared body"),
        ("org/b", "q2.go", "c3", "go", "// bloom filter\n"),
        ("org/c", "r1.md", "c4", "markdown", "shared body"),
        ("org/c", "r2.md", "c4", "markdown", "other body"),
        ("org/c", "r3.md", "c5", "markdown", "other body"),
    ]
    cols = list(zip(*rows))
    return pa.table({
        "repo": list(cols[0]), "path": list(cols[1]), "commit": list(cols[2]),
        "lang": list(cols[3]), "content": list(cols[4]),
    })


def _sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


def test_repo_stats_matches_pandas_bruteforce():
    t = _corpus_table()
    got = (repo_stats(ray.data.from_arrow(t)).to_pandas()
           .sort_values("repo").reset_index(drop=True))
    df = t.to_pandas()
    df["sha"] = df["content"].map(_sha)
    df["nb"] = df["content"].str.encode("utf-8").str.len()
    exp = (df.groupby("repo")
           .agg(n_files=("path", "size"), n_langs=("lang", "nunique"),
                n_commits=("commit", "nunique"),
                n_distinct_content=("sha", "nunique"),
                total_bytes=("nb", "sum"))
           .reset_index())
    pd.testing.assert_frame_equal(
        got, exp.astype({c: "int64" for c in exp.columns[1:]}))


def test_repo_stats_partitioning_invariant():
    t = _corpus_table()
    one = (repo_stats(ray.data.from_arrow(t).repartition(1)).to_pandas()
           .sort_values("repo").reset_index(drop=True))
    many = (repo_stats(ray.data.from_arrow(t).repartition(5)).to_pandas()
            .sort_values("repo").reset_index(drop=True))
    pd.testing.assert_frame_equal(one, many)


def test_cross_repo_clones_golden():
    t = _corpus_table()
    got = (cross_repo_clones(ray.data.from_arrow(t), min_repos=2).to_pandas()
           .sort_values("sha").reset_index(drop=True))
    # only "shared body" appears in >= 2 distinct repos (org/a, org/b, org/c);
    # "other body" repeats twice but inside ONE repo
    assert len(got) == 1
    row = got.iloc[0]
    assert row["sha"] == _sha("shared body")
    assert row["n_repos"] == 3
    assert row["n_files"] == 3
    assert row["first_repo"] == "org/a"


def test_cross_repo_clones_min_repos_one_includes_within_repo_dups():
    t = _corpus_table()
    got = cross_repo_clones(ray.data.from_arrow(t), min_repos=1).to_pandas()
    by_sha = got.set_index("sha")
    assert by_sha.loc[_sha("other body"), "n_files"] == 2
    assert by_sha.loc[_sha("other body"), "n_repos"] == 1
    assert len(got) == 5  # 8 files, 5 distinct contents
