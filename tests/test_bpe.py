"""BPE vocabulary learning: local vs distributed parity + hand case."""

import pandas as pd

import ray.data

from dygiepp_ray.stages.bpe import (
    _apply_merge,
    learn_bpe,
    learn_bpe_local,
)


def test_apply_merge_leftmost_nonoverlapping():
    assert _apply_merge(tuple("aaa"), "a", "a", "aa") == ("aa", "a")
    assert _apply_merge(tuple("aaaa"), "a", "a", "aa") == ("aa", "aa")
    assert _apply_merge(tuple("abc"), "x", "y", "xy") == tuple("abc")


def test_learn_bpe_local_hand_case():
    # classic toy: low/lower/newest/widest with counts
    wc = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = learn_bpe_local(wc, n_merges=3, min_count=2)
    # ("e","s") and ("s","t") tie at 9 (newest 6 + widest 3); the
    # deterministic tie-break (max lexicographic) picks ("s","t"), then
    # ("e","st") completes "est" at the same weighted count
    assert merges[0][1:4] == ("s", "t", "st")
    assert merges[0][4] == 9
    assert merges[1][1:4] == ("e", "st", "est")
    assert merges[1][4] == 9


def test_learn_bpe_distributed_matches_local():
    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "that hat is flat",
        "rats chase cats and bats",
    ] * 3
    df = pd.DataFrame({"text": texts})
    # local path
    got_local = learn_bpe(
        ray.data.from_pandas(df).repartition(3), n_merges=8, min_count=2
    ).to_pandas()
    # force the distributed merge loop
    got_dist = learn_bpe(
        ray.data.from_pandas(df).repartition(3), n_merges=8, min_count=2,
        local_max_vocab=0,
    ).to_pandas()
    pd.testing.assert_frame_equal(got_local, got_dist)
    assert len(got_local) == 8
    assert (got_local["left"] + got_local["right"]
            == got_local["merged"]).all()


def test_learn_bpe_min_count_stops():
    wc = {"ab": 1, "cd": 1}
    assert learn_bpe_local(wc, n_merges=5, min_count=3) == []


def test_encode_token_counts_matches_scalar_oracle():
    from collections import Counter

    import ray.data

    from dygiepp_ray.stages.bpe import (_apply_merge, encode_token_counts,
                                        learn_bpe, learn_bpe_local)

    texts = [
        "the cat sat on the mat",
        "the bat and the cat chat",
        "that hat is flat",
        "rats chase cats and bats",
    ] * 3
    df = pd.DataFrame({"text": texts})
    docs = ray.data.from_pandas(df).repartition(3)
    merges = learn_bpe(docs, n_merges=8, min_count=2)
    got = encode_token_counts(docs, merges).to_pandas()
    got_map = dict(zip(got["token"], got["n"].astype(int)))

    # scalar oracle: same ordered single-pass-per-merge encode
    wc: Counter = Counter()
    for t in texts:
        wc.update(t.lower().split())
    mlist = learn_bpe_local(dict(wc), n_merges=8, min_count=2)
    want: Counter = Counter()
    for w, n in wc.items():
        syms = tuple(w)
        for _rank, a, b, ab, _cnt in mlist:
            syms = _apply_merge(syms, a, b, ab)
        for s in syms:
            want[s] += n
    assert got_map == dict(want)
    # conservation: encoded symbols concatenate back to the original chars
    assert sum(len(t) * n for t, n in got_map.items()) == \
        sum(len(w) * n for w, n in wc.items())


def test_encode_token_counts_partitioning_invariant():
    import ray.data

    from dygiepp_ray.stages.bpe import encode_token_counts, learn_bpe

    df = pd.DataFrame({"text": ["aa ab ba bb ab aa"] * 6 + ["ba babb aab"] * 4})
    outs = []
    for nparts in (1, 4):
        docs = ray.data.from_pandas(df).repartition(nparts)
        merges = learn_bpe(docs, n_merges=4, min_count=2)
        got = encode_token_counts(docs, merges).to_pandas()
        outs.append(dict(zip(got["token"], got["n"].astype(int))))
    assert outs[0] == outs[1]
