"""Property-based tests (hypothesis) for the pure kernels."""

import string

from hypothesis import given, settings, strategies as st

from dygiepp_ray.functions.strings import (
    canonicalize,
    cumsum_shifted,
    normalize_surface,
    partial_span_score,
    round_half_up,
)
from dygiepp_ray.sources.jsonl import from_scierc_json, to_scierc_json
from dygiepp_ray.stages.coref import drop_contained, merge_clusters
from dygiepp_ray.stages.kernel import decode_antecedents, enumerate_spans, prune_spans

words = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)


@settings(max_examples=60, deadline=None)
@given(st.lists(words, min_size=0, max_size=20))
def test_canonicalize_idempotent(tokens):
    text = " ".join(tokens)
    once = canonicalize(text)
    assert canonicalize(once) == once
    assert normalize_surface(normalize_surface(text)) == normalize_surface(text)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=50), max_size=20))
def test_cumsum_shifted_property(lengths):
    starts = cumsum_shifted(lengths)
    assert len(starts) == len(lengths)
    for i in range(len(lengths)):
        assert starts[i] == sum(lengths[:i])


@settings(max_examples=60, deadline=None)
@given(st.integers(min_value=1, max_value=60))
def test_enumerate_spans_sorted_unique(n):
    spans = enumerate_spans(n)
    assert spans == sorted(set(spans))
    assert all(e - s < 8 for s, e in spans)


@settings(max_examples=60, deadline=None)
@given(st.lists(st.floats(min_value=-10, max_value=10, allow_nan=False),
                min_size=1, max_size=40),
       st.integers(min_value=1, max_value=40))
def test_prune_spans_invariants(scores, n_tokens):
    import math

    import numpy as np

    kept = prune_spans(np.array(scores), n_tokens)
    k = max(1, min(len(scores), math.ceil(0.5 * n_tokens)))
    assert len(kept) == k
    assert list(kept) == sorted(kept)  # textual order restored
    # kept scores dominate dropped scores
    dropped = set(range(len(scores))) - set(kept.tolist())
    if dropped:
        assert min(scores[i] for i in kept) >= max(scores[i] for i in dropped) - 1e-12


@settings(max_examples=40, deadline=None)
@given(st.lists(st.integers(min_value=-1, max_value=8), min_size=0, max_size=12))
def test_decode_antecedents_wellformed(raw):
    # antecedent must point strictly earlier; rewrite invalid ones to -1
    best = [a if a < i else -1 for i, a in enumerate(raw)]
    clusters = decode_antecedents(best)
    seen = [i for c in clusters for i in c]
    assert len(seen) == len(set(seen))          # no mention in two clusters
    assert all(len(c) >= 2 for c in clusters)   # clusters are non-singleton
    assert all(c == sorted(c) for c in clusters)


span_strat = st.tuples(st.integers(0, 40), st.integers(0, 15)).map(
    lambda t: [t[0], t[0] + t[1]]
)
cluster_strat = st.lists(span_strat, min_size=1, max_size=5)


@settings(max_examples=40, deadline=None)
@given(st.lists(cluster_strat, min_size=0, max_size=4),
       st.lists(cluster_strat, min_size=0, max_size=4))
def test_merge_clusters_invariants(a, b):
    merged = merge_clusters(a, b)
    all_input_spans = {tuple(s) for c in a + b for s in c}
    for cluster in merged:
        spans = [tuple(s) for s in cluster]
        assert len(spans) == len(set(spans))           # no dup spans in a cluster
        assert set(spans) <= all_input_spans            # no invented spans
        assert spans == sorted(spans)
        # containment dedup held
        assert [tuple(s) for s in drop_contained([tuple(x) for x in cluster])] == spans
    assert merged == sorted(merged, key=lambda c: c[0][0])


@settings(max_examples=40, deadline=None)
@given(st.lists(st.lists(words, min_size=1, max_size=6), min_size=1, max_size=4),
       st.text(alphabet=string.ascii_lowercase + "_", min_size=1, max_size=10))
def test_jsonl_roundtrip_property(sentences, key):
    js = {"doc_key": key, "sentences": sentences}
    assert to_scierc_json(from_scierc_json(js)) == js


@settings(max_examples=80, deadline=None)
@given(st.floats(min_value=0, max_value=1e6, allow_nan=False),
       st.integers(min_value=0, max_value=6))
def test_round_half_up_matches_duckdb(x, nd):
    import duckdb

    want = duckdb.sql(f"select round({x!r}::DOUBLE, {nd})").fetchone()[0]
    assert round_half_up(x, nd) == want


@settings(max_examples=40, deadline=None)
@given(st.lists(words, min_size=1, max_size=8), st.lists(words, min_size=1, max_size=8))
def test_partial_span_score_bounds(a, b):
    s = partial_span_score(" ".join(a), " ".join(b))
    assert 0.0 <= s
    assert partial_span_score(" ".join(a), " ".join(a)) == 1.0


# ---- curation kernels (pure parts) -----------------------------------------


@settings(max_examples=40, deadline=None)
@given(st.lists(words, min_size=0, max_size=30),
       st.integers(min_value=1, max_value=6))
def test_word_ngrams_count_property(tokens, n):
    from dygiepp_ray.stages.curate import _word_ngrams

    ngs = _word_ngrams(tokens, n)
    assert len(ngs) == max(0, len(tokens) - n + 1)
    for g in ngs:
        assert len(g.split(" ")) == n


@settings(max_examples=40, deadline=None)
@given(st.lists(st.tuples(words, st.integers(min_value=1, max_value=50)),
                min_size=0, max_size=20),
       st.integers(min_value=1, max_value=8))
def test_bpe_merge_conserves_word_mass(pairs, n_merges):
    from dygiepp_ray.stages.bpe import learn_bpe_local

    wc = {}
    for w, n in pairs:
        wc[w] = wc.get(w, 0) + n
    merges = learn_bpe_local(wc, n_merges=n_merges, min_count=1)
    # merged symbol always equals left+right; ranks are dense from 0
    for i, (rank, a, b, ab, cnt) in enumerate(merges):
        assert rank == i
        assert ab == a + b
        assert cnt >= 1


@settings(max_examples=30, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=40), min_size=1,
                max_size=40),
       st.integers(min_value=1, max_value=16))
def test_pack_chunks_maths(token_counts, seq_len):
    # pure recomputation of the packing arithmetic used by
    # pack_concat_chunks: offsets are a prefix sum; every doc's seq range
    # covers exactly its token interval
    import numpy as np

    n = np.asarray(token_counts, dtype=np.int64)
    tok_start = np.concatenate([[0], np.cumsum(n)[:-1]])
    seq_first = tok_start // seq_len
    last_tok = tok_start + np.maximum(n, 1) - 1
    seq_last = last_tok // seq_len
    assert (seq_last >= seq_first).all()
    # a doc with n tokens spans at most ceil(n/seq_len)+1 sequences
    assert ((seq_last - seq_first) <= (n // seq_len) + 1).all()
    # consecutive docs are contiguous in the token stream
    assert (tok_start[1:] == tok_start[:-1] + n[:-1]).all()
