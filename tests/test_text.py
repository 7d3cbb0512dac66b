"""Text-analysis stages vs hand-computed oracles."""

import pandas as pd

import ray.data

from dygiepp_ray.stages.text import (
    LangId,
    fingerprint,
    normalize_text,
    quality_score,
    token_stats,
)


def test_token_stats():
    df = pd.DataFrame({"doc_id": [1], "text": ["ab cd  efg"]})
    out = token_stats(df)
    assert out.loc[0, "n_tokens"] == 3
    assert out.loc[0, "n_chars"] == 10
    assert out.loc[0, "avg_token_len"] == round(7 / 3, 6)


def test_quality_score_bounds():
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["the cat sat on the mat", "x " * 200]})
    out = quality_score(df)
    assert ((out["quality"] >= 0) & (out["quality"] <= 1)).all()
    assert out.loc[0, "stop_ratio"] == round(3 / 6, 6)  # the, on, the


def test_normalize_text():
    df = pd.DataFrame({"doc_id": [1], "text": ["  Hello,   World!! "]})
    assert normalize_text(df).loc[0, "norm"] == "hello world"


def test_langid_markers_and_cjk():
    li = LangId()
    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["the cat and the dog is here", "le chat est dans les maisons", "你好世界你好世界"],
    })
    out = li(df)
    assert out["lang_pred"].tolist() == ["en", "fr", "zh"]


def test_fingerprint_deterministic_and_sensitive():
    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a b c", "a b c", "a b d"]})
    out = fingerprint(df)
    assert out.loc[0, "fp64"] == out.loc[1, "fp64"]
    assert out.loc[0, "fp64"] != out.loc[2, "fp64"]


def test_token_count_bpe_segments():
    from dygiepp_ray.stages.text import token_count_bpe

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["hello world 123 foo-bar!  baz", "", "  leading", "a1b2"],
    })
    out = token_count_bpe(df)
    # "hello","world"," 123"(num),"foo","-","bar","!","  "(ws),"baz" → 9
    assert out["n_bpe"].tolist() == [9, 0, 2, 4]
    assert out["n_alpha"].tolist() == [5, 0, 1, 2]
    assert out["n_num"].tolist() == [1, 0, 0, 2]
    assert out["n_punct"].tolist() == [2, 0, 0, 0]


def test_dup_ngram_stats_repetition():
    from dygiepp_ray.stages.text import dup_ngram_stats

    df = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a b a b c",  # trigrams: aba bab aba bab abc → 3/5 uniq
                 "x y",            # too short for trigrams
                 "",
                 "w w w w"],       # trigrams: www www → dup frac 1/2
    })
    out = dup_ngram_stats(df)
    assert out["n_tokens"].tolist() == [7, 2, 0, 4]
    assert out.loc[0, "dup_trigram_frac"] == round(1 - 3 / 5, 6)
    assert out.loc[1, "dup_trigram_frac"] == 0.0
    assert out.loc[2, "dup_trigram_frac"] == 0.0
    assert out.loc[3, "dup_trigram_frac"] == 0.5
    # doc 1 bigrams: ab ba ab ba ab bc → top "a b" 3/6
    assert out.loc[0, "top_bigram_frac"] == 0.5
    assert out.loc[3, "top_bigram_frac"] == 1.0
    assert out.loc[2, "top_bigram_frac"] == 0.0


def test_stages_run_on_dataset():
    ds = ray.data.from_pandas(pd.DataFrame({"doc_id": [1, 2], "text": ["a b", "c d e"]}))
    assert ds.map_batches(token_stats, batch_format="pandas").count() == 2


def test_bigram_batch_boundaries():
    from dygiepp_ray.stages.text import bigram_batch

    df = pd.DataFrame({"doc_id": [1, 2, 3, 4],
                       "text": ["A b c", "", "x", "y z"]})
    out = bigram_batch(df)
    # no bigram crosses a document boundary; lowercased
    assert sorted(out["bigram"]) == ["a b", "b c", "y z"]


def test_bigram_counts_vs_pandas():
    from collections import Counter

    from dygiepp_ray.stages.text import bigram_counts

    texts = ["a b a b c", "b c b c", "a b", ""]
    want = Counter()
    for t in texts:
        ws = t.split()
        want.update(" ".join(ws[i:i + 2]) for i in range(len(ws) - 1))
    ds = ray.data.from_pandas(pd.DataFrame({"text": texts})).repartition(3)
    got = bigram_counts(ds, min_count=2, salt_buckets=4).to_pandas()
    want2 = {k: v for k, v in want.items() if v >= 2}
    assert dict(zip(got["bigram"], got["n"])) == want2


def test_heavy_hitters_exact_threshold():
    import numpy as np

    from dygiepp_ray.stages.text import heavy_hitters

    rng = np.random.RandomState(7)
    vals = np.concatenate([
        np.full(500, 1), np.full(300, 2), np.full(60, 3),
        rng.randint(100, 200, size=140),  # long tail
    ])
    rng.shuffle(vals)
    df = pd.DataFrame({"k": vals})
    ds = ray.data.from_pandas(df).repartition(5)
    got = heavy_hitters(ds, "k", k=10, m=16).to_pandas()
    total = len(df)
    exact = df["k"].value_counts()
    want = {int(k): int(v) for k, v in exact.items() if v * 10 > total}
    assert dict(zip(got["k"].astype(int), got["n"].astype(int))) == want


def test_tfidf_top_terms_exact():
    from dygiepp_ray.stages.text import tfidf_top_terms

    df = pd.DataFrame({
        "doc_id": [0, 1, 2],
        "text": ["apple apple banana", "banana cherry", "cherry apple date"],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    got = tfidf_top_terms(ds, top_n=2).to_pandas()
    # df: apple=2, banana=2, cherry=2, date=1 ; n_docs=3
    # doc 0: apple tf2 -> 2*3*1000//2=3000 ; banana 1500 -> top2 = apple, banana
    d0 = got[got["doc_id"] == 0].sort_values("score_scaled", ascending=False)
    assert list(d0["token"]) == ["apple", "banana"]
    assert list(d0["score_scaled"]) == [3000, 1500]
    # doc 2: all tf1: date 1*3*1000//1=3000, apple=cherry=1500 -> ties by token
    d2 = got[got["doc_id"] == 2]
    assert list(d2.sort_values(["score_scaled", "token"],
                               ascending=[False, True])["token"]) == \
        ["date", "apple"]


def test_ngram_lm_score_exact():
    import ray.data

    from dygiepp_ray.stages.text import ngram_lm_score

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["a b a b", "a b c", "x", ""],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    got = ngram_lm_score(ds).to_pandas().set_index("doc_id").sort_index()
    # corpus bigrams: a b:3, b a:1, b c:1 ; left counts: a:3, b:2
    # doc0: (ab,ba,ab) = 3e6//3 + 1e6//2... wait p(ab)=3*1e6//3=1e6,
    #   p(ba)=1*1e6//2=5e5 -> (1e6+5e5+1e6)//3 = 833333
    assert got.loc[0, "n_bigrams"] == 3
    assert got.loc[0, "lm_score"] == (1_000_000 + 500_000 + 1_000_000) // 3
    # doc1: p(ab)=1e6, p(bc)=1*1e6//2=5e5 -> 750000
    assert got.loc[1, "lm_score"] == 750_000
    # short/empty docs
    assert got.loc[2, "n_bigrams"] == 0 and got.loc[2, "lm_score"] == 0
    assert got.loc[3, "n_bigrams"] == 0 and got.loc[3, "lm_score"] == 0


def test_ngram_lm_score_trailing_empty_doc_same_block():
    # Regression (ADVICE r2): a zero-bigram doc LAST in a block used to pull
    # the reduceat start back one slot, stealing the previous doc's final
    # bigram probability. Both docs must land in ONE block to trigger it.
    import ray.data

    from dygiepp_ray.stages.text import ngram_lm_score

    df = pd.DataFrame({"doc_id": [0, 1], "text": ["a b c", "x"]})
    ds = ray.data.from_pandas(df)  # single block, no repartition
    got = ngram_lm_score(ds).to_pandas().set_index("doc_id").sort_index()
    # corpus: a b:1, b c:1 ; left: a:1, b:1 -> p=1e6 each -> mean 1e6
    assert got.loc[0, "n_bigrams"] == 2
    assert got.loc[0, "lm_score"] == 1_000_000
    assert got.loc[1, "lm_score"] == 0


def test_ngram_lm_score_join_path_parity():
    # Force the huge-vocab bucketed-join path (vocab_broadcast_limit=0) and
    # check it is bit-identical to the broadcast path, including extra_cols
    # passthrough and zero-bigram docs.
    import ray.data

    from dygiepp_ray.stages.text import ngram_lm_score

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4],
        "text": ["a b a b", "a b c", "x", "", "c a b c a"],
        "lang": ["en", "en", "fr", "fr", "en"],
    })
    ds = ray.data.from_pandas(df).repartition(3)
    cols = ["doc_id", "n_bigrams", "lang", "lm_score"]
    want = (ngram_lm_score(ds, extra_cols=("lang",))
            .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    got = (ngram_lm_score(ds, extra_cols=("lang",), vocab_broadcast_limit=0,
                          n_buckets=4)
           .to_pandas()[cols].sort_values("doc_id").reset_index(drop=True))
    pd.testing.assert_frame_equal(got, want)


def test_chunk_documents_offsets_and_overlap():
    import pandas as pd

    from dygiepp_ray.stages.text import chunk_documents

    toks = [f"t{i}" for i in range(50)]
    df = pd.DataFrame({"doc_id": [1, 2], "text": [" ".join(toks), ""]})
    out = chunk_documents(df, chunk_tokens=32, stride=24)
    # doc 2 is empty -> no chunks; doc 1: starts 0, 24, 48
    assert out["doc_id"].tolist() == [1, 1, 1]
    assert out["start_tok"].tolist() == [0, 24, 48]
    assert out["n_chunk_tokens"].tolist() == [32, 26, 2]
    # 8-token overlap between consecutive chunks
    c0 = out.loc[0, "chunk_text"].split()
    c1 = out.loc[1, "chunk_text"].split()
    assert c0[-8:] == c1[:8]
    assert out.loc[2, "chunk_text"] == "t48 t49"


def test_bm25_ranking_properties():
    import pandas as pd

    import ray.data
    from dygiepp_ray.stages.text import bm25_scores

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": [
            "scan scan scan scan",          # high tf, short
            "scan merge",                   # both terms
            "merge " + "filler " * 50,      # one term, long doc
            "nothing relevant here",        # no terms -> excluded
        ],
    })
    got = bm25_scores(
        ray.data.from_pandas(df).repartition(2), ("scan", "merge"),
        top_n=10,
    ).to_pandas()
    assert 3 not in got["doc_id"].tolist()
    scores = got.set_index("doc_id")["score"]
    # doc 1 matches both terms and beats the long single-term doc 2
    assert scores[1] > scores[2]
    # length normalization: doc 2's long filler depresses its score
    assert scores[0] > scores[2]


def test_tfidf_join_path_parity():
    # Force the huge-vocab bucketed-join path (df_broadcast_limit=0) and
    # check it matches the broadcast path row-for-row.
    import ray.data

    from dygiepp_ray.stages.text import tfidf_top_terms

    df = pd.DataFrame({
        "doc_id": [0, 1, 2, 3],
        "text": ["apple banana apple", "banana cherry", "apple cherry date",
                 ""],
    })
    ds = ray.data.from_pandas(df).repartition(2)
    cols = ["doc_id", "token", "tf", "df", "score_scaled"]

    def norm(d):
        return (d[cols].sort_values(cols).reset_index(drop=True))

    want = norm(tfidf_top_terms(ds, top_n=2).to_pandas())
    got = norm(tfidf_top_terms(ds, top_n=2, df_broadcast_limit=0).to_pandas())
    pd.testing.assert_frame_equal(got, want)


def test_gopher_stats_golden():
    import pandas as pd

    from dygiepp_ray.stages.text import gopher_stats

    batch = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": [
            # 2 lines, one bullet line, one ellipsis-end line
            "- the list starts here\nit continues to the end...",
            "# # # #",               # all symbol tokens, no alpha
            "",                       # empty doc: denominators clamp to 1
        ],
    })
    got = gopher_stats(batch).set_index("doc_id")
    r1 = got.loc[1]
    assert r1["n_words"] == 10 and r1["n_lines"] == 2
    assert r1["bullet_scaled"] == 500_000      # 1 of 2 lines
    assert r1["ellipsis_scaled"] == 500_000    # 1 of 2 lines
    assert r1["alpha_scaled"] == 900_000       # 9 of 10 tokens (not '-')
    assert r1["mwl_scaled"] == 4_000_000       # 40 chars / 10 words
    assert r1["stop_hits"] == 2                # {the, to}
    r2 = got.loc[2]
    assert r2["n_words"] == 4
    assert r2["symbol_scaled"] == 1_000_000
    assert r2["alpha_scaled"] == 0
    assert r2["keep"] == 0
    r3 = got.loc[3]
    assert r3["n_words"] == 0 and r3["n_lines"] == 1
    assert r3["mwl_scaled"] == 0 and r3["keep"] == 0


def test_term_drift_vs_pandas_and_invariance():
    import pandas as pd
    import ray

    from dygiepp_ray.stages.text import term_drift

    docs = pd.DataFrame({
        "doc_id": [0, 1, 2, 3, 4, 5],
        "text": ["aa bb aa", "aa cc", "bb bb aa", "cc cc cc aa",
                 "aa aa bb", "dd"],
    })

    # independent re-walk
    rows = []
    for _, r in docs.iterrows():
        for w in r["text"].lower().split():
            rows.append((w, r["doc_id"] % 2 == 0))
    t = pd.DataFrame(rows, columns=["term", "in_a"])
    tc = t.groupby("term").agg(
        n_a=("in_a", "sum"), n_b=("in_a", lambda s: int((~s).sum())))
    na, nb = int(tc["n_a"].sum()), int(tc["n_b"].sum())
    tc = tc[(tc["n_a"] + tc["n_b"]) >= 3]
    want = {
        ix: (int(r.n_a), int(r.n_b),
             int(r.n_a) * 1_000_000 // na, int(r.n_b) * 1_000_000 // nb)
        for ix, r in tc.iterrows()
    }
    assert want and any(v[0] != v[1] for v in want.values())

    for nparts in (1, 4):
        got = term_drift(
            ray.data.from_pandas(docs).repartition(nparts),
            min_count=3).to_pandas()
        got_d = {r.term: (int(r.n_a), int(r.n_b), int(r.rate_a_ppm),
                          int(r.rate_b_ppm)) for r in got.itertuples()}
        assert got_d == want
        assert all(int(r.drift_ppm) == int(r.rate_a_ppm) - int(r.rate_b_ppm)
                   for r in got.itertuples())


def test_oov_rate_vs_pandas_and_invariance():
    import pandas as pd
    import ray

    from dygiepp_ray.stages.text import oov_rate

    docs = pd.DataFrame({
        "source": ["a", "a", "b", "b", "b"],
        "text": ["x x y z", "x q", "y y x", "z z q r", "x"],
    })
    # top-3 vocab by (count desc, term asc): x(5) y(3) z(3) -> q,r OOV
    want = {
        "a": (6, 1, 1_000_000 // 6),
        "b": (8, 2, 2 * 1_000_000 // 8),
    }
    for nparts in (1, 4):
        got = oov_rate(ray.data.from_pandas(docs).repartition(nparts),
                       vocab_k=3).to_pandas()
        got_d = {r.source: (int(r.n_tokens), int(r.n_oov), int(r.oov_ppm))
                 for r in got.itertuples()}
        assert got_d == want


def test_span_corruption_conservation_and_invariance():
    import re

    import pandas as pd
    import ray

    from dygiepp_ray.stages.text import span_corruption

    docs = pd.DataFrame({
        "doc_id": [7, 12, 99],
        "text": [" ".join(f"t{i}" for i in range(30)),
                 " ".join(f"w{i}" for i in range(11)),
                 "short"],
    })
    outs = []
    for nparts in (1, 3):
        got = span_corruption(
            ray.data.from_pandas(docs).repartition(nparts)
        ).to_pandas().sort_values("doc_id").reset_index(drop=True)
        outs.append(got)
        for r in got.itertuples():
            orig = docs.loc[docs["doc_id"] == r.doc_id, "text"].iloc[0].split()
            sent = re.compile(r"<extra_id_\d+>")
            in_toks = r.input_text.split()
            tgt_toks = r.target_text.split()
            # sentinel sets agree and are consecutively numbered from 0
            s_in = [t for t in in_toks if sent.fullmatch(t)]
            s_tgt = [t for t in tgt_toks if sent.fullmatch(t)]
            assert s_in == s_tgt
            assert s_in == [f"<extra_id_{i}>" for i in range(len(s_in))]
            # token conservation: non-sentinel input + non-sentinel target
            # re-interleave to the original document
            kept = [t for t in in_toks if not sent.fullmatch(t)]
            masked = [t for t in tgt_toks if not sent.fullmatch(t)]
            assert int(r.n_masked) == len(masked)
            assert sorted(kept + masked) == sorted(orig)
    # deterministic across partitionings
    pd.testing.assert_frame_equal(outs[0], outs[1])
    # the long doc actually got masked
    assert int(outs[0].set_index("doc_id").loc[7, "n_masked"]) > 0


def test_readability_golden():
    from dygiepp_ray.stages.text import readability

    df = pd.DataFrame({
        "doc_id": [1, 2, 3],
        "text": ["The cat sat. On a mat!", "aaa eee iii", ""],
    })
    got = readability(df)
    # doc 1: 6 words, 2 sentence runs, vowel runs: e,a,a,o,a,a = 6
    r = got.iloc[0]
    assert (r.n_words, r.n_sents, r.n_syll) == (6, 2, 6)
    assert r.flesch_milli == 206835 - (1015 * 6) // 2 - (84600 * 6) // 6
    # doc 2: no sentence enders → clamp S=1
    r = got.iloc[1]
    assert (r.n_words, r.n_sents, r.n_syll) == (3, 1, 3)
    # empty text: all zero counts, W clamps to 1 in the divisor
    r = got.iloc[2]
    assert (r.n_words, r.n_sents, r.n_syll) == (0, 1, 0)
    assert r.flesch_milli == 206835


def test_type_token_ratio_golden():
    from dygiepp_ray.stages.text import type_token_ratio

    df = pd.DataFrame({
        "doc_id": [1, 2],
        "text": ["a b A b c", ""],
    })
    got = type_token_ratio(df)
    r = got.iloc[0]
    # lowercased: a b a b c → 5 tokens, 3 types
    assert (r.n_tokens, r.n_types) == (5, 3)
    assert r.ttr_ppm == 3 * 1_000_000 // 5
    r = got.iloc[1]
    assert (r.n_tokens, r.n_types, r.ttr_ppm) == (0, 0, 0)


def test_char_entropy_golden_and_bounds():
    import math

    from dygiepp_ray.stages.text import char_entropy

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["aaaa", "abcd", ""]})
    got = char_entropy(df)
    # uniform single char → H = 0 exactly (ln(4) term == 4·ln(4)//4)
    assert got.iloc[0].entropy_nano == 0
    # 4 distinct chars → H = ln(4) (cnt=1 terms are 0)
    assert got.iloc[1].entropy_nano == int(math.floor(math.log(4) * 1e9))
    assert got.iloc[2].entropy_nano == 0 and got.iloc[2].n_chars_e == 0
