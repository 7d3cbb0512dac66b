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
