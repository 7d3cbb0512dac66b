"""String/scalar kernels (SURVEY.md §2.8 F1-F13)."""

from dygiepp_ray.functions.strings import (
    batches_to_fields,
    canonicalize,
    contains_reference,
    cumsum_shifted,
    exact_match,
    fields_to_batches,
    filter_stopwords,
    format_float,
    jaccard,
    lemmatize_noun,
    normalize_surface,
    round_half_up,
    sentence_split,
    sha256_hex,
    substring_match,
    tokenize,
    word_normalize,
)


def test_canonicalize_punct_stop_lemma():
    # make_kb.py:90-95 chain: punct → lower → stopwords → lemma
    assert canonicalize("The Hash-Joins!") == "hashjoin"  # punct removed first
    assert canonicalize("the queries of systems") == "query system"
    assert canonicalize("These  Bloom   filters") == "bloom filter"
    assert canonicalize("") == ""
    assert canonicalize("the of and") == ""


def test_lemmatizer_rules():
    assert lemmatize_noun("queries") == "query"
    assert lemmatize_noun("classes") == "class"
    assert lemmatize_noun("batches") == "batch"
    assert lemmatize_noun("boxes") == "box"
    assert lemmatize_noun("tables") == "table"
    assert lemmatize_noun("class") == "class"      # -ss kept
    assert lemmatize_noun("corpus") == "corpus"    # -us kept
    assert lemmatize_noun("analysis") == "analysis"  # -is kept
    assert lemmatize_noun("gas") == "gas"          # len<=3 kept


def test_match_functions():
    assert exact_match(" Hash Join ", "hash join")
    assert substring_match("join", "hash join")
    assert substring_match("hash join", "join")
    assert not substring_match("sort", "hash join")
    assert jaccard("a b c", "b c d") == 2 / 4
    assert jaccard("", "") == 0.0


def test_reference_words():
    assert contains_reference("this approach")
    assert contains_reference("we like it")
    assert not contains_reference("the system")


def test_word_normalize():
    assert word_normalize("/.") == "."
    assert word_normalize("/?") == "?"
    assert word_normalize("plain") == "plain"


def test_tokenize_and_sentences():
    assert tokenize("hash-join works.") == ["hash", "-", "join", "works", "."]
    assert sentence_split("One. Two!  Three?\n\nFour") == ["One.", "Two!", "Three?", "Four"]


def test_stopword_filter():
    assert filter_stopwords(["the", "hash", "of", "join"]) == ["hash", "join"]


def test_cumsum_shifted():
    assert cumsum_shifted([3, 2, 4]) == [0, 3, 5]
    assert cumsum_shifted([]) == []


def test_fields_batches_roundtrip():
    rows = [{"a": 1, "b": "x"}, {"a": 2, "b": "y"}]
    assert fields_to_batches(batches_to_fields(rows)) == rows


def test_format_float():
    assert format_float(0.123456) == 0.1235


def test_round_half_up_matches_duckdb():
    import duckdb

    con = duckdb.connect()
    for x, nd in [(0.5532245, 6), (2.675, 2), (0.1234565, 6), (1.0 / 3.0, 6)]:
        want = con.execute(f"select round({x!r}::DOUBLE, {nd})").fetchone()[0]
        assert round_half_up(x, nd) == want, (x, nd)


def test_sha256_stable():
    assert sha256_hex("abc").startswith("ba7816bf")
