"""Document-prep stages (P1-P4, P15) without Ray — pure batch functions."""

import pyarrow as pa

from dygiepp_ray.corpus import generate_corpus
from dygiepp_ray.schema import MAX_TOKENS_PER_DOC
from dygiepp_ray.stages.prep import (
    corpus_to_documents,
    extract_text,
    split_document,
    split_long_documents,
    stamp_sha256,
)


def test_extract_text_python():
    src = 'def f():\n    """Doc line one."""\n# a comment\nx = 1\n'
    text = extract_text(src, "python")
    assert "Doc line one." in text and "a comment" in text and "x = 1" not in text


def test_extract_text_slash_and_markdown():
    assert extract_text("// note here\ncode();\n", "java") == "note here"
    assert extract_text("plain prose\n", "markdown") == "plain prose\n"


def test_corpus_to_documents_keys_and_offsets():
    t = generate_corpus(20, seed=1)
    docs = corpus_to_documents(stamp_sha256(t))
    assert docs.num_rows > 0
    keys = docs.column("doc_key").to_pylist()
    assert len(set(keys)) == len(keys)
    sents = docs.column("sentences").to_pylist()[0]
    starts = docs.column("sentence_starts").to_pylist()[0]
    assert starts[0] == 0
    acc = 0
    for s, st in zip(sents, starts):
        assert st == acc
        acc += len(s)


def test_split_document_greedy():
    sentences = [["w"] * 200, ["w"] * 200, ["w"] * 200, ["w"] * 50]
    chunks = split_document("doc", sentences, max_tokens=500)
    assert [k for k, _ in chunks] == ["doc_SPLIT_0", "doc_SPLIT_1"]
    assert [sum(len(s) for s in c) for _, c in chunks] == [400, 250]
    # under the cap → key unchanged, single chunk
    assert split_document("d2", [["w"] * 10]) == [("d2", [["w"] * 10])]


def test_split_long_documents_flatmap():
    t = generate_corpus(60, seed=42)
    docs = corpus_to_documents(stamp_sha256(t))
    out = split_long_documents(docs)
    assert out.num_rows >= docs.num_rows
    for sents in out.column("sentences").to_pylist():
        assert sum(len(s) for s in sents) <= MAX_TOKENS_PER_DOC


def test_sha256_column_matches_content():
    import hashlib

    t = stamp_sha256(generate_corpus(5, seed=3))
    for content, sha in zip(t.column("content").to_pylist(),
                            t.column("content_sha256").to_pylist()):
        assert sha == hashlib.sha256(content.encode()).hexdigest()


def test_empty_doc_dropped():
    t = pa.table(
        {
            "repo": ["r"], "path": ["p"], "commit": ["c" * 40],
            "lang": ["python"], "content": ["x = 1\n"],  # no prose at all
        }
    )
    docs = corpus_to_documents(stamp_sha256(t))
    assert docs.num_rows == 0
