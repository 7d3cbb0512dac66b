"""Char-offset standoff converter (S7-S9 core transform)."""

import pyarrow as pa

import ray.data

from dygiepp_ray.sources.standoff import (
    AlignmentReport,
    align_standoff,
    convert_standoff_batch,
    tokenize_with_offsets,
)

TEXT = "The parser uses beam search. It improves accuracy."
#       0123456789012345678901234567
# tokens sent0: The(0-3) parser(4-10) uses(11-15) beam(16-20) search(21-27) .(27-28)
# sent1 starts at 29: It(29-31) improves(32-40) accuracy(41-49) .(49-50)


def test_tokenize_with_offsets_roundtrip():
    sents, offs = tokenize_with_offsets(TEXT)
    assert sents[0][:2] == ["The", "parser"]
    for sent, sent_offs in zip(sents, offs):
        for tok, (s, e) in zip(sent, sent_offs):
            assert TEXT[s:e] == tok


def test_align_entities_and_relations():
    entities = [
        {"start_char": 4, "end_char": 10, "label": "Method"},    # "parser"
        {"start_char": 16, "end_char": 27, "label": "Method"},   # "beam search"
        {"start_char": 41, "end_char": 49, "label": "Metric"},   # "accuracy"
    ]
    relations = [{"e1": 1, "e2": 0, "label": "USED-FOR"}]
    doc = align_standoff(TEXT, entities, relations)
    assert doc["ner"][0] == [
        {"start": 1, "end": 1, "label": "Method"},
        {"start": 3, "end": 4, "label": "Method"},
    ]
    assert doc["ner"][1] == [{"start": 2, "end": 2, "label": "Metric"}]
    assert doc["relations"][0] == [
        {"s1": 3, "e1": 4, "s2": 1, "e2": 1, "label": "USED-FOR"}
    ]


def test_misaligned_and_cross_sentence_dropped():
    rep = AlignmentReport()
    entities = [
        {"start_char": 5, "end_char": 10, "label": "X"},   # mid-token start
        {"start_char": 21, "end_char": 31, "label": "X"},  # crosses sentences
        {"start_char": 4, "end_char": 10, "label": "OK"},
    ]
    relations = [{"e1": 0, "e2": 2, "label": "R"}]  # endpoint dropped
    doc = align_standoff(TEXT, entities, relations, rep)
    assert rep.n_entities_dropped == 2
    assert rep.n_relations_dropped == 1
    assert rep.dropped_reasons["char_misaligned"] == 1
    assert rep.dropped_reasons["cross_sentence"] == 1
    assert sum(len(s) for s in doc["ner"]) == 1


def test_batch_stage_over_dataset():
    ent_t = pa.list_(pa.struct([("start_char", pa.int32()), ("end_char", pa.int32()),
                                ("label", pa.string())]))
    rel_t = pa.list_(pa.struct([("e1", pa.int32()), ("e2", pa.int32()),
                                ("label", pa.string())]))
    t = pa.table({
        "doc_key": ["d1"],
        "text": [TEXT],
        "entities": pa.array([[{"start_char": 4, "end_char": 10, "label": "Method"}]], ent_t),
        "relations": pa.array([[]], rel_t),
    })
    out = ray.data.from_arrow(t).map_batches(
        convert_standoff_batch, batch_format="pyarrow"
    ).to_pandas()
    assert out.loc[0, "n_entities_dropped"] == 0
    assert list(out.loc[0, "sentence_starts"]) == [0, 6]
