"""Generic char-offset standoff → token-aligned document converter
(SURVEY.md §2.1 S7-S9: the shared shape of the reference's ACE / GENIA /
ChemProt converters — parse_ace_event.py, genia_xml_to_inline_sutd.py,
02_chemprot_to_input.py).

All three reference converters do the same core transform: character-offset
entity/relation annotations over raw text → tokenized, sentence-split
documents with TOKEN-aligned inclusive spans, DROPPING annotations that
don't align (the reference loses ~10% entities / ~20% relations on ChemProt
— README.md:77 — and skips cross-sentence spans). This module implements
that core; the format-specific XML/SGML parsing of each corpus is out of
engine scope.

Exposed both as pure functions and as a `map_batches` stage over rows
`(doc_key, text, entities, relations)` with entities =
list<struct<start_char, end_char, label>> and relations =
list<struct<e1, e2, label>> (indices into the entity list).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pyarrow as pa

from ..functions.strings import sentence_split, tokenize


@dataclass
class AlignmentReport:
    n_entities: int = 0
    n_entities_dropped: int = 0
    n_relations: int = 0
    n_relations_dropped: int = 0
    dropped_reasons: dict = field(default_factory=dict)

    def drop(self, kind: str, reason: str) -> None:
        if kind == "entity":
            self.n_entities_dropped += 1
        else:
            self.n_relations_dropped += 1
        self.dropped_reasons[reason] = self.dropped_reasons.get(reason, 0) + 1


def tokenize_with_offsets(text: str) -> tuple[list[list[str]], list[list[tuple[int, int]]]]:
    """Sentence-split + tokenize, tracking each token's (start_char, end_char)
    half-open char offsets in the ORIGINAL text."""
    sentences, offsets = [], []
    cursor = 0
    for sent in sentence_split(text):
        at = text.index(sent, cursor)
        toks = tokenize(sent)
        sent_offs = []
        tok_cursor = at
        for tok in toks:
            p = text.index(tok, tok_cursor)
            sent_offs.append((p, p + len(tok)))
            tok_cursor = p + len(tok)
        sentences.append(toks)
        offsets.append(sent_offs)
        cursor = at + len(sent)
    return sentences, offsets


def align_standoff(text: str, entities: list[dict], relations: list[dict],
                   report: AlignmentReport | None = None) -> dict:
    """Char-offset annotations → sentence-relative token spans.

    An entity aligns iff its char range starts at some token start and ends
    at some token end WITHIN ONE sentence; otherwise it is dropped (reference
    behavior). A relation survives iff both endpoints survived."""
    report = report if report is not None else AlignmentReport()
    sentences, offsets = tokenize_with_offsets(text)
    start_ix = {}  # char start → (sent, tok)
    end_ix = {}    # char end → (sent, tok)
    for si, sent_offs in enumerate(offsets):
        for ti, (s, e) in enumerate(sent_offs):
            start_ix[s] = (si, ti)
            end_ix[e] = (si, ti)

    ner: list[list[dict]] = [[] for _ in sentences]
    ent_loc: dict[int, tuple[int, int, int]] = {}
    for i, ent in enumerate(entities or []):
        report.n_entities += 1
        s_hit = start_ix.get(ent["start_char"])
        e_hit = end_ix.get(ent["end_char"])
        if s_hit is None or e_hit is None:
            report.drop("entity", "char_misaligned")
            continue
        if s_hit[0] != e_hit[0]:
            report.drop("entity", "cross_sentence")
            continue
        si, ts = s_hit
        _, te = e_hit
        ner[si].append({"start": ts, "end": te, "label": ent["label"]})
        ent_loc[i] = (si, ts, te)

    rels: list[list[dict]] = [[] for _ in sentences]
    for rel in relations or []:
        report.n_relations += 1
        a = ent_loc.get(rel["e1"])
        b = ent_loc.get(rel["e2"])
        if a is None or b is None:
            report.drop("relation", "endpoint_dropped")
            continue
        if a[0] != b[0]:
            report.drop("relation", "cross_sentence")
            continue
        rels[a[0]].append(
            {"s1": a[1], "e1": a[2], "s2": b[1], "e2": b[2], "label": rel["label"]}
        )
    return {"sentences": sentences, "ner": ner, "relations": rels}


def convert_standoff_batch(batch: pa.Table) -> pa.Table:
    """map_batches stage: standoff rows → document rows + per-row drop
    counters (the reference logs these corpus-wide; here they ride the row)."""
    from ..functions.strings import cumsum_shifted

    out = {"doc_key": [], "sentences": [], "sentence_starts": [], "ner": [],
           "relations": [], "n_entities_dropped": [], "n_relations_dropped": []}
    keys = batch.column("doc_key").to_pylist()
    texts = batch.column("text").to_pylist()
    ents = batch.column("entities").to_pylist()
    rels = batch.column("relations").to_pylist()
    for key, text, es, rs in zip(keys, texts, ents, rels):
        rep = AlignmentReport()
        doc = align_standoff(text, es, rs, rep)
        out["doc_key"].append(key)
        out["sentences"].append(doc["sentences"])
        out["sentence_starts"].append(
            cumsum_shifted([len(s) for s in doc["sentences"]])
        )
        out["ner"].append(doc["ner"])
        out["relations"].append(doc["relations"])
        out["n_entities_dropped"].append(rep.n_entities_dropped)
        out["n_relations_dropped"].append(rep.n_relations_dropped)
    ner_t = pa.list_(pa.list_(pa.struct(
        [("start", pa.int32()), ("end", pa.int32()), ("label", pa.string())])))
    rel_t = pa.list_(pa.list_(pa.struct(
        [("s1", pa.int32()), ("e1", pa.int32()), ("s2", pa.int32()),
         ("e2", pa.int32()), ("label", pa.string())])))
    return pa.table({
        "doc_key": pa.array(out["doc_key"], pa.string()),
        "sentences": pa.array(out["sentences"], pa.list_(pa.list_(pa.string()))),
        "sentence_starts": pa.array(out["sentence_starts"], pa.list_(pa.int32())),
        "ner": pa.array(out["ner"], ner_t),
        "relations": pa.array(out["relations"], rel_t),
        "n_entities_dropped": pa.array(out["n_entities_dropped"], pa.int32()),
        "n_relations_dropped": pa.array(out["n_relations_dropped"], pa.int32()),
    })
