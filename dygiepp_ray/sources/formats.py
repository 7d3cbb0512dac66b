"""Format-specific corpus converters (SURVEY.md §2.1 S7-S9): ACE APF XML,
GENIA XML, ChemProt TSV → the generic char-offset standoff shape
(sources/standoff.py), which then token-aligns with drop reporting.

Reference converters mirrored (semantics, not code):
- ChemProt: scripts/data/chemprot/02_chemprot_to_input.py:15-141 —
  text = title + " " + abstract; GENE-Y/GENE-N collapse to GENE
  (02_chemprot_to_input.py:26-28); relations reference Arg1:/Arg2: entity
  ids; entities that don't land on token boundaries are dropped and counted;
  a relation survives only if both endpoints align in one sentence.
- GENIA: scripts/data/genia/genia_xml_to_inline_sutd.py — nested <cons>
  terms walked in document order; constituents without `sem` belong to a
  discontinuous parent; coordinated terms (sem starting with "(") are
  DROPPED here (the converter's remove_disc/remove_over filters,
  genia_xml_to_inline_sutd.py:405-433); the five-type projection maps
  G#protein*/G#DNA*/G#RNA* / G#cell_line / G#cell_type and drops the rest.
- ACE: scripts/data/ace-event/parse_ace_event.py:421-547 — entity mention
  HEAD charseqs (inclusive END), event anchors + event_mention_argument
  REFID/ROLE; SGM text participates tag-stripped.

Each `parse_*` is a pure bytes/str → Arrow-rows function so it can run
inside `map_batches` over `ray.data.read_binary_files` — parsing scales with
the file count, nothing is parsed on the driver.
"""

from __future__ import annotations

import re
import xml.etree.ElementTree as ET
from collections import Counter

import pyarrow as pa

STANDOFF_ENT_T = pa.list_(pa.struct([("start_char", pa.int32()),
                                     ("end_char", pa.int32()),
                                     ("label", pa.string())]))
STANDOFF_REL_T = pa.list_(pa.struct([("e1", pa.int32()), ("e2", pa.int32()),
                                     ("label", pa.string())]))
STANDOFF_EVT_T = pa.list_(pa.struct([
    ("trigger_start", pa.int32()), ("trigger_end", pa.int32()),
    ("event_type", pa.string()),
    ("args", pa.list_(pa.struct([("e", pa.int32()), ("role", pa.string())]))),
]))


def _standoff_table(rows: list[dict], with_events: bool = False) -> pa.Table:
    cols = {
        "doc_key": pa.array([r["doc_key"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "entities": pa.array([r["entities"] for r in rows], STANDOFF_ENT_T),
        "relations": pa.array([r.get("relations", []) for r in rows], STANDOFF_REL_T),
    }
    if with_events:
        cols["events"] = pa.array([r.get("events", []) for r in rows], STANDOFF_EVT_T)
    return pa.table(cols)


# ---------------------------------------------------------------- ChemProt


def _read_tsv(text: str, n_cols: int) -> list[list[str]]:
    rows = []
    for line in text.splitlines():
        if not line.strip():
            continue
        parts = line.split("\t")
        if len(parts) < n_cols:
            parts += [""] * (n_cols - len(parts))
        rows.append(parts[:n_cols])
    return rows


_CHEMPROT_LABEL = {"GENE-Y": "GENE", "GENE-N": "GENE", "CHEMICAL": "CHEMICAL"}


def parse_chemprot(abstracts_tsv: str, entities_tsv: str,
                   relations_tsv: str) -> pa.Table:
    """ChemProt fold TSVs → standoff rows.

    abstracts: (doc_key, title, abstract); entities: (doc_key, entity_id,
    label, char_start, char_end, text); relations: (doc_key, cpr_group,
    eval_type, label, Arg1:<id>, Arg2:<id>) — the reference's column layout
    (02_chemprot_to_input.py:150-158). Offsets index into
    `title + " " + abstract`."""
    ents_by_doc: dict[str, list[list[str]]] = {}
    for parts in _read_tsv(entities_tsv, 6):
        ents_by_doc.setdefault(parts[0], []).append(parts)
    rels_by_doc: dict[str, list[list[str]]] = {}
    for parts in _read_tsv(relations_tsv, 6):
        rels_by_doc.setdefault(parts[0], []).append(parts)

    rows = []
    for doc_key, title, abstract in _read_tsv(abstracts_tsv, 3):
        text = f"{title} {abstract}"
        ent_index: dict[str, int] = {}
        entities = []
        for _, ent_id, label, start, end, _surface in ents_by_doc.get(doc_key, []):
            ent_index[ent_id] = len(entities)
            entities.append({
                "start_char": int(start), "end_char": int(end),
                "label": _CHEMPROT_LABEL.get(label, label),
            })
        relations = []
        for _, _grp, _ev, label, arg1, arg2 in rels_by_doc.get(doc_key, []):
            e1 = ent_index.get(arg1.replace("Arg1:", ""))
            e2 = ent_index.get(arg2.replace("Arg2:", ""))
            if e1 is None or e2 is None:
                continue
            relations.append({"e1": e1, "e2": e2, "label": label})
        rows.append({"doc_key": doc_key, "text": text,
                     "entities": entities, "relations": relations})
    return _standoff_table(rows)


# ------------------------------------------------------------------- GENIA

# The GENIA five-type projection (the converter's use_five_types filter).
_GENIA_FIVE = [
    ("G#protein", "protein"), ("G#DNA", "DNA"), ("G#RNA", "RNA"),
    ("G#cell_line", "cell_line"), ("G#cell_type", "cell_type"),
]


def _genia_five_type(sem: str) -> str | None:
    for prefix, label in _GENIA_FIVE:
        if sem.startswith(prefix):
            return label
    return None


def _walk_cons(elem, pos: int, out: list, counters: Counter) -> int:
    """Walk an element's content in document order, tracking char offsets;
    emits (start, end, sem) for every contiguous <cons>. Returns the offset
    just past the element's own content (caller accounts for its tail)."""
    if elem.text:
        pos += len(elem.text)
    for child in elem:
        child_start = pos
        pos = _walk_cons(child, pos, out, counters)
        if child.tag == "cons":
            sem = child.get("sem")
            if sem is None:
                # constituent of a discontinuous parent term
                counters["cons_no_sem"] += 1
            elif sem.startswith("("):
                # coordinated / discontinuous term — dropped (remove_over /
                # remove_disc semantics)
                counters["cons_coordinated_dropped"] += 1
            else:
                out.append((child_start, pos, sem))
        if child.tail:
            pos += len(child.tail)
    return pos


def parse_genia(xml_text: str, use_five_types: bool = True) -> pa.Table:
    """GENIA term-annotation XML → standoff rows (one per <article>).

    Document text is the article's sentences joined by a single space;
    nested <cons> terms become char-offset entities; coordinated terms and
    non-five-type sems are dropped with counters (the converter's
    filter_annotations semantics)."""
    root = ET.fromstring(xml_text)
    rows = []
    for article in root.iter("article"):
        bib = article.find(".//bibliomisc")
        doc_key = (bib.text or "").strip() if bib is not None else f"genia_{len(rows)}"
        pieces: list[str] = []
        entities: list[dict] = []
        counters: Counter = Counter()
        offset = 0
        for sentence in article.iter("sentence"):
            spans: list[tuple[int, int, str]] = []
            end = _walk_cons(sentence, 0, spans, counters)
            sent_text = "".join(sentence.itertext())
            assert len(sent_text) == end, (doc_key, sent_text)
            for (s, e, sem) in spans:
                label = _genia_five_type(sem) if use_five_types else sem
                if label is None:
                    counters["cons_type_filtered"] += 1
                    continue
                entities.append({"start_char": offset + s, "end_char": offset + e,
                                 "label": label})
            pieces.append(sent_text)
            offset += len(sent_text) + 1  # joining space
        rows.append({"doc_key": doc_key, "text": " ".join(pieces),
                     "entities": entities, "relations": []})
    return _standoff_table(rows)


# --------------------------------------------------------------------- ACE

_SGM_TAG_RE = re.compile(r"<[^>]*>")


def strip_sgm(sgm_text: str) -> str:
    """ACE source text with SGML tags removed — APF charseq offsets index
    into this stripped text."""
    return _SGM_TAG_RE.sub("", sgm_text)


def parse_ace_apf(sgm_text: str, apf_text: str, doc_key: str | None = None,
                  heads_only: bool = True) -> pa.Table:
    """One ACE document (source SGM + APF annotation XML) → a standoff row
    with entities, binary relations and events.

    Entity spans come from mention HEAD charseqs by default
    (parse_ace_event.py:421-431, --use_span_extent flips to extents); ACE
    charseq END is inclusive, so end_char = END + 1. Events keep their
    anchor span and (entity-ref, role) arguments; relations keep their two
    Arg-1/Arg-2 entity refs."""
    text = strip_sgm(sgm_text)
    root = ET.fromstring(apf_text)
    doc_el = root.find("document")
    key = doc_key or (doc_el.get("DOCID") if doc_el is not None else "ace_doc")
    field = "head" if heads_only else "extent"

    entities: list[dict] = []
    ent_index: dict[str, int] = {}
    for entity in root.iter("entity"):
        etype = entity.get("TYPE", "ENT")
        for mention in entity.findall("entity_mention"):
            seq = mention.find(f"{field}/charseq")
            if seq is None:
                continue
            ent_index[mention.get("ID")] = len(entities)
            entities.append({
                "start_char": int(seq.get("START")),
                "end_char": int(seq.get("END")) + 1,
                "label": etype,
            })

    relations: list[dict] = []
    for relation in root.iter("relation"):
        rtype = relation.get("TYPE", "REL")
        for mention in relation.findall("relation_mention"):
            args = {}
            for arg in mention.findall("relation_mention_argument"):
                args[arg.get("ROLE")] = ent_index.get(arg.get("REFID"))
            e1, e2 = args.get("Arg-1"), args.get("Arg-2")
            if e1 is None or e2 is None:
                continue
            relations.append({"e1": e1, "e2": e2, "label": rtype})

    events: list[dict] = []
    for event in root.iter("event"):
        etype = f"{event.get('TYPE', 'EVT')}.{event.get('SUBTYPE', '')}".rstrip(".")
        for mention in event.findall("event_mention"):
            anchor = mention.find("anchor/charseq")
            if anchor is None:
                continue
            args = []
            for arg in mention.findall("event_mention_argument"):
                ref = ent_index.get(arg.get("REFID"))
                if ref is None:
                    continue
                args.append({"e": ref, "role": arg.get("ROLE", "")})
            events.append({
                "trigger_start": int(anchor.get("START")),
                "trigger_end": int(anchor.get("END")) + 1,
                "event_type": etype,
                "args": args,
            })

    return _standoff_table(
        [{"doc_key": key, "text": text, "entities": entities,
          "relations": relations, "events": events}],
        with_events=True,
    )


# ------------------------------------------------- event-aware conversion


def convert_standoff_events_batch(batch: pa.Table) -> pa.Table:
    """Like sources.standoff.convert_standoff_batch, plus token alignment of
    the `events` column: an event survives iff its trigger aligns inside one
    sentence (the trigger token is the span's FIRST token, mirroring the
    single-token trigger convention, doc/data.md:59); an argument survives
    iff its entity aligned in the SAME sentence as the trigger."""
    from ..functions.strings import cumsum_shifted
    from .standoff import AlignmentReport, align_standoff, tokenize_with_offsets

    out = {"doc_key": [], "sentences": [], "sentence_starts": [], "ner": [],
           "relations": [], "events": [], "n_entities_dropped": [],
           "n_relations_dropped": [], "n_events_dropped": []}
    has_events = "events" in batch.column_names
    for i in range(batch.num_rows):
        key = batch.column("doc_key")[i].as_py()
        text = batch.column("text")[i].as_py()
        ents = batch.column("entities")[i].as_py() or []
        rels = batch.column("relations")[i].as_py() or []
        evts = (batch.column("events")[i].as_py() or []) if has_events else []
        rep = AlignmentReport()
        doc = align_standoff(text, ents, rels, rep)
        # rebuild the entity location map the aligner used (index-aligned)
        _sents, offsets = tokenize_with_offsets(text)
        start_ix = {s: (si, ti) for si, offs in enumerate(offsets)
                    for ti, (s, _e) in enumerate(offs)}
        end_ix = {e: (si, ti) for si, offs in enumerate(offsets)
                  for ti, (_s, e) in enumerate(offs)}
        ent_loc: dict[int, tuple[int, int, int]] = {}
        for j, ent in enumerate(ents):
            s_hit = start_ix.get(ent["start_char"])
            e_hit = end_ix.get(ent["end_char"])
            if s_hit and e_hit and s_hit[0] == e_hit[0]:
                ent_loc[j] = (s_hit[0], s_hit[1], e_hit[1])
        evt_out: list[list[dict]] = [[] for _ in doc["sentences"]]
        n_evt_dropped = 0
        for ev in evts:
            t_hit = start_ix.get(ev["trigger_start"])
            if t_hit is None:
                n_evt_dropped += 1
                continue
            si, trig_tok = t_hit
            args = []
            for a in ev["args"] or []:
                loc = ent_loc.get(a["e"])
                if loc is None or loc[0] != si:
                    continue
                args.append({"start": loc[1], "end": loc[2], "role": a["role"]})
            evt_out[si].append({"trigger_tok": trig_tok,
                                "event_type": ev["event_type"], "args": args})
        out["doc_key"].append(key)
        out["sentences"].append(doc["sentences"])
        out["sentence_starts"].append(cumsum_shifted([len(s) for s in doc["sentences"]]))
        out["ner"].append(doc["ner"])
        out["relations"].append(doc["relations"])
        out["events"].append(evt_out)
        out["n_entities_dropped"].append(rep.n_entities_dropped)
        out["n_relations_dropped"].append(rep.n_relations_dropped)
        out["n_events_dropped"].append(n_evt_dropped)

    ner_t = pa.list_(pa.list_(pa.struct(
        [("start", pa.int32()), ("end", pa.int32()), ("label", pa.string())])))
    rel_t = pa.list_(pa.list_(pa.struct(
        [("s1", pa.int32()), ("e1", pa.int32()), ("s2", pa.int32()),
         ("e2", pa.int32()), ("label", pa.string())])))
    evt_t = pa.list_(pa.list_(pa.struct(
        [("trigger_tok", pa.int32()), ("event_type", pa.string()),
         ("args", pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32()),
                                      ("role", pa.string())])))])))
    return pa.table({
        "doc_key": pa.array(out["doc_key"], pa.string()),
        "sentences": pa.array(out["sentences"], pa.list_(pa.list_(pa.string()))),
        "sentence_starts": pa.array(out["sentence_starts"], pa.list_(pa.int32())),
        "ner": pa.array(out["ner"], ner_t),
        "relations": pa.array(out["relations"], rel_t),
        "events": pa.array(out["events"], evt_t),
        "n_entities_dropped": pa.array(out["n_entities_dropped"], pa.int32()),
        "n_relations_dropped": pa.array(out["n_relations_dropped"], pa.int32()),
        "n_events_dropped": pa.array(out["n_events_dropped"], pa.int32()),
    })


# ----------------------------------------------------------- Ray wrappers


def read_genia(paths, use_five_types: bool = True) -> "ray.data.Dataset":
    """GENIA XML files → token-aligned document rows; parsing runs inside
    map_batches over read_binary_files (one task per file group)."""
    import ray.data

    from .standoff import convert_standoff_batch

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_genia(b.decode("utf-8"), use_five_types)
                  for b in batch.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else parse_genia("<set/>")

    return (
        ray.data.read_binary_files(paths)
        .map_batches(parse, batch_format="pyarrow")
        .map_batches(convert_standoff_batch, batch_format="pyarrow")
    )


def read_chemprot(abstracts_path: str, entities_path: str,
                  relations_path: str) -> "ray.data.Dataset":
    """ChemProt fold → token-aligned document rows. The three TSVs are one
    fold (small side); rows fan out as a Dataset for the aligner stage."""
    import ray.data

    from .standoff import convert_standoff_batch

    with open(abstracts_path) as fa, open(entities_path) as fe, open(relations_path) as fr:
        table = parse_chemprot(fa.read(), fe.read(), fr.read())
    return ray.data.from_arrow(table).map_batches(
        convert_standoff_batch, batch_format="pyarrow"
    )


def read_ace(doc_pairs: list[tuple[str, str]],
             heads_only: bool = True) -> "ray.data.Dataset":
    """ACE corpus: list of (sgm_path, apf_path) pairs → event-aware aligned
    document rows; each pair parses inside the mapper."""
    import ray.data

    paths = pa.table({
        "sgm": pa.array([p[0] for p in doc_pairs], pa.string()),
        "apf": pa.array([p[1] for p in doc_pairs], pa.string()),
    })

    def parse(batch: pa.Table) -> pa.Table:
        tables = []
        for sgm_path, apf_path in zip(batch.column("sgm").to_pylist(),
                                      batch.column("apf").to_pylist()):
            with open(sgm_path) as fs, open(apf_path) as fa:
                tables.append(parse_ace_apf(fs.read(), fa.read()))
        return pa.concat_tables(tables)

    return (
        ray.data.from_arrow(paths)
        .map_batches(parse, batch_format="pyarrow")
        .map_batches(convert_standoff_events_batch, batch_format="pyarrow")
    )
