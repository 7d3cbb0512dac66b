"""Arrow schemas and decode constants for the Ray-Data-native DyGIE++ engine.

The document model mirrors the reference's JSONL "SciERC format"
(/root/reference/dygie/data/dataset_readers/document.py:95-141, doc/data.md:15-73)
re-expressed as nested Arrow columns so whole documents travel as single rows
through `ray.data.Dataset` blocks (zero-copy `pyarrow` batches).

Decode constants pin the reference's beam / clamp / null-label semantics:
- max span width 8      (training_config/template.libsonnet:35)
- relation spans/word 0.5, ceil  (dygie/models/relation.py:112-131)
- trigger beam floor(0.3*len) clamped [1,15], argument beam floor(0.8*len)
  clamped [1,30]        (dygie/models/events.py:133-152)
- null label fixed at index 0 with score 0; predicted label = argmax-1
  (dygie/models/ner.py:74-147, relation.py:146-177)
- doc splitter max tokens 500 (document.py:184-236)
"""

from __future__ import annotations

import pyarrow as pa

# ---------------------------------------------------------------- constants
MAX_SPAN_WIDTH = 8            # template.libsonnet:35
MAX_TOKENS_PER_DOC = 500      # document.py:190
RELATION_SPANS_PER_WORD = 0.5  # relation.py:117 (ceil)
TRIGGER_BEAM_RATIO = 0.3      # events.py:133-138 (floor, clamp [1,15])
TRIGGER_BEAM_MIN, TRIGGER_BEAM_MAX = 1, 15
ARG_BEAM_RATIO = 0.8          # events.py:139-152 (floor, clamp [1,30])
ARG_BEAM_MIN, ARG_BEAM_MAX = 1, 30
FLOAT_ROUND_DECIMALS = 4      # document.py:10-11 format_float

# Label namespaces for the deterministic kernel (per-dataset namespaces mirror
# doc/multi-dataset.md; index 0 is always the null label — ner.py:95-101).
NER_LABELS = ["Method", "Task", "Material", "Metric", "Generic"]
RELATION_LABELS = ["USED-FOR", "PART-OF", "COMPARE", "FEATURE-OF", "EVALUATE-FOR", "HYPONYM-OF"]
EVENT_TYPES = ["movement_transport", "transaction_transfer", "contact_meet"]
ARG_ROLES = ["agent", "artifact", "destination"]

# ---------------------------------------------------------------- schemas
# North-rule input corpus (BASELINE.json input_hint).
CORPUS_SCHEMA = pa.schema(
    [
        ("repo", pa.string()),
        ("path", pa.string()),
        ("commit", pa.string()),
        ("lang", pa.string()),
        ("content", pa.string()),
    ]
)

_span = pa.struct([("start", pa.int32()), ("end", pa.int32()), ("label", pa.string())])
_pred_span = pa.struct(
    [
        ("start", pa.int32()),
        ("end", pa.int32()),
        ("label", pa.string()),
        ("raw_score", pa.float32()),
        ("softmax_score", pa.float32()),
    ]
)
_rel = pa.struct(
    [
        ("s1", pa.int32()),
        ("e1", pa.int32()),
        ("s2", pa.int32()),
        ("e2", pa.int32()),
        ("label", pa.string()),
    ]
)
_pred_rel = pa.struct(
    [
        ("s1", pa.int32()),
        ("e1", pa.int32()),
        ("s2", pa.int32()),
        ("e2", pa.int32()),
        ("label", pa.string()),
        ("raw_score", pa.float32()),
        ("softmax_score", pa.float32()),
    ]
)
_event = pa.struct(
    [
        ("trigger_tok", pa.int32()),
        ("event_type", pa.string()),
        ("args", pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32()), ("role", pa.string())]))),
    ]
)
_pred_event = pa.struct(
    [
        ("trigger_tok", pa.int32()),
        ("event_type", pa.string()),
        ("trig_raw_score", pa.float32()),
        ("trig_softmax_score", pa.float32()),
        ("args", pa.list_(
            pa.struct(
                [
                    ("start", pa.int32()),
                    ("end", pa.int32()),
                    ("role", pa.string()),
                    ("raw_score", pa.float32()),
                    ("softmax_score", pa.float32()),
                ]
            )
        )),
    ]
)

# Engine intermediate: one row per document (FIXTURES.md §2). Sentence-relative
# offsets inside nested lists; `sentence_starts` gives doc-level offsets
# (cumsum_shifted twin — document.py:113-117).
DOCUMENT_SCHEMA = pa.schema(
    [
        ("doc_key", pa.string()),
        ("dataset", pa.string()),
        ("sentences", pa.list_(pa.list_(pa.string()))),
        ("sentence_starts", pa.list_(pa.int32())),
        ("weight", pa.float32()),
        ("ner", pa.list_(pa.list_(_span))),
        ("relations", pa.list_(pa.list_(_rel))),
        ("events", pa.list_(pa.list_(_event))),
        ("clusters", pa.list_(pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32())])))),
        ("content_sha256", pa.string()),
        ("repo", pa.string()),
        ("path", pa.string()),
    ]
)

PREDICTED_COLUMNS = pa.schema(
    [
        ("predicted_ner", pa.list_(pa.list_(_pred_span))),
        ("predicted_relations", pa.list_(pa.list_(_pred_rel))),
        ("predicted_events", pa.list_(pa.list_(_pred_event))),
    ]
)

# Engine output: KB edge table (make_kb.py:180 header + engine additions).
TRIPLE_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("sentence", pa.string()),
        ("subj", pa.string()),
        ("obj", pa.string()),
        ("pred", pa.string()),
        ("subj_norm", pa.string()),
        ("obj_norm", pa.string()),
        ("conf", pa.float32()),
        ("content_sha256", pa.string()),
    ]
)
