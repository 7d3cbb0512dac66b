"""String / scalar kernels (SURVEY.md §2.8, F1-F13).

All functions here are deterministic, dependency-free (no spaCy/NLTK in this
container) and written so the hot-path versions are vectorizable inside
`map_batches`. The canonicalizer reproduces the reference's entity-key
construction — punctuation strip → lowercase → stopword filter → lemmatize —
from scripts/eval/make_kb.py:90-95, with a rule-based noun lemmatizer standing
in for WordNet (same default-POS="n" behavior: only nominal plural endings are
reduced).
"""

from __future__ import annotations

import hashlib
import re

# Compact stopword list (subset of spaCy's defaults that matters for the
# synthetic corpora; fixed so the DuckDB oracle can inline it verbatim).
STOPWORDS = (
    "a an the and or of to in for on with is are was were be been this that "
    "these those it its by as at from we our which"
).split()
_STOP = frozenset(STOPWORDS)

# ASCII-anchored: the DuckDB oracles' character classes ([^a-z0-9_\s], \s)
# are ASCII, so Unicode word characters must strip identically on both sides
_PUNCT_RE = re.compile(r"[^\w\s]", re.ASCII)
_WS_RE = re.compile(r"\s+", re.ASCII)
_TOKEN_RE = re.compile(r"\w+(?:'\w+)?|[^\w\s]")
_SENT_SPLIT_RE = re.compile(r"(?<=[.!?])\s+|\n{2,}")

REFERENCE_WORDS = frozenset(["they", "it", "these", "those", "that", "this"])  # make_kb.py:105-111


def lemmatize_noun(word: str) -> str:
    """Rule-based stand-in for WordNet's default (noun) lemmatizer.

    Handles the regular English plural inflections: -ies→-y, -sses→-ss,
    -shes/-ches/-xes/-zes→strip es, -s→strip s (not -ss/-us/-is).
    Deterministic and reimplementable in ANSI SQL for the oracle.
    """
    if len(word) > 3 and word.endswith("ies"):
        return word[:-3] + "y"
    if len(word) > 4 and word.endswith(("sses", "shes", "ches", "xes", "zes")):
        return word[:-2]
    if len(word) > 3 and word.endswith("s") and not word.endswith(("ss", "us", "is")):
        return word[:-1]
    return word


def filter_stopwords(tokens: list[str]) -> list[str]:
    """F7 — eval_utils.py:183-184, make_kb.py:72-73."""
    return [t for t in tokens if t not in _STOP]


def canonicalize(text: str) -> str:
    """F8 `get_representation_string` — make_kb.py:90-95.

    punct-strip → lower → stopword-filter → per-token lemmatize → join.
    """
    text = _PUNCT_RE.sub("", text).lower()
    toks = filter_stopwords(text.split())
    return " ".join(lemmatize_noun(t) for t in toks)


def normalize_surface(text: str) -> str:
    """Punct-strip + lower + whitespace collapse (the SQL-expressible prefix
    of `canonicalize`; used where a DuckDB oracle must match exactly)."""
    return _WS_RE.sub(" ", _PUNCT_RE.sub("", text).lower()).strip()


def contains_reference(text: str) -> bool:
    """F9 `check_contains_refrence` — make_kb.py:105-111."""
    return any(p in REFERENCE_WORDS for p in text.split())


def exact_match(a: str, b: str) -> bool:
    """F1 — eval_utils.py:180-181."""
    return a.strip().lower() == b.strip().lower()


def substring_match(a: str, b: str) -> bool:
    """F2 — eval_utils.py:213-215."""
    a, b = a.strip().lower(), b.strip().lower()
    return a in b or b in a


def jaccard(a: str, b: str) -> float:
    """F3 — eval_utils.py:174-178 (token-set Jaccard)."""
    sa, sb = set(a.lower().split()), set(b.lower().split())
    if not sa and not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def head_token(text: str) -> str:
    """F4 stand-in — the reference uses the spaCy dep-parse ROOT
    (eval_utils.py:220-226); with no parser in this environment we use the
    right-headed-compound rule: the LAST non-stopword token (correct for the
    noun phrases these KBs contain: 'hash join' → 'join')."""
    toks = [t for t in text.lower().split() if t not in _STOP]
    return toks[-1] if toks else ""


def head_match(a: str, b: str) -> bool:
    """F4 — head-token equality."""
    ha, hb = head_token(a), head_token(b)
    return bool(ha) and ha == hb


def _lcs_len(a: list[str], b: list[str]) -> int:
    # O(len(a)*len(b)) DP, single-row
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0]
        for j, y in enumerate(b, 1):
            cur.append(prev[j - 1] + 1 if x == y else max(prev[j], cur[-1]))
        prev = cur
    return prev[-1]


def rouge_l_f(a: str, b: str, beta: float = 1.2) -> float:
    """F5 — ROUGE-L F-measure (Lin 2004): LCS over whitespace tokens,
    P = LCS/|b|, R = LCS/|a|, F = (1+β²)PR / (R + β²P)."""
    ta, tb = a.lower().split(), b.lower().split()
    lcs = _lcs_len(ta, tb)
    if lcs == 0:
        return 0.0
    p, r = lcs / len(tb), lcs / len(ta)
    return (1 + beta * beta) * p * r / (r + beta * beta * p)


def refind_span(span: str) -> str:
    """F10 — eval_metrics.py:31-39: lowercase, strip a leading article
    ('a '/'the '), drop stray bracket/dash-space sequences."""
    span = span.lower()
    if span.startswith("a "):
        span = span[2:]
    if span.startswith("the "):
        span = span[4:]
    return span.replace(") ", " ").replace("- ", " ").replace("( ", " ")


def partial_span_score(a: str, b: str) -> float:
    """F10 — eval_metrics.py:42-56: multiset common-token count over the
    LONGER span's token count (threshold 0.3 applied by callers)."""
    ta = refind_span(a).split(" ")
    tb = refind_span(b).split(" ")
    max_length = max(len(ta), len(tb))
    common = [x for x in ta if x in tb]
    return float(len(common) / max_length)


def word_normalize(token: str) -> str:
    """P2 — dygie/data/dataset_readers/dygie.py:205-210 (`/.`→`.`, `/?`→`?`)."""
    if token == "/.":
        return "."
    if token == "/?":
        return "?"
    return token


def tokenize(text: str) -> list[str]:
    """Deterministic regex tokenizer (spaCy stand-in for P1)."""
    return _TOKEN_RE.findall(text)


def sentence_split(text: str) -> list[str]:
    """Deterministic sentence splitter: on terminal punctuation or blank line."""
    parts = [p.strip() for p in _SENT_SPLIT_RE.split(text)]
    return [p for p in parts if p]


def sha256_hex(text: str) -> str:
    """Per-row content invariant (north rule)."""
    return hashlib.sha256(text.encode("utf-8")).hexdigest()


def format_float(x: float) -> float:
    """F11 — document.py:10-11."""
    return round(float(x), 4)


def round_half_up(x, nd: int):
    """Half-away-from-zero rounding matching DuckDB's round(DOUBLE, n) —
    numpy's .round() is banker's, which flips the last digit at .5 boundaries
    and breaks value-hash equality with SQL oracles. Works on scalars, numpy
    arrays and pandas Series."""
    import numpy as np

    s = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s


def cumsum_shifted(lengths: list[int]) -> list[int]:
    """F12 — exclusive prefix sum (document.py:113-117)."""
    out, acc = [], 0
    for n in lengths:
        out.append(acc)
        acc += n
    return out


def stable_hash64(text: str) -> int:
    """Seed-stable 64-bit hash (unlike Python's randomized `hash`)."""
    return int.from_bytes(hashlib.blake2b(text.encode("utf-8"), digest_size=8).digest(), "big")


def fields_to_batches(d: dict) -> list[dict]:
    """F13 — dict-of-lists → list-of-dicts (shared.py:28-47)."""
    keys = list(d.keys())
    lengths = {len(v) for v in d.values()}
    assert len(lengths) == 1, "all fields must have equal length"
    n = lengths.pop()
    return [{k: d[k][i] for k in keys} for i in range(n)]


def batches_to_fields(rows: list[dict]) -> dict:
    """F13 inverse — shared.py:49-63."""
    if not rows:
        return {}
    return {k: [r[k] for r in rows] for k in rows[0]}
