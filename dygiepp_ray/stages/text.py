"""Text-analysis operators over a `documents(doc_id, text, ...)` table.

Large-scale training-data-pipeline primitives: token counting, quality
scoring, language ID, document fingerprinting. All are stateless vectorized
`map_batches` stages (pandas string kernels / numpy); the language-ID stage is
an actor-pool class so its per-language profiles load once per worker.

Token convention for the SQL-checkable ops: WHITESPACE tokens
(`regexp_split_to_array(text, '\\s+')` in the DuckDB oracle) — simpler than
the KG tokenizer on purpose so Ray and SQL agree bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from ..functions.strings import STOPWORDS, normalize_surface, round_half_up

_STOP = frozenset(STOPWORDS)


def token_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_tokens, n_chars, avg_token_len) — whitespace tokens."""
    toks = batch["text"].str.split()
    n_tokens = toks.str.len().astype("int64")
    n_chars = batch["text"].str.len().astype("int64")
    tok_chars = toks.map(lambda ws: sum(len(w) for w in ws))
    out = pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n_tokens,
            "n_chars": n_chars,
            "avg_token_len": round_half_up(tok_chars / n_tokens.clip(lower=1), 6),
        }
    )
    return out


def quality_score(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_tokens, stop_ratio, uniq_ratio, quality) — length /
    stopword / repetition heuristics (C4/Gopher-style rules, simplified)."""
    toks = batch["text"].str.lower().str.split()
    n = toks.str.len().astype("int64")
    n_stop = toks.map(lambda ws: sum(w in _STOP for w in ws))
    n_uniq = toks.map(lambda ws: len(set(ws)))
    stop_ratio = round_half_up(n_stop / n.clip(lower=1), 6)
    uniq_ratio = round_half_up(n_uniq / n.clip(lower=1), 6)
    # quality in [0,1]: enough tokens, some stopwords, low repetition
    quality = round_half_up(
        (
            (n.clip(upper=100) / 100.0) * 0.4
            + stop_ratio.clip(upper=0.4) * 0.5
            + uniq_ratio * 0.4
        ).clip(upper=1.0),
        6,
    )
    return pd.DataFrame(
        {
            "doc_id": batch["doc_id"],
            "n_tokens": n,
            "stop_ratio": stop_ratio,
            "uniq_ratio": uniq_ratio,
            "quality": quality,
        }
    )


def normalize_text(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, norm) — punct-strip + lower + whitespace collapse (the
    SQL-expressible prefix of the canonicalizer)."""
    return pd.DataFrame(
        {"doc_id": batch["doc_id"], "norm": batch["text"].map(normalize_surface)}
    )


# -- language ID -------------------------------------------------------------

# character/word profiles per language: tiny deterministic n-gram heuristic.
_LANG_MARKERS: dict[str, frozenset[str]] = {
    "en": frozenset("the and of to is are was with for that".split()),
    "fr": frozenset("le la les des et est une pour dans que".split()),
    "es": frozenset("el los las es una por para con del como".split()),
    "de": frozenset("der die das und ist mit für ein nicht von".split()),
    "zh": frozenset(),  # fallback: CJK codepoint ratio
}


class LangId:
    """Actor-pool stage: (doc_id, lang_pred, lang_conf). Marker-word voting
    with a CJK-codepoint fallback; deterministic ties broken by language code."""

    def __init__(self):
        self.markers = _LANG_MARKERS

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        langs, confs = [], []
        for text in batch["text"]:
            toks = text.lower().split()
            n = max(1, len(toks))
            cjk = sum(1 for ch in text if "一" <= ch <= "鿿")
            if cjk > 0.2 * len(text):
                langs.append("zh")
                confs.append(float(round_half_up(cjk / max(1, len(text)), 6)))
                continue
            scores = {
                lang: sum(t in marks for t in toks) / n
                for lang, marks in self.markers.items()
                if marks
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            langs.append(best if scores[best] > 0 else "unknown")
            confs.append(float(round_half_up(scores[best], 6)))
        return pd.DataFrame({"doc_id": batch["doc_id"], "lang_pred": langs, "lang_conf": confs})


# GPT-2-style pre-tokenizer classes, lookahead-free so the identical pattern
# runs under both Python `re` and DuckDB's RE2 (`regexp_extract_all`); char
# classes are explicit-ASCII so `\s` unicode differences can't split the
# oracle (ADVICE round-1 lesson).
BPE_SPLIT_RE = r" ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9 \t\n\r\f]+|[ \t\n\r\f]+"
_ALPHA_RE = r"[A-Za-z]+"
_NUM_RE = r"[0-9]+"
_PUNCT_RE = r"[^A-Za-z0-9 \t\n\r\f]+"


def token_count_bpe(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_bpe, n_alpha, n_num, n_punct) — BPE-ish pre-tokenizer
    counts: n_bpe = segments under the GPT-2-style split regex (a proxy for
    subword-token budget planning); the rest are maximal-run counts per
    class. Vectorized via pandas str.count (compiled regex, no Python loop)."""
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_bpe": batch["text"].str.count(BPE_SPLIT_RE).astype("int64"),
        "n_alpha": batch["text"].str.count(_ALPHA_RE).astype("int64"),
        "n_num": batch["text"].str.count(_NUM_RE).astype("int64"),
        "n_punct": batch["text"].str.count(_PUNCT_RE).astype("int64"),
    })


def dup_ngram_stats(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, n_tokens, dup_trigram_frac, top_bigram_frac) — Gopher-style
    repetition signals over whitespace tokens: fraction of trigram
    occurrences that are repeats of an earlier trigram, and the share of the
    most frequent bigram among all bigrams (0.0 when the doc is too short)."""
    from collections import Counter

    n_toks, dup3, top2 = [], [], []
    for text in batch["text"]:
        t = text.split()
        n_toks.append(len(t))
        tris = [" ".join(t[i:i + 3]) for i in range(len(t) - 2)]
        dup3.append(1.0 - len(set(tris)) / len(tris) if tris else 0.0)
        bis = Counter(" ".join(t[i:i + 2]) for i in range(len(t) - 1))
        top2.append(max(bis.values()) / sum(bis.values()) if bis else 0.0)
    return pd.DataFrame({
        "doc_id": batch["doc_id"],
        "n_tokens": pd.array(n_toks, dtype="int64"),
        "dup_trigram_frac": round_half_up(np.asarray(dup3), 6),
        "top_bigram_frac": round_half_up(np.asarray(top2), 6),
    })


_FP_B = np.uint64(1000003)
_FP_H0 = np.uint64(1469598103934665603)


def fingerprint(batch: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, fp64) — rolling (Rabin-style) polynomial hash over whitespace
    tokens (each token's UTF-8 bytes followed by a 0x20 separator), i.e.
    h = h0*B^n + Σ byte_i * B^(n-1-i)  (mod 2^64).

    Vectorized: the Horner recurrence is expanded into a power-weighted dot
    product per document (numpy uint64 wraps mod 2^64 like the scalar loop);
    no per-byte Python. The per-byte loop twin lives in the oracle module."""
    fps = []
    for text in batch["text"]:
        toks = text.split()
        if not toks:
            fps.append(int(_FP_H0))
            continue
        data = b" ".join(t.encode("utf-8") for t in toks) + b" "
        arr = np.frombuffer(data, dtype=np.uint8).astype(np.uint64)
        n = len(arr)
        pw = np.full(n, _FP_B, dtype=np.uint64)
        pw[0] = np.uint64(1)
        with np.errstate(over="ignore"):  # mod-2^64 wraparound is the point
            np.cumprod(pw, out=pw)  # pw[i] = B^i (mod 2^64)
            h = _FP_H0 * pw[-1] * _FP_B + np.dot(arr, pw[::-1])
        fps.append(int(h))
    return pd.DataFrame({"doc_id": batch["doc_id"], "fp64": pd.array(fps, dtype="uint64")})
