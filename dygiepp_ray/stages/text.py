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
