"""DSIR-style data selection via importance resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling" — public
method description; no code consulted).

Select raw-corpus documents whose hashed n-gram distribution looks like a
TARGET corpus: fit bucketed unigram models p (target) and q (raw) over a
fixed hashed feature space, score each raw doc by its importance weight
log w(x) = Σ_f c_f(x) · (log p_f − log q_f), and keep the top-k.

Ray-Data shape (every stage streams):
  1. two feature-histogram passes — per-block partial D-vectors (D is
     FIXED, e.g. 2^16) summed into one exact int64 vector each; only the
     two D-vectors ever reach the driver, regardless of corpus size;
  2. the log-ratio vector is integer-scaled (round(logratio · 1e6) →
     int64) and broadcast once via `ray.put`; per-doc scores are then
     EXACT integer sums — order-independent, so the driver-side oracle
     hash-matches bit for bit (a float64 Σ would drift with block order);
  3. top-k = block-local prune to k rows per block → tiny global sort
     (the `aggregates.top_k` pattern) — no full-corpus sort.

At 100 TB: the histograms are partial+final aggregates with a fixed-size
result; scoring is a stateless vectorized map; selection moves ≤ k rows
per block. Nothing scales with corpus size on the driver.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray

DEFAULT_DIM = 1 << 16
SCALE = 1_000_000


def _feature_ids(texts, dim: int, ngram: int = 2) -> list[np.ndarray]:
    """Hashed word n-gram ids per text (unigrams + bigrams by default).
    Vectorized pandas hash over the exploded n-gram frame — no per-token
    Python hashing (hash_pandas_object is process-stable, ROUND3_NOTES)."""
    out = []
    for t in texts:
        toks = t.lower().split()
        grams = toks + [" ".join(toks[i : i + ngram])
                        for i in range(len(toks) - ngram + 1)]
        if not grams:
            out.append(np.zeros(0, dtype=np.int64))
            continue
        h = pd.util.hash_pandas_object(pd.Series(grams), index=False)
        out.append((h.to_numpy() % np.uint64(dim)).astype(np.int64))
    return out


def feature_histogram(docs: "ray.data.Dataset", text_col: str = "text",
                      dim: int = DEFAULT_DIM, ngram: int = 2) -> np.ndarray:
    """Exact int64 bucket-count vector over the corpus: per-block partial
    D-vectors, one tiny final sum (each block contributes ONE row of D
    counts, not its tokens)."""

    def block_counts(df: pd.DataFrame) -> pd.DataFrame:
        vec = np.zeros(dim, dtype=np.int64)
        for ids in _feature_ids(df[text_col].tolist(), dim, ngram):
            np.add.at(vec, ids, 1)
        return pd.DataFrame({"counts": [vec]})

    total = np.zeros(dim, dtype=np.int64)
    for batch in docs.select_columns([text_col]).map_batches(
            block_counts, batch_format="pandas").iter_batches(
            batch_format="pandas"):
        for vec in batch["counts"]:
            total += np.asarray(vec, dtype=np.int64)
    return total


def log_ratio_scaled(target_hist: np.ndarray, raw_hist: np.ndarray,
                     scale: int = SCALE) -> np.ndarray:
    """Integer-scaled log importance ratio per bucket with add-one
    smoothing: round((log p_f − log q_f) · scale) as int64. Deterministic
    (same floats in → same ints out) and exact thereafter."""
    dim = len(target_hist)
    p = np.log((target_hist + 1.0) / float(target_hist.sum() + dim))
    q = np.log((raw_hist + 1.0) / float(raw_hist.sum() + dim))
    return np.round((p - q) * scale).astype(np.int64)


def dsir_select(raw: "ray.data.Dataset", target: "ray.data.Dataset", k: int,
                id_col: str = "doc_id", text_col: str = "text",
                dim: int = DEFAULT_DIM, ngram: int = 2) -> "ray.data.Dataset":
    """Top-k raw docs by integer-scaled importance score
    (doc_id, dsir_score). Ties break toward the smaller doc_id."""
    t_hist = feature_histogram(target, text_col, dim, ngram)
    r_hist = feature_histogram(raw, text_col, dim, ngram)
    ratio_ref = ray.put(log_ratio_scaled(t_hist, r_hist))

    def score_block(df: pd.DataFrame) -> pd.DataFrame:
        ratio = ray.get(ratio_ref)
        scores = np.fromiter(
            (int(ratio[ids].sum()) for ids in
             _feature_ids(df[text_col].tolist(), dim, ngram)),
            dtype=np.int64, count=len(df))
        out = pd.DataFrame({id_col: df[id_col].to_numpy(),
                            "dsir_score": scores})
        # block-local prune: only ≤ k rows per block reach the global sort
        return out.sort_values(["dsir_score", id_col],
                               ascending=[False, True]).head(k)

    return (raw.select_columns([id_col, text_col])
            .map_batches(score_block, batch_format="pandas")
            .sort(["dsir_score", id_col], descending=[True, False])
            .limit(k))
