"""Coreference metrics (SURVEY.md §2.5 A5): MUC, B³, CEAF-φ4, mention recall,
and their CoNLL average — the reference reports AllenNLP's ConllCorefScores
(dygie/models/coref.py:80-81, 357-361). Algorithms follow the published
definitions (Vilain et al. 1995; Bagga & Baldwin 1998; Luo 2005; Pradhan et
al. 2012); the Hungarian assignment for CEAF is implemented inline (no scipy
in this environment).

Counts accumulate partial-per-document then sum globally (the A2 pattern), so
the corpus-level scores stream: `coref_scores(ds)` runs per-doc counters in
`map_batches` and one tiny global reduce.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Sum

Cluster = list[tuple[int, int]]


def _as_sets(clusters) -> list[frozenset]:
    out = []
    for c in clusters or []:
        s = frozenset((m["start"], m["end"]) if isinstance(m, dict) else tuple(m) for m in c)
        if s:
            out.append(s)
    return out


# ------------------------------------------------------------------ MUC


def muc_counts(key: list[frozenset], response: list[frozenset]) -> tuple[int, int]:
    """Returns (numerator, denominator) of MUC recall for key vs response;
    precision = muc_counts(response, key)."""
    num = den = 0
    for k in key:
        if len(k) < 2:
            continue
        # partitions of k induced by response clusters (+ singletons)
        touched = set()
        parts = 0
        for r in response:
            inter = k & r
            if inter:
                parts += 1
                touched |= inter
        parts += len(k - touched)  # unresolved mentions are singleton partitions
        num += len(k) - parts
        den += len(k) - 1
    return num, den


# ------------------------------------------------------------------- B³


def b3_counts(key: list[frozenset], response: list[frozenset]) -> tuple[float, int]:
    """Returns (numerator, denominator) of B³ recall; precision = swapped."""
    num = 0.0
    den = 0
    for k in key:
        for r in response:
            inter = len(k & r)
            if inter:
                num += inter * inter / len(k)
        den += len(k)
    return num, den


# ------------------------------------------------------------------ CEAF


def _hungarian_max(sim: np.ndarray) -> float:
    """Maximum-weight assignment total over a rectangular similarity matrix
    (Kuhn-Munkres with potentials, O(n³)); returns the summed similarity."""
    if sim.size == 0:
        return 0.0
    n = max(sim.shape)
    cost = np.zeros((n, n))
    cost[: sim.shape[0], : sim.shape[1]] = -sim  # minimize negated similarity
    INF = float("inf")
    u = [0.0] * (n + 1)
    v = [0.0] * (n + 1)
    p = [0] * (n + 1)
    way = [0] * (n + 1)
    for i in range(1, n + 1):
        p[0] = i
        j0 = 0
        minv = [INF] * (n + 1)
        used = [False] * (n + 1)
        while True:
            used[j0] = True
            i0, delta, j1 = p[j0], INF, 0
            for j in range(1, n + 1):
                if not used[j]:
                    cur = cost[i0 - 1][j - 1] - u[i0] - v[j]
                    if cur < minv[j]:
                        minv[j] = cur
                        way[j] = j0
                    if minv[j] < delta:
                        delta = minv[j]
                        j1 = j
            for j in range(n + 1):
                if used[j]:
                    u[p[j]] += delta
                    v[j] -= delta
                else:
                    minv[j] -= delta
            j0 = j1
            if p[j0] == 0:
                break
        while j0:
            j1 = way[j0]
            p[j0] = p[j1]
            j0 = j1
    total = 0.0
    for j in range(1, n + 1):
        if p[j] and p[j] - 1 < sim.shape[0] and j - 1 < sim.shape[1]:
            total += sim[p[j] - 1][j - 1]
    return float(total)


def ceaf_e_counts(key: list[frozenset], response: list[frozenset]):
    """CEAF-φ4: φ4(K,R) = 2|K∩R| / (|K|+|R|), optimal 1:1 alignment.
    Returns (aligned_sim, n_key, n_response)."""
    if not key or not response:
        return 0.0, len(key), len(response)
    sim = np.zeros((len(key), len(response)))
    for i, k in enumerate(key):
        for j, r in enumerate(response):
            sim[i, j] = 2.0 * len(k & r) / (len(k) + len(r))
    return _hungarian_max(sim), len(key), len(response)


# ------------------------------------------------------- corpus streaming


def _doc_counts(gold, pred) -> dict[str, float]:
    key, response = _as_sets(gold), _as_sets(pred)
    muc_rn, muc_rd = muc_counts(key, response)
    muc_pn, muc_pd = muc_counts(response, key)
    b3_rn, b3_rd = b3_counts(key, response)
    b3_pn, b3_pd = b3_counts(response, key)
    ceaf_sim, n_key, n_resp = ceaf_e_counts(key, response)
    key_mentions = set().union(*key) if key else set()
    resp_mentions = set().union(*response) if response else set()
    return {
        "muc_rn": muc_rn, "muc_rd": muc_rd, "muc_pn": muc_pn, "muc_pd": muc_pd,
        "b3_rn": b3_rn, "b3_rd": b3_rd, "b3_pn": b3_pn, "b3_pd": b3_pd,
        "ceaf_sim": ceaf_sim, "ceaf_nk": n_key, "ceaf_nr": n_resp,
        "mention_hit": len(key_mentions & resp_mentions),
        "mention_gold": len(key_mentions),
    }


def _prf(num_r, den_r, num_p, den_p):
    r = num_r / den_r if den_r else 0.0
    p = num_p / den_p if den_p else 0.0
    f = 2 * p * r / (p + r) if p + r else 0.0
    return p, r, f


def finalize(sums: dict) -> dict:
    muc_p, muc_r, muc_f = _prf(sums["muc_rn"], sums["muc_rd"], sums["muc_pn"], sums["muc_pd"])
    b3_p, b3_r, b3_f = _prf(sums["b3_rn"], sums["b3_rd"], sums["b3_pn"], sums["b3_pd"])
    ceaf_r = sums["ceaf_sim"] / sums["ceaf_nk"] if sums["ceaf_nk"] else 0.0
    ceaf_p = sums["ceaf_sim"] / sums["ceaf_nr"] if sums["ceaf_nr"] else 0.0
    ceaf_f = 2 * ceaf_p * ceaf_r / (ceaf_p + ceaf_r) if ceaf_p + ceaf_r else 0.0
    return {
        "muc": {"precision": muc_p, "recall": muc_r, "f1": muc_f},
        "b3": {"precision": b3_p, "recall": b3_r, "f1": b3_f},
        "ceaf_e": {"precision": ceaf_p, "recall": ceaf_r, "f1": ceaf_f},
        "conll_f1": (muc_f + b3_f + ceaf_f) / 3.0,
        "mention_recall": (
            sums["mention_hit"] / sums["mention_gold"] if sums["mention_gold"] else 0.0
        ),
    }


def coref_scores(ds: "ray.data.Dataset", gold_col: str = "clusters",
                 pred_col: str = "predicted_clusters") -> dict:
    """Corpus-level coref scores: per-doc counters in map_batches, global sum."""

    def count_batch(batch: pd.DataFrame) -> pd.DataFrame:
        # pandas batch format: tolerant of nested object columns coming out
        # of upstream map_groups stages (Arrow can't always re-infer them)
        acc: dict[str, float] = {k: 0.0 for k in _doc_counts([], [])}
        for g, p in zip(batch[gold_col], batch[pred_col]):
            g = list(g) if g is not None else []
            p = list(p) if p is not None else []
            for k, v in _doc_counts(g, p).items():
                acc[k] += v
        return pd.DataFrame([acc])

    keys = list(_doc_counts([], []))
    sums = ds.map_batches(count_batch, batch_format="pandas").aggregate(
        *[Sum(k, alias_name=k) for k in keys]
    )
    return finalize({k: (sums[k] or 0.0) for k in keys})
