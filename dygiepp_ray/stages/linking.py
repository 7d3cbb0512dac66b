"""Entity linking: mention → canonical entity id via a broadcast alias table.

The alias table (small side) is `ray.put` once on the driver and resolved in
each actor's `__init__` — never shuffled, never re-shipped per batch (J4
pattern; the reference's coref-table lookup eval_utils.py:265-281).

Candidate scoring is deterministic:
  score = exact-alias hit (1.0) | canonical-form hit (0.8) | token-Jaccard
  against alias (≥ min_score); ties broken by (score desc, entity_id asc).
"""

from __future__ import annotations

import pandas as pd

from ..functions.strings import canonicalize, jaccard
from ..state.broadcast import resolve


def build_alias_table(entities: dict[str, list[str]]) -> dict:
    """entity_id → aliases list, compiled to lookup maps: exact alias → id,
    canonical alias → id (first-id-wins determinism), and a token→candidates
    inverted index so fuzzy scoring only touches entities sharing ≥1 token
    with the mention (blocking — O(candidates), not O(lexicon))."""
    exact: dict[str, str] = {}
    canon: dict[str, str] = {}
    token_index: dict[str, list[tuple[str, str]]] = {}
    for eid in sorted(entities):
        for alias in entities[eid]:
            a = alias.lower()
            exact.setdefault(a, eid)
            canon.setdefault(canonicalize(alias), eid)
            for tok in set(a.split()):
                token_index.setdefault(tok, []).append((eid, a))
    return {
        "exact": exact,
        "canon": canon,
        "token_index": token_index,
        "entities": {k: list(v) for k, v in entities.items()},
    }


class EntityLinker:
    """Actor-pool stage over mention rows: adds (entity_id, link_score)."""

    def __init__(self, alias_table_ref, mention_col: str = "mention",
                 min_score: float = 0.5):
        table = resolve(alias_table_ref)
        self.exact = table["exact"]
        self.canon = table["canon"]
        self.entities = table["entities"]
        self.token_index = table.get("token_index")
        self.mention_col = mention_col
        self.min_score = min_score

    def link_one(self, mention: str) -> tuple[str | None, float]:
        m = mention.lower()
        eid = self.exact.get(m)
        if eid is not None:
            return eid, 1.0
        c = canonicalize(mention)
        eid = self.canon.get(c)
        if eid is not None:
            return eid, 0.8
        # fuzzy fallback: blocked candidate set (entities sharing ≥1 token)
        if self.token_index is not None:
            candidates: set[tuple[str, str]] = set()
            for tok in set(m.split()):
                candidates.update(self.token_index.get(tok, ()))
            pairs = sorted(candidates)  # sorted → deterministic tie-break
        else:
            pairs = [(eid, alias) for eid in sorted(self.entities)
                     for alias in self.entities[eid]]
        best_id, best_score = None, 0.0
        for eid, alias in pairs:
            s = jaccard(mention, alias)
            if s > best_score:
                best_id, best_score = eid, s
        if best_score >= self.min_score:
            return best_id, round(best_score, 6)
        return None, 0.0

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, scores = [], []
        cache: dict[str, tuple[str | None, float]] = {}
        for mention in batch[self.mention_col]:
            hit = cache.get(mention)
            if hit is None:
                hit = self.link_one(mention)
                cache[mention] = hit
            ids.append(hit[0])
            scores.append(hit[1])
        out = batch.copy()
        out["entity_id"] = ids
        out["link_score"] = scores
        return out
