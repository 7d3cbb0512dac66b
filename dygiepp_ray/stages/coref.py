"""Cluster merge / coref set-ops (SURVEY.md §2.7 D1, reference merge.py).

Semantics reproduced from dw-experiments/2020-09-03/script/merge.py:
- `merge_clusters` (merge.py:51-100): clusters from two prediction sets that
  share ≥1 exact span are unioned, iterated to fixpoint (worklist /
  connected-components over span-overlap edges);
- containment dedup (merge.py:33-48): inside a merged cluster, drop any span
  strictly CONTAINED in another span of the same cluster;
- overlap test (merge.py:16-23): exact (start, end) span membership.

Exposed as a per-document `map_groups` stage: documents are rows, so the
merge never crosses rows — no global state, no shuffle beyond the doc_key
groupby the caller already has.
"""

from __future__ import annotations

Span = tuple[int, int]
Cluster = list[Span]


def _contained(a: Span, b: Span) -> bool:
    """True if a is contained in b (and not equal)."""
    return a != b and b[0] <= a[0] and a[1] <= b[1]


def drop_contained(cluster: Cluster) -> Cluster:
    """merge.py:33-48 — remove spans contained in another span of the cluster."""
    out = [s for s in cluster if not any(_contained(s, t) for t in cluster)]
    # preserve first-seen order, dedup exact repeats
    seen, uniq = set(), []
    for s in out:
        if s not in seen:
            seen.add(s)
            uniq.append(s)
    return uniq


def _pair_merge(c1: tuple[Span, ...], c2: tuple[Span, ...]) -> tuple[Span, ...]:
    """merge.py:33-48 — union two clusters, drop spans contained in another
    span of the union, return sorted tuple."""
    members = sorted(set(c1 + c2))
    kept = [m for m in members if not any(_contained(m, other) for other in members)]
    return tuple(sorted(set(kept)))


def merge_clusters(set_a: list[Cluster], set_b: list[Cluster]) -> list[Cluster]:
    """merge.py:51-100 — worklist merge, reproduced faithfully including its
    order-dependent details:

    * the worklist starts with set_a's clusters then set_b's, in order;
    * a popped cluster merges with the FIRST overlapping candidate scanned
      over unmerged-then-merged lists (overlap = sharing an exact span);
    * containment dedup runs at EACH pairwise merge, and pre-merge clusters
      stay in the worklist as stale entries that can still link later
      clusters — subtly different from plain connected-components;
    * ONLY clusters that participated in ≥1 merge are emitted;
    * output sorted by first (smallest) span of each cluster.
    """
    all_clusters: list[tuple[Span, ...]] = [
        tuple(tuple(s) for s in c) for c in (*set_a, *set_b)
    ]
    merged: list[tuple[Span, ...]] = []
    unmerged: list[tuple[Span, ...]] = list(all_clusters)
    to_merge: list[tuple[Span, ...]] = list(all_clusters)

    while to_merge:
        clust = to_merge.pop(0)
        candidate = None
        for cand in unmerged + merged:
            if cand == clust:
                continue
            if any(s1 == s2 for s1 in clust for s2 in cand):
                candidate = cand
                break
        if candidate is not None:
            new_cluster = _pair_merge(clust, candidate)
            for container in (merged, unmerged):
                for contained in (clust, candidate):
                    if contained in container:
                        container.remove(contained)
            merged.append(new_cluster)
            to_merge.append(new_cluster)

    out = [[list(s) for s in entry] for entry in merged]
    return sorted(out, key=lambda c: c[0][0])


def merge_predicted_clusters_batch(batch):
    """map_batches fn: merge `predicted_clusters` with `predicted_clusters_b`
    (two models' outputs zip-joined on doc_key upstream, J2) into
    `merged_clusters`."""
    import pyarrow as pa

    a_col = batch.column("predicted_clusters").to_pylist()
    b_col = batch.column("predicted_clusters_b").to_pylist()
    merged = []
    for a, b in zip(a_col, b_col):
        ca = [[(m["start"], m["end"]) for m in c] for c in (a or [])]
        cb = [[(m["start"], m["end"]) for m in c] for c in (b or [])]
        merged.append(
            [[{"start": s, "end": e} for (s, e) in c] for c in merge_clusters(ca, cb)]
        )
    typ = pa.list_(pa.list_(pa.struct([("start", pa.int32()), ("end", pa.int32())])))
    return batch.append_column("merged_clusters", pa.array(merged, typ))
