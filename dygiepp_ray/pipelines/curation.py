"""End-to-end corpus curation pipeline: the composed chain a training-data
team runs before a corpus touches a tokenizer —

    exact dedup  →  near-dup cluster dedup  →  quality filter

Every document receives exactly one status:

  - ``exact_dup``   an identical text exists with a smaller doc_id
  - ``near_dup``    in a MinHash-LSH near-dup cluster whose keeper
                    (min doc_id) is another SURVIVOR of the exact pass
  - ``low_quality`` survived both dedups, quality < threshold
  - ``kept``        everything else

Stage order is part of the spec (pinned by the oracle): near-dup clustering
runs over the exact-dedup SURVIVORS only, and quality over the near-dup
survivors — each stage sees the previous stage's output, like a production
funnel.

Scale shape: the drop sets crossing stages are doc_id sets (broadcast via
`ray.put`; the Bloom filter in `state/broadcast.py` is the >memory path),
never the documents themselves; each stage is one streaming pass; statuses
are emitted as a union of small per-stage label tables plus one final pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

import ray
import ray.data


def curate_corpus(docs: "ray.data.Dataset", quality_min: float = 0.5,
                  jaccard_threshold: float = 0.8,
                  concurrency=(1, 8)) -> "ray.data.Dataset":
    """(doc_id, status) over the full input. See module docstring."""
    from ..stages.curate import neardup_clusters
    from ..stages.dedup import exact_duplicates
    from ..stages.text import quality_score

    # ---- stage 1: exact dedup — keepers are min-id per sha
    sha_groups = exact_duplicates(docs)  # (text_sha, keep_id, n_copies)

    # the drop side needs every (sha, id) pair; re-derive by a broadcast
    # keeper-set membership test instead of shipping texts again
    keep_ids = {
        int(r["keep_id"]) for r in
        sha_groups.select_columns(["keep_id"]).take_all()
    }
    keep_ref = ray.put(keep_ids)

    def exact_status(df: pd.DataFrame) -> pd.DataFrame:
        ks = ray.get(keep_ref)
        ids = df["doc_id"].astype("int64")
        dup = ~ids.isin(ks)
        return pd.DataFrame({"doc_id": ids, "_exact_dup": dup})

    flagged = docs.map_batches(exact_status, batch_format="pandas")
    exact_dups = flagged.map_batches(
        lambda df: df[df["_exact_dup"]][["doc_id"]].assign(
            status="exact_dup"),
        batch_format="pandas")

    survivors1 = docs.map_batches(
        lambda df: df[df["doc_id"].astype("int64").isin(ray.get(keep_ref))],
        batch_format="pandas")

    # ---- stage 2: near-dup clusters over survivors
    clusters = neardup_clusters(survivors1,
                                jaccard_threshold=jaccard_threshold,
                                concurrency=concurrency)
    near_drop = {
        int(r["doc_id"]) for r in clusters.take_all()
        if int(r["doc_id"]) != int(r["keep_id"])
    }
    near_ref = ray.put(near_drop)

    near_dups = survivors1.map_batches(
        lambda df: df[df["doc_id"].astype("int64").isin(ray.get(near_ref))][
            ["doc_id"]].assign(status="near_dup"),
        batch_format="pandas")

    survivors2 = survivors1.map_batches(
        lambda df: df[~df["doc_id"].astype("int64").isin(ray.get(near_ref))],
        batch_format="pandas")

    # ---- stage 3: quality filter
    def quality_status(df: pd.DataFrame) -> pd.DataFrame:
        q = quality_score(df)
        status = np.where(q["quality"] >= quality_min, "kept", "low_quality")
        return pd.DataFrame({"doc_id": q["doc_id"].astype("int64"),
                             "status": status})

    judged = survivors2.map_batches(quality_status, batch_format="pandas")

    return exact_dups.union(near_dups).union(judged)
