"""Adapter: the driver's `documents` table → north-rule corpus shape.

Lets every KG stage run unchanged over `/root/testdata/sf*/documents.parquet`
(doc_id, text, lang, source, n_chars): each document becomes one source file
row `(repo, path, commit, lang, content)`. Deterministic (commit = sha1 of
the text), so sha256(content) stays a stable end-to-end invariant.
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

import ray.data

from ..schema import CORPUS_SCHEMA

# Lexicon over the synthetic documents vocabulary (spark/hash/join/...):
# multi-token entries exercise span widths; unigrams exercise skewed keys.
DOC_LEXICON: dict[str, str] = {
    "hash join": "Method",
    "sort merge": "Method",
    "merge sort": "Method",
    "vectorized scan": "Method",
    "window": "Method",
    "sort": "Method",
    "filter": "Method",
    "spark": "Material",
    "table": "Material",
    "column": "Material",
    "row": "Material",
    "batch": "Material",
    "stream": "Task",
    "query": "Task",
    "group": "Task",
    "agg": "Task",
    "latency": "Metric",
    "value": "Metric",
}

DOC_TRIGGERS: dict[str, str] = {
    "merge": "contact_meet",
    "scan": "movement_transport",
    "join": "transaction_transfer",
}


def documents_to_corpus_batch(batch: pa.Table) -> pa.Table:
    doc_ids = batch.column("doc_id").to_pylist()
    texts = batch.column("text").to_pylist()
    sources = (
        batch.column("source").to_pylist()
        if "source" in batch.column_names
        else ["docs"] * len(doc_ids)
    )
    repos, paths, commits, langs, contents = [], [], [], [], []
    for doc_id, text, source in zip(doc_ids, texts, sources):
        repos.append(f"docs/{source}")
        paths.append(f"doc_{doc_id}.md")
        commits.append(hashlib.sha1(f"{doc_id}:{text}".encode()).hexdigest())
        langs.append("markdown")
        contents.append(text if text.endswith(".") else text + " .")
    return pa.table(
        {"repo": repos, "path": paths, "commit": commits, "lang": langs, "content": contents},
        schema=CORPUS_SCHEMA,
    )


def documents_as_corpus(sf_dir: str, max_doc_id: int | None = None) -> "ray.data.Dataset":
    """documents table as corpus rows. `max_doc_id` selects a DETERMINISTIC
    subset (doc_id < max_doc_id) — unlike `limit()`, which depends on block
    arrival order under parallel reads."""
    import pyarrow.parquet as pq

    path = f"{sf_dir}/documents.parquet"
    cols = ["doc_id", "text", "source"]
    full = pq.read_schema(path)
    # projected metadata-free schema: pandas-written parquet metadata makes
    # block schemas unhashable in Ray's shuffle schema-dedup
    docs = ray.data.read_parquet(
        path, columns=cols,
        schema=pa.schema([full.field(c).remove_metadata() for c in cols]),
    )
    if max_doc_id is not None:
        import pyarrow.compute as pc

        docs = docs.map_batches(
            lambda t: t.filter(pc.less(t.column("doc_id"), max_doc_id)),
            batch_format="pyarrow",
        )
    return docs.map_batches(documents_to_corpus_batch, batch_format="pyarrow")
