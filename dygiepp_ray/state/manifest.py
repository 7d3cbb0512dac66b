"""Per-partition lineage manifests + resumable output (SURVEY.md §4, §7.2-6).

The reference's only resume unit is the per-shard output file
(make_kb.py:54-88); the engine generalizes it:

- every corpus row is assigned a deterministic `bucket` (hash of
  repo:path@commit, mod n_buckets) BEFORE any expensive stage;
- triples are written as `out_dir/bucket=<b>/` partitioned Parquet;
- after each bucket's files land, a manifest
  `out_dir/_manifests/bucket-<b>.json` records the input fingerprint, row
  count and a sha256 roll-up (XOR of per-row content_sha256) — the lineage
  record the north rule requires;
- on resume, buckets whose manifest validates against the current input
  fingerprint are skipped by filtering them out right after the read (a cheap
  hash on two string columns — no kernel compute, no shuffle).

Manifest reads/writes are tiny driver-side JSON ops; all data movement stays
in the Dataset pipeline.
"""

from __future__ import annotations

import glob
import json
import os

import pyarrow as pa
import pyarrow.parquet as pq

from ..functions.strings import stable_hash64

ENGINE_VERSION = 1


def bucket_of(repo: str, path: str, commit: str, n_buckets: int) -> int:
    return stable_hash64(f"{repo}:{path}@{commit}") % n_buckets


def assign_buckets(n_buckets: int):
    """map_batches fn: stamp the deterministic partition bucket on corpus rows."""

    def fn(batch: pa.Table) -> pa.Table:
        buckets = [
            bucket_of(r, p, c, n_buckets)
            for r, p, c in zip(
                batch.column("repo").to_pylist(),
                batch.column("path").to_pylist(),
                batch.column("commit").to_pylist(),
            )
        ]
        return batch.append_column("bucket", pa.array(buckets, pa.int32()))

    return fn


def input_fingerprint(input_dir: str) -> str:
    """Cheap, deterministic fingerprint of the input: sorted (name, size)."""
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    payload = ";".join(f"{os.path.basename(f)}:{os.path.getsize(f)}" for f in files)
    return format(stable_hash64(payload), "016x")


def manifest_path(out_dir: str, bucket: int) -> str:
    return os.path.join(out_dir, "_manifests", f"bucket-{bucket}.json")


def sha_rollup(shas: list[str]) -> str:
    """Order-independent roll-up: XOR of the 256-bit sha integers."""
    acc = 0
    for s in shas:
        acc ^= int(s, 16)
    return format(acc, "064x")


def write_manifest(out_dir: str, bucket: int, fingerprint: str) -> dict:
    """Compute + persist a bucket's manifest from its written Parquet files.
    Row count comes from footers; the sha roll-up reads only the
    content_sha256 column (columnar, cheap)."""
    part_dir = os.path.join(out_dir, f"bucket={bucket}")
    files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
    rows = 0
    acc = 0
    for f in files:
        md = pq.read_metadata(f)
        rows += md.num_rows
        col = pq.read_table(f, columns=["content_sha256"]).column(0)
        for s in col.to_pylist():
            acc ^= int(s, 16)
    m = {
        "bucket": bucket,
        "engine_version": ENGINE_VERSION,
        "input_fingerprint": fingerprint,
        "row_count": rows,
        "sha256_xor": format(acc, "064x"),
        "files": [os.path.basename(f) for f in files],
    }
    os.makedirs(os.path.join(out_dir, "_manifests"), exist_ok=True)
    tmp = manifest_path(out_dir, bucket) + ".tmp"
    with open(tmp, "w") as fh:
        json.dump(m, fh)
    os.replace(tmp, manifest_path(out_dir, bucket))  # atomic publish
    return m


def completed_buckets(out_dir: str, fingerprint: str) -> set[int]:
    """Buckets whose manifest validates against the current input."""
    done = set()
    for f in glob.glob(os.path.join(out_dir, "_manifests", "bucket-*.json")):
        try:
            with open(f) as fh:
                m = json.load(fh)
        except (OSError, json.JSONDecodeError):
            continue
        if (
            m.get("engine_version") == ENGINE_VERSION
            and m.get("input_fingerprint") == fingerprint
        ):
            done.add(int(m["bucket"]))
    return done
