"""Deduplication operators (exact and near) over a documents table.

Every variant follows the same scale shape: a cheap per-batch signature stage
(`map_batches`, vectorized) followed by ONE key-partitioned shuffle
(`groupby`) whose per-group work is bounded — never an all-pairs comparison
across the corpus.

- exact_duplicates:  sha-hash partition + per-group first (keeps min doc_id)
- minhash_lsh:       shingle → minhash (vectorized numpy) → band buckets →
                     groupby(band_key) → candidate pairs verified by exact
                     Jaccard within each bucket
- simhash:           64-bit simhash signature per doc; near-dups = same
                     signature after masking k rotated bit-blocks (Charikar /
                     Manku-Jain-Sarma style, block-permutation banding)
- ngram_jaccard:     exact Jaccard over word n-grams, evaluated only inside
                     LSH candidate buckets (not all pairs)
- embedding near-dup lives in stages/similarity.py (cosine path).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

import ray.data
from ray.data.aggregate import Count, Min

_MERSENNE = (1 << 61) - 1
_HASH32 = (1 << 32) - 1


def _text_sha(batch: pa.Table, text_col: str = "text") -> pa.Table:
    shas = [
        hashlib.sha256(t.encode("utf-8")).hexdigest()
        for t in batch.column(text_col).to_pylist()
    ]
    return batch.append_column("text_sha", pa.array(shas, pa.string()))


def exact_duplicates(docs: "ray.data.Dataset", id_col: str = "doc_id",
                     text_col: str = "text") -> "ray.data.Dataset":
    """Hash-partition exact dedup: one row per distinct text with the keeper
    (min id) and the duplicate count. (text_sha, keep_id, n_copies)."""
    sigs = docs.map_batches(lambda b: _text_sha(b, text_col), batch_format="pyarrow")
    sigs = sigs.select_columns(["text_sha", id_col])
    return sigs.groupby("text_sha").aggregate(
        Min(id_col, alias_name="keep_id"), Count(alias_name="n_copies")
    )


# ---------------------------------------------------------------- minhash


_token_hash_cache: dict[str, int] = {}
_M64 = (1 << 64) - 1


def _mix64(z: int) -> int:
    # scalar splitmix64 finalizer (python-int twin of _splitmix64)
    z = (z + 0x9E3779B97F4A7C15) & _M64
    z ^= z >> 30
    z = (z * 0xBF58476D1CE4E5B9) & _M64
    z ^= z >> 27
    z = (z * 0x94D049BB133111EB) & _M64
    z ^= z >> 31
    return z


def _token_hash(tok: str) -> int:
    h = _token_hash_cache.get(tok)
    if h is None:
        h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
        if len(_token_hash_cache) < 1_000_000:
            _token_hash_cache[tok] = h
    return h


def _shingles(text: str, k: int) -> set[int]:
    """Word k-gram shingle set. Each shingle's value is a rolling splitmix64
    combine of CACHED per-token hashes — one blake2b per distinct token, not
    one per shingle occurrence (order-sensitive: 'a b' != 'b a')."""
    toks = text.split()
    if not toks:
        return set()
    hs = [_token_hash(t) for t in toks]
    if len(hs) < k:
        v = 0
        for h in hs:
            v = _mix64(v ^ h)
        return {v}
    out = set()
    for i in range(len(hs) - k + 1):
        v = 0
        for h in hs[i : i + k]:
            v = _mix64(v ^ h)
        out.add(v)
    return out


def _splitmix64(z: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public-domain PRNG mixing function);
    uint64 ops wrap, which is exactly the arithmetic the mixer wants."""
    z = z + np.uint64(0x9E3779B97F4A7C15)
    z ^= z >> np.uint64(30)
    z = z * np.uint64(0xBF58476D1CE4E5B9)
    z ^= z >> np.uint64(27)
    z = z * np.uint64(0x94D049BB133111EB)
    z ^= z >> np.uint64(31)
    return z


def _perm_params(n_perm: int, seed: int = 7) -> np.ndarray:
    """Per-permutation xor seeds; h_i(x) = splitmix64(x ^ seed_i). Far better
    min-wise behavior than a 32-bit linear-congruential family and still one
    vectorized (n_shingles, n_perm) pass."""
    rng = np.random.RandomState(seed)
    return rng.randint(0, 2**63, size=n_perm, dtype=np.int64).astype(np.uint64)


class MinHasher:
    """Actor-pool stage: doc → n_perm minhash values (vectorized across the
    shingle set with one (n_shingles, n_perm) modmul)."""

    def __init__(self, n_perm: int = 64, shingle_k: int = 3, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        self.seeds = _perm_params(n_perm, seed)
        self.n_perm = n_perm
        self.k = shingle_k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = _shingles(text, self.k)
        if not sh:
            return np.full(self.n_perm, _MERSENNE, dtype=np.int64)
        x = np.fromiter(sh, dtype=np.uint64, count=len(sh))
        vals = _splitmix64(x[:, None] ^ self.seeds[None, :]).min(axis=0)
        # monotonic shift into int64 range for Arrow-friendly signatures
        return (vals >> np.uint64(2)).astype(np.int64)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = [self.signature(t) for t in batch[self.text_col]]
        return pd.DataFrame(
            {self.id_col: batch[self.id_col].values, "minhash": [s.tolist() for s in sigs]}
        )


def minhash_bands(sig_df: pd.DataFrame, n_bands: int, id_col: str = "doc_id") -> pd.DataFrame:
    """Explode signatures into (band_key, doc_id) rows; band_key is the hash
    of one band's slice — the LSH bucket key (the shuffle key)."""
    rows_id, rows_key = [], []
    for doc_id, sig in zip(sig_df[id_col], sig_df["minhash"]):
        sig = np.asarray(sig)
        r = len(sig) // n_bands
        for b in range(n_bands):
            band = sig[b * r : (b + 1) * r]
            key = hashlib.blake2b(
                band.tobytes() + bytes([b]), digest_size=8
            ).hexdigest()
            rows_id.append(doc_id)
            rows_key.append(key)
    return pd.DataFrame({"band_key": rows_key, id_col: rows_id})


def minhash_lsh_pairs(docs: "ray.data.Dataset", n_perm: int = 64, n_bands: int = 16,
                      shingle_k: int = 3, jaccard_threshold: float = 0.8,
                      id_col: str = "doc_id", text_col: str = "text",
                      concurrency=(1, 8)) -> "ray.data.Dataset":
    """Near-duplicate pairs (id_a < id_b, est_jaccard ≥ threshold).

    shingle→minhash (actor pool) → band explode → groupby(band_key) →
    in-bucket exact verification on minhash-estimated Jaccard. Buckets are
    small by construction; the shuffle key is the band hash.
    """
    sigs = docs.select_columns([id_col, text_col]).map_batches(
        MinHasher, fn_constructor_kwargs=dict(
            n_perm=n_perm, shingle_k=shingle_k, text_col=text_col, id_col=id_col
        ),
        batch_format="pandas", concurrency=concurrency,
    )
    # signatures travel WITH the band rows (512 B each at 64 perms): one
    # shuffle total; in-bucket verification needs no second join.
    banded_with_sig = sigs.map_batches(
        lambda df: minhash_bands_with_sig(df, n_bands, id_col), batch_format="pandas"
    )

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].tolist()
        sigs_ = [np.asarray(s) for s in group["minhash"]]
        out_a, out_b, est = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                sim = float(np.mean(sigs_[i] == sigs_[j]))
                if sim >= jaccard_threshold:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    est.append(round(sim, 6))
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "est_jaccard": est})

    pairs = banded_with_sig.groupby("band_key").map_groups(verify, batch_format="pandas")

    # a pair can surface from several bands → exact dedup on the pair key
    def dedup_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_first, batch_format="pandas")


def minhash_bands_with_sig(sig_df: pd.DataFrame, n_bands: int,
                           id_col: str = "doc_id") -> pd.DataFrame:
    rows = {"band_key": [], id_col: [], "minhash": []}
    for doc_id, sig in zip(sig_df[id_col], sig_df["minhash"]):
        arr = np.asarray(sig)
        r = len(arr) // n_bands
        for b in range(n_bands):
            band = arr[b * r : (b + 1) * r]
            key = hashlib.blake2b(band.tobytes() + bytes([b]), digest_size=8).hexdigest()
            rows["band_key"].append(key)
            rows[id_col].append(doc_id)
            rows["minhash"].append(sig)
    return pd.DataFrame(rows)


# ---------------------------------------------------------------- simhash


class SimHasher:
    """Actor-pool stage: 64-bit simhash over whitespace tokens (token hash
    bits weighted by term frequency)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col
        self._cache: dict[str, int] = {}

    def _tok_hash(self, tok: str) -> int:
        h = self._cache.get(tok)
        if h is None:
            h = int.from_bytes(hashlib.blake2b(tok.encode(), digest_size=8).digest(), "big")
            if len(self._cache) < 500_000:
                self._cache[tok] = h
        return h

    def simhash(self, text: str) -> int:
        acc = np.zeros(64, dtype=np.int64)
        toks = text.split()
        if not toks:
            return 0
        from collections import Counter

        for tok, cnt in Counter(toks).items():
            h = self._tok_hash(tok)
            bits = np.unpackbits(
                np.frombuffer(h.to_bytes(8, "little"), dtype=np.uint8), bitorder="little"
            )
            acc += np.where(bits == 1, cnt, -cnt)
        out = 0
        for i in range(64):
            if acc[i] > 0:
                out |= 1 << i
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].values,
                "simhash": pd.array([self.simhash(t) for t in batch[self.text_col]],
                                    dtype="uint64"),
            }
        )


def simhash_near_dups(docs: "ray.data.Dataset", n_blocks: int = 4,
                      max_hamming: int = 3, id_col: str = "doc_id",
                      text_col: str = "text", concurrency=(1, 8)) -> "ray.data.Dataset":
    """Near-dup pairs by simhash: docs sharing any of `n_blocks` 16-bit blocks
    land in one bucket (block-value groupby); pairs verified by Hamming ≤ k."""
    sigs = docs.select_columns([id_col, text_col]).map_batches(
        SimHasher, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
        batch_format="pandas", concurrency=concurrency,
    )

    width = 64 // n_blocks

    def explode(df: pd.DataFrame) -> pd.DataFrame:
        rows = {"block_key": [], id_col: [], "simhash": []}
        for doc_id, sh in zip(df[id_col], df["simhash"]):
            sh = int(sh)
            for b in range(n_blocks):
                block = (sh >> (b * width)) & ((1 << width) - 1)
                rows["block_key"].append(f"{b}:{block:x}")
                rows[id_col].append(doc_id)
                rows["simhash"].append(sh)
        # explicit uint64: a plain int column would be inferred as object /
        # float64 crossing the Arrow block boundary, silently destroying the
        # signature's low bits (wrong Hamming distances downstream)
        rows["simhash"] = pd.array(rows["simhash"], dtype="uint64")
        return pd.DataFrame(rows)

    def verify(group: pd.DataFrame) -> pd.DataFrame:
        ids = group[id_col].tolist()
        hs = [int(x) for x in group["simhash"]]
        out_a, out_b, ham = [], [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] == ids[j]:
                    continue
                d = bin(hs[i] ^ hs[j]).count("1")
                if d <= max_hamming:
                    a, b = sorted((ids[i], ids[j]))
                    out_a.append(a)
                    out_b.append(b)
                    ham.append(d)
        return pd.DataFrame({"id_a": out_a, "id_b": out_b, "hamming": ham})

    pairs = sigs.map_batches(explode, batch_format="pandas").groupby("block_key").map_groups(
        verify, batch_format="pandas"
    )

    def dedup_first(g: pd.DataFrame) -> pd.DataFrame:
        return g.head(1)

    return pairs.groupby(["id_a", "id_b"]).map_groups(dedup_first, batch_format="pandas")


def ngram_jaccard_pairs(docs: "ray.data.Dataset", shingle_k: int = 3,
                        threshold: float = 0.5, id_col: str = "doc_id",
                        text_col: str = "text") -> "ray.data.Dataset":
    """EXACT n-gram-Jaccard near-dup pairs at bounded cost.

    1. Candidate pairs from minhash-LSH (high recall: threshold lowered by
       0.2, many bands) — never all-pairs.
    2. Only the CANDIDATE ids' texts are pulled to the driver (the candidate
       set is small by construction) and broadcast once via `ray.put`; exact
       shingle-set Jaccard is verified per batch inside `map_batches`.
    """
    import ray as _ray

    candidates = minhash_lsh_pairs(
        docs, n_perm=64, n_bands=32, shingle_k=shingle_k,
        jaccard_threshold=max(0.0, threshold - 0.2), id_col=id_col, text_col=text_col,
    ).materialize()
    cand_pdf = candidates.to_pandas()  # small: verified near-dup candidates
    cand_ids = sorted(set(cand_pdf["id_a"]) | set(cand_pdf["id_b"]))
    id_set_ref = _ray.put(frozenset(cand_ids))

    def keep_candidates(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        ids = _ray.get(id_set_ref)
        mask = pc.is_in(batch.column(id_col), value_set=pa.array(list(ids)))
        return batch.filter(mask)

    cand_texts = {
        r[id_col]: r[text_col]
        for r in docs.select_columns([id_col, text_col])
        .map_batches(keep_candidates, batch_format="pyarrow")
        .take_all()  # bounded: only candidate rows survive the filter
    }
    texts_ref = _ray.put(cand_texts)

    class Verify:
        def __init__(self):
            self.texts = _ray.get(texts_ref)

        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            out_a, out_b, jac = [], [], []
            for a, b in zip(df["id_a"], df["id_b"]):
                sa = _shingles(self.texts[a], shingle_k)
                sb = _shingles(self.texts[b], shingle_k)
                j = len(sa & sb) / max(1, len(sa | sb))
                if j >= threshold:
                    out_a.append(a)
                    out_b.append(b)
                    jac.append(round(j, 6))
            return pd.DataFrame({"id_a": out_a, "id_b": out_b, "jaccard": jac})

    return candidates.map_batches(Verify, batch_format="pandas", concurrency=(1, 4))
