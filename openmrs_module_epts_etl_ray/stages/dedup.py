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

    # coarse-bucket the sha so each map_groups call handles MANY hashes
    # vectorized (one Python call per sha costs more than the dedup itself)
    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        h = df["content_sha"].str.slice(0, 8).apply(int, base=16)
        return df.assign(_coarse=(h % 64).astype(np.int64))

    def min_per_sha(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values(id_col).drop_duplicates("content_sha", keep="first")
        return out.drop(columns=["_coarse"])[[id_col, "content_sha"]]

    return hashed.map_batches(add_coarse, batch_format="pandas") \
        .repartition(8).groupby("_coarse").map_groups(min_per_sha, batch_format="pandas")


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

    Degenerate buckets larger than ``max_bucket`` are truncated to the
    ``max_bucket`` smallest ids (all-pairs cost is quadratic in bucket
    size); pairs among the overflow are dropped SILENTLY — pass
    ``max_bucket=None`` via the underlying ``_bucket_pairs`` when full
    recall matters more than the quadratic guard.
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

    def pair_fn(sub: pd.DataFrame | None) -> pd.DataFrame:
        if sub is None:
            return _empty_pairs()
        ids = np.sort(sub[id_col].to_numpy())
        ia, ib = np.triu_indices(len(ids), k=1)
        return pd.DataFrame({"id_a": ids[ia], "id_b": ids[ib]})

    cand = _bucket_pairs(exploded, ["band_id", "band_hash"], id_col, pair_fn,
                         max_bucket=max_bucket)
    return _distinct_pairs(cand)


def verify_jaccard(
    candidates: rd.Dataset,
    docs: rd.Dataset,
    *,
    threshold: float = 0.8,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Exact n-gram Jaccard over candidate pairs.

    Text lookup strategy: the WHOLE corpus text map is collected and
    broadcast once (``ray.put``) — right for corpora whose text fits a
    node's memory (the common case after upstream filtering; candidate
    verification reads texts many times). For corpora beyond that, swap
    the broadcast for two shuffle joins (candidates ⋈ docs on id_a, then
    id_b via ``stages.joins.inner_join``) so only candidate texts move."""
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
        # band the 64-bit hash into 4×16-bit chunks, EXPLODED to one row per
        # (doc, chunk): near-dups (hamming<=3) share at least one chunk by
        # pigeonhole, and a single groupby(band, code) finds all collisions
        # (vs four separate groupby shuffles + union)
        ids = np.repeat(batch[self.id_col].to_numpy(), 4)
        shr = np.repeat(sh, 4)
        band = np.tile(np.arange(4, dtype=np.int64), len(batch))
        code = ((shr >> (np.uint64(16) * band.astype(np.uint64)))
                & np.uint64(0xFFFF)).astype(np.int64)
        return pd.DataFrame({self.id_col: ids, "band": band, "code": code,
                             "simhash": shr})


def _empty_pairs(extra: dict | None = None) -> pd.DataFrame:
    cols = {"id_a": pd.Series(dtype="int64"), "id_b": pd.Series(dtype="int64")}
    for name, dtype in (extra or {}).items():
        cols[name] = pd.Series(dtype=dtype)
    return pd.DataFrame(cols)


def _distinct_pairs(cand: rd.Dataset) -> rd.Dataset:
    """Distinct (id_a, id_b): per-block pre-dedup, coalesce, then the final
    groupby over the (tiny) surviving pairs."""
    pre = cand.map_batches(
        lambda df: df.drop_duplicates(["id_a", "id_b"]), batch_format="pandas")
    return pre.repartition(2).groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


COARSE_BUCKETS = 64


def _bucket_pairs(ds: rd.Dataset, fine_keys: list[str], id_col: str,
                  pair_fn, *, max_bucket: int | None = 64) -> rd.Dataset:
    """All-pairs within every fine (bucket) group, with ONE ``map_groups``
    call per COARSE bucket: ``map_groups`` invokes Python once per group, so
    grouping directly on the fine key costs one call per bucket — 80k calls
    for 5k docs × 16 bands, nearly all singletons (measured 8.5s of pure
    call overhead). The coarse bucket is a deterministic function of the
    fine key, so every fine group lands intact in exactly one coarse group;
    inside, numpy group-boundary logic only loops over groups with >= 2
    members. ``pair_fn(sub_df) -> extra-cols dict`` computes any per-pair
    payload (hamming, cosine, ...) vectorized; None means plain id pairs."""
    from pandas.util import hash_pandas_object

    def add_coarse(df: pd.DataFrame) -> pd.DataFrame:
        h = hash_pandas_object(df[fine_keys].astype(str).agg("|".join, axis=1),
                               index=False).to_numpy()
        return df.assign(_coarse=(h % COARSE_BUCKETS).astype(np.int64))

    def pairs_many(g: pd.DataFrame) -> pd.DataFrame:
        key = g[fine_keys].astype(str).agg("|".join, axis=1)
        codes, _ = pd.factorize(key, sort=False)
        order = np.argsort(codes, kind="stable")
        gs = g.iloc[order]
        c = codes[order]
        bounds = np.flatnonzero(np.r_[True, c[1:] != c[:-1]])
        bounds = np.r_[bounds, len(c)]
        frames = []
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if hi - lo < 2:
                continue
            # canonical ascending id order => emitted pairs satisfy
            # id_a < id_b, so the same pair from two bands dedups exactly
            sub = gs.iloc[lo:hi].sort_values(id_col).drop_duplicates(id_col)
            if max_bucket is not None:
                sub = sub.head(max_bucket)
            if len(sub) < 2:
                continue
            frames.append(pair_fn(sub))
        if not frames:
            return pair_fn(None)
        return pd.concat(frames, ignore_index=True)

    bucketed = ds.map_batches(add_coarse, batch_format="pandas")
    return bucketed.repartition(8).groupby("_coarse").map_groups(
        pairs_many, batch_format="pandas")


def simhash_candidates(ds: rd.Dataset, *, text_col="text", id_col="doc_id",
                       max_hamming: int = 3, max_bucket: int = 64) -> rd.Dataset:
    """Near-dup pairs with simhash Hamming distance <= max_hamming. The 4x16
    bit chunk banding guarantees recall only for hamming <= 3 (pigeonhole);
    higher thresholds are best-effort within colliding chunks."""
    hashed = ds.map_batches(SimHasher, fn_constructor_kwargs=dict(text_col=text_col, id_col=id_col),
                            batch_format="pandas", concurrency=(1, 8))

    def pair_fn(sub: pd.DataFrame | None) -> pd.DataFrame:
        if sub is None:
            return _empty_pairs({"hamming": "int64"})
        ids = sub[id_col].to_numpy()
        hs = sub["simhash"].to_numpy(dtype=np.uint64)
        ia, ib = np.triu_indices(len(ids), k=1)
        x = hs[ia] ^ hs[ib]
        ham = np.array([bin(int(v)).count("1") for v in x])
        keep = ham <= max_hamming
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "hamming": ham[keep].astype("int64")})

    cand = _bucket_pairs(hashed, ["band", "code"], id_col, pair_fn,
                         max_bucket=max_bucket)
    return _distinct_pairs(cand)


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

    def pair_fn(sub: pd.DataFrame | None) -> pd.DataFrame:
        if sub is None:
            return _empty_pairs({"cosine": "float64"})
        ids = sub[id_col].to_numpy()
        V = np.stack(sub[vec_col].to_numpy()).astype(np.float64)
        V = V / np.maximum(np.linalg.norm(V, axis=1, keepdims=True), 1e-12)
        S = V @ V.T
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = S[ia, ib] >= threshold
        return pd.DataFrame({"id_a": ids[ia][keep], "id_b": ids[ib][keep],
                             "cosine": S[ia, ib][keep]})

    bucketed = ds.map_batches(Bucketize, batch_format="pandas", concurrency=(1, 8))
    cand = _bucket_pairs(bucketed, ["band", "code"], id_col, pair_fn,
                         max_bucket=None)  # dense hyperplane buckets: no truncation
    return _distinct_pairs(cand)


# ---------------------------------------------------------------------------
# near-dup clusters (connected components over verified pairs)
# ---------------------------------------------------------------------------

def connected_components(pairs: rd.Dataset) -> pd.DataFrame:
    """Cluster verified near-dup pairs; returns (doc_id, canonical_id) with
    canonical = min id per component.

    The candidate graph is orders of magnitude smaller than the corpus (only
    docs that passed LSH + Jaccard verification appear), so a driver-side
    union-find over the collected edges is the right tool; for a degenerate
    corpus where near-dup pairs approach corpus size, switch to iterative
    min-label propagation (edges joined to labels per round, a few groupby
    rounds until fixpoint) — same result, all-distributed.
    """
    edges = pairs.select_columns(["id_a", "id_b"]).to_pandas()
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:   # path compression
            parent[x], x = r, parent[x]
        return r

    for a, b in zip(edges["id_a"], edges["id_b"]):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by smaller root => canonical = min id naturally
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    rows = sorted((x, find(x)) for x in parent)
    return pd.DataFrame(rows, columns=["doc_id", "canonical_id"])


def connected_components_distributed(
    pairs: rd.Dataset, *, max_iters: int = 20,
) -> rd.Dataset:
    """All-distributed connected components by iterative min-label
    propagation — the scale path of :func:`connected_components` for
    candidate graphs too large to collect.

    Each round: every edge forwards min(label_a, label_b) to both endpoints;
    a groupby-min folds messages per node; converged when no label changes
    (checked with one small aggregate per round). Rounds needed = graph
    diameter (near-dup clusters are shallow — typically 2-4).

    The per-round label lookup is broadcast (``ray.put`` of the label map —
    comfortable to ~10^7 labeled nodes); beyond that, replace the lookup
    with two shuffle joins (edges ⋈ labels on each endpoint) — the loop
    shape and the groupby-min fold stay identical.
    """
    import pyarrow.compute as pc
    from ray.data.aggregate import Min

    edges = pairs.map_batches(
        lambda t: pa.table({"id_a": pc.cast(t["id_a"], pa.int64()),
                            "id_b": pc.cast(t["id_b"], pa.int64())}),
        batch_format="pyarrow").materialize()

    # labels: every endpoint starts as its own label
    nodes = edges.map_batches(
        lambda t: pa.table({"doc_id": pa.concat_arrays(
            [t["id_a"].combine_chunks(), t["id_b"].combine_chunks()])}),
        batch_format="pyarrow")
    labels = nodes.groupby("doc_id").map_groups(
        lambda g: g.head(1), batch_format="pandas").map_batches(
        lambda t: pa.table({"doc_id": pc.cast(t["doc_id"], pa.int64()),
                            "label": pc.cast(t["doc_id"], pa.int64())}),
        batch_format="pyarrow").materialize()

    for _ in range(max_iters):
        lab = {int(r["doc_id"]): int(r["label"])
               for b in labels.iter_batches(batch_format="pandas")
               for r in b.to_dict("records")}
        import ray as _ray
        ref = _ray.put(lab)

        def propagate(t: pa.Table) -> pa.Table:
            l = _ray.get(ref)
            a = t["id_a"].to_numpy()
            b = t["id_b"].to_numpy()
            la = np.array([l[x] for x in a])
            lb = np.array([l[x] for x in b])
            m = np.minimum(la, lb)
            return pa.table({"doc_id": np.r_[a, b], "label": np.r_[m, m]})

        msgs = edges.map_batches(propagate, batch_format="pyarrow")
        self_msgs = labels.map_batches(
            lambda t: t.select(["doc_id", "label"]), batch_format="pyarrow")
        new_labels = msgs.union(self_msgs).groupby("doc_id").aggregate(
            Min("label", alias_name="label")).materialize()
        changed = sum(
            int((b["label"].to_numpy() != np.array(
                [lab[i] for i in b["doc_id"].to_numpy()])).sum())
            for b in new_labels.iter_batches(batch_format="pandas"))
        labels = new_labels
        if changed == 0:
            break
    else:
        import warnings
        warnings.warn(
            f"connected_components_distributed: not converged after "
            f"{max_iters} rounds ({changed} labels still changing) — "
            f"component diameter exceeds max_iters; labels are partial",
            stacklevel=2)
    return labels.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "canonical_id": t["label"]}),
        batch_format="pyarrow")
