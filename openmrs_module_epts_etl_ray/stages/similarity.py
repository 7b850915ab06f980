"""Similarity search over an embedding column (``list<float>``).

Baseline: brute-force cosine top-k — the query matrix is broadcast ONCE via
``ray.put`` and every batch does one numpy matmul + per-query local top-k;
a final small groupby merges the per-batch top-k into the global top-k
(classic scatter-gather, no corpus shuffle). Scale path: IVF-style routing —
assign vectors to coarse centroids (seeded kmeans-ish on a sample), shuffle
once on centroid id, and search only the probed cells.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data as rd


def _to_matrix(col) -> np.ndarray:
    return np.stack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(M: np.ndarray) -> np.ndarray:
    return M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)


class _BatchTopK:
    """Per-batch scored candidates: query matrix fetched once per actor."""

    def __init__(self, queries_ref, query_ids, k, vec_col, id_col):
        self.Q = _normalize(ray.get(queries_ref))       # (q, d)
        self.query_ids = np.asarray(query_ids)
        self.k = k
        self.vec_col = vec_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        V = _normalize(_to_matrix(batch[self.vec_col].to_numpy()))   # (n, d)
        ids = batch[self.id_col].to_numpy()
        S = self.Q @ V.T                                              # (q, n)
        k = min(self.k, S.shape[1])
        # full lexsort per query row: deterministic (cosine desc, id asc)
        # tie-break matching the oracle's ORDER BY cos DESC, vec_id ASC even
        # when duplicate vectors straddle the k-th slot (argpartition splits
        # boundary ties arbitrarily); q is small, so q * n log n is cheap
        idx = np.stack([np.lexsort((ids, -S[qi]))[:k]
                        for qi in range(S.shape[0])])
        out = {
            "query_id": np.repeat(self.query_ids, k),
            self.id_col: ids[idx].ravel(),
            "cosine": np.take_along_axis(S, idx, axis=1).ravel(),
        }
        return pd.DataFrame(out)


def brute_force_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    *,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> rd.Dataset:
    """Global top-k by cosine per query. Deterministic tie-break: higher
    cosine first, then smaller id."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    # instance form (task pool, fuses with the read): the broadcast query
    # matrix is resolved once at driver-side construction and rides in the
    # (small) pickled instance
    scored = ds.map_batches(
        _BatchTopK(queries_ref=qref, query_ids=query_ids, k=k,
                   vec_col=vec_col, id_col=id_col),
        batch_format="pandas",
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(merge, batch_format="pandas")


def ivf_topk(
    ds: rd.Dataset,
    queries: np.ndarray,
    query_ids,
    *,
    k: int = 5,
    n_cells: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 13,
) -> rd.Dataset:
    """IVF-bucketed ANN: coarse centroids from a seeded sample; vectors are
    scored only when their cell is probed by some query. Approximate — recall
    depends on n_probe/n_cells; the scale path for corpora where brute force
    per batch is too hot."""
    sample = _to_matrix([r[vec_col] for r in ds.take(min(2048, 4 * n_cells * 8))])
    rng = np.random.default_rng(seed)
    centroids = sample[rng.choice(len(sample), n_cells, replace=False)]
    # a few Lloyd iterations on the sample (driver-side, tiny)
    for _ in range(5):
        d = ((sample[:, None, :] - centroids[None, :, :]) ** 2).sum(-1)
        assign = d.argmin(1)
        for c in range(n_cells):
            m = assign == c
            if m.any():
                centroids[c] = sample[m].mean(0)
    C = _normalize(centroids)
    Q = _normalize(np.asarray(queries, dtype=np.float64))
    probed = np.argsort(-(Q @ C.T), axis=1)[:, :n_probe]          # cells per query
    cref = ray.put(centroids)

    class CellFilterScore:
        """Fully vectorized probe filter: cell assignment via the matmul
        distance form (||c||² − 2v·c), probe admissibility via a
        (query, cell) boolean membership matrix indexed per batch — no
        per-row Python (the r1 version paid an O(q) ``list.index`` per
        emitted row)."""

        def __init__(self, queries_ref, query_ids, k, vec_col, id_col):
            self.Q = _normalize(ray.get(queries_ref))
            self.query_ids = np.asarray(query_ids)
            self.k = k
            self.vec_col = vec_col
            self.id_col = id_col
            self.C = ray.get(cref)
            self.c2 = (self.C ** 2).sum(1)
            M = np.zeros((len(self.query_ids), n_cells), dtype=bool)
            M[np.arange(len(self.query_ids))[:, None], probed] = True
            self.M = M

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            V = _to_matrix(batch[self.vec_col].to_numpy())
            ids = batch[self.id_col].to_numpy()
            cell = (self.c2[None, :] - 2.0 * (V @ self.C.T)).argmin(1)
            allowed = self.M[:, cell]                       # (q, n)
            keep = allowed.any(axis=0)
            if not keep.any():
                return pd.DataFrame({"query_id": [], self.id_col: [], "cosine": []})
            Vn = _normalize(V[keep])
            ids = ids[keep]
            allowed = allowed[:, keep]
            S = np.where(allowed, self.Q @ Vn.T, -np.inf)   # (q, n)
            k = min(self.k, S.shape[1])
            idx = np.stack([np.lexsort((ids, -S[qi]))[:k]
                            for qi in range(S.shape[0])])
            cos = np.take_along_axis(S, idx, axis=1).ravel()
            ok = np.isfinite(cos)
            return pd.DataFrame({
                "query_id": np.repeat(self.query_ids, k)[ok],
                self.id_col: ids[idx].ravel()[ok],
                "cosine": cos[ok],
            })

    qref_ids = list(query_ids)
    # instance form (task pool, fuses with the read); centroids + membership
    # matrix are small and ride in the pickled instance
    scored = ds.map_batches(
        CellFilterScore(queries_ref=ray.put(Q), query_ids=qref_ids, k=k,
                        vec_col=vec_col, id_col=id_col),
        batch_format="pandas",
    )

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cosine", id_col], ascending=[False, True]).head(k)
        g = g.reset_index(drop=True)
        g["rank"] = np.arange(1, len(g) + 1, dtype=np.int64)
        return g

    return scored.groupby("query_id").map_groups(merge, batch_format="pandas")


# ---------------------------------------------------------------------------
# SemDeDup: coarse clustering + within-cluster pairwise near-dup
# ---------------------------------------------------------------------------

def assign_clusters(
    ds: rd.Dataset,
    centroids: np.ndarray,
    centroid_ids,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    keep_vec: bool = False,
) -> rd.Dataset:
    """Assign every vector to its max-cosine centroid (SemDeDup's coarse
    step). ``centroid_ids`` must be sorted ascending — ties break to the
    smallest centroid id (numpy argmax keeps the first max, which IS the
    smallest id under that ordering; matches the oracle's ``ORDER BY cos
    DESC, cid ASC``). Stateless broadcast matmul per batch — no shuffle."""
    order = np.argsort(np.asarray(centroid_ids))
    cids = np.asarray(centroid_ids)[order]
    C = _normalize(np.asarray(centroids, dtype=np.float64)[order])
    cref = ray.put((C, cids))

    class Assign:
        def __init__(self):
            self.C, self.cids = ray.get(cref)

        def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
            V = _normalize(_to_matrix(batch[vec_col].to_numpy()))
            S = V @ self.C.T                      # (n, K)
            best = S.argmax(axis=1)
            out = {
                id_col: batch[id_col].to_numpy(),
                "cluster_id": self.cids[best],
                "cosine": S[np.arange(len(best)), best],
            }
            if keep_vec:
                out[vec_col] = batch[vec_col].to_numpy()
            return pd.DataFrame(out)

    return ds.map_batches(Assign(), batch_format="pandas")


def semdedup_pairs(
    ds: rd.Dataset,
    centroids: np.ndarray,
    centroid_ids,
    *,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    max_cluster: int = 8192,
) -> rd.Dataset:
    """SemDeDup (Abbas et al. 2023): exact pairwise cosine is computed only
    WITHIN each coarse cluster — the cluster assignment bounds the
    quadratic blow-up, and the single shuffle moves each vector once
    (grouped by ``cluster_id``). Emits ``(id_a, id_b, cluster_id,
    cosine)`` for in-cluster pairs with cosine >= threshold, id_a < id_b.

    Clusters larger than ``max_cluster`` are truncated to their
    ``max_cluster`` smallest ids (documented guard against a degenerate
    centroid attracting everything; same pattern as the LSH
    ``max_bucket``)."""
    assigned = assign_clusters(
        ds, centroids, centroid_ids,
        vec_col=vec_col, id_col=id_col, keep_vec=True)

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(id_col, kind="stable")
        if len(g) > max_cluster:
            g = g.head(max_cluster)
        ids = g[id_col].to_numpy()
        V = _normalize(_to_matrix(g[vec_col].to_numpy()))
        S = V @ V.T
        ia, ib = np.triu_indices(len(g), k=1)
        keep = S[ia, ib] >= threshold
        return pd.DataFrame({
            "id_a": ids[ia[keep]],
            "id_b": ids[ib[keep]],
            "cluster_id": g["cluster_id"].to_numpy()[ia[keep]],
            "cosine": S[ia[keep], ib[keep]],
        })

    return assigned.groupby("cluster_id").map_groups(
        pairs, batch_format="pandas")


def _list_matrix(col: "pa.ChunkedArray") -> np.ndarray:
    """Zero-copy-ish (d-dim list column) -> (n, d) float64 matrix via the
    flattened value buffer; ``list_flatten`` is slice-safe."""
    import pyarrow as pa
    import pyarrow.compute as pc

    flat = pc.list_flatten(col)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    n = len(col)
    return flat.to_numpy(zero_copy_only=False).astype(np.float64, copy=False) \
        .reshape(n, -1)


def kmeans(
    ds: rd.Dataset,
    *,
    k: int = 8,
    iters: int = 10,
    tol: float = 0.0,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    init_centroids: np.ndarray | None = None,
) -> tuple[rd.Dataset, np.ndarray]:
    """Distributed Lloyd k-means over an embedding column (squared
    euclidean; ties break to the lowest cluster index via argmin).
    Returns ``(assignments, centroids)`` — assignments is a Dataset of
    ``(id, cluster)``, centroids the final (k, d) matrix.

    Scale shape — an ITERATIVE algorithm with NO all-to-all exchange:

    - the input is pinned once (``materialize``) and each Lloyd round is
      one linear ``map_batches`` scan: assignment is a broadcast matmul
      (centroids are k x d, riding the task closure), and per-cluster
      (count, vector-sum) partials fold INSIDE the block via
      sort + ``add.reduceat``;
    - only k rows per block reach the driver per round (k * nblocks
      total — centroid-sized, independent of n), which folds them and
      re-broadcasts; an empty cluster keeps its previous centroid;
    - early-exit when the max centroid L2 shift drops to ``tol``.

    ``init_centroids`` defaults to the first ``k`` input vectors (block
    order — deterministic for a parquet read); pass an explicit matrix
    for reproducible experiments across differently-blocked inputs.
    """
    import pyarrow as pa

    pinned = ds.map_batches(
        lambda t: t.select([id_col, vec_col]), batch_format="pyarrow") \
        .materialize()

    if init_centroids is None:
        head = pinned.take(k)
        C = np.stack([np.asarray(r[vec_col], dtype=np.float64) for r in head])
    else:
        C = np.asarray(init_centroids, dtype=np.float64).copy()
    if len(C) != k:
        raise ValueError(f"need {k} initial centroids, got {len(C)}")

    def partials(cent: np.ndarray):
        half = 0.5 * (cent * cent).sum(axis=1)

        def fn(t: pa.Table) -> pa.Table:
            X = _list_matrix(t[vec_col])
            a = np.argmax(X @ cent.T - half, axis=1)
            order = np.argsort(a, kind="stable")
            uniq, starts = np.unique(a[order], return_index=True)
            sums = np.add.reduceat(X[order], starts, axis=0)
            counts = np.diff(np.append(starts, len(a)))
            return pa.table({
                "cluster": uniq.astype(np.int64),
                "n": counts.astype(np.int64),
                "s": pa.array(list(sums), type=pa.list_(pa.float64())),
            })
        return fn

    for _ in range(iters):
        rows = pinned.map_batches(partials(C), batch_format="pyarrow").take_all()
        sums = np.zeros_like(C)
        counts = np.zeros(k, dtype=np.int64)
        for r in rows:
            sums[r["cluster"]] += np.asarray(r["s"])
            counts[r["cluster"]] += r["n"]
        new = np.where(counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None], C)
        shift = float(np.linalg.norm(new - C, axis=1).max())
        C = new
        if shift <= tol:
            break

    half = 0.5 * (C * C).sum(axis=1)
    Cf = C

    def assign(t: pa.Table) -> pa.Table:
        X = _list_matrix(t[vec_col])
        a = np.argmax(X @ Cf.T - half, axis=1)
        return pa.table({id_col: t[id_col], "cluster": a.astype(np.int64)})

    return pinned.map_batches(assign, batch_format="pyarrow"), C


def quantize_embeddings(
    ds,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> "rd.Dataset":
    """Symmetric int8 quantization per vector — the ANN memory lever at
    100 TB (float32 -> int8 is 4x less object-store and wire volume for the
    IVF/brute-force probes; dot products on int8 codes rescale by
    ``scale_a * scale_b / 127^2``).

    code = floor(x / scale * 127 + 0.5), scale = max |x| of the vector —
    every step is an exact IEEE double op (no libm), so the oracle SQL
    computes the identical integers. Zero vectors quantize to all-zero
    codes with scale 0. Emits the LONG relation (id, pos, scale, code):
    scalar columns hash-compare exactly, and the long form is what the
    int8 probe consumes. Stateless per-batch numpy; no shuffle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    def quant(batch: pd.DataFrame) -> pa.Table:
        if len(batch) == 0:  # np.stack inside _to_matrix rejects empty
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "scale": pa.array([], pa.float64()),
                             "code": pa.array([], pa.int64())})
        M = _to_matrix(batch[vec_col]).astype(np.float64)
        n, dim = M.shape
        if dim == 0:  # zero-length vectors: nothing to quantize
            return pa.table({id_col: pa.array([], pa.int64()),
                             "pos": pa.array([], pa.int64()),
                             "scale": pa.array([], pa.float64()),
                             "code": pa.array([], pa.int64())})
        scale = np.abs(M).max(axis=1)
        safe = np.where(scale == 0, 1.0, scale)
        codes = np.floor(M / safe[:, None] * 127.0 + 0.5).astype(np.int64)
        codes[scale == 0] = 0
        return pa.table({
            id_col: pa.array(np.repeat(batch[id_col].to_numpy(), dim)),
            "pos": pa.array(np.tile(np.arange(1, dim + 1), n)),
            "scale": pa.array(np.repeat(scale, dim)),
            "code": pa.array(codes.ravel()),
        })

    return ds.map_batches(quant, batch_format="pandas")
