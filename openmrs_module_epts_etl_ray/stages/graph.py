"""Distributed PageRank over an edge list — the link-analysis companion to
the connected-components operator (``stages/dedup.py::connected_components``):
rank web/document/supplier graphs for crawl prioritization or quality
weighting in a training-data pipeline.

Reference parity note: the reference engine has no graph operators; this is
part of the beyond-reference large-scale-pipeline surface (like the dedup /
similarity family). Design mirrors the CC operator's two-path contract:

- ``engine="broadcast"`` (default, node-table fits the driver — threshold
  documented): node ids + out-degrees live in SORTED driver arrays,
  broadcast once via ``ray.put``; each iteration maps edge blocks with a
  zero-copy ``searchsorted`` probe, pre-collapses contributions per block
  (``bincount`` over the block's distinct targets only — never a dense
  n-vector), and ONE coarse-bucket exchange reduces them; the driver folds
  the groups-sized contribution relation into the next rank vector. Edges
  NEVER leave their blocks; per-iteration wire volume is O(distinct dst per
  block), the same partial-combine defense as the LWW replay.
- ``engine="join"`` (scale path, node table itself distributed): ranks are
  a Dataset; each iteration hash-joins edges to ranks on src, reduces
  contributions per dst, and left-joins back onto the node base. 3
  exchanges per iteration — correct at any node count, paid only when the
  node table genuinely cannot be broadcast.

Both paths are asserted equivalent in tests (and against a numpy power
iteration). Dangling-node mass is redistributed uniformly each iteration —
the standard stochastic-matrix completion.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

BROADCAST_NODE_THRESHOLD = 20_000_000  # ~480 MB of id/deg/rank arrays


def _node_table(edges: rd.Dataset, src: str, dst: str) -> rd.Dataset:
    """Distinct node ids over src ∪ dst (per-block dedup before the
    exchange; the unique() shuffle moves only distinct ids per block)."""
    def ids(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        both = pa.concat_arrays([
            t[src].combine_chunks().cast(pa.int64()),
            t[dst].combine_chunks().cast(pa.int64())])
        return pa.table({"node": pc.unique(both)})

    return edges.map_batches(ids, batch_format="pyarrow")


def pagerank(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    damping: float = 0.85,
    iterations: int = 10,
    engine: str = "broadcast",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Rank every node of the directed graph ``edges``; returns a Dataset
    ``(node int64, rank float64)`` summing to ~1.0."""
    if engine == "broadcast":
        return _pagerank_broadcast(edges, src, dst, damping, iterations)
    if engine == "join":
        return _pagerank_join(edges, src, dst, damping, iterations,
                              num_buckets)
    raise ValueError(f"unknown engine {engine!r}")


def _collect_nodes_degrees(edges, src, dst):
    """Driver-side sorted node array + aligned out-degree counts, built
    from per-block partials (ids and (src, n) pairs — never raw edges)."""
    from .pivot import bucketed_sum

    nodes_ds = _node_table(edges, src, dst)
    nodes = np.unique(np.concatenate(
        [t["node"].to_numpy() for t in nodes_ds.iter_batches(
            batch_format="pyarrow", batch_size=None)] or
        [np.array([], np.int64)]))

    def deg_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(t[src].combine_chunks().cast(pa.int64()))
        return pa.table({"node": vc.field("values"),
                         "deg": vc.field("counts")})

    deg_rel = bucketed_sum(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"], ["deg"])
    deg = np.zeros(len(nodes), np.int64)
    for t in deg_rel.iter_batches(batch_format="pyarrow", batch_size=None):
        idx = np.searchsorted(nodes, t["node"].to_numpy())
        deg[idx] = t["deg"].to_numpy()
    return nodes, deg


def _pagerank_broadcast(edges, src, dst, damping, iterations):
    import ray

    from .pivot import bucketed_sum

    # materialize BEFORE the node/degree collection: _collect_nodes_degrees
    # consumes the edge pipeline twice (ids + degrees) and the iteration
    # loop re-scans it, so an unmaterialized upstream (join + distinct)
    # would execute three times (measured ~1.7 s of repeated work at sf0.1)
    edges = edges.materialize()
    nodes, deg = _collect_nodes_degrees(edges, src, dst)
    n = len(nodes)
    if n == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))
    if n > BROADCAST_NODE_THRESHOLD:
        raise ValueError(
            f"{n} nodes exceeds the broadcast threshold "
            f"({BROADCAST_NODE_THRESHOLD}); use engine='join'")
    nodes_ref = ray.put(nodes)
    deg_ref = ray.put(deg)
    ranks = np.full(n, 1.0 / n)

    # The driver fold below already sums duplicate nodes across blocks
    # (agg[idx] += ...), so a pre-exchange reduce is pure overhead unless it
    # meaningfully shrinks the wire volume: with B edge blocks the raw
    # contribution relation is at most B x distinct-dst-per-block rows.
    # Small B => fold per-block partials directly (saves one sort-shuffle
    # PER ITERATION — measured 8 x ~0.45 s at sf0.1); large B => keep the
    # bucketed_sum exchange so the driver never sees more than n rows.
    pre_reduce = edges.num_blocks() > 64

    for _ in range(iterations):
        ranks_ref = ray.put(ranks)

        def contrib(t: pa.Table, *, _r=ranks_ref, _n=nodes_ref,
                    _d=deg_ref) -> pa.Table:
            nd, dg, rk = ray.get(_n), ray.get(_d), ray.get(_r)
            si = np.searchsorted(nd, t[src].combine_chunks()
                                 .cast(pa.int64()).to_numpy())
            di = np.searchsorted(nd, t[dst].combine_chunks()
                                 .cast(pa.int64()).to_numpy())
            w = rk[si] / dg[si]
            # collapse to the block's DISTINCT targets (sparse bincount)
            uniq, inv = np.unique(di, return_inverse=True)
            acc = np.bincount(inv, weights=w)
            return pa.table({"node": pa.array(nd[uniq], pa.int64()),
                             "contrib": pa.array(acc, pa.float64())})

        rel = edges.map_batches(contrib, batch_format="pyarrow")
        if pre_reduce:
            rel = bucketed_sum(rel, ["node"], ["contrib"], int_cols=False)

        agg = np.zeros(n)
        for t in rel.iter_batches(batch_format="pyarrow", batch_size=None):
            idx = np.searchsorted(nodes, t["node"].to_numpy())
            agg[idx] += t["contrib"].to_numpy()
        dangling = ranks[deg == 0].sum()
        ranks = (1.0 - damping) / n + damping * (agg + dangling / n)

    return rd.from_arrow(pa.table({"node": pa.array(nodes, pa.int64()),
                                   "rank": pa.array(ranks, pa.float64())}))


def _pagerank_join(edges, src, dst, damping, iterations, num_buckets):
    """Fully-distributed path: node state is a Dataset; per iteration one
    src-hash join, one dst contribution reduce, one backfill join."""
    from .joins import left_join
    from .pivot import bucketed_sum, distinct_keys

    nodes_ds = distinct_keys(_node_table(edges, src, dst), ["node"],
                             num_buckets=num_buckets).materialize()
    n = nodes_ds.count()
    if n == 0:
        return rd.from_arrow(pa.table({"node": pa.array([], pa.int64()),
                                       "rank": pa.array([], pa.float64())}))

    def deg_partial(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        vc = pc.value_counts(t[src].combine_chunks().cast(pa.int64()))
        return pa.table({"node": vc.field("values"),
                         "deg": vc.field("counts")})

    deg_rel = bucketed_sum(
        edges.map_batches(deg_partial, batch_format="pyarrow"),
        ["node"], ["deg"])

    def init_state(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "node": t["node"],
            "deg": pc.fill_null(t["deg"], 0),
            "rank": pa.array(np.full(len(t), 1.0 / n), pa.float64())})

    state = left_join(nodes_ds, deg_rel, ["node"]) \
        .map_batches(init_state, batch_format="pyarrow").materialize()
    edges = edges.select_columns([src, dst]).materialize()

    for _ in range(iterations):
        dangling = float(state.filter(expr="deg == 0").sum("rank") or 0.0)

        def edge_contrib(t: pa.Table) -> pa.Table:
            w = t["rank"].to_numpy() / t["deg"].to_numpy()
            di = t[dst].combine_chunks().cast(pa.int64()).to_numpy()
            uniq, inv = np.unique(di, return_inverse=True)
            acc = np.bincount(inv, weights=w)
            return pa.table({"node": pa.array(uniq, pa.int64()),
                             "contrib": pa.array(acc, pa.float64())})

        joined = edges.join(
            state.select_columns(["node", "rank", "deg"]),
            join_type="inner", num_partitions=_join_parts(),
            on=(src,), right_on=("node",))
        rel = bucketed_sum(
            joined.map_batches(edge_contrib, batch_format="pyarrow"),
            ["node"], ["contrib"], int_cols=False)

        def update(t: pa.Table, *, _dang=dangling) -> pa.Table:
            import pyarrow.compute as pc
            c = pc.fill_null(t["contrib"], 0.0).to_numpy()
            r = (1.0 - damping) / n + damping * (c + _dang / n)
            return pa.table({"node": t["node"], "deg": t["deg"],
                             "rank": pa.array(r, pa.float64())})

        state = left_join(state.select_columns(["node", "deg"]), rel,
                          ["node"]) \
            .map_batches(update, batch_format="pyarrow").materialize()

    return state.select_columns(["node", "rank"])


def _join_parts() -> int:
    from .joins import _default_partitions
    return _default_partitions()


def triangle_count(
    edges: rd.Dataset,
    *,
    src: str = "src",
    dst: str = "dst",
    max_degree: int = 10_000,
) -> rd.Dataset:
    """Global triangle count of an undirected graph — the subgraph-counting
    companion to pagerank/CC (dedup-graph density and community diagnostics).

    Cohen's MapReduce shape, Ray-Data-first: canonicalize edges to
    ``u < v`` (dedup), build each LOW node's sorted neighbor list in one
    key exchange, emit wedges ``(v, w), v < w`` per neighbor pair, then
    count wedges that close against the edge set — here via the broadcast
    bloom + exact membership probe (``stages/joins.py::semi_join``
    machinery) so the closing join ships no edge bytes at all when the
    edge relation fits the broadcast threshold, and falls back to the
    hash semi-join when it doesn't.

    Wedge volume is Σ deg(u)² over low endpoints — the hub guard caps the
    neighbor list at ``max_degree`` (documented approximation above it;
    exact below, which a dedup-similarity graph with banding guards always
    is). Returns one row: ``n_triangles``."""
    import pyarrow.compute as pc

    from .joins import semi_join
    from .pivot import distinct_keys

    def canon(t: pa.Table) -> pa.Table:
        u = pc.min_element_wise(t[src], t[dst])
        v = pc.max_element_wise(t[src], t[dst])
        keep = pc.not_equal(u, v)  # drop self loops
        return pa.table({"u": pc.cast(u, pa.int64()),
                         "v": pc.cast(v, pa.int64())}).filter(keep)

    ce = distinct_keys(edges.map_batches(canon, batch_format="pyarrow"),
                       ["u", "v"]).materialize()

    # COARSE-bucket the low endpoint: grouping the exchange on raw u would
    # invoke Python once per node (the map_groups-call-overhead trap
    # documented at dedup._bucket_pairs); inside one coarse group the
    # per-node wedge emission only loops over nodes with degree >= 2
    n_coarse = 256

    def add_coarse(t: pa.Table) -> pa.Table:
        from ..functions.hashing import fmix64
        h = fmix64(t["u"].to_numpy())
        return t.append_column("_c", pa.array(
            (h % np.uint64(n_coarse)).astype(np.int64)))

    def wedges(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["u", "v"], kind="stable")
        u_all = g["u"].to_numpy()
        v_all = g["v"].to_numpy()
        starts = np.flatnonzero(np.r_[True, u_all[1:] != u_all[:-1]])
        ends = np.r_[starts[1:], len(u_all)]
        outs_u, outs_v, outs_w = [], [], []
        for lo, hi in zip(starts, ends):
            if hi - lo < 2:
                continue
            nb = v_all[lo:min(hi, lo + max_degree)]
            ia, ib = np.triu_indices(len(nb), k=1)
            outs_u.append(np.full(len(ia), u_all[lo], np.int64))
            outs_v.append(nb[ia])
            outs_w.append(nb[ib])
        if not outs_u:
            return pd.DataFrame({"u": pd.Series([], dtype="int64"),
                                 "v": pd.Series([], dtype="int64"),
                                 "w": pd.Series([], dtype="int64")})
        return pd.DataFrame({"u": np.concatenate(outs_u),
                             "v": np.concatenate(outs_v),
                             "w": np.concatenate(outs_w)})

    wed = ce.map_batches(add_coarse, batch_format="pyarrow") \
        .groupby("_c").map_groups(
            lambda g: wedges(g.drop(columns=["_c"])),
            batch_format="pandas")
    # wedge (u, v, w) closes iff edge (v, w) exists (v < w by construction)
    closed = semi_join(
        wed.map_batches(lambda t: t.rename_columns(["w_u", "u", "v"]),
                        batch_format="pyarrow"),
        ce, ["u", "v"])
    n = closed.count()
    return rd.from_arrow(pa.table({"n_triangles": pa.array([n], pa.int64())}))
