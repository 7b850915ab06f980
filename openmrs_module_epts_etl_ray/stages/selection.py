"""Distributed selection: exact k-th order statistic / global quantile.

The exact per-group percentile operator (``stages/windows.py``) holds one
group's values in one task — fine for per-tenant rollups, impossible for a
GLOBAL quantile over a 100-TB column. This module computes an exact global
order statistic with only counts on the wire:

1. bound the value range (one ``Min``/``Max`` aggregate);
2. per-block fixed-edge histogram partials (``np.histogram`` — each block
   contributes one tiny count vector), summed driver-side;
3. the bucket containing rank k becomes the new range; repeat until the
   candidate bucket holds few enough values;
4. collect ONLY that sliver (a range filter — the only values that ever
   reach the driver) and pick the order statistic exactly.

Convergence: each round shrinks the candidate set ~``num_buckets``×, so a
10^10-row column resolves in 3–4 scans of counts; a column with one
mega-duplicate value short-circuits (lo == hi). The quantile rank rule is
the same discrete ``floor(q * (n - 1))`` the per-group operator and its SQL
oracle state, so results are byte-exact, never interpolation-dependent.

Reference analogue: none (training-data extension — the global
quality-score gate of a corpus filter).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

_COLLECT_CAP = 2_000_000  # values small enough to pull to the driver


def exact_order_stat(
    ds: rd.Dataset,
    value_col: str,
    k: int,
    *,
    num_buckets: int = 4096,
    max_rounds: int = 8,
) -> float:
    """The (0-based) rank-``k`` smallest value of ``value_col``. Nulls are
    excluded (SQL ordering semantics). The input plan executes once per
    refinement round — pass a materialized dataset when composing."""
    from ray.data.aggregate import Max, Min

    bounds = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = bounds[f"min({value_col})"], bounds[f"max({value_col})"]
    if lo is None:
        raise ValueError(f"no non-null values in {value_col!r}")
    lo, hi = float(lo), float(hi)
    if k < 0:
        raise ValueError(f"rank must be non-negative, got {k}")

    hi_incl = True  # candidate interval [lo, hi] vs [lo, hi)

    for _ in range(max_rounds):
        if lo == hi:
            return lo
        edges = np.linspace(lo, hi, num_buckets + 1)

        def hist(df: pd.DataFrame, *, _edges=edges,
                 _incl=hi_incl) -> pd.DataFrame:
            v = df[value_col].to_numpy(dtype=np.float64)
            v = v[~np.isnan(v)]
            # candidate-interval membership, NOT np.histogram's
            # last-bin-inclusive rule: a refined interval is half-open
            v = v[(v >= _edges[0]) &
                  ((v <= _edges[-1]) if _incl else (v < _edges[-1]))]
            counts, _ = np.histogram(v, bins=_edges)
            nz = np.flatnonzero(counts)  # sparse: a block rarely touches
            return pd.DataFrame({"b": nz.astype(np.int64),  # every bucket
                                 "c": counts[nz].astype(np.int64)})

        counts = np.zeros(num_buckets, dtype=np.int64)
        for part in ds.map_batches(hist, batch_format="pandas") \
                      .iter_batches(batch_format="pandas"):
            np.add.at(counts, part["b"].to_numpy(), part["c"].to_numpy())
        cum = np.cumsum(counts)
        if k >= cum[-1]:
            raise ValueError(f"rank {k} >= population {cum[-1]}")
        b = int(np.searchsorted(cum, k, side="right"))
        k -= int(cum[b - 1]) if b else 0
        # np.histogram folds v == hi into the LAST bin when the interval
        # is inclusive; every other refined bucket is [edge_b, edge_b+1)
        hi_incl = hi_incl and b == num_buckets - 1
        lo, hi = float(edges[b]), float(edges[b + 1])
        if counts[b] <= _COLLECT_CAP:
            break

    def sliver(df: pd.DataFrame, *, _incl=hi_incl) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        m = (v >= lo) & ((v <= hi) if _incl else (v < hi))
        return pd.DataFrame({value_col: v[m]})

    vals = np.concatenate(
        [b[value_col].to_numpy() for b in
         ds.map_batches(sliver, batch_format="pandas")
           .iter_batches(batch_format="pandas")] or
        [np.empty(0)])
    return float(np.partition(vals, k)[k])


def exact_quantile(ds: rd.Dataset, value_col: str, q: float,
                   *, n: int | None = None, **kw) -> float:
    """Global exact quantile under the discrete rule
    ``sorted[floor(q * (n - 1))]`` (same rule as the per-group operator
    and its SQL oracle). ``n`` = non-null count, computed if omitted."""
    if not 0 <= q <= 1:
        raise ValueError(f"quantile must be in [0, 1], got {q}")
    if n is None:
        n = ds.map_batches(
            lambda df: pd.DataFrame(
                {"c": [int(df[value_col].notna().sum())]}),
            batch_format="pandas").sum("c")
    if not n:
        raise ValueError(f"no non-null values in {value_col!r}")
    return exact_order_stat(ds, value_col, int(np.floor(q * (n - 1))), **kw)


def exact_order_stat_int(
    ds: rd.Dataset,
    value_col: str,
    k: int,
    *,
    num_buckets: int = 4096,
    max_rounds: int = 16,
) -> int:
    """The (0-based) rank-``k`` smallest value of an INT64 ``value_col``.

    Same counts-only refinement as :func:`exact_order_stat`, but the
    candidate interval is integer ``[lo, hi]`` with integer bucket edges —
    exact over the full int64 domain, where the float variant loses
    distinctions past 2^53 (packed composite sort keys live up there).
    Nulls are excluded."""
    from ray.data.aggregate import Max, Min

    bounds = ds.aggregate(Min(value_col), Max(value_col))
    lo, hi = bounds[f"min({value_col})"], bounds[f"max({value_col})"]
    if lo is None:
        raise ValueError(f"no non-null values in {value_col!r}")
    lo, hi = int(lo), int(hi)
    if k < 0:
        raise ValueError(f"rank must be non-negative, got {k}")

    for _ in range(max_rounds):
        if lo == hi:
            return lo
        span = hi - lo + 1
        nb = min(num_buckets, span)
        width = -(-span // nb)  # ceil

        def hist(df: pd.DataFrame, *, _lo=lo, _hi=hi, _w=width,
                 _nb=nb) -> pd.DataFrame:
            v = df[value_col].dropna().to_numpy(dtype=np.int64)
            v = v[(v >= _lo) & (v <= _hi)]
            # (v - lo) in uint64: an int64 subtraction wraps when the
            # column range spans > 2^63 (packed composite keys) — the
            # two's-complement uint64 difference is the true distance
            dv = v.astype(np.uint64) - np.uint64(_lo & 0xFFFFFFFFFFFFFFFF)
            counts = np.bincount(
                (dv // np.uint64(_w)).astype(np.int64), minlength=_nb)
            nz = np.flatnonzero(counts)
            return pd.DataFrame({"b": nz.astype(np.int64),
                                 "c": counts[nz].astype(np.int64)})

        counts = np.zeros(nb, dtype=np.int64)
        for part in ds.map_batches(hist, batch_format="pandas") \
                      .iter_batches(batch_format="pandas"):
            np.add.at(counts, part["b"].to_numpy(), part["c"].to_numpy())
        cum = np.cumsum(counts)
        if k >= cum[-1]:
            raise ValueError(f"rank {k} >= population {cum[-1]}")
        b = int(np.searchsorted(cum, k, side="right"))
        k -= int(cum[b - 1]) if b else 0
        lo, hi = lo + b * width, min(lo + (b + 1) * width - 1, hi)
        if counts[b] <= _COLLECT_CAP:
            break

    fl, fh = lo, hi

    def sliver(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].dropna().to_numpy(dtype=np.int64)
        return pd.DataFrame({value_col: v[(v >= fl) & (v <= fh)]})

    vals = np.concatenate(
        [b[value_col].to_numpy() for b in
         ds.map_batches(sliver, batch_format="pandas")
           .iter_batches(batch_format="pandas")] or
        [np.empty(0, np.int64)])
    return int(np.partition(vals, k)[k])


def ntile_assign(
    ds: rd.Dataset,
    value_col: str,
    k: int,
    *,
    out_col: str = "tile",
    **order_stat_kw,
) -> rd.Dataset:
    """SQL ``NTILE(k) OVER (ORDER BY value_col)`` — WITHOUT a global sort.

    Requires DISTINCT int64 values (pack tie-breaks into the low bits of
    a composite key upstream; :func:`exact_order_stat_int` keeps the full
    64-bit width exact). With distinct values, NTILE's rank rule
    (the first ``n % k`` tiles take ``n // k + 1`` rows) collapses to
    k−1 VALUE thresholds at the tile-boundary order statistics
    ``u_i = i*(n//k) + min(i, n%k)``; each row's tile is then
    ``1 + #{thresholds < value}`` — a stateless vectorized
    ``searchsorted`` per block. Total cost: k−1 counts-only selection
    passes + one map; nothing row-sized moves.

    ``ds`` is re-executed per threshold — pass a materialized dataset.
    """
    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")

    def _counts(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({"rows": [len(df)],
                             "nn": [int(df[value_col].notna().sum())]})

    c = ds.map_batches(_counts, batch_format="pandas").to_pandas()
    rows, n = int(c["rows"].sum()), int(c["nn"].sum())
    if rows != n:
        raise ValueError(
            f"{value_col!r} contains {rows - n} nulls — NTILE here "
            f"requires distinct non-null int64 values (filter or fill "
            f"upstream)")
    if n == 0:
        return ds.map_batches(
            lambda df: df.assign(**{out_col: np.empty(0, np.int64)}),
            batch_format="pandas")
    q, r = divmod(n, k)
    ranks = [i * q + min(i, r) for i in range(1, k)
             if i * q + min(i, r) < n]
    thresholds = np.array(
        sorted(exact_order_stat_int(ds, value_col, u - 1, **order_stat_kw)
               for u in ranks),
        dtype=np.int64)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        v = df[value_col].to_numpy(dtype=np.int64)
        tile = 1 + np.searchsorted(thresholds, v, side="left")
        return df.assign(**{out_col: tile.astype(np.int64)})

    return ds.map_batches(assign, batch_format="pandas")


def pareto_skyline_2d(
    ds: rd.Dataset,
    x_col: str,
    y_col: str,
) -> rd.Dataset:
    """2-D Pareto frontier: the distinct ``(x, y)`` points not dominated
    by any other (dominator: ``x' <= x AND y' >= y`` with one strict) —
    minimize x, maximize y (flip signs upstream for other orientations).
    Both columns int64.

    The skyline filter is ASSOCIATIVE (a locally dominated point is
    globally dominated, and its dominator survives into the local
    skyline or is itself dominated by one that does), so: one vectorized
    local skyline per block — sort (x asc, y desc), keep points whose y
    exceeds the running max of all better-priced predecessors — then the
    tiny candidate union reduces through the SAME kernel in one task.
    Nothing row-sized shuffles; the exchange is skyline-sized.

    Reference analogue: none (analytics extension — cost/recency
    frontiers, price-quality efficient sets).
    """
    def local(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        x = t[x_col].combine_chunks().cast(pa.int64()).to_numpy()
        y = t[y_col].combine_chunks().cast(pa.int64()).to_numpy()
        if len(x) == 0:
            return pa.table({x_col: np.empty(0, np.int64),
                             y_col: np.empty(0, np.int64)})
        order = np.lexsort((-y, x))
        xs, ys = x[order], y[order]
        # distinct points (lexsort-boundary dedup)
        first = np.r_[True, (xs[1:] != xs[:-1]) | (ys[1:] != ys[:-1])]
        xs, ys = xs[first], ys[first]
        mx = np.maximum.accumulate(ys)
        keep = np.r_[True, ys[1:] > mx[:-1]]
        return pa.table({x_col: xs[keep], y_col: ys[keep]})

    candidates = ds.map_batches(local, batch_format="pyarrow")
    return candidates.repartition(1) \
                     .map_batches(local, batch_format="pyarrow",
                                  batch_size=None)


def numeric_histogram(
    ds: rd.Dataset,
    value_col: str,
    width: float,
    *,
    origin: float = 0.0,
    bin_col: str = "bin",
    count_col: str = "n",
) -> rd.Dataset:
    """Fixed-width histogram: one row per occupied bin, ``bin =
    floor((x - origin) / width)`` (int64) with its count — the numeric
    profiling primitive behind range partitioning, outlier gates, and
    data-quality dashboards.

    Bin ids are a single IEEE double subtract/divide/floor, so any engine
    computes the identical bin for the identical input — the histogram is
    byte-exact portable (unlike equi-DEPTH bins, which depend on order
    statistics). Each block folds to (bin, count) partials via one
    ``np.bincount``; the exchange is bins-sized, never row-sized. Nulls
    are excluded (SQL GROUP BY drops them the same way).
    """
    from ray.data.aggregate import Sum

    if width <= 0:
        raise ValueError(f"width must be positive, got {width}")

    def partial(df: pd.DataFrame) -> "pa.Table":
        import pyarrow as pa
        v = df[value_col].to_numpy(dtype=np.float64)
        v = v[~np.isnan(v)]
        b = np.floor((v - origin) / width).astype(np.int64)
        if len(b) == 0:
            return pa.table({bin_col: np.empty(0, np.int64),
                             count_col: np.empty(0, np.int64)})
        # sparse: np.unique is sized by OCCUPIED bins — a dense
        # bincount over the bin RANGE would allocate terabytes for one
        # outlier value
        occ, cnt = np.unique(b, return_counts=True)
        # Arrow partials — pandas blocks hit aggregate's per-row loop
        return pa.table({bin_col: occ.astype(np.int64),
                         count_col: cnt.astype(np.int64)})

    return ds.map_batches(partial, batch_format="pandas") \
             .groupby(bin_col).aggregate(Sum(count_col, alias_name=count_col))
