"""Pivot (crosstab) and rollup aggregation: long rows → wide feature rows /
subtotal cubes (the feature-engineering + OLAP step of an event pipeline).

Scale shape shared by both operators: aggregation is folded INSIDE each
block first (one vectorized crosstab / groupby-sum per batch), so the
exchange moves at most one row per (key, block) — the same partial-combine
defense the LWW replay uses for zipf-hot keys. The final reduce is a
COARSE-BUCKET ``map_groups`` (hash the key into ~2×CPU buckets, one
vectorized pandas fold per bucket): Ray 2.49's native
``groupby().aggregate(Sum…)`` pays a sort-shuffle whose driver overhead
dwarfs these partial relations (measured 10 s vs 0.3 s on a 15k-row
partial at 32 cpus), and per-key ``map_groups`` would pay one Python call
per key. Counts/measures are int64-exact, so the distributed sum is
order-independent and engine-portable.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from ..functions.hashing import BUCKET_COL, add_bucket


def _default_buckets() -> int:
    try:
        import ray
        return max(16, int(ray.cluster_resources().get("CPU", 16)))
    except Exception:
        return 16


def bucketed_sum(
    ds: rd.Dataset,
    keys: list[str],
    cols: list[str],
    *,
    num_buckets: int | None = None,
    int_cols: bool = True,
) -> rd.Dataset:
    """Distributed ``GROUP BY keys SUM(cols)`` over an already-partial
    relation: ONE hash exchange on a coarse bucket of ``keys``, then one
    vectorized pandas fold per bucket (no per-key Python, no sort).
    ``int_cols=False`` keeps float measures as float64 (last-ulp
    order-dependence accepted — e.g. PageRank contributions)."""
    nb = num_buckets or _default_buckets()

    def tag(t):
        return add_bucket(t, tuple(keys), nb)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        # dropna=False: SQL GROUP BY keeps null keys as a group; the
        # pandas default silently deleted null-keyed partials
        g = df.drop(columns=[BUCKET_COL]) \
              .groupby(keys, as_index=False, sort=False,
                       dropna=False)[cols].sum()
        if int_cols:
            for c in cols:
                g[c] = g[c].astype("int64")
        return g

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL).map_groups(fold, batch_format="pandas")


def distinct_keys(
    ds: rd.Dataset,
    keys: list[str],
    *,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Distributed ``SELECT DISTINCT keys``: per-block drop_duplicates
    partials, one coarse-bucket exchange, vectorized dedup per bucket."""
    nb = num_buckets or _default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        return df[keys].drop_duplicates()

    def tag(t):
        return add_bucket(t, tuple(keys), nb)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        return df.drop(columns=[BUCKET_COL]).drop_duplicates()

    return ds.map_batches(partial, batch_format="pandas") \
             .map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL).map_groups(fold, batch_format="pandas")


def pivot_counts(
    ds: rd.Dataset,
    key_col: str,
    pivot_col: str,
    categories: list[str],
    *,
    prefix: str = "n_",
) -> rd.Dataset:
    """One row per ``key_col`` value with ``{prefix}{category}`` int64
    count columns plus ``n_events`` (all rows, any category).

    The category list is EXPLICIT: at 10^10 rows a driver-side distinct
    scan to discover columns is a full pass; real pipelines know their
    event taxonomy. Events outside ``categories`` still count toward
    ``n_events``.
    """
    if not categories:
        raise ValueError("categories must be non-empty")
    cols = [f"{prefix}{c}" for c in categories]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        keys, inv = np.unique(df[key_col].to_numpy(), return_inverse=True)
        out = {key_col: keys,
               "n_events": np.bincount(inv, minlength=len(keys)).astype(np.int64)}
        pv = df[pivot_col].to_numpy()
        for cat, col in zip(categories, cols):
            out[col] = np.bincount(inv, weights=pv == cat,
                                   minlength=len(keys)).astype(np.int64)
        return pd.DataFrame(out)

    return bucketed_sum(ds.map_batches(partial, batch_format="pandas"),
                        [key_col], ["n_events"] + cols)


def rollup_sum(
    ds: rd.Dataset,
    dims: list[str],
    measures: list[str],
    *,
    count_col: str = "n",
    all_label: str = "ALL",
) -> rd.Dataset:
    """``GROUP BY ROLLUP(dims…)``: int64 measure sums + row counts at every
    rollup level — finest ``(d1, …, dk)``, then ``(d1, …, d(k-1))``, … up
    to the grand total, with rolled-up dimension columns set to
    ``all_label`` (OLAP subtotal cubes, mixture dashboards).

    ONE exchange total: each block emits partials for EVERY rollup level
    (rolled-up dims already relabelled ``all_label``), and a single
    coarse-bucket reduce on the full dim tuple folds all levels at once —
    ``all_label`` is just another key value. Per-block partial volume is
    bounded by (k+1) × the block's finest group count, and the wire only
    ever carries group-sized rows (the same partial-combine defense as the
    LWW replay; a three-exchange level-by-level plan measured ~3× slower
    from fixed per-exchange overhead alone). Measures must be int64
    (pre-convert money to cents): integer sums are associative, so the
    distributed fold equals sequential SQL byte-for-byte; float rollups
    differ in the last ulp. Dimensions must be non-null strings
    (``all_label`` shares the column).
    """
    if not dims:
        raise ValueError("dims must be non-empty")
    cols = list(measures) + [count_col]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=dims + cols)
        outs = []
        for depth in range(len(dims), -1, -1):
            keep = dims[:depth]
            if keep:
                g = df.groupby(keep, as_index=False, sort=False)[measures].sum()
                g[count_col] = df.groupby(keep, sort=False).size().to_numpy()
            else:
                g = df[measures].sum().to_frame().T
                g[count_col] = len(df)
            for d in dims[depth:]:
                g[d] = all_label
            outs.append(g[dims + cols])
        out = pd.concat(outs, ignore_index=True)
        for m in cols:
            out[m] = out[m].astype("int64")
        return out

    return bucketed_sum(ds.map_batches(partial, batch_format="pandas"),
                        dims, cols)


def unpivot_longer(
    ds: rd.Dataset,
    id_cols: list[str],
    value_cols: list[str],
    *,
    name_col: str = "name",
    value_col: str = "value",
) -> rd.Dataset:
    """UNPIVOT / melt: wide rows → one long row per (id, value column) —
    the inverse of :func:`pivot_counts` (SQL ``UNPIVOT`` / a UNION ALL of
    per-column selects). Turns per-entity feature tables back into long
    metric logs for windowing/aggregation stages.

    Stateless per-block flat map, zero shuffles: each block emits
    ``len(value_cols)`` column-stacked slices (Arrow concat of zero-copy
    column takes; the only new buffer is the constant ``name`` column).
    ``value_cols`` are cast to a common type (float64 by default when
    mixed) because the long column must be single-typed.
    """
    import pyarrow as pa

    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def melt(t: pa.Table) -> pa.Table:
        vt = pa.unify_schemas(
            [pa.schema([(value_col, t.schema.field(c).type)])
             for c in value_cols],
            promote_options="permissive").field(value_col).type
        n = len(t)
        parts = []
        for c in value_cols:
            cols = {k: t[k] for k in id_cols}
            cols[name_col] = pa.array(np.full(n, c, dtype=object),
                                      type=pa.string())
            cols[value_col] = t[c].cast(vt)
            parts.append(pa.table(cols))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow")


def grouped_mode(
    ds: rd.Dataset,
    key_col: str,
    cat_col: str,
    *,
    out_cat: str = "top_cat",
    count_col: str = "n",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key modal category: the most frequent ``cat_col`` value per
    ``key_col``, ties broken by lexicographically smallest category (SQL
    ``row_number() OVER (PARTITION BY key ORDER BY count DESC, cat)`` = 1)
    — dominant-event-type / primary-language style features.

    ONE exchange on a pre-collapsed relation: per-block (key, cat) counts
    tagged with a coarse bucket of the KEY (all of a key's candidate
    categories co-locate), then each bucket sums partials and resolves its
    keys' argmax in one vectorized sort + first-of-key mask (no per-key
    Python). The raw table never shuffles.
    """
    nb = num_buckets or _default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby([key_col, cat_col], as_index=False, sort=False) \
              .size().rename(columns={"size": count_col})
        g[count_col] = g[count_col].astype("int64")
        return g

    def tag(t):
        return add_bucket(t, (key_col,), nb)

    def resolve(df: pd.DataFrame) -> pd.DataFrame:
        df = df.drop(columns=[BUCKET_COL]) \
               .groupby([key_col, cat_col], as_index=False,
                        sort=False)[count_col].sum() \
               .sort_values([key_col, count_col, cat_col],
                            ascending=[True, False, True], kind="stable")
        first = np.r_[True, df[key_col].to_numpy()[1:]
                      != df[key_col].to_numpy()[:-1]]
        out = df.loc[first, [key_col, cat_col, count_col]]
        out[count_col] = out[count_col].astype("int64")
        return out.rename(columns={cat_col: out_cat})

    return ds.map_batches(partial, batch_format="pandas") \
             .map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL).map_groups(resolve, batch_format="pandas")


def cube_sum(
    ds: rd.Dataset,
    dims: list[str],
    measures: list[str],
    *,
    count_col: str = "n",
    all_label: str = "ALL",
) -> rd.Dataset:
    """``GROUP BY CUBE(dims…)``: every subset of the dimensions, not just
    the rollup prefixes — 2^k grouping sets in ONE exchange, same contract
    as :func:`rollup_sum` (each block emits partials for every set with
    aggregated dims relabelled ``all_label``; one coarse-bucket integer
    reduce folds them all; int64 measures so the distributed fold is
    byte-equal to sequential SQL).  Per-block partial volume is bounded by
    2^k × finest group count — fine for the 2-4 dims a cube is for."""
    from itertools import combinations

    if not dims:
        raise ValueError("dims must be non-empty")
    cols = list(measures) + [count_col]
    subsets = [list(c) for r in range(len(dims), -1, -1)
               for c in combinations(dims, r)]

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        if len(df) == 0:
            return pd.DataFrame(columns=dims + cols)
        outs = []
        for keep in subsets:
            if keep:
                g = df.groupby(keep, as_index=False, sort=False)[measures].sum()
                g[count_col] = df.groupby(keep, sort=False).size().to_numpy()
            else:
                g = df[measures].sum().to_frame().T
                g[count_col] = len(df)
            for d in dims:
                if d not in keep:
                    g[d] = all_label
            outs.append(g[dims + cols])
        out = pd.concat(outs, ignore_index=True)
        for m in cols:
            out[m] = out[m].astype("int64")
        return out

    return bucketed_sum(ds.map_batches(partial, batch_format="pandas"),
                        dims, cols)


def grouped_concat(
    ds: rd.Dataset,
    key_cols: list[str],
    value_col: str,
    order_cols: list[str],
    *,
    sep: str = ",",
    out_col: str = "agg",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``string_agg(value ORDER BY order_cols)`` per key — per-entity
    timelines flattened to one delimited string (audit trails, journey
    strings, the reference's per-record history rendering).

    One exchange: hash-bucket on the key so each key's rows co-locate
    (the session-window contract: one key's rows fit a task), then a
    vectorized per-bucket fold — sort once, factorize keys, build Arrow
    list offsets over group boundaries, one ``pc.binary_join`` kernel.
    No per-group Python concatenation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import key_hash

    nb = num_buckets or _default_buckets()
    cols = key_cols + order_cols + [value_col]

    def tag(t: pa.Table) -> pa.Table:
        t = t.select(cols)
        b = (key_hash(t, tuple(key_cols)) % np.uint64(nb)).astype(np.int64)
        return t.append_column("_b", pa.array(b))

    def fold(g: pd.DataFrame) -> pa.Table:
        # SQL string_agg SKIPS null values (a fillna('') would instead emit
        # an empty field with separators); a group whose values are ALL
        # null still appears, with a null aggregate
        g = g.sort_values(key_cols + order_cols, kind="stable")
        # use_na_sentinel=False: the default assigns NULL keys code -1,
        # which sorts LAST in the frame but FIRST numerically — the
        # searchsorted scatter below requires codes[bounds] ascending
        codes, _ = pd.factorize(
            pd.MultiIndex.from_frame(g[key_cols]) if len(key_cols) > 1
            else g[key_cols[0]], sort=False, use_na_sentinel=False)
        bounds = np.flatnonzero(np.r_[True, codes[1:] != codes[:-1]])
        head = g.iloc[bounds]
        nn = g[value_col].notna().to_numpy()
        gnn, cnn = g[nn], codes[nn]
        full = np.full(len(bounds), None, dtype=object)
        if len(cnn):
            b_nn = np.flatnonzero(np.r_[True, cnn[1:] != cnn[:-1]])
            offsets = np.r_[b_nn, len(cnn)].astype(np.int32)
            vals = pa.array(gnn[value_col].to_numpy(), pa.string())
            joined = pc.binary_join(
                pa.ListArray.from_arrays(pa.array(offsets), vals), sep)
            # scatter non-null-group aggregates onto the full group list
            pos = np.searchsorted(codes[bounds], cnn[b_nn])
            full[pos] = np.asarray(joined.to_pylist(), dtype=object)
        out = {k: pa.array(head[k].to_numpy()) for k in key_cols}
        out[out_col] = pa.array(full, pa.string())
        return pa.table(out)

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pandas")
