"""Grouped second-moment statistics (Pearson correlation, OLS slope).

The partial-combine showcase of SURVEY §2.7 applied to bivariate moments:
every block folds to per-group ``(n, Σx, Σy, Σx², Σy², Σxy)`` partials —
six int64 values per (block, group) — so the exchange is groups-sized no
matter how many rows feed it, and integer sums make the reduction exactly
associative (float moments would drift with the combine-tree shape; the
reason ``stages/scan.py::running_sum`` demands integer inputs).

The final correlation / slope is computed ONCE per group from the exact
sums using a FIXED IEEE-double expression — ``num / (sqrt(d1) * sqrt(d2))``
with each int converted to double exactly once — so any engine (this one,
the DuckDB oracle) lands on the identical double, and the quantized
``*_e9`` outputs hash-match byte-for-byte.

Inputs must be int64-encodable (quantize currency to cents upstream).
Overflow headroom: |x|,|y| ≤ 2¹⁵ supports ~2³² rows per group before
Σx² approaches int64 range; the per-group finalization uses Python
arbitrary-precision ints, so only the partials themselves bound scale.

Reference analogue: none (training-data / feature-quality extension —
e.g. the price↔discount sanity screens of a tabular-corpus profiler).
"""
from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import BUCKET_COL, add_bucket


def _default_buckets() -> int:
    try:
        import ray
        return max(16, int(ray.cluster_resources().get("CPU", 16)))
    except Exception:
        return 16


def category_assoc(
    ds: rd.Dataset,
    a_col: str,
    b_col: str,
    *,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Chi-square association table between two categoricals: one row per
    observed ``(a, b)`` cell with its count, expected count and χ²
    contribution (both quantized to 1e-6 — per-CELL quantization, so no
    float summation order exists anywhere; sum ``contrib_e6`` for the
    statistic, compare against the (|A|−1)(|B|−1) dof).

    Raw rows fold to per-block cell counts BEFORE the exchange (a
    vectorized pyarrow ``group_by`` per block — null categories stay
    visible as their own cells, matching SQL GROUP BY), so the shuffle
    really is |A|×|B|-sized per block, never row-sized; marginals and the
    fixed IEEE-double expression ``(n − e)²/e`` with
    ``e = (rowtot·coltot)/N`` evaluate in one task over the tiny cell
    relation.
    """
    import pyarrow.compute as pc

    from .pivot import bucketed_sum

    def cell_partial(t: pa.Table) -> pa.Table:
        g = t.select([a_col, b_col]).group_by(
            [a_col, b_col]).aggregate([([], "count_all")])
        return pa.table({
            a_col: g[a_col], b_col: g[b_col],
            "n": pc.cast(g["count_all"], pa.int64()),
        })

    cells = bucketed_sum(ds.map_batches(cell_partial,
                                        batch_format="pyarrow"),
                         [a_col, b_col], ["n"],
                         num_buckets=num_buckets)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        n = df["n"].astype("int64")
        ra = df.groupby(a_col)["n"].transform("sum").astype("int64")
        cb = df.groupby(b_col)["n"].transform("sum").astype("int64")
        tot = int(n.sum())
        # double(ra) * double(cb) / double(tot): each factor converts
        # BEFORE multiplying — overflow-proof at any N and the exact
        # expression the SQL oracle states
        e = ra.astype("float64") * cb.astype("float64") / float(tot)
        d = n.astype("float64") - e
        out = df[[a_col, b_col]].copy()
        out["n"] = n
        out["expected_e6"] = np.floor(e * 1e6).astype("int64")
        out["contrib_e6"] = np.floor(d * d / e * 1e6).astype("int64")
        return out

    return cells.repartition(1).map_batches(finalize, batch_format="pandas",
                                            batch_size=None)


def grouped_gini(
    ds: rd.Dataset,
    group_cols: list[str],
    value_col: str,
    *,
    out_col: str = "gini_e9",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-group Gini coefficient of an int64 ``value_col`` (concentration
    of spend / tokens / events), quantized to 1e-9.

    Exact sorted-rank form ``G = Σᵢ (2i − n − 1)·x₍ᵢ₎ / (n·Σx)`` with the
    numerator accumulated in Python ints (tie order provably cancels:
    equal x share the weight sum of their rank block), ONE double division
    at the end — the same determinism contract as :func:`grouped_corr`.
    One hash exchange on the group key; a group's values sort in one task
    (the per-entity relation is already aggregated upstream — e.g.
    per-customer totals, orders of magnitude smaller than the raw facts).
    NULL when the group's total is zero. Returns group cols + ``n`` +
    ``out_col``.
    """
    import math

    from ..functions.hashing import BUCKET_COL, add_bucket

    nb = num_buckets or _default_buckets()

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, tuple(group_cols), nb)

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, sub in df.drop(columns=[BUCKET_COL]).groupby(
                group_cols, sort=False):
            x = np.sort(sub[value_col].to_numpy(dtype=np.int64))
            n = len(x)
            tot = int(x.sum())
            if tot == 0:
                g = None
            else:
                w = 2 * np.arange(1, n + 1, dtype=np.int64) - n - 1
                if n * abs(tot) < (1 << 62):
                    num = int(np.dot(w, x))  # |num| <= n*|tot|: int64-safe
                else:
                    # exact python-int fold past the int64 bound (the
                    # operator's contract is exact-integer determinism)
                    num = int(sum(int(a) * int(b) for a, b in zip(w, x)))
                g = math.floor(num / float(n * tot) * 1e9)
            key = key if isinstance(key, tuple) else (key,)
            rows.append((*key, n, g))
        out = pd.DataFrame(rows, columns=[*group_cols, "n", out_col])
        out["n"] = out["n"].astype("int64")
        out[out_col] = pd.array(out[out_col], dtype="Int64")
        return out

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL).map_groups(fold, batch_format="pandas")


def mad_outliers(
    ds: rd.Dataset,
    group_cols: list[str],
    value_col: str,
    *,
    k: float = 5.0,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Rows whose ``value_col`` deviates from their group's median by more
    than ``k`` times the group's median absolute deviation (MAD) — the
    robust outlier gate (median/MAD shrug off the very outliers a
    mean/stddev screen would absorb).

    Medians use the discrete rule ``sorted[(n-1)//2]`` (the engine's
    portable quantile rule — never interpolation-dependent), computed per
    group from a (group, value)-only projection: two groups-sized
    exchanges of just the value column, then the thresholds (a few rows)
    broadcast back over a stateless filter — the full rows never shuffle.
    One group's values sit in one task; at extreme per-group cardinality
    substitute the mergeable sketch (``grouped_percentiles_approx``) for
    the exact medians.
    """
    import ray

    from ..functions.hashing import BUCKET_COL, add_bucket

    nb = num_buckets or _default_buckets()

    def med_of(d: rd.Dataset, col: str, out: str) -> pd.DataFrame:
        def tag(t: pa.Table) -> pa.Table:
            return add_bucket(t, tuple(group_cols), nb)

        def fold(g: pd.DataFrame) -> pd.DataFrame:
            def disc_median(s: pd.Series) -> float:
                v = np.sort(s.to_numpy(dtype=np.float64))
                return float(v[(len(v) - 1) // 2])
            m = g.drop(columns=[BUCKET_COL]) \
                 .groupby(group_cols, as_index=False)[col].agg(disc_median)
            return m.rename(columns={col: out})

        return d.map_batches(tag, batch_format="pyarrow") \
                .groupby(BUCKET_COL).map_groups(fold, batch_format="pandas") \
                .to_pandas()

    # NOT materialized: the projection is corpus-sized (narrow, but 100 TB
    # of rows is 100 TB of rows) — the median and MAD passes each stream
    # the column-pruned scan instead (the round-5 de-materialize sweep;
    # determinism contract as in stages/scan.py: a nondeterministic
    # upstream must be materialized by the caller)
    proj = ds.select_columns(list(dict.fromkeys(group_cols + [value_col])))
    med = med_of(proj, value_col, "_med")

    med_ref = ray.put(med)

    def add_dev(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(ray.get(med_ref), on=group_cols, how="left")
        m["_dev"] = (m[value_col] - m["_med"]).abs()
        return m.drop(columns=["_med"])

    dev = proj.map_batches(add_dev, batch_format="pandas")
    mad = med_of(dev.select_columns(group_cols + ["_dev"]), "_dev", "_mad")

    thr = med.merge(mad, on=group_cols)
    thr_ref = ray.put(thr)

    def flag(df: pd.DataFrame) -> pd.DataFrame:
        m = df.merge(ray.get(thr_ref), on=group_cols, how="left")
        keep = (m[value_col] - m["_med"]).abs() > k * m["_mad"]
        return df[keep.to_numpy()]

    return ds.map_batches(flag, batch_format="pandas")


def grouped_corr(
    ds: rd.Dataset,
    group_cols: list[str],
    x_col: str,
    y_col: str,
    *,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-group n, Pearson correlation and OLS slope (y on x), the
    latter two quantized to 1e-9 (``corr_e9``/``slope_e9`` int64;
    NULL when the group's x — or, for corr, y — is constant)."""
    nb = num_buckets or _default_buckets()

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        x = df[x_col].to_numpy(dtype=np.int64)
        y = df[y_col].to_numpy(dtype=np.int64)
        p = pd.DataFrame({
            **{c: df[c] for c in group_cols},
            "n": np.ones(len(df), np.int64),
            "sx": x, "sy": y, "sxx": x * x, "syy": y * y, "sxy": x * y,
        })
        return p.groupby(group_cols, as_index=False, sort=False).sum()

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, tuple(group_cols), nb)

    def finalize(df: pd.DataFrame) -> pd.DataFrame:
        g = df.drop(columns=[BUCKET_COL]) \
              .groupby(group_cols, as_index=False, sort=False).sum()
        corr, slope = [], []
        for n, sx, sy, sxx, syy, sxy in zip(
                g["n"], g["sx"], g["sy"], g["sxx"], g["syy"], g["sxy"]):
            # python ints: n*sxx etc. cannot overflow at any group size
            n, sx, sy = int(n), int(sx), int(sy)
            sxx, syy, sxy = int(sxx), int(syy), int(sxy)
            num = float(n * sxy - sx * sy)
            d1, d2 = n * sxx - sx * sx, n * syy - sy * sy
            slope.append(None if d1 == 0
                         else math.floor(num / float(d1) * 1e9))
            corr.append(None if d1 == 0 or d2 == 0
                        else math.floor(
                            num / (math.sqrt(float(d1)) * math.sqrt(float(d2)))
                            * 1e9))
        out = g[group_cols].copy()
        out["n"] = g["n"].astype("int64")
        out["corr_e9"] = pd.array(corr, dtype="Int64")
        out["slope_e9"] = pd.array(slope, dtype="Int64")
        return out

    return ds.map_batches(partial, batch_format="pandas") \
             .map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL) \
             .map_groups(finalize, batch_format="pandas")


def hot_keys(
    ds: rd.Dataset,
    key_cols: list[str],
    *,
    k: int = 20,
) -> rd.Dataset:
    """Skew diagnostic: the top-``k`` keys by row count with their share of
    the total — the report that tells an operator which keys need salting
    before a shuffle (the engine's own LWW combiner exists precisely for
    the keys this surfaces; reference analogue: the per-table progress
    counters an epts-etl operator watches for stuck mega-tables).

    Per-block ``value_counts`` partials -> one coarse ``bucketed_sum``
    exchange (only (key, n) pairs move, never rows) -> the counts relation
    is tiny (distinct keys), so the final top-k sort is a driver-free
    ``Dataset.sort().limit()``; total for the share comes from the same
    partials, no second scan."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from .pivot import bucketed_sum

    def partial(t: pa.Table) -> pa.Table:
        vc = t.group_by(key_cols).aggregate([([], "count_all")])
        return vc.rename_columns(key_cols + ["n"])

    rel = bucketed_sum(ds.select_columns(key_cols).map_batches(
        partial, batch_format="pyarrow"), key_cols, ["n"]).materialize()
    total = sum(
        pc.sum(t["n"]).as_py() or 0
        for t in rel.iter_batches(batch_format="pyarrow", batch_size=None))

    top = rel.sort(["n"] + key_cols,
                   descending=[True] + [False] * len(key_cols)).limit(k)

    def share(t: pa.Table) -> pa.Table:
        return t.append_column(
            "share", pc.divide(pc.cast(t["n"], pa.float64()),
                               pa.scalar(float(total))))

    return top.map_batches(share, batch_format="pyarrow")
