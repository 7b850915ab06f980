"""Distributed prefix scan (running aggregate over a global order).

An operator class Ray Data lacks natively: ``running_max`` computes, for
every row, the max of ``value_col`` over all rows at-or-before it in
``order_cols`` order — the event-time WATERMARK of a streaming system
(late-event detection: a row whose value lags the running max by more than
the allowed lateness arrived late; reference analogue: the stage-area
observation-date ordering that decides stale updates,
``model/EtlDatabaseObject.java:677-714``).

Shape (two passes, nothing large ever driver-side):

1. RANGE-partition on the primary order column (bucket = affine map of the
   order value — co-locates each contiguous order range; the same layout
   ``stages/gap_detect.py`` uses for boundary stitching).
2. Pass A: per-block partial (bucket, max) pairs — tiny (#blocks × buckets
   per block rows) — folded into per-bucket maxima, then an EXCLUSIVE
   prefix max over bucket order gives each bucket's carry-in. Only
   O(num_buckets) values touch the driver.
3. Pass B: one groupby(bucket) cogroup; inside each bucket a vectorized
   sort + ``np.maximum.accumulate`` merged with the carry-in.

Partitioning assumption: the primary order column distributes roughly
uniformly over its range (ids / timestamps do); a skewed order axis needs
quantile-based range bounds upstream.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd

_RB = "_range_bucket"


def _num_buckets() -> int:
    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _running_scan(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str,
    num_buckets: int | None,
    block_fold: str,          # pandas groupby agg name for pass-A partials
    py_fold,                  # fold two partials (python scalars)
    accumulate,               # np ufunc .accumulate for within-bucket scan
    apply_carry,              # (scanned ndarray, carry scalar) -> ndarray
) -> rd.Dataset:
    from ray.data.aggregate import Max, Min

    nb = num_buckets or _num_buckets()
    primary = order_cols[0]
    bounds = ds.aggregate(Min(primary), Max(primary))
    if not bounds or bounds.get(f"min({primary})") is None:
        # empty input: keep the schema contract (out_col present, 0 rows)
        return ds.map_batches(
            lambda df: df.assign(**{out_col: df[value_col]}),
            batch_format="pandas")
    def _as_int(v) -> int:
        # the primary order axis may be a timestamp: pandas Timestamp /
        # numpy datetime64 carry .value (epoch ns) — int() alone raises
        if hasattr(v, "value"):
            return int(v.value)
        if isinstance(v, np.datetime64):
            return int(v.astype("datetime64[ns]").astype(np.int64))
        return int(v)

    lo = _as_int(bounds[f"min({primary})"])
    hi = _as_int(bounds[f"max({primary})"])
    span = max(1, hi - lo + 1)

    width = max(1, -(-span // nb))  # ceil: divide-first avoids the int64
                                    # overflow of (x-lo)*nb on wide domains

    def bucketize(df: pd.DataFrame) -> pd.DataFrame:
        p = df[primary].to_numpy()
        if np.issubdtype(p.dtype, np.datetime64):
            p = p.astype("datetime64[ns]")
        b = (p.astype(np.int64) - lo) // width
        return df.assign(**{_RB: b.astype(np.int64)})

    bucketed = ds.map_batches(bucketize, batch_format="pandas").materialize()

    # pass A: per-block partials -> per-bucket fold -> EXCLUSIVE prefix fold
    # = each bucket's carry-in (only O(num_buckets) values touch the driver)
    partials = bucketed.map_batches(
        lambda df: df.groupby(_RB, as_index=False)[value_col].agg(block_fold),
        batch_format="pandas").take_all()
    bucket_fold: dict[int, object] = {}
    for row in partials:
        b, v = int(row[_RB]), row[value_col]
        bucket_fold[b] = v if b not in bucket_fold else py_fold(bucket_fold[b], v)
    carry: dict[int, object] = {}
    run = None
    for b in sorted(bucket_fold):
        carry[b] = run
        run = bucket_fold[b] if run is None else py_fold(run, bucket_fold[b])
    carry_ref = ray.put(carry)

    def scan_bucket(g: pd.DataFrame) -> pd.DataFrame:
        c = ray.get(carry_ref)
        g = g.sort_values(order_cols, kind="stable")
        vals = g[value_col].to_numpy()
        out = accumulate(vals)
        cin = c.get(int(g[_RB].iloc[0]))
        if cin is not None:
            out = apply_carry(out, np.asarray(cin, dtype=vals.dtype))
        return g.assign(**{out_col: out}).drop(columns=[_RB])

    return bucketed.groupby(_RB).map_groups(scan_bucket, batch_format="pandas")


def running_max(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str = "running_max",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Append ``out_col`` = max of ``value_col`` over all rows at-or-before
    each row in ``order_cols`` order (inclusive). ``order_cols[0]`` must be
    integer-like (the range-partition axis); the remaining columns only
    break ties."""
    return _running_scan(
        ds, order_cols, value_col, out_col=out_col, num_buckets=num_buckets,
        block_fold="max", py_fold=max,
        accumulate=np.maximum.accumulate, apply_carry=np.maximum)


def running_sum(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str = "running_sum",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Inclusive prefix sum in ``order_cols`` order. Use an INTEGER value
    column: float addition is non-associative, so a bucketed scan's
    summation tree would drift from a sequential oracle in the last ulp."""
    return _running_scan(
        ds, order_cols, value_col, out_col=out_col, num_buckets=num_buckets,
        block_fold="sum", py_fold=lambda a, b: a + b,
        accumulate=np.cumsum, apply_carry=lambda out, c: out + c)
