"""As-of (time-travel) join — an operator Ray Data lacks natively.

For each left row, attach the latest right row with ``right.ts <= left.ts``
for the same key (classic point-in-time enrichment). Composition per
ray_guide's as-of pattern: tag both sides, hash-bucket by the equi-key so a
key's full history co-locates, then one ``pd.merge_asof(by=key)`` per bucket
over ts-sorted frames — ONE shuffle total, vectorized within buckets.

Partitioning assumption: the equi-key distributes; a single key's history
must fit one bucket's task (true for per-user/per-entity timelines; salt by
time range if one entity's history alone exceeds a task's memory).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from ..functions.hashing import BUCKET_COL, add_bucket

_SIDE = "_side"


def _default_buckets() -> int:
    """Cogroup parallelism derived from the cluster (a fixed small count
    serializes the per-bucket merges on a big box)."""
    try:
        import ray
        return max(16, int(ray.cluster_resources().get("CPU", 16)))
    except Exception:
        return 16


def _pd_dtypes(schema) -> dict:
    """Pandas dtype each column of a Dataset schema carries pre-union.

    The tagged union null-fills the absent side's columns inside a bucket,
    which silently coerces int64 to float64 (pandas NaN promotion). Casting
    back through these captured dtypes keeps the output byte-identical to
    a join that never unioned (nullable ids stay Arrow int64, not NaN-float).
    """
    fields = []
    for name, t in zip(schema.names, schema.types):
        if not isinstance(t, pa.DataType):
            try:  # PandasBlockSchema carries numpy dtypes / python types
                t = pa.from_numpy_dtype(t)
            except (TypeError, pa.ArrowNotImplementedError):
                # numpy object dtype / python str => string column
                stringy = t in (str, object) or getattr(t, "kind", None) == "O"
                t = pa.string() if stringy else None
        if t is not None:
            fields.append((name, t))
    arrow = pa.schema(fields)
    return dict(arrow.empty_table().to_pandas().dtypes)


def _zero_masked(df: pd.DataFrame, cols) -> pd.DataFrame:
    """Zero the data bytes under NA slots of masked extension columns.

    Arrow keeps whatever bytes the masked array's ``_data`` buffer holds
    under the validity bitmap (pandas leaves garbage there after an
    astype-from-NaN), while DuckDB's ``.arrow()`` zeroes null slots — a
    byte-level comparison of otherwise-identical outputs then diverges
    nondeterministically. Canonical form: data == 0 wherever mask is set.
    """
    for name in cols:
        arr = df[name].array
        mask = getattr(arr, "_mask", None)
        if mask is not None and mask.any():
            data = arr._data.copy()
            data[mask] = 0
            df[name] = type(arr)(data, mask.copy())
    return df


def _nullable(dtype) -> object:
    """Nullable pandas extension dtype for a numpy dtype — converts back to
    Arrow with true nulls (never NaN-coerced float64)."""
    s = str(dtype)
    if s.startswith("int"):
        return "Int" + s[3:]
    if s.startswith("uint"):
        return "UInt" + s[4:]
    if s.startswith("float"):
        return "Float" + s[5:]
    return dtype


def asof_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    right_cols: list[str],
    suffix: str = "_right",
    num_buckets: int | None = None,
    right_order: list[str] | None = None,
    direction: str = "backward",
    tolerance=None,
) -> rd.Dataset:
    """Left as-of join: per ``by`` key attach the latest right row with
    ``right[on] <= left[on]`` (``direction="backward"``, the default) or
    the earliest with ``right[on] >= left[on]`` (``"forward"`` — "next
    event after"); unmatched left rows null-backfill. ``tolerance`` (same
    type as the ``on`` axis, e.g. ``pd.Timedelta``) bounds how far the
    match may be — the windowed as-of of feature pipelines ("next purchase
    within 7 days of signup").

    ``right_order``: extra right-side columns to break equal-``on`` ties
    deterministically. Backward keeps the LAST row in ``[on] +
    right_order`` ascending sort (SQL ``ORDER BY on DESC, ord DESC … rn =
    1``); forward keeps the FIRST (SQL ``ORDER BY on ASC, ord ASC … rn =
    1``). Without it, equal-timestamp winners depend on block layout.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")

    if num_buckets is None:
        num_buckets = _default_buckets()

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column(_SIDE, pa.array([side] * len(t)))
            return add_bucket(t, (by,), num_buckets)
        return fn

    # capture each side's column set AND dtypes UP FRONT: inside a bucket the
    # union null-fills the absent side's columns (and may float-coerce ints),
    # and a bucket may hold rows from only one side (recovering columns by
    # dropna would drop everything)
    left_cols = list(left.schema().names)
    left_dtypes = _pd_dtypes(left.schema())
    right_dtypes = _pd_dtypes(right.schema())
    keep = [by, on] + [c for c in right_cols if c not in (by, on)]
    extra = [c for c in right_cols if c not in (by, on)]
    # right-side attach columns become nullable in the output (unmatched left
    # rows); map them to pandas extension dtypes so Arrow sees real nulls
    out_extra_dtypes = {
        (f"{c}{suffix}" if c in left_cols else c): _nullable(right_dtypes[c])
        for c in extra
    }

    tagged = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))
    order = [on] + [c for c in (right_order or []) if c in keep]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = (g[g[_SIDE] == "l"].reindex(columns=left_cols)
             .astype(left_dtypes).sort_values(on, kind="stable"))
        r = (g[g[_SIDE] == "r"].reindex(columns=keep)
             .astype({c: right_dtypes[c] for c in keep}))
        if len(r) == 0 or len(l) == 0:
            out = l.copy()
            for name, dt in out_extra_dtypes.items():
                out[name] = pd.Series(pd.NA, index=out.index, dtype=dt)
            return _zero_masked(out, out_extra_dtypes)
        r = r.sort_values(order, kind="stable")
        merged = pd.merge_asof(l, r, on=on, by=by, direction=direction,
                               tolerance=tolerance, suffixes=("", suffix))
        return _zero_masked(merged.astype(out_extra_dtypes), out_extra_dtypes)

    return tagged.repartition(num_buckets).groupby(BUCKET_COL).map_groups(
        join_bucket, batch_format="pandas")


def range_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    by: str,
    on: str,
    lo_offset,
    hi_offset,
    num_buckets: int | None = None,
    bucket_post=None,
) -> rd.Dataset:
    """Interval join: pair each left row with every right row of the same
    ``by`` key whose ``on`` lies in ``[left.on + lo_offset, left.on +
    hi_offset]``. Same bucketed-cogroup shape as :func:`asof_join` (one
    shuffle); within a bucket the match is an equi-merge on the key followed
    by a vectorized interval filter.

    Scale note: output volume is the true cost (each left row may match many
    right rows). When a single key's timeline is dense, band the time axis
    upstream (add a coarse time-bucket to ``by``) so a pair's candidates
    co-locate without the full key history joining against itself.

    ``bucket_post``: optional rollup applied to each bucket's joined pairs
    INSIDE the cogroup UDF, where a ``by`` key's matches are guaranteed
    co-resident. A downstream per-block rollup is NOT equivalent: Ray Data
    splits large map_groups output blocks at target_max_block_size, so one
    key's pairs can span blocks at scale.
    """
    if num_buckets is None:
        num_buckets = _default_buckets()

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            t = t.append_column(_SIDE, pa.array([side] * len(t)))
            return add_bucket(t, (by,), num_buckets)
        return fn

    # explicit per-side column + dtype capture — see asof_join for why
    left_cols = list(left.schema().names)
    rt_cols = list(right.schema().names)
    left_dtypes = _pd_dtypes(left.schema())
    right_dtypes = _pd_dtypes(right.schema())

    tagged = left.map_batches(tag("l"), batch_format="pyarrow").union(
        right.map_batches(tag("r"), batch_format="pyarrow"))
    lo = pd.Timedelta(lo_offset) if isinstance(lo_offset, str) else lo_offset
    hi = pd.Timedelta(hi_offset) if isinstance(hi_offset, str) else hi_offset

    def emit(l: pd.DataFrame, r: pd.DataFrame, li: np.ndarray, ri: np.ndarray) -> pd.DataFrame:
        out = l.iloc[li].reset_index(drop=True)
        for c in rt_cols:
            if c == by:
                continue
            name = f"{c}_right" if c in left_cols else c
            out[name] = r[c].to_numpy()[ri]
        return out

    def post(out: pd.DataFrame) -> pd.DataFrame:
        return bucket_post(out) if bucket_post is not None else out

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g[_SIDE] == "l"].reindex(columns=left_cols).astype(left_dtypes)
        r = g[g[_SIDE] == "r"].reindex(columns=rt_cols).astype(right_dtypes)
        if len(l) == 0 or len(r) == 0:
            return post(
                l.iloc[0:0].merge(r.iloc[0:0], on=by, suffixes=("", "_right")))
        # fast path: pack (key-code, time) into ONE int64 and emit only the
        # matching pairs via two searchsorteds per left row — the naive
        # merge-then-filter materializes the FULL per-key cross product
        # first (quadratic in a key's timeline, measured 6s vs <1s at sf0.1)
        if np.issubdtype(l[on].dtype, np.datetime64):
            lt = l[on].to_numpy().astype("datetime64[us]").astype(np.int64)
            rt = r[on].to_numpy().astype("datetime64[us]").astype(np.int64)
            lo_i = lt + int(pd.Timedelta(lo).value // 1000)
            hi_i = lt + int(pd.Timedelta(hi).value // 1000)
        else:  # numeric axis: offsets are plain numbers
            lt = l[on].to_numpy().astype(np.int64)
            rt = r[on].to_numpy().astype(np.int64)
            lo_i = lt + int(lo)
            hi_i = lt + int(hi)
        codes, _ = pd.factorize(pd.concat([l[by], r[by]], ignore_index=True),
                                sort=False)
        lc = codes[: len(l)].astype(np.int64)
        rc = codes[len(l):].astype(np.int64)
        base = int(min(rt.min(), lo_i.min()))
        top = int(max(rt.max(), hi_i.max()))
        span = np.int64(top - base + 2)
        n_codes = int(codes.max()) + 1
        if n_codes * int(span) < (1 << 62):
            order = np.lexsort((rt, rc))
            rs, cs = rt[order], rc[order]
            comp_r = cs * span + (rs - base)
            starts = np.searchsorted(comp_r, lc * span + (lo_i - base), "left")
            ends = np.searchsorted(comp_r, lc * span + (hi_i - base), "right")
            cnt = ends - starts
            total = int(cnt.sum())
            li = np.repeat(np.arange(len(l)), cnt)
            offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
            ri = np.repeat(starts, cnt) + (np.arange(total) - np.repeat(offs, cnt))
            return post(emit(l, r.iloc[order].reset_index(drop=True), li, ri))
        # overflow fallback (astronomical key-count x time-span): the exact
        # merge-then-filter
        m = l.merge(r, on=by, suffixes=("", "_right"))
        t0 = m[on]
        t1 = m[f"{on}_right"]
        return post(m[(t1 >= t0 + lo) & (t1 <= t0 + hi)])

    return tagged.repartition(num_buckets).groupby(BUCKET_COL).map_groups(
        join_bucket, batch_format="pandas")
