"""Interval-overlap join — pair rows whose [start, end] ranges intersect.

The interval-interval generalization of ``stages/asof.py::range_join``
(which is point-in-interval): no equi-key exists, so co-location comes
from a TIME GRID instead of a key hash. Each interval is replicated to
every grid cell it touches (``cell_width`` should be >= the typical
interval length, so replication stays ~1-2x); one cogroup per cell; and
each overlapping pair is emitted in exactly ONE canonical cell — the cell
containing ``max(l.start, r.start)``, the overlap's left edge, which both
intervals provably cover — so no cross-cell dedup pass is needed.

Within a cell the pairing is two contiguous-range ``searchsorted`` sweeps
(pairs where ``r.start >= l.start``, then the disjoint mirror where
``l.start > r.start``), never a cross product: the canonical-cell bounds
are folded INTO the search window, so non-canonical candidates are never
materialized.

Partitioning assumption: one cell's population fits a task; pick
``cell_width`` so the densest time window divides across cells (a heavy
hour needs a smaller width — same knob as the session-window operator).
Output volume is the true cost at scale; ``bucket_post`` rolls pairs up
inside the cogroup (see ``range_join`` for why a downstream per-block
rollup is NOT equivalent).

Reference analogue: none (training-data / analytics extension — campaign
attribution, downtime correlation, span conflict detection).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .asof import _nullable, _pd_dtypes, _zero_masked

_SIDE = "_side"
_CELL = "_cell"
_S = "_ivs"
_E = "_ive"


def _axis_int64(t: pa.Table, col: str) -> np.ndarray:
    c = t[col].combine_chunks()
    if c.null_count:
        raise ValueError(
            f"interval column {col!r} contains nulls — open-ended "
            f"intervals must be closed (e.g. fill end with a horizon "
            f"timestamp) before the overlap join")
    if pa.types.is_timestamp(c.type):
        c = c.cast(pa.timestamp("us"))
    return c.cast(pa.int64()).to_numpy()


def interval_overlap_join(
    left: rd.Dataset,
    right: rd.Dataset,
    *,
    left_start: str,
    left_end: str,
    right_start: str,
    right_end: str,
    cell_width: int,
    suffix: str = "_right",
    bucket_post=None,
) -> rd.Dataset:
    """All (left, right) pairs with ``l.start <= r.end AND r.start <=
    l.end`` (closed intervals, inclusive ends). Start/end columns may be
    ``timestamp[us]`` (``cell_width`` in microseconds) or integers."""
    if cell_width < 1:
        raise ValueError(f"cell_width must be >= 1, got {cell_width}")

    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)
    left_dtypes = _pd_dtypes(left.schema())
    right_dtypes = _pd_dtypes(right.schema())
    out_right = {c: (f"{c}{suffix}" if c in left_cols else c)
                 for c in right_cols}

    def tag(side: str, s_col: str, e_col: str):
        def fn(t: pa.Table) -> pa.Table:
            s = _axis_int64(t, s_col)
            e = _axis_int64(t, e_col)
            if (e < s).any():
                raise ValueError(f"interval end < start in {e_col!r}")
            c0 = s // cell_width
            reps = (e // cell_width - c0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(len(t)), reps)
            total = int(reps.sum())
            offs = np.concatenate([[0], np.cumsum(reps)[:-1]])
            within = np.arange(total) - np.repeat(offs, reps)
            cells = c0[idx] + within
            t2 = t.take(pa.array(idx))
            return t2.append_column(_CELL, pa.array(cells, pa.int64())) \
                     .append_column(_S, pa.array(s[idx], pa.int64())) \
                     .append_column(_E, pa.array(e[idx], pa.int64())) \
                     .append_column(_SIDE, pa.array([side] * total,
                                                    pa.string()))
        return fn

    tagged = left.map_batches(tag("l", left_start, left_end),
                              batch_format="pyarrow").union(
        right.map_batches(tag("r", right_start, right_end),
                          batch_format="pyarrow"))

    def emit(l: pd.DataFrame, r: pd.DataFrame,
             li: np.ndarray, ri: np.ndarray) -> pd.DataFrame:
        out = l.iloc[li].reset_index(drop=True)
        for c, name in out_right.items():
            out[name] = r[c].to_numpy()[ri]
        return out

    def pairs_in_window(
            a_s, a_e, b_sorted_s, lo_clip, hi_clip, open_low):
        """For each a-interval: the b rows (sorted by start) whose start
        lies in [max(a_s, lo_clip), min(a_e, hi_clip)]. ``open_low``
        makes the a_s edge STRICT (the mirror case's ``b.start > a.start``)
        while the cell edge stays inclusive — the two lower bounds carry
        different open-ness, so pick per row, never a plain max."""
        hi = np.minimum(a_e, hi_clip)
        if open_low:
            from_a = np.searchsorted(b_sorted_s, a_s, "right")   # b > a_s
            from_cell = int(np.searchsorted(b_sorted_s, lo_clip, "left"))
            starts = np.where(a_s >= lo_clip, from_a, from_cell)
        else:
            starts = np.searchsorted(
                b_sorted_s, np.maximum(a_s, lo_clip), "left")
        ends = np.searchsorted(b_sorted_s, hi, "right")
        cnt = np.maximum(ends - starts, 0)
        total = int(cnt.sum())
        ai = np.repeat(np.arange(len(a_s)), cnt)
        offs = np.concatenate([[0], np.cumsum(cnt)[:-1]])
        bi = np.repeat(starts, cnt) + (np.arange(total) - np.repeat(offs, cnt))
        return ai, bi

    def post(out: pd.DataFrame) -> pd.DataFrame:
        return bucket_post(out) if bucket_post is not None else out

    def join_cell(g: pd.DataFrame) -> pd.DataFrame:
        cell = int(g[_CELL].iloc[0])
        cell_lo = cell * cell_width
        cell_hi = cell_lo + cell_width - 1
        lm = g[_SIDE] == "l"
        l = g[lm].reset_index(drop=True)
        r = g[~lm].reset_index(drop=True)
        # nullable-aware cast: a pandas block NaN-promotes int columns
        # carrying nulls; plain astype(int64) would raise on them (the
        # range_join/_nullable rule in stages/asof.py)
        lf = l.reindex(columns=left_cols)
        lf = lf.astype({c: (_nullable(d) if lf[c].isna().any() else d)
                        for c, d in left_dtypes.items()})
        rf = r.reindex(columns=right_cols)
        rf = rf.astype({c: (_nullable(d) if rf[c].isna().any() else d)
                        for c, d in right_dtypes.items()})
        if len(l) == 0 or len(r) == 0:
            return post(emit(lf.iloc[0:0], rf.iloc[0:0],
                             np.empty(0, np.int64), np.empty(0, np.int64)))
        ls, le = l[_S].to_numpy(np.int64), l[_E].to_numpy(np.int64)
        rs, re_ = r[_S].to_numpy(np.int64), r[_E].to_numpy(np.int64)

        # case A (canonical cell = floor(r.start / W)): r.start in
        # [max(l.start, cell_lo), min(l.end, cell_hi)]
        ro = np.argsort(rs, kind="stable")
        ai, bi = pairs_in_window(ls, le, rs[ro], cell_lo, cell_hi,
                                 open_low=False)
        out_a = emit(lf, rf.iloc[ro].reset_index(drop=True), ai, bi)

        # case B (l.start > r.start, canonical cell = floor(l.start / W)):
        # l.start in (r.start, min(r.end, cell_hi)], clipped at cell_lo
        lo_ = np.argsort(ls, kind="stable")
        bi2, ai2 = pairs_in_window(rs, re_, ls[lo_], cell_lo, cell_hi,
                                   open_low=True)
        out_b = emit(lf.iloc[lo_].reset_index(drop=True), rf, ai2, bi2)

        return post(pd.concat([out_a, out_b], ignore_index=True))

    return tagged.groupby(_CELL).map_groups(join_cell, batch_format="pandas")
