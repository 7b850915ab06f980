"""Grouped approximate distinct count — a mergeable HyperLogLog sketch.

The fact-scale path of ``COUNT(DISTINCT x) GROUP BY k``: an exact grouped
distinct must shuffle every (k, x) pair; the sketch exchanges only
O(groups × 2^p) register bytes (p=12 → 4 KiB per group), merged by
elementwise max — associative, so per-block partials combine in any order
(same mergeability contract as ``stages/windows.py::grouped_percentiles_approx``).

Vectorized per batch: one SipHash pass over the values, register index =
top ``p`` hash bits, rho = leading-zero count of the remainder + 1 folded
with ``np.maximum.at``. Standard bias corrections (small-range linear
counting, large-range) per the published HyperLogLog analysis.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd
from pandas.util import hash_array

P = 12                      # 2^12 = 4096 registers per group
M = 1 << P
_ALPHA = 0.7213 / (1 + 1.079 / M)   # alpha_m for m >= 128


def _registers(values: np.ndarray) -> np.ndarray:
    """(M,) uint8 register array for one group's values."""
    regs = np.zeros(M, dtype=np.uint8)
    if len(values) == 0:
        return regs
    h = hash_array(values, categorize=False).astype(np.uint64)
    idx = (h >> np.uint64(64 - P)).astype(np.int64)
    w = h & np.uint64((1 << (64 - P)) - 1)
    bits = 64 - P
    # rho = leading zeros of the (64-p)-bit remainder + 1. floor(log2) via
    # float alone is WRONG just below powers of two (log2(2^52-1) rounds
    # to exactly 52.0), so take the float as a candidate and adjust with
    # exact integer compares
    nz = w > 0
    rho = np.full(len(w), bits + 1, dtype=np.uint8)
    wv = w[nz]
    e = np.floor(np.log2(wv.astype(np.float64))).astype(np.int64)
    one = np.uint64(1)
    e = np.where((one << e.astype(np.uint64)) > wv, e - 1, e)
    e = np.where((one << (e + 1).astype(np.uint64)) <= wv, e + 1, e)
    rho[nz] = (bits - e).astype(np.uint8)
    np.maximum.at(regs, idx, rho)
    return regs


def _estimate(regs: np.ndarray) -> int:
    est = _ALPHA * M * M / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * M and zeros:
        est = M * np.log(M / zeros)          # linear counting
    # NO 32-bit large-range correction: it belongs to the original
    # 32-bit-hash HLL (hash-collision saturation at 2^32); with 64-bit
    # hashes it would distort estimates above ~143M and NaN above 2^32
    return int(round(est))


def approx_distinct(
    ds: rd.Dataset,
    key_cols: list[str],
    value_col: str,
    *,
    out_col: str = "approx_distinct",
) -> rd.Dataset:
    """Approximate ``COUNT(DISTINCT value_col)`` per key group."""
    keys = list(key_cols)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for kv, sub in df.groupby(keys, sort=False):
            kv = kv if isinstance(kv, tuple) else (kv,)
            # SQL COUNT(DISTINCT) excludes NULLs; hashing them would count
            # one phantom distinct in every group containing a null
            vals = sub[value_col].dropna().to_numpy()
            rows.append((*kv, _registers(vals)))
        return pd.DataFrame(rows, columns=keys + ["_regs"])

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        regs = np.maximum.reduce(np.stack(g["_regs"].to_numpy()))
        out = g.iloc[:1][keys].copy()
        out[out_col] = _estimate(regs)
        return out

    # group count = small (this is a per-key-GROUP aggregate); one Python
    # call per group is fine here, unlike the per-unique-KEY traps elsewhere
    return ds.map_batches(partial, batch_format="pandas") \
        .groupby(keys).map_groups(merge, batch_format="pandas")
