"""Single-pass table profiling — per-column data-quality summary.

The operational cousin of the reference's pre-run table analysis (it
inspects schema + row counts before syncing; a lake-scale engine wants
nulls / bounds / cardinality per column in ONE scan, not one query per
column). Per-block partials carry (column, n, nulls, min, max, HLL
registers); the combine folds them associatively — O(columns × blocks)
tiny rows exchange, never data.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd

from .cardinality import _estimate, _registers


def profile_table(ds: rd.Dataset, columns: list[str] | None = None) -> rd.Dataset:
    """One row per column: ``column, n_rows, n_nulls, min, max,
    approx_distinct``. Min/max render as strings so heterogeneous column
    types share one output schema (cast in the consumer if needed)."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        cols = columns or list(df.columns)
        rows = []
        for c in cols:
            s = df[c]
            nn = s.dropna()
            rows.append({
                "column": c,
                "n_rows": len(s),
                "n_nulls": int(s.isna().sum()),
                "vmin": None if nn.empty else nn.min(),
                "vmax": None if nn.empty else nn.max(),
                "_regs": _registers(nn.to_numpy()),
            })
        return pd.DataFrame(rows)

    def combine(g: pd.DataFrame) -> pd.DataFrame:
        mins = g["vmin"].dropna()
        maxs = g["vmax"].dropna()
        regs = np.maximum.reduce(np.stack(g["_regs"].to_numpy()))
        return pd.DataFrame({
            "column": [g["column"].iloc[0]],
            "n_rows": [int(g["n_rows"].sum())],
            "n_nulls": [int(g["n_nulls"].sum())],
            "min": [None if mins.empty else str(mins.min())],
            "max": [None if maxs.empty else str(maxs.max())],
            "approx_distinct": [_estimate(regs)],
        })

    # one Python call per COLUMN in the combine — columns are few by nature
    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("column").map_groups(combine, batch_format="pandas")
