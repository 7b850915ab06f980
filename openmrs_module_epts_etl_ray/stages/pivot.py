"""Pivot (crosstab) aggregation: long event rows → one wide feature row per
key (the feature-engineering step that turns an event log into per-entity
training features: ``n_click, n_view, …`` per user).

Scale shape: the pivot is folded INSIDE each block first (one vectorized
crosstab per batch), so the exchange moves at most one row per (key, block)
— for a zipf-hot key that is the same partial-combine defense the LWW
replay uses; the final ``groupby().aggregate(Sum…)`` runs over pre-collapsed
partials. Counts are int64-exact, so the distributed sum is
order-independent (float pivots would not hash-match across engines —
derive them downstream).

The category list is EXPLICIT: at 10^10 rows a driver-side distinct scan to
discover columns is a full pass; real pipelines know their event taxonomy.
Events outside ``categories`` still count toward ``n_events``.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray.data as rd


def pivot_counts(
    ds: rd.Dataset,
    key_col: str,
    pivot_col: str,
    categories: list[str],
    *,
    prefix: str = "n_",
) -> rd.Dataset:
    """One row per ``key_col`` value with ``{prefix}{category}`` int64
    count columns plus ``n_events`` (all rows, any category)."""
    from ray.data.aggregate import Sum

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

    agg = ds.map_batches(partial, batch_format="pandas").groupby(key_col) \
            .aggregate(*[Sum(c, alias_name=c) for c in ["n_events"] + cols])
    return agg
