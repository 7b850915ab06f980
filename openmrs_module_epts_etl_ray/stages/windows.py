"""Tumbling-window aggregation over an event-time column.

The reference is batch-only; its closest construct is the timestamp-window
re-detection scan (``ChangedRecordsDetectorSearchParams.java:43-68``, re-run
per window). Ray Data has no event-time windowing either, so windows are
expressed the engine-native way (ray_guide: streaming-shaped workloads):
assign each row its window start vectorized, pre-aggregate per batch, then
one small ``groupby`` over the partials — the window column is just another
group key, and late data lands in its window on the next run because the
assignment is a pure function of event time (no watermark needed for
replayed batch windows).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def tumbling_window_agg(
    ds: rd.Dataset,
    ts_col: str,
    *,
    every: str = "1D",
    key_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    window_col: str = "window_start",
) -> rd.Dataset:
    """Count + sums per (window, *key_cols); ``every`` is a pandas offset
    alias (e.g. '1D', '1h'). Partial-aggregates inside map_batches so the
    shuffle moves one row per (window, key) per block."""
    key_cols = list(key_cols or [])
    sum_cols = list(sum_cols or [])
    delta = pd.Timedelta(every)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df[ts_col].dt.floor(delta)
        g = df.assign(**{window_col: w}).groupby(
            [window_col] + key_cols, as_index=False)
        agg = g.agg(n=(ts_col, "size"),
                    **{f"sum_{c}": (c, "sum") for c in sum_cols})
        return agg

    partials = ds.map_batches(partial, batch_format="pandas")

    from ray.data.aggregate import Sum

    aggs = [Sum("n", alias_name="n")] + [
        Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols]
    out = partials.groupby([window_col] + key_cols).aggregate(*aggs)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {window_col: t[window_col]}
        for k in key_cols:
            cols[k] = t[k]
        cols["n"] = pc.cast(t["n"], pa.int64())
        for c in sum_cols:
            cols[f"sum_{c}"] = t[f"sum_{c}"]
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")
