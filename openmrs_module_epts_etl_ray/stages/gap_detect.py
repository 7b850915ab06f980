"""Gap detection over a dense id / LSN sequence (SURVEY §2.2 M7).

Reference: ``detectgapes/processor/DetectGapesProcessor.java:41-67`` scans a
PK-ordered stream and emits ids missing between consecutive rows. A global
sort would be an all-to-all shuffle whose output still needs cross-block
boundary stitching; instead gap detection is local within fixed id ranges:

1. bucket ids by ``id // range_size`` (one shuffle of bare int64s);
2. per range emit the INTERNAL gap runs (between consecutive present ids)
   plus one summary row ``(first_present, last_present)``;
3. stitch the tiny summary table (≤ one row per non-empty range) in a single
   pass to emit the runs that cross range boundaries — wholly-empty ranges
   are bridged automatically.

Output runs are identical to a global ordered scan. Works for CDC LSN-gap
checks per partition too.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

RANGE_COL = "_range"

_EMPTY = pa.table({"gap_start": pa.array([], pa.int64()),
                   "gap_end": pa.array([], pa.int64())})


def detect_gaps(ds: rd.Dataset, id_col: str, *, range_size: int = 100_000) -> rd.Dataset:
    """Emit (gap_start, gap_end) inclusive runs of missing ids between the
    observed global min and max."""
    ids = ds.select_columns([id_col])

    def bucketize(t: pa.Table) -> pa.Table:
        arr = t[id_col].to_numpy()
        return pa.table({id_col: pa.array(arr, pa.int64()),
                         RANGE_COL: pa.array(arr // range_size, pa.int64())})

    def runs_in_range(g: pd.DataFrame) -> pd.DataFrame:
        present = np.unique(g[id_col].to_numpy(dtype=np.int64))
        starts = present[:-1] + 1
        ends = present[1:] - 1
        mask = ends >= starts
        out = pd.DataFrame({"gap_start": starts[mask], "gap_end": ends[mask],
                            "is_summary": False})
        summary = pd.DataFrame({"gap_start": [present[0]], "gap_end": [present[-1]],
                                "is_summary": True})
        return pd.concat([out, summary], ignore_index=True)

    grouped = (ids.map_batches(bucketize, batch_format="pyarrow")
               .groupby(RANGE_COL)
               .map_groups(runs_in_range, batch_format="pandas")
               .materialize())

    internal = grouped.filter(expr="is_summary == False").select_columns(
        ["gap_start", "gap_end"])

    # stitch across ranges: summaries are tiny (<= one per non-empty range)
    summ = grouped.filter(expr="is_summary == True").to_pandas()
    if len(summ) == 0:
        return rd.from_arrow(_EMPTY)
    summ = summ.sort_values("gap_start")  # ranges are disjoint -> sorted by first_present
    last = summ["gap_end"].to_numpy()[:-1] + 1
    first = summ["gap_start"].to_numpy()[1:] - 1
    mask = first >= last
    extra = pa.table({"gap_start": pa.array(last[mask], pa.int64()),
                      "gap_end": pa.array(first[mask], pa.int64())})
    return internal.union(rd.from_arrow(extra if len(extra) else _EMPTY))
