"""Sequence packing for LLM-training corpus prep (concat-then-chunk).

Packs a tokenized document stream into fixed-capacity training sequences
using the standard concat-then-chunk rule: lay every document out
back-to-back in a global order and cut the stream every ``capacity``
tokens. Each document's pack assignment is then a pure function of the
EXCLUSIVE prefix sum of token counts over that order::

    start        = running_sum(n_tokens) - n_tokens   # global token offset
    pack_id      = start // capacity
    pack_offset  = start %  capacity

which makes the whole operator a composition of the distributed prefix
scan (``stages/scan.py::running_sum`` — range-partitioned two-pass, only
O(num_buckets) carries touch the driver) and a stateless vectorized
``map_batches``. Nothing materializes; a document longer than
``capacity`` simply spans packs (it is chunked at tokenization time),
which concat-then-chunk permits by construction.

Scale shape (100 TB): the scan exchanges per-bucket partial sums only;
the pack assignment is embarrassingly parallel. The order column must be
roughly uniform over its range (ids are) — same partitioning assumption
as the underlying scan.

Reference analogue: none (training-data extension operator); the ordered
replay discipline mirrors the reference's ordered stage-area apply
(``model/EtlDatabaseObject.java:677-714``).
"""
from __future__ import annotations

import pandas as pd
import ray.data as rd

from .scan import running_sum

_CUM = "_pack_cum"


def pack_sequences(
    ds: rd.Dataset,
    *,
    order_cols: list[str],
    token_col: str,
    capacity: int,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Append ``pack_id`` / ``pack_offset`` (concat-then-chunk at
    ``capacity`` tokens over ``order_cols`` order). ``token_col`` must be
    integer (token counts are); the prefix sum is exact, so the output is
    deterministic and oracle-checkable."""
    if capacity <= 0:
        raise ValueError(f"capacity must be positive, got {capacity}")
    scanned = running_sum(ds, order_cols, token_col,
                          out_col=_CUM, num_buckets=num_buckets)

    def assign(df: pd.DataFrame) -> pd.DataFrame:
        start = df[_CUM].to_numpy() - df[token_col].to_numpy()
        return df.drop(columns=[_CUM]).assign(
            pack_id=start // capacity,
            pack_offset=start % capacity)

    return scanned.map_batches(assign, batch_format="pandas")
