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


def context_windows(
    ds: rd.Dataset,
    *,
    window: int,
    stride: int,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Sliding token windows per document — the LM-pretraining chunker
    (fixed-size contexts with overlap; companion to :func:`pack_sequences`,
    which packs SHORT docs, where this splits LONG ones).  Emits one row
    per full window: (id, win int64 [0-based], text_window).

    Stateless per-block flat map, no shuffle.  Fully vectorized: one
    str.split pass for token counts, token char offsets from cumulative
    token lengths, windows materialized by repeating each doc's text and
    slicing with per-row ``utf8_slice_codeunits`` offset arrays — no
    Python loop over windows.  Docs shorter than ``window`` emit nothing
    (pack_sequences is the right tool there).  Tokenization matches SQL
    ``string_split``: an empty/null document counts as ONE empty token
    (so with window=1 it emits one empty window, exactly as the oracle's
    list_slice does) — filter empties upstream if that is not wanted."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    if window <= 0 or stride <= 0:
        raise ValueError("window and stride must be positive")

    def chunk(df: pd.DataFrame) -> pa.Table:
        texts = df[text_col].fillna("")
        toks = texts.str.split(" ")
        n_tok = toks.str.len().fillna(0).astype(int).to_numpy()
        k = np.maximum(0, (n_tok - window) // stride + 1)
        if int(k.sum()) == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "win": pa.array([], pa.int64()),
                             "text_window": pa.array([], pa.string())})
        # flat token array for the block; windows = one vectorized take of
        # (n_windows x window) indices, then list-offset binary_join — no
        # per-row slicing kernel exists in Arrow (utf8_slice_codeunits
        # offsets are scalar options), and no Python loop over windows
        flat = pa.array(np.concatenate(
            [np.asarray(row, object) for row in toks if len(row)] or
            [np.array([], object)]), pa.string())
        doc_starts = np.r_[0, np.cumsum(n_tok)][:-1]
        rows = np.repeat(np.arange(len(df)), k)          # doc index per window
        win = np.concatenate([np.arange(c) for c in k if c] or
                             [np.array([], np.int64)])
        tok_start = doc_starts[rows] + win * stride
        idx = (tok_start[:, None] + np.arange(window)).ravel()
        taken = flat.take(pa.array(idx))
        offs = pa.array(np.arange(len(rows) + 1, dtype=np.int32) * window)
        joined = pc.binary_join(pa.ListArray.from_arrays(offs, taken), " ")
        return pa.table({
            id_col: pa.array(df[id_col].to_numpy()[rows]),
            "win": pa.array(win.astype("int64")),
            "text_window": joined,
        })

    return ds.map_batches(chunk, batch_format="pandas")
