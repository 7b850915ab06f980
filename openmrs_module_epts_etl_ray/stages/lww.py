"""LSN-ordered last-writer-wins reduction — the engine's core operator.

Reference semantics (SURVEY.md §2.12): on a key collision the newest
observation-date record wins (``model/EtlDatabaseObject.java:677-714``);
equal-LSN duplicates are idempotent replays and collapse to one row
(``KEPT_EXISTING``); conflict-group pick-newest is
``resolveconflictsinstagearea/processor/ResolveConflictsInStageAreaProcessor.java:33-62``.

Ray-Data shape: because max-LSN-wins is associative and commutative, the
reduce runs in two phases with NO ordering requirement on the input:

1. **partial combine** inside ``map_batches`` — each batch collapses to at
   most one row per key *before* the exchange (this is what makes zipf-hot
   keys tractable: a mega-repo's millions of events shrink to one row per
   upstream block, the same effect as salting + first-phase reduce);
2. **final reduce** per hash bucket (groupby shuffle or push exchange) —
   the same selection kernel over the bucket's collapsed rows.

The selection kernel is exact and vectorized: dictionary-encode the composite
key (C++ hash table, touches each string once), compose ``(code, rel_lsn,
op_rank)`` into one int64, argsort, take the last row per code group. Zero
Python-per-row work, no wide-payload sort, no hash-collision caveat.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions.hashing import BUCKET_COL, dict_bucket, key_codes

N_EVENTS_COL = "_n_events"

_OP_RANK = {"delete": 0, "insert": 1, "update": 2}


def _op_rank(batch: pa.Table) -> np.ndarray | None:
    """Tie-break rank for pathological non-identical same-(key, lsn) pairs:
    update > insert > delete — deterministic regardless of arrival order
    (mirrors the reference's deterministic conflict pick, §2.12)."""
    if "op" not in batch.column_names:
        return None
    if batch["op"].null_count:
        raise ValueError(
            "null 'op' in event batch — route untrusted input through "
            "replay(dead_letter_dir=...)")
    col = batch["op"]
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    enc = col.dictionary_encode()
    lut = np.array([_OP_RANK.get(v, 1) for v in enc.dictionary.to_pylist()],
                   dtype=np.int64)
    return lut[enc.indices.to_numpy().astype(np.int64, copy=False)]


def _payload_hash(batch: pa.Table, key_cols, lsn_col: str,
                  rows: np.ndarray | None = None) -> np.ndarray | None:
    """Per-row uint64 hash of the payload columns (everything except key /
    lsn / op / bookkeeping) — the deterministic tie-break for same-(key,
    lsn, op) rows. ``rows`` restricts hashing to those row indices: ordinary
    at-least-once duplicate rates make ties common, and hashing the WHOLE
    batch's content per block would dominate the replay (measured 2x)."""
    from pandas.util import hash_pandas_object

    skip = set(key_cols) | {lsn_col, "op", N_EVENTS_COL, BUCKET_COL}
    cols = [c for c in batch.column_names if c not in skip]
    if not cols:
        return None
    sel = batch.select(cols)
    if rows is not None:
        sel = sel.take(pa.array(rows))
    return hash_pandas_object(sel.to_pandas(), index=False).to_numpy()


def _tie_break_order(order: np.ndarray, scomp_key: np.ndarray, eq: np.ndarray,
                     batch: pa.Table, key_cols, lsn_col: str) -> np.ndarray:
    """Reorder rows WITHIN tied composite runs by payload hash (stable
    everywhere else). ``eq[i]`` marks scomp_key[i+1] == scomp_key[i]."""
    run_member = np.r_[False, eq] | np.r_[eq, False]
    pos = np.flatnonzero(run_member)
    rows = order[pos]
    th = _payload_hash(batch, key_cols, lsn_col, rows=rows)
    if th is None:
        return order
    sub = np.lexsort((th, scomp_key[pos]))
    order = order.copy()
    order[pos] = rows[sub]
    return order


def lww_select(
    batch: pa.Table,
    key_cols: tuple[str, ...],
    lsn_col: str = "lsn",
) -> tuple[np.ndarray, np.ndarray, np.ndarray, pa.Array]:
    """Select the per-key winner rows of a batch (exact, vectorized).

    Returns ``(winner_rows, counts, codes, dictionary)`` where ``winner_rows``
    indexes the batch rows that win their key group, ``counts`` is the total
    event count folded into each winner (summing an existing ``_n_events``
    column when present, so re-combining already-combined rows keeps true
    counts), ``codes``/``dictionary`` the block-local key encoding.
    """
    n = len(batch)
    if batch[lsn_col].null_count:
        raise ValueError(
            f"null {lsn_col!r} in event batch — the LSN total order must "
            f"exist; route untrusted input through replay(dead_letter_dir=...)")
    codes, dictionary = key_codes(batch, key_cols)
    lsn = batch[lsn_col].to_numpy()
    lsn0 = int(lsn.min())
    rel = (lsn - lsn0).astype(np.int64)
    rank = _op_rank(batch)

    nu = len(dictionary)
    span_bits = int(rel.max()).bit_length() + (2 if rank is not None else 0)
    code_bits = max(nu - 1, 0).bit_length()
    if code_bits + span_bits <= 62:
        comp = codes << np.int64(span_bits)
        if rank is not None:
            comp |= (rel << np.int64(2)) | rank
        else:
            comp |= rel
        order = np.argsort(comp, kind="stable")
        scomp = comp[order]
        eq = scomp[1:] == scomp[:-1] if n > 1 else np.zeros(0, dtype=bool)
        if eq.any():
            # same-(key, lsn, op) rows present: fold a payload hash in as
            # the lowest-priority tie-break so the winner is a pure function
            # of the ROW SET, not of block layout (divergent-content ties
            # are malformed input with an undefined winner — route them via
            # replay(dead_letter_dir=...) — but the pick must still be
            # deterministic across partitionings). Only the TIED rows are
            # hashed; ordinary at-least-once dup rates make ties common.
            order = _tie_break_order(order, scomp, eq, batch, key_cols, lsn_col)
        sc = codes[order]
    else:  # astronomically wide LSN span: fall back to multi-key lexsort
        keys = (lsn, codes) if rank is None else (rank, lsn, codes)
        order = np.lexsort(keys)
        eq = (codes[order][1:] == codes[order][:-1]) \
            & (lsn[order][1:] == lsn[order][:-1])
        if rank is not None:
            eq &= (rank[order][1:] == rank[order][:-1])
        if eq.any():
            # composite surrogate for run identity in sorted space: the
            # lexsort keys are equal exactly where eq marks; use the sorted
            # position's run id (cumsum of boundaries) as the group key
            run_id = np.r_[0, np.cumsum(~eq)].astype(np.int64)
            order = _tie_break_order(order, run_id, eq, batch, key_cols, lsn_col)
        sc = codes[order]
    is_last = np.empty(n, dtype=bool)
    is_last[-1] = True
    np.not_equal(sc[1:], sc[:-1], out=is_last[:-1])
    winner_rows = order[is_last]

    if N_EVENTS_COL in batch.column_names:
        w = batch[N_EVENTS_COL].to_numpy().astype(np.int64, copy=False)
        counts_per_code = np.bincount(codes, weights=w, minlength=nu).astype(np.int64)
    else:
        counts_per_code = np.bincount(codes, minlength=nu)
    counts = counts_per_code[codes[winner_rows]]
    return winner_rows, counts, codes, dictionary


def _with_counts(batch: pa.Table, winner_rows: np.ndarray, counts: np.ndarray) -> pa.Table:
    out = batch.take(pa.array(winner_rows))
    if N_EVENTS_COL in out.column_names:
        out = out.drop_columns([N_EVENTS_COL])
    return out.append_column(N_EVENTS_COL, pa.array(counts, pa.int64()))


def lww_reduce_table(
    t: pa.Table,
    key_cols: tuple[str, ...] = ("repo", "path"),
    lsn_col: str = "lsn",
) -> pa.Table:
    """Keep, per key, the row with max LSN. Same-LSN duplicates collapse."""
    if len(t) == 0:
        return t
    winner_rows, _, _, _ = lww_select(t, tuple(key_cols), lsn_col)
    return t.take(pa.array(np.sort(winner_rows)))


def _lww_with_counts(t: pa.Table, key_cols, lsn_col: str) -> pa.Table:
    """LWW reduce that sums ``_n_events`` across collapsed rows."""
    if len(t) == 0:
        return t
    winner_rows, counts, _, _ = lww_select(t, tuple(key_cols), lsn_col)
    return _with_counts(t, winner_rows, counts)


class PartialLww:
    """Per-batch LWW combiner for ``map_batches`` (pre-exchange).

    One :func:`lww_select` pass per block; when ``num_buckets`` is given the
    stable partition id is computed by hashing only the key *dictionary*
    (uniques) and scattering through the codes, so the exchange moves only
    the collapsed winners and the SipHash runs once per unique key, not once
    per row. Raw per-key event counts accumulate in ``_n_events`` so lineage
    reports true events-seen after collapsing.
    """

    def __init__(self, key_cols=("repo", "path"), lsn_col: str = "lsn",
                 num_buckets: int | None = None,
                 bucket_cols: tuple[str, ...] | None = None):
        # bucket_cols: partition by these columns instead of key_cols —
        # needed when the merge must co-locate rows by an ALTERNATE unique
        # key (quick-merge PK adoption, ConflictPolicy.unique_keys) rather
        # than by the collapse key. Same hash as add_bucket / dict_bucket.
        self.key_cols = tuple(key_cols)
        self.lsn_col = lsn_col
        self.num_buckets = num_buckets
        self.bucket_cols = tuple(bucket_cols) if bucket_cols else None

    def __call__(self, batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            # keep the OUTPUT schema even for empty blocks (a window filter
            # can empty a block; heterogeneous schemas break the exchange)
            out = batch
            if N_EVENTS_COL not in out.column_names:
                out = out.append_column(N_EVENTS_COL, pa.array([], pa.int64()))
            if self.num_buckets is not None and BUCKET_COL not in out.column_names:
                out = out.append_column(BUCKET_COL, pa.array([], pa.int64()))
            return out
        winner_rows, counts, codes, dictionary = lww_select(
            batch, self.key_cols, self.lsn_col)
        out = _with_counts(batch, winner_rows, counts)
        if self.num_buckets is not None:
            if self.bucket_cols is not None:
                from ..functions.hashing import key_hash
                b = (key_hash(out, self.bucket_cols)
                     % np.uint64(self.num_buckets)).astype(np.int64)
                out = out.append_column(BUCKET_COL, pa.array(b, pa.int64()))
            else:
                bucket_u = dict_bucket(dictionary, self.num_buckets)
                bucket = bucket_u[codes[winner_rows]]
                out = out.append_column(BUCKET_COL, pa.array(bucket, pa.int64()))
        return out


def lww_final_state(
    ds,
    key_cols=("repo", "path"),
    lsn_col: str = "lsn",
    *,
    num_buckets: int = 32,
    drop_deleted: bool = True,
    batch_size: int | None = None,
):
    """Pure LWW final state of an event Dataset (no lake/commit-log).

    This is the reference's resolve-conflicts-in-stage-area operation
    (``ResolveConflictsInStageAreaProcessor.java:33-62``): group rows sharing
    a key, keep the most recent. Partial combine per batch, then one
    vectorized reduce per hash bucket.
    """
    import pyarrow.compute as pc

    key_cols = tuple(key_cols)
    collapsed = ds.map_batches(
        PartialLww(key_cols=key_cols, lsn_col=lsn_col, num_buckets=num_buckets),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )

    def final(group: pa.Table) -> pa.Table:
        t = group.drop_columns([BUCKET_COL])
        t = _lww_with_counts(t, key_cols, lsn_col)
        if N_EVENTS_COL in t.column_names:
            t = t.drop_columns([N_EVENTS_COL])
        if drop_deleted and "op" in t.column_names:
            t = t.filter(pc.not_equal(t["op"], "delete"))
        return t

    return collapsed.groupby(BUCKET_COL).map_groups(final, batch_format="pyarrow")


def multi_stream_lww(
    streams,
    key_cols,
    lsn_col: str,
    seq_col: str,
    *,
    stream_col: str = "stream",
    num_buckets: int = 32,
):
    """K-way merge of several CDC streams (replica binlogs / shard WALs that
    may carry overlapping writes for the same key) into one final state:
    per key the winner is the row with the highest LSN; an LSN tie across
    streams is broken by stream priority (lower = more authoritative, e.g.
    primary over replica), then the highest ``seq_col`` within the same
    (lsn, stream) wins — fully deterministic regardless of arrival order.  This is the reference's
    multi-origin conflict rule (record-origin + update timestamp,
    ``SURVEY.md §2.12``) lifted to stream granularity.

    ``streams`` is ``[(dataset, priority_int), ...]``.  Shape mirrors
    ``lww_final_state``: tag + union (no barrier), per-block partial winner
    before the one hash-bucket exchange — hot keys collapse to one row per
    upstream block per stream, so a mega-key never concentrates raw events
    on one reducer.
    """
    import pandas as pd
    import ray.data as rd  # noqa: F401  (type context)

    from ..functions.hashing import key_hash

    key_cols = list(key_cols)
    by = [lsn_col, stream_col, seq_col]
    asc = [False, True, False]

    def _tag(priority: int):
        def f(t: pa.Table) -> pa.Table:
            return t.append_column(
                stream_col, pa.array(np.full(len(t), priority, np.int64)))
        return f

    def _partial(df: pd.DataFrame) -> pd.DataFrame:
        w = df.sort_values(by, ascending=asc, kind="stable") \
              .drop_duplicates(key_cols, keep="first")
        # hash needs only the key columns — converting the whole collapsed
        # frame would copy every payload column per block
        t = pa.Table.from_pandas(w[key_cols], preserve_index=False)
        b = (key_hash(t, tuple(key_cols)) % np.uint64(num_buckets)
             ).astype(np.int64)
        return w.assign(**{BUCKET_COL: b})

    def _final(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(by, ascending=asc, kind="stable") \
                .drop_duplicates(key_cols, keep="first") \
                .drop(columns=[BUCKET_COL])

    tagged = [ds.map_batches(_tag(p), batch_format="pyarrow",
                             zero_copy_batch=True)
              for ds, p in streams]
    uni = tagged[0]
    if len(tagged) > 1:
        uni = uni.union(*tagged[1:])
    collapsed = uni.map_batches(_partial, batch_format="pandas")
    return collapsed.groupby(BUCKET_COL).map_groups(
        _final, batch_format="pandas")
