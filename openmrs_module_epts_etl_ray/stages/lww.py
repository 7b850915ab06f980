"""LSN-ordered last-writer-wins reduction — the engine's core operator.

Reference semantics (SURVEY.md §2.12): on a key collision the newest
observation-date record wins (``model/EtlDatabaseObject.java:677-714``);
equal-LSN duplicates are idempotent replays and collapse to one row
(``KEPT_EXISTING``); conflict-group pick-newest is
``resolveconflictsinstagearea/processor/ResolveConflictsInStageAreaProcessor.java:33-62``.

Ray-Data shape: because max-LSN-wins is associative and commutative, the
reduce runs in two phases with NO ordering requirement on the input:

1. **partial combine** inside ``map_batches`` — each batch collapses to at
   most one row per key *before* the shuffle (this is what makes zipf-hot
   keys tractable: a mega-repo's millions of events shrink to one row per
   upstream block, the same effect as salting + first-phase reduce);
2. **final reduce** after a hash-bucket ``groupby`` — one vectorized Arrow
   group_by per bucket.

Both phases use Arrow ``sort_by(lsn) -> group_by(keys).aggregate(last)``,
zero Python-per-row work.
"""
from __future__ import annotations

import pyarrow as pa

from ..functions.hashing import BUCKET_COL, add_bucket


def lww_reduce_table(
    t: pa.Table,
    key_cols: tuple[str, ...] = ("repo", "path"),
    lsn_col: str = "lsn",
) -> pa.Table:
    """Keep, per key, the row with max LSN. Same-LSN duplicates collapse.

    Deterministic tie-break: among equal (key, lsn) rows the op column is a
    secondary ascending sort key and the last row wins, so a pathological
    non-identical same-LSN pair resolves deterministically to the
    lexicographically greatest op (update > insert > delete).
    """
    if len(t) == 0:
        return t
    key_cols = tuple(key_cols)
    sort_keys = [(lsn_col, "ascending")]
    if "op" in t.column_names:
        sort_keys.append(("op", "ascending"))
    t = t.sort_by(sort_keys)
    other = [c for c in t.column_names if c not in key_cols]
    agg = t.group_by(list(key_cols), use_threads=False).aggregate([(c, "last") for c in other])
    agg = agg.rename_columns(list(key_cols) + other)
    return agg.select(t.column_names)


N_EVENTS_COL = "_n_events"


class PartialLww:
    """Per-batch LWW combiner for ``map_batches`` (pre-shuffle).

    Selection-based: lexsort the (key-hash, lsn) INTEGER columns only, take
    the last row per key — one ``Table.take`` of the winners instead of an
    Arrow sort+hash-agg over the wide string payload (~2× cheaper per row).
    Key identity within the batch uses a 128-bit (dual siphash) key, so a
    false merge needs a 2^-128 collision; the final per-bucket reduce
    compares real key strings.

    Also assigns the hash-bucket partition column when ``num_buckets`` is
    given (so the shuffle moves only collapsed winners) and accumulates the
    raw per-key event count in ``_n_events`` for lineage.
    """

    def __init__(self, key_cols=("repo", "path"), lsn_col: str = "lsn",
                 num_buckets: int | None = None):
        self.key_cols = tuple(key_cols)
        self.lsn_col = lsn_col
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.hashing import key_hash2

        n = len(batch)
        if n == 0:
            return batch
        h1, h2 = key_hash2(batch, self.key_cols)
        lsn = batch[self.lsn_col].to_numpy()
        if "op" in batch.column_names:
            # op as a tiny tie-break rank for pathological same-LSN pairs:
            # update > insert > delete (matches lww_reduce_table)
            op = batch["op"].to_numpy(zero_copy_only=False)
            rank = np.where(op == "update", 2, np.where(op == "insert", 1, 0))
            order = np.lexsort((rank, lsn, h2, h1))
        else:
            order = np.lexsort((lsn, h2, h1))
        h1s, h2s = h1[order], h2[order]
        is_last = np.empty(n, dtype=bool)
        is_last[-1] = True
        np.not_equal(h1s[1:], h1s[:-1], out=is_last[:-1])
        is_last[:-1] |= h2s[1:] != h2s[:-1]
        idx = order[is_last]

        counts_in = batch[N_EVENTS_COL].to_numpy()[order] if N_EVENTS_COL in batch.column_names else None
        group_ends = np.flatnonzero(is_last)
        sizes = np.diff(np.r_[-1, group_ends])
        if counts_in is not None:
            csum = np.r_[0, np.cumsum(counts_in)]
            counts = csum[group_ends + 1] - csum[np.r_[-1, group_ends[:-1]] + 1]
        else:
            counts = sizes

        out = batch.take(pa.array(idx))
        if N_EVENTS_COL in out.column_names:
            out = out.drop_columns([N_EVENTS_COL])
        out = out.append_column(N_EVENTS_COL, pa.array(counts, pa.int64()))
        if self.num_buckets is not None:
            bucket = (h1[idx] % np.uint64(self.num_buckets)).astype(np.int64)
            out = out.append_column(BUCKET_COL, pa.array(bucket, pa.int64()))
        return out


def lww_final_state(
    ds,
    key_cols=("repo", "path"),
    lsn_col: str = "lsn",
    *,
    num_buckets: int = 32,
    drop_deleted: bool = True,
    batch_size: int = 65536,
):
    """Pure LWW final state of an event Dataset (no lake/commit-log).

    This is the reference's resolve-conflicts-in-stage-area operation
    (``ResolveConflictsInStageAreaProcessor.java:33-62``): group rows sharing
    a key, keep the most recent. Partial combine per batch, then one
    vectorized Arrow reduce per hash bucket.
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


def _lww_with_counts(t: pa.Table, key_cols, lsn_col: str) -> pa.Table:
    """LWW reduce that sums ``_n_events`` instead of taking last-of."""
    if len(t) == 0:
        return t
    key_cols = tuple(key_cols)
    sort_keys = [(lsn_col, "ascending")]
    if "op" in t.column_names:
        sort_keys.append(("op", "ascending"))
    t = t.sort_by(sort_keys)
    other = [c for c in t.column_names if c not in key_cols]
    aggs = [(c, "sum" if c == N_EVENTS_COL else "last") for c in other]
    agg = t.group_by(list(key_cols), use_threads=False).aggregate(aggs)
    agg = agg.rename_columns(list(key_cols) + other)
    return agg.select(t.column_names)
