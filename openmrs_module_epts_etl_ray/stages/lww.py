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

    Also assigns the hash-bucket partition column when ``num_buckets`` is
    given, so the downstream ``groupby(_bucket)`` shuffles the already-
    collapsed rows only, and accumulates the raw event count per key in
    ``_n_events`` so lineage can report true events-seen after collapsing.
    """

    def __init__(self, key_cols=("repo", "path"), lsn_col: str = "lsn",
                 num_buckets: int | None = None):
        self.key_cols = tuple(key_cols)
        self.lsn_col = lsn_col
        self.num_buckets = num_buckets

    def __call__(self, batch: pa.Table) -> pa.Table:
        if N_EVENTS_COL not in batch.column_names:
            batch = batch.append_column(
                N_EVENTS_COL, pa.array([1] * len(batch), type=pa.int64())
            )
        out = _lww_with_counts(batch, self.key_cols, self.lsn_col)
        if self.num_buckets is not None:
            out = add_bucket(out, self.key_cols, self.num_buckets, BUCKET_COL)
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
