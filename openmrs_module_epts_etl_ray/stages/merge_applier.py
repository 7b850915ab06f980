"""MergeApplier — the stateful upsert stage (actor pool over hash buckets).

Re-expresses the reference's merge-existing-record contract (SURVEY.md §2.12,
``model/EtlDatabaseObject.java:614-726`` invoked from
``model/pojo/generic/AbstractDatabaseObject.java:289-317``) as a per-bucket
vectorized merge:

1. find existing row by key (the reference probes the destination DB by
   PK/unique key; we join against the bucket's current lake state);
2. decide the winner per :class:`ConflictPolicy` — KEEP_EXISTING /
   UPDATE_EXISTING / winning-fields / newest-LSN (the reference's
   observation-date rule with LSN as the total order);
3. apply — update, insert, or keep; deletes become tombstone rows retained in
   state (so a late stale update cannot resurrect a deleted key) and excluded
   from the final table view. Compaction may drop tombstones older than the
   global low-watermark.

Each ``__call__`` handles ONE hash bucket (fed by
``groupby(_bucket).map_groups``), reads the bucket's committed state from the
:class:`~..state.commit_log.CommitLog`, merges, commits atomically, and emits
a single lineage row (FIXTURES.md F7). Replayed buckets (commit already
present) are skipped — exactly-once under Ray task retries.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd
import pyarrow as pa

from ..functions.hashing import BUCKET_COL, add_content_sha
from ..state.commit_log import CommitLog
from ..state.lineage import LINEAGE_SCHEMA, lineage_row, state_fingerprint
from .lww import N_EVENTS_COL, _lww_with_counts
from .schema_evolution import unify_and_backfill

DELETED_COL = "_deleted"


@dataclass
class ConflictPolicy:
    """Conflict-resolution config (reference ``conf/types/ConflictResolutionType.java``,
    winning-fields ``model/EtlDatabaseObject.java:646-676``)."""

    mode: str = "lww_lsn"  # lww_lsn | keep_existing | update_existing | winning_fields
    # incoming wins iff ALL (field, value) pairs of ANY group match the incoming row
    winning_field_groups: list[list[tuple[str, object]]] = field(default_factory=list)
    # alternate unique-key groups probed IN ORDER when the PK probe misses
    # (reference ``model/EtlDatabaseObject.java:619-633`` /
    # ``model/pojo/generic/DatabaseObjectDAO.java:179-225``: find the existing
    # destination record by any configured unique key when the PK is not
    # transformable, then merge onto it — the quick-merge use case). On a hit
    # the incoming row ADOPTS the existing row's PK columns.
    unique_keys: list[list[str]] = field(default_factory=list)

    def incoming_wins(self, incoming: pd.DataFrame, existing_lsn: pd.Series) -> np.ndarray:
        """Vectorized winner decision for rows that HAVE an existing match."""
        n = len(incoming)
        if self.mode == "keep_existing":
            return np.zeros(n, dtype=bool)
        if self.mode == "update_existing":
            return np.ones(n, dtype=bool)
        if self.mode == "winning_fields":
            wins = np.zeros(n, dtype=bool)
            for group in self.winning_field_groups:
                m = np.ones(n, dtype=bool)
                for fname, fval in group:
                    m &= (incoming[fname] == fval).to_numpy(dtype=bool, na_value=False)
                wins |= m
            return wins
        # lww_lsn: strictly newer wins (reference: dateDiff > 0,
        # EtlDatabaseObject.java:677-714); equal LSN = idempotent replay -> keep
        existing = existing_lsn.to_numpy(dtype="int64", na_value=-1) \
            if existing_lsn.dtype == "Int64" else existing_lsn.to_numpy()
        return (incoming["lsn"].to_numpy() > existing)


def merge_bucket_state(
    state: pa.Table,
    winners: pa.Table,
    policy: ConflictPolicy,
    key_cols: tuple[str, ...] = ("repo", "path"),
    return_applied: bool = False,
):
    """Merge LWW-reduced incoming winners into a bucket's state table.

    ``state`` rows carry payload columns + ``lsn`` + ``_deleted``; ``winners``
    carry payload + ``lsn`` + ``op`` (one row per key). Returns the new state
    and conflict statistics (plus, with ``return_applied=True``, the applied
    rows alone — the delta a delta-layout commit persists). Vectorized
    pandas; bucket-sized inputs only.
    """
    key_cols = list(key_cols)

    def enforce_unique_keys(df: pd.DataFrame) -> pd.DataFrame:
        # highest-LSN row survives per uk group. Re-sort by lsn at the TOP of
        # every iteration: the keyed/null-key concat below reorders rows, so
        # without it the second uk group's keep='last' could keep a lower-LSN
        # sibling.
        for uk in policy.unique_keys:
            uk = [c for c in uk]
            if not all(c in df.columns for c in uk):
                continue
            df = df.sort_values("lsn", kind="stable")
            keyed_mask = df[uk].notna().all(axis=1)  # null uk never binds
            keyed = df[keyed_mask].drop_duplicates(subset=uk, keep="last")
            df = pd.concat([keyed, df[~keyed_mask]])
        return df

    wdf = winners.to_pandas()
    is_delete = (wdf["op"] == "delete").to_numpy()
    wdf = wdf.drop(columns=["op"])
    wdf[DELETED_COL] = is_delete

    if len(state) == 0:
        lost = 0
        if policy.unique_keys:
            # the destination's unique constraints bind on bootstrap too:
            # two fresh inserts sharing a unique key collapse to the
            # highest-LSN one (a DB would reject the second insert and the
            # reference would merge onto the first)
            before = len(wdf)
            wdf = enforce_unique_keys(wdf)
            lost = before - len(wdf)
            is_delete = wdf[DELETED_COL].to_numpy()
        stats = {
            "inserted": int((~is_delete).sum()),
            "updated": 0,
            "kept_existing": lost,
            "tombstones": int(is_delete.sum()),
        }
        new_state = pa.Table.from_pandas(wdf, preserve_index=False)
        if return_applied:
            return new_state, stats, new_state
        return new_state, stats

    sdf = state.to_pandas()
    # schema evolution: unify payload columns across state and incoming
    # (after these two loops both frames share one column SET; the final
    # Arrow-schema unification happens in unify_and_backfill below)
    for c in wdf.columns:
        if c not in sdf.columns:
            sdf[c] = None
    for c in sdf.columns:
        if c not in wdf.columns:
            wdf[c] = None
    wdf = wdf[sdf.columns.tolist()]

    # nullable Int64 keeps _existing_lsn EXACT: a plain left merge coerces
    # int64 -> float64 whenever any incoming key is new, and above 2^53 a
    # strictly newer LSN then compares equal and the update is dropped
    probe = sdf[key_cols + ["lsn"]].rename(columns={"lsn": "_existing_lsn"})
    probe["_existing_lsn"] = probe["_existing_lsn"].astype("Int64")
    merged = wdf.merge(probe, on=key_cols, how="left")

    # unique-key fallback probe (reference EtlDatabaseObject.java:619-633):
    # rows the PK probe missed are re-probed against state by each configured
    # alternate unique key, in order; a hit adopts the existing row's PK so
    # the update lands on the existing record instead of inserting a twin.
    # Partitioning contract: callers must hash-bucket by the unique key (see
    # pipelines.replay.quick_merge) so probe and state co-locate.
    for uk in policy.unique_keys:
        uk = [c for c in uk]
        if uk == list(key_cols):
            # identical to the PK probe above — nothing new to match
            continue
        if any(c not in merged.columns for c in uk) or any(c not in sdf.columns for c in uk):
            continue
        miss = merged["_existing_lsn"].isna().to_numpy()
        valid = merged[uk].notna().all(axis=1).to_numpy()  # null uk never matches
        rows = np.flatnonzero(miss & valid)
        if rows.size == 0:
            continue
        # a column in BOTH uk and key_cols must serve twice: as the join
        # key (kept under its own name) and as the adopted PK value (the
        # _uk_ copy) — naive select-then-rename would collapse or KeyError
        uprobe = sdf[list(dict.fromkeys(uk + key_cols))].copy()
        uprobe["_uk_lsn"] = sdf["lsn"].to_numpy()
        for k in key_cols:
            uprobe[f"_uk_{k}"] = uprobe[k].to_numpy()
        uprobe = uprobe[uk + [f"_uk_{k}" for k in key_cols] + ["_uk_lsn"]]
        uprobe = uprobe.drop_duplicates(subset=uk, keep="first")
        uprobe["_uk_lsn"] = uprobe["_uk_lsn"].astype("Int64")
        sub = merged.iloc[rows][uk].merge(uprobe, on=uk, how="left")
        hit = np.flatnonzero(sub["_uk_lsn"].notna().to_numpy())
        if hit.size == 0:
            continue
        hit_rows = rows[hit]
        merged.iloc[hit_rows, merged.columns.get_loc("_existing_lsn")] = \
            sub.iloc[hit]["_uk_lsn"].to_numpy()
        for k in key_cols:
            merged.iloc[hit_rows, merged.columns.get_loc(k)] = \
                sub.iloc[hit][f"_uk_{k}"].to_numpy()

    has_existing = merged["_existing_lsn"].notna().to_numpy()
    wins = np.ones(len(merged), dtype=bool)
    if has_existing.any():
        sub = merged[has_existing]
        wins_sub = policy.incoming_wins(sub, sub["_existing_lsn"])
        wins[np.flatnonzero(has_existing)] = wins_sub
    merged["_had_existing"] = has_existing
    applied = merged[wins]
    lost_to_sibling = 0
    if policy.unique_keys:
        # PK adoption (and uk-constrained inserts) can leave two incoming
        # rows on one final key — enforce the unique constraints the way the
        # destination DB would: highest LSN survives per PK and per uk group
        before = len(applied)
        applied = applied.sort_values("lsn", kind="stable") \
                         .drop_duplicates(subset=key_cols, keep="last")
        applied = enforce_unique_keys(applied)
        lost_to_sibling = before - len(applied)
    applied = applied.drop(columns=["_existing_lsn", "_had_existing"])
    del_applied = applied[DELETED_COL].to_numpy(dtype=bool)
    had = merged.loc[applied.index, "_had_existing"].to_numpy(dtype=bool)

    stats = {
        "inserted": int((~had & ~del_applied).sum()),
        "updated": int((had & ~del_applied).sum()),
        "kept_existing": int((~wins).sum()) + lost_to_sibling,
        "tombstones": int(del_applied.sum()),
    }

    # drop replaced keys from state, append applied rows
    applied_keys = pd.MultiIndex.from_frame(applied[key_cols])
    state_keys = pd.MultiIndex.from_frame(sdf[key_cols])
    survivors = sdf[~state_keys.isin(applied_keys)]
    out = pd.concat([survivors, applied], ignore_index=True)

    new_state, = unify_and_backfill([pa.Table.from_pandas(out, preserve_index=False)])
    if return_applied:
        applied_tbl, = unify_and_backfill(
            [pa.Table.from_pandas(applied, preserve_index=False)])
        return new_state, stats, applied_tbl
    return new_state, stats


class MergeApplier:
    """Actor-pool stage: one call merges one hash bucket and commits it.

    Used as ``events.groupby('_bucket').map_groups(MergeApplier, ...,
    concurrency=N)`` — the callable-class form makes Ray run it as an actor
    pool; the CommitLog handle and policy are built once per actor
    (reference analogue: per-engine state in ``engine/TaskProcessor.java``).
    """

    def __init__(
        self,
        lake_root: str,
        policy: ConflictPolicy | None = None,
        key_cols: tuple[str, ...] = ("repo", "path"),
        hash_content: bool = True,
        retry_mode: bool = False,
        layout: str = "snapshot",
        snapshot_every: int = 8,
    ):
        # retry_mode (dead-letter reprocessing, reference
        # ``engine/Engine.java:367-406``): incoming rows keep their ORIGINAL
        # LSNs, which sit below the bucket watermark — so the watermark
        # filter is skipped (per-key LWW still guards against clobbering
        # newer state) and the commit AMENDS the current snapshot in place
        # instead of advancing the watermark.
        #
        # layout="delta": each commit persists only the rows it APPLIED
        # (tombstones included) plus a full snapshot every snapshot_every
        # commits — cuts full-snapshot write amplification at 10^10 events;
        # the read path reconstructs snapshot+deltas (CommitLog.read_state)
        # and compaction re-materializes a full snapshot. Default stays
        # "snapshot": O(bucket) reads with zero reconstruction.
        if layout not in ("snapshot", "delta"):
            raise ValueError(f"layout={layout!r}")
        self.commit_log = CommitLog(lake_root)
        self.policy = policy or ConflictPolicy()
        self.key_cols = tuple(key_cols)
        self.hash_content = hash_content
        self.retry_mode = retry_mode
        self.layout = layout
        self.snapshot_every = snapshot_every

    def __call__(self, group: pa.Table) -> pa.Table:
        if len(group) == 0:
            return LINEAGE_SCHEMA.empty_table()
        bucket = group[BUCKET_COL][0].as_py()
        events = group.drop_columns([BUCKET_COL])
        if N_EVENTS_COL in events.column_names:
            events_seen = pa.compute.sum(events[N_EVENTS_COL]).as_py() or 0
        else:
            events_seen = len(events)
        lsn_lo = pa.compute.min(events["lsn"]).as_py()
        lsn_hi = pa.compute.max(events["lsn"]).as_py()

        # resume: drop events at or below the bucket's committed watermark
        ckpt = self.commit_log.committed_lsn_hi(bucket)
        if not self.retry_mode:
            if ckpt >= 0:
                events = events.filter(pa.compute.greater(events["lsn"], ckpt))
            if len(events) == 0 or lsn_hi <= ckpt:
                # already-committed window: the lineage row's state facts
                # come from the commit manifest when present — re-reading
                # (and in delta layout re-CONSTRUCTING) the whole bucket
                # state for a no-op resume was the most expensive path in
                # the file; read_state remains the fallback for lakes
                # committed before state_sha was recorded
                cur = self.commit_log.current(bucket)
                if cur and "state_sha" in cur:
                    n_rows = int(cur.get("state_rows", cur.get("rows", 0)))
                    sha = cur["state_sha"]
                else:
                    state = self.commit_log.read_state(bucket)
                    n_rows, sha = len(state), self._fingerprint(state)
                return lineage_row(
                    partition_id=bucket, lsn_lo=lsn_lo, lsn_hi=lsn_hi,
                    events_seen=events_seen, rows_applied=0, inserted=0, updated=0,
                    kept_existing=0, tombstones=0,
                    state_rows=n_rows,
                    state_sha=sha, committed=False,
                )

        winners = _lww_with_counts(events, self.key_cols, "lsn")
        if N_EVENTS_COL in winners.column_names:
            winners = winners.drop_columns([N_EVENTS_COL])
        if self.hash_content and "content" in winners.column_names:
            winners = add_content_sha(winners)
        state = self.commit_log.read_state(bucket)
        want_delta = (self.layout == "delta" and not self.retry_mode
                      and len(state) > 0)
        if want_delta:
            new_state, stats, applied = merge_bucket_state(
                state, winners, self.policy, self.key_cols, return_applied=True)
        else:  # snapshot layout skips materializing the applied-rows table
            new_state, stats = merge_bucket_state(
                state, winners, self.policy, self.key_cols)
            applied = None
        fp = self._fingerprint(new_state)
        state_meta = {"state_rows": len(new_state), "state_sha": fp}
        if self.retry_mode:
            # an amendment is always a FULL snapshot (even in delta layout):
            # it replaces the current commit, so reconstruction restarts here
            committed = self.commit_log.commit_state(
                bucket, ckpt if ckpt >= 0 else -1, new_state,
                meta=dict(stats, **state_meta), replace=True)
        elif want_delta:
            cur = self.commit_log.current(bucket)
            since = (cur or {}).get("deltas_since_snapshot", 0)
            if since + 1 >= self.snapshot_every:
                committed = self.commit_log.commit_state(
                    bucket, lsn_hi, new_state,
                    meta=dict(stats, deltas_since_snapshot=0, **state_meta))
            else:
                committed = self.commit_log.commit_state(
                    bucket, lsn_hi, applied, kind="delta",
                    meta=dict(stats, deltas_since_snapshot=since + 1,
                              key_cols=list(self.key_cols), **state_meta))
        else:
            committed = self.commit_log.commit_state(
                bucket, lsn_hi, new_state, meta=dict(stats, **state_meta))
        return lineage_row(
            partition_id=bucket, lsn_lo=lsn_lo, lsn_hi=lsn_hi,
            events_seen=events_seen,
            rows_applied=stats["inserted"] + stats["updated"],
            inserted=stats["inserted"], updated=stats["updated"],
            kept_existing=stats["kept_existing"], tombstones=stats["tombstones"],
            state_rows=len(new_state),
            state_sha=fp, committed=committed,
        )

    @staticmethod
    def _fingerprint(state: pa.Table) -> str:
        if len(state) == 0:
            return state_fingerprint([])
        if "content_sha" in state.column_names:
            live = state
            if DELETED_COL in state.column_names:
                live = state.filter(pa.compute.equal(state[DELETED_COL], False))
            return state_fingerprint(live["content_sha"].to_pylist())
        return state_fingerprint([])
