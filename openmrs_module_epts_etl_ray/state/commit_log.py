"""Idempotent commit log for the partitioned Parquet lake.

The reference achieves idempotency two ways: file sinks write-then-rename
(``export/processor/DBExportProcessor.java:70-75``) and DB upserts converge
under replay because insert-then-resolve-conflict is idempotent
(``model/pojo/generic/AbstractDatabaseObject.java:289-317``). Progress is
persisted per (operation, table) in ``table_operation_progress_info`` and
per-thread interval JSON files
(``engine/record_intervals_manager/ThreadRecordIntervalsManager.java:227-254``).

Our equivalent: each hash bucket owns a directory of immutable state files
plus a manifest of commits. A commit is ``commit-{lsn_hi}.json`` naming the
state file that reflects all events with ``lsn <= lsn_hi`` for this bucket.
Writes are tmp-then-``os.replace`` (atomic on POSIX); a replayed task finds
the manifest entry already present and skips — exactly-once under Ray task
retries because the merge is deterministic. On object stores without rename,
the same protocol maps to conditional PUT of the manifest key.

Layout::

    lake_root/
      data/bucket=<b>/state-<lsn_hi>.parquet      # full bucket state snapshot
      _commitlog/bucket=<b>/commit-<lsn_hi>.json  # manifest entry (atomic)

Scale note — full snapshot per commit, deliberately: a CDC window over a
zipf-skewed log touches most hot buckets anyway, reads of current state stay
one file per bucket (no delta-chain replay on the read path), and the
write amplification is bounded by bucket size — which is operator-controlled
via ``num_buckets`` (more buckets at larger scale => smaller rewrites).
Superseded snapshots are GC'd by :mod:`.compaction`. A delta-log variant
(changed rows per commit + periodic full snapshot) trades read-path
complexity for write amplification; at 10^10 events with 10k+ buckets the
full-snapshot design keeps both paths O(bucket), which is the property that
matters.
"""
from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.parquet as pq


class CommitLog:
    def __init__(self, lake_root: str):
        self.root = lake_root
        self.data_dir = os.path.join(lake_root, "data")
        self.log_dir = os.path.join(lake_root, "_commitlog")

    # -- paths ---------------------------------------------------------
    def _bucket_log_dir(self, bucket: int) -> str:
        return os.path.join(self.log_dir, f"bucket={bucket}")

    def _bucket_data_dir(self, bucket: int) -> str:
        return os.path.join(self.data_dir, f"bucket={bucket}")

    # -- read side -----------------------------------------------------
    def commits(self, bucket: int) -> list[dict]:
        d = self._bucket_log_dir(bucket)
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.startswith("commit-") and f.endswith(".json"):
                with open(os.path.join(d, f)) as fh:
                    out.append(json.load(fh))
        return sorted(out, key=lambda c: c["lsn_hi"])

    def _commit_lsns(self, bucket: int) -> list[int]:
        """Committed lsn_hi values from file NAMES alone — no JSON parse
        (committed_lsn_hi/checkpoint run per bucket per window; parsing
        every historical commit made a W-window run O(W^2) in file I/O)."""
        d = self._bucket_log_dir(bucket)
        if not os.path.isdir(d):
            return []
        out = []
        for f in os.listdir(d):
            if f.startswith("commit-") and f.endswith(".json"):
                out.append(int(f[len("commit-"):-len(".json")]))
        return sorted(out)

    def current(self, bucket: int) -> dict | None:
        lsns = self._commit_lsns(bucket)
        if not lsns:
            return None
        with open(os.path.join(self._bucket_log_dir(bucket),
                               f"commit-{lsns[-1]}.json")) as fh:
            return json.load(fh)

    def committed_lsn_hi(self, bucket: int) -> int:
        lsns = self._commit_lsns(bucket)
        return lsns[-1] if lsns else -1

    def checkpoint(self) -> dict[int, int]:
        """bucket -> highest committed LSN; the resume point (FIXTURES F6)."""
        if not os.path.isdir(self.log_dir):
            return {}
        out = {}
        for d in os.listdir(self.log_dir):
            if d.startswith("bucket="):
                b = int(d.split("=", 1)[1])
                out[b] = self.committed_lsn_hi(b)
        return out

    def num_buckets(self) -> int | None:
        path = os.path.join(self.log_dir, "bucketing.json")
        if not os.path.exists(path):
            return None
        with open(path) as fh:
            return json.load(fh)["num_buckets"]

    def min_committed_lsn(self) -> int:
        """Global read-pushdown bound: every event with lsn <= this is
        already applied in EVERY bucket. Conservative: -1 unless ALL
        pinned buckets have committed at least once — a bucket that has
        never seen a key is absent from checkpoint(), and advancing the
        watermark past it would silently drop that bucket's first events
        on a resumed replay."""
        ck = self.checkpoint()
        if not ck:
            return -1
        nb = self.num_buckets()
        if nb is not None and len(ck) < nb:
            return -1
        return min(ck.values())

    def read_state(self, bucket: int, schema: pa.Schema | None = None) -> pa.Table:
        """Current bucket state. Snapshot layout: one file read. Delta layout
        (``commit_state(kind="delta")``): reconstruct — latest full snapshot,
        then upsert each subsequent delta's rows by the commit's key_cols in
        LSN order (a delta holds exactly the rows that commit applied,
        tombstones included)."""
        cur = self.current(bucket)
        if cur is None:
            return pa.table({}) if schema is None else schema.empty_table()
        data_dir = self._bucket_data_dir(bucket)
        if cur.get("kind", "snapshot") == "snapshot":
            return pq.read_table(os.path.join(data_dir, cur["file"]))
        commits = self.commits(bucket)
        base = None
        for i in range(len(commits) - 1, -1, -1):
            if commits[i].get("kind", "snapshot") == "snapshot":
                base = i
                break
        state = (pq.read_table(os.path.join(data_dir, commits[base]["file"]))
                 if base is not None else None)
        for c in commits[(base + 1) if base is not None else 0:]:
            delta = pq.read_table(os.path.join(data_dir, c["file"]))
            if state is None or len(state) == 0:
                state = delta
                continue
            from ..stages.schema_evolution import unify_and_backfill
            state, delta = unify_and_backfill([state, delta])
            import pandas as pd
            keys = list(c["key_cols"])
            unified = state.schema
            sdf, ddf = state.to_pandas(), delta.to_pandas()
            mask = ~pd.MultiIndex.from_frame(sdf[keys]).isin(
                pd.MultiIndex.from_frame(ddf[keys]))
            out = pd.concat([sdf[mask], ddf], ignore_index=True)
            # force the unified Arrow schema: the pandas round trip NaN-
            # promotes null-backfilled int/bool columns to float64/object,
            # which would make delta-layout state drift from snapshot
            # layout (from_pandas with an explicit schema nulls the NaNs)
            state = pa.Table.from_pandas(out, schema=unified,
                                         preserve_index=False)
        return state if state is not None else (
            pa.table({}) if schema is None else schema.empty_table())

    def ensure_bucketing(self, num_buckets: int,
                         bucket_cols: tuple | list | None = None) -> int:
        """Pin the lake's bucket count (and, when given, the bucketing
        COLUMNS) on first use and return the effective count. Keys are
        routed by ``hash % num_buckets``; replaying an existing lake under
        a DIFFERENT count would split a key's history across old and new
        buckets and read_lake would emit stale duplicates — so the stored
        value always wins. A mismatched bucketing COLUMN set (e.g. a
        quick_merge keyed on a unique key against a lake replay() bucketed
        by PK) raises: probe and state would silently never co-locate and
        every upsert would insert a twin. Rebucketing is an offline rewrite
        (read_lake -> replay into a fresh lake)."""
        path = os.path.join(self.log_dir, "bucketing.json")

        def _validate(pin: dict) -> int:
            stored_cols = pin.get("bucket_cols")
            if (bucket_cols is not None and stored_cols is not None
                    and list(bucket_cols) != list(stored_cols)):
                raise ValueError(
                    f"lake {self.root!r} is bucketed by "
                    f"{stored_cols}; routing by {list(bucket_cols)} would "
                    f"never co-locate probes with state — use a separate "
                    f"lake or rebucket offline")
            if stored_cols is None and bucket_cols is not None:
                # legacy pin (written before bucket_cols existed): backfill
                # so the NEXT differently-keyed caller hits the guard
                # instead of silently creating never-co-located twins.
                # tmp + os.replace: a concurrent backfill of the same cols
                # is idempotent, and num_buckets never changes here.
                fd2, tmp2 = tempfile.mkstemp(dir=self.log_dir,
                                             suffix=".tmp")
                with os.fdopen(fd2, "w") as fh2:
                    json.dump({"num_buckets": int(pin["num_buckets"]),
                               "bucket_cols": list(bucket_cols)}, fh2)
                os.replace(tmp2, path)
            return int(pin["num_buckets"])

        if os.path.exists(path):
            with open(path) as fh:
                return _validate(json.load(fh))
        os.makedirs(self.log_dir, exist_ok=True)
        # write the FULL content to a tmp file first, then publish with an
        # exclusive hard link: exactly one concurrent first-replay wins the
        # pin (like O_EXCL), and a crash can never leave a truncated
        # bucketing.json whose mere existence would brick every later run
        fd, tmp = tempfile.mkstemp(dir=self.log_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump({"num_buckets": int(num_buckets),
                       "bucket_cols": (list(bucket_cols)
                                       if bucket_cols is not None
                                       else None)}, fh)
        try:
            os.link(tmp, path)
        except FileExistsError:
            # the race loser must run the SAME column-set validation as the
            # fast path — returning the stored count unchecked would let a
            # differently-keyed merge proceed into the duplicate-twin hazard
            with open(path) as fh:
                return _validate(json.load(fh))
        finally:
            os.unlink(tmp)
        return int(num_buckets)

    # -- write side ----------------------------------------------------
    def commit_state(self, bucket: int, lsn_hi: int, state: pa.Table, meta: dict | None = None,
                     replace: bool = False, kind: str = "snapshot") -> bool:
        """Atomically persist a bucket snapshot. Returns False if this
        (bucket, lsn_hi) was already committed (idempotent replay).

        ``replace=True`` re-points an EXISTING commit at a new snapshot
        (atomic json swap) without moving the watermark — the dead-letter
        retry path applies repaired rows whose original LSNs sit below the
        bucket watermark, so their merge must amend the current snapshot
        in place rather than claim a new LSN range (which would mark
        not-yet-replayed log positions as applied)."""
        log_dir = self._bucket_log_dir(bucket)
        data_dir = self._bucket_data_dir(bucket)
        os.makedirs(log_dir, exist_ok=True)
        os.makedirs(data_dir, exist_ok=True)
        commit_path = os.path.join(log_dir, f"commit-{lsn_hi}.json")
        if os.path.exists(commit_path) and not replace:
            return False
        prefix = "delta" if kind == "delta" else "state"
        fname = f"{prefix}-{lsn_hi}.parquet"
        if replace:
            # distinct snapshot name per amendment: the superseded file
            # stays until compaction GC (readers holding the old manifest
            # never see a half-written file)
            rev = 1
            while os.path.exists(os.path.join(data_dir, fname)):
                fname = f"{prefix}-{lsn_hi}-r{rev}.parquet"
                rev += 1
        fd, tmp = tempfile.mkstemp(dir=data_dir, suffix=".tmp")
        os.close(fd)
        try:
            pq.write_table(state, tmp, compression="zstd")
            os.replace(tmp, os.path.join(data_dir, fname))
        finally:
            if os.path.exists(tmp):
                os.unlink(tmp)
        entry = {"bucket": bucket, "lsn_hi": lsn_hi, "file": fname, "rows": len(state),
                 "kind": kind}
        if meta:
            entry.update(meta)
        fd, tmp = tempfile.mkstemp(dir=log_dir, suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump(entry, fh)
        os.replace(tmp, commit_path)
        return True
