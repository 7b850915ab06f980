"""Push-based hash exchange: collapsed winners stream to bucket-owning actors.

Why not ``groupby(_bucket).map_groups``? Ray Data's sort-based shuffle is an
all-to-all BARRIER: every collapsed block must materialize, get sampled,
split M×N ways and re-merged before the first merge can start. Profiling at
32M events showed the sort costing more wall time than every compute stage
combined, and its driver-side overhead does not shrink with more CPUs.

This module implements the same exchange as a *streaming push*: each map task
(the :class:`~.lww.PartialLww` output, fused into the same task) splits its
block by owning actor and pushes the slices via actor calls. Actors own a
static range of hash buckets (``bucket % num_actors``), fold incoming slices
into a bounded per-bucket buffer (re-collapsing with the exact LWW kernel
whenever the buffer exceeds a threshold — so actor memory is bounded by the
bucket's DISTINCT keys, not its event count), and on ``flush()`` run the
normal :class:`~.merge_applier.MergeApplier` merge-and-commit per bucket.

Scale notes / partitioning assumptions (SURVEY.md §7.3-7.4):
- merge work overlaps the scan instead of waiting behind a shuffle barrier;
- exchange volume = collapsed winners only (the partial combine is the
  salting/combiner pass);
- exactly-once is unchanged — the per-bucket CommitLog watermark makes
  replays and task retries idempotent;
- fault model: a lost actor loses only its in-flight window buffer; the run
  fails and a re-run converges to the identical committed state (same
  recovery contract as the reference's restart-from-progress-table,
  ``engine/record_intervals_manager/ThreadRecordIntervalsManager.java:315-354``).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from ..functions.hashing import BUCKET_COL
from .lww import _lww_with_counts
from .merge_applier import ConflictPolicy, MergeApplier

# re-collapse a bucket's buffer once it exceeds this many rows
COMBINE_THRESHOLD = 131_072


@ray.remote
class MergeActor:
    """Owns ``buckets ≡ actor_id (mod num_actors)``; ingests collapsed rows,
    keeps a bounded LWW buffer per bucket, merges + commits on flush."""

    def __init__(self, lake_root: str, policy: ConflictPolicy | None,
                 key_cols: tuple[str, ...], hash_content: bool = True,
                 combine_threshold: int = COMBINE_THRESHOLD,
                 layout: str = "snapshot"):
        self.applier = MergeApplier(lake_root, policy=policy, key_cols=key_cols,
                                    hash_content=hash_content, layout=layout)
        self.key_cols = tuple(key_cols)
        self.combine_threshold = combine_threshold
        self.parts: dict[int, list[pa.Table]] = {}
        self.part_rows: dict[int, int] = {}
        self.seen_slices: set = set()

    def ingest(self, table: pa.Table, slice_fp: str | None = None) -> int:
        """Fold one routed slice (rows of several owned buckets) into the
        per-bucket buffers. Returns rows accepted (the caller's ack doubles
        as backpressure).

        ``slice_fp`` is the router's content fingerprint of this slice: a
        map task that fails AFTER some ingest calls succeeded is re-executed
        by Ray and re-sends identical slices — the final state is unaffected
        (max-LSN is idempotent) but lineage ``events_seen`` would double
        count, so replayed slices are dropped here. The fp is registered
        only AFTER buffering succeeds: registering first would make a
        transient ingest failure permanently swallow the retried slice."""
        if slice_fp is not None and slice_fp in self.seen_slices:
            return 0
        if len(table) == 0:
            if slice_fp is not None:
                self.seen_slices.add(slice_fp)
            return 0
        b = table[BUCKET_COL].to_numpy()
        order = np.argsort(b, kind="stable")
        tbl = table.take(pa.array(order))
        bs = b[order]
        bounds = np.flatnonzero(np.r_[True, bs[1:] != bs[:-1]])
        bounds = np.r_[bounds, len(bs)]
        # STAGE the whole slice before touching actor state: a failure
        # mid-loop (e.g. the re-collapse concat) would otherwise leave some
        # buckets holding the slice's rows while the fingerprint stays
        # unregistered — Ray's retried map task then re-sends the slice and
        # those buckets double-count. The staged dicts publish with plain
        # dict updates, which cannot raise.
        staged_parts: dict[int, list] = {}
        staged_rows: dict[int, int] = {}
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            bucket = int(bs[lo])
            cur = staged_parts.get(bucket)
            if cur is None:
                cur = list(self.parts.get(bucket, []))
            cur.append(tbl.slice(lo, hi - lo))
            n = staged_rows.get(bucket,
                                self.part_rows.get(bucket, 0)) + (hi - lo)
            if n > self.combine_threshold:
                merged = _lww_with_counts(
                    pa.concat_tables(cur, promote_options="default"),
                    self.key_cols, "lsn")
                cur = [merged]
                n = len(merged)
            staged_parts[bucket] = cur
            staged_rows[bucket] = n
        self.parts.update(staged_parts)
        self.part_rows.update(staged_rows)
        if slice_fp is not None:
            self.seen_slices.add(slice_fp)
        return len(table)

    def flush(self) -> pa.Table:
        """Merge-and-commit every owned bucket; returns its lineage rows."""
        out = []
        for bucket in sorted(self.parts):
            group = pa.concat_tables(self.parts[bucket], promote_options="default")
            out.append(self.applier(group))
        self.parts.clear()
        self.part_rows.clear()
        if not out:
            from ..state.lineage import LINEAGE_SCHEMA
            return LINEAGE_SCHEMA.empty_table()
        return pa.concat_tables(out, promote_options="default")


class BucketRouter:
    """``map_batches`` callable: splits each collapsed block by owning actor
    and pushes the slices; the ``ray.get`` on the acks is the backpressure
    (a map task cannot run ahead of the merge actors)."""

    def __init__(self, actors: list, num_actors: int,
                 key_cols: tuple[str, ...] = ("repo", "path"),
                 ack_window: int | None = None):
        self.actors = actors
        self.num_actors = num_actors
        self.key_cols = tuple(key_cols)
        # bounded in-flight ack window: while slices fire, only `ack_window`
        # acks stay outstanding (progressive drain overlaps routing of later
        # slices with ingest of earlier ones). The FINAL drain before the
        # call returns is deliberate and must stay: a map task that
        # completes before its acks land would let an ingest failure go
        # unobserved — the ack-before-complete barrier is what makes Ray's
        # task retry + the actors' slice-fp dedup an exactly-once channel.
        # See SCALE.md §push-exchange for why this does not serialize the
        # pipeline when in-flight blocks >> actors.
        self.ack_window = (2 * num_actors if ack_window is None
                           else int(ack_window))

    def __call__(self, batch: pa.Table) -> pa.Table:
        import hashlib

        from ..functions.hashing import key_hash

        if len(batch) == 0:
            return pa.table({"rows_routed": pa.array([], pa.int64())})
        owner = (batch[BUCKET_COL].to_numpy() % self.num_actors).astype(np.int64)
        order = np.argsort(owner, kind="stable")
        tbl = batch.take(pa.array(order))
        oo = owner[order]
        bounds = np.flatnonzero(np.r_[True, oo[1:] != oo[:-1]])
        bounds = np.r_[bounds, len(oo)]
        lsn = tbl["lsn"].to_numpy() if "lsn" in tbl.column_names else None
        # the slice fingerprint must distinguish every legitimately distinct
        # slice: per-row key SipHash (same-transaction rows share an LSN
        # across many keys), op rank (non-identical same-(key,lsn) pairs),
        # _n_events, and the slice's raw content BYTES (at-least-once
        # duplicate blocks; hashing only content length let equal-length
        # divergent content dedup as a retry). Content bytes are folded in
        # straight from the Arrow offsets+data buffers per slice — a
        # per-row Python-object hash here halved the 128M-event stress
        # throughput (measured 15.2 -> 7.0M ev/s)
        kh = key_hash(tbl, self.key_cols) if all(
            c in tbl.column_names for c in self.key_cols) else None

        from .lww import N_EVENTS_COL, _op_rank
        rank = _op_rank(tbl)
        nev = (tbl[N_EVENTS_COL].to_numpy()
               if N_EVENTS_COL in tbl.column_names else None)
        has_content = "content" in tbl.column_names
        refs = []
        for i in range(len(bounds) - 1):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            sl = tbl.slice(lo, hi - lo)
            if lsn is not None:
                h = hashlib.blake2b(lsn[lo:hi].tobytes(), digest_size=16)
                for arr in (kh, rank, nev):
                    if arr is not None:
                        h.update(arr[lo:hi].tobytes())
                if has_content:
                    col = sl["content"].combine_chunks()
                    bufs = col.buffers()
                    if bufs[1] is not None and bufs[2] is not None:
                        odt = (np.int64 if pa.types.is_large_string(col.type)
                               else np.int32)
                        off = np.frombuffer(
                            bufs[1], dtype=odt,
                            count=len(col) + 1 + col.offset)[col.offset:]
                        h.update(off.tobytes())
                        h.update(memoryview(bufs[2])[int(off[0]):int(off[-1])])
                fp = h.hexdigest()
            else:
                fp = None
            refs.append(self.actors[int(oo[lo])].ingest.remote(sl, fp))
            if len(refs) > self.ack_window:
                ready, refs = ray.wait(refs, num_returns=1)
                ray.get(ready)
        ray.get(refs)  # final barrier — see __init__ note
        return pa.table({"rows_routed": pa.array([len(batch)], pa.int64())})


def push_exchange_merge(
    collapsed,
    lake_root: str,
    *,
    policy: ConflictPolicy | None = None,
    key_cols: tuple[str, ...] = ("repo", "path"),
    num_actors: int = 8,
    actor_num_cpus: float = 1.0,
    hash_content: bool = True,
    layout: str = "snapshot",
) -> pa.Table:
    """Drive the push exchange over a collapsed (bucketized) Dataset; returns
    the lineage table. Eager: consumes the Dataset, then flushes the actors."""
    actors = [
        MergeActor.options(num_cpus=actor_num_cpus, max_restarts=0).remote(
            lake_root, policy, key_cols, hash_content, COMBINE_THRESHOLD, layout)
        for _ in range(num_actors)
    ]
    try:
        routed = collapsed.map_batches(
            BucketRouter(actors, num_actors, key_cols=key_cols),
            batch_format="pyarrow",
            zero_copy_batch=True,
        )
        # consume the stream (acks are one tiny row per block)
        routed.sum("rows_routed")
        lineage_parts = ray.get([a.flush.remote() for a in actors])
    finally:
        for a in actors:
            ray.kill(a, no_restart=True)
    parts = [t for t in lineage_parts if len(t) > 0]
    if not parts:
        from ..state.lineage import LINEAGE_SCHEMA
        return LINEAGE_SCHEMA.empty_table()
    return pa.concat_tables(parts, promote_options="default")
