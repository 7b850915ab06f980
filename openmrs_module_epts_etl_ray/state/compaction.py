"""Lake compaction: tombstone GC + superseded-snapshot GC.

Reference analogue: the CONSOLIDATION / cleanup phase — after sync, the
reference clears processed stage rows and backup files
(``controller/OperationController.java:520-540``, transport ``.bkp`` moves).
Our lake keeps per-bucket snapshot history for resume; compaction

1. drops tombstone rows whose ``lsn <= watermark`` from the CURRENT snapshot
   (a tombstone older than the global low-watermark can never be contradicted
   by a late event, so it is dead weight — SURVEY §2.12 delete semantics);
2. deletes snapshot files and commit entries superseded by the current one.

The rewrite is atomic (tmp + ``os.replace`` of both the data file and the
manifest entry) and idempotent — re-running compaction is a no-op. Buckets
compact in parallel as Ray tasks (one task per bucket: bucket state is the
unit of ownership, same as the merge).
"""
from __future__ import annotations

import json
import os
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .commit_log import CommitLog

DELETED_COL = "_deleted"


def _compact_bucket(lake_root: str, bucket: int, watermark: int | None) -> dict:
    log = CommitLog(lake_root)
    commits = log.commits(bucket)
    if not commits:
        return {"bucket": bucket, "tombstones_dropped": 0, "snapshots_gced": 0}
    cur = commits[-1]
    data_dir = log._bucket_data_dir(bucket)
    log_dir = log._bucket_log_dir(bucket)

    dropped = 0
    if cur.get("kind", "snapshot") == "delta":
        # delta layout: re-materialize the reconstruction chain as ONE full
        # snapshot (amend the current commit), then the chain files GC below
        state = log.read_state(bucket)
        log.commit_state(bucket, cur["lsn_hi"], state,
                         meta={"compacted": True, "deltas_since_snapshot": 0},
                         replace=True)
        commits = log.commits(bucket)
        cur = commits[-1]
    # watermark < 0 means no bucket has committed yet — no tombstone can
    # satisfy lsn <= watermark, so skip the full-snapshot read entirely
    state = None
    if watermark is not None and watermark >= 0:
        state = pq.read_table(os.path.join(data_dir, cur["file"]))
    if state is not None and DELETED_COL in state.column_names and len(state):
        dead = pc.and_(pc.equal(state[DELETED_COL], True),
                       pc.less_equal(state["lsn"], watermark))
        dropped = int(pc.sum(pc.cast(dead, pa.int64())).as_py() or 0)
        if dropped:
            state = state.filter(pc.invert(dead))
            fd, tmp = tempfile.mkstemp(dir=data_dir, suffix=".tmp")
            os.close(fd)
            pq.write_table(state, tmp, compression="zstd")
            os.replace(tmp, os.path.join(data_dir, cur["file"]))
            entry = dict(cur, rows=len(state), compacted=True)
            fd, tmp = tempfile.mkstemp(dir=log_dir, suffix=".tmp")
            with os.fdopen(fd, "w") as fh:
                json.dump(entry, fh)
            os.replace(tmp, os.path.join(log_dir, f"commit-{cur['lsn_hi']}.json"))

    gced = 0
    # re-list commits AT GC TIME and keep everything at-or-above the
    # snapshot this pass is based on: a commit written CONCURRENTLY
    # (replay window racing the compactor) must keep both its data file
    # and its manifest entry — the stale snapshot of `commits` would
    # otherwise GC the new state file while its commit survives,
    # corrupting the bucket
    commits_now = log.commits(bucket)
    keep = {c["file"] for c in commits_now
            if c["lsn_hi"] >= cur["lsn_hi"]} | {cur["file"]}
    for f in os.listdir(data_dir):
        if f.endswith(".parquet") and f not in keep:
            os.unlink(os.path.join(data_dir, f))
            gced += 1
    for c in commits_now:
        if c["lsn_hi"] >= cur["lsn_hi"]:
            continue
        p = os.path.join(log_dir, f"commit-{c['lsn_hi']}.json")
        if os.path.exists(p):
            os.unlink(p)
    return {"bucket": bucket, "tombstones_dropped": dropped, "snapshots_gced": gced}


def compact_lake(lake_root: str, *, watermark: int | None = None,
                 parallelism: int = 16) -> pa.Table:
    """Compact every bucket; ``watermark`` defaults to the global committed
    low-watermark (the safe bound: no event at or below it can still arrive).
    Returns one stats row per bucket."""
    log = CommitLog(lake_root)
    ck = log.checkpoint()
    if watermark is None:
        watermark = log.min_committed_lsn()
    task = ray.remote(num_cpus=1)(_compact_bucket)
    out, pending = [], []
    for b in sorted(ck):
        pending.append(task.remote(lake_root, b, watermark))
        if len(pending) >= parallelism:
            done, pending = ray.wait(pending, num_returns=1)
            out.extend(ray.get(done))
    out.extend(ray.get(pending))
    return pa.Table.from_pylist(out) if out else pa.table(
        {"bucket": pa.array([], pa.int64()),
         "tombstones_dropped": pa.array([], pa.int64()),
         "snapshots_gced": pa.array([], pa.int64())})
