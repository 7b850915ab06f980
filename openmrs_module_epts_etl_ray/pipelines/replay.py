"""End-to-end CDC replay pipeline (SURVEY.md §7.1) — the flagship.

    events --map_batches(PartialLww)--> collapsed rows + _bucket   # stateless, Arrow, combiner
           --groupby(_bucket).map_groups(MergeApplier, concurrency=N)  # SHUFFLE + actor pool
           --> lineage Dataset (one row per bucket)                # tiny; safe to materialize

Scale notes: the per-batch partial LWW collapses each upstream block to at
most one row per key BEFORE the shuffle, so the all-to-all exchange moves
only the per-block winners (the same effect as salting hot keys into
sub-partitions and reducing twice — the salt is the block id). The merge
stage reads/writes only its own bucket's state (bounded by partition size,
never the whole table), and the CommitLog makes task retries exactly-once.
Reference lifecycle analogue: ``engine/Engine.java:225-336`` +
``etl/processor/EtlProcessor.java:52-109``.
"""
from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import BUCKET_COL
from ..state.commit_log import CommitLog
from ..stages.lww import PartialLww
from ..stages.merge_applier import DELETED_COL, ConflictPolicy, MergeApplier


def replay(
    events: rd.Dataset,
    lake_root: str,
    *,
    num_buckets: int = 64,
    policy: ConflictPolicy | None = None,
    key_cols: tuple[str, ...] = ("repo", "path"),
    lsn_range: tuple[int, int] | None = None,
    concurrency: int | tuple[int, int] | None = None,
    batch_size: int | None = None,
    engine: str = "push",
    dead_letter_dir: str | None = None,
    layout: str = "snapshot",
) -> rd.Dataset:
    """Replay a change-event Dataset into the lake; returns the lineage Dataset.

    ``lsn_range=(lo, hi]`` bounds the window (micro-batch replay). The global
    committed low-watermark additionally prunes events at the read — the
    per-bucket exact watermark is enforced inside MergeApplier.

    ``engine='push'`` (default) streams collapsed winners straight to
    bucket-owning MergeActors — no shuffle barrier, merge overlaps the scan;
    ``engine='sort'`` uses the Dataset-native ``groupby().map_groups``
    exchange (identical committed state, kept for comparison and as the
    path a multi-node sort-shuffle deployment would take).
    """
    log = CommitLog(lake_root)
    # the lake's bucketing is pinned at creation; a mismatched num_buckets
    # arg is overridden by the stored value, and a mismatched bucketing
    # COLUMN set raises (see CommitLog.ensure_bucketing)
    num_buckets = log.ensure_bucketing(num_buckets, bucket_cols=key_cols)
    ckpt_lo = log.min_committed_lsn()
    lo = max(ckpt_lo, lsn_range[0]) if lsn_range else ckpt_lo
    hi = lsn_range[1] if lsn_range else None

    # validation sees only rows THIS window could touch, plus rows whose
    # LSN is null (a windowed predicate would silently drop those — they
    # must divert to the dead-letter channel). Restricting validation to
    # the window matters for the dead-letter LIFECYCLE: a malformed row
    # below the committed watermark would otherwise be re-dead-lettered on
    # every subsequent replay, resurrecting errors a prior
    # retry_dead_letters pass already consumed and resetting retry counts.
    if dead_letter_dir is not None:
        from ..stages.validate import Validator

        if lo >= 0 or hi is not None:
            def pre_window(batch: pa.Table) -> pa.Table:
                mask = pc.greater(batch["lsn"], lo)
                if hi is not None:
                    mask = pc.and_(mask, pc.less_equal(batch["lsn"], hi))
                mask = pc.or_(pc.fill_null(mask, False),
                              pc.is_null(batch["lsn"]))
                return batch.filter(mask)
            events = events.map_batches(pre_window, batch_format="pyarrow")
        events = events.map_batches(
            Validator(dead_letter_dir, key_cols=key_cols),
            batch_format="pyarrow", zero_copy_batch=True)

    if lo >= 0 or hi is not None:
        def window(batch: pa.Table) -> pa.Table:
            mask = pc.greater(batch["lsn"], lo)
            if hi is not None:
                mask = pc.and_(mask, pc.less_equal(batch["lsn"], hi))
            return batch.filter(mask)
        events = events.map_batches(window, batch_format="pyarrow")

    collapsed = events.map_batches(
        PartialLww(key_cols=key_cols, num_buckets=num_buckets),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
    )

    if engine == "push":
        import ray

        from ..stages.push_exchange import push_exchange_merge

        if isinstance(concurrency, tuple):
            pool = concurrency[1]
        elif concurrency:
            pool = int(concurrency)
        else:
            pool = int(ray.cluster_resources().get("CPU", 8))
        # merge actors get ~1/4 of the pool at a FULL CPU each so total
        # process demand never exceeds the pool (an 0.5-CPU fudge convoys
        # the ingest acks when num_cpus == physical cores)
        lineage_table = push_exchange_merge(
            collapsed, lake_root, policy=policy, key_cols=key_cols,
            num_actors=max(1, pool // 4), layout=layout,
        )
        return rd.from_arrow(lineage_table)

    lineage = collapsed.groupby(BUCKET_COL).map_groups(
        MergeApplier,
        fn_constructor_kwargs=dict(lake_root=lake_root, policy=policy,
                                   key_cols=key_cols, layout=layout),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )
    return lineage


def quick_merge(
    src: rd.Dataset,
    lake_root: str,
    *,
    key_cols: tuple[str, ...],
    unique_keys: list[list[str]],
    num_buckets: int = 64,
    policy: ConflictPolicy | None = None,
    concurrency: int | tuple[int, int] | None = None,
    engine: str = "sort",
) -> rd.Dataset:
    """Quick-merge sync: upsert rows whose PK space differs from the
    destination's, matching existing records by alternate unique key(s) and
    adopting the matched row's PK (reference quick-merge operation —
    ``dbquickmerge/controller/DBQuickMergeController.java`` shape configured
    by ``db_quick_merge_gaza.json``; per-record contract
    ``model/EtlDatabaseObject.java:619-633``).

    Partitioning: buckets hash the FIRST unique-key group (not the PK) so an
    incoming row co-locates with the state row it may adopt; every configured
    unique-key group must be resolvable within that partitioning (groups over
    other columns would need a central probe, which the reference gets for
    free from its destination database). Two assumptions this implies —
    both now ENFORCED or documented: (a) the lake's bucketing column set is
    pinned (``CommitLog.ensure_bucketing`` raises if a quick_merge routes by
    a different column set than the lake was created with — probe and state
    would never co-locate); (b) a PK whose unique-key VALUE differs between
    two rows of one run is two different match identities by definition of
    the operation — rows mutating their own uk mid-batch must be collapsed
    upstream first. Returns the lineage Dataset.
    """
    if not unique_keys:
        raise ValueError("quick_merge needs at least one unique-key group")
    import dataclasses
    # COPY the policy: assigning unique_keys into the caller's object would
    # silently enable uk-fallback probes in later replay() calls that reuse
    # it under PK-hash bucketing, where same-uk rows do not co-locate
    pol = dataclasses.replace(policy) if policy is not None \
        else ConflictPolicy()
    pol.unique_keys = [list(g) for g in unique_keys]
    log = CommitLog(lake_root)
    num_buckets = log.ensure_bucketing(num_buckets,
                                       bucket_cols=unique_keys[0])
    collapsed = src.map_batches(
        PartialLww(key_cols=key_cols, num_buckets=num_buckets,
                   bucket_cols=tuple(unique_keys[0])),
        batch_format="pyarrow", zero_copy_batch=True)
    if engine == "push":
        import ray

        from ..stages.push_exchange import push_exchange_merge

        pool = (concurrency[1] if isinstance(concurrency, tuple)
                else int(concurrency) if concurrency
                else int(ray.cluster_resources().get("CPU", 8)))
        lineage_table = push_exchange_merge(
            collapsed, lake_root, policy=pol, key_cols=key_cols,
            num_actors=max(1, pool // 4))
        return rd.from_arrow(lineage_table)
    return collapsed.groupby(BUCKET_COL).map_groups(
        MergeApplier,
        fn_constructor_kwargs=dict(lake_root=lake_root, policy=pol,
                                   key_cols=key_cols),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    )


def retry_dead_letters(
    lake_root: str,
    dead_letter_dir: str,
    *,
    key_cols: tuple[str, ...] = ("repo", "path"),
    num_buckets: int = 64,
    policy: ConflictPolicy | None = None,
    repair=None,
    max_retries: int = 3,
    concurrency: int | tuple[int, int] | None = None,
) -> dict:
    """Re-process dead-lettered rows into the lake — the reference's
    skipped-record retry pass (``engine/Engine.java:367-406``:
    re-run the task over the skipped set, then delete the skipped records).

    Flow: read the error files → bump ``_retry_count`` → rows over
    ``max_retries`` are parked terminally under ``<dir>/parked/`` → the rest
    optionally pass a ``repair`` batch hook (Arrow table -> Arrow table;
    the reference re-reads from a by-then-corrected source, a log-structured
    engine must repair in flight) → re-validate (still-bad rows land back in
    the dead-letter dir with their incremented count) → merge with ORIGINAL
    LSNs under the per-key LWW guard, amending bucket snapshots without
    moving watermarks (MergeApplier retry_mode). Consumed error files are
    deleted afterwards. Returns a summary dict; idempotent under re-runs.
    """
    import glob
    import hashlib as _hashlib

    import numpy as np
    import pyarrow.parquet as pq

    from ..functions.hashing import BUCKET_COL as _B
    from ..stages.validate import REASON_COL, RETRY_COL, Validator

    files = sorted(glob.glob(os.path.join(dead_letter_dir, "errors-*.parquet")))
    if not files:
        return {"candidates": 0, "parked": 0, "rows_applied": 0, "requeued": 0}
    log = CommitLog(lake_root)
    num_buckets = log.ensure_bucketing(num_buckets)

    ds = rd.read_parquet(files)

    def prep(t: pa.Table) -> pa.Table:
        if REASON_COL in t.column_names:
            t = t.drop_columns([REASON_COL])
        if RETRY_COL in t.column_names:
            rc = pc.add(pc.fill_null(t[RETRY_COL], 0), 1)
            t = t.drop_columns([RETRY_COL])
        else:
            rc = pa.array(np.ones(len(t), dtype=np.int64))
        return t.append_column(RETRY_COL, pc.cast(rc, pa.int64()))

    ds = ds.map_batches(prep, batch_format="pyarrow").materialize()
    candidates = ds.count()

    parked_parts = [b for b in ds.map_batches(
        lambda t: t.filter(pc.greater(t[RETRY_COL], max_retries)),
        batch_format="pyarrow").iter_batches(batch_format="pyarrow")]
    parked_tbl = (pa.concat_tables(parked_parts, promote_options="default")
                  if parked_parts else pa.table({}))
    n_parked = len(parked_tbl)
    if n_parked:
        park_dir = os.path.join(dead_letter_dir, "parked")
        os.makedirs(park_dir, exist_ok=True)
        h = _hashlib.sha256()
        # hash over ROW-SORTED content: Ray block iteration order is not
        # stable across runs, so an order-sensitive hash would give the
        # same parked rows a different name on a crashed-then-re-run pass
        # (double-parking); sorting makes the name a pure function of the
        # row multiset
        pdf = parked_tbl.to_pandas()
        pdf = pdf.reindex(sorted(pdf.columns), axis=1)
        pdf = pdf.sort_values(list(pdf.columns), na_position="last") \
                 .reset_index(drop=True)
        for col in pdf.columns:
            h.update(repr(pdf[col].tolist()).encode())
        # deterministic name => re-running the retry re-parks idempotently
        path = os.path.join(park_dir, f"parked-{h.hexdigest()[:16]}.parquet")
        tmp = path + ".tmp"
        pq.write_table(parked_tbl, tmp)
        os.replace(tmp, path)

    retry = ds.map_batches(
        lambda t: t.filter(pc.less_equal(t[RETRY_COL], max_retries)),
        batch_format="pyarrow")
    if repair is not None:
        retry = retry.map_batches(repair, batch_format="pyarrow")
    # re-validate: rows that are still malformed go back to the dead-letter
    # dir carrying their incremented retry count
    retry = retry.map_batches(
        Validator(dead_letter_dir, key_cols=key_cols),
        batch_format="pyarrow")
    retry = retry.map_batches(
        lambda t: t.drop_columns([RETRY_COL]) if RETRY_COL in t.column_names else t,
        batch_format="pyarrow")

    collapsed = retry.map_batches(
        PartialLww(key_cols=key_cols, num_buckets=num_buckets),
        batch_format="pyarrow", zero_copy_batch=True)
    lineage = collapsed.groupby(_B).map_groups(
        MergeApplier,
        fn_constructor_kwargs=dict(lake_root=lake_root, policy=policy,
                                   key_cols=key_cols, retry_mode=True),
        batch_format="pyarrow",
        concurrency=concurrency or (1, 8),
    ).materialize()
    applied = int(sum(r["rows_applied"] for r in lineage.take_all()))
    # audit trail for the retry pass (reference: operation-history stage
    # tables record reprocessing runs too); run id derives from the consumed
    # file set so a re-run overwrites its own record idempotently
    run_id = "retry-" + _hashlib.sha256(
        "\n".join(os.path.basename(f) for f in files).encode()).hexdigest()[:12]
    import shutil
    shutil.rmtree(os.path.join(lake_root, "_lineage", f"run={run_id}"),
                  ignore_errors=True)  # same file set re-run replaces its record
    write_lineage(lineage, lake_root, run_id)

    requeued = len([f for f in glob.glob(
        os.path.join(dead_letter_dir, "errors-*.parquet")) if f not in files])
    # reference: deleteAllSkippedRecord after a successful reprocess pass
    for f in files:
        if os.path.exists(f):
            os.unlink(f)
    return {"candidates": candidates, "parked": n_parked,
            "rows_applied": applied, "requeued": requeued}


def read_lake(lake_root: str, include_deleted: bool = False) -> rd.Dataset:
    """Read the lake's current committed state. Snapshot layout: one parquet
    file per bucket straight into ``read_parquet``. Delta layout: one
    reconstruction task per bucket (CommitLog.read_state) — still parallel,
    still bounded by bucket size."""
    log = CommitLog(lake_root)
    files, delta_buckets = [], []
    for bucket in sorted(log.checkpoint()):
        cur = log.current(bucket)
        if cur is None:
            continue
        if cur.get("kind", "snapshot") == "snapshot":
            files.append(os.path.join(log.data_dir, f"bucket={bucket}", cur["file"]))
        else:
            delta_buckets.append(bucket)
    if not files and not delta_buckets:
        return rd.from_arrow(pa.table({}))
    if delta_buckets:
        import ray

        @ray.remote(num_cpus=1)
        def recon(b: int) -> pa.Table:
            return CommitLog(lake_root).read_state(b)

        parts = rd.from_arrow_refs([recon.remote(b) for b in delta_buckets])
        ds = parts if not files else rd.read_parquet(files).union(parts)
    else:
        ds = rd.read_parquet(files)

    def clean(t: pa.Table) -> pa.Table:
        # drop the hive-inferred `bucket` dir column; filter tombstones
        if "bucket" in t.column_names:
            t = t.drop_columns(["bucket"])
        if not include_deleted and DELETED_COL in t.column_names:
            t = t.filter(pc.equal(t[DELETED_COL], False)).drop_columns([DELETED_COL])
        return t

    return ds.map_batches(clean, batch_format="pyarrow")


def lookup_keys(
    lake_root: str,
    keys: list[tuple],
    key_cols: tuple[str, ...] = ("repo", "path"),
    *,
    include_deleted: bool = False,
) -> pa.Table:
    """Point lookups on the lake WITHOUT a scan: each requested key is
    routed to its hash bucket by the same rule the writer used
    (``key_hash % num_buckets``, read from the lake's bucketing meta), so
    only the probed buckets' committed state is read — O(sum of probed
    bucket sizes), independent of lake size. Size ``num_buckets`` at
    write time so a single bucket stays lookup-sized at your scale.

    Returns the matching rows as one Arrow table (point lookups are
    driver-scale by contract); tombstoned keys are omitted unless
    ``include_deleted``. Reference parity: the per-record existence /
    fetch probes the reference issues against the destination DB before
    merging (SURVEY §2.5 unique-key probes) — here they become bucket
    file reads instead of indexed SQL.
    """
    import numpy as np

    from ..functions.hashing import KEY_SEP, _joined_keys, key_hash

    def joined(t: pa.Table) -> pa.Array:
        if len(key_cols) == 1:
            j = pc.cast(t[key_cols[0]], pa.string())
        else:
            j = pc.binary_join_element_wise(
                *[pc.cast(t[c], pa.string()) for c in key_cols],
                pa.scalar(KEY_SEP, type=pa.string()))
        return j.combine_chunks() if isinstance(j, pa.ChunkedArray) else j

    log = CommitLog(lake_root)
    nb = log.num_buckets()
    if nb is None:
        raise ValueError(f"{lake_root} has no bucketing meta (empty lake?)")
    probe = pa.table({c: pa.array([k[i] for k in keys])
                      for i, c in enumerate(key_cols)})
    buckets = (key_hash(probe, key_cols) % np.uint64(nb)).astype(np.int64)
    want = _joined_keys(probe, key_cols)

    out, schema = [], None
    for b in np.unique(buckets):
        state = log.read_state(int(b))
        if state.schema is not None and len(state.schema):
            schema = state.schema
        if len(state) == 0:
            continue
        wb = pa.array(sorted({str(w) for w in want[buckets == b]}),
                      type=pa.string())
        hit = state.filter(pc.is_in(joined(state), value_set=wb))
        if not include_deleted and DELETED_COL in hit.column_names:
            hit = hit.filter(pc.equal(hit[DELETED_COL], False)) \
                .drop_columns([DELETED_COL])
        if len(hit):
            out.append(hit)
    if not out:
        if schema is not None and not include_deleted \
                and DELETED_COL in schema.names:
            schema = pa.schema([f for f in schema if f.name != DELETED_COL])
        return schema.empty_table() if schema is not None else pa.table({})
    return pa.concat_tables(out)


def write_lineage(lineage: rd.Dataset, lake_root: str, run_id: str) -> None:
    """Persist the run's lineage rows under the lake (audit trail; reference:
    operation-history stage tables, ``common/model/SyncImportInfoDAO.java``)."""
    lineage.write_parquet(os.path.join(lake_root, "_lineage", f"run={run_id}"))


def replay_until_caught_up(
    events: rd.Dataset,
    lake_root: str,
    *,
    window_size: int,
    num_buckets: int = 64,
    policy: ConflictPolicy | None = None,
    key_cols: tuple[str, ...] = ("repo", "path"),
    engine: str = "push",
) -> list[rd.Dataset]:
    """Tail the log in LSN windows from the committed low-watermark to the
    log head — the micro-batch driver loop (reference: the re-runnable
    detection windows, ``ProcessController.reRunConditionsAreSatisfied:562-586``).

    Each window is one exactly-once :func:`replay`; a crash between windows
    resumes from the commit-log watermark on the next call. Returns the
    per-window lineage Datasets.
    """
    head = events.max("lsn")
    if head is None:
        return []
    # NOTE: the per-bucket low-watermark is a LOWER bound only (min over
    # buckets of each bucket's own applied max) — it prunes re-reads but
    # cannot drive the window cursor, because buckets that never see the
    # head LSN keep the min below it forever. The cursor advances by
    # explicit windows from a persisted head marker; the per-bucket
    # watermarks inside replay() make any overlap idempotent.
    import json
    import tempfile

    marker = os.path.join(lake_root, "_commitlog", "head.json")
    lo = CommitLog(lake_root).min_committed_lsn()
    if os.path.exists(marker):
        with open(marker) as fh:
            lo = max(lo, json.load(fh)["lsn"])
    out = []
    while lo < head:
        hi = min(lo + window_size, head)
        out.append(replay(events, lake_root, num_buckets=num_buckets,
                          policy=policy, key_cols=key_cols,
                          lsn_range=(lo, hi), engine=engine).materialize())
        lo = hi
        os.makedirs(os.path.dirname(marker), exist_ok=True)
        fd, tmp = tempfile.mkstemp(dir=os.path.dirname(marker), suffix=".tmp")
        with os.fdopen(fd, "w") as fh:
            json.dump({"lsn": lo}, fh)
        os.replace(tmp, marker)
    return out
