"""File-export sinks (reference S5/S6 — EXPORT / QUICK_EXPORT, dstType csv|dump).

``export/processor/DBExportProcessor.java:33-117`` writes each batch to
``<table>_<minId>_<maxId>.json`` with write-tmp-then-rename;
``etl/model/EtlLoadHelper.java:419-452`` writes CSV with header. Ray-native:
``Dataset.write_json`` / ``write_csv`` — one file per block, atomic rename
handled by the datasource layer; partitioned output directories make the
export resumable per shard (a re-run skips/overwrites whole shards, never
appends partially).

``export_files`` returns a manifest table (file, rows, bytes) — the analogue
of the reference marking exported batches in the stage table.

Dump-sink exactly-once: a failed task attempt may have written files before
dying, and Ray can re-run the batch on a STILL-ALIVE actor whose instance
counters persist — so per-attempt names cannot be made deterministic.
Instead the dataset's OUTPUT is the authority (only successful attempts
contribute blocks): :func:`export_dump` sweeps any on-disk .sql file not
named in the returned manifest.
"""
from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd
from ray.data.datasource import FilenameProvider


class _GzJsonFilenames(FilenameProvider):
    """FilenameProvider stamping ``.json.gz`` so ``read_export`` can
    extension-filter compressed shards (Ray's default would name them
    ``.json`` and the reader would inflate-fail)."""

    def get_filename_for_block(self, block, write_uuid, task_index,
                               block_index):
        return f"{write_uuid}_{task_index:06d}_{block_index:06d}.json.gz"

    def get_filename_for_row(self, row, write_uuid, task_index, block_index,
                             row_index):
        return (f"{write_uuid}_{task_index:06d}_{block_index:06d}"
                f"_{row_index:06d}.json.gz")


def _marker_path(out_dir: str) -> str:
    # sibling file, NOT inside the dir: Ray's readers parse every file in
    # the directory regardless of extension or dot-prefix
    return out_dir.rstrip("/") + ".export-manifest.json"


def export_files(ds: rd.Dataset, out_dir: str, fmt: str = "json",
                 overwrite: bool = False) -> pa.Table:
    """Export a Dataset to JSON-lines / CSV / parquet files; returns the
    manifest (file, bytes). The destination directory is REPLACED — Ray's
    write sinks append UUID-named files, so an untouched re-run would
    silently double the data; whole-directory replace is what makes the
    export resumable per destination.

    Guard: a NON-EMPTY directory that was not produced by a previous export
    (no sibling ``<out_dir>.export-manifest.json`` marker) is refused unless
    ``overwrite=True`` — a mistyped dstConf.outDir pointing at unrelated
    data must not silently delete it."""
    import json
    import shutil

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        if not overwrite and not os.path.exists(_marker_path(out_dir)):
            raise ValueError(
                f"refusing to replace non-empty directory {out_dir!r}: it has "
                f"no export marker, so it was not produced by a previous "
                f"export — pass overwrite=True to force")
        shutil.rmtree(out_dir)
    elif os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if fmt == "json":
        ds.write_json(out_dir)
    elif fmt == "json.gz":
        # gzip JSON-lines: the wire format of real CDC export sites —
        # arrow's gzip output stream compresses per file, the filename
        # provider stamps the .json.gz extension the reader filters on
        ds.write_json(out_dir,
                      arrow_open_stream_args={"compression": "gzip"},
                      filename_provider=_GzJsonFilenames())
    elif fmt == "csv":
        ds.write_csv(out_dir)
    elif fmt == "parquet":
        ds.write_parquet(out_dir)
    else:
        raise ValueError(f"fmt={fmt!r}")
    rows = []
    for f in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, f)
        if os.path.isfile(p):
            rows.append({"file": f, "bytes": os.path.getsize(p)})
    with open(_marker_path(out_dir), "w") as fh:
        json.dump({"fmt": fmt, "files": rows}, fh)
    return pa.Table.from_pylist(rows)


def export_partitioned(ds: rd.Dataset, out_dir: str, by_col: str,
                       *, resume: bool = True,
                       overwrite: bool = False) -> pa.Table:
    """Resumable key-partitioned Parquet export: one hive-style
    subdirectory per ``by_col`` value (``out_dir/<by_col>=<v>/``), a
    ``_FINISHED`` marker per partition once its rows are fully written.

    On re-run with ``resume=True``, rows of marker-complete partitions are
    filtered out BEFORE the write (a broadcast set probe — no shuffle, no
    materialization; the partial partitions of a crashed run are exactly
    the on-disk dirs WITHOUT a marker, so no data pass is needed to find
    them) and those partial directories are replaced, so a 100-TB job
    killed mid-write redoes only the unfinished key ranges — the generic
    form of the flagship replay's per-bucket commit log
    (``state/commit_log.py``).

    Ownership guard: an existing NON-EMPTY ``out_dir`` without this sink's
    root marker (``_PARTITIONED_EXPORT``) is refused — a mistyped outDir
    pointing at unrelated hive-partitioned data (e.g. a lake's bucket
    dirs) must never be rmtree'd.  ``resume`` distinguishes crashed-run
    continuation from a fresh export of CHANGED source data: pass
    ``overwrite=True`` (config: ``dstConf.partitionOverwrite``) to discard
    all markers and rewrite everything.

    Hive name round-trip: the resume probe compares against hive-DECODED
    directory values (URL unquoting + the ``__HIVE_DEFAULT_PARTITION__``
    null sentinel), so encoded keys ('a b', '=', '/') and null keys skip
    correctly instead of silently re-appending into finished partitions.
    Returns a manifest (partition, files, bytes, skipped)."""
    import shutil
    from urllib.parse import unquote

    import pyarrow.compute as pc
    import ray

    import json

    _HIVE_NULL = "__HIVE_DEFAULT_PARTITION__"
    own_marker = os.path.join(out_dir, "_PARTITIONED_EXPORT")
    stored_by = None
    if os.path.isdir(out_dir) and os.listdir(out_dir):
        if not os.path.exists(own_marker):
            raise ValueError(
                f"refusing to write into non-empty directory {out_dir!r}: "
                f"it carries no _PARTITIONED_EXPORT marker, so it was not "
                f"produced by this sink — choose an empty directory")
        try:
            with open(own_marker) as fh:
                stored_by = json.load(fh).get("by_col")
        except Exception:
            stored_by = None    # legacy marker (pre-by_col): unknown scheme
        if stored_by is None:
            # legacy marker carries no scheme — infer it from the partition
            # dirs actually on disk so the mix guard still fires
            schemes = {d.split("=", 1)[0] for d in os.listdir(out_dir)
                       if "=" in d}
            if len(schemes) == 1:
                stored_by = schemes.pop()
    if stored_by is not None and stored_by != by_col and not overwrite:
        # re-running the same outDir with a DIFFERENT partition column must
        # not rmtree the previous run's finished partitions (they'd fail
        # the prefix filter below) nor mix two hive schemes silently
        raise ValueError(
            f"{out_dir!r} holds partitions keyed by {stored_by!r}; "
            f"partitioning by {by_col!r} would mix two hive schemes — "
            f"pass overwrite=True (dstConf.partitionOverwrite) to rewrite")
    os.makedirs(out_dir, exist_ok=True)
    with open(own_marker, "w") as fh:
        json.dump({"by_col": by_col}, fh)
    if overwrite:
        resume = False

    prefix = by_col + "="
    raw_done = {d.split("=", 1)[1] for d in os.listdir(out_dir)
                if d.startswith(prefix) and
                os.path.exists(os.path.join(out_dir, d, "_FINISHED"))} \
        if resume else set()
    done = {unquote(v) for v in raw_done if v != _HIVE_NULL}
    null_done = _HIVE_NULL in {v for v in raw_done}

    for d in list(os.listdir(out_dir)):
        if "=" not in d:
            continue
        if not resume:
            # fresh/overwrite run discards every partition dir, ANY scheme
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)
        elif d.startswith(prefix) and d.split("=", 1)[1] not in raw_done:
            # resume drops only THIS sink's crash partials (marker-less
            # dirs of the current scheme); a legacy-marker dir of another
            # scheme is left untouched rather than deleted by accident
            shutil.rmtree(os.path.join(out_dir, d), ignore_errors=True)

    if done or null_done:
        done_ref = ray.put(pa.array(sorted(done), pa.string()))
        _null_done = null_done

        def drop_done(t: pa.Table) -> pa.Table:
            vals = pc.cast(t[by_col], pa.string())
            in_done = pc.fill_null(
                pc.is_in(vals, value_set=ray.get(done_ref)), False)
            if _null_done:
                in_done = pc.or_(in_done, pc.is_null(vals))
            return t.filter(pc.invert(in_done))

        ds = ds.map_batches(drop_done, batch_format="pyarrow")

    ds.write_parquet(out_dir, partition_cols=[by_col])

    rows = []
    for d in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, d)
        if not d.startswith(prefix) or not os.path.isdir(p):
            continue
        v = d.split("=", 1)[1]
        files = [f for f in os.listdir(p) if f.endswith(".parquet")]
        skipped = v in raw_done
        if not skipped:
            with open(os.path.join(p, "_FINISHED"), "w") as fh:
                fh.write("ok")
        rows.append({"partition": v, "files": len(files),
                     "bytes": sum(os.path.getsize(os.path.join(p, f))
                                  for f in files),
                     "skipped": skipped})
    return pa.Table.from_pylist(rows)


def _sql_literal(v) -> str:
    import datetime

    import numpy as np

    import math
    if v is None or (isinstance(v, float)
                     and (v != v or math.isinf(v))):
        # NaN AND +/-inf: no portable SQL literal exists; a dump whose
        # whole purpose is to LOAD must stay syntactically valid
        return "NULL"
    if isinstance(v, (bool, np.bool_)):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, np.integer)):
        return str(int(v))
    if isinstance(v, (float, np.floating)):
        return repr(float(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return f"TIMESTAMP '{v}'"
    if isinstance(v, bytes):
        return "X'" + v.hex() + "'"
    return "'" + str(v).replace("'", "''") + "'"


class _DumpWriter:
    """Per-block SQL-dump writer (S6 dstType=dump — reference
    ``conf/interfaces/TableConfiguration.java:2218-2236`` multi-row
    ``INSERT INTO t (...) VALUES (...),(...)``). Deterministic
    content-hashed file names + tmp-then-rename make retried tasks
    idempotent. Row-wise literal rendering is inherent to the format — this
    sink exists to feed a SQL database, not the hot path."""

    def __init__(self, out_dir: str, table_name: str):
        self.out_dir = out_dir
        self.table_name = table_name
        self._seq: dict[str, int] = {}
        os.makedirs(out_dir, exist_ok=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        import hashlib

        import ray

        if len(t) == 0:
            return pa.table({"file": pa.array([], pa.string()),
                             "rows": pa.array([], pa.int64())})
        cols = ", ".join(t.column_names)
        rows = t.to_pylist()
        values = ",\n".join(
            "(" + ", ".join(_sql_literal(r[c]) for c in t.column_names) + ")"
            for r in rows)
        sql = f"INSERT INTO {self.table_name} ({cols}) VALUES\n{values};\n"
        # file name = (task id, per-task batch seq, content hash) keeps two
        # DISTINCT blocks rendering identical SQL (duplicate data split
        # identically) from collapsing to one file. The seq counter is NOT
        # retry-stable (Ray reuses a live actor, whose counters persist
        # across an application-error retry) — that is fine because
        # export_dump keeps only the files named in the manifest rows of
        # SUCCESSFUL attempts and unlinks every orphan afterwards
        try:
            tid = ray.get_runtime_context().get_task_id() or "driver"
        except Exception:
            tid = "driver"
        seq = self._seq.get(tid, 0)
        self._seq[tid] = seq + 1
        digest = hashlib.sha256(sql.encode()).hexdigest()[:16]
        fname = f"dump-{tid[:12]}-{seq}-{digest}.sql"
        path = os.path.join(self.out_dir, fname)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            fh.write(sql)
        os.replace(tmp, path)
        return pa.table({"file": [fname], "rows": [len(t)]})


def export_dump(ds: rd.Dataset, out_dir: str, table_name: str,
                overwrite: bool = False) -> pa.Table:
    """SQL-dump sink (S6): one ``INSERT INTO <table> VALUES ...`` file per
    block. Same overwrite guard + manifest contract as :func:`export_files`."""
    import json
    import shutil

    if os.path.isdir(out_dir) and os.listdir(out_dir):
        if not overwrite and not os.path.exists(_marker_path(out_dir)):
            raise ValueError(
                f"refusing to replace non-empty directory {out_dir!r}: it has "
                f"no export marker — pass overwrite=True to force")
        shutil.rmtree(out_dir)
    manifest = ds.map_batches(
        _DumpWriter, fn_constructor_kwargs=dict(out_dir=out_dir,
                                                table_name=table_name),
        batch_format="pyarrow", concurrency=(1, 8)).to_pandas()
    # exactly-once sweep: only SUCCESSFUL attempts contribute manifest rows,
    # so any .sql file not named there is an orphan of a failed/retried
    # attempt (a live actor's seq counter persists across retries and emits
    # fresh names for the replayed batches) — unlink it
    keep = set(manifest["file"]) if len(manifest) else set()
    rows = []
    for f in sorted(os.listdir(out_dir)):
        p = os.path.join(out_dir, f)
        if not os.path.isfile(p):
            continue
        if f.endswith(".sql") and f not in keep or f.endswith(".tmp"):
            os.unlink(p)
            continue
        rows.append({"file": f, "bytes": os.path.getsize(p)})
    with open(_marker_path(out_dir), "w") as fh:
        json.dump({"fmt": "dump", "table": table_name, "files": rows}, fh)
    return pa.Table.from_pylist(rows)


def read_export(out_dir: str, fmt: str = "json") -> rd.Dataset:
    """Read an export back (the LOAD side, reference S2:
    ``load/processor/DataLoadProcessor.java:29-48``)."""
    # explicit extension filter: the export marker (and any sidecar) must
    # never be parsed as data
    if fmt == "json":
        return rd.read_json(out_dir, file_extensions=["json"])
    if fmt == "json.gz":
        return rd.read_json(out_dir, file_extensions=["gz"],
                            arrow_open_stream_args={"compression": "gzip"})
    if fmt == "csv":
        return rd.read_csv(out_dir, file_extensions=["csv"])
    if fmt == "parquet":
        return rd.read_parquet(out_dir, file_extensions=["parquet"])
    raise ValueError(f"fmt={fmt!r}")
