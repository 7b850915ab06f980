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
"""
from __future__ import annotations

import os

import pyarrow as pa
import ray.data as rd


def export_files(ds: rd.Dataset, out_dir: str, fmt: str = "json") -> pa.Table:
    """Export a Dataset to JSON-lines / CSV / parquet files; returns the
    manifest (file, bytes). The destination directory is REPLACED — Ray's
    write sinks append UUID-named files, so an untouched re-run would
    silently double the data; whole-directory replace is what makes the
    export resumable per destination."""
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    os.makedirs(out_dir, exist_ok=True)
    if fmt == "json":
        ds.write_json(out_dir)
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
    return pa.Table.from_pylist(rows)


def read_export(out_dir: str, fmt: str = "json") -> rd.Dataset:
    """Read an export back (the LOAD side, reference S2:
    ``load/processor/DataLoadProcessor.java:29-48``)."""
    if fmt == "json":
        return rd.read_json(out_dir)
    if fmt == "csv":
        return rd.read_csv(out_dir)
    if fmt == "parquet":
        return rd.read_parquet(out_dir)
    raise ValueError(f"fmt={fmt!r}")
