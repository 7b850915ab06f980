"""JSON process-config runner — the reference's user surface.

The reference is driven entirely by a JSON process configuration
(``/root/reference/README.md:28-300``, ``conf/EtlConfiguration.java:42-132``):
an ``etlConfiguration`` list of items, each a ``srcConf`` (table + extraction
condition) and ``dstConf`` list (table + ``mapping`` of FieldsMapping entries
with ``srcField`` / ``dstField`` / ``srcValue`` / ``mapToNullValue``). This
module accepts the same vocabulary and compiles it to the Ray pipeline, so a
reference process config ports by renaming connection details to paths.

Supported config shape::

    {
      "processType": "etl",
      "etlConfiguration": [
        {
          "srcConf": {
            "tableName": "customer",
            "sfDir": "/root/testdata/sf0.01",       # replaces the JDBC conn
            "columns": ["c_custkey", "c_name"],      # optional pruning
            "extraConditionForExtract": "c_acctbal > 0"   # DuckDB-evaluated
          },
          "dstConf": [
            {
              "tableName": "customer_dim",
              "mapping": [
                {"srcField": "c_custkey", "dstField": "customer_id"},
                {"srcValue": "epts", "dstField": "origin_app"},
                {"mapToNullValue": true, "dstField": "legacy", "type": "string"}
              ],
              "dstType": "parquet",                  # parquet | csv | json
              "outDir": "/tmp/out/customer_dim"
            }
          ]
        }
      ]
    }

``extraConditionForExtract`` is compiled by DuckDB into a row filter over
each Arrow batch — the same "inject SQL into the WHERE clause" contract as
the reference (``engine/AbstractEtlSearchParams.java:103-118``), evaluated
vectorized per batch instead of per JDBC page.
"""
from __future__ import annotations

import json
import os

import pyarrow as pa
import ray.data as rd

from ..sources.tables import read_table
from ..stages.transforms import FieldMapping, RecordTransform, apply_transform

_TYPES = {
    "string": pa.string(), "int": pa.int64(), "bigint": pa.int64(),
    "double": pa.float64(), "bool": pa.bool_(), "timestamp": pa.timestamp("us"),
}


class _ConditionFilter:
    """Per-actor DuckDB evaluation of the extraction condition: the
    connection is built ONCE per actor (a fresh connect per batch costs more
    than the filter itself on a many-block scan); each batch registers and
    filters in-process — no data leaves the task."""

    def __init__(self, cond: str):
        import duckdb
        self.cond = cond
        self.con = duckdb.connect()

    def __call__(self, t: pa.Table) -> pa.Table:
        self.con.register("b", t)
        return self.con.sql(f"SELECT * FROM b WHERE {self.cond}").arrow()


class QueryDataSourceStage:
    """J3 — ``@field``-parameterized query datasource
    (``conf/QueryDataSourceConfig.java:339-350``): the reference runs the
    configured SQL once PER RECORD with ``@field`` placeholders bound from
    the main object. Compiled Ray-native as an actor-pool stage holding a
    DuckDB connection with the source tables as parquet views; each batch
    executes ONE correlated LATERAL join (``@field`` rewritten to ``m.field``)
    — vectorized by DuckDB's join engine, no per-row Python, no per-row SQL.

    Partitioning note: every actor re-opens the datasource parquet (a
    broadcast-read pattern) — right for lookup tables that fit node storage;
    a datasource at fact-table scale should be a TABLE datasource instead
    (``stages.lookup.datasource_lookup`` → shuffle join).
    """

    def __init__(self, sf_dir: str, query: str, required: bool = False):
        import glob
        import re

        import duckdb

        self.con = duckdb.connect()
        for p in glob.glob(os.path.join(sf_dir, "*.parquet")):
            name = os.path.splitext(os.path.basename(p))[0]
            self.con.sql(
                f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
        self.sql = re.sub(r"@(\w+)", r"m.\1", query)
        self.join = "JOIN" if required else "LEFT JOIN"

    def __call__(self, t: pa.Table) -> pa.Table:
        self.con.register("m", t)
        return self.con.sql(
            f"SELECT m.*, ds.* FROM m {self.join} LATERAL ({self.sql}) ds ON TRUE"
        ).arrow()


def _resolve_callable(spec: str):
    """'pkg.module:attr' → callable (the finalizer / processor analogue of
    the reference's ``*FullClassName`` reflection hooks)."""
    import importlib

    mod, _, attr = spec.partition(":")
    if not attr:
        mod, _, attr = spec.rpartition(".")
    return getattr(importlib.import_module(mod), attr)


def _compile_mapping(entries: list[dict]) -> RecordTransform:
    mappings = []
    for e in entries:
        mappings.append(FieldMapping(
            dst_field=e["dstField"],
            src_field=e.get("srcField"),
            src_value=e.get("srcValue"),
            map_to_null=bool(e.get("mapToNullValue", False)),
            dtype=_TYPES.get(e.get("type")) if e.get("type") else None,
        ))
    return RecordTransform(mappings=mappings)


def _run_item(item: dict, outputs: dict[str, str]) -> None:
    """One etlConfiguration item (srcConf → dstConf list), then its nested
    ``child`` item(s) — the reference's chained operation controllers
    (``conf/EtlOperationConfig.java:490-499``: children start after the
    parent operation completes)."""
    from .export import export_files

    src = item["srcConf"]
    ds = read_table(src["sfDir"], src["tableName"],
                    columns=src.get("columns"))
    cond = src.get("extraConditionForExtract")
    if cond:
        ds = ds.map_batches(_ConditionFilter,
                            fn_constructor_kwargs=dict(cond=cond),
                            batch_format="pyarrow", concurrency=(1, 8))
    for qds in src.get("extraQueryDataSource", []):
        ds = ds.map_batches(
            QueryDataSourceStage,
            fn_constructor_kwargs=dict(sf_dir=src["sfDir"],
                                       query=qds["query"],
                                       required=bool(qds.get("required", False))),
            batch_format="pyarrow", concurrency=(1, 8))
    for dst in item["dstConf"]:
        if dst["tableName"] in outputs:
            # D3 — duplicate destination items are a config error (two items
            # would silently race on one output directory)
            raise ValueError(
                f"duplicate dstConf tableName {dst['tableName']!r} in config")
        out = apply_transform(ds, _compile_mapping(dst["mapping"]))
        out_dir = dst.get("outDir") or os.path.join(
            "/tmp", "etl_out", dst["tableName"])
        fmt = dst.get("dstType", "parquet")
        if fmt == "dump":
            from .export import export_dump
            export_dump(out, out_dir, dst["tableName"])
        else:
            export_files(out, out_dir, fmt=fmt)
        outputs[dst["tableName"]] = out_dir
    child = item.get("child")
    for c in ([child] if isinstance(child, dict) else (child or [])):
        _run_item(c, outputs)


def _run_quick_merge(cfg: dict, outputs: dict[str, str]) -> None:
    """DB_QUICK_MERGE_* — srcConf rows upsert into a destination lake,
    matched by the configured unique keys with PK adoption (the
    ``db_quick_merge_gaza.json`` shape; ``pipelines.replay.quick_merge``).
    Rows without an lsn/op column get lsn=0 / op='insert' defaults (a
    one-shot table merge, not a log replay)."""
    from .replay import quick_merge

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        ds = read_table(src["sfDir"], src["tableName"],
                        columns=src.get("columns"))

        def defaults(t: pa.Table) -> pa.Table:
            import numpy as np
            if "lsn" not in t.column_names:
                t = t.append_column("lsn", pa.array(
                    np.full(len(t), int(src.get("lsn", 0)), dtype="int64")))
            if "op" not in t.column_names:
                t = t.append_column("op", pa.array(["insert"] * len(t)))
            return t

        ds = ds.map_batches(defaults, batch_format="pyarrow")
        cond = src.get("extraConditionForExtract")
        if cond:
            ds = ds.map_batches(_ConditionFilter,
                                fn_constructor_kwargs=dict(cond=cond),
                                batch_format="pyarrow", concurrency=(1, 8))
        dst = item["dstConf"][0]
        lake = dst["lakeRoot"]
        quick_merge(ds, lake,
                    key_cols=tuple(dst["keyCols"]),
                    unique_keys=[list(g) for g in dst["uniqueKeys"]],
                    num_buckets=int(dst.get("numBuckets", 64))).materialize()
        outputs[dst.get("tableName", src["tableName"])] = lake


def _run_detect_gaps(cfg: dict, outputs: dict[str, str]) -> None:
    """DETECT_GAPES_ON_DB_TABLES — gap runs of each table's id sequence
    written as parquet (``stages.gap_detect``)."""
    from ..stages.gap_detect import detect_gaps
    from .export import export_files

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        ds = read_table(src["sfDir"], src["tableName"])
        cond = src.get("extraConditionForExtract")
        if cond:
            ds = ds.map_batches(_ConditionFilter,
                                fn_constructor_kwargs=dict(cond=cond),
                                batch_format="pyarrow", concurrency=(1, 8))
        ds = ds.select_columns([src["idColumn"]])
        gaps = detect_gaps(ds, src["idColumn"],
                           range_size=int(src.get("rangeSize", 100_000)))
        out_dir = src.get("outDir") or os.path.join(
            "/tmp", "etl_out", f"gaps_{src['tableName']}")
        export_files(gaps, out_dir, fmt="parquet")
        outputs[src["tableName"]] = out_dir


def _run_inconsistency_check(cfg: dict, outputs: dict[str, str]) -> None:
    """DB_INCONSISTENCY_CHECK — FK repair against a parent table
    (``stages.inconsistency.resolve_inconsistencies``)."""
    from ..stages.inconsistency import resolve_inconsistencies
    from .export import export_files

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        ds = read_table(src["sfDir"], src["tableName"],
                        columns=src.get("columns"))
        parents = read_table(src["sfDir"], src["parentTable"],
                             columns=[src["parentKeyColumn"]])
        fixed = resolve_inconsistencies(
            ds, parents, src["fkColumn"], src["parentKeyColumn"],
            on_missing=src.get("onMissing", "drop"),
            default_value=src.get("defaultValue"))
        out_dir = src.get("outDir") or os.path.join(
            "/tmp", "etl_out", f"check_{src['tableName']}")
        export_files(fixed, out_dir, fmt="parquet")
        outputs[src["tableName"]] = out_dir


def _run_reconciliation(cfg: dict, outputs: dict[str, str]) -> None:
    """DATA_RECONCILIATION / DETECT_MISSING_RECORDS — three-way diff of two
    tables (``stages.detectors.reconcile``): missing / phantom / outdated."""
    from ..stages.detectors import reconcile
    from .export import export_files

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        a = read_table(src["sfDir"], src["tableName"])
        b = read_table(src["dstSfDir"] if "dstSfDir" in src else src["sfDir"],
                       src["dstTableName"])
        diff = reconcile(a, b, list(src["keyCols"]),
                         list(src.get("compareCols", [])))
        out_dir = src.get("outDir") or os.path.join(
            "/tmp", "etl_out", f"reconcile_{src['tableName']}")
        export_files(diff, out_dir, fmt="parquet")
        outputs[src["tableName"]] = out_dir


def _run_source_sync(cfg: dict, outputs: dict[str, str]) -> None:
    """SOURCE_SYNC / DATABASE_MERGE_FROM_SOURCE_DB — replay a change-event
    parquet log into a lake (the flagship CDC path)."""
    from .replay import replay

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        import ray.data as rd_

        events = rd_.read_parquet(src["eventsPath"])
        dst = item["dstConf"][0]
        replay(events, dst["lakeRoot"],
               num_buckets=int(dst.get("numBuckets", 64)),
               key_cols=tuple(dst.get("keyCols", ("repo", "path"))),
               layout=dst.get("layout", "snapshot")).materialize()
        outputs[dst.get("tableName", "lake")] = dst["lakeRoot"]


def run_config(cfg: dict | str, _seen: frozenset = frozenset()) -> dict[str, str]:
    """Run a process config; returns {dst tableName: output dir}. The write
    is partitioned parquet/csv/json via the export sinks (resumable layout).

    Process-level surface beyond the item list (reference §2.10):

    - ``childConfigFilePath`` — after this config finishes, load and run
      that config too (``controller/ProcessStarter.java:133-172``: the child
      process starts when the parent controller reports finished); chains
      recursively, cycles rejected.
    - ``finalizer`` — ``"module:callable"`` invoked with the outputs dict
      once this config's own items are done, BEFORE the child config starts
      (``controller/ProcessController.java:629-649`` onFinish ordering).
    """
    path = None
    if isinstance(cfg, str):
        path = os.path.abspath(cfg)
        if path in _seen:
            raise ValueError(f"childConfigFilePath cycle at {path}")
        with open(path) as fh:
            cfg = json.load(fh)

    ptype = str(cfg.get("processType", "etl")).upper()
    outputs: dict[str, str] = {}
    if ptype in ("ETL", "RE_ETL", "DB_EXTRACT", "DB_QUICK_EXPORT"):
        for item in cfg["etlConfiguration"]:
            _run_item(item, outputs)
    elif ptype in ("DB_QUICK_MERGE_WITH_DATABASE_GENERATION",
                   "DB_QUICK_MERGE_WITH_ENTITY_GENERATION", "DB_QUICK_MERGE"):
        _run_quick_merge(cfg, outputs)
    elif ptype == "DETECT_GAPES_ON_DB_TABLES":
        _run_detect_gaps(cfg, outputs)
    elif ptype == "DB_INCONSISTENCY_CHECK":
        _run_inconsistency_check(cfg, outputs)
    elif ptype in ("DATA_RECONCILIATION", "DETECT_MISSING_RECORDS"):
        _run_reconciliation(cfg, outputs)
    elif ptype in ("SOURCE_SYNC", "DATABASE_MERGE_FROM_SOURCE_DB"):
        _run_source_sync(cfg, outputs)
    else:
        raise ValueError(f"unsupported processType {cfg.get('processType')!r}")

    if cfg.get("finalizer"):
        _resolve_callable(cfg["finalizer"])(outputs)

    child_path = cfg.get("childConfigFilePath")
    if child_path:
        outputs.update(run_config(
            child_path, _seen | ({path} if path else frozenset())))
    return outputs
