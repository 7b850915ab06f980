"""JSON process-config runner — the reference's user surface.

The reference is driven entirely by a JSON process configuration
(``/root/reference/README.md:28-300``, ``conf/EtlConfiguration.java:42-132``):
an ``etlConfiguration`` list of items, each a ``srcConf`` (table + extraction
condition) and ``dstConf`` list (table + ``mapping`` of FieldsMapping entries
with ``srcField`` / ``dstField`` / ``srcValue`` / ``mapToNullValue``). This
module accepts the same vocabulary and compiles it to the Ray pipeline, so a
reference process config ports by renaming connection details to paths.

Every reference process type dispatches (POJO_GENERATION/PREPARATION are
n/a by design): ETL/RE_ETL/DB_EXTRACT/DB_QUICK_EXPORT, DB_QUICK_MERGE_*,
LOAD/DB_QUICK_LOAD (multi-origin ``sourceFolders``), DB_MERGE_FROM_JSON,
DB_RE_SYNC (incremental ``since="auto"`` windows), TRANSPORT,
RESOLVE_CONFLICTS_IN_STAGE_AREA, DETECT_GAPES_ON_DB_TABLES,
DB_INCONSISTENCY_CHECK, CHANGED/NEW_RECORDS_DETECTOR,
DATA_RECONCILIATION/DETECT_MISSING_RECORDS, SOURCE_SYNC, and
GENERIC_PROCESS (requires an item-level ``processor``). Items may also
carry ``processor: "module:callable"`` to replace the stock dataflow
(the ``processorFullClassName`` analogue).

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
              "dstType": "parquet",           # parquet | csv | json | json.gz
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

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..sources.tables import read_table
from ..stages.transforms import FieldMapping, RecordTransform, apply_transform

_TYPES = {
    "string": pa.string(), "int": pa.int64(), "bigint": pa.int64(),
    "double": pa.float64(), "bool": pa.bool_(), "timestamp": pa.timestamp("us"),
}


class _ConditionFilter:
    """DuckDB evaluation of the extraction condition as a PLAIN task-pool
    instance: the connection opens lazily once per task (sub-ms) and every
    batch registers and filters in-process — no data leaves the task. The
    earlier actor-pool form paid ~0.8s of pool startup per query and never
    amortized it (each query builds a fresh pool); the task form also fuses
    with the upstream read (measured 0.93s -> 0.15s warm at sf0.1)."""

    def __init__(self, cond: str):
        self.cond = cond
        self.con = None

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.con is None:
            import duckdb
            self.con = duckdb.connect()
        self.con.register("b", t)
        return self.con.sql(f"SELECT * FROM b WHERE {self.cond}").arrow()

    def __getstate__(self):
        return {"cond": self.cond, "con": None}  # connections don't pickle


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
        import re

        self.sf_dir = sf_dir
        self.sql = re.sub(r"@(\w+)", r"m.\1", query)
        self.join = "JOIN" if required else "LEFT JOIN"
        self.con = None

    def _connect(self):
        import glob

        import duckdb

        con = duckdb.connect()
        for p in glob.glob(os.path.join(self.sf_dir, "*.parquet")):
            name = os.path.splitext(os.path.basename(p))[0]
            con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")
        return con

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.con is None:   # lazy per-task connect: view DDL is metadata-only
            self.con = self._connect()
        self.con.register("m", t)
        # LIMIT 1 inside the lateral: the reference takes the query's FIRST
        # row per record; without it a multi-row match would fan out source
        # records, violating the one-row lookup contract the table-
        # datasource path enforces via key dedup
        return self.con.sql(
            f"SELECT m.*, ds.* FROM m {self.join} LATERAL "
            f"(SELECT * FROM ({self.sql}) AS q LIMIT 1) ds ON TRUE"
        ).arrow()

    def __getstate__(self):
        d = dict(self.__dict__)
        d["con"] = None        # connections don't pickle
        return d


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
            # per-field UDF by dotted path — the reference's per-mapping
            # `transformer` class (FieldsMapping.java:66-84 loads the class
            # by name and calls it per value; here it's one vectorized call
            # per Arrow column)
            transformer=(_resolve_callable(e["transformer"])
                         if e.get("transformer") else None),
        ))
    return RecordTransform(mappings=mappings)


def _compile_policy(dst: dict) -> "ConflictPolicy | None":
    """``onConflict`` + ``winningRecordFieldsInfo`` → :class:`ConflictPolicy`
    (reference ``conf/DstConf.java:66-86``: the destination declares how an
    existing record is merged; ``model/EtlDatabaseObject.java:646-676`` the
    winning-fields rule). ``winningRecordFieldsInfo`` accepts the reference's
    list-of-groups of ``{fieldName, value}`` — a flat list is one group."""
    from ..stages.merge_applier import ConflictPolicy

    on_conflict = dst.get("onConflict")
    wfi = dst.get("winningRecordFieldsInfo")
    if not on_conflict and not wfi:
        return None
    groups: list[list[tuple[str, object]]] = []
    if wfi:
        if wfi and isinstance(wfi[0], dict):   # flat list = one group
            wfi = [wfi]
        for g in wfi:
            groups.append([(f["fieldName"], f.get("value")) for f in g])
    mode = {
        "keepExisting": "keep_existing", "keep_existing": "keep_existing",
        "updateExisting": "update_existing", "update_existing": "update_existing",
        "winningFields": "winning_fields", "winning_fields": "winning_fields",
        "lwwLsn": "lww_lsn", "lww_lsn": "lww_lsn",
    }.get(on_conflict or ("winning_fields" if groups else "lww_lsn"))
    if mode is None:
        raise ValueError(f"unsupported onConflict {on_conflict!r}")
    if mode == "winning_fields" and not groups:
        raise ValueError("onConflict=winningFields needs winningRecordFieldsInfo")
    return ConflictPolicy(mode=mode, winning_field_groups=groups)


def _render_param(v) -> str:
    """SQL-literal rendering for a process param (reference README:251-252:
    params are ``@name`` identifiers bound into conditions/queries). Lists
    render comma-joined (the ``IN (@p)`` context); ``{"identifier": x}``
    renders bare for the DB-resource context (``FROM @table_name``)."""
    if isinstance(v, dict) and set(v) == {"identifier"}:
        return str(v["identifier"])
    if isinstance(v, bool):
        return "TRUE" if v else "FALSE"
    if isinstance(v, (int, float)):
        return str(v)
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, (list, tuple)):
        return ", ".join(_render_param(x) for x in v)
    raise ValueError(f"unsupported param value {v!r}")


def bind_params(text: str | None, params: dict | None) -> str | None:
    """Substitute ``@name`` tokens that match a process param; unknown
    tokens are left for the per-record binder (QueryDataSourceStage rewrites
    surviving ``@field`` to the record's columns)."""
    if not text or not params:
        return text
    import re

    return re.sub(
        r"@(\w+)",
        lambda m: _render_param(params[m.group(1)])
        if m.group(1) in params else m.group(0),
        text)


def _join_fields(spec: dict) -> list[tuple[str, str]]:
    """``joinFields`` entries → [(src_field, aux_field)]. Accepts the
    reference's ``srcField``/``dstField`` pair names (RefMapping shape) and a
    bare string (same column name on both sides)."""
    out = []
    for f in spec.get("joinFields", []):
        if isinstance(f, str):
            out.append((f, f))
        else:
            s = f.get("srcField") or f.get("field")
            out.append((s, f.get("dstField") or f.get("auxField") or s))
    if not out:
        raise ValueError(
            f"datasource {spec.get('tableName')!r} needs joinFields")
    return out


def compile_extract(src: dict, params: dict | None = None) -> rd.Dataset:
    """Compile one ``srcConf`` to its extract Dataset — the reference's
    search-params SELECT (``EtlDatabaseObjectSearchParams.java:44-91``):
    base table + ``extraConditionForExtract`` + ``selfJoinTables`` +
    ``extraTableDataSource`` + ``extraQueryDataSource``, in that order.
    ``params``: the process-level ``@name`` bindings (README:37,251-252)."""
    ds = read_table(src["sfDir"], src["tableName"],
                    columns=src.get("columns"))
    cond = bind_params(src.get("extraConditionForExtract"), params)
    if cond:
        ds = ds.map_batches(_ConditionFilter(cond), batch_format="pyarrow")
    # selfJoinTables — aux tables joined INTO the extract, multiplicity
    # preserved (the reference splices them into the SELECT:
    # etl/model/EtlDatabaseObjectSearchParams.java:44-91, README:95-118)
    for sj in src.get("selfJoinTables", []):
        from ..stages.joins import broadcast_inner_join, left_join

        aux = read_table(src["sfDir"], sj["tableName"],
                         columns=sj.get("columns"))
        jcond = bind_params(sj.get("joinExtraCondition"), params)
        if jcond:
            # aux-side ON-clause constraint (reference README:252): filtering
            # the aux side BEFORE the join gives exact ON ... AND <cond>
            # semantics for both inner and left joins when the condition
            # references aux columns (the reference's usage)
            aux = aux.map_batches(_ConditionFilter(jcond),
                                  batch_format="pyarrow")
        pairs = _join_fields(sj)
        s_keys = [s for s, _ in pairs]
        a_keys = [a for _, a in pairs]
        if str(sj.get("joinType", "inner")).lower() == "left":
            # left joins stay on the shuffle path (broadcast-left needs
            # nullable-dtype canonicalization; see joins.broadcast_inner_join)
            if s_keys == a_keys:
                ds = left_join(ds, aux, s_keys)
            else:
                ds = left_join(ds, aux, s_keys, right_on=tuple(a_keys))
        else:
            # aux tables are dimension-sized in the reference's configs:
            # broadcast probe when small, hash shuffle above the threshold
            ds = broadcast_inner_join(
                ds, aux, s_keys,
                right_on=tuple(a_keys) if a_keys != s_keys else None)
    # extraTableDataSource — one-row-per-key lookup attach (J2,
    # conf/SrcConf.java:22-28 / TableDataSourceConfig.java:110-118)
    for tds in src.get("extraTableDataSource", []):
        from ..stages.lookup import datasource_lookup

        lk = read_table(src["sfDir"], tds["tableName"])
        ds = datasource_lookup(
            ds, lk, _join_fields(tds),
            required=bool(tds.get("required", False)),
            columns=tds.get("columns"))
    for qds in src.get("extraQueryDataSource", []):
        ds = ds.map_batches(
            QueryDataSourceStage(
                sf_dir=src["sfDir"],
                query=bind_params(qds["query"], params),
                required=bool(qds.get("required", False))),
            batch_format="pyarrow")
    return ds


def _run_item(item: dict, outputs: dict[str, str],
              params: dict | None = None) -> None:
    """One etlConfiguration item (srcConf → dstConf list), then its nested
    ``child`` item(s) — the reference's chained operation controllers
    (``conf/EtlOperationConfig.java:490-499``: children start after the
    parent operation completes).

    ``item["processor"]`` — ``"module:callable"`` that REPLACES the
    stock mapping dataflow (the reference's ``processorFullClassName``,
    ``conf/EtlOperationConfig.java:65-67``: a custom processor class is
    loaded by name and substituted for the whole operation's engine,
    ``etl/controller/EtlController.java:41-61``). The callable receives
    ``(extract Dataset, dstConf dict)`` and returns the Dataset to write;
    the runner still owns extraction and the sink, so a custom processor
    composes with extraConditionForExtract, datasources and every dstType."""
    from .export import export_files

    ds = compile_extract(item["srcConf"], params)
    processor = (_resolve_callable(item["processor"])
                 if item.get("processor") else None)
    for dst in item["dstConf"]:
        if dst["tableName"] in outputs:
            # D3 — duplicate destination items are a config error (two items
            # would silently race on one output directory)
            raise ValueError(
                f"duplicate dstConf tableName {dst['tableName']!r} in config")
        if processor is not None:
            out = processor(ds, dst)
        else:
            out = apply_transform(ds, _compile_mapping(dst["mapping"]))
        out_dir = dst.get("outDir") or os.path.join(
            "/tmp", "etl_out", dst["tableName"])
        fmt = dst.get("dstType", "parquet")
        if fmt == "dump":
            from .export import export_dump
            export_dump(out, out_dir, dst["tableName"])
        elif dst.get("partitionBy"):
            # resumable hive-partitioned parquet sink: a re-run of the same
            # config skips marker-complete key ranges (reference analogue:
            # per-batch export markers in the stage table)
            if fmt != "parquet":
                raise ValueError(
                    f"partitionBy requires dstType=parquet, got {fmt!r}")
            from .export import export_partitioned
            export_partitioned(out, out_dir, dst["partitionBy"],
                               overwrite=bool(
                                   dst.get("partitionOverwrite", False)))
        else:
            export_files(out, out_dir, fmt=fmt)
        outputs[dst["tableName"]] = out_dir
    child = item.get("child")
    for c in ([child] if isinstance(child, dict) else (child or [])):
        _run_item(c, outputs, params)



def _single_dst(item: dict) -> dict:
    """The single-destination runners (RE_SYNC, quick-merge, LOAD,
    RESOLVE_CONFLICTS, ...) consume exactly one dstConf; a config listing
    several would have the rest SILENTLY dropped (the ETL runner is the
    one that fans out per EtlItemConfiguration, reference
    conf/EtlItemConfiguration.java). Raise instead (ADVICE r4)."""
    dsts = item["dstConf"]
    if len(dsts) != 1:
        raise ValueError(
            f"this process type supports exactly one dstConf per item; "
            f"got {len(dsts)} for srcConf "
            f"{item.get('srcConf', {}).get('tableName')!r} — split the "
            f"item or use an ETL process type, which fans out")
    return dsts[0]

def _run_re_sync(cfg: dict, outputs: dict[str, str]) -> None:
    """DB_RE_SYNC — re-synchronize a destination with the records created
    or changed since the last sync. The reference process type
    (``conf/types/EtlProcessType.java:9``) runs exactly the
    NEW_RECORDS_DETECTOR + CHANGED_RECORDS_DETECTOR operations
    (``conf/EtlOperationConfig.java:717-721``
    ``getSupportedOperationsInDBReSyncProcess``) and is the one process
    allowed to RE-RUN when its process info changed
    (``controller/ProcessController.java:562-586``
    ``reRunConditionsAreSatisfied``). Ray-native shape: classify the
    monitored table's window into new/changed rows (one vectorized
    predicate pass), optionally export the detection audit, then push the
    detected records back through the unique-key merge into the
    destination lake. Re-run safety comes from the commit-log watermark:
    replaying an unchanged window is a no-op by construction, so the
    reference's process-info gate is unnecessary here."""
    from ..stages.detectors import classify_new_changed
    from .export import export_files
    from .replay import quick_merge

    import tempfile

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        dst = _single_dst(item)
        ds = read_table(src["sfDir"], src["tableName"],
                        columns=src.get("columns"))
        cond = bind_params(src.get("extraConditionForExtract"),
                           cfg.get("params"))
        if cond:
            ds = ds.map_batches(_ConditionFilter(cond), batch_format="pyarrow")
        state_path = os.path.join(dst["lakeRoot"], "_resync",
                                  f"{src['tableName']}.json")
        if str(src["since"]).lower() == "auto":
            # incremental lifecycle (the reference's ProcessInfo file,
            # ProcessController.java:562-586: a DB_RE_SYNC re-runs only
            # when its process info changed): the window advances from the
            # previous run's `until`, persisted per (lake, table)
            if not src.get("until"):
                raise ValueError("since='auto' needs an explicit 'until' "
                                 "(the new window's exclusive end)")
            if os.path.exists(state_path):
                with open(state_path) as fh:
                    since = pd.Timestamp(json.load(fh)["last_until"])
            else:
                # first run: everything before `until` counts as the window
                # (Timestamp.min would cast lossily to microseconds)
                since = pd.Timestamp("1900-01-01")
        else:
            since = pd.Timestamp(src["since"])
        until = pd.Timestamp(src["until"]) if src.get("until") else None
        auto = str(src["since"]).lower() == "auto"
        detected = classify_new_changed(
            ds, src["createdColumn"], src["changedColumn"], since, until=until)
        if src.get("detectedDir"):
            # export the audit FIRST and merge from the exported parquet:
            # consuming the lazy `detected` twice would re-execute the full
            # source read + classify lineage a second time
            export_files(detected, src["detectedDir"], fmt="parquet")
            detected = rd.read_parquet(src["detectedDir"],
                                       file_extensions=["parquet"])
        payload = detected.drop_columns(["change_class"])
        if dst.get("lsn") is not None:
            payload = _events_defaults(payload, lsn=int(dst["lsn"]))
        else:
            # default per-row lsn = epoch-us of the row's LAST activity:
            # a row changed again after an earlier re-sync outranks the
            # bucket watermark the earlier merge committed, while an
            # unchanged window replays as a no-op. NOTE this puts the
            # lake's lsn domain on the microsecond-epoch scale — do not
            # mix such a lake with replay() of an integer-LSN CDC log
            # (pass an explicit dst.lsn to stay in your own domain).
            created, changed = src["createdColumn"], src["changedColumn"]

            def row_lsn(t: pa.Table, _c=created, _g=changed) -> pa.Table:
                last = pc.max_element_wise(
                    pc.cast(t[_c], pa.timestamp("us")),
                    pc.cast(t[_g], pa.timestamp("us")))
                t = t.append_column("lsn", pc.cast(last, pa.int64()))
                return t.append_column("op", pa.array(["insert"] * len(t)))

            payload = payload.map_batches(row_lsn, batch_format="pyarrow")
        quick_merge(payload, dst["lakeRoot"],
                    key_cols=tuple(dst["keyCols"]),
                    unique_keys=[list(g) for g in dst["uniqueKeys"]],
                    policy=_compile_policy(dst),
                    num_buckets=int(dst.get("numBuckets", 64))).materialize()
        if auto:
            # publish the new watermark only AFTER the merge committed
            # (tmp + os.replace: a crash re-detects the same window, and
            # the merge's commit-log watermark makes the redo a no-op)
            os.makedirs(os.path.dirname(state_path), exist_ok=True)
            fd, tmp = tempfile.mkstemp(dir=os.path.dirname(state_path),
                                       suffix=".tmp")
            with os.fdopen(fd, "w") as fh:
                json.dump({"last_until": str(until)}, fh)
            os.replace(tmp, state_path)
        outputs[dst.get("tableName", src["tableName"])] = dst["lakeRoot"]


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

        ds = _events_defaults(ds, lsn=int(src.get("lsn", 0)))
        cond = bind_params(src.get("extraConditionForExtract"),
                           cfg.get("params"))
        if cond:
            ds = ds.map_batches(_ConditionFilter(cond), batch_format="pyarrow")
        dst = _single_dst(item)
        lake = dst["lakeRoot"]
        quick_merge(ds, lake,
                    key_cols=tuple(dst["keyCols"]),
                    unique_keys=[list(g) for g in dst["uniqueKeys"]],
                    policy=_compile_policy(dst),
                    num_buckets=int(dst.get("numBuckets", 64))).materialize()
        outputs[dst.get("tableName", src["tableName"])] = lake


def _events_defaults(ds: rd.Dataset, lsn: int = 0) -> rd.Dataset:
    """Rows without lsn/op columns get lsn=<n> / op='insert' defaults (a
    one-shot table merge, not a log replay)."""
    def defaults(t: pa.Table) -> pa.Table:
        import numpy as np
        if "lsn" not in t.column_names:
            t = t.append_column("lsn", pa.array(
                np.full(len(t), int(lsn), dtype="int64")))
        if "op" not in t.column_names:
            t = t.append_column("op", pa.array(["insert"] * len(t)))
        return t

    return ds.map_batches(defaults, batch_format="pyarrow")


ORIGIN_COL = "recordOriginLocationCode"


def _read_import_origins(src: dict) -> rd.Dataset:
    """Multi-origin import: ``sourceFolders`` lists several origin sites'
    export directories, each tagged with its origin location code and
    unioned into ONE dataset (reference
    ``conf/EtlOperationConfig.java:482-488``: the operation clones one
    controller per origin folder; the origin code rides every stage row as
    ``recordOriginLocationCode``, ``common/model/EtlStageRecordVO.java:36-67``
    — two sites' overlapping local PKs stay distinct records downstream).
    Entries are ``{"appOriginCode": code, "importDir": dir}`` or bare dir
    strings (origin code = the directory's basename). A plain ``importDir``
    srcConf stays single-origin and untagged."""
    from .export import read_export

    fmt = src.get("format", "json")
    folders = src.get("sourceFolders")
    if not folders:
        return read_export(src["importDir"], fmt=fmt)
    parts = []
    seen = set()
    for f in folders:
        if isinstance(f, str):
            f = {"importDir": f}
        code = f.get("appOriginCode") or os.path.basename(
            f["importDir"].rstrip("/"))
        if code in seen:
            raise ValueError(f"duplicate appOriginCode {code!r} in "
                             "sourceFolders")
        seen.add(code)
        one = read_export(f["importDir"], fmt=fmt)
        parts.append(one.map_batches(
            lambda t, c=code: t.append_column(
                ORIGIN_COL, pa.array([c] * len(t), pa.string())),
            batch_format="pyarrow"))
    ds = parts[0]
    for p in parts[1:]:
        ds = ds.union(p)
    return ds


def _run_load(cfg: dict, outputs: dict[str, str]) -> None:
    """LOAD / DB_QUICK_LOAD — read an export directory (the files a source
    site produced with dstType=json/csv) into the STAGE AREA as partitioned
    parquet (reference ``load/processor/DataLoadProcessor.java:29-48``: JSON
    files → syncImportInfo stage rows; transport is shared storage here, so
    'load' = parse + stage, ready for DB_MERGE_FROM_JSON). Accepts
    multi-origin ``sourceFolders`` (see :func:`_read_import_origins`)."""
    from .export import export_files

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        ds = _read_import_origins(src)
        cond = bind_params(src.get("extraConditionForExtract"),
                           cfg.get("params"))
        if cond:
            ds = ds.map_batches(_ConditionFilter(cond), batch_format="pyarrow")
        dst = _single_dst(item)
        stage_dir = dst["stageDir"]
        export_files(ds, stage_dir, fmt="parquet")
        outputs[dst.get("tableName", os.path.basename(stage_dir))] = stage_dir


def _run_merge_from_json(cfg: dict, outputs: dict[str, str]) -> None:
    """DB_MERGE_FROM_JSON — merge staged (or directly exported) records into
    the destination lake by unique keys with conflict resolution (reference
    ``merge/model/MergingRecord.java:44-117``). ``srcConf.stageDir`` points
    at a LOAD output; ``srcConf.importDir`` merges an export dir directly
    (skipping the explicit stage step); ``srcConf.sourceFolders`` merges
    several origin sites in one shot, origin-tagged
    (:func:`_read_import_origins`)."""
    from .replay import quick_merge

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        if "stageDir" in src:
            ds = rd.read_parquet(src["stageDir"],
                                 file_extensions=["parquet"])
        else:
            ds = _read_import_origins(src)
        ds = _events_defaults(ds, lsn=int(src.get("lsn", 0)))
        dst = _single_dst(item)
        lake = dst["lakeRoot"]
        quick_merge(ds, lake,
                    key_cols=tuple(dst["keyCols"]),
                    unique_keys=[list(g) for g in dst["uniqueKeys"]],
                    policy=_compile_policy(dst),
                    num_buckets=int(dst.get("numBuckets", 64))).materialize()
        outputs[dst.get("tableName", "lake")] = lake


def _run_transport(cfg: dict, outputs: dict[str, str]) -> None:
    """TRANSPORT (S8) — move a source site's export files into the
    destination's import directory, keeping a backup copy (reference
    ``transport/TransportSyncFilesProcessor``: copy to destination import
    dir, then move the original to bkp). On shared lake storage this step
    is usually a no-op (the LOAD reads the export dir directly), but the
    reference's two-site deployments rely on it, so the vocabulary exists.

    Idempotent: a file already present in the import dir (same name + size)
    is skipped; delivery is tmp+rename so a crashed run never leaves a
    half-copied data file visible."""
    import glob
    import shutil

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        dst = _single_dst(item)
        export_dir = src["exportDir"]
        import_dir = dst["importDir"]
        bkp_dir = src.get("bkpDir")
        exts = tuple(src.get("extensions", ["json", "csv", "sql", "parquet"]))
        os.makedirs(import_dir, exist_ok=True)
        if bkp_dir:
            os.makedirs(bkp_dir, exist_ok=True)
        for p in sorted(glob.glob(os.path.join(export_dir, "*"))):
            if not os.path.isfile(p) or not p.endswith(
                    tuple("." + e.lstrip(".") for e in exts)):
                continue
            name = os.path.basename(p)
            target = os.path.join(import_dir, name)
            if not (os.path.exists(target)
                    and os.path.getsize(target) == os.path.getsize(p)):
                tmp = target + ".tmp"
                shutil.copyfile(p, tmp)
                os.replace(tmp, target)
            if bkp_dir:
                # shutil.move: os.replace raises EXDEV when the backup dir
                # sits on a different filesystem (the normal case)
                shutil.move(p, os.path.join(bkp_dir, name))
        outputs[src.get("tableName", os.path.basename(export_dir))] = import_dir


def _run_resolve_conflicts(cfg: dict, outputs: dict[str, str]) -> None:
    """RESOLVE_CONFLICTS_IN_STAGE_AREA — collapse a stage table to one row
    per key, most recent wins (``stages.lww.lww_final_state``; reference
    ``resolveconflictsinstagearea/.../ResolveConflictsInStageAreaProcessor.java:26-62``)."""
    from ..stages.lww import lww_final_state
    from .export import export_files

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        if "stageDir" in src:
            ds = rd.read_parquet(src["stageDir"], file_extensions=["parquet"])
        else:
            ds = read_table(src["sfDir"], src["tableName"],
                            columns=src.get("columns"))
        resolved = lww_final_state(
            ds, key_cols=tuple(src["keyCols"]),
            lsn_col=src.get("lsnColumn", "lsn"),
            drop_deleted=bool(src.get("dropDeleted", True)))
        out_dir = src.get("outDir") or os.path.join(
            "/tmp", "etl_out", f"resolved_{src.get('tableName', 'stage')}")
        export_files(resolved, out_dir, fmt="parquet")
        outputs[src.get("tableName", "stage")] = out_dir


def _run_detect_gaps(cfg: dict, outputs: dict[str, str]) -> None:
    """DETECT_GAPES_ON_DB_TABLES — gap runs of each table's id sequence
    written as parquet (``stages.gap_detect``)."""
    from ..stages.gap_detect import detect_gaps
    from .export import export_files

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        ds = read_table(src["sfDir"], src["tableName"])
        cond = bind_params(src.get("extraConditionForExtract"),
                           cfg.get("params"))
        if cond:
            ds = ds.map_batches(_ConditionFilter(cond), batch_format="pyarrow")
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
            default_value=src.get("defaultValue"),
            # RefMapping conditional/ignorable vocabulary (RefMapping.java:7-28)
            condition_field=src.get("conditionField"),
            condition_value=src.get("conditionValue"),
            # reference writes inconsistence_info rows for every repair;
            # wire the audit side channel through the config vocabulary
            audit_dir=src.get("inconsistenceInfoDir"))
        out_dir = src.get("outDir") or os.path.join(
            "/tmp", "etl_out", f"check_{src['tableName']}")
        export_files(fixed, out_dir, fmt="parquet")
        outputs[src["tableName"]] = out_dir


def _run_detector(cfg: dict, outputs: dict[str, str], *, new_only: bool) -> None:
    """CHANGED_RECORDS_DETECTOR / NEW_RECORDS_DETECTOR — timestamp-window
    scan of a monitored table, then the configured after-action per detected
    record (reference ``ChangedRecordsDetectorSearchParams.java:32-77`` and
    the ``afterEtlActionType`` performer hook): the detected rows pass
    through an optional ``actionPerformer`` batch callable (the reference
    loads an action class by name and calls it per record; here it is one
    vectorized call per Arrow batch), then export to ``outDir``."""
    from ..stages.detectors import classify_new_changed, detect_changed_records
    from .export import export_files

    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        ds = read_table(src["sfDir"], src["tableName"],
                        columns=src.get("columns"))
        since = pd.Timestamp(src["since"])
        until = pd.Timestamp(src["until"]) if src.get("until") else None
        created = src.get("createdColumn")
        changed = src.get("changedColumn")
        if new_only:
            detected = detect_changed_records(ds, created, since, until=until)
        elif created and changed:
            detected = classify_new_changed(ds, created, changed, since,
                                            until=until)
            if not src.get("includeNew", True):
                detected = detected.map_batches(
                    lambda t: t.filter(pc.equal(t["change_class"], "changed")),
                    batch_format="pyarrow")
        else:
            detected = detect_changed_records(ds, changed, since, until=until)
        action = item.get("action") or {}
        if action.get("performer"):
            detected = detected.map_batches(
                _resolve_callable(action["performer"]),
                batch_format="pyarrow")
        out_dir = src.get("outDir") or os.path.join(
            "/tmp", "etl_out", f"detected_{src['tableName']}")
        export_files(detected, out_dir, fmt=action.get("fmt", "parquet"))
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
        dst = _single_dst(item)
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
            _run_item(item, outputs, cfg.get("params"))
    elif ptype == "GENERIC_PROCESS":
        # the reference's problems-solver process: every operation MUST
        # supply a custom GenericProcessor class
        # (conf/types/EtlProcessType.java:17; the class-compatibility
        # validation at conf/EtlOperationConfig.java:613-618) — here the
        # item-level `processor` callable plays that role
        for item in cfg["etlConfiguration"]:
            if not item.get("processor"):
                raise ValueError(
                    "GENERIC_PROCESS items must name a `processor` "
                    "(module:callable) — the reference requires a "
                    "GenericProcessor subclass per operation")
            _run_item(item, outputs, cfg.get("params"))
    elif ptype in ("DB_QUICK_MERGE_WITH_DATABASE_GENERATION",
                   "DB_QUICK_MERGE_WITH_ENTITY_GENERATION", "DB_QUICK_MERGE"):
        _run_quick_merge(cfg, outputs)
    elif ptype in ("LOAD", "QUICK_LOAD", "DB_QUICK_LOAD"):
        _run_load(cfg, outputs)
    elif ptype == "DB_MERGE_FROM_JSON":
        _run_merge_from_json(cfg, outputs)
    elif ptype == "DB_RE_SYNC":
        _run_re_sync(cfg, outputs)
    elif ptype in ("TRANSPORT", "TRANSPORT_SYNC_FILES"):
        _run_transport(cfg, outputs)
    elif ptype == "RESOLVE_CONFLICTS_IN_STAGE_AREA":
        _run_resolve_conflicts(cfg, outputs)
    elif ptype == "DETECT_GAPES_ON_DB_TABLES":
        _run_detect_gaps(cfg, outputs)
    elif ptype == "DB_INCONSISTENCY_CHECK":
        _run_inconsistency_check(cfg, outputs)
    elif ptype in ("CHANGED_RECORDS_DETECTOR", "DETECT_CHANGED_RECORDS"):
        _run_detector(cfg, outputs, new_only=False)
    elif ptype in ("NEW_RECORDS_DETECTOR", "DETECT_NEW_RECORDS"):
        _run_detector(cfg, outputs, new_only=True)
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
        if path and not os.path.isabs(child_path):
            # relative to the PARENT CONFIG's directory, not the process
            # CWD (the reference resolves child configs beside the parent)
            child_path = os.path.join(os.path.dirname(path), child_path)
        outputs.update(run_config(
            child_path, _seen | ({path} if path else frozenset())))
    return outputs
