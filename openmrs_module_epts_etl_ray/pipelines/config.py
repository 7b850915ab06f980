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


def run_config(cfg: dict | str) -> dict[str, str]:
    """Run a process config; returns {dst tableName: output dir}. The write
    is partitioned parquet/csv/json via the export sinks (resumable layout).
    """
    if isinstance(cfg, str):
        with open(cfg) as fh:
            cfg = json.load(fh)
    if cfg.get("processType", "etl") != "etl":
        raise ValueError(f"unsupported processType {cfg.get('processType')!r}")

    from .export import export_files

    outputs: dict[str, str] = {}
    for item in cfg["etlConfiguration"]:
        src = item["srcConf"]
        ds = read_table(src["sfDir"], src["tableName"],
                        columns=src.get("columns"))
        cond = src.get("extraConditionForExtract")
        if cond:
            ds = ds.map_batches(_ConditionFilter,
                                fn_constructor_kwargs=dict(cond=cond),
                                batch_format="pyarrow", concurrency=(1, 8))
        for dst in item["dstConf"]:
            out = apply_transform(ds, _compile_mapping(dst["mapping"]))
            out_dir = dst.get("outDir") or os.path.join(
                "/tmp", "etl_out", dst["tableName"])
            export_files(out, out_dir, fmt=dst.get("dstType", "parquet"))
            outputs[dst["tableName"]] = out_dir
    return outputs
