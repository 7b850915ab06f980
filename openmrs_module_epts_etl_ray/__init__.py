"""openmrs_module_epts_etl_ray — a Ray-Data-native CDC / incremental-ingest engine.

A from-scratch reimplementation of the data-processing capabilities of the
epts-etl table-sync module (reference: milton-mufume/openmrs-module-epts-etl,
studied in SURVEY.md) on top of ``ray.data.Dataset``:

- change-event log (insert/update/delete keyed by ``(repo, path)``, monotone
  LSN) replayed into a partitioned Parquet lake via hash-partitioned,
  LSN-ordered last-writer-wins upserts (the reference's
  merge-existing-record / conflict-resolution semantics,
  ``model/EtlDatabaseObject.java:614-726``);
- Arrow schema unification with null-backfill for schema evolution (replacing
  the reference's DDL auto-generation, ``conf/interfaces/TableConfiguration.java:2239-2463``);
- idempotent commit-log sink + per-partition lineage/checkpoint records for
  exactly-once, resumable replay (reference:
  ``engine/record_intervals_manager/ThreadRecordIntervalsManager.java``);
- the reference's relational operator surface (fields-mapping transforms,
  joins/anti-joins, detectors, reconciliation, gap detection) re-expressed as
  Ray Data pipelines; plus large-scale training-data operators (dedup,
  similarity search, text analysis, multimodal plumbing).

Library code never calls ``ray.init()`` — sessions are owned by the caller
(bench.py, CLI, test fixture, or the evaluation driver).
"""

__version__ = "0.1.0"

KEY_COLS = ("repo", "path")
LSN_COL = "lsn"
OP_COL = "op"

# Canonical CDC payload schema (BASELINE.json input_hint + FIXTURES.md F2).
EVENT_COLUMNS = ("lsn", "op", "repo", "path", "commit", "lang", "content")
