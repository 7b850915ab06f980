"""Per-partition lineage records (FIXTURES.md F7).

Mirrors the reference's ``table_operation_progress_info`` row
(``controller/ProcessController.java:911-947``) and the per-record
``conflict_resolution_type`` stage column
(``conf/interfaces/TableConfiguration.java:2354-2380``), rolled up to one row
per partition per run: offset range, rows applied, conflict outcome counts,
and a content fingerprint of the resulting partition state.
"""
from __future__ import annotations

import hashlib

import pyarrow as pa

LINEAGE_SCHEMA = pa.schema(
    [
        ("partition_id", pa.int64()),
        ("lsn_lo", pa.int64()),
        ("lsn_hi", pa.int64()),
        ("events_seen", pa.int64()),
        ("rows_applied", pa.int64()),      # inserted + updated
        ("inserted", pa.int64()),
        ("updated", pa.int64()),           # reference: UPDATED_EXISTING
        ("kept_existing", pa.int64()),     # reference: KEPT_EXISTING (stale/replay)
        ("tombstones", pa.int64()),        # deletes applied
        ("state_rows", pa.int64()),
        ("state_sha", pa.string()),        # fingerprint of partition content
        ("committed", pa.bool_()),         # False when the commit already existed (replay)
    ]
)


def state_fingerprint(shas) -> str:
    """Order-insensitive sha256 fingerprint of a partition's content hashes."""
    h = hashlib.sha256()
    for s in sorted(x for x in shas if x is not None):
        h.update(s.encode())
    return h.hexdigest()


def lineage_row(**kw) -> pa.Table:
    row = {f.name: [kw.get(f.name)] for f in LINEAGE_SCHEMA}
    return pa.table(row, schema=LINEAGE_SCHEMA)
