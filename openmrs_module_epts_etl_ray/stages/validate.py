"""Event validation + dead-letter channel (reference error documentation).

``Engine.java:596-602`` documents failing records into ``etl_record_error``
with the exception text; inconsistent rows land in ``inconsistence_info``
(``ProcessController.java:1012-1045``). Ray-native: a stateless validator
splits each batch; good rows flow on, bad rows are appended a ``reason`` and
written as a side-channel parquet under ``<dir>/errors-<lsn_lo>-<lsn_hi>-<n>-
<fingerprint>.parquet`` — deterministic names make retried tasks idempotent
(same block → same file, overwritten with identical bytes).

Validation rules for the CDC event schema (FIXTURES F2):
- ``lsn`` non-null and >= 0 (the total order must exist);
- ``op`` in {insert, update, delete};
- key columns non-null;
- ``content`` must be null for deletes and non-null otherwise.
"""
from __future__ import annotations

import hashlib
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

REASON_COL = "_reason"
RETRY_COL = "_retry_count"


def _reasons(t: pa.Table, key_cols: tuple[str, ...]) -> pa.Array:
    n = len(t)
    reason = pa.nulls(n, pa.string())

    def tag(mask, why):
        nonlocal reason
        mask = pc.fill_null(mask, True)
        reason = pc.if_else(pc.and_kleene(pc.is_null(reason), mask),
                            pa.scalar(why), reason)

    tag(pc.or_kleene(pc.is_null(t["lsn"]), pc.less(t["lsn"], 0)), "bad_lsn")
    tag(pc.invert(pc.is_in(t["op"], value_set=pa.array(
        ["insert", "update", "delete"]))), "bad_op")
    for k in key_cols:
        tag(pc.is_null(t[k]), f"null_key:{k}")
    if "content" in t.column_names:
        is_del = pc.equal(t["op"], "delete")
        tag(pc.and_kleene(pc.fill_null(is_del, False), pc.is_valid(t["content"])),
            "delete_with_content")
        tag(pc.and_kleene(pc.invert(pc.fill_null(is_del, False)),
                          pc.is_null(t["content"])), "null_content")
    return reason


class Validator:
    """``map_batches`` stage: passes valid rows through; writes invalid rows
    (with ``_reason``) to the dead-letter directory."""

    def __init__(self, dead_letter_dir: str | None = None,
                 key_cols: tuple[str, ...] = ("repo", "path")):
        self.dir = dead_letter_dir
        self.key_cols = tuple(key_cols)
        if self.dir:
            os.makedirs(self.dir, exist_ok=True)

    def __call__(self, t: pa.Table) -> pa.Table:
        if len(t) == 0:
            return t
        reason = _reasons(t, self.key_cols)
        bad_mask = pc.is_valid(reason)
        n_bad = pc.sum(pc.cast(bad_mask, pa.int64())).as_py() or 0
        if n_bad == 0:
            return t
        if self.dir:
            bad = t.filter(bad_mask).append_column(
                REASON_COL, reason.filter(bad_mask))
            lsns = bad["lsn"].to_pylist()
            lo = min((x for x in lsns if x is not None), default=-1)
            hi = max((x for x in lsns if x is not None), default=-1)
            # content digest over the full bad rows: distinct blocks with
            # coincidentally equal (lo, hi, n, reasons) must NOT collide —
            # a collision overwrites another block's error records
            h = hashlib.sha256()
            for col in bad.column_names:
                h.update(repr(bad[col].to_pylist()).encode())
            fp = h.hexdigest()[:16]
            path = os.path.join(self.dir, f"errors-{lo}-{hi}-{len(bad)}-{fp}.parquet")
            tmp = path + ".tmp"
            pq.write_table(bad, tmp)
            os.replace(tmp, path)
        return t.filter(pc.invert(bad_mask))


def read_dead_letters(dead_letter_dir: str) -> pa.Table:
    files = [os.path.join(dead_letter_dir, f)
             for f in sorted(os.listdir(dead_letter_dir))
             if f.endswith(".parquet")]
    if not files:
        return pa.table({})
    return pa.concat_tables([pq.read_table(f) for f in files],
                            promote_options="default")


def table_checksum(
    ds,
    cols: list[str],
    *,
    num_buckets: int = 16,
) -> "rd.Dataset":
    """Order-independent bucketed content checksum — the replica-comparison
    primitive (pt-table-checksum shape): two tables are content-equal iff
    every bucket's (n_rows, checksum) matches, and a mismatch narrows the
    diff to one bucket without moving any rows.  Used after a replay to
    cheaply compare source and destination at 10^10 rows: only
    ``num_buckets`` tiny rows ever leave the workers.

    Per row: sha256 over the '|'-joined column values (nulls -> '\\0'
    sentinel); the first hex char routes the bucket, the next 12 hex chars
    parse as an int48 summand.  Addition is commutative, so the result is
    independent of block count, ordering, and partitioning — and every
    step (string concat, sha256, hex-digit arithmetic, SUM) is exactly
    expressible in SQL, making the checksum portable across engines."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray.data as rd

    from ..functions.hashing import sha256_hex

    def partial(t: pa.Table) -> pa.Table:
        parts = [pc.fill_null(pc.cast(t[c], pa.string()), "\x00")
                 for c in cols]
        joined = parts[0] if len(parts) == 1 else \
            pc.binary_join_element_wise(*parts, "|")
        sha = sha256_hex(joined)
        if isinstance(sha, pa.ChunkedArray):
            sha = sha.combine_chunks()
        # ascii hex chars of the first 8 digits, vectorized parse
        head = pc.utf8_slice_codeunits(sha, 0, 8)
        if isinstance(head, pa.ChunkedArray):
            head = head.combine_chunks()
        buf = np.frombuffer(head.buffers()[2], np.uint8,
                            count=8 * len(t)).reshape(len(t), 8) \
            if len(t) else np.zeros((0, 8), np.uint8)
        dig = np.where(buf > 57, buf - 87, buf - 48).astype(np.int64)
        bucket = dig[:, 0] % num_buckets
        w = (16 ** np.arange(6, -1, -1)).astype(np.int64)
        val = dig[:, 1:] @ w
        df = pd.DataFrame({"bucket": bucket, "n_rows": 1, "checksum": val})
        agg = df.groupby("bucket", as_index=False).sum()
        for c in ["n_rows", "checksum"]:
            agg[c] = agg[c].astype("int64")
        return pa.Table.from_pandas(agg, preserve_index=False)

    from .pivot import bucketed_sum

    return bucketed_sum(ds.map_batches(partial, batch_format="pyarrow"),
                        ["bucket"], ["n_rows", "checksum"])
