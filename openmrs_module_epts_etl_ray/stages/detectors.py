"""Change detection & reconciliation operators (SURVEY §2.9, §2.11, §3.3).

- Changed/new-records detection: the reference's query-based CDC — timestamp
  predicates over monitored tables
  (``changedrecordsdetector/model/ChangedRecordsDetectorSearchParams.java:43-68``)
  → a vectorized predicate filter here.
- Reconciliation: MISSING / OUTDATED / PHANTOM record detection
  (``reconciliation/processor/CentralAndRemoteDataReconciliationProcessor.java:30-116``,
  reasons ``ConciliationReasonType.java:4-8``) — a full-outer diff of source
  vs destination classified per key, expressed as a bucket-cogrouped compare
  so both sides shuffle once on the same key.
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import BUCKET_COL, add_bucket

SRC_TAG, DST_TAG = "src", "dst"
SIDE_COL = "_side"


def detect_changed_records(ds: rd.Dataset, ts_col: str, since, *, until=None) -> rd.Dataset:
    """Rows whose observation timestamp falls in [since, until) — the
    reference's ``date_changed >= syncStartDate`` scan."""
    def pred(t: pa.Table) -> pa.Table:
        mask = pc.greater_equal(t[ts_col], pa.scalar(since))
        if until is not None:
            mask = pc.and_(mask, pc.less(t[ts_col], pa.scalar(until)))
        return t.filter(mask)
    return ds.map_batches(pred, batch_format="pyarrow", zero_copy_batch=True)


def classify_new_changed(
    ds: rd.Dataset, created_col: str, changed_col: str, since,
    *, until=None, class_col: str = "change_class",
) -> rd.Dataset:
    """Reference NEW vs CHANGED records detector semantics
    (``ChangedRecordsDetectorSearchParams.java:43-68``): NEW when
    ``created`` in [since, until); CHANGED when ``created < since`` and
    ``changed`` in [since, until); everything else is unchanged and
    dropped (``until=None`` leaves the window open-ended)."""
    def fn(t: pa.Table) -> pa.Table:
        s = pa.scalar(since)
        is_new = pc.greater_equal(t[created_col], s)
        is_changed = pc.and_(pc.less(t[created_col], s),
                             pc.greater_equal(t[changed_col], s))
        if until is not None:
            u = pa.scalar(until)
            is_new = pc.and_(is_new, pc.less(t[created_col], u))
            is_changed = pc.and_(is_changed, pc.less(t[changed_col], u))
        cls = pc.if_else(is_new, "new", pc.if_else(is_changed, "changed", None))
        t = t.append_column(class_col, cls)
        return t.filter(pc.is_valid(t[class_col]))
    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def reconcile(
    src: rd.Dataset,
    dst: rd.Dataset,
    key_cols: list[str],
    compare_cols: list[str],
    *,
    num_buckets: int = 32,
) -> rd.Dataset:
    """Classify every key as missing (in src only), phantom (in dst only) or
    outdated (both, compare columns differ). Equal rows are dropped.

    Both sides are tagged, bucketed on the same key hash, and co-grouped —
    ONE shuffle for the whole three-way diff (the reference runs three
    separate DB scans). Output: key columns + ``reason``.
    """
    keys = list(key_cols)
    cols = keys + list(compare_cols)

    def tag(side):
        def fn(t: pa.Table) -> pa.Table:
            t = t.select(cols)
            t = t.append_column(SIDE_COL, pa.array([side] * len(t)))
            return add_bucket(t, tuple(keys), num_buckets)
        return fn

    tagged = src.map_batches(tag(SRC_TAG), batch_format="pyarrow").union(
        dst.map_batches(tag(DST_TAG), batch_format="pyarrow")
    )

    def classify(group: pd.DataFrame) -> pd.DataFrame:
        g = group.drop(columns=[BUCKET_COL])
        s = g[g[SIDE_COL] == SRC_TAG].drop(columns=[SIDE_COL])
        d = g[g[SIDE_COL] == DST_TAG].drop(columns=[SIDE_COL])
        m = s.merge(d, on=keys, how="outer", suffixes=("_src", "_dst"), indicator=True)
        missing = m[m["_merge"] == "left_only"][keys].assign(reason="missing")
        phantom = m[m["_merge"] == "right_only"][keys].assign(reason="phantom")
        both = m[m["_merge"] == "both"]
        if len(both) and compare_cols:
            diff_mask = False
            for c in compare_cols:
                a, b = both[f"{c}_src"], both[f"{c}_dst"]
                # null-aware: NaN != NaN is True in pandas, which would flag
                # identical both-null rows as outdated
                diff_mask = diff_mask | ((a != b) & ~(a.isna() & b.isna()))
            outdated = both[diff_mask][keys].assign(reason="outdated")
        else:
            outdated = both.iloc[0:0][keys].assign(reason="outdated")
        return pd.concat([missing, phantom, outdated], ignore_index=True)

    return tagged.groupby(BUCKET_COL).map_groups(classify, batch_format="pandas")


def reconciliation_plan(
    src: rd.Dataset,
    dst: rd.Dataset,
    key_cols: list[str],
    compare_cols: list[str],
    *,
    num_partitions: int | None = None,
) -> rd.Dataset:
    """Corrective-action plan converging ``dst`` onto ``src`` — the
    reference's data-reconciliation process (missing-in-destination ->
    INSERT, payload drift -> UPDATE, phantom destination row -> DELETE;
    ``SURVEY.md §2.9``).  A thin relabeling of :func:`reconcile` (same
    one-shuffle three-way diff, same null-aware comparison): missing ->
    insert, outdated -> update, phantom -> delete.  Keys present and equal
    on both sides emit no action.  Output: key cols + ``action`` — feed it
    to ``replay`` / ``quick_merge`` as the corrective event stream."""
    verdicts = reconcile(src, dst, key_cols, compare_cols,
                         num_buckets=num_partitions or 32)
    mapping = {"missing": "insert", "outdated": "update",
               "phantom": "delete"}

    def relabel(df: pd.DataFrame) -> pd.DataFrame:
        out = df[list(key_cols)].copy()
        out["action"] = df["reason"].map(mapping)
        return out

    return verdicts.map_batches(relabel, batch_format="pandas")
