"""Distributed prefix scan (running aggregate over a global order).

An operator class Ray Data lacks natively: ``running_max`` computes, for
every row, the max of ``value_col`` over all rows at-or-before it in
``order_cols`` order — the event-time WATERMARK of a streaming system
(late-event detection: a row whose value lags the running max by more than
the allowed lateness arrived late; reference analogue: the stage-area
observation-date ordering that decides stale updates,
``model/EtlDatabaseObject.java:677-714``).

Shape (three streaming passes, nothing large ever driver-side or pinned):

1. Bounds + pass A run on a two-column PROJECTION of the input pipeline
   (order axis + value) — the full dataset is never materialized; the
   upstream lineage re-executes per pass, which streams with backpressure.
   Pinning the whole bucketed input in the object store (the pre-round-4
   shape) would spill-storm at 100 TB.
2. Pass A: per-block partial (bucket, fold, n-non-null) triples — tiny
   (#blocks x buckets-per-block rows) — folded into per-bucket values, then
   an EXCLUSIVE prefix fold over bucket order gives each bucket's carry-in.
   Only O(num_buckets) values touch the driver.
3. Pass B: bucketize the full input (range partition = affine map of the
   order value, the layout ``stages/gap_detect.py`` uses for boundary
   stitching), one groupby(bucket) cogroup; inside each bucket a vectorized
   Arrow sort + ufunc ``.accumulate`` merged with the carry-in.

Null semantics match SQL window aggregates (``SUM(x) OVER (ORDER BY ...
ROWS UNBOUNDED PRECEDING)``): null values are SKIPPED by the fold — a row
with a null value still gets the running aggregate of the non-null values
at-or-before it — and the output is NULL only while no non-null value has
been seen yet. The ORDER columns themselves must be non-null (SQL would
sort them NULLS LAST; we raise instead of silently mis-bucketing).

Partitioning assumption: with the default ``balance="range"`` the primary
order column should distribute roughly uniformly over its range (ids /
timestamps do); for a skewed axis pass ``balance="quantile"`` — one extra
sampling pass over the two-column projection picks boundaries from the
data's quantiles, and bucket assignment never changes the scan's RESULT
(any contiguous range partition yields the same prefix aggregate), only
its balance.

Determinism contract: the input pipeline re-executes once per pass (the
price of not pinning it in the object store), so its lineage must be
deterministic; callers with a nondeterministic upstream (unseeded RNG,
``random_sample``, arrival-order-dependent ids) must ``materialize()``
the input themselves before scanning.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

_RB = "_range_bucket"
_SENT = "_scan_sentinel"


def _num_buckets() -> int:
    try:
        return max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        return 8


def _order_ints(col: "pa.ChunkedArray") -> np.ndarray:
    """Order axis -> int64 (timestamps via epoch ns). Raises on nulls."""
    if col.null_count:
        raise ValueError(
            "running scan: the primary order column contains nulls; "
            "a null order key has no position in the scan order")
    a = col.to_numpy(zero_copy_only=False)
    if np.issubdtype(a.dtype, np.datetime64):
        a = a.astype("datetime64[ns]")
    return a.astype(np.int64)


def _running_scan(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str,
    num_buckets: int | None,
    block_fold: str,          # pandas groupby agg name for pass-A partials
    py_fold,                  # fold two partials (python scalars)
    accumulate,               # np ufunc .accumulate for within-bucket scan
    apply_carry,              # (scanned ndarray, carry scalar) -> ndarray
    null_fill,                # (values ChunkedArray, carry|None) -> fill scalar
    balance: str = "range",   # 'range' (affine, zero extra passes) or
                              # 'quantile' (sampled boundaries, skew-robust)
    materialize: bool = False,
) -> rd.Dataset:
    from ray.data.aggregate import Count, Max, Min

    if balance not in ("range", "quantile"):
        # validate BEFORE any pipeline execution: a typo must not cost a
        # full upstream pass (or hide behind an empty input) first
        raise ValueError(f"balance={balance!r} (want 'range'|'quantile')")
    nb = num_buckets or _num_buckets()
    primary = order_cols[0]
    if materialize:
        # opt-in for callers whose upstream lineage is NOT deterministic
        # (unseeded RNG, random_sample, arrival-order ids): pin the input
        # once so the three passes see the same rows. Off by default — at
        # 100 TB the pin is an object-store spill storm, and deterministic
        # lineages (the common case) don't need it.
        ds = ds.materialize()

    def _empty_result() -> rd.Dataset:
        # empty input: keep the schema contract (out_col present, 0 rows)
        return ds.map_batches(
            lambda df: df.assign(**{out_col: df[value_col]}),
            batch_format="pandas")

    # Boundary discovery and pass A consume only (order axis, value): run
    # them on a column slice of the pipeline so the full input is never
    # pinned.
    # DETERMINISM CONTRACT: the upstream lineage re-executes once per pass
    # (boundaries, pass A, pass B) — it must be deterministic, or pass A's
    # carry-ins would describe a different execution than pass B's rows.
    # A nondeterministic upstream (unseeded RNG, random_sample, arrival-
    # order-dependent ids) must be materialize()d by the CALLER first.
    slim = ds.select_columns(list(dict.fromkeys([primary, value_col])))

    if balance == "quantile":
        # skewed order axis: equal-WIDTH ranges would concentrate most
        # rows in a few buckets, making pass B's per-bucket cogroup a
        # straggler. The boundary pass collects a deterministic per-block
        # sample (every ceil(n/64)-th value of the sorted block; blocks
        # arrive whole because batch_size=None is the map_batches default)
        # and the merged sample's nb-quantiles become the bucket
        # boundaries. This pass REPLACES the range mode's Min/Max
        # aggregate (it also raises on null order keys via _order_ints and
        # detects emptiness), so both modes cost three passes total.
        # Bucket ASSIGNMENT only affects balance, never the scan result
        # (any contiguous range partition yields the same prefix
        # aggregate), so an approximate sample is safe.
        def sample(t: pa.Table) -> pd.DataFrame:
            p = np.sort(_order_ints(t[primary]))
            step = max(1, -(-len(p) // 64))
            return pd.DataFrame({"s": p[::step]})

        def resample(t: pa.Table) -> pd.DataFrame:
            p = np.sort(t["s"].to_numpy(zero_copy_only=False)
                        .astype(np.int64))
            step = max(1, -(-len(p) // 64))
            return pd.DataFrame({"s": p[::step]})

        # two-level sample: per-block samples are coalesced to nb blocks
        # (a shuffle of SAMPLE values only — ~64 int64s per input block)
        # and re-summarized, so the driver sees O(num_buckets) values, not
        # O(#blocks) — at 100 TB / 128 MB blocks the one-level collect
        # would drive ~800k blocks x 64 samples driver-side (ADVICE r4)
        samp = np.sort(np.array(
            [r["s"] for r in slim.map_batches(sample, batch_format="pyarrow")
                .repartition(nb)
                .map_batches(resample, batch_format="pyarrow")
                .take_all()],
            dtype=np.int64))
        if not len(samp):
            return _empty_result()
        qs = np.quantile(samp, np.linspace(0, 1, nb + 1)[1:-1],
                         method="nearest").astype(np.int64) \
            if len(samp) > 1 else np.array([], dtype=np.int64)
        qs = np.unique(qs)          # duplicate quantiles on heavy values

        def _buckets(t: pa.Table) -> np.ndarray:
            # side='right' keeps each bucket a contiguous half-open order
            # range: a row EQUAL to boundary qs[k] gets bucket k+1 (the
            # range starting AT the boundary), and equal primary values
            # always share a bucket
            return np.searchsorted(qs, _order_ints(t[primary]),
                                   side="right").astype(np.int64)
    else:
        bounds = slim.aggregate(Min(primary), Max(primary), Count())
        n_rows = int(bounds.get("count()", 0)) if bounds else 0
        if n_rows and bounds.get(f"min({primary})") is None:
            # rows exist but the order axis has no values at all — the
            # per-batch null guard in _order_ints never saw them because
            # the aggregate path runs first; fail the same way it would
            raise ValueError(
                f"running scan: the primary order column {primary!r} "
                f"contains nulls; a null order key has no position in "
                f"the scan order")
        if not n_rows:
            return _empty_result()

        def _as_int(v) -> int:
            # the primary order axis may be a timestamp: pandas Timestamp
            # / numpy datetime64 carry .value (epoch ns) — int() raises
            if hasattr(v, "value"):
                return int(v.value)
            if isinstance(v, np.datetime64):
                return int(v.astype("datetime64[ns]").astype(np.int64))
            return int(v)

        lo = _as_int(bounds[f"min({primary})"])
        hi = _as_int(bounds[f"max({primary})"])
        span = max(1, hi - lo + 1)
        width = max(1, -(-span // nb))  # ceil: divide-first avoids the
                                        # int64 overflow of (x-lo)*nb on
                                        # wide domains

        def _buckets(t: pa.Table) -> np.ndarray:
            return (_order_ints(t[primary]) - lo) // width

    # pass A: per-block (bucket, fold-of-non-null, n-non-null) partials.
    # Nulls are dropped BEFORE the fold (SQL aggregates skip them); Arrow
    # filter keeps int64 exact — a pandas NaN detour would promote to
    # float64 and round above 2^53.
    def partial(t: pa.Table) -> pd.DataFrame:
        b = _buckets(t)
        sub = pa.table({_RB: pa.array(b), "v": t[value_col]})
        sub = sub.filter(pc.is_valid(sub["v"]))
        df = sub.to_pandas()
        if not len(df):
            df["n"] = pd.Series(dtype="int64")
            return df[[_RB, "v", "n"]]
        return df.groupby(_RB, as_index=False).agg(
            v=("v", block_fold), n=("v", "size"))

    partials = slim.map_batches(partial, batch_format="pyarrow").take_all()

    fold_v: dict[int, object] = {}
    fold_n: dict[int, int] = {}
    for row in partials:
        b = int(row[_RB])
        fold_v[b] = row["v"] if b not in fold_v \
            else py_fold(fold_v[b], row["v"])
        fold_n[b] = fold_n.get(b, 0) + int(row["n"])
    # exclusive prefix fold for EVERY bucket index (a bucket whose values
    # are all null emits no partial but still needs its carry-in). The
    # third slot is the bucket's OWN pass-A non-null count: pass B
    # re-counts it and raises on mismatch — a cheap runtime enforcement of
    # the determinism contract (a nondeterministic upstream whose pass-B
    # execution differs from pass A's is caught instead of silently
    # producing prefix aggregates of a phantom execution; ADVICE r4).
    carry: dict[int, tuple] = {}
    run_v, run_n = None, 0
    for b in range(nb + 1):
        carry[b] = (run_v, run_n, fold_n.get(b, 0))
        if b in fold_v:
            run_v = fold_v[b] if run_v is None else py_fold(run_v, fold_v[b])
            run_n += fold_n[b]
    carry_ref = ray.put(carry)

    def add_bucket(t: pa.Table) -> pa.Table:
        t = t.append_column(_RB, pa.array(_buckets(t)))
        return t.append_column(
            _SENT, pa.array(np.zeros(len(t), dtype=np.bool_)))

    # One all-null sentinel row per bucket id, unioned into pass B: every
    # bucket — including one whose rows VANISH entirely under a
    # nondeterministic upstream — is then guaranteed a pass-B group, so
    # the pass-A/pass-B count cross-check below always runs. Without the
    # sentinels a vanished bucket produces no group, skips the check, and
    # leaks its phantom pass-A fold into later buckets' carry-ins. Cost:
    # nb+1 rows and one bool column — nothing at any scale.
    # Sentinel data columns copy the probe batch's types (Arrow-native
    # pipelines — every parquet read — give the true schema, so the
    # union is schema-identical). A column the 1-row probe inferred as
    # null (a pandas block whose first value is NaN) stays NULL-typed:
    # the groupby merge promotes null to the real type, so only the
    # NAMES must be right.
    def make_sent(t: pa.Table) -> pa.Table:
        k = (nb + 1) if len(t) else 0
        s = pa.table({n: pa.nulls(k, type=t.schema.field(n).type)
                      for n in t.schema.names})
        s = s.append_column(_RB, pa.array(np.arange(k, dtype=np.int64)))
        return s.append_column(_SENT, pa.array(np.ones(k, dtype=np.bool_)))

    sent_ds = ds.limit(1).map_batches(make_sent, batch_format="pyarrow")

    def scan_bucket(t: pa.Table) -> pa.Table:
        cmap = ray.get(carry_ref)
        bkt = int(t[_RB][0].as_py())
        cin_v, cin_n, own_n = cmap.get(bkt, (None, 0, 0))
        t = t.filter(pc.invert(t[_SENT])).drop_columns([_SENT])
        t = t.take(pc.sort_indices(
            t, sort_keys=[(c, "ascending") for c in order_cols]))
        v = t[value_col]
        valid = pc.is_valid(v).to_numpy(zero_copy_only=False)
        if int(valid.sum()) != own_n:
            raise RuntimeError(
                f"running scan: bucket {bkt} saw "
                f"{int(valid.sum())} non-null values in pass B but "
                f"{own_n} in pass A — the input lineage is not "
                f"deterministic across passes; materialize() the input "
                f"(pass materialize=True) before scanning")
        body = t.drop_columns([_RB])
        if not len(t):
            # sentinel-only group: an id with no data rows (sparse bucket
            # range, or a trailing quantile bucket) — emit nothing
            return body.append_column(out_col, pa.nulls(0, type=v.type))
        if cin_v is None and not valid.any():
            # leading all-null bucket: no value seen yet anywhere
            return body.append_column(out_col, pa.nulls(len(t), type=v.type))
        filled = pc.fill_null(v, null_fill(v, cin_v)) \
            .to_numpy(zero_copy_only=False)
        out = accumulate(filled)
        if cin_v is not None:
            out = apply_carry(out, np.asarray(cin_v, dtype=out.dtype))
        mask = (np.cumsum(valid.astype(np.int64)) + cin_n) == 0
        if mask.any():
            out = out.copy()
            out[mask] = np.zeros(1, out.dtype)[0]  # zero data under null
            # slots — DuckDB's .arrow() zeroes masked buffers, and hash
            # comparisons read them (the asof lesson, stages/asof.py)
            arr = pa.array(out, mask=mask)
        else:
            arr = pa.array(out)
        return body.append_column(out_col, arr.cast(v.type))

    return (ds.map_batches(add_bucket, batch_format="pyarrow")
              .union(sent_ds)
              .groupby(_RB).map_groups(scan_bucket, batch_format="pyarrow"))


def running_max(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str = "running_max",
    num_buckets: int | None = None,
    balance: str = "range",
    materialize: bool = False,
) -> rd.Dataset:
    """Append ``out_col`` = max of ``value_col`` over all non-null values
    at-or-before each row in ``order_cols`` order (inclusive); NULL until
    the first non-null value. ``order_cols[0]`` must be integer-like or a
    timestamp (the range-partition axis) and non-null; the remaining
    columns only break ties. ``balance='quantile'`` spends one extra
    sampling pass to pick skew-robust bucket boundaries.
    ``materialize=True`` pins the input for nondeterministic upstreams
    (see the module determinism contract; mismatches raise either way)."""
    return _running_scan(
        ds, order_cols, value_col, out_col=out_col, num_buckets=num_buckets,
        balance=balance, materialize=materialize,
        block_fold="max", py_fold=max,
        accumulate=np.maximum.accumulate, apply_carry=np.maximum,
        # nulls must not raise the running max: fill with the carry-in when
        # one exists (rows before the bucket's first value read as carry),
        # else the bucket's own min (those rows are masked NULL anyway)
        null_fill=lambda v, cin: cin if cin is not None else pc.min(v))


def running_sum(
    ds: rd.Dataset,
    order_cols: list[str],
    value_col: str,
    *,
    out_col: str = "running_sum",
    num_buckets: int | None = None,
    balance: str = "range",
    materialize: bool = False,
) -> rd.Dataset:
    """Inclusive prefix sum in ``order_cols`` order; null values add zero
    (SQL ``SUM OVER`` skips them) and the output is NULL until the first
    non-null value. Use an INTEGER value column: float addition is
    non-associative, so a bucketed scan's summation tree would drift from
    a sequential oracle in the last ulp. ``balance='quantile'`` spends one
    extra sampling pass to pick skew-robust bucket boundaries.
    ``materialize=True`` pins the input for nondeterministic upstreams
    (see the module determinism contract; mismatches raise either way)."""
    return _running_scan(
        ds, order_cols, value_col, out_col=out_col, num_buckets=num_buckets,
        balance=balance, materialize=materialize,
        block_fold="sum", py_fold=lambda a, b: a + b,
        accumulate=np.cumsum, apply_carry=lambda out, c: out + c,
        null_fill=lambda v, cin: 0)
