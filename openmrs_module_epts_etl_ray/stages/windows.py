"""Tumbling-window aggregation over an event-time column.

The reference is batch-only; its closest construct is the timestamp-window
re-detection scan (``ChangedRecordsDetectorSearchParams.java:43-68``, re-run
per window). Ray Data has no event-time windowing either, so windows are
expressed the engine-native way (ray_guide: streaming-shaped workloads):
assign each row its window start vectorized, pre-aggregate per batch, then
one small ``groupby`` over the partials — the window column is just another
group key, and late data lands in its window on the next run because the
assignment is a pure function of event time (no watermark needed for
replayed batch windows).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd


def tumbling_window_agg(
    ds: rd.Dataset,
    ts_col: str,
    *,
    every: str = "1D",
    key_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    window_col: str = "window_start",
) -> rd.Dataset:
    """Count + sums per (window, *key_cols); ``every`` is a pandas offset
    alias (e.g. '1D', '1h'). Partial-aggregates inside map_batches so the
    shuffle moves one row per (window, key) per block."""
    key_cols = list(key_cols or [])
    sum_cols = list(sum_cols or [])
    delta = pd.Timedelta(every)

    def partial(t: pa.Table) -> pa.Table:
        # declared pyarrow: the fused UDF's DECLARED batch format picks the
        # aggregate combine path; pandas-declared hits the per-group Python
        # loop even with an Arrow return (see text.py df_partial)
        df = t.to_pandas()
        w = df[ts_col].dt.floor(delta)
        g = df.assign(**{window_col: w}).groupby(
            [window_col] + key_cols, as_index=False)
        agg = g.agg(n=(ts_col, "size"),
                    **{f"sum_{c}": (c, "sum") for c in sum_cols})
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    aggs = [Sum("n", alias_name="n")] + [
        Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols]
    out = partials.groupby([window_col] + key_cols).aggregate(*aggs)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {window_col: t[window_col]}
        for k in key_cols:
            cols[k] = t[k]
        cols["n"] = pc.cast(t["n"], pa.int64())
        for c in sum_cols:
            cols[f"sum_{c}"] = t[f"sum_{c}"]
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def hopping_window_agg(
    ds: rd.Dataset,
    ts_col: str,
    *,
    window: str = "3D",
    hop: str = "1D",
    key_cols: list[str] | None = None,
    sum_cols: list[str] | None = None,
    window_col: str = "window_start",
) -> rd.Dataset:
    """Hopping (sliding) windows: every row belongs to ``window/hop``
    overlapping windows. Assignment is vectorized row replication inside
    ``map_batches`` (np.repeat over the hop multiples) followed by the SAME
    partial-agg + small-groupby shape as tumbling — the fan-out factor is
    window/hop, paid on pre-aggregated partials, never on the exchange."""
    key_cols = list(key_cols or [])
    sum_cols = list(sum_cols or [])
    w = pd.Timedelta(window)
    h = pd.Timedelta(hop)
    k = int(w / h)
    if k * h != w:
        raise ValueError("window must be an integer multiple of hop")

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()  # declared pyarrow — see tumbling partial
        base = df[ts_col].dt.floor(h)
        n = len(df)
        rep = df.iloc[np.repeat(np.arange(n), k)].reset_index(drop=True)
        offs = np.tile(np.arange(k), n)
        rep[window_col] = (base.to_numpy().repeat(k)
                           - offs * h.to_timedelta64())
        g = rep.groupby([window_col] + key_cols, as_index=False)
        agg = g.agg(n=(ts_col, "size"),
                    **{f"sum_{c}": (c, "sum") for c in sum_cols})
        return pa.Table.from_pandas(agg, preserve_index=False)

    partials = ds.map_batches(partial, batch_format="pyarrow")

    from ray.data.aggregate import Sum

    aggs = [Sum("n", alias_name="n")] + [
        Sum(f"sum_{c}", alias_name=f"sum_{c}") for c in sum_cols]
    out = partials.groupby([window_col] + key_cols).aggregate(*aggs)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        cols = {window_col: t[window_col]}
        for kc in key_cols:
            cols[kc] = t[kc]
        cols["n"] = pc.cast(t["n"], pa.int64())
        for c in sum_cols:
            cols[f"sum_{c}"] = t[f"sum_{c}"]
        return pa.table(cols)

    return out.map_batches(finish, batch_format="pyarrow")


def session_windows(
    ds: rd.Dataset,
    ts_col: str,
    key_col: str,
    *,
    gap: str = "30min",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Session windows: per key, consecutive events closer than ``gap``
    belong to one session. Bucketed cogroup by key (one shuffle, same
    partitioning contract as the as-of join: a key's events co-locate);
    inside a bucket the sessionization is fully vectorized — sort by
    (key, ts), new-session flag where the gap exceeds, per-key cumsum
    numbers sessions 1..n in ts order (matching the SQL lag + running-sum
    restatement). Emits one row per session: key, session_id, start, end,
    n_events."""
    from ..functions.hashing import BUCKET_COL, add_bucket

    if num_buckets is None:
        try:
            import ray
            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 16)))
        except Exception:
            num_buckets = 16
    g = pd.Timedelta(gap)

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, (key_col,), num_buckets)

    def sessionize(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values([key_col, ts_col], kind="stable")
        same_key = df[key_col].to_numpy()[1:] == df[key_col].to_numpy()[:-1]
        dt = df[ts_col].diff().to_numpy()
        new_s = np.ones(len(df), dtype=np.int64)
        new_s[1:] = (~same_key) | (dt[1:] > g.to_timedelta64())
        # per-key session number: global cumsum restarted per key via the
        # first-row-of-key offset
        sid_global = np.cumsum(new_s)
        first_of_key = np.r_[True, ~same_key]
        key_base = np.maximum.accumulate(
            np.where(first_of_key, sid_global - 1, 0))
        df = df.assign(_sid=sid_global - key_base)
        out = df.groupby([key_col, "_sid"], as_index=False).agg(
            session_start=(ts_col, "min"),
            session_end=(ts_col, "max"),
            n_events=(ts_col, "size"))
        out["n_events"] = out["n_events"].astype("int64")
        return out.rename(columns={"_sid": "session_id"})

    return (ds.map_batches(tag, batch_format="pyarrow")
              .repartition(num_buckets)
              .groupby(BUCKET_COL)
              .map_groups(sessionize, batch_format="pandas"))


def grouped_percentiles(
    ds: rd.Dataset,
    key_cols: list[str],
    value_col: str,
    *,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> rd.Dataset:
    """Exact discrete per-group percentiles: element at index
    ``floor(q * (n - 1))`` of the group's sorted values — a self-defined
    rule stated identically in the oracle SQL (array_agg ORDER BY + index),
    so results are byte-exact, not interpolation-dependent.

    Partitioning contract: one group's values fit one task (true for
    per-category/per-tenant rollups; a single group at fact scale needs the
    sketch path — t-digest partials — which trades exactness for bounded
    memory; this operator is the exact small-group form)."""
    key_cols = list(key_cols)

    def pct(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy())
        n = len(v)
        row = {k: [g[k].iloc[0]] for k in key_cols}
        row["n"] = [np.int64(n)]
        for q in quantiles:
            row[f"p{round(q * 100)}"] = [v[int(np.floor(q * (n - 1)))]]
        return pd.DataFrame(row)

    return ds.groupby(key_cols).map_groups(pct, batch_format="pandas")


def grouped_percentiles_approx(
    ds: rd.Dataset,
    key_cols: list[str],
    value_col: str,
    *,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
    sketch_size: int = 1024,
) -> rd.Dataset:
    """Scale path of :func:`grouped_percentiles`: a MERGEABLE weighted
    order-statistic sketch, so no group ever needs its raw values in one
    task.

    Per batch: each group's values are sorted and compressed to at most
    ``sketch_size`` (value, weight) centroids at evenly spaced cumulative-
    weight positions. Partials merge per group (concat + re-compress) in a
    small groupby; the final quantile is the weighted order statistic of
    the merged sketch. Error is bounded by the per-compression rank step
    (~ total_weight / sketch_size per merge level — two levels here:
    batch, then group). The exchange moves ONLY sketches: O(groups x
    sketch_size), never raw values.
    """
    key_cols = list(key_cols)

    def compress(vals: np.ndarray, wts: np.ndarray, k: int):
        order = np.argsort(vals, kind="stable")
        v, w = vals[order], wts[order]
        if len(v) <= k:
            return v, w
        cw = np.cumsum(w)
        total = cw[-1]
        # k target cumulative-weight positions; sum weights between picks
        targets = (np.arange(1, k + 1) * (total / k))
        idx = np.searchsorted(cw, targets, side="left").clip(0, len(v) - 1)
        idx = np.unique(idx)
        out_v = v[idx]
        bounds = np.r_[0, cw[idx]]
        out_w = np.diff(bounds)
        return out_v, out_w

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for key, g in df.groupby(key_cols, sort=False):
            key = key if isinstance(key, tuple) else (key,)
            vals = g[value_col].to_numpy(dtype=np.float64)
            v, w = compress(vals, np.ones(len(vals)), sketch_size)
            rows.append({**dict(zip(key_cols, key)),
                         "_sv": v.tolist(), "_sw": w.tolist()})
        return pd.DataFrame(rows)

    partials = ds.map_batches(partial, batch_format="pandas")

    def merge(g: pd.DataFrame) -> pd.DataFrame:
        v = np.concatenate([np.asarray(x, dtype=np.float64) for x in g["_sv"]])
        w = np.concatenate([np.asarray(x, dtype=np.float64) for x in g["_sw"]])
        v, w = compress(v, w, sketch_size)
        cw = np.cumsum(w)
        total = cw[-1]
        row = {k: [g[k].iloc[0]] for k in key_cols}
        row["n"] = [np.int64(round(total))]
        for q in quantiles:
            i = int(np.searchsorted(cw, q * total, side="left"))
            row[f"p{int(q * 100)}"] = [v[min(i, len(v) - 1)]]
        return pd.DataFrame(row)

    return partials.groupby(key_cols).map_groups(merge, batch_format="pandas")


def grouped_topk(
    ds,
    key_cols: list[str],
    order_col: str,
    k: int,
    *,
    tiebreak_cols: list[str] | None = None,
    descending: bool = True,
):
    """Top-k rows per key group (heavy hitters — e.g. the reference's
    first/last record probes generalized per group, A5 /
    ``ds.sort().limit()`` made per-key).

    Scale shape: a per-BLOCK partial top-k first (each block contributes at
    most k rows per key it sees), so the groupby exchange moves
    O(blocks × keys_per_block × k) rows instead of the whole table; the
    final per-group top-k runs over those partials. Ties break
    deterministically on ``tiebreak_cols`` (ascending) so the result is
    run-to-run and oracle stable.
    """
    import numpy as np
    import pandas as pd
    from pandas.util import hash_pandas_object

    import ray

    keys = list(key_cols)
    tb = list(tiebreak_cols or [])
    by = [order_col] + tb
    asc = [not descending] + [True] * len(tb)
    try:
        n_coarse = 4 * max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        n_coarse = 32

    def topk(df: pd.DataFrame) -> pd.DataFrame:
        return (df.sort_values(by, ascending=asc, kind="stable")
                .groupby(keys, as_index=False, sort=False)
                .head(k))

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = topk(df)
        # coarse key-hash bucket: the final exchange groups on it (one
        # vectorized topk per coarse group) instead of on the raw keys
        # (which would invoke Python once per key)
        kv = (df[keys[0]] if len(keys) == 1
              else df[keys].astype(str).agg("|".join, axis=1))
        h = hash_pandas_object(kv, index=False).to_numpy()
        return df.assign(_kc=(h % np.uint64(n_coarse)).astype("int64"))

    return ds.map_batches(partial, batch_format="pandas") \
        .groupby("_kc").map_groups(
            lambda g: topk(g.drop(columns=["_kc"])), batch_format="pandas")


def lag_gaps(
    ds: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    order_cols: list[str] | None = None,
    out_col: str = "gap_us",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key LAG: append each row's distance (microseconds) to the SAME
    key's previous row in ``(ts, order_cols)`` order — inter-arrival gaps,
    "time since last event", dwell-time features. Each key's first row
    gets a NULL gap (SQL ``date_diff('microsecond', lag(ts) OVER
    (PARTITION BY key ORDER BY ts, …), ts)``).

    One shuffle: hash-bucket by key (a key's timeline co-locates — the
    same partitioning contract as the as-of join), then ONE vectorized
    sort + shifted-compare per bucket; no per-key Python. Null slots carry
    zeroed data bytes (explicit Arrow mask), so output is byte-canonical
    across engines.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import BUCKET_COL, add_bucket

    if num_buckets is None:
        try:
            import ray
            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 16)))
        except Exception:
            num_buckets = 16
    order_cols = order_cols or []

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, (key_col,), num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        keys = [(key_col, "ascending"), (ts_col, "ascending")] + \
            [(c, "ascending") for c in order_cols]
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        # normalize to us first: a ns-precision column cast straight to
        # int64 would emit nanosecond gaps
        ts = t[ts_col].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        kv = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        gap = np.zeros(len(t), np.int64)
        has_prev = np.zeros(len(t), bool)
        if len(t) > 1:
            same = kv[1:] == kv[:-1]
            gap[1:][same] = (ts[1:] - ts[:-1])[same]
            has_prev[1:] = same
        arr = pa.array(gap, pa.int64(), mask=~has_prev)
        return t.drop_columns([BUCKET_COL]).append_column(out_col, arr)

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL) \
             .map_groups(per_bucket, batch_format="pyarrow")


def grouped_shift(
    ds: rd.Dataset,
    *,
    key_cols: tuple[str, ...],
    order_cols: list[str],
    value_col: str,
    periods: int = 1,
    out_col: str = "lag",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Generic per-key LAG/LEAD: append the value ``periods`` rows back
    (``periods > 0``) or ahead (``< 0``) within the same key in
    ``order_cols`` order — SQL ``lag(value, p) OVER (PARTITION BY key
    ORDER BY …)``. Rows without a shifted partner get NULL (zeroed data
    bytes, byte-canonical). Same single hash-bucket exchange and
    one-lexsort-per-bucket contract as :func:`lag_gaps`, generalized to
    any column and offset (the period-over-period growth primitive)."""
    import pyarrow.compute as pc

    from ..functions.hashing import BUCKET_COL, add_bucket, key_codes

    if periods == 0:
        raise ValueError("periods must be non-zero")
    if num_buckets is None:
        try:
            import ray
            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 16)))
        except Exception:
            num_buckets = 16
    key_cols = tuple(key_cols)

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, key_cols, num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns([BUCKET_COL])
        codes, _ = key_codes(t, key_cols)
        order_vals = [t[c].combine_chunks().to_numpy(zero_copy_only=False)
                      for c in order_cols]
        order = np.lexsort(tuple(reversed(order_vals)) + (codes,))
        t = t.take(pa.array(order))
        codes = codes[order]
        col = t[value_col].combine_chunks()
        n = len(t)
        p = abs(periods)
        idx = np.arange(n)
        src = idx - p if periods > 0 else idx + p
        valid = (src >= 0) & (src < n)
        valid[valid] &= codes[src[valid]] == codes[idx[valid]]
        src = np.where(valid, src, 0)
        shifted = col.take(pa.array(src))
        # re-mask: partnerless rows are NULL with zeroed payload bytes
        vals = shifted.to_numpy(zero_copy_only=False)
        if col.null_count == 0 and vals.dtype.kind in "iuf":
            vals = vals.copy()
            vals[~valid] = 0
            arr = pa.array(vals, type=col.type, mask=~valid)
        elif col.null_count == 0:
            # strings/binary: shift dictionary INDICES (ints), then one
            # masked take from the dictionary — no per-row Python
            enc = col.dictionary_encode()
            if isinstance(enc, pa.ChunkedArray):
                enc = enc.combine_chunks()
            ind = enc.indices.to_numpy().astype(np.int64)[src]
            arr = enc.dictionary.take(pa.array(ind, mask=~valid))
            if arr.type != col.type:
                arr = arr.cast(col.type)
        else:
            arr = pa.array(
                [v if ok else None for v, ok in zip(vals, valid)],
                type=col.type)
        return t.append_column(out_col, arr)

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL) \
             .map_groups(per_bucket, batch_format="pyarrow")


def rolling_sum(
    ds: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    value_col: str,
    frame: int = 4,
    order_cols: list[str] | None = None,
    out_col: str = "roll_sum",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Per-key moving-window sum over the last ``frame`` rows (SQL
    ``sum(v) OVER (PARTITION BY key ORDER BY ts, … ROWS BETWEEN frame-1
    PRECEDING AND CURRENT ROW)``) — trailing spend / rate features.

    Same single-shuffle contract as :func:`lag_gaps`: hash-bucket by key,
    then per bucket ONE vectorized pass — sort (key, ts, order), int64
    prefix sum, window sum = ``cum[i+1] - cum[max(i-frame+1, key_start)]``
    with the key start resolved by a running maximum over first-of-key
    positions (no per-key Python). ``value_col`` must be integral (convert
    money to cents upstream): integer prefix sums are exact, so the result
    is byte-identical to sequential SQL.
    """
    import pyarrow.compute as pc

    from ..functions.hashing import BUCKET_COL, add_bucket

    if frame < 1:
        raise ValueError(f"frame must be >= 1, got {frame}")
    if num_buckets is None:
        try:
            import ray
            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 16)))
        except Exception:
            num_buckets = 16
    order_cols = order_cols or []

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, (key_col,), num_buckets)

    def per_bucket(t: pa.Table) -> pa.Table:
        keys = [(key_col, "ascending"), (ts_col, "ascending")] + \
            [(c, "ascending") for c in order_cols]
        t = t.take(pc.sort_indices(t, sort_keys=keys))
        n = len(t)
        v = t[value_col].combine_chunks().cast(pa.int64()).to_numpy()
        kv = t[key_col].combine_chunks().to_numpy(zero_copy_only=False)
        cum = np.zeros(n + 1, np.int64)
        np.cumsum(v, out=cum[1:])
        idx = np.arange(n)
        first = np.r_[True, kv[1:] != kv[:-1]] if n else np.zeros(0, bool)
        key_start = np.maximum.accumulate(np.where(first, idx, 0))
        lo = np.maximum(idx - frame + 1, key_start)
        out = cum[idx + 1] - cum[lo]
        return t.drop_columns([BUCKET_COL]) \
                .append_column(out_col, pa.array(out, pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL) \
             .map_groups(per_bucket, batch_format="pyarrow")


def grouped_percentiles_cont(
    ds: rd.Dataset,
    key_cols: list[str],
    value_col: str,
    *,
    quantiles: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> rd.Dataset:
    """Linear-interpolated (PERCENTILE_CONT / numpy type-7) per-group
    percentiles — the continuous twin of :func:`grouped_percentiles`.
    Rule, stated identically in the oracle so nothing depends on an
    engine's internal interpolation: ``h = q*(n-1); lo = floor(h);
    value = v[lo] + (h - lo) * (v[lo+1] - v[lo])`` over the group's sorted
    values (exact IEEE double ops on both sides).

    Same partitioning contract as the discrete form: one group's values
    fit one task; use the sketch path at fact scale."""
    key_cols = list(key_cols)

    def pct(g: pd.DataFrame) -> pd.DataFrame:
        v = np.sort(g[value_col].to_numpy(dtype=np.float64))
        n = len(v)
        row = {k: [g[k].iloc[0]] for k in key_cols}
        row["n"] = [np.int64(n)]
        for q in quantiles:
            h = q * (n - 1)
            lo = int(np.floor(h))
            hi = min(lo + 1, n - 1)
            row[f"p{round(q * 100)}_cont"] = [v[lo] + (h - lo) * (v[hi] - v[lo])]
        return pd.DataFrame(row)

    return ds.groupby(key_cols).map_groups(pct, batch_format="pandas")


def grouped_percent_rank(
    ds: rd.Dataset,
    key_cols: list[str],
    value_col: str,
    *,
    out_col: str = "pct_rank",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SQL ``percent_rank() OVER (PARTITION BY keys ORDER BY value)`` per
    row: ``(rank - 1) / (n - 1)`` with rank = 1 + count of strictly
    smaller values in the partition (ties share a rank, exactly the SQL
    rule; single-row partitions get 0.0).  One key exchange; per bucket a
    sort + searchsorted per partition — the rank is a pure count, and the
    one division is a single exact IEEE op, so any engine computes the
    identical double."""
    import pyarrow as pa

    from ..functions.hashing import key_hash

    key_cols = list(key_cols)
    nb = num_buckets or 32

    def tag(t: pa.Table) -> pa.Table:
        b = (key_hash(t, tuple(key_cols)) % np.uint64(nb)).astype(np.int64)
        return t.append_column("_b", pa.array(b))

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        # fully vectorized across ALL partitions in the bucket (a per-key
        # Python loop is the map_groups-overhead trap at high key
        # cardinality): lexsort by (key, value), rank = first index of the
        # equal-value run relative to the partition start
        g = g.drop(columns=["_b"]).reset_index(drop=True)
        codes, _ = pd.factorize(
            pd.MultiIndex.from_frame(g[key_cols]) if len(key_cols) > 1
            else g[key_cols[0]], sort=False)
        v = g[value_col].to_numpy()
        order = np.lexsort((v, codes))
        c_s, v_s = codes[order], v[order]
        n = len(c_s)
        starts = np.flatnonzero(np.r_[True, c_s[1:] != c_s[:-1]])
        sizes = np.diff(np.r_[starts, n])
        new_run = np.r_[True, (c_s[1:] != c_s[:-1]) | (v_s[1:] != v_s[:-1])]
        run_start = np.maximum.accumulate(
            np.where(new_run, np.arange(n), 0))
        grp_start = np.repeat(starts, sizes)
        grp_n = np.repeat(sizes, sizes)
        rank0 = run_start - grp_start  # count of strictly smaller values
        pr_sorted = np.where(grp_n > 1,
                             rank0 / np.maximum(grp_n - 1, 1), 0.0)
        pr = np.empty(n)
        pr[order] = pr_sorted
        return g.assign(**{out_col: pr})

    return ds.map_batches(tag, batch_format="pyarrow") \
        .groupby("_b").map_groups(fold, batch_format="pandas")
