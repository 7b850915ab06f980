"""Event-history operators: SCD Type-2 intervals, funnels, retention.

``scd2_history`` materializes the full slowly-changing-dimension history
of a CDC event log — the interval form of the reference's stage-area
record timeline (``common/model/EtlStageRecordVO.java:36-67`` keeps every
version row; the reference's merge keeps only the newest,
``model/EtlDatabaseObject.java:614-726``; SCD2 is the "keep them all,
with validity" middle ground a warehouse destination needs).

``funnel_counts`` / ``retention_cohorts`` are the event-analytics
extensions (training-data / product-analytics side of the engine): both
follow the engine's standard single-exchange contract — hash-bucket by
the entity key so each entity's timeline co-locates, ONE vectorized
pandas/numpy pass per bucket, then a tiny (groups-sized) exchange to fold
per-bucket partials. No per-entity Python in any hot path.

Partitioning assumption (all three): entity keys hash-distribute evenly;
a single entity's history fits one task (same contract as the as-of join
and ``stages/windows.py``).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import BUCKET_COL, add_bucket, key_codes


def _default_buckets() -> int:
    try:
        import ray
        return max(16, int(ray.cluster_resources().get("CPU", 16)))
    except Exception:
        return 16


def scd2_history(
    ds: rd.Dataset,
    key_cols: tuple[str, ...],
    lsn_col: str = "lsn",
    *,
    op_col: str = "op",
    valid_to_col: str = "valid_to",
    current_col: str = "is_current",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """SCD Type-2 history: one row per non-delete event, closed by the
    key's NEXT event.

    Appends ``valid_to`` = the same key's next event LSN (NULL while the
    version is still open) and ``is_current`` = whether the version is the
    key's live state. A delete event contributes no row of its own but
    CLOSES its predecessor (the predecessor gets ``valid_to`` = the delete
    LSN and ``is_current = false``) — so keys whose history ends in a
    delete have no current row, matching the tombstone semantics of
    ``stages/lww.py::lww_final_state``.

    One hash exchange on the key; per bucket one lexsort + shifted
    compare (the LEAD window function, computed the same way
    ``lag_gaps`` computes LAG). ``valid_to``'s null slots carry zeroed
    data bytes so output is byte-canonical across engines.
    """
    nb = num_buckets or _default_buckets()
    key_cols = tuple(key_cols)

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, key_cols, nb)

    def per_bucket(t: pa.Table) -> pa.Table:
        t = t.drop_columns([BUCKET_COL])
        if t[lsn_col].null_count:
            raise ValueError(f"null {lsn_col!r} in event input")
        codes, _ = key_codes(t, key_cols)
        lsn = t[lsn_col].to_numpy()
        order = np.lexsort((lsn, codes))
        t = t.take(pa.array(order))
        codes = codes[order]
        lsn = lsn[order]

        n = len(t)
        nxt = np.zeros(n, np.int64)
        has_next = np.zeros(n, bool)
        if n > 1:
            same = codes[1:] == codes[:-1]
            nxt[:-1][same] = lsn[1:][same]
            has_next[:-1] = same
        t = t.append_column(
            valid_to_col, pa.array(nxt, pa.int64(), mask=~has_next))
        t = t.append_column(
            current_col, pa.array(~has_next))
        if op_col in t.column_names:
            t = t.filter(pc.not_equal(t[op_col], "delete"))
        return t

    return ds.map_batches(tag, batch_format="pyarrow") \
             .groupby(BUCKET_COL) \
             .map_groups(per_bucket, batch_format="pyarrow")


def funnel_counts(
    ds: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    type_col: str,
    steps: list[str],
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Sequential conversion funnel: for each entity, step ``i`` is
    reached when an event of type ``steps[i]`` occurs STRICTLY AFTER the
    entity's step-``i-1`` reach time (reach time = earliest such event).
    Returns one row per step: ``(step:int64, stage:string, n_users:int64)``.

    Per bucket the whole chain is vectorized: a groupby-min per step with
    the previous step's reach time mapped onto candidate rows (no
    per-entity Python); the cross-bucket fold exchanges ``len(steps)``
    rows per bucket.
    """
    if len(steps) < 1:
        raise ValueError("funnel needs at least one step")
    nb = num_buckets or _default_buckets()

    def tag(t: pa.Table) -> pa.Table:
        return add_bucket(t, (key_col,), nb)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        counts = []
        first = g[g[type_col] == steps[0]]
        cur = first.groupby(key_col)[ts_col].min()
        counts.append(len(cur))
        for s in steps[1:]:
            sub = g[g[type_col] == s]
            prev = sub[key_col].map(cur)
            sub = sub[sub[ts_col] > prev]  # NaT/never-reached compares False
            cur = sub.groupby(key_col)[ts_col].min()
            counts.append(len(cur))
        return pd.DataFrame({
            "step": np.arange(len(steps), dtype=np.int64),
            "stage": steps,
            "n_users": np.asarray(counts, np.int64),
        })

    partials = ds.map_batches(tag, batch_format="pyarrow") \
                 .groupby(BUCKET_COL) \
                 .map_groups(per_bucket, batch_format="pandas")

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby(["step", "stage"], as_index=False)["n_users"].sum()
        out["n_users"] = out["n_users"].astype("int64")
        return out

    # len(steps) × num_buckets rows total: one tiny final fold
    return partials.repartition(1).map_batches(fold, batch_format="pandas")


def retention_cohorts(
    ds: rd.Dataset,
    *,
    key_col: str,
    ts_col: str,
    period_us: int = 7 * 86_400_000_000,
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Cohort retention matrix: entities are cohorted by the period
    (default: epoch week) of their FIRST event; each (entity, active
    period) pair counts once toward ``(cohort, offset)`` where ``offset``
    = active period − cohort period. Returns
    ``(cohort:int64, offset:int64, n_users:int64)``.

    One entity-key exchange; per bucket distinct (entity, period) pairs
    and the per-entity min fold are single pandas passes; the cross-bucket
    exchange carries only (cohort, offset, count) partials.
    """
    from .pivot import bucketed_sum

    nb = num_buckets or _default_buckets()

    def tag(t: pa.Table) -> pa.Table:
        per = t[ts_col].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy() // period_us
        t = pa.table({key_col: t[key_col], "period": pa.array(per, pa.int64())})
        return add_bucket(t, (key_col,), nb)

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        d = g[[key_col, "period"]].drop_duplicates()
        cohort = d.groupby(key_col)["period"].transform("min")
        out = pd.DataFrame({
            "cohort": cohort.astype("int64"),
            "offset": (d["period"] - cohort).astype("int64"),
        })
        p = out.groupby(["cohort", "offset"], as_index=False).size()
        return p.rename(columns={"size": "n_users"})

    partials = ds.map_batches(tag, batch_format="pyarrow") \
                 .groupby(BUCKET_COL) \
                 .map_groups(per_bucket, batch_format="pandas")
    return bucketed_sum(partials, ["cohort", "offset"], ["n_users"])


def _elect_winners(df, key_cols, lsn_col, cut_lsn):
    """Per key: the final winner (side 1) and the winner at
    ``lsn <= cut_lsn`` (side 0) — shared by :func:`snapshot_diff` and
    :func:`incremental_group_agg` (partial AND final phases: the election
    is idempotent, so re-electing over concatenated partials is exact)."""
    df = df.sort_values(lsn_col, ascending=False, kind="stable")
    new_w = df.drop_duplicates(key_cols, keep="first").assign(_side=1)
    old_w = df[df[lsn_col] <= cut_lsn] \
        .drop_duplicates(key_cols, keep="first").assign(_side=0)
    return pd.concat([old_w, new_w], ignore_index=True)


def snapshot_diff(
    events,
    cut_lsn: int,
    *,
    key_cols=("repo", "path"),
    lsn_col: str = "lsn",
    content_col: str = "content",
    op_col: str = "op",
    num_buckets: int | None = None,
):
    """Diff between two LSN snapshots of a CDC log in ONE exchange: per key,
    the winner at ``lsn <= cut_lsn`` and the final winner are elected in the
    same pass (per-block partial keeps at most two rows per key — the old
    and new candidates — before the single bucket groupby), then classified
    added / removed / changed / unchanged.  The previous shape (two
    ``lww_final_state`` passes + a full-outer hash join) paid three
    exchanges and a join-aggregator actor pool; this is the audit report of
    an incremental load at one shuffle.

    'changed' compares winner CONTENT equality (equivalent to comparing
    content sha256, without hashing anything).  A side whose winner is a
    delete is absent on that side, like the lake state after replay.
    """
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import key_hash

    key_cols = list(key_cols)
    nb = num_buckets or _default_buckets()
    cols = key_cols + [lsn_col, content_col, op_col]

    def _elect(df: pd.DataFrame) -> pd.DataFrame:
        return _elect_winners(df, key_cols, lsn_col, cut_lsn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = _elect(df[cols])
        t = pa.Table.from_pandas(w[key_cols], preserve_index=False)
        b = (key_hash(t, tuple(key_cols)) % np.uint64(nb)).astype(np.int64)
        return w.assign(_b=b)

    def final(g: pd.DataFrame) -> pd.DataFrame:
        w = _elect(g)
        live = w[w[op_col] != "delete"]
        old = live[live["_side"] == 0]
        new = live[live["_side"] == 1]
        m = old.merge(new, on=key_cols, how="outer",
                      suffixes=("_old", "_new"))
        lo, ln = m[f"{lsn_col}_old"], m[f"{lsn_col}_new"]
        kind = np.where(
            lo.isna(), "added",
            np.where(ln.isna(), "removed",
                     np.where(m[f"{content_col}_old"].eq(
                         m[f"{content_col}_new"]).fillna(False),
                         "unchanged", "changed")))
        out = m[key_cols].copy()
        out["kind"] = kind
        out["old_lsn"] = lo.astype("Int64")
        out["new_lsn"] = ln.astype("Int64")
        from .asof import _zero_masked
        return _zero_masked(out, ["old_lsn", "new_lsn"])

    collapsed = events.map_batches(partial, batch_format="pandas")
    return collapsed.groupby("_b").map_groups(final, batch_format="pandas")


def incremental_group_agg(
    events,
    cut_lsn: int,
    *,
    group_col: str,
    val_col: str,
    key_cols=("repo", "path"),
    lsn_col: str = "lsn",
    op_col: str = "op",
    num_buckets: int | None = None,
):
    """Incremental view maintenance of a per-group aggregate (COUNT of live
    keys + SUM of ``val_col``) across an LSN cut: the base aggregate (state
    at ``lsn <= cut_lsn``) is advanced to the final state by per-key deltas
    ``new_contribution - old_contribution`` — the CDC-native alternative to
    recomputing the aggregate from a full rescan (epts-etl's progress
    counters re-count from the DB; a delta stream maintains them for free).

    Same single-exchange shape as :func:`snapshot_diff`: both winners per
    key are elected in one bucket pass; each bucket then folds its keys'
    contributions into per-group partials (base_n/base_val from the old
    winner, delta_n/delta_val from the signed difference), and one
    group-sized ``bucketed_sum`` completes.  Output per group:
    ``n`` / ``total`` (maintained final values) plus ``delta_n`` /
    ``delta_total`` (what the delta stream contributed).  The invariant
    ``base + delta == full recompute`` is the oracle."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa

    from ..functions.hashing import key_hash
    from .pivot import bucketed_sum

    key_cols = list(key_cols)
    nb = num_buckets or _default_buckets()
    cols = list(dict.fromkeys(
        key_cols + [lsn_col, op_col, group_col, val_col]))

    def _elect2(df: pd.DataFrame) -> pd.DataFrame:
        return _elect_winners(df, key_cols, lsn_col, cut_lsn)

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        w = _elect2(df[cols])
        t = pa.Table.from_pandas(w[key_cols], preserve_index=False)
        b = (key_hash(t, tuple(key_cols)) % np.uint64(nb)).astype(np.int64)
        return w.assign(_b=b)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        w = _elect2(g)
        live = w[w[op_col] != "delete"]
        old = live[live["_side"] == 0]
        new = live[live["_side"] == 1]
        m = old.merge(new, on=key_cols, how="outer", suffixes=("_o", "_n"),
                      indicator=True)
        po = m["_merge"].isin(["left_only", "both"])
        pn = m["_merge"].isin(["right_only", "both"])
        if group_col in key_cols:  # group is a key component: one column
            go = gn = m[group_col]
        else:
            go, gn = m[f"{group_col}_o"], m[f"{group_col}_n"]
        vo = m[f"{val_col}_o"].fillna(0).astype("int64")
        vn = m[f"{val_col}_n"].fillna(0).astype("int64")
        # unchanged keys would contribute a cancelling -old/+new pair;
        # emit deltas only where the contribution actually changed
        same = po & pn & go.eq(gn) & vo.eq(vn)
        base = pd.DataFrame({group_col: go[po], "n": 1, "total": vo[po],
                             "delta_n": 0, "delta_total": 0})
        changed = ~same
        rem = pd.DataFrame({group_col: go[po & changed], "n": 0, "total": 0,
                            "delta_n": -1,
                            "delta_total": -vo[po & changed]})
        add = pd.DataFrame({group_col: gn[pn & changed], "n": 0, "total": 0,
                            "delta_n": 1, "delta_total": vn[pn & changed]})
        out = pd.concat([base, rem, add], ignore_index=True)
        for c in ["n", "total", "delta_n", "delta_total"]:
            out[c] = out[c].astype("int64")
        return out

    collapsed = events.map_batches(partial, batch_format="pandas")
    per_bucket = collapsed.groupby("_b").map_groups(
        fold, batch_format="pandas")
    agg = bucketed_sum(per_bucket, [group_col],
                       ["n", "total", "delta_n", "delta_total"])

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        out = pa.table({
            group_col: t[group_col],
            "n": pc.add(t["n"], t["delta_n"]),
            "total": pc.add(t["total"], t["delta_total"]),
            "delta_n": t["delta_n"],
            "delta_total": t["delta_total"],
        })
        # a group whose keys all died has final n == 0; a full recompute
        # over the live state would not emit it
        return out.filter(pc.greater(out["n"], 0))

    return agg.map_batches(finish, batch_format="pyarrow")
