"""Join / lookup operators (SURVEY §2.4).

The reference expresses every lookup as SQL against the destination DB:
self-joins in the extract query (``etl/model/EtlDatabaseObjectSearchParams.java:44-91``),
per-record datasource lookups (``conf/TableDataSourceConfig.java:110-118``),
NOT EXISTS destination-exclusion anti-joins
(``EtlDatabaseObjectSearchParams.java:139-164``) and EXISTS semi-joins
(``:166-190``). A Ray-Data-native engine has two physical strategies:

- **broadcast** — when one side's key set is small enough to ship to every
  task: ``ray.put`` once, probe per batch with a vectorized ``pc.is_in`` /
  pandas merge. No shuffle; the right default for dimension tables.
- **shuffle** — ``Dataset.join`` (hash-partitioned; Ray 2.49 supports inner /
  left|right|full outer / semi / anti) when both sides are large.

``semi_join`` / ``anti_join`` pick the broadcast path automatically when the
right side is below ``broadcast_threshold`` rows, else fall back to the
shuffled native join. Partitioning assumption for the shuffle path: keys
hash-distribute reasonably; salt upstream if one key dominates.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from ..functions.hashing import KEY_SEP

BROADCAST_THRESHOLD = 2_000_000  # rows; ~key-set sizes that fit in task heap


def _default_partitions() -> int:
    """Join partitions sized to the cluster: Ray 2.49's hash-join schedules
    ``num_partitions`` aggregator actors up front, and a count above the
    CPUs available DEADLOCKS the join (observed: 32 partitions on a 4-CPU
    session never completes). Scale-out note: on a multi-node cluster this
    returns total cluster CPUs (bounding per-partition size), capped at 256
    — beyond that, per-aggregator-actor overhead dominates and callers with
    genuinely larger builds should pass num_partitions explicitly."""
    try:
        return max(2, min(256, int(ray.cluster_resources().get("CPU", 4))))
    except Exception:
        return 4


def _key_array(t: pa.Table, keys: list[str]) -> pa.Array | pa.ChunkedArray:
    if len(keys) == 1:
        return t[keys[0]]
    cols = [pc.cast(t[k], pa.string()) for k in keys]
    return pc.binary_join_element_wise(*cols, pa.scalar(KEY_SEP, type=pa.string()))


def _broadcast_key_set(ds: rd.Dataset, keys: list[str]):
    """Collect the distinct key set of a (small) dataset as an ARROW array
    and ray.put it once — Arrow arrays come back zero-copy from the object
    store, so every task's fetch is a shared-memory map, not a deserialize.
    Null keys are EXCLUDED — SQL EXISTS/NOT EXISTS never matches on null."""
    vals = set()
    for batch in ds.select_columns(keys).iter_batches(batch_format="pyarrow"):
        vals.update(v for v in pc.cast(_key_array(batch, keys), pa.string()).to_pylist()
                    if v is not None)
    return ray.put(pa.array(sorted(vals), type=pa.string()))


class _MembershipFilter:
    """Batch filter probing a broadcast key set. Used as a plain INSTANCE
    (task pool — fuses with the upstream read); the probe array ray.get is
    zero-copy per task."""

    def __init__(self, key_set_ref, keys: list[str], keep_members: bool):
        self.key_set_ref = key_set_ref
        self.keys = keys
        self.keep = keep_members

    def __call__(self, batch: pa.Table) -> pa.Table:
        value_set = ray.get(self.key_set_ref)
        arr = pc.cast(_key_array(batch, self.keys), pa.string())
        # SQL semantics: a null key is never a member (EXISTS false,
        # NOT EXISTS true) — matching the shuffled left_semi/left_anti path
        member = pc.and_(pc.fill_null(pc.is_in(arr, value_set=value_set), False),
                         pc.is_valid(arr))
        mask = member if self.keep else pc.invert(member)
        return batch.filter(mask)


def semi_join(left: rd.Dataset, right: rd.Dataset, keys: list[str],
              *, num_partitions: int | None = None,
              broadcast: bool | None = None) -> rd.Dataset:
    """left rows whose key EXISTS in right (J7, ``EtlDatabaseObjectSearchParams.java:166-190``)."""
    return _membership_join(left, right, keys, keep_members=True,
                            num_partitions=num_partitions, broadcast=broadcast)


def anti_join(left: rd.Dataset, right: rd.Dataset, keys: list[str],
              *, num_partitions: int | None = None,
              broadcast: bool | None = None) -> rd.Dataset:
    """left rows whose key does NOT exist in right (J6/J8 — the reference's
    NOT EXISTS destination-exclusion / missing-records detector)."""
    return _membership_join(left, right, keys, keep_members=False,
                            num_partitions=num_partitions, broadcast=broadcast)


def _membership_join(left, right, keys, *, keep_members, num_partitions, broadcast):
    if broadcast is None:
        # materialize once: count() then the key-set collection would
        # otherwise execute the right-side plan twice
        right = right.materialize()
        broadcast = right.count() <= BROADCAST_THRESHOLD
    if broadcast:
        ref = _broadcast_key_set(right, keys)
        return left.map_batches(
            _MembershipFilter(key_set_ref=ref, keys=keys,
                              keep_members=keep_members),
            batch_format="pyarrow",
        )
    join_type = "left_semi" if keep_members else "left_anti"
    return left.join(right.select_columns(keys), join_type=join_type,
                     num_partitions=num_partitions or _default_partitions(),
                     on=tuple(keys))


def _bloom_params(n_keys: int, bits_per_key: int) -> tuple[int, int]:
    """(m_bits, k) sized for ~n_keys entries; m is a power of two so the
    modulo is a mask. bits_per_key=16, k=8 → ~0.06% false positives."""
    m = 1024
    while m < max(1024, n_keys * bits_per_key):
        m <<= 1
    k = max(1, min(8, round(0.693 * m / max(1, n_keys))))
    return m, k


def _bloom_build(right: rd.Dataset, keys: list[str], m_bits: int, k: int):
    """Distributed bloom build: per-block bitmap partials (each a single
    binary cell) OR-folded on the driver — only ``num_blocks × m/8`` bytes
    ever leave the workers, never the keys themselves."""
    import numpy as np

    from ..functions.hashing import key_hash2

    words = m_bits >> 6

    def partial(t: pa.Table) -> pa.Table:
        bm = np.zeros(words, dtype=np.uint64)
        valid = pc.is_valid(_key_array(t, keys))
        t = t.filter(valid)  # EXISTS never matches a null key
        if len(t):
            h1, h2 = key_hash2(t, tuple(keys))
            for i in range(k):
                idx = (h1 + np.uint64(i) * h2) & np.uint64(m_bits - 1)
                np.bitwise_or.at(bm, (idx >> np.uint64(6)).astype(np.int64),
                                 np.uint64(1) << (idx & np.uint64(63)))
        return pa.table({"bloom": pa.array([bm.tobytes()], pa.binary())})

    acc = None
    for row in right.select_columns(keys).map_batches(
            partial, batch_format="pyarrow").take_all():
        bm = np.frombuffer(row["bloom"], dtype=np.uint64)
        acc = bm.copy() if acc is None else acc | bm
    if acc is None:
        acc = np.zeros(words, dtype=np.uint64)
    return ray.put(acc)


class _BloomProbe:
    """Task-pool batch filter against a broadcast bloom bitmap (zero-copy
    numpy view from the object store). ``mode``:

    - ``"maybe"``  — keep rows the filter MIGHT contain (semi pre-filter;
      null keys dropped: EXISTS is false on null)
    - ``"definite_out"`` — keep rows the filter definitely does NOT contain
      (already-final anti-join rows; null keys kept: NOT EXISTS is true)
    """

    def __init__(self, bloom_ref, keys: list[str], m_bits: int, k: int, mode: str):
        self.bloom_ref = bloom_ref
        self.keys = keys
        self.m_bits = m_bits
        self.k = k
        self.mode = mode

    def __call__(self, batch: pa.Table) -> pa.Table:
        import numpy as np

        from ..functions.hashing import key_hash2

        bm = ray.get(self.bloom_ref)
        valid = pc.is_valid(_key_array(batch, self.keys)).to_numpy(
            zero_copy_only=False)
        h1, h2 = key_hash2(batch, tuple(self.keys))
        maybe = np.ones(len(batch), dtype=bool)
        for i in range(self.k):
            idx = (h1 + np.uint64(i) * h2) & np.uint64(self.m_bits - 1)
            bit = (bm[(idx >> np.uint64(6)).astype(np.int64)]
                   >> (idx & np.uint64(63))) & np.uint64(1)
            maybe &= bit.astype(bool)
        if self.mode == "maybe":
            return batch.filter(pa.array(maybe & valid))
        return batch.filter(pa.array(~(maybe & valid)))


def bloom_semi_join(left: rd.Dataset, right: rd.Dataset, keys: list[str],
                    *, bits_per_key: int = 16,
                    num_partitions: int | None = None) -> rd.Dataset:
    """EXISTS semi-join with a bloom pre-filter: the big left side is
    reduced to probable matches BEFORE any exchange, so the exact join (a
    broadcast membership probe or hash shuffle, auto-picked) only sees
    ``|matches| + ~0.06%`` of left. The scale path for J7 when the right
    key set is too large to broadcast exactly: the bitmap is
    ``bits_per_key × |right|`` bits regardless of key width, built from
    per-block partials (keys never leave their workers)."""
    right = right.materialize()
    m, k = _bloom_params(right.count(), bits_per_key)
    ref = _bloom_build(right, keys, m, k)
    survivors = left.map_batches(
        _BloomProbe(ref, keys, m, k, "maybe"), batch_format="pyarrow")
    # exact pass removes bloom false positives
    return _membership_join(survivors, right, keys, keep_members=True,
                            num_partitions=num_partitions, broadcast=None)


def bloom_anti_join(left: rd.Dataset, right: rd.Dataset, keys: list[str],
                    *, bits_per_key: int = 16,
                    num_partitions: int | None = None) -> rd.Dataset:
    """NOT EXISTS anti-join with a bloom shortcut: rows the filter
    definitely lacks (the vast majority of a reconcile scan) are final
    answers and never shuffle; only bloom-positive rows take the exact
    anti-join. Null keys are kept directly (NOT EXISTS is true on null),
    matching the exact paths."""
    left = left.materialize()  # consumed by two branches
    right = right.materialize()
    m, k = _bloom_params(right.count(), bits_per_key)
    ref = _bloom_build(right, keys, m, k)
    definite = left.map_batches(
        _BloomProbe(ref, keys, m, k, "definite_out"), batch_format="pyarrow")
    possible = left.map_batches(
        _BloomProbe(ref, keys, m, k, "maybe"), batch_format="pyarrow")
    checked = _membership_join(possible, right, keys, keep_members=False,
                               num_partitions=num_partitions, broadcast=None)
    return definite.union(checked)


def inner_join(left: rd.Dataset, right: rd.Dataset, keys: list[str],
               *, num_partitions: int | None = None, **kw) -> rd.Dataset:
    """J1/J2 required-datasource lookup = inner join (shuffled, hash-partitioned)."""
    return left.join(right, join_type="inner",
                     num_partitions=num_partitions or _default_partitions(),
                     on=tuple(keys), **kw)


def broadcast_inner_join(
    left: rd.Dataset,
    right: rd.Dataset,
    keys: list[str],
    *,
    right_on: tuple[str, ...] | None = None,
    threshold: int | None = None,
) -> rd.Dataset:
    """Multiplicity-preserving INNER join that broadcasts the right side
    when it fits (``ray.put`` once, vectorized pandas merge per batch — no
    shuffle), else falls back to the hash-shuffle ``inner_join``. Matches
    ``Dataset.join`` column semantics: differing right key columns fold into
    the left key. Inner-only: a broadcast LEFT join would need nullable
    dtype canonicalization (see stages/asof.py) — use ``left_join`` there."""
    import pandas as pd

    right = right.materialize()
    rk = list(right_on) if right_on else list(keys)
    # module-attr lookup at CALL time (a def-time default would freeze the
    # threshold and defeat test monkeypatching)
    if threshold is None:
        threshold = BROADCAST_THRESHOLD
    if right.count() > threshold:
        if rk == list(keys):
            return inner_join(left, right, keys)
        return inner_join(left, right, keys, right_on=tuple(rk))
    from .asof import _nullable, _pd_dtypes, _zero_masked

    rdf = right.to_pandas().dropna(subset=rk)  # SQL: null keys never match
    ref = ray.put(rdf)
    # pandas NaN promotion float-coerces nullable int columns on BOTH sides
    # of the merge; restore each side's Arrow dtypes afterwards so this path
    # emits byte-identical columns to the shuffle join (nullable extension
    # dtypes with zeroed masked bytes, never NaN-float int64s)
    left_dtypes = _pd_dtypes(left.schema())
    right_dtypes = _pd_dtypes(right.schema())

    def _restore(m: pd.DataFrame, col: str, want) -> None:
        if col in m.columns and str(m[col].dtype) != str(want):
            target = _nullable(want) if m[col].isna().any() else want
            try:
                m[col] = m[col].astype(target)
            except (TypeError, ValueError):
                pass

    class Probe:
        # plain instance (task pool, fuses with the read); the broadcast
        # frame fetch is shared-memory per task
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            r = ray.get(ref)
            m = df.merge(r, how="inner", left_on=list(keys), right_on=rk,
                         suffixes=("", "_r"))
            drop = [c for c in rk if c not in keys and c not in df.columns]
            m = m.drop(columns=drop, errors="ignore")
            for col, want in left_dtypes.items():
                _restore(m, col, want)
            for col, want in right_dtypes.items():
                if col not in left_dtypes and col not in rk:
                    _restore(m, col, want)
            return _zero_masked(
                m, [c for c in m.columns
                    if getattr(m[c].array, "_mask", None) is not None])

    return left.map_batches(Probe(), batch_format="pandas")


def left_join(left: rd.Dataset, right: rd.Dataset, keys: list[str],
              *, num_partitions: int | None = None, **kw) -> rd.Dataset:
    """J2/J3 optional-datasource lookup: unmatched rows null-backfilled."""
    return left.join(right, join_type="left_outer",
                     num_partitions=num_partitions or _default_partitions(),
                     on=tuple(keys), **kw)


def full_outer_join(left: rd.Dataset, right: rd.Dataset, keys: list[str],
                    *, num_partitions: int | None = None,
                    engine: str = "cogroup",
                    **kw) -> rd.Dataset:
    """Two-sided reconciliation join (J8 generalized to BOTH directions in
    one pass): rows matched on ``keys`` merge; one-sided rows survive with
    the other side null-backfilled.

    ``engine="cogroup"`` (default): tag each side, union, ONE hash-bucket
    sort-shuffle, pandas outer merge per bucket (Arrow dtypes restored, the
    broadcast-join bug-class) — task-based, no actor pool.  Ray 2.49's
    ``Dataset.join`` schedules ``num_partitions`` aggregator ACTORS up
    front; spinning that pool cost ~2.5 s per call at 32 CPUs regardless of
    input size, which dominated every small-to-mid reconciliation.  Same
    hash-partition semantics and skew caveats; SQL null-key rules kept (a
    null key never matches, the row survives unmatched).

    ``engine="hash"``: the original ``Dataset.join`` path — the right call
    when both sides are huge and the build side must itself be partitioned
    across aggregator actors."""
    if engine == "cogroup":
        return _full_outer_cogroup(left, right, keys,
                                   num_partitions=num_partitions,
                                   right_suffix=kw.get("right_suffix", "_r"))
    rsuf = kw.setdefault("right_suffix", "_r")
    out = left.join(right, join_type="full_outer",
                    num_partitions=num_partitions or _default_partitions(),
                    on=tuple(keys), **kw)

    rkeys = [f"{k}{rsuf}" for k in keys]

    def coalesce(t: pa.Table) -> pa.Table:
        cols = set(t.column_names)
        for k, rk in zip(keys, rkeys):
            if rk in cols:
                t = t.set_column(t.column_names.index(k), k,
                                 pc.coalesce(t[k], t[rk]))
                t = t.drop_columns([rk])
        return t

    return out.map_batches(coalesce, batch_format="pyarrow")


def _full_outer_cogroup(left: rd.Dataset, right: rd.Dataset,
                        keys: list[str], *,
                        num_partitions: int | None = None,
                        right_suffix: str = "_r") -> rd.Dataset:
    """Task-based full outer join: pad both sides to the unified schema
    (typed nulls), tag ``_side``, bucket by key hash, union, one groupby
    sort-shuffle, pandas outer merge per bucket.  Null-key rows bypass the
    merge and survive unmatched (SQL semantics; pandas merge would match
    NaN == NaN).  Arrow dtypes are restored after the merge (nullable
    extension ints with zeroed masked bytes — the advisor's broadcast-join
    bug-class); note this is MORE faithful than the hash engine, whose
    pandas-block join float-promotes nullable int columns."""
    import numpy as np
    import pandas as pd

    from ..functions.hashing import key_hash
    from .asof import _nullable, _pd_dtypes, _zero_masked

    nb = num_partitions or _default_partitions()

    def _arrow_types(ds) -> dict[str, pa.DataType]:
        # ray Schema carries Arrow types for Arrow blocks but numpy dtypes
        # for pandas blocks — normalize to Arrow
        import numpy as np
        s = ds.schema()
        out = {}
        for n, t in zip(s.names, s.types):
            if isinstance(t, pa.DataType):
                out[n] = t
            else:
                dt = np.dtype(t)
                out[n] = (pa.string() if dt == np.dtype(object)
                          else pa.from_numpy_dtype(dt))
        return out

    ltype, rtype = _arrow_types(left), _arrow_types(right)
    lnames = list(ltype)
    for k in keys:
        if k not in ltype or k not in rtype:
            raise ValueError(f"join key {k!r} missing from a side")
    r_ren = {n: (n + right_suffix if n in ltype else n)
             for n in rtype if n not in keys}
    l_fields = [(n, ltype[n]) for n in lnames]
    r_fields = [(r_ren[n], rtype[n]) for n in rtype if n not in keys]
    all_fields = l_fields + r_fields
    out_names = [n for n, _ in all_fields]
    out_dtypes = _pd_dtypes(pa.schema([pa.field(n, t)
                                       for n, t in all_fields]))
    l_set = set(lnames)

    def _pad(side: int, src_of: dict):
        def f(t: pa.Table) -> pa.Table:
            n = len(t)
            cols = {}
            for name, typ in all_fields:
                src = src_of.get(name)
                cols[name] = t[src] if src else pa.nulls(n, type=typ)
            cols["_side"] = pa.array(np.full(n, side, np.int8))
            cols["_b"] = pa.array(
                (key_hash(t, tuple(keys)) % np.uint64(nb)).astype(np.int64))
            return pa.table(cols)
        return f

    lp = left.map_batches(_pad(0, {n: n for n in lnames}),
                          batch_format="pyarrow")
    rp = right.map_batches(
        _pad(1, {**{k: k for k in keys},
                 **{v: k for k, v in r_ren.items()}}),
        batch_format="pyarrow")

    rcols = [n for n, _ in r_fields]

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop(columns=["_b"])
        nullk = g[keys].isna().any(axis=1)
        gn = g[nullk].drop(columns=["_side"])
        gm = g[~nullk]
        l = gm[gm["_side"] == 0][lnames]
        r = gm[gm["_side"] == 1][keys + rcols]
        m = l.merge(r, on=keys, how="outer")
        out = pd.concat([m, gn], ignore_index=True) if len(gn) else m
        out = out.reindex(columns=out_names)
        for col, want in out_dtypes.items():
            if str(out[col].dtype) != str(want):
                target = _nullable(want) if out[col].isna().any() else want
                try:
                    out[col] = out[col].astype(target)
                except (TypeError, ValueError):
                    pass
        return _zero_masked(
            out, [c for c in out.columns
                  if getattr(out[c].array, "_mask", None) is not None])

    return lp.union(rp).groupby("_b").map_groups(
        merge_group, batch_format="pandas")
