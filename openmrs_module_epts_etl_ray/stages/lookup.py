"""Extra-table / extra-query datasource lookups (reference J2/J3).

``conf/TableDataSourceConfig.java:110-118`` / ``conf/QueryDataSourceConfig.java:339-350``:
for each src record, look up ONE row in another table (or parameterized
query) by join fields; ``required=true`` drops the record when no match
(semi-join), else the missing side fills with an "empty object" (null
backfill). The reference runs one JDBC probe per record; the Ray-native form
broadcasts the (small) datasource once via ``ray.put`` and probes per batch
with a vectorized pandas merge — zero per-row work, zero shuffle.

For datasources too large to broadcast, fall back to
:func:`..stages.joins.inner_join` / ``left_join`` (hash-shuffle join).

The "extra query" flavor (J3) is the same operator: precompute the query's
result as a Dataset (the parameterization ``@field`` becomes the join key)
and pass it as ``lookup``.
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray
import ray.data as rd


def _dedup_first(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    """One row per key, deterministically: the lexicographic-min row over the
    non-key columns wins. Path-independent — broadcast probe and shuffle join
    must emit IDENTICAL rows, so 'first in driver-collect order' (which the
    shuffle path cannot see) is not a usable rule. Null keys never match
    (pandas merge would join NaN==NaN, unlike SQL)."""
    df = df.dropna(subset=keys)
    order = keys + [c for c in df.columns if c not in keys]
    try:
        df = df.sort_values(order, kind="stable")
    except TypeError:  # unorderable payload column: key order alone
        df = df.sort_values(keys, kind="stable")
    return df.drop_duplicates(subset=keys, keep="first")


def _dedup_lookup_ds(lookup: rd.Dataset, keys: list[str]) -> rd.Dataset:
    """Distributed form of :func:`_dedup_first`: per-block partial dedup
    (shrinks the exchange), then ONE groupby on a COARSE key-hash bucket
    with a vectorized per-group dedup. Grouping on the raw keys would
    invoke Python once per unique key (millions of map_groups calls for a
    fact-sized lookup); a coarse bucket is a deterministic function of the
    key, so every key's rows still co-locate. Same winner rule as the
    broadcast path."""
    import ray

    from pandas.util import hash_pandas_object

    try:
        n_coarse = 4 * max(8, int(ray.cluster_resources().get("CPU", 8)))
    except Exception:
        n_coarse = 32

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        df = _dedup_first(df, keys)
        h = hash_pandas_object(df[keys].astype(str).agg("|".join, axis=1)
                               if len(keys) > 1 else df[keys[0]],
                               index=False).to_numpy()
        import numpy as np
        return df.assign(_kc=(h % np.uint64(n_coarse)).astype("int64"))

    deduped = lookup.map_batches(partial, batch_format="pandas") \
        .groupby("_kc").map_groups(
            lambda df: _dedup_first(df, keys).drop(columns=["_kc"]),
            batch_format="pandas")
    # materialize: chaining a groupby directly into Dataset.join builds one
    # iterative plan that Ray 2.49 can mis-resolve/hang (see SCALE.md); the
    # deduped lookup is the join's build side and is re-read anyway
    return deduped.materialize()


def datasource_lookup(
    ds: rd.Dataset,
    lookup: rd.Dataset,
    join_fields: list[tuple[str, str]],
    *,
    required: bool = False,
    columns: list[str] | None = None,
) -> rd.Dataset:
    """Attach lookup columns to each src row by ``join_fields``
    [(src_field, lookup_field), ...]. ``required=True`` drops unmatched rows
    (the reference's required-datasource semi-join), else nulls backfill.

    Physical strategy: broadcast probe below ``joins.BROADCAST_THRESHOLD``
    lookup rows, hash-shuffle join above it (a lookup side at fact-table
    scale must never be driver-collected)."""
    from .joins import BROADCAST_THRESHOLD, inner_join, left_join

    l_keys = [lf for _, lf in join_fields]
    s_keys_ = [sf for sf, _ in join_fields]
    lookup = lookup.materialize()
    if lookup.count() > BROADCAST_THRESHOLD:
        cols = (l_keys + [c for c in columns if c not in l_keys]
                if columns is not None else None)
        rhs = lookup.select_columns(cols) if cols else lookup
        # same one-row-per-key contract as the broadcast path: a lookup with
        # duplicate keys must NOT fan out source rows past the size threshold
        rhs = _dedup_lookup_ds(rhs, l_keys)
        if l_keys == s_keys_:
            join = inner_join if required else left_join
            return join(ds, rhs, s_keys_)
        join = inner_join if required else left_join
        out = join(ds, rhs, s_keys_, right_on=tuple(l_keys))
        drop = [lf for lf in l_keys if lf not in s_keys_]
        return out.map_batches(
            lambda t: t.drop_columns([c for c in drop if c in t.column_names]),
            batch_format="pyarrow")

    lk = lookup.to_pandas()
    if columns is not None:
        lk = lk[l_keys + [c for c in columns if c not in l_keys]]
    # one row per key (the reference takes the first matching row), with the
    # same deterministic winner rule as the shuffle path
    lk = _dedup_first(lk, l_keys)
    ref = ray.put(lk)
    s_keys = [sf for sf, _ in join_fields]
    lk_dtypes = dict(lk.dtypes)

    from .asof import _nullable, _zero_masked

    class Probe:
        # plain instance (task pool, fuses with the read); the broadcast
        # lookup frame is fetched from the object store per task.
        # Dtype restore after the merge (the broadcast_inner_join rule): a
        # left merge with misses NaN-promotes int64 lookup columns to
        # float64 in THAT batch only — mixed block schemas downstream and
        # silent corruption above 2^53, and path-dependent output vs the
        # shuffle join.
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            lk = ray.get(ref)
            merged = df.merge(
                lk, how="inner" if required else "left",
                left_on=s_keys, right_on=l_keys, suffixes=("", "_lk"),
            )
            drop = [lf for lf in l_keys if lf not in df.columns and lf not in s_keys]
            merged = merged.drop(columns=drop, errors="ignore")
            for col, want in lk_dtypes.items():
                if col in merged.columns and col not in df.columns \
                        and str(merged[col].dtype) != str(want):
                    target = _nullable(want) if merged[col].isna().any() \
                        else want
                    try:
                        merged[col] = merged[col].astype(target)
                    except (TypeError, ValueError):
                        pass
            return _zero_masked(
                merged, [c for c in merged.columns
                         if getattr(merged[c].array, "_mask", None)
                         is not None])

    return ds.map_batches(Probe(), batch_format="pandas")


def remap_fk(
    ds: rd.Dataset,
    mapping: rd.Dataset,
    fk_col: str,
    *,
    old_col: str,
    new_col: str,
    on_missing: str = "keep",  # keep | null | drop
) -> rd.Dataset:
    """FK key-remap join (reference J4 — parent resolution,
    ``etl/model/LoadRecord.java:230-330``): rewrite ``fk_col`` through an
    (old -> new) parent key mapping, the step that follows the parents'
    own id transformation. Broadcast probe (mapping = a dimension-sized
    table); misses keep / null / drop per the RefMapping repair options.
    """
    if on_missing not in ("keep", "null", "drop"):
        raise ValueError(f"on_missing={on_missing!r}")
    import pandas as pd

    from .joins import BROADCAST_THRESHOLD

    def apply_mapped(df: pd.DataFrame, mapped: pd.Series) -> pd.DataFrame:
        # nullable Int64 keeps an integer FK exact: a plain .map miss
        # introduces NaN and silently coerces int64 -> float64, losing
        # exactness above 2^53 and changing the output dtype
        if pd.api.types.is_integer_dtype(df[fk_col].dtype):
            mapped = mapped.astype("Int64")
        hit = mapped.notna() | df[fk_col].isna()
        if on_missing == "drop":
            df = df[hit]
            mapped = mapped[hit]
        elif on_missing == "keep":
            mapped = mapped.where(mapped.notna(), df[fk_col])
        return df.assign(**{fk_col: mapped})

    mapping = mapping.materialize()
    if mapping.count() > BROADCAST_THRESHOLD:
        # shuffle path: mapping at fact-table scale is never driver-collected
        from .joins import left_join

        rhs = _dedup_lookup_ds(
            mapping.select_columns([old_col, new_col]), [old_col])
        joined = left_join(ds, rhs, [fk_col], right_on=(old_col,))

        def fold(df: pd.DataFrame) -> pd.DataFrame:
            out = apply_mapped(df, df[new_col])
            return out.drop(columns=[c for c in (old_col, new_col)
                                     if c in out.columns])

        return joined.map_batches(fold, batch_format="pandas")

    import numpy as np

    mp = _dedup_first(mapping.to_pandas()[[old_col, new_col]], [old_col])
    int_lut = (pd.api.types.is_integer_dtype(mp[old_col].dtype)
               and pd.api.types.is_integer_dtype(mp[new_col].dtype))
    if int_lut:
        order = np.argsort(mp[old_col].to_numpy())
        ref = ray.put((mp[old_col].to_numpy()[order].astype(np.int64),
                       mp[new_col].to_numpy()[order].astype(np.int64)))
    else:
        ref = ray.put(dict(zip(mp[old_col], mp[new_col])))

    class Remap:
        # plain instance (task pool, fuses with the read). Integer FKs map
        # through a sorted-array searchsorted probe into a MASKED Int64 —
        # Series.map with any miss float-promotes the whole column BEFORE
        # the Int64 cast, rounding values above 2^53
        def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
            lut = ray.get(ref)
            s = df[fk_col]
            if int_lut and pd.api.types.is_integer_dtype(s.dtype):
                keys, vals = lut
                null = s.isna().to_numpy() if s.isna().any() \
                    else np.zeros(len(s), bool)
                v = pd.Series(s).fillna(0).to_numpy(dtype=np.int64)
                if len(keys):
                    ix = np.clip(np.searchsorted(keys, v), 0, len(keys) - 1)
                    hit = (keys[ix] == v) & ~null
                    out_vals = np.where(hit, vals[ix], 0)
                else:
                    hit = np.zeros(len(s), bool)
                    out_vals = np.zeros(len(s), np.int64)
                mapped = pd.Series(
                    pd.arrays.IntegerArray(out_vals.astype(np.int64), ~hit),
                    index=df.index)
                return apply_mapped(df, mapped)
            if int_lut:  # non-integer batch column against an int lut
                keys, vals = lut
                lut = dict(zip(keys.tolist(), vals.tolist()))
            return apply_mapped(df, s.map(lut))

    return ds.map_batches(Remap(), batch_format="pandas")
