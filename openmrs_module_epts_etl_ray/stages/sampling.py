"""Deterministic hash sampling / dataset splits (training-data surface).

A 100-TB corpus needs train/val/test assignment and subsampling that is
(a) a pure function of a stable key — reproducible across runs, resilient
to repartitioning, no coordination; (b) portable — the same rule must be
computable by any other system touching the data. The rule here: the first
4 hex chars of ``sha256(key)`` compared lexicographically against ratio
thresholds — identical in DuckDB (``substr(sha256(x), 1, 4) < 'e666'``),
Spark, or psql, so the oracle check is exact.

No shuffle: assignment is a stateless vectorized ``map_batches``.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import sha256_hex

_SPACE = 1 << 16  # 4 hex chars


def _thresholds(splits: dict[str, float]) -> list[tuple[str, str]]:
    """[(name, exclusive upper bound as 4-hex-char string)] — band i is
    [prev_bound, bound_i); the LAST band's bound is irrelevant (catch-all),
    which also sidesteps the 5-char '10000' lexicographic pitfall."""
    if abs(sum(splits.values()) - 1.0) > 1e-9:
        raise ValueError(f"split ratios must sum to 1, got {splits}")
    out, acc = [], 0.0
    for name, frac in splits.items():
        acc += frac
        out.append((name, format(min(int(acc * _SPACE), _SPACE - 1), "04x")))
    return out


def _prefix(t: pa.Table, key_col: str) -> pa.Array:
    sha = sha256_hex(pc.cast(t[key_col], pa.string()))
    return pc.utf8_slice_codeunits(sha, 0, 4)


def hash_split(
    ds: rd.Dataset,
    key_col: str,
    *,
    splits: dict[str, float] | None = None,
    out_col: str = "split",
) -> rd.Dataset:
    """Append a split label per row: sha256-prefix thresholding over
    ``key_col``. Default 90/5/5 train/val/test."""
    splits = splits or {"train": 0.9, "val": 0.05, "test": 0.05}
    bounds = _thresholds(splits)

    def assign(t: pa.Table) -> pa.Table:
        p = _prefix(t, key_col)
        last_name = bounds[-1][0]
        label = pa.array([last_name] * len(t), pa.string())
        # walk inner thresholds descending so smaller bands overwrite
        for name, hi in reversed(bounds[:-1]):
            label = pc.if_else(pc.less(p, hi), pa.scalar(name), label)
        return t.append_column(out_col, label)

    return ds.map_batches(assign, batch_format="pyarrow")


def stratified_sample(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    rates: dict[str, float],
    *,
    default_rate: float = 0.0,
) -> rd.Dataset:
    """Per-group deterministic sampling — the corpus MIXTURE-WEIGHT
    operator of a training-data pipeline (upsample wiki, downsample
    crawl): each row keeps iff its sha256-prefix falls under its group's
    rate. Same portable rule as ``deterministic_sample``, so the per-group
    rates compose into one stateless vectorized pass — no shuffle, no
    per-group subpipelines; groups absent from ``rates`` use
    ``default_rate`` (0 = drop)."""
    for g, r in rates.items():
        if not 0 <= r <= 1:
            raise ValueError(f"rate for {g!r} must be in [0, 1], got {r}")
    if not 0 <= default_rate <= 1:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    def _hi(r: float) -> str:
        # rate 1.0 would render '10000' (5 chars) and lexicographically
        # UNDERRANK 4-hex prefixes; 'zzzz' sorts above every hex string
        return "zzzz" if r >= 1.0 else format(int(r * _SPACE), "04x")

    bound = {g: _hi(r) for g, r in rates.items()}
    default_hi = _hi(default_rate)

    def keep(t: pa.Table) -> pa.Table:
        p = _prefix(t, key_col)
        g = pc.cast(t[group_col], pa.string())
        hi = pa.array([default_hi] * len(t), pa.string())
        for name, b in bound.items():
            hi = pc.if_else(pc.equal(g, name), pa.scalar(b), hi)
        return t.filter(pc.less(p, hi))

    return ds.map_batches(keep, batch_format="pyarrow")


def deterministic_sample(
    ds: rd.Dataset,
    key_col: str,
    rate: float,
) -> rd.Dataset:
    """Keep ~``rate`` of rows, chosen by the same portable sha256-prefix
    rule (a row is in the sample in EVERY run and on every system)."""
    if not 0 < rate <= 1:
        raise ValueError(f"rate must be in (0, 1], got {rate}")
    if rate == 1:
        return ds
    hi = format(int(rate * _SPACE), "04x")

    def keep(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(_prefix(t, key_col), hi))

    return ds.map_batches(keep, batch_format="pyarrow")


def quota_sample(
    ds: rd.Dataset,
    key_col: str,
    group_col: str,
    k: int,
    *,
    seed: str = "",
) -> rd.Dataset:
    """Cap each group at ``k`` rows (the per-domain / per-source QUOTA of a
    corpus-mixing pipeline: "at most k docs per domain"), chosen
    deterministically as the ``k`` smallest ``sha256(seed || ':' || key)``
    — a uniform, reproducible, coordination-free choice (the rate-based
    sibling is :func:`stratified_sample`; this one bounds absolute counts).

    Two-phase selection, the top-k-per-group shape that survives 100 TB:
    each block keeps at most ``k`` rows per group locally (vectorized
    sort + cumcount — no per-group Python), so the exchange moves at most
    ``k × blocks`` rows per group, never the corpus; the final per-group
    head(k) runs in a bucketed ``map_groups`` over that bounded partial.

    Portable rule: ``row_number() OVER (PARTITION BY grp ORDER BY
    sha256(seed || ':' || CAST(key AS VARCHAR))) <= k``.
    """
    import pandas as pd

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    prefix = f"{seed}:"

    def keyed_head(df: pd.DataFrame) -> pd.DataFrame:
        sha = sha256_hex(pa.array(
            (prefix + df[key_col].astype(str)).to_numpy(), pa.string()))
        df = df.assign(_sha=sha.to_numpy(zero_copy_only=False)) \
               .sort_values([group_col, "_sha"], kind="stable")
        keep = df.groupby(group_col, sort=False).cumcount() < k
        return df[keep]

    partial = ds.map_batches(keyed_head, batch_format="pandas")

    def final_head(g: pd.DataFrame) -> pd.DataFrame:
        out = g.sort_values("_sha", kind="stable").head(k)
        return out.drop(columns=["_sha"])

    return partial.groupby(group_col).map_groups(
        final_head, batch_format="pandas")


def shuffle_rank(
    ds: rd.Dataset,
    key_col: str,
    *,
    seed: str = "",
    out_col: str = "shuffle_pos",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Deterministic global shuffle for training: append each row's
    position (0-based) in ``sha256(seed || ':' || key)`` order.

    A 100-TB corpus is not shuffled with an RNG — it is SORTED by a keyed
    hash, which is reproducible across runs/engines, seed-switchable
    per epoch, and needs no coordination. The rank itself rides the
    distributed prefix scan (``stages.scan.running_sum``): the sha prefix
    (first 12 hex chars as int48) is the range-partition axis — uniform by
    construction, so the scan's equal-width bucketing is skew-free; the
    full hex string breaks (never-observed) prefix ties.

    Portable rule: ``row_number() OVER (ORDER BY sha256(seed || ':' ||
    CAST(key AS VARCHAR))) - 1`` in DuckDB/Spark/psql.
    """
    import numpy as np

    from .scan import running_sum

    prefix = f"{seed}:"

    def keyed(t: pa.Table) -> pa.Table:
        sha = sha256_hex(pc.binary_join_element_wise(
            prefix, pc.cast(t[key_col], pa.string()), ""))
        # vectorized hex->int48 over the fixed-width (64-char) hex buffer;
        # monotonic with the hex string's lexicographic order
        a = np.frombuffer(sha.buffers()[2], dtype=np.uint8) \
            .reshape(-1, 64)[:, :12].astype(np.int64)
        v = a - 48
        v[a >= 97] -= 39
        hkey = v @ (np.int64(16) ** np.arange(11, -1, -1, dtype=np.int64))
        return t.append_column("_hkey", pa.array(hkey, pa.int64())) \
                .append_column("_sha", sha) \
                .append_column("_one", pa.array(np.ones(len(t), np.int64)))

    ranked = running_sum(
        ds.map_batches(keyed, batch_format="pyarrow"),
        ["_hkey", "_sha"], "_one",
        out_col=out_col, num_buckets=num_buckets)

    def finish(t: pa.Table) -> pa.Table:
        pos = pc.subtract(t[out_col], 1)
        return t.drop_columns(["_hkey", "_sha", "_one", out_col]) \
                .append_column(out_col, pc.cast(pos, pa.int64()))

    return ranked.map_batches(finish, batch_format="pyarrow")
