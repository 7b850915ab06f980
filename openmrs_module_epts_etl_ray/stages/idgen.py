"""Surrogate-id allocation (reference ST2, ``conf/IdGeneratorManager.java:15-90``).

The reference reserves id blocks ``[lastId+1, lastId+qty]`` from ``MAX(pk)``
under a lock, per (processor, dstConf). The Ray-native equivalent is a tiny
session-scoped actor holding the high-water mark (it lives until killed or
the driver exits — pass your own handle via ``generator`` to control its
lifetime or share it across stages): each map task reserves one contiguous
range per batch with a single actor call, then assigns ids vectorized.
NOTE the Dataset is lazy: consuming it twice re-executes the assignment and
burns fresh ranges — ``materialize()`` the result if it is read more than
once and ids must be stable. This is the canonical "shared mutable index" case where a raw
actor is the right tool — the state is one integer, the call rate is one per
batch (not per row), so the actor is never hot.

Ids are dense-ish (contiguous within a batch, no global ordering guarantee) —
exactly the reference's semantics: parallel processors hold disjoint ranges,
so the sequence has gaps where batches ended early.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data as rd


@ray.remote
class IdGenerator:
    """Atomic block allocator; ``reserve(qty)`` returns the range start."""

    def __init__(self, start: int = 1):
        self.next_id = start

    def reserve(self, qty: int) -> int:
        lo = self.next_id
        self.next_id += qty
        return lo

    def high_water(self) -> int:
        return self.next_id


def assign_surrogate_ids(
    ds: rd.Dataset,
    *,
    id_col: str = "surrogate_id",
    start: int = 1,
    generator=None,
) -> rd.Dataset:
    """Append a unique int64 surrogate id per row (block-allocated)."""
    gen = generator or IdGenerator.options(num_cpus=0).remote(start)

    class Assign:
        def __call__(self, t: pa.Table) -> pa.Table:
            if len(t) == 0:
                return t.append_column(id_col, pa.array([], pa.int64()))
            lo = ray.get(gen.reserve.remote(len(t)))
            ids = np.arange(lo, lo + len(t), dtype=np.int64)
            return t.append_column(id_col, pa.array(ids))

    return ds.map_batches(Assign, batch_format="pyarrow", concurrency=(1, 8))


def assign_surrogate_ids_ordered(
    ds: rd.Dataset,
    order_cols: list[str],
    *,
    id_col: str = "surrogate_id",
    start: int = 1,
) -> rd.Dataset:
    """Deterministic surrogate ids: the reference's contiguous block
    reservation (``conf/IdGeneratorManager.java:15-90`` — each processor
    takes ``[last+1, last+qty]``) pinned to a REPRODUCIBLE processor order.
    Range-partition the rows on ``order_cols[0]`` (the prefix scan's
    layout), give bucket ``b`` the contiguous range starting after the sum
    of all earlier buckets' sizes, and number rows inside a bucket in
    ``order_cols`` order — i.e. ``id = start - 1 + row_number() OVER
    (ORDER BY order_cols)``, computed distributed via
    ``stages.scan.running_sum`` over ones (only O(num_buckets) counts
    touch the driver). Same id on every re-run, so it is oracle-checkable,
    unlike the actor-allocated :func:`assign_surrogate_ids` whose ranges
    depend on batch arrival order."""
    from .scan import running_sum

    def ones(t: pa.Table) -> pa.Table:
        return t.append_column("_one", pa.array(
            np.ones(len(t), dtype=np.int64)))

    ranked = running_sum(ds.map_batches(ones, batch_format="pyarrow"),
                         order_cols, "_one", out_col=id_col)

    def finish(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        col = pc.add(t[id_col], pa.scalar(int(start) - 1, pa.int64()))
        return t.drop_columns(["_one", id_col]).append_column(id_col, col)

    return ranked.map_batches(finish, batch_format="pyarrow")
