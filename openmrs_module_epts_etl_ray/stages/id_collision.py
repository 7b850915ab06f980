"""Metadata id-collision resolution (D2 — reference
``model/pojo/generic/AbstractDatabaseObject.java:343-429``).

When an incoming record's id is already taken by a DIFFERENT entity
(different uuid), the reference moves the existing record to a free id,
re-points its children, then inserts the incoming record under the contested
id. When the UUIDs match but the ids differ, the records are the same
entity: the old destination row is dropped and its children re-point to the
incoming id.

Scale contract: this operator targets METADATA tables (the reference applies
it to OpenMRS metadata — concept/person-attribute-type-sized, not facts), so
both sides are collected driver-side; the CHILD rewrites stay fully
distributed through :func:`..stages.lookup.remap_fk` (broadcast or shuffle by
size). Free ids are assigned deterministically: ``max(id) + rank`` over the
colliding existing ids in ascending order (the reference probes the DB for
"any available id"; a deterministic rule makes runs reproducible and
oracle-checkable).
"""
from __future__ import annotations

import pandas as pd
import pyarrow as pa
import ray.data as rd


#: resolve_id_collisions collects both sides to the driver — fine for the
#: metadata tables the reference applies it to, fatal if someone points it
#: at a fact table. The guard makes that misuse fail loudly instead of
#: OOMing the driver; raise it deliberately if your metadata really is
#: bigger (the child rewrites scale regardless via remap_fk).
MAX_DRIVER_ROWS = 5_000_000


def resolve_id_collisions(
    existing: rd.Dataset,
    incoming: rd.Dataset,
    *,
    id_col: str,
    uuid_col: str,
    max_driver_rows: int | None = None,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Returns ``(merged, remap)``: the merged table after collision
    resolution and the (old_id -> new_id) remap for child-FK rewriting
    (feed it to ``remap_fk``). Incoming rows always land under their own
    (possibly contested) id, matching the reference's insert-after-move."""
    limit = MAX_DRIVER_ROWS if max_driver_rows is None else max_driver_rows
    n = existing.count() + incoming.count()
    if n > limit:
        raise ValueError(
            f"resolve_id_collisions is a METADATA-scale operator (both "
            f"sides collect to the driver); got {n} rows > limit {limit}. "
            f"For fact tables, dedupe/merge by key distributedly "
            f"(stages.lww / pipelines.replay.quick_merge) and rewrite "
            f"children with stages.lookup.remap_fk; or pass "
            f"max_driver_rows to raise the bound deliberately.")
    ex = existing.to_pandas()
    inc = incoming.to_pandas()
    if len(ex) == 0 or id_col not in ex.columns:
        # first sync into an empty destination: nothing collides, nothing
        # moves (an empty Ray dataset also loses its column names)
        remap = pd.DataFrame({"old_id": pd.Series([], dtype="int64"),
                              "new_id": pd.Series([], dtype="int64")})
        return rd.from_arrow(pa.Table.from_pandas(
            inc, preserve_index=False)), \
            rd.from_arrow(pa.Table.from_pandas(remap, preserve_index=False))
    # free ids must clear BOTH sides: the reference's
    # DatabaseObjectDAO.getAvaliableObjectId probes the dst DB per record,
    # re-checking after every insert; this batch form assigns all moves up
    # front, so an incoming id above max(existing) would collide with a
    # relocated row unless the union max is used. Either side may be empty
    # (first sync into a fresh destination).
    maxes = [int(s.max()) for s in (ex[id_col], inc[id_col]) if len(s)]
    max_id = max(maxes) if maxes else 0

    inc_ids = set(inc[id_col])
    # duplicate incoming uuids (CDC retry / dup delivery): the entity's
    # canonical id is the deterministic MIN incoming id for that uuid
    inc_id_of_uuid = inc.groupby(uuid_col)[id_col].min().to_dict()

    # 1) uuid identity comes FIRST: an existing row whose uuid appears in
    #    incoming IS the incoming entity — it drops, and its children
    #    re-point to the incoming id, EVEN IF its own id also collides
    #    with some other incoming row (classifying by id first would move
    #    the row and duplicate the uuid in the merged table)
    remap_rows = []
    same = ex[uuid_col].isin(inc_id_of_uuid.keys())
    for old_id, uuid in zip(ex.loc[same, id_col], ex.loc[same, uuid_col]):
        new_id = int(inc_id_of_uuid[uuid])
        if int(old_id) != new_id:
            remap_rows.append((int(old_id), new_id))

    # 2) id collisions with a DIFFERENT entity: move existing to a free id
    rest = ex[~same]
    moved = rest[rest[id_col].isin(inc_ids)].sort_values(id_col)
    new_ids = {}
    for rank, old_id in enumerate(moved[id_col], start=1):
        new_ids[old_id] = max_id + rank
        remap_rows.append((int(old_id), max_id + rank))

    out_ex = rest.copy()
    out_ex[id_col] = out_ex[id_col].map(lambda i: new_ids.get(i, i))
    merged = pd.concat([out_ex, inc], ignore_index=True)

    remap = pd.DataFrame(remap_rows, columns=["old_id", "new_id"]).astype("int64")
    return rd.from_arrow(pa.Table.from_pandas(merged, preserve_index=False)), \
        rd.from_arrow(pa.Table.from_pandas(remap, preserve_index=False))
