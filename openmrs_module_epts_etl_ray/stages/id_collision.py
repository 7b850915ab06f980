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


def resolve_id_collisions(
    existing: rd.Dataset,
    incoming: rd.Dataset,
    *,
    id_col: str,
    uuid_col: str,
) -> tuple[rd.Dataset, rd.Dataset]:
    """Returns ``(merged, remap)``: the merged table after collision
    resolution and the (old_id -> new_id) remap for child-FK rewriting
    (feed it to ``remap_fk``). Incoming rows always land under their own
    (possibly contested) id, matching the reference's insert-after-move."""
    ex = existing.to_pandas()
    inc = incoming.to_pandas()
    # free ids must clear BOTH sides: the reference's
    # DatabaseObjectDAO.getAvaliableObjectId probes the dst DB per record,
    # re-checking after every insert; this batch form assigns all moves up
    # front, so an incoming id above max(existing) would collide with a
    # relocated row unless the union max is used
    max_id = int(max(ex[id_col].max(), inc[id_col].max()))

    inc_ids = set(inc[id_col])
    inc_by_uuid = inc.set_index(uuid_col, drop=False)

    # 1) id collisions with a DIFFERENT entity: move existing to a free id
    coll = ex[ex[id_col].isin(inc_ids)]
    inc_uuid_of_id = dict(zip(inc[id_col], inc[uuid_col]))
    moved_mask = coll[uuid_col] != coll[id_col].map(inc_uuid_of_id)
    moved = coll[moved_mask].sort_values(id_col)
    remap_rows = []
    new_ids = {}
    for rank, old_id in enumerate(moved[id_col], start=1):
        new_ids[old_id] = max_id + rank
        remap_rows.append((int(old_id), max_id + rank))

    # 2) uuid collisions under a different id: same entity — old row drops,
    #    children re-point to the incoming id
    uuid_coll = ex[ex[uuid_col].isin(set(inc[uuid_col])) & ~ex[id_col].isin(inc_ids)]
    drop_ids = set()
    for _, row in uuid_coll.iterrows():
        new_id = int(inc_by_uuid.loc[row[uuid_col], id_col])
        remap_rows.append((int(row[id_col]), new_id))
        drop_ids.add(row[id_col])

    out_ex = ex[~ex[id_col].isin(drop_ids)].copy()
    out_ex[id_col] = out_ex[id_col].map(lambda i: new_ids.get(i, i))
    # identical (id, uuid) PAIRS: incoming replaces existing (plain upsert)
    mark = out_ex.merge(inc[[id_col, uuid_col]].drop_duplicates(),
                        on=[id_col, uuid_col], how="left", indicator=True)
    out_ex = out_ex[(mark["_merge"] != "both").to_numpy()]
    merged = pd.concat([out_ex, inc], ignore_index=True)

    remap = pd.DataFrame(remap_rows, columns=["old_id", "new_id"]).astype("int64")
    return rd.from_arrow(pa.Table.from_pandas(merged, preserve_index=False)), \
        rd.from_arrow(pa.Table.from_pandas(remap, preserve_index=False))
