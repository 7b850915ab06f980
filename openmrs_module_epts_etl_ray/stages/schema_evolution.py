"""Arrow schema unification with null-backfill (FIXTURES.md F4).

Replaces the reference's DDL auto-generation / runtime POJO regeneration
(``conf/interfaces/TableConfiguration.java:2239-2463``,
``utilities/DatabaseEntityPOJOGenerator.java``): when payload schemas evolve
(columns added, or renamed per declared mapping), the lake schema becomes the
unified superset; missing columns are backfilled with nulls; column order is
canonical (first-seen order) so fingerprints are stable.
"""
from __future__ import annotations

import pyarrow as pa


def rename_columns(t: pa.Table, renames: dict[str, str]) -> pa.Table:
    """Apply declared rename mappings (e.g. ``language -> lang``).

    When a batch carries BOTH the old and the new name (mixed-era
    producers in one block), the columns COALESCE (new value wins where
    present) instead of producing a duplicate-named table that crashes
    every downstream column lookup."""
    if not renames:
        return t
    import pyarrow.compute as pc
    for old, new in renames.items():
        if old in t.column_names and new in t.column_names:
            merged = pc.coalesce(t[new].cast(t[new].type),
                                 t[old].cast(t[new].type))
            t = t.set_column(t.column_names.index(new), new, merged)
            t = t.drop_columns([old])
    return t.rename_columns([renames.get(c, c) for c in t.column_names])


def unify_and_backfill(tables: list[pa.Table]) -> list[pa.Table]:
    """Cast every table to the unified superset schema, null-backfilling
    missing columns. Canonical column order = first-seen across inputs."""
    tables = [t for t in tables]
    names: list[str] = []
    fields: dict[str, pa.Field] = {}
    for t in tables:
        for f in t.schema:
            if f.name not in fields:
                names.append(f.name)
                fields[f.name] = f
            elif fields[f.name].type != f.type:
                unified = pa.unify_schemas(
                    [pa.schema([fields[f.name]]), pa.schema([f])], promote_options="permissive"
                )
                fields[f.name] = unified.field(0)
    target = pa.schema([fields[n] for n in names])
    return [_conform(t, target) for t in tables]


def _conform(t: pa.Table, target: pa.Schema) -> pa.Table:
    """Cast to the target schema, null-backfilling absent columns (shared
    by :func:`unify_and_backfill` and :class:`NormalizeBatch`)."""
    cols = []
    for f in target:
        if f.name in t.column_names:
            cols.append(t[f.name].cast(f.type))
        else:
            cols.append(pa.nulls(len(t), type=f.type))
    return pa.table(cols, schema=target)


class NormalizeBatch:
    """``map_batches`` stage: rename per declared mapping, then (optionally)
    conform to a target schema with null-backfill. Stateless and vectorized.
    """

    def __init__(self, renames: dict[str, str] | None = None, target: pa.Schema | None = None):
        self.renames = renames or {}
        self.target = target

    def __call__(self, batch: pa.Table) -> pa.Table:
        batch = rename_columns(batch, self.renames)
        if self.target is not None:
            batch = _conform(batch, self.target)
        return batch
