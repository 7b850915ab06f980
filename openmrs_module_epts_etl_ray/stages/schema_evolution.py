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
    """Apply declared rename mappings (e.g. ``language -> lang``)."""
    if not renames:
        return t
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
    out = []
    for t in tables:
        cols = []
        for f in target:
            if f.name in t.column_names:
                cols.append(t[f.name].cast(f.type))
            else:
                cols.append(pa.nulls(len(t), type=f.type))
        out.append(pa.table(cols, schema=target))
    return out


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
            cols = []
            for f in self.target:
                if f.name in batch.column_names:
                    cols.append(batch[f.name].cast(f.type))
                else:
                    cols.append(pa.nulls(len(batch), type=f.type))
            batch = pa.table(cols, schema=self.target)
        return batch
