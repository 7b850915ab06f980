"""FK-integrity inconsistency solver (reference INCONSISTENCY_SOLVER).

Re-expresses ``inconsistenceresolver/processor/InconsistenceSolverProcessor.java:27-48``
+ the per-record repair in ``model/EtlDatabaseObject.java:134-148`` and the
``RefMapping`` repair options (``conf/RefMapping.java:7-28``):

for each row whose FK value has no matching parent key, either
- ``default``: patch the FK with ``defaultValueDueInconsistency``,
- ``null``:    set the FK null (``setNullDueInconsistency``),
- ``drop``:    remove the offending row (the reference moves it to the
               removal area and logs ``inconsistence_info``).

Ray-Data shape: the parent key set is broadcast once via ``ray.put`` (the
reference probes the parent table per record over JDBC; we ship the key set
to every task and probe with one vectorized ``pc.is_in`` per batch — no
shuffle). Every repaired/dropped row is reported on a side channel the way
the reference writes ``inconsistence_info`` rows.
"""
from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def resolve_inconsistencies(
    ds: rd.Dataset,
    parents: rd.Dataset,
    fk_col: str,
    parent_key_col: str,
    *,
    on_missing: str = "drop",  # drop | default | null | ignore
    default_value=None,
    report_col: str = "_inconsistent",
    audit_dir: str | None = None,
    condition_field: str | None = None,
    condition_value=None,
) -> rd.Dataset:
    """Repair rows whose ``fk_col`` has no parent. Null FKs are consistent
    (optional relationship). Output carries ``report_col`` marking repaired
    rows (the ``inconsistence_info`` audit analogue). ``drop`` removes
    offenders; pass ``audit_dir`` to write the dropped rows (with the FK
    column that failed) as the inconsistence_info side channel — without it
    the drop is silent.

    Conditional parents (reference ``conf/RefMapping.java:7-28`` /
    ``etl/model/LoadRecord.java:230-330``): with ``condition_field`` set, the
    relationship only BINDS on rows where that column equals
    ``condition_value`` — other rows are consistent by definition and pass
    through untouched. ``on_missing='ignore'`` is the reference's
    ``ignorable`` flag: a missing parent nulls the FK instead of dropping
    the row (alias of ``'null'``, kept as the config-facing name).
    """
    if on_missing == "ignore":
        on_missing = "null"
    if on_missing not in ("drop", "default", "null"):
        raise ValueError(f"on_missing={on_missing!r}")
    # distinct-reduce the parent keys DISTRIBUTED, ship only the key set
    uniq = [k for k in parents.unique(parent_key_col) if k is not None]
    ref = ray.put(pa.array(uniq))

    class Resolver:
        # plain instance (task pool, fuses with the read); the Arrow key-set
        # fetch is zero-copy per task
        def __call__(self, t: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            fk = t[fk_col]
            ok = pc.or_kleene(pc.is_in(fk, value_set=keys), pc.is_null(fk))
            ok = pc.fill_null(ok, False)
            bad = pc.invert(ok)
            if condition_field is not None:
                # gated relationship: rows where the condition doesn't hold
                # are consistent regardless of the FK value.
                # condition_value=None means "field IS NULL" — pc.equal
                # against a null scalar is all-null, which fill_null(False)
                # would turn into a SILENT no-op check
                if condition_value is None:
                    applies = pc.is_null(t[condition_field])
                else:
                    applies = pc.fill_null(
                        pc.equal(t[condition_field],
                                 pa.scalar(condition_value)), False)
                bad = pc.and_(bad, applies)
                ok = pc.invert(bad)
            if on_missing == "drop":
                if audit_dir:
                    import hashlib
                    import os

                    import pyarrow.parquet as pq
                    dropped = t.filter(bad)
                    if len(dropped):
                        os.makedirs(audit_dir, exist_ok=True)
                        h = hashlib.sha256()
                        for col in dropped.column_names:
                            h.update(repr(dropped[col].to_pylist()).encode())
                        path = os.path.join(
                            audit_dir,
                            f"inconsistent-{fk_col}-{len(dropped)}-{h.hexdigest()[:16]}.parquet")
                        tmp = path + ".tmp"
                        pq.write_table(dropped, tmp)
                        os.replace(tmp, path)
                return t.filter(ok)
            if on_missing == "null":
                fixed = pc.if_else(bad, pa.scalar(None, type=fk.type), fk)
            else:
                fixed = pc.if_else(bad, pa.scalar(default_value, type=fk.type), fk)
            t = t.set_column(t.schema.get_field_index(fk_col), fk_col, fixed)
            return t.append_column(report_col, pc.fill_null(bad, False))

    return ds.map_batches(Resolver(), batch_format="pyarrow")


def resolve_with_default_parent(
    ds: rd.Dataset,
    parents: rd.Dataset,
    fk_col: str,
    parent_key_col: str,
    *,
    default_key,
    default_row: dict | None = None,
    audit_col: str = "used_default_parent",
) -> tuple[rd.Dataset, rd.Dataset]:
    """ST4 — default-parent cache with LAZY creation (reference
    ``etl/model/LoadRecord.java:288-301``: a child whose parent is missing
    gets the table's default object; ``generateAndSaveDefaultObject`` creates
    it on FIRST use only).

    Children with a missing parent are re-pointed at ``default_key`` and
    marked in ``audit_col`` (the reference's ParentInfo memo — a later pass
    can re-point them when the real parent arrives, via ``remap_fk`` over
    rows where the audit flag is set). The default parent row is appended to
    ``parents`` ONLY when some child actually needed it and it does not
    already exist; payload fields come from ``default_row``, everything else
    null-backfills against the parents schema.

    Returns ``(children_fixed, parents_maybe_with_default)``.
    """
    uniq = [k for k in parents.unique(parent_key_col) if k is not None]
    ref = ray.put(pa.array(uniq))

    class Fix:
        # plain instance (task pool); zero-copy key-set fetch per task
        def __call__(self, t: pa.Table) -> pa.Table:
            keys = ray.get(ref)
            fk = t[fk_col]
            ok = pc.fill_null(
                pc.or_kleene(pc.is_in(fk, value_set=keys), pc.is_null(fk)),
                False)
            bad = pc.invert(ok)
            fixed = pc.if_else(bad, pa.scalar(default_key, type=fk.type), fk)
            t = t.set_column(t.schema.get_field_index(fk_col), fk_col, fixed)
            return t.append_column(audit_col, pc.fill_null(bad, False))

    fixed = ds.map_batches(Fix(), batch_format="pyarrow").materialize()
    n_used = fixed.map_batches(
        lambda t: pa.table({"n": [pc.sum(pc.cast(t[audit_col], pa.int64())).as_py() or 0]}),
        batch_format="pyarrow").sum("n")
    if n_used and default_key not in set(uniq):
        schema = pa.schema(zip(parents.schema().names, parents.schema().types))
        payload = dict(default_row or {})
        payload[parent_key_col] = default_key
        cols = {}
        for f in schema:
            v = payload.get(f.name)
            cols[f.name] = pa.array([v], type=f.type)
        parents = parents.union(rd.from_arrow(pa.table(cols, schema=schema)))
    return fixed, parents
