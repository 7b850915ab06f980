"""Record transforms — the reference's FieldsMapping surface (SURVEY §2.2).

Reference: ``conf/DstConf.java:562-670`` builds each destination row from a
source row by per-field mappings
(``controller/conf/tablemapping/FieldsMapping.java:23-183``): copy a source
field (with rename), set a constant ``srcValue``, map to null, or call a
field-level UDF; unmapped destination fields auto-map by name; a record-level
UDF (``etl/processor/transformer/EtlRecordTransformer.java:10-13``) can
rewrite the whole row. The extraction predicate ``extraConditionForExtract``
(``engine/AbstractEtlSearchParams.java:103-118``) filters source rows.

Ray Data shape: all of it is one vectorized ``map_batches`` over Arrow — a
column select/rename/constant/null is zero-copy column surgery; field UDFs
are column-wise callables; record UDFs are ``fn(batch) -> batch``.
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import pyarrow as pa
import ray.data as rd


@dataclass
class FieldMapping:
    """One dst-field rule (reference ``FieldsMapping.retrieveValue``,
    ``controller/conf/tablemapping/FieldsMapping.java:157-183``)."""

    dst_field: str
    src_field: str | None = None          # copy/rename from this source column
    src_value: object | None = None       # constant
    map_to_null: bool = False
    dtype: pa.DataType | None = None      # optional output cast
    transformer: Callable[[pa.Array], pa.Array] | None = None  # field-level UDF (M3)


@dataclass
class RecordTransform:
    """A dst projection: ordered field mappings + optional record UDF (M2).

    ``auto_map_by_name`` mirrors the reference's auto-mapping of unmapped
    fields (``conf/DstConf.java:615-637``): any source column not claimed by
    an explicit mapping and listed in ``auto_fields`` is copied through.
    """

    mappings: list[FieldMapping] = field(default_factory=list)
    record_transformer: Callable[[pa.Table], pa.Table] | None = None
    auto_fields: list[str] | None = None

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = len(batch)
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        for m in self.mappings:
            if m.map_to_null:
                arr = pa.nulls(n, type=m.dtype or pa.string())
            elif m.src_value is not None:
                arr = pa.array([m.src_value] * n, type=m.dtype)
            elif m.src_field is not None:
                arr = batch[m.src_field]
                if m.dtype is not None:
                    arr = arr.cast(m.dtype)
            else:
                raise ValueError(f"mapping {m.dst_field}: no source")
            if m.transformer is not None:
                arr = m.transformer(arr)
            cols[m.dst_field] = arr
        if self.auto_fields:
            for c in self.auto_fields:
                if c not in cols and c in batch.column_names:
                    cols[c] = batch[c]
        out = pa.table(cols)
        if self.record_transformer is not None:
            out = self.record_transformer(out)
        return out


def apply_transform(ds: rd.Dataset, transform: RecordTransform, **kwargs) -> rd.Dataset:
    return ds.map_batches(transform, batch_format="pyarrow", zero_copy_batch=True, **kwargs)


def filter_expr(ds: rd.Dataset, predicate: Callable[[pa.Table], pa.Array], **kwargs) -> rd.Dataset:
    """Extraction predicate (M4): vectorized boolean mask inside map_batches
    (cheaper than per-row ``ds.filter``)."""
    return ds.map_batches(
        lambda t: t.filter(predicate(t)), batch_format="pyarrow", zero_copy_batch=True, **kwargs
    )


def pseudonymize(
    ds: rd.Dataset,
    key_cols: list[str],
    *,
    salt: str,
    width: int = 16,
    suffix: str = "_pseudo",
) -> rd.Dataset:
    """Stable keyed pseudonymization (GDPR-style subject-key scrubbing): each
    key column is replaced by the first ``width`` hex chars of
    ``sha256(salt || ':' || value)``.  Same salt => same pseudonym across
    tables and across runs, so joins keyed on the pseudonym still line up,
    but the raw identifier never reaches the sink.  The reference scrubs
    identity via its anonymous/skip field mappings
    (``etl/conf/FieldsMapping.java:66-84`` mapToNullValue); hashing keeps
    referential integrity, which null-out destroys.

    Stateless per-batch Arrow kernels: cast -> binary_join_element_wise ->
    buffer-direct sha256 -> utf8_slice_codeunits; no shuffle.  Portable rule:
    ``substr(sha256(concat(salt, ':', CAST(col AS VARCHAR))), 1, width)``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import sha256_hex

    def scrub(t: pa.Table) -> pa.Table:
        cols = {c: t[c] for c in t.column_names}
        for c in key_cols:
            joined = pc.binary_join_element_wise(
                pa.scalar(f"{salt}:"), pc.cast(t[c], pa.string()), "")
            cols.pop(c, None)
            cols[c + suffix] = pc.utf8_slice_codeunits(
                sha256_hex(joined), 0, width)
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow", zero_copy_batch=True)
