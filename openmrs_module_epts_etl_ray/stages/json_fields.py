"""JSON field extraction over a string column — the document feature of
the reference's stage area made columnar.

The reference keeps each in-flight row as a JSON string (the stage
record's ``json`` column, ``common/model/EtlStageRecordVO.java:36-67``,
populated via ``TableConfiguration.java:2438``) and re-parses it on load.
Here extraction is a stateless vectorized batch op: for FLAT JSON objects
(the overwhelmingly common event-properties shape) each requested field
compiles to ONE RE2 ``pc.extract_regex`` kernel over the Arrow column —
no per-row parser, no Python objects. Nested/escaped documents need a
real parser: pass ``strict=True`` to route rows the regex cannot see
through Python ``json`` (per-row cost on ONLY those rows).

Scale: zero exchanges — extraction fuses into the read; prune the scan to
the JSON column + keys you keep.
"""
from __future__ import annotations

import json

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# value grammars for the flat fast path
_NUM = r"(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"  # RE2 named group
_STR = r'"(?P<v>(?:[^"\\])*)"'  # no escapes: fall back when one appears


def _field_pattern(key: str, typ: pa.DataType) -> str:
    k = r'"' + key + r'"\s*:\s*'
    if pa.types.is_string(typ):
        return k + _STR
    return k + _NUM


def extract_json_fields(
    ds: rd.Dataset,
    json_col: str,
    fields: dict[str, pa.DataType],
    *,
    keep: list[str] | None = None,
    strict: bool = False,
) -> rd.Dataset:
    """Append one column per ``fields`` entry (name -> Arrow type)
    extracted from the flat JSON object in ``json_col``. Missing keys /
    null documents yield NULL. ``keep`` selects pass-through columns
    (default: all except ``json_col``). ``strict=True`` re-parses rows
    containing escape sequences through Python ``json`` so escaped
    strings decode correctly (the fast path skips them as NULL)."""
    pats = {name: _field_pattern(name, typ) for name, typ in fields.items()}

    def fn(t: pa.Table) -> pa.Table:
        doc = t[json_col]
        if isinstance(doc, pa.ChunkedArray):
            doc = doc.combine_chunks()
        cols = {c: t[c] for c in
                (keep if keep is not None
                 else [c for c in t.column_names if c != json_col])}
        esc_mask = None
        if strict:
            esc = pc.match_substring(doc, "\\")
            esc_mask = esc.to_numpy(zero_copy_only=False)
        for name, typ in fields.items():
            ex = pc.extract_regex(doc, pats[name])
            raw = pc.struct_field(ex, 0)
            col = raw.cast(typ) if not pa.types.is_string(typ) else raw
            if strict and esc_mask is not None and esc_mask.any():
                vals = col.to_pylist()
                docs = doc.to_pylist()
                for i in np.flatnonzero(esc_mask):
                    try:
                        obj = json.loads(docs[i])
                        vals[i] = obj.get(name)
                    except (ValueError, TypeError):
                        vals[i] = None
                col = pa.array(vals, type=typ)
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
