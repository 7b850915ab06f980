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
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# value grammars for the flat fast path
_NUM = r"(?P<v>-?\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)"  # RE2 named group
_STR = r'"(?P<v>(?:[^"\\])*)"'  # no escapes: fall back when one appears


def _field_pattern(key: str, typ: pa.DataType) -> str:
    # re.escape: a key containing regex metachars ('a.b', 'x[0]') must
    # match literally, not as a pattern (and '(' would even break the
    # named-group structure)
    k = r'"' + re.escape(key) + r'"\s*:\s*'
    if pa.types.is_string(typ):
        return k + _STR
    return k + _NUM


def _coerce(v, typ: pa.DataType):
    """Fit a parsed value into the requested Arrow type, NULL on mismatch
    (missing-key / wrong-shape => NULL contract)."""
    if v is None:
        return None
    try:
        if pa.types.is_integer(typ):
            iv = int(v)
            return iv if float(iv) == float(v) else None
        if pa.types.is_floating(typ):
            return float(v)
        return v if isinstance(v, str) else None
    except (TypeError, ValueError):
        return None


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
        esc_idx, parsed = None, {}
        if strict:
            esc = pc.match_substring(doc, "\\")
            esc_mask = esc.to_numpy(zero_copy_only=False)
            if esc_mask.any():
                # parse each escaped document ONCE, shared by all fields
                docs = doc.to_pylist()
                esc_idx = np.flatnonzero(esc_mask)
                for i in esc_idx:
                    try:
                        parsed[i] = json.loads(docs[i])
                    except (ValueError, TypeError):
                        parsed[i] = {}
        for name, typ in fields.items():
            ex = pc.extract_regex(doc, pats[name])
            raw = pc.struct_field(ex, 0)
            if pa.types.is_string(typ):
                col = raw
            else:
                # safe=False would raise on '2.5' for int64; the contract
                # is NULL for anything that does not fit the requested type
                try:
                    col = raw.cast(typ)
                except pa.ArrowInvalid:
                    col = pa.array(
                        [_coerce(v, typ) for v in raw.to_pylist()], type=typ)
            if esc_idx is not None:
                vals = col.to_pylist()
                for i in esc_idx:
                    vals[i] = _coerce(parsed[i].get(name), typ)
                col = pa.array(vals, type=typ)
            cols[name] = col
        return pa.table(cols)

    return ds.map_batches(fn, batch_format="pyarrow")
