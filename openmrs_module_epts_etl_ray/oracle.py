"""Single-process oracle replayer (SURVEY.md §5 test strategy).

A deliberately-naive, dict-based implementation of the replay semantics used
ONLY to verify the Ray pipeline on small inputs: events applied in (lsn, op)
order per key; last writer wins; deletes tombstone; equal-LSN duplicates are
idempotent. The Ray pipeline must produce the same final state (per-row
sha256(content) equality — BASELINE.json input_hint).
"""
from __future__ import annotations

import hashlib

import pyarrow as pa


_OP_RANK = {"delete": 0, "insert": 1, "update": 2}


def oracle_replay(events: pa.Table, key_cols=("repo", "path")) -> dict[tuple, dict]:
    """Returns key -> final row dict (tombstoned keys excluded).

    Tie-break for pathological non-identical same-LSN pairs: highest op rank
    wins (update > insert > delete) — the engine's documented deterministic
    rule (stages/lww.py); true idempotent replays are identical rows, so the
    rule only matters for malformed logs."""
    rows = events.to_pylist()
    rows.sort(key=lambda r: (r["lsn"], _OP_RANK.get(r["op"], 1)))
    state: dict[tuple, dict] = {}
    for r in rows:
        k = tuple(r[c] for c in key_cols)
        cur = state.get(k)
        if cur is not None and (cur["lsn"], _OP_RANK.get(cur["op"], 1)) >= (
                r["lsn"], _OP_RANK.get(r["op"], 1)):
            continue  # stale or idempotent replay
        state[k] = r
    return {
        k: {**r, "content_sha": None if r.get("content") is None
            else hashlib.sha256(r["content"].encode()).hexdigest()}
        for k, r in state.items()
        if r["op"] != "delete"
    }


def oracle_final_shas(events: pa.Table, key_cols=("repo", "path")) -> dict[tuple, str]:
    return {k: r["content_sha"] for k, r in oracle_replay(events, key_cols).items()}
