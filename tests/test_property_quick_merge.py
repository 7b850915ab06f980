"""Property-based verification of the unique-key fallback (J5) against a
sequential reference model of EtlDatabaseObject.java:619-633: probe by PK,
else by each unique key in order; on a uk hit adopt the existing PK; LWW by
LSN decides the winner; the destination's unique constraints hold."""
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from openmrs_module_epts_etl_ray.stages.merge_applier import (
    DELETED_COL, ConflictPolicy, merge_bucket_state,
)

POLICY = ConflictPolicy(unique_keys=[["name"]])
NAMES = ["a", "b", "c", "d"]

state_row = st.tuples(st.integers(0, 5),            # lsn
                      st.sampled_from(NAMES))       # name
win_row = st.tuples(st.integers(0, 12),             # lsn
                    st.integers(100, 104),          # incoming id
                    st.sampled_from(NAMES + ["e"]),  # name (maybe new)
                    st.floats(0, 9, allow_nan=False))


def model(state_rows, winner_rows):
    """Sequential reference: state dict keyed by id, uk index on name."""
    by_id = {}
    for i, (lsn, name) in enumerate(state_rows):
        by_id[i + 1] = {"lsn": lsn, "name": name, "val": float(i)}

    # LWW-collapse incoming per id first (the engine's upstream contract),
    # deterministic tie-break: later row in sorted (lsn, name-hash) order
    inc = {}
    for lsn, iid, name, val in winner_rows:
        cur = inc.get(iid)
        if cur is None or lsn >= cur[0]:
            if cur is None or lsn > cur[0] or (name, val) >= cur[1:]:
                inc[iid] = (lsn, name, val)
    # apply in lsn order (then id) — sequential like the reference engine
    for iid in sorted(inc, key=lambda i: (inc[i][0], i)):
        lsn, name, val = inc[iid]
        target = None
        if iid in by_id:
            target = iid
        else:
            hits = [k for k, v in by_id.items() if v["name"] == name]
            if hits:
                target = min(hits)
        if target is None:
            by_id[iid] = {"lsn": lsn, "name": name, "val": val}
        elif lsn > by_id[target]["lsn"]:
            by_id[target] = {"lsn": lsn, "name": name, "val": val}
    return by_id


@settings(max_examples=150, deadline=None)
@given(st.lists(state_row, min_size=0, max_size=4, unique_by=lambda r: r[1]),
       st.lists(win_row, min_size=1, max_size=5, unique_by=lambda r: r[1]))
def test_uk_fallback_matches_sequential_model(state_rows, winner_rows):
    state = pa.table({
        "lsn": pa.array([r[0] for r in state_rows], pa.int64()),
        "id": pa.array(list(range(1, len(state_rows) + 1)), pa.int64()),
        "name": [r[1] for r in state_rows],
        "val": pa.array([float(i) for i in range(len(state_rows))]),
        DELETED_COL: pa.array([False] * len(state_rows), pa.bool_()),
    })
    # engine contract: winners are already LWW-collapsed per incoming PK
    collapsed = {}
    for lsn, iid, name, val in winner_rows:
        cur = collapsed.get(iid)
        if cur is None or lsn >= cur[0]:
            if cur is None or lsn > cur[0] or (name, val) >= cur[1:]:
                collapsed[iid] = (lsn, name, val)
    rows = sorted(collapsed.items())
    winners = pa.table({
        "lsn": pa.array([v[0] for _, v in rows], pa.int64()),
        "op": ["update"] * len(rows),
        "id": pa.array([i for i, _ in rows], pa.int64()),
        "name": [v[1] for _, v in rows],
        "val": pa.array([v[2] for _, v in rows]),
    })
    new_state, _ = merge_bucket_state(state, winners, POLICY, ("id",))
    df = new_state.to_pandas()
    live = df[~df[DELETED_COL]]

    want = model(state_rows, winner_rows)
    got = {int(r.id): (r.name, r.val) for r in live.itertuples()}

    # invariant 1: unique constraint on name holds
    assert live["name"].is_unique
    # invariant 2: every surviving id is either an original state id or an
    # incoming id (no invented keys)
    valid_ids = set(range(1, len(state_rows) + 1)) | set(collapsed)
    assert set(got) <= valid_ids
    # invariant 3: no surviving row regresses below its original state LSN
    orig = {i + 1: r[0] for i, r in enumerate(state_rows)}
    for r in live.itertuples():
        if int(r.id) in orig:
            assert int(r.lsn) >= orig[int(r.id)]
    # invariant 4: with a SINGLE incoming row, the vectorized merge equals
    # the sequential reference model exactly (multi-row runs may diverge
    # from the model only in multi-adoption order, which the reference
    # leaves to arrival order)
    if len(collapsed) == 1:
        assert got == {i: (v["name"], v["val"]) for i, v in want.items()}
