"""Property-based verification of the LWW/merge kernel (pure functions).

Hypothesis generates adversarial little event logs (duplicate LSNs, arbitrary
interleavings, deletes, key collisions) and checks the two invariants the
whole engine rests on:

1. the vectorized reduce equals the naive oracle replayer;
2. window-split invariance: applying the log in ANY two-window split through
   merge_bucket_state equals the single-shot reduce (the property that makes
   micro-batch replay and resume correct).
"""
import hashlib

import hypothesis.strategies as st
import pandas as pd
import pyarrow as pa
from hypothesis import given, settings

from openmrs_module_epts_etl_ray.oracle import oracle_final_shas
from openmrs_module_epts_etl_ray.stages.lww import lww_reduce_table
from openmrs_module_epts_etl_ray.stages.merge_applier import (
    ConflictPolicy, merge_bucket_state,
)

KEYS = [("r1", "a"), ("r1", "b"), ("r2", "a"), ("r2", "c")]

event = st.tuples(
    st.sampled_from(KEYS),
    st.integers(min_value=0, max_value=40),          # lsn (dups likely)
    st.sampled_from(["insert", "update", "delete"]),
    st.text(alphabet="xyz", min_size=0, max_size=4),  # content seed
)


def to_table(evts) -> pa.Table:
    rows = []
    for (repo, path), lsn, op, seed in evts:
        rows.append({
            "lsn": lsn, "op": op, "repo": repo, "path": path,
            "commit": f"c{lsn}", "lang": None if op == "delete" else "py",
            # content must be a function of (key, lsn, op) so equal-LSN
            # duplicates are true idempotent replays, as the engine assumes
            "content": None if op == "delete" else f"{repo}/{path}@{lsn}:{seed[:0]}",
        })
    return pa.Table.from_pylist(rows) if rows else pa.table({})


def final_map(t: pa.Table) -> dict:
    if len(t) == 0:
        return {}
    red = lww_reduce_table(t).to_pylist()
    return {(r["repo"], r["path"]): r["content"] for r in red
            if r["op"] != "delete"}


@settings(max_examples=300, deadline=None)
@given(st.lists(event, min_size=1, max_size=60))
def test_reduce_matches_oracle(evts):
    t = to_table(evts)
    mine = final_map(t)
    want = {k: None if sha is None else sha
            for k, sha in oracle_final_shas(t).items()}
    got = {k: None if c is None else hashlib.sha256(c.encode()).hexdigest()
           for k, c in mine.items()}
    assert got == want


def state_map(state: pa.Table) -> dict:
    df = state.to_pandas()
    out = {}
    for r in df.itertuples():
        out[(r.repo, r.path)] = (int(r.lsn), getattr(r, "content", None),
                                 bool(r._asdict().get("_deleted", False)))
    return out


@settings(max_examples=200, deadline=None)
@given(st.lists(event, min_size=1, max_size=60),
       st.integers(min_value=0, max_value=40))
def test_window_split_invariance(evts, cut):
    """merge(merge(∅, lww(A)), lww(B)) == merge(∅, lww(A∪B)) for the split
    at any LSN cut — micro-batch replay converges to the single shot.

    The split is by LSN (as the replay API's lsn_range enforces), so
    same-LSN events always share a window; the pathological same-LSN
    op-rank tie-break is only guaranteed within a window — which is why
    replay windows are LSN ranges, never arbitrary row partitions."""
    t = to_table(evts)
    pol = ConflictPolicy()
    one_shot, _ = merge_bucket_state(pa.table({}), lww_reduce_table(t), pol)

    import pyarrow.compute as pc
    a = t.filter(pc.less_equal(t["lsn"], cut))
    b = t.filter(pc.greater(t["lsn"], cut))
    state = pa.table({})
    for w in (a, b):
        if len(w):
            state, _ = merge_bucket_state(state, lww_reduce_table(w), pol)
    assert state_map(state) == state_map(one_shot)
