"""Property-based verification of the bucketed as-of join against a naive
per-row reference: for every left row, the matching right row is the one
with max ts <= left.ts, ties broken by max tie-break id — independent of
how rows were split across blocks/buckets."""
import hypothesis.strategies as st
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd
from hypothesis import given, settings

from openmrs_module_epts_etl_ray.stages.asof import asof_join

row = st.tuples(st.integers(0, 3),       # user
                st.integers(0, 20))      # ts (dups likely)


def naive(left_rows, right_rows):
    out = []
    for li, (u, t) in enumerate(left_rows):
        best = None
        for ri, (ru, rt) in enumerate(right_rows):
            if ru == u and rt <= t:
                if best is None or (rt, ri) > (right_rows[best][1], best):
                    best = ri
        out.append((li, best))
    return out


@settings(max_examples=60, deadline=None)
@given(st.lists(row, min_size=1, max_size=12),
       st.lists(row, min_size=0, max_size=12))
def test_asof_matches_naive_reference(ray_session, left_rows, right_rows):
    base = np.datetime64("2024-01-01", "us")
    left = pa.table({
        "click_id": pa.array(range(len(left_rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in left_rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[1], "h") for r in left_rows],
                       pa.timestamp("us")),
    })
    right = pa.table({
        "purchase_id": pa.array(range(len(right_rows)), pa.int64()),
        "user_id": pa.array([r[0] for r in right_rows], pa.int64()),
        "ts": pa.array([base + np.timedelta64(r[1], "h") for r in right_rows],
                       pa.timestamp("us")),
    })
    out = asof_join(rd.from_arrow(left), rd.from_arrow(right),
                    by="user_id", on="ts",
                    right_cols=["purchase_id"],
                    right_order=["purchase_id"],
                    num_buckets=3).to_pandas()
    got = {int(r.click_id): (None if pd.isna(r.purchase_id) else int(r.purchase_id))
           for r in out.itertuples()}
    want = {li: best for li, best in naive(left_rows, right_rows)}
    assert got == want
    # dtype canonicalization invariants (the round-2 driver-hash fix)
    assert str(out["click_id"].dtype) == "int64"
    assert str(out["purchase_id"].dtype) == "Int64"
