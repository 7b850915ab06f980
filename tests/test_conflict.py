"""Conflict-resolution truth table (FIXTURES.md F3, SURVEY §2.12) against
merge_bucket_state — the engine's translation of the reference's
resolveConflictWithExistingRecord (model/EtlDatabaseObject.java:614-726)."""
import pyarrow as pa

from openmrs_module_epts_etl_ray.stages.merge_applier import (
    DELETED_COL, ConflictPolicy, merge_bucket_state,
)


def winners(rows):
    return pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": [r[1] for r in rows],
        "repo": [r[2] for r in rows],
        "path": [r[3] for r in rows],
        "content": [r[4] for r in rows],
    })


def state_of(rows):
    return pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "repo": [r[1] for r in rows],
        "path": [r[2] for r in rows],
        "content": [r[3] for r in rows],
        DELETED_COL: pa.array([r[4] for r in rows], pa.bool_()),
    })


def final_rows(state):
    df = state.to_pandas()
    live = df[~df[DELETED_COL]]
    return {(r.repo, r.path): (r.lsn, r.content) for r in live.itertuples()}


P = ConflictPolicy()


def test_insert_then_later_update_wins():
    s, stats = merge_bucket_state(state_of([]), winners([(1, "insert", "r", "a", "v1")]), P)
    s, stats = merge_bucket_state(s, winners([(2, "update", "r", "a", "v2")]), P)
    assert final_rows(s) == {("r", "a"): (2, "v2")}
    assert stats["updated"] == 1


def test_stale_update_keeps_existing():
    s, _ = merge_bucket_state(state_of([]), winners([(5, "insert", "r", "a", "v5")]), P)
    s, stats = merge_bucket_state(s, winners([(3, "update", "r", "a", "old")]), P)
    assert final_rows(s) == {("r", "a"): (5, "v5")}
    assert stats["kept_existing"] == 1  # reference: KEPT_EXISTING


def test_equal_lsn_replay_idempotent():
    s, _ = merge_bucket_state(state_of([]), winners([(5, "insert", "r", "a", "v5")]), P)
    s, stats = merge_bucket_state(s, winners([(5, "insert", "r", "a", "v5")]), P)
    assert final_rows(s) == {("r", "a"): (5, "v5")}
    assert stats["kept_existing"] == 1


def test_update_for_missing_key_creates():
    # reference: ConflictWithRecordNotYetAvaliableException path -> create
    s, stats = merge_bucket_state(state_of([]), winners([(7, "update", "r", "a", "v7")]), P)
    assert final_rows(s) == {("r", "a"): (7, "v7")}
    assert stats["inserted"] == 1


def test_delete_then_reinsert_higher_lsn():
    s, _ = merge_bucket_state(state_of([]), winners([(1, "insert", "r", "a", "v1")]), P)
    s, _ = merge_bucket_state(s, winners([(2, "delete", "r", "a", None)]), P)
    assert final_rows(s) == {}
    s, _ = merge_bucket_state(s, winners([(3, "insert", "r", "a", "v3")]), P)
    assert final_rows(s) == {("r", "a"): (3, "v3")}


def test_insert_then_delete_tombstones():
    s, _ = merge_bucket_state(state_of([]), winners([(1, "insert", "r", "a", "v1")]), P)
    s, stats = merge_bucket_state(s, winners([(2, "delete", "r", "a", None)]), P)
    assert final_rows(s) == {}
    assert stats["tombstones"] == 1


def test_stale_update_cannot_resurrect_tombstone():
    s, _ = merge_bucket_state(state_of([]), winners([(9, "delete", "r", "a", None)]), P)
    s, stats = merge_bucket_state(s, winners([(4, "update", "r", "a", "zombie")]), P)
    assert final_rows(s) == {}
    assert stats["kept_existing"] == 1


def test_keep_existing_policy():
    pol = ConflictPolicy(mode="keep_existing")
    s, _ = merge_bucket_state(state_of([]), winners([(1, "insert", "r", "a", "v1")]), pol)
    s, stats = merge_bucket_state(s, winners([(9, "update", "r", "a", "v9")]), pol)
    assert final_rows(s) == {("r", "a"): (1, "v1")}
    assert stats["kept_existing"] == 1


def test_update_existing_policy_even_when_stale():
    pol = ConflictPolicy(mode="update_existing")
    s, _ = merge_bucket_state(state_of([]), winners([(9, "insert", "r", "a", "v9")]), pol)
    s, stats = merge_bucket_state(s, winners([(2, "update", "r", "a", "v2")]), pol)
    assert final_rows(s) == {("r", "a"): (2, "v2")}
    assert stats["updated"] == 1


def test_winning_fields_policy():
    # incoming wins iff any group of (field, value) pairs matches the incoming row
    pol = ConflictPolicy(mode="winning_fields",
                         winning_field_groups=[[("content", "WINNER")]])
    s, _ = merge_bucket_state(state_of([]), winners([(1, "insert", "r", "a", "v1")]), pol)
    s, _ = merge_bucket_state(s, winners([(2, "update", "r", "a", "loser")]), pol)
    assert final_rows(s) == {("r", "a"): (1, "v1")}
    s, _ = merge_bucket_state(s, winners([(3, "update", "r", "a", "WINNER")]), pol)
    assert final_rows(s) == {("r", "a"): (3, "WINNER")}


def test_schema_evolution_in_merge():
    # incoming rows carry a new column; state rows get it null-backfilled
    s, _ = merge_bucket_state(state_of([]), winners([(1, "insert", "r", "a", "v1")]), P)
    w = winners([(2, "insert", "r", "b", "v2")]).append_column(
        "size_bytes", pa.array([123], pa.int64()))
    s, _ = merge_bucket_state(s, w, P)
    df = s.to_pandas().set_index("path")
    assert "size_bytes" in df.columns
    assert df.loc["b", "size_bytes"] == 123
    assert df.loc["a", "size_bytes"] is None or df.loc["a", "size_bytes"] != df.loc["a", "size_bytes"]


def test_keep_existing_policy_across_windows(tmp_path):
    """End-to-end: with KEEP_EXISTING, a later window cannot overwrite a row
    committed by an earlier window (reference onConflict semantics)."""
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake, replay
    from openmrs_module_epts_etl_ray.stages.merge_applier import ConflictPolicy

    w1 = pa.table({"lsn": pa.array([1], pa.int64()), "op": ["insert"],
                   "repo": ["r"], "path": ["a"], "commit": ["c1"],
                   "lang": ["py"], "content": ["first"]})
    w2 = pa.table({"lsn": pa.array([2], pa.int64()), "op": ["update"],
                   "repo": ["r"], "path": ["a"], "commit": ["c2"],
                   "lang": ["py"], "content": ["second"]})
    lake = str(tmp_path / "lake")
    pol = ConflictPolicy(mode="keep_existing")
    replay(rd.from_arrow(w1), lake, num_buckets=2, policy=pol).materialize()
    replay(rd.from_arrow(w2), lake, num_buckets=2, policy=pol).materialize()
    df = read_lake(lake).to_pandas()
    assert list(df["content"]) == ["first"]

    # and with the default LWW policy the update wins
    lake2 = str(tmp_path / "lake2")
    replay(rd.from_arrow(w1), lake2, num_buckets=2).materialize()
    replay(rd.from_arrow(w2), lake2, num_buckets=2).materialize()
    df2 = read_lake(lake2).to_pandas()
    assert list(df2["content"]) == ["second"]


def test_uk_fallback_overlapping_pk_columns():
    """A unique-key group equal to the PK is skipped (the PK probe already
    covers it); a group that CONTAINS a PK column runs without the
    select-then-rename column collision (round-4 regression: KeyError in
    drop_duplicates when uk and key_cols shared names)."""
    import pyarrow as pa

    from openmrs_module_epts_etl_ray.stages.merge_applier import (
        ConflictPolicy, merge_bucket_state,
    )

    state = pa.table({
        "id": pa.array([1], pa.int64()), "origin": ["a"], "v": ["old"],
        "lsn": pa.array([1], pa.int64()), "_deleted": [False]})
    incoming = pa.table({
        "id": pa.array([2], pa.int64()), "origin": ["a"], "v": ["new"],
        "lsn": pa.array([2], pa.int64()), "op": ["insert"]})
    for uks in ([["id"]], [["origin", "id"]]):
        pol = ConflictPolicy()
        pol.unique_keys = [list(g) for g in uks]
        s, stats = merge_bucket_state(state, incoming, pol,
                                      key_cols=("id",))
        assert sorted(s["id"].to_pylist()) == [1, 2], uks
