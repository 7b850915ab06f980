"""Unique-key upsert fallback (J5) truth table + quick_merge pipeline test.

Reference contract (model/EtlDatabaseObject.java:619-633,
model/pojo/generic/DatabaseObjectDAO.java:179-225): when the PK probe
misses, the existing destination record is found by any configured unique
key; the incoming row then merges onto it, adopting its PK.
"""
import numpy as np
import pyarrow as pa

from openmrs_module_epts_etl_ray.stages.merge_applier import (
    DELETED_COL, ConflictPolicy, merge_bucket_state,
)


def winners(rows):
    # (lsn, op, id, name, val)
    return pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "op": [r[1] for r in rows],
        "id": pa.array([r[2] for r in rows], pa.int64()),
        "name": [r[3] for r in rows],
        "val": pa.array([r[4] for r in rows], pa.float64()),
    })


def state_of(rows):
    # (lsn, id, name, val)
    return pa.table({
        "lsn": pa.array([r[0] for r in rows], pa.int64()),
        "id": pa.array([r[1] for r in rows], pa.int64()),
        "name": [r[2] for r in rows],
        "val": pa.array([r[3] for r in rows], pa.float64()),
        DELETED_COL: pa.array([False] * len(rows), pa.bool_()),
    })


P = ConflictPolicy(unique_keys=[["name"]])
KEY = ("id",)


def rows_by_id(state):
    df = state.to_pandas()
    live = df[~df[DELETED_COL]]
    return {int(r.id): (int(r.lsn), r.name, r.val) for r in live.itertuples()}


def test_uk_hit_adopts_existing_pk():
    st = state_of([(0, 1, "alice", 1.0)])
    w = winners([(1, "update", 999, "alice", 2.0)])
    new, stats = merge_bucket_state(st, w, P, KEY)
    out = rows_by_id(new)
    assert out == {1: (1, "alice", 2.0)}  # dst PK kept, payload updated
    assert stats["updated"] == 1 and stats["inserted"] == 0


def test_pk_probe_takes_precedence_over_uk():
    st = state_of([(0, 1, "alice", 1.0), (0, 2, "bob", 1.0)])
    # incoming id matches row 2 by PK even though name matches row 1 by uk
    w = winners([(1, "update", 2, "alice", 9.0)])
    new, _ = merge_bucket_state(st, w, P, KEY)
    out = rows_by_id(new)
    assert out[2] == (1, "alice", 9.0)
    assert out[1] == (0, "alice", 1.0)  # untouched (PK path won)


def test_uk_miss_inserts_under_own_pk():
    st = state_of([(0, 1, "alice", 1.0)])
    w = winners([(1, "insert", 999, "carol", 3.0)])
    new, stats = merge_bucket_state(st, w, P, KEY)
    out = rows_by_id(new)
    assert out == {1: (0, "alice", 1.0), 999: (1, "carol", 3.0)}
    assert stats["inserted"] == 1


def test_uk_hit_stale_lsn_keeps_existing():
    st = state_of([(5, 1, "alice", 1.0)])
    w = winners([(1, "update", 999, "alice", 2.0)])
    new, stats = merge_bucket_state(st, w, P, KEY)
    assert rows_by_id(new) == {1: (5, "alice", 1.0)}
    assert stats["kept_existing"] == 1


def test_two_incoming_adopt_same_pk_highest_lsn_wins():
    st = state_of([(0, 1, "alice", 1.0)])
    w = winners([(1, "update", 998, "alice", 2.0),
                 (2, "update", 999, "alice", 3.0)])
    new, stats = merge_bucket_state(st, w, P, KEY)
    assert rows_by_id(new) == {1: (2, "alice", 3.0)}
    assert stats["kept_existing"] == 1  # the lsn-1 sibling lost


def test_null_uk_never_matches():
    st = state_of([(0, 1, "alice", 1.0)])
    w = pa.table({
        "lsn": pa.array([1], pa.int64()),
        "op": ["insert"],
        "id": pa.array([999], pa.int64()),
        "name": pa.array([None], pa.string()),
        "val": pa.array([2.0], pa.float64()),
    })
    new, _ = merge_bucket_state(st, w, P, KEY)
    out = rows_by_id(new)
    assert set(out) == {1, 999}


def test_second_uk_group_probed_when_first_misses():
    pol = ConflictPolicy(unique_keys=[["name"], ["val"]])
    st = state_of([(0, 1, "alice", 42.0)])
    w = winners([(1, "update", 999, "renamed", 42.0)])
    new, _ = merge_bucket_state(st, w, pol, KEY)
    # name misses, val (second uk group) hits -> adopt PK 1
    assert rows_by_id(new) == {1: (1, "renamed", 42.0)}


def test_quick_merge_pipeline_end_to_end(ray_session, tmp_path):
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.replay import quick_merge, read_lake

    lake = str(tmp_path / "lake")
    rng = np.random.default_rng(7)
    n = 500
    dst = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "name": [f"user-{i:04d}" for i in range(n)],
        "val": pa.array(rng.normal(size=n)),
        "lsn": pa.array(np.zeros(n, dtype=np.int64)),
        "op": ["insert"] * n,
    })
    quick_merge(rd.from_arrow(dst), lake, key_cols=("id",),
                unique_keys=[["name"]], num_buckets=8).materialize()
    # src: every 3rd user updated under a foreign id space + 50 new users
    upd_ids = np.arange(0, n, 3)
    src = pa.table({
        "id": pa.array(np.concatenate([upd_ids + 10_000,
                                       np.arange(n, n + 50)]), pa.int64()),
        "name": [f"user-{i:04d}" for i in upd_ids]
                + [f"user-{i:04d}" for i in range(n, n + 50)],
        "val": pa.array(np.concatenate([np.full(len(upd_ids), 7.0),
                                        np.full(50, 9.0)])),
        "lsn": pa.array(np.ones(len(upd_ids) + 50, dtype=np.int64)),
        "op": ["update"] * len(upd_ids) + ["insert"] * 50,
    })
    quick_merge(rd.from_arrow(src), lake, key_cols=("id",),
                unique_keys=[["name"]], num_buckets=8).materialize()
    final = read_lake(lake).to_pandas().set_index("id")
    assert len(final) == n + 50          # no twins inserted for matched rows
    assert (final.loc[upd_ids, "val"] == 7.0).all()   # updated under DST ids
    assert not final.index.isin(upd_ids + 10_000).any()  # src ids not adopted
    assert (final.loc[np.arange(n, n + 50), "val"] == 9.0).all()


def test_quick_merge_push_engine_matches_sort(ray_session, tmp_path):
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.replay import quick_merge, read_lake

    n = 300
    dst = pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "name": [f"u-{i:04d}" for i in range(n)],
        "val": pa.array(np.arange(n, dtype=np.float64)),
        "lsn": pa.array(np.zeros(n, dtype=np.int64)),
        "op": ["insert"] * n,
    })
    upd = np.arange(0, n, 4)
    src = pa.table({
        "id": pa.array(upd + 50_000, pa.int64()),
        "name": [f"u-{i:04d}" for i in upd],
        "val": pa.array(np.full(len(upd), -1.0)),
        "lsn": pa.array(np.ones(len(upd), dtype=np.int64)),
        "op": ["update"] * len(upd),
    })
    finals = {}
    for engine in ("sort", "push"):
        lake = str(tmp_path / f"lake_{engine}")
        quick_merge(rd.from_arrow(dst), lake, key_cols=("id",),
                    unique_keys=[["name"]], num_buckets=8,
                    engine=engine).materialize()
        quick_merge(rd.from_arrow(src), lake, key_cols=("id",),
                    unique_keys=[["name"]], num_buckets=8,
                    engine=engine).materialize()
        df = read_lake(lake).to_pandas().sort_values("id").reset_index(drop=True)
        finals[engine] = df
    assert finals["sort"].equals(finals["push"])
    assert (finals["push"].set_index("id").loc[upd, "val"] == -1.0).all()


def test_quick_merge_hot_unique_key_skew(ray_session, tmp_path):
    """90% of incoming rows contest ONE unique key: they all co-locate in
    that key's bucket and collapse to the single highest-LSN winner under
    the destination's unique constraint."""
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.replay import quick_merge, read_lake

    lake = str(tmp_path / "lake")
    dst = pa.table({
        "id": pa.array([1], pa.int64()), "name": ["hot"],
        "val": pa.array([0.0]),
        "lsn": pa.array([0], pa.int64()), "op": ["insert"],
    })
    quick_merge(rd.from_arrow(dst), lake, key_cols=("id",),
                unique_keys=[["name"]], num_buckets=8).materialize()
    n = 20_000
    hot = int(n * 0.9)
    src = pa.table({
        "id": pa.array(np.arange(n) + 1000, pa.int64()),
        "name": ["hot"] * hot + [f"cold-{i}" for i in range(n - hot)],
        "val": pa.array(np.arange(n, dtype=np.float64)),
        "lsn": pa.array(np.arange(n, dtype=np.int64) + 1),
        "op": ["update"] * n,
    })
    quick_merge(rd.from_arrow(src), lake, key_cols=("id",),
                unique_keys=[["name"]], num_buckets=8).materialize()
    final = read_lake(lake).to_pandas()
    assert final["name"].is_unique
    assert len(final) == 1 + (n - hot)
    hot_row = final[final["name"] == "hot"].iloc[0]
    # highest-LSN contender wins, landing on the dst PK
    assert hot_row["id"] == 1 and hot_row["lsn"] == hot
