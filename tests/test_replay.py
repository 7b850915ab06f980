"""End-to-end replay vs the oracle replayer (FIXTURES F2/F5/F6)."""
import pyarrow as pa
import pytest
import ray.data as rd

from openmrs_module_epts_etl_ray.oracle import oracle_final_shas
from openmrs_module_epts_etl_ray.pipelines.replay import read_lake, replay
from openmrs_module_epts_etl_ray.sources.event_log import (
    events_from_documents, synthesize_event_log,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(params=["push", "sort"])
def engine(request):
    """Both exchange engines must produce the identical committed state."""
    return request.param


def final_shas(lake):
    df = read_lake(lake).to_pandas()
    return {(r.repo, r.path): r.content_sha for r in df.itertuples()}


@pytest.fixture(scope="module")
def doc_events():
    import ray  # noqa: F401  (session fixture owns init)
    ds = events_from_documents(SF).materialize()
    tbl = pa.Table.from_pylist(ds.take_all())
    return ds, tbl


def test_replay_matches_oracle(doc_events, tmp_lake, engine):
    ds, tbl = doc_events
    replay(ds, tmp_lake, num_buckets=16, engine=engine).materialize()
    assert final_shas(tmp_lake) == oracle_final_shas(tbl)


def test_replay_idempotent(doc_events, tmp_lake, engine):
    ds, tbl = doc_events
    replay(ds, tmp_lake, num_buckets=16, engine=engine).materialize()
    lin2 = replay(ds, tmp_lake, num_buckets=16, engine=engine).materialize().to_pandas()
    assert lin2["committed"].sum() == 0
    assert lin2["rows_applied"].sum() == 0
    assert final_shas(tmp_lake) == oracle_final_shas(tbl)


def test_windowed_replay_resumes_to_same_state(doc_events, tmp_lake, engine):
    ds, tbl = doc_events
    replay(ds, tmp_lake, num_buckets=16, lsn_range=(-1, 2000), engine=engine).materialize()
    replay(ds, tmp_lake, num_buckets=16, engine=engine).materialize()
    assert final_shas(tmp_lake) == oracle_final_shas(tbl)


def test_bucket_count_invariance(doc_events, tmp_path, engine):
    """Partitioning is an execution detail: any bucket count yields the
    same final state (salting/skew-split correctness, FIXTURES F5)."""
    ds, tbl = doc_events
    want = oracle_final_shas(tbl)
    for b in (4, 64):
        lake = str(tmp_path / f"lake{b}")
        replay(ds, lake, num_buckets=b, engine=engine).materialize()
        assert final_shas(lake) == want


def test_synthetic_skewed_log_with_dups_out_of_order(tmp_lake, engine):
    """Zipf-hot keys + duplicate-LSN replays + shuffled delivery must still
    converge to the oracle state (order independence of max-LSN)."""
    ds = synthesize_event_log(5000, n_keys=300, n_shards=8, seed=9,
                              zipf_s=1.5, dup_rate=0.05).materialize()
    tbl = pa.Table.from_pylist(ds.take_all())
    replay(ds, tmp_lake, num_buckets=8, engine=engine).materialize()
    assert final_shas(tmp_lake) == oracle_final_shas(tbl)


def test_lineage_accounting(doc_events, tmp_lake, engine):
    ds, tbl = doc_events
    lin = replay(ds, tmp_lake, num_buckets=16, engine=engine).materialize().to_pandas()
    assert lin["events_seen"].sum() == len(tbl)
    assert lin["committed"].all()
    assert lin["state_rows"].sum() == 500  # live rows + tombstones
    live = len(oracle_final_shas(tbl))
    assert lin["rows_applied"].sum() == live
    assert (lin["state_sha"].str.len() == 64).all()


def test_replayed_window_is_noop_for_committed_partitions(tmp_lake, engine):
    """FIXTURES F6: rerunning an already-committed window must not rewrite."""
    ev = rd.from_arrow(pa.table({
        "lsn": pa.array([1, 2], pa.int64()), "op": ["insert", "insert"],
        "repo": ["r", "r"], "path": ["a", "b"],
        "commit": ["c", "c"], "lang": ["py", "py"], "content": ["x", "y"]}))
    replay(ev, tmp_lake, num_buckets=2, engine=engine).materialize()
    from openmrs_module_epts_etl_ray.state.commit_log import CommitLog
    ck1 = CommitLog(tmp_lake).checkpoint()
    lin = replay(ev, tmp_lake, num_buckets=2, engine=engine).materialize().to_pandas()
    assert lin["committed"].sum() == 0
    assert CommitLog(tmp_lake).checkpoint() == ck1


def test_mega_key_skew(tmp_path):
    """One key holding 90% of all events (the mega-repo case): the per-block
    partial combine collapses it to one row per block before the exchange,
    so no bucket blows up; state matches the oracle."""
    import numpy as np

    from openmrs_module_epts_etl_ray.oracle import oracle_final_shas

    n = 20000
    rng = np.random.default_rng(3)
    hot = rng.random(n) < 0.9
    path = np.where(hot, "hot", [f"p{i}" for i in range(n)])
    t = pa.table({
        "lsn": pa.array(np.arange(n, dtype=np.int64)),
        "op": pa.array(np.where(np.arange(n) == 0, "insert", "update")),
        "repo": pa.array(["r"] * n),
        "path": pa.array(path.astype(object), pa.string()),
        "commit": pa.array([f"c{i}" for i in range(n)]),
        "lang": pa.array(["py"] * n),
        "content": pa.array([f"v{i}" for i in range(n)]),
    })
    ds = rd.from_arrow(t).repartition(16)
    lake = str(tmp_path / "lake")
    lin = replay(ds, lake, num_buckets=8).materialize().to_pandas()
    got = final_shas(lake)
    assert got == oracle_final_shas(t)
    assert lin["events_seen"].sum() == n


def test_write_lineage_roundtrip(doc_events, tmp_lake):
    from openmrs_module_epts_etl_ray.pipelines.replay import write_lineage

    ds, _ = doc_events
    lin = replay(ds, tmp_lake, num_buckets=8).materialize()
    write_lineage(lin, tmp_lake, run_id="r1")
    back = rd.read_parquet(f"{tmp_lake}/_lineage/run=r1").to_pandas()
    assert back["events_seen"].sum() == lin.to_pandas()["events_seen"].sum()
    assert set(back.columns) >= {"partition_id", "lsn_lo", "lsn_hi",
                                 "rows_applied", "state_sha", "committed"}


def test_push_exchange_slice_replay_is_dropped(tmp_path):
    """Simulated map-task retry: routing the identical block twice to the
    same actors must not double-count lineage (exactly-once under retries)."""
    import ray

    from openmrs_module_epts_etl_ray.functions.hashing import add_bucket
    from openmrs_module_epts_etl_ray.stages.push_exchange import (
        BucketRouter, MergeActor,
    )

    t = pa.table({
        "lsn": pa.array([1, 2, 3, 4], pa.int64()),
        "op": ["insert"] * 4, "repo": ["r"] * 4,
        "path": ["a", "b", "c", "d"], "commit": ["c"] * 4,
        "lang": ["py"] * 4, "content": ["1", "2", "3", "4"],
        "_n_events": pa.array([1, 1, 1, 1], pa.int64()),
    })
    t = add_bucket(t, ("repo", "path"), 4)
    lake = str(tmp_path / "lake")
    actors = [MergeActor.options(num_cpus=0).remote(lake, None, ("repo", "path"), True)
              for _ in range(2)]
    router = BucketRouter(actors, 2)
    router(t)
    router(t)  # the retry re-send
    lin = pa.concat_tables(ray.get([a.flush.remote() for a in actors]),
                           promote_options="default").to_pandas()
    for a in actors:
        ray.kill(a)
    assert lin["events_seen"].sum() == 4
    assert lin["rows_applied"].sum() == 4


def test_replay_until_caught_up(doc_events, tmp_path):
    from openmrs_module_epts_etl_ray.oracle import oracle_final_shas
    from openmrs_module_epts_etl_ray.pipelines.replay import replay_until_caught_up

    ds, tbl = doc_events
    lake = str(tmp_path / "lake")
    windows = replay_until_caught_up(ds, lake, window_size=1500, num_buckets=8)
    assert len(windows) >= 2  # actually micro-batched
    assert final_shas(lake) == oracle_final_shas(tbl)
    # caught up: another call is a no-op
    assert replay_until_caught_up(ds, lake, window_size=1500, num_buckets=8) == []


def test_push_exchange_same_lsn_different_keys_not_deduped(tmp_path):
    """Regression: two slices sharing an LSN but holding DIFFERENT keys
    (multi-file commit) must BOTH be ingested — only true re-sends of the
    same slice content may be dropped."""
    import ray

    from openmrs_module_epts_etl_ray.functions.hashing import add_bucket
    from openmrs_module_epts_etl_ray.stages.push_exchange import (
        BucketRouter, MergeActor,
    )

    def one_row(path):
        t = pa.table({
            "lsn": pa.array([100], pa.int64()), "op": ["insert"],
            "repo": ["r"], "path": [path], "commit": ["c"],
            "lang": ["py"], "content": [f"v-{path}"],
            "_n_events": pa.array([1], pa.int64()),
        })
        return add_bucket(t, ("repo", "path"), 1)  # both land in bucket 0

    lake = str(tmp_path / "lake")
    actor = MergeActor.options(num_cpus=0).remote(lake, None, ("repo", "path"), True)
    router = BucketRouter([actor], 1)
    router(one_row("a"))   # same lsn=100, different key
    router(one_row("b"))
    lin = ray.get(actor.flush.remote()).to_pandas()
    ray.kill(actor)
    assert lin["rows_applied"].sum() == 2
    assert lin["events_seen"].sum() == 2


def test_crash_with_partial_commits_recovers(tmp_path):
    """A mid-flush crash leaves an arbitrary SUBSET of buckets committed
    (per-bucket commits are atomic). Simulate it by keeping only the even
    buckets of a finished replay; the re-run must commit exactly the lost
    buckets and converge to the single-shot state."""
    import os
    import shutil

    from openmrs_module_epts_etl_ray.oracle import oracle_final_shas
    from openmrs_module_epts_etl_ray.sources.event_log import synthesize_event_log

    ds = synthesize_event_log(20000, n_keys=1500, n_shards=8, seed=21).materialize()
    tbl = pa.Table.from_pylist(ds.take_all())
    full, partial = str(tmp_path / "full"), str(tmp_path / "partial")
    replay(ds, full, num_buckets=8).materialize()

    for sub in ("data", "_commitlog"):
        os.makedirs(os.path.join(partial, sub), exist_ok=True)
    shutil.copy(os.path.join(full, "_commitlog", "bucketing.json"),
                os.path.join(partial, "_commitlog", "bucketing.json"))
    for b in range(0, 8, 2):
        for sub in ("data", "_commitlog"):
            shutil.copytree(os.path.join(full, sub, f"bucket={b}"),
                            os.path.join(partial, sub, f"bucket={b}"))

    lin = replay(ds, partial, num_buckets=8).materialize().to_pandas()
    assert int(lin["committed"].sum()) == 4  # exactly the lost buckets
    assert final_shas(partial) == oracle_final_shas(tbl)


def test_actor_loss_rerun_converges(doc_events, tmp_path):
    """Push-exchange fault model (SCALE.md): a lost MergeActor loses only its
    in-flight buffer — some buckets commit, its own never do — and a full
    RERUN over the same lake converges to the identical committed state.
    Simulated by flushing only one of two actors and killing the other."""
    import ray

    from openmrs_module_epts_etl_ray.stages.lww import PartialLww
    from openmrs_module_epts_etl_ray.stages.push_exchange import (
        COMBINE_THRESHOLD, BucketRouter, MergeActor,
    )
    from openmrs_module_epts_etl_ray.state.commit_log import CommitLog

    ds, tbl = doc_events
    lake = str(tmp_path / "lake_partial")
    CommitLog(lake).ensure_bucketing(8)
    collapsed = ds.map_batches(
        PartialLww(key_cols=("repo", "path"), num_buckets=8),
        batch_format="pyarrow")
    actors = [
        MergeActor.options(num_cpus=0.5, max_restarts=0).remote(
            lake, None, ("repo", "path"), True, COMBINE_THRESHOLD, "snapshot")
        for _ in range(2)
    ]
    collapsed.map_batches(
        BucketRouter(actors, 2, key_cols=("repo", "path")),
        batch_format="pyarrow").sum("rows_routed")
    ray.get(actors[0].flush.remote())      # half the buckets commit
    ray.kill(actors[1], no_restart=True)   # the other half's buffer is LOST
    partial = final_shas(lake)
    full = oracle_final_shas(tbl)
    assert partial != full                 # the loss is observable

    # rerun over the SAME lake: committed buckets replay idempotently, lost
    # buckets commit now — state converges to the clean single-shot result
    replay(ds, lake, num_buckets=8, engine="push").materialize()
    assert final_shas(lake) == full


def test_lookup_keys_point_reads_match_scan(doc_events, tmp_lake):
    from openmrs_module_epts_etl_ray.pipelines.replay import lookup_keys

    ds, tbl = doc_events
    replay(ds, tmp_lake, num_buckets=16).materialize()
    full = read_lake(tmp_lake).to_pandas()
    live = {(r.repo, r.path): r.content_sha for r in full.itertuples()}
    oracle = oracle_final_shas(tbl)
    present = sorted(live)[:5]
    deleted = sorted(set(zip(tbl["repo"].to_pylist(), tbl["path"].to_pylist()))
                     - set(oracle))[:2]
    absent = [("no-such-repo", "no/such/path")]

    got = lookup_keys(tmp_lake, present + deleted + absent)
    got_map = {(r.repo, r.path): r.content_sha for r in got.to_pandas().itertuples()}
    assert got_map == {k: live[k] for k in present}

    # tombstoned keys come back only with include_deleted
    if deleted:
        dead = lookup_keys(tmp_lake, deleted, include_deleted=True).to_pandas()
        assert set(zip(dead["repo"], dead["path"])) == set(deleted)

    # all-absent probe returns an empty, schema-stable table
    empty = lookup_keys(tmp_lake, absent)
    assert len(empty) == 0 and "repo" in empty.schema.names
