"""Delta-commit lake layout (changed rows per commit + periodic snapshot):
crash-recovery, idempotency and compaction must hold exactly as in the
default full-snapshot layout, with byte-identical final state."""
import os

import pyarrow as pa
import pytest
import ray.data as rd

from openmrs_module_epts_etl_ray.oracle import oracle_final_shas
from openmrs_module_epts_etl_ray.pipelines.replay import (
    read_lake, replay, retry_dead_letters,
)
from openmrs_module_epts_etl_ray.sources.event_log import events_from_documents
from openmrs_module_epts_etl_ray.state.commit_log import CommitLog
from openmrs_module_epts_etl_ray.state.compaction import compact_lake


@pytest.fixture(scope="module")
def doc_events(ray_session):
    return events_from_documents("/root/testdata/sf0.001").materialize()


def shas(lake):
    df = read_lake(lake).to_pandas()
    return {(r.repo, r.path): r.content_sha for r in df.itertuples()}


@pytest.mark.parametrize("engine", ["push", "sort"])
def test_delta_replay_matches_oracle(doc_events, tmp_path, engine):
    lake = str(tmp_path / f"lake_{engine}")
    replay(doc_events, lake, num_buckets=8, engine=engine,
           layout="delta").materialize()
    oracle = oracle_final_shas(pa.Table.from_pylist(doc_events.take_all()))
    assert shas(lake) == oracle


def test_delta_windowed_resume_and_idempotency(doc_events, tmp_path):
    lake = str(tmp_path / "lake")
    hi = int(doc_events.max("lsn"))
    lo = -1
    # 5 windows => several delta commits per bucket before any snapshot
    for c in [hi // 5, 2 * hi // 5, 3 * hi // 5, 4 * hi // 5, hi]:
        replay(doc_events, lake, num_buckets=8, lsn_range=(lo, c),
               layout="delta").materialize()
        lo = c
    oracle = oracle_final_shas(pa.Table.from_pylist(doc_events.take_all()))
    assert shas(lake) == oracle
    # at least one bucket is mid-chain (current commit is a delta)
    log = CommitLog(lake)
    kinds = [(log.current(b) or {}).get("kind") for b in log.checkpoint()]
    assert "delta" in kinds
    # re-replay is a no-op
    lin = replay(doc_events, lake, num_buckets=8,
                 layout="delta").materialize().to_pandas()
    assert lin["rows_applied"].sum() == 0 and not lin["committed"].any()
    assert shas(lake) == oracle


def test_delta_snapshot_cadence(doc_events, tmp_path):
    lake = str(tmp_path / "lake")
    hi = int(doc_events.max("lsn"))
    cuts = [int(hi * (i + 1) / 6) for i in range(5)] + [hi]
    lo = -1
    for c in cuts:
        replay(doc_events, lake, num_buckets=4, lsn_range=(lo, c),
               layout="delta").materialize()
        lo = c
    log = CommitLog(lake)
    # every bucket's chain obeys the cadence: <= snapshot_every deltas
    # between consecutive snapshots (default snapshot_every=8)
    for b in log.checkpoint():
        run = 0
        for c in log.commits(b):
            if c.get("kind", "snapshot") == "snapshot":
                run = 0
            else:
                run += 1
                assert run < 8


def test_delta_compaction_preserves_state(doc_events, tmp_path):
    lake = str(tmp_path / "lake")
    hi = int(doc_events.max("lsn"))
    lo = -1
    for c in [hi // 3, 2 * hi // 3, hi]:
        replay(doc_events, lake, num_buckets=8, lsn_range=(lo, c),
               layout="delta").materialize()
        lo = c
    before = shas(lake)
    compact_lake(lake)
    assert shas(lake) == before
    log = CommitLog(lake)
    for b in log.checkpoint():
        commits = log.commits(b)
        assert len(commits) == 1
        assert commits[0].get("kind", "snapshot") == "snapshot"
        # exactly one data file remains
        ddir = log._bucket_data_dir(b)
        assert len([f for f in os.listdir(ddir) if f.endswith(".parquet")]) == 1


def test_delta_retry_amendment_is_snapshot(ray_session, tmp_path):
    good = pa.table({"lsn": pa.array([1, 2], pa.int64()),
                     "op": ["insert", "insert"],
                     "repo": ["r", "r"], "path": ["a", "b"],
                     "commit": ["c1", "c2"],
                     "lang": pa.array(["py", "py"]),
                     "content": pa.array(["x", "y"])})
    bad = pa.table({"lsn": pa.array([3], pa.int64()),
                    "op": ["upsert"],
                    "repo": ["r"], "path": ["c"], "commit": ["c3"],
                    "lang": pa.array(["py"]), "content": pa.array(["z"])})
    lake, dl = str(tmp_path / "lake"), str(tmp_path / "dead")
    ev = rd.from_arrow(pa.concat_tables([good, bad]))
    replay(ev, lake, num_buckets=2, dead_letter_dir=dl,
           layout="delta").materialize()

    import pyarrow.compute as pc

    def repair(t):
        fixed = pc.if_else(pc.equal(t["op"], "upsert"),
                           pa.scalar("update"), t["op"])
        return t.set_column(t.column_names.index("op"), "op", fixed)

    retry_dead_letters(lake, dl, num_buckets=2, repair=repair)
    state = shas(lake)
    want = oracle_final_shas(pa.concat_tables([good, repair(bad)]))
    assert state == want
