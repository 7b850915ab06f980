"""Dead-letter retry loop (M6, reference engine/Engine.java:367-406):
skipped records are re-processed after the main pass; repaired rows merge
with their ORIGINAL LSNs (watermarks untouched); unrepairable rows park
after max_retries; consumed error files are deleted."""
import os

import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from openmrs_module_epts_etl_ray.oracle import oracle_final_shas
from openmrs_module_epts_etl_ray.pipelines.replay import (
    read_lake, replay, retry_dead_letters,
)
from openmrs_module_epts_etl_ray.stages.validate import read_dead_letters


def _events():
    good = pa.table({"lsn": pa.array([1, 2, 5], pa.int64()),
                     "op": ["insert", "insert", "update"],
                     "repo": ["r", "r", "r"], "path": ["a", "b", "a"],
                     "commit": ["c1", "c2", "c5"],
                     "lang": pa.array(["py", "py", "py"]),
                     "content": pa.array(["x", "y", "x2"])})
    # lsn 3: repairable (op typo); lsn 4: stale update for 'a' (repairable,
    # must LOSE to the later lsn-5 update); lsn 9: unrepairable (null key)
    bad = pa.table({"lsn": pa.array([3, 4, 9], pa.int64()),
                    "op": ["upsert", "upsert", "insert"],
                    "repo": ["r", "r", None], "path": ["c", "a", "z"],
                    "commit": ["c3", "c4", "c9"],
                    "lang": pa.array(["py", "py", "py"]),
                    "content": pa.array(["w", "stale", "v"])})
    return good, bad


def make_repair():
    # closure (pickled by value): test modules aren't importable on workers
    import pyarrow as pa
    import pyarrow.compute as pc

    def repair_op(t: pa.Table) -> pa.Table:
        fixed = pc.if_else(pc.equal(t["op"], "upsert"), pa.scalar("update"), t["op"])
        return t.set_column(t.column_names.index("op"), "op", fixed)

    return repair_op


repair_op = make_repair()


def test_retry_repairs_and_converges(ray_session, tmp_path):
    good, bad = _events()
    lake, dl = str(tmp_path / "lake"), str(tmp_path / "dead")
    replay(rd.from_arrow(pa.concat_tables([good, bad])), lake,
           num_buckets=4, dead_letter_dir=dl).materialize()
    assert len(read_dead_letters(dl)) == 3

    summary = retry_dead_letters(lake, dl, num_buckets=4, repair=repair_op)
    assert summary["candidates"] == 3
    assert summary["parked"] == 0
    assert summary["requeued"] == 1          # the null-key row failed again

    # repaired rows applied with ORIGINAL lsn ordering: the lsn-4 stale
    # update must NOT beat the already-applied lsn-5 content
    want = pa.concat_tables([good, repair_op(bad.slice(0, 2))])
    state = read_lake(lake).to_pandas()
    mine = {(r.repo, r.path): r.content_sha for r in state.itertuples()}
    assert mine == oracle_final_shas(want)

    # second pass: only the null-key row remains; repair can't fix it;
    # after enough passes it parks terminally
    for _ in range(3):
        summary = retry_dead_letters(lake, dl, num_buckets=4, repair=repair_op)
    assert summary["parked"] == 1
    assert os.path.isdir(os.path.join(dl, "parked"))
    # nothing left to retry
    assert retry_dead_letters(lake, dl, num_buckets=4)["candidates"] == 0

    # watermarks untouched by retries: replaying the original good log is
    # still a committed no-op and state is unchanged
    lin = replay(rd.from_arrow(good), lake, num_buckets=4).materialize().to_pandas()
    assert lin["rows_applied"].sum() == 0
    state2 = read_lake(lake).to_pandas()
    mine2 = {(r.repo, r.path): r.content_sha for r in state2.itertuples()}
    assert mine2 == mine


def test_retry_idempotent_when_rerun(ray_session, tmp_path):
    good, bad = _events()
    lake, dl = str(tmp_path / "lake"), str(tmp_path / "dead")
    replay(rd.from_arrow(pa.concat_tables([good, bad])), lake,
           num_buckets=4, dead_letter_dir=dl).materialize()
    retry_dead_letters(lake, dl, num_buckets=4, repair=repair_op)
    before = read_lake(lake).to_pandas()
    # re-running with nothing new must not change state
    retry_dead_letters(lake, dl, num_buckets=4, repair=repair_op)
    after = read_lake(lake).to_pandas()
    key = ["repo", "path"]
    assert before.sort_values(key).reset_index(drop=True).equals(
        after.sort_values(key).reset_index(drop=True))
