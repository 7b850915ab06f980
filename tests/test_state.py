"""CommitLog / checkpoint / lineage unit behavior."""
import pyarrow as pa

from openmrs_module_epts_etl_ray.state.commit_log import CommitLog
from openmrs_module_epts_etl_ray.state.lineage import lineage_row, state_fingerprint


def t(n=3):
    return pa.table({"k": [f"k{i}" for i in range(n)]})


def test_commit_and_read(tmp_path):
    log = CommitLog(str(tmp_path))
    assert log.commit_state(0, 10, t()) is True
    assert log.committed_lsn_hi(0) == 10
    assert len(log.read_state(0)) == 3


def test_commit_idempotent(tmp_path):
    log = CommitLog(str(tmp_path))
    assert log.commit_state(1, 5, t(2)) is True
    assert log.commit_state(1, 5, t(9)) is False          # replay skipped
    assert len(log.read_state(1)) == 2                     # first write wins


def test_current_is_max_lsn(tmp_path):
    log = CommitLog(str(tmp_path))
    log.commit_state(2, 5, t(1))
    log.commit_state(2, 20, t(4))
    assert log.current(2)["lsn_hi"] == 20
    assert len(log.read_state(2)) == 4


def test_checkpoint_and_min(tmp_path):
    log = CommitLog(str(tmp_path))
    log.commit_state(0, 10, t())
    log.commit_state(3, 7, t())
    assert log.checkpoint() == {0: 10, 3: 7}
    assert log.min_committed_lsn() == 7


def test_empty_checkpoint(tmp_path):
    log = CommitLog(str(tmp_path))
    assert log.checkpoint() == {}
    assert log.min_committed_lsn() == -1
    assert log.committed_lsn_hi(5) == -1


def test_state_fingerprint_order_insensitive():
    assert state_fingerprint(["a", "b"]) == state_fingerprint(["b", "a"])
    assert state_fingerprint(["a"]) != state_fingerprint(["b"])
    assert state_fingerprint(["a", None]) == state_fingerprint(["a"])


def test_lineage_row_schema():
    row = lineage_row(partition_id=1, lsn_lo=0, lsn_hi=9, events_seen=10,
                      rows_applied=5, inserted=3, updated=2, kept_existing=1,
                      tombstones=0, state_rows=5, state_sha="x" * 64,
                      committed=True)
    assert len(row) == 1
    assert row["partition_id"][0].as_py() == 1


def test_lake_bucketing_is_pinned(tmp_path):
    """Replaying an existing lake with a different num_buckets must not split
    key histories across bucketings — the stored count wins."""
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake, replay

    lake = str(tmp_path / "lake")
    ev1 = pa.table({"lsn": pa.array([1], pa.int64()), "op": ["insert"],
                    "repo": ["r"], "path": ["a"], "commit": ["c"],
                    "lang": ["py"], "content": ["v1"]})
    ev2 = pa.table({"lsn": pa.array([2], pa.int64()), "op": ["update"],
                    "repo": ["r"], "path": ["a"], "commit": ["c"],
                    "lang": ["py"], "content": ["v2"]})
    replay(rd.from_arrow(ev1), lake, num_buckets=64).materialize()
    # different bucket count on the second window: stored 64 must win
    replay(rd.from_arrow(ev2), lake, num_buckets=7).materialize()
    df = read_lake(lake).to_pandas()
    assert len(df) == 1
    assert df["content"].iloc[0] == "v2"


def test_min_watermark_conservative_for_untouched_buckets(tmp_path):
    """A resumed replay whose new keys hash to a never-committed bucket must
    not have its events pruned by the global watermark."""
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake, replay
    from openmrs_module_epts_etl_ray.state.commit_log import CommitLog

    lake = str(tmp_path / "lake")
    # window 1: one key at a HIGH lsn (commits only its own bucket)
    ev1 = pa.table({"lsn": pa.array([1000], pa.int64()), "op": ["insert"],
                    "repo": ["r"], "path": ["a"], "commit": ["c"],
                    "lang": ["py"], "content": ["va"]})
    replay(rd.from_arrow(ev1), lake, num_buckets=16).materialize()
    assert CommitLog(lake).min_committed_lsn() == -1  # 15 buckets untouched

    # window 2: first-ever event for other keys at LOWER lsns
    ev2 = pa.table({"lsn": pa.array([5, 7], pa.int64()),
                    "op": ["insert", "insert"], "repo": ["r", "r"],
                    "path": ["b", "c"], "commit": ["c", "c"],
                    "lang": ["py", "py"], "content": ["vb", "vc"]})
    replay(rd.from_arrow(ev2), lake, num_buckets=16).materialize()
    df = read_lake(lake).to_pandas()
    assert sorted(df["path"]) == ["a", "b", "c"]


def test_merge_exact_lsn_above_2_53(tmp_path):
    """LSN comparison stays exact above float64's 2^53 integer range."""
    import pyarrow as pa

    from openmrs_module_epts_etl_ray.stages.merge_applier import (
        ConflictPolicy, merge_bucket_state,
    )

    big = 2**53
    state = pa.table({"repo": ["r"], "path": ["a"],
                      "lsn": pa.array([big], pa.int64()),
                      "content": ["old"], "_deleted": [False]})
    incoming = pa.table({"repo": ["r", "r"], "path": ["a", "new"],
                         "lsn": pa.array([big + 1, 1], pa.int64()),
                         "op": ["update", "insert"],
                         "content": ["newer", "x"]})
    out, stats = merge_bucket_state(state, incoming, ConflictPolicy())
    df = out.to_pandas().set_index("path")
    assert df.loc["a", "content"] == "newer"   # strictly newer must win
    assert stats["updated"] == 1 and stats["inserted"] == 1


def test_ensure_bucketing_legacy_pin_backfills_and_guards(tmp_path):
    """A pin written before bucket_cols existed (stored cols None) is
    backfilled on the next keyed call, so a later differently-keyed merge
    hits the mismatch guard instead of creating never-co-located twins."""
    import json
    import os

    import pytest

    from openmrs_module_epts_etl_ray.state.commit_log import CommitLog

    lake = str(tmp_path / "lake")
    log = CommitLog(lake)
    os.makedirs(log.log_dir, exist_ok=True)
    with open(os.path.join(log.log_dir, "bucketing.json"), "w") as fh:
        json.dump({"num_buckets": 8}, fh)   # legacy: no bucket_cols key
    assert CommitLog(lake).ensure_bucketing(16, bucket_cols=("id",)) == 8
    with open(os.path.join(log.log_dir, "bucketing.json")) as fh:
        assert json.load(fh)["bucket_cols"] == ["id"]
    with pytest.raises(ValueError, match="never co-locate"):
        CommitLog(lake).ensure_bucketing(8, bucket_cols=("name",))


def test_export_partitioned_by_col_change_refused(tmp_path, ray_session):
    import os

    import pytest
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.export import export_partitioned

    ds = rd.from_arrow(pa.table({
        "g": [0, 0, 1, 1], "h": [0, 1, 0, 1], "v": [1, 2, 3, 4]}))
    out = str(tmp_path / "part")
    export_partitioned(ds, out, "g")
    with pytest.raises(ValueError, match="hive schemes"):
        export_partitioned(ds, out, "h")
    # overwrite rewrites under the new scheme and removes the old dirs
    m = export_partitioned(ds, out, "h", overwrite=True).to_pydict()
    dirs = sorted(d for d in os.listdir(out) if "=" in d)
    assert dirs == ["h=0", "h=1"]
    assert sorted(m["partition"]) == ["0", "1"]


def test_export_partitioned_legacy_marker_scheme_inferred(tmp_path, ray_session):
    """A pre-by_col marker ('ok') must not bypass the scheme-mix guard:
    the stored scheme is inferred from the on-disk partition dirs."""
    import os

    import pytest
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.export import export_partitioned

    ds = rd.from_arrow(pa.table({
        "g": [0, 1], "h": [0, 1], "v": [1, 2]}))
    out = str(tmp_path / "part")
    export_partitioned(ds, out, "g")
    with open(os.path.join(out, "_PARTITIONED_EXPORT"), "w") as fh:
        fh.write("ok")                        # simulate the legacy marker
    with pytest.raises(ValueError, match="hive schemes"):
        export_partitioned(ds, out, "h")
    # same column under a legacy marker still resumes fine
    m = export_partitioned(ds, out, "g").to_pydict()
    assert all(m["skipped"])
