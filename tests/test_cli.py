"""Smoke the ``python -m openmrs_module_epts_etl_ray`` CLI end to end in
one subprocess chain (replay -> lookup -> compact). Each invocation owns
its own Ray session, mirroring `ray job submit` usage."""
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def _cli(*args: str) -> dict:
    out = subprocess.run(
        [sys.executable, "-m", "openmrs_module_epts_etl_ray", *args],
        capture_output=True, text=True, check=True, cwd=REPO)
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_cli_replay_lookup_compact(tmp_path, ray_session):
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake, replay
    from openmrs_module_epts_etl_ray.sources.event_log import events_from_documents

    events = tmp_path / "events"
    lake = tmp_path / "lake"
    ev = events_from_documents("/root/testdata/sf0.001").materialize()
    ev.write_parquet(str(events))

    r = _cli("replay", str(events), str(lake), "--num-buckets", "8")
    assert r["buckets"] == 8 and r["rows_applied"] > 0

    # CLI state equals the library replay of the same log
    lake2 = tmp_path / "lake2"
    replay(rd.read_parquet(str(events)), str(lake2), num_buckets=8).materialize()
    a = read_lake(str(lake)).to_pandas().sort_values(["repo", "path"])
    b = read_lake(str(lake2)).to_pandas().sort_values(["repo", "path"])
    assert list(a["content_sha"]) == list(b["content_sha"])

    live = a.iloc[0]
    got = _cli("lookup", str(lake), live["repo"], live["path"])
    assert got["rows"] and got["rows"][0]["content_sha"] == live["content_sha"]

    c = _cli("compact", str(lake))
    assert c["buckets"] == 8


def test_cli_replay_lsn_lo_alone(tmp_path, ray_session):
    """--lsn-lo without --lsn-hi replays (lo, inf) instead of being
    silently ignored (advisor fix): on a fresh lake, events at-or-below
    lo never apply."""
    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake
    from openmrs_module_epts_etl_ray.sources.event_log import (
        events_from_documents,
    )

    events = tmp_path / "events"
    lake = tmp_path / "lake"
    ev = events_from_documents("/root/testdata/sf0.001").materialize()
    ev.write_parquet(str(events))
    lsns = sorted(r["lsn"] for r in ev.select_columns(["lsn"]).take_all())
    cut = lsns[len(lsns) // 2]

    _cli("replay", str(events), str(lake), "--num-buckets", "4",
         "--lsn-lo", str(cut))
    state = read_lake(str(lake)).to_pandas()
    assert len(state) > 0
    # a full replay applies MORE events than the bounded one did
    lake2 = tmp_path / "lake_full"
    r_full = _cli("replay", str(events), str(lake2), "--num-buckets", "4")
    r_again = _cli("replay", str(events), str(lake), "--num-buckets", "4",
                   "--lsn-lo", str(cut))
    assert r_again["rows_applied"] == 0     # idempotent window
    assert r_full["rows_applied"] > 0


def test_cli_query_stats(ray_session):
    """query --stats emits per-operator wall times from Dataset.stats()."""
    j = _cli("query", "pricing_summary", "--sf-dir", "/root/testdata/sf0.001",
             "--stats")
    assert j["rows"] == 6
    ops = [o["operator"] for o in j["stats"]]
    assert any("ReadParquet" in o for o in ops)
    assert all(isinstance(o["wall_sec"], float) for o in j["stats"])
