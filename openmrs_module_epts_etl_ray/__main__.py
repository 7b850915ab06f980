"""CLI entry point — the Ray-side analogue of the reference's command-line
process starter (epts-etl runs as ``java -jar`` + a JSON process config;
reference: ``Main.java`` / ``controller/ProcessStarter.java``). Usage:

    python -m openmrs_module_epts_etl_ray run-config examples/etl_self_join.json
    python -m openmrs_module_epts_etl_ray replay EVENT_DIR LAKE --num-buckets 128
    python -m openmrs_module_epts_etl_ray tail EVENT_DIR LAKE --window 1000000
    python -m openmrs_module_epts_etl_ray compact LAKE
    python -m openmrs_module_epts_etl_ray lookup LAKE REPO PATH
    python -m openmrs_module_epts_etl_ray query pricing_summary --sf-dir DIR --out OUT

On a cluster the same invocations ship as ``ray job submit -- python -m
openmrs_module_epts_etl_ray ...``. This module OWNS the Ray session
(guarded init + shutdown); the library itself never calls ``ray.init``
per the driver contract.
"""
from __future__ import annotations

import argparse
import json
import sys


def _init_ray():
    import ray

    if not ray.is_initialized():
        # RAY_ADDRESS (preset to "local" in this environment, a cluster
        # address under `ray job submit`) steers the connection
        ray.init(include_dashboard=False, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False


def _emit(obj) -> None:
    print(json.dumps(obj, default=str))


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="openmrs_module_epts_etl_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    rc = sub.add_parser("run-config", help="run a JSON process config")
    rc.add_argument("config")

    rp = sub.add_parser("replay", help="replay an event log into a lake")
    rp.add_argument("event_dir")
    rp.add_argument("lake")
    rp.add_argument("--num-buckets", type=int, default=64)
    rp.add_argument("--engine", choices=["push", "sort"], default="push")
    rp.add_argument("--lsn-lo", type=int, default=None)
    rp.add_argument("--lsn-hi", type=int, default=None)
    rp.add_argument("--dead-letter-dir", default=None)

    tl = sub.add_parser("tail", help="replay in LSN windows until caught up")
    tl.add_argument("event_dir")
    tl.add_argument("lake")
    tl.add_argument("--num-buckets", type=int, default=64)
    tl.add_argument("--window", type=int, default=1_000_000)

    cp = sub.add_parser("compact", help="compact a lake in place")
    cp.add_argument("lake")

    lk = sub.add_parser("lookup", help="point-lookup keys in a lake")
    lk.add_argument("lake")
    lk.add_argument("repo")
    lk.add_argument("path")
    lk.add_argument("--deleted", action="store_true")

    q = sub.add_parser("query", help="run a catalog query over an sf dir")
    q.add_argument("name")
    q.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    q.add_argument("--out", default=None,
                   help="write result parquet here instead of printing a head")
    q.add_argument("--stats", action="store_true",
                   help="also emit per-operator wall seconds from "
                        "Dataset.stats() — the per-stage tuning loop")

    args = p.parse_args(argv)
    _init_ray()
    import ray
    import ray.data as rd

    try:
        if args.cmd == "run-config":
            from .pipelines.config import run_config

            _emit({"outputs": run_config(args.config)})
        elif args.cmd == "replay":
            from .pipelines.replay import replay

            events = rd.read_parquet(args.event_dir)
            # either bound alone is meaningful: --lsn-lo N replays (N, inf),
            # --lsn-hi K replays (watermark, K]; replay() accepts (lo, None)
            rng = (None if args.lsn_lo is None and args.lsn_hi is None
                   else (args.lsn_lo if args.lsn_lo is not None else -1,
                         args.lsn_hi))
            lin = replay(events, args.lake, num_buckets=args.num_buckets,
                         engine=args.engine, lsn_range=rng,
                         dead_letter_dir=args.dead_letter_dir).materialize()
            _emit({"buckets": lin.count(),
                   "rows_applied": int(lin.sum("rows_applied") or 0)})
        elif args.cmd == "tail":
            from .pipelines.replay import replay_until_caught_up

            wins = replay_until_caught_up(
                rd.read_parquet(args.event_dir), args.lake,
                num_buckets=args.num_buckets, window_size=args.window)
            _emit({"windows": len(wins),
                   "rows_applied": sum(int(w.sum("rows_applied") or 0)
                                       for w in wins)})
        elif args.cmd == "compact":
            from .state.compaction import compact_lake

            stats = compact_lake(args.lake)
            _emit({"compacted": args.lake, "buckets": len(stats),
                   "stats": stats.to_pylist()})
        elif args.cmd == "lookup":
            from .pipelines.replay import lookup_keys

            t = lookup_keys(args.lake, [(args.repo, args.path)],
                            include_deleted=args.deleted)
            _emit({"rows": t.to_pylist()})
        elif args.cmd == "query":
            from .pipelines.queries import QUERIES

            res = QUERIES[args.name](args.sf_dir)
            if not isinstance(res, rd.Dataset):
                import pyarrow as pa

                res = rd.from_arrow(res if isinstance(res, pa.Table)
                                    else pa.Table.from_pandas(res))
            if args.out:
                res.write_parquet(args.out)
                payload = {"query": args.name, "out": args.out}
            else:
                res = res.materialize()
                payload = {"query": args.name, "head": res.take(5),
                           "rows": res.count()}
            if args.stats:
                import re as _re

                lines = res.stats().splitlines()
                ops = []
                for ln in lines:
                    m = _re.match(
                        r"Operator (\d+) (.+?): .*\bin ([0-9.]+)s\b",
                        ln.strip())
                    if m:
                        # operator number disambiguates repeated names
                        ops.append({"n": int(m.group(1)),
                                    "operator": m.group(2),
                                    "wall_sec": float(m.group(3))})
                payload["stats"] = ops
                payload["stats_raw_tail"] = lines[-3:]
                if not ops and lines:
                    # Ray reformatted its human-readable stats prose and
                    # the regex matched nothing: surface the drift instead
                    # of silently emitting an empty list (ADVICE r4) — the
                    # raw head+tail keeps the numbers reachable
                    payload["stats_parse_miss"] = (
                        "no 'Operator N ... in Xs' lines matched "
                        f"{len(lines)} stats lines; Ray's stats format "
                        "may have changed — see stats_raw_head/tail")
                    payload["stats_raw_head"] = lines[:5]
            _emit(payload)
        return 0
    finally:
        ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
