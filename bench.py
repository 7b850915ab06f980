"""Benchmark harness (driver contract).

Headline: end-to-end CDC replay throughput — synthesize a zipf-skewed
change-event log to Parquet (untimed), then time the full replay pipeline
(read → partial LWW combine → hash-bucket shuffle → MergeApplier actor pool →
commit-logged lake) and report events/sec. Also times a representative subset
of the queries() catalog over $GRAFT_SF_DIR.

    python bench.py                  # one JSON line (uses $RAY_GRAFT_CPUS, default 32)
    python bench.py --scaling        # N vs 4N cpus in fresh processes + efficiency
    python bench.py --headline-only  # just the replay (used by --scaling children)
"""
from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("BENCH_EVENTS", "32000000"))
N_KEYS = int(os.environ.get("BENCH_KEYS", "2000000"))
# Fixed job shape at every parallelism level (same partitioning == same job;
# only the cluster size varies between scaling runs).
NUM_BUCKETS = int(os.environ.get("BENCH_BUCKETS", "128"))
# = number of event-log files: keeps ReadParquet->PartialLww fused in one
# task (no SplitBlocks stage), so raw events never hit the object store
NUM_READ_BLOCKS = int(os.environ.get("BENCH_READ_BLOCKS", "64"))
# exchange engine for the headline replay: 'push' (bucket-owning
# MergeActors, default) or 'sort' (Dataset groupby exchange) — the A/B
# knob for the multi-node deployment choice documented in BASELINE.md
ENGINE = os.environ.get("BENCH_ENGINE", "push")

BENCH_QUERIES = [
    "cdc_replay_lww", "cdc_events_lww", "pricing_summary", "revenue_by_nation",
    "customers_without_orders", "reconcile_orders", "gap_detect",
    "dedup_exact", "token_stats", "ann_topk", "minhash_near_dups",
    "inconsistency_solver", "lookup_datasource", "simhash_near_dups",
    "quick_merge_customers", "asof_last_purchase",
    "range_join_clicks_after_signup", "windowed_aggregate",
    "embedding_near_dups", "lookup_query_datasource",
    "config_join_extract", "cc_chain_clusters", "late_events",
    "cumulative_value", "pack_sequences", "bloom_reconcile_customers",
    "corpus_mixture", "quality_filter", "term_doc_freq",
    "dedup_passages", "dedup_substrings", "decontaminate",
    "decontaminate_ngrams",
    "top_terms", "deterministic_shuffle",
    "embedding_clusters", "embedding_kmeans", "semdedup_pairs",
    "repetition_stats",
    "incremental_ingest", "redact_terms", "leakage_safe_split",
    "langid", "fingerprints",
    "tfidf_terms", "quota_sample", "user_event_pivot", "lm_bigram_score",
    "asof_next_purchase", "price_histogram", "event_gaps", "rollup_revenue",
    "rolling_spend", "lineitem_long", "dominant_event_type", "activity_reconcile",
    "purchase_pagerank", "scd2_history", "time_travel_snapshot",
    "event_funnel", "retention_cohorts", "qty_discount_corr", "ntile_spend",
    "order_window_overlaps", "value_outliers", "spend_gini", "weekly_growth",
    "event_transitions", "pareto_orders", "priority_status_assoc",
    "props_rollup", "snapshot_diff", "fk_orphans",
    "normalize_docs", "fuzzy_customer_pairs", "multi_stream_merge",
    "pseudonymize_events", "reconciliation_plan", "hot_keys",
    "extract_fields", "bm25_search", "cube_revenue", "user_journeys",
    "context_windows", "incremental_agg", "intersect_extracts",
    "quantize_embeddings", "value_percentiles_cont", "shipping_priority",
    "triangle_count", "value_percent_rank", "table_checksum",
    "approx_top_terms",
    # full-catalog sweep (every queries() entry is timed)
    "ann_ivf_topk",
    "approx_distinct_users",
    "cdc_replay_compacted",
    "cdc_replay_windowed",
    "changed_records",
    "corpus_prep",
    "deterministic_sample",
    "distinct_flag_status",
    "distinct_users_exact",
    "except_extracts",
    "export_roundtrip",
    "fields_mapping",
    "filter_predicate",
    "fk_remap",
    "hash_split",
    "hopping_window",
    "id_collision_repoint",
    "jaccard_pairs",
    "lineage_rollup",
    "load_merge_from_json",
    "lookup_datasource_required",
    "media_features",
    "media_frames",
    "media_resize",
    "multi_dst_fanout",
    "near_dup_clusters",
    "new_and_changed",
    "priority_big_lineitem_orders",
    "quality_scores",
    "schema_evolution",
    "session_windows",
    "surrogate_ids",
    "table_profile",
    "top_orders",
    "top_orders_per_segment",
    "union_extracts",
    "value_percentiles",
    "value_percentiles_approx",
    "re_sync", "multi_origin_merge", "media_png_features", "media_png_resize", "surrogate_ids_dense",
    "quality_logit",
    "span_corrupt",
    "scored_corpus_pack",
    "generic_process",
    "media_jpeg_features",
    "media_jpeg_resize",
    "media_avi_frames",
    "bpe_pair_counts",
    "media_jpeg_progressive",
    "perplexity_buckets",
    "export_roundtrip_gz",
    "media_gif_features",
    "media_gif_resize",
    "media_gif_frames",
    "audio_windows",
    "strip_html",
    "pii_scrub",
    "url_normalize",
    "crawl_prep",
    "readability",
    "audio_resample_windows",
    "link_extract",
    "link_domain_degrees",
    "collocations",
    "inverted_index",
    "anchor_texts",
    "cooccurrence_topk",
    "oov_rate",
    "vocab_coverage",
]


def consume(res):
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.count()
    if isinstance(res, pa.Table):
        return len(res)
    return len(res)


def run_headline(event_dir: str) -> dict:
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.replay import replay

    lake = tempfile.mkdtemp(prefix="bench_lake_", dir="/tmp")
    try:
        events = rd.read_parquet(event_dir, override_num_blocks=NUM_READ_BLOCKS)
        t0 = time.time()
        lineage = replay(events, lake, num_buckets=NUM_BUCKETS,
                         concurrency=(1, NUM_CPUS),
                         engine=ENGINE).materialize()
        dt = time.time() - t0
        applied = int(lineage.sum("rows_applied"))
        return {"replay_sec": round(dt, 3),
                "events_per_sec": round(N_EVENTS / dt, 1),
                "rows_applied": applied}
    finally:
        shutil.rmtree(lake, ignore_errors=True)


def prepare_events() -> str:
    """Synthesize the event log to Parquet once (cached per size/seed).
    A `_SUCCESS` marker guards the cache: a killed generation otherwise
    leaves a partial directory that silently benches a fraction of
    N_EVENTS (observed: a 590s-timeout kill left 64M of 256M rows and the
    next run reported 4x-inflated events/sec)."""
    out = f"/tmp/bench_events_{N_EVENTS}_{N_KEYS}"
    marker = out + "._SUCCESS"  # beside the dir: read_parquet must not see it
    if not os.path.exists(marker):
        from openmrs_module_epts_etl_ray.sources.event_log import synthesize_event_log
        shutil.rmtree(out, ignore_errors=True)
        synthesize_event_log(N_EVENTS, n_keys=N_KEYS, n_shards=64,
                             zipf_s=1.2, dup_rate=0.01).write_parquet(out)
        with open(marker, "w") as fh:
            fh.write("ok")
    else:
        # warm the page cache so timed runs measure compute + shuffle
        for f in os.listdir(out):
            with open(os.path.join(out, f), "rb") as fh:
                while fh.read(1 << 22):
                    pass
    return out


def main():
    warnings.filterwarnings("ignore")
    headline_only = "--headline-only" in sys.argv

    if "--scaling" in sys.argv:
        # Same job (fixed input, fixed num_buckets partitioning) at N and 4N
        # CPUs in fresh processes. taskset pins each child to exactly N
        # physical cores so the small run cannot borrow idle cores — the
        # honest stand-in for two cluster sizes. N=4 vs 4N=16: beyond ~16
        # cores this single node's ONE memory bus saturates (parquet decode +
        # string kernels are stream-bound); real cluster nodes each add their
        # own memory bandwidth. Full curve in BASELINE.md.
        lo = int(os.environ.get("BENCH_SCALE_LO", "4"))
        hi = 4 * lo
        samples = int(os.environ.get("BENCH_SCALE_SAMPLES", "5"))

        def run_at(n: int) -> dict:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(n))
            cmd = [sys.executable, __file__, "--headline-only"]
            if shutil.which("taskset"):
                cmd = ["taskset", "-c", f"0-{n - 1}"] + cmd
            out = subprocess.run(cmd, env=env,
                                 capture_output=True, text=True, check=True).stdout
            return json.loads(out.strip().splitlines()[-1])

        # INTERLEAVED samples (lo, hi, lo, hi, ...): a degraded machine
        # window then degrades both levels of a pair instead of biasing
        # one side of the ratio (the r2 hand-collected 0.77 outlier came
        # from exactly that failure mode)
        effs, pairs = [], []
        for _ in range(samples):
            r_lo, r_hi = run_at(lo), run_at(hi)
            eff = (r_hi["events_per_sec"] / r_lo["events_per_sec"]) / (hi / lo)
            effs.append(round(eff, 3))
            pairs.append({f"sec_{lo}": r_lo["value"], f"sec_{hi}": r_hi["value"],
                          f"events_per_sec_{lo}": r_lo["events_per_sec"],
                          f"events_per_sec_{hi}": r_hi["events_per_sec"],
                          "efficiency": round(eff, 3)})
        s = sorted(effs)
        median = s[len(s) // 2] if len(s) % 2 else (s[len(s) // 2 - 1] + s[len(s) // 2]) / 2
        print(json.dumps({
            "metric": "cdc_replay_scaling", "unit": "events/sec",
            "cpus": [lo, hi], "samples": pairs,
            "efficiencies": effs,
            "efficiency_median": round(median, 3),
            "efficiency_min": min(effs), "efficiency_max": max(effs),
            "n_events": N_EVENTS,
        }))
        return

    import ray
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             logging_level="ERROR")
    from ray.data import DataContext
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.target_max_block_size = 256 * 1024 * 1024

    event_dir = prepare_events()
    head = run_headline(event_dir)

    queries = {}
    if not headline_only:
        # Warm the OS page cache for the input tables (same treatment the
        # event cache gets above): per-query times then measure compute +
        # shuffle, not which query happens to touch a table first. r1
        # implicitly ran warm (event synthesis read `documents` in-process);
        # the on-disk event cache removed that read and silently re-billed
        # the cold `documents` scan to the first documents query.
        for f in sorted(Path(SF_DIR).glob("*.parquet")):
            with open(f, "rb") as fh:
                while fh.read(1 << 22):
                    pass
        from openmrs_module_epts_etl_ray.pipelines.queries import QUERIES
        for name in BENCH_QUERIES:
            t0 = time.time()
            consume(QUERIES[name](SF_DIR))
            queries[name] = round(time.time() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    payload = {
        "metric": "cdc_replay_throughput",
        "value": head["replay_sec"],
        "unit": "sec",
        "events_per_sec": head["events_per_sec"],
        "n_events": N_EVENTS,
        "rows_applied": head["rows_applied"],
        "queries": queries,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        "num_cpus": NUM_CPUS,
    }
    # The driver records only a bounded TAIL of stdout: a 139-entry queries
    # dict makes the closing JSON line unparseable (BENCH_r2-r4 all landed
    # "parsed": null). Keep the LAST line short and machine-readable; the
    # full per-query dict goes to a sibling file (committed per round).
    full_path = str(Path(__file__).parent / "BENCH_FULL.json")
    if not headline_only:   # --scaling children must not clobber a full run
        with open(full_path, "w") as fh:
            json.dump(payload, fh, indent=1, sort_keys=True)
    short = dict(payload)
    cat = sorted(queries.items(), key=lambda kv: -kv[1])
    short["queries"] = dict(cat[:5])          # the 5 slowest, for a glance
    short["queries_total_sec"] = round(sum(queries.values()), 3)
    short["n_queries"] = len(queries)
    short["queries_file"] = full_path
    print(json.dumps(short))
    ray.shutdown()


if __name__ == "__main__":
    main()
