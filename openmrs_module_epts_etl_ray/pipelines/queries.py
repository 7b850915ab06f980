"""Named query/pipeline catalog — one entry per operator family (SURVEY §2).

Each ``q_*`` takes an ``sf_dir`` and returns a Dataset / DataFrame / Table.
``ORACLE_SQL`` holds the DuckDB-equivalent SQL for the strongly-checked
entries (column names matched exactly; floats rounded identically on both
sides). Entries without SQL are non-SQL-expressible (sketchy / stateful) and
get the driver's rows-only check; their real verification lives in tests/.
"""
from __future__ import annotations

import hashlib
import os
import shutil
import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from ..functions.hashing import sha256_hex
from ..sources.event_log import events_from_documents
from ..sources.tables import read_table
from ..stages import dedup, detectors, gap_detect, joins, multimodal, similarity, text as text_stages
from ..stages.idgen import assign_surrogate_ids
from ..stages.inconsistency import resolve_inconsistencies
from ..stages.lookup import datasource_lookup
from ..stages.lww import lww_final_state
from ..stages.schema_evolution import NormalizeBatch
from ..stages.transforms import FieldMapping, RecordTransform, apply_transform, filter_expr
from .replay import read_lake, replay


def _scratch(name: str) -> str:
    """Fresh per-process scratch dir for a query's lake/export output.

    Per-process (pid-suffixed) so two concurrent drivers — bench.py and
    check_oracles.py running the same query — never share and corrupt one
    lake mid-replay. ``GRAFT_FIXED_SCRATCH=1`` opts back into the stable
    path for debugging a lake across runs.
    """
    if os.environ.get("GRAFT_FIXED_SCRATCH"):
        root = f"/tmp/{name}_fixed"
    else:
        root = f"/tmp/graft_q_{os.getpid()}/{name}"
    shutil.rmtree(root, ignore_errors=True)
    return root


# ---------------------------------------------------------------------------
# CDC core
# ---------------------------------------------------------------------------

def q_cdc_replay_lww(sf_dir: str):
    """Flagship: full replay through MergeApplier + commit-log lake
    (SURVEY §2.12 / §7.1). Events derived deterministically from documents."""
    events = events_from_documents(sf_dir)
    lake = _scratch("cdc_lake")
    # 16 buckets ≈ a few hundred keys each at this input size — 32 was
    # over-partitioned (each extra bucket costs a commit-file write)
    replay(events, lake, num_buckets=16).materialize()  # consume lineage
    state = read_lake(lake)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": t["repo"],
            "path": t["path"],
            "last_lsn": t["lsn"],
            "commit": t["commit"],
            "lang": t["lang"],
            "content_sha": t["content_sha"],
        })

    return state.map_batches(project, batch_format="pyarrow")


def q_cdc_events_lww(sf_dir: str):
    """Generic-key LWW final state over the events stream (A4/D1):
    key=user_id, LSN=event_id."""
    ev = read_table(sf_dir, "events")
    out = lww_final_state(ev, key_cols=("user_id",), lsn_col="event_id", num_buckets=32)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "last_event_id": t["event_id"],
            "event_type": t["event_type"],
            "value": t["value"],
            "ts": t["ts"],
        })

    return out.map_batches(project, batch_format="pyarrow")


def q_changed_records(sf_dir: str):
    """Timestamp-predicate change detection (§2.9) + per-type rollup."""
    from ray.data.aggregate import Count, Max

    import datetime

    ev = read_table(sf_dir, "events", columns=["event_type", "ts"])
    changed = detectors.detect_changed_records(
        ev, "ts", datetime.datetime(2024, 1, 20)
    )
    agg = changed.groupby("event_type").aggregate(
        Count(alias_name="n_changed"), Max("ts", alias_name="last_ts")
    )
    return agg


def q_gap_detect(sf_dir: str):
    """Gap detection (M7) over the non-click event_id sequence."""
    ev = read_table(sf_dir, "events", columns=["event_id", "event_type"])
    ids = filter_expr(ev, lambda t: pc.not_equal(t["event_type"], "click"))
    return gap_detect.detect_gaps(ids.select_columns(["event_id"]), "event_id",
                                  range_size=1000)


def q_lineage_rollup(sf_dir: str):
    """Per-partition lineage-style rollup (ST3/A3): bucket = user_id % 16."""
    ev = read_table(sf_dir, "events", columns=["event_id", "user_id"])

    def bucketize(t: pa.Table) -> pa.Table:
        return t.append_column("partition_id",
                               pc.cast(pc.bit_wise_and(t["user_id"], pa.scalar(15)), pa.int64()))

    def rollup(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "partition_id": [g["partition_id"].iloc[0]],
            "n_keys": [g["user_id"].nunique()],
            "n_events": [len(g)],
            "last_lsn": [g["event_id"].max()],
        })

    return (ev.map_batches(bucketize, batch_format="pyarrow")
              .groupby("partition_id")
              .map_groups(rollup, batch_format="pandas"))


def q_schema_evolution(sf_dir: str):
    """Schema unification with null-backfill (S9/F4): two payload epochs
    (even ids: v1 columns; odd ids: v2 with value + renamed props->payload)."""
    ev = read_table(sf_dir, "events")
    target = pa.schema([
        ("event_id", pa.int64()), ("ts", pa.timestamp("us")),
        ("user_id", pa.int64()), ("value", pa.float64()), ("payload", pa.string()),
    ])
    epoch1 = filter_expr(ev, lambda t: pc.equal(pc.bit_wise_and(t["event_id"], 1), 0)) \
        .select_columns(["event_id", "ts", "user_id"]) \
        .map_batches(NormalizeBatch(target=target), batch_format="pyarrow")
    epoch2 = filter_expr(ev, lambda t: pc.equal(pc.bit_wise_and(t["event_id"], 1), 1)) \
        .select_columns(["event_id", "user_id", "value", "props"]) \
        .map_batches(NormalizeBatch(renames={"props": "payload"}, target=target),
                     batch_format="pyarrow")
    return epoch1.union(epoch2)


def q_cdc_replay_windowed(sf_dir: str):
    """Micro-batch resume (ST3/F6): the same replay split into three LSN
    windows over a fresh lake — final state must equal the single-shot
    replay (and its oracle)."""
    # materialize once: three replay windows + the max() probe would
    # otherwise re-execute the event build four times
    events = events_from_documents(sf_dir).materialize()
    lake = _scratch("cdc_lake_w")
    hi = int(events.max("lsn"))
    cuts = [hi // 3, (2 * hi) // 3, hi]
    lo = -1
    for c in cuts:
        replay(events, lake, num_buckets=16, lsn_range=(lo, c)).materialize()
        lo = c
    return _project_lake(read_lake(lake))


def q_cdc_replay_compacted(sf_dir: str):
    """Replay then compact (tombstone GC + snapshot GC): live state must be
    byte-identical to the uncompacted replay — same oracle SQL."""
    from ..state.compaction import compact_lake

    events = events_from_documents(sf_dir)
    lake = _scratch("cdc_lake_c")
    replay(events, lake, num_buckets=16).materialize()
    compact_lake(lake)
    return _project_lake(read_lake(lake))


def _project_lake(state):
    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": t["repo"], "path": t["path"], "last_lsn": t["lsn"],
            "commit": t["commit"], "lang": t["lang"],
            "content_sha": t["content_sha"],
        })
    return state.map_batches(project, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# Relational operators (reference ETL surface)
# ---------------------------------------------------------------------------


def q_inconsistency_solver(sf_dir: str):
    """FK-integrity repair (INCONSISTENCY_SOLVER, J4): orders with a
    deterministically corrupted custkey, repaired to NULL
    (setNullDueInconsistency) with the audit flag."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])

    def corrupt(t: pa.Table) -> pa.Table:
        bad = pc.equal(pc.subtract(t["o_orderkey"],
                                   pc.multiply(pc.divide(t["o_orderkey"], 11), 11)), 0)
        custkey = pc.add(t["o_custkey"],
                         pc.multiply(pc.cast(bad, pa.int64()), 1_000_000))
        return pa.table({"o_orderkey": t["o_orderkey"], "o_custkey": custkey})

    corrupted = orders.map_batches(corrupt, batch_format="pyarrow")
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    fixed = resolve_inconsistencies(
        corrupted, cust, "o_custkey", "c_custkey",
        on_missing="null", report_col="inconsistent")
    return fixed


def q_fk_remap(sf_dir: str):
    """FK key-remap join (J4): orders.o_custkey rewritten through the
    parents' (old -> new) surrogate mapping; custkeys divisible by 5 are
    absent from the mapping and keep their old value (on_missing=keep)."""
    from ..stages.lookup import remap_fk

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    mapping = cust.map_batches(
        lambda t: pa.table({
            "old_key": t["c_custkey"],
            "new_key": pc.add(pc.multiply(t["c_custkey"], 10), 1),
        }), batch_format="pyarrow")
    mapping = filter_expr(mapping, lambda t: pc.not_equal(
        pc.subtract(t["old_key"], pc.multiply(pc.divide(t["old_key"], 5), 5)), 0))
    out = remap_fk(orders, mapping, "o_custkey",
                   old_col="old_key", new_col="new_key", on_missing="keep")
    return out.map_batches(
        lambda t: pa.table({"o_orderkey": t["o_orderkey"],
                            "o_custkey": pc.cast(t["o_custkey"], pa.int64())}),
        batch_format="pyarrow")


def q_new_and_changed(sf_dir: str):
    """NEW vs CHANGED records detector (§2.9): created=ts, changed=ts +
    (event_id % 30) days; classified against the sync start date, rolled up
    per (event_type, class)."""
    from ray.data import aggregate as agg

    import datetime

    ev = read_table(sf_dir, "events", columns=["event_id", "event_type", "ts"])

    def derive(t: pa.Table) -> pa.Table:
        days = pc.subtract(t["event_id"],
                           pc.multiply(pc.divide(t["event_id"], 30), 30))
        delta = pc.multiply(pc.cast(days, pa.int64()),
                            pa.scalar(86_400_000_000, pa.int64()))
        changed = pc.add(t["ts"], pc.cast(delta, pa.duration("us")))
        return pa.table({"event_type": t["event_type"], "created": t["ts"],
                         "changed": changed})

    derived = ev.map_batches(derive, batch_format="pyarrow")
    classified = detectors.classify_new_changed(
        derived, "created", "changed", datetime.datetime(2024, 1, 20))
    return classified.groupby(["event_type", "change_class"]).aggregate(
        agg.Count(alias_name="n"))


def q_lookup_datasource(sf_dir: str):
    """Extra-table datasource (J2, required=false): per-order customer-name
    lookup against a restricted customer slice; misses null-backfill."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cust3 = filter_expr(cust, lambda t: pc.not_equal(
        pc.subtract(t["c_custkey"], pc.multiply(pc.divide(t["c_custkey"], 3), 3)), 0))
    return datasource_lookup(orders, cust3, [("o_custkey", "c_custkey")],
                             required=False, columns=["c_name"])


def q_lookup_datasource_required(sf_dir: str):
    """Extra-table datasource (J2, required=true): unmatched rows drop
    (semi-join with payload)."""
    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    cust3 = filter_expr(cust, lambda t: pc.not_equal(
        pc.subtract(t["c_custkey"], pc.multiply(pc.divide(t["c_custkey"], 3), 3)), 0))
    return datasource_lookup(orders, cust3, [("o_custkey", "c_custkey")],
                             required=True, columns=["c_name"])


def q_id_collision_repoint(sf_dir: str):
    """Metadata id-collision resolution (D2,
    ``AbstractDatabaseObject.java:343-429``): incoming rows contesting an
    existing id (different entity) push the existing row to a fresh id
    (max+rank); same-uuid rows under a new id drop the old row. The remap
    for child re-pointing is exercised in tests; this query checks the
    merged table."""
    from ..stages.id_collision import resolve_id_collisions

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    existing = cust.map_batches(
        lambda t: pa.table({"id": t["c_custkey"], "uuid": t["c_name"]}),
        batch_format="pyarrow")

    def as_incoming(t: pa.Table) -> pa.Table:
        m7 = pc.equal(pc.subtract(t["c_custkey"],
                                  pc.multiply(pc.divide(t["c_custkey"], 7), 7)), 0)
        idc = t.filter(m7)          # id collision, different entity
        m11 = pc.and_(
            pc.equal(pc.subtract(t["c_custkey"],
                                 pc.multiply(pc.divide(t["c_custkey"], 11), 11)), 0),
            pc.invert(m7))
        uc = t.filter(m11)          # uuid collision, new id space
        return pa.table({
            "id": pa.concat_arrays([
                idc["c_custkey"].combine_chunks(),
                pc.add(uc["c_custkey"], 3_000_000).combine_chunks()]),
            "uuid": pa.concat_arrays([
                pc.binary_join_element_wise(
                    idc["c_name"], pa.scalar("_inc"), pa.scalar("")).combine_chunks(),
                uc["c_name"].combine_chunks()]),
        })

    incoming = cust.map_batches(as_incoming, batch_format="pyarrow")
    merged, _remap = resolve_id_collisions(existing, incoming,
                                           id_col="id", uuid_col="uuid")
    return merged


def q_lookup_query_datasource(sf_dir: str):
    """@field-parameterized QUERY datasource (J3,
    ``conf/QueryDataSourceConfig.java:339-350``): per customer, the related
    record loaded by the configured SQL — here the customer's best order
    (max totalprice, orderkey tie-break) — compiled to one vectorized
    DuckDB lateral join per batch (pipelines/config.py)."""
    from .config import QueryDataSourceStage

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    q = ("SELECT o_orderkey AS best_order_id, o_totalprice AS best_total "
         "FROM orders WHERE o_custkey = @c_custkey "
         "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1")
    return cust.map_batches(
        QueryDataSourceStage(sf_dir=sf_dir, query=q, required=False),
        batch_format="pyarrow")


def q_quick_merge_customers(sf_dir: str):
    """Quick-merge with unique-key PK adoption (J5; reference
    ``db_quick_merge_gaza.json`` shape, ``EtlDatabaseObject.java:619-633``):
    destination keyed by its own id; incoming rows arrive in a DIFFERENT id
    space and are matched to existing records by the natural unique key
    (name), adopting the destination id on a hit; unmatched rows insert
    under their own id."""
    from .replay import quick_merge

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name", "c_acctbal"])

    def as_dst(t: pa.Table) -> pa.Table:
        n = len(t)
        return pa.table({
            "id": t["c_custkey"], "name": t["c_name"],
            "acctbal": pc.round(t["c_acctbal"], 2),
            "lsn": pa.array(np.zeros(n, dtype=np.int64)),
            "op": pa.array(["insert"] * n),
        })

    def as_src(t: pa.Table) -> pa.Table:
        mod5 = pc.equal(pc.subtract(t["c_custkey"],
                                    pc.multiply(pc.divide(t["c_custkey"], 5), 5)), 0)
        upd = t.filter(mod5)
        mod7 = pc.equal(pc.subtract(t["c_custkey"],
                                    pc.multiply(pc.divide(t["c_custkey"], 7), 7)), 3)
        new = t.filter(mod7)
        return pa.table({
            "id": pa.concat_arrays([
                pc.add(upd["c_custkey"], 1_000_000).combine_chunks(),
                pc.add(new["c_custkey"], 2_000_000).combine_chunks()]),
            "name": pa.concat_arrays([
                upd["c_name"].combine_chunks(),
                pc.binary_join_element_wise(
                    new["c_name"], pa.scalar("_new"), pa.scalar("")).combine_chunks()]),
            "acctbal": pa.concat_arrays([
                pc.round(pc.multiply(upd["c_acctbal"], 2), 2).combine_chunks(),
                pc.round(pc.add(new["c_acctbal"], 10), 2).combine_chunks()]),
            "lsn": pa.array(np.ones(len(upd) + len(new), dtype=np.int64)),
            "op": pa.array(["update"] * len(upd) + ["insert"] * len(new)),
        })

    lake = _scratch("quick_merge")
    dst = cust.map_batches(as_dst, batch_format="pyarrow")
    src = cust.map_batches(as_src, batch_format="pyarrow")
    quick_merge(dst, lake, key_cols=("id",), unique_keys=[["name"]],
                num_buckets=16).materialize()
    quick_merge(src, lake, key_cols=("id",), unique_keys=[["name"]],
                num_buckets=16).materialize()
    return read_lake(lake).select_columns(["id", "name", "acctbal"])


def q_late_events(sf_dir: str):
    """Event-time watermark / late-arrival detection via the distributed
    prefix scan (stages/scan.py::running_max): watermark = running max of
    event time over arrival order (a deterministic hash permutation of
    event_id stands in for a wire arrival order); rows lagging the
    watermark by > 7 days are late. Oracle: SQL window running MAX."""
    from ..stages.scan import running_max

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "ts"])

    def arrival(t: pa.Table) -> pa.Table:
        a = (t["event_id"].to_numpy() * 2654435761) % (1 << 32)
        return t.append_column("arrival", pa.array(a.astype("int64")))

    scanned = running_max(ev.map_batches(arrival, batch_format="pyarrow"),
                          ["arrival", "event_id"], "ts", out_col="wm")

    def late(df: pd.DataFrame) -> pd.DataFrame:
        keep = df["ts"] + pd.Timedelta(days=7) < df["wm"]
        return df.loc[keep, ["event_id", "event_type", "ts", "wm"]]

    return scanned.map_batches(late, batch_format="pandas")


def q_top_orders_per_segment(sf_dir: str):
    """Grouped top-k (heavy hitters): the 3 highest-value orders per market
    segment (stages/windows.py::grouped_topk — per-block partial top-k
    combiner before the one exchange; A5 first/last probes made per-key)."""
    from ..stages.lookup import datasource_lookup
    from ..stages.windows import grouped_topk

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    enriched = datasource_lookup(orders, cust, [("o_custkey", "c_custkey")],
                                 required=True, columns=["c_mktsegment"])
    top = grouped_topk(enriched, ["c_mktsegment"], "o_totalprice", 3,
                       tiebreak_cols=["o_orderkey"])
    return top.map_batches(
        lambda df: df[["c_mktsegment", "o_orderkey", "o_totalprice"]],
        batch_format="pandas")


def q_table_profile(sf_dir: str):
    """Single-pass per-column profile of orders (nulls / bounds;
    stages/profile.py). The sketch column (approx_distinct) is dropped here
    so the row hashes against an exact SQL oracle; its tolerance is
    asserted in tests."""
    from ..stages.profile import profile_table

    cols = ["o_orderkey", "o_custkey", "o_totalprice", "o_orderdate"]
    orders = read_table(sf_dir, "orders", columns=cols)
    prof = profile_table(orders, columns=cols)
    return prof.map_batches(
        lambda df: df[["column", "n_rows", "n_nulls", "min", "max"]],
        batch_format="pandas")


def q_distinct_users_exact(sf_dir: str):
    """Exact grouped COUNT(DISTINCT) — the truth the HLL sketch
    approximates; per-block (key, value) dedup shrinks the exchange."""
    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    pre = ev.map_batches(
        lambda df: df.drop_duplicates(["event_type", "user_id"]),
        batch_format="pandas")
    return pre.groupby("event_type").map_groups(
        lambda g: pd.DataFrame({
            "event_type": [g["event_type"].iloc[0]],
            "n_users": [int(g["user_id"].nunique())]}),
        batch_format="pandas")


def q_approx_distinct_users(sf_dir: str):
    """Mergeable HLL distinct-user sketch per event type
    (stages/cardinality.py) — the 100-TB path of distinct_users_exact
    (registers exchange instead of raw pairs). Approximate => rows-only;
    tolerance vs exact asserted in tests."""
    from ..stages.cardinality import approx_distinct

    ev = read_table(sf_dir, "events", columns=["event_type", "user_id"])
    return approx_distinct(ev, ["event_type"], "user_id",
                           out_col="n_users_approx")


def q_cumulative_value(sf_dir: str):
    """Cumulative revenue over event order (distributed prefix SUM,
    stages/scan.py::running_sum). Integer cents (floor(value*100)) keep the
    bucketed summation tree exactly equal to the oracle's sequential
    window sum — float prefix sums are order-sensitive in the last ulp.
    The cents kernel is Arrow-native so a null value stays null (numpy
    NaN->int64 is platform garbage, while SQL's CAST yields NULL and
    SUM OVER skips it); running_sum skips nulls to match."""
    from ..stages.scan import running_sum

    ev = read_table(sf_dir, "events", columns=["event_id", "value"])

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.multiply(t["value"], pa.scalar(100.0))),
                    pa.int64())
        return pa.table({"event_id": t["event_id"], "value_cents": c})

    scanned = running_sum(ev.map_batches(cents, batch_format="pyarrow"),
                          ["event_id"], "value_cents", out_col="cum_cents")
    return scanned.map_batches(
        lambda df: df[["event_id", "cum_cents"]], batch_format="pandas")


def q_pack_sequences(sf_dir: str):
    """Sequence packing for training-corpus prep
    (stages/packing.py::pack_sequences): concat documents in doc_id order,
    cut every 2048 tokens; each doc's pack/offset is an exact function of
    the distributed prefix sum of whitespace token counts."""
    from ..functions import text as T
    from ..stages.packing import pack_sequences

    # default byte-proportional block sizing: the packing scan has four
    # sequential stages, so forced micro-blocks multiply task-launch
    # overhead (measured 1.3s -> 0.53s warm at sf0.1; same lesson as
    # deterministic_shuffle)
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_tokens": T.token_count(df["text"]).to_numpy(),
        })

    packed = pack_sequences(docs.map_batches(toks, batch_format="pandas"),
                            order_cols=["doc_id"], token_col="n_tokens",
                            capacity=2048)
    return packed.map_batches(
        lambda df: df[["doc_id", "n_tokens", "pack_id", "pack_offset"]],
        batch_format="pandas")


def q_cc_chain_clusters(sf_dir: str):
    """Oracle-checked connected components: a deterministic chain graph over
    documents (edge (d, d+1) iff d % 5 < 3) whose components are
    gaps-and-islands runs ANSI SQL labels exactly — giving the distributed
    min-label-propagation operator (stages/dedup.py::connected_components)
    a value-checked driver row (near_dup_clusters stays rows-only because
    its LSH input has no SQL form)."""
    from ..stages.dedup import connected_components

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    mx = docs.max("doc_id")

    def edges(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        a = d[(d % 5 < 3) & (d + 1 <= mx)]
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(a + 1, pa.int64())})

    return connected_components(docs.map_batches(edges, batch_format="pyarrow"))


def q_jaccard_pairs(sf_dir: str):
    """Oracle-checked exact n-gram Jaccard: deterministic candidate pairs
    (d, d+100) scored by the shared verification kernel
    (stages/dedup.py::verify_jaccard, threshold=0 keeps every pair) — the
    DuckDB oracle rebuilds 3-word shingle sets with unnest+self-joins."""
    from ..stages.dedup import verify_jaccard

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=16)

    def pairs(t: pa.Table) -> pa.Table:
        d = t["doc_id"].to_numpy()
        a = d[d < 100]
        return pa.table({"id_a": pa.array(a, pa.int64()),
                         "id_b": pa.array(a + 100, pa.int64())})

    cand = docs.map_batches(pairs, batch_format="pyarrow")
    # raw double is byte-safe: both sides divide the same two ints once
    # (IEEE division is exact-deterministic); no rounding rule needed
    return verify_jaccard(cand, docs, threshold=0.0, k=3,
                          strategy="broadcast")


def q_config_join_extract(sf_dir: str):
    """Config-vocabulary extract: ``selfJoinTables`` (multiplicity-preserving
    join into the extract) + ``extraTableDataSource`` (one-row-per-key lookup
    attach) compiled from the reference's JSON shape
    (``pipelines/config.py::compile_extract``; reference
    ``EtlDatabaseObjectSearchParams.java:44-91``, ``conf/SrcConf.java:22-28``)."""
    from .config import compile_extract

    src = {
        "sfDir": sf_dir,
        "tableName": "orders",
        "columns": ["o_orderkey", "o_custkey", "o_totalprice"],
        "extraConditionForExtract": "o_totalprice > 400000",
        "selfJoinTables": [{
            "tableName": "customer",
            "joinType": "inner",
            "columns": ["c_custkey", "c_name", "c_nationkey"],
            "joinFields": [{"srcField": "o_custkey", "dstField": "c_custkey"}],
        }],
        "extraTableDataSource": [{
            "tableName": "nation",
            "required": False,
            "columns": ["n_name"],
            "joinFields": [{"srcField": "c_nationkey", "dstField": "n_nationkey"}],
        }],
    }
    out = compile_extract(src)
    # the join folds the aux key into the src key column (o_custkey ==
    # c_custkey by the join predicate), mirroring SQL USING semantics
    return out.map_batches(
        lambda t: t.select(["o_orderkey", "o_custkey", "o_totalprice",
                            "c_name", "c_nationkey", "n_name"]),
        batch_format="pyarrow")


def q_load_merge_from_json(sf_dir: str):
    """§3.2 file-based sync lifecycle driven ENTIRELY by process configs:
    DB_QUICK_EXPORT (json files) → DB_QUICK_LOAD (stage area) →
    DB_MERGE_FROM_JSON (unique-key merge into the lake), reference
    ``DataLoadProcessor.java:29-48`` → ``MergingRecord.java:44-117``.
    A second export with newer LSNs merges over the first (LWW)."""
    from .config import run_config
    from .export import export_files

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name", "c_mktsegment"])
    base_dir = _scratch("lm_export_base")
    upd_dir = _scratch("lm_export_upd")
    export_files(cust, base_dir, fmt="json")

    def updated(t: pa.Table) -> pa.Table:
        m = pc.equal(pc.subtract(
            t["c_custkey"],
            pc.multiply(pc.divide(t["c_custkey"], 4), 4)), 1)
        u = t.filter(m)
        return pa.table({
            "c_custkey": u["c_custkey"], "c_name": u["c_name"],
            "c_mktsegment": pa.array(["UPDATED"] * len(u)),
        })

    export_files(cust.map_batches(updated, batch_format="pyarrow"),
                 upd_dir, fmt="json")

    stage = _scratch("lm_stage")
    lake = _scratch("lm_lake")
    # base export merges straight from the import dir; the update export
    # goes through the explicit LOAD (stage) step first — both config paths
    run_config({"processType": "DB_MERGE_FROM_JSON", "etlConfiguration": [{
        "srcConf": {"importDir": base_dir, "format": "json", "lsn": 0},
        "dstConf": [{"lakeRoot": lake, "keyCols": ["c_custkey"],
                     "uniqueKeys": [["c_custkey"]], "numBuckets": 16}],
    }]})
    run_config({"processType": "DB_QUICK_LOAD", "etlConfiguration": [{
        "srcConf": {"importDir": upd_dir, "format": "json"},
        "dstConf": [{"stageDir": stage}],
    }]})
    run_config({"processType": "DB_MERGE_FROM_JSON", "etlConfiguration": [{
        "srcConf": {"stageDir": stage, "lsn": 1},
        "dstConf": [{"lakeRoot": lake, "keyCols": ["c_custkey"],
                     "uniqueKeys": [["c_custkey"]], "numBuckets": 16}],
    }]})
    return read_lake(lake).select_columns(
        ["c_custkey", "c_name", "c_mktsegment"])


def q_export_roundtrip(sf_dir: str):
    """File sink + load (S5/S6 + S2): customer → CSV shards → read back."""
    from .export import export_files, read_export

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name", "c_mktsegment"])
    out = _scratch("export_csv")
    export_files(cust, out, fmt="csv")
    return read_export(out, fmt="csv")


def q_export_roundtrip_gz(sf_dir: str):
    """Gzip JSON-lines sink + load (S5/S2, pipelines/export.py fmt
    "json.gz"): documents → compressed .json.gz shards (arrow gzip output
    stream, extension-stamping filename provider) → read back through the
    extension-filtered gzip reader. The wire format of real CDC export
    sites; text payloads make the inflate path non-trivial."""
    from .export import export_files, read_export

    docs = read_table(sf_dir, "documents", columns=["doc_id", "lang", "text"])
    out = _scratch("export_json_gz")
    export_files(docs, out, fmt="json.gz")
    return read_export(out, fmt="json.gz") \
        .select_columns(["doc_id", "lang", "text"])


def q_surrogate_ids(sf_dir: str):
    """Id-generator (ST2): block-allocated surrogate ids; uniqueness/density
    asserted in tests (assignment is nondeterministic → rows-only check)."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    return assign_surrogate_ids(cust, id_col="surrogate_id")

def q_pricing_summary(sf_dir: str):
    """Grouped aggregate with per-batch partial combine (A1-A3 pattern)."""
    from ray.data.aggregate import Count, Sum

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus", "l_quantity",
                             "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        df["disc_price"] = df["l_extendedprice"] * (1 - df["l_discount"])
        g = df.groupby(["l_returnflag", "l_linestatus"], as_index=False).agg(
            pq=("l_quantity", "sum"), pb=("l_extendedprice", "sum"),
            pd_=("disc_price", "sum"), pn=("l_quantity", "size"))
        return pa.Table.from_pandas(g, preserve_index=False)

    partials = li.map_batches(partial, batch_format="pyarrow")
    agg = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("pq", alias_name="sum_qty"), Sum("pb", alias_name="sum_base_price"),
        Sum("pd_", alias_name="sum_disc_price"), Sum("pn", alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "sum_qty": pc.round(t["sum_qty"], 2),
            "sum_base_price": pc.round(t["sum_base_price"], 2),
            "sum_disc_price": pc.round(t["sum_disc_price"], 2),
            "avg_qty": pc.round(pc.divide(t["sum_qty"], pc.cast(t["n"], pa.float64())), 2),
            "n": pc.cast(t["n"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def q_revenue_by_nation(sf_dir: str):
    """Multi-join rollup (J1): lineitem pre-aggregated PER ORDERKEY inside
    each batch BEFORE the shuffle join (the exchange then moves order-level
    partials, not raw lineitems), then orders ⋈ partials, then a
    customer→nation attach — broadcast sorted-array probe when the customer
    key set fits a task heap, shuffle join above ``joins.BROADCAST_THRESHOLD``."""
    import ray
    from ray.data.aggregate import Sum

    nation = read_table(sf_dir, "nation",
                        columns=["n_nationkey", "n_name"]).to_pandas()  # 25 rows
    names = np.empty(int(nation.n_nationkey.max()) + 1, dtype=object)
    names[nation.n_nationkey.to_numpy()] = nation.n_name.to_numpy()
    names_ref = ray.put(names)

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount"])

    def li_partial(df: pd.DataFrame) -> pd.DataFrame:
        df["rev"] = df["l_extendedprice"] * (1 - df["l_discount"])
        return df.groupby("l_orderkey", as_index=False).agg(rev=("rev", "sum"))

    li_agg = li.map_batches(li_partial, batch_format="pandas")
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey"]).materialize()
    cust_ds = read_table(sf_dir, "customer",
                         columns=["c_custkey", "c_nationkey"]).materialize()

    def sorted_arrays(ds, kcol, vcol):
        ks, vs = [], []
        for b in ds.iter_batches(batch_format="pyarrow"):
            ks.append(b[kcol].to_numpy())
            vs.append(b[vcol].to_numpy())
        keys = np.concatenate(ks)
        vals = np.concatenate(vs)
        order = np.argsort(keys)
        return keys[order], vals[order]

    if orders.count() <= joins.BROADCAST_THRESHOLD:
        # both dimension sides fit a task heap: ONE broadcast probe stage,
        # zero shuffle joins — order-level partials map straight to nation
        o_ref = ray.put(sorted_arrays(orders, "o_orderkey", "o_custkey"))
        c_ref = ray.put(sorted_arrays(cust_ds, "c_custkey", "c_nationkey"))

        class RollupBroadcast:
            # instance form: fuses with the read; numpy fetches are
            # zero-copy from the object store per task
            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                ok, oc = ray.get(o_ref)
                ck, cn = ray.get(c_ref)
                names = ray.get(names_ref)
                cust = oc[np.searchsorted(ok, df["l_orderkey"].to_numpy())]
                nk = cn[np.searchsorted(ck, cust)]
                df["n_name"] = names[nk]
                return df.groupby("n_name", as_index=False).agg(rev=("rev", "sum"))

        partials = li_agg.map_batches(RollupBroadcast(), batch_format="pandas")
        agg = partials.groupby("n_name").aggregate(Sum("rev", alias_name="revenue"))
        return agg.map_batches(
            lambda t: pa.table({"n_name": t["n_name"],
                                "revenue": pc.round(t["revenue"], 2)}),
            batch_format="pyarrow")

    joined = joins.inner_join(li_agg, orders, ["l_orderkey"],
                              right_on=("o_orderkey",), num_partitions=16)

    if cust_ds.count() <= joins.BROADCAST_THRESHOLD:
        # broadcast the (sorted custkey, nationkey) arrays — assembled from
        # the distributed scan, probed with vectorized searchsorted
        cust_ref = ray.put(sorted_arrays(cust_ds, "c_custkey", "c_nationkey"))

        class RollupByNation:
            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                keys, vals = ray.get(cust_ref)
                names = ray.get(names_ref)
                nk = vals[np.searchsorted(keys, df["o_custkey"].to_numpy())]
                df["n_name"] = names[nk]
                return df.groupby("n_name", as_index=False).agg(rev=("rev", "sum"))

        partials = joined.map_batches(RollupByNation(), batch_format="pandas")
    else:
        with_cust = joins.inner_join(joined, cust_ds, ["o_custkey"],
                                     right_on=("c_custkey",), num_partitions=16)

        class RollupBig:
            def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
                names = ray.get(names_ref)
                df["n_name"] = names[df["c_nationkey"].to_numpy()]
                return df.groupby("n_name", as_index=False).agg(rev=("rev", "sum"))

        partials = with_cust.map_batches(RollupBig(), batch_format="pandas")

    agg = partials.groupby("n_name").aggregate(Sum("rev", alias_name="revenue"))
    return agg.map_batches(
        lambda t: pa.table({"n_name": t["n_name"], "revenue": pc.round(t["revenue"], 2)}),
        batch_format="pyarrow")


def q_customers_without_orders(sf_dir: str):
    """Anti-join (J6/J8 — NOT EXISTS destination exclusion): customers with
    no completed ('F') order."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    orders = read_table(sf_dir, "orders", columns=["o_custkey", "o_orderstatus"])
    f_orders = filter_expr(orders, lambda t: pc.equal(t["o_orderstatus"], "F"))
    f_orders = f_orders.map_batches(
        lambda t: pa.table({"c_custkey": t["o_custkey"]}), batch_format="pyarrow")
    return joins.anti_join(cust, f_orders, ["c_custkey"])


def q_priority_big_lineitem_orders(sf_dir: str):
    """Semi-join (J7 — EXISTS) + rollup: orders having any lineitem qty>45."""
    from ray.data.aggregate import Count

    orders = read_table(sf_dir, "orders", columns=["o_orderkey", "o_orderpriority"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_quantity"])
    big = filter_expr(li, lambda t: pc.greater(t["l_quantity"], 45.0))
    big = big.map_batches(lambda t: pa.table({"o_orderkey": t["l_orderkey"]}),
                          batch_format="pyarrow")
    hit = joins.semi_join(orders, big, ["o_orderkey"])
    return hit.groupby("o_orderpriority").aggregate(Count(alias_name="n_orders"))


def q_bloom_reconcile_customers(sf_dir: str):
    """NOT EXISTS anti-join through the bloom shortcut
    (stages/joins.py::bloom_anti_join): customers who never placed a small
    order. Definite non-members (the bulk of a 100-TB reconcile scan) are
    final without any exchange; only the bloom-positive rows take the
    exact anti-join. Same answer as the exact paths — the bitmap is built
    from per-block partials, keys never leave their workers."""
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_mktsegment"])
    orders = read_table(sf_dir, "orders",
                        columns=["o_custkey", "o_totalprice"])
    small = filter_expr(orders,
                        lambda t: pc.less(t["o_totalprice"], 5000.0))
    small = small.map_batches(lambda t: pa.table({"c_custkey": t["o_custkey"]}),
                              batch_format="pyarrow")
    miss = joins.bloom_anti_join(cust, small, ["c_custkey"])
    return miss.map_batches(lambda df: df[["c_custkey", "c_mktsegment"]],
                            batch_format="pandas")


def q_reconcile_orders(sf_dir: str):
    """Reconciliation (§3.3): src=orders vs a deterministically perturbed dst
    → missing / outdated / phantom classification in ONE co-grouped shuffle."""
    src = read_table(sf_dir, "orders", columns=["o_orderkey", "o_totalprice"])

    def make_dst(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        kept = df[df.o_orderkey % 13 != 0].copy()
        kept.loc[kept.o_orderkey % 17 == 0, "o_totalprice"] += 1.0
        phantom = df[df.o_orderkey % 19 == 0].copy()
        phantom["o_orderkey"] += 1_000_000
        return pa.Table.from_pandas(pd.concat([kept, phantom]), preserve_index=False)

    dst = src.map_batches(make_dst, batch_format="pyarrow")
    return detectors.reconcile(src, dst, ["o_orderkey"], ["o_totalprice"])


def q_fields_mapping(sf_dir: str):
    """FieldsMapping projection (M1-M3): rename / constant / null / cast /
    field UDF, exactly the reference's dst-row construction."""
    cust = read_table(sf_dir, "customer")
    transform = RecordTransform(mappings=[
        FieldMapping("customer_id", src_field="c_custkey"),
        FieldMapping("customer_name", src_field="c_name"),
        FieldMapping("origin_app", src_value="epts"),
        FieldMapping("legacy_note", map_to_null=True, dtype=pa.string()),
        FieldMapping("acctbal_cents", src_field="c_acctbal",
                     transformer=lambda a: pc.cast(pc.round(pc.multiply(a, 100.0)), pa.int64())),
        FieldMapping("mktsegment", src_field="c_mktsegment",
                     transformer=lambda a: pc.utf8_lower(a)),
    ])
    return apply_transform(cust, transform)


def q_multi_dst_fanout(sf_dir: str):
    """One src -> multiple dstConf mappings in one pass (reference
    EtlItemConfiguration: srcConf + list of dstConf, each with its own
    FieldsMapping). Both destination rows are emitted from ONE scan of the
    src batch and unioned with a dst tag."""
    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name", "c_acctbal", "c_mktsegment"])

    def fanout(t: pa.Table) -> pa.Table:
        dim = pa.table({
            "dst": pa.array(["customer_dim"] * len(t)),
            "customer_id": t["c_custkey"],
            "payload": t["c_name"],
        })
        seg = pa.table({
            "dst": pa.array(["segment_balance"] * len(t)),
            "customer_id": t["c_custkey"],
            "payload": pc.binary_join_element_wise(
                pc.utf8_lower(t["c_mktsegment"]),
                pc.cast(pc.cast(pc.round(pc.multiply(t["c_acctbal"], 100.0)),
                                pa.int64()), pa.string()),
                ":"),
        })
        return pa.concat_tables([dim, seg])

    return cust.map_batches(fanout, batch_format="pyarrow")


def q_filter_predicate(sf_dir: str):
    """Extraction predicate (M4) + scalar aggregate: TPC-H Q6 shape."""
    li = read_table(sf_dir, "lineitem",
                    columns=["l_shipdate", "l_discount", "l_quantity",
                             "l_extendedprice"])

    import datetime

    def pred(t: pa.Table):
        lo = pa.scalar(datetime.datetime(1995, 1, 1), type=pa.timestamp("us"))
        hi = pa.scalar(datetime.datetime(1996, 1, 1), type=pa.timestamp("us"))
        return pc.and_(
            pc.and_(
                pc.greater_equal(t["l_shipdate"], lo),
                pc.less(t["l_shipdate"], hi)),
            pc.and_(
                pc.and_(pc.greater_equal(t["l_discount"], 0.05),
                        pc.less_equal(t["l_discount"], 0.07)),
                pc.less(t["l_quantity"], 24.0)))

    hit = filter_expr(li, pred)

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.sum(pc.multiply(t["l_extendedprice"], t["l_discount"])).as_py() or 0.0
        return pa.table({"rev": pa.array([rev], pa.float64())})

    from ray.data.aggregate import Sum
    total = hit.map_batches(partial, batch_format="pyarrow") \
               .aggregate(Sum("rev", alias_name="revenue"))
    return pa.table({"revenue": pa.array([round(total["revenue"], 2)], pa.float64())})


def q_distinct_flag_status(sf_dir: str):
    """DISTINCT (D4) via groupby-first."""
    li = read_table(sf_dir, "lineitem", columns=["l_returnflag", "l_linestatus"])
    return li.groupby(["l_returnflag", "l_linestatus"]).map_groups(
        lambda g: g.head(1), batch_format="pandas")


def q_top_orders(sf_dir: str):
    """Sort + limit (§2.6) with deterministic tie-break."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_custkey", "o_totalprice"])
    return orders.sort(["o_totalprice", "o_orderkey"], descending=[True, False]).limit(10)


def q_union_extracts(sf_dir: str):
    """Set union (§2.7) of two filtered extracts."""
    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderstatus", "o_totalprice"])
    big_o = filter_expr(orders, lambda t: pc.and_(
        pc.equal(t["o_orderstatus"], "O"), pc.greater(t["o_totalprice"], 400000.0)))
    big_f = filter_expr(orders, lambda t: pc.and_(
        pc.equal(t["o_orderstatus"], "F"), pc.greater(t["o_totalprice"], 400000.0)))
    return big_o.union(big_f).select_columns(["o_orderkey", "o_orderstatus"])


# ---------------------------------------------------------------------------
# Training-data operators
# ---------------------------------------------------------------------------

def q_dedup_exact(sf_dir: str):
    """Exact dedup: hash-partition on content hash + per-group min-id."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    keyed = docs.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"],
                            "text": pc.utf8_slice_codeunits(t["text"], 0, 80)}),
        batch_format="pyarrow")
    return dedup.exact_dedup(keyed, text_col="text", id_col="doc_id")


def q_token_stats(sf_dir: str):
    """Token counting + length stats per document."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)

    def stats(df: pd.DataFrame) -> pd.DataFrame:
        from ..functions import text as T
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_chars": df["text"].str.len().astype("int64").to_numpy(),
            "n_tokens": T.token_count(df["text"]).to_numpy(),
        })

    return docs.map_batches(stats, batch_format="pandas")


def q_quality_scores(sf_dir: str):
    """Quality-scoring features. Exact integer counts (ratio rounding is
    tie-broken differently by DuckDB ROUND vs numpy; counts are exact —
    the ratio form lives in functions.text.quality_metrics)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)

    def score(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_chars": df["text"].str.len().astype("int64").to_numpy(),
            "alpha_chars": df["text"].str.count(r"[A-Za-z]").astype("int64").to_numpy(),
            "spaces": df["text"].str.count(r" ").astype("int64").to_numpy(),
        })

    return docs.map_batches(score, batch_format="pandas")


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k: query matrix broadcast once,
    scatter-gather. Exact-recall oracle on (query, neighbor, rank): the
    returned ids/ranks must equal SQL's full cross-join ranking (cosine
    VALUES stay out of the compared columns — numpy matmul and DuckDB's
    list_cosine_similarity differ in the last ulp, but the synthetic
    embeddings' cosine gaps are orders of magnitude wider, so the ORDER
    is engine-independent)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     override_num_blocks=16)
    qrows = filter_expr(emb, lambda t: pc.less(t["vec_id"], 8)).take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qids = [int(r["vec_id"]) for r in qrows]
    corpus = filter_expr(emb, lambda t: pc.greater_equal(t["vec_id"], 8))
    topk = similarity.brute_force_topk(corpus, Q, qids, k=5)

    def finish(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "query_id": df["query_id"].astype("int64"),
            "vec_id": df["vec_id"].astype("int64"),
            "rank": df["rank"].astype("int64"),
        })

    return topk.map_batches(finish, batch_format="pandas")


def q_corpus_prep(sf_dir: str):
    """Composite training-corpus prep: quality filter -> exact dedup ->
    per-doc stats. The operator-chaining flagship for the training-data
    surface; every stage vectorized, only (sha, id) pairs shuffle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)

    def quality_gate(df: pd.DataFrame) -> pd.DataFrame:
        n_chars = df["text"].str.len()
        alpha = df["text"].str.count(r"[A-Za-z]")
        keep = (n_chars >= 100) & (alpha * 2 >= n_chars)
        return df[keep]

    good = docs.map_batches(quality_gate, batch_format="pandas")
    winners = dedup.exact_dedup(good, text_col="text", id_col="doc_id")

    stats = good.map_batches(
        lambda df: pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "n_chars": df["text"].str.len().astype("int64").to_numpy(),
            "n_tokens": df["text"].str.split().str.len().astype("int64").to_numpy(),
        }), batch_format="pandas")
    kept = joins.semi_join(stats, winners.select_columns(["doc_id"]), ["doc_id"])
    return kept


# -- rows-only checked (non-SQL-expressible; verified in tests/) -----------

def q_minhash_near_dups(sf_dir: str):
    """MinHash-LSH candidates (64 perms, 16 bands) verified by exact
    3-shingle Jaccard >= 0.5. Oracle: brute-force all-pairs Jaccard via an
    inverted shingle index. Ray output is always a SUBSET (the verify
    stage is exact); equality additionally asserts 100% LSH recall, which
    holds at the gate scales because the synthetic near-dup pairs sit far
    above the 0.5 threshold (measured: 28/28 @sf0.001, 25/25 @sf0.01; at
    J=0.9 a missed pair is a ~4e-8 event per the 16x4 banding curve).
    Assumes non-empty texts (two EMPTY docs would pair with Jaccard 1.0 in
    the kernel but have no shingle rows in the SQL; the generated tables
    have none)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    cand = dedup.minhash_lsh_candidates(docs, num_perm=64, num_bands=16, k=3)
    return dedup.verify_jaccard(cand, docs, threshold=0.5, k=3)


def q_simhash_near_dups(sf_dir: str):
    """All pairs with 64-bit SimHash hamming distance <= 3 — EXACT, not
    just rows-checked: ``hasher="sha"`` swaps the SipHash word hash for
    sha256's first 8 bytes (numeric bit order), which DuckDB restates
    verbatim, and the 4x16-bit chunk banding guarantees recall <= 3 by
    pigeonhole, with ``max_bucket=None`` disabling the quadratic guard so
    no collision bucket is truncated (fine at gate scale; at 100 TB keep
    the guard and the SipHash hot path)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    return dedup.simhash_candidates(docs, hasher="sha", max_bucket=None)


def q_langid(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    return text_stages.lang_id(docs)


def q_fingerprints(sf_dir: str):
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    return text_stages.fingerprint(docs)


def q_embedding_near_dups(sf_dir: str):
    """Hyperplane-LSH candidate pairs verified by exact cosine >= 0.5.
    Oracle: brute-force all-pairs cosine (DuckDB list_cosine_similarity);
    equality asserts 100% LSH recall, which holds at gate scales (the
    synthetic near-dups sit near cosine 1.0, everything else below ~0.47
    — measured margin >= 0.03, so the float threshold decision is
    engine-stable too). The cosine column is projected out of the compared
    output (numpy vs DuckDB differ in the last ulp — the ann_topk
    lesson)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     override_num_blocks=16)
    out = dedup.embedding_near_dups(emb, threshold=0.5)
    # return a TYPED frame: a zero-pair corpus (sf0.001) yields a
    # zero-block Dataset whose to_pandas() drops the schema, failing the
    # gate's column compare. The verified-pair relation is sublinear in
    # the corpus (near-dups only), so collecting it here is fine.
    df = out.to_pandas()
    if "id_a" not in df.columns:
        return pd.DataFrame({"id_a": pd.Series(dtype="int64"),
                             "id_b": pd.Series(dtype="int64")})
    return df[["id_a", "id_b"]].astype({"id_a": "int64", "id_b": "int64"})


def q_asof_last_purchase(sf_dir: str):
    """As-of join: for each click, the user's latest purchase at/before the
    click time (point-in-time enrichment; stages/asof.py)."""
    from ..stages.asof import asof_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type", "ts", "value"])
    clicks = filter_expr(ev, lambda t: pc.equal(t["event_type"], "click"))         .map_batches(lambda t: pa.table({
            "click_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"]}),
            batch_format="pyarrow")
    purchases = filter_expr(ev, lambda t: pc.equal(t["event_type"], "purchase"))         .map_batches(lambda t: pa.table({
            "purchase_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"],
            "purchase_value": pc.round(t["value"], 2)}), batch_format="pyarrow")
    out = asof_join(clicks, purchases, by="user_id", on="ts",
                    right_cols=["purchase_id", "purchase_value"],
                    right_order=["purchase_id"])
    return out.map_batches(
        lambda df: df[["click_id", "user_id", "ts", "purchase_id",
                       "purchase_value"]], batch_format="pandas")


def q_range_join_clicks_after_signup(sf_dir: str):
    """Range join: clicks by the same user within 7 days AFTER a signup,
    rolled up per signup (stages/asof.py::range_join)."""
    from ray.data.aggregate import Count

    from ..stages.asof import range_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type", "ts"])
    signups = filter_expr(ev, lambda t: pc.equal(t["event_type"], "signup"))         .map_batches(lambda t: pa.table({
            "signup_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"]}),
            batch_format="pyarrow")
    clicks = filter_expr(ev, lambda t: pc.equal(t["event_type"], "click"))         .map_batches(lambda t: pa.table({
            "click_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"]}),
            batch_format="pyarrow")
    # rollup INSIDE the cogroup bucket (bucket_post): a signup's matches are
    # guaranteed co-resident there, whereas downstream blocks may split one
    # bucket's output at target_max_block_size — a per-block rollup would
    # then emit duplicate signup_id rows with partial counts
    def cnt(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("signup_id", as_index=False).size()
        return out.rename(columns={"size": "n_clicks"})

    return range_join(signups, clicks, by="user_id", on="ts",
                      lo_offset="0s", hi_offset="7D", bucket_post=cnt)


def q_windowed_aggregate(sf_dir: str):
    """Tumbling 1-day event-time windows per event_type (streaming-shaped
    workload expressed batch-native; see stages/windows.py)."""
    from ..stages.windows import tumbling_window_agg

    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = tumbling_window_agg(ev, "ts", every="1D", key_cols=["event_type"],
                              sum_cols=["value"])
    return out.map_batches(
        lambda t: pa.table({
            "window_start": t["window_start"],
            "event_type": t["event_type"],
            "n": t["n"],
            "sum_value": pc.round(t["sum_value"], 2),
        }), batch_format="pyarrow")


def q_value_percentiles(sf_dir: str):
    """Exact per-event_type value percentiles (p50/p90/p99) with a
    self-defined discrete index rule stated identically in the oracle
    (stages/windows.py::grouped_percentiles)."""
    from ..stages.windows import grouped_percentiles

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    return grouped_percentiles(ev, ["event_type"], "value")


def q_value_percentiles_approx(sf_dir: str):
    """Mergeable-sketch percentiles — the fact-scale path of
    value_percentiles (approximate => rows-only; tolerance vs exact is
    asserted in tests)."""
    from ..stages.windows import grouped_percentiles_approx

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    return grouped_percentiles_approx(ev, ["event_type"], "value")


def q_hash_split(sf_dir: str):
    """Deterministic 90/5/5 train/val/test split by sha256(doc_id) prefix —
    reproducible, coordination-free, portable (the oracle computes the
    identical rule in SQL). stages/sampling.py."""
    from ..stages.sampling import hash_split

    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    return hash_split(docs, "doc_id")


def q_deterministic_sample(sf_dir: str):
    """~20% deterministic subsample of lineitem by sha256(l_orderkey,
    l_linenumber) composite — same rows selected in every run and system
    (stages/sampling.py::deterministic_sample)."""
    from ..stages.sampling import deterministic_sample

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity"])
    keyed = li.map_batches(
        lambda t: t.append_column("sample_key", pc.binary_join_element_wise(
            pc.cast(t["l_orderkey"], pa.string()),
            pc.cast(t["l_linenumber"], pa.string()),
            pa.scalar("|", type=pa.string()))),
        batch_format="pyarrow")
    out = deterministic_sample(keyed, "sample_key", 0.2)
    return out.map_batches(lambda t: t.drop_columns(["sample_key"]),
                           batch_format="pyarrow")


def q_term_doc_freq(sf_dir: str):
    """TF-IDF statistics (stages/text.py::term_doc_frequency): per-doc
    term frequency is block-local (a doc is one row); document frequency
    exchanges only (term, partial_count); the df relation broadcasts back.
    Integer-exact relation — the float tf*log(N/df) score is derived
    downstream."""
    from ..stages.text import term_doc_frequency

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=16)
    out = term_doc_frequency(docs, min_tf=3)
    return out.map_batches(lambda df: df[["doc_id", "term", "tf", "df"]],
                           batch_format="pandas")


def q_quality_filter(sf_dir: str):
    """Global-percentile corpus gate: drop the shortest quartile of
    documents. The threshold is an EXACT distributed order statistic
    (stages/selection.py::exact_order_stat — iterative histogram
    refinement, only counts on the wire), then one stateless filter;
    no sort, nothing large driver-side."""
    from ..stages.selection import exact_quantile

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "n_chars"],
                      override_num_blocks=16).materialize()
    thr = exact_quantile(docs, "n_chars", 0.25)
    return docs.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n_chars"], thr)),
        batch_format="pyarrow")


def q_corpus_mixture(sf_dir: str):
    """Per-language corpus mixture weights
    (stages/sampling.py::stratified_sample): keep 50% of en, all of fr,
    25% of es, 80% of de; zh (absent from the rates) falls to the 10%
    default — one stateless vectorized pass over the portable
    sha256-prefix rule, no shuffle, reproducible on any system."""
    from ..stages.sampling import stratified_sample

    docs = read_table(sf_dir, "documents",
                      columns=["doc_id", "lang"], override_num_blocks=16)
    out = stratified_sample(
        docs, "doc_id", "lang",
        {"en": 0.5, "fr": 1.0, "es": 0.25, "de": 0.8},
        default_rate=0.1)
    return out.map_batches(lambda df: df[["doc_id", "lang"]],
                           batch_format="pandas")


def q_hopping_window(sf_dir: str):
    """Hopping (sliding) 3-day windows advancing daily, per event_type —
    every event lands in 3 overlapping windows (stages/windows.py)."""
    from ..stages.windows import hopping_window_agg

    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])
    out = hopping_window_agg(ev, "ts", window="3D", hop="1D",
                             key_cols=["event_type"], sum_cols=["value"])
    # integer cents: parallel partial sums drift by ulps, and round(sum, 2)
    # can land on different representable doubles per summation order;
    # round(sum * 100) is order-stable
    return out.map_batches(
        lambda t: pa.table({
            "window_start": pc.cast(t["window_start"], pa.timestamp("us")),
            "event_type": t["event_type"],
            "n": t["n"],
            "sum_value_cents": pc.cast(
                pc.round(pc.multiply(t["sum_value"], 100), 0), pa.int64()),
        }), batch_format="pyarrow")


def q_session_windows(sf_dir: str):
    """Session windows (gap 2h) per user — the classic streaming
    sessionization expressed batch-native via bucketed cogroup
    (stages/windows.py::session_windows)."""
    from ..stages.windows import session_windows

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    return session_windows(ev, "ts", "user_id", gap="2h")


def q_near_dup_clusters(sf_dir: str):
    """MinHash pairs -> Jaccard verify -> connected components -> canonical
    doc per cluster (the full near-dedup pipeline a training corpus needs).
    Oracle: the brute-force Jaccard edge set (see q_minhash_near_dups'
    recall note) clustered by a recursive min-label CTE."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    cand = dedup.minhash_lsh_candidates(docs, num_perm=64, num_bands=16, k=3)
    verified = dedup.verify_jaccard(cand, docs, threshold=0.5, k=3)
    return dedup.connected_components(verified)


def q_ann_ivf_topk(sf_dir: str):
    """IVF-bucketed approximate top-k (the scale path of ann_topk): coarse
    centroids prune the corpus per query; recall vs brute force asserted in
    tests (approximate => rows-only here)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     override_num_blocks=16)
    qrows = filter_expr(emb, lambda t: pc.less(t["vec_id"], 8)).take_all()
    qrows.sort(key=lambda r: r["vec_id"])
    Q = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in qrows])
    qids = [int(r["vec_id"]) for r in qrows]
    corpus = filter_expr(emb, lambda t: pc.greater_equal(t["vec_id"], 8))
    return similarity.ivf_topk(corpus, Q, qids, k=5, n_cells=16, n_probe=6)


def _media_stat_frame(feats):
    """(media_id, kind, payload_bytes, stat) projection shared by the
    media oracle queries; stat = feature[2] (image mean-R / audio RMS)."""
    def out(df: pd.DataFrame) -> pd.DataFrame:
        stat = (np.stack(df["feature"].to_numpy())[:, 2]
                if len(df) else np.array([], dtype=np.float64))
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "kind": df["kind"].to_numpy(),
            "payload_bytes": df["payload_bytes"].to_numpy(),
            "stat": stat,
        })

    return feats.map_batches(out, batch_format="pandas")


def q_media_resize(sf_dir: str):
    """Image resize with an exact oracle: constant-pixel media resized to
    8x8 keeps its mean (stat) and has closed-form payload length
    (stages/multimodal.py::ResizeStage; audio passes through untouched)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.media_from_ids(docs)
    resized = multimodal.resize_images(media, 8, 8)
    return _media_stat_frame(multimodal.decode_features(resized))


def q_media_frames(sf_dir: str):
    """Video frame-sampling with an exact oracle: deterministic PVF
    containers (stages/multimodal.py::videos_from_ids), every-2nd-frame
    sampling re-encodes each kept frame as a PPM image whose decode stats
    are closed forms of (id, frame index)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    videos = multimodal.videos_from_ids(docs)
    frames = multimodal.sample_frames(videos, every=2)
    return _media_stat_frame(multimodal.decode_features(frames))


def q_media_features(sf_dir: str):
    """Multimodal decode with a DuckDB-checkable oracle: payloads derive
    deterministically from documents.doc_id with constant content, so the
    decoded stat (image mean-R / audio RMS) and payload length are exact
    closed forms of the id (stages/multimodal.py::media_from_ids)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.media_from_ids(docs)
    return _media_stat_frame(multimodal.decode_features(media))


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

def q_dedup_passages(sf_dir: str):
    """C4-style sub-document span dedup: drop globally duplicated 10-word
    passages (first occurrence in (doc_id, position) order wins),
    reassemble each document."""
    # 8 blocks balances chunk/hash compute parallelism against the two
    # exchange stages' per-block overhead at this input size (A/B: 1 block
    # 1.3s, 8 blocks 0.65s, 32 blocks 1.0s warm at sf0.1); at real scale
    # block count follows the file count instead
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=8)
    return dedup.passage_dedup(docs, chunk_words=10)


def q_decontaminate(sf_dir: str):
    """Eval-set decontamination: snippets = substr(text, 10, 30) of docs
    with doc_id < 8; drop every document containing any snippet. The
    snippet probe is a broadcast, not a join."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    ev = filter_expr(docs, lambda t: pc.less(t["doc_id"], 8)).take_all()
    snippets = [r["text"][9:39] for r in ev]
    clean = text_stages.decontaminate(docs, snippets)
    return clean.map_batches(
        lambda t: pa.table({
            "doc_id": t["doc_id"],
            "n_chars": pc.cast(pc.utf8_length(t["text"]), pa.int64()),
        }), batch_format="pyarrow")


def q_dedup_substrings(sf_dir: str):
    """ExactSubstr-style duplicated-span stats: per document, the count of
    25-char window starts whose substring occurs >= 2 times in the corpus
    and the characters covered by their union (the cleaned text itself is
    brute-force-verified in tests; the oracle checks the two exact
    counts). 8 blocks: the convolution pass needs parallelism (1 block
    benched 8-9 s, 8 blocks ~2 s warm at sf0.1) but 32 micro-blocks pay
    barrier overhead (~4 s); at real scale block count follows file
    count."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=8)
    out = dedup.exact_substring_dedup(docs, min_len=25)
    return out.map_batches(
        lambda t: t.select(["doc_id", "n_dup_starts", "n_dup_chars"]),
        batch_format="pyarrow")


def q_embedding_kmeans(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (iterative
    algorithm — rows-only driver check; exactness vs a pure-numpy Lloyd
    with identical init is property-tested)."""
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     override_num_blocks=16)
    assign, _ = similarity.kmeans(emb, k=8, iters=5)
    return assign


def q_top_terms(sf_dir: str):
    """Corpus-wide exact heavy hitters: top-100 whitespace tokens by
    count, tie-broken by term ascending. Partial counts fold inside each
    block; only (term, count) pairs shuffle. Byte-proportional block
    count — the groupby+sort barriers multiply per-block overhead, so
    forcing 32 micro-blocks on this input benched 3x slower."""
    docs = read_table(sf_dir, "documents", columns=["text"])
    return text_stages.top_terms(docs, k=100)


def q_decontaminate_ngrams(sf_dir: str):
    """GPT-3-style 13-gram decontamination audit: per document, the count
    of sliding word 13-grams that also occur in the eval slice
    (doc_id < 8); n_hits > 0 marks a contaminated document."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    ev = filter_expr(docs, lambda t: pc.less(t["doc_id"], 8)).take_all()
    return text_stages.decontaminate_ngrams(
        docs, [r["text"] for r in ev], n=13)


def q_deterministic_shuffle(sf_dir: str):
    """Seeded portable global shuffle position per document (hash-sort,
    the way a 100-TB corpus is actually shuffled for training)."""
    from ..stages.sampling import shuffle_rank
    # default byte-proportional block sizing: the scan has FOUR sequential
    # stages, so forcing 32 micro-blocks on a single-digit-MB id column
    # quadruples task-launch overhead (measured 4.2s -> ~1s at sf0.1)
    docs = read_table(sf_dir, "documents", columns=["doc_id"])
    return shuffle_rank(docs, "doc_id", seed="epoch0")


def q_repetition_stats(sf_dir: str):
    """Gopher-style repetition signals: total/distinct/max-count word
    bigrams per document, shuffle-free (per-doc stat stays in its batch)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    return text_stages.repetition_stats(docs)


def q_bpe_pair_counts(sf_dir: str):
    """Round-0 BPE tokenizer-training statistics: the 50 most frequent
    adjacent character pairs across the corpus, weighted by word
    frequency (the relation whose argmax is the first merge rule). The
    corpus-sized exchange moves only (word, partial_count); pair
    counting runs over the vocabulary-sized relation
    (stages/bpe.py::top_pairs; Sennrich, Haddow & Birch 2016)."""
    from ..stages import bpe
    docs = read_table(sf_dir, "documents", columns=["text"],
                      override_num_blocks=32)
    return bpe.top_pairs(docs, k=50)


def q_leakage_safe_split(sf_dir: str):
    """Dedup-aware train/val/test split: the portable sha-prefix rule keyed
    on CONTENT, not id — identical documents land in the same split, so
    exact duplicates can never straddle train and test (eval-leakage
    guard). Stateless; same rule family as hash_split."""
    from ..stages.sampling import hash_split
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    out = hash_split(docs, "text")
    return out.select_columns(["doc_id", "split"])


def q_redact_terms(sf_dir: str):
    """Badword/PII-style scrubbing: whole-word masking via one RE2
    alternation kernel per batch (portable to DuckDB regexp_replace)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=32)
    return text_stages.redact_terms(
        docs, ["customer", "spark", "join"], "[X]")


def q_incremental_ingest(sf_dir: str):
    """Incremental corpus update: of the incoming batch (all documents),
    keep only content NOT already in the ingested corpus (doc_id < 400),
    matched by content sha. The bloom pre-pass means at 100 TB the vast
    majority of already-seen content never shuffles (definite non-members
    are final locally); only bloom-positive rows take the exact anti-join."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=16)

    def shas(t: pa.Table) -> pa.Table:
        return pa.table({"doc_id": t["doc_id"],
                         "content_sha": sha256_hex(pc.fill_null(t["text"], ""))})

    hashed = docs.map_batches(shas, batch_format="pyarrow")
    ingested = filter_expr(hashed, lambda t: pc.less(t["doc_id"], 400)) \
        .select_columns(["content_sha"])
    return joins.bloom_anti_join(hashed, ingested, ["content_sha"])


def _centroid_rows(sf_dir: str, k: int = 8):
    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"],
                     override_num_blocks=16)
    rows = filter_expr(emb, lambda t: pc.less(t["vec_id"], k)).take_all()
    rows.sort(key=lambda r: r["vec_id"])
    C = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    return emb, C, np.array([int(r["vec_id"]) for r in rows], dtype=np.int64)


def q_embedding_clusters(sf_dir: str):
    """SemDeDup coarse step: max-cosine assignment of every vector to the
    8 fixed centroids (vec_id < 8) — broadcast matmul, no shuffle."""
    emb, C, cids = _centroid_rows(sf_dir)
    out = similarity.assign_clusters(emb, C, cids)
    return out.map_batches(
        lambda df: pd.DataFrame({
            "vec_id": df["vec_id"].astype("int64"),
            "cluster_id": df["cluster_id"].astype("int64"),
            "cosine": df["cosine"].round(4),
        }), batch_format="pandas")


def q_semdedup_pairs(sf_dir: str):
    """SemDeDup: exact pairwise cosine only WITHIN each coarse cluster;
    one shuffle on cluster_id, quadratic work bounded per cluster."""
    emb, C, cids = _centroid_rows(sf_dir)
    pairs = similarity.semdedup_pairs(emb, C, cids, threshold=0.4)
    return pairs.map_batches(
        lambda df: pd.DataFrame({
            "id_a": df["id_a"].astype("int64"),
            "id_b": df["id_b"].astype("int64"),
            "cluster_id": df["cluster_id"].astype("int64"),
            "cosine": df["cosine"].round(4),
        }), batch_format="pandas")


def q_tfidf_terms(sf_dir: str):
    """Per-document top-5 distinguishing terms scored ``tf / df``
    (stages/text.py::tfidf_top_terms — keyword extraction): the df
    relation is a vocab-sized broadcast probed with one hashed
    ``index_in`` kernel; tf + ranking run inside the batch that exploded
    the doc, where doc integrity is guaranteed (downstream blocks split)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=16).materialize()
    return text_stages.tfidf_top_terms(docs, k=5)


def q_quota_sample(sf_dir: str):
    """Per-source document quota (stages/sampling.py::quota_sample): at
    most 7 docs per source, chosen as the 7 smallest sha256(doc_id) — the
    absolute-cap companion to the rate-based corpus mixture. Per-block
    partial top-k bounds the exchange at k rows per (group, block)."""
    from ..stages.sampling import quota_sample

    docs = read_table(sf_dir, "documents", columns=["doc_id", "source"],
                      override_num_blocks=16)
    return quota_sample(docs, "doc_id", "source", 7)


def q_user_event_pivot(sf_dir: str):
    """Long→wide feature pivot (stages/pivot.py::pivot_counts): one row
    per user with per-event-type int64 counts. The crosstab folds inside
    each block (one bincount per category), so the groupby sums
    pre-collapsed partials — at most one row per (user, block) moves."""
    from ..stages.pivot import pivot_counts

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    return pivot_counts(ev, "user_id", "event_type",
                        ["click", "view", "purchase", "signup", "error"])


def q_lm_bigram_score(sf_dir: str):
    """CCNet-shaped LM quality scoring (stages/lm.py): train a bigram
    count model on the even-doc_id half of the corpus (partial
    value_counts → vocab-sized groupby → one broadcast), score every
    document shuffle-free. Integer outputs only here — the float
    avg_logprob derives from the same counts and is property-tested
    (libm ``ln`` is not byte-portable across engines)."""
    from ..stages.lm import score_bigram_lm, train_bigram_model

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=16).materialize()
    train = filter_expr(docs,
                        lambda t: pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))
    model = train_bigram_model(train)
    out = score_bigram_lm(docs, model)
    return out.select_columns(["doc_id", "n_bigrams", "sum_count", "n_oov"])


def q_perplexity_buckets(sf_dir: str):
    """CCNet head/middle/tail corpus split (stages/lm.py::
    perplexity_buckets, Wenzek et al. 2020): train the bigram LM on the
    even-doc_id half, score everything with the integer OOV-per-mille
    surrogate, cut exact terciles from the <=1001-row score histogram —
    one counts-sized exchange, no corpus sort. The SQL oracle restates
    the order-statistic thresholds with a window rank."""
    from ..stages.lm import perplexity_buckets, train_bigram_model

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=16).materialize()
    train = filter_expr(docs,
                        lambda t: pc.equal(pc.bit_wise_and(t["doc_id"], 1), 0))
    model = train_bigram_model(train)
    return perplexity_buckets(docs, model)


def q_asof_next_purchase(sf_dir: str):
    """Forward as-of join with tolerance (stages/asof.py): for each
    signup, the user's FIRST purchase within 7 days after it ("time to
    first conversion") — unmatched signups null-backfill. Same bucketed
    cogroup as the backward as-of; one shuffle."""
    from ..stages.asof import asof_join

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type", "ts", "value"])
    signups = filter_expr(ev, lambda t: pc.equal(t["event_type"], "signup")) \
        .map_batches(lambda t: pa.table({
            "signup_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"]}),
            batch_format="pyarrow")
    purchases = filter_expr(ev, lambda t: pc.equal(t["event_type"], "purchase")) \
        .map_batches(lambda t: pa.table({
            "purchase_id": t["event_id"], "user_id": t["user_id"], "ts": t["ts"],
            "purchase_value": pc.round(t["value"], 2)}), batch_format="pyarrow")
    out = asof_join(signups, purchases, by="user_id", on="ts",
                    right_cols=["purchase_id", "purchase_value"],
                    right_order=["purchase_id"],
                    direction="forward", tolerance=pd.Timedelta(days=7))
    return out.map_batches(
        lambda df: df[["signup_id", "user_id", "ts", "purchase_id",
                       "purchase_value"]], batch_format="pandas")


def q_price_histogram(sf_dir: str):
    """Fixed-width numeric histogram (stages/selection.py::
    numeric_histogram) over lineitem extended price: bins-sized exchange,
    IEEE-portable bin rule floor(x / 5000)."""
    from ..stages.selection import numeric_histogram

    li = read_table(sf_dir, "lineitem", columns=["l_extendedprice"])
    return numeric_histogram(li, "l_extendedprice", 5000.0)


def q_event_gaps(sf_dir: str):
    """Per-user inter-arrival gaps (stages/windows.py::lag_gaps — the LAG
    window function): microseconds since the same user's previous event,
    NULL for each user's first. One hash-bucket shuffle co-locates a
    user's timeline; one vectorized sort + shifted compare per bucket."""
    from ..stages.windows import lag_gaps

    ev = read_table(sf_dir, "events", columns=["event_id", "user_id", "ts"])
    out = lag_gaps(ev, key_col="user_id", ts_col="ts",
                   order_cols=["event_id"])
    return out.select_columns(["event_id", "user_id", "ts", "gap_us"])


def q_rollup_revenue(sf_dir: str):
    """GROUP BY ROLLUP(event_type, day) in integer cents
    (stages/pivot.py::rollup_sum): the corpus aggregates once at the
    finest grain; subtotal and grand-total levels re-aggregate that
    groups-sized relation, never the input."""
    from ..stages.pivot import rollup_sum

    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "day": pc.strftime(t["ts"], format="%Y-%m-%d"),
            "cents": pa.array(
                np.floor(t["value"].to_numpy() * 100).astype("int64")),
        })

    return rollup_sum(ev.map_batches(base, batch_format="pyarrow"),
                      ["event_type", "day"], ["cents"])


QUERIES = {
    "cdc_replay_lww": q_cdc_replay_lww,
    "cdc_replay_windowed": q_cdc_replay_windowed,
    "cdc_replay_compacted": q_cdc_replay_compacted,
    "cdc_events_lww": q_cdc_events_lww,
    "inconsistency_solver": q_inconsistency_solver,
    "fk_remap": q_fk_remap,
    "new_and_changed": q_new_and_changed,
    "lookup_datasource": q_lookup_datasource,
    "lookup_datasource_required": q_lookup_datasource_required,
    "lookup_query_datasource": q_lookup_query_datasource,
    "id_collision_repoint": q_id_collision_repoint,
    "config_join_extract": q_config_join_extract,
    "cc_chain_clusters": q_cc_chain_clusters,
    "late_events": q_late_events,
    "cumulative_value": q_cumulative_value,
    "pack_sequences": q_pack_sequences,
    "top_orders_per_segment": q_top_orders_per_segment,
    "distinct_users_exact": q_distinct_users_exact,
    "table_profile": q_table_profile,
    "approx_distinct_users": q_approx_distinct_users,
    "jaccard_pairs": q_jaccard_pairs,
    "load_merge_from_json": q_load_merge_from_json,
    "value_percentiles": q_value_percentiles,
    "value_percentiles_approx": q_value_percentiles_approx,
    "hash_split": q_hash_split,
    "deterministic_sample": q_deterministic_sample,
    "corpus_mixture": q_corpus_mixture,
    "quality_filter": q_quality_filter,
    "term_doc_freq": q_term_doc_freq,
    "hopping_window": q_hopping_window,
    "session_windows": q_session_windows,
    "quick_merge_customers": q_quick_merge_customers,
    "export_roundtrip": q_export_roundtrip,
    "export_roundtrip_gz": q_export_roundtrip_gz,
    "surrogate_ids": q_surrogate_ids,
    "changed_records": q_changed_records,
    "gap_detect": q_gap_detect,
    "lineage_rollup": q_lineage_rollup,
    "schema_evolution": q_schema_evolution,
    "pricing_summary": q_pricing_summary,
    "revenue_by_nation": q_revenue_by_nation,
    "customers_without_orders": q_customers_without_orders,
    "priority_big_lineitem_orders": q_priority_big_lineitem_orders,
    "bloom_reconcile_customers": q_bloom_reconcile_customers,
    "reconcile_orders": q_reconcile_orders,
    "fields_mapping": q_fields_mapping,
    "multi_dst_fanout": q_multi_dst_fanout,
    "filter_predicate": q_filter_predicate,
    "distinct_flag_status": q_distinct_flag_status,
    "top_orders": q_top_orders,
    "union_extracts": q_union_extracts,
    "dedup_exact": q_dedup_exact,
    "corpus_prep": q_corpus_prep,
    "token_stats": q_token_stats,
    "quality_scores": q_quality_scores,
    "ann_topk": q_ann_topk,
    "minhash_near_dups": q_minhash_near_dups,
    "simhash_near_dups": q_simhash_near_dups,
    "langid": q_langid,
    "fingerprints": q_fingerprints,
    "embedding_near_dups": q_embedding_near_dups,
    "asof_last_purchase": q_asof_last_purchase,
    "range_join_clicks_after_signup": q_range_join_clicks_after_signup,
    "windowed_aggregate": q_windowed_aggregate,
    "near_dup_clusters": q_near_dup_clusters,
    "ann_ivf_topk": q_ann_ivf_topk,
    "repetition_stats": q_repetition_stats,
    "bpe_pair_counts": q_bpe_pair_counts,
    "incremental_ingest": q_incremental_ingest,
    "redact_terms": q_redact_terms,
    "leakage_safe_split": q_leakage_safe_split,
    "embedding_clusters": q_embedding_clusters,
    "semdedup_pairs": q_semdedup_pairs,
    "dedup_passages": q_dedup_passages,
    "decontaminate": q_decontaminate,
    "decontaminate_ngrams": q_decontaminate_ngrams,
    "top_terms": q_top_terms,
    "embedding_kmeans": q_embedding_kmeans,
    "dedup_substrings": q_dedup_substrings,
    "deterministic_shuffle": q_deterministic_shuffle,
    "media_features": q_media_features,
    "media_resize": q_media_resize,
    "media_frames": q_media_frames,
    "tfidf_terms": q_tfidf_terms,
    "quota_sample": q_quota_sample,
    "user_event_pivot": q_user_event_pivot,
    "lm_bigram_score": q_lm_bigram_score,
    "perplexity_buckets": q_perplexity_buckets,
    "asof_next_purchase": q_asof_next_purchase,
    "price_histogram": q_price_histogram,
    "event_gaps": q_event_gaps,
    "rollup_revenue": q_rollup_revenue,
}

ORACLE_SQL = {
    "cdc_replay_lww": """
WITH v(v) AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(v)),
ev AS (
  SELECT 'r' || CAST(d.doc_id % 97 AS VARCHAR) AS repo,
         'f/' || CAST(d.doc_id AS VARCHAR) AS path,
         CAST(d.doc_id * 10 + v.v AS BIGINT) AS lsn,
         substring(sha256('c' || CAST(d.doc_id * 10 + v.v AS VARCHAR)), 1, 40) AS commit,
         CASE WHEN v.v = d.doc_id % 4 AND d.doc_id % 7 = 0 THEN 'delete'
              WHEN v.v = 0 THEN 'insert' ELSE 'update' END AS op,
         CASE WHEN v.v = d.doc_id % 4 AND d.doc_id % 7 = 0 THEN NULL
              ELSE d.lang END AS lang,
         CASE WHEN v.v = d.doc_id % 4 AND d.doc_id % 7 = 0 THEN NULL
              ELSE d.text || '::v' || CAST(v.v AS VARCHAR) END AS content
  FROM documents d JOIN v ON v.v <= d.doc_id % 4
),
w AS (SELECT repo, path, MAX(lsn) AS last_lsn FROM ev GROUP BY repo, path)
SELECT e.repo, e.path, w.last_lsn, e.commit, e.lang, sha256(e.content) AS content_sha
FROM ev e JOIN w ON e.repo = w.repo AND e.path = w.path AND e.lsn = w.last_lsn
WHERE e.op <> 'delete'
""",
    "inconsistency_solver": """
WITH c AS (
  SELECT o_orderkey,
         o_custkey + CASE WHEN o_orderkey % 11 = 0 THEN 1000000 ELSE 0 END AS k
  FROM orders
)
SELECT o_orderkey,
       CASE WHEN k IN (SELECT c_custkey FROM customer) THEN k END AS o_custkey,
       k NOT IN (SELECT c_custkey FROM customer) AS inconsistent
FROM c
""",
    "fk_remap": """
SELECT o.o_orderkey,
       CASE WHEN o.o_custkey % 5 <> 0 THEN o.o_custkey * 10 + 1
            ELSE o.o_custkey END AS o_custkey
FROM orders o
""",
    "new_and_changed": """
WITH d AS (
  SELECT event_type, ts AS created,
         ts + (event_id % 30) * INTERVAL 1 DAY AS changed
  FROM events
)
SELECT event_type,
       CASE WHEN created >= TIMESTAMP '2024-01-20' THEN 'new'
            WHEN changed >= TIMESTAMP '2024-01-20' THEN 'changed' END AS change_class,
       CAST(COUNT(*) AS BIGINT) AS n
FROM d
WHERE created >= TIMESTAMP '2024-01-20' OR changed >= TIMESTAMP '2024-01-20'
GROUP BY 1, 2
""",
    "id_collision_repoint": """
WITH ex AS (SELECT c_custkey AS id, c_name AS uuid FROM customer),
mx AS (SELECT MAX(id) AS m FROM (
    SELECT id FROM ex
    UNION ALL SELECT id FROM ex WHERE id % 7 = 0
    UNION ALL SELECT id + 3000000 FROM ex WHERE id % 11 = 0 AND id % 7 <> 0)),
idc AS (SELECT id, uuid, row_number() OVER (ORDER BY id) AS rn
        FROM ex WHERE id % 7 = 0),
keep AS (SELECT id, uuid FROM ex WHERE id % 7 <> 0 AND id % 11 <> 0)
SELECT id, uuid FROM keep
UNION ALL SELECT (SELECT m FROM mx) + rn AS id, uuid FROM idc
UNION ALL SELECT id, uuid || '_inc' AS uuid FROM ex WHERE id % 7 = 0
UNION ALL SELECT id + 3000000 AS id, uuid FROM ex
          WHERE id % 11 = 0 AND id % 7 <> 0
""",
    "lookup_query_datasource": """
SELECT c.c_custkey, c.c_name, b.best_order_id, b.best_total
FROM customer c LEFT JOIN (
  SELECT o_custkey, o_orderkey AS best_order_id, o_totalprice AS best_total,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) b ON b.o_custkey = c.c_custkey AND b.rn = 1
""",
    "quick_merge_customers": """
WITH src AS (
  SELECT c_custkey + 1000000 AS id, c_name AS name,
         ROUND(c_acctbal * 2, 2) AS acctbal
  FROM customer WHERE c_custkey % 5 = 0
  UNION ALL
  SELECT c_custkey + 2000000 AS id, c_name || '_new' AS name,
         ROUND(c_acctbal + 10, 2) AS acctbal
  FROM customer WHERE c_custkey % 7 = 3
),
dst AS (SELECT c_custkey AS id, c_name AS name, ROUND(c_acctbal, 2) AS acctbal
        FROM customer)
SELECT COALESCE(d.id, s.id) AS id,
       COALESCE(s.name, d.name) AS name,
       COALESCE(s.acctbal, d.acctbal) AS acctbal
FROM dst d FULL OUTER JOIN src s ON s.name = d.name
""",
    "lookup_datasource": """
SELECT o.o_orderkey, o.o_custkey, c.c_name
FROM orders o
LEFT JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_custkey % 3 <> 0
""",
    "lookup_datasource_required": """
SELECT o.o_orderkey, o.o_custkey, c.c_name
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey AND c.c_custkey % 3 <> 0
""",
    "export_roundtrip": """
SELECT c_custkey, c_name, c_mktsegment FROM customer
""",
    "export_roundtrip_gz": """
SELECT doc_id, lang, text FROM documents
""",
    "table_profile": """
SELECT 'o_orderkey' AS "column", CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(*) - COUNT(o_orderkey) AS BIGINT) AS n_nulls,
       CAST(MIN(o_orderkey) AS VARCHAR) AS "min",
       CAST(MAX(o_orderkey) AS VARCHAR) AS "max"
FROM orders
UNION ALL
SELECT 'o_custkey', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT),
       CAST(MIN(o_custkey) AS VARCHAR), CAST(MAX(o_custkey) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_totalprice', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT),
       CAST(MIN(o_totalprice) AS VARCHAR), CAST(MAX(o_totalprice) AS VARCHAR)
FROM orders
UNION ALL
SELECT 'o_orderdate', CAST(COUNT(*) AS BIGINT),
       CAST(COUNT(*) - COUNT(o_orderdate) AS BIGINT),
       CAST(MIN(o_orderdate) AS VARCHAR), CAST(MAX(o_orderdate) AS VARCHAR)
FROM orders
""",
    "distinct_users_exact": """
SELECT event_type, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM events GROUP BY event_type
""",
    "top_orders_per_segment": """
WITH j AS (
  SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
         row_number() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey)
SELECT c_mktsegment, o_orderkey, o_totalprice FROM j WHERE rn <= 3
""",
    "cumulative_value": """
SELECT event_id,
       CAST(SUM(CAST(FLOOR(value * 100) AS BIGINT))
              OVER (ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS BIGINT) AS cum_cents
FROM events
""",
    "late_events": """
WITH w AS (
  SELECT event_id, event_type, ts,
         MAX(ts) OVER (ORDER BY (event_id * 2654435761) % 4294967296,
                                event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS wm
  FROM events)
SELECT event_id, event_type, ts, wm FROM w
WHERE ts + INTERVAL 7 DAY < wm
""",
    "jaccard_pairs": """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
  FROM documents),
tok AS (  -- parallel unnest zips (word, position)
  SELECT doc_id, unnest(w) AS word,
         unnest(range(1, len(w) + 1)) AS pos
  FROM t),
tri AS (
  SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
shingle AS (    -- docs shorter than 3 words: one shingle of all their words
  SELECT DISTINCT doc_id, sh FROM tri
  UNION
  SELECT doc_id, array_to_string(w, ' ') AS sh FROM t
  WHERE len(w) > 0 AND len(w) < 3),
p AS (SELECT doc_id AS id_a, doc_id + 100 AS id_b FROM documents
      WHERE doc_id < 100),
marks AS (
  SELECT p.id_a, p.id_b, s.sh,
         MAX(CASE WHEN s.doc_id = p.id_a THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN s.doc_id = p.id_b THEN 1 ELSE 0 END) AS in_b
  FROM p JOIN shingle s ON s.doc_id IN (p.id_a, p.id_b)
  GROUP BY p.id_a, p.id_b, s.sh),
agg AS (
  SELECT id_a, id_b, SUM(in_a * in_b) AS i, COUNT(*) AS u
  FROM marks GROUP BY id_a, id_b)
SELECT p.id_a, p.id_b,
       COALESCE(a.i * 1.0 / NULLIF(a.u, 0), 1.0) AS jaccard
FROM p LEFT JOIN agg a ON a.id_a = p.id_a AND a.id_b = p.id_b
""",
    "cc_chain_clusters": """
WITH lim AS (SELECT MIN(doc_id) AS mn, MAX(doc_id) AS mx FROM documents),
e AS (SELECT doc_id AS a, doc_id + 1 AS b FROM documents, lim
      WHERE doc_id % 5 < 3 AND doc_id + 1 <= mx),
v AS (SELECT DISTINCT id
      FROM (SELECT a AS id FROM e UNION ALL SELECT b AS id FROM e) u),
s AS (SELECT id,
             CASE WHEN (id - 1) % 5 < 3 AND id - 1 >= (SELECT mn FROM lim)
                  THEN 0 ELSE 1 END AS is_start
      FROM v),
g AS (SELECT id, SUM(is_start) OVER (ORDER BY id) AS grp FROM s)
SELECT id AS doc_id, MIN(id) OVER (PARTITION BY grp) AS canonical_id FROM g
""",
    "config_join_extract": """
SELECT o.o_orderkey, o.o_custkey, o.o_totalprice,
       c.c_name, c.c_nationkey, n.n_name
FROM orders o
JOIN customer c ON c.c_custkey = o.o_custkey
LEFT JOIN nation n ON n.n_nationkey = c.c_nationkey
WHERE o.o_totalprice > 400000
""",
    "load_merge_from_json": """
SELECT c_custkey, c_name,
       CASE WHEN c_custkey % 4 = 1 THEN 'UPDATED' ELSE c_mktsegment END
         AS c_mktsegment
FROM customer
""",
    "media_resize": """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 <> 0 THEN 'image' ELSE 'audio' END AS kind,
       CAST(CASE WHEN doc_id % 3 <> 0
                 THEN 11 + 8 * 8 * 3
                 ELSE 44 + (400 + (doc_id % 100) * 8) * 2 END AS BIGINT)
         AS payload_bytes,
       CAST(CASE WHEN doc_id % 3 <> 0 THEN doc_id % 256
                 ELSE (doc_id % 100) * 10 END AS DOUBLE) AS stat
FROM documents
""",
    "media_frames": """
WITH v AS (SELECT doc_id, doc_id % 4 + 2 AS nf FROM documents
           WHERE doc_id % 10 = 0),
f AS (SELECT doc_id, unnest(range(0, nf, 2)) AS i FROM v)
SELECT doc_id * 1000000 + i AS media_id,
       'image' AS kind,
       CAST(11 + 8 * 8 * 3 AS BIGINT) AS payload_bytes,
       CAST((doc_id + i) % 256 AS DOUBLE) AS stat
FROM f
""",
    "media_features": """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 3 <> 0 THEN 'image' ELSE 'audio' END AS kind,
       CAST(CASE WHEN doc_id % 3 <> 0
                 THEN 13 + (16 + (doc_id % 4) * 8) * 16 * 3
                 ELSE 44 + (400 + (doc_id % 100) * 8) * 2 END AS BIGINT)
         AS payload_bytes,
       CAST(CASE WHEN doc_id % 3 <> 0 THEN doc_id % 256
                 ELSE (doc_id % 100) * 10 END AS DOUBLE) AS stat
FROM documents
""",
    "asof_last_purchase": """
WITH c AS (SELECT event_id AS click_id, user_id, ts FROM events
           WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts, ROUND(value, 2) AS purchase_value
      FROM events WHERE event_type = 'purchase'),
j AS (SELECT c.click_id, c.user_id, c.ts, p.purchase_id, p.purchase_value,
             row_number() OVER (PARTITION BY c.click_id
                                ORDER BY p.ts DESC, p.purchase_id DESC) AS rn
      FROM c LEFT JOIN p ON p.user_id = c.user_id AND p.ts <= c.ts)
SELECT click_id, user_id, ts, purchase_id, purchase_value FROM j WHERE rn = 1
""",
    "range_join_clicks_after_signup": """
WITH s AS (SELECT event_id AS signup_id, user_id, ts FROM events
           WHERE event_type = 'signup'),
c AS (SELECT user_id, ts FROM events WHERE event_type = 'click')
SELECT s.signup_id, CAST(COUNT(*) AS BIGINT) AS n_clicks
FROM s JOIN c ON s.user_id = c.user_id
 AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL 7 DAY
GROUP BY s.signup_id
""",
    "value_percentiles": """
WITH s AS (
  SELECT event_type,
         array_agg(value ORDER BY value) AS vs,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY event_type)
SELECT event_type, n,
       vs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1] AS p50,
       vs[CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1] AS p90,
       vs[CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1] AS p99
FROM s
""",
    "hash_split": """
SELECT doc_id,
       CASE WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
            THEN 'train'
            WHEN substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
            THEN 'val'
            ELSE 'test' END AS split
FROM documents
""",
    "deterministic_sample": """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE substr(sha256(CAST(l_orderkey AS VARCHAR) || '|' ||
                    CAST(l_linenumber AS VARCHAR)), 1, 4) < '3333'
""",
    "term_doc_freq": """
WITH tok AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS term
  FROM documents WHERE trim(text) <> ''),
tf AS (
  SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY doc_id, term),
df AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
  FROM tf GROUP BY term)
SELECT t.doc_id, t.term, t.tf, d.df
FROM tf t JOIN df d USING (term)
WHERE t.tf >= 3
""",
    "quality_filter": """
WITH s AS (
  SELECT array_agg(n_chars ORDER BY n_chars) AS vs,
         CAST(COUNT(n_chars) AS BIGINT) AS n
  FROM documents)
SELECT d.doc_id, d.n_chars
FROM documents d, s
WHERE d.n_chars >= s.vs[CAST(floor(0.25 * (s.n - 1)) AS BIGINT) + 1]
""",
    "corpus_mixture": """
SELECT doc_id, lang
FROM documents
WHERE substr(sha256(CAST(doc_id AS VARCHAR)), 1, 4) <
      CASE lang WHEN 'en' THEN '8000' WHEN 'fr' THEN 'zzzz'
                WHEN 'es' THEN '4000' WHEN 'de' THEN 'cccc'
                ELSE '1999' END
""",
    "hopping_window": """
WITH b AS (SELECT event_type, date_trunc('day', ts) AS d, value FROM events),
x AS (
  SELECT event_type, d AS ws, value FROM b
  UNION ALL SELECT event_type, d - INTERVAL 1 DAY, value FROM b
  UNION ALL SELECT event_type, d - INTERVAL 2 DAY, value FROM b)
SELECT ws AS window_start, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       CAST(ROUND(SUM(value) * 100, 0) AS BIGINT) AS sum_value_cents
FROM x GROUP BY 1, 2
""",
    "session_windows": """
WITH e AS (SELECT user_id, ts FROM events),
s AS (SELECT user_id, ts,
        CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
             OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                > INTERVAL 2 HOUR
             THEN 1 ELSE 0 END AS new_s
      FROM e),
g AS (SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts
                              ROWS UNBOUNDED PRECEDING) AS session_id
      FROM s)
SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM g GROUP BY user_id, session_id
""",
    "windowed_aggregate": """
SELECT date_trunc('day', ts) AS window_start, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
""",
    "cdc_events_lww": """
SELECT user_id, event_id AS last_event_id, event_type, value, ts
FROM (SELECT *, row_number() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
      FROM events)
WHERE rn = 1
""",
    "changed_records": """
SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_changed, MAX(ts) AS last_ts
FROM events WHERE ts >= TIMESTAMP '2024-01-20 00:00:00'
GROUP BY event_type
""",
    "gap_detect": """
WITH ids AS (SELECT event_id FROM events WHERE event_type <> 'click'),
s AS (SELECT event_id, lead(event_id) OVER (ORDER BY event_id) AS nxt FROM ids)
SELECT event_id + 1 AS gap_start, nxt - 1 AS gap_end
FROM s WHERE nxt > event_id + 1
""",
    "lineage_rollup": """
SELECT user_id % 16 AS partition_id,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_keys,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       MAX(event_id) AS last_lsn
FROM events GROUP BY 1
""",
    "schema_evolution": """
SELECT event_id, ts, user_id, CAST(NULL AS DOUBLE) AS value,
       CAST(NULL AS VARCHAR) AS payload
FROM events WHERE event_id % 2 = 0
UNION ALL
SELECT event_id, CAST(NULL AS TIMESTAMP) AS ts, user_id, value, props AS payload
FROM events WHERE event_id % 2 = 1
""",
    "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(SUM(l_quantity) / COUNT(*), 2) AS avg_qty,
       CAST(COUNT(*) AS BIGINT) AS n
FROM lineitem GROUP BY l_returnflag, l_linestatus
""",
    "revenue_by_nation": """
SELECT n.n_name,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
GROUP BY n.n_name
""",
    "customers_without_orders": """
SELECT c_custkey, c_name FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')
""",
    "priority_big_lineitem_orders": """
SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
FROM orders o
WHERE EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45)
GROUP BY o_orderpriority
""",
    "bloom_reconcile_customers": """
SELECT c_custkey, c_mktsegment
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice < 5000)
""",
    "reconcile_orders": """
WITH dst AS (
  SELECT o_orderkey,
         CASE WHEN o_orderkey % 17 = 0 THEN o_totalprice + 1.0
              ELSE o_totalprice END AS o_totalprice
  FROM orders WHERE o_orderkey % 13 <> 0
  UNION ALL
  SELECT o_orderkey + 1000000 AS o_orderkey, o_totalprice
  FROM orders WHERE o_orderkey % 19 = 0
)
SELECT COALESCE(s.o_orderkey, d.o_orderkey) AS o_orderkey,
       CASE WHEN d.o_orderkey IS NULL THEN 'missing'
            WHEN s.o_orderkey IS NULL THEN 'phantom'
            ELSE 'outdated' END AS reason
FROM orders s FULL OUTER JOIN dst d ON s.o_orderkey = d.o_orderkey
WHERE d.o_orderkey IS NULL OR s.o_orderkey IS NULL
   OR s.o_totalprice <> d.o_totalprice
""",
    "fields_mapping": """
SELECT c_custkey AS customer_id, c_name AS customer_name,
       'epts' AS origin_app, CAST(NULL AS VARCHAR) AS legacy_note,
       CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS acctbal_cents,
       LOWER(c_mktsegment) AS mktsegment
FROM customer
""",
    "multi_dst_fanout": """
SELECT 'customer_dim' AS dst, c_custkey AS customer_id, c_name AS payload
FROM customer
UNION ALL
SELECT 'segment_balance' AS dst, c_custkey AS customer_id,
       LOWER(c_mktsegment) || ':' ||
       CAST(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS VARCHAR) AS payload
FROM customer
""",
    "filter_predicate": """
SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= DATE '1995-01-01' AND l_shipdate < DATE '1996-01-01'
  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24
""",
    "distinct_flag_status": """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
""",
    "top_orders": """
SELECT o_orderkey, o_custkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
""",
    "union_extracts": """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice > 400000
UNION ALL
SELECT o_orderkey, o_orderstatus FROM orders
WHERE o_orderstatus = 'F' AND o_totalprice > 400000
""",
    "corpus_prep": """
WITH good AS (
  SELECT doc_id, text FROM documents
  WHERE length(text) >= 100
    AND length(regexp_replace(text, '[^A-Za-z]', '', 'g')) * 2 >= length(text)
),
winners AS (
  SELECT MIN(doc_id) AS doc_id FROM good GROUP BY sha256(text)
)
SELECT g.doc_id, CAST(length(g.text) AS BIGINT) AS n_chars,
       CAST(len(regexp_split_to_array(trim(g.text), '\\s+')) AS BIGINT) AS n_tokens
FROM good g JOIN winners w ON g.doc_id = w.doc_id
""",
    "dedup_exact": """
SELECT MIN(doc_id) AS doc_id, sha256(substring(text, 1, 80)) AS content_sha
FROM documents GROUP BY sha256(substring(text, 1, 80))
""",
    "pack_sequences": """
WITH toks AS (
  SELECT doc_id,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
              AS BIGINT) AS n_tokens
  FROM documents),
cum AS (
  SELECT doc_id, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - n_tokens AS start
  FROM toks)
SELECT doc_id, n_tokens,
       CAST(start // 2048 AS BIGINT) AS pack_id,
       CAST(start % 2048 AS BIGINT) AS pack_offset
FROM cum
""",
    "token_stats": """
SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
       CAST(CASE WHEN trim(text) = '' THEN 0
            ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS BIGINT) AS n_tokens
FROM documents
""",
    "quality_scores": """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS BIGINT) AS alpha_chars,
       CAST(length(text) - length(replace(text, ' ', '')) AS BIGINT) AS spaces
FROM documents
""",
    "ann_topk": """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 8),
d AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de
      FROM embeddings WHERE vec_id >= 8),
s AS (SELECT q.query_id, d.vec_id,
             list_cosine_similarity(q.qe, d.de) AS cos
      FROM q CROSS JOIN d),
r AS (SELECT query_id, vec_id, cos,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS rank
      FROM s)
SELECT query_id, vec_id, CAST(rank AS BIGINT) AS rank, ROUND(cos, 4) AS cosine
FROM r WHERE rank <= 5
""",
}

# windowed-resume and compacted replays must land in the EXACT same final
# state as the single-shot replay — share its oracle
ORACLE_SQL["cdc_replay_windowed"] = ORACLE_SQL["cdc_replay_lww"]
ORACLE_SQL["cdc_replay_compacted"] = ORACLE_SQL["cdc_replay_lww"]

ORACLE_SQL["dedup_passages"] = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
  FROM documents
),
ch AS (
  SELECT doc_id, CAST((ord - 1) // 10 AS BIGINT) AS cidx,
         string_agg(w, ' ' ORDER BY ord) AS chunk
  FROM w GROUP BY doc_id, (ord - 1) // 10
),
rk AS (
  SELECT doc_id, cidx, chunk,
         row_number() OVER (PARTITION BY chunk ORDER BY doc_id, cidx) AS rn
  FROM ch
)
SELECT doc_id,
       coalesce(string_agg(chunk, ' ' ORDER BY cidx) FILTER (WHERE rn = 1), '') AS clean_text,
       CAST(count(*) FILTER (WHERE rn = 1) AS BIGINT) AS n_kept,
       CAST(count(*) FILTER (WHERE rn > 1) AS BIGINT) AS n_dropped
FROM rk GROUP BY doc_id
"""

# duplicated 25-gram starts per doc + the length of their interval union
# (gaps-and-islands: starts <= 25 apart overlap/abut into one covered run)
ORACLE_SQL["dedup_substrings"] = """
WITH g AS (
  SELECT doc_id, unnest(range(1, length(text) - 25 + 2)) AS i, text
  FROM documents),
w AS (SELECT doc_id, i, substr(text, i, 25) AS gram FROM g),
dup AS (SELECT gram FROM w GROUP BY gram HAVING count(*) >= 2),
d AS (SELECT w.doc_id, w.i FROM w JOIN dup USING (gram)),
isl AS (
  SELECT doc_id, i,
         CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 25
              THEN 0 ELSE 1 END AS brk
  FROM d),
grp AS (
  SELECT doc_id, i,
         SUM(brk) OVER (PARTITION BY doc_id ORDER BY i) AS isl_id
  FROM isl),
spans AS (
  SELECT doc_id, min(i) AS s, max(i) AS e,
         CAST(count(*) AS BIGINT) AS n
  FROM grp GROUP BY doc_id, isl_id),
agg AS (
  SELECT doc_id,
         CAST(SUM(n) AS BIGINT) AS n_dup_starts,
         CAST(SUM(e - s + 25) AS BIGINT) AS n_dup_chars
  FROM spans GROUP BY doc_id)
SELECT doc.doc_id,
       CAST(coalesce(a.n_dup_starts, 0) AS BIGINT) AS n_dup_starts,
       CAST(coalesce(a.n_dup_chars, 0) AS BIGINT) AS n_dup_chars
FROM documents doc LEFT JOIN agg a USING (doc_id)
"""

ORACLE_SQL["top_terms"] = """
SELECT term, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS term
      FROM documents)
GROUP BY term
ORDER BY n DESC, term ASC
LIMIT 100
"""

# word tokenization = split on single space, list_slice is 1-based
# inclusive, so gram at i spans words i..i+12; docs with <13 words emit no
# gram rows and come back as n_hits=0 via the LEFT JOIN
ORACLE_SQL["decontaminate_ngrams"] = """
WITH w AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
  FROM documents),
g2 AS (
  SELECT doc_id,
         array_to_string(list_slice(ws, i, i + 12), ' ') AS g
  FROM (SELECT doc_id, ws,
               unnest(range(1, greatest(len(ws) - 12, 0) + 1)) AS i
        FROM w)),
ev AS (SELECT DISTINCT g FROM g2 WHERE doc_id < 8),
hits AS (
  SELECT g2.doc_id, count(*) AS c
  FROM g2 JOIN ev USING (g)
  GROUP BY g2.doc_id)
SELECT d.doc_id, CAST(coalesce(h.c, 0) AS BIGINT) AS n_hits
FROM documents d LEFT JOIN hits h USING (doc_id)
"""

ORACLE_SQL["decontaminate"] = """
WITH ev AS (SELECT substr(text, 10, 30) AS snip FROM documents WHERE doc_id < 8)
SELECT d.doc_id, CAST(length(d.text) AS BIGINT) AS n_chars
FROM documents d
WHERE NOT EXISTS (SELECT 1 FROM ev WHERE contains(d.text, ev.snip))
"""

ORACLE_SQL["deterministic_shuffle"] = """
SELECT doc_id,
       CAST(row_number() OVER (
           ORDER BY sha256('epoch0:' || CAST(doc_id AS VARCHAR))) - 1
         AS BIGINT) AS shuffle_pos
FROM documents
"""

ORACLE_SQL["embedding_clusters"] = """
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings WHERE vec_id < 8),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.de, c.ce) AS cos
      FROM e CROSS JOIN c),
r AS (SELECT vec_id, cid, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, cid ASC) AS rn
      FROM s)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, ROUND(cos, 4) AS cosine
FROM r WHERE rn = 1
"""

ORACLE_SQL["semdedup_pairs"] = """
WITH c AS (SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS ce
           FROM embeddings WHERE vec_id < 8),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS de FROM embeddings),
s AS (SELECT e.vec_id, c.cid, list_cosine_similarity(e.de, c.ce) AS cos
      FROM e CROSS JOIN c),
a AS (SELECT vec_id, cid FROM (
        SELECT vec_id, cid,
               row_number() OVER (PARTITION BY vec_id
                                  ORDER BY cos DESC, cid ASC) AS rn
        FROM s) WHERE rn = 1)
SELECT x.vec_id AS id_a, y.vec_id AS id_b,
       CAST(x.cid AS BIGINT) AS cluster_id,
       ROUND(list_cosine_similarity(ex.de, ey.de), 4) AS cosine
FROM a x JOIN a y ON x.cid = y.cid AND x.vec_id < y.vec_id
JOIN e ex ON ex.vec_id = x.vec_id
JOIN e ey ON ey.vec_id = y.vec_id
WHERE list_cosine_similarity(ex.de, ey.de) >= 0.4
"""

ORACLE_SQL["repetition_stats"] = """
WITH w AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS w,
         unnest(range(1, len(string_split(text, ' ')) + 1)) AS ord
  FROM documents
),
b AS (
  SELECT a.doc_id, a.w || ' ' || c.w AS bg
  FROM w a JOIN w c ON a.doc_id = c.doc_id AND c.ord = a.ord + 1
),
g AS (SELECT doc_id, bg, count(*) AS c FROM b GROUP BY doc_id, bg)
SELECT doc_id,
       CAST(sum(c) AS BIGINT) AS n_bigrams,
       CAST(count(*) AS BIGINT) AS n_distinct,
       CAST(max(c) AS BIGINT) AS top_count
FROM g GROUP BY doc_id
"""

ORACLE_SQL["bpe_pair_counts"] = """
WITH words AS (
  SELECT unnest(string_split(coalesce(text, ''), ' ')) AS w FROM documents
),
wf AS (SELECT w, count(*) AS f FROM words WHERE w <> '' GROUP BY w),
chars AS (
  SELECT w, f,
         unnest(string_split(w, '')) AS c,
         unnest(range(1, len(string_split(w, '')) + 1)) AS ord
  FROM wf
),
p AS (
  SELECT a.c AS l, b.c AS r, a.f AS f
  FROM chars a JOIN chars b ON a.w = b.w AND b.ord = a.ord + 1
),
g AS (SELECT l, r, CAST(sum(f) AS BIGINT) AS cnt FROM p GROUP BY l, r)
SELECT l, r, cnt FROM g ORDER BY cnt DESC, l, r LIMIT 50
"""

ORACLE_SQL["incremental_ingest"] = """
WITH ing AS (SELECT DISTINCT sha256(text) AS sha FROM documents WHERE doc_id < 400),
inc AS (SELECT doc_id, sha256(text) AS content_sha FROM documents)
SELECT doc_id, content_sha
FROM inc
WHERE NOT EXISTS (SELECT 1 FROM ing WHERE ing.sha = inc.content_sha)
"""

ORACLE_SQL["redact_terms"] = r"""
SELECT doc_id,
       regexp_replace(text, '\b(customer|spark|join)\b', '[X]', 'g') AS text,
       CAST(len(regexp_extract_all(text, '\b(customer|spark|join)\b')) AS BIGINT)
         AS n_redacted
FROM documents
"""

ORACLE_SQL["leakage_safe_split"] = """
SELECT doc_id,
       CASE WHEN substr(sha256(text), 1, 4) < 'e666' THEN 'train'
            WHEN substr(sha256(text), 1, 4) < 'f333' THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""

# functions.text.rolling_fingerprint's window hash is a mod-2^64 polynomial
# (numpy uint64 convolve wraps): H_i = sum_k byte[i+k] * B^k mod 2^64,
# fingerprint = min over windows. DuckDB has no wrapping 64-bit arithmetic,
# so each term is accumulated exactly in HUGEINT (16 lead() taps * B^k
# literals, max ~2^75) and reduced mod 2^64 once. Covers the convolution
# path only (needs len >= window; the test tables' min text length is 44
# — the <=16-byte FNV fallback is not SQL-expressible without wraparound).
_FP_B, _FP_M, _FP_W = 1099511628211, 1 << 64, 16
_FP_TERMS = " + ".join(
    f"CAST(lead(c, {k}) OVER w AS HUGEINT) * {pow(_FP_B, k, _FP_M)}"
    if k else "CAST(c AS HUGEINT)"
    for k in range(_FP_W))
ORACLE_SQL["fingerprints"] = f"""
WITH chars AS (
  SELECT doc_id,
         unnest(range(1, length(text) + 1)) AS i,
         unnest(regexp_extract_all(text, '(?s).')) AS ch
  FROM documents
),
codes AS (SELECT doc_id, i, ascii(ch) AS c FROM chars),
wh AS (
  SELECT doc_id,
         ({_FP_TERMS}) % {_FP_M} AS h,
         lead(c, {_FP_W - 1}) OVER w AS tail
  FROM codes
  WINDOW w AS (PARTITION BY doc_id ORDER BY i)
)
SELECT doc_id, CAST(MIN(h) AS UBIGINT) AS fingerprint
FROM wh WHERE tail IS NOT NULL GROUP BY doc_id
"""

# same token class, stopword sets, and earliest-max tie-break as
# functions.text.predict_lang (dict order en,es,fr,de = the CASE order)
ORACLE_SQL["langid"] = """
WITH tok AS (
  SELECT doc_id,
         regexp_extract_all(lower(coalesce(text, '')), '[a-zà-ÿäöüß]+') AS w,
         len(regexp_extract_all(coalesce(text, ''), '[一-鿿]')) AS cjk,
         greatest(length(coalesce(text, '')), 1) AS n
  FROM documents),
c AS (
  SELECT doc_id, cjk, n,
    len(list_filter(w, x -> x IN ('the','and','of','a','to','in','is','it','for','on'))) AS c_en,
    len(list_filter(w, x -> x IN ('el','la','de','y','que','en','un','una','los','las'))) AS c_es,
    len(list_filter(w, x -> x IN ('le','la','de','et','que','en','un','une','les','des'))) AS c_fr,
    len(list_filter(w, x -> x IN ('der','die','das','und','von','zu','ein','eine','ist','nicht'))) AS c_de
  FROM tok)
SELECT doc_id,
       CASE WHEN cjk * 1.0 / n > 0.2 THEN 'zh'
            WHEN c_en = 0 AND c_es = 0 AND c_fr = 0 AND c_de = 0 THEN 'und'
            WHEN c_en >= c_es AND c_en >= c_fr AND c_en >= c_de THEN 'en'
            WHEN c_es >= c_fr AND c_es >= c_de THEN 'es'
            WHEN c_fr >= c_de THEN 'fr'
            ELSE 'de' END AS predicted_lang
FROM c
"""

ORACLE_SQL["tfidf_terms"] = """
WITH tok AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
       FROM tok GROUP BY doc_id, term),
dfr AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term),
r AS (
  SELECT tf.doc_id, tf.term, tf.tf, dfr.df,
         CAST(tf.tf AS DOUBLE) / dfr.df AS score,
         row_number() OVER (
           PARTITION BY tf.doc_id
           ORDER BY CAST(tf.tf AS DOUBLE) / dfr.df DESC, tf.term ASC) AS rn
  FROM tf JOIN dfr USING (term))
SELECT doc_id, term, tf, df, score FROM r WHERE rn <= 5
"""

ORACLE_SQL["quota_sample"] = """
SELECT doc_id, source FROM (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY sha256(':' || CAST(doc_id AS VARCHAR))) AS rn
  FROM documents) WHERE rn <= 7
"""

ORACLE_SQL["user_event_pivot"] = """
SELECT user_id,
       CAST(count(*) AS BIGINT) AS n_events,
       CAST(sum(CASE WHEN event_type = 'click'    THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'view'     THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup'   THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'error'    THEN 1 ELSE 0 END) AS BIGINT) AS n_error
FROM events GROUP BY user_id
"""

# bigram at word i = words i..i+1 (list_slice is 1-based inclusive); the
# model trains on even doc_ids; docs with <2 words emit no bigrams and
# come back all-zero via the LEFT JOIN
ORACLE_SQL["lm_bigram_score"] = """
WITH w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
           FROM documents),
bg AS (
  SELECT doc_id, array_to_string(list_slice(ws, i, i + 1), ' ') AS g
  FROM (SELECT doc_id, ws,
               unnest(range(1, greatest(len(ws) - 1, 0) + 1)) AS i
        FROM w)),
model AS (SELECT g, CAST(count(*) AS BIGINT) AS c
          FROM bg WHERE doc_id % 2 = 0 GROUP BY g),
sc AS (
  SELECT bg.doc_id,
         count(*) AS n_bigrams,
         sum(coalesce(model.c, 0)) AS sum_count,
         sum(CASE WHEN model.c IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM bg LEFT JOIN model ON bg.g = model.g
  GROUP BY bg.doc_id)
SELECT d.doc_id,
       CAST(coalesce(sc.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       CAST(coalesce(sc.sum_count, 0) AS BIGINT) AS sum_count,
       CAST(coalesce(sc.n_oov, 0) AS BIGINT) AS n_oov
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
"""

ORACLE_SQL["perplexity_buckets"] = """
WITH w AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
           FROM documents),
bg AS (
  SELECT doc_id, array_to_string(list_slice(ws, i, i + 1), ' ') AS g
  FROM (SELECT doc_id, ws,
               unnest(range(1, greatest(len(ws) - 1, 0) + 1)) AS i
        FROM w)),
model AS (SELECT g FROM bg WHERE doc_id % 2 = 0 GROUP BY g),
sc AS (
  SELECT bg.doc_id,
         count(*) AS n_bigrams,
         sum(CASE WHEN model.g IS NULL THEN 1 ELSE 0 END) AS n_oov
  FROM bg LEFT JOIN model ON bg.g = model.g
  GROUP BY bg.doc_id),
s AS (
  SELECT d.doc_id,
         CAST((1000 * coalesce(sc.n_oov, 0))
              // greatest(coalesce(sc.n_bigrams, 0), 1) AS BIGINT) AS score
  FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id),
ranked AS (SELECT score, row_number() OVER (ORDER BY score) AS rn,
                  count(*) OVER () AS n
           FROM s),
th AS (SELECT
         max(CASE WHEN rn = CAST(ceil(n / 3.0) AS BIGINT)
                  THEN score END) AS t1,
         max(CASE WHEN rn = CAST(ceil(2 * n / 3.0) AS BIGINT)
                  THEN score END) AS t2
       FROM ranked)
SELECT s.doc_id, s.score,
       CASE WHEN s.score <= th.t1 THEN 'head'
            WHEN s.score <= th.t2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM s, th
"""

ORACLE_SQL["asof_next_purchase"] = """
WITH s AS (SELECT event_id AS signup_id, user_id, ts
           FROM events WHERE event_type = 'signup'),
p AS (SELECT event_id AS purchase_id, user_id, ts AS pts,
             round(value, 2) AS purchase_value
      FROM events WHERE event_type = 'purchase'),
j AS (
  SELECT s.signup_id, p.purchase_id, p.purchase_value,
         row_number() OVER (PARTITION BY s.signup_id
                            ORDER BY p.pts ASC, p.purchase_id ASC) AS rn
  FROM s JOIN p ON s.user_id = p.user_id
              AND p.pts >= s.ts AND p.pts <= s.ts + INTERVAL 7 DAY)
SELECT s.signup_id, s.user_id, s.ts, j.purchase_id, j.purchase_value
FROM s LEFT JOIN j ON s.signup_id = j.signup_id AND j.rn = 1
"""

ORACLE_SQL["price_histogram"] = """
SELECT CAST(floor(l_extendedprice / 5000.0) AS BIGINT) AS bin,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem GROUP BY bin
"""

ORACLE_SQL["event_gaps"] = """
SELECT event_id, user_id, ts,
       date_diff('microsecond',
                 lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id),
                 ts) AS gap_us
FROM events
"""

ORACLE_SQL["rollup_revenue"] = """
WITH base AS (
  SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT coalesce(event_type, 'ALL') AS event_type,
       coalesce(day, 'ALL') AS day,
       CAST(sum(cents) AS BIGINT) AS cents,
       CAST(count(*) AS BIGINT) AS n
FROM base GROUP BY ROLLUP (event_type, day)
"""


def q_rolling_spend(sf_dir: str):
    """Trailing 4-event spend per user (stages/windows.py::rolling_sum —
    the ROWS-frame window function): integer-cent prefix sums per hash
    bucket, one shuffle, byte-exact vs sequential SQL."""
    from ..stages.windows import rolling_sum

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "ts", "value"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t["event_id"],
            "user_id": t["user_id"],
            "ts": t["ts"],
            "cents": pa.array(
                np.floor(t["value"].to_numpy() * 100).astype("int64")),
        })

    out = rolling_sum(ev.map_batches(base, batch_format="pyarrow"),
                      key_col="user_id", ts_col="ts", value_col="cents",
                      frame=4, order_cols=["event_id"])
    return out.select_columns(["event_id", "user_id", "roll_sum"])


def q_lineitem_long(sf_dir: str):
    """UNPIVOT lineitem's four measures into long (key, name, value) rows
    (stages/pivot.py::unpivot_longer): stateless zero-shuffle melt, the
    inverse of the pivot operator."""
    from ..stages.pivot import unpivot_longer

    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_linenumber", "l_quantity",
                             "l_extendedprice", "l_discount", "l_tax"])
    return unpivot_longer(
        li, ["l_orderkey", "l_linenumber"],
        ["l_quantity", "l_extendedprice", "l_discount", "l_tax"])


def q_dominant_event_type(sf_dir: str):
    """Per-user modal event type (stages/pivot.py::grouped_mode): two
    group-sized exchanges, deterministic count-desc/category-asc winner."""
    from ..stages.pivot import grouped_mode

    ev = read_table(sf_dir, "events", columns=["user_id", "event_type"])
    return grouped_mode(ev, "user_id", "event_type")


QUERIES["rolling_spend"] = q_rolling_spend
QUERIES["lineitem_long"] = q_lineitem_long
QUERIES["dominant_event_type"] = q_dominant_event_type

ORACLE_SQL["rolling_spend"] = """
WITH base AS (
  SELECT event_id, user_id, ts,
         CAST(FLOOR(value * 100) AS BIGINT) AS cents
  FROM events)
SELECT event_id, user_id,
       CAST(sum(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS BIGINT) AS roll_sum
FROM base
"""

ORACLE_SQL["lineitem_long"] = """
SELECT l_orderkey, l_linenumber, 'l_quantity' AS name,
       CAST(l_quantity AS DOUBLE) AS value FROM lineitem
UNION ALL SELECT l_orderkey, l_linenumber, 'l_extendedprice',
       CAST(l_extendedprice AS DOUBLE) FROM lineitem
UNION ALL SELECT l_orderkey, l_linenumber, 'l_discount',
       CAST(l_discount AS DOUBLE) FROM lineitem
UNION ALL SELECT l_orderkey, l_linenumber, 'l_tax',
       CAST(l_tax AS DOUBLE) FROM lineitem
"""

ORACLE_SQL["dominant_event_type"] = """
WITH c AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY user_id, event_type),
r AS (
  SELECT *, row_number() OVER (PARTITION BY user_id
            ORDER BY n DESC, event_type) AS rn
  FROM c)
SELECT user_id, event_type AS top_cat, n FROM r WHERE rn = 1
"""


def q_activity_reconcile(sf_dir: str):
    """Two-sided account/activity reconciliation (stages/joins.py::
    full_outer_join — J8 in both directions at once): per-user event spend
    FULL OUTER JOIN customer balances; users without an account and
    customers without activity both survive with the other side null."""
    from ..stages.joins import full_outer_join
    from ..stages.pivot import bucketed_sum

    ev = read_table(sf_dir, "events", columns=["user_id", "value"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": t["user_id"],
            "cents": pa.array(
                np.floor(t["value"].to_numpy() * 100).astype("int64")),
            "n_events": pa.array(np.ones(len(t), np.int64)),
        })

    agg = bucketed_sum(ev.map_batches(base, batch_format="pyarrow"),
                       ["user_id"], ["cents", "n_events"])

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(["user_id", "c_acctbal"])

    return full_outer_join(agg, cust.map_batches(ren, batch_format="pyarrow"),
                           ["user_id"]) \
        .select_columns(["user_id", "cents", "n_events", "c_acctbal"])


QUERIES["activity_reconcile"] = q_activity_reconcile

ORACLE_SQL["activity_reconcile"] = """
WITH a AS (
  SELECT user_id,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents,
         CAST(count(*) AS BIGINT) AS n_events
  FROM events GROUP BY user_id)
SELECT coalesce(a.user_id, c.c_custkey) AS user_id,
       a.cents, a.n_events, c.c_acctbal
FROM a FULL OUTER JOIN customer c ON a.user_id = c.c_custkey
"""


def q_purchase_pagerank(sf_dir: str):
    """PageRank over the customer->supplier purchase graph
    (stages/graph.py::pagerank, broadcast engine — 8 damped power
    iterations): edges never leave their blocks; each iteration ships only
    block-distinct dst contributions through one coarse-bucket exchange.
    Ranks are quantized to 1e-9 so the float-summation order (Ray block
    order vs SQL GROUP BY order) cannot flip the oracle hash."""
    from ..stages.graph import pagerank
    from ..stages.joins import broadcast_inner_join
    from ..stages.pivot import distinct_keys

    li = read_table(sf_dir, "lineitem", columns=["l_orderkey", "l_suppkey"])
    ords = read_table(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    joined = broadcast_inner_join(li, ords, ["l_orderkey"],
                                  right_on=("o_orderkey",))

    def edge(t: pa.Table) -> pa.Table:
        return pa.table({
            "src": t["o_custkey"].cast(pa.int64()),
            # suppliers share the customer key range; shift to disambiguate
            "dst": pc.add(t["l_suppkey"].cast(pa.int64()),
                          pa.scalar(1_000_000, pa.int64())),
        })

    edges = distinct_keys(joined.map_batches(edge, batch_format="pyarrow"),
                          ["src", "dst"])
    pr = pagerank(edges, damping=0.85, iterations=8)

    def quantize(t: pa.Table) -> pa.Table:
        return pa.table({
            "node": t["node"],
            "rank_e9": pa.array(
                np.floor(t["rank"].to_numpy() * 1e9).astype("int64")),
        })

    return pr.map_batches(quantize, batch_format="pyarrow")


QUERIES["purchase_pagerank"] = q_purchase_pagerank

_PR_STEPS = ["r0 AS (SELECT node, 1.0 / nn.n AS rank FROM nodes, nn)"]
for _k in range(8):
    _PR_STEPS.append(f"""r{_k + 1} AS (
  SELECT n.node,
         (1.0 - 0.85) / nn.n
         + 0.85 * (coalesce(c.contrib, 0) + dang.s / nn.n) AS rank
  FROM nodes n
  CROSS JOIN nn
  CROSS JOIN (SELECT coalesce(sum(rank), 0) AS s FROM r{_k}
              WHERE node NOT IN (SELECT node FROM deg)) dang
  LEFT JOIN (SELECT e.dst AS node, sum(r.rank / d.deg) AS contrib
             FROM edges e JOIN r{_k} r ON e.src = r.node
                          JOIN deg d ON e.src = d.node
             GROUP BY e.dst) c ON n.node = c.node)""")
_PR_CTES = ",\n".join(_PR_STEPS)

ORACLE_SQL["purchase_pagerank"] = f"""
WITH edges AS (
  SELECT DISTINCT o.o_custkey AS src, l.l_suppkey + 1000000 AS dst
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
deg AS (SELECT src AS node, CAST(count(*) AS DOUBLE) AS deg
        FROM edges GROUP BY src),
{_PR_CTES}
SELECT node, CAST(floor(rank * 1e9) AS BIGINT) AS rank_e9 FROM r8
"""


# ---------------------------------------------------------------------------
# History / analytics batch (round 3): SCD2, time travel, funnel, cohorts,
# grouped correlation, distributed NTILE, EXCEPT
# ---------------------------------------------------------------------------

def q_scd2_history(sf_dir: str):
    """SCD Type-2 materialization of the CDC event log
    (stages/history.py::scd2_history): every non-delete version with its
    validity interval; a trailing delete closes the last version. The
    interval form of the reference's stage-area timeline
    (common/model/EtlStageRecordVO.java:36-67)."""
    from ..stages.history import scd2_history

    events = events_from_documents(sf_dir)
    hist = scd2_history(events, ("repo", "path"), "lsn")

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": t["repo"],
            "path": t["path"],
            "valid_from": t["lsn"],
            "valid_to": t["valid_to"],
            "is_current": t["is_current"],
            "commit": t["commit"],
            "content_sha": sha256_hex(t["content"]),
        })

    return hist.map_batches(project, batch_format="pyarrow")


def q_time_travel_snapshot(sf_dir: str):
    """Snapshot-at-LSN (time travel): the table state as of LSN 2500 —
    prefix-filter the log, then the same LWW compaction as the live state
    (stages/lww.py::lww_final_state). The read-side counterpart of the
    commit-log lake's monotone watermark."""
    events = events_from_documents(sf_dir)
    asof = events.filter(expr="lsn <= 2500")
    state = lww_final_state(asof, key_cols=("repo", "path"), lsn_col="lsn",
                            num_buckets=16)

    def project(t: pa.Table) -> pa.Table:
        return pa.table({
            "repo": t["repo"],
            "path": t["path"],
            "last_lsn": t["lsn"],
            "commit": t["commit"],
            "lang": t["lang"],
            "content_sha": sha256_hex(t["content"]),
        })

    return state.map_batches(project, batch_format="pyarrow")


def q_event_funnel(sf_dir: str):
    """Sequential conversion funnel view→click→purchase over the events
    stream (stages/history.py::funnel_counts): strictly-ordered reach
    times, one entity-key exchange, vectorized per bucket."""
    from ..stages.history import funnel_counts

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_type"])
    return funnel_counts(ev, key_col="user_id", ts_col="ts",
                         type_col="event_type",
                         steps=["view", "click", "purchase"])


def q_retention_cohorts(sf_dir: str):
    """Weekly cohort retention matrix (stages/history.py::
    retention_cohorts): users cohorted by first-event week; distinct
    active (user, week) pairs counted at (cohort, offset)."""
    from ..stages.history import retention_cohorts

    ev = read_table(sf_dir, "events", columns=["user_id", "ts"])
    out = retention_cohorts(ev, key_col="user_id", ts_col="ts")

    def ren(t: pa.Table) -> pa.Table:
        return t.rename_columns(["cohort_week", "week_offset", "n_users"])

    return out.map_batches(ren, batch_format="pyarrow")


def q_qty_discount_corr(sf_dir: str):
    """Per-(returnflag, linestatus) Pearson correlation + OLS slope of
    quantity vs discount (stages/stats.py::grouped_corr): exact int64
    moment partials per block — six numbers per group cross the wire —
    then one fixed IEEE-double finalization, quantized to 1e-9."""
    from ..stages.stats import grouped_corr

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus",
                             "l_quantity", "l_discount"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "x": pa.array(np.rint(t["l_quantity"].to_numpy())
                          .astype(np.int64)),
            "y": pa.array(np.rint(t["l_discount"].to_numpy() * 100)
                          .astype(np.int64)),
        })

    return grouped_corr(li.map_batches(base, batch_format="pyarrow"),
                        ["l_returnflag", "l_linestatus"], "x", "y")


def q_ntile_spend(sf_dir: str):
    """Customer spend quartiles — SQL NTILE(4) with NO global sort
    (stages/selection.py::ntile_assign): tile boundaries are integer
    order statistics found by counts-only refinement; rows then
    self-assign by threshold compare. Tie-break (custkey) is packed into
    the low bits of the composite key, kept exact by the int64-domain
    selection (a float packing would collapse past 2^53)."""
    from ..stages.pivot import bucketed_sum
    from ..stages.selection import ntile_assign

    ords = read_table(sf_dir, "orders",
                      columns=["o_custkey", "o_totalprice"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "cents": pa.array(
                np.floor(t["o_totalprice"].to_numpy() * 100)
                .astype(np.int64)),
        })

    spend = bucketed_sum(ords.map_batches(base, batch_format="pyarrow"),
                         ["o_custkey"], ["cents"])

    def pack(t: pa.Table) -> pa.Table:
        ck = t["o_custkey"].to_numpy()
        if len(ck) and ck.max() >= (1 << 22):
            raise ValueError("custkey exceeds the 22-bit tie-break width")
        packed = ck - t["cents"].to_numpy() * (1 << 22)
        return t.append_column("packed", pa.array(packed, pa.int64()))

    packed = spend.map_batches(pack, batch_format="pyarrow").materialize()
    out = ntile_assign(packed, "packed", 4)
    return out.select_columns(["o_custkey", "cents", "tile"])


def q_except_extracts(sf_dir: str):
    """SQL EXCEPT between two extracts (§2.7 distinct + J6 anti-join
    composed): distinct urgent-order (custkey, status) pairs minus pairs
    that also appear on a big-ticket order."""
    from ..stages.joins import anti_join
    from ..stages.pivot import distinct_keys

    ords = read_table(sf_dir, "orders",
                      columns=["o_custkey", "o_orderstatus",
                               "o_orderpriority", "o_totalprice"])
    urgent = distinct_keys(
        ords.filter(expr="o_orderpriority == '1-URGENT'")
            .select_columns(["o_custkey", "o_orderstatus"]),
        ["o_custkey", "o_orderstatus"])
    big = ords.filter(expr="o_totalprice > 150000.0") \
              .select_columns(["o_custkey", "o_orderstatus"])
    return anti_join(urgent, big, ["o_custkey", "o_orderstatus"])


QUERIES["scd2_history"] = q_scd2_history
QUERIES["time_travel_snapshot"] = q_time_travel_snapshot
QUERIES["event_funnel"] = q_event_funnel
QUERIES["retention_cohorts"] = q_retention_cohorts
QUERIES["qty_discount_corr"] = q_qty_discount_corr
QUERIES["ntile_spend"] = q_ntile_spend
QUERIES["except_extracts"] = q_except_extracts

_EV_CTE = """
WITH v(v) AS (SELECT * FROM (VALUES (0),(1),(2),(3)) t(v)),
ev AS (
  SELECT 'r' || CAST(d.doc_id % 97 AS VARCHAR) AS repo,
         'f/' || CAST(d.doc_id AS VARCHAR) AS path,
         CAST(d.doc_id * 10 + v.v AS BIGINT) AS lsn,
         substring(sha256('c' || CAST(d.doc_id * 10 + v.v AS VARCHAR)), 1, 40) AS commit,
         CASE WHEN v.v = d.doc_id % 4 AND d.doc_id % 7 = 0 THEN 'delete'
              WHEN v.v = 0 THEN 'insert' ELSE 'update' END AS op,
         CASE WHEN v.v = d.doc_id % 4 AND d.doc_id % 7 = 0 THEN NULL
              ELSE d.lang END AS lang,
         CASE WHEN v.v = d.doc_id % 4 AND d.doc_id % 7 = 0 THEN NULL
              ELSE d.text || '::v' || CAST(v.v AS VARCHAR) END AS content
  FROM documents d JOIN v ON v.v <= d.doc_id % 4
)"""

ORACLE_SQL["scd2_history"] = _EV_CTE + """,
led AS (
  SELECT repo, path, lsn, op, commit, content,
         lead(lsn) OVER (PARTITION BY repo, path ORDER BY lsn) AS valid_to
  FROM ev)
SELECT repo, path, lsn AS valid_from, valid_to,
       valid_to IS NULL AS is_current,
       commit, sha256(content) AS content_sha
FROM led WHERE op <> 'delete'
"""

ORACLE_SQL["time_travel_snapshot"] = _EV_CTE + """,
pre AS (SELECT * FROM ev WHERE lsn <= 2500),
w AS (SELECT repo, path, MAX(lsn) AS last_lsn FROM pre GROUP BY repo, path)
SELECT e.repo, e.path, w.last_lsn, e.commit, e.lang,
       sha256(e.content) AS content_sha
FROM pre e JOIN w ON e.repo = w.repo AND e.path = w.path
                 AND e.lsn = w.last_lsn
WHERE e.op <> 'delete'
"""

ORACLE_SQL["event_funnel"] = """
WITH s0 AS (SELECT user_id, min(ts) AS t FROM events
            WHERE event_type = 'view' GROUP BY 1),
s1 AS (SELECT e.user_id, min(e.ts) AS t
       FROM events e JOIN s0 ON e.user_id = s0.user_id
       WHERE e.event_type = 'click' AND e.ts > s0.t GROUP BY 1),
s2 AS (SELECT e.user_id, min(e.ts) AS t
       FROM events e JOIN s1 ON e.user_id = s1.user_id
       WHERE e.event_type = 'purchase' AND e.ts > s1.t GROUP BY 1)
SELECT CAST(0 AS BIGINT) AS step, 'view' AS stage,
       CAST((SELECT count(*) FROM s0) AS BIGINT) AS n_users
UNION ALL SELECT 1, 'click', CAST((SELECT count(*) FROM s1) AS BIGINT)
UNION ALL SELECT 2, 'purchase', CAST((SELECT count(*) FROM s2) AS BIGINT)
"""

ORACLE_SQL["retention_cohorts"] = """
WITH uw AS (
  SELECT DISTINCT user_id,
         date_diff('day', DATE '1970-01-01', ts) // 7 AS period
  FROM events),
c AS (SELECT user_id, min(period) AS cohort FROM uw GROUP BY 1)
SELECT CAST(c.cohort AS BIGINT) AS cohort_week,
       CAST(uw.period - c.cohort AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c ON uw.user_id = c.user_id
GROUP BY 1, 2
"""

ORACLE_SQL["qty_discount_corr"] = """
WITH b AS (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity) AS BIGINT) AS x,
         CAST(round(l_discount * 100) AS BIGINT) AS y
  FROM lineitem),
s AS (
  SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(y * y) AS syy, sum(x * y) AS sxy
  FROM b GROUP BY 1, 2)
SELECT l_returnflag, l_linestatus, n,
  CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0 THEN NULL
       ELSE CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
            / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
               * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 1e9) AS BIGINT)
  END AS corr_e9,
  CASE WHEN n * sxx - sx * sx = 0 THEN NULL
       ELSE CAST(floor(CAST(n * sxy - sx * sy AS DOUBLE)
            / CAST(n * sxx - sx * sx AS DOUBLE) * 1e9) AS BIGINT)
  END AS slope_e9
FROM s
"""

ORACLE_SQL["ntile_spend"] = """
WITH spend AS (
  SELECT o_custkey,
         CAST(sum(CAST(floor(o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders GROUP BY 1)
SELECT o_custkey, cents,
       CAST(ntile(4) OVER (ORDER BY cents DESC, o_custkey) AS BIGINT)
         AS tile
FROM spend
"""

ORACLE_SQL["except_extracts"] = """
SELECT o_custkey, o_orderstatus FROM orders
WHERE o_orderpriority = '1-URGENT'
EXCEPT
SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 150000
"""


def q_order_window_overlaps(sf_dir: str):
    """Interval-overlap join (stages/intervals.py::interval_overlap_join —
    a join class Ray Data lacks): order service windows vs a sampled set
    of long campaign windows, paired when the ranges intersect. Grid-cell
    co-location with canonical-cell emission — each pair materializes in
    exactly one cell, no dedup exchange."""
    from ..stages.intervals import interval_overlap_join

    DAY = 86_400_000_000

    ords = read_table(sf_dir, "orders",
                      columns=["o_orderkey", "o_orderdate"])

    def win(t: pa.Table, days_fn, key_name: str) -> pa.Table:
        k = t["o_orderkey"].to_numpy()
        s = t["o_orderdate"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        return pa.table({
            key_name: pa.array(k),
            "s": pa.array(s, pa.int64()),
            "e": pa.array(s + days_fn(k) * DAY, pa.int64()),
        })

    left = ords.map_batches(
        lambda t: win(t, lambda k: (k % 7) + 1, "l_orderkey"),
        batch_format="pyarrow")
    def right_win(t: pa.Table) -> pa.Table:
        t = t.filter(pa.array(t["o_orderkey"].to_numpy() % 101 == 0))
        return win(t, lambda k: np.full(len(k), 14), "r_orderkey")

    right = ords.map_batches(right_win, batch_format="pyarrow")

    pairs = interval_overlap_join(
        left, right,
        left_start="s", left_end="e", right_start="s", right_end="e",
        cell_width=32 * DAY)
    return pairs.select_columns(["l_orderkey", "r_orderkey"])


def q_value_outliers(sf_dir: str):
    """Robust per-type outlier gate (stages/stats.py::mad_outliers):
    events whose value deviates from the type median by > 5 MADs —
    medians by the engine's discrete quantile rule, thresholds broadcast
    back over a stateless filter."""
    from ..stages.stats import mad_outliers

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"])
    out = mad_outliers(ev, ["event_type"], "value", k=5.0)
    return out.select_columns(["event_id", "event_type", "value"])


QUERIES["order_window_overlaps"] = q_order_window_overlaps
QUERIES["value_outliers"] = q_value_outliers

ORACLE_SQL["order_window_overlaps"] = """
WITH l AS (
  SELECT o_orderkey AS l_orderkey, o_orderdate AS s,
         o_orderdate + ((o_orderkey % 7) + 1) * INTERVAL 1 DAY AS e
  FROM orders),
r AS (
  SELECT o_orderkey AS r_orderkey, o_orderdate AS s,
         o_orderdate + 14 * INTERVAL 1 DAY AS e
  FROM orders WHERE o_orderkey % 101 = 0)
SELECT l.l_orderkey, r.r_orderkey
FROM l JOIN r ON l.s <= r.e AND r.s <= l.e
"""

ORACLE_SQL["value_outliers"] = """
WITH s AS (
  SELECT event_type, value,
         row_number() OVER (PARTITION BY event_type ORDER BY value) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM events),
med AS (SELECT event_type, value AS med FROM s WHERE rn = (n - 1) // 2 + 1),
d AS (
  SELECT e.event_id, e.event_type, e.value, abs(e.value - m.med) AS dev
  FROM events e JOIN med m USING (event_type)),
s2 AS (
  SELECT event_type, dev,
         row_number() OVER (PARTITION BY event_type ORDER BY dev) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM d),
mad AS (SELECT event_type, dev AS mad FROM s2 WHERE rn = (n - 1) // 2 + 1)
SELECT d.event_id, d.event_type, d.value
FROM d JOIN mad USING (event_type)
WHERE d.dev > 5 * mad.mad
"""


def q_spend_gini(sf_dir: str):
    """Per-nation Gini concentration of customer spend (stages/stats.py::
    grouped_gini): per-customer totals first (facts collapse before any
    sort), nation attached by broadcast join, exact integer rank-weighted
    numerator, one double division."""
    from ..stages.joins import broadcast_inner_join
    from ..stages.pivot import bucketed_sum
    from ..stages.stats import grouped_gini

    ords = read_table(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "o_custkey": t["o_custkey"],
            "cents": pa.array(
                np.floor(t["o_totalprice"].to_numpy() * 100).astype(np.int64)),
        })

    spend = bucketed_sum(ords.map_batches(base, batch_format="pyarrow"),
                         ["o_custkey"], ["cents"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
    tagged = broadcast_inner_join(spend, cust, ["o_custkey"],
                                  right_on=("c_custkey",))
    return grouped_gini(tagged, ["c_nationkey"], "cents")


def q_weekly_growth(sf_dir: str):
    """Week-over-week revenue growth per event type (stages/windows.py::
    grouped_shift — the generic LAG): weekly cents rollup, previous week
    attached within the type partition, growth quantized to 1e-9; first
    weeks stay NULL."""
    from ..stages.pivot import bucketed_sum
    from ..stages.windows import grouped_shift

    WEEK = 7 * 86_400_000_000

    ev = read_table(sf_dir, "events", columns=["event_type", "ts", "value"])

    def base(t: pa.Table) -> pa.Table:
        us = t["ts"].combine_chunks().cast(pa.timestamp("us")) \
            .cast(pa.int64()).to_numpy()
        return pa.table({
            "event_type": t["event_type"],
            "week": pa.array(us // WEEK, pa.int64()),
            "cents": pa.array(
                np.floor(t["value"].to_numpy() * 100).astype(np.int64)),
        })

    wk = bucketed_sum(ev.map_batches(base, batch_format="pyarrow"),
                      ["event_type", "week"], ["cents"])
    lagged = grouped_shift(wk, key_cols=("event_type",), order_cols=["week"],
                           value_col="cents", periods=1,
                           out_col="prev_cents")

    def growth(df: pd.DataFrame) -> pd.DataFrame:
        prev = df["prev_cents"].to_numpy(dtype="float64", na_value=np.nan)
        cur = df["cents"].to_numpy(dtype="float64")
        ok = ~np.isnan(prev) & (prev != 0)
        g = np.zeros(len(df), np.int64)
        g[ok] = np.floor((cur[ok] - prev[ok]) / prev[ok] * 1e9).astype(np.int64)
        df = df.copy()
        df["growth_e9"] = pd.arrays.IntegerArray(g, mask=~ok)
        return df

    return lagged.map_batches(growth, batch_format="pandas")


QUERIES["spend_gini"] = q_spend_gini
QUERIES["weekly_growth"] = q_weekly_growth

ORACLE_SQL["spend_gini"] = """
WITH spend AS (
  SELECT c.c_nationkey, o.o_custkey,
         CAST(sum(CAST(floor(o.o_totalprice * 100) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2),
r AS (
  SELECT c_nationkey, cents,
         row_number() OVER (PARTITION BY c_nationkey ORDER BY cents) AS rn,
         count(*) OVER (PARTITION BY c_nationkey) AS n,
         sum(cents) OVER (PARTITION BY c_nationkey) AS tot
  FROM spend)
SELECT c_nationkey, CAST(max(n) AS BIGINT) AS n,
       CAST(floor(CAST(sum((2 * rn - n - 1) * cents) AS DOUBLE)
            / CAST(max(n) * max(tot) AS DOUBLE) * 1e9) AS BIGINT) AS gini_e9
FROM r GROUP BY c_nationkey
"""

ORACLE_SQL["weekly_growth"] = """
WITH w AS (
  SELECT event_type,
         CAST(date_diff('day', DATE '1970-01-01', ts) // 7 AS BIGINT)
           AS week,
         CAST(sum(CAST(floor(value * 100) AS BIGINT)) AS BIGINT) AS cents
  FROM events GROUP BY 1, 2),
l AS (
  SELECT event_type, week, cents,
         lag(cents) OVER (PARTITION BY event_type ORDER BY week)
           AS prev_cents
  FROM w)
SELECT event_type, week, cents, prev_cents,
       CASE WHEN prev_cents IS NULL OR prev_cents = 0 THEN NULL
            ELSE CAST(floor(CAST(cents - prev_cents AS DOUBLE)
                 / CAST(prev_cents AS DOUBLE) * 1e9) AS BIGINT)
       END AS growth_e9
FROM l
"""


def q_event_transitions(sf_dir: str):
    """Per-user event-type transition matrix (Markov-chain features):
    previous type attached by stages/windows.py::grouped_shift (dictionary
    indices shift, no per-row Python), then a (prev, next) count rollup —
    one entity exchange plus a 25-row fold."""
    from ..stages.pivot import bucketed_sum
    from ..stages.windows import grouped_shift

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "event_id", "ts", "event_type"])
    lagged = grouped_shift(ev, key_cols=("user_id",),
                           order_cols=["ts", "event_id"],
                           value_col="event_type", periods=1,
                           out_col="prev_type")

    def pairs(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_valid(t["prev_type"]))
        return pa.table({
            "prev_type": t["prev_type"],
            "next_type": t["event_type"],
            "n": pa.array(np.ones(len(t), np.int64)),
        })

    return bucketed_sum(lagged.map_batches(pairs, batch_format="pyarrow"),
                        ["prev_type", "next_type"], ["n"])


QUERIES["event_transitions"] = q_event_transitions

ORACLE_SQL["event_transitions"] = """
WITH l AS (
  SELECT user_id, event_type,
         lag(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events)
SELECT prev_type, event_type AS next_type, CAST(count(*) AS BIGINT) AS n
FROM l WHERE prev_type IS NOT NULL
GROUP BY 1, 2
"""


def q_pareto_orders(sf_dir: str):
    """Price/recency Pareto frontier of orders (stages/selection.py::
    pareto_skyline_2d): cheapest-for-their-recency distinct points via the
    associative local-skyline reduce — the exchange is skyline-sized."""
    from ..stages.selection import pareto_skyline_2d

    DAY_US = 86_400_000_000

    ords = read_table(sf_dir, "orders",
                      columns=["o_totalprice", "o_orderdate"])

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "price_cents": pa.array(
                np.floor(t["o_totalprice"].to_numpy() * 100)
                .astype(np.int64)),
            "order_day": pa.array(
                t["o_orderdate"].combine_chunks()
                .cast(pa.timestamp("us")).cast(pa.int64()).to_numpy()
                // DAY_US, pa.int64()),
        })

    return pareto_skyline_2d(ords.map_batches(base, batch_format="pyarrow"),
                             "price_cents", "order_day")


QUERIES["pareto_orders"] = q_pareto_orders

ORACLE_SQL["pareto_orders"] = """
WITH pts AS (
  SELECT DISTINCT CAST(floor(o_totalprice * 100) AS BIGINT) AS price_cents,
         CAST(date_diff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
           AS order_day
  FROM orders),
w AS (
  SELECT price_cents, order_day,
         max(order_day) OVER (ORDER BY price_cents ASC, order_day DESC
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS mx
  FROM pts)
SELECT price_cents, order_day FROM w WHERE mx IS NULL OR order_day > mx
"""


def q_priority_status_assoc(sf_dir: str):
    """Chi-square association between order priority and status
    (stages/stats.py::category_assoc): per-cell observed/expected/χ²
    contribution, per-cell quantization — no float summation order
    anywhere in the contract."""
    from ..stages.stats import category_assoc

    ords = read_table(sf_dir, "orders",
                      columns=["o_orderpriority", "o_orderstatus"])
    return category_assoc(ords, "o_orderpriority", "o_orderstatus")


QUERIES["priority_status_assoc"] = q_priority_status_assoc

ORACLE_SQL["priority_status_assoc"] = """
WITH c AS (
  SELECT o_orderpriority, o_orderstatus, CAST(count(*) AS BIGINT) AS n
  FROM orders GROUP BY 1, 2),
m AS (
  SELECT o_orderpriority, o_orderstatus, n,
         sum(n) OVER (PARTITION BY o_orderpriority) AS ra,
         sum(n) OVER (PARTITION BY o_orderstatus) AS cb,
         sum(n) OVER () AS tot
  FROM c),
e AS (
  SELECT o_orderpriority, o_orderstatus, n,
         CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(tot AS DOUBLE)
           AS ex
  FROM m)
SELECT o_orderpriority, o_orderstatus, n,
       CAST(floor(ex * 1e6) AS BIGINT) AS expected_e6,
       CAST(floor((CAST(n AS DOUBLE) - ex) * (CAST(n AS DOUBLE) - ex)
            / ex * 1e6) AS BIGINT) AS contrib_e6
FROM e
"""


def q_props_rollup(sf_dir: str):
    """JSON event-properties extraction + rollup (stages/json_fields.py::
    extract_json_fields — the reference's stage-record JSON column made
    columnar): the flat fast path is one RE2 kernel per field, fused into
    the read; then a per-type integer rollup."""
    from ..stages.json_fields import extract_json_fields
    from ..stages.pivot import bucketed_sum

    ev = read_table(sf_dir, "events", columns=["event_type", "props"])
    ext = extract_json_fields(ev, "props", {"k": pa.int64()})

    def base(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_type": t["event_type"],
            "sum_k": t["k"],
            "n_with_k": pc.cast(pc.is_valid(t["k"]), pa.int64()),
        })

    return bucketed_sum(ext.map_batches(base, batch_format="pyarrow"),
                        ["event_type"], ["sum_k", "n_with_k"])


QUERIES["props_rollup"] = q_props_rollup

ORACLE_SQL["props_rollup"] = """
SELECT event_type,
       CAST(sum(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS sum_k,
       CAST(count(json_extract(props, '$.k')) AS BIGINT) AS n_with_k
FROM events GROUP BY 1
"""


def q_snapshot_diff(sf_dir: str):
    """Diff between two LSN snapshots of the CDC table
    (stages/history.py::snapshot_diff): keys classified added / removed /
    changed / unchanged between the lsn<=2500 state and the final state —
    the audit report of an incremental load, in ONE exchange (the old and
    new winners are elected in the same bucket pass; the previous
    two-lww-passes + full-outer-join shape paid three)."""
    from ..stages.history import snapshot_diff

    events = events_from_documents(sf_dir)
    return snapshot_diff(events, 2500, num_buckets=16)


def q_fk_orphans(sf_dir: str):
    """Referential-integrity audit across FK edges (J8 composed per edge):
    child keys with no parent, one count per relation — the reference's
    missing-records validation as one report."""
    from ..stages.joins import bloom_anti_join
    from ..stages.pivot import distinct_keys

    ords = read_table(sf_dir, "orders", columns=["o_custkey"])
    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    li = read_table(sf_dir, "lineitem", columns=["l_orderkey"])
    okeys = read_table(sf_dir, "orders", columns=["o_orderkey"])

    def ren(ds, old, new):
        return ds.map_batches(lambda t: t.rename_columns([new]),
                              batch_format="pyarrow")

    o1 = bloom_anti_join(distinct_keys(ords, ["o_custkey"]),
                         ren(cust, "c_custkey", "o_custkey"), ["o_custkey"])
    o2 = bloom_anti_join(distinct_keys(li, ["l_orderkey"]),
                         ren(okeys, "o_orderkey", "l_orderkey"),
                         ["l_orderkey"])
    n1, n2 = o1.count(), o2.count()
    return pa.table({
        "relation": pa.array(["orders->customer", "lineitem->orders"]),
        "n_orphans": pa.array([n1, n2], pa.int64()),
    })


QUERIES["snapshot_diff"] = q_snapshot_diff
QUERIES["fk_orphans"] = q_fk_orphans

ORACLE_SQL["snapshot_diff"] = _EV_CTE + """,
w_old AS (SELECT repo, path, MAX(lsn) AS lsn FROM ev WHERE lsn <= 2500
          GROUP BY repo, path),
s_old AS (SELECT e.repo, e.path, e.lsn AS old_lsn,
                 sha256(e.content) AS old_sha
          FROM ev e JOIN w_old w ON e.repo = w.repo AND e.path = w.path
                                AND e.lsn = w.lsn
          WHERE e.op <> 'delete'),
w_new AS (SELECT repo, path, MAX(lsn) AS lsn FROM ev GROUP BY repo, path),
s_new AS (SELECT e.repo, e.path, e.lsn AS new_lsn,
                 sha256(e.content) AS new_sha
          FROM ev e JOIN w_new w ON e.repo = w.repo AND e.path = w.path
                                AND e.lsn = w.lsn
          WHERE e.op <> 'delete')
SELECT coalesce(o.repo, n.repo) AS repo,
       coalesce(o.path, n.path) AS path,
       CASE WHEN o.old_sha IS NULL THEN 'added'
            WHEN n.new_sha IS NULL THEN 'removed'
            WHEN o.old_sha = n.new_sha THEN 'unchanged'
            ELSE 'changed' END AS kind,
       o.old_lsn, n.new_lsn
FROM s_old o FULL OUTER JOIN s_new n
  ON o.repo = n.repo AND o.path = n.path
"""

ORACLE_SQL["fk_orphans"] = """
SELECT 'orders->customer' AS relation,
       CAST((SELECT count(*) FROM (
         SELECT DISTINCT o_custkey FROM orders
         WHERE o_custkey NOT IN (SELECT c_custkey FROM customer)))
         AS BIGINT) AS n_orphans
UNION ALL
SELECT 'lineitem->orders',
       CAST((SELECT count(*) FROM (
         SELECT DISTINCT l_orderkey FROM lineitem
         WHERE l_orderkey NOT IN (SELECT o_orderkey FROM orders)))
         AS BIGINT)
"""


def q_normalize_docs(sf_dir: str):
    """Text canonicalization before dedup (stages/text.py::normalize_text):
    lowercase -> NFC -> whitespace collapse -> trim, plus the sha256 of the
    canonical form — the normalization every exact/near dedup assumes."""
    from ..stages.text import normalize_text

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return normalize_text(docs, "text")


def q_fuzzy_customer_pairs(sf_dir: str):
    """Fuzzy duplicate-key detection (stages/dedup.py::fuzzy_pairs): all
    customer pairs whose names are at Levenshtein distance <= 1, exact
    distance attached. SymSpell deletion-neighborhood banding; verified
    distance, not LSH-approximate."""
    from ..stages.dedup import fuzzy_pairs

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])
    return fuzzy_pairs(cust, name_col="c_name", id_col="c_custkey")


def q_multi_stream_merge(sf_dir: str):
    """K-way CDC stream merge (stages/lww.py::multi_stream_lww): two replica
    event streams (split of the events table) merged to final per-user state;
    max ts wins, LSN ties broken by stream priority then event_id."""
    import pyarrow.compute as pc

    from ..stages.lww import multi_stream_lww

    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    ev = read_table(sf_dir, "events", columns=cols)
    prim = ev.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 1), 0)),
        batch_format="pyarrow")
    repl = ev.map_batches(
        lambda t: t.filter(pc.equal(pc.bit_wise_and(t["event_id"], 1), 1)),
        batch_format="pyarrow")
    out = multi_stream_lww([(prim, 0), (repl, 1)], ["user_id"], "ts",
                           "event_id")
    return out.select_columns(["user_id", "ts", "event_type", "value",
                               "stream"])


def q_pseudonymize_events(sf_dir: str):
    """Stable keyed pseudonymization (stages/transforms.py::pseudonymize):
    user_id replaced by a salted sha256 prefix; joins on the pseudonym still
    line up, the raw id never reaches the sink."""
    from ..stages.transforms import pseudonymize

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "user_id", "event_type"])
    return pseudonymize(ev, ["user_id"], salt="s1")


QUERIES["normalize_docs"] = q_normalize_docs
QUERIES["fuzzy_customer_pairs"] = q_fuzzy_customer_pairs
QUERIES["multi_stream_merge"] = q_multi_stream_merge
QUERIES["pseudonymize_events"] = q_pseudonymize_events

ORACLE_SQL["normalize_docs"] = r"""
WITH n AS (
  SELECT doc_id,
         trim(regexp_replace(nfc_normalize(lower(coalesce(text, ''))),
                             '\s+', ' ', 'g')) AS text
  FROM documents)
SELECT doc_id, text, sha256(text) AS norm_sha FROM n
"""

ORACLE_SQL["fuzzy_customer_pairs"] = """
SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
       CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= 1
"""

ORACLE_SQL["multi_stream_merge"] = """
SELECT user_id, ts, event_type, value, stream
FROM (
  SELECT user_id, ts, event_type, value,
         CAST(event_id % 2 AS BIGINT) AS stream,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts DESC, event_id % 2 ASC,
                                     event_id DESC) AS rn
  FROM events)
WHERE rn = 1
"""

ORACLE_SQL["pseudonymize_events"] = """
SELECT event_id,
       event_type,
       substring(sha256('s1:' || CAST(user_id AS VARCHAR)), 1, 16)
         AS user_id_pseudo
FROM events
"""


def q_reconciliation_plan(sf_dir: str):
    """Corrective-action plan (stages/detectors.py::reconciliation_plan):
    converge a drifted destination copy of customer onto the source —
    missing rows -> insert, altered balances -> update, phantom rows ->
    delete; identical rows emit nothing. One cogroup full-outer pass."""
    from ..stages.detectors import reconciliation_plan

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_acctbal"])

    def drifted(t: pa.Table) -> pa.Table:
        key = t["c_custkey"]
        keep = pc.invert(pc.equal(pc.bit_wise_and(key, 7), 3))  # drop some
        t = t.filter(keep)
        key = t["c_custkey"]
        bal = pc.if_else(pc.equal(pc.bit_wise_and(key, 7), 5),
                         pc.round(pc.add(t["c_acctbal"], 1.5), 2),
                         t["c_acctbal"])                        # drift some
        ph = pc.equal(pc.bit_wise_and(key, 63), 9)  # batch-independent
        extra = pa.table({                           # phantom rows
            "c_custkey": pc.add(t.filter(ph)["c_custkey"],
                                pa.scalar(9_000_000, pa.int64())),
            "c_acctbal": t.filter(ph)["c_acctbal"],
        })
        return pa.concat_tables(
            [pa.table({"c_custkey": key, "c_acctbal": bal}), extra])

    dst = cust.map_batches(drifted, batch_format="pyarrow")
    return reconciliation_plan(cust, dst, ["c_custkey"], ["c_acctbal"])


def q_hot_keys(sf_dir: str):
    """Skew diagnostic (stages/stats.py::hot_keys): top-20 users by event
    count with their share of total traffic — the report that says which
    keys need salting before a shuffle."""
    from ..stages.stats import hot_keys

    ev = read_table(sf_dir, "events", columns=["user_id"])
    return hot_keys(ev, ["user_id"], k=20)


QUERIES["reconciliation_plan"] = q_reconciliation_plan
QUERIES["hot_keys"] = q_hot_keys

ORACLE_SQL["reconciliation_plan"] = """
WITH dst AS (
  SELECT c_custkey,
         CASE WHEN c_custkey & 7 = 5 THEN round(c_acctbal + 1.5, 2)
              ELSE c_acctbal END AS c_acctbal
  FROM customer WHERE c_custkey & 7 <> 3
  UNION ALL
  SELECT c_custkey + 9000000, c_acctbal
  FROM customer WHERE c_custkey & 7 <> 3 AND c_custkey & 63 = 9
)
SELECT coalesce(s.c_custkey, d.c_custkey) AS c_custkey,
       CASE WHEN d.c_custkey IS NULL THEN 'insert'
            WHEN s.c_custkey IS NULL THEN 'delete'
            ELSE 'update' END AS action
FROM customer s FULL OUTER JOIN dst d ON s.c_custkey = d.c_custkey
WHERE d.c_custkey IS NULL OR s.c_custkey IS NULL
   OR s.c_acctbal <> d.c_acctbal
"""

ORACLE_SQL["hot_keys"] = """
WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS n
           FROM events GROUP BY user_id),
     t AS (SELECT CAST(sum(n) AS DOUBLE) AS total FROM c)
SELECT user_id, n, n / t.total AS share
FROM c, t
ORDER BY n DESC, user_id ASC
LIMIT 20
"""


def q_extract_fields(sf_dir: str):
    """Structured field parsing (stages/text.py::extract_regex): first
    '<verb> <object>' phrase per document pulled into typed columns —
    vectorized RE2, no shuffle."""
    from ..stages.text import extract_regex

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return extract_regex(
        docs, r"(?P<verb>scan|merge|join) (?P<obj>[a-z]+)",
        keep_cols=["doc_id"])


QUERIES["extract_fields"] = q_extract_fields

ORACLE_SQL["extract_fields"] = """
SELECT doc_id,
       nullif(regexp_extract(text, '(scan|merge|join) ([a-z]+)', 1), '')
         AS verb,
       nullif(regexp_extract(text, '(scan|merge|join) ([a-z]+)', 2), '')
         AS obj
FROM documents
"""


def q_bm25_search(sf_dir: str):
    """BM25 keyword retrieval (stages/text.py::bm25_search): top-10 docs for
    a 3-term query; per-(doc,term) cells quantized to 1e-9 before the
    per-doc sum so no float summation order exists in the contract."""
    from ..stages.text import bm25_search

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return bm25_search(docs, ["merge", "window", "spark"], k=10)


QUERIES["bm25_search"] = q_bm25_search

ORACLE_SQL["bm25_search"] = """
WITH toks AS (
  SELECT doc_id, unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents),
dl AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS dl FROM toks
       GROUP BY doc_id),
g AS (SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl FROM dl),
q(term) AS (VALUES ('merge'), ('spark'), ('window')),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM toks
       WHERE term IN (SELECT term FROM q) GROUP BY doc_id, term),
df AS (SELECT q.term,
              CAST(count(DISTINCT toks.doc_id) AS BIGINT) AS df
       FROM q LEFT JOIN toks ON toks.term = q.term GROUP BY q.term),
cells AS (
  SELECT tf.doc_id,
         CAST(floor(
           ln((g.n - df.df + 0.5) / (df.df + 0.5) + 1.0)
           * tf.tf * (1.2 + 1.0)
           / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / g.avgdl))
           * 1e9) AS BIGINT) AS cell
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN g)
SELECT doc_id, CAST(sum(cell) AS BIGINT) AS score_e9
FROM cells GROUP BY doc_id
ORDER BY score_e9 DESC, doc_id ASC
LIMIT 10
"""


def q_cube_revenue(sf_dir: str):
    """GROUP BY CUBE over (returnflag, linestatus)
    (stages/pivot.py::cube_sum): all four grouping sets in one exchange;
    integer cents so the distributed fold is byte-equal to SQL."""
    from ..stages.pivot import cube_sum

    li = read_table(sf_dir, "lineitem",
                    columns=["l_returnflag", "l_linestatus",
                             "l_extendedprice"])

    def prep(t: pa.Table) -> pa.Table:
        return pa.table({
            "l_returnflag": t["l_returnflag"],
            "l_linestatus": t["l_linestatus"],
            "cents": pa.array(np.rint(
                t["l_extendedprice"].to_numpy() * 100).astype("int64")),
        })

    return cube_sum(li.map_batches(prep, batch_format="pyarrow"),
                    ["l_returnflag", "l_linestatus"], ["cents"])


QUERIES["cube_revenue"] = q_cube_revenue

ORACLE_SQL["cube_revenue"] = """
SELECT coalesce(l_returnflag, 'ALL') AS l_returnflag,
       coalesce(l_linestatus, 'ALL') AS l_linestatus,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


def q_user_journeys(sf_dir: str):
    """Per-user journey strings (stages/pivot.py::grouped_concat — SQL
    string_agg with ORDER BY): event types concatenated in (ts, event_id)
    order; one exchange, list-offset binary_join per bucket."""
    from ..stages.pivot import grouped_concat

    ev = read_table(sf_dir, "events",
                    columns=["user_id", "ts", "event_id", "event_type"])
    return grouped_concat(ev, ["user_id"], "event_type",
                          ["ts", "event_id"], sep=">", out_col="journey")


QUERIES["user_journeys"] = q_user_journeys

ORACLE_SQL["user_journeys"] = """
SELECT user_id,
       string_agg(event_type, '>' ORDER BY ts, event_id) AS journey
FROM events GROUP BY user_id
"""


def q_context_windows(sf_dir: str):
    """LM context chunking (stages/packing.py::context_windows): 32-token
    windows, stride 16, per document — stateless flat map, no shuffle."""
    from ..stages.packing import context_windows

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    return context_windows(docs, window=32, stride=16)


QUERIES["context_windows"] = q_context_windows

ORACLE_SQL["context_windows"] = """
WITH d AS (SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
           FROM documents),
wins AS (
  SELECT doc_id, w,
         unnest(range(0, CASE WHEN len(w) < 32 THEN 0
                              ELSE (len(w) - 32) // 16 + 1 END)) AS win
  FROM d)
SELECT doc_id, CAST(win AS BIGINT) AS win,
       array_to_string(list_slice(w, win * 16 + 1, win * 16 + 32), ' ')
         AS text_window
FROM wins
"""


def q_incremental_agg(sf_dir: str):
    """Incremental view maintenance (stages/history.py::
    incremental_group_agg): per-repo live-file count + total chars
    maintained across the lsn=2500 cut by signed per-key deltas — base +
    delta must equal the full recompute (the oracle)."""
    from ..stages.history import incremental_group_agg

    events = events_from_documents(sf_dir)

    def with_len(t: pa.Table) -> pa.Table:
        return t.append_column(
            "n_chars", pc.cast(pc.utf8_length(
                pc.fill_null(t["content"], "")), pa.int64()))

    ev = events.map_batches(with_len, batch_format="pyarrow")
    return incremental_group_agg(ev, 2500, group_col="repo",
                                 val_col="n_chars", num_buckets=16)


QUERIES["incremental_agg"] = q_incremental_agg

ORACLE_SQL["incremental_agg"] = _EV_CTE + """,
fin AS (SELECT repo, path, op, len(coalesce(content, '')) AS v,
               row_number() OVER (PARTITION BY repo, path
                                  ORDER BY lsn DESC) AS rn FROM ev),
fstate AS (SELECT repo, v FROM fin WHERE rn = 1 AND op <> 'delete'),
old AS (SELECT repo, path, op, len(coalesce(content, '')) AS v,
               row_number() OVER (PARTITION BY repo, path
                                  ORDER BY lsn DESC) AS rn
        FROM ev WHERE lsn <= 2500),
ostate AS (SELECT repo, v FROM old WHERE rn = 1 AND op <> 'delete'),
f AS (SELECT repo, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS total FROM fstate GROUP BY repo),
o AS (SELECT repo, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v) AS BIGINT) AS total FROM ostate GROUP BY repo)
SELECT f.repo, f.n, f.total,
       f.n - coalesce(o.n, 0) AS delta_n,
       f.total - coalesce(o.total, 0) AS delta_total
FROM f LEFT JOIN o USING (repo)
"""


def q_intersect_extracts(sf_dir: str):
    """SQL INTERSECT between two extracts (§2.7 distinct + J7 semi-join
    composed — the set-op triple with union_extracts / except_extracts):
    distinct urgent-order (custkey, status) pairs that ALSO appear on a
    big-ticket order."""
    from ..stages.joins import semi_join
    from ..stages.pivot import distinct_keys

    ords = read_table(sf_dir, "orders",
                      columns=["o_custkey", "o_orderstatus",
                               "o_orderpriority", "o_totalprice"])
    urgent = distinct_keys(
        ords.filter(expr="o_orderpriority == '1-URGENT'")
            .select_columns(["o_custkey", "o_orderstatus"]),
        ["o_custkey", "o_orderstatus"])
    big = ords.filter(expr="o_totalprice > 150000.0") \
              .select_columns(["o_custkey", "o_orderstatus"])
    return semi_join(urgent, big, ["o_custkey", "o_orderstatus"])


QUERIES["intersect_extracts"] = q_intersect_extracts

ORACLE_SQL["intersect_extracts"] = """
SELECT o_custkey, o_orderstatus FROM orders
WHERE o_orderpriority = '1-URGENT'
INTERSECT
SELECT o_custkey, o_orderstatus FROM orders WHERE o_totalprice > 150000
"""


def q_quantize_embeddings(sf_dir: str):
    """int8 embedding quantization (stages/similarity.py::
    quantize_embeddings): 4x memory/wire reduction for the ANN scale path;
    exact IEEE formula shared with the oracle (no libm)."""
    from ..stages.similarity import quantize_embeddings

    emb = read_table(sf_dir, "embeddings", columns=["vec_id", "embedding"])
    return quantize_embeddings(emb)


QUERIES["quantize_embeddings"] = q_quantize_embeddings

ORACLE_SQL["quantize_embeddings"] = """
WITH s AS (
  SELECT vec_id, embedding,
         CAST(list_max(list_transform(embedding, y -> abs(y))) AS DOUBLE)
           AS scale
  FROM embeddings)
SELECT vec_id, CAST(pos AS BIGINT) AS pos, scale,
       CASE WHEN scale = 0 THEN 0
            ELSE CAST(floor(CAST(x AS DOUBLE) / scale * 127.0 + 0.5)
                      AS BIGINT) END AS code
FROM (SELECT vec_id, scale, unnest(embedding) AS x,
             unnest(range(1, len(embedding) + 1)) AS pos
      FROM s)
"""


def q_value_percentiles_cont(sf_dir: str):
    """PERCENTILE_CONT per event_type (stages/windows.py::
    grouped_percentiles_cont): linear interpolation with the rule stated
    identically in the oracle — no engine-internal interpolation."""
    from ..stages.windows import grouped_percentiles_cont

    ev = read_table(sf_dir, "events", columns=["event_type", "value"])
    return grouped_percentiles_cont(ev, ["event_type"], "value")


QUERIES["value_percentiles_cont"] = q_value_percentiles_cont

ORACLE_SQL["value_percentiles_cont"] = """
WITH g AS (
  SELECT event_type,
         array_agg(value ORDER BY value) AS vs,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY event_type)
SELECT event_type, n,
       vs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1]
         + (0.5 * (n - 1) - floor(0.5 * (n - 1)))
           * (vs[least(CAST(floor(0.5 * (n - 1)) AS BIGINT) + 2, n)]
              - vs[CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1]) AS p50_cont,
       vs[CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1]
         + (0.9 * (n - 1) - floor(0.9 * (n - 1)))
           * (vs[least(CAST(floor(0.9 * (n - 1)) AS BIGINT) + 2, n)]
              - vs[CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1]) AS p90_cont,
       vs[CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1]
         + (0.99 * (n - 1) - floor(0.99 * (n - 1)))
           * (vs[least(CAST(floor(0.99 * (n - 1)) AS BIGINT) + 2, n)]
              - vs[CAST(floor(0.99 * (n - 1)) AS BIGINT) + 1]) AS p99_cont
FROM g
"""


def q_shipping_priority(sf_dir: str):
    """TPC-H Q3 shape (shipping priority; the test tables carry
    o_orderpriority, used in place of o_shippriority): BUILDING-segment
    customers' open orders ranked by revenue — broadcast dimension semi-join, per-
    orderkey partial aggregation before the exchange, top-10 sort."""
    import datetime

    from ..stages.joins import broadcast_inner_join, semi_join
    from ..stages.pivot import bucketed_sum

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_mktsegment"])
    bld = cust.filter(expr="c_mktsegment == 'BUILDING'") \
              .select_columns(["c_custkey"])
    ords = read_table(sf_dir, "orders",
                      columns=["o_orderkey", "o_custkey", "o_orderdate",
                               "o_orderpriority"])
    cut = datetime.date(1995, 3, 15)
    ords = ords.map_batches(
        lambda t: t.filter(pc.less(t["o_orderdate"], pa.scalar(cut))),
        batch_format="pyarrow")
    ords = semi_join(ords.map_batches(
        lambda t: t.rename_columns(
            ["o_orderkey", "c_custkey", "o_orderdate", "o_orderpriority"]),
        batch_format="pyarrow"), bld, ["c_custkey"])
    li = read_table(sf_dir, "lineitem",
                    columns=["l_orderkey", "l_extendedprice", "l_discount",
                             "l_shipdate"])
    li = li.map_batches(
        lambda t: t.filter(pc.greater(t["l_shipdate"], pa.scalar(cut))),
        batch_format="pyarrow")

    def rev(t: pa.Table) -> pa.Table:
        cents = np.rint(t["l_extendedprice"].to_numpy() * 100).astype("int64")
        disc = np.rint(t["l_discount"].to_numpy() * 100).astype("int64")
        return pa.table({
            "l_orderkey": t["l_orderkey"],
            # integer ccents (cents x (100 - disc)): associative exact sum
            "rev_ccents": pa.array(cents * (100 - disc)),
        })

    li_rev = bucketed_sum(li.map_batches(rev, batch_format="pyarrow"),
                          ["l_orderkey"], ["rev_ccents"])
    joined = broadcast_inner_join(
        li_rev, ords.select_columns(["o_orderkey", "o_orderdate",
                                     "o_orderpriority"]),
        ["l_orderkey"], right_on=("o_orderkey",))
    out = joined.map_batches(
        lambda t: t.select(["l_orderkey", "rev_ccents", "o_orderdate",
                            "o_orderpriority"]), batch_format="pyarrow")
    return out.sort(["rev_ccents", "l_orderkey"],
                    descending=[True, False]).limit(10)


QUERIES["shipping_priority"] = q_shipping_priority

ORACLE_SQL["shipping_priority"] = """
SELECT l_orderkey,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * (100 - CAST(round(l_discount * 100) AS BIGINT)))
            AS BIGINT) AS rev_ccents,
       o_orderdate, o_orderpriority
FROM customer, orders, lineitem
WHERE c_mktsegment = 'BUILDING'
  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
  AND o_orderdate < DATE '1995-03-15' AND l_shipdate > DATE '1995-03-15'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY rev_ccents DESC, l_orderkey
LIMIT 10
"""


def q_triangle_count(sf_dir: str):
    """Global triangle count (stages/graph.py::triangle_count — Cohen
    wedge-generation + bloom-closed semi-join) over a deterministic
    97-node ring-with-chords graph derived from doc ids."""
    from ..stages.graph import triangle_count

    docs = read_table(sf_dir, "documents", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        x = pc.cast(pc.bit_wise_and(t["doc_id"], pa.scalar(0x7FFFFFFF)),
                    pa.int64())
        m = pa.scalar(97, pa.int64())
        a = pc.cast(pc.subtract(x, pc.multiply(pc.divide(x, m), m)),
                    pa.int64())
        nxt = pc.subtract(pc.add(a, 1), pc.multiply(
            pc.divide(pc.add(a, 1), m), m))
        skip = pc.subtract(pc.add(a, 2), pc.multiply(
            pc.divide(pc.add(a, 2), m), m))
        return pa.table({
            "src": pa.concat_arrays([a.combine_chunks(),
                                     a.combine_chunks()]),
            "dst": pa.concat_arrays([nxt.combine_chunks(),
                                     skip.combine_chunks()]),
        })

    return triangle_count(docs.map_batches(edges, batch_format="pyarrow"))


QUERIES["triangle_count"] = q_triangle_count

ORACLE_SQL["triangle_count"] = """
WITH n(x) AS (SELECT DISTINCT doc_id % 97 FROM documents),
e0 AS (SELECT x AS a, (x + 1) % 97 AS b FROM n
       UNION SELECT x, (x + 2) % 97 FROM n),
e AS (SELECT DISTINCT least(a, b) AS u, greatest(a, b) AS v
      FROM e0 WHERE a <> b)
SELECT CAST(count(*) AS BIGINT) AS n_triangles
FROM e e1
JOIN e e2 ON e2.u = e1.u AND e2.v > e1.v
JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v
"""


def q_value_percent_rank(sf_dir: str):
    """percent_rank per event_type (stages/windows.py::
    grouped_percent_rank): tie-sharing SQL rank semantics, one exact IEEE
    division — engine-independent doubles."""
    from ..stages.windows import grouped_percent_rank

    ev = read_table(sf_dir, "events",
                    columns=["event_id", "event_type", "value"])
    return grouped_percent_rank(ev, ["event_type"], "value")


QUERIES["value_percent_rank"] = q_value_percent_rank

ORACLE_SQL["value_percent_rank"] = """
SELECT event_id, event_type, value,
       percent_rank() OVER (PARTITION BY event_type ORDER BY value)
         AS pct_rank
FROM events
"""


def q_table_checksum(sf_dir: str):
    """Replica-comparison checksum (stages/validate.py::table_checksum):
    16 bucketed (n_rows, checksum) rows over customer — content equality
    without moving rows (pt-table-checksum shape)."""
    from ..stages.validate import table_checksum

    cust = read_table(sf_dir, "customer",
                      columns=["c_custkey", "c_name", "c_mktsegment"])
    return table_checksum(cust, ["c_custkey", "c_name", "c_mktsegment"])


QUERIES["table_checksum"] = q_table_checksum

_CK_DIGIT = "(strpos('0123456789abcdef', substr(sha, {i}, 1)) - 1)"
_CK_TERMS = " + ".join(
    f"{_CK_DIGIT.format(i=i + 2)} * {16 ** (6 - i)}" for i in range(7))
ORACLE_SQL["table_checksum"] = f"""
WITH r AS (
  SELECT sha256(CAST(c_custkey AS VARCHAR) || '|' || c_name || '|' ||
                c_mktsegment) AS sha
  FROM customer)
SELECT CAST({_CK_DIGIT.format(i=1)} % 16 AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n_rows,
       CAST(sum({_CK_TERMS}) AS BIGINT) AS checksum
FROM r GROUP BY 1
"""


def q_approx_top_terms(sf_dir: str):
    """Count-Min heavy hitters (stages/text.py::approx_top_terms): bounded
    memory regardless of vocabulary size; approximate => rows-only (the
    tolerance vs the exact twin is pytest-asserted)."""
    from ..stages.text import approx_top_terms

    docs = read_table(sf_dir, "documents", columns=["text"])
    return approx_top_terms(docs, k=20)


QUERIES["approx_top_terms"] = q_approx_top_terms


def q_re_sync(sf_dir: str):
    """DB_RE_SYNC process (EtlProcessType.java:9): a destination lake holds
    a STALE snapshot of orders; the re-sync runs the new+changed records
    detectors over the monitored table (created=o_orderdate, changed=
    o_orderdate + orderkey%30 days) against the sync start date and pushes
    every detected record back through the unique-key merge. Untouched
    keys keep the stale payload; detected keys carry the fresh one."""
    from .config import run_config
    from .replay import quick_merge, read_lake

    orders = read_table(sf_dir, "orders",
                        columns=["o_orderkey", "o_orderdate",
                                 "o_orderpriority"])

    def derive(t: pa.Table) -> pa.Table:
        days = pc.subtract(t["o_orderkey"],
                           pc.multiply(pc.divide(t["o_orderkey"], 30), 30))
        delta = pc.multiply(pc.cast(days, pa.int64()),
                            pa.scalar(86_400_000_000, pa.int64()))
        return pa.table({
            "o_orderkey": t["o_orderkey"],
            "created": t["o_orderdate"],
            "changed": pc.add(t["o_orderdate"],
                              pc.cast(delta, pa.duration("us"))),
            "o_orderpriority": t["o_orderpriority"]})

    mon = orders.map_batches(derive, batch_format="pyarrow")
    mon_dir = _scratch("resync_mon")
    mon.write_parquet(os.path.join(mon_dir, "orders_mon.parquet"))

    lake = _scratch("resync_lake")
    # stale pre-seed at lsn 0: every key present, priority overwritten
    from .config import _events_defaults
    stale = _events_defaults(mon.map_batches(
        lambda t: t.set_column(
            t.schema.get_field_index("o_orderpriority"), "o_orderpriority",
            pa.array(["STALE"] * len(t))),
        batch_format="pyarrow"), lsn=0)
    quick_merge(stale, lake, key_cols=("o_orderkey",),
                unique_keys=[["o_orderkey"]], num_buckets=16).materialize()

    run_config({"processType": "DB_RE_SYNC", "etlConfiguration": [{
        "srcConf": {"sfDir": mon_dir, "tableName": "orders_mon",
                    "createdColumn": "created", "changedColumn": "changed",
                    "since": "1996-01-01"},
        "dstConf": [{"lakeRoot": lake, "keyCols": ["o_orderkey"],
                     "uniqueKeys": [["o_orderkey"]], "numBuckets": 16,
                     "lsn": 1}],
    }]})
    return read_lake(lake).select_columns(["o_orderkey", "o_orderpriority"])


QUERIES["re_sync"] = q_re_sync

ORACLE_SQL["re_sync"] = """
WITH mon AS (
  SELECT o_orderkey, o_orderdate AS created,
         o_orderdate + to_microseconds((o_orderkey % 30) * 86400000000)
           AS changed,
         o_orderpriority
  FROM orders),
det AS (
  SELECT o_orderkey FROM mon
  WHERE created >= TIMESTAMP '1996-01-01'
     OR (created < TIMESTAMP '1996-01-01'
         AND changed >= TIMESTAMP '1996-01-01'))
SELECT m.o_orderkey,
       CASE WHEN d.o_orderkey IS NULL THEN 'STALE'
            ELSE m.o_orderpriority END AS o_orderpriority
FROM mon m LEFT JOIN det d ON d.o_orderkey = m.o_orderkey
"""


def q_multi_origin_merge(sf_dir: str):
    """Multi-origin sourceFolders union (EtlOperationConfig.java:482-488:
    one controller clone per origin folder): two sites export overlapping
    customer-key slices; LOAD tags every staged row with its
    recordOriginLocationCode (EtlStageRecordVO.java:36-67) and
    DB_MERGE_FROM_JSON keys on (origin, custkey) — overlapping local PKs
    from different sites stay distinct records."""
    from .config import run_config
    from .export import export_files
    from .replay import read_lake

    cust = read_table(sf_dir, "customer", columns=["c_custkey", "c_name"])

    def site(keep_mod):
        def fn(t: pa.Table) -> pa.Table:
            m3 = pc.subtract(t["c_custkey"],
                             pc.multiply(pc.divide(t["c_custkey"], 3), 3))
            mask = pc.equal(m3, keep_mod[0])
            for k in keep_mod[1:]:
                mask = pc.or_(mask, pc.equal(m3, k))
            return t.filter(mask)
        return fn

    dir_a = _scratch("mo_siteA")
    dir_b = _scratch("mo_siteB")
    export_files(cust.map_batches(site([0, 1]), batch_format="pyarrow"),
                 dir_a, fmt="json")
    export_files(cust.map_batches(site([1, 2]), batch_format="pyarrow"),
                 dir_b, fmt="json")

    stage = _scratch("mo_stage")
    lake = _scratch("mo_lake")
    run_config({"processType": "DB_QUICK_LOAD", "etlConfiguration": [{
        "srcConf": {"sourceFolders": [
            {"appOriginCode": "siteA", "importDir": dir_a},
            {"appOriginCode": "siteB", "importDir": dir_b}],
            "format": "json"},
        "dstConf": [{"stageDir": stage}],
    }]})
    run_config({"processType": "DB_MERGE_FROM_JSON", "etlConfiguration": [{
        "srcConf": {"stageDir": stage},
        "dstConf": [{"lakeRoot": lake,
                     "keyCols": ["recordOriginLocationCode", "c_custkey"],
                     "uniqueKeys": [["recordOriginLocationCode",
                                     "c_custkey"]],
                     "numBuckets": 16}],
    }]})
    return read_lake(lake).select_columns(
        ["recordOriginLocationCode", "c_custkey", "c_name"])


QUERIES["multi_origin_merge"] = q_multi_origin_merge

ORACLE_SQL["multi_origin_merge"] = """
SELECT 'siteA' AS recordOriginLocationCode, c_custkey, c_name
FROM customer WHERE c_custkey % 3 IN (0, 1)
UNION ALL
SELECT 'siteB', c_custkey, c_name
FROM customer WHERE c_custkey % 3 IN (1, 2)
"""


def _png_stat_frame(feats):
    """(media_id, width, height, mean_r) projection for the PNG oracle
    rows: constant-color images make the mean an exact integer; payload
    length is zlib-dependent and deliberately NOT part of the contract."""
    def out(df: pd.DataFrame) -> pd.DataFrame:
        f = (np.stack(df["feature"].to_numpy())
             if len(df) else np.zeros((0, 8)))
        return pd.DataFrame({
            "media_id": df["media_id"].to_numpy(),
            "width": f[:, 0].astype("int64"),
            "height": f[:, 1].astype("int64"),
            "mean_r": f[:, 2].astype("int64"),
        })
    return feats.map_batches(out, batch_format="pandas")


def q_media_png_features(sf_dir: str):
    """REAL PNG decode (stages/multimodal.py::decode_png — pure-stdlib
    zlib + scanline unfilters, DecodeStage(fake=False)): constant-color
    PNGs derived from doc_id, the scanline filter rotating over all five
    types by id, so every unfilter path runs under the oracle gate."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.png_media_from_ids(docs)
    return _png_stat_frame(multimodal.decode_features(media))


def q_media_png_resize(sf_dir: str):
    """PNG decode -> nearest resize -> PNG re-encode -> decode again
    (ResizeStage on the stdlib codec): dims become 8x8, the constant mean
    survives exactly."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.png_media_from_ids(docs)
    resized = multimodal.resize_images(media, 8, 8)
    return _png_stat_frame(multimodal.decode_features(resized))


QUERIES["media_png_features"] = q_media_png_features
QUERIES["media_png_resize"] = q_media_png_resize

ORACLE_SQL["media_png_features"] = """
SELECT doc_id AS media_id,
       CAST(16 + (doc_id % 4) * 8 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(doc_id % 256 AS BIGINT) AS mean_r
FROM documents
"""

ORACLE_SQL["media_png_resize"] = """
SELECT doc_id AS media_id,
       CAST(8 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(doc_id % 256 AS BIGINT) AS mean_r
FROM documents
"""


def q_media_jpeg_features(sf_dir: str):
    """REAL baseline-JPEG decode (stages/jpeg.py — pure-stdlib Huffman +
    dequant + matrix IDCT + YCbCr, DecodeStage(fake=False)): constant-gray
    JPEGs derived from doc_id at quality=100 (the exact-roundtrip regime),
    subsampling and restart intervals rotating by id so the 4:4:4, 4:2:0
    and RSTn decoder paths all run under the oracle gate."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.jpeg_media_from_ids(docs)
    return _png_stat_frame(multimodal.decode_features(media))


def q_media_jpeg_resize(sf_dir: str):
    """JPEG decode -> nearest resize -> JPEG re-encode -> decode again
    (ResizeStage on the stdlib codec): dims become 8x8, the constant gray
    mean survives exactly (single DC-only MCU after resize)."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.jpeg_media_from_ids(docs)
    resized = multimodal.resize_images(media, 8, 8)
    return _png_stat_frame(multimodal.decode_features(resized))


def q_media_jpeg_progressive(sf_dir: str):
    """PROGRESSIVE (SOF2) JPEG decode under the gate: the same constant-
    gray quality-100 test vectors as media_jpeg_features but encoded
    with the multi-scan progressive script (successive-approximation DC,
    spectral-selection AC, refinement scans with EOB runs), so every
    SOF2 decoder path runs against the exact SQL oracle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.jpeg_media_from_ids(docs, progressive=True)
    return _png_stat_frame(multimodal.decode_features(media))


QUERIES["media_jpeg_features"] = q_media_jpeg_features
QUERIES["media_jpeg_resize"] = q_media_jpeg_resize
QUERIES["media_jpeg_progressive"] = q_media_jpeg_progressive

ORACLE_SQL["media_jpeg_features"] = """
SELECT doc_id AS media_id,
       CAST(16 + (doc_id % 4) * 8 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(doc_id % 256 AS BIGINT) AS mean_r
FROM documents
"""

ORACLE_SQL["media_jpeg_resize"] = """
SELECT doc_id AS media_id,
       CAST(8 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(doc_id % 256 AS BIGINT) AS mean_r
FROM documents
"""

ORACLE_SQL["media_jpeg_progressive"] = """
SELECT doc_id AS media_id,
       CAST(16 + (doc_id % 4) * 8 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(doc_id % 256 AS BIGINT) AS mean_r
FROM documents
"""


def q_surrogate_ids_dense(sf_dir: str):
    """Deterministic surrogate-id allocation (ST2, the oracle-checkable
    twin of surrogate_ids): contiguous per-bucket ranges in key order —
    the reference's IdGeneratorManager block reservation
    (IdGeneratorManager.java:15-90) pinned to a reproducible processor
    order, so id = row_number() OVER (ORDER BY c_custkey)."""
    from ..stages.idgen import assign_surrogate_ids_ordered

    cust = read_table(sf_dir, "customer", columns=["c_custkey"])
    return assign_surrogate_ids_ordered(cust, ["c_custkey"])


QUERIES["surrogate_ids_dense"] = q_surrogate_ids_dense

ORACLE_SQL["surrogate_ids_dense"] = """
SELECT c_custkey,
       CAST(row_number() OVER (ORDER BY c_custkey) AS BIGINT)
         AS surrogate_id
FROM customer
"""

ORACLE_SQL["ann_topk"] = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qe
           FROM embeddings WHERE vec_id < 8),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS ce
      FROM embeddings WHERE vec_id >= 8),
s AS (SELECT q.query_id, c.vec_id,
             list_cosine_similarity(c.ce, q.qe) AS cos
      FROM q CROSS JOIN c),
r AS (SELECT query_id, vec_id,
             row_number() OVER (PARTITION BY query_id
                                ORDER BY cos DESC, vec_id ASC) AS rnk
      FROM s)
SELECT query_id, vec_id, CAST(rnk AS BIGINT) AS rank
FROM r WHERE rnk <= 5
"""


def q_quality_logit(sf_dir: str):
    """Batched model inference (stages/inference.py::score_linear): a
    linear quality scorer with dyadic-rational weights over integer text
    features — weights broadcast once, actor-pool scoring, and the raw
    margin is bitwise-reproducible across engines (fixed-order IEEE
    accumulation), so a SQL oracle checks the 'model' end to end."""
    from ..stages.inference import score_linear

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=16)
    scored = score_linear(
        docs,
        weights=[0.015625, 0.25, -0.125, 0.0625, -0.5],  # 2^-6, 2^-2, ...
        bias=0.5, out_col="score")
    return scored.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "score": t["score"]}),
        batch_format="pyarrow")


QUERIES["quality_logit"] = q_quality_logit

ORACLE_SQL["quality_logit"] = """
WITH f AS (
  SELECT doc_id,
         CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
         CAST(length(coalesce(text, ''))
              - length(replace(coalesce(text, ''), ' ', '')) AS BIGINT)
           AS n_spaces,
         CAST(len(regexp_extract_all(coalesce(text, ''), '[0-9]'))
           AS BIGINT) AS n_digits,
         CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Z]'))
           AS BIGINT) AS n_upper,
         CAST(len(regexp_extract_all(coalesce(text, ''), '[.,!?]'))
           AS BIGINT) AS n_punct
  FROM documents)
SELECT doc_id,
       ((((0.5 + n_chars * 0.015625) + n_spaces * 0.25)
          + n_digits * -0.125) + n_upper * 0.0625) + n_punct * -0.5
         AS score
FROM f
"""


def q_span_corrupt(sf_dir: str):
    """Denoising-LM span corruption (stages/text.py::span_corrupt):
    sha-keyed aligned 3-word spans, ~1/6 masked; exact SQL oracle via the
    unnest-range + list_slice + string_agg(ORDER BY) shape."""
    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                      override_num_blocks=16)
    return text_stages.span_corrupt(docs)


QUERIES["span_corrupt"] = q_span_corrupt

ORACLE_SQL["span_corrupt"] = """
WITH w AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS ws
  FROM documents),
sp AS (
  SELECT doc_id, ws,
         unnest(range(0, CAST(ceil(len(ws) / 3.0) AS BIGINT))) AS s
  FROM w),
piece AS (
  SELECT doc_id, s,
         substr(sha256(CAST(doc_id AS VARCHAR) || ':'
                       || CAST(s AS VARCHAR)), 1, 4) < '2aaa' AS m,
         array_to_string(list_slice(ws, s * 3 + 1, s * 3 + 3), ' ') AS kept
  FROM sp),
agg AS (
  SELECT doc_id,
         string_agg(CASE WHEN m THEN '<X>' ELSE kept END, ' '
                    ORDER BY s) AS text,
         CAST(sum(CASE WHEN m THEN 1 ELSE 0 END) AS BIGINT) AS n_masked
  FROM piece GROUP BY doc_id)
SELECT a.doc_id, a.text, a.n_masked,
       CAST(len(w.ws) AS BIGINT) AS n_words
FROM agg a JOIN w ON w.doc_id = a.doc_id
"""


def q_scored_corpus_pack(sf_dir: str):
    """Model-scored corpus prep composite: linear quality scorer (broadcast
    weights, actor pool) -> threshold filter -> sequence packing over the
    survivors (distributed prefix sum). Every stage exact: the dyadic
    margin makes the >= 19.0 cut engine-identical, and pack offsets are a
    pure function of the prefix sum of survivor token counts."""
    from ..functions import text as T
    from ..stages.inference import score_linear
    from ..stages.packing import pack_sequences

    docs = read_table(sf_dir, "documents", columns=["doc_id", "text"])
    scored = score_linear(
        docs, weights=[0.015625, 0.25, -0.125, 0.0625, -0.5],
        bias=0.5, out_col="score")
    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["score"], pa.scalar(19.0))),
        batch_format="pyarrow")

    def toks(df: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame({
            "doc_id": df["doc_id"].to_numpy(),
            "score": df["score"].to_numpy(),
            "n_tokens": T.token_count(df["text"]).to_numpy(),
        })

    # materialize the 3-narrow-column survivor projection: the packing
    # scan re-executes its upstream once per pass, and here the upstream
    # is actor-pool model inference — one scoring run, not three (the
    # pinned slice is survivors-only metadata, not the corpus)
    slim = kept.map_batches(toks, batch_format="pandas").materialize()
    packed = pack_sequences(slim, order_cols=["doc_id"],
                            token_col="n_tokens", capacity=1024)
    return packed.map_batches(
        lambda df: df[["doc_id", "score", "n_tokens",
                       "pack_id", "pack_offset"]],
        batch_format="pandas")


QUERIES["scored_corpus_pack"] = q_scored_corpus_pack

ORACLE_SQL["scored_corpus_pack"] = """
WITH f AS (
  SELECT doc_id, text,
         CAST(length(coalesce(text, '')) AS BIGINT) AS n_chars,
         CAST(length(coalesce(text, ''))
              - length(replace(coalesce(text, ''), ' ', '')) AS BIGINT)
           AS n_spaces,
         CAST(len(regexp_extract_all(coalesce(text, ''), '[0-9]'))
           AS BIGINT) AS n_digits,
         CAST(len(regexp_extract_all(coalesce(text, ''), '[A-Z]'))
           AS BIGINT) AS n_upper,
         CAST(len(regexp_extract_all(coalesce(text, ''), '[.,!?]'))
           AS BIGINT) AS n_punct
  FROM documents),
scored AS (
  SELECT doc_id, text,
         ((((0.5 + n_chars * 0.015625) + n_spaces * 0.25)
            + n_digits * -0.125) + n_upper * 0.0625) + n_punct * -0.5
           AS score
  FROM f),
kept AS (
  SELECT doc_id, score,
         CAST(CASE WHEN trim(text) = '' THEN 0
              ELSE len(regexp_split_to_array(trim(text), '\\s+')) END
              AS BIGINT) AS n_tokens
  FROM scored WHERE score >= 19.0),
cum AS (
  SELECT doc_id, score, n_tokens,
         SUM(n_tokens) OVER (ORDER BY doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING
                             AND CURRENT ROW) - n_tokens AS start
  FROM kept)
SELECT doc_id, score, n_tokens,
       CAST(start // 1024 AS BIGINT) AS pack_id,
       CAST(start % 1024 AS BIGINT) AS pack_offset
FROM cum
"""


def q_generic_process(sf_dir: str):
    """GENERIC_PROCESS (the reference's problems-solver process,
    ``conf/types/EtlProcessType.java:17``): every operation must supply a
    custom GenericProcessor (``conf/EtlOperationConfig.java:613-618``) —
    here the packaged ``solve_negative_balance`` processor classifies each
    customer's account-balance problem and emits the clamp-repaired value.
    Exercises the full dispatch: config -> GENERIC_PROCESS runner ->
    processor hook -> parquet sink -> re-read."""
    from .config import run_config

    out_dir = _scratch("generic_process_out")
    outputs = run_config({
        "processType": "GENERIC_PROCESS",
        "etlConfiguration": [{
            "srcConf": {"tableName": "customer", "sfDir": sf_dir,
                        "columns": ["c_custkey", "c_acctbal"]},
            "processor": "openmrs_module_epts_etl_ray.functions."
                         "processors:solve_negative_balance",
            "dstConf": [{"tableName": "customer_problems",
                         "outDir": out_dir}],
        }],
    })
    return rd.read_parquet(outputs["customer_problems"],
                           file_extensions=["parquet"])


QUERIES["generic_process"] = q_generic_process

ORACLE_SQL["generic_process"] = """
SELECT c_custkey,
       CASE WHEN c_acctbal < 0 THEN 'negative_balance' ELSE 'ok' END
         AS problem,
       CASE WHEN c_acctbal < 0 THEN 0.0 ELSE c_acctbal END
         AS repaired_acctbal
FROM customer
"""


# --- round-5 exact oracles for the near-dup family (VERDICT r4 #4) --------

# shared shingle CTE prefix (the jaccard_pairs machinery, generalized to
# ALL pairs via an inverted shingle-index join; jaccard >= 0.5 is decided
# in EXACT integer math 2i >= u, equivalent to the kernel's float test
# because |i/u - 0.5| >= 1/(2u) whenever 2i != u)
_JACCARD_PAIRS_SQL = """
t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
  FROM documents),
tok AS (
  SELECT doc_id, unnest(w) AS word,
         unnest(range(1, len(w) + 1)) AS pos
  FROM t),
tri AS (
  SELECT a.doc_id, a.word || ' ' || b.word || ' ' || c.word AS sh
  FROM tok a
  JOIN tok b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  JOIN tok c ON c.doc_id = a.doc_id AND c.pos = a.pos + 2),
shingle AS (
  SELECT DISTINCT doc_id, sh FROM tri
  UNION
  SELECT doc_id, array_to_string(w, ' ') AS sh FROM t
  WHERE len(w) > 0 AND len(w) < 3),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM shingle GROUP BY doc_id),
inter AS (
  SELECT s1.doc_id AS id_a, s2.doc_id AS id_b, COUNT(*) AS i
  FROM shingle s1
  JOIN shingle s2 ON s2.sh = s1.sh AND s2.doc_id > s1.doc_id
  GROUP BY 1, 2),
jpairs AS (
  SELECT i.id_a, i.id_b, i.i * 1.0 / (na.n + nb.n - i.i) AS jaccard
  FROM inter i
  JOIN sizes na ON na.doc_id = i.id_a
  JOIN sizes nb ON nb.doc_id = i.id_b
  WHERE i.i * 2 >= na.n + nb.n - i.i)
"""

ORACLE_SQL["minhash_near_dups"] = (
    "WITH " + _JACCARD_PAIRS_SQL +
    "SELECT id_a, id_b, jaccard FROM jpairs")

ORACLE_SQL["near_dup_clusters"] = (
    "WITH RECURSIVE " + _JACCARD_PAIRS_SQL + """,
und AS (SELECT id_a AS a, id_b AS b FROM jpairs
        UNION SELECT id_b, id_a FROM jpairs),
v AS (SELECT DISTINCT a AS id FROM und),
reach(id, r) AS (
  SELECT id, id FROM v
  UNION
  SELECT u.a, reach.r FROM und u JOIN reach ON reach.id = u.b)
SELECT id AS doc_id, MIN(r) AS canonical_id FROM reach GROUP BY id
""")

ORACLE_SQL["simhash_near_dups"] = """
WITH t AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '\\s+'), x -> x <> '') AS w
  FROM documents),
tok AS (SELECT doc_id, unnest(w) AS word FROM t),
wh AS (
  SELECT doc_id,
         CAST(concat('0x', substr(sha256(word), 1, 16)) AS UBIGINT) AS h
  FROM tok),
bits AS (
  SELECT doc_id, j,
         SUM(CASE WHEN (h >> CAST(j AS UBIGINT)) & 1 = 1
                  THEN 1 ELSE 0 END) AS ones,
         COUNT(*) AS n
  FROM wh CROSS JOIN range(64) r(j)
  GROUP BY doc_id, j),
sh AS (
  -- bit_or, NOT SUM: DuckDB's SUM over UHUGEINT promotes to DOUBLE and
  -- rounds away the low ~11 bits of a 64-bit value (measured)
  SELECT doc_id,
         bit_or(CASE WHEN 2 * ones > n
                     THEN CAST((CAST(1 AS UHUGEINT) << CAST(j AS UHUGEINT))
                               AS UBIGINT)
                     ELSE CAST(0 AS UBIGINT) END) AS sh
  FROM bits GROUP BY doc_id)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       CAST(bit_count(xor(a.sh, b.sh)) AS BIGINT) AS hamming
FROM sh a JOIN sh b ON b.doc_id > a.doc_id
WHERE bit_count(xor(a.sh, b.sh)) <= 3
"""

ORACLE_SQL["embedding_near_dups"] = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b
FROM embeddings a JOIN embeddings b ON b.vec_id > a.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.5
"""


def q_media_avi_frames(sf_dir: str):
    """REAL video-container decode (stages/multimodal.py::decode_avi_mjpeg
    — RIFF walk + per-frame baseline JPEG via stages/jpeg.py): MJPEG AVIs
    of constant-gray quality-100 frames (the exact-roundtrip regime),
    every-2nd-frame sampling re-encodes kept frames as PPM images whose
    decode stats are closed forms of (id, frame index). The last video
    stub is gone; only codec-bound streams (H.264 etc.) would still
    raise."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    videos = multimodal.avi_videos_from_ids(docs)
    frames = multimodal.sample_frames(videos, every=2)
    return _media_stat_frame(multimodal.decode_features(frames))


QUERIES["media_avi_frames"] = q_media_avi_frames

ORACLE_SQL["media_avi_frames"] = """
WITH v AS (SELECT doc_id, doc_id % 4 + 2 AS nf FROM documents
           WHERE doc_id % 10 = 0),
f AS (SELECT doc_id, unnest(range(0, nf, 2)) AS i FROM v)
SELECT doc_id * 1000000 + i AS media_id,
       'image' AS kind,
       CAST(13 + 16 * 16 * 3 AS BIGINT) AS payload_bytes,
       CAST((doc_id + i) % 256 AS DOUBLE) AS stat
FROM f
"""


def q_media_gif_features(sf_dir: str):
    """REAL GIF decode (stages/gif.py — pure-stdlib LZW + palettes,
    DecodeStage(fake=False)): constant-color GIF stills derived from
    doc_id with interlace, local-color-table and superset-palette
    (non-zero index) paths rotating by id, so LZW, de-interlace, LCT and
    index mapping all run under the exact SQL oracle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.gif_media_from_ids(docs)
    return _png_stat_frame(multimodal.decode_features(media))


def q_media_gif_resize(sf_dir: str):
    """GIF decode -> nearest resize -> GIF re-encode -> decode again
    (ResizeStage on the stdlib LZW codec): dims become 8x8, the constant
    mean survives exactly."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.gif_media_from_ids(docs)
    resized = multimodal.resize_images(media, 8, 8)
    return _png_stat_frame(multimodal.decode_features(resized))


def q_media_gif_frames(sf_dir: str):
    """Animated-GIF frame sampling (stages/gif.py animation decode: GCE
    delay/disposal parsing + draw-over composition): every-2nd-frame
    sampling re-encodes kept frames as PPM images whose decode stats are
    closed forms of (id, frame index) — the GIF counterpart of
    media_avi_frames."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    videos = multimodal.gif_videos_from_ids(docs)
    frames = multimodal.sample_frames(videos, every=2)
    return _media_stat_frame(multimodal.decode_features(frames))


QUERIES["media_gif_features"] = q_media_gif_features
QUERIES["media_gif_resize"] = q_media_gif_resize
QUERIES["media_gif_frames"] = q_media_gif_frames

ORACLE_SQL["media_gif_features"] = """
SELECT doc_id AS media_id,
       CAST(16 + (doc_id % 4) * 8 AS BIGINT) AS width,
       CAST(16 AS BIGINT) AS height,
       CAST(doc_id % 256 AS BIGINT) AS mean_r
FROM documents
"""

ORACLE_SQL["media_gif_resize"] = """
SELECT doc_id AS media_id,
       CAST(8 AS BIGINT) AS width,
       CAST(8 AS BIGINT) AS height,
       CAST(doc_id % 256 AS BIGINT) AS mean_r
FROM documents
"""

ORACLE_SQL["media_gif_frames"] = """
WITH v AS (SELECT doc_id, doc_id % 4 + 2 AS nf FROM documents
           WHERE doc_id % 10 = 0),
f AS (SELECT doc_id, unnest(range(0, nf, 2)) AS i FROM v)
SELECT doc_id * 1000000 + i AS media_id,
       'image' AS kind,
       CAST(13 + 16 * 16 * 3 AS BIGINT) AS payload_bytes,
       CAST((doc_id + i) % 256 AS DOUBLE) AS stat
FROM f
"""


# ---------------------------------------------------------------------------
# Audio windowing + HTML boilerplate removal (round 5 additions)
# ---------------------------------------------------------------------------

def q_audio_windows(sf_dir: str):
    """Actor-pool audio windowing (stages/multimodal.py::AudioWindowStage):
    decode the deterministic constant-valued WAV clips from media_from_ids
    (id % 3 == 0 -> n = 400 + (id%100)*8 samples all equal to (id%100)*10)
    and cut each into 256-sample windows with per-window count / integer
    peak / RMS. Constant clips make the RMS IEEE-exact (v^2 is a perfect
    square, sqrt correctly rounded), so the whole decode->window->stat
    path carries an exact SQL oracle."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.media_from_ids(docs)
    return multimodal.audio_windows(media, window_samples=256)


QUERIES["audio_windows"] = q_audio_windows

ORACLE_SQL["audio_windows"] = """
WITH a AS (
  SELECT doc_id,
         400 + (doc_id % 100) * 8 AS n,
         (doc_id % 100) * 10 AS v
  FROM documents WHERE doc_id % 3 = 0),
w AS (
  SELECT doc_id, n, v,
         unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS j
  FROM a)
SELECT doc_id * 1000000 + j AS window_id,
       CAST(least(256, n - j * 256) AS BIGINT) AS n_samples,
       CAST(v AS BIGINT) AS peak,
       CAST(v AS DOUBLE) AS rms,
       CAST(8000 AS BIGINT) AS rate
FROM w
"""


_HTML_PREFIX = ('<html><head><script type="text/javascript">var doc = ')
_HTML_MID = (';</script><style>p { color: red }</style></head><body><h1>Doc ')
_HTML_BODY = ('</h1><!-- hidden\nnote --><p class="main">\n')
_HTML_SUFFIX = ('\n</p><div>A &amp;&amp; B &lt;ok&gt; &quot;q&#39;s&quot;'
                '&nbsp;end&amp;lt;</div></body></html>')


def q_strip_html(sf_dir: str):
    """Boilerplate removal (stages/text.py::strip_html — the
    trafilatura/jusText-shaped extraction step of a web-crawl corpus
    pipeline): wrap each document's text in a deterministic HTML shell
    (script + style + comment + attributes + the five XML entities,
    including the &amp;lt; double-escape trap), then strip markup. Both
    sides run RE2 (Arrow and DuckDB), so the regex chain is restated
    byte-for-byte in SQL."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    override_num_blocks=16)

    def wrap(t: pa.Table) -> pa.Table:
        i = pc.cast(t["doc_id"], pa.string())
        html = pc.binary_join_element_wise(
            _HTML_PREFIX, i, _HTML_MID, i, _HTML_BODY,
            pc.fill_null(t["text"], ""), _HTML_SUFFIX, "")
        return pa.table({"doc_id": t["doc_id"], "html": html})

    wrapped = ds.map_batches(wrap, batch_format="pyarrow")
    return text_stages.strip_html(wrapped, "html", out_col="clean_text")


QUERIES["strip_html"] = q_strip_html

ORACLE_SQL["strip_html"] = """
WITH h AS (
  SELECT doc_id,
         '<html><head><script type="text/javascript">var doc = '
         || doc_id
         || ';</script><style>p { color: red }</style></head><body><h1>Doc '
         || doc_id || '</h1><!-- hidden' || chr(10)
         || 'note --><p class="main">' || chr(10)
         || coalesce(text, '') || chr(10)
         || '</p><div>A &amp;&amp; B &lt;ok&gt; &quot;q&#39;s&quot;'
         || '&nbsp;end&amp;lt;</div></body></html>' AS html
  FROM documents),
s AS (
  SELECT doc_id,
    regexp_replace(
      regexp_replace(
        regexp_replace(
          regexp_replace(
            regexp_replace(
              regexp_replace(html,
                '(?is)<script\\b[^>]*>.*?</script>', ' ', 'g'),
              '(?is)<style\\b[^>]*>.*?</style>', ' ', 'g'),
            '(?is)<script\\b[^>]*>.*$', ' ', 'g'),
          '(?is)<style\\b[^>]*>.*$', ' ', 'g'),
        '(?s)<!--.*?-->', ' ', 'g'),
      '<[^>]*>', ' ', 'g') AS t
  FROM h),
e AS (
  SELECT doc_id,
         replace(replace(replace(replace(replace(replace(
           t, '&lt;', '<'), '&gt;', '>'), '&quot;', '"'),
           '&#39;', ''''), '&nbsp;', ' '), '&amp;', '&') AS t
  FROM s)
SELECT doc_id,
       trim(regexp_replace(t, '\\s+', ' ', 'g'), ' ') AS clean_text
FROM e
"""


def q_pii_scrub(sf_dir: str):
    """Pattern-class PII scrubbing (stages/text.py::pii_scrub): append a
    deterministic contact line (email + separator phone + IPv4, all
    closed forms of doc_id) to each document's text, then mask the three
    classes in PII_PATTERNS order with per-class counts. The oracle
    restates the same synthesis and the same sequential
    regexp_replace/regexp_extract_all chain — RE2 on both sides."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    override_num_blocks=16)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype("int64")
        txt = (df["text"].fillna("")
               + " Contact user" + i.astype(str)
               + "@mail" + (i % 5).astype(str)
               + ".org or 555-01" + (i % 10).astype(str)
               + "-" + (i % 10000).astype(str).str.zfill(4)
               + " from 10." + (i % 256).astype(str)
               + ".0." + ((i * 7) % 256).astype(str) + " now.")
        return pd.DataFrame({"doc_id": i, "text": txt})

    synthed = ds.map_batches(synth, batch_format="pandas")
    out = text_stages.pii_scrub(synthed, "text", out_col="clean_text")
    return out.select_columns(["doc_id", "clean_text", "n_email",
                               "n_phone", "n_ipv4"])


QUERIES["pii_scrub"] = q_pii_scrub

ORACLE_SQL["pii_scrub"] = """
WITH raw AS (
  SELECT doc_id,
         coalesce(text, '') || ' Contact user' || doc_id || '@mail'
         || (doc_id % 5) || '.org or 555-01' || (doc_id % 10) || '-'
         || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
         || ' from 10.' || (doc_id % 256) || '.0.'
         || ((doc_id * 7) % 256) || ' now.' AS t0
  FROM documents),
s1 AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(
      t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
      AS n_email,
    regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                   '[EMAIL]', 'g') AS t1
  FROM raw),
s2 AS (
  SELECT doc_id, n_email,
    CAST(len(regexp_extract_all(
      t1, '\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b')) AS BIGINT) AS n_phone,
    regexp_replace(t1, '\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b',
                   '[PHONE]', 'g') AS t2
  FROM s1)
SELECT doc_id,
       regexp_replace(t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                      '[IP]', 'g') AS clean_text,
       n_email, n_phone,
       CAST(len(regexp_extract_all(
         t2, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
         AS n_ipv4
FROM s2
"""


def q_url_normalize(sf_dir: str):
    """URL canonicalization (stages/text.py::normalize_urls): messy URLs
    synthesized as closed forms of doc_id — mixed-case scheme/host,
    explicit default ports rotating by id, utm_* params in leading /
    middle / trailing positions, fragments — normalized to the crawl
    dedup key plus host and registrable-domain columns. Every rule (RE2
    both sides) is restated in SQL."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"],
                    override_num_blocks=16)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype("int64")
        m3 = (i % 3).astype(str)
        scheme = pd.Series(
            np.where(i % 2 == 0, "HTTPS://", "hTtp://"), index=i.index)
        port = pd.Series(
            np.select([i % 3 == 0, i % 3 == 1], [":443", ":80"], ""),
            index=i.index)
        query = pd.Series(np.select(
            [i % 4 == 0, i % 4 == 1, i % 4 == 2],
            ["?utm_source=feed&x=" + m3,
             "?x=" + m3 + "&utm_campaign=a&y=2",
             "?x=" + m3 + "&utm_id=9"], ""), index=i.index)
        frag = pd.Series(
            np.where(i % 5 == 0, "#Sec1", ""), index=i.index)
        url = (scheme + "WWW" + (i % 50).astype(str)
               + ".ExAmple" + (i % 7).astype(str) + ".CoM" + port
               + "/Path/" + i.astype(str) + query + frag)
        return pd.DataFrame({"doc_id": i, "url": url})

    synthed = ds.map_batches(synth, batch_format="pandas")
    out = text_stages.normalize_urls(synthed, "url")
    return out.select_columns(["doc_id", "url_norm", "host", "domain"])


QUERIES["url_normalize"] = q_url_normalize

ORACLE_SQL["url_normalize"] = """
WITH raw AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'hTtp://' END)
         || 'WWW' || (doc_id % 50) || '.ExAmple' || (doc_id % 7) || '.CoM'
         || (CASE doc_id % 3 WHEN 0 THEN ':443' WHEN 1 THEN ':80'
             ELSE '' END)
         || '/Path/' || doc_id
         || (CASE doc_id % 4
             WHEN 0 THEN '?utm_source=feed&x=' || (doc_id % 3)
             WHEN 1 THEN '?x=' || (doc_id % 3) || '&utm_campaign=a&y=2'
             WHEN 2 THEN '?x=' || (doc_id % 3) || '&utm_id=9'
             ELSE '' END)
         || (CASE WHEN doc_id % 5 = 0 THEN '#Sec1' ELSE '' END) AS u
  FROM documents),
nofrag AS (SELECT doc_id, regexp_replace(u, '#.*$', '') AS u FROM raw),
lowauth AS (
  SELECT doc_id, u,
    regexp_matches(u, '^[A-Za-z][A-Za-z0-9+.-]*://') AS has_auth,
    regexp_replace(
      regexp_replace(
        lower(regexp_extract(u, '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)', 1)),
        '^(http://.*):80$', '\\1'),
      '^(https://.*):443$', '\\1') AS auth,
    regexp_extract(u, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*(.*)$', 1) AS rest
  FROM nofrag),
norm AS (
  SELECT doc_id, auth,
    CASE WHEN has_auth THEN
      regexp_replace(
        regexp_replace(
          regexp_replace(auth || rest,
            '([?&])utm_[A-Za-z_]+=[^&#]*(?:&utm_[A-Za-z_]+=[^&#]*)*&',
            '\\1', 'g'),
          '[?&]utm_[A-Za-z_]+=[^&#]*(?:&utm_[A-Za-z_]+=[^&#]*)*$', ''),
        '^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)/$', '\\1')
    ELSE u END AS url_norm
  FROM lowauth),
hosts AS (
  SELECT doc_id, url_norm,
    regexp_replace(auth, '^[a-z][a-z0-9+.-]*://(?:[^@/]*@)?([^:/?#]*).*$',
                   '\\1') AS host
  FROM norm)
SELECT doc_id, url_norm, host,
       regexp_replace(host, '^.*?([^.]+\\.[^.]+)$', '\\1') AS domain
FROM hosts
"""


def q_crawl_prep(sf_dir: str):
    """Composite crawl-corpus preparation — the pipeline the web-corpus
    quartet exists for: messy URLs (case / default-port / utm / fragment
    noise, synthesized as closed forms of doc_id so ~12 raw URLs collapse
    onto each canonical key) -> normalize_urls -> exact URL dedup (min
    doc_id wins per url_norm) -> per-domain quota (first 5 docs per
    registrable domain). Both reductions ride grouped_topk's per-block
    partial combiner, so each exchange moves O(keys) rows, not the
    corpus."""
    from ..stages.windows import grouped_topk

    ds = read_table(sf_dir, "documents", columns=["doc_id"],
                    override_num_blocks=16)

    def synth(df: pd.DataFrame) -> pd.DataFrame:
        i = df["doc_id"].astype("int64")
        scheme = pd.Series(
            np.where(i % 2 == 0, "HTTPS://", "https://"), index=i.index)
        port = pd.Series(
            np.select([i % 3 == 0], [":443"], ""), index=i.index)
        query = pd.Series(np.select(
            [i % 4 == 0, i % 4 == 1, i % 4 == 3],
            ["?utm_source=f&x=1", "?x=1&utm_c=2",
             "?x=1&utm_a=1&utm_b=2"], "?x=1"), index=i.index)
        frag = pd.Series(
            np.where(i % 5 == 0, "#top", ""), index=i.index)
        url = (scheme + "WwW" + (i % 10).astype(str)
               + ".SiTe" + (i % 5).astype(str) + ".CoM" + port
               + "/p/" + (i % 40).astype(str) + query + frag)
        return pd.DataFrame({"doc_id": i, "url": url})

    urls = ds.map_batches(synth, batch_format="pandas")
    normed = text_stages.normalize_urls(urls, "url")
    normed = normed.select_columns(["doc_id", "url_norm", "domain"])
    per_url = grouped_topk(normed, ["url_norm"], "doc_id", 1,
                           descending=False)
    capped = grouped_topk(per_url, ["domain"], "doc_id", 5,
                          descending=False)
    return capped.map_batches(
        lambda df: df[["doc_id", "url_norm", "domain"]],
        batch_format="pandas")


QUERIES["crawl_prep"] = q_crawl_prep

ORACLE_SQL["crawl_prep"] = """
WITH raw AS (
  SELECT doc_id,
         (CASE WHEN doc_id % 2 = 0 THEN 'HTTPS://' ELSE 'https://' END)
         || 'WwW' || (doc_id % 10) || '.SiTe' || (doc_id % 5) || '.CoM'
         || (CASE WHEN doc_id % 3 = 0 THEN ':443' ELSE '' END)
         || '/p/' || (doc_id % 40)
         || (CASE doc_id % 4
             WHEN 0 THEN '?utm_source=f&x=1'
             WHEN 1 THEN '?x=1&utm_c=2'
             WHEN 3 THEN '?x=1&utm_a=1&utm_b=2'
             ELSE '?x=1' END)
         || (CASE WHEN doc_id % 5 = 0 THEN '#top' ELSE '' END) AS u
  FROM documents),
normed AS (
  SELECT doc_id,
         'https://www' || (doc_id % 10) || '.site' || (doc_id % 5)
         || '.com/p/' || (doc_id % 40) || '?x=1' AS url_norm,
         'site' || (doc_id % 5) || '.com' AS domain
  FROM raw),
per_url AS (
  SELECT doc_id, url_norm, domain,
         row_number() OVER (PARTITION BY url_norm ORDER BY doc_id) AS rn
  FROM normed)
SELECT doc_id, url_norm, domain
FROM per_url
WHERE rn = 1
QUALIFY row_number() OVER (PARTITION BY domain ORDER BY doc_id) <= 5
"""


def q_readability(sf_dir: str):
    """Flesch reading-ease (stages/text.py::readability): three RE2
    counts (non-space word runs, [.!?]+ sentence terminators, vowel-group
    syllable approximation) and the classic affine score, computed in an
    expression tree DuckDB reproduces bitwise from the same int64
    counts."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    override_num_blocks=16)
    return text_stages.readability(ds, "text")


QUERIES["readability"] = q_readability

ORACLE_SQL["readability"] = """
WITH c AS (
  SELECT doc_id,
    CAST(len(regexp_extract_all(coalesce(text, ''), '\\S+')) AS BIGINT)
      AS n_words,
    CAST(len(regexp_extract_all(coalesce(text, ''), '[.!?]+')) AS BIGINT)
      AS n_sentences,
    CAST(len(regexp_extract_all(coalesce(text, ''), '(?i)[aeiouy]+'))
      AS BIGINT) AS n_syllables
  FROM documents)
SELECT doc_id, n_words, n_sentences, n_syllables,
       206.835
       - 1.015 * (CAST(greatest(n_words, 1) AS DOUBLE)
                  / CAST(greatest(n_sentences, 1) AS DOUBLE))
       - 84.6 * (CAST(n_syllables AS DOUBLE)
                 / CAST(greatest(n_words, 1) AS DOUBLE)) AS flesch
FROM c
"""


def q_audio_resample_windows(sf_dir: str):
    """Composition: WAV decimation (stages/multimodal.py::ResampleStage,
    factor 2 — bit-exact every-2nd-sample keep, rate halved) feeding the
    windowing stage. media_from_ids clips have n = 400 + (id%100)*8
    samples (even), so the resampled clip has exactly n/2 samples of the
    same constant value at 4 kHz — the whole
    decode->decimate->re-encode->window->stat chain stays a closed form
    of doc_id."""
    docs = read_table(sf_dir, "documents", columns=["doc_id"],
                      override_num_blocks=16)
    media = multimodal.media_from_ids(docs)
    halved = multimodal.resample_audio(media, 2)
    return multimodal.audio_windows(halved, window_samples=256)


QUERIES["audio_resample_windows"] = q_audio_resample_windows

ORACLE_SQL["audio_resample_windows"] = """
WITH a AS (
  SELECT doc_id,
         (400 + (doc_id % 100) * 8) / 2 AS n,
         (doc_id % 100) * 10 AS v
  FROM documents WHERE doc_id % 3 = 0),
w AS (
  SELECT doc_id, n, v,
         unnest(range(0, CAST(ceil(n / 256.0) AS BIGINT))) AS j
  FROM a)
SELECT doc_id * 1000000 + j AS window_id,
       CAST(least(256, n - j * 256) AS BIGINT) AS n_samples,
       CAST(v AS BIGINT) AS peak,
       CAST(v AS DOUBLE) AS rms,
       CAST(4000 AS BIGINT) AS rate
FROM w
"""


def _synth_link_html(df: pd.DataFrame) -> pd.DataFrame:
    """Deterministic HTML shell with 0-3 absolute links, an optional
    relative link (even ids) and an href-less decoy anchor — closed
    forms of doc_id so the oracle restates the expected extraction."""
    i = df["doc_id"].astype("int64")
    s = i.astype(str)
    html = '<html><body><p>Doc ' + s + '</p><a name="top">skip me</a>'
    for j in range(3):
        piece = ('<a class="l" href="https://host'
                 + ((i * 7 + j) % 10).astype(str) + '.example/p/' + s
                 + '/' + str(j) + '">link ' + s + ' ' + str(j) + '</a>')
        html = html + piece.where((i % 4) > j, "")
    rel = ('<a href="/rel/' + s + '">rel ' + s + '</a>').where(i % 2 == 0, "")
    html = html + rel + '</body></html>'
    return pd.DataFrame({"doc_id": i, "html": html})


def q_link_extract(sf_dir: str):
    """Hyperlink extraction (stages/text.py::extract_links — the WAT/
    link-graph construction step of a web-crawl pipeline): wrap each
    document in a deterministic HTML shell carrying doc_id%4 absolute
    links, a relative link on even ids and one href-less decoy, then
    explode to one row per matched link with a 1-based per-document
    position. The oracle restates the synthesis in closed form."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"],
                    override_num_blocks=16)
    synthed = ds.map_batches(_synth_link_html, batch_format="pandas")
    return text_stages.extract_links(synthed, "html").sort(
        ["doc_id", "link_pos"])


QUERIES["link_extract"] = q_link_extract

ORACLE_SQL["link_extract"] = """
WITH a AS (
  SELECT doc_id, unnest(range(0, doc_id % 4)) AS j FROM documents),
abs_links AS (
  SELECT doc_id, CAST(j + 1 AS BIGINT) AS link_pos,
         'https://host' || ((doc_id * 7 + j) % 10) || '.example/p/'
           || doc_id || '/' || j AS href,
         'link ' || doc_id || ' ' || j AS anchor
  FROM a),
rel_links AS (
  SELECT doc_id, CAST(doc_id % 4 + 1 AS BIGINT) AS link_pos,
         '/rel/' || doc_id AS href, 'rel ' || doc_id AS anchor
  FROM documents WHERE doc_id % 2 = 0)
SELECT * FROM abs_links
UNION ALL
SELECT * FROM rel_links
ORDER BY doc_id, link_pos
"""


def q_link_domain_degrees(sf_dir: str):
    """Link-graph in-degrees (stages/text.py::domain_degrees): extract
    links from the same synthesized shells, keep absolute http(s) hrefs,
    count links and distinct source documents per target host. Relative
    links are synthesized and must be filtered; distinct-source counts
    are exact under any partitioning (one hash exchange on host over
    block-reduced (host, doc) triples)."""
    ds = read_table(sf_dir, "documents", columns=["doc_id"],
                    override_num_blocks=16)
    synthed = ds.map_batches(_synth_link_html, batch_format="pandas")
    links = text_stages.extract_links(synthed, "html")
    return text_stages.domain_degrees(links)


QUERIES["link_domain_degrees"] = q_link_domain_degrees

ORACLE_SQL["link_domain_degrees"] = """
WITH l AS (
  SELECT doc_id, 'host' || ((doc_id * 7 + j) % 10) || '.example' AS host
  FROM (SELECT doc_id, unnest(range(0, doc_id % 4)) AS j FROM documents))
SELECT host, CAST(COUNT(*) AS BIGINT) AS n_links,
       CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_src_docs
FROM l GROUP BY host ORDER BY host
"""


def q_collocations(sf_dir: str):
    """Adjacent-bigram collocations (stages/text.py::collocations): the
    100 most frequent token pairs corpus-wide with both members' unigram
    counts attached — the integer numerators of PMI scoring. Pair and
    unigram counts are pre-reduced per block; the oracle restates the
    same split-on-space tokenization with DuckDB list unnesting."""
    ds = read_table(sf_dir, "documents", columns=["text"],
                    override_num_blocks=16)
    return text_stages.collocations(ds, 100)


QUERIES["collocations"] = q_collocations

ORACLE_SQL["collocations"] = """
WITH toks AS (
  SELECT string_split(coalesce(text, ''), ' ') AS w FROM documents),
pr AS (
  SELECT w[j] AS left_term, w[j + 1] AS right_term
  FROM (SELECT w, unnest(range(1, len(w))) AS j FROM toks
        WHERE len(w) > 1)),
pair_counts AS (
  SELECT left_term, right_term, CAST(COUNT(*) AS BIGINT) AS n_pair
  FROM pr GROUP BY 1, 2),
top AS (
  SELECT * FROM pair_counts
  ORDER BY n_pair DESC, left_term, right_term LIMIT 100),
uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n_term
  FROM (SELECT unnest(w) AS term FROM toks WHERE len(w) > 0)
  GROUP BY 1)
SELECT t.left_term, t.right_term, t.n_pair,
       lu.n_term AS n_left, ru.n_term AS n_right
FROM top t
JOIN uni lu ON lu.term = t.left_term
JOIN uni ru ON ru.term = t.right_term
ORDER BY n_pair DESC, left_term, right_term
"""


def q_inverted_index(sf_dir: str):
    """Posting-list construction (stages/text.py::inverted_index):
    term -> (document frequency, comma-joined ascending doc ids) for
    terms in >= 3 distinct documents. One hash exchange on term; the
    per-block (doc, term) DISTINCT is globally exact because each
    document lives in one block."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    override_num_blocks=16)
    return text_stages.inverted_index(ds, min_df=3)


QUERIES["inverted_index"] = q_inverted_index

ORACLE_SQL["inverted_index"] = """
WITH pairs AS (
  SELECT DISTINCT doc_id,
         unnest(string_split(coalesce(text, ''), ' ')) AS term
  FROM documents),
g AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS df,
         string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)
           AS postings
  FROM pairs GROUP BY term)
SELECT term, df, postings FROM g WHERE df >= 3 ORDER BY term
"""


def q_anchor_texts(sf_dir: str):
    """Per-host anchor-text aggregation (composition: extract_links ->
    host projection -> stages/pivot.py::grouped_concat): the classic
    link-graph feature build — every anchor text pointing at a host,
    concatenated in (doc_id, link_pos) order. Relative links drop out
    at the host projection; one hash exchange on host."""
    from ..stages.pivot import grouped_concat

    ds = read_table(sf_dir, "documents", columns=["doc_id"],
                    override_num_blocks=16)
    synthed = ds.map_batches(_synth_link_html, batch_format="pandas")
    links = text_stages.extract_links(synthed, "html")

    def with_host(df: pd.DataFrame) -> pd.DataFrame:
        host = text_stages.host_of(df["href"])
        keep = host.notna().to_numpy()
        sub = df[keep]
        return pd.DataFrame({
            "host": host[keep].to_numpy(),
            "doc_id": sub["doc_id"].to_numpy(),
            "link_pos": sub["link_pos"].to_numpy(),
            "anchor": sub["anchor"].to_numpy(),
        })

    hosted = links.map_batches(with_host, batch_format="pandas")
    agg = grouped_concat(hosted, ["host"], "anchor",
                         ["doc_id", "link_pos"], sep="|",
                         out_col="anchors")
    return agg.sort("host")


QUERIES["anchor_texts"] = q_anchor_texts

ORACLE_SQL["anchor_texts"] = """
WITH l AS (
  SELECT doc_id, CAST(j + 1 AS BIGINT) AS link_pos,
         'host' || ((doc_id * 7 + j) % 10) || '.example' AS host,
         'link ' || doc_id || ' ' || j AS anchor
  FROM (SELECT doc_id, unnest(range(0, doc_id % 4)) AS j FROM documents))
SELECT host,
       string_agg(anchor, '|' ORDER BY doc_id, link_pos) AS anchors
FROM l GROUP BY host ORDER BY host
"""


def q_cooccurrence_topk(sf_dir: str):
    """Windowed skip-gram co-occurrence (stages/text.py::cooccurrence,
    window=3): the word2vec/GloVe statistics pass — top-100 ordered
    token pairs at distance 1-3 within a document. One pair-vocabulary
    exchange; the oracle restates the window with a distance cross
    join over DuckDB list indexing."""
    ds = read_table(sf_dir, "documents", columns=["text"],
                    override_num_blocks=16)
    return text_stages.cooccurrence(ds, 100, window=3)


QUERIES["cooccurrence_topk"] = q_cooccurrence_topk

ORACLE_SQL["cooccurrence_topk"] = """
WITH toks AS (
  SELECT string_split(coalesce(text, ''), ' ') AS w FROM documents),
idx AS (
  SELECT w, unnest(range(1, len(w))) AS i FROM toks WHERE len(w) > 1),
pr AS (
  SELECT w[i] AS left_term, w[i + d.d] AS right_term
  FROM idx, (SELECT unnest([1, 2, 3]) AS d) d
  WHERE i + d.d <= len(w))
SELECT left_term, right_term, CAST(COUNT(*) AS BIGINT) AS n_cooc
FROM pr GROUP BY 1, 2
ORDER BY n_cooc DESC, left_term, right_term LIMIT 100
"""


def q_oov_rate(sf_dir: str):
    """Tokenizer-coverage eval (stages/text.py::oov_rate): per-document
    OOV fraction against the corpus top-100 vocabulary. The float column
    is one int64/int64 IEEE division, bitwise-stable across engines (the
    readability precedent), so it survives the driver's value hash."""
    ds = read_table(sf_dir, "documents", columns=["doc_id", "text"],
                    override_num_blocks=16)
    return text_stages.oov_rate(ds, 100).sort("doc_id")


QUERIES["oov_rate"] = q_oov_rate

ORACLE_SQL["oov_rate"] = """
WITH toks AS (
  SELECT doc_id, string_split(coalesce(text, ''), ' ') AS w
  FROM documents),
uni AS (
  SELECT term, COUNT(*) AS n
  FROM (SELECT unnest(w) AS term FROM toks) GROUP BY 1),
vocab AS (SELECT term FROM uni ORDER BY n DESC, term LIMIT 100),
ex AS (SELECT doc_id, unnest(w) AS term FROM toks),
sc AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(CASE WHEN term IN (SELECT term FROM vocab)
                       THEN 0 ELSE 1 END) AS BIGINT) AS n_oov
  FROM ex GROUP BY doc_id)
SELECT doc_id, n_tokens, n_oov,
       CAST(n_oov AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS oov_rate
FROM sc ORDER BY doc_id
"""


def q_vocab_coverage(sf_dir: str):
    """Zipf coverage curve (stages/text.py::vocab_coverage): running
    token share per vocabulary term in frequency order — the counts
    exchange feeds the distributed prefix scan (running_sum over -n);
    cum_share is one int64/int64 IEEE division, bitwise-stable (the
    readability/oov_rate precedent)."""
    ds = read_table(sf_dir, "documents", columns=["text"],
                    override_num_blocks=16)
    return text_stages.vocab_coverage(ds)


QUERIES["vocab_coverage"] = q_vocab_coverage

ORACLE_SQL["vocab_coverage"] = """
WITH uni AS (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS n
  FROM (SELECT unnest(string_split(coalesce(text, ''), ' ')) AS term
        FROM documents)
  GROUP BY 1),
tot AS (SELECT CAST(SUM(n) AS DOUBLE) AS total FROM uni)
SELECT term, n,
       CAST(SUM(n) OVER (ORDER BY n DESC, term) AS BIGINT) AS cum_tokens,
       CAST(SUM(n) OVER (ORDER BY n DESC, term) AS DOUBLE)
         / (SELECT total FROM tot) AS cum_share
FROM uni ORDER BY n DESC, term
"""
