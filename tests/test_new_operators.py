"""Unit tests: idgen (ST2), inconsistency solver, datasource lookup (J2/J3),
lake compaction, export sinks (S5/S6)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data as rd


def _ds(**cols):
    return rd.from_arrow(pa.table(cols))


def test_surrogate_ids_unique_and_dense_blocks():
    from openmrs_module_epts_etl_ray.stages.idgen import assign_surrogate_ids
    ds = rd.range(5000).map_batches(
        lambda t: pa.table({"x": t["id"]}), batch_format="pyarrow")
    out = assign_surrogate_ids(ds, id_col="sid", start=100).to_pandas()
    assert len(out) == 5000
    assert out["sid"].is_unique
    assert out["sid"].min() >= 100
    assert out["sid"].max() < 100 + 5000  # block allocation leaves no waste


def test_inconsistency_modes():
    from openmrs_module_epts_etl_ray.stages.inconsistency import resolve_inconsistencies
    rows = _ds(id=[1, 2, 3, 4], fk=[10, 99, None, 20])
    parents = _ds(pk=[10, 20, 30])

    dropped = resolve_inconsistencies(rows, parents, "fk", "pk",
                                      on_missing="drop").to_pandas()
    assert sorted(dropped["id"]) == [1, 3, 4]  # null FK is consistent

    nulled = resolve_inconsistencies(rows, parents, "fk", "pk",
                                     on_missing="null").to_pandas()
    assert nulled.loc[nulled["id"] == 2, "fk"].isna().all()
    assert nulled["_inconsistent"].sum() == 1

    patched = resolve_inconsistencies(rows, parents, "fk", "pk",
                                      on_missing="default",
                                      default_value=30).to_pandas()
    assert (patched.loc[patched["id"] == 2, "fk"] == 30).all()


def test_datasource_lookup_required_and_optional():
    from openmrs_module_epts_etl_ray.stages.lookup import datasource_lookup
    src = _ds(k=[1, 2, 3], v=["a", "b", "c"])
    lk = _ds(lk_k=[1, 3, 3], name=["one", "three", "dup-ignored"])

    opt = datasource_lookup(src, lk, [("k", "lk_k")]).to_pandas()
    assert len(opt) == 3
    assert opt.loc[opt["k"] == 2, "name"].isna().all()
    # deterministic winner per key: lexicographic-min non-key row (the rule
    # is path-independent — broadcast and shuffle joins must emit the same)
    assert (opt.loc[opt["k"] == 3, "name"] == "dup-ignored").all()

    req = datasource_lookup(src, lk, [("k", "lk_k")], required=True).to_pandas()
    assert sorted(req["k"]) == [1, 3]


def test_compaction_drops_dead_tombstones_and_old_snapshots(tmp_path):
    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake, replay
    from openmrs_module_epts_etl_ray.state.commit_log import CommitLog
    from openmrs_module_epts_etl_ray.state.compaction import compact_lake

    lake = str(tmp_path / "lake")
    ev1 = pa.table({"lsn": pa.array([1, 2, 3], pa.int64()),
                    "op": ["insert", "insert", "insert"],
                    "repo": ["r", "r", "r"], "path": ["a", "b", "c"],
                    "commit": ["x", "x", "x"], "lang": ["py"] * 3,
                    "content": ["1", "2", "3"]})
    ev2 = pa.table({"lsn": pa.array([4], pa.int64()), "op": ["delete"],
                    "repo": ["r"], "path": ["b"], "commit": ["y"],
                    "lang": pa.array([None], pa.string()),
                    "content": pa.array([None], pa.string())})
    replay(rd.from_arrow(ev1), lake, num_buckets=4).materialize()
    replay(rd.from_arrow(ev2), lake, num_buckets=4).materialize()

    with_dead = read_lake(lake, include_deleted=True).to_pandas()
    assert len(with_dead) == 3  # two live + one tombstone

    stats = compact_lake(lake).to_pandas()
    assert stats["tombstones_dropped"].sum() >= 0  # watermark may retain it

    # force-drop with explicit high watermark
    stats = compact_lake(lake, watermark=10).to_pandas()
    after = read_lake(lake, include_deleted=True).to_pandas()
    assert len(after) == 2
    assert sorted(after["path"]) == ["a", "c"]

    # superseded snapshots gone, latest commit only
    log = CommitLog(lake)
    for b in log.checkpoint():
        assert len(log.commits(b)) == 1

    # idempotent
    stats2 = compact_lake(lake, watermark=10).to_pandas()
    assert stats2["tombstones_dropped"].sum() == 0
    assert stats2["snapshots_gced"].sum() == 0


def test_export_roundtrip_json_and_csv(tmp_path):
    from openmrs_module_epts_etl_ray.pipelines.export import export_files, read_export
    ds = _ds(k=list(range(100)), name=[f"n{i}" for i in range(100)])
    for fmt in ("json", "csv"):
        out = str(tmp_path / fmt)
        manifest = export_files(ds, out, fmt=fmt)
        assert len(manifest) >= 1
        back = read_export(out, fmt=fmt).to_pandas().sort_values("k")
        assert list(back["k"]) == list(range(100))
        assert list(back["name"]) == [f"n{i}" for i in range(100)]


def test_new_changed_classifier():
    import datetime

    from openmrs_module_epts_etl_ray.stages.detectors import classify_new_changed
    t0 = datetime.datetime(2024, 1, 10)
    mk = lambda d: datetime.datetime(2024, 1, d)
    ds = _ds(id=[1, 2, 3],
             created=[mk(12), mk(5), mk(2)],
             changed=[mk(12), mk(11), mk(3)])
    out = classify_new_changed(ds, "created", "changed", t0).to_pandas()
    got = dict(zip(out["id"], out["change_class"]))
    assert got == {1: "new", 2: "changed"}  # id=3 unchanged -> dropped


def test_dead_letter_channel(tmp_path):
    """Invalid events divert to the dead-letter dir with reasons; the lake
    state matches the oracle of the VALID rows only."""
    from openmrs_module_epts_etl_ray.oracle import oracle_final_shas
    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake, replay
    from openmrs_module_epts_etl_ray.stages.validate import read_dead_letters

    good = pa.table({"lsn": pa.array([1, 2, 3], pa.int64()),
                     "op": ["insert", "insert", "delete"],
                     "repo": ["r", "r", "r"], "path": ["a", "b", "b"],
                     "commit": ["c1", "c2", "c3"],
                     "lang": pa.array(["py", "py", None]),
                     "content": pa.array(["x", "y", None])})
    bad = pa.table({"lsn": pa.array([None, 7, 8], pa.int64()),
                    "op": ["insert", "upsert", "insert"],
                    "repo": ["r", "r", None], "path": ["z", "z", "z"],
                    "commit": ["c", "c", "c"],
                    "lang": pa.array(["py", "py", "py"]),
                    "content": pa.array(["v", "v", "v"])})
    ev = rd.from_arrow(pa.concat_tables([good, bad]))
    lake, dl = str(tmp_path / "lake"), str(tmp_path / "dead")
    replay(ev, lake, num_buckets=4, dead_letter_dir=dl).materialize()

    state = read_lake(lake).to_pandas()
    mine = {(r.repo, r.path): r.content_sha for r in state.itertuples()}
    assert mine == oracle_final_shas(good)

    dead = read_dead_letters(dl).to_pandas().sort_values("lsn", na_position="first")
    assert len(dead) == 3
    assert list(dead["_reason"]) == ["bad_lsn", "bad_op", "null_key:repo"]


def test_connected_components_clusters():
    from openmrs_module_epts_etl_ray.stages.dedup import connected_components
    pairs = _ds(id_a=[1, 2, 10, 20], id_b=[2, 3, 11, 10])
    out = connected_components(pairs)
    got = dict(zip(out["doc_id"], out["canonical_id"]))
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 20: 10}


def test_asof_join_backward_with_misses():
    import datetime

    from openmrs_module_epts_etl_ray.stages.asof import asof_join
    mk = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    left = _ds(lid=[1, 2, 3], user=[7, 7, 8], ts=[mk(10), mk(20), mk(5)])
    right = _ds(rid=[100, 101], user=[7, 7], ts=[mk(10), mk(15)], v=[1.0, 2.0])
    out = asof_join(left, right, by="user", on="ts",
                    right_cols=["rid", "v"], num_buckets=4).to_pandas()
    out = out.set_index("lid").sort_index()
    assert out.loc[1, "rid"] == 100      # exact-ts match allowed
    assert out.loc[2, "rid"] == 101      # latest at/before
    assert pd.isna(out.loc[3, "rid"])    # user 8: no purchase -> null



def test_json_process_config_runner(tmp_path):
    """Reference-vocabulary JSON config (srcConf/dstConf/FieldsMapping)
    compiles to the Ray pipeline and writes both destinations."""
    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    cfg = {
        "processType": "etl",
        "etlConfiguration": [{
            "srcConf": {
                "tableName": "customer",
                "sfDir": "/root/testdata/sf0.001",
                "columns": ["c_custkey", "c_name", "c_acctbal"],
                "extraConditionForExtract": "c_acctbal > 0",
            },
            "dstConf": [
                {"tableName": "customer_dim",
                 "mapping": [
                     {"srcField": "c_custkey", "dstField": "customer_id"},
                     {"srcField": "c_name", "dstField": "name"},
                     {"srcValue": "epts", "dstField": "origin_app"},
                     {"mapToNullValue": True, "dstField": "legacy", "type": "string"},
                 ],
                 "dstType": "parquet",
                 "outDir": str(tmp_path / "dim")},
                {"tableName": "balances",
                 "mapping": [
                     {"srcField": "c_custkey", "dstField": "customer_id"},
                     {"srcField": "c_acctbal", "dstField": "balance"},
                 ],
                 "dstType": "csv",
                 "outDir": str(tmp_path / "bal")},
            ],
        }],
    }
    outs = run_config(cfg)
    assert set(outs) == {"customer_dim", "balances"}

    import duckdb
    con = duckdb.connect()
    want = con.sql("SELECT count(*) FROM read_parquet("
                   "'/root/testdata/sf0.001/customer.parquet') WHERE c_acctbal > 0"
                   ).fetchone()[0]
    dim = rd.read_parquet(outs["customer_dim"]).to_pandas()
    assert len(dim) == want
    assert set(dim.columns) == {"customer_id", "name", "origin_app", "legacy"}
    assert (dim["origin_app"] == "epts").all()
    assert dim["legacy"].isna().all()
    bal = rd.read_csv(outs["balances"]).to_pandas()
    assert len(bal) == want


def test_connected_components_distributed_matches_union_find():
    from openmrs_module_epts_etl_ray.stages.dedup import (
        connected_components, connected_components_distributed,
    )
    pairs = _ds(id_a=[1, 2, 10, 20, 30, 31], id_b=[2, 3, 11, 10, 31, 32])
    want = connected_components(pairs).set_index("doc_id")["canonical_id"].to_dict()
    got_df = connected_components_distributed(pairs).to_pandas()
    got = dict(zip(got_df["doc_id"].astype(int), got_df["canonical_id"].astype(int)))
    assert got == want


def test_asof_and_range_join_single_side_buckets():
    """Buckets holding rows from only one side must not crash (keys present
    on one side only, many buckets so some see a single side)."""
    import datetime

    from openmrs_module_epts_etl_ray.stages.asof import asof_join, range_join
    mk = lambda m: datetime.datetime(2024, 1, 1, 0, m)
    left = _ds(lid=[1, 2], user=[1, 2], ts=[mk(10), mk(20)])
    right = _ds(rid=[9], user=[77], ts=[mk(1)], v=[5.0])  # user 77: right-only
    out = asof_join(left, right, by="user", on="ts",
                    right_cols=["rid", "v"], num_buckets=8).to_pandas()
    assert sorted(out["lid"]) == [1, 2]
    assert out["rid"].isna().all()

    rj = range_join(left, right, by="user", on="ts",
                    lo_offset="0s", hi_offset="1D", num_buckets=8).to_pandas()
    assert len(rj) == 0


def test_membership_join_sql_null_semantics():
    """Null keys: EXISTS false (semi drops), NOT EXISTS true (anti keeps) —
    on the broadcast path too, even with nulls in the right side."""
    from openmrs_module_epts_etl_ray.stages.joins import anti_join, semi_join
    left = _ds(k=pa.array([1, 2, None], pa.int64()), v=["a", "b", "c"])
    right = _ds(k=pa.array([1, None], pa.int64()))
    semi = semi_join(left, right, ["k"]).to_pandas()
    assert sorted(semi["v"]) == ["a"]
    anti = anti_join(left, right, ["k"]).to_pandas()
    assert sorted(anti["v"]) == ["b", "c"]


def test_reconcile_both_null_not_outdated():
    from openmrs_module_epts_etl_ray.stages.detectors import reconcile
    src = _ds(k=[1, 2], x=pa.array([None, 5.0], pa.float64()))
    dst = _ds(k=[1, 2], x=pa.array([None, 6.0], pa.float64()))
    out = reconcile(src, dst, ["k"], ["x"]).to_pandas()
    assert list(out["k"]) == [2]  # both-null row 1 is identical, not outdated


def test_export_rerun_replaces_not_appends(tmp_path):
    from openmrs_module_epts_etl_ray.pipelines.export import export_files, read_export
    ds = _ds(k=list(range(10)))
    out = str(tmp_path / "exp")
    export_files(ds, out, fmt="csv")
    export_files(ds, out, fmt="csv")  # re-run must replace, not double
    assert len(read_export(out, fmt="csv").to_pandas()) == 10


def test_inconsistency_drop_audit_channel(tmp_path):
    import pyarrow.parquet as pq

    from openmrs_module_epts_etl_ray.stages.inconsistency import resolve_inconsistencies
    rows = _ds(id=[1, 2], fk=[10, 99])
    parents = _ds(pk=[10])
    audit = str(tmp_path / "audit")
    kept = resolve_inconsistencies(rows, parents, "fk", "pk",
                                   on_missing="drop", audit_dir=audit).to_pandas()
    assert list(kept["id"]) == [1]
    import os
    files = [f for f in os.listdir(audit) if f.endswith(".parquet")]
    assert len(files) == 1
    dropped = pq.read_table(os.path.join(audit, files[0])).to_pandas()
    assert list(dropped["id"]) == [2]


def test_fk_remap_modes():
    from openmrs_module_epts_etl_ray.stages.lookup import remap_fk
    rows = _ds(id=[1, 2, 3], fk=pa.array([10, 20, None], pa.int64()))
    mapping = _ds(old=[10], new=[100])

    kept = remap_fk(rows, mapping, "fk", old_col="old", new_col="new",
                    on_missing="keep").to_pandas().set_index("id")
    assert kept.loc[1, "fk"] == 100
    assert kept.loc[2, "fk"] == 20       # unmapped keeps old value
    assert pd.isna(kept.loc[3, "fk"])    # null FK passes through

    nulled = remap_fk(rows, mapping, "fk", old_col="old", new_col="new",
                      on_missing="null").to_pandas().set_index("id")
    assert pd.isna(nulled.loc[2, "fk"])

    dropped = remap_fk(rows, mapping, "fk", old_col="old", new_col="new",
                       on_missing="drop").to_pandas()
    assert sorted(dropped["id"]) == [1, 3]


def test_default_parent_created_lazily(ray_session):
    import ray.data as rd
    from openmrs_module_epts_etl_ray.stages.inconsistency import (
        resolve_with_default_parent,
    )

    parents = rd.from_arrow(pa.table({
        "pk": pa.array([1, 2, 3], pa.int64()),
        "name": ["a", "b", "c"]}))
    kids = rd.from_arrow(pa.table({
        "kid": pa.array([10, 11, 12], pa.int64()),
        "fk": pa.array([1, 99, None], pa.int64())}))
    fixed, parents2 = resolve_with_default_parent(
        kids, parents, "fk", "pk", default_key=-1,
        default_row={"name": "DEFAULT"})
    got = fixed.to_pandas().sort_values("kid")
    assert got["fk"].tolist()[:2] == [1, -1]       # missing -> default key
    assert pd.isna(got["fk"].tolist()[2])          # null stays null (optional)
    assert got["used_default_parent"].tolist() == [False, True, False]
    p2 = parents2.to_pandas().sort_values("pk")
    assert (-1 in p2["pk"].tolist()
            and p2[p2["pk"] == -1]["name"].iloc[0] == "DEFAULT")

    # laziness: no missing children -> parents untouched (no default row)
    clean = rd.from_arrow(pa.table({
        "kid": pa.array([20], pa.int64()), "fk": pa.array([2], pa.int64())}))
    _, parents3 = resolve_with_default_parent(
        clean, parents, "fk", "pk", default_key=-1)
    assert sorted(parents3.to_pandas()["pk"].tolist()) == [1, 2, 3]

    # idempotent: default already present -> not duplicated
    fixed2, parents4 = resolve_with_default_parent(
        kids, parents2, "fk", "pk", default_key=-1,
        default_row={"name": "DEFAULT"})
    assert sorted(parents4.to_pandas()["pk"].tolist()) == [-1, 1, 2, 3]


def test_hopping_window_fanout(ray_session):
    import ray.data as rd
    from openmrs_module_epts_etl_ray.stages.windows import hopping_window_agg

    ts = pa.array([pd.Timestamp("2024-01-05 10:00")], pa.timestamp("us"))
    ds = rd.from_arrow(pa.table({"ts": ts, "v": pa.array([2.0])}))
    out = hopping_window_agg(ds, "ts", window="3D", hop="1D",
                             sum_cols=["v"]).to_pandas()
    # one event -> exactly window/hop = 3 overlapping windows
    assert sorted(out["window_start"].astype(str)) == [
        "2024-01-03", "2024-01-04", "2024-01-05"]
    assert (out["n"] == 1).all() and (out["sum_v"] == 2.0).all()


def test_session_windows_split_on_gap(ray_session):
    import ray.data as rd
    from openmrs_module_epts_etl_ray.stages.windows import session_windows

    t0 = pd.Timestamp("2024-01-01 00:00")
    rows = {
        "user_id": pa.array([1, 1, 1, 2], pa.int64()),
        "ts": pa.array([t0, t0 + pd.Timedelta("10min"),
                        t0 + pd.Timedelta("3h"), t0], pa.timestamp("us")),
    }
    out = session_windows(rd.from_arrow(pa.table(rows)), "ts", "user_id",
                          gap="30min").to_pandas().sort_values(
        ["user_id", "session_id"]).reset_index(drop=True)
    # user 1: two sessions (2 events, then 1 after the 3h gap); user 2: one
    assert list(zip(out["user_id"], out["session_id"], out["n_events"])) == [
        (1, 1, 2), (1, 2, 1), (2, 1, 1)]


def test_hash_split_stable_and_proportional(ray_session):
    import ray.data as rd
    from openmrs_module_epts_etl_ray.stages.sampling import (
        deterministic_sample, hash_split,
    )

    ds = rd.from_arrow(pa.table({"k": pa.array(range(20_000), pa.int64())}))
    out = hash_split(ds, "k").to_pandas()
    frac = out["split"].value_counts(normalize=True)
    assert abs(frac["train"] - 0.9) < 0.02
    assert abs(frac["val"] - 0.05) < 0.01
    assert abs(frac["test"] - 0.05) < 0.01
    # stability: same assignment on a re-run over a differently-blocked ds
    out2 = hash_split(ds.repartition(7), "k").to_pandas()
    m = out.set_index("k")["split"]
    m2 = out2.set_index("k")["split"]
    assert (m.sort_index() == m2.sort_index()).all()

    samp = deterministic_sample(ds, "k", 0.25).to_pandas()
    assert abs(len(samp) / 20_000 - 0.25) < 0.02
    samp2 = deterministic_sample(ds.repartition(5), "k", 0.25).to_pandas()
    assert sorted(samp["k"]) == sorted(samp2["k"])
    # nested rates: a smaller sample is a subset of a larger one
    small = deterministic_sample(ds, "k", 0.1).to_pandas()
    assert set(small["k"]) <= set(samp["k"])


def test_approx_percentiles_close_to_exact(ray_session):
    import ray.data as rd
    from openmrs_module_epts_etl_ray.stages.windows import (
        grouped_percentiles, grouped_percentiles_approx,
    )

    rng = np.random.default_rng(11)
    n = 200_000
    t = pa.table({
        "grp": pa.array(rng.integers(0, 3, n).astype("int64")),
        "v": pa.array(rng.lognormal(0, 1.0, n)),
    })
    ds = rd.from_arrow(t).repartition(16)
    exact = grouped_percentiles(ds, ["grp"], "v").to_pandas().set_index("grp")
    approx = grouped_percentiles_approx(ds, ["grp"], "v").to_pandas().set_index("grp")
    assert (exact["n"].sort_index() == approx["n"].sort_index()).all()
    for q in ("p50", "p90", "p99"):
        rel = (approx[q] - exact[q]).abs() / exact[q]
        assert (rel < 0.05).all(), (q, rel.to_dict())


def test_bloom_joins_match_exact(ray_session):
    # dup keys on both sides, null keys on both sides; bloom semi/anti must
    # emit exactly the exact paths' rows (false positives removed, null-key
    # NOT EXISTS rows kept)
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages import joins

    rng = np.random.default_rng(7)
    lk = rng.integers(0, 3000, 20000).astype("float64")
    lk[::113] = np.nan
    rk = rng.integers(1500, 4500, 5000).astype("float64")
    rk[::97] = np.nan
    left = rd.from_arrow(pa.table({
        "k": pa.array(pd.array(lk).astype("Int64")),
        "v": pa.array(np.arange(20000, dtype="int64"))})).repartition(8)
    right = rd.from_arrow(pa.table({
        "k": pa.array(pd.array(rk).astype("Int64")),
        "w": pa.array(np.arange(5000, dtype="int64"))})).repartition(4)

    def rows(ds):
        df = ds.to_pandas()[["k", "v"]]
        return sorted(map(tuple, df.fillna(-1).to_numpy()))

    semi_exact = rows(joins.semi_join(left, right, ["k"], broadcast=True))
    semi_bloom = rows(joins.bloom_semi_join(left, right, ["k"]))
    assert semi_bloom == semi_exact

    anti_exact = rows(joins.anti_join(left, right, ["k"], broadcast=True))
    anti_bloom = rows(joins.bloom_anti_join(left, right, ["k"]))
    assert anti_bloom == anti_exact
    # the two partitions tile left exactly
    assert len(semi_bloom) + len(anti_bloom) == 20000


def test_bloom_prefilter_shrinks_probe(ray_session):
    # disjoint key ranges: the semi pre-filter must kill (almost) every row
    # before the exact pass — the property that makes the bloom path the
    # no-shuffle scale strategy
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages import joins

    left = rd.from_arrow(pa.table({"k": np.arange(50000, dtype="int64")}))
    right = rd.from_arrow(pa.table(
        {"k": np.arange(100000, 101000, dtype="int64")}))
    right = right.materialize()
    m, k = joins._bloom_params(right.count(), 16)
    ref = joins._bloom_build(right, ["k"], m, k)
    surv = left.map_batches(
        joins._BloomProbe(ref, ["k"], m, k, "maybe"),
        batch_format="pyarrow").count()
    assert surv <= 50000 * 0.01  # way under 1% false positives


def test_stratified_sample_rates_and_default(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages.sampling import (
        deterministic_sample, stratified_sample)

    n = 30000
    ids = np.arange(n, dtype="int64")
    grp = np.where(ids % 3 == 0, "a", np.where(ids % 3 == 1, "b", "c"))
    ds = rd.from_arrow(pa.table({"id": ids, "g": grp})).repartition(8)
    out = stratified_sample(ds, "id", "g", {"a": 1.0, "b": 0.2},
                            default_rate=0.0).to_pandas()
    by = out.groupby("g")["id"].count()
    # rate-1.0 group keeps EVERY row (the 'zzzz' bound, not 'ffff')
    assert by.get("a", 0) == (grp == "a").sum()
    # absent group drops entirely under default_rate=0
    assert by.get("c", 0) == 0
    # the sampled group matches the single-rate operator exactly (same rule)
    only_b = ds.filter(lambda r: r["g"] == "b")
    want_b = set(deterministic_sample(only_b, "id", 0.2).to_pandas()["id"])
    assert set(out[out.g == "b"]["id"]) == want_b
    assert abs(len(want_b) / (grp == "b").sum() - 0.2) < 0.02


def test_exact_order_stat_matches_sort(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages.selection import (
        exact_order_stat, exact_quantile)

    rng = np.random.default_rng(13)
    # floats with negatives + a mega-duplicate spike + exact-boundary ranks
    v = np.concatenate([rng.normal(0, 100, 20000),
                        np.full(5000, 42.5),
                        rng.integers(-50, 50, 5000).astype("float64")])
    ds = rd.from_arrow(pa.table({"x": v})).repartition(8).materialize()
    s = np.sort(v)
    n = len(v)
    # force multi-round refinement with tiny buckets and collect cap
    import openmrs_module_epts_etl_ray.stages.selection as sel
    old = sel._COLLECT_CAP
    sel._COLLECT_CAP = 500
    try:
        for k in [0, 1, n // 3, n // 2, n - 2, n - 1]:
            got = exact_order_stat(ds, "x", k, num_buckets=32)
            assert got == s[k], (k, got, s[k])
        for q in [0.0, 0.25, 0.5, 0.9, 1.0]:
            got = exact_quantile(ds, "x", q, num_buckets=32)
            assert got == s[int(np.floor(q * (n - 1)))], q
    finally:
        sel._COLLECT_CAP = old
    # nulls excluded like SQL ordering
    vn = np.concatenate([v, [np.nan] * 777])
    dsn = rd.from_arrow(pa.table({"x": vn})).repartition(8).materialize()
    assert exact_quantile(dsn, "x", 0.5, num_buckets=32) == \
        s[int(np.floor(0.5 * (n - 1)))]


def test_export_partitioned_resumes_only_unfinished(tmp_path):
    import os
    import shutil

    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.export import export_partitioned

    out = str(tmp_path / "part")
    ds = rd.from_items([{"g": i % 3, "v": i} for i in range(30)])
    m = export_partitioned(ds, out, "g").to_pydict()
    assert sorted(m["partition"]) == ["0", "1", "2"]
    assert m["skipped"] == [False, False, False]

    # simulate crash mid-write of partition g=1: no _FINISHED marker
    shutil.rmtree(os.path.join(out, "g=1"))
    os.makedirs(os.path.join(out, "g=1"))
    m2 = export_partitioned(
        rd.from_items([{"g": i % 3, "v": i} for i in range(30)]),
        out, "g").to_pydict()
    skipped = dict(zip(m2["partition"], m2["skipped"]))
    assert skipped == {"0": True, "1": False, "2": True}

    back = rd.read_parquet(out).to_pandas()
    assert len(back) == 30 and int(back["v"].sum()) == sum(range(30))
    assert sorted(back["v"]) == list(range(30))

    # fresh run with resume=False replaces everything
    m3 = export_partitioned(
        rd.from_items([{"g": 0, "v": 1}]), out, "g",
        resume=False).to_pydict()
    assert m3["skipped"] == [False]
    assert len(rd.read_parquet(out).to_pandas()) == 1
