"""Round-3 config vocabulary: selfJoinTables / extraTableDataSource in the
extract compiler, onConflict + winningRecordFieldsInfo, per-field
``transformer`` in mappings, detector process types with after-actions,
RESOLVE_CONFLICTS_IN_STAGE_AREA, conditional/ignorable parents (reference
``EtlDatabaseObjectSearchParams.java:44-91``, ``conf/DstConf.java:66-86``,
``FieldsMapping.java:66-84``, ``ChangedRecordsDetectorSearchParams.java:32-77``,
``conf/RefMapping.java:7-28``)."""
import duckdb
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray.data as rd

from openmrs_module_epts_etl_ray.pipelines.config import compile_extract, run_config

SF = "/root/testdata/sf0.001"


def upper_transformer(arr):
    # field-level UDF loaded by dotted path from a mapping entry
    return pc.utf8_upper(arr)


def tag_batch(t: pa.Table) -> pa.Table:
    # afterEtlAction performer: mark every detected row
    return t.append_column("action", pa.array(["tagged"] * len(t)))


def test_compile_extract_self_join_and_table_datasource(ray_session):
    src = {
        "sfDir": SF, "tableName": "orders",
        "columns": ["o_orderkey", "o_custkey"],
        "selfJoinTables": [{
            "tableName": "customer", "joinType": "inner",
            "columns": ["c_custkey", "c_nationkey"],
            "joinFields": [{"srcField": "o_custkey", "dstField": "c_custkey"}],
        }],
        "extraTableDataSource": [{
            "tableName": "nation", "columns": ["n_name"],
            "joinFields": [{"srcField": "c_nationkey", "dstField": "n_nationkey"}],
        }],
    }
    got = compile_extract(src).to_pandas()
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT o.o_orderkey, o.o_custkey, c.c_nationkey, n.n_name
        FROM read_parquet('{SF}/orders.parquet') o
        JOIN read_parquet('{SF}/customer.parquet') c ON c.c_custkey = o.o_custkey
        LEFT JOIN read_parquet('{SF}/nation.parquet') n
          ON n.n_nationkey = c.c_nationkey""").df()
    got = got.sort_values(["o_orderkey"]).reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values(["o_orderkey"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_mapping_field_transformer(ray_session, tmp_path):
    out = tmp_path / "reg"
    run_config({"processType": "etl", "etlConfiguration": [{
        "srcConf": {"tableName": "region", "sfDir": SF},
        "dstConf": [{"tableName": "r", "outDir": str(out), "mapping": [
            {"srcField": "r_regionkey", "dstField": "id"},
            {"srcField": "r_name", "dstField": "name_uc",
             "transformer": "tests.test_config_vocabulary:upper_transformer"},
        ]}],
    }]})
    got = pq.read_table(str(out)).to_pandas().sort_values("id")
    assert got["name_uc"].tolist() == [
        n.upper() for n in
        pq.read_table(f"{SF}/region.parquet").to_pandas()
        .sort_values("r_regionkey")["r_name"]]


def test_quick_merge_winning_fields_via_config(ray_session, tmp_path):
    # §2.12 truth table driven from JSON: incoming wins ONLY where the
    # winning-fields group matches (state='final'), regardless of lsn
    src_dir = tmp_path / "srctbl"
    src_dir.mkdir()
    existing = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "val": ["old1", "old2"],
        "state": ["x", "x"],
        "lsn": pa.array([5, 5], pa.int64()),
        "op": ["insert", "insert"],
    })
    incoming = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "val": ["new1", "new2"],
        "state": ["final", "draft"],
        # above the bootstrap watermark (5) so the exactly-once replay guard
        # admits both; newer lsn must NOT decide the winner (id=2 stays old)
        "lsn": pa.array([6, 9], pa.int64()),
        "op": ["update", "update"],
    })
    pq.write_table(incoming, str(src_dir / "incoming.parquet"))
    lake = str(tmp_path / "lake")
    from openmrs_module_epts_etl_ray.pipelines.replay import quick_merge, read_lake
    quick_merge(rd.from_arrow(existing), lake, key_cols=("id",),
                unique_keys=[["id"]], num_buckets=4).materialize()
    run_config({"processType": "DB_QUICK_MERGE", "etlConfiguration": [{
        "srcConf": {"tableName": "incoming", "sfDir": str(src_dir)},
        "dstConf": [{"lakeRoot": lake, "keyCols": ["id"],
                     "uniqueKeys": [["id"]], "numBuckets": 4,
                     "onConflict": "winningFields",
                     "winningRecordFieldsInfo": [
                         {"fieldName": "state", "value": "final"}]}],
    }]})
    got = read_lake(lake).to_pandas().set_index("id")
    assert got.loc[1, "val"] == "new1"   # group matched -> incoming wins
    assert got.loc[2, "val"] == "old2"   # group missed -> existing kept


def test_detector_process_with_performer(ray_session, tmp_path):
    out = tmp_path / "detected"
    run_config({"processType": "CHANGED_RECORDS_DETECTOR",
                "etlConfiguration": [{
        "srcConf": {"tableName": "orders", "sfDir": SF,
                    "createdColumn": "o_orderdate",
                    "changedColumn": "o_orderdate",
                    "since": "1998-06-01", "outDir": str(out)},
        "action": {"performer": "tests.test_config_vocabulary:tag_batch"},
    }]})
    got = pq.read_table(str(out)).to_pandas()
    con = duckdb.connect()
    n_want = con.sql(f"""SELECT count(*) FROM
        read_parquet('{SF}/orders.parquet')
        WHERE o_orderdate >= TIMESTAMP '1998-06-01'""").fetchone()[0]
    assert len(got) == n_want > 0
    assert (got["action"] == "tagged").all()
    assert set(got["change_class"]) <= {"new", "changed"}


def test_resolve_conflicts_in_stage_area_process(ray_session, tmp_path):
    stage = tmp_path / "stage"
    stage.mkdir()
    rows = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "v": ["a_old", "a_new", "b"],
        "lsn": pa.array([1, 2, 1], pa.int64()),
    })
    pq.write_table(rows, str(stage / "p.parquet"))
    out = tmp_path / "resolved"
    run_config({"processType": "RESOLVE_CONFLICTS_IN_STAGE_AREA",
                "etlConfiguration": [{
        "srcConf": {"stageDir": str(stage), "keyCols": ["k"],
                    "outDir": str(out)}}]})
    got = pq.read_table(str(out)).to_pandas().sort_values("k")
    assert got["v"].tolist() == ["a_new", "b"]


def test_conditional_parent_gating(ray_session):
    from openmrs_module_epts_etl_ray.stages.inconsistency import (
        resolve_inconsistencies,
    )

    rows = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "fk": pa.array([99, 99, 1], pa.int64()),   # 99 has no parent
        "kind": ["gated", "other", "gated"],
    }))
    parents = rd.from_arrow(pa.table({"pk": pa.array([1, 2], pa.int64())}))
    # relationship binds only where kind == 'gated'; missing parent -> null
    # (the reference's ignorable flag)
    got = resolve_inconsistencies(
        rows, parents, "fk", "pk", on_missing="ignore",
        condition_field="kind", condition_value="gated",
    ).to_pandas().sort_values("id")
    assert got["fk"].tolist()[0] is None or pd.isna(got["fk"].tolist()[0])
    assert got["fk"].tolist()[1] == 99      # unmatched condition: untouched
    assert got["fk"].tolist()[2] == 1
    assert got["_inconsistent"].tolist() == [True, False, False]


def test_new_records_detector_process(ray_session, tmp_path):
    out = tmp_path / "new_only"
    run_config({"processType": "NEW_RECORDS_DETECTOR", "etlConfiguration": [{
        "srcConf": {"tableName": "orders", "sfDir": SF,
                    "createdColumn": "o_orderdate",
                    "since": "1998-06-01", "until": "1998-07-01",
                    "outDir": str(out)},
    }]})
    got = pq.read_table(str(out)).to_pandas()
    con = duckdb.connect()
    n_want = con.sql(f"""SELECT count(*) FROM
        read_parquet('{SF}/orders.parquet')
        WHERE o_orderdate >= TIMESTAMP '1998-06-01'
          AND o_orderdate < TIMESTAMP '1998-07-01'""").fetchone()[0]
    assert len(got) == n_want > 0


def test_example_config_file_runs(ray_session, tmp_path, monkeypatch):
    # the shipped example config is runnable as-is (file-path entry point)
    import json as _json
    import shutil

    cfg = _json.load(open("examples/etl_self_join.json"))
    out = str(tmp_path / "enriched")
    cfg["etlConfiguration"][0]["dstConf"][0]["outDir"] = out
    p = tmp_path / "cfg.json"
    p.write_text(_json.dumps(cfg))
    outs = run_config(str(p))
    got = pq.read_table(out).to_pandas()
    assert set(got.columns) == {"order_id", "customer_id", "customer_name",
                                "nation", "origin_app"}
    assert (got["origin_app"] == "epts").all() and len(got) > 0


def test_merge_from_json_rerun_idempotent(ray_session, tmp_path):
    # re-running the merge step over the same lake applies nothing new
    from openmrs_module_epts_etl_ray.pipelines.export import export_files
    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake

    cust = rd.read_parquet(f"{SF}/customer.parquet").select_columns(
        ["c_custkey", "c_name"])
    exp = str(tmp_path / "exp")
    export_files(cust, exp, fmt="json")
    lake = str(tmp_path / "lake")
    cfg = {"processType": "DB_MERGE_FROM_JSON", "etlConfiguration": [{
        "srcConf": {"importDir": exp, "format": "json", "lsn": 1},
        "dstConf": [{"lakeRoot": lake, "keyCols": ["c_custkey"],
                     "uniqueKeys": [["c_custkey"]], "numBuckets": 8}],
    }]}
    run_config(cfg)
    first = read_lake(lake).to_pandas().sort_values("c_custkey") \
        .reset_index(drop=True)
    run_config(cfg)  # replay: commit-log watermark admits nothing
    second = read_lake(lake).to_pandas().sort_values("c_custkey") \
        .reset_index(drop=True)
    pd.testing.assert_frame_equal(first, second)
    assert len(first) == cust.count()


def test_transport_process_moves_files_with_backup(ray_session, tmp_path):
    # S8: export dir -> import dir copy + original moved to bkp; idempotent
    exp = tmp_path / "export"; exp.mkdir()
    (exp / "batch-1.json").write_text('{"a": 1}\n')
    (exp / "batch-2.json").write_text('{"a": 2}\n')
    (exp / "_marker").write_text("x")  # non-data file: untouched
    imp = tmp_path / "import"
    bkp = tmp_path / "bkp"
    cfg = {"processType": "TRANSPORT", "etlConfiguration": [{
        "srcConf": {"exportDir": str(exp), "bkpDir": str(bkp)},
        "dstConf": [{"importDir": str(imp)}],
    }]}
    run_config(cfg)
    assert sorted(p.name for p in imp.iterdir()) == ["batch-1.json", "batch-2.json"]
    assert sorted(p.name for p in bkp.iterdir()) == ["batch-1.json", "batch-2.json"]
    assert (exp / "_marker").exists()
    assert not (exp / "batch-1.json").exists()  # moved to bkp
    run_config(cfg)  # rerun with empty export dir: no-op
    assert sorted(p.name for p in imp.iterdir()) == ["batch-1.json", "batch-2.json"]


def test_process_params_bind_into_conditions_and_queries(ray_session, tmp_path):
    # reference README:37,251-252 — @name params bound from the process map;
    # unknown @tokens survive for per-record binding
    from openmrs_module_epts_etl_ray.pipelines.config import bind_params

    assert bind_params("seg = @seg AND bal > @cut AND k IN (@ks)",
                       {"seg": "BUILDING", "cut": 10,
                        "ks": [1, 2, 3]}) == \
        "seg = 'BUILDING' AND bal > 10 AND k IN (1, 2, 3)"
    assert bind_params("SELECT * FROM @tab WHERE a = @field",
                       {"tab": {"identifier": "orders"}}) == \
        "SELECT * FROM orders WHERE a = @field"
    assert bind_params("x = @quote", {"quote": "O'Brien"}) == "x = 'O''Brien'"

    out = tmp_path / "seg"
    run_config({
        "processType": "etl",
        "params": {"seg": "BUILDING", "minBal": 9000},
        "etlConfiguration": [{
            "srcConf": {"tableName": "customer", "sfDir": SF,
                        "extraConditionForExtract":
                            "c_mktsegment = @seg AND c_acctbal > @minBal"},
            "dstConf": [{"tableName": "seg", "outDir": str(out), "mapping": [
                {"srcField": "c_custkey", "dstField": "id"},
                {"srcField": "c_mktsegment", "dstField": "seg"},
            ]}],
        }],
    })
    got = pq.read_table(str(out)).to_pandas()
    con = duckdb.connect()
    n = con.sql(f"""SELECT count(*) FROM read_parquet('{SF}/customer.parquet')
        WHERE c_mktsegment = 'BUILDING' AND c_acctbal > 9000""").fetchone()[0]
    assert len(got) == n > 0 and (got["seg"] == "BUILDING").all()


def test_self_join_extra_condition(ray_session):
    # joinExtraCondition constrains the aux side (ON ... AND cond), with a
    # @param binding; left join null-fills non-matching aux rows
    src = {
        "sfDir": SF, "tableName": "orders",
        "columns": ["o_orderkey", "o_custkey"],
        "selfJoinTables": [{
            "tableName": "customer", "joinType": "left",
            "columns": ["c_custkey", "c_mktsegment"],
            "joinExtraCondition": "c_mktsegment = @seg",
            "joinFields": [{"srcField": "o_custkey", "dstField": "c_custkey"}],
        }],
    }
    got = compile_extract(src, {"seg": "BUILDING"}).to_pandas()
    con = duckdb.connect()
    want = con.sql(f"""
        SELECT o.o_orderkey, o.o_custkey, c.c_mktsegment
        FROM read_parquet('{SF}/orders.parquet') o
        LEFT JOIN read_parquet('{SF}/customer.parquet') c
          ON c.c_custkey = o.o_custkey AND c.c_mktsegment = 'BUILDING'
        """).df()
    got = got.sort_values("o_orderkey").reset_index(drop=True)[want.columns.tolist()]
    want = want.sort_values("o_orderkey").reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    assert got["c_mktsegment"].isna().any()  # some orders miss the segment


def test_export_partition_by_resumable(tmp_path):
    """dstConf.partitionBy routes through the resumable hive-partitioned
    sink; a re-run of the same config skips finished partitions."""
    import os

    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    cfg = {
        "processType": "etl",
        "etlConfiguration": [{
            "srcConf": {
                "tableName": "nation",
                "sfDir": "/root/testdata/sf0.001",
                "columns": ["n_nationkey", "n_name", "n_regionkey"],
            },
            "dstConf": [{
                "tableName": "nation_by_region",
                "mapping": [
                    {"srcField": "n_nationkey", "dstField": "nation_id"},
                    {"srcField": "n_name", "dstField": "name"},
                    {"srcField": "n_regionkey", "dstField": "region_id"},
                ],
                "dstType": "parquet",
                "partitionBy": "region_id",
                "outDir": str(tmp_path / "nat"),
            }],
        }],
    }
    run_config(cfg)
    out = str(tmp_path / "nat")
    parts = sorted(d for d in os.listdir(out) if d.startswith("region_id="))
    assert parts == [f"region_id={i}" for i in range(5)]
    assert all(os.path.exists(os.path.join(out, p, "_FINISHED")) for p in parts)
    n1 = len(rd.read_parquet(out).to_pandas())
    assert n1 == 25
    run_config(cfg)  # idempotent re-run: markers make every partition skip
    assert len(rd.read_parquet(out).to_pandas()) == 25


def custom_upper_name_processor(ds, dst):
    """Test fixture for the processorFullClassName analogue: replaces the
    mapping dataflow with a custom one (uppercase names, keep two cols)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def fn(t: pa.Table) -> pa.Table:
        return pa.table({"nation_id": t["n_nationkey"],
                         "name": pc.utf8_upper(t["n_name"])})
    return ds.map_batches(fn, batch_format="pyarrow")


def test_processor_replaces_mapping(tmp_path, ray_session):
    """item.processor = 'module:callable' substitutes the whole dataflow
    (reference processorFullClassName, EtlOperationConfig.java:65-67)."""
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    out = str(tmp_path / "nat_proc")
    run_config({
        "processType": "etl",
        "etlConfiguration": [{
            "srcConf": {"tableName": "nation",
                        "sfDir": "/root/testdata/sf0.001"},
            "processor": "tests.test_config_vocabulary:"
                         "custom_upper_name_processor",
            "dstConf": [{"tableName": "nation_proc", "outDir": out}],
        }],
    })
    got = rd.read_parquet(out).to_pandas().sort_values("nation_id")
    assert len(got) == 25
    assert set(got.columns) == {"nation_id", "name"}
    assert (got["name"] == got["name"].str.upper()).all()


def test_source_folders_duplicate_origin_rejected(tmp_path, ray_session):
    import json

    import pytest

    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    d = tmp_path / "exp"
    d.mkdir()
    (d / "a.json").write_text(json.dumps({"k": 1}) + "\n")
    with pytest.raises(ValueError, match="duplicate appOriginCode"):
        run_config({"processType": "DB_QUICK_LOAD", "etlConfiguration": [{
            "srcConf": {"sourceFolders": [
                {"appOriginCode": "x", "importDir": str(d)},
                {"appOriginCode": "x", "importDir": str(d)}],
                "format": "json"},
            "dstConf": [{"stageDir": str(tmp_path / "stage")}],
        }]})


def test_source_folders_bare_dirs_tag_basename(tmp_path, ray_session):
    import json

    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    for site, key in (("siteA", 1), ("siteB", 2)):
        d = tmp_path / site
        d.mkdir()
        (d / "rows.json").write_text(json.dumps({"id": key}) + "\n")
    stage = str(tmp_path / "stage")
    run_config({"processType": "DB_QUICK_LOAD", "etlConfiguration": [{
        "srcConf": {"sourceFolders": [str(tmp_path / "siteA"),
                                      str(tmp_path / "siteB")],
                    "format": "json"},
        "dstConf": [{"stageDir": stage}],
    }]})
    got = rd.read_parquet(stage).to_pandas() \
        .sort_values("id").reset_index(drop=True)
    assert got["recordOriginLocationCode"].tolist() == ["siteA", "siteB"]
    assert got["id"].tolist() == [1, 2]


def test_re_sync_unsupported_no_more(ray_session):
    """DB_RE_SYNC dispatches (was the one missing processType string)."""
    import pytest

    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    # a malformed re-sync config should fail on ITS OWN contract (missing
    # srcConf keys), not on 'unsupported processType'
    with pytest.raises(KeyError):
        run_config({"processType": "DB_RE_SYNC",
                    "etlConfiguration": [{"srcConf": {}, "dstConf": [{}]}]})


def test_re_sync_auto_window_incremental(tmp_path, ray_session):
    """DB_RE_SYNC since='auto': the window advances from the persisted
    last_until (the reference's ProcessInfo re-run lifecycle); each window
    outranks the previous in the LWW merge; re-running the same window is
    a no-op (commit-log watermark)."""
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.config import run_config
    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake

    mon_dir = tmp_path / "mon"
    mon_dir.mkdir()
    ts = pd.to_datetime(["2024-01-05", "2024-02-05", "2024-03-05"])
    pq.write_table(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "created": pa.array(ts.astype("datetime64[us]")),
        "changed": pa.array(ts.astype("datetime64[us]")),
        "v": ["a1", "b1", "c1"],
    }), str(mon_dir / "items.parquet"))
    lake = str(tmp_path / "lake")

    def window(until):
        run_config({"processType": "DB_RE_SYNC", "etlConfiguration": [{
            "srcConf": {"sfDir": str(mon_dir), "tableName": "items",
                        "createdColumn": "created",
                        "changedColumn": "changed",
                        "since": "auto", "until": until},
            "dstConf": [{"lakeRoot": lake, "keyCols": ["k"],
                         "uniqueKeys": [["k"]], "numBuckets": 4}],
        }]})
        df = read_lake(lake).to_pandas()
        return sorted(df["k"].tolist())

    assert window("2024-02-01") == [1]          # first window: row 1 only
    assert window("2024-03-01") == [1, 2]       # advances: row 2 joins
    assert window("2024-03-01") == [1, 2]       # same window: no-op
    assert window("2024-04-01") == [1, 2, 3]


def test_generic_process_requires_processor(tmp_path, ray_session):
    """GENERIC_PROCESS dispatches (the reference's problems-solver process)
    and enforces its one contract: every item names a processor."""
    import pytest
    import ray.data as rd

    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    item = {
        "srcConf": {"tableName": "nation", "sfDir": "/root/testdata/sf0.001"},
        "dstConf": [{"tableName": "nation_gp",
                     "outDir": str(tmp_path / "gp")}],
    }
    with pytest.raises(ValueError, match="GENERIC_PROCESS items"):
        run_config({"processType": "GENERIC_PROCESS",
                    "etlConfiguration": [dict(item)]})
    item["processor"] = ("tests.test_config_vocabulary:"
                         "custom_upper_name_processor")
    out = run_config({"processType": "GENERIC_PROCESS",
                      "etlConfiguration": [item]})
    assert rd.read_parquet(out["nation_gp"]).count() == 25
