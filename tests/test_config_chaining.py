"""Process chaining + finalizer + @field query datasource (§2.10 / J3) —
the config-runner parity surface: childConfigFilePath chaining
(controller/ProcessStarter.java:133-172), nested child items
(conf/EtlOperationConfig.java:490-499), finalizer hook
(controller/ProcessController.java:629-649), parameterized query
datasources (conf/QueryDataSourceConfig.java:339-350)."""
import json

import duckdb
import pytest

from openmrs_module_epts_etl_ray.pipelines.config import run_config

SF = "/root/testdata/sf0.001"

def record_finalizer(outputs):
    # write a marker next to the first output dir (importlib may load this
    # module as a separate instance, so in-memory state can't be asserted)
    import os
    first = next(iter(outputs.values()))
    with open(os.path.join(os.path.dirname(first), "_finalized.json"), "w") as fh:
        json.dump(outputs, fh)


def _item(table, out_dir, mapping, **src_extra):
    return {
        "srcConf": {"tableName": table, "sfDir": SF, **src_extra},
        "dstConf": [{"tableName": f"{table}_out", "mapping": mapping,
                     "dstType": "parquet", "outDir": str(out_dir)}],
    }


def test_child_config_chaining_and_finalizer(ray_session, tmp_path):
    child_cfg = {
        "processType": "etl",
        "etlConfiguration": [
            _item("nation", tmp_path / "nation",
                  [{"srcField": "n_nationkey", "dstField": "nation_id"},
                   {"srcField": "n_name", "dstField": "name"}])],
    }
    child_path = tmp_path / "child.json"
    child_path.write_text(json.dumps(child_cfg))

    parent_cfg = {
        "processType": "etl",
        "etlConfiguration": [
            _item("region", tmp_path / "region",
                  [{"srcField": "r_regionkey", "dstField": "region_id"}])],
        "finalizer": "tests.test_config_chaining:record_finalizer",
        "childConfigFilePath": str(child_path),
    }
    outs = run_config(parent_cfg)
    # both processes ran, child after parent
    assert set(outs) == {"region_out", "nation_out"}
    # finalizer saw ONLY the parent's outputs (onFinish runs before chaining)
    marker = json.loads((tmp_path / "_finalized.json").read_text())
    assert marker == {"region_out": str(tmp_path / "region")}
    con = duckdb.connect()
    n = con.sql(f"SELECT count(*) FROM read_parquet('{tmp_path}/nation/*.parquet')").fetchone()[0]
    assert n == 25


def test_child_config_cycle_rejected(ray_session, tmp_path):
    p = tmp_path / "self.json"
    cfg = {"processType": "etl", "etlConfiguration": [],
           "childConfigFilePath": str(p)}
    p.write_text(json.dumps(cfg))
    with pytest.raises(ValueError, match="cycle"):
        run_config(str(p))


def test_nested_child_item_runs_after_parent(ray_session, tmp_path):
    cfg = {
        "processType": "etl",
        "etlConfiguration": [{
            **_item("region", tmp_path / "r",
                    [{"srcField": "r_regionkey", "dstField": "region_id"}]),
            "child": _item("nation", tmp_path / "n",
                           [{"srcField": "n_nationkey", "dstField": "nation_id"}]),
        }],
    }
    outs = run_config(cfg)
    assert set(outs) == {"region_out", "nation_out"}


def test_query_datasource_in_config(ray_session, tmp_path):
    cfg = {
        "processType": "etl",
        "etlConfiguration": [
            _item("customer", tmp_path / "c",
                  [{"srcField": "c_custkey", "dstField": "customer_id"},
                   {"srcField": "best_order_id", "dstField": "best_order_id"}],
                  columns=["c_custkey", "c_name"],
                  extraQueryDataSource=[{
                      "name": "best_order",
                      "query": ("SELECT o_orderkey AS best_order_id "
                                "FROM orders WHERE o_custkey = @c_custkey "
                                "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1"),
                  }])],
    }
    outs = run_config(cfg)
    con = duckdb.connect()
    got = con.sql(
        f"SELECT customer_id, best_order_id FROM read_parquet('{tmp_path}/c/*.parquet') "
        f"ORDER BY customer_id").df()
    want = con.sql(f"""
        SELECT c.c_custkey AS customer_id, b.best_order_id
        FROM read_parquet('{SF}/customer.parquet') c LEFT JOIN (
          SELECT o_custkey, o_orderkey AS best_order_id,
                 row_number() OVER (PARTITION BY o_custkey
                                    ORDER BY o_totalprice DESC, o_orderkey) rn
          FROM read_parquet('{SF}/orders.parquet')) b
          ON b.o_custkey = c.c_custkey AND b.rn = 1
        ORDER BY customer_id""").df()
    import pandas as pd
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def test_process_type_quick_merge(ray_session, tmp_path):
    import duckdb as _dd

    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake

    lake = str(tmp_path / "lake")
    cfg = {
        "processType": "DB_QUICK_MERGE_WITH_DATABASE_GENERATION",
        "etlConfiguration": [{
            "srcConf": {"tableName": "nation", "sfDir": SF,
                        "columns": ["n_nationkey", "n_name"]},
            "dstConf": [{"tableName": "nation_lake", "lakeRoot": lake,
                         "keyCols": ["n_nationkey"],
                         "uniqueKeys": [["n_name"]], "numBuckets": 4}],
        }],
    }
    outs = run_config(cfg)
    assert outs == {"nation_lake": lake}
    got = read_lake(lake).to_pandas()
    assert len(got) == 25 and got["n_name"].is_unique


def test_process_type_detect_gaps(ray_session, tmp_path):
    out = str(tmp_path / "gaps")
    cfg = {
        "processType": "DETECT_GAPES_ON_DB_TABLES",
        "etlConfiguration": [{
            "srcConf": {"tableName": "events", "sfDir": SF,
                        "idColumn": "event_id",
                        "extraConditionForExtract": "event_type <> 'click'",
                        "outDir": out}}],
    }
    outs = run_config(cfg)
    con = duckdb.connect()
    got = con.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    want = con.sql(f"""
        WITH ids AS (SELECT event_id FROM read_parquet('{SF}/events.parquet')
                     WHERE event_type <> 'click'),
        s AS (SELECT event_id, lead(event_id) OVER (ORDER BY event_id) AS nxt FROM ids)
        SELECT count(*) FROM s WHERE nxt > event_id + 1""").fetchone()[0]
    assert got == want and got > 0


def test_process_type_inconsistency_check(ray_session, tmp_path):
    out = str(tmp_path / "check")
    cfg = {
        "processType": "DB_INCONSISTENCY_CHECK",
        "etlConfiguration": [{
            "srcConf": {"tableName": "orders", "sfDir": SF,
                        "columns": ["o_orderkey", "o_custkey"],
                        "fkColumn": "o_custkey",
                        "parentTable": "customer",
                        "parentKeyColumn": "c_custkey",
                        "onMissing": "null", "outDir": out}}],
    }
    run_config(cfg)
    con = duckdb.connect()
    n = con.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
    want = con.sql(f"SELECT count(*) FROM read_parquet('{SF}/orders.parquet')").fetchone()[0]
    assert n == want  # FK-consistent source: nothing repaired, nothing lost


def test_process_type_reconciliation(ray_session, tmp_path):
    out = str(tmp_path / "rec")
    cfg = {
        "processType": "DATA_RECONCILIATION",
        "etlConfiguration": [{
            "srcConf": {"tableName": "customer", "sfDir": SF,
                        "dstTableName": "customer",
                        "keyCols": ["c_custkey"],
                        "compareCols": ["c_name"], "outDir": out}}],
    }
    run_config(cfg)
    import glob
    files = glob.glob(f"{out}/*.parquet")
    con = duckdb.connect()
    n = (con.sql(f"SELECT count(*) FROM read_parquet('{out}/*.parquet')").fetchone()[0]
         if files else 0)
    assert n == 0  # identical tables reconcile clean


def test_process_type_source_sync(ray_session, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake

    events = pa.table({
        "lsn": pa.array([1, 2, 3], "int64"),
        "op": ["insert", "insert", "update"],
        "repo": ["r", "r", "r"], "path": ["a", "b", "a"],
        "commit": ["c1", "c2", "c3"],
        "lang": ["py", "py", "py"],
        "content": ["x", "y", "x2"],
    })
    evdir = tmp_path / "events"
    evdir.mkdir()
    pq.write_table(events, str(evdir / "part0.parquet"))
    lake = str(tmp_path / "lake")
    cfg = {
        "processType": "SOURCE_SYNC",
        "etlConfiguration": [{
            "srcConf": {"eventsPath": str(evdir)},
            "dstConf": [{"lakeRoot": lake, "numBuckets": 2,
                         "keyCols": ["repo", "path"]}],
        }],
    }
    outs = run_config(cfg)
    got = read_lake(lake).to_pandas().set_index("path")
    assert outs == {"lake": lake}
    assert got.loc["a", "content"] == "x2" and got.loc["b", "content"] == "y"
