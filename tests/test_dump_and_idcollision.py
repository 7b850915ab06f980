"""SQL-dump sink (S6 dstType=dump), D3 config-distinct guard, and D2
id-collision re-pointing with child-FK rewrites."""
import os

import duckdb
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from openmrs_module_epts_etl_ray.pipelines.export import export_dump
from openmrs_module_epts_etl_ray.stages.id_collision import resolve_id_collisions
from openmrs_module_epts_etl_ray.stages.lookup import remap_fk

SF = "/root/testdata/sf0.001"


def test_sql_dump_executes_to_identical_table(ray_session, tmp_path):
    out = str(tmp_path / "dump")
    cust = rd.read_parquet(f"{SF}/customer.parquet").select_columns(
        ["c_custkey", "c_name", "c_acctbal", "c_mktsegment"])
    manifest = export_dump(cust, out, "customer_dump")
    assert len(manifest) >= 1

    con = duckdb.connect()
    con.sql(f"CREATE TABLE customer_dump AS SELECT c_custkey, c_name, "
            f"c_acctbal, c_mktsegment FROM read_parquet('{SF}/customer.parquet') LIMIT 0")
    for f in sorted(os.listdir(out)):
        if f.endswith(".sql"):
            con.sql(open(os.path.join(out, f)).read())
    got = con.sql("SELECT * FROM customer_dump ORDER BY c_custkey").df()
    want = con.sql(f"SELECT c_custkey, c_name, c_acctbal, c_mktsegment "
                   f"FROM read_parquet('{SF}/customer.parquet') "
                   f"ORDER BY c_custkey").df()
    pd.testing.assert_frame_equal(got, want)


def test_dump_escapes_quotes_and_nulls(ray_session, tmp_path):
    out = str(tmp_path / "dump")
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "txt": pa.array(["it's a 'test'", None])})
    export_dump(rd.from_arrow(t), out, "weird")
    con = duckdb.connect()
    con.sql("CREATE TABLE weird (id BIGINT, txt VARCHAR)")
    for f in sorted(os.listdir(out)):
        if f.endswith(".sql"):
            con.sql(open(os.path.join(out, f)).read())
    got = con.sql("SELECT * FROM weird ORDER BY id").df()
    assert got["txt"].tolist()[0] == "it's a 'test'"
    assert pd.isna(got["txt"].tolist()[1])


def test_config_rejects_duplicate_dst(ray_session, tmp_path):
    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    item = {
        "srcConf": {"tableName": "region", "sfDir": SF},
        "dstConf": [
            {"tableName": "dup", "mapping": [
                {"srcField": "r_regionkey", "dstField": "k"}],
             "outDir": str(tmp_path / "a")},
            {"tableName": "dup", "mapping": [
                {"srcField": "r_regionkey", "dstField": "k"}],
             "outDir": str(tmp_path / "b")},
        ],
    }
    with pytest.raises(ValueError, match="duplicate dstConf"):
        run_config({"processType": "etl", "etlConfiguration": [item]})


def test_id_collision_repoints_children(ray_session):
    existing = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "uuid": ["u1", "u2", "u3"]}))
    # id 1 contested by a DIFFERENT entity; uuid u3 arrives under new id 30
    incoming = rd.from_arrow(pa.table({
        "id": pa.array([1, 30], pa.int64()),
        "uuid": ["u1x", "u3"]}))
    merged, remap = resolve_id_collisions(existing, incoming,
                                          id_col="id", uuid_col="uuid")
    got = merged.to_pandas().sort_values("id").reset_index(drop=True)
    # existing id 1 moved to max(3)+1 = 4; u3's old row (id 3) dropped
    assert list(zip(got["id"], got["uuid"])) == [
        (1, "u1x"), (2, "u2"), (4, "u1"), (30, "u3")]
    rm = remap.to_pandas().sort_values("old_id")
    assert list(zip(rm["old_id"], rm["new_id"])) == [(1, 4), (3, 30)]

    children = rd.from_arrow(pa.table({
        "child_id": pa.array([10, 11, 12], pa.int64()),
        "parent_id": pa.array([1, 3, 2], pa.int64())}))
    fixed = remap_fk(children, remap, "parent_id",
                     old_col="old_id", new_col="new_id",
                     on_missing="keep").to_pandas().sort_values("child_id")
    assert fixed["parent_id"].tolist() == [4, 30, 2]
