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
    # existing id 1 moved past BOTH sides' ids: max(existing ∪ incoming)=30,
    # so it lands on 31 (max(existing)+1 = 4 would be free, but the rule must
    # clear incoming ids too — an incoming id above max(existing) would
    # otherwise collide with a relocated row); u3's old row (id 3) dropped
    assert list(zip(got["id"], got["uuid"])) == [
        (1, "u1x"), (2, "u2"), (30, "u3"), (31, "u1")]
    rm = remap.to_pandas().sort_values("old_id")
    assert list(zip(rm["old_id"], rm["new_id"])) == [(1, 31), (3, 30)]

    children = rd.from_arrow(pa.table({
        "child_id": pa.array([10, 11, 12], pa.int64()),
        "parent_id": pa.array([1, 3, 2], pa.int64())}))
    fixed = remap_fk(children, remap, "parent_id",
                     old_col="old_id", new_col="new_id",
                     on_missing="keep").to_pandas().sort_values("child_id")
    assert fixed["parent_id"].tolist() == [31, 30, 2]


def test_id_collision_free_ids_clear_incoming_ids(ray_session):
    # regression: incoming id above max(existing) must not be handed out as
    # a "free" id for a relocated row (existing {1,2,3}, incoming {1, 4})
    existing = rd.from_arrow(pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "uuid": ["u1", "u2", "u3"]}))
    incoming = rd.from_arrow(pa.table({
        "id": pa.array([1, 4], pa.int64()),
        "uuid": ["u1x", "u4"]}))
    merged, remap = resolve_id_collisions(existing, incoming,
                                          id_col="id", uuid_col="uuid")
    got = merged.to_pandas()
    assert got["id"].is_unique
    rm = remap.to_pandas()
    assert list(zip(rm["old_id"], rm["new_id"])) == [(1, 5)]


def test_lookup_dup_keys_same_rows_broadcast_vs_shuffle(ray_session, monkeypatch):
    # a lookup with duplicate keys must emit IDENTICAL rows on the broadcast
    # and the shuffle path (one deterministic winner per key on both)
    from openmrs_module_epts_etl_ray.stages import joins, lookup

    src = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": ["a", "b", "c", "d"]}))
    lk = rd.from_arrow(pa.table({
        "lk_k": pa.array([1, 1, 2, 2, 3], pa.int64()),
        "name": ["z1", "a1", "b2", "b2x", "c3"]}))

    def run():
        out = lookup.datasource_lookup(src, lk, [("k", "lk_k")],
                                       columns=["name"])
        return (out.to_pandas().sort_values(["k"]).reset_index(drop=True)
                [["k", "v", "name"]])

    bcast = run()
    monkeypatch.setattr(joins, "BROADCAST_THRESHOLD", 0)
    shuf = run()
    pd.testing.assert_frame_equal(bcast, shuf)
    # deterministic winner = lexicographic-min non-key row
    assert bcast.loc[bcast["k"] == 1, "name"].item() == "a1"
    assert bcast.loc[bcast["k"] == 2, "name"].item() == "b2"


def test_remap_fk_dup_mapping_same_rows_broadcast_vs_shuffle(ray_session, monkeypatch):
    from openmrs_module_epts_etl_ray.stages import joins, lookup

    rows = rd.from_arrow(pa.table({
        "child": pa.array([10, 11], pa.int64()),
        "fk": pa.array([1, 9], pa.int64())}))
    mapping = rd.from_arrow(pa.table({
        "old": pa.array([1, 1], pa.int64()),
        "new": pa.array([7, 5], pa.int64())}))

    def run():
        out = lookup.remap_fk(rows, mapping, "fk", old_col="old",
                              new_col="new", on_missing="keep")
        return out.to_pandas().sort_values("child").reset_index(drop=True)

    bcast = run()
    monkeypatch.setattr(joins, "BROADCAST_THRESHOLD", 0)
    shuf = run()
    pd.testing.assert_frame_equal(
        bcast.astype({"fk": "int64"}), shuf.astype({"fk": "int64"}))
    assert bcast["fk"].tolist() == [5, 9]  # min new_col wins, miss keeps


def test_broadcast_inner_join_matches_shuffle(ray_session, monkeypatch):
    from openmrs_module_epts_etl_ray.stages import joins

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 2, 3, 4], pa.int64()),
        "v": ["a", "b", "c", "d", "e"]}))
    # duplicate right keys: multiplicity must be PRESERVED (1:N fan-out),
    # unlike datasource_lookup's one-row-per-key contract
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 3], pa.int64()),
        "name": ["x", "y", "z"]}))

    def run():
        out = joins.broadcast_inner_join(left, right, ["k"], right_on=("rk",))
        return (out.to_pandas().sort_values(["k", "v", "name"])
                .reset_index(drop=True)[["k", "v", "name"]])

    bcast = run()
    assert len(bcast) == 5  # 2 left rows x 2 right + 1x1
    monkeypatch.setattr(joins, "BROADCAST_THRESHOLD", 0)
    shuf = run()
    pd.testing.assert_frame_equal(bcast, shuf.astype(bcast.dtypes.to_dict()))


def test_id_collision_driver_size_guard(ray_session):
    """The metadata-scale contract is ENFORCED: a fact-table misuse raises
    with a pointer to the distributed path instead of OOMing the driver."""
    import pyarrow as pa
    import pytest
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages.id_collision import (
        resolve_id_collisions,
    )

    ex = rd.from_arrow(pa.table({"id": [1, 2], "uuid": ["a", "b"]}))
    inc = rd.from_arrow(pa.table({"id": [2, 3], "uuid": ["c", "d"]}))
    with pytest.raises(ValueError, match="METADATA-scale"):
        resolve_id_collisions(ex, inc, id_col="id", uuid_col="uuid",
                              max_driver_rows=3)
    merged, remap = resolve_id_collisions(ex, inc, id_col="id",
                                          uuid_col="uuid", max_driver_rows=10)
    assert merged.count() == 4 and remap.count() == 1
