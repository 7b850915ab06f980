"""FIXTURES F4: payload schema evolution through the replay pipeline."""
import pyarrow as pa
import ray.data as rd

from openmrs_module_epts_etl_ray.pipelines.replay import read_lake, replay
from openmrs_module_epts_etl_ray.stages.schema_evolution import (
    NormalizeBatch, rename_columns, unify_and_backfill,
)


def test_unify_and_backfill_superset_order():
    a = pa.table({"x": [1], "y": ["a"]})
    b = pa.table({"y": ["b"], "z": [1.5]})
    ua, ub = unify_and_backfill([a, b])
    assert ua.column_names == ["x", "y", "z"] == ub.column_names
    assert ub["x"][0].as_py() is None
    assert ua["z"][0].as_py() is None


def test_unify_promotes_types():
    a = pa.table({"x": pa.array([1], pa.int32())})
    b = pa.table({"x": pa.array([2**40], pa.int64())})
    ua, ub = unify_and_backfill([a, b])
    assert ua.schema.field("x").type == pa.int64()


def test_rename_columns():
    t = pa.table({"language": ["py"], "content": ["x"]})
    out = rename_columns(t, {"language": "lang"})
    assert out.column_names == ["lang", "content"]


def test_normalize_batch_conforms_target():
    target = pa.schema([("a", pa.int64()), ("b", pa.string())])
    out = NormalizeBatch(renames={"bb": "b"}, target=target)(
        pa.table({"bb": ["v"]}))
    assert out.schema == target
    assert out["a"][0].as_py() is None


def test_epochs_through_replay(tmp_lake):
    """Epoch 1: base columns; epoch 2 adds size_bytes; epoch 3 renames
    lang -> language upstream (normalized back before replay). Final lake
    schema is the unified superset with null backfill."""
    base = dict(op=["insert"], repo=["r"], commit=["c"], lang=["py"])
    e1 = pa.table({**base, "lsn": pa.array([1], pa.int64()),
                   "path": ["a"], "content": ["v1"]})
    e2 = pa.table({**base, "lsn": pa.array([2], pa.int64()),
                   "path": ["b"], "content": ["v2"],
                   "size_bytes": pa.array([42], pa.int64())})
    e3 = pa.table({"op": ["insert"], "repo": ["r"], "commit": ["c"],
                   "language": ["go"], "lsn": pa.array([3], pa.int64()),
                   "path": ["c"], "content": ["v3"],
                   "size_bytes": pa.array([7], pa.int64())})
    target = pa.schema([("lsn", pa.int64()), ("op", pa.string()),
                        ("repo", pa.string()), ("path", pa.string()),
                        ("commit", pa.string()), ("lang", pa.string()),
                        ("content", pa.string()), ("size_bytes", pa.int64())])
    norm = NormalizeBatch(renames={"language": "lang"}, target=target)
    events = rd.from_arrow(e1).union(rd.from_arrow(e2)).union(rd.from_arrow(e3)) \
        .map_batches(norm, batch_format="pyarrow")
    replay(events, tmp_lake, num_buckets=4).materialize()
    df = read_lake(tmp_lake).to_pandas().set_index("path").sort_index()
    assert set(df.columns) >= {"lsn", "repo", "commit", "lang", "content",
                               "content_sha", "size_bytes"}
    assert df.loc["a", "size_bytes"] != df.loc["a", "size_bytes"] or \
        df.loc["a", "size_bytes"] is None  # null-backfilled
    assert df.loc["b", "size_bytes"] == 42
    assert df.loc["c", "lang"] == "go"
