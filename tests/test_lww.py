import pyarrow as pa
import ray.data as rd

from openmrs_module_epts_etl_ray.stages.lww import (
    PartialLww, lww_final_state, lww_reduce_table,
)


def ev(rows):
    cols = {"lsn": [], "op": [], "repo": [], "path": [], "content": []}
    for lsn, op, repo, path, content in rows:
        cols["lsn"].append(lsn); cols["op"].append(op)
        cols["repo"].append(repo); cols["path"].append(path)
        cols["content"].append(content)
    return pa.table({"lsn": pa.array(cols["lsn"], pa.int64()),
                     "op": cols["op"], "repo": cols["repo"],
                     "path": cols["path"], "content": cols["content"]})


def test_lww_reduce_picks_max_lsn():
    t = ev([(1, "insert", "r", "a", "v1"), (3, "update", "r", "a", "v3"),
            (2, "update", "r", "a", "v2")])
    out = lww_reduce_table(t)
    assert len(out) == 1
    assert out["lsn"][0].as_py() == 3
    assert out["content"][0].as_py() == "v3"


def test_lww_reduce_collapses_equal_lsn_duplicates():
    t = ev([(5, "insert", "r", "a", "x"), (5, "insert", "r", "a", "x")])
    out = lww_reduce_table(t)
    assert len(out) == 1


def test_lww_reduce_multiple_keys():
    t = ev([(1, "insert", "r", "a", "a1"), (2, "insert", "r", "b", "b1"),
            (9, "update", "r", "b", "b9")])
    out = lww_reduce_table(t).sort_by("path")
    assert out["content"].to_pylist() == ["a1", "b9"]


def test_partial_lww_adds_bucket_and_counts():
    t = ev([(1, "insert", "r", "a", "x"), (2, "update", "r", "a", "y")])
    out = PartialLww(num_buckets=8)(t)
    assert "_bucket" in out.column_names
    assert out["_n_events"].to_pylist() == [2]


def test_lww_final_state_dataset_generic_key():
    t = pa.table({"k": [1, 1, 2], "v": ["a", "b", "c"],
                  "seq": pa.array([10, 20, 5], pa.int64())})
    out = lww_final_state(rd.from_arrow(t), key_cols=("k",), lsn_col="seq",
                          num_buckets=4).to_pandas().sort_values("k")
    assert out["v"].tolist() == ["b", "c"]


def test_lww_final_state_drops_deleted():
    t = ev([(1, "insert", "r", "a", "x"), (2, "delete", "r", "a", None),
            (1, "insert", "r", "b", "keep")])
    out = lww_final_state(rd.from_arrow(t), num_buckets=4).to_pandas()
    assert out["path"].tolist() == ["b"]


def test_lww_select_wide_lsn_span_fallback():
    """LSN span too wide for the int64 composite => lexsort fallback path."""
    import numpy as np

    from openmrs_module_epts_etl_ray.stages.lww import lww_reduce_table
    t = pa.table({
        "lsn": pa.array([0, 2**62, 5, 2**62 + 1], pa.int64()),
        "op": ["insert", "update", "insert", "update"],
        "repo": ["r", "r", "r", "r"],
        "path": ["a", "a", "b", "b"],
        "commit": ["c"] * 4, "lang": ["py"] * 4,
        "content": ["a0", "a1", "b0", "b1"],
    })
    out = lww_reduce_table(t).to_pydict()
    got = dict(zip(out["path"], out["content"]))
    assert got == {"a": "a1", "b": "b1"}
