"""Relational operator stages: joins, detectors, gaps, transforms."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

from openmrs_module_epts_etl_ray.stages import detectors, joins
from openmrs_module_epts_etl_ray.stages.gap_detect import detect_gaps
from openmrs_module_epts_etl_ray.stages.transforms import (
    FieldMapping, RecordTransform, apply_transform, filter_expr,
)


def test_semi_anti_join_broadcast():
    left = rd.from_arrow(pa.table({"k": [1, 2, 3, 4], "v": list("abcd")}))
    right = rd.from_arrow(pa.table({"k": [2, 4, 9]}))
    semi = joins.semi_join(left, right, ["k"]).to_pandas().sort_values("k")
    anti = joins.anti_join(left, right, ["k"]).to_pandas().sort_values("k")
    assert semi["k"].tolist() == [2, 4]
    assert anti["k"].tolist() == [1, 3]


def test_semi_join_composite_key():
    left = rd.from_arrow(pa.table({"a": ["x", "x", "y"], "b": [1, 2, 1], "v": [10, 20, 30]}))
    right = rd.from_arrow(pa.table({"a": ["x", "y"], "b": [2, 9]}))
    out = joins.semi_join(left, right, ["a", "b"]).to_pandas()
    assert out["v"].tolist() == [20]


def test_inner_and_left_join():
    left = rd.from_arrow(pa.table({"k": [1, 2, 3], "l": ["a", "b", "c"]}))
    right = rd.from_arrow(pa.table({"k": [2, 3], "r": ["B", "C"]}))
    inner = joins.inner_join(left, right, ["k"], num_partitions=2).to_pandas().sort_values("k")
    assert inner["r"].tolist() == ["B", "C"]
    outer = joins.left_join(left, right, ["k"], num_partitions=2).to_pandas().sort_values("k")
    assert len(outer) == 3
    assert outer[outer.k == 1]["r"].isna().all()


def test_reconcile_classifies():
    src = rd.from_arrow(pa.table({"k": [1, 2, 3], "v": [10.0, 20.0, 30.0]}))
    dst = rd.from_arrow(pa.table({"k": [2, 3, 4], "v": [20.0, 31.0, 40.0]}))
    out = detectors.reconcile(src, dst, ["k"], ["v"]).to_pandas()
    got = dict(zip(out["k"], out["reason"]))
    assert got == {1: "missing", 3: "outdated", 4: "phantom"}


def test_detect_changed_records():
    import datetime
    ds = rd.from_arrow(pa.table({
        "ts": pa.array([datetime.datetime(2024, 1, i) for i in (1, 10, 20)],
                       pa.timestamp("us")),
        "v": [1, 2, 3]}))
    out = detectors.detect_changed_records(ds, "ts", datetime.datetime(2024, 1, 5),
                                           until=datetime.datetime(2024, 1, 15)).to_pandas()
    assert out["v"].tolist() == [2]


def test_detect_gaps_simple():
    ds = rd.from_arrow(pa.table({"id": pa.array([1, 2, 5, 6, 9], pa.int64())}))
    out = detect_gaps(ds, "id", range_size=4).to_pandas().sort_values("gap_start")
    assert list(map(tuple, out.to_numpy())) == [(3, 4), (7, 8)]


def test_detect_gaps_whole_range_missing():
    ds = rd.from_arrow(pa.table({"id": pa.array([1, 21], pa.int64())}))
    out = detect_gaps(ds, "id", range_size=5).to_pandas().sort_values("gap_start")
    # everything between 2 and 20 missing, spanning wholly-empty ranges
    got = []
    for r in out.itertuples():
        got.extend(range(r.gap_start, r.gap_end + 1))
    assert got == list(range(2, 21))


def test_detect_gaps_dense_no_gaps():
    ds = rd.from_arrow(pa.table({"id": pa.array(list(range(50)), pa.int64())}))
    out = detect_gaps(ds, "id", range_size=16).to_pandas()
    assert len(out) == 0


def test_record_transform_mappings():
    t = pa.table({"a": [1, 2], "b": ["x", "y"], "keep": [9, 8]})
    tr = RecordTransform(mappings=[
        FieldMapping("id", src_field="a", dtype=pa.int64()),
        FieldMapping("tag", src_value="T"),
        FieldMapping("none_col", map_to_null=True),
        FieldMapping("upper_b", src_field="b", transformer=pc.utf8_upper),
    ], auto_fields=["keep"])
    out = tr(t)
    assert out.column_names == ["id", "tag", "none_col", "upper_b", "keep"]
    assert out["tag"].to_pylist() == ["T", "T"]
    assert out["none_col"].to_pylist() == [None, None]
    assert out["upper_b"].to_pylist() == ["X", "Y"]
    assert out["keep"].to_pylist() == [9, 8]


def test_record_transformer_hook():
    tr = RecordTransform(
        mappings=[FieldMapping("x", src_field="a")],
        record_transformer=lambda t: t.append_column(
            "x2", pc.multiply(t["x"], 2)))
    out = tr(pa.table({"a": [3]}))
    assert out["x2"].to_pylist() == [6]


def test_filter_expr():
    ds = rd.from_arrow(pa.table({"v": [1, 5, 10]}))
    out = filter_expr(ds, lambda t: pc.greater(t["v"], 4)).to_pandas()
    assert out["v"].tolist() == [5, 10]
