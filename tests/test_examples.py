"""The example configs under examples/ must actually run verbatim —
they are the reference user's porting templates, not decoration. Each
test stages the inputs the example expects (under /tmp/etl_out, the
paths the JSON files name), runs the file through run_config, and
checks the output."""
import json
import os
import shutil
from pathlib import Path

import pyarrow as pa
import ray.data as rd

EXAMPLES = Path(__file__).resolve().parent.parent / "examples"


def test_example_custom_processor(ray_session):
    shutil.rmtree("/tmp/etl_out/customer_masked", ignore_errors=True)
    from openmrs_module_epts_etl_ray.pipelines.config import run_config

    out = run_config(str(EXAMPLES / "etl_custom_processor.json"))
    df = rd.read_parquet(out["customer_masked"]).to_pandas()
    assert len(df) == 150
    assert df["c_name"].str.endswith("****").all()


def test_example_re_sync(ray_session):
    for d in ("/tmp/etl_out/resync_detected", "/tmp/etl_out/resync_lake"):
        shutil.rmtree(d, ignore_errors=True)
    from openmrs_module_epts_etl_ray.pipelines.config import run_config
    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake

    out = run_config(str(EXAMPLES / "re_sync.json"))
    lake = out["orders"]
    n = read_lake(lake).count()
    assert n > 0
    # the audit export exists and matches the merged row count
    audit = rd.read_parquet("/tmp/etl_out/resync_detected").count()
    assert audit == n


def test_example_multi_origin_chain(ray_session):
    """multi_origin_load_merge.json chains into its child merge config via
    childConfigFilePath (resolved beside the parent)."""
    for d in ("/tmp/etl_out/export_siteA", "/tmp/etl_out/export_siteB",
              "/tmp/etl_out/stage_multi_origin",
              "/tmp/etl_out/lake_multi_origin"):
        shutil.rmtree(d, ignore_errors=True)
    from openmrs_module_epts_etl_ray.pipelines.config import run_config
    from openmrs_module_epts_etl_ray.pipelines.export import export_files
    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake
    from openmrs_module_epts_etl_ray.sources.tables import read_table

    cust = read_table("/root/testdata/sf0.001", "customer",
                      columns=["c_custkey", "c_name"])
    export_files(cust.map_batches(
        lambda t: t.filter(pa.compute.less(t["c_custkey"], 100)),
        batch_format="pyarrow"), "/tmp/etl_out/export_siteA", fmt="json")
    export_files(cust.map_batches(
        lambda t: t.filter(pa.compute.greater_equal(t["c_custkey"], 50)),
        batch_format="pyarrow"), "/tmp/etl_out/export_siteB", fmt="json")

    out = run_config(str(EXAMPLES / "multi_origin_load_merge.json"))
    lake = out["lake"]
    df = read_lake(lake).to_pandas()
    # overlap keys 50..99 exist once per origin; others once
    assert len(df) == 100 + 100
    per_origin = df.groupby("recordOriginLocationCode")["c_custkey"].count()
    assert per_origin["siteA"] == 100 and per_origin["siteB"] == 100
