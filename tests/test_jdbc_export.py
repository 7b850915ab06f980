"""The JDBC-migration recipe is executable, not just prose: run
examples/jdbc_export.py (stdlib sqlite3 standing in for the live DB) and
push its output through the reference §3.2 file-based sync lifecycle —
LOAD the export into a stage area, DB_MERGE_FROM_JSON into a lake — then
compare the lake against the database itself."""
import json
import os
import sqlite3
import subprocess
import sys
from pathlib import Path

import ray.data as rd

REPO = Path(__file__).resolve().parent.parent
SCRIPT = REPO / "examples" / "jdbc_export.py"


def _run(args):
    out = subprocess.run([sys.executable, str(SCRIPT), *args],
                         capture_output=True, text=True, check=True,
                         cwd=str(REPO))
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_sfdir_layout_paged_parquet(tmp_path):
    """--layout sfdir writes <table>.parquet with one row group per page
    (the interval-paged read made visible in the file layout)."""
    import pyarrow.parquet as pq

    db = tmp_path / "site.db"
    out = tmp_path / "sfdir"
    stats = _run(["--seed-demo", "--db", str(db), "--out", str(out),
                  "--layout", "sfdir", "--page-size", "200"])
    (tstat,) = stats["tables"]
    assert tstat["rows"] == 500 and tstat["pages"] == 3
    pf = pq.ParquetFile(out / "customer.parquet")
    assert pf.metadata.num_row_groups == 3
    assert pf.metadata.num_rows == 500


def test_export_layout_load_merge_lifecycle(tmp_path, ray_session):
    """Export → LOAD → DB_MERGE_FROM_JSON: the lake ends bit-equal to the
    source database (reference lifecycle §3.2)."""
    from openmrs_module_epts_etl_ray.pipelines.config import run_config
    from openmrs_module_epts_etl_ray.pipelines.replay import read_lake

    db = tmp_path / "site.db"
    exp = tmp_path / "export"
    _run(["--seed-demo", "--db", str(db), "--out", str(exp),
          "--layout", "export", "--page-size", "128"])
    # page files are JSON-lines with .json extension — the read_export shape
    pagefiles = sorted(os.listdir(exp / "customer"))
    assert pagefiles[0] == "page-000000.json" and len(pagefiles) == 4

    stage = tmp_path / "stage"
    lake = tmp_path / "lake"
    run_config({
        "processType": "DB_QUICK_LOAD",
        "etlConfiguration": [{
            "srcConf": {"importDir": str(exp / "customer"),
                        "format": "json"},
            "dstConf": [{"stageDir": str(stage)}],
        }],
    })
    run_config({
        "processType": "DB_MERGE_FROM_JSON",
        "etlConfiguration": [{
            "srcConf": {"stageDir": str(stage), "lsn": 1},
            "dstConf": [{
                "lakeRoot": str(lake),
                "keyCols": ["customer_id"],
                "uniqueKeys": [["customer_id"]],
                "numBuckets": 8,
                "onConflict": "lwwLsn",
            }],
        }],
    })
    got = read_lake(str(lake)).to_pandas()
    want = dict(sqlite3.connect(db).execute(
        "SELECT customer_id, balance_cents FROM customer"))
    assert len(got) == 500
    assert dict(zip(got["customer_id"], got["balance_cents"])) == want
    names = dict(sqlite3.connect(db).execute(
        "SELECT customer_id, name FROM customer"))
    assert dict(zip(got["customer_id"], got["name"])) == names


def test_all_null_first_page_schema_is_stable(tmp_path):
    """Per-page schema inference would pin the ParquetWriter to page 1's
    types — an all-NULL first page used to infer ``null`` and crash on
    page 2. The declared-type schema makes every page cast identically."""
    import pyarrow.parquet as pq

    db = tmp_path / "drift.db"
    conn = sqlite3.connect(db)
    with conn:
        conn.execute("CREATE TABLE t (id INTEGER PRIMARY KEY, name TEXT)")
        conn.executemany("INSERT INTO t VALUES (?,?)",
                         [(i, None) for i in range(1, 201)] +
                         [(i, f"n{i}") for i in range(201, 401)])
    conn.close()
    out = tmp_path / "sfdir"
    stats = _run(["--db", str(db), "--out", str(out),
                  "--layout", "sfdir", "--page-size", "200"])
    (tstat,) = stats["tables"]
    assert tstat["rows"] == 400 and tstat["pages"] == 2
    t = pq.read_table(out / "t.parquet")
    assert t.schema.field("name").type == "string"
    assert t["name"].null_count == 200


def test_rowid_paging_axis_not_exported(tmp_path):
    """Tables without a single INTEGER PRIMARY KEY page on sqlite's
    implicit rowid; the paging axis must NOT leak into the export (the
    lake would otherwise gain a _rowid column the source doesn't have)."""
    import pyarrow.parquet as pq

    db = tmp_path / "composite.db"
    conn = sqlite3.connect(db)
    with conn:
        conn.execute("CREATE TABLE pair (a TEXT, b TEXT, v INTEGER, "
                     "PRIMARY KEY (a, b))")
        conn.executemany("INSERT INTO pair VALUES (?,?,?)",
                         [(f"a{i}", f"b{i}", i) for i in range(300)])
    conn.close()
    out = tmp_path / "sfdir"
    stats = _run(["--db", str(db), "--out", str(out),
                  "--layout", "sfdir", "--page-size", "100"])
    (tstat,) = stats["tables"]
    assert tstat["rows"] == 300 and tstat["pages"] == 3
    t = pq.read_table(out / "pair.parquet")
    assert t.column_names == ["a", "b", "v"]
    assert sorted(t["v"].to_pylist()) == list(range(300))
