"""Driver-contract smoke: entry() runs, queries() are callable, every oracle
key exists in queries()."""
import importlib
import sys


def _entry_module():
    if "__ray_entry__" in sys.modules:
        return sys.modules["__ray_entry__"]
    return importlib.import_module("__ray_entry__")


def test_entry_runs_and_returns_rows():
    e = _entry_module()
    res = e.entry()
    import ray.data as rd
    assert isinstance(res, rd.Dataset)
    assert res.count() > 0
    assert "content_sha" in res.schema().names


def test_oracle_keys_subset_of_queries():
    e = _entry_module()
    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls) <= set(qs)
    assert len(qs) >= 20


def test_sample_query_runs():
    e = _entry_module()
    out = e.queries()["top_orders"]("/root/testdata/sf0.001")
    df = out.to_pandas()
    assert len(df) == 10
