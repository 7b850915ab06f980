"""Local stand-in for the driver's correctness gate: run each queries() entry
and its oracle_sql() side-by-side, compare row-count + sorted-column value
hash. Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""
from __future__ import annotations

import sys
import warnings
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))
warnings.filterwarnings("ignore")


def to_pandas(res):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd
    if isinstance(res, rd.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    if isinstance(res, dict):
        return pd.DataFrame({k: [v] for k, v in res.items()})
    return res


def canon(df):
    import pandas as pd
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    import duckdb
    import pandas as pd
    import ray

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod
    qs, sqls = entrymod.queries(), entrymod.oracle_sql()

    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            mine = canon(to_pandas(fn(sf_dir)))
        except Exception as e:
            print(f"FAIL  {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            continue
        dt = time.time() - t0
        if name not in sqls:
            print(f"rows  {name}: {len(mine)} rows (rows-only) [{dt:.1f}s]")
            continue
        try:
            oracle = canon(con.sql(sqls[name]).df())
        except Exception as e:
            print(f"FAIL  {name}: oracle SQL raised {e}")
            failures.append(name)
            continue
        ok_rows = len(mine) == len(oracle)
        ok_cols = list(mine.columns) == list(oracle.columns)
        ok_vals = False
        if ok_rows and ok_cols:
            try:
                pd.testing.assert_frame_equal(
                    mine.astype(object).where(mine.notna(), None),
                    oracle.astype(object).where(oracle.notna(), None),
                    check_dtype=False, check_exact=False, rtol=1e-9, atol=1e-9)
                ok_vals = True
            except AssertionError as e:
                ok_vals = False
                err = str(e).splitlines()[0]
        if ok_rows and ok_cols and ok_vals:
            print(f"PASS  {name}: {len(mine)} rows [{dt:.1f}s]")
        else:
            print(f"FAIL  {name}: rows {len(mine)}/{len(oracle)} cols {list(mine.columns)} vs {list(oracle.columns)}"
                  + ("" if ok_rows and ok_cols else "") )
            if ok_rows and ok_cols:
                print("      value mismatch:", err)
                print("      mine:", mine.head(3).to_dict("records"))
                print("      oracle:", oracle.head(3).to_dict("records"))
            failures.append(name)

    print("\n", len(failures), "failures:", failures)
    ray.shutdown()
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
