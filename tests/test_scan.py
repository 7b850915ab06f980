"""Distributed prefix scan (stages/scan.py::running_max)."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from openmrs_module_epts_etl_ray.stages.scan import running_max


def test_running_max_matches_sequential(ray_session):
    rng = np.random.default_rng(3)
    n = 5000
    order = rng.permutation(n).astype("int64")          # dense but shuffled
    vals = rng.integers(0, 1_000_000, n).astype("int64")
    ds = rd.from_arrow(pa.table({"o": order, "v": vals})).repartition(8)
    got = running_max(ds, ["o"], "v", out_col="rm", num_buckets=7) \
        .to_pandas().sort_values("o").reset_index(drop=True)
    want = pd.DataFrame({"o": np.sort(order)})
    seq = pd.DataFrame({"o": order, "v": vals}).sort_values("o")
    want["rm"] = np.maximum.accumulate(seq["v"].to_numpy())
    assert (got["rm"].to_numpy() == want["rm"].to_numpy()).all()


def test_running_max_timestamps_with_ties(ray_session):
    # tie on the primary order column broken by the second; carry crosses
    # every bucket boundary (monotonically decreasing values never update)
    o = np.array([1, 1, 2, 3, 4, 5, 6, 7], dtype="int64")
    tb = np.array([1, 0, 0, 0, 0, 0, 0, 0], dtype="int64")
    ts = pd.to_datetime([
        "2024-01-05", "2024-01-09", "2024-01-02", "2024-01-01",
        "2024-01-03", "2024-01-02", "2024-01-01", "2024-01-04"])
    ds = rd.from_arrow(pa.table({
        "o": o, "tb": tb,
        "ts": pa.array(ts.astype("datetime64[us]"))})).repartition(3)
    got = running_max(ds, ["o", "tb"], "ts", out_col="wm", num_buckets=4) \
        .to_pandas().sort_values(["o", "tb"]).reset_index(drop=True)
    # sequential truth over (o, tb) order: (1,0)='01-09' sorts FIRST (the
    # tie-break) and dominates every subsequent row
    assert got["wm"].dt.strftime("%Y-%m-%d").tolist() == ["2024-01-09"] * 8
    assert got.loc[0, "tb"] == 0 and got.loc[1, "tb"] == 1


def test_grouped_topk_high_cardinality(ray_session):
    # per-key top-k with thousands of keys: the coarse-bucket exchange must
    # produce exactly the pandas truth (deterministic tie-break)
    from openmrs_module_epts_etl_ray.stages.windows import grouped_topk

    rng = np.random.default_rng(9)
    n = 20000
    df = pd.DataFrame({
        "k": rng.integers(0, 3000, n).astype("int64"),
        "v": rng.integers(0, 50, n).astype("int64"),   # many ties
        "id": np.arange(n, dtype="int64"),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(8)
    got = grouped_topk(ds, ["k"], "v", 2, tiebreak_cols=["id"]) \
        .to_pandas().sort_values(["k", "id"]).reset_index(drop=True)
    want = (df.sort_values(["v", "id"], ascending=[False, True], kind="stable")
            .groupby("k", as_index=False, sort=False).head(2)
            .sort_values(["k", "id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(got[["k", "v", "id"]], want[["k", "v", "id"]])


def test_hll_within_tolerance_and_merge_invariant(ray_session):
    from openmrs_module_epts_etl_ray.stages.cardinality import (
        _estimate, _registers, approx_distinct,
    )

    rng = np.random.default_rng(5)
    # accuracy: standard error ~1.04/sqrt(4096) ≈ 1.6%; assert 5%
    for true_n in (500, 20_000, 300_000):
        vals = rng.integers(0, 10**12, true_n).astype("int64")
        distinct = len(np.unique(vals))
        est = _estimate(_registers(vals))
        assert abs(est - distinct) / distinct < 0.05, (true_n, est, distinct)

    # mergeability: union of split sketches == sketch of the union
    vals = rng.integers(0, 10**9, 50_000).astype("int64")
    whole = _registers(vals)
    merged = np.maximum(_registers(vals[:20_000]), _registers(vals[20_000:]))
    assert (whole == merged).all()

    # grouped dataset path agrees with exact within tolerance
    df = pd.DataFrame({
        "k": rng.integers(0, 3, 30_000).astype("int64"),
        "v": rng.integers(0, 5_000, 30_000).astype("int64"),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(6)
    got = approx_distinct(ds, ["k"], "v", out_col="n").to_pandas() \
        .set_index("k")["n"]
    for k, sub in df.groupby("k"):
        exact = sub["v"].nunique()
        assert abs(got[k] - exact) / exact < 0.05


def test_profile_approx_distinct_tolerance(ray_session):
    from openmrs_module_epts_etl_ray.stages.profile import profile_table

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "a": rng.integers(0, 4000, 20000).astype("int64"),
        "b": rng.choice(["x", "y", "z", None], 20000),
    })
    ds = rd.from_arrow(pa.Table.from_pandas(df)).repartition(5)
    prof = profile_table(ds).to_pandas().set_index("column")
    assert prof.loc["a", "n_rows"] == 20000 and prof.loc["a", "n_nulls"] == 0
    assert prof.loc["b", "n_nulls"] == int(df["b"].isna().sum())
    exact = df["a"].nunique()
    assert abs(prof.loc["a", "approx_distinct"] - exact) / exact < 0.05
    assert prof.loc["b", "approx_distinct"] == 3  # tiny cardinality is exact-ish


def test_pack_sequences_concat_then_chunk(ray_session):
    # zero-token docs, a doc spanning a pack boundary, and a doc longer
    # than a whole pack; compare against the sequential definition
    from openmrs_module_epts_etl_ray.stages.packing import pack_sequences

    rng = np.random.default_rng(11)
    n, cap = 3000, 64
    ids = rng.permutation(n).astype("int64")
    toks = rng.integers(0, 30, n).astype("int64")
    toks[::97] = 0            # empties
    toks[::151] = 200         # longer than a pack
    ds = rd.from_arrow(pa.table({"doc_id": ids, "n_tokens": toks})) \
        .repartition(8)
    got = pack_sequences(ds, order_cols=["doc_id"], token_col="n_tokens",
                         capacity=cap, num_buckets=7) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    seq = pd.DataFrame({"doc_id": ids, "n_tokens": toks}) \
        .sort_values("doc_id").reset_index(drop=True)
    start = seq["n_tokens"].cumsum().to_numpy() - seq["n_tokens"].to_numpy()
    assert (got["pack_id"].to_numpy() == start // cap).all()
    assert (got["pack_offset"].to_numpy() == start % cap).all()
    # a zero-token doc never advances the cursor: same pack/offset as the
    # doc that follows it in order
    z = np.flatnonzero(seq["n_tokens"].to_numpy() == 0)
    z = z[z < n - 1]
    nxt_start = start[z + 1]
    assert (start[z] + seq["n_tokens"].to_numpy()[z] == nxt_start).all()


def test_running_max_timestamp_axis():
    import numpy as np
    import pandas as pd
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages.scan import running_max

    rng = np.random.default_rng(3)
    df = pd.DataFrame({
        "ts": pd.date_range("2024-01-01", periods=500, freq="37min"),
        "v": rng.integers(0, 1000, 500),
    }).sample(frac=1, random_state=1)  # arrival order shuffled
    out = running_max(rd.from_pandas(df), ["ts"], "v", out_col="m") \
        .to_pandas().sort_values("ts")
    want = df.sort_values("ts")["v"].cummax().to_numpy()
    assert (out["m"].to_numpy() == want).all()


def test_running_sum_nulls_negatives_vs_duckdb(ray_session):
    # SQL window-SUM parity: nulls are skipped (a null-value row still gets
    # the running sum of prior non-nulls; NULL only before the first
    # non-null), negatives fold exactly, and the result is invariant to
    # block count (the driver's gate runs at whatever split it likes)
    import duckdb

    rng = np.random.default_rng(7)
    n = 4000
    order = rng.permutation(n).astype("int64")
    vals = rng.integers(-10_000, 10_000, n).astype("float64")
    vals[rng.random(n) < 0.15] = np.nan
    # from_pandas=True maps NaN -> arrow null (a plain pa.array keeps NaN)
    t = pa.table({"o": order,
                  "v": pa.array(vals, from_pandas=True)})
    want = duckdb.connect().execute("""
        SELECT o, CAST(SUM(CAST(v AS BIGINT))
               OVER (ORDER BY o ROWS BETWEEN UNBOUNDED PRECEDING
                     AND CURRENT ROW) AS BIGINT) AS rs
        FROM t ORDER BY o""").fetch_arrow_table()
    from openmrs_module_epts_etl_ray.stages.scan import running_sum
    for blocks in (1, 3, 16):
        ds = rd.from_arrow(t).repartition(blocks).map_batches(
            lambda b: b.set_column(
                b.schema.get_field_index("v"), "v",
                b["v"].cast(pa.int64())),
            batch_format="pyarrow")
        got = running_sum(ds, ["o"], "v", out_col="rs") \
            .to_pandas().sort_values("o").reset_index(drop=True)
        gv = pa.array(got["rs"], from_pandas=True)
        assert gv.equals(want["rs"].combine_chunks()), blocks


def test_running_sum_all_null_prefix(ray_session):
    # rows before the first non-null are NULL; an entirely-null bucket
    # still forwards its carry-in
    from openmrs_module_epts_etl_ray.stages.scan import running_sum

    o = np.arange(12, dtype="int64")
    v = pa.array([None, None, 5, None, 2, None, None, None, 1, None, 3, None],
                 type=pa.int64())
    ds = rd.from_arrow(pa.table({"o": o, "v": v})).repartition(4)
    got = running_sum(ds, ["o"], "v", out_col="rs", num_buckets=6) \
        .to_pandas().sort_values("o")["rs"]
    want = [None, None, 5, 5, 7, 7, 7, 7, 8, 8, 11, 11]
    assert [None if pd.isna(x) else int(x) for x in got] == want


def test_running_max_null_values(ray_session):
    from openmrs_module_epts_etl_ray.stages.scan import running_max

    o = np.arange(10, dtype="int64")
    v = pa.array([None, 4, None, 9, None, 2, None, None, 11, None],
                 type=pa.int64())
    ds = rd.from_arrow(pa.table({"o": o, "v": v})).repartition(3)
    got = running_max(ds, ["o"], "v", out_col="rm", num_buckets=5) \
        .to_pandas().sort_values("o")["rm"]
    want = [None, 4, 4, 9, 9, 9, 9, 9, 11, 11]
    assert [None if pd.isna(x) else int(x) for x in got] == want


def test_running_scan_null_order_raises(ray_session):
    import pytest

    from openmrs_module_epts_etl_ray.stages.scan import running_sum

    ds = rd.from_arrow(pa.table({
        "o": pa.array([1, None, 3], type=pa.int64()),
        "v": pa.array([1, 2, 3], type=pa.int64())}))
    with pytest.raises(Exception, match="order column"):
        running_sum(ds, ["o"], "v").materialize()


def test_running_scan_all_null_order_raises(ray_session):
    import pytest

    from openmrs_module_epts_etl_ray.stages.scan import running_sum

    ds = rd.from_arrow(pa.table({
        "o": pa.array([None, None], type=pa.int64()),
        "v": pa.array([1, 2], type=pa.int64())}))
    with pytest.raises(Exception, match="order column"):
        running_sum(ds, ["o"], "v").materialize()
    # truly empty input still keeps the schema contract (0 rows, no raise)
    empty = rd.from_arrow(pa.table({
        "o": pa.array([], type=pa.int64()),
        "v": pa.array([], type=pa.int64())}))
    assert running_sum(empty, ["o"], "v").count() == 0


def test_running_sum_quantile_balance_skewed_axis(ray_session):
    """balance='quantile' on a heavily skewed order axis returns exactly
    the sequential truth (bucket boundaries change balance, never the
    result), including heavy duplicate values sitting ON a boundary."""
    rng = np.random.default_rng(13)
    n = 6000
    # lognormal-ish skew + a mega-duplicate order value
    order = np.unique((rng.lognormal(0, 2.5, n * 2) * 1000).astype("int64"))
    order = order[:n]
    order = np.concatenate([order, np.full(500, order[len(order) // 2])])
    rng.shuffle(order)
    vals = rng.integers(-100, 100, len(order)).astype("int64")
    tb = np.arange(len(order), dtype="int64")   # unique tie-break
    ds = rd.from_arrow(pa.table({"o": order, "tb": tb, "v": vals})) \
        .repartition(8)

    from openmrs_module_epts_etl_ray.stages.scan import running_sum
    seq = pd.DataFrame({"o": order, "tb": tb, "v": vals}) \
        .sort_values(["o", "tb"], kind="stable")
    want = seq["v"].cumsum().to_numpy()
    for bal in ("range", "quantile"):
        got = running_sum(ds, ["o", "tb"], "v", out_col="rs",
                          num_buckets=7, balance=bal) \
            .to_pandas().sort_values(["o", "tb"]).reset_index(drop=True)
        assert (got["rs"].to_numpy() == want).all(), bal


def test_running_max_quantile_balance_with_nulls(ray_session):
    """running_max's carry/null_fill path under quantile bucketing: a
    sampled boundary can open a bucket on an all-null run; the carry-in
    must fill those rows, matching the SQL running MAX."""
    rng = np.random.default_rng(17)
    n = 3000
    order = np.unique((rng.lognormal(0, 2.0, n * 2) * 100).astype("int64"))[:n]
    rng.shuffle(order)
    vals = rng.integers(0, 10**6, len(order)).astype("float64")
    vals[rng.random(len(order)) < 0.3] = np.nan
    t = pa.table({"o": order,
                  "v": pa.array(vals, from_pandas=True)})
    ds = rd.from_arrow(t).repartition(6).map_batches(
        lambda b: b.set_column(b.schema.get_field_index("v"), "v",
                               b["v"].cast(pa.int64())),
        batch_format="pyarrow")
    from openmrs_module_epts_etl_ray.stages.scan import running_max
    got = running_max(ds, ["o"], "v", out_col="rm", num_buckets=9,
                      balance="quantile") \
        .to_pandas().sort_values("o").reset_index(drop=True)
    seq = pd.DataFrame({"o": order, "v": vals}).sort_values("o")
    # pandas cummax leaves NaN AT null slots; SQL's running MAX carries
    # the previous max through them — forward-fill to get SQL semantics
    want = seq["v"].cummax().ffill().to_numpy()
    wn = pd.isna(want)
    gn = got["rm"].isna().to_numpy()
    assert (wn == gn).all()
    assert (got["rm"].to_numpy()[~gn] == want[~wn]).all()


def test_running_scan_vanishing_bucket_raises(ray_session):
    # A nondeterministic upstream whose pass-B execution drops an ENTIRE
    # bucket produces no pass-B group for it; the per-bucket sentinel
    # rows guarantee the group still exists, so the pass-A/pass-B count
    # cross-check fires instead of later buckets silently carrying the
    # phantom fold. Rows 252-314 cover exactly bucket 4 of 16 over
    # 0..999 (width 63), so half the executions lose the whole bucket.
    import pyarrow.compute as pc
    import pytest
    from openmrs_module_epts_etl_ray.stages.scan import running_sum

    df = pd.DataFrame({"k": np.arange(1000, dtype="int64"),
                       "v": np.arange(1000, dtype="float64")})

    def flaky(t: pa.Table) -> pa.Table:
        import os
        import time as _t
        if (os.getpid() + int(_t.time() * 1e6)) % 2:
            return t.filter(pc.or_(pc.less(t["k"], 252),
                                   pc.greater(t["k"], 314)))
        return t

    ds = rd.from_pandas(df).repartition(4).map_batches(
        flaky, batch_format="pyarrow")
    caught = False
    for _ in range(10):
        try:
            running_sum(ds, ["k"], "v", num_buckets=16).to_pandas()
        except Exception as e:
            assert "not a deterministic" in str(e) or \
                "not deterministic" in str(e)
            caught = True
            break
    assert caught, "vanishing-bucket nondeterminism was never detected"


def test_running_scan_passthrough_columns_survive(ray_session):
    # extra columns (incl. strings) ride through the sentinel union and
    # the bucket groupby untouched
    from openmrs_module_epts_etl_ray.stages.scan import running_sum

    df = pd.DataFrame({"k": np.arange(200, dtype="int64"),
                       "v": [None if i % 7 == 0 else float(i)
                             for i in range(200)],
                       "name": [f"n{i}" for i in range(200)]})
    out = running_sum(rd.from_pandas(df).repartition(4), ["k"], "v",
                      num_buckets=8).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["name"].equals(df["name"])
    exp = df["v"].fillna(0).cumsum().where(df["v"].notna().cumsum() > 0)
    assert np.allclose(out["running_sum"].fillna(-1), exp.fillna(-1))
