"""Round-3 history/analytics batch: SCD2 intervals, time travel, funnel,
retention cohorts, grouped correlation, int-domain order stat, NTILE."""
import datetime

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


def _ts(day, hour=0):
    return datetime.datetime(2024, 1, day, hour)


# ---------------------------------------------------------------------------
# scd2_history
# ---------------------------------------------------------------------------

def _events():
    # key a: insert(1) update(3) update(7)           -> open history
    # key b: insert(2) delete(5)                     -> closed, no current
    # key c: insert(4)                               -> single open version
    return pd.DataFrame({
        "k": ["a", "a", "b", "c", "b", "a"],
        "lsn": [1, 3, 2, 4, 5, 7],
        "op": ["insert", "update", "insert", "insert", "delete", "update"],
        "payload": ["a1", "a3", "b2", "c4", None, "a7"],
    })


def test_scd2_intervals():
    from openmrs_module_epts_etl_ray.stages.history import scd2_history

    ds = rd.from_pandas(_events()).repartition(3)
    out = scd2_history(ds, ("k",), "lsn").to_pandas() \
        .sort_values(["k", "lsn"]).reset_index(drop=True)
    assert out["lsn"].tolist() == [1, 3, 7, 2, 4]
    vt = [None if pd.isna(x) else int(x) for x in out["valid_to"]]
    assert vt == [3, 7, None, 5, None]
    assert out["is_current"].tolist() == [False, False, True, False, True]
    # the delete event emits no row; b has no current version
    assert not ((out["k"] == "b") & out["is_current"]).any()


def test_scd2_partition_invariance():
    from openmrs_module_epts_etl_ray.stages.history import scd2_history

    ev = _events().sample(frac=1, random_state=7)
    a = scd2_history(rd.from_pandas(ev).repartition(1), ("k",), "lsn") \
        .to_pandas().sort_values(["k", "lsn"]).reset_index(drop=True)
    b = scd2_history(rd.from_pandas(ev).repartition(5), ("k",), "lsn",
                     num_buckets=3) \
        .to_pandas().sort_values(["k", "lsn"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)


# ---------------------------------------------------------------------------
# funnel_counts
# ---------------------------------------------------------------------------

def test_funnel_strict_order():
    from openmrs_module_epts_etl_ray.stages.history import funnel_counts

    ev = pd.DataFrame({
        # u1 converts fully; u2 clicks BEFORE viewing (not counted) and at
        # the same instant as the view (strictly-after ⇒ not counted);
        # u3 views only; u4 purchases without viewing (not in funnel)
        "u": [1, 1, 1, 2, 2, 2, 3, 4],
        "ts": [_ts(1), _ts(2), _ts(3),
               _ts(1), _ts(2), _ts(2),
               _ts(5), _ts(6)],
        "t": ["view", "click", "purchase",
              "click", "view", "click",
              "view", "purchase"],
    })
    out = funnel_counts(rd.from_pandas(ev).repartition(3),
                        key_col="u", ts_col="ts", type_col="t",
                        steps=["view", "click", "purchase"]) \
        .to_pandas().sort_values("step")
    assert out["n_users"].tolist() == [3, 1, 1]


# ---------------------------------------------------------------------------
# retention_cohorts
# ---------------------------------------------------------------------------

def test_retention_cohorts():
    from openmrs_module_epts_etl_ray.stages.history import retention_cohorts

    ev = pd.DataFrame({
        "u": [1, 1, 1, 2, 2, 3],
        # u1 active weeks w, w+1; u2 active w+1 only (twice, counts once);
        # u3 active w
        "ts": [_ts(1), _ts(2), _ts(9), _ts(8), _ts(10), _ts(3)],
    })
    out = retention_cohorts(rd.from_pandas(ev).repartition(2),
                            key_col="u", ts_col="ts") \
        .to_pandas().sort_values(["cohort", "offset"]).reset_index(drop=True)
    got = {(r.cohort, r.offset): r.n_users for r in out.itertuples()}
    base = min(c for c, _ in got)
    assert got == {(base, 0): 2, (base, 1): 1, (base + 1, 0): 1}


# ---------------------------------------------------------------------------
# grouped_corr
# ---------------------------------------------------------------------------

def test_grouped_corr_matches_numpy():
    from openmrs_module_epts_etl_ray.stages.stats import grouped_corr

    rng = np.random.default_rng(3)
    n = 4000
    df = pd.DataFrame({
        "g": rng.integers(0, 4, n),
        "x": rng.integers(0, 50, n),
        "y": rng.integers(0, 11, n),
    })
    # make one group perfectly correlated and one constant-x
    df.loc[df["g"] == 2, "y"] = df.loc[df["g"] == 2, "x"] * 2 + 1
    df.loc[df["g"] == 3, "x"] = 7

    out = grouped_corr(rd.from_pandas(df).repartition(6), ["g"], "x", "y") \
        .to_pandas().set_index("g").sort_index()
    for g, sub in df.groupby("g"):
        if sub["x"].nunique() == 1:
            assert pd.isna(out.loc[g, "corr_e9"])
            assert pd.isna(out.loc[g, "slope_e9"])
            continue
        want = np.corrcoef(sub["x"], sub["y"])[0, 1]
        got = out.loc[g, "corr_e9"] / 1e9
        assert abs(got - want) < 2e-9
        slope = np.polyfit(sub["x"], sub["y"], 1)[0]
        assert abs(out.loc[g, "slope_e9"] / 1e9 - slope) < 1e-6
    # perfect linear group: corr = 1.0 up to the sqrt rounding of the
    # fixed double expression (floor then lands on 1e9 or 1e9-1)
    assert out.loc[2, "corr_e9"] in (10 ** 9, 10 ** 9 - 1)


def test_grouped_corr_partition_invariance():
    from openmrs_module_epts_etl_ray.stages.stats import grouped_corr

    rng = np.random.default_rng(11)
    df = pd.DataFrame({
        "g": rng.integers(0, 3, 1000),
        "x": rng.integers(-20, 20, 1000),
        "y": rng.integers(-5, 6, 1000),
    })
    outs = []
    for parts in (1, 7):
        outs.append(
            grouped_corr(rd.from_pandas(df).repartition(parts),
                         ["g"], "x", "y")
            .to_pandas().sort_values("g").reset_index(drop=True))
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# exact_order_stat_int / ntile_assign
# ---------------------------------------------------------------------------

def test_order_stat_int_matches_sort():
    from openmrs_module_epts_etl_ray.stages.selection import (
        exact_order_stat_int)

    rng = np.random.default_rng(5)
    v = rng.integers(-10**6, 10**6, 5000)
    ds = rd.from_pandas(pd.DataFrame({"v": v})).repartition(4).materialize()
    s = np.sort(v)
    for k in [0, 1, 999, 2500, 4999]:
        assert exact_order_stat_int(ds, "v", k) == s[k]


def test_order_stat_int_past_2_53():
    """Values beyond float53 must stay exact (the packed-key regime)."""
    from openmrs_module_epts_etl_ray.stages.selection import (
        exact_order_stat_int)

    base = 1 << 60
    v = np.array([base + 3, base + 1, base + 2, base, base + 4])
    ds = rd.from_pandas(pd.DataFrame({"v": v})).materialize()
    assert exact_order_stat_int(ds, "v", 2) == base + 2


def test_ntile_matches_duckdb():
    import duckdb

    from openmrs_module_epts_etl_ray.stages.selection import ntile_assign

    rng = np.random.default_rng(9)
    for n, k in [(17, 4), (100, 3), (5, 8), (64, 1)]:
        v = rng.permutation(np.arange(n) * 13 - 50)  # distinct, negatives
        df = pd.DataFrame({"v": v})
        got = ntile_assign(
            rd.from_pandas(df).repartition(3).materialize(), "v", k) \
            .to_pandas().sort_values("v").reset_index(drop=True)
        want = duckdb.sql(
            f"SELECT v, ntile({k}) OVER (ORDER BY v) AS tile FROM df "
            "ORDER BY v").df()
        assert got["tile"].tolist() == want["tile"].tolist(), (n, k)


# ---------------------------------------------------------------------------
# interval_overlap_join
# ---------------------------------------------------------------------------

def test_interval_overlap_matches_bruteforce():
    from openmrs_module_epts_etl_ray.stages.intervals import (
        interval_overlap_join)

    rng = np.random.default_rng(13)
    nl, nr = 300, 80
    ls = rng.integers(0, 1000, nl)
    rs = rng.integers(0, 1000, nr)
    l = pd.DataFrame({"lid": np.arange(nl), "s": ls,
                      "e": ls + rng.integers(0, 40, nl)})
    r = pd.DataFrame({"rid": np.arange(nr), "s": rs,
                      "e": rs + rng.integers(0, 60, nr)})
    want = {(a.lid, b.rid)
            for a in l.itertuples() for b in r.itertuples()
            if a.s <= b.e and b.s <= a.e}

    for w in (7, 32, 5000):  # cell smaller, comparable, larger than span
        out = interval_overlap_join(
            rd.from_pandas(l).repartition(3), rd.from_pandas(r).repartition(2),
            left_start="s", left_end="e", right_start="s", right_end="e",
            cell_width=w).to_pandas()
        got = list(zip(out["lid"], out["rid"]))
        assert len(got) == len(set(got)), f"duplicate pairs at w={w}"
        assert set(got) == want, f"pair set mismatch at w={w}"


def test_interval_overlap_bucket_post_and_empty():
    from openmrs_module_epts_etl_ray.stages.intervals import (
        interval_overlap_join)

    l = pd.DataFrame({"lid": [1, 2], "s": [0, 100], "e": [10, 110]})
    r = pd.DataFrame({"rid": [7], "s": [5], "e": [6]})
    out = interval_overlap_join(
        rd.from_pandas(l), rd.from_pandas(r),
        left_start="s", left_end="e", right_start="s", right_end="e",
        cell_width=8,
        bucket_post=lambda df: df.groupby("lid", as_index=False).size()) \
        .to_pandas()
    assert dict(zip(out["lid"], out["size"])) == {1: 1}


# ---------------------------------------------------------------------------
# mad_outliers
# ---------------------------------------------------------------------------

def test_mad_outliers_matches_bruteforce():
    from openmrs_module_epts_etl_ray.stages.stats import mad_outliers

    rng = np.random.default_rng(21)
    n = 2000
    df = pd.DataFrame({
        "rid": np.arange(n),
        "g": rng.integers(0, 3, n),
        "v": np.round(rng.normal(50, 5, n), 2),
    })
    spikes = rng.choice(n, 25, replace=False)
    df.loc[spikes, "v"] = 500.0

    out = mad_outliers(rd.from_pandas(df).repartition(5), ["g"], "v", k=5.0) \
        .to_pandas()

    def disc_med(v):
        v = np.sort(np.asarray(v, np.float64))
        return v[(len(v) - 1) // 2]

    want = set()
    for g, sub in df.groupby("g"):
        med = disc_med(sub["v"])
        mad = disc_med((sub["v"] - med).abs())
        want |= set(sub.loc[(sub["v"] - med).abs() > 5.0 * mad, "rid"])
    assert set(out["rid"]) == want
    assert set(df.loc[sorted(spikes), "rid"]) <= want


# ---------------------------------------------------------------------------
# grouped_shift / grouped_gini
# ---------------------------------------------------------------------------

def test_grouped_shift_matches_pandas():
    from openmrs_module_epts_etl_ray.stages.windows import grouped_shift

    rng = np.random.default_rng(17)
    n = 500
    df = pd.DataFrame({
        "k": rng.integers(0, 9, n),
        "o": rng.permutation(n),
        "v": rng.integers(-100, 100, n),
    })
    for p in (1, 3, -2):
        out = grouped_shift(rd.from_pandas(df).repartition(4),
                            key_cols=("k",), order_cols=["o"],
                            value_col="v", periods=p) \
            .to_pandas().sort_values(["k", "o"]).reset_index(drop=True)
        want = df.sort_values(["k", "o"]).reset_index(drop=True)
        want["lag"] = want.groupby("k")["v"].shift(p)
        got = [None if pd.isna(x) else int(x) for x in out["lag"]]
        exp = [None if pd.isna(x) else int(x) for x in want["lag"]]
        assert got == exp, f"periods={p}"


def test_grouped_shift_string_values():
    from openmrs_module_epts_etl_ray.stages.windows import grouped_shift

    df = pd.DataFrame({"k": [1, 1, 2], "o": [1, 2, 1],
                       "v": ["a", "b", "c"]})
    out = grouped_shift(rd.from_pandas(df), key_cols=("k",),
                        order_cols=["o"], value_col="v") \
        .to_pandas().sort_values(["k", "o"])
    assert out["lag"].tolist() == [None, "a", None]


def test_grouped_gini_known_values():
    from openmrs_module_epts_etl_ray.stages.stats import grouped_gini

    df = pd.DataFrame({
        "g": ["eq"] * 4 + ["tot"] * 4 + ["zero"] * 2,
        "v": [5, 5, 5, 5,          # perfect equality -> 0
              0, 0, 0, 100,        # one holder -> (n-1)/n = 0.75
              0, 0],               # zero total -> NULL
    })
    out = grouped_gini(rd.from_pandas(df).repartition(3), ["g"], "v") \
        .to_pandas().set_index("g")
    assert out.loc["eq", "gini_e9"] == 0
    assert out.loc["tot", "gini_e9"] == 750_000_000
    assert pd.isna(out.loc["zero", "gini_e9"])
    assert out["n"].tolist() == [4, 4, 2] or set(out["n"]) == {4, 2}


def test_grouped_gini_partition_invariance():
    from openmrs_module_epts_etl_ray.stages.stats import grouped_gini

    rng = np.random.default_rng(23)
    df = pd.DataFrame({
        "g": rng.integers(0, 5, 800),
        "v": rng.integers(0, 10**6, 800),
    })
    outs = [grouped_gini(rd.from_pandas(df).repartition(p), ["g"], "v")
            .to_pandas().sort_values("g").reset_index(drop=True)
            for p in (1, 6)]
    pd.testing.assert_frame_equal(outs[0], outs[1])


# ---------------------------------------------------------------------------
# pareto_skyline_2d
# ---------------------------------------------------------------------------

def test_pareto_skyline_matches_bruteforce():
    from openmrs_module_epts_etl_ray.stages.selection import pareto_skyline_2d

    rng = np.random.default_rng(31)
    n = 400
    df = pd.DataFrame({"x": rng.integers(0, 50, n),
                       "y": rng.integers(0, 50, n)})
    pts = set(zip(df["x"], df["y"]))
    want = {(x, y) for (x, y) in pts
            if not any((a <= x and b >= y and (a < x or b > y))
                       for (a, b) in pts)}
    out = pareto_skyline_2d(rd.from_pandas(df).repartition(5), "x", "y") \
        .to_pandas()
    got = set(zip(out["x"], out["y"]))
    assert got == want
    assert len(out) == len(got)  # no duplicate emission


# ---------------------------------------------------------------------------
# category_assoc
# ---------------------------------------------------------------------------

def test_category_assoc_matches_crosstab():
    from openmrs_module_epts_etl_ray.stages.stats import category_assoc

    rng = np.random.default_rng(41)
    n = 3000
    df = pd.DataFrame({
        "a": rng.choice(["p", "q", "r"], n, p=[0.5, 0.3, 0.2]),
        "b": rng.choice(["x", "y"], n, p=[0.6, 0.4]),
    })
    out = category_assoc(rd.from_pandas(df).repartition(4), "a", "b") \
        .to_pandas().set_index(["a", "b"]).sort_index()

    ct = pd.crosstab(df["a"], df["b"])
    tot = ct.to_numpy().sum()
    for (a, b), row in out.iterrows():
        obs = ct.loc[a, b]
        exp = float(ct.loc[a].sum()) * float(ct[b].sum()) / float(tot)
        assert row["n"] == obs
        assert abs(row["expected_e6"] / 1e6 - exp) < 2e-6
        want_contrib = (obs - exp) ** 2 / exp
        assert abs(row["contrib_e6"] / 1e6 - want_contrib) < 2e-6
    # total cell count covers the full population
    assert out["n"].sum() == n


# ---------------------------------------------------------------------------
# extract_json_fields
# ---------------------------------------------------------------------------

def test_extract_json_fields_flat():
    from openmrs_module_epts_etl_ray.stages.json_fields import (
        extract_json_fields)

    df = pd.DataFrame({
        "rid": [1, 2, 3, 4, 5],
        "doc": ['{"k": 87, "s": "ab"}', '{"k": -3.5}', None,
                '{"s": "x y"}', '{}'],
    })
    out = extract_json_fields(
        rd.from_pandas(df).repartition(2), "doc",
        {"k": pa.float64(), "s": pa.string()}) \
        .to_pandas().sort_values("rid")
    ks = [None if pd.isna(x) else x for x in out["k"]]
    assert ks == [87.0, -3.5, None, None, None]
    ss = [None if pd.isna(x) else x for x in out["s"]]
    assert ss == ["ab", None, None, "x y", None]
    assert "doc" not in out.columns  # json col dropped by default


def test_extract_json_fields_strict_escapes():
    from openmrs_module_epts_etl_ray.stages.json_fields import (
        extract_json_fields)

    df = pd.DataFrame({
        "rid": [1, 2],
        "doc": ['{"s": "plain"}', '{"s": "a\\"b"}'],
    })
    fast = extract_json_fields(rd.from_pandas(df), "doc",
                               {"s": pa.string()}).to_pandas() \
        .sort_values("rid")
    # the fast path cannot see through the escape: NULL, not wrong data
    assert fast["s"].tolist()[0] == "plain" and pd.isna(fast["s"].iloc[1])
    strict = extract_json_fields(rd.from_pandas(df), "doc",
                                 {"s": pa.string()}, strict=True) \
        .to_pandas().sort_values("rid")
    assert strict["s"].tolist() == ["plain", 'a"b']
