"""Round-3 continuation operators: tfidf ranking, quota sampling, pivot
features, bigram-LM scoring, forward as-of with tolerance, histogram."""
import hashlib
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd


DOCS = pd.DataFrame({
    "doc_id": [1, 2, 3, 4, 5],
    "text": [
        "the cat sat on the mat",
        "the dog sat on the log",
        "cat dog cat dog cat",
        "",
        "unique words only here",
    ],
})


def _brute_tfidf(docs: pd.DataFrame, k: int) -> pd.DataFrame:
    rows = []
    toks = {r.doc_id: (r.text or "").split(" ") for r in docs.itertuples()}
    df = {}
    for ws in toks.values():
        for t in set(ws):
            df[t] = df.get(t, 0) + 1
    for did, ws in toks.items():
        tf = {}
        for t in ws:
            tf[t] = tf.get(t, 0) + 1
        scored = sorted(
            ((t, c, df[t], c / df[t]) for t, c in tf.items()),
            key=lambda x: (-x[3], x[0]))[:k]
        rows += [(did, t, c, d, s) for t, c, d, s in scored]
    return pd.DataFrame(rows, columns=["doc_id", "term", "tf", "df", "score"])


def test_tfidf_top_terms_matches_brute_force(ray_session):
    from openmrs_module_epts_etl_ray.stages.text import tfidf_top_terms

    ds = rd.from_pandas(DOCS).repartition(3)
    got = tfidf_top_terms(ds, k=2).to_pandas() \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    want = _brute_tfidf(DOCS, 2) \
        .sort_values(["doc_id", "term"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got.astype({"tf": "int64", "df": "int64"}), want.astype(
            {"tf": "int64", "df": "int64"}))


def test_tfidf_min_df_prunes(ray_session):
    from openmrs_module_epts_etl_ray.stages.text import tfidf_top_terms

    ds = rd.from_pandas(DOCS)
    got = tfidf_top_terms(ds, k=10, min_df=2).to_pandas()
    # every surviving term appears in >= 2 docs
    df_by_term = got.groupby("term")["df"].first()
    assert (df_by_term >= 2).all()
    assert "unique" not in set(got["term"])


def test_quota_sample_caps_and_is_deterministic(ray_session):
    from openmrs_module_epts_etl_ray.stages.sampling import quota_sample

    n = 300
    df = pd.DataFrame({
        "doc_id": range(n),
        "source": [f"s{i % 3}" for i in range(n)],
    })
    ds = rd.from_pandas(df).repartition(8)
    got = quota_sample(ds, "doc_id", "source", 5).to_pandas()
    assert (got.groupby("source").size() == 5).all()
    # expected: the 5 smallest sha256(':'+id) per source
    df["sha"] = [hashlib.sha256(f":{i}".encode()).hexdigest()
                 for i in df["doc_id"]]
    want = (df.sort_values("sha").groupby("source").head(5)
            [["doc_id", "source"]])
    assert set(map(tuple, got[["doc_id", "source"]].to_numpy())) == \
        set(map(tuple, want.to_numpy()))
    # group smaller than k: all rows survive
    small = rd.from_pandas(df.head(3))
    assert quota_sample(small, "doc_id", "source", 5).count() == 3


def test_pivot_counts_matches_crosstab(ray_session):
    from openmrs_module_epts_etl_ray.stages.pivot import pivot_counts

    rng = np.random.default_rng(7)
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, 500),
        "event_type": rng.choice(["click", "view", "buy"], 500),
    })
    ds = rd.from_pandas(df).repartition(6)
    got = pivot_counts(ds, "user_id", "event_type",
                       ["click", "view", "buy"]).to_pandas() \
        .sort_values("user_id").reset_index(drop=True)
    ct = pd.crosstab(df["user_id"], df["event_type"]) \
        .reindex(columns=["click", "view", "buy"], fill_value=0)
    assert (got["n_events"].to_numpy() ==
            df.groupby("user_id").size().sort_index().to_numpy()).all()
    for c in ["click", "view", "buy"]:
        assert (got[f"n_{c}"].to_numpy() == ct[c].to_numpy()).all()


def test_bigram_lm_score_matches_pure_python(ray_session):
    from openmrs_module_epts_etl_ray.stages.lm import (
        score_bigram_lm, train_bigram_model)

    ds = rd.from_pandas(DOCS).repartition(2)
    train = rd.from_pandas(DOCS[DOCS.doc_id % 2 == 0])
    model = train_bigram_model(train)
    got = score_bigram_lm(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # pure-python replay
    def grams(s, n):
        ws = (s or "").split(" ")
        return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]

    big, uni = {}, {}
    for r in DOCS[DOCS.doc_id % 2 == 0].itertuples():
        for g in grams(r.text, 2):
            big[g] = big.get(g, 0) + 1
        for g in grams(r.text, 1):
            uni[g] = uni.get(g, 0) + 1
    V = len(uni)
    for r in DOCS.itertuples():
        gs = grams(r.text, 2)
        row = got[got.doc_id == r.doc_id].iloc[0]
        assert row.n_bigrams == len(gs)
        assert row.sum_count == sum(big.get(g, 0) for g in gs)
        assert row.n_oov == sum(1 for g in gs if g not in big)
        if gs:
            lp = np.mean([math.log((big.get(g, 0) + 1) /
                                   (uni.get(g.split(" ")[0], 0) + V))
                          for g in gs])
            assert row.avg_logprob == pytest.approx(lp, rel=1e-12)
        else:
            assert row.avg_logprob == 0.0


def test_asof_forward_with_tolerance(ray_session):
    from openmrs_module_epts_etl_ray.stages.asof import asof_join

    left = pd.DataFrame({
        "k": ["a", "a", "b", "c"],
        "t": pd.to_datetime(["2024-01-01", "2024-01-10",
                             "2024-01-01", "2024-01-01"]),
        "lid": [1, 2, 3, 4],
    })
    right = pd.DataFrame({
        "k": ["a", "a", "a", "b"],
        "t": pd.to_datetime(["2024-01-02", "2024-01-02", "2024-01-20",
                             "2023-12-31"]),
        "rid": [10, 11, 12, 13],
    })
    out = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        by="k", on="t", right_cols=["rid"], right_order=["rid"],
        direction="forward", tolerance=pd.Timedelta(days=7),
    ).to_pandas().sort_values("lid").reset_index(drop=True)
    # lid=1: two right rows at same ts (+1d) -> FIRST in rid order wins (10)
    # lid=2: nearest forward is +10d > tolerance -> null
    # lid=3: right exists but only BEFORE left -> null (forward)
    # lid=4: no right rows for key -> null
    assert out.loc[0, "rid"] == 10
    assert pd.isna(out.loc[1, "rid"])
    assert pd.isna(out.loc[2, "rid"])
    assert pd.isna(out.loc[3, "rid"])


def test_numeric_histogram_matches_numpy(ray_session):
    from openmrs_module_epts_etl_ray.stages.selection import numeric_histogram

    rng = np.random.default_rng(3)
    v = np.concatenate([rng.normal(50, 30, 2000), [-5.0, 0.0, 99.99]])
    df = pd.DataFrame({"x": v})
    df.loc[::97, "x"] = np.nan
    ds = rd.from_pandas(df).repartition(5)
    got = numeric_histogram(ds, "x", 10.0).to_pandas() \
        .sort_values("bin").reset_index(drop=True)
    clean = df["x"].dropna().to_numpy()
    bins = np.floor(clean / 10.0).astype(np.int64)
    want = pd.Series(bins).value_counts().sort_index()
    assert got["bin"].tolist() == want.index.tolist()
    assert got["n"].tolist() == want.tolist()
    assert got["n"].sum() == len(clean)


def test_lag_gaps_matches_pandas_shift(ray_session):
    from openmrs_module_epts_etl_ray.stages.windows import lag_gaps

    rng = np.random.default_rng(7)
    n = 3000
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 40, n).astype(np.int64),
        "ts": pd.to_datetime("2024-01-01")
        + pd.to_timedelta(rng.integers(0, 10**9, n), unit="us"),
    })
    got = lag_gaps(rd.from_pandas(df).repartition(7), key_col="user_id",
                   ts_col="ts", order_cols=["event_id"]).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = df.sort_values(["user_id", "ts", "event_id"])
    prev = want.groupby("user_id")["ts"].shift()
    want = want.assign(
        gap_us=(want["ts"] - prev).dt.total_seconds() * 1e6) \
        .sort_values("event_id").reset_index(drop=True)
    pd.testing.assert_series_equal(
        got["gap_us"].astype("Float64"),
        want["gap_us"].round().astype("Float64"), check_names=False)
    # exactly one null gap per user (its first event)
    assert got["gap_us"].isna().sum() == df["user_id"].nunique()


def test_rollup_sum_matches_pandas(ray_session):
    from openmrs_module_epts_etl_ray.stages.pivot import rollup_sum

    rng = np.random.default_rng(11)
    n = 2000
    df = pd.DataFrame({
        "a": rng.choice(["x", "y", "z"], n),
        "b": rng.choice(["p", "q"], n),
        "v": rng.integers(-100, 100, n).astype(np.int64),
    })
    got = rollup_sum(rd.from_pandas(df).repartition(5), ["a", "b"], ["v"]) \
        .to_pandas().sort_values(["a", "b"]).reset_index(drop=True)

    fine = df.groupby(["a", "b"], as_index=False).agg(v=("v", "sum"),
                                                      n=("v", "size"))
    mid = df.groupby("a", as_index=False).agg(v=("v", "sum"), n=("v", "size"))
    mid["b"] = "ALL"
    grand = pd.DataFrame({"a": ["ALL"], "b": ["ALL"],
                          "v": [df["v"].sum()], "n": [len(df)]})
    want = pd.concat([fine, mid, grand], ignore_index=True)[
        ["a", "b", "v", "n"]].sort_values(["a", "b"]).reset_index(drop=True)
    for c in ["v", "n"]:
        want[c] = want[c].astype("int64")
    pd.testing.assert_frame_equal(got[["a", "b", "v", "n"]].astype(
        {"v": "int64", "n": "int64"}), want)


def test_rolling_sum_matches_pandas_rolling(ray_session):
    from openmrs_module_epts_etl_ray.stages.windows import rolling_sum

    rng = np.random.default_rng(13)
    n = 2500
    df = pd.DataFrame({
        "event_id": np.arange(n, dtype=np.int64),
        "user_id": rng.integers(0, 30, n).astype(np.int64),
        "ts": pd.to_datetime("2024-03-01")
        + pd.to_timedelta(rng.integers(0, 10**8, n), unit="us"),
        "cents": rng.integers(-500, 500, n).astype(np.int64),
    })
    got = rolling_sum(rd.from_pandas(df).repartition(6), key_col="user_id",
                      ts_col="ts", value_col="cents", frame=5,
                      order_cols=["event_id"]).to_pandas() \
        .sort_values("event_id").reset_index(drop=True)
    want = df.sort_values(["user_id", "ts", "event_id"])
    want = want.assign(roll_sum=want.groupby("user_id")["cents"]
                       .rolling(5, min_periods=1).sum()
                       .reset_index(level=0, drop=True).astype("int64")) \
        .sort_values("event_id").reset_index(drop=True)
    assert got["roll_sum"].tolist() == want["roll_sum"].tolist()


def test_unpivot_longer_roundtrip(ray_session):
    from openmrs_module_epts_etl_ray.stages.pivot import unpivot_longer

    df = pd.DataFrame({
        "id": [1, 2, 3],
        "a": np.array([1, 2, 3], np.int64),
        "b": np.array([0.5, 1.5, 2.5], np.float64),
    })
    got = unpivot_longer(rd.from_pandas(df), ["id"], ["a", "b"]) \
        .to_pandas().sort_values(["id", "name"]).reset_index(drop=True)
    assert len(got) == 6
    assert got["value"].dtype == np.float64  # common promoted type
    assert got.loc[(got["id"] == 2) & (got["name"] == "a"),
                   "value"].iloc[0] == 2.0
    assert got.loc[(got["id"] == 3) & (got["name"] == "b"),
                   "value"].iloc[0] == 2.5


def test_grouped_mode_deterministic_ties(ray_session):
    from openmrs_module_epts_etl_ray.stages.pivot import grouped_mode

    df = pd.DataFrame({
        "k": [1, 1, 1, 1, 2, 2, 3],
        "c": ["b", "b", "a", "a", "z", "y", "q"],  # k=1 tie a/b -> a wins
    })
    got = grouped_mode(rd.from_pandas(df).repartition(3), "k", "c") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    assert got["top_cat"].tolist() == ["a", "y", "q"]
    assert got["n"].tolist() == [2, 1, 1]


def test_full_outer_join_coalesces_keys(ray_session):
    from openmrs_module_epts_etl_ray.stages.joins import full_outer_join

    l = rd.from_pandas(pd.DataFrame({"k": [1, 2, 3], "a": [10, 20, 30]}))
    r = rd.from_pandas(pd.DataFrame({"k": [2, 3, 4], "b": [200, 300, 400]}))
    out = full_outer_join(l, r, ["k"]).to_pandas() \
        .sort_values("k").reset_index(drop=True)
    assert out["k"].tolist() == [1, 2, 3, 4]  # keys total on both sides
    assert out["k"].notna().all()
    assert pd.isna(out.loc[0, "b"]) and pd.isna(out.loc[3, "a"])
    assert out.loc[1, "a"] == 20 and out.loc[1, "b"] == 200


def _numpy_pagerank(edges_df, damping, iters):
    nodes = np.unique(np.concatenate([edges_df["src"], edges_df["dst"]]))
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    si = np.array([idx[v] for v in edges_df["src"]])
    di = np.array([idx[v] for v in edges_df["dst"]])
    deg = np.bincount(si, minlength=n)
    r = np.full(n, 1.0 / n)
    for _ in range(iters):
        contrib = np.bincount(di, weights=r[si] / deg[si], minlength=n)
        dangling = r[deg == 0].sum()
        r = (1 - damping) / n + damping * (contrib + dangling / n)
    return dict(zip(nodes.tolist(), r.tolist()))


def test_pagerank_both_engines_match_numpy(ray_session):
    from openmrs_module_epts_etl_ray.stages.graph import pagerank

    rng = np.random.default_rng(21)
    m = 4000
    edges = pd.DataFrame({
        "src": rng.integers(0, 120, m).astype(np.int64),
        "dst": rng.integers(0, 150, m).astype(np.int64),
    })
    edges = edges[edges["src"] != edges["dst"]].reset_index(drop=True)
    want = _numpy_pagerank(edges, 0.85, 8)

    for eng in ["broadcast", "join"]:
        got = pagerank(rd.from_pandas(edges).repartition(5),
                       damping=0.85, iterations=8, engine=eng) \
            .to_pandas().set_index("node")["rank"].to_dict()
        assert set(got) == set(want), eng
        assert abs(sum(got.values()) - 1.0) < 1e-6, eng
        for k, v in want.items():
            assert abs(got[k] - v) < 1e-9, (eng, k)
