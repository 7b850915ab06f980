"""Round-3d operators: text normalization, fuzzy (edit<=1) pairs,
multi-stream LSN merge, keyed pseudonymization."""
import itertools
import random

import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def _lev(a: str, b: str) -> int:
    dp = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        prev, dp[0] = dp[0], i
        for j, cb in enumerate(b, 1):
            prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1,
                                     prev + (ca != cb))
    return dp[-1]


# ---------------------------------------------------------------------------
# normalize_text
# ---------------------------------------------------------------------------

def test_normalize_text_rules():
    from openmrs_module_epts_etl_ray.stages.text import normalize_text

    vals = ["  Hello\t\nWORLD  ", "Café vs Café", "a  b   c",
            "", None, "MiXeD CaSe"]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(len(vals)),
                                      "text": vals}))
    out = normalize_text(ds, "text").to_pandas().sort_values("doc_id")
    assert out["text"].tolist() == [
        "hello world", "café vs café", "a b c", "", "",
        "mixed case"]
    # composed and decomposed forms collapse to ONE canonical sha
    caf = out.loc[out["doc_id"] == 1, "text"].iloc[0]
    assert "́" not in caf  # NFC composed
    import hashlib
    assert out["norm_sha"].tolist() == [
        hashlib.sha256(t.encode()).hexdigest() for t in out["text"]]


def test_normalize_text_idempotent():
    from openmrs_module_epts_etl_ray.stages.text import normalize_text

    vals = ["Some Text", "déjà  vu", "x \t y"]
    ds = rd.from_pandas(pd.DataFrame({"doc_id": range(3), "text": vals}))
    once = normalize_text(ds, "text").to_pandas().sort_values("doc_id")
    twice = normalize_text(
        rd.from_pandas(once[["doc_id", "text"]]), "text"
    ).to_pandas().sort_values("doc_id")
    assert once["text"].tolist() == twice["text"].tolist()
    assert once["norm_sha"].tolist() == twice["norm_sha"].tolist()


# ---------------------------------------------------------------------------
# fuzzy_pairs
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed,alpha,kmax", [(3, "abc", 5), (7, "abcdef", 8),
                                             (11, "ab", 4)])
def test_fuzzy_pairs_match_bruteforce(seed, alpha, kmax):
    from openmrs_module_epts_etl_ray.stages.dedup import fuzzy_pairs

    random.seed(seed)
    names = list({"".join(random.choices(alpha, k=random.randint(0, kmax)))
                  for _ in range(120)})
    names += names[:4]  # exact dups under distinct ids => dist 0 pairs
    df = pd.DataFrame({"id": range(len(names)), "name": names})
    out = fuzzy_pairs(rd.from_pandas(df), name_col="name", id_col="id",
                      max_bucket=100000).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b", "dist"]].to_numpy()))
    want = {(i, j, _lev(names[i], names[j]))
            for i, j in itertools.combinations(range(len(names)), 2)
            if _lev(names[i], names[j]) <= 1}
    assert got == want
    assert (out["id_a"] < out["id_b"]).all()


def test_fuzzy_pairs_long_names_keep_exact_recall():
    from openmrs_module_epts_etl_ray.stages.dedup import fuzzy_pairs

    long = "x" * 200
    df = pd.DataFrame({"id": [1, 2, 3, 4],
                       "name": [long, long, long + "y", "ab"]})
    out = fuzzy_pairs(rd.from_pandas(df), name_col="name", id_col="id",
                      max_len=64).to_pandas()
    got = set(map(tuple, out[["id_a", "id_b", "dist"]].to_numpy()))
    # identity variants still collide => exact dup found even past max_len
    assert (1, 2, 0) in got


# ---------------------------------------------------------------------------
# multi_stream_lww
# ---------------------------------------------------------------------------

def test_multi_stream_lww_priority_tiebreak():
    from openmrs_module_epts_etl_ray.stages.lww import multi_stream_lww

    prim = pd.DataFrame({"k": ["a", "b"], "lsn": [5, 3],
                         "seq": [10, 11], "v": ["p_a", "p_b"]})
    repl = pd.DataFrame({"k": ["a", "b", "c"], "lsn": [5, 9, 1],
                         "seq": [20, 21, 22], "v": ["r_a", "r_b", "r_c"]})
    out = multi_stream_lww(
        [(rd.from_pandas(prim), 0), (rd.from_pandas(repl), 1)],
        ["k"], "lsn", "seq").to_pandas().sort_values("k")
    # a: lsn tie 5 == 5 -> primary (stream 0) wins
    # b: replica has higher lsn -> replica wins
    # c: only replica
    assert out["v"].tolist() == ["p_a", "r_b", "r_c"]
    assert out["stream"].tolist() == [0, 1, 1]


def test_multi_stream_lww_matches_single_stream_sort():
    from openmrs_module_epts_etl_ray.stages.lww import multi_stream_lww

    rng = np.random.default_rng(5)
    n = 4000
    df = pd.DataFrame({
        "k": rng.integers(0, 97, n).astype(str),
        "lsn": rng.integers(0, 50, n),
        "seq": np.arange(n),
        "v": rng.integers(0, 1 << 30, n),
    })
    streams = [(rd.from_pandas(df[df["seq"] % 3 == r].copy()), r)
               for r in range(3)]
    out = multi_stream_lww(streams, ["k"], "lsn", "seq") \
        .to_pandas().sort_values("k").reset_index(drop=True)
    ref = df.assign(stream=(df["seq"] % 3).astype(np.int64)) \
        .sort_values(["lsn", "stream", "seq"],
                     ascending=[False, True, False], kind="stable") \
        .drop_duplicates("k").sort_values("k").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out[["k", "lsn", "seq", "v", "stream"]],
        ref[["k", "lsn", "seq", "v", "stream"]])


# ---------------------------------------------------------------------------
# pseudonymize
# ---------------------------------------------------------------------------

def test_pseudonymize_stable_and_join_safe():
    from openmrs_module_epts_etl_ray.stages.transforms import pseudonymize

    df = pd.DataFrame({"user_id": [1, 2, 1, None], "x": [10, 20, 30, 40]})
    out = pseudonymize(rd.from_pandas(df), ["user_id"], salt="s1") \
        .to_pandas().sort_values("x")
    p = out["user_id_pseudo"].tolist()
    assert p[0] == p[2] and p[0] != p[1]          # stable, distinct
    assert p[3] is None or pd.isna(p[3])           # null in -> null out
    assert "user_id" not in out.columns
    import hashlib
    assert p[0] == hashlib.sha256(b"s1:1").hexdigest()[:16]
    # different salt => unlinkable pseudonyms
    out2 = pseudonymize(rd.from_pandas(df), ["user_id"], salt="s2") \
        .to_pandas().sort_values("x")
    assert out2["user_id_pseudo"].iloc[0] != p[0]


# ---------------------------------------------------------------------------
# snapshot_diff (single-exchange form)
# ---------------------------------------------------------------------------

def test_snapshot_diff_classification():
    from openmrs_module_epts_etl_ray.stages.history import snapshot_diff

    ev = pd.DataFrame({
        "repo": ["r"] * 8,
        "path": ["a", "a", "b", "c", "c", "d", "d", "e"],
        "lsn":  [1,   9,   2,   3,   8,   4,   9,   5],
        "op":   ["insert", "update", "insert", "insert", "delete",
                 "insert", "update", "delete"],
        "content": ["a1", "a9", "b2", "c3", "c8", "d4", "d4", "e5"],
    })
    out = snapshot_diff(rd.from_pandas(ev), 5, num_buckets=4) \
        .to_pandas().set_index("path")
    # a: old winner lsn1, new winner lsn9, different content -> changed
    # b: only old+new same event -> unchanged
    # c: alive at cut, deleted after -> removed
    # d: update after cut with SAME content -> unchanged
    # e: delete before cut on both sides -> absent entirely
    assert out.loc["a", "kind"] == "changed"
    assert out.loc["b", "kind"] == "unchanged"
    assert out.loc["c", "kind"] == "removed"
    assert out.loc["d", "kind"] == "unchanged"
    assert "e" not in out.index
    assert out.loc["a", "old_lsn"] == 1 and out.loc["a", "new_lsn"] == 9


def test_snapshot_diff_added_key():
    from openmrs_module_epts_etl_ray.stages.history import snapshot_diff

    ev = pd.DataFrame({
        "repo": ["r", "r"], "path": ["x", "y"], "lsn": [10, 2],
        "op": ["insert", "insert"], "content": ["cx", "cy"],
    })
    out = snapshot_diff(rd.from_pandas(ev), 5, num_buckets=4) \
        .to_pandas().set_index("path")
    assert out.loc["x", "kind"] == "added"
    assert pd.isna(out.loc["x", "old_lsn"])
    assert out.loc["y", "kind"] == "unchanged"


# ---------------------------------------------------------------------------
# reconciliation_plan / hot_keys
# ---------------------------------------------------------------------------

def test_reconciliation_plan_actions():
    from openmrs_module_epts_etl_ray.stages.detectors import (
        reconciliation_plan)

    src = pd.DataFrame({"id": [1, 2, 3, 4], "v": [10., 20., 30., None]})
    dst = pd.DataFrame({"id": [2, 3, 5, 4], "v": [20., 99., 50., None]})
    out = reconciliation_plan(rd.from_pandas(src), rd.from_pandas(dst),
                              ["id"], ["v"]).to_pandas()
    got = dict(zip(out["id"], out["action"]))
    # 1 missing in dst -> insert; 2 equal -> nothing; 3 drifted -> update;
    # 5 phantom -> delete; 4 present both sides with null == null payload
    # -> equal -> nothing (presence comes from join markers, not payload)
    assert got == {1: "insert", 3: "update", 5: "delete"}


def test_hot_keys_counts_and_share():
    from openmrs_module_epts_etl_ray.stages.stats import hot_keys

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"] * 3 + ["c"] * 2})
    out = hot_keys(rd.from_pandas(df), ["k"], k=2).to_pandas()
    assert out["k"].tolist() == ["a", "b"]
    assert out["n"].tolist() == [5, 3]
    assert out["share"].tolist() == [0.5, 0.3]


def test_extract_regex_named_groups():
    from openmrs_module_epts_etl_ray.stages.text import extract_regex

    df = pd.DataFrame({"doc_id": [1, 2, 3],
                       "text": ["a scan table b", "no verbs here", None]})
    out = extract_regex(rd.from_pandas(df),
                        r"(?P<verb>scan|merge|join) (?P<obj>[a-z]+)",
                        keep_cols=["doc_id"]) \
        .to_pandas().sort_values("doc_id")
    assert out["verb"].tolist()[0] == "scan"
    assert out["obj"].tolist()[0] == "table"
    assert out["verb"].isna().tolist() == [False, True, True]
    import pytest as _pt
    with _pt.raises(ValueError):
        extract_regex(rd.from_pandas(df), r"scan (\w+)")  # unnamed groups


def test_bm25_matches_reference_formula():
    from openmrs_module_epts_etl_ray.stages.text import bm25_search

    docs = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "text": ["cat dog cat", "dog dog dog fish", "bird", "cat fish"],
    })
    out = bm25_search(rd.from_pandas(docs), ["cat", "fish"], k=10) \
        .to_pandas()
    # reference numpy computation
    import numpy as np
    N, dls = 4, {1: 3, 2: 4, 3: 1, 4: 2}
    avgdl = 10 / 4
    df = {"cat": 2, "fish": 2}
    tf = {(1, "cat"): 2, (2, "fish"): 1, (4, "cat"): 1, (4, "fish"): 1}
    k1, b = 1.2, 0.75
    want = {}
    for (d, t), f in tf.items():
        idf = np.log((N - df[t] + 0.5) / (df[t] + 0.5) + 1)
        s = idf * f * (k1 + 1) / (f + k1 * (1 - b + b * dls[d] / avgdl))
        want[d] = want.get(d, 0) + int(np.floor(s * 1e9))
    got = dict(zip(out["doc_id"], out["score_e9"]))
    assert got == want
    # ranking deterministic: score desc then id asc
    assert out["doc_id"].tolist() == sorted(
        want, key=lambda d: (-want[d], d))


def test_cube_sum_all_grouping_sets():
    from openmrs_module_epts_etl_ray.stages.pivot import cube_sum

    df = pd.DataFrame({"a": ["x", "x", "y"], "b": ["p", "q", "p"],
                       "v": [1, 2, 4]})
    out = cube_sum(rd.from_pandas(df), ["a", "b"], ["v"]) \
        .to_pandas().set_index(["a", "b"]).sort_index()
    assert out.loc[("x", "p"), "v"] == 1
    assert out.loc[("x", "ALL"), "v"] == 3
    assert out.loc[("ALL", "p"), "v"] == 5       # cube-only set (not rollup)
    assert out.loc[("ALL", "ALL"), "v"] == 7
    assert out.loc[("ALL", "ALL"), "n"] == 3
    assert len(out) == 3 + 2 + 2 + 1  # finest + a-sets + b-sets + grand


def test_grouped_concat_ordering():
    from openmrs_module_epts_etl_ray.stages.pivot import grouped_concat

    df = pd.DataFrame({"k": ["a", "a", "b", "a"],
                       "o": [3, 1, 5, 2],
                       "v": ["z", "x", "q", "y"]})
    out = grouped_concat(rd.from_pandas(df), ["k"], "v", ["o"]) \
        .to_pandas().set_index("k")
    assert out.loc["a", "agg"] == "x,y,z"
    assert out.loc["b", "agg"] == "q"


def test_context_windows_exact():
    from openmrs_module_epts_etl_ray.stages.packing import context_windows

    text = " ".join(str(i) for i in range(10))
    df = pd.DataFrame({"doc_id": [1, 2], "text": [text, "a b"]})
    out = context_windows(rd.from_pandas(df), window=4, stride=3) \
        .to_pandas().sort_values(["doc_id", "win"])
    # doc 1: starts 0,3,6 (start 9 would need tokens 9..12 -> only full)
    assert out["win"].tolist() == [0, 1, 2]
    assert out["text_window"].tolist() == ["0 1 2 3", "3 4 5 6", "6 7 8 9"]
    # doc 2 shorter than window: no rows
    assert (out["doc_id"] == 2).sum() == 0


# ---------------------------------------------------------------------------
# cogroup full outer join — randomized equivalence vs DuckDB
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("seed", [1, 2, 3])
def test_full_outer_cogroup_matches_duckdb(seed):
    import duckdb

    from openmrs_module_epts_etl_ray.stages.joins import full_outer_join

    rng = np.random.default_rng(seed)
    nl, nr = rng.integers(0, 60, 2)
    mk = lambda n: pd.DataFrame({
        "k": rng.choice([None, *range(8)], n),
        "g": rng.choice(list("xyz"), n),
    })
    l = mk(nl).assign(a=rng.integers(0, 100, nl))
    r = mk(nr).assign(b=rng.choice(["p", None, "q"], nr),
                      a=rng.integers(0, 100, nr))
    out = full_outer_join(rd.from_pandas(l), rd.from_pandas(r),
                          ["k", "g"]).to_pandas()
    con = duckdb.connect()
    con.register("l", l)
    con.register("r", r)
    want = con.sql("""
        SELECT coalesce(l.k, r.k) AS k, coalesce(l.g, r.g) AS g,
               l.a AS a, r.b AS b, r.a AS a_r
        FROM l FULL OUTER JOIN r ON l.k = r.k AND l.g = r.g
    """).df()

    def canon(df):
        df = df.reindex(sorted(df.columns), axis=1)
        for c in df.columns:
            df[c] = df[c].astype("float64") if df[c].dtype.kind in "if" \
                else df[c].astype(object).where(df[c].notna(), None)
        return df.sort_values(list(df.columns), na_position="last") \
                 .reset_index(drop=True)

    a, b = canon(out), canon(want)
    assert len(a) == len(b)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_incremental_agg_base_plus_delta():
    from openmrs_module_epts_etl_ray.stages.history import (
        incremental_group_agg)

    ev = pd.DataFrame({
        "repo": ["r1", "r1", "r1", "r2", "r2", "r2"],
        "path": ["a",  "a",  "b",  "c",  "c",  "d"],
        "lsn":  [1,    9,    2,    3,    8,    4],
        "op":   ["insert", "update", "insert", "insert", "delete",
                 "insert"],
        "v":    [10,   20,   5,     7,    0,    3],
    })
    out = incremental_group_agg(
        rd.from_pandas(ev), 5, group_col="repo", val_col="v",
        key_cols=("repo", "path"), num_buckets=4) \
        .to_pandas().set_index("repo").sort_index()
    # r1 final: a(v=20), b(v=5) -> n=2 total=25; base was a(10)+b(5)=15
    assert out.loc["r1", "n"] == 2 and out.loc["r1", "total"] == 25
    assert out.loc["r1", "delta_n"] == 0 and out.loc["r1", "delta_total"] == 10
    # r2 final: c deleted after cut, d lives -> n=1 total=3;
    # base was c(7)+d(3)=10 -> delta_n=-1 delta_total=-7
    assert out.loc["r2", "n"] == 1 and out.loc["r2", "total"] == 3
    assert out.loc["r2", "delta_n"] == -1 and out.loc["r2", "delta_total"] == -7


def test_incremental_agg_dead_group_dropped():
    from openmrs_module_epts_etl_ray.stages.history import (
        incremental_group_agg)

    ev = pd.DataFrame({
        "repo": ["r1", "r1"], "path": ["a", "a"], "lsn": [1, 9],
        "op": ["insert", "delete"], "v": [10, 0],
    })
    out = incremental_group_agg(
        rd.from_pandas(ev), 5, group_col="repo", val_col="v",
        key_cols=("repo", "path"), num_buckets=2).to_pandas()
    assert len(out) == 0  # all keys dead at final state -> no group row


def test_quantize_embeddings_exact_and_bounded():
    from openmrs_module_epts_etl_ray.stages.similarity import (
        quantize_embeddings)

    rng = np.random.default_rng(9)
    vecs = [rng.normal(size=8).astype(np.float32) for _ in range(20)]
    vecs.append(np.zeros(8, np.float32))
    df = pd.DataFrame({"vec_id": range(len(vecs)), "embedding": vecs})
    out = quantize_embeddings(rd.from_pandas(df)).to_pandas()
    assert out["code"].between(-127, 127).all()
    # zero vector -> all-zero codes, scale 0
    z = out[out["vec_id"] == 20]
    assert (z["code"] == 0).all() and (z["scale"] == 0).all()
    # reconstruction error bounded by half a quantization step
    v = out[out["vec_id"] == 3].sort_values("pos")
    rec = v["code"].to_numpy() * v["scale"].to_numpy() / 127.0
    assert np.abs(rec - vecs[3].astype(np.float64)).max() \
        <= v["scale"].iloc[0] / 127.0 / 2 + 1e-12


def test_percentiles_cont_matches_numpy():
    from openmrs_module_epts_etl_ray.stages.windows import (
        grouped_percentiles_cont)

    rng = np.random.default_rng(4)
    df = pd.DataFrame({"k": rng.choice(list("ab"), 200),
                       "v": rng.normal(size=200)})
    out = grouped_percentiles_cont(rd.from_pandas(df), ["k"], "v") \
        .to_pandas().set_index("k")
    for k, sub in df.groupby("k"):
        for q, col in [(0.5, "p50_cont"), (0.9, "p90_cont"),
                       (0.99, "p99_cont")]:
            # numpy 'linear' is the same type-7 rule
            assert out.loc[k, col] == pytest.approx(
                np.quantile(sub["v"].to_numpy(), q), abs=1e-12)


def test_triangle_count_matches_bruteforce():
    from openmrs_module_epts_etl_ray.stages.graph import triangle_count

    rng = np.random.default_rng(6)
    n_nodes, n_edges = 30, 120
    e = rng.integers(0, n_nodes, (n_edges, 2))
    df = pd.DataFrame({"src": e[:, 0], "dst": e[:, 1]})
    got = triangle_count(rd.from_pandas(df)).to_pandas()["n_triangles"][0]
    # brute force over canonical undirected edge set
    es = {(min(a, b), max(a, b)) for a, b in e if a != b}
    import itertools
    want = sum(1 for a, b, c in itertools.combinations(range(n_nodes), 3)
               if (a, b) in es and (a, c) in es and (b, c) in es)
    assert got == want and want > 0


def test_percent_rank_ties_and_singletons():
    from openmrs_module_epts_etl_ray.stages.windows import (
        grouped_percent_rank)

    df = pd.DataFrame({"k": ["a"] * 5 + ["b"],
                       "v": [10, 20, 20, 30, 40, 7],
                       "i": range(6)})
    out = grouped_percent_rank(rd.from_pandas(df), ["k"], "v") \
        .to_pandas().sort_values("i")
    # a: ranks 1,2,2,4,5 -> (r-1)/4 = 0, .25, .25, .75, 1
    assert out[out["k"] == "a"]["pct_rank"].tolist() == [0, .25, .25, .75, 1]
    assert out[out["k"] == "b"]["pct_rank"].tolist() == [0.0]


def test_percent_rank_many_partitions_vectorized():
    from openmrs_module_epts_etl_ray.stages.windows import (
        grouped_percent_rank)

    rng = np.random.default_rng(2)
    df = pd.DataFrame({"k": rng.integers(0, 500, 3000).astype(str),
                       "v": rng.integers(0, 40, 3000),
                       "i": range(3000)})
    out = grouped_percent_rank(rd.from_pandas(df), ["k"], "v") \
        .to_pandas().sort_values("i").reset_index(drop=True)
    want = df.groupby("k")["v"].rank(method="min") \
        .sub(1).div(df.groupby("k")["v"].transform("size").sub(1)
                    .clip(lower=1)).fillna(0).to_numpy()
    assert np.allclose(out["pct_rank"].to_numpy(), want)


def test_table_checksum_order_and_partition_invariant():
    from openmrs_module_epts_etl_ray.stages.validate import table_checksum

    df = pd.DataFrame({"id": range(100),
                       "name": [f"n{i}" for i in range(100)]})
    a = table_checksum(rd.from_pandas(df), ["id", "name"]) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    # shuffled row order + different partitioning -> identical checksums
    shuf = df.sample(frac=1, random_state=3)
    b = table_checksum(rd.from_pandas(shuf).repartition(7), ["id", "name"]) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b)
    # a single-row change flips exactly that row's bucket
    df2 = df.copy()
    df2.loc[5, "name"] = "CHANGED"
    c = table_checksum(rd.from_pandas(df2), ["id", "name"]) \
        .to_pandas().sort_values("bucket").reset_index(drop=True)
    diff = a.merge(c, on="bucket", suffixes=("_a", "_c"))
    changed = diff[diff["checksum_a"] != diff["checksum_c"]]
    assert 1 <= len(changed) <= 2  # old bucket and/or new bucket
    assert int(a["n_rows"].sum()) == 100


def test_approx_top_terms_cm_bounds():
    from openmrs_module_epts_etl_ray.stages.text import (
        approx_top_terms, top_terms)

    rng = np.random.default_rng(8)
    vocab = [f"w{i}" for i in range(300)]
    weights = 1.0 / np.arange(1, len(vocab) + 1)  # zipf-ish
    weights /= weights.sum()
    texts = [" ".join(rng.choice(vocab, size=50, p=weights))
             for _ in range(300)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}))
    approx = approx_top_terms(ds, k=10, width=2048, depth=4).to_pandas()
    exact = top_terms(ds, k=10).to_pandas()
    ex = dict(zip(exact["term"], exact["n"]))
    n_total = 300 * 50
    eps_bound = np.e / 2048 * n_total
    for term, est in zip(approx["term"], approx["n_est"]):
        if term in ex:
            assert est >= ex[term]                 # CM never underestimates
            assert est - ex[term] <= eps_bound     # and bounded above
    # the top-5 exact heavy hitters must all be recovered
    assert set(exact["term"].head(5)) <= set(approx["term"])


def test_grouped_concat_null_keys():
    from openmrs_module_epts_etl_ray.stages.pivot import grouped_concat

    df = pd.DataFrame({"k": ["a", "a", None, None, "b"],
                       "o": [1, 2, 1, 2, 1],
                       "v": ["x", "y", "p", "q", "z"]})
    out = grouped_concat(rd.from_pandas(df), ["k"], "v", ["o"]).to_pandas()
    got = {(None if pd.isna(k) else k): v
           for k, v in zip(out["k"], out["agg"])}
    assert got == {"a": "x,y", "b": "z", None: "p,q"}


def test_id_collision_uuid_identity_wins_over_id_move():
    from openmrs_module_epts_etl_ray.stages.id_collision import (
        resolve_id_collisions)

    ex = pd.DataFrame({"id": [1], "uuid": ["A"], "v": ["old"]})
    inc = pd.DataFrame({"id": [1, 5], "uuid": ["B", "A"], "v": ["b", "a"]})
    merged, remap = resolve_id_collisions(
        rd.from_pandas(ex), rd.from_pandas(inc), id_col="id",
        uuid_col="uuid")
    m = merged.to_pandas()
    # uuid A must exist exactly ONCE (under incoming id 5); children of old
    # id 1 re-point to 5, not to a freshly-minted moved id
    assert m[m["uuid"] == "A"]["id"].tolist() == [5]
    r = dict(zip(remap.to_pandas()["old_id"], remap.to_pandas()["new_id"]))
    assert r == {1: 5}


def test_id_collision_empty_existing_and_dup_uuids():
    from openmrs_module_epts_etl_ray.stages.id_collision import (
        resolve_id_collisions)

    ex = pd.DataFrame({"id": pd.Series([], dtype="int64"),
                       "uuid": pd.Series([], dtype="object")})
    inc = pd.DataFrame({"id": [3, 7], "uuid": ["X", "X"]})  # dup delivery
    merged, remap = resolve_id_collisions(
        rd.from_pandas(ex), rd.from_pandas(inc), id_col="id",
        uuid_col="uuid")
    assert sorted(merged.to_pandas()["id"]) == [3, 7]
    assert len(remap.to_pandas()) == 0
    # dup uuid against an existing row: repoint to the MIN incoming id
    ex2 = pd.DataFrame({"id": [9], "uuid": ["X"]})
    _, remap2 = resolve_id_collisions(
        rd.from_pandas(ex2), rd.from_pandas(inc), id_col="id",
        uuid_col="uuid")
    r = dict(zip(remap2.to_pandas()["old_id"], remap2.to_pandas()["new_id"]))
    assert r == {9: 3}


def test_rename_collision_coalesces():
    import pyarrow as pa

    from openmrs_module_epts_etl_ray.stages.schema_evolution import (
        rename_columns)

    t = pa.table({"language": ["py", "java", "go"],
                  "lang": [None, "rs", None]})
    out = rename_columns(t, {"language": "lang"})
    assert out.column_names == ["lang"]
    assert out["lang"].to_pylist() == ["py", "rs", "go"]  # new wins


def test_remap_fk_exact_above_2_53():
    from openmrs_module_epts_etl_ray.stages.lookup import remap_fk

    big = (1 << 60) + 1
    ds = rd.from_pandas(pd.DataFrame(
        {"fk": pd.array([big, 7, None], dtype="Int64")}))
    mp = rd.from_pandas(pd.DataFrame({"old": [big], "new": [big + 1]}))
    out = remap_fk(ds, mp, "fk", old_col="old", new_col="new",
                   on_missing="keep").to_pandas()
    got = set(out["fk"].dropna().astype("int64"))
    # the big value must survive EXACTLY (float64 would round it)
    assert big + 1 in got and 7 in got


def test_png_roundtrip_all_filters(ray_session):
    """encode_png is lossless under every scanline filter type and
    decode_png unfilters each correctly (Sub via lane prefix sum, Up
    vectorized, Average/Paeth sequential)."""
    import numpy as np

    from openmrs_module_epts_etl_ray.stages.multimodal import (
        decode_png, encode_png,
    )

    rng = np.random.default_rng(11)
    for f in range(5):
        img = rng.integers(0, 256, size=(13, 17, 3), dtype=np.uint8)
        out = decode_png(encode_png(img, row_filter=f))
        assert (out == img).all(), f"filter {f}"
    # 1x1 and single-row edges
    for shape in ((1, 1, 3), (1, 9, 3), (9, 1, 3)):
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        for f in range(5):
            assert (decode_png(encode_png(img, row_filter=f)) == img).all()


def test_png_decode_rejects_unsupported(ray_session):
    import pytest

    from openmrs_module_epts_etl_ray.stages.multimodal import decode_png

    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"P6\n1 1\n255\nabc")


def test_png_real_decode_stage(ray_session):
    """DecodeStage(fake=False) really decodes PNG payloads."""
    import numpy as np
    import pandas as pd

    from openmrs_module_epts_etl_ray.stages.multimodal import (
        PNG_MIME, DecodeStage, encode_png,
    )

    img = np.full((4, 6, 3), 9, dtype=np.uint8)
    batch = pd.DataFrame({
        "media_id": [1], "kind": ["image"],
        "payload": [encode_png(img, row_filter=4)], "mime": [PNG_MIME]})
    out = DecodeStage(fake=False)(batch)
    f = out["feature"].iloc[0]
    assert list(f[:4]) == [6.0, 4.0, 9.0, 9.0]


def test_linear_scorer_inference(ray_session):
    """Broadcast-weights actor-pool inference: margin matches a sequential
    recompute exactly; sigmoid link is monotone in the margin; feature
    counts match python string ops."""
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages.inference import (
        doc_quality_features, score_linear,
    )

    texts = ["Hello, World! 123", "", None, "a b  c", "UPPER.lower?9"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    F = doc_quality_features(t)
    for i, s in enumerate(texts):
        s = s or ""
        assert F[i, 0] == len(s)
        assert F[i, 1] == s.count(" ")
        assert F[i, 2] == sum(c.isdigit() for c in s)
        assert F[i, 3] == sum(c.isupper() and c.isascii() for c in s)
        assert F[i, 4] == sum(c in ".,!?" for c in s)

    w, b = [0.015625, 0.25, -0.125, 0.0625, -0.5], 0.5
    ds = rd.from_arrow(t).repartition(3)
    got = score_linear(ds, w, bias=b).to_pandas().sort_values("doc_id")
    want = []
    for i in range(5):
        s = np.float64(b)
        for j in range(5):
            s = s + np.float64(F[i, j]) * np.float64(w[j])
        want.append(float(s))
    assert got["score"].tolist() == want

    sig = score_linear(ds, w, bias=b, link="sigmoid") \
        .to_pandas().sort_values("doc_id")["score"]
    order_lin = np.argsort(got["score"].to_numpy())
    order_sig = np.argsort(sig.to_numpy())
    assert (order_lin == order_sig).all()
    assert ((sig > 0) & (sig < 1)).all()


def test_png_roundtrip_hypothesis(ray_session):
    """Fuzzed PNG roundtrip: random dims/content under every filter type
    (hypothesis drives shape + seed; content from a seeded RNG keeps the
    example shrinkable)."""
    import numpy as np
    from hypothesis import given, settings, strategies as st

    from openmrs_module_epts_etl_ray.stages.multimodal import (
        decode_png, encode_png,
    )

    @settings(max_examples=40, deadline=None)
    @given(w=st.integers(1, 40), h=st.integers(1, 24),
           f=st.integers(0, 4), seed=st.integers(0, 2**31 - 1))
    def roundtrip(w, h, f, seed):
        img = np.random.default_rng(seed).integers(
            0, 256, size=(h, w, 3), dtype=np.uint8)
        assert (decode_png(encode_png(img, row_filter=f)) == img).all()

    roundtrip()


def test_span_corrupt_properties(ray_session):
    """Unmasked spans reproduce the original words; masked count matches
    the sha rule; word counts preserved; deterministic across re-runs."""
    import hashlib

    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages.text import span_corrupt

    texts = ["one two three four five six seven", "", None, "a b", "x " * 50]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(texts, pa.string())})
    ds = rd.from_arrow(t).repartition(2)
    a = span_corrupt(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    b = span_corrupt(ds).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert a.equals(b)                       # deterministic
    for i, text in enumerate(texts):
        w = (text or "").split(" ")
        want_masked = 0
        pieces = []
        for s in range(0, len(w), 3):
            h = hashlib.sha256(f"{i}:{s // 3}".encode()).hexdigest()[:4]
            if h < "2aaa":
                want_masked += 1
                pieces.append("<X>")
            else:
                pieces.append(" ".join(w[s:s + 3]))
        row = a.iloc[i]
        assert row["n_words"] == len(w)
        assert row["n_masked"] == want_masked
        assert row["text"] == " ".join(pieces)
