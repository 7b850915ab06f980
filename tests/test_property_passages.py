"""Property tests: passage_dedup and shuffle_rank against pure-python
oracles on randomized corpora (the same strategy the LWW/quick-merge
property suites use)."""
import hashlib

import hypothesis.strategies as st
import ray.data as rd
from hypothesis import HealthCheck, given, settings

from openmrs_module_epts_etl_ray.stages.dedup import passage_dedup
from openmrs_module_epts_etl_ray.stages.sampling import shuffle_rank

WORDS = ["a", "b", "c", "dd", "ee"]


def _py_passage_dedup(docs, w):
    def chunks(t):
        ws = t.split(" ")
        return [" ".join(ws[i:i + w]) for i in range(0, len(ws), w)]
    seen = {}
    for d in docs:
        for i, c in enumerate(chunks(d["text"])):
            seen.setdefault(c, (d["doc_id"], i))
    out = {}
    for d in docs:
        cs = chunks(d["text"])
        kept = [c for i, c in enumerate(cs)
                if seen[c] == (d["doc_id"], i)]
        out[d["doc_id"]] = (" ".join(kept), len(kept), len(cs) - len(kept))
    return out


@settings(max_examples=15, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    texts=st.lists(
        st.lists(st.sampled_from(WORDS), min_size=1, max_size=12)
          .map(" ".join),
        min_size=1, max_size=12),
    w=st.integers(min_value=1, max_value=4),
)
def test_passage_dedup_matches_python_oracle(ray_session, texts, w):
    docs = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    got = passage_dedup(rd.from_items(docs).repartition(3), chunk_words=w) \
        .to_pandas()
    got_map = {int(r.doc_id): (r.clean_text, int(r.n_kept), int(r.n_dropped))
               for r in got.itertuples()}
    assert got_map == _py_passage_dedup(docs, w)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(
    keys=st.lists(st.integers(min_value=0, max_value=10 ** 6),
                  min_size=1, max_size=60, unique=True),
    seed=st.sampled_from(["", "e1", "x"]),
)
def test_shuffle_rank_matches_python_oracle(ray_session, keys, seed):
    ds = rd.from_items([{"k": k} for k in keys]).repartition(4)
    out = shuffle_rank(ds, "k", seed=seed).to_pandas()
    order = sorted(keys,
                   key=lambda i: hashlib.sha256(f"{seed}:{i}".encode()).hexdigest())
    want = {k: p for p, k in enumerate(order)}
    assert dict(zip(out["k"], out["shuffle_pos"])) == want


@settings(max_examples=8, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(min_value=0, max_value=10 ** 6))
def test_semdedup_pairs_equal_bruteforce_within_clusters(ray_session, seed):
    import numpy as np

    from openmrs_module_epts_etl_ray.stages.similarity import (
        _normalize, semdedup_pairs)

    rng = np.random.default_rng(seed)
    C = rng.normal(size=(3, 8))
    V = rng.normal(size=(40, 8))
    ids = np.arange(100, 140)
    ds = rd.from_items([
        {"vec_id": int(i), "embedding": list(map(float, v))}
        for i, v in zip(ids, V)]).repartition(4)
    thr = 0.3
    got = semdedup_pairs(ds, C, [0, 1, 2], threshold=thr).to_pandas()
    got_set = set(zip(got["id_a"], got["id_b"]))

    Vn = _normalize(V.astype(np.float64))
    Cn = _normalize(C.astype(np.float64))
    cl = (Vn @ Cn.T).argmax(axis=1)
    S = Vn @ Vn.T
    want = {(int(ids[a]), int(ids[b]))
            for a in range(40) for b in range(a + 1, 40)
            if cl[a] == cl[b] and S[a, b] >= thr}
    assert got_set == want


@settings(max_examples=6, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(seed=st.integers(min_value=0, max_value=10 ** 6))
def test_kmeans_matches_numpy_lloyd(ray_session, seed):
    """Distributed Lloyd == single-process numpy Lloyd, same init, on
    well-separated blobs (fp-fold-order robust by construction)."""
    import numpy as np

    from openmrs_module_epts_etl_ray.stages.similarity import kmeans

    rng = np.random.default_rng(seed)
    k, d, per = 3, 5, 20
    centers = rng.normal(size=(k, d)) * 20          # far apart vs unit noise
    V = np.concatenate([c + rng.normal(size=(per, d)) for c in centers])
    perm = rng.permutation(len(V))
    V = V[perm]
    ids = np.arange(len(V))
    init = V[:k].copy()

    ds = rd.from_items([
        {"vec_id": int(i), "embedding": list(map(float, v))}
        for i, v in zip(ids, V)]).repartition(4)
    got_ds, got_C = kmeans(ds, k=k, iters=7, init_centroids=init)
    got = got_ds.to_pandas().set_index("vec_id")["cluster"].to_dict()

    C = init.copy()
    for _ in range(7):
        a = ((V[:, None, :] - C[None]) ** 2).sum(-1).argmin(1)
        for j in range(k):
            if (a == j).any():
                C[j] = V[a == j].mean(axis=0)
    a = ((V[:, None, :] - C[None]) ** 2).sum(-1).argmin(1)
    want = {int(i): int(c) for i, c in zip(ids, a)}
    assert got == want
    assert np.allclose(got_C, C, atol=1e-8)


_words = st.sampled_from(["a", "b", "c", "dd", "eee"])
_texts = st.lists(
    st.lists(_words, min_size=0, max_size=12).map(" ".join),
    min_size=1, max_size=12)


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=_texts, evals=_texts, n=st.integers(min_value=2, max_value=4))
def test_decontaminate_ngrams_matches_python_oracle(ray_session, texts, evals, n):
    from openmrs_module_epts_etl_ray.stages.text import decontaminate_ngrams

    def grams(s):
        w = s.split(" ")
        return [" ".join(w[i:i + n]) for i in range(len(w) - n + 1)]

    ev = {g for t in evals for g in grams(t)}
    want = {i: sum(g in ev for g in grams(t)) for i, t in enumerate(texts)}

    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)]).repartition(3)
    got = decontaminate_ngrams(ds, evals, n=n).to_pandas() \
        .set_index("doc_id")["n_hits"].to_dict()
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=list(HealthCheck))
@given(texts=_texts, k=st.integers(min_value=1, max_value=6))
def test_top_terms_matches_python_oracle(ray_session, texts, k):
    from collections import Counter

    from openmrs_module_epts_etl_ray.stages.text import top_terms

    c = Counter(w for t in texts for w in t.split(" "))
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:k]

    ds = rd.from_items([{"doc_id": i, "text": t}
                        for i, t in enumerate(texts)]).repartition(3)
    got = top_terms(ds, k=k).to_pandas()
    assert list(zip(got["term"], got["n"])) == want
