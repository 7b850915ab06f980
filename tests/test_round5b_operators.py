"""Round-5 (second session) operators: CCNet perplexity buckets, GIF codec,
gzip-JSONL source."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd

DOCS = pd.DataFrame({
    "doc_id": np.arange(20, dtype=np.int64),
    "text": [
        "the quick brown fox", "jumps over the lazy dog",
        "the quick brown fox jumps", "pack my box with five dozen",
        "", "a a a a a", "b b", "the the the",
        "zzz yyy xxx www", "the quick", "lorem ipsum dolor sit amet",
        "fox fox fox", "dog dog", "quick brown", "over the moon",
        "one", "two words here", "the lazy dog sleeps",
        "brown fox brown fox", "five dozen liquor jugs",
    ],
})


def _grams(s, n):
    ws = (s or "").split(" ")
    return [" ".join(ws[i:i + n]) for i in range(len(ws) - n + 1)]


def test_perplexity_buckets_matches_pure_python(ray_session):
    from openmrs_module_epts_etl_ray.stages.lm import (
        perplexity_buckets, train_bigram_model)

    ds = rd.from_pandas(DOCS).repartition(3)
    train = rd.from_pandas(DOCS[DOCS.doc_id % 2 == 0])
    model = train_bigram_model(train)
    got = perplexity_buckets(ds, model).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)

    # pure-python replay of the integer score + order-statistic terciles
    big = set()
    for r in DOCS[DOCS.doc_id % 2 == 0].itertuples():
        big.update(_grams(r.text, 2))
    scores = {}
    for r in DOCS.itertuples():
        gs = _grams(r.text, 2)
        oov = sum(1 for g in gs if g not in big)
        scores[r.doc_id] = (1000 * oov) // max(len(gs), 1)
    ordered = sorted(scores.values())
    n = len(ordered)
    t1 = ordered[-(-n // 3) - 1]
    t2 = ordered[-(-2 * n // 3) - 1]

    for r in got.itertuples():
        s = scores[r.doc_id]
        assert r.score == s
        want = "head" if s <= t1 else "middle" if s <= t2 else "tail"
        assert r.bucket == want

    # every bucket has >= ceil(n/3) - boundary-ties worth of mass and the
    # head+middle "kept" slice is at least 2/3 of the corpus
    kept = (got.bucket != "tail").sum()
    assert kept >= -(-2 * n // 3)
