"""BPE tokenizer training/application (stages/bpe.py) — exact against an
independent in-test reference implementation of the published algorithm
(Sennrich, Haddow & Birch 2016)."""
import collections

import pandas as pd
import ray.data as rd

from openmrs_module_epts_etl_ray.stages import bpe

TEXTS = [
    "low low low low low",
    "lower lower newest newest newest",
    "newest newest newest widest widest",
    "aaaa aaa aa a aaaa",          # same-symbol runs: the merge-pass edge
    "the batch batch batch stream",
    "",                            # empty doc
    "x",                           # single-char word: no pairs
    "a\x1fb a\x1fb cc",            # control char INSIDE a token: symbols
                                   # are a list column, never a joined
                                   # string, so no separator can collide
]


def _ref_train(texts, k):
    wf = collections.Counter(w for t in texts for w in t.split(" ") if w)
    vocab = {tuple(w): f for w, f in wf.items()}
    merges = []
    for _ in range(k):
        pairs = collections.Counter()
        for syms, f in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += f
        if not pairs:
            break
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        new = {}
        for syms, f in vocab.items():
            res, j = [], 0
            while j < len(syms):
                if j < len(syms) - 1 and (syms[j], syms[j + 1]) == best:
                    res.append(syms[j] + syms[j + 1])
                    j += 2
                else:
                    res.append(syms[j])
                    j += 1
            new[tuple(res)] = new.get(tuple(res), 0) + f
        vocab = new
    return merges


def _ds():
    return rd.from_pandas(pd.DataFrame(
        {"doc_id": range(len(TEXTS)), "text": TEXTS})).repartition(3)


def test_train_matches_reference(ray_session):
    got = bpe.train_bpe(_ds(), 12)
    want = _ref_train(TEXTS, 12)
    assert got == want


def test_pair_counts_exact(ray_session):
    ref = collections.Counter()
    wf = collections.Counter(w for t in TEXTS for w in t.split(" ") if w)
    for w, f in wf.items():
        for i in range(len(w) - 1):
            ref[(w[i], w[i + 1])] += f
    got = {(r["l"], r["r"]): r["cnt"]
           for r in bpe.pair_counts(_ds()).take_all()}
    assert got == dict(ref)


def test_token_counts_match_greedy_encode(ray_session):
    merges = bpe.train_bpe(_ds(), 10)
    ranks = {tuple(m): i for i, m in enumerate(merges)}
    out = bpe.bpe_token_counts(_ds(), merges).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    exp_tokens = [sum(len(bpe.encode_word(w, ranks))
                      for w in t.split(" ") if w) for t in TEXTS]
    exp_words = [sum(1 for w in t.split(" ") if w) for t in TEXTS]
    assert out["n_tokens"].tolist() == exp_tokens
    assert out["n_words"].tolist() == exp_words
    # fully-merged small words collapse to one token
    assert out.loc[0, "n_tokens"] <= 3 * out.loc[0, "n_words"]


def test_encode_word_lowest_rank_first():
    # ranks force 'es' before 'st'; greedy must pick by rank, not position
    ranks = {("e", "s"): 0, ("s", "t"): 1, ("es", "t"): 2}
    assert bpe.encode_word("est", ranks) == ["est"]
    assert bpe.encode_word("st", ranks) == ["st"]
    assert bpe.encode_word("", ranks) == []


def test_same_symbol_run_merge_order():
    # "a a a a" -> ["aa","aa"]; "a a a" -> ["aa","a"] (leftover LAST)
    ranks = {("a", "a"): 0}
    assert bpe.encode_word("aaaa", ranks) == ["aa", "aa"]
    assert bpe.encode_word("aaa", ranks) == ["aa", "a"]
