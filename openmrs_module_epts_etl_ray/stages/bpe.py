"""Byte-pair-encoding tokenizer training and application over a corpus.

Beyond the reference's own operators (it has none of this): the tokenizer
side of a training-data pipeline. Word-level BPE in the published form
(Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare Words
with Subword Units"): a word starts as its character sequence, training
repeatedly merges the most frequent adjacent symbol pair, and encoding
replays the learned merges in rank order.

Scale shape — the classic two-tier trick:

- ONE corpus-sized exchange total: `word_frequencies` pre-reduces counts
  inside each block (explode + value_counts), so the groupby moves only
  (word, partial_count) pairs — vocabulary-sized, sublinear in corpus
  bytes.
- Every training ROUND then touches only the (word, freq, symbols)
  relation — vocabulary-scale, never the corpus. The per-round pin
  (`materialize`) is therefore vocab-sized and deliberate: re-deriving
  round r's symbols from scratch would re-apply r merges per round
  (O(rounds²) corpus-free work, but still wasteful).
- Pair counting is vectorized with the same Arrow-offsets construction as
  ``stages/text.py::repetition_stats`` — no per-row Python in the hot
  partial; the argmax runs over the aggregated pair relation
  (alphabet²-bounded per round).
- Encoding memoizes per UNIQUE word in actor state (``EncodeStage``):
  a batch of a million words typically holds a few thousand uniques, and
  the merge loop runs once per unique per actor lifetime, not per token.

Simplified contract (documented, restated verbatim by the SQL oracle):
no end-of-word marker symbol, whitespace tokenization, empty tokens
dropped. Ties in pair frequency break by (left symbol, right symbol)
ascending — deterministic across engines and runs.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data as rd

# The training relation carries symbol sequences as an Arrow
# list<string> column — NOT a joined string: any join separator would
# collide with documents that contain that byte inside a token (U+001F
# and friends do occur in scraped corpora), silently corrupting pair
# counts relative to the SQL oracle.
_SYMS = pa.list_(pa.string())


def word_frequencies(
    ds: rd.Dataset,
    text_col: str = "text",
) -> rd.Dataset:
    """(word, f) over the corpus — the only corpus-sized exchange in BPE
    training. Empty tokens (consecutive spaces) are dropped."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        toks = df[text_col].fillna("").str.split(" ")
        flat = pd.Series(np.concatenate(
            [w for w in toks if len(w)] or [np.array([], dtype=object)]))
        flat = flat[flat != ""]
        out = flat.value_counts(sort=False)
        # explicit string type: an all-empty block would otherwise infer
        # a null-typed 'word' column and diverge from the other blocks'
        # schema in the groupby exchange
        return pa.table({"word": pa.array(out.index.to_numpy(),
                                          type=pa.string()),
                         "f": out.to_numpy().astype("int64")})

    return ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("word").aggregate(Sum("f", alias_name="f"))


def _pair_partial(t: pa.Table, sym_col: str) -> pa.Table:
    """Adjacent-symbol pairs of each row's symbol sequence (a
    list<string> column), weighted by the row's frequency — vectorized
    from Arrow list offsets."""
    syms = t[sym_col]
    if isinstance(syms, pa.ChunkedArray):
        syms = syms.combine_chunks()
    flat = pc.list_flatten(syms)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    ns = pc.list_value_length(syms).to_numpy().astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(ns)[:-1]))
    ord_in = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, ns)
    lead = np.flatnonzero(ord_in < np.repeat(ns, ns) - 1)
    if not len(lead):
        return pa.table({"l": pa.array([], pa.string()),
                         "r": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    df = pd.DataFrame({
        "l": flat.take(pa.array(lead)).to_pandas(),
        "r": flat.take(pa.array(lead + 1)).to_pandas(),
        "w": np.repeat(t["f"].to_numpy(zero_copy_only=False), ns)[lead],
    })
    g = df.groupby(["l", "r"], sort=False)["w"].sum()
    idx = g.index.to_frame(index=False)
    return pa.table({"l": idx["l"].to_numpy(),
                     "r": idx["r"].to_numpy(),
                     "cnt": g.to_numpy().astype(np.int64)})


def _to_chars(t: pa.Table) -> pa.Table:
    """(word, f) -> (sym list<string>, f): a word's initial symbol
    sequence is its characters."""
    w = t["word"].to_pandas()
    return pa.table({"sym": pa.array([list(x) for x in w], type=_SYMS),
                     "f": t["f"]})


def pair_counts(
    ds: rd.Dataset,
    text_col: str = "text",
) -> rd.Dataset:
    """Round-0 BPE pair statistics straight off the corpus: adjacent
    CHARACTER pairs of every word weighted by word frequency, i.e. the
    relation whose argmax is the first merge. Exactly SQL-restatable
    (catalog query ``bpe_pair_counts``)."""
    from ray.data.aggregate import Sum

    wf = word_frequencies(ds, text_col)

    return wf.map_batches(_to_chars, batch_format="pyarrow") \
        .map_batches(lambda t: _pair_partial(t, "sym"),
                     batch_format="pyarrow") \
        .groupby(["l", "r"]).aggregate(Sum("cnt", alias_name="cnt"))


def top_pairs(ds: rd.Dataset, k: int = 50,
              text_col: str = "text") -> rd.Dataset:
    """The k most frequent adjacent character pairs, ties by (l, r)
    ascending — deterministic."""
    return pair_counts(ds, text_col) \
        .sort(["cnt", "l", "r"], descending=[True, False, False]).limit(k)


def train_bpe(
    ds: rd.Dataset,
    num_merges: int,
    text_col: str = "text",
) -> list[tuple[str, str]]:
    """Learn ``num_merges`` merge rules. Each round pins only the
    vocabulary-sized (symbols, f) relation, counts pairs distributed,
    takes the deterministic argmax (count desc, then (l, r) asc), and
    applies the merge vectorized. Stops early when no pair remains."""
    wf = word_frequencies(ds, text_col)
    state = wf.map_batches(_to_chars, batch_format="pyarrow").materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        from ray.data.aggregate import Sum
        best = state.map_batches(lambda t: _pair_partial(t, "sym"),
                                 batch_format="pyarrow") \
            .groupby(["l", "r"]).aggregate(Sum("cnt", alias_name="cnt")) \
            .sort(["cnt", "l", "r"], descending=[True, False, False]) \
            .limit(1).take_all()
        if not best:
            break
        l, r = best[0]["l"], best[0]["r"]
        merges.append((l, r))

        def apply(t: pa.Table, l=l, r=r) -> pa.Table:
            # exact published semantics: ONE greedy left-to-right,
            # non-overlapping merge pass per word ("a a a a" must become
            # ["aa","aa"], with any leftover singleton LAST). The python
            # loop runs per UNIQUE word of the vocab-sized relation, the
            # same cost class as the encode memoization.
            out = []
            for p in t["sym"].to_pylist():
                if len(p) > 1:
                    res, j = [], 0
                    while j < len(p):
                        if j < len(p) - 1 and p[j] == l and p[j + 1] == r:
                            res.append(p[j] + p[j + 1])
                            j += 2
                        else:
                            res.append(p[j])
                            j += 1
                    p = res
                out.append(p)
            return pa.table({"sym": pa.array(out, type=_SYMS),
                             "f": t["f"]})

        state = state.map_batches(apply, batch_format="pyarrow") \
            .materialize()
    return merges


def encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    """Reference greedy BPE encode: repeatedly merge the LOWEST-RANK pair
    present (the published inference rule)."""
    syms = list(word)
    while len(syms) > 1:
        pairs = [(ranks.get((syms[i], syms[i + 1]), None), i)
                 for i in range(len(syms) - 1)]
        ranked = [(rk, i) for rk, i in pairs if rk is not None]
        if not ranked:
            break
        rk, i = min(ranked)
        # merge ALL occurrences of that pair left-to-right this step
        tgt = (syms[i], syms[i + 1])
        out, j = [], 0
        while j < len(syms):
            if j < len(syms) - 1 and (syms[j], syms[j + 1]) == tgt:
                out.append(syms[j] + syms[j + 1])
                j += 2
            else:
                out.append(syms[j])
                j += 1
        syms = out
    return syms


class EncodeStage:
    """Actor-pool BPE application: merges (the model) live in actor state,
    and the per-word merge loop is memoized per UNIQUE word across the
    actor's lifetime — the dominant cost becomes the dict lookup."""

    def __init__(self, merges: list[tuple[str, str]],
                 text_col: str = "text", id_col: str = "doc_id"):
        self.ranks = {tuple(m): i for i, m in enumerate(merges)}
        self.text_col = text_col
        self.id_col = id_col
        self.memo: dict[str, int] = {}

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        toks = batch[self.text_col].fillna("").str.split(" ")
        n_tokens = np.zeros(len(batch), dtype=np.int64)
        n_words = np.zeros(len(batch), dtype=np.int64)
        for i, words in enumerate(toks):
            tot = cnt = 0
            for w in words:
                if not w:
                    continue
                k = self.memo.get(w)
                if k is None:
                    k = self.memo[w] = len(encode_word(w, self.ranks))
                tot += k
                cnt += 1
            n_tokens[i] = tot
            n_words[i] = cnt
        return pd.DataFrame({self.id_col: batch[self.id_col].to_numpy(),
                             "n_words": n_words, "n_tokens": n_tokens})


def bpe_token_counts(ds: rd.Dataset, merges: list[tuple[str, str]], *,
                     text_col: str = "text", id_col: str = "doc_id",
                     concurrency=(1, 4)) -> rd.Dataset:
    """Per-document subword counts under a trained BPE model."""
    return ds.map_batches(EncodeStage,
                          fn_constructor_kwargs=dict(
                              merges=merges, text_col=text_col,
                              id_col=id_col),
                          batch_format="pandas", concurrency=concurrency)
