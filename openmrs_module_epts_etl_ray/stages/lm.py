"""N-gram language-model scoring over a documents table.

The CCNet / quality-filtering shape: train a count-based LM on a reference
slice of the corpus, broadcast the (pruned) model once, score every document
in one stateless vectorized pass, filter on the score downstream. The model
here is a bigram LM with add-one smoothing — deliberately simple: the point
is the DISTRIBUTED shape (count → collect vocab-sized model → broadcast →
probe), which is identical for a 5-gram KenLM-style model.

Scale notes (100 TB corpus):
- Counting exchanges only (gram, partial_count) pairs — each block folds its
  own gram stream with ``value_counts`` before the vocab-sized groupby.
- The trained model is sublinear in corpus bytes; ``min_count`` prunes the
  long tail when vocabulary alone outgrows a worker's heap (pruned grams
  score as OOV, exactly like a pruned KenLM).
- Scoring is shuffle-free: ``ray.put`` the model once, probe each batch's
  gram stream with one hashed ``index_in`` kernel.

Integer outputs (``n_bigrams, sum_count, n_oov``) are engine-portable and
oracle-exact; the float ``avg_logprob`` (mean add-one-smoothed
``ln P(w2|w1)``) is derived per row from those broadcast counts and is
checked against a pure-python replayer in tests (``ln`` differs across
libms, so it is kept out of byte-hashed oracle surfaces).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd

from .text import _sliding_ngrams


def _gram_counts(ds: rd.Dataset, n: int, text_col: str) -> rd.Dataset:
    """Corpus n-gram counts: per-block partial ``value_counts`` so only
    (gram, count) pairs reach the groupby."""
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        grams, _ = _sliding_ngrams(
            t[text_col].combine_chunks()
            if isinstance(t[text_col], pa.ChunkedArray) else t[text_col], n)
        vc = grams.value_counts()
        return pa.table({
            "gram": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    return ds.map_batches(partial, batch_format="pyarrow") \
             .groupby("gram").aggregate(Sum("n", alias_name="n"))


def train_bigram_model(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    min_count: int = 1,
):
    """Count bigrams and their left-context unigrams over ``ds`` (the
    TRAINING slice) and return a broadcastable model handle:
    ``ray.ObjectRef`` of ``(bigram_arr, bigram_n, unigram_arr, unigram_n,
    vocab_size)``. Arrays are Arrow string arrays + int64 ndarrays —
    zero-copy from the object store in every probe task."""
    big = _gram_counts(ds, 2, text_col).to_pandas()
    uni = _gram_counts(ds, 1, text_col).to_pandas()
    if min_count > 1:
        big = big[big["n"] >= min_count]
    model = (
        pa.array(big["gram"], pa.string()),
        big["n"].to_numpy().astype(np.int64),
        pa.array(uni["gram"], pa.string()),
        uni["n"].to_numpy().astype(np.int64),
        len(uni),
    )
    return ray.put(model)


def score_bigram_lm(
    ds: rd.Dataset,
    model_ref,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> rd.Dataset:
    """Per-document LM statistics: ``(id, n_bigrams, sum_count, n_oov,
    avg_logprob)``.

    - ``n_bigrams`` — sliding word bigrams in the document;
    - ``sum_count`` — total training-corpus frequency of those bigrams
      (0 for unseen);
    - ``n_oov`` — bigrams absent from the (pruned) model;
    - ``avg_logprob`` — mean ``ln((c(w1 w2)+1)/(c(w1)+V))`` add-one
      smoothed conditional; documents with no bigrams score 0.0.

    One ``map_batches`` pass, no shuffle; every kernel vectorized.
    """

    def score(t: pa.Table) -> pa.Table:
        big_arr, big_n, uni_arr, uni_n, vocab = ray.get(model_ref)
        col = t[text_col].combine_chunks() \
            if isinstance(t[text_col], pa.ChunkedArray) else t[text_col]
        grams, doc_idx = _sliding_ngrams(col, 2)
        # the bigram's left context is everything before its first space
        # (words themselves never contain the separator)
        ctx = pc.split_pattern(grams, " ", max_splits=1)
        w1 = pc.list_element(ctx, 0)

        bi = pc.index_in(grams, value_set=big_arr)
        bi_np = bi.to_numpy(zero_copy_only=False)
        seen = bi.is_valid().to_numpy(zero_copy_only=False)
        c_big = np.zeros(len(grams), np.int64)
        if seen.any():
            c_big[seen] = big_n[bi_np[seen].astype(np.int64)]
        ui = pc.index_in(w1, value_set=uni_arr)
        ui_np = ui.to_numpy(zero_copy_only=False)
        u_seen = ui.is_valid().to_numpy(zero_copy_only=False)
        c_uni = np.zeros(len(grams), np.int64)
        if u_seen.any():
            c_uni[u_seen] = uni_n[ui_np[u_seen].astype(np.int64)]

        nrows = len(t)
        n_big = np.bincount(doc_idx, minlength=nrows).astype(np.int64)
        sum_c = np.bincount(doc_idx, weights=c_big,
                            minlength=nrows).astype(np.int64)
        n_oov = np.bincount(doc_idx, weights=~seen,
                            minlength=nrows).astype(np.int64)
        logp = np.log((c_big + 1.0) / (c_uni + float(vocab)))
        sum_lp = np.bincount(doc_idx, weights=logp, minlength=nrows)
        avg = np.divide(sum_lp, n_big, out=np.zeros(nrows), where=n_big > 0)
        return pa.table({
            id_col: t[id_col],
            "n_bigrams": n_big,
            "sum_count": sum_c,
            "n_oov": n_oov,
            "avg_logprob": avg,
        })

    return ds.map_batches(score, batch_format="pyarrow")


def perplexity_buckets(
    ds: rd.Dataset,
    model_ref,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    labels: tuple[str, str, str] = ("head", "middle", "tail"),
) -> rd.Dataset:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020): score every
    document against the reference LM, split the corpus into head / middle
    / tail terciles by score, tag each document with its bucket (CCNet
    keeps head+middle for training corpora; the filter downstream is a
    one-line predicate on ``bucket``).

    Portability: the per-document score is the INTEGER OOV rate per mille
    ``(1000 * n_oov) // max(n_bigrams, 1)`` — a pure-integer surrogate for
    perplexity (higher = worse) that a SQL oracle restates exactly, unlike
    the libm-``ln`` ``avg_logprob``. Tercile thresholds are exact order
    statistics: ``t_k`` = the ``ceil(k*n/3)``-th smallest score, so
    ``bucket = head if s <= t1 else middle if s <= t2 else tail``.

    Scale shape (100 TB corpus): scoring is the shuffle-free broadcast
    probe of :func:`score_bigram_lm`; the tercile cut never sorts the
    corpus — scores live in the tiny domain [0, 1000], so each block folds
    a partial ``value_counts`` and only the <=1001-row (score, n)
    histogram reaches the driver, where a cumulative sum reads off both
    order statistics. One counts-sized exchange, O(1) driver memory. The
    narrow (id, score) relation is pinned (keys-only — the policy the
    prefix scan and dedup stages follow) so the tag pass never re-probes
    the corpus text.
    """
    from ray.data.aggregate import Sum

    scored = score_bigram_lm(ds, model_ref, id_col=id_col, text_col=text_col)

    def to_score(t: pa.Table) -> pa.Table:
        nb = t["n_bigrams"].to_numpy(zero_copy_only=False).astype(np.int64)
        ov = t["n_oov"].to_numpy(zero_copy_only=False).astype(np.int64)
        s = (1000 * ov) // np.maximum(nb, 1)
        return pa.table({id_col: t[id_col], "score": s})

    sc = scored.map_batches(to_score, batch_format="pyarrow").materialize()

    def hist(t: pa.Table) -> pa.Table:
        col = t["score"].combine_chunks() \
            if isinstance(t["score"], pa.ChunkedArray) else t["score"]
        vc = col.value_counts()
        return pa.table({
            "score": vc.field("values"),
            "n": pc.cast(vc.field("counts"), pa.int64()),
        })

    rows = sc.map_batches(hist, batch_format="pyarrow") \
             .groupby("score").aggregate(Sum("n", alias_name="n")).take_all()
    rows.sort(key=lambda r: r["score"])
    total = sum(r["n"] for r in rows)
    if total == 0:
        raise ValueError("perplexity_buckets: empty corpus")
    k1 = -(-total // 3)          # ceil(n/3)
    k2 = -(-2 * total // 3)      # ceil(2n/3)
    cum, t1, t2 = 0, None, None
    for r in rows:
        cum += r["n"]
        if t1 is None and cum >= k1:
            t1 = int(r["score"])
        if t2 is None and cum >= k2:
            t2 = int(r["score"])
    head, middle, tail = labels

    def tag(t: pa.Table) -> pa.Table:
        s = t["score"].to_numpy(zero_copy_only=False)
        b = np.where(s <= t1, head, np.where(s <= t2, middle, tail))
        return pa.table({
            id_col: t[id_col],
            "score": t["score"],
            "bucket": pa.array(b, pa.string()),
        })

    return sc.map_batches(tag, batch_format="pyarrow")
