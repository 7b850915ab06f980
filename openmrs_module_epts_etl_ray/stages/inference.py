"""Batched model inference over a Dataset (the actor-pool archetype for
model scoring in a training-data pipeline: quality classifiers, distilled
fasttext-style scorers, reward models).

Shape: the parameter vector is ``ray.put`` ONCE at stage construction;
each actor resolves it in ``__init__`` (a zero-copy shared-memory fetch
per actor, not per batch) and scores whole Arrow batches vectorized.
``LinearScorer`` stands in for any model whose inference is a matmul —
swap ``featurize`` and the weight source for a real checkpoint; the Ray
plumbing (broadcast, actor pool, batch sizing) is what this module pins.

Reference relation: the reference has no model scoring (it is a DB sync
engine); this is part of the training-data surface the build brief adds
on top of SURVEY §2.

Float-parity note: scoring accumulates ``bias + f0*w0 + f1*w1 + ...`` in
FIXED left-to-right order, one IEEE-double add per term — the same
association a SQL engine uses for a left-nested sum — so with exact
(dyadic-rational) weights and integer features the score is bitwise
reproducible across engines, which is what lets the oracle gate check a
"model" end to end.
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data as rd


def doc_quality_features(t: pa.Table, text_col: str = "text") -> np.ndarray:
    """(n, 5) int64 feature matrix over a text column: chars, spaces,
    digits, uppercase letters, sentence punctuation — each an exact
    integer a SQL oracle can restate."""
    x = pc.fill_null(t[text_col], "")
    cols = [
        pc.utf8_length(x),
        pc.count_substring(x, " "),
        pc.count_substring_regex(x, "[0-9]"),
        pc.count_substring_regex(x, "[A-Z]"),
        pc.count_substring_regex(x, "[.,!?]"),
    ]
    return np.stack([c.to_numpy(zero_copy_only=False).astype(np.int64)
                     for c in cols], axis=1)


class LinearScorer:
    """Actor-pool inference stage: fetch broadcast weights once per actor,
    score per batch vectorized. ``link='sigmoid'`` applies the logistic
    link (NOT oracle-exact across engines — libm exp differs in the last
    ulp); ``link='linear'`` keeps the raw margin, which is."""

    def __init__(self, weights_ref, bias: float, featurize, out_col: str,
                 link: str = "linear"):
        self.w = np.asarray(ray.get(weights_ref), dtype=np.float64)
        self.bias = float(bias)
        self.featurize = featurize
        self.out_col = out_col
        if link not in ("linear", "sigmoid"):
            raise ValueError(f"link={link!r}")
        self.link = link

    def __call__(self, t: pa.Table) -> pa.Table:
        if self.out_col in t.column_names:
            raise ValueError(
                f"output column {self.out_col!r} already exists in the "
                f"input (re-scoring? pass a different out_col)")
        F = self.featurize(t).astype(np.float64)
        if F.shape[1] != len(self.w):
            raise ValueError(
                f"featurize produced {F.shape[1]} features for "
                f"{len(self.w)} weights")
        s = np.full(len(t), self.bias, dtype=np.float64)
        for j in range(len(self.w)):          # fixed-order accumulation
            s = s + F[:, j] * self.w[j]       # (bitwise-stable, see module
        if self.link == "sigmoid":            # docstring)
            s = 1.0 / (1.0 + np.exp(-s))
        return t.append_column(self.out_col, pa.array(s))


def score_linear(
    ds: rd.Dataset,
    weights,
    *,
    bias: float = 0.0,
    featurize=doc_quality_features,
    out_col: str = "score",
    link: str = "linear",
    batch_size: int = 2048,
    concurrency=(1, 8),
) -> rd.Dataset:
    """Append a linear-model score per row. ``weights`` is broadcast once
    (``ray.put``); the actor pool re-reads it per ACTOR, never per batch."""
    ref = ray.put(np.asarray(weights, dtype=np.float64))
    return ds.map_batches(
        LinearScorer,
        fn_constructor_kwargs=dict(weights_ref=ref, bias=bias,
                                   featurize=featurize, out_col=out_col,
                                   link=link),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency)
