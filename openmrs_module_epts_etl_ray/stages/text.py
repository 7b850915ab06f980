"""Text-analysis stages over a documents table.

Stages are plain callable INSTANCES (task pool): construction is free (the
regexes/profiles compile once per worker at module import), so the task form
fuses with the upstream read instead of paying actor-pool startup per stage.
"""
from __future__ import annotations

import pandas as pd
import ray.data as rd

from ..functions import text as T


class TextStats:
    """Per-doc token counts + quality metrics; regexes live at module scope
    (compiled once per worker import — actor-pool friendly)."""

    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = T.quality_metrics(batch[self.text_col])
        out.insert(0, self.id_col, batch[self.id_col].to_numpy())
        out["n_bpe_tokens"] = T.bpe_ish_token_count(batch[self.text_col])
        return out


class LangId:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id"):
        self.text_col = text_col
        self.id_col = id_col

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "predicted_lang": T.predict_lang(batch[self.text_col]).to_numpy(),
            }
        )


class Fingerprint:
    def __init__(self, text_col: str = "text", id_col: str = "doc_id", window: int = 16):
        self.text_col = text_col
        self.id_col = id_col
        self.window = window

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                self.id_col: batch[self.id_col].to_numpy(),
                "fingerprint": T.rolling_fingerprint(batch[self.text_col], self.window).to_numpy(),
            }
        )


def text_stats(ds: rd.Dataset, **kw) -> rd.Dataset:
    return ds.map_batches(TextStats(), batch_format="pandas", **kw)


def lang_id(ds: rd.Dataset, **kw) -> rd.Dataset:
    return ds.map_batches(LangId(), batch_format="pandas", **kw)


def fingerprint(ds: rd.Dataset, **kw) -> rd.Dataset:
    return ds.map_batches(Fingerprint(), batch_format="pandas", **kw)


def term_doc_frequency(
    ds: rd.Dataset,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_tf: int = 1,
) -> rd.Dataset:
    """TF-IDF statistics: per-document term frequency joined with corpus
    document frequency, integer-exact (callers derive the float score as
    ``tf * log(N / df)``; the relation itself is oracle-checkable).

    Exchange shape (the part that must survive 100 TB):

    - **tf is block-local** — a document lives in one row, so per-doc term
      counts never cross blocks: explode + groupby inside ``map_batches``.
    - **df moves only (term, partial_count) pairs** — each block's tf rows
      are already (doc, term)-unique, so the block's per-term row count IS
      its df contribution; one small groupby folds the partials.
    - **the join back is a broadcast** — vocabulary is sublinear in corpus
      size; ``broadcast_inner_join`` ships the df relation once and falls
      back to the hash join above threshold.
    """
    import numpy as np

    from .joins import broadcast_inner_join

    def tf_block(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.split()
        n = toks.str.len().fillna(0).astype(int).to_numpy()
        flat = pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), n),
            "term": np.concatenate(
                [t for t in toks if len(t)] or
                [np.array([], dtype=object)]),  # keep string dtype on empty
        })
        out = flat.groupby([id_col, "term"], as_index=False, sort=False) \
                  .size().rename(columns={"size": "tf"})
        out["tf"] = out["tf"].astype("int64")
        return out

    tf = ds.map_batches(tf_block, batch_format="pandas").materialize()

    def df_partial(df: pd.DataFrame) -> pd.DataFrame:
        out = df.groupby("term", as_index=False, sort=False).size() \
                .rename(columns={"size": "df"})
        out["df"] = out["df"].astype("int64")
        return out

    from ray.data.aggregate import Sum
    df_rel = tf.map_batches(df_partial, batch_format="pandas") \
               .groupby("term").aggregate(Sum("df", alias_name="df"))

    keep = tf if min_tf <= 1 else tf.map_batches(
        lambda d: d[d["tf"] >= min_tf], batch_format="pandas")
    return broadcast_inner_join(keep, df_rel, ["term"])


def decontaminate(
    ds: rd.Dataset,
    snippets: list[str],
    text_col: str = "text",
    *,
    invert: bool = False,
) -> rd.Dataset:
    """Benchmark decontamination: drop every document whose text contains
    ANY of ``snippets`` (eval-set leakage removal — the C4/GPT-3 style
    substring decontamination pass; ``invert=True`` returns the
    contaminated rows instead, for auditing).

    The snippet list is broadcast ONCE (``ray.put``) and probed with one
    vectorized ``match_substring`` pass per snippet — O(|snippets|) Arrow
    kernels per batch, no Python per row, no shuffle. That is the right
    shape for eval sets (10^2..10^4 snippets); a much larger contamination
    corpus should go through an Aho-Corasick automaton built per actor
    (``map_batches(Cls, concurrency=N)``) instead of this linear probe.
    """
    import pyarrow.compute as pc
    import ray

    ref = ray.put([s for s in snippets if s])

    def keep(t: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa
        snips = ray.get(ref)
        text = pc.fill_null(t[text_col], "")
        hit = pa.array(np.zeros(len(t), dtype=bool))
        for s in snips:
            hit = pc.or_(hit, pc.match_substring(text, s))
        return t.filter(hit if invert else pc.invert(hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def repetition_stats(
    ds: rd.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Per-document repetition signals (the Gopher quality-rule family):
    total / distinct / max-count word bigrams. High duplicate-bigram mass
    flags boilerplate and degenerate generations; the downstream filter is
    a plain predicate over these counts (kept integer-exact — ratio
    rounding differs across engines).

    Shuffle-free: bigrams never leave their batch (the stat is per
    document), built vectorized from the Arrow word-list offsets. Documents
    with fewer than two words emit no row (no bigrams), matching the SQL
    self-join semantics.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    def stats(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t[text_col], "")
        words = pc.split_pattern(text, " ")
        flat = pc.list_flatten(words)
        if isinstance(flat, pa.ChunkedArray):
            flat = flat.combine_chunks()
        nwords = pc.list_value_length(words).to_numpy().astype(np.int64)
        starts = np.concatenate(([0], np.cumsum(nwords)[:-1]))
        ord_in_doc = np.arange(len(flat), dtype=np.int64) - \
            np.repeat(starts, nwords)
        # bigram at i pairs word i with i+1 of the SAME doc
        has_next = ord_in_doc < np.repeat(nwords, nwords) - 1
        lead = np.flatnonzero(has_next)
        bg = pc.binary_join_element_wise(
            flat.take(pa.array(lead)), flat.take(pa.array(lead + 1)), " ")
        doc = np.repeat(t[id_col].to_numpy(zero_copy_only=False), nwords)[lead]
        df = pd.DataFrame({"doc": doc, "bg": bg.to_pandas()})
        g = df.groupby(["doc", "bg"], sort=False).size()
        per_doc = g.groupby(level=0).agg(["sum", "size", "max"])
        return pa.table({
            id_col: per_doc.index.to_numpy(),
            "n_bigrams": per_doc["sum"].to_numpy().astype(np.int64),
            "n_distinct": per_doc["size"].to_numpy().astype(np.int64),
            "top_count": per_doc["max"].to_numpy().astype(np.int64),
        })

    return ds.map_batches(stats, batch_format="pyarrow")


def redact_terms(
    ds: rd.Dataset,
    terms: list[str],
    replacement: str = "[REDACTED]",
    text_col: str = "text",
    *,
    out_col: str | None = None,
) -> rd.Dataset:
    """Mask every whole-word occurrence of ``terms`` (C4-style badword /
    PII-shaped scrubbing). One compiled RE2 alternation applied as a single
    vectorized ``replace_substring_regex`` kernel per batch — no shuffle,
    no Python per row; Arrow and DuckDB both run RE2, so the rule is
    oracle-portable (``regexp_replace(text, '\\b(a|b)\\b', r, 'g')``).

    Counts are appended as ``n_redacted`` (occurrences masked per row) so
    a downstream filter can drop rows that were mostly redactions."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    if not terms:
        raise ValueError("terms must be non-empty")
    pat = r"\b(" + "|".join(re.escape(t) for t in terms) + r")\b"
    dst = out_col or text_col

    def scrub(t: pa.Table) -> pa.Table:
        text = pc.fill_null(t[text_col], "")
        n = pc.count_substring_regex(text, pat)
        red = pc.replace_substring_regex(text, pat, replacement)
        cols = {c: t[c] for c in t.column_names}
        cols[dst] = red
        cols["n_redacted"] = pc.cast(n, pa.int64())
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")
