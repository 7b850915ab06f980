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
    - **df moves only (term, partial_count) pairs** — per-block the
      exploded (doc, term) pairs are deduplicated, so the block's per-term
      row count IS its df contribution; one small groupby folds the
      partials.
    - **the join back is a broadcast** — vocabulary is sublinear in corpus
      size; ``broadcast_inner_join`` ships the df relation once and falls
      back to the hash join above threshold.
    - **nothing corpus-scale is pinned** — the df pass and the tf pass are
      two independent lineages over the (column-pruned) input scan, so the
      corpus-sized (doc, term, tf) relation streams straight into the
      broadcast join and is never ``.materialize()``-ed (the round-4 scan
      surgery applied here). Determinism contract as in ``stages/scan.py``:
      the input lineage re-executes once per pass, so a nondeterministic
      upstream must be materialized by the CALLER first.
    """
    import numpy as np

    from .joins import broadcast_inner_join

    def _explode(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.split()
        n = toks.str.len().fillna(0).astype(int).to_numpy()
        return pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), n),
            "term": np.concatenate(
                [t for t in toks if len(t)] or
                [np.array([], dtype=object)]),  # keep string dtype on empty
        })

    def tf_block(df: pd.DataFrame) -> pd.DataFrame:
        out = _explode(df).groupby([id_col, "term"], as_index=False,
                                   sort=False) \
                          .size().rename(columns={"size": "tf"})
        out["tf"] = out["tf"].astype("int64")
        if min_tf > 1:
            # fused here so the relation shrinks before it ever leaves the
            # block (the pre-round-5 version filtered a pinned tf relation)
            out = out[out["tf"] >= min_tf]
        return out

    # Arrow partials: Ray's sort-aggregate runs a per-group Python loop on
    # PANDAS blocks (measured 15-50x slower at >=1k groups/block); Arrow
    # blocks take the vectorized path, and vocabulary-sized partials are
    # exactly the many-groups case.
    def df_partial(t: "pa.Table") -> "pa.Table":
        # DECLARED pyarrow: the batch_format of the UDF fused into the
        # aggregate decides the combine path — a pandas-declared UDF sends
        # the sort-aggregate through its per-group Python loop even when
        # the UDF RETURNS Arrow (measured 8.5 s vs 1.1 s on a 3.8k-group
        # aggregate)
        import pyarrow as pa
        out = _explode(t.to_pandas()).drop_duplicates() \
            .groupby("term", as_index=False, sort=False).size()
        return pa.table({"term": out["term"].to_numpy(),
                         "df": out["size"].to_numpy().astype("int64")})

    from ray.data.aggregate import Sum
    df_rel = ds.map_batches(df_partial, batch_format="pyarrow") \
               .groupby("term").aggregate(Sum("df", alias_name="df"))

    tf = ds.map_batches(tf_block, batch_format="pandas")
    return broadcast_inner_join(tf, df_rel, ["term"])


# snippet count at which decontaminate() switches from per-snippet
# match_substring kernels to one RE2 alternation DFA; resolved at call
# time (module constant, monkeypatch-able in tests / A-B runs)
_DECON_REGEX_FROM = 64


def tfidf_top_terms(
    ds: rd.Dataset,
    k: int = 5,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_df: int = 1,
) -> rd.Dataset:
    """Per-document top-``k`` distinguishing terms, scored ``tf / df``
    (keyword extraction — the per-doc ranking companion to
    :func:`term_doc_frequency`'s flat relation). Ties break by term
    ascending; the score is a single IEEE double division of two int64
    counts, so it is bit-identical in any engine (``tf * log(N/df)``
    variants are NOT — ``log`` differs across libms).

    Two passes over the corpus, both honest at 100 TB:

    1. **df pass** — per-block (doc, term)-unique explode → per-term
       partial counts → one vocab-sized groupby. The resulting df relation
       is broadcast ONCE (``ray.put`` of an Arrow term array + an int64
       ndarray, probed with one hashed ``index_in`` kernel per batch);
       vocabulary is sublinear in corpus bytes, and ``min_df`` prunes the
       long tail when it isn't.
    2. **rank pass** — tf, the df probe, and the per-doc top-k selection
       all run INSIDE one ``map_batches`` call, where a document's rows are
       co-resident by construction. Ranking a downstream exploded relation
       instead would be wrong at scale: Ray Data splits large map outputs
       at ``target_max_block_size``, so doc integrity across blocks is not
       guaranteed.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    from ray.data.aggregate import Sum

    def df_partial(t: pa.Table) -> pa.Table:
        # declared pyarrow — see term_doc_freq.df_partial
        df = t.to_pandas()
        toks = df[text_col].fillna("").str.split(" ")
        n = toks.str.len().fillna(0).astype(int).to_numpy()
        flat = pd.DataFrame({
            "_d": np.repeat(np.arange(len(df)), n),
            "term": np.concatenate(
                [t for t in toks if len(t)] or [np.array([], dtype=object)]),
        })
        out = flat.drop_duplicates().groupby("term", as_index=False,
                                             sort=False).size()
        # Arrow partials — pandas blocks hit aggregate's per-group loop
        return pa.table({"term": out["term"].to_numpy(),
                         "df": out["size"].to_numpy().astype("int64")})

    df_rel = ds.map_batches(df_partial, batch_format="pyarrow") \
               .groupby("term").aggregate(Sum("df", alias_name="df"))
    if min_df > 1:
        df_rel = df_rel.map_batches(lambda d: d[d["df"] >= min_df],
                                    batch_format="pandas")
    vocab = pa.Table.from_pandas(df_rel.to_pandas())  # vocab-sized broadcast
    terms_arr = vocab["term"].combine_chunks().cast(pa.string())
    df_np = vocab["df"].to_numpy()
    model_ref = ray.put((terms_arr, df_np))

    def rank(df: pd.DataFrame) -> pd.DataFrame:
        terms_vs, dfs = ray.get(model_ref)
        toks = df[text_col].fillna("").str.split(" ")
        n = toks.str.len().fillna(0).astype(int).to_numpy()
        flat = pd.DataFrame({
            "_d": np.repeat(np.arange(len(df)), n),
            "term": np.concatenate(
                [t for t in toks if len(t)] or [np.array([], dtype=object)]),
        })
        tf = flat.groupby(["_d", "term"], as_index=False, sort=False) \
                 .size().rename(columns={"size": "tf"})
        idx = pc.index_in(pa.array(tf["term"], pa.string()),
                          value_set=terms_vs)
        valid = idx.is_valid().to_numpy(zero_copy_only=False)
        tf = tf[valid]  # min_df-pruned terms drop out of the ranking
        dfv = dfs[idx.to_numpy(zero_copy_only=False)[valid].astype(np.int64)]
        tf = tf.assign(df=dfv, score=tf["tf"].to_numpy() / dfv)
        tf = tf.sort_values(["_d", "score", "term"],
                            ascending=[True, False, True], kind="stable")
        keep = tf.groupby("_d", sort=False).cumcount() < k
        out = tf[keep]
        return pd.DataFrame({
            id_col: df[id_col].to_numpy()[out["_d"].to_numpy()],
            "term": out["term"].to_numpy(),
            "tf": out["tf"].to_numpy().astype("int64"),
            "df": out["df"].to_numpy().astype("int64"),
            "score": out["score"].to_numpy(),
        })

    return ds.map_batches(rank, batch_format="pandas")


def _unigram_counts_block(texts: pd.Series, keep=None):
    """Block-local whitespace-token counts — THE tokenization contract
    shared by ``top_terms`` and ``collocations`` (split on a single
    space, empty/null text yields one '' token). Returns (terms, counts)
    numpy arrays; ``keep`` restricts counting to a term set."""
    import numpy as np
    toks = texts.fillna("").str.split(" ")
    flat = pd.Series(np.concatenate(
        [t for t in toks if len(t)] or [np.array([], dtype=object)]))
    out = flat.value_counts(sort=False)
    if keep is not None:
        out = out[out.index.isin(keep)]
    return out.index.to_numpy(), out.to_numpy().astype("int64")


def top_terms(
    ds: rd.Dataset,
    k: int = 100,
    *,
    text_col: str = "text",
) -> rd.Dataset:
    """Corpus-wide exact heavy hitters: the ``k`` most frequent whitespace
    tokens, ties broken by term text ascending (deterministic).

    Scale shape: counts are pre-reduced INSIDE each block (explode +
    value_counts per batch), so the exchange moves only (term,
    partial_count) pairs — vocabulary-sized, sublinear in corpus bytes;
    the final sort+limit runs over the aggregated term relation only.
    """
    from ray.data.aggregate import Sum

    def partial(t: "pa.Table") -> "pa.Table":
        # declared pyarrow — see term_doc_freq.df_partial
        import pyarrow as pa
        terms, counts = _unigram_counts_block(t.to_pandas()[text_col])
        # Arrow partials — pandas blocks hit aggregate's per-group loop
        return pa.table({"term": terms, "n": counts})

    counts = ds.map_batches(partial, batch_format="pyarrow") \
        .groupby("term").aggregate(Sum("n", alias_name="n"))
    return counts.sort(["n", "term"], descending=[True, False]).limit(k)


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

    The snippet list is broadcast ONCE (``ray.put``) and probed per batch
    with no Python per row and no shuffle. Small lists (< ``regex_from``)
    run one vectorized ``match_substring`` kernel per snippet; larger
    lists switch to a SINGLE ``match_substring_regex`` over an escaped
    alternation — RE2 compiles the alternation into one DFA (the
    Aho-Corasick shape), so the per-batch cost stops scaling with
    |snippets| and the probe stays one kernel however large the
    contamination corpus grows (RE2 program-size limits cap this around
    10^5..10^6 snippet chars; shard the pattern above that).
    """
    import re

    import pyarrow.compute as pc
    import ray

    ref = ray.put([s for s in snippets if s])

    def keep(t: "pa.Table") -> "pa.Table":
        import numpy as np
        import pyarrow as pa
        snips = ray.get(ref)
        text = pc.fill_null(t[text_col], "")
        if len(snips) >= _DECON_REGEX_FROM:
            pat = "|".join(re.escape(s) for s in snips)
            hit = pc.match_substring_regex(text, pat)
        else:
            hit = pa.array(np.zeros(len(t), dtype=bool))
            for s in snips:
                hit = pc.or_(hit, pc.match_substring(text, s))
        return t.filter(hit if invert else pc.invert(hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def _sliding_ngrams(texts: "pa.Array", n: int):
    """Vectorized word-level sliding n-grams: one ``split_pattern`` pass,
    then a single ``binary_join_element_wise`` over ``n`` shifted takes of
    the flattened word stream. Returns ``(grams, doc_idx)`` — the n-gram
    strings and, per gram, the ROW index (0-based, within this batch) of
    the document it came from. Rows with fewer than ``n`` words emit no
    grams."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    text = pc.fill_null(texts, "")
    words = pc.split_pattern(text, " ")
    flat = pc.list_flatten(words)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    nwords = pc.list_value_length(words).to_numpy().astype(np.int64)
    starts = np.concatenate(([0], np.cumsum(nwords)[:-1]))
    ord_in_doc = np.arange(len(flat), dtype=np.int64) - np.repeat(starts, nwords)
    lead = np.flatnonzero(ord_in_doc < np.repeat(nwords, nwords) - (n - 1))
    shifted = [flat.take(pa.array(lead + k)) for k in range(n)]
    grams = pc.binary_join_element_wise(*shifted, " ")
    doc_idx = np.repeat(np.arange(len(texts), dtype=np.int64), nwords)[lead]
    return grams, doc_idx


def decontaminate_ngrams(
    ds: rd.Dataset,
    eval_texts: list[str],
    *,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """GPT-3 style n-gram decontamination audit: count, per document, the
    sliding word ``n``-grams that also occur anywhere in ``eval_texts``
    (the substring pass in :func:`decontaminate` catches verbatim leaks;
    the n-gram pass catches REPHRASED-context leaks around a shared
    span — the method of the GPT-3 appendix / open eval-dedup tooling).
    Output: one row per document, ``(id, n_hits)``; filter ``n_hits > 0``
    to drop contaminated rows.

    Scale shape: the eval n-gram set is built once driver-side (eval sets
    are 10^2..10^5 grams), broadcast via ``ray.put``, and probed per batch
    with one hashed ``is_in`` kernel over the batch's gram stream — no
    shuffle, no Python per row; the corpus text is read exactly once."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray

    ev_grams, _ = _sliding_ngrams(pa.array([t or "" for t in eval_texts],
                                           type=pa.string()), n)
    ev_set = pc.unique(ev_grams)
    ev_ref = ray.put(ev_set)

    def probe(t: pa.Table) -> pa.Table:
        ev = ray.get(ev_ref)
        grams, doc_idx = _sliding_ngrams(
            t[text_col].combine_chunks() if isinstance(t[text_col], pa.ChunkedArray)
            else t[text_col], n)
        hit = pc.is_in(grams, value_set=ev).to_numpy(zero_copy_only=False)
        n_hits = np.bincount(doc_idx[hit], minlength=len(t)).astype(np.int64)
        return pa.table({id_col: t[id_col], "n_hits": n_hits})

    return ds.map_batches(probe, batch_format="pyarrow")


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


def normalize_text(
    ds: rd.Dataset,
    text_col: str = "text",
    *,
    out_col: str | None = None,
    sha_col: str = "norm_sha",
    lowercase: bool = True,
) -> rd.Dataset:
    """Canonicalize text before dedup/fingerprinting: lowercase -> Unicode
    NFC -> collapse runs of whitespace to one space -> trim, then append the
    sha256 of the canonical form.  This is the normalization pass every
    exact/near dedup assumes upstream (two byte-distinct crawls of the same
    page should collapse to one ``norm_sha``).

    Per-batch Arrow kernels (``utf8_lower`` / ``replace_substring_regex`` —
    Arrow and DuckDB both run RE2, so the rule is oracle-portable against
    ``trim(regexp_replace(nfc_normalize(lower(t)), '\\s+', ' ', 'g'))``) —
    stateless, no shuffle, scales linearly with input bytes.

    NFC caveat: pyarrow 16.1's ``utf8_normalize(form="NFC")`` does NOT
    compose (its NFC output equals its NFD output — 'é' stays 'e'+U+0301),
    so it cannot match DuckDB/Python NFC. ASCII strings are NFC-invariant,
    so the batch is split with ``string_is_ascii`` (vectorized): ASCII rows
    skip normalization entirely; only the non-ASCII minority pays a
    ``unicodedata.normalize`` call per row (C implementation)."""
    import unicodedata

    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.hashing import sha256_hex

    dst = out_col or text_col

    def canon(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[text_col], "")
        if lowercase:
            s = pc.utf8_lower(s)
        non_ascii = pc.invert(pc.string_is_ascii(s))
        if pc.any(non_ascii).as_py():
            mask = non_ascii.combine_chunks() if isinstance(
                non_ascii, pa.ChunkedArray) else non_ascii
            sa = s.combine_chunks() if isinstance(s, pa.ChunkedArray) else s
            idx = np.flatnonzero(mask.to_numpy(zero_copy_only=False))
            fixed = pa.array(
                [unicodedata.normalize("NFC", v)
                 for v in sa.take(pa.array(idx)).to_pylist()],
                type=sa.type)
            s = pc.replace_with_mask(sa, mask, fixed)
        s = pc.replace_substring_regex(s, r"\s+", " ")
        # space-only trim: DuckDB's trim() strips spaces, and the RE2 \s
        # collapse already reduced every boundary [\t\n\f\r ] run to one
        # space — utf8_trim_whitespace would ALSO strip Unicode whitespace
        # (U+000B, U+2028, ...) that RE2 \s does not match, diverging from
        # the portable rule
        s = pc.utf8_trim(s, " ")
        cols = {c: t[c] for c in t.column_names}
        cols[dst] = s
        cols[sha_col] = sha256_hex(s)
        return pa.table(cols)

    return ds.map_batches(canon, batch_format="pyarrow")


def extract_regex(
    ds: rd.Dataset,
    pattern: str,
    text_col: str = "text",
    *,
    keep_cols: list[str] | None = None,
) -> rd.Dataset:
    """Structured field extraction: pull the FIRST match of an RE2 pattern
    with NAMED groups out of ``text_col``, one output column per group
    (null when the row has no match) — the log/field-parsing operator (the
    reference does this row-by-row in record UDF transformers; here it is
    one vectorized ``pc.extract_regex`` kernel per batch, no shuffle).

    Arrow and DuckDB both run RE2, so the rule is oracle-portable:
    ``nullif(regexp_extract(text, pat, i), '')`` per group (DuckDB returns
    '' for no-match where Arrow returns null)."""
    import re

    import pyarrow as pa
    import pyarrow.compute as pc

    groups = re.compile(pattern).groupindex
    if not groups:
        raise ValueError("pattern needs at least one (?P<name>...) group")

    def extract(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[text_col], "")
        st = pc.extract_regex(s, pattern)
        cols = {c: t[c] for c in (keep_cols or t.column_names)
                if c != text_col}
        for g in groups:
            cols[g] = pc.struct_field(st, g)
        return pa.table(cols)

    return ds.map_batches(extract, batch_format="pyarrow")


def bm25_search(
    ds: rd.Dataset,
    query_terms: list[str],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> rd.Dataset:
    """Top-``k`` documents for a keyword query under BM25 (Lucene idf
    variant: ``ln((N - df + 0.5)/(df + 0.5) + 1)``) — the retrieval-side
    companion to :func:`term_doc_frequency`.

    ONE corpus scan: each block emits (doc, term, tf, dl) rows for QUERY
    terms only (wire volume ~ matching docs x query size, never the
    vocabulary) plus a single (n_docs, sum_dl) stats row.  The global
    stats (N, avgdl, per-term df) fold on the driver from that tiny
    relation; scoring then runs over the materialized matching rows with
    the constants closed over — no second corpus scan, no broadcast join.

    Per-(doc, term) scores are quantized to 1e-9 BEFORE the per-doc sum
    (integer cells -> associative sum, no float summation order in the
    contract — the ``category_assoc`` rule); final ranking is
    (score_e9 desc, id asc), fully deterministic."""
    import numpy as np
    import pyarrow as pa

    if not query_terms:
        raise ValueError("query_terms must be non-empty")
    qset = sorted(set(query_terms))

    def scan(df: pd.DataFrame) -> pd.DataFrame:
        toks = df[text_col].fillna("").str.split(" ")
        n = toks.str.len().fillna(0).astype(int).to_numpy()
        flat = pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), n),
            "term": np.concatenate(
                [t for t in toks if len(t)] or [np.array([], object)]),
        })
        dl = pd.Series(n, index=df[id_col].to_numpy())
        hit = flat[flat["term"].isin(qset)]
        tf = hit.groupby([id_col, "term"], as_index=False, sort=False) \
                .size().rename(columns={"size": "tf"})
        tf["dl"] = dl.reindex(tf[id_col]).to_numpy()
        stats = pd.DataFrame({id_col: [-1], "term": [None],
                              "tf": [len(df)], "dl": [int(n.sum())]})
        out = pd.concat([tf, stats], ignore_index=True)
        out["tf"] = out["tf"].astype("int64")
        out["dl"] = out["dl"].astype("int64")
        return out

    rel = ds.map_batches(scan, batch_format="pandas").materialize()

    # driver fold of the tiny stats/df relation (blocks + matching rows)
    n_docs, sum_dl = 0, 0
    df_counts: dict[str, int] = {t: 0 for t in qset}
    for t in rel.iter_batches(batch_format="pandas", batch_size=None):
        s = t[t[id_col] == -1]
        n_docs += int(s["tf"].sum())
        sum_dl += int(s["dl"].sum())
        d = t[t[id_col] != -1]
        for term, c in d.groupby("term").size().items():
            df_counts[term] += int(c)
    if n_docs == 0:
        return rd.from_arrow(pa.table({id_col: pa.array([], pa.int64()),
                                       "score_e9": pa.array([], pa.int64())}))
    avgdl = sum_dl / n_docs
    idf = {t: np.log((n_docs - c + 0.5) / (c + 0.5) + 1.0)
           for t, c in df_counts.items()}

    import pyarrow.compute as pc

    terms_arr = pa.array(qset, pa.string())
    idf_arr = pa.array([idf[t] for t in qset], pa.float64())

    def score(t: pa.Table) -> pa.Table:
        # DECLARED pyarrow: a pandas-declared UDF fused into the aggregate
        # routes the combine through the per-group Python loop even when
        # it RETURNS Arrow (measured 8.5 s vs 1.1 s at 3.8k groups)
        d = t.filter(pc.not_equal(t[id_col], -1))
        ti = pc.index_in(d["term"], value_set=terms_arr)
        w = pc.take(idf_arr, ti).to_numpy(zero_copy_only=False)
        tf = d["tf"].to_numpy().astype(np.float64)
        dl = d["dl"].to_numpy().astype(np.float64)
        s = w * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
        return pa.table({
            id_col: d[id_col],
            "cell": pa.array(np.floor(s * 1e9).astype("int64")),
        })

    from ray.data.aggregate import Sum
    scored = rel.map_batches(score, batch_format="pyarrow") \
        .groupby(id_col).aggregate(Sum("cell", alias_name="score_e9"))
    return scored.sort(["score_e9", id_col],
                       descending=[True, False]).limit(k)


def approx_top_terms(
    ds: rd.Dataset,
    k: int = 20,
    *,
    text_col: str = "text",
    width: int = 4096,
    depth: int = 4,
    candidates_per_block: int = 256,
) -> rd.Dataset:
    """Approximate corpus heavy hitters under BOUNDED memory — the
    Count-Min companion to the exact :func:`top_terms` (which shuffles one
    row per distinct term; this never ships more than ``depth x width``
    counters plus a candidate shortlist per block, no matter how large the
    vocabulary grows).

    Per block: one vectorized token count, ``depth`` hashed scatter-adds
    into the CM matrix, plus the block's local top ``candidates_per_block``
    terms as candidates.  CM matrices are entry-wise sums (mergeable), so
    the driver folds blocks x (depth*width) int64 — the same
    driver-fold-of-binary-partials shape as the bloom build.  Final
    estimate per candidate = min over rows (classic CM upper bound:
    overestimates by at most eps*N with eps = e/width at prob 1-e^-depth;
    never underestimates).  A true top-k term missed by every block's
    shortlist is possible only if it is nowhere locally frequent —
    documented approximation, tolerance-tested against the exact twin."""
    import hashlib

    import numpy as np
    import pyarrow as pa
    import ray
    from pandas.util import hash_array

    seeds = [int.from_bytes(hashlib.sha256(f"cm{i}".encode())
                            .digest()[:2], "big") for i in range(depth)]

    def partial(df: pd.DataFrame) -> pa.Table:
        toks = df[text_col].fillna("").str.split(" ")
        flat = pd.Series(np.concatenate(
            [t for t in toks if len(t)] or [np.array([], dtype=object)]))
        vc = flat.value_counts(sort=False)
        terms = vc.index.to_numpy(dtype=object)
        counts = vc.to_numpy().astype(np.int64)
        cm = np.zeros((depth, width), np.int64)
        for i, sd in enumerate(seeds):
            h = hash_array(terms, hash_key=f"{sd:016d}", categorize=False)
            np.add.at(cm[i], (h % np.uint64(width)).astype(np.int64), counts)
        top = np.argsort(-counts, kind="stable")[:candidates_per_block]
        return pa.table({
            "kind": pa.array(["cm"] + ["cand"] * len(top)),
            "term": pa.array([None] + list(terms[top]), pa.string()),
            "cm": pa.array([cm.tobytes()] + [None] * len(top), pa.binary()),
        })

    rel = ds.map_batches(partial, batch_format="pandas")
    cm = np.zeros((depth, width), np.int64)
    cands: set = set()
    for t in rel.iter_batches(batch_format="pyarrow", batch_size=None):
        for kind, term, blob in zip(t["kind"].to_pylist(),
                                    t["term"].to_pylist(),
                                    t["cm"].to_pylist()):
            if kind == "cm":
                cm += np.frombuffer(blob, np.int64).reshape(depth, width)
            else:
                cands.add(term)
    if not cands:
        return rd.from_arrow(pa.table({"term": pa.array([], pa.string()),
                                       "n_est": pa.array([], pa.int64())}))
    carr = np.array(sorted(cands), dtype=object)
    est = np.full(len(carr), np.iinfo(np.int64).max)
    for i, sd in enumerate(seeds):
        h = hash_array(carr, hash_key=f"{sd:016d}", categorize=False)
        est = np.minimum(est, cm[i, (h % np.uint64(width)).astype(np.int64)])
    order = np.lexsort((carr, -est))[:k]
    return rd.from_arrow(pa.table({
        "term": pa.array(carr[order], pa.string()),
        "n_est": pa.array(est[order].astype("int64")),
    }))


def span_corrupt(
    ds: "rd.Dataset",
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_words: int = 3,
    rate_hex: str = "2aaa",
    mask_token: str = "<X>",
):
    """T5-style span corruption with a PORTABLE deterministic mask rule
    (the masking/augmentation step of denoising-LM data prep): words are
    grouped into aligned spans of ``span_words``; span ``s`` of doc ``d``
    is masked iff ``sha256(f"{d}:{s}")[:4] < rate_hex`` (≈ rate_hex/0x10000
    of spans — the same content-keyed rule family as hash_split /
    deterministic_shuffle, so re-runs and engines agree bit-for-bit). A
    masked span collapses to ONE ``mask_token``.

    Output: (id, text corrupted, n_masked spans, n_words). Stateless map —
    no shuffle; cost is one sha per span (~n_words/span_words), which IS
    the rule, same as the other sha-keyed sampling operators. Splitting is
    on single spaces (SQL ``string_split(x, ' ')`` parity, empty tokens
    preserved)."""
    import hashlib

    def corrupt(df: "pd.DataFrame") -> "pd.DataFrame":
        texts = df[text_col].fillna("")
        ids = df[id_col].to_numpy()
        out_text, out_masked, out_words = [], [], []
        sha = hashlib.sha256
        for d, text in zip(ids, texts):
            w = text.split(" ")
            pieces, masked = [], 0
            for s in range(0, len(w), span_words):
                h = sha(f"{d}:{s // span_words}".encode()).hexdigest()[:4]
                if h < rate_hex:
                    pieces.append(mask_token)
                    masked += 1
                else:
                    pieces.append(" ".join(w[s:s + span_words]))
            out_text.append(" ".join(pieces))
            out_masked.append(masked)
            out_words.append(len(w))
        return pd.DataFrame({
            id_col: ids,
            text_col: out_text,
            "n_masked": pd.array(out_masked, dtype="int64"),
            "n_words": pd.array(out_words, dtype="int64"),
        })

    return ds.map_batches(corrupt, batch_format="pandas")


def strip_html(
    ds: rd.Dataset,
    text_col: str = "text",
    *,
    out_col: str = "clean_text",
) -> rd.Dataset:
    """Boilerplate removal for crawled corpora: strip markup from an HTML
    column and keep the visible text (the trafilatura/jusText-shaped
    extraction step every web-scale LLM corpus runs before quality
    filtering and dedup).

    The rule, applied in this exact order so a SQL oracle can restate it
    byte-for-byte (Arrow and DuckDB both run RE2 — identical regex
    semantics):

    1. drop ``<script>``/``<style>`` elements INCLUDING their content
       (``(?is)<script\\b[^>]*>.*?</script>``; RE2 has no backreferences,
       so script and style are two passes), then drop any UNCLOSED
       script/style open tag together with everything to the end of the
       document (``(?is)<script\\b[^>]*>.*$``) — a truncated crawl page
       must not leak raw JavaScript/CSS into the corpus. Known
       limitation of regex-based stripping: a ``>`` inside a quoted
       attribute value ends the open tag early;
    2. drop HTML comments ``(?s)<!--.*?-->``;
    3. replace every remaining tag ``<[^>]*>`` with one space;
    4. decode the five XML entities — ``&lt; &gt; &quot; &#39; &nbsp;``
       first, ``&amp;`` LAST (so ``&amp;lt;`` yields the literal ``&lt;``,
       not ``<``);
    5. collapse ``\\s+`` runs to one space and trim spaces.

    Stateless vectorized ``map_batches`` (RE2 kernels compile once per
    call), no shuffle — scales linearly with corpus bytes.
    """
    import pyarrow as pa
    import pyarrow.compute as pc

    def clean(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[text_col], "")
        s = pc.replace_substring_regex(
            s, r"(?is)<script\b[^>]*>.*?</script>", " ")
        s = pc.replace_substring_regex(
            s, r"(?is)<style\b[^>]*>.*?</style>", " ")
        s = pc.replace_substring_regex(s, r"(?is)<script\b[^>]*>.*$", " ")
        s = pc.replace_substring_regex(s, r"(?is)<style\b[^>]*>.*$", " ")
        s = pc.replace_substring_regex(s, r"(?s)<!--.*?-->", " ")
        s = pc.replace_substring_regex(s, r"<[^>]*>", " ")
        for ent, rep in (("&lt;", "<"), ("&gt;", ">"), ("&quot;", '"'),
                         ("&#39;", "'"), ("&nbsp;", " "), ("&amp;", "&")):
            s = pc.replace_substring(s, ent, rep)
        s = pc.replace_substring_regex(s, r"\s+", " ")
        s = pc.utf8_trim(s, " ")
        cols = {c: t[c] for c in t.column_names if c != text_col}
        cols[out_col] = s
        return pa.table(cols)

    return ds.map_batches(clean, batch_format="pyarrow")


# Applied in THIS order (each class scrubs the already-scrubbed text of the
# previous one) so the rule is deterministic and restatable in SQL.
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}[- ]\d{3}[- ]\d{4}\b", "[PHONE]"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "[IP]"),
]


def pii_scrub(
    ds: rd.Dataset,
    text_col: str = "text",
    *,
    out_col: str | None = None,
) -> rd.Dataset:
    """Pattern-class PII scrubbing (the pre-training privacy pass —
    complements :func:`redact_terms`, which masks a fixed WORD list):
    mask emails, separator-style phone numbers and IPv4 literals, one
    vectorized RE2 kernel per class, and append per-row counts
    ``n_email`` / ``n_phone`` / ``n_ipv4`` so a downstream filter can
    drop PII-dense rows.

    Classes apply in :data:`PII_PATTERNS` order, each over the output of
    the previous (emails are scrubbed before the phone pass can see
    their digits), which is exactly how a SQL oracle restates it —
    nested ``regexp_replace(..., 'g')`` with
    ``len(regexp_extract_all(...))`` counts on the same intermediate.
    Stateless ``map_batches``, no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    dst = out_col or text_col

    def scrub(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[text_col], "")
        cols = {c: t[c] for c in t.column_names}
        for name, pat, rep in PII_PATTERNS:
            cols[f"n_{name}"] = pc.cast(
                pc.count_substring_regex(s, pat), pa.int64())
            s = pc.replace_substring_regex(s, pat, rep)
        cols[dst] = s
        return pa.table(cols)

    return ds.map_batches(scrub, batch_format="pyarrow")


def normalize_urls(
    ds: rd.Dataset,
    url_col: str = "url",
    *,
    out_col: str = "url_norm",
) -> rd.Dataset:
    """URL canonicalization — the crawl-dedup key derivation step (two
    fetches of the same page must collapse to one key before exact
    dedup). The rule, RE2-portable so DuckDB restates it byte-for-byte:

    1. drop the fragment (``#.*$``);
    2. lowercase the scheme and authority (``scheme://host[:port]``),
       leaving path/query case intact;
    3. drop an explicit default port (``:80`` for http, ``:443`` for
       https) at the end of the authority;
    4. drop ``utm_*`` tracking params — each must sit directly after a
       ``?``/``&`` separator (a param NAMED ``xutm_source`` is not a
       tracking param and survives): first RUNS of utm params followed
       by another param (``([?&])utm_x=v(&utm_y=w)*&`` keeps the
       leading separator), then a trailing run
       (``[?&]utm_x=v(&utm_y=w)*$`` consumes its own separator, so
       nothing dangles);
    5. drop ONE trailing slash from a bare-authority URL
       (``http://a.com/`` → ``http://a.com``, but ``/a/`` keeps its
       path slash).

    A row that does not start with ``scheme://`` (relative link,
    protocol-relative ``//host``, junk) is passed through with only the
    fragment dropped — never collapsed to an empty key — and gets empty
    ``host``/``domain`` so a downstream filter can route it.

    Emits ``out_col`` plus ``host`` (authority minus port/userinfo) and
    ``domain`` (last two dot-labels of the host — the registrable-domain
    approximation used for per-site quotas). Stateless vectorized
    ``map_batches``, no shuffle."""
    import pyarrow as pa
    import pyarrow.compute as pc

    AUTH = r"^(?P<auth>[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)(?P<rest>.*)$"
    UTM_RUN = r"utm_[A-Za-z_]+=[^&#]*(?:&utm_[A-Za-z_]+=[^&#]*)*"

    def canon(t: pa.Table) -> pa.Table:
        s0 = pc.fill_null(t[url_col], "")
        s0 = pc.replace_substring_regex(s0, r"#.*$", "")
        parts = pc.extract_regex(s0, AUTH)
        auth = pc.struct_field(parts, "auth")
        valid = pc.is_valid(auth)
        rest = pc.fill_null(pc.struct_field(parts, "rest"), "")
        auth = pc.utf8_lower(pc.fill_null(auth, ""))
        auth = pc.replace_substring_regex(auth, r"^(http://.*):80$", r"\1")
        auth = pc.replace_substring_regex(auth, r"^(https://.*):443$", r"\1")
        s = pc.binary_join_element_wise(auth, rest, "")
        s = pc.replace_substring_regex(s, r"([?&])" + UTM_RUN + "&", r"\1")
        s = pc.replace_substring_regex(s, r"[?&]" + UTM_RUN + "$", "")
        s = pc.replace_substring_regex(
            s, r"^([A-Za-z][A-Za-z0-9+.-]*://[^/?#]*)/$", r"\1")
        host = pc.replace_substring_regex(
            auth, r"^[a-z][a-z0-9+.-]*://(?:[^@/]*@)?([^:/?#]*).*$", r"\1")
        domain = pc.replace_substring_regex(
            host, r"^.*?([^.]+\.[^.]+)$", r"\1")
        cols = {c: t[c] for c in t.column_names}
        cols[out_col] = pc.if_else(valid, s, s0)
        cols["host"] = host
        cols["domain"] = domain
        return pa.table(cols)

    return ds.map_batches(canon, batch_format="pyarrow")


def readability(
    ds: rd.Dataset,
    text_col: str = "text",
) -> rd.Dataset:
    """Flesch reading-ease quality signal (a standard corpus-filter
    feature alongside the stopword/punctuation ratios in
    ``functions.text.quality_metrics``), from three RE2 counts:

    - ``n_words``     = non-space runs ``\\S+``;
    - ``n_sentences`` = terminator runs ``[.!?]+``;
    - ``n_syllables`` = the vowel-group approximation ``(?i)[aeiouy]+``.

    ``flesch = 206.835 - 1.015*(w/s) - 84.6*(y/w)`` with ``s``/``w``
    floored at 1 — evaluated in this exact left-associative expression
    tree so DuckDB's float64 arithmetic reproduces it BITWISE (each IEEE
    op is correctly rounded; identical inputs + identical tree =
    identical doubles). Stateless vectorized ``map_batches``."""
    import pyarrow as pa
    import pyarrow.compute as pc

    def score(t: pa.Table) -> pa.Table:
        s = pc.fill_null(t[text_col], "")
        w = pc.cast(pc.count_substring_regex(s, r"\S+"), pa.int64())
        sent = pc.cast(pc.count_substring_regex(s, r"[.!?]+"), pa.int64())
        syl = pc.cast(pc.count_substring_regex(s, r"(?i)[aeiouy]+"),
                      pa.int64())
        wf = pc.cast(pc.max_element_wise(w, 1), pa.float64())
        sf = pc.cast(pc.max_element_wise(sent, 1), pa.float64())
        yf = pc.cast(syl, pa.float64())
        flesch = pc.subtract(
            pc.subtract(pa.scalar(206.835),
                        pc.multiply(pa.scalar(1.015), pc.divide(wf, sf))),
            pc.multiply(pa.scalar(84.6), pc.divide(yf, wf)))
        cols = {c: t[c] for c in t.column_names if c != text_col}
        cols["n_words"] = w
        cols["n_sentences"] = sent
        cols["n_syllables"] = syl
        cols["flesch"] = flesch
        return pa.table(cols)

    return ds.map_batches(score, batch_format="pyarrow")


_A_TAG_RE = None  # compiled lazily at first use (module import stays cheap)


def _a_tag_re():
    global _A_TAG_RE
    if _A_TAG_RE is None:
        import re
        # RE2-compatible (no backrefs/lookaround) so the DuckDB oracle can
        # restate it verbatim: href value then anchor text, both in
        # negated-char classes — unambiguous captures under both engines.
        _A_TAG_RE = re.compile(r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>')
    return _A_TAG_RE


class LinkExtract:
    """Hyperlink extraction from raw HTML — the link-graph construction
    step of a web-crawl corpus pipeline (the WAT-extraction analogue;
    reference has no media/web layer, this extends the same
    field-extraction contract as ``etl/model/EtlDatabaseObject`` mapped
    fields to multi-valued captures). One compiled pattern per worker;
    ``Series.str.extractall`` drives the multi-match scan and the output
    explodes to one row per link with a 1-based per-document position."""

    def __init__(self, html_col: str = "html", id_col: str = "doc_id"):
        self.html_col = html_col
        self.id_col = id_col

    def __call__(self, df: pd.DataFrame) -> pd.DataFrame:
        df = df.reset_index(drop=True)
        m = df[self.html_col].fillna("").str.extractall(_a_tag_re())
        if m.empty:
            return pd.DataFrame({
                self.id_col: pd.Series([], dtype="int64"),
                "link_pos": pd.Series([], dtype="int64"),
                "href": pd.Series([], dtype="string"),
                "anchor": pd.Series([], dtype="string"),
            })
        rows = m.index.get_level_values(0).to_numpy()
        # extractall reports an EMPTY participating capture as NaN; both
        # groups always participate in a match, so NaN can only mean ''
        return pd.DataFrame({
            self.id_col: df[self.id_col].to_numpy()[rows],
            "link_pos": (m.index.get_level_values(1).to_numpy() + 1
                         ).astype("int64"),
            "href": m[0].fillna("").to_numpy(),
            "anchor": m[1].fillna("").to_numpy(),
        })


def extract_links(
    ds: rd.Dataset,
    html_col: str = "html",
    *,
    id_col: str = "doc_id",
    **kw,
) -> rd.Dataset:
    return ds.map_batches(LinkExtract(html_col, id_col),
                          batch_format="pandas", **kw)


HOST_RE = r"^https?://([^/]+)"


def host_of(href: pd.Series) -> pd.Series:
    """Authority (host) of absolute http(s) URLs, NaN otherwise — ONE
    regex pass; the single definition shared by ``domain_degrees`` and
    the anchor-text composition so the host contract lives in one place."""
    return href.fillna("").str.extract(HOST_RE, expand=False)


def domain_degrees(
    links: rd.Dataset,
    *,
    href_col: str = "href",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """In-link degrees per target host over an extracted link relation:
    absolute http(s) links only, host = authority up to the first ``/``.

    Exact under ANY partitioning of the link relation (a document's
    links may straddle blocks): the block partial reduces to
    (host, doc, n_links) triples, ONE hash exchange on host co-locates
    each host's triples, and the per-bucket fold sums link counts and
    counts distinct source docs. The exchange moves block-reduced
    (host, doc) triples — bounded by the distinct (host, source-doc)
    relation, not corpus bytes."""
    import numpy as np

    from ..functions.hashing import BUCKET_COL, add_bucket

    if num_buckets is None:
        try:
            import ray
            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 16)))
        except Exception:
            num_buckets = 16

    def partial(t: "pa.Table") -> "pa.Table":
        # declared pyarrow — pandas partials hit aggregate's per-group loop
        import pyarrow as pa
        df = t.to_pandas()
        host = host_of(df[href_col])
        keep = host.notna().to_numpy()
        if not keep.any():
            out = pa.table({"host": pa.array([], type=pa.string()),
                            id_col: pa.array([], type=pa.int64()),
                            "n_links": pa.array([], type=pa.int64())})
            return add_bucket(out, ("host",), num_buckets)
        g = (pd.DataFrame({"host": host[keep].to_numpy(),
                           id_col: df[id_col].to_numpy()[keep]})
             .groupby(["host", id_col], sort=False).size())
        out = pa.table({
            "host": g.index.get_level_values(0).to_numpy(),
            id_col: g.index.get_level_values(1).to_numpy().astype("int64"),
            "n_links": g.to_numpy().astype(np.int64),
        })
        return add_bucket(out, ("host",), num_buckets)

    def fold(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("host", as_index=False).agg(
            n_links=("n_links", "sum"), n_src_docs=(id_col, "nunique"))
        return out.astype({"n_links": "int64", "n_src_docs": "int64"})

    return (links.map_batches(partial, batch_format="pyarrow")
                 .groupby(BUCKET_COL)
                 .map_groups(fold, batch_format="pandas")
                 .sort("host"))


def _pair_counts_block(texts: pd.Series, window: int, count_col: str):
    """Block-local ordered-pair counts at token distances 1..``window``
    — THE pair-counting kernel shared by ``collocations`` (window=1)
    and ``cooccurrence``; tokenization is the ``top_terms`` contract.
    Returns an Arrow table (left_term, right_term, ``count_col``)."""
    import numpy as np
    import pyarrow as pa
    toks = texts.fillna("").str.split(" ")
    lefts, rights = [], []
    for w in toks:
        n = len(w)
        arr = None
        for d in range(1, min(window, n - 1) + 1):
            if arr is None:
                arr = np.asarray(w, dtype=object)
            lefts.append(arr[:-d])
            rights.append(arr[d:])
    if not lefts:
        return pa.table({"left_term": pa.array([], type=pa.string()),
                         "right_term": pa.array([], type=pa.string()),
                         count_col: pa.array([], type=pa.int64())})
    out = (pd.DataFrame({"left_term": np.concatenate(lefts),
                         "right_term": np.concatenate(rights)})
           .groupby(["left_term", "right_term"], sort=False)
           .size())
    idx = out.index
    return pa.table({
        "left_term": idx.get_level_values(0).to_numpy(),
        "right_term": idx.get_level_values(1).to_numpy(),
        count_col: out.to_numpy().astype(np.int64),
    })


def collocations(
    ds: rd.Dataset,
    k: int = 100,
    *,
    text_col: str = "text",
) -> rd.Dataset:
    """Corpus-wide adjacent-bigram collocation counts: the ``k`` most
    frequent token pairs with the unigram counts of both members —
    the integer numerators of PMI / log-likelihood collocation scores
    (callers derive floats; the relation itself stays oracle-exact).

    Tokenization = split on a single space (the ``top_terms`` contract,
    via the shared ``_unigram_counts_block``). Scale shape: two corpus
    passes. Pass 1 pre-reduces pair counts per block (the exchange moves
    pair-vocabulary-sized rows) and keeps only the k winners — a
    driver-bounded relation. Pass 2 counts unigrams FILTERED to the
    winners' <=2k member terms (the term set broadcast once with
    ``ray.put``), so its exchange moves at most 2k rows per block; the
    final attach is a driver-side merge over k rows. No vocabulary-sized
    relation is ever pinned, broadcast, or shuffled."""
    import ray
    from ray.data.aggregate import Sum

    def pair_partial(t: "pa.Table") -> "pa.Table":
        # declared pyarrow — see top_terms.partial
        return _pair_counts_block(t.to_pandas()[text_col], 1, "n_pair")

    winners = (ds.map_batches(pair_partial, batch_format="pyarrow")
                 .groupby(["left_term", "right_term"])
                 .aggregate(Sum("n_pair", alias_name="n_pair"))
                 .sort(["n_pair", "left_term", "right_term"],
                       descending=[True, False, False])
                 .limit(k)
                 .to_pandas())  # k rows — driver-bounded by construction
    if winners.empty:
        return rd.from_pandas(pd.DataFrame({
            "left_term": pd.Series([], dtype="string"),
            "right_term": pd.Series([], dtype="string"),
            "n_pair": pd.Series([], dtype="int64"),
            "n_left": pd.Series([], dtype="int64"),
            "n_right": pd.Series([], dtype="int64"),
        }))
    member_ref = ray.put(frozenset(winners["left_term"])
                         | frozenset(winners["right_term"]))

    def uni_partial(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        terms, counts = _unigram_counts_block(
            t.to_pandas()[text_col], keep=ray.get(member_ref))
        return pa.table({"term": terms, "n_term": counts})

    uni = (ds.map_batches(uni_partial, batch_format="pyarrow")
             .groupby("term").aggregate(Sum("n_term", alias_name="n_term"))
             .to_pandas())  # <= 2k rows (winner members only)
    lut = dict(zip(uni["term"], uni["n_term"]))
    winners["n_left"] = winners["left_term"].map(lut).astype("int64")
    winners["n_right"] = winners["right_term"].map(lut).astype("int64")
    winners = winners.sort_values(
        ["n_pair", "left_term", "right_term"],
        ascending=[False, True, True]).reset_index(drop=True)
    return rd.from_pandas(winners)


def inverted_index(
    ds: rd.Dataset,
    *,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Posting-list construction: term -> (df, comma-joined doc ids in
    ascending id order) for every term appearing in at least ``min_df``
    distinct documents — the index-build step of a BM25/search pipeline
    (postings as a string column so the relation is value-hash stable).

    Scale shape: per-block DISTINCT (term, doc) — globally exact because
    a document lives in one block — then ONE hash exchange on term into
    ``num_buckets`` groups; inside a bucket the df count and the join are
    vectorized pandas over that bucket's slice of the vocabulary."""
    import numpy as np

    from ..functions.hashing import BUCKET_COL, add_bucket

    if num_buckets is None:
        try:
            import ray
            num_buckets = max(16, int(ray.cluster_resources().get("CPU", 16)))
        except Exception:
            num_buckets = 16

    def distinct_pairs(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        df = t.to_pandas()
        toks = df[text_col].fillna("").str.split(" ")
        n = toks.str.len().fillna(0).astype(int).to_numpy()
        pairs = pd.DataFrame({
            id_col: np.repeat(df[id_col].to_numpy(), n),
            "term": np.concatenate(
                [np.asarray(w, dtype=object) for w in toks if len(w)] or
                [np.array([], dtype=object)]),
        }).drop_duplicates()
        out = pa.table({id_col: pairs[id_col].to_numpy(),
                        "term": pairs["term"].to_numpy()})
        return add_bucket(out, ("term",), num_buckets)

    def build(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["term", id_col], kind="stable")
        g["_s"] = g[id_col].astype("int64").astype(str)
        out = g.groupby("term", as_index=False).agg(
            df=(id_col, "size"), postings=("_s", ",".join))
        out["df"] = out["df"].astype("int64")
        return out[out["df"] >= min_df]

    # groupby is the ONLY exchange — no repartition first (it would be a
    # second redundant all-to-all over the corpus-scale pair relation)
    return (ds.map_batches(distinct_pairs, batch_format="pyarrow")
              .groupby(BUCKET_COL)
              .map_groups(build, batch_format="pandas")
              .sort("term"))


def cooccurrence(
    ds: rd.Dataset,
    k: int = 100,
    *,
    window: int = 3,
    text_col: str = "text",
) -> rd.Dataset:
    """Windowed skip-gram co-occurrence counts — the word2vec/GloVe
    preprocessing step: count every ordered token pair at distance
    1..``window`` within a document and keep the top ``k`` pairs
    (ties broken by pair text ascending). ``window=1`` degenerates to
    ``collocations``' bigram relation.

    Tokenization = the ``top_terms`` contract (split on one space).
    Scale shape: counts are pre-reduced per block over all ``window``
    offsets (a ``window``-step loop over vectorized shifted-slice
    pairings, not a token loop), so the single exchange moves
    pair-vocabulary-sized partials; sort+limit runs on the aggregated
    relation only."""
    from ray.data.aggregate import Sum

    if window < 1:
        raise ValueError(f"window must be >= 1, got {window}")

    def partial(t: "pa.Table") -> "pa.Table":
        # declared pyarrow — see top_terms.partial
        return _pair_counts_block(t.to_pandas()[text_col], window,
                                  "n_cooc")

    return (ds.map_batches(partial, batch_format="pyarrow")
              .groupby(["left_term", "right_term"])
              .aggregate(Sum("n_cooc", alias_name="n_cooc"))
              .sort(["n_cooc", "left_term", "right_term"],
                    descending=[True, False, False])
              .limit(k))


def oov_rate(
    ds: rd.Dataset,
    vocab_k: int = 100,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> rd.Dataset:
    """Vocabulary-coverage statistics — the tokenizer-coverage eval step:
    with vocab = the corpus's ``vocab_k`` most frequent terms (the
    ``top_terms`` relation, ties by term ascending), emit per document
    the token count, out-of-vocabulary token count, and
    ``oov_rate = n_oov / n_tokens`` (one IEEE double division of two
    int64s — bitwise engine-stable, the `readability` precedent).

    Scale shape: pass 1 is ``top_terms`` (block-reduced partials, one
    vocabulary-sized exchange, k winners to the driver); pass 2
    broadcasts the k-term set once via ``ray.put`` and scores each block
    statelessly (explode + ``isin`` + ``add.reduceat`` over per-doc
    segment offsets) — no second exchange, nothing pinned."""
    import numpy as np
    import ray

    winners = top_terms(ds, vocab_k, text_col=text_col).to_pandas()
    vocab_ref = ray.put(frozenset(winners["term"]))

    def score(t: "pa.Table") -> "pa.Table":
        import pyarrow as pa
        df = t.to_pandas()
        vocab = ray.get(vocab_ref)
        toks = df[text_col].fillna("").str.split(" ")
        n = toks.str.len().to_numpy().astype("int64")
        if not len(df):
            # id passes through with its NATIVE type (string/uuid ids are
            # fine); only the derived stats pin their own types
            return pa.table({id_col: t[id_col],
                             "n_tokens": pa.array([], type=pa.int64()),
                             "n_oov": pa.array([], type=pa.int64()),
                             "oov_rate": pa.array([], type=pa.float64())})
        flat = pd.Series(np.concatenate(
            [np.asarray(w, dtype=object) for w in toks]))
        oov = (~flat.isin(vocab)).to_numpy().astype("int64")
        # every doc has >= 1 token (split of '' is ['']), so the segment
        # offsets are strictly increasing and reduceat is well-defined
        offsets = np.r_[0, np.cumsum(n)[:-1]]
        n_oov = np.add.reduceat(oov, offsets)
        return pa.table({
            id_col: t[id_col],  # one row per input row, original dtype
            "n_tokens": n,
            "n_oov": n_oov.astype("int64"),
            "oov_rate": n_oov.astype("float64") / n.astype("float64"),
        })

    return ds.map_batches(score, batch_format="pyarrow")


def vocab_coverage(
    ds: rd.Dataset,
    *,
    text_col: str = "text",
    num_buckets: int | None = None,
) -> rd.Dataset:
    """Zipf vocabulary-coverage curve — the tokenizer-design statistic
    "how many terms cover X% of corpus tokens": per term its count ``n``,
    the inclusive running token total ``cum_tokens`` in (count desc,
    term asc) order, and ``cum_share = cum_tokens / total`` (one IEEE
    double division of exact int64s per row).

    Scale shape: one corpus pass of block-reduced unigram partials into
    a vocabulary-sized exchange; the counts relation is then PINNED
    (vocab-sized, sublinear in corpus bytes — the documented exception
    to the no-pin rule) because the distributed prefix scan's
    determinism contract re-executes its input lineage per pass. The
    scan rides ``running_sum`` with ``-n`` as the integer range axis
    and term as the tie-break."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    from .scan import running_sum

    def partial(t: "pa.Table") -> "pa.Table":
        terms, counts = _unigram_counts_block(t.to_pandas()[text_col])
        return pa.table({"term": terms, "n": counts})

    counts = (ds.map_batches(partial, batch_format="pyarrow")
                .groupby("term").aggregate(Sum("n", alias_name="n"))
                .materialize())
    total = counts.sum("n")
    if not total:
        return rd.from_pandas(pd.DataFrame({
            "term": pd.Series([], dtype="string"),
            "n": pd.Series([], dtype="int64"),
            "cum_tokens": pd.Series([], dtype="int64"),
            "cum_share": pd.Series([], dtype="float64"),
        }))
    total_f = pa.scalar(float(int(total)), pa.float64())

    def add_neg(t: "pa.Table") -> "pa.Table":
        return t.append_column("neg", pc.negate(t["n"]))

    keyed = counts.map_batches(add_neg, batch_format="pyarrow")
    # balance='quantile': the -count axis is Zipfian by construction (a
    # few huge counts, a long tail of small ones), so the default affine
    # range split would funnel nearly the whole vocabulary into one
    # bucket and serialize pass B; sampled boundaries keep buckets even
    scanned = running_sum(keyed, ["neg", "term"], "n",
                          out_col="cum_tokens", num_buckets=num_buckets,
                          balance="quantile")

    def finish(t: "pa.Table") -> "pa.Table":
        return pa.table({
            "term": t["term"],
            "n": t["n"],
            "cum_tokens": t["cum_tokens"],
            "cum_share": pc.divide(
                pc.cast(t["cum_tokens"], pa.float64()), total_f),
        })

    return (scanned.map_batches(finish, batch_format="pyarrow")
                   .sort(["n", "term"], descending=[True, False]))
