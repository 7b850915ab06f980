"""Round-5 (fourth session) operators: link extraction, domain degrees,
collocations, inverted index — each checked against an independent
brute-force reference, not the stage's own kernels."""
import re

import numpy as np
import pandas as pd
import ray.data as rd


def _links_ds(rows):
    return rd.from_pandas(pd.DataFrame(rows))


def test_extract_links_positions_and_decoys(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    rows = pd.DataFrame({
        "doc_id": [1, 2, 3, 4],
        "html": [
            # two links on one line + an href-less decoy between them
            '<p><a href="https://a.example/x">one</a>'
            '<a name="skip">no</a>'
            '<a class="z" href="/rel">two</a></p>',
            # no links at all
            "<p>plain text</p>",
            # link with attributes after href, and entity-free anchor
            '<a href="https://b.example/y" target="_blank">hi there</a>',
            # empty anchor text still matches ([^<]* allows '')
            '<a href="https://c.example/"></a>',
        ],
    })
    out = (tx.extract_links(_links_ds(rows))
           .to_pandas().sort_values(["doc_id", "link_pos"])
           .reset_index(drop=True))
    expect = pd.DataFrame({
        "doc_id": [1, 1, 3, 4],
        "link_pos": [1, 2, 1, 1],
        "href": ["https://a.example/x", "/rel",
                 "https://b.example/y", "https://c.example/"],
        "anchor": ["one", "two", "hi there", ""],
    })
    assert list(out["doc_id"]) == list(expect["doc_id"])
    assert list(out["link_pos"]) == list(expect["link_pos"])
    assert list(out["href"]) == list(expect["href"])
    assert list(out["anchor"]) == list(expect["anchor"])


def test_extract_links_empty_and_null(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    rows = pd.DataFrame({"doc_id": [7, 8], "html": [None, ""]})
    out = tx.extract_links(_links_ds(rows)).to_pandas()
    assert len(out) == 0
    # the per-batch kernel keeps a stable typed schema on empty input
    # (Ray's to_pandas drops columns for a fully-empty dataset)
    direct = tx.LinkExtract()(rows)
    assert list(direct.columns) == ["doc_id", "link_pos", "href", "anchor"]
    assert str(direct["doc_id"].dtype) == "int64"
    assert str(direct["link_pos"].dtype) == "int64"


def test_domain_degrees_counts_vs_bruteforce(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    rng = np.random.default_rng(11)
    docs = []
    for did in range(40):
        n = int(rng.integers(0, 6))
        parts = []
        for j in range(n):
            host = f"h{int(rng.integers(0, 7))}.example"
            parts.append(f'<a href="https://{host}/p/{did}/{j}">t</a>')
        if did % 3 == 0:
            parts.append(f'<a href="/relative/{did}">r</a>')  # filtered
        if did % 5 == 0:
            parts.append(f'<a href="http://plain{did % 2}.org/q">u</a>')
        docs.append({"doc_id": did, "html": "".join(parts)})
    df = pd.DataFrame(docs)

    links = tx.extract_links(rd.from_pandas(df, override_num_blocks=4))
    out = (tx.domain_degrees(links).to_pandas()
           .sort_values("host").reset_index(drop=True))

    # independent brute force over the raw HTML
    pat = re.compile(r'<a [^>]*href="([^"]*)"[^>]*>([^<]*)</a>')
    recs = []
    for _, r in df.iterrows():
        for m in pat.finditer(r["html"]):
            href = m.group(1)
            hm = re.match(r"^https?://([^/]+)", href)
            if hm:
                recs.append({"host": hm.group(1), "doc_id": r["doc_id"]})
    b = pd.DataFrame(recs)
    exp = (b.groupby("host")
           .agg(n_links=("doc_id", "size"), n_src_docs=("doc_id", "nunique"))
           .reset_index().sort_values("host").reset_index(drop=True))
    assert list(out["host"]) == list(exp["host"])
    assert list(out["n_links"]) == list(exp["n_links"])
    assert list(out["n_src_docs"]) == list(exp["n_src_docs"])

    # exact under ANY partitioning: splitting a document's links across
    # blocks must not inflate n_src_docs
    resplit = (tx.domain_degrees(links.repartition(13), num_buckets=3)
               .to_pandas().sort_values("host").reset_index(drop=True))
    assert list(resplit["n_src_docs"]) == list(exp["n_src_docs"])
    assert list(resplit["n_links"]) == list(exp["n_links"])


def test_collocations_vs_bruteforce(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    rng = np.random.default_rng(3)
    vocab = ["ab", "cd", "ef", "gh", "ij"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 12))))
             for _ in range(60)] + ["", "solo"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}),
                        override_num_blocks=4)
    out = tx.collocations(ds, 8).to_pandas().reset_index(drop=True)

    pairs, uni = {}, {}
    for t in texts:
        w = t.split(" ")
        for tok in w:
            uni[tok] = uni.get(tok, 0) + 1
        for a, b2 in zip(w, w[1:]):
            pairs[(a, b2)] = pairs.get((a, b2), 0) + 1
    ranked = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[:8]
    exp = pd.DataFrame({
        "left_term": [k[0] for k, _ in ranked],
        "right_term": [k[1] for k, _ in ranked],
        "n_pair": [v for _, v in ranked],
        "n_left": [uni[k[0]] for k, _ in ranked],
        "n_right": [uni[k[1]] for k, _ in ranked],
    })
    for col in exp.columns:
        assert list(out[col]) == list(exp[col]), col


def test_inverted_index_vs_bruteforce(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    texts = {
        10: "apple banana apple",       # within-doc dup counts once
        11: "banana cherry",
        12: "apple banana",
        13: "cherry apple",
        14: "",                         # empty-string token
        15: None,                       # null text
    }
    df = pd.DataFrame({"doc_id": list(texts), "text": list(texts.values())})
    ds = rd.from_pandas(df, override_num_blocks=3)
    out = (tx.inverted_index(ds, min_df=2, num_buckets=4)
           .to_pandas().sort_values("term").reset_index(drop=True))

    post = {}
    for did, t in texts.items():
        for tok in set((t or "").split(" ")):
            post.setdefault(tok, set()).add(did)
    exp = sorted((k, len(v), ",".join(str(i) for i in sorted(v)))
                 for k, v in post.items() if len(v) >= 2)
    assert list(out["term"]) == [e[0] for e in exp]
    assert list(out["df"]) == [e[1] for e in exp]
    assert list(out["postings"]) == [e[2] for e in exp]


def test_anchor_texts_composition_vs_bruteforce(ray_session):
    """extract_links -> host projection -> grouped_concat, checked
    against a direct regex + python groupby reference."""
    from openmrs_module_epts_etl_ray.pipelines.queries import q_anchor_texts

    out = (q_anchor_texts("/root/testdata/sf0.001").to_pandas()
           .sort_values("host").reset_index(drop=True))

    import pyarrow.parquet as pq
    docs = pq.read_table("/root/testdata/sf0.001/documents.parquet",
                         columns=["doc_id"]).to_pandas()
    exp = {}
    for did in sorted(docs["doc_id"]):
        for j in range(did % 4):
            host = f"host{(did * 7 + j) % 10}.example"
            exp.setdefault(host, []).append(f"link {did} {j}")
    hosts = sorted(exp)
    assert list(out["host"]) == hosts
    assert list(out["anchors"]) == ["|".join(exp[h]) for h in hosts]


def test_cooccurrence_vs_bruteforce(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    rng = np.random.default_rng(9)
    vocab = ["aa", "bb", "cc", "dd"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 10))))
             for _ in range(50)] + ["", "one two"]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}),
                        override_num_blocks=4)
    out = tx.cooccurrence(ds, 6, window=2).to_pandas().reset_index(drop=True)

    counts = {}
    for t in texts:
        w = t.split(" ")
        for i in range(len(w)):
            for d in (1, 2):
                if i + d < len(w):
                    key = (w[i], w[i + d])
                    counts[key] = counts.get(key, 0) + 1
    ranked = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:6]
    assert list(out["left_term"]) == [k[0] for k, _ in ranked]
    assert list(out["right_term"]) == [k[1] for k, _ in ranked]
    assert list(out["n_cooc"]) == [v for _, v in ranked]

    import pytest as _pytest
    with _pytest.raises(ValueError):
        tx.cooccurrence(ds, 5, window=0)


def test_inverted_index_doc_split_across_blocks_is_still_exact(ray_session):
    """The per-block DISTINCT contract: a document's row lives in exactly
    one block, so dedup is global. Verify with many blocks (more blocks
    than rows forces maximal splitting of the row set, never of a row)."""
    from openmrs_module_epts_etl_ray.stages import text as tx

    df = pd.DataFrame({
        "doc_id": list(range(8)),
        "text": ["x y x"] * 8,
    })
    ds = rd.from_pandas(df, override_num_blocks=8)
    out = tx.inverted_index(ds, min_df=1, num_buckets=2).to_pandas()
    row = out[out["term"] == "x"].iloc[0]
    assert row["df"] == 8
    assert row["postings"] == ",".join(str(i) for i in range(8))


def test_cooccurrence_window1_full_relation_matches_bigrams(ray_session):
    """window=1 with k >= all pairs must reproduce the exact bigram
    count relation (not just a top-k prefix)."""
    from openmrs_module_epts_etl_ray.stages import text as tx

    rng = np.random.default_rng(21)
    vocab = ["q", "r", "s"]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 8))))
             for _ in range(40)]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}),
                        override_num_blocks=5)
    out = (tx.cooccurrence(ds, 10_000, window=1).to_pandas()
           .sort_values(["left_term", "right_term"])
           .reset_index(drop=True))

    counts = {}
    for t in texts:
        w = t.split(" ")
        for a, b in zip(w, w[1:]):
            counts[(a, b)] = counts.get((a, b), 0) + 1
    exp = sorted(counts.items())
    assert list(zip(out["left_term"], out["right_term"])) \
        == [k for k, _ in exp]
    assert list(out["n_cooc"]) == [v for _, v in exp]


def test_extract_links_positions_are_contiguous(ray_session):
    """Per-document link positions are exactly 1..m for m matches,
    regardless of decoys interleaved between them."""
    from openmrs_module_epts_etl_ray.stages import text as tx

    rng = np.random.default_rng(33)
    rows = []
    expect = {}
    for did in range(30):
        m = int(rng.integers(0, 8))
        parts = []
        for j in range(m):
            if rng.random() < 0.5:
                parts.append(f'<a name="d{j}">decoy</a>')
            parts.append(f'<a href="u{did}/{j}">t{j}</a>')
        rows.append({"doc_id": did, "html": "".join(parts)})
        expect[did] = m
    out = tx.extract_links(
        rd.from_pandas(pd.DataFrame(rows), override_num_blocks=3)
    ).to_pandas()
    for did, grp in out.groupby("doc_id"):
        assert sorted(grp["link_pos"]) == list(range(1, expect[did] + 1))
    assert set(out["doc_id"]) == {d for d, m in expect.items() if m > 0}


def test_oov_rate_vs_bruteforce(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    rng = np.random.default_rng(17)
    common = ["the", "of", "and"]
    rare = [f"w{i}" for i in range(30)]
    texts = []
    for _ in range(40):
        n = int(rng.integers(1, 15))
        toks = [common[int(rng.integers(0, 3))] if rng.random() < 0.6
                else rare[int(rng.integers(0, 30))] for _ in range(n)]
        texts.append(" ".join(toks))
    texts += ["", None]
    df = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    ds = rd.from_pandas(df, override_num_blocks=4)
    out = (tx.oov_rate(ds, vocab_k=3).to_pandas()
           .sort_values("doc_id").reset_index(drop=True))

    uni = {}
    for t in texts:
        for tok in (t or "").split(" "):
            uni[tok] = uni.get(tok, 0) + 1
    vocab = {k for k, _ in sorted(uni.items(),
                                  key=lambda kv: (-kv[1], kv[0]))[:3]}
    for _, r in out.iterrows():
        w = (texts[int(r["doc_id"])] or "").split(" ")
        n_oov = sum(1 for tok in w if tok not in vocab)
        assert r["n_tokens"] == len(w)
        assert r["n_oov"] == n_oov
        assert r["oov_rate"] == n_oov / len(w)


def test_vocab_coverage_vs_bruteforce(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    rng = np.random.default_rng(5)
    vocab = [f"t{i}" for i in range(12)]
    texts = [" ".join(rng.choice(vocab, size=int(rng.integers(1, 20)),
                                 p=np.arange(12, 0, -1) / 78))
             for _ in range(50)] + ["", None]
    ds = rd.from_pandas(pd.DataFrame({"text": texts}),
                        override_num_blocks=4)
    out = tx.vocab_coverage(ds).to_pandas().reset_index(drop=True)

    uni = {}
    for t in texts:
        for tok in (t or "").split(" "):
            uni[tok] = uni.get(tok, 0) + 1
    ranked = sorted(uni.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(uni.values())
    cum = 0
    for i, (term, n) in enumerate(ranked):
        cum += n
        assert out.loc[i, "term"] == term
        assert out.loc[i, "n"] == n
        assert out.loc[i, "cum_tokens"] == cum
        assert out.loc[i, "cum_share"] == cum / float(total)
    assert out.loc[len(ranked) - 1, "cum_share"] == 1.0


def test_vocab_coverage_empty_corpus(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    # a corpus of only empty/null text has ONE term: '' (total > 0), so
    # force the truly-empty path with zero rows instead
    ds = rd.from_pandas(pd.DataFrame({"text": pd.Series([], dtype="string")}))
    out = tx.vocab_coverage(ds).to_pandas()
    assert len(out) == 0


def test_oov_rate_preserves_string_ids(ray_session):
    from openmrs_module_epts_etl_ray.stages import text as tx

    df = pd.DataFrame({"doc_id": ["u-1", "u-2", "u-3"],
                       "text": ["a b a", "c", None]})
    out = (tx.oov_rate(rd.from_pandas(df), vocab_k=1)
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["doc_id"]) == ["u-1", "u-2", "u-3"]
    # vocab = {'a'} (count 2); doc u-1: 1 OOV of 3; u-2: 1/1; null: 1/1
    assert list(out["n_tokens"]) == [3, 1, 1]
    assert list(out["n_oov"]) == [1, 1, 1]
