"""Training-data operators: dedup family, text analysis, similarity search,
multimodal plumbing."""
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from openmrs_module_epts_etl_ray.functions import text as T
from openmrs_module_epts_etl_ray.stages import dedup, multimodal, similarity
from openmrs_module_epts_etl_ray.stages.text import fingerprint, lang_id, text_stats


def docs_ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": texts}))


def test_exact_dedup_min_id_wins():
    ds = docs_ds(["same", "same", "other", "same"])
    out = dedup.exact_dedup(ds).to_pandas().sort_values("doc_id")
    assert out["doc_id"].tolist() == [0, 2]


def test_minhash_finds_planted_near_dup():
    base = "the quick brown fox jumps over the lazy dog " * 10
    near = base.replace("lazy", "sleepy", 1)
    far = "completely different words nothing shared here at all " * 10
    ds = docs_ds([base, near, far])
    cand = dedup.minhash_lsh_candidates(ds, num_perm=64, num_bands=16)
    verified = dedup.verify_jaccard(cand, ds, threshold=0.5).to_pandas()
    pairs = set(zip(verified["id_a"], verified["id_b"]))
    assert (0, 1) in pairs
    assert all(2 not in p for p in pairs)


def test_simhash_near_dup():
    base = "alpha beta gamma delta epsilon zeta eta theta " * 8
    near = base.replace("zeta", "zetas", 1)
    far = "x y z " * 30
    out = dedup.simhash_candidates(docs_ds([base, near, far]),
                                   max_hamming=6).to_pandas()
    pairs = set(zip(out["id_a"], out["id_b"]))
    assert (0, 1) in pairs
    # disjoint docs stay out even at the looser threshold
    assert all(2 not in p for p in pairs)


def test_jaccard_kernel():
    a = dedup.word_shingles("a b c d", 2)
    assert dedup.jaccard(a, a) == 1.0
    assert dedup.jaccard(a, set()) == 0.0


def test_embedding_near_dups_finds_planted_pair():
    rng = np.random.default_rng(3)
    V = rng.standard_normal((50, 16))
    V[7] = V[3] + 0.01 * rng.standard_normal(16)   # planted near-dup
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(50), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float32()))}))
    out = dedup.embedding_near_dups(ds, threshold=0.95).to_pandas()
    assert (3, 7) in set(zip(out["id_a"], out["id_b"]))


def test_brute_force_topk_matches_numpy():
    rng = np.random.default_rng(5)
    V = rng.standard_normal((100, 8))
    Q = rng.standard_normal((3, 8))
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float64()))}))
    out = similarity.brute_force_topk(ds, Q, [0, 1, 2], k=4).to_pandas()
    Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ Vn.T
    for q in range(3):
        want = list(np.argsort(-S[q])[:4])
        got = out[out.query_id == q].sort_values("rank")["vec_id"].tolist()
        assert got == want


def test_ivf_topk_reasonable_recall():
    rng = np.random.default_rng(6)
    V = rng.standard_normal((300, 8))
    Q = V[:2] + 0.01  # queries near existing vectors
    ds = rd.from_arrow(pa.table({
        "vec_id": pa.array(range(300), pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in V],
                              pa.list_(pa.float64()))}))
    out = similarity.ivf_topk(ds, Q, [0, 1], k=3, n_cells=8, n_probe=4).to_pandas()
    # the near-identical vector must be found for each query
    for q in (0, 1):
        assert q in out[out.query_id == q]["vec_id"].tolist()


def test_token_count_and_quality():
    s = pd.Series(["a b  c", "", None, "one"])
    assert T.token_count(s).tolist() == [3, 0, 0, 1]
    qm = T.quality_metrics(pd.Series(["ab! cd"]))
    assert qm["n_chars"][0] == 6
    assert qm["n_tokens"][0] == 2
    assert qm["punct_ratio"][0] == pytest.approx(1 / 6)


def test_predict_lang():
    s = pd.Series([
        "the cat and the dog of a to in is it for on",
        "el la de y que en un una los las",
        "der die das und von zu ein eine ist nicht",
    ])
    assert T.predict_lang(s).tolist() == ["en", "es", "de"]


def test_fingerprint_deterministic():
    s = pd.Series(["hello world " * 5, "hello world " * 5, "different"])
    fp = T.rolling_fingerprint(s)
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]


def test_text_stage_datasets():
    ds = docs_ds(["hello world", "foo"])
    st = text_stats(ds).to_pandas().sort_values("doc_id")
    assert st["n_tokens"].tolist() == [2, 1]
    li = lang_id(ds).to_pandas()
    assert set(li.columns) == {"doc_id", "predicted_lang"}
    fp = fingerprint(ds).to_pandas()
    assert len(fp) == 2


def test_multimodal_real_decode():
    media = multimodal.synthesize_media(30)
    feats = multimodal.decode_features(media).to_pandas()
    assert len(feats) == 30
    assert set(feats.columns) == {"media_id", "kind", "feature", "payload_bytes"}
    assert all(len(f) == 8 for f in feats["feature"])
    # REAL decode: image features carry true width/height (media_id % 3 != 0)
    img = feats[feats["kind"] == "image"].sort_values("media_id")
    assert all(f[0] >= 16 and f[1] == 16 for f in img["feature"])
    aud = feats[feats["kind"] == "audio"]
    assert all(f[0] == 8000 and f[1] > 0 for f in aud["feature"])
    # deterministic features
    feats2 = multimodal.decode_features(multimodal.synthesize_media(30)).to_pandas()
    a = feats.sort_values("media_id")["feature"].map(tuple).tolist()
    b = feats2.sort_values("media_id")["feature"].map(tuple).tolist()
    assert a == b


def test_ppm_wav_roundtrip_and_resize():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(16, 24, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    samp = rng.integers(-30000, 30000, 500).astype(np.int16)
    got, rate = multimodal.decode_wav_pcm16(multimodal.encode_wav_pcm16(samp, 8000))
    assert rate == 8000 and (got == samp).all()
    small = multimodal.resize_nearest(img, 8, 8)
    assert small.shape == (8, 8, 3)


def test_multimodal_resize_stage():
    media = multimodal.synthesize_media(12)
    out = multimodal.resize_images(media, 8, 8).to_pandas()
    imgs = out[out["mime"] == multimodal.PPM_MIME]
    assert (imgs["width"] == 8).all() and (imgs["height"] == 8).all()
    decoded = multimodal.decode_ppm(bytes(imgs["payload"].iloc[0]))
    assert decoded.shape == (8, 8, 3)


def test_resize_stage_preserves_passthrough_dims():
    # non-image rows (audio, video containers) pass through ResizeStage
    # untouched INCLUDING their width/height metadata — mapping them to
    # None destroyed the dimensions of AVI rows
    stage = multimodal.ResizeStage(8, 8)
    batch = pd.DataFrame({
        "media_id": [1, 2],
        "kind": ["image", "video"],
        "payload": [multimodal.encode_ppm(
            np.full((16, 16, 3), 5, dtype=np.uint8)), b"not-an-image"],
        "mime": [multimodal.PPM_MIME, "video/x-msvideo"],
        "width": pd.array([16, 32], dtype="Int32"),
        "height": pd.array([16, 24], dtype="Int32"),
    })
    out = stage(batch)
    assert out["width"].tolist() == [8, 32]
    assert out["height"].tolist() == [8, 24]
    assert bytes(out["payload"].iloc[1]) == b"not-an-image"


def test_multimodal_codec_formats_stay_stubbed():
    # PNG is REAL since round 4, JPEG since round 5 (pure-stdlib codecs):
    # a malformed payload of either is now a decode error, not
    # NotImplementedError; only video-container mimes remain stubbed
    import pandas as pd
    stage = multimodal.DecodeStage(fake=False)
    batch = pd.DataFrame({
        "media_id": [1], "kind": ["image"],
        "payload": [b"\xff\xd8\xff\xe0...."], "mime": ["image/jpeg"]})
    with pytest.raises(ValueError):
        stage(batch)
    bad_png = batch.assign(payload=[b"\x89PNG...."], mime=["image/png"])
    with pytest.raises(ValueError, match="not a PNG"):
        stage(bad_png)
    mp4 = batch.assign(payload=[b"\x00\x00\x00\x18ftypmp42"],
                       mime=["video/mp4"])
    with pytest.raises(NotImplementedError):
        stage(mp4)


def test_verify_jaccard_shuffle_matches_broadcast():
    texts = []
    base = "one two three four five six seven eight nine ten " * 6
    for i in range(40):
        if i % 4 == 0:
            texts.append(base.replace("five", f"v{i}", 1))
        else:
            texts.append(f"unique document number {i} " * 12)
    ds = docs_ds(texts)
    cand = dedup.minhash_lsh_candidates(ds, num_perm=64, num_bands=16)
    a = dedup.verify_jaccard(cand, ds, threshold=0.5,
                             strategy="broadcast").to_pandas()
    b = dedup.verify_jaccard(cand, ds, threshold=0.5,
                             strategy="shuffle").to_pandas()
    key = ["id_a", "id_b"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b[a.columns].sort_values(key).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0


def test_connected_components_join_matches_broadcast_and_driver():
    edges = pd.DataFrame({
        "id_a": [1, 2, 5, 9, 20, 21, 30],
        "id_b": [2, 3, 6, 10, 21, 22, 31],
    })
    ds = rd.from_pandas(edges)
    want = dedup._connected_components_driver(ds).sort_values("doc_id") \
        .reset_index(drop=True)
    for lookup in ("broadcast", "join"):
        got = dedup.connected_components_distributed(ds, lookup=lookup) \
            .to_pandas().sort_values("doc_id").reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got.astype("int64"), want.astype("int64"), check_dtype=False)


def test_connected_components_auto_dispatches_to_distributed():
    edges = pd.DataFrame({"id_a": [1, 2], "id_b": [2, 3]})
    out = dedup.connected_components(rd.from_pandas(edges), driver_threshold=1)
    got = out.to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["canonical_id"].tolist() == [1, 1, 1]


def test_minhash_signature_batch_matches_single():
    mh = dedup.MinHasher(num_perm=32, k=3)
    texts = ["a b c d e f", "x", "", "a b", "w1 w2 w3 w4 w5 " * 3]
    batch = pd.DataFrame({"doc_id": range(len(texts)), "text": texts})
    out = mh(batch)
    for i, t in enumerate(texts):
        np.testing.assert_array_equal(np.asarray(out["sig"][i]),
                                      mh.signature(t))


def test_video_frame_sampling():
    rng = np.random.default_rng(4)
    frames = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8)
              for _ in range(6)]
    payload = multimodal.encode_ppm_video(frames)
    back = multimodal.decode_ppm_video(payload)
    assert len(back) == 6 and all((a == b).all() for a, b in zip(frames, back))

    media = rd.from_arrow(pa.table({
        "media_id": pa.array([7], pa.int64()),
        "kind": ["video"],
        "payload": pa.array([payload], pa.large_binary()),
        "mime": [multimodal.VIDEO_MIME],
        "width": pa.array([8], pa.int32()),
        "height": pa.array([8], pa.int32()),
        "duration_ms": pa.array([240], pa.int64()),
    }, schema=multimodal.MEDIA_SCHEMA))
    out = multimodal.sample_frames(media, every=2).to_pandas()
    assert len(out) == 3                         # frames 0, 2, 4
    assert (out["kind"] == "image").all()
    assert sorted(out["media_id"]) == [7_000_000, 7_000_002, 7_000_004]
    # sampled frames decode back to the original pixels
    got = multimodal.decode_ppm(bytes(out.sort_values("media_id")["payload"].iloc[1]))
    assert (got == frames[2]).all()
    # image feature extraction composes downstream
    feats = multimodal.decode_features(out_ds := multimodal.sample_frames(media, every=2))
    assert len(feats.to_pandas()) == 3


def test_term_doc_frequency_exact(ray_session):
    import pandas as pd
    import pyarrow as pa
    import ray.data as rd

    from openmrs_module_epts_etl_ray.stages.text import term_doc_frequency

    docs = pa.table({
        "doc_id": [1, 2, 3, 4],
        "text": ["a b a  c", "b b b", "", None],
    })
    out = term_doc_frequency(rd.from_arrow(docs).repartition(3)) \
        .to_pandas().sort_values(["doc_id", "term"]).reset_index(drop=True)
    want = pd.DataFrame({
        "doc_id": [1, 1, 1, 2],
        "term": ["a", "b", "c", "b"],
        "tf": [2, 1, 1, 3],
        "df": [1, 2, 1, 2],
    })
    pd.testing.assert_frame_equal(
        out[["doc_id", "term", "tf", "df"]].astype(
            {"tf": "int64", "df": "int64"}), want)


def test_passage_dedup_first_occurrence_wins():
    docs = [
        {"doc_id": 1, "text": "a b c d e f g h i j k l m"},   # 2 passages
        {"doc_id": 2, "text": "a b c d e f g h i j x y"},     # passage0 dup
        {"doc_id": 3, "text": "a b c d e f g h i j k l m"},   # fully dup
        {"doc_id": 4, "text": "zz"},
    ]
    out = dedup.passage_dedup(rd.from_items(docs).repartition(3),
                              chunk_words=10) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["clean_text"]) == \
        ["a b c d e f g h i j k l m", "x y", "", "zz"]
    assert list(out["n_kept"]) == [2, 1, 0, 1]
    assert list(out["n_dropped"]) == [0, 1, 2, 0]


def test_passage_dedup_intra_doc_duplicates():
    # the SAME passage repeated inside one doc: only its first position kept
    t = " ".join(["w"] * 30)  # 3 identical 10-word passages
    out = dedup.passage_dedup(rd.from_items([{"doc_id": 7, "text": t}]),
                              chunk_words=10).to_pandas()
    assert out.loc[0, "clean_text"] == " ".join(["w"] * 10)
    assert int(out.loc[0, "n_kept"]) == 1 and int(out.loc[0, "n_dropped"]) == 2


def test_decontaminate_drops_and_audits():
    from openmrs_module_epts_etl_ray.stages.text import decontaminate
    ds = docs_ds(["the quick brown fox", "hello world", "quick brown", "clean"])
    clean = decontaminate(ds, ["quick brown"]).to_pandas()
    assert sorted(clean["text"]) == ["clean", "hello world"]
    dirty = decontaminate(ds, ["quick brown"], invert=True).to_pandas()
    assert sorted(dirty["text"]) == ["quick brown", "the quick brown fox"]
    # empty snippet list keeps everything
    assert len(decontaminate(ds, []).to_pandas()) == 4


def test_decontaminate_regex_path_matches_per_snippet(monkeypatch):
    from openmrs_module_epts_etl_ray.stages import text as tmod
    texts = ["alpha beta gamma", "a.b(c)d", "needle in haystack",
             "no match here", "regex specials .* should be literal"]
    ds = docs_ds(texts)
    snips = ["beta ga", "a.b(c)", ".*", "absent"]
    monkeypatch.setattr(tmod, "_DECON_REGEX_FROM", 10**9)
    per = sorted(tmod.decontaminate(ds, snips).to_pandas()["text"])
    monkeypatch.setattr(tmod, "_DECON_REGEX_FROM", 1)
    dfa = sorted(tmod.decontaminate(ds, snips).to_pandas()["text"])
    # snippets are escaped, so ".*" only hits its literal occurrence
    assert per == dfa == ["needle in haystack", "no match here"]


def test_top_terms_exact_with_tiebreak():
    from openmrs_module_epts_etl_ray.stages.text import top_terms
    ds = docs_ds(["b a a", "c b a", "d c b a"]).repartition(3)
    out = top_terms(ds, k=3).to_pandas()
    assert list(out["term"]) == ["a", "b", "c"]   # 4,3,2 — then d=1 cut
    assert list(out["n"]) == [4, 3, 2]
    # tie at the k-boundary resolves by term text ascending
    tie = top_terms(docs_ds(["z y", "y z x"]), k=2).to_pandas()
    assert list(tie["term"]) == ["y", "z"] and list(tie["n"]) == [2, 2]


def test_decontaminate_ngrams_counts_overlaps():
    from openmrs_module_epts_etl_ray.stages.text import decontaminate_ngrams
    ds = docs_ds([
        "a b c d e",       # grams "a b c","b c d","c d e" all occur in evals
        "x y z",           # no overlap
        "b c d x",         # only "b c d" hits
        "short",           # <3 words, no grams
        "",                # empty
    ])
    out = decontaminate_ngrams(
        ds, ["q a b c d q", "zz c d e zz"], n=3).to_pandas() \
        .set_index("doc_id")["n_hits"].to_dict()
    assert out == {0: 3, 1: 0, 2: 1, 3: 0, 4: 0}
    # eval text with <n words contributes nothing and doesn't crash
    none = decontaminate_ngrams(ds, ["xy"], n=3).to_pandas()
    assert none["n_hits"].sum() == 0


def test_shuffle_rank_is_portable_permutation():
    import hashlib

    from openmrs_module_epts_etl_ray.stages.sampling import shuffle_rank

    n = 300
    ds = rd.from_items([{"k": i} for i in range(n)]).repartition(5)
    out = shuffle_rank(ds, "k", seed="e1").to_pandas()
    order = sorted(range(n),
                   key=lambda i: hashlib.sha256(f"e1:{i}".encode()).hexdigest())
    want = {i: p for p, i in enumerate(order)}
    assert dict(zip(out["k"], out["shuffle_pos"])) == want
    # different seed -> different permutation
    out2 = shuffle_rank(ds, "k", seed="e2").to_pandas()
    assert dict(zip(out2["k"], out2["shuffle_pos"])) != want


def test_assign_clusters_argmax_min_id_tiebreak():
    # two identical centroids: tie must break to the smaller centroid id
    C = np.array([[1.0, 0.0], [1.0, 0.0], [0.0, 1.0]])
    ds = rd.from_items([
        {"vec_id": 10, "embedding": [2.0, 0.1]},
        {"vec_id": 11, "embedding": [0.1, 3.0]},
    ])
    out = similarity.assign_clusters(ds, C, [0, 1, 2]) \
        .to_pandas().sort_values("vec_id")
    assert list(out["cluster_id"]) == [0, 2]


def test_semdedup_pairs_finds_planted_in_cluster_dup():
    rng = np.random.default_rng(5)
    C = rng.normal(size=(4, 16))
    rows = [{"vec_id": i, "embedding": list(rng.normal(size=16))}
            for i in range(4, 60)]
    v = rng.normal(size=16)
    rows += [{"vec_id": 100, "embedding": list(v)},
             {"vec_id": 101, "embedding": list(v + 0.01)}]
    out = similarity.semdedup_pairs(
        rd.from_items(rows).repartition(4), C, [0, 1, 2, 3],
        threshold=0.95).to_pandas()
    assert [(100, 101)] == list(zip(out["id_a"], out["id_b"]))
    # threshold filters: nothing else among random 16-dim vectors at 0.95
    assert (out["cosine"] >= 0.95).all()


def test_repetition_stats_counts():
    from openmrs_module_epts_etl_ray.stages.text import repetition_stats
    out = repetition_stats(rd.from_items([
        {"doc_id": 1, "text": "a b a b c"},   # ab,ba,ab,bc
        {"doc_id": 2, "text": "x"},           # no bigrams -> no row
        {"doc_id": 3, "text": "q q q q"},     # qq x3
    ]).repartition(2)).to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert list(out["doc_id"]) == [1, 3]
    assert list(out["n_bigrams"]) == [4, 3]
    assert list(out["n_distinct"]) == [3, 1]
    assert list(out["top_count"]) == [2, 3]


def test_redact_terms_whole_word_only():
    from openmrs_module_epts_etl_ray.stages.text import redact_terms
    out = redact_terms(rd.from_items([
        {"doc_id": 1, "text": "spark and sparkle spark"},
        {"doc_id": 2, "text": "clean"},
    ]), ["spark"], "[X]").to_pandas().sort_values("doc_id")
    assert list(out["text"]) == ["[X] and sparkle [X]", "clean"]
    assert list(out["n_redacted"]) == [2, 0]
    # regex metacharacters in terms are literals
    out2 = redact_terms(rd.from_items([{"doc_id": 1, "text": "a.b ab axb"}]),
                        ["a.b"], "[X]").to_pandas()
    assert out2.loc[0, "text"] == "[X] ab axb"


def _py_substr_dedup(texts, L):
    from collections import Counter
    grams = Counter()
    for t in texts:
        for i in range(len(t) - L + 1):
            grams[t[i:i + L]] += 1
    out = {}
    for d, t in enumerate(texts):
        starts = [i for i in range(len(t) - L + 1) if grams[t[i:i + L]] >= 2]
        cov = [False] * len(t)
        for s in starts:
            for j in range(s, min(s + L, len(t))):
                cov[j] = True
        clean = "".join(c for c, m in zip(t, cov) if not m)
        out[d] = (clean, len(starts), sum(cov))
    return out


def test_exact_substring_dedup_bruteforce():
    from openmrs_module_epts_etl_ray.stages.dedup import exact_substring_dedup
    texts = [
        "the quick brown fox jumps over the lazy dog",
        "xx the quick brown fox sat on a mat yy",   # shares a >=10 span
        "completely unrelated content here",
        "aaaaaaaaaaaaaaaaaaaaaa",                    # self-repetitive
        "short",                                     # < L, no windows
        "",
    ]
    L = 10
    out = exact_substring_dedup(docs_ds(texts).repartition(3), min_len=L) \
        .to_pandas().set_index("doc_id")
    got = {int(i): (r["clean_text"], int(r["n_dup_starts"]),
                    int(r["n_dup_chars"]))
           for i, r in out.iterrows()}
    assert got == _py_substr_dedup(texts, L)
