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


# ---------------------------------------------------------------------------
# GIF codec (stages/gif.py)
# ---------------------------------------------------------------------------


def test_gif_roundtrip_fuzz():
    from openmrs_module_epts_etl_ray.stages.gif import decode_gif, encode_gif

    rng = np.random.default_rng(11)
    for trial in range(60):
        h = int(rng.integers(1, 40))
        w = int(rng.integers(1, 40))
        ncol = int(rng.integers(1, 17))
        colors = rng.integers(0, 256, (ncol, 3), dtype=np.uint8)
        img = colors[rng.integers(0, ncol, (h, w))]
        payload = encode_gif([img], interlace=bool(trial % 2),
                             local_palettes=trial % 3 == 0)
        out = decode_gif(payload)
        assert len(out) == 1 and (out[0] == img).all()


def test_gif_full_table_and_max_width():
    # 256-color noise forces 12-bit codes and the table-full CLEAR path
    from openmrs_module_epts_etl_ray.stages.gif import decode_gif, encode_gif

    rng = np.random.default_rng(3)
    g = rng.integers(0, 256, (200, 200), dtype=np.uint8)
    img = np.stack([g, g, g], axis=-1)
    for interlace in (False, True):
        assert (decode_gif(encode_gif([img], interlace=interlace))[0]
                == img).all()


def test_gif_animation_and_transparency():
    from openmrs_module_epts_etl_ray.stages.gif import decode_gif, encode_gif

    frames = [np.full((16, 16, 3), v, np.uint8) for v in (3, 7, 250)]
    out = decode_gif(encode_gif(frames, delay_cs=4))
    assert len(out) == 3
    assert all((a == b).all() for a, b in zip(out, frames))

    # transparent pixels in frame 2 leave frame 1's canvas visible
    f1 = np.full((8, 8, 3), 10, np.uint8)
    f2 = np.full((8, 8, 3), 20, np.uint8)
    f2[:4] = 30
    out = decode_gif(encode_gif([f1, f2],
                                transparent_color=(30, 30, 30)))
    exp2 = f2.copy()
    exp2[:4] = 10
    assert (out[0] == f1).all() and (out[1] == exp2).all()


def test_gif_superset_palette_and_errors():
    from openmrs_module_epts_etl_ray.stages.gif import (
        build_palette, decode_gif, encode_gif)

    pal = np.array([[1, 1, 1], [5, 5, 5], [9, 9, 9], [13, 13, 13]],
                   np.uint8)
    img = np.full((6, 6, 3), 9, np.uint8)
    assert (decode_gif(encode_gif([img], palette=pal))[0] == img).all()

    with pytest.raises(ValueError, match="missing from supplied palette"):
        encode_gif([np.full((2, 2, 3), 77, np.uint8)], palette=pal)
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"NOPE")
    # >256 colors must refuse, not quantize silently
    rng = np.random.default_rng(0)
    big = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
    assert len(build_palette([np.zeros((1, 1, 3), np.uint8)])) == 1
    with pytest.raises(ValueError, match="exceed the 256-entry"):
        encode_gif([big])


# ---------------------------------------------------------------------------
# gzip JSON-lines export format (pipelines/export.py fmt="json.gz")
# ---------------------------------------------------------------------------


def test_export_roundtrip_json_gz(ray_session, tmp_path):
    import gzip
    import os

    from openmrs_module_epts_etl_ray.pipelines.export import (
        export_files, read_export)

    df = pd.DataFrame({"k": np.arange(200, dtype=np.int64),
                       "name": [f"n{i}" for i in range(200)]})
    ds = rd.from_pandas(df).repartition(4)
    out = str(tmp_path / "gz")
    manifest = export_files(ds, out, fmt="json.gz")
    assert len(manifest) >= 1
    files = [f for f in os.listdir(out) if os.path.isfile(f"{out}/{f}")]
    assert files and all(f.endswith(".json.gz") for f in files)
    # shards really are gzip-compressed JSON lines
    first = sorted(files)[0]
    line = gzip.open(f"{out}/{first}").readline()
    assert line.startswith(b"{") and b'"k"' in line

    back = read_export(out, fmt="json.gz").to_pandas().sort_values("k")
    assert list(back["k"]) == list(range(200))
    assert list(back["name"]) == [f"n{i}" for i in range(200)]

    # config-level: EXPORT with dstType json.gz then read back as a LOAD
    # source would
    import pyarrow as pa
    import pyarrow.parquet as pq

    from openmrs_module_epts_etl_ray.pipelines.config import run_config
    pq.write_table(pa.Table.from_pandas(df), str(tmp_path / "mytab.parquet"))
    exp = str(tmp_path / "site_export")
    run_config({"processType": "DB_QUICK_EXPORT", "etlConfiguration": [{
        "srcConf": {"sfDir": str(tmp_path), "tableName": "mytab"},
        "dstConf": [{"tableName": "mytab_gz", "dstType": "json.gz",
                     "outDir": exp,
                     "mapping": [{"srcField": "k", "dstField": "k"},
                                 {"srcField": "name", "dstField": "name"}]}],
    }]})
    loaded = read_export(exp, fmt="json.gz").to_pandas().sort_values("k")
    assert list(loaded["k"]) == list(range(200))


def test_gif_through_decode_and_resize_stages(ray_session):
    from openmrs_module_epts_etl_ray.stages import multimodal

    docs = rd.from_pandas(pd.DataFrame({"doc_id": np.arange(30,
                                                            dtype=np.int64)}))
    media = multimodal.gif_media_from_ids(docs)
    feats = multimodal.decode_features(media).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    for r in feats.itertuples():
        f = np.asarray(r.feature)
        assert f[0] == 16 + (r.media_id % 4) * 8 and f[1] == 16
        assert f[2] == r.media_id % 256

    resized = multimodal.resize_images(media, 8, 8)
    rf = multimodal.decode_features(resized).to_pandas()
    rfe = np.stack(rf["feature"].to_numpy())
    assert (rfe[:, 0] == 8).all() and (rfe[:, 1] == 8).all()

    videos = multimodal.gif_videos_from_ids(docs)
    frames = multimodal.sample_frames(videos, every=2).to_pandas() \
        .sort_values("media_id").reset_index(drop=True)
    # ids 0,10,20 -> 2, 4, 2 frames -> sampled 0th (+2nd for id 10)
    want = {(0, 0), (10, 0), (10, 2), (20, 0)}
    got = {(r.media_id // 1_000_000, r.media_id % 1_000_000)
           for r in frames.itertuples()}
    assert got == want
