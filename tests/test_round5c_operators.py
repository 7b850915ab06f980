"""Round-5 (third session) operators: audio windowing, HTML stripping."""
import numpy as np
import pandas as pd
import pytest
import ray.data as rd


def test_audio_windows_matches_numpy(ray_session):
    from openmrs_module_epts_etl_ray.stages import multimodal as mm

    rng = np.random.default_rng(7)
    clips = []
    for mid in range(6):
        n = int(rng.integers(1, 900))
        samp = rng.integers(-30000, 30000, size=n).astype(np.int16)
        clips.append((mid, samp))
    rows = pd.DataFrame({
        "media_id": [m for m, _ in clips],
        "kind": ["audio"] * len(clips),
        "payload": [mm.encode_wav_pcm16(s, 8000) for _, s in clips],
        "mime": [mm.WAV_MIME] * len(clips),
    })
    out = mm.audio_windows(rd.from_pandas(rows), window_samples=128,
                           concurrency=1).to_pandas()

    expect = []
    for mid, samp in clips:
        x = samp.astype(np.float64)
        for j, lo in enumerate(range(0, len(samp), 128)):
            w = x[lo:lo + 128]
            expect.append({
                "window_id": mid * 1_000_000 + j,
                "n_samples": len(w),
                "peak": int(np.max(np.abs(w))),
                "rms": float(np.sqrt(np.mean(w * w))),
                "rate": 8000,
            })
    edf = pd.DataFrame(expect)
    out = out.sort_values("window_id").reset_index(drop=True)
    edf = edf.sort_values("window_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        out.astype({"window_id": "int64", "n_samples": "int64",
                    "peak": "int64", "rate": "int64"}),
        edf.astype({"window_id": "int64", "n_samples": "int64",
                    "peak": "int64", "rate": "int64"}))


def test_audio_windows_drops_non_audio_and_validates(ray_session):
    from openmrs_module_epts_etl_ray.stages import multimodal as mm

    img = np.zeros((4, 4, 3), dtype=np.uint8)
    rows = pd.DataFrame({
        "media_id": [1, 2],
        "kind": ["image", "audio"],
        "payload": [mm.encode_ppm(img),
                    mm.encode_wav_pcm16(np.full(10, 5, np.int16), 16000)],
        "mime": [mm.PPM_MIME, mm.WAV_MIME],
    })
    out = mm.audio_windows(rd.from_pandas(rows), window_samples=4,
                           concurrency=1).to_pandas()
    # only the WAV row survives: 10 samples / window 4 -> 3 windows
    assert sorted(out["window_id"]) == [2_000_000, 2_000_001, 2_000_002]
    assert list(out.sort_values("window_id")["n_samples"]) == [4, 4, 2]
    assert set(out["peak"]) == {5}
    assert np.allclose(out["rms"], 5.0)
    assert set(out["rate"]) == {16000}

    with pytest.raises(ValueError):
        mm.AudioWindowStage(window_samples=0)


def test_strip_html_rules(ray_session):
    from openmrs_module_epts_etl_ray.stages.text import strip_html

    cases = [
        # script/style dropped WITH content, tags -> space, collapse+trim
        ('<html><script src="x">var a = "<p>";</script>'
         '<style>p{}</style><p>hello   world</p></html>',
         "hello world"),
        # comments (multi-line) dropped with content
        ("a<!-- one\ntwo -->b", "a b"),
        # entity order: &amp; decoded LAST so &amp;lt; -> literal &lt;
        ("x &amp;lt; y &lt;z&gt; &quot;q&#39;s&quot;&nbsp;w &amp; v",
         'x &lt; y <z> "q\'s" w & v'),
        # case-insensitive script match, attributes in the open tag
        ('<SCRIPT type="a">junk</ScRiPt>ok', "ok"),
        # None -> empty
        (None, ""),
        # any '<...>' span is a tag under rule 3, even prose-looking ones
        ("a < b and c > d", "a d"),
        # a '<' with NO later '>' cannot match '<[^>]*>' and survives
        ("a < b and c", "a < b and c"),
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(cases), dtype=np.int64),
        "text": [c[0] for c in cases],
    }))
    out = strip_html(ds, "text").to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "clean_text"]
    assert list(out["clean_text"]) == [c[1] for c in cases]
