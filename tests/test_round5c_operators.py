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
        # UNCLOSED script (truncated crawl page): JS must not leak
        ("keep<script>var a=1;var b=2;", "keep"),
        # unclosed style likewise
        ("x<style>p{color:red}", "x"),
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(cases), dtype=np.int64),
        "text": [c[0] for c in cases],
    }))
    out = strip_html(ds, "text").to_pandas().sort_values("doc_id")
    assert list(out.columns) == ["doc_id", "clean_text"]
    assert list(out["clean_text"]) == [c[1] for c in cases]


def test_pii_scrub_classes_and_order(ray_session):
    from openmrs_module_epts_etl_ray.stages.text import pii_scrub

    cases = [
        # one of each class
        ("mail a.b+c@x-y.io or 555-010-1234 from 10.0.0.1",
         "mail [EMAIL] or [PHONE] from [IP]", 1, 1, 1),
        # email digits are scrubbed BEFORE the phone pass can see them
        ("555123@4567.com", "[EMAIL]", 1, 0, 0),
        # space-separated phone variant; dotted quad inside a word boundary
        ("call 123 456 7890 now 1.2.3.4!", "call [PHONE] now [IP]!",
         0, 1, 1),
        # no PII
        ("plain text", "plain text", 0, 0, 0),
        # null text
        (None, "", 0, 0, 0),
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(cases), dtype=np.int64),
        "text": [c[0] for c in cases],
    }))
    out = (pii_scrub(ds, "text", out_col="clean")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["clean"]) == [c[1] for c in cases]
    assert list(out["n_email"]) == [c[2] for c in cases]
    assert list(out["n_phone"]) == [c[3] for c in cases]
    assert list(out["n_ipv4"]) == [c[4] for c in cases]


def test_normalize_urls_rules(ray_session):
    from openmrs_module_epts_etl_ray.stages.text import normalize_urls

    cases = [
        # fragment drop, authority lowercase, default https port, utm pair
        ("HTTPS://Example.COM:443/Path?utm_source=x&a=B#frag",
         "https://example.com/Path?a=B", "example.com", "example.com"),
        # default http port + bare-authority trailing slash
        ("http://A.b.C.com:80/", "http://a.b.c.com", "a.b.c.com", "c.com"),
        # userinfo kept in the key but stripped from host; trailing utm
        ("http://User@Site.org/x/?utm_a=1",
         "http://user@site.org/x/", "site.org", "site.org"),
        # middle utm param keeps surrounding params intact
        ("ftp://Host.Net/Q?b=2&utm_c=3&z=4",
         "ftp://host.net/Q?b=2&z=4", "host.net", "host.net"),
        # non-default port survives; path case preserved
        ("https://One.Two.com:8443/PaTh", "https://one.two.com:8443/PaTh",
         "one.two.com", "two.com"),
        # :443 on http is NOT a default port
        ("http://a.com:443/x", "http://a.com:443/x", "a.com", "a.com"),
        # a param NAMED xutm_source is not a tracking param: untouched
        ("http://a.com/p?xutm_source=1&b=2",
         "http://a.com/p?xutm_source=1&b=2", "a.com", "a.com"),
        # consecutive utm params collapse as one run
        ("http://a.com/p?utm_a=1&utm_b=2&c=3",
         "http://a.com/p?c=3", "a.com", "a.com"),
        # all-utm query disappears entirely
        ("http://a.com/p?utm_a=1&utm_b=2", "http://a.com/p",
         "a.com", "a.com"),
        # utm run in the middle, non-utm on both sides
        ("http://a.com/p?a=1&utm_b=2&utm_c=3&z=4",
         "http://a.com/p?a=1&z=4", "a.com", "a.com"),
        # schemeless rows pass through (minus fragment), empty host/domain
        ("example.com/page#f", "example.com/page", "", ""),
        ("//proto.relative/x", "//proto.relative/x", "", ""),
        ("/relative/path?utm_a=1", "/relative/path?utm_a=1", "", ""),
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(cases), dtype=np.int64),
        "url": [c[0] for c in cases],
    }))
    out = (normalize_urls(ds, "url")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))
    assert list(out["url_norm"]) == [c[1] for c in cases]
    assert list(out["host"]) == [c[2] for c in cases]
    assert list(out["domain"]) == [c[3] for c in cases]


def test_readability_counts_and_score(ray_session):
    from openmrs_module_epts_etl_ray.stages.text import readability

    cases = [
        # words=5, sentences=2 ('.' and '!'), syllable groups counted
        "Hello world. Two more sents!",
        # no terminators / empty / null floor at 1
        "no terminator here",
        "",
        None,
        # y counts as a vowel group; '...' is ONE terminator run
        "Rhythm myth... why?",
    ]
    ds = rd.from_pandas(pd.DataFrame({
        "doc_id": np.arange(len(cases), dtype=np.int64),
        "text": cases,
    }))
    out = (readability(ds, "text")
           .to_pandas().sort_values("doc_id").reset_index(drop=True))

    import re
    for j, txt in enumerate(cases):
        t = txt or ""
        w = len(re.findall(r"\S+", t))
        s = len(re.findall(r"[.!?]+", t))
        y = len(re.findall(r"[aeiouy]+", t, re.I))
        assert out.loc[j, "n_words"] == w
        assert out.loc[j, "n_sentences"] == s
        assert out.loc[j, "n_syllables"] == y
        expect = 206.835 - 1.015 * (max(w, 1) / max(s, 1)) \
            - 84.6 * (y / max(w, 1))
        assert out.loc[j, "flesch"] == expect


def test_resample_audio_decimates_and_passes_images(ray_session):
    from openmrs_module_epts_etl_ray.stages import multimodal as mm

    samp = np.arange(-5, 6, dtype=np.int16) * 100  # 11 samples
    img = np.full((4, 4, 3), 7, dtype=np.uint8)
    rows = pd.DataFrame({
        "media_id": [1, 2],
        "kind": ["audio", "image"],
        "payload": [mm.encode_wav_pcm16(samp, 8000), mm.encode_ppm(img)],
        "mime": [mm.WAV_MIME, mm.PPM_MIME],
    })
    out = (mm.resample_audio(rd.from_pandas(rows), 3, concurrency=1)
           .to_pandas().sort_values("media_id").reset_index(drop=True))
    dec, rate = mm.decode_wav_pcm16(bytes(out.loc[0, "payload"]))
    assert rate == 8000 // 3
    np.testing.assert_array_equal(dec, samp[::3])
    # image payload untouched
    assert bytes(out.loc[1, "payload"]) == mm.encode_ppm(img)
    # factor 1 is the identity
    same = (mm.resample_audio(rd.from_pandas(rows), 1, concurrency=1)
            .to_pandas().sort_values("media_id").reset_index(drop=True))
    assert bytes(same.loc[0, "payload"]) == mm.encode_wav_pcm16(samp, 8000)
    with pytest.raises(ValueError):
        mm.ResampleStage(factor=0)
