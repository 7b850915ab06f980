"""Baseline JPEG codec (stages/jpeg.py): exact-regime roundtrips, bounded
lossy error, decoder path coverage (4:4:4 / 4:2:0 / restarts / grayscale),
stage integration, and a hypothesis fuzz."""
import numpy as np
import pandas as pd
import pytest

from openmrs_module_epts_etl_ray.stages.jpeg import (
    JPEG_MIME, decode_jpeg, encode_jpeg,
)


def test_constant_gray_exact_all_paths():
    """Quality-100 constant gray roundtrips BIT-EXACTLY (unit quant, DC-only
    blocks, Cb=Cr=128) across subsampling and restart variants — the
    regime the media_jpeg_* oracle rows rely on."""
    for c in (0, 1, 17, 128, 254, 255):
        for sub in (False, True):
            for ri in (0, 2):
                img = np.full((16, 24, 3), c, dtype=np.uint8)
                out = decode_jpeg(encode_jpeg(
                    img, quality=100, subsample=sub, restart_interval=ri))
                assert out.shape == img.shape
                assert (out == c).all(), (c, sub, ri, np.unique(out))


def test_q100_444_bounded_error():
    rng = np.random.default_rng(11)
    for _ in range(4):
        h, w = rng.integers(5, 48, 2)
        img = rng.integers(0, 256, (int(h), int(w), 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100))
        assert out.shape == img.shape
        # q100 error = YCbCr float rounding only: tight bound
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 4


def test_restart_interval_identical_decode():
    rng = np.random.default_rng(12)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    a = decode_jpeg(encode_jpeg(img, quality=100))
    b = decode_jpeg(encode_jpeg(img, quality=100, restart_interval=1))
    c = decode_jpeg(encode_jpeg(img, quality=100, restart_interval=3))
    assert (a == b).all() and (a == c).all()


def test_smooth_image_lossy_quality():
    """A smooth gradient at quality 50 stays close — the DCT is doing its
    job (random noise would not be a fair lossy-fidelity probe)."""
    xx = np.linspace(0, 255, 64)
    img = np.stack([np.tile(xx, (64, 1))] * 3, axis=-1).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(img, quality=50))
    assert np.abs(out.astype(int) - img.astype(int)).mean() < 3.0


def test_decoder_rejects_lossless_and_garbage():
    img = np.full((8, 8, 3), 9, dtype=np.uint8)
    payload = bytearray(encode_jpeg(img))
    i = payload.index(b"\xff\xc0")
    # SOF2 is SUPPORTED since round 5, but a baseline stream relabeled
    # progressive is structurally invalid (full-range interleaved scan)
    payload[i + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(payload))
    payload[i + 1] = 0xC3                 # lossless: still unsupported
    with pytest.raises(NotImplementedError):
        decode_jpeg(bytes(payload))
    with pytest.raises(ValueError):
        decode_jpeg(b"not a jpeg")


def test_odd_dimensions_and_subsample_crop():
    """Non-multiple-of-8 (and of-16 for 4:2:0) dims crop exactly."""
    rng = np.random.default_rng(13)
    for h, w in ((7, 9), (17, 31), (15, 33), (1, 1)):
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        for sub in (False, True):
            out = decode_jpeg(encode_jpeg(img, quality=100, subsample=sub))
            assert out.shape == (h, w, 3)


def test_decode_stage_and_resize_stage_jpeg(ray_session):
    from openmrs_module_epts_etl_ray.stages.multimodal import (
        DecodeStage, ResizeStage,
    )
    img = np.full((16, 16, 3), 99, dtype=np.uint8)
    batch = pd.DataFrame({
        "media_id": [1], "kind": ["image"],
        "payload": [encode_jpeg(img, quality=100)], "mime": [JPEG_MIME],
        "width": [16], "height": [16], "duration_ms": [None],
    })
    feats = DecodeStage(fake=False)(batch)
    f = feats["feature"].iloc[0]
    assert f[0] == 16 and f[1] == 16 and f[2] == 99.0
    resized = ResizeStage(4, 4)(batch)
    out = DecodeStage(fake=False)(resized)["feature"].iloc[0]
    assert out[0] == 4 and out[1] == 4 and out[2] == 99.0


def test_jpeg_roundtrip_hypothesis(ray_session):
    """Fuzz shapes/quality/subsample/restarts; decode must return the
    exact shape with bounded error at q100 and never crash at q35."""
    from hypothesis import given, settings, strategies as st

    @settings(max_examples=25, deadline=None)
    @given(h=st.integers(1, 40), w=st.integers(1, 40),
           seed=st.integers(0, 2**16), sub=st.booleans(),
           ri=st.integers(0, 3))
    def run(h, w, seed, sub, ri):
        rng = np.random.default_rng(seed)
        img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        out = decode_jpeg(encode_jpeg(img, quality=100, subsample=sub,
                                      restart_interval=ri))
        assert out.shape == (h, w, 3)
        if not sub:
            assert np.abs(out.astype(int) - img.astype(int)).max() <= 4
        out35 = decode_jpeg(encode_jpeg(img, quality=35, subsample=sub))
        assert out35.shape == (h, w, 3)

    run()


def test_avi_mjpeg_roundtrip_and_stage(ray_session):
    """MJPEG-AVI container: bounded-error roundtrip, constant-gray
    exactness, and FrameSampleStage integration (the last video stub is
    gone)."""
    from openmrs_module_epts_etl_ray.stages.multimodal import (
        AVI_MIME, FrameSampleStage, DecodeStage,
        decode_avi_mjpeg, encode_avi_mjpeg,
    )
    rng = np.random.default_rng(5)
    frames = [rng.integers(0, 256, (16, 24, 3), dtype=np.uint8)
              for _ in range(5)]
    out = decode_avi_mjpeg(encode_avi_mjpeg(frames, quality=100))
    assert len(out) == 5
    for a, b in zip(frames, out):
        assert np.abs(a.astype(int) - b.astype(int)).max() <= 4
    gray = [np.full((16, 16, 3), v, dtype=np.uint8) for v in (0, 77, 255)]
    got = decode_avi_mjpeg(encode_avi_mjpeg(gray))
    assert all((o == f).all() for o, f in zip(gray, got))
    with pytest.raises(ValueError):
        decode_avi_mjpeg(b"RIFFxxxxWAVE")
    batch = pd.DataFrame({
        "media_id": [3], "kind": ["video"],
        "payload": [encode_avi_mjpeg(gray)], "mime": [AVI_MIME],
        "width": [16], "height": [16], "duration_ms": [120]})
    sampled = FrameSampleStage(every=2)(batch)
    assert list(sampled["media_id"]) == [3_000_000, 3_000_002]
    feats = DecodeStage(fake=False)(sampled)
    assert [f[2] for f in feats["feature"]] == [0.0, 255.0]


def test_bitwriter_accumulator_bounded():
    """The entropy writer's accumulator must not retain emitted bits — an
    unbounded Python-int acc makes encode quadratic in stream length
    (256x256 took 7 s before the mask; ~0.05 s after)."""
    from openmrs_module_epts_etl_ray.stages.jpeg import _BitWriter

    bw = _BitWriter()
    for i in range(5000):
        bw.put(i & 0x3FF, 10)
    assert bw.acc.bit_length() <= 8
    assert bw.nbits < 8


def test_decode_skips_fill_bytes():
    """T.81 B.1.1.2: markers may be preceded by any number of 0xFF fill
    bytes; a conformant file with padding must decode identically."""
    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    payload = encode_jpeg(img, quality=95)
    want = decode_jpeg(payload)
    i = payload.index(b"\xff\xdb")           # pad before the first DQT
    padded = payload[:i] + b"\xff\xff" + payload[i:]
    got = decode_jpeg(padded)
    assert (got == want).all()


def test_encode_large_image_fast():
    import time

    img = np.zeros((256, 256, 3), dtype=np.uint8)
    img[::2, ::3] = 180                       # non-trivial entropy stream
    t0 = time.time()
    payload = encode_jpeg(img, quality=90)
    assert time.time() - t0 < 3.0             # was ~7 s with quadratic acc
    out = decode_jpeg(payload)
    assert out.shape == (256, 256, 3)


def test_progressive_matches_baseline_bitexact():
    """The progressive encoder shares the baseline's forward path, so
    decode(progressive) must equal decode(baseline) PIXEL-EXACTLY — a
    cross-codec check of every SOF2 decode path (interleaved +
    single-component DC with successive approximation, spectral
    selection, AC refinement with EOB runs and correction bits)."""
    from openmrs_module_epts_etl_ray.stages.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(42)
    for (h, w) in [(8, 8), (16, 24), (24, 24), (17, 19), (33, 47)]:
        for q in (100, 90, 50):
            for sub in (False, True):
                img = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
                img[: h // 2] = 128           # flat region: EOB runs
                base = decode_jpeg(
                    encode_jpeg(img, quality=q, subsample=sub))
                prog = decode_jpeg(
                    encode_jpeg_progressive(img, quality=q, subsample=sub))
                assert (base == prog).all(), (h, w, q, sub)


def test_progressive_sparse_and_flat_eob_runs():
    """Sparse detail on a flat field drives long EOB runs with buffered
    correction bits through the refinement scans."""
    from openmrs_module_epts_etl_ray.stages.jpeg import (
        encode_jpeg_progressive,
    )

    img = np.full((80, 80, 3), 90, dtype=np.uint8)
    img[40, 40] = 255
    img[10, 70] = 0
    for q in (100, 75, 30):
        base = decode_jpeg(encode_jpeg(img, quality=q))
        prog = decode_jpeg(encode_jpeg_progressive(img, quality=q))
        assert (base == prog).all()


def test_progressive_constant_gray_exact():
    """quality=100 constant gray roundtrips bit-exactly through the
    progressive codec too (the media oracle property)."""
    from openmrs_module_epts_etl_ray.stages.jpeg import (
        encode_jpeg_progressive,
    )

    g = np.full((24, 32, 3), 137, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg_progressive(g, quality=100)) == g).all()


def test_progressive_decodes_through_decode_stage():
    """DecodeStage needs no special-casing: a progressive payload is
    just image/jpeg."""
    from openmrs_module_epts_etl_ray.stages.jpeg import (
        JPEG_MIME, encode_jpeg_progressive,
    )
    from openmrs_module_epts_etl_ray.stages.multimodal import DecodeStage

    img = np.full((16, 16, 3), 200, dtype=np.uint8)
    batch = pd.DataFrame({
        "media_id": [1], "kind": ["image"],
        "payload": [encode_jpeg_progressive(img, quality=100)],
        "mime": [JPEG_MIME],
    })
    out = DecodeStage()(batch)
    f = out["feature"].iloc[0]
    assert f[0] == 16 and f[1] == 16 and abs(f[2] - 200.0) < 1e-9


def test_progressive_restart_intervals():
    """DRI + RSTn inside SOF2 scans: per-interval resets of DC
    predictors, EOB runs and the bit reader must reproduce the
    no-restart pixels exactly."""
    from openmrs_module_epts_etl_ray.stages.jpeg import (
        encode_jpeg_progressive,
    )

    rng = np.random.default_rng(21)
    img = rng.integers(0, 256, (24, 40, 3), dtype=np.uint8)
    img[:12] = 77                              # flat half: EOB runs
    want = decode_jpeg(encode_jpeg(img, quality=90))
    for ri in (1, 2, 5):
        got = decode_jpeg(encode_jpeg_progressive(
            img, quality=90, restart_interval=ri))
        assert (got == want).all(), ri


def test_progressive_header_only_raises():
    from openmrs_module_epts_etl_ray.stages.jpeg import (
        encode_jpeg_progressive,
    )

    p = encode_jpeg_progressive(np.full((16, 16, 3), 5, np.uint8))
    i = p.index(b"\xff\xda")
    with pytest.raises(ValueError):
        decode_jpeg(p[:i] + b"\xff\xd9")
