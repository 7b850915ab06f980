"""Multimodal column operators (image/audio/video as opaque binary columns).

Two decode tiers:

- **Real decode** for formats that need NO external codec library: PPM
  (P6) images and PCM-16 WAV audio (numpy/struct: header + raw samples)
  and PNG (pure stdlib: zlib inflate + the five scanline filters —
  :func:`decode_png`). Decode, nearest-neighbor resize, frame-sampling and
  feature extraction over these are genuinely executed and tested.
- **Real decode** for JPEG too (round 5): baseline sequential AND
  progressive (SOF2) JPEG via the pure-stdlib codec in :mod:`.jpeg`
  (Huffman + dequant + exact matrix IDCT + YCbCr, 4:4:4 and 4:2:0,
  restart intervals, successive approximation + spectral selection).
- **Real decode** for GIF (round 5, :mod:`.gif`): LZW with variable code
  width, interlace, local color tables, animation (GCE delay / disposal /
  transparency) — stills feed the image path, animations the
  frame-sampling path.
- **Stub** only for video-container formats that require codec libraries
  absent in this container (libav/mp4 etc.): ``DecodeStage(fake=False)``
  raises ``NotImplementedError`` for them; ``fake=True`` derives a
  deterministic sha256-seeded feature so the pipeline shape stays
  testable.

Ray-side design is real in both tiers: typed binary schema, actor-pool
stage (decoder state per actor), SMALL batches because payloads are wide
(batch x concurrency must fit a worker heap), typed output layout.
"""
from __future__ import annotations

import hashlib
import struct

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from .gif import GIF_MIME, decode_gif, encode_gif
from .jpeg import JPEG_MIME, decode_jpeg, encode_jpeg

MEDIA_SCHEMA = pa.schema(
    [
        ("media_id", pa.int64()),
        ("kind", pa.string()),            # image | audio | video
        ("payload", pa.large_binary()),   # opaque encoded bytes
        ("mime", pa.string()),
        ("width", pa.int32()),            # nullable typed metadata
        ("height", pa.int32()),
        ("duration_ms", pa.int64()),
    ]
)

PPM_MIME = "image/x-portable-pixmap"
WAV_MIME = "audio/wav"


# -- codec-free encoders/decoders (public formats, numpy-only) --------------

def encode_ppm(img: np.ndarray) -> bytes:
    """(h, w, 3) uint8 -> binary PPM (P6)."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    return b"P6\n%d %d\n255\n" % (w, h) + img.tobytes()


def decode_ppm(payload: bytes) -> np.ndarray:
    if not payload.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: magic, width, height, maxval — whitespace separated
    parts = payload.split(maxsplit=4)
    w, h, maxval = int(parts[1]), int(parts[2]), int(parts[3])
    if maxval != 255:
        raise ValueError("only 8-bit PPM supported")
    header_len = len(payload) - w * h * 3
    raw = np.frombuffer(payload, dtype=np.uint8, count=w * h * 3,
                        offset=header_len)
    return raw.reshape(h, w, 3)


def encode_wav_pcm16(samples: np.ndarray, rate: int = 16000) -> bytes:
    """mono int16 samples -> minimal RIFF/WAVE PCM-16 container."""
    data = samples.astype("<i2").tobytes()
    hdr = b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
    fmt = b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, rate, rate * 2, 2, 16)
    return hdr + fmt + b"data" + struct.pack("<I", len(data)) + data


def decode_wav_pcm16(payload: bytes) -> tuple[np.ndarray, int]:
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos = 12
    rate, samples = None, None
    while pos + 8 <= len(payload):
        cid = payload[pos:pos + 4]
        size = struct.unpack("<I", payload[pos + 4:pos + 8])[0]
        body = payload[pos + 8:pos + 8 + size]
        if cid == b"fmt ":
            fmt_tag, channels, rate = struct.unpack("<HHI", body[:8])
            if fmt_tag != 1 or channels != 1:
                raise ValueError("only mono PCM supported")
        elif cid == b"data":
            samples = np.frombuffer(body, dtype="<i2")
        pos += 8 + size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return samples, rate


def resize_nearest(img: np.ndarray, w: int, h: int) -> np.ndarray:
    """Nearest-neighbor resize, pure numpy index arithmetic."""
    sh, sw = img.shape[:2]
    ys = (np.arange(h) * sh // h).clip(0, sh - 1)
    xs = (np.arange(w) * sw // w).clip(0, sw - 1)
    return img[ys][:, xs]


def synthesize_media(n: int, seed: int = 5) -> rd.Dataset:
    """Deterministic synthetic media rows with REAL decodable payloads:
    PPM images (media_id % 3 != 0) and PCM-16 WAV clips (% 3 == 0)."""
    rng = np.random.default_rng(seed)
    rows = {"media_id": [], "kind": [], "payload": [], "mime": [],
            "width": [], "height": [], "duration_ms": []}
    for i in range(n):
        rows["media_id"].append(i)
        if i % 3:
            w, h = 16 + int(rng.integers(0, 4)) * 8, 16
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows["kind"].append("image")
            rows["payload"].append(encode_ppm(img))
            rows["mime"].append(PPM_MIME)
            rows["width"].append(w)
            rows["height"].append(h)
            rows["duration_ms"].append(None)
        else:
            rate = 8000
            n_samp = int(rng.integers(400, 1600))
            samp = (rng.normal(0, 4000, n_samp)).astype(np.int16)
            rows["kind"].append("audio")
            rows["payload"].append(encode_wav_pcm16(samp, rate))
            rows["mime"].append(WAV_MIME)
            rows["width"].append(None)
            rows["height"].append(None)
            rows["duration_ms"].append(int(n_samp * 1000 / rate))
    t = pa.table(
        {
            "media_id": pa.array(rows["media_id"], pa.int64()),
            "kind": pa.array(rows["kind"]),
            "payload": pa.array(rows["payload"], type=pa.large_binary()),
            "mime": pa.array(rows["mime"]),
            "width": pa.array(rows["width"], pa.int32()),
            "height": pa.array(rows["height"], pa.int32()),
            "duration_ms": pa.array(rows["duration_ms"], pa.int64()),
        },
        schema=MEDIA_SCHEMA,
    )
    return rd.from_arrow(t)


def media_from_ids(ds: rd.Dataset, id_col: str = "doc_id",
                   *, batch_size: int = 1024) -> rd.Dataset:
    """Media payloads derived DETERMINISTICALLY from an id column, with
    CONSTANT pixel/sample content — so every decoded stat is a closed-form
    function of the id and a SQL oracle can check the decode path end to
    end (payload length, mean pixel, RMS):

    - ``id % 3 != 0`` → PPM image, w = 16 + (id%4)*8, h = 16, every pixel
      ``id % 256``; payload length = 13 + w*16*3.
    - ``id % 3 == 0`` → WAV PCM-16, n = 400 + (id%100)*8 samples, all equal
      to ``(id%100)*10`` at 8 kHz; payload length = 44 + n*2.

    Randomized-content coverage of the same decoders lives in
    ``synthesize_media`` + tests; this source exists for the driver's
    DuckDB-checked correctness row."""

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                                "width", "height", "duration_ms")}
        for i in batch[id_col]:
            i = int(i)
            rows["media_id"].append(i)
            if i % 3:
                w = 16 + (i % 4) * 8
                img = np.full((16, w, 3), i % 256, dtype=np.uint8)
                rows["kind"].append("image")
                rows["payload"].append(encode_ppm(img))
                rows["mime"].append(PPM_MIME)
                rows["width"].append(w)
                rows["height"].append(16)
                rows["duration_ms"].append(None)
            else:
                n = 400 + (i % 100) * 8
                samp = np.full(n, (i % 100) * 10, dtype=np.int16)
                rows["kind"].append("audio")
                rows["payload"].append(encode_wav_pcm16(samp, 8000))
                rows["mime"].append(WAV_MIME)
                rows["width"].append(None)
                rows["height"].append(None)
                rows["duration_ms"].append(int(n * 1000 / 8000))
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("Int32")
        out["height"] = out["height"].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        return out

    return ds.map_batches(build, batch_format="pandas",
                          batch_size=batch_size)


class DecodeStage:
    """Actor-pool decode stage.

    ``fake=False`` (default) REALLY decodes the library-free mimes (PPM,
    PNG via the stdlib codec below, WAV) and emits per-media features:
    images -> [width, height, mean R, G, B, std]; audio -> [rate,
    n_samples, rms, zero-crossing rate]; vectors are zero-padded to
    ``feature_dim``. Any other mime raises ``NotImplementedError``
    (JPEG/libav need codec libraries absent here). ``fake=True`` derives a
    sha256-seeded deterministic vector.
    """

    def __init__(self, fake: bool = False, feature_dim: int = 8):
        self.fake = fake
        self.feature_dim = feature_dim

    def _fake_feature(self, payload: bytes) -> np.ndarray:
        digest = hashlib.sha256(payload).digest()
        v = np.frombuffer(digest[: self.feature_dim * 4], dtype=np.uint32)
        return (v / np.float64(2**32)).astype(np.float64)

    def _real_feature(self, payload: bytes, mime: str) -> np.ndarray:
        out = np.zeros(self.feature_dim, dtype=np.float64)
        if mime in (PPM_MIME, PNG_MIME, JPEG_MIME, GIF_MIME):
            img = (decode_ppm(bytes(payload)) if mime == PPM_MIME
                   else decode_png(bytes(payload)) if mime == PNG_MIME
                   else decode_jpeg(bytes(payload)) if mime == JPEG_MIME
                   else decode_gif(bytes(payload))[0])
            h, w = img.shape[:2]
            f = [w, h, img[..., 0].mean(), img[..., 1].mean(),
                 img[..., 2].mean(), img.std()]
        elif mime == WAV_MIME:
            samples, rate = decode_wav_pcm16(bytes(payload))
            x = samples.astype(np.float64)
            zc = float(np.mean(np.signbit(x[1:]) != np.signbit(x[:-1]))) if len(x) > 1 else 0.0
            f = [rate, len(samples), float(np.sqrt(np.mean(x * x))), zc]
        else:
            raise NotImplementedError(
                f"mime {mime!r} needs codec libraries (libav) not "
                f"present in this environment; REAL decode covers "
                f"{PPM_MIME}, image/png, image/jpeg, image/gif "
                f"(pure-stdlib codecs), {WAV_MIME} — or use fake=True")
        out[: min(len(f), self.feature_dim)] = f[: self.feature_dim]
        return out

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        feats = []
        for payload, mime in zip(batch["payload"], batch["mime"]):
            if self.fake:
                feats.append(self._fake_feature(payload))
            else:
                feats.append(self._real_feature(payload, mime))
        return pd.DataFrame({
            "media_id": batch["media_id"].to_numpy(),
            "kind": batch["kind"].to_numpy(),
            "feature": feats,
            "payload_bytes": batch["payload"].map(len).astype("int64").to_numpy(),
        })


class ResizeStage:
    """Actor-pool image transform: decode -> nearest-neighbor resize ->
    re-encode PPM. Non-image rows pass through untouched."""

    def __init__(self, width: int, height: int):
        self.width = width
        self.height = height

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = []
        image_mimes = (PPM_MIME, PNG_MIME, JPEG_MIME, GIF_MIME)
        for payload, mime in zip(batch["payload"], batch["mime"]):
            if mime == PPM_MIME:
                out.append(encode_ppm(
                    resize_nearest(decode_ppm(bytes(payload)),
                                   self.width, self.height)))
            elif mime == PNG_MIME:
                out.append(encode_png(
                    resize_nearest(decode_png(bytes(payload)),
                                   self.width, self.height)))
            elif mime == JPEG_MIME:
                out.append(encode_jpeg(
                    resize_nearest(decode_jpeg(bytes(payload)),
                                   self.width, self.height)))
            elif mime == GIF_MIME:
                # stills only on the image path; animations resize
                # frame-by-frame so the composed timeline survives
                out.append(encode_gif([
                    resize_nearest(f, self.width, self.height)
                    for f in decode_gif(bytes(payload))]))
            else:
                out.append(payload)
        batch = batch.copy()
        batch["payload"] = out
        # only resized rows get the new dimensions — pass-through rows
        # (audio, video containers) keep their original width/height
        # metadata; mapping them to None would destroy it
        is_img = batch["mime"].isin(image_mimes)
        batch["width"] = batch["width"].astype("Int32").mask(
            is_img, self.width)
        batch["height"] = batch["height"].astype("Int32").mask(
            is_img, self.height)
        return batch


def decode_features(ds: rd.Dataset, *, fake: bool = False,
                    batch_size: int = 256, concurrency=(1, 4)) -> rd.Dataset:
    """Small batches — binary payloads are wide; concurrency × batch must fit heap."""
    return ds.map_batches(DecodeStage, fn_constructor_kwargs=dict(fake=fake),
                          batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


def resize_images(ds: rd.Dataset, width: int, height: int, *,
                  batch_size: int = 256, concurrency=(1, 4)) -> rd.Dataset:
    return ds.map_batches(ResizeStage,
                          fn_constructor_kwargs=dict(width=width, height=height),
                          batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


# -- codec-free "video": length-prefixed concatenated PPM frames ------------

VIDEO_MIME = "video/x-ppm-frames"


def encode_ppm_video(frames: list[np.ndarray]) -> bytes:
    """Concatenated PPM frames with a count header — a minimal container
    that needs no codec, so frame-sampling plumbing is REAL."""
    parts = [b"PVF1\n%d\n" % len(frames)]
    for f in frames:
        p = encode_ppm(f)
        parts.append(b"%d\n" % len(p))
        parts.append(p)
    return b"".join(parts)


def decode_ppm_video(payload: bytes) -> list[np.ndarray]:
    if not payload.startswith(b"PVF1\n"):
        raise ValueError("not a PVF1 payload")
    pos = payload.index(b"\n", 5)
    n = int(payload[5:pos])
    pos += 1
    frames = []
    for _ in range(n):
        nl = payload.index(b"\n", pos)
        size = int(payload[pos:nl])
        pos = nl + 1
        frames.append(decode_ppm(payload[pos:pos + size]))
        pos += size
    return frames


def videos_from_ids(ds: rd.Dataset, id_col: str = "doc_id",
                    *, batch_size: int = 1024) -> rd.Dataset:
    """Frame containers derived deterministically from an id column (the
    video counterpart of :func:`media_from_ids`): each ``id % 10 == 0`` row
    becomes a PVF of ``id % 4 + 2`` frames, frame ``i`` an 8x8 constant
    image of value ``(id + i) % 256`` — so frame-sampled decode stats are
    closed forms a SQL oracle can state."""

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                                "width", "height", "duration_ms")}
        for i in batch[id_col]:
            i = int(i)
            if i % 10:
                continue
            frames = [np.full((8, 8, 3), (i + f) % 256, dtype=np.uint8)
                      for f in range(i % 4 + 2)]
            rows["media_id"].append(i)
            rows["kind"].append("video")
            rows["payload"].append(encode_ppm_video(frames))
            rows["mime"].append(VIDEO_MIME)
            rows["width"].append(8)
            rows["height"].append(8)
            rows["duration_ms"].append(len(frames) * 40)
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("Int32")
        out["height"] = out["height"].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        return out

    return ds.map_batches(build, batch_format="pandas", batch_size=batch_size)


# -- real video container: Motion-JPEG in AVI (RIFF), pure stdlib ----------
# RIFF/AVI is a plain chunk container (public spec: OpenDML / msdn AVI RIFF)
# and MJPG frames are baseline JPEGs — which stages/jpeg.py decodes — so a
# self-contained video format is now REAL end to end; only codec-bound
# formats (H.264/VP9/... via libav) remain stubbed.

AVI_MIME = "video/x-msvideo"


def _riff_chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def _riff_list(kind: bytes, body: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + body)


def encode_avi_mjpeg(frames: list[np.ndarray], *, fps: int = 25,
                     quality: int = 100) -> bytes:
    """(h, w, 3) uint8 frames -> Motion-JPEG AVI (one '00dc' chunk per
    frame, each a baseline JPEG from :mod:`.jpeg`), with avih/strh/strf
    headers and an idx1 index."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    jpegs = [encode_jpeg(f, quality=quality) for f in frames]
    maxbuf = max(len(j) for j in jpegs)
    avih = struct.pack(
        "<IIIIIIIIII4I",
        1_000_000 // fps, maxbuf * fps, 0, 0x10,   # HASINDEX
        len(frames), 0, 1, maxbuf, w, h, 0, 0, 0, 0)
    strh = struct.pack(
        "<4s4sIHHIIIIIIII4h",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0,
        len(frames), maxbuf, 0xFFFFFFFF & (1 << 32) - 1, 0,
        0, 0, w, h)
    strf = struct.pack("<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG",
                       w * h * 3, 0, 0, 0, 0)
    hdrl = _riff_list(b"hdrl",
                      _riff_chunk(b"avih", avih) +
                      _riff_list(b"strl",
                                 _riff_chunk(b"strh", strh) +
                                 _riff_chunk(b"strf", strf)))
    movi_body = b"".join(_riff_chunk(b"00dc", j) for j in jpegs)
    movi = _riff_list(b"movi", movi_body)
    idx, off = [], 4                               # offset after 'movi' tag
    for j in jpegs:
        idx.append(struct.pack("<4sIII", b"00dc", 0x10, off, len(j)))
        off += 8 + len(j) + (len(j) % 2)
    idx1 = _riff_chunk(b"idx1", b"".join(idx))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def decode_avi_mjpeg(payload: bytes) -> list[np.ndarray]:
    """Walk the RIFF tree, decode every video-data chunk ('##dc'/'##db')
    inside LIST/movi via :func:`decode_jpeg`."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")
    frames: list[np.ndarray] = []

    def walk(buf: bytes, pos: int, end: int, in_movi: bool) -> None:
        while pos + 8 <= end:
            tag = buf[pos:pos + 4]
            size = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
            body_at = pos + 8
            if tag == b"LIST":
                kind = buf[body_at:body_at + 4]
                walk(buf, body_at + 4, body_at + size,
                     in_movi or kind == b"movi")
            elif in_movi and tag[2:4] in (b"dc", b"db"):
                frames.append(decode_jpeg(buf[body_at:body_at + size]))
            pos = body_at + size + (size % 2)

    walk(payload, 12, len(payload), False)
    if not frames:
        raise ValueError("no MJPEG frames found in AVI")
    return frames


def avi_videos_from_ids(ds: rd.Dataset, id_col: str = "doc_id",
                        *, batch_size: int = 256) -> rd.Dataset:
    """MJPEG-AVI containers derived deterministically from an id column
    (the AVI counterpart of :func:`videos_from_ids`): each
    ``id % 10 == 0`` row becomes an AVI of ``id % 4 + 2`` frames, frame
    ``f`` a 16x16 constant GRAY image of value ``(id + f) % 256`` —
    quality-100 gray is the exact-roundtrip regime of :mod:`.jpeg`, so
    frame-sampled decode stats are closed forms a SQL oracle can state."""

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                                "width", "height", "duration_ms")}
        for i in batch[id_col]:
            i = int(i)
            if i % 10:
                continue
            frames = [np.full((16, 16, 3), (i + f) % 256, dtype=np.uint8)
                      for f in range(i % 4 + 2)]
            rows["media_id"].append(i)
            rows["kind"].append("video")
            rows["payload"].append(encode_avi_mjpeg(frames))
            rows["mime"].append(AVI_MIME)
            rows["width"].append(16)
            rows["height"].append(16)
            rows["duration_ms"].append(len(frames) * 40)
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("Int32")
        out["height"] = out["height"].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        return out

    return ds.map_batches(build, batch_format="pandas",
                          batch_size=batch_size)


class FrameSampleStage:
    """Actor-pool video transform: decode the frame container, keep every
    ``every``-th frame, emit ONE IMAGE ROW PER SAMPLED FRAME (media_id
    becomes media_id * 10^6 + frame_index — flat_map-shaped output for
    downstream image stages). Non-video rows pass through unchanged."""

    def __init__(self, every: int = 2):
        self.every = every

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        rows = []
        for r in batch.itertuples():
            animated_gif = r.mime == GIF_MIME and r.kind == "video"
            if r.mime not in (VIDEO_MIME, AVI_MIME) and not animated_gif:
                rows.append({
                    "media_id": r.media_id, "kind": r.kind,
                    "payload": r.payload, "mime": r.mime,
                    "width": r.width, "height": r.height,
                    "duration_ms": r.duration_ms})
                continue
            dec = (decode_ppm_video if r.mime == VIDEO_MIME
                   else decode_gif if animated_gif
                   else decode_avi_mjpeg)
            for i, frame in enumerate(dec(bytes(r.payload))):
                if i % self.every:
                    continue
                h, w = frame.shape[:2]
                rows.append({
                    "media_id": r.media_id * 1_000_000 + i, "kind": "image",
                    "payload": encode_ppm(frame), "mime": PPM_MIME,
                    "width": w, "height": h, "duration_ms": None})
        out = pd.DataFrame(rows)
        for c in ("width", "height"):
            out[c] = out[c].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        return out


def sample_frames(ds: rd.Dataset, every: int = 2, *,
                  batch_size: int = 64, concurrency=(1, 4)) -> rd.Dataset:
    """Video payloads are the widest rows — smallest batches of the family."""
    return ds.map_batches(FrameSampleStage,
                          fn_constructor_kwargs=dict(every=every),
                          batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


# -- real PNG codec, pure stdlib (public spec: W3C PNG / RFC 2083) -----------
# zlib (stdlib) + the five scanline filters; no external codec library.

PNG_MIME = "image/png"
_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(tag: bytes, body: bytes) -> bytes:
    import zlib

    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF))


def _paeth_pred(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    """Vectorized Paeth predictor (filter type 4) on int32 arrays."""
    p = a + b - c
    pa, pb, pc_ = np.abs(p - a), np.abs(p - b), np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc_), a, np.where(pb <= pc_, b, c))


def encode_png(img: np.ndarray, *, row_filter: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG (color type 2, bit depth 8, no
    interlace). ``row_filter`` picks the scanline filter (0..4) for every
    row — the encoder is lossless under all five, which the tests use to
    exercise each decoder unfilter path."""
    import zlib

    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    if row_filter not in (0, 1, 2, 3, 4):
        raise ValueError(f"row_filter {row_filter} not in 0..4")
    bpp = 3
    stride = w * bpp
    rows = img.reshape(h, stride).astype(np.int32)
    left = np.zeros_like(rows)
    left[:, bpp:] = rows[:, :-bpp]
    up = np.zeros_like(rows)
    up[1:] = rows[:-1]
    ul = np.zeros_like(rows)
    ul[1:, bpp:] = rows[:-1, :-bpp]
    if row_filter == 0:
        filt = rows
    elif row_filter == 1:
        filt = rows - left
    elif row_filter == 2:
        filt = rows - up
    elif row_filter == 3:
        filt = rows - ((left + up) >> 1)
    else:
        filt = rows - _paeth_pred(left, up, ul)
    body = np.empty((h, stride + 1), np.uint8)
    body[:, 0] = row_filter
    body[:, 1:] = (filt & 0xFF).astype(np.uint8)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (_PNG_SIG + _png_chunk(b"IHDR", ihdr)
            + _png_chunk(b"IDAT", zlib.compress(body.tobytes(), 6))
            + _png_chunk(b"IEND", b""))


def decode_png(payload: bytes) -> np.ndarray:
    """PNG -> (h, w, 3) uint8. Supports bit depth 8, color types 0 (gray,
    expanded), 2 (RGB) and 6 (RGBA, alpha dropped), no interlace — the
    shapes a data pipeline's thumbnails/screenshots use; palette and
    16-bit raise. Sub/Up rows unfilter fully vectorized (Sub is a per-lane
    prefix sum mod 256); Average/Paeth rows fall back to a per-byte scan
    (inherently sequential in x)."""
    import zlib

    if payload[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = []
    w = h = None
    channels = None
    while pos + 8 <= len(payload):
        (size,) = struct.unpack(">I", payload[pos:pos + 4])
        tag = payload[pos + 4:pos + 8]
        body = payload[pos + 8:pos + 8 + size]
        pos += 12 + size          # length + tag + body + crc
        if tag == b"IHDR":
            w, h, depth, ctype, comp, filt, inter = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8 or comp != 0 or filt != 0 or inter != 0:
                raise ValueError(
                    f"unsupported PNG shape (depth={depth}, interlace="
                    f"{inter}); this decoder handles 8-bit non-interlaced")
            channels = {0: 1, 2: 3, 6: 4}.get(ctype)
            if channels is None:
                raise ValueError(f"unsupported PNG color type {ctype}")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None or not idat:
        raise ValueError("missing IHDR/IDAT chunk")
    raw = zlib.decompress(b"".join(idat))
    bpp = channels
    stride = w * bpp
    if len(raw) != h * (stride + 1):
        raise ValueError("PNG scanline payload size mismatch")
    lines = np.frombuffer(raw, np.uint8).reshape(h, stride + 1)
    recon = np.empty((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        ftype = int(lines[y, 0])
        line = lines[y, 1:]
        if ftype == 0:
            cur = line.copy()
        elif ftype == 2:
            cur = line + prev                      # uint8 wraps mod 256
        elif ftype == 1:
            # recon[x] = filt[x] + recon[x-bpp]: per byte-lane prefix sum
            lanes = line.reshape(w, bpp).astype(np.uint64)
            cur = np.cumsum(lanes, axis=0).astype(np.uint8).reshape(stride)
        elif ftype in (3, 4):
            cur = np.empty(stride, np.uint8)
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                if ftype == 3:
                    pred = (a + b) >> 1
                else:
                    cc = int(prev[x - bpp]) if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc_ = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc_) else \
                        (b if pb <= pc_ else cc)
                cur[x] = (int(line[x]) + pred) & 0xFF
        else:
            raise ValueError(f"unknown PNG filter type {ftype}")
        recon[y] = cur
        prev = cur
    img = recon.reshape(h, w, bpp)
    if bpp == 1:
        return np.repeat(img, 3, axis=2)
    if bpp == 4:
        return np.ascontiguousarray(img[:, :, :3])
    return img


def png_media_from_ids(ds: rd.Dataset, id_col: str = "doc_id",
                       *, batch_size: int = 1024) -> rd.Dataset:
    """REAL PNG payloads derived deterministically from an id column:
    every id becomes a constant-color PNG, w = 16 + (id%4)*8, h = 16,
    every channel ``id % 256`` — so the decoded stats are closed forms a
    SQL oracle can state (the PNG counterpart of :func:`media_from_ids`;
    payload LENGTH is zlib-dependent and deliberately not part of the
    oracle contract)."""

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                                "width", "height", "duration_ms")}
        for i in batch[id_col]:
            i = int(i)
            w = 16 + (i % 4) * 8
            img = np.full((16, w, 3), i % 256, dtype=np.uint8)
            rows["media_id"].append(i)
            rows["kind"].append("image")
            # rotate the scanline filter by id so the oracle row also
            # exercises every decoder unfilter path, not just type 0
            rows["payload"].append(encode_png(img, row_filter=i % 5))
            rows["mime"].append(PNG_MIME)
            rows["width"].append(w)
            rows["height"].append(16)
            rows["duration_ms"].append(None)
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("Int32")
        out["height"] = out["height"].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        return out

    return ds.map_batches(build, batch_format="pandas",
                          batch_size=batch_size)


def gif_media_from_ids(ds: rd.Dataset, id_col: str = "doc_id",
                       *, batch_size: int = 1024) -> rd.Dataset:
    """REAL GIF stills derived deterministically from an id column
    (the GIF counterpart of :func:`png_media_from_ids`): constant-color
    images of value ``id % 256``, w = 16 + (id%4)*8, h = 16, with the
    decoder paths rotating by id — interlace on odd ids, the color table
    moving from global to per-image (local) on ids % 3 == 0, and a
    4-entry superset palette (used color at a NON-ZERO index) on ids
    % 2 == 0 — so LZW, de-interlace, LCT and index-mapping all run under
    the closed-form SQL oracle. Payload length is LZW-dependent and NOT
    part of the contract."""

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                                "width", "height", "duration_ms")}
        for i in batch[id_col]:
            i = int(i)
            w = 16 + (i % 4) * 8
            v = i % 256
            img = np.full((16, w, 3), v, dtype=np.uint8)
            pal = None
            if i % 2 == 0:
                pal = np.array([[(v + 1) % 256] * 3, [v] * 3,
                                [(v + 7) % 256] * 3, [(v + 3) % 256] * 3],
                               dtype=np.uint8)
            rows["media_id"].append(i)
            rows["kind"].append("image")
            rows["payload"].append(encode_gif(
                [img], palette=pal, interlace=bool(i % 2),
                local_palettes=i % 3 == 0))
            rows["mime"].append(GIF_MIME)
            rows["width"].append(w)
            rows["height"].append(16)
            rows["duration_ms"].append(None)
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("Int32")
        out["height"] = out["height"].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        return out

    return ds.map_batches(build, batch_format="pandas",
                          batch_size=batch_size)


def gif_videos_from_ids(ds: rd.Dataset, id_col: str = "doc_id",
                        *, batch_size: int = 256) -> rd.Dataset:
    """Animated GIFs derived deterministically from an id column (the GIF
    counterpart of :func:`avi_videos_from_ids`): each ``id % 10 == 0`` row
    becomes an animation of ``id % 4 + 2`` frames, frame ``f`` a 16x16
    constant image of value ``(id + f) % 256`` at 4 cs/frame — so
    frame-sampled decode stats are closed forms a SQL oracle can state.
    The multi-frame palette, GCE parsing and draw-over composition paths
    all run under the gate."""

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                                "width", "height", "duration_ms")}
        for i in batch[id_col]:
            i = int(i)
            if i % 10:
                continue
            frames = [np.full((16, 16, 3), (i + f) % 256, dtype=np.uint8)
                      for f in range(i % 4 + 2)]
            rows["media_id"].append(i)
            rows["kind"].append("video")
            rows["payload"].append(encode_gif(frames, delay_cs=4))
            rows["mime"].append(GIF_MIME)
            rows["width"].append(16)
            rows["height"].append(16)
            rows["duration_ms"].append(len(frames) * 40)
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("Int32")
        out["height"] = out["height"].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        return out

    return ds.map_batches(build, batch_format="pandas",
                          batch_size=batch_size)


from functools import lru_cache


@lru_cache(maxsize=4096)
def _jpeg_payload_for(val: int, w: int, sub: bool, ri: int) -> bytes:
    """Memoized generator encode for jpeg_media_from_ids: the test-vector
    space is only 256 values x 4 widths x 2 subsample x 2 restart
    variants, so encoding each distinct image once (per worker) removes
    the generator from the timed path — the DECODE under test still runs
    per row. Module-level (not a closure) so the build UDF pickles."""
    img = np.full((16, w, 3), val, dtype=np.uint8)
    return encode_jpeg(img, quality=100, subsample=sub,
                       restart_interval=ri)


@lru_cache(maxsize=4096)
def _jpeg_prog_payload_for(val: int, w: int, sub: bool, ri: int) -> bytes:
    """Memoized PROGRESSIVE generator encode (see _jpeg_payload_for):
    exercises the SOF2 multi-scan decoder — successive-approximation DC,
    spectral-selection AC, refinement scans, and (ids % 3 == 0) per-scan
    RSTn restarts — under the oracle gate."""
    from .jpeg import encode_jpeg_progressive
    img = np.full((16, w, 3), val, dtype=np.uint8)
    return encode_jpeg_progressive(img, quality=100, subsample=sub,
                                   restart_interval=ri)


def jpeg_media_from_ids(ds: rd.Dataset, id_col: str = "doc_id",
                        *, batch_size: int = 1024,
                        progressive: bool = False) -> rd.Dataset:
    """REAL baseline-JPEG payloads derived deterministically from an id
    column: every id becomes a constant GRAY image (R=G=B = id % 256),
    w = 16 + (id % 4) * 8, h = 16, encoded at quality=100 — the exact-
    roundtrip regime of :mod:`.jpeg` (unit quant tables + Cb=Cr=128 + DC-
    only blocks), so the decoded stats are closed forms a SQL oracle can
    state. Chroma subsampling rotates by id (even = 4:4:4, odd = 4:2:0)
    and ids % 3 == 0 add a restart interval, so the MCU-interleave,
    upsample and RSTn decoder paths all run under the oracle gate.
    Payload LENGTH is entropy-coding-dependent and NOT part of the
    contract. ``progressive=True`` emits the same test-vector space as
    SOF2 multi-scan payloads (successive approximation + spectral
    selection + per-scan restarts), driving the progressive decoder
    under the same closed-form oracle."""

    def build(batch: pd.DataFrame) -> pd.DataFrame:
        rows = {k: [] for k in ("media_id", "kind", "payload", "mime",
                                "width", "height", "duration_ms")}
        for i in batch[id_col]:
            i = int(i)
            w = 16 + (i % 4) * 8
            rows["media_id"].append(i)
            rows["kind"].append("image")
            rows["payload"].append(
                (_jpeg_prog_payload_for if progressive
                 else _jpeg_payload_for)(
                    i % 256, w, bool(i % 2), 2 if i % 3 == 0 else 0))
            rows["mime"].append(JPEG_MIME)
            rows["width"].append(w)
            rows["height"].append(16)
            rows["duration_ms"].append(None)
        out = pd.DataFrame(rows)
        out["width"] = out["width"].astype("Int32")
        out["height"] = out["height"].astype("Int32")
        out["duration_ms"] = out["duration_ms"].astype("Int64")
        return out

    return ds.map_batches(build, batch_format="pandas",
                          batch_size=batch_size)


class AudioWindowStage:
    """Actor-pool audio transform: decode PCM-16 WAV, cut the sample
    stream into fixed windows of ``window_samples``, emit ONE ROW PER
    WINDOW (window_id = media_id * 10^6 + window index — the audio
    counterpart of :class:`FrameSampleStage`): sample count, integer peak
    (max |sample|) and RMS. The last window is partial. RMS of a
    constant-valued clip is IEEE-exact (n*v^2 <= 2^53, v^2 a perfect
    square, sqrt correctly rounded), which is what lets the test-vector
    clips carry an exact SQL oracle. Non-audio rows are dropped.

    Per-clip work is vectorized (``add.reduceat`` for the window sums of
    squares, ``maximum.reduceat`` for peaks) — the python loop is per
    CLIP, bounded by batch size, not per sample."""

    def __init__(self, window_samples: int = 256):
        if window_samples <= 0:
            raise ValueError("window_samples must be positive")
        self.window = window_samples

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        ids, counts, peaks, rmss, rates = [], [], [], [], []
        for r in batch.itertuples():
            if r.mime != WAV_MIME:
                continue
            samples, rate = decode_wav_pcm16(bytes(r.payload))
            n = len(samples)
            if n == 0:
                continue
            x = samples.astype(np.float64)
            edges = np.arange(0, n, self.window)
            sumsq = np.add.reduceat(x * x, edges)
            peak = np.maximum.reduceat(np.abs(samples.astype(np.int64)),
                                       edges)
            sizes = np.minimum(self.window, n - edges)
            ids.extend(int(r.media_id) * 1_000_000 + np.arange(len(edges)))
            counts.extend(sizes)
            peaks.extend(peak)
            rmss.extend(np.sqrt(sumsq / sizes))
            rates.extend([rate] * len(edges))
        return pd.DataFrame({
            "window_id": pd.array(ids, dtype="int64"),
            "n_samples": pd.array(counts, dtype="int64"),
            "peak": pd.array(peaks, dtype="int64"),
            "rms": pd.array(rmss, dtype="float64"),
            "rate": pd.array(rates, dtype="int64"),
        })


def audio_windows(ds: rd.Dataset, window_samples: int = 256, *,
                  batch_size: int = 256, concurrency=(1, 4)) -> rd.Dataset:
    return ds.map_batches(AudioWindowStage,
                          fn_constructor_kwargs=dict(
                              window_samples=window_samples),
                          batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)


class ResampleStage:
    """Actor-pool audio resampler: integer-factor DECIMATION (keep every
    ``factor``-th sample, divide the rate) — the cheap exact half of a
    resampler (fractional ratios need an interpolation kernel and stop
    being integer-exact; decimation of PCM-16 is bit-exact, which is what
    lets a SQL oracle follow it through :class:`AudioWindowStage`).
    Non-audio rows pass through untouched (the mirror of
    :class:`ResizeStage`, which passes audio through)."""

    def __init__(self, factor: int = 2):
        if factor < 1:
            raise ValueError("factor must be >= 1")
        self.factor = factor

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        out = batch.copy()
        payloads, durations = [], []
        for r in batch.itertuples():
            if r.mime != WAV_MIME or self.factor == 1:
                payloads.append(r.payload)
                durations.append(getattr(r, "duration_ms", None))
                continue
            samples, rate = decode_wav_pcm16(bytes(r.payload))
            kept = samples[::self.factor]
            new_rate = max(1, rate // self.factor)
            payloads.append(encode_wav_pcm16(kept, new_rate))
            durations.append(int(len(kept) * 1000 / new_rate))
        out["payload"] = payloads
        if "duration_ms" in out.columns:
            out["duration_ms"] = pd.array(durations, dtype="Int64")
        return out


def resample_audio(ds: rd.Dataset, factor: int = 2, *,
                   batch_size: int = 256, concurrency=(1, 4)) -> rd.Dataset:
    return ds.map_batches(ResampleStage,
                          fn_constructor_kwargs=dict(factor=factor),
                          batch_format="pandas",
                          batch_size=batch_size, concurrency=concurrency)
