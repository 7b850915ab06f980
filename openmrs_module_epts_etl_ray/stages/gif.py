"""Pure-stdlib GIF codec (public spec: GIF89a, CompuServe 1990 / W3C note).

The third real image codec of the multimodal family (after the PNG and
baseline/progressive JPEG codecs): LZW with variable code width and deferred
clear, global and local color tables, the 4-pass interlace row order,
animation via per-frame Graphic Control Extensions (delay, disposal 0-2,
transparency). No external codec library — ``struct`` + numpy only.

Reference parity note: the reference ETL engine has no media handling at
all; this module exists for the LLM-training-data side of the brief
(multimodal columns as opaque binary + typed metadata, decoded in
actor-pool ``map_batches`` stages — see stages/multimodal.py).

Scale shape: both entry points are per-payload pure functions called from
actor-pool stages; per-image work is bounded by pixel count, the LZW inner
loop is per-pixel python (inherent to the algorithm — same acceptance as
the PNG unfilter and JPEG Huffman loops), while palette application,
de-interlacing and frame composition are vectorized numpy.
"""
from __future__ import annotations

import struct

import numpy as np

GIF_MIME = "image/gif"

_MAX_CODE = 4096  # 12-bit ceiling fixed by the spec


# --------------------------------------------------------------------------
# LZW (GIF flavor: LSB-first bit packing, variable width 3..12)
# --------------------------------------------------------------------------

def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-LZW compress a 1-D uint8 index stream. Emits an initial CLEAR,
    grows the code width when the decoder's table crosses a power of two,
    and emits CLEAR + resets when the table hits the 12-bit ceiling."""
    clear = 1 << min_code_size
    eoi = clear + 1

    out = bytearray()
    acc = 0          # LSB-first bit accumulator (bounded: flushed per code)
    nbits = 0

    def put(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    width = min_code_size + 1
    table: dict[tuple[int, int], int] = {}
    next_code = eoi + 1
    put(clear, width)
    data = indices.tolist()
    if not data:
        put(eoi, width)
    else:
        prefix = data[0]
        for k in data[1:]:
            key = (prefix, k)
            code = table.get(key)
            if code is not None:
                prefix = code
                continue
            put(prefix, width)
            if next_code == _MAX_CODE:
                # table full: a fresh add would mint code 4096 (unemittable
                # in 12 bits) — reset both sides with an explicit CLEAR
                put(clear, width)
                table.clear()
                next_code = eoi + 1
                width = min_code_size + 1
            else:
                table[key] = next_code
                next_code += 1
                # the decoder widens BEFORE reading the code that follows
                # its table reaching 2^width; it sits one entry behind us,
                # so we widen when our next_code passes that point
                if next_code == (1 << width) + 1 and width < 12:
                    width += 1
            prefix = k
        put(prefix, width)
        put(eoi, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _lzw_decode(payload: bytes, min_code_size: int, n_expected: int) -> np.ndarray:
    """Inverse of :func:`_lzw_encode`; stops at EOI or when ``n_expected``
    pixels have been produced (some writers omit the trailing EOI)."""
    clear = 1 << min_code_size
    eoi = clear + 1
    base = {i: bytes([i]) for i in range(clear)}

    out = bytearray()
    table = dict(base)
    next_code = eoi + 1
    width = min_code_size + 1
    prev: bytes | None = None

    acc = 0
    nbits = 0
    pos = 0
    n_payload = len(payload)
    while len(out) < n_expected:
        while nbits < width:
            if pos >= n_payload:
                raise ValueError("GIF: LZW stream truncated")
            acc |= payload[pos] << nbits
            pos += 1
            nbits += 8
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = dict(base)
            next_code = eoi + 1
            width = min_code_size + 1
            prev = None
            continue
        if code == eoi:
            break
        if prev is None:
            entry = table[code]
        elif code < next_code:
            entry = table[code]
        elif code == next_code:
            entry = prev + prev[:1]
        else:
            raise ValueError(f"GIF: LZW code {code} out of range")
        out += entry
        if prev is not None and next_code < _MAX_CODE:
            table[next_code] = prev + entry[:1]
            next_code += 1
            if next_code == (1 << width) and width < 12:
                width += 1
        prev = entry
    if len(out) < n_expected:
        raise ValueError("GIF: LZW stream ended early")
    return np.frombuffer(bytes(out[:n_expected]), dtype=np.uint8)


def _sub_blocks(data: bytes) -> bytes:
    """Chop ``data`` into <=255-byte length-prefixed sub-blocks + terminator."""
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


# --------------------------------------------------------------------------
# Palette helpers
# --------------------------------------------------------------------------

def _pack_rgb(img: np.ndarray) -> np.ndarray:
    x = img.astype(np.uint32)
    return (x[..., 0] << 16) | (x[..., 1] << 8) | x[..., 2]


def build_palette(frames: list[np.ndarray]) -> np.ndarray:
    """Unique colors across all frames as an (n, 3) uint8 array (sorted by
    packed RGB for determinism). Raises beyond the format's 256 ceiling."""
    packed = np.unique(np.concatenate([_pack_rgb(f).ravel() for f in frames]))
    if len(packed) > 256:
        raise ValueError(f"GIF: {len(packed)} colors exceed the 256-entry "
                         "palette (quantize upstream)")
    pal = np.empty((len(packed), 3), np.uint8)
    pal[:, 0] = (packed >> 16) & 0xFF
    pal[:, 1] = (packed >> 8) & 0xFF
    pal[:, 2] = packed & 0xFF
    return pal


def _indices_for(img: np.ndarray, palette: np.ndarray) -> np.ndarray:
    packed_pal = (palette[:, 0].astype(np.uint32) << 16) \
        | (palette[:, 1].astype(np.uint32) << 8) | palette[:, 2]
    order = np.argsort(packed_pal, kind="stable")
    sorted_pal = packed_pal[order]
    px = _pack_rgb(img).ravel()
    pos = np.searchsorted(sorted_pal, px)
    if (pos >= len(sorted_pal)).any() or (sorted_pal[np.minimum(
            pos, len(sorted_pal) - 1)] != px).any():
        raise ValueError("GIF: image color missing from supplied palette")
    return order[pos].astype(np.uint8)


def _table_bits(n_colors: int) -> int:
    """Color-table size exponent: the table holds 2^(bits) entries, 2..256."""
    bits = 1
    while (1 << bits) < n_colors:
        bits += 1
    return bits


_INTERLACE_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def _interlace_order(h: int) -> np.ndarray:
    return np.concatenate([np.arange(start, h, step)
                           for start, step in _INTERLACE_PASSES])


# --------------------------------------------------------------------------
# Encoder
# --------------------------------------------------------------------------

def encode_gif(
    frames: list[np.ndarray],
    *,
    palette: np.ndarray | None = None,
    interlace: bool = False,
    local_palettes: bool = False,
    delay_cs: int = 4,
    disposal: int = 1,
    transparent_color: tuple[int, int, int] | None = None,
) -> bytes:
    """(h, w, 3) uint8 frames -> GIF. One frame emits a plain GIF89a still;
    several emit an animation (GCE per frame with ``delay_cs`` and
    ``disposal``). ``palette`` pins an explicit color table (superset of
    the used colors — exercises non-zero index mapping); ``local_palettes``
    moves the table from the logical screen onto every image descriptor.
    ``transparent_color`` marks that palette entry transparent in each GCE
    (pixels of it leave the previous canvas visible)."""
    if not frames:
        raise ValueError("need at least one frame")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape[:2] != (h, w):
            raise ValueError("all frames must share the canvas size")
    pal = build_palette(frames) if palette is None \
        else np.asarray(palette, np.uint8).reshape(-1, 3)
    bits = _table_bits(len(pal))
    pal_block = np.zeros(((1 << bits), 3), np.uint8)
    pal_block[: len(pal)] = pal
    pal_bytes = pal_block.tobytes()

    out = bytearray(b"GIF89a")
    gct_flag = 0 if local_palettes else 1
    out += struct.pack("<HHBBB", w, h,
                       (gct_flag << 7) | ((bits - 1) << 4) | (bits - 1),
                       0, 0)
    if gct_flag:
        out += pal_bytes

    animated = len(frames) > 1
    t_idx = None
    if transparent_color is not None:
        t_idx = int(_indices_for(
            np.array(transparent_color, np.uint8).reshape(1, 1, 3), pal)[0])
    for f in frames:
        if animated or t_idx is not None:
            packed = (disposal & 0x7) << 2 | (0 if t_idx is None else 1)
            out += struct.pack("<BBBBHBB", 0x21, 0xF9, 4, packed,
                               delay_cs, 0 if t_idx is None else t_idx, 0)
        desc = (1 << 7 if local_palettes else 0) \
            | (1 << 6 if interlace else 0) \
            | ((bits - 1) if local_palettes else 0)
        out += struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, desc)
        if local_palettes:
            out += pal_bytes
        idx = _indices_for(f, pal).reshape(h, w)
        if interlace:
            idx = idx[_interlace_order(h)]
        mcs = max(2, bits)
        out.append(mcs)
        out += _sub_blocks(_lzw_encode(idx.ravel(), mcs))
    out.append(0x3B)
    return bytes(out)


# --------------------------------------------------------------------------
# Decoder
# --------------------------------------------------------------------------

def decode_gif(payload: bytes) -> list[np.ndarray]:
    """GIF87a/GIF89a -> list of composed full-canvas (h, w, 3) uint8 RGB
    frames (disposal 0/1 draw-over, 2 restore-to-background, transparency
    honored)."""
    if payload[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF payload")
    w, h, packed, bg_idx, _ = struct.unpack("<HHBBB", payload[6:13])
    pos = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 0x7)
        gct = np.frombuffer(payload[pos:pos + 3 * n],
                            np.uint8).reshape(n, 3)
        pos += 3 * n

    canvas = np.zeros((h, w, 3), np.uint8)
    if gct is not None and bg_idx < len(gct):
        canvas[:] = gct[bg_idx]
    background = canvas.copy()
    frames: list[np.ndarray] = []
    transparent: int | None = None
    disposal = 0

    while pos < len(payload):
        block = payload[pos]
        pos += 1
        if block == 0x3B:                      # trailer
            break
        if block == 0x21:                      # extension
            label = payload[pos]
            pos += 1
            if label == 0xF9:                  # graphic control
                size = payload[pos]
                gce = payload[pos + 1:pos + 1 + size]
                pos += 1 + size
                disposal = (gce[0] >> 2) & 0x7
                transparent = gce[3] if gce[0] & 1 else None
                if payload[pos] != 0:
                    raise ValueError("GIF: unterminated GCE")
                pos += 1
            else:                              # comment/app/plain-text: skip
                while payload[pos] != 0:
                    pos += payload[pos] + 1
                pos += 1
            continue
        if block != 0x2C:
            raise ValueError(f"GIF: unexpected block 0x{block:02X}")
        left, top, iw, ih, desc = struct.unpack("<HHHHB",
                                                payload[pos:pos + 9])
        pos += 9
        pal = gct
        if desc & 0x80:                        # local color table
            n = 2 << (desc & 0x7)
            pal = np.frombuffer(payload[pos:pos + 3 * n],
                                np.uint8).reshape(n, 3)
            pos += 3 * n
        if pal is None:
            raise ValueError("GIF: image without any color table")
        mcs = payload[pos]
        pos += 1
        lzw = bytearray()
        while payload[pos] != 0:
            n = payload[pos]
            lzw += payload[pos + 1:pos + 1 + n]
            pos += 1 + n
        pos += 1
        idx = _lzw_decode(bytes(lzw), mcs, iw * ih).reshape(ih, iw)
        if desc & 0x40:                        # de-interlace
            rows = np.empty(ih, np.int64)
            rows[_interlace_order(ih)] = np.arange(ih)
            idx = idx[rows]
        region = canvas[top:top + ih, left:left + iw]
        rgb = pal[idx]
        if transparent is not None:
            opaque = idx != transparent
            region[opaque] = rgb[opaque]
        else:
            region[:] = rgb
        frames.append(canvas.copy())
        if disposal == 2:
            canvas[top:top + ih, left:left + iw] = \
                background[top:top + ih, left:left + iw]
        transparent = None
        disposal = 0
    if not frames:
        raise ValueError("GIF: no image blocks found")
    return frames
