"""Pure-stdlib JPEG codec (ITU T.81): baseline sequential AND progressive.

The last stubbed media surface (VERDICT r4 #2): ``stages/multimodal.py``
decoded PPM/WAV/PNG for real but raised for JPEG. This module implements
both Huffman DCT modes with numpy + stdlib only — no PIL/libjpeg:

- **decode_jpeg**: marker parse (SOI/APP*/COM/DQT/DRI/SOF0/1/2/DHT/SOS/
  EOI), canonical Huffman tables built FROM THE FILE's DHT segments,
  entropy decode with byte unstuffing and RSTn restart handling,
  dequantize, de-zigzag, exact float 8x8 IDCT (orthonormal matrix
  product, vectorized over every block of a component), sampling-factor
  MCU reassembly with chroma replication upsample, JFIF YCbCr->RGB.
  **Progressive (SOF2)** accumulates coefficients across scans: DC scans
  (interleaved or single-component) with successive approximation, AC
  spectral-selection scans with EOB runs, and AC/DC refinement scans
  with correction bits (T.81 G.2; algorithm structure as published in
  the libjpeg reference implementation). Lossless (SOF3+) and
  arithmetic coding raise.
- **encode_jpeg / encode_jpeg_progressive**: the matching encoders
  (4:4:4 or 4:2:0, quality-scaled Annex-K-style quantization tables;
  the progressive one emits a libjpeg-style multi-scan script over a
  universal Huffman table) — they exist so the decoder can be
  fuzz-tested and so the catalog queries can synthesize deterministic
  payloads, exactly the PNG-codec approach. Both share one forward
  path, so decode(progressive) == decode(baseline) pixel-exactly — the
  cross-codec test that pins every SOF2 decode path.

Self-consistency note: the decoder reads Huffman/quant tables from the
payload, so roundtrip correctness never depends on the table constants
matching Annex K digit-for-digit; the tables below are the standard ones
as published (public domain), used by the encoder only.

Determinism/exactness: with quality=100 (all-ones quant tables) a
CONSTANT GRAY image roundtrips BIT-EXACTLY — gray means Cb=Cr=128 and
Y=c exactly; a constant block has only a DC coefficient, 8*(c-128),
which survives unit quantization, and the IDCT of a DC-only block is
DC/8 to ~1e-14, far inside the round-to-int margin. The catalog oracle
rows (``media_jpeg_*``) lean on exactly this.

Scale shape: per-image work runs inside the multimodal actor-pool stages;
the per-block Python entropy loop is bounded by image size (the PNG
Average/Paeth per-byte loop precedent), and the DCT/IDCT/color math is
vectorized over all blocks of a component at once.
"""
from __future__ import annotations

import struct

import numpy as np

JPEG_MIME = "image/jpeg"

# -- constants ---------------------------------------------------------------

# zigzag scan order, generated (not transcribed): zz[k] = flat index of the
# k-th coefficient in diagonal walk order
def _zigzag() -> np.ndarray:
    order = sorted(((u + v, v if (u + v) % 2 == 0 else u, u, v)
                    for u in range(8) for v in range(8)))
    return np.array([u * 8 + v for _, _, u, v in order], dtype=np.int64)


ZZ = _zigzag()                    # natural index for each zigzag position
INV_ZZ = np.argsort(ZZ)           # zigzag position for each natural index

# Annex K base quantization tables (natural order, luminance / chrominance)
QT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99], dtype=np.int64)
QT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99], dtype=np.int64)

# standard Huffman tables (bits per code length 1..16, then values)
DC_LUMA_BITS = [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0]
DC_LUMA_VALS = list(range(12))
DC_CHROMA_BITS = [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0]
DC_CHROMA_VALS = list(range(12))
AC_LUMA_BITS = [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D]
AC_LUMA_VALS = [
    0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
    0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
    0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
    0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
    0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
    0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
    0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
    0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
    0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
    0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
    0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
    0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
    0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
    0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
    0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
    0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
    0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
    0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
    0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
    0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]
AC_CHROMA_BITS = [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77]
AC_CHROMA_VALS = [
    0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
    0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
    0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
    0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
    0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
    0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
    0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
    0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
    0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
    0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
    0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
    0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
    0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
    0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
    0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
    0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
    0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
    0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
    0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
    0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
    0xF9, 0xFA]

# orthonormal 8x8 DCT-II matrix: M[u, x] = a(u) cos((2x+1) u pi / 16)
_M = np.array([[(np.sqrt(1 / 8) if u == 0 else 0.5) *
                np.cos((2 * x + 1) * u * np.pi / 16)
                for x in range(8)] for u in range(8)], dtype=np.float64)


def _quality_tables(quality: int) -> tuple[np.ndarray, np.ndarray]:
    """IJG-style quality scaling; quality=100 -> all-ones (lossless
    quantization step)."""
    q = min(100, max(1, int(quality)))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    out = []
    for base in (QT_LUMA, QT_CHROMA):
        t = (base * scale + 50) // 100
        out.append(np.clip(t, 1, 255).astype(np.int64))
    return out[0], out[1]


# -- Huffman machinery -------------------------------------------------------

def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical JPEG assignment."""
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            codes[vals[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return codes


class _HuffDecoder:
    """Fast canonical decode: one 16-bit-window lookup table, (symbol,
    length) per window — one table probe per symbol instead of a per-bit
    tree walk."""

    def __init__(self, bits: list[int], vals: list[int]):
        self.lut_sym = np.zeros(1 << 16, dtype=np.int16) - 1
        self.lut_len = np.zeros(1 << 16, dtype=np.int8)
        for sym, (code, length) in _canonical_codes(bits, vals).items():
            lo = code << (16 - length)
            hi = lo + (1 << (16 - length))
            self.lut_sym[lo:hi] = sym
            self.lut_len[lo:hi] = length


# LUT cache keyed by the table definition: every image of a corpus
# typically shares a handful of Huffman tables, and building a 2x65536-
# entry window LUT per DHT segment was 47% of decode wall time (profiled)
_HUFF_MEMO: dict[tuple, _HuffDecoder] = {}


def _huff_decoder(bits: list[int], vals: list[int]) -> _HuffDecoder:
    key = (tuple(bits), tuple(vals))
    d = _HUFF_MEMO.get(key)
    if d is None:
        if len(_HUFF_MEMO) >= 64:      # custom-table flood guard
            _HUFF_MEMO.clear()
        d = _HUFF_MEMO[key] = _HuffDecoder(bits, vals)
    return d


class _BitReader:
    """MSB-first reader over the UNSTUFFED entropy byte stream."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0          # byte position
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        while self.nbits <= 56 and self.pos < len(self.data):
            self.acc = ((self.acc << 8) | self.data[self.pos]) & \
                ((1 << 64) - 1)
            self.pos += 1
            self.nbits += 8

    def peek16(self) -> int:
        if self.nbits < 16:
            self._fill()
        if self.nbits >= 16:
            return (self.acc >> (self.nbits - 16)) & 0xFFFF
        return (self.acc << (16 - self.nbits)) & 0xFFFF

    def skip(self, n: int) -> None:
        if self.nbits < n:
            self._fill()
        self.nbits -= n

    def read(self, n: int) -> int:
        if n == 0:
            return 0
        if self.nbits < n:
            self._fill()
        self.nbits -= n
        return (self.acc >> self.nbits) & ((1 << n) - 1)


def _extend(v: int, size: int) -> int:
    """T.81 F.2.2.1 sign extension of a size-bit magnitude."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


# -- decoder -----------------------------------------------------------------

def decode_jpeg(payload: bytes) -> np.ndarray:
    """Huffman JPEG (baseline SOF0/1 or progressive SOF2) -> (h, w, 3)
    uint8 RGB (grayscale replicated)."""
    if payload[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    huff: dict[tuple[int, int], _HuffDecoder] = {}   # (class, id)
    restart_interval = 0
    frame = None
    n_scans = 0            # a header-only progressive stream must raise,
                           # not decode to a plausible all-gray image
    pos = 2
    n = len(payload)
    while pos + 4 <= n:
        if payload[pos] != 0xFF:
            raise ValueError(f"marker sync lost at byte {pos}")
        while pos + 2 <= n and payload[pos + 1] == 0xFF:
            pos += 1                 # T.81 B.1.1.2 optional 0xFF fill bytes
        marker = payload[pos + 1]
        pos += 2
        if marker == 0xD9:                       # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue                             # standalone
        seglen = struct.unpack(">H", payload[pos:pos + 2])[0]
        body = payload[pos + 2:pos + seglen]
        if marker == 0xDB:                       # DQT
            i = 0
            while i < len(body):
                prec, tid = body[i] >> 4, body[i] & 0xF
                i += 1
                if prec:
                    tbl = np.frombuffer(body[i:i + 128], dtype=">u2")
                    i += 128
                else:
                    tbl = np.frombuffer(body[i:i + 64], dtype=np.uint8)
                    i += 64
                nat = np.zeros(64, dtype=np.int64)
                nat[ZZ] = tbl.astype(np.int64)   # stored in zigzag order
                qt[tid] = nat
        elif marker == 0xC4:                     # DHT
            i = 0
            while i < len(body):
                cls, tid = body[i] >> 4, body[i] & 0xF
                bits = list(body[i + 1:i + 17])
                cnt = sum(bits)
                vals = list(body[i + 17:i + 17 + cnt])
                huff[(cls, tid)] = _huff_decoder(bits, vals)
                i += 17 + cnt
        elif marker == 0xDD:                     # DRI
            restart_interval = struct.unpack(">H", body[:2])[0]
        elif marker in (0xC0, 0xC1, 0xC2):       # SOF0/1 (seq), SOF2 (prog)
            precision = body[0]
            if precision != 8:
                raise ValueError("only 8-bit precision supported")
            h, w = struct.unpack(">HH", body[1:5])
            ncomp = body[5]
            comps = []
            for c in range(ncomp):
                cid, hv, tq = body[6 + 3 * c:9 + 3 * c]
                comps.append({"id": cid, "h": hv >> 4, "v": hv & 0xF,
                              "tq": tq})
            frame = {"h": h, "w": w, "comps": comps,
                     "progressive": marker == 0xC2}
            if frame["progressive"]:
                hmax = max(c["h"] for c in comps)
                vmax = max(c["v"] for c in comps)
                mcux = -(-w // (8 * hmax))
                mcuy = -(-h // (8 * vmax))
                prog_planes = [
                    np.zeros((mcuy * c["v"] * mcux * c["h"], 64),
                             dtype=np.int64) for c in comps]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise NotImplementedError(
                "only sequential (SOF0/SOF1) and progressive (SOF2) "
                "Huffman JPEG are supported")
        elif marker == 0xDA:                     # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = body[0]
            scan = []
            for c in range(ns):
                cs, tt = body[1 + 2 * c], body[2 + 2 * c]
                scan.append({"cs": cs, "td": tt >> 4, "ta": tt & 0xF})
            data_start = pos + seglen
            if not frame["progressive"]:
                return _decode_scan(payload, data_start, frame, scan, qt,
                                    huff, restart_interval)
            ss, se = body[1 + 2 * ns], body[2 + 2 * ns]
            aa = body[3 + 2 * ns]
            pos = _decode_prog_scan(
                payload, data_start, frame, scan, huff, restart_interval,
                prog_planes, mcux, mcuy, hmax, vmax,
                ss, se, aa >> 4, aa & 0xF)
            n_scans += 1
            continue
        pos += seglen
    if frame is not None and frame.get("progressive") and n_scans:
        return _finish(prog_planes, frame, qt, mcux, mcuy, hmax, vmax)
    raise ValueError("no SOS segment found")


def _unstuff(payload: bytes, start: int) -> tuple[bytes, list[int], int]:
    """Strip 0xFF00 stuffing; record restart-marker positions (in the
    UNSTUFFED stream) so the bit reader can re-align. Also returns the
    payload index of the terminating marker's 0xFF so a progressive
    decode can continue the segment walk after this scan."""
    out = bytearray()
    restarts = []
    i = start
    n = len(payload)
    while i < n:
        b = payload[i]
        if b != 0xFF:
            out.append(b)
            i += 1
            continue
        m = payload[i + 1] if i + 1 < n else 0xD9
        if m == 0x00:
            out.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:
            restarts.append(len(out))
            i += 2
        else:                                    # EOI or next segment
            break
    return bytes(out), restarts, i


def _decode_scan(payload, start, frame, scan, qt, huff, restart_interval):
    data, restarts, _end = _unstuff(payload, start)
    rdr = _BitReader(data)
    comps = frame["comps"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcux = -(-frame["w"] // (8 * hmax))
    mcuy = -(-frame["h"] // (8 * vmax))
    # per-component coefficient planes (in blocks)
    planes = []
    for c in comps:
        bw, bh = mcux * c["h"], mcuy * c["v"]
        planes.append(np.zeros((bh * bw, 64), dtype=np.int64))
    by_cs = {s["cs"]: s for s in scan}
    pred = [0] * len(comps)
    ri = 0
    next_restart = iter(restarts)
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and ri == restart_interval:
                # re-align at the recorded restart boundary
                rpos = next(next_restart)
                rdr = _BitReader(data[rpos:])
                pred = [0] * len(comps)
                ri = 0
            for ci, c in enumerate(comps):
                s = by_cs[c["id"]]
                dc_t = huff[(0, s["td"])]
                ac_t = huff[(1, s["ta"])]
                bw = mcux * c["h"]
                for v in range(c["v"]):
                    for hh in range(c["h"]):
                        blk = np.zeros(64, dtype=np.int64)
                        # DC
                        size = _hdecode(rdr, dc_t)
                        diff = _extend(rdr.read(size), size) if size else 0
                        pred[ci] += diff
                        blk[0] = pred[ci]
                        # AC
                        k = 1
                        while k < 64:
                            sym = _hdecode(rdr, ac_t)
                            if sym == 0x00:      # EOB
                                break
                            run, size = sym >> 4, sym & 0xF
                            if size == 0:
                                if run != 15:
                                    raise ValueError("bad AC symbol")
                                k += 16          # ZRL
                                continue
                            k += run
                            if k > 63:
                                raise ValueError("AC index overflow")
                            blk[k] = _extend(rdr.read(size), size)
                            k += 1
                        row = my * c["v"] + v
                        col = mx * c["h"] + hh
                        planes[ci][row * bw + col] = blk
            ri += 1
    return _finish(planes, frame, qt, mcux, mcuy, hmax, vmax)


def _finish(planes, frame, qt, mcux, mcuy, hmax, vmax):
    """Coefficient planes (zigzag order, per block) -> RGB pixels:
    dequantize + de-zigzag + IDCT (vectorized per component), replicate
    upsample, JFIF color convert. Shared by the baseline one-scan path
    and the progressive multi-scan accumulator."""
    comps = frame["comps"]
    pixels = []
    for ci, c in enumerate(comps):
        bw, bh = mcux * c["h"], mcuy * c["v"]
        coeff = planes[ci].astype(np.float64) * qt[c["tq"]][ZZ]
        nat = np.zeros_like(coeff)
        nat[:, ZZ] = coeff                       # zigzag -> natural
        blocks = nat.reshape(-1, 8, 8)
        spatial = np.einsum("xu,nuv,vy->nxy", _M.T, blocks, _M)
        img = (spatial.reshape(bh, bw, 8, 8)
               .transpose(0, 2, 1, 3).reshape(bh * 8, bw * 8))
        img = np.clip(np.round(img + 128.0), 0, 255)
        # replicate-upsample to full resolution
        if c["h"] != hmax or c["v"] != vmax:
            img = np.repeat(np.repeat(img, vmax // c["v"], axis=0),
                            hmax // c["h"], axis=1)
        pixels.append(img[: frame["h"], : frame["w"]])
    if len(pixels) == 1:
        y = pixels[0].astype(np.uint8)
        return np.stack([y, y, y], axis=-1)
    y, cb, cr = pixels[0], pixels[1] - 128.0, pixels[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.round(np.stack([r, g, b], axis=-1)),
                   0, 255).astype(np.uint8)


# -- progressive decode (T.81 G.2; algorithm structure as published in
# -- the libjpeg reference implementation, jdphuff.c) -------------------------

def _hdecode(rdr: _BitReader, tbl: _HuffDecoder) -> int:
    w16 = rdr.peek16()
    sym = int(tbl.lut_sym[w16])
    if sym < 0:
        raise ValueError("invalid Huffman code")
    rdr.skip(int(tbl.lut_len[w16]))
    return sym


def _ac_first_block(coef, rdr, ac_t, ss, se, al, eobrun) -> int:
    """One block of an AC initial scan (Ah=0): EOB runs, ZRL, new
    coefficients at magnitude << Al. Returns the updated EOB run."""
    if eobrun:
        return eobrun - 1
    k = ss
    while k <= se:
        sym = _hdecode(rdr, ac_t)
        r, s = sym >> 4, sym & 0xF
        if s == 0:
            if r != 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += rdr.read(r)
                break
            k += 16                              # ZRL
        else:
            k += r
            if k > se:
                raise ValueError("AC index overflow in progressive scan")
            coef[k] = _extend(rdr.read(s), s) << al
            k += 1
    return eobrun


def _ac_refine_block(coef, rdr, ac_t, ss, se, al, eobrun) -> int:
    """One block of an AC refinement scan (Ah=Al+1): correction bits for
    already-nonzero coefficients, ±1<<Al for newly-nonzero ones. Python
    ints are infinite two's complement, so the C bit tests carry over."""
    p1 = 1 << al
    m1 = -p1
    k = ss
    if eobrun == 0:
        while k <= se:
            sym = _hdecode(rdr, ac_t)
            r, s = sym >> 4, sym & 0xF
            sval = 0
            if s == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += rdr.read(r)
                    break                        # EOBn: rest of block below
                # ZRL: skip 16 zero-history coefficients
            else:
                if s != 1:
                    raise ValueError("bad refinement symbol size")
                sval = p1 if rdr.read(1) else m1
            while k <= se:
                c = int(coef[k])
                if c:
                    if rdr.read(1) and (c & p1) == 0:
                        coef[k] = c + (p1 if c >= 0 else m1)
                else:
                    if r == 0:
                        break
                    r -= 1
                k += 1
            if s and k <= se:
                coef[k] = sval
            k += 1
    if eobrun > 0:
        while k <= se:
            c = int(coef[k])
            if c and rdr.read(1) and (c & p1) == 0:
                coef[k] = c + (p1 if c >= 0 else m1)
            k += 1
        eobrun -= 1
    return eobrun


def _comp_blocks(frame, c, hmax, vmax) -> tuple[int, int]:
    """ACTUAL block grid of a component: ceil(ceil(dim * f / fmax) / 8)
    per axis — what non-interleaved scans cover (T.81 A.2.2), smaller
    than the MCU-padded allocation when the image isn't MCU-aligned."""
    cwpx = -(-(frame["w"] * c["h"]) // hmax)     # ceil(w * h_i / hmax)
    chpx = -(-(frame["h"] * c["v"]) // vmax)
    return -(-cwpx // 8), -(-chpx // 8)


def _decode_prog_scan(payload, start, frame, scan, huff, restart_interval,
                      planes, mcux, mcuy, hmax, vmax, ss, se, ah, al) -> int:
    """Decode ONE progressive scan into the persistent coefficient
    planes; returns the payload index where the segment walk resumes.

    Interleaving rules (T.81 G.1.1): a DC scan (Ss=0) may interleave
    several components in MCU order; an AC scan covers exactly one
    component in raster order over its ACTUAL block grid — ceil dims of
    the component, NOT the MCU-padded grid the planes are allocated on.
    """
    data, restarts, end = _unstuff(payload, start)
    rdr = _BitReader(data)
    comps = frame["comps"]
    by_id = {c["id"]: (ci, c) for ci, c in enumerate(comps)}
    pred = [0] * len(comps)
    eobrun = 0
    next_restart = iter(restarts)
    ri = 0

    def maybe_restart():
        nonlocal rdr, pred, eobrun, ri
        if restart_interval and ri == restart_interval:
            rpos = next(next_restart)
            rdr = _BitReader(data[rpos:])
            pred = [0] * len(comps)
            eobrun = 0
            ri = 0
        ri += 1

    if ss == 0:                                  # DC scan
        if se != 0:
            raise ValueError("DC progressive scan must have Se=0")
        members = [(by_id[s["cs"]][0], by_id[s["cs"]][1], s) for s in scan]
        if len(members) > 1:                     # interleaved, MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    maybe_restart()
                    for ci, c, s in members:
                        bwp = mcux * c["h"]
                        for v in range(c["v"]):
                            for hh in range(c["h"]):
                                blk = planes[ci][
                                    (my * c["v"] + v) * bwp
                                    + mx * c["h"] + hh]
                                if ah == 0:
                                    size = _hdecode(rdr, huff[(0, s["td"])])
                                    diff = _extend(rdr.read(size), size) \
                                        if size else 0
                                    pred[ci] += diff
                                    blk[0] = pred[ci] << al
                                elif rdr.read(1):
                                    blk[0] = int(blk[0]) | (1 << al)
        else:                                    # single comp, raster
            ci, c, s = members[0]
            cw, ch = _comp_blocks(frame, c, hmax, vmax)
            bwp = mcux * c["h"]
            for row in range(ch):
                for col in range(cw):
                    maybe_restart()
                    blk = planes[ci][row * bwp + col]
                    if ah == 0:
                        size = _hdecode(rdr, huff[(0, s["td"])])
                        diff = _extend(rdr.read(size), size) if size else 0
                        pred[ci] += diff
                        blk[0] = pred[ci] << al
                    elif rdr.read(1):
                        blk[0] = int(blk[0]) | (1 << al)
    else:                                        # AC scan: one component
        if len(scan) != 1:
            raise ValueError("AC progressive scan must be non-interleaved")
        s = scan[0]
        ci, c = by_id[s["cs"]]
        cw, ch = _comp_blocks(frame, c, hmax, vmax)
        bwp = mcux * c["h"]
        ac_t = huff[(1, s["ta"])]
        block_fn = _ac_first_block if ah == 0 else _ac_refine_block
        for row in range(ch):
            for col in range(cw):
                maybe_restart()
                eobrun = block_fn(planes[ci][row * bwp + col], rdr, ac_t,
                                  ss, se, al, eobrun)
    return end


# -- encoder -----------------------------------------------------------------

class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)            # byte stuffing
        self.acc &= (1 << self.nbits) - 1        # drop emitted bits — an
        # unbounded accumulator makes every later shift copy a bigint of
        # the whole entropy stream (quadratic encode)

    def pad(self) -> None:
        if self.nbits:
            self.put(0x7F, 8 - self.nbits)       # 1-fill padding


def _encode_block(bw: _BitWriter, blk: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    """blk: 64 quantized coefficients in ZIGZAG order; returns new DC pred."""
    dc = int(blk[0])
    diff = dc - pred
    size = int(diff != 0 and int(abs(diff)).bit_length())
    code, length = dc_codes[size]
    bw.put(code, length)
    if size:
        mag = diff if diff > 0 else diff + (1 << size) - 1
        bw.put(mag, size)
    nz = np.flatnonzero(blk[1:]) + 1
    k_prev = 0
    for k in nz:
        run = int(k) - k_prev - 1
        while run >= 16:
            c, ln = ac_codes[0xF0]
            bw.put(c, ln)
            run -= 16
        v = int(blk[k])
        size = int(abs(v)).bit_length()
        c, ln = ac_codes[(run << 4) | size]
        bw.put(c, ln)
        mag = v if v > 0 else v + (1 << size) - 1
        bw.put(mag, size)
        k_prev = int(k)
    if k_prev != 63:
        c, ln = ac_codes[0x00]                   # EOB
        bw.put(c, ln)
    return dc


def _plane_blocks(plane: np.ndarray, q: np.ndarray) -> np.ndarray:
    """(H, W) float plane (level-shifted) -> (n_blocks, 64) quantized
    zigzag coefficients; H, W multiples of 8."""
    hh, ww = plane.shape
    blocks = (plane.reshape(hh // 8, 8, ww // 8, 8)
              .transpose(0, 2, 1, 3).reshape(-1, 8, 8))
    coeff = np.einsum("ux,nxy,yv->nuv", _M, blocks, _M.T).reshape(-1, 64)
    qz = np.round(coeff / q).astype(np.int64)
    return qz[:, ZZ]                             # natural -> zigzag


def _pad_edge(plane: np.ndarray, mh: int, mw: int) -> np.ndarray:
    hh, ww = plane.shape
    ph = (-hh) % mh
    pw = (-ww) % mw
    return np.pad(plane, ((0, ph), (0, pw)), mode="edge")


def _rgb_planes(img: np.ndarray, quality: int, subsample: bool):
    """Shared forward path: RGB -> quantized zigzag coefficient planes
    (MCU-padded) + frame geometry. Used by both the baseline and the
    progressive encoder so their coefficients are IDENTICAL — the basis
    of the cross-codec bit-equality test."""
    h, w, c = img.shape
    assert c == 3 and img.dtype == np.uint8
    f = img.astype(np.float64)
    y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
    cb = 128.0 - 0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2]
    cr = 128.0 + 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2]
    y, cb, cr = (np.clip(np.round(p), 0, 255) for p in (y, cb, cr))
    qy, qc = _quality_tables(quality)
    if subsample:
        sampling = [(2, 2), (1, 1), (1, 1)]
        cbp = _pad_edge(cb, 2, 2)
        crp = _pad_edge(cr, 2, 2)
        cb = np.round(cbp.reshape(cbp.shape[0] // 2, 2, -1, 2)
                      .mean(axis=(1, 3)))
        cr = np.round(crp.reshape(crp.shape[0] // 2, 2, -1, 2)
                      .mean(axis=(1, 3)))
    else:
        sampling = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    planes = []
    for (sh, sv), plane, q in zip(sampling, (y, cb, cr), (qy, qc, qc)):
        p = _pad_edge(plane, mcuy * sv * 8, mcux * sh * 8)[
            : mcuy * sv * 8, : mcux * sh * 8]
        planes.append(_plane_blocks(p - 128.0, q))
    return planes, sampling, qy, qc, mcux, mcuy, hmax, vmax


def _seg(marker: int, body: bytes) -> bytes:
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def encode_jpeg(img: np.ndarray, *, quality: int = 100,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> baseline JFIF JPEG. ``subsample=True`` emits
    4:2:0 chroma (box-averaged); default 4:4:4."""
    h, w, _c = img.shape
    planes, sampling, qy, qc, mcux, mcuy, hmax, vmax = \
        _rgb_planes(img, quality, subsample)

    dc_codes = [_canonical_codes(DC_LUMA_BITS, DC_LUMA_VALS),
                _canonical_codes(DC_CHROMA_BITS, DC_CHROMA_VALS)]
    ac_codes = [_canonical_codes(AC_LUMA_BITS, AC_LUMA_VALS),
                _canonical_codes(AC_CHROMA_BITS, AC_CHROMA_VALS)]

    bw = _BitWriter()
    pred = [0, 0, 0]
    ri = 0
    rst = 0
    entropy_parts = []
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and ri == restart_interval:
                bw.pad()
                entropy_parts.append(bytes(bw.out))
                entropy_parts.append(bytes([0xFF, 0xD0 + (rst % 8)]))
                bw = _BitWriter()
                pred = [0, 0, 0]
                ri = 0
                rst += 1
            for ci, (sh, sv) in enumerate(sampling):
                tbl = 0 if ci == 0 else 1
                bwidth = mcux * sh
                for v in range(sv):
                    for hh in range(sh):
                        row = my * sv + v
                        col = mx * sh + hh
                        blk = planes[ci][row * bwidth + col]
                        pred[ci] = _encode_block(
                            bw, blk, pred[ci], dc_codes[tbl], ac_codes[tbl])
            ri += 1
    bw.pad()
    entropy_parts.append(bytes(bw.out))
    entropy = b"".join(entropy_parts)
    seg = _seg
    out = [b"\xff\xd8",
           seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    for tid, q in ((0, qy), (1, qc)):
        out.append(seg(0xDB, bytes([tid]) + bytes(q[ZZ].astype(np.uint8))))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (sh, sv) in enumerate(sampling):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out.append(seg(0xC0, sof))
    for cls, tid, bits, vals in (
            (0, 0, DC_LUMA_BITS, DC_LUMA_VALS),
            (1, 0, AC_LUMA_BITS, AC_LUMA_VALS),
            (0, 1, DC_CHROMA_BITS, DC_CHROMA_VALS),
            (1, 1, AC_CHROMA_BITS, AC_CHROMA_VALS)):
        out.append(seg(0xC4, bytes([(cls << 4) | tid]) + bytes(bits) +
                       bytes(vals)))
    if restart_interval:
        out.append(seg(0xDD, struct.pack(">H", restart_interval)))
    sos = bytes([3])
    for ci in range(3):
        t = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (t << 4) | t])
    sos += bytes([0, 63, 0])
    out.append(seg(0xDA, sos))
    out.append(entropy)
    out.append(b"\xff\xd9")
    return b"".join(out)


# -- progressive encoder (test-vector generator for the SOF2 decoder) --------

# Universal Huffman table: 255 symbols at 9 bits + one at 10 (a DHT BITS
# entry is one byte, so 256-at-one-length is not encodable) — a legal
# canonical (incomplete) table. Wasteful on the wire, trivially correct;
# progressive scans need EOBn/ZRL symbols the Annex-K tables don't carry,
# and these payloads exist to exercise the decoder, not to be small.
PROG_BITS = [0] * 8 + [255, 1] + [0] * 6
PROG_VALS = list(range(256))


def _emit_mag(bw: _BitWriter, v: int, size: int) -> None:
    bw.put(v if v > 0 else v + (1 << size) - 1, size)


class _AcScanState:
    """EOB-run + buffered-correction-bit bookkeeping shared by the AC
    first and AC refinement scan encoders (structure as published in the
    libjpeg reference encoder, jcphuff.c)."""

    def __init__(self, bw: _BitWriter, codes):
        self.bw = bw
        self.codes = codes
        self.eobrun = 0
        self.be: list[int] = []      # correction bits pending behind eobrun

    def sym(self, s: int) -> None:
        c, ln = self.codes[s]
        self.bw.put(c, ln)

    def flush(self) -> None:
        if self.eobrun:
            n = self.eobrun.bit_length() - 1
            self.sym(n << 4)
            if n:
                self.bw.put(self.eobrun & ((1 << n) - 1), n)
            self.eobrun = 0
        for b in self.be:
            self.bw.put(b, 1)
        self.be = []


def _enc_ac_first(st: _AcScanState, blk, ss, se, al) -> None:
    r = 0
    for k in range(ss, se + 1):
        v = int(blk[k])
        av = abs(v) >> al                        # point transform: toward 0
        if av == 0:
            r += 1
            continue
        st.flush()
        while r > 15:
            st.sym(0xF0)
            r -= 16
        size = av.bit_length()
        st.sym((r << 4) | size)
        _emit_mag(st.bw, av if v > 0 else -av, size)
        r = 0
    if r:
        st.eobrun += 1
        if st.eobrun == 0x7FFF:
            st.flush()


def _enc_ac_refine(st: _AcScanState, blk, ss, se, al) -> None:
    av = [abs(int(blk[k])) >> al for k in range(ss, se + 1)]
    # last newly-nonzero position: ZRLs beyond it fold into the EOB run
    eob = 0
    for i, a in enumerate(av):
        if a == 1:
            eob = ss + i
    r = 0
    br: list[int] = []                           # bits since last symbol
    for k in range(ss, se + 1):
        a = av[k - ss]
        if a == 0:
            r += 1
            continue
        # fold ZRLs at EVERY nonzero coefficient (correction bits must
        # stay positionally interleaved with the zeros a ZRL covers)
        while r > 15 and k <= eob:
            st.flush()
            st.sym(0xF0)
            r -= 16
            for b in br:
                st.bw.put(b, 1)
            br = []
        if a > 1:                                # already nonzero: one bit
            br.append(a & 1)
            continue
        st.flush()
        st.sym((r << 4) | 1)
        st.bw.put(1 if int(blk[k]) > 0 else 0, 1)
        for b in br:
            st.bw.put(b, 1)
        br = []
        r = 0
    if r or br:
        st.eobrun += 1
        st.be.extend(br)
        if st.eobrun == 0x7FFF:
            st.flush()


class _ScanWriter:
    """Per-scan entropy segments with optional RSTn restart boundaries:
    call ``boundary()`` before each unit (MCU for interleaved DC, block
    otherwise); at every ``restart_interval`` units it byte-aligns,
    emits the restart marker and resets the per-interval state (DC
    predictors via the callback, EOB run + buffered bits via a fresh
    ``_AcScanState``)."""

    def __init__(self, codes, restart_interval: int, on_reset=None):
        self.codes = codes
        self.ri = restart_interval
        self.on_reset = on_reset
        self.parts: list[bytes] = []
        self.rst = 0
        self.n = 0
        self.bw = _BitWriter()
        self.st = _AcScanState(self.bw, codes)

    def boundary(self) -> None:
        if self.ri and self.n == self.ri:
            self.st.flush()
            self.bw.pad()
            self.parts.append(bytes(self.bw.out))
            self.parts.append(bytes([0xFF, 0xD0 + (self.rst % 8)]))
            self.rst += 1
            self.n = 0
            self.bw = _BitWriter()
            self.st = _AcScanState(self.bw, self.codes)
            if self.on_reset:
                self.on_reset()
        self.n += 1

    def finish(self) -> bytes:
        self.st.flush()
        self.bw.pad()
        self.parts.append(bytes(self.bw.out))
        return b"".join(self.parts)


def encode_jpeg_progressive(img: np.ndarray, *, quality: int = 100,
                            subsample: bool = False,
                            restart_interval: int = 0) -> bytes:
    """(h, w, 3) uint8 RGB -> progressive (SOF2) JFIF JPEG using a
    libjpeg-style multi-scan script: interleaved DC with successive
    approximation, spectral-selection AC first scans, then DC and AC
    refinement scans (DC refinement as single-component scans).
    Quantized coefficients are IDENTICAL to ``encode_jpeg`` on the same
    input (shared forward path), so both files must decode to the same
    pixels. ``restart_interval`` emits DRI + RSTn boundaries in every
    scan (units: MCUs for the interleaved DC scan, blocks elsewhere)."""
    h, w, _c = img.shape
    planes, sampling, qy, qc, mcux, mcuy, hmax, vmax = \
        _rgb_planes(img, quality, subsample)
    codes = _canonical_codes(PROG_BITS, PROG_VALS)
    frame = {"h": h, "w": w,
             "comps": [{"h": sh, "v": sv} for sh, sv in sampling]}
    grid = [_comp_blocks(frame, c, hmax, vmax) for c in frame["comps"]]

    def dc_scan(ah: int, al: int, only_ci: int | None = None) -> bytes:
        pred = [0, 0, 0]
        sw = _ScanWriter(codes, restart_interval,
                         on_reset=lambda: pred.__setitem__(
                             slice(None), [0, 0, 0]))

        def one(ci: int, blk) -> None:
            if ah == 0:
                val = int(blk[0]) >> al          # arithmetic shift (DC)
                diff = val - pred[ci]
                pred[ci] = val
                size = int(diff != 0 and int(abs(diff)).bit_length())
                c_, ln = codes[size]
                sw.bw.put(c_, ln)
                if size:
                    _emit_mag(sw.bw, diff, size)
            else:
                sw.bw.put((int(blk[0]) >> al) & 1, 1)

        if only_ci is not None:                  # non-interleaved: raster
            cw, ch = grid[only_ci]               # over ACTUAL comp blocks
            bwp = mcux * sampling[only_ci][0]
            for row in range(ch):
                for col in range(cw):
                    sw.boundary()
                    one(only_ci, planes[only_ci][row * bwp + col])
        else:                                    # interleaved MCU order
            for my in range(mcuy):
                for mx in range(mcux):
                    sw.boundary()
                    for ci, (sh, sv) in enumerate(sampling):
                        bwp = mcux * sh
                        for v in range(sv):
                            for hh in range(sh):
                                one(ci, planes[ci][(my * sv + v) * bwp
                                                   + mx * sh + hh])
        return sw.finish()

    def ac_scan(ci: int, ss: int, se: int, ah: int, al: int) -> bytes:
        sw = _ScanWriter(codes, restart_interval)
        cw, ch = grid[ci]
        bwp = mcux * sampling[ci][0]
        enc = _enc_ac_first if ah == 0 else _enc_ac_refine
        for row in range(ch):
            for col in range(cw):
                sw.boundary()
                enc(sw.st, planes[ci][row * bwp + col], ss, se, al)
        return sw.finish()

    out = [b"\xff\xd8",
           _seg(0xE0, b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00")]
    for tid, q in ((0, qy), (1, qc)):
        out.append(_seg(0xDB, bytes([tid]) + bytes(q[ZZ].astype(np.uint8))))
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for ci, (sh, sv) in enumerate(sampling):
        sof += bytes([ci + 1, (sh << 4) | sv, 0 if ci == 0 else 1])
    out.append(_seg(0xC2, sof))
    if restart_interval:
        out.append(_seg(0xDD, struct.pack(">H", restart_interval)))
    for cls in (0, 1):
        out.append(_seg(0xC4, bytes([(cls << 4) | 0]) + bytes(PROG_BITS) +
                        bytes(PROG_VALS)))

    def sos(comp_ids, ss, se, ah, al) -> bytes:
        body = bytes([len(comp_ids)])
        for cid in comp_ids:
            body += bytes([cid, 0x00])           # td=0, ta=0 (universal)
        return _seg(0xDA, body + bytes([ss, se, (ah << 4) | al]))

    # the script: every decoder path — interleaved + single-comp DC with
    # SA, split spectral AC first scans, DC refine, chained AC refines
    out += [sos([1, 2, 3], 0, 0, 0, 1), dc_scan(0, 1),
            sos([1], 1, 5, 0, 2), ac_scan(0, 1, 5, 0, 2),
            sos([2], 1, 63, 0, 1), ac_scan(1, 1, 63, 0, 1),
            sos([3], 1, 63, 0, 1), ac_scan(2, 1, 63, 0, 1),
            sos([1], 6, 63, 0, 2), ac_scan(0, 6, 63, 0, 2),
            # DC refinement as three NON-interleaved scans: exercises the
            # single-component DC raster path of the decoder
            sos([1], 0, 0, 1, 0), dc_scan(1, 0, only_ci=0),
            sos([2], 0, 0, 1, 0), dc_scan(1, 0, only_ci=1),
            sos([3], 0, 0, 1, 0), dc_scan(1, 0, only_ci=2),
            sos([1], 1, 63, 2, 1), ac_scan(0, 1, 63, 2, 1),
            sos([2], 1, 63, 1, 0), ac_scan(1, 1, 63, 1, 0),
            sos([1], 1, 63, 1, 0), ac_scan(0, 1, 63, 1, 0),
            sos([3], 1, 63, 1, 0), ac_scan(2, 1, 63, 1, 0),
            b"\xff\xd9"]
    return b"".join(out)
