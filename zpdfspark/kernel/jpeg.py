"""Minimal pure-Python baseline JPEG decoder for the multimodal kernel.

The sandbox has no codec libraries (PIL/ffmpeg), but baseline JPEG is
just marker parsing + canonical Huffman + dequantization + a fixed 8x8
IDCT — all expressible with struct/numpy, the same substitution story as
the PDF kernel's SIMD-to-numpy mapping (SURVEY.md V1-V7) and the PNG
decoder (kernel/png.py). So the image-decode step of the media pipeline
is REAL for JPEG too: mp3/video remain honestly stubbed (media.py).

Supported: baseline sequential DCT (SOF0), 8-bit precision, 1 or 3
components, sampling factors 1 or 2 (4:4:4, 4:2:2, 4:2:0), restart
intervals (DRI/RSTn). Progressive (SOF2), arithmetic coding, 12-bit,
and hierarchical modes raise JpegError — callers treat a failed decode
as data, never as a task failure (the PDF kernel's permissive contract).

``encode_jpeg`` is the fixtures/tests-side independent direction
(mirrors encode_png): forward DCT + canonical-by-construction Huffman
tables written into DHT, deliberately NOT Annex K and NOT sharing the
decoder's table/bit machinery, so round-trip tests exercise the real
decode path. With unit quantization tables the round-trip error is
bounded by DCT rounding only (a few intensity levels).
"""

from __future__ import annotations

import math
import struct
from typing import Dict, List, Tuple

import numpy as np

# decoded-size DoS cap (PNG/Z12 spirit). Tighter than PNG's 64 MB: the
# block loop is pure Python, so decode TIME is O(pixels) with a much
# larger constant than zlib — a production deployment swaps a C codec in
# behind the same decode_media seam; the cap keeps hostile crawl data
# from pinning an executor core for minutes.
MAX_PIXEL_BYTES = 16 * 1024 * 1024

# raster position of the k-th zigzag-scanned coefficient (ISO 10918 fig 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)


class JpegError(Exception):
    pass


def _idct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis A (A @ f @ A.T == JPEG FDCT);
    spatial = A.T @ coeffs @ A."""
    a = np.empty((8, 8), dtype=np.float64)
    for u in range(8):
        cu = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


_A = _idct_matrix()


class _Huff:
    """Canonical Huffman table from DHT counts+symbols."""

    def __init__(self, counts: List[int], symbols: bytes):
        self.lookup: Dict[Tuple[int, int], int] = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                if k >= len(symbols):
                    raise JpegError("DHT symbol underrun")
                self.lookup[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1
            if code > (1 << (length + 1)):
                raise JpegError("DHT overfull code set")


class _BitReader:
    """MSB-first bit reader over an UNSTUFFED entropy segment."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bits = 0
        self.acc = 0

    def read_bit(self) -> int:
        if self.bits == 0:
            if self.pos >= len(self.data):
                raise JpegError("entropy data exhausted")
            self.acc = self.data[self.pos]
            self.pos += 1
            self.bits = 8
        self.bits -= 1
        return (self.acc >> self.bits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_symbol(self, table: _Huff) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | self.read_bit()
            sym = table.lookup.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """DC/AC magnitude-category decode (spec EXTEND)."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _split_entropy(raw: bytes, pos: int) -> Tuple[List[bytes], int]:
    """Collect the entropy-coded segment starting at ``pos``: unstuff
    0xFF00, split on RST markers (restart intervals), stop at any other
    marker. Returns (segments, position of the terminating marker)."""
    segments: List[bytes] = []
    cur = bytearray()
    i = pos
    n = len(raw)
    while i < n:
        b = raw[i]
        if b != 0xFF:
            cur.append(b)
            i += 1
            continue
        if i + 1 >= n:
            break
        m = raw[i + 1]
        if m == 0x00:
            cur.append(0xFF)
            i += 2
        elif 0xD0 <= m <= 0xD7:  # RSTn: new segment, reset predictors
            segments.append(bytes(cur))
            cur = bytearray()
            i += 2
        elif m == 0xFF:  # fill byte
            i += 1
        else:
            break
    segments.append(bytes(cur))
    return segments, i


def decode_jpeg(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """raw JPEG bytes -> (width, height, channels, pixels[h, w, c] uint8).

    3-component scans are converted JFIF YCbCr -> RGB; 1-component
    scans return grayscale (channels == 1)."""
    if len(raw) < 4 or raw[0] != 0xFF or raw[1] != 0xD8:
        raise JpegError("bad SOI")
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], _Huff] = {}  # (class, id) -> table
    frame = None  # (h, w, comps) where comps = [(id, hs, vs, tq)]
    restart_interval = 0
    scan = None
    pos = 2
    n = len(raw)
    while pos + 4 <= n:
        if raw[pos] != 0xFF:
            raise JpegError("marker expected")
        marker = raw[pos + 1]
        if marker == 0xD9:  # EOI
            break
        if 0xD0 <= marker <= 0xD7 or marker == 0x01:
            pos += 2
            continue
        (seglen,) = struct.unpack(">H", raw[pos + 2:pos + 4])
        if seglen < 2 or pos + 2 + seglen > n:
            raise JpegError("truncated segment")
        seg = raw[pos + 4:pos + 2 + seglen]
        pos += 2 + seglen
        if marker == 0xDB:  # DQT
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 15
                i += 1
                if pq == 0:
                    if i + 64 > len(seg):
                        raise JpegError("short DQT")
                    qt[tq] = np.frombuffer(
                        seg[i:i + 64], dtype=np.uint8).astype(np.float64)
                    i += 64
                elif pq == 1:
                    if i + 128 > len(seg):
                        raise JpegError("short DQT")
                    qt[tq] = np.frombuffer(
                        seg[i:i + 128], dtype=">u2").astype(np.float64)
                    i += 128
                else:
                    raise JpegError("bad DQT precision")
        elif marker == 0xC4:  # DHT
            i = 0
            while i + 17 <= len(seg):
                tc, th = seg[i] >> 4, seg[i] & 15
                counts = list(seg[i + 1:i + 17])
                total = sum(counts)
                if i + 17 + total > len(seg):
                    raise JpegError("short DHT")
                huff[(tc, th)] = _Huff(counts, seg[i + 17:i + 17 + total])
                i += 17 + total
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            if len(seg) < 6:
                raise JpegError("short SOF")
            prec, h, w, nc = seg[0], *struct.unpack(">HH", seg[1:5]), seg[5]
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            if nc not in (1, 3):
                raise JpegError(f"unsupported component count {nc}")
            if len(seg) < 6 + 3 * nc:
                raise JpegError("short SOF components")
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
            frame = (h, w, comps)
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline sequential DCT supported")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise JpegError("short DRI")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise JpegError("short SOS")
            tables = {}
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td_ta = seg[2 + 2 * c]
                tables[cs] = (td_ta >> 4, td_ta & 15)
            segments, pos = _split_entropy(raw, pos)
            scan = (tables, segments)
            break  # single-scan baseline: decode below
        # else: APPn/COM/unknown — skipped via seglen
    if frame is None or scan is None:
        raise JpegError("missing SOF/SOS")
    h, w, comps = frame
    if h == 0 or w == 0:
        raise JpegError("zero dimension")
    if h * w * len(comps) > MAX_PIXEL_BYTES:
        raise JpegError("image too large")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise JpegError("unsupported sampling factors")
    for _, hs, vs, _ in comps:
        if hs not in (1, 2) or vs not in (1, 2):
            raise JpegError("unsupported sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    tables, segments = scan
    planes = []
    for cid, hs, vs, tq in comps:
        if tq not in qt:
            raise JpegError("missing quant table")
        if cid not in tables:
            raise JpegError("scan missing component")
        td, ta = tables[cid]
        if (0, td) not in huff or (1, ta) not in huff:
            raise JpegError("missing Huffman table")
        planes.append(np.zeros((mcuy * vs * 8, mcux * hs * 8),
                               dtype=np.float64))

    mcus_total = mcux * mcuy
    per_segment = restart_interval if restart_interval else mcus_total
    mcu = 0
    seg_idx = 0
    br = None
    preds = [0] * len(comps)
    while mcu < mcus_total:
        if mcu % per_segment == 0:
            if seg_idx >= len(segments):
                raise JpegError("missing restart segment")
            br = _BitReader(segments[seg_idx])
            seg_idx += 1
            preds = [0] * len(comps)
        my, mx = divmod(mcu, mcux)
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            td, ta = tables[cid]
            dc_tab, ac_tab = huff[(0, td)], huff[(1, ta)]
            q = qt[tq]
            for by in range(vs):
                for bx in range(hs):
                    coef = np.zeros(64, dtype=np.float64)
                    s = br.read_symbol(dc_tab)
                    if s > 11:
                        raise JpegError("bad DC category")
                    preds[ci] += _extend(br.read_bits(s), s)
                    coef[0] = preds[ci]
                    k = 1
                    while k < 64:
                        rs = br.read_symbol(ac_tab)
                        r, sz = rs >> 4, rs & 15
                        if sz == 0:
                            if r == 15:
                                k += 16
                                continue
                            break  # EOB
                        k += r
                        if k > 63:
                            raise JpegError("AC index overflow")
                        coef[k] = _extend(br.read_bits(sz), sz)
                        k += 1
                    blk = np.zeros(64, dtype=np.float64)
                    blk[ZIGZAG] = coef * q
                    spatial = _A.T @ blk.reshape(8, 8) @ _A
                    y0 = (my * vs + by) * 8
                    x0 = (mx * hs + bx) * 8
                    planes[ci][y0:y0 + 8, x0:x0 + 8] = spatial
        mcu += 1

    out = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci] + 128.0
        p = np.repeat(np.repeat(p, vmax // vs, axis=0), hmax // hs, axis=1)
        out.append(p[:h, :w])
    if len(out) == 1:
        pixels = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return w, h, 1, pixels[:, :, None]
    y, cb, cr = out
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    pixels = np.clip(np.round(np.stack([r, g, b], axis=-1)), 0, 255)
    return w, h, 3, pixels.astype(np.uint8)


# ---------------------------------------------------------------------------
# Independent encoder (fixtures/tests direction, mirrors encode_png)
# ---------------------------------------------------------------------------

def _enc_dct_matrix() -> np.ndarray:
    # built locally (not shared with the decoder's _A) on purpose: the
    # encoder is the independent test direction
    a = np.empty((8, 8))
    for u in range(8):
        cu = math.sqrt(1 / 8) if u == 0 else math.sqrt(2 / 8)
        for x in range(8):
            a[u, x] = cu * math.cos((2 * x + 1) * u * math.pi / 16)
    return a


def _enc_tables():
    """Canonical-by-construction Huffman tables: all 12 DC categories as
    4-bit codes (codes 0..11; all-ones unused), all 162 AC symbols as
    9-bit codes. Valid per Kraft, simple, and deliberately NOT the
    Annex K tables the decoder might be tempted to hard-code."""
    dc_counts = [0] * 16
    dc_counts[3] = 12  # twelve 4-bit codes
    dc_syms = bytes(range(12))
    ac_syms = bytearray([0x00, 0xF0])  # EOB, ZRL
    for r in range(16):
        for s in range(1, 11):
            ac_syms.append((r << 4) | s)
    ac_counts = [0] * 16
    ac_counts[8] = len(ac_syms)  # 162 nine-bit codes
    dc_codes = {sym: (4, i) for i, sym in enumerate(dc_syms)}
    ac_codes = {sym: (9, i) for i, sym in enumerate(ac_syms)}
    return (dc_counts, bytes(dc_syms), dc_codes,
            ac_counts, bytes(ac_syms), ac_codes)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        for i in range(length - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)  # byte stuffing
                self.acc = 0
                self.nbits = 0

    def flush(self) -> bytes:
        if self.nbits:
            self.write((1 << (8 - self.nbits)) - 1, 8 - self.nbits)
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coef_zz: np.ndarray, pred: int,
                  dc_codes, ac_codes) -> int:
    dc = int(coef_zz[0])
    diff = dc - pred
    s = _category(diff)
    length, code = dc_codes[s]
    bw.write(code, length)
    if s:
        bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    for k in range(63, 0, -1):
        if coef_zz[k]:
            last_nz = k
            break
    for k in range(1, last_nz + 1):
        v = int(coef_zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            length, code = ac_codes[0xF0]
            bw.write(code, length)
            run -= 16
        s = _category(v)
        length, code = ac_codes[(run << 4) | s]
        bw.write(code, length)
        bw.write(v if v >= 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz != 63:
        length, code = ac_codes[0x00]
        bw.write(code, length)
    return dc


def encode_jpeg(pixels: np.ndarray, quant: int = 1,
                subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Minimal baseline encoder for fixtures/tests: grayscale (h,w) or
    (h,w,1), or RGB (h,w,3). ``quant=1`` gives near-lossless round trips
    (DCT rounding only). ``subsample=True`` writes 4:2:0 chroma (2x2
    box average) for RGB inputs. ``restart_interval`` > 0 emits DRI +
    RSTn markers every that many MCUs (exercises the decoder's restart
    path)."""
    arr = np.asarray(pixels, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("encode_jpeg supports 1 or 3 channels")
    if c == 3:
        r, g, b = arr[:, :, 0], arr[:, :, 1], arr[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        chans = [y, cb, cr]
    else:
        chans = [arr[:, :, 0]]
        subsample = False

    a = _enc_dct_matrix()
    qtab = np.full(64, quant, dtype=np.float64)
    (dc_counts, dc_syms, dc_codes,
     ac_counts, ac_syms, ac_codes) = _enc_tables()

    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * c
    hmax = max(s[0] for s in samp[:c])
    vmax = max(s[1] for s in samp[:c])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def comp_plane(ci):
        hs, vs = samp[ci]
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        ch = chans[ci]
        if (hs, vs) != (hmax, vmax):  # 2x2 box-average downsample
            fy, fx = vmax // vs, hmax // hs
            padded = np.empty((math.ceil(h / fy) * fy,
                               math.ceil(w / fx) * fx))
            padded[:h, :w] = ch
            padded[h:, :w] = ch[h - 1:h, :]
            padded[:, w:] = padded[:, w - 1:w]
            ch = padded.reshape(padded.shape[0] // fy, fy,
                                padded.shape[1] // fx, fx).mean(axis=(1, 3))
        out = np.empty((ph, pw))
        ch_h, ch_w = ch.shape
        out[:ch_h, :ch_w] = ch
        out[ch_h:, :ch_w] = ch[ch_h - 1:ch_h, :]
        out[:, ch_w:] = out[:, ch_w - 1:ch_w]
        return out - 128.0

    planes = [comp_plane(ci) for ci in range(c)]

    scan = bytearray()
    bw = _BitWriter()
    preds = [0] * c
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[ZIGZAG] = np.arange(64)
    mcu_idx = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_idx and \
                    mcu_idx % restart_interval == 0:
                scan += bw.flush()
                scan += bytes([0xFF, 0xD0 + ((mcu_idx // restart_interval
                                              - 1) % 8)])
                bw = _BitWriter()
                preds = [0] * c
            for ci in range(c):
                hs, vs = samp[ci]
                for by in range(vs):
                    for bx in range(hs):
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        block = planes[ci][y0:y0 + 8, x0:x0 + 8]
                        coef = a @ block @ a.T
                        q = np.round(coef.reshape(64) / qtab[inv_zz])
                        coef_zz = q[ZIGZAG]
                        preds[ci] = _encode_block(
                            bw, coef_zz, preds[ci], dc_codes, ac_codes)
            mcu_idx += 1
    scan += bw.flush()
    scan = bytes(scan)

    def marker(m: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, m, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    if restart_interval:
        out += marker(0xDD, struct.pack(">H", restart_interval))
    out += marker(0xDB, bytes([0x00]) + bytes(int(qtab[i]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for ci in range(c):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += marker(0xC0, sof)
    out += marker(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    out += marker(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)
    sos = bytes([c]) + b"".join(bytes([ci + 1, 0x00]) for ci in range(c)) \
        + bytes([0, 63, 0])
    out += marker(0xDA, sos)
    out += scan
    out += b"\xff\xd9"
    return bytes(out)
