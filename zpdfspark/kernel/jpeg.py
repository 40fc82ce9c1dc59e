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


def _frame_geometry(frame):
    """Validate frame dims/sampling and return per-component geometry
    tuples (hs, vs, bx_pad, by_pad, nbw, nbh): MCU-padded block grid for
    interleaved scans, true block grid (T.81 A.1.1: ceil(ceil(dim *
    s/smax)/8)) for non-interleaved single-component scans."""
    h, w, comps = frame
    if h == 0 or w == 0:
        raise JpegError("zero dimension")
    if h * w * len(comps) > MAX_PIXEL_BYTES:
        raise JpegError("image too large")
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if not (1 <= hmax <= 2 and 1 <= vmax <= 2):
        raise JpegError("unsupported sampling factors")
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    geom = []
    for _cid, hs, vs, _tq in comps:
        if hs not in (1, 2) or vs not in (1, 2):
            raise JpegError("unsupported sampling factors")
        cw = -(-w * hs // hmax)
        ch = -(-h * vs // vmax)
        geom.append((hs, vs, mcux * hs, mcuy * vs,
                     -(-cw // 8), -(-ch // 8)))
    return geom


def _decode_scan(frame, geom, coefs, huff, order, tables, segments,
                 restart_interval, progressive, ss, se, ah, al):
    """Decode one entropy-coded scan into the coefficient store.
    Baseline: DC+AC per block, interleaved (or single-component grid
    when ns == 1). Progressive: the four T.81 G.1.2 scan kinds — DC
    first / DC refine (1 bit per block) / AC first (EOB runs) / AC
    refine (correction bits). Restart segments reset DC predictors and
    the EOB run."""
    h, w, comps = frame
    cid_to_ci = {c[0]: i for i, c in enumerate(comps)}
    if not order:
        raise JpegError("empty scan")
    try:
        sel = [cid_to_ci[cs] for cs in order]
    except KeyError:
        raise JpegError("scan references unknown component")
    if len(set(sel)) != len(sel):
        raise JpegError("duplicate component in scan")
    if ss > se or se > 63:
        raise JpegError("bad spectral selection")
    if progressive and ss == 0 and se != 0:
        raise JpegError("progressive DC scan must have Se=0")
    if ss > 0 and len(sel) != 1:
        raise JpegError("AC scan must be single-component")
    if al > 13 or ah > 13:
        raise JpegError("bad successive approximation")

    dc_tabs = {}
    ac_tabs = {}
    for cs, ci in zip(order, sel):
        td, ta = tables[cs]
        if ss == 0 and ah == 0:  # DC first / baseline need a DC table
            if (0, td) not in huff:
                raise JpegError("missing Huffman table")
            dc_tabs[ci] = huff[(0, td)]
        if (not progressive) or ss > 0:  # baseline AC / AC scans
            if ah == 0 or ss > 0:
                if (1, ta) not in huff:
                    raise JpegError("missing Huffman table")
                ac_tabs[ci] = huff[(1, ta)]

    interleaved = len(sel) > 1
    if interleaved:
        hmax = max(c[1] for c in comps)
        mcux = -(-w // (8 * hmax))
        vmax = max(c[2] for c in comps)
        mcuy = -(-h // (8 * vmax))
        units_total = mcux * mcuy
    else:
        ci0 = sel[0]
        nbw, nbh = geom[ci0][4], geom[ci0][5]
        units_total = nbw * nbh
    per_segment = restart_interval if restart_interval else units_total

    ac_first = progressive and ss > 0 and ah == 0
    ac_refine = progressive and ss > 0 and ah > 0
    dc_refine = progressive and ss == 0 and ah > 0
    p1 = 1 << al
    m1 = -1 << al

    def decode_baseline_block(br, blk, by, bx, ci, preds):
        dc_tab, ac_tab = dc_tabs[ci], ac_tabs[ci]
        s = br.read_symbol(dc_tab)
        if s > 11:
            raise JpegError("bad DC category")
        preds[ci] += _extend(br.read_bits(s), s)
        blk[by, bx, 0] = preds[ci]
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
            blk[by, bx, k] = _extend(br.read_bits(sz), sz)
            k += 1

    def decode_ac_first_block(br, blk, by, bx, ci, state):
        if state["eobrun"] > 0:
            state["eobrun"] -= 1
            return
        ac_tab = ac_tabs[ci]
        k = ss
        while k <= se:
            rs = br.read_symbol(ac_tab)
            r, sz = rs >> 4, rs & 15
            if sz == 0:
                if r != 15:
                    eobrun = 1 << r
                    if r:
                        eobrun += br.read_bits(r)
                    state["eobrun"] = eobrun - 1
                    return
                k += 16
                continue
            k += r
            if k > se:
                raise JpegError("AC index overflow")
            blk[by, bx, k] = _extend(br.read_bits(sz), sz) << al
            k += 1

    def refine_nonzero(br, blk, by, bx, k):
        v = int(blk[by, bx, k])
        if br.read_bit() and (v & p1) == 0:
            blk[by, bx, k] = v + (p1 if v >= 0 else m1)

    def decode_ac_refine_block(br, blk, by, bx, ci, state):
        # T.81 G.1.2.3 correction-bit procedure (the libjpeg
        # decode_mcu_AC_refine control flow)
        ac_tab = ac_tabs[ci]
        k = ss
        if state["eobrun"] == 0:
            while k <= se:
                rs = br.read_symbol(ac_tab)
                r, sz = rs >> 4, rs & 15
                newval = 0
                if sz:
                    if sz != 1:
                        raise JpegError("bad refinement magnitude")
                    newval = p1 if br.read_bit() else m1
                else:
                    if r != 15:
                        eobrun = 1 << r
                        if r:
                            eobrun += br.read_bits(r)
                        state["eobrun"] = eobrun
                        break
                # advance over r zero-history coefficients, emitting
                # correction bits for intervening nonzeros
                while k <= se:
                    if blk[by, bx, k] != 0:
                        refine_nonzero(br, blk, by, bx, k)
                    else:
                        if r == 0:
                            break
                        r -= 1
                    k += 1
                if sz and k <= se:
                    blk[by, bx, k] = newval
                k += 1
        if state["eobrun"] > 0:
            while k <= se:
                if blk[by, bx, k] != 0:
                    refine_nonzero(br, blk, by, bx, k)
                k += 1
            state["eobrun"] -= 1

    unit = 0
    seg_idx = 0
    br = None
    preds = [0] * len(comps)
    state = {"eobrun": 0}
    while unit < units_total:
        if unit % per_segment == 0:
            if seg_idx >= len(segments):
                raise JpegError("missing restart segment")
            br = _BitReader(segments[seg_idx])
            seg_idx += 1
            preds = [0] * len(comps)
            state["eobrun"] = 0
        if interleaved:
            my, mx = divmod(unit, mcux)
            for ci in sel:
                hs, vs = geom[ci][0], geom[ci][1]
                blk = coefs[ci]
                for by in range(vs):
                    for bx in range(hs):
                        yy, xx = my * vs + by, mx * hs + bx
                        if not progressive:
                            decode_baseline_block(br, blk, yy, xx, ci,
                                                  preds)
                        elif dc_refine:
                            if br.read_bit():
                                blk[yy, xx, 0] = int(blk[yy, xx, 0]) | p1
                        else:  # DC first
                            s = br.read_symbol(dc_tabs[ci])
                            if s > 11:
                                raise JpegError("bad DC category")
                            preds[ci] += _extend(br.read_bits(s), s)
                            blk[yy, xx, 0] = preds[ci] << al
        else:
            ci = sel[0]
            blk = coefs[ci]
            yy, xx = divmod(unit, nbw)
            if not progressive:
                decode_baseline_block(br, blk, yy, xx, ci, preds)
            elif ac_first:
                decode_ac_first_block(br, blk, yy, xx, ci, state)
            elif ac_refine:
                decode_ac_refine_block(br, blk, yy, xx, ci, state)
            elif dc_refine:
                if br.read_bit():
                    blk[yy, xx, 0] = int(blk[yy, xx, 0]) | p1
            else:  # DC first, single component
                s = br.read_symbol(dc_tabs[ci])
                if s > 11:
                    raise JpegError("bad DC category")
                preds[ci] += _extend(br.read_bits(s), s)
                blk[yy, xx, 0] = preds[ci] << al
        unit += 1


def decode_jpeg(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """raw JPEG bytes -> (width, height, channels, pixels[h, w, c] uint8).

    Baseline (SOF0/1) and progressive (SOF2: spectral selection +
    successive approximation, ITU T.81 G.1.2) both decode through the
    same per-component coefficient store; every scan accumulates into
    it and reconstruction (dequant + batched IDCT + upsample + color
    convert) runs once at EOI. 3-component images convert JFIF
    YCbCr -> RGB; 1-component images return grayscale."""
    if len(raw) < 4 or raw[0] != 0xFF or raw[1] != 0xD8:
        raise JpegError("bad SOI")
    qt: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], _Huff] = {}  # (class, id) -> table
    frame = None  # (h, w, comps) where comps = [(id, hs, vs, tq)]
    progressive = False
    restart_interval = 0
    coefs = None  # per component: int32 [blocks_y, blocks_x, 64] zigzag
    geom = None
    n_scans = 0
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
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 prog
            if frame is not None:
                raise JpegError("multiple SOF")
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
            progressive = marker == 0xC2
            geom = _frame_geometry(frame)
            coefs = [np.zeros((g[3], g[2], 64), dtype=np.int64)
                     for g in geom]
        elif marker in (0xC3, 0xC5, 0xC6, 0xC7,
                        0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("only baseline/progressive DCT supported")
        elif marker == 0xDD:  # DRI
            if len(seg) < 2:
                raise JpegError("short DRI")
            (restart_interval,) = struct.unpack(">H", seg[:2])
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise JpegError("SOS before SOF")
            n_scans += 1
            if n_scans > 64:  # hostile-input scan-count bound
                raise JpegError("too many scans")
            ns = seg[0]
            if len(seg) < 1 + 2 * ns + 3:
                raise JpegError("short SOS")
            tables = {}
            order = []
            for c in range(ns):
                cs = seg[1 + 2 * c]
                td_ta = seg[2 + 2 * c]
                tables[cs] = (td_ta >> 4, td_ta & 15)
                order.append(cs)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah_al = seg[3 + 2 * ns]
            ah, al = ah_al >> 4, ah_al & 15
            if not progressive:
                ss, se, ah, al = 0, 63, 0, 0
            segments, pos = _split_entropy(raw, pos)
            _decode_scan(frame, geom, coefs, huff, order, tables,
                         segments, restart_interval, progressive,
                         ss, se, ah, al)
            if not progressive:
                break  # single-scan baseline
        # else: APPn/COM/unknown — skipped via seglen
    if frame is None or n_scans == 0:
        raise JpegError("missing SOF/SOS")
    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)

    out = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        if tq not in qt:
            raise JpegError("missing quant table")
        q = qt[tq]
        cf = coefs[ci].reshape(-1, 64).astype(np.float64)
        raster = np.zeros_like(cf)
        raster[:, ZIGZAG] = cf * q[None, :]
        spatial = np.einsum(
            "ij,bjk,kl->bil", _A.T, raster.reshape(-1, 8, 8), _A)
        nbh, nbw = coefs[ci].shape[0], coefs[ci].shape[1]
        plane = (spatial.reshape(nbh, nbw, 8, 8)
                 .transpose(0, 2, 1, 3).reshape(nbh * 8, nbw * 8))
        p = plane + 128.0
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


def _quantize_components(pixels: np.ndarray, quant: int,
                         subsample: bool):
    """Shared encoder front half: color convert, (optionally)
    subsample, pad, FDCT, quantize. Returns (h, w, c, samp,
    [per-comp zigzag coef arrays [by_pad, bx_pad, 64] int64],
    [per-comp true block grid (nbw, nbh)], qtab)."""
    arr = np.asarray(pixels, dtype=np.float64)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in (1, 3):
        raise ValueError("supports 1 or 3 channels")
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
    samp = [(2, 2), (1, 1), (1, 1)] if subsample else [(1, 1)] * c
    hmax = max(s[0] for s in samp[:c])
    vmax = max(s[1] for s in samp[:c])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    inv_zz = np.empty(64, dtype=np.int64)
    inv_zz[ZIGZAG] = np.arange(64)
    coefs = []
    grids = []
    for ci in range(c):
        hs, vs = samp[ci]
        ph, pw = mcuy * vs * 8, mcux * hs * 8
        ch = chans[ci]
        if (hs, vs) != (hmax, vmax):
            fy, fx = vmax // vs, hmax // hs
            padded = np.empty((math.ceil(h / fy) * fy,
                               math.ceil(w / fx) * fx))
            padded[:h, :w] = ch
            padded[h:, :w] = ch[h - 1:h, :]
            padded[:, w:] = padded[:, w - 1:w]
            ch = padded.reshape(padded.shape[0] // fy, fy,
                                padded.shape[1] // fx, fx).mean(axis=(1, 3))
        plane = np.empty((ph, pw))
        ch_h, ch_w = ch.shape
        plane[:ch_h, :ch_w] = ch
        plane[ch_h:, :ch_w] = ch[ch_h - 1:ch_h, :]
        plane[:, ch_w:] = plane[:, ch_w - 1:ch_w]
        plane = plane - 128.0
        nbh, nbw = ph // 8, pw // 8
        # per-block matmul with the exact op order of encode_jpeg's
        # inner loop: a batched einsum differs in the last ulp, which
        # flips np.round on knife-edge coefficients — the progressive
        # and baseline encoders must quantize bit-identically for the
        # decode(progressive) == decode(baseline) differential to hold
        cz = np.empty((nbh, nbw, 64), dtype=np.int64)
        for by in range(nbh):
            for bx in range(nbw):
                block = plane[by * 8:by * 8 + 8, bx * 8:bx * 8 + 8]
                coef = a @ block @ a.T
                q = np.round(coef.reshape(64) / qtab[inv_zz])
                cz[by, bx] = q[ZIGZAG].astype(np.int64)
        coefs.append(cz)
        grids.append((-(-ch_w // 8), -(-ch_h // 8)))
    return h, w, c, samp, coefs, grids, qtab


def _prog_ac_table():
    """AC table for progressive scans: every (run<<4)|size symbol for
    size 0..10 — includes the EOBn codes (size 0, run < 15) baseline
    never uses. 176 nine-bit codes, Kraft-valid by construction."""
    syms = bytearray()
    for r in range(16):
        for s in range(0, 11):
            syms.append((r << 4) | s)
    counts = [0] * 16
    counts[8] = len(syms)
    codes = {sym: (9, i) for i, sym in enumerate(syms)}
    return counts, bytes(syms), codes


def encode_jpeg_progressive(pixels: np.ndarray, quant: int = 1,
                            subsample: bool = False,
                            dc_al: int = 1, ac_al: int = 1,
                            bands: Tuple = ((1, 5), (6, 63))) -> bytes:
    """Progressive (SOF2) encoder — the independent fixtures/tests
    direction for the decoder's T.81 G.1.2 scan kinds. Emits: one
    interleaved DC-first scan at Al=dc_al, DC-refine bit-plane scans
    down to Al=0, then per component and per spectral band an AC-first
    scan at Al=ac_al followed by AC-refine scans down to Al=0 (the
    jcphuff correction-bit discipline: buffered bits ride the EOB
    run). With successive approximation completing at Al=0 the
    coefficients are bit-identical to the baseline encoder's, so
    decode(progressive) must equal decode(baseline) EXACTLY."""
    h, w, c, samp, coefs, grids, qtab = _quantize_components(
        pixels, quant, subsample)
    hmax = max(s[0] for s in samp[:c])
    vmax = max(s[1] for s in samp[:c])
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    (dc_counts, dc_syms, dc_codes, *_rest) = _enc_tables()
    ac_counts, ac_syms, ac_codes = _prog_ac_table()

    def marker(m: int, payload: bytes) -> bytes:
        return struct.pack(">BBH", 0xFF, m, len(payload) + 2) + payload

    out = bytearray(b"\xff\xd8")
    out += marker(0xDB, bytes([0x00])
                  + bytes(int(qtab[i]) for i in range(64)))
    sof = struct.pack(">BHHB", 8, h, w, c)
    for ci in range(c):
        hs, vs = samp[ci]
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out += marker(0xC2, sof)
    out += marker(0xC4, bytes([0x00]) + bytes(dc_counts) + dc_syms)
    out += marker(0xC4, bytes([0x10]) + bytes(ac_counts) + ac_syms)

    def sos(comps_ids, ss, se, ah, al, body):
        hdr = bytes([len(comps_ids)]) + b"".join(
            bytes([cid, 0x00]) for cid in comps_ids) + bytes([ss, se,
                                                             (ah << 4) | al])
        return marker(0xDA, hdr) + body

    def mcu_blocks():
        for my in range(mcuy):
            for mx in range(mcux):
                for ci in range(c):
                    hs, vs = samp[ci]
                    for by in range(vs):
                        for bx in range(hs):
                            yield ci, my * vs + by, mx * hs + bx

    # ---- DC first scan (interleaved, point transform dc_al) ----
    bw = _BitWriter()
    preds = [0] * c
    for ci, yy, xx in mcu_blocks():
        v = int(coefs[ci][yy, xx, 0]) >> dc_al
        diff = v - preds[ci]
        preds[ci] = v
        s = _category(diff)
        length, code = dc_codes[s]
        bw.write(code, length)
        if s:
            bw.write(diff if diff >= 0 else diff + (1 << s) - 1, s)
    out += sos(list(range(1, c + 1)), 0, 0, 0, dc_al, bw.flush())

    # ---- DC refine scans: one bit plane per scan ----
    for al in range(dc_al - 1, -1, -1):
        bw = _BitWriter()
        for ci, yy, xx in mcu_blocks():
            bw.write((int(coefs[ci][yy, xx, 0]) >> al) & 1, 1)
        out += sos(list(range(1, c + 1)), 0, 0, al + 1, al, bw.flush())

    # ---- AC scans: per component, per band ----
    for ci in range(c):
        nbw, nbh = grids[ci]

        def blocks():
            for yy in range(nbh):
                for xx in range(nbw):
                    yield coefs[ci][yy, xx]

        for (ss, se) in bands:
            # first scan at Al=ac_al
            bw = _BitWriter()
            eobrun = 0

            def flush_eob():
                nonlocal eobrun
                if eobrun:
                    r = eobrun.bit_length() - 1
                    length, code = ac_codes[r << 4]
                    bw.write(code, length)
                    if r:
                        bw.write(eobrun - (1 << r), r)
                    eobrun = 0

            for blk in blocks():
                tvs = [(int(v) >> ac_al if v >= 0
                        else -((-int(v)) >> ac_al))
                       for v in blk[ss:se + 1]]
                last = -1
                for i, tv in enumerate(tvs):
                    if tv:
                        last = i
                if last < 0:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
                    continue
                flush_eob()
                run = 0
                for i in range(last + 1):
                    tv = tvs[i]
                    if tv == 0:
                        run += 1
                        continue
                    while run > 15:
                        length, code = ac_codes[0xF0]
                        bw.write(code, length)
                        run -= 16
                    s = _category(tv)
                    length, code = ac_codes[(run << 4) | s]
                    bw.write(code, length)
                    bw.write(tv if tv >= 0 else tv + (1 << s) - 1, s)
                    run = 0
                if last < se - ss:
                    eobrun += 1
                    if eobrun == 0x7FFF:
                        flush_eob()
            flush_eob()
            out += sos([ci + 1], ss, se, 0, ac_al, bw.flush())

        for (ss, se) in bands:
            # refine scans down to Al=0 (jcphuff encode_mcu_AC_refine)
            for al in range(ac_al - 1, -1, -1):
                bw = _BitWriter()
                eobrun = 0
                pend: List[int] = []  # correction bits riding the EOB run

                def flush_eob_br():
                    nonlocal eobrun
                    if eobrun:
                        r = eobrun.bit_length() - 1
                        length, code = ac_codes[r << 4]
                        bw.write(code, length)
                        if r:
                            bw.write(eobrun - (1 << r), r)
                        eobrun = 0
                    for bit in pend:
                        bw.write(bit, 1)
                    pend.clear()

                for blk in blocks():
                    vals = [int(v) for v in blk[ss:se + 1]]
                    t = [abs(v) >> al for v in vals]
                    eob = -1
                    for i, tv in enumerate(t):
                        if tv == 1:
                            eob = i
                    run = 0
                    loc: List[int] = []
                    emitted = False
                    for i, tv in enumerate(t):
                        if tv == 0:
                            run += 1
                            continue
                        while run > 15 and i <= eob:
                            flush_eob_br()
                            length, code = ac_codes[0xF0]
                            bw.write(code, length)
                            run -= 16
                            for bit in loc:
                                bw.write(bit, 1)
                            loc = []
                            emitted = True
                        if tv > 1:
                            loc.append(tv & 1)
                            continue
                        # newly significant (tv == 1)
                        flush_eob_br()
                        length, code = ac_codes[(run << 4) | 1]
                        bw.write(code, length)
                        bw.write(1 if vals[i] >= 0 else 0, 1)
                        for bit in loc:
                            bw.write(bit, 1)
                        loc = []
                        run = 0
                        emitted = True
                    if run > 0 or loc:
                        eobrun += 1
                        pend.extend(loc)
                        if eobrun == 0x7FFF or len(pend) > 900:
                            flush_eob_br()
                    elif not emitted:
                        # band all-zero at this bit plane with no
                        # correction bits: pure EOB-run member
                        eobrun += 1
                        if eobrun == 0x7FFF:
                            flush_eob_br()
                flush_eob_br()
                out += sos([ci + 1], ss, se, al + 1, al, bw.flush())

    out += b"\xff\xd9"
    return bytes(out)
