"""Minimal pure-Python PNG decoder for the multimodal decode kernel.

The sandbox has no codec libraries (PIL/ffmpeg), but PNG is just
zlib + per-row prediction filters — both of which this engine already
implements for PDF streams (kernel/filters.py PNG predictors 10-15 are
the SAME None/Sub/Up/Average/Paeth row filters, decompress.zig:257-350).
So the image-decode step of the media pipeline is REAL for PNG:
signature + chunk walk, IHDR, concatenated IDAT -> capped zlib
inflate -> row unfiltering -> numpy pixel array. JPEG/video remain
honestly stubbed (media.py).

Supported: the spec's full legal depth matrix (round 5 — found by
driving the decoder over the REAL PNGs shipped in the OS image, where
a bit-depth-2 palette favicon failed): depths 1/2/4/8/16 for gray,
1/2/4/8 for palette, 8/16 for RGB/gray+alpha/RGBA; color types 0
(gray), 2 (RGB), 3 (palette, expanded to RGB), 4 (gray+alpha), 6
(RGBA); interlace 0 and 1 (Adam7 — round 4: real crawls carry
interlaced PNGs; each of the 7 passes is an independently filtered
sub-image scattered back on the pass grid). Sub-byte rows unpack
MSB-first per spec §7.2 with gray upscaled to 8-bit by the exact
(255/(2^d-1)) factor; 16-bit samples keep the high byte (the 8-bit
projection). Anything else raises PngError — callers treat a failed
decode as data, never as a task failure (the same permissive contract
as the PDF kernel).
"""

from __future__ import annotations

import struct
import zlib
from typing import Tuple

import numpy as np

from .filters import apply_predictor

SIGNATURE = b"\x89PNG\r\n\x1a\n"
MAX_PIXEL_BYTES = 64 * 1024 * 1024  # decoded-size DoS cap (Z12 spirit)

_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}

# legal bit depths per color type (PNG spec §11.2.2, table 11.1)
_DEPTHS = {0: (1, 2, 4, 8, 16), 2: (8, 16), 3: (1, 2, 4, 8),
           4: (8, 16), 6: (8, 16)}


def _row_bytes(width: int, channels: int, depth: int) -> int:
    return (width * channels * depth + 7) // 8


def _rows_to_pixels(buf: bytes, w: int, h: int, channels: int,
                    depth: int, palette_mode: bool) -> np.ndarray:
    """Unfiltered scanline bytes -> (h, w, channels) uint8 pixels.
    Sub-byte samples unpack MSB-first (spec §7.2); gray upscales by the
    exact 255/(2^d-1) factor; 16-bit keeps the high (first) byte."""
    rb = _row_bytes(w, channels, depth)
    arr = np.frombuffer(buf, dtype=np.uint8).reshape(h, rb)
    if depth == 8:
        return arr.reshape(h, w, channels)
    if depth == 16:
        return arr.reshape(h, w, channels, 2)[..., 0]
    bits = np.unpackbits(arr, axis=1)[:, : w * depth]
    weights = (1 << np.arange(depth - 1, -1, -1)).astype(np.uint16)
    v = (bits.reshape(h, w, depth) * weights).sum(axis=2)
    if not palette_mode:
        v = v * (255 // ((1 << depth) - 1))
    return v.astype(np.uint8)[:, :, None]

# Adam7 pass grid (PNG spec §8.2): (x_start, y_start, x_step, y_step)
_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _adam7_passes(width: int, height: int):
    """Non-empty Adam7 passes as (x0, y0, dx, dy, pass_w, pass_h); a
    pass with no pixels contributes no scanlines at all."""
    out = []
    for x0, y0, dx, dy in _ADAM7:
        pw = (width - x0 + dx - 1) // dx
        ph = (height - y0 + dy - 1) // dy
        if pw > 0 and ph > 0:
            out.append((x0, y0, dx, dy, pw, ph))
    return out


class PngError(Exception):
    pass


def decode_png(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """raw PNG bytes -> (width, height, channels, pixels[h, w, c] uint8).

    Palette images are expanded to RGB (3 channels)."""
    if not raw.startswith(SIGNATURE):
        raise PngError("bad signature")
    pos = len(SIGNATURE)
    width = height = None
    bit_depth = color_type = interlace = None
    palette = None
    idat = bytearray()
    seen_iend = False
    while pos + 8 <= len(raw) and not seen_iend:
        length, ctype = struct.unpack(">I4s", raw[pos:pos + 8])
        if length > len(raw):  # corrupt length: bail before huge slices
            raise PngError("chunk length exceeds file")
        data = raw[pos + 8: pos + 8 + length]
        if len(data) < length:
            raise PngError("truncated chunk")
        pos += 8 + length + 4  # skip CRC (tolerated like the PDF kernel
        # tolerates damaged xref checksums: content errors surface as
        # decode failures, not as strict CRC validation)
        if ctype == b"IHDR":
            if length != 13:
                raise PngError("bad IHDR")
            (width, height, bit_depth, color_type,
             _comp, _filt, interlace) = struct.unpack(">IIBBBBB", data)
        elif ctype == b"PLTE":
            if length % 3:
                raise PngError("bad PLTE")
            palette = np.frombuffer(data, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            seen_iend = True
    if width is None:
        raise PngError("missing IHDR")
    if color_type not in _CHANNELS:
        raise PngError(f"unsupported color type {color_type}")
    if bit_depth not in _DEPTHS[color_type]:
        raise PngError(
            f"illegal bit depth {bit_depth} for color type {color_type}")
    if interlace not in (0, 1):
        raise PngError(f"unknown interlace method {interlace}")
    if width == 0 or height == 0:
        raise PngError("zero dimension")
    channels = _CHANNELS[color_type]
    if width * height * channels > MAX_PIXEL_BYTES:
        raise PngError("image too large")
    if not idat:
        raise PngError("missing IDAT")
    if interlace:
        passes = _adam7_passes(width, height)
        expected = sum(
            ph * (_row_bytes(pw, channels, bit_depth) + 1)
            for _, _, _, _, pw, ph in passes)
    else:
        expected = height * (_row_bytes(width, channels, bit_depth) + 1)
    # Bounded inflate (mirrors filters.py's incremental flate cap): never
    # allocate more than the IHDR-declared scanline bytes, so a tiny-IHDR
    # high-ratio IDAT bomb cannot OOM an executor before the size check.
    try:
        inflater = zlib.decompressobj()
        decompressed = inflater.decompress(bytes(idat), expected)
        # A valid stream's trailer may sit in unconsumed_tail after the
        # cap is hit; only *output* bytes beyond `expected` are overshoot,
        # so probe with a 1-byte output limit (bounded, cannot OOM).
        overshoot = b""
        if not inflater.eof:
            overshoot = inflater.decompress(inflater.unconsumed_tail, 1)
    except zlib.error as e:
        raise PngError(f"IDAT inflate failed: {e}")
    if len(decompressed) < expected:
        raise PngError("IDAT short")
    if overshoot:
        # Over-long streams are corrupt/bomb data, not a truncatable
        # prefix — reject rather than report decode_ok on partial bytes.
        raise PngError("IDAT longer than declared dimensions")
    # per-row filter bytes: exactly the PDF PNG predictor layout — reuse
    # it (predictor=15 means "per-row filter byte chooses the filter")
    try:
        palette_mode = color_type == 3
        if interlace:
            # each Adam7 pass is an independently filtered sub-image
            # (filters reference the previous row OF THE SAME PASS);
            # unfilter each, then scatter back onto the pass grid
            pixels = np.zeros((height, width, channels), dtype=np.uint8)
            off = 0
            for x0, y0, dx, dy, pw, ph in passes:
                seg_len = ph * (_row_bytes(pw, channels, bit_depth) + 1)
                sub = _rows_to_pixels(
                    apply_predictor(
                        decompressed[off:off + seg_len], 15, pw,
                        channels, bit_depth),
                    pw, ph, channels, bit_depth, palette_mode)
                pixels[y0::dy, x0::dx] = sub
                off += seg_len
        else:
            unfiltered = apply_predictor(
                decompressed[:expected], 15, width, channels, bit_depth)
            pixels = _rows_to_pixels(unfiltered, width, height, channels,
                                     bit_depth, palette_mode)
    except PngError:
        raise
    except Exception as e:
        raise PngError(f"unfilter failed: {e}")
    if color_type == 3:
        if palette is None:
            raise PngError("palette image without PLTE")
        idx = pixels[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise PngError("palette index out of range")
        pixels = palette[idx]
        channels = 3
    return width, height, channels, pixels


def resize_nearest(pixels: np.ndarray, out_w: int, out_h: int) -> np.ndarray:
    """Nearest-neighbor resize (the classic sample-grid index map) —
    pure numpy, deterministic."""
    h, w = pixels.shape[0], pixels.shape[1]
    ys = (np.arange(out_h) * h) // out_h
    xs = (np.arange(out_w) * w) // out_w
    return pixels[ys][:, xs]


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal encoder (filter type 0 rows; optional Adam7 pass order)
    for fixtures/tests — the independent direction against decode_png's
    differential tests (pass extraction here is plain slicing on the
    spec grid, NOT the decoder's scatter loop)."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0,
                       1 if interlace else 0)
    if interlace:
        scanlines = b"".join(
            b"\x00" + row.tobytes()
            for x0, y0, dx, dy, _, _ in _adam7_passes(w, h)
            for row in arr[y0::dy, x0::dx])
    else:
        scanlines = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))
    idat = zlib.compress(scanlines)

    def chunk(ctype: bytes, data: bytes) -> bytes:
        return (struct.pack(">I", len(data)) + ctype + data
                + struct.pack(">I", zlib.crc32(ctype + data) & 0xFFFFFFFF))

    return (SIGNATURE + chunk(b"IHDR", ihdr) + chunk(b"IDAT", idat)
            + chunk(b"IEND", b""))
