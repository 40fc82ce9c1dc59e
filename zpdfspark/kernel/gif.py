"""Minimal pure-Python GIF decoder + encoder for the multimodal kernel.

GIF is palette + LZW. The engine already implements PDF LZW
(filters.py, decompress.zig:420-520), but GIF's variant is a different
wire format — LSB-first bit packing, per-image minimum code size,
explicit CLEAR/END codes, late code-width growth, 4096-entry table
with deferred clear — so the decoder here is self-contained rather
than a retrofit of the MSB-first PDF path.

Scope (mirrors kernel/png.py's contract): GIF87a/GIF89a, global and
local color tables, interlaced and non-interlaced, extension blocks
skipped, FIRST image frame only (animation frames beyond the first are
ignored, like a thumbnailer). Anything malformed raises GifError —
callers treat a failed decode as data, never as a task failure.

The encoder is the fixtures/tests direction: literal-code LZW (every
pixel index emitted as its own code with exact width/CLEAR tracking —
a compliant stream any GIF decoder accepts), palette from unique
colors, optional interlaced row order.
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

MAX_PIXEL_BYTES = 64 * 1024 * 1024  # decoded-size DoS cap (Z12 spirit)
_MAX_TABLE = 4096


class GifError(Exception):
    pass


def _read_subblocks(raw: bytes, pos: int) -> Tuple[bytes, int]:
    out = bytearray()
    n = len(raw)
    while True:
        if pos >= n:
            raise GifError("truncated sub-blocks")
        size = raw[pos]
        pos += 1
        if size == 0:
            return bytes(out), pos
        if pos + size > n:
            raise GifError("truncated sub-block data")
        out += raw[pos : pos + size]
        pos += size


def _skip_subblocks(raw: bytes, pos: int) -> int:
    n = len(raw)
    while True:
        if pos >= n:
            raise GifError("truncated extension")
        size = raw[pos]
        pos += 1
        if size == 0:
            return pos
        pos += size


def _interlace_order(h: int) -> list:
    """GIF interlace pass rows: file row i carries display row order[i]."""
    return ([r for r in range(0, h, 8)] + [r for r in range(4, h, 8)]
            + [r for r in range(2, h, 4)] + [r for r in range(1, h, 2)])


def _lzw_decode(data: bytes, min_code: int, max_out: int) -> bytes:
    """GIF-variant LZW: LSB-first codes, width min_code+1..12, CLEAR
    resets the table, END terminates; the table stops growing at 4096
    entries until the next CLEAR (deferred clear). Output longer than
    max_out is rejected (corrupt/bomb data, same policy as the PNG
    overshoot check)."""
    clear = 1 << min_code
    end = clear + 1
    width = min_code + 1
    added: list = []
    prev = None
    out = bytearray()
    bitbuf = 0
    bitcnt = 0
    pos = 0
    n = len(data)
    while True:
        while bitcnt < width:
            if pos >= n:
                raise GifError("LZW truncated before END")
            bitbuf |= data[pos] << bitcnt
            bitcnt += 8
            pos += 1
        code = bitbuf & ((1 << width) - 1)
        bitbuf >>= width
        bitcnt -= width
        if code == clear:
            added = []
            width = min_code + 1
            prev = None
            continue
        if code == end:
            return bytes(out)
        if prev is None:
            if code >= clear:
                raise GifError("first LZW code is not a literal")
            entry = bytes((code,))
        else:
            next_slot = clear + 2 + len(added)
            if code < clear:
                entry = bytes((code,))
            elif clear + 2 <= code < next_slot:
                entry = added[code - clear - 2]
            elif code == next_slot and next_slot < _MAX_TABLE:
                entry = prev + prev[:1]  # KwKwK
            else:
                raise GifError("LZW code out of range")
            if next_slot < _MAX_TABLE:
                added.append(prev + entry[:1])
                if next_slot + 1 == (1 << width) and width < 12:
                    width += 1
        out += entry
        if len(out) > max_out:
            raise GifError("LZW output exceeds declared dimensions")
        prev = entry


def decode_gif(raw: bytes) -> Tuple[int, int, int, np.ndarray]:
    """raw GIF bytes -> (width, height, 3, pixels[h, w, 3] uint8) for
    the first image frame (palette applied)."""
    if raw[:6] not in (b"GIF87a", b"GIF89a"):
        raise GifError("bad signature")
    if len(raw) < 13:
        raise GifError("truncated header")
    packed = raw[10]
    pos = 13
    gct = None
    if packed & 0x80:
        size = 2 ** ((packed & 7) + 1)
        if pos + 3 * size > len(raw):
            raise GifError("truncated global color table")
        gct = np.frombuffer(raw[pos : pos + 3 * size],
                            dtype=np.uint8).reshape(-1, 3)
        pos += 3 * size
    # block walk to the first image descriptor
    while True:
        if pos >= len(raw):
            raise GifError("no image data before EOF")
        b = raw[pos]
        pos += 1
        if b == 0x2C:  # image descriptor
            break
        if b == 0x3B:  # trailer
            raise GifError("no image data before trailer")
        if b == 0x21:  # extension: label byte + sub-blocks
            if pos >= len(raw):
                raise GifError("truncated extension")
            pos = _skip_subblocks(raw, pos + 1)
            continue
        raise GifError(f"unknown block 0x{b:02x}")
    if pos + 9 > len(raw):
        raise GifError("truncated image descriptor")
    _left, _top, iw, ih = struct.unpack("<HHHH", raw[pos : pos + 8])
    ipacked = raw[pos + 8]
    pos += 9
    palette = gct
    if ipacked & 0x80:
        size = 2 ** ((ipacked & 7) + 1)
        if pos + 3 * size > len(raw):
            raise GifError("truncated local color table")
        palette = np.frombuffer(raw[pos : pos + 3 * size],
                                dtype=np.uint8).reshape(-1, 3)
        pos += 3 * size
    if palette is None:
        raise GifError("image without a color table")
    if iw == 0 or ih == 0:
        raise GifError("zero dimension")
    if iw * ih * 3 > MAX_PIXEL_BYTES:
        raise GifError("image too large")
    if pos >= len(raw):
        raise GifError("missing LZW minimum code size")
    min_code = raw[pos]
    pos += 1
    if not 2 <= min_code <= 8:
        # the minimum code size is the palette bit depth; palettes cap
        # at 256 entries, so anything above 8 cannot index a palette
        raise GifError(f"bad LZW minimum code size {min_code}")
    data, pos = _read_subblocks(raw, pos)
    indices = _lzw_decode(data, min_code, iw * ih)
    if len(indices) < iw * ih:
        raise GifError("LZW short of declared dimensions")
    idx = np.frombuffer(indices, dtype=np.uint8).reshape(ih, iw)
    if ipacked & 0x40:  # interlaced: file rows map to spread rows
        out = np.empty_like(idx)
        out[_interlace_order(ih), :] = idx
        idx = out
    if int(idx.max(initial=0)) >= len(palette):
        raise GifError("palette index out of range")
    return iw, ih, 3, palette[idx]


def encode_gif(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """Minimal encoder (literal-code LZW) for fixtures/tests — the
    independent direction against decode_gif's differential tests.
    Requires [h, w, 3] uint8 input with at most 256 distinct colors."""
    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim != 3 or arr.shape[2] != 3:
        raise GifError("encoder expects [h, w, 3] RGB")
    h, w, _ = arr.shape
    flat = arr.reshape(-1, 3)
    colors, inverse = np.unique(flat, axis=0, return_inverse=True)
    if len(colors) > 256:
        raise GifError("more than 256 colors")
    bits = max(2, int(colors.shape[0] - 1).bit_length())
    pal = np.zeros((1 << bits, 3), dtype=np.uint8)
    pal[: len(colors)] = colors
    idx = inverse.astype(np.uint8).reshape(h, w)
    if interlace:
        idx = idx[_interlace_order(h), :]

    clear = 1 << bits
    end = clear + 1
    codes = []
    width_seq = []  # (code, width at emission time)

    def emit(code, width):
        width_seq.append((code, width))

    width = bits + 1
    next_slot = clear + 2
    first = True
    emit(clear, width)
    for v in idx.reshape(-1).tolist():
        # mirror the decoder's table growth: every code after the first
        # since CLEAR adds one entry; width grows when the next slot
        # reaches 2^width; clear before the table can fill
        if not first and next_slot >= _MAX_TABLE - 1:
            emit(clear, width)
            width = bits + 1
            next_slot = clear + 2
            first = True
        emit(v, width)
        if first:
            first = False
        else:
            next_slot += 1
            if next_slot == (1 << width) and width < 12:
                width += 1
    emit(end, width)

    bitbuf = 0
    bitcnt = 0
    packed = bytearray()
    for code, cw in width_seq:
        bitbuf |= code << bitcnt
        bitcnt += cw
        while bitcnt >= 8:
            packed.append(bitbuf & 0xFF)
            bitbuf >>= 8
            bitcnt -= 8
    if bitcnt:
        packed.append(bitbuf & 0xFF)

    blocks = bytearray()
    for i in range(0, len(packed), 255):
        chunk = packed[i : i + 255]
        blocks.append(len(chunk))
        blocks += chunk
    blocks.append(0)

    lsd_packed = 0x80 | ((bits - 1) << 4) | (bits - 1)
    return (
        b"GIF89a" + struct.pack("<HH", w, h)
        + bytes((lsd_packed, 0, 0)) + pal.tobytes()
        + b"\x2C" + struct.pack("<HHHH", 0, 0, w, h)
        + bytes((0x40 if interlace else 0,))
        + bytes((bits,)) + bytes(blocks) + b"\x3B"
    )
