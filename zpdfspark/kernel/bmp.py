"""Minimal pure-Python BMP decoder for the multimodal image path.

Same posture as kernel/png.py: BMP (BITMAPINFOHEADER) is a
deterministic row layout, so decode is REAL — 8-bit palette and
24-bit BGR, bottom-up and top-down, 4-byte row padding, and RLE8
(BI_RLE8) runs including the delta escape. Exotic variants (1/4-bit,
bitfields, OS/2 headers, embedded PNG/JPEG) raise BmpError — callers
treat a failed decode as data, never as a task failure.
"""

from __future__ import annotations

import struct

import numpy as np

MAX_PIXEL_BYTES = 64 * 1024 * 1024  # decoded-size DoS cap (Z12 spirit)


class BmpError(Exception):
    pass


def _decode_rle8(data: bytes, w: int, h: int) -> np.ndarray:
    """BI_RLE8 -> (h, w) uint8 index array (top-down row order).
    Escapes: 0,0 end-of-line; 0,1 end-of-bitmap; 0,2 dx,dy delta;
    0,n>=3 absolute run (word-aligned)."""
    out = np.zeros((h, w), dtype=np.uint8)
    row = col = 0  # row counted from the BOTTOM (BMP storage order)
    pos = 0
    n = len(data)
    while pos + 1 < n:
        cnt, val = data[pos], data[pos + 1]
        pos += 2
        if cnt > 0:  # encoded run
            if row >= h or col + cnt > w:
                raise BmpError("RLE8 run out of bounds")
            out[h - 1 - row, col:col + cnt] = val
            col += cnt
            continue
        if val == 0:  # end of line
            row += 1
            col = 0
            continue
        if val == 1:  # end of bitmap
            return out
        if val == 2:  # delta
            if pos + 2 > n:
                raise BmpError("RLE8 delta truncated")
            col += data[pos]
            row += data[pos + 1]
            pos += 2
            if col > w or row > h:
                raise BmpError("RLE8 delta out of bounds")
            continue
        # absolute mode: val literal bytes, padded to word boundary
        if pos + val > n or row >= h or col + val > w:
            raise BmpError("RLE8 absolute run out of bounds")
        out[h - 1 - row, col:col + val] = np.frombuffer(
            data[pos:pos + val], dtype=np.uint8)
        col += val
        pos += val + (val & 1)
    raise BmpError("RLE8 stream missing end-of-bitmap")


def decode_bmp(raw: bytes):
    """BMP bytes -> (width, height, 3, pixels ndarray RGB uint8)."""
    if len(raw) < 54 or raw[:2] != b"BM":
        raise BmpError("bad BM header")
    (data_off,) = struct.unpack("<I", raw[10:14])
    (hdr_size, w, h_signed, planes, bits, comp) = struct.unpack(
        "<IiihHI", raw[14:34])
    if hdr_size < 40:
        raise BmpError(f"unsupported header size {hdr_size}")
    top_down = h_signed < 0
    h = abs(h_signed)
    if w <= 0 or h == 0:
        raise BmpError("bad dimensions")
    if w * h * 3 > MAX_PIXEL_BYTES:
        raise BmpError("image too large")
    if bits == 24 and comp == 0:
        row_bytes = (w * 3 + 3) & ~3
        need = data_off + row_bytes * h
        if need > len(raw):
            raise BmpError("pixel data truncated")
        rows = np.frombuffer(raw[data_off:need], dtype=np.uint8).reshape(
            h, row_bytes)[:, :w * 3].reshape(h, w, 3)
        bgr = rows if top_down else rows[::-1]
        return w, h, 3, bgr[:, :, ::-1].copy()  # BGR -> RGB
    if bits == 8 and comp in (0, 1):
        (colors_used,) = struct.unpack("<I", raw[46:50])
        n_colors = colors_used or 256
        pal_off = 14 + hdr_size
        pal_end = pal_off + 4 * n_colors
        if pal_end > len(raw):
            raise BmpError("palette truncated")
        pal = np.frombuffer(raw[pal_off:pal_end], dtype=np.uint8).reshape(
            n_colors, 4)[:, :3][:, ::-1]  # BGRX -> RGB
        if n_colors < 256:
            pal = np.vstack([pal, np.zeros((256 - n_colors, 3), np.uint8)])
        if comp == 1:  # RLE8
            if top_down:
                raise BmpError("top-down RLE8 is invalid")
            idx = _decode_rle8(raw[data_off:], w, h)
        else:
            row_bytes = (w + 3) & ~3
            need = data_off + row_bytes * h
            if need > len(raw):
                raise BmpError("pixel data truncated")
            idx = np.frombuffer(raw[data_off:need], dtype=np.uint8).reshape(
                h, row_bytes)[:, :w]
            if not top_down:
                idx = idx[::-1]
        return w, h, 3, pal[idx].copy()
    raise BmpError(f"unsupported BMP variant: {bits}-bit compression {comp}")


def encode_bmp(pixels: np.ndarray, bits: int = 24, rle: bool = False,
               top_down: bool = False) -> bytes:
    """Test-side encoder (the independent direction against
    decode_bmp). 24-bit takes (h, w, 3) RGB; 8-bit takes (h, w)
    indices with an identity grayscale palette; rle selects BI_RLE8
    (naive run coding, bottom-up only)."""
    if bits == 24:
        h, w, _ = pixels.shape
        row_bytes = (w * 3 + 3) & ~3
        body = bytearray()
        rows = pixels if top_down else pixels[::-1]
        for r in rows:
            line = r[:, ::-1].tobytes()  # RGB -> BGR
            body += line + b"\x00" * (row_bytes - len(line))
        pal = b""
        comp = 0
    else:
        h, w = pixels.shape
        pal = b"".join(bytes([i, i, i, 0]) for i in range(256))
        comp = 1 if rle else 0
        body = bytearray()
        rows = pixels if top_down else pixels[::-1]
        if rle:
            if top_down:
                raise BmpError("top-down RLE8 is invalid")
            for r in rows:
                i = 0
                while i < w:
                    j = i
                    while j + 1 < w and r[j + 1] == r[i] and j - i < 254:
                        j += 1
                    body += bytes([j - i + 1, int(r[i])])
                    i = j + 1
                body += b"\x00\x00"  # end of line
            body += b"\x00\x01"  # end of bitmap
        else:
            row_bytes = (w + 3) & ~3
            for r in rows:
                body += r.tobytes() + b"\x00" * (row_bytes - w)
    data_off = 14 + 40 + len(pal)
    info = struct.pack("<IiihHIIiiII", 40, w, -h if top_down else h, 1,
                       bits, comp, len(body), 2835, 2835,
                       256 if bits == 8 else 0, 0)
    head = b"BM" + struct.pack("<IHHI", data_off + len(body), 0, 0,
                               data_off)
    return head + info + pal + bytes(body)
