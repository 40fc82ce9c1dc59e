"""Minimal WebP header parser for the multimodal kernel.

Header walk only: RIFF container + the first image chunk's dimension
fields for all three WebP flavors — 'VP8 ' (lossy: frame tag + start
code + 14-bit dims), 'VP8L' (lossless: signature byte + packed 14-bit
dims), 'VP8X' (extended: 24-bit canvas dims). No pixel decode (the
VP8 codec is absent from this container — same honest boundary as
mp4/mp3: metadata real, decode stubbed).

Contract mirrors kernel/mp4.py: malformed input raises WebpError.
"""

from __future__ import annotations

import struct
from typing import Tuple


class WebpError(Exception):
    pass


def webp_dims(raw: bytes) -> Tuple[int, int, str]:
    """raw WebP bytes -> (width, height, flavor) where flavor is one of
    'vp8', 'vp8l', 'vp8x'."""
    if len(raw) < 20 or raw[:4] != b"RIFF" or raw[8:12] != b"WEBP":
        raise WebpError("not a WebP file")
    # the RIFF size field is not trusted: per-chunk length guards below
    # bound every read, so truncated/overstated sizes fail cleanly
    fourcc = raw[12:16]
    (chunk_size,) = struct.unpack("<I", raw[16:20])
    body = raw[20 : 20 + chunk_size]
    if fourcc == b"VP8 ":
        # frame tag (3 bytes) must mark a key frame; then the start
        # code 9d 01 2a and 14-bit width/height (little-endian)
        if len(body) < 10:
            raise WebpError("truncated VP8 chunk")
        if body[3:6] != b"\x9d\x01\x2a":
            raise WebpError("missing VP8 start code")
        w = struct.unpack("<H", body[6:8])[0] & 0x3FFF
        h = struct.unpack("<H", body[8:10])[0] & 0x3FFF
        flavor = "vp8"
    elif fourcc == b"VP8L":
        if len(body) < 5 or body[0] != 0x2F:
            raise WebpError("bad VP8L signature")
        bits = struct.unpack("<I", body[1:5])[0]
        w = (bits & 0x3FFF) + 1
        h = ((bits >> 14) & 0x3FFF) + 1
        flavor = "vp8l"
    elif fourcc == b"VP8X":
        if len(body) < 10:
            raise WebpError("truncated VP8X chunk")
        w = 1 + (body[4] | (body[5] << 8) | (body[6] << 16))
        h = 1 + (body[7] | (body[8] << 8) | (body[9] << 16))
        flavor = "vp8x"
    else:
        raise WebpError(f"unknown WebP chunk {fourcc!r}")
    if w == 0 or h == 0:
        raise WebpError("zero dimension")
    return w, h, flavor


def encode_webp_header(w: int, h: int, flavor: str = "vp8l",
                      filler: int = 24) -> bytes:
    """Minimal well-formed WebP header for fixtures/tests (the
    independent direction against webp_dims); the image payload is
    deterministic filler since pixel decode is honestly stubbed."""
    pad = bytes((i * 37 + w + h) % 251 for i in range(filler))
    if flavor == "vp8":
        body = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
                + struct.pack("<HH", w & 0x3FFF, h & 0x3FFF) + pad)
        fourcc = b"VP8 "
    elif flavor == "vp8l":
        bits = ((w - 1) & 0x3FFF) | (((h - 1) & 0x3FFF) << 14)
        body = b"\x2f" + struct.pack("<I", bits) + pad
        fourcc = b"VP8L"
    elif flavor == "vp8x":
        wm1, hm1 = w - 1, h - 1
        body = (b"\x00\x00\x00\x00"
                + bytes((wm1 & 0xFF, (wm1 >> 8) & 0xFF, (wm1 >> 16) & 0xFF))
                + bytes((hm1 & 0xFF, (hm1 >> 8) & 0xFF, (hm1 >> 16) & 0xFF))
                + pad)
        fourcc = b"VP8X"
    else:
        raise WebpError(f"unknown flavor {flavor!r}")
    chunk = fourcc + struct.pack("<I", len(body)) + body
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" + chunk
