"""DjVu container census — from scratch.

DjVu is the legacy scanned-book/document format large archive crawls
still hit (archive.org, academic scans). The container is IFF85-style
(the AT&T "AT&TFORM" magic, big-endian chunk lengths, chunks padded
to even offsets): a single-page document is FORM:DJVU whose first
chunk is INFO (width/height big-endian, dpi little-endian — the
format's documented endianness quirk); a multi-page document is
FORM:DJVM whose DIRM chunk carries the component count.

Census-only posture (the PostScript rule): page IMAGE decode is
IW44/JB2 wavelet/arithmetic coding — honestly out of from-scratch
scope; the census (page count, first-page geometry, dpi) is the crawl
signal. Bounded chunk walk, tolerant-open past DjvuError.
"""

from __future__ import annotations

import struct
from typing import Dict

_MAGIC = b"AT&TFORM"
_MAX_CHUNKS = 4096


class DjvuError(Exception):
    pass


def is_djvu(raw: bytes) -> bool:
    return raw[:8] == _MAGIC and raw[12:16] in (b"DJVU", b"DJVM")


def _info_fields(data: bytes):
    if len(data) < 8:
        return None, None, None
    w, h = struct.unpack(">HH", data[0:4])
    dpi = struct.unpack("<H", data[6:8])[0]  # little-endian, per spec
    return w, h, dpi


def parse_djvu(raw: bytes) -> Dict[str, object]:
    """Returns {is_multi, n_pages, width, height, dpi}."""
    if not is_djvu(raw):
        raise DjvuError("not a djvu document")
    form_len = struct.unpack(">I", raw[8:12])[0]
    end = min(len(raw), 12 + form_len)
    kind = raw[12:16]
    is_multi = kind == b"DJVM"
    n_pages = 1 if not is_multi else 0
    width = height = dpi = None
    pos = 16
    chunks = 0
    while pos + 8 <= end and chunks < _MAX_CHUNKS:
        chunks += 1
        cid = raw[pos:pos + 4]
        (clen,) = struct.unpack(">I", raw[pos + 4:pos + 8])
        data = raw[pos + 8:pos + 8 + clen]
        if cid == b"DIRM" and is_multi and len(data) >= 3:
            # flags byte, then big-endian component count
            n_pages = struct.unpack(">H", data[1:3])[0]
        elif cid == b"INFO" and width is None:
            width, height, dpi = _info_fields(data)
        elif cid == b"FORM" and width is None and len(data) >= 12 \
                and data[:4] == b"DJVU" and data[4:8] == b"INFO":
            (ilen,) = struct.unpack(">I", data[8:12])
            width, height, dpi = _info_fields(data[12:12 + ilen])
        pos += 8 + clen + (clen & 1)  # IFF chunks pad to even
    return {
        "is_multi": is_multi,
        "n_pages": n_pages,
        "width": width,
        "height": height,
        "dpi": dpi,
    }
