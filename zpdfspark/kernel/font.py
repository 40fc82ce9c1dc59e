"""Web-font payload census (TTF/OTF/WOFF/WOFF2) — from scratch.

Every page fetch pulls font files; a crawl-payload classifier that
cannot name them misfiles a visible slice of the byte volume. This
reads the container headers — the census a curation pipeline keys on
— without touching glyph data:

- TTF: sfnt version 0x00010000 (or 'true'), big-endian numTables
- OTF: sfnt version 'OTTO' (CFF outlines)
- WOFF (RFC 8081 / W3C): magic 'wOFF', flavor = the wrapped sfnt
  version, numTables, totalSfntSize
- WOFF2: magic 'wOF2', flavor, numTables, totalSfntSize (glyph data
  is Brotli-compressed — decode honestly out of scope here, the
  zstd posture)

Sanity bounds (numTables, declared sizes vs actual) harden the weak
four-byte magics the same way kernel/ico.py does. The independent
oracle is the fixtures-side struct re-read (_font_expected).
"""

from __future__ import annotations

import struct
from typing import Optional

_MAX_TABLES = 4096


class FontError(Exception):
    pass


def looks_like_font(raw: bytes) -> bool:
    if len(raw) < 12:
        return False
    magic = raw[:4]
    if magic in (b"wOFF", b"wOF2"):
        return True
    if magic in (b"\x00\x01\x00\x00", b"true", b"OTTO"):
        # sfnt: harden the weak magic with the table census bound
        n = struct.unpack(">H", raw[4:6])[0]
        return 0 < n <= _MAX_TABLES and len(raw) >= 12 + 16 * n
    return False


def parse_font(raw: bytes) -> dict:
    """-> {kind, flavor, n_tables, sfnt_size}. kind in ttf/otf/woff/
    woff2; flavor names the wrapped outline format for woff*."""
    if not looks_like_font(raw):
        raise FontError("not an sfnt/woff font")
    magic = raw[:4]

    def _flavor(tag: bytes) -> str:
        if tag == b"OTTO":
            return "otf"
        if tag in (b"\x00\x01\x00\x00", b"true"):
            return "ttf"
        return tag.decode("latin-1")

    if magic in (b"wOFF", b"wOF2"):
        if len(raw) < 48:
            raise FontError("woff header truncated")
        flavor_tag = raw[4:8]
        length, n_tables = struct.unpack(">IH", raw[8:14])
        total_sfnt = struct.unpack(">I", raw[16:20])[0]
        if n_tables == 0 or n_tables > _MAX_TABLES:
            raise FontError("implausible table count")
        return {
            "kind": "woff" if magic == b"wOFF" else "woff2",
            "flavor": _flavor(flavor_tag),
            "n_tables": n_tables,
            "sfnt_size": total_sfnt,
        }
    n_tables = struct.unpack(">H", raw[4:6])[0]
    return {
        "kind": "otf" if magic == b"OTTO" else "ttf",
        "flavor": _flavor(magic),
        "n_tables": n_tables,
        "sfnt_size": len(raw),
    }
