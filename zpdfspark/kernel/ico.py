"""ICO (Windows icon / favicon) metadata — the web's favicon format.

Every production crawler fetches /favicon.ico per host (browsers do;
politeness pipelines budget for it), so a web-scale media table is
full of ICO payloads. This walk reads the ICONDIR directory: entry
count, per-entry dimensions (the format's u8 dims where 0 MEANS 256 —
the classic quirk), and the per-entry payload kind (modern icons
embed whole PNG streams; legacy entries carry a BMP DIB whose
BITMAPINFOHEADER height is DOUBLED to cover the AND transparency
mask). Pixel decode of DIB entries is out of scope here — PNG entries
can be decoded by kernel/png.py via entry_png() — matching the
engine's honest-stub posture for codec layers.

DoS bounds: entry count is capped, and every entry's (offset, size)
span must lie inside the payload — a directory pointing outside its
own bytes is rejected, not chased.
"""

from __future__ import annotations

import struct

_MAX_ENTRIES = 1024
_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"


class IcoError(ValueError):
    pass


def is_ico(raw: bytes) -> bool:
    """Magic sniff. ICO's magic is weak (six low bytes), so demand a
    structurally plausible directory: type 1, count >= 1, and the
    first entry's span inside the payload."""
    if len(raw) < 22 or raw[:4] != b"\x00\x00\x01\x00":
        return False
    (count,) = struct.unpack("<H", raw[4:6])
    if not 1 <= count <= _MAX_ENTRIES or len(raw) < 6 + 16 * count:
        return False
    size, offset = struct.unpack("<II", raw[14:22])
    return size > 0 and offset >= 6 + 16 * count and offset + size <= len(raw)


def parse_ico(raw: bytes) -> dict:
    """Directory walk. Returns {n_images, width, height, any_png,
    entries} where width/height are the LARGEST entry's dims (the
    rendition a pipeline keeps) and entries is a list of
    (width, height, kind, size) with kind in {'png', 'dib'}.
    Raises IcoError on anything that is not a readable icon —
    callers treat that as data, not a task failure."""
    if len(raw) < 6 or raw[:4] != b"\x00\x00\x01\x00":
        raise IcoError("not an ICO payload")
    (count,) = struct.unpack("<H", raw[4:6])
    if not 1 <= count <= _MAX_ENTRIES:
        raise IcoError(f"implausible entry count {count}")
    if len(raw) < 6 + 16 * count:
        raise IcoError("truncated directory")
    entries = []
    any_png = False
    for k in range(count):
        off = 6 + 16 * k
        w, h = raw[off], raw[off + 1]
        w, h = w or 256, h or 256          # 0 means 256
        size, data_off = struct.unpack("<II", raw[off + 8:off + 16])
        if size == 0 or data_off + size > len(raw) or data_off < 6 + 16 * count:
            raise IcoError(f"entry {k} span outside payload")
        kind = "png" if raw[data_off:data_off + 8] == _PNG_MAGIC else "dib"
        any_png = any_png or kind == "png"
        entries.append((w, h, kind, size))
    best = max(entries, key=lambda e: e[0] * e[1])
    return {
        "n_images": count,
        "width": best[0],
        "height": best[1],
        "any_png": any_png,
        "entries": entries,
    }


def entry_png(raw: bytes, index: int) -> bytes:
    """Return the embedded PNG stream of a png-kind entry (decodable
    by kernel/png.py); raises IcoError for dib entries."""
    meta = parse_ico(raw)
    if not 0 <= index < meta["n_images"]:
        raise IcoError("entry index out of range")
    off = 6 + 16 * index
    size, data_off = struct.unpack("<II", raw[off + 8:off + 16])
    if raw[data_off:data_off + 8] != _PNG_MAGIC:
        raise IcoError("entry is a DIB, not PNG")
    return raw[data_off:data_off + size]
