"""EXIF metadata for JPEG payloads (round 4): APP1 segment -> TIFF IFD
walk. The metadata an image-curation pipeline actually uses from crawl
JPEGs — orientation (rotation-aware dedup/embedding requires it),
camera make/model (provenance filtering), and the Exif-declared pixel
dimensions — WITHOUT any pixel decode.

Scope: baseline TIFF structure per the Exif 2.3 spec — APP1 marker
(0xFFE1) with the "Exif\\0\\0" prefix, II/MM byte order, IFD0 entries
(ASCII and SHORT/LONG value types), and the ExifIFD pointer (0x8769)
for PixelXDimension/PixelYDimension. Bounded walks everywhere: entry
counts and offsets are untrusted; a malformed structure yields partial
or empty metadata, never an exception (the crawl contract: tags are
best-effort data).
"""

from __future__ import annotations

import struct

_ORIENTATION = 0x0112
_MAKE = 0x010F
_MODEL = 0x0110
_EXIF_IFD = 0x8769
_PIXEL_X = 0xA002
_PIXEL_Y = 0xA003
_MAX_ENTRIES = 512


def _read_value(tiff: bytes, endian: str, vtype: int, count: int,
                raw4: bytes):
    """Entry value: inline when <= 4 bytes, else offset into the TIFF
    body. Supports ASCII (2), SHORT (3), LONG (4)."""
    unit = {2: 1, 3: 2, 4: 4}.get(vtype)
    if unit is None:
        return None
    size = unit * count
    if size <= 4:
        data = raw4[:size]
    else:
        (off,) = struct.unpack(endian + "I", raw4)
        if off + size > len(tiff):
            return None
        data = tiff[off:off + size]
    if vtype == 2:
        return data.split(b"\x00", 1)[0].decode("ascii", "replace") or None
    fmt = "H" if vtype == 3 else "I"
    vals = struct.unpack(endian + fmt * count, data)
    return vals[0] if count == 1 else vals


def _walk_ifd(tiff: bytes, endian: str, off: int, out: dict) -> None:
    if off + 2 > len(tiff):
        return
    (n,) = struct.unpack(endian + "H", tiff[off:off + 2])
    n = min(n, _MAX_ENTRIES)
    for i in range(n):
        e = off + 2 + 12 * i
        if e + 12 > len(tiff):
            return
        tag, vtype, count = struct.unpack(endian + "HHI", tiff[e:e + 8])
        raw4 = tiff[e + 8:e + 12]
        if tag == _ORIENTATION:
            v = _read_value(tiff, endian, vtype, count, raw4)
            if isinstance(v, int) and 1 <= v <= 8:
                out["orientation"] = v
        elif tag == _MAKE:
            out["make"] = _read_value(tiff, endian, vtype, count, raw4)
        elif tag == _MODEL:
            out["model"] = _read_value(tiff, endian, vtype, count, raw4)
        elif tag == _PIXEL_X:
            v = _read_value(tiff, endian, vtype, count, raw4)
            if isinstance(v, int):
                out["exif_width"] = v
        elif tag == _PIXEL_Y:
            v = _read_value(tiff, endian, vtype, count, raw4)
            if isinstance(v, int):
                out["exif_height"] = v
        elif tag == _EXIF_IFD and "_sub" not in out:
            v = _read_value(tiff, endian, vtype, count, raw4)
            if isinstance(v, int):
                out["_sub"] = True  # one level only: no pointer loops
                _walk_ifd(tiff, endian, v, out)


def parse_exif(raw: bytes) -> dict:
    """JPEG bytes -> {orientation, make, model, exif_width,
    exif_height} (None when absent). Never raises."""
    out = {"orientation": None, "make": None, "model": None,
           "exif_width": None, "exif_height": None}
    try:
        if raw[:2] != b"\xff\xd8":
            return out
        pos = 2
        # marker walk: APP1 sits before entropy data in real files
        for _ in range(64):
            if pos + 4 > len(raw) or raw[pos] != 0xFF:
                return out
            marker = raw[pos + 1]
            if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
                pos += 2
                continue
            (seglen,) = struct.unpack(">H", raw[pos + 2:pos + 4])
            if marker == 0xDA:  # start of scan: no APP1 ahead
                return out
            if marker == 0xE1 and raw[pos + 4:pos + 10] == b"Exif\x00\x00":
                tiff = raw[pos + 10:pos + 2 + seglen]
                if tiff[:2] == b"II":
                    endian = "<"
                elif tiff[:2] == b"MM":
                    endian = ">"
                else:
                    return out
                (magic,) = struct.unpack(endian + "H", tiff[2:4])
                if magic != 42:
                    return out
                (ifd0,) = struct.unpack(endian + "I", tiff[4:8])
                found = {}
                _walk_ifd(tiff, endian, ifd0, found)
                found.pop("_sub", None)
                out.update(found)
                return out
            pos += 2 + seglen
        return out
    except Exception:
        return out


def build_exif_app1(orientation: int = None, make: str = None,
                    model: str = None, exif_w: int = None,
                    exif_h: int = None, endian: str = "<") -> bytes:
    """Minimal APP1/Exif segment writer for fixtures/tests — lays out
    IFD0 (+ ExifIFD when pixel dims are given) with out-of-line ASCII
    values; the independent direction against parse_exif."""
    e = endian
    ifd0 = []
    exif_entries = []
    tail = bytearray()

    def entry(tag, vtype, count, value_bytes, inline_ok):
        if inline_ok:
            return struct.pack(e + "HHI", tag, vtype, count) + \
                value_bytes.ljust(4, b"\x00")
        return (tag, vtype, count, bytes(value_bytes))  # resolved later

    if orientation is not None:
        ifd0.append(entry(_ORIENTATION, 3, 1,
                          struct.pack(e + "H", orientation), True))
    for tag, text in ((_MAKE, make), (_MODEL, model)):
        if text is not None:
            data = text.encode("ascii") + b"\x00"
            ifd0.append(entry(tag, 2, len(data), data, len(data) <= 4))
    if exif_w is not None:
        exif_entries.append(entry(_PIXEL_X, 4, 1,
                                  struct.pack(e + "I", exif_w), True))
    if exif_h is not None:
        exif_entries.append(entry(_PIXEL_Y, 4, 1,
                                  struct.pack(e + "I", exif_h), True))

    n0 = len(ifd0) + (1 if exif_entries else 0)
    ifd0_off = 8
    sub_off = ifd0_off + 2 + 12 * n0 + 4
    sub_len = (2 + 12 * len(exif_entries) + 4) if exif_entries else 0
    data_off = sub_off + sub_len

    def resolve(entries):
        nonlocal data_off
        blob = b""
        for it in entries:
            if isinstance(it, bytes):
                blob += it
            else:
                tag, vtype, count, data = it
                tail.extend(data)
                blob += struct.pack(e + "HHI", tag, vtype, count)
                blob += struct.pack(e + "I", data_off)
                data_off += len(data)
        return blob

    body = struct.pack(e + "H", n0) + resolve(ifd0)
    if exif_entries:
        body += struct.pack(e + "HHI", _EXIF_IFD, 4, 1)
        body += struct.pack(e + "I", sub_off)
    body += struct.pack(e + "I", 0)
    if exif_entries:
        body += struct.pack(e + "H", len(exif_entries))
        body += resolve(exif_entries) + struct.pack(e + "I", 0)
    tiff = (b"II" if e == "<" else b"MM") + struct.pack(e + "H", 42) + \
        struct.pack(e + "I", ifd0_off) + body[:]
    # body offsets were computed relative to TIFF start = 8-byte header
    tiff = tiff[:8] + body + bytes(tail)
    payload = b"Exif\x00\x00" + tiff
    return b"\xff\xe1" + struct.pack(">H", len(payload) + 2) + payload
