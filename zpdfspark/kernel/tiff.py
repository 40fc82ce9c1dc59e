"""Minimal pure-Python standalone-TIFF metadata parser.

kernel/exif.py walks the TIFF IFD structure embedded in a JPEG APP1
segment; a standalone .tif file IS that structure with no JPEG
wrapper, so this module gives the multimodal path real TIFF identity
(dimensions, depth, compression, description) with the same bounded
IFD walk. Strip/pixel decode stays honestly stubbed (media.py codec
layer) — like the reference's image posture, metadata is parsed for
real and pixel decode is out of scope.

Supported value types: BYTE(1)/ASCII(2)/SHORT(3)/LONG(4); multi-IFD
chains are followed (page count) with a pointer-loop cap.
"""

from __future__ import annotations

import struct

_WIDTH = 0x0100
_HEIGHT = 0x0101
_BITS = 0x0102
_COMPRESSION = 0x0103
_PHOTOMETRIC = 0x0106
_DESCRIPTION = 0x010E
_SAMPLES = 0x0115
_MAX_ENTRIES = 512
_MAX_IFDS = 64

_COMPRESSION_NAMES = {1: "none", 2: "ccitt-rle", 3: "g3", 4: "g4",
                      5: "lzw", 6: "jpeg-old", 7: "jpeg", 8: "deflate",
                      32773: "packbits"}


class TiffError(Exception):
    pass


def _read_value(tiff: bytes, endian: str, vtype: int, count: int,
                raw4: bytes):
    unit = {1: 1, 2: 1, 3: 2, 4: 4}.get(vtype)
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
    fmt = {1: "B", 3: "H", 4: "I"}[vtype]
    vals = struct.unpack(endian + fmt * count, data)
    return vals[0] if count == 1 else vals


def parse_tiff(raw: bytes) -> dict:
    """Standalone TIFF bytes -> {width, height, bits_per_sample,
    samples_per_pixel, compression, photometric, description,
    n_pages, endian}. First IFD carries the image identity; the /Next
    chain is followed only to count pages. Raises TiffError."""
    if len(raw) < 8:
        raise TiffError("too short")
    if raw[:2] == b"II":
        endian = "<"
    elif raw[:2] == b"MM":
        endian = ">"
    else:
        raise TiffError("bad byte-order mark")
    (magic, ifd_off) = struct.unpack(endian + "HI", raw[2:8])
    if magic != 42:
        raise TiffError(f"bad magic {magic}")
    out = {"width": None, "height": None, "bits_per_sample": None,
           "samples_per_pixel": None, "compression": None,
           "photometric": None, "description": None, "n_pages": 0,
           "endian": "little" if endian == "<" else "big"}
    seen = set()
    first = True
    while ifd_off:
        if ifd_off in seen or len(seen) >= _MAX_IFDS:
            raise TiffError("IFD pointer loop")
        seen.add(ifd_off)
        if ifd_off + 2 > len(raw):
            raise TiffError("IFD offset out of range")
        (n,) = struct.unpack(endian + "H", raw[ifd_off:ifd_off + 2])
        n = min(n, _MAX_ENTRIES)
        for i in range(n):
            e = ifd_off + 2 + 12 * i
            if e + 12 > len(raw):
                raise TiffError("truncated IFD entry")
            tag, vtype, count = struct.unpack(endian + "HHI",
                                              raw[e:e + 8])
            if not first:
                continue
            raw4 = raw[e + 8:e + 12]
            if tag == _WIDTH:
                out["width"] = _read_value(raw, endian, vtype, count, raw4)
            elif tag == _HEIGHT:
                out["height"] = _read_value(raw, endian, vtype, count, raw4)
            elif tag == _BITS:
                v = _read_value(raw, endian, vtype, count, raw4)
                out["bits_per_sample"] = v if isinstance(v, int) else \
                    (v[0] if v else None)
            elif tag == _SAMPLES:
                out["samples_per_pixel"] = _read_value(
                    raw, endian, vtype, count, raw4)
            elif tag == _COMPRESSION:
                v = _read_value(raw, endian, vtype, count, raw4)
                if isinstance(v, int):
                    out["compression"] = _COMPRESSION_NAMES.get(
                        v, f"unknown-{v}")
            elif tag == _PHOTOMETRIC:
                out["photometric"] = _read_value(
                    raw, endian, vtype, count, raw4)
            elif tag == _DESCRIPTION:
                out["description"] = _read_value(
                    raw, endian, vtype, count, raw4)
        out["n_pages"] += 1
        first = False
        nxt = ifd_off + 2 + 12 * n
        if nxt + 4 > len(raw):
            raise TiffError("truncated next-IFD pointer")
        (ifd_off,) = struct.unpack(endian + "I", raw[nxt:nxt + 4])
    if out["width"] is None or out["height"] is None:
        raise TiffError("IFD0 lacks dimensions")
    return out


def build_tiff(width: int, height: int, bits: int = 8,
               compression: int = 1, description: str = None,
               endian: str = "<", n_pages: int = 1) -> bytes:
    """Test-side encoder: real TIFF header + IFD chain (+ tiny strip
    payload per page so offsets stay honest)."""
    def entries_for(page):
        ent = [(_WIDTH, 4, 1, width), (_HEIGHT, 4, 1, height),
               (_BITS, 3, 1, bits), (_COMPRESSION, 3, 1, compression),
               (_PHOTOMETRIC, 3, 1, 1), (_SAMPLES, 3, 1, 1)]
        if description is not None and page == 0:
            ent.append((_DESCRIPTION, 2, None, description))
        return sorted(ent)

    out = bytearray()
    out += (b"II" if endian == "<" else b"MM") + \
        struct.pack(endian + "HI", 42, 8)
    heap = bytearray()
    ifd_offsets = []
    pos = 8
    for p in range(n_pages):
        ent = entries_for(p)
        ifd_len = 2 + 12 * len(ent) + 4
        ifd_offsets.append(pos)
        pos += ifd_len
    heap_base = pos
    ifds = []
    for p in range(n_pages):
        ent = entries_for(p)
        body = struct.pack(endian + "H", len(ent))
        for tag, vtype, count, value in ent:
            if vtype == 2:
                data = value.encode("ascii") + b"\x00"
                if len(data) <= 4:
                    body += struct.pack(endian + "HHI", tag, 2, len(data)) \
                        + data.ljust(4, b"\x00")
                else:
                    body += struct.pack(endian + "HHII", tag, 2, len(data),
                                        heap_base + len(heap))
                    heap.extend(data)
            else:
                fmt = "H" if vtype == 3 else "I"
                packed = struct.pack(endian + fmt, value).ljust(4, b"\x00")
                body += struct.pack(endian + "HHI", tag, vtype, count) \
                    + packed
        nxt = ifd_offsets[p + 1] if p + 1 < n_pages else 0
        body += struct.pack(endian + "I", nxt)
        ifds.append(body)
    return bytes(out) + b"".join(ifds) + bytes(heap)
