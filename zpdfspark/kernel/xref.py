"""PDF cross-reference parsing: classic tables + xref streams + /Prev chains.

Fresh Python implementation matching /root/reference/src/xref.zig:

- startxref discovery: LAST occurrence within the final 1024 bytes
  (xref.zig:106-140)
- classic tables: subsections ``first count`` with 20-byte entries,
  stop at ``trailer``; malformed entries skipped with the reference's
  exact recovery offsets (xref.zig:143-237)
- xref streams (PDF 1.5+): /Type /XRef, /W fixed-width big-endian
  fields, /Index ranges, entry types 0/1/2 (xref.zig:240-375)
- incremental updates: follow trailer /Prev; FIRST-parsed entry wins,
  so the newest update takes precedence (xref.zig:69-102, 226, 368)
- the first non-empty trailer dict becomes the document trailer
  (xref.zig:87-97)

Divergence (hardening only, documented): a visited-offset set guards
against /Prev cycles, which would loop forever in the reference.
"""

from __future__ import annotations

import re
from typing import Dict, NamedTuple, Optional, Tuple

from . import filters
from .objects import Name, Parser, ParseError, Stream, dict_get_array, dict_get_int, dict_get_name

FREE = 0
IN_USE = 1
COMPRESSED = 2

# entry: (offset_or_objstm_num, gen_or_index, entry_type)
XRefEntry = Tuple[int, int, int]


class XRefError(Exception):
    pass


class XRefTable:
    __slots__ = ("entries", "trailer")

    def __init__(self):
        self.entries: Dict[int, XRefEntry] = {}
        self.trailer: dict = {}

    def get(self, num: int) -> Optional[XRefEntry]:
        return self.entries.get(num)


_WS_SET = frozenset(b"\x00\t\n\x0c\r ")
_UINT_RE = re.compile(rb"[0-9]+")


def find_startxref(data: bytes) -> Optional[int]:
    region_start = len(data) - 1024 if len(data) > 1024 else 0
    region = data[region_start:]
    pos = region.rfind(b"startxref")
    if pos == -1:
        return None
    pos += 9
    while pos < len(region) and region[pos] in _WS_SET:
        pos += 1
    m = _UINT_RE.match(region, pos)
    if not m:
        return 0
    return int(m.group(0))


def parse_xref(data: bytes) -> XRefTable:
    start = find_startxref(data)
    if start is None:
        raise XRefError("startxref not found")
    xref = XRefTable()
    offset: Optional[int] = start
    seen = set()
    while offset is not None:
        if offset >= len(data):
            raise XRefError("invalid xref offset")
        if offset in seen:  # cycle guard (divergence: reference would loop)
            break
        seen.add(offset)
        if data[offset : offset + 4] == b"xref":
            trailer = _parse_xref_table(data, offset, xref)
        else:
            trailer = _parse_xref_stream(data, offset, xref)
        if not xref.trailer:
            xref.trailer = trailer
        offset = _trailer_prev(trailer)
    return xref


def _trailer_prev(trailer: dict) -> Optional[int]:
    prev = dict_get_int(trailer, "Prev")
    if prev is None or prev < 0:
        return None
    return prev


def _parse_fixed_uint(chunk: bytes) -> Optional[int]:
    if chunk.isdigit():  # common case: zero-padded field, one C call
        return int(chunk)
    value = 0
    for c in chunk:
        if 0x30 <= c <= 0x39:
            value = value * 10 + (c - 0x30)
        elif c != 0x20:
            return None
    return value


# well-formed 20-byte xref record in one scan (offset, gen, type, EOL);
# anything irregular (space padding, odd separators) falls back to the
# tolerant per-field path below, which preserves the original behavior
_XREF_REC_RE = re.compile(rb"([0-9]{10}) ([0-9]{5}) ([nf])[ \r\n]*")


def _parse_xref_table(data: bytes, offset: int, xref: XRefTable) -> dict:
    pos = offset
    if data[pos : pos + 4] != b"xref":
        raise XRefError("invalid xref table")
    pos += 4
    n = len(data)
    entries = xref.entries
    while pos < n:
        while pos < n and data[pos] in _WS_SET:
            pos += 1
        if data[pos : pos + 7] == b"trailer":
            pos += 7
            while pos < n and data[pos] in _WS_SET:
                pos += 1
            p = Parser(data, pos)
            try:
                trailer = p.parse_object()
            except ParseError:
                raise XRefError("invalid trailer")
            if not isinstance(trailer, dict):
                raise XRefError("invalid trailer")
            return trailer
        m = _UINT_RE.match(data, pos)
        if not m:
            break
        first_obj = int(m.group(0))
        pos = m.end()
        while pos < n and data[pos] in _WS_SET:
            pos += 1
        m = _UINT_RE.match(data, pos)
        if not m:
            raise XRefError("invalid xref subsection")
        count = int(m.group(0))
        pos = m.end()
        while pos < n and data[pos] in (0x20, 0x09):
            pos += 1
        if pos < n and data[pos] == 0x0D:
            pos += 1
        if pos < n and data[pos] == 0x0A:
            pos += 1
        rec = _XREF_REC_RE.match
        for i in range(count):
            m = rec(data, pos)
            if m is not None:  # fast path: one C scan per record
                pos = m.end()
                obj_num = first_obj + i
                if obj_num not in entries:  # first occurrence wins
                    entries[obj_num] = (
                        int(m.group(1)), int(m.group(2)),
                        IN_USE if m.group(3) == b"n" else FREE)
                continue
            if pos + 17 > n:
                break
            entry_offset = _parse_fixed_uint(data[pos : pos + 10])
            if entry_offset is None:
                pos += 20
                continue
            pos += 10
            if pos < n and data[pos] == 0x20:
                pos += 1
            gen = _parse_fixed_uint(data[pos : pos + 5])
            if gen is None:
                pos += 10
                continue
            pos += 5
            if pos < n and data[pos] == 0x20:
                pos += 1
            etype = IN_USE if (pos < n and data[pos] == 0x6E) else FREE  # 'n'
            pos += 1
            while pos < n and data[pos] in (0x20, 0x0D, 0x0A):
                pos += 1
            obj_num = first_obj + i
            if obj_num not in entries:  # first occurrence wins
                entries[obj_num] = (entry_offset, gen, etype)
    raise XRefError("xref table without trailer")


def _parse_xref_stream(data: bytes, offset: int, xref: XRefTable) -> dict:
    p = Parser(data, offset)
    try:
        _num, _gen, obj = p.parse_indirect_object()
    except ParseError:
        raise XRefError("invalid xref stream")
    if not isinstance(obj, Stream):
        raise XRefError("invalid xref stream")
    d = obj.dict
    stype = dict_get_name(d, "Type")
    if stype != b"XRef":
        raise XRefError("not an XRef stream")
    w = dict_get_array(d, "W")
    if w is None or len(w) != 3:
        raise XRefError("invalid /W")
    widths = []
    for item in w:
        if type(item) is int:
            if item < 0:
                raise XRefError("negative /W field")
            widths.append(item)
        else:
            widths.append(0)
    w0, w1, w2 = widths
    entry_size = w0 + w1 + w2
    if entry_size == 0:
        raise XRefError("zero-width xref entries")
    try:
        decoded = filters.decompress_stream(obj.raw, d.get("Filter"), d.get("DecodeParms"))
    except filters.DecompressError:
        raise XRefError("xref stream decode failed")
    size = dict_get_int(d, "Size")
    if size is None:
        raise XRefError("missing /Size")
    index = dict_get_array(d, "Index")
    ranges = []
    if index is not None:
        j = 0
        while j + 1 < len(index):
            s, c = index[j], index[j + 1]
            j += 2
            if type(s) is int and s >= 0 and type(c) is int and c >= 0:
                ranges.append((s, c))
    else:
        if size < 0:
            raise XRefError("negative /Size")
        ranges.append((0, size))

    entries = xref.entries
    data_pos = 0
    for start, count in ranges:
        for k in range(count):
            if data_pos + entry_size > len(decoded):
                break
            obj_num = start + k
            chunk = decoded[data_pos : data_pos + entry_size]
            data_pos += entry_size
            etype = int.from_bytes(chunk[:w0], "big") if w0 else 1
            f2 = int.from_bytes(chunk[w0 : w0 + w1], "big") if w1 else 0
            f3 = int.from_bytes(chunk[w0 + w1 :], "big") if w2 else 0
            if etype == 0:
                entry = (f2, f3, FREE)
            elif etype == 1:
                entry = (f2, f3, IN_USE)
            elif etype == 2:
                entry = (f2, f3, COMPRESSED)
            else:
                continue
            if obj_num not in entries:
                entries[obj_num] = entry
    return d
