"""PDF stream filters (decode stage).

Fresh Python implementation matching the reference's decode semantics
(/root/reference/src/decompress.zig):

- filter chains: /Filter name or array (max 16), per-filter /DecodeParms;
  a single dict param applies to every filter in the chain
  (decompress.zig:28-71)
- FlateDecode: zlib inflate, truncated streams keep partial output
  (decompress.zig:128-192)
- PNG predictors 10-15 and TIFF predictor 2 (decompress.zig:195-350)
- ASCII85: whitespace skipped, 'z' = 4 zeros (error mid-group), '~>'
  terminator, partial tail padded with 84 (decompress.zig:356-412)
- ASCIIHex: '>' terminator, odd tail padded x16 (decompress.zig:418-456)
- LZW: 9->12-bit MSB-first variable codes, 256=clear, 257=EOD; the bit
  reader stops when fewer than 3 bytes remain (decompress.zig:462-574)
- RunLength (decompress.zig:580-609)
- image filters (DCT/CCITT/JBIG2/JPX) passed through raw
  (decompress.zig:109-119)
- DoS cap: 256 MiB decoded (decompress.zig:25)
"""

from __future__ import annotations

import zlib
from typing import Optional

from .objects import Name, Stream, dict_get_int

MAX_DECOMPRESSED_SIZE = 256 * 1024 * 1024


class DecompressError(Exception):
    pass


_PASSTHROUGH = {
    b"DCTDecode",
    b"DCT",
    b"CCITTFaxDecode",
    b"CCF",
    b"JBIG2Decode",
    b"JPXDecode",
}


def decompress_stream(data: bytes, filt, params) -> bytes:
    """Apply the stream's filter chain. Raises DecompressError on failure
    (callers fall back to raw bytes, mirroring pagetree.zig:336-343)."""
    if filt is None:
        return data
    if isinstance(filt, Name):
        filters = [bytes(filt)]
    elif isinstance(filt, list):
        # a chain longer than 16 entries or containing non-Name junk is an
        # error, so stream_data falls back to the raw bytes exactly like an
        # unsupported filter does (decompress.zig:40-47) — silently decoding
        # a partial chain would return half-decoded bytes as if it succeeded
        if len(filt) > 16 or any(not isinstance(f, Name) for f in filt):
            raise DecompressError("invalid filter chain")
        filters = [bytes(f) for f in filt]
    else:
        return data

    current = data
    for i, fname in enumerate(filters):
        if isinstance(params, dict):
            param = params
        elif isinstance(params, list):
            param = params[i] if i < len(params) else None
            if not isinstance(param, dict):
                param = None
        else:
            param = None
        current = _apply_filter(current, fname, param)
    return current


def _apply_filter(data: bytes, fname: bytes, param: Optional[dict]) -> bytes:
    if fname in (b"FlateDecode", b"Fl"):
        return _decode_flate(data, param)
    if fname in (b"ASCII85Decode", b"A85"):
        return decode_ascii85(data)
    if fname in (b"ASCIIHexDecode", b"AHx"):
        return decode_asciihex(data)
    if fname in (b"LZWDecode", b"LZW"):
        early = dict_get_int(param, "EarlyChange") if param else None
        return decode_lzw(data, early_change=early if early in (0, 1) else 0)
    if fname in (b"RunLengthDecode", b"RL"):
        return decode_runlength(data)
    if fname in _PASSTHROUGH:
        return data
    raise DecompressError(f"unsupported filter {fname!r}")


def _decode_flate(data: bytes, param: Optional[dict]) -> bytes:
    obj = zlib.decompressobj()
    out = b""
    err = None
    # Enforce the 256 MiB cap INCREMENTALLY: decompress() is bounded by
    # max_length, and flush() is only called (also bounded) when the
    # bounded pass consumed all input — so a small crafted bomb can never
    # allocate more than MAX+1 bytes before the cap trips (a post-hoc
    # check would let flush() inflate the unconsumed tail unboundedly;
    # measured 2.1 GB peak for a 1 GiB bomb before this guard).
    try:
        out = obj.decompress(data, MAX_DECOMPRESSED_SIZE + 1)
        if (len(out) <= MAX_DECOMPRESSED_SIZE and not obj.unconsumed_tail
                and not obj.eof):
            # flush() only matters for INCOMPLETE streams (truncated
            # flate partial-output tolerance): a finished stream below
            # the cap has already yielded all output, and flush(length)
            # preallocates `length` bytes — ~14us per call at the 256
            # MiB bound, which dominated decode time when called
            # unconditionally
            out += obj.flush(MAX_DECOMPRESSED_SIZE + 1 - len(out))
    except zlib.error as e:
        err = e
    if err is not None and not out:
        raise DecompressError(f"flate failed: {err}")
    if len(out) > MAX_DECOMPRESSED_SIZE or obj.unconsumed_tail:
        raise DecompressError("output too large")

    if param:
        predictor = dict_get_int(param, "Predictor") or 1
        if predictor > 1:
            columns = dict_get_int(param, "Columns") or 1
            colors = dict_get_int(param, "Colors") or 1
            bits = dict_get_int(param, "BitsPerComponent") or 8
            out = apply_predictor(out, predictor, columns, colors, bits)
    return out


def apply_predictor(data: bytes, predictor: int, columns: int, colors: int, bits: int) -> bytes:
    if predictor == 1:
        return data
    if predictor == 2:
        return _tiff_predictor(data, columns, colors)
    if 10 <= predictor <= 15:
        return _png_predictor(data, columns, colors, bits)
    raise DecompressError(f"invalid predictor {predictor}")


def _tiff_predictor(data: bytes, columns: int, colors: int) -> bytes:
    bpr = columns * colors
    if bpr <= 0:
        return data
    num_rows = len(data) // bpr
    out = bytearray(data)
    for row in range(num_rows):
        base = row * bpr
        for col in range(colors, bpr):
            out[base + col] = (out[base + col] + out[base + col - colors]) & 0xFF
    return bytes(out)


def _png_predictor(data: bytes, columns: int, colors: int, bits: int) -> bytes:
    bpp = (colors * bits + 7) // 8
    row_bytes = (columns * colors * bits + 7) // 8
    src_row_bytes = row_bytes + 1
    if src_row_bytes <= 1:
        return data
    num_rows = len(data) // src_row_bytes
    out = bytearray(num_rows * row_bytes)
    prev_row: Optional[bytearray] = None
    for row in range(num_rows):
        src_start = row * src_row_bytes
        ftype = data[src_start]
        src = data[src_start + 1 : src_start + 1 + row_bytes]
        o = row * row_bytes
        cur = bytearray(src)
        if ftype == 0:
            pass
        elif ftype == 1:  # Sub
            for i in range(bpp, row_bytes):
                cur[i] = (cur[i] + cur[i - bpp]) & 0xFF
        elif ftype == 2:  # Up
            if prev_row is not None:
                for i in range(row_bytes):
                    cur[i] = (cur[i] + prev_row[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(row_bytes):
                left = cur[i - bpp] if i >= bpp else 0
                up = prev_row[i] if prev_row is not None else 0
                cur[i] = (cur[i] + ((left + up) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(row_bytes):
                a = cur[i - bpp] if i >= bpp else 0
                b = prev_row[i] if prev_row is not None else 0
                c = prev_row[i - bpp] if (prev_row is not None and i >= bpp) else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                if pa <= pb and pa <= pc:
                    pred = a
                elif pb <= pc:
                    pred = b
                else:
                    pred = c
                cur[i] = (cur[i] + pred) & 0xFF
        # unknown filter byte: copy as-is (decompress.zig:325-328)
        out[o : o + row_bytes] = cur
        prev_row = cur
    return bytes(out)


def decode_ascii85(data: bytes) -> bytes:
    out = bytearray()
    tup = 0
    count = 0
    i = 0
    n = len(data)
    while i < n:
        c = data[i]
        i += 1
        if c in (0x20, 0x09, 0x0A, 0x0D):
            continue
        if c == 0x7E:  # '~'
            if i < n and data[i] == 0x3E:  # '>'
                break
            continue
        if c == 0x7A:  # 'z'
            if count != 0:
                raise DecompressError("'z' inside ascii85 group")
            out += b"\x00\x00\x00\x00"
            continue
        if c < 0x21 or c > 0x75:
            continue
        tup = tup * 85 + (c - 0x21)
        count += 1
        if count == 5:
            out += (tup & 0xFFFFFFFF).to_bytes(4, "big")
            tup = 0
            count = 0
    if count > 0:
        for _ in range(count, 5):
            tup = tup * 85 + 84
        full = (tup & 0xFFFFFFFF).to_bytes(4, "big")
        out += full[: count - 1]
    return bytes(out)


def decode_asciihex(data: bytes) -> bytes:
    end = data.find(b">")
    chunk = data if end == -1 else data[:end]
    out = bytearray()
    high = None
    for c in chunk:
        if 0x30 <= c <= 0x39:
            nib = c - 0x30
        elif 0x41 <= c <= 0x46:
            nib = c - 0x41 + 10
        elif 0x61 <= c <= 0x66:
            nib = c - 0x61 + 10
        else:
            continue
        if high is None:
            high = nib
        else:
            out.append((high << 4) | nib)
            high = None
    if high is not None:
        out.append(high << 4)
    return bytes(out)


def decode_lzw(data: bytes, early_change: int = 0) -> bytes:
    """LZW with the reference's exact bit-reader boundary behavior
    (decompress.zig:559-574: stops when < 3 bytes remain).

    ``early_change`` implements the /EarlyChange DecodeParm the
    reference leaves as a TODO (decompress.zig:467): with 1, the code
    width increments one code early (table size (1<<width)-1 — how the
    PDF spec's default encoders emit); with 0 at the exact power of
    two. The DEFAULT here stays 0 — the reference's hardcoded behavior
    — so byte parity with the reference holds on param-less streams;
    an explicit /EarlyChange in DecodeParms is honored (exceeding the
    reference, which ignores it)."""
    out = bytearray()
    # table entries 0-255 are single bytes; 256=clear, 257=EOD
    single = [bytes((i,)) for i in range(256)]

    def fresh_table():
        t = single[:]
        t.append(b"")  # 256 clear
        t.append(b"")  # 257 EOD
        return t

    table = fresh_table()
    bit_pos = 0
    code_size = 9
    prev_code = None
    nbits = len(data) * 8
    while True:
        byte_pos = bit_pos >> 3
        if byte_pos + 2 >= len(data):
            break
        bit_off = bit_pos & 7
        window = (data[byte_pos] << 16) | (data[byte_pos + 1] << 8) | data[byte_pos + 2]
        code = (window >> (24 - code_size - bit_off)) & ((1 << code_size) - 1)
        bit_pos += code_size
        if bit_pos > nbits:
            break
        if code == 256:
            table = fresh_table()
            code_size = 9
            prev_code = None
            continue
        if code == 257:
            break
        if code < len(table):
            entry = table[code]
            out += entry
            if prev_code is not None and prev_code < len(table):
                prev_entry = table[prev_code]
                if len(table) < 4096:
                    table.append(prev_entry + entry[:1])
        elif prev_code is not None and prev_code < len(table):
            prev_entry = table[prev_code]
            new_entry = prev_entry + prev_entry[:1]
            out += new_entry
            if len(table) < 4096:
                table.append(new_entry)
        prev_code = code
        if len(table) + early_change >= (1 << code_size) and code_size < 12:
            code_size += 1
    return bytes(out)


def decode_runlength(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    n = len(data)
    while i < n:
        length = data[i]
        i += 1
        if length == 128:
            break
        if length < 128:
            copy_len = length + 1
            if i + copy_len > n:
                break
            out += data[i : i + copy_len]
            i += copy_len
        else:
            if i >= n:
                break
            out += bytes((data[i],)) * (257 - length)
            i += 1
    return bytes(out)


def stream_data(stream: Stream) -> bytes:
    """Decode a stream's data; on filter failure return the raw bytes
    (matches getStreamData's catch, pagetree.zig:336-343)."""
    try:
        return decompress_stream(stream.raw, stream.dict.get("Filter"), stream.dict.get("DecodeParms"))
    except DecompressError:
        return stream.raw
