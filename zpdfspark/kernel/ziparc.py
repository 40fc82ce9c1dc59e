"""From-scratch ZIP archive reader (PKWARE APPNOTE 4.5 layout) for the
office-document extraction family (kernel/docx.py).

Crawls carry .docx/.xlsx/.epub payloads — all ZIP containers — so the
engine needs a container walk with the same robustness posture as the
PDF kernel (reference: src/root.zig's tolerant open + hard caps):
central-directory-driven (the authoritative index, like the PDF xref),
local headers cross-checked but never trusted for sizes (streamed
entries carry zeros there), CRC-verified output, and explicit DoS caps
so a hostile archive (zip bomb, 65k-entry directory, absurd name
lengths) fails fast with ZipError instead of exhausting an executor.

Deliberately NOT Python's zipfile: the fixtures WRITE archives with
stdlib zipfile, so reader and writer are independent implementations
of the spec and the round-trip test is a genuine two-engine check.

Unsupported (raise ZipError, honestly): zip64, encryption, multi-disk
archives, compression methods other than stored(0)/deflate(8) — the
office formats this feeds only ever use those two.
"""

from __future__ import annotations

import struct
import zlib

MAX_ENTRIES = 10_000
MAX_MEMBER = 64 << 20       # per-member uncompressed cap
MAX_TOTAL = 256 << 20       # whole-archive uncompressed cap
MAX_NAME = 4096
_EOCD_TAIL = 22 + 0xFFFF    # EOCD record + max comment


class ZipError(ValueError):
    pass


def parse_zip(raw: bytes, want: "set[str] | None" = None) -> dict:
    """Walk the central directory and return {name: bytes} for every
    member (or only `want` names when given — docx needs 2 of ~10
    parts, so skipping siblings skips their inflate cost too).

    Sizes/offsets come from the central directory only; the local
    header is checked for signature and used for its own (possibly
    different) name/extra lengths, per APPNOTE 4.3.7.
    """
    n = len(raw)
    eocd = raw.rfind(b"PK\x05\x06", max(0, n - _EOCD_TAIL))
    if eocd < 0 or n - eocd < 22:
        raise ZipError("no end-of-central-directory record")
    (disk, cd_disk, n_disk, n_total, cd_size, cd_off, _clen) = struct.unpack(
        "<HHHHIIH", raw[eocd + 4:eocd + 22])
    if disk != 0 or cd_disk != 0 or n_disk != n_total:
        raise ZipError("multi-disk archive unsupported")
    if n_total == 0xFFFF or cd_off == 0xFFFFFFFF or cd_size == 0xFFFFFFFF:
        raise ZipError("zip64 unsupported")
    if n_total > MAX_ENTRIES:
        raise ZipError(f"{n_total} entries > cap {MAX_ENTRIES}")
    if cd_off + cd_size > eocd:
        raise ZipError("central directory overruns EOCD")

    out: dict = {}
    total_out = 0
    pos = cd_off
    for _ in range(n_total):
        if raw[pos:pos + 4] != b"PK\x01\x02":
            raise ZipError("bad central-directory signature")
        if pos + 46 > cd_off + cd_size:
            raise ZipError("central-directory entry overruns directory")
        (_sig, _vmade, _vneed, flags, method, _mtime, _mdate, crc,
         csize, usize, nlen, xlen, clen, disk_start, _iattr, _eattr,
         lho) = struct.unpack("<IHHHHHHIIIHHHHHII", raw[pos:pos + 46])
        if disk_start != 0:
            raise ZipError("multi-disk member")
        if nlen > MAX_NAME:
            raise ZipError("member name too long")
        if csize == 0xFFFFFFFF or usize == 0xFFFFFFFF or lho == 0xFFFFFFFF:
            raise ZipError("zip64 member unsupported")
        name = raw[pos + 46:pos + 46 + nlen].decode("utf-8", "replace")
        pos += 46 + nlen + xlen + clen
        if pos > cd_off + cd_size:
            raise ZipError("central-directory entry overruns directory")
        if want is not None and name not in want:
            continue
        if flags & 0x1:
            raise ZipError(f"encrypted member {name!r}")
        if usize > MAX_MEMBER:
            raise ZipError(f"member {name!r} exceeds size cap")
        total_out += usize
        if total_out > MAX_TOTAL:
            raise ZipError("archive exceeds total uncompressed cap")
        out[name] = _read_member(raw, lho, method, csize, usize, crc, name)
    return out


def _read_member(raw: bytes, lho: int, method: int, csize: int,
                 usize: int, crc: int, name: str) -> bytes:
    if raw[lho:lho + 4] != b"PK\x03\x04":
        raise ZipError(f"bad local-header signature for {name!r}")
    lnlen, lxlen = struct.unpack("<HH", raw[lho + 26:lho + 30])
    start = lho + 30 + lnlen + lxlen
    comp = raw[start:start + csize]
    if len(comp) != csize:
        raise ZipError(f"member {name!r} truncated")
    if method == 0:
        if csize != usize:
            raise ZipError(f"stored member {name!r} size mismatch")
        data = comp
    elif method == 8:
        d = zlib.decompressobj(-15)
        try:
            data = d.decompress(comp, MAX_MEMBER + 1)
            data += d.flush()
        except zlib.error as e:
            raise ZipError(f"deflate error in {name!r}: {e}") from e
        if len(data) != usize:
            raise ZipError(f"member {name!r} inflated to {len(data)}, "
                           f"directory says {usize}")
    else:
        raise ZipError(f"unsupported compression method {method}")
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ZipError(f"CRC mismatch in {name!r}")
    return data


def zip_names(raw: bytes) -> list:
    """Member names only (no decompression) — the cheap sniff/probe
    path (is this PK blob a docx? an epub?)."""
    n = len(raw)
    eocd = raw.rfind(b"PK\x05\x06", max(0, n - _EOCD_TAIL))
    if eocd < 0 or n - eocd < 22:
        raise ZipError("no end-of-central-directory record")
    n_total, cd_size, cd_off = struct.unpack(
        "<HII", raw[eocd + 10:eocd + 20])
    if n_total > MAX_ENTRIES:
        raise ZipError(f"{n_total} entries > cap {MAX_ENTRIES}")
    names = []
    pos = cd_off
    for _ in range(n_total):
        if raw[pos:pos + 4] != b"PK\x01\x02":
            raise ZipError("bad central-directory signature")
        nlen, xlen, clen = struct.unpack("<HHH", raw[pos + 28:pos + 34])
        if nlen > MAX_NAME:
            raise ZipError("member name too long")
        names.append(raw[pos + 46:pos + 46 + nlen].decode("utf-8", "replace"))
        pos += 46 + nlen + xlen + clen
        if pos > eocd:
            raise ZipError("central-directory entry overruns EOCD")
    return names
