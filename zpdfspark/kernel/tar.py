"""TAR (ustar) member walk — crawls carry tarballs (source releases,
dataset drops, .tar.gz bundles reached through the gzip re-dispatch).

A web-scale pipeline keeps the MEMBER CENSUS (names, sizes, kinds)
without unpacking: that is what this walk produces. Member content
extraction is deliberately out of scope — a tarball is an archive of
documents, not a document (the engine's reduction rules cover real
document containers like EPUB/DOCX where order and joining are
specified; a tarball has neither).

Format notes honored (each one hit by REAL archives — CPython's
shipped testtar.tar drove this list): 512-byte blocks; size is octal
ASCII (with base-256 binary sizes for >8 GiB members — GNU/star emit
them); typeflag '5' directories have size 0 on disk regardless of the
field; GNU 'L'/'K' longname/longlink records carry the NEXT member's
name/linkname as data and are not members themselves; pax 'x'/'g'
extended headers are likewise absorbed; old-GNU sparse members ('S')
store LESS data on disk than their logical size — the sparse map in
the header (4 entries + extension blocks) gives the on-disk total,
and the realsize field the logical one; two zero blocks end the
archive but ragged real-world tails end it tolerantly. DoS bounds:
member-count cap, and every advance is validated against the payload
length so crafted sizes cannot loop or overshoot.
"""

from __future__ import annotations

_BLOCK = 512
_MAX_MEMBERS = 65536


class TarError(ValueError):
    pass


def is_tar(raw: bytes) -> bool:
    """The ustar magic sits at offset 257; pre-POSIX tars lack it, so
    also accept a checksum-valid first header (the classic heuristic)."""
    if len(raw) < _BLOCK:
        return False
    if raw[257:262] == b"ustar":
        return True
    return _checksum_ok(raw[:_BLOCK])


def _checksum_ok(hdr: bytes) -> bool:
    field = hdr[148:156]
    try:
        want = int(field.replace(b"\x00", b" ").strip() or b"0", 8)
    except ValueError:
        return False
    if want == 0:
        return False
    unsigned = sum(hdr) - sum(field) + 8 * 0x20
    if unsigned == want:
        return True
    # some historic producers (HP-UX, old Solaris) summed SIGNED chars
    # — stdlib tarfile accepts both, and real archives carry both
    signed = (sum(b - 256 if b > 127 else b for b in hdr)
              - sum(b - 256 if b > 127 else b for b in field) + 8 * 0x20)
    return signed == want


def _size_of(hdr: bytes) -> int:
    field = hdr[124:136]
    if field[0] & 0x80:                      # base-256 (GNU large files)
        return int.from_bytes(
            bytes([field[0] & 0x7F]) + field[1:], "big")
    s = field.replace(b"\x00", b" ").strip()
    return int(s, 8) if s else 0


def _octal(field: bytes) -> int:
    s = field.replace(b"\x00", b" ").strip()
    return int(s, 8) if s else 0


def _sparse_disk_size(raw: bytes, pos: int, hdr: bytes):
    """Old-GNU sparse member: sum the sparse map's numbytes (the
    on-disk payload) across the header's 4 inline entries and any
    extension blocks following the header. Returns (disk_size,
    n_extension_blocks)."""
    disk = 0
    area = hdr[386:386 + 4 * 24]
    for k in range(4):
        ent = area[k * 24:(k + 1) * 24]
        if not ent.strip(b"\x00"):
            break
        try:
            disk += _octal(ent[12:24])
        except ValueError as e:
            raise TarError(f"bad sparse entry: {e}") from e
    extended = hdr[482] not in (0, 0x20)
    n_ext = 0
    while extended:
        n_ext += 1
        if n_ext > 64:
            raise TarError("sparse extension chain too long")
        blk_off = pos + _BLOCK * n_ext
        if blk_off + _BLOCK > len(raw):
            break
        blk = raw[blk_off:blk_off + _BLOCK]
        for k in range(21):
            ent = blk[k * 24:(k + 1) * 24]
            if not ent.strip(b"\x00"):
                break
            try:
                disk += _octal(ent[12:24])
            except ValueError as e:
                raise TarError(f"bad sparse entry: {e}") from e
        extended = blk[504] not in (0, 0x20)
    return disk, n_ext


def _pax_records(buf: bytes) -> dict:
    """Parse pax extended-header records ("%d key=value\\n") for the
    overrides the walk needs (path, size). Malformed records end the
    scan tolerantly — a pax header is advisory."""
    out = {}
    pos = 0
    for _ in range(256):
        sp = buf.find(b" ", pos, pos + 20)
        if sp < 0:
            break
        try:
            rec_len = int(buf[pos:sp])
        except ValueError:
            break
        if rec_len <= sp - pos or pos + rec_len > len(buf):
            break
        body = buf[sp + 1:pos + rec_len]
        eq = body.find(b"=")
        if eq > 0:
            key = body[:eq].decode("utf-8", "replace")
            val = body[eq + 1:].rstrip(b"\n")
            if key == "size":
                try:
                    out["size"] = int(val)
                except ValueError:
                    pass
            elif key == "path":
                out["path"] = val.decode("utf-8", "replace")
        pos += rec_len
        if pos >= len(buf):
            break
    return out


def parse_tar(raw: bytes) -> dict:
    """Walk the member headers. Returns {n_members, n_bytes,
    first_name, names} where n_bytes sums logical member payload
    sizes (links/devices count zero, sparse members their realsize —
    stdlib-tarfile semantics) and names carries regular-file member
    names in archive order (directories counted separately; GNU
    longname records resolve the name they describe and are not
    members themselves). Raises TarError on anything that is not a
    readable archive."""
    if len(raw) < _BLOCK:
        raise TarError("shorter than one block")
    names = []
    n_members = 0
    n_dirs = 0
    n_bytes = 0
    pos = 0
    pending_name = None                      # from a GNU 'L' record
    pending_pax = None                       # from a pax 'x'/'X' record
    while pos + _BLOCK <= len(raw):
        hdr = raw[pos:pos + _BLOCK]
        if hdr == b"\x00" * _BLOCK:          # terminator
            break
        if not _checksum_ok(hdr):
            if n_members or n_dirs:
                break                        # ragged tail: tolerate
            raise TarError("bad header checksum")
        if n_members + n_dirs >= _MAX_MEMBERS:
            raise TarError("member cap exceeded")
        name = hdr[:100].split(b"\x00")[0].decode("utf-8", "replace")
        prefix = hdr[345:500].split(b"\x00")[0].decode("utf-8", "replace")
        if prefix and hdr[257:262] == b"ustar":
            name = prefix + "/" + name
        if pending_name is not None:
            name, pending_name = pending_name, None
        try:
            size = _size_of(hdr)
        except ValueError as e:
            raise TarError(f"bad size field: {e}") from e
        if size < 0:
            raise TarError("negative member size")
        typeflag = hdr[156:157]
        if (pending_pax is not None
                and typeflag not in (b"x", b"X", b"g", b"L", b"K")):
            # pax overrides BEAT the ustar header: real producers
            # store a placeholder size there (the CPython test archive
            # writes 30 where the pax record says 7011) and the data
            # advance must follow the override or the walk misaligns
            if "path" in pending_pax:
                name = pending_pax["path"]
            if "size" in pending_pax:
                size = pending_pax["size"]
            pending_pax = None
        disk_size = size
        extra_blocks = 0
        if typeflag == b"L":                 # GNU longname: the data IS
            payload = raw[pos + _BLOCK:pos + _BLOCK + min(size, 4096)]
            pending_name = payload.split(b"\x00")[0].decode(
                "utf-8", "replace")          # the next member's name
        elif typeflag in (b"x", b"X"):       # pax / Sun extended header
            pending_pax = _pax_records(
                raw[pos + _BLOCK:pos + _BLOCK + min(size, 1 << 16)])
        elif typeflag in (b"K", b"g"):
            pass                             # longlink / pax-global: skip
        elif typeflag in (b"0", b"\x00") and name.endswith("/"):
            n_dirs += 1                      # pre-POSIX dir: trailing /
            disk_size = 0
        elif typeflag == b"5":
            n_dirs += 1
            disk_size = 0
        elif typeflag == b"S":               # old-GNU sparse: less data
            disk_size, extra_blocks = _sparse_disk_size(raw, pos, hdr)
            n_members += 1
            n_bytes += _octal(hdr[483:495]) or size
        else:
            if typeflag in (b"1", b"2", b"3", b"4", b"6"):
                disk_size = 0                # links/devices carry no data
            n_members += 1
            n_bytes += disk_size
            if typeflag in (b"0", b"\x00", b"7") and len(names) < 1024:
                names.append(name)
        if pos + _BLOCK + disk_size > len(raw) + _BLOCK:
            raise TarError("member size overshoots archive")
        pos += (_BLOCK * (1 + extra_blocks)
                + ((disk_size + _BLOCK - 1) // _BLOCK) * _BLOCK)
    if not n_members and not n_dirs:
        raise TarError("no members")
    return {
        "n_members": n_members,
        "n_dirs": n_dirs,
        "n_bytes": n_bytes,
        "first_name": names[0] if names else None,
        "names": names,
    }
