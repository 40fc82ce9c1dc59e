"""Minimal pure-Python FLAC metadata parser for the multimodal audio
path.

Same posture as kernel/wav.py and kernel/mp3.py: the sandbox has no
codec libraries, but the FLAC container's metadata layer (RFC 9639
§8) is a deterministic block walk, so stream identity — sample rate,
channels, bit depth, total samples/duration, Vorbis-comment tags — is
extracted for REAL without decoding any audio frame. The subframe/
residual decode stays honestly stubbed (media.py codec layer).

Parsed blocks: STREAMINFO (type 0, mandatory-first per spec) and
VORBIS_COMMENT (type 4, little-endian length-prefixed key=value
tags, same wire format Ogg Vorbis uses). Other block types
(padding, seektable, cuesheet, picture) are length-skipped but
counted, so a hostile block can't derail the walk. Anything
structurally off raises FlacError — callers treat a failed parse as
data, never as a task failure (the PDF kernel's permissive contract).
"""

from __future__ import annotations

import struct

MAX_BLOCKS = 256  # metadata-block DoS cap (Z12 spirit)


class FlacError(Exception):
    pass


def _parse_vorbis_comment(body: bytes) -> dict:
    """Vorbis-comment payload -> {vendor, tags{UPPERKEY: value}}.
    All integers little-endian (the one LE corner of FLAC)."""
    out = {"vendor": None, "tags": {}}
    if len(body) < 8:
        raise FlacError("short vorbis comment")
    (vlen,) = struct.unpack("<I", body[:4])
    pos = 4
    if pos + vlen + 4 > len(body):
        raise FlacError("vendor overruns block")
    out["vendor"] = body[pos:pos + vlen].decode("utf-8", "replace")
    pos += vlen
    (n,) = struct.unpack("<I", body[pos:pos + 4])
    pos += 4
    if n > 1024:
        raise FlacError("comment count cap")
    for _ in range(n):
        if pos + 4 > len(body):
            raise FlacError("truncated comment list")
        (clen,) = struct.unpack("<I", body[pos:pos + 4])
        pos += 4
        if pos + clen > len(body):
            raise FlacError("comment overruns block")
        item = body[pos:pos + clen].decode("utf-8", "replace")
        pos += clen
        if "=" in item:
            k, v = item.split("=", 1)
            # first occurrence wins, matching the dict-parse posture
            out["tags"].setdefault(k.upper(), v)
    return out


def parse_flac(raw: bytes) -> dict:
    """FLAC bytes -> {sample_rate, channels, bits_per_sample,
    total_samples, duration_ms, md5_hex, n_blocks, title, artist,
    vendor}. Raises FlacError on anything structurally off."""
    if len(raw) < 4 or raw[:4] != b"fLaC":
        raise FlacError("bad fLaC marker")
    pos = 4
    info = None
    comment = {"vendor": None, "tags": {}}
    n_blocks = 0
    last = False
    while not last:
        if n_blocks >= MAX_BLOCKS:
            raise FlacError("metadata block cap")
        if pos + 4 > len(raw):
            raise FlacError("truncated block header")
        hdr = raw[pos]
        last = bool(hdr & 0x80)
        btype = hdr & 0x7F
        blen = int.from_bytes(raw[pos + 1:pos + 4], "big")
        body = raw[pos + 4:pos + 4 + blen]
        if len(body) < blen:
            raise FlacError("truncated block body")
        if n_blocks == 0 and btype != 0:
            raise FlacError("first block is not STREAMINFO")
        if btype == 0:
            if blen != 34:
                raise FlacError(f"STREAMINFO length {blen} != 34")
            # 16+16 block sizes, 24+24 frame sizes, then the packed
            # 64-bit field: rate(20) channels-1(3) bits-1(5)
            # total_samples(36), then 16-byte unencoded-audio MD5
            packed = int.from_bytes(body[10:18], "big")
            info = {
                "min_block": struct.unpack(">H", body[0:2])[0],
                "max_block": struct.unpack(">H", body[2:4])[0],
                "sample_rate": (packed >> 44) & 0xFFFFF,
                "channels": ((packed >> 41) & 0x7) + 1,
                "bits_per_sample": ((packed >> 36) & 0x1F) + 1,
                "total_samples": packed & 0xFFFFFFFFF,
                "md5_hex": body[18:34].hex(),
            }
            if info["sample_rate"] == 0:
                raise FlacError("zero sample rate")
        elif btype == 4:
            comment = _parse_vorbis_comment(body)
        elif btype == 127:
            raise FlacError("invalid block type 127")
        n_blocks += 1
        pos += 4 + blen
    if info is None:
        raise FlacError("no STREAMINFO")
    total = info["total_samples"]
    return {
        "sample_rate": info["sample_rate"],
        "channels": info["channels"],
        "bits_per_sample": info["bits_per_sample"],
        "total_samples": total,
        # total_samples == 0 means "unknown" per spec, not empty
        "duration_ms": (total * 1000) // info["sample_rate"] if total else None,
        "md5_hex": info["md5_hex"],
        "n_blocks": n_blocks,
        "title": comment["tags"].get("TITLE"),
        "artist": comment["tags"].get("ARTIST"),
        "vendor": comment["vendor"],
    }


def build_flac(sample_rate: int = 44100, channels: int = 2,
               bits: int = 16, total_samples: int = 44100,
               title: str = None, artist: str = None,
               md5: bytes = b"\x00" * 16, padding: int = 0) -> bytes:
    """Test-side encoder: emit a metadata-only FLAC prefix (STREAMINFO
    [+ VORBIS_COMMENT] [+ PADDING]). Audio frames are deliberately
    absent — parse_flac never reads past the last metadata block, and
    a metadata-only capture is what a range request for a FLAC header
    returns in practice."""
    packed = ((sample_rate & 0xFFFFF) << 44) | ((channels - 1) << 41) | \
        ((bits - 1) << 36) | (total_samples & 0xFFFFFFFFF)
    streaminfo = (struct.pack(">HH", 4096, 4096) + b"\x00" * 6 +
                  packed.to_bytes(8, "big") + md5)
    blocks = [(0, streaminfo)]
    if title is not None or artist is not None:
        vendor = b"zpdfspark-testenc"
        tags = []
        if title is not None:
            tags.append(f"TITLE={title}".encode("utf-8"))
        if artist is not None:
            tags.append(f"ARTIST={artist}".encode("utf-8"))
        body = struct.pack("<I", len(vendor)) + vendor + \
            struct.pack("<I", len(tags))
        for t in tags:
            body += struct.pack("<I", len(t)) + t
        blocks.append((4, body))
    if padding:
        blocks.append((1, b"\x00" * padding))
    out = b"fLaC"
    for i, (btype, body) in enumerate(blocks):
        hdr = btype | (0x80 if i == len(blocks) - 1 else 0)
        out += bytes([hdr]) + len(body).to_bytes(3, "big") + body
    return out
