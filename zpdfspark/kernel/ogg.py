"""Minimal pure-Python Ogg container walker (RFC 3533) with Vorbis /
Opus identification-header parsing for the multimodal audio path.

Same posture as kernel/flac.py: no codec library exists in the
sandbox, but the Ogg page layer — capture pattern, lacing, page CRC,
granule positions — and the codec id/comment headers are
deterministic structures, so stream identity (codec, channels, rate,
duration from the terminal granule) is extracted for REAL. Audio
packet decode stays honestly stubbed (media.py codec layer).

Every page CRC is VERIFIED (Ogg's own 0x04C11DB7 unreflected CRC-32,
init 0, no final xor, CRC field zeroed during computation) — a
corrupted capture surfaces as OggError data, never a silent
half-parse. Packet reassembly honors 255-lacing continuation across
pages, which is where naive walkers break on real files.
"""

from __future__ import annotations

import struct

MAX_PAGES = 8192  # page-walk DoS cap (Z12 spirit)

_CRC_TABLE = []
for _i in range(256):
    _r = _i << 24
    for _ in range(8):
        _r = ((_r << 1) ^ 0x04C11DB7 if _r & 0x80000000 else _r << 1) \
            & 0xFFFFFFFF
    _CRC_TABLE.append(_r)


def _ogg_crc(data: bytes) -> int:
    crc = 0
    for b in data:
        crc = ((crc << 8) & 0xFFFFFFFF) ^ _CRC_TABLE[((crc >> 24) ^ b) & 0xFF]
    return crc


class OggError(Exception):
    pass


def _parse_comment_body(body: bytes, framing: bool) -> dict:
    """Shared Vorbis-comment wire format (vendor + key=value list,
    all u32le lengths). `framing` = Vorbis's trailing framing bit."""
    out = {"vendor": None, "tags": {}}
    if len(body) < 8:
        raise OggError("short comment header")
    (vlen,) = struct.unpack("<I", body[:4])
    pos = 4
    if pos + vlen + 4 > len(body):
        raise OggError("vendor overruns packet")
    out["vendor"] = body[pos:pos + vlen].decode("utf-8", "replace")
    pos += vlen
    (n,) = struct.unpack("<I", body[pos:pos + 4])
    pos += 4
    if n > 1024:
        raise OggError("comment count cap")
    for _ in range(n):
        if pos + 4 > len(body):
            raise OggError("truncated comment list")
        (clen,) = struct.unpack("<I", body[pos:pos + 4])
        pos += 4
        if pos + clen > len(body):
            raise OggError("comment overruns packet")
        item = body[pos:pos + clen].decode("utf-8", "replace")
        pos += clen
        if "=" in item:
            k, v = item.split("=", 1)
            out["tags"].setdefault(k.upper(), v)
    if framing and (pos >= len(body) or not body[pos] & 1):
        raise OggError("missing comment framing bit")
    return out


def parse_ogg(raw: bytes) -> dict:
    """Ogg bytes -> {codec, channels, sample_rate, n_pages, n_packets,
    last_granule, duration_ms, pre_skip, title, artist, vendor,
    serial}. Raises OggError on structural damage (bad capture, CRC
    mismatch, malformed codec headers)."""
    pos = 0
    n_pages = 0
    n_packets = 0
    last_granule = None
    serial0 = None
    packets: list[bytes] = []  # first two logical packets only
    pending = b""
    while pos < len(raw):
        if n_pages >= MAX_PAGES:
            raise OggError("page cap")
        if pos + 27 > len(raw):
            raise OggError("truncated page header")
        if raw[pos:pos + 4] != b"OggS":
            raise OggError("lost capture pattern")
        (version, htype, granule, serial, _seq, crc, nsegs) = struct.unpack(
            "<BBqIIIB", raw[pos + 4:pos + 27])
        if version != 0:
            raise OggError(f"ogg version {version}")
        table = raw[pos + 27:pos + 27 + nsegs]
        if len(table) < nsegs:
            raise OggError("truncated segment table")
        body_len = sum(table)
        page_end = pos + 27 + nsegs + body_len
        if page_end > len(raw):
            raise OggError("truncated page body")
        page = raw[pos:page_end]
        if _ogg_crc(page[:22] + b"\x00\x00\x00\x00" + page[26:]) != crc:
            raise OggError("page CRC mismatch")
        if serial0 is None:
            serial0 = serial
        if serial == serial0:
            # packet reassembly: 255 continues, <255 (incl. 0) ends
            if not (htype & 0x01):
                pending = b""  # fresh packet starts this page
            seg_pos = pos + 27 + nsegs
            for lace in table:
                pending += raw[seg_pos:seg_pos + lace]
                seg_pos += lace
                if lace < 255:
                    n_packets += 1
                    if len(packets) < 2:
                        packets.append(pending)
                    pending = b""
            # granule -1 marks a page whose packets all continue
            if granule != -1:
                last_granule = granule
        n_pages += 1
        pos = page_end
    if n_pages == 0:
        raise OggError("no pages")
    out = {"codec": "unknown", "channels": None, "sample_rate": None,
           "n_pages": n_pages, "n_packets": n_packets,
           "last_granule": last_granule, "duration_ms": None,
           "pre_skip": None, "title": None, "artist": None,
           "vendor": None, "serial": serial0}
    first = packets[0] if packets else b""
    comment = {"vendor": None, "tags": {}}
    if first[:7] == b"\x01vorbis":
        if len(first) < 30:
            raise OggError("short vorbis id header")
        (ver, ch, rate) = struct.unpack("<IBI", first[7:16])
        if ver != 0 or ch == 0 or rate == 0:
            raise OggError("bad vorbis id header")
        out["codec"] = "vorbis"
        out["channels"] = ch
        out["sample_rate"] = rate
        if last_granule:
            out["duration_ms"] = (last_granule * 1000) // rate
        if len(packets) > 1 and packets[1][:7] == b"\x03vorbis":
            comment = _parse_comment_body(packets[1][7:], framing=True)
    elif first[:8] == b"OpusHead":
        if len(first) < 19:
            raise OggError("short OpusHead")
        (ver, ch, pre_skip, in_rate) = struct.unpack("<BBHI", first[8:16])
        if (ver >> 4) != 0 or ch == 0:  # major version must be 0
            raise OggError("bad OpusHead")
        out["codec"] = "opus"
        out["channels"] = ch
        out["sample_rate"] = in_rate  # informational original rate
        out["pre_skip"] = pre_skip
        if last_granule:
            # Opus granules always tick at 48 kHz regardless of rate
            out["duration_ms"] = max(last_granule - pre_skip, 0) * 1000 \
                // 48000
        if len(packets) > 1 and packets[1][:8] == b"OpusTags":
            comment = _parse_comment_body(packets[1][8:], framing=False)
    out["vendor"] = comment["vendor"]
    out["title"] = comment["tags"].get("TITLE")
    out["artist"] = comment["tags"].get("ARTIST")
    return out


def _lacing(n: int) -> bytes:
    """Lacing values for one packet of n bytes (255-run + terminator)."""
    return b"\xff" * (n // 255) + bytes([n % 255])


def build_page(payload_packets: list, granule: int, serial: int,
               seq: int, htype: int = 0) -> bytes:
    """Test-side encoder: one Ogg page holding whole packets, with the
    real CRC."""
    table = b"".join(_lacing(len(p)) for p in payload_packets)
    if len(table) > 255:
        raise OggError("too many segments for one page")
    body = b"".join(payload_packets)
    head = b"OggS" + struct.pack("<BBqIIIB", 0, htype, granule, serial,
                                 seq, 0, len(table)) + table
    crc = _ogg_crc(head + body)
    return head[:22] + struct.pack("<I", crc) + head[26:] + body


def build_ogg(codec: str = "vorbis", sample_rate: int = 44100,
              channels: int = 2, n_samples: int = 44100,
              title: str = None, artist: str = None,
              serial: int = 0x5A50, n_data_pages: int = 2,
              pre_skip: int = 312) -> bytes:
    """Deterministic test-side Ogg stream: BOS id-header page, comment
    page, `n_data_pages` junk-payload data pages with advancing
    granules, EOS on the last. Audio payload bytes are opaque junk —
    the parser never decodes them (honest codec stub), but every page
    is structurally real (lacing + CRC)."""
    if codec == "vorbis":
        ident = b"\x01vorbis" + struct.pack("<IBI", 0, channels,
                                            sample_rate) + \
            struct.pack("<iii", -1, 128000, -1) + b"\xb8\x01"
        cprefix, framing = b"\x03vorbis", True
    elif codec == "opus":
        ident = b"OpusHead" + struct.pack("<BBHIhB", 1, channels,
                                          pre_skip, sample_rate, 0, 0)
        cprefix, framing = b"OpusTags", False
    else:
        raise OggError(f"unknown codec {codec}")
    vendor = b"zpdfspark-testenc"
    tags = []
    if title is not None:
        tags.append(f"TITLE={title}".encode("utf-8"))
    if artist is not None:
        tags.append(f"ARTIST={artist}".encode("utf-8"))
    cbody = struct.pack("<I", len(vendor)) + vendor + \
        struct.pack("<I", len(tags))
    for t in tags:
        cbody += struct.pack("<I", len(t)) + t
    if framing:
        cbody += b"\x01"
    pages = [build_page([ident], 0, serial, 0, htype=0x02),
             build_page([cprefix + cbody], 0, serial, 1)]
    # data pages: deterministic junk payloads, granule = cumulative
    # samples (opus granules tick at 48 kHz and include pre-skip)
    total = n_samples if codec == "vorbis" else \
        (n_samples * 48000) // sample_rate + pre_skip
    for i in range(n_data_pages):
        granule = total * (i + 1) // n_data_pages
        payload = bytes((j * 73 + i * 31) & 0xFF
                        for j in range(300 + 100 * i))
        pages.append(build_page(
            [payload], granule, serial, 2 + i,
            htype=0x04 if i == n_data_pages - 1 else 0))
    return b"".join(pages)
