"""Minimal MPEG-1 Layer III (MP3) frame-header parser for the
multimodal kernel.

Header walk only: sync scan, bitrate/sample-rate tables, per-frame
length arithmetic, ID3v2 skip, ID3v1 tail tolerance — summing frames
gives the stream duration and mean bitrate WITHOUT any audio decode
(the huffman + IMDCT + synthesis filterbank stays honestly stubbed in
spark/media.py; no codec libs in this container). This is the metadata
layer a crawl pipeline extracts from audio without codecs: duration,
rate, channel mode, VBR-aware frame count.

Contract mirrors kernel/mp4.py: malformed input raises Mp3Error;
callers treat a failed parse as data, never as a task failure.
"""

from __future__ import annotations

import struct

MAX_FRAMES = 1_000_000

# Layer III bitrate tables (kbps); index 0 = "free", 15 = bad.
# MPEG-2 and MPEG-2.5 share the low-rate table (ISO 13818-3 annex) —
# the low-bitrate podcast/voice shape common in crawls (round 5).
_BITRATES_V1 = (0, 32, 40, 48, 56, 64, 80, 96, 112, 128,
                160, 192, 224, 256, 320)
_BITRATES_V2 = (0, 8, 16, 24, 32, 40, 48, 56, 64, 80,
                96, 112, 128, 144, 160)
# sample-rate tables by version-field value (index 3 = reserved):
# version bits: 00 = MPEG-2.5, 01 = reserved, 10 = MPEG-2, 11 = MPEG-1
_SAMPLE_RATES = {
    3: (44100, 48000, 32000),   # MPEG-1
    2: (22050, 24000, 16000),   # MPEG-2
    0: (11025, 12000, 8000),    # MPEG-2.5
}
# Layer III samples/frame: 1152 (MPEG-1) vs 576 (MPEG-2/2.5), which
# also halves the frame-length coefficient (samples/8 = 144 vs 72)
_SPF = {3: 1152, 2: 576, 0: 576}


class Mp3Error(Exception):
    pass


def _skip_id3v2(raw: bytes) -> int:
    """ID3v2 header: 'ID3' + ver(2) + flags + 28-bit syncsafe size."""
    if raw[:3] != b"ID3":
        return 0
    if len(raw) < 10:
        raise Mp3Error("truncated ID3v2 header")
    b = raw[6:10]
    if any(x & 0x80 for x in b):
        raise Mp3Error("bad ID3v2 syncsafe size")
    size = (b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]
    end = 10 + size
    if end > len(raw):
        raise Mp3Error("ID3v2 tag exceeds file")
    return end


def parse_id3v2_frames(raw: bytes) -> dict:
    """ID3v2.3/2.4 TEXT frames (round 4 — the metadata a crawl keeps
    for audio): walks the tag's frames and returns {title, artist,
    album} from TIT2/TPE1/TALB (None when absent). Text-frame payload
    = encoding byte + text: 0 latin-1, 1 utf-16 with BOM, 2 utf-16-be,
    3 utf-8 (informal spec §4.2). v2.4 frame sizes are syncsafe,
    v2.3 plain big-endian. Never raises on in-tag garbage — a
    malformed frame ends the walk (tags are best-effort data); only a
    truncated/absent tag header yields the empty dict."""
    out = {"title": None, "artist": None, "album": None}
    if raw[:3] != b"ID3" or len(raw) < 10:
        return out
    major = raw[3]
    b = raw[6:10]
    if any(x & 0x80 for x in b):
        return out
    tag_end = min(10 + ((b[0] << 21) | (b[1] << 14) | (b[2] << 7) | b[3]),
                  len(raw))
    pos = 10
    want = {b"TIT2": "title", b"TPE1": "artist", b"TALB": "album"}
    while pos + 10 <= tag_end:
        fid = raw[pos:pos + 4]
        if fid == b"\x00\x00\x00\x00":
            break  # padding
        sz = raw[pos + 4:pos + 8]
        if major >= 4:
            if any(x & 0x80 for x in sz):
                break
            size = (sz[0] << 21) | (sz[1] << 14) | (sz[2] << 7) | sz[3]
        else:
            size = struct.unpack(">I", sz)[0]
        body = raw[pos + 10:pos + 10 + size]
        if len(body) < size:
            break
        key = want.get(fid)
        if key is not None and size >= 1:
            enc, text = body[0], body[1:]
            try:
                if enc == 0:
                    val = text.decode("latin-1")
                elif enc == 1:
                    val = text.decode("utf-16")
                elif enc == 2:
                    val = text.decode("utf-16-be")
                elif enc == 3:
                    val = text.decode("utf-8")
                else:
                    val = None
            except UnicodeDecodeError:
                val = None
            if val is not None:
                out[key] = val.rstrip("\x00") or None
        pos += 10 + size
    return out


def parse_mp3(raw: bytes) -> dict:
    """raw MP3 bytes -> {n_frames, sample_rate, channels, duration_ms,
    mean_bitrate_kbps}. MPEG-1/2/2.5 Layer III (round 5 widened:
    MPEG-2/2.5 are the low-bitrate podcast/voice files crawls carry);
    other layers and the reserved version raise Mp3Error. VBR streams
    sum per-frame bitrates."""
    pos = _skip_id3v2(raw)
    n = len(raw)
    if n - pos >= 128 and raw[n - 128 : n - 125] == b"TAG":
        n -= 128  # ID3v1 tail
    n_frames = 0
    sample_rate = None
    channels = None
    total_kbps = 0
    while pos < n:
        if n - pos < 4:
            break  # trailing padding shorter than a header
        h = struct.unpack(">I", raw[pos : pos + 4])[0]
        if (h >> 21) != 0x7FF:
            # Real MP3s commonly carry APEv2 tags, Lyrics3 blocks, or
            # junk after the last frame; once at least one frame parsed,
            # treat sync loss as end-of-stream rather than an error.
            if n_frames:
                break
            raise Mp3Error(f"lost sync at byte {pos}")
        version = (h >> 19) & 3
        layer = (h >> 17) & 3
        if version == 1:
            raise Mp3Error("reserved MPEG version")
        if layer != 1:  # Layer III only
            raise Mp3Error("only Layer III supported")
        br_idx = (h >> 12) & 0xF
        sr_idx = (h >> 10) & 3
        padding = (h >> 9) & 1
        mode = (h >> 6) & 3
        if br_idx in (0, 15):
            raise Mp3Error("free/bad bitrate index")
        if sr_idx == 3:
            raise Mp3Error("reserved sample-rate index")
        kbps = (_BITRATES_V1 if version == 3 else _BITRATES_V2)[br_idx]
        sr = _SAMPLE_RATES[version][sr_idx]
        if sample_rate is None:
            stream_version = version
            sample_rate = sr
            channels = 1 if mode == 3 else 2
        elif version != stream_version:
            raise Mp3Error("MPEG version changes mid-stream")
        elif sr != sample_rate:
            raise Mp3Error("sample rate changes mid-stream")
        coeff = 144 if version == 3 else 72
        frame_len = (coeff * kbps * 1000) // sr + padding
        if frame_len < 4 or pos + frame_len > n:
            raise Mp3Error("truncated frame")
        total_kbps += kbps
        n_frames += 1
        if n_frames > MAX_FRAMES:
            raise Mp3Error("too many frames")
        pos += frame_len
    if not n_frames:
        raise Mp3Error("no MP3 frames")
    duration_ms = n_frames * _SPF[stream_version] * 1000 // sample_rate
    tags = parse_id3v2_frames(raw)
    return {
        "n_frames": n_frames, "sample_rate": sample_rate,
        "channels": channels, "duration_ms": duration_ms,
        "mean_bitrate_kbps": total_kbps // n_frames,
        "title": tags["title"], "artist": tags["artist"],
        "album": tags["album"],
    }


def encode_mp3(frame_brs: list, sr_idx: int, stereo: bool = True,
               id3_bytes: int = 0, id3_frames: dict = None,
               id3_encoding: int = 3, version: int = 3) -> bytes:
    """Minimal muxer for fixtures/tests — valid Layer III frame
    headers with zeroed (silent) payloads, one per entry of
    `frame_brs` (bitrate-table indices, so VBR streams are one list
    away), optionally prefixed with an ID3v2 tag of `id3_bytes`
    padding payload and/or real v2.3 TEXT frames (`id3_frames` maps
    frame ids like 'TIT2' to strings; `id3_encoding` 0 latin-1 /
    1 utf-16 / 3 utf-8). `version` is the header field value: 3
    MPEG-1 (default), 2 MPEG-2, 0 MPEG-2.5. The independent
    direction against parse_mp3/parse_id3v2_frames."""
    out = bytearray()
    if id3_bytes or id3_frames:
        payload = bytearray()
        for fid, text in (id3_frames or {}).items():
            if id3_encoding == 0:
                enc = text.encode("latin-1")
            elif id3_encoding == 1:
                enc = text.encode("utf-16")  # BOM included
            else:
                enc = text.encode("utf-8")
            body = bytes([id3_encoding]) + enc
            payload += fid.encode("ascii") + struct.pack(">I", len(body))
            payload += b"\x00\x00" + body
        payload += bytes(id3_bytes)
        size = len(payload)
        out += b"ID3\x03\x00\x00" + bytes((
            (size >> 21) & 0x7F, (size >> 14) & 0x7F,
            (size >> 7) & 0x7F, size & 0x7F))
        out += payload
    sr = _SAMPLE_RATES[version][sr_idx]
    table = _BITRATES_V1 if version == 3 else _BITRATES_V2
    coeff = 144 if version == 3 else 72
    for i, br_idx in enumerate(frame_brs):
        padding = i % 2  # exercise the padding bit
        mode = 0 if stereo else 3
        h = ((0x7FF << 21) | (version << 19) | (1 << 17) | (1 << 16)
             | (br_idx << 12) | (sr_idx << 10) | (padding << 9)
             | (mode << 6))
        frame_len = (coeff * table[br_idx] * 1000) // sr + padding
        out += struct.pack(">I", h) + bytes(frame_len - 4)
    return bytes(out)
