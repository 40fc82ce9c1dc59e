"""SRT / WebVTT subtitle extraction — from scratch.

Subtitle files are a first-class LLM-training text source (the
OpenSubtitles / YouTube-caption lineage) and crawls carry both
formats as standalone payloads. This implements the subset real
subtitle files need:

- SRT: numbered cue blocks separated by blank lines, timings
  `HH:MM:SS,mmm --> HH:MM:SS,mmm` (comma milliseconds); the index
  line is optional in the wild (tolerated), coordinates after the
  end timestamp (X1:.. — the DVD rip shape) are ignored
- WebVTT: `WEBVTT` magic (BOM tolerated), header metadata until the
  first blank line, NOTE/STYLE/REGION blocks skipped, optional cue
  identifier lines, timings `[HH:]MM:SS.mmm --> ..` (dot
  milliseconds, hours optional) with cue settings after the end
  ignored
- cue text: inline markup stripped — HTML-ish tags (<i>, <b>,
  <font ..>, <c.class>, <v Speaker>), mid-cue VTT timestamps
  (<00:00:01.000>, karaoke style), ASS-style {\\an8} overrides —
  then entity-unescaped; cue lines join with newline, cues join
  with newline (the transcript reduction)

Tolerant-open: a malformed cue block is skipped, never raises past
SubtitleError. DoS caps bound cue count. The independent oracle is
the fixtures-side flat regex re-read (fixtures._subtitle_expected),
deliberately NOT this line-state machine.
"""

from __future__ import annotations

import html as html_mod
import re
from typing import List, Optional, Tuple

_MAX_CUES = 100_000

class SubtitleError(Exception):
    pass


_SRT_TIME = re.compile(
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})\s*-->\s*"
    r"(\d{1,2}):(\d{2}):(\d{2})[,.](\d{3})")
_VTT_TIME = re.compile(
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})\s*-->\s*"
    r"(?:(\d{1,2}):)?(\d{2}):(\d{2})\.(\d{3})")
_TAG = re.compile(r"<[^>\n]*>")
_ASS_OVERRIDE = re.compile(r"\{\\[^}\n]*\}")


def looks_like_srt(raw: bytes) -> bool:
    head = raw[:256].lstrip(b"\xef\xbb\xbf\r\n ")
    lines = head.split(b"\n", 2)
    if not lines or not lines[0].strip().isdigit():
        return False
    return len(lines) > 1 and b"-->" in lines[1]


def looks_like_vtt(raw: bytes) -> bool:
    head = raw[:16].lstrip(b"\xef\xbb\xbf")
    return head[:6] == b"WEBVTT" and head[6:7] in (b"", b"\r", b"\n",
                                                   b" ", b"\t")


def _ms(h, m, s, ms) -> int:
    return ((int(h or 0) * 60 + int(m)) * 60 + int(s)) * 1000 + int(ms)


def _clean(lines: List[str]) -> str:
    out = []
    for ln in lines:
        ln = _ASS_OVERRIDE.sub("", _TAG.sub("", ln))
        ln = html_mod.unescape(ln).strip()
        if ln:
            out.append(ln)
    return "\n".join(out)


def parse_srt(raw: bytes) -> dict:
    """Parse an SRT file -> {text, n_cues, duration_ms, kind}."""
    if not looks_like_srt(raw):
        raise SubtitleError("not an SRT file")
    text = raw.decode("utf-8-sig", "replace").replace("\r\n", "\n")
    cues: List[str] = []
    end_ms = 0
    for block in re.split(r"\n{2,}", text):
        lines = [ln for ln in block.split("\n")]
        # drop a leading numeric index line if present
        if lines and lines[0].strip().isdigit():
            lines = lines[1:]
        if not lines:
            continue
        m = _SRT_TIME.search(lines[0])
        if not m:
            continue
        end_ms = max(end_ms, _ms(m.group(5), m.group(6), m.group(7),
                                 m.group(8)))
        cue = _clean(lines[1:])
        if cue:
            cues.append(cue)
        if len(cues) >= _MAX_CUES:
            break
    return {"text": "\n".join(cues), "n_cues": len(cues),
            "duration_ms": end_ms, "kind": "srt"}


def parse_vtt(raw: bytes) -> dict:
    """Parse a WebVTT file -> {text, n_cues, duration_ms, kind}."""
    if not looks_like_vtt(raw):
        raise SubtitleError("not a WebVTT file")
    text = raw.decode("utf-8-sig", "replace").replace("\r\n", "\n")
    blocks = re.split(r"\n{2,}", text)
    cues: List[str] = []
    end_ms = 0
    for block in blocks[1:]:                 # blocks[0] = header
        lines = block.split("\n")
        if lines and lines[0].split(" ", 1)[0] in ("NOTE", "STYLE",
                                                   "REGION"):
            continue
        # optional cue identifier: first line without '-->'
        if lines and "-->" not in lines[0]:
            lines = lines[1:]
        if not lines:
            continue
        m = _VTT_TIME.search(lines[0])
        if not m:
            continue
        end_ms = max(end_ms, _ms(m.group(5), m.group(6), m.group(7),
                                 m.group(8)))
        cue = _clean(lines[1:])
        if cue:
            cues.append(cue)
        if len(cues) >= _MAX_CUES:
            break
    return {"text": "\n".join(cues), "n_cues": len(cues),
            "duration_ms": end_ms, "kind": "vtt"}


def parse_subtitles(raw: bytes) -> dict:
    if looks_like_vtt(raw):
        return parse_vtt(raw)
    return parse_srt(raw)
