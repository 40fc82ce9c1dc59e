"""RTF text extraction — the legacy rich-text payload crawls still
carry (old Office exports, email attachments, government documents).

A from-scratch tokenizer over the RTF 1.x control language:

- control words ``\\word`` with an optional signed numeric parameter
  and one optional trailing space (consumed, per spec §"Control Word");
- control symbols ``\\X`` (one non-alphanumeric char);
- group braces ``{`` / ``}`` with a proper state stack;
- plain text runs.

Extraction semantics (the subset that decides visible text):

- ``\\par`` and ``\\line`` emit newline, ``\\tab`` tab, ``\\page``
  the engine's \\x0c page separator (the PDF page-join rule);
- ``\\'hh`` is a byte in the document codepage (cp1252 unless
  ``\\ansicpgN`` names another supported one);
- ``\\uN`` is a signed 16-bit Unicode scalar followed by exactly
  ``uc`` fallback characters to SKIP (``\\ucN`` sets it, default 1,
  scoped to the group — the classic interop trap: readers that
  ignore ``uc`` double every non-ASCII char);
- ``\\~`` is a non-breaking space, ``\\_`` a non-breaking hyphen,
  ``\\-`` an optional hyphen (invisible), ``\\{ \\} \\\\`` literal;
- destination groups that hold no document text are skipped whole:
  fonttbl/colortbl/stylesheet/info/pict and every starred
  ``{\\*\\...}`` destination — EXCEPT ``{\\info{\\title ...}}``,
  which is mined for metadata while staying out of the text.

DoS posture matches the other kernels: nesting and token caps raise
RtfError; callers treat that as data, not a task failure.
"""

from __future__ import annotations

import re

_MAX_DEPTH = 128
_MAX_TOKENS = 2_000_000


class RtfError(ValueError):
    pass


_CW = re.compile(rb"\\([a-z]{1,32})(-?\d{1,10})? ?", re.I)
# destinations whose content is never document text
_SKIP_DESTS = {
    b"fonttbl", b"colortbl", b"stylesheet", b"pict", b"object",
    b"header", b"footer", b"headerl", b"headerr", b"footerl",
    b"footerr", b"ftnsep", b"themedata", b"colorschememapping",
    b"listtable", b"listoverridetable", b"revtbl", b"generator",
}

_CODEPAGES = {1250: "cp1250", 1251: "cp1251", 1252: "cp1252",
              1253: "cp1253", 1254: "cp1254", 1257: "cp1257",
              850: "cp850", 437: "cp437"}


def is_rtf(raw: bytes) -> bool:
    return raw[:5] == b"{\\rtf"


def parse_rtf(raw: bytes) -> dict:
    """Extract visible text + metadata from RTF bytes.

    Returns {text, n_paragraphs, title}; raises RtfError when the
    input is not RTF or trips a structural cap."""
    if not is_rtf(raw):
        raise RtfError("missing {\\rtf header")

    codec = "cp1252"
    out: list = []
    # group state: (uc, skipping, in_info, in_title)
    uc, skipping, in_info, in_title = 1, False, False, False
    stack: list = []
    title: list = []
    pending_skip = 0            # \uN fallback chars still to swallow
    n_par = 0
    i, n, ntok = 0, len(raw), 0

    def emit(s: str) -> None:
        if in_title:
            title.append(s)
        elif not skipping and not in_info:
            out.append(s)

    while i < n:
        ntok += 1
        if ntok > _MAX_TOKENS:
            raise RtfError("token cap exceeded")
        c = raw[i:i + 1]
        if c == b"{":
            if len(stack) >= _MAX_DEPTH:
                raise RtfError("group nesting cap exceeded")
            stack.append((uc, skipping, in_info, in_title))
            i += 1
            continue
        if c == b"}":
            if stack:
                uc, skipping, in_info, in_title = stack.pop()
            i += 1
            continue
        if c == b"\\":
            nxt = raw[i + 1:i + 2]
            if nxt == b"'":
                b = raw[i + 2:i + 4]
                i += 4
                if pending_skip > 0:
                    pending_skip -= 1
                    continue
                try:
                    emit(bytes.fromhex(b.decode("ascii")).decode(codec))
                except ValueError:
                    pass
                continue
            if nxt == b"*":
                # starred destination: skipped unless a later control
                # word re-qualifies it (none of the skip exceptions
                # are starred, so plain skip is correct here)
                skipping = True
                i += 2
                continue
            if nxt in (b"{", b"}", b"\\"):
                if pending_skip > 0:
                    pending_skip -= 1
                else:
                    emit(nxt.decode("ascii"))
                i += 2
                continue
            if nxt == b"~":
                emit("\u00a0")
                i += 2
                continue
            if nxt == b"_":
                emit("-")
                i += 2
                continue
            if nxt == b"-":
                i += 2
                continue
            m = _CW.match(raw, i)
            if not m:
                i += 2          # unknown control symbol: ignore
                continue
            word = m.group(1).lower()
            param = int(m.group(2)) if m.group(2) else None
            i = m.end()
            if word == b"u" and param is not None:
                cp = param + 65536 if param < 0 else param
                emit(chr(cp) if 0 <= cp < 0x110000 else "\ufffd")
                pending_skip = uc
                continue
            if word == b"uc":
                uc = max(0, param or 0)
                continue
            if word in (b"par", b"line"):
                emit("\n")
                if word == b"par":
                    n_par += 1
                continue
            if word == b"tab":
                emit("\t")
                continue
            if word == b"page":
                emit("\x0c")
                continue
            if word == b"ansicpg" and param in _CODEPAGES:
                codec = _CODEPAGES[param]
                continue
            if word in _SKIP_DESTS:
                skipping = True
                continue
            if word == b"info":
                in_info = True
                continue
            if word == b"title" and in_info:
                in_title = True
                continue
            continue            # formatting control word: no text
        if c in b"\r\n\x00":
            i += 1
            continue
        # plain text run up to the next structural character
        j = i
        while j < n and raw[j] not in b"\\{}\r\n\x00":
            j += 1
        run = raw[i:j]
        i = j
        if pending_skip > 0:
            take = min(pending_skip, len(run))
            pending_skip -= take
            run = run[take:]
        if run:
            emit(run.decode(codec, "replace"))

    return {
        "text": "".join(out),
        "n_paragraphs": n_par,
        "title": "".join(title).strip() or None,
    }
