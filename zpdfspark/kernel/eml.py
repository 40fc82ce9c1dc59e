"""MIME email (RFC 5322/2045/2047) text extraction — from scratch.

Crawls carry mailing-list archives, .eml attachments and mbox dumps
(pipermail, marc.info, gmane mirrors); list archives are a classic
LLM-training text source (the Enron/Usenet lineage). This is a
from-scratch implementation of the subset real archive mail needs:

- header block parse with RFC 5322 unfolding (continuation lines
  start with WSP), first-occurrence-wins like the PDF dict rule
- RFC 2047 encoded-words in Subject/From (=?cs?B|Q?..?=), including
  the rule that whitespace BETWEEN two encoded words is dropped;
  charsets resolve through the same WHATWG alias table the HTML
  charset sniffer uses (kernel/htmltext._CHARSET_ALIASES)
- Content-Transfer-Encoding: quoted-printable (soft breaks, =HH) and
  base64 (whitespace-tolerant), 7bit/8bit/binary identity
- multipart/* walk by boundary with depth and part-count caps (DoS
  posture shared with the other container kernels); nested
  message/rfc822 parts are counted but not descended
- text selection: every text/plain part in document order; if none,
  text/html parts reduced full-content (an email body IS the main
  content — the epub chapter rule, kernel/epub.py:12), never the
  link-density pruner
- RFC 5322 date -> epoch seconds (day-name optional, numeric zone,
  the obsolete UT/GMT/EST.. zone names)

Reference posture: tolerant-open — a malformed message extracts what
it can and never raises past EmlError; callers treat EmlError as
data. The independent oracle is the STDLIB email package re-read in
fixtures._eml_expected (writer = stdlib email.mime, reader = this).
"""

from __future__ import annotations

import base64
import binascii
import re
from typing import Dict, List, Optional, Tuple

_MAX_DEPTH = 8
_MAX_PARTS = 1000
_HEADER_WINDOW = 8192


class EmlError(Exception):
    pass


_HDR_LINE = re.compile(rb"^[!-9;-~]+:")          # field-name: (no colon/WSP)
_ENC_WORD = re.compile(
    r"=\?([^?]+)\?([bBqQ])\?([^?]*)\?=")
_WS_BETWEEN_EW = re.compile(
    r"(=\?[^?]+\?[bBqQ]\?[^?]*\?=)[ \t\r\n]+(?==\?)")
_ADDR = re.compile(r"<([^<>]+)>")
_DATE = re.compile(
    r"(?:[A-Za-z]{3},\s*)?(\d{1,2})\s+([A-Za-z]{3})\s+(\d{2,4})\s+"
    r"(\d{1,2}):(\d{2})(?::(\d{2}))?\s*([+-]\d{4}|[A-Z]{1,4})?")
_MONTHS = {m: i + 1 for i, m in enumerate(
    ["jan", "feb", "mar", "apr", "may", "jun",
     "jul", "aug", "sep", "oct", "nov", "dec"])}
# RFC 5322 §4.3 obsolete zone names (everything else reads as -0000)
_OBS_ZONES = {"UT": 0, "GMT": 0, "EST": -5 * 60, "EDT": -4 * 60,
              "CST": -6 * 60, "CDT": -5 * 60, "MST": -7 * 60,
              "MDT": -6 * 60, "PST": -8 * 60, "PDT": -7 * 60}


def _codec(label: str) -> str:
    from .htmltext import _CHARSET_ALIASES

    return _CHARSET_ALIASES.get(label.strip().lower(), "utf-8")


def is_eml(raw: bytes) -> bool:
    """Header-block sniff: the first non-blank line is a header field
    (or an mbox `From ` line precedes one), and the block before the
    first empty line names From: plus one of Subject:/Message-ID:/
    Date:. Runs BEFORE looks_like_html in dispatch — an HTML body part
    would satisfy the generous html head check."""
    head = raw[:_HEADER_WINDOW]
    if head.startswith(b"From "):        # mbox separator: not one message
        return False
    first = head.lstrip(b"\r\n")[:998].split(b"\n", 1)[0]
    if not _HDR_LINE.match(first):
        return False
    block = head.split(b"\r\n\r\n", 1)[0].split(b"\n\n", 1)[0].lower()
    if b"\nfrom:" not in b"\n" + block and not block.startswith(b"from:"):
        return False
    return any(k in b"\n" + block for k in
               (b"\nsubject:", b"\nmessage-id:", b"\ndate:"))


def _split_headers(raw: bytes) -> Tuple[List[Tuple[str, str]], bytes]:
    """(ordered header list, body). Unfolds continuations; stops at the
    first empty line. Tolerates bare-LF and CRLF line endings."""
    # a LEADING blank line means an empty header block (digest parts:
    # `--boundary\n\n<embedded message>` — real-producer sweep msg_02)
    if raw[:2] == b"\r\n":
        return [], raw[2:]
    if raw[:1] == b"\n":
        return [], raw[1:]
    for sep in (b"\r\n\r\n", b"\n\n"):
        idx = raw.find(sep)
        if idx != -1:
            head, body = raw[:idx], raw[idx + len(sep):]
            break
    else:
        head, body = raw, b""
    fields: List[Tuple[str, str]] = []
    name = None
    val: List[bytes] = []
    for line in head.split(b"\n"):
        line = line.rstrip(b"\r")
        if line[:1] in (b" ", b"\t") and name is not None:
            val.append(line.strip())
            continue
        if name is not None:
            fields.append((name, b" ".join(val).decode("utf-8", "replace")))
        name, val = None, []
        c = line.find(b":")
        if c > 0 and _HDR_LINE.match(line):
            name = line[:c].decode("ascii", "replace").lower()
            val = [line[c + 1:].strip()]
    if name is not None:
        fields.append((name, b" ".join(val).decode("utf-8", "replace")))
    return fields, body


def _header(fields: List[Tuple[str, str]], name: str) -> Optional[str]:
    for k, v in fields:                      # first occurrence wins
        if k == name:
            return v
    return None


def decode_encoded_words(value: str) -> str:
    """RFC 2047: =?charset?B|Q?payload?= runs; WSP between two encoded
    words is dropped; undecodable runs stay literal (tolerant)."""
    value = _WS_BETWEEN_EW.sub(r"\1", value)

    def one(m: re.Match) -> str:
        cs, enc, payload = m.group(1), m.group(2).lower(), m.group(3)
        try:
            if enc == "b":
                data = base64.b64decode(payload + "=" * (-len(payload) % 4))
            else:
                data = _qp_decode(
                    payload.replace("_", " ").encode("ascii", "replace"),
                    header=True)
            return data.decode(_codec(cs), "replace")
        except (binascii.Error, ValueError):
            return m.group(0)

    return _ENC_WORD.sub(one, value)


def _qp_decode(data: bytes, header: bool = False) -> bytes:
    """Quoted-printable: =HH escapes, soft line breaks (=\\n). In
    header (Q) mode there are no soft breaks. Bad escapes pass
    through literally (tolerant)."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        b = data[i]
        if b == 0x3D and i + 1 < n:          # '='
            nxt = data[i + 1:i + 3]
            if not header and data[i + 1:i + 2] in (b"\r", b"\n"):
                i += 3 if data[i + 1:i + 3] == b"\r\n" else 2
                continue
            if len(nxt) == 2:
                try:
                    out.append(int(nxt, 16))
                    i += 3
                    continue
                except ValueError:
                    pass
        out.append(b)
        i += 1
    return bytes(out)


def _decode_transfer(body: bytes, cte: str) -> bytes:
    cte = (cte or "").strip().lower()
    if cte == "base64":
        compact = re.sub(rb"[^A-Za-z0-9+/=]", b"", body)
        try:
            return base64.b64decode(compact + b"=" * (-len(compact) % 4))
        except (binascii.Error, ValueError):
            return b""
    if cte == "quoted-printable":
        return _qp_decode(body)
    return body                               # 7bit / 8bit / binary


def _content_type(fields, default: str = "text/plain"
                  ) -> Tuple[str, Dict[str, str]]:
    v = _header(fields, "content-type")
    if v is None:
        return default, {"charset": "us-ascii"}
    bits = v.split(";")
    ctype = bits[0].strip().lower()
    params: Dict[str, str] = {}
    for p in bits[1:]:
        if "=" not in p:
            continue
        k, _, pv = p.partition("=")
        k = k.strip().lower()
        pv = pv.strip().strip('"')
        if k.endswith("*"):
            # RFC 2231 extended parameter: charset''percent-encoded
            # (found live: FreeBSD-list mail spells boundary*= this
            # way; without the decode the multipart walk finds no
            # parts at all). Continuations (*0*, *1*) are out of
            # scope — real archive mail keeps boundaries short.
            k = k.rstrip("*").rstrip("0123456789").rstrip("*")
            if "''" in pv:
                pv = pv.split("''", 1)[1]
            pv = re.sub(r"%([0-9A-Fa-f]{2})",
                        lambda m: chr(int(m.group(1), 16)), pv)
        params.setdefault(k, pv)
    return ctype or default, params


def _split_multipart(body: bytes, boundary: bytes) -> List[bytes]:
    """Parts between --boundary delimiters; preamble/epilogue dropped;
    terminal --boundary-- ends the walk (RFC 2046 §5.1.1)."""
    parts: List[bytes] = []
    delim = b"--" + boundary
    chunks = re.split(rb"(?:^|\r?\n)" + re.escape(delim), body)
    for chunk in chunks[1:]:
        if chunk[:2] == b"--":               # terminal delimiter
            break
        # the delimiter line's trailing CRLF belongs to the delimiter
        chunk = chunk.split(b"\n", 1)
        parts.append(chunk[1] if len(chunk) == 2 else b"")
        if len(parts) >= _MAX_PARTS:
            break
    return parts


def _html_part_text(data: bytes) -> str:
    """Full-content reduction for text/html parts — the epub chapter
    rule (an email body IS the main content; no link-density pruning)."""
    from .epub import _xhtml_text

    return _xhtml_text(data)


def _walk(raw: bytes, depth: int, state: dict,
          default_ctype: str = "text/plain") -> None:
    """Collect (order, kind, text) leaves into state; count parts."""
    if depth > _MAX_DEPTH or state["n_parts"] >= _MAX_PARTS:
        return
    fields, body = _split_headers(raw)
    ctype, params = _content_type(fields, default_ctype)
    state["n_parts"] += 1
    if ctype.startswith("multipart/"):
        boundary = params.get("boundary", "")
        if not boundary:
            return
        # RFC 2046 §5.1.5: inside multipart/digest the part default is
        # message/rfc822, not text/plain (real-producer sweep: CPython
        # msg_02 — without this a digest reads as raw header text)
        child_default = ("message/rfc822" if ctype == "multipart/digest"
                         else "text/plain")
        for part in _split_multipart(body, boundary.encode("ascii",
                                                           "replace")):
            _walk(part, depth + 1, state, child_default)
        return
    if ctype.startswith("message/") and ctype != "message/delivery-status":
        # embedded messages (rfc822 digests/forwards, external-body):
        # descend like stdlib walk() — digest bodies ARE text
        _walk(_decode_transfer(
            body, _header(fields, "content-transfer-encoding")),
            depth + 1, state)
        return
    data = _decode_transfer(body,
                            _header(fields, "content-transfer-encoding"))
    if ctype == "text/plain":
        text = data.decode(_codec(params.get("charset", "us-ascii")),
                           "replace")
        state["plain"].append(text.replace("\r\n", "\n").strip())
    elif ctype == "text/html":
        cs = _codec(params.get("charset", "utf-8"))
        if cs not in ("utf-8",):
            data = data.decode(cs, "replace").encode("utf-8", "replace")
        state["html"].append(_html_part_text(data))


def parse_eml(raw: bytes) -> dict:
    """Parse one RFC 5322 message. Returns {text, subject, from_addr,
    date_ts, n_parts, content_type}. Tolerant-open; raises EmlError
    only when the bytes do not sniff as a message at all."""
    if not is_eml(raw):
        raise EmlError("not an RFC 5322 message")
    fields, _ = _split_headers(raw)
    state = {"plain": [], "html": [], "n_parts": 0}
    _walk(raw, 0, state)
    texts = [t for t in state["plain"] if t] or \
            [t for t in state["html"] if t]
    subject = _header(fields, "subject")
    frm = _header(fields, "from")
    return {
        "text": "\n\n".join(texts),
        "subject": decode_encoded_words(subject).strip()
        if subject is not None else None,
        "from_addr": _from_addr(frm) if frm is not None else None,
        "date_ts": parse_rfc5322_date(_header(fields, "date")),
        "n_parts": state["n_parts"],
        "content_type": _content_type(fields)[0],
    }


def _from_addr(value: str) -> str:
    m = _ADDR.search(value)
    if m:
        return m.group(1).strip()
    # old-style `addr (Display Name)` — RFC 5322 comments are not part
    # of the address (found by the CPython test_email real-producer
    # sweep: every pre-2000 message in it uses this form)
    v = re.sub(r"\([^)]*\)", "", decode_encoded_words(value)).strip()
    for tok in v.split():
        if "@" in tok:
            return tok.strip('"<>')
    return v.strip('"')


def parse_rfc5322_date(value: Optional[str]) -> Optional[int]:
    """RFC 5322 date-time -> epoch seconds (None when unparseable)."""
    if not value:
        return None
    m = _DATE.search(value)
    if not m:
        return None
    day, mon, year, hh, mm, ss, zone = m.groups()
    month = _MONTHS.get(mon.lower())
    if month is None:
        return None
    y = int(year)
    if y < 100:                               # obs-year (RFC 5322 §4.3)
        y += 1900 if y >= 50 else 2000
    try:
        from datetime import datetime, timezone

        ts = int(datetime(y, month, int(day), int(hh), int(mm),
                          int(ss or 0), tzinfo=timezone.utc).timestamp())
    except ValueError:
        return None
    if zone and zone[0] in "+-":
        sign = 1 if zone[0] == "+" else -1
        off = sign * (int(zone[1:3]) * 60 + int(zone[3:5]))
    else:
        off = _OBS_ZONES.get(zone or "", 0)
    return ts - off * 60


# ---------------------------------------------------------------- mbox

_MBOX_SEP = re.compile(rb"(?:^|\n)From [^\n]*\n")


def is_mbox(raw: bytes) -> bool:
    """mboxrd/mboxo sniff: starts with a `From ` separator line whose
    next line opens a header block."""
    if not raw.startswith(b"From "):
        return False
    rest = raw.split(b"\n", 1)
    return len(rest) == 2 and bool(_HDR_LINE.match(rest[1][:998]))


def parse_mbox(raw: bytes, max_messages: int = 10000) -> dict:
    """Census of an mbox archive (an archive of messages is not one
    document — the tar rule): message count, first subject, first
    sender, span of parseable dates. `>From ` quoting is reversed per
    mboxrd before each message parses."""
    if not is_mbox(raw):
        raise EmlError("not an mbox archive")
    msgs = _MBOX_SEP.split(raw)[1:max_messages + 1]
    n = 0
    first_subject = first_from = None
    lo = hi = None
    for m in msgs:
        if not m.strip():
            continue
        n += 1
        body = re.sub(rb"(^|\n)>(>*From )", rb"\1\2", m)
        try:
            p = parse_eml(body)
        except EmlError:
            continue
        if first_subject is None:
            first_subject = p["subject"]
            first_from = p["from_addr"]
        ts = p["date_ts"]
        if ts is not None:
            lo = ts if lo is None else min(lo, ts)
            hi = ts if hi is None else max(hi, ts)
    return {"n_messages": n, "first_subject": first_subject,
            "first_from": first_from, "min_date_ts": lo,
            "max_date_ts": hi}
