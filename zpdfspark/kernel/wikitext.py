"""MediaWiki XML-export wikitext reduction — from scratch.

Wikipedia is a marquee LLM training corpus (the Pile / RedPajama /
Dolma wiki slices are produced by exactly this reduction — the
WikiExtractor lineage). Crawls carry the XML shape directly:
Special:Export pages and the dump mirrors' ``<mediawiki>`` files.

Deliberately scoped, documented so the claim is honest:

- pages are the ``<page>`` elements; REDIRECT pages (a ``<redirect``
  element in the page, or a body starting ``#REDIRECT``) count in the
  census but contribute NO text (WikiExtractor skips them)
- per page: title + newline + reduced body; pages join with ``\\x0c``
  (the PDF page-join rule)
- the ``<text>`` node's XML entities unescape once (``&amp;`` etc. —
  the export layer's escaping); entities the WIKITEXT itself carries
  after that are left alone (one documented unescape, not a loop)
- reduction over the unescaped wikitext:

  - HTML comments dropped
  - ``<ref>..</ref>`` and self-closing ``<ref/>`` dropped (citations
    are markup, not prose — the WikiExtractor convention)
  - ``{{ templates }}`` dropped, nesting-aware (an unterminated
    opener drops to end of text — tolerant, never raises)
  - ``{| tables |}`` dropped, nesting-aware
  - ``[[File:..]]`` / ``[[Image:..]]`` / ``[[Category:..]]`` dropped
    whole, nesting-aware (thumbnail captions embed ``[[links]]``)
  - ``[[target|label]]`` -> label; ``[[target]]`` -> target
  - ``[http://url label]`` -> label; bare ``[http://url]`` dropped
  - bold/italic quote runs (``'''''``, ``'''``, ``''``) removed
  - ``== Heading ==`` -> Heading on its own line
  - list/indent markers (``* # : ;`` runs) stripped at line start
  - residual short inline tags (``<br/>``, ``<small>`` ...) stripped
  - lines whitespace-collapsed; blank lines dropped; joined newline

Census fields (n_pages, n_redirects, first_title, n_refs) are defined
by the exact regexes below so the DuckDB oracle can re-mine the same
bytes with the IDENTICAL patterns (the tex_meta/svg_meta two-engine
posture); n_refs counts the XML-escaped ``&lt;ref`` spelling because
that is how refs appear inside an export's text nodes.

Tolerant-open: never raises past WikiError.
"""

from __future__ import annotations

import html as html_mod
import re
from typing import Dict, List

_MAX_BYTES = 64 << 20
_MAX_PAGES = 10_000


class WikiError(Exception):
    pass


# the two-engine census regexes — mirrored verbatim in the DuckDB
# oracle (__spark_entry__.oracle_sql()["wiki_meta"])
_PAGE_RE = re.compile(r"<page>")
_REDIRECT_RE = re.compile(r"<redirect")
_TITLE_RE = re.compile(r"<title>([^<]*)</title>")
_REF_COUNT_RE = re.compile(r"&lt;ref")

_TEXT_NODE_RE = re.compile(r"<text[^>]*>(.*?)</text>", re.S)
_COMMENT_RE = re.compile(r"<!--.*?-->", re.S)
_REF_PAIR_RE = re.compile(r"<ref[^>/]*>.*?</ref>", re.S)
_REF_SELF_RE = re.compile(r"<ref[^>]*/>")
_ILINK_LABEL_RE = re.compile(r"\[\[(?:[^\[\]|]*)\|([^\[\]]*)\]\]")
_ILINK_RE = re.compile(r"\[\[([^\[\]]*)\]\]")
_ELINK_LABEL_RE = re.compile(r"\[(?:https?|ftp)://[^\s\]]+ ([^\]]*)\]")
_ELINK_RE = re.compile(r"\[(?:https?|ftp)://[^\s\]]+\]")
_HEADING_RE = re.compile(r"^(={2,6})\s*(.*?)\s*\1\s*$")
_LIST_RE = re.compile(r"^[*#:;]+\s*")
_INLINE_TAG_RE = re.compile(r"</?[A-Za-z][^>]{0,64}>")


def looks_like_wiki(raw: bytes) -> bool:
    """MediaWiki XML-export sniff — must run BEFORE looks_like_html in
    any dispatch (export XML satisfies the generous html head check)."""
    head = raw[:512].lstrip(b"\xef\xbb\xbf \t\r\n")
    if not head.startswith(b"<"):
        return False
    return b"<mediawiki" in head


def _drop_nested(s: str, opener: str, closer: str) -> str:
    """Remove nesting-aware opener..closer spans; an unterminated
    opener drops to end of string (tolerant posture)."""
    out: List[str] = []
    pos = 0
    n = len(s)
    while pos < n:
        start = s.find(opener, pos)
        if start < 0:
            out.append(s[pos:])
            break
        out.append(s[pos:start])
        depth = 1
        cur = start + len(opener)
        while depth and cur < n:
            nxt_open = s.find(opener, cur)
            nxt_close = s.find(closer, cur)
            if nxt_close < 0:
                cur = n  # unterminated: drop to end
                break
            if 0 <= nxt_open < nxt_close:
                depth += 1
                cur = nxt_open + len(opener)
            else:
                depth -= 1
                cur = nxt_close + len(closer)
        pos = cur
    return "".join(out)


_MEDIA_PREFIX_RE = re.compile(r"\[\[\s*(file|image|category)\s*:",
                              re.I)


def _drop_media_links(s: str) -> str:
    """Remove [[File:..]] / [[Image:..]] / [[Category:..]] spans with
    bracket-nesting awareness (captions embed [[links]])."""
    out: List[str] = []
    pos = 0
    n = len(s)
    while pos < n:
        m = _MEDIA_PREFIX_RE.search(s, pos)
        if not m:
            out.append(s[pos:])
            break
        out.append(s[pos:m.start()])
        depth = 1
        cur = m.end()
        while depth and cur < n:
            nxt_open = s.find("[[", cur)
            nxt_close = s.find("]]", cur)
            if nxt_close < 0:
                cur = n
                break
            if 0 <= nxt_open < nxt_close:
                depth += 1
                cur = nxt_open + 2
            else:
                depth -= 1
                cur = nxt_close + 2
        pos = cur
    return "".join(out)


def reduce_wikitext(wt: str) -> str:
    """The scoped reduction documented in the module docstring."""
    wt = _COMMENT_RE.sub("", wt)
    wt = _REF_PAIR_RE.sub("", wt)
    wt = _REF_SELF_RE.sub("", wt)
    wt = _drop_nested(wt, "{{", "}}")
    wt = _drop_nested(wt, "{|", "|}")
    wt = _drop_media_links(wt)
    wt = _ILINK_LABEL_RE.sub(r"\1", wt)
    wt = _ILINK_RE.sub(r"\1", wt)
    wt = _ELINK_LABEL_RE.sub(r"\1", wt)
    wt = _ELINK_RE.sub("", wt)
    wt = wt.replace("'''''", "").replace("'''", "").replace("''", "")
    lines: List[str] = []
    for ln in wt.split("\n"):
        m = _HEADING_RE.match(ln)
        if m:
            ln = m.group(2)
        else:
            ln = _LIST_RE.sub("", ln)
        ln = _INLINE_TAG_RE.sub("", ln)
        ln = " ".join(ln.split())
        if ln:
            lines.append(ln)
    return "\n".join(lines)


def parse_wiki(raw: bytes) -> Dict[str, object]:
    """Parse a MediaWiki XML export: census + reduced text.

    Returns {n_pages, n_redirects, first_title, n_refs, text}."""
    if len(raw) > _MAX_BYTES:
        raise WikiError("export too large")
    if not looks_like_wiki(raw):
        raise WikiError("not a mediawiki export")
    s = raw.decode("utf-8", "replace")
    n_pages = len(_PAGE_RE.findall(s))
    n_redirects = len(_REDIRECT_RE.findall(s))
    tm = _TITLE_RE.search(s)
    first_title = tm.group(1) if tm else ""
    n_refs = len(_REF_COUNT_RE.findall(s))

    page_texts: List[str] = []
    pos = 0
    pages = 0
    while pages < _MAX_PAGES:
        start = s.find("<page>", pos)
        if start < 0:
            break
        end = s.find("</page>", start)
        if end < 0:
            end = len(s)
        chunk = s[start:end]
        pos = end + 7
        pages += 1
        if "<redirect" in chunk:
            continue
        t = _TITLE_RE.search(chunk)
        title = html_mod.unescape(t.group(1)) if t else ""
        tn = _TEXT_NODE_RE.search(chunk)
        body = html_mod.unescape(tn.group(1)) if tn else ""
        if body.lstrip()[:9].lower() == "#redirect":
            continue
        reduced = reduce_wikitext(body)
        page_texts.append(title + "\n" + reduced if reduced else title)
    return {
        "n_pages": n_pages,
        "n_redirects": n_redirects,
        "first_title": first_title,
        "n_refs": n_refs,
        "text": "\x0c".join(page_texts),
    }
