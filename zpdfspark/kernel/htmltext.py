"""HTML main-content extraction: boilerplate strip + DOM heuristics.

The input table is Common-Crawl-style; rows whose payload is HTML (not
PDF) go through this kernel (north_rule: "HTML boilerplate strip,
PDF/layout parse, DOM heuristics"). Deterministic, dependency-free
semantics (the spec for the fixture oracles):

1. drop <script>/<style>/<template>/<noscript> elements, comments,
   and the boilerplate containers <head>, <nav>, <header>, <footer>,
   <aside> (non-nested; hostile nesting degrades to tag-strip, never
   crashes)
2. source newlines are plain whitespace (HTML semantics) — normalized
   to spaces first, so tags/anchors wrapped across pretty-printed
   lines behave identically to single-line markup; block-level tags
   (p, div, br, li, tr, h1-h6, section, article, blockquote, pre,
   table) break lines; other tags are removed inline
3. entities unescaped (html.unescape); whitespace collapsed per line;
   empty lines dropped; lines joined with "\\n"
4. DOM heuristic: if a <main> or <article> element exists, extraction
   is restricted to the first such element (main-content selection);
   otherwise the whole stripped <body> (or document) is used
5. link-density pruning (the jusText/trafilatura-style boilerplate
   rule): a line whose anchor text makes up more than 2/3 of its
   visible characters (measured after entity unescape) is
   navigation/related-links boilerplate and is dropped; anchors that
   span block boundaries don't count as links
6. charset sniffing (round 4 — crawl pages are NOT all UTF-8): BOM
   first (utf-8/utf-16le/utf-16be; utf-16 transcodes to utf-8 before
   byte-domain tag processing), then <meta charset> in the spec's
   1024-byte prescan window via the WHATWG alias table (the iso-8859-1
   label MEANS windows-1252 on the web), else utf-8 with replacement
"""

from __future__ import annotations

import html as html_mod
import re

_DROP_ELEMENTS = ("script", "style", "template", "noscript",
                  "head", "nav", "header", "footer", "aside")
_DROP_RES = [
    re.compile(
        rb"<" + name.encode() + rb"\b[^>]*>.*?</" + name.encode() + rb"\s*>",
        re.DOTALL | re.IGNORECASE,
    )
    for name in _DROP_ELEMENTS
]
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.DOTALL)
_MAIN_RE = re.compile(rb"<(main|article)\b[^>]*>(.*?)</\1\s*>",
                      re.DOTALL | re.IGNORECASE)
_BODY_RE = re.compile(rb"<body\b[^>]*>(.*?)</body\s*>",
                      re.DOTALL | re.IGNORECASE)
_BLOCK_TAG_RE = re.compile(
    rb"</?(?:p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|"
    rb"blockquote|pre|main|body|html|form|figure)\b[^>]*/?>",
    re.IGNORECASE,
)
_TAG_RE = re.compile(rb"<[^>]*>")
_A_RE = re.compile(rb"<a\b[^>]*>(.*?)</a\s*>", re.IGNORECASE)
_WS_RE = re.compile(r"[ \t\r\f\v]+")
_LINK_DENSITY_MAX = 2 / 3


_META_CHARSET_RE = re.compile(
    rb"<meta\b[^>]*charset\s*=\s*[\"']?([A-Za-z0-9_.:-]+)", re.IGNORECASE)
# label -> python codec, per the WHATWG encoding registry's common web
# aliases; everything else falls through to utf-8/replace
_CHARSET_ALIASES = {
    "utf-8": "utf-8", "utf8": "utf-8",
    "iso-8859-1": "windows-1252",  # WHATWG: latin-1 label MEANS cp1252
    "latin-1": "windows-1252", "latin1": "windows-1252",
    "windows-1252": "windows-1252", "cp1252": "windows-1252",
    "iso-8859-2": "iso-8859-2", "iso-8859-15": "iso-8859-15",
    "windows-1251": "windows-1251", "koi8-r": "koi8-r",
    "gbk": "gbk", "gb2312": "gbk", "gb18030": "gb18030",
    "big5": "big5", "shift_jis": "shift_jis", "shift-jis": "shift_jis",
    "sjis": "shift_jis", "euc-jp": "euc_jp", "euc-kr": "euc_kr",
}


def sniff_charset(raw: bytes) -> str:
    """Crawl pages are NOT all UTF-8: sniff BOM first, then a <meta
    charset> / http-equiv declaration in the first 1024 bytes (the
    HTML spec's prescan window), else default utf-8. Returns a Python
    codec name; utf-16 callers must transcode before byte-domain tag
    processing (utf-16 is not ASCII-compatible)."""
    if raw[:3] == b"\xef\xbb\xbf":
        return "utf-8"
    if raw[:2] == b"\xff\xfe":
        return "utf-16-le"
    if raw[:2] == b"\xfe\xff":
        return "utf-16-be"
    m = _META_CHARSET_RE.search(raw[:1024])
    if m:
        label = m.group(1).decode("ascii", "replace").lower()
        return _CHARSET_ALIASES.get(label, "utf-8")
    return "utf-8"


def charset_report(raw: bytes):
    """Lineage view of the sniff decision: (had_bom, declared_label,
    codec). `declared_label` is the raw <meta charset>/http-equiv label
    found in the 1024-byte prescan window (lowercased, None if absent);
    `codec` is what sniff_charset resolves to (BOM first, then the
    WHATWG alias table). A curation pipeline records all three per page
    so decode decisions are auditable after the bytes are gone."""
    had_bom = (raw[:3] == b"\xef\xbb\xbf"
               or raw[:2] in (b"\xff\xfe", b"\xfe\xff"))
    m = _META_CHARSET_RE.search(raw[:1024])
    declared = m.group(1).decode("ascii", "replace").lower() if m else None
    return had_bom, declared, sniff_charset(raw)


def looks_like_html(raw: bytes) -> bool:
    if raw[:2] in (b"\xff\xfe", b"\xfe\xff"):
        # utf-16 BOM: check the transcoded head
        try:
            raw = raw.decode(
                "utf-16-le" if raw[:2] == b"\xff\xfe" else "utf-16-be",
                "replace").encode("utf-8", "replace")
        except Exception:
            return False
    head = raw[:256].lstrip(b"\xef\xbb\xbf \t\r\n")
    return head[:1] == b"<" or b"<html" in head.lower() or b"<!doctype" in head.lower()


_FEED_RSS_RE = re.compile(rb"<rss[\s>]")
_FEED_ATOM_RE = re.compile(rb"<feed[\s>]")


def looks_like_feed(raw: bytes) -> bool:
    """RSS/Atom sniff — must run BEFORE looks_like_html in any
    dispatch (feed XML satisfies the generous html head check)."""
    head = raw[:512].lstrip(b"\xef\xbb\xbf \t\r\n")
    if not head.startswith(b"<"):
        return False
    return bool(_FEED_RSS_RE.search(head) or _FEED_ATOM_RE.search(head))


def extract_main_text(raw: bytes) -> str:
    """Boilerplate-stripped main content; never raises."""
    try:
        codec = sniff_charset(raw)
        if codec.startswith("utf-16"):
            # transcode to utf-8 so the byte-domain tag regexes work
            # (utf-16 is not ASCII-compatible); drop the BOM
            raw = raw.decode(codec, "replace").lstrip("﻿").encode(
                "utf-8", "replace")
            codec = "utf-8"
        elif raw[:3] == b"\xef\xbb\xbf":
            raw = raw[3:]

        def to_text(bs: bytes) -> str:
            return html_mod.unescape(bs.decode(codec, "replace"))

        data = _COMMENT_RE.sub(b"", raw)
        for rx in _DROP_RES:
            data = rx.sub(b"", data)
        m = _MAIN_RE.search(data)
        if m:
            data = m.group(2)
        else:
            b = _BODY_RE.search(data)
            if b:
                data = b.group(1)
        # source newlines are whitespace, not breaks: normalizing them
        # first keeps tags/anchors wrapped across pretty-printed lines
        # intact for the tag and link-density regexes below
        data = data.replace(b"\r", b" ").replace(b"\n", b" ")
        data = _BLOCK_TAG_RE.sub(b"\n", data)
        lines = []
        for raw_line in data.split(b"\n"):
            stripped = _TAG_RE.sub(b"", raw_line)
            visible = to_text(stripped).strip()
            if not visible:
                continue
            # link-density pruning on UNESCAPED characters: anchors
            # fully contained in the line vs the line's visible text
            link_chars = sum(
                len(to_text(_TAG_RE.sub(b"", m)).strip())
                for m in _A_RE.findall(raw_line))
            if link_chars / len(visible) > _LINK_DENSITY_MAX:
                continue
            # &#10; entities decode to newlines: they split lines too
            for piece in visible.split("\n"):
                piece = _WS_RE.sub(" ", piece).strip()
                if piece:
                    lines.append(piece)
        return "\n".join(lines)
    except Exception:
        return ""


_TEXT_WINDOW = 4096
# bytes that keep a payload "texty": printable ASCII + common WS; high
# bytes are allowed (utf-8 multibyte) — control bytes are the signal
_CTRL = frozenset(range(0x20)) - {0x09, 0x0A, 0x0D}


def looks_like_text(raw: bytes) -> bool:
    """Plain-text sniff for the LAST dispatch slot: non-empty, no NULs,
    <0.5% control bytes and valid-enough UTF-8 in the head window.
    Every structured sniff must run first — this accepts almost any
    prose."""
    if not raw:
        return False
    head = raw[:_TEXT_WINDOW]
    if b"\x00" in head:
        return False
    ctrl = sum(1 for b in head if b in _CTRL)
    if ctrl * 200 > len(head):
        return False
    try:
        head.decode("utf-8")
    except UnicodeDecodeError:
        # a multibyte char cut at the window edge is fine; real binary
        # is not — retry without the tail fragment
        try:
            head[:-4].decode("utf-8")
        except UnicodeDecodeError:
            return False
    return True


_GZ_CAP = 256 << 20          # the filters.py decompression-bomb bound


def _gunzip_capped(raw: bytes):
    """Bounded single-member gunzip for standalone .gz payloads; None
    on corruption or when the cap is hit (bomb posture: data, not a
    task failure)."""
    import zlib

    try:
        d = zlib.decompressobj(31)
        out = d.decompress(raw, _GZ_CAP)
        if d.unconsumed_tail:
            return None
        return out
    except zlib.error:
        return None


def _bunzip2_capped(raw: bytes):
    """Bounded bzip2 decompress for standalone .bz2 payloads (same
    bomb posture as _gunzip_capped: corruption or cap -> None, never a
    task failure). bzip2 is the classic mirror/archive coding crawls
    still hit (.tar.bz2, .html.bz2 on software mirrors)."""
    import bz2

    try:
        d = bz2.BZ2Decompressor()
        out = d.decompress(raw, _GZ_CAP)
        if not d.eof:
            # cap hit mid-stream (bomb) or truncated input — either way
            # the payload is not a document we can trust
            return None
        return out
    except OSError:
        return None


def _unxz_capped(raw: bytes):
    """Bounded xz decompress for standalone .xz payloads (bomb posture
    as above). xz ships kernel sources, wikis and dataset dumps; the
    format's own integrity checks make corruption loud."""
    import lzma

    try:
        d = lzma.LZMADecompressor(format=lzma.FORMAT_XZ)
        out = d.decompress(raw, _GZ_CAP)
        if not d.eof:
            return None
        return out
    except lzma.LZMAError:
        return None


def extract_any(raw: bytes, mode: str = "accuracy", _depth: int = 0):
    """Dispatch on the payload: PDF bytes -> the PDF kernel, DOCX /
    XLSX / ODT -> the office-package walks (kernel/{docx,xlsx,odt}.py,
    r5), EPUB -> the spine walk (kernel/epub.py, r5), HTML ->
    boilerplate strip. Standalone gzip payloads (.html.gz / .txt.gz /
    .tar.gz — servers ship them as files, distinct from the
    Content-Encoding layer kernel/warc.py already strips) gunzip
    bounded and re-dispatch ONCE (_depth guards nesting bombs).
    Returns (text, kind, doc_or_None)."""
    if raw[:2] == b"\x1f\x8b":
        if _depth > 0:       # nested wrapper: report, never unpack
            return "", "gz", None
        inner = _gunzip_capped(raw)
        if inner is None:
            return "", "gz", None
        text, kind, doc = extract_any(inner, mode, _depth=1)
        return text, "gz+" + kind, doc
    if raw[:3] == b"BZh" and raw[3:4].isdigit():
        if _depth > 0:
            return "", "bz2", None
        inner = _bunzip2_capped(raw)
        if inner is None:
            return "", "bz2", None
        text, kind, doc = extract_any(inner, mode, _depth=1)
        return text, "bz2+" + kind, doc
    if raw[:6] == b"\xfd7zXZ\x00":
        if _depth > 0:
            return "", "xz", None
        inner = _unxz_capped(raw)
        if inner is None:
            return "", "xz", None
        text, kind, doc = extract_any(inner, mode, _depth=1)
        return text, "xz+" + kind, doc
    if raw[:4] == b"\x28\xb5\x2f\xfd":
        # zstd (RFC 8878): Content-Encoding zstd is live on the modern
        # web, but this container has no zstd library and the format's
        # FSE/Huffman entropy stage is out of honest from-scratch scope
        # — detect and report, never guess at bytes
        return "", "zstd", None
    if raw.startswith(b"%PDF-"):
        from .document import Document

        doc = Document(raw)
        return doc.extract_all(mode), "pdf", doc
    if raw[:4] == b"PK\x03\x04":
        # one names-only directory walk decides the package kind;
        # tolerant-open posture throughout: a broken package extracts
        # empty, it does not fail the task
        from .docx import DocxError, parse_docx
        from .epub import EpubError, parse_epub
        from .ziparc import ZipError, zip_names

        try:
            names = zip_names(raw)
        except ZipError:
            names = []
        if "word/document.xml" in names:
            try:
                return parse_docx(raw)["text"], "docx", None
            except DocxError:
                return "", "docx", None
        if "META-INF/container.xml" in names:
            try:
                return parse_epub(raw)["text"], "epub", None
            except EpubError:
                return "", "epub", None
        if "xl/workbook.xml" in names:
            from .xlsx import XlsxError, parse_xlsx

            try:
                return parse_xlsx(raw)["text"], "xlsx", None
            except XlsxError:
                return "", "xlsx", None
        if "ppt/presentation.xml" in names:
            from .pptx import PptxError, parse_pptx

            try:
                return parse_pptx(raw)["text"], "pptx", None
            except PptxError:
                return "", "pptx", None
        if "content.xml" in names and "mimetype" in names:
            from .odt import OdtError, odf_class, parse_odt

            cls = odf_class(raw)
            if cls == "text":
                try:
                    return parse_odt(raw)["text"], "odt", None
                except OdtError:
                    return "", "odt", None
            if cls == "spreadsheet":
                from .ods import OdsError, parse_ods

                try:
                    return parse_ods(raw)["text"], "ods", None
                except OdsError:
                    return "", "ods", None
            if cls == "presentation":
                from .odp import OdpError, parse_odp

                try:
                    return parse_odp(raw)["text"], "odp", None
                except OdpError:
                    return "", "odp", None
    if raw[257:262] == b"ustar" and not looks_like_html(raw):
        # an archive of documents is not a document: census via
        # kernel/tar.py (tar_meta), no text reduction
        return "", "tar", None
    if raw[:5] == b"{\\rtf":
        from .rtf import RtfError, parse_rtf

        try:
            return parse_rtf(raw)["text"], "rtf", None
        except RtfError:
            return "", "rtf", None
    if raw[:4] == b"%!PS":
        # PostScript: text extraction needs an interpreter (honestly
        # out of scope; the reference has none) — census-only posture
        return "", "ps", None
    from .djvu import is_djvu

    if is_djvu(raw):
        # legacy scanned-document container: page decode is IW44/JB2
        # (out of scope) — census-only posture
        return "", "djvu", None
    from .sqlitedb import is_sqlite

    if is_sqlite(raw):
        # a database is data, not a document (the tar rule)
        return "", "sqlite", None
    from .eml import EmlError, is_eml, is_mbox

    if is_eml(raw):
        # mailing-list archive mail: must sniff BEFORE the generous
        # html check (an html body part satisfies it)
        from .eml import parse_eml

        try:
            return parse_eml(raw)["text"], "eml", None
        except EmlError:
            return "", "eml", None
    if is_mbox(raw):
        # an archive of messages is not a document (the tar rule)
        return "", "mbox", None
    from .font import looks_like_font

    if looks_like_font(raw):
        # web-font payloads: census only, never text
        return "", "font", None
    if raw[:6] == b"Rar!\x1a\x07" or raw[:6] == b"7z\xbc\xaf\x27\x1c":
        # proprietary/complex archive containers: detected and named
        # honestly, never guessed at (the zstd posture)
        return "", ("rar" if raw[:1] == b"R" else "7z"), None
    from .ipynb import looks_like_ipynb

    if looks_like_ipynb(raw):
        # notebooks: markdown+code cell sources are training text
        from .ipynb import IpynbError, parse_ipynb

        try:
            return parse_ipynb(raw)["text"], "ipynb", None
        except IpynbError:
            return "", "ipynb", None
    from .jsondoc import looks_like_json, looks_like_jsonl

    if looks_like_jsonl(raw):
        # dataset shards / API dumps: data, not prose (the tar rule);
        # must run AFTER looks_like_ipynb (notebooks are json WITH text)
        return "", "jsonl", None
    if looks_like_json(raw):
        return "", "json", None
    from .latex import looks_like_tex

    if looks_like_tex(raw):
        # arXiv-source payloads: scoped detex reduction
        from .latex import LatexError, parse_latex

        try:
            return parse_latex(raw)["text"], "tex", None
        except LatexError:
            return "", "tex", None
    from .wikitext import looks_like_wiki

    if looks_like_wiki(raw):
        # MediaWiki XML exports (the Pile/Dolma wiki-slice shape):
        # scoped wikitext reduction; must sniff BEFORE the generous
        # html check (export XML satisfies it)
        from .wikitext import WikiError, parse_wiki

        try:
            return parse_wiki(raw)["text"], "wiki", None
        except WikiError:
            return "", "wiki", None
    from .subtitles import looks_like_srt, looks_like_vtt

    if looks_like_vtt(raw) or looks_like_srt(raw):
        # subtitle transcripts ARE training text (the OpenSubtitles /
        # caption lineage)
        from .subtitles import SubtitleError, parse_subtitles

        try:
            m = parse_subtitles(raw)
            return m["text"], m["kind"], None
        except SubtitleError:
            return "", "srt", None
    if looks_like_html(raw):
        return extract_main_text(raw), "html", None
    from .csvdoc import CsvError, looks_like_csv

    if looks_like_csv(raw):
        # delimited tables: tab/newline grid reduction (the xlsx rule)
        from .csvdoc import parse_csv

        try:
            return parse_csv(raw)["text"], "csv", None
        except CsvError:
            return "", "csv", None
    if looks_like_text(raw):
        # text/plain payloads are a huge crawl class and ARE training
        # text: last-resort fallback once every structured sniff has
        # passed. Newlines normalize, trailing whitespace strips —
        # byte content otherwise untouched.
        text = raw.decode(sniff_charset(raw), "replace")
        if text[:1] == "﻿":
            text = text[1:]
        return text.replace("\r\n", "\n").replace("\r", "\n").rstrip(), \
            "txt", None
    from .document import Document

    doc = Document(raw)
    return doc.extract_all(mode), "unknown", doc
