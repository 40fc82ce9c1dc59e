"""Document: the per-row kernel tying xref -> pages -> fonts -> extraction.

Fresh Python implementation of the reference Document
(/root/reference/src/root.zig:100-1774) and its Python binding surface
(/root/reference/python/zpdf/__init__.py:48-481):

- permissive open: header check, xref parse, encryption detection, page
  tree build; every failure is recorded as an error record, never raised
  (root.zig:262-322)
- per-page lazy font loading with the two-level cache: "(page, name)"
  key plus object-id dedup across pages (root.zig:324-414)
- extraction ladder (root.zig:658-878):
  accuracy = structure-tree order where tagged (60% coverage rule,
  MCID texts joined with single spaces) else stream order; per-page
  fallbacks structured -> geometric -> stream; fast = stream order;
  pages joined with \\x0c
- bounds/spans, geometric sort, search, metadata, page info

Text is built as UTF-8 bytes and decoded utf-8/errors="replace" at the
API boundary, matching python/zpdf/__init__.py:175-179.
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional, Tuple

from . import content as content_mod
from . import crypto
from . import layout as layout_mod
from . import pagetree, structtree, xref as xref_mod
from .content import (
    ExtractionContext,
    MarkedContentExtractor,
    SpanCollector,
    extract_content_stream,
)
from .encoding import FontEncoding, parse_font_encoding
from .objects import Name, Ref, Stream, dict_get_dict, dict_get_string

# error kinds (root.zig:88-97)
ERR_INVALID_HEADER = "invalid_header"
ERR_INVALID_XREF = "invalid_xref"
ERR_MISSING_OBJECT = "missing_object"
ERR_INVALID_STREAM = "invalid_stream"
ERR_ENCODING = "encoding_error"
ERR_SYNTAX = "syntax_error"
ERR_ENCRYPTED = "encrypted"


class PageNotFoundError(Exception):
    """Raised for out-of-range page indexes on the public page API,
    matching the reference binding (python/zpdf/__init__.py:133-134)."""


def document_json(doc, page_range=None) -> str:
    """One document as the CLI `-f json` object (main.zig:252-339 field
    semantics: metadata keys present only when non-null, page_count,
    outline[{title,page,level}], pages[{page(1-based), label-if-present,
    text}]). Formatting is json.dumps — field parity, not byte parity
    with the Zig writer. page_range is the CLI's inclusive 1-based
    `-p a-b` (main.zig:173-177): it restricts the pages array only.

    Lives in the kernel layer (not spark/) so pyspark-free consumers —
    fixtures' expected-column generation, plain scripts — can use it."""
    import json

    meta = {k: v for k, v in doc.metadata().items() if v is not None}
    pages = []
    lo, hi = (page_range or (1, doc.page_count or 0))
    for page_idx in range(doc.page_count):
        if not (lo <= page_idx + 1 <= hi):
            continue
        row = {"page": page_idx + 1}
        label = doc.get_page_label(page_idx)
        if label is not None:
            row["label"] = label
        row["text"] = doc.extract_text_structured_bytes(page_idx).decode(
            "utf-8", "replace")
        pages.append(row)
    return json.dumps({
        "metadata": meta,
        "page_count": doc.page_count,
        "outline": [{"title": o["title"], "page": o["page"],
                     "level": o["level"]} for o in doc.outline()],
        "pages": pages,
    }, ensure_ascii=False, sort_keys=True)


def decode_pdf_string(raw: bytes) -> str:
    """UTF-16BE with BOM (incl. surrogates) else PDFDocEncoding/Latin-1
    (root.zig:1780-1870)."""
    if len(raw) >= 2 and raw[0] == 0xFE and raw[1] == 0xFF:
        payload = raw[2:]
        out = []
        i = 0
        n = len(payload)
        while i + 1 < n:
            unit = (payload[i] << 8) | payload[i + 1]
            i += 2
            if 0xD800 <= unit <= 0xDBFF:
                if i + 1 < n:
                    unit2 = (payload[i] << 8) | payload[i + 1]
                    i += 2
                    if 0xDC00 <= unit2 <= 0xDFFF:
                        cp = 0x10000 + ((unit - 0xD800) << 10) + (unit2 - 0xDC00)
                    else:
                        cp = 0xFFFD
                else:
                    cp = 0xFFFD
            elif 0xDC00 <= unit <= 0xDFFF:
                cp = 0xFFFD
            else:
                cp = unit
            out.append(chr(cp))
        return "".join(out)
    return raw.decode("latin-1")


class Document:
    """Parse a PDF from bytes; never raises on malformed input in
    permissive mode (the default, and the only mode used at scale)."""

    __slots__ = (
        "data", "xref", "pages", "object_cache", "errors",
        "font_cache", "font_obj_cache", "_reading_order", "_reading_order_parsed",
        "metrics",
    )

    def __init__(self, data: bytes):
        self.data = data
        self.xref = xref_mod.XRefTable()
        self.pages: List[pagetree.Page] = []
        self.object_cache: Dict[int, object] = {}
        self.errors: List[Tuple[str, int, str]] = []
        # (page_num, font_name_bytes) -> FontEncoding (root.zig:129-133)
        self.font_cache: Dict[Tuple[int, bytes], FontEncoding] = {}
        self.font_obj_cache: Dict[int, FontEncoding] = {}
        self._reading_order: Optional[Dict[int, List[int]]] = None
        self._reading_order_parsed = False
        # extraction metrics (north_rule: objects parsed, streams decoded,
        # fallback counts surfaced per partition)
        self.metrics: Dict[str, int] = {
            "streams_decoded": 0,
            "structured_pages": 0,
            "stream_pages": 0,
            "geometric_pages": 0,
            "coverage_fallbacks": 0,
        }
        self._parse_document()

    # -- open / parse ----------------------------------------------------

    def _parse_document(self) -> None:
        data = self.data
        if not data.startswith(b"%PDF-"):
            self.errors.append((ERR_INVALID_HEADER, 0, "Invalid PDF header"))
        try:
            self.xref = xref_mod.parse_xref(data)
        except Exception:
            self.errors.append((ERR_INVALID_XREF, 0, "Failed to parse XRef table"))
            return
        if self.xref.trailer.get("Encrypt") is not None:
            # Beyond the reference (detection only, root.zig:292-302):
            # authenticate the EMPTY password against the Standard
            # handler — the owner-password-only "permissions encryption"
            # class real crawls are full of — and install the crypt
            # context so resolve_ref decrypts transparently
            # (kernel/crypto.py). Password-protected documents keep the
            # reference's posture: error record, ciphertext extraction.
            ctx = None
            try:
                enc_obj = self.xref.trailer["Encrypt"]
                enc = self.resolve(enc_obj)
                ids = self.xref.trailer.get("ID")
                id0 = b""
                if (isinstance(ids, list) and ids
                        and type(ids[0]) is bytes):
                    id0 = ids[0]
                if isinstance(enc, dict):
                    ctx = crypto.build_crypt_context(enc, id0, self.resolve)
                if ctx is not None:
                    ctx.encrypt_num = (enc_obj.num
                                       if isinstance(enc_obj, Ref) else -1)
                    self.object_cache[crypto.CRYPT_CACHE_KEY] = ctx
            except Exception:
                ctx = None
            if ctx is None:
                self.errors.append((
                    ERR_ENCRYPTED, 0,
                    "PDF is encrypted; text extraction will produce incorrect results",
                ))
        try:
            self.pages = pagetree.build_page_tree(data, self.xref, self.object_cache)
        except Exception:
            self.errors.append((ERR_SYNTAX, 0, "Failed to build page tree"))
            return

    @property
    def objects_resolved(self) -> int:
        return len(self.object_cache)

    @property
    def is_encrypted(self) -> bool:
        return self.xref.trailer.get("Encrypt") is not None

    @property
    def decrypted(self) -> bool:
        """True when the empty password authenticated and the document's
        streams/strings decrypt transparently (kernel/crypto.py)."""
        return crypto.CRYPT_CACHE_KEY in self.object_cache

    @property
    def page_count(self) -> int:
        return len(self.pages)

    def resolve(self, obj):
        return pagetree.resolve(self.data, self.xref, obj, self.object_cache)

    # -- fonts -----------------------------------------------------------

    def _ensure_page_fonts(self, page_idx: int) -> None:
        """root.zig:324-414."""
        page = self.pages[page_idx]
        if page.resources is None:
            return
        fonts_obj = page.resources.get("Font")
        if fonts_obj is None:
            return
        fonts = self.resolve(fonts_obj)
        if not isinstance(fonts, dict):
            return
        for key_str, value in fonts.items():
            key = (page_idx, key_str.encode("latin-1"))
            if key in self.font_cache:
                continue
            font_obj_id = value.num if isinstance(value, Ref) else None
            if font_obj_id is not None and font_obj_id in self.font_obj_cache:
                self.font_cache[key] = self.font_obj_cache[font_obj_id]
                continue
            font_dict = self.resolve(value)
            if not isinstance(font_dict, dict):
                continue
            try:
                enc = parse_font_encoding(font_dict, self.resolve)
            except Exception:
                continue
            self.font_cache[key] = enc
            if font_obj_id is not None:
                self.font_obj_cache[font_obj_id] = enc

    # -- contents --------------------------------------------------------

    def _page_contents(self, page_idx: int) -> bytes:
        if not 0 <= page_idx < len(self.pages):
            return b""
        try:
            self.metrics["streams_decoded"] += 1
            return pagetree.get_page_contents(
                self.data, self.xref, self.pages[page_idx], self.object_cache
            )
        except Exception:
            self.errors.append((ERR_INVALID_STREAM, 0, "Failed to get page contents"))
            return b""

    # -- reading order (structure tree) ----------------------------------

    def _ensure_reading_order(self) -> None:
        """root.zig:608-654: parse once, map page obj num -> page index."""
        if self._reading_order_parsed:
            return
        self._reading_order_parsed = True
        try:
            root = structtree.parse_struct_tree(self.data, self.xref, self.object_cache)
        except Exception:
            return
        if root is None:
            return
        by_obj_num = structtree.get_reading_order(root)
        page_obj_to_idx = {p.ref.num: i for i, p in enumerate(self.pages)}
        cache: Dict[int, List[int]] = {}
        has_entries = False
        for obj_num, mcids in by_obj_num.items():
            idx = page_obj_to_idx.get(obj_num)
            if idx is not None:
                cache.setdefault(idx, []).extend(mcids)
                if mcids:
                    has_entries = True
        if has_entries:
            self._reading_order = cache

    def has_structure_tree(self) -> bool:
        root_ref = self.xref.trailer.get("Root")
        if not isinstance(root_ref, Ref):
            return False
        catalog = self.resolve(root_ref)
        return isinstance(catalog, dict) and catalog.get("StructTreeRoot") is not None

    # -- extraction ------------------------------------------------------

    def extract_text_stream_order_bytes(self, page_idx: int) -> bytes:
        """Raw stream-order extraction for one page (root.zig:767-783)."""
        out = bytearray()
        contents = self._page_contents(page_idx)
        if not contents:
            return b""
        self._ensure_page_fonts(page_idx)
        extract_content_stream(contents, "stream", self.font_cache, page_idx, out=out)
        return bytes(out)

    def _extract_page_full_bytes(self, page_idx: int) -> bytes:
        """Stream-order WITH Form XObject support (root.zig:484-531)."""
        out = bytearray()
        contents = self._page_contents(page_idx)
        if not contents:
            return b""
        self._ensure_page_fonts(page_idx)
        ctx = ExtractionContext(
            self.data, self.xref, self.object_cache, self.font_cache, page_idx
        )
        extract_content_stream(
            contents, "stream", self.font_cache, page_idx,
            out=out, resources=self.pages[page_idx].resources, ctx=ctx,
        )
        return bytes(out)

    def extract_bounds(self, page_idx: int) -> List[content_mod.TextSpan]:
        """Span extraction (root.zig:542-577)."""
        if page_idx >= len(self.pages):
            return []
        contents = self._page_contents(page_idx)
        if not contents:
            return []
        self._ensure_page_fonts(page_idx)
        collector = SpanCollector()
        try:
            extract_content_stream(
                contents, "bounds", self.font_cache, page_idx, collector=collector
            )
        except Exception:
            return []
        collector.flush()
        for s in collector.spans:
            s.page = page_idx
        return collector.spans

    def _extract_geometric_bytes(self, page_idx: int) -> bytes:
        """root.zig:744-764."""
        spans = self.extract_bounds(page_idx)
        if not spans:
            return b""
        try:
            return layout_mod.sort_geometric(spans)
        except Exception:
            return self.extract_text_stream_order_bytes(page_idx)

    def extract_text_structured_bytes(self, page_idx: int) -> bytes:
        """Accuracy-mode page extraction ladder (root.zig:658-740)."""
        if page_idx >= len(self.pages):
            return b""
        self._ensure_reading_order()
        contents = self._page_contents(page_idx)
        if not contents:
            return b""
        self._ensure_page_fonts(page_idx)
        ro = self._reading_order
        if ro is not None:
            mcids = ro.get(page_idx)
            if mcids is not None:
                extractor = MarkedContentExtractor()
                try:
                    extract_content_stream(
                        contents, "structured", self.font_cache, page_idx,
                        extractor=extractor,
                    )
                except Exception:
                    return self._extract_geometric_bytes(page_idx)
                parts: List[bytes] = []
                for mcid in mcids:
                    text = extractor.text_for_mcid(mcid)
                    if text is not None:
                        if parts and text:
                            parts.append(b" ")
                        parts.append(text)
                structured = b"".join(parts)
                if structured:
                    try:
                        stream_text = self.extract_text_stream_order_bytes(page_idx)
                    except Exception:
                        self.metrics["structured_pages"] += 1
                        return structured
                    # 60% coverage rule (root.zig:717-721)
                    if len(structured) >= (len(stream_text) * 6) // 10:
                        self.metrics["structured_pages"] += 1
                        return structured
                    self.metrics["coverage_fallbacks"] += 1
                    return stream_text
        # untagged page: stream order first, geometric fallback
        try:
            stream_text = self.extract_text_stream_order_bytes(page_idx)
        except MemoryError:
            raise
        except Exception:
            return self._extract_geometric_bytes(page_idx)
        if stream_text:
            self.metrics["stream_pages"] += 1
            return stream_text
        self.metrics["geometric_pages"] += 1
        return self._extract_geometric_bytes(page_idx)

    def extract_all_fast_bytes(self) -> bytes:
        """Fast (stream-order) full-document extraction (root.zig:830-871)."""
        if not self.pages:
            return b""
        parts: List[bytes] = []
        for i in range(len(self.pages)):
            if i > 0:
                parts.append(b"\x0c")
            contents = self._page_contents(i)
            if not contents:
                continue
            self._ensure_page_fonts(i)
            out = bytearray()
            extract_content_stream(contents, "stream", self.font_cache, i, out=out)
            self.metrics["stream_pages"] += 1
            parts.append(bytes(out))
        return b"".join(parts)

    def extract_all_structured_bytes(self) -> bytes:
        """Accuracy-mode full document (root.zig:786-827)."""
        if not self.pages:
            return b""
        self._ensure_reading_order()
        if self._reading_order is None:
            return self.extract_all_fast_bytes()
        parts: List[bytes] = []
        for i in range(len(self.pages)):
            if i > 0:
                parts.append(b"\x0c")
            try:
                parts.append(self.extract_text_structured_bytes(i))
            except Exception:
                continue
        return b"".join(parts)

    def extract_all_bytes(self, mode: str = "accuracy") -> bytes:
        if mode == "fast":
            return self.extract_all_fast_bytes()
        return self.extract_all_structured_bytes()

    # -- Python-binding-parity string API --------------------------------

    def extract_all(self, mode: str = "accuracy") -> str:
        return self.extract_all_bytes(mode).decode("utf-8", "replace")

    def extract_page(self, page_idx: int, reading_order: bool = False) -> str:
        if not 0 <= page_idx < len(self.pages):
            raise PageNotFoundError(f"page {page_idx} of {len(self.pages)}")
        if reading_order:
            return self.extract_text_structured_bytes(page_idx).decode("utf-8", "replace")
        return self._extract_page_full_bytes(page_idx).decode("utf-8", "replace")

    # -- metadata & info -------------------------------------------------

    def metadata(self) -> Dict[str, Optional[str]]:
        """/Info dict -> 8 fields (root.zig:978-1001); strings decoded via
        decodePdfString like the C API boundary."""
        result: Dict[str, Optional[str]] = {
            "title": None, "author": None, "subject": None, "keywords": None,
            "creator": None, "producer": None, "creation_date": None, "mod_date": None,
        }
        info = self.xref.trailer.get("Info")
        info = self.resolve(info) if info is not None else None
        if not isinstance(info, dict):
            return result
        mapping = {
            "title": "Title", "author": "Author", "subject": "Subject",
            "keywords": "Keywords", "creator": "Creator", "producer": "Producer",
            "creation_date": "CreationDate", "mod_date": "ModDate",
        }
        for field, key in mapping.items():
            raw = dict_get_string(info, key)
            if raw is not None:
                result[field] = decode_pdf_string(raw)
        return result

    def get_page_info(self, page_idx: int) -> Optional[Dict[str, float]]:
        if page_idx >= len(self.pages):
            return None
        p = self.pages[page_idx]
        return {
            "width": p.media_box[2] - p.media_box[0],
            "height": p.media_box[3] - p.media_box[1],
            "rotation": p.rotation,
        }

    # -- Python-API-parity conveniences (python/zpdf/__init__.py:51-481) --

    def __enter__(self) -> "Document":
        return self

    def __exit__(self, exc_type, exc_val, exc_tb) -> None:
        pass  # nothing to free: buffers are plain Python objects

    def __iter__(self):
        """Iterate page texts (python/zpdf/__init__.py:476-478)."""
        for i in range(len(self.pages)):
            yield self.extract_page(i)

    def __len__(self) -> int:
        return len(self.pages)

    def close(self) -> None:
        pass

    # -- auxiliary feature extractors (X2-X10) ---------------------------

    def outline(self) -> List[Dict[str, object]]:
        from . import features
        try:
            return features.get_outline(self)
        except Exception:
            return []

    def get_page_label(self, page_idx: int) -> Optional[str]:
        from . import features
        try:
            return features.get_page_label(self, page_idx)
        except Exception:
            return None

    def get_links(self, page_idx: int) -> List[Dict[str, object]]:
        from . import features
        try:
            return features.get_page_links(self, page_idx)
        except Exception:
            return []

    def get_images(self, page_idx: int) -> List[Dict[str, object]]:
        from . import features
        try:
            return features.get_page_images(self, page_idx)
        except Exception:
            return []

    def form_fields(self) -> List[Dict[str, object]]:
        from . import features
        try:
            return features.get_form_fields(self)
        except Exception:
            return []

    def extract_page_markdown(self, page_idx: int) -> str:
        from . import markdown as md
        spans = self.extract_bounds(page_idx)
        if not spans or page_idx >= len(self.pages):
            return ""
        page = self.pages[page_idx]
        width = page.media_box[2] - page.media_box[0]
        return md.render_page_markdown(spans, width).decode("utf-8", "replace")

    def extract_all_markdown(self, structured: bool = False,
                             page_range=None) -> str:
        """Default mode is the span-heuristic renderer for byte parity
        with the reference (its StructuredMarkdownRenderer is dead code —
        root.zig:886-908 never routes tagged docs through it).
        structured=True opts into the ported struct-type map
        (markdown.zig:564-606). page_range is the CLI's inclusive
        1-based -p (main.zig:173-177)."""
        from . import markdown as md
        if structured:
            return md.render_document_markdown_structured(
                self, page_range=page_range).decode("utf-8", "replace")
        return md.render_document_markdown(
            self, page_range=page_range).decode("utf-8", "replace")

    # -- search ----------------------------------------------------------

    def search(self, query: str) -> List[Dict[str, object]]:
        """Case-insensitive (ASCII) substring search over per-page
        accuracy text with +/-50-byte context (root.zig:1221-1275)."""
        if not query:
            return []
        qb = query.encode("utf-8")
        q_lower = bytes(c + 32 if 0x41 <= c <= 0x5A else c for c in qb)
        results = []
        for page_idx in range(len(self.pages)):
            try:
                page_text = self.extract_text_structured_bytes(page_idx)
            except Exception:
                continue
            if not page_text:
                continue
            text_lower = bytes(c + 32 if 0x41 <= c <= 0x5A else c for c in page_text)
            pos = 0
            while pos + len(q_lower) <= len(text_lower):
                found = text_lower.find(q_lower, pos)
                if found == -1:
                    break
                ctx_start = found - 50 if found > 50 else 0
                ctx_end = min(found + len(qb) + 50, len(page_text))
                results.append({
                    "page": page_idx,
                    "offset": found,
                    "context": page_text[ctx_start:ctx_end].decode("utf-8", "replace"),
                })
                pos = found + len(q_lower)
        return results
