"""Markdown rendering from text spans (SURVEY.md X10).

Fresh Python implementation matching /root/reference/src/markdown.zig:

- body font size: histogram over 0.1pt buckets weighted by text length
  (markdown.zig:176-208)
- headings at size ratios >= 1.8 / 1.5 / 1.3 (markdown.zig:25-29,
  279-288)
- list detection: bullet prefixes and number patterns like "1.", "a)",
  "(i)" (markdown.zig:123-135, 459-500)
- indentation levels at 36pt units capped at 6 (markdown.zig:452-457)
- line assembly at |dy| > 3, paragraph break (blank line) at
  dy > 1.2 x body size (markdown.zig:241-271)
- word-gap spaces at 0.15 x font size (markdown.zig:307-315)
- page breaks rendered as "\\n---\\n\\n" between pages
  (root.zig:930-933)
"""

from __future__ import annotations

from typing import List, Optional

from .content import TextSpan

H1_RATIO = 1.8
H2_RATIO = 1.5
H3_RATIO = 1.3

# bullet prefixes (markdown.zig:123-135) as UTF-8 bytes
_BULLETS = [s.encode("utf-8") for s in
            ["•", "●", "○", "■", "□", "▪", "▫", "-", "*", "–", "—"]]


def _body_font_size(spans: List[TextSpan]) -> float:
    counts = {}
    for s in spans:
        key = int(s.font_size * 10)
        counts[key] = counts.get(key, 0) + len(s.text)
    best_key, best_count = 120, 0
    for k, v in counts.items():
        if v > best_count:
            best_key, best_count = k, v
    return best_key / 10.0


def _is_bullet(text: bytes) -> bool:
    return any(text.startswith(p) for p in _BULLETS)


def _is_numbered(text: bytes) -> bool:
    if len(text) < 2:
        return False
    i = 1 if text[0:1] == b"(" else 0
    start = i
    while i < len(text) and i < 5:
        c = text[i]
        if (0x30 <= c <= 0x39) or (0x61 <= c <= 0x7A) or (0x41 <= c <= 0x5A):
            i += 1
        else:
            break
    if i == start or i >= len(text):
        return False
    return text[i] in (0x2E, 0x29, 0x3A)  # . ) :


def _strip_bullet(text: bytes) -> bytes:
    for p in _BULLETS:
        if text.startswith(p):
            return text[len(p):].lstrip(b" \t")
    return text


def _strip_number(text: bytes) -> bytes:
    i = 1 if text[0:1] == b"(" else 0
    while i < len(text) and i < 5:
        c = text[i]
        if (0x30 <= c <= 0x39) or (0x61 <= c <= 0x7A) or (0x41 <= c <= 0x5A):
            i += 1
        else:
            break
    if i < len(text) and text[i] in (0x2E, 0x29, 0x3A):
        i += 1
    if i < len(text) and text[i] == 0x29:
        i += 1
    while i < len(text) and text[i] in (0x20, 0x09):
        i += 1
    return text[i:]


def _indent_level(x: float) -> int:
    return min(int(max(0.0, x) / 36.0), 6)


def render_page_markdown(spans: List[TextSpan], page_width: float) -> bytes:
    """Render one page's spans to markdown bytes (markdown.zig:145-449).

    The reference routes spans through analyzeLayout first, which at
    most reorders columns; element assembly then re-sorts by row/x
    (markdown.zig:217-230), so we sort directly."""
    if not spans:
        return b""
    body_size = _body_font_size(spans)
    line_threshold = 3.0

    def key(s: TextSpan):
        return (-int(s.y0 / line_threshold), s.x0)

    ordered = sorted(spans, key=key)

    # assemble (kind, text, indent) elements
    elements: List[tuple] = []
    para_gap = body_size * 1.2
    prev_y = ordered[0].y0
    current: List[bytes] = []
    current_kind = "p"
    current_indent = 0.0
    first_in_line = True

    def flush(last_span):
        nonlocal current
        if current:
            elements.append((current_kind, b"".join(current), _indent_level(current_indent)))
            current = []

    for i, span in enumerate(ordered):
        y_diff = abs(span.y0 - prev_y)
        if i > 0 and y_diff > line_threshold:
            flush(ordered[i - 1])
            if y_diff > para_gap and elements:
                elements.append(("br", b"", 0))
            first_in_line = True
            current_kind = "p"
        if first_in_line:
            current_indent = span.x0
            ratio = span.font_size / body_size if body_size else 1.0
            if ratio >= H1_RATIO:
                current_kind = "h1"
            elif ratio >= H2_RATIO:
                current_kind = "h2"
            elif ratio >= H3_RATIO:
                current_kind = "h3"
            if current_kind == "p":
                if _is_bullet(span.text):
                    current_kind = "ul"
                elif _is_numbered(span.text):
                    current_kind = "ol"
            first_in_line = False
        elif current:
            prev_span = ordered[i - 1]
            gap = span.x0 - prev_span.x1
            if gap > prev_span.font_size * 0.15:
                current.append(b" ")
        current.append(span.text)
        prev_y = span.y0
    flush(ordered[-1] if ordered else None)

    # render
    out = bytearray()
    prev_kind: Optional[str] = None
    for kind, text, indent in elements:
        if prev_kind is not None:
            needs_blank = (
                kind in ("h1", "h2", "h3")
                or (kind == "p" and prev_kind not in ("p", "br"))
                or (kind in ("ul", "ol") and prev_kind not in ("ul", "ol"))
            )
            if needs_blank and out:
                out.append(0x0A)
        if kind == "h1":
            out += b"# " + text + b"\n"
        elif kind == "h2":
            out += b"## " + text + b"\n"
        elif kind == "h3":
            out += b"### " + text + b"\n"
        elif kind == "ul":
            out += b"  " * indent + b"- " + _strip_bullet(text) + b"\n"
        elif kind == "ol":
            out += b"  " * indent + b"1. " + _strip_number(text) + b"\n"
        elif kind == "br":
            out.append(0x0A)
        else:
            out += text + b"\n"
        prev_kind = kind
    return bytes(out)


def _selected_pages(doc, page_range):
    """Inclusive 1-based (a, b) like the CLI's -p (main.zig:173-177);
    None = all pages. Separators go between EMITTED pages only, exactly
    like doExtract iterating the pages slice."""
    if page_range is None:
        return range(doc.page_count)
    lo, hi = page_range
    return [p for p in range(doc.page_count) if lo <= p + 1 <= hi]


def render_document_markdown(doc, page_range=None) -> bytes:
    """Selected pages with '\\n---\\n\\n' page breaks (root.zig:916-942)."""
    parts = []
    for i, page_idx in enumerate(_selected_pages(doc, page_range)):
        if i > 0:
            parts.append(b"\n---\n\n")
        spans = doc.extract_bounds(page_idx)
        if not spans:
            continue
        page = doc.pages[page_idx]
        width = page.media_box[2] - page.media_box[0]
        parts.append(render_page_markdown(spans, width))
    return b"".join(parts)


# -- structured (tagged-PDF) markdown: OPT-IN mode -------------------------
#
# Port of the reference's StructuredMarkdownRenderer struct-type map
# (markdown.zig:558-606). NOTE for parity: in the reference this renderer
# is DEAD CODE — the production extractMarkdown* path (root.zig:886-908)
# always uses the span-heuristic MarkdownRenderer, even for tagged PDFs —
# so the default markdown output above deliberately ignores the structure
# tree to stay byte-identical. The map is exposed here as the documented
# opt-in `structured=True` mode; element rendering follows the base
# renderer's renderElements formatting (markdown.zig:337-446) so both
# modes emit the same markdown dialect.

# markdown.zig:564-592
STRUCT_TYPE_MAP = {
    b"Document": "paragraph", b"Part": "paragraph", b"Sect": "paragraph",
    b"Div": "paragraph", b"P": "paragraph",
    b"H": "heading1", b"H1": "heading1", b"H2": "heading2",
    b"H3": "heading3", b"H4": "heading4", b"H5": "heading5",
    b"H6": "heading6",
    b"L": "list_item_bullet", b"LI": "list_item_bullet",
    b"Lbl": "list_item_bullet", b"LBody": "paragraph",
    b"Table": "table_row", b"TR": "table_row", b"TH": "table_row",
    b"TD": "table_row",
    b"Code": "code_block",
    b"BlockQuote": "blockquote", b"Quote": "blockquote",
    b"Figure": "paragraph", b"Caption": "paragraph", b"Span": "paragraph",
    b"Link": "paragraph",
}

_HEADING_KINDS = {
    "heading1": b"# ", "heading2": b"## ", "heading3": b"### ",
    "heading4": b"#### ", "heading5": b"##### ", "heading6": b"###### ",
}


def map_struct_type(struct_type: bytes) -> str:
    """mapStructType (markdown.zig:603-605): unknown types -> paragraph."""
    return STRUCT_TYPE_MAP.get(struct_type, "paragraph")


def _collect_struct_elements(elem, mcid_texts, page_obj_num, out,
                             parent_page=None, depth=0):
    """DFS the structure tree; each element whose direct children include
    MCIDs on this page becomes one markdown element of its mapped kind,
    its MCID texts joined with single spaces (the R3 grouping rule).
    Page membership resolves through /Pg inheritance exactly like the
    reading-order collector (structtree.zig:92-126) — MCID numbers
    restart per page, so the number alone is not a key."""
    if depth >= 256 or elem.struct_type == b"Artifact":
        return
    current_page = elem.page_ref if elem.page_ref is not None else parent_page
    own_parts = []
    for kind, payload in elem.children:
        if kind == "elem":
            if own_parts:
                out.append((map_struct_type(elem.struct_type), b" ".join(own_parts)))
                own_parts = []
            _collect_struct_elements(payload, mcid_texts, page_obj_num, out,
                                     current_page, depth + 1)
        else:
            mcid, page_ref = payload
            pr = page_ref if page_ref is not None else current_page
            if pr is not None and pr.num == page_obj_num:
                text = mcid_texts.get(mcid)
                if text:
                    own_parts.append(text)
    if own_parts:
        out.append((map_struct_type(elem.struct_type), b" ".join(own_parts)))


def render_elements(elements) -> bytes:
    """renderElements (markdown.zig:337-446): per-kind prefixes plus the
    blank-line spacing rules, for (kind, text) pairs."""
    out = bytearray()
    prev_kind = None
    for kind, text in elements:
        if prev_kind is not None:
            if kind in _HEADING_KINDS or kind == "code_block":
                needs_blank = True
            elif kind == "paragraph":
                needs_blank = prev_kind not in ("paragraph", "line_break")
            elif kind in ("list_item_bullet", "list_item_number"):
                needs_blank = prev_kind not in ("list_item_bullet",
                                                "list_item_number")
            else:
                needs_blank = False
            if needs_blank and out:
                out.append(0x0A)
        if kind in _HEADING_KINDS:
            out += _HEADING_KINDS[kind] + text + b"\n"
        elif kind == "list_item_bullet":
            out += b"- " + _strip_bullet(text) + b"\n"
        elif kind == "list_item_number":
            out += b"1. " + _strip_number(text) + b"\n"
        elif kind == "table_row":
            out += b"| " + text + b" |\n"
        elif kind == "code_block":
            out += b"```\n" + text + b"\n```\n"
        elif kind == "blockquote":
            out += b"> " + text + b"\n"
        else:
            out += text + b"\n"
        prev_kind = kind
    return bytes(out)


def render_document_markdown_structured(doc, page_range=None) -> bytes:
    """Opt-in tagged-PDF markdown: pages with a structure tree render via
    the struct-type map; untagged pages fall back to the span heuristics.

    This is the behavior StructuredMarkdownRenderer declares but the
    reference never wires up (see module note above) — offered here as
    `Document.extract_all_markdown(structured=True)` /
    `markdown_dataframe(..., structured=True)`."""
    from . import structtree
    from .content import MarkedContentExtractor, extract_content_stream

    try:
        root = structtree.parse_struct_tree(doc.data, doc.xref, doc.object_cache)
    except Exception:
        root = None
    doc._ensure_reading_order()
    ro = doc._reading_order
    parts = []
    for i, page_idx in enumerate(_selected_pages(doc, page_range)):
        if i > 0:
            parts.append(b"\n---\n\n")
        mcids = ro.get(page_idx) if (ro is not None and root is not None) else None
        if mcids:
            contents = doc._page_contents(page_idx)
            if not contents:
                continue
            doc._ensure_page_fonts(page_idx)
            extractor = MarkedContentExtractor()
            try:
                extract_content_stream(
                    contents, "structured", doc.font_cache, page_idx,
                    extractor=extractor,
                )
            except Exception:
                continue
            mcid_texts = {m: extractor.text_for_mcid(m) for m in mcids}
            elements: list = []
            _collect_struct_elements(
                root, mcid_texts, doc.pages[page_idx].ref.num, elements)
            parts.append(render_elements(elements))
        else:
            spans = doc.extract_bounds(page_idx)
            if not spans:
                continue
            page = doc.pages[page_idx]
            width = page.media_box[2] - page.media_box[0]
            parts.append(render_page_markdown(spans, width))
    return b"".join(parts)
