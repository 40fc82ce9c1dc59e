"""Auxiliary document-feature extractors (SURVEY.md §2.9 X2-X9).

Fresh Python implementations matching the reference:

- outline/TOC: /Outlines First/Next linked-list tree with levels, titles
  via decodePdfString, /Dest or /A GoTo destination -> page index,
  10 000-item cycle cap (/root/reference/src/outline.zig:26-199)
- page labels: /PageLabels number tree /Nums; styles D/r/R/a/A, prefix,
  /St start; roman (<=3999) and alpha (a..z,aa..) formatters
  (/root/reference/src/root.zig:1027-1207)
- links: /Annots -> /Subtype /Link; /A URI or GoTo, or /Dest; rect
  (/root/reference/src/root.zig:1300-1453)
- image detection: content-stream scan for cm (CTM concat) + Do on
  /Subtype /Image XObjects; rect from CTM translation+scale
  (/root/reference/src/root.zig:1467-1590)
- form fields: /AcroForm/Fields recursive /Kids walk with dotted names,
  FT in {Tx,Btn,Ch,Sig}, /V, /Rect (/root/reference/src/root.zig:1611-1765)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from . import pagetree
from .content import ContentLexer, T_ARR, T_NAME, T_NUM, T_OP
from .objects import Name, Ref, Stream, dict_get_array, dict_get_int, dict_get_name, dict_get_string

MAX_OUTLINE_ITEMS = 10_000


def _resolve(doc, obj):
    return pagetree.resolve(doc.data, doc.xref, obj, doc.object_cache)


def _as_dict(doc, obj) -> Optional[dict]:
    v = _resolve(doc, obj)
    return v if isinstance(v, dict) else None


def _as_array(doc, obj) -> Optional[list]:
    v = _resolve(doc, obj)
    return v if isinstance(v, list) else None


def _catalog(doc) -> Optional[dict]:
    root_ref = doc.xref.trailer.get("Root")
    if not isinstance(root_ref, Ref):
        return None
    return _as_dict(doc, root_ref)


def _dest_to_page(doc, dest_obj) -> Optional[int]:
    """[page_ref /Fit ...] -> page index (root.zig:1426-1453)."""
    arr = _as_array(doc, dest_obj)
    if not arr:
        return None
    page_ref = arr[0]
    if not isinstance(page_ref, Ref):
        return None
    for idx, p in enumerate(doc.pages):
        if p.ref == page_ref:
            return idx
    return None


# -- outline (X2) ----------------------------------------------------------


def get_outline(doc) -> List[dict]:
    """Flat list of {title, page, level} (outline.zig:26-199)."""
    from .document import decode_pdf_string

    catalog = _catalog(doc)
    if catalog is None:
        return []
    outlines = _as_dict(doc, catalog.get("Outlines"))
    if outlines is None:
        return []
    first = outlines.get("First")
    if first is None:
        return []
    items: List[dict] = []

    def walk(obj, level: int) -> None:
        current = obj
        while len(items) < MAX_OUTLINE_ITEMS:
            d = _as_dict(doc, current)
            if d is None:
                return
            title_raw = dict_get_string(d, "Title") or b""
            title = decode_pdf_string(title_raw)
            dest_page = None
            if d.get("Dest") is not None:
                dest_page = _dest_to_page(doc, d["Dest"])
            if dest_page is None and d.get("A") is not None:
                action = _as_dict(doc, d["A"])
                if action is not None and dict_get_name(action, "S") == b"GoTo":
                    if action.get("D") is not None:
                        dest_page = _dest_to_page(doc, action["D"])
            items.append({"title": title, "page": dest_page, "level": level})
            if d.get("First") is not None:
                walk(d["First"], level + 1)
            nxt = d.get("Next")
            if nxt is None:
                return
            current = nxt

    walk(first, 0)
    return items


# -- page labels (X3) ------------------------------------------------------

_ROMAN = [
    (1000, "M", "m"), (900, "CM", "cm"), (500, "D", "d"), (400, "CD", "cd"),
    (100, "C", "c"), (90, "XC", "xc"), (50, "L", "l"), (40, "XL", "xl"),
    (10, "X", "x"), (9, "IX", "ix"), (5, "V", "v"), (4, "IV", "iv"),
    (1, "I", "i"),
]


def _format_roman(number: int, upper: bool) -> str:
    if number == 0 or number > 3999:
        return str(number)
    out = []
    n = number
    for v, up, lo in _ROMAN:
        while n >= v:
            out.append(up if upper else lo)
            n -= v
    return "".join(out)


def _format_alpha(number: int, upper: bool) -> str:
    if number == 0:
        return "0"
    n = number - 1
    chars = []
    while True:
        c = n % 26
        chars.append(chr((65 if upper else 97) + c))
        if n < 26:
            break
        n = n // 26 - 1
    return "".join(reversed(chars))


def get_page_label(doc, page_idx: int) -> Optional[str]:
    """root.zig:1027-1152 semantics, incl. the no-style/no-prefix
    fallback to the 1-based page number."""
    catalog = _catalog(doc)
    if catalog is None:
        return None
    pl = _as_dict(doc, catalog.get("PageLabels"))
    if pl is None:
        return None
    nums = _as_array(doc, pl.get("Nums"))
    if nums is None:
        return None
    best_start = None
    best_dict = None
    i = 0
    while i + 1 < len(nums):
        start = nums[i]
        if type(start) is not int:
            i += 2
            continue
        if start > page_idx:
            break
        label = _as_dict(doc, nums[i + 1])
        if label is not None:
            best_start = start
            best_dict = label
        i += 2
    if best_start is None or best_dict is None:
        return None
    st = dict_get_int(best_dict, "St")
    page_number = (st if st is not None else 1) + (page_idx - best_start)
    style = dict_get_name(best_dict, "S")
    prefix = dict_get_string(best_dict, "P")
    out = ""
    if prefix:
        out += prefix.decode("latin-1")
    if style:
        s = style[:1]
        if s == b"D":
            out += str(page_number)
        elif s == b"r":
            out += _format_roman(page_number, False)
        elif s == b"R":
            out += _format_roman(page_number, True)
        elif s == b"a":
            out += _format_alpha(page_number, False)
        elif s == b"A":
            out += _format_alpha(page_number, True)
        else:
            out += str(page_number)
    if not out and prefix is None:
        out = str(page_idx + 1)
    return out


# -- links (X5) ------------------------------------------------------------


def _parse_rect(d: dict) -> Optional[Tuple[float, float, float, float]]:
    arr = dict_get_array(d, "Rect")
    if arr is None or len(arr) < 4:
        return None
    vals = []
    for x in arr[:4]:
        if type(x) in (int, float):
            vals.append(float(x))
        else:
            return None
    return tuple(vals)


def get_page_links(doc, page_idx: int) -> List[dict]:
    """root.zig:1300-1398: /Annots Link annotations."""
    if page_idx >= len(doc.pages):
        return []
    page = doc.pages[page_idx]
    annots = _as_array(doc, page.dict.get("Annots"))
    if annots is None:
        return []
    links = []
    for annot_obj in annots:
        annot = _as_dict(doc, annot_obj)
        if annot is None:
            continue
        if dict_get_name(annot, "Subtype") != b"Link":
            continue
        rect = _parse_rect(annot)
        if rect is None:
            continue
        uri = None
        dest_page = None
        if annot.get("A") is not None:
            action = _as_dict(doc, annot["A"])
            if action is not None:
                s = dict_get_name(action, "S")
                if s == b"URI":
                    raw = dict_get_string(action, "URI")
                    if raw is not None:
                        uri = raw.decode("latin-1")
                elif s == b"GoTo" and action.get("D") is not None:
                    dest_page = _dest_to_page(doc, action["D"])
        if uri is None and dest_page is None and annot.get("Dest") is not None:
            dest_page = _dest_to_page(doc, annot["Dest"])
        links.append({"rect": rect, "uri": uri, "dest_page": dest_page})
    return links


# -- images (X6) -----------------------------------------------------------


def _multiply_matrix(a, b):
    return (
        a[0] * b[0] + a[1] * b[2],
        a[0] * b[1] + a[1] * b[3],
        a[2] * b[0] + a[3] * b[2],
        a[2] * b[1] + a[3] * b[3],
        a[4] * b[0] + a[5] * b[2] + b[4],
        a[4] * b[1] + a[5] * b[3] + b[5],
    )


def get_page_images(doc, page_idx: int) -> List[dict]:
    """root.zig:1467-1538: cm-tracked Do on /Subtype /Image XObjects."""
    if page_idx >= len(doc.pages):
        return []
    page = doc.pages[page_idx]
    contents = doc._page_contents(page_idx)
    if not contents:
        return []
    images = []
    ctm = (1.0, 0.0, 0.0, 1.0, 0.0, 0.0)
    operands: list = []
    for tok in ContentLexer(contents).tokens():
        if tok[0] != T_OP:
            if len(operands) < 128:
                operands.append(tok)
            continue
        op = tok[1]
        if op == b"cm" and len(operands) >= 6:
            nums = [t[1] if t[0] == T_NUM else 0.0 for t in operands[:6]]
            ctm = _multiply_matrix(tuple(nums), ctm)
        elif op == b"Do" and operands and operands[0][0] == T_NAME:
            info = _resolve_xobject_image(doc, page, operands[0][1])
            if info is not None:
                w, h = info
                images.append({
                    "rect": (ctm[4], ctm[5], ctm[4] + ctm[0], ctm[5] + ctm[3]),
                    "width": w,
                    "height": h,
                })
        operands = []
    return images


def _resolve_xobject_image(doc, page, name: bytes) -> Optional[Tuple[int, int]]:
    if page.resources is None:
        return None
    xobjects = _as_dict(doc, page.resources.get("XObject"))
    if xobjects is None:
        return None
    xobj = _resolve(doc, xobjects.get(name.decode("latin-1")))
    if not isinstance(xobj, Stream):
        return None
    if dict_get_name(xobj.dict, "Subtype") != b"Image":
        return None
    w = dict_get_int(xobj.dict, "Width")
    h = dict_get_int(xobj.dict, "Height")
    if w is None or h is None:
        return None
    return (w, h)


# -- form fields (X7) ------------------------------------------------------

_FIELD_TYPES = {b"Tx": "text", b"Btn": "button", b"Ch": "choice", b"Sig": "signature"}


def get_form_fields(doc) -> List[dict]:
    """root.zig:1611-1765: AcroForm walk with dotted hierarchical names."""
    catalog = _catalog(doc)
    if catalog is None:
        return []
    acroform = _as_dict(doc, catalog.get("AcroForm"))
    if acroform is None:
        return []
    fields_arr = _as_array(doc, acroform.get("Fields"))
    if fields_arr is None:
        return []
    results: List[dict] = []

    def collect(field_obj, parent_name: str) -> None:
        d = _as_dict(doc, field_obj)
        if d is None:
            return
        partial = dict_get_string(d, "T")
        partial_name = partial.decode("latin-1") if partial else ""
        if parent_name and partial_name:
            full_name = parent_name + "." + partial_name
        elif partial_name:
            full_name = partial_name
        else:
            full_name = parent_name
        kids = d.get("Kids")
        if kids is not None:
            kids_arr = _as_array(doc, kids)
            if kids_arr is None:
                return
            for kid in kids_arr:
                collect(kid, full_name)
            return
        ft = dict_get_name(d, "FT")
        field_type = _FIELD_TYPES.get(bytes(ft), "unknown") if ft else "unknown"
        value_raw = dict_get_string(d, "V")
        results.append({
            "name": full_name,
            "value": value_raw.decode("latin-1") if value_raw is not None else None,
            "field_type": field_type,
            "rect": _parse_rect(d),
        })

    for field_obj in fields_arr:
        collect(field_obj, "")
    return results
