"""Structure tree (Tagged PDF) parsing -> reading order.

Fresh Python implementation matching /root/reference/src/structtree.zig:

- catalog /StructTreeRoot -> /K tree of StructElem dicts; children via
  /K may be int MCIDs, refs, dicts, MCR dicts ({/Type /MCR /MCID /Pg
  /Stm}), or arrays thereof (structtree.zig:196-351)
- reading order: DFS collecting MCIDs per page object number, skipping
  "Artifact" subtrees, depth cap 256 (structtree.zig:72-126)
- the root /K must resolve to a single element (an array root yields an
  empty tree, mirroring parseStructElement's dispatch)
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

from . import pagetree
from .objects import Name, Ref, dict_get_int, dict_get_name

MAX_STRUCT_DEPTH = 256


class StructElement:
    __slots__ = ("struct_type", "title", "alt_text", "children", "page_ref")

    def __init__(self, struct_type, title, alt_text, children, page_ref):
        self.struct_type = struct_type  # bytes
        self.title = title
        self.alt_text = alt_text
        self.children = children  # list of ("elem", StructElement) | ("mcid", (mcid, page_ref))
        self.page_ref = page_ref


def parse_struct_tree(data: bytes, xref, cache) -> Optional[StructElement]:
    root_ref = xref.trailer.get("Root")
    if not isinstance(root_ref, Ref):
        return None
    catalog = pagetree.resolve_ref(data, xref, root_ref, cache)
    if not isinstance(catalog, dict):
        return None
    st_ref = catalog.get("StructTreeRoot")
    if not isinstance(st_ref, Ref):
        return None
    st = pagetree.resolve_ref(data, xref, st_ref, cache)
    if not isinstance(st, dict):
        return None
    root_kids = st.get("K")
    if root_kids is None:
        return None
    return _parse_element(data, xref, cache, root_kids, 0)


def _parse_element(data, xref, cache, obj, depth) -> Optional[StructElement]:
    if depth >= MAX_STRUCT_DEPTH:
        return None
    resolved = pagetree.resolve(data, xref, obj, cache)
    if not isinstance(resolved, dict):
        return None
    type_name = dict_get_name(resolved, "Type")
    if type_name is not None and type_name == b"MCR":
        return None
    struct_type = dict_get_name(resolved, "S") or Name(b"Unknown")
    title = resolved.get("T")
    alt = resolved.get("Alt")
    page_ref = resolved.get("Pg")
    if not isinstance(page_ref, Ref):
        page_ref = None
    children: list = []
    kids = resolved.get("K")
    if kids is not None:
        _parse_kids(data, xref, cache, kids, children, page_ref, depth)
    return StructElement(bytes(struct_type), title, alt, children, page_ref)


def _parse_kids(data, xref, cache, kids_obj, children, parent_page, depth) -> None:
    if depth >= MAX_STRUCT_DEPTH:
        return
    if isinstance(kids_obj, list):
        for item in kids_obj:
            _parse_kids(data, xref, cache, item, children, parent_page, depth)
        return
    if type(kids_obj) is int:
        children.append(("mcid", (kids_obj, parent_page)))
        return
    if isinstance(kids_obj, Ref):
        resolved = pagetree.resolve_ref(data, xref, kids_obj, cache)
        if resolved is not None:
            _parse_kids(data, xref, cache, resolved, children, parent_page, depth)
        return
    if isinstance(kids_obj, dict):
        type_name = dict_get_name(kids_obj, "Type")
        if type_name == b"MCR":
            mcid = dict_get_int(kids_obj, "MCID")
            if mcid is None:
                return
            pg = kids_obj.get("Pg")
            if not isinstance(pg, Ref):
                pg = parent_page
            children.append(("mcid", (mcid, pg)))
        else:
            struct_type = dict_get_name(kids_obj, "S")
            if struct_type is None:
                return
            pg = kids_obj.get("Pg")
            if not isinstance(pg, Ref):
                pg = parent_page
            sub_children: list = []
            sub_kids = kids_obj.get("K")
            if sub_kids is not None:
                _parse_kids(data, xref, cache, sub_kids, sub_children, pg, depth + 1)
            elem = StructElement(bytes(struct_type), kids_obj.get("T"), kids_obj.get("Alt"), sub_children, pg)
            children.append(("elem", elem))


def get_reading_order(root: StructElement) -> Dict[int, List[int]]:
    """page object number -> ordered MCID list (structtree.zig:72-126)."""
    result: Dict[int, List[int]] = {}
    _collect(root, result, None, 0)
    return result


def _collect(elem: StructElement, result, parent_page, depth) -> None:
    if depth >= MAX_STRUCT_DEPTH:
        return
    if elem.struct_type == b"Artifact":
        return
    current_page = elem.page_ref if elem.page_ref is not None else parent_page
    for kind, payload in elem.children:
        if kind == "elem":
            _collect(payload, result, current_page, depth + 1)
        else:
            mcid, page_ref = payload
            pr = page_ref if page_ref is not None else current_page
            if pr is not None:
                result.setdefault(pr.num, []).append(mcid)
