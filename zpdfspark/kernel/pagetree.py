"""Page tree: object resolution, catalog walk, attribute inheritance,
object-stream (ObjStm) fetch, page content assembly.

Fresh Python implementation matching /root/reference/src/pagetree.zig:

- resolveRef with per-document memo cache; free/missing/broken -> None
  object (pagetree.zig:41-71)
- ObjStm resolution: /N, /First header of (num, offset) pairs, object at
  relative offset (pagetree.zig:73-146)
- catalog -> /Pages DFS over /Kids, MediaBox/CropBox/Rotate/Resources
  inheritance with leaf override, cycle detection via a per-path visited
  set, /Type inferred from /Kids when absent (pagetree.zig:149-291)
- MediaBox defaults to US Letter [0,0,612,792] (pagetree.zig:187)
- /Contents may be stream, ref, or array of streams concatenated with a
  '\\n' appended after each stream (pagetree.zig:309-360)
"""

from __future__ import annotations

from typing import Dict, List, Optional

from . import crypto, filters
from .objects import (
    Name,
    Parser,
    ParseError,
    Ref,
    Stream,
    dict_get_array,
    dict_get_int,
    dict_get_name,
)
from .xref import COMPRESSED, FREE, IN_USE, XRefTable


class Page:
    __slots__ = ("ref", "dict", "media_box", "crop_box", "rotation", "resources")

    def __init__(self, ref, d, media_box, crop_box, rotation, resources):
        self.ref = ref
        self.dict = d
        self.media_box = media_box
        self.crop_box = crop_box
        self.rotation = rotation
        self.resources = resources


class PageTreeError(Exception):
    pass


def resolve_ref(data: bytes, xref: XRefTable, ref: Ref, cache: Dict[int, object]):
    """Resolve an indirect reference (pagetree.zig:41-71)."""
    hit = cache.get(ref.num, _MISS)
    if hit is not _MISS:
        return hit
    entry = xref.get(ref.num)
    if entry is None:
        return None
    offset, gen_or_index, etype = entry
    if etype == FREE:
        return None
    if etype == IN_USE:
        if offset >= len(data):
            return None
        p = Parser(data, offset)
        try:
            _num, _gen, obj = p.parse_indirect_object()
        except ParseError:
            return None
        ctx = cache.get(crypto.CRYPT_CACHE_KEY)
        if ctx is not None and _num != ctx.encrypt_num:
            obj = crypto.transform_object(obj, _num, _gen, ctx)
        cache[ref.num] = obj
        return obj
    # COMPRESSED: inside an object stream
    return _resolve_compressed(data, xref, offset, gen_or_index, cache)


_MISS = object()


def _resolve_compressed(data: bytes, xref: XRefTable, objstm_num: int, index: int, cache: Dict[int, object]):
    """ObjStm fetch (pagetree.zig:73-146).

    The decoded container + its offset header are memoized per document
    under a tuple key in the resolution cache (int object numbers never
    collide with tuples) — without this, a document whose N objects
    live in one ObjStm re-inflates the stream N times (O(N^2))."""
    memo_key = ("objstm", objstm_num)
    memo = cache.get(memo_key)
    if memo is None:
        entry = xref.get(objstm_num)
        if entry is None or entry[2] != IN_USE or entry[0] >= len(data):
            return None
        p = Parser(data, entry[0])
        try:
            _num, _gen, obj = p.parse_indirect_object()
        except ParseError:
            return None
        if not isinstance(obj, Stream):
            return None
        # the CONTAINER stream decrypts; members inside it are covered by
        # the container's encryption and are never re-decrypted
        # (ISO 32000-1 §7.6.2; kernel/crypto.py)
        ctx = cache.get(crypto.CRYPT_CACHE_KEY)
        if ctx is not None:
            obj = crypto.transform_object(obj, _num, _gen, ctx)
        try:
            decoded = filters.decompress_stream(obj.raw, obj.dict.get("Filter"), obj.dict.get("DecodeParms"))
        except filters.DecompressError:
            return None
        n = dict_get_int(obj.dict, "N")
        first = dict_get_int(obj.dict, "First")
        if n is None or first is None or n <= 0 or first < 0:
            return None
        hp = Parser(decoded, 0)
        offsets = []
        for _ in range(n):
            try:
                num = hp.parse_object()
                off = hp.parse_object()
            except ParseError:
                break
            if type(num) is not int or type(off) is not int:
                break
            offsets.append((num, off))
        memo = (decoded, first, offsets)
        cache[memo_key] = memo
    decoded, first, offsets = memo
    if index >= len(offsets):
        return None
    rel = offsets[index][1]
    if first + rel >= len(decoded):
        return None
    op = Parser(decoded, first + rel)
    try:
        result = op.parse_object()
    except ParseError:
        return None
    cache[offsets[index][0]] = result
    return result


def resolve(data, xref, obj, cache):
    """Resolve obj if it is a Ref, else return it unchanged."""
    if isinstance(obj, Ref):
        return resolve_ref(data, xref, obj, cache)
    return obj


def _extract_box(d: dict, key: str):
    arr = dict_get_array(d, key)
    if arr is None or len(arr) != 4:
        return None
    box = []
    for elem in arr:
        if type(elem) is int or type(elem) is float:
            box.append(float(elem))
        else:
            return None
    return box


DEFAULT_MEDIABOX = (0.0, 0.0, 612.0, 792.0)


def build_page_tree(data: bytes, xref: XRefTable, cache: Optional[Dict[int, object]] = None) -> List[Page]:
    """Flatten the page tree to an array (pagetree.zig:149-204)."""
    if cache is None:
        cache = {}
    root_ref = xref.trailer.get("Root")
    if not isinstance(root_ref, Ref):
        raise PageTreeError("catalog not found")
    catalog = resolve_ref(data, xref, root_ref, cache)
    if not isinstance(catalog, dict):
        raise PageTreeError("catalog not found")
    pages_ref = catalog.get("Pages")
    if not isinstance(pages_ref, Ref):
        raise PageTreeError("pages not found")
    pages: List[Page] = []
    visited: set = set()
    _walk(data, xref, cache, visited, pages, pages_ref, list(DEFAULT_MEDIABOX), None, 0, None)
    return pages


def _walk(data, xref, cache, visited, pages, node_ref: Ref, mediabox, cropbox, rotation, resources):
    if node_ref.num in visited:
        raise PageTreeError("circular reference")
    visited.add(node_ref.num)
    try:
        node = resolve_ref(data, xref, node_ref, cache)
        if not isinstance(node, dict):
            raise PageTreeError("invalid page tree node")
        type_name = dict_get_name(node, "Type")
        if type_name is None:
            # infer from structure (pagetree.zig:236-237)
            type_name = b"Pages" if node.get("Kids") is not None else b"Page"
        mb = _extract_box(node, "MediaBox") or mediabox
        cb = _extract_box(node, "CropBox") or cropbox
        rot = dict_get_int(node, "Rotate")
        if rot is None:
            rot = rotation
        res = resources
        res_obj = node.get("Resources")
        if res_obj is not None:
            resolved = resolve(data, xref, res_obj, cache)
            if isinstance(resolved, dict):
                res = resolved
        if type_name == b"Pages":
            kids = dict_get_array(node, "Kids")
            if kids is None:
                return
            for kid in kids:
                if isinstance(kid, Ref):
                    _walk(data, xref, cache, visited, pages, kid, mb, cb, rot, res)
        elif type_name == b"Page":
            pages.append(Page(node_ref, node, mb, cb if cb is not None else mb, rot, res))
        # unknown node types ignored
    finally:
        visited.discard(node_ref.num)


def get_page_contents(data: bytes, xref: XRefTable, page: Page, cache: Dict[int, object]) -> bytes:
    """Assemble the decoded content stream(s) for a page
    (pagetree.zig:309-360)."""
    contents = page.dict.get("Contents")
    if contents is None:
        return b""
    return _get_stream_data(data, xref, contents, cache)


def _get_stream_data(data, xref, obj, cache) -> bytes:
    if isinstance(obj, Ref):
        resolved = resolve_ref(data, xref, obj, cache)
        return _get_stream_data(data, xref, resolved, cache)
    if isinstance(obj, Stream):
        return filters.stream_data(obj)
    if isinstance(obj, list):
        parts = []
        for item in obj:
            parts.append(_get_stream_data(data, xref, item, cache))
            parts.append(b"\n")  # separator after each stream (pagetree.zig:353)
        return b"".join(parts)
    return b""
