"""SVG metadata mining — the modern web's vector image format.

Crawls carry SVG both as standalone payloads (logos, icons, charts)
and inline; a pipeline keeps the vector METADATA (canvas dims, text
presence, path census, accessible title) without rasterizing — there
is no rasterizer dependency here, matching the engine's honest-stub
posture for codec decode (kernel/webp.py, kernel/mp4.py).

Extracted TEXT for an SVG payload flows through the HTML stripper
(kernel/htmltext.py extract_any: an SVG document satisfies the markup
sniff, its <text>/<title>/<desc> content is exactly what tag-strip +
whitespace-collapse preserves, and <style> is dropped) — so this
module is metadata-only, the svg sibling of kernel/webp.py.

Dimension resolution follows what renderers do: explicit pixel
width/height attributes on the root <svg> tag win; otherwise the
viewBox's width/height (3rd/4th numbers) stand in. Unit-suffixed
lengths (cm/em/%) are not pixels and fall through to the viewBox.
"""

from __future__ import annotations

import html as html_mod
import re


class SvgError(ValueError):
    pass


_SVG_TAG = re.compile(rb"<svg\b[^>]*>", re.S)
_WIDTH = re.compile(rb'\bwidth="(\d{1,7})(?:px)?"')
_HEIGHT = re.compile(rb'\bheight="(\d{1,7})(?:px)?"')
_VIEWBOX = re.compile(
    rb'\bviewBox="\s*[-0-9.]+[\s,]+[-0-9.]+[\s,]+([0-9]+(?:\.[0-9]+)?)'
    rb'[\s,]+([0-9]+(?:\.[0-9]+)?)')
_TEXT = re.compile(rb"<text[\s>]")
_PATH = re.compile(rb"<path[\s>]")
_TITLE = re.compile(rb"<title[^>]*>([^<]*)</title>")


def looks_like_svg(raw: bytes) -> bool:
    """Standalone-SVG sniff: the root element in the head window is
    <svg. Must run BEFORE looks_like_html in any dispatch (an SVG
    document satisfies the generous markup head check)."""
    head = raw[:512].lstrip(b"\xef\xbb\xbf \t\r\n")
    if not head.startswith(b"<"):
        return False
    # strip one xml decl / doctype / comment run, then demand <svg
    pos = 0
    for _ in range(4):
        m = re.match(rb"<(\?xml|!DOCTYPE|!--)[^>]*>\s*", head[pos:])
        if not m:
            break
        pos += m.end()
    return head[pos:pos + 4] == b"<svg"


def parse_svg(raw: bytes) -> dict:
    """Mine root-canvas metadata. Returns {width, height, n_texts,
    n_paths, title}; raises SvgError when no <svg> root exists —
    callers treat that as data, not a task failure. width/height are
    None when neither pixel attributes nor a viewBox resolve them."""
    m = _SVG_TAG.search(raw[:4096])
    if not m:
        raise SvgError("no <svg> root element")
    tag = m.group(0)
    w = h = None
    wm, hm = _WIDTH.search(tag), _HEIGHT.search(tag)
    if wm and hm:
        w, h = int(wm.group(1)), int(hm.group(1))
    else:
        vb = _VIEWBOX.search(tag)
        if vb:
            w, h = int(float(vb.group(1))), int(float(vb.group(2)))
    t = _TITLE.search(raw)
    return {
        "width": w,
        "height": h,
        "n_texts": len(_TEXT.findall(raw)),
        "n_paths": len(_PATH.findall(raw)),
        "title": html_mod.unescape(
            t.group(1).decode("utf-8", "replace")) if t else None,
    }
