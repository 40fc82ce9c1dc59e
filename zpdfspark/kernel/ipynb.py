"""Jupyter notebook (.ipynb) extraction — code-LLM training data.

Notebooks are a first-class source for code-model pipelines (the
nbformat-4 JSON documents GitHub and crawls carry). The reduction
rule mirrors what notebook-to-text converters do: markdown and code
cell sources, in document order, joined with blank lines; raw cells
and outputs are excluded (outputs are generated artifacts, not
authored text).

Mining is stdlib-json on the kernel side; the DuckDB oracle re-mines
the SAME bytes with DuckDB's own JSON functions (decode(html)::JSON,
json_array_length, json_extract) — a genuine two-engine comparison
with no carried truth for the JSON-derived fields.

Language precedence matches nbformat: metadata.kernelspec.language,
else metadata.language_info.name. Tolerant-open: malformed JSON or a
non-notebook object raises IpynbError, which callers treat as data.
"""

from __future__ import annotations

import json
from typing import Optional

_MAX_BYTES = 64 << 20        # a notebook bigger than 64 MiB is hostile
_MAX_CELLS = 100_000


class IpynbError(Exception):
    pass


def looks_like_ipynb(raw: bytes) -> bool:
    head = raw[:64].lstrip(b"\xef\xbb\xbf \t\r\n")
    if head[:1] != b"{":
        return False
    window = raw[:8192]
    return b'"cells"' in window and b'"nbformat"' in window


def _cell_source(cell: dict) -> str:
    src = cell.get("source", "")
    if isinstance(src, list):
        src = "".join(s for s in src if isinstance(s, str))
    return src if isinstance(src, str) else ""


def parse_ipynb(raw: bytes) -> dict:
    """-> {text, n_cells, n_code, n_markdown, language, nbformat}."""
    if len(raw) > _MAX_BYTES or not looks_like_ipynb(raw):
        raise IpynbError("not a notebook")
    try:
        nb = json.loads(raw)
    except (ValueError, UnicodeDecodeError) as e:
        raise IpynbError(f"malformed notebook JSON: {e}") from e
    if not isinstance(nb, dict) or not isinstance(nb.get("cells"), list):
        raise IpynbError("notebook without a cells list")
    cells = nb["cells"][:_MAX_CELLS]
    n_code = n_md = 0
    parts = []
    for cell in cells:
        if not isinstance(cell, dict):
            continue
        ctype = cell.get("cell_type")
        if ctype == "code":
            n_code += 1
        elif ctype == "markdown":
            n_md += 1
        else:
            continue                      # raw cells excluded
        src = _cell_source(cell).strip()
        if src:
            parts.append(src)
    meta = nb.get("metadata") or {}
    ks = meta.get("kernelspec") or {}
    li = meta.get("language_info") or {}
    language = ks.get("language") or li.get("name") or None
    nbformat = nb.get("nbformat")
    return {
        "text": "\n\n".join(parts),
        "n_cells": len(cells),
        "n_code": n_code,
        "n_markdown": n_md,
        "language": language if isinstance(language, str) else None,
        "nbformat": nbformat if isinstance(nbformat, int) else None,
    }
