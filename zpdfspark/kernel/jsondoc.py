"""JSON / JSON-Lines payload sniffing — crawls carry API responses,
config files and dataset shards as raw JSON; JSONL is the interchange
shape LLM dataset releases ship (one JSON object per line — the C4 /
Dolma / RedPajama layout this repo's own write_jsonl sink emits).

A JSON payload is data, not prose (the tar/mbox "an archive is not a
document" posture): dispatch names it and extracts NO text; the
json_meta census is the crawl signal. Notebook JSON is NOT this class
— looks_like_ipynb must run first in every dispatch (a notebook is
json with cells, and its cell sources ARE training text).

Sniffs are strict (full parse via the stdlib json module) so prose
that merely starts with a brace cannot misfile; a size cap bounds the
parse. Census values themselves are mined by the ENGINES (Spark's JVM
json functions vs DuckDB's json extension — a genuinely two-engine
re-extraction; this module never computes them).
"""

from __future__ import annotations

import json

_MAX_BYTES = 32 << 20


def _loads(raw: bytes) -> bool:
    try:
        json.loads(raw)
        return True
    except (ValueError, UnicodeDecodeError):
        return False


def looks_like_json(raw: bytes) -> bool:
    """One complete JSON object/array document."""
    if len(raw) > _MAX_BYTES:
        return False
    head = raw.lstrip()[:1]
    if head not in (b"{", b"["):
        return False
    return _loads(raw)


def looks_like_jsonl(raw: bytes) -> bool:
    """JSON-Lines: >= 2 non-empty lines, every one a complete JSON
    object/array (the dataset-shard layout)."""
    if len(raw) > _MAX_BYTES:
        return False
    if raw.lstrip()[:1] not in (b"{", b"["):
        return False
    lines = [ln for ln in raw.split(b"\n") if ln.strip()]
    if len(lines) < 2:
        return False
    return all(ln.lstrip()[:1] in (b"{", b"[") and _loads(ln)
               for ln in lines)
