"""jusText-style HTML block classification (DOM boilerplate heuristics).

Implements the context-sensitive paragraph-classification algorithm of
Pomikalek, "Removing Boilerplate and Duplicate Content from Web
Corpora" (PhD thesis, Masaryk University, 2011) — the published
algorithm behind the jusText tool — from the paper's description, over
the same deterministic regex segmentation the text extractor uses
(kernel/htmltext.py). This is the deeper DOM heuristic the north rule
names ("HTML boilerplate strip, DOM heuristics"): instead of a single
link-density line rule, every block is scored on length, link density
and stopword density, then SHORT/NEAR-GOOD blocks are resolved from
their neighbours' classes.

Semantics (the spec for the fixture oracles):

1. segmentation: comments and <script>/<style>/<template>/<noscript>
   and <head> are removed (these can never be content); unlike the
   text extractor, <nav>/<header>/<footer>/<aside> are KEPT — the
   classifier's job is to label them, not a tag list. Source newlines
   normalize to spaces; the document splits into blocks at block-level
   tags (the text extractor's tag set plus nav/header/footer/aside);
   whitespace-only segments are not blocks.
2. per-block features, on entity-unescaped visible text:
   n_chars, n_words (whitespace tokens), link_density = anchor
   chars / n_chars (anchors fully inside the block), stopword_density
   = fraction of words in the fixed English stoplist (tokens
   lowercased, leading/trailing non-alphanumerics stripped).
3. context-free classes, with the thesis' default parameters
   (MAX_LINK_DENSITY=0.2, LENGTH_LOW=70, LENGTH_HIGH=200,
   STOPWORDS_LOW=0.30, STOPWORDS_HIGH=0.32), headings mode off:
     link_density > 0.2                      -> bad
     copyright sign in text                  -> bad
     n_chars < 70: bad if any link else short
     stop_density >= 0.32: good if n_chars > 200 else neargood
     stop_density >= 0.30                    -> neargood
     else                                    -> bad
4. context-sensitive revision (the algorithm's core):
     short:   look at the nearest non-short/neargood neighbour class
              on each side (document edges count as bad);
              (good, good) -> good; (bad, bad) -> bad; mixed -> good
              iff the bad side's nearest neighbour INCLUDING
              neargood blocks is neargood, else bad
     neargood: (bad, bad) -> bad, anything else -> good
     good/bad are final.

At 100 TB this runs inside the same map-only Arrow task as extraction
(one block list per document, no shuffle); the per-language stoplist
generalization is a small broadcast map (language -> frozenset), never
a join.
"""

from __future__ import annotations

import html as html_mod
import re

from .htmltext import _COMMENT_RE, _TAG_RE, sniff_charset

MAX_LINK_DENSITY = 0.2
LENGTH_LOW = 70
LENGTH_HIGH = 200
STOPWORDS_LOW = 0.30
STOPWORDS_HIGH = 0.32

# fixed English stoplist (function words); the thesis ships per-language
# lists — at scale this becomes a broadcast language->frozenset map
STOPWORDS = frozenset("""
a about above after again all an and any are as at be because been
before being below between both but by could did do does down during
each few for from further had has have he her here hers him his how i
if in into is it its just me more most my no nor not now of off on
once only or other our out over own same she should so some such than
that the their them then there these they this those through to too
under until up very was we were what when where which while who why
will with would you your
""".split())

# content can never live in these: remove entirely before segmentation
_REMOVE_RES = [
    re.compile(
        rb"<" + name + rb"\b[^>]*>.*?</" + name + rb"\s*>",
        re.DOTALL | re.IGNORECASE,
    )
    for name in (b"script", b"style", b"template", b"noscript", b"head")
]
# block separators: the text extractor's set PLUS the sectioning
# containers the classifier keeps (nav/header/footer/aside/main)
_SEP_RE = re.compile(
    rb"</?(?:p|div|br|li|ul|ol|tr|td|th|table|h[1-6]|section|article|"
    rb"blockquote|pre|main|body|html|form|figure|nav|header|footer|"
    rb"aside)\b[^>]*/?>",
    re.IGNORECASE,
)
_A_RE = re.compile(rb"<a\b[^>]*>(.*?)</a\s*>", re.DOTALL | re.IGNORECASE)
_WS_RE = re.compile(r"\s+")
_TOKEN_EDGE_RE = re.compile(r"^[^0-9A-Za-z]+|[^0-9A-Za-z]+$")


def _visible(bs: bytes, codec: str) -> str:
    return _WS_RE.sub(
        " ", html_mod.unescape(_TAG_RE.sub(b"", bs).decode(codec, "replace"))
    ).strip()


def segment_blocks(raw: bytes) -> list:
    """Split an HTML payload into feature-scored blocks. Never raises;
    hostile bytes yield an empty list."""
    try:
        codec = sniff_charset(raw)
        if codec.startswith("utf-16"):
            raw = raw.decode(codec, "replace").lstrip("﻿").encode(
                "utf-8", "replace")
            codec = "utf-8"
        elif raw[:3] == b"\xef\xbb\xbf":
            raw = raw[3:]
        data = _COMMENT_RE.sub(b"", raw)
        for rx in _REMOVE_RES:
            data = rx.sub(b"", data)
        data = data.replace(b"\r", b" ").replace(b"\n", b" ")
        blocks = []
        for seg in _SEP_RE.split(data):
            text = _visible(seg, codec)
            if not text:
                continue
            words = text.split(" ")
            link_chars = sum(
                len(_visible(m, codec)) for m in _A_RE.findall(seg))
            n_stop = sum(
                1 for w in words
                if _TOKEN_EDGE_RE.sub("", w).lower() in STOPWORDS)
            blocks.append({
                "idx": len(blocks),
                "text": text,
                "n_chars": len(text),
                "n_words": len(words),
                "link_density": min(1.0, link_chars / len(text)),
                "stopword_density": n_stop / len(words),
            })
        return blocks
    except Exception:
        return []


def _classify_cf(b: dict) -> str:
    if b["link_density"] > MAX_LINK_DENSITY:
        return "bad"
    if "©" in b["text"]:
        return "bad"
    if b["n_chars"] < LENGTH_LOW:
        return "bad" if b["link_density"] > 0 else "short"
    if b["stopword_density"] >= STOPWORDS_HIGH:
        return "good" if b["n_chars"] > LENGTH_HIGH else "neargood"
    if b["stopword_density"] >= STOPWORDS_LOW:
        return "neargood"
    return "bad"


def _neighbour(labels: list, i: int, step: int, ignore_neargood: bool) -> str:
    """Nearest neighbour class in direction ``step``; document edges
    read as bad (the thesis' boundary condition)."""
    j = i + step
    while 0 <= j < len(labels):
        lab = labels[j]
        if lab in ("good", "bad"):
            return lab
        if lab == "neargood" and not ignore_neargood:
            return "neargood"
        j += step
    return "bad"


def classify_blocks(raw: bytes) -> list:
    """segment_blocks + context-free + context-sensitive labels; each
    block dict gains ``label_cf`` and ``label``."""
    blocks = segment_blocks(raw)
    labels = [_classify_cf(b) for b in blocks]
    final = list(labels)
    for i, lab in enumerate(labels):
        if lab == "short":
            prev = _neighbour(labels, i, -1, ignore_neargood=True)
            nxt = _neighbour(labels, i, 1, ignore_neargood=True)
            if prev == "good" and nxt == "good":
                final[i] = "good"
            elif prev == "bad" and nxt == "bad":
                final[i] = "bad"
            elif ((prev == "bad" and _neighbour(
                    labels, i, -1, ignore_neargood=False) == "neargood")
                  or (nxt == "bad" and _neighbour(
                      labels, i, 1, ignore_neargood=False) == "neargood")):
                final[i] = "good"
            else:
                final[i] = "bad"
        elif lab == "neargood":
            prev = _neighbour(labels, i, -1, ignore_neargood=True)
            nxt = _neighbour(labels, i, 1, ignore_neargood=True)
            final[i] = "bad" if (prev == "bad" and nxt == "bad") else "good"
    for b, cf, lab in zip(blocks, labels, final):
        b["label_cf"] = cf
        b["label"] = lab
    return blocks


def extract_dense_text(raw: bytes) -> str:
    """Main content under the block classifier: the concatenation of
    good blocks (newline-joined) — the thesis' extraction rule. The
    sibling of htmltext.extract_main_text with the deeper heuristic."""
    return "\n".join(
        b["text"] for b in classify_blocks(raw) if b["label"] == "good")
