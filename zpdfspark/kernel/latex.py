"""LaTeX source text reduction ("detex") — from scratch.

arXiv source tarballs are a marquee LLM training corpus (the Pile /
RedPajama arXiv slices); crawls also carry standalone .tex. This is
a deliberately scoped detex — the subset that covers real article
bodies, documented here so the claim is honest:

- `%` comments stripped to end-of-line (`\\%` is a literal percent)
- only the body after `\\begin{document}` reduces (preamble is setup,
  not text); `\\end{document}` ends it
- inline and display math dropped: `$..$`, `$$..$$`, `\\(..\\)`,
  `\\[..\\]` (math is notation, not prose — the detex convention)
- skipped environments (content dropped): equation, equation*,
  align, align*, figure, figure*, table, table*, tabular, verbatim
- kept-argument commands (the argument IS prose): emph, textbf,
  textit, texttt, underline, section, subsection, subsubsection,
  paragraph, title, footnote, caption, mbox
- dropped-with-argument commands (markup, not prose): cite, citep,
  citet, ref, eqref, label, usepackage, documentclass, bibliography,
  bibliographystyle, includegraphics, input, include, vspace, hspace
- `\\item` starts a new line; `\\\\` breaks a line; `\\par` and blank
  lines break paragraphs
- escapes `\\& \\% \\$ \\_ \\# \\{ \\}` unescape; `~` is a space;
  unknown commands drop bare (their brace groups stay transparent)

Reduction: paragraphs with internal whitespace collapsed, joined by
newline. Tolerant-open: never raises past LatexError. Metadata
(documentclass, title, section/cite counts) is mined by BOTH engines
with the same regexes (the svg_meta two-engine pattern).
"""

from __future__ import annotations

import re
from typing import List, Optional

_MAX_BYTES = 64 << 20


class LatexError(Exception):
    pass


_KEEP_ARG = {
    "emph", "textbf", "textit", "texttt", "underline", "section",
    "subsection", "subsubsection", "paragraph", "title", "footnote",
    "caption", "mbox",
}
_DROP_ARG = {
    "cite", "citep", "citet", "ref", "eqref", "label", "usepackage",
    "documentclass", "bibliography", "bibliographystyle",
    "includegraphics", "input", "include", "vspace", "hspace",
}
_SKIP_ENVS = {
    "equation", "equation*", "align", "align*", "figure", "figure*",
    "table", "table*", "tabular", "verbatim",
}
_ESCAPES = {"&": "&", "%": "%", "$": "$", "_": "_", "#": "#",
            "{": "{", "}": "}"}
_CMD = re.compile(r"[A-Za-z]+\*?")


def looks_like_tex(raw: bytes) -> bool:
    head = raw[:4096]
    return (b"\\documentclass" in head or b"\\begin{document}" in head)


def _strip_comments(text: str) -> str:
    out = []
    for line in text.split("\n"):
        i = 0
        while True:
            i = line.find("%", i)
            if i == -1:
                break
            if i > 0 and line[i - 1] == "\\":
                i += 1
                continue
            line = line[:i]
            break
        out.append(line)
    return "\n".join(out)


def _read_group(text: str, i: int) -> tuple:
    """text[i] == '{' -> (content, index past the matching brace)."""
    depth = 0
    j = i
    n = len(text)
    while j < n:
        c = text[j]
        if c == "\\" and j + 1 < n:
            j += 2
            continue
        if c == "{":
            depth += 1
        elif c == "}":
            depth -= 1
            if depth == 0:
                return text[i + 1:j], j + 1
        j += 1
    return text[i + 1:], n


def _detex(text: str) -> str:
    out: List[str] = []
    i, n = 0, len(text)
    while i < n:
        c = text[i]
        if c == "\\":
            nxt = text[i + 1:i + 2]
            if nxt in _ESCAPES:
                out.append(_ESCAPES[nxt])
                i += 2
                continue
            if nxt == "\\":
                out.append("\n")
                i += 2
                continue
            if nxt in ("(", "["):
                close = "\\)" if nxt == "(" else "\\]"
                j = text.find(close, i + 2)
                i = n if j == -1 else j + 2
                continue
            m = _CMD.match(text, i + 1)
            if not m:
                i += 2
                continue
            cmd = m.group(0)
            j = m.end()
            if cmd == "par":
                out.append("\n\n")
                i = j
                continue
            if cmd == "item":
                out.append("\n")
                i = j
                continue
            if cmd == "begin" or cmd == "end":
                if text[j:j + 1] == "{":
                    env, k = _read_group(text, j)
                    if cmd == "begin" and env.strip() in _SKIP_ENVS:
                        endtok = "\\end{" + env.strip() + "}"
                        e = text.find(endtok, k)
                        i = n if e == -1 else e + len(endtok)
                        continue
                    i = k
                    continue
                i = j
                continue
            # optional [..] argument(s)
            while text[j:j + 1] == "[":
                e = text.find("]", j)
                j = n if e == -1 else e + 1
            if cmd in _DROP_ARG:
                while text[j:j + 1] == "{":
                    _, j = _read_group(text, j)
                    while text[j:j + 1] == "[":
                        e = text.find("]", j)
                        j = n if e == -1 else e + 1
                i = j
                continue
            if cmd in _KEEP_ARG and text[j:j + 1] == "{":
                arg, j = _read_group(text, j)
                out.append(_detex(arg))
                if cmd.startswith("section") or cmd in (
                        "section", "subsection", "subsubsection",
                        "paragraph", "title"):
                    out.append("\n\n")
                i = j
                continue
            # unknown command: drop it (brace groups stay transparent);
            # swallow the single following space TeX eats
            if text[j:j + 1] == " ":
                j += 1
            i = j
            continue
        if c == "$":
            dbl = text[i + 1:i + 2] == "$"
            close = "$$" if dbl else "$"
            j = text.find(close, i + (2 if dbl else 1))
            i = n if j == -1 else j + len(close)
            continue
        if c == "~":
            out.append(" ")
            i += 1
            continue
        if c in "{}":
            i += 1
            continue
        out.append(c)
        i += 1
    return "".join(out)


def parse_latex(raw: bytes) -> dict:
    """-> {text, documentclass, title, n_sections, n_cites,
    n_equations}."""
    if len(raw) > _MAX_BYTES or not looks_like_tex(raw):
        raise LatexError("not a LaTeX source")
    src = raw.decode("utf-8", "replace")
    stripped = _strip_comments(src)
    m = re.search(r"\\begin\{document\}", stripped)
    body = stripped[m.end():] if m else stripped
    e = body.find("\\end{document}")
    if e != -1:
        body = body[:e]
    # metadata mined on the comment-stripped FULL source (title sits
    # in the preamble) with regexes both engines share
    dc = re.search(r"\\documentclass(?:\[[^\]]*\])?\{([^}]*)\}", stripped)
    ti = re.search(r"\\title\{([^}]*)\}", stripped)
    n_sections = len(re.findall(r"\\section\{", stripped))
    n_cites = len(re.findall(r"\\cite[pt]?\{", stripped))
    n_equations = len(re.findall(
        r"\\begin\{(?:equation|align)\*?\}", stripped))
    text = _detex(body)
    paras = []
    for para in re.split(r"\n\s*\n", text):
        para = re.sub(r"[ \t]+", " ", para.replace("\n", " ")).strip()
        if para:
            paras.append(para)
    return {
        "text": "\n".join(paras),
        "documentclass": dc.group(1) if dc else None,
        "title": ti.group(1).strip() if ti else None,
        "n_sections": n_sections,
        "n_cites": n_cites,
        "n_equations": n_equations,
    }
