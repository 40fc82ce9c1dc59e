"""Eager single-process BPE reference — the independent oracle
direction for the distributed learner in zpdfspark/spark/bpe.py.

Byte-pair encoding per Sennrich et al. 2016 ("Neural Machine
Translation of Rare Words with Subword Units"), learned over the
word-frequency table (the standard practice: the corpus collapses to
distinct words x counts before any merge round). This module is
deliberately plain dict-loop Python sharing no machinery with the
Spark implementation; tests and the driver oracle compare the two.

Determinism contract (both implementations):
- words = text.split(" "), empty strings dropped;
- each merge round picks the adjacent-symbol pair with the highest
  frequency weighted by word count, ties broken by lexicographically
  smallest (a, b);
- a merge applies left-to-right, non-overlapping (fold semantics: the
  freshly merged symbol does not immediately re-merge with the next
  input symbol unless it equals `a` again);
- final symbol ids rank by (weighted count desc, symbol asc).
"""

from __future__ import annotations

from typing import Dict, Iterable, List, Tuple

# bump when the reference definition changes — oracle caches key on it
BPE_REF_VERSION = "b2"

DEFAULT_MERGES = 32


def word_counts(texts: Iterable[str]) -> Dict[str, int]:
    wc: Dict[str, int] = {}
    for t in texts:
        for w in (t or "").split(" "):
            if w:
                wc[w] = wc.get(w, 0) + 1
    return wc


def apply_merge(sym: List[str], a: str, b: str) -> List[str]:
    """Left-to-right non-overlapping merge of adjacent (a, b) -> a+b."""
    out: List[str] = []
    ab = a + b
    for x in sym:
        if out and out[-1] == a and x == b:
            out[-1] = ab
        else:
            out.append(x)
    return out


def learn_merges(wc: Dict[str, int], n_merges: int = DEFAULT_MERGES,
                 ) -> Tuple[List[Tuple[str, str]], Dict[str, List[str]]]:
    """Learn `n_merges` merges over the word-frequency table; returns
    (merge list in order, final segmentation per word)."""
    segs = {w: list(w) for w in wc}
    merges: List[Tuple[str, str]] = []
    for _ in range(n_merges):
        pc: Dict[Tuple[str, str], int] = {}
        for w, c in wc.items():
            s = segs[w]
            for i in range(len(s) - 1):
                k = (s[i], s[i + 1])
                pc[k] = pc.get(k, 0) + c
        if not pc:
            break
        best = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[0]
        merges.append(best)
        a, b = best
        for w in segs:
            segs[w] = apply_merge(segs[w], a, b)
    return merges, segs


def symbol_ids(segs: Dict[str, List[str]], wc: Dict[str, int],
               ) -> Dict[str, int]:
    """Final symbol vocabulary ranked by (weighted count desc, symbol
    asc) -> id 0..V-1. Closed set by construction (initial chars + one
    new symbol per merge)."""
    sc: Dict[str, int] = {}
    for w, c in wc.items():
        for s in segs[w]:
            sc[s] = sc.get(s, 0) + c
    ranked = sorted(sc.items(), key=lambda kv: (-kv[1], kv[0]))
    return {s: i for i, (s, _c) in enumerate(ranked)}


def tokenize_docs(doc_texts: List[Tuple[int, str]],
                  n_merges: int = DEFAULT_MERGES,
                  ) -> List[Tuple[int, int, str]]:
    """Learn BPE on the given docs and tokenize them; returns rows
    (doc_id, n_tokens, ids_str) where ids_str is the comma-joined
    ordered id sequence (document word order, then symbol order within
    each word) — the md5 of ids_str is the cross-engine fingerprint.
    Docs whose text contains no non-empty word produce no row (the
    Spark side's groupBy has nothing to group)."""
    wc = word_counts(t for _, t in doc_texts)
    _merges, segs = learn_merges(wc, n_merges)
    ids = symbol_ids(segs, wc)
    word_ids = {w: [ids[s] for s in segs[w]] for w in segs}
    out: List[Tuple[int, int, str]] = []
    for doc_id, text in doc_texts:
        seq: List[int] = []
        for w in (text or "").split(" "):
            if w:
                seq.extend(word_ids[w])
        if seq:
            out.append((doc_id, len(seq),
                        ",".join(str(i) for i in seq)))
    return out


def write_expected_bpe(documents_parquet: str, out_path: str,
                       n_merges: int = DEFAULT_MERGES,
                       merges_path: str = None) -> str:
    """Materialize the eager reference's answer for a documents table
    as parquet (doc_id, n_tokens, ids_str) — the DuckDB oracle reads
    this and recomputes the md5 itself. When ``merges_path`` is given,
    the learned merge table (merge_idx, a, b) is written there too, so
    the oracle can pin the learning step directly, not just through
    the tokenized ids."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    t = pq.read_table(documents_parquet, columns=["doc_id", "text"])
    docs = sorted(zip(t.column("doc_id").to_pylist(),
                      t.column("text").to_pylist()))
    wc = word_counts(txt for _, txt in docs)
    merges, segs = learn_merges(wc, n_merges)
    ids = symbol_ids(segs, wc)
    word_to_ids = {w: [ids[s] for s in segs[w]] for w in segs}
    rows: List[Tuple[int, int, str]] = []
    for doc_id, text in docs:
        seq: List[int] = []
        for w in (text or "").split(" "):
            if w:
                seq.extend(word_to_ids[w])
        if seq:
            rows.append((doc_id, len(seq),
                         ",".join(str(i) for i in seq)))
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "n_tokens": pa.array([r[1] for r in rows], pa.int64()),
        "ids_str": pa.array([r[2] for r in rows], pa.string()),
    }), out_path)
    if merges_path:
        pq.write_table(pa.table({
            "merge_idx": pa.array(range(len(merges)), pa.int64()),
            "a": pa.array([m[0] for m in merges], pa.string()),
            "b": pa.array([m[1] for m in merges], pa.string()),
        }), merges_path)
    return out_path
