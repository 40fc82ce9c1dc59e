"""Distributed BPE: learn a byte-pair-encoding merge table over a
corpus and tokenize it — all JVM-side (no Python UDFs anywhere).

The reference pipeline's tokenization step at pre-training fidelity
(upgrades the top-K word-vocab `tokenize_ids` from a toy vocabulary to
actual subword merges; Sennrich et al. 2016). The eager oracle twin is
zpdfspark/bpe_ref.py — see its module docstring for the shared
determinism contract (tie-breaks, fold semantics, id ranking).

Scale shape, designed for a crawl-size corpus:
- BPE learns over the WORD-FREQUENCY table, not the corpus: one
  map-side-combining groupBy collapses 10^12 documents to distinct
  words x counts (Zipf: ~10^7-10^8 rows at crawl scale), and every
  merge round thereafter touches only that table.
- Each round = explode adjacent symbol pairs (weighted), aggregate,
  take the argmax via orderBy+limit(1) — a distributed TakeOrdered
  whose only driver-side materialization is ONE row per round (the
  same bounded-probe pattern as connected components' convergence
  check in spark/cc.py).
- The merge applies as a JVM higher-order fold (F.aggregate) over the
  symbol arrays — map-only, no shuffle; localCheckpoint every few
  rounds truncates lineage so 32 rounds don't compound into one giant
  codegen unit.
- Tokenizing the corpus re-joins docs to the word->ids map on `word`
  with NO forced broadcast: the distinct-word table of a crawl may
  exceed the driver's broadcast budget, so AQE picks broadcast vs
  shuffle from the actual built size at runtime (the r3-verdict
  unigram_logprob lesson applied from day one here).
"""

from __future__ import annotations

from typing import List, Tuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Window

DEFAULT_MERGES = 32


def _fold_merge(sym_col, a: str, b: str):
    """JVM left-to-right non-overlapping merge of adjacent (a, b) ->
    a+b, mirroring bpe_ref.apply_merge's fold exactly."""
    return F.aggregate(
        sym_col,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1),
                     F.array(F.lit(a + b))),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _adjacent_pairs(df: DataFrame) -> DataFrame:
    """(a, b, total) weighted adjacent-pair counts over current
    segmentations. zip_with keeps the pair construction JVM-side and
    names the struct fields deterministically."""
    pair = F.zip_with(
        F.slice("sym", 1, F.size("sym") - 1),
        F.slice("sym", 2, F.size("sym") - 1),
        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
    )
    return (
        df.where(F.size("sym") >= 2)
        .select("cnt", F.explode(pair).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"), "cnt")
        .groupBy("a", "b")
        .agg(F.sum("cnt").alias("total"))
    )


def learn_bpe(word_counts: DataFrame, n_merges: int = DEFAULT_MERGES,
              checkpoint_every: int = 4,
              ) -> Tuple[List[Tuple[str, str]], DataFrame]:
    """Learn `n_merges` merges over a (word, cnt) DataFrame; returns
    (ordered merge list, final (word, cnt, sym) segmentation DF —
    localCheckpointed, safe to reuse without recompute)."""
    cur = word_counts.select(
        "word", "cnt", F.split("word", "").alias("sym"))
    cur = cur.localCheckpoint(eager=True)
    merges: List[Tuple[str, str]] = []
    for i in range(n_merges):
        best = (_adjacent_pairs(cur)
                .orderBy(F.desc("total"), F.asc("a"), F.asc("b"))
                .limit(1).collect())
        if not best:
            break
        a, b = best[0]["a"], best[0]["b"]
        merges.append((a, b))
        cur = cur.withColumn("sym", _fold_merge(F.col("sym"), a, b))
        if (i + 1) % checkpoint_every == 0 or i == n_merges - 1:
            cur = cur.localCheckpoint(eager=True)
    return merges, cur


def bpe_tokenize(docs: DataFrame, n_merges: int = DEFAULT_MERGES,
                 text_col: str = "text", id_col: str = "doc_id",
                 ) -> DataFrame:
    """Learn BPE on `docs` and tokenize them: returns (doc_id,
    n_tokens, ids_md5) where ids_md5 fingerprints the ORDERED id
    sequence (document word order, then symbol order within each
    word) — position-sensitive, so any drift in merges, ranking, or
    assembly breaks the hash."""
    words = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "word"),
    ).where(F.col("word") != "")
    wc = words.groupBy("word").agg(F.count("*").alias("cnt"))
    _merges, segs = learn_bpe(wc, n_merges)

    # symbol ids: closed vocabulary (initial chars + one symbol per
    # merge), ranked by weighted count then symbol. TakeOrdered caps
    # the ranking window's input by construction (same guard shape as
    # tokenize_ids); the cap is |chars| + n_merges at minimum but kept
    # wide for safety.
    sym_counts = (
        segs.select(F.explode("sym").alias("symbol"), "cnt")
        .groupBy("symbol").agg(F.sum("cnt").alias("scnt"))
    )
    top = sym_counts.orderBy(F.desc("scnt"), F.asc("symbol")).limit(1 << 20)
    rank_w = Window.orderBy(F.desc("scnt"), F.asc("symbol"))
    ranked = top.select(
        "symbol", (F.row_number().over(rank_w) - 1).alias("sid"))

    # word -> ordered id array (vocab-size table; ranked-symbol side is
    # tiny and broadcast — bounded by chars + merges)
    word_ids = (
        segs.select("word", F.posexplode("sym").alias("spos", "symbol"))
        .join(F.broadcast(ranked), "symbol")
        .groupBy("word")
        .agg(F.transform(
            F.array_sort(F.collect_list(F.struct("spos", "sid"))),
            lambda x: x["sid"]).alias("ids"))
    )

    # corpus re-joins the word->ids map on word: NO broadcast hint (a
    # crawl's distinct-word table can exceed the driver budget; AQE
    # decides from actual size at runtime)
    mapped = words.join(word_ids, "word")
    return (
        mapped.groupBy("doc_id")
        .agg(
            F.sum(F.size("ids")).alias("n_tokens"),
            F.md5(F.concat_ws(",", F.flatten(F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "ids"))),
                lambda x: F.transform(x["ids"],
                                      lambda i: i.cast("string")),
            )))).alias("ids_md5"),
        )
        .orderBy("doc_id")
    )
