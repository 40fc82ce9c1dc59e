"""Accuracy harness: corpus-wide extraction-quality statistics.

The analog of the reference's differential oracle
(/root/reference/benchmark/accuracy.py: char-level difflib similarity +
word-error-rate vs a reference extractor after whitespace
normalization). Here the reference text is the corpus's self-carried
oracle, and the comparison runs distributed (a mapInPandas scoring
kernel over the extraction output), so the same harness scales to real
corpora scored against any reference column.

Usage: python tools/accuracy.py [n_docs] [seed]
Prints one JSON line with similarity/WER aggregates per extraction mode.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _normalize(text: str) -> str:
    """Whitespace normalization matching the reference harness
    (accuracy.py:32-50): collapse all whitespace runs to single spaces."""
    return " ".join(text.split())


def score_batches(mode: str):
    import difflib

    import pandas as pd

    from zpdfspark.kernel.htmltext import extract_any

    def fn(batches):
        for batch in batches:
            out = {"url": [], "similarity": [], "wer": []}
            for url, blob, ref in zip(batch["url"], batch["html"], batch["text"]):
                if ref is None:
                    continue
                got, _kind, _doc = extract_any(
                    bytes(blob) if blob is not None else b"", mode)
                a = _normalize(got)
                b = _normalize(ref)
                sim = difflib.SequenceMatcher(None, a, b).ratio() if (a or b) else 1.0
                aw, bw = a.split(), b.split()
                ops = difflib.SequenceMatcher(None, aw, bw).get_opcodes()
                errs = sum(max(i2 - i1, j2 - j1)
                           for tag, i1, i2, j1, j2 in ops if tag != "equal")
                wer = errs / max(len(bw), 1)
                out["url"].append(url)
                out["similarity"].append(sim)
                out["wer"].append(wer)
            yield pd.DataFrame(out)

    return fn


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 42

    from zpdfspark.fixtures import CORPUS_VERSION, write_corpus_parquet
    from zpdfspark.spark.session import get_spark

    import pyspark.sql.functions as F

    path = f"/tmp/zpdfspark_acc_{CORPUS_VERSION}_{n_docs}_{seed}.parquet"
    if not os.path.exists(path):
        write_corpus_parquet(path + ".tmp", n_docs, seed=seed)
        os.replace(path + ".tmp", path)

    spark = get_spark(8, "accuracy")
    df = spark.read.parquet(path)
    result = {}
    for mode in ("accuracy", "fast"):
        scored = df.select("url", "html", "text").mapInPandas(
            score_batches(mode), "url string, similarity double, wer double")
        agg = scored.agg(
            F.count("*").alias("n"),
            F.round(F.avg("similarity"), 4).alias("mean_sim"),
            F.round(F.min("similarity"), 4).alias("min_sim"),
            F.round(F.avg("wer"), 4).alias("mean_wer"),
            F.sum((F.col("similarity") < 1.0).cast("int")).alias("imperfect"),
        ).collect()[0]
        result[mode] = {k: agg[k] for k in
                        ("n", "mean_sim", "min_sim", "mean_wer", "imperfect")}
    spark.stop()
    print(json.dumps(result))


if __name__ == "__main__":
    main()
