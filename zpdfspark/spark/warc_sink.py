"""WET export sink: Common Crawl distributes extracted text as
*.warc.wet.gz files of `conversion` records (one per capture, plain
UTF-8 text) — the hand-off format downstream LLM-data pipelines
(CCNet, C4, RefinedWeb) consume. A reference user switching engines
needs their extraction output in exactly this shape.

Scale design: extraction, WET serialization and the file write are
FUSED into one mapInPandas pass — document blobs never cross a stage
boundary (the round-3 measured finding: the two-stage WARC form spent
~76% extra wall on exactly that Arrow round-trip). One WET file per
partition; `partitions` sizes the files (Common Crawl targets
~150 MB/file — at 100 TB pick partitions accordingly). Records stream
to disk member-by-member (kernel/warc.py wet_records), so a partition
never materializes its whole file in memory.

Determinism + idempotence: membership is hash(url) % partitions,
record order is sortWithinPartitions(url), record ids are md5-derived
and gzip mtimes are pinned — the same input at the same partition
count re-runs to byte-identical files, written via temp + atomic
os.replace so a re-run or speculative twin never leaves a torn file.
Local/shared-filesystem writer; an object-store deployment would swap
the open/replace pair for a committer, the record stream is unchanged.
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame


def write_wet(df: DataFrame, out_dir: str, mode: str = "accuracy",
              partitions: Optional[int] = None) -> DataFrame:
    """df(url, warc_ts, html) -> WET files under out_dir; returns a
    small summary DataFrame (file, n_records, n_bytes), one row per
    non-empty partition. The returned plan is lazy — the files are
    written when the summary is consumed."""
    spark = df.sparkSession
    n = partitions or spark.sparkContext.defaultParallelism
    os.makedirs(out_dir, exist_ok=True)
    src = (df.select("url", "warc_ts", "html")
           .repartition(n, "url")
           .sortWithinPartitions("url"))

    def batches(it):
        import pandas as pd
        from pyspark import TaskContext

        from zpdfspark.kernel.htmltext import extract_any
        from zpdfspark.kernel.warc import wet_records

        ctx = TaskContext.get()
        pid = ctx.partitionId()
        name = f"wet-{pid:05d}.warc.wet.gz"

        def docs():
            for b in it:
                for url, ts, blob in zip(b["url"], b["warc_ts"],
                                         b["html"]):
                    raw = bytes(blob) if blob is not None else b""
                    text = extract_any(raw, mode)[0]
                    date = ("1970-01-01T00:00:00Z" if pd.isna(ts)
                            else ts.strftime("%Y-%m-%dT%H:%M:%SZ"))
                    yield url, date, text

        tmp = os.path.join(
            out_dir, f".{name}.tmp-{ctx.taskAttemptId()}")
        n_records = n_bytes = 0
        f = None
        try:
            for member in wet_records(name, docs()):
                if f is None:
                    f = open(tmp, "wb")
                    f.write(member)       # the warcinfo member
                    n_bytes += len(member)
                    continue
                f.write(member)
                n_records += 1
                n_bytes += len(member)
        finally:
            if f is not None:
                f.close()
        if n_records == 0:
            if os.path.exists(tmp):
                os.remove(tmp)
            yield pd.DataFrame({"file": [], "n_records": [],
                                "n_bytes": []})
            return
        os.replace(tmp, os.path.join(out_dir, name))
        yield pd.DataFrame({"file": [name], "n_records": [n_records],
                            "n_bytes": [n_bytes]})

    return src.mapInPandas(
        batches, "file string, n_records long, n_bytes long")
