"""Structured Streaming ingest: continuous extraction over an arriving
page table.

The reference is purely batch (SURVEY.md §2.12: no streaming concepts
exist in zpdf), so this layer is additive Spark-native capability: a
file-source stream of (url, warc_ts, html, ...) parquet drops is run
through the SAME mapInPandas extraction kernel inside foreachBatch and
appended to the output table. Spark's checkpointing gives

- exactly-once file-source progress tracking (offsets in checkpoint)
- restart/resume for free (complementing the batch pipeline's
  bucket-level lineage resume)

Event-time bookkeeping: a 1-day watermark on warc_ts bounds state for
the per-window crawl-rate aggregation, tolerating late-arriving WARC
records (crawlers deliver out of order).
"""

from __future__ import annotations

import os
from typing import Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from zpdfspark.spark.udfs import EXTRACT_SCHEMA, extract_arrow_batches

INPUT_SCHEMA_DDL = "url string, warc_ts timestamp, html binary, text string, lang string"


def start_streaming_extraction(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
    mode: str = "accuracy",
    available_now: bool = True,
    max_files_per_trigger: Optional[int] = None,
):
    """readStream(parquet drops) -> extract -> append parquet.

    Returns the StreamingQuery. With available_now=True the query
    drains everything currently present and stops (test/batch-catchup
    mode); otherwise it runs continuously.
    """
    reader = (
        spark.readStream.schema(INPUT_SCHEMA_DDL)
        .option("maxFilesPerTrigger", str(max_files_per_trigger or 16))
        .parquet(input_dir)
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        extracted = batch_df.select("url", "html").mapInArrow(
            extract_arrow_batches(mode), EXTRACT_SCHEMA
        )
        extracted.write.mode("append").parquet(os.path.join(output_dir, "data"))

    writer = reader.writeStream.foreachBatch(process_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def start_crawl_rate_aggregation(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    window: str = "1 hour",
    watermark: str = "1 day",
):
    """Event-time windowed crawl-rate rollup with a late-data watermark:
    docs and bytes per warc_ts window, emitted to an in-memory sink
    named 'crawl_rates'."""
    stream = (
        spark.readStream.schema(INPUT_SCHEMA_DDL)
        .parquet(input_dir)
        .withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.length("html")).alias("n_bytes"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "n_docs", "n_bytes",
        )
    )
    return (
        stream.writeStream.outputMode("append")
        .format("memory")
        .queryName("crawl_rates")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def start_streaming_dedup(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
):
    """Custom stateful operator: exactly-once url dedup across
    micro-batches via applyInPandasWithState.

    Keyed by url-hash shard; each shard's state holds the set of url
    fingerprints seen so far, so re-crawled pages arriving in later
    drops are suppressed before extraction. This is the streaming twin
    of the batch exact-dedup query (STATUS.md web-scale ops table).
    """
    import hashlib

    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    N_SHARDS = 32

    def dedup_shard(key, pdfs, state):
        seen = set(state.get[0]) if state.exists else set()
        out_urls, out_htmls = [], []
        for batch in pdfs:
            for url, html in zip(batch["url"], batch["html"]):
                fp = hashlib.blake2b(url.encode(), digest_size=8).hexdigest()
                if fp in seen:
                    continue
                seen.add(fp)
                out_urls.append(url)
                out_htmls.append(html)
        state.update((list(seen),))
        yield pd.DataFrame({"url": out_urls, "html": out_htmls})

    stream = (
        spark.readStream.schema(INPUT_SCHEMA_DDL)
        .parquet(input_dir)
        .withColumn("shard", F.pmod(F.xxhash64("url"), F.lit(N_SHARDS)))
        .groupBy("shard")
        .applyInPandasWithState(
            dedup_shard,
            outputStructType="url string, html binary",
            stateStructType="seen array<string>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        batch_df.write.mode("append").parquet(os.path.join(output_dir, "data"))

    return (
        stream.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
