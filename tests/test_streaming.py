"""Structured Streaming ingest tests: foreachBatch extraction with
checkpoint/restart, and watermarked windowed aggregation."""

import os
import shutil

import pytest

pyspark = pytest.importorskip("pyspark")

import pyspark.sql.functions as F  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from zpdfspark.spark.session import get_spark

    s = get_spark(4, "zpdfspark-streaming-tests", shuffle_partitions=4)
    yield s
    s.stop()


def _write_drop(path: str, n: int, seed: int) -> None:
    from zpdfspark.fixtures import write_corpus_parquet

    os.makedirs(path, exist_ok=True)
    write_corpus_parquet(os.path.join(path, f"drop_{seed}.parquet"), n, seed=seed)


def test_streaming_extraction_and_resume(spark, tmp_path):
    from zpdfspark.spark.streaming import start_streaming_extraction

    input_dir = str(tmp_path / "in")
    output_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    _write_drop(input_dir, 60, seed=1)

    q = start_streaming_extraction(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    out = spark.read.parquet(os.path.join(output_dir, "data"))
    assert out.count() == 60

    # new drop arrives; restart drains ONLY the new file (checkpointed
    # offsets), no duplicates
    _write_drop(input_dir, 40, seed=2)
    q2 = start_streaming_extraction(spark, input_dir, output_dir, ckpt)
    q2.awaitTermination(120)
    out = spark.read.parquet(os.path.join(output_dir, "data"))
    assert out.count() == 100
    assert out.select("url").distinct().count() == 100

    # extraction results match the batch kernel byte-for-byte
    src = spark.read.parquet(input_dir).select("url", "text")
    joined = out.join(src, "url").where(F.col("text").isNotNull())
    n = joined.count()
    m = joined.where(F.col("extracted_text") == F.col("text")).count()
    assert m == n > 0


def test_crawl_rate_watermark_aggregation(spark, tmp_path):
    from zpdfspark.spark.streaming import start_crawl_rate_aggregation

    input_dir = str(tmp_path / "in2")
    _write_drop(input_dir, 120, seed=3)
    q = start_crawl_rate_aggregation(
        spark, input_dir, str(tmp_path / "ckpt2"), window="30 days")
    q.awaitTermination(120)
    rates = spark.sql("SELECT * FROM crawl_rates")
    rows = rates.collect()
    # warc_ts spans one year -> ~12-13 windows of 30 days; counts sum to
    # at most 120 (append mode emits only watermark-closed windows)
    assert 0 < len(rows) <= 13
    assert sum(r["n_docs"] for r in rows) <= 120
    assert all(r["n_bytes"] > 0 for r in rows)


def test_streaming_stateful_dedup(spark, tmp_path):
    """applyInPandasWithState: urls seen in earlier micro-batches are
    suppressed in later drops (re-crawl dedup)."""
    from zpdfspark.spark.streaming import start_streaming_dedup

    input_dir = str(tmp_path / "in3")
    output_dir = str(tmp_path / "out3")
    ckpt = str(tmp_path / "ckpt3")
    _write_drop(input_dir, 50, seed=7)
    q = start_streaming_dedup(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    out1 = spark.read.parquet(os.path.join(output_dir, "data"))
    assert out1.count() == 50

    # identical drop re-arrives (same seed => same urls): all suppressed
    _write_drop(str(tmp_path / "in3"), 50, seed=7)
    import shutil
    shutil.copy(os.path.join(input_dir, "drop_7.parquet"),
                os.path.join(input_dir, "drop_7b.parquet"))
    q2 = start_streaming_dedup(spark, input_dir, output_dir, ckpt)
    q2.awaitTermination(120)
    out2 = spark.read.parquet(os.path.join(output_dir, "data"))
    assert out2.count() == 50  # no duplicates added
    assert out2.select("url").distinct().count() == 50
