"""SparkSession builder tuned for the extraction workload.

Tuning rationale (SURVEY.md §4):
- Arrow batches carry whole PDFs: maxRecordsPerBatch is kept small so a
  batch of large documents fits in the Python worker (each record can be
  up to hundreds of MiB; 64 blobs/batch bounds peak memory while still
  amortizing Arrow IPC overhead).
- AQE enabled: coalesces the post-shuffle partitions of the relational
  shell (metrics rollups, dedup joins); the extraction stage itself is a
  map-only pipeline and is sized explicitly via repartition.
- local[N] in the sandbox; on a real cluster the same code ships via
  spark-submit --py-files (see zpdfspark/spark/pipeline.py docstring).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    cores: int | str = "*",
    app_name: str = "zpdfspark",
    shuffle_partitions: int | None = None,
    arrow_batch_records: int = 256,
    extra_conf: dict | None = None,
) -> SparkSession:
    os.environ.setdefault("SPARK_LOCAL_IP", "127.0.0.1")
    if shuffle_partitions is None:
        shuffle_partitions = 32 if cores == "*" else max(int(cores), 8)
    builder = (
        SparkSession.builder.master(f"local[{cores}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_records))
        .config("spark.sql.files.maxPartitionBytes", "64m")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
