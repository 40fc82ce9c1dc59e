"""The scale pipeline: partitioning, skew salting, per-partition lineage,
checkpoint/resume. This is the ``main.zig`` of the engine — the job
driver deployed via ``spark-submit --py-files zpdfspark.zip
zpdfspark/spark/pipeline.py`` (north_rule).

Design for 10^12 documents (SURVEY.md §4):

- **Partition pruning**: input is an Iceberg/parquet table partitioned
  on warc_ts buckets; a ``--since/--until`` predicate prunes partitions
  at the scan (Catalyst built-in — nothing custom).
- **Skew**: one 2 GB PDF in a batch starves a task. Levers: (a) salted
  repartition on ``xxhash64(url, salt)`` spreads documents uniformly
  regardless of input file layout; (b) optional big-document isolation
  (``--big-doc-bytes``): blobs above the threshold are unioned in from
  their own partition space so a giant never co-resides with a share of
  small docs (costs a second source pass — see ``salted``); (c) small
  Arrow batches (session.py) bound per-batch latency; (d)
  ``--max-doc-bytes`` skips pathological blobs with an error record.
- **Lineage + resume**: work is divided into ``n_buckets`` deterministic
  url-hash buckets. Each bucket's output is written under
  ``out/bucket=K/`` and a lineage row (bucket, counts, error totals,
  wall time, status) is appended to the sidecar. On restart, completed
  buckets are skipped via an anti-join of the bucket domain against the
  lineage sidecar — the driver-contract "resume from checkpoint".
- **Read amplification**: the per-bucket loop filters the source per
  bucket. On a raw parquet dump that re-scans the input n_buckets times;
  at scale the input table must be bucketed on the SAME
  ``xxhash64(url) % n_buckets`` expression (Iceberg ``bucket(n, url)``
  partition transform) so each per-bucket scan prunes to its own
  partition — zero amplification AND bucket-granular resume. For
  unbucketed inputs, ``--single-pass`` processes all pending buckets in
  one job (one scan, output partitioned by bucket) at the cost of
  run-granular rather than bucket-granular checkpointing.
- All shuffles are explicit; the extraction stage is map-only after the
  single salting exchange.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

# absolute import so this file also works as a spark-submit primary
# script (run as __main__ with zpdfspark shipped via --py-files)
from zpdfspark.spark.udfs import EXTRACT_SCHEMA, extract_arrow_batches

LINEAGE_SCHEMA = (
    "bucket int, n_docs long, n_pages long, n_chars long, n_errors long, "
    "n_encrypted long, structured_pages long, stream_pages long, "
    "geometric_pages long, coverage_fallbacks long, "
    "wall_secs double, status string, finished_at string"
)


def salted(df: DataFrame, partitions: int, salt: int = 0,
           big_doc_bytes: int = 0) -> DataFrame:
    """Salted repartition of the input, with optional big-document
    isolation.

    Base behavior: repartition on a full-width ``xxhash64(url, salt)``
    so Spark's hash-partitioner sees a uniform key domain. (Hashing a
    pre-computed pmod value re-hashes a tiny domain and leaves
    partitions empty/skewed — measured in tests.)

    With ``big_doc_bytes > 0``, documents above the threshold are split
    into their OWN partition space (a union of two repartitions), so a
    giant blob's task carries no share of small documents. Hash
    partitioning alone cannot provide that isolation — a big doc's
    partition always co-hosts ~1/partitions of the small docs. The
    split costs a second pass over the source (the size predicate needs
    the blob), so it is opt-in; at scale, prefer persisting the bucket
    or carrying a size column in the table schema.
    """
    small_key = F.xxhash64(F.col("url"), F.lit(salt))
    if not big_doc_bytes:
        return df.repartition(partitions, small_key)
    size = F.length("html")
    big_key = F.xxhash64(F.col("url"), F.lit(salt + 0x9E3779B9))
    small = df.where(size <= big_doc_bytes).repartition(partitions, small_key)
    big = df.where(size > big_doc_bytes).repartition(
        max(partitions // 4, 1), big_key)
    return small.unionByName(big)


def bucket_of(url_col, n_buckets: int):
    """Deterministic resume bucket: stable across runs and cluster sizes."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def completed_buckets(spark: SparkSession, lineage_path: str) -> List[int]:
    try:
        lineage = spark.read.json(lineage_path)
    except Exception:
        return []
    if "bucket" not in lineage.columns:
        return []
    rows = lineage.where(F.col("status") == "ok").select("bucket").distinct().collect()
    return sorted(r["bucket"] for r in rows)


def run_extraction_job(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    mode: str = "accuracy",
    partitions: Optional[int] = None,
    n_buckets: int = 8,
    salt: int = 0,
    resume: bool = True,
    since: Optional[str] = None,
    until: Optional[str] = None,
    input_format: str = "parquet",
    max_doc_bytes: int = 0,
    big_doc_bytes: int = 0,
    single_pass: bool = False,
) -> dict:
    """Checkpoint-resumable extraction. Returns a summary dict.

    input_format="iceberg" loads an Iceberg table name instead of a
    parquet path (same code path at scale: the warc_ts predicate then
    prunes bucket(warc_ts) partitions at the snapshot level).
    """
    if partitions is None:
        partitions = spark.sparkContext.defaultParallelism
    lineage_path = os.path.join(output_path, "_lineage")
    data_path = os.path.join(output_path, "data")

    if input_format == "iceberg":
        df = spark.read.format("iceberg").load(input_path)
    else:
        df = spark.read.parquet(input_path)
    # partition-prunable time predicate (Iceberg warc_ts buckets at scale)
    if since:
        df = df.where(F.col("warc_ts") >= F.lit(since))
    if until:
        df = df.where(F.col("warc_ts") < F.lit(until))
    df = df.select("url", "html").withColumn("bucket", bucket_of(F.col("url"), n_buckets))

    done = set(completed_buckets(spark, lineage_path)) if resume else set()
    todo = [b for b in range(n_buckets) if b not in done]
    summary = {"buckets_total": n_buckets, "buckets_skipped": len(done),
               "buckets_run": 0, "docs": 0, "errors": 0}

    if single_pass and todo:
        return _run_single_pass(spark, df, todo, n_buckets, partitions, salt,
                                mode, max_doc_bytes, big_doc_bytes, data_path,
                                lineage_path, summary)

    for bucket in todo:
        t0 = time.time()
        part = salted(df.where(F.col("bucket") == bucket).drop("bucket"),
                      partitions, salt=salt, big_doc_bytes=big_doc_bytes)
        result = part.mapInArrow(
            extract_arrow_batches(mode, max_doc_bytes=max_doc_bytes), EXTRACT_SCHEMA)
        out_dir = os.path.join(data_path, f"bucket={bucket}")
        result.write.mode("overwrite").parquet(out_dir)

        # per-bucket metrics rollup from what we just wrote (one cheap
        # scan of the bucket's own output; no extra shuffle of the blobs)
        written = spark.read.parquet(out_dir)
        agg = written.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_pages").alias("n_pages"),
            F.sum("n_chars").alias("n_chars"),
            F.sum("error_count").alias("n_errors"),
            F.sum(F.col("is_encrypted").cast("long")).alias("n_encrypted"),
            F.sum("structured_pages").alias("structured_pages"),
            F.sum("stream_pages").alias("stream_pages"),
            F.sum("geometric_pages").alias("geometric_pages"),
            F.sum("coverage_fallbacks").alias("coverage_fallbacks"),
        ).collect()[0]
        lineage_row = {
            "bucket": bucket,
            "n_docs": agg["n_docs"] or 0,
            "n_pages": int(agg["n_pages"] or 0),
            "n_chars": int(agg["n_chars"] or 0),
            "n_errors": int(agg["n_errors"] or 0),
            "n_encrypted": int(agg["n_encrypted"] or 0),
            "structured_pages": int(agg["structured_pages"] or 0),
            "stream_pages": int(agg["stream_pages"] or 0),
            "geometric_pages": int(agg["geometric_pages"] or 0),
            "coverage_fallbacks": int(agg["coverage_fallbacks"] or 0),
            "wall_secs": time.time() - t0,
            "status": "ok",
            "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        spark.createDataFrame([lineage_row], schema=LINEAGE_SCHEMA) \
            .coalesce(1).write.mode("append").json(lineage_path)
        summary["buckets_run"] += 1
        summary["docs"] += lineage_row["n_docs"]
        summary["errors"] += lineage_row["n_errors"]
    return summary


def _run_single_pass(spark, df, todo, n_buckets, partitions, salt, mode,
                     max_doc_bytes, big_doc_bytes, data_path, lineage_path,
                     summary) -> dict:
    """One job over all pending buckets: a single source scan, output
    partitioned by bucket, lineage appended per bucket afterwards."""
    t0 = time.time()
    part = salted(df.where(F.col("bucket").isin(todo)), partitions,
                  salt=salt, big_doc_bytes=big_doc_bytes)
    # carry the bucket through the kernel via re-derivation (cheaper than
    # widening the kernel schema): the bucket expression is a pure
    # function of url, so recomputing it after extraction is exact
    result = part.drop("bucket").mapInArrow(
        extract_arrow_batches(mode, max_doc_bytes=max_doc_bytes), EXTRACT_SCHEMA
    ).withColumn("bucket", bucket_of(F.col("url"), n_buckets))
    result.write.mode("append").partitionBy("bucket").parquet(data_path)

    written = spark.read.parquet(data_path).where(F.col("bucket").isin(todo))
    aggs = written.groupBy("bucket").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_pages").alias("n_pages"),
        F.sum("n_chars").alias("n_chars"),
        F.sum("error_count").alias("n_errors"),
        F.sum(F.col("is_encrypted").cast("long")).alias("n_encrypted"),
        F.sum("structured_pages").alias("structured_pages"),
        F.sum("stream_pages").alias("stream_pages"),
        F.sum("geometric_pages").alias("geometric_pages"),
        F.sum("coverage_fallbacks").alias("coverage_fallbacks"),
    ).collect()
    wall = time.time() - t0
    finished = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    lineage_rows = []
    for r in aggs:
        lineage_rows.append({
            "bucket": int(r["bucket"]),
            "n_docs": r["n_docs"] or 0,
            "n_pages": int(r["n_pages"] or 0),
            "n_chars": int(r["n_chars"] or 0),
            "n_errors": int(r["n_errors"] or 0),
            "n_encrypted": int(r["n_encrypted"] or 0),
            "structured_pages": int(r["structured_pages"] or 0),
            "stream_pages": int(r["stream_pages"] or 0),
            "geometric_pages": int(r["geometric_pages"] or 0),
            "coverage_fallbacks": int(r["coverage_fallbacks"] or 0),
            "wall_secs": wall,
            "status": "ok",
            "finished_at": finished,
        })
        summary["buckets_run"] += 1
        summary["docs"] += lineage_rows[-1]["n_docs"]
        summary["errors"] += lineage_rows[-1]["n_errors"]
    if lineage_rows:
        spark.createDataFrame(lineage_rows, schema=LINEAGE_SCHEMA) \
            .coalesce(1).write.mode("append").json(lineage_path)
    return summary


def main(argv: Optional[List[str]] = None) -> None:
    """spark-submit entry: the CLI analog of the reference's
    ``zpdf extract`` (/root/reference/src/main.zig:12-96)."""
    ap = argparse.ArgumentParser(description="zpdfspark extraction pipeline")
    ap.add_argument("--input", required=True, help="input parquet path/table")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--mode", choices=("accuracy", "fast"), default="accuracy")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--since", default=None, help="warc_ts lower bound")
    ap.add_argument("--until", default=None, help="warc_ts upper bound")
    ap.add_argument("--input-format", choices=("parquet", "iceberg"),
                    default="parquet")
    ap.add_argument("--max-doc-bytes", type=int, default=0,
                    help="skip blobs larger than this (0 = no cap)")
    ap.add_argument("--single-pass", action="store_true",
                    help="process all pending buckets in one job (one "
                         "source scan; run-granular checkpointing)")
    ap.add_argument("--big-doc-bytes", type=int, default=0,
                    help="isolate blobs larger than this into their own "
                         "partitions (0 = off; costs a second source pass)")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("zpdfspark-extract").getOrCreate()
    summary = run_extraction_job(
        spark, args.input, args.output, mode=args.mode,
        partitions=args.partitions, n_buckets=args.buckets, salt=args.salt,
        resume=not args.no_resume, since=args.since, until=args.until,
        input_format=args.input_format, max_doc_bytes=args.max_doc_bytes,
        big_doc_bytes=args.big_doc_bytes, single_pass=args.single_pass,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
