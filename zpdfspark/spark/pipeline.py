"""The scale pipeline: partitioning, skew salting, per-partition lineage,
checkpoint/resume. This is the ``main.zig`` of the engine — the job
driver deployed via ``spark-submit --py-files zpdfspark.zip
zpdfspark/spark/pipeline.py`` (north_rule).

Design for 10^12 documents (SURVEY.md §4):

- **Partition pruning**: input is an Iceberg/parquet table partitioned
  on warc_ts buckets; a ``--since/--until`` predicate prunes partitions
  at the scan (Catalyst built-in — nothing custom).
- **Skew**: one 2 GB PDF in a batch starves a task. Levers: (a)
  opt-in salted repartition on ``xxhash64(url, salt)``
  (``--repartition-blobs`` / ``--salt``) spreads documents uniformly
  when the input file layout is size-correlated — it is OFF by default
  because it shuffles every raw blob, which a 100 TB job must not do
  when scan splits are already uniform; (b) optional big-document isolation
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
  partition — zero amplification AND bucket-granular resume. An input
  carrying a ``bucket`` partition column (one-time preparation:
  ``write_bucketed_input``) is detected and trusted: the per-bucket
  filter then partition-prunes at the scan (plan-tested). For
  unbucketed inputs, ``--single-pass`` processes all pending buckets in
  one job (one scan, output partitioned by bucket) at the cost of
  run-granular rather than bucket-granular checkpointing; with a
  bucketed input, single_pass is ignored (per-bucket is already pruned
  and strictly better).
- All shuffles are explicit; by default the extraction stage is
  map-only directly on scan splits (split sizing via
  ``spark.sql.files.maxPartitionBytes``), with a single opt-in salting
  exchange for skewed layouts. Measured on the 60k-doc heavy corpus at
  pinned local[16], skipping the blob exchange cuts the end-to-end
  single-pass job from ~22 s to ~17 s.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import List, Optional

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, Observation, SparkSession

# absolute import so this file also works as a spark-submit primary
# script (run as __main__ with zpdfspark shipped via --py-files)
from zpdfspark.spark.udfs import EXTRACT_SCHEMA, extract_arrow_batches

LINEAGE_SCHEMA = (
    "bucket int, n_docs long, n_pages long, n_chars long, n_errors long, "
    "n_encrypted long, objects_resolved long, streams_decoded long, "
    "structured_pages long, stream_pages long, "
    "geometric_pages long, coverage_fallbacks long, "
    "wall_secs double, status string, finished_at string"
)


def wants_blob_shuffle(repartition_blobs: bool, salt: int,
                       big_doc_bytes: int) -> bool:
    """Single source of truth for whether the raw blobs get the salting
    exchange: explicit opt-in, a non-zero salt, or big-doc isolation
    (the latter two can't work without it)."""
    return repartition_blobs or salt != 0 or big_doc_bytes > 0


def maybe_salted(df: DataFrame, partitions: int, salt: int = 0,
                 big_doc_bytes: int = 0, repartition_blobs: bool = False
                 ) -> DataFrame:
    """Apply the salting exchange only when asked for (see
    wants_blob_shuffle); otherwise extraction runs map-only on the scan
    splits (the default — no shuffle ever touches the raw blobs, the
    shape a 100 TB job needs)."""
    if wants_blob_shuffle(repartition_blobs, salt, big_doc_bytes):
        return salted(df, partitions, salt=salt, big_doc_bytes=big_doc_bytes)
    return df


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


_METRIC_COLS = ("n_pages", "n_chars", "error_count", "is_encrypted",
                "objects_resolved", "streams_decoded",
                "structured_pages", "stream_pages", "geometric_pages",
                "coverage_fallbacks")


def _lineage_observation(buckets: List[int]):
    """Observation that rolls up the per-bucket lineage metrics DURING
    the write job — the metrics ride along with the one pass over the
    data, so lineage costs zero extra reads of input or output (at
    100 TB, re-scanning the output just to count it is a full extra
    job). One conditional sum per (bucket, metric)."""
    exprs = []
    for b in buckets:
        cond = F.col("bucket") == b
        exprs.append(F.sum(cond.cast("long")).alias(f"b{b}_n_docs"))
        for m in _METRIC_COLS:
            exprs.append(F.sum(F.when(cond, F.col(m).cast("long")))
                         .alias(f"b{b}_{m}"))
    obs = Observation("lineage")
    return obs, exprs


def _lineage_rows_from_observation(obs: Observation, buckets: List[int],
                                   wall: float, finished: str) -> List[dict]:
    got = obs.get
    rows = []
    for b in buckets:
        n_docs = got.get(f"b{b}_n_docs") or 0
        if n_docs == 0:
            continue
        g = lambda m: int(got.get(f"b{b}_{m}") or 0)
        rows.append({
            "bucket": b,
            "n_docs": n_docs,
            "n_pages": g("n_pages"),
            "n_chars": g("n_chars"),
            "n_errors": g("error_count"),
            "n_encrypted": g("is_encrypted"),
            "objects_resolved": g("objects_resolved"),
            "streams_decoded": g("streams_decoded"),
            "structured_pages": g("structured_pages"),
            "stream_pages": g("stream_pages"),
            "geometric_pages": g("geometric_pages"),
            "coverage_fallbacks": g("coverage_fallbacks"),
            "wall_secs": wall,
            "status": "ok",
            "finished_at": finished,
        })
    return rows


def _tune_scan_splits(spark: SparkSession, df: DataFrame,
                      partitions: int):
    """Size parquet scan splits so the source yields ≈``partitions``
    map tasks. The map-only design hinges on this: with no repartition
    exchange, scan splits ARE the work units, and the default 128 MB
    ``maxPartitionBytes`` gives a blob table too few, too-coarse splits
    (one straggler split = one idle-cores tail). Callers pass
    ``partitions`` ≈ 4× the core count (the run_extraction_job default
    and bench.py's measured sweep optimum) so every core gets ~4 waves.

    Returns the previous ``maxPartitionBytes`` value (or None if
    untouched) so the caller can restore the session-global conf after
    the job — the blob-sized splits must not leak into other scans on
    the same session."""
    try:
        files = df.inputFiles()
        if not files or not partitions:
            return None
        conf = spark.sparkContext._jsc.hadoopConfiguration()
        jvm = spark.sparkContext._jvm
        total = 0
        for f in files:
            p = jvm.org.apache.hadoop.fs.Path(f)
            total += p.getFileSystem(conf).getFileStatus(p).getLen()
        if total:
            prev = spark.conf.get("spark.sql.files.maxPartitionBytes")
            target = max(total // partitions + 1, 1 << 20)
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(target))
            return prev
    except Exception:
        pass  # stats unavailable (e.g. some catalogs) — keep defaults
    return None


def bucket_of(url_col, n_buckets: int):
    """Deterministic resume bucket: stable across runs and cluster sizes."""
    return F.pmod(F.xxhash64(url_col), F.lit(n_buckets)).cast("int")


def write_bucketed_input(spark: SparkSession, input_path: str,
                         output_path: str, n_buckets: int = 8,
                         input_format: str = "parquet") -> None:
    """One-time preparation job: rewrite a crawl table laid out by the
    resume bucket (``bucket=K`` partition directories, same
    ``bucket_of()`` expression the pipeline derives), so that EVERY
    per-bucket extraction scan partition-prunes to exactly its own
    directory — n_buckets resumable scans read the input once in total
    instead of n_buckets times (the read-amplification fix in the module
    docstring). Iceberg analog: ``PARTITIONED BY (bucket(n, url))``."""
    if input_format == "iceberg":
        df = spark.read.format("iceberg").load(input_path)
    else:
        df = spark.read.parquet(input_path)
    (df.withColumn("bucket", bucket_of(F.col("url"), n_buckets))
       .write.mode("overwrite").partitionBy("bucket").parquet(output_path))


def _bucket_domain_from_listing(spark: SparkSession,
                                input_path: str) -> Optional[List[str]]:
    """Partition values live in the directory names (``bucket=K``) — read
    the domain from the file listing (one metadata RPC per child, works on
    HDFS/S3 via the Hadoop FS API) instead of scanning all the data.
    Returns None when the layout isn't a bucket=K partition tree (then the
    caller falls back to a pruned filter)."""
    try:
        jvm = spark._jvm
        path = jvm.org.apache.hadoop.fs.Path(input_path)
        fs = path.getFileSystem(spark._jsc.hadoopConfiguration())
        vals = [st.getPath().getName().split("=", 1)[1]
                for st in fs.listStatus(path)
                if st.isDirectory()
                and st.getPath().getName().startswith("bucket=")]
        return vals or None
    except Exception:
        return None


def _validate_bucket_domain(spark: SparkSession, df, input_path: str,
                            input_format: str, n_buckets: int) -> None:
    """Guard against a mismatched --buckets / unrelated 'bucket' column
    (values outside range(n_buckets) would be silently skipped forever by
    the per-bucket loop). ADVICE r2: the old full distinct().collect()
    was an extra whole-input Spark job on every run — instead (a) read the
    domain from the partition listing when the layout is bucket=K
    directories, else (b) run an out-of-range FILTER, which
    partition-prunes to zero splits on a healthy partitioned layout and is
    a single pushed-filter early-exit scan otherwise."""
    if input_format != "iceberg":
        listed = _bucket_domain_from_listing(spark, input_path)
        if listed is not None:
            bad = []
            for v in listed:
                try:
                    ok = 0 <= int(v) < n_buckets
                except ValueError:
                    ok = False
                if not ok:
                    bad.append(v)
            if bad:
                raise ValueError(
                    f"input 'bucket' partitions {sorted(bad)[:8]} outside "
                    f"range({n_buckets}); rerun write_bucketed_input with "
                    f"n_buckets={n_buckets} or pass --buckets to match")
            return
    out_of_range = df.where(
        F.col("bucket").isNull() | (F.col("bucket") < 0)
        | (F.col("bucket") >= n_buckets))
    bad_rows = out_of_range.select("bucket").limit(1).collect()
    if bad_rows:
        raise ValueError(
            f"input 'bucket' column has value {bad_rows[0][0]!r} outside "
            f"range({n_buckets}); rerun write_bucketed_input with "
            f"n_buckets={n_buckets} or pass --buckets to match the layout")


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
    repartition_blobs: bool = False,
    writer_tasks: Optional[int] = None,
    quality_gate: bool = False,
    http_ok_only: bool = False,
) -> dict:
    """Checkpoint-resumable extraction. Returns a summary dict.

    quality_gate=True appends a pure-JVM ``quality_keep`` boolean (the
    Gopher/MassiveText gate, streaming.gopher_keep_expr — the SAME
    predicate the streaming curation twin applies) to every output row.
    A column, not a row drop: resume/lineage idempotence is untouched,
    downstream picks the survivor set with a pushed-down filter on the
    parquet column, and the reject rows stay auditable in place.

    http_ok_only (WARC input only) drops response records whose HTTP
    status is not 200 — redirect stubs and error pages never reach the
    extraction kernel; the filter runs inside the record parse (fused
    path) or as a JVM predicate on the reader (two-stage path).

    input_format="iceberg" loads an Iceberg table name instead of a
    parquet path (same code path at scale: the warc_ts predicate then
    prunes bucket(warc_ts) partitions at the snapshot level).
    """
    if partitions is None:
        # ~4 map work-units per core: amortizes the wave tail whether
        # the units are scan splits (map-only) or shuffle partitions
        # (salted) — the measured sweep optimum (BASELINE.md)
        partitions = 4 * spark.sparkContext.defaultParallelism
    if writer_tasks is None:
        writer_tasks = 2 * spark.sparkContext.defaultParallelism
    lineage_path = os.path.join(output_path, "_lineage")
    data_path = os.path.join(output_path, "data")

    prebuilt_result = None
    if input_format == "iceberg":
        df = spark.read.format("iceberg").load(input_path)
    elif input_format == "warc":
        # Common-Crawl-style ingestion: extraction straight off the
        # .warc.gz archives (file = unit of parallelism; records parsed
        # in-task, warc_source.py)
        from zpdfspark.spark.warc_source import (warc_documents,
                                                 warc_extract_arrow_batches)
        if single_pass and not since and not until:
            # fused shape (the scale path): parse + extract in ONE
            # Python task, blobs never round-trip through the JVM
            # between stages (1.6x end-to-end on the 60k heavy soak);
            # bucket re-derived from url post-extraction exactly like
            # the parquet single-pass. Resume still works (pending
            # buckets filter post-extraction) but re-parses completed
            # archives — the two-stage form below is the resume-heavy
            # alternative.
            binary = spark.read.format("binaryFile").load(input_path)
            prebuilt_result = binary.select("path", "content").mapInArrow(
                warc_extract_arrow_batches(mode, max_doc_bytes=max_doc_bytes,
                                           http_ok_only=http_ok_only),
                EXTRACT_SCHEMA,
            ).withColumn("bucket", bucket_of(F.col("url"), n_buckets))
        df = warc_documents(spark, input_path, http_ok_only=http_ok_only)
    else:
        df = spark.read.parquet(input_path)
    # partition-prunable time predicate (Iceberg warc_ts buckets at scale)
    if since:
        df = df.where(F.col("warc_ts") >= F.lit(since))
    if until:
        df = df.where(F.col("warc_ts") < F.lit(until))
    input_bucketed = "bucket" in df.columns
    if input_bucketed:
        # the input table is ALREADY laid out by the resume bucket (a
        # `bucket=K` partition column, written by write_bucketed_input or
        # an Iceberg bucket transform): trust it — the per-bucket loop's
        # `bucket = K` filter then PRUNES the scan to one partition
        # directory (zero read amplification; pipeline docstring). The
        # column must have been produced by the same bucket_of()
        # expression with the same n_buckets — VALIDATE the domain, or a
        # mismatched --buckets (or an unrelated column that happens to be
        # named 'bucket') would silently skip rows forever: todo only
        # covers range(n_buckets), so bucket values outside it are never
        # selected by any scan while the job still reports success.
        df = df.select("url", "html", F.col("bucket").cast("int").alias("bucket"))
        _validate_bucket_domain(spark, df, input_path, input_format,
                                n_buckets)
        if single_pass:
            # single-pass exists FOR unbucketed inputs (one scan instead
            # of n_buckets scans); with a bucketed layout each per-bucket
            # scan is already pruned, and the per-bucket path's
            # bucket-granular idempotent overwrite is strictly better
            single_pass = False
    else:
        df = df.select("url", "html").withColumn(
            "bucket", bucket_of(F.col("url"), n_buckets))
    prev_split_conf = None
    if not wants_blob_shuffle(repartition_blobs, salt, big_doc_bytes):
        # map-only path: scan splits are the work units — size them
        prev_split_conf = _tune_scan_splits(spark, df, partitions)

    try:
        return _run_buckets(spark, df, n_buckets, partitions, salt, resume,
                            mode, max_doc_bytes, big_doc_bytes, single_pass,
                            repartition_blobs, writer_tasks, data_path,
                            lineage_path, prebuilt_result=prebuilt_result,
                            quality_gate=quality_gate)
    finally:
        if prev_split_conf is not None:
            spark.conf.set("spark.sql.files.maxPartitionBytes",
                           prev_split_conf)


def _run_buckets(spark, df, n_buckets, partitions, salt, resume, mode,
                 max_doc_bytes, big_doc_bytes, single_pass,
                 repartition_blobs, writer_tasks, data_path,
                 lineage_path, prebuilt_result=None,
                 quality_gate=False) -> dict:
    done = set(completed_buckets(spark, lineage_path)) if resume else set()
    todo = [b for b in range(n_buckets) if b not in done]
    summary = {"buckets_total": n_buckets, "buckets_skipped": len(done),
               "buckets_run": 0, "docs": 0, "errors": 0}

    if single_pass and todo:
        return _run_single_pass(spark, df, todo, n_buckets, partitions, salt,
                                mode, max_doc_bytes, big_doc_bytes, data_path,
                                lineage_path, summary, repartition_blobs,
                                writer_tasks, prebuilt_result=prebuilt_result,
                                quality_gate=quality_gate)

    for bucket in todo:
        t0 = time.time()
        part = maybe_salted(df.where(F.col("bucket") == bucket).drop("bucket"),
                            partitions, salt=salt, big_doc_bytes=big_doc_bytes,
                            repartition_blobs=repartition_blobs)
        result = part.mapInArrow(
            extract_arrow_batches(mode, max_doc_bytes=max_doc_bytes), EXTRACT_SCHEMA
        ).withColumn("bucket", F.lit(bucket))
        if quality_gate:
            from zpdfspark.spark.streaming import gopher_keep_expr
            result = result.withColumn("quality_keep", gopher_keep_expr())
        out_dir = os.path.join(data_path, f"bucket={bucket}")
        result = result.drop("bucket")
        if writer_tasks:
            # coalesce the (small) extracted output to a bounded number
            # of writer tasks — output file count stays O(writer_tasks)
            # instead of O(map tasks), shrinking the serial commit
            result = result.repartition(
                writer_tasks, F.xxhash64("url", F.lit(1)))
        # per-bucket metrics rollup rides along with the write via
        # observe() — no re-read of the bucket's output. The observe is
        # attached ABOVE the writer exchange so CollectMetrics runs in
        # the final (result) stage, where Spark applies accumulator
        # updates exactly once per partition; below the exchange it
        # would sit in a shuffle-map stage, where speculative or
        # retried attempts can double-count.
        obs, exprs = _lineage_observation([bucket])
        result.withColumn("bucket", F.lit(bucket)).observe(obs, *exprs) \
            .drop("bucket").write.mode("overwrite").parquet(out_dir)
        rows = _lineage_rows_from_observation(
            obs, [bucket], time.time() - t0,
            time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()))
        lineage_row = rows[0] if rows else {
            "bucket": bucket, "n_docs": 0, "n_pages": 0, "n_chars": 0,
            "n_errors": 0, "n_encrypted": 0, "objects_resolved": 0,
            "streams_decoded": 0, "structured_pages": 0,
            "stream_pages": 0, "geometric_pages": 0,
            "coverage_fallbacks": 0, "wall_secs": time.time() - t0,
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
                     summary, repartition_blobs: bool = False,
                     writer_tasks: int = 0, prebuilt_result=None,
                     quality_gate=False) -> dict:
    """One job over all pending buckets: a single source scan, output
    partitioned by bucket, lineage appended per bucket afterwards.
    `prebuilt_result` (fused-source kernels, e.g. WARC parse+extract)
    skips the extraction step here and enters at the bucket filter."""
    t0 = time.time()
    if prebuilt_result is not None:
        result = prebuilt_result.where(F.col("bucket").isin(todo))
    else:
        part = maybe_salted(df.where(F.col("bucket").isin(todo)), partitions,
                            salt=salt, big_doc_bytes=big_doc_bytes,
                            repartition_blobs=repartition_blobs)
        # carry the bucket through the kernel via re-derivation (cheaper
        # than widening the kernel schema): the bucket expression is a
        # pure function of url, so recomputing it after extraction is
        # exact
        result = part.drop("bucket").mapInArrow(
            extract_arrow_batches(mode, max_doc_bytes=max_doc_bytes),
            EXTRACT_SCHEMA
        ).withColumn("bucket", bucket_of(F.col("url"), n_buckets))
    if quality_gate:
        from zpdfspark.spark.streaming import gopher_keep_expr
        result = result.withColumn("quality_keep", gopher_keep_expr())
    if writer_tasks:
        # shuffle the EXTRACTED rows (text — ~10x smaller than the raw
        # blobs, which stay map-only) into writer_tasks hash partitions
        # keyed by (bucket, sub-split). Grouping by bucket keeps each
        # writer task touching few buckets (few open files); 4x more
        # sub-splits than partitions smooths the balls-in-bins skew of
        # hash placement. Output files are O(writer_tasks) instead of
        # O(map_tasks * n_buckets) and the serial commit shrinks with
        # them. Measured at pinned local[16] on the 60k heavy corpus:
        # 17.7 s -> 13.4 s end-to-end, 512 -> ~32 files.
        sub = F.pmod(F.xxhash64("url", F.lit(1)),
                     F.lit(max(writer_tasks // n_buckets, 1) * 4))
        result = result.repartition(writer_tasks, F.col("bucket"), sub)
    # observe ABOVE the writer exchange: CollectMetrics evaluates in the
    # final (result) stage where accumulator updates are exactly-once
    # per partition; below the exchange, speculative execution or a
    # shuffle-map stage retry could double-count the lineage metrics.
    obs, exprs = _lineage_observation(todo)
    # Dynamic partition overwrite instead of a blind append: a retried
    # run (job died after some task commits were visible — v2 committer,
    # object-store direct committers, or a prior run whose lineage write
    # failed) re-extracts exactly the pending buckets and OVERWRITES
    # those bucket=K partitions, so the resume is idempotent like the
    # per-bucket path; an append would duplicate the partial rows.
    prev_overwrite_mode = spark.conf.get(
        "spark.sql.sources.partitionOverwriteMode", "static")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try:
        result.observe(obs, *exprs) \
            .write.mode("overwrite").partitionBy("bucket").parquet(data_path)
    finally:
        spark.conf.set("spark.sql.sources.partitionOverwriteMode",
                       prev_overwrite_mode)

    wall = time.time() - t0
    finished = time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime())
    lineage_rows = _lineage_rows_from_observation(obs, todo, wall, finished)
    for row in lineage_rows:
        summary["buckets_run"] += 1
        summary["docs"] += row["n_docs"]
        summary["errors"] += row["n_errors"]
    if lineage_rows:
        spark.createDataFrame(lineage_rows, schema=LINEAGE_SCHEMA) \
            .coalesce(1).write.mode("append").json(lineage_path)
    return summary


def parse_page_range(spec: str):
    """'a-b' or 'n' -> inclusive 1-based (a, b) (main.zig:173-177)."""
    if "-" in spec:
        a, b = spec.split("-", 1)
        lo, hi = int(a), int(b)
    else:
        lo = hi = int(spec)
    if lo < 1 or hi < lo:
        raise ValueError(f"invalid page range {spec!r}")
    return lo, hi


def run_format_job(spark: SparkSession, input_path: str, output_path: str,
                   output_format: str, page_range=None,
                   input_format: str = "parquet",
                   since: Optional[str] = None,
                   until: Optional[str] = None,
                   mode: str = "accuracy",
                   partitions: Optional[int] = None) -> dict:
    """The CLI's non-default sinks (main.zig `-f json|markdown`, `-p`):
    a simple map-only write without bucket lineage — these are
    per-document renderings, re-runnable idempotently (overwrite). The
    checkpoint-resumable scale path remains the text pipeline
    (run_extraction_job)."""
    from zpdfspark.spark.udfs import (document_json_dataframe,
                                      markdown_dataframe, metadata_dataframe,
                                      pages_dataframe)

    if output_format == "cdx":
        # CDX(J) index rows straight off the archives (the warc_cdx
        # query as a CLI sink): sorted parquet under output/data — the
        # relational form; --format zipnum is the clustered file form
        if input_format != "warc":
            raise ValueError("--format cdx requires --input-format warc")
        if page_range is not None:
            raise ValueError("--pages does not apply to --format cdx")
        if since or until:
            raise ValueError(
                "--since/--until do not apply to --format cdx")
        from zpdfspark.spark.warc_source import warc_cdx

        data_path = os.path.join(output_path, "data")
        out = warc_cdx(spark, input_path).orderBy("urlkey", "cdx_ts")
        obs = Observation("cdx")
        out.observe(obs, F.count(F.lit(1)).alias("rows"))             .write.mode("overwrite").parquet(data_path)
        return {"format": output_format, "rows": int(obs.get["rows"]),
                "output": data_path}
    if output_format == "zipnum":
        # ZipNum-clustered CDX + cluster.idx (the CC secondary-index
        # derivative); derives from archives, so the input must be WARC
        if input_format != "warc":
            raise ValueError("--format zipnum requires "
                             "--input-format warc")
        if page_range is not None:
            raise ValueError("--pages does not apply to --format zipnum")
        if since or until:
            # the index is built straight from the archives (warc_cdx),
            # not the filtered document frame — refuse rather than
            # silently ignore the bounds
            raise ValueError(
                "--since/--until do not apply to --format zipnum")
        from zpdfspark.spark.warc_sink import (write_cluster_idx,
                                               write_zipnum)
        from zpdfspark.spark.warc_source import warc_cdx

        data_path = os.path.join(output_path, "data")
        idx = write_zipnum(warc_cdx(spark, input_path), data_path,
                           partitions=partitions).cache()
        try:
            blocks = idx.count()
            n_lines = (idx.agg(F.sum("n_lines")).collect()[0][0]
                       if blocks else 0)
            cluster = write_cluster_idx(idx, data_path)
        finally:
            idx.unpersist()
        return {"format": output_format, "rows": int(n_lines or 0),
                "blocks": int(blocks), "cluster_idx": cluster,
                "output": data_path}
    if input_format == "iceberg":
        df = spark.read.format("iceberg").load(input_path)
    elif input_format == "warc":
        # archive -> derivative in one job (the canonical Common Crawl
        # WARC -> WET/WAT conversion); warc_documents yields the same
        # (url, warc_ts, html) shape the parquet path reads
        from zpdfspark.spark.warc_source import warc_documents

        df = warc_documents(spark, input_path)
    else:
        df = spark.read.parquet(input_path)
    if since:
        df = df.where(F.col("warc_ts") >= F.lit(since))
    if until:
        df = df.where(F.col("warc_ts") < F.lit(until))
    if output_format == "json":
        out = document_json_dataframe(df, page_range=page_range)
    elif output_format == "markdown":
        out = markdown_dataframe(df, page_range=page_range)
    elif output_format == "info":
        # the `zpdf info` analog (main.zig:98-160): metadata + page
        # count + encryption flag per document. Like the reference,
        # info is a document-level report — a page range is a usage
        # error, not something to silently ignore.
        if page_range is not None:
            raise ValueError("--pages does not apply to --format info")
        out = metadata_dataframe(df)
    elif output_format in ("wet", "wat", "jsonl"):
        # derivative exports: *.warc.wet.gz conversion records /
        # *.warc.wat.gz metadata records / *.jsonl.gz dataset-release
        # shards (spark/warc_sink.py — fused mine+serialize+write, one
        # file per partition, deterministic + idempotent)
        if page_range is not None:
            raise ValueError(
                f"--pages does not apply to --format {output_format}")
        from zpdfspark.spark.warc_sink import (write_jsonl, write_wat,
                                               write_wet)

        data_path = os.path.join(output_path, "data")
        if output_format == "wet":
            sink = write_wet(df, data_path, mode=mode,
                             partitions=partitions)
        elif output_format == "jsonl":
            if "lang" not in df.columns:
                df = df.withColumn("lang", F.lit(None).cast("string"))
            sink = write_jsonl(df, data_path, mode=mode,
                               partitions=partitions)
        else:
            sink = write_wat(df, data_path, partitions=partitions)
        summaries = sink.collect()
        return {"format": output_format,
                "rows": int(sum(r["n_records"] for r in summaries)),
                "files": len(summaries), "output": data_path}
    else:  # per-page text rows for an explicit --pages range
        out = pages_dataframe(df, page_range=page_range)
    data_path = os.path.join(output_path, "data")
    obs = Observation("fmt")
    out.observe(obs, F.count(F.lit(1)).alias("rows")) \
        .write.mode("overwrite").parquet(data_path)
    return {"format": output_format, "rows": int(obs.get["rows"]),
            "output": data_path}


def main(argv: Optional[List[str]] = None) -> None:
    """spark-submit entry: the CLI analog of the reference's
    ``zpdf extract`` (/root/reference/src/main.zig:12-96)."""
    ap = argparse.ArgumentParser(description="zpdfspark extraction pipeline")
    ap.add_argument("--input", required=True, help="input parquet path/table")
    ap.add_argument("--output", required=True, help="output directory")
    ap.add_argument("--mode", choices=("accuracy", "fast"), default="accuracy")
    ap.add_argument("--format",
                    choices=("text", "json", "markdown", "info", "wet",
                             "wat", "jsonl", "zipnum", "cdx"),
                    default="text",
                    help="text = full extraction rows with lineage/resume "
                         "(the scale pipeline); json = one {metadata, "
                         "outline, pages} object per doc; markdown = "
                         "rendered markdown (main.zig -f); info = "
                         "metadata/page-count rows (the `zpdf info` "
                         "analog); wet = Common Crawl *.warc.wet.gz "
                         "conversion records of the extracted text; "
                         "wat = *.warc.wat.gz per-capture JSON "
                         "metadata records (lengths, head metadata, "
                         "outlinks); jsonl = gzipped one-object-per-"
                         "document *.jsonl.gz shards (the C4/Dolma "
                         "dataset-release interchange); "
                         "zipnum = ZipNum-clustered CDX "
                         "blocks + cluster.idx; cdx = CDX(J) index "
                         "rows as sorted parquet (both WARC input "
                         "only)")
    ap.add_argument("--pages", default=None,
                    help="inclusive 1-based page range 'a-b' or 'n' "
                         "(main.zig -p): applies the kernel-side page "
                         "filter; with --format text this emits per-page "
                         "rows instead of whole-document rows")
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--buckets", type=int, default=8)
    ap.add_argument("--salt", type=int, default=0)
    ap.add_argument("--no-resume", action="store_true")
    ap.add_argument("--http-ok-only", action="store_true",
                    help="WARC input: drop response records with a "
                         "non-200 HTTP status before extraction")
    ap.add_argument("--quality-gate", action="store_true",
                    help="append the pure-JVM Gopher quality_keep column "
                         "(same predicate as the streaming curation twin)")
    ap.add_argument("--since", default=None, help="warc_ts lower bound")
    ap.add_argument("--until", default=None, help="warc_ts upper bound")
    ap.add_argument("--input-format", choices=("parquet", "iceberg", "warc"),
                    default="parquet")
    ap.add_argument("--max-doc-bytes", type=int, default=0,
                    help="skip blobs larger than this (0 = no cap)")
    ap.add_argument("--single-pass", action="store_true",
                    help="process all pending buckets in one job (one "
                         "source scan; run-granular checkpointing)")
    ap.add_argument("--big-doc-bytes", type=int, default=0,
                    help="isolate blobs larger than this into their own "
                         "partitions (0 = off; costs a second source pass)")
    ap.add_argument("--repartition-blobs", action="store_true",
                    help="salted repartition of the raw blobs before "
                         "extraction (implied by --salt/--big-doc-bytes; "
                         "default is map-only on scan splits)")
    ap.add_argument("--writer-tasks", type=int, default=None,
                    help="coalesce extracted output into this many "
                         "writer tasks before the partitioned write "
                         "(default 2x parallelism; 0 = write straight "
                         "from map tasks)")
    args = ap.parse_args(argv)

    spark = SparkSession.builder.appName("zpdfspark-extract").getOrCreate()
    if args.format != "text" or args.pages:
        summary = run_format_job(
            spark, args.input, args.output, args.format,
            page_range=parse_page_range(args.pages) if args.pages else None,
            input_format=args.input_format, since=args.since,
            until=args.until, mode=args.mode, partitions=args.partitions,
        )
        print(json.dumps(summary))
        spark.stop()
        return
    summary = run_extraction_job(
        spark, args.input, args.output, mode=args.mode,
        partitions=args.partitions, n_buckets=args.buckets, salt=args.salt,
        resume=not args.no_resume, since=args.since, until=args.until,
        input_format=args.input_format, max_doc_bytes=args.max_doc_bytes,
        big_doc_bytes=args.big_doc_bytes, single_pass=args.single_pass,
        repartition_blobs=args.repartition_blobs,
        writer_tasks=args.writer_tasks,
        quality_gate=args.quality_gate,
        http_ok_only=args.http_ok_only,
    )
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
