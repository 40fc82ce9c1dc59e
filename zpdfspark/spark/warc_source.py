"""Common-Crawl-style WARC ingestion source.

Crawl corpora ship as WARC archives (ISO 28500; Common Crawl: ~1 GB
.warc.gz files with one gzip member per record, ~64k files per
monthly crawl), not parquet. This source reads them Spark-natively:

- `spark.read.format("binaryFile")` makes the WARC FILE the unit of
  parallelism — exactly the right granularity at crawl scale (the
  per-record gzip layout is not block-splittable, and CC sizes files
  so one file ≈ one task);
- records are parsed INSIDE the scan task (kernel/warc.py) as a 1->N
  mapInPandas expansion — blobs never shuffle, mirroring the
  extraction kernel's map-only shape;
- per-record errors surface as rows with `parse_error` set (a corrupt
  record must not kill a 1 GB archive task), keeping the engine's
  permissive-parsing contract end to end.

`warc_documents` yields the (url, warc_ts, html) shape the extraction
pipeline consumes, so `run_extraction_job(..., input_format="warc")`
runs extraction straight off crawl archives.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

WARC_SCHEMA = ("url string, warc_date string, content_type string, "
               "html binary, n_bytes long, body_md5 string, "
               "warc_file string, parse_error string, "
               "http_status int, http_content_type string")


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """All records of the .warc / .warc.gz files under `path`, one row
    per record (responses carry the HTTP-stripped payload in `html`),
    plus error rows with `parse_error` set."""
    binary = spark.read.format("binaryFile").load(path)

    def batches(it):
        import hashlib

        import pandas as pd

        from zpdfspark.kernel.warc import WarcError, iter_warc_records

        cols = ("url", "warc_date", "content_type", "html", "n_bytes",
                "body_md5", "warc_file", "parse_error", "http_status",
                "http_content_type")
        for b in it:
            rows = {k: [] for k in cols}

            def add(url=None, date=None, ctype=None, body=None,
                    fname="", err=None, status=None, http_ct=None):
                rows["url"].append(url)
                rows["warc_date"].append(date)
                rows["content_type"].append(ctype)
                rows["html"].append(body)
                rows["n_bytes"].append(len(body) if body is not None else 0)
                rows["body_md5"].append(
                    hashlib.md5(body).hexdigest() if body is not None
                    else None)
                rows["warc_file"].append(fname)
                rows["parse_error"].append(err)
                rows["http_status"].append(status)
                rows["http_content_type"].append(http_ct)

            for fpath, content in zip(b["path"], b["content"]):
                try:
                    for rec in iter_warc_records(bytes(content)):
                        if rec.error:
                            add(fname=fpath, err=rec.error)
                        elif rec.warc_type == "response":
                            add(url=rec.target_uri, date=rec.warc_date,
                                ctype=rec.content_type, body=rec.body,
                                fname=fpath, status=rec.http_status,
                                http_ct=rec.http_content_type)
                except WarcError as e:
                    add(fname=fpath, err=f"file-level: {e}")
            yield pd.DataFrame(rows)

    return binary.select("path", "content").mapInPandas(batches, WARC_SCHEMA)


def warc_documents(spark: SparkSession, path: str,
                   http_ok_only: bool = False) -> DataFrame:
    """The (url, warc_ts, html) input shape the extraction pipeline
    consumes, from WARC archives (error rows dropped; WARC-Date parsed
    to a timestamp). http_ok_only additionally drops responses whose
    HTTP envelope carries a non-200 status (redirect stubs / error
    pages); envelope-less payloads (null status) are kept."""
    rec = read_warc(spark, path)
    if http_ok_only:
        rec = rec.where(F.col("http_status").isNull()
                        | (F.col("http_status") == 200))
    return (
        rec.where(F.col("parse_error").isNull() & F.col("url").isNotNull())
        .select(
            "url",
            # WARC 1.1 permits fractional seconds (…T00:00:00.123Z);
            # the fixed ssX pattern alone would drop those rows (under
            # ANSI it even throws). try_ whole-second first, then a
            # lenient parse — null only if neither form matches.
            F.coalesce(
                F.try_to_timestamp(F.col("warc_date"),
                                   F.lit("yyyy-MM-dd'T'HH:mm:ssX")),
                F.try_to_timestamp(F.col("warc_date")),
            ).alias("warc_ts"),
            "html")
    )


def warc_revisits(spark: SparkSession, path: str) -> DataFrame:
    """`revisit` records (WARC 1.1 §6.7) as dedup hints: Common Crawl
    emits one per unchanged re-capture, pointing at the prior capture
    via WARC-Refers-To-Target-URI/-Date. Surfacing them lets the
    re-crawl merge (recrawl_latest) skip re-extraction for unchanged
    pages — the crawl's own dedup signal, far cheaper than content
    hashing. Same file-per-task map-only shape as read_warc; bodies
    are never carried (revisits are body-less pointers)."""
    binary = spark.read.format("binaryFile").load(path)

    def batches(it):
        import pandas as pd

        from zpdfspark.kernel.warc import WarcError, iter_warc_records

        for b in it:
            rows = {"url": [], "warc_date": [], "refers_to_uri": [],
                    "refers_to_date": []}
            for content in b["content"]:
                try:
                    for rec in iter_warc_records(bytes(content)):
                        if rec.error or rec.warc_type != "revisit":
                            continue
                        rows["url"].append(rec.target_uri)
                        rows["warc_date"].append(rec.warc_date)
                        rows["refers_to_uri"].append(rec.refers_to_uri)
                        rows["refers_to_date"].append(rec.refers_to_date)
                except WarcError:
                    continue
            yield pd.DataFrame(rows)

    return binary.select("content").mapInPandas(
        batches, "url string, warc_date string, refers_to_uri string, "
                 "refers_to_date string")


CDX_SCHEMA = ("urlkey string, cdx_ts string, url string, mime string, "
              "http_status int, digest string, rec_offset long, "
              "rec_length long, warc_file string")


def cdx_arrow_batches(it):
    """mapInPandas body shared by the batch warc_cdx query and the
    streaming twin: (path, content) batches -> CDX_SCHEMA index rows."""
    import base64
    import hashlib
    import os as _os

    import pandas as pd

    from zpdfspark.kernel.warc import (WarcError, cdx_timestamp,
                                       iter_warc_records_spans, surt)

    cols = ("urlkey", "cdx_ts", "url", "mime", "http_status",
            "digest", "rec_offset", "rec_length", "warc_file")
    for b in it:
        rows = {k: [] for k in cols}
        for fpath, content in zip(b["path"], b["content"]):
            fname = _os.path.basename(fpath)
            try:
                for rec, off, ln in iter_warc_records_spans(
                        bytes(content)):
                    if rec.error or rec.warc_type != "response" \
                            or rec.target_uri is None:
                        continue
                    sha1 = base64.b32encode(
                        hashlib.sha1(rec.body).digest()).decode()
                    rows["urlkey"].append(surt(rec.target_uri))
                    rows["cdx_ts"].append(
                        cdx_timestamp(rec.warc_date or ""))
                    rows["url"].append(rec.target_uri)
                    rows["mime"].append(rec.http_content_type
                                        or rec.content_type)
                    rows["http_status"].append(rec.http_status)
                    rows["digest"].append("sha1:" + sha1)
                    rows["rec_offset"].append(off)
                    rows["rec_length"].append(ln)
                    rows["warc_file"].append(fname)
            except WarcError:
                continue
        yield pd.DataFrame(rows)


def warc_cdx(spark: SparkSession, path: str) -> DataFrame:
    """CDX(J) index generation (round 5) — the standard web-archive
    access index (pywb/OpenWayback): one line per response capture
    with the SURT urlkey, 14-digit timestamp, payload digest, and the
    (offset, length) span of the record's own gzip member, so a
    wayback range request replays one capture without scanning the
    archive. Same file-per-task map-only shape as read_warc — index
    generation is a single pass over each archive inside its scan
    task; at CC scale the output is re-sorted by urlkey downstream
    (one range exchange), never here. Digest covers the DECODED
    payload (post envelope-strip/de-chunk/gunzip), matching the
    "payload digest" the CDX spec records."""
    binary = spark.read.format("binaryFile").load(path)
    return binary.select("path", "content").mapInPandas(
        cdx_arrow_batches, CDX_SCHEMA)


def warc_extract_arrow_batches(mode: str = "accuracy",
                               max_doc_bytes: int = 0,
                               http_ok_only: bool = False):
    """FUSED ingestion + extraction kernel (mapInArrow over binaryFile
    rows): WARC records are parsed AND extracted inside the same Python
    task, so document blobs never cross the Python/JVM Arrow boundary
    between an ingestion stage and an extraction stage — on the 60k
    heavy-doc soak the two-stage form spent ~76% extra wall on exactly
    that round-trip (BASELINE.md round-3 WARC soak). Delegates row
    assembly to udfs.extract_arrow_batches so extraction output is
    byte-identical to the parquet path; records are re-batched in
    bounded chunks so a 1 GB archive never materializes all decompressed
    bodies at once.

    http_ok_only drops response records whose HTTP envelope carries a
    non-200 status (redirect stubs / error pages — the standard crawl
    ingestion filter); envelope-less payloads (no status) are kept."""
    from zpdfspark.spark.udfs import extract_arrow_batches

    extract = extract_arrow_batches(mode, max_doc_bytes=max_doc_bytes)
    chunk_records = 512

    def fn(batches):
        import pyarrow as pa

        from zpdfspark.kernel.warc import WarcError, iter_warc_records

        def parsed():
            urls, bodies = [], []
            for rb in batches:
                contents = rb.column("content")
                for j in range(len(contents)):
                    raw = contents[j].as_py()
                    try:
                        for rec in iter_warc_records(raw):
                            # Response-only, matching read_warc: real CC
                            # archives interleave request/metadata records
                            # per capture, all carrying WARC-Target-URI;
                            # keeping them would emit ~3x rows with raw
                            # HTTP-request/metadata bytes as bodies.
                            if (rec.error or not rec.target_uri
                                    or rec.warc_type != "response"):
                                continue
                            if http_ok_only and rec.http_status not in (
                                    None, 200):
                                continue
                            urls.append(rec.target_uri)
                            bodies.append(rec.body)
                            if len(urls) >= chunk_records:
                                yield pa.RecordBatch.from_arrays(
                                    [pa.array(urls, pa.string()),
                                     pa.array(bodies, pa.binary())],
                                    names=["url", "html"])
                                urls, bodies = [], []
                    except WarcError:
                        continue  # file-level garbage: skip the archive
            if urls:
                yield pa.RecordBatch.from_arrays(
                    [pa.array(urls, pa.string()),
                     pa.array(bodies, pa.binary())],
                    names=["url", "html"])

        yield from extract(parsed())

    return fn
