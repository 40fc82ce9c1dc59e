"""Spark-layer integration tests: extraction UDFs, SQL registration,
pipeline lineage + checkpoint/resume."""

import json
import os
import shutil

import pytest

pyspark = pytest.importorskip("pyspark")

import pyspark.sql.functions as F  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from zpdfspark.spark.session import get_spark

    s = get_spark(4, "zpdfspark-tests", shuffle_partitions=4)
    yield s
    s.stop()


@pytest.fixture(scope="module")
def corpus_path(tmp_path_factory):
    from zpdfspark.fixtures import write_corpus_parquet

    p = tmp_path_factory.mktemp("corpus") / "corpus.parquet"
    write_corpus_parquet(str(p), 150, seed=42)
    return str(p)


def test_extract_dataframe_parity(spark, corpus_path):
    from zpdfspark.spark.udfs import extract_dataframe

    corpus = spark.read.parquet(corpus_path)
    res = extract_dataframe(corpus, "accuracy")
    joined = res.join(corpus.select("url", "text"), "url")
    total = joined.where(F.col("text").isNotNull()).count()
    match = joined.where(
        F.col("text").isNotNull() & (F.col("extracted_text") == F.col("text"))
    ).count()
    assert match == total > 0


def test_sql_udfs(spark, corpus_path):
    from zpdfspark.spark.udfs import register_sql_udfs

    register_sql_udfs(spark)
    spark.read.parquet(corpus_path).createOrReplaceTempView("pages")
    row = spark.sql(
        "SELECT count(*) AS n, sum(zpdf_page_count(html)) AS pages, "
        "sum(CASE WHEN zpdf_is_encrypted(html) THEN 1 ELSE 0 END) AS enc "
        "FROM pages"
    ).collect()[0]
    assert row["n"] == 150
    assert row["pages"] > 0


def test_pipeline_resume(spark, corpus_path, tmp_path):
    from zpdfspark.spark.pipeline import completed_buckets, run_extraction_job

    out = str(tmp_path / "out")
    s1 = run_extraction_job(spark, corpus_path, out, n_buckets=4, partitions=4)
    assert s1["buckets_run"] == 4
    assert s1["docs"] == 150
    done = completed_buckets(spark, os.path.join(out, "_lineage"))
    assert done == [0, 1, 2, 3]

    # simulate a crash: wipe one bucket's lineage and rerun — only the
    # missing bucket should re-execute (anti-join on completed lineage)
    lineage_dir = os.path.join(out, "_lineage")
    lineage = spark.read.json(lineage_dir).where(F.col("bucket") != 2)
    rows = [r.asDict() for r in lineage.collect()]
    shutil.rmtree(lineage_dir)
    os.makedirs(lineage_dir)
    with open(os.path.join(lineage_dir, "part-manual.json"), "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")

    s2 = run_extraction_job(spark, corpus_path, out, n_buckets=4, partitions=4)
    assert s2["buckets_skipped"] == 3
    assert s2["buckets_run"] == 1

    # all docs present exactly once in the output
    result = spark.read.parquet(os.path.join(out, "data"))
    assert result.select("url").distinct().count() == 150
    assert result.count() == 150


def test_lineage_metrics_populated(spark, corpus_path, tmp_path):
    from zpdfspark.spark.pipeline import run_extraction_job

    out = str(tmp_path / "out2")
    run_extraction_job(spark, corpus_path, out, n_buckets=2, partitions=4)
    lineage = spark.read.json(os.path.join(out, "_lineage"))
    row = lineage.agg(
        F.sum("n_docs").alias("docs"),
        F.sum("n_pages").alias("pages"),
        F.sum("n_errors").alias("errors"),
        F.sum("stream_pages").alias("stream_pages"),
    ).collect()[0]
    assert row["docs"] == 150
    assert row["pages"] > 0
    assert row["stream_pages"] > 0
    # lineage error total equals the per-doc error_count ground truth
    truth = (
        spark.read.parquet(os.path.join(out, "data"))
        .agg(F.sum("error_count")).collect()[0][0]
    )
    assert row["errors"] == truth


def test_maybe_salted_map_only_default(spark, corpus_path):
    """The 100 TB shape: by default no exchange touches the raw blobs —
    extraction runs on scan splits. Salt / big-doc isolation /
    --repartition-blobs opt back into the exchange."""
    from zpdfspark.spark.pipeline import maybe_salted

    df = spark.read.parquet(corpus_path).select("url", "html")
    plain = maybe_salted(df, 8)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plain
    forced = maybe_salted(df, 8, repartition_blobs=True) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in forced
    salted_plan = maybe_salted(df, 8, salt=7) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" in salted_plan


def test_salted_partitioning_spreads_rows(spark, corpus_path):
    from zpdfspark.spark.pipeline import salted

    df = salted(spark.read.parquet(corpus_path).select("url", "html"), 8)
    counts = (
        df.withColumn("pid", F.spark_partition_id())
        .groupBy("pid").count().collect()
    )
    assert len(counts) == 8
    sizes = [r["count"] for r in counts]
    mean = sum(sizes) / len(sizes)
    assert max(sizes) <= 3 * mean  # no partition dominates


def test_salted_big_doc_isolation(spark, corpus_path):
    """With big_doc_bytes set, oversized blobs land in partitions that
    contain no small documents."""
    from zpdfspark.spark.pipeline import salted

    df = spark.read.parquet(corpus_path).select("url", "html")
    threshold = 1_000  # the 150-doc sample has both classes at 1 KB
    out = salted(df, 8, big_doc_bytes=threshold)
    per_part = (
        out.withColumn("pid", F.spark_partition_id())
        .withColumn("is_big", (F.length("html") > threshold).cast("int"))
        .groupBy("pid")
        .agg(F.sum("is_big").alias("big"), F.count("*").alias("total"))
        .collect()
    )
    big_rows = sum(r["big"] for r in per_part)
    assert big_rows > 0, "fixture corpus should contain oversized docs"
    for r in per_part:
        if r["big"] > 0:
            assert r["big"] == r["total"], "big-doc partition contains small docs"


def test_pipeline_single_pass(spark, corpus_path, tmp_path):
    """--single-pass: one scan over all pending buckets, identical
    output + lineage semantics, still resumable afterwards."""
    from zpdfspark.spark.pipeline import completed_buckets, run_extraction_job

    out = str(tmp_path / "outsp")
    s1 = run_extraction_job(spark, corpus_path, out, n_buckets=4,
                            partitions=4, single_pass=True)
    assert s1["buckets_run"] == 4
    assert s1["docs"] == 150
    assert completed_buckets(spark, os.path.join(out, "_lineage")) == [0, 1, 2, 3]
    result = spark.read.parquet(os.path.join(out, "data"))
    assert result.count() == 150
    assert result.select("url").distinct().count() == 150
    # a rerun (either mode) skips everything
    s2 = run_extraction_job(spark, corpus_path, out, n_buckets=4, partitions=4)
    assert s2["buckets_skipped"] == 4 and s2["buckets_run"] == 0


def test_driver_contract_shape():
    """Every oracle key has a query; entry is callable; queries are
    uniquely named (the driver treats these as the correctness gate)."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    assert len(qs) >= 25
    assert callable(entry_mod.entry)


def test_media_plumbing(spark, corpus_path):
    """Multimodal kernels (spark/media.py): decode is REAL for the
    image kinds (png/jpeg/gif pure-Python decoders) and WAV,
    stubbed-soft for codec-less kinds (error records, never raises);
    the fake path is deterministic; frame sampling expands 1-to-N
    inside the task; embeddings are stable."""
    from zpdfspark.spark import media

    base = spark.read.parquet(corpus_path)
    # 20 arbitrary rows plus guaranteed image-kind coverage
    df = base.limit(20)
    for kind in ("png", "jpeg", "gif"):
        df = df.unionByName(
            base.where(F.col("url").like(f"%/{kind}/%")).limit(3))
    df = df.distinct()

    # decode: real for image kinds (actual dimensions), soft-fail
    # elsewhere
    dec = media.decode_dataframe(df).collect()
    for kind in ("png", "jpeg", "gif"):
        assert any(r.media_kind == kind for r in dec), kind
    for r in dec:
        if r.media_kind in ("png", "jpeg", "gif"):
            assert r.decode_ok and r.width >= 1 and r.height >= 1
        elif r.media_kind == "wav":
            assert r.decode_ok and r.width == 0  # audio: no pixel dims
        else:
            assert not r.decode_ok and r.width == 0
    # fake decode: deterministic dims, all ok
    fake1 = {r.url: (r.width, r.height) for r in
             media.decode_dataframe(df, fake=True).collect()}
    fake2 = {r.url: (r.width, r.height) for r in
             media.decode_dataframe(df, fake=True).collect()}
    assert fake1 == fake2
    assert all(1 <= w <= 64 and 1 <= h <= 64 for w, h in fake1.values())

    # resize: REAL for the image kinds (3-channel nearest-neighbor ->
    # exact bytes), soft-fail elsewhere; fake sizes w*h*3
    rs = media.resize_dataframe(df, 32, 16, fake=True).collect()
    assert all(r.out_bytes == 32 * 16 * 3 and r.resize_ok for r in rs)
    rs0 = {r.url: r for r in media.resize_dataframe(df, 32, 16).collect()}
    kinds = {r.url: r.media_kind for r in dec}
    for url, r in rs0.items():
        if kinds[url] in ("png", "jpeg", "gif"):
            # out bytes = w*h*channels; grayscale jpeg decodes 1 channel
            assert r.resize_ok and r.out_bytes in (
                32 * 16 * c for c in (1, 2, 3, 4))
        else:  # resize is an image op: wav and stubs fail soft
            assert not r.resize_ok and r.out_bytes == 0

    # frame sampling: 1-to-N with exact chunk arithmetic
    import pandas as pd
    pdf = pd.DataFrame({"doc_id": [1, 2, 3],
                        "text": ["x" * 130, "y" * 64, ""]})
    sdf = spark.createDataFrame(pdf)
    frames = media.frame_sample_dataframe(sdf).collect()
    per_doc = {}
    for r in frames:
        per_doc.setdefault(r.doc_id, []).append(r.frame_idx)
    assert sorted(per_doc[1]) == [0, 1, 2]   # 130 chars -> 3 frames
    assert per_doc[2] == [0]
    assert 3 not in per_doc                   # empty payload -> no rows

    # embeddings: 4 dims in [0, 1), deterministic
    e1 = {r.doc_id: (r.e0, r.e1, r.e2, r.e3)
          for r in media.embed_dataframe(sdf).collect()}
    e2 = {r.doc_id: (r.e0, r.e1, r.e2, r.e3)
          for r in media.embed_dataframe(sdf).collect()}
    assert e1 == e2 and all(0 <= v < 1 for vs in e1.values() for v in vs)


def test_format_job_json_and_pages(spark, tmp_path, corpus_path):
    """CLI -f json / -p a-b (main.zig:173-177, 252-339): json docs carry
    {metadata, page_count, outline, pages}; an explicit page range
    restricts the page array / page rows kernel-side. Uses the shared
    300-doc corpus: every generator (including multipage) is guaranteed
    present, regardless of how the generator rotation reshuffles when
    new fixture kinds are added."""
    from zpdfspark.spark.pipeline import parse_page_range, run_format_job

    src = corpus_path

    out = str(tmp_path / "json_out")
    s = run_format_job(spark, src, out, "json")
    assert s["rows"] == 150
    rows = spark.read.parquet(os.path.join(out, "data")).collect()
    multi = [r for r in rows if "/multipage/" in r["url"]]
    assert multi
    doc = json.loads(multi[0]["doc_json"])
    assert doc["page_count"] >= 2
    assert [p["page"] for p in doc["pages"]] == list(
        range(1, doc["page_count"] + 1))
    assert all("text" in p for p in doc["pages"])

    # --pages 1-1: every multipage doc's json carries exactly page 1
    out2 = str(tmp_path / "json_p1")
    run_format_job(spark, src, out2, "json", page_range=parse_page_range("1-1"))
    rows2 = spark.read.parquet(os.path.join(out2, "data")).collect()
    doc2 = json.loads([r for r in rows2 if r["url"] == multi[0]["url"]][0]["doc_json"])
    assert [p["page"] for p in doc2["pages"]] == [1]
    assert doc2["pages"][0]["text"] == doc["pages"][0]["text"]
    assert doc2["page_count"] == doc["page_count"]  # count is doc-level

    # text format + --pages -> per-page rows within the range
    out3 = str(tmp_path / "pages_out")
    s3 = run_format_job(spark, src, out3, "text", page_range=(2, 3))
    pg = spark.read.parquet(os.path.join(out3, "data"))
    pages_seen = {r["page"] for r in pg.select("page").distinct().collect()}
    assert pages_seen <= {1, 2}  # 0-based rows for 1-based range 2-3
    assert s3["rows"] == pg.count() > 0

    # markdown format renders every doc
    out4 = str(tmp_path / "md_out")
    s4 = run_format_job(spark, src, out4, "markdown")
    assert s4["rows"] == 150

    with pytest.raises(ValueError):
        parse_page_range("3-1")


def test_bucketed_input_prunes_per_bucket_scans(spark, corpus_path, tmp_path):
    """With the input laid out as bucket=K partition dirs (the
    write_bucketed_input preparation job / Iceberg bucket transform),
    each per-bucket resume scan partition-prunes to its own directory —
    n_buckets scans read the input once in total, not n_buckets times."""
    from zpdfspark.spark.pipeline import run_extraction_job, write_bucketed_input

    bsrc = str(tmp_path / "bucketed_src")
    write_bucketed_input(spark, corpus_path, bsrc, n_buckets=4)
    df = spark.read.parquet(bsrc)
    assert "bucket" in df.columns

    # the physical proof: the bucket filter becomes a PARTITION filter at
    # the scan (directory pruning), not a post-scan data filter
    plan = df.where(F.col("bucket") == 2)._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"))
    pf = [l for l in plan.splitlines() if "PartitionFilters" in l]
    assert pf and "bucket" in pf[0] and "= 2" in pf[0], plan

    out = str(tmp_path / "out_bucketed")
    s = run_extraction_job(spark, bsrc, out, n_buckets=4, partitions=4)
    assert s["buckets_run"] == 4 and s["docs"] == 150
    result = spark.read.parquet(os.path.join(out, "data"))
    assert result.select("url").distinct().count() == 150

    # rerun resumes; single_pass is ignored for bucketed inputs (the
    # per-bucket path is already pruned AND bucket-granular idempotent)
    s2 = run_extraction_job(spark, bsrc, out, n_buckets=4, partitions=4,
                            single_pass=True)
    assert s2["buckets_run"] == 0 and s2["buckets_skipped"] == 4


def test_sql_udf_surface_complete(spark, corpus_path):
    """Round-2 SQL surface: markdown, doc-JSON, and parameterized search
    callable straight from Spark SQL (SURVEY.md §2.11b)."""
    from zpdfspark.spark.udfs import register_sql_udfs

    register_sql_udfs(spark)
    spark.read.parquet(corpus_path).createOrReplaceTempView("pages2")
    row = spark.sql(
        "SELECT zpdf_markdown(html) AS md, zpdf_doc_json(html) AS dj, "
        "zpdf_search_json(html, 'Hello') AS sj, "
        "zpdf_extract_secondary(html) AS sec, zpdf_extract(html) AS prod "
        "FROM pages2 WHERE url LIKE '%/minimal/%' LIMIT 1"
    ).collect()[0]
    assert row["md"].startswith("Hello World")
    doc = json.loads(row["dj"])
    assert doc["page_count"] == 1 and doc["pages"][0]["page"] == 1
    matches = json.loads(row["sj"])
    assert matches and matches[0]["page"] == 0 and matches[0]["offset"] == 0
    # the secondary-interpreter diagnostic surface agrees with the
    # production path on plain streams (kernel tests pin where the two
    # interpretations deliberately differ)
    assert row["sec"] == row["prod"]
    assert row["prod"].startswith("Hello World")


def test_format_job_info(spark, tmp_path):
    """CLI --format info: the `zpdf info` analog."""
    from zpdfspark.fixtures import write_corpus_parquet
    from zpdfspark.spark.pipeline import run_format_job

    src = str(tmp_path / "srci.parquet")
    write_corpus_parquet(src, 30, seed=13)
    out = str(tmp_path / "info_out")
    s = run_format_job(spark, src, out, "info")
    assert s["rows"] == 30
    rows = spark.read.parquet(os.path.join(out, "data"))
    assert {"url", "title", "n_pages", "is_encrypted"} <= set(rows.columns)
    assert rows.count() == 30


def test_format_markdown_respects_pages(spark, tmp_path, corpus_path):
    """--pages must restrict markdown rendering (it silently didn't)."""
    from zpdfspark.spark.pipeline import run_format_job

    src = corpus_path
    out_all = str(tmp_path / "md_all")
    out_p1 = str(tmp_path / "md_p1")
    run_format_job(spark, src, out_all, "markdown")
    run_format_job(spark, src, out_p1, "markdown", page_range=(1, 1))
    full = {r["url"]: r["markdown"] for r in
            spark.read.parquet(os.path.join(out_all, "data")).collect()}
    p1 = {r["url"]: r["markdown"] for r in
          spark.read.parquet(os.path.join(out_p1, "data")).collect()}
    multi = [u for u in full if "/multipage/" in u]
    assert multi
    for u in multi:
        assert "\n---\n\n" in full[u]        # all pages, with separators
        assert "\n---\n\n" not in p1[u]      # page 1 only
        assert full[u].startswith(p1[u])
    # info + --pages is a usage error, not silently ignored
    with pytest.raises(ValueError):
        run_format_job(spark, src, str(tmp_path / "x"), "info",
                       page_range=(1, 1))


def test_bucketed_input_domain_validated(spark, corpus_path, tmp_path):
    """A bucket column whose values fall outside range(n_buckets) must
    fail loudly — a mismatched layout would otherwise silently skip
    those rows forever while reporting success."""
    from zpdfspark.spark.pipeline import run_extraction_job, write_bucketed_input

    bsrc = str(tmp_path / "bsrc16")
    write_bucketed_input(spark, corpus_path, bsrc, n_buckets=16)
    with pytest.raises(ValueError, match="outside range"):
        run_extraction_job(spark, bsrc, str(tmp_path / "outx"),
                           n_buckets=4, partitions=4)

    # the domain check must come from the partition LISTING, not a data
    # scan (ADVICE r2: distinct().collect() was a full extra job per run)
    from zpdfspark.spark.pipeline import _bucket_domain_from_listing
    listed = _bucket_domain_from_listing(spark, bsrc)
    assert listed is not None and sorted(int(v) for v in listed) == list(
        range(16))

    # fallback path: 'bucket' as a plain DATA column (no partition dirs)
    # still validated — via a pruned/pushed filter, not a distinct
    flat = str(tmp_path / "flat_bad")
    (spark.read.parquet(corpus_path)
     .withColumn("bucket", F.lit(99))
     .write.parquet(flat))
    assert _bucket_domain_from_listing(spark, flat) is None
    with pytest.raises(ValueError, match="outside range"):
        run_extraction_job(spark, flat, str(tmp_path / "outy"),
                           n_buckets=4, partitions=4)


def test_warc_ingestion_end_to_end(spark, tmp_path):
    """The north-rule input loop closed at the source: Common-Crawl-
    style .warc.gz archives -> warc_source (file-per-task, in-task
    record parse, HTTP strip) -> the SAME extraction pipeline ->
    byte-identical text per url against the generators' own expected
    text."""
    from zpdfspark.fixtures import corpus_rows, write_warc_fixture
    from zpdfspark.spark.pipeline import run_extraction_job
    from zpdfspark.spark.warc_source import warc_documents

    d = str(tmp_path / "warc")
    glob, _expected = write_warc_fixture(d, 90, seed=13)

    # records land with the right shape and payload bytes
    docs = warc_documents(spark, glob)
    rows = {r["url"]: r for r in docs.collect()}
    truth = {u: (ts, pdf, text)
             for u, ts, pdf, text, _lang in corpus_rows(90, seed=13)}
    assert set(rows) == set(truth)
    for u, r in rows.items():
        assert bytes(r["html"]) == truth[u][1]
        assert r["warc_ts"] is not None

    # full pipeline straight off the archives
    out = str(tmp_path / "out")
    stats = run_extraction_job(spark, glob, out, n_buckets=2,
                               partitions=4, single_pass=True,
                               input_format="warc")
    assert stats["docs"] == 90
    result = {r["url"]: r["extracted_text"] for r in
              spark.read.parquet(os.path.join(out, "data")).collect()}
    n_checked = 0
    for u, (_ts, _pdf, text) in truth.items():
        if text is not None:
            assert result[u] == text, u
            n_checked += 1
    assert n_checked > 50


def test_warc_fractional_date_and_revisits(spark, tmp_path):
    """WARC 1.1 permits fractional-second dates — those rows must keep
    a non-null warc_ts (ADVICE r3); revisit records surface as dedup
    hints via warc_revisits."""
    from zpdfspark.kernel.warc import build_warc
    from zpdfspark.spark.warc_source import warc_documents, warc_revisits

    recs = [
        ("http://e.com/frac", "2025-01-01T00:00:00.123Z", b"%PDF-1.4 x",
         "application/pdf"),
        ("http://e.com/whole", "2025-01-02T00:00:00Z", b"%PDF-1.4 y",
         "application/pdf"),
        ("http://e.com/frac", "2025-02-01T00:00:00Z", b"", "message/http",
         "revisit", {"WARC-Refers-To-Target-URI": "http://e.com/frac",
                     "WARC-Refers-To-Date": "2025-01-01T00:00:00.123Z"}),
    ]
    p = tmp_path / "frac.warc.gz"
    p.write_bytes(build_warc(recs))

    docs = {r["url"]: r for r in warc_documents(spark, str(p)).collect()}
    assert set(docs) == {"http://e.com/frac", "http://e.com/whole"}
    assert docs["http://e.com/frac"]["warc_ts"] is not None
    assert docs["http://e.com/whole"]["warc_ts"] is not None

    revs = warc_revisits(spark, str(p)).collect()
    assert len(revs) == 1
    assert revs[0]["refers_to_uri"] == "http://e.com/frac"
    assert revs[0]["refers_to_date"] == "2025-01-01T00:00:00.123Z"


def test_warc_fused_equals_two_stage(spark, tmp_path):
    """The fused parse+extract kernel (single-pass default) must be
    byte-identical to the two-stage form (warc_documents -> extraction
    kernel) — fusion is a plan optimization, never a semantics change."""
    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.spark.udfs import EXTRACT_SCHEMA, extract_arrow_batches
    from zpdfspark.spark.warc_source import (warc_documents,
                                             warc_extract_arrow_batches)

    d = str(tmp_path / "warc")
    glob, _ = write_warc_fixture(d, 70, seed=31)

    two_stage = {r["url"]: r for r in
                 warc_documents(spark, glob).select("url", "html")
                 .mapInArrow(extract_arrow_batches("accuracy"),
                             EXTRACT_SCHEMA).collect()}
    fused = {r["url"]: r for r in
             spark.read.format("binaryFile").load(glob)
             .select("path", "content")
             .mapInArrow(warc_extract_arrow_batches("accuracy"),
                         EXTRACT_SCHEMA).collect()}
    assert set(fused) == set(two_stage) and len(fused) == 70
    for u, r in fused.items():
        assert r["extracted_text"] == two_stage[u]["extracted_text"], u
        assert r["n_pages"] == two_stage[u]["n_pages"]
        assert r["error_count"] == two_stage[u]["error_count"]


def test_robots_parser_rfc9309_edges(spark):
    """The higher-order robots.txt fold must honor the grouped format:
    consecutive User-agent lines SHARE the following directives, a
    directive CLOSES the group (the next UA line starts fresh), field
    names are case-insensitive, comments/blank lines are state-neutral,
    and evaluation picks the most-specific group with longest-match /
    Allow-wins-ties precedence."""
    import __spark_entry__ as E
    import pyspark.sql.functions as F

    # drive the full query and cross-check hand-picked doc_ids against
    # the RFC semantics (the oracle already replays the formula; this
    # pins WHY each verdict holds)
    df = E.queries()["robots_eval"](spark, "/root/testdata/sf0.001")
    rows = {r["doc_id"]: r for r in df.collect()}

    # doc 28: h=0 (even, specific group), v=0, k=1 != h -> no rule hits
    assert rows[28]["disallowed"] is False and rows[28]["matched_path"] is None
    # doc 84: h=0, v=0, k=3 != 0 -> allowed
    assert rows[84]["disallowed"] is False
    # doc 112: 112%7=0 even, 112%4=0, 112%9=4 != 0 -> allowed
    assert rows[112]["disallowed"] is False
    # find a disallowed case: v==0, k==h, h even
    hits = [d for d, r in rows.items()
            if r["disallowed"] and "/page" in r["path"]]
    for d in hits:
        h = d % 7
        assert h % 2 == 0 and d % 4 == 0 and d % 9 == h
        assert rows[d]["matched_path"] == f"/p{h}/"
    assert hits, "seeding must produce at least one disallowed page URL"
    # odd host private page disallowed by the '*' fallback group
    odd_hits = [d for d, r in rows.items()
                if r["disallowed"] and r["path"].startswith("/private/")]
    for d in odd_hits:
        assert (d % 7) % 2 == 1 and d % 4 == 1
    assert odd_hits
    # Allow longest-match beats Disallow: /p{h}/open/ paths stay allowed
    open_rows = [r for r in rows.values()
                 if "/open/" in r["path"] and r["matched_path"]]
    assert open_rows and all(not r["disallowed"] for r in open_rows)


def test_pipeline_quality_gate_column(spark, tmp_path, corpus_path):
    """--quality-gate must append the quality_keep column to BOTH the
    per-bucket and single-pass batch paths, agreeing exactly with the
    shared predicate (gopher_keep_expr over extracted_text), without
    touching row counts or resume semantics."""
    from zpdfspark.spark.pipeline import run_extraction_job
    from zpdfspark.spark.streaming import gopher_keep_expr

    for single_pass in (False, True):
        out = str(tmp_path / f"qg_{int(single_pass)}")
        summary = run_extraction_job(
            spark, corpus_path, out, n_buckets=3,
            single_pass=single_pass, quality_gate=True)
        assert summary["buckets_run"] == 3
        res = spark.read.parquet(os.path.join(out, "data"))
        assert "quality_keep" in res.columns
        n = res.count()
        assert n == summary["docs"] > 0
        mismatch = res.where(
            F.col("quality_keep") != gopher_keep_expr()).count()
        assert mismatch == 0
        assert 0 < res.where("quality_keep").count() < n
        # resume untouched: a re-run skips everything
        again = run_extraction_job(
            spark, corpus_path, out, n_buckets=3,
            single_pass=single_pass, quality_gate=True)
        assert again["buckets_run"] == 0 and again["buckets_skipped"] == 3


def test_warc_http_ok_only_filters_non_200(spark, tmp_path):
    """--http-ok-only must drop 301/404 responses in BOTH WARC paths
    (fused single-pass and two-stage) and keep everything with a 200
    envelope; fused and two-stage must agree exactly."""
    import glob as globmod

    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.spark.pipeline import run_extraction_job

    d = str(tmp_path / "warcok")
    glob, expected = write_warc_fixture(d, 70, seed=33)
    exp = spark.read.parquet(expected)
    n_all = exp.count()
    n_ok = exp.where("http_status = 200").count()
    assert 0 < n_ok < n_all  # the w3 fixture seeds 301/404 captures

    outs = {}
    for sp in (False, True):
        out = str(tmp_path / f"ok_{int(sp)}")
        run_extraction_job(spark, glob, out, input_format="warc",
                           n_buckets=2, single_pass=sp,
                           http_ok_only=True)
        res = spark.read.parquet(os.path.join(out, "data"))
        assert res.count() == n_ok
        # exactly the 200-status urls survived
        ok_urls = {r["url"] for r in
                   exp.where("http_status = 200").select("url").collect()}
        assert {r["url"] for r in res.select("url").collect()} == ok_urls
        outs[sp] = res

    # without the flag, everything extracts
    out_all = str(tmp_path / "ok_none")
    run_extraction_job(spark, glob, out_all, input_format="warc",
                       n_buckets=2, single_pass=True)
    assert spark.read.parquet(
        os.path.join(out_all, "data")).count() == n_all


def test_substring_dedup_island_arithmetic(spark, tmp_path):
    """Hand-built corpus pinning the ExactSubstr span merge: docs 0
    and 1 share a 25-token run (doc 0 at token 0, doc 1 at token 10),
    doc 2 is unique. W=20 -> each sharer has 6 duplicated windows
    that must merge into ONE island covering exactly the 25 shared
    tokens; the unique doc reports zeros."""
    import __spark_entry__ as E

    shared = " ".join(f"a{i}" for i in range(25))
    rows = [
        (0, shared + " " + " ".join(f"x{i}" for i in range(10)), "en"),
        (1, " ".join(f"b{i}" for i in range(10)) + " " + shared, "en"),
        (2, " ".join(f"c{i}" for i in range(30)), "en"),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["substring_dedup"](spark, d).collect()}
    assert got[0] == {"doc_id": 0, "n_tokens": 35, "n_windows": 16,
                      "n_dup_windows": 6, "dup_tokens": 25}
    assert got[1] == {"doc_id": 1, "n_tokens": 35, "n_windows": 16,
                      "n_dup_windows": 6, "dup_tokens": 25}
    assert got[2] == {"doc_id": 2, "n_tokens": 30, "n_windows": 11,
                      "n_dup_windows": 0, "dup_tokens": 0}


def test_wet_export_roundtrip_and_determinism(spark, corpus_path, tmp_path):
    """WET sink (r5): files re-read record-for-record — warcinfo
    leads, conversion texts byte-match the extraction kernel's own
    output per url, and a second run writes byte-identical files
    (idempotent temp+rename, pinned gzip mtime, md5 record ids)."""
    import glob
    import hashlib

    from zpdfspark.kernel.htmltext import extract_any
    from zpdfspark.kernel.warc import iter_warc_records
    from zpdfspark.spark.warc_sink import write_wet

    df = spark.read.parquet(corpus_path)
    out = str(tmp_path / "wet")
    summaries = write_wet(df, out, partitions=3).collect()
    files = sorted(glob.glob(os.path.join(out, "*.warc.wet.gz")))
    assert files and len(files) == len(summaries) <= 3
    assert not glob.glob(os.path.join(out, ".*tmp*"))  # no torn files

    expected = {r["url"]: extract_any(bytes(r["html"]), "accuracy")[0]
                for r in df.select("url", "html").collect()}
    got = {}
    total_records = 0
    for path in files:
        recs = list(iter_warc_records(open(path, "rb").read()))
        assert recs[0].warc_type == "warcinfo"
        urls_in_file = []
        for r in recs[1:]:
            assert r.warc_type == "conversion", r.warc_type
            assert r.error is None
            got[r.target_uri] = r.body.decode("utf-8")
            urls_in_file.append(r.target_uri)
            total_records += 1
        assert urls_in_file == sorted(urls_in_file)  # in-file order
    assert got == expected
    assert total_records == sum(s["n_records"] for s in summaries)

    hashes = {os.path.basename(p): hashlib.md5(
        open(p, "rb").read()).hexdigest() for p in files}
    write_wet(df, out, partitions=3).collect()  # re-run over existing
    for p in files:
        assert hashlib.md5(open(p, "rb").read()).hexdigest() \
            == hashes[os.path.basename(p)]


def test_format_job_wet(spark, corpus_path, tmp_path):
    """CLI surface: --format wet through run_format_job reports the
    record/file totals and writes under <out>/data."""
    import glob

    from zpdfspark.spark.pipeline import run_format_job

    out = str(tmp_path / "wetjob")
    summary = run_format_job(spark, corpus_path, out, "wet",
                             partitions=2)
    assert summary["format"] == "wet"
    n_docs = spark.read.parquet(corpus_path).count()
    assert summary["rows"] == n_docs
    assert summary["files"] == len(
        glob.glob(os.path.join(out, "data", "*.warc.wet.gz")))
    import pytest
    with pytest.raises(ValueError):
        run_format_job(spark, corpus_path, out, "wet",
                       page_range=(1, 2))


def test_wat_export_roundtrip(spark, corpus_path, tmp_path):
    """WAT sink (r5): metadata records re-read and JSON-parsed —
    every row present, Actual-Content-Length exact, HTML rows carry
    Head/Links mined by the same regex set as html_meta, non-HTML
    rows omit HTML-Metadata; byte-identical second run."""
    import glob
    import hashlib
    import json
    import re

    from zpdfspark.kernel.htmltext import looks_like_html
    from zpdfspark.kernel.warc import iter_warc_records
    from zpdfspark.spark.warc_sink import write_wat

    df = spark.read.parquet(corpus_path)
    out = str(tmp_path / "wat")
    summaries = write_wat(df, out, partitions=3).collect()
    files = sorted(glob.glob(os.path.join(out, "*.warc.wat.gz")))
    assert files and len(files) == len(summaries) <= 3

    raws = {r["url"]: bytes(r["html"])
            for r in df.select("url", "html").collect()}
    seen = {}
    for path in files:
        recs = list(iter_warc_records(open(path, "rb").read()))
        assert recs[0].warc_type == "warcinfo"
        for r in recs[1:]:
            assert r.warc_type == "metadata", r.warc_type
            assert r.error is None
            seen[r.target_uri] = json.loads(r.body)
    assert set(seen) == set(raws)
    n_html = 0
    for url, meta in seen.items():
        pm = meta["Envelope"]["Payload-Metadata"]
        assert pm["Actual-Content-Length"] == len(raws[url])
        if looks_like_html(raws[url]):
            n_html += 1
            hm = pm["HTML-Metadata"]
            text = raws[url].decode("utf-8", "replace")
            want_links = re.findall(r'<a[^>]*\shref="([^"]*)"', text)
            assert [x["url"] for x in hm["Links"]] == want_links[:1000]
            m = re.search(r"<title>([^<]*)</title>", text)
            if m:
                assert hm["Head"]["Title"] == m.group(1)
        else:
            assert "HTML-Metadata" not in pm
    assert n_html > 0

    hashes = [hashlib.md5(open(p, "rb").read()).hexdigest()
              for p in files]
    write_wat(df, out, partitions=3).collect()
    assert [hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in files] == hashes

    from zpdfspark.spark.pipeline import run_format_job
    summary = run_format_job(spark, corpus_path,
                             str(tmp_path / "watjob"), "wat",
                             partitions=2)
    assert summary["format"] == "wat"
    assert summary["rows"] == len(raws)


def test_warc_to_wet_end_to_end(spark, tmp_path):
    """The canonical Common Crawl conversion in one job: .warc.gz
    archives -> --format wet -> conversion records whose text
    byte-matches the kernel's extraction of each archived payload."""
    import glob as globmod
    import json

    from zpdfspark.fixtures import corpus_rows, write_warc_fixture
    from zpdfspark.kernel.htmltext import extract_any
    from zpdfspark.kernel.warc import iter_warc_records
    from zpdfspark.spark.pipeline import run_format_job

    d = str(tmp_path / "warc")
    pattern, _expected = write_warc_fixture(d, 60, seed=17)
    out = str(tmp_path / "wet_out")
    summary = run_format_job(spark, pattern, out, "wet",
                             input_format="warc", partitions=2)
    assert summary["format"] == "wet"

    truth = {u: extract_any(pdf, "accuracy")[0]
             for u, _ts, pdf, _text, _lang in corpus_rows(60, seed=17)}
    got = {}
    for path in globmod.glob(os.path.join(out, "data",
                                          "*.warc.wet.gz")):
        for r in list(iter_warc_records(open(path, "rb").read()))[1:]:
            got[r.target_uri] = r.body.decode("utf-8")
    assert got == truth
    assert summary["rows"] == len(truth)

    # WAT twin off the same archives: JSON parses, lengths exact
    out2 = str(tmp_path / "wat_out")
    s2 = run_format_job(spark, pattern, out2, "wat",
                        input_format="warc", partitions=2)
    assert s2["rows"] == len(truth)
    raws = {u: pdf for u, _ts, pdf, _t, _l in corpus_rows(60, seed=17)}
    n = 0
    for path in globmod.glob(os.path.join(out2, "data",
                                          "*.warc.wat.gz")):
        for r in list(iter_warc_records(open(path, "rb").read()))[1:]:
            meta = json.loads(r.body)
            assert (meta["Envelope"]["Payload-Metadata"]
                    ["Actual-Content-Length"]
                    == len(raws[r.target_uri]))
            n += 1
    assert n == len(truth)


def test_winnowing_guarantee_property(spark, tmp_path):
    """Schleimer et al.'s detection guarantee: any substring shared
    across documents of length >= w + k - 1 (= 11 chars at k=8, w=4)
    must surface at least one shared fingerprint in BOTH sharers; a
    document with no such overlap reports zero."""
    import __spark_entry__ as E

    shared = "the quick brown fox jumps over the lazy dog"  # 43 chars
    rows = [
        (0, "AAAA " + shared + " BBBB", "en"),
        (1, "CCCCCC " + shared + " DDDD", "en"),
        (2, "entirely unrelated content with zero overlap here", "en"),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["winnowing"](spark, d).collect()}
    assert got[0]["n_shared_fp"] > 0
    assert got[1]["n_shared_fp"] > 0
    assert got[2]["n_shared_fp"] == 0
    # density: winnowing keeps ~2/(w+1) of grams, never more than all
    for r in got.values():
        assert 0 < r["n_fingerprints"] <= r["n_grams"]


def test_anchor_text_aggregation(spark):
    """anchor_text over the fixture corpus: the html_page footer seeds
    deterministic partner anchors (texts p3/p7 pointing at
    hostN.example/partner), so those targets must aggregate with a
    p-text top pick; global invariants pin the two-stage agg."""
    import __spark_entry__ as E

    rows = E.queries()["anchor_text"](spark, "/root/testdata/sf0.001") \
        .collect()
    assert rows, "fixture corpus has html pages with anchors"
    partner = [r for r in rows if r["dst_url"].endswith("/partner")]
    assert partner, "footer partner anchors must aggregate"
    for r in rows:
        assert 1 <= r["top_n"] <= r["n_anchors"]
        assert r["n_unique_texts"] <= r["n_anchors"]
        assert r["top_text"]
    for r in partner:
        assert r["top_text"] in ("p3", "p7")


def test_content_drift_seeding(spark, tmp_path):
    """Every 3rd doc gains a 5-token suffix: its previous grams all
    survive (n_shared == n_grams_prev), it gains grams, and changed
    flips; unmutated docs must report identical fingerprint sets."""
    import __spark_entry__ as E

    rows = [(i, " ".join(f"w{i}_{k}" for k in range(12)), "en")
            for i in range(30)]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["content_drift"](spark, d).collect()}
    assert len(got) == 30
    for i, r in got.items():
        if i % 3 == 0:
            assert r["changed"] is True
            assert r["n_shared"] == r["n_grams_prev"]
            assert r["n_grams_cur"] == r["n_grams_prev"] + 5
            assert r["jaccard_x1000"] < 1000
        else:
            assert r["changed"] is False
            assert r["jaccard_x1000"] == 1000
            assert r["n_grams_cur"] == r["n_grams_prev"]


def test_badwords_filter_seeding(spark, tmp_path):
    """The C4 blocklist gate: exactly the seeded rows (doc_id % 7 == 0)
    flag, with one occurrence each; clean rows report zero."""
    import __spark_entry__ as E

    rows = [(i, f"clean prose number {i} with ordinary words", "en")
            for i in range(28)]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["badwords_filter"](spark, d).collect()}
    for i, r in got.items():
        if i % 7 == 0:
            assert r["flagged"] is True and r["n_bad_words"] == 1
        else:
            assert r["flagged"] is False and r["n_bad_words"] == 0


def test_charset_report_kernel():
    """charset_report: BOM precedence, prescan declaration surfacing,
    WHATWG alias mapping, unknown-label fallthrough."""
    from zpdfspark.kernel.htmltext import charset_report

    assert charset_report(b"\xef\xbb\xbf<html>") == (True, None, "utf-8")
    assert charset_report(b"\xff\xfe<\x00h\x00")[0] is True
    assert charset_report(b"\xff\xfe<\x00h\x00")[2] == "utf-16-le"
    assert charset_report(b"\xfe\xff\x00<\x00h")[2] == "utf-16-be"
    bom_decl = charset_report(
        b'\xef\xbb\xbf<meta charset="gb2312"><html>')
    assert bom_decl == (True, "gb2312", "utf-8")  # BOM wins the codec
    assert charset_report(
        b'<html><head><meta charset="iso-8859-1"></head>'
    ) == (False, "iso-8859-1", "windows-1252")
    assert charset_report(
        b'<meta http-equiv="Content-Type" content="text/html; '
        b'charset=gb2312">') == (False, "gb2312", "gbk")
    assert charset_report(b"<html><p>plain") == (False, None, "utf-8")
    # unknown label falls through to utf-8 but is still surfaced
    assert charset_report(
        b'<meta charset="x-mystery">') == (False, "x-mystery", "utf-8")
    # declaration outside the 1024-byte prescan window is not seen
    far = b"<html>" + b" " * 1100 + b'<meta charset="gb2312">'
    assert charset_report(far) == (False, None, "utf-8")


def test_zipnum_roundtrip_and_determinism(spark, tmp_path):
    """write_zipnum: every cluster.idx block must be an independently
    gunzippable member whose first line matches the index row; the
    blocks in cluster.idx order must reassemble the full
    (urlkey, ts)-sorted CDXJ index; re-runs are byte-identical."""
    import gzip as _gzip
    import json as _json

    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.spark.warc_sink import write_cluster_idx, write_zipnum
    from zpdfspark.spark.warc_source import warc_cdx

    d = str(tmp_path / "warcs")
    glob, _ = write_warc_fixture(d, 80, seed=19)
    cdx = warc_cdx(spark, glob)
    out = str(tmp_path / "zipnum")
    idx = write_zipnum(cdx, out, lines_per_block=5, partitions=3)
    cluster = write_cluster_idx(idx, out)

    # expected: the full sorted CDXJ line set, rebuilt independently
    # from the query output
    exp_lines = []
    for r in cdx.collect():
        payload = _json.dumps({
            "url": r["url"], "mime": r["mime"] or "",
            "status": str(r["http_status"])
            if r["http_status"] is not None else "",
            "digest": r["digest"], "length": str(r["rec_length"]),
            "offset": str(r["rec_offset"]), "filename": r["warc_file"],
        }, separators=(", ", ": "))
        exp_lines.append(
            (r["urlkey"], r["cdx_ts"], r["digest"], r["warc_file"],
             r["rec_offset"], f"{r['urlkey']} {r['cdx_ts']} {payload}"))
    exp_lines.sort()
    expected = [t[-1] for t in exp_lines]
    assert expected, "fixture must produce CDX rows"

    got = []
    prev_seq = {}
    with open(cluster) as f:
        idx_lines = [ln.rstrip("\n") for ln in f]
    assert [int(ln.split("\t")[4]) for ln in idx_lines] == \
        list(range(len(idx_lines)))
    for ln in idx_lines:
        key, fname, off, length, _seq = ln.split("\t")
        with open(os.path.join(out, fname), "rb") as pf:
            pf.seek(int(off))
            member = pf.read(int(length))
        block = _gzip.decompress(member).decode().splitlines()
        assert 0 < len(block) <= 5
        # the index key is the block's first (urlkey, ts)
        assert block[0].startswith(key.replace(" ", " ", 1))
        first_uk, first_ts = block[0].split(" ", 2)[:2]
        assert key == f"{first_uk} {first_ts}"
        # seq ordering within each part file
        assert prev_seq.get(fname, -1) < int(_seq)
        prev_seq[fname] = int(_seq)
        got.extend(block)
    assert got == expected

    # part files tile exactly: concatenated member lengths == file size
    sizes = {}
    for ln in idx_lines:
        _k, fname, off, length, _s = ln.split("\t")
        sizes[fname] = max(sizes.get(fname, 0), int(off) + int(length))
    for fname, end in sizes.items():
        assert os.path.getsize(os.path.join(out, fname)) == end

    # byte-identical re-run (atomic overwrite, pinned mtimes)
    before = {p: open(os.path.join(out, p), "rb").read()
              for p in os.listdir(out)}
    idx2 = write_zipnum(warc_cdx(spark, glob), out,
                        lines_per_block=5, partitions=3)
    write_cluster_idx(idx2, out)
    after = {p: open(os.path.join(out, p), "rb").read()
             for p in os.listdir(out)}
    assert before == after


def test_format_job_zipnum(spark, tmp_path):
    """CLI drive: --input-format warc --format zipnum writes blocks +
    cluster.idx and reports totals; non-WARC input is refused."""
    import pytest as _pytest

    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.spark.pipeline import run_format_job

    d = str(tmp_path / "warcs")
    glob, _ = write_warc_fixture(d, 60, seed=23)
    out = str(tmp_path / "out")
    summary = run_format_job(spark, glob, out, "zipnum",
                             input_format="warc", partitions=2)
    assert summary["format"] == "zipnum"
    assert summary["rows"] > 0 and summary["blocks"] > 0
    assert os.path.exists(os.path.join(out, "data", "cluster.idx"))
    with _pytest.raises(ValueError):
        run_format_job(spark, glob, out, "zipnum",
                       input_format="parquet")


def test_mojibake_fix_semantics(spark, tmp_path):
    """The generic latin1->utf8 re-decode: seeded rows repair to the
    true text; clean accented text (a real 'é' with no mojibake
    signature) and non-latin1 text (CJK) must pass through untouched —
    the repair is conservative by construction."""
    import __spark_entry__ as E

    rows = [
        (0, "plain ascii words here", "en"),          # seeded (0 % 5)
        (1, "clean café text stays", "en"),      # real e-acute
        (2, "中文 body untouched", "zh"),     # CJK: not latin1
        (3, "more plain prose", "en"),
        (4, "and again plain", "en"),
        (5, "seeded row two", "en"),                  # seeded (5 % 5)
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["mojibake_fix"](spark, d).collect()}
    assert got[0]["was_mojibake"] is True
    assert got[0]["text_fixed"] == "plain ascii words here café naïve"
    assert got[5]["was_mojibake"] is True
    assert got[5]["text_fixed"].endswith(" café naïve")
    for i in (1, 2, 3, 4):
        assert got[i]["was_mojibake"] is False
        assert got[i]["text_fixed"] == rows[i][1]


def test_postings_dictionary_stats(spark, tmp_path):
    """Posting stats: df / total_tf / top posting by (tf, doc_id)
    struct-max, hapax floor df >= 2."""
    import __spark_entry__ as E

    rows = [
        (1, "alpha beta alpha", "en"),
        (2, "alpha gamma", "en"),
        (3, "beta beta beta gamma", "en"),
        (4, "solo", "en"),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["term"]: r.asDict()
           for r in E.queries()["postings"](spark, d).collect()}
    assert set(got) == {"alpha", "beta", "gamma"}  # 'solo' is hapax
    assert got["alpha"] == {"term": "alpha", "df": 2, "total_tf": 3,
                            "top_tf": 2, "top_doc": 1}
    assert got["beta"] == {"term": "beta", "df": 2, "total_tf": 4,
                           "top_tf": 3, "top_doc": 3}
    # gamma ties at tf=1: struct-max breaks to the higher doc_id
    assert got["gamma"] == {"term": "gamma", "df": 2, "total_tf": 2,
                            "top_tf": 1, "top_doc": 3}


def test_unicode_normalize_nfc(spark, tmp_path):
    """NFC: seeded decomposed sequences compose (changed=True, suffix
    becomes precomposed); ASCII rows pass through; a row that is
    ALREADY precomposed must report changed=False."""
    import __spark_entry__ as E

    pre = "café already composed"
    rows = [
        (0, "plain ascii", "en"),         # seeded (0 % 4)
        (1, pre, "en"),
        (2, "more ascii", "en"),
        (3, "yet more", "en"),
        (4, "tail doc", "en"),            # seeded
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["unicode_normalize"](spark, d).collect()}
    assert got[0]["changed"] is True
    assert got[0]["text_nfc"] == "plain ascii café naïve"
    assert got[4]["changed"] is True
    assert got[4]["text_nfc"].endswith(" café naïve")
    for i in (1, 2, 3):
        assert got[i]["changed"] is False
        assert got[i]["text_nfc"] == rows[i][1]


def test_fetch_schedule_politeness(spark, tmp_path):
    """Frontier politeness invariants: per-host sequence numbers are
    dense from 0, offsets are seq*delay with one delay per host, a
    host maps to exactly one worker, and priority order within a host
    is descending."""
    import __spark_entry__ as E

    rows = [(i, "x", "en") for i in range(40)]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = [r.asDict()
           for r in E.queries()["fetch_schedule"](spark, d).collect()]
    assert len(got) == 40
    by_host = {}
    for r in got:
        by_host.setdefault(r["host"], []).append(r)
    assert len(by_host) == 8
    for host, rs in by_host.items():
        rs.sort(key=lambda r: r["seq"])
        assert [r["seq"] for r in rs] == list(range(len(rs)))
        delays = {r["start_offset_ms"] // r["seq"]
                  for r in rs if r["seq"] > 0}
        assert len(delays) == 1          # one crawl delay per host
        assert delays.pop() in (1000, 2000, 3000, 4000)
        assert len({r["worker"] for r in rs}) == 1  # politeness: one
        # fetcher owns the host
        pris = [r["priority"] for r in rs]
        assert pris == sorted(pris, reverse=True)


def test_format_job_cdx(spark, tmp_path):
    """CLI drive: --input-format warc --format cdx writes the sorted
    CDX rows as parquet; rows agree with the warc_cdx query and the
    sort key holds; non-WARC input refused."""
    import pytest as _pytest

    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.spark.pipeline import run_format_job
    from zpdfspark.spark.warc_source import warc_cdx

    d = str(tmp_path / "warcs")
    glob, _ = write_warc_fixture(d, 50, seed=29)
    out = str(tmp_path / "out")
    summary = run_format_job(spark, glob, out, "cdx",
                             input_format="warc")
    assert summary["format"] == "cdx"
    got = spark.read.parquet(os.path.join(out, "data"))
    want = warc_cdx(spark, glob)
    assert summary["rows"] == got.count() == want.count() > 0
    keys = [(r["urlkey"], r["cdx_ts"])
            for r in got.orderBy("urlkey", "cdx_ts").collect()]
    rows = [tuple(sorted(r.asDict().items())) for r in got.collect()]
    assert sorted(rows) == sorted(
        tuple(sorted(r.asDict().items())) for r in want.collect())
    assert keys == sorted(keys)
    with _pytest.raises(ValueError):
        run_format_job(spark, glob, out, "cdx", input_format="parquet")


def test_sentence_stats_arithmetic(spark, tmp_path):
    """Sentence stats on hand-built text: counts, floored mean, max;
    odd doc_ids keep their natural (unseeded) punctuation."""
    import __spark_entry__ as E

    rows = [
        (1, "One two three. Four five! Six seven eight nine?", "en"),
        (3, "no punctuation at all here", "en"),
        (5, "Tail period ends the text.", "en"),
    ]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["sentence_stats"](spark, d).collect()}
    # doc 1: sentences of 3, 2, 4 words
    assert got[1]["n_sentences"] == 3
    assert got[1]["mean_sentence_words"] == 3  # floor(9/3)
    assert got[1]["max_sentence_words"] == 4
    # doc 3: one "sentence" (no terminal runs followed by space)
    assert got[3]["n_sentences"] == 1
    assert got[3]["max_sentence_words"] == 5
    # doc 5: trailing period is not a split point (no following ws)
    assert got[5]["n_sentences"] == 1
    assert got[5]["max_sentence_words"] == 5


def test_sequence_pack_arithmetic(spark, tmp_path):
    """Packing manifest on hand-built token counts (L=128): offsets
    follow the bucket-major order, spans cover exactly the doc's
    tokens, boundary-crossing docs span two sequences."""
    import __spark_entry__ as E

    counts = {0: 100, 1: 60, 2: 200, 3: 1, 4: 30}
    rows = [(i, " ".join(f"w{j}" for j in range(n)), "en")
            for i, n in counts.items()]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["sequence_pack"](spark, d).collect()}
    # doc_ids < 16 so bucket-major order == doc_id order
    want = {
        0: (0, 0, 0, 1, 0),      # tokens [0, 100)
        1: (100, 0, 1, 2, 100),  # [100, 160) crosses seq 0->1
        2: (160, 1, 2, 2, 32),   # [160, 360)
        3: (360, 2, 2, 1, 104),  # [360, 361)
        4: (361, 2, 3, 2, 105),  # [361, 391) crosses seq 2->3
    }
    for i, (off, fs, ls, ns, oif) in want.items():
        g = got[i]
        assert g["n_tokens"] == counts[i]
        assert g["global_offset"] == off
        assert (g["first_seq"], g["last_seq"], g["n_seqs"],
                g["offset_in_first"]) == (fs, ls, ns, oif), g


def test_snapshot_delta_classes(spark, tmp_path):
    """Every delta class is reachable and correctly labeled: %11==3
    docs are new (absent from the previous crawl), %13==5 docs are
    gone, %3==0 docs in both snapshots are changed, the rest
    unchanged."""
    import __spark_entry__ as E

    rows = [(i, f"text of doc {i}", "en") for i in [1, 3, 5, 6, 13]]
    d = str(tmp_path / "sf")
    os.makedirs(d)
    spark.createDataFrame(rows, "doc_id long, text string, lang string") \
        .write.parquet(os.path.join(d, "documents.parquet"))
    got = {r["doc_id"]: r.asDict()
           for r in E.queries()["snapshot_delta"](spark, d).collect()}
    assert got[3]["status"] == "new" and not got[3]["in_prev"]
    assert got[5]["status"] == "gone" and not got[5]["in_cur"]
    assert got[6]["status"] == "changed"
    assert got[1]["status"] == "unchanged"
    assert got[13]["status"] == "unchanged"
    assert all(g["in_cur"] for i, g in got.items() if i != 5)


def test_jsonl_export_roundtrip_and_determinism(spark, corpus_path,
                                                tmp_path):
    """JSONL sink (r5): the C4/Dolma interchange shards re-read
    line-for-line — texts byte-match the extraction kernel per url,
    in-shard url order holds, and a second run writes byte-identical
    files (pinned gzip mtime, sorted compact JSON keys)."""
    import glob
    import gzip
    import hashlib
    import json

    from zpdfspark.kernel.htmltext import extract_any
    from zpdfspark.spark.warc_sink import write_jsonl

    df = spark.read.parquet(corpus_path)
    out = str(tmp_path / "jsonl")
    summaries = write_jsonl(df, out, partitions=3).collect()
    files = sorted(glob.glob(os.path.join(out, "*.jsonl.gz")))
    assert files and len(files) == len(summaries) <= 3
    assert not glob.glob(os.path.join(out, ".*tmp*"))

    expected = {r["url"]: extract_any(bytes(r["html"]), "accuracy")[0]
                for r in df.select("url", "html").collect()}
    got = {}
    total = 0
    for path in files:
        urls_in_file = []
        with gzip.open(path, "rt", encoding="utf-8") as f:
            for line in f:
                o = json.loads(line)
                assert set(o) == {"kind", "lang", "n_chars", "text",
                                  "ts", "url"}
                assert o["n_chars"] == len(o["text"])
                got[o["url"]] = o["text"]
                urls_in_file.append(o["url"])
                total += 1
        assert urls_in_file == sorted(urls_in_file)
    assert got == expected
    assert total == sum(s["n_records"] for s in summaries) == df.count()
    assert all(s["n_bytes"] == os.path.getsize(os.path.join(out, s["file"]))
               for s in summaries)

    hashes = {os.path.basename(p): hashlib.md5(
        open(p, "rb").read()).hexdigest() for p in files}
    write_jsonl(df, out, partitions=3).collect()
    for p in files:
        assert hashlib.md5(open(p, "rb").read()).hexdigest() \
            == hashes[os.path.basename(p)]


def test_format_job_jsonl(spark, corpus_path, tmp_path):
    """--format jsonl: the dataset-release sink through the CLI job
    surface — summary counts match the corpus, shards parse."""
    import glob
    import gzip
    import json

    from zpdfspark.spark.pipeline import run_format_job

    out = str(tmp_path / "jsonl_fmt")
    res = run_format_job(spark, corpus_path, out, "jsonl", partitions=2)
    assert res["format"] == "jsonl"
    assert res["rows"] == spark.read.parquet(corpus_path).count()
    files = sorted(glob.glob(os.path.join(out, "data", "*.jsonl.gz")))
    assert len(files) == res["files"] <= 2
    n = 0
    for p in files:
        with gzip.open(p, "rt", encoding="utf-8") as f:
            for line in f:
                json.loads(line)
                n += 1
    assert n == res["rows"]
