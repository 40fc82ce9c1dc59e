"""Real-document evidence (round 5): the two genuine pdfTeX-produced
PDFs shipped with the OS image (libtasn1 manual, shared-mime-info
spec) — an INDEPENDENT producer (pdfTeX + Type1/CFF fonts, object
streams, xref streams) no fixture generator shaped. The MuPDF
differential of the reference's accuracy benchmark
(/root/reference/benchmark/accuracy.py) remains environment-blocked
(no MuPDF, no network), but these close the all-evidence-is-
synthetic-fixture-shaped gap for the parse path: real producer, real
fonts, real layout must extract cleanly end-to-end."""

import os

import pytest

REAL_PDFS = [
    ("/usr/share/doc/libtasn1-doc/libtasn1.pdf",
     ["Abstract Syntax Notation One", "ASN.1", "structure management"]),
    ("/usr/share/doc/shared-mime-info/shared-mime-info-spec.pdf",
     ["Shared MIME-info Database", "freedesktop.org", "MIME"]),
]

present = [p for p, _ in REAL_PDFS if os.path.exists(p)]
pytestmark = pytest.mark.skipif(
    not present, reason="no real system PDFs in this image")


@pytest.mark.parametrize("path,phrases", REAL_PDFS)
def test_real_pdf_extracts_cleanly(path, phrases):
    if not os.path.exists(path):
        pytest.skip("not in this image")
    from zpdfspark.kernel.document import Document

    raw = open(path, "rb").read()
    d = Document(raw)
    text = d.extract_all("accuracy")
    assert d.page_count > 10
    assert len(text) > 10_000
    assert len(d.errors) == 0, d.errors[:3]
    for phrase in phrases:
        assert phrase in text, f"{phrase!r} missing from {path}"
    # multi-page concat uses the reference's \x0c page separator
    assert text.count("\x0c") == d.page_count - 1
    # fast mode parses the same page tree
    d2 = Document(raw)
    fast = d2.extract_all("fast")
    assert d2.page_count == d.page_count
    assert len(fast) > 10_000


def test_real_pdf_through_spark_surface(tmp_path):
    """The same real PDFs through the actual product surface (Spark
    mapInPandas extraction) must yield byte-identical text to the
    direct kernel call."""
    pyspark = pytest.importorskip("pyspark")  # noqa: F841

    from zpdfspark.kernel.document import Document
    from zpdfspark.spark.session import get_spark
    from zpdfspark.spark.udfs import extract_dataframe

    rows = []
    want = {}
    for p in present:
        raw = open(p, "rb").read()
        url = f"file://{p}"
        rows.append((url, raw))
        want[url] = Document(raw).extract_all("accuracy")
    spark = get_spark(2, "realpdf-test", shuffle_partitions=2)
    try:
        df = spark.createDataFrame(rows, "url string, html binary")
        got = {r["url"]: r["extracted_text"]
               for r in extract_dataframe(df, "accuracy").collect()}
        assert got == want
    finally:
        spark.stop()
