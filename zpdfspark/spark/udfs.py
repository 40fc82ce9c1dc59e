"""Arrow-batch extraction kernels for Spark.

The engine's API surface (SURVEY.md §2.11): every capability of the
reference C ABI / Python binding (/root/reference/src/capi.zig,
/root/reference/python/zpdf/__init__.py) re-expressed as

(a) ``mapInPandas`` batch kernels — whole-row output incl. metrics;
(b) registered ``pandas_udf``s — callable from Spark SQL
    (``SELECT zpdf_extract(html) FROM pages``);

No per-row Python UDFs anywhere (input_hint): documents are iterated
inside the Arrow batch, exactly as the reference iterates pages inside
one process. All parallelism comes from Spark partitions
(capi.zig:85-88: the reference's "parallel" exports are sequential
aliases — partition-level parallelism is the graft).
"""

from __future__ import annotations

import json
import time
from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

# Output schema of the main extraction kernel. `errors` mirrors
# ParseErrorRecord (root.zig:83-97); metric columns mirror the
# north_rule lineage requirements.
EXTRACT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("extracted_text", StringType()),
    StructField("n_pages", IntegerType()),
    StructField("n_chars", LongType()),
    StructField("is_encrypted", BooleanType()),
    StructField("error_count", IntegerType()),
    StructField("errors", ArrayType(StructType([
        StructField("kind", StringType()),
        StructField("offset", LongType()),
        StructField("message", StringType()),
    ]))),
    StructField("objects_resolved", IntegerType()),
    StructField("streams_decoded", IntegerType()),
    StructField("structured_pages", IntegerType()),
    StructField("stream_pages", IntegerType()),
    StructField("geometric_pages", IntegerType()),
    StructField("coverage_fallbacks", IntegerType()),
    StructField("elapsed_ms", DoubleType()),
])

EXTRACT_SCHEMA_DDL = (
    "url string, extracted_text string, n_pages int, n_chars long, "
    "is_encrypted boolean, error_count int, "
    "errors array<struct<kind:string,offset:long,message:string>>, "
    "objects_resolved int, streams_decoded int, structured_pages int, "
    "stream_pages int, geometric_pages int, coverage_fallbacks int, "
    "elapsed_ms double"
)


def extract_batches(mode: str = "accuracy", html_col: str = "html", url_col: str = "url",
                    max_doc_bytes: int = 0):
    """Build a mapInPandas generator extracting text + metrics per doc.

    max_doc_bytes > 0 skips oversized blobs with an error record instead
    of parsing them — the per-document resource guard for hostile inputs
    at scale (SURVEY.md §7.3 #4; complements the kernel's own 256 MiB
    decode cap)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel import Document
        from zpdfspark.kernel.htmltext import extract_any

        empty_doc = Document(b"%PDF-")
        empty_doc.errors = []

        for batch in batches:
            rows = {k: [] for k in (
                "url", "extracted_text", "n_pages", "n_chars", "is_encrypted",
                "error_count", "errors", "objects_resolved", "streams_decoded",
                "structured_pages", "stream_pages", "geometric_pages",
                "coverage_fallbacks", "elapsed_ms",
            )}
            urls = batch[url_col]
            blobs = batch[html_col]
            for url, blob in zip(urls, blobs):
                t0 = time.perf_counter()
                raw = bytes(blob) if blob is not None else b""
                if max_doc_bytes and len(raw) > max_doc_bytes:
                    doc = Document(b"%PDF-")  # valid header, no body
                    doc.errors = [
                        ("oversized", 0, f"document {len(raw)} bytes exceeds cap")]
                    text = ""
                else:
                    text, _kind, doc = extract_any(raw, mode)
                    if doc is None:
                        doc = empty_doc
                elapsed = (time.perf_counter() - t0) * 1000.0
                m = doc.metrics
                rows["url"].append(url)
                rows["extracted_text"].append(text)
                rows["n_pages"].append(doc.page_count)
                rows["n_chars"].append(len(text))
                rows["is_encrypted"].append(doc.is_encrypted)
                rows["error_count"].append(len(doc.errors))
                rows["errors"].append([
                    {"kind": k, "offset": o, "message": msg}
                    for k, o, msg in doc.errors
                ])
                rows["objects_resolved"].append(doc.objects_resolved)
                rows["streams_decoded"].append(m["streams_decoded"])
                rows["structured_pages"].append(m["structured_pages"])
                rows["stream_pages"].append(m["stream_pages"])
                rows["geometric_pages"].append(m["geometric_pages"])
                rows["coverage_fallbacks"].append(m["coverage_fallbacks"])
                rows["elapsed_ms"].append(elapsed)
            yield pd.DataFrame(rows)

    return fn


_ERRORS_PA_TYPE = None


def _errors_pa_type():
    global _ERRORS_PA_TYPE
    if _ERRORS_PA_TYPE is None:
        import pyarrow as pa
        _ERRORS_PA_TYPE = pa.list_(pa.struct([
            ("kind", pa.string()), ("offset", pa.int64()), ("message", pa.string()),
        ]))
    return _ERRORS_PA_TYPE


def extract_arrow_batches(mode: str = "accuracy", max_doc_bytes: int = 0,
                          oracle_text_col: str = None):
    """mapInArrow variant of the extraction kernel: skips the pandas
    conversion on both sides of the Python boundary (~8% faster end to
    end for whole-blob rows, measured at local[16]).

    oracle_text_col: name of an input column carrying the expected text;
    when set, the kernel emits a ``matches_oracle`` boolean computed
    IN-KERNEL — the parity check stays map-only instead of a join that
    shuffles full text on both sides (round-1 verdict note)."""

    def fn(batches):
        import pyarrow as pa
        from zpdfspark.kernel import Document
        from zpdfspark.kernel.htmltext import extract_any

        empty_doc = Document(b"%PDF-")
        empty_doc.errors = []

        for rb in batches:
            urls = rb.column("url").to_pylist()
            htmls = rb.column("html")
            oracle_texts = (rb.column(oracle_text_col).to_pylist()
                            if oracle_text_col else None)
            cols = {k: [] for k in (
                "extracted_text", "n_pages", "n_chars", "is_encrypted",
                "error_count", "errors", "objects_resolved", "streams_decoded",
                "structured_pages", "stream_pages", "geometric_pages",
                "coverage_fallbacks", "elapsed_ms")}
            matches = [] if oracle_texts is not None else None
            for i in range(len(urls)):
                t0 = time.perf_counter()
                blob = htmls[i].as_py()
                raw = blob if blob is not None else b""
                if max_doc_bytes and len(raw) > max_doc_bytes:
                    doc = Document(b"%PDF-")
                    doc.errors = [
                        ("oversized", 0, f"document {len(raw)} bytes exceeds cap")]
                    text = ""
                else:
                    # dispatch: PDF bytes -> kernel; HTML -> boilerplate
                    # strip (north_rule main-content extraction)
                    text, _kind, doc = extract_any(raw, mode)
                    if doc is None:
                        doc = empty_doc
                m = doc.metrics
                cols["extracted_text"].append(text)
                cols["n_pages"].append(doc.page_count)
                cols["n_chars"].append(len(text))
                cols["is_encrypted"].append(doc.is_encrypted)
                cols["error_count"].append(len(doc.errors))
                cols["errors"].append(
                    [{"kind": k, "offset": o, "message": msg}
                     for k, o, msg in doc.errors])
                cols["objects_resolved"].append(doc.objects_resolved)
                cols["streams_decoded"].append(m["streams_decoded"])
                cols["structured_pages"].append(m["structured_pages"])
                cols["stream_pages"].append(m["stream_pages"])
                cols["geometric_pages"].append(m["geometric_pages"])
                cols["coverage_fallbacks"].append(m["coverage_fallbacks"])
                cols["elapsed_ms"].append((time.perf_counter() - t0) * 1000.0)
                if matches is not None:
                    exp = oracle_texts[i]
                    matches.append(exp is not None and text == exp)
            arrays = [
                pa.array(urls, pa.string()),
                pa.array(cols["extracted_text"], pa.string()),
                pa.array(cols["n_pages"], pa.int32()),
                pa.array(cols["n_chars"], pa.int64()),
                pa.array(cols["is_encrypted"], pa.bool_()),
                pa.array(cols["error_count"], pa.int32()),
                pa.array(cols["errors"], _errors_pa_type()),
                pa.array(cols["objects_resolved"], pa.int32()),
                pa.array(cols["streams_decoded"], pa.int32()),
                pa.array(cols["structured_pages"], pa.int32()),
                pa.array(cols["stream_pages"], pa.int32()),
                pa.array(cols["geometric_pages"], pa.int32()),
                pa.array(cols["coverage_fallbacks"], pa.int32()),
                pa.array(cols["elapsed_ms"], pa.float64()),
            ]
            names = [f.name for f in EXTRACT_SCHEMA.fields]
            if matches is not None:
                arrays.append(pa.array(matches, pa.bool_()))
                names = names + ["matches_oracle"]
            yield pa.RecordBatch.from_arrays(arrays, names=names)

    return fn


EXTRACT_ORACLE_SCHEMA = StructType(
    EXTRACT_SCHEMA.fields + [StructField("matches_oracle", BooleanType())])


def extract_dataframe(df: DataFrame, mode: str = "accuracy",
                      max_doc_bytes: int = 0,
                      oracle_text_col: str = None) -> DataFrame:
    """df(url, ..., html) -> extraction result DataFrame.

    Projects to the needed columns first so Catalyst prunes the parquet
    scan (SURVEY.md Z1: column pruning is the engine's "lazy parsing"
    analog). Uses mapInArrow (see extract_arrow_batches). With
    oracle_text_col set, the result gains an in-kernel ``matches_oracle``
    column and the whole parity query stays map-only.
    """
    if oracle_text_col:
        return df.select("url", "html", oracle_text_col).mapInArrow(
            extract_arrow_batches(mode, max_doc_bytes=max_doc_bytes,
                                  oracle_text_col=oracle_text_col),
            EXTRACT_ORACLE_SCHEMA,
        )
    return df.select("url", "html").mapInArrow(
        extract_arrow_batches(mode, max_doc_bytes=max_doc_bytes), EXTRACT_SCHEMA
    )


# -- span extraction (bounds mode, EP3) -----------------------------------

SPANS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("page", IntegerType()),
    StructField("x0", DoubleType()),
    StructField("y0", DoubleType()),
    StructField("x1", DoubleType()),
    StructField("y1", DoubleType()),
    StructField("text", StringType()),
    StructField("font_size", DoubleType()),
])


def spans_batches(html_col: str = "html", url_col: str = "url"):
    """mapInPandas kernel -> exploded span rows (root.zig:542-577)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel import Document

        for batch in batches:
            out = {k: [] for k in ("url", "page", "x0", "y0", "x1", "y1", "text", "font_size")}
            for url, blob in zip(batch[url_col], batch[html_col]):
                doc = Document(bytes(blob) if blob is not None else b"")
                for page_idx in range(doc.page_count):
                    for s in doc.extract_bounds(page_idx):
                        out["url"].append(url)
                        out["page"].append(page_idx)
                        out["x0"].append(s.x0)
                        out["y0"].append(s.y0)
                        out["x1"].append(s.x1)
                        out["y1"].append(s.y1)
                        out["text"].append(s.text.decode("utf-8", "replace"))
                        out["font_size"].append(s.font_size)
            yield pd.DataFrame(out)

    return fn


def spans_dataframe(df: DataFrame) -> DataFrame:
    return df.select("url", "html").mapInPandas(spans_batches(), SPANS_SCHEMA)


HTML_BLOCKS_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("block_idx", IntegerType()),
    StructField("n_chars", IntegerType()),
    StructField("n_words", IntegerType()),
    StructField("ld_x1000", IntegerType()),
    StructField("sd_x1000", IntegerType()),
    StructField("label_cf", StringType()),
    StructField("label", StringType()),
])


def html_blocks_batches(html_col: str = "html", url_col: str = "url"):
    """mapInPandas kernel -> jusText block-classification rows
    (kernel/htmlblocks.py): one row per DOM block of each HTML payload
    with its features and context-free/final labels. Non-HTML rows
    (PDF/media) emit nothing — the gate is the same magic sniff the
    extraction dispatch uses. Map-only at any scale: the per-document
    block list never leaves the scan task unexploded."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel.htmlblocks import classify_blocks
        from zpdfspark.kernel.htmltext import looks_like_html

        for batch in batches:
            out = {k: [] for k in ("url", "block_idx", "n_chars", "n_words",
                                   "ld_x1000", "sd_x1000", "label_cf",
                                   "label")}
            for url, blob in zip(batch[url_col], batch[html_col]):
                raw = bytes(blob) if blob is not None else b""
                if not looks_like_html(raw):
                    continue
                for b in classify_blocks(raw):
                    out["url"].append(url)
                    out["block_idx"].append(b["idx"])
                    out["n_chars"].append(b["n_chars"])
                    out["n_words"].append(b["n_words"])
                    out["ld_x1000"].append(
                        int(round(b["link_density"] * 1000)))
                    out["sd_x1000"].append(
                        int(round(b["stopword_density"] * 1000)))
                    out["label_cf"].append(b["label_cf"])
                    out["label"].append(b["label"])
            yield pd.DataFrame(out)

    return fn


def html_blocks_dataframe(df: DataFrame) -> DataFrame:
    return df.select("url", "html").mapInPandas(
        html_blocks_batches(), HTML_BLOCKS_SCHEMA)


# -- metadata / document features -----------------------------------------

METADATA_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("title", StringType()),
    StructField("author", StringType()),
    StructField("subject", StringType()),
    StructField("keywords", StringType()),
    StructField("creator", StringType()),
    StructField("producer", StringType()),
    StructField("creation_date", StringType()),
    StructField("mod_date", StringType()),
    StructField("n_pages", IntegerType()),
    StructField("is_encrypted", BooleanType()),
])


def metadata_batches(html_col: str = "html", url_col: str = "url"):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel import Document

        for batch in batches:
            out = {f.name: [] for f in METADATA_SCHEMA.fields}
            for url, blob in zip(batch[url_col], batch[html_col]):
                doc = Document(bytes(blob) if blob is not None else b"")
                md = doc.metadata()
                out["url"].append(url)
                for k in ("title", "author", "subject", "keywords", "creator",
                          "producer", "creation_date", "mod_date"):
                    out[k].append(md[k])
                out["n_pages"].append(doc.page_count)
                out["is_encrypted"].append(doc.is_encrypted)
            yield pd.DataFrame(out)

    return fn


def metadata_dataframe(df: DataFrame) -> DataFrame:
    return df.select("url", "html").mapInPandas(metadata_batches(), METADATA_SCHEMA)


# -- document features (X2-X10) -------------------------------------------

FEATURES_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("outline", ArrayType(StructType([
        StructField("title", StringType()),
        StructField("page", IntegerType()),
        StructField("level", IntegerType()),
    ]))),
    StructField("links", ArrayType(StructType([
        StructField("x0", DoubleType()),
        StructField("y0", DoubleType()),
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
        StructField("uri", StringType()),
        StructField("dest_page", IntegerType()),
    ]))),
    StructField("form_fields", ArrayType(StructType([
        StructField("name", StringType()),
        StructField("value", StringType()),
        StructField("field_type", StringType()),
    ]))),
    StructField("images", ArrayType(StructType([
        StructField("page", IntegerType()),
        StructField("x0", DoubleType()),
        StructField("y0", DoubleType()),
        StructField("x1", DoubleType()),
        StructField("y1", DoubleType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
    ]))),
    StructField("page_labels", ArrayType(StringType())),
])


def features_batches(html_col: str = "html", url_col: str = "url"):
    """mapInPandas kernel for the auxiliary extractors (outline, links,
    form fields, images, page labels)."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel import Document

        for batch in batches:
            out = {f.name: [] for f in FEATURES_SCHEMA.fields}
            for url, blob in zip(batch[url_col], batch[html_col]):
                doc = Document(bytes(blob) if blob is not None else b"")
                out["url"].append(url)
                out["outline"].append([
                    {"title": o["title"], "page": o["page"], "level": o["level"]}
                    for o in doc.outline()
                ])
                links = []
                images = []
                for p in range(doc.page_count):
                    for l in doc.get_links(p):
                        r = l["rect"]
                        links.append({"x0": r[0], "y0": r[1], "x1": r[2],
                                      "y1": r[3], "uri": l["uri"],
                                      "dest_page": l["dest_page"]})
                    for im in doc.get_images(p):
                        r = im["rect"]
                        images.append({"page": p, "x0": r[0], "y0": r[1],
                                       "x1": r[2], "y1": r[3],
                                       "width": im["width"], "height": im["height"]})
                out["links"].append(links)
                out["images"].append(images)
                out["form_fields"].append([
                    {"name": f["name"], "value": f["value"],
                     "field_type": f["field_type"]}
                    for f in doc.form_fields()
                ])
                out["page_labels"].append([
                    doc.get_page_label(p) for p in range(doc.page_count)
                ])
            yield pd.DataFrame(out)

    return fn


def features_dataframe(df: DataFrame) -> DataFrame:
    return df.select("url", "html").mapInPandas(features_batches(), FEATURES_SCHEMA)


def markdown_batches(html_col: str = "html", url_col: str = "url",
                     structured: bool = False, page_range=None):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel import Document

        for batch in batches:
            out = {"url": [], "markdown": []}
            for url, blob in zip(batch[url_col], batch[html_col]):
                doc = Document(bytes(blob) if blob is not None else b"")
                out["url"].append(url)
                out["markdown"].append(doc.extract_all_markdown(
                    structured=structured, page_range=page_range))
            yield pd.DataFrame(out)

    return fn


def markdown_dataframe(df: DataFrame, structured: bool = False,
                       page_range=None) -> DataFrame:
    """structured=True opts into the tagged-PDF struct-type map
    (markdown.zig:564-606; see kernel/markdown.py for why it is NOT the
    default — the reference's production path never uses it).
    page_range is the CLI's inclusive 1-based -p."""
    return df.select("url", "html").mapInPandas(
        markdown_batches(structured=structured, page_range=page_range),
        "url string, markdown string")


# -- per-page output: the CLI JSON sink's row form (S12) -------------------

PAGES_SCHEMA_DDL = "url string, page int, label string, page_text string"


def pages_batches(html_col: str = "html", url_col: str = "url",
                  page_range=None):
    """Exploded per-page rows {page, label, text} — the relational form
    of the CLI `-f json` page array (main.zig:252-339). `page` is
    0-based here (the JSON sink emits 1-based like the reference CLI).
    Per-page text uses the per-page structured ladder, exactly like the
    reference's doExtract -> extractTextStructured path. page_range is
    an inclusive 1-based (a, b) like the CLI's `-p a-b`
    (main.zig:173-177) — applied in-kernel so unwanted pages are never
    extracted."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel import Document

        for batch in batches:
            out = {"url": [], "page": [], "label": [], "page_text": []}
            for url, blob in zip(batch[url_col], batch[html_col]):
                doc = Document(bytes(blob) if blob is not None else b"")
                lo, hi = (page_range or (1, doc.page_count or 0))
                for page_idx in range(doc.page_count):
                    if not (lo <= page_idx + 1 <= hi):
                        continue
                    out["url"].append(url)
                    out["page"].append(page_idx)
                    out["label"].append(doc.get_page_label(page_idx))
                    out["page_text"].append(
                        doc.extract_text_structured_bytes(page_idx)
                        .decode("utf-8", "replace"))
            yield pd.DataFrame(out)

    return fn


def pages_dataframe(df: DataFrame, page_range=None) -> DataFrame:
    return df.select("url", "html").mapInPandas(
        pages_batches(page_range=page_range), PAGES_SCHEMA_DDL)


# re-exported from the kernel layer (moved there so pyspark-free
# consumers — fixtures' expected-column generation — can import it)
from zpdfspark.kernel.document import document_json  # noqa: E402,F401


def document_json_batches(html_col: str = "html", url_col: str = "url",
                          page_range=None):
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel import Document

        for batch in batches:
            out = {"url": [], "doc_json": []}
            for url, blob in zip(batch[url_col], batch[html_col]):
                doc = Document(bytes(blob) if blob is not None else b"")
                out["url"].append(url)
                out["doc_json"].append(document_json(doc, page_range=page_range))
            yield pd.DataFrame(out)

    return fn


def document_json_dataframe(df: DataFrame, page_range=None) -> DataFrame:
    return df.select("url", "html").mapInPandas(
        document_json_batches(page_range=page_range),
        "url string, doc_json string")


# -- search (X4) -----------------------------------------------------------

SEARCH_SCHEMA_DDL = "url string, page int, offset long, context string"


def search_matches_batches(query: str, html_col: str = "html",
                           url_col: str = "url"):
    """Full-fidelity search kernel: ALL matches as exploded rows
    (url, page, byte offset, ±50-byte context) — the relational form of
    SearchResult (root.zig:1213-1275), via Document.search."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from zpdfspark.kernel import Document

        for batch in batches:
            out = {"url": [], "page": [], "offset": [], "context": []}
            for url, blob in zip(batch[url_col], batch[html_col]):
                doc = Document(bytes(blob) if blob is not None else b"")
                for m in doc.search(query):
                    out["url"].append(url)
                    out["page"].append(m["page"])
                    out["offset"].append(m["offset"])
                    out["context"].append(m["context"])
            yield pd.DataFrame(out)

    return fn


def search_matches_dataframe(df: DataFrame, query: str) -> DataFrame:
    return df.select("url", "html").mapInPandas(
        search_matches_batches(query), SEARCH_SCHEMA_DDL)


def search_dataframe(extracted: DataFrame, query: str, text_col: str = "extracted_text") -> DataFrame:
    """Cheap full-text search over ALREADY-extracted text: a relational
    filter, not re-extraction per query (SURVEY.md X4). First match per
    url only — use search_matches_dataframe for the full-fidelity
    (all matches, page, context) form."""
    import pyspark.sql.functions as F

    q = query.lower()
    return (
        extracted
        .where(F.instr(F.lower(F.col(text_col)), q) > 0)
        .select(
            "url",
            (F.instr(F.lower(F.col(text_col)), q) - 1).alias("offset"),
        )
    )


# -- SQL registration (pandas_udf; Arrow-vectorized) ----------------------


def register_sql_udfs(spark) -> None:
    """Register scalar extraction functions for Spark SQL use:

        SELECT url, zpdf_extract(html) FROM pages
        SELECT zpdf_page_count(html), zpdf_is_encrypted(html) ...
        SELECT zpdf_metadata_json(html) ...
    """
    from pyspark.sql.functions import pandas_udf

    @pandas_udf(StringType())
    def zpdf_extract(html: pd.Series) -> pd.Series:
        # same dispatch as the mapInArrow kernel: PDF bytes -> kernel,
        # HTML -> boilerplate strip (north_rule main-content extraction)
        from zpdfspark.kernel.htmltext import extract_any
        return html.map(lambda b: extract_any(
            bytes(b) if b is not None else b"", "accuracy")[0])

    @pandas_udf(StringType())
    def zpdf_extract_fast(html: pd.Series) -> pd.Series:
        from zpdfspark.kernel.htmltext import extract_any
        return html.map(lambda b: extract_any(
            bytes(b) if b is not None else b"", "fast")[0])

    @pandas_udf(IntegerType())
    def zpdf_page_count(html: pd.Series) -> pd.Series:
        from zpdfspark.kernel import Document
        return html.map(lambda b: Document(bytes(b) if b is not None else b"").page_count)

    @pandas_udf(BooleanType())
    def zpdf_is_encrypted(html: pd.Series) -> pd.Series:
        from zpdfspark.kernel import Document
        return html.map(lambda b: Document(bytes(b) if b is not None else b"").is_encrypted)

    @pandas_udf(StringType())
    def zpdf_metadata_json(html: pd.Series) -> pd.Series:
        from zpdfspark.kernel import Document
        return html.map(lambda b: json.dumps(
            Document(bytes(b) if b is not None else b"").metadata(), ensure_ascii=False))

    @pandas_udf(StringType())
    def zpdf_markdown(html: pd.Series) -> pd.Series:
        from zpdfspark.kernel import Document
        return html.map(lambda b: Document(
            bytes(b) if b is not None else b"").extract_all_markdown())

    @pandas_udf(StringType())
    def zpdf_doc_json(html: pd.Series) -> pd.Series:
        from zpdfspark.kernel import Document
        return html.map(lambda b: document_json(
            Document(bytes(b) if b is not None else b"")))

    @pandas_udf(StringType())
    def zpdf_extract_secondary(html: pd.Series) -> pd.Series:
        # debug/diagnostic surface for the secondary interpreter port
        # (kernel/interpreter2.py, interpreter.zig:27-394): the
        # reference's richer text-state semantics (Tc/Tw/Tz/TL/Ts, q/Q,
        # leading-based '/"), NOT the byte-parity production path —
        # use it to diff the two tokenizer interpretations on a doc
        from zpdfspark.kernel import Document
        from zpdfspark.kernel.interpreter2 import extract_page_interpreter

        def run(b):
            doc = Document(bytes(b) if b is not None else b"")
            return "\x0c".join(extract_page_interpreter(doc, p)
                               for p in range(doc.page_count))
        return html.map(run)

    @pandas_udf(StringType())
    def zpdf_search_json(html: pd.Series, query: pd.Series) -> pd.Series:
        from zpdfspark.kernel import Document
        return pd.Series([
            json.dumps(Document(bytes(b) if b is not None else b"")
                       .search(q or ""), ensure_ascii=False)
            for b, q in zip(html, query)
        ])

    spark.udf.register("zpdf_extract", zpdf_extract)
    spark.udf.register("zpdf_extract_fast", zpdf_extract_fast)
    spark.udf.register("zpdf_page_count", zpdf_page_count)
    spark.udf.register("zpdf_is_encrypted", zpdf_is_encrypted)
    spark.udf.register("zpdf_metadata_json", zpdf_metadata_json)
    spark.udf.register("zpdf_markdown", zpdf_markdown)
    spark.udf.register("zpdf_doc_json", zpdf_doc_json)
    # SELECT zpdf_extract_secondary(html) FROM pages  (diagnostic)
    spark.udf.register("zpdf_extract_secondary", zpdf_extract_secondary)
    # SELECT zpdf_search_json(html, 'Hello') FROM pages
    spark.udf.register("zpdf_search_json", zpdf_search_json)
