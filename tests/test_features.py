"""Feature extractor tests (SURVEY.md §2.9) mirroring the reference's
integration tests (/root/reference/src/integration_test.zig:305-1000)."""

import pytest

from zpdfspark import fixtures
from zpdfspark.kernel import Document


def test_metadata():
    pdf, _ = fixtures.metadata_pdf()
    doc = Document(pdf)
    md = doc.metadata()
    assert md["title"] == "Test Document"
    assert md["author"] == "Test Author"
    assert md["subject"] == "Test Subject"
    assert md["keywords"] == "test, pdf, zpdf"
    assert md["creator"] == "TestGenerator"
    assert md["producer"] == "zpdfspark"
    assert md["creation_date"] is None


def test_outline():
    pdf, _ = fixtures.outline_pdf()
    doc = Document(pdf)
    items = doc.outline()
    assert items == [{"title": "Chapter 1", "page": 0, "level": 0}]


def test_nested_outline():
    pdf, _ = fixtures.nested_outline_pdf()
    doc = Document(pdf)
    items = doc.outline()
    assert [i["title"] for i in items] == ["Part I", "Section 1.1", "Part II"]
    assert [i["level"] for i in items] == [0, 1, 0]
    assert items[0]["page"] == 0
    assert items[1]["page"] == 0
    assert items[2]["page"] == 1  # via /A GoTo action


def test_links():
    pdf, _ = fixtures.link_pdf()
    doc = Document(pdf)
    links = doc.get_links(0)
    assert len(links) == 1
    assert links[0]["uri"] == "https://example.com"
    assert links[0]["rect"] == (100.0, 690.0, 200.0, 710.0)
    assert links[0]["dest_page"] is None


def test_form_fields():
    pdf, _ = fixtures.form_fields_pdf()
    doc = Document(pdf)
    fields = doc.form_fields()
    assert len(fields) == 2
    assert fields[0] == {
        "name": "name", "value": "John Doe", "field_type": "text",
        "rect": (100.0, 600.0, 300.0, 620.0),
    }
    assert fields[1]["name"] == "submit"
    assert fields[1]["field_type"] == "button"
    assert fields[1]["value"] is None


def test_page_labels():
    """integration_test.zig:523-539: i, ii, 1."""
    pdf, _ = fixtures.page_labels_pdf()
    doc = Document(pdf)
    assert doc.get_page_label(0) == "i"
    assert doc.get_page_label(1) == "ii"
    assert doc.get_page_label(2) == "1"


def test_extended_page_labels():
    """integration_test.zig:784-832: I, II, a, App-1, App-2."""
    pdf, _ = fixtures.extended_page_labels_pdf()
    doc = Document(pdf)
    assert doc.get_page_label(0) == "I"
    assert doc.get_page_label(1) == "II"
    assert doc.get_page_label(2) == "a"
    assert doc.get_page_label(3) == "App-1"
    assert doc.get_page_label(4) == "App-2"


def test_page_label_no_pagelabels():
    pdf, _ = fixtures.minimal()
    assert Document(pdf).get_page_label(0) is None


def test_page_label_out_of_range_no_crash():
    """integration_test.zig:834-845: may compute from last range, must
    not crash."""
    pdf, _ = fixtures.page_labels_pdf()
    label = Document(pdf).get_page_label(999)
    assert label is None or isinstance(label, str)


def test_images():
    pdf, _ = fixtures.image_pdf()
    doc = Document(pdf)
    images = doc.get_images(0)
    assert len(images) == 1
    img = images[0]
    assert img["width"] == 64
    assert img["height"] == 32
    # rect from CTM: translation (50,400), scale (200,100)
    assert img["rect"] == (50.0, 400.0, 250.0, 500.0)


def test_utf16be_strings():
    pdf, _ = fixtures.utf16be_pdf()
    doc = Document(pdf)
    assert doc.metadata()["title"] == "Unicode Título 中"
    items = doc.outline()
    assert items[0]["title"] == "Capítulo 中"


def test_markdown_heading():
    """markdown.zig:648-661: 24pt over 12pt body -> '# Title'."""
    # build a page with one large heading and body text via Tm/Tf
    # the Td after (Title) Tj flushes the span while 24pt is still
    # current (spans carry flush-time font size, interpreter.zig:442-460)
    content = (b"BT\n"
               b"/F1 24 Tf\n1 0 0 1 72 700 Tm\n(Title) Tj\n0 -20 Td\n"
               b"/F1 12 Tf\n1 0 0 1 72 650 Tm\n(Body text here that is long enough to dominate) Tj\n"
               b"1 0 0 1 72 630 Tm\n(More body text to weight the histogram properly) Tj\n"
               b"ET\n")
    pdf = fixtures._simple_page_pdf(content, fixtures._HELVETICA)
    doc = Document(pdf)
    md = doc.extract_page_markdown(0)
    assert "# Title" in md
    assert "Body text here" in md


def test_markdown_list_detection():
    content = (b"BT\n/F1 12 Tf\n"
               b"1 0 0 1 72 700 Tm\n(- First item) Tj\n"
               b"1 0 0 1 72 680 Tm\n(- Second item) Tj\n"
               b"1 0 0 1 72 660 Tm\n(1. Numbered) Tj\n"
               b"ET\n")
    pdf = fixtures._simple_page_pdf(content, fixtures._HELVETICA)
    doc = Document(pdf)
    md = doc.extract_page_markdown(0)
    assert "- First item" in md
    assert "- Second item" in md
    assert "1. Numbered" in md


def test_markdown_page_break():
    pdf, _ = fixtures.multi_page(["One", "Two"])
    doc = Document(pdf)
    md = doc.extract_all_markdown()
    assert "\n---\n\n" in md
    assert "One" in md and "Two" in md


def test_two_column_stream_order():
    pdf, expected = fixtures.two_column()
    doc = Document(pdf)
    assert doc.extract_all() == expected


def test_two_column_layout_analysis():
    from zpdfspark.kernel.layout import analyze_layout

    pdf, _ = fixtures.two_column()
    doc = Document(pdf)
    spans = doc.extract_bounds(0)
    result = analyze_layout(spans, 612.0)
    assert result.is_two_column
    # left column fully before right column in emission order
    texts = [s.text.decode() for s in result.spans]
    left = [t for t in texts if t.startswith("L")]
    assert texts[: len(left)] == left


def test_feature_generators_in_corpus():
    gens = set(fixtures.GENERATORS)
    for expected in ("metadata", "outline", "link", "form_fields",
                     "page_labels", "image", "utf16be", "two_column"):
        assert expected in gens


def test_cff_glyph_name_fallback():
    """CFF charset -> glyph name -> AGL when no ToUnicode exists
    (encoding.zig:299-309, 570-597)."""
    from zpdfspark.kernel.cff import CffParser

    cff = fixtures._minimal_cff([41, 74])
    p = CffParser(cff)
    assert p.glyph_name(0) == ".notdef"
    assert p.glyph_name(1) == "H"
    assert p.glyph_name(2) == "i"
    pdf, expected = fixtures.cff_font()
    assert Document(pdf).extract_all() == expected == "Hi"


def test_cff_malformed_never_crashes():
    from zpdfspark.kernel.cff import CffError, CffParser
    import pytest as _pytest

    for blob in (b"", b"\x02\x00\x04\x04", b"\x01\x00\x04\x04" + b"\xff" * 10):
        try:
            CffParser(blob)
        except CffError:
            pass  # clean domain error is fine; anything else would raise


def test_html_main_content_extraction():
    """HTML boilerplate strip + main-content DOM heuristic (north_rule)."""
    from zpdfspark.kernel import htmltext

    raw, expected = fixtures.html_page(5)
    assert htmltext.extract_main_text(raw) == expected
    text, kind, doc = htmltext.extract_any(raw)
    assert kind == "html" and text == expected and doc is None
    # no <main>: falls back to stripped <body>
    nomain = b"<html><head><script>x</script></head><body><p>Just body</p></body></html>"
    assert htmltext.extract_main_text(nomain) == "Just body"
    # hostile html never crashes
    assert isinstance(htmltext.extract_main_text(b"<" * 10000), str)
    # PDF bytes still dispatch to the PDF kernel
    pdf, exp = fixtures.minimal("Dispatch")
    text, kind, doc = htmltext.extract_any(pdf)
    assert kind == "pdf" and text == exp and doc is not None


def test_structured_data_rotation():
    """The html_page structured-data rotation (v39) carries the
    authored facts the structured_data query's regex set must mine:
    JSON-LD count/@type, og:title/og:type, twitter:card, itemscope.
    Pinned here with INDEPENDENT stdlib mining (json.loads on the
    script bodies, not the query's regexes), and the extraction
    oracle must stay byte-identical — head/footer markup never leaks
    into main-content text."""
    import json
    import re

    from zpdfspark.kernel import htmltext

    for i in range(24):
        raw, expected = fixtures.html_page(i)
        assert htmltext.extract_main_text(raw) == expected, i
        s = raw.decode("utf-8")
        blocks = re.findall(
            r'<script type="application/ld\+json">(.*?)</script>', s)
        want_n = (1 if i % 3 != 2 else 0) + (1 if i % 6 == 0 else 0)
        assert len(blocks) == want_n, i
        if blocks:
            ld = json.loads(blocks[0])   # every block is valid JSON
            assert ld["@type"] == ("Article", "NewsArticle",
                                   "Product")[i % 3], i
        if i % 2 == 0:
            assert f'content="OG Doc {i}"' in s
            assert 'property="og:type" content="article"' in s
        else:
            assert "og:title" not in s
        assert ('name="twitter:card"' in s) == (i % 5 == 1), i
        assert ("itemscope" in s) == (i % 4 == 3), i


def test_image_phash_two_implementations_agree():
    """The perceptual-hash formula is implemented twice on purpose:
    _phash_expected (independent zlib-level re-read, the oracle
    direction) and the query kernel (kernel/png.py decode). Both must
    produce identical signed-64 hashes for every non-interlaced png;
    interlaced pngs are excluded by the IHDR byte both engines read."""
    import numpy as np

    from zpdfspark.fixtures import _phash_expected, png_image
    from zpdfspark.kernel.png import decode_png

    def query_side(raw):
        w, h, c, px = decode_png(raw)
        px = px[:, :, :3].astype(np.int64)
        luma = (299 * px[:, :, 0] + 587 * px[:, :, 1]
                + 114 * px[:, :, 2]) // 1000

        def pack(bits):
            v = 0
            for b in bits:
                v = (v << 1) | int(b)
            return v - (1 << 64) if v >= (1 << 63) else v

        rsel = [r * h // 8 for r in range(8)]
        g8 = luma[rsel, :][:, [cc * w // 8 for cc in range(8)]]
        g9 = luma[rsel, :][:, [cc * w // 9 for cc in range(9)]]
        return (pack((g8 > int(g8.sum()) // 64).reshape(-1)),
                pack((g9[:, :8] > g9[:, 1:]).reshape(-1)))

    for i in range(30):
        raw, _ = png_image(i)
        exp = _phash_expected(raw)
        if i % 3 == 2:
            assert exp == (None, None), i   # interlaced: out of scope
            assert raw[28] == 1
            continue
        assert raw[28] == 0
        assert query_side(raw) == exp, i
    # the MSB-first signed-64 packing (two's complement) path: a
    # bright top-left sample sets bit 0 -> both hashes negative, and
    # both implementations must still agree bit-for-bit
    from zpdfspark.kernel.png import encode_png

    px = np.zeros((8, 9, 3), dtype=np.uint8)
    px[0, 0, :] = 255
    raw = encode_png(px)
    exp = _phash_expected(raw)
    assert exp == query_side(raw)
    assert exp[0] < 0 and exp[1] < 0


def test_image_neardup_seeded_pairs():
    """Every 5th png clones its predecessor with one inverted pixel:
    near (ahash hamming <= 8) but not exact (hamming > 0 for the
    clone whose inverted pixel lands on a sampled grid point), and
    always sharing at least one 16-bit band — so the LSH band join
    finds exactly these pairs."""
    from zpdfspark.fixtures import _phash_expected, png_image

    checked = 0
    for i in range(4, 90, 5):
        if i % 3 == 2 or (i - 1) % 3 == 2:
            continue
        a1, _ = _phash_expected(png_image(i)[0])
        a0, _ = _phash_expected(png_image(i - 1)[0])
        ham = bin((a1 ^ a0) & ((1 << 64) - 1)).count("1")
        assert 0 <= ham <= 8, (i, ham)
        assert any(((a1 >> s) & 65535) == ((a0 >> s) & 65535)
                   for s in (0, 16, 32, 48)), i
        checked += 1
    assert checked >= 4


def test_html_charset_sniffing():
    """Spec rule 6 (round 4): BOM > meta charset (WHATWG aliases:
    iso-8859-1 label means cp1252) > utf-8 default; utf-16 pages
    transcode before tag processing; fixtures round-trip exactly."""
    from zpdfspark.kernel import htmltext

    assert htmltext.sniff_charset(b'<meta charset="ISO-8859-1">') == \
        "windows-1252"
    assert htmltext.sniff_charset(
        b'<meta http-equiv="Content-Type" '
        b'content="text/html; charset=gb2312">') == "gbk"
    assert htmltext.sniff_charset(b"\xef\xbb\xbf<html>") == "utf-8"
    assert htmltext.sniff_charset(b"\xff\xfe<\x00h\x00") == "utf-16-le"
    assert htmltext.sniff_charset(b"<html>plain") == "utf-8"
    # declaration outside the 1024-byte prescan window is ignored
    far = b"<html>" + b" " * 1100 + b'<meta charset="gbk">'
    assert htmltext.sniff_charset(far) == "utf-8"

    for i in range(6):
        raw, exp = fixtures.html_charset_page(i)
        assert htmltext.extract_main_text(raw) == exp, i

    # utf-16 end to end (not a corpus generator; kernel-only path)
    u16 = ("<html><body><main><p>Unicode ☃ text</p></main></body></html>"
           ).encode("utf-16-le")
    raw16 = b"\xff\xfe" + u16
    assert htmltext.looks_like_html(raw16)
    assert htmltext.extract_main_text(raw16) == "Unicode ☃ text"


def test_html_link_density_pruning():
    """Link-density boilerplate rule (htmltext spec rule 5): lines that
    are mostly anchor text are dropped; prose with inline links stays."""
    from zpdfspark.kernel import htmltext

    raw, expected = fixtures.html_linkfarm(3)
    assert htmltext.extract_main_text(raw) == expected
    # a pure-link line is dropped even without list markup
    page = (b"<html><body><p><a href='/x'>all link text here</a></p>"
            b"<p>Plain prose line that clearly stays in the output.</p>"
            b"</body></html>")
    assert htmltext.extract_main_text(page) == \
        "Plain prose line that clearly stays in the output."
    # exactly-2/3 is NOT pruned (threshold is strict >)
    page = b"<html><body><p><a href='/x'>aabb</a>cc</p></body></html>"
    assert htmltext.extract_main_text(page) == "aabbcc"
    # anchors spanning block boundaries don't count as link text
    page = (b"<html><body><a href='/x'><p>Broken anchor prose one.</p>"
            b"<p>Broken anchor prose two.</p></a></body></html>")
    assert htmltext.extract_main_text(page) == \
        "Broken anchor prose one.\nBroken anchor prose two."
    # &#10; inside a line still splits lines after unescape
    page = b"<html><body><p>alpha&#10;beta</p></body></html>"
    assert htmltext.extract_main_text(page) == "alpha\nbeta"
    # tags wrapped across source newlines leave no fragments (source
    # \n is whitespace, spec rule 2)
    page = (b"<html><body><p>hello</p>\n"
            b'<a\nhref="/y">nav link text all anchor</a></body></html>')
    assert htmltext.extract_main_text(page) == "hello"
    # wrapped anchor text still counts for link density
    page = (b"<html><body><li><a href='/a'>related article\n"
            b"number one goes here</a></li>"
            b"<p>Real prose content that must stay here.</p></body></html>")
    assert htmltext.extract_main_text(page) == \
        "Real prose content that must stay here."
    # density measured after entity unescape: &#187; decoration cannot
    # dilute the ratio below the threshold
    page = (b"<html><body><li>&#187;&#187;&#187; "
            b"<a href='/x'>Article name</a></li>"
            b"<p>Plain paragraph kept.</p></body></html>")
    assert htmltext.extract_main_text(page) == "Plain paragraph kept."


def test_contents_array_concatenation():
    """/Contents array streams joined with newline separators (S10)."""
    pdf, expected = fixtures.contents_array()
    assert Document(pdf).extract_all() == expected


def test_attribute_inheritance():
    """MediaBox/Rotate/Resources inherited from the Pages node (T2)."""
    pdf, expected = fixtures.inherited_attrs()
    doc = Document(pdf)
    assert doc.extract_all() == expected
    info = doc.get_page_info(0)
    assert info == {"width": 400.0, "height": 500.0, "rotation": 90}


# -- corpus expected-column pins (v10): the carried oracle values are
# ground truth — these literals pin the eager kernel (whose outputs the
# corpus carries) to the spec, so the driver's value oracles prove the
# DISTRIBUTED pipeline against a pinned reference, not against itself --


def test_generator_truth_enforced_at_corpus_build(tmp_path):
    """GENERATOR_TRUTH anchors the X-family oracle columns to the
    generators' authored literals: a corpus build must FAIL if the eager
    kernel drifts from any of them (round-2 verdict 'missing #1')."""
    from zpdfspark import fixtures
    from zpdfspark.fixtures import GENERATOR_TRUTH, write_corpus_parquet

    # every integration-test-mirroring family is covered
    assert {"metadata", "outline", "nested_outline", "link", "form_fields",
            "image", "page_labels", "ext_page_labels",
            "utf16be"} <= set(GENERATOR_TRUTH)
    original = GENERATOR_TRUTH["page_labels"]["labels"]
    try:
        GENERATOR_TRUTH["page_labels"]["labels"] = ["wrong"]
        with pytest.raises(AssertionError, match="generator truth mismatch"):
            # seed/i chosen so the sample hits the page_labels generator
            for i in range(len(fixtures.GENERATORS) * 4):
                url = f"https://fixtures.example/page_labels/x-{i}.pdf"
                pdf, text = fixtures.page_labels_pdf()
                exp = fixtures.expected_row(pdf, text)
                fixtures._check_generator_truth("page_labels", exp, url)
    finally:
        GENERATOR_TRUTH["page_labels"]["labels"] = original
    # and the real build passes with the true literals (small corpus
    # touching many generators)
    write_corpus_parquet(str(tmp_path / "t.parquet"), 60, seed=3)


def test_expected_row_ground_truth_literals():
    from zpdfspark.fixtures import expected_row

    # metadata: the generator-authored /Info fields (testpdf.zig:638-683)
    r = expected_row(*fixtures.metadata_pdf())
    assert r["meta_title"] == "Test Document"
    assert r["meta_author"] == "Test Author"
    assert r["meta_subject"] == "Test Subject"
    assert r["meta_keywords"] == "test, pdf, zpdf"
    assert r["meta_creator"] == "TestGenerator"
    assert r["meta_producer"] == "zpdfspark"
    assert r["meta_creation_date"] is None and r["meta_mod_date"] is None
    assert r["n_pages"] == 1 and r["err_n"] == 0 and not r["is_enc"]
    assert r["n_chars_acc"] == len("Metadata Test")

    # feature counts the generators construct explicitly
    assert expected_row(*fixtures.outline_pdf())["n_outline"] == 1
    assert expected_row(*fixtures.nested_outline_pdf())["n_outline"] == 3
    assert expected_row(*fixtures.link_pdf())["n_links"] == 1
    assert expected_row(*fixtures.form_fields_pdf())["n_form_fields"] == 2
    assert expected_row(*fixtures.image_pdf())["n_images"] == 1
    assert expected_row(*fixtures.page_labels_pdf())["labels"] == ["i", "ii", "1"]
    assert expected_row(*fixtures.extended_page_labels_pdf())["labels"] == [
        "I", "II", "a", "App-1", "App-2"]

    # reading-order tier metrics: tagged -> structured, untagged -> stream
    rt = expected_row(*fixtures.tagged())
    assert (rt["acc_structured"], rt["acc_stream"], rt["acc_geometric"]) == (1, 0, 0)
    assert rt["fast_stream"] == 1
    assert rt["text_fast"] == "World\nHello"  # stream order differs by design
    rm = expected_row(*fixtures.minimal("Hello World"))
    assert (rm["acc_structured"], rm["acc_stream"], rm["acc_geometric"]) == (0, 1, 0)
    assert rm["markdown"] == "Hello World\n"


def test_expected_row_tagged_md_struct_map():
    """The struct-type -> markdown element map (markdown.zig:564-606)
    on the H1/P/L-LI/Code fixture, pinned byte-for-byte."""
    from zpdfspark.fixtures import expected_row

    pdf, text = fixtures.tagged_md()
    assert text == "Title Body text item one code line"
    r = expected_row(pdf, text)
    assert r["markdown_structured"] == (
        "# Title\n\nBody text\n\n- item one\n\n```\ncode line\n```\n")
    assert r["text_fast"] == "Title\nBody text\nitem one\ncode line"
    assert Document(pdf).extract_all("accuracy") == text


def test_search_scanner_is_independent_ground_truth():
    """fixtures.search_matches_expected re-reads the search spec
    (root.zig:1221-1275) over the carried text; the kernel must agree
    with it on a real document."""
    from zpdfspark.fixtures import search_matches_expected

    m = search_matches_expected("say Hello\x0chello again")
    assert m == [
        {"page": 0, "soffset": 4, "context": "say Hello"},
        {"page": 1, "soffset": 0, "context": "hello again"},
    ]
    pdf, text = fixtures.minimal("Hello World")
    got = Document(pdf).search("Hello")
    exp = search_matches_expected(text)
    assert [(g["page"], g["offset"], g["context"]) for g in got] == \
        [(e["page"], e["soffset"], e["context"]) for e in exp]


def test_doc_json_field_semantics():
    """CLI -f json object (main.zig:252-339): metadata keys only when
    non-null, 1-based page numbers, label omitted when absent."""
    import json

    from zpdfspark.fixtures import expected_row

    dj = json.loads(expected_row(*fixtures.metadata_pdf())["doc_json"])
    assert dj["page_count"] == 1
    assert dj["metadata"]["title"] == "Test Document"
    assert "creation_date" not in dj["metadata"]  # null fields omitted
    assert dj["pages"][0] == {"page": 1, "text": "Metadata Test"}
    dj2 = json.loads(expected_row(*fixtures.page_labels_pdf())["doc_json"])
    assert [p["label"] for p in dj2["pages"]] == ["i", "ii", "1"]
