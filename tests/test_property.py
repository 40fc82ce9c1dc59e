"""Property-based round-trip tests (hypothesis): arbitrary text through
the generators must extract byte-identically; arbitrary byte blobs must
never crash the kernel.

Extends the reference's test strategy (SURVEY.md §5: the reference has
no property-based testing; its closest analog is the malformed-corpus
sweep) — randomized inputs harden the never-crash guarantee the 10^12
scale demands.
"""

import string

from hypothesis import HealthCheck, given, settings, strategies as st

from zpdfspark import fixtures
from zpdfspark.kernel import Document
from zpdfspark.kernel.objects import Parser, ParseError

# printable latin-1 without the PDF string delimiters handled by escaping
_TEXT = st.text(
    alphabet=string.ascii_letters + string.digits + " .,;:!?()[]{}<>/\\'\"-_",
    min_size=1, max_size=200,
)

_SETTINGS = settings(max_examples=60, deadline=None,
                     suppress_health_check=[HealthCheck.too_slow])


@_SETTINGS
@given(_TEXT)
def test_minimal_roundtrip(text):
    pdf, expected = fixtures.minimal(text)
    assert Document(pdf).extract_all("accuracy") == expected


@_SETTINGS
@given(_TEXT)
def test_flate_roundtrip(text):
    pdf, expected = fixtures.flate(text)
    assert Document(pdf).extract_all("accuracy") == expected


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=5))
def test_multipage_roundtrip(pages):
    pdf, expected = fixtures.multi_page(pages)
    assert Document(pdf).extract_all("accuracy") == expected


@_SETTINGS
@given(_TEXT, st.sampled_from(["a85", "ahx", "rl", "a85_fl"]))
def test_filter_chain_roundtrip(text, chain):
    pdf, expected = fixtures.filters_chain(text, chain)
    assert Document(pdf).extract_all("accuracy") == expected


@_SETTINGS
@given(st.binary(min_size=0, max_size=2048))
def test_arbitrary_bytes_never_crash(blob):
    doc = Document(blob)
    assert isinstance(doc.extract_all(), str)


@_SETTINGS
@given(st.binary(min_size=0, max_size=512))
def test_parser_never_hangs_on_garbage(blob):
    p = Parser(blob)
    try:
        p.parse_object()
    except ParseError:
        pass


@_SETTINGS
@given(st.binary(min_size=0, max_size=1024))
def test_content_lexer_never_crashes(blob):
    from zpdfspark.kernel.content import ContentLexer

    for _ in ContentLexer(blob).tokens():
        pass


def test_structured_fuzz_content_cmap_cff():
    """Bounded replica of the 21k-doc adversarial sweep (op-soup content
    streams, mutated ToUnicode CMaps, mutated CFF blobs) through every
    extraction surface: never crash. (Hang protection is exercised by
    the CMap zero-progress guard tests; CI keeps this bounded.)"""
    import random

    random.seed(99)
    base_cmap = (b"begincmap\n2 beginbfchar\n<0041> <0042>\n<0043> <00660069>\n"
                 b"endbfchar\n1 beginbfrange\n<0050> <0060> [<0041> <0042>]\n"
                 b"endbfrange\nendcmap")
    base_cff = fixtures._minimal_cff([41, 74])
    ops = (b"BT ET Tf Td TD Tm T* Tj TJ ' \" BDC BMC EMC Do cm q Q BI ID EI").split()

    def build_cmap_pdf(cmap):
        b = fixtures._PdfBuilder()
        b.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
        b.obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
        b.obj(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                 b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
        b.stream_obj(4, b"", b"BT\n/F1 12 Tf\n<0041> Tj\nET\n")
        b.obj(5, b"<< /Type /Font /Subtype /Type0 /BaseFont /F /Encoding /Identity-H "
                 b"/DescendantFonts [6 0 R] /ToUnicode 7 0 R >>")
        b.obj(6, b"<< /Type /Font /Subtype /CIDFontType2 /BaseFont /F >>")
        b.stream_obj(7, b"", cmap)
        return b.finish(8)

    for trial in range(400):
        mode = trial % 3
        if mode == 0:
            parts = []
            for _ in range(random.randint(5, 40)):
                r = random.random()
                if r < 0.4:
                    parts.append(b"%g" % random.uniform(-1e6, 1e6))
                elif r < 0.55:
                    parts.append(b"<" + bytes(random.getrandbits(8) for _ in range(8)).hex().encode() + b">")
                else:
                    parts.append(random.choice(ops))
            pdf = fixtures._simple_page_pdf(b" ".join(parts), fixtures._HELVETICA)
        elif mode == 1:
            cm = bytearray(base_cmap)
            for _ in range(random.randint(1, 10)):
                cm[random.randrange(len(cm))] = random.getrandbits(8)
            pdf = build_cmap_pdf(bytes(cm))
        else:
            cf = bytearray(base_cff)
            for _ in range(random.randint(1, 8)):
                cf[random.randrange(len(cf))] = random.getrandbits(8)
            b = fixtures._PdfBuilder()
            b.obj(1, b"<< /Type /Catalog /Pages 2 0 R >>")
            b.obj(2, b"<< /Type /Pages /Kids [3 0 R] /Count 1 >>")
            b.obj(3, b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                     b"/Contents 4 0 R /Resources << /Font << /F1 5 0 R >> >> >>")
            b.stream_obj(4, b"", b"BT\n/F1 12 Tf\n<00010002> Tj\nET\n")
            b.obj(5, b"<< /Type /Font /Subtype /Type0 /BaseFont /F /Encoding /Identity-H "
                     b"/DescendantFonts [6 0 R] >>")
            b.obj(6, b"<< /Type /Font /Subtype /CIDFontType0 /BaseFont /F /FontDescriptor 7 0 R >>")
            b.obj(7, b"<< /Type /FontDescriptor /FontName /F /Flags 4 /FontFile3 8 0 R >>")
            b.stream_obj(8, b"/Subtype /Type1C ", bytes(cf))
            pdf = b.finish(9)
        doc = Document(pdf)
        doc.extract_all("accuracy")
        doc.extract_bounds(0)


# --- htmltext differential oracle -----------------------------------------

_WORD = st.text(alphabet=string.ascii_lowercase, min_size=1, max_size=8)
# each item is (kind, words): plain text, an inline wrapper (removed),
# or an anchor (counts toward link density)
_ITEM = st.tuples(st.sampled_from(["text", "span", "a", "amp"]),
                  st.lists(_WORD, min_size=1, max_size=4))
_BLOCK = st.lists(_ITEM, min_size=1, max_size=5)
_PAGE = st.lists(_BLOCK, min_size=1, max_size=6)


@_SETTINGS
@given(_PAGE, st.randoms(use_true_random=False))
def test_htmltext_differential_oracle(blocks, rnd):
    """Random pages through extract_main_text vs an oracle computed
    directly from the spec (kernel/htmltext.py rules 1-5): boilerplate
    dropped, source newlines are whitespace, inline tags removed,
    anchors counted unescaped for link density, >2/3 pruned."""
    from zpdfspark.kernel.htmltext import extract_main_text

    html_parts = ["<!DOCTYPE html><html><head><title>t</title>"
                  "<script>var x=1;</script></head><body>"]
    expected_lines = []
    for block in blocks:
        frags, visible_words, link_words = [], [], []
        for kind, words in block:
            if kind == "amp":
                # entity word: visible as '&', not a link
                frags.append("&amp;")
                visible_words.append("&")
                continue
            text = " ".join(words)
            if kind == "text":
                frags.append(text)
                visible_words.append(text)
            elif kind == "span":
                frags.append(f"<span class='x'>{text}</span>")
                visible_words.append(text)
            else:  # anchor — sometimes wrapped across a source newline
                sep = "\n" if rnd.random() < 0.3 else " "
                frags.append(f"<a{sep}href='/l'>{text}</a>")
                visible_words.append(text)
                link_words.append(text)
        line = " ".join(visible_words)
        html_parts.append("<p>" + " ".join(frags) + "</p>")
        link_chars = sum(len(w) for w in link_words)
        if link_chars / len(line) <= 2 / 3:
            expected_lines.append(line)
    html_parts.append("<footer>boiler</footer></body></html>")
    got = extract_main_text("".join(html_parts).encode())
    assert got == "\n".join(expected_lines)


@_SETTINGS
@given(st.lists(_TEXT, min_size=1, max_size=4),
       st.sampled_from(["Hello", "hello", "HELLO", "o W", "zq"]))
def test_search_matches_independent_scanner(pages, query):
    """Property: Document.search (kernel, per-page byte scan with the
    reference's offset/context rules) must agree with
    fixtures.search_matches_expected (the independent 10-line spec
    scanner over the oracle text) on every generated document."""
    from zpdfspark.fixtures import search_matches_expected

    pdf, text = fixtures.multi_page(pages)
    doc = Document(pdf)
    assert doc.extract_all() == text  # precondition: parity holds
    got = [(m["page"], m["offset"], m["context"]) for m in doc.search(query)]
    exp = [(m["page"], m["soffset"], m["context"])
           for m in search_matches_expected(text, query)]
    assert got == exp


# -- round-3 media/source kernels: arbitrary-input round-trips ------------

_DIMS = st.tuples(st.integers(1, 24), st.integers(1, 24))


@_SETTINGS
@given(_DIMS, st.integers(1, 256), st.booleans(), st.integers(0, 2**31))
def test_gif_roundtrip_property(dims, ncolors, interlace, seed):
    import numpy as np

    from zpdfspark.kernel import gif as G

    h, w = dims
    rng = np.random.default_rng(seed)
    px = (rng.integers(0, ncolors, size=(h, w), dtype=np.uint16)[:, :, None]
          * np.array([7, 3, 11], dtype=np.uint16) % 256).astype(np.uint8)
    ww, hh, c, out = G.decode_gif(G.encode_gif(px, interlace=interlace))
    assert (ww, hh, c) == (w, h, 3)
    assert (out == px).all()


@_SETTINGS
@given(st.lists(st.integers(1, 14), min_size=1, max_size=80),
       st.integers(0, 2), st.booleans(), st.integers(0, 300),
       st.sampled_from([3, 2, 0]))
def test_mp3_roundtrip_property(frame_brs, sr_idx, stereo, id3, version):
    from zpdfspark.kernel import mp3 as M

    meta = M.parse_mp3(
        M.encode_mp3(frame_brs, sr_idx, stereo, id3, version=version))
    sr = M._SAMPLE_RATES[version][sr_idx]
    spf = 1152 if version == 3 else 576
    table = M._BITRATES_V1 if version == 3 else M._BITRATES_V2
    assert meta["n_frames"] == len(frame_brs)
    assert meta["sample_rate"] == sr
    assert meta["duration_ms"] == len(frame_brs) * spf * 1000 // sr
    assert meta["mean_bitrate_kbps"] == sum(
        table[b] for b in frame_brs) // len(frame_brs)


@_SETTINGS
@given(st.integers(0, 2**31), st.sampled_from([600, 1000, 90000]),
       st.lists(st.tuples(st.integers(0, 4096), st.integers(0, 4096),
                          st.sampled_from([b"avc1", b"hev1", b"mp4a", b"vp09"])),
                min_size=0, max_size=4))
def test_mp4_roundtrip_property(units, ts, tracks):
    from zpdfspark.kernel import mp4 as M

    meta = M.parse_mp4(M.encode_mp4(units, ts, tracks))
    assert meta["duration_ms"] == units * 1000 // ts
    assert meta["n_tracks"] == len(tracks)
    vis = [(w, h) for (w, h, _f) in tracks if w and h]
    assert (meta["width"], meta["height"]) == (vis[0] if vis else (0, 0))


@_SETTINGS
@given(st.lists(st.tuples(
    st.text(alphabet=string.ascii_letters + string.digits + ":/._-",
            min_size=1, max_size=60),
    st.binary(min_size=0, max_size=400)), min_size=1, max_size=12),
    st.booleans())
def test_warc_roundtrip_property(pairs, gz):
    from zpdfspark.kernel import warc as W

    recs = [(f"https://h/{i}/{u}", "2025-01-02T03:04:05Z", body, "x/y")
            for i, (u, body) in enumerate(pairs)]
    got = list(W.iter_warc_records(W.build_warc(recs, per_record_gzip=gz)))
    assert len(got) == len(recs)
    for (uri, _d, body, _c), r in zip(recs, got):
        assert r.error is None and r.target_uri == uri and r.body == body
