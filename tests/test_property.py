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
