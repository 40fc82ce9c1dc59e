"""jusText block classification (kernel/htmlblocks.py): hand-written
generator-truth literals for the html_boilerplate fixture plus direct
unit coverage of every context-free region and context-sensitive
revision rule of the published algorithm (Pomikalek 2011)."""

from zpdfspark.fixtures import html_boilerplate
from zpdfspark.kernel.htmlblocks import (classify_blocks,
                                         extract_dense_text,
                                         segment_blocks)

# HAND-WRITTEN from the fixture's block plan — deliberately NOT derived
# from the classifier (the anchor direction): see html_boilerplate's
# docstring for the per-block reasoning.
EXPECTED = [
    # (n_words, label_cf, label)
    (3, "bad", "bad"),         # all-anchor nav, link_density 8/9
    (2, "short", "bad"),       # heading between bad and good
    (49, "good", "good"),      # >200 chars, stopword-dense
    (3, "short", "good"),      # tiny sentence between two goods
    (48, "good", "good"),
    (18, "neargood", "good"),  # 70-200 chars stopword-dense, next to good
    (16, "bad", "bad"),        # long zero-stopword gibberish
    (18, "neargood", "bad"),   # stranded between two bads
    (7, "bad", "bad"),         # copyright footer
]


def test_boilerplate_fixture_labels_match_plan():
    for i in (0, 3, 41):
        blocks = classify_blocks(html_boilerplate(i)[0])
        got = [(b["n_words"], b["label_cf"], b["label"]) for b in blocks]
        assert got == EXPECTED, (i, got)


def test_dense_text_is_good_blocks_only():
    blocks = classify_blocks(html_boilerplate(0)[0])
    want = "\n".join(b["text"] for b in blocks if b["label"] == "good")
    assert extract_dense_text(html_boilerplate(0)[0]) == want
    # the good set excludes nav/heading/gibberish/copyright
    assert "Home About Contact" not in want
    assert "Lorem ipsum" not in want
    assert "©" not in want
    assert "A quiet pause." in want


def test_context_free_regions():
    def one(seg: bytes) -> dict:
        (b,) = classify_blocks(b"<p>" + seg + b"</p>")
        return b

    # link density above 0.2 -> bad even when long and stopword-dense
    linky = one(b'<a href="/x">' + b"the and of to in it was " * 10
                + b"</a> tail")
    assert linky["label_cf"] == "bad"
    # short with any link -> bad, without -> short
    assert one(b'tiny <a href="/x">x</a> txt')["label_cf"] == "bad"
    assert one(b"tiny text")["label_cf"] == "short"
    # copyright sign (entity form too) -> bad
    assert one(b"&copy; 2026 Somebody, all of the rights that there "
               b"are in the world to be had here")["label_cf"] == "bad"
    # 70-200 chars stopword-dense -> neargood; >200 -> good
    med = b"it was the one that we had been given when they all came "\
          b"back to us in the morning"
    assert one(med)["label_cf"] == "neargood"
    assert one(med * 3)["label_cf"] == "good"
    # long but stopword-free -> bad
    assert one(b"lorem ipsum dolor amet " * 5)["label_cf"] == "bad"


def test_context_sensitive_edges_are_bad():
    # a lone neargood block: both document edges read as bad -> bad
    med = (b"it was the one that we had been given when they came "
           b"back to us in the morning light")
    (b,) = classify_blocks(b"<p>" + med + b"</p>")
    assert b["label_cf"] == "neargood" and b["label"] == "bad"


def test_segmentation_skips_empty_and_removed():
    blocks = segment_blocks(
        b"<head><title>T</title></head><body><script>var x=1;</script>"
        b"<p>  </p><p>one real block of text here</p></body>")
    assert [b["text"] for b in blocks] == ["one real block of text here"]


def test_hostile_bytes_never_raise():
    import random

    rng = random.Random(5)
    assert segment_blocks(b"") == []
    for _ in range(50):
        raw = bytes(rng.randbytes(rng.randrange(1, 2048)))
        classify_blocks(raw)  # must not raise
    classify_blocks(b"<p>" + b"<a>" * 5000 + b"x</p>")  # nesting bomb
