"""Distributed BPE (spark/bpe.py) vs the eager dict-loop reference
(bpe_ref.py): hand-pinned merge sequence, full two-implementation
differential, and plan guards (all-JVM, no forced corpus broadcast)."""

import pytest

pyspark = pytest.importorskip("pyspark")

import pyspark.sql.functions as F  # noqa: E402


@pytest.fixture(scope="module")
def spark():
    from zpdfspark.spark.session import get_spark

    s = get_spark(2, "zpdfspark-bpe-tests", shuffle_partitions=2)
    yield s
    s.stop()


# Sennrich et al. 2016's worked example: low x5, lower x2, newest x6,
# widest x3. Hand-derived first merges (weighted pair counts, ties ->
# lexicographically smallest pair): (e,s) 9 beats (s,t) 9 on the tie;
# then (es,t) 9; then (l,o) 7 beats (o,w) 7; then (lo,w) 7.
SENNRICH = ("low " * 5 + "lower " * 2 + "newest " * 6
            + "widest " * 3).strip()
EXPECTED_MERGES = [("e", "s"), ("es", "t"), ("l", "o"), ("lo", "w")]


class TestEagerReference:
    def test_apply_merge_fold_semantics(self):
        from zpdfspark.bpe_ref import apply_merge

        # left-to-right, non-overlapping; merged symbol can re-merge
        # only if it equals `a` again
        assert apply_merge(list("llll"), "l", "l") == ["ll", "ll"]
        assert apply_merge(list("lll"), "l", "l") == ["ll", "l"]
        assert apply_merge(list("hello"), "l", "l") == ["h", "e", "ll", "o"]
        assert apply_merge(["ab", "ab"], "ab", "ab") == ["abab"]
        assert apply_merge([], "a", "b") == []

    def test_hand_pinned_merge_sequence(self):
        from zpdfspark.bpe_ref import learn_merges, word_counts

        wc = word_counts([SENNRICH])
        merges, segs = learn_merges(wc, n_merges=4)
        assert merges == EXPECTED_MERGES
        assert segs["lowest"] if "lowest" in segs else True
        assert segs["low"] == ["low"]
        assert segs["newest"] == ["n", "e", "w", "est"]
        assert segs["widest"] == ["w", "i", "d", "est"]

    def test_tokenize_docs_order_sensitivity(self):
        from zpdfspark.bpe_ref import tokenize_docs

        a = tokenize_docs([(0, "ab ba"), (1, "ba ab")], n_merges=1)
        # same multiset of words, different order -> different ids_str
        assert a[0][1] == a[1][1]  # same token count
        assert a[0][2] != a[1][2]


class TestDistributedMatchesEager:
    def test_learned_merges_identical(self, spark):
        from zpdfspark.bpe_ref import learn_merges, word_counts
        from zpdfspark.spark.bpe import learn_bpe

        wc = word_counts([SENNRICH])
        eager_merges, _ = learn_merges(wc, n_merges=8)

        wc_df = spark.createDataFrame(
            [(w, c) for w, c in wc.items()], ["word", "cnt"])
        spark_merges, segs = learn_bpe(wc_df, n_merges=8)
        assert spark_merges == eager_merges
        got = {r["word"]: list(r["sym"]) for r in segs.collect()}
        _, eager_segs = learn_merges(wc, n_merges=8)
        assert got == eager_segs

    def test_tokenize_differential_small_corpus(self, spark):
        """Full differential on a corpus with repeated subwords, tie
        candidates, single-char words, and an empty-text doc."""
        from zpdfspark.bpe_ref import tokenize_docs
        from zpdfspark.spark.bpe import bpe_tokenize

        docs = [
            (0, SENNRICH),
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "low lower lowest newest widest widest"),
            (3, "a b c a b c abc"),
            (4, ""),
            (5, "zz zz zz yzzy"),
        ]
        expected = {r[0]: (r[1], r[2]) for r in
                    tokenize_docs(docs, n_merges=16)}
        df = spark.createDataFrame(docs, ["doc_id", "text"])
        got = {r["doc_id"]: r for r in
               bpe_tokenize(df, n_merges=16).collect()}
        assert set(got) == set(expected)  # doc 4 absent on both sides
        import hashlib
        for did, (n_tok, ids_str) in expected.items():
            assert got[did]["n_tokens"] == n_tok, did
            assert got[did]["ids_md5"] == hashlib.md5(
                ids_str.encode()).hexdigest(), did


class TestPlanShape:
    def test_all_jvm_no_forced_corpus_broadcast(self, spark):
        """The tokenization plan must be pure JVM (fold-merge included)
        and the corpus-side word join must carry no broadcast hint —
        only the bounded ranked-symbol map (chars + merges) may be
        hinted."""
        from zpdfspark.spark.bpe import bpe_tokenize

        df = spark.createDataFrame(
            [(0, SENNRICH), (1, "low newest")], ["doc_id", "text"])
        out = bpe_tokenize(df, n_merges=2)
        logical = str(out._jdf.queryExecution().analyzed())
        assert "EvalPython" not in logical
        # exactly one hint: the ranked symbol map
        assert logical.count("ResolvedHint") == 1, logical
        physical = out._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode
            .fromString("formatted"))
        assert "EvalPython" not in physical, physical
        assert "CartesianProduct" not in physical, physical
