"""Tests for Gopher/C4 corpus-curation filters (operators/curation.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import curation as C


def _one(df, **cols):
    row = df.collect()
    assert len(row) == 1
    return row[0]


class TestLineMetrics:
    def test_doc_lines_trims_and_drops_empties(self, spark):
        df = spark.createDataFrame(
            [(1, "a\n  b  \n\n\nc"), (2, ""), (3, "   ")], ["id", "text"]
        )
        got = {
            r["id"]: r["ln"]
            for r in df.select("id", C.doc_lines("text").alias("ln")).collect()
        }
        assert got == {1: ["a", "b", "c"], 2: [], 3: []}

    def test_paragraphs_split_on_blank_line(self, spark):
        df = spark.createDataFrame([(1, "p one\nstill p one\n\np two")],
                                   ["id", "text"])
        got = df.select(C.doc_paragraphs("text").alias("pg")).first()["pg"]
        assert got == ["p one\nstill p one", "p two"]

    def test_duplicate_fractions(self, spark):
        # 8 non-empty lines over 3 distinct values -> 1 - 3/8
        # paragraphs identical -> dup_paragraph_fraction = 0.5
        text = "x\ny\nx\nz\n\nx\ny\nx\nz"
        df = C.curation_features(
            spark.createDataFrame([(1, text)], ["id", "text"])
        )
        r = _one(df)
        assert r["dup_line_fraction"] == pytest.approx(1 - 3 / 8)
        assert r["dup_paragraph_fraction"] == pytest.approx(0.5)

    def test_layout_fractions(self, spark):
        text = "- first bullet\n* second bullet\nplain line\nwaiting..."
        r = _one(C.curation_features(
            spark.createDataFrame([(1, text)], ["id", "text"])
        ))
        assert r["bullet_line_fraction"] == pytest.approx(0.5)
        assert r["ellipsis_line_fraction"] == pytest.approx(0.25)
        # '...' ends with '.', so the ellipsis line also counts terminal
        assert r["terminal_punct_line_fraction"] == pytest.approx(0.25)


class TestWordMetrics:
    def test_word_stats(self, spark):
        r = _one(C.curation_features(
            spark.createDataFrame([(1, "aa bbbb cc 12")], ["id", "text"])
        ))
        assert r["word_count"] == 4
        assert r["mean_word_len"] == pytest.approx((2 + 4 + 2 + 2) / 4)
        assert r["alpha_word_fraction"] == pytest.approx(3 / 4)

    def test_symbol_ratio_counts_hashes_and_ellipses(self, spark):
        r = _one(C.curation_features(
            spark.createDataFrame(
                [(1, "# one # two ... three … four")], ["id", "text"]
            )
        ))
        # 2 hashes + 2 ellipses over 8 tokens
        assert r["symbol_word_ratio"] == pytest.approx(4 / 8)

    def test_c4_flags(self, spark):
        df = C.curation_features(spark.createDataFrame(
            [(1, "Lorem Ipsum dolor"), (2, "def f() { return 1 }"),
             (3, "clean prose here")],
            ["id", "text"],
        ))
        got = {r["id"]: (r["has_lorem_ipsum"], r["has_curly_brace"])
               for r in df.collect()}
        assert got == {1: (1, 0), 2: (0, 1), 3: (0, 0)}

    def test_empty_text_is_all_zeros(self, spark):
        r = _one(C.curation_features(
            spark.createDataFrame([(1, "")], ["id", "text"])
        ))
        assert r["word_count"] == 0
        for c in ("mean_word_len", "alpha_word_fraction", "symbol_word_ratio",
                  "dup_line_fraction", "terminal_punct_line_fraction"):
            assert r[c] == 0.0


class TestGopherFlags:
    GOOD = " ".join(["sentence with several ordinary readable words"] * 10)

    def test_good_document_passes(self, spark):
        r = _one(C.gopher_quality_flags(
            spark.createDataFrame([(1, self.GOOD)], ["id", "text"])
        ))
        assert r["passes_gopher"] == 1 and r["n_rules_failed"] == 0

    def test_short_document_fails_word_count_only(self, spark):
        r = _one(C.gopher_quality_flags(
            spark.createDataFrame([(1, "too short to keep")], ["id", "text"])
        ))
        assert r["r_word_count"] == 0
        assert r["passes_gopher"] == 0 and r["n_rules_failed"] == 1

    def test_repeated_lines_fail_dup_rule(self, spark):
        text = "\n".join([self.GOOD] * 5)  # 5 identical lines
        r = _one(C.gopher_quality_flags(
            spark.createDataFrame([(1, text)], ["id", "text"])
        ))
        assert r["dup_line_fraction"] == pytest.approx(0.8)
        assert r["r_dup_lines"] == 0 and r["passes_gopher"] == 0

    def test_symbol_heavy_fails(self, spark):
        text = C.GOPHER_MIN_WORDS * "word " + "# # # # # # # # #"
        r = _one(C.gopher_quality_flags(
            spark.createDataFrame([(1, text)], ["id", "text"])
        ))
        assert r["r_symbol_ratio"] == 0


class TestRemoveDuplicateLines:
    BOILER = "subscribe to our newsletter for updates"

    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_first_occurrence_survives(self, spark):
        docs = self._docs(spark, [
            (1, f"unique opening line one\n{self.BOILER}"),
            (2, f"{self.BOILER}\nunique closing line two"),
            (3, f"another distinct document\n{self.BOILER}"),
        ])
        got = {r["doc_id"]: r for r in
               C.remove_duplicate_lines(docs).collect()}
        # doc 1 has the smallest (doc_id, pos) for the boilerplate
        assert got[1]["text"] == f"unique opening line one\n{self.BOILER}"
        assert got[2]["text"] == "unique closing line two"
        assert got[3]["text"] == "another distinct document"
        assert [got[i]["n_lines_kept"] for i in (1, 2, 3)] == [2, 1, 1]

    def test_short_lines_bypass_dedup(self, spark):
        docs = self._docs(spark, [
            (1, "Yes.\nlong distinctive content here"),
            (2, "Yes.\ndifferent long distinctive content"),
        ])
        got = {r["doc_id"]: r["text"] for r in
               C.remove_duplicate_lines(docs).collect()}
        assert got[1].startswith("Yes.\n") and got[2].startswith("Yes.\n")

    def test_fully_deduped_doc_kept_empty(self, spark):
        docs = self._docs(spark, [
            (1, self.BOILER),
            (2, self.BOILER),
        ])
        got = {r["doc_id"]: (r["text"], r["n_lines_kept"]) for r in
               C.remove_duplicate_lines(docs).collect()}
        assert got[1] == (self.BOILER, 1)
        assert got[2] == ("", 0)

    def test_within_doc_repetition_collapses(self, spark):
        docs = self._docs(spark, [
            (1, f"{self.BOILER}\nmiddle unique line text\n{self.BOILER}"),
        ])
        r = C.remove_duplicate_lines(docs).first()
        assert r["text"] == f"{self.BOILER}\nmiddle unique line text"
        assert r["n_lines_kept"] == 2


class TestTopNgramFraction:
    def test_exact_fraction(self, spark):
        # bigrams of "a b a b a": (a b)x2 (b a)x2 -> 2/4
        df = C.top_ngram_fraction(
            spark.createDataFrame([(1, "a b a b a"), (2, "x y z")],
                                  ["doc_id", "text"])
        )
        got = {r["doc_id"]: r["top_ngram_frac"] for r in df.collect()}
        assert got[1] == pytest.approx(0.5)
        assert got[2] == pytest.approx(0.5)  # both bigrams unique: 1/2

    def test_single_token_docs_excluded(self, spark):
        df = C.top_ngram_fraction(
            spark.createDataFrame([(1, "solo"), (2, "")], ["doc_id", "text"])
        )
        assert df.count() == 0

    def test_trigram_mode(self, spark):
        df = C.top_ngram_fraction(
            spark.createDataFrame([(1, "a b c a b c a b")], ["doc_id", "text"]),
            n=3,
        )
        # trigrams: abc bca cab abc bca cab -> top (abc) 2/6
        assert df.first()["top_ngram_frac"] == pytest.approx(round(2 / 6, 6))


class TestNgramUniqueness:
    def test_hand_computed_fractions(self, spark):
        from inception_eventstore_spark.operators.curation import (
            ngram_uniqueness,
        )

        docs = spark.createDataFrame(
            [
                (0, "a b c d"),        # grams: abc, bcd
                (1, "a b c e"),        # grams: abc, bce
                (2, "x y z w v"),      # grams: xyz, yzw, zwv (all unique)
            ],
            ["doc_id", "text"],
        )
        got = {r["doc_id"]: (r["n_grams"], r["unique_grams"],
                             r["uniqueness"])
               for r in ngram_uniqueness(docs).collect()}
        # 'a b c' is shared between docs 0 and 1 → df 2
        assert got == {
            0: (2, 1, 0.5), 1: (2, 1, 0.5), 2: (3, 3, 1.0),
        }

    def test_exact_duplicates_score_zero(self, spark):
        from inception_eventstore_spark.operators.curation import (
            ngram_uniqueness,
        )

        t = "the quick brown fox jumps over the lazy dog"
        docs = spark.createDataFrame(
            [(0, t), (1, t)], ["doc_id", "text"]
        )
        got = {r["doc_id"]: r["uniqueness"]
               for r in ngram_uniqueness(docs).collect()}
        assert got == {0: 0.0, 1: 0.0}


class TestPplBuckets:
    def test_thirds_per_lang_and_order(self, spark):
        # 6 docs in one lang with clearly ordered fluency: repeated
        # common bigrams score high, unique-word docs score low
        rows = [
            (0, "en", "a b a b a b a b"),
            (1, "en", "a b a b a b"),
            (2, "en", "a b a b"),
            (3, "en", "a b c d"),
            (4, "en", "c d e f"),
            (5, "en", "g h i j"),
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
        out = C.ppl_buckets(docs).collect()
        got = {r["doc_id"]: r["bucket"] for r in out}
        assert len(got) == 6
        # exactly two docs per bucket
        from collections import Counter

        assert Counter(got.values()) == {"head": 2, "middle": 2, "tail": 2}
        # buckets must follow the score order: every head score >= every
        # middle score >= every tail score (ties broken by id upstream)
        by_bucket = {"head": [], "middle": [], "tail": []}
        for r in out:
            by_bucket[r["bucket"]].append(r["lm_score"])
        assert min(by_bucket["head"]) >= max(by_bucket["middle"])
        assert min(by_bucket["middle"]) >= max(by_bucket["tail"])
        # the all-unique-words doc is least fluent under self-scoring
        assert got[5] == "tail"

    def test_unscoreable_docs_absent(self, spark):
        docs = spark.createDataFrame(
            [(0, "en", "a b c"), (1, "en", "solo"), (2, "en", "")],
            ["doc_id", "lang", "text"],
        )
        ids = {r["doc_id"] for r in C.ppl_buckets(docs).collect()}
        assert ids == {0}  # <2 tokens → no bigrams → absent (CCNet)

    def test_deterministic(self, spark):
        docs = spark.createDataFrame(
            [(i, "en" if i % 2 else "de", f"w{i} w{i+1} w{i+2}")
             for i in range(12)],
            ["doc_id", "lang", "text"],
        )
        a = sorted(map(tuple, C.ppl_buckets(docs).collect()))
        b = sorted(map(tuple, C.ppl_buckets(docs).collect()))
        assert a == b


class TestQualityCorrelations:
    def test_known_correlation_signs(self, spark):
        # construct docs where word_count and mean_word_len are
        # perfectly anti-correlated by design
        rows = [
            (0, "a a a a a a a a"),            # many short words
            (1, "bb bb bb bb"),
            (2, "cccc cccc"),
            (3, "dddddddd"),                   # one long word
        ]
        docs = spark.createDataFrame(rows, ["doc_id", "text"])
        out = {(r["signal_a"], r["signal_b"]): r
               for r in C.quality_signal_correlations(docs).collect()}
        key = ("word_count", "mean_word_len")
        assert key in out
        # doc 3 has <2 tokens -> no bigram -> excluded; n = 3
        assert out[key]["n"] == 3
        assert out[key]["corr"] < 0  # more words <=> shorter words here
        assert len(out) == 3
