"""Tests for bloom-filter corpus-membership dedup (operators/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import bloom as B
from inception_eventstore_spark.operators.dedup import normalize_text


class TestParams:
    def test_optimal_params_match_textbook(self):
        m, k = B.optimal_params(1000, 0.01)
        # -1000 ln(.01)/ln²2 ≈ 9585 bits → rounded to a word multiple
        assert 9536 <= m <= 9664 and k == 7

    def test_rejects_bad_inputs(self):
        with pytest.raises(ValueError):
            B.optimal_params(0, 0.01)
        with pytest.raises(ValueError):
            B.optimal_params(10, 1.5)


class TestBloomFilter:
    def test_no_false_negatives(self, spark):
        keys = spark.range(500).select(F.xxhash64("id").alias("k"))
        bf = B.BloomFilter.build(keys, "k", 500, fpp=0.01)
        hits = keys.withColumn("h", bf.might_contain_col(F.col("k")))
        assert hits.where(~F.col("h")).count() == 0

    def test_false_positive_rate_in_range(self, spark):
        keys = spark.range(500).select(F.xxhash64("id").alias("k"))
        bf = B.BloomFilter.build(keys, "k", 500, fpp=0.01)
        fresh = (
            spark.range(10_000, 30_000)
            .select(F.xxhash64("id").alias("k"))
            .withColumn("h", bf.might_contain_col(F.col("k")))
        )
        fp = fresh.where(F.col("h")).count() / 20_000
        assert fp < 0.05  # target 1%, generous margin


class TestMembershipDedup:
    def _docs(self, spark, rows):
        return spark.createDataFrame(rows, "doc_id long, text string")

    def test_exact_vs_anti_join(self, spark):
        corpus = self._docs(
            spark, [(i, f"corpus document number {i}") for i in range(200)]
        )
        incoming = self._docs(
            spark,
            # 50 dups (case variants -> same normalized key) + 150 new
            [(1000 + i, f"CORPUS document   number {i}") for i in range(50)]
            + [(2000 + i, f"genuinely new text {i}") for i in range(150)],
        )
        got = B.bloom_membership_dedup(incoming, corpus)
        expect = incoming.join(
            corpus.select(
                F.xxhash64(normalize_text("text")).alias("_bk")
            ),
            F.xxhash64(normalize_text(incoming["text"])) == F.col("_bk"),
            "left_anti",
        )
        assert sorted(r["doc_id"] for r in got.collect()) == sorted(
            r["doc_id"] for r in expect.collect()
        )
        assert got.count() == 150

    def test_all_new_when_corpus_disjoint(self, spark):
        corpus = self._docs(spark, [(1, "only entry")])
        incoming = self._docs(spark, [(2, "something else"), (3, "more")])
        assert B.bloom_membership_dedup(incoming, corpus).count() == 2

    def test_schema_preserved(self, spark):
        corpus = self._docs(spark, [(1, "a")])
        incoming = self._docs(spark, [(2, "b")])
        out = B.bloom_membership_dedup(incoming, corpus)
        assert out.columns == ["doc_id", "text"]
