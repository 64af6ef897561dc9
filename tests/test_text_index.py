"""Persisted MinHash text index (operators/text_index.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.text_index import MinHashTextIndex

CORPUS = [
    (1, "the quick brown fox jumps over the lazy dog near the old barn"),
    (2, "a completely different document about distributed query engines"),
    (3, "spark catalyst optimizes logical plans into physical plans fast"),
    (4, "yet another unrelated text concerning maritime navigation charts"),
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


def _idx(spark, corpus, tmp_path):
    return MinHashTextIndex.build(corpus, str(tmp_path / "tidx"))


class TestMinHashTextIndex:
    def test_query_finds_near_dup_only(self, spark, corpus, tmp_path):
        idx = _idx(spark, corpus, tmp_path)
        batch = spark.createDataFrame(
            [
                # near-dup of doc 1 (one word changed)
                (100, "the quick brown fox jumps over the lazy cat near "
                      "the old barn"),
                (101, "entirely novel content about glacier formation"),
            ],
            "doc_id long, text string",
        )
        got = idx.query(batch, threshold=0.5).collect()
        assert {(r["query_id"], r["match_id"]) for r in got} == {(100, 1)}
        assert all(0.5 <= r["jaccard"] <= 1.0 for r in got)

    def test_load_round_trip(self, spark, corpus, tmp_path):
        _idx(spark, corpus, tmp_path)
        idx = MinHashTextIndex.load(spark, str(tmp_path / "tidx"))
        assert idx.meta.num_hashes == 64 and idx.meta.bands == 16
        exact_copy = spark.createDataFrame(
            [(200, CORPUS[2][1])], "doc_id long, text string"
        )
        got = idx.query(exact_copy, threshold=0.9).collect()
        assert [(r["query_id"], r["match_id"], r["jaccard"]) for r in got] == [
            (200, 3, 1.0)
        ]

    def test_append_visible_to_probes(self, spark, corpus, tmp_path):
        idx = _idx(spark, corpus, tmp_path)
        idx.append(
            spark.createDataFrame(
                [(5, "brand new fifth document joins the corpus today ok")],
                "doc_id long, text string",
            )
        )
        probe = spark.createDataFrame(
            [(300, "brand new fifth document joins the corpus today ok")],
            "doc_id long, text string",
        )
        got = idx.query(probe, threshold=0.9).collect()
        assert {(r["query_id"], r["match_id"]) for r in got} == {(300, 5)}

    def test_append_unique_skips_dups(self, spark, corpus, tmp_path):
        idx = _idx(spark, corpus, tmp_path)
        batch = spark.createDataFrame(
            [
                (400, CORPUS[0][1]),  # exact dup of doc 1 → skipped
                (401, "fresh unseen prose regarding volcanic island chains"),
            ],
            "doc_id long, text string",
        )
        kept = idx.append_unique(batch, threshold=0.8)
        assert [r["doc_id"] for r in kept.collect()] == [401]
        # the skipped dup was NOT indexed; the fresh doc was
        again = idx.query(
            spark.createDataFrame(
                [(500, "fresh unseen prose regarding volcanic island chains")],
                "doc_id long, text string",
            ),
            threshold=0.9,
        ).collect()
        assert {r["match_id"] for r in again} == {401}
        stored = spark.read.parquet(str(tmp_path / "tidx" / "sets"))
        assert stored.where(F.col("_id") == 400).count() == 0

    def test_bad_banding_rejected(self, spark, corpus, tmp_path):
        with pytest.raises(ValueError):
            MinHashTextIndex.build(
                corpus, str(tmp_path / "bad"), num_hashes=64, bands=15
            )
