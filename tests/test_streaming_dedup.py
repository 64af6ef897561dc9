"""Streaming dedup-at-ingest: stream_dedup_ingest + MinHashTextIndex."""

from __future__ import annotations

from pyspark.sql import functions as F

from inception_eventstore_spark.operators.text_index import MinHashTextIndex
from inception_eventstore_spark.streaming.ingest import stream_dedup_ingest

SCHEMA = "doc_id long, text string"

SEED_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog near the old barn"),
    (2, "a completely different document about distributed query engines"),
]


class TestStreamingDedupIngest:
    def _run(self, spark, source, idx, corpus, ckpt):
        q = stream_dedup_ingest(spark, source, idx, corpus, ckpt,
                                threshold=0.8)
        try:
            q.processAllAvailable()
        finally:
            q.stop()

    def test_micro_batches_skip_known_and_within_batch_dups(
        self, spark, tmp_path
    ):
        source = str(tmp_path / "incoming")
        corpus = str(tmp_path / "corpus")
        ckpt = str(tmp_path / "ckpt")
        idx = MinHashTextIndex.build(
            spark.createDataFrame(SEED_DOCS, SCHEMA), str(tmp_path / "tidx")
        )

        text11 = ("novel text regarding alpine meteorology and snow packs"
                  " observed in the high mountains")
        batch1 = [
            (10, SEED_DOCS[0][1]),  # exact dup of seeded doc 1 → skipped
            (11, text11),
            (12, text11.replace("novel", "Novel ")),
            # ^ within-batch exact dup of 11 after normalization → one kept
        ]
        spark.createDataFrame(batch1, SCHEMA).write.mode("append").parquet(
            source
        )
        self._run(spark, source, idx, corpus, ckpt)
        kept1 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert kept1 == {11}

        # second drop: near-dup of doc 11 (ingested last batch; one word
        # changed → exact 3-shingle jaccard 10/12 ≈ 0.833 ≥ 0.8) + fresh
        batch2 = [
            (20, text11.replace("mountains", "valleys")),
            (21, "entirely fresh content describing deep sea vent fauna"),
        ]
        spark.createDataFrame(batch2, SCHEMA).write.mode("append").parquet(
            source
        )
        self._run(spark, source, idx, corpus, ckpt)
        kept2 = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert kept2 == {11, 21}

        # the index saw exactly the kept documents
        stored = spark.read.parquet(str(tmp_path / "tidx" / "sets"))
        ids = {r["_id"] for r in stored.select("_id").collect()}
        assert ids == {1, 2, 11, 21}

    def test_redelivery_is_idempotent(self, spark, tmp_path):
        """Re-running with a FRESH checkpoint re-delivers every file; the
        self-match property of append_unique must keep the corpus and
        index duplicate-free."""
        source = str(tmp_path / "incoming")
        corpus = str(tmp_path / "corpus")
        idx = MinHashTextIndex.build(
            spark.createDataFrame(SEED_DOCS, SCHEMA), str(tmp_path / "tidx")
        )
        spark.createDataFrame(
            [(30, "unique prose on tidal energy conversion efficiency")],
            SCHEMA,
        ).write.mode("append").parquet(source)

        self._run(spark, source, idx, corpus, str(tmp_path / "ckpt1"))
        self._run(spark, source, idx, corpus, str(tmp_path / "ckpt2"))

        stored = spark.read.parquet(str(tmp_path / "tidx" / "sets"))
        assert stored.where(F.col("_id") == 30).count() == 1
        assert spark.read.parquet(corpus).count() == 1
