"""Streaming dedup-at-ingest: stream_dedup_ingest + MinHashTextIndex,
and the composed stream_curation_pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F

from inception_eventstore_spark.operators.text_index import MinHashTextIndex
from inception_eventstore_spark.streaming.ingest import (
    stream_curation_pipeline,
    stream_dedup_ingest,
)

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


class TestStreamCurationPipeline:
    # long enough to clear Gopher's 50-word minimum
    GOOD = " ".join(
        f"sentence {i} with several ordinary readable words in it"
        for i in range(8)
    )

    def test_full_pipeline(self, spark, tmp_path):
        source = str(tmp_path / "cp_in")
        corpus = str(tmp_path / "cp_corpus")
        ckpt = str(tmp_path / "cp_ckpt")
        idx = MinHashTextIndex.build(
            spark.createDataFrame(SEED_DOCS, SCHEMA), str(tmp_path / "cp_idx")
        )
        batch = [
            (1, self.GOOD + " contact admin@example.com for details"),
            (2, "way too short to keep"),                    # fails gopher
            (3, self.GOOD + " contact admin@example.com for details"),
            # ^ exact dup of 1 after redaction+normalization
            (4, self.GOOD.replace("ordinary", "unusual")),   # fresh, kept
        ]
        spark.createDataFrame(batch, SCHEMA).write.mode("append").parquet(
            source
        )
        q = stream_curation_pipeline(
            spark, source, idx, corpus, ckpt, threshold=0.9
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        rows = {r["doc_id"]: r["text"]
                for r in spark.read.parquet(corpus).collect()}
        assert set(rows) == {1, 4}
        assert "admin@example.com" not in rows[1]
        assert "[EMAIL]" in rows[1]

    def test_near_dup_of_corpus_rejected_next_batch(self, spark, tmp_path):
        source = str(tmp_path / "cp2_in")
        corpus = str(tmp_path / "cp2_corpus")
        idx = MinHashTextIndex.build(
            spark.createDataFrame(SEED_DOCS, SCHEMA), str(tmp_path / "cp2_idx")
        )
        spark.createDataFrame(
            [(10, self.GOOD)], SCHEMA
        ).write.mode("append").parquet(source)
        q = stream_curation_pipeline(
            spark, source, idx, corpus, str(tmp_path / "cp2_ck1"),
            threshold=0.8,
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        # second drop: ONE token changed; the repeated-sentence text has
        # only 29 distinct shingles, 3 change -> exact jaccard 0.8125
        spark.createDataFrame(
            [(11, self.GOOD.replace("sentence 7 ", "sentence seven "))],
            SCHEMA,
        ).write.mode("append").parquet(source)
        q2 = stream_curation_pipeline(
            spark, source, idx, corpus, str(tmp_path / "cp2_ck1"),
            threshold=0.8,
        )
        try:
            q2.processAllAvailable()
        finally:
            q2.stop()
        kept = {r["doc_id"] for r in spark.read.parquet(corpus).collect()}
        assert kept == {10}


class TestDedupWithinWatermark:
    def test_streaming_drops_redelivered_keys(self, spark, tmp_path):
        import datetime as dt

        from inception_eventstore_spark.functions.filetime import (
            datetime_to_filetime,
        )
        from inception_eventstore_spark.streaming.ingest import (
            dedup_within_watermark,
            read_event_stream,
        )

        source = str(tmp_path / "in")
        out = str(tmp_path / "out")
        ckpt = str(tmp_path / "ck")
        ts = datetime_to_filetime(
            dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        )
        rows = [
            (b"agg-1", 1, 0, ts, bytearray(b"p1")),
            (b"agg-1", 1, 0, ts, bytearray(b"p1")),  # duplicate delivery
            (b"agg-1", 1, 1, ts + 10, bytearray(b"p2")),
        ]
        from inception_eventstore_spark import schemas

        spark.createDataFrame(rows, schemas.EVENTS_SCHEMA).write.mode(
            "append"
        ).parquet(source)

        deduped = dedup_within_watermark(read_event_stream(spark, source))
        q = (
            deduped.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        got = spark.read.parquet(out).select("id", "rev", "pos").collect()
        assert sorted((bytes(r.id), r.rev, r.pos) for r in got) == [
            (b"agg-1", 1, 0),
            (b"agg-1", 1, 1),
        ]

    def test_batch_fallback(self, spark):
        import datetime as dt

        from inception_eventstore_spark import schemas
        from inception_eventstore_spark.functions.filetime import (
            datetime_to_filetime,
        )
        from inception_eventstore_spark.streaming.ingest import (
            dedup_within_watermark,
        )

        ts = datetime_to_filetime(
            dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        )
        df = spark.createDataFrame(
            [(b"a", 1, 0, ts, bytearray(b"x"))] * 3, schemas.EVENTS_SCHEMA
        )
        assert dedup_within_watermark(df).count() == 1


class TestStreamingImageDedupIngest:
    def test_visual_dups_skipped_across_batches(self, spark, tmp_path):
        from inception_eventstore_spark.operators import multimodal as MM
        from inception_eventstore_spark.operators import phash as PH
        from inception_eventstore_spark.operators.jpeg import encode_jpeg
        from inception_eventstore_spark.operators.phash_index import (
            PhashImageIndex,
        )
        from inception_eventstore_spark.streaming.ingest import (
            stream_image_dedup_ingest,
        )

        source = str(tmp_path / "incoming")
        corpus = str(tmp_path / "corpus")
        ckpt = str(tmp_path / "ckpt")
        imgs = PH.textured_test_images(6)
        seed = spark.createDataFrame(
            [(i, bytearray(p)) for i, p in imgs[:3]],
            "asset_id long, payload binary",
        )
        idx = PhashImageIndex.build(seed, str(tmp_path / "pix"))

        # batch 1: a JPEG re-encode of seeded image 1 (visual dup) + a
        # genuinely new image
        reenc = encode_jpeg(MM._decode_image(imgs[1][1]), quality=85)
        spark.createDataFrame(
            [(10, bytearray(reenc)), (11, bytearray(imgs[3][1]))],
            "asset_id long, payload binary",
        ).write.mode("append").parquet(source)
        q = stream_image_dedup_ingest(spark, source, idx, corpus, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        kept = {r["asset_id"] for r in spark.read.parquet(corpus).collect()}
        assert kept == {11}

        # batch 2: a re-encode of the image ingested in batch 1 (now
        # probe-visible) + fresh
        reenc3 = encode_jpeg(MM._decode_image(imgs[3][1]), quality=70)
        spark.createDataFrame(
            [(20, bytearray(reenc3)), (21, bytearray(imgs[4][1]))],
            "asset_id long, payload binary",
        ).write.mode("append").parquet(source)
        q = stream_image_dedup_ingest(spark, source, idx, corpus, ckpt)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
        kept = {r["asset_id"] for r in spark.read.parquet(corpus).collect()}
        assert kept == {11, 21}
