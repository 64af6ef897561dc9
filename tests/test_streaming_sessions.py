"""Tests for session_window-based streaming sessionization."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from inception_eventstore_spark import schemas
from inception_eventstore_spark.functions.filetime import datetime_to_filetime
from inception_eventstore_spark.operators.sessions import sessionize
from inception_eventstore_spark.streaming.ingest import session_window_stats

T0 = datetime_to_filetime(
    dt.datetime(2024, 3, 14, 12, 0, 0, tzinfo=dt.timezone.utc)
)
MIN = 600_000_000  # FileTime ticks per minute

A, B = b"sess-agg-a", b"sess-agg-b"


def _rows():
    # A: events at +0, +10min (same session), +50min (gap > 30min → new
    # session); B: one event
    return [
        (A, 1, 0, T0, b"x"),
        (A, 2, 0, T0 + 10 * MIN, b"x"),
        (A, 3, 0, T0 + 50 * MIN, b"x"),
        (B, 1, 0, T0 + 5 * MIN, b"x"),
    ]


class TestSessionWindowStats:
    def test_batch_session_boundaries(self, spark):
        df = spark.createDataFrame(_rows(), schema=schemas.EVENTS_SCHEMA)
        got = {
            (bytes(r["id"]), r["n_events"]): (r["session_start"], r["session_end"])
            for r in session_window_stats(df, gap="30 minutes").collect()
        }
        assert set(got) == {(A, 2), (A, 1), (B, 1)}
        start, end = got[(A, 2)]
        assert (end - start) == dt.timedelta(minutes=40)  # last ev + gap
        s1, e1 = got[(A, 1)]
        assert (e1 - s1) == dt.timedelta(minutes=30)

    def test_agrees_with_lag_based_sessionize(self, spark):
        """Same session COUNT per key as the batch lag/running-sum
        operator (which numbers sessions over the raw FileTime ticks,
        so the gap is passed as a tick literal there)."""
        df = spark.createDataFrame(_rows(), schema=schemas.EVENTS_SCHEMA)
        keyed = df.withColumn("u", F.col("id").cast("string"))
        lag = sessionize(
            keyed, key_col="u", time_col="ts",
            gap=F.lit(30 * MIN), order_tiebreak="rev",
        )
        lag_sessions = {
            r["u"]: r["n"]
            for r in lag.groupBy("u")
            .agg(F.countDistinct("session_id").alias("n"))
            .collect()
        }
        sw = session_window_stats(df, gap="30 minutes")
        sw_sessions = {
            r["u"]: r["n"]
            for r in sw.groupBy(F.col("id").cast("string").alias("u"))
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert lag_sessions == sw_sessions

    def test_streaming_complete_mode(self, spark, tmp_path):
        source = str(tmp_path / "incoming")
        spark.createDataFrame(
            _rows(), schema=schemas.EVENTS_SCHEMA
        ).write.mode("append").parquet(source)
        stream = (
            spark.readStream.schema(schemas.EVENTS_SCHEMA)
            .parquet(source)
        )
        agg = session_window_stats(stream, gap="30 minutes")
        q = (
            agg.writeStream.format("memory")
            .queryName("sess_out")
            .outputMode("complete")
            .start()
        )
        try:
            q.processAllAvailable()
            rows = spark.sql("SELECT * FROM sess_out").collect()
        finally:
            q.stop()
        got = {(bytes(r["id"]), r["n_events"]) for r in rows}
        assert got == {(A, 2), (A, 1), (B, 1)}
