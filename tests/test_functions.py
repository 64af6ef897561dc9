"""Unit tests for the pure transforms (no Spark I/O needed for most).

The pid unit vectors come from the reference's PartitionCalculatorTests
(One.Inception.EventStore.Cassandra.Tests/CassandraEventStoreSchemaTests.cs:3-19).
"""

from __future__ import annotations

import datetime as dt

import pytest

from inception_eventstore_spark.functions.filetime import (
    FILETIME_EPOCH_TICKS,
    datetime_to_filetime,
    filetime_to_datetime,
)
from inception_eventstore_spark.functions.paging import (
    PagingToken,
    decode_token,
    encode_token,
)
from inception_eventstore_spark.functions.partitions import (
    next_pid,
    pid_from_datetime,
    pid_range,
)


class TestFileTime:
    def test_epoch(self):
        assert filetime_to_datetime(FILETIME_EPOCH_TICKS) == dt.datetime(
            1970, 1, 1, tzinfo=dt.timezone.utc
        )

    def test_round_trip(self):
        d = dt.datetime(2024, 3, 14, 15, 9, 26, 535897, tzinfo=dt.timezone.utc)
        assert filetime_to_datetime(datetime_to_filetime(d)) == d

    def test_known_value(self):
        # (11644473600 + 1704067200) s × 10^7 ticks/s
        d = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        ticks = datetime_to_filetime(d)
        assert ticks == 133485408000000000
        assert filetime_to_datetime(ticks) == d

    def test_naive_treated_as_utc(self):
        naive = dt.datetime(2024, 1, 1)
        aware = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
        assert datetime_to_filetime(naive) == datetime_to_filetime(aware)


class TestPid:
    @pytest.mark.parametrize(
        "date,expected",
        [
            (dt.datetime(2024, 3, 14), 2024074),
            (dt.datetime(2023, 12, 31), 2023365),
            (dt.datetime(2024, 1, 1), 2024001),
            (dt.datetime(2024, 12, 31), 2024366),  # leap year
            (dt.datetime(2025, 1, 1), 2025001),
        ],
    )
    def test_pid_values(self, date, expected):
        assert pid_from_datetime(date) == expected

    @pytest.mark.parametrize(
        "pid,expected",
        [
            (2024074, 2024075),  # plain day
            (2023365, 2024001),  # year rollover
            (2024366, 2025001),  # leap-year rollover
            (2025365, 2026001),  # non-leap rollover at 365
        ],
    )
    def test_next_pid(self, pid, expected):
        assert next_pid(pid) == expected

    def test_pid_range_across_year(self):
        assert pid_range(2023364, 2024002) == [
            2023364,
            2023365,
            2024001,
            2024002,
        ]

    def test_pid_range_empty(self):
        assert pid_range(2024002, 2024001) == []


class TestXxHash64:
    """Pin the pure-python XXH64 to Spark's xxhash64 — the bucket
    routing of every point lookup depends on this equality."""

    def test_matches_spark(self, spark):
        import random

        from pyspark.sql import functions as F

        from inception_eventstore_spark.functions.hashing import xxhash64

        rng = random.Random(99)
        samples = [
            b"", b"x", bytes(range(7)), bytes(range(8)), bytes(range(31)),
            bytes(range(32)), bytes(range(33)), bytes(range(200)),
        ] + [
            bytes(rng.randrange(256) for _ in range(rng.randrange(0, 150)))
            for _ in range(40)
        ]
        rows = (
            spark.createDataFrame([(s,) for s in samples], "b binary")
            .select(F.xxhash64("b").alias("h"))
            .collect()
        )
        for row, s in zip(rows, samples):
            assert row["h"] == xxhash64(s), s.hex()

    def test_bucket_matches_pmod(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.functions.hashing import bucket_of

        samples = [b"agg-%d" % i for i in range(50)]
        rows = (
            spark.createDataFrame([(s,) for s in samples], "b binary")
            .select(F.pmod(F.xxhash64("b"), F.lit(64)).alias("m"))
            .collect()
        )
        for row, s in zip(rows, samples):
            assert int(row["m"]) == bucket_of(s, 64)


class TestPagingToken:
    def test_round_trip(self):
        t = PagingToken(keys={"rev": 3, "pos": 7}, has_more=True)
        assert decode_token(encode_token(t)) == t

    def test_bytes_round_trip(self):
        t = PagingToken(keys={"aid": b"\x00\xffab", "rev": 1}, has_more=False)
        back = decode_token(encode_token(t))
        assert back.keys["aid"] == b"\x00\xffab"
        assert back.has_more is False

    def test_none_is_fresh(self):
        t = decode_token(None)
        assert t.keys == {} and t.has_more is True

    def test_encoded_is_base64_json(self):
        import base64
        import json

        t = PagingToken(keys={"rev": 1, "pos": 2}, has_more=True)
        payload = json.loads(base64.b64decode(encode_token(t)))
        assert payload["HasMore"] is True
        assert payload["Token"] == {"pos": 2, "rev": 1}


class TestFileTimeSparkEquivalence:
    def test_jvm_matches_python_all_trailing_digits(self, spark):
        """The JVM column conversion must truncate exactly like python
        ``// 10`` — float division rounds ticks ending in 9 one µs up
        once the delta exceeds 2^53, shifting day-boundary events into
        the wrong pid partition (ADVICE r1)."""
        import random

        from pyspark.sql import functions as F  # noqa: F811

        from inception_eventstore_spark.functions.filetime import (
            filetime_to_timestamp_col,
        )
        from inception_eventstore_spark.functions.partitions import (
            pid_col_from_filetime,
            pid_from_filetime,
        )

        rng = random.Random(7)
        ticks = [
            FILETIME_EPOCH_TICKS + rng.randrange(0, 2 * 10**17)
            for _ in range(500)
        ]
        # every trailing digit 0..9 near a modern date
        base = FILETIME_EPOCH_TICKS + 17_700_000_000_000_000
        ticks += [base + d for d in range(10)]
        # the last 100 ns of a day — the exact ADVICE failure mode
        day_ticks = 864_000_000_000
        ticks += [
            FILETIME_EPOCH_TICKS + 20_000 * day_ticks - d for d in range(1, 11)
        ]
        df = spark.createDataFrame([(t,) for t in ticks], "ts long")
        rows = df.select(
            "ts",
            filetime_to_timestamp_col("ts").alias("dt"),
            pid_col_from_filetime("ts").alias("pid"),
        ).collect()
        for r in rows:
            expected_dt = filetime_to_datetime(r["ts"]).replace(tzinfo=None)
            assert r["dt"] == expected_dt, f"ts={r['ts']}"
            assert r["pid"] == pid_from_filetime(r["ts"]), f"ts={r['ts']}"


class TestTimeBucket:
    def test_interval_parsing(self):
        from inception_eventstore_spark.functions.timebucket import (
            interval_to_micros,
        )

        assert interval_to_micros("45 minutes") == 45 * 60_000_000
        assert interval_to_micros("1 day") == 86_400_000_000
        assert interval_to_micros("6 hours") == 6 * 3_600_000_000
        import pytest as _pytest

        with _pytest.raises(ValueError):
            interval_to_micros("fortnight")
        with _pytest.raises(ValueError):
            interval_to_micros("3 weeks")

    def test_bucket_boundaries(self, spark):
        import datetime as dt

        from pyspark.sql import functions as F  # noqa: F811

        from inception_eventstore_spark.functions.timebucket import time_bucket

        rows = [
            (dt.datetime(2024, 3, 14, 0, 0, 0),),
            (dt.datetime(2024, 3, 14, 0, 44, 59),),
            (dt.datetime(2024, 3, 14, 0, 45, 0),),
            (dt.datetime(2024, 3, 14, 23, 59, 59),),
        ]
        df = spark.createDataFrame(rows, "ts timestamp")
        got = [
            r["b"]
            for r in df.select(time_bucket("ts", "45 minutes").alias("b")).collect()
        ]
        assert got[0] == got[1] == dt.datetime(2024, 3, 14, 0, 0, 0)
        assert got[2] == dt.datetime(2024, 3, 14, 0, 45, 0)
        assert got[3] == dt.datetime(2024, 3, 14, 23, 15, 0)
