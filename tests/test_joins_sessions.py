"""Tests for the as-of join and sessionization operators."""

from __future__ import annotations

import datetime as dt

from inception_eventstore_spark.operators.joins import asof_join
from inception_eventstore_spark.operators.sessions import (
    session_stats,
    sessionize,
)


def _ts(minute: int) -> dt.datetime:
    return dt.datetime(2024, 1, 1, 10, minute)


class TestAsofJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "u1", _ts(10)), (2, "u1", _ts(30)), (3, "u2", _ts(5))],
            ["event_id", "user_id", "ts"],
        )
        right = spark.createDataFrame(
            [
                ("u1", _ts(5), 100),
                ("u1", _ts(10), 101),
                ("u1", _ts(20), 102),
                ("u3", _ts(1), 103),
            ],
            ["user_id", "ts", "click_id"],
        )
        return left, right

    def test_inclusive_match(self, spark):
        left, right = self._frames(spark)
        got = {
            r["event_id"]: r["click_id"]
            for r in asof_join(
                left, right, "user_id", "ts", "ts", ["click_id"]
            ).collect()
        }
        # event 1 at 10:10 → click at 10:10 (inclusive); event 2 → 10:20;
        # event 3: u2 has no clicks → null
        assert got == {1: 101, 2: 102, 3: None}

    def test_strict_match(self, spark):
        left, right = self._frames(spark)
        got = {
            r["event_id"]: r["click_id"]
            for r in asof_join(
                left, right, "user_id", "ts", "ts", ["click_id"], strict=True
            ).collect()
        }
        # strict: event 1 at 10:10 must NOT match the 10:10 click
        assert got == {1: 100, 2: 102, 3: None}

    def test_left_rows_preserved(self, spark):
        left, right = self._frames(spark)
        out = asof_join(left, right, "user_id", "ts", "ts", ["click_id"])
        assert out.count() == left.count()
        assert set(left.columns) <= set(out.columns)


class TestSessionize:
    def _events(self, spark):
        rows = [
            # u1: 3 events within gaps, then a 2h jump → 2 sessions
            (1, "u1", _ts(0)),
            (2, "u1", _ts(20)),
            (3, "u1", _ts(50)),
            (4, "u1", dt.datetime(2024, 1, 1, 13, 0)),
            # u2: single event → 1 session
            (5, "u2", _ts(0)),
        ]
        return spark.createDataFrame(rows, ["event_id", "user_id", "ts"])

    def test_session_numbering(self, spark):
        e = self._events(spark)
        s = sessionize(e, gap="1 hour")
        got = {r["event_id"]: r["session_id"] for r in s.collect()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 2, 5: 1}

    def test_gap_boundary_is_exclusive(self, spark):
        rows = [(1, "u", _ts(0)), (2, "u", dt.datetime(2024, 1, 1, 11, 0))]
        e = spark.createDataFrame(rows, ["event_id", "user_id", "ts"])
        s = {r["event_id"]: r["session_id"]
             for r in sessionize(e, gap="1 hour").collect()}
        # exactly the gap apart → same session (strictly-greater starts new)
        assert s == {1: 1, 2: 1}

    def test_session_stats(self, spark):
        e = self._events(spark)
        stats = {
            r["user_id"]: (r["n_sessions"], r["n_events"], r["max_session_events"])
            for r in session_stats(e, gap="1 hour").collect()
        }
        assert stats == {"u1": (2, 4, 3), "u2": (1, 1, 1)}
