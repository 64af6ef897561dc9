"""Tests for the as-of join and sessionization operators."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

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


class TestNearestJoin:
    def _frames(self, spark):
        left = spark.createDataFrame(
            [(1, "u1", 100), (2, "u1", 26), (3, "u2", 5), (4, "u1", 20)],
            "event_id long, user_id string, t long",
        )
        right = spark.createDataFrame(
            [("u1", 10, 100), ("u1", 30, 101), ("u1", 90, 102)],
            "user_id string, rt long, click_id long",
        )
        return left, right

    def test_picks_closest_either_direction(self, spark):
        from inception_eventstore_spark.operators.joins import nearest_join

        left, right = self._frames(spark)
        got = {
            r["event_id"]: (r["click_id"], r["nearest_ts"])
            for r in nearest_join(
                left, right, "user_id", "t", "rt", ["click_id"]
            ).collect()
        }
        # 1@100 → 90 (back, d=10) ; 2@26 → 30 (fwd, d=4 beats back d=16)
        # 3: u2 no rights → null ; 4@20 → tie d=10 both ways → earlier (10)
        assert got == {
            1: (102, 90), 2: (101, 30), 3: (None, None), 4: (100, 10)
        }

    def test_max_distance_bounds_matches(self, spark):
        from inception_eventstore_spark.operators.joins import nearest_join

        left, right = self._frames(spark)
        got = {
            r["event_id"]: r["click_id"]
            for r in nearest_join(
                left, right, "user_id", "t", "rt", ["click_id"],
                max_distance=5,
            ).collect()
        }
        assert got == {1: None, 2: 101, 3: None, 4: None}

    def test_equal_timestamp_is_distance_zero(self, spark):
        from inception_eventstore_spark.operators.joins import nearest_join

        left = spark.createDataFrame(
            [(1, "u1", 30)], "event_id long, user_id string, t long"
        )
        _, right = self._frames(spark)
        out = nearest_join(
            left, right, "user_id", "t", "rt", ["click_id"]
        ).collect()[0]
        assert (out["click_id"], out["nearest_ts"]) == (101, 30)


class TestAsofJoinProperty:
    def test_matches_pandas_merge_asof(self, spark):
        """Randomized agreement with pandas.merge_asof (backward,
        inclusive) over 300 left × 200 right rows and 8 keys."""
        import random

        import pandas as pd

        rng = random.Random(17)
        left_rows = [
            (i, f"k{rng.randrange(8)}", _ts(rng.randrange(0, 59)))
            for i in range(300)
        ]
        # unique (key, ts) per the operator's documented precondition
        seen: dict[tuple, int] = {}
        for j in range(200):
            seen[(f"k{rng.randrange(8)}", _ts(rng.randrange(0, 59)))] = 1000 + j
        right_rows = [(k, t, v) for (k, t), v in seen.items()]
        left = spark.createDataFrame(left_rows, ["event_id", "key", "ts"])
        right = spark.createDataFrame(right_rows, ["key", "ts", "val"])

        got = {
            r["event_id"]: r["val"]
            for r in asof_join(left, right, "key", "ts", "ts", ["val"]).collect()
        }

        lp = pd.DataFrame(left_rows, columns=["event_id", "key", "ts"]).sort_values(
            "ts", kind="stable"
        )
        # make right unique per (key, ts) keeping the LAST val, matching
        # the operator's latest-wins tie rule inside equal timestamps
        rp = (
            pd.DataFrame(right_rows, columns=["key", "ts", "val"])
            .sort_values(["ts"], kind="stable")
            .groupby(["key", "ts"], as_index=False)
            .last()
            .sort_values("ts", kind="stable")
        )
        merged = pd.merge_asof(
            lp, rp, on="ts", by="key", direction="backward"
        )
        expect = {
            int(r.event_id): (None if pd.isna(r.val) else int(r.val))
            for r in merged.itertuples()
        }
        assert got == expect


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


class TestRangeJoin:
    def test_matches_naive_theta_join(self, spark):
        import random

        from inception_eventstore_spark.operators.joins import range_join

        rng = random.Random(5)
        pts = [(i, rng.randrange(0, 10_000)) for i in range(300)]
        ivs = [
            (j, lo, lo + rng.randrange(0, 800))
            for j, lo in ((j, rng.randrange(0, 10_000)) for j in range(40))
        ]
        points = spark.createDataFrame(pts, ["pid", "v"])
        intervals = spark.createDataFrame(ivs, ["iid", "lo", "hi"])
        got = {
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "v", "lo", "hi",
                                bucket_width=500).collect()
        }
        naive = {
            (p, j) for p, v in pts for j, lo, hi in ivs if lo <= v <= hi
        }
        assert got == naive
        # half-open variant
        got_ho = {
            (r["pid"], r["iid"])
            for r in range_join(points, intervals, "v", "lo", "hi",
                                bucket_width=500, bounds="[)").collect()
        }
        naive_ho = {
            (p, j) for p, v in pts for j, lo, hi in ivs if lo <= v < hi
        }
        assert got_ho == naive_ho

    def test_plan_is_hash_join_not_nested_loop(self, spark):
        from inception_eventstore_spark.operators.joins import range_join

        points = spark.range(1000).withColumnRenamed("id", "v")
        intervals = spark.range(10).select(
            F.col("id").alias("iid"),
            (F.col("id") * 100).alias("lo"),
            (F.col("id") * 100 + 50).alias("hi"),
        )
        plan = range_join(
            points, intervals, "v", "lo", "hi", bucket_width=100
        )._jdf.queryExecution().executedPlan().toString()
        assert "NestedLoop" not in plan
        assert "HashJoin" in plan or "SortMergeJoin" in plan

    def test_guards(self, spark):
        import pytest as _pytest

        from inception_eventstore_spark.operators.joins import range_join

        df = spark.range(3).withColumnRenamed("id", "v")
        iv = spark.range(1).select(
            F.col("id").alias("lo"), (F.col("id") + 1).alias("hi")
        )
        with _pytest.raises(ValueError):
            range_join(df, iv, "v", "lo", "hi", 10, bounds="()")
        with _pytest.raises(ValueError):
            range_join(df, iv, "v", "lo", "hi", 0)


class TestStateRuns:
    def test_island_compression(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.sessions import state_runs

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, t0, 1, "up"), (2, t0 + dt.timedelta(minutes=1), 1, "up"),
            (3, t0 + dt.timedelta(minutes=2), 1, "down"),
            (4, t0 + dt.timedelta(minutes=3), 1, "up"),
            (5, t0, 2, "up"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        got = [
            (r["user_id"], r["run_id"], r["state"], r["n_events"])
            for r in state_runs(df).orderBy("user_id", "run_id").collect()
        ]
        # user 1: up×2 → down×1 → up×1 (state recurring later = NEW run)
        assert got == [
            (1, 1, "up", 2), (1, 2, "down", 1), (1, 3, "up", 1),
            (2, 1, "up", 1),
        ]

    def test_run_bounds(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.sessions import state_runs

        t0 = dt.datetime(2024, 1, 1)
        df = spark.createDataFrame(
            [(i, t0 + dt.timedelta(minutes=i), 1, "a") for i in range(3)],
            "event_id long, ts timestamp, user_id long, event_type string",
        )
        r = state_runs(df).collect()[0]
        assert r["run_start"] == t0
        assert r["run_end"] == t0 + dt.timedelta(minutes=2)


class TestSessionFlow:
    def test_entry_exit_and_bounces(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.sessions import (
            session_flow,
        )

        d0 = dt.datetime(2024, 1, 1, 9)
        m = dt.timedelta(minutes=1)
        h = dt.timedelta(hours=3)
        rows = [
            # user 1 session 1: view → click → purchase
            (1, d0, 1, "view"),
            (2, d0 + m, 1, "click"),
            (3, d0 + 2 * m, 1, "purchase"),
            # user 1 session 2 (3h later): single view → bounce
            (4, d0 + h, 1, "view"),
            # user 2 session 1: view → view
            (5, d0, 2, "view"),
            (6, d0 + m, 2, "view"),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        got = {
            (r["entry_type"], r["exit_type"]): r
            for r in session_flow(df, gap="1 hour").collect()
        }
        assert got[("view", "purchase")]["n_sessions"] == 1
        assert got[("view", "purchase")]["bounces"] == 0
        assert got[("view", "view")]["n_sessions"] == 2
        assert got[("view", "view")]["bounces"] == 1
        assert got[("view", "view")]["bounce_ppm"] == 500000

    def test_same_instant_ties_use_event_id(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.sessions import (
            session_flow,
        )

        d0 = dt.datetime(2024, 1, 1)
        rows = [
            (2, d0, 1, "b"),
            (1, d0, 1, "a"),  # same ts: event_id 1 is the entry
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string"
        )
        (r,) = session_flow(df).collect()
        assert (r["entry_type"], r["exit_type"]) == ("a", "b")
        assert r["bounces"] == 0
