"""Round-3 second wave: rolling time-series stats, z-order layout,
incremental materialized aggregate views."""

from __future__ import annotations

import statistics

import pytest
from pyspark.sql import functions as F

from inception_eventstore_spark.operators import timeseries as TS
from inception_eventstore_spark.sources import zorder as Z
from inception_eventstore_spark.sources.matview import (
    IncrementalAggView,
    Measure,
)


@pytest.fixture(scope="module")
def series(spark):
    rows = []
    for u in (1, 2):
        for i in range(30):
            v = float(i % 5) if not (u == 1 and i == 25) else 100.0
            rows.append((u * 1000 + i, f"2024-01-01 00:{i:02d}:00", u, v))
    return spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, value double"
    ).withColumn("ts", F.col("ts").cast("timestamp"))


class TestRollingStats:
    def test_matches_python(self, series):
        got = {
            (r["user_id"], r["seq"]): r
            for r in TS.rolling_stats(series, window=10).collect()
        }
        vals = [
            r["value"]
            for r in series.where(F.col("user_id") == 2)
            .orderBy("ts", "event_id")
            .collect()
        ]
        for i in range(30):
            row = got[(2, i + 1)]
            hist = vals[max(0, i - 10) : i]
            assert row["roll_n"] == len(hist)
            if len(hist) >= 2:
                assert row["roll_avg"] == pytest.approx(
                    statistics.fmean(hist)
                )
                assert row["roll_std"] == pytest.approx(
                    statistics.stdev(hist)
                )
            elif not hist:
                assert row["roll_avg"] is None

    def test_zscore_flags_planted_spike(self, series):
        hits = TS.zscore_anomalies(
            series, window=10, min_history=5, threshold=2.0
        ).collect()
        assert {(r["user_id"], r["value"]) for r in hits} == {(1, 100.0)}
        assert all(abs(r["zscore"]) >= 2.0 for r in hits)

    def test_cold_key_never_alarms(self, spark):
        df = spark.createDataFrame(
            [(1, "2024-01-01 00:00:00", 7, 1e9)],
            "event_id long, ts string, user_id long, value double",
        ).withColumn("ts", F.col("ts").cast("timestamp"))
        assert TS.zscore_anomalies(df).count() == 0


class TestZorder:
    def test_interleave_bits_known_values(self, spark):
        df = spark.range(1).select(
            Z.interleave_bits([F.lit(0b101), F.lit(0b011)], bits=3).alias("z")
        )
        # a=101, b=011 → bits (b1 a1) per level: level0 a=1,b=1 → 11;
        # level1 a=0,b=1 → 10; level2 a=1,b=0 → 01
        # z = level2(01) level1(10) level0(11) = 0b011011 = 27
        assert df.first()["z"] == 27

    def test_guards(self, spark):
        with pytest.raises(ValueError):
            Z.interleave_bits([F.lit(1)], bits=4)
        with pytest.raises(ValueError):
            Z.interleave_bits([F.lit(1), F.lit(2)], bits=32)

    def test_disjoint_file_ranges(self, spark, tmp_path):
        import random

        rng = random.Random(5)
        rows = [
            (rng.randrange(10000), rng.randrange(10000)) for _ in range(5000)
        ]
        df = spark.createDataFrame(rows, "x long, y long")
        path = str(tmp_path / "zorder")
        Z.zorder_write(df, path, ["x", "y"], bits=8, num_files=8)
        back = spark.read.parquet(path)
        assert back.count() == 5000
        ranges = (
            back.groupBy(F.input_file_name().alias("f"))
            .agg(F.min("_z").alias("lo"), F.max("_z").alias("hi"))
            .collect()
        )
        spans = sorted((r["lo"], r["hi"]) for r in ranges)
        assert len(spans) > 1
        for (lo1, hi1), (lo2, hi2) in zip(spans, spans[1:]):
            assert hi1 <= lo2, "file z-ranges must be disjoint"

    def test_constant_column_degrades_gracefully(self, spark, tmp_path):
        df = spark.createDataFrame(
            [(1, i) for i in range(100)], "x long, y long"
        )
        zdf = Z.zvalue_by_range(df, ["x", "y"], bits=4)
        assert zdf.select(F.countDistinct("_z")).first()[0] == 16


class TestIncrementalAggView:
    def _measures(self):
        return [
            Measure("n", "count"),
            Measure("total", "sum", "value"),
            Measure("vmin", "min", "value"),
            Measure("vmax", "max", "value"),
            Measure("vavg", "avg", "value"),
        ]

    def test_incremental_equals_full_recompute(self, spark, tmp_path):
        data = [(i % 7, float(i)) for i in range(200)]
        df = spark.createDataFrame(data, "k long, value double")
        mv = IncrementalAggView(
            spark, str(tmp_path / "mv"), ["k"], self._measures()
        )
        for lo, hi in ((0, 50), (50, 120), (120, 200)):
            batch = spark.createDataFrame(data[lo:hi], "k long, value double")
            mv.apply(batch)
        got = {r["k"]: r for r in mv.read().collect()}
        want = {
            r["k"]: r
            for r in df.groupBy("k")
            .agg(
                F.count("*").alias("n"),
                F.sum("value").alias("total"),
                F.min("value").alias("vmin"),
                F.max("value").alias("vmax"),
                F.avg("value").alias("vavg"),
            )
            .collect()
        }
        assert set(got) == set(want)
        for k in want:
            for c in ("n", "total", "vmin", "vmax"):
                assert got[k][c] == want[k][c], (k, c)
            assert got[k]["vavg"] == pytest.approx(want[k]["vavg"])

    def test_auto_compact_bounds_files(self, spark, tmp_path):
        from inception_eventstore_spark.sources import fsutil

        mv = IncrementalAggView(
            spark,
            str(tmp_path / "mv2"),
            ["k"],
            [Measure("n", "count")],
            auto_compact_threshold=5,
        )
        for i in range(12):
            mv.apply(
                spark.createDataFrame([(i % 2, 1.0)], "k long, value double")
            )
        assert fsutil.data_file_count(spark, mv.path) < 5 + 2
        got = {r["k"]: r["n"] for r in mv.read().collect()}
        assert got == {0: 6, 1: 6}

    def test_negative_delta_retracts_sum(self, spark, tmp_path):
        mv = IncrementalAggView(
            spark,
            str(tmp_path / "mv3"),
            ["k"],
            [Measure("total", "sum", "value")],
        )
        mv.apply(spark.createDataFrame([(1, 10.0)], "k long, value double"))
        mv.apply(spark.createDataFrame([(1, -4.0)], "k long, value double"))
        assert mv.read().first()["total"] == 6.0

    def test_read_before_state_raises(self, spark, tmp_path):
        mv = IncrementalAggView(
            spark, str(tmp_path / "mv4"), ["k"], [Measure("n", "count")]
        )
        with pytest.raises(FileNotFoundError):
            mv.read()

    def test_bad_measures_rejected(self, spark, tmp_path):
        with pytest.raises(ValueError):
            Measure("x", "median", "v")
        with pytest.raises(ValueError):
            Measure("x", "sum")
        with pytest.raises(ValueError):
            IncrementalAggView(spark, "p", [], [Measure("n", "count")])


class TestApproxDistinctMeasure:
    def test_hll_merges_across_batches(self, spark, tmp_path):
        mv = IncrementalAggView(
            spark,
            str(tmp_path / "mv5"),
            ["k"],
            [Measure("users", "approx_distinct", "u"),
             Measure("n", "count")],
        )
        # two batches with overlapping user sets: a naive sum of
        # per-batch distincts would give 150; the merged sketch must
        # count the union (100)
        b1 = spark.createDataFrame(
            [(1, u) for u in range(100)], "k long, u long"
        )
        b2 = spark.createDataFrame(
            [(1, u) for u in range(50, 150)], "k long, u long"
        )
        mv.apply(b1)
        mv.apply(b2)
        row = mv.read().first()
        assert row["n"] == 200
        assert row["users"] == pytest.approx(150, rel=0.05)
        assert row["users"] != 200

    def test_compact_preserves_sketch(self, spark, tmp_path):
        mv = IncrementalAggView(
            spark,
            str(tmp_path / "mv6"),
            ["k"],
            [Measure("users", "approx_distinct", "u")],
        )
        mv.apply(spark.createDataFrame(
            [(1, u) for u in range(80)], "k long, u long"))
        before = mv.read().first()["users"]
        mv.compact()
        mv.apply(spark.createDataFrame(
            [(1, u) for u in range(80, 90)], "k long, u long"))
        after = mv.read().first()["users"]
        assert after == pytest.approx(before + 10, rel=0.05)


class TestStreamIntoView:
    def test_stream_maintains_view(self, spark, tmp_path):
        from inception_eventstore_spark.streaming.ingest import (
            stream_into_view,
        )

        src = str(tmp_path / "src")
        df1 = spark.createDataFrame(
            [(i % 3, float(i)) for i in range(60)], "k long, value double"
        )
        df1.write.parquet(src)
        mv = IncrementalAggView(
            spark,
            str(tmp_path / "mv7"),
            ["k"],
            [Measure("n", "count"), Measure("total", "sum", "value")],
        )
        stream = spark.readStream.schema("k long, value double").parquet(src)
        q = stream_into_view(
            stream, mv, str(tmp_path / "ckpt"), trigger_once=True
        )
        try:
            q.awaitTermination(120)
        finally:
            q.stop()
        got = {r["k"]: (r["n"], r["total"]) for r in mv.read().collect()}
        want = {
            r["k"]: (r["n"], r["total"])
            for r in df1.groupBy("k")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
            .collect()
        }
        assert got == want


class TestApplyCommitted:
    def _mv(self, spark, tmp_path, name="mvc"):
        return IncrementalAggView(
            spark,
            str(tmp_path / name),
            ["k"],
            [Measure("n", "count"), Measure("total", "sum", "value")],
        )

    def test_redelivery_is_noop(self, spark, tmp_path):
        mv = self._mv(spark, tmp_path)
        batch = spark.createDataFrame(
            [(0, 1.0), (0, 2.0), (1, 5.0)], "k long, value double"
        )
        assert mv.apply_committed(batch, "sq-0") is True
        assert mv.apply_committed(batch, "sq-0") is False  # redelivery
        assert mv.apply_committed(batch, "sq-1") is True   # new batch
        got = {r["k"]: (r["n"], r["total"]) for r in mv.read().collect()}
        assert got == {0: (4, 6.0), 1: (2, 10.0)}
        assert mv.applied_tokens() == {"sq-0", "sq-1"}

    def test_half_committed_files_cleaned_on_retry(self, spark, tmp_path):
        from inception_eventstore_spark.sources import fsutil

        mv = self._mv(spark, tmp_path)
        batch = spark.createDataFrame(
            [(0, 1.0)], "k long, value double"
        )
        mv.apply_committed(batch, "sq-0")
        # simulate a crash mid-commit of sq-1: token-named files landed
        # but the ledger write never happened
        mv._partial_frame(batch, False).write.parquet(
            str(tmp_path / "stray")
        )
        for i, f in enumerate(
            fsutil.list_data_files(spark, str(tmp_path / "stray"))
        ):
            fsutil.rename_path(spark, f, mv.path + f"/bsq-1-{i}.parquet")
        # redelivery must replace (not add to) the orphaned files
        assert mv.apply_committed(batch, "sq-1") is True
        got = {r["k"]: (r["n"], r["total"]) for r in mv.read().collect()}
        assert got == {0: (2, 2.0)}

    def test_compact_and_rebuild_preserve_ledger(self, spark, tmp_path):
        mv = self._mv(spark, tmp_path)
        batch = spark.createDataFrame(
            [(0, 3.0)], "k long, value double"
        )
        mv.apply_committed(batch, "sq-0")
        mv.compact()
        assert mv.applied_tokens() == {"sq-0"}
        assert mv.apply_committed(batch, "sq-0") is False
        mv.rebuild(batch)
        assert mv.applied_tokens() == {"sq-0"}
        got = {r["k"]: (r["n"], r["total"]) for r in mv.read().collect()}
        assert got == {0: (1, 3.0)}

    def test_bad_token_rejected(self, spark, tmp_path):
        mv = self._mv(spark, tmp_path)
        batch = spark.createDataFrame([(0, 1.0)], "k long, value double")
        with pytest.raises(ValueError):
            mv.apply_committed(batch, "a b")
        with pytest.raises(ValueError):
            mv.apply_committed(batch, "a/b")


class TestReviewFixes:
    def test_retracting_apply_roundtrip(self, spark, tmp_path):
        mv = IncrementalAggView(
            spark,
            str(tmp_path / "mvr"),
            ["k"],
            [Measure("n", "count"), Measure("vavg", "avg", "value")],
        )
        b1 = spark.createDataFrame(
            [(1, 10.0), (1, 20.0)], "k long, value double"
        )
        b2 = spark.createDataFrame([(1, 90.0)], "k long, value double")
        mv.apply(b1)
        mv.apply(b2)
        mv.apply(b2, retract=True)
        row = mv.read().first()
        assert row["n"] == 2
        assert row["vavg"] == pytest.approx(15.0)

    def test_retract_raises_for_min_max(self, spark, tmp_path):
        mv = IncrementalAggView(
            spark,
            str(tmp_path / "mvr2"),
            ["k"],
            [Measure("vmin", "min", "value")],
        )
        b = spark.createDataFrame([(1, 1.0)], "k long, value double")
        mv.apply(b)
        with pytest.raises(ValueError, match="not invertible"):
            mv.apply(b, retract=True)

    def test_zorder_rewrite_in_place(self, spark, tmp_path):
        path = str(tmp_path / "inplace")
        df = spark.createDataFrame(
            [(i, (i * 37) % 100) for i in range(500)], "x long, y long"
        )
        df.write.parquet(path)
        # re-cluster the SAME path the input reads from
        Z.zorder_write(spark.read.parquet(path), path, ["x", "y"], bits=6)
        back = spark.read.parquet(path)
        assert back.count() == 500
        assert "_z" in back.columns


class TestTrainingExport:
    def _df(self, spark, n=300):
        return spark.range(n).selectExpr(
            "id AS doc_id", "id * 3 AS n_tok", "concat('doc ', id) AS text"
        )

    def test_export_manifest_and_verify(self, spark, tmp_path):
        from inception_eventstore_spark.sources.training_export import (
            export_shards,
            read_manifest,
            verify_shards,
        )

        path = str(tmp_path / "shards")
        m = export_shards(
            self._df(spark), path, n_shards=6, token_col="n_tok"
        )
        assert m["total_rows"] == 300
        assert m["total_tokens"] == sum(i * 3 for i in range(300))
        assert len(m["shards"]) == 6
        assert read_manifest(spark, path)["total_rows"] == 300
        assert verify_shards(spark, path)
        # every row present exactly once across shards
        back = spark.read.option("basePath", path).parquet(path)
        assert back.select("doc_id").distinct().count() == 300

    def test_one_file_per_shard(self, spark, tmp_path):
        import glob

        from inception_eventstore_spark.sources.training_export import (
            export_shards,
        )

        path = str(tmp_path / "shards2")
        export_shards(self._df(spark, 100), path, n_shards=4)
        for s in range(4):
            files = glob.glob(f"{path}/shard={s}/*.parquet")
            assert len(files) == 1, (s, files)

    def test_tamper_detected(self, spark, tmp_path):
        import glob
        import os

        from inception_eventstore_spark.sources.training_export import (
            export_shards,
            verify_shards,
        )

        path = str(tmp_path / "shards3")
        export_shards(self._df(spark, 100), path, n_shards=4)
        # drop one shard's data file behind the manifest's back
        victim = glob.glob(f"{path}/shard=2/*.parquet")[0]
        os.remove(victim)
        assert not verify_shards(spark, path)

    def test_deterministic_assignment(self, spark, tmp_path):
        from inception_eventstore_spark.sources.training_export import (
            export_shards,
        )

        p1, p2 = str(tmp_path / "a"), str(tmp_path / "b")
        m1 = export_shards(self._df(spark), p1, n_shards=5)
        m2 = export_shards(self._df(spark), p2, n_shards=5)
        assert m1["shards"] == m2["shards"]


class TestSlidingDistinctUsers:
    def test_hand_computed_wau(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            sliding_distinct_users,
        )

        def t(day, user):
            return (dt.datetime(2024, 1, day, 12, 0), user)

        rows = [t(1, 1), t(1, 2), t(2, 1), t(5, 3), t(9, 1)]
        df = spark.createDataFrame(rows, "ts timestamp, user_id long")
        got = {str(r["day"]): r["active_users"]
               for r in sliding_distinct_users(df, window_days=3).collect()}
        # day1: users{1,2}; day2: day1∪day2 = {1,2}; day5: {3} (days 3-5);
        # day9: {1}. Days 3,4,6,7 absent (no events those days).
        assert got == {
            "2024-01-01": 2, "2024-01-02": 2, "2024-01-05": 1,
            "2024-01-09": 1,
        }

    def test_multiplicity_independent(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            sliding_distinct_users,
        )

        base = [(dt.datetime(2024, 2, 1, h), 7) for h in range(10)]
        df = spark.createDataFrame(base, "ts timestamp, user_id long")
        got = sliding_distinct_users(df, window_days=7).collect()
        assert len(got) == 1 and got[0]["active_users"] == 1

    def test_guard(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            sliding_distinct_users,
        )

        df = spark.createDataFrame(
            [(dt.datetime(2024, 1, 1), 1)], "ts timestamp, user_id long"
        )
        with pytest.raises(ValueError):
            sliding_distinct_users(df, window_days=0)


class TestResampleFfill:
    def test_grid_and_fill_semantics(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            resample_ffill,
        )

        base = dt.datetime(2024, 1, 1, 0, 0, 30)
        rows = [(1, base, 10.0),
                (1, base + dt.timedelta(seconds=150), 20.0),
                (2, base + dt.timedelta(seconds=10), 5.0)]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, value double")
        got = [(r["user_id"], str(r["grid_ts"]), r["value"])
               for r in resample_ffill(df, every_seconds=60)
               .orderBy("user_id", "grid_ts").collect()]
        # user 1: grid 00:00, 01:00, 02:00, 03:00 (epoch-aligned);
        # 00:00 precedes the first obs -> NULL; 03:00 carries 20.0
        assert got == [
            (1, "2024-01-01 00:00:00", None),
            (1, "2024-01-01 00:01:00", 10.0),
            (1, "2024-01-01 00:02:00", 10.0),
            (1, "2024-01-01 00:03:00", 20.0),
            (2, "2024-01-01 00:00:00", None),
        ]

    def test_same_instant_observation_included(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            resample_ffill,
        )

        exact = dt.datetime(2024, 1, 1)  # epoch-aligned minute
        df = spark.createDataFrame(
            [(1, exact, 7.0)], "user_id long, ts timestamp, value double"
        )
        got = resample_ffill(df, every_seconds=60).collect()
        assert len(got) == 1 and got[0]["value"] == 7.0

    def test_guard(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            resample_ffill,
        )

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), 1.0)],
            "user_id long, ts timestamp, value double",
        )
        with pytest.raises(ValueError):
            resample_ffill(df, every_seconds=0)


class TestIntervalConcurrency:
    def test_sweep_half_open(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            interval_concurrency,
        )

        iv = spark.createDataFrame(
            [(0, 10), (5, 15), (7, 12), (15, 20)], ["s", "e"]
        )
        sweep = interval_concurrency(iv, "s", "e").orderBy("ts", "delta")
        rows = [(r["ts"], r["delta"], r["concurrent"])
                for r in sweep.collect()]
        # peak 3 inside [7,10); interval starting at 15 does NOT
        # overlap the one ending at 15 (half-open)
        assert max(c for _, _, c in rows) == 3
        at15 = [c for t, d, c in rows if t == 15]
        assert at15 == [0, 1]  # end processed first, then the new start
        assert rows[-1][2] == 0  # sweep closes at zero

    def test_unpartitioned_two_phase_with_ties(self, spark):
        # the None path routes through sharded_running_sums; tie
        # groups on (ts, delta) must re-expand to the exact per-event
        # prefix multiset a sequential sweep would emit
        from inception_eventstore_spark.operators.timeseries import (
            interval_concurrency,
        )

        iv = spark.createDataFrame(
            [(0, 10), (0, 10), (0, 5), (5, 10), (10, 12)], ["s", "e"]
        )
        got = sorted(
            (r["ts"], r["delta"], r["concurrent"])
            for r in interval_concurrency(iv, "s", "e").collect()
        )
        # sequential reference: events sorted by (ts, delta), running sum
        events = sorted(
            [(s, 1) for s, _ in [(0, 10), (0, 10), (0, 5), (5, 10),
                                 (10, 12)]]
            + [(e, -1) for _, e in [(0, 10), (0, 10), (0, 5), (5, 10),
                                    (10, 12)]]
        )
        acc, ref = 0, []
        for t, d in events:
            acc += d
            ref.append((t, d, acc))
        assert got == sorted(ref)
        # and the plan contains no single-partition window
        assert "SinglePartition" not in (
            interval_concurrency(iv, "s", "e")._jdf.queryExecution()
            .executedPlan().toString()
        )

    def test_partitioned_sweep(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            interval_concurrency,
        )

        iv = spark.createDataFrame(
            [("a", 0, 10), ("a", 5, 15), ("b", 0, 100)], ["p", "s", "e"]
        )
        got = interval_concurrency(iv, "s", "e", partition_col="p")
        peak = {r["p"]: r["concurrent"] for r in
                got.groupBy("p").agg(
                    F.max("concurrent").alias("concurrent")).collect()}
        assert peak == {"a": 2, "b": 1}


class TestSeasonalNaiveEval:
    def _events(self, spark, rows):
        import datetime as dt

        data = [
            (k, dt.datetime(2024, 1, d, 12, 0, 0), float(v))
            for k, d, v in rows
        ]
        return spark.createDataFrame(data, ["event_type", "ts", "value"])

    def test_perfect_weekly_season_has_zero_error(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            seasonal_naive_eval,
        )

        # identical totals on day d and d+7 for two weeks of Mondays
        rows = [("a", 1, 10.0), ("a", 8, 10.0), ("a", 15, 10.0)]
        out = seasonal_naive_eval(self._events(spark, rows)).collect()
        assert len(out) == 1
        r = out[0]
        assert r["n_days"] == 2  # days 8 and 15 have a forecast
        assert r["total_abs_err_u"] == 0 and r["mae_u"] == 0

    def test_error_in_micro_units(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            seasonal_naive_eval,
        )

        # day 8 total 12.5 vs forecast 10.0 -> |err| 2.5 -> 2.5 * 2^20
        rows = [("a", 1, 10.0), ("a", 8, 12.5)]
        r = seasonal_naive_eval(self._events(spark, rows)).first()
        assert r["total_abs_err_u"] == int(2.5 * (1 << 20))
        assert r["mae_u"] == int(2.5 * (1 << 20))

    def test_days_without_lag_are_skipped(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            seasonal_naive_eval,
        )

        # gap: day 1 and day 9 — 9-7=2 has no data, nothing evaluable
        rows = [("a", 1, 5.0), ("a", 9, 7.0)]
        assert seasonal_naive_eval(self._events(spark, rows)).count() == 0

    def test_season_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.timeseries import (
            seasonal_naive_eval,
        )

        with pytest.raises(ValueError):
            seasonal_naive_eval(self._events(spark, [("a", 1, 1.0)]), season_days=0)


class TestCrossCorrelationDaily:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_planted_lead_peaks_at_lag(self, spark):
        """b is a copied two days later: ccf hits exactly 1.0 at
        lag +2 (identical paired vectors; sqrt of a perfect-square
        double is exact) and is lower everywhere else."""
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows, eid = [], 0
        counts = [3, 1, 4, 1, 5, 9, 2, 6, 5, 3, 5, 8, 9, 7, 9]
        for day, c in enumerate(counts):
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), 1, "a", 1.0)
                )
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day + 2), 1, "b", 1.0)
                )
        got = {
            r["lag"]: r["ccf"]
            for r in TS.cross_correlation_daily(
                self._mk(spark, rows), "a", "b", max_lag=3
            ).collect()
        }
        assert got[2] == 1.0
        assert all(v is None or v < 1.0
                   for l, v in got.items() if l != 2)

    def test_antisymmetry_with_swapped_sides(self, spark):
        """ccf_ab(l) == ccf_ba(−l) — the lead-lag readout is
        direction-consistent."""
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows, eid = [], 0
        for day, (ca, cb) in enumerate(
            [(3, 1), (1, 4), (4, 1), (1, 5), (5, 9), (9, 2), (2, 6)]
        ):
            for _ in range(ca):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), 1, "a", 1.0)
                )
            for _ in range(cb):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), 1, "b", 1.0)
                )
        df = self._mk(spark, rows)
        ab = {
            r["lag"]: (r["n_days"], r["ccf"])
            for r in TS.cross_correlation_daily(
                df, "a", "b", max_lag=3
            ).collect()
        }
        ba = {
            r["lag"]: (r["n_days"], r["ccf"])
            for r in TS.cross_correlation_daily(
                df, "b", "a", max_lag=3
            ).collect()
        }
        for l in range(-3, 4):
            assert ab[l] == ba[-l]

    def test_constant_side_is_null(self, spark):
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows = []
        for day in range(5):
            rows.append(
                (day * 2, d0 + dt.timedelta(days=day), 1, "a", 1.0)
            )
            rows.append(
                (day * 2 + 1, d0 + dt.timedelta(days=day), 1, "b", 1.0)
            )
        rows.append((99, d0 + dt.timedelta(days=2), 1, "b", 1.0))
        got = {
            r["lag"]: r["ccf"]
            for r in TS.cross_correlation_daily(
                self._mk(spark, rows), "a", "b", max_lag=1
            ).collect()
        }
        assert got[0] is None  # a is constant 1/day → zero variance

    def test_lag_guard(self, spark):
        with pytest.raises(ValueError):
            TS.cross_correlation_daily(
                self._mk(spark, []), "a", "b", max_lag=0
            )


class TestTheilSenDailyTrend:
    def _mk(self, spark, day_counts, typ="a"):
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows, eid = [], 0
        for day, c in enumerate(day_counts):
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), 1, typ, 1.0)
                )
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_perfect_line_recovers_slope(self, spark):
        """Counts 1,3,5,7,9 (slope 2/day): every pairwise slope is 2,
        so the median is exactly 2·2^20 micro-units."""
        df = self._mk(spark, [1, 3, 5, 7, 9])
        (r,) = TS.theil_sen_daily_trend(df).collect()
        assert r["n_pairs"] == 10
        assert r["sen_slope_micro"] == 2 * 1048576

    def test_outlier_immunity_vs_ols(self, spark):
        """A flat series with one 100× spike day: the Sen slope stays
        0 (median pairwise slope) even though OLS would tilt hard."""
        df = self._mk(spark, [2, 2, 2, 2, 200, 2, 2, 2, 2])
        (r,) = TS.theil_sen_daily_trend(df).collect()
        assert r["sen_slope_micro"] == 0

    def test_negative_trend_truncation_matches(self, spark):
        """Decaying counts: slope −3/2 per day on some pairs — the
        micro value uses TRUNCATING div on a negative numerator, same
        as the SQL twin (−3·2^20/2 → −1572864)."""
        df = self._mk(spark, [7, 4, 1])
        (r,) = TS.theil_sen_daily_trend(df).collect()
        # pairwise slopes: (4-7)/1=-3, (1-7)/2=-3, (1-4)/1=-3 → median -3
        assert r["n_pairs"] == 3
        assert r["sen_slope_micro"] == -3 * 1048576

    def test_zero_filled_gap_days_count(self, spark):
        """A day with no events is a real 0 in the grid, not a hole:
        3-day span with counts 2,0,2 → slopes 0-2=-2, 0, +2 → median 0."""
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows = []
        for eid, day in [(1, 0), (2, 0), (3, 2), (4, 2)]:
            rows.append(
                (eid, d0 + dt.timedelta(days=day), 1, "a", 1.0)
            )
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        (r,) = TS.theil_sen_daily_trend(df).collect()
        assert r["n_pairs"] == 3
        assert r["sen_slope_micro"] == 0


class TestHoltLinearDaily:
    def _mk(self, spark, day_counts):
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows, eid = [], 0
        for day, c in enumerate(day_counts):
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), 1, "a", 1.0)
                )
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_perfect_line_tracked_exactly(self, spark):
        """x_t = 5 + 3t: with l0 = x0, b0 = 3 the one-step forecast is
        always exact — zero error, level = x_t·2^20, trend = 3·2^20 at
        every step (the recurrence fixed point)."""
        q = 1 << 20
        df = self._mk(spark, [5, 8, 11, 14, 17])
        rows = TS.holt_linear_daily(df).orderBy("day_index").collect()
        assert len(rows) == 4
        for r in rows:
            assert r["onestep_err_micro"] == 0
            assert r["level_micro"] == r["n_events"] * q
            assert r["trend_micro"] == 3 * q

    def test_step_change_error_and_decay(self, spark):
        """Flat 10/day then a jump to 50: the jump day's one-step error
        is exactly 40·2^20, and the trend turns positive after it."""
        q = 1 << 20
        df = self._mk(spark, [10, 10, 10, 50, 50])
        rows = {
            r["day_index"]: r
            for r in TS.holt_linear_daily(df).collect()
        }
        assert rows[1]["onestep_err_micro"] == 0
        assert rows[3]["onestep_err_micro"] == 40 * q
        assert rows[3]["trend_micro"] > 0

    def test_oracle_parity_with_negative_trend(self, spark):
        """Decaying counts force negative trend state — truncating div
        on both sides must agree sign-for-sign with the recursive-CTE
        twin."""
        import duckdb

        from inception_eventstore_spark.plans.queries import _holt_oracle

        counts = [40, 25, 13, 7, 3, 2, 1, 0, 0, 1]
        df = self._mk(spark, counts)
        got = [
            tuple(r)
            for r in TS.holt_linear_daily(df)
            .orderBy("day_index")
            .collect()
        ]
        con = duckdb.connect()
        vals = []
        eid = 0
        import datetime as dt

        d0 = dt.date(2024, 3, 1)
        for day, c in enumerate(counts):
            for _ in range(c):
                eid += 1
                vals.append(
                    f"(TIMESTAMP '{d0 + dt.timedelta(days=day)} 00:00:00')"
                )
        con.execute(
            "CREATE TABLE events AS SELECT * FROM (VALUES "
            + ", ".join(vals) + ") v(ts)"
        )
        want = [tuple(r) for r in con.sql(_holt_oracle()).fetchall()]
        assert got == want

    def test_needs_two_days(self, spark):
        with pytest.raises(ValueError):
            TS.holt_linear_daily(self._mk(spark, [3]))


class TestMadOutlierDays:
    def _mk(self, spark, day_counts, typ="a"):
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows, eid = [], 0
        for day, c in enumerate(day_counts):
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), 1, typ, 1.0)
                )
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_planted_spike_flagged(self, spark):
        """Stable ~10/day with one 100-count day: med 10, MAD small,
        the spike is the only flag."""
        import datetime as dt

        counts = [10, 11, 9, 10, 100, 10, 11, 9, 10, 10, 11]
        df = self._mk(spark, counts)
        rows = TS.mad_outlier_days(df).collect()
        assert len(rows) == 1
        r = rows[0]
        assert r["day"] == dt.date(2024, 3, 5)
        assert r["x"] == 100 and r["med"] == 10

    def test_quiet_series_unflagged(self, spark):
        # spread keeps MAD ≥ 1 (half the days at the median would
        # zero it out); max dev 3 < 3.5·MAD → nothing flags
        df = self._mk(spark, [10, 12, 9, 10, 13, 8, 11, 10])
        assert TS.mad_outlier_days(df).count() == 0

    def test_mad_zero_degenerates_to_any_deviation(self, spark):
        """Over half the days identical → MAD 0: any deviating day
        flags (the documented MAD caveat)."""
        df = self._mk(spark, [5, 5, 5, 5, 5, 6, 5, 5])
        rows = TS.mad_outlier_days(df).collect()
        assert [(r["x"], r["mad"]) for r in rows] == [(6, 0)]

    def test_zero_filled_gap_day_can_flag(self, spark):
        """A silent day is a real 0 — far from a ~20 median it flags."""
        import datetime as dt

        counts = [20, 21, 19, 20, 0, 20, 21, 19, 20]
        df = self._mk(spark, counts)
        days = [r["day"] for r in TS.mad_outlier_days(df).collect()]
        assert days == [dt.date(2024, 3, 5)]


class TestDispersionReport:
    def _mk(self, spark, day_counts, typ="a"):
        import datetime as dt

        d0 = dt.datetime(2024, 3, 1)
        rows, eid = [], 0
        for day, c in enumerate(day_counts):
            for _ in range(c):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), 1, typ, 1.0)
                )
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_constant_series_vmr_zero(self, spark):
        (r,) = TS.dispersion_report(self._mk(spark, [5, 5, 5, 5])).collect()
        assert r["mean_per_day"] == 5.0 and r["vmr"] == 0.0

    def test_hand_computed_vmr(self, spark):
        """Counts 2, 6: mean 4, sample var ((2-4)²+(6-4)²)/1 = 8,
        VMR = 2.0 exactly."""
        (r,) = TS.dispersion_report(self._mk(spark, [2, 6])).collect()
        assert (r["n_days"], r["sx"], r["sxx"]) == (2, 8, 40)
        assert r["mean_per_day"] == 4.0 and r["vmr"] == 2.0

    def test_burst_raises_vmr_above_one(self, spark):
        steady = TS.dispersion_report(
            self._mk(spark, [4, 5, 4, 5, 4, 5])
        ).first()["vmr"]
        bursty = TS.dispersion_report(
            self._mk(spark, [0, 0, 13, 0, 0, 14])
        ).first()["vmr"]
        assert steady < 1.0 < bursty


class TestMannKendall:
    def test_monotone_series_max_s(self, spark):
        """Strictly increasing daily counts → S = n(n−1)/2, no ties."""
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            mann_kendall_daily,
        )

        rows = []
        for d in range(8):
            for j in range(d + 1):  # 1, 2, ..., 8 events per day
                rows.append(
                    ("t", dt.datetime(2024, 2, 1 + d, 10, j, 0))
                )
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        r = mann_kendall_daily(df).first()
        assert r["n_days"] == 8
        assert r["s_stat"] == 8 * 7 // 2
        assert r["var_num18"] == 8 * 7 * 21  # no ties
        assert r["z_mk"] > 2

    def test_flat_series_zero(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            mann_kendall_daily,
        )

        rows = [
            ("t", dt.datetime(2024, 2, 1 + d, 10, 0, 0)) for d in range(6)
        ]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        r = mann_kendall_daily(df).first()
        assert r["s_stat"] == 0 and r["z_mk"] == 0.0

    def test_span_guard(self, spark):
        import datetime as dt

        import pytest as _pt

        from inception_eventstore_spark.operators.timeseries import (
            mann_kendall_daily,
            theil_sen_daily_trend,
        )

        rows = [
            ("t", dt.datetime(2014, 1, 1, 0, 0, 0)),
            ("t", dt.datetime(2024, 1, 1, 0, 0, 0)),
        ]
        df = spark.createDataFrame(rows, "event_type string, ts timestamp")
        with _pt.raises(ValueError, match="max_span_days"):
            mann_kendall_daily(df)
        with _pt.raises(ValueError, match="max_span_days"):
            theil_sen_daily_trend(df)
