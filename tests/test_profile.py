"""Tests for the one-pass table profiler (operators/profile.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from inception_eventstore_spark.operators.profile import profile_table


class TestProfileTable:
    def _df(self, spark):
        return spark.createDataFrame(
            [
                Row(k=1, s="ab", v=2.5, t=dt.datetime(2024, 1, 1)),
                Row(k=2, s=None, v=-1.5, t=dt.datetime(2024, 6, 1)),
                Row(k=2, s="abcd", v=None, t=None),
            ],
            "k long, s string, v double, t timestamp",
        )

    def test_exact_profile(self, spark):
        got = {r.col_name: r for r in profile_table(self._df(spark)).collect()}
        assert set(got) == {"k", "s", "v", "t"}
        k = got["k"]
        assert (k.n_nulls, k.n_distinct, k.num_min, k.num_max) == (0, 2, 1.0, 2.0)
        assert k.avg_len is None
        s = got["s"]
        assert (s.n_nulls, s.n_distinct) == (1, 2)
        assert s.num_min is None and s.avg_len == pytest.approx(3.0)
        v = got["v"]
        assert (v.n_nulls, v.num_min, v.num_max) == (1, -1.5, 2.5)
        t = got["t"]
        assert t.n_nulls == 1
        micros = int(dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc).timestamp() * 1e6)
        assert t.num_min == pytest.approx(float(micros))

    def test_approx_mode_runs(self, spark):
        got = {r.col_name: r
               for r in profile_table(self._df(spark), approx=True).collect()}
        # HLL at this cardinality is exact in practice; ranges unchanged
        assert got["k"].n_distinct == 2
        assert got["v"].num_max == 2.5

    def test_empty_table(self, spark):
        empty = spark.createDataFrame([], "a long, b string")
        got = {r.col_name: r for r in profile_table(empty).collect()}
        assert got["a"].n_nulls == 0 and got["a"].n_distinct == 0
        assert got["a"].num_min is None and got["b"].avg_len is None


class TestPopulationStability:
    def test_identical_distributions_near_zero(self, spark):
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.profile import (
            population_stability,
        )

        df = spark.range(2000).select(
            (F.col("id") % 97 * 0.37).alias("value")
        )
        out = population_stability(df, df, "value", bins=10)
        rows = out.collect()
        assert len(rows) == 10
        psi = sum(r["psi_term"] for r in rows)
        assert abs(psi) < 1e-9  # same sample → exactly stable
        assert abs(sum(r["ref_share"] for r in rows) - 1.0) < 1e-4

    def test_shifted_distribution_flags(self, spark):
        import random

        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.profile import (
            population_stability,
        )

        rng = random.Random(3)
        ref = spark.createDataFrame(
            [(rng.gauss(0, 1),) for _ in range(3000)], ["value"]
        )
        cur = spark.createDataFrame(
            [(rng.gauss(1.0, 1),) for _ in range(3000)], ["value"]
        )
        psi = sum(
            r["psi_term"]
            for r in population_stability(ref, cur, "value").collect()
        )
        assert psi > 0.25  # a full-σ mean shift is actionable drift

    def test_empty_bucket_smoothed(self, spark):
        from inception_eventstore_spark.operators.profile import (
            population_stability,
        )

        ref = spark.createDataFrame([(float(i),) for i in range(100)],
                                    ["value"])
        cur = spark.createDataFrame([(0.5,)] * 50, ["value"])
        rows = population_stability(ref, cur, "value", bins=5).collect()
        # all cur mass in bucket 0; other buckets stay finite
        assert all(abs(r["psi_term"]) < 1e9 for r in rows)
        assert rows[0]["cur_share"] > 0.9

    def test_guard(self, spark):
        from inception_eventstore_spark.operators.profile import (
            population_stability,
        )

        df = spark.createDataFrame([(1.0,)], ["value"])
        import pytest as _pt

        with _pt.raises(ValueError):
            population_stability(df, df, "value", bins=1)


class TestKsStatistic:
    def test_scipy_free_reference(self, spark):
        import random

        from inception_eventstore_spark.operators.profile import ks_statistic

        rng = random.Random(7)
        a = [rng.gauss(0, 1) for _ in range(400)]
        b = [rng.gauss(0.5, 1) for _ in range(300)]
        ra = spark.createDataFrame([(x,) for x in a], ["value"])
        rb = spark.createDataFrame([(x,) for x in b], ["value"])
        got = ks_statistic(ra, rb).collect()[0]

        # plain-python exact KS over jump points
        import bisect

        sa, sb = sorted(a), sorted(b)
        d = 0.0
        for x in sorted(set(a) | set(b)):
            fa = bisect.bisect_right(sa, x) / len(sa)
            fb = bisect.bisect_right(sb, x) / len(sb)
            d = max(d, abs(fa - fb))
        assert (got["n_ref"], got["n_cur"]) == (400, 300)
        assert got["ks"] == round(d, 6)
        assert got["ks"] > 0.15  # half-σ shift is clearly visible

    def test_identical_samples_zero(self, spark):
        from inception_eventstore_spark.operators.profile import ks_statistic

        df = spark.createDataFrame([(float(i % 13),) for i in range(100)],
                                   ["value"])
        assert ks_statistic(df, df).collect()[0]["ks"] == 0.0

    def test_ties_across_samples(self, spark):
        from inception_eventstore_spark.operators.profile import ks_statistic

        # identical tied values on both sides → KS exactly 0 even
        # though every value is a tie (peer-inclusive frame)
        a = spark.createDataFrame([(1.0,), (1.0,), (2.0,)], ["value"])
        assert ks_statistic(a, a).collect()[0]["ks"] == 0.0
        # disjoint point masses → KS = 1
        b = spark.createDataFrame([(9.0,), (9.0,)], ["value"])
        assert ks_statistic(a, b).collect()[0]["ks"] == 1.0


class TestWeightedMedian:
    def test_hand_computed(self, spark):
        from inception_eventstore_spark.operators.profile import (
            weighted_median,
        )

        rows = [("a", 1.0, 1), ("a", 2.0, 1), ("a", 3.0, 10),
                ("b", 5.0, 2), ("b", 7.0, 1), ("b", -1.0, None),
                ("b", 9.0, 0)]
        df = spark.createDataFrame(rows, "g string, v double, w int")
        got = {r["g"]: (r["total_weight"], r["weighted_median"])
               for r in weighted_median(df, "v", "w", "g").collect()}
        # a: weight mass 12, half=6 → first v with cum≥6 is 3.0
        # b: only positive weights count (5.0:2, 7.0:1) → median 5.0
        assert got == {"a": (12.0, 3.0), "b": (3.0, 5.0)}

    def test_equal_weights_match_lower_median(self, spark):
        from inception_eventstore_spark.operators.profile import (
            weighted_median,
        )

        vals = [3.0, 1.0, 4.0, 1.0, 5.0, 9.0]
        df = spark.createDataFrame([(v, 1) for v in vals], "v double, w int")
        got = weighted_median(df, "v", "w").collect()[0]
        assert got["weighted_median"] == sorted(vals)[len(vals) // 2 - 1]


class TestPsiTimeline:
    def test_baseline_zero_and_drift_detected(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.profile import psi_timeline

        rows = []
        # day 1 baseline: values 0..999; day 2 same distribution;
        # day 3 shifted by +500 (real drift)
        for i in range(1000):
            rows.append((dt.datetime(2024, 1, 1, 12, 0, i % 60, i), float(i)))
            rows.append((dt.datetime(2024, 1, 2, 12, 0, i % 60, i), float(i)))
            rows.append(
                (dt.datetime(2024, 1, 3, 12, 0, i % 60, i), float(i) + 500.0)
            )
        df = spark.createDataFrame(rows, "ts timestamp, value double")
        out = {r["period"]: r for r in psi_timeline(df).collect()}
        assert out["2024-01-01"]["psi"] == 0.0
        assert abs(out["2024-01-02"]["psi"]) < 0.01
        assert out["2024-01-03"]["psi"] > 0.25  # action threshold
        assert all(r["n_ref"] == 1000 for r in out.values())

    def test_empty_raises(self, spark):
        from inception_eventstore_spark.operators.profile import psi_timeline

        df = spark.createDataFrame([], "ts timestamp, value double")
        import pytest as _pytest

        with _pytest.raises(ValueError):
            psi_timeline(df)


class TestRfmSegments:
    def _events(self, spark, rows):
        import datetime as dt

        data = [
            (u, dt.datetime(2024, 1, d, 12, 0, 0), float(v))
            for u, d, v in rows
        ]
        return spark.createDataFrame(data, ["user_id", "ts", "value"])

    def test_scores_and_label(self, spark):
        from inception_eventstore_spark.operators.profile import (
            rfm_segments,
        )

        # five users with strictly increasing activity on every axis:
        # user i has i events on day i with value 10*i each
        rows = []
        for u in range(1, 6):
            rows += [(u, u, 10.0 * u)] * u
        out = {
            r["user_id"]: r
            for r in rfm_segments(self._events(spark, rows)).collect()
        }
        # user 5: most recent (day 5 == anchor), most frequent, top spend
        assert out[5]["r_score"] == 5
        assert out[5]["f_score"] == 5 and out[5]["m_score"] == 5
        assert out[5]["rfm"] == "555"
        # user 1: oldest, least frequent, least spend
        assert out[1]["r_score"] == 1
        assert out[1]["f_score"] == 1 and out[1]["m_score"] == 1
        assert out[1]["recency_days"] == 4
        # monotone scores along the construction
        for axis in ("f_score", "m_score"):
            vals = [out[u][axis] for u in range(1, 6)]
            assert vals == sorted(vals)

    def test_single_user_all_mid(self, spark):
        from inception_eventstore_spark.operators.profile import (
            rfm_segments,
        )

        r = rfm_segments(self._events(spark, [(7, 3, 5.0)])).first()
        # one user: every metric equals every edge -> never above ->
        # F/M floor at 1, R mirrors to 5 (most recent by definition)
        assert (r["r_score"], r["f_score"], r["m_score"]) == (5, 1, 1)
        assert r["recency_days"] == 0


class TestAucReport:
    def _df(self, spark, scored):
        # scored: list of (score, is_pos)
        return spark.createDataFrame(
            [(float(s), bool(p)) for s, p in scored], ["score", "pos"]
        )

    def test_perfect_separation(self, spark):
        from inception_eventstore_spark.operators.profile import auc_report

        df = self._df(
            spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
        )
        r = auc_report(df, "score", F.col("pos")).first()
        assert (r["n_pos"], r["n_neg"], r["auc"]) == (2, 2, 1.0)

    def test_hand_computed_with_ties(self, spark):
        from inception_eventstore_spark.operators.profile import auc_report

        # pos scores [3, 2], neg scores [2, 1]:
        # pairs: (3,2)win (3,1)win (2,2)tie (2,1)win -> U = 3.5, AUC = 0.875
        df = self._df(spark, [(3, 1), (2, 1), (2, 0), (1, 0)])
        r = auc_report(df, "score", F.col("pos")).first()
        assert r["auc"] == 0.875

    def test_reversed_score_is_complement(self, spark):
        from inception_eventstore_spark.operators.profile import auc_report

        scored = [(3, 1), (2, 1), (2, 0), (1, 0)]
        df = self._df(spark, scored).withColumn(
            "neg_score", -F.col("score")
        )
        r = auc_report(df, "neg_score", F.col("pos")).first()
        assert r["auc"] == 0.125  # 1 - 0.875

    def test_empty_class_null(self, spark):
        from inception_eventstore_spark.operators.profile import auc_report

        df = self._df(spark, [(1.0, 1), (2.0, 1)])
        r = auc_report(df, "score", F.col("pos")).first()
        assert r["n_neg"] == 0 and r["auc"] is None

    def test_random_matches_naive(self, spark):
        import random

        from inception_eventstore_spark.operators.profile import auc_report

        rng = random.Random(7)
        scored = [
            (round(rng.random(), 2), rng.random() < 0.4)
            for _ in range(200)
        ]
        pos = [s for s, p in scored if p]
        neg = [s for s, p in scored if not p]
        u = sum(
            1.0 if a > b else (0.5 if a == b else 0.0)
            for a in pos
            for b in neg
        )
        expected = round(u / (len(pos) * len(neg)), 6)
        r = auc_report(
            self._df(spark, scored), "score", F.col("pos"), num_shards=7
        ).first()
        assert r["auc"] == expected


class TestKeySkewProfile:
    def test_exact_ppm_arithmetic(self, spark):
        from inception_eventstore_spark.operators.profile import (
            key_skew_profile,
        )

        # 4 keys: a=60, b=20, c=15, d=5 (total 100, avg 25)
        rows = (
            [("a",)] * 60 + [("b",)] * 20 + [("c",)] * 15 + [("d",)] * 5
        )
        df = spark.createDataFrame(rows, ["k"])
        out = {
            r["rank"]: r
            for r in key_skew_profile(df, "k", top=3).collect()
        }
        assert [out[i]["key"] for i in (1, 2, 3)] == ["a", "b", "c"]
        a = out[1]
        assert a["cnt"] == 60 and a["n_keys"] == 4 and a["total"] == 100
        assert a["share_ppm"] == 600_000
        # 60 / (100/4) = 2.4x the uniform load
        assert a["skew_ppm"] == 2_400_000
        assert out[2]["skew_ppm"] == 800_000

    def test_tie_breaks_lexically(self, spark):
        from inception_eventstore_spark.operators.profile import (
            key_skew_profile,
        )

        df = spark.createDataFrame(
            [("z",), ("z",), ("a",), ("a",)], ["k"]
        )
        out = key_skew_profile(df, "k", top=2).orderBy("rank").collect()
        assert [r["key"] for r in out] == ["a", "z"]
        assert all(r["skew_ppm"] == 1_000_000 for r in out)


class TestScorePercentiles:
    def test_exact_percentiles_with_ties(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            score_percentiles,
        )

        # scores: 1.0 x2, 2.0 x3, 5.0 x5  (total 10)
        rows = (
            [(i, 1.0) for i in range(2)]
            + [(10 + i, 2.0) for i in range(3)]
            + [(20 + i, 5.0) for i in range(5)]
        )
        df = spark.createDataFrame(rows, ["doc_id", "s"])
        out = {r["doc_id"]: r for r in
               score_percentiles(df, "s").collect()}
        assert (out[0]["below_ppm"], out[0]["cdf_ppm"]) == (0, 200_000)
        assert (out[11]["below_ppm"], out[11]["cdf_ppm"]) == (
            200_000, 500_000)
        assert (out[24]["below_ppm"], out[24]["cdf_ppm"]) == (
            500_000, 1_000_000)

    def test_nulls_excluded_and_rows_preserved(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            score_percentiles,
        )

        df = spark.createDataFrame(
            [(1, 3.0), (2, None), (3, 4.0)], ["doc_id", "s"]
        )
        out = score_percentiles(df, "s").collect()
        assert {r["doc_id"] for r in out} == {1, 3}
        assert all(r["cdf_ppm"] <= 1_000_000 for r in out)

    def test_matches_sequential_window(self, spark):
        import random

        from inception_eventstore_spark.operators.scoring import (
            score_percentiles,
        )

        rng = random.Random(3)
        rows = [(i, float(rng.randint(0, 50))) for i in range(400)]
        df = spark.createDataFrame(rows, ["doc_id", "s"])
        got = {r["doc_id"]: (r["below_ppm"], r["cdf_ppm"])
               for r in score_percentiles(df, "s", num_shards=7).collect()}
        svals = sorted(v for _, v in rows)
        for i, v in rows:
            below = sum(1 for x in svals if x < v)
            at_or_below = sum(1 for x in svals if x <= v)
            assert got[i] == (
                below * 1_000_000 // 400, at_or_below * 1_000_000 // 400
            )


class TestJensenShannonDrift:
    def test_identical_distributions_zero(self, spark):
        from inception_eventstore_spark.operators.profile import (
            jensen_shannon_drift,
        )

        df = spark.createDataFrame(
            [(float(i % 100),) for i in range(1000)], ["value"]
        )
        out = jensen_shannon_drift(df, df, "value", bins=5).collect()
        assert len(out) == 5
        assert all(abs(r["js_term"]) < 1e-9 for r in out)

    def test_total_bounded_by_ln2_under_disjoint_supports(self, spark):
        import math

        from inception_eventstore_spark.operators.profile import (
            jensen_shannon_drift,
        )

        ref = spark.createDataFrame(
            [(float(i % 10),) for i in range(500)], ["value"]
        )
        cur = spark.createDataFrame(
            [(1000.0 + i % 10,) for i in range(500)], ["value"]
        )
        total = sum(
            r["js_term"]
            for r in jensen_shannon_drift(ref, cur, "value").collect()
        )
        # catastrophic drift saturates near ln 2 but never exceeds it
        assert 0.5 < total <= math.log(2) + 1e-9

    def test_matches_hand_computation(self, spark):
        import math

        from inception_eventstore_spark.operators.profile import (
            jensen_shannon_drift,
        )

        # 2 bins: ref all below the median edge, cur 50/50
        ref = spark.createDataFrame(
            [(1.0,), (2.0,), (3.0,), (4.0,)], ["value"]
        )
        cur = spark.createDataFrame(
            [(1.0,), (2.0,), (9.0,), (9.0,)], ["value"]
        )
        out = {r["bin"]: r for r in
               jensen_shannon_drift(ref, cur, "value", bins=2).collect()}
        # ref edge = median 2.5 -> ref bins (2,2), cur bins (2,2)... compute
        # shares with alpha=.5: p=(n+.5)/(tot+1)
        for b in (0, 1):
            p = (2 + 0.5) / (4 + 1.0)
            q = (out[b]["cur_share"])
            m = (out[b]["ref_share"] + q) / 2
            want = 0.5 * out[b]["ref_share"] * math.log(
                out[b]["ref_share"] / m
            ) + 0.5 * q * math.log(q / m)
            assert out[b]["ref_share"] == pytest.approx(p, abs=1e-6)
            assert out[b]["js_term"] == pytest.approx(want, abs=1e-6)


class TestInterarrivalBurstiness:
    def _ev(self, spark, rows):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        data = [
            (u, t0 + dt.timedelta(seconds=s)) for u, s in rows
        ]
        return spark.createDataFrame(data, "user_id long, ts timestamp")

    def test_metronome_is_minus_one(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            interarrival_burstiness,
        )

        ev = self._ev(spark, [(1, 10 * i) for i in range(6)])
        row = interarrival_burstiness(ev).first()
        assert row["n_gaps"] == 5
        assert row["mean_gap_s"] == 10.0
        assert row["cv"] == 0.0 and row["burstiness"] == -1.0

    def test_bursty_pattern_positive(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            interarrival_burstiness,
        )

        # gaps: 1,1,1,1,10000 -> sigma >> mu; with n gaps one extreme
        # outlier caps B at (sqrt(n-1)-1)/(sqrt(n-1)+1) = 1/3 for n=5,
        # so the pattern should sit essentially AT that cap
        secs, t = [0], 0
        for g in [1, 1, 1, 1, 10000]:
            t += g
            secs.append(t)
        ev = self._ev(spark, [(1, s) for s in secs])
        row = interarrival_burstiness(ev).first()
        assert row["burstiness"] == pytest.approx(1 / 3, abs=2e-3)

    def test_min_gaps_excludes_short_histories(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            interarrival_burstiness,
        )

        ev = self._ev(spark, [(1, 0), (1, 5), (2, 0), (2, 1), (2, 9)])
        out = {r["user_id"] for r in
               interarrival_burstiness(ev, min_gaps=2).collect()}
        assert out == {2}

    def test_moments_match_python(self, spark):
        import math
        import random

        from inception_eventstore_spark.operators.timeseries import (
            interarrival_burstiness,
        )

        rng = random.Random(5)
        secs, t = [0], 0
        gaps = []
        for _ in range(30):
            g = rng.randint(1, 500)
            gaps.append(g * 1e6)
            t += g
            secs.append(t)
        ev = self._ev(spark, [(1, s) for s in secs])
        row = interarrival_burstiness(ev).first()
        mu = sum(gaps) / len(gaps)
        var = sum(g * g for g in gaps) / len(gaps) - mu * mu
        sig = math.sqrt(max(var, 0.0))
        assert row["burstiness"] == pytest.approx(
            (sig - mu) / (sig + mu), abs=1e-6
        )
        assert row["cv"] == pytest.approx(sig / mu, abs=1e-6)


class TestOutOfOrderReport:
    def _ev(self, spark, rows):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(e, u, t0 + dt.timedelta(seconds=s)) for e, u, s in rows],
            "event_id long, user_id long, ts timestamp",
        )

    def test_counts_and_max_lateness(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            out_of_order_report,
        )

        # arrival order 1..5; event times 0,100,40,200,190
        rows = [(1, 7, 0), (2, 7, 100), (3, 7, 40), (4, 7, 200),
                (5, 7, 190)]
        r = out_of_order_report(self._ev(spark, rows)).first()
        assert r["n_events"] == 5 and r["n_late"] == 2
        assert r["late_ppm"] == 2 * 1_000_000 // 5
        assert r["max_lateness_s"] == 60.0  # hwm 100 vs event 40

    def test_monotone_stream_has_zero_late(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            out_of_order_report,
        )

        rows = [(i, 1, 10 * i) for i in range(1, 8)]
        r = out_of_order_report(self._ev(spark, rows)).first()
        assert r["n_late"] == 0 and r["max_lateness_s"] == 0.0

    def test_keys_independent(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            out_of_order_report,
        )

        # user 1 in order; user 2's 2nd arrival is 5s behind
        rows = [(1, 1, 0), (2, 2, 50), (3, 1, 10), (4, 2, 45)]
        out = {r["user_id"]: r for r in
               out_of_order_report(self._ev(spark, rows)).collect()}
        assert out[1]["n_late"] == 0
        assert out[2]["n_late"] == 1 and out[2]["max_lateness_s"] == 5.0


class TestTrimmedStats:
    def test_outlier_removed_exactly(self, spark):
        from inception_eventstore_spark.operators.profile import (
            trimmed_stats,
        )

        # 20 rows: 18 at 10.00, one 0.01, one 9999.99; 5% two-sided
        # trim cuts exactly the min and max row
        rows = [(i, "a", 10.0) for i in range(18)]
        rows += [(100, "a", 0.01), (101, "a", 9999.99)]
        df = spark.createDataFrame(
            rows, "event_id long, event_type string, value double"
        )
        r = trimmed_stats(df).first()
        assert (r["n"], r["n_trimmed"]) == (20, 18)
        assert r["trimmed_mean"] == 10.0 and r["trimmed_std"] == 0.0

    def test_matches_python_on_random_values(self, spark):
        import math
        import random

        from inception_eventstore_spark.operators.profile import (
            trimmed_stats,
        )

        rng = random.Random(11)
        vals = [round(rng.uniform(0, 50), 2) for _ in range(200)]
        df = spark.createDataFrame(
            [(i, "t", v) for i, v in enumerate(vals)],
            "event_id long, event_type string, value double",
        )
        cents = sorted(round(v * 100) for v in vals)
        cut = 200 * 50_000 // 1_000_000
        kept = cents[cut:200 - cut]
        mu = sum(kept) / len(kept)
        var = sum(c * c for c in kept) / len(kept) - mu * mu
        r = trimmed_stats(df).first()
        assert r["n_trimmed"] == len(kept)
        assert r["trimmed_mean"] == pytest.approx(mu / 100, abs=1e-6)
        assert r["trimmed_std"] == pytest.approx(
            math.sqrt(max(var, 0)) / 100, abs=1e-6
        )

    def test_zero_trim_keeps_everything(self, spark):
        from inception_eventstore_spark.operators.profile import (
            trimmed_stats,
        )

        df = spark.createDataFrame(
            [(1, "a", 1.0), (2, "a", 3.0)],
            "event_id long, event_type string, value double",
        )
        r = trimmed_stats(df, trim_ppm=0).first()
        assert r["n_trimmed"] == 2 and r["trimmed_mean"] == 2.0

    def test_trim_guard(self, spark):
        from inception_eventstore_spark.operators.profile import (
            trimmed_stats,
        )

        df = spark.createDataFrame(
            [(1, "a", 1.0)],
            "event_id long, event_type string, value double",
        )
        with pytest.raises(ValueError):
            trimmed_stats(df, trim_ppm=500_000)


class TestCalibrationCurve:
    def test_perfectly_calibrated_bins(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            calibration_curve,
        )

        rows = []
        # bin 2 (p=0.25): 4 rows, 1 positive; bin 7 (p=0.75): 4 rows,
        # 3 positive — gaps exactly 0
        for i in range(4):
            rows.append((i, 0.25, 1 if i == 0 else 0))
            rows.append((10 + i, 0.75, 0 if i == 0 else 1))
        df = spark.createDataFrame(rows, ["id", "p", "y"])
        out = {r["bin"]: r for r in
               calibration_curve(df, "p", "y", bins=10).collect()}
        assert set(out) == {2, 7}
        assert out[2]["pos_rate"] == 0.25 and out[2]["gap"] == 0.0
        assert out[7]["n_pos"] == 3 and out[7]["gap"] == 0.0

    def test_top_edge_closed(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            calibration_curve,
        )

        df = spark.createDataFrame(
            [(1, 1.0, 1), (2, 0.999999, 1)], ["id", "p", "y"]
        )
        out = calibration_curve(df, "p", "y", bins=10).collect()
        assert len(out) == 1 and out[0]["bin"] == 9 and out[0]["n"] == 2

    def test_overconfidence_shows_positive_gap(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            calibration_curve,
        )

        # model says 0.9 but only 1 of 4 is positive
        df = spark.createDataFrame(
            [(i, 0.9, 1 if i == 0 else 0) for i in range(4)],
            ["id", "p", "y"],
        )
        r = calibration_curve(df, "p", "y").first()
        assert r["gap"] == pytest.approx(0.9 - 0.25, abs=1e-6)

    def test_bins_guard(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            calibration_curve,
        )

        df = spark.createDataFrame([(1, 0.5, 1)], ["id", "p", "y"])
        with pytest.raises(ValueError):
            calibration_curve(df, "p", "y", bins=1)


class TestJoinCardinality:
    def test_exact_fanout_arithmetic(self, spark):
        from inception_eventstore_spark.operators.profile import (
            join_cardinality,
        )

        left = spark.createDataFrame(
            [(1,), (1,), (2,), (3,), (None,)], ["k"]
        )
        right = spark.createDataFrame(
            [(1,), (1,), (1,), (2,), (9,)], ["k"]
        )
        r = join_cardinality(left, right, "k").first()
        assert (r["n_left"], r["n_right"]) == (4, 5)
        assert (r["keys_left"], r["keys_right"]) == (3, 3)
        assert r["keys_common"] == 2
        # key 1: 2*3=6, key 2: 1*1=1
        assert r["join_rows"] == 7 and r["max_key_product"] == 6
        # prediction equals the executed join
        assert left.join(right, "k").count() == 7

    def test_disjoint_keys(self, spark):
        from inception_eventstore_spark.operators.profile import (
            join_cardinality,
        )

        a = spark.createDataFrame([(1,)], ["k"])
        b = spark.createDataFrame([(2,)], ["k"])
        r = join_cardinality(a, b, "k").first()
        assert r["join_rows"] == 0 and r["keys_common"] == 0
        assert r["max_key_product"] == 0


class TestDecayedCounts:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )

    def test_halflife_weights_exact(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            decayed_counts,
        )

        d = dt.datetime
        # ref day = 2024-01-29; ages 0, 7, 14 days → 0, 1, 2 half-lives
        df = self._df(
            spark,
            [
                (1, d(2024, 1, 29), "a"),
                (2, d(2024, 1, 22), "a"),
                (3, d(2024, 1, 15), "a"),
                (4, d(2024, 1, 29), "b"),
            ],
        )
        out = {
            r["event_type"]: r
            for r in decayed_counts(
                df, halflife_days=7, bits=30
            ).collect()
        }
        assert out["a"]["decayed_units"] == (1 << 30) + (1 << 29) + (1 << 28)
        assert out["a"]["n_total"] == 3
        assert out["a"]["newest_age_d"] == 0
        assert out["b"]["decayed_units"] == 1 << 30
        assert out["b"]["newest_age_d"] == 0

    def test_age_floor_one_unit(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            decayed_counts,
        )

        d = dt.datetime
        # 400 days = 57 weeks > bits=4 cap → weight floors at 1 unit
        df = self._df(
            spark, [(1, d(2024, 2, 4), "a"), (2, d(2023, 1, 1), "a")]
        )
        (r,) = decayed_counts(df, halflife_days=7, bits=4).collect()
        assert r["decayed_units"] == (1 << 4) + 1

    def test_partial_ages_floor_within_halflife(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            decayed_counts,
        )

        d = dt.datetime
        # 3 days old = 0 full half-lives → full weight
        df = self._df(
            spark, [(1, d(2024, 1, 29), "a"), (2, d(2024, 1, 26), "a")]
        )
        (r,) = decayed_counts(df, halflife_days=7, bits=10).collect()
        assert r["decayed_units"] == 2 * (1 << 10)

    def test_guards(self, spark):
        import datetime as dt

        import pytest

        from inception_eventstore_spark.operators.timeseries import (
            decayed_counts,
        )

        df = self._df(spark, [(1, dt.datetime(2024, 1, 1), "a")])
        with pytest.raises(ValueError):
            decayed_counts(df, bits=63)
        with pytest.raises(ValueError):
            decayed_counts(df, halflife_days=0)


class TestBenfordAudit:
    def test_known_digit_counts(self, spark):
        from inception_eventstore_spark.operators.profile import (
            benford_audit,
        )

        vals = [1.00, 1.50, 19.99, 2.00, 23.45, 3.00, 0.94, 900.0]
        # cents: 100,150,1999,200,2345,300,94,90000 →
        # digits: 1,1,1,2,2,3,9,9
        df = spark.createDataFrame([(v,) for v in vals], "v double")
        out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
        assert len(out) == 9
        assert out[1]["observed"] == 3
        assert out[2]["observed"] == 2
        assert out[3]["observed"] == 1
        assert out[9]["observed"] == 2
        assert out[4]["observed"] == 0
        assert out[1]["obs_ppm"] == 3 * 1000000 // 8
        assert out[1]["benford_ppm"] == 301029
        assert out[9]["benford_ppm"] == 45757

    def test_nonpositive_and_null_excluded(self, spark):
        from inception_eventstore_spark.operators.profile import (
            benford_audit,
        )

        df = spark.createDataFrame(
            [(-5.0,), (0.0,), (None,), (7.0,)], "v double"
        )
        out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
        assert out[7]["observed"] == 1
        assert sum(r["observed"] for r in out.values()) == 1

    def test_power_of_ten_boundary_digit(self, spark):
        from inception_eventstore_spark.operators.profile import (
            benford_audit,
        )

        # exactly 10.00 → cents 1000 → digit 1 (the log10 trap case)
        df = spark.createDataFrame(
            [(10.0,), (100.0,), (1000.0,)], "v double"
        )
        out = {r["digit"]: r for r in benford_audit(df, "v").collect()}
        assert out[1]["observed"] == 3

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.profile import (
            benford_audit,
        )

        df = spark.createDataFrame([(1.0,)], "v double")
        with pytest.raises(ValueError):
            benford_audit(df, "v", cents_scale=0)


class TestCusumChangepoints:
    def _events(self, spark, day_counts, et="a"):
        import datetime as dt

        rows = []
        eid = 0
        d0 = dt.datetime(2024, 3, 1)
        for i, n in enumerate(day_counts):
            for _ in range(n):
                eid += 1
                rows.append((eid, d0 + dt.timedelta(days=i), et))
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )

    def test_level_shift_flags(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            cusum_changepoints,
        )

        # 8 quiet days at 2/day then 4 days at 10/day:
        # median m = 2, MAD = 0 → slack 0, h 0: any sp > 0 flags
        counts = [2] * 8 + [10] * 4
        out = sorted(
            cusum_changepoints(self._events(spark, counts)).collect(),
            key=lambda r: r["day"],
        )
        assert [r["x"] for r in out] == counts
        assert [r["flag"] for r in out[:8]] == [0] * 8
        assert [r["flag"] for r in out[8:]] == [1] * 4
        # sp accumulates (10-2) per shifted day
        assert [r["cusum_pos"] for r in out[8:]] == [8, 16, 24, 32]

    def test_mad_slack_absorbs_noise(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            cusum_changepoints,
        )

        # alternating 4/6: median 4 (lower), MAD = ... devs |4-4|=0 x3,
        # |6-4|=2 x3 → sorted [0,0,0,2,2,2], lower median (n=6 → r=3)
        # = 0 → slack 0, h 0; sp grows on every 6-day: flags appear
        counts = [4, 6, 4, 6, 4, 6]
        out = sorted(
            cusum_changepoints(self._events(spark, counts)).collect(),
            key=lambda r: r["day"],
        )
        assert out[1]["cusum_pos"] == 2 and out[1]["flag"] == 1

    def test_zero_fill_missing_days(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.timeseries import (
            cusum_changepoints,
        )

        # two types; type b only has events on the first and last day:
        # its middle days must exist with x=0
        d0 = dt.datetime(2024, 3, 1)
        rows = [(1, d0, "a"), (2, d0 + dt.timedelta(days=4), "a")]
        rows += [(3, d0, "b"), (4, d0 + dt.timedelta(days=4), "b")]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )
        out = cusum_changepoints(df).collect()
        b_days = [r for r in out if r["event_type"] == "b"]
        assert len(b_days) == 5
        assert sorted(r["x"] for r in b_days) == [0, 0, 0, 1, 1]

    def test_empty_input(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            cusum_changepoints,
        )

        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, event_type string"
        )
        assert cusum_changepoints(df).count() == 0

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.timeseries import (
            cusum_changepoints,
        )

        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, event_type string"
        )
        with pytest.raises(ValueError):
            cusum_changepoints(df, h_mult=0)


class TestAcfDaily:
    def _events(self, spark, day_counts, et="a"):
        import datetime as dt

        rows = []
        eid = 0
        d0 = dt.datetime(2024, 3, 1)
        for i, n in enumerate(day_counts):
            for _ in range(n):
                eid += 1
                rows.append((eid, d0 + dt.timedelta(days=i), et))
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, event_type string"
        )

    def test_alternating_series_acf(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            acf_daily,
        )

        # [1,3]*4: mean 2, dev ±1 → acf(1) = -7/8, acf(2) = 6/8
        out = {
            r["lag"]: r["acf"]
            for r in acf_daily(
                self._events(spark, [1, 3] * 4), max_lag=2
            ).collect()
        }
        assert out == {1: -0.875, 2: 0.75}

    def test_constant_series_dropped(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            acf_daily,
        )

        out = acf_daily(
            self._events(spark, [2, 2, 2, 2]), max_lag=2
        ).collect()
        assert out == []

    def test_weekly_cycle_peaks_at_seven(self, spark):
        from inception_eventstore_spark.operators.timeseries import (
            acf_daily,
        )

        week = [9, 1, 1, 1, 1, 1, 1]
        out = {
            r["lag"]: r["acf"]
            for r in acf_daily(
                self._events(spark, week * 5), max_lag=8
            ).collect()
        }
        assert out[7] == max(out.values())
        assert out[7] >= 0.8 and out[1] < 0.2

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.timeseries import (
            acf_daily,
        )

        with pytest.raises(ValueError):
            acf_daily(self._events(spark, [1]), max_lag=0)


class TestGiniConcentration:
    def _df(self, spark, rows):
        return spark.createDataFrame(
            rows, "g string, id long, v long"
        )

    def test_even_distribution_is_zero(self, spark):
        from inception_eventstore_spark.operators.profile import (
            gini_concentration,
        )

        df = self._df(spark, [("a", i, 10) for i in range(1, 6)])
        (r,) = gini_concentration(df, "v", "id", ["g"]).collect()
        assert r["gini"] == 0.0
        assert (r["n"], r["total"]) == (5, 50)

    def test_single_holder_approaches_one(self, spark):
        from inception_eventstore_spark.operators.profile import (
            gini_concentration,
        )

        # one id holds everything among n=10 → G = (n-1)/n = 0.9
        rows = [("a", i, 0) for i in range(1, 10)] + [("a", 10, 100)]
        (r,) = gini_concentration(
            self._df(spark, rows), "v", "id", ["g"]
        ).collect()
        assert r["gini"] == 0.9

    def test_hand_computed_mixed(self, spark):
        from inception_eventstore_spark.operators.profile import (
            gini_concentration,
        )

        # values 1,2,3,4 ascending: G = 2*(1+4+9+16)/(4*10) - 5/4 = 0.25
        rows = [("a", i, i) for i in range(1, 5)]
        (r,) = gini_concentration(
            self._df(spark, rows), "v", "id", ["g"]
        ).collect()
        assert r["gini"] == 0.25

    def test_groups_independent_and_zero_total_dropped(self, spark):
        from inception_eventstore_spark.operators.profile import (
            gini_concentration,
        )

        rows = [("a", 1, 5), ("a", 2, 5), ("b", 3, 0), ("b", 4, 0)]
        out = gini_concentration(
            self._df(spark, rows), "v", "id", ["g"]
        ).collect()
        assert [(r["g"], r["gini"]) for r in out] == [("a", 0.0)]

    def test_integer_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.profile import (
            gini_concentration,
        )

        df = spark.createDataFrame([("a", 1, 1.5)], "g string, id long, v double")
        with pytest.raises(TypeError):
            gini_concentration(df, "v", "id", ["g"])


class TestWoeIv:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, p double, y int")

    def test_hand_computed_two_bins(self, spark):
        import math

        from inception_eventstore_spark.operators.scoring import woe_iv

        # bin 0 (p<0.5): 1 pos, 3 neg; bin 1: 3 pos, 1 neg; P=N=4
        rows = (
            [(i, 0.2, 0) for i in range(3)]
            + [(3, 0.2, 1)]
            + [(i, 0.8, 1) for i in range(4, 7)]
            + [(7, 0.8, 0)]
        )
        out = {
            r["bin"]: r
            for r in woe_iv(
                self._df(spark, rows), "p", "y", bins=2
            ).collect()
        }
        gs0, bs0 = 1.5 / 4, 3.5 / 4
        assert out[0]["woe"] == round(math.log(gs0 / bs0), 6)
        assert out[0]["iv_term"] == round(
            (gs0 - bs0) * math.log(gs0 / bs0), 6
        )
        assert (out[0]["n"], out[0]["n_pos"], out[0]["n_neg"]) == (4, 1, 3)
        # symmetric bins → equal-magnitude opposite woe
        assert out[1]["woe"] == -out[0]["woe"]
        # iv terms are always non-negative
        assert out[0]["iv_term"] > 0 and out[1]["iv_term"] > 0

    def test_empty_side_smoothed_finite(self, spark):
        from inception_eventstore_spark.operators.scoring import woe_iv

        rows = [(1, 0.9, 1), (2, 0.95, 1), (3, 0.1, 0)]
        out = woe_iv(self._df(spark, rows), "p", "y", bins=2).collect()
        assert all(abs(r["woe"]) < 100 for r in out)

    def test_guard(self, spark):
        import pytest

        from inception_eventstore_spark.operators.scoring import woe_iv

        with pytest.raises(ValueError):
            woe_iv(self._df(spark, [(1, 0.5, 1)]), "p", "y", bins=1)


class TestDidEstimate:
    def test_hand_computed_effect(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.profile import (
            did_estimate,
        )

        # 10-day span: split = day 5; pre = days 0-5, post = days 6-10.
        # control (even users): 10.0 pre, 11.0 post (+1 trend)
        # treated (odd users): 20.0 pre, 24.0 post (+4) → DiD = 3.0
        d0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day, post in [(0, False), (10, True)]:
            for u, v in [(2, 10.0), (1, 20.0)]:
                vv = v + (1.0 if post and u == 2 else 0.0) + (
                    4.0 if post and u == 1 else 0.0
                )
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), u, "e", vv)
                )
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        (r,) = did_estimate(df).collect()
        assert (r["mean_c_pre"], r["mean_c_post"]) == (10.0, 11.0)
        assert (r["mean_t_pre"], r["mean_t_post"]) == (20.0, 24.0)
        assert r["did"] == 3.0
        assert r["n_c_pre"] == 1 and r["n_t_post"] == 1

    def test_parallel_trends_give_zero(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.profile import (
            did_estimate,
        )

        d0 = dt.datetime(2024, 1, 1)
        rows = []
        eid = 0
        for day in (0, 8):
            bump = 2.0 if day > 4 else 0.0
            for u in (1, 2, 3, 4):
                eid += 1
                rows.append(
                    (eid, d0 + dt.timedelta(days=day), u, "e",
                     5.0 + u + bump)
                )
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        (r,) = did_estimate(df).collect()
        assert r["did"] == 0.0

    def test_guards(self, spark):
        import pytest

        from inception_eventstore_spark.operators.profile import (
            did_estimate,
        )

        df = spark.createDataFrame(
            [], "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )
        with pytest.raises(ValueError):
            did_estimate(df, n_buckets=1)
        with pytest.raises(ValueError):
            did_estimate(df, treat_bucket=5)


class TestLabelNoiseCounts:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "id long, p double, y int")

    def test_planted_flip_detected(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            label_noise_counts,
        )

        # class 1: p ≈ 0.9 (t1 mean = 0.85); class 0: p ≈ 0.1
        # (t0 on 1-p: mean 0.85). One y=0 row with p=0.95 clears t1
        # → suggested 1.
        rows = [
            (1, 0.9, 1), (2, 0.8, 1),
            (3, 0.1, 0), (4, 0.2, 0), (5, 0.95, 0),
        ]
        got = {
            (r["given"], r["suggested"]): r
            for r in label_noise_counts(
                self._df(spark, rows), "p", "y"
            ).collect()
        }
        assert got[(0, 1)]["n"] == 1
        assert got[(0, 1)]["share_ppm"] == 1000000 // 5
        # clean rows stay on the diagonal
        assert got[(0, 0)]["n"] == 2
        # (1,1): p=0.9 > t1-mean only for 0.9 (0.9·2 > 1.7 true) —
        # confidently 1, stays 1; 0.8 falls back to its given label
        assert got[(1, 1)]["n"] == 2

    def test_boundary_at_exact_mean_not_flipped(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            label_noise_counts,
        )

        # y=0 row with p exactly equal to t1 (strict >) stays 0
        rows = [(1, 0.6, 1), (2, 0.6, 0), (3, 0.1, 0)]
        got = {
            (r["given"], r["suggested"]): r["n"]
            for r in label_noise_counts(
                self._df(spark, rows), "p", "y"
            ).collect()
        }
        # t1 = 0.6; p=0.6 does NOT clear it (strict); t0 mean of 1-p
        # over y=0 = (0.4+0.9)/2 = 0.65; row 2's 1-p = 0.4 ≤ 0.65 →
        # keeps label 0
        assert got.get((0, 1), 0) == 0


class TestCupedAdjustment:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_removes_covariate_imbalance(self, spark):
        """Outcome = own pre-period level + effect·treat. Arms have
        imbalanced pre-period baselines, so the raw diff is biased by
        the imbalance; CUPED (theta = 1 here by construction) removes
        it exactly and recovers the true effect."""
        import datetime as dt

        from inception_eventstore_spark.operators.profile import (
            cuped_adjustment,
        )

        d0 = dt.datetime(2024, 1, 1)
        rows, eid = [], 0
        # users 1..8; odd = treated. Pre level varies per user and is
        # deliberately higher for treated (imbalance +3 on average).
        pre = {1: 10.0, 3: 12.0, 5: 14.0, 7: 16.0,
               2: 8.0, 4: 10.0, 6: 11.0, 8: 11.0}
        effect = 2.0
        for u, x in pre.items():
            eid += 1
            rows.append((eid, d0, u, "e", x))
            y = x + (effect if u % 2 == 1 else 0.0)
            eid += 1
            rows.append((eid, d0 + dt.timedelta(days=10), u, "e", y))
        (r,) = cuped_adjustment(self._mk(spark, rows)).collect()
        assert r["n_users"] == 8 and r["n_t"] == 4 and r["n_c"] == 4
        # raw diff = effect + baseline imbalance (13-10=3)
        assert r["diff_raw"] == 5.0
        # expected theta/adjustment from the same exact integer moments
        xs = {u: x for u, x in pre.items()}
        ys = {u: x + (effect if u % 2 == 1 else 0.0)
              for u, x in pre.items()}
        n = len(xs)
        sx = sum(xs.values())
        sy = sum(ys.values())
        sxx = sum(v * v for v in xs.values())
        sxy = sum(xs[u] * ys[u] for u in xs)
        theta = (n * sxy - sx * sy) / (n * sxx - sx * sx)
        assert r["theta"] == round(theta, 6)
        t_users = [u for u in xs if u % 2 == 1]
        c_users = [u for u in xs if u % 2 == 0]
        mxa = sx / n
        adj = (
            sum(ys[u] for u in t_users) / 4
            - theta * (sum(xs[u] for u in t_users) / 4 - mxa)
        ) - (
            sum(ys[u] for u in c_users) / 4
            - theta * (sum(xs[u] for u in c_users) / 4 - mxa)
        )
        assert abs(r["diff_cuped"] - adj) < 1e-6
        # the adjustment moves the estimate toward the true effect
        assert abs(r["diff_cuped"] - effect) < abs(r["diff_raw"] - effect)

    def test_no_pre_activity_counts_as_zero(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.profile import (
            cuped_adjustment,
        )

        d0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, d0, 2, "e", 5.0),
            (2, d0 + dt.timedelta(days=10), 2, "e", 6.0),
            # user 1 (treated) has ONLY post activity → x = 0
            (3, d0 + dt.timedelta(days=10), 1, "e", 9.0),
        ]
        (r,) = cuped_adjustment(self._mk(spark, rows)).collect()
        assert r["n_users"] == 2
        assert r["diff_raw"] == 3.0  # 9 - 6
        # var(x) over {5, 0} is nonzero → theta defined, no crash
        assert r["theta"] is not None

    def test_bucket_guards(self, spark):
        from inception_eventstore_spark.operators.profile import (
            cuped_adjustment,
        )

        df = self._mk(spark, [])
        import pytest as _pt

        with _pt.raises(ValueError):
            cuped_adjustment(df, n_buckets=1)
        with _pt.raises(ValueError):
            cuped_adjustment(df, treat_bucket=5)


class TestSrmCheck:
    def _mk(self, spark, user_ids):
        import datetime as dt

        d0 = dt.datetime(2024, 1, 1)
        return spark.createDataFrame(
            [(i, d0, u, "e", 1.0) for i, u in enumerate(user_ids)],
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double",
        )

    def test_balanced_passes(self, spark):
        from inception_eventstore_spark.operators.profile import srm_check

        # users 0..299 → exactly 100 per bucket of user_id % 3
        df = self._mk(spark, list(range(300)) * 2)  # dup events ok
        (r,) = srm_check(df, n_buckets=3).collect()
        assert (r["n_0"], r["n_1"], r["n_2"]) == (100, 100, 100)
        assert r["chi2"] == 0.0 and r["srm_flag"] == 0

    def test_planted_mismatch_flags(self, spark):
        from inception_eventstore_spark.operators.profile import srm_check

        # bucket 2 loses 60 of its 100 users → chi2 blows past 5.99
        users = [u for u in range(300) if not (u % 3 == 2 and u < 180)]
        (r,) = srm_check(self._mk(spark, users), n_buckets=3).collect()
        n0, n1, n2 = r["n_0"], r["n_1"], r["n_2"]
        assert (n0, n1, n2) == (100, 100, 40)
        n, snn = n0 + n1 + n2, n0 * n0 + n1 * n1 + n2 * n2
        assert r["chi2"] == round((3.0 * snn - float(n) * n) / n, 6)
        assert r["srm_flag"] == 1

    def test_bucket_guard(self, spark):
        from inception_eventstore_spark.operators.profile import srm_check

        import pytest as _pt

        with _pt.raises(ValueError):
            srm_check(self._mk(spark, [1]), n_buckets=1)


class TestIsotonicCalibration:
    def _run(self, spark, rows, bins=10):
        from inception_eventstore_spark.operators.scoring import (
            isotonic_calibration,
        )

        df = spark.createDataFrame(rows, "p double, y int")
        return {
            r["bin"]: (r["n"], r["n_pos"], r["raw_micro"], r["iso_micro"])
            for r in isotonic_calibration(df, "p", "y", bins=bins).collect()
        }

    def test_violating_bins_pool_to_weighted_average(self, spark):
        """Rates 0.6 then 0.2 violate monotonicity → PAVA pools both
        bins to 4/10 = div(4·2^20, 10)."""
        rows = [(0.05, 1)] * 3 + [(0.05, 0)] * 2 + [(0.15, 1)] * 1 + [
            (0.15, 0)
        ] * 4
        got = self._run(spark, rows)
        pooled = (4 * 1048576) // 10
        assert got[0] == (5, 3, (3 * 1048576) // 5, pooled)
        assert got[1] == (5, 1, (1 * 1048576) // 5, pooled)

    def test_monotone_input_unchanged(self, spark):
        rows = [(0.05, 1)] * 1 + [(0.05, 0)] * 4 + [(0.15, 1)] * 3 + [
            (0.15, 0)
        ] * 2
        got = self._run(spark, rows)
        assert got[0][3] == got[0][2]  # iso == raw
        assert got[1][3] == got[1][2]

    def test_weighted_pooling(self, spark):
        """n=1 rate-1.0 bin vs n=3 rate-0.0 bin → pooled 1/4."""
        rows = [(0.05, 1), (0.15, 0), (0.15, 0), (0.15, 0)]
        got = self._run(spark, rows)
        pooled = 1048576 // 4
        assert got[0][3] == pooled and got[1][3] == pooled

    def test_result_is_monotone(self, spark):
        import random

        rng = random.Random(7)
        rows = [
            (rng.random(), rng.randint(0, 1)) for _ in range(400)
        ]
        got = self._run(spark, rows)
        fits = [got[b][3] for b in sorted(got)]
        assert fits == sorted(fits)

    def test_bins_guard(self, spark):
        with pytest.raises(ValueError):
            self._run(spark, [(0.5, 1)], bins=1)


class TestRatioMetricCi:
    def _mk(self, spark, rows):
        return spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, "
            "event_type string, value double"
        )

    def test_hand_computed_ratio_and_clustering(self, spark):
        """Arm 0: two users, (x=10, n=2) and (x=2, n=2) → ratio 3.0.
        The delta-method SE is computed from the same exact moments in
        python and must match to the 6-dp round."""
        import datetime as dt
        import math

        d0 = dt.datetime(2024, 1, 1)
        rows = [
            (1, d0, 2, "e", 4.0),
            (2, d0, 2, "e", 6.0),
            (3, d0, 4, "e", 1.0),
            (4, d0, 4, "e", 1.0),
            # arm 1, single pattern
            (5, d0, 1, "e", 3.0),
            (6, d0, 3, "e", 5.0),
        ]
        from inception_eventstore_spark.operators.profile import (
            ratio_metric_ci,
        )

        got = {
            r["bucket"]: r
            for r in ratio_metric_ci(self._mk(spark, rows)).collect()
        }
        r0 = got[0]
        assert (r0["n_users"], r0["sum_units"], r0["sum_events"]) == (
            2,
            12,
            4,
        )
        assert r0["ratio"] == 3.0
        # python replica of the delta method over users (10,2),(2,2)
        u, xs, ns = 2, [10, 2], [2, 2]
        xbar, nbar = sum(xs) / u, sum(ns) / u
        r = sum(xs) / sum(ns)
        sxx = sum((x - xbar) ** 2 for x in xs) / (u - 1)
        snn = sum((n - nbar) ** 2 for n in ns) / (u - 1)
        sxn = sum(
            (x - xbar) * (n - nbar) for x, n in zip(xs, ns)
        ) / (u - 1)
        se = math.sqrt(
            max(
                (sxx - 2 * r * sxn + r * r * snn) / (u * nbar * nbar),
                0.0,
            )
        )
        assert abs(r0["se"] - se) < 1e-6
        assert r0["ci_lo"] < r0["ratio"] < r0["ci_hi"]

    def test_bucket_guard(self, spark):
        from inception_eventstore_spark.operators.profile import (
            ratio_metric_ci,
        )

        import pytest as _pt

        with _pt.raises(ValueError):
            ratio_metric_ci(self._mk(spark, []), n_buckets=1)


class TestThresholdSweep:
    def test_hand_computed_operating_points(self, spark):
        """4 rows: p=0.95/y=1, p=0.85/y=0, p=0.55/y=1, p=0.15/y=0.
        At t=0.5: tp=2 fp=1 fn=0 → precision 2/3, recall 1, F1 4/5.
        At t=0.9: tp=1 fp=0 fn=1 → precision 1, recall 1/2, F1 2/3."""
        from inception_eventstore_spark.operators.scoring import (
            threshold_sweep,
        )

        df = spark.createDataFrame(
            [(0.95, 1), (0.85, 0), (0.55, 1), (0.15, 0)],
            "p double, y int",
        )
        got = {
            r["threshold_ppm"]: r
            for r in threshold_sweep(df, "p", "y").collect()
        }
        assert len(got) == 9
        t5 = got[500000]
        assert (t5["tp"], t5["fp"], t5["fn"]) == (2, 1, 0)
        assert t5["precision_ppm"] == 2 * 1000000 // 3
        assert t5["recall_ppm"] == 1000000
        assert t5["f1_ppm"] == 4 * 1000000 // 5
        t9 = got[900000]
        assert (t9["tp"], t9["fp"], t9["fn"]) == (1, 0, 1)
        assert t9["precision_ppm"] == 1000000
        assert t9["recall_ppm"] == 500000
        assert t9["f1_ppm"] == 2 * 1000000 // 3

    def test_empty_cells_are_null(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            threshold_sweep,
        )

        df = spark.createDataFrame([(0.05, 0)], "p double, y int")
        got = {
            r["threshold_ppm"]: r
            for r in threshold_sweep(df, "p", "y").collect()
        }
        # no predicted positives, no actual positives anywhere
        assert got[500000]["precision_ppm"] is None
        assert got[500000]["recall_ppm"] is None

    def test_guard(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            threshold_sweep,
        )

        df = spark.createDataFrame([(0.5, 1)], "p double, y int")
        import pytest as _pt

        with _pt.raises(ValueError):
            threshold_sweep(df, "p", "y", n_thresholds=0)


class TestMannWhitneyU:
    def test_hand_computed_with_ties(self, spark):
        """A = {1, 2}, B = {2, 3}: pooled midranks 1, 2.5, 2.5, 4 →
        R_A = 3.5 (×2 = 7), U_A = R_A − n_A(n_A+1)/2 = 0.5 (×2 = 1),
        tie term = 2³ − 2 = 6."""
        from inception_eventstore_spark.operators.profile import (
            mann_whitney_u,
        )

        rows = [("a", 1.0), ("a", 2.0), ("b", 2.0), ("b", 3.0)]
        df = spark.createDataFrame(rows, "event_type string, value double")
        r = mann_whitney_u(df, "a", "b").first()
        assert (r["n_a"], r["n_b"]) == (2, 2)
        assert r["u_a_x2"] == 1
        assert r["tie_sum"] == 6

    def test_stochastic_dominance_sign(self, spark):
        """All of B above all of A → U_A = 0, z strongly negative."""
        from inception_eventstore_spark.operators.profile import (
            mann_whitney_u,
        )

        rows = [("a", float(i)) for i in range(20)] + [
            ("b", 100.0 + i) for i in range(20)
        ]
        df = spark.createDataFrame(rows, "event_type string, value double")
        r = mann_whitney_u(df, "a", "b").first()
        assert r["u_a_x2"] == 0
        assert r["z_u"] < -4

    def test_mega_tie_lane_recombination_exact(self, spark):
        """ADVICE r7: the per-value cube is never materialized
        Spark-side — base-2^31 lanes recombine driver-side in python
        ints. A tie mass just under the BIGINT output bound
        (t = 2^21 − 2, t³ − t ≈ 2^63 − 2.6e13) must come back exact."""
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.profile import (
            mann_whitney_u,
        )

        t = (1 << 21) - 2
        big = spark.range(t).select(
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias(
                "event_type"
            ),
            F.lit(5.0).alias("value"),
        )
        extra = spark.createDataFrame(
            [("a", 1.0), ("b", 9.0), ("b", 9.0)],
            "event_type string, value double",
        )
        r = mann_whitney_u(big.unionByName(extra), "a", "b").first()
        assert r["n_a"] == t // 2 + 1 and r["n_b"] == t // 2 + 2
        assert r["tie_sum"] == (t**3 - t) + (2**3 - 2)

    def test_tie_sum_past_bigint_raises_clearly(self, spark):
        """Σ(t³−t) past 2^63 cannot land in the BIGINT tie_sum column
        (nor survive the oracle's HUGEINT→BIGINT cast): the operator
        must raise a clear ValueError, never an opaque ANSI crash."""
        import pytest as _pt
        from pyspark.sql import functions as F

        from inception_eventstore_spark.operators.profile import (
            mann_whitney_u,
        )

        big = spark.range(2_200_000).select(  # t³ ≈ 1.06e19 > 2^63
            F.when(F.col("id") % 2 == 0, "a").otherwise("b").alias(
                "event_type"
            ),
            F.lit(5.0).alias("value"),
        )
        with _pt.raises(ValueError, match="tie term exceeds BIGINT"):
            mann_whitney_u(big, "a", "b")

class TestPropensityStrata:
    def test_strata_partition_users_evenly(self, spark):
        from inception_eventstore_spark.operators.profile import (
            propensity_strata,
        )

        import datetime as dt

        rows = []
        for u in range(100):
            for j in range(1 + u % 5):
                rows.append(
                    (u, "click" if j % 2 else "purchase",
                     float(10 + u % 7),
                     dt.datetime(2024, 1, 1 + j % 28, 12, 0, 0))
                )
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, value double, "
            "ts timestamp"
        )
        out = propensity_strata(df).collect()
        assert [r["stratum"] for r in out] == sorted(
            {r["stratum"] for r in out}
        )
        total = sum(r["n_treated"] + r["n_control"] for r in out)
        assert total == 100
        sizes = [r["n_treated"] + r["n_control"] for r in out]
        assert max(sizes) - min(sizes) <= 1  # equal-rank deciles

    def test_empty_arm_gives_null_diff(self, spark):
        from inception_eventstore_spark.operators.profile import (
            propensity_strata,
        )

        import datetime as dt

        rows = [
            (2 * u, "purchase", 5.0, dt.datetime(2024, 1, 1, 1, 0, 0))
            for u in range(10)
        ]  # every user even → all control
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, value double, "
            "ts timestamp"
        )
        out = propensity_strata(df, n_strata=2).collect()
        assert all(r["n_treated"] == 0 for r in out)
        assert all(r["diff_y"] is None for r in out)

    def test_ml_fit_parity(self, spark):
        """fit='ml' (pyspark.ml LogisticRegression — the production
        path) must reproduce the pinned stratification on a separable
        fixture: treated users (odd ids) run systematically more
        active, so both the pinned activity index and the fitted
        propensity rank users the same way — decile labels must agree
        within ±1 for the vast majority and rank-correlate strongly."""
        import datetime as dt

        from inception_eventstore_spark.operators.profile import (
            propensity_user_scores,
        )

        rows = []
        for u in range(200):
            n_ev = 2 + (u % 7) + 6 * (u % 2)  # treatment ↑ activity
            for j in range(n_ev):
                rows.append(
                    (u, "click" if j % 3 else "purchase",
                     float(5 + j % 4),
                     dt.datetime(2024, 1, 1 + j % 21, 9, 0, 0))
                )
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, value double, "
            "ts timestamp"
        ).repartition(8)

        def deciles(fit):
            scored = propensity_user_scores(df, fit=fit).collect()
            order = sorted(scored, key=lambda r: (r["_s"], r["_u"]))
            n = len(order)
            return {
                r["_u"]: (i * 10) // n for i, r in enumerate(order)
            }, {r["_u"]: r["_s"] for r in scored}

        d_pin, s_pin = deciles("pinned")
        d_ml, s_ml = deciles("ml")
        assert set(d_pin) == set(d_ml) and len(d_pin) == 200
        close = sum(
            1 for u in d_pin if abs(d_pin[u] - d_ml[u]) <= 1
        )
        assert close >= 180, f"only {close}/200 deciles within ±1"
        # Spearman rank correlation between the two scores
        def ranks(s):
            order = sorted(s, key=lambda u: (s[u], u))
            return {u: i for i, u in enumerate(order)}

        ra, rb = ranks(s_pin), ranks(s_ml)
        n = len(ra)
        d2 = sum((ra[u] - rb[u]) ** 2 for u in ra)
        rho = 1 - 6 * d2 / (n * (n * n - 1))
        assert rho > 0.9, f"spearman {rho}"

    def test_ml_fit_through_strata_readout(self, spark):
        """The fitted path must flow through the full stratification
        readout: equal-rank strata, all 100 users accounted for."""
        import datetime as dt

        from inception_eventstore_spark.operators.profile import (
            propensity_strata,
        )

        rows = []
        for u in range(100):
            for j in range(1 + u % 5 + 3 * (u % 2)):
                rows.append(
                    (u, "click" if j % 2 else "purchase",
                     float(10 + u % 7),
                     dt.datetime(2024, 1, 1 + j % 28, 12, 0, 0))
                )
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, value double, "
            "ts timestamp"
        )
        out = propensity_strata(df, fit="ml").collect()
        total = sum(r["n_treated"] + r["n_control"] for r in out)
        assert total == 100
        sizes = [r["n_treated"] + r["n_control"] for r in out]
        assert max(sizes) - min(sizes) <= 1

    def test_bad_fit_mode_raises(self, spark):
        import datetime as dt

        import pytest as _pt

        from inception_eventstore_spark.operators.profile import (
            propensity_strata,
        )

        df = spark.createDataFrame(
            [(1, "click", 1.0, dt.datetime(2024, 1, 1))],
            "user_id long, event_type string, value double, ts timestamp",
        )
        with _pt.raises(ValueError, match="fit must be"):
            propensity_strata(df, fit="xgboost")


class TestEbShrunkRates:
    def test_shrinkage_pulls_small_n_toward_prior(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.scoring import (
            eb_shrunk_rates,
        )

        rows = []
        # 40 well-observed users with rates spread around ~30%
        # (2..8 purchases of 20 — nonzero variance so the fit engages)
        for u in range(40):
            k = 2 + u % 7
            for j in range(20):
                rows.append(
                    (u, "purchase" if j < k else "click",
                     dt.datetime(2024, 1, 1 + j % 28, 0, 0, 0))
                )
        # one 1-event user with a raw rate of 1.0
        rows.append((999, "purchase", dt.datetime(2024, 1, 5, 0, 0, 0)))
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        out = {r["user_id"]: r for r in eb_shrunk_rates(df).collect()}
        lone = out[999]
        assert lone["raw_rate"] == 1.0
        assert lone["prior_used"] is True
        # one observation against a strong prior (k ≈ 17.6): pulled
        # nearly all the way to the prior mean (~0.244), never past it
        assert 0.244 < lone["shrunk_rate"] < 0.4
        # a well-observed user keeps a much larger share of its
        # deviation from the prior mean than the 1-event user
        # (shrinkage factor n/(n+k): 20 obs ≈ 53 % kept, 1 obs ≈ 5 %)
        mu = 0.244  # fit prior mean on this fixture (replicated)
        w = out[0]
        kept_w = abs(w["shrunk_rate"] - mu) / abs(w["raw_rate"] - mu)
        kept_l = abs(lone["shrunk_rate"] - mu) / abs(lone["raw_rate"] - mu)
        assert kept_w > 0.4 > 0.1 > kept_l

    def test_degenerate_fit_falls_back_to_raw(self, spark):
        import datetime as dt

        from inception_eventstore_spark.operators.scoring import (
            eb_shrunk_rates,
        )

        # every user identical → zero variance → no prior
        rows = [
            (u, "purchase" if j == 0 else "click",
             dt.datetime(2024, 1, 1, 0, 0, 0))
            for u in range(6) for j in range(5)
        ]
        df = spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )
        out = eb_shrunk_rates(df).collect()
        assert all(r["prior_used"] is False for r in out)
        assert all(r["shrunk_rate"] == r["raw_rate"] for r in out)


class TestBrierDecomposition:
    def _score_df(self, spark, rows):
        return spark.createDataFrame(rows, "p double, y int")

    def test_sharp_calibrated_scorer(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            brier_decomposition,
        )

        rows = [(0.95, 1)] * 40 + [(0.05, 0)] * 60
        r = brier_decomposition(
            self._score_df(spark, rows), "p", "y"
        ).first()
        assert r["brier"] < 0.01
        assert r["reliability"] < 0.01
        # resolution recovers nearly all the uncertainty
        assert abs(r["resolution"] - r["uncertainty"]) < 0.02
        assert r["uncertainty"] == 0.24

    def test_uninformative_scorer(self, spark):
        from inception_eventstore_spark.operators.scoring import (
            brier_decomposition,
        )

        # constant base-rate prediction: no resolution, no reliability
        # penalty, brier == uncertainty
        rows = [(0.4, 1)] * 40 + [(0.4, 0)] * 60
        r = brier_decomposition(
            self._score_df(spark, rows), "p", "y"
        ).first()
        assert r["resolution"] == 0.0
        assert r["reliability"] < 1e-5
        assert abs(r["brier"] - r["uncertainty"]) < 1e-5
        assert abs(r["brier"] - 0.24) < 1e-5

    def test_guard(self, spark):
        import pytest as _pt

        from inception_eventstore_spark.operators.scoring import (
            brier_decomposition,
        )

        with _pt.raises(ValueError):
            brier_decomposition(
                self._score_df(spark, [(0.5, 1)]), "p", "y", bins=1
            )
